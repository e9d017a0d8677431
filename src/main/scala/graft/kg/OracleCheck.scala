package graft.kg

import org.apache.spark.sql.SparkSession

/** Dev tool: run every kg_* query AND its VALUES oracle inside Spark and
  * diff them the way the driver's DuckDB compare does (columns sorted by
  * name, stringified rows sorted). The kg oracles are engine-neutral
  * VALUES+CAST SQL, so a green run here predicts a green CORRECTNESS row.
  * `sbt "runMain graft.kg.OracleCheck"` */
object OracleCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def canon(df: org.apache.spark.sql.DataFrame): (Vector[String], Vector[String]) = {
      val cols = df.columns.sorted.toVector
      val rows = df.select(cols.map(org.apache.spark.sql.functions.col): _*)
        .collect().map(_.toSeq.map {
          case null => "NULL"
          case d: Double => f"$d%.6f"
          case x => x.toString
        }.mkString("")).toVector.sorted
      (cols, rows)
    }

    val oracles = KgQueries.oracleSql
    var bad = 0
    KgQueries.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      oracles.get(name) match {
        case None => println(f"$name%-24s NO-ORACLE")
        case Some(sql) =>
          try {
            val (gc, gr) = canon(fn(spark, "/root/testdata/sf0.01"))
            val (oc, or0) = canon(spark.sql(sql))
            val ok = gc == oc && gr == or0
            if (!ok) {
              bad += 1
              println(f"$name%-24s MISMATCH spark=${gr.size} oracle=${or0.size}" +
                (if (gc != oc) s" cols: $gc vs $oc" else ""))
              if (gc == oc) {
                (gr.toSet -- or0.toSet).take(3).foreach(r => println(s"    spark-only:  ${r.replace('', '|')}"))
                (or0.toSet -- gr.toSet).take(3).foreach(r => println(s"    oracle-only: ${r.replace('', '|')}"))
              }
            } else println(f"$name%-24s OK (${gr.size} rows)")
          } catch {
            case e: Throwable =>
              bad += 1
              println(f"$name%-24s ERROR ${e.getMessage.linesIterator.nextOption.getOrElse("")}")
          }
      }
    }
    println(if (bad == 0) "ALL-OK" else s"BAD=$bad")
    spark.stop()
  }
}
