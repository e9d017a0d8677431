package graft.kg

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: phase timing for the alias-components graph — separates graph
  * generation, the CC algorithm, and the final orderBy/count so optimization
  * effort lands on the real cost. `sbt "runMain graft.kg.CcProbe"` */
object CcProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"CCPROBE $label%-14s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      r
    }
    (1 to 2).foreach { round =>
      println(s"-- round $round")
      val edges = time("gen") {
        val giant = spark.range(1, 300001)
          .select(format_string("g%06d", col("id")).as("src"), lit("g000000").as("dst"))
        val chain = spark.range(0, 4095)
          .select(format_string("h%06d", col("id")).as("src"),
            format_string("h%06d", col("id") + 1).as("dst"))
        val stars = spark.range(0, 700000).filter(col("id") % 10 =!= 0)
          .select(format_string("s%06d", col("id")).as("src"),
            format_string("s%06d", col("id") - col("id") % 10).as("dst"))
        val e = giant.union(chain).union(stars).localCheckpoint(true)
        println(s"  edges=${e.count()}")
        e
      }
      val (labels, rounds, sizes) = time("cc") {
        val r = AliasResolution.connectedComponentsDiag(edges)
        r._1.count()
        r
      }
      println(s"  rounds=$rounds active=$sizes")
      time("orderBy+count") {
        labels.orderBy("vertex").write.mode("overwrite")
          .parquet("/tmp/ccprobe.parquet")
      }
    }
    spark.stop()
  }
}
