package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

object SparkTestSession {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-warehouse").toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}

class RelationalQueriesSpec extends AnyFunSuite {
  val sf = "/root/testdata/sf0.001"
  lazy val spark = SparkTestSession.spark

  test("every relational query runs and returns rows on sf0.001") {
    operators.RelationalQueries.queries.foreach { case (name, fn) =>
      val df = fn(spark, sf)
      assert(df.count() > 0, s"$name returned 0 rows")
    }
  }

  test("pricing summary has the oracle column names") {
    val df = operators.RelationalQueries.queries("q_pricing_summary")(spark, sf)
    assert(df.columns.toSet == Set("l_returnflag", "l_linestatus", "sum_qty",
      "sum_base_price", "sum_disc_price", "count_order"))
  }

  test("every query key has either an oracle or is explicitly rows-only") {
    // all relational queries must carry an oracle
    val missing = operators.RelationalQueries.queries.keySet --
      operators.RelationalQueries.oracleSql.keySet
    assert(missing.isEmpty, s"relational queries missing oracle: $missing")
  }
}
