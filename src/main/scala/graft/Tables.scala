package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table loader for the driver-generated test tables (TESTDATA.md).
  * At cluster scale these reads become Iceberg catalog scans with partition
  * pruning; the parquet reader here preserves the same pushdown behavior
  * (filters + column pruning reach the scan, see `.explain` PushedFilters).
  */
object Tables {
  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")
}
