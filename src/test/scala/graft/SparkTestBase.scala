package graft

import org.apache.spark.sql.SparkSession

/** Shared local session for suites (one JVM → getOrCreate reuses it). */
trait SparkTestBase {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  def ts(s: String): java.sql.Timestamp = java.sql.Timestamp.valueOf(s)
  def msTs(ms: Long): java.sql.Timestamp = new java.sql.Timestamp(ms)
}
