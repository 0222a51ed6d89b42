package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{TimestampNTZType, TimestampType, LongType}

/** Canonical loaders for the harness tables (`/root/testdata/sf*`).
  *
  * Two timestamp normalizations make Spark's view of the parquet files
  * bit-identical to the DuckDB oracle's view:
  *
  *  1. `events.ts` is physically INT64 TIMESTAMP(NANOS, isAdjustedToUTC=false),
  *     which Spark's parquet reader rejects ([PARQUET_TYPE_ILLEGAL]). We read
  *     it as raw long nanos (`spark.sql.legacy.parquet.nanosAsLong`) and
  *     truncate to microseconds — exactly what DuckDB does on read (its
  *     TIMESTAMP is µs-precision).
  *  2. Columns Spark infers as TIMESTAMP_NTZ (parquet isAdjustedToUTC=false,
  *     e.g. `l_shipdate`, `o_orderdate`) are cast to TimestampType under the
  *     fixed UTC session timezone, so `unix_millis` etc. agree with DuckDB's
  *     `epoch_ms` (which treats naive timestamps as UTC).
  *
  * The reference engine's analogous machinery is its SQLite type-repair layer
  * (reference: binance_data_framework/database_handler.py:98-108) — here it
  * degrades to a read-time cast because parquet is strongly typed.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings")

  /** Read one harness table with oracle-parity timestamp normalization. */
  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$sfDir/$name.parquet")
    val nsFixed =
      if (name == "events" && raw.schema("ts").dataType == LongType)
        // ns → µs truncation (positive epochs ⇒ `div` == floor division)
        raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      else raw
    // TIMESTAMP_NTZ → TIMESTAMP under UTC session tz (same wall clock).
    nsFixed.schema.fields.foldLeft(nsFixed) { (df, f) =>
      if (f.dataType == TimestampNTZType)
        df.withColumn(f.name, col(f.name).cast(TimestampType))
      else df
    }
  }

  def region(s: SparkSession, d: String): DataFrame = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame = load(s, d, "events")
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
