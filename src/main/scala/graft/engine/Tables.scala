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
        // ns → µs truncation (positive epochs ⇒ `div` == floor division).
        // The raw nanos survive as ts_ns so range predicates can be pushed
        // to parquet row groups (the derived-column filter cannot) — see
        // [[tsRangePushdown]].
        raw.withColumn("ts_ns", col("ts"))
          .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      else raw
    // TIMESTAMP_NTZ → TIMESTAMP under UTC session tz (same wall clock).
    nsFixed.schema.fields.foldLeft(nsFixed) { (df, f) =>
      if (f.dataType == TimestampNTZType)
        df.withColumn(f.name, col(f.name).cast(TimestampType))
      else df
    }
  }

  /** Closed-bound ts range predicate on events that ALSO hits the raw
    * nanos column, so parquet row-group min/max skipping applies (the
    * equivalent predicate on the µs-derived `ts` is not pushable).
    * `ts ∈ [from, to]` at µs precision ⟺ `ts_ns ∈ [from·1000, to·1000+999]`.
    * Bounds are ISO local datetimes interpreted as UTC. */
  def tsRangePushdown(from: String, to: String): org.apache.spark.sql.Column = {
    import java.time.{LocalDateTime, ZoneOffset}
    def us(sIso: String): Long = {
      val i = LocalDateTime.parse(sIso.replace(' ', 'T')).toInstant(ZoneOffset.UTC)
      i.getEpochSecond * 1000000L + i.getNano / 1000L
    }
    val (lo, hi) = (us(from), us(to))
    col("ts") >= timestamp_micros(lit(lo)) &&
      col("ts") <= timestamp_micros(lit(hi)) &&
      col("ts_ns") >= lit(lo * 1000) && col("ts_ns") <= lit(hi * 1000 + 999)
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
