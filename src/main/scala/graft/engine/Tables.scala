package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{TimestampNTZType, TimestampType, LongType}

/** Canonical loaders for the harness tables (`/root/testdata/sf*`).
  *
  * Two timestamp normalizations make Spark's view of the parquet files
  * bit-identical to the DuckDB oracle's view:
  *
  *  1. `events.ts` is SCHEMA-ADAPTIVE. The harness has shipped the column
  *     under two physical layouts across rounds:
  *       - INT64 TIMESTAMP(NANOS, isAdjustedToUTC=false): Spark's parquet
  *         reader rejects it ([PARQUET_TYPE_ILLEGAL]), so we read it as raw
  *         long nanos (`spark.sql.legacy.parquet.nanosAsLong`) and truncate
  *         to microseconds — exactly what DuckDB does on read (its TIMESTAMP
  *         is µs-precision). The raw nanos survive as `ts_ns` for row-group
  *         skipping (a derived-column filter is not pushable).
  *       - INT64 TIMESTAMP(MICROS, isAdjustedToUTC=false): natively readable
  *         (as TIMESTAMP_NTZ → normalization 2 below) and natively pushable;
  *         no `ts_ns` column is synthesized and none is needed.
  *     The loader keys on the RAW Spark type (`LongType` ⇒ nanos layout) and
  *     [[tsRangePushdown]] keys on the presence of `ts_ns`, so both layouts
  *     — and any future drift between them — produce identical query results.
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

  /** Closed-bound `ts ∈ [from, to]` range predicate on an events frame,
    * schema-adaptive so row-group min/max skipping applies on BOTH layouts:
    *
    *  - nanos layout (frame carries the raw `ts_ns` long): the µs-derived
    *    `ts` filter is NOT pushable (it sits behind a projection), so the
    *    equivalent raw-column conjunct `ts_ns ∈ [from·1000, to·1000+999]`
    *    is added for the parquet scan to skip on.
    *  - µs layout (no `ts_ns`): `ts` IS the raw parquet column and the
    *    plain timestamp predicate pushes down natively — adding a `ts_ns`
    *    conjunct would be an analysis error, so it is emitted only when
    *    the column exists.
    *
    * Bounds are ISO local datetimes interpreted as UTC. */
  def tsRangePushdown(ev: DataFrame, from: String, to: String): org.apache.spark.sql.Column = {
    import java.time.{LocalDateTime, ZoneOffset}
    def us(sIso: String): Long = {
      val i = LocalDateTime.parse(sIso.replace(' ', 'T')).toInstant(ZoneOffset.UTC)
      i.getEpochSecond * 1000000L + i.getNano / 1000L
    }
    val (lo, hi) = (us(from), us(to))
    val base = col("ts") >= timestamp_micros(lit(lo)) &&
      col("ts") <= timestamp_micros(lit(hi))
    if (ev.columns.contains("ts_ns"))
      base && col("ts_ns") >= lit(lo * 1000) && col("ts_ns") <= lit(hi * 1000 + 999)
    else base
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
