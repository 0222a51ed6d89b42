package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** OHLCV candle operators, re-expressed as single-shuffle Spark aggregates.
  *
  * The reference resamples one pandas Series per output column and re-joins
  * them on the bucket index (reference: colab_interface.py:416-424 — five
  * passes). Here the whole candle is ONE `groupBy(bucket).agg(...)` — one
  * shuffle, map-side partial aggregation, and at 100 TB the shuffle key
  * (symbol, bucket) is exactly the storage partition key, so AQE-coalesced
  * post-shuffle partitions stay balanced.
  *
  * Determinism note (SURVEY §2.4 A2): pandas `.first()/.last()` are
  * time-ordered; Spark's `first()` in groupBy is not. We use
  * `min_by`/`max_by` keyed on the timestamp, which is deterministic and has
  * an exact DuckDB counterpart for the oracle.
  */
object Ohlcv {

  /** Bucket expression for a timeframe: fixed-width `window()` for
    * everything except calendar months, which use `date_trunc`.
    *
    * Timezone note: `date_trunc("month", …)` truncates in the SESSION
    * timezone while `window()` is epoch-UTC-aligned — so 1M boundaries
    * (alone) would shift on a non-UTC session. The engine's contract is
    * a UTC session (set in build.sbt javaOptions and every
    * Verify/Bench/tool builder; the oracle comparison depends on it),
    * under which both rules agree on UTC boundaries. */
  def bucket(ts: Column, timeframe: String): Column =
    if (timeframe == "1M") date_trunc("month", ts)
    else window(ts, Timeframes.windowDuration(timeframe)).getField("start")

  /** Resample a tick/trade series (one price column) into OHLCV candles.
    * open/close are price at min/max time; volume sums `volumeCol` (or the
    * price column itself when the series has no separate volume — the
    * events-proxy convention from FIXTURES.md). Defined as the mergeable
    * partial ([[resampleTicksPartial]]) minus its merge-state columns, so
    * there is exactly one candle aggregate to maintain (Catalyst prunes
    * the dropped aggregates out of the plan). */
  def resampleTicks(
      df: DataFrame, timeframe: String,
      symbolCol: String = "symbol", tsCol: String = "ts",
      priceCol: String = "price", volumeCol: Option[String] = None): DataFrame =
    resampleTicksPartial(df, timeframe, symbolCol, tsCol, priceCol, volumeCol)
      .drop("first_ts", "last_ts")

  /** Resample existing candles (base timeframe, e.g. 1m) to a coarser
    * timeframe — the reference's store-minutes-derive-the-rest architecture
    * (reference: plan.md:86-97, colab_interface.py:374-434). */
  def resampleCandles(
      df: DataFrame, timeframe: String,
      symbolCol: String = "symbol", tsCol: String = "ts"): DataFrame =
    df.groupBy(col(symbolCol), bucket(col(tsCol), timeframe).as("bucket"))
      .agg(
        min_by(col("open"), col(tsCol)).as("open"),
        max(col("high")).as("high"),
        min(col("low")).as("low"),
        max_by(col("close"), col(tsCol)).as("close"),
        sum(col("volume")).as("volume"),
        count(lit(1)).as("n"))

  /** [[resampleTicks]] plus the first/last tick timestamps — a MERGEABLE
    * candle state: two partials over disjoint tick sets re-aggregate into
    * the candle of their union via [[mergeCandles]]. This is the
    * incremental-view-maintenance form of the reference's
    * store-minutes-derive-the-rest plan (plan.md:86-97): a new ingest batch
    * only re-merges the buckets it touches. */
  def resampleTicksPartial(
      df: DataFrame, timeframe: String,
      symbolCol: String = "symbol", tsCol: String = "ts",
      priceCol: String = "price", volumeCol: Option[String] = None): DataFrame = {
    val vol = volumeCol.getOrElse(priceCol)
    df.groupBy(col(symbolCol), bucket(col(tsCol), timeframe).as("bucket"))
      .agg(
        min_by(col(priceCol), col(tsCol)).as("open"),
        max(col(priceCol)).as("high"),
        min(col(priceCol)).as("low"),
        max_by(col(priceCol), col(tsCol)).as("close"),
        sum(col(vol)).as("volume"),
        count(lit(1)).as("n"),
        min(col(tsCol)).as("first_ts"),
        max(col(tsCol)).as("last_ts"))
  }

  /** Merge partial candle states sharing (symbol, bucket): open follows the
    * earliest first_ts, close the latest last_ts, extrema/sums combine —
    * the same associative fold Structured Streaming state uses, expressed
    * as a batch aggregate. `mergeCandles(partial(A) ∪ partial(B)) ≡
    * partial(A ∪ B)` for disjoint tick sets WITH UNIQUE TIMESTAMPS per
    * (symbol, bucket) — with duplicate tick timestamps open/close are
    * already tie-ambiguous in the direct resample itself. The merge's own
    * tie-break is total ((first_ts, open) / (last_ts, close)) so merging
    * is deterministic regardless. Spec-pinned. */
  def mergeCandles(partials: DataFrame,
      symbolCol: String = "symbol"): DataFrame =
    partials.groupBy(col(symbolCol), col("bucket"))
      .agg(
        min_by(col("open"), struct(col("first_ts"), col("open"))).as("open"),
        max(col("high")).as("high"),
        min(col("low")).as("low"),
        max_by(col("close"), struct(col("last_ts"), col("close"))).as("close"),
        sum(col("volume")).as("volume"),
        sum(col("n")).as("n"),
        min(col("first_ts")).as("first_ts"),
        max(col("last_ts")).as("last_ts"))

  /** Gap fill: expand each series to its full fixed-width bucket grid and
    * forward-fill the last known value into missing buckets (the
    * continuous-series view the reference's plotting path implies, and the
    * imputation step of a feature pipeline). Grid generation is a
    * per-series `sequence` explode — no driver loop; the fill is one
    * window pass per series. `filled` is NULL before the first observation
    * (nothing to carry); `is_gap` marks synthesized rows.
    *
    * The grid step must match the bucketing rule: fixed-width timeframes
    * step by their exact duration, but `1M` buckets are CALENDAR months
    * (`date_trunc`, see [[bucket]]) — a 30-day approximation would drift
    * off the real month starts and mark every actual candle a gap — so
    * months step by `INTERVAL 1 MONTH` (well-defined here because every
    * bucket value is a month start by construction). */
  def gapFill(candles: DataFrame, timeframe: String,
      symbolCol: String = "symbol", bucketCol: String = "bucket",
      valueCol: String = "close"): DataFrame = {
    val step =
      if (timeframe == "1M") "INTERVAL 1 MONTH"
      else s"INTERVAL ${Timeframes.durationMs(timeframe) / 1000} SECOND"
    val grid = candles.groupBy(col(symbolCol))
      .agg(min(col(bucketCol)).as("_b0"), max(col(bucketCol)).as("_b1"))
      .select(col(symbolCol), explode(sequence(col("_b0"), col("_b1"),
        expr(step))).as(bucketCol))
    val w = Window.partitionBy(col(symbolCol)).orderBy(col(bucketCol))
      .rowsBetween(Window.unboundedPreceding, 0)
    grid.join(candles.select(col(symbolCol), col(bucketCol),
        col(valueCol).as("_obs"), lit(true).as("_present")),
        Seq(symbolCol, bucketCol), "left")
      .withColumn("filled", last(col("_obs"), ignoreNulls = true).over(w))
      // is_gap = ROW ABSENT, via the presence marker — `_obs.isNull`
      // could not distinguish "no candle in this bucket" from "candle
      // present with a NULL value" (ingestCast yields NULL for
      // unparseable prices) and mislabeled real rows as synthesized
      .withColumn("is_gap", col("_present").isNull)
      .drop("_obs", "_present")
  }

  /** Trailing simple moving average over the previous `n` rows (reference
    * quick-start analysis: README.md:106 — `rolling(window=20).mean()`).
    * pandas emits NaN until `n` rows exist (min_periods default); we
    * reproduce that as NULL via a row_number guard, which keeps the result
    * oracle-comparable. Partitioned window — scales by symbol at 100 TB;
    * `orderTieBreak` must make the ordering total (unique) for determinism.
    */
  def sma(
      df: DataFrame, n: Int, partitionCol: String, tsCol: String,
      valueCol: String, orderTieBreak: String, outCol: String = "sma"): DataFrame = {
    val w = Window.partitionBy(col(partitionCol))
      .orderBy(col(tsCol), col(orderTieBreak))
    val sliding = w.rowsBetween(-(n - 1), 0)
    // full-window guard as a COUNT over the same sliding frame
    // (count-in-frame = min(rn, n), so = n ⟺ rn ≥ n): one frame
    // processor instead of running-frame row_number + sliding avg
    df.withColumn(outCol,
      when(count(lit(1)).over(sliding) === n,
        avg(col(valueCol)).over(sliding)))
  }

  /** S3 ingest cast: raw 12-field string klines (reference:
    * api_connector.py:288-314) → typed OHLCV frame. Input column `kline`
    * is ARRAY<STRING> in Binance field order; only the first six fields
    * survive, mirroring the reference's projection (api_connector.py:310).
    */
  def ingestCast(raw: DataFrame, klineCol: String = "kline"): DataFrame = {
    val k = col(klineCol)
    raw.select(
      timestamp_millis(k.getItem(0).cast("long")).as("ts"),
      k.getItem(1).cast("double").as("open"),
      k.getItem(2).cast("double").as("high"),
      k.getItem(3).cast("double").as("low"),
      k.getItem(4).cast("double").as("close"),
      k.getItem(5).cast("double").as("volume"))
  }
}
