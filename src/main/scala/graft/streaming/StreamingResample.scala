package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming slice (SURVEY §2.9): the reference's incremental behaviors as
  * Structured Streaming transforms. Each function takes a (possibly
  * streaming) DataFrame and returns the transformed frame — identical code
  * path for batch and stream, which is what the batch-equivalence tests
  * assert.
  *
  *  - ST3 resample-as-you-go: tumbling-window candle aggregation; with a
  *    watermark this is append-mode-safe (buckets finalize once the
  *    watermark passes bucket end).
  *  - ST4 idempotent re-ingest: PK dedup with watermark-bounded state —
  *    the streaming form of the reference's `INSERT OR REPLACE`
  *    (database_handler.py:215-218).
  *  - ST2 freshness window (database_handler.py:288-295) maps to the
  *    watermark delay itself: `2 × timeframe`.
  */
object StreamingResample {

  /** ST3: tumbling candle aggregation. `delay` is the watermark (late
    * tolerance), e.g. the reference's 2×timeframe freshness bound. */
  def resampleStream(events: DataFrame, keyCol: String, tsCol: String,
      priceCol: String, duration: String, delay: String): DataFrame =
    events
      .withWatermark(tsCol, delay)
      .groupBy(col(keyCol), window(col(tsCol), duration))
      .agg(
        min_by(col(priceCol), col(tsCol)).as("open"),
        max(col(priceCol)).as("high"),
        min(col(priceCol)).as("low"),
        max_by(col(priceCol), col(tsCol)).as("close"),
        sum(col(priceCol)).as("volume"),
        count(lit(1)).as("n"))
      .select(col(keyCol), col("window.start").as("bucket"), col("open"),
        col("high"), col("low"), col("close"), col("volume"), col("n"))

  /** Streaming VWAP-enriched buckets: the q48 aggregate
    * ([[graft.engine.Indicators.vwap]]) as an append-safe tumbling-window
    * stream — numerator accumulated in exact decimal, so the streamed
    * result is bit-identical to the batch indicator (the equivalence the
    * spec asserts; no float accumulation order to diverge). Buckets
    * finalize once the watermark passes bucket end, like
    * [[resampleStream]]. */
  def vwapStream(ticks: DataFrame, keyCol: String, tsCol: String,
      priceCol: String, qtyCol: String, duration: String,
      delay: String): DataFrame =
    ticks
      .withWatermark(tsCol, delay)
      .groupBy(col(keyCol), window(col(tsCol), duration))
      .agg(
        // qtyDec9: same loud overflow guard as the batch indicator — a
        // qty >= 1e9 must fail, not silently null out of the numerator
        sum(round(col(priceCol), 4).cast("decimal(18,4)") *
          graft.engine.Indicators.qtyDec9(col(qtyCol))).as("pq"),
        sum(col(qtyCol)).as("qty"),
        count(lit(1)).as("n_trades"))
      .select(col(keyCol), col("window.start").as("bucket"),
        round(col("pq").cast("double") / col("qty"), 6).as("vwap"),
        col("qty"), col("n_trades"))

  /** ST4: watermark-bounded PK dedup — FIRST-arrival-wins within the
    * state horizon. Intended divergence from the reference's
    * `INSERT OR REPLACE` (which is LAST-writer-wins): the two agree
    * whenever re-deliveries carry identical payloads (the idempotent
    * re-ingest case this operator exists for), but a re-fetch that
    * REVISES a row — e.g. a still-forming tail candle re-fetched with
    * final values — keeps the FIRST version here. For revision
    * semantics use the store path
    * ([[StreamingIngest.streamToStore]] → `Store.upsert`, seq-ordered
    * last-writer-wins), where the reference's REPLACE actually lives. */
  def dedupStream(events: DataFrame, tsCol: String, keyCols: Seq[String],
      delay: String): DataFrame =
    events.withWatermark(tsCol, delay)
      .dropDuplicates(keyCols :+ tsCol)
}
