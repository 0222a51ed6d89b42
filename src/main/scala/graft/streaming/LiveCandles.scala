package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}
import graft.functions.OhlcvAggregator
import graft.functions.OhlcvAggregator.{Buf, Tick}

/** Custom-state streaming (SURVEY §2.9 / the streaming extension surface):
  * per-(symbol, bucket) LIVE candles via `mapGroupsWithState`.
  *
  * A watermarked tumbling-window aggregation (ST3,
  * [[StreamingResample.resampleStream]]) only emits a bucket once it
  * finalizes; a live market display needs the current, still-open candle
  * updated every micro-batch — exactly the case for keyed custom state.
  * State per group is the same associative [[OhlcvAggregator.Buf]] the
  * batch UDAF uses, so stream and batch share one fold and agree by
  * construction. (A production deployment bounds state by switching to
  * `EventTimeTimeout` + `state.setTimeoutTimestamp(bucket end + delay)`
  * so closed buckets evict — live buckets per symbol are O(1) either way.)
  */
object LiveCandles {

  final case class TickIn(symbol: String, bucketMs: Long, ts: Long,
      price: Double)
  final case class LiveCandle(symbol: String, bucket: Timestamp,
      open: Double, high: Double, low: Double, close: Double,
      volume: Double, n: Long)

  implicit private val keyEnc: Encoder[(String, Long)] =
    Encoders.tuple(Encoders.STRING, Encoders.scalaLong)
  implicit private val bufEnc: Encoder[Buf] = Encoders.product[Buf]
  implicit private val outEnc: Encoder[LiveCandle] = Encoders.product[LiveCandle]

  /** Fold each micro-batch's ticks into per-(symbol, bucket) state and
    * emit the updated candle. Use with `outputMode("update")`. */
  def stream(ticks: Dataset[TickIn]): Dataset[LiveCandle] =
    ticks.groupByKey(t => (t.symbol, t.bucketMs))
      .mapGroupsWithState[Buf, LiveCandle](GroupStateTimeout.NoTimeout) {
        case ((symbol, bucketMs), batch, state: GroupState[Buf]) =>
          var buf = state.getOption.getOrElse(OhlcvAggregator.empty)
          batch.foreach(t => buf = OhlcvAggregator.agg.reduce(buf, Tick(t.ts, t.price)))
          state.update(buf)
          LiveCandle(symbol, new Timestamp(bucketMs), buf.open, buf.high,
            buf.low, buf.close, buf.volume, buf.n)
      }

  /** Event-time tick for the bounded-state variant (`ts` doubles as the
    * watermark column). */
  final case class TickEvt(symbol: String, bucketMs: Long, ts: Timestamp,
      price: Double)
  /** Live candle with a finalization flag: `closed = true` is the bucket's
    * LAST emission, fired when its state evicts. */
  final case class LiveCandleF(symbol: String, bucket: Timestamp,
      open: Double, high: Double, low: Double, close: Double,
      volume: Double, n: Long, closed: Boolean)

  implicit private val outFEnc: Encoder[LiveCandleF] =
    Encoders.product[LiveCandleF]

  /** Bounded-state live candles — the production form the [[stream]]
    * scaladoc promises: `EventTimeTimeout` + a per-bucket timeout at
    * bucket end, so a (symbol, bucket) state row lives only until the
    * watermark passes the bucket (plus the watermark delay). The timed-out
    * call emits the candle once more with `closed = true` and removes the
    * state — total state is O(open buckets per key), not O(history).
    * Input MUST be watermarked on `ts` (event time).
    *
    * `closed = true` is GUARANTEED to be the bucket's last emission:
    * `flatMapGroupsWithState` (not `map`) so ticks arriving after their
    * bucket's state evicted are dropped without output — the engine does
    * not late-filter inputs to arbitrary-state operators itself, and
    * re-folding such stragglers would re-create empty state and fire a
    * SECOND `closed` candle holding only the late ticks. Dropping is the
    * watermark contract: data later than the delay has no guarantees. */
  def streamEvicting(ticks: Dataset[TickEvt],
      bucketWidthMs: Long): Dataset[LiveCandleF] =
    ticks.groupByKey(t => (t.symbol, t.bucketMs))
      .flatMapGroupsWithState[Buf, LiveCandleF](
        org.apache.spark.sql.streaming.OutputMode.Update,
        GroupStateTimeout.EventTimeTimeout) {
        case ((symbol, bucketMs), batch, state: GroupState[Buf]) =>
          if (state.hasTimedOut) {
            val buf = state.get
            state.remove()
            Iterator.single(LiveCandleF(symbol, new Timestamp(bucketMs),
              buf.open, buf.high, buf.low, buf.close, buf.volume, buf.n,
              closed = true))
          } else if (!state.exists &&
              bucketMs + bucketWidthMs <= state.getCurrentWatermarkMs()) {
            // late resurrection: this bucket already closed and evicted —
            // swallow the stragglers, leave no state, emit nothing
            Iterator.empty
          } else {
            var buf = state.getOption.getOrElse(OhlcvAggregator.empty)
            batch.foreach(t =>
              buf = OhlcvAggregator.agg.reduce(buf,
                Tick(t.ts.getTime * 1000L, t.price)))
            state.update(buf)
            // evict when the watermark passes bucket end; clamp above the
            // current watermark (required by the API for late buckets)
            state.setTimeoutTimestamp(math.max(bucketMs + bucketWidthMs,
              state.getCurrentWatermarkMs() + 1))
            Iterator.single(LiveCandleF(symbol, new Timestamp(bucketMs),
              buf.open, buf.high, buf.low, buf.close, buf.volume, buf.n,
              closed = false))
          }
      }
}
