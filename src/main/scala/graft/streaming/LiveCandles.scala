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
}
