package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed OHLCV candle aggregator (SURVEY §2.10): the A2 candle fold as a
  * reusable `Aggregator`, registrable via `udaf()` for SQL use.
  *
  * Functionally equivalent to the `min_by`/`max_by` formulation in
  * [[graft.engine.Ohlcv.resampleTicks]] (which stays the preferred,
  * codegen-friendly path); this form exists for (a) the UDAF extension
  * surface and (b) embedding the candle fold in typed Dataset pipelines.
  * The merge is associative/commutative — safe under partial aggregation
  * on any partitioning.
  */
object OhlcvAggregator {

  /** (tsMicros, price) input; buffer tracks earliest/latest tick plus
    * running extrema. */
  final case class Tick(ts: Long, price: Double)
  final case class Buf(firstTs: Long, open: Double, high: Double,
      low: Double, lastTs: Long, close: Double, volume: Double, n: Long)
  final case class Candle(open: Double, high: Double, low: Double,
      close: Double, volume: Double, n: Long)

  val empty: Buf = Buf(Long.MaxValue, 0, Double.MinValue, Double.MaxValue,
    Long.MinValue, 0, 0, 0)

  val agg: Aggregator[Tick, Buf, Candle] = new Aggregator[Tick, Buf, Candle] {
    override def zero: Buf = empty
    override def reduce(b: Buf, t: Tick): Buf = Buf(
      if (t.ts < b.firstTs) t.ts else b.firstTs,
      if (t.ts < b.firstTs) t.price else b.open,
      math.max(b.high, t.price), math.min(b.low, t.price),
      if (t.ts > b.lastTs) t.ts else b.lastTs,
      if (t.ts > b.lastTs) t.price else b.close,
      b.volume + t.price, b.n + 1)
    override def merge(a: Buf, b: Buf): Buf =
      if (a.n == 0) b else if (b.n == 0) a
      else Buf(
        math.min(a.firstTs, b.firstTs),
        if (a.firstTs <= b.firstTs) a.open else b.open,
        math.max(a.high, b.high), math.min(a.low, b.low),
        math.max(a.lastTs, b.lastTs),
        if (a.lastTs >= b.lastTs) a.close else b.close,
        a.volume + b.volume, a.n + b.n)
    override def finish(b: Buf): Candle =
      Candle(b.open, b.high, b.low, b.close, b.volume, b.n)
    override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
    override def outputEncoder: Encoder[Candle] = Encoders.product[Candle]
  }
}
