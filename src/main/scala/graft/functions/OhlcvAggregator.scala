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
  * on any partitioning — INCLUDING duplicate timestamps: ties on
  * firstTs/lastTs break on price ((ts, price) lexicographic for open,
  * (ts, price) max for close), not on arrival/merge order. On unique-ts
  * groups (the engine's documented total-order precondition, and what
  * the oracle's `min_by(value, ts)` is well-defined over) this is
  * byte-identical to the untied rule; on tied data it is the difference
  * between a deterministic answer and one that changes with partition
  * combine order.
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
    // commutative tie rules: open = price of lexicographic-min
    // (ts, price); close = price of lexicographic-max (ts, price)
    private def openOf(ts1: Long, p1: Double, ts2: Long, p2: Double) =
      if (ts1 < ts2 || (ts1 == ts2 && p1 <= p2)) p1 else p2
    private def closeOf(ts1: Long, p1: Double, ts2: Long, p2: Double) =
      if (ts1 > ts2 || (ts1 == ts2 && p1 >= p2)) p1 else p2

    override def reduce(b: Buf, t: Tick): Buf = Buf(
      math.min(b.firstTs, t.ts),
      if (b.n == 0) t.price else openOf(b.firstTs, b.open, t.ts, t.price),
      math.max(b.high, t.price), math.min(b.low, t.price),
      math.max(b.lastTs, t.ts),
      if (b.n == 0) t.price else closeOf(b.lastTs, b.close, t.ts, t.price),
      b.volume + t.price, b.n + 1)
    override def merge(a: Buf, b: Buf): Buf =
      if (a.n == 0) b else if (b.n == 0) a
      else Buf(
        math.min(a.firstTs, b.firstTs),
        openOf(a.firstTs, a.open, b.firstTs, b.open),
        math.max(a.high, b.high), math.min(a.low, b.low),
        math.max(a.lastTs, b.lastTs),
        closeOf(a.lastTs, a.close, b.lastTs, b.close),
        a.volume + b.volume, a.n + b.n)
    override def finish(b: Buf): Candle =
      Candle(b.open, b.high, b.low, b.close, b.volume, b.n)
    override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
    override def outputEncoder: Encoder[Candle] = Encoders.product[Candle]
  }
}
