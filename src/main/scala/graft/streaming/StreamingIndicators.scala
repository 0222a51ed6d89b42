package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Recursive indicators as streaming state — EMA and MACD.
  *
  * Wilder/standard EMA (`ema_t = α·x_t + (1−α)·ema_{t−1}`) is RECURSIVE:
  * it is not expressible as a window-frame aggregate, which is why the
  * batch [[graft.engine.Indicators]] layer deliberately carries Cutler's
  * SMA-based RSI and Bollinger instead (see q51's scaladoc). But a
  * recursion over time IS a keyed streaming fold — one O(1) state row per
  * symbol — so the streaming layer is where EMA/MACD belong natively:
  * exactly the [[LiveCandles]] shape with a 4-number state instead of a
  * candle buffer.
  *
  * Ordering contract: input is a FINALIZED-candle stream (e.g.
  * [[StreamingResample.resampleStream]] in append mode), so per symbol the
  * buckets arrive batch-monotonically; within a micro-batch the group's
  * rows are sorted by bucket before folding, and any candle at-or-before
  * the last folded bucket is dropped (the monotone guard — a recursion
  * cannot re-order the past; late data past the upstream watermark has no
  * guarantees, the [[LiveCandles.streamEvicting]] contract).
  *
  * State is O(symbols) rows × O(1) size — no timeout needed; at 100 TB
  * scale the state store holds one 4-double row per instrument. */
object StreamingIndicators {

  final case class CandleIn(symbol: String, bucketMs: Long, close: Double)
  final case class EmaState(lastMs: Long, e12: Double, e26: Double,
      sig: Double, n: Long)
  final case class MacdOut(symbol: String, bucket: Timestamp, close: Double,
      emaFast: Double, emaSlow: Double, macd: Double, signal: Double,
      hist: Double)

  implicit private val stEnc: Encoder[EmaState] = Encoders.product[EmaState]
  implicit private val outEnc: Encoder[MacdOut] = Encoders.product[MacdOut]
  implicit private val keyEnc: Encoder[String] = Encoders.STRING

  def alpha(n: Int): Double = 2.0 / (n + 1)

  /** The per-symbol fold, shared verbatim by the stream and the spec's
    * reference implementation: seed every EMA with its first input
    * (the standard convention), then recurse. Returns the updated state
    * and the emitted row. */
  def step(symbol: String, st: EmaState, bucketMs: Long, close: Double,
      fast: Int, slow: Int, signalN: Int): (EmaState, MacdOut) = {
    val (aF, aS, aG) = (alpha(fast), alpha(slow), alpha(signalN))
    val (e12, e26) =
      if (st.n == 0L) (close, close)
      else (aF * close + (1 - aF) * st.e12, aS * close + (1 - aS) * st.e26)
    val macd = e12 - e26
    val sig = if (st.n == 0L) macd else aG * macd + (1 - aG) * st.sig
    (EmaState(bucketMs, e12, e26, sig, st.n + 1),
      MacdOut(symbol, new Timestamp(bucketMs), close, e12, e26, macd, sig,
        macd - sig))
  }

  /** The micro-batch fold shell every recursive indicator shares: restore
    * state, sort the group's rows by bucket, fold each row STRICTLY after
    * the last folded bucket (the monotone guard), persist the final
    * state. `step` may emit nothing for a row (seed candles). Ordering/
    * guard fixes land here exactly once. */
  private def keyedMonotoneFold[I, S, O](init: S, lastMs: S => Long,
      bucketMs: I => Long, step: (String, S, I) => (S, Option[O]))(
      symbol: String, batch: Iterator[I], state: GroupState[S])
      : Iterator[O] = {
    var st = state.getOption.getOrElse(init)
    val out = Vector.newBuilder[O]
    batch.toVector.sortBy(bucketMs).foreach { c =>
      if (bucketMs(c) > lastMs(st)) {
        val (st2, row) = step(symbol, st, c)
        st = st2
        row.foreach(out += _)
      }
    }
    state.update(st)
    out.result().iterator
  }

  /** EMA(fast/slow) + MACD + signal line over a finalized-candle stream.
    * Use with `outputMode("update")` (one output row per input candle). */
  def macdStream(candles: Dataset[CandleIn], fast: Int = 12, slow: Int = 26,
      signalN: Int = 9): Dataset[MacdOut] =
    candles.groupByKey(_.symbol)
      .flatMapGroupsWithState[EmaState, MacdOut](
        OutputMode.Update, GroupStateTimeout.NoTimeout)(
        keyedMonotoneFold[CandleIn, EmaState, MacdOut](
          EmaState(Long.MinValue, 0d, 0d, 0d, 0L), _.lastMs, _.bucketMs,
          (sym, st, c) => {
            val (st2, row) = step(sym, st, c.bucketMs, c.close,
              fast, slow, signalN)
            (st2, Some(row))
          }))

  // ------------------------------------------------------------------ OBV

  final case class VolCandleIn(symbol: String, bucketMs: Long, close: Double,
      volume: Long)
  final case class ObvState(lastMs: Long, lastClose: Double, obv: Long,
      n: Long)
  final case class ObvOut(symbol: String, bucket: Timestamp, obv: Long)

  implicit private val obvStEnc: Encoder[ObvState] = Encoders.product[ObvState]
  implicit private val obvOutEnc: Encoder[ObvOut] = Encoders.product[ObvOut]

  /** 4-decimal quantization matching the batch layer's `dec4` (Spark SQL
    * `round` = HALF_UP on the double's shortest decimal representation),
    * so the stream's up/down/flat verdicts agree with
    * [[graft.engine.Indicators.obv]] bit for bit. */
  private def q4(c: Double): java.math.BigDecimal =
    java.math.BigDecimal.valueOf(c).setScale(4, java.math.RoundingMode.HALF_UP)

  /** The per-symbol OBV fold (shared by stream and specs): first candle
    * contributes 0; then ±volume by the sign of the quantized delta. */
  def obvStep(st: ObvState, bucketMs: Long, close: Double, volume: Long)
      : (ObvState, Long) = {
    val qc = q4(close)
    val step =
      if (st.n == 0L) 0L
      else {
        val cmp = qc.compareTo(q4(st.lastClose))
        if (cmp > 0) volume else if (cmp < 0) -volume else 0L
      }
    val obv = st.obv + step
    (ObvState(bucketMs, qc.doubleValue, obv, st.n + 1), obv)
  }

  // ------------------------------------------------------- Wilder ATR

  final case class OhlcIn(symbol: String, bucketMs: Long, high: Double,
      low: Double, close: Double)
  final case class AtrState(lastMs: Long, lastClose: Double, atr: Double,
      n: Long)
  final case class AtrOut(symbol: String, bucket: Timestamp, tr: Double,
      atr: Double)

  implicit private val atrStEnc: Encoder[AtrState] = Encoders.product[AtrState]
  implicit private val atrOutEnc: Encoder[AtrOut] = Encoders.product[AtrOut]

  /** Per-symbol Wilder ATR step (shared by stream and spec reference):
    * TR as in the batch indicator (max(h−l, |h−pc|, |l−pc|) on 4-decimal-
    * quantized prices), smoothed recursively — atr_t =
    * (atr_{t−1}·(n−1) + TR_t)/n, seeded with the first TR. The batch
    * layer ([[graft.engine.Indicators.atr]]) deliberately carries the
    * SMA variant (a frame aggregate); Wilder's original smoothing is a
    * recursion, so — like EMA/MACD — its native home is this keyed
    * streaming fold. Returns the updated state and the emitted
    * (tr, atr), or None for the seed candle (no previous close). Like
    * [[step]]/[[obvStep]], it advances `lastMs` ITSELF — the monotone
    * guard's invariant must not depend on callers remembering a copy. */
  def wilderStep(st: AtrState, bucketMs: Long, high: Double, low: Double,
      close: Double, n: Int): (AtrState, Option[(Double, Double)]) = {
    val (h, l, c) = (q4(high), q4(low), q4(close))
    val cd = c.doubleValue
    if (st.n == 0L)
      (AtrState(bucketMs, cd, 0d, 1L), None)
    else {
      val pc = q4(st.lastClose)
      val tr = Seq(h.subtract(l), h.subtract(pc).abs, l.subtract(pc).abs)
        .max.doubleValue
      val atr = if (st.n == 1L) tr else (st.atr * (n - 1) + tr) / n
      (AtrState(bucketMs, cd, atr, st.n + 1), Some((tr, atr)))
    }
  }

  /** Wilder ATR(n) over a finalized-candle stream. Use with
    * `outputMode("update")`; one output row per candle after the seed. */
  def atrStream(candles: Dataset[OhlcIn], n: Int = 14): Dataset[AtrOut] =
    candles.groupByKey(_.symbol)
      .flatMapGroupsWithState[AtrState, AtrOut](
        OutputMode.Update, GroupStateTimeout.NoTimeout)(
        keyedMonotoneFold[OhlcIn, AtrState, AtrOut](
          AtrState(Long.MinValue, 0d, 0d, 0L), _.lastMs, _.bucketMs,
          (sym, st, c) => {
            val (st2, row) =
              wilderStep(st, c.bucketMs, c.high, c.low, c.close, n)
            (st2, row.map { case (tr, atr) =>
              AtrOut(sym, new Timestamp(c.bucketMs), tr, atr) })
          }))

  /** On-balance volume over a finalized-candle stream — the cumulative
    * analogue of [[macdStream]]: an O(1) (lastClose, obv) state per
    * symbol, exact integer accumulation, same monotone-straggler guard.
    * Use with `outputMode("update")`. */
  def obvStream(candles: Dataset[VolCandleIn]): Dataset[ObvOut] =
    candles.groupByKey(_.symbol)
      .flatMapGroupsWithState[ObvState, ObvOut](
        OutputMode.Update, GroupStateTimeout.NoTimeout)(
        keyedMonotoneFold[VolCandleIn, ObvState, ObvOut](
          ObvState(Long.MinValue, 0d, 0L, 0L), _.lastMs, _.bucketMs,
          (sym, st, c) => {
            val (st2, obv) = obvStep(st, c.bucketMs, c.close, c.volume)
            (st2, Some(ObvOut(sym, new Timestamp(c.bucketMs), obv)))
          }))
}
