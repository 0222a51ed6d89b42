package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.StreamingIndicators
import graft.streaming.StreamingIndicators.{CandleIn, EmaState, MacdOut}

/** The streaming MACD fold must equal the sequential reference recursion
  * regardless of micro-batch boundaries or within-batch arrival order,
  * and must drop non-monotone stragglers. */
class StreamingIndicatorsSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def reference(symbol: String,
      rows: Seq[(Long, Double)]): Seq[MacdOut] =
    rows.sortBy(_._1).foldLeft(
      (EmaState(Long.MinValue, 0d, 0d, 0d, 0L), Vector.empty[MacdOut])) {
      case ((st, acc), (ms, close)) =>
        val (st2, row) = StreamingIndicators.step(symbol, st, ms, close,
          12, 26, 9)
        (st2, acc :+ row)
    }._2

  test("streaming MACD equals the reference recursion across micro-batches") {
    val rnd = new scala.util.Random(31)
    val series = Map(
      "A" -> (0 until 60).map(i => (i * 3600000L, 100 + rnd.nextDouble() * 10)),
      "B" -> (0 until 60).map(i => (i * 3600000L, 500 - i * 2.5)))
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[CandleIn]
    val q = StreamingIndicators.macdStream(mem.toDS())
      .writeStream.outputMode("update").format("memory")
      .queryName("macd_out").start()
    try {
      // three micro-batches, shuffled WITHIN each batch (the fold sorts),
      // monotone ACROSS batches (the finalized-candle contract)
      for (chunk <- 0 until 3) {
        val rows = series.toSeq.flatMap { case (sym, s) =>
          s.slice(chunk * 20, chunk * 20 + 20).map { case (ms, c) =>
            CandleIn(sym, ms, c) }
        }
        mem.addData(rnd.shuffle(rows))
        q.processAllAvailable()
      }
      // a straggler at-or-before the last folded bucket must be dropped
      mem.addData(Seq(CandleIn("A", 10 * 3600000L, 9999.0)))
      q.processAllAvailable()
    } finally q.stop()

    val got = spark.table("macd_out").as[MacdOut].collect()
      .groupBy(_.symbol).map { case (s, rows) =>
        s -> rows.sortBy(_.bucket.getTime).toSeq }
    series.foreach { case (sym, s) =>
      val want = reference(sym, s)
      assert(got(sym).size == want.size, s"$sym: straggler not dropped?")
      got(sym).zip(want).foreach { case (g, w) =>
        assert(g == w, s"$sym diverged at ${w.bucket}: $g vs $w") }
    }
  }

  test("streaming Wilder ATR equals the reference recursion, converges to TR on flat range") {
    import graft.streaming.StreamingIndicators.{AtrOut, AtrState, OhlcIn}
    val rnd = new scala.util.Random(53)
    val series = Map(
      "A" -> (0 until 50).map { i =>
        val base = 100 + rnd.nextDouble() * 10
        (i * 3600000L, base + 2, base - 1, base + rnd.nextDouble()) },
      // constant candles with fixed range: TR = 3 always ⇒ ATR → 3
      "B" -> (0 until 50).map(i => (i * 3600000L, 102.0, 99.0, 100.0)))
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[OhlcIn]
    val q = graft.streaming.StreamingIndicators.atrStream(mem.toDS(), n = 14)
      .writeStream.outputMode("update").format("memory")
      .queryName("atr_out").start()
    try {
      for (chunk <- 0 until 3) {
        val rows = series.toSeq.flatMap { case (sym, s) =>
          s.slice(chunk * 17, chunk * 17 + 17).map { case (ms, h, l, c) =>
            OhlcIn(sym, ms, h, l, c) }
        }
        mem.addData(rnd.shuffle(rows))
        q.processAllAvailable()
      }
    } finally q.stop()

    val got = spark.table("atr_out").as[AtrOut].collect()
      .groupBy(_.symbol).map { case (s, rows) =>
        s -> rows.sortBy(_.bucket.getTime).toSeq }
    // sequential reference recursion over the same step function
    series.foreach { case (sym, s) =>
      val want = s.sortBy(_._1).foldLeft(
        (AtrState(Long.MinValue, 0d, 0d, 0L), Vector.empty[(Double, Double)])) {
        case ((st, acc), (ms, h, l, c)) =>
          val (st2, row) = graft.streaming.StreamingIndicators
            .wilderStep(st, ms, h, l, c, 14)
          (st2, row.fold(acc)(acc :+ _))
      }._2
      assert(got(sym).size == want.size)
      got(sym).zip(want).foreach { case (g, (tr, atr)) =>
        assert(g.tr == tr && g.atr == atr, s"$sym diverged at ${g.bucket}") }
    }
    // symbol B: flat-range fixed point — every TR is 3, so ATR is exactly 3
    assert(got("B").forall(r => r.tr == 3.0 && r.atr == 3.0))
  }

  test("streaming OBV equals the batch indicator across micro-batches") {
    import graft.streaming.StreamingIndicators.{ObvOut, VolCandleIn}
    val rnd = new scala.util.Random(47)
    // arbitrary doubles (quantization parity is part of the contract) and
    // deliberate consecutive repeats to exercise the flat-delta branch
    val series = Map(
      "A" -> (0 until 60).map { i =>
        val c = if (i % 7 == 3) 100.0 else 100 + rnd.nextDouble() * 10
        (i * 3600000L, c, 1L + rnd.nextInt(50)) },
      "B" -> (0 until 60).map(i =>
        (i * 3600000L, 500 - i * 2.5, 5L)))
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[VolCandleIn]
    val q = graft.streaming.StreamingIndicators.obvStream(mem.toDS())
      .writeStream.outputMode("update").format("memory")
      .queryName("obv_out").start()
    try {
      for (chunk <- 0 until 3) {
        val rows = series.toSeq.flatMap { case (sym, s) =>
          s.slice(chunk * 20, chunk * 20 + 20).map { case (ms, c, v) =>
            VolCandleIn(sym, ms, c, v) }
        }
        mem.addData(rnd.shuffle(rows))
        q.processAllAvailable()
      }
      mem.addData(Seq(VolCandleIn("A", 10 * 3600000L, 9999.0, 1000L)))
      q.processAllAvailable()
    } finally q.stop()

    val got = spark.table("obv_out").as[ObvOut].collect()
      .map(r => (r.symbol, r.bucket.getTime) -> r.obv).toMap
    val batchDf = series.toSeq.flatMap { case (sym, s) =>
      s.map { case (ms, c, v) => (sym, msTs(ms), c, v) } }
      .toDF("symbol", "bucket", "close", "volume")
    val want = graft.engine.Indicators.obv(batchDf, "symbol").collect()
      .map(r => (r.getAs[String]("symbol"),
        r.getAs[java.sql.Timestamp]("bucket").getTime) ->
        r.getAs[Long]("obv")).toMap
    assert(got.size == want.size, "straggler not dropped or rows missing")
    assert(got == want, "streamed OBV diverged from the batch indicator")
  }
}
