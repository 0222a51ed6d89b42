package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.engine.Indicators

/** Indicator-math invariants beyond the driver's oracle equality:
  * closed-form limits (constant / monotone series) and definition
  * cross-checks on synthetic candles. */
class IndicatorsSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  private def candles(prices: Seq[Double]) =
    prices.zipWithIndex
      .map { case (p, i) => ("S", msTs(i * 60000L), p) }
      .toDF("symbol", "bucket", "close")

  test("vwap: unit quantities degenerate to the plain mean") {
    val ticks = Seq(
      ("S", ts("2024-01-01 10:00:05"), 10.0, 1L),
      ("S", ts("2024-01-01 10:20:00"), 20.0, 1L),
      ("S", ts("2024-01-01 10:59:59"), 30.0, 1L),
      ("S", ts("2024-01-01 11:00:00"), 99.0, 5L))
      .toDF("symbol", "ts", "price", "qty")
    val out = Indicators.vwap(ticks, "1h", "symbol", "ts", "price", "qty")
      .orderBy("bucket").collect()
    assert(out.length == 2)
    assert(out(0).getAs[Double]("vwap") == 20.0) // (10+20+30)/3
    assert(out(0).getAs[Long]("n_trades") == 3L)
    assert(out(1).getAs[Double]("vwap") == 99.0)
    assert(out(1).getAs[Long]("qty") == 5L)
  }

  test("vwap: weights shift the mean toward the heavy trade") {
    val ticks = Seq(
      ("S", ts("2024-01-01 10:00:00"), 10.0, 1L),
      ("S", ts("2024-01-01 10:30:00"), 20.0, 3L))
      .toDF("symbol", "ts", "price", "qty")
    val out = Indicators.vwap(ticks, "1h", "symbol", "ts", "price", "qty")
      .collect()
    assert(out.head.getAs[Double]("vwap") == 17.5) // (10 + 60) / 4
  }

  test("vwap: qty >= 1e9 fails loudly instead of silently skewing") {
    // decimal(9,0) caps exact accumulation at |qty| < 1e9; in non-ANSI
    // Spark the overflow would cast to NULL and vanish from pq while
    // still counting in qty — the guard must raise instead
    val ticks = Seq(
      ("S", ts("2024-01-01 10:00:00"), 10.0, 1_000_000_000L),
      ("S", ts("2024-01-01 10:30:00"), 20.0, 3L))
      .toDF("symbol", "ts", "price", "qty")
    val e = intercept[Exception] {
      Indicators.vwap(ticks, "1h", "symbol", "ts", "price", "qty").collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("overflows exact decimal")))
    // just under the bound still computes exactly
    val ok = Seq(("S", ts("2024-01-01 10:00:00"), 10.0, 999_999_999L))
      .toDF("symbol", "ts", "price", "qty")
    assert(Indicators.vwap(ok, "1h", "symbol", "ts", "price", "qty")
      .collect().head.getAs[Double]("vwap") == 10.0)
  }

  test("volatility: constant series has zero volatility") {
    val out = Indicators.volatility(candles(Seq.fill(50)(42.0)), "symbol")
      .collect()
    assert(out.length == 1)
    assert(out.head.getAs[Double]("vol") == 0.0)
    assert(out.head.getAs[Long]("n_ret") == 49L)
  }

  test("volatility: alternating series matches the closed form") {
    // returns alternate ±ln(2) (rounded to 8 dp); sample stddev of a
    // balanced ±x sequence is sqrt(n/(n-1))·x
    val prices = Seq.tabulate(11)(i => if (i % 2 == 0) 100.0 else 200.0)
    val out = Indicators.volatility(candles(prices), "symbol").collect()
    val x = BigDecimal(math.log(2.0))
      .setScale(8, BigDecimal.RoundingMode.HALF_UP).toDouble
    val n = 10.0
    val expected = math.sqrt(n / (n - 1.0)) * x
    val got = out.head.getAs[Double]("vol")
    assert(math.abs(got - expected) < 1e-6, s"got $got expected $expected")
  }

  test("bollinger: constant series collapses the band to the price") {
    val out = Indicators.bollinger(candles(Seq.fill(30)(7.5)), "symbol")
      .orderBy("bucket").collect()
    assert(out.length == 11) // 30 - 19 full windows
    out.foreach { r =>
      assert(r.getAs[Double]("mid") == 7.5)
      assert(r.getAs[Double]("upper") == 7.5)
      assert(r.getAs[Double]("lower") == 7.5)
    }
  }

  test("bollinger: mid equals the independent rolling mean") {
    val rnd = new scala.util.Random(7)
    val prices = Seq.fill(60)(50.0 + rnd.nextDouble() * 10)
    val out = Indicators.bollinger(candles(prices), "symbol", n = 20)
      .orderBy("bucket").collect()
    val rounded = prices.map(p => BigDecimal(p)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP))
    out.zipWithIndex.foreach { case (r, j) =>
      val w = rounded.slice(j, j + 20)
      val mean = (w.sum / 20).toDouble
      assert(math.abs(r.getAs[Double]("mid") - mean) < 1e-6)
      assert(r.getAs[Double]("upper") >= r.getAs[Double]("mid"))
      assert(r.getAs[Double]("lower") <= r.getAs[Double]("mid"))
    }
  }

  test("rsi: monotone rise pins to 100, monotone fall to 0, range holds") {
    val up = Indicators.rsi(candles((1 to 30).map(_.toDouble)), "symbol")
      .collect()
    assert(up.nonEmpty)
    up.foreach(r => assert(r.getAs[Double]("rsi") == 100.0))
    val down = Indicators.rsi(candles((1 to 30).reverse.map(_.toDouble)),
      "symbol").collect()
    down.foreach(r => assert(r.getAs[Double]("rsi") == 0.0))
    val rnd = new scala.util.Random(11)
    val mixed = Indicators.rsi(
      candles(Seq.fill(60)(100.0 + rnd.nextDouble() * 20)), "symbol").collect()
    assert(mixed.nonEmpty)
    mixed.foreach { r =>
      val v = r.getAs[Double]("rsi")
      assert(v >= 0.0 && v <= 100.0)
    }
  }

  test("correlation: co-moving pairs hit +1, opposing pairs hit -1") {
    // A and B double together; C moves exactly opposite (halves when they
    // double) — log returns are ±ln2 aligned/anti-aligned
    val series = (0 until 30).flatMap { i =>
      val up = if (i % 2 == 0) 100.0 else 200.0
      val dn = if (i % 2 == 0) 200.0 else 100.0
      Seq(("A", msTs(i * 60000L), up), ("B", msTs(i * 60000L), up),
        ("C", msTs(i * 60000L), dn))
    }.toDF("symbol", "bucket", "close")
    val out = Indicators.correlationMatrix(series, "symbol", minObs = 10)
      .collect().map(r => (r.getAs[String]("sym_a"),
        r.getAs[String]("sym_b")) -> r.getAs[Double]("corr")).toMap
    assert(out(("A", "B")) == 1.0)
    assert(out(("A", "C")) == -1.0)
    assert(out(("B", "C")) == -1.0)
    assert(out.size == 3, "exactly the 3 unordered pairs, no self-pairs")
  }

  test("correlation: constant series yields NULL, minObs filters") {
    val series = ((0 until 30).map(i => ("X", msTs(i * 60000L), 100.0)) ++
      (0 until 30).map(i => ("Y", msTs(i * 60000L),
        if (i % 2 == 0) 10.0 else 20.0)) ++
      (0 until 3).map(i => ("Z", msTs(i * 60000L),
        if (i % 2 == 0) 10.0 else 20.0)))
      .toDF("symbol", "bucket", "close")
    val rows = Indicators.correlationMatrix(series, "symbol", minObs = 10)
      .collect()
    // X is constant → zero variance → NULL corr for (X, Y)
    val xy = rows.find(r => r.getAs[String]("sym_a") == "X" &&
      r.getAs[String]("sym_b") == "Y").get
    assert(xy.isNullAt(xy.fieldIndex("corr")))
    // Z has only 2 returns → below minObs → absent entirely
    assert(!rows.exists(r => r.getAs[String]("sym_a") == "Z" ||
      r.getAs[String]("sym_b") == "Z"))
  }

  test("rolling beta: clones of the index have beta 1; zero-variance index is NULL") {
    // three identical symbols → each IS the equal-weight index → β = 1
    val rnd = new scala.util.Random(3)
    val path = Seq.iterate(100.0, 40)(p => p * (0.9 + rnd.nextDouble() * 0.2))
    val clones = Seq("A", "B", "C").flatMap(sym =>
      path.zipWithIndex.map { case (p, i) => (sym, msTs(i * 86400000L), p) })
      .toDF("symbol", "bucket", "close")
    val b1 = Indicators.rollingBeta(clones, "symbol", n = 15).collect()
    assert(b1.nonEmpty)
    b1.foreach(r => assert(r.getAs[Double]("beta") == 1.0,
      s"clone beta ${r.getAs[Double]("beta")} != 1"))
    // two mirror symbols: returns cancel → market return 0 → var_m = 0 → NULL
    val mirror = (path.zipWithIndex.map { case (p, i) =>
        ("U", msTs(i * 86400000L), p) } ++
      path.zipWithIndex.map { case (p, i) =>
        ("D", msTs(i * 86400000L), 10000.0 / p) })
      .toDF("symbol", "bucket", "close")
    val b2 = Indicators.rollingBeta(mirror, "symbol", n = 15).collect()
    assert(b2.nonEmpty)
    b2.foreach(r => assert(r.isNullAt(r.fieldIndex("beta"))))
  }

  test("max drawdown: localizes the trough and pins the closed form") {
    // rise to 200, crash to 80 (dd = -0.6), partial recovery
    val prices = Seq(100.0, 150.0, 200.0, 120.0, 80.0, 140.0)
    val out = Indicators.maxDrawdown(candles(prices), "symbol").collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[Double]("max_drawdown") == -0.6)
    assert(r.getAs[Double]("peak") == 200.0)
    assert(r.getAs[Double]("trough") == 80.0)
    assert(r.getAs[java.sql.Timestamp]("trough_bucket").getTime == 4 * 60000L)
    // monotone rise: dd stays 0; earliest bucket wins the tie
    val up = Indicators.maxDrawdown(
      candles((1 to 10).map(_.toDouble)), "symbol").collect().head
    assert(up.getAs[Double]("max_drawdown") == 0.0)
    assert(up.getAs[java.sql.Timestamp]("trough_bucket").getTime == 0L)
  }

  test("volatility partials: merged state equals full recompute at any split") {
    import org.apache.spark.sql.expressions.Window
    val rnd = new scala.util.Random(29)
    val series = (for {
      sym <- Seq("A", "B", "C")
      i <- 0 until 80
    } yield (sym, msTs(i * 3600000L), 50.0 + rnd.nextDouble() * 30))
      .toDF("symbol", "bucket", "close")
    val full = Indicators.volatility(series, "symbol")
      .orderBy("symbol").collect().toSeq
    for (cutHour <- Seq(1, 7, 40, 79)) {
      val cut = msTs(cutHour * 3600000L)
      val oldC = series.filter(col("bucket") < lit(cut))
      val newC = series.filter(col("bucket") >= lit(cut))
      val lastOld = oldC.withColumn("_rn", row_number().over(
          Window.partitionBy("symbol").orderBy(col("bucket").desc)))
        .filter(col("_rn") === 1).drop("_rn")
      val merged = Indicators.mergeVolatility(
        Indicators.volatilityPartial(oldC, "symbol").unionByName(
          Indicators.volatilityPartial(lastOld.unionByName(newC), "symbol")),
        "symbol").orderBy("symbol").collect().toSeq
      assert(merged == full, s"split at hour $cutHour diverged")
    }
  }

  private def ohlc(rows: Seq[(Double, Double, Double)]) =
    rows.zipWithIndex
      .map { case ((h, l, c), i) => ("S", msTs(i * 60000L), h, l, c) }
      .toDF("symbol", "bucket", "high", "low", "close")

  test("atr: flat series has zero true range") {
    val out = Indicators.atr(
      ohlc(Seq.fill(20)((42.0, 42.0, 42.0))), "symbol", n = 14).collect()
    // first bucket drops (no prev close), then only full windows emit
    assert(out.length == 20 - 1 - 13)
    assert(out.forall(_.getAs[Double]("atr") == 0.0))
  }

  test("atr: close-to-close gaps dominate when buckets have no range") {
    // degenerate candles (h=l=c) alternating 100/200: TR = |Δclose| = 100
    val prices = Seq.tabulate(20)(i => if (i % 2 == 0) 100.0 else 200.0)
    val out = Indicators.atr(ohlc(prices.map(p => (p, p, p))), "symbol",
      n = 14).collect()
    assert(out.nonEmpty)
    assert(out.forall(_.getAs[Double]("tr") == 100.0))
    assert(out.forall(_.getAs[Double]("atr") == 100.0))
  }

  test("atr: intra-bucket range dominates when closes are flat") {
    // high = c+2, low = c−1, close flat: TR = max(3, 2, 1) = 3
    val out = Indicators.atr(
      ohlc(Seq.fill(16)((102.0, 99.0, 100.0))), "symbol", n = 14).collect()
    assert(out.forall(_.getAs[Double]("tr") == 3.0))
    assert(out.forall(_.getAs[Double]("atr") == 3.0))
  }

  test("atr: short windows emit nothing until n true ranges exist") {
    val out = Indicators.atr(
      ohlc(Seq.fill(6)((10.0, 9.0, 9.5))), "symbol", n = 3).collect()
    assert(out.length == 6 - 1 - 2)
  }

  test("obv: signed volume accumulates, flat deltas contribute nothing") {
    val rows = Seq(
      // (close, volume): up +10, down -5, flat 0, up +7
      (100.0, 3L), (101.0, 10L), (100.5, 5L), (100.5, 99L), (101.0, 7L))
      .zipWithIndex.map { case ((c, v), i) => ("S", msTs(i * 60000L), c, v) }
      .toDF("symbol", "bucket", "close", "volume")
    val out = Indicators.obv(rows, "symbol").orderBy("bucket").collect()
      .map(_.getAs[Long]("obv")).toSeq
    assert(out == Seq(0L, 10L, 5L, 5L, 12L))
  }

  test("stochastic: close at channel extremes pins %K to 100/0, flat to 50") {
    // monotone rise: close == rolling high → %K = 100 everywhere
    val rise = ohlc(Seq.tabulate(20)(i => (100.0 + i, 99.0 + i, 100.0 + i)))
    val kUp = Indicators.stochastic(rise, "symbol", n = 5, d = 3).collect()
    assert(kUp.nonEmpty)
    assert(kUp.forall(_.getAs[Double]("pct_k") == 100.0))
    assert(kUp.forall(_.getAs[Double]("pct_d") == 100.0))
    // flat channel: hh == ll → pinned to 50 before any division
    val flat = ohlc(Seq.fill(10)((7.0, 7.0, 7.0)))
    val kFlat = Indicators.stochastic(flat, "symbol", n = 5, d = 3).collect()
    assert(kFlat.forall(_.getAs[Double]("pct_k") == 50.0))
    assert(kFlat.forall(_.getAs[Double]("pct_d") == 50.0))
  }

  test("stochastic: mid-channel close computes the exact ratio") {
    // channel [90, 110], close 95 → %K = 25; constant series → %D = 25
    val out = Indicators.stochastic(
      ohlc(Seq.fill(10)((110.0, 90.0, 95.0))), "symbol", n = 5, d = 3)
      .collect()
    assert(out.forall(_.getAs[Double]("pct_k") == 25.0))
    assert(out.forall(_.getAs[Double]("pct_d") == 25.0))
    // warm-up: n−1 channel rows + d−1 %D rows never emit
    assert(out.length == 10 - 4 - 2)
  }

  test("candle patterns: each flag fires on its textbook shape only") {
    // (open, high, low, close) per bucket, one symbol
    val rows = Seq(
      (100.0, 110.0, 90.0, 100.2),   // doji: body 0.2 ≤ 10% of range 20
      (100.0, 101.2, 95.0, 101.0),   // hammer: shadow 5 ≥ 2·body(1), upper 0.2 ≤ body
      (105.0, 105.5, 102.8, 103.0),  // plain bearish candle (none fire)
      (102.5, 106.0, 102.0, 105.5),  // bull engulf: wraps prior 105→103 body
      (106.0, 106.5, 101.5, 102.0),  // bear engulf: wraps prior 102.5→105.5 body
      (102.0, 102.0, 102.0, 102.0))  // single-tick: doji yes, hammer MUST NOT fire
      .zipWithIndex.map { case ((o, h, l, c), i) =>
        ("S", msTs(i * 60000L), o, h, l, c) }
      .toDF("symbol", "bucket", "open", "high", "low", "close")
    val out = Indicators.candlePatterns(rows, "symbol")
      .orderBy("bucket").collect()
    def flags(i: Int) = (out(i).getAs[Boolean]("doji"),
      out(i).getAs[Boolean]("hammer"), out(i).getAs[Boolean]("bull_engulf"),
      out(i).getAs[Boolean]("bear_engulf"))
    assert(flags(0) == ((true, false, false, false)))
    assert(flags(1) == ((false, true, false, false)))
    assert(flags(2) == ((false, false, false, false)))
    assert(flags(3) == ((false, false, true, false)))
    assert(flags(4) == ((false, false, false, true)))
    assert(flags(5) == ((true, false, false, false)),
      "zero-range candle is a doji but must never fake a hammer")
  }

  test("keltner: flat series collapses the channel onto the close") {
    val out = Indicators.keltner(
      ohlc(Seq.fill(30)((42.0, 42.0, 42.0))), "symbol", n = 20, m = 14)
      .collect()
    assert(out.length == 30 - 1 - 19)
    out.foreach { r =>
      assert(r.getAs[Double]("mid") == 42.0)
      assert(r.getAs[Double]("upper") == 42.0)
      assert(r.getAs[Double]("lower") == 42.0)
    }
  }

  test("keltner: constant range widens the band by exactly k·ATR") {
    // h=c+2, l=c−1, flat close: TR = 3 ⇒ band = 1.5·3 = 4.5 around mid=100
    val out = Indicators.keltner(
      ohlc(Seq.fill(30)((102.0, 99.0, 100.0))), "symbol", n = 20, m = 14,
      k = 1.5).collect()
    out.foreach { r =>
      assert(r.getAs[Double]("mid") == 100.0)
      assert(r.getAs[Double]("upper") == 104.5)
      assert(r.getAs[Double]("lower") == 95.5)
    }
  }

  test("blocked correlation matrix is bit-identical to the plain form") {
    // 12 symbols × 40 daily buckets with per-symbol drift/phase so
    // correlations are non-trivial; nBlocks chosen to NOT divide the
    // symbol count (uneven cells) and exceed it in one case (empty cells)
    val candles = (for {
      s <- 0 until 12
      i <- 0 until 40
    } yield (s"SYM$s", msTs(i * 86400000L),
      100.0 + 5 * math.sin(0.3 * i + s) + 0.5 * s * i % 7))
      .toDF("symbol", "bucket", "close")
    val plain = Indicators.correlationMatrix(candles, "symbol", minObs = 10)
      .orderBy("sym_a", "sym_b").collect().toSeq
    for (nBlocks <- Seq(1, 5, 16)) {
      val blocked = Indicators.correlationMatrixBlocked(candles, "symbol",
        minObs = 10, nBlocks = nBlocks)
        .orderBy("sym_a", "sym_b").collect().toSeq
      assert(blocked == plain, s"divergence at nBlocks=$nBlocks")
    }
    assert(plain.size == 12 * 11 / 2, "matrix not complete")
  }

  test("blocked correlation refuses an over-budget universe unless opted in") {
    // 12 symbols = 66 pairs; maxPairs=50 must refuse BEFORE any S² work
    val candles = (for {
      s <- 0 until 12
      i <- 0 until 15
    } yield (s"SYM$s", msTs(i * 86400000L), 100.0 + i + s))
      .toDF("symbol", "bucket", "close")
    val e = intercept[IllegalArgumentException] {
      Indicators.correlationMatrixBlocked(candles, "symbol", minObs = 2,
        maxPairs = 50)
    }
    assert(e.getMessage.contains("66 pairs exceeds maxPairs=50"))
    assert(e.getMessage.contains("unbounded=true"))
    // the explicit opt-in launches the same matrix the guard refused
    val out = Indicators.correlationMatrixBlocked(candles, "symbol",
      minObs = 2, maxPairs = 50, unbounded = true).collect()
    assert(out.length == 66)
    // and a universe inside the budget needs no opt-in
    assert(Indicators.correlationMatrixBlocked(candles, "symbol",
      minObs = 2, maxPairs = 66).collect().length == 66)
  }

  test("sampled correlation: budget respected, values bit-identical to the full matrix") {
    // 40 symbols = 780 pairs; targetPairs=100 keeps ~√(100/780) ≈ 36% of
    // symbols ≈ 14 → ~95 expected pairs
    val candles = (for {
      s <- 0 until 40
      i <- 0 until 30
    } yield (s"SYM$s", msTs(i * 86400000L),
      100.0 + 5 * math.sin(0.3 * i + s) + 0.1 * s))
      .toDF("symbol", "bucket", "close")
    val full = Indicators.correlationMatrixBlocked(candles, "symbol",
      minObs = 10, unbounded = true)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.toSeq).toMap
    val sampled = Indicators.correlationMatrixSampled(candles, "symbol",
      minObs = 10, targetPairs = 100).collect()
    assert(sampled.nonEmpty, "sample came back empty")
    assert(sampled.length < 780 / 2,
      s"sampling barely reduced the matrix: ${sampled.length} pairs")
    // every sampled pair carries EXACTLY its full-matrix row
    sampled.foreach { r =>
      val k = (r.getString(0), r.getString(1))
      assert(full(k) == r.toSeq, s"sampled pair $k diverged from full matrix")
    }
    // determinism: same input → same sample, no RNG anywhere
    val again = Indicators.correlationMatrixSampled(candles, "symbol",
      minObs = 10, targetPairs = 100).collect()
    assert(again.map(_.toSeq).toSeq == sampled.map(_.toSeq).toSeq)
    // a universe inside the budget passes through complete
    val complete = Indicators.correlationMatrixSampled(candles, "symbol",
      minObs = 10, targetPairs = 1000).collect()
    assert(complete.length == 780)
  }

  test("vwap: NULL qty rows are skipped, not an overflow error") {
    // pre-guard semantics: null qty vanishes from pq AND qty sums but
    // still counts in n_trades (count(lit(1)) counts rows, not qty)
    val ticks = Seq(
      ("A", msTs(0L), 10.0, Some(2L)),
      ("A", msTs(1000L), 20.0, None),
      ("A", msTs(2000L), 30.0, Some(2L)))
      .toDF("symbol", "ts", "price", "qty")
    val out = Indicators.vwap(ticks, "1h", "symbol", "ts", "price", "qty")
      .collect()
    assert(out.length == 1)
    assert(out.head.getAs[Double]("vwap") == 20.0) // (10·2+30·2)/4
    assert(out.head.getAs[Long]("qty") == 4L)
    assert(out.head.getAs[Long]("n_trades") == 3L)
  }

  test("indicators are symbol-local: two symbols never mix") {
    val two = (Seq.tabulate(40)(i => ("A", msTs(i * 60000L), 10.0 + i)) ++
      Seq.tabulate(40)(i => ("B", msTs(i * 60000L), 500.0 - i)))
      .toDF("symbol", "bucket", "close")
    val rsi = Indicators.rsi(two, "symbol").collect()
    assert(rsi.filter(_.getAs[String]("symbol") == "A")
      .forall(_.getAs[Double]("rsi") == 100.0))
    assert(rsi.filter(_.getAs[String]("symbol") == "B")
      .forall(_.getAs[Double]("rsi") == 0.0))
  }
}
