package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Technical-indicator layer over candle series — the analytics a user of
  * the reference framework computes downstream of its OHLCV loads
  * (reference: binance_data_framework/colab_interface.py:467-499 plots the
  * loaded candles; everything a plot overlay needs — VWAP, volatility,
  * Bollinger bands, RSI — starts from the same frame).
  *
  * All indicators are a SINGLE window pass per symbol: hash-partition on
  * the symbol column, sort within partition by bucket. At 100 TB the
  * candle store is bucketed on symbol ([[Store.saveBucketed]]), so the
  * exchange disappears entirely and the window runs straight off the scan.
  * Nothing here shuffles twice and nothing is driver-side.
  *
  * Oracle-parity arithmetic (see [[Queries]] header): every rolling sum
  * runs over DECIMAL-cast prices — exact and order-independent — and the
  * few genuinely-float steps (ln, sqrt, final ratios) are computed by the
  * IDENTICAL expression on identical inputs in both engines, then rounded.
  */
object Indicators {

  /** Price quantized to 4 decimals as an exact decimal — the shared
    * currency of every rolling sum below. */
  private def dec4(c: Column): Column = round(c, 4).cast("decimal(18,4)")

  /** A qty that survives the exact-decimal product below. DECIMAL(9,0)
    * keeps the product inside exact decimal in BOTH engines (a raw BIGINT
    * multiplicand would push DuckDB's result type past width 38 and
    * silently degrade it to DOUBLE) — but in non-ANSI Spark a qty ≥ 1e9
    * would cast to NULL and silently VANISH from the pq numerator while
    * still counting in qty/n_trades, skewing the VWAP with no error. The
    * guard turns that silent corruption into a loud failure.
    *
    * NULL qty is NOT an overflow: it passes through as NULL (the decimal
    * sum skips it — the pre-guard semantics). Without the explicit arm,
    * `abs(null) < 1e9` is NULL, the `otherwise` branch fires, and a
    * nullable qty column aborts the whole vwap with a misleading
    * overflow message. */
  private[graft] def qtyDec9(q: Column): Column =
    when(q.isNull, lit(null).cast("decimal(9,0)"))
      .when(abs(q) < lit(1000000000L), q.cast("decimal(9,0)"))
      .otherwise(raise_error(concat(
        lit("vwap: qty magnitude >= 1e9 overflows exact decimal(9,0) "
          + "accumulation; pre-aggregate or rescale qty first (got "),
        q.cast("string"), lit(")"))).cast("decimal(9,0)"))

  /** Volume-weighted average price per (symbol, bucket): Σ(p·q)/Σq with
    * the numerator accumulated in exact decimal. One partial-aggregated
    * hash agg — the same shape (and cost) as the plain resample.
    * Trades with qty ≥ 1e9 fail loudly (see [[qtyDec9]]). */
  def vwap(ticks: DataFrame, timeframe: String, symbolCol: String,
      tsCol: String, priceCol: String, qtyCol: String): DataFrame =
    ticks
      .groupBy(col(symbolCol), Ohlcv.bucket(col(tsCol), timeframe).as("bucket"))
      .agg(
        sum(dec4(col(priceCol)) * qtyDec9(col(qtyCol))).as("pq"),
        sum(col(qtyCol)).as("qty"),
        count(lit(1)).as("n_trades"))
      .withColumn("vwap",
        round(col("pq").cast("double") / col("qty"), 6))
      .select(col(symbolCol), col("bucket"), col("vwap"), col("qty"),
        col("n_trades"))

  /** Per-symbol close-to-close log returns, quantized to 8 decimals
    * (absorbs the ulp-level `ln` difference between engines). Adds `ret`
    * (DECIMAL(20,8)); the first bucket of each symbol drops — and so
    * does any bucket whose own close quantizes to ≤ 0 (a zero price has
    * no log-return; without the `_c > 0` guard Spark silently nulls
    * `ln(0)` while a SQL oracle hard-errors — found by the sf0.1 sweep,
    * where one tick rounds to 0.0000). A zero-quantized bucket does
    * appear as `_prev` for its successor row — it is the `_prev > 0`
    * guard that then drops that successor, so no return is ever computed
    * against a zero-quantized close. */
  def logReturns(candles: DataFrame, symbolCol: String,
      bucketCol: String = "bucket", closeCol: String = "close"): DataFrame = {
    val w = Window.partitionBy(symbolCol).orderBy(bucketCol)
    candles
      .withColumn("_c", dec4(col(closeCol)))
      .withColumn("_prev", lag(col("_c"), 1).over(w))
      .filter(col("_prev").isNotNull && col("_prev") > 0 && col("_c") > 0)
      .withColumn("ret",
        round(log(col("_c").cast("double") / col("_prev").cast("double")), 8)
          .cast("decimal(20,8)"))
  }

  /** Realized volatility per symbol: sample stddev of 8-decimal log
    * returns. The two accumulations (Σx, Σx²) are exact decimal sums —
    * order-independent, so the distributed agg is deterministic — and the
    * variance assembles from them in one fixed double expression.
    * Symbols with fewer than `minReturns` returns drop. */
  def volatility(candles: DataFrame, symbolCol: String,
      bucketCol: String = "bucket", closeCol: String = "close",
      minReturns: Int = 2): DataFrame = {
    val r = logReturns(candles, symbolCol, bucketCol, closeCol)
      .withColumn("_x2",
        round(col("ret").cast("double") * col("ret").cast("double"), 12)
          .cast("decimal(24,12)"))
    r.groupBy(col(symbolCol))
      .agg(count(lit(1)).as("n_ret"), sum(col("ret")).as("_sx"),
        sum(col("_x2")).as("_sx2"))
      .filter(col("n_ret") >= minReturns)
      .withColumn("vol", round(sqrt(greatest(
        (col("_sx2").cast("double") -
          col("_sx").cast("double") * col("_sx").cast("double") / col("n_ret")) /
          (col("n_ret") - 1), lit(0.0))), 6))
      .select(col(symbolCol), col("n_ret"), col("vol"))
  }

  /** Bollinger bands: n-bucket rolling mean ± k·σ (population σ over the
    * window, the standard Bollinger definition). Rolling Σ and Σx² are
    * exact decimal window sums; only full windows emit. */
  def bollinger(candles: DataFrame, symbolCol: String, n: Int = 20,
      k: Double = 2.0, bucketCol: String = "bucket",
      closeCol: String = "close"): DataFrame = {
    val order = Window.partitionBy(symbolCol).orderBy(bucketCol)
    val win = order.rowsBetween(-(n - 1), 0)
    val withSums = candles
      .withColumn("_c", dec4(col(closeCol)))
      .withColumn("_c2",
        round(col("_c").cast("double") * col("_c").cast("double"), 8)
          .cast("decimal(28,8)"))
      // full-window guard as a COUNT over the same sliding frame
      // (count-in-frame = min(rn, n), so = n ⟺ rn ≥ n): the window op
      // runs one frame processor instead of running-frame + sliding
      .withColumn("_cnt", count(lit(1)).over(win))
      .withColumn("_s1", sum(col("_c")).over(win))
      .withColumn("_s2", sum(col("_c2")).over(win))
      .filter(col("_cnt") === n)
    val mean = col("_s1").cast("double") / n
    val varPop = greatest(
      (col("_s2").cast("double") -
        col("_s1").cast("double") * col("_s1").cast("double") / n) / n,
      lit(0.0))
    withSums
      .withColumn("mid", round(mean, 6))
      .withColumn("upper", round(mean + sqrt(varPop) * k, 6))
      .withColumn("lower", round(mean - sqrt(varPop) * k, 6))
      .select(col(symbolCol), col(bucketCol), col(closeCol), col("mid"),
        col("upper"), col("lower"))
  }

  /** Mergeable volatility state per symbol: (n, Σx, Σx²) over 8-decimal
    * log returns — the second-moment analogue of the mergeable candle
    * partial (`Ohlcv.resampleTicksPartial`). Because the sums are exact
    * DECIMAL, merging partial states is plain addition with NO
    * approximation: vol(old ⊎ new) ≡ vol(full recompute), bit for bit.
    * This is what makes risk metrics maintainable incrementally — a new
    * day of ticks updates a 3-number state per symbol instead of
    * re-reading history. */
  def volatilityPartial(candles: DataFrame, symbolCol: String,
      bucketCol: String = "bucket", closeCol: String = "close"): DataFrame =
    logReturns(candles, symbolCol, bucketCol, closeCol)
      .withColumn("_x2",
        round(col("ret").cast("double") * col("ret").cast("double"), 12)
          .cast("decimal(24,12)"))
      .groupBy(col(symbolCol))
      .agg(count(lit(1)).as("n_ret"), sum(col("ret")).as("sx"),
        sum(col("_x2")).as("sx2"))

  /** Merge per-symbol moment states (union of partials → one state per
    * symbol) and derive the sample stddev — the finalize step shared
    * with [[volatility]]. */
  def mergeVolatility(partials: DataFrame, symbolCol: String,
      minReturns: Int = 2): DataFrame =
    partials.groupBy(col(symbolCol))
      .agg(sum(col("n_ret")).as("n_ret"), sum(col("sx")).as("sx"),
        sum(col("sx2")).as("sx2"))
      .filter(col("n_ret") >= minReturns)
      .withColumn("vol", round(sqrt(greatest(
        (col("sx2").cast("double") -
          col("sx").cast("double") * col("sx").cast("double") / col("n_ret")) /
          (col("n_ret") - 1), lit(0.0))), 6))
      .select(col(symbolCol), col("n_ret"), col("vol"))

  /** Maximum drawdown per symbol: running peak via cumulative max (exact
    * decimal — no float comparison ambiguity), drawdown = close/peak − 1,
    * the minimum selected by a deterministic (drawdown, bucket) rank so
    * ties resolve to the earliest trough. One window pass per symbol plus
    * the rank — both on the same symbol partitioning, one exchange
    * total. */
  def maxDrawdown(candles: DataFrame, symbolCol: String,
      bucketCol: String = "bucket", closeCol: String = "close"): DataFrame = {
    val order = Window.partitionBy(symbolCol).orderBy(bucketCol)
    val cum = order.rowsBetween(Window.unboundedPreceding, 0)
    val dd = candles
      .withColumn("_c", dec4(col(closeCol)))
      .withColumn("_peak", max(col("_c")).over(cum))
      .withColumn("max_drawdown",
        round(col("_c").cast("double") / col("_peak").cast("double") - 1, 6))
    val best = Window.partitionBy(symbolCol)
      .orderBy(col("max_drawdown"), col(bucketCol))
    dd.withColumn("_rn", row_number().over(best))
      .filter(col("_rn") === 1)
      .select(col(symbolCol), col(bucketCol).as("trough_bucket"),
        col("_peak").cast("double").as("peak"),
        col("_c").cast("double").as("trough"), col("max_drawdown"))
  }

  /** Pairwise Pearson correlation of per-symbol log returns — the
    * cross-asset risk matrix every portfolio pipeline derives from the
    * candle store. Returns align on the shared bucket; all five moment
    * sums (Σx, Σy, Σxy, Σx², Σy²) accumulate in exact decimal
    * (per-term products quantized to 12 decimals), so the distributed agg
    * is order-independent; the correlation assembles from them in one
    * fixed double expression, zero-variance pairs → NULL.
    *
    * Scale: the bucket-aligned self-join produces Σ_b s_b² rows where
    * s_b = symbols active in bucket b — bounded by the (small, universe-
    * sized) symbol count per bucket, never by history length. Pairs with
    * fewer than `minObs` common buckets drop. */
  def correlationMatrix(candles: DataFrame, symbolCol: String,
      bucketCol: String = "bucket", closeCol: String = "close",
      minObs: Int = 10): DataFrame = {
    val r = logReturns(candles, symbolCol, bucketCol, closeCol)
      .select(col(symbolCol), col(bucketCol), col("ret"))
    val a = r.select(col(symbolCol).as("sym_a"), col(bucketCol).as("bucket"),
      col("ret").as("x"))
    val b = r.select(col(symbolCol).as("sym_b"), col(bucketCol).as("bucket"),
      col("ret").as("y"))
    val aligned = a.join(b, "bucket").filter(col("sym_a") < col("sym_b"))
    pearsonFromAligned(aligned, minObs)
  }

  /** [[correlationMatrix]] for an UNBOUNDED symbol universe — the grid-
    * blocked form of the same bucket-aligned self-join. The plain join's
    * key is the bucket alone: with S symbols per bucket each bucket key
    * carries an s_b × s_b fan-out through ONE shuffle key, so a daily
    * matrix over years has only a few hundred distinct keys — a handful
    * of giant tasks no matter how many executors exist ([[Skew]]'s
    * problem, solved the same way). Here each side is replicated across
    * `nBlocks` deterministic (md5) symbol blocks and the join key becomes
    * (bucket, blk_a, blk_b): every symbol pair still meets EXACTLY once —
    * in the one cell (its a-block, its b-block) — but the work spreads
    * over buckets × nBlocks² keys, each cell (s_b/n)² pairs. Total pair
    * count is unchanged (S² pairs IS the matrix); what changes is that no
    * single task owns a whole bucket. Replication multiplies shuffle
    * input by nBlocks — size it ~√(desired tasks per bucket).
    *
    * The moment sums are the same exact-decimal terms in both forms, so
    * blocked and plain results are BIT-IDENTICAL (IndicatorsSpec asserts
    * equality; q62 hash-checks this path against the SQL oracle).
    *
    * GUARD: the matrix is S²-by-contract — 15k symbols is 112M pairs, a
    * job no one should launch by accident (at sf0.1 this query is already
    * ~150s; the round-5 driver bench died to it). Unless `unbounded =
    * true`, the symbol universe is counted first (one cheap
    * column-pruned pass) and S(S−1)/2 > `maxPairs` REFUSES with the
    * bounded alternatives named. The default 1M admits any reasonable
    * portfolio (1,414 symbols) and refuses exchange-wide universes. */
  def correlationMatrixBlocked(candles: DataFrame, symbolCol: String,
      bucketCol: String = "bucket", closeCol: String = "close",
      minObs: Int = 10, nBlocks: Int = 16, maxPairs: Long = 1000000L,
      unbounded: Boolean = false): DataFrame = {
    require(nBlocks > 0, "nBlocks must be positive")
    if (!unbounded) {
      val s = candles.select(col(symbolCol)).distinct().count()
      val pairs = s * (s - 1) / 2
      require(pairs <= maxPairs,
        s"correlationMatrixBlocked: $s symbols = $pairs pairs exceeds " +
          s"maxPairs=$maxPairs. The full matrix is S^2 by definition - " +
          "bound the universe first (q52-style top-k gate), raise " +
          "maxPairs, or pass unbounded=true to launch it deliberately.")
    }
    val r = logReturns(candles, symbolCol, bucketCol, closeCol)
      .select(col(symbolCol), col(bucketCol), col("ret"))
      // md5-deterministic block id (repo convention — stable across
      // engines/versions, unlike murmur3)
      .withColumn("_blk",
        pmod(conv(substring(md5(col(symbolCol).cast("string")), 1, 15),
          16, 10).cast("long"), lit(nBlocks)).cast("int"))
    val cells = explode(sequence(lit(0), lit(nBlocks - 1)))
    val a = r.select(col(symbolCol).as("sym_a"), col(bucketCol).as("bucket"),
      col("ret").as("x"), col("_blk").as("blk_a"))
      .withColumn("blk_b", cells)
    val b = r.select(col(symbolCol).as("sym_b"), col(bucketCol).as("bucket"),
      col("ret").as("y"), col("_blk").as("blk_b"))
      .withColumn("blk_a", cells)
    val aligned = a.join(b, Seq("bucket", "blk_a", "blk_b"))
      .filter(col("sym_a") < col("sym_b"))
    pearsonFromAligned(aligned, minObs)
  }

  /** Bounded-cost estimate of the full matrix: when S(S−1)/2 exceeds
    * `targetPairs`, deterministically sample the SYMBOL universe at
    * √(target/total) — pair count is quadratic in the kept fraction, so
    * the expected sampled-pair count lands on the budget — and run the
    * blocked matrix on the sample. Sampling is md5-keyed (stable across
    * runs, engines, and partitionings; no RNG), and a sampled pair's
    * correlation is BIT-IDENTICAL to its value in the full matrix (the
    * moment sums only see that pair's own aligned rows — IndicatorsSpec
    * asserts subset equality). This is the deliberate middle path the
    * [[correlationMatrixBlocked]] guard points at: q52's top-k gate
    * bounds by importance, this bounds by budget, `unbounded = true`
    * pays the full S². Universes already inside the budget pass through
    * complete. */
  def correlationMatrixSampled(candles: DataFrame, symbolCol: String,
      bucketCol: String = "bucket", closeCol: String = "close",
      minObs: Int = 10, nBlocks: Int = 16,
      targetPairs: Long = 1000000L): DataFrame = {
    require(targetPairs > 0, "targetPairs must be positive")
    val s = candles.select(col(symbolCol)).distinct().count()
    val total = s * (s - 1) / 2
    val base =
      if (total <= targetPairs) candles
      else {
        // md5-deterministic keep: symbol survives iff hash mod 1e6 falls
        // under 1e6·√(target/total)
        val threshold = (math.sqrt(targetPairs.toDouble / total) * 1000000L).toLong
        candles.filter(
          pmod(conv(substring(md5(col(symbolCol).cast("string")), 1, 15),
            16, 10).cast("long"), lit(1000000L)) < threshold)
      }
    correlationMatrixBlocked(base, symbolCol, bucketCol, closeCol, minObs,
      nBlocks, unbounded = true)
  }

  /** Shared moment-sum assembly: `aligned` rows are (sym_a, sym_b, x, y)
    * per common bucket; all five sums exact decimal, correlation in one
    * fixed double expression, zero-variance pairs → NULL. */
  private def pearsonFromAligned(aligned: DataFrame, minObs: Int): DataFrame = {
    def prod(p: Column, q: Column): Column =
      round(p.cast("double") * q.cast("double"), 12).cast("decimal(26,12)")
    val sums = aligned
      .withColumn("xy", prod(col("x"), col("y")))
      .withColumn("x2", prod(col("x"), col("x")))
      .withColumn("y2", prod(col("y"), col("y")))
      .groupBy("sym_a", "sym_b")
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
        sum(col("y")).as("sy"), sum(col("xy")).as("sxy"),
        sum(col("x2")).as("sx2"), sum(col("y2")).as("sy2"))
      .filter(col("n") >= minObs)
    def d(c: String): Column = col(c).cast("double")
    val va = col("n") * d("sx2") - d("sx") * d("sx")
    val vb = col("n") * d("sy2") - d("sy") * d("sy")
    sums
      .withColumn("corr",
        when(va <= 0 || vb <= 0, lit(null).cast("double"))
          .otherwise(round((col("n") * d("sxy") - d("sx") * d("sy")) /
            (sqrt(va) * sqrt(vb)), 6)))
      .select(col("sym_a"), col("sym_b"), col("n"), col("corr"))
  }

  /** Rolling beta of each symbol against the EQUAL-WEIGHT market index
    * (cross-sectional mean return per bucket) over an `n`-bucket trailing
    * window: β = (nΣxm − ΣxΣm)/(nΣm² − (Σm)²). The index needs no
    * benchmark choice, and its per-bucket frame is one row per bucket —
    * a forced broadcast back onto the returns, never a shuffle of them.
    * All window sums exact decimal (per-term products quantized to 12
    * decimals); market return re-quantized to 8 decimals so the join key
    * arithmetic stays exact. Zero-variance windows → NULL; only full
    * windows emit. */
  def rollingBeta(candles: DataFrame, symbolCol: String, n: Int = 15,
      bucketCol: String = "bucket", closeCol: String = "close"): DataFrame = {
    val r = logReturns(candles, symbolCol, bucketCol, closeCol)
      .select(col(symbolCol), col(bucketCol), col("ret"))
    val mkt = r.groupBy(col(bucketCol)).agg(
      round(sum(col("ret")).cast("double") / count(lit(1)), 8)
        .cast("decimal(20,8)").as("mret"))
    def prod(p: Column, q: Column): Column =
      round(p.cast("double") * q.cast("double"), 12).cast("decimal(26,12)")
    val order = Window.partitionBy(symbolCol).orderBy(bucketCol)
    val win = order.rowsBetween(-(n - 1), 0)
    def d(c: String): Column = col(c).cast("double")
    val joined = r.join(broadcast(mkt), bucketCol)
      .withColumn("xm", prod(col("ret"), col("mret")))
      .withColumn("m2", prod(col("mret"), col("mret")))
      // count-in-frame full-window guard (see bollinger): one frame
      // processor instead of two
      .withColumn("_cnt", count(lit(1)).over(win))
      .withColumn("sx", sum(col("ret")).over(win))
      .withColumn("sm", sum(col("mret")).over(win))
      .withColumn("sxm", sum(col("xm")).over(win))
      .withColumn("sm2", sum(col("m2")).over(win))
      .filter(col("_cnt") === n)
    val denom = lit(n) * d("sm2") - d("sm") * d("sm")
    joined
      .withColumn("beta", when(denom <= 0, lit(null).cast("double"))
        .otherwise(round(
          (lit(n) * d("sxm") - d("sx") * d("sm")) / denom, 6)))
      .select(col(symbolCol), col(bucketCol), col("beta"))
  }

  /** Average True Range over `n` buckets (SMA variant, the same
    * window-friendly choice as Cutler's RSI): the true range compares the
    * bucket's high/low against the PREVIOUS close — TR =
    * max(high−low, |high−prevClose|, |low−prevClose|) — so gaps between
    * buckets count toward range. All comparisons run on 4-decimal exact
    * prices (max/abs of decimals are unambiguous), the rolling Σ is an
    * exact decimal window sum, and ATR assembles in one fixed double
    * division. The first bucket per symbol drops (no previous close);
    * only full windows emit. Same single-window-pass shape as [[rsi]]. */
  def atr(candles: DataFrame, symbolCol: String, n: Int = 14,
      bucketCol: String = "bucket"): DataFrame = {
    val order = Window.partitionBy(symbolCol).orderBy(bucketCol)
    val win = order.rowsBetween(-(n - 1), 0)
    val withTr = candles
      .withColumn("_h", dec4(col("high")))
      .withColumn("_l", dec4(col("low")))
      .withColumn("_c", dec4(col("close")))
      .withColumn("_pc", lag(col("_c"), 1).over(order))
      .filter(col("_pc").isNotNull)
      .withColumn("tr", greatest(
        col("_h") - col("_l"),
        abs(col("_h") - col("_pc")),
        abs(col("_l") - col("_pc"))).cast("decimal(19,4)"))
      // count-in-frame full-window guard (see bollinger): one frame
      // processor instead of two
      .withColumn("_cnt", count(lit(1)).over(win))
      .withColumn("_st", sum(col("tr")).over(win))
      .filter(col("_cnt") === n)
    withTr
      .withColumn("atr", round(col("_st").cast("double") / n, 6))
      .select(col(symbolCol), col(bucketCol),
        col("tr").cast("double").as("tr"), col("atr"))
  }

  /** On-balance volume: cumulative Σ sign(Δclose)·volume per symbol —
    * the classic volume-flow confirmation signal. sign() compares exact
    * decimals (no float tie ambiguity) and volume is integral, so the
    * running sum is an exact integer-weighted cumulative — fully
    * order-deterministic. The first bucket contributes 0 (no Δ), matching
    * the standard definition. One cumulative window per symbol. */
  def obv(candles: DataFrame, symbolCol: String,
      bucketCol: String = "bucket", closeCol: String = "close",
      volumeCol: String = "volume"): DataFrame = {
    val order = Window.partitionBy(symbolCol).orderBy(bucketCol)
    val cum = order.rowsBetween(Window.unboundedPreceding, 0)
    candles
      .withColumn("_c", dec4(col(closeCol)))
      .withColumn("_d", col("_c") - lag(col("_c"), 1).over(order))
      .withColumn("_step",
        when(col("_d").isNull || col("_d") === 0, lit(0L))
          .when(col("_d") > 0, col(volumeCol).cast("long"))
          .otherwise(-col(volumeCol).cast("long")))
      .withColumn("obv", sum(col("_step")).over(cum))
      .select(col(symbolCol), col(bucketCol), col("obv"))
  }

  /** Stochastic oscillator: %K = 100·(close − LL_n)/(HH_n − LL_n) over
    * the n-bucket high/low channel, %D = d-bucket SMA of %K. Channel
    * extrema are exact decimal window min/max; %K is one fixed double
    * expression, then re-quantized to 8 decimals so the %D sum is an
    * exact decimal accumulation. A flat channel (HH = LL) pins %K to 50
    * by convention BEFORE the division. Only rows with full %K AND full
    * %D windows emit. */
  def stochastic(candles: DataFrame, symbolCol: String, n: Int = 14,
      d: Int = 3, bucketCol: String = "bucket"): DataFrame = {
    val order = Window.partitionBy(symbolCol).orderBy(bucketCol)
    val chan = order.rowsBetween(-(n - 1), 0)
    val dwin = order.rowsBetween(-(d - 1), 0)
    // stage 1: %K on full channels only (partial-channel rows must not
    // leak into %D, so the filter comes BEFORE the %D window)
    val withK = candles
      .withColumn("_h", dec4(col("high")))
      .withColumn("_l", dec4(col("low")))
      .withColumn("_c", dec4(col("close")))
      .withColumn("_cnt", count(lit(1)).over(chan))
      .withColumn("_hh", max(col("_h")).over(chan))
      .withColumn("_ll", min(col("_l")).over(chan))
      .filter(col("_cnt") === n)
      .withColumn("k_raw",
        when(col("_hh") === col("_ll"), lit(50.0))
          .otherwise((col("_c") - col("_ll")).cast("double") * 100.0 /
            (col("_hh") - col("_ll")).cast("double")))
      .withColumn("_k8", round(col("k_raw"), 8).cast("decimal(20,8)"))
    // stage 2: %D over the surviving %K rows (same symbol partitioning —
    // one exchange feeds both window stages)
    // %K/%D emit UNROUNDED: both are deterministic IEEE expressions over
    // exact decimals (k_raw a fixed ratio, %D an exact-decimal sum / d),
    // identical bit-for-bit in both engines — while round(·,6) itself
    // diverges cross-engine when ·/d lands exactly on a half boundary
    // (d=3 turns 8-decimal sums into repeating decimals, hitting
    // x.xxxxxx5 routinely; measured 1/7317 rows at sf0.01)
    withK
      .withColumn("_cnt2", count(lit(1)).over(dwin))
      .withColumn("_sd", sum(col("_k8")).over(dwin))
      .filter(col("_cnt2") === d)
      .withColumn("pct_k", col("k_raw"))
      .withColumn("pct_d", col("_sd").cast("double") / d)
      .select(col(symbolCol), col(bucketCol), col("pct_k"), col("pct_d"))
  }

  /** Keltner channels: SMA midline ± k × ATR — the volatility envelope
    * that composes the [[atr]] true-range machinery with a [[bollinger]]-
    * style band. SMA variant throughout (the EMA original is recursive —
    * the streaming layer's territory, like Wilder ATR). Both window sums
    * are exact decimal; mid/upper/lower emit as RAW IEEE expressions
    * (the q58 lesson: the ÷n and ×k steps produce repeating decimals
    * whose round(·,6) halves diverge cross-engine; the unrounded doubles
    * are bit-identical). All rows align on the TR frame (first candle
    * drops — no previous close), so mid is the SMA over TR-bearing rows;
    * emit once BOTH windows are full. One window pass per symbol. */
  def keltner(candles: DataFrame, symbolCol: String, n: Int = 20,
      m: Int = 14, k: Double = 1.5, bucketCol: String = "bucket"): DataFrame = {
    val order = Window.partitionBy(symbolCol).orderBy(bucketCol)
    val nWin = order.rowsBetween(-(n - 1), 0)
    val mWin = order.rowsBetween(-(m - 1), 0)
    val withTr = candles
      .withColumn("_h", dec4(col("high")))
      .withColumn("_l", dec4(col("low")))
      .withColumn("_c", dec4(col("close")))
      .withColumn("_pc", lag(col("_c"), 1).over(order))
      .filter(col("_pc").isNotNull)
      .withColumn("_tr", greatest(
        col("_h") - col("_l"),
        abs(col("_h") - col("_pc")),
        abs(col("_l") - col("_pc"))).cast("decimal(19,4)"))
      // count-in-frame full-window guard over the LARGER frame
      // (count = min(rn, max(n, m)) there): one frame processor fewer
      .withColumn("_cnt",
        count(lit(1)).over(if (n >= m) nWin else mWin))
      .withColumn("_sc", sum(col("_c")).over(nWin))
      .withColumn("_st", sum(col("_tr")).over(mWin))
      .filter(col("_cnt") === math.max(n, m))
    val mid = col("_sc").cast("double") / n
    val band = col("_st").cast("double") / m * k
    withTr
      .withColumn("mid", mid)
      .withColumn("upper", mid + band)
      .withColumn("lower", mid - band)
      .select(col(symbolCol), col(bucketCol),
        col("_c").cast("double").as("close"),
        col("mid"), col("upper"), col("lower"))
  }

  /** Candlestick pattern flags — doji, hammer, bullish/bearish engulfing
    * — the discrete signals charting users read off the candles the
    * reference plots. Every comparison is between exact 4-decimal
    * decimals (scaled by small integer literals), so there is not a
    * single float operation anywhere: flags are bit-identical across
    * engines and partitionings by construction. One lag per symbol
    * (engulfing needs the previous body); the first candle's engulfing
    * flags are false (no predecessor). */
  def candlePatterns(candles: DataFrame, symbolCol: String,
      bucketCol: String = "bucket"): DataFrame = {
    val order = Window.partitionBy(symbolCol).orderBy(bucketCol)
    val (o, h, l, c) = (dec4(col("open")), dec4(col("high")),
      dec4(col("low")), dec4(col("close")))
    val withPrev = candles
      .withColumn("_o", o).withColumn("_h", h)
      .withColumn("_l", l).withColumn("_c", c)
      .withColumn("_po", lag(col("_o"), 1).over(order))
      .withColumn("_pc", lag(col("_c"), 1).over(order))
    val body = abs(col("_c") - col("_o"))
    val range = col("_h") - col("_l")
    val lowerShadow = least(col("_o"), col("_c")) - col("_l")
    val upperShadow = col("_h") - greatest(col("_o"), col("_c"))
    val hasPrev = col("_pc").isNotNull
    withPrev
      // body ≤ 10% of range (degenerate zero-range candle counts: 0 ≤ 0)
      .withColumn("doji", body * lit(10) <= range)
      // long lower shadow, short upper shadow; the shadow must EXIST —
      // without the > 0 guard a zero-range single-tick candle (o=h=l=c)
      // satisfies 0 ≥ 0 ∧ 0 ≤ 0 and fakes a reversal signal
      .withColumn("hammer",
        lowerShadow > lit(0) &&
          lowerShadow >= body * lit(2) && upperShadow <= body)
      .withColumn("bull_engulf", hasPrev &&
        col("_pc") < col("_po") && col("_c") > col("_o") &&
        col("_c") >= col("_po") && col("_o") <= col("_pc"))
      .withColumn("bear_engulf", hasPrev &&
        col("_pc") > col("_po") && col("_c") < col("_o") &&
        col("_c") <= col("_po") && col("_o") >= col("_pc"))
      .select(col(symbolCol), col(bucketCol),
        col("_o").cast("double").as("open"),
        col("_h").cast("double").as("high"),
        col("_l").cast("double").as("low"),
        col("_c").cast("double").as("close"),
        col("doji"), col("hammer"), col("bull_engulf"), col("bear_engulf"))
  }

  /** Cutler's RSI over `n` deltas: 100 − 100/(1 + SMA(gain)/SMA(loss)),
    * the simple-moving-average variant (Wilder's EMA smoothing is
    * recursive — not expressible as a frame aggregate; Cutler's is the
    * standard window-friendly form). Gains/losses are exact decimal
    * deltas; the `loss = 0` limit pins RSI to 100 in both engines before
    * any float division can produce ∞. Only full windows emit. */
  def rsi(candles: DataFrame, symbolCol: String, n: Int = 14,
      bucketCol: String = "bucket", closeCol: String = "close"): DataFrame = {
    val order = Window.partitionBy(symbolCol).orderBy(bucketCol)
    val win = order.rowsBetween(-(n - 1), 0)
    val zero = lit(0).cast("decimal(19,4)")
    val withSums = candles
      .withColumn("_c", dec4(col(closeCol)))
      .withColumn("_d", (col("_c") - lag(col("_c"), 1).over(order))
        .cast("decimal(19,4)"))
      .filter(col("_d").isNotNull)
      .withColumn("_gain", greatest(col("_d"), zero))
      .withColumn("_loss", greatest(-col("_d"), zero))
      // count-in-frame full-window guard (see bollinger): one frame
      // processor instead of two
      .withColumn("_cnt", count(lit(1)).over(win))
      .withColumn("_sg", sum(col("_gain")).over(win))
      .withColumn("_sl", sum(col("_loss")).over(win))
      .filter(col("_cnt") === n)
    withSums
      .withColumn("rsi",
        when(col("_sl") === zero, lit(100.0))
          .otherwise(round(lit(100.0) - lit(100.0) /
            (lit(1.0) + col("_sg").cast("double") / col("_sl").cast("double")),
            6)))
      .select(col(symbolCol), col(bucketCol), col(closeCol), col("rsi"))
  }
}
