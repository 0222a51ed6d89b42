package graft.engine

import org.apache.spark.sql.functions._
import graft.engine.Queries.Q

/** Indicator queries (q48–q51) — the [[Indicators]] layer exercised over
  * the events tick proxy (FIXTURES.md mapping: user_id→symbol, value→price,
  * props.k→trade size). Shared oracle machinery: the hourly close series is
  * the q01 candle aggregate with the close quantized to an exact
  * DECIMAL(18,4), so every rolling sum downstream is order-independent in
  * both engines. */
object IndicatorQueries {

  /** Hourly close series as exact decimal — shared CTE of q49–q51. */
  private val closeCte = """
    c AS (SELECT user_id, time_bucket(INTERVAL '1 hour', ts) AS bucket,
        CAST(round(max_by(value, ts), 4) AS DECIMAL(18,4)) AS close
      FROM events GROUP BY 1, 2)"""

  private def hourlyCloses(s: org.apache.spark.sql.SparkSession, dir: String) =
    Ohlcv.resampleTicks(Tables.events(s, dir), "1h",
      symbolCol = "user_id", tsCol = "ts", priceCol = "value")

  // ---------------------------------------------------------------- q48
  /** VWAP per (symbol, hour) — [[Indicators.vwap]]. Trade size comes from
    * the props JSON (`k + 1`, so no zero-size trades); the Σ(p·q)
    * numerator accumulates in exact decimal. Same single-hash-agg shape
    * and cost as the q01 resample. */
  val q48Vwap: Q = Q(
    (s, dir) => {
      val ticks = Tables.events(s, dir)
        .withColumn("qty",
          get_json_object(col("props"), "$.k").cast("long") + 1)
      Indicators.vwap(ticks, "1h", symbolCol = "user_id", tsCol = "ts",
          priceCol = "value", qtyCol = "qty")
        .select(col("user_id"), unix_millis(col("bucket")).as("bucket_ms"),
          col("vwap"), col("qty"), col("n_trades"))
        .orderBy("user_id", "bucket_ms")
    },
    Some("""SELECT user_id, epoch_ms(time_bucket(INTERVAL '1 hour', ts)) AS bucket_ms,
      round(CAST(sum(CAST(round(value, 4) AS DECIMAL(18,4))
          * CAST(CAST(json_extract_string(props, '$.k') AS BIGINT) + 1 AS DECIMAL(9,0))) AS DOUBLE)
        / CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT) + 1) AS BIGINT), 6) AS vwap,
      CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT) + 1) AS BIGINT) AS qty,
      count(*) AS n_trades
      FROM events GROUP BY 1, 2 ORDER BY 1, 2"""))

  // ---------------------------------------------------------------- q49
  /** Realized volatility per symbol — [[Indicators.volatility]]: sample
    * stddev of 8-decimal log returns, assembled from exact decimal Σx/Σx²
    * (never an engine-internal STDDEV — float accumulation order differs
    * between engines; the two exact sums make the distributed agg
    * deterministic and the variance a single fixed double expression). */
  val q49Volatility: Q = Q(
    (s, dir) =>
      Indicators.volatility(hourlyCloses(s, dir), "user_id")
        .orderBy("user_id"),
    Some(s"""WITH $closeCte,
      r AS (SELECT user_id, close,
          lag(close) OVER (PARTITION BY user_id ORDER BY bucket) AS prev
        FROM c),
      rr AS (SELECT user_id,
          CAST(round(ln(CAST(close AS DOUBLE) / CAST(prev AS DOUBLE)), 8)
            AS DECIMAL(20,8)) AS ret
        FROM r WHERE prev IS NOT NULL AND prev > 0 AND close > 0),
      x AS (SELECT user_id, ret,
          CAST(round(CAST(ret AS DOUBLE) * CAST(ret AS DOUBLE), 12)
            AS DECIMAL(24,12)) AS x2
        FROM rr)
      SELECT user_id, count(*) AS n_ret,
        round(sqrt(greatest(
          (CAST(sum(x2) AS DOUBLE)
            - CAST(sum(ret) AS DOUBLE) * CAST(sum(ret) AS DOUBLE) / count(*))
          / (count(*) - 1), 0.0)), 6) AS vol
      FROM x GROUP BY 1 HAVING count(*) >= 2 ORDER BY 1"""))

  // ---------------------------------------------------------------- q50
  /** Bollinger bands — [[Indicators.bollinger]]: 20-bucket rolling
    * mean ± 2σ from exact decimal window sums; only full windows emit. */
  val q50Bollinger: Q = Q(
    (s, dir) =>
      Indicators.bollinger(hourlyCloses(s, dir), "user_id", n = 20, k = 2.0)
        .select(col("user_id"), unix_millis(col("bucket")).as("bucket_ms"),
          round(col("close"), 4).as("close"), col("mid"), col("upper"),
          col("lower"))
        .orderBy("user_id", "bucket_ms"),
    Some(s"""WITH $closeCte,
      w AS (SELECT user_id, bucket, close,
          row_number() OVER wo AS rn,
          sum(close) OVER w20 AS s1,
          sum(CAST(round(CAST(close AS DOUBLE) * CAST(close AS DOUBLE), 8)
            AS DECIMAL(28,8))) OVER w20 AS s2
        FROM c
        WINDOW wo AS (PARTITION BY user_id ORDER BY bucket),
          w20 AS (PARTITION BY user_id ORDER BY bucket
            ROWS BETWEEN 19 PRECEDING AND CURRENT ROW))
      SELECT user_id, epoch_ms(bucket) AS bucket_ms,
        CAST(close AS DOUBLE) AS close,
        round(CAST(s1 AS DOUBLE) / 20, 6) AS mid,
        round(CAST(s1 AS DOUBLE) / 20 + sqrt(greatest(
          (CAST(s2 AS DOUBLE)
            - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / 20) / 20, 0.0)) * 2.0, 6) AS upper,
        round(CAST(s1 AS DOUBLE) / 20 - sqrt(greatest(
          (CAST(s2 AS DOUBLE)
            - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / 20) / 20, 0.0)) * 2.0, 6) AS lower
      FROM w WHERE rn >= 20 ORDER BY 1, 2"""))

  // ---------------------------------------------------------------- q51
  /** Cutler's RSI(14) — [[Indicators.rsi]]: SMA of exact decimal
    * gains/losses over 14 deltas; the loss=0 limit pins RSI to 100 before
    * any float division. */
  val q51Rsi: Q = Q(
    (s, dir) =>
      Indicators.rsi(hourlyCloses(s, dir), "user_id", n = 14)
        .select(col("user_id"), unix_millis(col("bucket")).as("bucket_ms"),
          round(col("close"), 4).as("close"), col("rsi"))
        .orderBy("user_id", "bucket_ms"),
    Some(s"""WITH $closeCte,
      d AS (SELECT user_id, bucket, close,
          CAST(close - lag(close) OVER (PARTITION BY user_id ORDER BY bucket)
            AS DECIMAL(19,4)) AS delta
        FROM c),
      dd AS (SELECT * FROM d WHERE delta IS NOT NULL),
      w AS (SELECT user_id, bucket, close,
          row_number() OVER wo AS rn,
          sum(greatest(delta, CAST(0 AS DECIMAL(19,4)))) OVER w14 AS sg,
          sum(greatest(-delta, CAST(0 AS DECIMAL(19,4)))) OVER w14 AS sl
        FROM dd
        WINDOW wo AS (PARTITION BY user_id ORDER BY bucket),
          w14 AS (PARTITION BY user_id ORDER BY bucket
            ROWS BETWEEN 13 PRECEDING AND CURRENT ROW))
      SELECT user_id, epoch_ms(bucket) AS bucket_ms,
        CAST(close AS DOUBLE) AS close,
        CASE WHEN sl = 0 THEN 100.0
          ELSE round(100.0 - 100.0 /
            (1.0 + CAST(sg AS DOUBLE) / CAST(sl AS DOUBLE)), 6) END AS rsi
      FROM w WHERE rn >= 14 ORDER BY 1, 2"""))

  // ---------------------------------------------------------------- q52
  /** Cross-symbol correlation matrix — [[Indicators.correlationMatrix]]
    * over DAILY log returns (daily aligns sparse tick activity; hourly
    * buckets rarely co-occur on this corpus), over a BOUNDED universe:
    * the 100 most-active symbols (count desc, id tie-break). The bound is
    * the scale practice, not a shortcut — an S-symbol matrix is S² pairs
    * by definition, so production correlates a chosen portfolio universe,
    * never every instrument; the top-N semi-join also prunes the scan.
    * All five moment sums exact decimal; correlation assembles in one
    * fixed double expression; pairs below 10 common days drop. */
  val q52Correlation: Q = Q(
    (s, dir) => {
      val ev = Tables.events(s, dir)
      val topSyms = ev.groupBy("user_id").agg(count(lit(1)).as("c"))
        .orderBy(col("c").desc, col("user_id")).limit(100)
        .select("user_id")
      val daily = Ohlcv.resampleTicks(ev.join(broadcast(topSyms), "user_id"),
        "1d", symbolCol = "user_id", tsCol = "ts", priceCol = "value")
      Indicators.correlationMatrix(daily, "user_id", minObs = 10)
        .orderBy("sym_a", "sym_b")
    },
    Some("""WITH top AS (SELECT user_id FROM
        (SELECT user_id, count(*) AS c FROM events GROUP BY 1)
        ORDER BY c DESC, user_id LIMIT 100),
      c AS (SELECT user_id,
        time_bucket(INTERVAL '1 day', ts) AS bucket,
        CAST(round(max_by(value, ts), 4) AS DECIMAL(18,4)) AS close
      FROM events JOIN top USING (user_id) GROUP BY 1, 2),
      r0 AS (SELECT user_id, bucket, close,
          lag(close) OVER (PARTITION BY user_id ORDER BY bucket) AS prev
        FROM c),
      r AS (SELECT user_id, bucket,
          CAST(round(ln(CAST(close AS DOUBLE) / CAST(prev AS DOUBLE)), 8)
            AS DECIMAL(20,8)) AS ret
        FROM r0 WHERE prev IS NOT NULL AND prev > 0 AND close > 0),
      j AS (SELECT a.user_id AS sym_a, b.user_id AS sym_b,
          a.ret AS x, b.ret AS y
        FROM r a JOIN r b ON b.bucket = a.bucket AND a.user_id < b.user_id),
      p AS (SELECT sym_a, sym_b, x, y,
          CAST(round(CAST(x AS DOUBLE) * CAST(y AS DOUBLE), 12)
            AS DECIMAL(26,12)) AS xy,
          CAST(round(CAST(x AS DOUBLE) * CAST(x AS DOUBLE), 12)
            AS DECIMAL(26,12)) AS x2,
          CAST(round(CAST(y AS DOUBLE) * CAST(y AS DOUBLE), 12)
            AS DECIMAL(26,12)) AS y2
        FROM j),
      s AS (SELECT sym_a, sym_b, count(*) AS n,
          sum(x) AS sx, sum(y) AS sy, sum(xy) AS sxy,
          sum(x2) AS sx2, sum(y2) AS sy2
        FROM p GROUP BY 1, 2 HAVING count(*) >= 10)
      SELECT sym_a, sym_b, n,
        CASE WHEN n * CAST(sx2 AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) <= 0
              OR n * CAST(sy2 AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) <= 0
          THEN NULL
          ELSE round((n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
            / (sqrt(n * CAST(sx2 AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
              * sqrt(n * CAST(sy2 AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6)
        END AS corr
      FROM s ORDER BY 1, 2"""))

  // ---------------------------------------------------------------- q62
  /** q52's correlation matrix over the UNBOUNDED symbol universe —
    * [[Indicators.correlationMatrixBlocked]]: the grid-blocked self-join
    * spreads each bucket's s_b² pair fan-out over nBlocks² shuffle cells
    * instead of one bucket key, so the full S-symbol matrix is tractable
    * without the top-100 gate (which q52 keeps — bounding the universe
    * remains the production practice; this is the escape hatch when the
    * portfolio IS the whole exchange). Bit-identical to the plain form
    * (exact-decimal moment sums; IndicatorsSpec asserts equality), and
    * the oracle is q52's SQL with the top-100 CTE removed.
    *
    * `unbounded = true`: invoking the NAMED full-matrix query is itself
    * the deliberate opt-in the guard exists to force (without it the
    * default maxPairs=1M would refuse above 1,414 symbols — e.g. a
    * 15k-symbol exchange = 112M pairs, exactly the case this query is
    * for). Library callers reaching correlationMatrixBlocked directly
    * still hit the guard; skipping it here also drops its
    * distinct-count pre-pass from every q62 run. */
  val q62CorrelationFull: Q = Q(
    (s, dir) => {
      val daily = Ohlcv.resampleTicks(Tables.events(s, dir), "1d",
        symbolCol = "user_id", tsCol = "ts", priceCol = "value")
      Indicators.correlationMatrixBlocked(daily, "user_id", minObs = 10,
          nBlocks = 8, unbounded = true)
        .orderBy("sym_a", "sym_b")
    },
    Some("""WITH c AS (SELECT user_id,
        time_bucket(INTERVAL '1 day', ts) AS bucket,
        CAST(round(max_by(value, ts), 4) AS DECIMAL(18,4)) AS close
      FROM events GROUP BY 1, 2),
      r0 AS (SELECT user_id, bucket, close,
          lag(close) OVER (PARTITION BY user_id ORDER BY bucket) AS prev
        FROM c),
      r AS (SELECT user_id, bucket,
          CAST(round(ln(CAST(close AS DOUBLE) / CAST(prev AS DOUBLE)), 8)
            AS DECIMAL(20,8)) AS ret
        FROM r0 WHERE prev IS NOT NULL AND prev > 0 AND close > 0),
      j AS (SELECT a.user_id AS sym_a, b.user_id AS sym_b,
          a.ret AS x, b.ret AS y
        FROM r a JOIN r b ON b.bucket = a.bucket AND a.user_id < b.user_id),
      p AS (SELECT sym_a, sym_b, x, y,
          CAST(round(CAST(x AS DOUBLE) * CAST(y AS DOUBLE), 12)
            AS DECIMAL(26,12)) AS xy,
          CAST(round(CAST(x AS DOUBLE) * CAST(x AS DOUBLE), 12)
            AS DECIMAL(26,12)) AS x2,
          CAST(round(CAST(y AS DOUBLE) * CAST(y AS DOUBLE), 12)
            AS DECIMAL(26,12)) AS y2
        FROM j),
      s AS (SELECT sym_a, sym_b, count(*) AS n,
          sum(x) AS sx, sum(y) AS sy, sum(xy) AS sxy,
          sum(x2) AS sx2, sum(y2) AS sy2
        FROM p GROUP BY 1, 2 HAVING count(*) >= 10)
      SELECT sym_a, sym_b, n,
        CASE WHEN n * CAST(sx2 AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) <= 0
              OR n * CAST(sy2 AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) <= 0
          THEN NULL
          ELSE round((n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
            / (sqrt(n * CAST(sx2 AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
              * sqrt(n * CAST(sy2 AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6)
        END AS corr
      FROM s ORDER BY 1, 2"""))

  // ---------------------------------------------------------------- q63
  /** Bounded-budget estimate of q62's full matrix —
    * [[Indicators.correlationMatrixSampled]]: when S(S−1)/2 exceeds
    * `targetPairs`, the SYMBOL universe is sampled at √(target/total)
    * by an md5 threshold (deterministic — no RNG, stable across
    * engines and partitionings), and every surviving pair's correlation
    * is bit-identical to its value in the full matrix (the moment sums
    * only see that pair's own aligned rows). This is the bounded
    * alternative the [[Indicators.correlationMatrixBlocked]] guard
    * message recommends — oracle-checked here so the recommended path
    * is held to the same hash standard as the path it replaces.
    * targetPairs=2000 keeps the sampling branch ACTIVE at the sf0.01
    * verify scale (150 symbols = 11,175 pairs → threshold 423k keeps
    * ~42% of symbols); smaller universes pass through complete (the
    * oracle's CASE mirrors both branches). Threshold arithmetic is
    * IEEE-double on both engines (correctly-rounded sqrt/divide/
    * multiply, then truncation), so the kept set matches exactly. */
  val q63CorrelationSampled: Q = Q(
    (s, dir) => {
      val daily = Ohlcv.resampleTicks(Tables.events(s, dir), "1d",
        symbolCol = "user_id", tsCol = "ts", priceCol = "value")
      Indicators.correlationMatrixSampled(daily, "user_id", minObs = 10,
          nBlocks = 8, targetPairs = 2000L)
        .orderBy("sym_a", "sym_b")
    },
    Some("""WITH par AS (SELECT s, s*(s-1)//2 AS total,
        CAST(trunc(sqrt(CAST(2000 AS DOUBLE) / (s*(s-1)//2)) * 1000000)
          AS BIGINT) AS threshold
        FROM (SELECT count(DISTINCT user_id) AS s FROM events)),
      keep AS (SELECT DISTINCT user_id FROM events, par
        WHERE total <= 2000 OR
          ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT
            % 1000000 < threshold),
      c AS (SELECT user_id,
        time_bucket(INTERVAL '1 day', ts) AS bucket,
        CAST(round(max_by(value, ts), 4) AS DECIMAL(18,4)) AS close
      FROM events JOIN keep USING (user_id) GROUP BY 1, 2),
      r0 AS (SELECT user_id, bucket, close,
          lag(close) OVER (PARTITION BY user_id ORDER BY bucket) AS prev
        FROM c),
      r AS (SELECT user_id, bucket,
          CAST(round(ln(CAST(close AS DOUBLE) / CAST(prev AS DOUBLE)), 8)
            AS DECIMAL(20,8)) AS ret
        FROM r0 WHERE prev IS NOT NULL AND prev > 0 AND close > 0),
      j AS (SELECT a.user_id AS sym_a, b.user_id AS sym_b,
          a.ret AS x, b.ret AS y
        FROM r a JOIN r b ON b.bucket = a.bucket AND a.user_id < b.user_id),
      p AS (SELECT sym_a, sym_b, x, y,
          CAST(round(CAST(x AS DOUBLE) * CAST(y AS DOUBLE), 12)
            AS DECIMAL(26,12)) AS xy,
          CAST(round(CAST(x AS DOUBLE) * CAST(x AS DOUBLE), 12)
            AS DECIMAL(26,12)) AS x2,
          CAST(round(CAST(y AS DOUBLE) * CAST(y AS DOUBLE), 12)
            AS DECIMAL(26,12)) AS y2
        FROM j),
      s AS (SELECT sym_a, sym_b, count(*) AS n,
          sum(x) AS sx, sum(y) AS sy, sum(xy) AS sxy,
          sum(x2) AS sx2, sum(y2) AS sy2
        FROM p GROUP BY 1, 2 HAVING count(*) >= 10)
      SELECT sym_a, sym_b, n,
        CASE WHEN n * CAST(sx2 AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) <= 0
              OR n * CAST(sy2 AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) <= 0
          THEN NULL
          ELSE round((n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
            / (sqrt(n * CAST(sx2 AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
              * sqrt(n * CAST(sy2 AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6)
        END AS corr
      FROM s ORDER BY 1, 2"""))

  // ---------------------------------------------------------------- q53
  /** Maximum drawdown per symbol — [[Indicators.maxDrawdown]]: cumulative
    * exact-decimal peak, deterministic earliest-trough tie-break. */
  val q53Drawdown: Q = Q(
    (s, dir) =>
      Indicators.maxDrawdown(hourlyCloses(s, dir), "user_id")
        .select(col("user_id"), unix_millis(col("trough_bucket")).as("trough_ms"),
          col("peak"), col("trough"), col("max_drawdown"))
        .orderBy("user_id"),
    Some(s"""WITH $closeCte,
      w AS (SELECT user_id, bucket, close,
          max(close) OVER (PARTITION BY user_id ORDER BY bucket
            ROWS UNBOUNDED PRECEDING) AS peak
        FROM c),
      d AS (SELECT user_id, bucket, close, peak,
          round(CAST(close AS DOUBLE) / CAST(peak AS DOUBLE) - 1, 6) AS dd
        FROM w),
      r AS (SELECT *, row_number() OVER (PARTITION BY user_id
          ORDER BY dd, bucket) AS rn FROM d)
      SELECT user_id, epoch_ms(bucket) AS trough_ms,
        CAST(peak AS DOUBLE) AS peak, CAST(close AS DOUBLE) AS trough,
        dd AS max_drawdown
      FROM r WHERE rn = 1 ORDER BY user_id"""))

  // ---------------------------------------------------------------- q54
  /** Rolling 15-day beta vs the equal-weight index —
    * [[Indicators.rollingBeta]] over the same bounded daily-return
    * universe as q52. */
  val q54Beta: Q = Q(
    (s, dir) => {
      val ev = Tables.events(s, dir)
      val topSyms = ev.groupBy("user_id").agg(count(lit(1)).as("c"))
        .orderBy(col("c").desc, col("user_id")).limit(100)
        .select("user_id")
      val daily = Ohlcv.resampleTicks(ev.join(broadcast(topSyms), "user_id"),
        "1d", symbolCol = "user_id", tsCol = "ts", priceCol = "value")
      Indicators.rollingBeta(daily, "user_id", n = 15)
        .select(col("user_id"), unix_millis(col("bucket")).as("bucket_ms"),
          col("beta"))
        .orderBy("user_id", "bucket_ms")
    },
    Some("""WITH top AS (SELECT user_id FROM
        (SELECT user_id, count(*) AS c FROM events GROUP BY 1)
        ORDER BY c DESC, user_id LIMIT 100),
      c AS (SELECT user_id,
        time_bucket(INTERVAL '1 day', ts) AS bucket,
        CAST(round(max_by(value, ts), 4) AS DECIMAL(18,4)) AS close
      FROM events JOIN top USING (user_id) GROUP BY 1, 2),
      r0 AS (SELECT user_id, bucket, close,
          lag(close) OVER (PARTITION BY user_id ORDER BY bucket) AS prev
        FROM c),
      r AS (SELECT user_id, bucket,
          CAST(round(ln(CAST(close AS DOUBLE) / CAST(prev AS DOUBLE)), 8)
            AS DECIMAL(20,8)) AS ret
        FROM r0 WHERE prev IS NOT NULL AND prev > 0 AND close > 0),
      mkt AS (SELECT bucket,
          CAST(round(CAST(sum(ret) AS DOUBLE) / count(*), 8)
            AS DECIMAL(20,8)) AS mret
        FROM r GROUP BY 1),
      j AS (SELECT r.user_id, r.bucket, r.ret, m.mret,
          CAST(round(CAST(r.ret AS DOUBLE) * CAST(m.mret AS DOUBLE), 12)
            AS DECIMAL(26,12)) AS xm,
          CAST(round(CAST(m.mret AS DOUBLE) * CAST(m.mret AS DOUBLE), 12)
            AS DECIMAL(26,12)) AS m2
        FROM r JOIN mkt m USING (bucket)),
      w AS (SELECT user_id, bucket,
          row_number() OVER wo AS rn,
          sum(ret) OVER wn AS sx, sum(mret) OVER wn AS sm,
          sum(xm) OVER wn AS sxm, sum(m2) OVER wn AS sm2
        FROM j
        WINDOW wo AS (PARTITION BY user_id ORDER BY bucket),
          wn AS (PARTITION BY user_id ORDER BY bucket
            ROWS BETWEEN 14 PRECEDING AND CURRENT ROW))
      SELECT user_id, epoch_ms(bucket) AS bucket_ms,
        CASE WHEN 15 * CAST(sm2 AS DOUBLE)
              - CAST(sm AS DOUBLE) * CAST(sm AS DOUBLE) <= 0 THEN NULL
          ELSE round((15 * CAST(sxm AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sm AS DOUBLE))
            / (15 * CAST(sm2 AS DOUBLE)
              - CAST(sm AS DOUBLE) * CAST(sm AS DOUBLE)), 6)
        END AS beta
      FROM w WHERE rn >= 15 ORDER BY 1, 2"""))

  // ---------------------------------------------------------------- q55
  /** Incremental volatility maintenance — the q41 pattern applied to
    * second moments ([[Indicators.volatilityPartial]] /
    * [[Indicators.mergeVolatility]]): history split at an hour-aligned
    * cutoff, each side reduced to a 3-number (n, Σx, Σx²) state per
    * symbol, states merged by plain addition. The boundary return is
    * carried by prepending the last OLD candle per symbol to the new
    * slice (the carry-in protocol; an hour-aligned cutoff means no candle
    * straddles). Because the sums are exact decimal, merged ≡ full
    * recompute bit for bit — the oracle IS q49's full-recompute SQL. */
  val q55IncrementalVol: Q = Q(
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val cutTs = lit("2024-01-20 00:00:00").cast("timestamp")
      val ev = Tables.events(s, dir)
      def hourly(df: org.apache.spark.sql.DataFrame) =
        Ohlcv.resampleTicks(df, "1h", symbolCol = "user_id", tsCol = "ts",
          priceCol = "value")
      val oldC = hourly(ev.filter(col("ts") < cutTs))
      val newC = hourly(ev.filter(col("ts") >= cutTs))
      val lastOld = oldC.withColumn("_rn", row_number().over(
          Window.partitionBy("user_id").orderBy(col("bucket").desc)))
        .filter(col("_rn") === 1).drop("_rn")
      val oldPart = Indicators.volatilityPartial(oldC, "user_id")
      val newPart = Indicators.volatilityPartial(
        lastOld.unionByName(newC), "user_id")
      Indicators.mergeVolatility(oldPart.unionByName(newPart), "user_id")
        .orderBy("user_id")
    },
    // full-recompute oracle — identical to q49's
    q49Volatility.oracle)

  // ---------------------------------------------------------------- q56
  /** ATR(14) — [[Indicators.atr]]: true range against the previous close
    * over hourly candles (hourly OHLC from the same resample as q48–q51,
    * high/low/close all quantized to exact decimal), 14-bucket SMA from an
    * exact decimal window sum. */
  val q56Atr: Q = Q(
    (s, dir) =>
      Indicators.atr(hourlyCloses(s, dir), "user_id", n = 14)
        .select(col("user_id"), unix_millis(col("bucket")).as("bucket_ms"),
          col("tr"), col("atr"))
        .orderBy("user_id", "bucket_ms"),
    Some("""WITH o AS (SELECT user_id,
          time_bucket(INTERVAL '1 hour', ts) AS bucket,
          CAST(round(max(value), 4) AS DECIMAL(18,4)) AS high,
          CAST(round(min(value), 4) AS DECIMAL(18,4)) AS low,
          CAST(round(max_by(value, ts), 4) AS DECIMAL(18,4)) AS close
        FROM events GROUP BY 1, 2),
      d AS (SELECT user_id, bucket, high, low,
          lag(close) OVER (PARTITION BY user_id ORDER BY bucket) AS pc
        FROM o),
      t AS (SELECT user_id, bucket,
          CAST(greatest(high - low, abs(high - pc), abs(low - pc))
            AS DECIMAL(19,4)) AS tr
        FROM d WHERE pc IS NOT NULL),
      w AS (SELECT user_id, bucket, tr,
          row_number() OVER wo AS rn,
          sum(tr) OVER w14 AS st
        FROM t
        WINDOW wo AS (PARTITION BY user_id ORDER BY bucket),
          w14 AS (PARTITION BY user_id ORDER BY bucket
            ROWS BETWEEN 13 PRECEDING AND CURRENT ROW))
      SELECT user_id, epoch_ms(bucket) AS bucket_ms,
        CAST(tr AS DOUBLE) AS tr,
        round(CAST(st AS DOUBLE) / 14, 6) AS atr
      FROM w WHERE rn >= 14 ORDER BY 1, 2"""))

  // ---------------------------------------------------------------- q57
  /** On-balance volume — [[Indicators.obv]] over hourly candles with the
    * q48 trade-size convention (props.k + 1). sign() on exact decimal
    * deltas, volume integral: the cumulative sum is exact integer
    * arithmetic end to end. */
  val q57Obv: Q = Q(
    (s, dir) => {
      val ticks = Tables.events(s, dir)
        .withColumn("qty",
          get_json_object(col("props"), "$.k").cast("long") + 1)
      val candles = Ohlcv.resampleTicks(ticks, "1h", symbolCol = "user_id",
        tsCol = "ts", priceCol = "value", volumeCol = Some("qty"))
      Indicators.obv(candles, "user_id")
        .select(col("user_id"), unix_millis(col("bucket")).as("bucket_ms"),
          col("obv"))
        .orderBy("user_id", "bucket_ms")
    },
    Some("""WITH c AS (SELECT user_id,
          time_bucket(INTERVAL '1 hour', ts) AS bucket,
          CAST(round(max_by(value, ts), 4) AS DECIMAL(18,4)) AS close,
          CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT) + 1)
            AS BIGINT) AS volume
        FROM events GROUP BY 1, 2),
      d AS (SELECT user_id, bucket, volume,
          close - lag(close) OVER (PARTITION BY user_id ORDER BY bucket)
            AS dlt
        FROM c),
      s AS (SELECT user_id, bucket,
          CASE WHEN dlt IS NULL OR dlt = 0 THEN 0
               WHEN dlt > 0 THEN volume ELSE -volume END AS step
        FROM d)
      SELECT user_id, epoch_ms(bucket) AS bucket_ms,
        CAST(sum(step) OVER (PARTITION BY user_id ORDER BY bucket
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
          AS obv
      FROM s ORDER BY 1, 2"""))

  // ---------------------------------------------------------------- q58
  /** Stochastic oscillator %K(14)/%D(3) — [[Indicators.stochastic]]:
    * exact-decimal channel extrema, flat channel pins %K to 50, %K
    * re-quantized to 8 decimals so the %D average is an exact decimal
    * sum. Partial-channel rows are filtered BEFORE the %D window. */
  val q58Stochastic: Q = Q(
    (s, dir) =>
      Indicators.stochastic(hourlyCloses(s, dir), "user_id", n = 14, d = 3)
        .select(col("user_id"), unix_millis(col("bucket")).as("bucket_ms"),
          col("pct_k"), col("pct_d"))
        .orderBy("user_id", "bucket_ms"),
    Some("""WITH o AS (SELECT user_id,
          time_bucket(INTERVAL '1 hour', ts) AS bucket,
          CAST(round(max(value), 4) AS DECIMAL(18,4)) AS high,
          CAST(round(min(value), 4) AS DECIMAL(18,4)) AS low,
          CAST(round(max_by(value, ts), 4) AS DECIMAL(18,4)) AS close
        FROM events GROUP BY 1, 2),
      w AS (SELECT user_id, bucket, close,
          row_number() OVER wo AS rn,
          max(high) OVER wn AS hh, min(low) OVER wn AS ll
        FROM o
        WINDOW wo AS (PARTITION BY user_id ORDER BY bucket),
          wn AS (PARTITION BY user_id ORDER BY bucket
            ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)),
      k AS (SELECT user_id, bucket,
          CASE WHEN hh = ll THEN 50.0
            ELSE CAST(close - ll AS DOUBLE) * 100.0
              / CAST(hh - ll AS DOUBLE) END AS k_raw
        FROM w WHERE rn >= 14),
      k8 AS (SELECT user_id, bucket, k_raw,
          CAST(round(k_raw, 8) AS DECIMAL(20,8)) AS kq FROM k),
      w2 AS (SELECT user_id, bucket, k_raw,
          row_number() OVER wo AS rn2,
          sum(kq) OVER wd AS sd
        FROM k8
        WINDOW wo AS (PARTITION BY user_id ORDER BY bucket),
          wd AS (PARTITION BY user_id ORDER BY bucket
            ROWS BETWEEN 2 PRECEDING AND CURRENT ROW))
      SELECT user_id, epoch_ms(bucket) AS bucket_ms,
        k_raw AS pct_k,
        CAST(sd AS DOUBLE) / 3 AS pct_d
      FROM w2 WHERE rn2 >= 3 ORDER BY 1, 2"""))

  // ---------------------------------------------------------------- q59
  /** Candlestick pattern flags — [[Indicators.candlePatterns]]: doji /
    * hammer / engulfing as pure exact-decimal comparisons (no float op
    * anywhere — the flags are bit-identical across engines by
    * construction, no rounding convention needed at all). */
  val q59Patterns: Q = Q(
    (s, dir) =>
      Indicators.candlePatterns(hourlyCloses(s, dir), "user_id")
        .select(col("user_id"), unix_millis(col("bucket")).as("bucket_ms"),
          col("open"), col("high"), col("low"), col("close"),
          col("doji"), col("hammer"), col("bull_engulf"), col("bear_engulf"))
        .orderBy("user_id", "bucket_ms"),
    Some("""WITH o AS (SELECT user_id,
          time_bucket(INTERVAL '1 hour', ts) AS bucket,
          CAST(round(min_by(value, ts), 4) AS DECIMAL(18,4)) AS open,
          CAST(round(max(value), 4) AS DECIMAL(18,4)) AS high,
          CAST(round(min(value), 4) AS DECIMAL(18,4)) AS low,
          CAST(round(max_by(value, ts), 4) AS DECIMAL(18,4)) AS close
        FROM events GROUP BY 1, 2),
      p AS (SELECT user_id, bucket, open, high, low, close,
          lag(open) OVER w AS po, lag(close) OVER w AS pc
        FROM o WINDOW w AS (PARTITION BY user_id ORDER BY bucket))
      SELECT user_id, epoch_ms(bucket) AS bucket_ms,
        CAST(open AS DOUBLE) AS open, CAST(high AS DOUBLE) AS high,
        CAST(low AS DOUBLE) AS low, CAST(close AS DOUBLE) AS close,
        abs(close - open) * 10 <= (high - low) AS doji,
        (least(open, close) - low) > 0
          AND (least(open, close) - low) >= abs(close - open) * 2
          AND (high - greatest(open, close)) <= abs(close - open) AS hammer,
        pc IS NOT NULL AND pc < po AND close > open
          AND close >= po AND open <= pc AS bull_engulf,
        pc IS NOT NULL AND pc > po AND close < open
          AND close <= po AND open >= pc AS bear_engulf
      FROM p ORDER BY 1, 2"""))

  // ---------------------------------------------------------------- q60
  /** Keltner channels — [[Indicators.keltner]]: SMA(20) midline ±
    * 1.5 × ATR(14) over hourly OHLC. Raw IEEE outputs (the q58
    * half-boundary lesson applies to BOTH the ÷n and the ×1.5 steps). */
  val q60Keltner: Q = Q(
    (s, dir) =>
      Indicators.keltner(hourlyCloses(s, dir), "user_id", n = 20, m = 14,
          k = 1.5)
        .select(col("user_id"), unix_millis(col("bucket")).as("bucket_ms"),
          col("close"), col("mid"), col("upper"), col("lower"))
        .orderBy("user_id", "bucket_ms"),
    Some("""WITH o AS (SELECT user_id,
          time_bucket(INTERVAL '1 hour', ts) AS bucket,
          CAST(round(max(value), 4) AS DECIMAL(18,4)) AS high,
          CAST(round(min(value), 4) AS DECIMAL(18,4)) AS low,
          CAST(round(max_by(value, ts), 4) AS DECIMAL(18,4)) AS close
        FROM events GROUP BY 1, 2),
      d AS (SELECT user_id, bucket, high, low, close,
          lag(close) OVER (PARTITION BY user_id ORDER BY bucket) AS pc
        FROM o),
      t AS (SELECT user_id, bucket, close,
          CAST(greatest(high - low, abs(high - pc), abs(low - pc))
            AS DECIMAL(19,4)) AS tr
        FROM d WHERE pc IS NOT NULL),
      w AS (SELECT user_id, bucket, close,
          row_number() OVER wo AS rn,
          sum(close) OVER w20 AS sc,
          sum(tr) OVER w14 AS st
        FROM t
        WINDOW wo AS (PARTITION BY user_id ORDER BY bucket),
          w20 AS (PARTITION BY user_id ORDER BY bucket
            ROWS BETWEEN 19 PRECEDING AND CURRENT ROW),
          w14 AS (PARTITION BY user_id ORDER BY bucket
            ROWS BETWEEN 13 PRECEDING AND CURRENT ROW))
      SELECT user_id, epoch_ms(bucket) AS bucket_ms,
        CAST(close AS DOUBLE) AS close,
        CAST(sc AS DOUBLE) / 20 AS mid,
        CAST(sc AS DOUBLE) / 20 + CAST(st AS DOUBLE) / 14 * 1.5 AS upper,
        CAST(sc AS DOUBLE) / 20 - CAST(st AS DOUBLE) / 14 * 1.5 AS lower
      FROM w WHERE rn >= 20 ORDER BY 1, 2"""))

  val all: Map[String, Q] = Map(
    "q60_keltner" -> q60Keltner,
    "q59_patterns" -> q59Patterns,
    "q57_obv" -> q57Obv,
    "q58_stochastic" -> q58Stochastic,
    "q56_atr" -> q56Atr,
    "q55_incremental_vol" -> q55IncrementalVol,
    "q54_beta" -> q54Beta,
    "q48_vwap" -> q48Vwap,
    "q49_volatility" -> q49Volatility,
    "q50_bollinger" -> q50Bollinger,
    "q51_rsi" -> q51Rsi,
    "q52_correlation" -> q52Correlation,
    "q62_correlation_full" -> q62CorrelationFull,
    "q63_correlation_sampled" -> q63CorrelationSampled,
    "q53_drawdown" -> q53Drawdown)
}
