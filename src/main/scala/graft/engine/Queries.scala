package graft.engine

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Named operator queries (SURVEY.md §2 inventory) with DuckDB oracle SQL.
  *
  * Oracle-parity rules used throughout (see SURVEY §7.3):
  *  - every query is totally ordered on a unique key (row-order determinism);
  *  - time columns are emitted as epoch-millis BIGINT (`unix_millis` /
  *    DuckDB `epoch_ms`) — never raw timestamps — to dodge tz/precision
  *    encoding differences between writers;
  *  - monetary aggregates are computed in DECIMAL (exact, order-independent)
  *    and cast to DOUBLE at the end; double sums whose exact value has ≤ d
  *    decimals are `round(..., d+2)`-ed in BOTH engines, which makes the
  *    float addition-order difference unobservable;
  *  - no `first()`/`last()` — `min_by`/`max_by` keyed on a total order.
  */
object Queries {

  /** One declared operator query: Spark plan + optional DuckDB oracle. */
  final case class Q(
      fn: (SparkSession, String) => DataFrame,
      oracle: Option[String],
      bench: Boolean = false)

  private def decP(c: String) = col(c).cast("decimal(12,2)")
  private def decS(c: String) = col(c).cast("decimal(4,2)")
  private val one = lit(1).cast("decimal(3,2)")

  // ---------------------------------------------------------------- q01
  /** A2 resample — the flagship candle aggregation (events proxy:
    * user_id→symbol, value→price; FIXTURES.md mapping). */
  val q01Resample1h: Q = Q(
    (s, dir) => {
      val ev = Tables.events(s, dir)
      Ohlcv.resampleTicks(ev, "1h", symbolCol = "user_id", tsCol = "ts",
          priceCol = "value")
        .select(col("user_id"), unix_millis(col("bucket")).as("bucket_ms"),
          round(col("open"), 4).as("open"), round(col("high"), 4).as("high"),
          round(col("low"), 4).as("low"), round(col("close"), 4).as("close"),
          round(col("volume"), 4).as("volume"), col("n"))
        .orderBy("user_id", "bucket_ms")
    },
    Some("""SELECT user_id, epoch_ms(time_bucket(INTERVAL '1 hour', ts)) AS bucket_ms,
      round(min_by(value, ts),4) AS open, round(max(value),4) AS high,
      round(min(value),4) AS low, round(max_by(value, ts),4) AS close,
      round(sum(value),4) AS volume, count(*) AS n
      FROM events GROUP BY 1,2 ORDER BY 1,2"""),
    bench = true)

  // ---------------------------------------------------------------- q02
  /** A1/A4-family pricing summary (TPC-H Q1 shape) — grouped sums in exact
    * DECIMAL, final DOUBLE. */
  val q02PricingSummary: Q = Q(
    (s, dir) => {
      val li = Tables.lineitem(s, dir)
      val price = decP("l_extendedprice")
      val disc = one - decS("l_discount")
      val tax = one + decS("l_tax")
      li.filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          round(sum(col("l_quantity")), 4).as("sum_qty"),
          sum(price).cast("double").as("sum_base_price"),
          sum(price * disc).cast("double").as("sum_disc_price"),
          sum(price * disc * tax).cast("double").as("sum_charge"),
          (sum(col("l_quantity")) / count(lit(1))).as("avg_qty"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    },
    Some("""SELECT l_returnflag, l_linestatus,
      round(sum(l_quantity),4) AS sum_qty,
      CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
      CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS sum_disc_price,
      CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2))) * (CAST(1 AS DECIMAL(3,2)) + CAST(l_tax AS DECIMAL(4,2)))) AS DOUBLE) AS sum_charge,
      sum(l_quantity) / count(*) AS avg_qty,
      count(*) AS count_order
      FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      GROUP BY 1,2 ORDER BY 1,2"""),
    bench = true)

  // ---------------------------------------------------------------- q03
  /** S4 keyed range scan + total sort (the reference's core read path,
    * database_handler.py:329-332): partition-prunable key predicate plus a
    * pushed-down timestamp range. */
  val q03RangeScan: Q = Q(
    (s, dir) => {
      val ev = Tables.events(s, dir)
      ev.filter(col("user_id") === 7 &&
          Tables.tsRangePushdown(ev, "2024-01-10 00:00:00", "2024-01-20 23:59:59"))
        .select(col("event_id"), unix_millis(col("ts")).as("ts_ms"),
          col("event_type"), col("value"))
        .orderBy("ts_ms", "event_id")
    },
    Some("""SELECT event_id, epoch_ms(ts) AS ts_ms, event_type, value
      FROM events
      WHERE user_id = 7 AND ts >= TIMESTAMP '2024-01-10 00:00:00'
        AND ts <= TIMESTAMP '2024-01-20 23:59:59'
      ORDER BY ts_ms, event_id"""),
    bench = true)

  // ---------------------------------------------------------------- q04
  /** O4 sorted-limit top-k → TakeOrderedAndProjectExec (no total sort at
    * scale; per-partition top-k then merge). */
  val q04TopK: Q = Q(
    (s, dir) =>
      Tables.orders(s, dir)
        .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(10),
    Some("""SELECT o_orderkey, o_custkey, o_totalprice, o_orderstatus
      FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10"""))

  // ---------------------------------------------------------------- q05
  /** P3/P4/F9/F10 string predicates: case-insensitive substring + suffix. */
  val q05FilterLike: Q = Q(
    (s, dir) =>
      Tables.part(s, dir)
        .filter(lower(col("p_name")).contains("widget") &&
          col("p_type").endsWith("OMY"))
        .select("p_partkey", "p_name", "p_brand", "p_type", "p_retailprice")
        .orderBy("p_partkey"),
    Some("""SELECT p_partkey, p_name, p_brand, p_type, p_retailprice
      FROM part WHERE lower(p_name) LIKE '%widget%' AND p_type LIKE '%OMY'
      ORDER BY p_partkey"""))

  // ---------------------------------------------------------------- q06
  /** A4/A5 grouped counts + distinct count. */
  val q06GroupCount: Q = Q(
    (s, dir) =>
      Tables.events(s, dir)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_events"),
          countDistinct(col("user_id")).as("n_users"),
          round(sum("value"), 4).as("total_value"))
        .orderBy("event_type"),
    Some("""SELECT event_type, count(*) AS n_events,
      count(DISTINCT user_id) AS n_users, round(sum(value),4) AS total_value
      FROM events GROUP BY 1 ORDER BY 1"""),
    bench = true)

  // ---------------------------------------------------------------- q07
  /** A1/S8 per-series coverage min/max — the metadata derivation the
    * reference runs after every save (database_handler.py:219-229). */
  val q07MinmaxCoverage: Q = Q(
    (s, dir) =>
      Tables.events(s, dir)
        .groupBy("user_id", "event_type")
        .agg(unix_millis(min(col("ts"))).as("cov_start_ms"),
          unix_millis(max(col("ts"))).as("cov_end_ms"),
          count(lit(1)).as("n"))
        .orderBy("user_id", "event_type"),
    Some("""SELECT user_id, event_type, epoch_ms(min(ts)) AS cov_start_ms,
      epoch_ms(max(ts)) AS cov_end_ms, count(*) AS n
      FROM events GROUP BY 1,2 ORDER BY 1,2"""))

  // ---------------------------------------------------------------- q08
  /** A3 distinct + limit (type-audit shape, database_handler.py:366). */
  val q08DistinctLimit: Q = Q(
    (s, dir) =>
      Tables.events(s, dir).select("event_type").distinct()
        .orderBy("event_type").limit(3),
    Some("SELECT DISTINCT event_type FROM events ORDER BY 1 LIMIT 3"))

  // ---------------------------------------------------------------- q09
  /** Rollup extension of A1 (SURVEY §2.4) — subtotal + grand-total rows,
    * aggregated-out keys coalesced to a sentinel for unambiguous ordering. */
  val q09Rollup: Q = Q(
    (s, dir) =>
      Tables.lineitem(s, dir)
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("sum_qty"))
        .select(coalesce(col("l_returnflag"), lit("<all>")).as("rf"),
          coalesce(col("l_linestatus"), lit("<all>")).as("ls"),
          col("n"), col("sum_qty"))
        .orderBy("rf", "ls"),
    Some("""SELECT coalesce(l_returnflag,'<all>') AS rf,
      coalesce(l_linestatus,'<all>') AS ls, count(*) AS n,
      sum(l_quantity) AS sum_qty
      FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
      ORDER BY 1,2"""))

  // ---------------------------------------------------------------- q10
  /** Cube extension of A1 over orders. */
  val q10Cube: Q = Q(
    (s, dir) =>
      Tables.orders(s, dir)
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"),
          sum(decP("o_totalprice")).cast("double").as("sum_price"))
        .select(coalesce(col("o_orderstatus"), lit("<all>")).as("status"),
          coalesce(col("o_orderpriority"), lit("<all>")).as("priority"),
          col("n"), col("sum_price"))
        .orderBy("status", "priority"),
    Some("""SELECT coalesce(o_orderstatus,'<all>') AS status,
      coalesce(o_orderpriority,'<all>') AS priority, count(*) AS n,
      CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_price
      FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
      ORDER BY 1,2"""))

  // ---------------------------------------------------------------- q11
  /** J1-generalized star join: fact → dims with explicit broadcasts for the
    * small dimensions (SURVEY §2.3). At 100 TB lineitem⋈orders is the only
    * shuffle; customer/nation/region ride along as broadcast hash joins. */
  val q11JoinStar: Q = Q(
    (s, dir) => {
      val li = Tables.lineitem(s, dir)
      val o = Tables.orders(s, dir)
      val c = Tables.customer(s, dir)
      val n = Tables.nation(s, dir)
      val r = Tables.region(s, dir)
      val revenue = decP("l_extendedprice") * (one - decS("l_discount"))
      // fact⋈fact edge pinned to sort-merge (the 100 TB strategy — orders
      // does not broadcast at scale, and building its broadcast locally is
      // pure driver-side variance); dims stay explicit broadcasts
      li.join(o.hint("merge"), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(sum(revenue).cast("double").as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy("r_name", "n_name")
    },
    Some("""SELECT r_name, n_name,
      CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue,
      count(*) AS n_items
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      GROUP BY 1,2 ORDER BY 1,2"""),
    bench = true)

  // ---------------------------------------------------------------- q12
  /** Large-large equi-join. The `merge` hint pins the sort-merge strategy
    * the planner would choose at 100 TB (where neither side broadcasts),
    * so the SMJ path is genuinely exercised — and its plan evidence real —
    * at local SF too, instead of silently degrading to the broadcast join
    * Catalyst prefers for a 600k-row side. */
  val q12JoinLarge: Q = Q(
    (s, dir) => {
      val li = Tables.lineitem(s, dir)
      val o = Tables.orders(s, dir).filter(col("o_orderstatus") === "F")
      li.join(o.hint("merge"), col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"),
          round(sum(col("l_quantity")), 4).as("sum_qty"))
        .orderBy("o_orderpriority")
    },
    Some("""SELECT o_orderpriority, count(*) AS n, round(sum(l_quantity),4) AS sum_qty
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE o_orderstatus = 'F' GROUP BY 1 ORDER BY 1"""),
    bench = true)

  // ---------------------------------------------------------------- q13
  /** Left-semi join = the coverage-hit probe shape (EXISTS). */
  val q13SemiJoin: Q = Q(
    (s, dir) => {
      val c = Tables.customer(s, dir)
      val big = Tables.orders(s, dir).filter(col("o_totalprice") > 450000)
      c.join(big, col("c_custkey") === col("o_custkey"), "left_semi")
        .select("c_custkey", "c_name", "c_mktsegment")
        .orderBy("c_custkey")
    },
    Some("""SELECT c_custkey, c_name, c_mktsegment FROM customer c
      WHERE EXISTS (SELECT 1 FROM orders o
                    WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 450000)
      ORDER BY c_custkey"""))

  // ---------------------------------------------------------------- q14
  /** Left-anti join = gap detection ("requested minus covered",
    * the reference's planned missing-range fetch, plan.md:79-80). */
  val q14AntiJoin: Q = Q(
    (s, dir) => {
      val c = Tables.customer(s, dir)
      val big = Tables.orders(s, dir).filter(col("o_totalprice") > 450000)
      c.join(big, col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey", "c_mktsegment")
        .orderBy("c_custkey")
    },
    Some("""SELECT c_custkey, c_mktsegment FROM customer c
      WHERE NOT EXISTS (SELECT 1 FROM orders o
                        WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 450000)
      ORDER BY c_custkey"""))

  // ---------------------------------------------------------------- q15
  /** J1/J2 coverage probe with freshness tolerance, injected now
    * (2024-01-31T00:00:00Z), dur = 1h. Requests are each user's purchase
    * span, artificially extended past coverage for user_id % 3 == 0 so both
    * probe branches fire. */
  val q15CoverageProbe: Q = Q(
    (s, dir) => {
      val ev = Tables.events(s, dir)
      val meta = Coverage.deriveMeta(ev, Seq("user_id"), "ts")
      val req = ev.filter(col("event_type") === "purchase")
        .groupBy("user_id")
        .agg(unix_millis(min(col("ts"))).as("req_start_ms"),
          (unix_millis(max(col("ts"))) +
            when(col("user_id") % 3 === 0, lit(259200000L)).otherwise(lit(0L)))
            .as("req_end_ms"))
      Coverage.probe(req, meta, Seq("user_id"), durMs = 3600000L,
          nowMs = 1706659200000L)
        .select("user_id", "req_start_ms", "req_end_ms", "cov_start_ms",
          "cov_end_ms", "covered", "fresh_hit")
        .orderBy("user_id")
    },
    Some("""WITH meta AS (
        SELECT user_id, epoch_ms(min(ts)) AS cov_start_ms,
               epoch_ms(max(ts)) AS cov_end_ms
        FROM events GROUP BY 1),
      req AS (
        SELECT user_id, epoch_ms(min(ts)) AS req_start_ms,
               epoch_ms(max(ts)) + CASE WHEN user_id % 3 = 0 THEN 259200000 ELSE 0 END AS req_end_ms
        FROM events WHERE event_type = 'purchase' GROUP BY 1)
      SELECT r.user_id, req_start_ms, req_end_ms, cov_start_ms, cov_end_ms,
        coalesce(req_start_ms >= cov_start_ms
                 AND req_end_ms <= cov_end_ms + 3600000 - 1, false) AS covered,
        coalesce(NOT (req_start_ms >= cov_start_ms
                      AND req_end_ms <= cov_end_ms + 3600000 - 1)
                 AND req_start_ms >= cov_start_ms
                 AND 1706659200000 - cov_end_ms <= 7200000, false) AS fresh_hit
      FROM req r LEFT JOIN meta m ON r.user_id = m.user_id
      ORDER BY r.user_id"""))

  // ---------------------------------------------------------------- q16
  /** Gap buckets: requested hourly buckets minus covered buckets for one
    * series — anti-join over generated sequence (U-family except). */
  val q16GapBuckets: Q = Q(
    (s, dir) => {
      val requested = s.range(1).select(explode(sequence(
          lit("2024-01-05 00:00:00").cast("timestamp"),
          lit("2024-01-09 23:00:00").cast("timestamp"),
          expr("interval 1 hour"))).as("bucket"))
      val covered = Tables.events(s, dir).filter(col("user_id") === 3)
        .select(date_trunc("hour", col("ts")).as("bucket")).distinct()
      Coverage.gaps(requested, covered, "bucket")
        .select(unix_millis(col("bucket")).as("missing_ms"))
        .orderBy("missing_ms")
    },
    Some("""SELECT epoch_ms(b) AS missing_ms FROM (
        SELECT unnest(generate_series(TIMESTAMP '2024-01-05 00:00:00',
          TIMESTAMP '2024-01-09 23:00:00', INTERVAL 1 HOUR)) AS b)
      WHERE b NOT IN (SELECT date_trunc('hour', ts) FROM events WHERE user_id = 3)
      ORDER BY 1"""))

  // ---------------------------------------------------------------- q17
  /** W1 trailing SMA-20 with pandas NaN-prefix parity (README.md:106). */
  val q17Sma20: Q = Q(
    (s, dir) =>
      Ohlcv.sma(Tables.events(s, dir), 20, "user_id", "ts", "value",
          orderTieBreak = "event_id")
        .select(col("user_id"), unix_millis(col("ts")).as("ts_ms"),
          col("event_id"), round(col("sma"), 6).as("sma20"))
        .orderBy("user_id", "ts_ms", "event_id"),
    Some("""SELECT user_id, epoch_ms(ts) AS ts_ms, event_id,
      CASE WHEN row_number() OVER w >= 20
           THEN round(avg(value) OVER (w ROWS BETWEEN 19 PRECEDING AND CURRENT ROW), 6)
      END AS sma20
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      ORDER BY user_id, ts_ms, event_id"""),
    bench = true)

  // ---------------------------------------------------------------- q18
  /** W2 ranking: top-3 orders per customer (row_number formulation). */
  val q18RankTopN: Q = Q(
    (s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      Tables.orders(s, dir)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select("o_custkey", "rn", "o_orderkey", "o_totalprice")
        .orderBy("o_custkey", "rn")
    },
    Some("""SELECT o_custkey, rn, o_orderkey, o_totalprice FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
          row_number() OVER (PARTITION BY o_custkey
            ORDER BY o_totalprice DESC, o_orderkey) AS rn
        FROM orders)
      WHERE rn <= 3 ORDER BY o_custkey, rn"""))

  // ---------------------------------------------------------------- q19
  /** Range-frame window (SURVEY §2.5 extension): trailing-1h event volume
    * per user. Both engines frame on epoch-µs so boundary membership is
    * bit-identical. */
  val q19Trailing1h: Q = Q(
    (s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(unix_micros(col("ts")))
        .rangeBetween(-3600000000L, 0L)
      Tables.events(s, dir)
        .withColumn("vol_1h", round(sum(col("value")).over(w), 4))
        .withColumn("n_1h", count(lit(1)).over(w))
        .select(col("event_id"), col("user_id"),
          unix_millis(col("ts")).as("ts_ms"), col("vol_1h"), col("n_1h"))
        .orderBy("user_id", "ts_ms", "event_id")
    },
    Some("""SELECT event_id, user_id, epoch_ms(ts) AS ts_ms,
      round(sum(value) OVER w, 4) AS vol_1h, count(*) OVER w AS n_1h
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
                   RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
      ORDER BY user_id, ts_ms, event_id"""))

  // ---------------------------------------------------------------- q20
  /** U1 page-batch union: two overlapping slices, tagged, union all. */
  val q20Union: Q = Q(
    (s, dir) => {
      val ev = Tables.events(s, dir)
      val a = ev.filter(col("user_id").between(1, 5) &&
          col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), lit("a").as("src"))
      val b = ev.filter(col("user_id").between(4, 8) &&
          col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), lit("b").as("src"))
      a.unionByName(b).orderBy("event_id", "src")
    },
    Some("""SELECT * FROM (
        SELECT event_id, user_id, 'a' AS src FROM events
        WHERE user_id BETWEEN 1 AND 5 AND event_type = 'purchase'
        UNION ALL
        SELECT event_id, user_id, 'b' AS src FROM events
        WHERE user_id BETWEEN 4 AND 8 AND event_type = 'purchase')
      ORDER BY event_id, src"""))

  // ---------------------------------------------------------------- q21
  /** EXCEPT (distinct): users with a high-value purchase but no high-value
    * error. */
  val q21Except: Q = Q(
    (s, dir) => {
      val ev = Tables.events(s, dir)
      ev.filter(col("event_type") === "purchase" && col("value") > 190)
        .select("user_id")
        .except(ev.filter(col("event_type") === "error" && col("value") > 190)
          .select("user_id"))
        .orderBy("user_id")
    },
    Some("""SELECT user_id FROM events WHERE event_type = 'purchase' AND value > 190
      EXCEPT SELECT user_id FROM events WHERE event_type = 'error' AND value > 190
      ORDER BY 1"""))

  // ---------------------------------------------------------------- q22
  /** INTERSECT (distinct): users who both signed up and purchased. */
  val q22Intersect: Q = Q(
    (s, dir) => {
      val ev = Tables.events(s, dir)
      ev.filter(col("event_type") === "signup").select("user_id")
        .intersect(ev.filter(col("event_type") === "purchase").select("user_id"))
        .orderBy("user_id")
    },
    Some("""SELECT user_id FROM events WHERE event_type = 'signup'
      INTERSECT SELECT user_id FROM events WHERE event_type = 'purchase'
      ORDER BY 1"""))

  // ---------------------------------------------------------------- q23
  /** S7/U3 keyed upsert as a query: INSERT OR REPLACE ≡ union + windowed
    * last-writer-wins dedup on the PK (database_handler.py:215-218). */
  val q23UpsertDedup: Q = Q(
    (s, dir) => {
      val ev = Tables.events(s, dir)
      val base = ev.select(col("event_id"), col("user_id"),
        unix_millis(col("ts")).as("ts_ms"), col("value"),
        lit(1).as("ingest_seq"))
      val updates = ev.filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"),
          unix_millis(col("ts")).as("ts_ms"),
          (col("value") * 2).as("value"), lit(2).as("ingest_seq"))
      val w = Window.partitionBy(col("event_id"))
        .orderBy(col("ingest_seq").desc)
      base.unionByName(updates)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1).drop("rn")
        .orderBy("event_id")
    },
    Some("""SELECT event_id, user_id, ts_ms, value, ingest_seq FROM (
        SELECT u.*, row_number() OVER (PARTITION BY event_id
          ORDER BY ingest_seq DESC) AS rn
        FROM (
          SELECT event_id, user_id, epoch_ms(ts) AS ts_ms, value, 1 AS ingest_seq
          FROM events
          UNION ALL
          SELECT event_id, user_id, epoch_ms(ts) AS ts_ms, value * 2 AS value,
                 2 AS ingest_seq
          FROM events WHERE event_type = 'click') u)
      WHERE rn = 1 ORDER BY event_id"""),
    bench = true)

  // ---------------------------------------------------------------- q24
  /** F-bundle: the reference's scalar-function surface in one projection
    * (ms↔ts F1/F2, date_format F7, filename template F8, trim/lower F9,
    * suffix F10, cursor arithmetic F12, timeframe→duration F4). */
  val q24ScalarBundle: Q = Q(
    (s, dir) =>
      Tables.events(s, dir).select(
        col("event_id"),
        unix_millis(col("ts")).as("ts_ms"),
        date_format(col("ts"), "yyyyMMdd").as("day_str"),
        concat_ws("_", col("event_type"), col("user_id").cast("string"),
          date_format(col("ts"), "yyyyMMdd")).as("export_name"),
        lower(trim(col("event_type"))).as("norm_type"),
        col("event_type").endsWith("ck").as("is_ck"),
        (unix_millis(col("ts")) + 1).as("next_cursor_ms"),
        when(col("event_type") === "click", 60000L)
          .when(col("event_type") === "view", 3600000L)
          .when(col("event_type") === "purchase", 86400000L)
          .otherwise(0L).as("tf_ms"))
        .orderBy("event_id"),
    Some("""SELECT event_id, epoch_ms(ts) AS ts_ms,
      strftime(ts, '%Y%m%d') AS day_str,
      concat_ws('_', event_type, CAST(user_id AS VARCHAR),
        strftime(ts, '%Y%m%d')) AS export_name,
      lower(trim(event_type)) AS norm_type,
      event_type LIKE '%ck' AS is_ck,
      epoch_ms(ts) + 1 AS next_cursor_ms,
      CASE event_type WHEN 'click' THEN 60000 WHEN 'view' THEN 3600000
        WHEN 'purchase' THEN 86400000 ELSE 0 END AS tf_ms
      FROM events ORDER BY event_id"""))

  // ---------------------------------------------------------------- q25
  /** JSON extraction over events.props (F-extension, SURVEY §2.8). */
  val q25Json: Q = Q(
    (s, dir) =>
      Tables.events(s, dir)
        .select(get_json_object(col("props"), "$.k").cast("long").as("k"),
          col("value"))
        .groupBy("k")
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 4).as("total"))
        .orderBy("k"),
    Some("""SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
      count(*) AS n, round(sum(value),4) AS total
      FROM events GROUP BY 1 ORDER BY 1"""))

  // ---------------------------------------------------------------- q26
  /** As-of join (J1 interval family): for each purchase, the user's latest
    * view at-or-before it. Implemented shuffle-once: tag both streams,
    * union, one partitioned window pass carrying the last view forward —
    * no pairwise join, so it scales linearly in events per key. */
  val q26AsofJoin: Q = Q(
    (s, dir) => {
      val ev = Tables.events(s, dir)
      // r20: ONE scan — the old views/purchases union scanned events
      // twice (unshared subtrees re-execute lineage); the tagged frame
      // is derivable row-wise from a single IN-filtered pass, and the
      // In(event_type, [view, purchase]) predicate pushes to the scan
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("side"))
        .rowsBetween(Window.unboundedPreceding, 0)
      ev.filter(col("event_type").isin("view", "purchase"))
        .select(col("user_id"), col("ts"), col("value"),
          when(col("event_type") === "purchase", lit(1)).otherwise(lit(0))
            .as("side"),
          when(col("event_type") === "purchase", col("event_id"))
            .as("event_id"))
        .withColumn("asof_view_ms",
          last(when(col("side") === 0, unix_millis(col("ts"))), ignoreNulls = true).over(w))
        .withColumn("asof_value",
          last(when(col("side") === 0, col("value")), ignoreNulls = true).over(w))
        .filter(col("side") === 1)
        .select(col("event_id"), col("user_id"),
          unix_millis(col("ts")).as("ts_ms"), col("asof_view_ms"),
          col("asof_value"))
        .orderBy("event_id")
    },
    Some("""SELECT p.event_id, p.user_id, epoch_ms(p.ts) AS ts_ms,
      epoch_ms(max(v.ts)) AS asof_view_ms,
      max_by(v.value, v.ts) AS asof_value
      FROM (SELECT * FROM events WHERE event_type = 'purchase') p
      LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
        ON v.user_id = p.user_id AND v.ts <= p.ts
      GROUP BY p.event_id, p.user_id, p.ts
      ORDER BY p.event_id"""),
    bench = true)

  // ---------------------------------------------------------------- q27
  /** A2 calendar-month resample — months are not fixed-width, so the bucket
    * is `date_trunc("month")`, not `window()` (SURVEY §7.3; the reference
    * approximates 1M as 30 days — database_handler.py:188-189 — which we
    * deliberately do NOT reproduce). */
  val q27Resample1M: Q = Q(
    (s, dir) => {
      val ev = Tables.events(s, dir)
      Ohlcv.resampleTicks(ev, "1M", symbolCol = "user_id", tsCol = "ts",
          priceCol = "value")
        .select(col("user_id"), unix_millis(col("bucket")).as("month_ms"),
          round(col("open"), 4).as("open"), round(col("high"), 4).as("high"),
          round(col("low"), 4).as("low"), round(col("close"), 4).as("close"),
          round(col("volume"), 4).as("volume"), col("n"))
        .orderBy("user_id", "month_ms")
    },
    Some("""SELECT user_id, epoch_ms(date_trunc('month', ts)) AS month_ms,
      round(min_by(value, ts),4) AS open, round(max(value),4) AS high,
      round(min(value),4) AS low, round(max_by(value, ts),4) AS close,
      round(sum(value),4) AS volume, count(*) AS n
      FROM events GROUP BY 1,2 ORDER BY 1,2"""))

  // ---------------------------------------------------------------- q28
  /** Resample pyramid: 1h candles re-resampled to 1d — the reference's
    * store-minutes-derive-the-rest path (plan.md:86-97) through
    * [[Ohlcv.resampleCandles]]. Two shuffles total; at scale the second
    * one is tiny (one row per symbol-hour). */
  val q28ResamplePyramid: Q = Q(
    (s, dir) => {
      val hourly = Ohlcv.resampleTicks(Tables.events(s, dir), "1h",
          symbolCol = "user_id", tsCol = "ts", priceCol = "value")
        .withColumnRenamed("bucket", "ts")
      Ohlcv.resampleCandles(hourly, "1d", symbolCol = "user_id", tsCol = "ts")
        .select(col("user_id"), unix_millis(col("bucket")).as("day_ms"),
          round(col("open"), 4).as("open"), round(col("high"), 4).as("high"),
          round(col("low"), 4).as("low"), round(col("close"), 4).as("close"),
          round(col("volume"), 4).as("volume"), col("n"))
        .orderBy("user_id", "day_ms")
    },
    Some("""WITH hourly AS (
        SELECT user_id, time_bucket(INTERVAL '1 hour', ts) AS b,
          min_by(value, ts) AS open, max(value) AS high, min(value) AS low,
          max_by(value, ts) AS close, sum(value) AS volume
        FROM events GROUP BY 1,2)
      SELECT user_id, epoch_ms(time_bucket(INTERVAL '1 day', b)) AS day_ms,
        round(min_by(open, b),4) AS open, round(max(high),4) AS high,
        round(min(low),4) AS low, round(max_by(close, b),4) AS close,
        round(sum(volume),4) AS volume, count(*) AS n
      FROM hourly GROUP BY 1,2 ORDER BY 1,2"""))

  // ---------------------------------------------------------------- q29
  /** A2 weekly resample via `date_trunc('week')` (Monday anchor) — chosen
    * over `window("7 days")`, whose epoch anchor lands on a Thursday
    * (SURVEY §7.3 calendar-bucket decision). */
  val q29Resample1w: Q = Q(
    (s, dir) => {
      val ev = Tables.events(s, dir)
      ev.groupBy(col("user_id"), date_trunc("week", col("ts")).as("bucket"))
        .agg(min_by(col("value"), col("ts")).as("open"),
          max(col("value")).as("high"), min(col("value")).as("low"),
          max_by(col("value"), col("ts")).as("close"),
          round(sum(col("value")), 4).as("volume"), count(lit(1)).as("n"))
        .select(col("user_id"), unix_millis(col("bucket")).as("week_ms"),
          col("open"), col("high"), col("low"), col("close"), col("volume"),
          col("n"))
        .orderBy("user_id", "week_ms")
    },
    Some("""SELECT user_id, epoch_ms(date_trunc('week', ts)) AS week_ms,
      min_by(value, ts) AS open, max(value) AS high, min(value) AS low,
      max_by(value, ts) AS close, round(sum(value),4) AS volume,
      count(*) AS n
      FROM events GROUP BY 1,2 ORDER BY 1,2"""))

  // ---------------------------------------------------------------- q30
  /** Skew-safe salted aggregation (SCALING.md): two-stage partial/merge
    * sum via [[Skew.saltedAgg]] must equal the plain grouped sum — here
    * oracle-checked, not just unit-tested. DECIMAL partials keep the
    * two-stage float order difference out of the result. */
  val q30SaltedAgg: Q = Q(
    (s, dir) => {
      val li = Tables.lineitem(s, dir)
      Skew.saltedAgg(li, Seq("l_returnflag"), col("l_orderkey"), 16,
          partial = Seq(sum(decP("l_extendedprice")).as("v"),
            count(lit(1)).as("c")),
          merge = Seq(sum(col("v")).cast("double").as("total_price"),
            sum(col("c")).as("n")))
        .orderBy("l_returnflag")
    },
    Some("""SELECT l_returnflag,
      CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS total_price,
      CAST(count(*) AS BIGINT) AS n
      FROM lineitem GROUP BY 1 ORDER BY 1"""))

  // ---------------------------------------------------------------- q31
  /** Shipping-priority shape (TPC-H Q3): selective filters on all three
    * inputs, fact-fact join + broadcast dim, grouped decimal revenue,
    * top-k by revenue. Ordering on the decimal-derived double is
    * cross-engine safe because the sums are exact. */
  val q31ShippingPriority: Q = Q(
    (s, dir) => {
      val c = Tables.customer(s, dir).filter(col("c_mktsegment") === "BUILDING")
      val o = Tables.orders(s, dir)
        .filter(col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
      val li = Tables.lineitem(s, dir)
        .filter(col("l_shipdate") > lit("1997-01-01").cast("timestamp"))
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
        .agg(sum(decP("l_extendedprice") * (one - decS("l_discount")))
          .cast("double").as("revenue"))
        .select(col("l_orderkey"), unix_millis(col("o_orderdate")).as("odate_ms"),
          col("o_orderpriority"), col("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
    },
    Some("""SELECT l_orderkey, epoch_ms(o_orderdate) AS odate_ms, o_orderpriority,
      CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      WHERE c_mktsegment = 'BUILDING'
        AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
        AND l_shipdate > TIMESTAMP '1997-01-01 00:00:00'
      GROUP BY 1,2,3
      ORDER BY revenue DESC, l_orderkey LIMIT 10"""),
    bench = true)

  // ---------------------------------------------------------------- q32
  /** Explicit GROUPING SETS through the SQL entry path (`spark.sql`) —
    * same Catalyst pipeline as the DSL, exercised once deliberately. */
  val q32GroupingSets: Q = Q(
    (s, dir) => {
      Tables.lineitem(s, dir).createOrReplaceTempView("lineitem_v")
      s.sql("""SELECT coalesce(l_returnflag, '<rf>') AS rf,
          coalesce(l_linestatus, '<ls>') AS ls,
          count(*) AS n, round(sum(l_quantity), 4) AS sum_qty
        FROM lineitem_v
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
        ORDER BY rf, ls""")
    },
    Some("""SELECT coalesce(l_returnflag, '<rf>') AS rf,
      coalesce(l_linestatus, '<ls>') AS ls,
      count(*) AS n, round(sum(l_quantity), 4) AS sum_qty
      FROM lineitem
      GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
      ORDER BY rf, ls"""))

  // ---------------------------------------------------------------- q33
  /** lag/lead analytics: per-user delta to the previous event and time
    * since it — differences of exact values, no rounding needed. */
  val q33LagDelta: Q = Q(
    (s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      Tables.events(s, dir)
        .withColumn("prev_value", lag(col("value"), 1).over(w))
        .withColumn("delta", col("value") - col("prev_value"))
        .withColumn("gap_ms", unix_millis(col("ts")) - lag(unix_millis(col("ts")), 1).over(w))
        .withColumn("next_type", lead(col("event_type"), 1).over(w))
        .select(col("user_id"), col("event_id"), unix_millis(col("ts")).as("ts_ms"),
          col("value"), col("prev_value"), col("delta"), col("gap_ms"),
          col("next_type"))
        .orderBy("user_id", "ts_ms", "event_id")
    },
    Some("""SELECT user_id, event_id, epoch_ms(ts) AS ts_ms, value,
      lag(value, 1) OVER w AS prev_value,
      value - lag(value, 1) OVER w AS delta,
      epoch_ms(ts) - lag(epoch_ms(ts), 1) OVER w AS gap_ms,
      lead(event_type, 1) OVER w AS next_type
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      ORDER BY user_id, ts_ms, event_id"""))

  // ---------------------------------------------------------------- q34
  /** Exact percentiles per group: both engines linearly interpolate over
    * the sorted values, so identical inputs give identical doubles. */
  val q34Percentiles: Q = Q(
    (s, dir) =>
      Tables.events(s, dir)
        .groupBy("event_type")
        .agg(expr("percentile(value, 0.5)").as("p50"),
          expr("percentile(value, 0.9)").as("p90"),
          min(col("value")).as("vmin"), max(col("value")).as("vmax"))
        .orderBy("event_type"),
    Some("""SELECT event_type,
      quantile_cont(value, 0.5) AS p50, quantile_cont(value, 0.9) AS p90,
      min(value) AS vmin, max(value) AS vmax
      FROM events GROUP BY 1 ORDER BY 1"""))

  // ---------------------------------------------------------------- q35
  /** approx_count_distinct extension (SURVEY §2.4). The raw HLL estimates
    * aren't oracle-reproducible (different sketch algorithms), so the
    * COMPARED output carries what IS deterministic in both engines: the
    * exact distinct counts, plus a within-10%-of-exact boolean that each
    * engine computes from its OWN sketch — hash-green as long as both
    * sketches stay inside the bound. Spark's sketch runs at rsd = 0.01,
    * so a 10% miss is a ~10σ event (DuckDB's fixed-precision HLL sits
    * near 1%); the tighter ±5% bound on the raw estimate is asserted in
    * EntrySpec, where a sketch value may live without an oracle. */
  val q35ApproxDistinct: Q = Q(
    (s, dir) =>
      Tables.lineitem(s, dir)
        .groupBy("l_returnflag")
        .agg(
          countDistinct(col("l_partkey")).as("exact_parts"),
          countDistinct(col("l_orderkey")).as("exact_orders"),
          approx_count_distinct(col("l_partkey"), 0.01).as("_ap"),
          approx_count_distinct(col("l_orderkey"), 0.01).as("_ao"))
        .select(col("l_returnflag"), col("exact_parts"), col("exact_orders"),
          (abs(col("_ap") - col("exact_parts")) * 10 <= col("exact_parts"))
            .as("approx_parts_ok"),
          (abs(col("_ao") - col("exact_orders")) * 10 <= col("exact_orders"))
            .as("approx_orders_ok"))
        .orderBy("l_returnflag"),
    Some("""SELECT l_returnflag,
      count(DISTINCT l_partkey) AS exact_parts,
      count(DISTINCT l_orderkey) AS exact_orders,
      abs(approx_count_distinct(l_partkey) - count(DISTINCT l_partkey)) * 10
        <= count(DISTINCT l_partkey) AS approx_parts_ok,
      abs(approx_count_distinct(l_orderkey) - count(DISTINCT l_orderkey)) * 10
        <= count(DISTINCT l_orderkey) AS approx_orders_ok
      FROM lineitem GROUP BY 1 ORDER BY 1"""))

  // ---------------------------------------------------------------- q36
  /** Sessionization: events within a 30-minute inactivity gap form one
    * session — Spark's native `session_window` aggregation; the oracle
    * reproduces its half-open [start, last+gap) semantics with the
    * classic lag + running-sum formulation. A training-pipeline staple
    * (user activity segmentation) beyond the reference's surface. */
  val q36Sessionize: Q = Q(
    (s, dir) =>
      Tables.events(s, dir)
        .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
        .agg(count(lit(1)).as("n_events"),
          round(sum(col("value")), 4).as("session_value"))
        .select(col("user_id"),
          unix_millis(col("session_window.start")).as("start_ms"),
          unix_millis(col("session_window.end")).as("end_ms"),
          col("n_events"), col("session_value"))
        .orderBy("user_id", "start_ms"),
    Some("""WITH g AS (
        SELECT user_id, ts, value,
          CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w >= 1800000000
               OR lag(ts) OVER w IS NULL THEN 1 ELSE 0 END AS new_session
        FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
      s AS (SELECT user_id, ts, value,
          sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        FROM g)
      SELECT user_id, epoch_ms(min(ts)) AS start_ms,
        epoch_ms(max(ts)) + 1800000 AS end_ms,
        count(*) AS n_events, round(sum(value), 4) AS session_value
      FROM s GROUP BY user_id, session_id
      ORDER BY user_id, start_ms"""),
    bench = true)

  // ---------------------------------------------------------------- q37
  /** Pivot: per-user event counts spread over the closed event-type
    * vocabulary (explicit value list ⇒ no extra distinct-values job —
    * the scale-correct form). */
  val q37Pivot: Q = Q(
    (s, dir) => {
      val types = Seq("click", "error", "purchase", "signup", "view")
      val p = Tables.events(s, dir)
        .groupBy("user_id")
        .pivot("event_type", types)
        .agg(count(lit(1)))
      types.foldLeft(p) { (df, t) =>
        df.withColumn(t, coalesce(col(t), lit(0L)))
      }.orderBy("user_id")
    },
    Some("""SELECT user_id,
      count(*) FILTER (WHERE event_type = 'click') AS click,
      count(*) FILTER (WHERE event_type = 'error') AS error,
      count(*) FILTER (WHERE event_type = 'purchase') AS purchase,
      count(*) FILTER (WHERE event_type = 'signup') AS signup,
      count(*) FILTER (WHERE event_type = 'view') AS view
      FROM events GROUP BY 1 ORDER BY 1"""))

  // ---------------------------------------------------------------- q38
  /** Unpivot (melt): wide lineitem measures to long (measure, value)
    * rows — the inverse reshape, free of shuffles (pure flatMap). */
  val q38Unpivot: Q = Q(
    (s, dir) =>
      Tables.lineitem(s, dir)
        .filter(col("l_orderkey") <= 100)
        .unpivot(
          Array(col("l_orderkey"), col("l_linenumber")),
          Array(col("l_quantity"), col("l_extendedprice"),
            col("l_discount"), col("l_tax")),
          "measure", "value")
        .orderBy("l_orderkey", "l_linenumber", "measure"),
    Some("""SELECT l_orderkey, l_linenumber, measure, value FROM (
        SELECT l_orderkey, l_linenumber, 'l_quantity' AS measure, l_quantity AS value FROM lineitem
        UNION ALL SELECT l_orderkey, l_linenumber, 'l_extendedprice', l_extendedprice FROM lineitem
        UNION ALL SELECT l_orderkey, l_linenumber, 'l_discount', l_discount FROM lineitem
        UNION ALL SELECT l_orderkey, l_linenumber, 'l_tax', l_tax FROM lineitem)
      WHERE l_orderkey <= 100
      ORDER BY l_orderkey, l_linenumber, measure"""))

  // ---------------------------------------------------------------- q39
  /** Salted replicated-dim join ([[Skew.saltedJoin]]) must equal the plain
    * join — oracle-checked like q30. Dim = order-priority lookup. */
  val q39SaltedJoin: Q = Q(
    (s, dir) => {
      val li = Tables.lineitem(s, dir)
        .withColumn("o_orderkey", col("l_orderkey")) // align the join key name
      val o = Tables.orders(s, dir)
        .select(col("o_orderkey"), col("o_orderpriority"))
      Skew.saltedJoin(li, o, "o_orderkey",
          factTieBreak = col("l_linenumber"), buckets = 8)
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"), round(sum(col("l_quantity")), 4).as("sum_qty"))
        .orderBy("o_orderpriority")
    },
    Some("""SELECT o_orderpriority, count(*) AS n, round(sum(l_quantity),4) AS sum_qty
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      GROUP BY 1 ORDER BY 1"""))

  // ---------------------------------------------------------------- q40
  /** Large-large range join without a nested loop: purchases attributed to
    * the click (same user) whose 30-minute half-open window contains them.
    * The physical plan is a bucket-prekeyed hash equi-join
    * ([[RangeJoin.pointInInterval]]); a naive theta join here is a
    * BroadcastNestedLoopJoin that cannot scale past one executor's memory. */
  val q40RangeJoin: Q = Q(
    (s, dir) => {
      val ev = Tables.events(s, dir)
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("event_id").as("click_id"),
          unix_millis(col("ts")).as("c_ms"),
          (unix_millis(col("ts")) + lit(1800000L)).as("c_end_ms"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id").as("purchase_id"),
          unix_millis(col("ts")).as("p_ms"))
      RangeJoin.pointInInterval(clicks, purchases, Seq("user_id"),
          "c_ms", "c_end_ms", "p_ms", bucketMs = 1800000L)
        .select(col("user_id"), col("click_id"), col("purchase_id"),
          (col("p_ms") - col("c_ms")).as("lag_ms"))
        .orderBy("user_id", "click_id", "purchase_id")
    },
    Some("""SELECT c.user_id, c.event_id AS click_id, p.event_id AS purchase_id,
      epoch_ms(p.ts) - epoch_ms(c.ts) AS lag_ms
      FROM events c JOIN events p ON c.user_id = p.user_id
        AND c.event_type = 'click' AND p.event_type = 'purchase'
        AND epoch_ms(p.ts) >= epoch_ms(c.ts)
        AND epoch_ms(p.ts) < epoch_ms(c.ts) + 1800000
      ORDER BY 1, 2, 3"""))

  // ---------------------------------------------------------------- q41
  /** Incremental candle maintenance: ticks split at a fixed instant into a
    * "stored" base and a "newly ingested" delta; each side folds to partial
    * candle states, only delta-touched buckets re-merge
    * ([[Ohlcv.mergeCandles]]), untouched base candles pass through
    * unread. The oracle is the FULL recompute (q01's SQL) — incremental ≡
    * batch is exactly the invariant that matters. At 100 TB this is the
    * difference between re-aggregating a day and re-aggregating a decade. */
  val q41IncrementalResample: Q = Q(
    (s, dir) => {
      val splitMs = 1706000000000L // 2024-01-23T09:33:20Z, inside the range
      val ev = Tables.events(s, dir)
      def partial(f: Column) = Ohlcv.resampleTicksPartial(
        ev.filter(f), "1h", symbolCol = "user_id", tsCol = "ts",
        priceCol = "value")
      val base = partial(unix_millis(col("ts")) < splitMs)
      val delta = partial(unix_millis(col("ts")) >= splitMs)
      val touched = delta.select(col("user_id"), col("bucket"))
      val merged = Ohlcv.mergeCandles(
        base.join(touched, Seq("user_id", "bucket"), "left_semi")
          .unionByName(delta), symbolCol = "user_id")
      val untouched = base.join(touched, Seq("user_id", "bucket"), "left_anti")
      merged.unionByName(untouched)
        .select(col("user_id"), unix_millis(col("bucket")).as("bucket_ms"),
          round(col("open"), 4).as("open"), round(col("high"), 4).as("high"),
          round(col("low"), 4).as("low"), round(col("close"), 4).as("close"),
          round(col("volume"), 4).as("volume"), col("n"))
        .orderBy("user_id", "bucket_ms")
    },
    // full recompute — the equivalence oracle (same shape/order as q01)
    Some("""SELECT user_id, epoch_ms(time_bucket(INTERVAL '1 hour', ts)) AS bucket_ms,
      round(min_by(value, ts),4) AS open, round(max(value),4) AS high,
      round(min(value),4) AS low, round(max_by(value, ts),4) AS close,
      round(sum(value),4) AS volume, count(*) AS n
      FROM events GROUP BY 1,2 ORDER BY 1,2"""))

  // ---------------------------------------------------------------- q42
  /** Distribution-rank window family (percent_rank / cume_dist / ntile) —
    * the W-extension members q17–q19/q33 don't cover. Ordering is made
    * total (price desc, key) so ntile is deterministic; percent_rank and
    * cume_dist are ratios of identical integers in both engines →
    * bit-identical doubles, no rounding needed. */
  val q42WindowRanks: Q = Q(
    (s, dir) => {
      val w = Window.partitionBy("o_orderpriority")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      Tables.orders(s, dir)
        .select(col("o_orderkey"), col("o_orderpriority"), col("o_totalprice"))
        .withColumn("pr", percent_rank().over(w))
        .withColumn("cd", cume_dist().over(w))
        .withColumn("quartile", ntile(4).over(w).cast("long"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3).drop("rn")
        .orderBy("o_orderpriority", "o_orderkey")
    },
    Some("""SELECT o_orderkey, o_orderpriority, o_totalprice, pr, cd, quartile
      FROM (SELECT o_orderkey, o_orderpriority, o_totalprice,
          percent_rank() OVER w AS pr, cume_dist() OVER w AS cd,
          ntile(4) OVER w AS quartile, row_number() OVER w AS rn
        FROM orders
        WINDOW w AS (PARTITION BY o_orderpriority
          ORDER BY o_totalprice DESC, o_orderkey))
      WHERE rn <= 3 ORDER BY o_orderpriority, o_orderkey"""))

  // ---------------------------------------------------------------- q43
  /** Correlated EXISTS subquery (TPC-H Q4 shape: orders with a line
    * shipped >60 days after ordering) — Catalyst decorrelates it into a
    * left-semi join; the one subquery form q13's DSL semi-join does not
    * exercise. Timestamp/interval comparisons only → exact in both
    * engines. */
  val q43ExistsSubquery: Q = Q(
    (s, dir) => {
      Tables.orders(s, dir).createOrReplaceTempView("orders_v")
      Tables.lineitem(s, dir).createOrReplaceTempView("lineitem_v")
      s.sql("""SELECT o_orderpriority, count(*) AS n
        FROM orders_v o
        WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
          AND EXISTS (SELECT 1 FROM lineitem_v l
            WHERE l.l_orderkey = o.o_orderkey
              AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
        GROUP BY o_orderpriority ORDER BY o_orderpriority""")
    },
    Some("""SELECT o_orderpriority, count(*) AS n
      FROM orders o
      WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
        AND EXISTS (SELECT 1 FROM lineitem l
          WHERE l.l_orderkey = o.o_orderkey
            AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
      GROUP BY o_orderpriority ORDER BY o_orderpriority"""))

  // ---------------------------------------------------------------- q44
  /** Correlated scalar subquery — decorrelates into an aggregate + join.
    * Pure integer logic (counts), so the decorrelated comparison is exact
    * in both engines. */
  val q44ScalarSubquery: Q = Q(
    (s, dir) => {
      Tables.orders(s, dir).createOrReplaceTempView("orders_v")
      s.sql("""SELECT o_orderkey, o_custkey
        FROM orders_v o
        WHERE (SELECT count(*) FROM orders_v i
               WHERE i.o_custkey = o.o_custkey) > 12
        ORDER BY o_orderkey""")
    },
    Some("""SELECT o_orderkey, o_custkey
      FROM orders o
      WHERE (SELECT count(*) FROM orders i
             WHERE i.o_custkey = o.o_custkey) > 12
      ORDER BY o_orderkey"""))

  // ---------------------------------------------------------------- q45
  /** Multiset set-ops (EXCEPT ALL / INTERSECT ALL) — the bag-semantics
    * variants q21/q22's distinct forms don't exercise. Multiplicity is
    * data (how many 'A'-flag lines an order loses vs its 'R'-flag lines),
    * so the ALL forms are the correct ones here. */
  val q45SetAll: Q = Q(
    (s, dir) => {
      val li = Tables.lineitem(s, dir)
      val a = li.filter(col("l_returnflag") === "A").select("l_orderkey")
      val r = li.filter(col("l_returnflag") === "R").select("l_orderkey")
      a.exceptAll(r)
        .groupBy("l_orderkey").agg(count(lit(1)).as("surplus"))
        .orderBy("l_orderkey")
    },
    Some("""SELECT l_orderkey, count(*) AS surplus FROM (
        SELECT l_orderkey FROM lineitem WHERE l_returnflag = 'A'
        EXCEPT ALL
        SELECT l_orderkey FROM lineitem WHERE l_returnflag = 'R')
      GROUP BY 1 ORDER BY 1"""))

  // ---------------------------------------------------------------- q46
  /** Gap fill + forward fill over a sparse candle series
    * ([[Ohlcv.gapFill]]): the full bucket grid is generated per series
    * (sequence explode — no driver loop), missing buckets carry the last
    * observed close, `is_gap` marks synthesized rows. The continuous
    * series the reference's plotting path implies, and the imputation
    * primitive of a feature pipeline. */
  val q46GapFill: Q = Q(
    (s, dir) => {
      val sparse = Ohlcv.resampleTicks(
        Tables.events(s, dir).filter(col("event_type") === "purchase"),
        "1h", symbolCol = "user_id", tsCol = "ts", priceCol = "value")
      Ohlcv.gapFill(sparse, "1h", symbolCol = "user_id")
        .select(col("user_id"), unix_millis(col("bucket")).as("bucket_ms"),
          col("filled"), col("is_gap"))
        .orderBy("user_id", "bucket_ms")
    },
    Some("""WITH c AS (SELECT user_id,
        time_bucket(INTERVAL '1 hour', ts) AS bucket,
        max_by(value, ts) AS close
      FROM events WHERE event_type = 'purchase' GROUP BY 1,2),
      g AS (SELECT user_id,
        unnest(generate_series(min(bucket), max(bucket), INTERVAL 1 HOUR)) AS bucket
        FROM c GROUP BY user_id)
      SELECT g.user_id, epoch_ms(g.bucket) AS bucket_ms,
        last_value(c.close IGNORE NULLS) OVER (PARTITION BY g.user_id
          ORDER BY g.bucket ROWS UNBOUNDED PRECEDING) AS filled,
        c.bucket IS NULL AS is_gap
      FROM g LEFT JOIN c ON c.user_id = g.user_id AND c.bucket = g.bucket
      ORDER BY 1, 2"""))

  // ---------------------------------------------------------------- q47
  /** Full-outer reconciliation — the one join type the surface lacked:
    * per-user click vs purchase activity FULL OUTER joined; users active
    * on one side only surface with an explicit status. The symmetric-diff
    * report every reconciliation pipeline runs (old-vs-new snapshot,
    * expected-vs-actual). Shape: two partial-aggregated hash aggs + one
    * shuffle full-outer hash join on the same key — no extra pass. */
  val q47FullOuter: Q = Q(
    (s, dir) => {
      val ev = Tables.events(s, dir)
      val clicks = ev.filter(col("event_type") === "click")
        .groupBy("user_id").agg(count(lit(1)).as("n_clicks"))
      val purch = ev.filter(col("event_type") === "purchase")
        .groupBy("user_id").agg(count(lit(1)).as("n_purchases"))
      clicks.join(purch, Seq("user_id"), "full_outer")
        .withColumn("status",
          when(col("n_clicks").isNull, lit("purchases_only"))
            .when(col("n_purchases").isNull, lit("clicks_only"))
            .otherwise(lit("both")))
        .select(col("user_id"),
          coalesce(col("n_clicks"), lit(0L)).as("n_clicks"),
          coalesce(col("n_purchases"), lit(0L)).as("n_purchases"),
          col("status"))
        .orderBy("user_id")
    },
    Some("""WITH c AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n_clicks
        FROM events WHERE event_type = 'click' GROUP BY 1),
      p AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n_purchases
        FROM events WHERE event_type = 'purchase' GROUP BY 1)
      SELECT coalesce(c.user_id, p.user_id) AS user_id,
        coalesce(n_clicks, 0) AS n_clicks,
        coalesce(n_purchases, 0) AS n_purchases,
        CASE WHEN n_clicks IS NULL THEN 'purchases_only'
             WHEN n_purchases IS NULL THEN 'clicks_only'
             ELSE 'both' END AS status
      FROM c FULL OUTER JOIN p ON p.user_id = c.user_id
      ORDER BY 1"""))

  /** Registry — names are stable driver-facing identifiers. */
  val all: Map[String, Q] = Map(
    "q47_full_outer" -> q47FullOuter,
    "q40_range_join" -> q40RangeJoin,
    "q45_set_all" -> q45SetAll,
    "q46_gapfill" -> q46GapFill,
    "q42_window_ranks" -> q42WindowRanks,
    "q43_exists_subquery" -> q43ExistsSubquery,
    "q44_scalar_subquery" -> q44ScalarSubquery,
    "q41_incremental_resample" -> q41IncrementalResample,
    "q01_resample_1h" -> q01Resample1h,
    "q02_pricing_summary" -> q02PricingSummary,
    "q03_range_scan" -> q03RangeScan,
    "q04_topk" -> q04TopK,
    "q05_filter_like" -> q05FilterLike,
    "q06_group_count" -> q06GroupCount,
    "q07_minmax_coverage" -> q07MinmaxCoverage,
    "q08_distinct_limit" -> q08DistinctLimit,
    "q09_rollup" -> q09Rollup,
    "q10_cube" -> q10Cube,
    "q11_join_star" -> q11JoinStar,
    "q12_join_large" -> q12JoinLarge,
    "q13_semi_join" -> q13SemiJoin,
    "q14_anti_join" -> q14AntiJoin,
    "q15_coverage_probe" -> q15CoverageProbe,
    "q16_gap_buckets" -> q16GapBuckets,
    "q17_sma20" -> q17Sma20,
    "q18_rank_topn" -> q18RankTopN,
    "q19_trailing_1h" -> q19Trailing1h,
    "q20_union" -> q20Union,
    "q21_except" -> q21Except,
    "q22_intersect" -> q22Intersect,
    "q23_upsert_dedup" -> q23UpsertDedup,
    "q24_scalar_bundle" -> q24ScalarBundle,
    "q25_json" -> q25Json,
    "q26_asof_join" -> q26AsofJoin,
    "q27_resample_1M" -> q27Resample1M,
    "q30_salted_agg" -> q30SaltedAgg,
    "q31_shipping_priority" -> q31ShippingPriority,
    "q32_grouping_sets" -> q32GroupingSets,
    "q33_lag_delta" -> q33LagDelta,
    "q34_percentiles" -> q34Percentiles,
    "q35_approx_distinct" -> q35ApproxDistinct,
    "q36_sessionize" -> q36Sessionize,
    "q37_pivot" -> q37Pivot,
    "q38_unpivot" -> q38Unpivot,
    "q39_salted_join" -> q39SaltedJoin,
    "q28_resample_pyramid" -> q28ResamplePyramid,
    "q29_resample_1w" -> q29Resample1w)
}
