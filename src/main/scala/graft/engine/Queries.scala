package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
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
          col("ts") >= lit("2024-01-10 00:00:00").cast("timestamp") &&
          col("ts") <= lit("2024-01-20 23:59:59").cast("timestamp"))
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

  /** Registry — names are stable driver-facing identifiers. */
  val all: Map[String, Q] = Map(
    "q01_resample_1h" -> q01Resample1h,
    "q02_pricing_summary" -> q02PricingSummary,
    "q03_range_scan" -> q03RangeScan,
    "q04_topk" -> q04TopK,
    "q05_filter_like" -> q05FilterLike,
    "q06_group_count" -> q06GroupCount)
}
