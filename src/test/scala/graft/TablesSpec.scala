package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.engine.{Ohlcv, Tables}

class TablesSpec extends AnyFunSuite with SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  test("events loader truncates nanos to micros (DuckDB read parity)") {
    val ev = Tables.events(spark, sf)
    // ts_ns is the raw value; ts must be its floor-to-µs
    val bad = ev.filter(
      unix_micros(col("ts")) =!= expr("ts_ns div 1000")).count()
    assert(bad == 0)
  }

  test("tsRangePushdown ≡ plain µs predicate on every random range (property)") {
    val ev = Tables.events(spark, sf).cache()
    val rnd = new scala.util.Random(29)
    val day = 86400000L
    val t0 = 1704067200000L
    (1 to 10).foreach { _ =>
      val a = t0 + rnd.nextInt(25) * day + rnd.nextInt(86400) * 1000L
      val b = a + rnd.nextInt(3 * 86400) * 1000L
      def iso(ms: Long) = java.time.Instant.ofEpochMilli(ms)
        .atOffset(java.time.ZoneOffset.UTC).toLocalDateTime.toString
      val viaPushdown = ev.filter(Tables.tsRangePushdown(iso(a), iso(b))).count()
      val viaPlain = ev.filter(
        col("ts") >= timestamp_millis(lit(a)) &&
          col("ts") <= timestamp_millis(lit(b))).count()
      assert(viaPushdown == viaPlain, s"range [$a,$b]: $viaPushdown != $viaPlain")
    }
    ev.unpersist()
  }

  test("calendar buckets: 1M truncates to month start, 1w window is fixed 7 days") {
    import spark.implicits._
    val df = Seq(
      ("S", ts("2024-01-31 23:59:59"), 1.0),
      ("S", ts("2024-02-01 00:00:00"), 2.0),
      ("S", ts("2024-02-29 12:00:00"), 3.0) // leap-year February
    ).toDF("symbol", "ts", "price")
    val monthly = Ohlcv.resampleTicks(df, "1M", priceCol = "price")
      .orderBy("bucket").collect()
    assert(monthly.length == 2)
    assert(monthly(0).getAs[java.sql.Timestamp]("bucket").toString
      .startsWith("2024-01-01"))
    assert(monthly(1).getAs[java.sql.Timestamp]("bucket").toString
      .startsWith("2024-02-01"))
    assert(monthly(1).getAs[Long]("n") == 2) // both Feb rows in one calendar month
    // 1w is the reference's fixed 7-day week, not calendar-anchored
    assert(graft.engine.Timeframes.windowDuration("1w") == "7 days")
  }
}
