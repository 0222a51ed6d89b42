package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.engine.Ohlcv

class OhlcvSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def ticks = Seq(
    // symbol, ts, price — two 1h buckets for BTC, one for ETH
    ("BTC", ts("2024-01-01 10:05:00"), 10.0),
    ("BTC", ts("2024-01-01 10:20:00"), 30.0),
    ("BTC", ts("2024-01-01 10:50:00"), 20.0),
    ("BTC", ts("2024-01-01 11:10:00"), 5.0),
    ("ETH", ts("2024-01-01 10:30:00"), 100.0)
  ).toDF("symbol", "ts", "price")

  test("resampleTicks computes time-ordered OHLCV per bucket") {
    val out = Ohlcv.resampleTicks(ticks, "1h", priceCol = "price")
      .orderBy("symbol", "bucket").collect()
    assert(out.length == 3)
    val btc10 = out(0)
    assert(btc10.getAs[Double]("open") == 10.0)   // earliest tick
    assert(btc10.getAs[Double]("high") == 30.0)
    assert(btc10.getAs[Double]("low") == 10.0)
    assert(btc10.getAs[Double]("close") == 20.0)  // latest tick
    assert(btc10.getAs[Double]("volume") == 60.0)
    assert(btc10.getAs[Long]("n") == 3L)
    assert(out(1).getAs[Double]("open") == 5.0)   // single-tick bucket
    assert(out(2).getAs[String]("symbol") == "ETH")
  }

  test("resampleCandles rolls 1h candles into 1d preserving OHLC semantics") {
    val hourly = Ohlcv.resampleTicks(ticks, "1h", priceCol = "price")
      .withColumnRenamed("bucket", "ts")
    val daily = Ohlcv.resampleCandles(hourly, "1d").orderBy("symbol").collect()
    val btc = daily(0)
    assert(btc.getAs[Double]("open") == 10.0)  // open of first hour
    assert(btc.getAs[Double]("close") == 5.0)  // close of last hour
    assert(btc.getAs[Double]("high") == 30.0)
    assert(btc.getAs[Double]("low") == 5.0)
    assert(btc.getAs[Double]("volume") == 65.0)
  }

  test("resample invariants hold on seeded random ticks (property)") {
    val rnd = new scala.util.Random(42)
    val rows = (1 to 500).map { i =>
      (if (rnd.nextBoolean()) "A" else "B",
        msTs(1704067200000L + rnd.nextInt(7 * 24 * 3600) * 1000L),
        math.abs(rnd.nextDouble()) * 100 + 1)
    }
    val df = rows.toDF("symbol", "ts", "price")
    val candles = Ohlcv.resampleTicks(df, "4h", priceCol = "price").collect()
    candles.foreach { c =>
      val (o, h, l, cl) = (c.getAs[Double]("open"), c.getAs[Double]("high"),
        c.getAs[Double]("low"), c.getAs[Double]("close"))
      assert(l <= o && o <= h, s"low<=open<=high violated: $c")
      assert(l <= cl && cl <= h, s"low<=close<=high violated: $c")
    }
    // total volume preserved across bucketing
    val total = candles.map(_.getAs[Double]("volume")).sum
    assert(math.abs(total - rows.map(_._3).sum) < 1e-6)
    // bucket count bounded by range/duration per symbol
    assert(candles.length <= 2 * (7 * 24 / 4 + 1))
  }

  test("gapFill 1M walks real calendar month starts, not 30-day steps") {
    // Jan, Feb, Apr 2024 observed; Mar missing. A 30-day grid would drift
    // off the month starts (Jan 31, Mar 1, ...) and mark EVERY real candle
    // a gap; the calendar grid must hit exactly Jan/Feb/Mar/Apr 1st.
    val candles = Seq(
      ("BTC", msTs(1704067200000L), 10.0), // 2024-01-01
      ("BTC", msTs(1706745600000L), 20.0), // 2024-02-01
      ("BTC", msTs(1711929600000L), 40.0)  // 2024-04-01
    ).toDF("symbol", "bucket", "close")
    val out = Ohlcv.gapFill(candles, "1M").orderBy("bucket")
      .select(col("bucket"), col("filled"), col("is_gap")).collect()
    assert(out.length == 4, s"grid size ${out.length}, want 4 month starts")
    assert(out.map(_.getTimestamp(0).getTime).toSeq == Seq(
      1704067200000L, 1706745600000L, 1709251200000L, 1711929600000L))
    assert(out.map(_.getBoolean(2)).toSeq ==
      Seq(false, false, true, false), "only March is a gap")
    assert(out(2).getDouble(1) == 20.0, "March must carry February's close")
  }

  test("sma emits null for the first n-1 rows (pandas min_periods parity)") {
    val df = (1 to 10).map(i => ("A", msTs(i * 60000L), i.toDouble, i.toLong))
      .toDF("symbol", "ts", "price", "id")
    val out = Ohlcv.sma(df, 3, "symbol", "ts", "price", "id")
      .orderBy("ts").select("sma").collect()
    assert(out.take(2).forall(_.isNullAt(0)))
    assert(out(2).getDouble(0) == 2.0) // avg(1,2,3)
    assert(out(9).getDouble(0) == 9.0) // avg(8,9,10)
  }

  test("ingestCast types the raw 12-field kline array (api_connector.py:288-314)") {
    val raw = Seq(
      Seq("1704067200000", "42000.1", "42100.5", "41900.0", "42050.2", "12.5",
        "1704070799999", "525000.0", "100", "6.0", "252000.0", "0")
    ).toDF("kline")
    val out = Ohlcv.ingestCast(raw).collect()(0)
    assert(out.getAs[java.sql.Timestamp]("ts").getTime == 1704067200000L)
    assert(out.getAs[Double]("open") == 42000.1)
    assert(out.getAs[Double]("volume") == 12.5)
    assert(out.schema.fieldNames.toSeq ==
      Seq("ts", "open", "high", "low", "close", "volume"))
  }
}
