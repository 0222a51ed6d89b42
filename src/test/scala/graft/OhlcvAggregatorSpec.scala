package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.engine.Ohlcv
import graft.functions.OhlcvAggregator

class OhlcvAggregatorSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("udaf candle agrees with the min_by/max_by formulation on random data") {
    val rnd = new scala.util.Random(13)
    val df = (1 to 1000).map { _ =>
      ("S" + rnd.nextInt(3), msTs(1704067200000L + rnd.nextInt(86400) * 1000L),
        rnd.nextDouble() * 100 + 1)
    }.toDF("symbol", "ts", "price")

    val candleUdaf = udaf(OhlcvAggregator.agg)
    val got = df.groupBy(col("symbol"), window(col("ts"), "1 hour"))
      .agg(candleUdaf(unix_micros(col("ts")), col("price")).as("c"))
      .select(col("symbol"), col("window.start").as("bucket"),
        col("c.open"), col("c.high"), col("c.low"), col("c.close"),
        col("c.volume"), col("c.n"))
      .orderBy("symbol", "bucket").collect().toSeq
    val want = Ohlcv.resampleTicks(df, "1h", priceCol = "price")
      .select(col("symbol"), col("bucket"), col("open"), col("high"),
        col("low"), col("close"), col("volume"), col("n"))
      .orderBy("symbol", "bucket").collect().toSeq
    assert(got.size == want.size)
    got.zip(want).foreach { case (g, w) =>
      assert(g.getString(0) == w.getString(0))
      assert(g.getTimestamp(1) == w.getTimestamp(1))
      (2 to 5).foreach(i => assert(g.getDouble(i) == w.getDouble(i), s"col $i: $g vs $w"))
      assert(math.abs(g.getDouble(6) - w.getDouble(6)) < 1e-9) // volume sum order
      assert(g.getLong(7) == w.getLong(7))
    }
  }

  test("merge is associative/commutative-safe: empty and single-buffer edges") {
    val a = OhlcvAggregator.agg
    val t = OhlcvAggregator.Tick(100L, 5.0)
    val one = a.reduce(a.zero, t)
    assert(a.merge(a.zero, one) == one)
    assert(a.merge(one, a.zero) == one)
    val t2 = OhlcvAggregator.Tick(50L, 9.0)
    val two = a.reduce(a.zero, t2)
    val m1 = a.finish(a.merge(one, two))
    val m2 = a.finish(a.merge(two, one))
    assert(m1 == m2)
    assert(m1.open == 9.0 && m1.close == 5.0 && m1.n == 2)
  }

  test("merge is commutative on DUPLICATE timestamps: tie breaks on " +
      "price, not combine order") {
    val a = OhlcvAggregator.agg
    // same ts, different prices, in different partial buffers — the
    // pre-fix merge picked whichever side was `a`, so candle open/close
    // depended on combine order
    val b1 = a.reduce(a.zero, OhlcvAggregator.Tick(100L, 7.0))
    val b2 = a.reduce(a.zero, OhlcvAggregator.Tick(100L, 3.0))
    val m1 = a.finish(a.merge(b1, b2))
    val m2 = a.finish(a.merge(b2, b1))
    assert(m1 == m2, s"merge order changed the candle: $m1 vs $m2")
    assert(m1.open == 3.0 && m1.close == 7.0,
      "tie rule: open = lexicographic-min (ts, price), close = max")
    // and reduce is arrival-order-independent on the same shape
    val r1 = a.finish(a.reduce(b1, OhlcvAggregator.Tick(100L, 3.0)))
    val r2 = a.finish(a.reduce(b2, OhlcvAggregator.Tick(100L, 7.0)))
    assert(r1 == r2 && r1 == m1)
  }

  test("SQL registration via udaf()") {
    spark.udf.register("ohlcv_candle", udaf(OhlcvAggregator.agg))
    Seq((1L, 10.0), (2L, 20.0)).toDF("ts", "price")
      .createOrReplaceTempView("ticks")
    val r = spark.sql(
      "SELECT ohlcv_candle(ts, price) AS c FROM ticks").select("c.*").collect()(0)
    assert(r.getAs[Double]("open") == 10.0)
    assert(r.getAs[Double]("close") == 20.0)
  }
}
