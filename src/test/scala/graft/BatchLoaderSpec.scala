package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.engine.{BatchLoader, MarketData}

class BatchLoaderSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private val h = 3600000L
  private val t0 = 1704067200000L

  test("multi-symbol batch load: one frame + per-symbol telemetry (UI:226-244)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_batch").toString
    val fetch = (symbol: String, tf: String, from: Long, to: Long) => {
      if (symbol == "BADUSDT") throw new IllegalStateException("exchange 400")
      val dur = graft.engine.Timeframes.durationMs(tf)
      (from until to by dur).map(ts => (msTs(ts), symbol, tf, 1.0, 2.0, 0.5, 1.5, 10.0))
        .toDF("ts", "symbol", "timeframe", "open", "high", "low", "close", "volume")
    }
    val md = new MarketData(spark, dir, fetch)
    val (df, summaries) = BatchLoader.loadMany(md,
      Seq("AUSDT", "BADUSDT", "CUSDT"), "1h", t0, t0 + 5 * h, t0 + 100 * h)
    assert(df.isDefined)
    assert(df.get.select("symbol").distinct().count() == 2)
    assert(df.get.count() == 10)
    val bySym = summaries.map(s => s.symbol -> s).toMap
    assert(bySym("AUSDT").ok && bySym("AUSDT").rows == 5)
    assert(!bySym("BADUSDT").ok &&
      bySym("BADUSDT").error.exists(_.contains("exchange 400")))
    assert(bySym("CUSDT").ok)
  }

  test("resample dispatch path derives coarse candles per symbol (UI:230-233)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_batch2").toString
    val md = new MarketData(spark, dir) // DSv2 fetcher
    val (df, summaries) = BatchLoader.loadMany(md, Seq("XUSDT", "YUSDT"), "1h",
      t0, t0 + 2 * h, t0 + 100 * h, resample = true)
    assert(summaries.forall(_.ok))
    // 1m base fetched, 1h derived: 2 symbols × 2 hourly candles
    assert(df.get.count() == 4)
    assert(df.get.agg(max("n")).head.getLong(0) == 60)
  }
}
