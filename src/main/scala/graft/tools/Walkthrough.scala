package graft.tools

import org.apache.spark.sql.SparkSession
import graft.engine.{MarketData, Ohlcv, Store}

/** The reference README's end-to-end session (README.md quick-start +
  * the Colab flow colab_interface.py:302-341: pick symbols/period → load
  * with cache check → optional resample → plot/preview → export →
  * manage local data), as a scripted headless walkthrough — the
  * text-mode stand-in for the reference's ipywidgets front end, which
  * this engine deliberately does not reproduce (it is a notebook UI, not
  * a data operation; every data call behind it is the [[MarketData]]
  * facade exercised here).
  *
  * Run it in a spark-shell or via
  * `sbt "runMain graft.tools.Walkthrough /tmp/graft_demo"`; WalkthroughSpec
  * runs the same steps headless and asserts each one.
  */
object Walkthrough {

  /** One executed step: (label, observed row count). */
  type Step = (String, Long)

  /** Execute the whole reference session against `baseDir`; returns the
    * step log the spec asserts. `nowMs` is injected (repo rule: never
    * current_timestamp) — coverage freshness is relative to it. */
  def run(spark: SparkSession, baseDir: String): Seq[Step] = {
    val t0 = 1704067200000L // 2024-01-01T00:00:00Z
    val dayMs = 86400000L
    val nowMs = t0 + 3 * dayMs
    val md = new MarketData(spark, s"$baseDir/markets")
    val built = Seq.newBuilder[Step]
    // eager per-step echo: the CLI shows progress, and a failing step is
    // identifiable by the last line printed
    object steps {
      def +=(s: Step): Unit = {
        println(f"[walkthrough] ${s._1}%-28s ${s._2}%d")
        built += s
      }
      def result(): Seq[Step] = built.result()
    }

    // 1. "Показать локальные данные" — stored-series listing, empty store
    steps += "stored_info_initial" -> md.getStoredInfo().count()

    // request ends are INCLUSIVE timestamps (the coverage-probe
    // convention, Coverage.probe: covered ⟺ req_end ≤ cov_end + dur − 1),
    // so a loaded day is [t0, t0 + day − 1]; getDataIncremental's bucket
    // enumeration is end-EXCLUSIVE and takes t0 + 2·day
    val day1End = t0 + dayMs - 1
    val twoDayEnd = t0 + 2 * dayMs - 1

    // 2. cache check for the requested period — miss on a cold store
    val (hit0, _) = md.checkDataExists("BTCUSDT", "1m", t0, day1End, nowMs)
    steps += "check_before_load" -> (if (hit0) 1L else 0L)

    // 3. load with cache-or-fetch (the Colab load button): fetch + save
    val day1 = md.getData("BTCUSDT", "1m", t0, day1End, nowMs)
    steps += "get_data_day1" -> day1.count()

    // 4. the same request again — now a pure cache hit, no fetch
    val (hit1, _) = md.checkDataExists("BTCUSDT", "1m", t0, day1End, nowMs)
    steps += "check_after_load" -> (if (hit1) 1L else 0L)

    // 5. extend the period: incremental fill fetches ONLY the missing day
    val twoDays = md.getDataIncremental("BTCUSDT", "1m", t0, t0 + 2 * dayMs,
      nowMs)
    steps += "incremental_two_days" -> twoDays.count()

    // 6. resampled load (the "Использовать ресемплинг" checkbox): 4h view
    val h4 = md.getResampledData("BTCUSDT", "4h", t0, twoDayEnd, nowMs)
    steps += "resample_4h" -> h4.count()

    // 7. SMA-20 overlay on the 4h candles (the quick-start indicator)
    val withSma = Ohlcv.sma(h4, 20, "symbol", "bucket", "close", "bucket")
    steps += "sma_non_null" -> withSma.filter(withSma("sma").isNotNull).count()

    // 8. notebook preview + plot-ready candles (head/tail bind, chart)
    val (head, tail) = md.preview("BTCUSDT", "1m", n = 5)
    steps += "preview_rows" -> (head.length + tail.length).toLong
    val plotFrame = md.plotCandles("BTCUSDT", "1m", t0, twoDayEnd, nowMs)
    steps += "plot_candles" -> plotFrame.count()
    // the chart itself (the reference's matplotlib candlesticks,
    // colab_interface.py:467-499) — rendered as text
    val chart = CandlePlot.renderAscii(plotFrame, height = 12)
    println(chart)
    steps += "plot_render_lines" -> chart.split("\n").length.toLong

    // 9. export (the Export CSV / Parquet buttons, filename template)
    val csv = Store.exportCsv(twoDays, s"$baseDir/exports", "BTCUSDT", "1m",
      "2024-01-01", "2024-01-03")
    val pq = Store.exportParquet(twoDays, s"$baseDir/exports", "BTCUSDT",
      "1m", "2024-01-01", "2024-01-03")
    steps += "export_csv" -> spark.read.option("header", "true").csv(csv).count()
    steps += "export_parquet" -> spark.read.parquet(pq).count()

    // 10. local-data management: delete the series, listing empties again
    md.deleteData("BTCUSDT", "1m")
    steps += "stored_info_after_delete" -> md.getStoredInfo().count()

    steps.result()
  }

  def main(args: Array[String]): Unit = {
    val baseDir = args.headOption.getOrElse("/tmp/graft_walkthrough")
    val spark = SparkSession.builder()
      .master(s"local[${math.min(Runtime.getRuntime.availableProcessors, 32)}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .appName("graft-walkthrough")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try run(spark, baseDir) finally spark.stop()
  }
}
