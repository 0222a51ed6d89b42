package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.engine.Ohlcv
import graft.sources.ExchangeInfo

class KlineSourceSpec extends AnyFunSuite with SparkTestBase {

  private val dayMs = 86400000L
  private val t0 = 1704067200000L // 2024-01-01T00:00:00Z

  private def read(extra: (String, String)*) = {
    val base = spark.read.format("graft.sources.KlineSource")
      .option("symbols", "BTCUSDT,ETHUSDT")
      .option("startMs", t0.toString)
      .option("endMs", (t0 + 2 * dayMs).toString)
      .option("timeframe", "1m")
    extra.foldLeft(base) { case (r, (k, v)) => r.option(k, v) }.load()
  }

  test("S1: produces one row per (symbol, bucket) over the requested range") {
    val df = read()
    assert(df.count() == 2 * 2 * 1440) // 2 symbols × 2 days × 1440 min
    assert(df.select("symbol").distinct().count() == 2)
    val ts = df.agg(min("ts"), max("ts")).collect()(0)
    assert(ts.getTimestamp(0).getTime == t0)
    assert(ts.getTimestamp(1).getTime == t0 + 2 * dayMs - 60000)
  }

  test("parallel ingest: one input partition per (symbol, slice)") {
    assert(read().rdd.getNumPartitions == 4) // 2 symbols × 2 day-slices
    assert(read("sliceMs" -> (12 * 3600000L).toString).rdd.getNumPartitions == 8)
  }

  test("pagination/partitioning invariance: same data regardless of slicing") {
    val a = read().orderBy("symbol", "ts").collect().toSeq
    val b = read("sliceMs" -> (7 * 3600000L).toString)
      .orderBy("symbol", "ts").collect().toSeq
    assert(a == b)
  }

  test("candle invariants hold and rows are typed OHLCV") {
    val bad = read().filter(!(col("low") <= col("open") &&
      col("open") <= col("high") && col("low") <= col("close") &&
      col("close") <= col("high") && col("volume") > 0)).count()
    assert(bad == 0)
  }

  test("S2 policy: pacing between pages, 60s backoff on rate limit, abort on other") {
    import graft.sources.{PagePolicy, RateLimitException}
    // fake clock records every sleep; nothing actually waits
    var sleeps = Vector.empty[Long]
    val policy = new PagePolicy(paceMs = 100, backoffMs = 60000,
      maxRetries = 10, sleep = sleeps :+= _)
    var attempts = 0
    policy.fetchPaced(() => "page0")
    val p1 = policy.fetchPaced { () =>
      attempts += 1
      if (attempts == 1) throw new RateLimitException("Too much request weight")
      "page1"
    }
    policy.fetchPaced(() => "page2")
    assert(p1 == "page1")
    // page0 unpaced (first), pace before page1, 60s backoff on its retry,
    // pace before page2 — exactly the reference's sequence
    assert(sleeps == Vector(100L, 60000L, 100L))
    // non-rate-limit failures abort immediately: no retry, no sleep
    val before = sleeps.size
    intercept[IllegalArgumentException] {
      policy.fetchPaced(() => throw new IllegalArgumentException("bad symbol"))
    }
    assert(sleeps.size == before + 1, "abort path must not backoff") // only the pace
    // rate-limit retries are bounded: maxRetries exhausted → propagate
    var n = 0
    val tight = new PagePolicy(0, 1, maxRetries = 2, sleep = _ => ())
    intercept[RateLimitException] {
      tight.fetchPaced { () => n += 1; throw new RateLimitException("always") }
    }
    assert(n == 3) // initial attempt + 2 retries
  }

  test("S2 end-to-end: rate-limited pages backoff and results are retry-invariant") {
    import graft.sources.KlineSource
    val recorded = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    KlineSource.sleepHook = Some(ms => recorded.add(ms))
    try {
      // both pages of every partition (1440 buckets = pages 0 and 1) reject
      // their first attempt; pace 100ms so the rhythm shows in the recording.
      // NOTE no orderBy before collect: a range sort would re-scan the
      // source for partition-boundary sampling and double every count here.
      def key(r: org.apache.spark.sql.Row) =
        (r.getString(1), r.getTimestamp(0).getTime)
      val flaky = read("simRateLimitPages" -> "0,1", "paceMs" -> "100")
        .collect().toSeq.sortBy(key)
      val clean = read().collect().toSeq.sortBy(key)
      assert(flaky == clean, "retried ingest diverged from clean ingest")
      val sleeps = recorded.toArray(Array.empty[java.lang.Long]).toVector
      // 4 partitions × 2 simulated rejections, each backing off 60s
      assert(sleeps.count(_ == 60000L) == 8)
      assert(sleeps.count(_ == 100L) > 0, "pacing sleeps missing")
    } finally KlineSource.sleepHook = None
  }

  test("HTTP transport: local stub server serves the Binance klines shape; result equals the simulated read") {
    import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
    // the stub answers /api/v3/klines from the SAME deterministic candle
    // generator the offline transport uses, in the public array-of-arrays
    // payload shape (numerics as quoted decimal strings); first request
    // per (symbol,startTime) optionally rejected with 429 to drive the
    // PagePolicy backoff path end-to-end over real HTTP
    val server = HttpServer.create(new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    val reject429 = new java.util.concurrent.ConcurrentHashMap[String, Boolean]()
    @volatile var sawRetryAfter429 = false
    server.createContext("/api/v3/klines", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        val params = ex.getRequestURI.getQuery.split("&")
          .map(_.split("=", 2)).map(a => a(0) -> a(1)).toMap
        val key = params("symbol") + "@" + params("startTime")
        if (reject429.remove(key) == java.lang.Boolean.TRUE) {
          ex.sendResponseHeaders(429, -1); ex.close(); return
        }
        if (reject429.isEmpty && key.endsWith("@" + t0)) sawRetryAfter429 = true
        val durMs = 60000L
        val from = params("startTime").toLong
        val endIncl = params("endTime").toLong
        val limit = params("limit").toInt
        // exchange-grid contract, like the real API: candles open on the
        // EXCHANGE's boundaries and the response is "openTime >=
        // startTime" — echoing candles at a raw off-grid startTime would
        // both break the grid and degrade last_ts+1 paging to one
        // candle per request
        val first = ((from + durMs - 1) / durMs) * durMs
        val rows = (0 until limit).iterator.map(i => first + i * durMs)
          .takeWhile(_ <= endIncl).map { ts =>
            val (o, h, l, c, v) =
              graft.sources.KlineSource.candle(params("symbol"), ts)
            s"""[$ts,"$o","$h","$l","$c","$v",${ts + durMs - 1},"0",1,"0","0","0"]"""
          }.mkString("[", ",", "]")
        val bytes = rows.getBytes("UTF-8")
        ex.sendResponseHeaders(200, bytes.length)
        ex.getResponseBody.write(bytes)
        ex.close()
      }
    })
    server.start()
    try {
      val endpoint = s"http://127.0.0.1:${server.getAddress.getPort}"
      // reject the first attempt at each symbol's opening page
      reject429.put("BTCUSDT@" + t0, true)
      reject429.put("ETHUSDT@" + t0, true)
      var sleeps = Vector.empty[Long]
      graft.sources.KlineSource.sleepHook = Some(ms =>
        synchronized { sleeps :+= ms })
      val http =
        try read("endpoint" -> endpoint, "rateLimitBackoffMs" -> "60000")
          .orderBy("symbol", "ts").collect().toSeq
        finally graft.sources.KlineSource.sleepHook = None
      val sim = read().orderBy("symbol", "ts").collect().toSeq
      assert(http == sim,
        "HTTP-transport read diverges from the simulated-transport read")
      // both opening pages backed off 60s exactly once, then succeeded
      assert(sleeps.count(_ == 60000L) == 2, s"backoffs in $sleeps")
      assert(sawRetryAfter429, "429'd page was never retried")
    } finally server.stop(0)
  }

  test("HTTP transport: non-200/non-429 aborts the read instead of retrying") {
    import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
    val server = HttpServer.create(new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    val hits = new java.util.concurrent.atomic.AtomicInteger(0)
    server.createContext("/api/v3/klines", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        hits.incrementAndGet()
        ex.sendResponseHeaders(500, -1); ex.close()
      }
    })
    server.start()
    try {
      graft.sources.KlineSource.sleepHook = Some(_ => ())
      val e = intercept[Exception] {
        try spark.read.format("graft.sources.KlineSource")
          .option("symbols", "BTCUSDT").option("timeframe", "1m")
          .option("startMs", t0.toString)
          .option("endMs", (t0 + 3600000L).toString)
          .option("endpoint", s"http://127.0.0.1:${server.getAddress.getPort}")
          .load().collect()
        finally graft.sources.KlineSource.sleepHook = None
      }
      def messages(t: Throwable): Seq[String] =
        Option(t).toSeq.flatMap(x =>
          Option(x.getMessage).toSeq ++ messages(x.getCause))
      assert(messages(e).exists(_.contains("HTTP 500")))
      // only Spark's own task retries (4 attempts in local mode) hit the
      // server — the PagePolicy must NOT have added backoff retries
      assert(hits.get() <= 4, s"page-level retries on a non-rate-limit: ${hits.get()}")
    } finally server.stop(0)
  }

  test("HTTP transport: klines payload parser handles empty ranges and error payloads") {
    import graft.sources.HttpKlineTransport.parseKlines
    assert(parseKlines("[]").isEmpty)
    assert(parseKlines(" [ ] ").isEmpty)
    val one = parseKlines(
      """[[1704067200000,"42.1","43.0","41.5","42.7","99.25",1704067259999,"0",7,"0","0","0"]]""")
    assert(one == Vector(graft.sources.Kline(
      1704067200000L, 42.1, 43.0, 41.5, 42.7, 99.25)))
    val e = intercept[java.io.IOException] {
      parseKlines("""{"code":-1121,"msg":"Invalid symbol."}""")
    }
    assert(e.getMessage.contains("error payload"))
  }

  test("source composes with resampleCandles (ingest → 1h pyramid)") {
    val hourly = Ohlcv.resampleCandles(read(), "1h")
    assert(hourly.count() == 2 * 48) // 2 symbols × 48 hours
    assert(hourly.agg(max("n")).collect()(0).getLong(0) == 60)
  }

  test("ST1: micro-batch stream covers the range incrementally and equals the batch read") {
    val sq = spark.readStream.format("graft.sources.KlineSource")
      .option("symbols", "BTCUSDT,ETHUSDT")
      .option("startMs", t0.toString)
      .option("endMs", (t0 + 2 * dayMs).toString)
      .option("timeframe", "1m")
      .option("batchMs", (6 * 3600000L).toString) // 8 micro-batches
      .load()
      .writeStream.outputMode("append")
      .format("memory").queryName("kline_stream").start()
    try { sq.processAllAvailable() } finally { sq.stop() }
    val streamed = spark.table("kline_stream")
    assert(streamed.count() == 2 * 2 * 1440)
    val a = streamed.orderBy("symbol", "ts").collect().toSeq
    val b = read().orderBy("symbol", "ts").collect().toSeq
    assert(a == b, "stream and batch disagree")
  }

  test("ST1 restart: checkpoint resume re-emits nothing and completes the range") {
    val dir = java.nio.file.Files.createTempDirectory("graft_kline_restart").toString
    def runStream(endMs: Long): Unit = {
      val sq = spark.readStream.format("graft.sources.KlineSource")
        .option("symbols", "BTCUSDT")
        .option("startMs", t0.toString)
        .option("endMs", endMs.toString)
        .option("timeframe", "1m")
        .option("batchMs", (3 * 3600000L).toString)
        .load()
        .writeStream.outputMode("append")
        .option("checkpointLocation", s"$dir/ckpt")
        .format("parquet").option("path", s"$dir/out").start()
      try { sq.processAllAvailable() } finally { sq.stop() }
    }
    // run 1 drains [t0, t0+12h); run 2 restarts from the checkpoint with a
    // larger endMs (more data has "arrived") and must resume at +12h, not
    // regress to startMs and re-emit committed ranges
    runStream(t0 + 12 * 3600000L)
    runStream(t0 + dayMs)
    val out = spark.read.parquet(s"$dir/out") // file-sink metadata log: committed files only
    assert(out.count() == 1440, "restart must complete exactly one day of minutes")
    assert(out.groupBy("symbol", "ts").count()
      .filter(col("count") > 1).isEmpty, "restart re-emitted committed ranges")
    val mm = out.agg(min("ts"), max("ts")).collect()(0)
    assert(mm.getTimestamp(0).getTime == t0)
    assert(mm.getTimestamp(1).getTime == t0 + dayMs - 60000)
  }

  test("symbols option: whitespace and trailing commas do not corrupt " +
      "partition keys") {
    val df = spark.read.format("graft.sources.KlineSource")
      .option("symbols", " BTCUSDT , ETHUSDT ,")
      .option("startMs", t0.toString)
      .option("endMs", (t0 + 3600000L).toString)
      .option("timeframe", "1m").load()
    val syms = df.select("symbol").distinct().collect().map(_.getString(0))
    assert(syms.sorted.toSeq == Seq("BTCUSDT", "ETHUSDT"),
      s"got ${syms.toSeq}")
    // " ETHUSDT" would seed a DIFFERENT offline generator than "ETHUSDT"
    val clean = spark.read.format("graft.sources.KlineSource")
      .option("symbols", "ETHUSDT")
      .option("startMs", t0.toString)
      .option("endMs", (t0 + 3600000L).toString)
      .option("timeframe", "1m").load()
    assert(df.filter(col("symbol") === "ETHUSDT").orderBy("ts")
      .collect().toSeq == clean.orderBy("ts").collect().toSeq)
  }

  test("S2 policy reaches the STREAMING path: micro-batch partitions " +
      "carry the scan's pacing/backoff/retry knobs") {
    import graft.sources.{KlineScanBuilder, KlineOffset, KlinePartition}
    val sb = new KlineScanBuilder(Map(
      "symbols" -> "BTCUSDT", "startMs" -> t0.toString,
      "endMs" -> (t0 + dayMs).toString, "timeframe" -> "1m",
      "paceMs" -> "250", "rateLimitBackoffMs" -> "5000",
      "maxRetries" -> "3", "simRateLimitPages" -> "0"))
    val stream = sb.toMicroBatchStream("unused")
    val parts = stream.planInputPartitions(KlineOffset(t0),
      KlineOffset(t0 + 3600000L))
    val p = parts.head.asInstanceOf[KlinePartition]
    assert(p.paceMs == 250L && p.backoffMs == 5000L && p.maxRetries == 3 &&
      p.simRateLimitPages == Seq(0),
      s"streaming partitions dropped the S2 policy: $p")
  }

  test("transport owns the bucket grid: unaligned fromMs never fetches a " +
      "pre-range bucket, and last_ts+1 paging is grid-agnostic") {
    import graft.sources.SimulatedTransport
    val tr = new SimulatedTransport(60000L)
    // fromMs mid-bucket: first candle opens at the NEXT grid point
    val page = tr.fetchPage("BTCUSDT", "1m", t0 + 30500L, t0 + 600000L, 1000)
    assert(page.head.tsMs == t0 + 60000L && page.forall(_.tsMs % 60000L == 0))
    // last_ts + 1 resumes exactly one bucket later — no skip, no re-fetch
    val next = tr.fetchPage("BTCUSDT", "1m", page.last.tsMs + 1,
      t0 + 1200000L, 1000)
    assert(next.head.tsMs == page.last.tsMs + 60000L)
  }

  test("S13/P3: exchange catalog filters to sorted active USDT pairs") {
    val pairs = ExchangeInfo.usdtTradingPairs(spark).collect()
    assert(pairs.nonEmpty)
    assert(pairs.forall(_.getAs[String]("symbol").endsWith("USDT")))
    assert(pairs.forall(_.getAs[String]("status") == "TRADING"))
    val syms = pairs.map(_.getAs[String]("symbol")).toSeq
    assert(syms == syms.sorted)
    assert(ExchangeInfo.catalog(spark).count() > pairs.length) // filter real
  }
}
