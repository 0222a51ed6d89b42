package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.engine.Ohlcv
import graft.streaming.StreamingResample

/** ST3/ST4 batch-equivalence (SURVEY §2.9): the streaming transforms over a
  * file source must agree with the batch operators on the same rows. */
class StreamingSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("symbol", StringType), StructField("ts", TimestampType),
    StructField("price", DoubleType)))

  private def writeInput(dir: String) = {
    val rnd = new scala.util.Random(11)
    val rows = (1 to 300).map { _ =>
      ("S" + rnd.nextInt(2), msTs(1704067200000L + rnd.nextInt(6 * 3600) * 1000L),
        rnd.nextDouble() * 50 + 1)
    }
    rows.toDF("symbol", "ts", "price").coalesce(2)
      .write.mode("overwrite").parquet(dir)
    rows
  }

  test("ST3: streaming tumbling-window candles equal the batch resample") {
    val dir = java.nio.file.Files.createTempDirectory("graft_stream").toString
    writeInput(s"$dir/in")
    val stream = spark.readStream.schema(schema).parquet(s"$dir/in")
    val candles = StreamingResample.resampleStream(stream, "symbol", "ts",
      "price", "1 hour", "2 hours")
    val q = candles.writeStream.outputMode("complete")
      .format("memory").queryName("st3_out").start()
    try { q.processAllAvailable() } finally { q.stop() }

    val got = spark.table("st3_out")
      .orderBy("symbol", "bucket")
      .select("symbol", "bucket", "open", "high", "low", "close", "n")
      .collect().toSeq
    val want = Ohlcv.resampleTicks(
        spark.read.parquet(s"$dir/in"), "1h", priceCol = "price")
      .orderBy("symbol", "bucket")
      .select("symbol", "bucket", "open", "high", "low", "close", "n")
      .collect().toSeq
    assert(got == want)
  }

  test("streaming VWAP equals the batch indicator bit-for-bit") {
    val dir = java.nio.file.Files.createTempDirectory("graft_svwap").toString
    val rnd = new scala.util.Random(17)
    val rows = (1 to 300).map { _ =>
      ("S" + rnd.nextInt(2),
        msTs(1704067200000L + rnd.nextInt(6 * 3600) * 1000L),
        rnd.nextDouble() * 50 + 1, rnd.nextInt(20) + 1L)
    }
    rows.toDF("symbol", "ts", "price", "qty").coalesce(2)
      .write.mode("overwrite").parquet(s"$dir/in")
    val qschema = schema.add(StructField("qty", LongType))
    val stream = spark.readStream.schema(qschema).parquet(s"$dir/in")
    val q = StreamingResample.vwapStream(stream, "symbol", "ts", "price",
        "qty", "1 hour", "2 hours")
      .writeStream.outputMode("complete").format("memory")
      .queryName("svwap_out").start()
    try { q.processAllAvailable() } finally { q.stop() }
    val got = spark.table("svwap_out").orderBy("symbol", "bucket")
      .select("symbol", "bucket", "vwap", "qty", "n_trades").collect().toSeq
    val want = graft.engine.Indicators.vwap(
        spark.read.parquet(s"$dir/in"), "1h", "symbol", "ts", "price", "qty")
      .orderBy("symbol", "bucket")
      .select("symbol", "bucket", "vwap", "qty", "n_trades").collect().toSeq
    assert(got == want)
  }

  test("ST3 restart: window-agg state survives a checkpoint restart (append mode)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_st3_restart").toString
    val t0 = 1704067200000L
    val rnd = new scala.util.Random(23)
    def mkRows(n: Int, fromH: Int, toH: Int) = (1 to n).map { _ =>
      ("S" + rnd.nextInt(2),
        msTs(t0 + (fromH * 3600 + rnd.nextInt((toH - fromH) * 3600)) * 1000L),
        rnd.nextDouble() * 50 + 1)
    }
    val p1 = mkRows(120, 0, 3)
    val p2 = mkRows(120, 2, 6) // overlaps hour 2: state from run 1 must merge
    p1.toDF("symbol", "ts", "price").coalesce(2)
      .write.mode("overwrite").parquet(s"$dir/in/p1")
    def runStream(): Unit = {
      val stream = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(s"$dir/in/*")
      val q = StreamingResample.resampleStream(stream, "symbol", "ts",
          "price", "1 hour", "2 hours")
        .writeStream.outputMode("append")
        .option("checkpointLocation", s"$dir/ckpt")
        .format("parquet").option("path", s"$dir/out").start()
      try { q.processAllAvailable() } finally { q.stop() }
    }
    runStream() // run 1: hours 0-3 seen; early buckets may or may not emit
    // "more data arrives" while the query is down — incl. a far-future
    // sentinel that pushes the watermark past every real bucket on run 2
    (p2 :+ (("S0", msTs(t0 + 48 * 3600 * 1000L), 1.0)))
      .toDF("symbol", "ts", "price").coalesce(2)
      .write.mode("append").parquet(s"$dir/in/p2")
    runStream() // run 2: restored state + new rows finalize all real buckets

    val got = spark.read.parquet(s"$dir/out")
      .filter(col("bucket") < msTs(t0 + 24 * 3600 * 1000L)) // drop sentinel bucket
      .orderBy("symbol", "bucket")
      .select("symbol", "bucket", "open", "high", "low", "close", "n")
      .collect().toSeq
    val want = Ohlcv.resampleTicks(
        (p1 ++ p2).toDF("symbol", "ts", "price"), "1h", priceCol = "price")
      .orderBy("symbol", "bucket")
      .select("symbol", "bucket", "open", "high", "low", "close", "n")
      .collect().toSeq
    assert(got == want,
      "restarted stream must equal the batch resample over all input")
    assert(got.map(r => (r.getString(0), r.getTimestamp(1))).distinct.size ==
      got.size, "append mode emitted a bucket twice across the restart")
  }

  test("stream-static join: streaming facts enrich against the broadcast catalog") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ssj").toString
    Seq(("BTCUSDT", msTs(1000L), 1.0), ("ZZZ", msTs(2000L), 2.0))
      .toDF("symbol", "ts", "price").write.mode("overwrite").parquet(s"$dir/in")
    val catalog = graft.sources.ExchangeInfo.catalog(spark)
    val joined = spark.readStream.schema(schema).parquet(s"$dir/in")
      .join(org.apache.spark.sql.functions.broadcast(catalog), Seq("symbol"))
      .select("symbol", "ts", "price", "status")
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("ssj_out").start()
    try { q.processAllAvailable() } finally { q.stop() }
    val got = spark.table("ssj_out").collect()
    assert(got.length == 1) // ZZZ not in catalog → dropped by inner join
    assert(got(0).getAs[String]("symbol") == "BTCUSDT")
    assert(got(0).getAs[String]("status") == "TRADING")
  }

  test("foreachBatch upsert sink: stream lands in the store with PK semantics") {
    val dir = java.nio.file.Files.createTempDirectory("graft_fbs").toString
    val store = s"$dir/ohlcv"
    def candle(ts: Long, sym: String, c: Double) =
      (msTs(ts), sym, "1m", 1.0, 2.0, 0.5, c, 10.0)
    // batch 2 re-delivers (2000, BTC) with a new close — last writer wins
    Seq(candle(1000L, "BTC", 1.0), candle(2000L, "BTC", 2.0))
      .toDF("ts", "symbol", "timeframe", "open", "high", "low", "close", "volume")
      .write.mode("overwrite").parquet(s"$dir/in/p1")
    Seq(candle(2000L, "BTC", 99.0), candle(1000L, "ETH", 7.0))
      .toDF("ts", "symbol", "timeframe", "open", "high", "low", "close", "volume")
      .write.mode("append").parquet(s"$dir/in/p2")
    val sch = graft.sources.KlineSource.schema
    val stream = spark.readStream.schema(sch)
      .option("maxFilesPerTrigger", "1").parquet(s"$dir/in/*")
    val q = stream.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        if (new java.io.File(store).exists())
          graft.engine.Store.upsertSave(spark, store, batch)
        else graft.engine.Store.save(batch, store)
      }
      .option("checkpointLocation", s"$dir/ckpt").start()
    try { q.processAllAvailable() } finally { q.stop() }
    val out = spark.read.parquet(store)
    assert(out.count() == 3) // (1000,BTC) (2000,BTC) (1000,ETH)
    val btc2000 = out.filter(col("symbol") === "BTC" &&
      unix_millis(col("ts")) === 2000L).select("close").as[Double].collect()
    assert(btc2000.toSeq == Seq(99.0), "late re-delivery must win on the PK")
  }

  test("streamToStore: DSv2 micro-batch source → upsert store ≡ the batch read") {
    val dir = java.nio.file.Files.createTempDirectory("graft_si").toString
    val t0 = 1704067200000L
    val end = t0 + 6 * 3600000L
    // 3 micro-batches of 2h each, two symbols, through the full pipeline:
    // offset-tracked source → foreachBatch → partition-scoped upsert + meta
    val q = graft.streaming.StreamingIngest.streamToStore(spark, dir,
      "BTCUSDT,ETHUSDT", "1h", t0, end, batchMs = 2 * 3600000L,
      checkpoint = s"$dir/ckpt")
    try { q.processAllAvailable() } finally { q.stop() }
    val cols = Seq("ts", "symbol", "timeframe", "open", "high", "low",
      "close", "volume")
    val got = spark.read.parquet(s"$dir/ohlcv")
      .select(cols.map(col): _*).collect()
      .map(_.toSeq).sortBy(_.toString).toSeq
    val want = spark.read.format("graft.sources.KlineSource")
      .option("symbols", "BTCUSDT,ETHUSDT").option("timeframe", "1h")
      .option("startMs", t0.toString).option("endMs", end.toString)
      .load().select(cols.map(col): _*).collect()
      .map(_.toSeq).sortBy(_.toString).toSeq
    assert(got == want, "streamed store diverged from the batch read")
    // the metadata side table tracked the stream: cache-or-fetch now hits
    val md = new graft.engine.MarketData(spark, dir)
    assert(md.checkDataExists("BTCUSDT", "1h", t0, end - 1, end)._1,
      "coverage metadata did not observe the streamed ingest")
  }

  test("streamToStore restart: checkpoint resume completes the range, store stays exact") {
    val dir = java.nio.file.Files.createTempDirectory("graft_sir").toString
    val t0 = 1704067200000L
    val end = t0 + 8 * 3600000L
    def start() = graft.streaming.StreamingIngest.streamToStore(spark, dir,
      "BTCUSDT", "1h", t0, end, batchMs = 2 * 3600000L,
      checkpoint = s"$dir/ckpt")
    // phase 1: ingest at least one micro-batch, then kill mid-stream
    val q1 = start()
    try {
      val deadline = System.currentTimeMillis + 30000
      while (q1.recentProgress.length < 2 &&
        System.currentTimeMillis < deadline) Thread.sleep(50)
    } finally q1.stop()
    // phase 2: resume from the checkpoint — must complete the range and
    // any replayed batch must upsert idempotently, never duplicate
    val q2 = start()
    try { q2.processAllAvailable() } finally { q2.stop() }
    val cols = Seq("ts", "symbol", "timeframe", "open", "high", "low",
      "close", "volume")
    val got = spark.read.parquet(s"$dir/ohlcv")
      .select(cols.map(col): _*).collect().map(_.toSeq).sortBy(_.toString).toSeq
    val want = spark.read.format("graft.sources.KlineSource")
      .option("symbols", "BTCUSDT").option("timeframe", "1h")
      .option("startMs", t0.toString).option("endMs", end.toString)
      .load().select(cols.map(col): _*).collect().map(_.toSeq).sortBy(_.toString).toSeq
    assert(got == want, "restarted stream corrupted or truncated the store")
  }

  test("ST4: streaming PK dedup collapses overlapping re-ingest (DB:215-218)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_stream4").toString
    val rows = Seq(
      ("A", msTs(1000L), 1.0), ("A", msTs(2000L), 2.0), ("B", msTs(1000L), 3.0))
    // page 1 and page 2 overlap on (A, 2000) — like a cursor re-fetch
    rows.take(2).toDF("symbol", "ts", "price")
      .write.mode("overwrite").parquet(s"$dir/in/p1")
    (rows.drop(1) :+ ("A", msTs(3000L), 4.0)).toDF("symbol", "ts", "price")
      .write.mode("append").parquet(s"$dir/in/p2")
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$dir/in/*")
    val deduped = StreamingResample.dedupStream(stream, "ts", Seq("symbol"), "1 hour")
    val q = deduped.writeStream.outputMode("append")
      .format("memory").queryName("st4_out").start()
    try { q.processAllAvailable() } finally { q.stop() }
    val got = spark.table("st4_out")
    assert(got.count() == 4) // 5 ingested rows, 1 overlap collapsed
    assert(got.groupBy("symbol", "ts").count().filter(col("count") > 1).isEmpty)
  }

  test("signatureArray equals the oracle-checked batch MinHash aggregate") {
    import graft.ext.Dedup
    val docs = graft.engine.Tables.documents(spark, "/root/testdata/sf0.001")
    val fromArray = docs
      .filter(size(Dedup.shingleHashArray(col("text"))) > 0)
      .select(col("doc_id"), Dedup.signatureArray(col("text"), 16).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val fromAgg = Dedup.minhashSignatures(
        Dedup.hashedShingles(docs, "doc_id", "text"), "doc_id", 16)
      .collect()
      .map(r => r.getLong(0) -> (1 to 16).map(i => r.getLong(i))).toMap
    assert(fromArray.keySet == fromAgg.keySet)
    fromAgg.foreach { case (id, sig) =>
      assert(fromArray(id) == sig, s"doc $id signature mismatch")
    }
    // native ShingleHashF ≡ the interpreted transform/md5 reference chain
    val shingleDiff = docs.filter(col("text").isNotNull)
      .select(Dedup.shingleHashArray(col("text")).as("nat"),
        Dedup.shingleHashArrayHof(col("text")).as("ref"))
      .filter(col("nat") =!= col("ref")).count()
    assert(shingleDiff == 0, "native shingle hashes diverge from reference")
    // the native MinHashSigF expression ≡ its HOF reference formulation
    val fromHof = docs
      .filter(size(Dedup.shingleHashArray(col("text"))) > 0)
      .select(col("doc_id"), Dedup.signatureArrayHof(col("text"), 16).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(fromHof == fromArray)
    // neutral all-P signature for a shingle-less (short) doc, both forms
    import spark.implicits._
    val short = Seq((1L, "just two")).toDF("doc_id", "text")
    val neutral = Seq.fill(16)(Dedup.P)
    assert(short.select(Dedup.signatureArray(col("text"), 16))
      .head.getSeq[Long](0) == neutral)
    assert(short.select(Dedup.signatureArrayHof(col("text"), 16))
      .head.getSeq[Long](0) == neutral)
  }

  test("near-dup banding refuses bands*rows > numHashes (batch twin " +
      "fails loudly; silent null bands would globally collide)") {
    import graft.streaming.StreamingNearDup
    val docs = Seq((1L, "some words here for the shingles to use"))
      .toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      StreamingNearDup.bandedSignatures(docs, "doc_id", "text",
        numHashes = 16, bands = 8, rows = 4)
    }
    assert(e.getMessage.contains("numHashes"), e.getMessage)
    // the legal boundary config still works
    assert(StreamingNearDup.bandedSignatures(docs, "doc_id", "text",
      numHashes = 16, bands = 4, rows = 4).count() == 4)
  }

  test("streaming near-dup detection finds cross-batch pairs; admission cap bounds state") {
    import graft.ext.Dedup
    import graft.streaming.StreamingNearDup
    val base = "the quick brown fox jumps over the lazy dog again and again today"
    val docs = Seq(
      (1L, base),
      (2L, base.replace("today", "tomorrow")), // near-dup of 1
      (3L, "completely different text about spark query engines and shuffles here now"),
      (4L, base)) // exact dup of 1
    // expected hits, simulated from the BATCH signature table (oracle-
    // checked path): pairs that collide in >=1 band, scored by the
    // MinHash agreement estimator
    val sigs = Dedup.minhashSignatures(
        Dedup.hashedShingles(docs.toDF("doc_id", "text"), "doc_id", "text"),
        "doc_id", 16)
      .collect().map(r => r.getLong(0) -> (1 to 16).map(i => r.getLong(i))).toMap
    def est(a: Long, b: Long) =
      sigs(a).zip(sigs(b)).count { case (x, y) => x == y } / 16.0
    def collide(a: Long, b: Long) = (0 until 4).exists(j =>
      (j * 4 until j * 4 + 4).forall(i => sigs(a)(i) == sigs(b)(i)))
    val expected = (for {
      a <- docs.map(_._1); b <- docs.map(_._1) if a < b
      if collide(a, b) && est(a, b) >= 0.8
    } yield (a, b, est(a, b))).toSet
    assert(expected.exists(p => p._1 == 1L && p._2 == 4L), "sanity: exact dup")
    // stream the corpus in two micro-batches splitting both dup pairs
    val dir = java.nio.file.Files.createTempDirectory("graft_neardup").toString
    val docsSchema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    docs.take(2).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/in/p1")
    docs.drop(2).toDF("doc_id", "text")
      .write.mode("append").parquet(s"$dir/in/p2")
    val stream = spark.readStream.schema(docsSchema)
      .option("maxFilesPerTrigger", "1").parquet(s"$dir/in/*")
    val q = StreamingNearDup.pairsStream(stream, "doc_id", "text")
      .writeStream.outputMode("append")
      .format("memory").queryName("neardup_out").start()
    try { q.processAllAvailable() } finally { q.stop() }
    val got = StreamingNearDup.distinctPairs(spark.table("neardup_out"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == expected, s"stream hits $got != batch-simulated $expected")
    // admission cap (batch execution of the same stateful operator):
    // cap 1 admits only the first doc per bucket -> no pairs; cap 2 pairs
    val twins = Seq((10L, base), (11L, base)).toDF("doc_id", "text")
    assert(StreamingNearDup.pairsStream(twins, "doc_id", "text",
      maxBucket = 1).count() == 0)
    assert(StreamingNearDup.distinctPairs(
      StreamingNearDup.pairsStream(twins, "doc_id", "text", maxBucket = 2)
        .toDF()).count() == 1)
  }

  test("streaming decontamination filter equals the batch x49 verdicts, statelessly") {
    import graft.streaming.StreamingDecontaminate
    val docsSchema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    val bench = Seq((100L, "secret held out benchmark question answer pair"))
      .toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "totally unrelated training text about spark engines"),
      // embeds a benchmark 3-gram ("held out benchmark") → contaminated
      (2L, "prefix words then held out benchmark content appears here"),
      (3L, "another clean document with its own words entirely"))
    val hashes = StreamingDecontaminate.benchmarkHashes(bench, "text")
    assert(hashes.nonEmpty)
    // batch semantics: overlap verdicts match the x49-style shingle join
    val batchClean = StreamingDecontaminate.clean(
      corpus.toDF("doc_id", "text"), "text", hashes)
      .select("doc_id").as[Long].collect().toSet
    assert(batchClean == Set(1L, 3L))
    assert(StreamingDecontaminate.contaminated(
      corpus.toDF("doc_id", "text"), "text", hashes)
      .select("doc_id").as[Long].collect().toSet == Set(2L))
    // threshold form: raising minShared above the max observed shared-
    // shingle count must keep every doc (monotone tolerance)
    val nShared = corpus.toDF("doc_id", "text")
      .select(size(array_intersect(
        array_distinct(graft.ext.Dedup.shingleHashArray(col("text"))),
        typedLit(hashes.toSeq))).as("n"))
      .collect().map(_.getInt(0)).max
    assert(nShared >= 1)
    // a threshold above the max shared count keeps everything
    assert(StreamingDecontaminate.clean(
      corpus.toDF("doc_id", "text"), "text", hashes,
      minShared = nShared + 1).count() == 3)
    // identical code path on a stream: no aggregation, no state store
    val dir = java.nio.file.Files.createTempDirectory("graft_decon").toString
    corpus.toDF("doc_id", "text").write.mode("overwrite").parquet(s"$dir/in")
    val stream = spark.readStream.schema(docsSchema).parquet(s"$dir/in")
    val q = StreamingDecontaminate.clean(stream, "text", hashes)
      .writeStream.outputMode("append")
      .format("memory").queryName("decon_out").start()
    try { q.processAllAvailable() } finally { q.stop() }
    assert(spark.table("decon_out")
      .select("doc_id").as[Long].collect().toSet == batchClean)
  }
}
