package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.engine.Ohlcv
import graft.streaming.LiveCandles

/** The live-candle state stream must converge to the batch resample: the
  * LAST update emitted per (symbol, bucket) across micro-batches equals
  * the batch candle over all data. */
class LiveCandlesSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("mapGroupsWithState live candles converge to the batch resample") {
    val dir = java.nio.file.Files.createTempDirectory("graft_live").toString
    val rnd = new scala.util.Random(21)
    val rows = (1 to 400).map { _ =>
      ("S" + rnd.nextInt(2), msTs(1704067200000L + rnd.nextInt(4 * 3600) * 1000L),
        rnd.nextDouble() * 20 + 1)
    }
    // two files → two micro-batches → buckets get UPDATED, not just created
    rows.take(200).toDF("symbol", "ts", "price")
      .write.mode("overwrite").parquet(s"$dir/in/p1")
    rows.drop(200).toDF("symbol", "ts", "price")
      .write.mode("append").parquet(s"$dir/in/p2")

    val schema = StructType(Seq(
      StructField("symbol", StringType), StructField("ts", TimestampType),
      StructField("price", DoubleType)))
    val ticks = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$dir/in/*")
      .select(col("symbol"),
        unix_millis(date_trunc("hour", col("ts"))).as("bucketMs"),
        unix_micros(col("ts")).as("ts"), col("price"))
      .as[LiveCandles.TickIn]

    val q = LiveCandles.stream(ticks)
      .writeStream.outputMode("update")
      .format("memory").queryName("live_candles").start()
    try { q.processAllAvailable() } finally { q.stop() }

    val updates = spark.table("live_candles")
    // more updates than final keys proves buckets were revised across batches
    val finalPerKey = updates
      .withColumn("seq", monotonically_increasing_id())
      .groupBy("symbol", "bucket")
      .agg(max_by(struct(col("open"), col("high"), col("low"), col("close"),
        col("volume"), col("n")), col("seq")).as("c"))
      .select(col("symbol"), col("bucket"), col("c.*"))
    val want = Ohlcv.resampleTicks(rows.toDF("symbol", "ts", "price"), "1h",
        priceCol = "price")
      .select(col("symbol"), col("bucket"), col("open"), col("high"),
        col("low"), col("close"), col("volume"), col("n"))
    assert(updates.count() > finalPerKey.count(), "no incremental updates seen")
    val g = finalPerKey.orderBy("symbol", "bucket").collect().toSeq
    val w = want.orderBy("symbol", "bucket").collect().toSeq
    assert(g.size == w.size)
    g.zip(w).foreach { case (a, b) =>
      assert(a.getString(0) == b.getString(0))
      assert(a.getTimestamp(1) == b.getTimestamp(1))
      (2 to 5).foreach(i => assert(a.getDouble(i) == b.getDouble(i), s"$a vs $b"))
      assert(math.abs(a.getDouble(6) - b.getDouble(6)) < 1e-9)
      assert(a.getLong(7) == b.getLong(7))
    }
  }

  test("streamEvicting: closed buckets emit a final candle and leave the state") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val t0 = 1704067200000L
    val rnd = new scala.util.Random(31)
    def ticks(fromH: Int, toH: Int, n: Int) = (1 to n).map { _ =>
      ("S" + rnd.nextInt(2),
        msTs(t0 + (fromH * 3600 + rnd.nextInt((toH - fromH) * 3600)) * 1000L),
        rnd.nextDouble() * 20 + 1)
    }
    val early = ticks(0, 1, 100) // hour-0 buckets
    val late = ticks(5, 6, 100)  // hour-5: watermark jumps past hour 0
    val straggler = ticks(0, 1, 20) // hour-0 AGAIN, after eviction

    // MemoryStream: one addData per phase → deterministic batch order
    // (file sources order by modification time, which can tie)
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(String, java.sql.Timestamp, Double)]
    val in = input.toDF().toDF("symbol", "ts", "price")
      .withWatermark("ts", "10 minutes")
      .select(col("symbol"),
        unix_millis(date_trunc("hour", col("ts"))).as("bucketMs"),
        col("ts"), col("price"))
      .as[LiveCandles.TickEvt]
    val q = LiveCandles.streamEvicting(in, 3600000L)
      .writeStream.outputMode("update")
      .format("memory").queryName("live_evict").start()
    try {
      Seq(early, late, straggler).foreach { phase =>
        input.addData(phase)
        q.processAllAvailable()
      }
    } finally { q.stop() }

    val out = spark.table("live_evict")
    val closed = out.filter(col("closed"))
    // every hour-0 bucket must have finalized...
    val hour0 = out.filter(unix_millis(col("bucket")) === t0)
    assert(hour0.select("symbol").distinct().count() ==
      closed.filter(unix_millis(col("bucket")) === t0)
        .select("symbol").distinct().count(),
      "an hour-0 bucket never closed")
    // ...with the exact batch candle as its final emission
    val finalClosed = closed.filter(unix_millis(col("bucket")) === t0)
      .select("symbol", "open", "high", "low", "close", "n")
      .orderBy("symbol").collect().toSeq
    val want = Ohlcv.resampleTicks(early.toDF("symbol", "ts", "price"), "1h",
        priceCol = "price")
      .select("symbol", "open", "high", "low", "close", "n")
      .orderBy("symbol").collect().toSeq
    assert(finalClosed == want, s"$finalClosed vs $want")
    // closed=true really is the LAST emission: the p3 stragglers (hour-0
    // after eviction) must be swallowed, not resurrect a second closure
    val closures = closed.filter(unix_millis(col("bucket")) === t0)
      .groupBy("symbol").count().collect()
    assert(closures.forall(_.getLong(1) == 1),
      s"duplicate closed candles: ${closures.mkString(",")}")
    // and the state store must only hold the still-open (hour-5) buckets —
    // swallowed stragglers must not have re-created hour-0 state rows
    val lastState = q.recentProgress.reverse
      .find(_.stateOperators.nonEmpty).get.stateOperators(0)
    val openBuckets = late.map(r => (r._1, r._2.getTime / 3600000)).distinct.size
    assert(lastState.numRowsTotal == openBuckets,
      s"state rows ${lastState.numRowsTotal} != open buckets $openBuckets — eviction failed")
  }
}
