package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
import org.scalatest.funsuite.AnyFunSuite
import graft.engine.{Ohlcv, Tables}

/** Pins `Tables.load` + `Tables.tsRangePushdown` against BOTH physical
  * layouts the harness has shipped for `events.ts` (VERDICT r7/r8 item 2):
  *
  *  - "ns layout": INT64 raw nanos — what TIMESTAMP(NANOS) parquet looks
  *    like to Spark under `nanosAsLong` (LongType). Loader must truncate
  *    to µs and keep `ts_ns` for row-group skipping.
  *  - "µs layout": TIMESTAMP(MICROS, isAdjustedToUTC=false) — read as
  *    TIMESTAMP_NTZ, cast to TimestampType; NO `ts_ns` is synthesized and
  *    the pushdown must not reference it.
  *
  * The fixtures are written inside the spec so the tests hold regardless
  * of which layout `/root/testdata` happens to carry in a given round.
  */
class TablesSpec extends AnyFunSuite with SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  /** Same logical rows in both layouts. Nanos carry a sub-µs residue so
    * truncation and the `hi*1000+999` closed-bound arithmetic are
    * actually exercised. */
  private lazy val (nsDir, usDir): (String, String) = {
    import spark.implicits._
    val t0us = 1704067200000000L // 2024-01-01 00:00:00 UTC in µs
    val rows = (0 until 2000).map { i =>
      val us = t0us + i.toLong * 19 * 60 * 1000000L + i % 7 // ~19min apart
      val ns = us * 1000L + (i * 131) % 1000                // sub-µs residue
      (i.toLong, ns, (i % 23).toLong, s"type_${i % 5}", i * 0.5)
    }
    val nsDf = rows.toDF("event_id", "ts", "user_id", "event_type", "value")
    val base = Files.createTempDirectory("tables-spec").toString
    nsDf.write.mode("overwrite").parquet(s"$base/ns/events.parquet")
    // µs layout: NTZ column → parquet TIMESTAMP(MICROS, adjustedToUTC=false)
    nsDf.withColumn("ts",
        expr("timestamp_micros(ts div 1000)").cast(TimestampNTZType))
      .write.mode("overwrite").parquet(s"$base/us/events.parquet")
    (s"$base/ns", s"$base/us")
  }

  private def iso(ms: Long): String = java.time.Instant.ofEpochMilli(ms)
    .atOffset(java.time.ZoneOffset.UTC).toLocalDateTime.toString

  test("ns layout: loader truncates nanos to micros and keeps raw ts_ns") {
    val ev = Tables.events(spark, nsDir)
    assert(ev.schema("ts").dataType == TimestampType)
    assert(ev.schema("ts_ns").dataType == LongType)
    val bad = ev.filter(
      unix_micros(col("ts")) =!= expr("ts_ns div 1000")).count()
    assert(bad == 0)
  }

  test("µs layout: loader passes ts through; no ts_ns synthesized") {
    val ev = Tables.events(spark, usDir)
    assert(ev.schema("ts").dataType == TimestampType)
    assert(!ev.columns.contains("ts_ns"))
    // identical µs instants as the ns layout after truncation
    val nsSide = Tables.events(spark, nsDir)
      .select(col("event_id"), unix_micros(col("ts")).as("us"))
    val usSide = ev.select(col("event_id"), unix_micros(col("ts")).as("us"))
    assert(nsSide.exceptAll(usSide).isEmpty && usSide.exceptAll(nsSide).isEmpty)
  }

  test("tsRangePushdown ≡ plain µs predicate on both layouts (property)") {
    val layouts = Seq("ns" -> Tables.events(spark, nsDir).cache(),
                      "µs" -> Tables.events(spark, usDir).cache())
    val rnd = new scala.util.Random(29)
    val t0 = 1704067200000L
    (1 to 10).foreach { _ =>
      val a = t0 + rnd.nextInt(25) * 86400000L + rnd.nextInt(86400) * 1000L
      val b = a + rnd.nextInt(3 * 86400) * 1000L
      val counts = layouts.map { case (tag, ev) =>
        val viaPushdown =
          ev.filter(Tables.tsRangePushdown(ev, iso(a), iso(b))).count()
        val viaPlain = ev.filter(
          col("ts") >= timestamp_millis(lit(a)) &&
            col("ts") <= timestamp_millis(lit(b))).count()
        assert(viaPushdown == viaPlain,
          s"$tag range [$a,$b]: $viaPushdown != $viaPlain")
        viaPushdown
      }
      // same logical rows ⇒ same answer from either physical layout
      assert(counts.distinct.size == 1, s"layouts disagree on [$a,$b]: $counts")
    }
    layouts.foreach(_._2.unpersist())
  }

  test("µs layout: ts range predicate reaches the parquet scan (PushedFilters)") {
    // Pins the pushdown claim in Tables.tsRangePushdown's scaladoc: the
    // loader's NTZ→TIMESTAMP cast sits between the filter and the scan, but
    // under the fixed UTC session tz the cast is invertible and Catalyst
    // rewrites the comparison onto the raw timestamp_ntz column and pushes
    // it through the Project — the scan's PushedFilters carries both range
    // bounds, so parquet row-group min/max skipping applies (r9 ADVICE
    // asked for exactly this evidence).
    val ev = Tables.events(spark, usDir)
    val df = ev.filter(Tables.tsRangePushdown(ev, iso(1704931200000L),
      iso(1704931200000L + 2 * 86400000L)))
    df.collect()
    val plan = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    val pushed = plan.linesIterator.filter(_.contains("PushedFilters")).mkString
    assert("GreaterThanOrEqual\\(ts,".r.findFirstIn(pushed).isDefined &&
      "LessThanOrEqual\\(ts,".r.findFirstIn(pushed).isDefined,
      s"ts range bounds not pushed to the parquet scan:\n$plan")
  }

  test("tsRangePushdown works on whatever layout /root/testdata ships") {
    val ev = Tables.events(spark, sf).cache()
    val a = 1704931200000L // 2024-01-11
    val b = a + 2 * 86400000L
    val viaPushdown = ev.filter(Tables.tsRangePushdown(ev, iso(a), iso(b))).count()
    val viaPlain = ev.filter(
      col("ts") >= timestamp_millis(lit(a)) &&
        col("ts") <= timestamp_millis(lit(b))).count()
    assert(viaPushdown == viaPlain)
    assert(viaPushdown > 0, "fixture range should be non-empty at sf0.001")
    ev.unpersist()
  }

  test("ms layout: a TIMESTAMP(MILLIS) events.ts loads and range-scans " +
      "identically to the other layouts") {
    // A third plausible physical drift (the harness has already shipped
    // NANOS then MICROS): INT64 TIMESTAMP(MILLIS). The loader must land
    // on the same output invariants regardless.
    val msDir = {
      val base = Files.createTempDirectory("tables-spec-ms").toString
      val old = spark.conf.getOption("spark.sql.parquet.outputTimestampType")
      spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MILLIS")
      try Tables.events(spark, nsDir)
        .drop("ts_ns")
        // truncate to whole ms so the ms file holds the same instants
        .withColumn("ts", expr("timestamp_millis(unix_millis(ts))"))
        .write.mode("overwrite").parquet(s"$base/events.parquet")
      finally old match {
        case Some(v) => spark.conf.set("spark.sql.parquet.outputTimestampType", v)
        case None => spark.conf.unset("spark.sql.parquet.outputTimestampType")
      }
      // the fixture must really be physical MILLIS, or this test silently
      // re-tests the µs layout
      val part = new java.io.File(s"$base/events.parquet").listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      val footer = org.apache.parquet.hadoop.ParquetFileReader.open(
        org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
          new org.apache.hadoop.fs.Path(part.toString),
          new org.apache.hadoop.conf.Configuration()))
      val ann = try footer.getFooter.getFileMetaData.getSchema
        .getType(Seq("ts"): _*).asPrimitiveType()
        .getLogicalTypeAnnotation.toString
      finally footer.close()
      assert(ann.contains("MILLIS"), s"fixture not MILLIS: $ann")
      base
    }
    val ev = Tables.events(spark, msDir)
    assert(ev.schema("ts").dataType == TimestampType)
    assert(!ev.columns.contains("ts_ns"))
    val a = 1704931200000L // 2024-01-11
    val b = a + 2 * 86400000L
    val viaPushdown = ev.filter(Tables.tsRangePushdown(ev, iso(a), iso(b))).count()
    val viaPlain = ev.filter(
      col("ts") >= timestamp_millis(lit(a)) &&
        col("ts") <= timestamp_millis(lit(b))).count()
    assert(viaPushdown == viaPlain)
    // same rows as the reference layouts over a whole-ms range
    val viaUs = Tables.events(spark, usDir).filter(
      col("ts") >= timestamp_millis(lit(a)) &&
        col("ts") <= timestamp_millis(lit(b))).count()
    assert(viaPlain == viaUs, s"ms layout disagrees with µs layout")
  }

  test("alternate integer widths: int32 doc_id through minhash/LSH, " +
      "int32 vec_id + int64 label + double embeddings through ANN/IVF") {
    // Physical widths have drifted before (events.ts, r7). Pin that the
    // LLM-pipeline paths stay width-agnostic: ids narrower, label wider,
    // embedding elements double instead of float (round-10 sweep,
    // TESTDATA.md invariants table).
    import spark.implicits._
    import graft.ext.{Dedup, Similarity}

    val docs = Seq(
      (1, "the quick brown fox jumps over the lazy dog again and again", 60),
      (2, "the quick brown fox jumps over the lazy dog again and again", 60),
      (3, "a completely different document about spark query planning", 58),
      (4, "another unrelated text mentioning parquet row group statistics", 62)
    ).toDF("doc_id", "text", "n_chars") // doc_id + n_chars: IntegerType
    val sigs = Dedup.minhashSignatures(
      Dedup.hashedShingles(docs, "doc_id", "text"), "doc_id", 16)
    val pairs = Dedup.lshCandidates(sigs, "doc_id").collect()
    assert(pairs.length == 1, s"expected the one duplicate pair, got ${pairs.toSeq}")

    val embs = Seq(
      (1, Array(1.0, 0.0, 0.0, 0.0), 0L),
      (2, Array(0.9, 0.1, 0.0, 0.0), 0L),
      (3, Array(0.0, 1.0, 0.0, 0.0), 1L),
      (4, Array(0.0, 0.9, 0.1, 0.0), 1L),
      (5, Array(0.0, 0.0, 1.0, 0.0), 2L)
    ).toDF("vec_id", "embedding", "label") // int32 id, double[] emb, int64 label
    val q = embs.filter(col("vec_id") === 1).select("embedding")
    val brute = Similarity.bruteForceTopK(embs, q, "vec_id", k = 2).collect()
    assert(brute.map(_.getAs[Number]("vec_id").longValue()).toSeq == Seq(1L, 2L))
    // IVF probe collects probe-cell ids driver-side: must tolerate a
    // persisted index whose cell column widened to int64
    val built = Similarity.ivfBuild(embs, nCells = 3)
    val widened = Similarity.IvfIndex(
      built.assigned.withColumn("cell", col("cell").cast("long")),
      built.centroids.withColumn("cell", col("cell").cast("long")))
    val viaWide = Similarity.ivfProbe(widened, q, "vec_id", k = 2)
      .select("vec_id", "cos").collect().toSeq
    val viaBuilt = Similarity.ivfProbe(built, q, "vec_id", k = 2)
      .select("vec_id", "cos").collect().toSeq
    assert(viaWide.map(r => (r.getAs[Number](0).longValue(), r.getDouble(1))) ==
      viaBuilt.map(r => (r.getAs[Number](0).longValue(), r.getDouble(1))))
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
