package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.engine.{Store, Tables}

/** Z-order clustering ([[Store.saveZOrdered]]): interleave math pinned
  * against a driver-side reference, row preservation, and the layout's
  * actual pruning evidence — candidate-file counts computed from the
  * written files' min–max stats (what parquet row-group skipping / a
  * file-stats index prunes with) for predicates on EACH dimension,
  * z-ordered vs linear-sorted. */
class ZOrderSpec extends AnyFunSuite with SparkTestBase {

  test("morton interleave matches the reference bit-interleave; cells use " +
      "the exact scaling arithmetic; monotone per dimension at fixed other") {
    val bits = 6
    val n = 40L
    val df = spark.range(n).select(col("id").as("x"))
      .crossJoin(spark.range(n).select(col("id").as("y")))
    val rows = Store.withZValue(df, Seq("x", "y"), bits = bits)
      .select("x", "y", "_z").collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    // replicate the EXACT double arithmetic (same IEEE ops in the same
    // order as the Column expression) so expectations are bit-identical
    val maxCell = (1L << bits) - 1
    def cell(v: Long): Long =
      math.floor((v.toDouble - 0.0) / (n - 1).toDouble * maxCell.toDouble).toLong
    def morton(cx: Long, cy: Long): Long =
      (0 until bits).foldLeft(0L) { (acc, b) =>
        acc + (((cx >> b) & 1L) << (b * 2)) + (((cy >> b) & 1L) << (b * 2 + 1))
      }
    for (x <- 0L until n; y <- 0L until n)
      assert(rows((x, y)) == morton(cell(x), cell(y)),
        s"z mismatch at ($x, $y)")
    // per-dimension monotonicity at a fixed other coordinate (cells are
    // monotone in v; interleaving preserves per-dimension order)
    for (y <- Seq(0L, 17L, n - 1)) {
      val zs = (0L until n).map(x => rows((x, y)))
      assert(zs == zs.sorted, s"z not monotone in x at y=$y")
    }
  }

  test("saveZOrdered preserves rows exactly and prunes BOTH dimensions: " +
      "fewer candidate files than a ts-linear layout for key predicates, " +
      "still-partial pruning for ts predicates") {
    val dir = java.nio.file.Files.createTempDirectory("zorder").toString
    val nFiles = 16
    val ev = Tables.events(spark, "/root/testdata/sf0.01")
      .select(col("event_id"), col("user_id"), col("ts"), col("value"))
    // linear baseline: the Store.save convention (ts-sorted), same file
    // count so candidate counts are comparable
    ev.repartitionByRange(nFiles, col("ts")).sortWithinPartitions("ts")
      .write.mode("overwrite").parquet(s"$dir/linear")
    Store.saveZOrdered(ev, s"$dir/z", Seq("user_id", "ts"), nFiles = nFiles)

    val zBack = spark.read.parquet(s"$dir/z")
    assert(zBack.count() == ev.count() &&
      zBack.except(ev).isEmpty && ev.except(zBack).isEmpty,
      "z-ordered rewrite must preserve rows exactly")

    // per-file [min, max] stats — the information row-group skipping
    // and file-stats indexes prune with. The ts side must SCAN, not
    // read footers: Spark writes timestamps as INT96 by default and
    // INT96 footer statistics are absent by spec (verified on this
    // build); user_id rides the same scan for one pass
    def fileStats(path: String): Seq[(Long, Long, Long, Long)] = {
      val fs = org.apache.hadoop.fs.FileSystem.get(
        new java.net.URI(path), spark.sparkContext.hadoopConfiguration)
      fs.listStatus(new org.apache.hadoop.fs.Path(path))
        .filter(_.getPath.getName.startsWith("part-")).toSeq
        .map { f =>
          val r = spark.read.parquet(f.getPath.toString)
            .agg(min(col("user_id").cast("long")),
              max(col("user_id").cast("long")),
              min(unix_millis(col("ts"))), max(unix_millis(col("ts"))))
            .head
          (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
        }
    }
    val linStats = fileStats(s"$dir/linear")
    val zStats = fileStats(s"$dir/z")
    assert(linStats.size == nFiles && zStats.size == nFiles)

    // key point predicate: a ts-linear layout spreads every user over
    // every file (all candidates); z-order must beat it decisively
    val users = ev.select(col("user_id").cast("long")).distinct()
      .orderBy("user_id").collect().map(_.getLong(0))
    def keyCand(stats: Seq[(Long, Long, Long, Long)], u: Long) =
      stats.count { case (mn, mx, _, _) => mn <= u && u <= mx }
    val probes = Seq(users.head, users(users.length / 2), users.last)
    probes.foreach { u =>
      val (lin, z) = (keyCand(linStats, u), keyCand(zStats, u))
      assert(z < lin, s"user $u: z-order candidates $z !< linear $lin")
      assert(z <= nFiles / 2,
        s"user $u: z-order should prune at least half the files, got $z")
    }

    // ts range predicate (2-day window): linear remains optimal; z-order
    // must still prune SOME files — the documented trade, not a collapse
    val (tsMn, tsMx) = {
      val r = ev.agg(min(unix_millis(col("ts"))),
        max(unix_millis(col("ts")))).head
      (r.getLong(0), r.getLong(1))
    }
    val (lo, hi) = (tsMn, tsMn + (tsMx - tsMn) / 15)
    def tsCand(stats: Seq[(Long, Long, Long, Long)]) =
      stats.count { case (_, _, mn, mx) => mn <= hi && lo <= mx }
    val (linTs, zTs) = (tsCand(linStats), tsCand(zStats))
    assert(linTs <= zTs,
      s"a ts-sorted layout cannot be worse than z-order on ts: $linTs vs $zTs")
    assert(zTs < nFiles,
      s"z-order must still prune some files on ts, got $zTs/$nFiles")
  }

  test("z-order lifecycle: appends visible, re-cluster restores tight " +
      "pruning and file count, interrupted swap heals, rot policy gates") {
    val dir = java.nio.file.Files.createTempDirectory("zlife").toString
    val path = s"$dir/events_z"
    val nFiles = 8
    val ev = Tables.events(spark, "/root/testdata/sf0.01")
      .select(col("event_id"), col("user_id"), col("ts"), col("value"))
    val half = ev.filter(col("event_id") % 2 === 0)
    val rest = ev.filter(col("event_id") % 2 =!= 0)
    Store.saveZOrdered(half, path, Seq("user_id", "ts"), nFiles = nFiles)
    // three appends: rows visible immediately, file rot accumulates
    (0 until 3).foreach { i =>
      Store.appendZOrdered(rest.filter(col("event_id") % 3 === i), path,
        Seq("user_id", "ts"))
    }
    val back = spark.read.parquet(path)
    assert(back.count() == ev.count() &&
      back.except(ev).isEmpty && ev.except(back).isEmpty,
      "appends must preserve the union exactly")
    assert(Store.dataFileCount(spark, path) == nFiles + 3)
    // under threshold → no-op; over → re-cluster back to nFiles
    assert(!Store.maybeCompactZOrdered(spark, path, Seq("user_id", "ts"),
      nFiles = nFiles, maxFiles = nFiles + 3))
    assert(Store.maybeCompactZOrdered(spark, path, Seq("user_id", "ts"),
      nFiles = nFiles, maxFiles = nFiles + 2))
    assert(Store.dataFileCount(spark, path) == nFiles)
    val after = spark.read.parquet(path)
    assert(after.count() == ev.count() &&
      after.except(ev).isEmpty && ev.except(after).isEmpty,
      "re-cluster must preserve rows exactly")
    // crash window: live renamed away, rewritten tree stranded at
    // __compacting — the shared heal must roll the swap forward
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(path), spark.sparkContext.hadoopConfiguration)
    def p(s: String) = new org.apache.hadoop.fs.Path(s)
    assert(fs.rename(p(path), p(path + "__compacting")))
    assert(Store.healInterruptedSwap(spark, path))
    spark.catalog.refreshByPath(path)
    assert(spark.read.parquet(path).count() == ev.count(),
      "healed z-dir must serve the full data")
  }

  test("rank-bucketed z-order: a heavy-tailed column keeps pruning where " +
      "min–max collapses; rows preserved; lifecycle takes the rank flag") {
    val dir = java.nio.file.Files.createTempDirectory("zrank").toString
    val nFiles = 16
    val n = 20000L
    // fixture: `a` uniform-ish 0..9999 plus ONE extreme outlier —
    // min–max scaling maps every normal value to cell 0 (the scaladoc'd
    // failure); `b` decorrelated uniform
    val df = spark.range(n).select(
      when(col("id") === 0, lit(1e15))
        .otherwise((col("id") * 7919 % 10000).cast("double")).as("a"),
      (col("id") * 104729 % 10000).as("b"))
    Store.saveZOrdered(df, s"$dir/mm", Seq("a", "b"), nFiles = nFiles)
    Store.saveZOrdered(df, s"$dir/rank", Seq("a", "b"), nFiles = nFiles,
      rank = true)
    val back = spark.read.parquet(s"$dir/rank")
    assert(back.count() == n &&
      back.except(df).isEmpty && df.except(back).isEmpty,
      "rank-bucketed rewrite must preserve rows exactly")

    // footer statistics, not a data scan — the metadata pruning reads
    def aStats(path: String): Seq[(Double, Double)] = {
      val fs = org.apache.hadoop.fs.FileSystem.get(
        new java.net.URI(path), spark.sparkContext.hadoopConfiguration)
      fs.listStatus(new org.apache.hadoop.fs.Path(path))
        .filter(_.getPath.getName.startsWith("part-")).toSeq
        .map(f => Store.footerMinMax(spark, f.getPath.toString, "a").get)
    }
    val (lo, hi) = (5000.0, 5100.0)
    def cand(stats: Seq[(Double, Double)]) =
      stats.count { case (mn, mx) => mn <= hi && lo <= mx }
    val (mmCand, rkCand) = (cand(aStats(s"$dir/mm")), cand(aStats(s"$dir/rank")))
    // min–max: every normal `a` shares cell 0, so the a-dimension stops
    // discriminating and every file spans the normal a-range
    assert(mmCand >= nFiles - 1,
      s"fixture sanity: min–max should have collapsed, got $mmCand/$nFiles")
    assert(rkCand < mmCand && rkCand <= nFiles / 2,
      s"rank-bucketed z must prune the heavy-tailed dimension: " +
        s"$rkCand vs min–max $mmCand of $nFiles")

    // lifecycle: append + rot-policy re-cluster under rank mode
    Store.appendZOrdered(df.limit(500), s"$dir/rank", Seq("a", "b"),
      rank = true)
    assert(Store.maybeCompactZOrdered(spark, s"$dir/rank", Seq("a", "b"),
      nFiles = nFiles, maxFiles = nFiles, rank = true))
    val after = spark.read.parquet(s"$dir/rank")
    assert(after.count() == n + 500,
      "rank-mode append + re-cluster must preserve rows")
    assert(cand(aStats(s"$dir/rank")) <= nFiles / 2,
      "re-clustered rank layout must restore tight pruning")
  }

  test("withZValue guards: < 2 columns and bit overflow refuse loudly; " +
      "constant column degrades to cell 0 (no division blowup)") {
    val df = spark.range(10).select(col("id").as("a"), lit(5L).as("b"),
      col("id").as("c"))
    intercept[IllegalArgumentException] {
      Store.withZValue(df, Seq("a"), bits = 16)
    }
    intercept[IllegalArgumentException] {
      Store.withZValue(df, Seq("a", "b", "c"), bits = 21)
    }
    // constant column: max == min → every cell 0, z degrades to the
    // remaining dimension's interleave — defined, null-free
    val zRows = Store.withZValue(df, Seq("a", "b"), bits = 4)
      .select("_z").collect()
    assert(zRows.forall(!_.isNullAt(0)))
    assert(zRows.map(_.getLong(0)).distinct.length == 10)
  }

  test("zOrderDescribe + zOrderClusterDepth: footer-only health report; " +
      "depth rises with appends, compaction restores it; READ-ONLY") {
    val dir = java.nio.file.Files.createTempDirectory("zdesc").toString
    val path = s"$dir/events_z"
    val nFiles = 8
    val ev = Tables.events(spark, "/root/testdata/sf0.01")
      .select(col("event_id"), col("user_id"), col("ts"), col("value"))
    val half = ev.filter(col("event_id") % 2 === 0)
    val rest = ev.filter(col("event_id") % 2 =!= 0)
    Store.saveZOrdered(half, path, Seq("user_id", "ts"), nFiles = nFiles)

    val d0 = Store.zOrderDescribe(spark, path).collect()(0)
    assert(d0.getAs[Int]("data_files") == nFiles)
    assert(d0.getAs[Long]("rows") == half.count())
    assert(!d0.getAs[Boolean]("stream_journal")
      && !d0.getAs[Boolean]("stream_manifest"))
    val depth0 = Store.zOrderClusterDepth(spark, path, Seq("user_id"))
      .collect()(0).getAs[Double]("avg_candidate_files")
    // a 2-dim interleave at 8 files gives each file ~3 z-bits of
    // extent; projected onto ONE dimension that is 1–2 bits, so the
    // expected per-file range fraction sits near 0.5–0.6 (measured
    // ~0.59 on this fixture) — well under full overlap (1.0/file),
    // far above a 1-dim sort's ~1/nFiles
    assert(depth0 < nFiles * 0.75,
      s"a fresh two-dim z layout must beat full overlap: $depth0")

    // three appends, each clustered over its own full user range —
    // every appended file overlaps everything; expected depth grows by
    // ~1 per append while the FLOOR stays what the fresh layout had
    (0 until 3).foreach { i =>
      Store.appendZOrdered(rest.filter(col("event_id") % 3 === i), path,
        Seq("user_id", "ts"))
    }
    val depthRot = Store.zOrderClusterDepth(spark, path, Seq("user_id"))
      .collect()(0)
    assert(depthRot.getAs[Int]("n_files") == nFiles + 3)
    assert(depthRot.getAs[Double]("avg_candidate_files") >= depth0 + 2.5,
      "full-range appended files must each add ~1 expected candidate")

    // re-cluster: depth returns to the fresh floor (global re-sort)
    Store.compactZOrdered(spark, path, Seq("user_id", "ts"),
      nFiles = nFiles)
    val depthAfter = Store.zOrderClusterDepth(spark, path, Seq("user_id"))
      .collect()(0).getAs[Double]("avg_candidate_files")
    assert(depthAfter < depth0 + 1.0,
      s"compaction must restore clustering depth: $depthAfter vs $depth0")

    // stats-free column (INT96 ts) reports null metrics, not a failure
    val tsRow = Store.zOrderClusterDepth(spark, path, Seq("ts")).collect()(0)
    assert(tsRow.getAs[Int]("n_files") == 0 && tsRow.isNullAt(1))

    // journals are REPORTED, never consumed
    val meta = new java.io.File(path + "__stream")
    assert(meta.mkdirs())
    java.nio.file.Files.writeString(
      new java.io.File(meta, "stream.journal").toPath, "3")
    java.nio.file.Files.writeString(
      new java.io.File(meta, "stream.manifest").toPath, "3\n")
    val d1 = Store.zOrderDescribe(spark, path).collect()(0)
    assert(d1.getAs[Boolean]("stream_journal")
      && d1.getAs[Boolean]("stream_manifest"))
    assert(new java.io.File(meta, "stream.journal").exists
      && new java.io.File(meta, "stream.manifest").exists,
      "describe must not heal or clear stream state")
  }
}
