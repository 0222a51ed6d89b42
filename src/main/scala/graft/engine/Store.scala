package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Storage semantics of the reference's SQLite layer (S4/S7/S8/S9/S10/S11,
  * SURVEY §2.1) on partitioned parquet.
  *
  * Layout: `partitionBy(symbol, timeframe)` + `sortWithinPartitions(ts)` —
  * this single choice subsumes all three of the reference's secondary
  * indexes (database_handler.py:123-125): symbol/timeframe filters become
  * partition pruning, timestamp ranges become parquet row-group min/max
  * skipping. At 100 TB, add a coarse time bucket (e.g. `month(ts)`) as a
  * third partition column so a partition never exceeds executor-memory
  * scale; the API below is layout-agnostic.
  */
object Store {

  /** PK of the OHLCV fact table (database_handler.py:110-122). */
  val pk: Seq[String] = Seq("ts", "symbol", "timeframe")

  /** Filename of the streaming sinks' per-batch journal
    * ([[graft.streaming.IndexIngest]]) — referenced by every compaction
    * guard (band index, IVF, z-order) so none can drift from the sinks'
    * literal. */
  private[graft] val StreamJournal = "stream.journal"

  /** Sibling meta dir holding a z-ordered data dir's streaming protocol
    * files (`IndexIngest.zOrderSink`): markers cannot live INSIDE the
    * dir — a bare parquet read would choke on them as data files. */
  private[graft] def zStreamMeta(path: String): String = path + "__stream"

  /** S7 keyed upsert: `INSERT OR REPLACE` ≡ union + last-writer-wins dedup
    * on the PK (database_handler.py:215-218). `incoming` beats `existing`;
    * within `incoming`, the row with the highest `seqCol` wins when one is
    * provided (the reference's executemany is last-wins by batch row order,
    * which is not a reproducible order — an explicit sequence column is the
    * deterministic equivalent). Without `seqCol`, `incoming` must be
    * PK-unique or the surviving duplicate is engine-chosen. Single shuffle
    * on the PK; at scale combine with partition-overwrite so only touched
    * (symbol, timeframe) partitions rewrite. */
  def upsert(existing: DataFrame, incoming: DataFrame,
      keys: Seq[String] = pk, seqCol: Option[String] = None): DataFrame = {
    // stored data typically lacks the batch's ingest-sequence column;
    // `_src desc` already outranks it for existing rows, so null it in
    val exAligned = seqCol.filterNot(existing.columns.contains) match {
      case Some(c) =>
        existing.withColumn(c, lit(null).cast(incoming.schema(c).dataType))
      case None => existing
    }
    val tagged = exAligned.withColumn("_src", lit(0))
      .unionByName(incoming.withColumn("_src", lit(1)))
    val order = col("_src").desc +: seqCol.map(c => col(c).desc).toSeq
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    tagged.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .drop("_src", "_rn")
  }

  /** Write the fact table in the canonical layout. */
  def save(df: DataFrame, path: String): Unit =
    df.repartition(col("symbol"), col("timeframe"))
      .sortWithinPartitions("ts")
      .write.mode("overwrite")
      .partitionBy("symbol", "timeframe")
      .parquet(path)

  /** Partition-scoped upsert — the 100 TB form of S7: merge `incoming`
    * only with the (symbol, timeframe) partitions it touches, then swap
    * JUST those partitions in. Untouched partitions are never read or
    * written, so cost scales with the batch, not the table.
    *
    * Crash consistency (compact's two-rename discipline, per partition):
    * the merged data lands in a sibling `__upserting` directory first —
    * the live table is not touched until every byte is written — then
    * each touched partition directory swaps in via two renames
    * (live → `__old` backup tree, tmp → live). Dynamic partition
    * overwrite, used before round 5, deletes the matched partition at
    * job-commit time before the staged files move in — a crash in that
    * window loses the partition. Here every individual partition is
    * atomically old or new at all times, a mid-sequence crash leaves
    * already-swapped partitions new and the rest old (each internally
    * consistent, old bytes recoverable from the backup tree), and a
    * rename failure rolls the already-swapped partitions back before
    * surfacing. The touched-partition list is driver-collected — bounded
    * by the batch's distinct series, the same cardinality the broadcast
    * semi-join already assumes small.
    *
    * The two-rename discipline ASSUMES atomic directory rename
    * (HDFS/posix/abfs). On stores whose rename is an emulated copy+delete
    * (S3A and friends) it would reintroduce the very crash window it
    * closes, so [[atomicRename]] gates it and the fallback is Spark's
    * dynamic partition overwrite from the staged tmp — same touched-only
    * cost, consistency owned by the committer. */
  def upsertSave(spark: SparkSession, path: String, incoming: DataFrame,
      keys: Seq[String] = pk): Unit = {
    // a previously interrupted swap must be repaired BEFORE `existing`
    // is read — a partition stranded in the backup tree would otherwise
    // be invisible to the merge and the replayed batch would overwrite
    // it with only its own rows
    healInterruptedPartitionSwap(spark, path)
    // the touched-key set is collected ONCE and reused for the broadcast
    // frame AND the swap list: deriving them independently evaluated the
    // incoming lineage twice (for a REST-backed fetch, a second network
    // pull), and any nondeterminism between the evaluations would
    // desynchronize the tmp directories from the parts handed to the
    // swap (a part with no tmp dir fails the rename, rolling the whole
    // upsert back)
    val partsSeq = incoming.select("symbol", "timeframe").distinct()
      .collect()
      .map(r => (r.getAs[String]("symbol"), r.getAs[String]("timeframe")))
    // NULL keys refused loudly: Spark writes them to
    // __HIVE_DEFAULT_PARTITION__ directories, which the swap's
    // escapePathName paths can never match (and null strings NPE the
    // sort) — the failure would otherwise surface after all the merge
    // work, and only on the atomic-rename branch
    require(partsSeq.forall { case (s, t) => s != null && t != null },
      "upsertSave: incoming rows with NULL symbol/timeframe partition " +
        "keys are not storable — filter or repair them first")
    val sortedParts = partsSeq.sortBy(identity).toSeq
    import spark.implicits._
    val touched = sortedParts.toDF("symbol", "timeframe")
    // explicit schema — a bare read would partition-TYPE-infer the
    // directory keys, so a numeric-looking symbol ("007") comes back as
    // IntegerType 7: the semi-join would then coerce string-vs-int and
    // pull the WRONG live partitions into `existing`, and the union
    // inside `upsert` would widen the key back to the string "7",
    // silently dropping the live "007" rows from the merge. Pinning to
    // `incoming`'s schema also projects to exactly its columns.
    val existing = spark.read.schema(incoming.schema).parquet(path)
      .join(broadcast(touched), Seq("symbol", "timeframe"), "left_semi")
    val merged = upsert(existing, incoming, keys)
    val tmp = path + "__upserting"
    // materializes `merged` (which READS the live table) before any
    // mutation of the live table — the read/overwrite hazard compact
    // also avoids
    merged.repartition(col("symbol"), col("timeframe"))
      .sortWithinPartitions("ts")
      .write.mode("overwrite")
      .partitionBy("symbol", "timeframe")
      .parquet(tmp)
    import org.apache.hadoop.fs.Path
    val live = new Path(path)
    val fs = live.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (atomicRename(spark, fs)) {
      swapPartitions(spark, path, tmp, sortedParts)
    } else {
      // Store without atomic directory rename (S3A and friends): the
      // two-rename swap's crash guarantee does not hold there — a "rename"
      // is a non-atomic copy+delete, so a mid-swap crash can leave a
      // partition half-copied. Fall back to Spark's dynamic partition
      // overwrite FROM THE STAGED TMP (already fully written, so the
      // read/overwrite hazard is gone): only touched partitions rewrite,
      // and the commit protocol — not our renames — owns consistency.
      // Explicit schema for the same inference reason as the live read
      // above: symbol "007" read back as IntegerType 7 would overwrite
      // the WRONG live partition while the real one goes stale. The
      // staged tmp has exactly `merged`'s schema (= incoming's).
      spark.read.schema(incoming.schema).parquet(tmp)
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("symbol", "timeframe")
        .parquet(path)
      fs.delete(new Path(tmp), true)
      spark.catalog.refreshByPath(path)
    }
  }

  /** Read the canonical store with the `symbol`/`timeframe` layout keys
    * pinned to STRING. A bare `spark.read.parquet` partition-type-infers
    * the directory keys, so a numeric-looking symbol ("007") comes back
    * as IntegerType 7 — colliding with a real symbol "7" (both
    * directories parse to the same value), matching the wrong rows in
    * key filters, and — through [[compact]]'s rewrite — permanently
    * merging the two partitions on disk. Data columns keep the schema
    * read from the parquet footers; only the two layout keys are pinned. */
  private[graft] def readCanonical(spark: SparkSession, path: String): DataFrame = {
    import org.apache.spark.sql.types.{StringType, StructType}
    // a [[compact]] killed between its two renames leaves no live dir —
    // roll the completed rewrite forward before reading (three FS
    // existence probes when healthy; same discipline as the index loads)
    healInterruptedSwap(spark, path)
    val inferred =
      try spark.read.parquet(path).schema
      catch {
        // a valid-but-EMPTY store (first save fetched zero rows; last
        // series deleted) has no footers to infer from — an empty frame
        // in the canonical layout is the correct read, not a crash
        // (MarketData.facts() makes the same call for the same reason)
        case e: org.apache.spark.sql.AnalysisException
            if e.getCondition == "UNABLE_TO_INFER_SCHEMA" =>
          return spark.createDataFrame(
            spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
            graft.sources.KlineSource.schema)
      }
    val pinned = StructType(inferred.map(f =>
      if (f.name == "symbol" || f.name == "timeframe")
        f.copy(dataType = StringType)
      else f))
    spark.read.schema(pinned).parquet(path)
  }

  /** Does this FileSystem give the ATOMIC directory rename the two-rename
    * swap discipline assumes? HDFS/posix/abfs do; object-store connectors
    * that emulate rename as copy+delete (s3a, gs, oss, …) do not — there a
    * crash mid-"rename" leaves a partition half-copied, which is exactly
    * the window the swap exists to close. Scheme allowlist (Hadoop's
    * `PathCapabilities` has no atomic-rename probe), overridable for
    * unusual stores via hadoop conf `graft.store.rename.atomic`. */
  private[graft] def atomicRename(spark: SparkSession,
      fs: org.apache.hadoop.fs.FileSystem): Boolean =
    Option(spark.sparkContext.hadoopConfiguration
        .get("graft.store.rename.atomic")) match {
      case Some(v) => v.toBoolean
      case None =>
        Set("file", "hdfs", "viewfs", "abfs", "abfss", "local")
          .contains(fs.getUri.getScheme)
    }

  /** Swap `parts` partition directories from `tmp` into the live table at
    * `path`, backing up each displaced live directory under
    * `path + "__old"`; rolls back completed swaps and throws on any
    * failed rename. `failAfter` injects a rename failure after N
    * successful swaps — test-only, exercised by StoreSpec's
    * crash-consistency case. */
  private[graft] def swapPartitions(spark: SparkSession, path: String,
      tmp: String, parts: Seq[(String, String)],
      failAfter: Int = Int.MaxValue): Unit = {
    import org.apache.hadoop.fs.Path
    val conf = spark.sparkContext.hadoopConfiguration
    val live = new Path(path)
    val fs = live.getFileSystem(conf)
    val bakRoot = new Path(path + "__old")
    if (fs.exists(bakRoot) && !fs.delete(bakRoot, true))
      throw new java.io.IOException(
        s"upsertSave: cannot clear stale backup $bakRoot")
    // partition VALUES are escaped exactly the way Spark's write path
    // escapes them (escapePathName percent-encodes ':', '%', control and
    // path chars) — a raw s"symbol=$sym" for a symbol with any of those
    // builds a source path the written tmp dir never matches
    import org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils.escapePathName
    def rel(sym: String, tf: String) =
      s"symbol=${escapePathName(sym)}/timeframe=${escapePathName(tf)}"
    // (partition, hadBackup) completed swaps, for rollback
    val done = scala.collection.mutable.ArrayBuffer.empty[((String, String), Boolean)]
    def rollback(): Unit = {
      // every rename result CHECKED: a failed restore must not be
      // followed by deleting the backup tree — those are the only
      // remaining pre-crash bytes, and healInterruptedPartitionSwap
      // restores from them on the next read
      var restoredAll = true
      done.reverseIterator.foreach { case ((s, t), hadBak) =>
        val dst = new Path(s"$path/${rel(s, t)}")
        // return the merged bytes to tmp (NOT delete — tmp stays a
        // complete retry artifact), then restore the displaced live data
        if (!fs.rename(dst, new Path(s"$tmp/${rel(s, t)}"))) restoredAll = false
        if (hadBak &&
            !fs.rename(new Path(s"${bakRoot.toString}/${rel(s, t)}"), dst))
          restoredAll = false
      }
      if (restoredAll) fs.delete(bakRoot, true) // emptied skeleton only
      else System.err.println(s"upsertSave: rollback under $path could " +
        "not restore every partition — backup tree KEPT; the next read " +
        "heals from it (healInterruptedPartitionSwap)")
      // tmp is deliberately KEPT on failure — the merged bytes are intact
      // there, so a retry (or manual recovery) needs no recompute
    }
    try {
      parts.zipWithIndex.foreach { case ((sym, tf), i) =>
        val src = new Path(s"$tmp/${rel(sym, tf)}")
        val dst = new Path(s"$path/${rel(sym, tf)}")
        val bak = new Path(s"${bakRoot.toString}/${rel(sym, tf)}")
        val hadBak = fs.exists(dst)
        if (hadBak) {
          if (!fs.mkdirs(bak.getParent))
            throw new java.io.IOException(s"upsertSave: mkdirs ${bak.getParent} failed")
          if (!fs.rename(dst, bak))
            throw new java.io.IOException(s"upsertSave: rename $dst -> $bak failed")
        }
        if (!fs.mkdirs(dst.getParent))
          throw new java.io.IOException(s"upsertSave: mkdirs ${dst.getParent} failed")
        if (i >= failAfter || !fs.rename(src, dst)) {
          // un-displace this partition's live data before rolling back
          if (hadBak) fs.rename(bak, dst)
          throw new java.io.IOException(s"upsertSave: rename $src -> $dst failed")
        }
        done += (((sym, tf), hadBak))
      }
    } catch {
      case e: Throwable =>
        // a rollback failure must not REPLACE the original swap failure —
        // attach it as suppressed so both surface, with the table's
        // partially-rolled-back state attributable to the right cause
        try rollback()
        catch { case rb: Throwable if rb ne e => e.addSuppressed(rb) }
        throw e
    }
    // success: drop the backup tree and the tmp remainder (_SUCCESS etc.)
    if (fs.exists(bakRoot) && !fs.delete(bakRoot, true))
      throw new java.io.IOException(s"upsertSave: cannot delete backup $bakRoot")
    fs.delete(new Path(tmp), true)
    // the renames happened OUTSIDE Spark's write path, so the session's
    // FileStatusCache still lists the displaced files — Spark's own
    // overwrite commands invalidate it internally; a manual swap must too,
    // or the next read of `path` fails with FAILED_READ_FILE
    spark.catalog.refreshByPath(path)
  }

  /** Repair a [[swapPartitions]] interrupted INSIDE a partition's
    * two-rename window (or whose rollback could not restore every
    * partition): between rename(live → backup) and rename(tmp → live)
    * the partition exists in NEITHER place — the scaladoc's
    * "atomically old or new" holds for the bytes (both copies are
    * intact) but not for the live VIEW, and nothing else detects it
    * (healInterruptedSwap repairs only a missing table ROOT). The
    * backup tree is the signal: it exists only during a swap or after a
    * crash, so at read/upsert time restore every backed-up partition
    * the live table is missing, then drop the tree. Restoring OLD bytes
    * is correct — the interrupted batch replays (streaming) or retries
    * (batch) and the idempotent PK merge converges; the stranded
    * `__upserting` tmp is left as a retry artifact (the next upsert
    * overwrites it). One existence probe when healthy.
    *
    * Called ONLY from the single-writer entry ([[upsertSave]]), never
    * from reader paths: the backup tree legitimately exists for the
    * whole duration of a HEALTHY swap, and a reader healing then would
    * fight the live writer. A reader in the crash window merely sees
    * the partition missing until the next upsert heals it. */
  private[graft] def healInterruptedPartitionSwap(spark: SparkSession,
      path: String): Boolean = {
    import org.apache.hadoop.fs.Path
    val bakRoot = new Path(path + "__old")
    val fs = bakRoot.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(bakRoot)) return false
    var healed = false
    // backup layout mirrors the live layout: symbol=…/timeframe=…
    fs.listStatus(bakRoot).filter(_.isDirectory).foreach { symDir =>
      fs.listStatus(symDir.getPath).filter(_.isDirectory).foreach { tfDir =>
        val rel = s"${symDir.getPath.getName}/${tfDir.getPath.getName}"
        val live = new Path(s"$path/$rel")
        if (!fs.exists(live)) {
          if (!fs.mkdirs(live.getParent))
            throw new java.io.IOException(
              s"partition-swap heal: mkdirs ${live.getParent} failed")
          if (!fs.rename(tfDir.getPath, live))
            throw new java.io.IOException(
              s"partition-swap heal: rename ${tfDir.getPath} -> $live failed")
          healed = true
        }
      }
    }
    if (!fs.delete(bakRoot, true))
      throw new java.io.IOException(
        s"partition-swap heal: cannot drop backup tree $bakRoot")
    if (healed) spark.catalog.refreshByPath(path)
    healed
  }

  /** Small-files compaction — the storage-maintenance op incremental
    * upsert ingest (S7) eventually needs at scale: every micro-batch
    * appends small files, and a 100 TB table degrades into millions of
    * them (slow listings, tiny row groups, no skipping). Rewrites the
    * table at `targetFileBytes` granularity using a RANGE repartition on
    * (symbol, timeframe, ts), which both merges small files and splits
    * oversized series into ts-contiguous files — so parquet min/max
    * row-group skipping stays sharp after the rewrite. The rewrite lands
    * in a sibling directory and swaps in via two renames — live → backup,
    * tmp → live — so there is NO window in which nothing exists at `path`
    * (a reader mid-swap sees either the old or the new table), and a crash
    * leaves either the live table or the `__old` backup recoverable. Every
    * FileSystem call's boolean result is checked: a false return (common
    * on object stores) aborts loudly instead of silently losing the table. */
  def compact(spark: SparkSession, path: String,
      targetFileBytes: Long = 128L << 20): Int = {
    val conf = spark.sparkContext.hadoopConfiguration
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(conf)
    val it = fs.listFiles(p, true)
    var bytes = 0L
    while (it.hasNext) {
      val f = it.next()
      if (f.getPath.getName.endsWith(".parquet")) bytes += f.getLen
    }
    val nOut = math.max(1, math.ceil(bytes.toDouble / targetFileBytes).toInt)
    val df = readCanonical(spark, path)
    val tmp = new org.apache.hadoop.fs.Path(path + "__compacting")
    df.repartitionByRange(nOut, col("symbol"), col("timeframe"), col("ts"))
      .sortWithinPartitions("ts")
      .write.mode("overwrite")
      .partitionBy("symbol", "timeframe")
      .parquet(tmp.toString)
    val old = new org.apache.hadoop.fs.Path(path + "__old")
    if (fs.exists(old) && !fs.delete(old, true))
      throw new java.io.IOException(s"compact: cannot clear stale backup $old")
    if (!fs.rename(p, old))
      throw new java.io.IOException(s"compact: rename $p -> $old failed")
    if (!fs.rename(tmp, p)) {
      // restore the live table before surfacing the failure
      fs.rename(old, p)
      throw new java.io.IOException(s"compact: rename $tmp -> $p failed")
    }
    if (!fs.delete(old, true))
      throw new java.io.IOException(s"compact: cannot delete backup $old")
    // the swap bypassed Spark's write path — invalidate the session's
    // file listing + cache state, or a cached frame over `path` reads
    // the deleted pre-compact files (the same rule swapPartitions and
    // compactBucketed already follow)
    spark.catalog.refreshByPath(path)
    nOut
  }

  /** S4 range scan: key predicates prune partitions, the ts range is
    * pushed to parquet row groups (database_handler.py:329-332). */
  def scan(spark: SparkSession, path: String, symbol: String,
      timeframe: String, startTs: java.sql.Timestamp,
      endTs: java.sql.Timestamp): DataFrame =
    readCanonical(spark, path)
      .filter(col("symbol") === symbol && col("timeframe") === timeframe &&
        col("ts").between(startTs, endTs))
      .orderBy("ts")

  /** Bucketed co-located layout — the shuffle-free-join story at 100 TB.
    * Two tables written with the SAME bucket count and key join (and
    * aggregate on that key) with NO exchange on either side: each task
    * reads matching bucket files directly, so the cluster's largest
    * recurring shuffle (fact⋈fact on the join key) disappears from every
    * downstream query, paid once at write time. `sortBy` keeps buckets
    * ts-ordered so sort-merge reads skip the per-task sort too.
    * Registered as an external table at `path` (bucket metadata lives in
    * the session catalog — Spark's bucketing contract); pair with
    * `spark.sql.sources.bucketing.enabled` (default on).
    * BucketingSpec asserts the no-exchange plans. */
  def saveBucketed(df: DataFrame, table: String, path: String,
      numBuckets: Int, bucketCols: Seq[String],
      sortCols: Seq[String] = Nil): Unit = {
    // co-locate each bucket into one task first: repartition's
    // HashPartitioning uses the same murmur3 hash as the bucket-id
    // assignment, so with numPartitions == numBuckets every task holds
    // exactly one bucket ⇒ exactly one file per bucket. Without this,
    // every input partition writes its own file into every bucket —
    // P×buckets small files, and Spark only reports the bucket SORT
    // order (what makes sortBy useful) for single-file buckets.
    val prepared = df.repartition(numBuckets, bucketCols.map(col): _*)
    val w = prepared.write.mode("overwrite").option("path", path)
      .bucketBy(numBuckets, bucketCols.head, bucketCols.tail: _*)
    (if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w)
      .format("parquet").saveAsTable(table)
  }

  /** (Re-)register an external bucketed parquet table over files that
    * ALREADY carry the bucket-id file naming (written by
    * [[saveBucketed]] and possibly directory-renamed since) — no data
    * movement, schema inferred from the footers. This is how a layout
    * change commits to the catalog: `Similarity.ivfRetrain` swaps in an
    * assigned tree bucketed under a NEW modulus, and the catalog's
    * bucket spec must follow atomically-enough that a crash between
    * drop and create is repairable (the caller re-runs; `ivfLoad`
    * re-registers from the published centroid count). The spec MUST
    * match how the files were physically written: a wrong `numBuckets`
    * here makes bucket pruning silently select the wrong file groups —
    * same failure [[compactBucketed]]'s guard exists for. */
  private[graft] def registerBucketedExternal(spark: SparkSession,
      table: String, path: String, numBuckets: Int,
      bucketCols: Seq[String]): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    // bucketing DDL requires an explicit column list
    // (SPECIFY_BUCKETING_IS_NOT_ALLOWED otherwise) — infer it from the
    // footers of the files being registered
    val schema = spark.read.parquet(path).schema
    val cols = bucketCols.map(c => s"`$c`").mkString(", ")
    spark.sql(s"CREATE TABLE `$table` (${schema.toDDL}) USING parquet " +
      s"CLUSTERED BY ($cols) INTO $numBuckets BUCKETS " +
      s"LOCATION '$path'")
  }

  /** Append a Z-order (Morton) value column `_z` interleaving the bits
    * of two-or-more numeric/timestamp columns, each min–max scaled to
    * `bits` bits. Built entirely from codegen'd Column arithmetic (the
    * "compose existing ops" rung — no UDF, no custom expression): cell
    * extraction is a shift/mask per bit and the interleave is a sum of
    * disjoint bit positions. The min/max scalars ride as a lazy 1-row
    * broadcast crossJoin (the x56/x68 device — no job fires until the
    * caller acts). NULL in any z-column ⇒ NULL `_z` (range-partitions
    * first, harmless for clustering).
    *
    * Min–max scaling is OUTLIER-SENSITIVE: one extreme value compresses
    * every other row into a few cells and the dimension stops
    * discriminating. `rank = true` switches the cell function to
    * QUANTILE buckets (the range-partition-id form): per column, an
    * approximate-quantile sketch (`approxQuantile`, one pass over all
    * z-columns together — the same sampling machinery
    * repartitionByRange uses) yields 2^bits−1 boundaries, and the cell
    * is a codegen'd upper-bound binary search
    * ([[graft.functions.BucketIdF]]). Equal-population cells on ANY
    * distribution — a heavy tail costs nothing (ZOrderSpec carries the
    * fixture where min–max stops pruning and rank keeps it). The trade:
    * the sketch pass is an EAGER job at call time (min–max stays a lazy
    * 1-row crossJoin), and boundaries are approximate — which only
    * shifts cell edges, never correctness (files carry raw columns). */
  private[graft] def withZValue(df: DataFrame, cols: Seq[String],
      bits: Int = 16, rank: Boolean = false): DataFrame = {
    require(cols.size >= 2, "z-order interleaving needs >= 2 columns")
    require(cols.size * bits <= 62,
      s"z-value would overflow a long: ${cols.size} cols x $bits bits")
    val numeric = cols.map { c =>
      val base = df.schema(c).dataType match {
        case _: org.apache.spark.sql.types.TimestampType => unix_millis(col(c))
        case _: org.apache.spark.sql.types.TimestampNTZType =>
          // NTZ has no epoch conversion without a zone; bit-scaling only
          // needs ORDER, so the naive UTC reinterpretation is correct
          unix_millis(col(c).cast("timestamp"))
        case _ => col(c)
      }
      base.cast("double")
    }
    val nCols = cols.size
    def interleave(cells: Seq[org.apache.spark.sql.Column])
        : org.apache.spark.sql.Column =
      (0 until bits).flatMap { b =>
        cells.zipWithIndex.map { case (cell, j) =>
          shiftleft(shiftright(cell, b).bitwiseAND(lit(1L)), b * nCols + j)
        }
      }.reduce(_ + _) // disjoint bit positions: + ≡ bitwise OR
    if (rank) {
      val nBuckets = 1 << bits
      val probs = (1 until nBuckets).map(_.toDouble / nBuckets).toArray
      // one sketch pass for ALL z-columns; relative error only blurs
      // cell EDGES (clustering locality), never row contents
      val relErr = math.max(1e-4, 0.25 / nBuckets)
      val bnds = df
        .select(numeric.zipWithIndex.map { case (n, i) => n.as(s"_zq$i") }: _*)
        .stat.approxQuantile(
          (0 until nCols).map(i => s"_zq$i").toArray, probs, relErr)
      val cells = numeric.zipWithIndex.map { case (n, i) =>
        if (bnds(i).isEmpty) lit(0L) // empty input: no boundaries, one cell
        else org.apache.spark.sql.GraftBridge.column(
          graft.functions.BucketIdF(
            org.apache.spark.sql.GraftBridge.expression(n),
            bnds(i).toIndexedSeq)).cast("long")
      }
      df.withColumn("_z", interleave(cells))
    } else {
      val aggs = numeric.zipWithIndex.flatMap { case (n, i) =>
        Seq(min(n).as(s"_zmn$i"), max(n).as(s"_zmx$i")) }
      val stats = df.agg(aggs.head, aggs.tail: _*)
      val maxCell = (1L << bits) - 1
      val cells = numeric.zipWithIndex.map { case (n, i) =>
        val (mn, mx) = (col(s"_zmn$i"), col(s"_zmx$i"))
        when(mx > mn,
          floor((n - mn) / (mx - mn) * lit(maxCell.toDouble)).cast("long"))
          .otherwise(lit(0L))
      }
      df.crossJoin(broadcast(stats))
        .withColumn("_z", interleave(cells))
        .drop((0 until nCols).flatMap(i => Seq(s"_zmn$i", s"_zmx$i")): _*)
    }
  }

  /** Write `df` Z-order-clustered on `cols` — the multi-dimensional
    * file-skipping layout (the Delta/Iceberg `OPTIMIZE ZORDER BY`
    * capability, Spark-first). A linear `sortWithinPartitions(ts)`
    * layout prunes ts predicates perfectly and key predicates not at
    * all (every file spans every key); range-partitioning + sorting on
    * the interleaved Morton value clusters BOTH dimensions, so
    * per-file/row-group min–max stats are tight on every z-column at
    * once and parquet's pushed-filter row-group skipping (plus any
    * file-stats index at 100 TB) prunes point predicates on EITHER
    * dimension to ~sqrt-ish of the data — the standard trade: each
    * single dimension prunes somewhat worse than a layout sorted on it
    * alone, every other dimension prunes enormously better.
    * ZOrderSpec measures candidate-file counts from the written footer
    * stats; `tools/ZOrderBench` carries the wall-clock/bytes evidence.
    *
    * One shuffle (the range partition on `_z`) at write time — layout
    * cost identical in shape to [[save]]'s repartition. `nFiles` sizes
    * the output; at 100 TB pick it from target file size (~1 GB), and
    * combine with a coarse partition column exactly as [[save]]'s
    * scaladoc describes. */
  def saveZOrdered(df: DataFrame, path: String, cols: Seq[String],
      bits: Int = 16, nFiles: Int = 32, rank: Boolean = false): Unit =
    writeZ(df, path, cols, bits, nFiles, "overwrite", rank)

  private def writeZ(df: DataFrame, target: String, cols: Seq[String],
      bits: Int, nFiles: Int, mode: String, rank: Boolean = false): Unit = {
    val spark = df.sparkSession
    // RangePartitioner's default 100 samples/input-partition makes the
    // file boundaries — and with them every file's stat tightness —
    // wobble with the sampling seed (which derives from the RDD id,
    // i.e. session history). A clustering write exists FOR tight
    // per-file stats, so pin the boundaries: 10k samples/partition is
    // noise next to the shuffle itself and lands near-exact quantiles
    // of `_z` at any scale. Saved/restored around the one eager write
    // (sequential writers per session — the single-writer discipline
    // every sink here already assumes).
    val key = "spark.sql.execution.rangeExchange.sampleSizePerPartition"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      math.max(prev.map(_.toInt).getOrElse(100), 10000).toString)
    try {
      withZValue(df, cols, bits, rank)
        .repartitionByRange(nFiles, col("_z"))
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode(mode).parquet(target)
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  /** Append a batch to a [[saveZOrdered]] directory. The batch is
    * clustered over its OWN min–max — local scaling affects only
    * clustering locality, never correctness (files carry the raw
    * columns; the new files' stats bound exactly the batch) — and lands
    * as `nFiles` extra files (default 1: a daily batch rarely merits
    * more). Rot: appended files' stat ranges overlap the base layout's,
    * so candidate-file counts creep with every append — re-cluster with
    * [[compactZOrdered]] / [[maybeCompactZOrdered]], the same
    * append-then-compact contract as the maintained indexes. */
  def appendZOrdered(df: DataFrame, path: String, cols: Seq[String],
      bits: Int = 16, nFiles: Int = 1, rank: Boolean = false): Unit =
    writeZ(df, path, cols, bits, nFiles, "append", rank)

  /** Re-cluster a z-ordered directory in place: global min–max over the
    * whole accumulated data (base + appends), rewritten to `nFiles`
    * z-sorted files, swapped in with [[compact]]'s two-rename
    * discipline (`__compacting`/`__old` markers — an interrupted swap
    * heals through the SAME [[healInterruptedSwap]] every index load
    * path uses; this method heals any prior debris before starting). */
  def compactZOrdered(spark: SparkSession, path: String, cols: Seq[String],
      bits: Int = 16, nFiles: Int = 32, rank: Boolean = false): Unit = {
    import org.apache.hadoop.fs.Path
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    healInterruptedSwap(spark, path)
    // refuse over an unhealed streaming-ingest journal: folding a
    // crashed append's partial files into the re-clustered set would
    // destroy the "drop files newer than the journal" repair path
    // (z rows have no PK to dedup by)
    require(!fs.exists(new Path(s"${zStreamMeta(path)}/$StreamJournal")),
      s"unhealed interrupted stream ingest under $path: resume the " +
        "stream (or repair and clear the journal) before re-clustering")
    val tmp = new Path(path + "__compacting")
    writeZ(spark.read.parquet(path), tmp.toString, cols, bits, nFiles,
      "overwrite", rank)
    val old = new Path(path + "__old")
    if (fs.exists(old) && !fs.delete(old, true))
      throw new java.io.IOException(
        s"compactZOrdered: cannot clear stale backup $old")
    if (!fs.rename(p, old))
      throw new java.io.IOException(s"compactZOrdered: rename $p -> $old failed")
    if (!fs.rename(tmp, p)) {
      fs.rename(old, p) // restore the live dir before surfacing
      throw new java.io.IOException(s"compactZOrdered: rename $tmp -> $p failed")
    }
    if (!fs.delete(old, true))
      throw new java.io.IOException(s"compactZOrdered: cannot delete backup $old")
    spark.catalog.refreshByPath(path)
  }

  /** Re-cluster only once file rot exceeds `maxFiles` — the z-order
    * twin of the index compact-on-rot policies (one recursive listing,
    * no file reads). Returns true iff a re-cluster ran. */
  def maybeCompactZOrdered(spark: SparkSession, path: String,
      cols: Seq[String], bits: Int = 16, nFiles: Int = 32,
      maxFiles: Int = 64, rank: Boolean = false): Boolean = {
    require(maxFiles >= 1, "maxFiles must be >= 1")
    // heal BEFORE the rot count: during an interrupted swap no live dir
    // exists and dataFileCount would report 0 — silently skipping the
    // compaction that would have repaired the layout
    healInterruptedSwap(spark, path)
    if (dataFileCount(spark, path) <= maxFiles) false
    else { compactZOrdered(spark, path, cols, bits, nFiles, rank); true }
  }

  /** Read-only observability over a [[saveZOrdered]] layout — the
    * z-order member of the describe family
    * ([[graft.ext.Similarity.ivfDescribe]],
    * [[graft.ext.Dedup.bandIndexDescribe]]), same contract: never
    * heals, metadata only (footer row counts + namenode listings — the
    * data pages are untouched), safe from a monitoring job while a
    * stream appends. One row: `data_files` (the
    * [[maybeCompactZOrdered]] rot input), `rows` (footer metadata),
    * `stream_journal` (an unhealed streaming append — the sink's next
    * replay classifies and repairs it), `stream_manifest` (a pre-append
    * file manifest is staged: an append is in flight or died — with the
    * journal also present, replay repairs; alone it is stale debris the
    * next sink epoch clears). The z columns/bits are a WRITE-time
    * argument, not persisted state, so clustering quality is a separate
    * question answered by [[zOrderClusterDepth]] for the columns you
    * ask about. */
  def zOrderDescribe(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    import org.apache.hadoop.fs.Path
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(p),
      s"no z-ordered layout at $path (an interrupted re-cluster leaves " +
        "no live dir — any load/compact path heals it first)")
    val meta = zStreamMeta(path)
    Seq((dataFileCount(spark, path),
        spark.read.parquet(path).count(),
        fs.exists(new Path(s"$meta/$StreamJournal")),
        fs.exists(new Path(
          s"$meta/${graft.streaming.IndexIngest.StreamManifest}"))))
      .toDF("data_files", "rows", "stream_journal", "stream_manifest")
  }

  /** Clustering-quality ("depth") report for a z-ordered layout, from
    * parquet FOOTERS only: for each requested column, the expected
    * number of files a point query must read — a point drawn uniformly
    * from the column's global range hits file `f` with probability
    * `len_f / global_len`, so the expectation is the sum of per-file
    * range fractions. Freshly clustered single-column layouts sit near
    * 1.0; every [[appendZOrdered]] batch (clustered over its OWN
    * min–max) overlaps the base files and pushes the number toward
    * `data_files` — re-cluster when it drifts
    * ([[compactZOrdered]] restores the floor). This is the
    * measure-of-rot that FILE COUNT alone misses: 64 well-separated
    * files are healthy, 8 fully-overlapping ones are not.
    *
    * One row per column: `column`, `avg_candidate_files`, `n_files`
    * (files with usable stats for that column), `global_min`,
    * `global_max`. Columns whose footers carry no numeric stats
    * (INT96 timestamps, all-null) report null metrics rather than
    * failing the whole describe. A degenerate global range (all files
    * one value) reports `n_files` — every file is a candidate. Cost:
    * one footer seek per file per column, driver-side — bounded
    * wherever [[maybeCompactZOrdered]] keeps file counts bounded, the
    * same assumption every heal/manifest path here already makes. */
  def zOrderClusterDepth(spark: SparkSession, path: String,
      cols: Seq[String]): DataFrame = {
    import spark.implicits._
    require(cols.nonEmpty, "zOrderClusterDepth: pass the z columns")
    val files = dataFileList(spark, path).map(rel => s"$path/$rel")
    cols.map { c =>
      // Try: non-NUMERIC footer stats (a string column) surface as
      // sys.error in footerMinMax — downgrade to "no usable stats"
      // here, like stats-free INT96 columns
      val ranges = files.flatMap(f =>
        scala.util.Try(footerMinMax(spark, f, c)).toOption.flatten)
      if (ranges.isEmpty)
        (c, None: Option[Double], 0, None: Option[Double],
          None: Option[Double])
      else {
        val gMin = ranges.map(_._1).min
        val gMax = ranges.map(_._2).max
        val depth =
          if (gMax == gMin) ranges.size.toDouble
          else ranges.map { case (lo, hi) => (hi - lo) / (gMax - gMin) }.sum
        (c, Some(depth), ranges.size, Some(gMin), Some(gMax))
      }
    }.toDF("column", "avg_candidate_files", "n_files", "global_min",
      "global_max")
  }

  /** A numeric column's [min, max] from one parquet file's FOOTER
    * statistics — the metadata a file-stats index / row-group skipper
    * prunes with, read without touching a data page (one footer seek
    * per file, vs the full-file scan the evidence tooling previously
    * paid — ADVICE r12). Unions all row groups; None when the column
    * has no non-null stats. Long/int/double/float footer mins all
    * surface as `Comparable` boxed numbers, hence the Number fold. */
  private[graft] def footerMinMax(spark: SparkSession, file: String,
      column: String): Option[(Double, Double)] = {
    import scala.jdk.CollectionConverters._
    val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
      org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(file),
        spark.sparkContext.hadoopConfiguration))
    try {
      val stats = reader.getFooter.getBlocks.asScala.toSeq
        .flatMap(_.getColumns.asScala)
        .filter(_.getPath.toDotString == column)
        .map(_.getStatistics)
        .filter(s => s != null && s.hasNonNullValue)
      def d(v: Any): Double = v match {
        case n: java.lang.Number => n.doubleValue
        case other => sys.error(
          s"footerMinMax($column): non-numeric footer statistic $other")
      }
      if (stats.isEmpty) None
      else Some((stats.map(s => d(s.genericGetMin)).min,
        stats.map(s => d(s.genericGetMax)).max))
    } finally reader.close()
  }

  /** Compaction for a [[saveBucketed]]-style BUCKETED table — the
    * maintained-index hygiene step. Every index append
    * (`Dedup.bandIndexAppend`, `Similarity.ivfAppendSave`) adds one file
    * per touched bucket; after N ingests a probe reads N files per
    * probed bucket — the classic slow-rot failure of bucketed-append
    * designs. [[compact]] cannot be reused here: it rewrites through a
    * plain `.parquet` write, which would silently drop the bucket
    * metadata and file-level bucket-id assignment — probes would lose
    * `SelectedBucketsCount` pruning forever.
    *
    * This variant rewrites THROUGH the bucketing writer (same bucket
    * count, same murmur3 bucket function ⇒ identical bucket ids) into a
    * sibling directory, then swaps directories with [[compact]]'s
    * two-rename discipline — the catalog entry for `table` is untouched
    * (its bucket spec still matches the rewritten files), so pruning
    * survives; BucketingSpec asserts it end-to-end. One task per bucket
    * at write time ⇒ exactly one file per bucket afterwards.
    *
    * `transform` filters/reshapes the rows mid-rewrite (identity by
    * default) — the index-delete paths fold their tombstones here
    * (`Dedup.compactBandIndex`, `Similarity.ivfCompact`). It must not
    * change the bucket-column values (rows would land in a file whose
    * bucket id no longer matches their hash) and must not claim an
    * output partitioning that lets the optimizer elide the clustering
    * exchange (a broadcast anti-join claims none). */
  def compactBucketed(spark: SparkSession, table: String, path: String,
      numBuckets: Int, bucketCols: Seq[String],
      sortCols: Seq[String] = Nil,
      transform: DataFrame => DataFrame = identity): Unit = {
    // guard the caller-passed spec against the catalog's: a mismatched
    // count would rewrite files under hash%numBuckets while the catalog
    // keeps the old modulus — bucket pruning would then silently select
    // the WRONG file groups (incomplete probe results, no error)
    val desc = spark.sql(s"DESCRIBE FORMATTED `$table`")
      .select("col_name", "data_type").collect()
      .map(r => r.getString(0).trim -> r.getString(1).trim).toMap
    desc.get("Num Buckets").foreach { n =>
      require(n.trim.toInt == numBuckets,
        s"compactBucketed: table `$table` is bucketed into ${n.trim} " +
          s"buckets but the caller passed $numBuckets — a rewrite would " +
          "silently rebucket the files against the catalog spec")
    }
    desc.get("Bucket Columns").foreach { cols =>
      val catalogCols = cols.replaceAll("[\\[\\]`\\s]", "").split(",")
        .filter(_.nonEmpty).toSeq
      require(catalogCols == bucketCols,
        s"compactBucketed: table `$table` buckets by $catalogCols but " +
          s"the caller passed $bucketCols")
    }
    val tmpTable = table + "__compacting"
    // read the files PLAIN, not via spark.table: a bucketed-scan source
    // claims HashPartitioning(bucketCols) and the optimizer elides
    // saveBucketed's repartition as redundant — after which the
    // autoBucketedScan rule, seeing no operator that needs bucketing,
    // demotes the scan to packed file splits and each write task emits
    // files for every bucket in its split (measured: 13 files for 8
    // buckets). A plain parquet read claims nothing, so the clustering
    // exchange stands and each bucket lands in exactly one task/file.
    saveBucketed(transform(spark.read.parquet(path)), tmpTable,
      path + "__compacting", numBuckets, bucketCols, sortCols)
    // external table: dropping it keeps the rewritten files on disk
    spark.sql(s"DROP TABLE IF EXISTS `$tmpTable`")
    val conf = spark.sparkContext.hadoopConfiguration
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(conf)
    val tmp = new org.apache.hadoop.fs.Path(path + "__compacting")
    val old = new org.apache.hadoop.fs.Path(path + "__old")
    if (fs.exists(old) && !fs.delete(old, true))
      throw new java.io.IOException(s"compactBucketed: cannot clear stale backup $old")
    if (!fs.rename(p, old))
      throw new java.io.IOException(s"compactBucketed: rename $p -> $old failed")
    if (!fs.rename(tmp, p)) {
      // restore the live table before surfacing; if THIS rename also
      // fails the tree is still recoverable — healInterruptedSwap rolls
      // forward from the intact rewrite dir on the next load
      if (!fs.rename(old, p))
        System.err.println(s"compactBucketed: rollback $old -> $p also " +
          "failed; healInterruptedSwap repairs on next load")
      throw new java.io.IOException(s"compactBucketed: rename $tmp -> $p failed")
    }
    if (!fs.delete(old, true))
      throw new java.io.IOException(s"compactBucketed: cannot delete backup $old")
    spark.catalog.refreshTable(table)
  }

  /** Repair an interrupted [[compactBucketed]] directory swap at `path`.
    * The swap's two renames (live → backup, rewrite → live) are not
    * jointly atomic: a crash between them leaves NO live directory —
    * only `path__old` (the pre-compact tree) and `path__compacting`
    * (the rewrite, which was COMPLETELY written before any rename
    * started). Loaders of swap-managed tables call this before reading:
    * roll FORWARD to the rewrite when it exists (it is the newer,
    * complete tree; the logical contents are identical anyway —
    * compaction moves rows between files), else roll the backup back.
    * A live directory present means no crash window is open (stale
    * leftovers are cleared by the next compact). Returns true iff a
    * repair ran — callers should `refreshTable` then.
    *
    * Concurrency note: a reader that heals DURING a live swap (it
    * observed the instant between the compactor's two renames) rolls
    * the rewrite forward itself; the compactor's own second rename then
    * fails and it reports an IOException — but the live tree is already
    * the completed rewrite, and the stranded `__old` backup is cleared
    * by the next compact. Same single-writer expectation as the index
    * mutation paths; concurrent READERS are safe either way. */
  def healInterruptedSwap(spark: SparkSession, path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new org.apache.hadoop.fs.Path(path + "__compacting")
    val old = new org.apache.hadoop.fs.Path(path + "__old")
    if (fs.exists(p)) false
    else if (fs.exists(tmp)) {
      if (!fs.rename(tmp, p))
        throw new java.io.IOException(s"swap heal: rename $tmp -> $p failed")
      fs.delete(old, true) // byproduct of the crashed swap, now superseded
      true
    } else if (fs.exists(old)) {
      if (!fs.rename(old, p))
        throw new java.io.IOException(s"swap heal: rename $old -> $p failed")
      true
    } else false
  }

  /** Number of COMMITTED parquet data files under `path`, recursively —
    * the "rot" metric the maintained-index compaction policies threshold
    * on (`Dedup.maybeCompactBandIndex`, `Similarity.ivfMaybeCompact`)
    * and the history-exists probe of the streaming corpus ingest. Pure
    * namenode metadata (one recursive listing, no file reads); 0 for a
    * missing path. Files under hidden-prefixed components (`_temporary`
    * crash debris, `_manifest`, dot-dirs) are excluded — Spark's own
    * data-file convention — so an uncommitted write never counts as
    * data. */
  def dataFileCount(spark: SparkSession, path: String): Int =
    dataFileList(spark, path).size

  /** The committed parquet data files under `path` as RELATIVE paths
    * (same traversal and hidden-component rules as [[dataFileCount]]).
    * Namenode metadata only; the list is O(#files) — bounded wherever a
    * compact-on-rot policy runs. The streaming z-order sink stages this
    * as its pre-append manifest: a torn append's repair is then "delete
    * every data file NOT in the manifest", which restores exactly the
    * pre-append state. */
  private[graft] def dataFileList(spark: SparkSession,
      path: String): Seq[String] = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Nil
    else {
      val base = fs.makeQualified(p).toString.stripSuffix("/")
      val it = fs.listFiles(p, true)
      val out = Seq.newBuilder[String]
      while (it.hasNext) {
        val f = it.next().getPath
        // relative path below `path`: hidden components anywhere under
        // the base exclude the file; the base's own name may be hidden
        val rel = f.toString.stripPrefix(base).stripPrefix("/")
        val hidden = rel.split('/')
          .exists(s => s.startsWith("_") || s.startsWith("."))
        if (f.getName.endsWith(".parquet") && !hidden) out += rel
      }
      out.result()
    }
  }

  /** Delete every committed data file under `path` that is NOT in
    * `keep` (relative paths from [[dataFileList]]) — the torn-append
    * repair: files written by a crashed append are exactly the files
    * absent from the pre-append manifest. Returns the number deleted. */
  private[graft] def deleteFilesNotIn(spark: SparkSession, path: String,
      keep: Set[String]): Int = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    var n = 0
    dataFileList(spark, path).foreach { rel =>
      if (!keep.contains(rel)) {
        if (!fs.delete(new org.apache.hadoop.fs.Path(s"$path/$rel"), false))
          throw new java.io.IOException(
            s"torn-append repair: cannot delete partial file $path/$rel")
        n += 1
      }
    }
    n
  }

  /** S8 metadata derive (post-save refresh, database_handler.py:219-229). */
  def deriveMeta(df: DataFrame): DataFrame =
    df.groupBy("symbol", "timeframe")
      .agg(min(col("ts")).as("start_ts"), max(col("ts")).as("end_ts"))

  /** S6 stored-info listing with date enrichment
    * (database_handler.py:348-377). */
  def storedInfo(meta: DataFrame, counts: DataFrame): DataFrame =
    meta.join(counts, Seq("symbol", "timeframe"), "left")
      .withColumn("start_date", date_format(col("start_ts"), "yyyy-MM-dd"))
      .withColumn("end_date", date_format(col("end_ts"), "yyyy-MM-dd"))
      .orderBy("symbol", "timeframe")

  /** S9 delete-by-key as an anti-filter rewrite (database_handler.py:
    * 243-255); with the canonical layout this drops whole partitions. */
  def deleteSeries(df: DataFrame, symbol: String, timeframe: String): DataFrame =
    // null-SAFE comparison: with plain ===, a row holding a NULL key
    // makes the conjunction NULL, the negation NULL, and filter drops
    // it — deleting unrelated NULL-key rows alongside the target series
    df.filter(!(col("symbol") <=> symbol && col("timeframe") <=> timeframe))

  /** S10 CSV export with the reference's filename template
    * `{symbol}_{timeframe}_{start}_{end}` (colab_interface.py:291). */
  def exportCsv(df: DataFrame, baseDir: String, symbol: String,
      timeframe: String, start: String, end: String): String = {
    val path = s"$baseDir/${symbol}_${timeframe}_${start}_$end.csv"
    df.write.mode("overwrite").option("header", "true").csv(path)
    path
  }

  /** S11 parquet export (colab_interface.py:296-297). */
  def exportParquet(df: DataFrame, baseDir: String, symbol: String,
      timeframe: String, start: String, end: String): String = {
    val path = s"$baseDir/${symbol}_${timeframe}_${start}_$end.parquet"
    df.write.mode("overwrite").parquet(path)
    path
  }
}
