package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Embedding similarity search (north-star extension, SURVEY §7.4).
  *
  * All vector math uses codegen-friendly higher-order functions
  * (`zip_with`/`aggregate`/`transform`) over `ARRAY<FLOAT>` cast to double —
  * no UDF, so Catalyst sees through the expressions.
  *
  * Scale path: brute-force top-k is the exact baseline (one broadcast of
  * the query vector, one pass, TakeOrdered — linear, shuffle-free);
  * [[lshBuckets]] gives the sublinear variant — random-hyperplane signs
  * bucket the corpus so a query probes ~1/2^planes of it. An IVF variant
  * falls out of partitioning by any coarse-quantizer column.
  */
object Similarity {

  private def d(c: Column): Column = transform(c, x => x.cast("double"))

  private def toExpr(c: Column) =
    org.apache.spark.sql.GraftBridge.expression(c)
  private def toCol(e: org.apache.spark.sql.catalyst.expressions.Expression) =
    org.apache.spark.sql.GraftBridge.column(e)

  /** Dot product of two float-array columns, accumulated in double in
    * element order — the codegen'd native expression
    * ([[graft.functions.DotF32]]); bit-identical to [[dotHof]]. */
  def dot(a: Column, b: Column): Column =
    toCol(graft.functions.DotF32(toExpr(a), toExpr(b)))

  /** Higher-order-function formulation of [[dot]] (interpreted lambdas) —
    * kept as the cross-check reference implementation. */
  def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(d(a), d(b), (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  /** Squared-L2 distance of two float/double array columns, accumulated
    * in double in element order — the codegen'd native expression
    * ([[graft.functions.L2DistF32]]); bit-identical to the HOF fold it
    * replaced on equal-length arrays (the cell-ranking rule every probe
    * shares rounds OUTSIDE, at 6, as before). The HOF form survives as
    * the cross-check reference in [[ivfAssignViaJoin]]. */
  def l2sq(a: Column, b: Column): Column =
    toCol(graft.functions.L2DistF32(toExpr(a), toExpr(b)))

  /** L2 norm (= sqrt of self-dot, native). */
  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Exact-decimal element-mean centroid of an embedding-array column —
    * the explode-free native aggregate ([[graft.functions.CentroidAggF]]);
    * bit-identical to [[centroidsViaPosexplode]]'s
    * posexplode → decimal-sum → collect/sort pipeline (CentroidAggSpec
    * pins it), with no row expansion: one buffer of 3·dim longs per
    * group per partition is all that moves. A group whose every array is
    * null evaluates to null (the exploded frame simply had no row for
    * it) — call sites filter `isNotNull` to keep the old inner-join
    * drop semantics. */
  def centroid(emb: Column): Column =
    toCol(graft.functions.CentroidAggF(toExpr(emb)).toAggregateExpression())

  /** The original posexplode formulation of the exact-decimal centroid —
    * kept as the cross-check reference implementation (the [[dotHof]]
    * convention) and as the decimal(30,7)-headroom fallback the
    * aggregate's overflow refusal names. Returns `(groupCol, cent)`. */
  private[graft] def centroidsViaPosexplode(df: DataFrame, groupCol: String,
      embCol: String): DataFrame =
    df.select(col(groupCol), posexplode(d(col(embCol))).as(Seq("i", "x")))
      .groupBy(groupCol, "i")
      .agg((sum(round(col("x"), 7).cast("decimal(20,7)")).cast("double") /
        count(lit(1))).as("c"))
      .groupBy(groupCol).agg(
        transform(array_sort(collect_list(struct(col("i"), col("c")))),
          s => s.getField("c")).as("cent"))

  /** Cosine similarity. */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Exact brute-force top-k by cosine against one query vector (single
    * row in `query`). Broadcast nested-loop of a 1-row side + TakeOrdered:
    * no shuffle of the corpus. Ties broken by id for determinism.
    *
    * The query norm is precomputed ON THE BROADCAST SIDE (round 9): the
    * naive `cosine(emb, q_emb)` re-folds the query's self-dot for every
    * corpus row — same value, dim extra multiply-adds per row. Results
    * are bit-identical (identical fold, identical op order). */
  def bruteForceTopK(corpus: DataFrame, query: DataFrame, idCol: String,
      embCol: String = "embedding", k: Int = 10): DataFrame = {
    val q = broadcast(query.select(col(embCol).as("q_emb"))
      .withColumn("_qn", norm(col("q_emb"))))
    corpus.crossJoin(q)
      .withColumn("cos", round(
        dot(col(embCol), col("q_emb")) / (norm(col(embCol)) * col("_qn")), 6))
      .orderBy(col("cos").desc, col(idCol))
      .select(col(idCol), col("cos"))
      .limit(k)
  }

  /** Deterministic pseudo-random hyperplanes (fixed seed — reproducible
    * across sessions; components in [-1, 1]). */
  def hyperplanes(numPlanes: Int, dim: Int, seed: Long = 42L): Seq[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(numPlanes)(Array.fill(dim)(rnd.nextDouble() * 2 - 1))
  }

  /** Random-hyperplane LSH bucket id: bit i = sign(v · h_i) — the
    * codegen kernel [[graft.functions.LshBucketF]] (one pass, planes
    * as a reference object). Replaced the per-plane
    * `when(aggregate(zip_with(...)) > 0, …)` HOF chain — numPlanes
    * interpreted folds per CORPUS row on every LSH bucketing path
    * (semantic dedup, blocked pairs, bucketed ANN) — bit-identically:
    * same per-plane fold order, same strict `> 0` sign, disjoint bits
    * so sum ≡ OR (spec-pinned; the x73/x86 oracles hash-check bucket
    * assignments cross-engine). [[lshBucketHof]] keeps the HOF form
    * as the cross-check reference. */
  def lshBucket(emb: Column, planes: Seq[Array[Double]]): Column =
    toCol(graft.functions.LshBucketF(toExpr(emb),
      planes.map(_.toIndexedSeq).toIndexedSeq))

  /** Higher-order-function formulation of [[lshBucket]] (interpreted
    * lambdas) — kept as the cross-check reference implementation (the
    * [[dotHof]] convention). */
  private[graft] def lshBucketHof(emb: Column,
      planes: Seq[Array[Double]]): Column =
    planes.zipWithIndex.map { case (p, i) =>
      val planeCol = array(p.toIndexedSeq.map(lit(_)): _*)
      when(aggregate(zip_with(d(emb), planeCol, (x, y) => x * y),
        lit(0.0), (acc, v) => acc + v) > 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Bucketed ANN: assign corpus + query to hyperplane buckets, search only
    * the query's bucket. Approximate — documents in neighboring buckets are
    * missed (the recall/speed trade LSH makes); at scale the bucket column
    * doubles as a storage partition key.
    *
    * A FIXED plane count means the probed bucket's population grows
    * linearly with the corpus (corpus/2^planes expected) — probe cost
    * and recall both drift as the corpus scales. [[lshTopKAuto]] keys
    * the plane count to corpus size instead; this fixed form remains
    * for callers pinning bucket identity to a storage layout. */
  def lshTopK(corpus: DataFrame, query: DataFrame, idCol: String,
      embCol: String = "embedding", numPlanes: Int = 8, dim: Int = 64,
      k: Int = 10): DataFrame =
    lshTopKWith(corpus, query, idCol, embCol, k,
      lshBucket(_, hyperplanes(numPlanes, dim)))

  /** Corpus-size-keyed [[lshTopK]] (the x73/x86/x50 `autoGlobalPlanes`
    * ladder, applied to the probe path): the plane count is the minimum
    * q with 2^q ≥ ⌈n/targetBucket⌉, so the probed bucket's EXPECTED
    * population stays ≈ `targetBucket` at any corpus size — constant
    * probe cost and stable recall, where the fixed form's bucket grows
    * linearly with the corpus. Bucketing masks the low q bits of the
    * shared fixed-seed `maxPlanes`-bit bucket, which is bit-identical
    * to bucketing with q planes directly (hyperplanes draw sequentially
    * from one seed — the spec-pinned semanticDedupAuto property), so an
    * oracle can recompute the same ladder from its own count.
    *
    * `corpusRows` skips the sizing count when the caller already knows
    * it (write manifest, shard counts); leave negative to count — one
    * job over the pruned scan, the same disclosed price
    * [[semanticDedupAuto]] pays. */
  def lshTopKAuto(corpus: DataFrame, query: DataFrame, idCol: String,
      embCol: String = "embedding", targetBucket: Int = 1000,
      maxPlanes: Int = 16, dim: Int = 64, k: Int = 10,
      corpusRows: Long = -1L): DataFrame = {
    val n = if (corpusRows >= 0L) corpusRows else corpus.count()
    val q = autoGlobalPlanes(n, targetBucket, maxPlanes)
    val planes = hyperplanes(maxPlanes, dim)
    lshTopKWith(corpus, query, idCol, embCol, k,
      lshBucket(_, planes).bitwiseAND(lit((1L << q) - 1)))
  }

  /** Shared probe tail of [[lshTopK]]/[[lshTopKAuto]]: the corpus side
    * is a map-side bucket filter (query broadcast), the top-k a
    * distributed TakeOrdered over the bucket's members. */
  private def lshTopKWith(corpus: DataFrame, query: DataFrame,
      idCol: String, embCol: String, k: Int,
      bucket: Column => Column): DataFrame = {
    val bucketed = corpus.withColumn("bucket", bucket(col(embCol)))
    val qb = broadcast(query.select(col(embCol).as("q_emb"))
      .withColumn("bucket", bucket(col("q_emb")))
      .withColumn("_qn", norm(col("q_emb"))))
    bucketed.join(qb, "bucket")
      .withColumn("cos", round(
        dot(col(embCol), col("q_emb")) / (norm(col(embCol)) * col("_qn")), 6))
      .orderBy(col("cos").desc, col(idCol))
      .select(col(idCol), col("bucket"), col("cos"))
      .limit(k)
  }

  /** Offline-built IVF (inverted-file) index: the cell-assigned corpus
    * plus the (nCells × dim, tiny) centroid frame. Both sides are plain
    * DataFrames — no model object — so the index round-trips through
    * parquet ([[ivfSave]]/[[ivfLoad]]) and a probe NEVER re-fits the
    * quantizer (VERDICT r7 item 7: the old one-shot [[ivfTopK]] re-ran
    * KMeans per call). */
  final case class IvfIndex(assigned: DataFrame, centroids: DataFrame) {
    /** Cell count, counted once per handle (nCells-row frame). */
    private[graft] lazy val cellCount: Long = centroids.count()

    /** The super-quantizer the probe entry points fall back to when the
      * caller passes none: auto-built at √nCells supers once the index
      * crosses [[AutoHierCells]] cells, None below it. Makes the SCALE
      * path the default path (VERDICT r12 #6) — at production cell
      * counts a probe should never flat-rank nCells centroids just
      * because the caller didn't read SCALING.md — while small indexes
      * keep the exact flat ranking. Lazy and cached per index handle:
      * the fit input is the nCells-row centroid frame ([[ivfSuperBuild]]
      * — derived state, deterministic), so a long-lived handle pays it
      * once, and a handle that never probes a big index pays nothing. */
    private[graft] lazy val autoSuper: Option[IvfSuper] =
      if (cellCount <= AutoHierCells) None
      else Some(ivfSuperBuild(this,
        math.ceil(math.sqrt(cellCount.toDouble)).toInt))
  }

  /** Above this many cells the probe entry points default to
    * hierarchical cell ranking (see [[IvfIndex.autoSuper]]). 256 ≈
    * where the flat form's nCells-row ranking pass starts to dominate
    * sub-second probes (IVF_ASSIGN_BENCH_r12: flat linear in nCells,
    * hier flat). */
  private[graft] val AutoHierCells = 256L

  /** The ONE resolution rule for which quantizer ranks probe cells,
    * shared by every probe entry point (raw/PQ/residual/SQ, single and
    * bulk). `nProbeSuper = 0` is the per-call OPT-OUT (ADVICE r13) and
    * beats everything — even an explicitly passed `superQ` (zero
    * supers to consider leaves no hierarchical ranking to do; the hier
    * path would `take(0)` supers and probe nothing, so 0 MEANS flat,
    * unconditionally): the exact flat ranking at ANY cell count, no
    * super-quantizer fit paid. Otherwise an explicit `superQ` wins;
    * otherwise the index's auto-built hierarchy above
    * [[AutoHierCells]] cells; flat below — the auto-hier default
    * changed `superQ = None`'s meaning from "flat" to "auto" once an
    * index crosses the threshold, and a caller comparing recall (or
    * pinning exactness) needs flat back without rebuilding the index
    * under the threshold. */
  private[ext] def resolveSuper(index: IvfIndex, superQ: Option[IvfSuper],
      nProbeSuper: Int): Option[IvfSuper] = {
    require(nProbeSuper >= 0,
      "nProbeSuper must be >= 0 (0 = force the exact flat cell ranking)")
    if (nProbeSuper == 0) None else superQ.orElse(index.autoSuper)
  }

  /** One-row probe of a compressed layout's codes width — the ONE
    * physical tell between the schema-identical SQ (dim-wide) and PQ
    * (m-wide) layouts, shared by every cross-layout guard so the probe
    * and its meaning cannot drift between sites. None on an empty
    * frame OR one whose codes are all null (guards skip — nothing to
    * corrupt; a null-encoded row carries no width, and probing it
    * would NPE through size()'s null result instead of reporting the
    * layout mismatch the guard exists to name — ADVICE r14). */
  private[graft] def codesWidth(df: DataFrame): Option[Int] = {
    val w = df
      .filter(org.apache.spark.sql.functions.col("codes").isNotNull)
      .select(org.apache.spark.sql.functions.size(
        org.apache.spark.sql.functions.col("codes"))).take(1)
    if (w.isEmpty) None else Some(w(0).getInt(0))
  }

  /** The tombstone fold every maintenance reader shares: `df` minus the
    * ids under `$path/deletes` (broadcast anti-join on the tombstone
    * file's OWN id column — the one schema contract tombstones carry),
    * identity when none exist. One implementation so the fold cannot
    * drift between the load, trigger, and retrain paths. */
  private[ext] def liveRows(spark: org.apache.spark.sql.SparkSession,
      path: String, df: DataFrame): DataFrame = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(path), spark.sparkContext.hadoopConfiguration)
    if (fs.exists(new org.apache.hadoop.fs.Path(s"$path/deletes"))) {
      val del = spark.read.parquet(s"$path/deletes")
      df.join(broadcast(del), Seq(del.columns.head), "left_anti")
    } else df
  }

  /** IVF index build (the expensive offline step, run once per corpus):
    * distributed MLlib KMeans coarse quantizer, fixed seed ⇒
    * deterministic cells. `assigned` carries the corpus + its `cell` id;
    * `centroids` is `(cell, cent: ARRAY<DOUBLE>)`. */
  def ivfBuild(corpus: DataFrame, embCol: String = "embedding",
      nCells: Int = 16, seed: Long = 42L): IvfIndex = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val featured = corpus.withColumn("_v", array_to_vector(d(col(embCol))))
    val model = new KMeans().setK(nCells).setSeed(seed)
      .setFeaturesCol("_v").setPredictionCol("cell").fit(featured)
    val spark = corpus.sparkSession
    import spark.implicits._
    val centroids = model.clusterCenters.zipWithIndex
      .map { case (c, i) => (i, c.toArray) }.toSeq
      .toDF("cell", "cent")
    IvfIndex(model.transform(featured).drop("_v"), centroids)
  }

  /** Persist an IVF index: the assigned corpus bucketed BY CELL
    * ([[graft.engine.Store.saveBucketed]] — one file per cell, so a probe's
    * `cell IN (…)` filter bucket-prunes the scan to nProbe/nCells of the
    * data), the centroid frame as a single tiny parquet. */
  def ivfSave(index: IvfIndex, table: String, path: String,
      nCells: Int): Unit = {
    // the published centroid count IS the bucket modulus contract:
    // ivfLoad's fresh-session re-register derives the modulus from it,
    // and a mismatch (KMeans can return FEWER than k centers on a
    // corpus with fewer distinct points) would register a wrong bucket
    // spec whose pruning silently selects the wrong file groups
    // (ADVICE r13). Fail at save time, next to the cause.
    require(index.cellCount == nCells.toLong,
      s"ivfSave: centroid frame has ${index.cellCount} cells but the " +
        s"requested bucket modulus is $nCells — KMeans returned fewer " +
        "centers than k (degenerate/too-small corpus?); save with " +
        "nCells = the actual centroid count")
    graft.engine.Store.saveBucketed(index.assigned, table,
      s"$path/assigned", nCells, Seq("cell"))
    index.centroids.coalesce(1).write.mode("overwrite")
      .parquet(s"$path/centroids")
  }

  /** Reopen a persisted IVF index for probe-only use — no corpus scan, no
    * KMeans, just the bucketed table + centroid parquet. If tombstones
    * exist ([[ivfDelete]]), the assigned view anti-joins them off
    * (broadcast — the tombstone set is bounded by total deletions), so
    * probes never return deleted vectors; [[ivfCompact]] folds them into
    * the files physically. */
  def ivfLoad(spark: org.apache.spark.sql.SparkSession, table: String,
      path: String): IvfIndex = {
    // an [[ivfCompact]] killed between its two directory renames leaves
    // no live assigned dir — roll the completed rewrite forward
    graft.engine.Store.healInterruptedSwap(spark, s"$path/assigned")
    // an [[ivfRetrain]] killed after its swap but before its commit left
    // the new centroid frame staged INSIDE the swapped-in assigned tree
    // — publish it (idempotent) before anything reads the stale frame
    finalizeRetrain(spark, table, path)
    // ALWAYS refresh, not only after a heal: a session that previously
    // read this table caches its file listing, and appends written by
    // ANOTHER session (a foreachBatch sink runs in a streaming-cloned
    // session) stay invisible to it — a reopened index must see the
    // current files (one catalog invalidation; the probe is about to
    // list anyway)
    if (spark.catalog.tableExists(table))
      spark.catalog.refreshTable(table)
    else {
      // no catalog entry — a crash between finalizeRetrain's drop and
      // create, or a FRESH session whose catalog never saw this index.
      // Re-register from the published centroid count, which equals the
      // files' bucket modulus by construction (every writer buckets the
      // assigned tree into exactly nCells): a load needs nothing from
      // the session that wrote the index.
      val n = spark.read.parquet(s"$path/centroids").count().toInt
      graft.engine.Store.registerBucketedExternal(spark, table,
        s"$path/assigned", n, Seq("cell"))
    }
    IvfIndex(liveRows(spark, path, spark.table(table)),
      spark.read.parquet(s"$path/centroids"))
  }

  /** Delete vectors from a persisted IVF index — retention /
    * right-to-be-forgotten — as TOMBSTONES: O(delete batch +
    * probe-class id scan) append to `$path/deletes` (stored under the
    * caller's id column name, which is how [[ivfLoad]] knows the join
    * key without a schema contract), no rewrite of the corpus-sized
    * assigned table. [[ivfProbe]] over a reloaded index skips deleted
    * vectors immediately; [[ivfCompact]] removes their rows physically
    * and clears the tombstones. Idempotent per id: already-tombstoned
    * AND never-indexed ids are skipped — an out-of-order delete
    * (request arriving before the vector was ingested) must not stage a
    * tombstone that would block the vector's first ingest until a
    * compact. Re-runs are no-ops; there is no journal to manage
    * because, unlike the band index, no derived sizes frame exists to
    * drift. Returns the number of ids newly tombstoned by this call.
    *
    * Re-ingesting a deleted id before a compact is a CONFLICT (the
    * tombstone would hide the new row too) — same contract as
    * [[graft.ext.Dedup.bandIndexDelete]]. */
  def ivfDelete(ids: DataFrame, idCol: String, table: String,
      path: String): Long = {
    val spark = ids.sparkSession
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(path), spark.sparkContext.hadoopConfiguration)
    graft.ext.Dedup.withRddCleanup(spark) {
      val existing =
        if (fs.exists(new org.apache.hadoop.fs.Path(s"$path/deletes")))
          Some(spark.read.parquet(s"$path/deletes"))
        else None
      val delAll = ids.select(col(idCol)).distinct()
      val candidates = existing.fold(delAll) { e =>
        // cast to the existing tombstone column type — a second physical
        // width appended into the deletes dir would leave a mixed-schema
        // parquet tree that fails at read (same normalization as
        // Dedup.bandIndexDelete)
        delAll.select(col(idCol)
            .cast(e.schema(e.columns.head).dataType))
          .join(broadcast(e), Seq(idCol), "left_anti")
      }
      // keep only ids that are actually INDEXED (id-column-only scan of
      // the assigned table — parquet prunes to one column)
      val newDel = spark.table(table).select(col(idCol))
        .join(broadcast(candidates), Seq(idCol), "left_semi")
        .distinct()
        .localCheckpoint()
      val n = newDel.count()
      if (n > 0) {
        val aligned = existing.fold(newDel)(e => newDel.select(col(idCol)
          .cast(e.schema(e.columns.head).dataType)))
        aligned.write.mode("append").parquet(s"$path/deletes")
      }
      n
    }
  }

  /** IVF probe (the cheap online step, any number of times per build):
    * rank cells by centroid↔query distance on the broadcast-sized
    * centroid frame, then exact cosine over ONLY the `nProbe` nearest
    * cells. The probe-cell ids are collected to the driver — bounded at
    * `nProbe` ints by construction — so the scan filter is literal
    * `cell IN (…)`: against an [[ivfSave]]d index that bucket-prunes the
    * read to nProbe files out of nCells.
    *
    * `pred` is FILTERED search (the FAISS `IDSelector` shape): the
    * predicate restricts CANDIDATES inside the probed cells —
    * conjoined directly after the `cell IN (…)` filter, so on a saved
    * index it reaches the parquet scan as a pushed filter alongside
    * the bucket prune. Cell ranking is deliberately unaffected: the
    * quantizer describes the FULL corpus, and re-ranking cells against
    * a filtered subset would need per-predicate centroids. The trade
    * every post-filtering ANN engine makes: a selective predicate can
    * leave fewer than k matches inside nProbe cells — raise nProbe to
    * recover recall, the filtered-search knob.
    *
    * Above [[AutoHierCells]] cells the ranking goes through the
    * auto-built two-level quantizer ([[IvfIndex.autoSuper]]) with
    * `nProbeSuper` supers considered — the hierarchical-quantizer
    * recall trade documented at [[ivfAssignHier]]. `nProbeSuper = 0`
    * forces the exact flat ranking at ANY cell count (the per-call
    * opt-out, [[resolveSuper]] — no super-quantizer fit is paid);
    * below the threshold the ranking is the exact flat one either
    * way. */
  def ivfProbe(index: IvfIndex, query: DataFrame, idCol: String,
      embCol: String = "embedding", nProbe: Int = 2, k: Int = 10,
      pred: Option[Column] = None, nProbeSuper: Int = 2): DataFrame =
    resolveSuper(index, None, nProbeSuper) match {
      case Some(sq) =>
        ivfProbeHier(index, sq, query, idCol, embCol, nProbeSuper,
          nProbe, k, pred)
      case None =>
        val qv = broadcast(query.select(d(col(embCol)).as("q_v")))
        // distances round at 6 before ranking — the ONE cell-ranking
        // rule every probe variant shares (flat/hier/bulk, driver or
        // distributed), so "bulk ≡ per-query" and "hier-exhaustive ≡
        // flat" hold on near-tie centroids too, and the oracle rows can
        // mirror the ranking deterministically (r12 review finding #1)
        val probeCells = index.centroids.crossJoin(qv)
          .withColumn("dist", round(l2sq(col("cent"), col("q_v")), 6))
          .orderBy(col("dist").asc, col("cell")).limit(nProbe)
          // cast before collect: the probe must not assume the persisted
          // index's integer width (physical layouts have drifted before
          // — TESTDATA.md "Physical layout drift")
          .select(col("cell").cast("int")).collect().map(_.getInt(0)).toSeq
        probeCellsScan(index, query, idCol, embCol, probeCells, k, pred)
    }

  /** The shared driver-side distance: squared-L2 fold in element order,
    * rounded at 6 exactly as the Column rankings round (Spark's round =
    * HALF_UP on the double's decimal representation — BigDecimal(d) in
    * Scala is the same valueOf form). Dim mismatch throws: ranking on a
    * silent dimension prefix returns plausible garbage. */
  private[graft] def rankDist(cent: Seq[Double], q: IndexedSeq[Double],
      what: String): Double = {
    require(cent.length == q.length,
      s"$what: centroid dim ${cent.length} != query dim ${q.length} — " +
        "the index was built over different embeddings")
    var acc = 0.0
    var i = 0
    while (i < q.length) { val dd = cent(i) - q(i); acc += dd * dd; i += 1 }
    BigDecimal(acc).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
  }

  /** The exact in-cell search every probe variant shares: pruned
    * `cell IN (…)` scan (bucket-pruned against an [[ivfSave]]d layout)
    * + broadcast 1-row query + TakeOrdered. `pred` conjoins the
    * filtered-search predicate right after the cell prune ([[ivfProbe]]
    * documents the semantics). */
  private def probeCellsScan(index: IvfIndex, query: DataFrame,
      idCol: String, embCol: String, probeCells: Seq[Int],
      k: Int, pred: Option[Column] = None): DataFrame = {
    val qb = broadcast(query.select(col(embCol).as("q_emb"))
      .withColumn("_qn", norm(col("q_emb"))))
    pred.foldLeft(
        index.assigned.filter(col("cell").isin(probeCells: _*)))(_.filter(_))
      .crossJoin(qb)
      .withColumn("cos", round(
        dot(col(embCol), col("q_emb")) / (norm(col(embCol)) * col("_qn")), 6))
      .orderBy(col("cos").desc, col(idCol))
      .select(col(idCol), col("cell"), col("cos"))
      .limit(k)
  }

  /** Two-level coarse quantizer over an existing IVF index: the nCells
    * centroids are themselves clustered into `nSuper` (≈√nCells)
    * super-cells. Why it exists: [[ivfAssign]] and every probe's cell
    * ranking hold the FULL centroid table as driver state
    * (nCells × dim doubles) and scan it flat per row/probe — bounded at
    * the shipped nCells=16, but at a production 100 TB quantizer
    * (nCells 10⁴–10⁵, dim ~10³) that reference object is GB-scale and
    * the flat argmin dominates encode. With the hierarchy, driver-held
    * state shrinks to the nSuper × dim super-centroids; the full
    * centroid set travels as the `children` DATA frame (broadcast-sized
    * like any dimension table, never expression state), and per-row /
    * per-probe cost drops to O((nSuper + nCells/nSuper)·dim) — minimized
    * at nSuper = √nCells.
    *
    * `superIds` ↔ `superCents` are position-aligned and cover ONLY
    * supers that own ≥1 centroid (KMeans can leave a cluster empty —
    * an empty super must never be assignable, [[graft.functions.NearestInArrayF]]
    * would meet an absent children row). `children` is
    * `(super INT, cands ARRAY<STRUCT<cell INT, cent ARRAY<DOUBLE>>>)`,
    * cands sorted by cell id so argmin ties break to the lowest cell —
    * the [[ivfAssign]] / MLlib first-min rule. */
  final case class IvfSuper(superIds: IndexedSeq[Int],
      superCents: IndexedSeq[IndexedSeq[Double]], children: DataFrame) {
    require(superIds.length == superCents.length && superIds.nonEmpty,
      "super ids and centroids must align and be non-empty")
  }

  /** Fit the super-quantizer: MLlib KMeans over the (tiny, nCells-row)
    * centroid frame, fixed seed ⇒ deterministic. An offline step run
    * once per [[ivfBuild]] — the fit input is the centroid table, never
    * the corpus. No persistence layer is needed: rebuilding from a
    * reloaded index ([[ivfLoad]] → this) reproduces the IDENTICAL
    * hierarchy — same centroids in, same seeded fit — at nCells-row
    * cost, so the super-quantizer is derived state, not a second
    * artifact whose drift would need its own journal. */
  def ivfSuperBuild(index: IvfIndex, nSuper: Int,
      seed: Long = 42L): IvfSuper = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    // one cell-sorted partition before the fit: seeded KMeans is only
    // deterministic for a fixed data partitioning/order, and a RELOADED
    // index's centroid frame is partitioned by the parquet read, not by
    // the groupBy that first produced it — without this, the
    // rebuild-reproduces-the-identical-hierarchy contract below would
    // silently depend on where the frame came from. nCells rows: a
    // single partition is free.
    val featured = index.centroids
      .select(col("cell").cast("int").as("cell"), d(col("cent")).as("cent"))
      .orderBy("cell").coalesce(1)
      .withColumn("_v", array_to_vector(col("cent")))
    if (nSuper == 1) {
      // degenerate-but-legal hierarchy (and the exhaustive ≡-flat pin):
      // one super owns every cell; MLlib refuses k=1, and no fit is
      // needed — any super-centroid works since level 1 has one choice
      val children = featured.drop("_v")
        .groupBy(lit(0).as("super"))
        .agg(sort_array(collect_list(struct(col("cell"), col("cent"))))
          .as("cands"))
      val dim = index.centroids.select(size(col("cent"))).head.getInt(0)
      IvfSuper(IndexedSeq(0), IndexedSeq(IndexedSeq.fill(dim)(0.0)), children)
    } else {
      val model = new KMeans().setK(nSuper).setSeed(seed)
        .setFeaturesCol("_v").setPredictionCol("_super").fit(featured)
      val children = model.transform(featured)
        .groupBy(col("_super").cast("int").as("super"))
        .agg(sort_array(collect_list(struct(col("cell"), col("cent"))))
          .as("cands"))
      val present = children.select("super").collect()
        .map(_.getInt(0)).sorted.toIndexedSeq
      val cents = model.clusterCenters.map(_.toArray.toIndexedSeq)
      IvfSuper(present, present.map(cents(_)), children)
    }
  }

  /** Hierarchical cell assignment — [[ivfAssign]] through the two-level
    * quantizer: level 1 is a codegen argmin against the nSuper
    * super-centroids (the only driver-collected matrix), level 2 a
    * broadcast join to the super's children and a codegen argmin over
    * that CANDIDATE COLUMN ([[graft.functions.NearestInArrayF]]). Zero
    * row expansion, two whole-stage-codegen loops per row.
    *
    * The hierarchy is the QUANTIZER: a row's cell is the nearest child
    * of its nearest super — which differs from the flat argmin exactly
    * when the globally-nearest cell hides under a non-nearest super
    * (the standard hierarchical-quantizer approximation; FAISS' coarse
    * quantizers make the same trade). Self-consistency is what matters:
    * assign and probe rank through the SAME hierarchy, so an assigned
    * vector is always found by the super-path that assigned it.
    * With nSuper=1 the hierarchy is exhaustive and ≡ [[ivfAssign]]
    * bit-for-bit (IvfIndexSpec pins it). */
  def ivfAssignHier(superQ: IvfSuper, vecs: DataFrame, idCol: String,
      embCol: String = "embedding"): DataFrame = {
    require(vecs.filter(col(embCol).isNull).isEmpty,
      s"ivfAssignHier: batch contains null $embCol rows — a null " +
        "embedding has no nearest cell; filter or repair them first")
    val pos = toCol(graft.functions.NearestCentroidF(toExpr(col(embCol)),
      superQ.superCents))
    vecs
      .withColumn("_super",
        element_at(array(superQ.superIds.map(lit(_)): _*), pos + 1))
      .join(broadcast(superQ.children),
        col("_super") === superQ.children("super"))
      .withColumn("cell", toCol(graft.functions.NearestInArrayF(
        toExpr(col(embCol)), toExpr(col("cands")))))
      .drop("_super", "super", "cands")
  }

  /** Rank probe cells through the hierarchy and return the nProbe
    * nearest cell ids: rank supers on the driver-held super-centroids
    * (nSuper distance folds), collect ONLY the top-`nProbeSuper`
    * supers' children (≈ nProbeSuper·nCells/nSuper rows — the
    * per-probe driver bound that replaces the full-centroid collect),
    * rank those, take nProbe. Same (dist asc, cell asc) rule as
    * [[ivfProbe]]'s flat ranking; with nProbeSuper = nSuper every cell
    * is considered and the ranking ≡ the flat one. */
  private[graft] def rankProbeCellsHier(superQ: IvfSuper,
      q: IndexedSeq[Double], nProbeSuper: Int, nProbe: Int): Seq[Int] = {
    val topSupers = superQ.superIds.zip(superQ.superCents)
      .map { case (s, c) => (s, rankDist(c, q, "rankProbeCellsHier")) }
      .sortBy { case (s, dist) => (dist, s) }
      .take(nProbeSuper).map(_._1)
    superQ.children.filter(col("super").isin(topSupers: _*))
      .select(explode(col("cands")).as("c"))
      .select(col("c.cell"), col("c.cent")).collect()
      .map(r => (r.getInt(0),
        rankDist(r.getSeq[Number](1).map(_.doubleValue), q,
          "rankProbeCellsHier")))
      .sortBy { case (c, dist) => (dist, c) }
      .take(nProbe).map(_._1).toSeq
  }

  /** [[ivfProbe]] through the two-level quantizer: hierarchical cell
    * ranking ([[rankProbeCellsHier]]) + the same pruned exact in-cell
    * scan. The nested-probe recall trade is tunable: `nProbeSuper`
    * supers considered, `nProbe` cells scanned; nProbeSuper = nSuper
    * recovers the flat ranking exactly. */
  def ivfProbeHier(index: IvfIndex, superQ: IvfSuper, query: DataFrame,
      idCol: String, embCol: String = "embedding", nProbeSuper: Int = 2,
      nProbe: Int = 2, k: Int = 10, pred: Option[Column] = None): DataFrame = {
    val qRows = query.select(d(col(embCol)).as("q")).take(1)
    require(qRows.nonEmpty, "ivfProbeHier: empty query frame")
    val q = qRows(0).getSeq[Double](0).toIndexedSeq
    probeCellsScan(index, query, idCol, embCol,
      rankProbeCellsHier(superQ, q, nProbeSuper, nProbe), k, pred)
  }

  /** Distributed per-query cell ranking for the BULK probes: returns
    * `(qidCol, cell)` — each query's top-`nProbe` cells by
    * (squared-L2 distance rounded at 6, cell) — from a query frame
    * `qd` that carries `_q ARRAY<DOUBLE>`. Flat form: queries × the
    * broadcast centroid frame (Q·nCells rows). Hierarchical form
    * (`superQ`): queries × the nSuper super-centroids first, then only
    * the top-`nProbeSuper` supers' children explode —
    * Q·nProbeSuper·(nCells/nSuper) rows instead of Q·nCells, the same
    * √-reduction the single-query hier probe gets, but fully
    * distributed (no driver collect at any cell count). Rounding
    * before ranking is the cross-engine rank rule (x91's oracle
    * mirrors it); with nProbeSuper = nSuper the hierarchical ranking
    * ≡ the flat one. */
  private[graft] def bulkProbeCells(index: IvfIndex, qd: DataFrame,
      qidCol: String, nProbe: Int, superQ: Option[IvfSuper] = None,
      nProbeSuper: Int = 2): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // the one distance the bulk ranking evaluates Q × cells times per
    // batch — codegen kernel, not the interpreted HOF fold (L2DistF32)
    def d2(a: Column, b: Column): Column = round(l2sq(a, b), 6)
    val wCell = Window.partitionBy(qidCol)
      .orderBy(col("_dist").asc, col("cell").asc)
    // above AutoHierCells the index supplies its auto-built hierarchy
    // when the caller passes none ([[IvfIndex.autoSuper]]): the bulk
    // ranking rows drop from Q·nCells to Q·(nSuper + nProbeSuper·
    // nCells/nSuper) without the caller opting in. nProbeSuper = 0
    // forces flat (resolveSuper — the shared opt-out rule).
    resolveSuper(index, superQ, nProbeSuper) match {
      case None =>
        val cents = broadcast(index.centroids
          .select(col("cell").cast("int").as("cell"),
            transform(col("cent"), x => x.cast("double")).as("_cent")))
        qd.crossJoin(cents)
          .withColumn("_dist", d2(col("_cent"), col("_q")))
          .withColumn("_rn", row_number().over(wCell))
          .filter(col("_rn") <= nProbe)
          .select(col(qidCol), col("cell"))
      case Some(sq) =>
        val spark = qd.sparkSession
        import spark.implicits._
        val supers = broadcast(sq.superIds.zip(sq.superCents)
          .map { case (s, c) => (s, c.toArray) }.toDF("super", "_scent"))
        val wSuper = Window.partitionBy(qidCol)
          .orderBy(col("_sdist").asc, col("super").asc)
        qd.crossJoin(supers)
          .withColumn("_sdist", d2(col("_scent"), col("_q")))
          .withColumn("_srn", row_number().over(wSuper))
          .filter(col("_srn") <= nProbeSuper)
          .join(broadcast(sq.children), "super")
          .select(col(qidCol), col("_q"), explode(col("cands")).as("c"))
          .select(col(qidCol), col("_q"),
            col("c.cell").as("cell"), col("c.cent").as("_cent"))
          .withColumn("_dist", d2(col("_cent"), col("_q")))
          .withColumn("_rn", row_number().over(wCell))
          .filter(col("_rn") <= nProbe)
          .select(col(qidCol), col("cell"))
    }
  }

  /** The bulk twin of the single-query two-stage rerank tail
    * ([[graft.ext.Pq.scoredTopK]]'s `rerankWith` arm) — shared by the
    * raw/SQ and PQ bulk probes so the rounding rule, (score desc, id)
    * tie-break, candidate bound, and output shape cannot drift from
    * the per-query form. Stage 1's per-query shortlist is a windowed
    * k·factor cut over the approximate scores (row_number under the
    * same ordering the per-query `limit` uses — identical deterministic
    * boundary); stage 2 broadcast-joins the Q·k·factor candidate ids
    * back to full precision and exact-cosine top-ks per query. The
    * corpus-sized side (`full`) is touched once, against a broadcast
    * candidate set — the production compressed-read shape at any Q. */
  private[ext] def bulkRerankTail(scored: DataFrame, qd: DataFrame,
      full: DataFrame, qidCol: String, idCol: String, embCol: String,
      k: Int, factor: Int, scoreCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wCand = Window.partitionBy(qidCol)
      .orderBy(col(scoreCol).desc, col(idCol).asc)
    val cand = scored.withColumn("_crn", row_number().over(wCand))
      .filter(col("_crn") <= k * factor).select(col(qidCol), col(idCol))
    val wTop = Window.partitionBy(qidCol)
      .orderBy(col("cos").desc, col(idCol).asc)
    full.select(col(idCol), col(embCol))
      .join(broadcast(cand), idCol)
      .join(broadcast(qd.select(col(qidCol), col("_q"), col("_qn"))), qidCol)
      .withColumn("cos", round(
        dot(col(embCol), col("_q")) / (norm(col(embCol)) * col("_qn")), 6))
      .withColumn("_rn", row_number().over(wTop))
      .filter(col("_rn") <= k)
      .select(col(qidCol), col(idCol), col("cos"))
      .orderBy(col(qidCol), col("cos").desc, col(idCol))
  }

  /** Bulk raw-IVF probe — a BATCH of queries against one index in one
    * distributed pass (the exact-cosine twin of
    * [[graft.ext.Pq.ivfPqProbeBulk]]): per-query cell ranking through
    * [[bulkProbeCells]] (flat or hierarchical), then ONE pruned scan of
    * the union of probed cells joined to the broadcast (query, cell)
    * pairs, exact cosine, windowed top-k per query. Work is
    * Σ_cells |cell|·(queries probing that cell); the corpus-sized side
    * is touched once. Result ≡ running [[ivfProbe]] per query
    * (spec-pinned); output ordered (query, cos desc, id).
    *
    * `rerankWith` adds the two-stage exact read ([[bulkRerankTail]]):
    * pointless for a raw index (stage 1 is already exact) but exactly
    * what an SQ-compressed probe ([[graft.ext.Sq.ivfSqProbeBulk]],
    * which delegates here over a decoded view) needs at aggressive
    * `levels` — the in-cell scan scores reconstructions, the rerank
    * restores full precision on k·factor candidates per query.
    *
    * The pairs frame is `localCheckpoint`ed (query-bounded blocks) and
    * stays persisted until the ContextCleaner GCs it — a long-lived
    * service issuing many bulk probes should wrap each call + result
    * materialization in [[graft.ext.Dedup.withRddCleanup]] so the
    * blocks release deterministically (ADVICE r12). */
  def ivfProbeBulk(index: IvfIndex, queries: DataFrame, qidCol: String,
      idCol: String, embCol: String = "embedding", nProbe: Int = 2,
      k: Int = 10, superQ: Option[IvfSuper] = None,
      nProbeSuper: Int = 2, pred: Option[Column] = None,
      rerankWith: Option[DataFrame] = None,
      rerankFactor: Int = 4): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val qd = queries.select(col(qidCol), d(col(embCol)).as("_q"))
      .withColumn("_qn", sqrt(dot(col("_q"), col("_q"))))
    val pairs = bulkProbeCells(index, qd, qidCol, nProbe, superQ,
        nProbeSuper)
      .join(qd, qidCol)
      .localCheckpoint() // Q·nProbe rows of dim doubles — query-bounded
    // literal IN list: bucket/file pruning of the index scan, bounded
    // at nCells ints (the ivfProbe collect bound)
    val cells = pairs.select("cell").distinct()
      .collect().map(_.getInt(0)).toSeq
    val wTop = Window.partitionBy(qidCol)
      .orderBy(col("cos").desc, col(idCol).asc)
    // pred conjoins after the cell prune — same filtered-search rule as
    // ivfProbe (one shared predicate for the whole batch; bulk ≡
    // per-query filtered, spec-pinned)
    val scored = pred.foldLeft(
        index.assigned.filter(col("cell").isin(cells: _*)))(_.filter(_))
      .join(broadcast(pairs), "cell")
      .withColumn("cos", round(
        dot(col(embCol), col("_q")) / (norm(col(embCol)) * col("_qn")), 6))
    rerankWith match {
      case None =>
        scored.withColumn("_rn", row_number().over(wTop))
          .filter(col("_rn") <= k)
          .select(col(qidCol), col(idCol), col("cell"), col("cos"))
          .orderBy(col(qidCol), col("cos").desc, col(idCol))
      case Some(full) =>
        bulkRerankTail(scored, qd, full, qidCol, idCol, embCol, k,
          rerankFactor, "cos")
    }
  }

  /** One-shot IVF top-k — [[ivfBuild]] + [[ivfProbe]] composed, for ad-hoc
    * single queries. Anything issuing repeated probes should build (and
    * usually [[ivfSave]]) once and call [[ivfProbe]] per query. */
  def ivfTopK(corpus: DataFrame, query: DataFrame, idCol: String,
      embCol: String = "embedding", nCells: Int = 16, nProbe: Int = 2,
      k: Int = 10, seed: Long = 42L): DataFrame =
    ivfProbe(ivfBuild(corpus, embCol, nCells, seed), query, idCol, embCol,
      nProbe, k)

  /** Incremental IVF maintenance, step 1: assign a NEW vector batch to
    * the EXISTING coarse quantizer — broadcast the (tiny) centroid frame,
    * exact argmin distance per vector, ties to the lowest cell, which is
    * exactly MLlib KMeans' own transform rule (IvfIndexSpec pins the
    * equivalence on the build corpus). No KMeans re-fit, no touch of the
    * historical corpus: per-batch cost is linear in the batch and
    * constant in index size — the only sane shape for a daily embedding
    * ingest at 100 TB. Re-fit ([[ivfBuild]]) only when drift degrades
    * cell balance.
    *
    * Returns the batch with a `cell` column appended (same layout as
    * `IvfIndex.assigned`, modulo KMeans' internal feature column). */
  def ivfAssign(index: IvfIndex, vecs: DataFrame, idCol: String,
      embCol: String = "embedding"): DataFrame = {
    // The centroid matrix rides into the task binary as a reference
    // object (nCells × dim doubles — the same broadcast-sized bound every
    // probe already relies on), and assignment is one codegen'd argmin
    // loop per row ([[graft.functions.NearestCentroidF]]): zero row
    // expansion, no window sort, constant per-row cost at ANY cell count.
    // The earlier crossJoin+row_number form materialized batch × nCells
    // rows — fine at 16 cells, tens of billions of intermediate rows for
    // a 1M-row batch at a realistic 100 TB cell count (VERDICT r10 #2).
    // Distance fold and lowest-cell tie rule are bit-identical to the
    // HOF/window form (IvfIndexSpec pins ≡ KMeans.transform).
    // Sort + cast defensively: a persisted index's physical widths have
    // no contract (TESTDATA.md "Physical layout drift").
    // refuse null embeddings up front: NearestCentroidF is null-safe,
    // so a null row would get a NULL cell, land in the null-hash bucket
    // of the appended table, and never match any probe's `cell IN (…)`
    // filter — silently invisible forever (the replaced join form
    // assigned such rows the lowest cell, equally meaningless but at
    // least findable). One batch-sized scan, same bound as the
    // tombstone-clash guard on the append path.
    require(vecs.filter(col(embCol).isNull).isEmpty,
      s"ivfAssign: batch contains null $embCol rows — a null embedding " +
        "has no nearest cell; filter or repair them before assignment")
    val cs = index.centroids
      .select(col("cell").cast("int"), col("cent")).orderBy("cell").collect()
    val cents = cs.map(_.getSeq[Number](1).map(_.doubleValue).toIndexedSeq)
      .toIndexedSeq
    val cellIds = cs.map(_.getInt(0))
    val pos = toCol(graft.functions.NearestCentroidF(toExpr(col(embCol)), cents))
    // map argmin position → cell id (identity when cells are the usual
    // dense 0..n-1 KMeans predictions, but never assume it)
    vecs.withColumn("cell",
      element_at(array(cellIds.toIndexedSeq.map(lit(_)): _*), pos + 1))
  }

  /** The crossJoin+window formulation [[ivfAssign]] replaced — kept as
    * the raced alternative (`tools/IvfAssignBench`): it materializes
    * batch × nCells intermediate rows plus a per-id window sort, which
    * the bench shows diverging as nCells grows while the argmin
    * expression's row count stays flat. Results are identical (same
    * distance fold, same lowest-cell tie rule). */
  private[graft] def ivfAssignViaJoin(index: IvfIndex, vecs: DataFrame,
      idCol: String, embCol: String = "embedding"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val joined = vecs.crossJoin(broadcast(index.centroids))
      .withColumn("_dist", aggregate(
        zip_with(d(col(embCol)), col("cent"), (x, y) => (x - y) * (x - y)),
        lit(0.0), (acc, v) => acc + v))
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("_dist").asc, col("cell").asc)
    joined.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .drop("_rn", "_dist", "cent")
      .withColumn("cell", col("cell").cast("int"))
  }

  /** Incremental IVF maintenance, step 2: append an [[ivfAssign]]ed
    * batch to a persisted index table. Spark appends bucketed files with
    * the SAME murmur3 bucket-id function, so a probe's `cell IN (…)`
    * filter keeps pruning to the probed cells' files (now ≤2 per cell:
    * original + appended batch; [[graft.engine.Store.compact]] if small
    * appends accumulate). Probes over the reopened index see the new
    * vectors immediately. */
  def ivfAppendSave(assigned: DataFrame, table: String, path: String,
      nCells: Int): Unit = {
    // enforce [[ivfDelete]]'s documented re-ingest conflict: an id with
    // a live tombstone would be hidden by it. Batch-sized broadcast
    // semi, only while tombstones exist.
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(path),
      assigned.sparkSession.sparkContext.hadoopConfiguration)
    if (fs.exists(new org.apache.hadoop.fs.Path(s"$path/deletes"))) {
      val del = assigned.sparkSession.read.parquet(s"$path/deletes")
      require(assigned.join(broadcast(del), Seq(del.columns.head),
          "left_semi").isEmpty,
        s"append batch re-uses tombstoned ids under $path: run " +
          "ivfCompact (folds and clears tombstones) before re-ingesting " +
          "a deleted id")
    }
    // same (table, path) pair as [[ivfSave]]; same one-bucket-per-task
    // repartition as Store.saveBucketed so each append adds ONE file per
    // touched cell
    assigned.repartition(nCells, col("cell"))
      .write.mode("append").option("path", s"$path/assigned")
      .bucketBy(nCells, "cell")
      .format("parquet").saveAsTable(table)
  }

  /** Compact a persisted IVF index's assigned table back to one file per
    * cell. Each [[ivfAppendSave]] adds one file per touched cell; after N
    * ingests a probe reads N files per probed cell. The bucketed-aware
    * rewrite ([[graft.engine.Store.compactBucketed]]) keeps the bucket
    * metadata and bucket-id assignment, so the probe's
    * `SelectedBucketsCount` / pushed `cell IN (…)` pruning survives
    * (IvfIndexSpec asserts it after a compact-after-appends cycle).
    * [[ivfDelete]] tombstones are folded during the rewrite and cleared
    * afterwards; a crash between the swap and the clear is harmless
    * (leftover tombstones anti-join ids no longer in the files). */
  def ivfCompact(spark: org.apache.spark.sql.SparkSession, table: String,
      path: String, nCells: Int): Unit = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(path), spark.sparkContext.hadoopConfiguration)
    // refuse over an unhealed streaming-ingest journal: compaction
    // changes the physical counts its replay classification relies on
    require(!fs.exists(new org.apache.hadoop.fs.Path(
        s"$path/${graft.ext.Dedup.StreamJournal}")),
      s"unhealed interrupted stream ingest under $path: replay the " +
        "stream before compacting")
    graft.engine.Store.compactBucketed(spark, table, s"$path/assigned",
      nCells, Seq("cell"), transform = liveRows(spark, path, _))
    fs.delete(new org.apache.hadoop.fs.Path(s"$path/deletes"), true)
  }

  /** Compact-on-rot policy for the IVF assigned table — the IVF twin of
    * [[graft.ext.Dedup.maybeCompactBandIndex]]: one recursive listing,
    * and [[ivfCompact]] only once the per-cell file rot exceeds
    * `maxFilesPerCell`. Returns true iff a compaction ran. */
  def ivfMaybeCompact(spark: org.apache.spark.sql.SparkSession,
      table: String, path: String, nCells: Int,
      maxFilesPerCell: Int = 8): Boolean = {
    require(maxFilesPerCell >= 1, "maxFilesPerCell must be >= 1")
    val files = graft.engine.Store.dataFileCount(spark, s"$path/assigned")
    if (files <= nCells.toLong * maxFilesPerCell) false
    else { ivfCompact(spark, table, path, nCells); true }
  }

  /** Re-fit the coarse quantizer of a persisted IVF index from its LIVE
    * rows and rewrite the layout under the new cells — the action
    * [[ivfDescribe]]'s `cell_skew` / `occupied_cells` columns call for,
    * and the one lifecycle step no maintenance op here covers:
    * [[ivfAppendSave]] keeps assigning against the ORIGINAL quantizer,
    * so a corpus that drifts (or grows 100×) ends up with hot cells
    * that make an nProbe=1 probe corpus-sized and empty cells that
    * waste every probe's ranking work. `nCells` may differ from the
    * current count — growing the cell count as the corpus grows is the
    * point. Tombstones are folded (the quantizer is fit on live rows
    * only) and cleared.
    *
    * Crash consistency: the new centroid frame is staged INSIDE the
    * rewritten assigned tree (`assigned__compacting/_centroids` — an
    * underscore component, invisible to parquet readers and the
    * data-file listings), so [[graft.engine.Store.compactBucketed]]'s
    * two-rename swap carries the ENTIRE retrained state as one
    * directory: no crash can publish new cells under old centroids or
    * vice versa. [[graft.engine.Store.healInterruptedSwap]] repairs a
    * torn swap to a complete tree either way, and [[finalizeRetrain]]
    * (idempotent, re-run by [[ivfLoad]]) completes the commit: register
    * the catalog table under the new bucket modulus, publish the
    * staged centroids, clear the folded tombstones. Single-writer, like
    * every mutation here.
    *
    * Fit cost is one distributed KMeans over the live corpus — the same
    * cost as the original [[ivfBuild]], run RARELY (when describe says
    * so), never per-ingest. */
  def ivfRetrain(spark: org.apache.spark.sql.SparkSession, table: String,
      path: String, nCells: Int, embCol: String = "embedding",
      seed: Long = 42L): IvfIndex =
    retrainImpl(spark, table, path, nCells, embCol, seed,
      reconstruct = raw => {
        require(raw.columns.contains(embCol),
          s"ivfRetrain: no `$embCol` column under $path/assigned — a " +
            "compressed layout stores codes, not embeddings. An " +
            "SQ-encoded index retrains via Sq.ivfSqRetrain (the decode " +
            "is a lossless-enough reconstruction; codes survive " +
            "unchanged). A PQ-encoded index retrains via " +
            "Pq.ivfPqRetrain with the raw embedding frame (residual " +
            "codes are defined against the OLD cells, so the re-fit " +
            "re-encodes from raw)")
        raw
      },
      project = _.assigned)


  /** The raw-access rebuild contract, shared by every maintenance op
    * that takes a caller-supplied raw frame ([[graft.ext.Pq.ivfPqRetrain]],
    * [[graft.ext.Sq.sqReencodeIndex]]): the frame must be KEYED
    * (duplicate ids would multiply their rows through the rebuild join —
    * probes would then return one id at two ranks) and must COVER every
    * live id (an inner join would silently drop uncovered live vectors
    * from the rewritten index; tombstoned ids may legitimately be
    * absent — the [[liveRows]] fold runs first). Both checks are one
    * pass each — offline-op cost. One implementation so the two
    * raw-access rebuilds cannot drift on the contract. */
  private[ext] def requireKeyedCovering(
      spark: org.apache.spark.sql.SparkSession, path: String,
      assigned: DataFrame, raw: DataFrame, idCol: String,
      caller: String): Unit = {
    import org.apache.spark.sql.functions.col
    require(raw.groupBy(col(idCol)).count()
        .filter(col("count") > 1).isEmpty,
      s"$caller: raw frame has duplicate $idCol rows — the rebuild " +
        "would store those vectors more than once")
    val missing = liveRows(spark, path, assigned)
      .select(col(idCol))
      .join(raw.select(col(idCol)), Seq(idCol), "left_anti").count()
    require(missing == 0L,
      s"$caller: $missing live ids under $path are missing from the " +
        "raw frame — the re-fit would silently drop them")
  }

  /** The staged-swap retrain body [[ivfRetrain]],
    * [[graft.ext.Sq.ivfSqRetrain]], and [[graft.ext.Pq.ivfPqRetrain]]
    * share. `reconstruct` gives the live frame an `embCol` to fit on
    * (identity for a raw index; SQ decodes its codes — reconstruction
    * error ≤ step/2 per dim, which the KMeans re-fit tolerates; PQ
    * joins a caller-supplied raw frame); `project` maps the freshly
    * built index to the frame to SAVE (identity/assigned for raw;
    * compressed forms strip the fit-only view and, for residual PQ,
    * re-encode against the new cells — it receives the whole
    * [[IvfIndex]] because residual encoding needs the new centroids).
    * `stagedMeta` names extra metadata frames to carry through the
    * SAME two-rename swap: each `(name, frame)` is staged inside the
    * rewritten tree as `_meta_<name>` and published by
    * [[finalizeRetrain]] to `$path/<name>` atomically-enough that no
    * crash can publish new cells under old metadata (the residual-PQ
    * codebooks problem: codes and codebooks must move together). Its
    * second argument is a READ of the frame just staged (the exact
    * bytes that will publish) — for metadata DERIVED from the new
    * codes (the r15 PQ usage baseline) without re-running the
    * projection lineage, and without callers knowing the staging-dir
    * name. The swap/commit choreography is identical for every form,
    * so the crash-window contract (spec-pinned) covers all of them by
    * construction. */
  private[ext] def retrainImpl(spark: org.apache.spark.sql.SparkSession,
      table: String, path: String, nCells: Int, embCol: String,
      seed: Long, reconstruct: DataFrame => DataFrame,
      project: IvfIndex => DataFrame,
      stagedMeta: (IvfIndex, DataFrame) => Seq[(String, DataFrame)] =
        (_, _) => Nil)
      : IvfIndex = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(path), spark.sparkContext.hadoopConfiguration)
    def p(s: String) = new org.apache.hadoop.fs.Path(s"$path/$s")
    require(!fs.exists(p(graft.ext.Dedup.StreamJournal)),
      s"unhealed interrupted stream ingest under $path: replay the " +
        "stream before retraining")
    // enter from a healthy tree: repair any prior torn swap / commit
    graft.engine.Store.healInterruptedSwap(spark, s"$path/assigned")
    finalizeRetrain(spark, table, path)
    // live rows: current files minus tombstones, old quantizer state
    // dropped (path read, not spark.table — the rewrite must not depend
    // on catalog state it is about to replace)
    val raw = reconstruct(spark.read.parquet(s"$path/assigned"))
    val live = liveRows(spark, path, raw).drop("cell")
    val newIdx = ivfBuild(live, embCol, nCells, seed)
    // bucket by the ACTUAL centroid count, not the requested one:
    // KMeans can return fewer than k centers (fewer distinct points
    // than cells), and finalizeRetrain registers the modulus from the
    // staged centroid frame's count — a mismatch would publish a wrong
    // bucket spec whose pruning silently selects the wrong file groups
    // (ADVICE r13). Bucketing by the actual count makes modulus ==
    // published count by construction; an unattended maintenance job
    // keeps running with the honest (smaller) quantizer.
    val actualCells = newIdx.cellCount.toInt
    if (actualCells != nCells)
      System.err.println(s"ivfRetrain: KMeans returned $actualCells " +
        s"centers for requested nCells=$nCells (fewer distinct live " +
        "points than cells) — publishing the actual count as the " +
        "bucket modulus")
    // stage the full retrained state as ONE directory
    val tmpTable = table + "__retraining"
    graft.engine.Store.saveBucketed(project(newIdx), tmpTable,
      s"$path/assigned__compacting", actualCells, Seq("cell"))
    spark.sql(s"DROP TABLE IF EXISTS `$tmpTable`")
    // the staged frame, read back: underscore-prefixed meta dirs
    // written below are invisible to the parquet reader, so this is
    // exactly the data that will publish
    val stagedFrame = spark.read.parquet(s"$path/assigned__compacting")
    stagedMeta(newIdx, stagedFrame).foreach { case (name, frame) =>
      frame.coalesce(1).write.mode("overwrite")
        .parquet(s"$path/assigned__compacting/_meta_$name")
    }
    newIdx.centroids.coalesce(1).write.mode("overwrite")
      .parquet(s"$path/assigned__compacting/_centroids")
    // two-rename swap, compactBucketed's discipline
    val live0 = p("assigned")
    val tmp = p("assigned__compacting")
    val old = p("assigned__old")
    if (fs.exists(old) && !fs.delete(old, true))
      throw new java.io.IOException(s"ivfRetrain: cannot clear stale $old")
    if (!fs.rename(live0, old))
      throw new java.io.IOException(s"ivfRetrain: rename $live0 -> $old failed")
    if (!fs.rename(tmp, live0)) {
      if (!fs.rename(old, live0))
        System.err.println(s"ivfRetrain: rollback $old -> $live0 also " +
          "failed; healInterruptedSwap repairs on next load")
      throw new java.io.IOException(s"ivfRetrain: rename $tmp -> $live0 failed")
    }
    if (!fs.delete(old, true))
      throw new java.io.IOException(s"ivfRetrain: cannot delete backup $old")
    finalizeRetrain(spark, table, path)
    ivfLoad(spark, table, path)
  }

  /** Complete an [[ivfRetrain]] whose assigned tree has swapped in but
    * whose commit has not finished — detectable by the staged centroid
    * frame still sitting inside the live assigned tree. Idempotent and
    * re-run by [[ivfLoad]], so every crash window after the swap heals
    * on the next load. Order matters: the catalog is re-registered
    * (from the STAGED frame's count — the new files' modulus) first;
    * staged metadata dirs (`_meta_<name>` → `$path/<name>`, e.g. the
    * residual-PQ codebooks whose codes are defined against exactly
    * these cells) publish next, while `_centroids` still marks the
    * commit as in-progress; the centroids publish after that, so a
    * crash anywhere re-enters here with each completed step an
    * idempotent skip; the tombstone clear is last and harmless to lose
    * (the rebuilt corpus contains no tombstoned ids, so leftovers
    * anti-join nothing). Returns true iff a commit completed. */
  private[graft] def finalizeRetrain(
      spark: org.apache.spark.sql.SparkSession, table: String,
      path: String): Boolean = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(path), spark.sparkContext.hadoopConfiguration)
    val staged = new org.apache.hadoop.fs.Path(s"$path/assigned/_centroids")
    if (!fs.exists(staged)) return false
    val n = spark.read.parquet(staged.toString).count().toInt
    graft.engine.Store.registerBucketedExternal(spark, table,
      s"$path/assigned", n, Seq("cell"))
    // publish any staged metadata dirs BEFORE the centroid publish:
    // while `_centroids` is still staged, a crash here re-enters this
    // block on the next load, and an already-published meta dir is
    // simply absent from the staging (idempotent skip). Publishing
    // AFTER the centroid rename would open the window this mechanism
    // exists to close — new cells live while their paired metadata
    // (e.g. residual-PQ codebooks, whose codes are defined against
    // exactly these cells) is still the old one.
    val assignedDir = new org.apache.hadoop.fs.Path(s"$path/assigned")
    fs.listStatus(assignedDir).map(_.getPath)
      .filter(_.getName.startsWith("_meta_")).foreach { m =>
        val target = new org.apache.hadoop.fs.Path(
          s"$path/${m.getName.stripPrefix("_meta_")}")
        if (fs.exists(target) && !fs.delete(target, true))
          throw new java.io.IOException(
            s"finalizeRetrain: cannot clear stale $target")
        if (!fs.rename(m, target))
          throw new java.io.IOException(
            s"finalizeRetrain: rename $m -> $target failed")
      }
    val cent = new org.apache.hadoop.fs.Path(s"$path/centroids")
    if (fs.exists(cent) && !fs.delete(cent, true))
      throw new java.io.IOException(
        s"finalizeRetrain: cannot clear stale $cent")
    if (!fs.rename(staged, cent))
      throw new java.io.IOException(
        s"finalizeRetrain: rename $staged -> $cent failed")
    fs.delete(new org.apache.hadoop.fs.Path(s"$path/deletes"), true)
    spark.catalog.refreshTable(table)
    true
  }

  /** Policy wrapper over [[ivfRetrain]], the quantizer twin of
    * [[ivfMaybeCompact]]: measure drift via [[ivfDescribe]]'s balance
    * columns and re-fit only when a threshold is crossed, so an
    * unattended maintenance job (or a streaming sink's epoch hook) can
    * call it every cycle and pay the KMeans re-fit RARELY. Triggers,
    * any one sufficient:
    *
    *  - `cell_skew > maxSkew` — a hot cell makes an nProbe=1 probe
    *    corpus-sized (live max/avg rows per occupied cell);
    *  - `occupied_cells < minOccupiedFrac · n_cells` — empty cells
    *    waste every probe's ranking work;
    *  - `targetRowsPerCell > 0` and live rows exceed
    *    `2 · targetRowsPerCell · n_cells` — the corpus outgrew the
    *    quantizer even if balanced: per-probe scan cost is rows/cell,
    *    and appends never add cells.
    *
    * On firing, the new cell count is `ceil(live / targetRowsPerCell)`
    * when a target is set (the quantizer GROWS with the corpus —
    * retrain exists precisely because appends cannot do this), else
    * the current count. Skew is computed over LIVE rows (tombstones
    * folded out — a hot cell that is entirely deleted rows needs a
    * compact, not a re-fit; describe's physical skew would over-fire).
    * Cost when NOT firing: one pruned scan of (cell, id) — the
    * describe(cellBalance) bound. Returns true iff a retrain ran. */
  def ivfMaybeRetrain(spark: org.apache.spark.sql.SparkSession,
      table: String, path: String, maxSkew: Double = 4.0,
      minOccupiedFrac: Double = 0.5, targetRowsPerCell: Long = 0L,
      embCol: String = "embedding", seed: Long = 42L): Boolean =
    retrainTrigger(spark, path, maxSkew, minOccupiedFrac,
        targetRowsPerCell) match {
      case Some(newCells) =>
        ivfRetrain(spark, table, path, newCells, embCol, seed); true
      case None => false
    }

  /** The drift policy [[ivfMaybeRetrain]] and
    * [[graft.ext.Sq.ivfSqMaybeRetrain]] share: measure, and return
    * `Some(newCellCount)` iff a trigger fired ([[ivfMaybeRetrain]]
    * documents the three triggers). Pure measurement — no mutation —
    * so both policy wrappers fire their OWN retrain form against one
    * set of thresholds. A fully-empty (or fully-tombstoned) index
    * never fires: the `occ == 0` guard runs before any aggregate
    * extraction, because max/sum over zero groups aggregate to NULL
    * and a naive getLong would NPE an unattended maintenance job
    * instead of no-oping (ADVICE r13). */
  private[ext] def retrainTrigger(spark: org.apache.spark.sql.SparkSession,
      path: String, maxSkew: Double, minOccupiedFrac: Double,
      targetRowsPerCell: Long): Option[Int] = {
    require(maxSkew > 1.0, "maxSkew must exceed 1 (1 = perfectly even)")
    require(minOccupiedFrac >= 0.0 && minOccupiedFrac <= 1.0,
      "minOccupiedFrac is a fraction")
    val nCells = spark.read.parquet(s"$path/centroids").count()
    val live = liveRows(spark, path,
      spark.read.parquet(s"$path/assigned"))
    // one pruned scan: per-cell live counts roll up to a single row
    val s = live.groupBy("cell").agg(count(lit(1)).as("n"))
      .agg(count(lit(1)).as("occ"), max("n").as("mx"), sum("n").as("rows"))
      .head
    val occ = s.getLong(0)
    if (occ == 0L) return None // empty/fully-tombstoned: nothing to fit
    val (mx, liveN) = (s.getLong(1), s.getLong(2))
    val skew = mx / (liveN.toDouble / occ)
    val outgrown = targetRowsPerCell > 0L &&
      liveN > 2L * targetRowsPerCell * nCells
    if (skew <= maxSkew && occ >= minOccupiedFrac * nCells && !outgrown)
      None
    else Some((
      if (targetRowsPerCell > 0L)
        math.max(1L, (liveN + targetRowsPerCell - 1) / targetRowsPerCell)
      else nCells).toInt)
  }

  /** Read-only observability over a persisted IVF index — the numbers an
    * operator needs to decide WHEN to act (compact? replay a crashed
    * stream? re-train a drifted quantizer?) without mutating anything.
    * Unlike [[ivfLoad]] it never heals, never refreshes the catalog, and
    * never rewrites, so it is safe to call from a monitoring job while
    * another session is mutating the index.
    *
    * Cost is metadata-bounded at any corpus size: the row count is
    * parquet footer metadata (no data pages), the centroid and tombstone
    * frames are tiny by construction, and file rot is one namenode
    * listing — the corpus is only scanned (one pruned `cell` column)
    * when `cellBalance` is requested.
    *
    * One row: `n_cells`/`dim` (quantizer shape); `physical_rows` (rows
    * in the assigned files INCLUDING rows a tombstone hides — the live
    * count needs the anti-join a probe does; with unique ids it equals
    * `physical_rows - tombstoned_ids`); `tombstoned_ids` (pending
    * [[ivfDelete]] work a compact folds away); `data_files` /
    * `files_per_cell` (append rot — [[ivfMaybeCompact]] fires above its
    * `maxFilesPerCell`); `stream_journal` (an unhealed streaming ingest
    * is pending — replay the stream before compacting); `auto_hier`
    * (whether probes default to hierarchical cell ranking,
    * [[IvfIndex.autoSuper]]).
    *
    * `cellBalance = true` appends quantizer-balance columns —
    * `occupied_cells`, `cell_rows_min`/`max`/`avg`, `cell_skew`
    * (max/avg) — from one column-pruned scan of `cell`: empty cells
    * waste probes, and a hot cell makes an nProbe=1 probe corpus-sized;
    * both say "re-train the quantizer", which no maintenance op here
    * does automatically (cells are the physical layout). */
  def ivfDescribe(spark: org.apache.spark.sql.SparkSession, path: String,
      cellBalance: Boolean = false): DataFrame = {
    import spark.implicits._
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(path), spark.sparkContext.hadoopConfiguration)
    def exists(s: String) =
      fs.exists(new org.apache.hadoop.fs.Path(s"$path/$s"))
    require(exists("assigned") && exists("centroids"),
      s"no readable IVF index under $path (an interrupted compact " +
        "leaves no live assigned dir — reopen with ivfLoad, which " +
        "heals, before describing)")
    val centroids = spark.read.parquet(s"$path/centroids")
    val nCells = centroids.count()
    val dim = centroids.select("cent").head.getSeq[Double](0).size
    val assigned = spark.read.parquet(s"$path/assigned")
    val physicalRows = assigned.count()
    val tombstoned =
      if (exists("deletes")) spark.read.parquet(s"$path/deletes").count()
      else 0L
    val files = graft.engine.Store.dataFileCount(spark, s"$path/assigned")
    val base = Seq((nCells, dim, physicalRows, tombstoned, files,
        files.toDouble / nCells, exists(graft.ext.Dedup.StreamJournal),
        nCells > AutoHierCells))
      .toDF("n_cells", "dim", "physical_rows", "tombstoned_ids",
        "data_files", "files_per_cell", "stream_journal", "auto_hier")
    if (!cellBalance) base
    else {
      // one pruned scan of the cell column; the roll-up is a single row
      // (bounded collect) appended as literals — no 1×1 join
      val s = assigned.groupBy("cell").agg(count(lit(1)).as("n"))
        .agg(count(lit(1)).as("occ"), min("n").as("mn"),
          max("n").as("mx"), avg("n").as("av")).head
      if (s.getLong(0) == 0L)
        // an empty assigned frame aggregates min/max/avg to NULL —
        // surface honest null balance columns instead of an NPE in a
        // read-only monitoring call (ADVICE r13)
        base
          .withColumn("occupied_cells", lit(0L))
          .withColumn("cell_rows_min", lit(null).cast("bigint"))
          .withColumn("cell_rows_max", lit(null).cast("bigint"))
          .withColumn("cell_rows_avg", lit(null).cast("double"))
          .withColumn("cell_skew", lit(null).cast("double"))
      else base
        .withColumn("occupied_cells", lit(s.getLong(0)))
        .withColumn("cell_rows_min", lit(s.getLong(1)))
        .withColumn("cell_rows_max", lit(s.getLong(2)))
        .withColumn("cell_rows_avg", lit(s.getDouble(3)))
        .withColumn("cell_skew", lit(s.getLong(2) / s.getDouble(3)))
    }
  }

  /** SemDeDup-shaped semantic dedup (Abbas et al. 2023): cluster the
    * corpus (here: deterministic random-hyperplane LSH buckets — at scale
    * the bucket is the storage partition key, and an IVF/KMeans cell works
    * identically), compute each cluster's centroid, keep the vector most
    * aligned with the centroid, and drop the rest of the cluster's
    * near-redundant core (`cos_centroid ≥ tau`). Low-alignment vectors
    * survive — they carry the cluster's diversity.
    *
    * Shape: the (buckets × dim) centroid frame — tiny — comes from ONE
    * explode-free aggregate pass ([[centroid]], r17: the posexplode form
    * expanded the corpus rows×dim — 12.8M rows at sf10 — to compute
    * per-row fixed-point adds, and was x73's dominant term; the native
    * vector-sum buffer moves 3·dim longs per bucket per partition
    * instead) and broadcasts back; the corpus is never exploded at all.
    * The only corpus-sized movement is the per-bucket window for the
    * keeper rank (single hash partition by bucket; at 100 TB the bucket
    * count scales with corpus size, so no hot partition).
    * Cosines are rounded at 6 digits BEFORE ranking, so the keeper choice
    * is deterministic cross-engine (ties break on id). */
  def semanticDedup(embs: DataFrame, idCol: String,
      embCol: String = "embedding", numPlanes: Int = 4, dim: Int = 64,
      tau: Double = 0.9): DataFrame =
    semanticDedupTail(
      embs.withColumn("bucket",
        lshBucket(col(embCol), hyperplanes(numPlanes, dim))),
      idCol, embCol, tau)

  /** [[semanticDedup]] with the plane count KEYED TO CORPUS SIZE —
    * the x86/x50 adaptive device ([[blockedPairsAuto]]) applied to the
    * keeper form (VERDICT r17 #4: a fixed 16-bucket registration makes
    * the per-bucket keeper window the one hot-partition risk at corpus
    * scale). planes = min q: 2^q ≥ ⌈n/targetBucket⌉, capped at
    * maxPlanes — the same integer-exact ladder as [[autoSubKeyed]]
    * (float log2 misrounds at power-of-2 boundaries; both engines must
    * agree on the plane count for the x73 oracle to hash-match), here
    * over the GLOBAL count (semanticDedup has no label blocking).
    *
    * Bucketing masks the low `planes` bits of the SHARED maxPlanes-bit
    * vector: [[hyperplanes]] draws sequentially from a fixed-seed RNG,
    * so plane i is the same array under any total count ≥ i+1, and bit
    * i of the bucket is sign(v·h_i) independently per plane — masking
    * is therefore bit-identical to bucketing with `planes` planes
    * directly (DedupSimilaritySpec pins this), and a plane-count change
    * reshuffles NO per-vector math, only which bits key the window.
    *
    * At 100 TB: expected bucket size stays ≈ targetBucket regardless of
    * corpus growth, so the keeper window never sees a corpus-sized hash
    * partition. */
  def semanticDedupAuto(embs: DataFrame, idCol: String,
      embCol: String = "embedding", targetBucket: Int = 1000,
      maxPlanes: Int = 16, dim: Int = 64, tau: Double = 0.9): DataFrame =
    // one count job over the pruned scan — a driver SCALAR (bounded by
    // construction), the same price autoSubKeyed pays for its per-label
    // counts; it keys only the plane-count ladder. Counting here is the
    // right default ONLY for table-scan inputs: a derived corpus frame
    // re-executes its whole plan for the count — callers that already
    // know the row count (a write manifest, ShardWriter's tracked
    // counts, a streaming journal) should pass it to the pre-counted
    // overload below (VERDICT r18 "what's wrong" #2).
    semanticDedupAutoCounted(embs, embs.count(), idCol, embCol,
      targetBucket, maxPlanes, dim, tau)

  /** Pre-counted [[semanticDedupAuto]]: identical keying and output for
    * the same `n`, zero count jobs — the form for corpora whose row
    * count is already known (write manifests, shard row counts). The
    * counting overload delegates here, so the two can never drift. */
  def semanticDedupAutoCounted(embs: DataFrame, n: Long, idCol: String,
      embCol: String = "embedding", targetBucket: Int = 1000,
      maxPlanes: Int = 16, dim: Int = 64, tau: Double = 0.9): DataFrame = {
    val planes = autoGlobalPlanes(n, targetBucket, maxPlanes)
    semanticDedupTail(
      embs.withColumn("bucket",
        lshBucket(col(embCol), hyperplanes(maxPlanes, dim))
          .bitwiseAND(lit((1L << planes) - 1))),
      idCol, embCol, tau)
  }

  /** Integer-exact global plane ladder: min q in [0, maxPlanes] with
    * 2^q ≥ ⌈n/targetBucket⌉ — [[autoSubKeyed]]'s CASE ladder as a
    * scalar (the count is corpus-global here, so the ladder needs no
    * Column form). */
  private[graft] def autoGlobalPlanes(n: Long, targetBucket: Int,
      maxPlanes: Int): Int = {
    val m = (n + targetBucket - 1) / targetBucket
    (0 until maxPlanes).find(q => (1L << q) >= m).getOrElse(maxPlanes)
  }

  /** Shared centroid/keeper tail of [[semanticDedup]] and
    * [[semanticDedupAuto]]: `b` arrives with the `bucket` column
    * already keyed. */
  private def semanticDedupTail(b: DataFrame, idCol: String,
      embCol: String, tau: Double): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // centroid sums quantize each float32 element to an exact DECIMAL
    // first (7 decimals ≥ float32 precision): the corpus-wide group sum
    // is order-independent — deterministic under any partitioning in
    // BOTH engines — and the mean is one fixed double division; the
    // kernel replicates the exploded decimal pipeline bit-for-bit
    // (CentroidAggSpec). isNotNull keeps the old inner-join drop for an
    // all-null-embedding bucket.
    val cent = b.groupBy("bucket").agg(centroid(col(embCol)).as("cent"))
      .filter(col("cent").isNotNull)
    val w = Window.partitionBy("bucket")
      .orderBy(col("cos_centroid").desc, col(idCol))
    // centroid self-norm computed once on the tiny (buckets × dim)
    // frame instead of per corpus row; emb·cent through the codegen
    // DotF32 (accepts float×double since round 9) instead of the
    // interpreted HOF fold — both bit-identical to the old forms
    val centN = cent.withColumn("_cnrm",
      sqrt(dotHof(col("cent"), col("cent"))))
    b.join(broadcast(centN), "bucket")
      .withColumn("cos_centroid", round(
        dot(col(embCol), col("cent")) /
          (norm(col(embCol)) * col("_cnrm")), 6))
      .withColumn("is_keeper", row_number().over(w) === 1)
      .withColumn("action",
        when(col("is_keeper") || col("cos_centroid") < tau, lit("keep"))
          .otherwise(lit("drop")))
      .select(col(idCol), col("bucket"), col("cos_centroid"),
        col("is_keeper"), col("action"))
  }

  /** IVF top-k with a DETERMINISTIC coarse quantizer: cells are an
    * existing partition column (here a label), centroids are
    * exact-decimal element means (the x73 centroid convention — the
    * corpus-wide sums are order-independent). Unlike the trained-KMeans
    * IVF ([[ivfTopK]], whose model state makes it rows-only at the
    * correctness gate), every step here is oracle-expressible, so the
    * ENTIRE sublinear search path — centroid build, cell ranking, probe
    * pruning, in-cell top-k — is hash-checked cross-engine.
    *
    * Shape at scale: the centroid frame is (cells × dim) — broadcast;
    * cell ranking touches only that frame; the probe join prunes the
    * corpus scan to `nProbe` cells BEFORE any per-vector distance math;
    * the in-cell search is [[bruteForceTopK]]'s shuffle-free scan +
    * TakeOrdered. */
  def ivfDeterministicTopK(embs: DataFrame, query: DataFrame, idCol: String,
      labelCol: String, embCol: String = "embedding", nProbe: Int = 2,
      k: Int = 10, pred: Option[Column] = None): DataFrame = {
    val q = broadcast(query.select(col(embCol).as("q_emb"))
      .withColumn("_qn", norm(col("q_emb"))))
    // the x73 centroid convention, explode-free since r17 ([[centroid]] —
    // bit-identical to the posexplode decimal pipeline, CentroidAggSpec)
    val cent = embs.groupBy(col(labelCol))
      .agg(centroid(col(embCol)).as("cent"))
      .filter(col("cent").isNotNull)
    val probed = cent.crossJoin(q)
      .withColumn("cell_cos", round(
        dotHof(col("cent"), col("q_emb")) /
          (sqrt(dotHof(col("cent"), col("cent"))) * norm(col("q_emb"))), 6))
      .orderBy(col("cell_cos").desc, col(labelCol)).limit(nProbe)
      .select(col(labelCol))
    // pred filters the in-cell scan only — centroids above come from
    // the FULL corpus, the ivfProbe filtered-search rule (x93 mirrors
    // exactly this split cross-engine)
    pred.foldLeft(embs.join(broadcast(probed), labelCol))(_.filter(_))
      .crossJoin(q)
      .withColumn("cos", round(
        dot(col(embCol), col("q_emb")) / (norm(col(embCol)) * col("_qn")), 6))
      .orderBy(col("cos").desc, col(idCol))
      .select(col(idCol), col(labelCol), col("cos"))
      .limit(k)
  }

  /** All-pairs cosine within a blocking column (IVF-style: the block is the
    * coarse cell; here the `labelCol`). Join is equi on the block — never a
    * full cartesian.
    *
    * `subPlanes > 0` conjoins a secondary random-hyperplane LSH bucket
    * ([[lshBucket]], deterministic planes) into the join key: work within a
    * hot label drops from `n²` to `Σ bucketᵢ²` (expected `n²/2^subPlanes` on
    * spread-out data) — the guard for the 100 TB case where one label holds
    * millions of vectors and intra-label all-pairs goes quadratic. The
    * trade, as with any LSH blocking: a pair split across sub-buckets is
    * missed; high-cosine pairs agree on most hyperplane signs, so recall
    * loss concentrates on pairs near the threshold. `subPlanes = 0`
    * preserves exact within-label semantics.
    *
    * `maxPairs > 0` ARMS the output-scale fail-fast (see
    * [[estimateBlockedPairs]]): the candidate pair space is estimated
    * from bucket sizes BEFORE the join materializes anything, and a
    * corpus whose answer is itself quadratic refuses loudly naming
    * [[semanticDedup]] as the linear-output remedy — the
    * `ivfSqMaybeReencode` misconfig-refusal pattern applied to output
    * scale (VERDICT r15 #4). Default 0 = disarmed: interactive calls
    * and the registered queries pay nothing. */
  def blockedPairs(embs: DataFrame, idCol: String, labelCol: String,
      embCol: String = "embedding", minCos: Double = 0.4,
      subPlanes: Int = 0, dim: Int = 64, maxPairs: Long = 0L): DataFrame = {
    val keyed =
      (if (subPlanes > 0) embs.withColumn("_sub",
        lshBucket(col(embCol), hyperplanes(subPlanes, dim)))
      else embs.withColumn("_sub", lit(0L)))
        // per-ROW norm, computed once before the pair join: the naive
        // per-PAIR cosine folds each side's self-dot again for every
        // pair — 3 dim-length folds on the quadratic path where 1
        // suffices. Bit-identical values (same fold, same op order);
        // the oracle's `norms` CTE has always had this shape.
        .withColumn("_nrm", norm(col(embCol)))
    pairsFromKeyed(keyed, idCol, labelCol, embCol, minCos, maxPairs)
  }

  /** Candidate-pair-space size of a (label, sub)-keyed frame:
    * `Σ_buckets n_b·(n_b−1)/2` — the EXACT number of (id_a < id_b)
    * rows the pair join will score, and an upper bound on the true
    * pair output. One cheap aggregate over the keyed frame (never the
    * pairs themselves) — this is the pre-explosion estimate the
    * `maxPairs` fail-fast reads, cheap at any corpus size because it
    * never leaves O(buckets). */
  private def candidatePairCount(keyed: DataFrame, labelCol: String)
      : Long = {
    // n·(n−1) in DECIMAL(38,0), not LONG: past ~3.04e9 rows per bucket
    // the Long product wraps NEGATIVE (non-ANSI arithmetic), the sum
    // follows, and `est <= maxPairs` would pass trivially — the guard
    // failing OPEN at exactly the scale it exists for (review r16).
    // 38 digits hold the worst case ((9.2e18)² ≈ 8.5e37); the halving
    // is exact (n·(n−1) is even) and done driver-side in BigInteger.
    val r = keyed.groupBy(col(labelCol), col("_sub"))
      .agg(count(lit(1)).as("_nb"))
      .agg(sum(col("_nb").cast(DecimalType(38, 0)) * (col("_nb") - lit(1L)))
          .as("_s"),
        count(lit(1)).as("_buckets")).head
    if (r.getLong(1) == 0L) 0L // no buckets at all: zero candidates
    else if (r.isNullAt(0)) Long.MaxValue // decimal overflow: fail CLOSED
    else {
      val half = r.getDecimal(0).toBigInteger.shiftRight(1)
      if (half.compareTo(java.math.BigInteger.valueOf(Long.MaxValue)) > 0)
        Long.MaxValue // more candidate pairs than a Long can count
      else half.longValue
    }
  }

  /** Public pre-flight for the pair family: how many candidate pairs
    * would [[blockedPairs]] (`subPlanes`) score on this corpus? Lets an
    * unattended pipeline size `maxPairs` / choose [[semanticDedup]]
    * BEFORE launching the join. Same bucketing, same count the armed
    * guard reads. */
  def estimateBlockedPairs(embs: DataFrame, labelCol: String,
      embCol: String = "embedding", subPlanes: Int = 0,
      dim: Int = 64): Long = {
    val keyed =
      if (subPlanes > 0) embs.withColumn("_sub",
        lshBucket(col(embCol), hyperplanes(subPlanes, dim)))
      else embs.withColumn("_sub", lit(0L))
    candidatePairCount(keyed, labelCol)
  }

  /** Shared pair-join tail of [[blockedPairs]] / [[blockedPairsAuto]]
    * over a (label, _sub, _nrm)-keyed frame — including the armed
    * output guard: `maxPairs > 0` pays ONE O(buckets) aggregate to
    * price the candidate space, then refuses a quadratic OUTPUT before
    * the join materializes a single pair. The plan below the guard is
    * byte-identical to the pre-r16 inline form. */
  private def pairsFromKeyed(keyed: DataFrame, idCol: String,
      labelCol: String, embCol: String, minCos: Double,
      maxPairs: Long): DataFrame = {
    if (maxPairs > 0) {
      val est = candidatePairCount(keyed, labelCol)
      require(est <= maxPairs,
        s"blockedPairs: candidate pair space is $est pairs > maxPairs=" +
          s"$maxPairs — on a tight-cluster corpus the TRUE pair set is " +
          "itself quadratic in cluster size, and no candidate scheme can " +
          "emit it sub-quadratically; the sink OOMs long after the plan " +
          "behaves. Remedies: semanticDedup (linear keeper-per-cluster " +
          "output, no pair materialization — the scale path), tighter " +
          "sub-bucketing (subPlanes / smaller targetBucket) if the " +
          "blocks are internally diverse, or raise maxPairs if the " +
          "output really is wanted")
    }
    val a = keyed.select(col(labelCol), col("_sub"), col(idCol).as("id_a"),
      col(embCol).as("emb_a"), col("_nrm").as("_nrm_a"))
    val b = keyed.select(col(labelCol), col("_sub"), col(idCol).as("id_b"),
      col(embCol).as("emb_b"), col("_nrm").as("_nrm_b"))
    a.join(b, Seq(labelCol, "_sub")).filter(col("id_a") < col("id_b"))
      .withColumn("cos", round(
        dot(col("emb_a"), col("emb_b")) / (col("_nrm_a") * col("_nrm_b")), 6))
      .filter(col("cos") >= minCos)
      .select(col(labelCol), col("id_a"), col("id_b"), col("cos"))
  }

  /** [[blockedPairs]] with PER-LABEL adaptive sub-bucketing — the scale
    * form. A fixed `subPlanes` divides every label's n² by the same
    * 2^planes; but when the blocking key's cardinality doesn't grow with
    * the corpus (fixed label vocabularies, coarse languages/sources),
    * per-label n grows linearly and pairs quadratically — measured on the
    * sf0.1→sf1 decade (10 fixed labels): x50's fixed-2-plane pair join
    * grew 43× on 10× rows. Here each label gets just enough planes to
    * bound its EXPECTED bucket size at `targetBucket`:
    * `planes_l = ceil(log2(n_l / targetBucket))`, clipped to
    * [0, maxPlanes] — sub-quadratic total work on any label-size
    * distribution, while labels at or under the target keep EXACT
    * all-pairs semantics (zero planes, no recall loss where brute force
    * is affordable — most labels, in a heavy-tailed world).
    *
    * Mechanics: one tiny per-label count aggregate broadcasts back; every
    * row computes the full `maxPlanes`-bit [[lshBucket]] and keeps its
    * label's low `planes_l` bits (mask = 2^planes_l − 1) — both sides of
    * a pair derive the same per-label mask, so the (label, sub) equi-join
    * is unchanged. Identical vectors share all sign bits and can never
    * split; the recall trade concentrates near the threshold exactly as
    * with fixed planes.
    *
    * Measured honestly (`tools/AutoPlanesBench`): on the harness
    * embeddings at sf0.1 (200/label, under target) auto is EXACT and
    * finds 86 true pairs where fixed-2-planes finds 29 — a 66% recall
    * loss the adaptive form eliminates where brute force is affordable.
    * At sf1 (2 000/label) auto ≈ fixed in wall-clock: these labels are
    * single tight clusters, hyperplane signs agree, buckets don't split —
    * and the TRUE pair set at cos ≥ 0.4 is itself ~13M pairs, i.e. the
    * OUTPUT is quadratic, which no candidate scheme can emit
    * sub-quadratically. For that corpus shape the scale path is
    * [[semanticDedup]] (keeper per cluster, linear, no pair
    * materialization); sub-bucketing — fixed or adaptive — pays off on
    * labels that are internally diverse. */
  def blockedPairsAuto(embs: DataFrame, idCol: String, labelCol: String,
      embCol: String = "embedding", minCos: Double = 0.4,
      targetBucket: Int = 1000, maxPlanes: Int = 16,
      dim: Int = 64, maxPairs: Long = 0L): DataFrame =
    pairsFromKeyed(
      autoSubKeyed(embs, labelCol, embCol, targetBucket, maxPlanes, dim)
        .withColumn("_nrm", norm(col(embCol))),
      idCol, labelCol, embCol, minCos, maxPairs)

  /** [[estimateBlockedPairs]] for the ADAPTIVE bucketing — prices the
    * exact candidate space [[blockedPairsAuto]] would join under the
    * same `targetBucket`/`maxPlanes` (shared keying, can't drift). */
  def estimateBlockedPairsAuto(embs: DataFrame, labelCol: String,
      embCol: String = "embedding", targetBucket: Int = 1000,
      maxPlanes: Int = 16, dim: Int = 64): Long =
    candidatePairCount(
      autoSubKeyed(embs, labelCol, embCol, targetBucket, maxPlanes, dim),
      labelCol)

  /** The per-label adaptive sub-bucket keying shared by
    * [[blockedPairsAuto]] and [[estimateBlockedPairsAuto]].
    *
    * planes_l = ceil(log2(n_l / target)) — computed INTEGER-EXACT via
    * `m = ceildiv(n, target); planes = min q: 2^q ≥ m` (equivalent for
    * integer n, target: 2^q ≥ n/t ⟺ 2^q·t ≥ n ⟺ 2^q ≥ ⌈n/t⌉ since 2^q
    * is integral). A float log2 could misround at exact power-of-2
    * boundaries, and both engines must agree on every label's plane
    * count for the x86 oracle to hash-match — the CASE ladder below is
    * pure integer comparison, so the DuckDB oracle mirrors it
    * verbatim. */
  private def autoSubKeyed(embs: DataFrame, labelCol: String,
      embCol: String, targetBucket: Int, maxPlanes: Int,
      dim: Int): DataFrame = {
    val mCol = floor((col("_n") + lit(targetBucket - 1)) / lit(targetBucket))
    val ladder = (0 until maxPlanes).foldRight(lit(maxPlanes): Column) {
      (q, rest) => when(mCol <= (1L << q), q).otherwise(rest)
    }
    val counts = embs.groupBy(col(labelCol))
      .agg(count(lit(1)).as("_n"))
      .withColumn("_planes", ladder)
      .select(col(labelCol), col("_planes"))
    embs.join(broadcast(counts), Seq(labelCol))
      .withColumn("_bits", lshBucket(col(embCol), hyperplanes(maxPlanes, dim)))
      // low planes_l bits of the shared bit vector; 2^p fits a long for
      // p ≤ 16 ≤ 62
      .withColumn("_sub", col("_bits")
        .bitwiseAND(pow(lit(2.0), col("_planes")).cast("long") - 1))
  }
}
