package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import graft.ext.Dedup

/** The composed corpus-ingest pipeline — the production shape that turns
  * a raw document stream into a curated, deduplicated store:
  *
  *   stream → decontaminate (stateless filter, broadcast benchmark set)
  *          → in-batch near-dup keepers (x44's connected-components form)
  *          → DELTA dedup against everything previously admitted (x67's
  *            cross-frame LSH — batch×store bands, never store×store)
  *          → idempotent append.
  *
  * Built on `foreachBatch` rather than a stateful operator chain: delta
  * dedup needs the admitted CORPUS as the right side of a join, which is
  * exactly what a store table is and exactly what unbounded operator
  * state is not (the per-bucket admission cap of [[StreamingNearDup]] is
  * the stateful alternative when an audit stream, not a store, is the
  * consumer). Each micro-batch costs: one pass over the batch + an LSH
  * probe of the stored SIGNATURES (16 ints/doc, column-pruned scan) +
  * re-shingling only the candidate matches — linear in the batch,
  * constant-ish in history (the x67 argument).
  *
  * Exactly-once: the store is partitioned by `batch_id` and written with
  * dynamic partition OVERWRITE — a replayed micro-batch rewrites its own
  * partition instead of double-appending (same device as
  * `Store.upsertSave`). Signatures are persisted alongside the text
  * (m0..m15), so history is never re-hashed.
  */
object StreamingCorpusIngest {

  private val sigCols = (0 until 16).map(i => s"m$i")

  /** One micro-batch of the pipeline (public: callable on any batch frame
    * with columns (doc_id, text) — the stream wrapper below just wires it
    * into foreachBatch). Returns the number of admitted docs. */
  def ingestBatch(batch: DataFrame, storePath: String,
      benchHashes: Array[Long], batchId: Long,
      minJaccard: Double = 0.8): Long = {
    val spark = batch.sparkSession
    // scoped cleanup (snapshot-before, unpersist-only-new): every cache/
    // checkpoint staged below is released after the batch, WITHOUT
    // touching persisted RDDs owned by anything else on the session — a
    // global getPersistentRDDs sweep here would delete a concurrent
    // job's localCheckpoint blocks, which (lineage truncated) cannot be
    // recomputed
    Dedup.withRddCleanup(spark) {
    val cleaned = StreamingDecontaminate
      .clean(batch.select("doc_id", "text"), "text", benchHashes)
      .cache()
      // in-batch dedup: keep each near-dup cluster's min id (x44 form)
      val sh = Dedup.hashedShingles(cleaned, "doc_id", "text")
      val sigs = Dedup.minhashSignatures(sh, "doc_id", 16).cache()
      val inPairs = Dedup.jaccardVerify(
          Dedup.lshCandidates(sigs, "doc_id"), sh, "doc_id")
        .filter(col("jaccard") >= minJaccard).select("id_a", "id_b")
      val drop = Dedup.connectedKeepers(inPairs)
        .filter(col("id") =!= col("keeper")).select(col("id").as("doc_id"))
      val batchKeepers = cleaned.join(drop, Seq("doc_id"), "left_anti")
      val keeperSigs = sigs.join(drop, sigs("doc_id") === drop("doc_id"),
        "left_anti")

      // delta dedup vs the store's persisted signatures (if any history).
      // The CURRENT batch id is excluded from the history side: on a
      // foreachBatch REPLAY the store already holds this batch's own
      // first-attempt rows, and without the exclusion every doc would
      // "near-dup" itself and the replay would overwrite the partition
      // with nothing (exactly-once turning into exactly-zero).
      val survivors =
        if (!storeExists(spark, storePath)) batchKeepers
        else {
          val history = spark.read.parquet(storePath)
            .filter(col("batch_id") =!= lit(batchId))
          val oldSigs = history
            .select((col("doc_id") +: sigCols.map(col)): _*)
          val cands = Dedup.lshCandidatesAcross(keeperSigs, oldSigs, "doc_id")
            .select(col("id_new").as("id_a"), col("id_old").as("id_b"))
            .cache()
          val oldCandIds = cands.select(col("id_b").as("doc_id")).distinct()
          // verify against stored TEXT, re-shingled for candidates only
          val oldShCand = Dedup.hashedShingles(
            history.select("doc_id", "text")
              .join(oldCandIds, Seq("doc_id"), "left_semi"), "doc_id", "text")
          val newShCand = Dedup.hashedShingles(
            batchKeepers.join(
              cands.select(col("id_a").as("doc_id")).distinct(),
              Seq("doc_id"), "left_semi"), "doc_id", "text")
          val dupNew = Dedup.jaccardVerify(cands,
              oldShCand.unionByName(newShCand), "doc_id")
            .filter(col("jaccard") >= minJaccard)
            .select(col("id_a").as("doc_id")).distinct()
          batchKeepers.join(dupNew, Seq("doc_id"), "left_anti")
        }

      // materialized ONCE: the count below and the partition write would
      // otherwise each re-run the whole delta-dedup pipeline (history
      // LSH probe + candidate re-shingle + Jaccard joins) — the same
      // double-execution IndexIngest.bandIndexSink checkpoints away
      val admitted = survivors
        .join(keeperSigs, Seq("doc_id"), "left")
        .na.fill(Dedup.P, sigCols) // <k-token docs: neutral signature
        .withColumn("batch_id", lit(batchId))
        .localCheckpoint()
      val n = admitted.count()
      val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
      spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
      try admitted.write.mode("overwrite").partitionBy("batch_id")
        .parquet(storePath)
      finally prev match {
        case Some(v) =>
          spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
        case None =>
          spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
      }
      n
    }
  }

  /** Wire [[ingestBatch]] into a streaming query. `docs` must expose
    * (doc_id, text). */
  def ingest(docs: DataFrame, storePath: String, benchHashes: Array[Long],
      checkpoint: String, minJaccard: Double = 0.8): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        ingestBatch(batch, storePath, benchHashes, id, minJaccard); ()
      }
      .start()

  /** "History exists" = at least one COMMITTED data file. A bare
    * exists+nonEmpty check counted crash debris (`_temporary` trees,
    * lone `_SUCCESS`) as history, sending the retry of a crashed first
    * batch into `spark.read.parquet` on a dataless directory — an
    * unrecoverable schema-inference crash-loop instead of the no-history
    * branch that would heal it. `Store.dataFileCount` skips
    * hidden-prefixed paths, matching Spark's own data-file convention. */
  private def storeExists(spark: SparkSession, path: String): Boolean =
    graft.engine.Store.dataFileCount(spark, path) > 0
}
