package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.ext.{Dedup, Similarity}

/** Streaming maintenance of the persisted similarity indexes: the
  * `foreachBatch` sinks that turn a document / embedding stream into the
  * per-ingest index mutations the batch layer already ships
  * ([[graft.ext.Dedup.bandIndexAppend]],
  * [[graft.ext.Similarity.ivfAssign]] + `ivfAppendSave`), with
  * exactly-once semantics across micro-batch retries.
  *
  * Why exactly-once needs work here: `foreachBatch` is at-least-once — a
  * crash after the index append but before the streaming checkpoint
  * commits replays the SAME batch id on restart, and a blind re-append
  * double-counts it (the exact failure
  * [[graft.ext.Dedup.healInterruptedAppend]]'s scaladoc warns about).
  * The sinks layer two guards:
  *
  *  1. an EPOCH marker (`stream.epoch` under the index path, written
  *     atomically via staged-rename after the append commits): a replayed
  *     `batchId <= committed` is skipped outright — the common retry;
  *  2. the band index's append JOURNAL for the crash WINDOW (epoch not
  *     yet written): on replay the sink heals via
  *     [[graft.ext.Dedup.bandIndexLoad]]'s machinery and follows the
  *     disposition — `committed` ⇒ mark the epoch and skip,
  *     `not-committed` ⇒ append, `partial` ⇒ fail loudly (torn banded
  *     write: rebuild the index). The IVF sink keeps the same journal
  *     protocol with plain row counts (parquet-footer `count()`, no data
  *     scan) because no derived sizes frame exists on that side.
  *
  * Both guards assume the streaming source is REPLAYABLE (a retried
  * batch id re-delivers the same rows — true of file, Kafka-style, and
  * memory sources); that is Structured Streaming's own exactly-once
  * precondition, not a new one. One stream per index path: the epoch
  * file is the single-writer cursor, exactly like the reference's
  * monotone ingest cursor (ST1).
  *
  * Scale shape: each micro-batch pays exactly what the batch-layer
  * mutation pays — banded append = batch-sized shuffle + small sizes
  * merge, never a history scan; IVF assign = one codegen argmin pass,
  * zero row expansion — so stream ingest cost is linear in stream volume
  * and constant in index history. Run the bucketed compactions
  * ([[graft.ext.Dedup.compactBandIndex]],
  * [[graft.ext.Similarity.ivfCompact]]) on a cadence to fold the
  * one-file-per-bucket-per-batch accumulation.
  */
object IndexIngest {

  private[graft] val EpochFile = "stream.epoch"

  private def fsOf(spark: SparkSession, path: String) =
    org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(path), spark.sparkContext.hadoopConfiguration)

  /** Last committed micro-batch id for the index at `path`, -1 if none. */
  private[graft] def committedEpoch(spark: SparkSession,
      path: String): Long = {
    val fs = fsOf(spark, path)
    val p = new org.apache.hadoop.fs.Path(s"$path/$EpochFile")
    if (!fs.exists(p)) -1L
    else {
      val in = fs.open(p)
      try scala.io.Source.fromInputStream(in).mkString.trim.toLong
      finally in.close()
    }
  }

  /** Stage-and-rename epoch write: readers never observe a torn marker.
    * (The delete-before-rename window can lose the marker on a crash —
    * then the batch replays and the journal classifies it; the guard
    * pair is what makes the whole protocol exactly-once, not this file
    * alone.) */
  private def commitEpoch(spark: SparkSession, path: String,
      batchId: Long): Unit = {
    val fs = fsOf(spark, path)
    def p(s: String) = new org.apache.hadoop.fs.Path(s"$path/$s")
    val out = fs.create(p(EpochFile + ".tmp"), true)
    try out.write(batchId.toString.getBytes("UTF-8")) finally out.close()
    fs.delete(p(EpochFile), false)
    require(fs.rename(p(EpochFile + ".tmp"), p(EpochFile)),
      s"epoch commit failed under $path")
  }

  /** The default doc→signature transform for [[bandIndexSink]]: k-shingle
    * → 60-bit hash → MinHash, the exact pipeline the batch dedup queries
    * use (so stream- and batch-maintained indexes are bit-identical). */
  def docSigs(idCol: String, textCol: String, numHashes: Int = 16,
      k: Int = 3): DataFrame => DataFrame =
    docs => Dedup.minhashSignatures(
      Dedup.hashedShingles(docs, idCol, textCol, k), idCol, numHashes)

  /** `foreachBatch` sink maintaining a persisted LSH band index from a
    * document stream. The index must exist ([[graft.ext.Dedup.bandIndexSave]])
    * before the stream starts — the quantizer-free LSH side has no fit
    * step, so "exists" just means an initial (possibly empty) save.
    *
    * {{{
    * docsStream.writeStream
    *   .foreachBatch(IndexIngest.bandIndexSink(
    *     IndexIngest.docSigs("doc_id", "text"), "doc_id", tbl, dir))
    *   .option("checkpointLocation", ckpt).start()
    * }}}
    */
  def bandIndexSink(toSigs: DataFrame => DataFrame, idCol: String,
      table: String, path: String, nBuckets: Int = 32, bands: Int = 4,
      rows: Int = 4): (DataFrame, Long) => Unit = { (batch, batchId) =>
    val spark = batch.sparkSession
    if (batchId > committedEpoch(spark, path)) {
      val fs = fsOf(spark, path)
      val journaled = fs.exists(
        new org.apache.hadoop.fs.Path(s"$path/append.journal"))
      val replayCommitted = journaled && {
        // crash inside the previous attempt of (usually) THIS batch:
        // heal, then follow the disposition instead of blindly appending
        Dedup.healInterruptedAppend(spark, table, path) match {
          case "committed" => true
          case "not-committed" => false
          case other => throw new IllegalStateException(
            s"band-index stream ingest under $path: healed disposition " +
              s"'$other' — torn banded write, rebuild the index")
        }
      }
      if (!replayCommitted)
        Dedup.bandIndexAppend(toSigs(batch), idCol, table, path,
          nBuckets, bands, rows)
      commitEpoch(spark, path, batchId)
    }
  }

  /** `foreachBatch` sink maintaining a persisted IVF index from an
    * embedding stream: re-fit-free [[graft.ext.Similarity.ivfAssign]]
    * (codegen argmin against the saved centroids) + bucketed append. The
    * index must be built and saved ([[graft.ext.Similarity.ivfBuild]] /
    * `ivfSave`) before the stream starts — the coarse quantizer is the
    * offline artifact the whole IVF contract revolves around.
    *
    * Same exactly-once protocol as [[bandIndexSink]]; the journal
    * carries `<preRows> <batchRows>` where both are metadata-only
    * parquet counts. */
  def ivfSink(idCol: String, embCol: String, table: String, path: String,
      nCells: Int): (DataFrame, Long) => Unit = { (batch, batchId) =>
    val spark = batch.sparkSession
    if (batchId > committedEpoch(spark, path)) {
      val fs = fsOf(spark, path)
      def p(s: String) = new org.apache.hadoop.fs.Path(s"$path/$s")
      val replayCommitted = fs.exists(p("append.journal")) && {
        val in = fs.open(p("append.journal"))
        val journal =
          try scala.io.Source.fromInputStream(in).mkString.trim
          finally in.close()
        val actual = spark.table(table).count()
        fs.delete(p("append.journal"), false)
        journal.split(' ') match {
          case Array(pre, n) if actual == pre.toLong + n.toLong => true
          case Array(pre, _) if actual == pre.toLong => false
          case _ => throw new IllegalStateException(
            s"ivf stream ingest under $path: assigned row count $actual " +
              "matches neither pre nor pre+batch — torn append, rebuild " +
              "or ivfCompact the index")
        }
      }
      if (!replayCommitted) {
        val index = Similarity.ivfLoad(spark, table, path)
        val assigned = Similarity.ivfAssign(index, batch, idCol, embCol)
        val pre = spark.table(table).count()
        val batchN = batch.count()
        val out = fs.create(p("append.journal"), true)
        try out.write(s"$pre $batchN".getBytes("UTF-8"))
        finally out.close()
        Similarity.ivfAppendSave(assigned, table, path, nCells)
        fs.delete(p("append.journal"), false)
      }
      commitEpoch(spark, path, batchId)
    }
  }
}
