package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
import graft.ext.Dedup

/** Streaming near-duplicate detection ON INGEST — the stateful streaming
  * twin of the batch MinHash-LSH pipeline (x31): every arriving document
  * is checked against everything already ingested, in one pass, with
  * bounded state.
  *
  * Mechanics (same constants and hash family as [[Dedup]], so stream and
  * batch agree):
  *  1. per-row MinHash signature ([[Dedup.signatureArray]] — no explode,
  *     no shuffle, spec-pinned equal to the batch aggregate);
  *  2. band the signature (`bands`×`rows`) and explode to one row per
  *     (band_idx, band_hash) — a doc lives in `bands` buckets;
  *  3. `flatMapGroupsWithState` keyed by bucket: state holds the
  *     signatures previously admitted to that bucket; each new doc is
  *     compared against them with the STANDARD MinHash estimator
  *     (fraction of agreeing signature components ≈ Jaccard) and emits a
  *     hit per prior doc with estimate ≥ `minEstJaccard`.
  *
  * Scale/state bounds: a bucket admits at most `maxBucket` docs — the
  * streaming form of the batch mega-bucket guard. Batch DROPS over-cap
  * buckets retroactively; a stream cannot un-emit, so it stops ADMITTING
  * instead (first `maxBucket` docs per bucket participate) — the same
  * boilerplate-bucket protection, shifted to admission order; this is the
  * one documented divergence from x31. State per bucket ≤ maxBucket ×
  * (numHashes+1) longs. Estimator vs exact: the stream scores
  * sig-agreement (±1/√numHashes), where batch x31 verifies exact Jaccard
  * — the standard streaming trade, also spec-pinned.
  *
  * A pair colliding in several bands emits once per band;
  * [[distinctPairs]] is the batch-side dedup for sinks that need unique
  * pairs (doing it in-stream would mean a second unbounded-state stage —
  * the audit-sink consumer is the right owner of that dedup).
  */
object StreamingNearDup {

  final case class SigRow(bandIdx: Int, bandHash: String, docId: Long,
      sig: Seq[Long])
  final case class BucketState(docs: List[(Long, Seq[Long])])
  final case class NearDupHit(id_a: Long, id_b: Long, est_jaccard: Double,
      band_idx: Int)

  implicit private val keyEnc: Encoder[(Int, String)] =
    Encoders.tuple(Encoders.scalaInt, Encoders.STRING)
  implicit private val rowEnc: Encoder[SigRow] = Encoders.product[SigRow]
  implicit private val stEnc: Encoder[BucketState] =
    Encoders.product[BucketState]
  implicit private val outEnc: Encoder[NearDupHit] =
    Encoders.product[NearDupHit]

  /** Banded signature rows for a (streaming or batch) document frame. */
  def bandedSignatures(docs: DataFrame, idCol: String, textCol: String,
      numHashes: Int = 16, bands: Int = 4, rows: Int = 4): Dataset[SigRow] = {
    // loud, like the batch twin (Dedup.bandedRows fails on a missing m_i
    // column): out-of-range bands would read element_at past the
    // signature array as NULL, concat_ws would drop the nulls, and every
    // document would silently collide into one global bucket per extra
    // band — state fills to maxBucket, estimator burns O(maxBucket)
    // comparisons per doc, then admission silently stops
    require(bands * rows <= numHashes,
      s"bands*rows ($bands*$rows) exceeds numHashes ($numHashes): " +
        "the banding would read past the signature")
    val bandCols = (0 until bands).map { j =>
      concat_ws("|", (j * rows until (j + 1) * rows)
        .map(i => element_at(col("sig"), i + 1).cast("string")): _*)
    }
    docs
      // token-count guard, not a kernel-based one: a filter on
      // size(shingleHashArray(...)) makes FilterExec hash every doc a
      // second time (see Dedup.signatureColumns, r19); ≥3 tokens admits
      // exactly the rows that yield a k=3 shingle
      .filter(col(textCol).isNotNull &&
        size(split(col(textCol), " ")) >= 3)
      .select(col(idCol).cast("long").as("docId"),
        Dedup.signatureArray(col(textCol), numHashes).as("sig"))
      .select(col("docId"), col("sig"),
        posexplode(array(bandCols: _*)).as(Seq("bandIdx", "bandHash")))
      .as[SigRow]
  }

  /** Near-dup hit stream. Use with `outputMode("append")`. Within one
    * micro-batch, docs are admitted in docId order (deterministic under
    * shuffled arrival); each doc is also compared against earlier docs of
    * its own batch, so a batch boundary never hides a pair. */
  def pairsStream(docs: DataFrame, idCol: String, textCol: String,
      numHashes: Int = 16, bands: Int = 4, rows: Int = 4,
      minEstJaccard: Double = 0.8,
      maxBucket: Int = Dedup.DefaultMaxBucket): Dataset[NearDupHit] =
    bandedSignatures(docs, idCol, textCol, numHashes, bands, rows)
      .groupByKey(r => (r.bandIdx, r.bandHash))
      .flatMapGroupsWithState[BucketState, NearDupHit](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case ((bandIdx, _), batch, state) =>
          var admitted = state.getOption.map(_.docs).getOrElse(Nil)
          val out = List.newBuilder[NearDupHit]
          batch.toSeq.sortBy(_.docId).foreach { r =>
            if (admitted.size < maxBucket &&
                !admitted.exists(_._1 == r.docId)) {
              admitted.foreach { case (prevId, prevSig) =>
                val agree = prevSig.iterator.zip(r.sig.iterator)
                  .count { case (x, y) => x == y }
                val est = agree.toDouble / numHashes
                if (est >= minEstJaccard)
                  out += NearDupHit(math.min(prevId, r.docId),
                    math.max(prevId, r.docId), est, bandIdx)
              }
              admitted = (r.docId, r.sig) :: admitted
            }
          }
          state.update(BucketState(admitted))
          out.result().iterator
      }

  /** Batch-side pair dedup for collected hits (a pair found in several
    * bands reports its best estimate once). */
  def distinctPairs(hits: DataFrame): DataFrame =
    hits.groupBy("id_a", "id_b")
      .agg(max(col("est_jaccard")).as("est_jaccard"))
}
