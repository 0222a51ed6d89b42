package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ext.Dedup

/** Streaming decontamination: drop documents that share ≥1 word-k-shingle
  * with a held-out benchmark set, as a STATELESS streaming filter.
  *
  * Design: the per-doc shingle set is computed inside the row
  * ([[Dedup.shingleHashArray]] — no explode), and the benchmark set is a
  * broadcast literal array probed with `arrays_overlap`. No streaming
  * aggregation, no state store, no watermark — every micro-batch is a pure
  * map, so the filter composes with any downstream sink mode and restarts
  * trivially. This is the streaming twin of x49 (same hash family ⇒ same
  * verdicts): batch decontaminates the corpus you have; this keeps the
  * contamination out of everything you ingest from now on.
  *
  * Scale: a benchmark suite is small and static (the x49 premise) — its
  * distinct shingle-hash set is collected ONCE, driver-side, from a batch
  * frame (bounded by suite size, not corpus size) and ships to executors
  * as one broadcast literal. The streamed corpus is never shuffled.
  */
object StreamingDecontaminate {

  /** Distinct shingle hashes of a (batch) benchmark frame, collected for
    * broadcast. Bounded by the benchmark suite's vocabulary. */
  def benchmarkHashes(bench: DataFrame, textCol: String,
      k: Int = 3): Array[Long] =
    bench.select(explode(Dedup.shingleHashArray(col(textCol), k)).as("h"))
      .distinct().orderBy("h")
      .collect().map(_.getLong(0))

  /** Contamination predicate: ≥ `minShared` DISTINCT shingles shared with
    * the benchmark set. `minShared = 1` uses `arrays_overlap`
    * (short-circuits on first hit); higher thresholds — the tolerance for
    * incidental phrase overlap — count via `array_intersect`. Both are
    * per-row expressions: stateless in a stream. */
  private def isContaminated(textCol: String, benchHashes: Array[Long],
      k: Int, minShared: Int) = {
    val hs = Dedup.shingleHashArray(col(textCol), k)
    val benchArr = typedLit(benchHashes.toSeq)
    if (minShared <= 1) arrays_overlap(hs, benchArr)
    else size(array_intersect(array_distinct(hs), benchArr)) >= minShared
  }

  /** Filter a (streaming or batch — identical code path) document frame
    * down to rows sharing fewer than `minShared` distinct shingles with
    * the benchmark set. */
  def clean(docs: DataFrame, textCol: String, benchHashes: Array[Long],
      k: Int = 3, minShared: Int = 1): DataFrame =
    docs.filter(!isContaminated(textCol, benchHashes, k, minShared))

  /** Convenience: contaminated rows instead (for audit sinks). */
  def contaminated(docs: DataFrame, textCol: String,
      benchHashes: Array[Long], k: Int = 3, minShared: Int = 1): DataFrame =
    docs.filter(isContaminated(textCol, benchHashes, k, minShared))
}
