package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range / interval joins as hash equi-joins (never BroadcastNestedLoop).
  *
  * The reference's only interval logic is the coverage containment probe
  * (database_handler.py:296-298), which [[Coverage.probe]] handles via a
  * broadcast equi-join. These operators generalize to the case where
  * NEITHER side is broadcastable — two large interval/event tables — which
  * a naive `a.join(b, rangeCond)` plans as a BroadcastNestedLoopJoin (or a
  * cartesian) and dies at scale.
  *
  * The standard fix, applied here: pre-key both sides on a coarse time
  * bucket of width `bucketMs`. An interval explodes to the buckets it
  * spans; a point maps to its single bucket; the join becomes
  * `(keys..., bucket)` hash equi-join with the range condition demoted to a
  * cheap post-join filter. Shuffle volume grows by the average
  * span/bucketMs ratio (pick bucketMs ≈ typical interval length, so ≤2
  * replicas per interval), and the plan is an ordinary SMJ/SHJ that
  * partitions, spills, and AQE-balances like any other join.
  */
object RangeJoin {

  /** Point-in-interval join: rows of `points` matched to the rows of
    * `intervals` whose half-open [startMs, endMs) contains them, with an
    * equi-key prefix (`keys`). Each matching pair emerges exactly once —
    * the point's bucket is unique, so no dedup pass is needed. */
  def pointInInterval(intervals: DataFrame, points: DataFrame,
      keys: Seq[String], startMsCol: String, endMsCol: String,
      pointMsCol: String, bucketMs: Long): DataFrame = {
    val lastBucket = // empty intervals still need a non-empty, valid sequence
      greatest(floor((col(endMsCol) - 1) / bucketMs), floor(col(startMsCol) / bucketMs))
    val iv = intervals.withColumn("_graft_rj_bucket",
      explode(sequence(floor(col(startMsCol) / bucketMs).cast("long"),
        lastBucket.cast("long"))))
    val pt = points.withColumn("_graft_rj_bucket",
      floor(col(pointMsCol) / bucketMs).cast("long"))
    iv.join(pt, (keys :+ "_graft_rj_bucket").toSeq)
      .filter(col(pointMsCol) >= col(startMsCol) &&
        col(pointMsCol) < col(endMsCol))
      .drop("_graft_rj_bucket")
  }

  /** Interval-overlap join between two interval tables (half-open ranges,
    * overlap iff aStart < bEnd ∧ bStart < aEnd), equi-keyed on `keys`.
    * Both sides explode to spanned buckets; a pair that shares several
    * buckets is kept only in the bucket containing the overlap's start
    * (`max(aStart, bStart)`) — each pair emerges exactly once with no
    * distinct pass. */
  def intervalOverlap(left: DataFrame, right: DataFrame, keys: Seq[String],
      lStartCol: String, lEndCol: String, rStartCol: String, rEndCol: String,
      bucketMs: Long): DataFrame = {
    def burst(df: DataFrame, s: String, e: String) =
      df.withColumn("_graft_rj_bucket",
        explode(sequence(floor(col(s) / bucketMs).cast("long"),
          greatest(floor((col(e) - 1) / bucketMs), floor(col(s) / bucketMs))
            .cast("long"))))
    burst(left, lStartCol, lEndCol)
      .join(burst(right, rStartCol, rEndCol), (keys :+ "_graft_rj_bucket").toSeq)
      .filter(col(lStartCol) < col(rEndCol) && col(rStartCol) < col(lEndCol) &&
        col("_graft_rj_bucket") === floor(greatest(col(lStartCol), col(rStartCol)) / bucketMs)
          .cast("long"))
      .drop("_graft_rj_bucket")
  }
}
