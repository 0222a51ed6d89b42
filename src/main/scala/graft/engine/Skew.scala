package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation utilities (SCALING.md): explicit salting for the cases
  * AQE's runtime skew-join splitting doesn't reach (aggregations, and
  * first-shuffle skew on a hot key — e.g. one symbol carrying half the
  * volume of the exchange).
  *
  * Salting here is deterministic (hash of a stable tie-break column, not
  * `rand()`), so results stay reproducible run-to-run.
  */
object Skew {

  /** Deterministic salt in [0, buckets) from a stable column. */
  def salt(tieBreak: Column, buckets: Int): Column =
    pmod(hash(tieBreak), lit(buckets))

  /** Two-stage salted aggregation: partial-aggregate on (key, salt), then
    * final-aggregate on key. Turns one hot key's single reducer into
    * `buckets` parallel partials. Only aggregates with an associative
    * merge qualify — pass both the partial and merge expressions.
    *
    * Example — skew-safe volume sum per symbol:
    * {{{
    * Skew.saltedAgg(df, Seq("symbol"), col("ts"), 32,
    *   partial = Seq(sum(col("volume")).as("v"), count(lit(1)).as("n")),
    *   merge   = Seq(sum(col("v")).as("volume"), sum(col("n")).as("n")))
    * }}}
    */
  def saltedAgg(df: DataFrame, keys: Seq[String], tieBreak: Column,
      buckets: Int, partial: Seq[Column], merge: Seq[Column]): DataFrame = {
    val salted = df.withColumn("_salt", salt(tieBreak, buckets))
    val part = salted.groupBy((keys.map(col) :+ col("_salt")): _*)
      .agg(partial.head, partial.tail: _*)
    part.groupBy(keys.map(col): _*).agg(merge.head, merge.tail: _*)
  }

  /** Salted broadcast-replicated join for a skewed fact against a small
    * dimension: the fact side gets a deterministic salt, the dim side is
    * exploded ×`buckets` — the classic hot-key spread when the dim is
    * small enough to replicate. With a broadcastable dim Spark's BHJ makes
    * salting unnecessary; this exists for the mid-size-dim case where a
    * shuffle join is forced but one fact key dominates. */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
      factTieBreak: Column, buckets: Int): DataFrame = {
    val saltedFact = fact.withColumn("_salt", salt(factTieBreak, buckets))
    val repDim = dim.withColumn("_salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    saltedFact.join(repDim, Seq(key, "_salt")).drop("_salt")
  }
}
