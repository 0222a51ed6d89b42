package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Lexical retrieval + distribution-matching selection over a document
  * corpus — the query side of a training-data pipeline (find the docs
  * that look like X) and its data-selection twin (weight the corpus
  * toward a target distribution, DSIR-style).
  *
  * Scale shapes:
  *  - [[bm25TopK]]: the query's term list is a literal `isin` filter, so
  *    the corpus scan keeps only rows containing a query term (predicate
  *    prunes at the scan); doc stats are one scalar-aggregate broadcast;
  *    per-term df is a ≤|q|-row broadcast. Nothing corpus-sized shuffles
  *    except the (doc, term)→tf partial agg over the MATCHING docs only.
  *  - [[dsirWeights]] / [[dsirWeightsSlice]]: both feature distributions
  *    are bounded by the hashed dimension (`dim` rows), so they
  *    broadcast; scoring is a map-side join — per-doc cost linear in its
  *    features, corpus never shuffled (the feature-count aggs shuffle
  *    `dim`-bounded frames). When the target is a predicate over the
  *    source, the slice form runs the feature kernel exactly twice over
  *    the corpus (one fused count pass + the scoring pass, r19).
  */
object Retrieval {

  /** BM25 parameters (Robertson k1/b defaults). `K1Plus1` is its own
    * literal — computing 1.2+1.0 in doubles lands on a round-to-even tie
    * that need not equal the parsed literal `2.2` the oracle uses. */
  val K1: Double = 1.2
  val K1Plus1: Double = 2.2
  val B: Double = 0.75

  /** BM25 top-k document retrieval for a literal term query.
    *
    * idf = ln((N − df + 0.5)/(df + 0.5) + 1)  (Lucene's non-negative
    * variant); per-(doc, term) contribution quantized to 8 decimals and
    * summed in exact decimal, so the per-doc score is order-independent
    * and cross-engine deterministic. Output: (idCol, n_terms, bm25),
    * score-descending, id tie-break. */
  def bm25TopK(docs: DataFrame, queryTerms: Seq[String], idCol: String,
      textCol: String = "text", k: Int = 10): DataFrame = {
    val fd = Dedup.fanOut(docs) // single-file scans must not serialize the explode
    val t = split(col(textCol), " ")
    // r20: dl rides the tf aggregate (constant per doc, so max() is the
    // identity) instead of a separate corpus-sized dl frame JOINED back
    // by id — that join exchanged the whole corpus's (id, dl) rows to
    // attach a value the tf pass already had in hand. The only
    // corpus-sized work left is the token explode feeding tf (whose
    // exchange the df aggregate reuses) and the scalar doc-stats pass.
    val stats = fd.select(size(t).cast("long").as("dl"))
      .agg(count(lit(1)).as("n_docs"),
        (sum(col("dl")).cast("double") / count(lit(1))).as("avgdl"))
    val tf = fd.select(col(idCol), t.as("_t"))
      .select(col(idCol), size(col("_t")).cast("long").as("dl"),
        explode(col("_t")).as("tok"))
      .filter(col("tok").isin(queryTerms: _*))
      .groupBy(col(idCol), col("tok"))
      .agg(count(lit(1)).as("tf"), max(col("dl")).as("dl"))
    val df = tf.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    val idf = log((col("n_docs") - col("df") + lit(0.5)) /
      (col("df") + lit(0.5)) + lit(1.0))
    val denom = col("tf") + lit(K1) *
      (lit(1.0) - lit(B) + lit(B) * col("dl") / col("avgdl"))
    val contrib = round(idf * (col("tf") * lit(K1Plus1)) / denom, 8)
      .cast("decimal(24,8)")
    tf.join(broadcast(df), "tok")
      .crossJoin(broadcast(stats))
      .withColumn("_c", contrib)
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_terms"),
        round(sum(col("_c")).cast("double"), 6).as("bm25"))
      .orderBy(col("bm25").desc, col(idCol))
      .limit(k)
  }

  /** Reciprocal-rank-fusion constant (the standard k=60 of Cormack et
    * al.'s RRF). */
  val RrfK: Int = 60

  /** Hybrid retrieval: fuse a lexical ranking and a semantic ranking by
    * reciprocal-rank fusion — RRF(d) = Σ_sources 1/(k + rank_source(d)),
    * absent-from-a-source contributing nothing. The standard production
    * retrieval shape (BM25 recall + embedding precision) with no score
    * normalization problem: only RANKS cross the fusion boundary, so the
    * two sources' incomparable score scales never meet, and the fused
    * score is a sum of exact-integer reciprocals — deterministic
    * cross-engine with no rounding.
    *
    * Inputs are any two frames carrying (idCol, a score column) — ranks
    * are derived here with a deterministic (score desc, id) order. Both
    * candidate lists are top-N bounded by construction, so the fusion
    * full-outer join is candidate-sized — never corpus-sized. */
  def rrfFuse(lexical: DataFrame, semantic: DataFrame, idCol: String,
      lexScore: String, semScore: String, k: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    def ranked(df: DataFrame, score: String, rank: String) =
      df.withColumn(rank, row_number().over(
        Window.orderBy(col(score).desc, col(idCol))))
        .select(col(idCol), col(rank))
    val l = ranked(lexical, lexScore, "lex_rank")
    val s = ranked(semantic, semScore, "sem_rank")
    l.join(s, Seq(idCol), "full_outer")
      .withColumn("rrf",
        coalesce(lit(1.0) / (lit(RrfK) + col("lex_rank")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(RrfK) + col("sem_rank")), lit(0.0)))
      .orderBy(col("rrf").desc, col(idCol))
      .select(col(idCol), col("lex_rank"), col("sem_rank"), col("rrf"))
      .limit(k)
  }

  /** Hashed feature dimension shared with the oracle SQL generation. */
  val DsirDim: Int = 4096

  /** Word unigram+bigram features hashed into [0, dim) — the same md5
    * 60-bit family as [[Dedup.shingleHashArray]] (native codegen'd
    * expression), reduced mod the feature dimension. */
  def hashedFeatures(text: Column, dim: Int = DsirDim): Column =
    transform(
      concat(Dedup.shingleHashArray(text, 1), Dedup.shingleHashArray(text, 2)),
      h => h % dim)

  /** DSIR-style importance weights (Xie et al. 2023 shape): per-doc mean
    * log-ratio of a TARGET hashed-n-gram distribution to the SOURCE (full
    * corpus) distribution, both add-half smoothed over `dim` buckets.
    * Positive weight ⇒ doc looks more like the target than the average
    * corpus doc; feeding the weights to [[ExtQueries]]' x64/x68 samplers
    * realizes the importance resampling.
    *
    * Per-feature log-ratio contributions are quantized to 8 decimals and
    * summed in exact decimal (order-independence, the x71 convention).
    * Output: (idCol, n_feat, dsir_weight) per source doc.
    *
    * This is the GENERAL form (target an arbitrary frame, possibly with
    * buckets absent from the source); targets that are a predicate over
    * the source should use [[dsirWeightsSlice]], which derives both
    * distributions from one fused pass. */
  def dsirWeights(source: DataFrame, target: DataFrame, idCol: String,
      textCol: String = "text", dim: Int = DsirDim): DataFrame = {
    def featTable(docs: DataFrame) = Dedup.fanOut(docs).select(col(idCol),
      explode(hashedFeatures(col(textCol), dim)).as("b"))
    val srcFeats = featTable(source)
    val tCnt = featTable(target).groupBy("b").agg(count(lit(1)).as("tc"))
    val sCnt = srcFeats.groupBy("b").agg(count(lit(1)).as("sc"))
    val tTot = tCnt.agg(sum(col("tc")).cast("double").as("tt"))
    val sTot = sCnt.agg(sum(col("sc")).cast("double").as("st"))
    val half = lit(0.5)
    val smooth = lit(0.5 * dim)
    val ratio = ((coalesce(col("tc"), lit(0L)) + half) / (col("tt") + smooth)) /
      ((col("sc") + half) / (col("st") + smooth))
    srcFeats
      .join(broadcast(tCnt), Seq("b"), "left")
      .join(broadcast(sCnt), Seq("b"))
      .crossJoin(broadcast(tTot)).crossJoin(broadcast(sTot))
      .withColumn("_c", round(log(ratio), 8).cast("decimal(24,8)"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_feat"),
        round(sum(col("_c")).cast("double") / count(lit(1)), 6)
          .as("dsir_weight"))
  }

  /** [[dsirWeights]] for a target that IS a slice of the source (the
    * x72 shape: target = `isTarget` rows of `source`), bit-identical to
    * the two-frame form on that shape (spec-pinned) because a target
    * row's features are exactly its source row's features. r19, two
    * structural savings over the general form at corpus scale:
    *
    *  - ONE fused explode+conditional-count pass derives BOTH bucket
    *    distributions AND (via an unpartitioned window over the
    *    `dim`-bounded count frame — evaluated once, no self-join, no
    *    recomputed lineage) both totals: the feature kernel runs twice
    *    over the corpus (count pass + scoring pass) where the general
    *    form's unshared subtrees run it ~4× (source counts, source
    *    total, target counts/total, scoring).
    *  - the per-bucket log-ratio is computed on the ≤`dim`-row frame
    *    BEFORE broadcasting, so the per-instance join carries a ready
    *    decimal instead of re-deriving log/round/decimal per feature
    *    occurrence.
    *
    * Empty-target edge (ADVICE r19): a predicate matching NO rows gives
    * sum(tc) = 0, so this form yields finite smoothed weights, whereas
    * the general two-frame form aggregates an empty target frame to a
    * null total and nulls every dsir_weight. The bit-identity claim is
    * for non-empty targets (the x72 shape); an all-false predicate is a
    * caller error this form degrades on gracefully instead of nulling. */
  def dsirWeightsSlice(source: DataFrame, isTarget: Column, idCol: String,
      textCol: String = "text", dim: Int = DsirDim): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val fb = Dedup.fanOut(source).select(col(idCol), isTarget.as("_t"),
      explode(hashedFeatures(col(textCol), dim)).as("b"))
    // unpartitioned window = single-partition WindowExec (the 'No
    // Partition Defined' warning in entry logs) — safe ONLY because it
    // runs over the post-aggregation count frame, which is bounded by
    // `dim` (≤4096) rows by construction; do not lift it onto anything
    // corpus-sized (ADVICE r19)
    val everything = Window.partitionBy()
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val half = lit(0.5)
    val smooth = lit(0.5 * dim)
    // count() is never null, so tc = 0 on target-absent buckets — the
    // same value the general form's coalesce(tc, 0) produces there; with
    // target ⊆ source, sum(tc) over source buckets IS the target total
    val ratio =
      ((col("tc") + half) / (sum(col("tc")).over(everything).cast("double") +
        smooth)) /
      ((col("sc") + half) / (sum(col("sc")).over(everything).cast("double") +
        smooth))
    val contrib = fb.groupBy("b").agg(
        count(lit(1)).as("sc"), count(when(col("_t"), 1)).as("tc"))
      .select(col("b"), round(log(ratio), 8).cast("decimal(24,8)").as("_c"))
    fb.select(col(idCol), col("b"))
      .join(broadcast(contrib), Seq("b"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_feat"),
        round(sum(col("_c")).cast("double") / count(lit(1)), 6)
          .as("dsir_weight"))
  }
}
