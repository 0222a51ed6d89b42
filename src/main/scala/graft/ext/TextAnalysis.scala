package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text analysis for training-data pipelines (north-star extension,
  * SURVEY §7.4): language ID (stopword n-gram heuristic), quality scoring,
  * token counting, and document fingerprinting. Everything is built-in
  * expressions — codegen'd, UDF-free, and oracle-expressible.
  */
object TextAnalysis {

  /** Canned scrub patterns for PII redaction. All stay inside the
    * Java∩RE2 regex subset (classes, quantifiers, alternation, \b; no
    * backreferences or lookaround) so the same pattern string behaves
    * identically in Spark and in RE2-based engines (DuckDB oracle). */
  val EmailPattern: String =
    "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val UrlPattern: String = "https?://[^ ]+"
  val PhonePattern: String =
    "\\+?[0-9][0-9()\\[\\] .-]{6,}[0-9]"
  val DigitRunPattern: String = "[0-9]{4,}"

  /** BPE-style pretokenizer regex (GPT-2 shape: contractions, letter
    * runs, digit runs, symbol runs, each optionally space-prefixed; space
    * runs) restricted to the lookahead-free Java∩RE2 subset so Spark and
    * RE2-based engines tokenize identically. Token COUNTS under this
    * pattern approximate BPE sequence length far better than whitespace
    * splitting (digits/punctuation split off), which is what sequence
    * budgeting needs. */
  val BpeTokenPattern: String =
    "'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 ]+| +"

  /** Number of BPE-style pretokens in `text` (see [[BpeTokenPattern]]). */
  def bpeTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit(BpeTokenPattern), lit(0))).cast("long")

  /** Cross-document boilerplate removal (the CCNet-shape curation step):
    * a k-token span is boilerplate when the identical span opens a shingle
    * in ≥ `minDf` DISTINCT documents (templated headers, license
    * blurbs, navigation chrome); every token covered by at least one
    * boilerplate shingle occurrence is dropped and the remaining tokens
    * are rejoined in order. Returns (id, n_tokens, n_removed, clean_text);
    * a fully-boilerplate document survives as `clean_text = ""` (the
    * caller decides whether to drop empties).
    *
    * Shape, scan to result (r20: ONE shingle pass — the old form built
    * the boilerplate set with a distinct+count aggregate and JOINED it
    * back onto a second, fully re-executed `starts` subtree; unshared
    * Spark subtrees re-execute their lineage, so the tokenize+explode+
    * concat kernel ran twice over the corpus — the x72 lesson):
    *  1. shingle starts with positions — same codegen explode +
    *     `element_at` form as [[Dedup.hashedShingles]], fanned out to full
    *     parallelism on narrow inputs. The under-k-tokens guard lives
    *     INSIDE the generator (`explode(when(size ≥ k, sequence ...))`,
    *     null generates no rows) rather than as a Filter: predicate
    *     pushdown inlines a filter through the `t` alias, so FilterExec
    *     would evaluate `split(text)` per row before the projection
    *     evaluates it again (the r19 x31 guard lesson);
    *  2. ONE aggregate to per-(shingle, doc) start-position arrays,
    *     then the distinct-doc df as a WINDOW count over the aggregated
    *     frame — no boiler self-join, no second corpus pass. A
    *     mega-shingle's window partition holds one row per CONTAINING
    *     DOC (post-aggregation), and WindowExec buffers spill to disk —
    *     the same spill-safe-guard shape [[Dedup.lshCandidates]] uses
    *     for its bucket cap. The boiler join is gone with the second
    *     pass (at web scale the ≥minDf trigram set is corpus-shaped and
    *     was a shuffle join anyway — the x56 lesson);
    *  3. boilerplate START positions group to ONE doc-length-bounded
    *     array per doc (flatten of the per-shingle position arrays — a
    *     start position belongs to exactly one shingle, so no
    *     duplicates; one (id, ints) row per boilerplate HIT, nothing
    *     position×k-scale; r16, the sf10 lesson: the prior
    *     explode→distinct→anti-join form shuffled positions×k rows
    *     three times and was the slowest sf10 query at 55.6 s);
    *  4. coverage and reassembly are PER ROW: expand each start's
    *     [s, s+k−1] window, keep positions via `array_except` (codegen
    *     hash-set build, O(tokens + covered) per doc; output order
    *     inherited from the ordered left side, so aggregation-order
    *     nondeterminism cannot reach the result), then
    *     `element_at`-gather + `concat_ws`. Untouched docs take the
    *     null-`_bs` branch; fully-boilerplate docs keep an empty array.
    * Per-row memory is bounded by the doc's own token count — the same
    * bound `clean_text` itself carries; skew is bounded by document
    * length, not corpus size. */
  def removeBoilerplate(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 3, minDf: Int = 5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val t = split(col(textCol), " ")
    val base = Dedup.fanOut(docs.select(col(idCol), col(textCol)))
    val starts = base
      .select(col(idCol), t.as("t"))
      .select(col(idCol), col("t"),
        explode(when(size(col("t")) >= k,
          sequence(lit(1), size(col("t")) - (k - 1)))).as("i"))
      .select(col(idCol), col("i"), concat_ws(" ",
        (0 until k).map(o => element_at(col("t"), col("i") + o)): _*)
        .as("shingle"))
    // Coverage is computed PER ROW, not per position (r16): group each
    // doc's boilerplate START positions into one doc-length-bounded
    // array, expand the [s, s+k-1] windows per row, and take kept
    // positions with array_except — a codegen hash-set build,
    // O(tokens + covered) per doc. The r20 exchange chain is
    // (shingle, id) agg → shingle window → id agg: the corpus-sized
    // shingle kernel runs exactly ONCE (the r19 form ran it twice —
    // once under the boiler aggregate, once under the join probe side)
    // and the df ≥ minDf test rides the window count (= distinct
    // containing docs, the old distinct→count semantics, since the
    // frame is already one row per (shingle, doc)).
    val bstarts = starts.groupBy(col("shingle"), col(idCol))
      .agg(collect_list(col("i")).as("_ps"))
      .withColumn("_df", count(lit(1)).over(Window.partitionBy("shingle")))
      .filter(col("_df") >= minDf)
      .groupBy(col(idCol)).agg(flatten(collect_list(col("_ps"))).as("_bs"))
    // null text → empty kept set (n_removed = n_tokens − 0, matching
    // the prior anti-join form where a null row exploded to no tokens);
    // the guard also keeps sequence() away from size(_t) = −1, whose
    // descending [1, 0, −1] would plant an element_at(_, 0) trap
    val allPos = sequence(lit(1), size(col("_t")))
    val keptPos = when(col("_t").isNull, array().cast("array<int>"))
      .when(col("_bs").isNull, allPos)
      .otherwise(array_except(allPos,
        flatten(transform(col("_bs"), s => sequence(s, s + (k - 1))))))
    // the heavy per-token work (array_except, the element_at gather,
    // concat_ws) runs where this frame's tasks run — fan a narrow
    // input out first, exactly as the shingle stage does (review r16:
    // the rewrite initially ran reassembly at raw-scan parallelism)
    Dedup.fanOut(docs.select(col(idCol), t.as("_t")))
      .join(bstarts, Seq(idCol), "left")
      .withColumn("_kp", keptPos)
      .select(col(idCol), size(col("_t")).cast("long").as("n_tokens"),
        (size(col("_t")) - size(col("_kp"))).cast("long").as("n_removed"),
        concat_ws(" ",
          transform(col("_kp"), p => element_at(col("_t"), p)))
          .as("clean_text"))
  }

  /** Replace every match of each pattern with its placeholder, left to
    * right, and append a `n_<name>` match-count column per pattern — a
    * pure per-row expression pipeline (codegen'd, zero shuffles): the
    * redaction pass is a map-side scan at any corpus size. Counts are
    * computed against the ORIGINAL text, so an earlier pattern's
    * placeholder cannot consume a later pattern's matches in the count
    * (the replacements themselves compose in order). */
  def redact(docs: DataFrame, textCol: String,
      patterns: Seq[(String, String, String)] = Seq(
        ("email", EmailPattern, "[EMAIL]"),
        ("url", UrlPattern, "[URL]"),
        ("phone", PhonePattern, "[PHONE]"))): DataFrame = {
    val counted = patterns.foldLeft(docs) { case (df, (name, pat, _)) =>
      df.withColumn(s"n_$name",
        size(regexp_extract_all(col(textCol), lit(pat), lit(0)))
          .cast("long"))
    }
    counted.withColumn("redacted",
      patterns.foldLeft(col(textCol)) { case (c, (_, pat, repl)) =>
        regexp_replace(c, lit(pat), lit(repl))
      })
  }

  /** Tiny per-language stopword lists for the heuristic language ID. */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "and", "of", "to"),
    "es" -> Seq("el", "la", "de", "y", "que"),
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "fr" -> Seq("le", "la", "de", "et", "les"),
    "zh" -> Seq("de", "shi", "bu", "le", "zai"))

  /** Fixed tie-break rank per language (distinct, < 8) — makes the argmax
    * a plain integer max: combined = score * 8 + rank is unique per lang. */
  val langRank: Map[String, Int] =
    Map("en" -> 5, "es" -> 4, "de" -> 3, "fr" -> 2, "zh" -> 1)

  /** Characteristic character trigrams per language — the n-gram half of
    * the heuristic (applied to raw text, catches morphology the word lists
    * miss). */
  val charTrigrams: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "ing", "he ", "er ", "nd "),
    "es" -> Seq("de ", "os ", "ión", "ent", "la "),
    "de" -> Seq("der", "ich", "sch", "ein", "und"),
    "fr" -> Seq("les", "ent", "de ", "ion", "que"),
    "zh" -> Seq("shi", "zhi", "ang", "eng", "ong"))

  /** Hashed linear-model dimensions — shared with the oracle SQL
    * generation (x70) so both engines score with the identical table. */
  val LmDim: Int = 4096
  val LmMod: Int = 2001 // odd → weights symmetric in [-1000, 1000]
  val LmA: Long = 40503L
  val LmB: Long = 12345L

  /** Weight of feature bucket `b` — a fixed full-rank affine scramble
    * standing in for a TRAINED model's weight vector (deterministic, so
    * the query is oracle-checkable; integer-valued, so cross-engine sums
    * are exact). Production swaps this generated array for real fastText /
    * logistic-regression weights — every other part of the shape
    * (hashing, lookup, fold, threshold) is unchanged. */
  def lmWeight(b: Int): Int = ((b.toLong * LmA + LmB) % LmMod).toInt - LmMod / 2

  /** Hashed linear-classifier inference (the fastText-style quality
    * filter of CCNet/RefinedWeb-shape corpus pipelines) applied as a pure
    * MAP-SIDE scan: word unigram + bigram features via the hashing trick
    * (the same md5 60-bit family as [[Dedup.shingleHashArray]], computed
    * by the native codegen'd `ShingleHashF` with k=1 / k=2), each feature
    * indexed into a `LmDim`-entry weight-array LITERAL — the "broadcast
    * the model into the expression" deployment shape — and folded to a
    * per-document integer sum. `score` = score_sum / n_feat (IEEE
    * division of identical integers — oracle-exact), `keep` thresholds
    * it.
    *
    * Scale: zero shuffles, zero joins — the plan is scan → expressions,
    * one whole-stage-codegen span (the hash and the weight fold are both
    * native expressions: `ShingleHashF`, `WeightSumF`). Scoring 100 TB is
    * embarrassingly parallel, and the weight array rides inside the task
    * binary (a few KB), not a join side. */
  def hashedLinearScore(docs: DataFrame, idCol: String, textCol: String,
      threshold: Double = 0.0): DataFrame = {
    val weights = (0 until LmDim).map(lmWeight).toIndexedSeq
    val feats = concat(Dedup.shingleHashArray(col(textCol), 1),
      Dedup.shingleHashArray(col(textCol), 2))
    docs.select(col(idCol), feats.as("_f"))
      .withColumn("n_feat", size(col("_f")).cast("long"))
      .filter(col("n_feat") > 0)
      .withColumn("score_sum", org.apache.spark.sql.GraftBridge.column(
        graft.functions.WeightSumF(
          org.apache.spark.sql.GraftBridge.expression(col("_f")), weights)))
      .withColumn("score", col("score_sum") / col("n_feat"))
      .withColumn("keep", col("score") > threshold)
      .select(col(idCol), col("n_feat"), col("score_sum"), col("score"),
        col("keep"))
  }

  /** Count of tokens present in `words` (with repeats — frequency, not
    * set membership). */
  def stopwordScore(tokens: Column, words: Seq[String]): Column =
    size(filter(tokens, t => words.map(w => t === w).reduce(_ || _)))

  /** Count of character trigrams of `text` matching `grams` (with
    * repeats). */
  def trigramScore(text: Column, grams: Seq[String]): Column =
    size(filter(
      // greatest(...,1): sequence(1,0) would generate a DESCENDING range;
      // a single too-short gram can never match a 3-char profile entry
      transform(sequence(lit(1), greatest(length(text) - 2, lit(1))),
        i => text.substr(i, lit(3))),
      t => grams.map(g => t === g).reduce(_ || _)))

  /** Heuristic language ID: combined stopword-frequency + char-trigram
    * argmax with deterministic rank tie-break. Adds `predicted_lang` and
    * per-language `score_<lang>` (words) / `tri_<lang>` (trigrams). */
  def langId(docs: DataFrame, textCol: String): DataFrame = {
    val toks = split(col(textCol), " ")
    val langs = stopwords.keys.toSeq.sorted
    val scored = langs.foldLeft(docs) { (df, lang) =>
      df.withColumn(s"score_$lang", stopwordScore(toks, stopwords(lang)))
        .withColumn(s"tri_$lang", trigramScore(col(textCol), charTrigrams(lang)))
    }
    val combined = greatest(langs.map(lang =>
      (col(s"score_$lang") + col(s"tri_$lang")) * 8 + langRank(lang)): _*)
    val predicted = langRank.foldLeft(lit(null).cast("string")) {
      case (acc, (lang, rank)) => when(combined % 8 === rank, lang).otherwise(acc)
    }
    scored.withColumn("predicted_lang", predicted)
  }

  /** Quality features: token count (split + regex tokenizers), average
    * token length, digit ratio, English-stopword ratio, and a bucketed
    * quality score. Ratios are raw IEEE divisions of exact integers — no
    * rounding, so they are bit-identical across engines. */
  def quality(docs: DataFrame, textCol: String): DataFrame = {
    val toks = split(col(textCol), " ")
    docs
      .withColumn("n_tokens", size(toks))
      .withColumn("n_alpha_tokens",
        size(regexp_extract_all(col(textCol), lit("[a-z]+"), lit(0))))
      .withColumn("avg_token_len",
        (length(col(textCol)) - size(toks) + 1) / size(toks))
      .withColumn("digit_ratio",
        length(regexp_replace(col(textCol), "[^0-9]", "")) /
          length(col(textCol)))
      .withColumn("stop_ratio",
        stopwordScore(toks, stopwords("en")) / size(toks))
      .withColumn("quality_score",
        when(col("n_tokens") >= 50 && col("stop_ratio") > 0.02, "high")
          .when(col("n_tokens") >= 20, "medium")
          .otherwise("low"))
  }

  /** Positional rolling-hash fingerprint (order-sensitive — permuted token
    * sequences fingerprint differently) plus the exact md5. Pure integer
    * arithmetic so the oracle reproduces it bit-for-bit. */
  def fingerprint(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tok = docs.select(col(idCol), col(textCol),
      posexplode(split(col(textCol), " ")).as(Seq("pos", "token")))
    val tokval = expr(
      "length(token)*31 + ascii(substr(token,1,1))*7 + ascii(substr(token,-1,1))")
    tok.withColumn("term",
        (tokval % 1000003L) * ((col("pos") + 1) % 997L + 1))
      .groupBy(col(idCol))
      .agg((sum(col("term")) % 1000000007L).as("roll_fp"),
        min(md5(col(textCol))).as("md5_fp"))
  }

  /** Winnowing fingerprints (Schleimer/Wilkerson/Aiken, SIGMOD'03 — the
    * MOSS algorithm): hash every k-shingle, slide a window of `w`
    * consecutive hashes, keep each window's MINIMUM — the selected DISTINCT
    * values are the document's fingerprint set. Guarantee: any shared run
    * of ≥ w+k−1 tokens between two documents yields ≥1 shared fingerprint,
    * at ~2/(w+1) the density of the full shingle set — sub-linear sketch
    * size with a positional-match guarantee MinHash doesn't give.
    * Value-based selection (not positional) keeps the definition
    * tie-insensitive and thus exactly oracle-expressible: both engines
    * compute `min over a w-row window` and dedup. One shuffle (window by
    * doc); per-group state is one doc's shingles — bounded by document
    * length. */
  def winnow(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 3, w: Int = 4): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    docs
      .select(col(idCol),
        posexplode(Dedup.shingleHashArray(col(textCol), k))
          .as(Seq("pos", "h")))
      .withColumn("wmin", min(col("h")).over(
        Window.partitionBy(col(idCol)).orderBy(col("pos"))
          .rowsBetween(-(w - 1), 0)))
      .filter(col("pos") >= w - 1) // full windows only
      .select(col(idCol), col("wmin").as("fingerprint"))
      .distinct()
  }

  /** Bigram-LM cross-entropy scoring (the CCNet perplexity-filter shape,
    * one order up from [[ExtQueries]]' x56 unigram scorer): cap the
    * vocabulary at the corpus's `vocabK` most frequent words (ties break
    * lexicographically — deterministic), map the tail to `<unk>`, train
    * add-half-smoothed bigram counts on the mapped corpus, and score each
    * document by its mean −ln p(w|prev). High xent = the document's word
    * transitions look nothing like the corpus — the noise/boilerplate
    * signal perplexity filters threshold on. (Production swaps the
    * corpus-trained table for a held-out LM's; every other part of the
    * shape is unchanged.)
    *
    * Scale: the vocab is a top-K broadcast; bigram/context count tables
    * are bounded by (K+1)² — broadcast joins, never corpus-sized; the
    * only corpus-wide movement is the per-doc window for bigram pairing
    * (partition = doc, state bounded by doc length). Per-bigram
    * contributions quantize to 8 decimals and sum in exact decimal. */
  def bigramXent(docs: DataFrame, idCol: String, textCol: String,
      vocabK: Int = 40): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tok = Dedup.fanOut(docs).select(col(idCol),
      posexplode(split(col(textCol), " ")).as(Seq("pos", "w")))
    val vocab = tok.groupBy("w").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("w")).limit(vocabK)
      .select(col("w"), lit(true).as("in_v"))
    val mapped = tok.join(broadcast(vocab), Seq("w"), "left")
      .withColumn("m", when(col("in_v"), col("w")).otherwise(lit("<unk>")))
    val byDoc = Window.partitionBy(idCol).orderBy("pos")
    val big = mapped.withColumn("prev", lag(col("m"), 1).over(byDoc))
      .filter(col("prev").isNotNull)
      .select(col(idCol), col("prev"), col("m"))
    val c2 = big.groupBy("prev", "m").agg(count(lit(1)).as("c2"))
    // context counts are the bigram counts rolled up over `m` — a
    // (K+1)²-row aggregation, NOT a second corpus-wide pass over `big`
    val c1 = c2.groupBy("prev").agg(sum(col("c2")).as("c1"))
    val smooth = lit(0.5 * (vocabK + 1))
    big.join(broadcast(c2), Seq("prev", "m")).join(broadcast(c1), "prev")
      .withColumn("_c",
        round(-log((col("c2") + lit(0.5)) / (col("c1") + smooth)), 8)
          .cast("decimal(24,8)"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"),
        round(sum(col("_c")).cast("double") / count(lit(1)), 6).as("xent"))
  }

  /** Stopword set of the Gopher rule bundle — shared with the oracle SQL
    * generation (x75). */
  val GopherStops: Seq[String] =
    Seq("the", "a", "and", "of", "to", "in", "with", "that")

  /** Gopher-style quality rule bundle (Rae et al. 2021 §A1.1, adapted to a
    * whitespace-token corpus): per-document boolean gates on word count,
    * mean word length, stopword presence, single-word repetition, and
    * vocabulary diversity, plus the conjunction (`pass`).
    *
    * Every signal — including the max single-word multiplicity — is a
    * per-row fold over the token array (the repetition count runs over the
    * SORTED array, where multiplicity = longest equal run): zero shuffles,
    * zero joins, one whole-stage-codegen scan. Ratios are raw IEEE
    * divisions of exact integers (bit-identical cross-engine, never
    * rounded). The thresholds are constructor-visible so a real pipeline
    * tunes them per corpus. */
  def gopherRules(docs: DataFrame, idCol: String, textCol: String,
      minWords: Int = 20, maxWords: Int = 1000,
      minMeanWl: Double = 2.0, maxMeanWl: Double = 12.0,
      minStops: Int = 2, maxTopFrac: Double = 0.2,
      minDistinctRatio: Double = 0.3): DataFrame = {
    val toks = split(col(textCol), " ")
    // longest equal run in the sorted token array = max word multiplicity;
    // fold state: (previous token, current run, best run)
    val maxRep = aggregate(
      array_sort(toks),
      struct(lit("").as("prev"), lit(0).as("run"), lit(0).as("best")),
      (acc, t) => {
        val run = when(t === acc.getField("prev"),
          acc.getField("run") + 1).otherwise(lit(1))
        struct(t.as("prev"), run.as("run"),
          greatest(acc.getField("best"), run).as("best"))
      },
      acc => acc.getField("best"))
    docs
      .withColumn("n_words", size(toks))
      .withColumn("mean_wl",
        aggregate(toks, lit(0), (acc, t) => acc + length(t)) / size(toks))
      .withColumn("stop_cnt", stopwordScore(toks, GopherStops))
      .withColumn("top_frac", maxRep / size(toks))
      .withColumn("distinct_ratio", size(array_distinct(toks)) / size(toks))
      .withColumn("size_ok",
        col("n_words") >= minWords && col("n_words") <= maxWords)
      .withColumn("wl_ok",
        col("mean_wl") >= minMeanWl && col("mean_wl") <= maxMeanWl)
      .withColumn("stop_ok", col("stop_cnt") >= minStops)
      .withColumn("rep_ok", col("top_frac") <= maxTopFrac)
      .withColumn("diversity_ok", col("distinct_ratio") >= minDistinctRatio)
      .withColumn("pass", col("size_ok") && col("wl_ok") && col("stop_ok") &&
        col("rep_ok") && col("diversity_ok"))
      .select(col(idCol), col("n_words"), col("mean_wl"), col("stop_cnt"),
        col("top_frac"), col("distinct_ratio"), col("size_ok"), col("wl_ok"),
        col("stop_ok"), col("rep_ok"), col("diversity_ok"), col("pass"))
  }
}
