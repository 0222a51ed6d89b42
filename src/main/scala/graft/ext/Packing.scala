package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for training-data pipelines: greedy contiguous binning
  * of documents into fixed token budgets per language (the step that turns
  * a corpus into fixed-length training sequences).
  *
  * A document's bin is the budget-floor of its START offset in the
  * per-language running token sum. The naive form is one window
  * partitioned by language — which serializes a dominant language into a
  * single task at 100 TB (one `lang = en` partition can be most of the
  * corpus). Here the prefix sum is computed DISTRIBUTED, with identical
  * results:
  *
  *  1. each language splits into deterministic chunks (`id / chunkSize`);
  *  2. per-chunk token totals aggregate (hash agg, fully parallel);
  *  3. chunk OFFSETS come from a window over the chunk summaries — a
  *     frame with one row per chunk (corpus/chunkSize rows — thousands,
  *     not billions), so the per-language serial step is negligible;
  *  4. the in-chunk running sum windows over (lang, chunk) — task state
  *     is bounded by `chunkSize` regardless of language skew;
  *  5. `cum = chunk_offset + in-chunk running sum` — exactly the value
  *     the single-window form produces (prefix sums are associative), so
  *     bin ids are deterministic and skew-independent.
  */
object Packing {

  /** Per-document packed-bin assignment: (idCol, langCol, tokensCol) →
    * + `cum` (inclusive running token sum within the language, ordered by
    * id) and `bin` (budget-floor of the document's start offset). */
  def packDocs(docs: DataFrame, idCol: String, langCol: String,
      tokensCol: String, budget: Int = 256, chunkSize: Int = 100): DataFrame = {
    // integer `div`, not floor(double division): a 64-bit hashed id would
    // lose low bits past 2^53 in double and smear chunk boundaries
    val chunked = docs.withColumn("_chunk", expr(s"`$idCol` div $chunkSize"))
    val wChunks = Window.partitionBy(langCol).orderBy("_chunk")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = chunked.groupBy(col(langCol), col("_chunk"))
      .agg(sum(col(tokensCol)).as("_chunk_tokens"))
      .withColumn("_chunk_offset",
        coalesce(sum(col("_chunk_tokens")).over(wChunks), lit(0L)))
      .select(col(langCol), col("_chunk"), col("_chunk_offset"))
    val wIn = Window.partitionBy(col(langCol), col("_chunk"))
      .orderBy(idCol).rowsBetween(Window.unboundedPreceding, 0)
    chunked.join(offsets, Seq(langCol, "_chunk"))
      .withColumn("cum", col("_chunk_offset") + sum(col(tokensCol)).over(wIn))
      .withColumn("bin", floor((col("cum") - col(tokensCol)) / budget))
      .drop("_chunk", "_chunk_offset")
  }

  /** Bin summaries per (lang, bin) — the x48 query shape. */
  def packSummary(packed: DataFrame, idCol: String, langCol: String,
      tokensCol: String): DataFrame =
    packed.groupBy(col(langCol), col("bin"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col(tokensCol)).as("total_tokens"),
        min(col(idCol)).as("first_doc"), max(col(idCol)).as("last_doc"))
      .orderBy(langCol, "bin")
}
