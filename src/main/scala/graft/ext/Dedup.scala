package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Document deduplication operators for LLM-training-data pipelines
  * (north-star extension surface, SURVEY §7.4).
  *
  * Design for 100 TB:
  *  - every stage is a hash-partitioned aggregate or equi-join — no
  *    cartesian products anywhere; candidate generation is LSH-bucketed
  *    (MinHash bands / SimHash bands), so pair blow-up is bounded by
  *    bucket size, not corpus size;
  *  - hashes are `md5` (codegen'd built-in) rather than JVM hashCode so
  *    results are engine-portable and oracle-checkable;
  *  - shingle inverted-index joins drop ultra-common shingles
  *    (document-frequency cap) — the standard guard against quadratic
  *    candidate explosion on boilerplate text.
  */
object Dedup {

  /** Word k-shingles of a space-tokenized text column; documents shorter
    * than k tokens produce no shingles (matches `range(1, len-k+2)` in the
    * oracle SQL). */
  def shingles(text: Column, k: Int = 3): Column = {
    val toks = split(text, " ")
    when(size(toks) >= k,
      transform(sequence(lit(1), size(toks) - (k - 1)),
        i => concat_ws(" ", slice(toks, i, lit(k)))))
      .otherwise(array().cast("array<string>"))
  }

  /** Distinct (id, h) table with shingles hashed to 60-bit ints BEFORE the
    * distinct — the shared input of MinHash, Jaccard verification, and the
    * inverted-index join. Hashing first means every downstream shuffle
    * (distinct, signature agg, verify joins) moves 8-byte longs instead of
    * ~30-byte shingle strings — a 3–4× shuffle-width cut that compounds at
    * 100 TB. Set semantics are preserved modulo 60-bit hash collisions,
    * which the md5-derived oracle reproduces bit-for-bit. */
  def hashedShingleTable(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 3): DataFrame =
    docs.select(col(idCol), explode(shingles(col(textCol), k)).as("shingle"))
      .select(col(idCol), baseHash(col("shingle")).as("h"))
      .distinct()

  /** Universal-hash family constants for MinHash: permutation i is
    * `(A(i)·h + B(i)) mod P` over the base hash h (first 60 bits of md5).
    * One md5 per shingle total — the 16 permutations are integer
    * arithmetic, ~16× cheaper than 16 independent md5 calls and exactly
    * reproducible in the oracle SQL (which is generated from these same
    * constants). */
  val P: Long = 2147483647L // 2^31 - 1 (prime)
  def aConst(i: Int): Long = (i * 2654435761L + 1103515245L) % P
  def bConst(i: Int): Long = (i * 40503L + 7L) % P

  /** Base hash: first 15 hex chars of md5 as a bigint, reduced mod P. */
  private def baseHash(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long") % P

  /** MinHash signatures over a [[hashedShingleTable]] (column `h`):
    * m_i = min over shingles of permutation_i(h). One hash-aggregate
    * producing all `numHashes` mins per document — single shuffle
    * regardless of signature width. */
  def minhashSignatures(hashedTbl: DataFrame, idCol: String,
      numHashes: Int = 16): DataFrame =
    hashedTbl.groupBy(col(idCol)).agg(
      min((lit(aConst(0)) * col("h") + lit(bConst(0))) % P).as("m0"),
      (1 until numHashes).map(i =>
        min((lit(aConst(i)) * col("h") + lit(bConst(i))) % P).as(s"m$i")): _*)

  /** Default LSH band-bucket size cap (see [[lshCandidates]]); oracle SQL
    * is generated from this same constant so both engines drop identical
    * buckets. */
  val DefaultMaxBucket: Int = 1000

  /** LSH banding: hash `rows` consecutive signature entries per band; two
    * documents are candidates iff they collide in ≥1 band. Returns distinct
    * (id_a, id_b) with id_a < id_b. The self-join key is (band_idx,
    * band_hash) — fully hash-partitionable.
    *
    * Buckets larger than `maxBucket` are dropped BEFORE the self-join: on
    * boilerplate-heavy corpora (templated pages, license headers) entire
    * band signatures collide, and the self-join over one mega-bucket is
    * quadratic in its size — at 100 TB a single 10M-doc bucket is 10^14
    * pairs. Dropping over-cap buckets bounds per-bucket work at
    * `maxBucket²` (the same guard the n-gram path applies via its df cap);
    * pairs that only collide in mega-buckets are the standard accepted loss
    * — such documents still meet in any *discriminative* band they share. */
  def lshCandidates(sigs: DataFrame, idCol: String, bands: Int = 4,
      rows: Int = 4, maxBucket: Int = DefaultMaxBucket): DataFrame = {
    val bandCols = (0 until bands).map { j =>
      concat_ws("|",
        (j * rows until (j + 1) * rows).map(i => col(s"m$i").cast("string")): _*)
    }
    // cache: the self-join's two sides would otherwise recompute the whole
    // shingle→minhash pipeline twice (band table is tiny: docs × bands)
    val exploded = sigs.select(col(idCol),
      posexplode(array(bandCols: _*)).as(Seq("band_idx", "h"))).cache()
    val small = exploded.groupBy("band_idx", "h")
      .agg(count(lit(1)).as("bsz")).filter(col("bsz") <= maxBucket)
      .select("band_idx", "h")
    val kept = exploded.join(small, Seq("band_idx", "h"))
    val a = kept.select(col(idCol).as("id_a"), col("band_idx"), col("h"))
    val b = kept.select(col(idCol).as("id_b"), col("band_idx"), col("h"))
    a.join(b, Seq("band_idx", "h"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
  }

  /** Exact Jaccard over candidate pairs (verification stage): common
    * shingles via equi-join on the hashed shingle table (column `h`), set
    * sizes via a grouped count — never recomputes shingles pairwise. */
  def jaccardVerify(cands: DataFrame, hashedTbl: DataFrame,
      idCol: String): DataFrame = {
    val sizes = hashedTbl.groupBy(col(idCol)).agg(count(lit(1)).as("sz"))
    val sa = hashedTbl.select(col(idCol).as("id_a"), col("h"))
    val sb = hashedTbl.select(col(idCol).as("id_b"), col("h"))
    cands.join(sa, "id_a").join(sb, Seq("id_b", "h"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("common"))
      .join(sizes.withColumnRenamed(idCol, "id_a")
        .withColumnRenamed("sz", "sz_a"), "id_a")
      .join(sizes.withColumnRenamed(idCol, "id_b")
        .withColumnRenamed("sz", "sz_b"), "id_b")
      .withColumn("jaccard",
        col("common") / (col("sz_a") + col("sz_b") - col("common")))
  }

  /** Inverted-index n-gram Jaccard: candidates from any shared shingle
    * hash whose document frequency is ≤ `maxDf` (blocking guard), then
    * exact verification. */
  def ngramJaccardPairs(hashedTbl: DataFrame, idCol: String,
      maxDf: Int = 50): DataFrame = {
    val rare = hashedTbl.groupBy("h")
      .agg(count(lit(1)).as("df")).filter(col("df") <= maxDf)
      .select("h")
    val filtered = hashedTbl.join(rare, "h").cache()
    val a = filtered.select(col(idCol).as("id_a"), col("h"))
    val b = filtered.select(col(idCol).as("id_b"), col("h"))
    val cands = a.join(b, "h").filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
    jaccardVerify(cands, hashedTbl, idCol)
  }

  /** Connected components over near-dup pairs (id_a < id_b) by iterative
    * min-label propagation: each round every node adopts the minimum label
    * in its neighborhood; converges in graph-diameter rounds (dup clusters
    * are shallow — chains of LSH hits). Returns (id, keeper) where keeper
    * is the component's minimum id — the canonical survivor choice.
    * At adversarial diameters switch to large-star/small-star; the loop
    * here is driver-side control flow over fully distributed steps. */
  def connectedKeepers(pairs: DataFrame, maxIter: Int = 20): DataFrame = {
    // localCheckpoint (eager) everywhere a frame feeds the loop: iterative
    // plans otherwise accumulate the WHOLE upstream lineage (here, the
    // MinHash pipeline) into every iteration's logical plan, and Catalyst
    // re-analysis time — driver-side — comes to dominate the job. Cutting
    // lineage per round keeps planning O(1) per iteration.
    val p = pairs.localCheckpoint(true)
    val sym = p.select(col("id_a").as("src"), col("id_b").as("dst"))
      .unionByName(p.select(col("id_b").as("src"), col("id_a").as("dst")))
      .localCheckpoint(true)
    var labels = sym.select(col("src").as("id")).distinct()
      .withColumn("keeper", col("id")).localCheckpoint(true)
    var changed = 1L
    var i = 0
    while (changed > 0 && i < maxIter) {
      val nbrMin = sym.join(labels, sym("dst") === labels("id"))
        .groupBy(col("src").as("id")).agg(min(col("keeper")).as("nbr_min"))
      val hop = labels.join(nbrMin, Seq("id"), "left")
        .select(col("id"),
          least(col("keeper"), coalesce(col("nbr_min"), col("keeper")))
            .as("keeper"))
      // pointer jumping: keeper := keeper's keeper — squares the
      // propagation distance per round (log-diameter convergence)
      val k2 = hop.select(col("id").as("kid"), col("keeper").as("kk"))
      val next = hop.join(k2, hop("keeper") === k2("kid"), "left")
        .select(hop("id"), coalesce(col("kk"), hop("keeper")).as("keeper"))
        .localCheckpoint(true)
      changed = next.join(labels.withColumnRenamed("keeper", "old"), "id")
        .filter(col("keeper") =!= col("old")).count()
      labels = next
      i += 1
    }
    labels
  }

  /** 48-bit SimHash over word tokens. Token hash = first 12 hex chars of
    * md5; bit p of hex digit k=(p div 4) is `(digit >> (p mod 4)) & 1`.
    * Majority vote per bit (+1/-1 weights, ties → 0). */
  def simhash48(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tok = docs.select(col(idCol),
      explode(split(col(textCol), " ")).as("token"))
      .select(col(idCol), md5(col("token")).as("h"))
    val bits = tok
      .select(col(idCol), col("h"), explode(sequence(lit(0), lit(47))).as("p"))
      .withColumn("digit",
        expr("instr('0123456789abcdef', substr(h, (p div 4)+1, 1)) - 1"))
      .withColumn("w",
        when(expr("(shiftright(digit, p % 4) & 1) = 1"), 1).otherwise(-1))
    bits.groupBy(col(idCol), col("p")).agg(sum(col("w")).as("s"))
      .groupBy(col(idCol))
      .agg(sum(when(col("s") > 0,
          expr("shiftleft(cast(1 as bigint), p)")).otherwise(0L))
        .as("fp48"))
  }

  /** SimHash near-dup pairs: band the 48 bits into 4×12-bit blocks (a pair
    * within Hamming distance ≤3 must agree on ≥1 block — pigeonhole), join
    * per block, verify with `bit_count(xor)`. */
  def simhashPairs(fps: DataFrame, idCol: String, maxDist: Int = 3): DataFrame = {
    val banded = fps.select(col(idCol), col("fp48"),
      posexplode(array((0 until 4).map(j =>
        expr(s"shiftright(fp48, ${j * 12}) & 4095")): _*))
        .as(Seq("band_idx", "band_val")))
    val a = banded.select(col(idCol).as("id_a"), col("fp48").as("fp_a"),
      col("band_idx"), col("band_val"))
    val b = banded.select(col(idCol).as("id_b"), col("fp48").as("fp_b"),
      col("band_idx"), col("band_val"))
    a.join(b, Seq("band_idx", "band_val"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "fp_a", "fp_b").distinct()
      .withColumn("hamming", expr("bit_count(fp_a ^ fp_b)"))
      .filter(col("hamming") <= maxDist)
      .select("id_a", "id_b", "hamming")
  }
}
