package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ext.{Similarity, Sq}
import graft.streaming.IndexIngest

/** ONE index, the WHOLE lifecycle, in sequence — the integration pin
  * the per-edge specs (SqSpec / IvfIndexSpec / StreamingIndexIngestSpec)
  * compose pairwise but never chain: every maintenance op hands the
  * next one a state it must accept, and the r14 retrain/observability
  * additions join a lifecycle that already had append / delete /
  * compact / streaming in it. The scenario is the production shape of
  * a compressed embedding index: built offline on day-one data, saved
  * WITH its decode key, grown by an exactly-once stream, subjected to
  * retention deletes, compacted, monitored, and finally re-fit when
  * the corpus outgrows the quantizer — with every probe family exact
  * or agreement-pinned at the end, on the state all of that produced. */
class VectorLifecycleSpec extends AnyFunSuite with SparkTestBase {

  private val sf = "/root/testdata/sf0.001"
  private def corpus = spark.read.parquet(s"$sf/embeddings.parquet")

  test("SQ index end-to-end: build -> save(+params) -> streamed epochs " +
      "-> delete -> compact -> describe -> growth retrain -> every " +
      "probe family consistent on the final state") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("vlife").toString
    val ckpt = java.nio.file.Files.createTempDirectory("vlife-ckpt").toString
    val nCells = 2 // deliberately undersized: the growth retrain must fire
    val dayOne = corpus.filter(col("vec_id") % 2 === 0)
    val p = Sq.sqTrain(corpus) // bounds trained on the full corpus shape

    // 1. offline build + save WITH the decode key
    Sq.ivfSqSave(Sq.ivfSqEncode(Similarity.ivfBuild(dayOne, nCells = nCells),
      p, "vec_id"), p, "vlife_t", dir, nCells)
    try {
      // 2. exactly-once stream grows the index in two epochs; the
      // growth policy is ARMED with the params (the compressed form)
      val target = corpus.count() / 6 // epoch-1 live clears 2*target*nCells
      implicit val sqc: org.apache.spark.sql.SQLContext = spark.sqlContext
      val enc: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame =
        df => Sq.sqEncode(df, "embedding", p)
          .select(col("vec_id"), col("cell"), col("codes"), col("recon_norm"))
      val input = MemoryStream[(Long, Seq[Float], Int)]
      val q = input.toDF().toDF("vec_id", "embedding", "label").writeStream
        .foreachBatch(IndexIngest.ivfSink("vec_id", "embedding",
          "vlife_t", dir, nCells, maxFilesPerCell = 2, encode = enc,
          retrainRowsPerCell = target, sqParams = Some(p)))
        .option("checkpointLocation", ckpt).start()
      val rest = corpus.filter(col("vec_id") % 2 =!= 0)
        .select(col("vec_id").cast("long"), col("embedding"),
          col("label").cast("int"))
        .as[(Long, Seq[Float], Int)].collect().toSeq
      val (b1, b2) = rest.splitAt(rest.size / 2)
      try {
        Seq(b1, b2).foreach { b => input.addData(b); q.processAllAvailable() }
      } finally q.stop()
      val d1 = Similarity.ivfDescribe(spark, dir).collect()(0)
      assert(d1.getAs[Long]("physical_rows") == corpus.count(),
        "stream must have grown the index to the full corpus")
      assert(d1.getAs[Long]("n_cells") > nCells,
        "the armed growth policy must have re-fit mid-stream")
      val grownCells = d1.getAs[Long]("n_cells").toInt

      // 3. retention delete + compact: tombstones fold away physically
      val victims = Seq(2L, 4L, 6L)
      assert(Similarity.ivfDelete(victims.toDF("vec_id"), "vec_id",
        "vlife_t", dir) == victims.length)
      Similarity.ivfCompact(spark, "vlife_t", dir, grownCells)
      val d2 = Similarity.ivfDescribe(spark, dir).collect()(0)
      assert(d2.getAs[Long]("physical_rows") ==
        corpus.count() - victims.length)
      assert(d2.getAs[Long]("tombstoned_ids") == 0L)

      // 4. monitoring on the post-compact state, through the stored key
      val pStored = Sq.sqParamsOf(spark, dir)
      assert(pStored == p, "the decode key survived the whole lifecycle")
      assert(!Sq.sqSaturationExceeded(spark, dir, params = Some(pStored)),
        "an in-bounds corpus must not read as bounds drift")

      // 5. one more explicit retrain on the mutated state (the batch
      // form this time), then the final probe-family consistency sweep
      val re = Sq.ivfSqRetrain(spark, "vlife_t", dir,
        nCells = grownCells, p = pStored)
      val live = corpus.filter(!col("vec_id").isin(victims: _*))
      assert(re.assigned.count() == live.count())

      val qdf = corpus.filter(col("vec_id") === 7)
      val qVec = qdf.select(transform(col("embedding"),
        x => x.cast("double"))).head.getSeq[Double](0).toIndexedSeq
      // exhaustive single probe == the flat scorer over the live rows
      val exhaustive = Sq.ivfSqProbe(re, pStored, qdf, "vec_id",
        nProbe = grownCells, k = 10).collect().toSeq
      val flat = Sq.sqTopK(Sq.sqEncode(live, "embedding", pStored),
        pStored, qVec, "vec_id", k = 10).collect().toSeq
      assert(exhaustive == flat, "exhaustive probe exact on the final state")
      // deleted ids are unreachable through any probe
      assert(!exhaustive.exists(r => victims.contains(r.getLong(0))))
      // bulk == per-query on the final state
      val qIds = Seq(1L, 7L, 13L)
      val queries = live.filter(col("vec_id").isin(qIds: _*))
        .select(col("vec_id").as("q_id"), col("embedding"))
      val bulk = Sq.ivfSqProbeBulk(re, pStored, queries, "q_id", "vec_id",
        nProbe = 2, k = 5).collect()
        .groupBy(_.getLong(0))
        .map { case (k, rs) => k -> rs.map(_.getLong(1)).toSeq }
      qIds.foreach { qid =>
        val per = Sq.ivfSqProbe(re, pStored,
          live.filter(col("vec_id") === qid), "vec_id", nProbe = 2, k = 5)
          .collect().map(_.getLong(0)).toSeq
        assert(bulk(qid) == per, s"bulk != per-query at q=$qid")
      }
      // two-stage exact rerank with covering candidates == brute force
      val n = live.count().toInt
      assert(Sq.ivfSqProbe(re, pStored, qdf, "vec_id",
          nProbe = grownCells, k = 5, rerankWith = Some(live),
          rerankFactor = n).collect().toSeq ==
        Similarity.bruteForceTopK(live, qdf, "vec_id", k = 5)
          .collect().toSeq,
        "covering rerank must be exact on the final state")
    } finally spark.sql("DROP TABLE IF EXISTS vlife_t")
  }
}
