package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.{StreamingCorpusIngest, StreamingDecontaminate}

/** The composed corpus-ingest pipeline: decontaminate → in-batch keepers
  * → delta dedup vs store → idempotent append. */
class StreamingCorpusIngestSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private val benchDoc = "secret eval question about spark internals"
  private def bench = Seq((0L, benchDoc)).toDF("doc_id", "text")

  private val uniq = (id: Long) =>
    (id, s"wholly unique document number $id with its own content words $id")

  test("stream ingest: drops contaminated, in-batch dups, and cross-batch dups") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val store = java.nio.file.Files.createTempDirectory("corpus").toString + "/store"
    val ckpt = java.nio.file.Files.createTempDirectory("ckpt").toString
    val hashes = StreamingDecontaminate.benchmarkHashes(bench, "text")

    val dupText = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    // batch 1: two uniques + an in-batch dup pair (11 keeps, 12 drops) +
    //          a contaminated doc (13 drops)
    val b1 = Seq(uniq(1), uniq(2), (11L, dupText), (12L, dupText + " mu"),
      (13L, benchDoc + " padded"))
    // batch 2: a cross-batch dup of 11 (21 drops) + a fresh unique (22)
    val b2 = Seq((21L, dupText + " nu"), uniq(22))

    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val q = StreamingCorpusIngest.ingest(
      input.toDF().toDF("doc_id", "text"), store, hashes, ckpt)
    try {
      Seq(b1, b2).foreach { b => input.addData(b); q.processAllAvailable() }
    } finally q.stop()

    val stored = spark.read.parquet(store)
    assert(stored.select("doc_id").as[Long].collect().sorted.toSeq ==
      Seq(1L, 2L, 11L, 22L))
    // signatures persisted alongside (the no-rehash-history contract)
    assert((0 until 16).forall(i => stored.columns.contains(s"m$i")))
    assert(stored.filter(col("m0").isNull).count() == 0)
  }

  test("crash debris is not history: a _temporary-only store dir takes " +
      "the no-history branch instead of crash-looping on schema inference") {
    val store = java.nio.file.Files.createTempDirectory("corpus-debris")
      .toString + "/store"
    // a first batch that died mid-write leaves only an uncommitted
    // _temporary tree (possibly with orphan part files inside)
    val tmp = new java.io.File(s"$store/_temporary/0/task/")
    assert(tmp.mkdirs())
    assert(new java.io.File(tmp, "part-00000.snappy.parquet").createNewFile())
    val hashes = StreamingDecontaminate.benchmarkHashes(bench, "text")
    val n = StreamingCorpusIngest.ingestBatch(
      Seq(uniq(1), uniq(2)).toDF("doc_id", "text"), store, hashes,
      batchId = 0L)
    assert(n == 2, s"retry of a crashed first batch must admit, got $n")
    assert(spark.read.parquet(store).select("doc_id").as[Long]
      .collect().sorted.toSeq == Seq(1L, 2L))
  }

  test("ingestBatch replay overwrites its own partition (exactly-once)") {
    val store = java.nio.file.Files.createTempDirectory("corpus2").toString + "/store"
    val hashes = StreamingDecontaminate.benchmarkHashes(bench, "text")
    val b = Seq(uniq(1), uniq(2)).toDF("doc_id", "text")
    StreamingCorpusIngest.ingestBatch(b, store, hashes, batchId = 0L)
    StreamingCorpusIngest.ingestBatch(b, store, hashes, batchId = 0L) // replay
    assert(spark.read.parquet(store).count() == 2,
      "replayed micro-batch must not double-append")
  }
}
