package graft.tools

import scala.collection.mutable

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.engine.Tables
import graft.ext.Dedup

/** Dev probe, r19 sf10 regression hunt, part 2: the staged pipeline sums
  * to ~63s at sf10 while the registered x31 medians 380s — so the gap is
  * in the COLD composition, not any stage. Runs the registered query once
  * cold with a stage listener (top stages by duration, with shuffle
  * volumes), then the same pipeline with the candidate cache force-
  * materialized before the verify tail. Not part of the driver contract.
  *
  * Usage: runMain graft.tools.X31ColdProbe [sfDir]
  */
object X31ColdProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/graft_sf10")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    case class St(id: Int, wallMs: Long, tasks: Int, runMs: Long,
      cpuMs: Long, gcMs: Long, maxTaskMs: Long, rd: Long, wr: Long, sp: Long)
    val stages = mutable.ArrayBuffer[St]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val i = sc.stageInfo
        val m = i.taskMetrics
        stages += St(i.stageId,
          i.completionTime.getOrElse(0L) - i.submissionTime.getOrElse(0L),
          i.numTasks, m.executorRunTime, m.executorCpuTime / 1000000L,
          m.jvmGCTime, 0L,
          m.shuffleReadMetrics.totalBytesRead,
          m.shuffleWriteMetrics.bytesWritten,
          m.memoryBytesSpilled + m.diskBytesSpilled)
      }
    })

    def timed(label: String)(f: => Unit): Unit = {
      stages.clear()
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      f
      println(f"[x31cold] $label%-28s ${(System.nanoTime() - t0) / 1e9}%9.3f s")
      Thread.sleep(500) // let listener drain
      println(s"[x31cold]   ${stages.size} stages; top by duration:")
      stages.sortBy(-_.wallMs).take(12).foreach { s =>
        println(f"[x31cold]   stage ${s.id}%4d wall ${s.wallMs / 1000.0}%8.2f s  ${s.tasks}%3d tasks  run ${s.runMs / 1000.0}%9.2f s  cpu ${s.cpuMs / 1000.0}%9.2f s  gc ${s.gcMs / 1000.0}%8.2f s  shufRead ${s.rd / 1e6}%8.1f MB  shufWrite ${s.wr / 1e6}%8.1f MB  spill ${s.sp / 1e6}%7.1f MB")
      }
      Console.flush()
    }
    def noop(df: DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()

    timed("registered x31, cold") {
      noop(graft.SparkEntry.queries("x31_minhash_lsh")(spark, sfDir))
    }

    timed("same pipeline, cands forced") {
      val docs = Tables.documents(spark, sfDir)
      val sigs = Dedup.signatureColumns(docs, "doc_id", "text", 16)
      val cands = Dedup.lshCandidates(sigs, "doc_id", bands = 4, rows = 4)
        .cache()
      cands.count()
      val candIds = cands
        .select(explode(array(col("id_a"), col("id_b"))).as("doc_id"))
        .distinct()
      val sets = Dedup.shingleSets(
        docs.join(candIds, Seq("doc_id"), "left_semi"), "doc_id", "text")
      noop(Dedup.jaccardVerifySets(cands, sets, "doc_id")
        .filter(col("jaccard") >= 0.8)
        .select("id_a", "id_b", "common", "jaccard"))
    }
    spark.stop()
  }
}
