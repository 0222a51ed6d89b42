package graft.tools

import scala.collection.mutable

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Dev probe, r20: generic per-stage attribution for ANY registered
  * query — the X31ColdProbe stage listener generalized, so the round's
  * "where does the wall-clock actually go" question has one answer tool
  * instead of a per-query probe each time. For each query: one uncounted
  * warm-up rep (JIT), then `reps` measured reps; each rep prints total
  * wall plus the top stages by duration (wall, tasks, run/cpu/gc,
  * shuffle read/write, spill). Not part of the driver contract.
  *
  * Usage: runMain graft.tools.StageProbe <sfDir> <reps> <query> [query ...]
  */
object StageProbe {
  def main(args: Array[String]): Unit = {
    val (sfDir, reps, names) = (args(0), args(1).toInt, args.drop(2).toSeq)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    case class St(id: Int, wallMs: Long, tasks: Int, runMs: Long,
      cpuMs: Long, gcMs: Long, rd: Long, wr: Long, sp: Long)
    val stages = mutable.ArrayBuffer[St]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val i = sc.stageInfo
        val m = i.taskMetrics
        stages.synchronized {
          stages += St(i.stageId,
            i.completionTime.getOrElse(0L) - i.submissionTime.getOrElse(0L),
            i.numTasks, m.executorRunTime, m.executorCpuTime / 1000000L,
            m.jvmGCTime,
            m.shuffleReadMetrics.totalBytesRead,
            m.shuffleWriteMetrics.bytesWritten,
            m.memoryBytesSpilled + m.diskBytesSpilled)
        }
      }
    })

    def clearState(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
    }
    def once(n: String): Double = {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(n)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }

    names.foreach { n =>
      clearState()
      try once(n) catch { case t: Throwable =>
        println(s"[probe] $n warm-up FAILED: ${t.getMessage}") }
      (1 to reps).foreach { r =>
        clearState()
        stages.synchronized(stages.clear())
        val sec = once(n)
        Thread.sleep(300) // listener drain
        println(f"[probe] $n rep $r%d  total $sec%8.3f s")
        val snap = stages.synchronized(stages.toVector)
        snap.sortBy(-_.wallMs).take(10).foreach { s =>
          println(f"[probe]   stage ${s.id}%4d wall ${s.wallMs / 1000.0}%7.2f s  ${s.tasks}%3d tasks  run ${s.runMs / 1000.0}%8.2f s  cpu ${s.cpuMs / 1000.0}%8.2f s  gc ${s.gcMs / 1000.0}%6.2f s  rd ${s.rd / 1e6}%8.1f MB  wr ${s.wr / 1e6}%8.1f MB  spill ${s.sp / 1e6}%7.1f MB")
        }
        Console.flush()
      }
    }
    spark.stop()
  }
}
