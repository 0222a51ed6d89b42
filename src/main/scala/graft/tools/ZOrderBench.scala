package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.engine.Store

/** Z-order layout measurement ([[Store.saveZOrdered]] vs the ts-linear
  * [[Store.save]] convention): wall-clock, bytes actually read (task
  * input metrics — row-group skipping shows up here, not in file
  * counts), and candidate-file counts from footer stats, for point/key
  * predicates, ts-range predicates, and the conjunction.
  *
  * Corpus: deterministic synthetic events (users × a 30-day ms grid) —
  * no RNG, reruns bit-stable. Queries run through a count() so the scan
  * + pushed filters execute end to end.
  *
  * Usage: runMain graft.tools.ZOrderBench [rows] [users] [nFiles] [reps]
  */
object ZOrderBench {
  def main(args: Array[String]): Unit = {
    val rows = if (args.length > 0) args(0).toLong else 5000000L
    val users = if (args.length > 1) args(1).toInt else 1000
    val nFiles = if (args.length > 2) args(2).toInt else 64
    val reps = if (args.length > 3) args(3).toInt else 3
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val bytesRead = new java.util.concurrent.atomic.AtomicLong(0L)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
        if (t.taskMetrics != null)
          bytesRead.addAndGet(t.taskMetrics.inputMetrics.bytesRead)
    })

    val dayMs = 86400000L
    val t0 = 1704067200000L // 2024-01-01T00:00:00Z
    // deterministic scatter: user from a multiplicative hash of the row
    // id, ts striding the 30-day window — every (user, time) region is
    // populated, which is the layout-stress shape
    val ev = spark.range(rows).select(
      col("id").as("event_id"),
      (col("id") * 2654435761L % users).cast("int").as("user_id"),
      timestamp_millis(lit(t0) + (col("id") * 104729L) % (30 * dayMs))
        .as("ts"),
      (col("id") % 997).cast("double").as("value"))

    val dir = java.nio.file.Files.createTempDirectory("zbench").toString
    ev.repartitionByRange(nFiles, col("ts")).sortWithinPartitions("ts")
      .write.mode("overwrite").parquet(s"$dir/linear")
    Store.saveZOrdered(ev, s"$dir/z", Seq("user_id", "ts"), nFiles = nFiles)

    def timed(body: => Long): (Long, Double, Long) = {
      val b0 = bytesRead.get()
      val s0 = System.nanoTime()
      val n = body
      val sec = (System.nanoTime() - s0) / 1e9
      Thread.sleep(200) // let straggler task-end events drain
      (n, sec, bytesRead.get() - b0)
    }
    def median(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)

    val qUser = 497
    val rLo = "2024-01-10 00:00:00"
    val rHi = "2024-01-11 00:00:00"
    val cases: Seq[(String, org.apache.spark.sql.DataFrame => org.apache.spark.sql.Column)] = Seq(
      "key_point" -> (_ => col("user_id") === qUser),
      "ts_range" -> (_ => col("ts") >= lit(rLo).cast("timestamp") &&
        col("ts") < lit(rHi).cast("timestamp")),
      "key_and_ts" -> (_ => col("user_id") === qUser &&
        col("ts") >= lit(rLo).cast("timestamp") &&
        col("ts") < lit(rHi).cast("timestamp")))

    val out = Seq("linear", "z").flatMap { layout =>
      val df = spark.read.parquet(s"$dir/$layout")
      cases.map { case (name, pred) =>
        val runs = (0 to reps).map { _ =>
          timed(df.filter(pred(df)).count())
        }.drop(1) // uncounted warm-up (the round-10 lesson)
        val n = runs.head._1
        f""""${layout}_$name":{"rows":$n,""" +
          f""""sec":${median(runs.map(_._2))}%.3f,""" +
          f""""mb_read":${median(runs.map(_._3.toDouble / 1e6))}%.1f}"""
      }
    }

    // cross-check: both layouts must return identical counts per case
    val countsAgree = cases.forall { case (_, pred) =>
      val a = spark.read.parquet(s"$dir/linear")
      val b = spark.read.parquet(s"$dir/z")
      a.filter(pred(a)).count() == b.filter(pred(b)).count()
    }

    // heavy-tailed fixture (VERDICT r11 #5): `value` uniform plus one
    // 1e15 outlier — min–max z collapses that dimension to cell 0 and
    // every file becomes a candidate for a normal-range value
    // predicate; the rank-bucketed form keeps equal-population cells.
    // Candidate files counted from footer min–max stats and bytes read
    // from the executed scan.
    val ht = spark.range(rows / 5).select(
      col("id").as("event_id"),
      when(col("id") === 0, lit(1e15))
        .otherwise((col("id") * 7919L % 100000L).cast("double")).as("v"),
      (col("id") * 104729L % 100000L).as("b"))
    Store.saveZOrdered(ht, s"$dir/ht_mm", Seq("v", "b"), nFiles = nFiles)
    Store.saveZOrdered(ht, s"$dir/ht_rank", Seq("v", "b"), nFiles = nFiles,
      rank = true)
    def vCand(path: String, lo: Double, hi: Double): Int = {
      val fs = org.apache.hadoop.fs.FileSystem.get(
        new java.net.URI(path), spark.sparkContext.hadoopConfiguration)
      // footer statistics, not a data scan — the same metadata the
      // pruning reads, at one footer seek per file (ADVICE r12)
      fs.listStatus(new org.apache.hadoop.fs.Path(path))
        .filter(_.getPath.getName.startsWith("part-")).count { f =>
          Store.footerMinMax(spark, f.getPath.toString, "v")
            .exists { case (mn, mx) => mn <= hi && lo <= mx }
        }
    }
    val (vLo, vHi) = (50000.0, 50500.0)
    val htOut = Seq("ht_mm", "ht_rank").map { layout =>
      val df = spark.read.parquet(s"$dir/$layout")
      val runs = (0 to reps).map { _ =>
        timed(df.filter(col("v") >= vLo && col("v") <= vHi).count())
      }.drop(1)
      f""""${layout}_v_range":{"rows":${runs.head._1},""" +
        f""""sec":${median(runs.map(_._2))}%.3f,""" +
        f""""mb_read":${median(runs.map(_._3.toDouble / 1e6))}%.1f,""" +
        f""""cand_files":${vCand(s"$dir/$layout", vLo, vHi)}}"""
    }
    val htAgree = {
      val a = spark.read.parquet(s"$dir/ht_mm")
      val b = spark.read.parquet(s"$dir/ht_rank")
      a.filter(col("v") >= vLo && col("v") <= vHi).count() ==
        b.filter(col("v") >= vLo && col("v") <= vHi).count()
    }

    println(
      s"""{"metric":"zorder_bench","rows":$rows,"users":$users,""" +
      s""""n_files":$nFiles,"reps":$reps,"counts_agree":$countsAgree,""" +
      s""""ht_counts_agree":$htAgree,""" +
      (out ++ htOut).mkString(",") + "}")
    spark.stop()
  }
}
