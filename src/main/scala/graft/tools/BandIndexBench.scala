package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ext.Dedup

/** Micro-benchmark for the persistent LSH band index (round 10): what
  * does a daily-ingest probe pay with the in-memory cross-frame path
  * (re-band + re-count the WHOLE history every batch) vs a maintained
  * [[Dedup.BandIndex]] (banded once at build, sizes precomputed, probes
  * exchange only the batch)?
  *
  * Synthetic signatures: a fraction of batch docs duplicate history
  * signatures exactly (realistic hit rate), the rest unique.
  *
  * Usage: runMain graft.tools.BandIndexBench [nHistory] [nBatch] [probes]
  */
object BandIndexBench {
  def main(args: Array[String]): Unit = {
    val nHist = if (args.length > 0) args(0).toInt else 2000000
    val nBatch = if (args.length > 1) args(1).toInt else 50000
    val probes = if (args.length > 2) args(2).toInt else 3
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // history doc i: signature derived from its dup-group (pairs of 2
    // share a signature → realistic non-mega buckets); batch doc i:
    // 10% collide with a history group, 90% unique
    def sig(groupCol: org.apache.spark.sql.Column) =
      (0 until 16).map(i => (groupCol * 31 + i * 7).cast("long").as(s"m$i"))
    // cast the GROUP before multiplying: Spark `/` is double division, so
    // `sig(col("id") / 2)` would give odd ids floor((h/2)*31+7i) — never
    // the even partner's signature — and history buckets would be mostly
    // singletons (the SkewBench.lshGuardRace form)
    val hist = spark.range(nHist).select(
      (col("id").as("doc_id") +: sig((col("id") / 2).cast("long"))): _*)
    val batch = spark.range(nHist, nHist.toLong + nBatch).select(
      (col("id").as("doc_id") +: sig(
        when(col("id") % 10 === 0, (col("id") % (nHist / 2)))
          .otherwise(col("id") * 1000 + 7))): _*)

    def time(f: => Long): (Double, Long) = {
      val t0 = System.nanoTime(); val n = f
      ((System.nanoTime() - t0) / 1e9, n)
    }
    def med(xs: Seq[Double]) = xs.sorted.apply(xs.size / 2)

    // A: in-memory cross-frame — full history re-banded per probe
    val acrossTimes = (1 to probes).map { _ =>
      time(Dedup.lshCandidatesAcross(batch, hist, "doc_id").count())
    }
    // B: build+persist once, probe-only thereafter
    val dir = java.nio.file.Files.createTempDirectory("bandidx-bench").toString
    val (buildSec, _) = time {
      Dedup.bandIndexSave(Dedup.bandIndexBuild(hist, "doc_id"),
        "bandidx_bench_t", dir, nBuckets = 32)
      0L
    }
    val loaded = Dedup.bandIndexLoad(spark, "bandidx_bench_t", dir)
    val deltaTimes = (1 to probes).map { _ =>
      time(Dedup.lshCandidatesDelta(batch, loaded, "doc_id").count())
    }
    // maintenance cost: one batch append against this history size. The
    // incremental sizes merge (round 11) makes this flat across nHistory
    // — the headline evidence is this number at 2M vs 8M history.
    val appendBatch = spark.range(nHist.toLong + nBatch,
      nHist.toLong + 2L * nBatch).select(
      (col("id").as("doc_id") +: sig(col("id") * 1000 + 13)): _*)
    val (appendSec, _) = time {
      Dedup.bandIndexAppend(appendBatch, "doc_id", "bandidx_bench_t", dir,
        nBuckets = 32)
      0L
    }
    require(acrossTimes.head._2 == deltaTimes.head._2,
      s"paths disagree: ${acrossTimes.head._2} vs ${deltaTimes.head._2}")
    // small-file rot + compaction payoff: 20 more small appends (one
    // file per touched bucket each), probe, compact back to one file per
    // bucket, probe again
    (0 until 20).foreach { k =>
      val start = nHist.toLong + 2L * nBatch + k.toLong * 1000
      val mini = spark.range(start, start + 1000).select(
        (col("id").as("doc_id") +: sig(col("id") * 1000 + 17)): _*)
      Dedup.bandIndexAppend(mini, "doc_id", "bandidx_bench_t", dir,
        nBuckets = 32)
    }
    val rotted = Dedup.bandIndexLoad(spark, "bandidx_bench_t", dir)
    val rottedProbe = med((1 to probes).map(_ =>
      time(Dedup.lshCandidatesDelta(batch, rotted, "doc_id").count())._1))
    val (compactSec, _) = time {
      Dedup.compactBandIndex(spark, "bandidx_bench_t", dir, nBuckets = 32)
      0L
    }
    val compacted = Dedup.bandIndexLoad(spark, "bandidx_bench_t", dir)
    val compactedProbe = med((1 to probes).map(_ =>
      time(Dedup.lshCandidatesDelta(batch, compacted, "doc_id").count())._1))
    // retention delete (round 11): tombstone a batch-sized victim slice.
    // Cost model = one probe-class scan (victim bucket counts) + the
    // small sizes merge — across 2M vs 8M history only the scan term
    // grows, like the probe itself; the probe after the delete pays one
    // extra broadcast anti-join against the tombstone set
    val victims = spark.range(0, nBatch).select(col("id").as("doc_id"))
    val (deleteSec, nTombstoned) = time(
      Dedup.bandIndexDelete(victims, "doc_id", "bandidx_bench_t", dir))
    val afterDel = Dedup.bandIndexLoad(spark, "bandidx_bench_t", dir)
    val deletedProbe = med((1 to probes).map(_ =>
      time(Dedup.lshCandidatesDelta(batch, afterDel, "doc_id").count())._1))
    println(s"""{"metric":"band_index","n_history":$nHist,"n_batch":$nBatch,""" +
      s""""pairs":${deltaTimes.head._2},"probes":$probes,""" +
      f""""across_probe_sec":${med(acrossTimes.map(_._1))}%.3f,""" +
      f""""build_sec":$buildSec%.3f,""" +
      f""""append_sec":$appendSec%.3f,""" +
      f""""delta_probe_sec":${med(deltaTimes.map(_._1))}%.3f,""" +
      f""""probe_after_20_appends_sec":$rottedProbe%.3f,""" +
      f""""compact_sec":$compactSec%.3f,""" +
      f""""probe_after_compact_sec":$compactedProbe%.3f,""" +
      s""""n_tombstoned":$nTombstoned,""" +
      f""""delete_sec":$deleteSec%.3f,""" +
      f""""probe_after_delete_sec":$deletedProbe%.3f}""")
    spark.sql("DROP TABLE IF EXISTS bandidx_bench_t")
    spark.stop()
  }
}
