package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.engine.{IndicatorQueries, Queries}
import graft.ext.{CurationQueries, ExtQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  private def registry: Map[String, Queries.Q] =
    Queries.all ++ ExtQueries.all ++ IndicatorQueries.all ++
      CurationQueries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Queries.all("q01_resample_1h").fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map { case (name, q) => name -> q.fn }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted entries get a rows-only check. */
  def oracleSql: Map[String, String] =
    registry.collect { case (name, q) if q.oracle.isDefined =>
      name -> q.oracle.get.linesIterator.map(_.trim).mkString(" ").trim
    }

  /** Headline subset used by [[Bench]]. */
  def benchQueries: Seq[String] =
    registry.collect { case (name, q) if q.bench => name }.toSeq.sorted
}
