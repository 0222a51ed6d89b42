package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract smoke: entry() non-empty, every query runs at sf0.001,
  * registry maps are consistent. */
class EntrySpec extends AnyFunSuite with SparkTestBase {

  test("entry returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracleSql and benchQueries keys are valid query names") {
    val qs = SparkEntry.queries.keySet
    assert(SparkEntry.oracleSql.keySet.subsetOf(qs))
    assert(SparkEntry.benchQueries.toSet.subsetOf(qs))
    assert(SparkEntry.benchQueries.nonEmpty)
  }

  test("driver bench extras exclude the S² q62 by default (r5 rc-124 pin)") {
    // q62_correlation_full is ~152s/rep at sf0.1 BY CONTRACT; putting it
    // back in the default extras is what cost round 5 its bench artifact.
    // It must only run under the explicit SPARK_GRAFT_EXTRA_Q62 opt-in.
    assert(!Bench.defaultExtras.contains("q62_correlation_full"))
    assert(Bench.defaultExtras.toSet.subsetOf(SparkEntry.queries.keySet),
      "stale name in Bench.defaultExtras")
    assert(Bench.defaultExtras.nonEmpty)
  }

  test("approx_count_distinct stays within 5% of exact (q35 accuracy bound)") {
    // q35's compared output carries only the 10% within-bound booleans
    // (oracle-stable); the tighter raw-sketch bound lives here, where an
    // engine-specific estimate needs no oracle
    import org.apache.spark.sql.functions._
    val rows = SparkEntry.queries("q35_approx_distinct")(spark,
      "/root/testdata/sf0.01").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("approx_parts_ok"), s"parts bound failed: $r")
      assert(r.getAs[Boolean]("approx_orders_ok"), s"orders bound failed: $r")
    }
    val raw = graft.engine.Tables.lineitem(spark, "/root/testdata/sf0.01")
      .groupBy("l_returnflag")
      .agg(approx_count_distinct(col("l_partkey"), 0.01).as("approx"),
        countDistinct(col("l_partkey")).as("exact"))
      .collect()
    raw.foreach { r =>
      val (approx, exact) = (r.getAs[Long]("approx"), r.getAs[Long]("exact"))
      assert(math.abs(approx - exact).toDouble / exact <= 0.05,
        s"approx $approx vs exact $exact drifted > 5%")
    }
  }

  test("every query is oracle-checked: the rows-only set is empty") {
    // pins the oracle surface: an accidentally dropped oracleSql entry
    // (silently downgrading a query to a rows-only check) fails here.
    // q35 (HLL) re-joined the oracle set in round 6 by comparing exact
    // counts + within-bound booleans instead of raw sketch values; the
    // trained-KMeans IVF (former x42) is spec-only since round 5 — its
    // deterministic twin x85 carries the oracle for that path
    val rowsOnly = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(rowsOnly.isEmpty, s"unexpected rows-only queries: $rowsOnly")
  }

  test("every declared query executes and returns rows at sf0.001") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try {
          if (fn(spark, "/root/testdata/sf0.001").count() >= 0) None
          else Some(name)
        } catch { case e: Throwable => Some(s"$name: ${e.getMessage}") }
    }
    assert(failures.isEmpty, failures.mkString("; "))
  }
}
