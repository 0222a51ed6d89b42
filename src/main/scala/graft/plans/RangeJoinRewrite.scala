package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.LongType

/** Optimizer rule: rewrite large-large range joins into bucket-prekeyed
  * equi-joins (the logical-plan form of [[graft.engine.RangeJoin]]).
  *
  * A join whose only cross-side condition is interval containment —
  * `p >= s AND p < e` with no equi-conjunct — has no equi-key for Spark to
  * hash on, so the planner falls back to BroadcastNestedLoopJoin: the
  * inner side must broadcast whole, and the probe is O(|L|·|R|). Correct
  * at any size, fatal at 100 TB. Users write that natural theta join; this
  * rule makes it scale:
  *
  *  - the (s, e) side gains a generated `_graft_bucket` column exploded
  *    over the coarse buckets the interval spans;
  *  - the point side gains its single bucket `floorDiv(p, B)`;
  *  - the join becomes an ordinary equi-join on the bucket (range
  *    predicates demoted to post-join filters), which shuffles, spills and
  *    AQE-balances like any other join. Each qualifying pair still emerges
  *    exactly once — a point matches an interval only in the point's own
  *    bucket.
  *
  * Fires only when BOTH sides exceed the broadcast threshold (a
  * broadcastable side makes BNLJ acceptable) or broadcasting is disabled.
  * Idempotent by construction: the rewritten join has an equi-conjunct, so
  * it no longer matches. Floor division is sign-correct (floor, not
  * truncate), so negative domains bucket consistently.
  *
  * Config: `spark.graft.rangeJoin.enabled` (default true),
  * `spark.graft.rangeJoin.bucket` (default 3600000 — one hour in ms;
  * pick ≈ the typical interval length so intervals explode to ≤2 rows).
  * Install session-wide via `spark.sql.extensions=
  * graft.functions.GraftExtensions` or ad hoc through
  * `spark.experimental.extraOptimizations`.
  */
object RangeJoinRewrite extends Rule[LogicalPlan] with PredicateHelper {

  private case class RangePattern(point: Expression, start: Expression,
      end: Expression)

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!conf.getConfString("spark.graft.rangeJoin.enabled", "true").toBoolean)
      return plan
    val bucket = conf.getConfString("spark.graft.rangeJoin.bucket",
      "3600000").toLong
    plan.transformUp {
      case j @ Join(left, right, Inner, Some(cond), hint)
          if cond.deterministic && bothLarge(left, right) =>
        rewrite(j, bucket).getOrElse(j)
    }
  }

  /** BNLJ is tolerable when one side broadcasts; only intervene beyond the
    * threshold (or when broadcasting is off entirely). */
  private def bothLarge(left: LogicalPlan, right: LogicalPlan): Boolean = {
    val thr = conf.autoBroadcastJoinThreshold
    thr < 0 ||
      (left.stats.sizeInBytes > thr && right.stats.sizeInBytes > thr)
  }

  private def sideOf(e: Expression, left: LogicalPlan,
      right: LogicalPlan): Option[Boolean] =
    if (e.references.isEmpty) None
    else if (e.references.subsetOf(left.outputSet)) Some(true)
    else if (e.references.subsetOf(right.outputSet)) Some(false)
    else None

  /** True if any conjunct is already a cross-side equality — Spark then
    * plans a hash join and the rewrite would only add work. */
  private def hasEquiPair(conjuncts: Seq[Expression], left: LogicalPlan,
      right: LogicalPlan): Boolean =
    conjuncts.exists {
      case EqualTo(a, b) =>
        (sideOf(a, left, right), sideOf(b, left, right)) match {
          case (Some(x), Some(y)) => x != y
          case _ => false
        }
      case _ => false
    }

  /** Find `point >= start` and `point < end` conjuncts (either operand
    * order) with the point on one side and both bounds on the other, all
    * LongType. */
  private def findPattern(conjuncts: Seq[Expression], left: LogicalPlan,
      right: LogicalPlan): Option[RangePattern] = {
    def long(e: Expression) = e.dataType == LongType
    val ge = conjuncts.collect {
      case GreaterThanOrEqual(p, s) if long(p) && long(s) => (p, s)
      case LessThanOrEqual(s, p) if long(p) && long(s) => (p, s)
    }
    val lt = conjuncts.collect {
      case LessThan(p, e) if long(p) && long(e) => (p, e)
      case GreaterThan(e, p) if long(p) && long(e) => (p, e)
    }
    (for {
      (p1, s) <- ge
      (p2, e) <- lt
      if p1.semanticEquals(p2)
      pSide <- sideOf(p1, left, right)
      sSide <- sideOf(s, left, right)
      eSide <- sideOf(e, left, right)
      if sSide == eSide && sSide != pSide
    } yield RangePattern(p1, s, e)).headOption
  }

  /** Sign-correct floor division by a positive literal bucket. */
  private def floorDiv(a: Expression, b: Long): Expression = {
    val bl = Literal(b, LongType)
    val q = new IntegralDivide(a, bl)
    If(LessThan(Remainder(a, bl), Literal(0L)),
      Subtract(q, Literal(1L)), q)
  }

  private def rewrite(j: Join, bucket: Long): Option[LogicalPlan] = {
    val Join(left, right, _, Some(cond), hint) = j
    val conjuncts = splitConjunctivePredicates(cond)
    if (hasEquiPair(conjuncts, left, right)) return None
    findPattern(conjuncts, left, right).map { pat =>
      val pointOnLeft = sideOf(pat.point, left, right).get
      val (pointSide, intervalSide) =
        if (pointOnLeft) (left, right) else (right, left)

      val pointBucket = AttributeReference("_graft_bucket_p", LongType,
        nullable = true)()
      val newPointSide = Project(
        pointSide.output :+ Alias(floorDiv(pat.point, bucket),
          pointBucket.name)(pointBucket.exprId), pointSide)

      // interval explodes to every bucket it spans; empty intervals
      // (e <= s) still get one valid bucket and are culled by the filter
      val lastBucket = floorDiv(
        Greatest(Seq(Subtract(pat.end, Literal(1L)), pat.start)), bucket)
      // TimeZoneAwareExpression: past analysis, the rule must supply the
      // zone itself or the plan regresses to unresolved
      val seq = new Sequence(floorDiv(pat.start, bucket), lastBucket,
        Literal(1L)).withTimeZone(conf.sessionLocalTimeZone)
      val ivBucket = AttributeReference("_graft_bucket_i", LongType,
        nullable = false)()
      val newIntervalSide = Generate(Explode(seq), unrequiredChildIndex = Nil,
        outer = false, qualifier = None, generatorOutput = Seq(ivBucket),
        child = intervalSide)

      val (newLeft, newRight) =
        if (pointOnLeft) (newPointSide, newIntervalSide)
        else (newIntervalSide, newPointSide)
      val newCond = And(cond, EqualTo(pointBucket, ivBucket))
      Project(j.output, Join(newLeft, newRight, Inner, Some(newCond), hint))
    }
  }
}
