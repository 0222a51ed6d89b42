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
  * Idempotent by construction: the rewritten joins carry equi-conjuncts,
  * so they no longer match. Floor division is sign-correct (floor, not
  * truncate), so negative domains bucket consistently.
  *
  * Wide/open-ended intervals (sentinel ends like Long.MaxValue, spans
  * beyond `maxBuckets` buckets) must not explode into billions of
  * generated rows: the rewrite splits the interval side by width. Narrow
  * intervals take the exploded-bucket join; wide ones take a salted
  * restricted-cross branch (interval replicated to `wideFanout` salts,
  * point hashed to one) — a wide interval matches a large share of points
  * anyway, so that branch is the honest floor, and it is distributed
  * across `wideFanout` partitions instead of one broadcast. The two
  * branches union; each qualifying pair emerges exactly once.
  *
  * Config: `spark.graft.rangeJoin.enabled` (default true),
  * `spark.graft.rangeJoin.bucket` (default 3600000 — one hour in ms;
  * pick ≈ the typical interval length so intervals explode to ≤2 rows),
  * `spark.graft.rangeJoin.maxBuckets` (default 256 — width cutoff),
  * `spark.graft.rangeJoin.wideFanout` (default 32 — wide-branch salts).
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

  /** True if any conjunct is already a cross-side equality (incl. the
    * null-safe form) — Spark then plans a hash join and the rewrite would
    * only add work. */
  private def hasEquiPair(conjuncts: Seq[Expression], left: LogicalPlan,
      right: LogicalPlan): Boolean = {
    def crossSide(a: Expression, b: Expression) =
      (sideOf(a, left, right), sideOf(b, left, right)) match {
        case (Some(x), Some(y)) => x != y
        case _ => false
      }
    conjuncts.exists {
      case EqualTo(a, b) => crossSide(a, b)
      case EqualNullSafe(a, b) => crossSide(a, b)
      case _ => false
    }
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
    val maxBuckets = conf.getConfString("spark.graft.rangeJoin.maxBuckets",
      "256").toLong
    val wideFanout = conf.getConfString("spark.graft.rangeJoin.wideFanout",
      "32").toLong
    findPattern(conjuncts, left, right).map { pat =>
      val pointOnLeft = sideOf(pat.point, left, right).get
      val (pointSide, intervalSide) =
        if (pointOnLeft) (left, right) else (right, left)

      def mkJoin(newIntervalSide: LogicalPlan, ivKey: Attribute,
          newPointSide: LogicalPlan, ptKey: Attribute): LogicalPlan = {
        val (newLeft, newRight) =
          if (pointOnLeft) (newPointSide, newIntervalSide)
          else (newIntervalSide, newPointSide)
        Project(j.output,
          Join(newLeft, newRight, Inner,
            Some(And(cond, EqualTo(ptKey, ivKey))), hint))
      }

      val firstBucket = floorDiv(pat.start, bucket)
      // empty intervals (e <= s) still get one valid bucket; the range
      // filter culls their rows
      val lastBucket = floorDiv(
        Greatest(Seq(Subtract(pat.end, Literal(1L)), pat.start)), bucket)
      // width guard: a sentinel/open-ended interval (e.g. e = Long.MaxValue)
      // must not explode into billions of buckets — see wide branch below.
      // The subtraction runs in TRY mode: bounds near Long.Min/MaxValue
      // with a small bucket overflow the diff, which under ANSI (Spark 4
      // default) would error and under LEGACY would wrap NEGATIVE and
      // misclassify an astronomically wide interval as narrow. TRY yields
      // NULL on overflow; COALESCE(cond, false) then routes the row to the
      // wide branch (a bare NULL would drop it from BOTH branches).
      val widthDiff = Subtract(lastBucket, firstBucket,
        NumericEvalContext(EvalMode.TRY))
      val narrowCond = Coalesce(Seq(
        And(GreaterThanOrEqual(widthDiff, Literal(0L)),
          LessThan(widthDiff, Literal(maxBuckets))),
        Literal(false)))

      // NARROW branch (the common case): interval explodes to the ≤
      // maxBuckets buckets it spans; point keyed by its single bucket.
      val pointBucket = AttributeReference("_graft_bucket_p", LongType,
        nullable = true)()
      val narrowPointSide = Project(
        pointSide.output :+ Alias(floorDiv(pat.point, bucket),
          pointBucket.name)(pointBucket.exprId), pointSide)
      // TimeZoneAwareExpression: past analysis, the rule must supply the
      // zone itself or the plan regresses to unresolved
      val seq = new Sequence(firstBucket, lastBucket, Literal(1L))
        .withTimeZone(conf.sessionLocalTimeZone)
      val ivBucket = AttributeReference("_graft_bucket_i", LongType,
        nullable = false)()
      val narrowIntervalSide = Generate(Explode(seq),
        unrequiredChildIndex = Nil, outer = false, qualifier = None,
        generatorOutput = Seq(ivBucket),
        child = Filter(narrowCond, intervalSide))
      val narrowJoin = mkJoin(narrowIntervalSide, ivBucket,
        narrowPointSide, pointBucket)

      // WIDE branch (rare: intervals spanning > maxBuckets buckets): a
      // wide interval matches a large fraction of points anyway, so the
      // honest floor is a restricted cross — distributed by salting: the
      // interval replicates to `wideFanout` salts, each point hashes to
      // one. The salt equality is itself an equi-pair, so this join can
      // never re-match the rule (termination), and each pair still
      // emerges exactly once.
      val ptSalt = AttributeReference("_graft_salt_p", LongType,
        nullable = false)()
      val widePointSide = Project(
        pointSide.output :+ Alias(Cast(Pmod(new Murmur3Hash(Seq(pat.point)),
          Literal(wideFanout.toInt)), LongType), ptSalt.name)(ptSalt.exprId),
        pointSide)
      val ivSalt = AttributeReference("_graft_salt_i", LongType,
        nullable = false)()
      val saltSeq = new Sequence(Literal(0L), Literal(wideFanout - 1),
        Literal(1L)).withTimeZone(conf.sessionLocalTimeZone)
      val wideIntervalSide = Generate(Explode(saltSeq),
        unrequiredChildIndex = Nil, outer = false, qualifier = None,
        generatorOutput = Seq(ivSalt),
        child = Filter(Not(narrowCond), intervalSide))
      val wideJoin = mkJoin(wideIntervalSide, ivSalt, widePointSide, ptSalt)

      Union(Seq(narrowJoin, wideJoin))
    }
  }
}
