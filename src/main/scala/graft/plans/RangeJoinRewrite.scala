package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{LongType, TimestampType}

/** Opt-in optimizer rule turning a point-in-interval theta-join into
  * the bucketed equi-join of `graft.operators.RangeJoin` — so that a
  * user writing plain SQL
  *
  * {{{ SELECT ... FROM points p JOIN iv
  *     ON p.key = iv.key AND p.ts BETWEEN iv.lo AND iv.hi }}}
  *
  * gets a shuffled hash/sort-merge join on (key, axis-bucket) instead
  * of the per-key nested-loop Catalyst plans for range predicates.
  *
  * Fires only when ALL of:
  *  - `spark.graft.rangeJoin.bucketWidth` is set (the width is the
  *    user's assertion about typical interval length — there is no
  *    safe way to guess it from a logical plan);
  *  - the join is INNER with a conjunctive condition containing at
  *    least `point >= lo AND point <= hi` over long or timestamp
  *    attributes (timestamps bucket by epoch micros, so the width conf
  *    is in microseconds for them), point on one side and both bounds
  *    on the other (BETWEEN parses to exactly this);
  *  - neither side is small enough to broadcast (a broadcast
  *    nested-loop over a dimension-sized interval table is already the
  *    right plan — the rewrite would only add a shuffle).
  *
  * The rewrite keeps the original predicates in the new join condition
  * (bucket equality is a pure refinement), so results are identical by
  * construction; buckets of a contained point always lie inside the
  * interval's bucket span because truncating division is monotone.
  * Unlike the operator API there is no long-interval fallback path —
  * a mis-set width degrades to more explode rows, never to wrong
  * results. Registered via `GraftExtensions.injectOptimizerRule`.
  */
object RangeJoinRewrite extends Rule[LogicalPlan] with PredicateHelper {

  val WidthKey = "spark.graft.rangeJoin.bucketWidth"
  /** Attribute-name marker preventing re-rewrite of produced joins. */
  private val BucketName = "__graft_bucket"

  /** Axis value as a long: LongType attributes as-is, TimestampType
    * via epoch micros (so `width` is in MICROSECONDS for timestamp
    * axes — e.g. 3600000000 for hourly buckets). */
  private def axis(e: Expression): Expression =
    if (e.dataType == TimestampType) UnixMicros(e) else e

  private def bucketOf(e: Expression, width: Long): Expression =
    IntegralDivide(axis(e), Literal(width))

  private def sideAttr(e: Expression, side: LogicalPlan): Option[Attribute] =
    e match {
      case a: AttributeReference
        if (a.dataType == LongType || a.dataType == TimestampType) &&
          side.outputSet.contains(a) => Some(a)
      case _ => None
    }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val widthStr = conf.getConfString(WidthKey, "")
    if (widthStr.isEmpty) return plan
    val width = widthStr.toLong
    require(width > 0, s"$WidthKey must be positive")

    plan.transformUp {
      case j @ Join(left, right, Inner, Some(cond), hint)
          if eligible(j, cond) =>
        rewrite(j, left, right, cond, hint, width).getOrElse(j)
    }
  }

  private def eligible(j: Join, cond: Expression): Boolean = {
    // skip plans this rule already produced, and joins Spark would
    // broadcast anyway (either side under the threshold)
    val marked = cond.references.exists(_.name.startsWith(BucketName))
    val thr = conf.autoBroadcastJoinThreshold
    val broadcastable = thr >= 0 &&
      (j.left.stats.sizeInBytes <= thr || j.right.stats.sizeInBytes <= thr)
    !marked && !broadcastable
  }

  /** Finds (point, lo, hi, pointSide=left?) such that the condition
    * contains point >= lo and point <= hi with point and bounds on
    * opposite sides. */
  private def findRange(conjuncts: Seq[Expression], left: LogicalPlan,
                        right: LogicalPlan)
      : Option[(Attribute, Attribute, Attribute, Boolean)] = {
    def split(p: Attribute, b: Attribute): Option[(Attribute, Attribute, Boolean)] =
      if (left.outputSet.contains(p) && right.outputSet.contains(b))
        Some((p, b, true))
      else if (right.outputSet.contains(p) && left.outputSet.contains(b))
        Some((p, b, false))
      else None
    // (point, bound, pointIsLeft) for every `point >= bound` conjunct
    val lowers = conjuncts.flatMap {
      case GreaterThanOrEqual(a, b) =>
        for (p <- sideAttr(a, left).orElse(sideAttr(a, right));
             o <- sideAttr(b, left).orElse(sideAttr(b, right));
             r <- split(p, o)) yield r
      case LessThanOrEqual(a, b) =>
        for (o <- sideAttr(a, left).orElse(sideAttr(a, right));
             p <- sideAttr(b, left).orElse(sideAttr(b, right));
             r <- split(p, o)) yield r
      case _ => None
    }
    val uppers = conjuncts.flatMap {
      case LessThanOrEqual(a, b) =>
        for (p <- sideAttr(a, left).orElse(sideAttr(a, right));
             o <- sideAttr(b, left).orElse(sideAttr(b, right));
             r <- split(p, o)) yield r
      case GreaterThanOrEqual(a, b) =>
        for (o <- sideAttr(a, left).orElse(sideAttr(a, right));
             p <- sideAttr(b, left).orElse(sideAttr(b, right));
             r <- split(p, o)) yield r
      case _ => None
    }
    (for {
      (p1, lo, pl1) <- lowers
      (p2, hi, pl2) <- uppers
      if p1.semanticEquals(p2) && pl1 == pl2
    } yield (p1, lo, hi, pl1)).headOption
  }

  private def rewrite(j: Join, left: LogicalPlan, right: LogicalPlan,
                      cond: Expression, hint: JoinHint,
                      width: Long): Option[LogicalPlan] = {
    val conjuncts = splitConjunctivePredicates(cond)
    findRange(conjuncts, left, right).map { case (point, lo, hi, pointIsLeft) =>
      val (pointSide, intervalSide) =
        if (pointIsLeft) (left, right) else (right, left)

      // point side: project the single bucket of the point
      val pBucket = Alias(bucketOf(point, width), BucketName)()
      val pProj = Project(pointSide.output :+ pBucket, pointSide)

      // interval side: explode the bucket span [bucket(lo), bucket(hi)]
      val iBucketAttr =
        AttributeReference(BucketName + "_i", LongType, nullable = false)()
      // Sequence is TimeZoneAwareExpression: post-analysis plans must
      // carry the zone themselves or the node reports unresolved. An
      // inverted interval (lo > hi, or a NULL bound — matches nothing)
      // must neither crash ('Illegal sequence boundaries' with a fixed
      // step) nor explode into its full descending span (default step):
      // guard with an empty bucket array, which Explode turns into zero
      // rows at zero cost.
      val startB = bucketOf(lo, width)
      val stopB = bucketOf(hi, width)
      val span = If(LessThanOrEqual(startB, stopB),
        new Sequence(startB, stopB, Some(Literal(1L)),
          Some(conf.sessionLocalTimeZone)),
        Literal.create(Seq.empty[Long],
          org.apache.spark.sql.types.ArrayType(LongType, containsNull = false)))
      val gen = Generate(Explode(span),
        unrequiredChildIndex = Nil, outer = false, qualifier = None,
        generatorOutput = Seq(iBucketAttr), intervalSide)

      // original predicates all kept: bucket equality is a refinement
      val newCond = (conjuncts :+ EqualTo(pBucket.toAttribute, iBucketAttr))
        .reduce(And)
      val (newLeft, newRight) = if (pointIsLeft) (pProj, gen) else (gen, pProj)
      Project(j.output, Join(newLeft, newRight, Inner, Some(newCond), hint))
    }
  }
}
