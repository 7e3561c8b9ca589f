package org.apache.spark.sql.graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{Decimal, DecimalType, DoubleType, IntegralType, LongType, NumericType}

/** Optimizer rule: turns a naive band theta-join into a bucketized
  * equi-join automatically.
  *
  * A join whose only cross-side predicate is `abs(l - r) < eps`
  * (or `<=`) is planned by Spark as BroadcastNestedLoopJoin — O(n·m)
  * comparisons, and a broadcast requirement that falls over when
  * neither side is small. This rule rewrites
  *
  * {{{ left JOIN right ON abs(l - r) < eps AND rest... }}}
  *
  * into
  *
  * {{{
  * Project(original output,
  *   explode(probe in [b(l)-2 .. b(l)+2]) x left
  *     JOIN (right + bucket b(r))
  *     ON probe = b(r) AND abs(l - r) < eps AND rest...)
  * }}}
  *
  * where `b(x) = floor(x / eps)`. The original predicate is kept as
  * the exact residual, so results are identical row-for-row; the
  * equi-key lets Spark hash-partition both sides — the shape that
  * survives a fact×fact band join at 100 TB. Probing ±2 buckets
  * (rather than the mathematically-sufficient ±1) absorbs the
  * quotient's rounding error: double division is exact enough below
  * 2^52 and integral columns use exact DECIMAL division (see
  * [[bucketOf]]), so the rewrite can never drop a matching pair at
  * any LONG magnitude.
  *
  * Registered by [[GraftExtensions]]; graft.ops.JoinOps#joinThetaBand
  * applies the same rewrite by hand so it holds on vanilla sessions.
  */
case class BandJoinBucketingRule(spark: SparkSession)
    extends Rule[LogicalPlan] with PredicateHelper {

  private def sideOf(e: Expression, left: LogicalPlan, right: LogicalPlan): Option[Boolean] = {
    val refs = e.references
    if (refs.isEmpty) None
    else if (refs.subsetOf(left.outputSet)) Some(true)
    else if (refs.subsetOf(right.outputSet)) Some(false)
    else None
  }

  /** Matches abs(l - r) < eps / <= eps with l, r on opposite sides;
    * returns (leftExpr, rightExpr, eps). */
  private def bandPredicate(cond: Expression, left: LogicalPlan, right: LogicalPlan)
      : Option[(Expression, Expression, Double)] = {
    def litToDouble(v: Any): Option[Double] = v match {
      case d: Double => Some(d)
      case f: Float => Some(f.toDouble)
      case i: Int => Some(i.toDouble)
      case l: Long => Some(l.toDouble)
      case s: Short => Some(s.toDouble)
      case b: Byte => Some(b.toDouble)
      case d: org.apache.spark.sql.types.Decimal => Some(d.toDouble)
      case _ => None
    }
    def fromAbs(abs: Expression, lim: Expression): Option[(Expression, Expression, Double)] =
      (abs, lim) match {
        case (Abs(Subtract(x, y, _), _), Literal(v, _: NumericType)) =>
          litToDouble(v).filter(_ > 0).flatMap { eps =>
            if (!x.dataType.isInstanceOf[NumericType]) None
            else (sideOf(x, left, right), sideOf(y, left, right)) match {
              case (Some(true), Some(false)) => Some((x, y, eps))
              case (Some(false), Some(true)) => Some((y, x, eps))
              case _ => None
            }
          }
        case _ => None
      }
    cond match {
      case LessThan(a, l)           => fromAbs(a, l)
      case LessThanOrEqual(a, l)    => fromAbs(a, l)
      case GreaterThan(l, a)        => fromAbs(a, l)
      case GreaterThanOrEqual(l, a) => fromAbs(a, l)
      case _ => None
    }
  }

  private def hasEquiKey(conjuncts: Seq[Expression], left: LogicalPlan, right: LogicalPlan): Boolean =
    conjuncts.exists {
      case EqualTo(x, y) =>
        (sideOf(x, left, right), sideOf(y, left, right)) match {
          case (Some(a), Some(b)) => a != b
          case _ => false
        }
      case _ => false
    }

  /** Bucket id b(x) = floor(x / eps). For exact column types
    * (integral AND decimal) the quotient is computed in DECIMAL
    * (long/decimal → decimal is exact; a double cast loses bits
    * beyond 2^52, where the rounding error could exceed the ±2 probe
    * margin and silently drop matches). Decimal division rounds at
    * scale ≥ 6, an error ≤ 1e-6 bucket widths — far inside the probe
    * margin at any magnitude the exact types can hold. Float/double
    * columns keep the double path (they carry ≤ 53 significant bits
    * by construction, so the division is already faithful). */
  private def bucketOf(e: Expression, eps: Double): Expression = {
    def epsLit: Literal = {
      val epsDec = Decimal(BigDecimal.valueOf(eps))
      Literal(epsDec,
        DecimalType(math.max(epsDec.precision, epsDec.scale + 1), epsDec.scale))
    }
    e.dataType match {
      case _: IntegralType =>
        Cast(Floor(Divide(Cast(e, DecimalType(30, 6)), epsLit)), LongType)
      case _: DecimalType => // already exact — divide as-is
        Cast(Floor(Divide(e, epsLit)), LongType)
      case _ =>
        Cast(Floor(Divide(Cast(e, DoubleType), Literal(eps))), LongType)
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case j @ Join(left, right, Inner, Some(cond), hint)
        if j.resolved && !cond.exists(_.isInstanceOf[SubqueryExpression]) =>
      val conjuncts = splitConjunctivePredicates(cond)
      if (hasEquiKey(conjuncts, left, right)) j
      else conjuncts.iterator.flatMap(bandPredicate(_, left, right)).nextOption() match {
        case None => j
        case Some((lExpr, rExpr, eps)) =>
          val b = bucketOf(lExpr, eps)
          val probes = CreateArray((-2 to 2).map(d => Add(b, Literal(d.toLong))))
          val probeAttr = AttributeReference("__graft_band_probe", LongType)()
          val genLeft = Generate(Explode(probes), unrequiredChildIndex = Nil,
            outer = false, qualifier = None,
            generatorOutput = Seq(probeAttr), child = left)
          val bucketAlias = Alias(bucketOf(rExpr, eps), "__graft_band_bucket")()
          val projRight = Project(right.output :+ bucketAlias, right)
          val newCond = And(EqualTo(probeAttr, bucketAlias.toAttribute), cond)
          Project(j.output,
            Join(genLeft, projRight, Inner, Some(newCond), hint))
      }
  }
}
