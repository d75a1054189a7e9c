package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{LongType, TimestampType}

/** Optimizer rule: rewrite a keyless time-range join — which Spark can
  * only execute as BroadcastNestedLoopJoin / CartesianProduct, i.e.
  * O(|L|·|R|) — into the bucketed equi-join shape of
  * [[graft.operators.TemporalJoins.rangeJoin]], automatically.
  *
  * Matches an INNER join whose condition contains NO equi predicate
  * but does contain `t >= s AND t <= e` where `t` is a timestamp from
  * one side and `s`, `e` are timestamps from the other. Rewrites to:
  *
  * {{{
  *   probe side:     + __graft_bkt = unix_micros(t) div W
  *   interval side:  Filter(s <= e) + explode(sequence(s div W, e div W))
  *   join:           ON bucket equality AND the original condition
  *   top:            Project back to the original output
  * }}}
  *
  * Correctness: trunc-div is monotone, so for any t ∈ [s, e],
  * bucket(t) lies in [bucket(s), bucket(e)] — every true match meets
  * in exactly the probe row's bucket; the original range predicate
  * (kept verbatim in the join condition) removes same-bucket
  * non-matches. Rows with s > e or null bounds can never satisfy the
  * BETWEEN, so the interval-side filter is semantics-preserving (and
  * keeps `sequence` ascending).
  *
  * Termination/idempotence: the rewritten join HAS an equi conjunct
  * (the bucket equality), so the rule's own guard skips it on the next
  * fixed-point pass.
  *
  * Bucket width is `spark.graft.rangeJoin.bucketSeconds` (default
  * 3600); at scale pick ≈ the median interval length so the explode
  * factor stays small.
  */
object RangeJoinRewrite extends Rule[LogicalPlan] with PredicateHelper {

  private def bucketMicros: Long =
    conf.getConfString("spark.graft.rangeJoin.bucketSeconds", "3600").toLong * 1000000L

  private def bucket(t: Expression): Expression =
    IntegralDivide(UnixMicros(t), Literal(bucketMicros))

  /** (probe-time, lower, upper) when cond is a pure range join of l vs r. */
  private def matchRange(
      conjuncts: Seq[Expression],
      probe: LogicalPlan,
      interval: LogicalPlan
  ): Option[(Expression, Expression, Expression)] = {
    def fromProbe(e: Expression) = e.references.nonEmpty && e.references.subsetOf(probe.outputSet)
    def fromInterval(e: Expression) = e.references.nonEmpty && e.references.subsetOf(interval.outputSet)
    def ts(e: Expression) = e.dataType == TimestampType
    // normalize to (t, bound, isLower)
    val bounds = conjuncts.collect {
      case GreaterThanOrEqual(t, s) if fromProbe(t) && fromInterval(s) && ts(t) && ts(s) => (t, s, true)
      case LessThanOrEqual(s, t) if fromProbe(t) && fromInterval(s) && ts(t) && ts(s) => (t, s, true)
      case LessThanOrEqual(t, e) if fromProbe(t) && fromInterval(e) && ts(t) && ts(e) => (t, e, false)
      case GreaterThanOrEqual(e, t) if fromProbe(t) && fromInterval(e) && ts(t) && ts(e) => (t, e, false)
    }
    for {
      (t1, lo, _) <- bounds.find(_._3)
      (t2, hi, _) <- bounds.find(!_._3)
      if t1.semanticEquals(t2)
    } yield (t1, lo, hi)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case j @ Join(left, right, Inner, Some(cond), hint) =>
      val conjuncts = splitConjunctivePredicates(cond)
      val hasEqui = conjuncts.exists {
        case EqualTo(a, b) =>
          (a.references.subsetOf(left.outputSet) && b.references.subsetOf(right.outputSet)) ||
            (a.references.subsetOf(right.outputSet) && b.references.subsetOf(left.outputSet))
        case _ => false
      }
      if (hasEqui) j
      else {
        val leftProbe = matchRange(conjuncts, left, right).map(m => (m, true))
        val anyMatch = leftProbe.orElse(matchRange(conjuncts, right, left).map(m => (m, false)))
        anyMatch match {
          case None => j
          case Some(((t, lo, hi), probeIsLeft)) =>
            val (probe, interval) = if (probeIsLeft) (left, right) else (right, left)
            val probeBkt = Alias(bucket(t), "__graft_pbkt")()
            val newProbe = Project(probe.output :+ probeBkt, probe)
            val iBkt = AttributeReference("__graft_ibkt", LongType, nullable = false)()
            // Sequence is TimeZoneAware: it is unresolved (and fails
            // post-rule plan validation) until a zone id is attached,
            // even over plain longs
            val gen = Generate(
              Explode(Sequence(bucket(lo), bucket(hi), None, Some(conf.sessionLocalTimeZone))),
              unrequiredChildIndex = Nil,
              outer = false,
              qualifier = None,
              generatorOutput = Seq(iBkt),
              child = Filter(LessThanOrEqual(lo, hi), interval)
            )
            val newCond = (EqualTo(probeBkt.toAttribute, iBkt) +: conjuncts).reduce(And)
            val (nl, nr) = if (probeIsLeft) (newProbe, gen) else (gen, newProbe)
            Project(j.output, Join(nl, nr, Inner, Some(newCond), hint))
        }
      }
  }
}
