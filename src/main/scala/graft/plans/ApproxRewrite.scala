package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, ApproximatePercentile, Count, HyperLogLogPlusPlus, Percentile}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.DoubleType

/** Opt-in optimizer rule (SURVEY §2 F6): rewrite exact
  * `count(DISTINCT x)` to the HyperLogLog++ sketch when
  * `spark.graft.approx.rewrite=true`.
  *
  * An exact distinct count over 100 TB needs a full shuffle of every
  * distinct value (Spark expands it to a two-phase aggregate); HLL++ is
  * a fixed-size mergeable sketch — map-side partial aggregation reduces
  * each partition to one sketch buffer, at ~2% relative error
  * (OpenSearch's `cardinality` aggregation makes exactly this trade,
  * always; here it is an explicit per-session knob).
  *
  * Catalyst mechanics: runs pre-expansion on the logical Aggregate;
  * swapping the aggregate function inside the existing
  * AggregateExpression keeps the enclosing Alias and its exprId, so
  * downstream references are untouched. Multi-arg distinct counts are
  * left alone (no sketch equivalent).
  */
case class ApproxRewrite(session: SparkSession) extends Rule[LogicalPlan] {
  private def enabled: Boolean =
    session.conf.getOption("spark.graft.approx.rewrite").contains("true")

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!enabled) plan
    else plan.transform {
      case agg: Aggregate =>
        agg.transformExpressions {
          case ae @ AggregateExpression(Count(Seq(child)), _, true, None, _) =>
            ae.copy(
              aggregateFunction = HyperLogLogPlusPlus(child),
              isDistinct = false)
          // exact percentile → t-digest sketch. Guard: Percentile
          // always returns DOUBLE but ApproximatePercentile returns
          // the CHILD's type, so the swap is only type-preserving (and
          // therefore safe for downstream resolution) on double inputs.
          // Reverse percentiles (PERCENTILE_CONT ... ORDER BY x DESC)
          // compute quantile 1-p; ApproximatePercentile has no reverse
          // mode, so swapping one in would silently return p instead of
          // 1-p — leave them exact.
          case ae @ AggregateExpression(p: Percentile, _, false, None, _)
              if p.child.dataType == DoubleType &&
                p.frequencyExpression == Literal(1L) && !p.reverse =>
            ae.copy(aggregateFunction =
              new ApproximatePercentile(p.child, p.percentageExpression))
        }
    }
}
