package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.aggregate.{Complete, Final, Partial}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.aggregate.HashAggregateExec

/** Fuse a Final-mode hash aggregate sitting directly on its Partial-mode
  * half (no exchange between them) into one Complete-mode aggregate.
  *
  * Spark always plans aggregation as a partial/final pair; when the
  * child already satisfies the required distribution (bucketed scan,
  * previous shuffle on the same keys), EnsureRequirements inserts no
  * exchange and the pair runs back-to-back in one stage — hashing every
  * group twice for nothing. One complete-mode aggregate does the same
  * work with a single hash table pass.
  *
  * Mirrors the reference's MergeTwoPhasesHashBaseAggregate
  * (gluten-substrait/.../MergeTwoPhasesHashBaseAggregate.scala:37,
  * SURVEY.md §2.4/§4). Runs as a query-stage-prep rule, i.e. after
  * EnsureRequirements, so "no exchange between" is directly visible.
  * Toggle: spark.graft.mergeTwoPhaseAgg.enabled (default true).
  */
case class MergeTwoPhaseAggregate(session: SparkSession) extends Rule[SparkPlan] {

  private def enabled: Boolean =
    session.conf.getOption("spark.graft.mergeTwoPhaseAgg.enabled")
      .forall(_.toBoolean)

  override def apply(plan: SparkPlan): SparkPlan = {
    if (!enabled) return plan
    plan.transformUp {
      case fin @ HashAggregateExec(_, false, _, _, finAggs, _, _, _, part: HashAggregateExec)
          if finAggs.nonEmpty &&
            finAggs.forall(a => a.mode == Final && !a.isDistinct) &&
            !part.isStreaming &&
            part.aggregateExpressions.forall(a => a.mode == Partial && !a.isDistinct) &&
            finAggs.length == part.aggregateExpressions.length &&
            finAggs.zip(part.aggregateExpressions).forall { case (f, p) =>
              f.aggregateFunction.semanticEquals(p.aggregateFunction)
            } &&
            fin.groupingExpressions.map(_.toAttribute.exprId) ==
              part.groupingExpressions.map(_.toAttribute.exprId) =>
        HashAggregateExec(
          requiredChildDistributionExpressions = fin.requiredChildDistributionExpressions,
          isStreaming = false,
          numShufflePartitions = fin.numShufflePartitions,
          groupingExpressions = part.groupingExpressions,
          aggregateExpressions = finAggs.map(_.copy(mode = Complete)),
          aggregateAttributes = fin.aggregateAttributes,
          initialInputBufferOffset = 0,
          resultExpressions = fin.resultExpressions,
          child = part.child)
    }
  }
}
