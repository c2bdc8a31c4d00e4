package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Attribute
import org.apache.spark.sql.catalyst.expressions.aggregate.{Complete, Final, Partial}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.aggregate.HashAggregateExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec

/** Skip the partial-aggregation phase for high-cardinality groupings —
  * the FlushableHashAggregate analog (reference
  * FlushableHashAggregateRule.scala:35, which replaces the partial
  * aggregate with one that flushes instead of building an ever-growing
  * hash table; on vanilla Tungsten the equivalent relief is to not run
  * the partial phase at all).
  *
  * When the grouping key is nearly unique per row, the map-side partial
  * aggregate combines almost nothing: it pays a full hash-table build
  * (memory + spill risk at 100 TB) to shave ~0 shuffle bytes. With the
  * rule on, `Final ← Exchange ← Partial ← child` is rewritten to
  * `Complete ← Exchange ← child`: rows shuffle raw on the grouping
  * keys and aggregate once on the reduce side.
  *
  * Gated by `spark.graft.skipPartialAggregate.enabled` (default OFF):
  * for low-cardinality keys the partial phase is a huge win, so
  * skipping is a per-workload choice exactly like the reference's
  * flushable mode. Restricted to attribute-only grouping keys so the
  * exchange's hash partitioning re-binds directly onto the child's
  * output.
  */
case class SkipPartialAggregate(session: SparkSession) extends Rule[SparkPlan] {

  override def apply(plan: SparkPlan): SparkPlan = {
    if (!graft.GraftConf.getBoolean(session, graft.GraftConf.SkipPartialAggregate)) plan
    else plan.transformUp {
      case fin @ HashAggregateExec(_, false, _, _, finAggs, _, _, _,
          sh @ ShuffleExchangeExec(_, part: HashAggregateExec, _, _))
          if finAggs.nonEmpty &&
            finAggs.forall(a => a.mode == Final && !a.isDistinct) &&
            !part.isStreaming &&
            part.aggregateExpressions.forall(a => a.mode == Partial && !a.isDistinct) &&
            finAggs.length == part.aggregateExpressions.length &&
            finAggs.zip(part.aggregateExpressions).forall { case (f, p) =>
              f.aggregateFunction.semanticEquals(p.aggregateFunction)
            } &&
            // attribute-only grouping straight from the child: the
            // exchange partitioning stays valid over the raw rows
            part.groupingExpressions.forall(_.isInstanceOf[Attribute]) &&
            part.groupingExpressions.forall(g =>
              part.child.outputSet.contains(g.asInstanceOf[Attribute])) &&
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
          child = sh.copy(child = part.child))
    }
  }
}
