package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Attribute
import org.apache.spark.sql.catalyst.plans.logical.{LeafNode, LogicalPlan, Statistics}
import org.apache.spark.sql.execution.{LeafExecNode, SparkPlan, SparkStrategy}

import org.apache.spark.sql.graft.ColumnBridge

/** A leaf whose rows come from a THUNK run at first execution — the
  * lazy-construction face for operators whose physical recipe must run
  * an eager materialization (e.g. dedup_containment's survivor
  * localCheckpoint, which exists so the global sort's range-partitioner
  * sample pass cannot re-execute the verify pipeline). Building a
  * DataFrame over this node runs NO job and plans instantly; the thunk
  * fires once per physical-plan instance, inside the first action, and
  * its result RDD is memoized for every later consumer of the same
  * Dataset (the sort's sample pass and sort pass share it). The
  * execution-time behavior of the wrapped recipe is preserved
  * bit-for-bit — this node only MOVES it from construction to first
  * action.
  *
  * The price is explain opacity: the deferred subtree prints as this
  * leaf. Operators that use it must expose their inner plan for plan
  * contracts separately (containment does, via
  * `DedupOps.containmentPlan` — ScaleFeaturesSpec asserts the
  * single-broadcast ReusedExchange shape there). */
case class DeferredMaterialize(output: Seq[Attribute],
    thunk: () => RDD[InternalRow]) extends LeafNode {
  // a deferred subtree's size is unknown and typically large: report a
  // huge estimate so no planner rule ever tries to broadcast it
  override def computeStats(): Statistics =
    Statistics(sizeInBytes = BigInt(Long.MaxValue) / 16)
}

case class DeferredMaterializeExec(output: Seq[Attribute],
    thunk: () => RDD[InternalRow]) extends LeafExecNode {
  // memoized: the range-sample job and the sort job (and any re-action
  // on the same Dataset) all read the one materialized RDD
  @transient private lazy val materialized: RDD[InternalRow] = thunk()
  override protected def doExecute(): RDD[InternalRow] = materialized
  override def withNewChildrenInternal(
      c: IndexedSeq[SparkPlan]): SparkPlan = this
}

object DeferredMaterializeStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case DeferredMaterialize(out, thunk) => DeferredMaterializeExec(out, thunk) :: Nil
    case _ => Nil
  }
}

object DeferredMaterialize {
  /** DataFrame whose schema (and output attribute identity) comes from
    * `schemaSource`'s analyzed plan — analysis only, no job — and whose
    * rows come from `thunk()` at first action. The thunk's DataFrame
    * must produce `schemaSource`'s columns positionally. */
  def dataFrame(spark: SparkSession, schemaSource: DataFrame)(
      thunk: () => DataFrame): DataFrame = {
    // robust in sessions built without GraftExtensions (the Bench
    // vanilla column runs this same library code): register the
    // planner strategy on demand, like AsOfJoinApi
    if (!spark.experimental.extraStrategies.contains(DeferredMaterializeStrategy) &&
        !spark.sessionState.planner.strategies.contains(DeferredMaterializeStrategy)) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ DeferredMaterializeStrategy
    }
    val out = schemaSource.queryExecution.analyzed.output
    ColumnBridge.dataFrame(spark,
      DeferredMaterialize(out, () => thunk().queryExecution.toRdd))
  }
}
