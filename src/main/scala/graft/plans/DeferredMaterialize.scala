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
  * fires inside the first action and the result RDD is memoized for
  * every later consumer (the sort's sample pass and sort pass share
  * it). The execution-time behavior of the wrapped recipe is preserved
  * bit-for-bit — this node only MOVES it from construction to first
  * action.
  *
  * MEMOIZATION CONTRACT: one materialization per [[DeferredMaterialize
  * .dataFrame]] CALL, not per physical-plan instance and not per
  * logical query. The single-flight memo lives in the thunk CLOSURE
  * that `dataFrame` builds, so plan copies made after planning
  * (makeCopy/clone by a prep rule, future AQE re-planning of the leaf)
  * all return the one materialized RDD — the eager recipe can never run
  * twice behind one Dataset. Conversely, two SEPARATE `dataFrame` calls
  * over the same operator are two closures and fire two independent
  * materializations (each correct); callers wanting cross-Dataset
  * sharing must go through the operator's own cache (containment's
  * single-slot set-table cache). DeferredMaterializeSpec pins both
  * directions.
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
  // The real memoization is single-flight INSIDE the thunk closure
  // (built by DeferredMaterialize.dataFrame), shared by every copy of
  // this node; the lazy val here only spares the same-instance calls
  // the closure's volatile read.
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

/** On-demand planner-strategy registration, synchronized: the naive
  * read-check-then-reassign of `spark.experimental.extraStrategies` (a
  * plain var) is a race — two first builds on concurrent threads of one
  * session could register a strategy twice or drop a concurrently
  * appended one. All of the engine's on-demand registrations
  * (DeferredMaterialize, AsOfJoinApi) go through here. */
object OnDemandStrategy {
  def register(spark: SparkSession, strategy: SparkStrategy): Unit =
    spark.synchronized {
      if (!spark.experimental.extraStrategies.contains(strategy) &&
          !spark.sessionState.planner.strategies.contains(strategy)) {
        spark.experimental.extraStrategies =
          spark.experimental.extraStrategies :+ strategy
      }
    }
}

object DeferredMaterialize {
  /** DataFrame whose schema (and output attribute identity) comes from
    * `schemaSource`'s analyzed plan — analysis only, no job — and whose
    * rows come from `thunk()` at first action. The thunk's DataFrame
    * must produce `schemaSource`'s columns positionally.
    *
    * The returned DataFrame materializes ONCE per call: the thunk is
    * wrapped single-flight here, in the closure every plan copy shares,
    * because the raw thunk (an eager localCheckpoint in DedupOps) is
    * NOT idempotent — memoizing only on the exec-node instance would
    * re-run the full materialization whenever a prep rule or AQE copies
    * the leaf after planning. */
  def dataFrame(spark: SparkSession, schemaSource: DataFrame)(
      thunk: () => DataFrame): DataFrame = {
    // robust in sessions built without GraftExtensions (the Bench
    // vanilla column runs this same library code)
    OnDemandStrategy.register(spark, DeferredMaterializeStrategy)
    val out = schemaSource.queryExecution.analyzed.output
    val memo = new java.util.concurrent.atomic.AtomicReference[RDD[InternalRow]]()
    val once = () => {
      val hit = memo.get()
      if (hit != null) hit
      else memo.synchronized {
        val again = memo.get()
        if (again != null) again
        else {
          val r = thunk().queryExecution.toRdd
          memo.set(r)
          r
        }
      }
    }
    ColumnBridge.dataFrame(spark, DeferredMaterialize(out, once))
  }
}
