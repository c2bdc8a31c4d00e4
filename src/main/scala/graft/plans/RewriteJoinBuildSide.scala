package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.optimizer.{BuildLeft, BuildRight, BuildSide, JoinSelectionHelper}
import org.apache.spark.sql.catalyst.plans.logical.Join
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.joins.{ShuffledHashJoinExec, SortMergeJoinExec}

/** Stats-driven SortMergeJoin → ShuffledHashJoin rewrite — the
  * RewriteJoin analog (reference
  * gluten-substrait/.../rewrite/RewriteJoin.scala:28-78 with the
  * build-side choice of OffloadSingleNodeRules.scala:159-174): when
  * `spark.graft.forceShuffledHashJoin` is on, every sort-merge join the
  * planner produced is replaced by a shuffled hash join whose build
  * side is the *statistically smaller* input (logical-plan stats via
  * `getSmallerSide`), subject to the join type's build-side legality.
  *
  * Injected as a query-post-planner-strategy rule, i.e. BEFORE
  * EnsureRequirements — so no orphaned SortExec children survive the
  * rewrite and downstream ordering requirements are re-derived against
  * the hash join's (unsorted) output. Default OFF: at 100 TB a
  * large×large SHJ trades the SMJ's spill-friendly merge for a hash
  * table that must fit executor memory — forcing it is a deliberate,
  * per-workload choice (the reference forces it because its native
  * columnar hash join dominates; vanilla Tungsten's advantage is
  * narrower), while stats-driven *build-side* selection is always
  * correct when it does fire.
  */
case class RewriteJoinBuildSide(spark: SparkSession)
    extends Rule[SparkPlan] with JoinSelectionHelper {

  override def apply(plan: SparkPlan): SparkPlan = {
    if (!graft.GraftConf.getBoolean(spark, graft.GraftConf.ForceShuffledHashJoin)) plan
    else plan.transformUp {
      case smj: SortMergeJoinExec =>
        chooseBuildSide(smj) match {
          case Some(side) =>
            ShuffledHashJoinExec(smj.leftKeys, smj.rightKeys, smj.joinType, side,
              smj.condition, smj.left, smj.right, smj.isSkewJoin)
          case None => smj
        }
    }
  }

  private def chooseBuildSide(smj: SortMergeJoinExec): Option[BuildSide] = {
    val leftOk = canBuildShuffledHashJoinLeft(smj.joinType)
    val rightOk = canBuildShuffledHashJoinRight(smj.joinType)
    if (!leftOk && !rightOk) None
    else if (!leftOk) Some(BuildRight)
    else if (!rightOk) Some(BuildLeft)
    else smj.logicalLink match {
      // both sides legal: build the statistically smaller one
      case Some(j: Join) => Some(getSmallerSide(j.left, j.right))
      case _ => Some(BuildLeft)
    }
  }
}
