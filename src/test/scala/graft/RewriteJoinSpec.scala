package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Stats-based SMJ→SHJ rewrite (graft.plans.RewriteJoinBuildSide — the
  * reference RewriteJoin / build-side-selection analog). */
class RewriteJoinSpec extends AnyFunSuite {
  private lazy val spark = GraftSparkSession.spark
  private val dir = GraftSparkSession.sfDir

  private def asymJoin(bigLeft: Boolean) = {
    val big = Tables.load(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_quantity"))
    val small = Tables.load(spark, dir, "orders")
      .filter(col("o_orderstatus") === "F")
      .select(col("o_orderkey"), col("o_totalprice"))
    if (bigLeft) big.join(small, col("l_orderkey") === col("o_orderkey"))
    else small.join(big, col("o_orderkey") === col("l_orderkey"))
  }

  test("forced SHJ picks the statistically smaller build side on either side") {
    withConf(
      GraftConf.ForceShuffledHashJoin.key -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.join.preferSortMergeJoin" -> "true") {
      // post-planner-strategy rules apply on the AQE path — inspect the
      // executed plan, not the pre-adaptive sparkPlan
      val dfL = asymJoin(bigLeft = true)
      dfL.collect()
      val bigLeft = dfL.queryExecution.executedPlan.toString
      assert(bigLeft.contains("ShuffledHashJoin"), bigLeft.take(2000))
      assert(bigLeft.contains("BuildRight"),
        "small (filtered orders) side on the right must be built:\n" + bigLeft.take(2000))
      val dfR = asymJoin(bigLeft = false)
      dfR.collect()
      val bigRight = dfR.queryExecution.executedPlan.toString
      assert(bigRight.contains("ShuffledHashJoin") && bigRight.contains("BuildLeft"),
        bigRight.take(2000))
    }
  }

  test("outer joins rewrite with the stats-chosen build side too") {
    withConf(
      GraftConf.ForceShuffledHashJoin.key -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.join.preferSortMergeJoin" -> "true") {
      // Spark 4 SHJ can build either side of a left outer join; the
      // smaller (filtered orders) side sits left → BuildLeft by stats
      val small = Tables.load(spark, dir, "orders")
        .filter(col("o_orderstatus") === "F").select(col("o_orderkey"))
      val big = Tables.load(spark, dir, "lineitem")
        .select(col("l_orderkey"), col("l_quantity"))
      val df = small.join(big, col("o_orderkey") === col("l_orderkey"), "left_outer")
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("ShuffledHashJoin") && plan.contains("BuildLeft"),
        plan.take(2000))
    }
  }

  test("the rewrite is gated: default conf keeps the planner's SMJ") {
    withConf(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.join.preferSortMergeJoin" -> "true") {
      val df = asymJoin(bigLeft = true)
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"),
        plan.take(2000))
    }
  }

  test("forced SHJ produces the same rows as the default plan") {
    // DECIMAL sums: order-independent, so the comparison is exact across
    // the two physical plans (double sums would differ in the last bits)
    def probe() = asymJoin(bigLeft = true)
      .agg(count(lit(1)), sum(Tables.dec(col("l_quantity"))),
        sum(Tables.dec(col("o_totalprice"))))
      .collect().toSeq
    val expected = probe()
    withConf(
      GraftConf.ForceShuffledHashJoin.key -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.join.preferSortMergeJoin" -> "true") {
      assert(probe() == expected)
    }
  }

  private def withConf[A](entries: (String, String)*)(f: => A): A = {
    val old = entries.map { case (k, _) => k -> spark.conf.getOption(k) }
    entries.foreach { case (k, v) => spark.conf.set(k, v) }
    try f finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
