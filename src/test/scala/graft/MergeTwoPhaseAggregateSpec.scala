package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The partial+final fusion rule (graft.plans.MergeTwoPhaseAggregate):
  * when the child already satisfies the aggregation's distribution, the
  * back-to-back partial/final pair must collapse into one complete-mode
  * aggregate — and never change results.
  */
class MergeTwoPhaseAggregateSpec extends AnyFunSuite {
  private lazy val spark = GraftSparkSession.spark
  private val dir = GraftSparkSession.sfDir

  private def withTable(name: String)(f: => Unit): Unit =
    try f finally spark.sql(s"DROP TABLE IF EXISTS $name")

  /** AQE's toString renders the final plan followed by the pre-adaptive
    * initial plan — keep only the former for shape assertions. */
  private def finalPlan(df: org.apache.spark.sql.DataFrame): String = {
    val s = df.queryExecution.executedPlan.toString
    s.split("== Initial Plan ==").head
  }

  test("partial+final over a bucketed scan fuses into one complete-mode aggregate") {
    withTable("m2p_orders") {
      Tables.load(spark, dir, "orders")
        .write.bucketBy(4, "o_custkey").sortBy("o_custkey")
        .saveAsTable("m2p_orders")
      val agg = spark.table("m2p_orders")
        .groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n"), sum(col("o_totalprice")).as("tot"))
      agg.collect() // materialize so AQE finalizes the plan
      val plan = finalPlan(agg)
      val nAggs = "HashAggregate".r.findAllIn(plan).length
      assert(nAggs == 1, s"expected one fused aggregate, plan:\n${plan.take(2000)}")
      assert(!plan.contains("partial_"), "no partial-mode functions after fusion")
      assert(!plan.contains("Exchange"), "bucketed scan must not shuffle")
    }
  }

  test("fused aggregate returns the same result as the two-phase plan") {
    withTable("m2p_li") {
      Tables.load(spark, dir, "lineitem")
        .write.bucketBy(4, "l_orderkey").saveAsTable("m2p_li")
      def run() = spark.table("m2p_li")
        .groupBy(col("l_orderkey"))
        .agg(sum(Tables.dec(col("l_quantity"))).as("q"), max(col("l_shipdate")).as("d"),
          avg(col("l_discount")).as("disc"))
        .orderBy(col("l_orderkey"))
        .collect().toSeq
      val fused = run()
      spark.conf.set("spark.graft.mergeTwoPhaseAgg.enabled", "false")
      val twoPhase = try run() finally
        spark.conf.unset("spark.graft.mergeTwoPhaseAgg.enabled")
      assert(fused == twoPhase)
    }
  }

  test("shuffle-requiring aggregation is left alone") {
    val agg = Tables.load(spark, dir, "orders")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"))
    agg.collect()
    val plan = finalPlan(agg)
    assert("HashAggregate".r.findAllIn(plan).length == 2,
      s"partial/final pair must remain around the exchange:\n${plan.take(2000)}")
  }

  test("distinct aggregates are not fused") {
    withTable("m2p_dist") {
      Tables.load(spark, dir, "lineitem")
        .write.bucketBy(4, "l_orderkey").saveAsTable("m2p_dist")
      val agg = spark.table("m2p_dist")
        .groupBy(col("l_orderkey"))
        .agg(countDistinct(col("l_suppkey")).as("nd"))
      // correctness is the bar here; plan shape for distinct is Spark's
      // Expand-based two-phase pipeline which the rule must not touch
      val viaRule = agg.orderBy(col("l_orderkey")).collect().toSeq
      spark.conf.set("spark.graft.mergeTwoPhaseAgg.enabled", "false")
      val off = try agg.orderBy(col("l_orderkey")).collect().toSeq finally
        spark.conf.unset("spark.graft.mergeTwoPhaseAgg.enabled")
      assert(viaRule == off)
    }
  }
}
