package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Skip-partial-aggregation rule (graft.plans.SkipPartialAggregate — the
  * FlushableHashAggregateRule analog): with the conf on, a two-phase
  * aggregate over a near-unique key runs as shuffle + one Complete
  * aggregate; default conf keeps the partial/final pair. */
class SkipPartialAggregateSpec extends AnyFunSuite {
  private lazy val spark = GraftSparkSession.spark
  private val dir = GraftSparkSession.sfDir

  // l_orderkey is near-unique per lineitem row-group: the worst case for
  // a map-side combine
  private def agg() = Tables.load(spark, dir, "lineitem")
    .groupBy(col("l_orderkey"))
    .agg(count(lit(1)).as("n"), sum(Tables.dec(col("l_quantity"))).as("q"))

  /** final-plan section only (AQE plan strings repeat the initial plan) */
  private def finalPlan(df: org.apache.spark.sql.DataFrame): String = {
    df.collect()
    df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
  }

  test("with the conf on, the partial phase is gone (one Complete aggregate)") {
    withConf(GraftConf.SkipPartialAggregate.key -> "true") {
      val plan = finalPlan(agg())
      val hashAggs = "HashAggregate".r.findAllIn(plan).length
      assert(hashAggs == 1, s"expected a single Complete aggregate, got $hashAggs:\n" +
        plan.take(3000))
      assert(plan.contains("Exchange hashpartitioning(l_orderkey"),
        "rows must still shuffle on the grouping key:\n" + plan.take(3000))
    }
  }

  test("default conf keeps the partial/final pair") {
    val plan = finalPlan(agg())
    val hashAggs = "HashAggregate".r.findAllIn(plan).length
    assert(hashAggs == 2, s"expected partial+final, got $hashAggs:\n" + plan.take(3000))
  }

  test("skipping the partial phase changes no results") {
    val expected = agg().orderBy(col("l_orderkey")).collect().toSeq
    withConf(GraftConf.SkipPartialAggregate.key -> "true") {
      assert(agg().orderBy(col("l_orderkey")).collect().toSeq == expected)
    }
  }

  test("computed grouping keys rewrite too (planner projects them to attributes)") {
    // Catalyst normalizes a computed grouping key into a Project output
    // attribute below the aggregate, so the attribute-only restriction
    // still admits the rewrite and the exchange binds to the projection
    withConf(GraftConf.SkipPartialAggregate.key -> "true") {
      def df() = Tables.load(spark, dir, "lineitem")
        .groupBy((col("l_orderkey") % 97).as("k"))
        .agg(count(lit(1)).as("n"))
      val plan = finalPlan(df())
      assert("HashAggregate".r.findAllIn(plan).length == 1, plan.take(3000))
      val on = df().orderBy(col("k")).collect().toSeq
      val off = { spark.conf.unset(GraftConf.SkipPartialAggregate.key)
        try df().orderBy(col("k")).collect().toSeq
        finally spark.conf.set(GraftConf.SkipPartialAggregate.key, "true") }
      assert(on == off)
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
