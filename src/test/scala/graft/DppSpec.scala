package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Dynamic partition pruning faces (r12 verdict item 4 — the four
  * reference suite modes `VeloxTestSettings.scala:765-768`, DPP × AQE
  * on/off): reuse-broadcast pruning on a BHJ, the
  * reuseBroadcastOnly=false standalone-subquery fallback under SMJ,
  * the no-broadcast/no-fallback default, static+dynamic partition
  * filter composition, and the files-actually-skipped metric. Value
  * pins (`dpppin_*`, same results under every mode) live in
  * SparkSemanticsSpec. */
class DppSpec extends AnyFunSuite {
  private lazy val spark = GraftSparkSession.spark

  private def withConf[T](kvs: (String, String)*)(body: => T): T = {
    val olds = kvs.map { case (k, _) => k -> spark.conf.getOption(k) }
    kvs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally olds.foreach { case (k, o) =>
      o.fold(spark.conf.unset(k))(spark.conf.set(k, _)) }
  }

  private def finalPlan(df: DataFrame): String = {
    df.collect()
    val s = df.queryExecution.executedPlan.toString
    val cut = s.indexOf("== Initial Plan ==")
    if (cut >= 0) s.substring(0, cut) else s
  }

  /** a LIVE dynamic pruning filter — a dropped one leaves
    * `dynamicpruningexpression(true)` behind, which must not count */
  private def hasLiveDpp(plan: String): Boolean =
    "dynamicpruningexpression\\((?!true\\))".r.findFirstIn(plan).isDefined

  /** numFiles metric of the FACT scan after execution (AQE-aware:
    * QueryStageExec nodes are LEAVES wrapping their materialized
    * subtree, so the walk must recurse into `stage.plan` explicitly) */
  private def factFilesRead(df: DataFrame, table: String = "dppf"): Long = {
    df.collect()
    def scans(p: org.apache.spark.sql.execution.SparkPlan): Seq[FileSourceScanExec] = {
      val here = p.collectWithSubqueries {
        case f: FileSourceScanExec
          // exact table-dir match on the relation's root paths ("dppf"
          // must not also match "dppg"; the rendered Location metadata
          // string is length-truncated and unreliable)
          if f.relation.location.rootPaths.exists(p =>
            p.getName == table || p.toString.contains(s"/$table/")) => Seq(f)
        case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => scans(q.plan)
      }
      here.flatten
    }
    scans(df.queryExecution.executedPlan).map(_.metrics("numFiles").value).max
  }

  private lazy val fixture: Unit = {
    spark.sql("DROP TABLE IF EXISTS dppf")
    spark.sql("DROP TABLE IF EXISTS dppd")
    spark.sql("CREATE TABLE dppf (k INT) USING parquet PARTITIONED BY (p INT)")
    import spark.implicits._
    (1 to 120).map(i => (i, i % 12)).toDF("k", "p")
      .repartition(1).write.mode("append").insertInto("dppf")
    (0 to 11).map(p => (p, if (p < 3) "hot" else "cold")).toDF("p", "cat")
      .write.saveAsTable("dppd")
  }

  private lazy val fixture2: Unit = {
    spark.sql("DROP TABLE IF EXISTS dppg")
    spark.sql("CREATE TABLE dppg (w INT) USING parquet PARTITIONED BY (p INT)")
    import spark.implicits._
    (1 to 60).map(i => (i * 2, i % 12)).toDF("w", "p")
      .repartition(1).write.mode("append").insertInto("dppg")
  }

  private def prunedJoin: DataFrame =
    spark.table("dppf")
      .join(spark.table("dppd").filter(col("cat") === "hot"), Seq("p"))
      .groupBy(col("p")).agg(count(lit(1)).as("n"), sum(col("k")).as("sk"))

  test("BHJ reuses its broadcast for partition pruning (AQE on and off)") {
    fixture
    for (aqe <- Seq("true", "false")) {
      withConf("spark.sql.adaptive.enabled" -> aqe) {
        val df = prunedJoin
        val plan = finalPlan(df)
        assert(hasLiveDpp(plan),
          s"aqe=$aqe: fact scan must carry a LIVE dynamic pruning filter:\n" + plan.take(4000))
        assert(df.count() == 3)
        // 12 identity partitions, one file each — pruning must read 3
        assert(factFilesRead(prunedJoin) == 3,
          s"aqe=$aqe: expected 3 of 12 partition files read")
      }
    }
  }

  test("SMJ with reuseBroadcastOnly=true (default) plans no DPP filter") {
    fixture
    val df = spark.table("dppf")
      .join(spark.table("dppd").filter(col("cat") === "hot").hint("merge"), Seq("p"))
      .groupBy(col("p")).agg(count(lit(1)).as("n"))
    val plan = finalPlan(df)
    assert(!hasLiveDpp(plan),
      "no broadcast to reuse and no fallback allowed → no live DPP:\n" + plan.take(4000))
    assert(factFilesRead(df) == 12, "without DPP every partition file is read")
  }

  test("SMJ with reuseBroadcastOnly=false runs the standalone-subquery fallback") {
    fixture
    withConf(
      "spark.sql.optimizer.dynamicPartitionPruning.reuseBroadcastOnly" -> "false",
      // the fallback fires when pruning looks profitable; our tiny dim
      // has no stats, so force the decision through the ratio knob
      "spark.sql.optimizer.dynamicPartitionPruning.fallbackFilterRatio" -> "10") {
      val df = spark.table("dppf")
        .join(spark.table("dppd").filter(col("cat") === "hot").hint("merge"), Seq("p"))
        .groupBy(col("p")).agg(count(lit(1)).as("n"))
      val plan = finalPlan(df)
      assert(hasLiveDpp(plan),
        "standalone-subquery DPP must prune the fact side:\n" + plan.take(4000))
      assert(factFilesRead(df) == 3, "fallback DPP must still skip 9 of 12 files")
    }
  }

  test("DPP kill switch: pruning off reads every partition, same values") {
    fixture
    withConf("spark.sql.optimizer.dynamicPartitionPruning.enabled" -> "false") {
      val df = prunedJoin
      val plan = finalPlan(df)
      assert(!plan.contains("dynamicpruning"))
      assert(factFilesRead(prunedJoin) == 12)
      assert(df.collect().map(_.getLong(1)).sum == 30)
    }
  }

  test("a static partition filter SUPPRESSES dynamic pruning (SPARK-38148)") {
    fixture
    // once the partition column carries a static predicate, Spark
    // skips inserting the DPP subquery entirely (static pruning is
    // assumed to have done the selective work) — the static filter
    // alone prunes p=0, the hot/cold cut happens at the join
    val df = spark.table("dppf").filter(col("p") =!= 0)
      .join(spark.table("dppd").filter(col("cat") === "hot"), Seq("p"))
      .groupBy(col("p")).agg(count(lit(1)).as("n"))
    val plan = finalPlan(df)
    assert(!hasLiveDpp(plan),
      "static partition pruning must suppress DPP:\n" + plan.take(4000))
    assert(factFilesRead(spark.table("dppf").filter(col("p") =!= 0)
      .join(spark.table("dppd").filter(col("cat") === "hot"), Seq("p"))
      .groupBy(col("p")).agg(count(lit(1)).as("n"))) == 11)
    assert(df.count() == 2)
  }

  test("DPP keyed off a build side holding an AGGREGATE subquery") {
    // r13 verdict task 5: the reference suite also prunes off a BHJ
    // build side that is itself an aggregate — the pruning subquery
    // then wraps the aggregated keys, not a bare filtered scan
    fixture
    def q() = spark.table("dppf")
      .join(spark.table("dppd").filter(col("cat") === "hot")
        .groupBy(col("p")).agg(count(lit(1)).as("c")), Seq("p"))
      .groupBy(col("p")).agg(sum(col("k")).as("sk"))
    val df = q()
    val plan = finalPlan(df)
    assert(hasLiveDpp(plan),
      "aggregate build side must still drive partition pruning:\n" + plan.take(4000))
    assert(factFilesRead(q()) == 3,
      "build-side-aggregate DPP must read 3 of 12 partition files")
    assert(df.count() == 3)
  }

  test("DPP prunes BOTH partitioned legs of a three-way join") {
    fixture
    fixture2
    // each fact joins the hot dim DIRECTLY (the shape where
    // reuse-broadcast DPP can serve both legs from ONE dim broadcast);
    // a chained (f ⋈ dim) ⋈ g leaves g unpruned under
    // reuseBroadcastOnly — the pruning subquery for g would need a
    // broadcast of the whole joined subtree, which never exists
    def q() = {
      val dim = spark.table("dppd").filter(col("cat") === "hot")
      spark.table("dppf").join(dim, Seq("p"))
        .join(spark.table("dppg").join(dim, Seq("p")), Seq("p"))
        .groupBy(col("p")).agg(count(lit(1)).as("n"))
    }
    val df = q()
    val plan = finalPlan(df)
    assert(hasLiveDpp(plan))
    assert(factFilesRead(q(), "dppf") == 3,
      "first leg must read 3 of 12 partition files")
    assert(factFilesRead(q(), "dppg") == 3,
      "second leg must read 3 of 12 partition files")
    assert(df.count() == 3)
  }

  test("a static filter on a NON-partition column leaves DPP active") {
    fixture
    val df = spark.table("dppf").filter(col("k") <= 1000)
      .join(spark.table("dppd").filter(col("cat") === "hot"), Seq("p"))
      .groupBy(col("p")).agg(count(lit(1)).as("n"))
    val plan = finalPlan(df)
    assert(hasLiveDpp(plan),
      "data-column filters must not suppress DPP:\n" + plan.take(4000))
    assert(factFilesRead(spark.table("dppf").filter(col("k") <= 1000)
      .join(spark.table("dppd").filter(col("cat") === "hot"), Seq("p"))
      .groupBy(col("p")).agg(count(lit(1)).as("n"))) == 3)
    assert(df.count() == 3)
  }
}
