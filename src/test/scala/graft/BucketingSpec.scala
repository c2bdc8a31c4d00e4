package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bucketing read/write semantics (r12 verdict item 2 — the reference's
  * GlutenBucketedReadWithoutHiveSupportSuite /
  * GlutenBucketedWriteWithoutHiveSupportSuite /
  * GlutenDisableUnnecessaryBucketedScanWithoutHiveSupportSuite(+AE),
  * `VeloxTestSettings.scala:536,560,571-574`): bucket pruning on
  * equality filters, shuffle-free joins when bucket counts match,
  * one-side-bucketed joins shuffling only the unbucketed side,
  * bucket-count-mismatch coalescing, the
  * disable-unnecessary-bucketed-scan rule under AQE on and off, and
  * the bucketing.enabled kill switch. At 100 TB bucketing is the main
  * shuffle-avoidance lever after AQE: a fact table bucketed on its
  * join key amortizes ONE clustered write across every downstream
  * join. Value-level golden pins live in SparkSemanticsSpec
  * (`bucketpin_*`); this spec owns the plan contracts. */
class BucketingSpec extends AnyFunSuite {
  private lazy val spark = GraftSparkSession.spark

  private def withConf[T](kvs: (String, String)*)(body: => T): T = {
    val olds = kvs.map { case (k, _) => k -> spark.conf.getOption(k) }
    kvs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally olds.foreach { case (k, o) =>
      o.fold(spark.conf.unset(k))(spark.conf.set(k, _)) }
  }

  /** execute, then render the FINAL adaptive plan — truncated before
    * the `== Initial Plan ==` section AdaptiveSparkPlan's toString
    * appends, which would double-count every node */
  private def finalPlan(df: DataFrame): String = {
    df.collect()
    val s = df.queryExecution.executedPlan.toString
    val cut = s.indexOf("== Initial Plan ==")
    if (cut >= 0) s.substring(0, cut) else s
  }

  private def countExchanges(plan: String): Int =
    "(?<!Reused)Exchange".r.findAllIn(plan).length

  // fixture tables, built once per JVM
  private lazy val fixture: Unit = {
    spark.sql("DROP TABLE IF EXISTS bk8a")
    spark.sql("DROP TABLE IF EXISTS bk8b")
    spark.sql("DROP TABLE IF EXISTS bk4")
    spark.sql("DROP TABLE IF EXISTS bkplain")
    spark.sql("""CREATE TABLE bk8a (k INT, v STRING) USING parquet
                 CLUSTERED BY (k) SORTED BY (k) INTO 8 BUCKETS""")
    spark.sql("""CREATE TABLE bk8b (k INT, w DOUBLE) USING parquet
                 CLUSTERED BY (k) SORTED BY (k) INTO 8 BUCKETS""")
    spark.sql("""CREATE TABLE bk4 (k INT, u STRING) USING parquet
                 CLUSTERED BY (k) INTO 4 BUCKETS""")
    spark.sql("CREATE TABLE bkplain (k INT, z STRING) USING parquet")
    import spark.implicits._
    (1 to 200).map(i => (i, s"v$i")).toDF("k", "v")
      .repartition(1).write.mode("append").insertInto("bk8a")
    (1 to 200).map(i => (i, i * 1.5)).toDF("k", "w")
      .repartition(1).write.mode("append").insertInto("bk8b")
    (1 to 200).map(i => (i, s"u$i")).toDF("k", "u")
      .repartition(1).write.mode("append").insertInto("bk4")
    (1 to 200).map(i => (i, s"z$i")).toDF("k", "z")
      .repartition(1).write.mode("append").insertInto("bkplain")
  }

  test("equality filter on the bucket column prunes to one bucket") {
    fixture
    // filter-only queries have no operator benefiting from the output
    // partitioning, so the auto-bucketed-scan rule would DISABLE the
    // bucketed read and with it the pruning — pin the pruning itself
    // with the rule off (its own behavior is pinned below)
    withConf("spark.sql.sources.bucketing.autoBucketedScan.enabled" -> "false") {
      val df = spark.table("bk8a").filter(col("k") === 42)
      val plan = finalPlan(df)
      assert(plan.contains("SelectedBucketsCount: 1 out of 8"),
        "bucket pruning must read a single bucket:\n" + plan.take(3000))
      assert(df.count() == 1)
    }
  }

  test("IN-list filter on the bucket column prunes to the matching buckets") {
    fixture
    withConf("spark.sql.sources.bucketing.autoBucketedScan.enabled" -> "false") {
      val df = spark.table("bk8a").filter(col("k").isin(1, 2, 3))
      val plan = finalPlan(df)
      val m = "SelectedBucketsCount: (\\d+) out of 8".r.findFirstMatchIn(plan)
      assert(m.isDefined, "bucketed scan must report pruning:\n" + plan.take(3000))
      assert(m.get.group(1).toInt <= 3, s"at most 3 of 8 buckets: ${m.get.group(1)}")
      assert(df.count() == 3)
    }
  }

  test("co-bucketed equal-count join runs with zero Exchange; legacy sorted-read elides Sort") {
    fixture
    val j = spark.table("bk8a")
      .join(spark.table("bk8b").hint("merge"), Seq("k"))
      .select(col("k"), col("v"), col("w"))
    val plan = finalPlan(j)
    assert(countExchanges(plan) == 0,
      "matching bucket counts must join shuffle-free:\n" + plan.take(3000))
    // default reads re-sort (SPARK-28595: bucket sort order is only
    // trusted when each bucket has one file, reported under the legacy
    // conf); with the conf on and our one-file-per-bucket layout the
    // SMJ reads pre-sorted buckets and needs no Sort at all
    assert(plan.contains("Sort "),
      "default-mode SMJ re-sorts bucketed input:\n" + plan.take(3000))
    withConf("spark.sql.legacy.bucketedTableScan.outputOrdering" -> "true") {
      val js = spark.table("bk8a")
        .join(spark.table("bk8b").hint("merge"), Seq("k"))
        .select(col("k"), col("v"), col("w"))
      val plans = finalPlan(js)
      assert(countExchanges(plans) == 0 && !plans.contains("Sort "),
        "sorted one-file-per-bucket SMJ must not re-sort:\n" + plans.take(3000))
    }
    assert(j.count() == 200)
  }

  test("one-side-bucketed join shuffles ONLY the unbucketed side") {
    fixture
    val j = spark.table("bk8a")
      .join(spark.table("bkplain").hint("merge"), Seq("k"))
      .select(col("k"), col("v"), col("z"))
    val plan = finalPlan(j)
    assert(countExchanges(plan) == 1,
      "exactly one Exchange (the plain side):\n" + plan.take(3000))
    assert(j.count() == 200)
  }

  test("bucket-count mismatch: coalescing joins 8 into 4 shuffle-free when enabled") {
    fixture
    withConf("spark.sql.bucketing.coalesceBucketsInJoin.enabled" -> "true") {
      val j = spark.table("bk8a")
        .join(spark.table("bk4").hint("merge"), Seq("k"))
        .select(col("k"), col("v"), col("u"))
      val plan = finalPlan(j)
      assert(countExchanges(plan) == 0,
        "8 buckets must coalesce onto 4 without shuffling:\n" + plan.take(3000))
      assert(j.count() == 200)
    }
    withConf("spark.sql.bucketing.coalesceBucketsInJoin.enabled" -> "false") {
      val j = spark.table("bk8a")
        .join(spark.table("bk4").hint("merge"), Seq("k"))
        .select(col("k"), col("v"), col("u"))
      val plan = finalPlan(j)
      assert(countExchanges(plan) > 0,
        "without coalescing, mismatched counts must shuffle:\n" + plan.take(3000))
    }
  }

  test("group-by on the bucket column aggregates shuffle-free") {
    fixture
    val agg = spark.table("bk8a").groupBy(col("k")).agg(count(lit(1)).as("n"))
    val plan = finalPlan(agg)
    assert(countExchanges(plan) == 0,
      "bucketed clustering must satisfy the aggregate:\n" + plan.take(3000))
    assert(agg.count() == 200)
  }

  test("disable-unnecessary-bucketed-scan: a plain scan reads unbucketed (AQE on and off)") {
    fixture
    for (aqe <- Seq("true", "false")) {
      withConf("spark.sql.adaptive.enabled" -> aqe,
        "spark.sql.sources.bucketing.autoBucketedScan.enabled" -> "true") {
        // no join/agg benefits from the clustering here → the planner
        // must DISABLE the bucketed scan (reads coalesce freely)
        val df = spark.table("bk8a").filter(col("v") === "v7").select(col("v"))
        val plan = finalPlan(df)
        assert(plan.contains("Bucketed: false"),
          s"aqe=$aqe: plain scan must drop bucketing:\n" + plan.take(3000))
        // and a bucket-benefiting query must KEEP it
        val j = spark.table("bk8a")
          .join(spark.table("bk8b").hint("merge"), Seq("k")).select(col("k"))
        val jplan = finalPlan(j)
        assert(jplan.contains("Bucketed: true"),
          s"aqe=$aqe: co-bucketed join must keep the bucketed scan:\n" + jplan.take(3000))
      }
    }
  }

  test("bucketing.enabled=false kill switch: the same join shuffles both sides") {
    fixture
    withConf("spark.sql.sources.bucketing.enabled" -> "false") {
      val j = spark.table("bk8a")
        .join(spark.table("bk8b").hint("merge"), Seq("k"))
        .select(col("k"))
      val plan = finalPlan(j)
      assert(countExchanges(plan) == 2,
        "with bucketing off both sides must shuffle:\n" + plan.take(3000))
    }
  }

  test("bucketed write lays out one file per (task, bucket) with the bucket id in the name") {
    fixture
    val loc = spark.sql("DESCRIBE EXTENDED bk8a")
      .filter(col("col_name") === "Location").head.getString(1)
      .stripPrefix("file:")
    val names = {
      val d = new java.io.File(loc)
      d.listFiles().map(_.getName)
        .filter(n => n != "_SUCCESS" && !n.endsWith(".crc"))
        .map(_.replaceAll("part-(\\d+)-[0-9a-fA-F-]{36}", "part-$1")).sorted.toSeq
    }
    // single-task insert into 8 buckets, all non-empty at 200 rows:
    // 8 files, each tagged _0000N
    assert(names.length == 8, s"expected 8 bucket files, got: $names")
    (0 to 7).foreach { b =>
      assert(names.exists(_.contains(f"_0000$b")),
        s"missing bucket $b file in: $names")
    }
  }
}
