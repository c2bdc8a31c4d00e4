package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** Join-side decomposition of the `lake_spj_skew` face (VERDICT r14
  * task 5): the oracled query measures the whole connector operation
  * (create + 5 bucketed appends + commit + join), and at 100× the
  * write path dominates the wall — so the grouped-vs-partially-
  * clustered delta of the JOIN ITSELF needs its own measurement. This
  * probe builds the two skew tables ONCE (identical content to the
  * query's: fact side with ~24% of rows in one bucket across 4
  * appends, one-row-per-key profile side), then times ONLY the
  * join+aggregate under the two modes in alternating adjacent pairs
  * (min-of-N each), printing one JSON line with both walls and the
  * join's task count per mode — the structural evidence that grouped
  * mode fused the hot bucket into one straggler task while
  * partially-clustered kept its splits apart.
  *
  * Usage: runMain graft.tools.SpjSkewProbe <corpusDir> [rounds] [hotMod]
  * hotMod m re-keys every m-th order to the hot customer (m=5 → ~24%
  * of the fact side in one bucket, the oracled query's shape; m=2 →
  * ~53%), letting the probe walk the skew axis to the crossover where
  * split preservation beats the grouped straggler.
  */
object SpjSkewProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val rounds = if (args.length > 1) args(1).toInt else 3
    val hotMod = if (args.length > 2) args(2).toInt else 5
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.GraftSession.builder(s"local[$cpus]", cpus.toInt)
      .appName("graft-spj-skew-probe")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.catalog.lake", classOf[graft.sources.GraftLakeCatalog].getName)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.Tables.{dbl, dec, load}

    spark.sql("DROP TABLE IF EXISTS lake.probe_spj_skew_a")
    spark.sql("""CREATE TABLE lake.probe_spj_skew_a (o_orderkey BIGINT,
                |  o_custkey BIGINT, o_totalprice DOUBLE)
                |  PARTITIONED BY (bucket(16, o_custkey))""".stripMargin)
    spark.sql("DROP TABLE IF EXISTS lake.probe_spj_skew_b")
    spark.sql("""CREATE TABLE lake.probe_spj_skew_b (o_custkey BIGINT,
                |  profile_total DOUBLE) PARTITIONED BY (bucket(16, o_custkey))""".stripMargin)
    val skewKey = when(col("o_orderkey") % hotMod === 0, lit(7L))
      .otherwise(col("o_custkey"))
    val src = load(spark, dir, "orders")
      .select(col("o_orderkey"), skewKey.as("o_custkey"), col("o_totalprice"))
    (0 until 4).foreach { i =>
      src.filter(col("o_orderkey") % 8 === i * 2)
        .writeTo("lake.probe_spj_skew_a").append()
    }
    src.filter(col("o_orderkey") % 2 === 1)
      .groupBy(col("o_custkey"))
      .agg(dbl(sum(dec(col("o_totalprice")))).as("profile_total"))
      .writeTo("lake.probe_spj_skew_b").append()

    def joined(): DataFrame = spark.table("lake.probe_spj_skew_a").as("a")
      .join(spark.table("lake.probe_spj_skew_b").hint("merge").as("b"), Seq("o_custkey"))
      .groupBy(col("o_custkey").as("custkey"))
      .agg(count(lit(1)).as("n_facts"),
        dbl(sum(dec(col("a.o_totalprice")))).as("fact_total"),
        max(col("b.profile_total")).as("profile_total"))

    val key = "spark.sql.sources.v2.bucketing.partiallyClusteredDistribution.enabled"
    def run(pcd: Boolean): Double = {
      spark.conf.set(key, pcd.toString)
      val t0 = System.nanoTime()
      joined().write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    def joinTasks(pcd: Boolean): Int = {
      spark.conf.set(key, pcd.toString)
      // partition count of the pre-aggregation join RDD: grouped SPJ
      // has exactly one task per populated bucket; partially-clustered
      // keeps the skewed side's splits apart (> bucket count)
      spark.table("lake.probe_spj_skew_a").as("a")
        .join(spark.table("lake.probe_spj_skew_b").hint("merge").as("b"), Seq("o_custkey"))
        .queryExecution.toRdd.getNumPartitions
    }
    // warmup both modes once, then alternate adjacent pairs
    run(pcd = false); run(pcd = true)
    var grouped = List.empty[Double]
    var pcd = List.empty[Double]
    for (_ <- 1 to rounds) {
      grouped = run(pcd = false) :: grouped
      pcd = run(pcd = true) :: pcd
    }
    val tg = joinTasks(pcd = false)
    val tp = joinTasks(pcd = true)
    println(f"""{"metric":"spj_skew_join","grouped_sec":${grouped.min}%.3f,""" +
      f""""partially_clustered_sec":${pcd.min}%.3f,""" +
      f""""grouped_join_tasks":$tg,"pcd_join_tasks":$tp,""" +
      f""""rounds":$rounds,"hot_mod":$hotMod,"corpus":"$dir"}""")
    spark.stop()
  }
}
