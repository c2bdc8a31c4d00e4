package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Sketch interop strategy (COVERAGE "known gaps"): the engine's
  * cardinality sketches are Apache DataSketches HLL (Spark 4 built-ins
  * `hll_sketch_agg`/`hll_union`/`hll_sketch_estimate`), whose serialized
  * form is the cross-engine exchange format the reference gets from
  * Velox's APPROX_DISTINCT adapter (HLLRewriteRule.scala:30,
  * VeloxSparkPlanExecApi extras). Mergeability is the property that
  * makes sketches work at 100 TB: partial sketches built per
  * partition/day/shard union into the exact same estimate as one pass
  * over the whole data.
  */
class SketchSpec extends AnyFunSuite {
  private lazy val spark = GraftSparkSession.spark
  private val dir = GraftSparkSession.sfDir

  private lazy val li = Tables.load(spark, dir, "lineitem")

  test("HLL sketch: merged partial sketches == single-pass sketch estimate") {
    // partial sketch per returnflag (as if built independently per shard)
    val merged = li
      .groupBy(col("l_returnflag"))
      .agg(hll_sketch_agg(col("l_partkey")).as("sk"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))
      .head().getLong(0)
    val single = li
      .agg(hll_sketch_estimate(hll_sketch_agg(col("l_partkey"))).as("est"))
      .head().getLong(0)
    assert(merged == single, "sketch union must be lossless vs one-pass build")
  }

  test("HLL estimate is within the configured error bound of exact") {
    val exact = li.select(countDistinct(col("l_partkey"))).head().getLong(0)
    val est = li.agg(hll_sketch_estimate(hll_sketch_agg(col("l_partkey"), 14))).head().getLong(0)
    // lgK=14 → relative standard error ~0.8%; 5 sigma bound
    assert(math.abs(est - exact).toDouble / exact < 0.04, s"est=$est exact=$exact")
  }

  test("serialized sketch is a portable binary payload") {
    val row = li.agg(hll_sketch_agg(col("l_partkey")).as("sk"))
      .select(col("sk"), length(col("sk")).as("len")).head()
    assert(row.get(0).isInstanceOf[Array[Byte]])
    assert(row.getInt(1) > 0)
    // binary round-trip through a parquet sink keeps the sketch usable
    val path = java.nio.file.Files.createTempDirectory("graft_sk").resolve("out").toString
    li.groupBy(col("l_returnflag")).agg(hll_sketch_agg(col("l_partkey")).as("sk"))
      .write.parquet(path)
    val est = spark.read.parquet(path)
      .agg(hll_sketch_estimate(hll_union_agg(col("sk")))).head().getLong(0)
    val direct = li.agg(hll_sketch_estimate(hll_sketch_agg(col("l_partkey")))).head().getLong(0)
    assert(est == direct, "sketch must survive serialization to a table")
  }

  test("two-sketch union via hll_union matches union of the data") {
    val a = li.filter(col("l_orderkey") % 2 === 0)
      .agg(hll_sketch_agg(col("l_partkey")).as("sk_a"))
    val b = li.filter(col("l_orderkey") % 2 =!= 0)
      .agg(hll_sketch_agg(col("l_partkey")).as("sk_b"))
    val unioned = a.crossJoin(b)
      .select(hll_sketch_estimate(hll_union(col("sk_a"), col("sk_b")))).head().getLong(0)
    val whole = li.agg(hll_sketch_estimate(hll_sketch_agg(col("l_partkey")))).head().getLong(0)
    assert(unioned == whole)
  }

  test("approx_percentile stays within rank tolerance of the exact percentile") {
    val approx = li.agg(expr("approx_percentile(l_extendedprice, 0.5, 1000)")).head().getDouble(0)
    val exact = li.agg(expr("percentile(l_extendedprice, 0.5)")).head().getDouble(0)
    val within = li.filter(col("l_extendedprice").between(
      math.min(approx, exact), math.max(approx, exact))).count()
    // 1/accuracy rank error => at most n/1000 rows between approx and exact
    assert(within <= li.count() / 1000 + 1, s"approx=$approx exact=$exact strayed $within rows")
  }
}
