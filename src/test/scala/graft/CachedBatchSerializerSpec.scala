package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Engine-owned cache serializer (graft.sources.GraftCachedBatchSerializer
  * — the reference ColumnarCachedBatchSerializer analog), active for the
  * whole engine via the spark.sql.cache.serializer static conf. */
class CachedBatchSerializerSpec extends AnyFunSuite {
  private lazy val spark = GraftSparkSession.spark
  private val dir = GraftSparkSession.sfDir

  test("the engine session runs on the custom cache serializer") {
    assert(spark.conf.get("spark.sql.cache.serializer") ==
      classOf[graft.sources.GraftCachedBatchSerializer].getName)
  }

  test("cache round-trips all column types exactly") {
    import spark.implicits._
    val df = Seq(
      (1L, "alpha", 1.5, java.sql.Timestamp.valueOf("2024-01-01 10:00:00"),
        Seq(1, 2, 3), Map("a" -> 1), Some(2.toShort)),
      (2L, null.asInstanceOf[String], -0.0, null.asInstanceOf[java.sql.Timestamp],
        Seq.empty[Int], Map.empty[String, Int], None))
      .toDF("id", "s", "d", "ts", "arr", "m", "sh")
    val before = df.collect().map(_.toString).sorted.toSeq
    val cached = df.cache()
    cached.count() // materialize through the serializer
    val after = cached.collect().map(_.toString).sorted.toSeq
    try assert(after == before)
    finally cached.unpersist()
  }

  test("cached scan plans InMemoryTableScan and prunes to selected columns") {
    val li = Tables.load(spark, dir, "lineitem").cache()
    try {
      li.count()
      val pruned = li.select(col("l_orderkey"), col("l_quantity"))
        .filter(col("l_quantity") > 10)
      val plan = pruned.queryExecution.executedPlan.toString
      assert(plan.contains("InMemoryTableScan"), plan.take(2000))
      // aggregate over the cached data equals the uncached scan exactly
      val cachedSum = pruned.agg(sum(Tables.dec(col("l_quantity")))).collect().toSeq
      val fresh = Tables.load(spark, dir, "lineitem")
        .select(col("l_orderkey"), col("l_quantity"))
        .filter(col("l_quantity") > 10)
        .agg(sum(Tables.dec(col("l_quantity")))).collect().toSeq
      assert(cachedSum == fresh)
    } finally li.unpersist()
  }

  test("a persisted mid-pipeline stage stays correct through the serializer") {
    val agg = Tables.load(spark, dir, "orders")
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"), sum(Tables.dec(col("o_totalprice"))).as("rev"))
      .persist()
    try {
      val viaCache = agg.filter(col("n") > 0).orderBy(col("o_orderstatus"))
        .collect().map(_.toString).toSeq
      val direct = Tables.load(spark, dir, "orders")
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"), sum(Tables.dec(col("o_totalprice"))).as("rev"))
        .orderBy(col("o_orderstatus"))
        .collect().map(_.toString).toSeq
      assert(viaCache == direct)
    } finally agg.unpersist()
  }

  test("cached rows from buffer-reusing operators are not aliased (regression)") {
    // explode + projection emit rows whose UnsafeRow backing buffer is
    // REUSED and whose length can exactly equal sizeInBytes — the case
    // where UnsafeRow.getBytes skips its defensive copy. Before the
    // explicit-copy fix every row in a cached batch aliased the last row
    // written (all rows identical, filters matching nothing).
    val exploded = Tables.load(spark, dir, "embeddings")
      .select(col("vec_id"), explode(transform(sequence(lit(0), lit(3)),
        i => struct(i.as("sp"), slice(col("embedding"), i * 16 + 1, lit(16)).as("sv")))).as("x"))
      .select(col("vec_id"), col("x.sp").as("sp"), col("x.sv").as("sv"))
      .cache()
    try {
      val total = exploded.count()
      val distinctIds = exploded.select(col("vec_id")).distinct().count()
      val low = exploded.filter(col("vec_id") < 16).count()
      assert(distinctIds == total / 4, s"cached rows aliased: $distinctIds ids over $total rows")
      assert(low == 64, s"filter over cached exploded rows returned $low (expected 64)")
    } finally exploded.unpersist()
  }
}
