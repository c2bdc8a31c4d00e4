package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the ScaleUp generator's embedding-replication contract (VERDICT
  * r11 item 2): replicas must be rigid rotations of the base cloud —
  * within-replica geometry exact, cross-replica cosines at the corpus
  * BACKGROUND rate, never the r11 degeneracy where every replica of a
  * vector was a mutual true near-pair. The embedding corpus is
  * isotropic (cos mean ≈ 0, sd ≈ 1/√64), so cos ≥ 0.4 is tail mass;
  * the honest scale property is per-pair-slot rate parity with the
  * base corpus, which is what the replication must preserve.
  */
class ScaleUpSpec extends AnyFunSuite {
  private lazy val spark = GraftSparkSession.spark
  private val dir = GraftSparkSession.sfDir

  private lazy val base = Tables.load(spark, dir, "embeddings")
    .select(col("vec_id"), col("embedding"))

  /** exact pair count at cos ≥ t over a corpus (unit-normalized dot,
    * the dedup_embedding formulation) and the number of pair slots */
  private def nearStats(df: org.apache.spark.sql.DataFrame, t: Double): (Long, Double) = {
    val u = df
      .withColumn("nrm", sqrt(aggregate(col("embedding"), lit(0.0),
        (a, x) => a + x.cast("double") * x.cast("double"))))
      .withColumn("unit", transform(col("embedding"),
        x => (x.cast("double") / col("nrm")).cast("float")))
    val a = u.select(col("vec_id").as("id_a"), col("unit").as("unit_a"))
      .repartition(spark.sparkContext.defaultParallelism)
    val b = u.select(col("vec_id").as("id_b"), col("unit").as("unit_b"))
    val pairs = a.join(b, col("id_a") < col("id_b") &&
      round(graft.functions.GraftExpressions.dot_product(col("unit_a"), col("unit_b")), 6) >= t)
      .count()
    val n = df.count().toDouble
    (pairs, n * (n - 1) / 2.0)
  }

  test("replica rotation is orthogonal: norms and within-replica cosines exact") {
    val sample = base.filter(col("vec_id") < 40)
    val both = sample
      .withColumn("rot", graft.tools.ScaleUp.rotateEmbedding(col("embedding"), 3))
      .withColumn("n0", sqrt(aggregate(col("embedding"), lit(0.0),
        (a, x) => a + x.cast("double") * x.cast("double"))))
      .withColumn("n1", sqrt(aggregate(col("rot"), lit(0.0),
        (a, x) => a + x.cast("double") * x.cast("double"))))
      .select(col("vec_id"), col("n0"), col("n1"), col("embedding"), col("rot"))
      .collect()
    both.foreach { r =>
      assert(math.abs(r.getDouble(1) - r.getDouble(2)) < 1e-3,
        s"norm not preserved for vec ${r.getLong(0)}")
    }
    // within-replica pairwise cosines: rotated pair == base pair
    val a = sample.select(col("vec_id").as("ia"), col("embedding").as("ea"))
    val b = sample.select(col("vec_id").as("ib"), col("embedding").as("eb"))
    val cosBase = a.join(b, col("ia") < col("ib"))
      .select(col("ia"), col("ib"),
        graft.functions.GraftExpressions.cosine_sim(col("ea"), col("eb")).as("c"))
    val ra = sample.select(col("vec_id").as("ia"),
      graft.tools.ScaleUp.rotateEmbedding(col("embedding"), 3).as("ea"))
    val rb = sample.select(col("vec_id").as("ib"),
      graft.tools.ScaleUp.rotateEmbedding(col("embedding"), 3).as("eb"))
    val cosRot = ra.join(rb, col("ia") < col("ib"))
      .select(col("ia"), col("ib"),
        graft.functions.GraftExpressions.cosine_sim(col("ea"), col("eb")).as("cr"))
    val joined = cosBase.join(cosRot, Seq("ia", "ib")).collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      assert(math.abs(r.getDouble(2) - r.getDouble(3)) < 2e-5,
        s"within-replica cosine moved for (${r.getLong(0)}, ${r.getLong(1)})")
    }
  }

  test("replicas of the same base vector are NOT near-pairs (degeneracy killer)") {
    // the r11 failure mode: cos(v, replica_i(v)) ≈ 1 for EVERY vector
    // (same-base near-pair rate 1.0). After the rotation fix the
    // same-base cosine sits in the background distribution — whose own
    // tail legitimately crosses 0.4 at the background rate (~5e-4, and
    // the MAX over thousands of samples at sd 1/√64 lands near 0.5),
    // so the degeneracy metric is the RATE, not the max: assert it
    // stays within an order of magnitude of background, plus a hard
    // sanity ceiling on the max.
    val stats = (1 to 4).map { i =>
      base.select(
        graft.functions.GraftExpressions.cosine_sim(
          col("embedding"),
          graft.tools.ScaleUp.rotateEmbedding(col("embedding"), i)).as("c"))
        .agg(max(abs(col("c"))).as("mx"),
          sum(when(col("c") >= 0.4, 1).otherwise(0)).as("near"),
          count(lit(1)).as("n")).head
    }
    val worst = stats.map(_.getDouble(0)).max
    val nearRate = stats.map(_.getLong(1)).sum.toDouble / stats.map(_.getLong(2)).sum
    info(f"max |cos(v, rotate_i(v))| over replicas 1..4 = $worst%.4f; " +
      f"same-base near-pair rate = $nearRate%.2e (r11 scheme: 1.0)")
    assert(worst < 0.9, f"same-base replica pair at $worst%.4f — replication degenerate again")
    assert(nearRate < 5e-3,
      f"same-base near-pair rate $nearRate%.2e is above background — replication degenerate again")
  }

  test("scaled-corpus near-pair rate per pair slot matches the base corpus") {
    val t = 0.4
    val (basePairs, baseSlots) = nearStats(base, t)
    val scaled = graft.tools.ScaleUp.replicateEmbeddings(base, 3)
    val (scaledPairs, scaledSlots) = nearStats(scaled, t)
    val baseRate = basePairs / baseSlots
    val scaledRate = scaledPairs / scaledSlots
    info(f"base: $basePairs pairs / ${baseSlots}%.0f slots = $baseRate%.2e; " +
      f"3x: $scaledPairs / ${scaledSlots}%.0f = $scaledRate%.2e")
    // within-replica pairs reproduce the base rate exactly (rigid
    // rotation); cross-replica slots draw from the same background
    // tail, so the total per-slot rate stays within sampling noise of
    // the base rate. The r11 scheme failed this by ~3 orders of
    // magnitude (every same-base replica pair at cos ≈ 1).
    assert(scaledRate <= baseRate * 3 && scaledRate >= baseRate / 3,
      f"per-slot near-pair rate moved: base $baseRate%.2e vs scaled $scaledRate%.2e")
  }

  test("the lake table group writes disjoint-key orders replicas and nothing else") {
    // round 14: `tables=lake` replicates ONLY orders (the lake_*
    // connector queries rebuild from orders slices; writing lineitem at
    // factor 100 would cost minutes and GBs the run never reads)
    val out = java.nio.file.Files.createTempDirectory("scaleup_lake").toString
    graft.tools.ScaleUp.run(spark, dir, out, 3, "lake")
    val files = new java.io.File(out).listFiles().map(_.getName).toSet
    assert(files == Set("orders.parquet"),
      s"lake group must write orders only, got $files")
    val base = Tables.load(spark, dir, "orders")
    val scaled = spark.read.parquet(s"$out/orders.parquet")
    assert(scaled.count() == 3 * base.count())
    // replica key-shifts keep o_orderkey disjoint (no collided keys)
    assert(scaled.select(col("o_orderkey")).distinct().count() == scaled.count())
  }

  test("rotation fails loudly on a non-64-dim embedding (advisor r12)") {
    import spark.implicits._
    // the permutation/Givens structure is hard-wired to 64 dims; a
    // corpus-shape change must abort the generator, not silently emit
    // null-padded replica vectors (element_at past the end is null
    // under non-ANSI)
    val bad = Seq((1L, Array.fill(32)(0.5f))).toDF("vec_id", "embedding")
    val e = intercept[Exception] {
      bad.select(graft.tools.ScaleUp.rotateEmbedding(col("embedding"), 2)).collect()
    }
    assert(e.getMessage.contains("requires 64-dim embeddings"),
      s"expected the width-gate error, got: ${e.getMessage.take(200)}")
    // replica 0 is the identity and passes any width through verbatim
    val id = bad.select(graft.tools.ScaleUp.rotateEmbedding(col("embedding"), 0))
      .head.getSeq[Float](0)
    assert(id.length == 32)
  }
}
