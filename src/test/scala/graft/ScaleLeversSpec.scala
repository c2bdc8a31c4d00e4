package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Direct pins for the round-12 corpus-scaled planning levers: the LSH
  * plane count and the SemDeDup k both derive from parquet-footer row
  * counts, and every ORACLE-scale corpus must land exactly on the
  * pinned operating points (4 bits / k=4) while the 100× replica
  * corpus gets the scaled values that keep candidate volume ~n·log n
  * and per-cluster verify bounded. A regression here silently turns
  * the embedding family quadratic again, so the mapping is pinned as
  * numbers, not just exercised implicitly by the oracle battery.
  */
class ScaleLeversSpec extends AnyFunSuite {
  private lazy val spark = GraftSparkSession.spark

  /** tmp embeddings table with n rows (footer stats read rows only) */
  private def dirWithRows(n: Long): String = {
    val d = java.nio.file.Files.createTempDirectory("graft_levers").toString
    spark.range(n).select(col("id").as("vec_id"))
      .coalesce(4).write.mode("overwrite").parquet(s"$d/embeddings.parquet")
    d
  }

  test("autoLshBits: oracle corpora stay at the pinned floor, replicas scale ~log2(n/target)") {
    val S = graft.operators.SimilarityOps
    assert(S.autoLshBits(spark, dirWithRows(500), 4) == 4,
      "sf0.01-sized corpus must stay at the 4-bit oracle operating point")
    assert(S.autoLshBits(spark, dirWithRows(2000), 4) == 4,
      "sf0.1-sized corpus must stay at the 4-bit oracle operating point")
    assert(S.autoLshBits(spark, dirWithRows(20000), 4) == 7)   // 10x replicas
    assert(S.autoLshBits(spark, dirWithRows(200000), 4) == 10) // 100x replicas
    // candidate-volume shape: n^2 * (1+bits) / 2^bits at the scaled bits
    // must grow sub-quadratically across a decade. The ceil() on the
    // bit count makes mean occupancy oscillate within [target/2, target]
    // so a single decade step can carry up to ~2x rounding phase on top
    // of the ~n·log n ideal (10 x 11/8 = 13.75 here) — the bound is set
    // between that worst case (~27) and fixed-bits quadratic growth
    // (100x). Measured walls grew 4-5x (BENCH_PIPE_SCALING round 12).
    def candVolume(n: Double, bits: Int) = n * n * (1 + bits) / math.pow(2, bits)
    val growth = candVolume(200000, 10) / candVolume(20000, 7)
    assert(growth < 35.0, f"candidate volume grew $growth%.1fx for 10x data — not ~n log n")
  }

  test("semanticK: oracle corpora stay at the k=4 the DuckDB oracle unrolls; replicas scale") {
    val S = graft.operators.SimilarityOps
    assert(S.semanticK(spark, dirWithRows(500)) == 4)
    assert(S.semanticK(spark, dirWithRows(2000)) == 4,
      "every oracle SF must keep the unrolled k=4")
    assert(S.semanticK(spark, dirWithRows(20000)) == 40)
    assert(S.semanticK(spark, dirWithRows(200000)) == 400)
    // per-cluster occupancy stays at the target, so within-cluster pair
    // work is ~n * target / 2 — linear in n at fixed target
    assert(200000 / S.semanticK(spark, dirWithRows(200000)) == 500)
  }

  test("the levers honor their session confs") {
    val S = graft.operators.SimilarityOps
    val d = dirWithRows(200000)
    spark.conf.set(GraftConf.SimLshBucketTarget.key, "1024")
    spark.conf.set(GraftConf.SimSemanticClusterTarget.key, "2000")
    try {
      assert(S.autoLshBits(spark, d, 4) == 8)  // 200000/1024 -> ceil(log2(195.3)) = 8
      assert(S.semanticK(spark, d) == 100)     // ceil(200000/2000)
    } finally {
      spark.conf.unset(GraftConf.SimLshBucketTarget.key)
      spark.conf.unset(GraftConf.SimSemanticClusterTarget.key)
    }
  }
}
