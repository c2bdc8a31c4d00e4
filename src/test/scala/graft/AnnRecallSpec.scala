package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Quantitative recall gates for the approximate ANN paths, measured
  * from the RAW top-k results (`SimilarityOps.rawAnn`; the exported
  * sim_ann_* queries emit oracled recall-gate summaries instead):
  * LSH-bucketed and IVF coarse-quantized top-k are measured against
  * the exact brute-force ranking. Everything is deterministic (hash-derived hyperplanes,
  * label centroids), so the recall is a fixed number per dataset — the
  * floors pinned here fail on any regression in bucketing or probing.
  */
class AnnRecallSpec extends AnyFunSuite {
  private lazy val spark = GraftSparkSession.spark
  private val dir = GraftSparkSession.sfDir

  private def topSets(df: DataFrame, k: Int): Map[Long, Set[Long]] =
    df.filter(col("rnk") <= k).select(col("qid"), col("cid")).collect()
      .groupBy(_.getLong(0)).map { case (q, rows) => q -> rows.map(_.getLong(1)).toSet }

  private def recallAt3(approx: Map[Long, Set[Long]], exact: Map[Long, Set[Long]]): Double = {
    val per = exact.map { case (q, ex) =>
      approx.getOrElse(q, Set.empty).count(ex.contains).toDouble / ex.size
    }
    per.sum / per.size
  }

  private lazy val exact3 = topSets(
    SparkEntry.queries("sim_ann_brute_topk")(spark, dir), 3)

  test("LSH-bucketed ANN meets its pinned recall@3 floor") {
    // this corpus has weak angular structure (true top-3 at cos ≈
    // 0.3-0.4), so measure at the 4-bit operating point where buckets
    // are coarse enough to be meaningful; hamming-1 multi-probe covers
    // one disagreeing plane
    val old = spark.conf.getOption(GraftConf.SimLshBits.key)
    spark.conf.set(GraftConf.SimLshBits.key, "4")
    try {
      val lsh = topSets(graft.operators.SimilarityOps.rawAnn("sim_ann_lsh")(spark, dir), 3)
      val r = recallAt3(lsh, exact3)
      info(f"sim_ann_lsh recall@3 (4 bits, multi-probe) = $r%.3f over ${exact3.size} queries")
      assert(r >= 0.30, f"LSH recall@3 regressed: $r%.3f")
    } finally old match {
      case Some(v) => spark.conf.set(GraftConf.SimLshBits.key, v)
      case None => spark.conf.unset(GraftConf.SimLshBits.key)
    }
  }

  test("ANN-shortlist margin mining meets its pinned survivor-recall floor") {
    // pair-level agreement with the exact O(n²) miner: an exact
    // surviving (sid, tid) pair counts as recalled only when the ANN
    // pipeline emits the identical pair. Misses come from LSH
    // candidate gaps AND from the margin argmax shifting when the
    // neighborhood means are estimated over candidates only — both are
    // deterministic on a fixed corpus (hash-derived hyperplanes), so
    // the floor fails on any bucketing/margin-math regression.
    // Measured 0.48 at the 500-vector corpus, 4-bit operating point.
    val exact = SparkEntry.queries("sim_margin_mining")(spark, dir)
      .select(col("sid"), col("tid")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ann = graft.operators.SimilarityOps.marginMiningAnn(spark, dir)
      .select(col("sid"), col("tid")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val r = if (exact.isEmpty) 1.0 else exact.count(ann).toDouble / exact.size
    info(f"sim_margin_mining_ann survivor recall vs exact = $r%.3f over ${exact.size} exact survivors")
    assert(r >= 0.30, f"margin-mining ANN survivor recall regressed: $r%.3f")
    // the approximate path must never emit a pair whose cosine it
    // mis-states: every ANN survivor's cos must equal the exact cosine
    // of that pair (the margin is estimate-dependent, the cosine is not)
    val exCos = SparkEntry.queries("sim_margin_mining")(spark, dir)
      .select(col("sid"), col("tid"), col("cos")).collect()
      .map(r2 => ((r2.getLong(0), r2.getLong(1)), r2.getDouble(2))).toMap
    val annCos = graft.operators.SimilarityOps.marginMiningAnn(spark, dir)
      .select(col("sid"), col("tid"), col("cos")).collect()
      .map(r2 => ((r2.getLong(0), r2.getLong(1)), r2.getDouble(2)))
    annCos.filter(p => exCos.contains(p._1)).foreach { case (k, c) =>
      assert(c == exCos(k), s"cos mismatch on shared survivor $k") }
  }

  test("IVF coarse-quantized ANN meets its pinned recall@3 floor") {
    val ivf = topSets(graft.operators.SimilarityOps.rawAnn("sim_ann_ivf")(spark, dir), 3)
    val r = recallAt3(ivf, exact3)
    info(f"sim_ann_ivf recall@3 = $r%.3f over ${exact3.size} queries")
    // 2-of-|labels| probed partitions
    assert(r >= 0.25, f"IVF recall@3 regressed: $r%.3f")
  }

  test("IVF with learned k-means centroids meets its pinned recall@3 floor") {
    val ivf = topSets(graft.operators.SimilarityOps.rawAnn("sim_ann_ivf_kmeans")(spark, dir), 3)
    val r = recallAt3(ivf, exact3)
    info(f"sim_ann_ivf_kmeans recall@3 = $r%.3f over ${exact3.size} queries")
    // 2-of-4 probed learned partitions
    assert(r >= 0.25, f"k-means IVF recall@3 regressed: $r%.3f")
  }

  test("PQ ADC shortlist + exact re-rank meets its pinned recall@3 floor") {
    val pq = topSets(graft.operators.SimilarityOps.rawAnn("sim_ann_pq")(spark, dir), 3)
    val r = recallAt3(pq, exact3)
    info(f"sim_ann_pq recall@3 = $r%.3f over ${exact3.size} queries")
    // 16 subspaces × 16-centroid codebooks, shortlist 32 of ~490
    assert(r >= 0.50, f"PQ recall@3 regressed: $r%.3f")
  }

  test("k-means refinement monotonically reduces total inertia (Lloyd's invariant)") {
    import graft.operators.SimilarityOps
    val e = graft.Tables.load(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding"))
    var cents = SimilarityOps.kmeansInit(e, 4)
    var prev = SimilarityOps.kmeansInertia(e, cents)
    for (it <- 1 to 3) {
      cents = SimilarityOps.kmeansRefine(e, cents)
      val cur = SimilarityOps.kmeansInertia(e, cents)
      info(f"iteration $it: inertia $prev%.3f -> $cur%.3f")
      // float-quantized centroids can cost a hair of exactness; allow 1e-3
      assert(cur <= prev + 1e-3, f"inertia rose at iteration $it: $prev%.3f -> $cur%.3f")
      prev = cur
    }
    assert(cents.size == 4, s"expected 4 non-empty clusters, got ${cents.size}")
  }
}
