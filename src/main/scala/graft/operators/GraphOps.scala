package graft.operators

import graft.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Iterative graph analytics over tables — beyond the reference's
  * operator surface (it offloads no graph work; SURVEY.md §7 step 5),
  * but a standard ask of a 100 TB data-curation engine (link-graph
  * quality signals over crawled corpora).
  *
  * PageRank here is the classic distributed formulation: ranks live in a
  * DataFrame co-keyed with the edge list, every iteration is one
  * edges⋈ranks shuffle + a dst-keyed aggregation, and the per-node
  * constant (1-d)/N enters via a broadcast 1-row aggregate — no driver
  * collect of anything proportional to the graph. Five fixed iterations
  * keep the plan bounded; the edge list is cached once (it is reused by
  * all iterations and by the degree table).
  *
  * The DuckDB oracle unrolls the same five iterations as chained CTEs —
  * identical damping, identical dangling-free bipartite graph — so the
  * hash gate proves the distributed loop computes the textbook fixpoint
  * step, not an approximation of it.
  */
object GraphOps {

  type Q = (SparkSession, String) => DataFrame

  private val damping = 0.85
  private val iters = 5

  // bipartite user↔prop-key graph from the events stream, symmetrized so
  // every node has out-edges (no dangling-mass correction needed)
  private def edgeList(s: SparkSession, dir: String): DataFrame = {
    val base = load(s, dir, "events")
      .select(concat(lit("u"), col("user_id")).as("src"),
        concat(lit("k"), get_json_object(col("props"), "$.k")).as("dst"))
      .distinct()
    base.union(base.select(col("dst").as("src"), col("src").as("dst")))
  }

  private val pagerank: Q = (s, dir) => {
    val edges = edgeList(s, dir).cache()
    val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("od"))
    val nodes = edges.select(col("src").as("id")).distinct()
    val nDf = nodes.agg(count(lit(1)).cast("double").as("n"))
    var ranks = nodes.crossJoin(broadcast(nDf))
      .select(col("id"), (lit(1.0) / col("n")).as("pr"))
    for (_ <- 0 until iters) {
      val contribs = edges.join(deg, "src")
        .join(ranks.withColumnRenamed("id", "src"), "src")
        .groupBy(col("dst")).agg(sum(col("pr") / col("od")).as("contrib"))
      ranks = nodes.join(contribs.withColumnRenamed("dst", "id"), Seq("id"), "left")
        .crossJoin(broadcast(nDf))
        .select(col("id"),
          ((lit(1.0) - damping) / col("n") +
            lit(damping) * coalesce(col("contrib"), lit(0.0))).as("pr"))
    }
    ranks.filter(col("id").startsWith("k"))
      .select(col("id"), round(col("pr"), 6).as("pr"))
      .orderBy(col("id"))
  }

  private def iterCte(k: Int): String =
    s"""r$k AS (
       |  SELECT nodes.id, 0.15e0 / nn.n + 0.85e0 * COALESCE(c.contrib, 0.0e0) AS pr
       |  FROM nodes CROSS JOIN nn
       |  LEFT JOIN (SELECT e.dst AS id, SUM(r.pr / deg.od) AS contrib
       |             FROM edges e JOIN deg ON e.src = deg.src
       |             JOIN r${k - 1} r ON e.src = r.id GROUP BY 1) c ON nodes.id = c.id)""".stripMargin

  private val pagerankSql =
    s"""WITH base AS (
       |  SELECT DISTINCT 'u' || CAST(user_id AS VARCHAR) AS src,
       |    'k' || json_extract_string(props, '$$.k') AS dst FROM events),
       |edges AS (SELECT src, dst FROM base UNION ALL SELECT dst, src FROM base),
       |deg AS (SELECT src, COUNT(*) AS od FROM edges GROUP BY 1),
       |nodes AS (SELECT DISTINCT src AS id FROM edges),
       |nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM nodes),
       |r0 AS (SELECT id, 1.0e0 / nn.n AS pr FROM nodes CROSS JOIN nn),
       |${(1 to iters).map(iterCte).mkString(",\n")}
       |SELECT id, ROUND(pr, 6) AS pr FROM r$iters WHERE id LIKE 'k%'
       |ORDER BY id""".stripMargin

  /** degree-distribution profile of the same graph: out-degree per node
    * → histogram per node class (user/key). Two narrowing aggregations —
    * the standard first look at any crawled link graph. */
  private val degreeStats: Q = (s, dir) => {
    val deg = edgeList(s, dir)
      .groupBy(col("src")).agg(count(lit(1)).as("degree"))
    deg.select(substring(col("src"), 1, 1).as("node_class"), col("degree"))
      .groupBy(col("node_class"), col("degree"))
      .agg(count(lit(1)).as("n_nodes"))
      .orderBy(col("node_class"), col("degree"))
  }

  private val degreeStatsSql =
    s"""WITH base AS (
       |  SELECT DISTINCT 'u' || CAST(user_id AS VARCHAR) AS src,
       |    'k' || json_extract_string(props, '$$.k') AS dst FROM events),
       |edges AS (SELECT src, dst FROM base UNION ALL SELECT dst, src FROM base),
       |deg AS (SELECT src, COUNT(*) AS degree FROM edges GROUP BY 1)
       |SELECT substr(src, 1, 1) AS node_class, degree, COUNT(*) AS n_nodes
       |FROM deg GROUP BY 1, 2 ORDER BY node_class, degree""".stripMargin

  val queries: Map[String, Q] = Map(
    "graph_pagerank" -> pagerank,
    "graph_degree_stats" -> degreeStats)

  val oracles: Map[String, String] = Map(
    "graph_pagerank" -> pagerankSql,
    "graph_degree_stats" -> degreeStatsSql)
}
