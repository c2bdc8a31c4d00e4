package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates the query library: every implemented operator family from
  * SURVEY.md §2 exposes one or more named queries here, each paired (when
  * SQL-expressible) with a DuckDB oracle in [[oracleSql]].
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    TpchLike.queries("tpch_q01_pricing_summary")(spark, "/root/testdata/sf0.001")

  private def groups: Seq[(Map[String, (SparkSession, String) => DataFrame], Map[String, String])] =
    Seq(
      (TpchLike.queries, TpchLike.oracles),
      (TpcdsPatterns.queries, TpcdsPatterns.oracles),
      (ClickbenchPatterns.queries, ClickbenchPatterns.oracles),
      (RelationalOps.queries, RelationalOps.oracles),
      (ScalarOps.queries, ScalarOps.oracles),
      (DedupOps.queries, DedupOps.oracles),
      (SimilarityOps.queries, SimilarityOps.oracles),
      (TextOps.queries, TextOps.oracles),
      (MultimodalOps.queries, MultimodalOps.oracles),
      (GraphOps.queries, GraphOps.oracles),
      (LakeOps.queries, LakeOps.oracles))

  /** One per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    groups.map(_._1).reduce(_ ++ _)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    groups.map(_._2).reduce(_ ++ _)
}
