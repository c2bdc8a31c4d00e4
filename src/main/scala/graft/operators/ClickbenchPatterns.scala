package graft.operators

import graft.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** ClickBench query-pattern pack — the web-analytics grammar of the
  * reference's 43-query corpus (tools/gluten-it/common/src/main/
  * resources/clickbench-queries/) re-expressed over the `events` and
  * `documents` tables: regexp extraction as a group key (q29), LIKE /
  * NOT-LIKE scans with top-N (q22/q23), substring bucketing, point
  * lookups (q20), time-ordered top-k (q24/q25), arithmetic group keys
  * (q36), CASE-derived grouping with LIMIT+OFFSET pagination (q40).
  * Complements the ev_* set in [[RelationalOps]] (uniques, percentiles,
  * histograms, trends). All oracled against DuckDB.
  *
  * Scale notes: every aggregation here is a single hash shuffle over a
  * filtered scan; top-k always rides TakeOrderedAndProject (no global
  * sort); point/range predicates reach the parquet scan as
  * PushedFilters; every ORDER BY is total (tie-broken by the full
  * group key) so LIMIT/OFFSET cuts are deterministic at any
  * parallelism.
  */
object ClickbenchPatterns {

  type Q = (SparkSession, String) => DataFrame

  // CB q29 shape: regexp-extracted key as the GROUP BY expression with
  // avg-length profiling and a HAVING floor
  private val regexExtractGroup: Q = (s, dir) =>
    load(s, dir, "events")
      .filter(col("props") =!= "")
      .groupBy(regexp_extract(col("props"), "\"k\": (\\d+)", 1).as("k"))
      .agg((sum(length(col("props"))).cast("double") / count(lit(1))).as("l"),
        count(lit(1)).as("c"))
      .filter(col("c") > 50)
      .orderBy(col("l").desc, col("k"))
      .limit(25)

  private val regexExtractGroupSql =
    """SELECT regexp_extract(props, '"k": (\d+)', 1) AS k,
      |  CAST(SUM(length(props)) AS DOUBLE) / COUNT(*) AS l, COUNT(*) AS c
      |FROM events WHERE props <> ''
      |GROUP BY 1 HAVING COUNT(*) > 50
      |ORDER BY l DESC, k LIMIT 25""".stripMargin

  // CB q22 shape: LIKE-filtered scan, per-key top-N by count
  private val likeFilterTop: Q = (s, dir) =>
    load(s, dir, "documents")
      .filter(col("text").like("%window%") && col("lang") =!= "")
      .groupBy(col("source"))
      .agg(min(col("doc_id")).as("min_doc"), count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("source"))
      .limit(10)

  private val likeFilterTopSql =
    """SELECT source, MIN(doc_id) AS min_doc, COUNT(*) AS c
      |FROM documents WHERE text LIKE '%window%' AND lang <> ''
      |GROUP BY source ORDER BY c DESC, source LIMIT 10""".stripMargin

  // CB q23 shape: LIKE + NOT LIKE + distinct-count per group
  private val notLikeDistinct: Q = (s, dir) =>
    load(s, dir, "documents")
      .filter(col("text").like("%table%") && !col("text").like("%stream%"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("c"), countDistinct(col("lang")).as("langs"),
        min(col("n_chars")).as("min_chars"))
      .orderBy(col("c").desc, col("source"))
      .limit(10)

  private val notLikeDistinctSql =
    """SELECT source, COUNT(*) AS c, COUNT(DISTINCT lang) AS langs,
      |  MIN(n_chars) AS min_chars
      |FROM documents WHERE text LIKE '%table%' AND text NOT LIKE '%stream%'
      |GROUP BY source ORDER BY c DESC, source LIMIT 10""".stripMargin

  // substring-bucketing shape: a fixed-width prefix as the group key
  private val substrBucket: Q = (s, dir) =>
    load(s, dir, "documents")
      .groupBy(substring(col("text"), 1, 5).as("bucket"))
      .agg(count(lit(1)).as("c"),
        (sum(col("n_chars")).cast("double") / count(lit(1))).as("avg_chars"))
      .orderBy(col("c").desc, col("bucket"))
      .limit(10)

  private val substrBucketSql =
    """SELECT substr(text, 1, 5) AS bucket, COUNT(*) AS c,
      |  CAST(SUM(n_chars) AS DOUBLE) / COUNT(*) AS avg_chars
      |FROM documents
      |GROUP BY 1 ORDER BY c DESC, bucket LIMIT 10""".stripMargin

  // CB q20 shape: point lookup on a pushdown-able key
  private val pointLookup: Q = (s, dir) =>
    load(s, dir, "events")
      .filter(col("user_id") === 42L)
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
      .orderBy(col("event_id"))

  private val pointLookupSql =
    """SELECT event_id, user_id, event_type, value
      |FROM events WHERE user_id = 42 ORDER BY event_id""".stripMargin

  // CB q24/q25 shape: filtered scan ordered by event time, top-k
  private val timeTopk: Q = (s, dir) =>
    load(s, dir, "events")
      .filter(col("event_type") === "error")
      .select(col("event_id"), col("ts").cast("string").as("ts_s"), col("value"))
      .orderBy(col("ts_s"), col("event_id"))
      .limit(10)

  private val timeTopkSql =
    """SELECT event_id, CAST(ts AS VARCHAR) AS ts_s, value
      |FROM events WHERE event_type = 'error'
      |ORDER BY ts_s, event_id LIMIT 10""".stripMargin

  // CB q36 shape: arithmetic expressions of one column as extra group
  // keys (grouping-key codegen; the keys are functionally dependent)
  private val arithGroup: Q = (s, dir) =>
    load(s, dir, "events")
      .groupBy(col("user_id"), (col("user_id") - 1).as("u1"),
        (col("user_id") - 2).as("u2"))
      .agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("user_id"))
      .limit(10)

  private val arithGroupSql =
    """SELECT user_id, user_id - 1 AS u1, user_id - 2 AS u2, COUNT(*) AS c
      |FROM events
      |GROUP BY user_id, user_id - 1, user_id - 2
      |ORDER BY c DESC, user_id LIMIT 10""".stripMargin

  // CB q40 shape: CASE-derived source column in the group key plus
  // LIMIT + OFFSET pagination
  private val caseSrcPaged: Q = (s, dir) =>
    load(s, dir, "events")
      .filter(dayofmonth(col("ts")) <= 15)
      .groupBy(col("event_type"),
        when(col("value") < 10.0, col("props")).otherwise(lit("")).as("src"))
      .agg(count(lit(1)).as("page_views"))
      .orderBy(col("page_views").desc, col("event_type"), col("src"))
      .offset(10)
      .limit(10)

  private val caseSrcPagedSql =
    """SELECT event_type,
      |  CASE WHEN value < 10.0 THEN props ELSE '' END AS src,
      |  COUNT(*) AS page_views
      |FROM events WHERE EXTRACT(DAY FROM ts) <= 15
      |GROUP BY 1, 2
      |ORDER BY page_views DESC, event_type, src
      |LIMIT 10 OFFSET 10""".stripMargin

  // CB q28 shape: length profiling with a HAVING floor, ordered by the
  // profiled average
  private val lengthProfile: Q = (s, dir) =>
    load(s, dir, "documents")
      .filter(col("text") =!= "")
      .groupBy(col("lang"))
      .agg((sum(length(col("text"))).cast("double") / count(lit(1))).as("l"),
        count(lit(1)).as("c"))
      .filter(col("c") > 20)
      .orderBy(col("l").desc, col("lang"))
      .limit(25)

  private val lengthProfileSql =
    """SELECT lang, CAST(SUM(length(text)) AS DOUBLE) / COUNT(*) AS l,
      |  COUNT(*) AS c
      |FROM documents WHERE text <> ''
      |GROUP BY lang HAVING COUNT(*) > 20
      |ORDER BY l DESC, lang LIMIT 25""".stripMargin

  val queries: Map[String, Q] = Map(
    "cb_regex_extract_group" -> regexExtractGroup,
    "cb_like_filter_top" -> likeFilterTop,
    "cb_not_like_distinct" -> notLikeDistinct,
    "cb_substr_bucket" -> substrBucket,
    "cb_point_lookup" -> pointLookup,
    "cb_time_topk" -> timeTopk,
    "cb_arith_group" -> arithGroup,
    "cb_case_src_paged" -> caseSrcPaged,
    "cb_length_profile" -> lengthProfile)

  val oracles: Map[String, String] = Map(
    "cb_regex_extract_group" -> regexExtractGroupSql,
    "cb_like_filter_top" -> likeFilterTopSql,
    "cb_not_like_distinct" -> notLikeDistinctSql,
    "cb_substr_bucket" -> substrBucketSql,
    "cb_point_lookup" -> pointLookupSql,
    "cb_time_topk" -> timeTopkSql,
    "cb_arith_group" -> arithGroupSql,
    "cb_case_src_paged" -> caseSrcPagedSql,
    "cb_length_profile" -> lengthProfileSql)
}
