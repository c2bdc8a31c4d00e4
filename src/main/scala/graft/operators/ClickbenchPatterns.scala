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

  // CB q28 shape: regexp_replace-derived domain key (the referer→domain
  // extraction), grouped with a HAVING floor and an avg-length profile
  private val domainReplace: Q = (s, dir) =>
    load(s, dir, "documents")
      .groupBy(regexp_replace(col("source"), "[0-9]+", "").as("domain"),
        col("lang"))
      .agg(count(lit(1)).as("c"),
        (sum(col("n_chars")).cast("double") / count(lit(1))).as("avg_chars"))
      .filter(col("c") > 10)
      .orderBy(col("c").desc, col("domain"), col("lang"))
      .limit(25)

  private val domainReplaceSql =
    """SELECT regexp_replace(source, '[0-9]+', '', 'g') AS domain, lang,
      |  COUNT(*) AS c, CAST(SUM(n_chars) AS DOUBLE) / COUNT(*) AS avg_chars
      |FROM documents
      |GROUP BY 1, 2 HAVING COUNT(*) > 10
      |ORDER BY c DESC, domain, lang LIMIT 25""".stripMargin

  // CB q41-43 shape: minute-grain time series over a bounded window —
  // the drill-down cadence (hour grain lives in ev_hourly_load)
  private val minuteSeries: Q = (s, dir) =>
    load(s, dir, "events")
      .filter(col("ts") >= "2024-01-03 00:00:00" && col("ts") < "2024-01-03 04:00:00")
      .groupBy(date_trunc("minute", col("ts")).as("m"))
      .agg(count(lit(1)).as("hits"), dbl(sum(dec(col("value")))).as("val_sum"))
      .select(unix_micros(col("m")).as("minute_us"), col("hits"), col("val_sum"))
      .orderBy(col("minute_us"))

  private val minuteSeriesSql =
    """SELECT epoch_us(date_trunc('minute', ts)) AS minute_us,
      |  COUNT(*) AS hits,
      |  CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS val_sum
      |FROM events
      |WHERE ts >= TIMESTAMP '2024-01-03 00:00:00' AND ts < TIMESTAMP '2024-01-03 04:00:00'
      |GROUP BY 1 ORDER BY minute_us""".stripMargin

  // CB q30 shape: one pass computing a battery of arithmetic sums —
  // the wide-aggregate stress (ClickBench sums 89 shifted columns; the
  // point is N independent aggregates in one scan, not N scans)
  private val wideSums: Q = (s, dir) => {
    // per-row double arithmetic is deterministic; the DECIMAL(18,4)
    // conversion makes the parallel SUM order-independent
    def d4(c: org.apache.spark.sql.Column) =
      c.cast(org.apache.spark.sql.types.DecimalType(18, 4))
    load(s, dir, "events")
      .agg(
        dbl(sum(d4(col("value") + 1))).as("s1"),
        dbl(sum(d4(col("value") + 2))).as("s2"),
        dbl(sum(d4(col("value") + 3))).as("s3"),
        dbl(sum(d4(col("value") * 2))).as("s4"),
        dbl(sum(d4(col("value") / 2))).as("s5"),
        dbl(sum(d4(col("value") - 1))).as("s6"),
        dbl(sum(d4(col("value") * col("value")))).as("s7"),
        sum(col("user_id") % 97).as("s8"),
        count(lit(1)).as("n"))
  }

  private val wideSumsSql =
    """SELECT
      |  CAST(SUM(CAST(value + 1 AS DECIMAL(18,4))) AS DOUBLE) AS s1,
      |  CAST(SUM(CAST(value + 2 AS DECIMAL(18,4))) AS DOUBLE) AS s2,
      |  CAST(SUM(CAST(value + 3 AS DECIMAL(18,4))) AS DOUBLE) AS s3,
      |  CAST(SUM(CAST(value * 2 AS DECIMAL(18,4))) AS DOUBLE) AS s4,
      |  CAST(SUM(CAST(value / 2 AS DECIMAL(18,4))) AS DOUBLE) AS s5,
      |  CAST(SUM(CAST(value - 1 AS DECIMAL(18,4))) AS DOUBLE) AS s6,
      |  CAST(SUM(CAST(value * value AS DECIMAL(18,4))) AS DOUBLE) AS s7,
      |  CAST(SUM(user_id % 97) AS BIGINT) AS s8, COUNT(*) AS n
      |FROM events""".stripMargin

  // CB q23/q24 shape: full-projection row fetch, newest-first — must
  // plan TakeOrderedAndProject over every column, never a global sort
  private val recentRows: Q = (s, dir) =>
    load(s, dir, "events")
      .orderBy(col("ts").desc, col("event_id"))
      .limit(10)
      .select(col("event_id"), unix_micros(col("ts")).as("ts_us"),
        col("user_id"), col("event_type"), round(col("value"), 6).as("value"),
        col("props"))

  private val recentRowsSql =
    """SELECT event_id, epoch_us(ts) AS ts_us, user_id, event_type,
      |  round(value, 6) AS value, props
      |FROM events ORDER BY ts DESC, event_id LIMIT 10""".stripMargin

  // CB q13-q17 shape: grouped multi-DISTINCT in one pass (distinct
  // users AND distinct types per day — the Expand two-phase plan)
  private val multiDistinctDay: Q = (s, dir) =>
    load(s, dir, "events")
      .groupBy(dayofmonth(col("ts")).as("d"))
      .agg(countDistinct(col("user_id")).as("uniq_users"),
        countDistinct(col("event_type")).as("uniq_types"),
        count(lit(1)).as("hits"))
      .orderBy(col("d"))

  private val multiDistinctDaySql =
    """SELECT CAST(EXTRACT(DAY FROM ts) AS INTEGER) AS d,
      |  COUNT(DISTINCT user_id) AS uniq_users,
      |  COUNT(DISTINCT event_type) AS uniq_types, COUNT(*) AS hits
      |FROM events GROUP BY 1 ORDER BY d""".stripMargin

  // CB q16 shape: high-cardinality composite group key, top-N by count
  // (UserID × SearchPhrase) — partial aggregation must not collapse
  private val pairTopk: Q = (s, dir) =>
    load(s, dir, "events")
      .groupBy(col("user_id"), col("event_type"))
      .agg(count(lit(1)).as("c"), dbl(sum(dec(col("value")))).as("v"))
      .orderBy(col("c").desc, col("user_id"), col("event_type"))
      .limit(20)

  private val pairTopkSql =
    """SELECT user_id, event_type, COUNT(*) AS c,
      |  CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS v
      |FROM events GROUP BY user_id, event_type
      |ORDER BY c DESC, user_id, event_type LIMIT 20""".stripMargin

  // CB q26/q37 shape: global ORDER BY on a long string column with a
  // small LIMIT — top-k by binary string order, not a full sort
  private val stringSortLimit: Q = (s, dir) =>
    load(s, dir, "documents")
      .orderBy(col("text"), col("doc_id"))
      .limit(5)
      .select(col("doc_id"), substring(col("text"), 1, 30).as("prefix"))

  private val stringSortLimitSql =
    """SELECT doc_id, substring(text, 1, 30) AS prefix
      |FROM documents ORDER BY text, doc_id LIMIT 5""".stripMargin

  // CB q21 shape: multi-pattern LIKE mix (AND of a positive and a
  // negative pattern, OR'd with another) over the raw text scan
  private val likeDisjunction: Q = (s, dir) =>
    load(s, dir, "documents")
      .filter((col("text").like("%spark%") && !col("text").like("%window%")) ||
        col("text").like("%stream%merge%"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("c"), min(col("doc_id")).as("first_doc"))
      .orderBy(col("c").desc, col("lang"))

  private val likeDisjunctionSql =
    """SELECT lang, COUNT(*) AS c, MIN(doc_id) AS first_doc
      |FROM documents
      |WHERE (text LIKE '%spark%' AND text NOT LIKE '%window%')
      |   OR text LIKE '%stream%merge%'
      |GROUP BY lang ORDER BY c DESC, lang""".stripMargin

  // regexp_like conjunction folded to one row of slice counts — the
  // regex-heavy scan the reference's corpus stresses
  private val regexFilterCount: Q = (s, dir) =>
    load(s, dir, "documents")
      .agg(
        count(when(col("text").rlike("\\bspark\\b"), 1)).as("has_spark"),
        count(when(col("text").rlike("\\bspark\\b") &&
          !col("text").rlike("\\bflink\\b"), 1)).as("spark_not_flink"),
        count(when(col("text").rlike("(scan|merge) (row|batch)"), 1)).as("phrase"))

  private val regexFilterCountSql =
    """SELECT
      |  COUNT(CASE WHEN regexp_matches(text, '\b(spark)\b') THEN 1 END) AS has_spark,
      |  COUNT(CASE WHEN regexp_matches(text, '\bspark\b')
      |         AND NOT regexp_matches(text, '\bflink\b') THEN 1 END) AS spark_not_flink,
      |  COUNT(CASE WHEN regexp_matches(text, '(scan|merge) (row|batch)') THEN 1 END) AS phrase
      |FROM documents""".stripMargin

  // grouped COUNT(DISTINCT) + FILTER combo: total uniques AND
  // conditional uniques in one Expand pass per group
  private val distinctFilter: Q = (s, dir) => {
    load(s, dir, "events").createOrReplaceTempView("ev_df")
    s.sql(
      """SELECT event_type,
        |  COUNT(DISTINCT user_id) AS uniq_users,
        |  COUNT(DISTINCT user_id) FILTER (WHERE value > 100) AS uniq_big_spenders,
        |  COUNT(*) FILTER (WHERE value > 100) AS big_events
        |FROM ev_df
        |GROUP BY event_type ORDER BY event_type""".stripMargin)
  }

  private val distinctFilterSql =
    """SELECT event_type,
      |  COUNT(DISTINCT user_id) AS uniq_users,
      |  COUNT(DISTINCT user_id) FILTER (WHERE value > 100) AS uniq_big_spenders,
      |  COUNT(*) FILTER (WHERE value > 100) AS big_events
      |FROM events
      |GROUP BY event_type ORDER BY event_type""".stripMargin

  // CB q1–q7 battery: whole-table scalar profile in ONE pass — row
  // count, distinct users, distinct types, exact value total, and the
  // event-date span. One scan, one (tiny) final aggregate.
  private val globalAggs: Q = (s, dir) =>
    load(s, dir, "events")
      .agg(count(lit(1)).as("n"),
        countDistinct(col("user_id")).as("users"),
        countDistinct(col("event_type")).as("types"),
        dbl(sum(dec(col("value")))).as("total_value"),
        date_format(min(col("ts")), "yyyy-MM-dd").as("first_day"),
        date_format(max(col("ts")), "yyyy-MM-dd").as("last_day"))

  private val globalAggsSql =
    """SELECT COUNT(*) AS n, COUNT(DISTINCT user_id) AS users,
      |  COUNT(DISTINCT event_type) AS types,
      |  CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value,
      |  strftime(MIN(ts), '%Y-%m-%d') AS first_day,
      |  strftime(MAX(ts), '%Y-%m-%d') AS last_day
      |FROM events""".stripMargin

  // CB q10 shape: per-key profile mixing plain aggs with a distinct
  // count (SUM, COUNT, AVG, COUNT DISTINCT in one grouping)
  private val regionProfile: Q = (s, dir) =>
    load(s, dir, "events")
      .groupBy(col("event_type"))
      .agg(dbl(sum(dec(col("value")))).as("sum_value"),
        count(lit(1)).as("c"),
        (sum(length(col("props"))).cast("double") / count(lit(1))).as("avg_props_len"),
        countDistinct(col("user_id")).as("u"))
      .orderBy(col("c").desc, col("event_type"))
      .limit(10)

  private val regionProfileSql =
    """SELECT event_type,
      |  CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value,
      |  COUNT(*) AS c,
      |  CAST(SUM(length(props)) AS DOUBLE) / COUNT(*) AS avg_props_len,
      |  COUNT(DISTINCT user_id) AS u
      |FROM events
      |GROUP BY event_type ORDER BY c DESC, event_type LIMIT 10""".stripMargin

  // CB q14 shape: non-empty phrase key, distinct-entity count top-N
  private val phraseUsers: Q = (s, dir) =>
    load(s, dir, "documents")
      .filter(col("lang") =!= "")
      .groupBy(col("lang"))
      .agg(countDistinct(col("source")).as("u"), count(lit(1)).as("c"))
      .orderBy(col("u").desc, col("lang"))
      .limit(10)

  private val phraseUsersSql =
    """SELECT lang, COUNT(DISTINCT source) AS u, COUNT(*) AS c
      |FROM documents WHERE lang <> ''
      |GROUP BY lang ORDER BY u DESC, lang LIMIT 10""".stripMargin

  // CB q37 shape: page-view count under a stack of pushdown-able
  // predicates (type equality + date window + non-empty + positive)
  private val pageviewWindow: Q = (s, dir) =>
    load(s, dir, "events")
      .filter(col("event_type") === "view" &&
        col("ts") >= lit("2024-01-08") && col("ts") < lit("2024-01-15") &&
        col("props") =!= "" && col("value") > 1.0)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("page_views"))
      .orderBy(col("page_views").desc, col("user_id"))
      .limit(10)

  private val pageviewWindowSql =
    """SELECT user_id, COUNT(*) AS page_views
      |FROM events
      |WHERE event_type = 'view' AND ts >= TIMESTAMP '2024-01-08'
      |  AND ts < TIMESTAMP '2024-01-15' AND props <> '' AND value > 1.0
      |GROUP BY user_id ORDER BY page_views DESC, user_id LIMIT 10""".stripMargin

  // CB q41 shape: IN-list + range predicates, modulo-bucketed group key
  private val inListFilter: Q = (s, dir) =>
    load(s, dir, "events")
      .filter(col("event_type").isin("click", "purchase") &&
        col("ts") >= lit("2024-01-05") && col("ts") < lit("2024-01-25") &&
        col("value") >= 0.0)
      .groupBy((col("user_id") % 100).as("bucket"))
      .agg(count(lit(1)).as("c"), dbl(sum(dec(col("value")))).as("sum_value"))
      .orderBy(col("c").desc, col("bucket"))
      .limit(10)

  private val inListFilterSql =
    """SELECT user_id % 100 AS bucket, COUNT(*) AS c,
      |  CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
      |FROM events
      |WHERE event_type IN ('click', 'purchase') AND ts >= TIMESTAMP '2024-01-05'
      |  AND ts < TIMESTAMP '2024-01-25' AND value >= 0.0
      |GROUP BY 1 ORDER BY c DESC, bucket LIMIT 10""".stripMargin

  // CB q1/q2 shape: the bare COUNT(*) scan pair — full-table count and
  // a filtered count in one report (both are metadata/pushdown-friendly
  // scans, the floor of the ClickBench suite)
  private val countStar: Q = (s, dir) => {
    val ev = load(s, dir, "events")
    ev.agg(count(lit(1)).as("n_all"))
      .crossJoin(ev.filter(col("event_type") === "click")
        .agg(count(lit(1)).as("n_clicks")))
  }

  private val countStarSql =
    """SELECT (SELECT COUNT(*) FROM events) AS n_all,
      |  (SELECT COUNT(*) FROM events WHERE event_type = 'click') AS n_clicks""".stripMargin

  // CB q4/q5/q6 shape: global scalar aggregates — plain AVG plus two
  // COUNT(DISTINCT) over columns of very different cardinality
  private val globalDistincts: Q = (s, dir) =>
    load(s, dir, "events")
      .agg(round(sum(col("user_id")).cast("double") / count(lit(1)), 6).as("avg_user"),
        countDistinct(col("user_id")).as("uniq_users"),
        countDistinct(col("event_type")).as("uniq_types"))

  private val globalDistinctsSql =
    """SELECT round(CAST(SUM(user_id) AS DOUBLE) / COUNT(*), 6) AS avg_user,
      |  COUNT(DISTINCT user_id) AS uniq_users,
      |  COUNT(DISTINCT event_type) AS uniq_types
      |FROM events""".stripMargin

  // CB q7 shape: MIN/MAX over the event-time column (scan-level
  // min/max, satisfiable from parquet footer stats at scale)
  private val minmaxTime: Q = (s, dir) =>
    load(s, dir, "events")
      .agg(date_format(min(col("ts")), "yyyy-MM-dd HH:mm:ss").as("min_ts"),
        date_format(max(col("ts")), "yyyy-MM-dd HH:mm:ss").as("max_ts"))

  private val minmaxTimeSql =
    """SELECT strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS min_ts,
      |  strftime(MAX(ts), '%Y-%m-%d %H:%M:%S') AS max_ts
      |FROM events""".stripMargin

  // CB q8 shape: GROUP BY ordered by the bare aggregate expression
  // (no alias) — the order key is COUNT(*) itself, descending, no LIMIT
  private val groupOrderByAgg: Q = (s, dir) =>
    load(s, dir, "events")
      .filter(col("event_type") =!= "view")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("event_type"))

  private val groupOrderByAggSql =
    """SELECT event_type, COUNT(*) AS cnt
      |FROM events WHERE event_type <> 'view'
      |GROUP BY event_type ORDER BY cnt DESC, event_type""".stripMargin

  // CB q35 shape: a constant in the GROUP BY key list alongside a real
  // column — the planner must not let the literal break hash grouping
  private val constGroup: Q = (s, dir) =>
    load(s, dir, "events")
      .groupBy(lit(1).as("one"), col("event_type"))
      .agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("event_type"))
      .limit(10)

  private val constGroupSql =
    """SELECT 1 AS one, event_type, COUNT(*) AS c
      |FROM events GROUP BY 1, event_type
      |ORDER BY c DESC, event_type LIMIT 10""".stripMargin

  // CB q39/q41 shape: deep pagination — ordered aggregate report read
  // at LIMIT 10 OFFSET 100 (the "page 11" cut; Spark plans the offset
  // into a single CollectLimit, not a global materialization)
  private val deepOffsetPage: Q = (s, dir) =>
    load(s, dir, "events")
      .filter(col("event_type") === "view")
      .groupBy(col("user_id"), to_date(col("ts")).cast("string").as("day"))
      .agg(count(lit(1)).as("page_views"))
      .orderBy(col("page_views").desc, col("user_id"), col("day"))
      .offset(100)
      .limit(10)

  private val deepOffsetPageSql =
    """SELECT user_id, CAST(CAST(ts AS DATE) AS VARCHAR) AS day, COUNT(*) AS page_views
      |FROM events WHERE event_type = 'view'
      |GROUP BY 1, 2
      |ORDER BY page_views DESC, user_id, day
      |LIMIT 10 OFFSET 100""".stripMargin

  // CB q12 shape: two-key grouping with a filtered COUNT(DISTINCT) —
  // the (MobilePhone, MobilePhoneModel) distinct-user profile
  private val twoKeyDistinct: Q = (s, dir) =>
    load(s, dir, "events")
      .filter(col("props") =!= "")
      .groupBy(col("event_type"), floor(col("value") / 100).cast("int").as("band"))
      .agg(countDistinct(col("user_id")).as("u"))
      .orderBy(col("u").desc, col("event_type"), col("band"))
      .limit(10)

  private val twoKeyDistinctSql =
    """SELECT event_type, CAST(FLOOR(value / 100) AS INTEGER) AS band,
      |  COUNT(DISTINCT user_id) AS u
      |FROM events WHERE props <> ''
      |GROUP BY 1, 2 ORDER BY u DESC, event_type, band LIMIT 10""".stripMargin

  // CB q15 shape: the (SearchEngineID, SearchPhrase) two-dimension
  // count — source×language counts over documents
  private val sourceLangTopk: Q = (s, dir) =>
    load(s, dir, "documents")
      .filter(col("lang") =!= "")
      .groupBy(col("source"), col("lang"))
      .agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("source"), col("lang"))
      .limit(10)

  private val sourceLangTopkSql =
    """SELECT source, lang, COUNT(*) AS c
      |FROM documents WHERE lang <> ''
      |GROUP BY 1, 2 ORDER BY c DESC, source, lang LIMIT 10""".stripMargin

  // CB q25 shape: the projected time-ordered fetch (SearchPhrase BY
  // EventTime) — narrow projection, no aggregation
  private val projectedRecent: Q = (s, dir) =>
    load(s, dir, "events")
      .filter(col("props") =!= "")
      .orderBy(col("ts"), col("event_id"))
      .limit(10)
      .select(col("event_type"), col("props"))

  private val projectedRecentSql =
    """SELECT event_type, props
      |FROM events WHERE props <> ''
      |ORDER BY ts, event_id LIMIT 10""".stripMargin

  // CB q27 shape: the two-key ORDER BY (EventTime, SearchPhrase) cut
  private val twoKeySort: Q = (s, dir) =>
    load(s, dir, "events")
      .filter(col("props") =!= "")
      .orderBy(col("event_type"), col("ts"), col("event_id"))
      .limit(10)
      .select(col("event_type"), unix_micros(col("ts")).as("ts_us"),
        col("event_id"))

  private val twoKeySortSql =
    """SELECT event_type, epoch_us(ts) AS ts_us, event_id
      |FROM events WHERE props <> ''
      |ORDER BY event_type, ts, event_id LIMIT 10""".stripMargin

  // CB q31/q32/q33 shape: composite-key profile with SUM and AVG
  // alongside COUNT — the (SearchEngineID, ClientIP) report
  private val pairProfile: Q = (s, dir) =>
    load(s, dir, "events")
      .filter(col("props") =!= "")
      .groupBy(col("user_id"), col("event_type"))
      .agg(count(lit(1)).as("c"), dbl(sum(dec(col("value")))).as("sum_v"),
        (sum(length(col("props"))).cast("double") / count(lit(1))).as("avg_len"))
      .orderBy(col("c").desc, col("user_id"), col("event_type"))
      .limit(10)

  private val pairProfileSql =
    """SELECT user_id, event_type, COUNT(*) AS c,
      |  CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_v,
      |  CAST(SUM(length(props)) AS DOUBLE) / COUNT(*) AS avg_len
      |FROM events WHERE props <> ''
      |GROUP BY 1, 2 ORDER BY c DESC, user_id, event_type LIMIT 10""".stripMargin

  // CB q34 shape: top high-cardinality strings by count (URL top-N) —
  // the raw props payload as the group key
  private val urlTopk: Q = (s, dir) =>
    load(s, dir, "events")
      .filter(col("props") =!= "")
      .groupBy(col("props"))
      .agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("props"))
      .limit(10)

  private val urlTopkSql =
    """SELECT props, COUNT(*) AS c
      |FROM events WHERE props <> ''
      |GROUP BY props ORDER BY c DESC, props LIMIT 10""".stripMargin

  // CB q41 shape: hash-pinned slice with pagination — one derived
  // bucket of the payload column (cross-engine arithmetic hash stand-in
  // for the URLHash pin), grouped and read past an offset
  private val hashPinnedOffset: Q = (s, dir) =>
    load(s, dir, "events")
      .filter(pmod(length(col("props")) * 31 + col("event_id"), lit(100)) === 7)
      .groupBy(col("user_id"), to_date(col("ts")).cast("string").as("day"))
      .agg(count(lit(1)).as("page_views"))
      .orderBy(col("page_views").desc, col("user_id"), col("day"))
      .offset(10)
      .limit(10)

  private val hashPinnedOffsetSql =
    """SELECT user_id, CAST(CAST(ts AS DATE) AS VARCHAR) AS day, COUNT(*) AS page_views
      |FROM events
      |WHERE (length(props) * 31 + event_id) % 100 = 7
      |GROUP BY 1, 2
      |ORDER BY page_views DESC, user_id, day
      |LIMIT 10 OFFSET 10""".stripMargin

  // CB q42 shape: paired derived numeric keys (WindowClientWidth,
  // WindowClientHeight) — two computed columns as the composite group
  private val valueShapePairs: Q = (s, dir) =>
    load(s, dir, "events")
      .filter(col("event_type") === "view")
      .groupBy(floor(col("value") / 50).cast("int").as("w"),
        length(col("props")).as("h"))
      .agg(count(lit(1)).as("page_views"))
      .orderBy(col("page_views").desc, col("w"), col("h"))
      .limit(10)

  private val valueShapePairsSql =
    """SELECT CAST(FLOOR(value / 50) AS INTEGER) AS w,
      |  CAST(length(props) AS INTEGER) AS h, COUNT(*) AS page_views
      |FROM events WHERE event_type = 'view'
      |GROUP BY 1, 2 ORDER BY page_views DESC, w, h LIMIT 10""".stripMargin

  // CB q2 shape: the standalone filtered COUNT(*) (AdvEngineID <> 0)
  private val filteredCount: Q = (s, dir) =>
    load(s, dir, "events").filter(col("value") =!= 0.0)
      .agg(count(lit(1)).as("n"))

  private val filteredCountSql =
    "SELECT COUNT(*) AS n FROM events WHERE value <> 0.0"

  // CB q5 shape: the standalone global COUNT(DISTINCT UserID)
  private val uniqUsers: Q = (s, dir) =>
    load(s, dir, "events").agg(countDistinct(col("user_id")).as("u"))

  private val uniqUsersSql =
    "SELECT COUNT(DISTINCT user_id) AS u FROM events"

  // CB q6 shape: COUNT(DISTINCT) over the high-cardinality payload
  // (SearchPhrase) — the distinct-heavy twin of q5
  private val uniqPayloads: Q = (s, dir) =>
    load(s, dir, "events").agg(countDistinct(col("props")).as("u"))

  private val uniqPayloadsSql =
    "SELECT COUNT(DISTINCT props) AS u FROM events"

  // CB q13 shape: plain top-N by count over one string key (the
  // SearchPhrase count report; q14's distinct-user twin is
  // cb_phrase_users)
  private val sourceCounts: Q = (s, dir) =>
    load(s, dir, "documents")
      .filter(col("source") =!= "")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("source"))
      .limit(10)

  private val sourceCountsSql =
    """SELECT source, COUNT(*) AS c
      |FROM documents WHERE source <> ''
      |GROUP BY source ORDER BY c DESC, source LIMIT 10""".stripMargin

  // CB q38 shape: the Title binding of the pinned-window report —
  // text-prefix page titles counted under a dimension pin
  private val titleWindow: Q = (s, dir) =>
    load(s, dir, "documents")
      .filter(col("lang") === "en" && col("n_chars").between(200, 2000))
      .groupBy(substring(col("text"), 1, 20).as("title"))
      .agg(count(lit(1)).as("page_views"))
      .orderBy(col("page_views").desc, col("title"))
      .limit(10)

  private val titleWindowSql =
    """SELECT substring(text, 1, 20) AS title, COUNT(*) AS page_views
      |FROM documents
      |WHERE lang = 'en' AND n_chars BETWEEN 200 AND 2000
      |GROUP BY 1 ORDER BY page_views DESC, title LIMIT 10""".stripMargin

  // CB q42 shape: paired derived keys under a hash pin (the
  // URLHash-pinned WindowClientWidth × Height pairs)
  private val pinnedPairs: Q = (s, dir) =>
    load(s, dir, "events")
      .filter(pmod(length(col("props")) * 31 + col("event_id"), lit(100)) === 3)
      .groupBy(floor(col("value") / 20).cast("int").as("w"),
        minute(col("ts")).as("h"))
      .agg(count(lit(1)).as("page_views"))
      .orderBy(col("page_views").desc, col("w"), col("h"))
      .limit(10)

  private val pinnedPairsSql =
    """SELECT CAST(FLOOR(value / 20) AS INTEGER) AS w,
      |  CAST(EXTRACT(MINUTE FROM ts) AS INTEGER) AS h, COUNT(*) AS page_views
      |FROM events
      |WHERE (length(props) * 31 + event_id) % 100 = 3
      |GROUP BY 1, 2 ORDER BY page_views DESC, w, h LIMIT 10""".stripMargin

  val queries: Map[String, Q] = Map(
    "cb_filtered_count" -> filteredCount,
    "cb_uniq_users" -> uniqUsers,
    "cb_uniq_payloads" -> uniqPayloads,
    "cb_source_counts" -> sourceCounts,
    "cb_title_window" -> titleWindow,
    "cb_pinned_pairs" -> pinnedPairs,
    "cb_two_key_distinct" -> twoKeyDistinct,
    "cb_source_lang_topk" -> sourceLangTopk,
    "cb_projected_recent" -> projectedRecent,
    "cb_two_key_sort" -> twoKeySort,
    "cb_pair_profile" -> pairProfile,
    "cb_url_topk" -> urlTopk,
    "cb_hash_pinned_offset" -> hashPinnedOffset,
    "cb_value_shape_pairs" -> valueShapePairs,
    "cb_count_star" -> countStar,
    "cb_global_distincts" -> globalDistincts,
    "cb_minmax_time" -> minmaxTime,
    "cb_group_order_by_agg" -> groupOrderByAgg,
    "cb_const_group" -> constGroup,
    "cb_deep_offset_page" -> deepOffsetPage,
    "cb_global_aggs" -> globalAggs,
    "cb_region_profile" -> regionProfile,
    "cb_phrase_users" -> phraseUsers,
    "cb_pageview_window" -> pageviewWindow,
    "cb_in_list_filter" -> inListFilter,
    "cb_like_disjunction" -> likeDisjunction,
    "cb_regex_filter_count" -> regexFilterCount,
    "cb_distinct_filter" -> distinctFilter,
    "cb_domain_replace" -> domainReplace,
    "cb_minute_series" -> minuteSeries,
    "cb_wide_sums" -> wideSums,
    "cb_recent_rows" -> recentRows,
    "cb_multi_distinct_day" -> multiDistinctDay,
    "cb_pair_topk" -> pairTopk,
    "cb_string_sort_limit" -> stringSortLimit,
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
    "cb_filtered_count" -> filteredCountSql,
    "cb_uniq_users" -> uniqUsersSql,
    "cb_uniq_payloads" -> uniqPayloadsSql,
    "cb_source_counts" -> sourceCountsSql,
    "cb_title_window" -> titleWindowSql,
    "cb_pinned_pairs" -> pinnedPairsSql,
    "cb_two_key_distinct" -> twoKeyDistinctSql,
    "cb_source_lang_topk" -> sourceLangTopkSql,
    "cb_projected_recent" -> projectedRecentSql,
    "cb_two_key_sort" -> twoKeySortSql,
    "cb_pair_profile" -> pairProfileSql,
    "cb_url_topk" -> urlTopkSql,
    "cb_hash_pinned_offset" -> hashPinnedOffsetSql,
    "cb_value_shape_pairs" -> valueShapePairsSql,
    "cb_count_star" -> countStarSql,
    "cb_global_distincts" -> globalDistinctsSql,
    "cb_minmax_time" -> minmaxTimeSql,
    "cb_group_order_by_agg" -> groupOrderByAggSql,
    "cb_const_group" -> constGroupSql,
    "cb_deep_offset_page" -> deepOffsetPageSql,
    "cb_global_aggs" -> globalAggsSql,
    "cb_region_profile" -> regionProfileSql,
    "cb_phrase_users" -> phraseUsersSql,
    "cb_pageview_window" -> pageviewWindowSql,
    "cb_in_list_filter" -> inListFilterSql,
    "cb_like_disjunction" -> likeDisjunctionSql,
    "cb_regex_filter_count" -> regexFilterCountSql,
    "cb_distinct_filter" -> distinctFilterSql,
    "cb_domain_replace" -> domainReplaceSql,
    "cb_minute_series" -> minuteSeriesSql,
    "cb_wide_sums" -> wideSumsSql,
    "cb_recent_rows" -> recentRowsSql,
    "cb_multi_distinct_day" -> multiDistinctDaySql,
    "cb_pair_topk" -> pairTopkSql,
    "cb_string_sort_limit" -> stringSortLimitSql,
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
