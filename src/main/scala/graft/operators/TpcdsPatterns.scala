package graft.operators

import graft.Tables._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** TPC-DS query-pattern pack adapted to the TPC-H-ish test schema —
  * the decision-support grammar the reference ships as its 103-query
  * corpus (tools/gluten-it/common/src/main/resources/tpcds-queries/):
  * date-dimension star joins, demographic multi-dim filters, two-level
  * ticket aggregations, cross-dimension inequality predicates, windowed
  * ratio reports, and channel unions. Each query keeps the *shape* of
  * its DS counterpart (named in the comment) on the tables available
  * here; every one is oracled against DuckDB.
  *
  * Scale notes: the derived date dimension is tiny (one row per distinct
  * day) so Catalyst broadcasts it and the star joins are DPP/bloom
  * eligible exactly like a real date_dim; money aggregates go through
  * the shared DECIMAL helpers so parallel partial aggregation stays
  * order-independent; every ORDER BY is a total order (ties broken by
  * the full group key) so LIMIT cuts are deterministic at any
  * parallelism.
  */
object TpcdsPatterns {

  type Q = (SparkSession, String) => DataFrame

  /** derived date dimension over ship dates — the date_dim star-join
    * analog (one row per distinct day, broadcast-sized at any SF) */
  private def dateDim(s: SparkSession, dir: String): DataFrame =
    load(s, dir, "lineitem").select(col("l_shipdate").as("d_date")).distinct()
      .select(col("d_date"), year(col("d_date")).as("d_year"),
        month(col("d_date")).as("d_moy"), dayofmonth(col("d_date")).as("d_dom"))

  private val dateDimSql =
    """date_dim AS (
      |  SELECT d_date,
      |    CAST(EXTRACT(YEAR FROM d_date) AS INTEGER) AS d_year,
      |    CAST(EXTRACT(MONTH FROM d_date) AS INTEGER) AS d_moy,
      |    CAST(EXTRACT(DAY FROM d_date) AS INTEGER) AS d_dom
      |  FROM (SELECT DISTINCT l_shipdate AS d_date FROM lineitem))""".stripMargin

  // DS q3/q52/q55 shape: date_dim star join, brand-level revenue,
  // ordered by (year, revenue desc, brand)
  private val q3Brand: Q = (s, dir) => {
    val dt = dateDim(s, dir).filter(col("d_moy") === 12)
    load(s, dir, "lineitem")
      .join(dt, col("l_shipdate") === col("d_date"))
      .join(load(s, dir, "part").filter(col("p_size") === 7),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("d_year"), col("p_brand"))
      .agg(dbl(sum(dec(col("l_extendedprice")))).as("sum_agg"))
      .orderBy(col("d_year"), col("sum_agg").desc, col("p_brand"))
      .limit(100)
  }

  private val q3BrandSql =
    s"""WITH $dateDimSql
      |SELECT d_year, p_brand,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_agg
      |FROM lineitem
      |JOIN date_dim ON l_shipdate = d_date AND d_moy = 12
      |JOIN part ON l_partkey = p_partkey
      |WHERE p_size = 7
      |GROUP BY d_year, p_brand
      |ORDER BY d_year, sum_agg DESC, p_brand
      |LIMIT 100""".stripMargin

  // DS q42 shape: category revenue in one year, ordered by revenue desc
  private val q42Category: Q = (s, dir) => {
    val dt = dateDim(s, dir).filter(col("d_year") === 1996)
    load(s, dir, "lineitem")
      .join(dt, col("l_shipdate") === col("d_date"))
      .join(load(s, dir, "part"), col("l_partkey") === col("p_partkey"))
      .groupBy(col("d_year"), col("p_type"))
      .agg(dbl(sum(dec(col("l_extendedprice")))).as("ext_price"))
      .orderBy(col("ext_price").desc, col("d_year"), col("p_type"))
      .limit(100)
  }

  private val q42CategorySql =
    s"""WITH $dateDimSql
      |SELECT d_year, p_type,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS ext_price
      |FROM lineitem
      |JOIN date_dim ON l_shipdate = d_date AND d_year = 1996
      |JOIN part ON l_partkey = p_partkey
      |GROUP BY d_year, p_type
      |ORDER BY ext_price DESC, d_year, p_type
      |LIMIT 100""".stripMargin

  // DS q7 shape: multi-dimension demographic filters (segment = the
  // customer_demographics analog, priority disjunction = the promotion
  // analog) feeding four per-brand averages
  private val q7DemoAvg: Q = (s, dir) =>
    load(s, dir, "lineitem")
      .join(load(s, dir, "orders")
          .filter((col("o_orderpriority") === "1-URGENT" ||
            col("o_orderpriority") === "2-HIGH") &&
            year(col("o_orderdate")) === 1996),
        col("l_orderkey") === col("o_orderkey"))
      .join(load(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING"),
        col("o_custkey") === col("c_custkey"))
      .join(load(s, dir, "part"), col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"))
      .agg((dbl(sum(dec(col("l_quantity")))) / count(lit(1))).as("agg1"),
        (dbl(sum(dec(col("l_extendedprice")))) / count(lit(1))).as("agg2"),
        (dbl(sum(rate(col("l_discount")))) / count(lit(1))).as("agg3"),
        (dbl(sum(rate(col("l_tax")))) / count(lit(1))).as("agg4"))
      .orderBy(col("p_brand"))
      .limit(100)

  private val q7DemoAvgSql =
    """SELECT p_brand,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS agg1,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS agg2,
      |  CAST(SUM(CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) / COUNT(*) AS agg3,
      |  CAST(SUM(CAST(l_tax AS DECIMAL(4,2))) AS DOUBLE) / COUNT(*) AS agg4
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN part ON l_partkey = p_partkey
      |WHERE (o_orderpriority = '1-URGENT' OR o_orderpriority = '2-HIGH')
      |  AND EXTRACT(YEAR FROM o_orderdate) = 1996
      |  AND c_mktsegment = 'BUILDING'
      |GROUP BY p_brand
      |ORDER BY p_brand
      |LIMIT 100""".stripMargin

  // DS q19 shape: brand/manufacturer revenue with a cross-dimension
  // inequality (customer nation <> supplier nation, the zip <> zip
  // analog) — forces both dim chains into the same fact row
  private val q19CrossNation: Q = (s, dir) => {
    val cn = load(s, dir, "nation")
      .select(col("n_nationkey").as("cn_key"), col("n_name").as("cn_name"))
    val sn = load(s, dir, "nation")
      .select(col("n_nationkey").as("sn_key"), col("n_name").as("sn_name"))
    load(s, dir, "lineitem")
      .filter(year(col("l_shipdate")) === 1996 && month(col("l_shipdate")) === 11)
      .join(load(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .join(load(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
      .join(cn, col("c_nationkey") === col("cn_key"))
      .join(load(s, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
      .join(sn, col("s_nationkey") === col("sn_key"))
      .filter(col("cn_name") =!= col("sn_name"))
      .join(load(s, dir, "part"), col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"), col("p_type"))
      .agg(dbl(sum(dec(col("l_extendedprice")))).as("ext_price"))
      .orderBy(col("ext_price").desc, col("p_brand"), col("p_type"))
      .limit(100)
  }

  private val q19CrossNationSql =
    """SELECT p_brand, p_type,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS ext_price
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation cn ON c_nationkey = cn.n_nationkey
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN nation sn ON s_nationkey = sn.n_nationkey
      |JOIN part ON l_partkey = p_partkey
      |WHERE EXTRACT(YEAR FROM l_shipdate) = 1996
      |  AND EXTRACT(MONTH FROM l_shipdate) = 11
      |  AND cn.n_name <> sn.n_name
      |GROUP BY p_brand, p_type
      |ORDER BY ext_price DESC, p_brand, p_type
      |LIMIT 100""".stripMargin

  // DS q34 shape: two-level aggregation — per-ticket line counts inside
  // a date-window, bucketed on the count, then joined back to the
  // customer dimension for naming
  private val q34TicketBuckets: Q = (s, dir) => {
    val inner = load(s, dir, "lineitem")
      .join(load(s, dir, "orders")
          .filter(dayofmonth(col("o_orderdate")).between(1, 3) ||
            dayofmonth(col("o_orderdate")).between(25, 28)),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_orderkey"), col("o_custkey"))
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt").between(5, 7))
    inner
      .join(load(s, dir, "customer")
          .filter(col("c_mktsegment").isin("AUTOMOBILE", "MACHINERY")),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_name"), col("c_mktsegment"),
        col("l_orderkey").as("ticket"), col("cnt"))
      .orderBy(col("c_name"), col("ticket"))
  }

  private val q34TicketBucketsSql =
    """SELECT c_name, c_mktsegment, l_orderkey AS ticket, cnt
      |FROM (
      |  SELECT l_orderkey, o_custkey, COUNT(*) AS cnt
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |  WHERE EXTRACT(DAY FROM o_orderdate) BETWEEN 1 AND 3
      |     OR EXTRACT(DAY FROM o_orderdate) BETWEEN 25 AND 28
      |  GROUP BY l_orderkey, o_custkey) dn
      |JOIN customer ON o_custkey = c_custkey
      |WHERE cnt BETWEEN 5 AND 7
      |  AND c_mktsegment IN ('AUTOMOBILE', 'MACHINERY')
      |ORDER BY c_name, ticket""".stripMargin

  // DS q68 shape: per-ticket money sums carrying a "bought location"
  // dimension (supplier nation), joined to the customer's own nation
  // with an inequality (ca_city <> bought_city analog)
  private val q68BoughtNation: Q = (s, dir) => {
    val sn = load(s, dir, "nation")
      .select(col("n_nationkey").as("sn_key"), col("n_name").as("bought_nation"))
    val cn = load(s, dir, "nation")
      .select(col("n_nationkey").as("cn_key"), col("n_name").as("cur_nation"))
    val inner = load(s, dir, "lineitem")
      .join(load(s, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
      .join(sn, col("s_nationkey") === col("sn_key"))
      .join(load(s, dir, "orders").filter(dayofmonth(col("o_orderdate")).between(1, 2)),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_orderkey"), col("o_custkey"), col("bought_nation"))
      .agg(dbl(sum(dec(col("l_extendedprice")))).as("extended_price"),
        dbl(sum(dec(col("l_extendedprice") * (lit(1.0) + col("l_tax"))))).as("charge"))
    inner
      .join(load(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
      .join(cn, col("c_nationkey") === col("cn_key"))
      .filter(col("cur_nation") =!= col("bought_nation"))
      .select(col("c_name"), col("cur_nation"), col("bought_nation"),
        col("l_orderkey").as("ticket"), col("extended_price"), col("charge"))
      .orderBy(col("c_name"), col("ticket"), col("bought_nation"))
      .limit(100)
  }

  private val q68BoughtNationSql =
    """SELECT c_name, cur.n_name AS cur_nation, bought_nation,
      |  l_orderkey AS ticket, extended_price, charge
      |FROM (
      |  SELECT l_orderkey, o_custkey, sn.n_name AS bought_nation,
      |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS extended_price,
      |    CAST(SUM(CAST(l_extendedprice * (1.0 + l_tax) AS DECIMAL(12,2))) AS DOUBLE) AS charge
      |  FROM lineitem
      |  JOIN supplier ON l_suppkey = s_suppkey
      |  JOIN nation sn ON s_nationkey = sn.n_nationkey
      |  JOIN orders ON l_orderkey = o_orderkey
      |  WHERE EXTRACT(DAY FROM o_orderdate) BETWEEN 1 AND 2
      |  GROUP BY l_orderkey, o_custkey, sn.n_name) dn
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation cur ON c_nationkey = cur.n_nationkey
      |WHERE cur.n_name <> bought_nation
      |ORDER BY c_name, ticket, bought_nation
      |LIMIT 100""".stripMargin

  // DS q53/q63 shape: monthly brand revenue vs its all-months window
  // average — the windowed-ratio report. The window aggregate runs over
  // DECIMAL month sums so it is order-independent at any parallelism.
  private val q53RatioWindow: Q = (s, dir) => {
    val monthly = load(s, dir, "lineitem")
      .join(load(s, dir, "part"), col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"), year(col("l_shipdate")).as("d_year"),
        month(col("l_shipdate")).as("d_moy"))
      .agg(sum(dec(col("l_extendedprice"))).as("sales_dec"))
    val w = Window.partitionBy(col("p_brand"))
    monthly.select(col("p_brand"), col("d_year"), col("d_moy"),
        dbl(col("sales_dec")).as("sum_sales"),
        (sum(col("sales_dec")).over(w).cast("double") /
          count(lit(1)).over(w)).as("avg_monthly"))
      .filter(col("sum_sales") > col("avg_monthly") * 1.15)
      .select(col("p_brand"), col("d_year"), col("d_moy"), col("sum_sales"),
        round(col("sum_sales") / col("avg_monthly"), 6).as("ratio"))
      .orderBy(col("p_brand"), col("d_year"), col("d_moy"))
  }

  private val q53RatioWindowSql =
    """SELECT p_brand, d_year, d_moy, sum_sales,
      |  round(sum_sales / avg_monthly, 6) AS ratio
      |FROM (
      |  SELECT p_brand, d_year, d_moy,
      |    CAST(sales_dec AS DOUBLE) AS sum_sales,
      |    CAST(SUM(sales_dec) OVER (PARTITION BY p_brand) AS DOUBLE) /
      |      COUNT(*) OVER (PARTITION BY p_brand) AS avg_monthly
      |  FROM (
      |    SELECT p_brand,
      |      CAST(EXTRACT(YEAR FROM l_shipdate) AS INTEGER) AS d_year,
      |      CAST(EXTRACT(MONTH FROM l_shipdate) AS INTEGER) AS d_moy,
      |      SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS sales_dec
      |    FROM lineitem JOIN part ON l_partkey = p_partkey
      |    GROUP BY 1, 2, 3) monthly) t
      |WHERE sum_sales > avg_monthly * 1.15
      |ORDER BY p_brand, d_year, d_moy""".stripMargin

  // DS q33/q56/q60 shape: three "channels" (filter-defined slices)
  // aggregated independently, UNION ALL'd, then re-aggregated per brand
  private val q33ChannelUnion: Q = (s, dir) => {
    val li = load(s, dir, "lineitem")
      .join(load(s, dir, "part"), col("l_partkey") === col("p_partkey"))
    def chan(cond: Column): DataFrame =
      li.filter(cond).groupBy(col("p_brand"))
        .agg(sum(dec(col("l_extendedprice"))).as("sales"))
    chan(col("l_returnflag") === "A")
      .union(chan(col("l_linestatus") === "F"))
      .union(chan(col("l_discount") > 0.05))
      .groupBy(col("p_brand"))
      .agg(dbl(sum(col("sales"))).as("total_sales"))
      .orderBy(col("total_sales").desc, col("p_brand"))
      .limit(100)
  }

  private val q33ChannelUnionSql =
    """WITH c1 AS (
      |  SELECT p_brand, SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS sales
      |  FROM lineitem JOIN part ON l_partkey = p_partkey
      |  WHERE l_returnflag = 'A' GROUP BY p_brand),
      |c2 AS (
      |  SELECT p_brand, SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS sales
      |  FROM lineitem JOIN part ON l_partkey = p_partkey
      |  WHERE l_linestatus = 'F' GROUP BY p_brand),
      |c3 AS (
      |  SELECT p_brand, SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS sales
      |  FROM lineitem JOIN part ON l_partkey = p_partkey
      |  WHERE l_discount > 0.05 GROUP BY p_brand)
      |SELECT p_brand, CAST(SUM(sales) AS DOUBLE) AS total_sales
      |FROM (SELECT * FROM c1 UNION ALL SELECT * FROM c2 UNION ALL SELECT * FROM c3)
      |GROUP BY p_brand
      |ORDER BY total_sales DESC, p_brand
      |LIMIT 100""".stripMargin

  // DS q88 shape: one result row assembled from N disjoint filter-slice
  // counts (scalar subqueries cross-joined — each slice an independent
  // scan the planner may reuse or parallelize)
  private val q88MultiSlice: Q = (s, dir) => {
    val li = load(s, dir, "lineitem")
    def slice(name: String, lo: Double, hi: Double, flag: String): DataFrame =
      li.filter(col("l_quantity") >= lo && col("l_quantity") < hi &&
          col("l_returnflag") === flag)
        .agg(count(lit(1)).as(name))
    slice("c1", 0, 10, "A").crossJoin(slice("c2", 10, 20, "A"))
      .crossJoin(slice("c3", 20, 30, "A")).crossJoin(slice("c4", 30, 60, "A"))
      .crossJoin(slice("c5", 0, 10, "R")).crossJoin(slice("c6", 10, 20, "R"))
      .crossJoin(slice("c7", 20, 30, "R")).crossJoin(slice("c8", 30, 60, "R"))
  }

  private val q88MultiSliceSql =
    """SELECT
      |  (SELECT COUNT(*) FROM lineitem WHERE l_quantity >= 0 AND l_quantity < 10 AND l_returnflag = 'A') AS c1,
      |  (SELECT COUNT(*) FROM lineitem WHERE l_quantity >= 10 AND l_quantity < 20 AND l_returnflag = 'A') AS c2,
      |  (SELECT COUNT(*) FROM lineitem WHERE l_quantity >= 20 AND l_quantity < 30 AND l_returnflag = 'A') AS c3,
      |  (SELECT COUNT(*) FROM lineitem WHERE l_quantity >= 30 AND l_quantity < 60 AND l_returnflag = 'A') AS c4,
      |  (SELECT COUNT(*) FROM lineitem WHERE l_quantity >= 0 AND l_quantity < 10 AND l_returnflag = 'R') AS c5,
      |  (SELECT COUNT(*) FROM lineitem WHERE l_quantity >= 10 AND l_quantity < 20 AND l_returnflag = 'R') AS c6,
      |  (SELECT COUNT(*) FROM lineitem WHERE l_quantity >= 20 AND l_quantity < 30 AND l_returnflag = 'R') AS c7,
      |  (SELECT COUNT(*) FROM lineitem WHERE l_quantity >= 30 AND l_quantity < 60 AND l_returnflag = 'R') AS c8""".stripMargin

  // DS q5/q77 shape: per-channel sales and returns aggregated
  // independently, stitched with an OUTER join per key, then totaled —
  // the report union where one side can have no rows for a key
  private val q77ChannelReturns: Q = (s, dir) => {
    val li = load(s, dir, "lineitem")
      .join(load(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
    val sales = li.groupBy(col("o_orderpriority").as("p"))
      .agg(sum(dec(col("l_extendedprice"))).as("sales"))
    val returns = li.filter(col("l_returnflag") === "R")
      .groupBy(col("o_orderpriority").as("p"))
      .agg(sum(dec(col("l_extendedprice"))).as("returns"))
    sales.join(returns, Seq("p"), "left_outer")
      .select(col("p").as("channel"),
        dbl(col("sales")).as("sales"),
        dbl(coalesce(col("returns"), lit(0))).as("returns"),
        dbl(col("sales") - coalesce(col("returns"), lit(0))).as("net"))
      .orderBy(col("channel"))
  }

  private val q77ChannelReturnsSql =
    """WITH j AS (
      |  SELECT o_orderpriority AS p, l_extendedprice, l_returnflag
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
      |s AS (SELECT p, SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS sales FROM j GROUP BY p),
      |r AS (SELECT p, SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS returns
      |      FROM j WHERE l_returnflag = 'R' GROUP BY p)
      |SELECT s.p AS channel, CAST(sales AS DOUBLE) AS sales,
      |  CAST(COALESCE(returns, 0) AS DOUBLE) AS returns,
      |  CAST(sales - COALESCE(returns, 0) AS DOUBLE) AS net
      |FROM s LEFT JOIN r ON s.p = r.p
      |ORDER BY channel""".stripMargin

  // DS q98 shape: revenue share of each item inside its class — the
  // ratio-of-total window report (DECIMAL window sums stay exact)
  private val q98RevenueShare: Q = (s, dir) => {
    val rev = load(s, dir, "lineitem")
      .join(load(s, dir, "part"), col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_type"), col("p_brand"))
      .agg(sum(dec(col("l_extendedprice"))).as("rev_dec"))
    val w = Window.partitionBy(col("p_type"))
    rev.select(col("p_type"), col("p_brand"),
        dbl(col("rev_dec")).as("revenue"),
        round(dbl(col("rev_dec")) * 100.0 /
          sum(col("rev_dec")).over(w).cast("double"), 6).as("revshare"))
      .orderBy(col("p_type"), col("revshare").desc, col("p_brand"))
  }

  private val q98RevenueShareSql =
    """SELECT p_type, p_brand, CAST(rev_dec AS DOUBLE) AS revenue,
      |  round(CAST(rev_dec AS DOUBLE) * 100.0 /
      |    CAST(SUM(rev_dec) OVER (PARTITION BY p_type) AS DOUBLE), 6) AS revshare
      |FROM (
      |  SELECT p_type, p_brand, SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS rev_dec
      |  FROM lineitem JOIN part ON l_partkey = p_partkey
      |  GROUP BY p_type, p_brand) t
      |ORDER BY p_type, revshare DESC, p_brand""".stripMargin

  // DS q35 shape: customers passing an EXISTS gate, profiled per
  // (nation, segment) with count + min/max/avg of a numeric attribute
  private val q35DemoProfile: Q = (s, dir) => {
    val active = load(s, dir, "customer")
      .join(load(s, dir, "orders")
          .filter(year(col("o_orderdate")) === 1996)
          .select(col("o_custkey")).distinct(),
        col("c_custkey") === col("o_custkey"), "left_semi")
    active.join(load(s, dir, "nation"), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"), col("c_mktsegment"))
      .agg(count(lit(1)).as("cnt"),
        dbl(min(dec(col("c_acctbal")))).as("min_bal"),
        dbl(max(dec(col("c_acctbal")))).as("max_bal"),
        (dbl(sum(dec(col("c_acctbal")))) / count(lit(1))).as("avg_bal"))
      .orderBy(col("n_name"), col("c_mktsegment"))
  }

  private val q35DemoProfileSql =
    """SELECT n_name, c_mktsegment, COUNT(*) AS cnt,
      |  CAST(MIN(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS min_bal,
      |  CAST(MAX(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS max_bal,
      |  CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_bal
      |FROM customer
      |JOIN nation ON c_nationkey = n_nationkey
      |WHERE EXISTS (SELECT 1 FROM orders
      |              WHERE o_custkey = c_custkey
      |                AND EXTRACT(YEAR FROM o_orderdate) = 1996)
      |GROUP BY n_name, c_mktsegment
      |ORDER BY n_name, c_mktsegment""".stripMargin

  // DS q93 shape: returns-adjusted actual sales — a per-row CASE folds
  // the return channel into the measure before the aggregation
  private val q93ReturnAdjusted: Q = (s, dir) =>
    load(s, dir, "lineitem")
      .join(load(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey"),
        // exact decimal×decimal product — a double product cast to
        // DECIMAL would hit half-cent rounding-rule differences
        when(col("l_returnflag") === "R",
          dec(col("l_extendedprice")) * rate(lit(1.0) - col("l_discount")))
          .otherwise(dec(col("l_extendedprice"))).as("act"))
      .groupBy(col("o_custkey"))
      .agg(dbl(sum(col("act"))).as("act_sales"))
      .orderBy(col("act_sales"), col("o_custkey"))
      .limit(100)

  private val q93ReturnAdjustedSql =
    """SELECT o_custkey,
      |  CAST(SUM(CASE WHEN l_returnflag = 'R'
      |       THEN CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1.0 - l_discount AS DECIMAL(4,2))
      |       ELSE CAST(l_extendedprice AS DECIMAL(12,2)) END) AS DOUBLE) AS act_sales
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY o_custkey
      |ORDER BY act_sales, o_custkey
      |LIMIT 100""".stripMargin

  // DS q30 shape: entities above a multiple of their group's average —
  // aggregate at two grains, join the finer onto the coarser
  private val q30AboveAvg: Q = (s, dir) => {
    val spend = load(s, dir, "orders").filter(col("o_orderstatus") === "F")
      .join(load(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_custkey"), col("c_nationkey"))
      .agg(sum(dec(col("o_totalprice"))).as("spend_dec"))
    val natAvg = spend.groupBy(col("c_nationkey").as("nk"))
      .agg((sum(col("spend_dec")).cast("double") / count(lit(1))).as("nat_avg"))
    spend.join(natAvg, col("c_nationkey") === col("nk"))
      .filter(dbl(col("spend_dec")) > col("nat_avg") * 1.2)
      .select(col("c_custkey"), col("c_nationkey").cast("int").as("nation"),
        dbl(col("spend_dec")).as("spend"), round(col("nat_avg"), 6).as("nat_avg"))
      .orderBy(col("c_custkey"))
  }

  private val q30AboveAvgSql =
    """WITH spend AS (
      |  SELECT c_custkey, c_nationkey, SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS spend_dec
      |  FROM orders JOIN customer ON o_custkey = c_custkey
      |  WHERE o_orderstatus = 'F'
      |  GROUP BY c_custkey, c_nationkey),
      |na AS (
      |  SELECT c_nationkey AS nk, CAST(SUM(spend_dec) AS DOUBLE) / COUNT(*) AS nat_avg
      |  FROM spend GROUP BY c_nationkey)
      |SELECT c_custkey, CAST(c_nationkey AS INTEGER) AS nation,
      |  CAST(spend_dec AS DOUBLE) AS spend, round(nat_avg, 6) AS nat_avg
      |FROM spend JOIN na ON c_nationkey = nk
      |WHERE CAST(spend_dec AS DOUBLE) > nat_avg * 1.2
      |ORDER BY c_custkey""".stripMargin

  // DS q36 shape: gross-margin ratio over ROLLUP(type, brand) with a
  // RANK *within each hierarchy level* — the report-grammar stress test
  // (grouping() feeding both the window partition and the final order)
  private val q36MarginRank: Q = (s, dir) => {
    val margin = load(s, dir, "lineitem")
      .join(load(s, dir, "part"), col("l_partkey") === col("p_partkey"))
      .rollup(col("p_type"), col("p_brand"))
      .agg(
        (sum(dec(col("l_extendedprice")) * rate(lit(1.0) - col("l_discount")))
          .cast("double") /
          sum(dec(col("l_extendedprice"))).cast("double")).as("margin"),
        (grouping(col("p_type")) + grouping(col("p_brand"))).cast("int").as("lochierarchy"),
        grouping(col("p_brand")).cast("int").as("gb"))
    val w = Window
      .partitionBy(col("lochierarchy"),
        when(col("gb") === 0, col("p_type")))
      .orderBy(col("margin"))
    margin
      .select(col("p_type"), col("p_brand"), round(col("margin"), 6).as("margin"),
        col("lochierarchy"), rank().over(w).as("rank_within_parent"))
      .orderBy(col("lochierarchy").desc, col("p_type"), col("p_brand"))
      .limit(100)
  }

  private val q36MarginRankSql =
    """SELECT p_type, p_brand, round(margin, 6) AS margin,
      |  lochierarchy,
      |  CAST(RANK() OVER (PARTITION BY lochierarchy,
      |      CASE WHEN gb = 0 THEN p_type END
      |    ORDER BY margin) AS INTEGER) AS rank_within_parent
      |FROM (
      |  SELECT p_type, p_brand,
      |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
      |             CAST(1.0 - l_discount AS DECIMAL(4,2))) AS DOUBLE) /
      |      CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS margin,
      |    CAST(GROUPING(p_type) + GROUPING(p_brand) AS INTEGER) AS lochierarchy,
      |    CAST(GROUPING(p_brand) AS INTEGER) AS gb
      |  FROM lineitem JOIN part ON l_partkey = p_partkey
      |  GROUP BY ROLLUP(p_type, p_brand)) t
      |ORDER BY lochierarchy DESC, p_type, p_brand
      |LIMIT 100""".stripMargin

  // DS q48 shape: one total over three disjunctive (segment × quantity
  // band × discount band) slices — the multi-band OR predicate that
  // stresses CNF conversion and scan-level filter pushdown
  private val q48QtyBands: Q = (s, dir) =>
    load(s, dir, "lineitem")
      .join(load(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .join(load(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
      .filter(
        (col("c_mktsegment") === "BUILDING" &&
          col("l_quantity").between(0, 20) && col("l_discount").between(0.00, 0.05)) ||
        (col("c_mktsegment") === "MACHINERY" &&
          col("l_quantity").between(10, 30) && col("l_discount").between(0.02, 0.07)) ||
        (col("c_mktsegment") === "AUTOMOBILE" &&
          col("l_quantity").between(20, 40) && col("l_discount").between(0.04, 0.09)))
      .agg(count(lit(1)).as("cnt"),
        dbl(sum(dec(col("l_quantity")))).as("total_qty"))

  private val q48QtyBandsSql =
    """SELECT COUNT(*) AS cnt,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS total_qty
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |WHERE (c_mktsegment = 'BUILDING' AND l_quantity BETWEEN 0 AND 20
      |        AND l_discount BETWEEN 0.00 AND 0.05)
      |   OR (c_mktsegment = 'MACHINERY' AND l_quantity BETWEEN 10 AND 30
      |        AND l_discount BETWEEN 0.02 AND 0.07)
      |   OR (c_mktsegment = 'AUTOMOBILE' AND l_quantity BETWEEN 20 AND 40
      |        AND l_discount BETWEEN 0.04 AND 0.09)""".stripMargin

  // DS q59 shape: week-over-week revenue ratio, this-year vs last-year
  // self-join on (nation, week). Weeks via ISO weekofyear, constrained
  // to Feb–Nov so the ISO-year boundary never splits a week.
  private val q59WeekOverWeek: Q = (s, dir) => {
    def weekly(yr: Int) = load(s, dir, "lineitem")
      .filter(year(col("l_shipdate")) === yr &&
        month(col("l_shipdate")).between(2, 11))
      .join(load(s, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
      .join(load(s, dir, "nation"), col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name").as(s"nation_$yr"), weekofyear(col("l_shipdate")).as(s"wk_$yr"))
      .agg(sum(dec(col("l_extendedprice"))).as(s"rev_$yr"))
    weekly(1996)
      .join(weekly(1995),
        col("nation_1996") === col("nation_1995") && col("wk_1996") === col("wk_1995"))
      .select(col("nation_1996").as("nation"), col("wk_1996").as("wk"),
        dbl(col("rev_1996")).as("rev_cur"), dbl(col("rev_1995")).as("rev_prev"),
        round(dbl(col("rev_1996")) / dbl(col("rev_1995")), 6).as("wow_ratio"))
      .orderBy(col("nation"), col("wk"))
  }

  private val q59WeekOverWeekSql =
    """WITH weekly AS (
      |  SELECT CAST(EXTRACT(YEAR FROM l_shipdate) AS INTEGER) AS yr, n_name,
      |    CAST(EXTRACT(WEEK FROM l_shipdate) AS INTEGER) AS wk,
      |    SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS rev
      |  FROM lineitem
      |  JOIN supplier ON l_suppkey = s_suppkey
      |  JOIN nation ON s_nationkey = n_nationkey
      |  WHERE EXTRACT(MONTH FROM l_shipdate) BETWEEN 2 AND 11
      |  GROUP BY 1, 2, 3)
      |SELECT cur.n_name AS nation, cur.wk AS wk,
      |  CAST(cur.rev AS DOUBLE) AS rev_cur, CAST(prev.rev AS DOUBLE) AS rev_prev,
      |  round(CAST(cur.rev AS DOUBLE) / CAST(prev.rev AS DOUBLE), 6) AS wow_ratio
      |FROM weekly cur JOIN weekly prev
      |  ON cur.n_name = prev.n_name AND cur.wk = prev.wk
      |WHERE cur.yr = 1996 AND prev.yr = 1995
      |ORDER BY nation, wk""".stripMargin

  // DS q65 shape: below-average entities — per-supplier revenue joined
  // onto its nation's average, keeping suppliers under 90% of the mean
  private val q65BelowAvg: Q = (s, dir) => {
    val rev = load(s, dir, "lineitem")
      .join(load(s, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("s_suppkey").as("sk"), col("s_name"), col("s_nationkey"))
      .agg(sum(dec(col("l_extendedprice"))).as("rev_dec"))
    val natAvg = rev.groupBy(col("s_nationkey").as("nk"))
      .agg((sum(col("rev_dec")).cast("double") / count(lit(1))).as("nat_avg"))
    rev.join(natAvg, col("s_nationkey") === col("nk"))
      .filter(dbl(col("rev_dec")) <= col("nat_avg") * 0.9)
      .join(load(s, dir, "nation"), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_name"), col("n_name"), dbl(col("rev_dec")).as("revenue"),
        round(col("nat_avg"), 6).as("nat_avg"))
      .orderBy(col("s_name"))
  }

  private val q65BelowAvgSql =
    """WITH rev AS (
      |  SELECT s_suppkey, s_name, s_nationkey,
      |    SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS rev_dec
      |  FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
      |  GROUP BY 1, 2, 3),
      |na AS (
      |  SELECT s_nationkey AS nk, CAST(SUM(rev_dec) AS DOUBLE) / COUNT(*) AS nat_avg
      |  FROM rev GROUP BY 1)
      |SELECT s_name, n_name, CAST(rev_dec AS DOUBLE) AS revenue,
      |  round(nat_avg, 6) AS nat_avg
      |FROM rev
      |JOIN na ON s_nationkey = nk
      |JOIN nation ON s_nationkey = n_nationkey
      |WHERE CAST(rev_dec AS DOUBLE) <= nat_avg * 0.9
      |ORDER BY s_name""".stripMargin

  // DS q75 shape: year-over-year *decline* report — channel slices
  // UNION ALL'd at (year, brand) grain, re-aggregated, then the two
  // years self-joined keeping brands whose quantity shrank
  private val q75YoyDecline: Q = (s, dir) => {
    val li = load(s, dir, "lineitem")
      .join(load(s, dir, "part"), col("l_partkey") === col("p_partkey"))
    def chan(cond: Column): DataFrame =
      li.filter(cond)
        .groupBy(year(col("l_shipdate")).as("yr"), col("p_brand"))
        .agg(sum(dec(col("l_quantity"))).as("qty"),
          sum(dec(col("l_extendedprice"))).as("amt"))
    val all = chan(col("l_returnflag") === "N")
      .union(chan(col("l_returnflag") === "A"))
      .union(chan(col("l_returnflag") === "R"))
      .groupBy(col("yr"), col("p_brand"))
      .agg(sum(col("qty")).as("qty"), sum(col("amt")).as("amt"))
    val cur = all.filter(col("yr") === 1996)
      .select(col("p_brand"), col("qty").as("q_cur"), col("amt").as("a_cur"))
    val prev = all.filter(col("yr") === 1995)
      .select(col("p_brand").as("pb"), col("qty").as("q_prev"), col("amt").as("a_prev"))
    cur.join(prev, col("p_brand") === col("pb"))
      .filter(col("q_cur") < col("q_prev"))
      .select(col("p_brand"), dbl(col("q_prev")).as("q_prev"), dbl(col("q_cur")).as("q_cur"),
        dbl(col("q_cur") - col("q_prev")).as("qty_delta"),
        dbl(col("a_cur") - col("a_prev")).as("amt_delta"))
      .orderBy(col("qty_delta"), col("p_brand"))
      .limit(100)
  }

  private val q75YoyDeclineSql =
    """WITH chan AS (
      |  SELECT CAST(EXTRACT(YEAR FROM l_shipdate) AS INTEGER) AS yr, p_brand,
      |    SUM(CAST(l_quantity AS DECIMAL(12,2))) AS qty,
      |    SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS amt
      |  FROM lineitem JOIN part ON l_partkey = p_partkey
      |  WHERE l_returnflag = 'N' GROUP BY 1, 2
      |  UNION ALL
      |  SELECT CAST(EXTRACT(YEAR FROM l_shipdate) AS INTEGER), p_brand,
      |    SUM(CAST(l_quantity AS DECIMAL(12,2))),
      |    SUM(CAST(l_extendedprice AS DECIMAL(12,2)))
      |  FROM lineitem JOIN part ON l_partkey = p_partkey
      |  WHERE l_returnflag = 'A' GROUP BY 1, 2
      |  UNION ALL
      |  SELECT CAST(EXTRACT(YEAR FROM l_shipdate) AS INTEGER), p_brand,
      |    SUM(CAST(l_quantity AS DECIMAL(12,2))),
      |    SUM(CAST(l_extendedprice AS DECIMAL(12,2)))
      |  FROM lineitem JOIN part ON l_partkey = p_partkey
      |  WHERE l_returnflag = 'R' GROUP BY 1, 2),
      |agg AS (
      |  SELECT yr, p_brand, SUM(qty) AS qty, SUM(amt) AS amt
      |  FROM chan GROUP BY 1, 2)
      |SELECT cur.p_brand AS p_brand,
      |  CAST(prev.qty AS DOUBLE) AS q_prev, CAST(cur.qty AS DOUBLE) AS q_cur,
      |  CAST(cur.qty - prev.qty AS DOUBLE) AS qty_delta,
      |  CAST(cur.amt - prev.amt AS DOUBLE) AS amt_delta
      |FROM agg cur JOIN agg prev ON cur.p_brand = prev.p_brand
      |WHERE cur.yr = 1996 AND prev.yr = 1995 AND cur.qty < prev.qty
      |ORDER BY qty_delta, p_brand
      |LIMIT 100""".stripMargin

  // DS q89 shape: monthly sales vs the (type, brand, year) rolling mean,
  // keeping months that deviate >10% from their group's average
  private val q89RollingDeviation: Q = (s, dir) => {
    val monthly = load(s, dir, "lineitem")
      .join(load(s, dir, "part"), col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_type"), col("p_brand"), year(col("l_shipdate")).as("d_year"),
        month(col("l_shipdate")).as("d_moy"))
      .agg(sum(dec(col("l_extendedprice"))).as("sales_dec"))
    val w = Window.partitionBy(col("p_type"), col("p_brand"), col("d_year"))
    monthly.select(col("p_type"), col("p_brand"), col("d_year"), col("d_moy"),
        dbl(col("sales_dec")).as("sum_sales"),
        (sum(col("sales_dec")).over(w).cast("double") /
          count(lit(1)).over(w)).as("avg_monthly_sales"))
      .filter(abs(col("sum_sales") - col("avg_monthly_sales")) /
        col("avg_monthly_sales") > 0.1)
      .withColumn("dev", col("sum_sales") - col("avg_monthly_sales"))
      .orderBy(col("dev").asc, col("p_type"), col("p_brand"),
        col("d_year"), col("d_moy"))
      .limit(100)
      .select(col("p_type"), col("p_brand"), col("d_year"), col("d_moy"),
        col("sum_sales"), round(col("avg_monthly_sales"), 6).as("avg_monthly_sales"))
  }

  private val q89RollingDeviationSql =
    """SELECT p_type, p_brand, d_year, d_moy, sum_sales,
      |  round(avg_monthly_sales, 6) AS avg_monthly_sales
      |FROM (
      |  SELECT *, sum_sales - avg_monthly_sales AS dev
      |  FROM (
      |    SELECT p_type, p_brand, d_year, d_moy,
      |      CAST(sales_dec AS DOUBLE) AS sum_sales,
      |      CAST(SUM(sales_dec) OVER (PARTITION BY p_type, p_brand, d_year) AS DOUBLE) /
      |        COUNT(*) OVER (PARTITION BY p_type, p_brand, d_year) AS avg_monthly_sales
      |    FROM (
      |      SELECT p_type, p_brand,
      |        CAST(EXTRACT(YEAR FROM l_shipdate) AS INTEGER) AS d_year,
      |        CAST(EXTRACT(MONTH FROM l_shipdate) AS INTEGER) AS d_moy,
      |        SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS sales_dec
      |      FROM lineitem JOIN part ON l_partkey = p_partkey
      |      GROUP BY 1, 2, 3, 4) m) w
      |  WHERE abs(sum_sales - avg_monthly_sales) / avg_monthly_sales > 0.1
      |  ORDER BY dev ASC, p_type, p_brand, d_year, d_moy
      |  LIMIT 100) t""".stripMargin

  // DS q97 shape: channel-overlap counts — FULL OUTER join of two
  // distinct-customer sets, one output row of only-A / only-B / both
  private val q97ChannelOverlap: Q = (s, dir) => {
    val a = load(s, dir, "orders").filter(year(col("o_orderdate")) === 1995)
      .select(col("o_custkey").as("ka")).distinct()
    val b = load(s, dir, "orders").filter(year(col("o_orderdate")) === 1996)
      .select(col("o_custkey").as("kb")).distinct()
    a.join(b, col("ka") === col("kb"), "full_outer")
      .agg(
        count(when(col("ka").isNotNull && col("kb").isNull, 1)).as("only_1995"),
        count(when(col("ka").isNull && col("kb").isNotNull, 1)).as("only_1996"),
        count(when(col("ka").isNotNull && col("kb").isNotNull, 1)).as("both_years"))
  }

  private val q97ChannelOverlapSql =
    """WITH a AS (SELECT DISTINCT o_custkey AS ka FROM orders
      |           WHERE EXTRACT(YEAR FROM o_orderdate) = 1995),
      |b AS (SELECT DISTINCT o_custkey AS kb FROM orders
      |      WHERE EXTRACT(YEAR FROM o_orderdate) = 1996)
      |SELECT
      |  COUNT(CASE WHEN ka IS NOT NULL AND kb IS NULL THEN 1 END) AS only_1995,
      |  COUNT(CASE WHEN ka IS NULL AND kb IS NOT NULL THEN 1 END) AS only_1996,
      |  COUNT(CASE WHEN ka IS NOT NULL AND kb IS NOT NULL THEN 1 END) AS both_years
      |FROM a FULL OUTER JOIN b ON ka = kb""".stripMargin

  // DS q90 shape: am/pm activity ratio — two disjoint hour-band counts
  // over the events stream collapsed to a single ratio row
  private val q90AmPmRatio: Q = (s, dir) => {
    val ev = load(s, dir, "events")
    val am = ev.filter(hour(col("ts")).between(6, 11) && col("value") > 10)
      .agg(count(lit(1)).as("amc"))
    val pm = ev.filter(hour(col("ts")).between(18, 23) && col("value") > 10)
      .agg(count(lit(1)).as("pmc"))
    am.crossJoin(pm)
      .select(col("amc").as("am_count"), col("pmc").as("pm_count"),
        round(col("amc").cast("double") / col("pmc").cast("double"), 6).as("am_pm_ratio"))
  }

  private val q90AmPmRatioSql =
    """SELECT
      |  (SELECT COUNT(*) FROM events
      |   WHERE EXTRACT(HOUR FROM ts) BETWEEN 6 AND 11 AND value > 10) AS am_count,
      |  (SELECT COUNT(*) FROM events
      |   WHERE EXTRACT(HOUR FROM ts) BETWEEN 18 AND 23 AND value > 10) AS pm_count,
      |  round(CAST((SELECT COUNT(*) FROM events
      |   WHERE EXTRACT(HOUR FROM ts) BETWEEN 6 AND 11 AND value > 10) AS DOUBLE) /
      |        CAST((SELECT COUNT(*) FROM events
      |   WHERE EXTRACT(HOUR FROM ts) BETWEEN 18 AND 23 AND value > 10) AS DOUBLE), 6)
      |    AS am_pm_ratio""".stripMargin

  // DS q1 shape: entities above 1.2× their group's average on a RETURNS
  // metric, via a correlated scalar subquery over an aggregated CTE
  private val q1ReturnsAboveAvg: Q = (s, dir) => {
    val ret = load(s, dir, "lineitem").filter(col("l_returnflag") === "R")
      .join(load(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_custkey"), year(col("o_orderdate")).as("yr"))
      .agg(sum(dec(col("l_extendedprice"))).as("ret_dec"))
    val avgPerYr = ret.groupBy(col("yr").as("ayr"))
      .agg((sum(col("ret_dec")).cast("double") / count(lit(1))).as("yr_avg"))
    ret.join(avgPerYr, col("yr") === col("ayr"))
      .filter(dbl(col("ret_dec")) > col("yr_avg") * 1.2)
      .select(col("o_custkey"), col("yr"), dbl(col("ret_dec")).as("returned"),
        round(col("yr_avg"), 6).as("yr_avg"))
      .orderBy(col("yr"), col("o_custkey"))
      .limit(100)
  }

  private val q1ReturnsAboveAvgSql =
    """WITH ret AS (
      |  SELECT o_custkey, CAST(EXTRACT(YEAR FROM o_orderdate) AS INTEGER) AS yr,
      |    SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS ret_dec
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |  WHERE l_returnflag = 'R' GROUP BY 1, 2),
      |ya AS (SELECT yr AS ayr, CAST(SUM(ret_dec) AS DOUBLE) / COUNT(*) AS yr_avg
      |       FROM ret GROUP BY yr)
      |SELECT o_custkey, yr, CAST(ret_dec AS DOUBLE) AS returned,
      |  round(yr_avg, 6) AS yr_avg
      |FROM ret JOIN ya ON yr = ayr
      |WHERE CAST(ret_dec AS DOUBLE) > yr_avg * 1.2
      |ORDER BY yr, o_custkey
      |LIMIT 100""".stripMargin

  // DS q39 shape: mean and coefficient-of-variation per (part, month),
  // keeping only high-variance series — the stddev-filter grammar
  private val q39VarianceFilter: Q = (s, dir) =>
    load(s, dir, "lineitem")
      .groupBy(col("l_partkey"), month(col("l_shipdate")).as("moy"))
      .agg(count(lit(1)).as("n"),
        round(avg(dbl(dec(col("l_quantity")))), 6).as("mean_qty"),
        round(stddev_samp(dbl(dec(col("l_quantity")))), 6).as("sd_qty"))
      .filter(col("n") >= 5 && col("sd_qty") / col("mean_qty") > 1.0)
      .orderBy(col("l_partkey"), col("moy"))
      .limit(100)

  private val q39VarianceFilterSql =
    """SELECT l_partkey, CAST(EXTRACT(MONTH FROM l_shipdate) AS INTEGER) AS moy,
      |  COUNT(*) AS n,
      |  round(AVG(CAST(CAST(l_quantity AS DECIMAL(12,2)) AS DOUBLE)), 6) AS mean_qty,
      |  round(STDDEV_SAMP(CAST(CAST(l_quantity AS DECIMAL(12,2)) AS DOUBLE)), 6) AS sd_qty
      |FROM lineitem
      |GROUP BY 1, 2
      |HAVING COUNT(*) >= 5
      |   AND round(STDDEV_SAMP(CAST(CAST(l_quantity AS DECIMAL(12,2)) AS DOUBLE)), 6) /
      |       round(AVG(CAST(CAST(l_quantity AS DECIMAL(12,2)) AS DOUBLE)), 6) > 1.0
      |ORDER BY l_partkey, moy
      |LIMIT 100""".stripMargin

  // DS q47 shape: the lag/lead sandwich — monthly sales with BOTH
  // neighbors in one window pass, filtered on deviation from the yearly
  // average (two window specs over one aggregate)
  private val q47LagLeadSandwich: Q = (s, dir) => {
    val monthly = load(s, dir, "lineitem")
      .join(load(s, dir, "part"), col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"), year(col("l_shipdate")).as("yr"),
        month(col("l_shipdate")).as("moy"))
      .agg(sum(dec(col("l_extendedprice"))).as("sales_dec"))
    val wSeq = Window.partitionBy(col("p_brand")).orderBy(col("yr"), col("moy"))
    val wYear = Window.partitionBy(col("p_brand"), col("yr"))
    monthly.select(col("p_brand"), col("yr"), col("moy"),
        dbl(col("sales_dec")).as("sum_sales"),
        (sum(col("sales_dec")).over(wYear).cast("double") /
          count(lit(1)).over(wYear)).as("avg_monthly"),
        lag(dbl(col("sales_dec")), 1).over(wSeq).as("psum"),
        lead(dbl(col("sales_dec")), 1).over(wSeq).as("nsum"))
      .filter(col("yr") === 1997 && col("psum").isNotNull && col("nsum").isNotNull &&
        abs(col("sum_sales") - col("avg_monthly")) / col("avg_monthly") > 0.1)
      .select(col("p_brand"), col("yr"), col("moy"), col("sum_sales"),
        round(col("avg_monthly"), 6).as("avg_monthly"), col("psum"), col("nsum"))
      .orderBy(col("p_brand"), col("moy"))
      .limit(100)
  }

  private val q47LagLeadSandwichSql =
    """SELECT p_brand, yr, moy, sum_sales, round(avg_monthly, 6) AS avg_monthly,
      |  psum, nsum
      |FROM (
      |  SELECT p_brand, yr, moy,
      |    CAST(sales_dec AS DOUBLE) AS sum_sales,
      |    CAST(SUM(sales_dec) OVER (PARTITION BY p_brand, yr) AS DOUBLE) /
      |      COUNT(*) OVER (PARTITION BY p_brand, yr) AS avg_monthly,
      |    LAG(CAST(sales_dec AS DOUBLE), 1) OVER w AS psum,
      |    LEAD(CAST(sales_dec AS DOUBLE), 1) OVER w AS nsum
      |  FROM (
      |    SELECT p_brand, CAST(EXTRACT(YEAR FROM l_shipdate) AS INTEGER) AS yr,
      |      CAST(EXTRACT(MONTH FROM l_shipdate) AS INTEGER) AS moy,
      |      SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS sales_dec
      |    FROM lineitem JOIN part ON l_partkey = p_partkey
      |    GROUP BY 1, 2, 3) m
      |  WINDOW w AS (PARTITION BY p_brand ORDER BY yr, moy)) t
      |WHERE yr = 1997 AND psum IS NOT NULL AND nsum IS NOT NULL
      |  AND abs(sum_sales - avg_monthly) / avg_monthly > 0.1
      |ORDER BY p_brand, moy
      |LIMIT 100""".stripMargin

  // DS q51 shape: two cumulative series compared row-by-row — per-brand
  // running revenue in two channels FULL OUTER joined on (brand, month),
  // keeping rows where one running total overtakes the other
  private val q51CumulativeCompare: Q = (s, dir) => {
    def cum(flag: String, rev: String, cum: String) = {
      val m = load(s, dir, "lineitem").filter(col("l_returnflag") === flag)
        .join(load(s, dir, "part"), col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand").as(s"brand_$flag"), month(col("l_shipdate")).as(s"moy_$flag"))
        .agg(sum(dec(col("l_extendedprice"))).as(rev))
      val w = Window.partitionBy(col(s"brand_$flag")).orderBy(col(s"moy_$flag"))
      m.select(col(s"brand_$flag"), col(s"moy_$flag"),
        sum(col(rev)).over(w).as(cum))
    }
    val a = cum("N", "rev_n", "cum_n")
    val r = cum("R", "rev_r", "cum_r")
    a.join(r, col("brand_N") === col("brand_R") && col("moy_N") === col("moy_R"), "full_outer")
      .select(coalesce(col("brand_N"), col("brand_R")).as("brand"),
        coalesce(col("moy_N"), col("moy_R")).as("moy"),
        dbl(col("cum_n")).as("cum_n"), dbl(col("cum_r")).as("cum_r"))
      .filter(col("cum_r").isNull || (col("cum_n").isNotNull && col("cum_n") > col("cum_r")))
      .orderBy(col("brand"), col("moy"))
      .limit(100)
  }

  private val q51CumulativeCompareSql =
    """WITH a AS (
      |  SELECT p_brand AS brand_n, CAST(EXTRACT(MONTH FROM l_shipdate) AS INTEGER) AS moy_n,
      |    SUM(SUM(CAST(l_extendedprice AS DECIMAL(12,2))))
      |      OVER (PARTITION BY p_brand ORDER BY CAST(EXTRACT(MONTH FROM l_shipdate) AS INTEGER)) AS cum_n
      |  FROM lineitem JOIN part ON l_partkey = p_partkey
      |  WHERE l_returnflag = 'N' GROUP BY 1, 2),
      |r AS (
      |  SELECT p_brand AS brand_r, CAST(EXTRACT(MONTH FROM l_shipdate) AS INTEGER) AS moy_r,
      |    SUM(SUM(CAST(l_extendedprice AS DECIMAL(12,2))))
      |      OVER (PARTITION BY p_brand ORDER BY CAST(EXTRACT(MONTH FROM l_shipdate) AS INTEGER)) AS cum_r
      |  FROM lineitem JOIN part ON l_partkey = p_partkey
      |  WHERE l_returnflag = 'R' GROUP BY 1, 2)
      |SELECT COALESCE(brand_n, brand_r) AS brand, COALESCE(moy_n, moy_r) AS moy,
      |  CAST(cum_n AS DOUBLE) AS cum_n, CAST(cum_r AS DOUBLE) AS cum_r
      |FROM a FULL OUTER JOIN r ON brand_n = brand_r AND moy_n = moy_r
      |WHERE cum_r IS NULL OR (cum_n IS NOT NULL AND cum_n > cum_r)
      |ORDER BY brand, moy
      |LIMIT 100""".stripMargin

  // DS q99 shape: the duration-bucket matrix — shipping delay folded
  // into CASE buckets, one row per (priority), one count per bucket
  private val q99DurationBuckets: Q = (s, dir) => {
    val delay = datediff(to_date(col("l_shipdate")), to_date(col("o_orderdate")))
    load(s, dir, "lineitem")
      .join(load(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(
        count(when(delay <= 30, 1)).as("d30"),
        count(when(delay > 30 && delay <= 60, 1)).as("d60"),
        count(when(delay > 60 && delay <= 90, 1)).as("d90"),
        count(when(delay > 90 && delay <= 120, 1)).as("d120"),
        count(when(delay > 120, 1)).as("dmore"))
      .orderBy(col("o_orderpriority"))
  }

  private val q99DurationBucketsSql =
    """SELECT o_orderpriority,
      |  COUNT(CASE WHEN dd <= 30 THEN 1 END) AS d30,
      |  COUNT(CASE WHEN dd > 30 AND dd <= 60 THEN 1 END) AS d60,
      |  COUNT(CASE WHEN dd > 60 AND dd <= 90 THEN 1 END) AS d90,
      |  COUNT(CASE WHEN dd > 90 AND dd <= 120 THEN 1 END) AS d120,
      |  COUNT(CASE WHEN dd > 120 THEN 1 END) AS dmore
      |FROM (
      |  SELECT o_orderpriority,
      |    date_diff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE)) AS dd
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey) t
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  // DS q31 shape: quarter-over-quarter share growth — two consecutive
  // quarters' revenue per nation, joined, comparing growth ratios
  // against the all-nation ratio of the same quarters
  private val q31ShareGrowth: Q = (s, dir) => {
    val base = load(s, dir, "lineitem").filter(year(col("l_shipdate")) === 1997)
      .join(load(s, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
      .join(load(s, dir, "nation"), col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"), quarter(col("l_shipdate")).as("qtr"))
      .agg(sum(dec(col("l_extendedprice"))).as("rev_dec"))
    val q1 = base.filter(col("qtr") === 1)
      .select(col("n_name").as("n1"), col("rev_dec").as("rev_q1"))
    val q2 = base.filter(col("qtr") === 2)
      .select(col("n_name").as("n2"), col("rev_dec").as("rev_q2"))
    val joined = q1.join(q2, col("n1") === col("n2"))
    val tot = joined.agg(
      sum(col("rev_q1")).as("t1"), sum(col("rev_q2")).as("t2"))
    joined.crossJoin(tot)
      .filter((dbl(col("rev_q2")) / dbl(col("rev_q1"))) >
        (dbl(col("t2")) / dbl(col("t1"))))
      .select(col("n1").as("nation"),
        dbl(col("rev_q1")).as("rev_q1"), dbl(col("rev_q2")).as("rev_q2"),
        round(dbl(col("rev_q2")) / dbl(col("rev_q1")), 6).as("growth"))
      .orderBy(col("nation"))
  }

  private val q31ShareGrowthSql =
    """WITH base AS (
      |  SELECT n_name, CAST(EXTRACT(QUARTER FROM l_shipdate) AS INTEGER) AS qtr,
      |    SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS rev_dec
      |  FROM lineitem
      |  JOIN supplier ON l_suppkey = s_suppkey
      |  JOIN nation ON s_nationkey = n_nationkey
      |  WHERE EXTRACT(YEAR FROM l_shipdate) = 1997
      |  GROUP BY 1, 2),
      |j AS (
      |  SELECT q1.n_name AS nation, q1.rev_dec AS rev_q1, q2.rev_dec AS rev_q2
      |  FROM base q1 JOIN base q2 ON q1.n_name = q2.n_name
      |  WHERE q1.qtr = 1 AND q2.qtr = 2),
      |tot AS (SELECT SUM(rev_q1) AS t1, SUM(rev_q2) AS t2 FROM j)
      |SELECT nation, CAST(rev_q1 AS DOUBLE) AS rev_q1, CAST(rev_q2 AS DOUBLE) AS rev_q2,
      |  round(CAST(rev_q2 AS DOUBLE) / CAST(rev_q1 AS DOUBLE), 6) AS growth
      |FROM j, tot
      |WHERE CAST(rev_q2 AS DOUBLE) / CAST(rev_q1 AS DOUBLE) >
      |      CAST(t2 AS DOUBLE) / CAST(t1 AS DOUBLE)
      |ORDER BY nation""".stripMargin

  private val rev = "CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST('1.00' AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))"

  // DS q9 shape: scalar subqueries inside CASE branches in the SELECT
  // list — bucketed stats where the reported metric per bucket depends
  // on a count threshold over the same bucket. Exercises Spark's
  // uncorrelated ScalarSubquery planning (each subquery becomes a
  // broadcast-able single-row plan; the three buckets share one scan
  // per subquery, 9 subqueries total, all subsecond at any SF because
  // each is a pushdown-filtered aggregate).
  private def q9CaseText(table: String): String = {
    def bucket(lo: Int, hi: Int, floor: Int, alias: String) =
      s"""  CASE WHEN (SELECT count(*) FROM $table WHERE l_quantity BETWEEN $lo AND $hi) > $floor
         |       THEN (SELECT round(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / count(*), 6)
         |             FROM $table WHERE l_quantity BETWEEN $lo AND $hi)
         |       ELSE (SELECT round(CAST(sum(CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) / count(*), 6)
         |             FROM $table WHERE l_quantity BETWEEN $lo AND $hi)
         |  END AS $alias""".stripMargin
    Seq(bucket(1, 20, 20000, "bucket1"), bucket(21, 30, 20000, "bucket2"),
      bucket(31, 50, 20000, "bucket3")).mkString("SELECT\n", ",\n", "")
  }

  private val q9CaseBuckets: Q = (s, dir) => {
    load(s, dir, "lineitem").createOrReplaceTempView("li_q9")
    s.sql(q9CaseText("li_q9"))
  }

  private val q9CaseBucketsSql = q9CaseText("lineitem")

  // DS q23 shape: "frequent items bought by best customers" — a
  // HAVING-floored frequent-item set, a best-customer set defined
  // against a scalar MAX subquery, and a final fact aggregation
  // semi-joined to both. Both semi joins broadcast (the derived sets
  // are aggregates, far smaller than the fact), so the final pass is
  // one scan + one shuffle-free reduce at any SF.
  private val q23FrequentBest: Q = (s, dir) => {
    val li = load(s, dir, "lineitem")
    val ord = load(s, dir, "orders")
    val freq = li
      .join(ord.filter(year(col("o_orderdate")) === 1996), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_partkey")).agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") > 4).select(col("l_partkey"))
    val spend = ord.groupBy(col("o_custkey"))
      .agg(dbl(sum(dec(col("o_totalprice")))).as("spend"))
    val best = spend
      .crossJoin(broadcast(spend.agg(max(col("spend")).as("mx"))))
      .filter(col("spend") > col("mx") * 0.5)
      .select(col("o_custkey"))
    li.join(ord.filter(year(col("o_orderdate")) === 1997)
        .select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .join(freq, Seq("l_partkey"), "left_semi")
      .join(best, Seq("o_custkey"), "left_semi")
      .agg(dbl(sum(revenue(col("l_extendedprice"), col("l_discount")))).as("total_rev"),
        count(lit(1)).as("n_items"))
  }

  private val q23FrequentBestSql =
    s"""WITH freq AS (
      |  SELECT l_partkey FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |  WHERE EXTRACT(YEAR FROM o_orderdate) = 1996
      |  GROUP BY l_partkey HAVING count(*) > 4),
      |spend AS (
      |  SELECT o_custkey, CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS spend
      |  FROM orders GROUP BY o_custkey),
      |best AS (
      |  SELECT o_custkey FROM spend WHERE spend > 0.5 * (SELECT max(spend) FROM spend))
      |SELECT CAST(SUM($rev) AS DOUBLE) AS total_rev, count(*) AS n_items
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |WHERE EXTRACT(YEAR FROM o_orderdate) = 1997
      |  AND l_partkey IN (SELECT l_partkey FROM freq)
      |  AND o_custkey IN (SELECT o_custkey FROM best)""".stripMargin

  // DS q38 shape: INTERSECT of per-channel customer sets (customers
  // active in ALL of three consecutive years), counted. Spark plans
  // INTERSECT as a left-semi chain over distinct sets — each leg is one
  // hash shuffle on the (already aggregated, small) key set.
  private def custOfYear(s: SparkSession, dir: String, y: Int): DataFrame =
    load(s, dir, "orders").filter(year(col("o_orderdate")) === y)
      .select(col("o_custkey")).distinct()

  private val q38IntersectCustomers: Q = (s, dir) =>
    custOfYear(s, dir, 1996)
      .intersect(custOfYear(s, dir, 1997))
      .intersect(custOfYear(s, dir, 1998))
      .agg(count(lit(1)).as("hh_count"))

  private val q38IntersectCustomersSql =
    """SELECT count(*) AS hh_count FROM (
      |  SELECT DISTINCT o_custkey FROM orders WHERE EXTRACT(YEAR FROM o_orderdate) = 1996
      |  INTERSECT
      |  SELECT DISTINCT o_custkey FROM orders WHERE EXTRACT(YEAR FROM o_orderdate) = 1997
      |  INTERSECT
      |  SELECT DISTINCT o_custkey FROM orders WHERE EXTRACT(YEAR FROM o_orderdate) = 1998)""".stripMargin

  // DS q87 shape: the EXCEPT twin of q38 — customers active in the
  // first year but in NEITHER later year (left-anti chain).
  private val q87ExceptCustomers: Q = (s, dir) =>
    custOfYear(s, dir, 1996)
      .except(custOfYear(s, dir, 1997))
      .except(custOfYear(s, dir, 1998))
      .agg(count(lit(1)).as("cnt"))

  private val q87ExceptCustomersSql =
    """SELECT count(*) AS cnt FROM (
      |  SELECT DISTINCT o_custkey FROM orders WHERE EXTRACT(YEAR FROM o_orderdate) = 1996
      |  EXCEPT
      |  SELECT DISTINCT o_custkey FROM orders WHERE EXTRACT(YEAR FROM o_orderdate) = 1997
      |  EXCEPT
      |  SELECT DISTINCT o_custkey FROM orders WHERE EXTRACT(YEAR FROM o_orderdate) = 1998)""".stripMargin

  // DS q41 shape: correlated COUNT subquery with an OR-heavy
  // multi-attribute predicate — "products whose brand also carries a
  // part matching any of several attribute combinations". Catalyst
  // decorrelates the count into an aggregate-join on the equality key.
  private def q41Text(table: String): String =
    s"""SELECT DISTINCT p_name FROM $table p1
      |WHERE p1.p_size BETWEEN 1 AND 15
      |  AND (SELECT count(*) FROM $table p2 WHERE p2.p_brand = p1.p_brand
      |       AND ((p2.p_type = 'PROMO'    AND p2.p_size BETWEEN 5 AND 10)
      |         OR (p2.p_type = 'STANDARD' AND p2.p_size BETWEEN 20 AND 30))) > 0
      |ORDER BY p_name LIMIT 100""".stripMargin

  private val q41ExistsOr: Q = (s, dir) => {
    load(s, dir, "part").createOrReplaceTempView("part_q41")
    s.sql(q41Text("part_q41"))
  }

  private val q41ExistsOrSql = q41Text("part")

  // DS q44 shape: best and worst performers joined by rank — two
  // opposite-direction rankings over the same per-item aggregate,
  // equi-joined on the rank position. The ranked input is one row per
  // part (already aggregated), so the single-partition window is over
  // |parts| rows, not the fact table; row_number with a key tiebreak
  // keeps both engines' rankings identical.
  private val q44BestWorst: Q = (s, dir) => {
    val perf = load(s, dir, "lineitem")
      .groupBy(col("l_partkey"))
      .agg((dbl(sum(revenue(col("l_extendedprice"), col("l_discount")))) / count(lit(1))).as("avg_rev"))
    val part = load(s, dir, "part")
    val best = perf.select(
      row_number().over(Window.orderBy(col("avg_rev").desc, col("l_partkey"))).as("rnk"),
      col("l_partkey").as("best_key")).filter(col("rnk") <= 10)
    val worst = perf.select(
      row_number().over(Window.orderBy(col("avg_rev").asc, col("l_partkey"))).as("rnk"),
      col("l_partkey").as("worst_key")).filter(col("rnk") <= 10)
    best.join(worst, "rnk")
      .join(part.select(col("p_partkey").as("best_key"), col("p_name").as("best_name")), "best_key")
      .join(part.select(col("p_partkey").as("worst_key"), col("p_name").as("worst_name")), "worst_key")
      .select(col("rnk"), col("best_name"), col("worst_name"))
      .orderBy(col("rnk"))
  }

  private val q44BestWorstSql =
    s"""WITH perf AS (
      |  SELECT l_partkey, CAST(SUM($rev) AS DOUBLE) / count(*) AS avg_rev
      |  FROM lineitem GROUP BY l_partkey),
      |best AS (
      |  SELECT * FROM (SELECT CAST(row_number() OVER (ORDER BY avg_rev DESC, l_partkey) AS INTEGER) AS rnk,
      |    l_partkey AS best_key FROM perf) WHERE rnk <= 10),
      |worst AS (
      |  SELECT * FROM (SELECT CAST(row_number() OVER (ORDER BY avg_rev ASC, l_partkey) AS INTEGER) AS rnk,
      |    l_partkey AS worst_key FROM perf) WHERE rnk <= 10)
      |SELECT rnk, pb.p_name AS best_name, pw.p_name AS worst_name
      |FROM best JOIN worst USING (rnk)
      |JOIN part pb ON best_key = pb.p_partkey
      |JOIN part pw ON worst_key = pw.p_partkey
      |ORDER BY rnk""".stripMargin

  // DS q49 shape: per-channel return-ratio top-10, UNION ALL'd with a
  // channel tag — ratio ranked per channel partition; returns coalesced
  // to exact zero so rank order is engine-independent. The window
  // partitions by channel over per-part aggregates (small), and each
  // channel leg shares the one fact scan shape.
  private val q49ReturnRatioUnion: Q = (s, dir) => {
    val zero = lit(new java.math.BigDecimal("0.00")).cast(org.apache.spark.sql.types.DecimalType(12, 2))
    val base = load(s, dir, "lineitem")
      .join(load(s, dir, "orders")
          .filter(col("o_orderpriority").isin("1-URGENT", "2-HIGH", "3-MEDIUM")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority").as("channel"), col("l_partkey"))
      .agg(
        dbl(sum(when(col("l_returnflag") === "R", dec(col("l_quantity"))).otherwise(zero))).as("ret_qty"),
        dbl(sum(dec(col("l_quantity")))).as("tot_qty"))
      .withColumn("ratio", round(col("ret_qty") / col("tot_qty"), 6))
    base.select(col("channel"), col("l_partkey").as("item"), col("ratio"),
        row_number().over(Window.partitionBy(col("channel"))
          .orderBy(col("ratio").desc, col("l_partkey"))).as("rnk"))
      .filter(col("rnk") <= 10)
      .orderBy(col("channel"), col("rnk"))
  }

  private val q49ReturnRatioUnionSql =
    """WITH base AS (
      |  SELECT o_orderpriority AS channel, l_partkey AS item,
      |    round(CAST(SUM(CASE WHEN l_returnflag = 'R' THEN CAST(l_quantity AS DECIMAL(12,2))
      |                        ELSE CAST('0.00' AS DECIMAL(12,2)) END) AS DOUBLE) /
      |          CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE), 6) AS ratio
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |  WHERE o_orderpriority IN ('1-URGENT', '2-HIGH', '3-MEDIUM')
      |  GROUP BY 1, 2)
      |SELECT channel, item, ratio, rnk FROM (
      |  SELECT channel, item, ratio,
      |    CAST(row_number() OVER (PARTITION BY channel ORDER BY ratio DESC, item) AS INTEGER) AS rnk
      |  FROM base)
      |WHERE rnk <= 10 ORDER BY channel, rnk""".stripMargin

  // DS q58 shape: three per-channel revenue CTEs equi-joined on the
  // item key, keeping items whose revenue is balanced (each channel
  // within ±10% of the three-channel mean). Each leg is a broadcast
  // star join + hash agg; the final three-way join runs over per-brand
  // aggregates (tiny), so the balance filter costs nothing at scale.
  private val q58ChannelBalance: Q = (s, dir) => {
    def chanRev(p: String, alias: String): DataFrame =
      load(s, dir, "lineitem")
        .join(load(s, dir, "orders").filter(col("o_orderpriority") === p),
          col("l_orderkey") === col("o_orderkey"))
        .join(load(s, dir, "part"), col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"))
        .agg(dbl(sum(revenue(col("l_extendedprice"), col("l_discount")))).as(alias))
    val joined = chanRev("1-URGENT", "rev1")
      .join(chanRev("2-HIGH", "rev2"), "p_brand")
      .join(chanRev("3-MEDIUM", "rev3"), "p_brand")
      .withColumn("avg_rev", (col("rev1") + col("rev2") + col("rev3")) / 3)
    joined
      .filter(col("rev1").between(col("avg_rev") * 0.9, col("avg_rev") * 1.1) &&
        col("rev2").between(col("avg_rev") * 0.9, col("avg_rev") * 1.1) &&
        col("rev3").between(col("avg_rev") * 0.9, col("avg_rev") * 1.1))
      .select(col("p_brand"), round(col("rev1"), 2).as("rev1"),
        round(col("rev2"), 2).as("rev2"), round(col("rev3"), 2).as("rev3"))
      .orderBy(col("p_brand"))
  }

  private val q58ChannelBalanceSql =
    s"""WITH chan AS (
      |  SELECT o_orderpriority AS pri, p_brand, CAST(SUM($rev) AS DOUBLE) AS r
      |  FROM lineitem
      |  JOIN orders ON l_orderkey = o_orderkey
      |  JOIN part ON l_partkey = p_partkey
      |  WHERE o_orderpriority IN ('1-URGENT', '2-HIGH', '3-MEDIUM')
      |  GROUP BY 1, 2),
      |j AS (
      |  SELECT c1.p_brand, c1.r AS rev1, c2.r AS rev2, c3.r AS rev3,
      |    (c1.r + c2.r + c3.r) / 3 AS avg_rev
      |  FROM chan c1 JOIN chan c2 ON c1.p_brand = c2.p_brand
      |  JOIN chan c3 ON c1.p_brand = c3.p_brand
      |  WHERE c1.pri = '1-URGENT' AND c2.pri = '2-HIGH' AND c3.pri = '3-MEDIUM')
      |SELECT p_brand, round(rev1, 2) AS rev1, round(rev2, 2) AS rev2, round(rev3, 2) AS rev3
      |FROM j
      |WHERE rev1 BETWEEN avg_rev * 0.9 AND avg_rev * 1.1
      |  AND rev2 BETWEEN avg_rev * 0.9 AND avg_rev * 1.1
      |  AND rev3 BETWEEN avg_rev * 0.9 AND avg_rev * 1.1
      |ORDER BY p_brand""".stripMargin

  // DS q4/q11/q74 shape: per-customer year totals in two "channels"
  // (order headers vs lineitem net revenue), keeping customers whose
  // lineitem-channel growth outpaces the header-channel growth — the
  // four-way year_total self-join grammar (tpcds-queries/q4.sql)
  private val q4YearlyGrowth: Q = (s, dir) => {
    val orders = load(s, dir, "orders")
    def headTotal(yr: Int) = orders.filter(year(col("o_orderdate")) === yr)
      .groupBy(col("o_custkey").as(s"hc_$yr"))
      .agg(dbl(sum(dec(col("o_totalprice")))).as(s"head_$yr"))
    def lineTotal(yr: Int) = load(s, dir, "lineitem")
      .join(orders.filter(year(col("o_orderdate")) === yr),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_custkey").as(s"lc_$yr"))
      .agg(dbl(sum(revenue(col("l_extendedprice"), col("l_discount")))).as(s"line_$yr"))
    headTotal(1995).join(headTotal(1996), col("hc_1995") === col("hc_1996"))
      .join(lineTotal(1995), col("hc_1995") === col("lc_1995"))
      .join(lineTotal(1996), col("hc_1995") === col("lc_1996"))
      .filter(col("head_1995") > 0 && col("line_1995") > 0 &&
        col("line_1996") / col("line_1995") > col("head_1996") / col("head_1995"))
      .join(load(s, dir, "customer"), col("hc_1995") === col("c_custkey"))
      .select(col("c_custkey"), col("c_name"),
        round(col("line_1996") / col("line_1995"), 6).as("line_growth"),
        round(col("head_1996") / col("head_1995"), 6).as("head_growth"))
      .orderBy(col("c_custkey"))
      .limit(100)
  }

  private val q4YearlyGrowthSql =
    """WITH head AS (
      |  SELECT o_custkey, CAST(EXTRACT(YEAR FROM o_orderdate) AS INTEGER) AS yr,
      |    CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total
      |  FROM orders GROUP BY 1, 2),
      |line AS (
      |  SELECT o_custkey, CAST(EXTRACT(YEAR FROM o_orderdate) AS INTEGER) AS yr,
      |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
      |             (CAST(1.00 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS total
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey GROUP BY 1, 2)
      |SELECT c_custkey, c_name,
      |  round(l96.total / l95.total, 6) AS line_growth,
      |  round(h96.total / h95.total, 6) AS head_growth
      |FROM head h95
      |JOIN head h96 ON h95.o_custkey = h96.o_custkey
      |JOIN line l95 ON h95.o_custkey = l95.o_custkey
      |JOIN line l96 ON h95.o_custkey = l96.o_custkey
      |JOIN customer ON h95.o_custkey = c_custkey
      |WHERE h95.yr = 1995 AND h96.yr = 1996 AND l95.yr = 1995 AND l96.yr = 1996
      |  AND h95.total > 0 AND l95.total > 0
      |  AND l96.total / l95.total > h96.total / h95.total
      |ORDER BY c_custkey
      |LIMIT 100""".stripMargin

  // DS q6 shape: nations of customers who bought parts priced above
  // 1.02× the average for their type — correlated category-average
  // scalar subquery feeding a HAVING-count report
  private val q6AboveAvgType: Q = (s, dir) => {
    val typeAvg = load(s, dir, "part").groupBy(col("p_type").as("at_type"))
      .agg((dbl(sum(dec(col("p_retailprice")))) / count(lit(1))).as("type_avg"))
    val expensive = load(s, dir, "part")
      .join(broadcast(typeAvg), col("p_type") === col("at_type"))
      .filter(dbl(col("p_retailprice")) > col("type_avg") * 1.02)
      .select(col("p_partkey"))
    load(s, dir, "lineitem")
      .join(expensive, col("l_partkey") === col("p_partkey"), "left_semi")
      .join(load(s, dir, "orders").filter(year(col("o_orderdate")) === 1996),
        col("l_orderkey") === col("o_orderkey"))
      .join(load(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
      .join(load(s, dir, "nation"), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= 10)
      .orderBy(col("cnt"), col("n_name"))
  }

  private val q6AboveAvgTypeSql =
    """WITH type_avg AS (
      |  SELECT p_type AS at_type,
      |    CAST(SUM(CAST(p_retailprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS type_avg
      |  FROM part GROUP BY 1)
      |SELECT n_name, COUNT(*) AS cnt
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |WHERE EXTRACT(YEAR FROM o_orderdate) = 1996
      |  AND l_partkey IN (
      |    SELECT p_partkey FROM part JOIN type_avg ON p_type = at_type
      |    WHERE CAST(p_retailprice AS DOUBLE) > type_avg * 1.02)
      |GROUP BY n_name
      |HAVING COUNT(*) >= 10
      |ORDER BY cnt, n_name""".stripMargin

  // DS q17 shape: quantity moments (count / mean / stdev / coefficient
  // of variation) per brand, split by returned-vs-accepted slices via
  // FILTERed aggregates over one quarter
  private val q17StatMoments: Q = (s, dir) => {
    def slice(flag: String, p: String) = Seq(
      count(when(col("l_returnflag") === flag, col("l_quantity"))).as(s"${p}_cnt"),
      round(avg(when(col("l_returnflag") === flag, dbl(col("l_quantity")))), 4).as(s"${p}_avg"),
      round(stddev_samp(when(col("l_returnflag") === flag, dbl(col("l_quantity")))), 4).as(s"${p}_stdev"),
      round(stddev_samp(when(col("l_returnflag") === flag, dbl(col("l_quantity")))) /
        avg(when(col("l_returnflag") === flag, dbl(col("l_quantity")))), 4).as(s"${p}_cov"))
    val aggs = slice("R", "ret") ++ slice("A", "acc")
    load(s, dir, "lineitem")
      .filter(year(col("l_shipdate")) === 1996 && quarter(col("l_shipdate")) === 1)
      .join(load(s, dir, "part"), col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"))
      .agg(aggs.head, aggs.tail: _*)
      .orderBy(col("p_brand"))
  }

  private val q17StatMomentsSql =
    """SELECT p_brand,
      |  COUNT(l_quantity) FILTER (WHERE l_returnflag = 'R') AS ret_cnt,
      |  round(AVG(CAST(l_quantity AS DOUBLE)) FILTER (WHERE l_returnflag = 'R'), 4) AS ret_avg,
      |  round(STDDEV_SAMP(CAST(l_quantity AS DOUBLE)) FILTER (WHERE l_returnflag = 'R'), 4) AS ret_stdev,
      |  round(STDDEV_SAMP(CAST(l_quantity AS DOUBLE)) FILTER (WHERE l_returnflag = 'R') /
      |        AVG(CAST(l_quantity AS DOUBLE)) FILTER (WHERE l_returnflag = 'R'), 4) AS ret_cov,
      |  COUNT(l_quantity) FILTER (WHERE l_returnflag = 'A') AS acc_cnt,
      |  round(AVG(CAST(l_quantity AS DOUBLE)) FILTER (WHERE l_returnflag = 'A'), 4) AS acc_avg,
      |  round(STDDEV_SAMP(CAST(l_quantity AS DOUBLE)) FILTER (WHERE l_returnflag = 'A'), 4) AS acc_stdev,
      |  round(STDDEV_SAMP(CAST(l_quantity AS DOUBLE)) FILTER (WHERE l_returnflag = 'A') /
      |        AVG(CAST(l_quantity AS DOUBLE)) FILTER (WHERE l_returnflag = 'A'), 4) AS acc_cov
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE EXTRACT(YEAR FROM l_shipdate) = 1996 AND EXTRACT(QUARTER FROM l_shipdate) = 1
      |GROUP BY p_brand
      |ORDER BY p_brand""".stripMargin

  // DS q21/q40 shape: per-supplier shipped quantity split before/after a
  // pivot date inside a ±60-day window, kept when the ratio stays within
  // [2/3, 3/2] — the conditional-sum + HAVING-ratio grammar
  private val q21BeforeAfterRatio: Q = (s, dir) =>
    load(s, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1996-04-02") && col("l_shipdate") <= lit("1996-07-31"))
      .join(load(s, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("s_suppkey"), col("s_name"))
      .agg(
        sum(when(col("l_shipdate") < lit("1996-06-01"), col("l_quantity").cast("bigint"))
          .otherwise(lit(0L))).as("qty_before"),
        sum(when(col("l_shipdate") >= lit("1996-06-01"), col("l_quantity").cast("bigint"))
          .otherwise(lit(0L))).as("qty_after"))
      .filter(col("qty_before") > 0 &&
        col("qty_after").cast("double") / col("qty_before") >= 2.0 / 3.0 &&
        col("qty_after").cast("double") / col("qty_before") <= 3.0 / 2.0)
      .orderBy(col("s_suppkey"))
      .limit(100)

  private val q21BeforeAfterRatioSql =
    """SELECT s_suppkey, s_name,
      |  CAST(SUM(CASE WHEN l_shipdate < TIMESTAMP '1996-06-01' THEN CAST(l_quantity AS BIGINT) ELSE 0 END) AS BIGINT) AS qty_before,
      |  CAST(SUM(CASE WHEN l_shipdate >= TIMESTAMP '1996-06-01' THEN CAST(l_quantity AS BIGINT) ELSE 0 END) AS BIGINT) AS qty_after
      |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
      |WHERE l_shipdate >= TIMESTAMP '1996-04-02' AND l_shipdate <= TIMESTAMP '1996-07-31'
      |GROUP BY s_suppkey, s_name
      |HAVING SUM(CASE WHEN l_shipdate < TIMESTAMP '1996-06-01' THEN CAST(l_quantity AS BIGINT) ELSE 0 END) > 0
      |  AND CAST(SUM(CASE WHEN l_shipdate >= TIMESTAMP '1996-06-01' THEN CAST(l_quantity AS BIGINT) ELSE 0 END) AS DOUBLE) /
      |      SUM(CASE WHEN l_shipdate < TIMESTAMP '1996-06-01' THEN CAST(l_quantity AS BIGINT) ELSE 0 END) >= 2.0 / 3.0
      |  AND CAST(SUM(CASE WHEN l_shipdate >= TIMESTAMP '1996-06-01' THEN CAST(l_quantity AS BIGINT) ELSE 0 END) AS DOUBLE) /
      |      SUM(CASE WHEN l_shipdate < TIMESTAMP '1996-06-01' THEN CAST(l_quantity AS BIGINT) ELSE 0 END) <= 3.0 / 2.0
      |ORDER BY s_suppkey
      |LIMIT 100""".stripMargin

  // DS q22 shape: average on-hand quantity over the full product
  // hierarchy rollup (type → brand → size), smallest averages first
  private val q22QtyRollup: Q = (s, dir) =>
    load(s, dir, "lineitem")
      .join(load(s, dir, "part"), col("l_partkey") === col("p_partkey"))
      .rollup(col("p_type"), col("p_brand"), col("p_size"))
      .agg((dbl(sum(dec(col("l_quantity")))) / count(lit(1))).as("qoh"))
      .orderBy(col("qoh"), col("p_type").asc_nulls_first,
        col("p_brand").asc_nulls_first, col("p_size").asc_nulls_first)
      .limit(100)

  private val q22QtyRollupSql =
    """SELECT p_type, p_brand, p_size,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS qoh
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |GROUP BY ROLLUP(p_type, p_brand, p_size)
      |ORDER BY qoh, p_type NULLS FIRST, p_brand NULLS FIRST, p_size NULLS FIRST
      |LIMIT 100""".stripMargin

  // DS q28 shape: six-column scalar report built by cross-joining
  // independent single-row aggregates over disjunctive band slices
  // (avg / count / count-distinct of price per quantity band)
  private val q28DistinctBuckets: Q = (s, dir) => {
    def bucket(i: Int, qlo: Int, qhi: Int, plo: Double, phi: Double, dlo: Double, dhi: Double) =
      load(s, dir, "lineitem")
        .filter(col("l_quantity").between(qlo, qhi) &&
          (dbl(col("l_extendedprice")).between(plo, phi) ||
            col("l_discount").between(dlo, dhi)))
        .agg(
          round(dbl(sum(dec(col("l_extendedprice")))) / count(col("l_extendedprice")), 4)
            .as(s"b${i}_avg"),
          count(col("l_extendedprice")).as(s"b${i}_cnt"),
          countDistinct(col("l_extendedprice")).as(s"b${i}_cntd"))
    bucket(1, 1, 10, 5000.0, 10000.0, 0.00, 0.02)
      .crossJoin(bucket(2, 11, 20, 10000.0, 20000.0, 0.03, 0.05))
      .crossJoin(bucket(3, 21, 30, 20000.0, 30000.0, 0.06, 0.08))
  }

  private val q28DistinctBucketsSql =
    """SELECT * FROM
      |(SELECT round(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(l_extendedprice), 4) AS b1_avg,
      |   COUNT(l_extendedprice) AS b1_cnt, COUNT(DISTINCT l_extendedprice) AS b1_cntd
      | FROM lineitem WHERE l_quantity BETWEEN 1 AND 10
      |   AND (CAST(l_extendedprice AS DOUBLE) BETWEEN 5000.0 AND 10000.0 OR l_discount BETWEEN 0.00 AND 0.02)) B1,
      |(SELECT round(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(l_extendedprice), 4) AS b2_avg,
      |   COUNT(l_extendedprice) AS b2_cnt, COUNT(DISTINCT l_extendedprice) AS b2_cntd
      | FROM lineitem WHERE l_quantity BETWEEN 11 AND 20
      |   AND (CAST(l_extendedprice AS DOUBLE) BETWEEN 10000.0 AND 20000.0 OR l_discount BETWEEN 0.03 AND 0.05)) B2,
      |(SELECT round(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(l_extendedprice), 4) AS b3_avg,
      |   COUNT(l_extendedprice) AS b3_cnt, COUNT(DISTINCT l_extendedprice) AS b3_cntd
      | FROM lineitem WHERE l_quantity BETWEEN 21 AND 30
      |   AND (CAST(l_extendedprice AS DOUBLE) BETWEEN 20000.0 AND 30000.0 OR l_discount BETWEEN 0.06 AND 0.08)) B3""".stripMargin

  // DS q43 shape: revenue pivoted across the seven weekdays per selling
  // nation — one row per nation, seven conditional-sum columns.
  // Spark dayofweek() is 1=Sunday; DuckDB EXTRACT(DOW) is 0=Sunday.
  private val q43DowPivot: Q = (s, dir) => {
    val dowCols = Seq("sun", "mon", "tue", "wed", "thu", "fri", "sat").zipWithIndex.map {
      case (d, i) => dbl(sum(when(dayofweek(col("l_shipdate")) === i + 1,
        dec(col("l_extendedprice"))))).as(s"${d}_sales")
    }
    load(s, dir, "lineitem")
      .filter(year(col("l_shipdate")) === 1996)
      .join(load(s, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
      .join(load(s, dir, "nation"), col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(dowCols.head, dowCols.tail: _*)
      .orderBy(col("n_name"))
  }

  private val q43DowPivotSql =
    """SELECT n_name,
      |  CAST(SUM(CASE WHEN EXTRACT(DOW FROM l_shipdate) = 0 THEN CAST(l_extendedprice AS DECIMAL(12,2)) END) AS DOUBLE) AS sun_sales,
      |  CAST(SUM(CASE WHEN EXTRACT(DOW FROM l_shipdate) = 1 THEN CAST(l_extendedprice AS DECIMAL(12,2)) END) AS DOUBLE) AS mon_sales,
      |  CAST(SUM(CASE WHEN EXTRACT(DOW FROM l_shipdate) = 2 THEN CAST(l_extendedprice AS DECIMAL(12,2)) END) AS DOUBLE) AS tue_sales,
      |  CAST(SUM(CASE WHEN EXTRACT(DOW FROM l_shipdate) = 3 THEN CAST(l_extendedprice AS DECIMAL(12,2)) END) AS DOUBLE) AS wed_sales,
      |  CAST(SUM(CASE WHEN EXTRACT(DOW FROM l_shipdate) = 4 THEN CAST(l_extendedprice AS DECIMAL(12,2)) END) AS DOUBLE) AS thu_sales,
      |  CAST(SUM(CASE WHEN EXTRACT(DOW FROM l_shipdate) = 5 THEN CAST(l_extendedprice AS DECIMAL(12,2)) END) AS DOUBLE) AS fri_sales,
      |  CAST(SUM(CASE WHEN EXTRACT(DOW FROM l_shipdate) = 6 THEN CAST(l_extendedprice AS DECIMAL(12,2)) END) AS DOUBLE) AS sat_sales
      |FROM lineitem
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN nation ON s_nationkey = n_nationkey
      |WHERE EXTRACT(YEAR FROM l_shipdate) = 1996
      |GROUP BY n_name
      |ORDER BY n_name""".stripMargin

  // DS q54 shape: build a cohort (customers who bought PROMO-type parts
  // in 1995 H1), measure their spend in the following quarter, histogram
  // customers into fixed-width revenue segments
  private val q54CohortRevenue: Q = (s, dir) => {
    val cohort = load(s, dir, "lineitem")
      .join(load(s, dir, "part").filter(col("p_type") === "PROMO"),
        col("l_partkey") === col("p_partkey"))
      .join(load(s, dir, "orders")
          .filter(col("o_orderdate") >= lit("1995-01-01") && col("o_orderdate") < lit("1995-07-01")),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey")).distinct()
    load(s, dir, "orders")
      .filter(col("o_orderdate") >= lit("1995-07-01") && col("o_orderdate") < lit("1995-10-01"))
      .join(cohort, Seq("o_custkey"), "left_semi")
      .groupBy(col("o_custkey"))
      .agg(dbl(sum(dec(col("o_totalprice")))).as("revenue"))
      .select(floor(col("revenue") / 1000).cast("bigint").as("segment"))
      .groupBy(col("segment"))
      .agg(count(lit(1)).as("num_customers"))
      .orderBy(col("segment"))

  }

  private val q54CohortRevenueSql =
    """WITH cohort AS (
      |  SELECT DISTINCT o_custkey
      |  FROM lineitem
      |  JOIN part ON l_partkey = p_partkey AND p_type = 'PROMO'
      |  JOIN orders ON l_orderkey = o_orderkey
      |  WHERE o_orderdate >= TIMESTAMP '1995-01-01' AND o_orderdate < TIMESTAMP '1995-07-01'),
      |spend AS (
      |  SELECT o_custkey, CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS revenue
      |  FROM orders
      |  WHERE o_orderdate >= TIMESTAMP '1995-07-01' AND o_orderdate < TIMESTAMP '1995-10-01'
      |    AND o_custkey IN (SELECT o_custkey FROM cohort)
      |  GROUP BY o_custkey)
      |SELECT CAST(FLOOR(revenue / 1000) AS BIGINT) AS segment, COUNT(*) AS num_customers
      |FROM spend
      |GROUP BY 1
      |ORDER BY segment""".stripMargin

  // DS q66 shape: twelve-month revenue pivot per selling nation for one
  // year — the wide carrier/month matrix report
  private val q66MonthlyPivot: Q = (s, dir) => {
    val monthCols = (1 to 12).map { m =>
      dbl(sum(when(month(col("l_shipdate")) === m,
        revenue(col("l_extendedprice"), col("l_discount"))))).as(f"m$m%02d_rev")
    }
    load(s, dir, "lineitem")
      .filter(year(col("l_shipdate")) === 1996)
      .join(load(s, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
      .join(load(s, dir, "nation"), col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(monthCols.head, monthCols.tail: _*)
      .orderBy(col("n_name"))
  }

  private val q66MonthlyPivotSql = {
    val cols = (1 to 12).map { m =>
      f"  CAST(SUM(CASE WHEN EXTRACT(MONTH FROM l_shipdate) = $m THEN CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1.00 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2))) END) AS DOUBLE) AS m$m%02d_rev"
    }.mkString(",\n")
    s"""SELECT n_name,
      |$cols
      |FROM lineitem
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN nation ON s_nationkey = n_nationkey
      |WHERE EXTRACT(YEAR FROM l_shipdate) = 1996
      |GROUP BY n_name
      |ORDER BY n_name""".stripMargin
  }

  // DS q67 shape: sales over the product-hierarchy rollup, ranked within
  // each hierarchy level, keeping the top 5 per level — a rank filter
  // over Expand output (WindowGroupLimit-eligible)
  private val q67RollupRank: Q = (s, dir) => {
    val rolled = load(s, dir, "lineitem")
      .join(load(s, dir, "part"), col("l_partkey") === col("p_partkey"))
      .rollup(col("p_type"), col("p_brand"))
      .agg(dbl(sum(revenue(col("l_extendedprice"), col("l_discount")))).as("sumsales"),
        (grouping(col("p_type")) + grouping(col("p_brand"))).cast("int").as("lochierarchy"))
    val w = Window.partitionBy(col("lochierarchy")).orderBy(col("sumsales").desc)
    rolled
      .select(col("p_type"), col("p_brand"), round(col("sumsales"), 4).as("sumsales"),
        col("lochierarchy"), rank().over(w).as("rk"))
      .filter(col("rk") <= 5)
      .orderBy(col("lochierarchy").desc, col("rk"),
        col("p_type").asc_nulls_first, col("p_brand").asc_nulls_first)
  }

  private val q67RollupRankSql =
    """SELECT p_type, p_brand, round(sumsales, 4) AS sumsales, lochierarchy,
      |  CAST(rk AS INTEGER) AS rk
      |FROM (
      |  SELECT p_type, p_brand, sumsales, lochierarchy,
      |    RANK() OVER (PARTITION BY lochierarchy ORDER BY sumsales DESC) AS rk
      |  FROM (
      |    SELECT p_type, p_brand,
      |      CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
      |               (CAST(1.00 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS sumsales,
      |      CAST(GROUPING(p_type) + GROUPING(p_brand) AS INTEGER) AS lochierarchy
      |    FROM lineitem JOIN part ON l_partkey = p_partkey
      |    GROUP BY ROLLUP(p_type, p_brand)) t) r
      |WHERE rk <= 5
      |ORDER BY lochierarchy DESC, rk, p_type NULLS FIRST, p_brand NULLS FIRST""".stripMargin

  // DS q78 shape: year-over-year per-customer spend growth computed over
  // non-returned lineitems only (returnflag <> 'R' stands in for the
  // not-exists-in-returns anti join), top growth first
  private val q78NoReturnYoy: Q = (s, dir) => {
    def yearly(yr: Int) = load(s, dir, "lineitem")
      .filter(col("l_returnflag") =!= "R")
      .join(load(s, dir, "orders").filter(year(col("o_orderdate")) === yr),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_custkey").as(s"ck_$yr"))
      .agg(dbl(sum(revenue(col("l_extendedprice"), col("l_discount")))).as(s"rev_$yr"))
    yearly(1995).join(yearly(1996), col("ck_1995") === col("ck_1996"))
      .filter(col("rev_1995") > 0)
      .select(col("ck_1995").as("custkey"),
        round(col("rev_1996") / col("rev_1995"), 6).as("growth"),
        round(col("rev_1995"), 4).as("rev_prev"), round(col("rev_1996"), 4).as("rev_cur"))
      .orderBy(col("growth").desc, col("custkey"))
      .limit(100)
  }

  private val q78NoReturnYoySql =
    """WITH yearly AS (
      |  SELECT o_custkey, CAST(EXTRACT(YEAR FROM o_orderdate) AS INTEGER) AS yr,
      |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
      |             (CAST(1.00 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS rev
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |  WHERE l_returnflag <> 'R'
      |  GROUP BY 1, 2)
      |SELECT cur.o_custkey AS custkey,
      |  round(cur.rev / prev.rev, 6) AS growth,
      |  round(prev.rev, 4) AS rev_prev, round(cur.rev, 4) AS rev_cur
      |FROM yearly prev JOIN yearly cur ON prev.o_custkey = cur.o_custkey
      |WHERE prev.yr = 1995 AND cur.yr = 1996 AND prev.rev > 0
      |ORDER BY growth DESC, custkey
      |LIMIT 100""".stripMargin

  // DS q82 shape: parts whose surrogate on-hand stock (summed shipped
  // quantity per part-supplier pair, the partsupp stand-in) sits in a
  // band, price-banded, and actually sold in a 60-day window
  private val q82StockRange: Q = (s, dir) => {
    val li = load(s, dir, "lineitem")
    val stock = li.groupBy(col("l_partkey").as("st_part"), col("l_suppkey"))
      .agg(dbl(sum(dec(col("l_quantity")))).as("availqty"))
      .filter(col("availqty").between(25.0, 50.0))
      .select(col("st_part")).distinct()
    val sold = li.filter(col("l_shipdate") >= lit("1996-01-01") &&
        col("l_shipdate") < lit("1996-03-01"))
      .select(col("l_partkey")).distinct()
    load(s, dir, "part")
      .filter(dbl(col("p_retailprice")).between(920.0, 960.0))
      .join(stock, col("p_partkey") === col("st_part"), "left_semi")
      .join(sold, col("p_partkey") === col("l_partkey"), "left_semi")
      .select(col("p_name"), col("p_brand"), dbl(col("p_retailprice")).as("price"))
      .orderBy(col("p_name"), col("p_brand"))
      .limit(100)
  }

  private val q82StockRangeSql =
    """SELECT p_name, p_brand, CAST(p_retailprice AS DOUBLE) AS price
      |FROM part
      |WHERE CAST(p_retailprice AS DOUBLE) BETWEEN 920.0 AND 960.0
      |  AND p_partkey IN (
      |    SELECT l_partkey FROM lineitem
      |    GROUP BY l_partkey, l_suppkey
      |    HAVING CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) BETWEEN 25.0 AND 50.0)
      |  AND p_partkey IN (
      |    SELECT l_partkey FROM lineitem
      |    WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-03-01')
      |ORDER BY p_name, p_brand
      |LIMIT 100""".stripMargin

  // DS q2 shape (tpcds-queries/q2.sql): two fact channels UNION ALL →
  // weekly day-of-week pivot → self-join of year y vs y+1 on the week
  // number, reporting per-day ratios. The weekly aggregate is tiny
  // (one row per ISO week) so the YoY self-join broadcasts; the only
  // big-data work is one scan + one partial agg per channel.
  private val q2WeekPivot: Q = (s, dir) => {
    val sales = load(s, dir, "lineitem")
        .select(col("l_shipdate").as("sold_date"),
          dec(col("l_extendedprice")).as("sales_price"))
      .unionAll(load(s, dir, "orders")
        .select(col("o_orderdate").as("sold_date"),
          dec(col("o_totalprice")).as("sales_price")))
    val weekly = sales
      .select(expr("extract(YEAROFWEEK FROM sold_date)").as("wk_year"),
        weekofyear(col("sold_date")).as("wk"),
        dayofweek(col("sold_date")).as("dow"), col("sales_price"))
      .groupBy(col("wk_year"), col("wk"))
      .agg(
        dbl(sum(when(col("dow") === 1, col("sales_price")))).as("sun_sales"),
        dbl(sum(when(col("dow") === 2, col("sales_price")))).as("mon_sales"),
        dbl(sum(when(col("dow") === 5, col("sales_price")))).as("thu_sales"),
        dbl(sum(when(col("dow") === 7, col("sales_price")))).as("sat_sales"))
    val y = weekly.filter(col("wk_year") === 1995)
      .select(col("wk").as("wk1"), col("sun_sales").as("sun1"),
        col("mon_sales").as("mon1"), col("thu_sales").as("thu1"),
        col("sat_sales").as("sat1"))
    val z = weekly.filter(col("wk_year") === 1996)
      .select(col("wk").as("wk2"), col("sun_sales").as("sun2"),
        col("mon_sales").as("mon2"), col("thu_sales").as("thu2"),
        col("sat_sales").as("sat2"))
    y.join(z, col("wk1") === col("wk2"))
      .select(col("wk1").as("week_seq"),
        round(col("sun1") / col("sun2"), 4).as("sun_ratio"),
        round(col("mon1") / col("mon2"), 4).as("mon_ratio"),
        round(col("thu1") / col("thu2"), 4).as("thu_ratio"),
        round(col("sat1") / col("sat2"), 4).as("sat_ratio"))
      .orderBy(col("week_seq"))
  }

  private val q2WeekPivotSql =
    """WITH wscs AS (
      |  SELECT l_shipdate AS sold_date, CAST(l_extendedprice AS DECIMAL(12,2)) AS sales_price FROM lineitem
      |  UNION ALL
      |  SELECT o_orderdate, CAST(o_totalprice AS DECIMAL(12,2)) FROM orders),
      |weekly AS (
      |  SELECT EXTRACT(ISOYEAR FROM sold_date) AS wk_year,
      |    CAST(EXTRACT(WEEK FROM sold_date) AS INTEGER) AS wk,
      |    CAST(SUM(CASE WHEN EXTRACT(DOW FROM sold_date) = 0 THEN sales_price END) AS DOUBLE) AS sun_sales,
      |    CAST(SUM(CASE WHEN EXTRACT(DOW FROM sold_date) = 1 THEN sales_price END) AS DOUBLE) AS mon_sales,
      |    CAST(SUM(CASE WHEN EXTRACT(DOW FROM sold_date) = 4 THEN sales_price END) AS DOUBLE) AS thu_sales,
      |    CAST(SUM(CASE WHEN EXTRACT(DOW FROM sold_date) = 6 THEN sales_price END) AS DOUBLE) AS sat_sales
      |  FROM wscs GROUP BY 1, 2)
      |SELECT y.wk AS week_seq,
      |  round(y.sun_sales / z.sun_sales, 4) AS sun_ratio,
      |  round(y.mon_sales / z.mon_sales, 4) AS mon_ratio,
      |  round(y.thu_sales / z.thu_sales, 4) AS thu_ratio,
      |  round(y.sat_sales / z.sat_sales, 4) AS sat_ratio
      |FROM weekly y JOIN weekly z ON y.wk = z.wk
      |WHERE y.wk_year = 1995 AND z.wk_year = 1996
      |ORDER BY week_seq""".stripMargin

  /** line-number band → channel class, the store/web/catalog analog
    * shared by the q5/q14 shapes (the synthetic schema has no ship
    * mode; line numbers 1-7 give three stable classes) */
  private def channelClass: Column =
    when(col("l_linenumber").isin(1, 2), lit("air"))
      .when(col("l_linenumber").isin(3, 4), lit("sea"))
      .otherwise(lit("land"))

  private val channelClassSql =
    """CASE WHEN l_linenumber IN (1,2) THEN 'air'
      |     WHEN l_linenumber IN (3,4) THEN 'sea'
      |     ELSE 'land' END""".stripMargin

  // DS q5 shape (q5.sql): per-channel sales / returns / profit report
  // over ROLLUP(channel, id). Sales vs returns split by the return flag
  // (the store_returns analog); profit = revenue minus tax charge.
  private val q5ChannelRollup: Q = (s, dir) =>
    load(s, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1995-01-01") &&
        col("l_shipdate") < lit("1995-04-01"))
      .select(channelClass.as("channel"), col("l_returnflag").as("id"),
        col("l_returnflag"), col("l_extendedprice"), col("l_discount"),
        col("l_tax"))
      .rollup(col("channel"), col("id"))
      .agg(
        coalesce(dbl(sum(when(col("l_returnflag") =!= "R",
          dec(col("l_extendedprice"))))), lit(0.0)).as("sales"),
        coalesce(dbl(sum(when(col("l_returnflag") === "R",
          dec(col("l_extendedprice"))))), lit(0.0)).as("returns"),
        dbl(sum(revenue(col("l_extendedprice"), col("l_discount")) -
          dec(col("l_extendedprice")) * rate(col("l_tax")))).as("profit"))
      .orderBy(col("channel").asc_nulls_first, col("id").asc_nulls_first)
      .limit(100)

  private val q5ChannelRollupSql =
    s"""SELECT $channelClassSql AS channel, l_returnflag AS id,
      |  COALESCE(CAST(SUM(CASE WHEN l_returnflag <> 'R' THEN CAST(l_extendedprice AS DECIMAL(12,2)) END) AS DOUBLE), 0.0) AS sales,
      |  COALESCE(CAST(SUM(CASE WHEN l_returnflag = 'R' THEN CAST(l_extendedprice AS DECIMAL(12,2)) END) AS DOUBLE), 0.0) AS returns,
      |  CAST(SUM($rev - CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_tax AS DECIMAL(4,2))) AS DOUBLE) AS profit
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1995-01-01' AND l_shipdate < TIMESTAMP '1995-04-01'
      |GROUP BY ROLLUP(channel, id)
      |ORDER BY channel NULLS FIRST, id NULLS FIRST
      |LIMIT 100""".stripMargin

  // DS q8 shape (q8.sql): revenue restricted to a literal zip-prefix
  // list INTERSECTed with the prefixes that have >5 above-average
  // ("preferred") account holders — the customer-name digit suffix is
  // the zip analog. The prefix sets are tiny → both legs broadcast.
  private val q8PreferredPrefix: Q = (s, dir) => {
    val cust = load(s, dir, "customer")
    val pref = substring(col("c_name"), -2, 2)
    val inList = cust.filter(pref.isin("13", "31", "23", "29", "30", "18", "17"))
      .select(pref.as("pref")).distinct()
    val avgBal = cust.agg(
      (dbl(sum(dec(col("c_acctbal")))) / count(lit(1))).as("ab"))
    val preferred = cust.crossJoin(avgBal)
      .filter(dbl(col("c_acctbal")) > col("ab"))
      .groupBy(pref.as("pref")).agg(count(lit(1)).as("n"))
      .filter(col("n") > 5).select(col("pref"))
    val chosen = inList.intersect(preferred)
    load(s, dir, "orders")
      .filter(year(col("o_orderdate")) === 1996 && quarter(col("o_orderdate")) === 1)
      .join(cust, col("o_custkey") === col("c_custkey"))
      .withColumn("pref", pref)
      .join(chosen, Seq("pref"), "left_semi")
      .groupBy(col("pref"))
      .agg(dbl(sum(dec(col("o_totalprice")))).as("net_sales"))
      .orderBy(col("pref"))
  }

  private val q8PreferredPrefixSql =
    """WITH preferred AS (
      |  SELECT substr(c_name,-2,2) AS pref FROM customer
      |  WHERE CAST(c_acctbal AS DOUBLE) >
      |    (SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) FROM customer)
      |  GROUP BY 1 HAVING COUNT(*) > 5),
      |chosen AS (
      |  SELECT DISTINCT substr(c_name,-2,2) AS pref FROM customer
      |  WHERE substr(c_name,-2,2) IN ('13','31','23','29','30','18','17')
      |  INTERSECT SELECT pref FROM preferred)
      |SELECT substr(c_name,-2,2) AS pref,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS net_sales
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |WHERE EXTRACT(YEAR FROM o_orderdate) = 1996 AND EXTRACT(QUARTER FROM o_orderdate) = 1
      |  AND substr(c_name,-2,2) IN (SELECT pref FROM chosen)
      |GROUP BY 1 ORDER BY 1""".stripMargin

  // DS q10 shape (q10.sql): demographic profile counts for customers
  // who are active in a date window AND appear in at least one of two
  // other behavioral sets (EXISTS ... OR EXISTS ...). Both EXISTS legs
  // reduce to distinct key sets → semi joins on the customer key.
  private val q10ActiveProfile: Q = (s, dir) => {
    val orders = load(s, dir, "orders")
    val active = orders
      .filter(year(col("o_orderdate")) === 1995 && month(col("o_orderdate")).between(1, 4))
      .select(col("o_custkey")).distinct()
    val returned = load(s, dir, "lineitem").filter(col("l_returnflag") === "R")
      .join(orders.select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey")).distinct()
    val urgent = orders.filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_custkey")).distinct()
    val either = returned.union(urgent).distinct()
    load(s, dir, "customer")
      .join(active, col("c_custkey") === active("o_custkey"), "left_semi")
      .join(either, col("c_custkey") === either("o_custkey"), "left_semi")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("cnt"),
        dbl(min(dec(col("c_acctbal")))).as("min_bal"),
        dbl(max(dec(col("c_acctbal")))).as("max_bal"),
        (dbl(sum(dec(col("c_acctbal")))) / count(lit(1))).as("avg_bal"))
      .orderBy(col("c_mktsegment"))
  }

  private val q10ActiveProfileSql =
    """SELECT c_mktsegment, COUNT(*) AS cnt,
      |  CAST(MIN(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS min_bal,
      |  CAST(MAX(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS max_bal,
      |  CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_bal
      |FROM customer
      |WHERE c_custkey IN (
      |    SELECT o_custkey FROM orders
      |    WHERE EXTRACT(YEAR FROM o_orderdate) = 1995 AND EXTRACT(MONTH FROM o_orderdate) BETWEEN 1 AND 4)
      |  AND (c_custkey IN (
      |      SELECT o_custkey FROM orders JOIN lineitem ON l_orderkey = o_orderkey
      |      WHERE l_returnflag = 'R')
      |    OR c_custkey IN (
      |      SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'))
      |GROUP BY 1 ORDER BY 1""".stripMargin

  // DS q13 shape (q13.sql): one-row average report under a three-way
  // disjunction of paired (demographic band AND numeric band)
  // predicates — the filter that defeats naive pushdown but stays a
  // single codegen'd scan + partial agg here.
  private val q13BandAverages: Q = (s, dir) =>
    load(s, dir, "lineitem")
      .join(load(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .join(load(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
      .filter(
        (col("c_mktsegment") === "AUTOMOBILE" &&
          dbl(col("o_totalprice")).between(50000.0, 150000.0) &&
          dec(col("l_quantity")).between(1, 20)) ||
        (col("c_mktsegment") === "BUILDING" &&
          dbl(col("o_totalprice")).between(100000.0, 250000.0) &&
          dec(col("l_quantity")).between(10, 35)) ||
        (col("c_mktsegment") === "MACHINERY" &&
          dbl(col("o_totalprice")).between(150000.0, 300000.0) &&
          dec(col("l_quantity")).between(20, 50)))
      .agg(
        (dbl(sum(dec(col("l_quantity")))) / count(lit(1))).as("avg_qty"),
        (dbl(sum(dec(col("l_extendedprice")))) / count(lit(1))).as("avg_price"),
        (dbl(sum(rate(col("l_discount")))) / count(lit(1))).as("avg_disc"),
        count(lit(1)).as("cnt"))

  private val q13BandAveragesSql =
    """SELECT
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_price,
      |  CAST(SUM(CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) / COUNT(*) AS avg_disc,
      |  COUNT(*) AS cnt
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |WHERE (c_mktsegment = 'AUTOMOBILE' AND CAST(o_totalprice AS DOUBLE) BETWEEN 50000.0 AND 150000.0
      |       AND CAST(l_quantity AS DECIMAL(12,2)) BETWEEN 1 AND 20)
      |   OR (c_mktsegment = 'BUILDING' AND CAST(o_totalprice AS DOUBLE) BETWEEN 100000.0 AND 250000.0
      |       AND CAST(l_quantity AS DECIMAL(12,2)) BETWEEN 10 AND 35)
      |   OR (c_mktsegment = 'MACHINERY' AND CAST(o_totalprice AS DOUBLE) BETWEEN 150000.0 AND 300000.0
      |       AND CAST(l_quantity AS DECIMAL(12,2)) BETWEEN 20 AND 50)""".stripMargin

  // DS q14 shape (q14a.sql): "cross items" = parts sold through ALL
  // channels (the store∩catalog∩web item intersection), then a
  // ROLLUP(channel, brand) revenue report restricted to those parts.
  // The intersection is computed on (partkey, channel) pairs — one
  // distinct-agg, no joins between full fact copies.
  private val q14CrossChannel: Q = (s, dir) => {
    val li = load(s, dir, "lineitem")
    // one shuffle on l_partkey with a bounded (≤3 channels) set-union
    // partial agg — vs distinct-pairs + re-aggregate, which costs two
    // full-fact shuffles for the same answer
    val crossItems = li.select(col("l_partkey"), channelClass.as("channel"))
      .groupBy(col("l_partkey"))
      .agg(size(collect_set(col("channel"))).as("nch"))
      .filter(col("nch") === 3).select(col("l_partkey").as("ci_part"))
    li.join(crossItems, col("l_partkey") === col("ci_part"), "left_semi")
      .join(load(s, dir, "part"), col("l_partkey") === col("p_partkey"))
      .withColumn("channel", channelClass)
      .rollup(col("channel"), col("p_brand"))
      .agg(dbl(sum(revenue(col("l_extendedprice"), col("l_discount")))).as("sales"),
        count(lit(1)).as("n_rows"))
      .orderBy(col("channel").asc_nulls_first, col("p_brand").asc_nulls_first)
      .limit(100)
  }

  private val q14CrossChannelSql =
    s"""WITH cross_items AS (
      |  SELECT l_partkey FROM (
      |    SELECT DISTINCT l_partkey, $channelClassSql AS channel FROM lineitem)
      |  GROUP BY l_partkey HAVING COUNT(*) = 3)
      |SELECT $channelClassSql AS channel, p_brand,
      |  CAST(SUM($rev) AS DOUBLE) AS sales, COUNT(*) AS n_rows
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE l_partkey IN (SELECT l_partkey FROM cross_items)
      |GROUP BY ROLLUP(channel, p_brand)
      |ORDER BY channel NULLS FIRST, p_brand NULLS FIRST
      |LIMIT 100""".stripMargin

  // DS q15 shape (q15.sql): quarterly revenue by zip prefix where the
  // row qualifies via prefix-list OR geography OR a high-value order —
  // the disjunction spans dimension and fact columns so nothing prunes,
  // but it's still one scan.
  private val q15PrefixRevenue: Q = (s, dir) =>
    load(s, dir, "orders")
      .filter(year(col("o_orderdate")) === 1995 && quarter(col("o_orderdate")) === 1)
      .join(load(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
      .filter(substring(col("c_name"), -2, 2).isin("13", "31", "23", "29", "30", "18", "17") ||
        col("c_nationkey").isin(3, 9, 14) ||
        dbl(col("o_totalprice")) > 350000.0)
      .groupBy(substring(col("c_name"), -2, 2).as("pref"))
      .agg(dbl(sum(dec(col("o_totalprice")))).as("total"))
      .orderBy(col("pref"))

  private val q15PrefixRevenueSql =
    """SELECT substr(c_name,-2,2) AS pref,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |WHERE EXTRACT(YEAR FROM o_orderdate) = 1995 AND EXTRACT(QUARTER FROM o_orderdate) = 1
      |  AND (substr(c_name,-2,2) IN ('13','31','23','29','30','18','17')
      |    OR c_nationkey IN (3,9,14)
      |    OR CAST(o_totalprice AS DOUBLE) > 350000.0)
      |GROUP BY 1 ORDER BY 1""".stripMargin

  // DS q16 shape (q16.sql): one-row order report combining a
  // count-distinct with an EXISTS (order used ≥2 suppliers) and a NOT
  // EXISTS (no returned line) — the semi+anti join sandwich over the
  // same fact, aggregated order-grain.
  private val q16MultiSupplierClean: Q = (s, dir) => {
    val li = load(s, dir, "lineitem")
    val multi = li.select(col("l_orderkey"), col("l_suppkey")).distinct()
      .groupBy(col("l_orderkey")).agg(count(lit(1)).as("ns"))
      .filter(col("ns") > 1).select(col("l_orderkey").as("mk"))
    val returned = li.filter(col("l_returnflag") === "R")
      .select(col("l_orderkey").as("rk")).distinct()
    load(s, dir, "orders")
      .filter(year(col("o_orderdate")) === 1994)
      .join(multi, col("o_orderkey") === col("mk"), "left_semi")
      .join(returned, col("o_orderkey") === col("rk"), "left_anti")
      .agg(countDistinct(col("o_custkey")).as("n_cust"),
        count(lit(1)).as("n_orders"),
        dbl(sum(dec(col("o_totalprice")))).as("total_price"))
  }

  private val q16MultiSupplierCleanSql =
    """SELECT COUNT(DISTINCT o_custkey) AS n_cust, COUNT(*) AS n_orders,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total_price
      |FROM orders
      |WHERE EXTRACT(YEAR FROM o_orderdate) = 1994
      |  AND o_orderkey IN (
      |    SELECT l_orderkey FROM (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem)
      |    GROUP BY l_orderkey HAVING COUNT(*) > 1)
      |  AND o_orderkey NOT IN (
      |    SELECT l_orderkey FROM lineitem WHERE l_returnflag = 'R')""".stripMargin

  // DS q18 shape (q18.sql): ROLLUP(nation, segment) over four averages
  // mixing fact measures and a dimension attribute (the
  // catalog_sales × customer_demographics multi-average report).
  private val q18RollupAverages: Q = (s, dir) =>
    load(s, dir, "lineitem")
      .join(load(s, dir, "orders").filter(year(col("o_orderdate")) === 1996),
        col("l_orderkey") === col("o_orderkey"))
      .join(load(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
      .join(load(s, dir, "nation"), col("c_nationkey") === col("n_nationkey"))
      .rollup(col("n_name"), col("c_mktsegment"))
      .agg(
        (dbl(sum(dec(col("l_quantity")))) / count(lit(1))).as("avg_qty"),
        (dbl(sum(dec(col("l_extendedprice")))) / count(lit(1))).as("avg_price"),
        (dbl(sum(rate(col("l_discount")))) / count(lit(1))).as("avg_disc"),
        (dbl(sum(dec(col("c_acctbal")))) / count(lit(1))).as("avg_bal"))
      .orderBy(col("n_name").asc_nulls_first, col("c_mktsegment").asc_nulls_first)
      .limit(110)

  private val q18RollupAveragesSql =
    """SELECT n_name, c_mktsegment,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_price,
      |  CAST(SUM(CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) / COUNT(*) AS avg_disc,
      |  CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_bal
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |WHERE EXTRACT(YEAR FROM o_orderdate) = 1996
      |GROUP BY ROLLUP(n_name, c_mktsegment)
      |ORDER BY n_name NULLS FIRST, c_mktsegment NULLS FIRST
      |LIMIT 110""".stripMargin

  // DS q24 shape (q24a.sql): net-paid per (customer, supplier) pair
  // restricted to same-nation pairs, kept only when the pair's total
  // exceeds a multiple of the average pair total (HAVING vs scalar
  // aggregate over the aggregate).
  private val q24SameNationPairs: Q = (s, dir) => {
    val paid = load(s, dir, "lineitem")
      .join(load(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .join(load(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
      .join(load(s, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
      .filter(col("c_nationkey") === col("s_nationkey"))
      .groupBy(col("c_custkey"), col("s_suppkey"))
      .agg(sum(revenue(col("l_extendedprice"), col("l_discount"))).as("netpaid_dec"))
    val avgAll = paid.agg(
      (dbl(sum(col("netpaid_dec"))) / count(lit(1))).as("avg_paid"))
    paid.crossJoin(avgAll)
      .filter(dbl(col("netpaid_dec")) > col("avg_paid") * 1.5)
      .select(col("c_custkey"), col("s_suppkey"),
        dbl(col("netpaid_dec")).as("netpaid"))
      .orderBy(col("c_custkey"), col("s_suppkey"))
  }

  private val q24SameNationPairsSql =
    s"""WITH paid AS (
      |  SELECT c_custkey, s_suppkey, SUM($rev) AS netpaid_dec
      |  FROM lineitem
      |  JOIN orders ON l_orderkey = o_orderkey
      |  JOIN customer ON o_custkey = c_custkey
      |  JOIN supplier ON l_suppkey = s_suppkey
      |  WHERE c_nationkey = s_nationkey
      |  GROUP BY c_custkey, s_suppkey)
      |SELECT c_custkey, s_suppkey, CAST(netpaid_dec AS DOUBLE) AS netpaid
      |FROM paid
      |WHERE CAST(netpaid_dec AS DOUBLE) >
      |  (SELECT CAST(SUM(netpaid_dec) AS DOUBLE) / COUNT(*) FROM paid) * 1.5
      |ORDER BY c_custkey, s_suppkey""".stripMargin

  // DS q29 shape (q29.sql): the sell → return → repurchase quantity
  // chain — three passes over the same fact at different time windows
  // joined item-grain (each pass pre-aggregates before the join, so the
  // three-way join is on part-cardinality, not fact-cardinality).
  private val q29ReturnRepurchase: Q = (s, dir) => {
    val li = load(s, dir, "lineitem")
    def qty(flag: String, yr: Int, alias: String) =
      li.filter(col("l_returnflag") === flag && year(col("l_shipdate")) === yr)
        .groupBy(col("l_partkey").as(alias + "_pk"))
        .agg(dbl(sum(dec(col("l_quantity")))).as(alias))
    qty("N", 1995, "sold_qty")
      .join(qty("R", 1995, "ret_qty"), col("sold_qty_pk") === col("ret_qty_pk"))
      .join(qty("N", 1996, "resold_qty"), col("sold_qty_pk") === col("resold_qty_pk"))
      .join(load(s, dir, "part"), col("sold_qty_pk") === col("p_partkey"))
      .select(col("p_partkey").as("part_id"), col("p_brand").as("brand"),
        col("sold_qty"), col("ret_qty"), col("resold_qty"))
      .orderBy(col("part_id"))
      .limit(100)
  }

  private val q29ReturnRepurchaseSql =
    """WITH sold AS (
      |  SELECT l_partkey, CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sold_qty
      |  FROM lineitem WHERE l_returnflag = 'N' AND EXTRACT(YEAR FROM l_shipdate) = 1995
      |  GROUP BY 1),
      |ret AS (
      |  SELECT l_partkey, CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS ret_qty
      |  FROM lineitem WHERE l_returnflag = 'R' AND EXTRACT(YEAR FROM l_shipdate) = 1995
      |  GROUP BY 1),
      |resold AS (
      |  SELECT l_partkey, CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS resold_qty
      |  FROM lineitem WHERE l_returnflag = 'N' AND EXTRACT(YEAR FROM l_shipdate) = 1996
      |  GROUP BY 1)
      |SELECT p_partkey AS part_id, p_brand AS brand, sold_qty, ret_qty, resold_qty
      |FROM sold JOIN ret ON sold.l_partkey = ret.l_partkey
      |JOIN resold ON sold.l_partkey = resold.l_partkey
      |JOIN part ON sold.l_partkey = p_partkey
      |ORDER BY part_id
      |LIMIT 100""".stripMargin

  // DS q32 shape (q32.sql): "excess discount" — revenue from lines
  // whose discount exceeds 1.3× the per-part average discount in the
  // same window. The correlated scalar subquery decorrelates to a
  // per-part aggregate joined back on the part key.
  private val q32ExcessDiscount: Q = (s, dir) => {
    val li = load(s, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1996-01-01") &&
        col("l_shipdate") < lit("1996-07-01"))
    val avgDisc = li.groupBy(col("l_partkey").as("ad_pk"))
      .agg((dbl(sum(rate(col("l_discount")))) / count(lit(1))).as("avg_disc"))
    li.join(avgDisc, col("l_partkey") === col("ad_pk"))
      .filter(dbl(rate(col("l_discount"))) > col("avg_disc") * 1.3)
      .agg(dbl(sum(dec(col("l_extendedprice")))).as("excess_rev"),
        count(lit(1)).as("n_lines"))
  }

  private val q32ExcessDiscountSql =
    """WITH win AS (
      |  SELECT * FROM lineitem
      |  WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-07-01'),
      |ad AS (
      |  SELECT l_partkey AS ad_pk,
      |    CAST(SUM(CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) / COUNT(*) AS avg_disc
      |  FROM win GROUP BY 1)
      |SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS excess_rev,
      |  COUNT(*) AS n_lines
      |FROM win JOIN ad ON l_partkey = ad_pk
      |WHERE CAST(CAST(l_discount AS DECIMAL(4,2)) AS DOUBLE) > avg_disc * 1.3""".stripMargin

  // DS q45 shape (q45.sql): revenue by zip where the row qualifies by
  // prefix-list OR item-subquery membership — the OR across a literal
  // list and an IN-subquery, expressed as a left join + flag test so
  // no driver-side collect is needed.
  private val q45PrefixOrItems: Q = (s, dir) => {
    val items = load(s, dir, "part").filter(col("p_size").isin(2, 5, 11))
      .select(col("p_partkey").as("ip"))
    load(s, dir, "lineitem")
      .join(load(s, dir, "orders").filter(year(col("o_orderdate")) === 1996),
        col("l_orderkey") === col("o_orderkey"))
      .join(load(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
      .join(items, col("l_partkey") === col("ip"), "left_outer")
      .filter(substring(col("c_name"), -2, 2).isin("13", "17", "23") ||
        col("ip").isNotNull)
      .groupBy(substring(col("c_name"), -2, 2).as("pref"))
      .agg(dbl(sum(revenue(col("l_extendedprice"), col("l_discount")))).as("rev"))
      .orderBy(col("pref"))
  }

  private val q45PrefixOrItemsSql =
    s"""SELECT substr(c_name,-2,2) AS pref, CAST(SUM($rev) AS DOUBLE) AS rev
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |WHERE EXTRACT(YEAR FROM o_orderdate) = 1996
      |  AND (substr(c_name,-2,2) IN ('13','17','23')
      |    OR l_partkey IN (SELECT p_partkey FROM part WHERE p_size IN (2,5,11)))
      |GROUP BY 1 ORDER BY 1""".stripMargin

  // DS q61 shape (q61.sql): promotional-vs-total revenue ratio — two
  // independently-filtered one-row aggregates cross-joined into a
  // single ratio report (each leg is a scan + broadcast dims + scalar
  // agg; the cross join is 1×1).
  private val q61PromoRatio: Q = (s, dir) => {
    def leg(promoOnly: Boolean, alias: String) = {
      val base = load(s, dir, "lineitem")
        .filter(year(col("l_shipdate")) === 1996 && month(col("l_shipdate")) === 11)
        .join(load(s, dir, "part"), col("l_partkey") === col("p_partkey"))
        .join(load(s, dir, "supplier").filter(col("s_nationkey") === 7),
          col("l_suppkey") === col("s_suppkey"))
      val f = if (promoOnly) base.filter(col("p_type") === "PROMO") else base
      f.agg(coalesce(dbl(sum(revenue(col("l_extendedprice"), col("l_discount")))),
        lit(0.0)).as(alias))
    }
    leg(promoOnly = true, "promotions").crossJoin(leg(promoOnly = false, "total"))
      .select(col("promotions"), col("total"),
        when(col("total") =!= 0.0,
          round(col("promotions") / col("total") * 100, 4)).as("promo_pct"))
  }

  private val q61PromoRatioSql =
    s"""WITH promo AS (
      |  SELECT COALESCE(CAST(SUM($rev) AS DOUBLE), 0.0) AS promotions
      |  FROM lineitem
      |  JOIN part ON l_partkey = p_partkey
      |  JOIN supplier ON l_suppkey = s_suppkey
      |  WHERE EXTRACT(YEAR FROM l_shipdate) = 1996 AND EXTRACT(MONTH FROM l_shipdate) = 11
      |    AND s_nationkey = 7 AND p_type = 'PROMO'),
      |tot AS (
      |  SELECT COALESCE(CAST(SUM($rev) AS DOUBLE), 0.0) AS total
      |  FROM lineitem
      |  JOIN part ON l_partkey = p_partkey
      |  JOIN supplier ON l_suppkey = s_suppkey
      |  WHERE EXTRACT(YEAR FROM l_shipdate) = 1996 AND EXTRACT(MONTH FROM l_shipdate) = 11
      |    AND s_nationkey = 7)
      |SELECT promotions, total,
      |  CASE WHEN total <> 0.0 THEN round(promotions / total * 100, 4) END AS promo_pct
      |FROM promo, tot""".stripMargin

  // DS q64 shape (q64.sql, reduced): repeat purchases — the same
  // (customer, part) bought in consecutive years with the later year's
  // spend at least double — a self-join of year-grain pre-aggregates on
  // the composite key.
  private val q64RepeatPurchase: Q = (s, dir) => {
    val lo = load(s, dir, "lineitem")
      .join(load(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
    def yearSpend(y: Int, alias: String) =
      lo.filter(year(col("o_orderdate")) === y)
        .groupBy(col("o_custkey").as(alias + "_ck"), col("l_partkey").as(alias + "_pk"))
        .agg(dbl(sum(dec(col("l_extendedprice")))).as(alias))
    yearSpend(1995, "spend1")
      .join(yearSpend(1996, "spend2"),
        col("spend1_ck") === col("spend2_ck") && col("spend1_pk") === col("spend2_pk"))
      .filter(col("spend2") > col("spend1") * 2.0)
      .select(col("spend1_ck").as("custkey"), col("spend1_pk").as("partkey"),
        col("spend1"), col("spend2"))
      .orderBy(col("custkey"), col("partkey"))
      .limit(100)
  }

  private val q64RepeatPurchaseSql =
    """WITH s1 AS (
      |  SELECT o_custkey AS ck, l_partkey AS pk,
      |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS spend1
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |  WHERE EXTRACT(YEAR FROM o_orderdate) = 1995 GROUP BY 1, 2),
      |s2 AS (
      |  SELECT o_custkey AS ck, l_partkey AS pk,
      |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS spend2
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |  WHERE EXTRACT(YEAR FROM o_orderdate) = 1996 GROUP BY 1, 2)
      |SELECT s1.ck AS custkey, s1.pk AS partkey, spend1, spend2
      |FROM s1 JOIN s2 ON s1.ck = s2.ck AND s1.pk = s2.pk
      |WHERE spend2 > spend1 * 2.0
      |ORDER BY custkey, partkey
      |LIMIT 100""".stripMargin

  // DS q70 shape (q70.sql): ROLLUP(nation, segment) revenue restricted
  // to the top-5 nations chosen by a RANK window in a subquery, with a
  // second rank within each hierarchy level. The rank-for-top-5 runs
  // over the 25-row nation aggregate (single-partition window on
  // pre-aggregated data — intentional and bounded).
  private val q70TopNationRollup: Q = (s, dir) => {
    val base = load(s, dir, "lineitem")
      .join(load(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .join(load(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
      .join(load(s, dir, "nation"), col("c_nationkey") === col("n_nationkey"))
    val top = base.groupBy(col("n_name").as("tn"))
      .agg(sum(revenue(col("l_extendedprice"), col("l_discount"))).as("r"))
      .withColumn("rk", rank().over(
        Window.orderBy(col("r").desc, col("tn"))))
      .filter(col("rk") <= 5).select(col("tn"))
    base.join(top, col("n_name") === col("tn"), "left_semi")
      .rollup(col("n_name"), col("c_mktsegment"))
      .agg(dbl(sum(revenue(col("l_extendedprice"), col("l_discount")))).as("total_rev"),
        (grouping(col("n_name")) + grouping(col("c_mktsegment"))).cast("int")
          .as("lochierarchy"))
      .withColumn("rank_in_level", rank().over(
        Window.partitionBy(col("lochierarchy"))
          .orderBy(col("total_rev").desc,
            col("n_name").asc_nulls_first, col("c_mktsegment").asc_nulls_first)))
      .orderBy(col("lochierarchy").desc,
        col("n_name").asc_nulls_first, col("c_mktsegment").asc_nulls_first)
  }

  private val q70TopNationRollupSql =
    s"""WITH base AS (
      |  SELECT n_name, c_mktsegment, $rev AS r
      |  FROM lineitem
      |  JOIN orders ON l_orderkey = o_orderkey
      |  JOIN customer ON o_custkey = c_custkey
      |  JOIN nation ON c_nationkey = n_nationkey),
      |top AS (
      |  SELECT tn FROM (
      |    SELECT n_name AS tn, RANK() OVER (ORDER BY SUM(r) DESC, n_name) AS rk
      |    FROM base GROUP BY n_name)
      |  WHERE rk <= 5)
      |SELECT n_name, c_mktsegment, CAST(SUM(r) AS DOUBLE) AS total_rev,
      |  CAST(GROUPING(n_name) + GROUPING(c_mktsegment) AS INTEGER) AS lochierarchy,
      |  CAST(RANK() OVER (
      |    PARTITION BY GROUPING(n_name) + GROUPING(c_mktsegment)
      |    ORDER BY CAST(SUM(r) AS DOUBLE) DESC, n_name NULLS FIRST, c_mktsegment NULLS FIRST)
      |    AS INTEGER) AS rank_in_level
      |FROM base
      |WHERE n_name IN (SELECT tn FROM top)
      |GROUP BY ROLLUP(n_name, c_mktsegment)
      |ORDER BY lochierarchy DESC, n_name NULLS FIRST, c_mktsegment NULLS FIRST""".stripMargin

  // DS q76 shape (q76.sql): UNION ALL of per-channel slices selected by
  // an IS NULL test (here NULLIF-derived so the synthetic no-null
  // schema still exercises the null-predicate grammar), counted and
  // summed per (channel, flagged column, year).
  private val q76NullChannels: Q = (s, dir) => {
    val li = load(s, dir, "lineitem")
    def leg(channel: String, colName: String, nullWhen: String) =
      li.filter(expr(s"nullif($colName, '$nullWhen') IS NULL"))
        .select(lit(channel).as("channel"), lit(colName).as("col_name"),
          year(col("l_shipdate")).as("yr"), col("l_extendedprice"))
    leg("store", "l_returnflag", "R")
      .unionAll(leg("web", "l_linestatus", "O"))
      .unionAll(leg("catalog", "l_returnflag", "A"))
      .groupBy(col("channel"), col("col_name"), col("yr"))
      .agg(count(lit(1)).as("sales_cnt"),
        dbl(sum(dec(col("l_extendedprice")))).as("sales_amt"))
      .orderBy(col("channel"), col("col_name"), col("yr"))
  }

  private val q76NullChannelsSql =
    """SELECT channel, col_name, yr, COUNT(*) AS sales_cnt,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sales_amt
      |FROM (
      |  SELECT 'store' AS channel, 'l_returnflag' AS col_name,
      |    CAST(EXTRACT(YEAR FROM l_shipdate) AS INTEGER) AS yr, l_extendedprice
      |  FROM lineitem WHERE NULLIF(l_returnflag, 'R') IS NULL
      |  UNION ALL
      |  SELECT 'web', 'l_linestatus',
      |    CAST(EXTRACT(YEAR FROM l_shipdate) AS INTEGER), l_extendedprice
      |  FROM lineitem WHERE NULLIF(l_linestatus, 'O') IS NULL
      |  UNION ALL
      |  SELECT 'catalog', 'l_returnflag',
      |    CAST(EXTRACT(YEAR FROM l_shipdate) AS INTEGER), l_extendedprice
      |  FROM lineitem WHERE NULLIF(l_returnflag, 'A') IS NULL)
      |GROUP BY channel, col_name, yr
      |ORDER BY channel, col_name, yr""".stripMargin

  // DS q84 shape (q84.sql): the pure dimension lookup chain — customer
  // → nation → region with a numeric band filter and a concatenated
  // display column, ordered and limited (no fact table at all).
  private val q84CustomerLocation: Q = (s, dir) =>
    load(s, dir, "customer")
      .filter(dbl(col("c_acctbal")).between(500.0, 1500.0))
      .join(load(s, dir, "nation"), col("c_nationkey") === col("n_nationkey"))
      .join(load(s, dir, "region"), col("n_regionkey") === col("r_regionkey"))
      .filter(col("r_name") === "EUROPE")
      .select(col("c_custkey").as("customer_id"),
        concat(col("c_name"), lit(", "), col("n_name")).as("customer_name"))
      .orderBy(col("customer_id"))
      .limit(100)

  private val q84CustomerLocationSql =
    """SELECT c_custkey AS customer_id, c_name || ', ' || n_name AS customer_name
      |FROM customer
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |WHERE CAST(c_acctbal AS DOUBLE) BETWEEN 500.0 AND 1500.0
      |  AND r_name = 'EUROPE'
      |ORDER BY customer_id
      |LIMIT 100""".stripMargin

  // DS q85 shape (q85.sql): returned-line averages grouped by the
  // reason analog under paired disjunctive bands (segment × order
  // value), the returns-side variant of the q13 grammar.
  private val q85ReturnReasons: Q = (s, dir) =>
    load(s, dir, "lineitem").filter(col("l_returnflag") === "R")
      .join(load(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .join(load(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
      .filter(
        (col("c_mktsegment") === "FURNITURE" &&
          dbl(col("o_totalprice")).between(50000.0, 200000.0)) ||
        (col("c_mktsegment") === "HOUSEHOLD" &&
          dbl(col("o_totalprice")).between(100000.0, 300000.0)) ||
        (col("c_mktsegment") === "AUTOMOBILE" &&
          dbl(col("o_totalprice")).between(150000.0, 400000.0)))
      .groupBy(col("l_linestatus"))
      .agg(
        (dbl(sum(dec(col("l_quantity")))) / count(lit(1))).as("avg_qty"),
        (dbl(sum(rate(col("l_discount")))) / count(lit(1))).as("avg_disc"),
        (dbl(sum(rate(col("l_tax")))) / count(lit(1))).as("avg_tax"))
      .orderBy(col("l_linestatus"))
      .limit(100)

  private val q85ReturnReasonsSql =
    """SELECT l_linestatus,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
      |  CAST(SUM(CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) / COUNT(*) AS avg_disc,
      |  CAST(SUM(CAST(l_tax AS DECIMAL(4,2))) AS DOUBLE) / COUNT(*) AS avg_tax
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |WHERE l_returnflag = 'R'
      |  AND ((c_mktsegment = 'FURNITURE' AND CAST(o_totalprice AS DOUBLE) BETWEEN 50000.0 AND 200000.0)
      |    OR (c_mktsegment = 'HOUSEHOLD' AND CAST(o_totalprice AS DOUBLE) BETWEEN 100000.0 AND 300000.0)
      |    OR (c_mktsegment = 'AUTOMOBILE' AND CAST(o_totalprice AS DOUBLE) BETWEEN 150000.0 AND 400000.0))
      |GROUP BY l_linestatus
      |ORDER BY l_linestatus
      |LIMIT 100""".stripMargin

  // DS q11/q74 shape (q11.sql): customers whose growth ratio in one
  // channel beats their growth ratio in another — four year×channel
  // pre-aggregates self-joined on the customer key, ratio-compared.
  private val q11ChannelGrowthCompare: Q = (s, dir) => {
    val li = load(s, dir, "lineitem")
      .join(load(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
    def spend(ch: String, yr: Int, alias: String) =
      li.filter(channelClass === ch && year(col("o_orderdate")) === yr)
        .groupBy(col("o_custkey").as(alias + "_ck"))
        .agg(dbl(sum(revenue(col("l_extendedprice"), col("l_discount")))).as(alias))
    spend("air", 1995, "a1")
      .join(spend("air", 1996, "a2"), col("a1_ck") === col("a2_ck"))
      .join(spend("land", 1995, "l1"), col("a1_ck") === col("l1_ck"))
      .join(spend("land", 1996, "l2"), col("a1_ck") === col("l2_ck"))
      .filter(col("a1") > 0.0 && col("l1") > 0.0 &&
        col("a2") / col("a1") > col("l2") / col("l1"))
      .select(col("a1_ck").as("custkey"),
        round(col("a2") / col("a1"), 6).as("air_growth"),
        round(col("l2") / col("l1"), 6).as("land_growth"))
      .orderBy(col("custkey"))
      .limit(100)
  }

  private val q11ChannelGrowthCompareSql =
    s"""WITH j AS (SELECT o_custkey, l_linenumber, l_extendedprice, l_discount,
      |    EXTRACT(YEAR FROM o_orderdate) AS yr
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
      |a1 AS (SELECT o_custkey AS ck, CAST(SUM($rev) AS DOUBLE) AS a1 FROM j
      |  WHERE $channelClassSql = 'air' AND yr = 1995 GROUP BY 1),
      |a2 AS (SELECT o_custkey AS ck, CAST(SUM($rev) AS DOUBLE) AS a2 FROM j
      |  WHERE $channelClassSql = 'air' AND yr = 1996 GROUP BY 1),
      |l1 AS (SELECT o_custkey AS ck, CAST(SUM($rev) AS DOUBLE) AS l1 FROM j
      |  WHERE $channelClassSql = 'land' AND yr = 1995 GROUP BY 1),
      |l2 AS (SELECT o_custkey AS ck, CAST(SUM($rev) AS DOUBLE) AS l2 FROM j
      |  WHERE $channelClassSql = 'land' AND yr = 1996 GROUP BY 1)
      |SELECT a1.ck AS custkey, round(a2 / a1, 6) AS air_growth,
      |  round(l2 / l1, 6) AS land_growth
      |FROM a1 JOIN a2 ON a1.ck = a2.ck JOIN l1 ON a1.ck = l1.ck JOIN l2 ON a1.ck = l2.ck
      |WHERE a1 > 0.0 AND l1 > 0.0 AND a2 / a1 > l2 / l1
      |ORDER BY custkey
      |LIMIT 100""".stripMargin

  // DS q27 shape (q27.sql): averages over ROLLUP of the geography
  // hierarchy (region, nation) under a demographic filter — the
  // geo-level variant of the q18 report.
  private val q27GeoRollup: Q = (s, dir) =>
    load(s, dir, "lineitem")
      .join(load(s, dir, "orders").filter(year(col("o_orderdate")) === 1995),
        col("l_orderkey") === col("o_orderkey"))
      .join(load(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING"),
        col("o_custkey") === col("c_custkey"))
      .join(load(s, dir, "nation"), col("c_nationkey") === col("n_nationkey"))
      .join(load(s, dir, "region"), col("n_regionkey") === col("r_regionkey"))
      .rollup(col("r_name"), col("n_name"))
      .agg(
        (dbl(sum(dec(col("l_quantity")))) / count(lit(1))).as("avg_qty"),
        (dbl(sum(dec(col("l_extendedprice")))) / count(lit(1))).as("avg_price"),
        (dbl(sum(rate(col("l_discount")))) / count(lit(1))).as("avg_disc"))
      .orderBy(col("r_name").asc_nulls_first, col("n_name").asc_nulls_first)
      .limit(110)

  private val q27GeoRollupSql =
    """SELECT r_name, n_name,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_price,
      |  CAST(SUM(CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) / COUNT(*) AS avg_disc
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |WHERE EXTRACT(YEAR FROM o_orderdate) = 1995 AND c_mktsegment = 'BUILDING'
      |GROUP BY ROLLUP(r_name, n_name)
      |ORDER BY r_name NULLS FIRST, n_name NULLS FIRST
      |LIMIT 110""".stripMargin

  // DS q69 shape (q69.sql): profile counts for customers active in one
  // channel window with NO activity in another (EXISTS ∧ NOT EXISTS at
  // the customer grain — semi then anti join on distinct key sets).
  private val q69ActiveNoReturns: Q = (s, dir) => {
    val orders = load(s, dir, "orders")
    val active = orders.filter(year(col("o_orderdate")) === 1996)
      .select(col("o_custkey")).distinct()
    val returned = load(s, dir, "lineitem")
      .filter(col("l_returnflag") === "R" && year(col("l_shipdate")) === 1996)
      .join(orders.select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey")).distinct()
    load(s, dir, "customer")
      .join(active, col("c_custkey") === active("o_custkey"), "left_semi")
      .join(returned, col("c_custkey") === returned("o_custkey"), "left_anti")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("cnt"),
        countDistinct(col("c_nationkey")).as("n_nations"),
        (dbl(sum(dec(col("c_acctbal")))) / count(lit(1))).as("avg_bal"))
      .orderBy(col("c_mktsegment"))
  }

  private val q69ActiveNoReturnsSql =
    """SELECT c_mktsegment, COUNT(*) AS cnt,
      |  COUNT(DISTINCT c_nationkey) AS n_nations,
      |  CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_bal
      |FROM customer
      |WHERE c_custkey IN (
      |    SELECT o_custkey FROM orders WHERE EXTRACT(YEAR FROM o_orderdate) = 1996)
      |  AND c_custkey NOT IN (
      |    SELECT o_custkey FROM orders JOIN lineitem ON l_orderkey = o_orderkey
      |    WHERE l_returnflag = 'R' AND EXTRACT(YEAR FROM l_shipdate) = 1996)
      |GROUP BY 1 ORDER BY 1""".stripMargin

  // DS q25 shape (q25.sql): the q29 chain aggregated to the supplier
  // nation grain with net-profit sums instead of quantities (sale →
  // return → repurchase, profit-weighted).
  private val q25ProfitChain: Q = (s, dir) => {
    val li = load(s, dir, "lineitem")
      .join(load(s, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
      .join(load(s, dir, "nation"), col("s_nationkey") === col("n_nationkey"))
    def profit(flag: String, yr: Int, alias: String) =
      li.filter(col("l_returnflag") === flag && year(col("l_shipdate")) === yr)
        .groupBy(col("n_name").as(alias + "_n"))
        .agg(dbl(sum(revenue(col("l_extendedprice"), col("l_discount")))).as(alias))
    profit("N", 1995, "sold_profit")
      .join(profit("R", 1995, "ret_amount"), col("sold_profit_n") === col("ret_amount_n"))
      .join(profit("N", 1996, "resold_profit"), col("sold_profit_n") === col("resold_profit_n"))
      .select(col("sold_profit_n").as("nation"),
        col("sold_profit"), col("ret_amount"), col("resold_profit"))
      .orderBy(col("nation"))
      .limit(100)
  }

  private val q25ProfitChainSql =
    s"""WITH j AS (
      |  SELECT n_name, l_returnflag, l_shipdate, l_extendedprice, l_discount
      |  FROM lineitem
      |  JOIN supplier ON l_suppkey = s_suppkey
      |  JOIN nation ON s_nationkey = n_nationkey),
      |sold AS (SELECT n_name, CAST(SUM($rev) AS DOUBLE) AS sold_profit FROM j
      |  WHERE l_returnflag = 'N' AND EXTRACT(YEAR FROM l_shipdate) = 1995 GROUP BY 1),
      |ret AS (SELECT n_name, CAST(SUM($rev) AS DOUBLE) AS ret_amount FROM j
      |  WHERE l_returnflag = 'R' AND EXTRACT(YEAR FROM l_shipdate) = 1995 GROUP BY 1),
      |resold AS (SELECT n_name, CAST(SUM($rev) AS DOUBLE) AS resold_profit FROM j
      |  WHERE l_returnflag = 'N' AND EXTRACT(YEAR FROM l_shipdate) = 1996 GROUP BY 1)
      |SELECT sold.n_name AS nation, sold_profit, ret_amount, resold_profit
      |FROM sold JOIN ret ON sold.n_name = ret.n_name
      |JOIN resold ON sold.n_name = resold.n_name
      |ORDER BY nation
      |LIMIT 100""".stripMargin

  // DS q37 shape (q37.sql): item listing filtered by a price band AND
  // an aggregate stock band AND recent-order membership — the
  // inventory-window item report (price stats per qualifying item).
  private val q37InventoryWindow: Q = (s, dir) => {
    val li = load(s, dir, "lineitem")
    val stocked = li.groupBy(col("l_partkey").as("st_pk"))
      .agg(dbl(sum(dec(col("l_quantity")))).as("stock"))
      .filter(col("stock").between(100.0, 500.0))
      .select(col("st_pk"))
    val ordered = li.filter(col("l_shipdate") >= lit("1996-01-01") &&
        col("l_shipdate") < lit("1996-03-01"))
      .select(col("l_partkey")).distinct()
    load(s, dir, "part")
      .filter(dbl(col("p_retailprice")).between(800.0, 1100.0))
      .join(stocked, col("p_partkey") === col("st_pk"), "left_semi")
      .join(ordered, col("p_partkey") === col("l_partkey"), "left_semi")
      .groupBy(col("p_brand"))
      .agg(count(lit(1)).as("n_items"),
        (dbl(sum(dec(col("p_retailprice")))) / count(lit(1))).as("avg_price"))
      .orderBy(col("p_brand"))
      .limit(100)
  }

  private val q37InventoryWindowSql =
    """SELECT p_brand, COUNT(*) AS n_items,
      |  CAST(SUM(CAST(p_retailprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_price
      |FROM part
      |WHERE CAST(p_retailprice AS DOUBLE) BETWEEN 800.0 AND 1100.0
      |  AND p_partkey IN (
      |    SELECT l_partkey FROM lineitem GROUP BY l_partkey
      |    HAVING CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) BETWEEN 100.0 AND 500.0)
      |  AND p_partkey IN (
      |    SELECT l_partkey FROM lineitem
      |    WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-03-01')
      |GROUP BY p_brand
      |ORDER BY p_brand
      |LIMIT 100""".stripMargin

  // DS q46 shape (q46.sql): order-grain trip report for customers
  // served by out-of-nation suppliers — per-order revenue and item
  // count, customer-ordered (the "bought in another city" trip).
  private val q46CrossNationTrips: Q = (s, dir) =>
    load(s, dir, "lineitem")
      .join(load(s, dir, "orders").filter(year(col("o_orderdate")) === 1996),
        col("l_orderkey") === col("o_orderkey"))
      .join(load(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
      .join(load(s, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
      .filter(col("c_nationkey") =!= col("s_nationkey"))
      .groupBy(col("c_custkey"), col("o_orderkey"))
      .agg(dbl(sum(revenue(col("l_extendedprice"), col("l_discount")))).as("trip_rev"),
        count(lit(1)).as("n_items"))
      .filter(col("trip_rev") > 300000.0)
      .orderBy(col("c_custkey"), col("o_orderkey"))
      .limit(100)

  private val q46CrossNationTripsSql =
    s"""SELECT c_custkey, o_orderkey, CAST(SUM($rev) AS DOUBLE) AS trip_rev,
      |  COUNT(*) AS n_items
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN supplier ON l_suppkey = s_suppkey
      |WHERE EXTRACT(YEAR FROM o_orderdate) = 1996 AND c_nationkey <> s_nationkey
      |GROUP BY c_custkey, o_orderkey
      |HAVING CAST(SUM($rev) AS DOUBLE) > 300000.0
      |ORDER BY c_custkey, o_orderkey
      |LIMIT 100""".stripMargin

  // DS q50 shape (q50.sql): return-latency day-bucket pivot — days
  // between order date and the returned line's ship date, counted into
  // ≤30/31-60/61-90/91-120/>120 buckets per supplier nation.
  private val q50ReturnLatency: Q = (s, dir) => {
    val lag = datediff(col("l_shipdate"), col("o_orderdate"))
    load(s, dir, "lineitem").filter(col("l_returnflag") === "R")
      .join(load(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .join(load(s, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
      .join(load(s, dir, "nation"), col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(
        sum(when(lag <= 30, 1).otherwise(0)).as("d30"),
        sum(when(lag > 30 && lag <= 60, 1).otherwise(0)).as("d60"),
        sum(when(lag > 60 && lag <= 90, 1).otherwise(0)).as("d90"),
        sum(when(lag > 90 && lag <= 120, 1).otherwise(0)).as("d120"),
        sum(when(lag > 120, 1).otherwise(0)).as("d_more"))
      .orderBy(col("n_name"))
  }

  private val q50ReturnLatencySql =
    """SELECT n_name,
      |  CAST(SUM(CASE WHEN date_diff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE)) <= 30 THEN 1 ELSE 0 END) AS BIGINT) AS d30,
      |  CAST(SUM(CASE WHEN date_diff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE)) > 30
      |       AND date_diff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE)) <= 60 THEN 1 ELSE 0 END) AS BIGINT) AS d60,
      |  CAST(SUM(CASE WHEN date_diff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE)) > 60
      |       AND date_diff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE)) <= 90 THEN 1 ELSE 0 END) AS BIGINT) AS d90,
      |  CAST(SUM(CASE WHEN date_diff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE)) > 90
      |       AND date_diff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE)) <= 120 THEN 1 ELSE 0 END) AS BIGINT) AS d120,
      |  CAST(SUM(CASE WHEN date_diff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE)) > 120 THEN 1 ELSE 0 END) AS BIGINT) AS d_more
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN nation ON s_nationkey = n_nationkey
      |WHERE l_returnflag = 'R'
      |GROUP BY n_name
      |ORDER BY n_name""".stripMargin

  // DS q56 shape (q56.sql): three channel legs UNION ALL'd then
  // re-aggregated per item, for an item list chosen by a literal
  // attribute filter (the by-item cross-channel total).
  private val q56ItemChannelUnion: Q = (s, dir) => {
    val li = load(s, dir, "lineitem")
      .join(load(s, dir, "part").filter(col("p_size").isin(1, 4, 7)),
        col("l_partkey") === col("p_partkey"))
    def chanLeg(ch: String) =
      li.filter(channelClass === ch)
        .groupBy(col("p_brand"))
        .agg(sum(revenue(col("l_extendedprice"), col("l_discount"))).as("total_sales"))
    chanLeg("air").unionAll(chanLeg("sea")).unionAll(chanLeg("land"))
      .groupBy(col("p_brand"))
      .agg(dbl(sum(col("total_sales"))).as("total_sales"))
      .orderBy(col("total_sales").desc, col("p_brand"))
      .limit(100)
  }

  private val q56ItemChannelUnionSql =
    s"""WITH j AS (
      |  SELECT p_brand, l_linenumber, l_extendedprice, l_discount FROM lineitem
      |  JOIN part ON l_partkey = p_partkey WHERE p_size IN (1, 4, 7)),
      |legs AS (
      |  SELECT p_brand, SUM($rev) AS total_sales FROM j WHERE $channelClassSql = 'air' GROUP BY 1
      |  UNION ALL
      |  SELECT p_brand, SUM($rev) FROM j WHERE $channelClassSql = 'sea' GROUP BY 1
      |  UNION ALL
      |  SELECT p_brand, SUM($rev) FROM j WHERE $channelClassSql = 'land' GROUP BY 1)
      |SELECT p_brand, CAST(SUM(total_sales) AS DOUBLE) AS total_sales
      |FROM legs GROUP BY p_brand
      |ORDER BY total_sales DESC, p_brand
      |LIMIT 100""".stripMargin

  // DS q62 shape (q62.sql): shipping-latency buckets by channel — the
  // q50 bucket grammar keyed by ship channel and order year instead of
  // geography.
  private val q62ShipLatency: Q = (s, dir) => {
    val lag = datediff(col("l_shipdate"), col("o_orderdate"))
    load(s, dir, "lineitem")
      .join(load(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .withColumn("channel", channelClass)
      .groupBy(col("channel"), year(col("o_orderdate")).as("yr"))
      .agg(
        sum(when(lag <= 45, 1).otherwise(0)).as("fast"),
        sum(when(lag > 45 && lag <= 90, 1).otherwise(0)).as("mid"),
        sum(when(lag > 90, 1).otherwise(0)).as("slow"))
      .orderBy(col("channel"), col("yr"))
  }

  private val q62ShipLatencySql =
    s"""SELECT $channelClassSql AS channel,
      |  CAST(EXTRACT(YEAR FROM o_orderdate) AS INTEGER) AS yr,
      |  CAST(SUM(CASE WHEN date_diff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE)) <= 45 THEN 1 ELSE 0 END) AS BIGINT) AS fast,
      |  CAST(SUM(CASE WHEN date_diff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE)) > 45
      |       AND date_diff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE)) <= 90 THEN 1 ELSE 0 END) AS BIGINT) AS mid,
      |  CAST(SUM(CASE WHEN date_diff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE)) > 90 THEN 1 ELSE 0 END) AS BIGINT) AS slow
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY 1, 2
      |ORDER BY channel, yr""".stripMargin

  // DS q91 shape (q91.sql): returned amount per calendar month under a
  // demographic disjunction (segment pair OR balance band) — the
  // call-center monthly returns report.
  private val q91MonthlyReturns: Q = (s, dir) =>
    load(s, dir, "lineitem").filter(col("l_returnflag") === "R")
      .join(load(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .join(load(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
      .filter(col("c_mktsegment").isin("MACHINERY", "HOUSEHOLD") ||
        dbl(col("c_acctbal")) < 0.0)
      .groupBy(year(col("o_orderdate")).as("yr"), month(col("o_orderdate")).as("moy"))
      .agg(dbl(sum(revenue(col("l_extendedprice"), col("l_discount")))).as("returns_amt"))
      .orderBy(col("yr"), col("moy"))

  private val q91MonthlyReturnsSql =
    s"""SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS INTEGER) AS yr,
      |  CAST(EXTRACT(MONTH FROM o_orderdate) AS INTEGER) AS moy,
      |  CAST(SUM($rev) AS DOUBLE) AS returns_amt
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |WHERE l_returnflag = 'R'
      |  AND (c_mktsegment IN ('MACHINERY','HOUSEHOLD') OR CAST(c_acctbal AS DOUBLE) < 0.0)
      |GROUP BY 1, 2
      |ORDER BY yr, moy""".stripMargin

  // DS q40 shape (q40.sql): net-of-returns sales before vs after a
  // pivot date (returned lines contribute negatively — the
  // catalog_returns refund subtraction) per supplier nation.
  private val q40NetBeforeAfter: Q = (s, dir) => {
    val net = when(col("l_returnflag") === "R",
      -revenue(col("l_extendedprice"), col("l_discount")))
      .otherwise(revenue(col("l_extendedprice"), col("l_discount")))
    load(s, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1995-11-01") &&
        col("l_shipdate") < lit("1996-03-01"))
      .join(load(s, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
      .join(load(s, dir, "nation"), col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(
        coalesce(dbl(sum(when(col("l_shipdate") < lit("1996-01-01"), net))), lit(0.0))
          .as("sales_before"),
        coalesce(dbl(sum(when(col("l_shipdate") >= lit("1996-01-01"), net))), lit(0.0))
          .as("sales_after"))
      .orderBy(col("n_name"))
  }

  private val q40NetBeforeAfterSql =
    s"""SELECT n_name,
      |  COALESCE(CAST(SUM(CASE WHEN l_shipdate < TIMESTAMP '1996-01-01'
      |    THEN (CASE WHEN l_returnflag = 'R' THEN -($rev) ELSE $rev END) END) AS DOUBLE), 0.0) AS sales_before,
      |  COALESCE(CAST(SUM(CASE WHEN l_shipdate >= TIMESTAMP '1996-01-01'
      |    THEN (CASE WHEN l_returnflag = 'R' THEN -($rev) ELSE $rev END) END) AS DOUBLE), 0.0) AS sales_after
      |FROM lineitem
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN nation ON s_nationkey = n_nationkey
      |WHERE l_shipdate >= TIMESTAMP '1995-11-01' AND l_shipdate < TIMESTAMP '1996-03-01'
      |GROUP BY n_name
      |ORDER BY n_name""".stripMargin

  // DS q71 shape (q71.sql): hour-of-day revenue breakdown across three
  // UNION ALL'd source legs re-aggregated on the (type, hour) grain —
  // the time-of-day union report, over the intraday events table.
  private val q71HourUnion: Q = (s, dir) => {
    val ev = load(s, dir, "events")
    def srcLeg(m: Int) =
      ev.filter(pmod(col("user_id"), lit(3)) === m)
        .select(col("event_type"), hour(col("ts")).as("hr"),
          dec(col("value")).as("v"))
    srcLeg(0).unionAll(srcLeg(1)).unionAll(srcLeg(2))
      .groupBy(col("event_type"), col("hr"))
      .agg(dbl(sum(col("v"))).as("amount"), count(lit(1)).as("n"))
      .orderBy(col("event_type"), col("hr"))
  }

  private val q71HourUnionSql =
    """SELECT event_type, hr, CAST(SUM(v) AS DOUBLE) AS amount, COUNT(*) AS n
      |FROM (
      |  SELECT event_type, CAST(EXTRACT(HOUR FROM ts) AS INTEGER) AS hr,
      |    CAST(value AS DECIMAL(12,2)) AS v
      |  FROM events WHERE user_id % 3 = 0
      |  UNION ALL
      |  SELECT event_type, CAST(EXTRACT(HOUR FROM ts) AS INTEGER),
      |    CAST(value AS DECIMAL(12,2))
      |  FROM events WHERE user_id % 3 = 1
      |  UNION ALL
      |  SELECT event_type, CAST(EXTRACT(HOUR FROM ts) AS INTEGER),
      |    CAST(value AS DECIMAL(12,2))
      |  FROM events WHERE user_id % 3 = 2)
      |GROUP BY event_type, hr
      |ORDER BY event_type, hr""".stripMargin

  // DS q83 shape (q83.sql): returns counted only on the dates where
  // ALL three channels saw returns — a double INTERSECT over date sets
  // feeding a semi join, then an item-grain count.
  private val q83CommonReturnDates: Q = (s, dir) => {
    val li = load(s, dir, "lineitem").filter(col("l_returnflag") === "R")
    def dates(ch: String) =
      li.filter(channelClass === ch).select(col("l_shipdate").as("d")).distinct()
    val common = dates("air").intersect(dates("sea")).intersect(dates("land"))
    li.join(common, col("l_shipdate") === col("d"), "left_semi")
      .join(load(s, dir, "part"), col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"))
      .agg(count(lit(1)).as("n_returns"),
        dbl(sum(dec(col("l_quantity")))).as("ret_qty"))
      .orderBy(col("p_brand"))
      .limit(100)
  }

  private val q83CommonReturnDatesSql =
    s"""WITH r AS (SELECT * FROM lineitem WHERE l_returnflag = 'R'),
      |common AS (
      |  SELECT l_shipdate AS d FROM r WHERE $channelClassSql = 'air'
      |  INTERSECT
      |  SELECT l_shipdate FROM r WHERE $channelClassSql = 'sea'
      |  INTERSECT
      |  SELECT l_shipdate FROM r WHERE $channelClassSql = 'land')
      |SELECT p_brand, COUNT(*) AS n_returns,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS ret_qty
      |FROM r JOIN part ON l_partkey = p_partkey
      |WHERE l_shipdate IN (SELECT d FROM common)
      |GROUP BY p_brand
      |ORDER BY p_brand
      |LIMIT 100""".stripMargin

  // DS q96 shape (q96.sql): the one-row slice count — a COUNT(*) under
  // a three-dimension conjunction (channel band × priority × quantity
  // band), the simplest star-join grammar in the corpus.
  private val q96SliceCount: Q = (s, dir) =>
    load(s, dir, "lineitem")
      .filter(channelClass === "air" && dec(col("l_quantity")).between(5, 25))
      .join(load(s, dir, "orders").filter(col("o_orderpriority") === "1-URGENT"),
        col("l_orderkey") === col("o_orderkey"))
      .agg(count(lit(1)).as("cnt"))

  private val q96SliceCountSql =
    s"""SELECT COUNT(*) AS cnt
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |WHERE $channelClassSql = 'air'
      |  AND CAST(l_quantity AS DECIMAL(12,2)) BETWEEN 5 AND 25
      |  AND o_orderpriority = '1-URGENT'""".stripMargin

  // DS q72 shape (q72.sql): fact-to-fact join on a derived date key —
  // each sold line probes the aggregated per-(part, day) stock exactly
  // 7 days after its ship date and reports shortage candidates (the
  // catalog_sales × inventory promise-date join). The join key is
  // (partkey, date+7) — an equi join after the date arithmetic, so it
  // shuffles once on the composite key at any scale.
  private val q72PromiseDateStock: Q = (s, dir) => {
    val li = load(s, dir, "lineitem")
    val inv = li.groupBy(col("l_partkey").as("inv_pk"), col("l_shipdate").as("inv_d"))
      .agg(dbl(sum(dec(col("l_quantity")))).as("inv_qty"))
    li.filter(year(col("l_shipdate")) === 1996)
      // both sides normalized to DATE: the oracle compares DATE to DATE,
      // and raw timestamps would only match while fixtures stay
      // midnight-aligned — an intra-day ship time must not desync them
      .join(inv, col("l_partkey") === col("inv_pk") &&
        date_add(to_date(col("l_shipdate")), 7) === to_date(col("inv_d")))
      .filter(col("inv_qty") < dbl(dec(col("l_quantity"))) * 5.0)
      .join(load(s, dir, "part"), col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"))
      .agg(count(lit(1)).as("shortage_events"))
      .orderBy(col("p_brand"))
      .limit(100)
  }

  private val q72PromiseDateStockSql =
    """WITH inv AS (
      |  SELECT l_partkey AS inv_pk, l_shipdate AS inv_d,
      |    CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS inv_qty
      |  FROM lineitem GROUP BY 1, 2)
      |SELECT p_brand, COUNT(*) AS shortage_events
      |FROM lineitem
      |JOIN inv ON l_partkey = inv_pk
      |  AND CAST(l_shipdate AS DATE) + INTERVAL 7 DAY = CAST(inv_d AS DATE)
      |JOIN part ON l_partkey = p_partkey
      |WHERE EXTRACT(YEAR FROM l_shipdate) = 1996
      |  AND inv_qty < CAST(CAST(l_quantity AS DECIMAL(12,2)) AS DOUBLE) * 5.0
      |GROUP BY p_brand
      |ORDER BY p_brand
      |LIMIT 100""".stripMargin

  // DS q12 shape (q12.sql): the q98 revenue-share grammar bound to a
  // 30-day ship window (web binding) — share of brand within type over
  // a short horizon.
  private val q12WindowShare: Q = (s, dir) => {
    val rev = load(s, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1996-05-01") &&
        col("l_shipdate") < lit("1996-05-31"))
      .join(load(s, dir, "part"), col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_type"), col("p_brand"))
      .agg(sum(dec(col("l_extendedprice"))).as("rev_dec"))
    val w = Window.partitionBy(col("p_type"))
    rev.select(col("p_type"), col("p_brand"), dbl(col("rev_dec")).as("revenue"),
        round(dbl(col("rev_dec")) * 100.0 /
          sum(col("rev_dec")).over(w).cast("double"), 6).as("revshare"))
      .orderBy(col("p_type"), col("p_brand"))
  }

  private val q12WindowShareSql =
    """WITH rev AS (
      |  SELECT p_type, p_brand, SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS rev_dec
      |  FROM lineitem JOIN part ON l_partkey = p_partkey
      |  WHERE l_shipdate >= TIMESTAMP '1996-05-01' AND l_shipdate < TIMESTAMP '1996-05-31'
      |  GROUP BY 1, 2)
      |SELECT p_type, p_brand, CAST(rev_dec AS DOUBLE) AS revenue,
      |  round(CAST(rev_dec AS DOUBLE) * 100.0 /
      |    CAST(SUM(rev_dec) OVER (PARTITION BY p_type) AS DOUBLE), 6) AS revshare
      |FROM rev
      |ORDER BY p_type, p_brand""".stripMargin

  // DS q20 shape (q20.sql): the catalog binding of the share grammar —
  // quarterly share with an item count per group.
  private val q20QuarterShare: Q = (s, dir) => {
    val rev = load(s, dir, "lineitem")
      .filter(year(col("l_shipdate")) === 1995 && quarter(col("l_shipdate")) === 2)
      .join(load(s, dir, "part"), col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_type"))
      .agg(sum(dec(col("l_extendedprice"))).as("rev_dec"),
        countDistinct(col("p_partkey")).as("n_items"))
    val w = Window.partitionBy(lit(1))
    rev.select(col("p_type"), col("n_items"), dbl(col("rev_dec")).as("itemrevenue"),
        round(dbl(col("rev_dec")) * 100.0 /
          sum(col("rev_dec")).over(w).cast("double"), 6).as("revshare"))
      .orderBy(col("p_type"))
  }

  private val q20QuarterShareSql =
    """WITH rev AS (
      |  SELECT p_type, SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS rev_dec,
      |    COUNT(DISTINCT p_partkey) AS n_items
      |  FROM lineitem JOIN part ON l_partkey = p_partkey
      |  WHERE EXTRACT(YEAR FROM l_shipdate) = 1995 AND EXTRACT(QUARTER FROM l_shipdate) = 2
      |  GROUP BY 1)
      |SELECT p_type, n_items, CAST(rev_dec AS DOUBLE) AS itemrevenue,
      |  round(CAST(rev_dec AS DOUBLE) * 100.0 /
      |    CAST(SUM(rev_dec) OVER () AS DOUBLE), 6) AS revshare
      |FROM rev
      |ORDER BY p_type""".stripMargin

  // DS q26 shape (q26.sql): the catalog binding of the q7 demographic
  // averages — different filter bindings (open orders, FURNITURE
  // segment, 1997) and a fourth dimension-side average.
  private val q26CatalogDemoAvg: Q = (s, dir) =>
    load(s, dir, "lineitem")
      .join(load(s, dir, "orders")
          .filter(col("o_orderstatus") === "O" && year(col("o_orderdate")) === 1997),
        col("l_orderkey") === col("o_orderkey"))
      .join(load(s, dir, "customer").filter(col("c_mktsegment") === "FURNITURE"),
        col("o_custkey") === col("c_custkey"))
      .join(load(s, dir, "part"), col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"))
      .agg((dbl(sum(dec(col("l_quantity")))) / count(lit(1))).as("agg1"),
        (dbl(sum(dec(col("l_extendedprice")))) / count(lit(1))).as("agg2"),
        (dbl(sum(rate(col("l_tax")))) / count(lit(1))).as("agg3"),
        (dbl(sum(dec(col("c_acctbal")))) / count(lit(1))).as("agg4"))
      .orderBy(col("p_brand"))
      .limit(100)

  private val q26CatalogDemoAvgSql =
    """SELECT p_brand,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS agg1,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS agg2,
      |  CAST(SUM(CAST(l_tax AS DECIMAL(4,2))) AS DOUBLE) / COUNT(*) AS agg3,
      |  CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS agg4
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN part ON l_partkey = p_partkey
      |WHERE o_orderstatus = 'O' AND EXTRACT(YEAR FROM o_orderdate) = 1997
      |  AND c_mktsegment = 'FURNITURE'
      |GROUP BY p_brand
      |ORDER BY p_brand
      |LIMIT 100""".stripMargin

  // DS q52 shape (q52.sql): the q3 star join ordered by revenue within
  // the year (brand report for one month).
  private val q52BrandMonth: Q = (s, dir) => {
    val dt = dateDim(s, dir).filter(col("d_moy") === 1 && col("d_year") === 1997)
    load(s, dir, "lineitem")
      .join(dt, col("l_shipdate") === col("d_date"))
      .join(load(s, dir, "part"), col("l_partkey") === col("p_partkey"))
      .groupBy(col("d_year"), col("p_brand"))
      .agg(dbl(sum(dec(col("l_extendedprice")))).as("ext_price"))
      .orderBy(col("d_year"), col("ext_price").desc, col("p_brand"))
      .limit(100)
  }

  private val q52BrandMonthSql =
    s"""WITH $dateDimSql
      |SELECT d_year, p_brand,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS ext_price
      |FROM lineitem
      |JOIN date_dim ON l_shipdate = d_date AND d_moy = 1 AND d_year = 1997
      |JOIN part ON l_partkey = p_partkey
      |GROUP BY d_year, p_brand
      |ORDER BY d_year, ext_price DESC, p_brand
      |LIMIT 100""".stripMargin

  // DS q55 shape (q55.sql): the q3 grammar reduced to brand-only keys
  // for one month (no year column in the output).
  private val q55BrandOnly: Q = (s, dir) => {
    val dt = dateDim(s, dir).filter(col("d_moy") === 3 && col("d_year") === 1996)
    load(s, dir, "lineitem")
      .join(dt, col("l_shipdate") === col("d_date"))
      .join(load(s, dir, "part"), col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"))
      .agg(dbl(sum(dec(col("l_extendedprice")))).as("ext_price"))
      .orderBy(col("ext_price").desc, col("p_brand"))
      .limit(100)
  }

  private val q55BrandOnlySql =
    s"""WITH $dateDimSql
      |SELECT p_brand,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS ext_price
      |FROM lineitem
      |JOIN date_dim ON l_shipdate = d_date AND d_moy = 3 AND d_year = 1996
      |JOIN part ON l_partkey = p_partkey
      |GROUP BY p_brand
      |ORDER BY ext_price DESC, p_brand
      |LIMIT 100""".stripMargin

  // DS q57 shape (q57.sql): the q47 lag/lead sandwich bound to the
  // supplier-nation grain (catalog call-center binding).
  private val q57NationLagLead: Q = (s, dir) => {
    val monthly = load(s, dir, "lineitem")
      .join(load(s, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
      .join(load(s, dir, "nation"), col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"), year(col("l_shipdate")).as("yr"),
        month(col("l_shipdate")).as("moy"))
      .agg(sum(dec(col("l_extendedprice"))).as("sales_dec"))
    val w = Window.partitionBy(col("n_name")).orderBy(col("yr"), col("moy"))
    val wAvg = Window.partitionBy(col("n_name"), col("yr"))
    monthly
      .select(col("n_name"), col("yr"), col("moy"),
        dbl(col("sales_dec")).as("sum_sales"),
        (sum(col("sales_dec")).over(wAvg).cast("double") /
          count(lit(1)).over(wAvg)).as("avg_monthly"),
        dbl(lag(col("sales_dec"), 1).over(w)).as("psum"),
        dbl(lead(col("sales_dec"), 1).over(w)).as("nsum"))
      .filter(col("yr") === 1996 &&
        abs(col("sum_sales") - col("avg_monthly")) > col("avg_monthly") * 0.1)
      .orderBy(col("n_name"), col("moy"))
      .limit(100)
  }

  private val q57NationLagLeadSql =
    """WITH monthly AS (
      |  SELECT n_name, CAST(EXTRACT(YEAR FROM l_shipdate) AS INTEGER) AS yr,
      |    CAST(EXTRACT(MONTH FROM l_shipdate) AS INTEGER) AS moy,
      |    SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS sales_dec
      |  FROM lineitem
      |  JOIN supplier ON l_suppkey = s_suppkey
      |  JOIN nation ON s_nationkey = n_nationkey
      |  GROUP BY 1, 2, 3),
      |win AS (
      |  SELECT n_name, yr, moy, CAST(sales_dec AS DOUBLE) AS sum_sales,
      |    CAST(SUM(sales_dec) OVER (PARTITION BY n_name, yr) AS DOUBLE) /
      |      COUNT(*) OVER (PARTITION BY n_name, yr) AS avg_monthly,
      |    CAST(LAG(sales_dec, 1) OVER (PARTITION BY n_name ORDER BY yr, moy) AS DOUBLE) AS psum,
      |    CAST(LEAD(sales_dec, 1) OVER (PARTITION BY n_name ORDER BY yr, moy) AS DOUBLE) AS nsum
      |  FROM monthly)
      |SELECT n_name, yr, moy, sum_sales, avg_monthly, psum, nsum
      |FROM win
      |WHERE yr = 1996 AND abs(sum_sales - avg_monthly) > avg_monthly * 0.1
      |ORDER BY n_name, moy
      |LIMIT 100""".stripMargin

  // DS q60 shape (q60.sql): the q56 channel union bound to a type
  // list instead of sizes, ascending-brand report.
  private val q60TypeChannelUnion: Q = (s, dir) => {
    val li = load(s, dir, "lineitem")
      .join(load(s, dir, "part").filter(col("p_type").isin("PROMO", "ECONOMY")),
        col("l_partkey") === col("p_partkey"))
    def chanLeg(ch: String) =
      li.filter(channelClass === ch)
        .groupBy(col("p_brand"))
        .agg(sum(revenue(col("l_extendedprice"), col("l_discount"))).as("total_sales"))
    chanLeg("air").unionAll(chanLeg("sea")).unionAll(chanLeg("land"))
      .groupBy(col("p_brand"))
      .agg(dbl(sum(col("total_sales"))).as("total_sales"))
      .orderBy(col("p_brand"))
      .limit(100)
  }

  private val q60TypeChannelUnionSql =
    s"""WITH j AS (
      |  SELECT p_brand, l_linenumber, l_extendedprice, l_discount FROM lineitem
      |  JOIN part ON l_partkey = p_partkey WHERE p_type IN ('PROMO','ECONOMY')),
      |legs AS (
      |  SELECT p_brand, SUM($rev) AS total_sales FROM j WHERE $channelClassSql = 'air' GROUP BY 1
      |  UNION ALL
      |  SELECT p_brand, SUM($rev) FROM j WHERE $channelClassSql = 'sea' GROUP BY 1
      |  UNION ALL
      |  SELECT p_brand, SUM($rev) FROM j WHERE $channelClassSql = 'land' GROUP BY 1)
      |SELECT p_brand, CAST(SUM(total_sales) AS DOUBLE) AS total_sales
      |FROM legs GROUP BY p_brand
      |ORDER BY p_brand
      |LIMIT 100""".stripMargin

  // DS q63 shape (q63.sql): the q53 monthly-vs-average ratio bound to
  // a manager analog (supplier bucket) instead of brand.
  private val q63ManagerRatio: Q = (s, dir) => {
    val monthly = load(s, dir, "lineitem")
      .withColumn("mgr", pmod(col("l_suppkey"), lit(10)).cast("int"))
      .groupBy(col("mgr"), year(col("l_shipdate")).as("yr"),
        month(col("l_shipdate")).as("moy"))
      .agg(sum(dec(col("l_extendedprice"))).as("sales_dec"))
    val w = Window.partitionBy(col("mgr"))
    monthly.select(col("mgr"), col("yr"), col("moy"),
        dbl(col("sales_dec")).as("sum_sales"),
        (sum(col("sales_dec")).over(w).cast("double") /
          count(lit(1)).over(w)).as("avg_monthly"))
      .filter(col("sum_sales") > col("avg_monthly") * 1.1)
      .select(col("mgr"), col("yr"), col("moy"), col("sum_sales"),
        round(col("sum_sales") / col("avg_monthly"), 6).as("ratio"))
      .orderBy(col("mgr"), col("yr"), col("moy"))
      .limit(100)
  }

  private val q63ManagerRatioSql =
    """WITH monthly AS (
      |  SELECT CAST(l_suppkey % 10 AS INTEGER) AS mgr,
      |    CAST(EXTRACT(YEAR FROM l_shipdate) AS INTEGER) AS yr,
      |    CAST(EXTRACT(MONTH FROM l_shipdate) AS INTEGER) AS moy,
      |    SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS sales_dec
      |  FROM lineitem GROUP BY 1, 2, 3),
      |win AS (
      |  SELECT mgr, yr, moy, CAST(sales_dec AS DOUBLE) AS sum_sales,
      |    CAST(SUM(sales_dec) OVER (PARTITION BY mgr) AS DOUBLE) /
      |      COUNT(*) OVER (PARTITION BY mgr) AS avg_monthly
      |  FROM monthly)
      |SELECT mgr, yr, moy, sum_sales, round(sum_sales / avg_monthly, 6) AS ratio
      |FROM win
      |WHERE sum_sales > avg_monthly * 1.1
      |ORDER BY mgr, yr, moy
      |LIMIT 100""".stripMargin

  // DS q73 shape (q73.sql): the q34 ticket-bucket grammar with the
  // narrow 1-3 line band and a count-ordered report.
  private val q73NarrowTickets: Q = (s, dir) => {
    val inner = load(s, dir, "lineitem")
      .join(load(s, dir, "orders")
          .filter(dayofmonth(col("o_orderdate")).between(10, 20)),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_orderkey"), col("o_custkey"))
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt").between(1, 3))
    inner
      .join(load(s, dir, "customer")
          .filter(col("c_mktsegment").isin("BUILDING", "FURNITURE")),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_name"), col("c_mktsegment"),
        col("l_orderkey").as("ticket"), col("cnt"))
      .orderBy(col("cnt").desc, col("c_name"), col("ticket"))
      .limit(100)
  }

  private val q73NarrowTicketsSql =
    """WITH inner_q AS (
      |  SELECT l_orderkey, o_custkey, COUNT(*) AS cnt
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |  WHERE EXTRACT(DAY FROM o_orderdate) BETWEEN 10 AND 20
      |  GROUP BY 1, 2
      |  HAVING COUNT(*) BETWEEN 1 AND 3)
      |SELECT c_name, c_mktsegment, l_orderkey AS ticket, cnt
      |FROM inner_q JOIN customer ON o_custkey = c_custkey
      |WHERE c_mktsegment IN ('BUILDING','FURNITURE')
      |ORDER BY cnt DESC, c_name, ticket
      |LIMIT 100""".stripMargin

  // DS q74 shape (q74.sql): the two-year, two-channel growth compare
  // on order totals (the q4/q11 core with sums instead of the
  // intermediate rate) — urgent orders are the store leg, the rest web.
  private val q74TotalsGrowth: Q = (s, dir) => {
    val o = load(s, dir, "orders")
    def leg(urgent: Boolean, yr: Int, alias: String) =
      o.filter((if (urgent) col("o_orderpriority") === "1-URGENT"
                else col("o_orderpriority") =!= "1-URGENT") &&
          year(col("o_orderdate")) === yr)
        .groupBy(col("o_custkey").as(alias + "_ck"))
        .agg(dbl(sum(dec(col("o_totalprice")))).as(alias))
    leg(urgent = true, 1995, "s1")
      .join(leg(urgent = true, 1996, "s2"), col("s1_ck") === col("s2_ck"))
      .join(leg(urgent = false, 1995, "w1"), col("s1_ck") === col("w1_ck"))
      .join(leg(urgent = false, 1996, "w2"), col("s1_ck") === col("w2_ck"))
      .filter(col("s1") > 0.0 && col("w1") > 0.0 &&
        col("w2") / col("w1") > col("s2") / col("s1"))
      .select(col("s1_ck").as("custkey"),
        round(col("w2") / col("w1"), 6).as("web_growth"),
        round(col("s2") / col("s1"), 6).as("store_growth"))
      .orderBy(col("custkey"))
      .limit(100)
  }

  private val q74TotalsGrowthSql =
    """WITH s1 AS (SELECT o_custkey AS ck, CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS s1
      |  FROM orders WHERE o_orderpriority = '1-URGENT' AND EXTRACT(YEAR FROM o_orderdate) = 1995 GROUP BY 1),
      |s2 AS (SELECT o_custkey AS ck, CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS s2
      |  FROM orders WHERE o_orderpriority = '1-URGENT' AND EXTRACT(YEAR FROM o_orderdate) = 1996 GROUP BY 1),
      |w1 AS (SELECT o_custkey AS ck, CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS w1
      |  FROM orders WHERE o_orderpriority <> '1-URGENT' AND EXTRACT(YEAR FROM o_orderdate) = 1995 GROUP BY 1),
      |w2 AS (SELECT o_custkey AS ck, CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS w2
      |  FROM orders WHERE o_orderpriority <> '1-URGENT' AND EXTRACT(YEAR FROM o_orderdate) = 1996 GROUP BY 1)
      |SELECT s1.ck AS custkey, round(w2 / w1, 6) AS web_growth,
      |  round(s2 / s1, 6) AS store_growth
      |FROM s1 JOIN s2 ON s1.ck = s2.ck JOIN w1 ON s1.ck = w1.ck JOIN w2 ON s1.ck = w2.ck
      |WHERE s1 > 0.0 AND w1 > 0.0 AND w2 / w1 > s2 / s1
      |ORDER BY custkey
      |LIMIT 100""".stripMargin

  // DS q79 shape (q79.sql): each customer's single best cross-nation
  // trip — the q46 trip grain reduced by a per-customer argmax window.
  private val q79BestTrip: Q = (s, dir) => {
    val trips = load(s, dir, "lineitem")
      .join(load(s, dir, "orders").filter(year(col("o_orderdate")) === 1996),
        col("l_orderkey") === col("o_orderkey"))
      .join(load(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
      .join(load(s, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
      .filter(col("c_nationkey") =!= col("s_nationkey"))
      .groupBy(col("c_custkey"), col("o_orderkey"))
      .agg(dbl(sum(revenue(col("l_extendedprice"), col("l_discount")))).as("trip_rev"))
    val w = Window.partitionBy(col("c_custkey"))
      .orderBy(col("trip_rev").desc, col("o_orderkey"))
    trips.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("c_custkey"), col("o_orderkey").as("best_order"),
        col("trip_rev"))
      .orderBy(col("trip_rev").desc, col("c_custkey"))
      .limit(100)
  }

  private val q79BestTripSql =
    s"""WITH trips AS (
      |  SELECT c_custkey, o_orderkey, CAST(SUM($rev) AS DOUBLE) AS trip_rev
      |  FROM lineitem
      |  JOIN orders ON l_orderkey = o_orderkey
      |  JOIN customer ON o_custkey = c_custkey
      |  JOIN supplier ON l_suppkey = s_suppkey
      |  WHERE EXTRACT(YEAR FROM o_orderdate) = 1996 AND c_nationkey <> s_nationkey
      |  GROUP BY 1, 2),
      |ranked AS (
      |  SELECT c_custkey, o_orderkey, trip_rev,
      |    ROW_NUMBER() OVER (PARTITION BY c_custkey ORDER BY trip_rev DESC, o_orderkey) AS rn
      |  FROM trips)
      |SELECT c_custkey, o_orderkey AS best_order, trip_rev
      |FROM ranked WHERE rn = 1
      |ORDER BY trip_rev DESC, c_custkey
      |LIMIT 100""".stripMargin

  // DS q80 shape (q80.sql): the q77 channel sales/returns report keyed
  // by ship channel with promotional items excluded.
  private val q80PromoExcluded: Q = (s, dir) => {
    val li = load(s, dir, "lineitem")
      .join(load(s, dir, "part").filter(col("p_type") =!= "PROMO"),
        col("l_partkey") === col("p_partkey"))
      .withColumn("channel", channelClass)
    val sales = li.groupBy(col("channel").as("ch"))
      .agg(sum(dec(col("l_extendedprice"))).as("sales"))
    val returns = li.filter(col("l_returnflag") === "R")
      .groupBy(col("channel").as("ch"))
      .agg(sum(dec(col("l_extendedprice"))).as("returns"))
    sales.join(returns, Seq("ch"), "left_outer")
      .select(col("ch").as("channel"), dbl(col("sales")).as("sales"),
        dbl(coalesce(col("returns"), lit(0))).as("returns"),
        dbl(col("sales") - coalesce(col("returns"), lit(0))).as("net"))
      .orderBy(col("channel"))
  }

  private val q80PromoExcludedSql =
    s"""WITH j AS (
      |  SELECT $channelClassSql AS ch, l_returnflag, l_extendedprice
      |  FROM lineitem JOIN part ON l_partkey = p_partkey
      |  WHERE p_type <> 'PROMO'),
      |sales AS (SELECT ch, SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS sales FROM j GROUP BY 1),
      |ret AS (SELECT ch, SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS returns
      |  FROM j WHERE l_returnflag = 'R' GROUP BY 1)
      |SELECT sales.ch AS channel, CAST(sales AS DOUBLE) AS sales,
      |  CAST(COALESCE(returns, 0) AS DOUBLE) AS returns,
      |  CAST(sales - COALESCE(returns, 0) AS DOUBLE) AS net
      |FROM sales LEFT JOIN ret ON sales.ch = ret.ch
      |ORDER BY channel""".stripMargin

  // DS q81 shape (q81.sql): customers whose returned amount exceeds
  // 1.2× their nation's average returned amount (the q30 grammar on
  // the returns side).
  private val q81ReturnsAboveAvg: Q = (s, dir) => {
    val ret = load(s, dir, "lineitem").filter(col("l_returnflag") === "R")
      .join(load(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .join(load(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_custkey"), col("c_nationkey"))
      .agg(sum(revenue(col("l_extendedprice"), col("l_discount"))).as("ret_dec"))
    val natAvg = ret.groupBy(col("c_nationkey").as("nk"))
      .agg((sum(col("ret_dec")).cast("double") / count(lit(1))).as("nat_avg"))
    ret.join(natAvg, col("c_nationkey") === col("nk"))
      .filter(dbl(col("ret_dec")) > col("nat_avg") * 1.2)
      .select(col("c_custkey"), col("c_nationkey").cast("int").as("nation"),
        dbl(col("ret_dec")).as("returned"), round(col("nat_avg"), 6).as("nat_avg"))
      .orderBy(col("c_custkey"))
  }

  private val q81ReturnsAboveAvgSql =
    s"""WITH ret AS (
      |  SELECT c_custkey, c_nationkey, SUM($rev) AS ret_dec
      |  FROM lineitem
      |  JOIN orders ON l_orderkey = o_orderkey
      |  JOIN customer ON o_custkey = c_custkey
      |  WHERE l_returnflag = 'R'
      |  GROUP BY 1, 2),
      |na AS (
      |  SELECT c_nationkey AS nk, CAST(SUM(ret_dec) AS DOUBLE) / COUNT(*) AS nat_avg
      |  FROM ret GROUP BY 1)
      |SELECT c_custkey, CAST(c_nationkey AS INTEGER) AS nation,
      |  CAST(ret_dec AS DOUBLE) AS returned, round(nat_avg, 6) AS nat_avg
      |FROM ret JOIN na ON c_nationkey = nk
      |WHERE CAST(ret_dec AS DOUBLE) > nat_avg * 1.2
      |ORDER BY c_custkey""".stripMargin

  // DS q86 shape (q86.sql): the q67 rollup-rank grammar over order
  // dimensions (priority, status) instead of item dimensions.
  private val q86OrderRollupRank: Q = (s, dir) => {
    val rolled = load(s, dir, "orders")
      .rollup(col("o_orderpriority"), col("o_orderstatus"))
      .agg(dbl(sum(dec(col("o_totalprice")))).as("sumsales"),
        (grouping(col("o_orderpriority")) + grouping(col("o_orderstatus")))
          .cast("int").as("lochierarchy"))
    val w = Window.partitionBy(col("lochierarchy")).orderBy(col("sumsales").desc)
    rolled
      .select(col("o_orderpriority"), col("o_orderstatus"),
        round(col("sumsales"), 4).as("sumsales"), col("lochierarchy"),
        rank().over(w).as("rk"))
      .orderBy(col("lochierarchy").desc, col("rk"),
        col("o_orderpriority").asc_nulls_first, col("o_orderstatus").asc_nulls_first)
      .limit(100)
  }

  private val q86OrderRollupRankSql =
    """SELECT o_orderpriority, o_orderstatus, round(sumsales, 4) AS sumsales,
      |  lochierarchy, CAST(rk AS INTEGER) AS rk
      |FROM (
      |  SELECT o_orderpriority, o_orderstatus,
      |    CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS sumsales,
      |    CAST(GROUPING(o_orderpriority) + GROUPING(o_orderstatus) AS INTEGER) AS lochierarchy,
      |    RANK() OVER (
      |      PARTITION BY GROUPING(o_orderpriority) + GROUPING(o_orderstatus)
      |      ORDER BY CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) DESC) AS rk
      |  FROM orders
      |  GROUP BY ROLLUP(o_orderpriority, o_orderstatus))
      |ORDER BY lochierarchy DESC, rk,
      |  o_orderpriority NULLS FIRST, o_orderstatus NULLS FIRST
      |LIMIT 100""".stripMargin

  // DS q92 shape (q92.sql): the web binding of the excess-discount
  // grammar — tighter 1.5× multiplier over a half-year window, with
  // the qualifying discount mass reported alongside.
  private val q92WebExcessDiscount: Q = (s, dir) => {
    val li = load(s, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1995-07-01") &&
        col("l_shipdate") < lit("1996-01-01"))
    val avgDisc = li.groupBy(col("l_partkey").as("ad_pk"))
      .agg((dbl(sum(rate(col("l_discount")))) / count(lit(1))).as("avg_disc"))
    li.join(avgDisc, col("l_partkey") === col("ad_pk"))
      .filter(dbl(rate(col("l_discount"))) > col("avg_disc") * 1.5)
      .agg(dbl(sum(dec(col("l_extendedprice")) * rate(col("l_discount"))))
          .as("excess_discount_amt"),
        count(lit(1)).as("n_lines"))
  }

  private val q92WebExcessDiscountSql =
    """WITH win AS (
      |  SELECT * FROM lineitem
      |  WHERE l_shipdate >= TIMESTAMP '1995-07-01' AND l_shipdate < TIMESTAMP '1996-01-01'),
      |ad AS (
      |  SELECT l_partkey AS ad_pk,
      |    CAST(SUM(CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) / COUNT(*) AS avg_disc
      |  FROM win GROUP BY 1)
      |SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS excess_discount_amt,
      |  COUNT(*) AS n_lines
      |FROM win JOIN ad ON l_partkey = ad_pk
      |WHERE CAST(CAST(l_discount AS DECIMAL(4,2)) AS DOUBLE) > avg_disc * 1.5""".stripMargin

  // DS q94 shape (q94.sql): the windowed one-row ship report — urgent
  // air-channel orders in a quarter with ≥2 suppliers and no returned
  // line (the q16 sandwich under channel/priority/window bindings).
  private val q94WindowedShipReport: Q = (s, dir) => {
    val li = load(s, dir, "lineitem")
    val airOrders = li.filter(channelClass === "air")
      .select(col("l_orderkey").as("ak")).distinct()
    val multi = li.select(col("l_orderkey"), col("l_suppkey")).distinct()
      .groupBy(col("l_orderkey")).agg(count(lit(1)).as("ns"))
      .filter(col("ns") > 1).select(col("l_orderkey").as("mk"))
    val returned = li.filter(col("l_returnflag") === "R")
      .select(col("l_orderkey").as("rk")).distinct()
    load(s, dir, "orders")
      .filter(year(col("o_orderdate")) === 1995 &&
        quarter(col("o_orderdate")) === 1 &&
        col("o_orderpriority") === "1-URGENT")
      .join(airOrders, col("o_orderkey") === col("ak"), "left_semi")
      .join(multi, col("o_orderkey") === col("mk"), "left_semi")
      .join(returned, col("o_orderkey") === col("rk"), "left_anti")
      .agg(count(lit(1)).as("n_orders"),
        countDistinct(col("o_custkey")).as("n_cust"),
        dbl(sum(dec(col("o_totalprice")))).as("total_price"))
  }

  private val q94WindowedShipReportSql =
    s"""SELECT COUNT(*) AS n_orders, COUNT(DISTINCT o_custkey) AS n_cust,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total_price
      |FROM orders
      |WHERE EXTRACT(YEAR FROM o_orderdate) = 1995 AND EXTRACT(QUARTER FROM o_orderdate) = 1
      |  AND o_orderpriority = '1-URGENT'
      |  AND o_orderkey IN (SELECT l_orderkey FROM lineitem WHERE $channelClassSql = 'air')
      |  AND o_orderkey IN (
      |    SELECT l_orderkey FROM (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem)
      |    GROUP BY l_orderkey HAVING COUNT(*) > 1)
      |  AND o_orderkey NOT IN (
      |    SELECT l_orderkey FROM lineitem WHERE l_returnflag = 'R')""".stripMargin

  // DS q95 shape (q95.sql): like q94 but the order must ALSO have a
  // returned line (EXISTS instead of NOT EXISTS) — the returned-ship
  // report over the same multi-supplier evidence.
  private val q95ReturnedShipReport: Q = (s, dir) => {
    val li = load(s, dir, "lineitem")
    val multi = li.select(col("l_orderkey"), col("l_suppkey")).distinct()
      .groupBy(col("l_orderkey")).agg(count(lit(1)).as("ns"))
      .filter(col("ns") > 1).select(col("l_orderkey").as("mk"))
    val returned = li.filter(col("l_returnflag") === "R")
      .select(col("l_orderkey").as("rk")).distinct()
    load(s, dir, "orders")
      .filter(year(col("o_orderdate")) === 1995 && quarter(col("o_orderdate")) === 1)
      .join(multi, col("o_orderkey") === col("mk"), "left_semi")
      .join(returned, col("o_orderkey") === col("rk"), "left_semi")
      .agg(count(lit(1)).as("n_orders"),
        countDistinct(col("o_custkey")).as("n_cust"),
        dbl(sum(dec(col("o_totalprice")))).as("total_price"))
  }

  private val q95ReturnedShipReportSql =
    """SELECT COUNT(*) AS n_orders, COUNT(DISTINCT o_custkey) AS n_cust,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total_price
      |FROM orders
      |WHERE EXTRACT(YEAR FROM o_orderdate) = 1995 AND EXTRACT(QUARTER FROM o_orderdate) = 1
      |  AND o_orderkey IN (
      |    SELECT l_orderkey FROM (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem)
      |    GROUP BY l_orderkey HAVING COUNT(*) > 1)
      |  AND o_orderkey IN (
      |    SELECT l_orderkey FROM lineitem WHERE l_returnflag = 'R')""".stripMargin

  // DS q14b shape (q14b.sql): cross-channel items compared across two
  // consecutive years per brand (the this-week-vs-last-year leg of the
  // q14 pair) — same intersection set, year-grain self-join.
  private val q14bCrossYearCompare: Q = (s, dir) => {
    val li = load(s, dir, "lineitem")
    val crossItems = li.select(col("l_partkey"), channelClass.as("channel"))
      .groupBy(col("l_partkey"))
      .agg(size(collect_set(col("channel"))).as("nch"))
      .filter(col("nch") === 3).select(col("l_partkey").as("ci_part"))
    def yearRev(y: Int, alias: String) =
      li.filter(year(col("l_shipdate")) === y)
        .join(crossItems, col("l_partkey") === col("ci_part"), "left_semi")
        .join(load(s, dir, "part"), col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand").as(alias + "_b"))
        .agg(dbl(sum(revenue(col("l_extendedprice"), col("l_discount")))).as(alias))
    yearRev(1995, "rev_prev").join(yearRev(1996, "rev_cur"),
        col("rev_prev_b") === col("rev_cur_b"))
      .select(col("rev_prev_b").as("brand"), col("rev_prev"), col("rev_cur"),
        round(col("rev_cur") / col("rev_prev"), 6).as("yoy"))
      .orderBy(col("brand"))
      .limit(100)
  }

  private val q14bCrossYearCompareSql =
    s"""WITH cross_items AS (
      |  SELECT l_partkey FROM (
      |    SELECT DISTINCT l_partkey, $channelClassSql AS channel FROM lineitem)
      |  GROUP BY l_partkey HAVING COUNT(*) = 3),
      |prev AS (
      |  SELECT p_brand, CAST(SUM($rev) AS DOUBLE) AS rev_prev
      |  FROM lineitem JOIN part ON l_partkey = p_partkey
      |  WHERE EXTRACT(YEAR FROM l_shipdate) = 1995
      |    AND l_partkey IN (SELECT l_partkey FROM cross_items)
      |  GROUP BY 1),
      |cur AS (
      |  SELECT p_brand, CAST(SUM($rev) AS DOUBLE) AS rev_cur
      |  FROM lineitem JOIN part ON l_partkey = p_partkey
      |  WHERE EXTRACT(YEAR FROM l_shipdate) = 1996
      |    AND l_partkey IN (SELECT l_partkey FROM cross_items)
      |  GROUP BY 1)
      |SELECT prev.p_brand AS brand, rev_prev, rev_cur,
      |  round(rev_cur / rev_prev, 6) AS yoy
      |FROM prev JOIN cur ON prev.p_brand = cur.p_brand
      |ORDER BY brand
      |LIMIT 100""".stripMargin

  // DS q23b shape (q23b.sql): the q23 frequent-items × best-customers
  // revenue split per customer, top-10 (q23a reports the total).
  private val q23bPerCustomer: Q = (s, dir) => {
    val li = load(s, dir, "lineitem")
    val ord = load(s, dir, "orders")
    val freq = li
      .join(ord.filter(year(col("o_orderdate")) === 1996),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_partkey")).agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") > 4).select(col("l_partkey"))
    val spend = ord.groupBy(col("o_custkey"))
      .agg(dbl(sum(dec(col("o_totalprice")))).as("spend"))
    val best = spend
      .crossJoin(broadcast(spend.agg(max(col("spend")).as("mx"))))
      .filter(col("spend") > col("mx") * 0.5)
      .select(col("o_custkey"))
    li.join(ord.filter(year(col("o_orderdate")) === 1997)
        .select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .join(freq, Seq("l_partkey"), "left_semi")
      .join(best, Seq("o_custkey"), "left_semi")
      .groupBy(col("o_custkey"))
      .agg(dbl(sum(revenue(col("l_extendedprice"), col("l_discount")))).as("sales"))
      .orderBy(col("sales").desc, col("o_custkey"))
      .limit(10)
  }

  private val q23bPerCustomerSql =
    s"""WITH freq AS (
      |  SELECT l_partkey FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |  WHERE EXTRACT(YEAR FROM o_orderdate) = 1996
      |  GROUP BY l_partkey HAVING count(*) > 4),
      |spend AS (
      |  SELECT o_custkey, CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS spend
      |  FROM orders GROUP BY o_custkey),
      |best AS (
      |  SELECT o_custkey FROM spend WHERE spend > 0.5 * (SELECT max(spend) FROM spend))
      |SELECT o_custkey, CAST(SUM($rev) AS DOUBLE) AS sales
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |WHERE EXTRACT(YEAR FROM o_orderdate) = 1997
      |  AND l_partkey IN (SELECT l_partkey FROM freq)
      |  AND o_custkey IN (SELECT o_custkey FROM best)
      |GROUP BY o_custkey
      |ORDER BY sales DESC, o_custkey
      |LIMIT 10""".stripMargin

  // DS q24b shape (q24b.sql): the q24 same-nation pair net-paid rolled
  // up to the nation grain (the color-binding twin reports by group).
  private val q24bNationNetPaid: Q = (s, dir) => {
    val paid = load(s, dir, "lineitem")
      .join(load(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .join(load(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
      .join(load(s, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
      .filter(col("c_nationkey") === col("s_nationkey"))
      .join(load(s, dir, "nation"), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"), col("c_custkey"), col("s_suppkey"))
      .agg(sum(revenue(col("l_extendedprice"), col("l_discount"))).as("netpaid_dec"))
    val avgAll = paid.agg(
      (dbl(sum(col("netpaid_dec"))) / count(lit(1))).as("avg_paid"))
    paid.crossJoin(avgAll)
      .filter(dbl(col("netpaid_dec")) > col("avg_paid") * 1.5)
      .groupBy(col("n_name"))
      .agg(count(lit(1)).as("n_pairs"),
        dbl(sum(col("netpaid_dec"))).as("netpaid"))
      .orderBy(col("n_name"))
  }

  private val q24bNationNetPaidSql =
    s"""WITH paid AS (
      |  SELECT n_name, c_custkey, s_suppkey, SUM($rev) AS netpaid_dec
      |  FROM lineitem
      |  JOIN orders ON l_orderkey = o_orderkey
      |  JOIN customer ON o_custkey = c_custkey
      |  JOIN supplier ON l_suppkey = s_suppkey
      |  JOIN nation ON c_nationkey = n_nationkey
      |  WHERE c_nationkey = s_nationkey
      |  GROUP BY 1, 2, 3),
      |avg_all AS (SELECT CAST(SUM(netpaid_dec) AS DOUBLE) / COUNT(*) AS avg_paid FROM paid)
      |SELECT n_name, COUNT(*) AS n_pairs, CAST(SUM(netpaid_dec) AS DOUBLE) AS netpaid
      |FROM paid, avg_all
      |WHERE CAST(netpaid_dec AS DOUBLE) > avg_paid * 1.5
      |GROUP BY n_name
      |ORDER BY n_name""".stripMargin

  // DS q39b shape (q39b.sql): the q39 coefficient-of-variation filter
  // at the stricter 1.2 threshold (the "breakdown" leg of the pair).
  private val q39bStrictVariance: Q = (s, dir) =>
    load(s, dir, "lineitem")
      .groupBy(col("l_partkey"), month(col("l_shipdate")).as("moy"))
      .agg(count(lit(1)).as("n"),
        round(avg(dbl(dec(col("l_quantity")))), 6).as("mean_qty"),
        round(stddev_samp(dbl(dec(col("l_quantity")))), 6).as("sd_qty"))
      .filter(col("n") >= 5 && col("sd_qty") / col("mean_qty") > 1.2)
      .orderBy(col("l_partkey"), col("moy"))
      .limit(100)

  private val q39bStrictVarianceSql =
    """SELECT l_partkey, CAST(EXTRACT(MONTH FROM l_shipdate) AS INTEGER) AS moy,
      |  COUNT(*) AS n,
      |  round(AVG(CAST(CAST(l_quantity AS DECIMAL(12,2)) AS DOUBLE)), 6) AS mean_qty,
      |  round(STDDEV_SAMP(CAST(CAST(l_quantity AS DECIMAL(12,2)) AS DOUBLE)), 6) AS sd_qty
      |FROM lineitem
      |GROUP BY 1, 2
      |HAVING COUNT(*) >= 5
      |   AND round(STDDEV_SAMP(CAST(CAST(l_quantity AS DECIMAL(12,2)) AS DOUBLE)), 6) /
      |       round(AVG(CAST(CAST(l_quantity AS DECIMAL(12,2)) AS DOUBLE)), 6) > 1.2
      |ORDER BY l_partkey, moy
      |LIMIT 100""".stripMargin

  val queries: Map[String, Q] = Map(
    "tpcds_style_q14b_cross_year_compare" -> q14bCrossYearCompare,
    "tpcds_style_q23b_per_customer" -> q23bPerCustomer,
    "tpcds_style_q24b_nation_netpaid" -> q24bNationNetPaid,
    "tpcds_style_q39b_strict_variance" -> q39bStrictVariance,
    "tpcds_style_q74_totals_growth" -> q74TotalsGrowth,
    "tpcds_style_q79_best_trip" -> q79BestTrip,
    "tpcds_style_q80_promo_excluded" -> q80PromoExcluded,
    "tpcds_style_q81_returns_above_avg" -> q81ReturnsAboveAvg,
    "tpcds_style_q86_order_rollup_rank" -> q86OrderRollupRank,
    "tpcds_style_q92_web_excess_discount" -> q92WebExcessDiscount,
    "tpcds_style_q94_windowed_ship_report" -> q94WindowedShipReport,
    "tpcds_style_q95_returned_ship_report" -> q95ReturnedShipReport,
    "tpcds_style_q12_window_share" -> q12WindowShare,
    "tpcds_style_q20_quarter_share" -> q20QuarterShare,
    "tpcds_style_q26_catalog_demo_avg" -> q26CatalogDemoAvg,
    "tpcds_style_q52_brand_month" -> q52BrandMonth,
    "tpcds_style_q55_brand_only" -> q55BrandOnly,
    "tpcds_style_q57_nation_lag_lead" -> q57NationLagLead,
    "tpcds_style_q60_type_channel_union" -> q60TypeChannelUnion,
    "tpcds_style_q63_manager_ratio" -> q63ManagerRatio,
    "tpcds_style_q73_narrow_tickets" -> q73NarrowTickets,
    "tpcds_style_q72_promise_date_stock" -> q72PromiseDateStock,
    "tpcds_style_q40_net_before_after" -> q40NetBeforeAfter,
    "tpcds_style_q71_hour_union" -> q71HourUnion,
    "tpcds_style_q83_common_return_dates" -> q83CommonReturnDates,
    "tpcds_style_q96_slice_count" -> q96SliceCount,
    "tpcds_style_q25_profit_chain" -> q25ProfitChain,
    "tpcds_style_q37_inventory_window" -> q37InventoryWindow,
    "tpcds_style_q46_cross_nation_trips" -> q46CrossNationTrips,
    "tpcds_style_q50_return_latency" -> q50ReturnLatency,
    "tpcds_style_q56_item_channel_union" -> q56ItemChannelUnion,
    "tpcds_style_q62_ship_latency" -> q62ShipLatency,
    "tpcds_style_q91_monthly_returns" -> q91MonthlyReturns,
    "tpcds_style_q11_growth_compare" -> q11ChannelGrowthCompare,
    "tpcds_style_q27_geo_rollup" -> q27GeoRollup,
    "tpcds_style_q69_active_no_returns" -> q69ActiveNoReturns,
    "tpcds_style_q29_return_repurchase" -> q29ReturnRepurchase,
    "tpcds_style_q32_excess_discount" -> q32ExcessDiscount,
    "tpcds_style_q45_prefix_or_items" -> q45PrefixOrItems,
    "tpcds_style_q61_promo_ratio" -> q61PromoRatio,
    "tpcds_style_q64_repeat_purchase" -> q64RepeatPurchase,
    "tpcds_style_q70_top_nation_rollup" -> q70TopNationRollup,
    "tpcds_style_q76_null_channels" -> q76NullChannels,
    "tpcds_style_q84_customer_location" -> q84CustomerLocation,
    "tpcds_style_q85_return_reasons" -> q85ReturnReasons,
    "tpcds_style_q2_week_pivot" -> q2WeekPivot,
    "tpcds_style_q5_channel_profit" -> q5ChannelRollup,
    "tpcds_style_q8_preferred_prefix" -> q8PreferredPrefix,
    "tpcds_style_q10_active_profile" -> q10ActiveProfile,
    "tpcds_style_q13_band_averages" -> q13BandAverages,
    "tpcds_style_q14_cross_channel" -> q14CrossChannel,
    "tpcds_style_q15_prefix_revenue" -> q15PrefixRevenue,
    "tpcds_style_q16_multi_supplier" -> q16MultiSupplierClean,
    "tpcds_style_q18_rollup_averages" -> q18RollupAverages,
    "tpcds_style_q24_same_nation_pairs" -> q24SameNationPairs,
    "tpcds_style_q9_case_buckets" -> q9CaseBuckets,
    "tpcds_style_q23_frequent_best" -> q23FrequentBest,
    "tpcds_style_q38_intersect_customers" -> q38IntersectCustomers,
    "tpcds_style_q87_except_customers" -> q87ExceptCustomers,
    "tpcds_style_q41_exists_or" -> q41ExistsOr,
    "tpcds_style_q44_best_worst" -> q44BestWorst,
    "tpcds_style_q49_return_ratio_union" -> q49ReturnRatioUnion,
    "tpcds_style_q58_channel_balance" -> q58ChannelBalance,
    "tpcds_style_q1_returns_above_avg" -> q1ReturnsAboveAvg,
    "tpcds_style_q39_variance_filter" -> q39VarianceFilter,
    "tpcds_style_q47_lag_lead" -> q47LagLeadSandwich,
    "tpcds_style_q51_cumulative_compare" -> q51CumulativeCompare,
    "tpcds_style_q99_duration_buckets" -> q99DurationBuckets,
    "tpcds_style_q31_share_growth" -> q31ShareGrowth,
    "tpcds_style_q3_brand" -> q3Brand,
    "tpcds_style_q42_category" -> q42Category,
    "tpcds_style_q7_demo_avg" -> q7DemoAvg,
    "tpcds_style_q19_cross_nation" -> q19CrossNation,
    "tpcds_style_q34_ticket_buckets" -> q34TicketBuckets,
    "tpcds_style_q68_bought_nation" -> q68BoughtNation,
    "tpcds_style_q53_ratio_window" -> q53RatioWindow,
    "tpcds_style_q33_channel_union" -> q33ChannelUnion,
    "tpcds_style_q88_multi_slice" -> q88MultiSlice,
    "tpcds_style_q77_channel_returns" -> q77ChannelReturns,
    "tpcds_style_q98_revenue_share" -> q98RevenueShare,
    "tpcds_style_q35_demo_profile" -> q35DemoProfile,
    "tpcds_style_q93_return_adjusted" -> q93ReturnAdjusted,
    "tpcds_style_q30_above_avg" -> q30AboveAvg,
    "tpcds_style_q36_margin_rank" -> q36MarginRank,
    "tpcds_style_q48_qty_bands" -> q48QtyBands,
    "tpcds_style_q59_week_over_week" -> q59WeekOverWeek,
    "tpcds_style_q65_below_avg" -> q65BelowAvg,
    "tpcds_style_q75_yoy_decline" -> q75YoyDecline,
    "tpcds_style_q89_rolling_deviation" -> q89RollingDeviation,
    "tpcds_style_q97_channel_overlap" -> q97ChannelOverlap,
    "tpcds_style_q90_ampm_ratio" -> q90AmPmRatio,
    "tpcds_style_q4_yearly_growth" -> q4YearlyGrowth,
    "tpcds_style_q6_above_avg_type" -> q6AboveAvgType,
    "tpcds_style_q17_stat_moments" -> q17StatMoments,
    "tpcds_style_q21_before_after_ratio" -> q21BeforeAfterRatio,
    "tpcds_style_q22_qty_rollup" -> q22QtyRollup,
    "tpcds_style_q28_distinct_buckets" -> q28DistinctBuckets,
    "tpcds_style_q43_dow_pivot" -> q43DowPivot,
    "tpcds_style_q54_cohort_revenue" -> q54CohortRevenue,
    "tpcds_style_q66_monthly_pivot" -> q66MonthlyPivot,
    "tpcds_style_q67_rollup_rank" -> q67RollupRank,
    "tpcds_style_q78_noreturn_yoy" -> q78NoReturnYoy,
    "tpcds_style_q82_stock_range" -> q82StockRange)

  val oracles: Map[String, String] = Map(
    "tpcds_style_q14b_cross_year_compare" -> q14bCrossYearCompareSql,
    "tpcds_style_q23b_per_customer" -> q23bPerCustomerSql,
    "tpcds_style_q24b_nation_netpaid" -> q24bNationNetPaidSql,
    "tpcds_style_q39b_strict_variance" -> q39bStrictVarianceSql,
    "tpcds_style_q74_totals_growth" -> q74TotalsGrowthSql,
    "tpcds_style_q79_best_trip" -> q79BestTripSql,
    "tpcds_style_q80_promo_excluded" -> q80PromoExcludedSql,
    "tpcds_style_q81_returns_above_avg" -> q81ReturnsAboveAvgSql,
    "tpcds_style_q86_order_rollup_rank" -> q86OrderRollupRankSql,
    "tpcds_style_q92_web_excess_discount" -> q92WebExcessDiscountSql,
    "tpcds_style_q94_windowed_ship_report" -> q94WindowedShipReportSql,
    "tpcds_style_q95_returned_ship_report" -> q95ReturnedShipReportSql,
    "tpcds_style_q12_window_share" -> q12WindowShareSql,
    "tpcds_style_q20_quarter_share" -> q20QuarterShareSql,
    "tpcds_style_q26_catalog_demo_avg" -> q26CatalogDemoAvgSql,
    "tpcds_style_q52_brand_month" -> q52BrandMonthSql,
    "tpcds_style_q55_brand_only" -> q55BrandOnlySql,
    "tpcds_style_q57_nation_lag_lead" -> q57NationLagLeadSql,
    "tpcds_style_q60_type_channel_union" -> q60TypeChannelUnionSql,
    "tpcds_style_q63_manager_ratio" -> q63ManagerRatioSql,
    "tpcds_style_q73_narrow_tickets" -> q73NarrowTicketsSql,
    "tpcds_style_q72_promise_date_stock" -> q72PromiseDateStockSql,
    "tpcds_style_q40_net_before_after" -> q40NetBeforeAfterSql,
    "tpcds_style_q71_hour_union" -> q71HourUnionSql,
    "tpcds_style_q83_common_return_dates" -> q83CommonReturnDatesSql,
    "tpcds_style_q96_slice_count" -> q96SliceCountSql,
    "tpcds_style_q25_profit_chain" -> q25ProfitChainSql,
    "tpcds_style_q37_inventory_window" -> q37InventoryWindowSql,
    "tpcds_style_q46_cross_nation_trips" -> q46CrossNationTripsSql,
    "tpcds_style_q50_return_latency" -> q50ReturnLatencySql,
    "tpcds_style_q56_item_channel_union" -> q56ItemChannelUnionSql,
    "tpcds_style_q62_ship_latency" -> q62ShipLatencySql,
    "tpcds_style_q91_monthly_returns" -> q91MonthlyReturnsSql,
    "tpcds_style_q11_growth_compare" -> q11ChannelGrowthCompareSql,
    "tpcds_style_q27_geo_rollup" -> q27GeoRollupSql,
    "tpcds_style_q69_active_no_returns" -> q69ActiveNoReturnsSql,
    "tpcds_style_q29_return_repurchase" -> q29ReturnRepurchaseSql,
    "tpcds_style_q32_excess_discount" -> q32ExcessDiscountSql,
    "tpcds_style_q45_prefix_or_items" -> q45PrefixOrItemsSql,
    "tpcds_style_q61_promo_ratio" -> q61PromoRatioSql,
    "tpcds_style_q64_repeat_purchase" -> q64RepeatPurchaseSql,
    "tpcds_style_q70_top_nation_rollup" -> q70TopNationRollupSql,
    "tpcds_style_q76_null_channels" -> q76NullChannelsSql,
    "tpcds_style_q84_customer_location" -> q84CustomerLocationSql,
    "tpcds_style_q85_return_reasons" -> q85ReturnReasonsSql,
    "tpcds_style_q2_week_pivot" -> q2WeekPivotSql,
    "tpcds_style_q5_channel_profit" -> q5ChannelRollupSql,
    "tpcds_style_q8_preferred_prefix" -> q8PreferredPrefixSql,
    "tpcds_style_q10_active_profile" -> q10ActiveProfileSql,
    "tpcds_style_q13_band_averages" -> q13BandAveragesSql,
    "tpcds_style_q14_cross_channel" -> q14CrossChannelSql,
    "tpcds_style_q15_prefix_revenue" -> q15PrefixRevenueSql,
    "tpcds_style_q16_multi_supplier" -> q16MultiSupplierCleanSql,
    "tpcds_style_q18_rollup_averages" -> q18RollupAveragesSql,
    "tpcds_style_q24_same_nation_pairs" -> q24SameNationPairsSql,
    "tpcds_style_q9_case_buckets" -> q9CaseBucketsSql,
    "tpcds_style_q23_frequent_best" -> q23FrequentBestSql,
    "tpcds_style_q38_intersect_customers" -> q38IntersectCustomersSql,
    "tpcds_style_q87_except_customers" -> q87ExceptCustomersSql,
    "tpcds_style_q41_exists_or" -> q41ExistsOrSql,
    "tpcds_style_q44_best_worst" -> q44BestWorstSql,
    "tpcds_style_q49_return_ratio_union" -> q49ReturnRatioUnionSql,
    "tpcds_style_q58_channel_balance" -> q58ChannelBalanceSql,
    "tpcds_style_q1_returns_above_avg" -> q1ReturnsAboveAvgSql,
    "tpcds_style_q39_variance_filter" -> q39VarianceFilterSql,
    "tpcds_style_q47_lag_lead" -> q47LagLeadSandwichSql,
    "tpcds_style_q51_cumulative_compare" -> q51CumulativeCompareSql,
    "tpcds_style_q99_duration_buckets" -> q99DurationBucketsSql,
    "tpcds_style_q31_share_growth" -> q31ShareGrowthSql,
    "tpcds_style_q3_brand" -> q3BrandSql,
    "tpcds_style_q42_category" -> q42CategorySql,
    "tpcds_style_q7_demo_avg" -> q7DemoAvgSql,
    "tpcds_style_q19_cross_nation" -> q19CrossNationSql,
    "tpcds_style_q34_ticket_buckets" -> q34TicketBucketsSql,
    "tpcds_style_q68_bought_nation" -> q68BoughtNationSql,
    "tpcds_style_q53_ratio_window" -> q53RatioWindowSql,
    "tpcds_style_q33_channel_union" -> q33ChannelUnionSql,
    "tpcds_style_q88_multi_slice" -> q88MultiSliceSql,
    "tpcds_style_q77_channel_returns" -> q77ChannelReturnsSql,
    "tpcds_style_q98_revenue_share" -> q98RevenueShareSql,
    "tpcds_style_q35_demo_profile" -> q35DemoProfileSql,
    "tpcds_style_q93_return_adjusted" -> q93ReturnAdjustedSql,
    "tpcds_style_q30_above_avg" -> q30AboveAvgSql,
    "tpcds_style_q36_margin_rank" -> q36MarginRankSql,
    "tpcds_style_q48_qty_bands" -> q48QtyBandsSql,
    "tpcds_style_q59_week_over_week" -> q59WeekOverWeekSql,
    "tpcds_style_q65_below_avg" -> q65BelowAvgSql,
    "tpcds_style_q75_yoy_decline" -> q75YoyDeclineSql,
    "tpcds_style_q89_rolling_deviation" -> q89RollingDeviationSql,
    "tpcds_style_q97_channel_overlap" -> q97ChannelOverlapSql,
    "tpcds_style_q90_ampm_ratio" -> q90AmPmRatioSql,
    "tpcds_style_q4_yearly_growth" -> q4YearlyGrowthSql,
    "tpcds_style_q6_above_avg_type" -> q6AboveAvgTypeSql,
    "tpcds_style_q17_stat_moments" -> q17StatMomentsSql,
    "tpcds_style_q21_before_after_ratio" -> q21BeforeAfterRatioSql,
    "tpcds_style_q22_qty_rollup" -> q22QtyRollupSql,
    "tpcds_style_q28_distinct_buckets" -> q28DistinctBucketsSql,
    "tpcds_style_q43_dow_pivot" -> q43DowPivotSql,
    "tpcds_style_q54_cohort_revenue" -> q54CohortRevenueSql,
    "tpcds_style_q66_monthly_pivot" -> q66MonthlyPivotSql,
    "tpcds_style_q67_rollup_rank" -> q67RollupRankSql,
    "tpcds_style_q78_noreturn_yoy" -> q78NoReturnYoySql,
    "tpcds_style_q82_stock_range" -> q82StockRangeSql)
}
