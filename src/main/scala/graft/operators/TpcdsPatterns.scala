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

  val queries: Map[String, Q] = Map(
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
    "tpcds_style_q30_above_avg" -> q30AboveAvg)

  val oracles: Map[String, String] = Map(
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
    "tpcds_style_q30_above_avg" -> q30AboveAvgSql)
}
