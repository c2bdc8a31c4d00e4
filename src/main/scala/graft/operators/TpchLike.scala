package graft.operators

import graft.Tables
import graft.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** TPC-H-derived decision-support queries, adapted to the driver's
  * synthetic star schema (no partsupp table; trimmed columns; DOUBLE
  * money columns — see Tables for the decimal-exactness discipline).
  *
  * These are the primary end-to-end exercises of the scan / filter /
  * project / join / aggregate / sort / limit / subquery operator families
  * (SURVEY.md §2.1-2.7). Reference test analog: VeloxTPCHSuite
  * (backends-velox/src/test/.../VeloxTPCHSuite.scala:62-130) over
  * tools/gluten-it/common/src/main/resources/tpch-queries/q*.sql.
  *
  * Scale notes (100 TB design intent):
  *  - dimension tables (region/nation/part-filtered/supplier) are joined
  *    with explicit `broadcast()` hints — no shuffle of the fact table for
  *    dim joins at any SF;
  *  - fact-fact joins (orders⋈lineitem) shuffle on the join key only,
  *    with AQE left to coalesce/skew-split at runtime;
  *  - all aggregates are partial-ready (hash agg with map-side combine is
  *    automatic for the sum/count/min/max family used here).
  */
object TpchLike {

  private val rev1 = "CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST('1.00' AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))"

  // q01: full-scan group-by aggregation (TPC-H Q1)
  private def q01(s: SparkSession, dir: String): DataFrame = {
    val li = load(s, dir, "lineitem")
    li.filter(to_date(col("l_shipdate")) <= lit("1998-09-02").cast("date"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dbl(sum(dec(col("l_quantity")))).as("sum_qty"),
        dbl(sum(dec(col("l_extendedprice")))).as("sum_base_price"),
        dbl(sum(revenue(col("l_extendedprice"), col("l_discount")))).as("sum_disc_price"),
        // charge is a scale-6 decimal sum that reaches 17 significant
        // digits at sf1 — past double's mantissa, so the two engines'
        // (both correct) decimal->double casts can differ by 1 ulp.
        // Round the EXACT decimal to money precision first: the 2-dp
        // value is exactly representable through either cast path
        // (surfaced by the r14 sf1 oracle pass).
        dbl(round(sum(revenue(col("l_extendedprice"), col("l_discount")) * (oneDec + rate(col("l_tax")))), 2)).as("sum_charge"),
        (dbl(sum(dec(col("l_quantity")))) / count(lit(1))).as("avg_qty"),
        (dbl(sum(dec(col("l_extendedprice")))) / count(lit(1))).as("avg_price"),
        (dbl(sum(rate(col("l_discount")))) / count(lit(1))).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  private val q01Sql =
    s"""SELECT l_returnflag, l_linestatus,
       |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
       |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
       |  CAST(SUM($rev1) AS DOUBLE) AS sum_disc_price,
       |  CAST(ROUND(SUM($rev1 * (CAST('1.00' AS DECIMAL(3,2)) + CAST(l_tax AS DECIMAL(4,2)))), 2) AS DOUBLE) AS sum_charge,
       |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
       |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_price,
       |  CAST(SUM(CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) / COUNT(*) AS avg_disc,
       |  COUNT(*) AS count_order
       |FROM lineitem
       |WHERE CAST(l_shipdate AS DATE) <= DATE '1998-09-02'
       |GROUP BY l_returnflag, l_linestatus
       |ORDER BY l_returnflag, l_linestatus""".stripMargin

  // q02: min-cost supplier per part (TPC-H Q2 shape; partsupp surrogate =
  // distinct lineitem part-supplier pairs, cost surrogate = s_acctbal)
  private def q02(s: SparkSession, dir: String): DataFrame = {
    val pairs = load(s, dir, "lineitem").select(col("l_partkey"), col("l_suppkey")).distinct()
    val cand = load(s, dir, "part").filter(col("p_type") === "LARGE")
      .join(pairs, col("p_partkey") === col("l_partkey"))
      .join(load(s, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(load(s, dir, "nation")), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(load(s, dir, "region").filter(col("r_name") === "EUROPE")),
        col("n_regionkey") === col("r_regionkey"))
    val minBal = cand.groupBy(col("p_partkey").as("mb_partkey"))
      .agg(min(col("s_acctbal")).as("min_bal"))
    cand.join(minBal, col("p_partkey") === col("mb_partkey") && col("s_acctbal") === col("min_bal"))
      .select(col("s_acctbal"), col("s_name"), col("n_name"), col("p_partkey"), col("p_name"))
      .orderBy(col("s_acctbal").desc, col("p_partkey"), col("s_name"))
      .limit(100)
  }

  private val q02Sql =
    """WITH pairs AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
      |cand AS (
      |  SELECT p_partkey, p_name, s_suppkey, s_name, s_acctbal, n_name
      |  FROM part, pairs, supplier, nation, region
      |  WHERE p_type = 'LARGE' AND p_partkey = l_partkey AND l_suppkey = s_suppkey
      |    AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey AND r_name = 'EUROPE')
      |SELECT s_acctbal, s_name, n_name, p_partkey, p_name
      |FROM cand c
      |WHERE s_acctbal = (SELECT MIN(s_acctbal) FROM cand m WHERE m.p_partkey = c.p_partkey)
      |ORDER BY s_acctbal DESC, p_partkey, s_name LIMIT 100""".stripMargin

  // q11: important stock value per part with global-fraction having
  // (TPC-H Q11 shape; value surrogate = shipped quantity)
  private def q11(s: SparkSession, dir: String): DataFrame = {
    val inNation = load(s, dir, "lineitem")
      .join(load(s, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(load(s, dir, "nation").filter(col("n_name") === "NATION_5")),
        col("s_nationkey") === col("n_nationkey"))
    val perPart = inNation.groupBy(col("l_partkey"))
      .agg(dbl(sum(dec(col("l_quantity")))).as("value"))
    val total = perPart.agg(sum(col("value")).as("total"))
    perPart.join(broadcast(total))
      .filter(col("value") > col("total") * 0.005)
      .select(col("l_partkey"), col("value"))
      .orderBy(col("value").desc, col("l_partkey"))
  }

  private val q11Sql =
    """WITH per_part AS (
      |  SELECT l_partkey, CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS value
      |  FROM lineitem, supplier, nation
      |  WHERE l_suppkey = s_suppkey AND s_nationkey = n_nationkey AND n_name = 'NATION_5'
      |  GROUP BY l_partkey)
      |SELECT l_partkey, value FROM per_part
      |WHERE value > (SELECT SUM(value) FROM per_part) * 0.005
      |ORDER BY value DESC, l_partkey""".stripMargin

  // q16: supplier count per part attributes with exclusions
  // (TPC-H Q16 shape over the distinct-pairs surrogate)
  private def q16(s: SparkSession, dir: String): DataFrame = {
    // r15: the distinct-pairs pre-pass cost a full-lineitem exchange
    // before the part join; COUNT(DISTINCT l_suppkey) dedups identical
    // (partkey, suppkey) pairs by itself, so the raw pair stream joins
    // the (selective, broadcastable) filtered part table FIRST and only
    // ~1/7 of lineitem ever reaches the aggregate — same result, one
    // full-fact shuffle removed (guide §2.4: a distinct whose dedup the
    // downstream aggregate already performs).
    val pairs = load(s, dir, "lineitem").select(col("l_partkey"), col("l_suppkey"))
    val okSupp = load(s, dir, "supplier").filter(col("s_acctbal") >= 0.0)
    load(s, dir, "part")
      .filter(col("p_brand") =!= "Brand#1" && col("p_type") =!= "PROMO" &&
        col("p_size").isin(1, 4, 9, 16, 25, 36, 49))
      .join(pairs, col("p_partkey") === col("l_partkey"))
      .join(okSupp, col("l_suppkey") === col("s_suppkey"), "left_semi")
      .groupBy(col("p_brand"), col("p_type"), col("p_size"))
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"), col("p_size"))
  }

  private val q16Sql =
    """SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
      |FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) pairs, part
      |WHERE p_partkey = l_partkey AND p_brand <> 'Brand#1' AND p_type <> 'PROMO'
      |  AND p_size IN (1, 4, 9, 16, 25, 36, 49)
      |  AND l_suppkey IN (SELECT s_suppkey FROM supplier WHERE s_acctbal >= 0.0)
      |GROUP BY p_brand, p_type, p_size
      |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin

  // q03: 3-way join + group-by + top-k (TPC-H Q3, no shippriority column)
  private def q03(s: SparkSession, dir: String): DataFrame = {
    val cust = load(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
    val ord = load(s, dir, "orders").filter(to_date(col("o_orderdate")) < lit("1997-06-01").cast("date"))
    val li = load(s, dir, "lineitem").filter(to_date(col("l_shipdate")) > lit("1997-06-01").cast("date"))
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), to_date(col("o_orderdate")).cast("string").as("orderdate"))
      .agg(dbl(sum(revenue(col("l_extendedprice"), col("l_discount")))).as("revenue"))
      .select(col("l_orderkey"), col("revenue"), col("orderdate"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  private val q03Sql =
    s"""SELECT l_orderkey, CAST(SUM($rev1) AS DOUBLE) AS revenue, CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS orderdate
       |FROM customer JOIN orders ON c_custkey = o_custkey JOIN lineitem ON l_orderkey = o_orderkey
       |WHERE c_mktsegment = 'BUILDING' AND CAST(o_orderdate AS DATE) < DATE '1997-06-01'
       |  AND CAST(l_shipdate AS DATE) > DATE '1997-06-01'
       |GROUP BY l_orderkey, CAST(CAST(o_orderdate AS DATE) AS VARCHAR)
       |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin

  // q05: 6-way snowflake join (TPC-H Q5) — dims broadcast
  private def q05(s: SparkSession, dir: String): DataFrame = {
    val region = load(s, dir, "region").filter(col("r_name") === "ASIA")
    val nation = load(s, dir, "nation")
    val cust = load(s, dir, "customer")
    val supp = load(s, dir, "supplier")
    val ord = load(s, dir, "orders")
      .filter(to_date(col("o_orderdate")) >= lit("1996-01-01").cast("date") &&
        to_date(col("o_orderdate")) < lit("1997-01-01").cast("date"))
    val li = load(s, dir, "lineitem")
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .join(supp, col("l_suppkey") === col("s_suppkey") && col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(dbl(sum(revenue(col("l_extendedprice"), col("l_discount")))).as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  private val q05Sql =
    s"""SELECT n_name, CAST(SUM($rev1) AS DOUBLE) AS revenue
       |FROM customer, orders, lineitem, supplier, nation, region
       |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey AND l_suppkey = s_suppkey
       |  AND c_nationkey = s_nationkey AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
       |  AND r_name = 'ASIA' AND CAST(o_orderdate AS DATE) >= DATE '1996-01-01'
       |  AND CAST(o_orderdate AS DATE) < DATE '1997-01-01'
       |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin

  // q06: scan + multi-predicate filter + global agg (TPC-H Q6)
  private def q06(s: SparkSession, dir: String): DataFrame =
    load(s, dir, "lineitem")
      .filter(to_date(col("l_shipdate")) >= lit("1996-01-01").cast("date") &&
        to_date(col("l_shipdate")) < lit("1997-01-01").cast("date") &&
        col("l_discount").between(0.03, 0.05) && col("l_quantity") < 24)
      .agg(dbl(sum(dec(col("l_extendedprice")) * rate(col("l_discount")))).as("revenue"))

  private val q06Sql =
    """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue
      |FROM lineitem
      |WHERE CAST(l_shipdate AS DATE) >= DATE '1996-01-01' AND CAST(l_shipdate AS DATE) < DATE '1997-01-01'
      |  AND l_discount BETWEEN 0.03 AND 0.05 AND l_quantity < 24""".stripMargin

  // q07: volume shipping between two nations; self-joined dim (TPC-H Q7)
  private def q07(s: SparkSession, dir: String): DataFrame = {
    val n1 = load(s, dir, "nation").select(col("n_nationkey").as("n1_key"), col("n_name").as("supp_nation"))
    val n2 = load(s, dir, "nation").select(col("n_nationkey").as("n2_key"), col("n_name").as("cust_nation"))
    load(s, dir, "lineitem")
      .join(load(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .join(load(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
      .join(load(s, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(n1), col("s_nationkey") === col("n1_key"))
      .join(broadcast(n2), col("c_nationkey") === col("n2_key"))
      .filter((col("supp_nation") === "NATION_1" && col("cust_nation") === "NATION_2") ||
        (col("supp_nation") === "NATION_2" && col("cust_nation") === "NATION_1"))
      .groupBy(col("supp_nation"), col("cust_nation"), year(col("l_shipdate")).as("l_year"))
      .agg(dbl(sum(revenue(col("l_extendedprice"), col("l_discount")))).as("revenue"))
      .orderBy(col("supp_nation"), col("cust_nation"), col("l_year"))
  }

  private val q07Sql =
    s"""SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       |  CAST(EXTRACT(YEAR FROM l_shipdate) AS INTEGER) AS l_year,
       |  CAST(SUM($rev1) AS DOUBLE) AS revenue
       |FROM supplier, lineitem, orders, customer, nation n1, nation n2
       |WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey AND c_custkey = o_custkey
       |  AND s_nationkey = n1.n_nationkey AND c_nationkey = n2.n_nationkey
       |  AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
       |    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
       |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin

  // q08: market share — conditional aggregation over an 7-way join (TPC-H Q8)
  private def q08(s: SparkSession, dir: String): DataFrame = {
    val vol = revenue(col("l_extendedprice"), col("l_discount"))
    load(s, dir, "lineitem")
      .join(broadcast(load(s, dir, "part").filter(col("p_type") === "PROMO")), col("l_partkey") === col("p_partkey"))
      .join(load(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .join(load(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
      .join(broadcast(load(s, dir, "nation").select(col("n_nationkey").as("cn_key"), col("n_regionkey"))), col("c_nationkey") === col("cn_key"))
      .join(broadcast(load(s, dir, "region").filter(col("r_name") === "AMERICA")), col("n_regionkey") === col("r_regionkey"))
      .join(load(s, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(load(s, dir, "nation").select(col("n_nationkey").as("sn_key"), col("n_name").as("nation"))), col("s_nationkey") === col("sn_key"))
      .groupBy(year(col("o_orderdate")).as("o_year"))
      .agg((dbl(sum(when(col("nation") === "NATION_3", vol))) / dbl(sum(vol))).as("mkt_share"))
      .orderBy(col("o_year"))
  }

  private val q08Sql =
    s"""SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS INTEGER) AS o_year,
       |  CAST(SUM(CASE WHEN n2.n_name = 'NATION_3' THEN $rev1 END) AS DOUBLE)
       |    / CAST(SUM($rev1) AS DOUBLE) AS mkt_share
       |FROM lineitem, part, orders, customer, nation n1, region, supplier, nation n2
       |WHERE l_partkey = p_partkey AND p_type = 'PROMO' AND l_orderkey = o_orderkey
       |  AND o_custkey = c_custkey AND c_nationkey = n1.n_nationkey
       |  AND n1.n_regionkey = r_regionkey AND r_name = 'AMERICA'
       |  AND l_suppkey = s_suppkey AND s_nationkey = n2.n_nationkey
       |GROUP BY 1 ORDER BY 1""".stripMargin

  // q09: profit by supplier nation and order year (TPC-H Q9, no partsupp)
  private def q09(s: SparkSession, dir: String): DataFrame =
    load(s, dir, "lineitem")
      .join(broadcast(load(s, dir, "part").filter(col("p_type") === "STANDARD")), col("l_partkey") === col("p_partkey"))
      .join(load(s, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(load(s, dir, "nation")), col("s_nationkey") === col("n_nationkey"))
      .join(load(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("n_name").as("nation"), year(col("o_orderdate")).as("o_year"))
      .agg(dbl(sum(revenue(col("l_extendedprice"), col("l_discount")))).as("sum_profit"))
      .orderBy(col("nation"), col("o_year").desc)

  private val q09Sql =
    s"""SELECT n_name AS nation, CAST(EXTRACT(YEAR FROM o_orderdate) AS INTEGER) AS o_year,
       |  CAST(SUM($rev1) AS DOUBLE) AS sum_profit
       |FROM lineitem, part, supplier, nation, orders
       |WHERE l_partkey = p_partkey AND p_type = 'STANDARD' AND l_suppkey = s_suppkey
       |  AND s_nationkey = n_nationkey AND l_orderkey = o_orderkey
       |GROUP BY 1, 2 ORDER BY nation, o_year DESC""".stripMargin

  // q10: returned-item ranking (TPC-H Q10 on available columns)
  private def q10(s: SparkSession, dir: String): DataFrame =
    load(s, dir, "lineitem").filter(col("l_returnflag") === "R")
      .join(load(s, dir, "orders")
        .filter(to_date(col("o_orderdate")) >= lit("1996-07-01").cast("date") &&
          to_date(col("o_orderdate")) < lit("1996-10-01").cast("date")), col("l_orderkey") === col("o_orderkey"))
      .join(load(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"), col("c_mktsegment"))
      .agg(dbl(sum(revenue(col("l_extendedprice"), col("l_discount")))).as("revenue"))
      .select(col("c_custkey"), col("c_name"), col("revenue"), col("c_acctbal"), col("c_mktsegment"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)

  private val q10Sql =
    s"""SELECT c_custkey, c_name, CAST(SUM($rev1) AS DOUBLE) AS revenue, c_acctbal, c_mktsegment
       |FROM customer, orders, lineitem
       |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey AND l_returnflag = 'R'
       |  AND CAST(o_orderdate AS DATE) >= DATE '1996-07-01' AND CAST(o_orderdate AS DATE) < DATE '1996-10-01'
       |GROUP BY c_custkey, c_name, c_acctbal, c_mktsegment
       |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin

  // q13: customer order-count distribution — outer join + double aggregation (TPC-H Q13)
  private def q13(s: SparkSession, dir: String): DataFrame =
    load(s, dir, "customer")
      .join(load(s, dir, "orders"), col("c_custkey") === col("o_custkey"), "left_outer")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)

  private val q13Sql =
    """WITH c_orders AS (
      |  SELECT c_custkey, COUNT(o_orderkey) AS c_count
      |  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      |  GROUP BY c_custkey)
      |SELECT c_count, COUNT(*) AS custdist FROM c_orders
      |GROUP BY c_count ORDER BY custdist DESC, c_count DESC""".stripMargin

  // q14: promo revenue share — conditional agg (TPC-H Q14)
  private def q14(s: SparkSession, dir: String): DataFrame = {
    val vol = revenue(col("l_extendedprice"), col("l_discount"))
    load(s, dir, "lineitem")
      .filter(to_date(col("l_shipdate")) >= lit("1996-03-01").cast("date") &&
        to_date(col("l_shipdate")) < lit("1996-04-01").cast("date"))
      .join(broadcast(load(s, dir, "part")), col("l_partkey") === col("p_partkey"))
      .agg((dbl(sum(when(col("p_type") === "PROMO", vol))) * lit(100.0) / dbl(sum(vol))).as("promo_revenue"))
  }

  private val q14Sql =
    s"""SELECT CAST(SUM(CASE WHEN p_type = 'PROMO' THEN $rev1 END) AS DOUBLE) * 100.0
       |  / CAST(SUM($rev1) AS DOUBLE) AS promo_revenue
       |FROM lineitem, part
       |WHERE l_partkey = p_partkey AND CAST(l_shipdate AS DATE) >= DATE '1996-03-01'
       |  AND CAST(l_shipdate AS DATE) < DATE '1996-04-01'""".stripMargin

  // q15: top supplier via scalar subquery on an aggregated view (TPC-H Q15)
  private def q15(s: SparkSession, dir: String): DataFrame = {
    val rev = load(s, dir, "lineitem")
      .filter(to_date(col("l_shipdate")) >= lit("1996-01-01").cast("date") &&
        to_date(col("l_shipdate")) < lit("1996-04-01").cast("date"))
      .groupBy(col("l_suppkey").as("supplier_no"))
      .agg(dbl(sum(revenue(col("l_extendedprice"), col("l_discount")))).as("total_revenue"))
    val maxRev = rev.agg(max(col("total_revenue")).as("max_revenue"))
    load(s, dir, "supplier")
      .join(rev, col("s_suppkey") === col("supplier_no"))
      .join(broadcast(maxRev), col("total_revenue") === col("max_revenue"))
      .select(col("s_suppkey"), col("s_name"), col("total_revenue"))
      .orderBy(col("s_suppkey"))
  }

  private val q15Sql =
    s"""WITH rev AS (
       |  SELECT l_suppkey AS supplier_no, CAST(SUM($rev1) AS DOUBLE) AS total_revenue
       |  FROM lineitem
       |  WHERE CAST(l_shipdate AS DATE) >= DATE '1996-01-01' AND CAST(l_shipdate AS DATE) < DATE '1996-04-01'
       |  GROUP BY l_suppkey)
       |SELECT s_suppkey, s_name, total_revenue FROM supplier, rev
       |WHERE s_suppkey = supplier_no AND total_revenue = (SELECT MAX(total_revenue) FROM rev)
       |ORDER BY s_suppkey""".stripMargin

  // q17: small-quantity revenue vs per-part average — agg-derived join (TPC-H Q17)
  private def q17(s: SparkSession, dir: String): DataFrame = {
    val li = load(s, dir, "lineitem")
    val partAvg = li.groupBy(col("l_partkey").as("pa_partkey"))
      .agg((dbl(sum(dec(col("l_quantity")))) / count(lit(1))).as("avg_qty"))
    li.join(broadcast(load(s, dir, "part").filter(col("p_brand") === "Brand#1")), col("l_partkey") === col("p_partkey"))
      .join(partAvg, col("l_partkey") === col("pa_partkey"))
      .filter(col("l_quantity") < lit(0.2) * col("avg_qty"))
      .agg((dbl(sum(dec(col("l_extendedprice")))) / lit(7.0)).as("avg_yearly"))
  }

  private val q17Sql =
    """WITH pq AS (
      |  SELECT l_partkey AS pa_partkey, CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_qty
      |  FROM lineitem GROUP BY l_partkey)
      |SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / 7.0 AS avg_yearly
      |FROM lineitem JOIN part ON p_partkey = l_partkey JOIN pq ON pa_partkey = l_partkey
      |WHERE p_brand = 'Brand#1' AND l_quantity < 0.2 * avg_qty""".stripMargin

  // q18: large-volume orders — having filter on grouped fact (TPC-H Q18)
  private def q18(s: SparkSession, dir: String): DataFrame = {
    val big = load(s, dir, "lineitem")
      .groupBy(col("l_orderkey"))
      .agg(dbl(sum(dec(col("l_quantity")))).as("sum_qty"))
      .filter(col("sum_qty") > 140)
    big.join(load(s, dir, "orders"), col("o_orderkey") === col("l_orderkey"))
      .join(load(s, dir, "customer"), col("c_custkey") === col("o_custkey"))
      .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
        to_date(col("o_orderdate")).cast("string").as("orderdate"), col("o_totalprice"), col("sum_qty"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(100)
  }

  private val q18Sql =
    """WITH big AS (
      |  SELECT l_orderkey, CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
      |  FROM lineitem GROUP BY l_orderkey
      |  HAVING CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) > 140)
      |SELECT c_custkey, c_name, o_orderkey, CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS orderdate, o_totalprice, sum_qty
      |FROM big JOIN orders ON o_orderkey = l_orderkey JOIN customer ON c_custkey = o_custkey
      |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin

  // q19: disjunctive multi-attribute predicates over a join (TPC-H Q19)
  private def q19(s: SparkSession, dir: String): DataFrame =
    load(s, dir, "lineitem")
      .join(broadcast(load(s, dir, "part")), col("l_partkey") === col("p_partkey"))
      .filter(
        (col("p_brand") === "Brand#1" && col("p_size").between(1, 15) && col("l_quantity").between(1, 11)) ||
        (col("p_brand") === "Brand#2" && col("p_size").between(1, 25) && col("l_quantity").between(10, 20)) ||
        (col("p_brand") === "Brand#3" && col("p_size").between(1, 35) && col("l_quantity").between(20, 30)))
      .agg(dbl(sum(revenue(col("l_extendedprice"), col("l_discount")))).as("revenue"))

  private val q19Sql =
    s"""SELECT CAST(SUM($rev1) AS DOUBLE) AS revenue
       |FROM lineitem, part
       |WHERE p_partkey = l_partkey AND (
       |  (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 11) OR
       |  (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 20) OR
       |  (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 30))""".stripMargin

  // q04: order priority checking — EXISTS over the fact table (TPC-H Q4;
  // no commit/receipt dates in this schema, so "late" = shipped more than
  // 30 days after the order date)
  private def q04(s: SparkSession, dir: String): DataFrame = {
    val ord = load(s, dir, "orders")
      .filter(to_date(col("o_orderdate")) >= lit("1996-07-01").cast("date") &&
        to_date(col("o_orderdate")) < lit("1996-10-01").cast("date"))
    val li = load(s, dir, "lineitem").select(col("l_orderkey"), col("l_shipdate"))
    ord.join(li, col("l_orderkey") === col("o_orderkey") &&
        to_date(col("l_shipdate")) > date_add(to_date(col("o_orderdate")), 30), "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))
      .orderBy(col("o_orderpriority"))
  }

  private val q04Sql =
    """SELECT o_orderpriority, COUNT(*) AS order_count
      |FROM orders
      |WHERE CAST(o_orderdate AS DATE) >= DATE '1996-07-01'
      |  AND CAST(o_orderdate AS DATE) < DATE '1996-10-01'
      |  AND EXISTS (SELECT 1 FROM lineitem
      |              WHERE l_orderkey = o_orderkey
      |                AND CAST(l_shipdate AS DATE) > CAST(o_orderdate AS DATE) + 30)
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  // q12: shipping class vs order priority — conditional counts over a
  // fact-fact join (TPC-H Q12 shape; returnflag stands in for shipmode,
  // late receipt = shipped >30 days after ordering)
  private def q12(s: SparkSession, dir: String): DataFrame = {
    val hi = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    load(s, dir, "orders")
      .join(load(s, dir, "lineitem"), col("o_orderkey") === col("l_orderkey"))
      .filter(to_date(col("l_shipdate")) >= lit("1996-01-01").cast("date") &&
        to_date(col("l_shipdate")) < lit("1997-01-01").cast("date") &&
        to_date(col("l_shipdate")) > date_add(to_date(col("o_orderdate")), 30))
      .groupBy(col("l_returnflag").as("ship_class"))
      .agg(sum(when(hi, 1L).otherwise(0L)).as("high_line_count"),
        sum(when(hi, 0L).otherwise(1L)).as("low_line_count"))
      .orderBy(col("ship_class"))
  }

  private val q12Sql =
    """SELECT l_returnflag AS ship_class,
      |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
      |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
      |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      |WHERE CAST(l_shipdate AS DATE) >= DATE '1996-01-01'
      |  AND CAST(l_shipdate AS DATE) < DATE '1997-01-01'
      |  AND CAST(l_shipdate AS DATE) > CAST(o_orderdate AS DATE) + 30
      |GROUP BY l_returnflag ORDER BY ship_class""".stripMargin

  // q20: suppliers with large shipped volume of a part class — semi join
  // against an aggregate-filtered set (TPC-H Q20 shape over the
  // no-partsupp schema: shipped quantity stands in for available stock)
  private def q20(s: SparkSession, dir: String): DataFrame = {
    val shipped = load(s, dir, "lineitem")
      .filter(to_date(col("l_shipdate")) >= lit("1996-01-01").cast("date") &&
        to_date(col("l_shipdate")) < lit("1997-01-01").cast("date"))
      .join(broadcast(load(s, dir, "part").filter(col("p_type") === "SMALL")),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("l_suppkey"))
      .agg(dbl(sum(dec(col("l_quantity")))).as("total_qty"))
      .filter(col("total_qty") > 400.0)
    load(s, dir, "supplier")
      .join(broadcast(load(s, dir, "nation").filter(col("n_name") === "NATION_2")),
        col("s_nationkey") === col("n_nationkey"))
      .join(shipped, col("s_suppkey") === col("l_suppkey"), "left_semi")
      .select(col("s_name"), col("s_acctbal"))
      .orderBy(col("s_name"))
  }

  private val q20Sql =
    """SELECT s_name, s_acctbal
      |FROM supplier JOIN nation ON s_nationkey = n_nationkey
      |WHERE n_name = 'NATION_2'
      |  AND s_suppkey IN (
      |    SELECT l_suppkey FROM lineitem JOIN part ON l_partkey = p_partkey
      |    WHERE p_type = 'SMALL'
      |      AND CAST(l_shipdate AS DATE) >= DATE '1996-01-01'
      |      AND CAST(l_shipdate AS DATE) < DATE '1997-01-01'
      |    GROUP BY l_suppkey
      |    HAVING CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) > 400.0)
      |ORDER BY s_name""".stripMargin

  // q21: suppliers who kept orders waiting — EXISTS + NOT EXISTS on the
  // same fact (TPC-H Q21; late = shipped >60 days after the order date)
  private def q21(s: SparkSession, dir: String): DataFrame = {
    val ordF = load(s, dir, "orders").filter(col("o_orderstatus") === "F")
      .select(col("o_orderkey"), col("o_orderdate"))
    val li = load(s, dir, "lineitem").select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"))
    val late = li.join(ordF, col("l_orderkey") === col("o_orderkey"))
      .filter(to_date(col("l_shipdate")) > date_add(to_date(col("o_orderdate")), 60))
      .select(col("l_orderkey"), col("l_suppkey"))
    late
      .join(load(s, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
      .join(li.select(col("l_orderkey").as("ok2"), col("l_suppkey").as("sk2")),
        col("ok2") === col("l_orderkey") && col("sk2") =!= col("l_suppkey"), "left_semi")
      .join(late.select(col("l_orderkey").as("ok3"), col("l_suppkey").as("sk3")),
        col("ok3") === col("l_orderkey") && col("sk3") =!= col("l_suppkey"), "left_anti")
      .groupBy(col("s_name"))
      .agg(count(lit(1)).as("numwait"))
      .orderBy(col("numwait").desc, col("s_name"))
      .limit(100)
  }

  private val q21Sql =
    """SELECT s_name, COUNT(*) AS numwait
      |FROM supplier, lineitem l1, orders
      |WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey AND o_orderstatus = 'F'
      |  AND CAST(l1.l_shipdate AS DATE) > CAST(o_orderdate AS DATE) + 60
      |  AND EXISTS (SELECT 1 FROM lineitem l2
      |              WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
      |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
      |                  WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
      |                    AND CAST(l3.l_shipdate AS DATE) > CAST(o_orderdate AS DATE) + 60)
      |GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 100""".stripMargin

  // q22: customers with above-average balance and no orders —
  // scalar subquery + anti join (TPC-H Q22, mktsegment instead of phone)
  private def q22(s: SparkSession, dir: String): DataFrame = {
    val cust = load(s, dir, "customer")
    val avgBal = cust.filter(col("c_acctbal") > 0.0)
      .agg((dbl(sum(dec(col("c_acctbal")))) / count(lit(1))).as("avg_bal"))
    cust.filter(col("c_mktsegment").isin("AUTOMOBILE", "BUILDING", "MACHINERY"))
      .join(broadcast(avgBal))
      .filter(col("c_acctbal") > col("avg_bal"))
      .join(load(s, dir, "orders"), col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("numcust"), dbl(sum(dec(col("c_acctbal")))).as("totacctbal"))
      .orderBy(col("c_mktsegment"))
  }

  private val q22Sql =
    """SELECT c_mktsegment, COUNT(*) AS numcust,
      |  CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS totacctbal
      |FROM customer
      |WHERE c_mktsegment IN ('AUTOMOBILE', 'BUILDING', 'MACHINERY')
      |  AND c_acctbal > (SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*)
      |                   FROM customer WHERE c_acctbal > 0.0)
      |  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "tpch_q01_pricing_summary" -> q01 _,
    "tpch_q02_min_cost_supplier" -> q02 _,
    "tpch_q03_topk_revenue" -> q03 _,
    "tpch_q04_priority_check" -> q04 _,
    "tpch_q11_important_stock" -> q11 _,
    "tpch_q12_ship_priority" -> q12 _,
    "tpch_q20_excess_stock" -> q20 _,
    "tpch_q21_waiting_suppliers" -> q21 _,
    "tpch_q16_supplier_count" -> q16 _,
    "tpch_q05_local_supplier" -> q05 _,
    "tpch_q06_forecast_revenue" -> q06 _,
    "tpch_q07_volume_shipping" -> q07 _,
    "tpch_q08_market_share" -> q08 _,
    "tpch_q09_nation_profit" -> q09 _,
    "tpch_q10_returned_items" -> q10 _,
    "tpch_q13_order_counts" -> q13 _,
    "tpch_q14_promo_share" -> q14 _,
    "tpch_q15_top_supplier" -> q15 _,
    "tpch_q17_small_qty" -> q17 _,
    "tpch_q18_large_orders" -> q18 _,
    "tpch_q19_disjunctive" -> q19 _,
    "tpch_q22_dormant_customers" -> q22 _)

  val oracles: Map[String, String] = Map(
    "tpch_q01_pricing_summary" -> q01Sql,
    "tpch_q02_min_cost_supplier" -> q02Sql,
    "tpch_q03_topk_revenue" -> q03Sql,
    "tpch_q04_priority_check" -> q04Sql,
    "tpch_q11_important_stock" -> q11Sql,
    "tpch_q12_ship_priority" -> q12Sql,
    "tpch_q20_excess_stock" -> q20Sql,
    "tpch_q21_waiting_suppliers" -> q21Sql,
    "tpch_q16_supplier_count" -> q16Sql,
    "tpch_q05_local_supplier" -> q05Sql,
    "tpch_q06_forecast_revenue" -> q06Sql,
    "tpch_q07_volume_shipping" -> q07Sql,
    "tpch_q08_market_share" -> q08Sql,
    "tpch_q09_nation_profit" -> q09Sql,
    "tpch_q10_returned_items" -> q10Sql,
    "tpch_q13_order_counts" -> q13Sql,
    "tpch_q14_promo_share" -> q14Sql,
    "tpch_q15_top_supplier" -> q15Sql,
    "tpch_q17_small_qty" -> q17Sql,
    "tpch_q18_large_orders" -> q18Sql,
    "tpch_q19_disjunctive" -> q19Sql,
    "tpch_q22_dormant_customers" -> q22Sql)
}
