package graft.operators

import graft.Tables._
import graft.functions.RefHash
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scalar-expression coverage batteries (SURVEY.md §2.10): one query per
  * function family, each computing a column per function over real table
  * data with a dialect-matched DuckDB oracle. Reference test analogs:
  * ScalarFunctionsValidateSuite.scala (1510 LoC),
  * VeloxStringFunctionsSuite.scala, DateFunctionsValidateSuite.scala,
  * MathFunctionsValidateSuite.scala, JsonFunctionsValidateSuite.scala
  * (backends-velox/src/test; see SURVEY.md §5).
  *
  * Dialect notes baked into the oracles:
  *  - DuckDB length/strpos/ascii return BIGINT → CAST to INTEGER;
  *  - Spark ceil/floor return BIGINT → DuckDB side CAST to BIGINT;
  *  - DuckDB regexp_replace needs the 'g' flag to match Spark's
  *    replace-all; DuckDB double→int CAST rounds while Spark truncates
  *    (→ trunc() first); DuckDB EXTRACT(DOW) is 0-based Sunday while
  *    Spark dayofweek is 1-based.
  *  - transcendental fns (exp/ln/sin...) are correctly-rounded in neither
  *    engine → round(…, 9); sqrt IS IEEE-exact in both.
  */
object ScalarOps {

  type Q = (SparkSession, String) => DataFrame

  private val fnString: Q = (s, dir) =>
    load(s, dir, "documents")
      .select(col("doc_id"),
        lower(col("source")).as("lo"),
        upper(col("lang")).as("up"),
        length(col("text")).as("len"),
        substring(col("text"), 5, 12).as("sub"),
        trim(concat(lit("  "), col("source"), lit(" "))).as("tr"),
        lpad(col("lang"), 6, "*").as("lp"),
        rpad(col("lang"), 6, "#").as("rp"),
        expr("replace(source, 'src', 'S')").as("rep"),
        reverse(col("lang")).as("rev"),
        concat_ws("|", col("lang"), col("source")).as("cw"),
        expr("left(text, 8)").as("lft"),
        expr("right(source, 2)").as("rgt"),
        repeat(col("lang"), 2).as("rpt"),
        expr("split_part(source, 'rc', 2)").as("sp"),
        instr(col("text"), "data").as("pos"),
        col("text").contains("spark").as("has_spark"),
        col("source").startsWith("src1").as("sw"),
        col("source").endsWith("1").as("ew"),
        initcap(col("lang")).as("ic"),
        translate(col("source"), "src", "XYZ").as("tl"))
      .orderBy(col("doc_id"))

  private val fnStringSql =
    """SELECT doc_id,
      |  lower(source) AS lo, upper(lang) AS up,
      |  CAST(length(text) AS INTEGER) AS len,
      |  substr(text, 5, 12) AS sub,
      |  trim('  ' || source || ' ') AS tr,
      |  lpad(lang, 6, '*') AS lp, rpad(lang, 6, '#') AS rp,
      |  replace(source, 'src', 'S') AS rep, reverse(lang) AS rev,
      |  concat_ws('|', lang, source) AS cw,
      |  left(text, 8) AS lft, right(source, 2) AS rgt,
      |  repeat(lang, 2) AS rpt,
      |  split_part(source, 'rc', 2) AS sp,
      |  CAST(strpos(text, 'data') AS INTEGER) AS pos,
      |  contains(text, 'spark') AS has_spark,
      |  starts_with(source, 'src1') AS sw,
      |  suffix(source, '1') AS ew,
      |  concat(upper(substr(lang, 1, 1)), lower(substr(lang, 2))) AS ic,
      |  translate(source, 'src', 'XYZ') AS tl
      |FROM documents ORDER BY doc_id""".stripMargin

  private val fnMath: Q = (s, dir) =>
    load(s, dir, "part")
      .select(col("p_partkey"),
        abs(col("p_size") - 25).as("a"),
        ceil(col("p_retailprice") / 100.0).as("ce"),
        floor(col("p_retailprice") / 100.0).as("fl"),
        round(col("p_retailprice"), 1).as("rnd"),
        sqrt(col("p_size").cast("double")).as("sq"),
        round(exp(col("p_size") / 50.0), 9).as("ex"),
        round(log(col("p_size").cast("double") + 1.0), 9).as("ln_"),
        round(log10(col("p_size").cast("double") + 1.0), 9).as("lg"),
        round(pow(col("p_size").cast("double"), 2.0), 6).as("pw"),
        signum(col("p_size") - 25).cast("double").as("sg"),
        greatest(col("p_size"), lit(25)).as("gr"),
        least(col("p_size"), lit(25)).as("ls"),
        pmod(col("p_size"), lit(7)).as("pm"),
        (col("p_size") % 7).as("md"),
        round(sin(col("p_size").cast("double")), 9).as("sn"),
        round(cos(col("p_size").cast("double")), 9).as("cs"),
        round(atan(col("p_size").cast("double")), 9).as("at"),
        expr("shiftleft(p_size, 2)").as("shl"),
        expr("shiftright(p_size, 1)").as("shr"),
        (col("p_size").bitwiseAND(12)).as("ba"),
        (col("p_size").bitwiseOR(3)).as("bo"),
        (col("p_size").bitwiseXOR(21)).as("bx"),
        bitwise_not(col("p_size")).as("bn"),
        expr("bit_count(p_size)").as("bc"),
        factorial(col("p_size") % 10).as("fact"),
        upper(hex(col("p_size"))).as("hx"))
      .orderBy(col("p_partkey"))

  private val fnMathSql =
    """SELECT p_partkey,
      |  abs(p_size - 25) AS a,
      |  CAST(ceil(p_retailprice / 100.0) AS BIGINT) AS ce,
      |  CAST(floor(p_retailprice / 100.0) AS BIGINT) AS fl,
      |  round(p_retailprice, 1) AS rnd,
      |  sqrt(CAST(p_size AS DOUBLE)) AS sq,
      |  round(exp(p_size / 50.0), 9) AS ex,
      |  round(ln(CAST(p_size AS DOUBLE) + 1.0), 9) AS ln_,
      |  round(log10(CAST(p_size AS DOUBLE) + 1.0), 9) AS lg,
      |  round(pow(CAST(p_size AS DOUBLE), 2.0), 6) AS pw,
      |  CAST(sign(p_size - 25) AS DOUBLE) AS sg,
      |  CAST(greatest(p_size, 25) AS INTEGER) AS gr, CAST(least(p_size, 25) AS INTEGER) AS ls,
      |  ((p_size % 7) + 7) % 7 AS pm,
      |  p_size % 7 AS md,
      |  round(sin(CAST(p_size AS DOUBLE)), 9) AS sn,
      |  round(cos(CAST(p_size AS DOUBLE)), 9) AS cs,
      |  round(atan(CAST(p_size AS DOUBLE)), 9) AS at,
      |  p_size << 2 AS shl, p_size >> 1 AS shr,
      |  p_size & 12 AS ba, p_size | 3 AS bo, xor(p_size, 21) AS bx,
      |  CAST(-p_size - 1 AS INTEGER) AS bn,
      |  CAST(bit_count(p_size) AS INTEGER) AS bc,
      |  CAST(factorial(p_size % 10) AS BIGINT) AS fact,
      |  upper(to_hex(p_size)) AS hx
      |FROM part ORDER BY p_partkey""".stripMargin

  private val fnDate: Q = (s, dir) =>
    load(s, dir, "orders")
      .select(col("o_orderkey"),
        year(col("o_orderdate")).as("yr"),
        month(col("o_orderdate")).as("mo"),
        dayofmonth(col("o_orderdate")).as("dy"),
        quarter(col("o_orderdate")).as("qt"),
        dayofweek(col("o_orderdate")).as("dow"),
        weekofyear(col("o_orderdate")).as("wk"),
        date_add(to_date(col("o_orderdate")), 30).cast("string").as("plus30"),
        datediff(to_date(col("o_orderdate")), lit("1996-01-01").cast("date")).as("dd"),
        last_day(to_date(col("o_orderdate"))).cast("string").as("ld"),
        trunc(to_date(col("o_orderdate")), "month").cast("string").as("mstart"),
        unix_timestamp(col("o_orderdate")).as("epoch_s"),
        make_date(lit(2020), (col("o_orderkey") % 12 + 1).cast("int"), lit(15)).cast("string").as("md"),
        date_format(col("o_orderdate"), "yyyy-MM").as("ym"))
      .orderBy(col("o_orderkey"))
      .limit(2000)

  private val fnDateSql =
    """SELECT o_orderkey,
      |  CAST(EXTRACT(YEAR FROM o_orderdate) AS INTEGER) AS yr,
      |  CAST(EXTRACT(MONTH FROM o_orderdate) AS INTEGER) AS mo,
      |  CAST(EXTRACT(DAY FROM o_orderdate) AS INTEGER) AS dy,
      |  CAST(EXTRACT(QUARTER FROM o_orderdate) AS INTEGER) AS qt,
      |  CAST(EXTRACT(DOW FROM o_orderdate) + 1 AS INTEGER) AS dow,
      |  CAST(EXTRACT(WEEK FROM o_orderdate) AS INTEGER) AS wk,
      |  CAST(CAST(CAST(o_orderdate AS DATE) + INTERVAL 30 DAY AS DATE) AS VARCHAR) AS plus30,
      |  CAST(date_diff('day', DATE '1996-01-01', CAST(o_orderdate AS DATE)) AS INTEGER) AS dd,
      |  CAST(last_day(CAST(o_orderdate AS DATE)) AS VARCHAR) AS ld,
      |  CAST(CAST(date_trunc('month', CAST(o_orderdate AS DATE)) AS DATE) AS VARCHAR) AS mstart,
      |  CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s,
      |  CAST(make_date(2020, CAST(o_orderkey % 12 + 1 AS INTEGER), 15) AS VARCHAR) AS md,
      |  strftime(o_orderdate, '%Y-%m') AS ym
      |FROM orders ORDER BY o_orderkey LIMIT 2000""".stripMargin

  // INTERVAL arithmetic (year-month + day-time families): literal
  // intervals, constructor-built intervals (make_ym/dt_interval,
  // timestampadd), month-end clamping — every result rendered as a
  // string so both engines compare the same calendar answer
  private val fnInterval: Q = (s, dir) =>
    load(s, dir, "orders")
      .select(col("o_orderkey"),
        (to_date(col("o_orderdate")) + expr("INTERVAL 1 MONTH"))
          .cast("string").as("plus_1mo"),
        (to_date(col("o_orderdate")) - expr("INTERVAL 1 YEAR"))
          .cast("string").as("minus_1yr"),
        (col("o_orderdate") + expr("INTERVAL 90 MINUTE"))
          .cast("string").as("plus_90min"),
        (to_date(col("o_orderdate")) +
          make_ym_interval(lit(0), (col("o_orderkey") % 12).cast("int")))
          .cast("string").as("plus_k_months"),
        (col("o_orderdate") + make_dt_interval(
          (col("o_orderkey") % 30).cast("int"), lit(0), lit(0), lit(0)))
          .cast("string").as("plus_k_days"),
        expr("timestampadd(HOUR, CAST(o_orderkey % 48 AS INT), o_orderdate)")
          .cast("string").as("plus_k_hours"),
        make_timestamp(lit(2024), lit(2), lit(29), lit(23), lit(59),
          (col("o_orderkey") % 60).cast("int")).cast("string").as("made_ts"))
      .orderBy(col("o_orderkey"))
      .limit(2000)

  private val fnIntervalSql =
    """SELECT o_orderkey,
      |  CAST(CAST(CAST(o_orderdate AS DATE) + INTERVAL 1 MONTH AS DATE) AS VARCHAR) AS plus_1mo,
      |  CAST(CAST(CAST(o_orderdate AS DATE) - INTERVAL 1 YEAR AS DATE) AS VARCHAR) AS minus_1yr,
      |  CAST(o_orderdate + INTERVAL 90 MINUTE AS VARCHAR) AS plus_90min,
      |  CAST(CAST(CAST(o_orderdate AS DATE) + to_months(CAST(o_orderkey % 12 AS INTEGER)) AS DATE) AS VARCHAR) AS plus_k_months,
      |  CAST(o_orderdate + to_days(CAST(o_orderkey % 30 AS INTEGER)) AS VARCHAR) AS plus_k_days,
      |  CAST(o_orderdate + to_hours(o_orderkey % 48) AS VARCHAR) AS plus_k_hours,
      |  CAST(make_timestamp(2024, 2, 29, 23, 59, CAST(o_orderkey % 60 AS DOUBLE)) AS VARCHAR) AS made_ts
      |FROM orders ORDER BY o_orderkey LIMIT 2000""".stripMargin

  private val fnJson: Q = (s, dir) =>
    load(s, dir, "events")
      .select(col("event_id"),
        get_json_object(col("props"), "$.k").as("k_str"),
        get_json_object(col("props"), "$.k").cast("int").as("k_int"),
        get_json_object(col("props"), "$.missing").as("miss"),
        json_array_length(concat(lit("[1,2,"), col("user_id"), lit("]"))).as("jlen"),
        from_json(col("props"), org.apache.spark.sql.types.StructType.fromDDL("k INT"))
          .getField("k").as("k_struct"))
      .orderBy(col("event_id"))
      .limit(2000)

  private val fnJsonSql =
    """SELECT event_id,
      |  json_extract_string(props, '$.k') AS k_str,
      |  CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_int,
      |  json_extract_string(props, '$.missing') AS miss,
      |  CAST(json_array_length('[1,2,' || CAST(user_id AS VARCHAR) || ']') AS INTEGER) AS jlen,
      |  CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_struct
      |FROM events ORDER BY event_id LIMIT 2000""".stripMargin

  // VARIANT semi-structured type (Spark 4): parse_json → typed
  // variant_get extraction, try_ variant on a missing path, and a
  // struct→variant→typed round trip. Engine-specific surfaces
  // (schema_of_variant, to_json canonicalization, malformed-input
  // try_parse_json) are pinned in VariantXmlFunctionsSpec. The variant
  // binary encoding keeps shredded access O(field) at scale — the
  // semi-structured analog of column pruning.
  private val fnVariant: Q = (s, dir) =>
    load(s, dir, "events").filter(col("event_id") < 500)
      .select(col("event_id"),
        variant_get(parse_json(col("props")), "$.k", "int").as("k_int"),
        variant_get(parse_json(col("props")), "$.k", "string").as("k_str"),
        variant_get(parse_json(col("props")), "$.k", "double").as("k_dbl"),
        try_variant_get(parse_json(col("props")), "$.missing", "int").as("k_missing"),
        variant_get(to_variant_object(struct(col("event_type"), col("user_id"))),
          "$.user_id", "bigint").as("uid_back"),
        is_variant_null(parse_json(lit("null"))).as("null_variant"))
      .orderBy(col("event_id"))

  private val fnVariantSql =
    """SELECT event_id,
      |  CAST(json_extract(props, '$.k') AS INTEGER) AS k_int,
      |  json_extract_string(props, '$.k') AS k_str,
      |  CAST(json_extract(props, '$.k') AS DOUBLE) AS k_dbl,
      |  CAST(NULL AS INTEGER) AS k_missing,
      |  user_id AS uid_back,
      |  true AS null_variant
      |FROM events WHERE event_id < 500 ORDER BY event_id""".stripMargin

  private val fnHash: Q = (s, dir) =>
    load(s, dir, "documents")
      .select(col("doc_id"), md5(col("text")).as("h_md5"), sha2(col("text"), 256).as("h_sha256"))
      .orderBy(col("doc_id"))

  private val fnHashSql =
    """SELECT doc_id, md5(text) AS h_md5, sha256(text) AS h_sha256
      |FROM documents ORDER BY doc_id""".stripMargin

  // Spark-native hash family. DuckDB has no xxhash64/murmur3/crc32/sha1,
  // so instead of dumping raw digests (rows-only), each builtin is
  // checked per-row against an independent from-spec reimplementation
  // ([[graft.functions.PureHashes]]) and the agreement booleans are
  // oracled: any single-bit divergence on any document flips a column
  // and hash-mismatches the row.
  private val fnHashNative: Q = (s, dir) =>
    load(s, dir, "documents")
      .select(col("doc_id"),
        (xxhash64(col("text")) === RefHash.ref_xxh64(col("text"))).as("xx64_match"),
        (hash(col("text")) === RefHash.ref_murmur3(col("text"))).as("murmur3_match"),
        (crc32(col("text")) === RefHash.ref_crc32(col("text"))).as("crc32_match"),
        (sha1(col("text")) === RefHash.ref_sha1(col("text"))).as("sha1_match"))
      .orderBy(col("doc_id"))

  private val fnHashNativeSql =
    """SELECT doc_id, true AS xx64_match, true AS murmur3_match,
      |  true AS crc32_match, true AS sha1_match
      |FROM documents ORDER BY doc_id""".stripMargin

  private val fnConditional: Q = (s, dir) =>
    load(s, dir, "customer")
      .select(col("c_custkey"),
        when(col("c_acctbal") > 5000.0, "high")
          .when(col("c_acctbal") > 1000.0, "mid").otherwise("low").as("tier"),
        coalesce(nullif(col("c_mktsegment"), lit("BUILDING")), lit("OTHER")).as("seg"),
        expr("nvl(nullif(c_mktsegment, 'MACHINERY'), 'M!')").as("seg2"),
        expr("nvl2(nullif(c_mktsegment, 'FURNITURE'), 'kept', 'was_f')").as("seg3"),
        greatest(col("c_acctbal"), lit(1000.0)).as("gr"),
        least(col("c_acctbal"), lit(1000.0)).as("ls"),
        col("c_acctbal").between(100.0, 5000.0).as("btw"),
        col("c_mktsegment").isin("BUILDING", "MACHINERY").as("in2"),
        isnull(nullif(col("c_mktsegment"), lit("BUILDING"))).as("isn"),
        expr("if(c_acctbal > 2500.0, 'hi', 'lo')").as("iff"))
      .orderBy(col("c_custkey"))

  private val fnConditionalSql =
    """SELECT c_custkey,
      |  CASE WHEN c_acctbal > 5000.0 THEN 'high' WHEN c_acctbal > 1000.0 THEN 'mid' ELSE 'low' END AS tier,
      |  COALESCE(NULLIF(c_mktsegment, 'BUILDING'), 'OTHER') AS seg,
      |  IFNULL(NULLIF(c_mktsegment, 'MACHINERY'), 'M!') AS seg2,
      |  CASE WHEN NULLIF(c_mktsegment, 'FURNITURE') IS NOT NULL THEN 'kept' ELSE 'was_f' END AS seg3,
      |  greatest(c_acctbal, 1000.0) AS gr, least(c_acctbal, 1000.0) AS ls,
      |  c_acctbal BETWEEN 100.0 AND 5000.0 AS btw,
      |  c_mktsegment IN ('BUILDING', 'MACHINERY') AS in2,
      |  NULLIF(c_mktsegment, 'BUILDING') IS NULL AS isn,
      |  CASE WHEN c_acctbal > 2500.0 THEN 'hi' ELSE 'lo' END AS iff
      |FROM customer ORDER BY c_custkey""".stripMargin

  private val fnArray: Q = (s, dir) => {
    val arr = array(col("p_size"), col("p_size") * 2, lit(7))
    load(s, dir, "part")
      .select(col("p_partkey"),
        size(arr).as("sz"),
        array_contains(arr, 7).as("has7"),
        array_max(arr).as("mx"),
        array_min(arr).as("mn"),
        element_at(arr, 2).as("e2"),
        array_join(sort_array(arr).cast("array<string>"), ",").as("sorted"),
        size(array_distinct(arr)).as("n_dist"),
        array_join(slice(sequence(lit(1), lit(6)), 2, 3).cast("array<string>"), ",").as("seq_slice"),
        aggregate(arr, lit(0), (acc, x) => acc + x).as("total"),
        array_join(filter(arr, x => x > 10).cast("array<string>"), ",").as("gt10"),
        exists(arr, x => x % 2 === 0).as("any_even"),
        forall(arr, x => x > 0).as("all_pos"),
        array_join(transform(arr, x => x + 1).cast("array<string>"), ",").as("plus1"),
        array_position(arr, 7).cast("int").as("pos7"))
      .orderBy(col("p_partkey"))
  }

  private val fnArraySql =
    """SELECT p_partkey,
      |  CAST(len(l) AS INTEGER) AS sz,
      |  list_contains(l, 7) AS has7,
      |  list_aggregate(l, 'max') AS mx,
      |  list_aggregate(l, 'min') AS mn,
      |  l[2] AS e2,
      |  array_to_string(list_transform(list_sort(l), x -> CAST(x AS VARCHAR)), ',') AS sorted,
      |  CAST(len(list_distinct(l)) AS INTEGER) AS n_dist,
      |  array_to_string(list_transform(generate_series(1, 6)[2:4], x -> CAST(x AS VARCHAR)), ',') AS seq_slice,
      |  CAST(list_sum(l) AS INTEGER) AS total,
      |  COALESCE(array_to_string(list_transform(list_filter(l, x -> x > 10), x -> CAST(x AS VARCHAR)), ','), '') AS gt10,
      |  len(list_filter(l, x -> x % 2 = 0)) > 0 AS any_even,
      |  len(list_filter(l, x -> x <= 0)) = 0 AS all_pos,
      |  array_to_string(list_transform(l, x -> CAST(x + 1 AS VARCHAR)), ',') AS plus1,
      |  CAST(COALESCE(list_position(l, 7), 0) AS INTEGER) AS pos7
      |FROM (SELECT p_partkey, [p_size, p_size * 2, 7] AS l FROM part) t
      |ORDER BY p_partkey""".stripMargin

  private val fnRegex: Q = (s, dir) =>
    load(s, dir, "documents").filter(col("doc_id") < 100)
      .select(col("doc_id"),
        col("text").rlike("data[a-z]*").as("m"),
        regexp_extract(col("source"), "([0-9]+)", 1).as("num"),
        regexp_replace(col("text"), "[aeiou]", "_").as("repl"),
        regexp_extract(col("text"), "(sc[a-z]+)", 1).as("scw"))
      .orderBy(col("doc_id"))

  private val fnRegexSql =
    """SELECT doc_id,
      |  regexp_matches(text, 'data[a-z]*') AS m,
      |  regexp_extract(source, '([0-9]+)', 1) AS num,
      |  regexp_replace(text, '[aeiou]', '_', 'g') AS repl,
      |  regexp_extract(text, '(sc[a-z]+)', 1) AS scw
      |FROM documents WHERE doc_id < 100 ORDER BY doc_id""".stripMargin

  private val fnCast: Q = (s, dir) =>
    load(s, dir, "events")
      .select(col("event_id"),
        col("value").cast("int").as("v_int"),
        col("user_id").cast("string").as("u_str"),
        col("ts").cast("date").cast("string").as("d"),
        dec(col("value")).cast("string").as("v_dec_str"),
        (col("value") > 100.0).cast("int").as("b_int"),
        concat(lit(""), col("event_id")).cast("bigint").as("roundtrip"),
        col("event_id").cast("double").as("id_dbl"))
      .orderBy(col("event_id"))
      .limit(2000)

  private val fnCastSql =
    """SELECT event_id,
      |  CAST(trunc(value) AS INTEGER) AS v_int,
      |  CAST(user_id AS VARCHAR) AS u_str,
      |  CAST(CAST(ts AS DATE) AS VARCHAR) AS d,
      |  CAST(CAST(value AS DECIMAL(12,2)) AS VARCHAR) AS v_dec_str,
      |  CAST(value > 100.0 AS INTEGER) AS b_int,
      |  CAST(CAST(event_id AS VARCHAR) AS BIGINT) AS roundtrip,
      |  CAST(event_id AS DOUBLE) AS id_dbl
      |FROM events ORDER BY event_id LIMIT 2000""".stripMargin

  private val fnString2: Q = (s, dir) =>
    load(s, dir, "documents")
      .select(col("doc_id"),
        expr("char(65 + doc_id % 26)").as("ch"),
        levenshtein(col("lang"), col("source")).as("lev"),
        format_string("%d-%s", col("doc_id"), col("lang")).as("fmt"),
        expr("btrim(concat('xx', lang, 'xx'), 'x')").as("bt"),
        expr("elt(1 + CAST(doc_id % 2 AS INT), 'first', 'second')").as("el"),
        substring_index(col("source"), "r", 1).as("si"),
        expr("find_in_set(lang, 'en,de,fr')").as("fis"),
        expr("overlay(source PLACING 'XX' FROM 2 FOR 2)").as("ov"),
        ascii(col("lang")).as("asc"),
        octet_length(col("text")).as("olen"),
        bit_length(col("lang")).as("blen"))
      .orderBy(col("doc_id"))

  private val fnString2Sql =
    """SELECT doc_id,
      |  chr(65 + CAST(doc_id % 26 AS INTEGER)) AS ch,
      |  CAST(levenshtein(lang, source) AS INTEGER) AS lev,
      |  printf('%d-%s', doc_id, lang) AS fmt,
      |  trim('xx' || lang || 'xx', 'x') AS bt,
      |  CASE WHEN doc_id % 2 = 0 THEN 'first' ELSE 'second' END AS el,
      |  split_part(source, 'r', 1) AS si,
      |  CAST(COALESCE(list_position(string_to_array('en,de,fr', ','), lang), 0) AS INTEGER) AS fis,
      |  substr(source, 1, 1) || 'XX' || substr(source, 4) AS ov,
      |  CAST(ascii(lang) AS INTEGER) AS asc,
      |  CAST(octet_length(encode(text)) AS INTEGER) AS olen,
      |  CAST(8 * octet_length(encode(lang)) AS INTEGER) AS blen
      |FROM documents ORDER BY doc_id""".stripMargin

  // base conversion, URL parsing, space, binary roundtrips, regex
  // count/substr (SURVEY §2.10: conv, parse_url, space, bin, hex/unhex,
  // regexp families). DuckDB lacks parse_url — the oracle emulates it
  // with regexp_extract, which is exact for well-formed URLs.
  private val fnString3: Q = (s, dir) => {
    val url = concat(lit("https://"), col("source"), lit(".example.com/"),
      col("lang"), lit("/p"), col("doc_id"), lit("?q="), col("lang"), lit("&id="), col("doc_id"))
    load(s, dir, "documents")
      .select(col("doc_id"),
        expr("conv(cast(doc_id % 1000 AS STRING), 10, 16)").as("cv16"),
        expr("conv(cast(doc_id % 64 AS STRING), 10, 2)").as("cv2"),
        bin(col("doc_id") % 64).as("bn"),
        expr("space(CAST(doc_id % 3 AS INT))").as("spc"),
        expr("decode(unhex(hex(encode(lang, 'UTF-8'))), 'UTF-8')").as("hexrt"),
        parse_url(url, lit("HOST")).as("host"),
        parse_url(url, lit("PATH")).as("path"),
        parse_url(url, lit("QUERY")).as("query"),
        parse_url(url, lit("QUERY"), lit("q")).as("qparam"),
        regexp_count(col("text"), lit("[aeiou]")).as("vowels"),
        expr("nullif(regexp_substr(text, 'sc[a-z]+'), '')").as("rsub"))
      .orderBy(col("doc_id"))
  }

  private val fnString3Sql =
    """SELECT doc_id,
      |  to_base(doc_id % 1000, 16) AS cv16,
      |  to_base(doc_id % 64, 2) AS cv2,
      |  to_base(doc_id % 64, 2) AS bn,
      |  repeat(' ', CAST(doc_id % 3 AS INTEGER)) AS spc,
      |  decode(unhex(hex(encode(lang)))) AS hexrt,
      |  regexp_extract('https://' || source || '.example.com/' || lang || '/p' || doc_id || '?q=' || lang || '&id=' || doc_id, '^https?://([^/?#]+)', 1) AS host,
      |  regexp_extract('https://' || source || '.example.com/' || lang || '/p' || doc_id || '?q=' || lang || '&id=' || doc_id, '^https?://[^/?#]+([^?#]*)', 1) AS path,
      |  regexp_extract('https://' || source || '.example.com/' || lang || '/p' || doc_id || '?q=' || lang || '&id=' || doc_id, '\?([^#]*)', 1) AS query,
      |  regexp_extract('https://' || source || '.example.com/' || lang || '/p' || doc_id || '?q=' || lang || '&id=' || doc_id, '[?&]q=([^&#]*)', 1) AS qparam,
      |  CAST(len(regexp_extract_all(text, '[aeiou]')) AS INTEGER) AS vowels,
      |  NULLIF(regexp_extract(text, 'sc[a-z]+'), '') AS rsub
      |FROM documents ORDER BY doc_id""".stripMargin

  // try_* family: ANSI-mode-safe arithmetic that yields NULL instead of
  // raising (SURVEY §2.10 try_eval). Overflow/zero-division/parse
  // failures are exercised on alternating rows so both branches appear.
  private val fnTry: Q = (s, dir) => {
    val even = col("event_id") % 2 === 0
    load(s, dir, "events").filter(col("event_id") < 500)
      .select(col("event_id"),
        expr("try_divide(event_id, user_id % 5)").as("tdiv"),
        expr("try_add(9223372036854775807L, CAST(event_id % 2 AS BIGINT))").as("tadd"),
        expr("try_subtract(CAST('-9223372036854775808' AS BIGINT), CAST(event_id % 2 AS BIGINT))").as("tsub"),
        expr("try_multiply(4611686018427387904L, CAST(1 + event_id % 2 AS BIGINT))").as("tmul"),
        expr("try_mod(event_id, user_id % 5)").as("tmod"),
        expr("try_element_at(array('a','b'), CAST(1 + event_id % 3 AS INT))").as("telem"),
        expr("try_cast(CASE WHEN event_id % 2 = 0 THEN '12' ELSE 'x9' END AS INT)").as("tcast"),
        when(even, expr("try_to_timestamp('2020-01-02 03:04:05')"))
          .otherwise(expr("try_to_timestamp('nope')")).cast("string").as("tts"))
      .orderBy(col("event_id"))
  }

  private val fnTrySql =
    """SELECT event_id,
      |  CASE WHEN user_id % 5 = 0 THEN NULL ELSE CAST(event_id AS DOUBLE) / (user_id % 5) END AS tdiv,
      |  CASE WHEN event_id % 2 = 0 THEN 9223372036854775807 END AS tadd,
      |  CASE WHEN event_id % 2 = 0 THEN CAST('-9223372036854775808' AS BIGINT) END AS tsub,
      |  CASE WHEN event_id % 2 = 0 THEN 4611686018427387904 END AS tmul,
      |  CASE WHEN user_id % 5 = 0 THEN NULL ELSE event_id % (user_id % 5) END AS tmod,
      |  (['a','b'])[CAST(1 + event_id % 3 AS INTEGER)] AS telem,
      |  TRY_CAST(CASE WHEN event_id % 2 = 0 THEN '12' ELSE 'x9' END AS INTEGER) AS tcast,
      |  CAST(TRY_CAST(CASE WHEN event_id % 2 = 0 THEN '2020-01-02 03:04:05' ELSE 'nope' END AS TIMESTAMP) AS VARCHAR) AS tts
      |FROM events WHERE event_id < 500 ORDER BY event_id""".stripMargin

  // data masking + alias forms (SURVEY §2.10: mask, char_length,
  // position/locate, left/right covered elsewhere). DuckDB emulates mask
  // with regexp_replace chains — exact for the default X/x/n policy.
  private val fnString4: Q = (s, dir) =>
    load(s, dir, "documents")
      .select(col("doc_id"),
        expr("mask(concat(upper(substring(lang, 1, 1)), lang, CAST(doc_id AS STRING), '!'))").as("masked"),
        expr("mask(source, 'U', 'l', '#', '*')").as("masked_custom"),
        expr("char_length(text)").as("clen"),
        expr("character_length(lang)").as("clen2"),
        expr("position('data' IN text)").as("pos_kw"),
        locate("a", col("source"), 2).as("loc2"))
      .orderBy(col("doc_id"))

  private val fnString4Sql =
    """SELECT doc_id,
      |  regexp_replace(regexp_replace(regexp_replace(
      |    upper(substr(lang, 1, 1)) || lang || CAST(doc_id AS VARCHAR) || '!',
      |    '[A-Z]', 'X', 'g'), '[a-z]', 'x', 'g'), '[0-9]', 'n', 'g') AS masked,
      |  regexp_replace(regexp_replace(regexp_replace(
      |    source, '[A-Z]', 'U', 'g'), '[a-z]', 'l', 'g'), '[0-9]', '#', 'g') AS masked_custom,
      |  CAST(length(text) AS INTEGER) AS clen,
      |  CAST(length(lang) AS INTEGER) AS clen2,
      |  CAST(position('data' IN text) AS INTEGER) AS pos_kw,
      |  CAST(CASE WHEN strpos(substr(source, 2), 'a') = 0 THEN 0
      |       ELSE strpos(substr(source, 2), 'a') + 1 END AS INTEGER) AS loc2
      |FROM documents ORDER BY doc_id""".stripMargin

  // width_bucket / NaN handling / banker's rounding / expm1-log1p /
  // cot-sec-csc (SURVEY §2.10 stragglers). width_bucket bounds are
  // powers of two so both evaluation orders of the bucket formula are
  // IEEE-exact; bround/rint are fed exact .5 halves so the
  // round-half-even branch is what's tested.
  private val fnMath3: Q = (s, dir) => {
    val x = col("p_size").cast("double") / 25.0
    val nanOnEven = when(col("p_partkey") % 2 === 0, expr("CAST('NaN' AS DOUBLE)"))
      .otherwise(col("p_retailprice"))
    load(s, dir, "part")
      .select(col("p_partkey"),
        expr("width_bucket(p_retailprice, 0, 2048, 8)").as("wb"),
        isnan(nanOnEven).as("is_nan"),
        nanvl(nanOnEven, lit(-1.0)).as("nv"),
        bround(col("p_size") + 0.5).as("br"),
        rint(col("p_size") + 0.5).as("ri"),
        round(expm1(x), 9).as("em1"),
        round(log1p(x), 9).as("l1p"),
        round(expr("cot(p_size / 10.0 + 0.1)"), 9).as("ct"),
        round(expr("sec(p_size / 10.0 + 0.1)"), 9).as("sc"),
        round(expr("csc(p_size / 10.0 + 0.1)"), 9).as("cs"))
      .orderBy(col("p_partkey"))
  }

  private val fnMath3Sql =
    """SELECT p_partkey,
      |  CASE WHEN p_retailprice < 0 THEN 0 WHEN p_retailprice >= 2048 THEN 9
      |       ELSE CAST(floor(p_retailprice / 2048 * 8) AS BIGINT) + 1 END AS wb,
      |  CASE WHEN p_partkey % 2 = 0 THEN true ELSE false END AS is_nan,
      |  CASE WHEN p_partkey % 2 = 0 THEN -1.0 ELSE p_retailprice END AS nv,
      |  CAST(CASE WHEN p_size % 2 = 0 THEN p_size ELSE p_size + 1 END AS DOUBLE) AS br,
      |  CAST(CASE WHEN p_size % 2 = 0 THEN p_size ELSE p_size + 1 END AS DOUBLE) AS ri,
      |  round(exp(CAST(p_size AS DOUBLE) / 25.0) - 1.0, 9) AS em1,
      |  round(ln(1.0 + CAST(p_size AS DOUBLE) / 25.0), 9) AS l1p,
      |  round(cot(p_size / 10.0 + 0.1), 9) AS ct,
      |  round(1.0 / cos(p_size / 10.0 + 0.1), 9) AS sc,
      |  round(1.0 / sin(p_size / 10.0 + 0.1), 9) AS cs
      |FROM part ORDER BY p_partkey""".stripMargin

  private val fnTime: Q = (s, dir) =>
    load(s, dir, "events")
      .select(col("event_id"),
        hour(col("ts")).as("h"),
        minute(col("ts")).as("mi"),
        second(col("ts")).as("se"),
        date_trunc("HOUR", col("ts")).cast("string").as("hstart"),
        unix_millis(col("ts")).as("ems"),
        add_months(to_date(col("ts")), 3).cast("string").as("plus3m"),
        date_format(col("ts"), "HH:mm").as("hm"))
      .orderBy(col("event_id"))
      .limit(2000)

  private val fnTimeSql =
    """SELECT event_id,
      |  CAST(EXTRACT(HOUR FROM ts) AS INTEGER) AS h,
      |  CAST(EXTRACT(MINUTE FROM ts) AS INTEGER) AS mi,
      |  CAST(FLOOR(EXTRACT(SECOND FROM ts)) AS INTEGER) AS se,
      |  CAST(date_trunc('hour', ts) AS VARCHAR) AS hstart,
      |  CAST(epoch_ms(date_trunc('millisecond', ts)) AS BIGINT) AS ems,
      |  CAST(CAST(CAST(ts AS DATE) + INTERVAL 3 MONTH AS DATE) AS VARCHAR) AS plus3m,
      |  strftime(ts, '%H:%M') AS hm
      |FROM events ORDER BY event_id LIMIT 2000""".stripMargin

  private val fnMap: Q = (s, dir) => {
    val m = map_from_arrays(array(lit("u"), lit("e")),
      array(col("user_id"), col("event_id")))
    load(s, dir, "events")
      .select(col("event_id"),
        array_join(map_keys(m), ",").as("ks"),
        array_join(map_values(m).cast("array<string>"), ",").as("vs"),
        size(m).as("card"),
        element_at(m, "u").as("u_val"),
        array_join(map_values(map_concat(m, map(lit("x"), lit(7L)))).cast("array<string>"), ",").as("cat"),
        array_join(transform(map_values(m), v => (v * 2).cast("string")), ",").as("dbl"))
      .orderBy(col("event_id"))
      .limit(2000)
  }

  private val fnMapSql =
    """SELECT event_id,
      |  array_to_string(map_keys(m), ',') AS ks,
      |  array_to_string(list_transform(map_values(m), v -> CAST(v AS VARCHAR)), ',') AS vs,
      |  CAST(cardinality(m) AS INTEGER) AS card,
      |  element_at(m, 'u')[1] AS u_val,
      |  array_to_string(list_transform(map_values(map_concat(m, map(['x'], [CAST(7 AS BIGINT)]))),
      |    v -> CAST(v AS VARCHAR)), ',') AS cat,
      |  array_to_string(list_transform(map_values(m), v -> CAST(v * 2 AS VARCHAR)), ',') AS dbl
      |FROM (SELECT event_id, map(['u', 'e'], [user_id, event_id]) AS m FROM events) t
      |ORDER BY event_id LIMIT 2000""".stripMargin

  private val fnMath2: Q = (s, dir) =>
    load(s, dir, "part")
      .select(col("p_partkey"),
        round(asin(col("p_size") / 100.0), 9).as("asn"),
        round(acos(col("p_size") / 100.0), 9).as("acs"),
        round(sinh(col("p_size") / 25.0), 9).as("snh"),
        round(cosh(col("p_size") / 25.0), 9).as("csh"),
        round(tanh(col("p_size") / 25.0), 9).as("tnh"),
        round(cbrt(col("p_size").cast("double")), 9).as("cbr"),
        round(log2(col("p_size").cast("double") + 1.0), 9).as("lg2"),
        round(radians(col("p_size").cast("double")), 9).as("rad"),
        round(degrees(col("p_size") / 10.0), 9).as("deg"),
        round(lit(math.E), 9).as("e_"),
        round(lit(math.Pi), 9).as("pi_"),
        round(col("p_retailprice"), -1).as("br"),
        round(expr("atan2(p_size, 7)"), 9).as("at2"),
        round(hypot(col("p_size").cast("double"), lit(7.0)), 9).as("hyp"))
      .orderBy(col("p_partkey"))

  private val fnMath2Sql =
    """SELECT p_partkey,
      |  round(asin(p_size / 100.0), 9) AS asn,
      |  round(acos(p_size / 100.0), 9) AS acs,
      |  round((exp(p_size / 25.0) - exp(-(p_size / 25.0))) / 2, 9) AS snh,
      |  round((exp(p_size / 25.0) + exp(-(p_size / 25.0))) / 2, 9) AS csh,
      |  round((exp(2 * (p_size / 25.0)) - 1) / (exp(2 * (p_size / 25.0)) + 1), 9) AS tnh,
      |  round(cbrt(CAST(p_size AS DOUBLE)), 9) AS cbr,
      |  round(log2(CAST(p_size AS DOUBLE) + 1.0), 9) AS lg2,
      |  round(radians(CAST(p_size AS DOUBLE)), 9) AS rad,
      |  round(degrees(p_size / 10.0), 9) AS deg,
      |  round(exp(1.0), 9) AS e_,
      |  round(pi(), 9) AS pi_,
      |  round(p_retailprice, -1) AS br,
      |  round(atan2(p_size, 7), 9) AS at2,
      |  round(sqrt(CAST(p_size AS DOUBLE) * p_size + 49.0), 9) AS hyp
      |FROM part ORDER BY p_partkey""".stripMargin

  // SQL entry point (spark.sql over registered views — Entry point A of
  // SURVEY.md §3) with the identical oracle text modulo dialect
  private val sqlSurface: Q = (s, dir) => {
    graft.Tables.registerAll(s, dir)
    s.sql(
      """SELECT l_returnflag,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS qty,
        |  COUNT(*) AS n,
        |  RANK() OVER (ORDER BY COUNT(*) DESC, l_returnflag) AS rnk
        |FROM lineitem
        |WHERE CAST(l_shipdate AS DATE) < DATE '1998-01-01'
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin)
  }

  private val sqlSurfaceSql =
    """SELECT l_returnflag,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS qty,
      |  COUNT(*) AS n,
      |  CAST(RANK() OVER (ORDER BY COUNT(*) DESC, l_returnflag) AS INTEGER) AS rnk
      |FROM lineitem
      |WHERE CAST(l_shipdate AS DATE) < DATE '1998-01-01'
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin

  private val fnMisc: Q = (s, dir) =>
    load(s, dir, "events")
      .select(col("event_id"),
        array_join(json_object_keys(col("props")), ",").as("jkeys"),
        from_unixtime(col("event_id") + 1704067200L).as("fut"),
        array_join(flatten(array(array(col("user_id")), array(col("event_id"), lit(7L))))
          .cast("array<string>"), ",").as("flat"),
        array_join(transform(
          sequence(lit("2024-01-01").cast("date"), lit("2024-04-01").cast("date"),
            expr("interval 1 month")),
          d => d.cast("string")), ",").as("months"),
        size(arrays_zip(array(col("user_id")), array(col("event_id")))).as("zipped_n"))
      .orderBy(col("event_id"))
      .limit(1000)

  private val fnMiscSql =
    """SELECT event_id,
      |  array_to_string(json_keys(props), ',') AS jkeys,
      |  strftime(to_timestamp(event_id + 1704067200), '%Y-%m-%d %H:%M:%S') AS fut,
      |  array_to_string(list_transform(flatten([[user_id], [event_id, CAST(7 AS BIGINT)]]),
      |    x -> CAST(x AS VARCHAR)), ',') AS flat,
      |  array_to_string(list_transform(
      |    generate_series(DATE '2024-01-01', DATE '2024-04-01', INTERVAL 1 MONTH),
      |    d -> CAST(CAST(d AS DATE) AS VARCHAR)), ',') AS months,
      |  CAST(len(list_zip([user_id], [event_id])) AS INTEGER) AS zipped_n
      |FROM events ORDER BY event_id LIMIT 1000""".stripMargin

  val queries: Map[String, Q] = Map(
    "fn_misc" -> fnMisc,
    "fn_math2" -> fnMath2,
    "fn_string3" -> fnString3,
    "fn_try" -> fnTry,
    "fn_math3" -> fnMath3,
    "fn_string4" -> fnString4,
    "sql_surface" -> sqlSurface,
    "fn_string2" -> fnString2,
    "fn_time" -> fnTime,
    "fn_map" -> fnMap,
    "fn_string" -> fnString,
    "fn_math" -> fnMath,
    "fn_date" -> fnDate,
    "fn_json" -> fnJson,
    "fn_variant" -> fnVariant,
    "fn_interval" -> fnInterval,
    "fn_hash" -> fnHash,
    "fn_hash_native" -> fnHashNative,
    "fn_conditional" -> fnConditional,
    "fn_array" -> fnArray,
    "fn_regex" -> fnRegex,
    "fn_cast" -> fnCast)

  val oracles: Map[String, String] = Map(
    "fn_misc" -> fnMiscSql,
    "fn_math2" -> fnMath2Sql,
    "fn_string3" -> fnString3Sql,
    "fn_try" -> fnTrySql,
    "fn_math3" -> fnMath3Sql,
    "fn_string4" -> fnString4Sql,
    "sql_surface" -> sqlSurfaceSql,
    "fn_string2" -> fnString2Sql,
    "fn_time" -> fnTimeSql,
    "fn_map" -> fnMapSql,
    "fn_string" -> fnStringSql,
    "fn_math" -> fnMathSql,
    "fn_date" -> fnDateSql,
    "fn_json" -> fnJsonSql,
    "fn_variant" -> fnVariantSql,
    "fn_interval" -> fnIntervalSql,
    "fn_hash" -> fnHashSql,
    "fn_hash_native" -> fnHashNativeSql,
    "fn_conditional" -> fnConditionalSql,
    "fn_array" -> fnArraySql,
    "fn_regex" -> fnRegexSql,
    "fn_cast" -> fnCastSql)
}
