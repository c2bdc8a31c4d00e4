package graft

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

import org.scalatest.funsuite.AnyFunSuite

/** The gluten-ut analog, first slice (SURVEY.md §5 layer 3; reference
  * `gluten-ut/spark35/.../VeloxTestSettings.scala:49` re-runs ~273 of
  * Spark's own SQL suites against the offloaded engine). Spark's test
  * sources are not on disk in this sandbox, so the layer is expressed
  * as GOLDEN-PINNED semantics queries: each entry is a small SQL
  * expression whose exact result (schema AND value) is pinned in
  * `src/test/resources/spark_semantics_golden.tsv` and re-run against
  * the graft session — extensions, custom rules and expressions
  * injected — every `sbt test`. A custom rule that perturbs any of
  * these behaviors (cast edges, null ordering, decimal
  * precision/scale, interval arithmetic, three-valued logic, ANSI
  * errors) fails the suite with the exact drifted value.
  *
  * Regenerate the golden file after an INTENTIONAL semantics change
  * with `GRAFT_REGEN_GOLDEN=1 sbt "testOnly graft.SparkSemanticsSpec"`
  * and review the diff line by line — the diff IS the semantics change.
  */
class SparkSemanticsSpec extends AnyFunSuite {
  private lazy val spark = GraftSparkSession.spark

  private val goldenPath = "src/test/resources/spark_semantics_golden.tsv"

  // ---- pinned-value entries: (label, sql) ------------------------------
  private val pinned: Seq[(String, String)] = Seq(
    // cast edge cases (the custom EliminateRedundantToDate rule and the
    // engine's decimal discipline sit on these paths)
    "cast_invalid_string_to_int_try" -> "SELECT try_cast('abc' AS INT)",
    "cast_numeric_string_to_int" -> "SELECT try_cast('123' AS INT)",
    "cast_decimal_string_to_int_try" -> "SELECT try_cast('12.9' AS INT)",
    "cast_double_to_int_truncates" -> "SELECT CAST(12.9e0 AS INT)",
    "cast_negative_double_to_int_truncates_toward_zero" -> "SELECT CAST(-12.9e0 AS INT)",
    "cast_int_overflow_try" -> "SELECT try_cast(2147483648 AS INT)",
    "cast_leap_day_date" -> "SELECT CAST('2020-02-29' AS DATE)",
    "cast_invalid_date_try" -> "SELECT try_cast('2020-02-30' AS DATE)",
    "cast_mixed_case_boolean" -> "SELECT CAST('tRuE' AS BOOLEAN)",
    "cast_yes_to_boolean_try" -> "SELECT try_cast('yes' AS BOOLEAN)",
    "cast_nan_string_to_double" -> "SELECT CAST('NaN' AS DOUBLE)",
    "cast_infinity_string_to_double" -> "SELECT CAST('Infinity' AS DOUBLE)",
    "cast_boolean_to_int" -> "SELECT CAST(true AS INT)",
    "cast_timestamp_to_date" -> "SELECT CAST(TIMESTAMP '2020-01-02 03:04:05' AS DATE)",
    "cast_date_to_timestamp_midnight" -> "SELECT CAST(DATE '2020-01-02' AS TIMESTAMP)",
    "cast_string_with_spaces_to_int" -> "SELECT try_cast(' 42 ' AS INT)",

    // three-valued logic and null comparison semantics
    "null_eq_null_is_null" -> "SELECT NULL = NULL",
    "null_safe_eq" -> "SELECT NULL <=> NULL",
    "null_safe_eq_value_vs_null" -> "SELECT 1 <=> NULL",
    "null_and_false_is_false" -> "SELECT NULL AND false",
    "null_or_true_is_true" -> "SELECT NULL OR true",
    "null_and_true_is_null" -> "SELECT NULL AND true",
    "in_with_null_is_null" -> "SELECT 1 IN (2, NULL)",
    "not_in_with_null_is_null" -> "SELECT 1 NOT IN (2, NULL)",
    "coalesce_skips_null" -> "SELECT coalesce(NULL, 2)",
    "nullif_equal_is_null" -> "SELECT nullif(3, 3)",
    "concat_null_propagates" -> "SELECT concat('a', NULL)",
    "concat_ws_skips_null" -> "SELECT concat_ws(',', 'a', NULL, 'b')",

    // null ordering (WindowExec / Sort operators lean on these defaults)
    "order_asc_nulls_first_default" ->
      "SELECT x FROM VALUES (1),(NULL),(2) t(x) ORDER BY x",
    "order_desc_nulls_last_default" ->
      "SELECT x FROM VALUES (1),(NULL),(2) t(x) ORDER BY x DESC",
    "order_asc_nulls_last_explicit" ->
      "SELECT x FROM VALUES (1),(NULL),(2) t(x) ORDER BY x ASC NULLS LAST",
    "order_desc_nulls_first_explicit" ->
      "SELECT x FROM VALUES (1),(NULL),(2) t(x) ORDER BY x DESC NULLS FIRST",
    "sort_array_asc_nulls_first" -> "SELECT sort_array(array(2, NULL, 1))",
    "sort_array_desc_nulls_last" -> "SELECT sort_array(array(2, NULL, 1), false)",
    "array_sort_nulls_last" -> "SELECT array_sort(array(3, 1, NULL))",

    // decimal precision/scale propagation and rounding
    "decimal_add_widens_precision" ->
      "SELECT CAST(1.5 AS DECIMAL(10,2)) + CAST(2.25 AS DECIMAL(10,2))",
    "decimal_overflow_try" -> "SELECT try_cast(99999 AS DECIMAL(4,0))",
    "decimal_max_precision_add_stays_38" ->
      "SELECT CAST(1 AS DECIMAL(38,0)) + CAST(1 AS DECIMAL(38,0))",
    "decimal_division_scale" ->
      "SELECT CAST(10 AS DECIMAL(10,0)) / CAST(3 AS DECIMAL(10,0))",
    "round_half_up" -> "SELECT round(2.5)",
    "bround_half_even" -> "SELECT bround(2.5)",
    "round_negative_half_up" -> "SELECT round(-2.5)",
    "decimal_cast_rounds_half_up" -> "SELECT CAST(2.675 AS DECIMAL(10,2))",
    "decimal_multiply_scale_sum" ->
      "SELECT CAST(1.25 AS DECIMAL(5,2)) * CAST(1.2 AS DECIMAL(5,1))",

    // interval / date-time arithmetic (as-of join + window semantics
    // depend on exact temporal behavior; session zone is UTC)
    "date_plus_month_clamps_leap" -> "SELECT DATE '2020-01-31' + INTERVAL '1' MONTH",
    "date_plus_month_clamps_nonleap" -> "SELECT DATE '2019-01-31' + INTERVAL '1' MONTH",
    "add_months_clamps_end_of_month" -> "SELECT add_months(DATE '2020-02-29', 12)",
    "months_between_end_of_month" ->
      "SELECT months_between(DATE '2020-02-29', DATE '2020-01-31')",
    "datediff_across_leap_feb" -> "SELECT datediff(DATE '2020-03-01', DATE '2020-02-01')",
    "date_add_across_year" -> "SELECT date_add(DATE '2019-12-31', 1)",
    "timestamp_plus_minutes" ->
      "SELECT TIMESTAMP '2020-03-08 01:30:00' + INTERVAL '90' MINUTE",
    "day_time_interval_multiply" -> "SELECT INTERVAL '1' DAY * 3",
    "date_trunc_week_is_monday" ->
      "SELECT date_trunc('WEEK', TIMESTAMP '2020-01-01 12:00:00')",
    "dayofweek_sunday_is_1" -> "SELECT dayofweek(DATE '2020-01-05')",
    "weekofyear_iso" -> "SELECT weekofyear(DATE '2021-01-01')",
    "last_day_leap_february" -> "SELECT last_day(DATE '2020-02-10')",
    "extract_dow_sunday_one" -> "SELECT extract(DOW FROM DATE '2020-01-05')",
    "date_subtraction_yields_interval" -> "SELECT DATE '2020-02-29' - DATE '2020-01-01'",
    "unix_timestamp_epoch_utc" -> "SELECT to_unix_timestamp(TIMESTAMP '1970-01-02 00:00:00')",
    "make_date_valid" -> "SELECT make_date(2020, 2, 29)",

    // string semantics (text pipeline operators tokenize/slice on these)
    "substring_negative_start" -> "SELECT substring('hello', -3)",
    "substring_zero_start" -> "SELECT substring('hello', 0, 2)",
    "substr_one_based" -> "SELECT substr('hello', 2, 2)",
    "instr_one_based_first_hit" -> "SELECT instr('hello', 'l')",
    "split_keeps_empty_tokens" -> "SELECT split('a,b,,c', ',')",
    "length_counts_chars_not_bytes" -> "SELECT length('héllo')",
    "trim_both_sides" -> "SELECT trim('  a  ')",
    "lpad_pads_left" -> "SELECT lpad('5', 3, '0')",
    "concat_pipe_null_propagates" -> "SELECT 'a' || NULL",
    "repeat_string" -> "SELECT repeat('ab', 3)",
    "regexp_extract_group" -> "SELECT regexp_extract('a1b22', '([0-9]+)', 1)",
    "upper_unicode" -> "SELECT upper('straße')",

    // array / map semantics (explode/generate and the LSH band pipeline
    // index arrays 1-based through element_at/slice)
    "element_at_is_one_based" -> "SELECT element_at(array(10,20,30), 1)",
    "element_at_negative_from_end" -> "SELECT element_at(array(10,20,30), -1)",
    "try_element_at_out_of_bounds" -> "SELECT try_element_at(array(10,20,30), 5)",
    "array_position_one_based" -> "SELECT array_position(array('a','b'), 'b')",
    "array_contains_missing_with_null_entry_is_null" ->
      "SELECT array_contains(array(1, NULL), 2)",
    "size_of_empty_array" -> "SELECT size(array())",
    "size_of_null_is_null_ansi" -> "SELECT size(CAST(NULL AS ARRAY<INT>))",
    "try_element_at_missing_map_key" -> "SELECT try_element_at(map('a',1,'b',2), 'c')",
    "map_concat_disjoint" -> "SELECT map_concat(map('a',1), map('b',2))",
    "array_union_dedups" -> "SELECT array_union(array(1,2,2), array(2,3))",
    "flatten_nested_arrays" -> "SELECT flatten(array(array(1,2), array(3)))",
    "slice_one_based" -> "SELECT slice(array(1,2,3,4), 2, 2)",
    "sequence_inclusive" -> "SELECT sequence(1, 4)",

    // numeric semantics (salting, pmod bucketing, NaN ordering in
    // similarity ranking)
    "integer_div_operator" -> "SELECT 7 div 2",
    "integer_div_truncates_toward_zero" -> "SELECT -7 div 2",
    "modulo_sign_of_dividend" -> "SELECT 7 % -2",
    "pmod_always_nonnegative_for_positive_modulus" -> "SELECT pmod(-7, 2)",
    "nan_equals_nan_in_sql" -> "SELECT double('NaN') = double('NaN')",
    "nan_greater_than_infinity" -> "SELECT double('NaN') > double('Infinity')",
    "negative_zero_equals_zero" -> "SELECT CAST('-0.0' AS DOUBLE) = CAST('0.0' AS DOUBLE)",
    "greatest_ignores_null" -> "SELECT greatest(1, NULL, 3)",
    "least_all_null_is_null" -> "SELECT least(CAST(NULL AS INT), CAST(NULL AS INT))",
    "int_division_is_double" -> "SELECT 5 / 2",
    "try_divide_by_zero_is_null" -> "SELECT try_divide(1, 0)",
    "floor_negative_fraction" -> "SELECT floor(-0.1e0)",
    "ceil_negative_fraction" -> "SELECT ceil(-0.1e0)",

    // aggregate typing and null handling (HashAggregate partial/final)
    "avg_of_int_is_double" -> "SELECT avg(x) FROM VALUES (1),(2) t(x)",
    "sum_of_int_is_bigint" -> "SELECT sum(x) FROM VALUES (1),(2) t(x)",
    "count_col_skips_null_count_star_does_not" ->
      "SELECT count(x), count(*) FROM VALUES (1),(NULL) t(x)",
    "max_skips_null" -> "SELECT max(x) FROM VALUES (1),(NULL) t(x)",
    "stddev_single_row_is_null" -> "SELECT stddev(x) FROM VALUES (1) t(x)",
    "count_distinct_ignores_null" ->
      "SELECT count(DISTINCT x) FROM VALUES (1),(1),(NULL) t(x)",
    "percentile_interpolates" ->
      "SELECT percentile(x, 0.5) FROM VALUES (1),(2),(3),(4) t(x)",
    "avg_decimal_scale_plus_4" ->
      "SELECT avg(x) FROM VALUES (CAST(1 AS DECIMAL(10,2))),(CAST(2 AS DECIMAL(10,2))) t(x)",
    "sum_empty_relation_is_null" -> "SELECT sum(x) FROM VALUES (1) t(x) WHERE x > 99",
    "count_empty_relation_is_zero" -> "SELECT count(x) FROM VALUES (1) t(x) WHERE x > 99",

    // higher-order functions (the dedup/similarity pipelines build on
    // transform/aggregate/zip_with — exact lambda semantics matter)
    "hof_transform_with_index" -> "SELECT transform(array(10,20,30), (x, i) -> x + i)",
    "hof_filter" -> "SELECT filter(array(1,2,3,4), x -> x % 2 = 0)",
    "hof_exists_short_circuit_null" -> "SELECT exists(array(1, NULL, 3), x -> x > 2)",
    "hof_forall_empty_is_true" -> "SELECT forall(array(), x -> false)",
    "hof_aggregate_with_finish" ->
      "SELECT aggregate(array(1,2,3), 0, (acc, x) -> acc + x, acc -> acc * 10)",
    "hof_zip_with_pads_null" ->
      "SELECT zip_with(array(1,2,3), array(10,20), (a, b) -> a + b)",
    "hof_map_filter" -> "SELECT map_filter(map('a',1,'b',2), (k, v) -> v > 1)",
    "hof_transform_values" -> "SELECT transform_values(map('a',1,'b',2), (k, v) -> v * 10)",
    "hof_reduce_alias" -> "SELECT reduce(array(1,2,3,4), 0, (acc, x) -> acc + x)",

    // JSON semantics (VARIANT/json paths in the scalar battery)
    "json_get_object_path" -> "SELECT get_json_object('{\"a\":{\"b\":7}}', '$.a.b')",
    "json_get_missing_is_null" -> "SELECT get_json_object('{\"a\":1}', '$.b')",
    "json_tuple_two_fields" -> "SELECT json_tuple('{\"a\":1,\"b\":\"x\"}', 'a', 'b')",
    "json_from_json_struct" ->
      "SELECT from_json('{\"a\":1,\"b\":\"x\"}', 'a INT, b STRING')",
    "json_from_json_malformed_is_null" ->
      "SELECT from_json('{bad', 'a INT')",
    "json_to_json_struct" -> "SELECT to_json(named_struct('a', 1, 'b', 'x'))",
    "json_array_index" -> "SELECT get_json_object('[1,2,3]', '$[1]')",

    // regex semantics
    "regex_replace_backreference" ->
      "SELECT regexp_replace('ab12cd', '([a-z]+)(\\\\d+)', '$2$1')",
    "regex_extract_no_match_empty" -> "SELECT regexp_extract('abc', '([0-9]+)', 1)",
    "regex_extract_all" -> "SELECT regexp_extract_all('a1b22c333', '([0-9]+)', 1)",
    "regex_rlike_unanchored" -> "SELECT 'xabcx' RLIKE 'abc'",
    "regex_split_with_limit" -> "SELECT split('a,b,c,d', ',', 2)",
    "regex_like_escape_percent" -> "SELECT 'a%b' LIKE 'a\\\\%b'",

    // struct semantics (ordering is field-by-field, left to right)
    "struct_field_access" -> "SELECT named_struct('a', 1, 'b', 'x').a",
    "struct_ordering_lexicographic" ->
      "SELECT struct(1, 'b') < struct(2, 'a'), struct(1, 'b') < struct(1, 'c')",
    "struct_equality" -> "SELECT named_struct('a', 1) = named_struct('a', 1)",

    // bit semantics
    "bit_shiftleft_int_wraps" -> "SELECT shiftleft(1, 32)",
    "bit_count_long" -> "SELECT bit_count(255L)",
    "bit_xor_and_or" -> "SELECT 12 ^ 10, 12 & 10, 12 | 10, ~12",

    // temporal formatting / arithmetic extensions
    "time_to_date_with_format" -> "SELECT to_date('31/12/2020', 'dd/MM/yyyy')",
    "time_date_format_pattern" ->
      "SELECT date_format(TIMESTAMP '2020-01-02 03:04:05', 'yyyy-MM-dd HH:mm')",
    "time_trunc_month" -> "SELECT trunc(DATE '2020-02-15', 'MM')",
    "time_next_day_friday" -> "SELECT next_day(DATE '2020-01-01', 'FR')",
    "time_dayofyear_leap" -> "SELECT dayofyear(DATE '2020-12-31')",
    "time_quarter" -> "SELECT quarter(DATE '2020-05-05')",
    "time_timestampdiff_month_clamp" ->
      "SELECT timestampdiff(MONTH, TIMESTAMP '2020-01-31', TIMESTAMP '2020-02-29')",
    "time_try_to_timestamp_invalid" -> "SELECT try_to_timestamp('not a time')",
    "time_from_unixtime_utc" -> "SELECT from_unixtime(86400)",

    // string function extensions
    "str_initcap" -> "SELECT initcap('hELLO wORLD')",
    "str_translate" -> "SELECT translate('abcba', 'ab', 'xy')",
    "str_overlay" -> "SELECT overlay('Spark SQL' PLACING 'ANSI' FROM 7 FOR 3)",
    "str_left_right" -> "SELECT left('hello', 2), right('hello', 2)",
    "str_levenshtein" -> "SELECT levenshtein('kitten', 'sitting')",
    "str_format_number" -> "SELECT format_number(1234567.891, 2)",
    "str_elt_one_based" -> "SELECT elt(2, 'a', 'b', 'c')",
    "str_octet_vs_char_length" -> "SELECT octet_length('héllo'), length('héllo')",
    "str_base64_round_trip" -> "SELECT CAST(unbase64(base64('graft')) AS STRING)",

    // deterministic hash functions: values pinned across versions (the
    // fingerprint/bucketing operators depend on these exact streams)
    "hash_murmur3_pinned" -> "SELECT hash('abc')",
    "hash_xxhash64_pinned" -> "SELECT xxhash64('abc')",
    "hash_crc32_pinned" -> "SELECT crc32('abc')",
    "hash_md5_pinned" -> "SELECT md5('abc')",
    "hash_sha2_pinned" -> "SELECT sha2('abc', 256)",

    // window semantics over a fixed single-partition VALUES relation
    "win_rank_gaps_dense_no_gaps" ->
      """SELECT x, rank() OVER (ORDER BY x), dense_rank() OVER (ORDER BY x)
        |FROM VALUES (1),(1),(2) t(x) ORDER BY x""".stripMargin,
    "win_range_frame_includes_peers" ->
      """SELECT x, sum(x) OVER (ORDER BY x RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |FROM VALUES (1),(1),(2) t(x) ORDER BY x""".stripMargin,
    "win_rows_frame_excludes_peers" ->
      """SELECT x, sum(x) OVER (ORDER BY x, y ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |FROM VALUES (1, 1),(1, 2),(2, 3) t(x, y) ORDER BY x, y""".stripMargin,
    "win_lag_default" ->
      """SELECT x, lag(x, 1, -1) OVER (ORDER BY x)
        |FROM VALUES (1),(2),(3) t(x) ORDER BY x""".stripMargin,
    "win_percent_rank_fractions" ->
      """SELECT x, percent_rank() OVER (ORDER BY x), cume_dist() OVER (ORDER BY x)
        |FROM VALUES (1),(2),(2),(4) t(x) ORDER BY x""".stripMargin,
    "win_ntile_uneven" ->
      """SELECT x, ntile(3) OVER (ORDER BY x)
        |FROM VALUES (1),(2),(3),(4),(5) t(x) ORDER BY x""".stripMargin,

    // set operation semantics
    "setop_intersect_dedups" ->
      "SELECT * FROM (SELECT 1 UNION ALL SELECT 1) INTERSECT (SELECT 1) ",
    "setop_except_all_multiplicity" ->
      """SELECT x FROM (SELECT * FROM VALUES (1),(1),(2) t(x)
        |EXCEPT ALL SELECT * FROM VALUES (1) u(y)) ORDER BY x""".stripMargin,
    "setop_union_coerces_int_double" ->
      "SELECT x FROM (SELECT 1 AS x UNION SELECT 2.5e0) ORDER BY x",

    // literal typing
    "literal_decimal_typing" -> "SELECT typeof(1.5), typeof(1e0), typeof(.5), typeof(1)",
    "literal_bigint_suffix" -> "SELECT typeof(1L), typeof(1S), typeof(1Y)")

  // ---- ANSI error entries: (label, sql, expected error condition) ------
  private val ansiErrors: Seq[(String, String, String)] = Seq(
    ("ansi_divide_by_zero_errors", "SELECT 1/0", "DIVIDE_BY_ZERO"),
    ("ansi_invalid_cast_errors", "SELECT CAST('abc' AS INT)", "CAST_INVALID_INPUT"),
    ("ansi_cast_overflow_errors", "SELECT CAST(128 AS TINYINT)", "CAST_OVERFLOW"),
    ("ansi_element_at_oob_errors", "SELECT element_at(array(1), 3)", "INVALID_ARRAY_INDEX"),
    ("ansi_int_overflow_errors", "SELECT 2147483647 + 1", "ARITHMETIC_OVERFLOW"),
    ("ansi_duplicate_map_key_errors", "SELECT map_concat(map('a',1), map('a',2))",
      "DUPLICATED_MAP_KEY"))

  /** canonical rendering: dtypes :: rows (stable across JVMs) */
  private def render(sql: String): String = {
    def lit(v: Any): String = v match {
      case null => "NULL"
      case s: String => "'" + s + "'"
      case d: java.math.BigDecimal => d.toPlainString
      case a: scala.collection.Seq[_] => a.map(lit).mkString("[", ",", "]")
      case m: scala.collection.Map[_, _] =>
        m.toSeq.map { case (k, w) => lit(k) + "->" + lit(w) }.sorted.mkString("{", ",", "}")
      case r: org.apache.spark.sql.Row => r.toSeq.map(lit).mkString("(", ",", ")")
      case b: Array[Byte] => b.map("%02x".format(_)).mkString
      case other => other.toString
    }
    val df = spark.sql(sql)
    val schema = df.schema.map(_.dataType.simpleString).mkString(",")
    val rows = df.collect().map(_.toSeq.map(lit).mkString("|")).mkString(";")
    s"$schema :: $rows"
  }

  if (sys.env.contains("GRAFT_REGEN_GOLDEN")) {
    test("REGENERATE golden file (review the diff — it IS the semantics change)") {
      val lines = pinned.map { case (label, sql) => s"$label\t${render(sql)}" }
      Files.write(Paths.get(goldenPath), lines.asJava)
      fail(s"golden file regenerated at $goldenPath — unset GRAFT_REGEN_GOLDEN and re-run")
    }
  } else {
    lazy val golden: Map[String, String] =
      Files.readAllLines(Paths.get(goldenPath)).asScala
        .filter(_.nonEmpty)
        .map { line => val i = line.indexOf('\t'); line.take(i) -> line.drop(i + 1) }
        .toMap

    test("golden file covers every pinned entry exactly once") {
      assert(golden.size == pinned.size,
        s"golden has ${golden.size} entries, spec pins ${pinned.size} — regenerate and review")
      val missing = pinned.map(_._1).filterNot(golden.contains)
      assert(missing.isEmpty, s"missing golden entries: ${missing.mkString(", ")}")
    }

    pinned.foreach { case (label, sql) =>
      test(s"pinned: $label") {
        assert(render(sql) == golden(label), s"\n  sql: $sql")
      }
    }
  }

  ansiErrors.foreach { case (label, sql, condition) =>
    test(s"pinned: $label") {
      val e = intercept[Exception] { spark.sql(sql).collect() }
      assert(e.getMessage.contains(condition),
        s"expected error condition $condition, got: ${e.getMessage.take(300)}")
    }
  }
}
