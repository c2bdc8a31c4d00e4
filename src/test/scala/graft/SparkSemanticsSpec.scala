package graft

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

import org.scalatest.funsuite.AnyFunSuite

// ---- wave 8b fixtures: top-level case classes for the encoderpin_*
// wave (implicit product-encoder derivation requires stable top-level
// classes; a class nested in the suite would capture the suite in its
// closure and fail serialization on executors)
private[graft] case class EncPinUser(id: Long, name: String, score: Option[Double])
private[graft] case class EncPinNested(k: Int, u: EncPinUser)
private[graft] case class EncPinColl(tags: Seq[String], attrs: Map[String, Int], raw: Array[Byte])
private[graft] case class EncPinNums(bd: BigDecimal, bi: BigInt)
private[graft] case class EncPinTimes(d: java.sql.Date, ts: java.sql.Timestamp,
    ld: java.time.LocalDate)
private[graft] case class EncPinNtz(ldt: java.time.LocalDateTime)
private[graft] case class EncPinIntervals(dur: java.time.Duration, per: java.time.Period)
private[graft] case class EncPinOptNested(id: Int, u: Option[EncPinUser])
private[graft] case class EncPinSeqStruct(id: Int, us: Seq[EncPinUser])

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
  * The corpus is ORGANIZED BY REFERENCE SUITE: each pin-label prefix
  * stands in for one of the gluten-ut suites (castsuite_/tryeval_/
  * datetime_/strexpr_/regexp_/mathexpr_/bitwise_/collection_/
  * complextype_/conditional_/nullexpr_/predicate_/jsonfn_/csvfn_/
  * urlfn_/hashexpr_/aggfn_/windowfn_/hof_/intervalexpr_/misc_/
  * setops_/subquery_ …); the suite → prefix → count table lives in
  * COVERAGE.md ("Pinned Spark-semantics layer"). The `nonansi_*`
  * group re-renders the cast/overflow hazards under
  * `spark.sql.ansi.enabled=false` — the ANSI-on x ANSI-off
  * duplication the reference's test matrix runs.
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
    "literal_bigint_suffix" -> "SELECT typeof(1L), typeof(1S), typeof(1Y)",

    // ---- round-4 extension --------------------------------------------
    // cast & typing edges (string<->temporal, float widening noise,
    // scientific rendering, binary round-trips)
    "cast_iso_t_separator_to_timestamp" -> "SELECT CAST('2020-01-02T03:04:05' AS TIMESTAMP)",
    "cast_date_only_string_to_timestamp" -> "SELECT CAST('2020-01-02' AS TIMESTAMP)",
    "cast_bool_to_string" -> "SELECT CAST(true AS STRING)",
    "cast_binary_roundtrip_string" -> "SELECT CAST(CAST('hi' AS BINARY) AS STRING)",
    "cast_tinyint_overflow_try" -> "SELECT try_cast(128 AS TINYINT)",
    "cast_smallint_min_boundary" -> "SELECT CAST(-32768 AS SMALLINT)",
    "cast_plus_sign_string_to_int" -> "SELECT try_cast('+7' AS INT), try_cast('-7' AS INT)",
    "cast_empty_string_to_int_try" -> "SELECT try_cast('' AS INT)",
    "cast_double_1e21_renders_scientific" -> "SELECT CAST(1e21 AS STRING)",
    "cast_decimal_keeps_trailing_zeros" ->
      "SELECT CAST(CAST(1.10 AS DECIMAL(5,2)) AS STRING)",
    "cast_float_to_double_widening_noise" -> "SELECT CAST(CAST(0.1 AS FLOAT) AS DOUBLE)",
    "cast_interval_to_string" -> "SELECT CAST(INTERVAL '1' DAY AS STRING)",
    "cast_numeric_string_to_boolean" ->
      "SELECT try_cast('1' AS BOOLEAN), try_cast('0' AS BOOLEAN)",
    "cast_typeof_timestamp_ntz" -> "SELECT typeof(TIMESTAMP_NTZ '2020-01-02 03:04:05')",
    "cast_typeof_null_literal" -> "SELECT typeof(NULL)",

    // string function edges (1-based positions, custom trim/escape,
    // binary/number formatting, regexp count/instr/substr)
    "str_ascii_chr" -> "SELECT ascii('A'), char(66)",
    "str_find_in_set" -> "SELECT find_in_set('b', 'a,b,c'), find_in_set('z', 'a,b,c')",
    "str_locate_from_position" -> "SELECT locate('l', 'hello', 4)",
    "str_position_in" -> "SELECT position('l' IN 'hello')",
    "str_substring_index_negative" ->
      "SELECT substring_index('a.b.c', '.', -1), substring_index('a.b.c', '.', 2)",
    "str_space_concat" -> "SELECT concat('a', space(2), 'b')",
    "str_btrim_custom_chars" -> "SELECT btrim('xxhixx', 'x')",
    "str_trim_leading_custom" -> "SELECT trim(LEADING 'x' FROM 'xxhi')",
    "str_startswith_endswith_contains" ->
      "SELECT startswith('spark', 'sp'), endswith('spark', 'rk'), contains('spark', 'ar')",
    "str_format_string_printf" -> "SELECT format_string('%d-%s', 7, 'x')",
    "str_encode_decode_utf8_roundtrip" ->
      "SELECT decode(encode('héllo', 'utf-8'), 'utf-8')",
    "str_to_binary_hex" -> "SELECT to_binary('4142', 'hex')",
    "str_try_to_binary_invalid" -> "SELECT try_to_binary('zz', 'hex')",
    "str_to_number_grouped" -> "SELECT to_number('12,345', '99,999')",
    "str_try_to_number_invalid" -> "SELECT try_to_number('abc', '999')",
    "str_to_char_decimal_format" -> "SELECT to_char(123.45, '9999.99')",
    "str_split_part_negative" -> "SELECT split_part('a,b,c', ',', -1)",
    "str_regexp_count" -> "SELECT regexp_count('a1b22c333', '[0-9]+')",
    "str_regexp_instr" -> "SELECT regexp_instr('ab12cd', '[0-9]+')",
    "str_regexp_substr" -> "SELECT regexp_substr('ab12cd', '[0-9]+')",
    "str_like_custom_escape" -> "SELECT 'a%b' LIKE 'aX%b' ESCAPE 'X'",
    "str_ilike_case_insensitive" -> "SELECT 'SPARK' ILIKE 'spark'",
    "str_soundex" -> "SELECT soundex('Tymczak'), soundex('Robert')",
    "str_luhn_check" -> "SELECT luhn_check('79927398713'), luhn_check('79927398714')",
    "str_mask_defaults" -> "SELECT mask('AbCd-123')",
    "str_replace_all_occurrences" -> "SELECT replace('abcabc', 'bc', 'X')",
    "str_reverse_string_and_array" -> "SELECT reverse('abc'), reverse(array(1,2,3))",
    "str_lower_unicode_dotted_i" -> "SELECT lower('İ')",

    // math edges (domain errors -> NULL/NaN, unsigned conv, try_*
    // overflow, half-even rint vs half-up round)
    "math_ln_zero" -> "SELECT ln(0)",
    "math_log_negative" -> "SELECT log(-1)",
    "math_sqrt_negative_is_nan" -> "SELECT sqrt(-1)",
    "math_power_zero_zero" -> "SELECT power(0, 0)",
    "math_mod_double" -> "SELECT mod(7.5e0, 2)",
    "math_round_negative_scale" -> "SELECT round(12345, -2)",
    "math_hex_negative_is_unsigned64" -> "SELECT hex(-1)",
    "math_unhex_roundtrip" -> "SELECT CAST(unhex(hex('hi')) AS STRING)",
    "math_conv_bases" -> "SELECT conv('ff', 16, 10), conv('-1', 10, 16)",
    "math_factorial_overflow_null" -> "SELECT factorial(5), factorial(21)",
    "math_cbrt_hypot" -> "SELECT cbrt(27e0), hypot(3e0, 4e0)",
    "math_signum" -> "SELECT signum(-5e0), signum(0e0), signum(7e0)",
    "math_bin_bits" -> "SELECT bin(13)",
    "math_width_bucket" -> "SELECT width_bucket(5.3e0, 0.2e0, 10.6e0, 5)",
    "math_try_add_int_overflow" -> "SELECT try_add(2147483647, 1)",
    "math_try_multiply_bigint_overflow" -> "SELECT try_multiply(9223372036854775807L, 2L)",
    "math_try_subtract_underflow" -> "SELECT try_subtract(-2147483648, 1)",
    "math_rint_half_even" -> "SELECT rint(2.5e0), rint(3.5e0)",
    "math_e_pi" -> "SELECT e(), pi()",
    "math_cot" -> "SELECT cot(1e0)",
    "math_expm1_log1p" -> "SELECT expm1(0e0), log1p(0e0)",
    "math_double_zero_div_zero_try" -> "SELECT try_divide(0.0e0, 0.0e0)",

    // array edges (0-based get vs 1-based element_at, compact/insert/
    // append, sequences with steps, explode_outer on empty)
    "arr_get_is_zero_based" -> "SELECT get(array(10,20,30), 1)",
    "arr_compact_strips_nulls" -> "SELECT array_compact(array(1, NULL, 2, NULL))",
    "arr_distinct_keeps_first_occurrence" -> "SELECT array_distinct(array(3,1,3,2,1))",
    "arr_except_dedups" -> "SELECT array_except(array(1,1,2,3), array(3))",
    "arr_intersect_order_of_left" -> "SELECT array_intersect(array(3,1,2), array(2,3))",
    "arr_join_with_null_replacement" -> "SELECT array_join(array('a',NULL,'b'), ',', '?')",
    "arr_join_skips_null_by_default" -> "SELECT array_join(array('a',NULL,'b'), ',')",
    "arr_max_min_skip_nulls" ->
      "SELECT array_max(array(1,NULL,3)), array_min(array(2,NULL,1))",
    "arr_remove_all_occurrences" -> "SELECT array_remove(array(1,2,1,3), 1)",
    "arr_repeat" -> "SELECT array_repeat('x', 3)",
    "arr_overlap_with_null_entry" -> "SELECT arrays_overlap(array(1,NULL), array(2))",
    "arr_zip_struct_fields" -> "SELECT arrays_zip(array(1,2), array('a','b'))",
    "arr_append_null_element" -> "SELECT array_append(array(1,2), NULL)",
    "arr_prepend" -> "SELECT array_prepend(array(1,2), 0)",
    "arr_insert_negative_index" -> "SELECT array_insert(array(1,2,3), -1, 99)",
    "arr_sequence_desc_step" -> "SELECT sequence(5, 1, -2)",
    "arr_sequence_month_step" ->
      "SELECT sequence(DATE '2020-01-01', DATE '2020-03-01', INTERVAL '1' MONTH)",
    "arr_explode_outer_empty_array_keeps_row" ->
      "SELECT x FROM (SELECT explode_outer(CAST(array() AS ARRAY<INT>)) AS x)",
    "arr_size_vs_cardinality" -> "SELECT array_size(array(1,2)), cardinality(array(1,2))",
    "arr_concat_operator" -> "SELECT concat(array(1), array(2,3))",
    "arr_posexplode_is_zero_based" ->
      "SELECT pos, v FROM (SELECT posexplode(array('a','b')) AS (pos, v))",

    // map construction & access
    "map_from_arrays_basic" -> "SELECT map_from_arrays(array('a','b'), array(1,2))",
    "map_from_entries_basic" ->
      "SELECT map_from_entries(array(struct('a',1), struct('b',2)))",
    "map_entries_preserve_insertion" -> "SELECT map_entries(map('b',2,'a',1))",
    "map_keys_and_values" -> "SELECT map_keys(map('a',1,'b',2)), map_values(map('a',1,'b',2))",
    "map_str_to_map_defaults" -> "SELECT str_to_map('a:1,b:2')",
    "map_contains_key" -> "SELECT map_contains_key(map('a',1), 'a'), map_contains_key(map('a',1), 'z')",
    "map_zip_with_missing_key_null" ->
      "SELECT map_zip_with(map('a',1,'b',2), map('a',10), (k, v1, v2) -> coalesce(v1,0) + coalesce(v2,0))",
    "map_transform_keys" -> "SELECT transform_keys(map('a',1,'b',2), (k, v) -> upper(k))",
    "map_size" -> "SELECT size(map('a',1))",

    // conditionals & predicates (three-valued logic extensions)
    "cond_if_null_condition_takes_else" -> "SELECT if(CAST(NULL AS BOOLEAN), 1, 2)",
    "cond_case_without_else_is_null" -> "SELECT CASE WHEN 1 = 2 THEN 'x' END",
    "cond_nvl2" -> "SELECT nvl2(NULL, 1, 2), nvl2(0, 1, 2)",
    "cond_nanvl_replaces_nan_only" -> "SELECT nanvl(double('NaN'), 1.0e0), nanvl(2.0e0, 1.0e0)",
    "cond_isnan_isnull" -> "SELECT isnan(double('NaN')), isnull(NULL), isnotnull(1)",
    "cond_ifnull" -> "SELECT ifnull(NULL, 'd')",
    "pred_between_null_bound" -> "SELECT 1 BETWEEN NULL AND 2",
    "pred_is_distinct_from_null_safe" ->
      "SELECT 1 IS DISTINCT FROM NULL, NULL IS DISTINCT FROM NULL",
    "pred_like_null_pattern_is_null" -> "SELECT 'a' LIKE CAST(NULL AS STRING)",
    "pred_equal_null_function" -> "SELECT equal_null(NULL, NULL), equal_null(1, NULL)",

    // aggregate surface extensions (ignore-nulls modes, boolean/bitwise
    // aggregates, moments, try_ aggregates, sketch estimate)
    "agg_first_last_ignore_nulls" ->
      "SELECT first(x) IGNORE NULLS, last(x) IGNORE NULLS FROM VALUES (NULL),(1),(2),(NULL) t(x)",
    "agg_any_value_single_partition" ->
      "SELECT any_value(x) FROM VALUES (7),(8) t(x)",
    "agg_bool_and_or_every_some" ->
      "SELECT bool_and(x), bool_or(x), every(x), some(x) FROM VALUES (true),(false) t(x)",
    "agg_bitwise_fns" ->
      "SELECT bit_and(x), bit_or(x), bit_xor(x) FROM VALUES (12),(10),(6) t(x)",
    "agg_corr_covar" ->
      "SELECT corr(x, y), covar_samp(x, y), covar_pop(x, y) FROM VALUES (1e0,2e0),(2e0,4e0),(3e0,6e0) t(x, y)",
    "agg_skewness_kurtosis_pinned" ->
      "SELECT skewness(x), kurtosis(x) FROM VALUES (1e0),(2e0),(3e0),(10e0) t(x)",
    "agg_variance_single_row" ->
      "SELECT var_samp(x), var_pop(x) FROM VALUES (5e0) t(x)",
    "agg_median_interpolates" -> "SELECT median(x) FROM VALUES (1),(2),(3),(4) t(x)",
    "agg_count_if" -> "SELECT count_if(x > 1) FROM VALUES (1),(2),(3) t(x)",
    "agg_percentile_cont_vs_disc" ->
      """SELECT percentile_cont(0.5) WITHIN GROUP (ORDER BY x),
        |       percentile_disc(0.5) WITHIN GROUP (ORDER BY x)
        |FROM VALUES (1),(2),(3),(4) t(x)""".stripMargin,
    "agg_collect_list_preserves_local_order" ->
      "SELECT collect_list(x) FROM VALUES (3),(1),(2) t(x)",
    "agg_grouping_and_grouping_id_rollup" ->
      """SELECT a, grouping(a), grouping_id(a), count(*)
        |FROM VALUES ('x'),('x') t(a) GROUP BY ROLLUP(a) ORDER BY a NULLS LAST""".stripMargin,
    "agg_try_sum_bigint_overflow_null" ->
      "SELECT try_sum(x) FROM VALUES (9223372036854775807L),(1L) t(x)",
    "agg_hll_sketch_estimate_exact_small" ->
      "SELECT hll_sketch_estimate(hll_sketch_agg(x)) FROM VALUES (1),(2),(3),(2) t(x)",
    "agg_bitmap_count_construct" ->
      "SELECT bitmap_count(bitmap_construct_agg(bitmap_bit_position(x))) FROM VALUES (1),(2),(2),(70000) t(x)",

    // window frame gotchas (default-frame last_value, empty frames,
    // ignore-nulls navigation, interval range frames)
    "win_last_value_default_frame_is_current_row" ->
      """SELECT x, last_value(x) OVER (ORDER BY x)
        |FROM VALUES (1),(2),(3) t(x) ORDER BY x""".stripMargin,
    "win_nth_value_full_frame" ->
      """SELECT x, nth_value(x, 2) OVER (ORDER BY x ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |FROM VALUES (1),(2),(3) t(x) ORDER BY x""".stripMargin,
    "win_first_value_ignore_nulls" ->
      """SELECT x, first_value(x) IGNORE NULLS OVER (ORDER BY coalesce(x, 0) ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |FROM VALUES (NULL),(2),(3) t(x) ORDER BY coalesce(x, 0)""".stripMargin,
    "win_lead_beyond_partition_is_null" ->
      """SELECT x, lead(x, 1) OVER (ORDER BY x)
        |FROM VALUES (1),(2) t(x) ORDER BY x""".stripMargin,
    "win_empty_following_frame_counts_zero" ->
      """SELECT x, count(x) OVER (ORDER BY x ROWS BETWEEN 2 FOLLOWING AND 3 FOLLOWING)
        |FROM VALUES (1),(2),(3) t(x) ORDER BY x""".stripMargin,
    "win_rows_sliding_frame" ->
      """SELECT x, sum(x) OVER (ORDER BY x ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING)
        |FROM VALUES (1),(2),(3),(4) t(x) ORDER BY x""".stripMargin,
    "win_range_interval_frame_over_dates" ->
      """SELECT d, count(*) OVER (ORDER BY d RANGE BETWEEN INTERVAL '1' DAY PRECEDING AND CURRENT ROW)
        |FROM VALUES (DATE '2020-01-01'),(DATE '2020-01-02'),(DATE '2020-01-05') t(d) ORDER BY d""".stripMargin,

    // timezone & extended temporal semantics (session zone is UTC)
    "tz_from_utc_timestamp" ->
      "SELECT from_utc_timestamp(TIMESTAMP '2020-01-01 00:00:00', 'Asia/Tokyo')",
    "tz_to_utc_timestamp" ->
      "SELECT to_utc_timestamp(TIMESTAMP '2020-01-01 09:00:00', 'Asia/Tokyo')",
    "tz_convert_timezone_ntz" ->
      "SELECT convert_timezone('UTC', 'Asia/Tokyo', TIMESTAMP_NTZ '2020-01-01 00:00:00')",
    "tz_dst_spring_forward_la" ->
      "SELECT from_utc_timestamp(TIMESTAMP '2020-03-08 10:30:00', 'America/Los_Angeles')",
    "dt_make_timestamp_fractional_seconds" ->
      "SELECT make_timestamp(2020, 1, 2, 3, 4, 5.5)",
    "dt_make_intervals" ->
      "SELECT make_interval(1, 2, 0, 3, 4, 5, 6.5), make_dt_interval(1, 2, 3, 4.5), make_ym_interval(1, 14)",
    "dt_timestamp_seconds_millis_micros" ->
      "SELECT timestamp_seconds(1), timestamp_millis(1500), timestamp_micros(1500000)",
    "dt_unix_date_roundtrip" ->
      "SELECT unix_date(DATE '1970-01-02'), date_from_unix_date(1)",
    "dt_unix_micros_millis" ->
      "SELECT unix_micros(TIMESTAMP '1970-01-01 00:00:01'), unix_millis(TIMESTAMP '1970-01-01 00:00:01')",
    "dt_months_between_same_day_is_whole" ->
      "SELECT months_between(DATE '2020-03-15', DATE '2020-02-15')",
    "dt_date_part_alias" ->
      "SELECT date_part('YEAR', DATE '2020-05-05'), datepart('MONTH', DATE '2020-05-05')",
    "dt_day_name_english_locale" -> "SELECT date_format(DATE '2020-01-05', 'EEEE')",
    "dt_to_timestamp_ntz" -> "SELECT to_timestamp_ntz('2020-01-01 00:00:00')",
    "dt_interval_division" -> "SELECT INTERVAL '1' DAY / 2",
    "dt_date_plus_int_is_date_add" -> "SELECT DATE '2020-01-01' + 1",

    // JSON / CSV / URL function surface
    "json_schema_of_json" -> "SELECT schema_of_json('[{\"a\":1}]')",
    "json_from_json_array_type" -> "SELECT from_json('[1,2]', 'ARRAY<INT>')",
    "json_array_length" -> "SELECT json_array_length('[1,2,3]')",
    "json_object_keys" -> "SELECT json_object_keys('{\"b\":1,\"a\":2}')",
    "json_to_json_map" -> "SELECT to_json(map('a', 1))",
    "csv_from_csv_struct" -> "SELECT from_csv('1,ab', 'a INT, b STRING')",
    "csv_to_csv" -> "SELECT to_csv(named_struct('a', 1, 'b', 'x'))",
    "csv_schema_of_csv" -> "SELECT schema_of_csv('1,ab')",
    "url_parse_host_and_query_key" ->
      "SELECT parse_url('https://h.com:8080/p?q=1#f', 'HOST'), parse_url('https://h.com/p?q=1', 'QUERY', 'q')",
    "url_encode_decode_roundtrip" ->
      "SELECT url_encode('a b&c'), url_decode(url_encode('a b&c'))",

    // variant semantics (semi-structured path extraction)
    "variant_get_typed_path" ->
      "SELECT variant_get(parse_json('{\"a\":{\"b\":7}}'), '$.a.b', 'int')",
    "variant_typeof" -> "SELECT schema_of_variant(parse_json('{\"a\":1}'))",
    "variant_missing_path_null" ->
      "SELECT variant_get(parse_json('{\"a\":1}'), '$.z', 'int')",

    // struct & normalization semantics
    "struct_null_struct_field_access" ->
      "SELECT s.a FROM (SELECT CAST(NULL AS STRUCT<a: INT>) AS s)",
    "struct_star_expansion" ->
      "SELECT s.* FROM (SELECT named_struct('a', 1, 'b', 2) AS s)",
    "norm_distinct_merges_negative_zero" ->
      "SELECT count(DISTINCT x) FROM VALUES (CAST('0.0' AS DOUBLE)),(CAST('-0.0' AS DOUBLE)) t(x)",
    "norm_distinct_merges_nan_variants" ->
      "SELECT count(DISTINCT x) FROM VALUES (double('NaN')),(acos(2e0)) t(x)",

    // generator & misc scalar semantics
    "gen_stack_pads_null" -> "SELECT stack(2, 1, 2, 3)",
    "gen_inline_structs" ->
      "SELECT inline(array(named_struct('a', 1), named_struct('a', 2)))",
    "misc_reflect_static_call" -> "SELECT reflect('java.lang.Math', 'max', 1, 2)",
    "misc_hash_multi_arg" -> "SELECT hash(1, 'a', true)",
    "misc_sha1_pinned" -> "SELECT sha1('abc')",

    // round-5 extension: higher-order-function edges NOT in the round-3
    // hof block (index-lambda filter, three-valued exists/forall with
    // null elements, null-padded string zip, comparator lambdas)
    "hof_filter_with_index" ->
      "SELECT filter(array('a','b','c'), (x, i) -> i > 0)",
    "hof_exists_null_three_valued" ->
      "SELECT exists(array(1, CAST(NULL AS INT)), x -> x > 1)",
    "hof_exists_empty_is_false" ->
      "SELECT exists(CAST(array() AS ARRAY<INT>), x -> x > 0)",
    "hof_forall_null_three_valued" ->
      "SELECT forall(array(2, CAST(NULL AS INT)), x -> x > 1)",
    "hof_zip_with_pads_shorter_with_null" ->
      "SELECT zip_with(array(1,2), array('a'), (x, y) -> concat(x, y))",
    "hof_array_sort_custom_comparator_desc" ->
      "SELECT array_sort(array(3,1,2), (l, r) -> CASE WHEN l < r THEN 1 WHEN l > r THEN -1 ELSE 0 END)",
    "hof_array_sort_default_nulls_last" ->
      "SELECT array_sort(array(2, NULL, 1))",

    // subquery result semantics
    "subq_scalar_empty_is_null" -> "SELECT (SELECT 1 WHERE 1 = 0)",
    "subq_scalar_value" -> "SELECT (SELECT 41) + 1",
    "subq_in_null_list_filters_all" ->
      "SELECT count(*) FROM VALUES (1) t(x) WHERE x IN (SELECT CAST(NULL AS INT))",
    "subq_not_in_null_list_filters_all" ->
      "SELECT count(*) FROM VALUES (1) t(x) WHERE x NOT IN (SELECT CAST(NULL AS INT))",
    "subq_exists_uncorrelated_true" ->
      "SELECT count(*) FROM VALUES (1) t(x) WHERE EXISTS (SELECT 1)",

    // SQL relational shapes (pivot/unpivot syntax, natural/USING joins,
    // inline-table coercion, ordinals, lateral column alias, range TVF)
    "sqlrel_pivot_missing_key_null" ->
      "SELECT * FROM (SELECT 'a' AS k, 1 AS v) PIVOT (sum(v) FOR k IN ('a', 'b'))",
    "sqlrel_unpivot_skips_nulls_by_default" ->
      """SELECT * FROM (SELECT 1 AS id, 10 AS m1, CAST(NULL AS INT) AS m2)
        |UNPIVOT (val FOR metric IN (m1, m2)) ORDER BY metric""".stripMargin,
    "sqlrel_natural_join_merges_key" ->
      "SELECT * FROM VALUES (1, 'a') t(k, b) NATURAL JOIN (SELECT 1 AS k, 'c' AS c)",
    "sqlrel_using_join_single_key_column" ->
      "SELECT * FROM VALUES (1, 'a') t(k, b) JOIN (SELECT 1 AS k, 'c' AS c) USING (k)",
    "sqlrel_values_int_decimal_coercion" ->
      "SELECT x FROM VALUES (1), (2.5) t(x) ORDER BY x",
    "sqlrel_group_by_ordinal" ->
      "SELECT x, count(*) FROM VALUES (1),(1),(2) t(x) GROUP BY 1 ORDER BY 1",
    "sqlrel_order_by_ordinal_desc" ->
      "SELECT x FROM VALUES (1),(3),(2) t(x) ORDER BY 1 DESC",
    "sqlrel_lateral_column_alias" -> "SELECT 1 AS a, a + 1 AS b",
    "sqlrel_range_tvf" -> "SELECT * FROM range(2, 7, 2)",
    "sqlrel_intersect_all_multiplicity" ->
      """SELECT x FROM (SELECT x FROM VALUES (1),(1),(2) t(x)
        |INTERSECT ALL SELECT x FROM VALUES (1),(1) s(x)) ORDER BY x""".stripMargin,

    // collation (Spark 4 surface)
    "coll_lcase_equality" -> "SELECT 'abc' COLLATE UTF8_LCASE = 'ABC'",
    "coll_collation_of_default" -> "SELECT collation('abc')",

    // round-5 aggregate/window surface extras
    "agg_listagg_within_group_ordered" ->
      "SELECT listagg(x, ',') WITHIN GROUP (ORDER BY x) FROM VALUES ('b'),('a'),('c') t(x)",
    "agg_mode_smallest_tie" ->
      "SELECT mode(x) FROM VALUES (1),(1),(2),(2) t(x)",
    "agg_histogram_numeric_exact_bins" ->
      "SELECT histogram_numeric(x, 2) FROM VALUES (1e0),(1e0),(5e0) t(x)",
    "win_cume_dist_fraction" ->
      """SELECT x, cume_dist() OVER (ORDER BY x)
        |FROM VALUES (1),(2),(2),(3) t(x) ORDER BY x, 2""".stripMargin,

    // numeric sign/modulo edges and misc round-5 scalars
    "math_pmod_vs_modulo_negative" -> "SELECT pmod(-7, 3), -7 % 3",
    "math_positive_negative" -> "SELECT positive(5), negative(5)",
    "str_char_chr_codepoint" -> "SELECT char(65), chr(98)",
    "misc_sentences_splits" -> "SELECT sentences('Hi there. How are you')",
    "misc_bitmap_positions" ->
      "SELECT bitmap_bucket_number(1), bitmap_bucket_number(32769), bitmap_bit_position(70000)",
    "misc_try_parse_json_invalid_null" -> "SELECT try_parse_json('{bad')",
    "misc_assert_true_passes_null" -> "SELECT assert_true(1 = 1)",
    "misc_current_database_default" -> "SELECT current_database()",

    // Spark 4.1 surface: TIME type, approx_top_k sketches, deterministic
    // AES modes, seeded random generators, UTF-8 validation
    // TIME values are parse-able but still collection-gated in 4.1
    // (UNSUPPORTED_TIME_TYPE on the serializer path) — pin the part
    // that IS public surface: the literal resolves and types
    "time_literal_typeof" -> "SELECT typeof(TIME '12:00:00')",
    "sketch_approx_top_k_exact_small" ->
      "SELECT approx_top_k(x, 2) FROM VALUES ('a'),('a'),('b'),('c'),('a') t(x)",
    "sketch_approx_top_k_two_phase" ->
      "SELECT approx_top_k_estimate(approx_top_k_accumulate(x), 2) FROM VALUES ('a'),('a'),('b') t(x)",
    "crypto_aes_ecb_deterministic" ->
      "SELECT hex(aes_encrypt('spark', 'abcdefghijklmnop', 'ECB'))",
    "crypto_aes_ecb_roundtrip" ->
      "SELECT CAST(aes_decrypt(aes_encrypt('secret','0123456789abcdef','ECB'),'0123456789abcdef','ECB') AS STRING)",
    "crypto_try_aes_decrypt_bad_key_null" ->
      "SELECT try_aes_decrypt(aes_encrypt('x','abcdefghijklmnop','ECB'),'wrongwrongwrongw','ECB')",
    "rand_randstr_seeded" -> "SELECT randstr(8, 42)",
    "rand_uniform_seeded" -> "SELECT uniform(0, 100, 42), uniform(0.0e0, 1.0e0, 7)",
    "utf8_validation_family" ->
      "SELECT is_valid_utf8(x'80'), is_valid_utf8('ok'), try_validate_utf8(x'80'), hex(CAST(make_valid_utf8(x'80') AS BINARY))",

    // round-5b extension: coercion/rendering/ordering corners not yet
    // pinned — double rendering, NaN aggregation order, array group
    // keys, named windows, interval aggregation, regex lookaround
    "render_double_fp_artifact" -> "SELECT CAST(0.1e0 + 0.2e0 AS STRING)",
    "render_float_to_string_shortest" -> "SELECT CAST(CAST('1.1' AS FLOAT) AS STRING)",
    "coerce_string_int_comparison" -> "SELECT '10' = 10, '1.5' = 1.5e0",
    "coerce_string_number_concat" -> "SELECT 'a' || 1",
    "coerce_date_string_comparison" -> "SELECT DATE '2020-01-01' = '2020-01-01'",
    "coerce_union_by_position_not_name" ->
      "SELECT a, b FROM (SELECT 1 AS a, 'x' AS b UNION ALL SELECT 2, 'y') ORDER BY a",
    "coerce_bool_cast_from_nonzero_int" ->
      "SELECT CAST(2 AS BOOLEAN), CAST(0 AS BOOLEAN)",
    "order_nan_sorts_after_infinity" ->
      "SELECT x FROM VALUES (double('NaN')),(1e0),(double('Infinity')) t(x) ORDER BY x",
    "order_boolean_false_before_true" ->
      "SELECT x FROM VALUES (true),(false) t(x) ORDER BY x",
    "order_string_binary_collation_upper_first" ->
      "SELECT min(x), max(x) FROM VALUES ('a'),('B') t(x)",
    "nan_greatest_prefers_nan_least_does_not" ->
      "SELECT greatest(double('NaN'), 1e0), least(double('NaN'), 1e0)",
    "agg_group_by_array_key" ->
      "SELECT x, count(*) FROM VALUES (array(1,2)),(array(1,2)),(array(3)) t(x) GROUP BY x ORDER BY x",
    "agg_sum_avg_of_interval" ->
      "SELECT sum(x), avg(x) FROM VALUES (INTERVAL '1' DAY),(INTERVAL '2' DAY) t(x)",
    "agg_array_agg_alias" ->
      "SELECT array_agg(x) FROM VALUES (1),(2) t(x)",
    "agg_collect_set_dedups_sorted" ->
      "SELECT sort_array(collect_set(x)) FROM VALUES (2),(1),(2) t(x)",
    "agg_stddev_pop_single_row_zero" ->
      "SELECT stddev_pop(x), var_pop(x) FROM VALUES (5e0) t(x)",
    "agg_approx_percentile_exact_small" ->
      "SELECT approx_percentile(x, 0.5) FROM VALUES (1),(2),(3) t(x)",
    "win_named_window_clause" ->
      """SELECT x, sum(x) OVER w FROM VALUES (1),(2) t(x)
        |WINDOW w AS (ORDER BY x) ORDER BY x""".stripMargin,
    "win_lead_ignore_nulls" ->
      """SELECT x, lead(x, 1) IGNORE NULLS OVER (ORDER BY coalesce(x, 2))
        |FROM VALUES (1),(NULL),(3) t(x) ORDER BY coalesce(x, 2)""".stripMargin,
    "gen_explode_map_two_columns" ->
      "SELECT k, v FROM (SELECT explode(map('a', 1)) AS (k, v))",
    "gen_lateral_view_outer_empty" ->
      """SELECT t.id, e.x FROM VALUES (1) t(id)
        |LATERAL VIEW OUTER explode(CAST(array() AS ARRAY<INT>)) e AS x""".stripMargin,
    "regex_lookahead_supported" -> "SELECT 'foobar' RLIKE 'foo(?=bar)'",
    "regex_dot_excludes_newline" -> "SELECT 'a\nb' RLIKE 'a.b'",
    "regex_like_underscore_single_char" ->
      "SELECT 'abc' LIKE 'a_c', 'abbc' LIKE 'a_c'",
    "ts_subtraction_yields_day_time_interval" ->
      "SELECT TIMESTAMP '2020-01-02 00:00:00' - TIMESTAMP '2020-01-01 23:00:00'",
    "ts_sequence_hour_step" ->
      """SELECT sequence(TIMESTAMP '2020-01-01 00:00:00',
        |TIMESTAMP '2020-01-01 02:00:00', INTERVAL '1' HOUR)""".stripMargin,
    "sqlrel_execute_immediate" -> "EXECUTE IMMEDIATE 'SELECT 41 + 1 AS x'",
    "sqlrel_execute_immediate_using_param" ->
      "EXECUTE IMMEDIATE 'SELECT ? * 2 AS x' USING 21",
    "literal_hex_binary_typing" -> "SELECT typeof(x'0A'), hex(x'0A')",
    "literal_exponent_is_double" -> "SELECT typeof(1E2)",
    // Spark 4 newly supports grouping by MAP keys (it errored through 3.5)
    "agg_group_by_map_key_supported" ->
      "SELECT m, count(*) FROM (SELECT map('a', 1) AS m UNION ALL SELECT map('a', 1)) GROUP BY m",

    // round-5c extension: deeper cast/ordering/temporal/string corners
    "cast_decimal_to_int_truncates" -> "SELECT CAST(CAST(2.9 AS DECIMAL(3,1)) AS INT)",
    "cast_char_type_pads" ->
      "SELECT CAST('a' AS CHAR(3)) = 'a', length(CAST('a' AS CHAR(3)))",
    "cast_fractional_ts_to_double_epoch" ->
      "SELECT CAST(TIMESTAMP '1970-01-01 00:00:00.5' AS DOUBLE)",
    "cmp_no_trailing_space_padding" -> "SELECT 'a' = 'a ', 'a' < 'a '",
    "cmp_array_lexicographic" ->
      "SELECT array(1,2) < array(1,3), array(1,2) < array(1,2,0)",
    "cmp_array_equality_with_nulls" ->
      "SELECT array(1, NULL) = array(1, NULL), array(1, NULL) = array(1, 2)",
    "cmp_interval_cross_unit" -> "SELECT INTERVAL '1' DAY > INTERVAL '23' HOUR",
    "render_negative_interval" -> "SELECT CAST(-INTERVAL '1' DAY AS STRING)",
    "render_year_month_interval" -> "SELECT CAST(INTERVAL '1-2' YEAR TO MONTH AS STRING)",
    "render_day_second_interval" ->
      "SELECT CAST(INTERVAL '1 02:03:04' DAY TO SECOND AS STRING)",
    "unicode_emoji_length_utf16" -> "SELECT length('👍'), octet_length('👍')",
    "rand_seeded_reproducible" -> "SELECT round(rand(42), 6)",
    "tz_current_timezone_utc" -> "SELECT current_timezone()",
    "dt_to_date_defaults_1970" -> "SELECT to_date('02-03', 'MM-dd')",
    "dt_unix_seconds_whole" ->
      "SELECT unix_seconds(TIMESTAMP '1970-01-01 00:00:01')",
    "dt_timestampadd_quarter_clamps" ->
      "SELECT timestampadd(QUARTER, 1, TIMESTAMP '2020-01-31 00:00:00')",
    "dt_months_between_31_day_divisor" ->
      "SELECT months_between(DATE '2020-03-14', DATE '2020-02-28')",
    "dt_date_minus_second_is_timestamp" ->
      "SELECT DATE '2020-01-01' - INTERVAL '1' SECOND",
    "dt_trunc_invalid_format_null" -> "SELECT trunc(DATE '2020-02-15', 'bogus')",
    "dt_date_format_quarter_pattern" ->
      "SELECT date_format(DATE '2020-05-05', 'QQQ')",
    "str_levenshtein_threshold_exceeded" ->
      "SELECT levenshtein('kitten', 'sitting', 2)",
    "str_substring_past_end_empty" -> "SELECT substring('ab', 5, 3)",
    "str_ascii_empty_zero" -> "SELECT ascii('')",
    "str_hex_of_string" -> "SELECT hex('ab')",
    "math_log_with_base" -> "SELECT log(2, 8)",
    "math_getbit" -> "SELECT getbit(11, 0), getbit(11, 2)",
    "math_shiftright_unsigned" -> "SELECT shiftrightunsigned(-1, 60)",
    "math_width_bucket_below_range_zero" ->
      "SELECT width_bucket(-5e0, 0.2e0, 10.6e0, 5)",
    "gen_posexplode_outer_null_array" ->
      "SELECT pos, v FROM (SELECT posexplode_outer(CAST(NULL AS ARRAY<INT>)) AS (pos, v))",

    // round-5d extension: complex-type casts, struct null-field
    // comparison, TVF/DDL faces, Spark-4 function aliases
    "cast_array_int_to_string_array" -> "SELECT CAST(array(1,2) AS ARRAY<STRING>)",
    "cast_map_value_widening" -> "SELECT CAST(map('a',1) AS MAP<STRING,DOUBLE>)",
    "cast_struct_field_retype" -> "SELECT CAST(named_struct('a',1) AS STRUCT<a: STRING>)",
    "cmp_struct_null_field_equality" ->
      "SELECT named_struct('a', CAST(NULL AS INT)) = named_struct('a', CAST(NULL AS INT))",
    "cmp_struct_null_field_ordering" ->
      "SELECT struct(CAST(NULL AS INT)) < struct(1)",
    "ddl_describe_query_schema" -> "DESCRIBE QUERY SELECT 1 AS x, 'a' AS y",
    "ddl_show_functions_like" -> "SHOW FUNCTIONS LIKE 'xxhash64'",
    "sqlrel_explode_as_tvf" -> "SELECT * FROM explode(array(10, 20))",
    "str_printf_alias" -> "SELECT printf('%03d', 7)",
    "str_len_alias" -> "SELECT len('abc'), len(x'0102')",
    "dt_dayname_monthname" ->
      "SELECT dayname(DATE '2020-01-05'), monthname(DATE '2020-01-05')",
    "math_try_mod_by_zero" -> "SELECT try_mod(7, 0)",
    "json_variant_array_index" ->
      "SELECT variant_get(parse_json('[1,2,3]'), '$[2]', 'int')",
    "hof_transform_nested_arrays" ->
      "SELECT transform(array(array(1,2)), xs -> transform(xs, x -> x + 1))",

    // round-5e: modern relational SQL forms
    "sqlrel_having_without_group_by" ->
      "SELECT count(*) FROM VALUES (1),(2) t(x) HAVING count(*) > 1",
    "sqlrel_order_by_all" ->
      "SELECT x, y FROM VALUES (2, 'b'),(1, 'a'),(1, 'c') t(x, y) ORDER BY ALL",
    "sqlrel_group_by_all_infers_keys" ->
      "SELECT x, count(*) AS n FROM VALUES (1),(1),(2) t(x) GROUP BY ALL ORDER BY x",
    "sqlrel_star_except_column" ->
      "SELECT * EXCEPT (b) FROM (SELECT 1 AS a, 2 AS b, 3 AS c)",
    "sqlrel_limit_all" ->
      "SELECT x FROM VALUES (1),(2) t(x) ORDER BY x LIMIT ALL",
    "sqlrel_select_distinct_rows" ->
      "SELECT DISTINCT x, y FROM VALUES (1, 'a'),(1, 'a'),(2, 'b') t(x, y) ORDER BY x",

    // join null-key semantics (the three-valued-logic corners that
    // differ between = joins, <=> joins, and NOT IN rewrites)
    "joinnull_equi_drops_null_keys" ->
      """SELECT count(*) FROM VALUES (1),(CAST(NULL AS INT)) a(k)
        |JOIN VALUES (1),(CAST(NULL AS INT)) b(k) ON a.k = b.k""".stripMargin,
    "joinnull_null_safe_eq_matches_nulls" ->
      """SELECT count(*) FROM VALUES (1),(CAST(NULL AS INT)) a(k)
        |JOIN VALUES (1),(CAST(NULL AS INT)) b(k) ON a.k <=> b.k""".stripMargin,
    "joinnull_anti_keeps_null_probe" ->
      """SELECT a.k FROM VALUES (1),(2),(CAST(NULL AS INT)) a(k)
        |ANTI JOIN VALUES (1) b(k) ON a.k = b.k ORDER BY a.k NULLS FIRST""".stripMargin,
    "joinnull_not_in_empties_on_null_build" ->
      """SELECT count(*) FROM VALUES (1),(2) a(k)
        |WHERE a.k NOT IN (SELECT k FROM VALUES (1),(CAST(NULL AS INT)) b(k))""".stripMargin,
    "joinnull_semi_ignores_null_probe" ->
      """SELECT a.k FROM VALUES (1),(CAST(NULL AS INT)) a(k)
        |SEMI JOIN VALUES (1),(CAST(NULL AS INT)) b(k) ON a.k = b.k""".stripMargin,
    "joinnull_full_outer_pads_both" ->
      """SELECT a.k, b.k FROM VALUES (1),(2) a(k)
        |FULL OUTER JOIN VALUES (2),(3) b(k) ON a.k = b.k
        |ORDER BY a.k NULLS LAST, b.k NULLS LAST""".stripMargin,
    "joinnull_left_join_filter_vs_on" ->
      """SELECT a.k, b.k FROM VALUES (1),(2) a(k)
        |LEFT JOIN VALUES (1) b(k) ON a.k = b.k AND b.k > 99
        |ORDER BY a.k""".stripMargin,

    // ---- wave 6a: GlutenCastSuite / GlutenTryCastSuite faces ----------
    "castsuite_tinyint_to_smallint_widens" -> "SELECT CAST(CAST(7 AS TINYINT) AS SMALLINT), typeof(CAST(CAST(7 AS TINYINT) AS SMALLINT))",
    "castsuite_int_to_float_to_int_roundtrip" -> "SELECT CAST(CAST(16777217 AS FLOAT) AS INT)",
    "castsuite_long_to_double_precision_loss" -> "SELECT CAST(CAST(9007199254740993 AS DOUBLE) AS BIGINT)",
    "castsuite_float_to_double_widening_exact" -> "SELECT CAST(CAST(0.5 AS FLOAT) AS DOUBLE)",
    "castsuite_double_point_one_to_float_print" -> "SELECT CAST(CAST(0.1 AS FLOAT) AS STRING)",
    "castsuite_bool_to_string" -> "SELECT CAST(true AS STRING), CAST(false AS STRING)",
    "castsuite_string_bool_t_f_forms" -> "SELECT CAST('t' AS BOOLEAN), CAST('f' AS BOOLEAN), CAST('1' AS BOOLEAN), CAST('0' AS BOOLEAN)",
    "castsuite_string_to_binary_utf8" -> "SELECT hex(CAST('ab' AS BINARY))",
    "castsuite_binary_to_string_roundtrip" -> "SELECT CAST(CAST('hi' AS BINARY) AS STRING)",
    "castsuite_decimal_to_string_plain" -> "SELECT CAST(CAST(1.10 AS DECIMAL(5,2)) AS STRING)",
    "castsuite_decimal_rescale_pads_zeros" -> "SELECT CAST(CAST(1.5 AS DECIMAL(3,1)) AS DECIMAL(6,3))",
    "castsuite_string_sci_notation_to_double" -> "SELECT CAST('1.5e2' AS DOUBLE)",
    "castsuite_string_hex_not_numeric" -> "SELECT try_cast('0x1A' AS INT)",
    "castsuite_ts_string_without_seconds" -> "SELECT CAST('2020-01-02 03:04' AS TIMESTAMP)",
    "castsuite_date_string_with_time_truncates" -> "SELECT CAST('2020-01-02 23:59:59' AS DATE)",
    "castsuite_ts_micros_preserved" -> "SELECT CAST('2020-01-02 03:04:05.123456' AS TIMESTAMP)",
    "castsuite_ts_to_string_drops_trailing_zero_micros" -> "SELECT CAST(TIMESTAMP '2020-01-02 03:04:05.100000' AS STRING)",
    "castsuite_interval_string_roundtrip_ym" -> "SELECT CAST(CAST('1-2' AS INTERVAL YEAR TO MONTH) AS STRING)",
    "castsuite_null_cast_keeps_type" -> "SELECT typeof(CAST(NULL AS DECIMAL(7,2)))",
    "castsuite_string_t_leading_trailing_ws_bool" -> "SELECT CAST('  true  ' AS BOOLEAN)",
    "castsuite_negative_zero_double_to_string" -> "SELECT CAST(double('-0.0') AS STRING)",
    "castsuite_float_nan_ordering_max" -> "SELECT greatest(double('NaN'), 1e308), least(double('NaN'), -1e308)",
    "castsuite_timestamp_ntz_from_string" -> "SELECT CAST('2020-01-02 03:04:05' AS TIMESTAMP_NTZ)",
    "castsuite_date_to_timestamp_ntz" -> "SELECT CAST(DATE '2020-01-02' AS TIMESTAMP_NTZ)",
    "castsuite_string_smallint_overflow_try_null" -> "SELECT try_cast('32768' AS SMALLINT), try_cast('32767' AS SMALLINT)",

    // ---- wave 6a: GlutenTryEvalSuite faces ----------------------------
    "tryeval_try_add_overflow_null" -> "SELECT try_add(2147483647, 1)",
    "tryeval_try_add_ok" -> "SELECT try_add(1, 2)",
    "tryeval_try_subtract_underflow_null" -> "SELECT try_subtract(-2147483648, 1)",
    "tryeval_try_multiply_overflow_null" -> "SELECT try_multiply(9223372036854775807, 2)",
    "tryeval_try_divide_zero_null" -> "SELECT try_divide(1, 0)",
    "tryeval_try_divide_interval_ok" -> "SELECT try_divide(INTERVAL '2' DAY, 2)",
    "tryeval_try_mod_zero_null" -> "SELECT try_mod(5, 0)",
    "tryeval_try_sum_long_overflow_null" ->
      "SELECT try_sum(v) FROM VALUES (9223372036854775807), (1) t(v)",
    "tryeval_try_avg_decimal_overflow_null" ->
      "SELECT try_avg(v) FROM VALUES (CAST(9e37 AS DECIMAL(38,0))), (CAST(9e37 AS DECIMAL(38,0))) t(v)",
    "tryeval_try_element_at_oob_null" -> "SELECT try_element_at(array(1, 2), 5)",
    "tryeval_try_element_at_map_missing_null" -> "SELECT try_element_at(map('a', 1), 'b')",
    "tryeval_try_to_number_malformed_null" -> "SELECT try_to_number('x', '999')",
    "tryeval_try_to_number_ok" -> "SELECT try_to_number('454', '999')",
    "tryeval_try_to_binary_bad_base64_null" -> "SELECT try_to_binary('§', 'base64')",
    "tryeval_try_to_timestamp_malformed_null" -> "SELECT try_to_timestamp('nope')",
    "tryeval_try_make_interval_overflow_null" -> "SELECT try_make_interval(2147483647, 120)",
    "tryeval_try_parse_json_malformed_null" -> "SELECT try_parse_json('{bad json')",
    "tryeval_try_reflect_runtime_failure_null" ->
      "SELECT try_reflect('java.lang.Integer', 'parseInt', 'nope')",

    // ---- wave 6a: GlutenDateExpressionsSuite / GlutenDateFunctionsSuite
    "datetime_year_month_day_quarter" ->
      "SELECT year(DATE '2021-11-15'), month(DATE '2021-11-15'), day(DATE '2021-11-15'), quarter(DATE '2021-11-15')",
    "datetime_hour_minute_second_of_ts" ->
      "SELECT hour(TIMESTAMP '2020-01-02 03:04:05'), minute(TIMESTAMP '2020-01-02 03:04:05'), second(TIMESTAMP '2020-01-02 03:04:05')",
    "datetime_dayofyear_boundaries" -> "SELECT dayofyear(DATE '2020-12-31'), dayofyear(DATE '2021-12-31')",
    "datetime_weekday_monday_zero" -> "SELECT weekday(DATE '2020-01-06')",
    "datetime_next_day_strictly_after" -> "SELECT next_day(DATE '2020-01-05', 'SUN')",
    "datetime_trunc_quarter" -> "SELECT trunc(DATE '2020-05-05', 'QUARTER')",
    "datetime_trunc_mm_alias" -> "SELECT trunc(DATE '2020-05-05', 'MM')",
    "datetime_date_trunc_hour_ts" -> "SELECT date_trunc('HOUR', TIMESTAMP '2020-01-01 12:34:56')",
    "datetime_date_part_field" -> "SELECT date_part('YEAR', DATE '2020-03-14'), date_part('DOY', DATE '2020-03-14')",
    "datetime_extract_epoch_like_unix" -> "SELECT unix_date(DATE '1970-01-11')",
    "datetime_unix_millis_micros" ->
      "SELECT unix_millis(TIMESTAMP '1970-01-01 00:00:01'), unix_micros(TIMESTAMP '1970-01-01 00:00:01')",
    "datetime_timestamp_millis_micros_ctor" ->
      "SELECT timestamp_millis(1000), timestamp_micros(1000000)",
    "datetime_date_from_unix_date" -> "SELECT date_from_unix_date(10)",
    "datetime_make_timestamp_fractional" ->
      "SELECT make_timestamp(2020, 2, 29, 23, 59, 59.5)",
    "datetime_make_ym_dt_interval" ->
      "SELECT make_ym_interval(1, 14), make_dt_interval(1, 25, 61, 61.5)",
    "datetime_months_between_roundoff_off" ->
      "SELECT months_between(DATE '2020-03-15', DATE '2020-02-14', false)",
    "datetime_datediff_negative" -> "SELECT datediff(DATE '2020-01-01', DATE '2020-01-05')",
    "datetime_date_format_day_of_week_text" ->
      "SELECT date_format(DATE '2020-01-05', 'EEEE')",
    "datetime_date_format_am_pm" ->
      "SELECT date_format(TIMESTAMP '2020-01-01 13:05:00', 'hh:mm a')",
    "datetime_to_date_two_arg_pattern" -> "SELECT to_date('14.03.2020', 'dd.MM.yyyy')",
    "datetime_to_timestamp_two_arg_pattern" ->
      "SELECT to_timestamp('2020/03/14 05', 'yyyy/MM/dd HH')",
    "datetime_from_unixtime_pattern" -> "SELECT from_unixtime(86400, 'yyyy-MM-dd HH:mm')",
    "datetime_ts_add_ym_interval_leap" ->
      "SELECT TIMESTAMP '2020-02-29 12:00:00' + INTERVAL '1' YEAR",
    "datetime_ts_diff_yields_dt_interval" ->
      "SELECT TIMESTAMP '2020-01-02 03:00:00' - TIMESTAMP '2020-01-01 00:00:00'",
    "datetime_timestampdiff_month_clamped" ->
      "SELECT timestampdiff(MONTH, TIMESTAMP '2020-01-31 00:00:00', TIMESTAMP '2020-02-29 00:00:00')",
    "datetime_timestampadd_microsecond" ->
      "SELECT timestampadd(MICROSECOND, 1, TIMESTAMP '2020-01-01 00:00:00')",
    "datetime_dayofmonth_alias" -> "SELECT dayofmonth(DATE '2020-02-29')",
    "datetime_to_utc_from_utc_timestamp" ->
      "SELECT to_utc_timestamp(TIMESTAMP '2020-01-01 12:00:00', 'PST'), from_utc_timestamp(TIMESTAMP '2020-01-01 12:00:00', 'PST')",
    "datetime_convert_timezone_three_arg" ->
      "SELECT convert_timezone('UTC', 'America/Los_Angeles', TIMESTAMP_NTZ '2020-06-01 12:00:00')",
    "datetime_session_window_free_date_add_alias" -> "SELECT dateadd(DAY, 3, DATE '2020-02-27')",
    "datetime_datepart_week_iso" -> "SELECT datepart('WEEK', DATE '2021-01-04')",
    "datetime_last_day_non_leap" -> "SELECT last_day(DATE '2019-02-10')",
    "datetime_make_date_max_year" -> "SELECT make_date(9999, 12, 31)",
    "datetime_curdate_stable_type" -> "SELECT typeof(current_date())",
    "datetime_localtimestamp_type" -> "SELECT typeof(localtimestamp())",

    // ---- wave 6b: GlutenStringExpressionsSuite / GlutenStringFunctionsSuite
    "strexpr_lpad_rpad_truncate" -> "SELECT lpad('abc', 2), rpad('abc', 5, 'xy')",
    "strexpr_lpad_default_space" -> "SELECT lpad('7', 3)",
    "strexpr_repeat_zero_and_negative" -> "SELECT repeat('ab', 0), repeat('ab', -1)",
    "strexpr_reverse_string" -> "SELECT reverse('abc')",
    "strexpr_space_function" -> "SELECT concat('a', space(3), 'b')",
    "strexpr_locate_with_start" -> "SELECT locate('l', 'hello', 4)",
    "strexpr_position_three_arg" -> "SELECT position('l', 'hello', 4)",
    "strexpr_elt_one_based" -> "SELECT elt(2, 'a', 'b', 'c')",
    "strexpr_elt_oob_null_nonansi_face" -> "SELECT try_element_at(array('a','b'), 9)",
    "strexpr_field_like_find_in_set" -> "SELECT find_in_set('b', 'a,b,c'), find_in_set('x', 'a,b,c')",
    "strexpr_format_number_grouping" -> "SELECT format_number(1234567.891, 2)",
    "strexpr_format_string_positional" -> "SELECT format_string('%2$s-%1$s', 'a', 'b')",
    "strexpr_soundex_code" -> "SELECT soundex('Tymczak'), soundex('Robert')",
    "strexpr_sentences_tokenize" -> "SELECT sentences('Hi there. How are you?')",
    "strexpr_str_to_map_defaults" -> "SELECT str_to_map('a:1,b:2')",
    "strexpr_str_to_map_custom_delims" -> "SELECT str_to_map('a=1;b=2', ';', '=')",
    "strexpr_mask_defaults" -> "SELECT mask('AbCd-1234')",
    "strexpr_mask_custom_chars" -> "SELECT mask('AbCd-1234', 'X', 'x', '#', '*')",
    "strexpr_split_limit" -> "SELECT split('a,b,c,d', ',', 2)",
    "strexpr_split_part_one_based" -> "SELECT split_part('a~b~c', '~', 2), split_part('a~b~c', '~', -1)",
    "strexpr_substring_index_pos_neg" -> "SELECT substring_index('a.b.c', '.', 2), substring_index('a.b.c', '.', -1)",
    "strexpr_trim_both_leading_trailing" -> "SELECT trim(BOTH 'x' FROM 'xxaxx'), trim(LEADING 'x' FROM 'xxaxx'), trim(TRAILING 'x' FROM 'xxaxx')",
    "strexpr_btrim_charset" -> "SELECT btrim('xyaxy', 'xy')",
    "strexpr_initcap_on_mixed_delims" -> "SELECT initcap('a-b c_d')",
    "strexpr_char_chr_function" -> "SELECT char(65), chr(97)",
    "strexpr_base64_unbase64_roundtrip" -> "SELECT base64(CAST('hi' AS BINARY)), CAST(unbase64(base64(CAST('hi' AS BINARY))) AS STRING)",
    "strexpr_encode_decode_charset" -> "SELECT decode(encode('abc', 'utf-8'), 'utf-8')",
    "strexpr_to_char_decimal_pattern" -> "SELECT to_char(454.1, '9999.9')",
    "strexpr_to_varchar_leading_zeros" -> "SELECT to_varchar(7, '0999')",
    "strexpr_contains_startswith_endswith" -> "SELECT contains('SparkSQL', 'kSQ'), startswith('SparkSQL', 'Spark'), endswith('SparkSQL', 'SQL')",
    "strexpr_octet_length_vs_char_length" -> "SELECT char_length('héllo'), octet_length('héllo'), bit_length('héllo')",
    "strexpr_ucase_lcase_aliases" -> "SELECT ucase('aB'), lcase('aB')",
    "strexpr_levenshtein_plain" -> "SELECT levenshtein('kitten', 'sitting')",
    "strexpr_luhn_check_valid_invalid" -> "SELECT luhn_check('4111111111111111'), luhn_check('4111111111111112')",
    "strexpr_char_out_of_bmp" -> "SELECT chr(128077)",
    "strexpr_replace_all_occurrences" -> "SELECT replace('aaa', 'a', 'b'), replace('abc', '', 'x')",
    "strexpr_overlay_binary" -> "SELECT hex(overlay(x'00112233' PLACING x'ff' FROM 2))",
    "strexpr_concat_ws_all_null_empty" -> "SELECT concat_ws(',', NULL, NULL)",
    "strexpr_empty2null_writer_face" -> "SELECT nullif('', ''), nullif('a', '')",
    "strexpr_quote_string" -> "SELECT quote('it''s')",
    "strexpr_is_valid_utf8" -> "SELECT is_valid_utf8('ok'), is_valid_utf8(CAST(x'80' AS STRING))",
    "strexpr_make_valid_utf8_replaces" -> "SELECT hex(encode(make_valid_utf8(CAST(x'61ff62' AS STRING)), 'utf-8'))",
    "strexpr_validate_utf8_ok" -> "SELECT validate_utf8('ok')",
    "strexpr_try_validate_utf8_bad_null" -> "SELECT try_validate_utf8(CAST(x'80' AS STRING))",

    // ---- wave 6b: GlutenRegexpExpressionsSuite ------------------------
    "regexp_like_basic_anchor" -> "SELECT 'abc' RLIKE '^ab', 'abc' RLIKE '^bc'",
    "regexp_extract_group_zero_whole" -> "SELECT regexp_extract('a1b2', '([a-z])(\\\\d)', 0)",
    "regexp_extract_no_match_empty" -> "SELECT regexp_extract('abc', '(\\\\d+)', 1)",
    "regexp_extract_all_groups" -> "SELECT regexp_extract_all('a1b2c3', '([a-z])(\\\\d)', 2)",
    "regexp_replace_backreference" -> "SELECT regexp_replace('a1b2', '([a-z])(\\\\d)', '$2$1')",
    "regexp_replace_empty_pattern_matches" -> "SELECT regexp_replace('ab', '', 'X')",
    "regexp_count_overlapping_not" -> "SELECT regexp_count('aaa', 'aa')",
    "regexp_instr_position" -> "SELECT regexp_instr('hello world', 'o.')",
    "regexp_substr_first_match" -> "SELECT regexp_substr('steak, potato', '[a-z]+')",
    "regexp_split_regex_class" -> "SELECT split('a1b22c333d', '[0-9]+')",
    "regexp_like_dot_matches_not_newline" -> "SELECT 'a\\nb' RLIKE 'a.b', regexp_like('a\\nb', '(?s)a.b')",
    "regexp_case_insensitive_flag" -> "SELECT regexp_like('ABC', '(?i)abc')",
    "regexp_escaped_metachar_literal" -> "SELECT regexp_extract('1+2', '\\\\+', 0)",
    "regexp_word_boundary" -> "SELECT regexp_count('the cat sat', '\\\\bat\\\\b'), regexp_count('the cat sat', 'at\\\\b')",
    "regexp_rlike_null_pattern_null" -> "SELECT 'a' RLIKE CAST(NULL AS STRING)",
    "regexp_quantifier_greedy_vs_lazy" -> "SELECT regexp_extract('<a><b>', '<(.*)>', 1), regexp_extract('<a><b>', '<(.*?)>', 1)",

    // ---- wave 6b: GlutenMathExpressionsSuite / GlutenArithmeticExpressionSuite
    "mathexpr_ceil_floor_scale_arg" -> "SELECT ceil(3.1411, 2), floor(3.1419, 2)",
    "mathexpr_ceil_floor_negative_scale" -> "SELECT ceil(451, -2), floor(451, -2)",
    "mathexpr_round_scale_negative" -> "SELECT round(455, -1)",
    "mathexpr_rint_even_rounding" -> "SELECT rint(2.5e0), rint(3.5e0)",
    "mathexpr_exp_ln_roundtrip" -> "SELECT round(ln(exp(2e0)), 10)",
    "mathexpr_log10_log2" -> "SELECT log10(1000e0), log2(8e0)",
    "mathexpr_log_zero_null_vs_error_face" -> "SELECT try_divide(0e0, 0e0), log10(0e0)",
    "mathexpr_power_edge_zero_zero" -> "SELECT power(0e0, 0e0)",
    "mathexpr_sqrt_negative_nan" -> "SELECT sqrt(-1e0)",
    "mathexpr_cbrt_negative_ok" -> "SELECT cbrt(-27e0)",
    "mathexpr_hypot_no_overflow" -> "SELECT hypot(3e0, 4e0)",
    "mathexpr_trig_exact_points" -> "SELECT round(sin(0e0), 10), round(cos(0e0), 10), round(tan(0e0), 10)",
    "mathexpr_atan2_quadrant" -> "SELECT round(atan2(1e0, -1e0), 6)",
    "mathexpr_degrees_radians_roundtrip" -> "SELECT round(degrees(radians(180e0)), 6)",
    "mathexpr_sign_signum" -> "SELECT sign(-5), signum(0e0), sign(3.5)",
    "mathexpr_factorial_20_max" -> "SELECT factorial(20), factorial(21)",
    "mathexpr_expm1_log1p_small" -> "SELECT round(expm1(1e-10), 18) = round(1e-10 + 5e-21, 18), log1p(0e0)",
    "mathexpr_positive_negative_ops" -> "SELECT positive(-3), negative(-3)",
    "mathexpr_mod_sign_follows_dividend" -> "SELECT 7 % 3, -7 % 3, 7 % -3",
    "mathexpr_pmod_always_nonnegative" -> "SELECT pmod(-7, 3)",
    "mathexpr_div_integral_result" -> "SELECT 7 div 2, -7 div 2, typeof(7 div 2)",
    "mathexpr_double_division_always_double" -> "SELECT 7 / 2, typeof(7 / 2)",
    "mathexpr_nan_comparisons" -> "SELECT double('NaN') = double('NaN'), double('NaN') > 1e308",
    "mathexpr_nanvl_substitution" -> "SELECT nanvl(double('NaN'), 5e0), nanvl(1e0, 5e0)",
    "mathexpr_float_negative_zero_equality" -> "SELECT double('-0.0') = double('0.0')",
    "mathexpr_isnan_function" -> "SELECT isnan(double('NaN')), isnan(1e0)",
    "mathexpr_bround_scale" -> "SELECT bround(2.665, 2), bround(2.675, 2)",
    "mathexpr_hex_unhex_roundtrip" -> "SELECT hex(255), CAST(conv('ff', 16, 10) AS INT), hex(unhex('4D'))",
    "mathexpr_bin_of_long" -> "SELECT bin(13), bin(-1)",
    "mathexpr_greatest_least_null_skip" -> "SELECT greatest(1, NULL, 3), least(1, NULL, 3)",
    "mathexpr_random_seeded_stable" -> "SELECT round(randn(7), 6)",
    "mathexpr_uniform_seeded" -> "SELECT uniform(0, 10, 42)",
    "mathexpr_csc_sec_cot" -> "SELECT round(csc(radians(30e0)), 6), round(sec(0e0), 6), round(cot(radians(45e0)), 6)",
    "mathexpr_e_pi_constants" -> "SELECT round(e(), 6), round(pi(), 6)",

    // ---- wave 6b: GlutenBitwiseExpressionsSuite -----------------------
    "bitwise_and_or_xor_basic" -> "SELECT 12 & 10, 12 | 10, 12 ^ 10",
    "bitwise_not_negation" -> "SELECT ~0, ~5",
    "bitwise_shiftleft_beyond_width_wraps_mod" -> "SELECT shiftleft(1, 33), shiftleft(CAST(1 AS BIGINT), 65)",
    "bitwise_shiftright_sign_extends" -> "SELECT shiftright(-8, 1)",
    "bitwise_count_set_bits" -> "SELECT bit_count(7), bit_count(-1), bit_count(CAST(-1 AS BIGINT))",
    "bitwise_get_out_to_width" -> "SELECT getbit(CAST(1 AS BIGINT), 63)",
    "bitwise_agg_and_or_xor" ->
      "SELECT bit_and(v), bit_or(v), bit_xor(v) FROM VALUES (12),(10),(6) t(v)",
    "bitwise_type_preserved_tinyint" -> "SELECT typeof(CAST(1 AS TINYINT) & CAST(2 AS TINYINT))",

    // ---- wave 6c: GlutenCollectionExpressionsSuite --------------------
    "collection_array_contains_null_semantics" ->
      "SELECT array_contains(array(1, NULL), 2), array_contains(array(1, NULL), 1)",
    "collection_array_position_one_based" -> "SELECT array_position(array('a','b','c'), 'b')",
    "collection_array_remove_all" -> "SELECT array_remove(array(1, 2, 1, 3), 1)",
    "collection_array_distinct_keeps_first_order" -> "SELECT array_distinct(array(3, 1, 3, 2, 1))",
    "collection_array_union_dedupes" -> "SELECT array_union(array(1, 2, 2), array(2, 3))",
    "collection_array_intersect_order_left" -> "SELECT array_intersect(array(3, 2, 1), array(1, 3))",
    "collection_array_except_left_only" -> "SELECT array_except(array(1, 2, 2, 3), array(2))",
    "collection_arrays_overlap_with_null" ->
      "SELECT arrays_overlap(array(1, NULL), array(2, NULL)), arrays_overlap(array(1), array(1, NULL))",
    "collection_array_join_null_replacement" ->
      "SELECT array_join(array('a', NULL, 'b'), ','), array_join(array('a', NULL, 'b'), ',', '?')",
    "collection_array_min_max_skip_null" -> "SELECT array_min(array(3, NULL, 1)), array_max(array(3, NULL, 1))",
    "collection_array_compact_strips_nulls" -> "SELECT array_compact(array(1, NULL, 2, NULL))",
    "collection_array_repeat_fn" -> "SELECT array_repeat('x', 3), array_repeat('x', 0)",
    "collection_array_flatten_one_level" -> "SELECT flatten(array(array(1, 2), array(3)))",
    "collection_array_slice_one_based" -> "SELECT slice(array(1, 2, 3, 4), 2, 2), slice(array(1, 2, 3, 4), -2, 2)",
    "collection_array_insert_one_based_and_negative" ->
      "SELECT array_insert(array('a','b'), 2, 'x'), array_insert(array('a','b'), -1, 'x')",
    "collection_array_prepend_append" -> "SELECT array_prepend(array(2, 3), 1), array_append(array(1, 2), 3)",
    "collection_arrays_zip_pads_null" -> "SELECT arrays_zip(array(1, 2, 3), array('a', 'b'))",
    "collection_array_zip_with_shorter_null" ->
      "SELECT zip_with(array(1, 2, 3), array(10, 20), (x, y) -> coalesce(y, 0) + x)",
    "collection_sequence_step_negative" -> "SELECT sequence(5, 1, -2)",
    "collection_sequence_dates_month_step" ->
      "SELECT sequence(DATE '2020-01-31', DATE '2020-04-30', INTERVAL '1' MONTH)",
    "collection_shuffle_seeded" -> "SELECT shuffle(array(1, 2, 3, 4), 42)",
    "collection_array_size_vs_cardinality" -> "SELECT size(array(1, 2)), cardinality(array(1, 2)), size(CAST(NULL AS ARRAY<INT>))",
    "collection_map_keys_values_order" -> "SELECT map_keys(map('b', 2, 'a', 1)), map_values(map('b', 2, 'a', 1))",
    "collection_map_entries_struct" -> "SELECT map_entries(map('a', 1))",
    "collection_map_from_entries_arrays" -> "SELECT map_from_entries(array(struct('a', 1), struct('b', 2)))",
    "collection_map_from_arrays_fn" -> "SELECT map_from_arrays(array('k1', 'k2'), array(1, 2))",
    "collection_map_concat_disjoint" -> "SELECT map_concat(map('a', 1), map('b', 2))",
    "collection_map_contains_key_fn" -> "SELECT map_contains_key(map('a', 1), 'a'), map_contains_key(map('a', 1), 'z')",
    "collection_element_at_map_vs_bracket" -> "SELECT element_at(map('a', 1), 'a'), map('a', 1)['a']",
    "collection_get_zero_based_safe" -> "SELECT get(array('a', 'b'), 0), get(array('a', 'b'), 5)",
    "collection_array_agg_sorted_render" ->
      "SELECT sort_array(array_agg(v)) FROM VALUES (2),(1),(2) t(v)",
    "collection_explode_preserves_order" ->
      "SELECT collect_list(v) FROM (SELECT explode(array(3, 1, 2)) AS v)",
    "collection_posexplode_zero_based" ->
      "SELECT pos, v FROM (SELECT posexplode(array('x', 'y')) AS (pos, v)) ORDER BY pos",
    "collection_inline_structs" ->
      "SELECT a, b FROM (SELECT inline(array(struct(1, 'x'), struct(2, 'y'))) AS (a, b)) ORDER BY a",
    "collection_stack_rows" -> "SELECT * FROM (SELECT stack(2, 1, 2, 3, 4) AS (a, b)) ORDER BY a",

    // ---- wave 6c: GlutenComplexTypeSuite / GlutenDataFrameComplexTypeSuite
    "complextype_struct_field_access_dot" -> "SELECT named_struct('a', 1, 'b', 'x').b",
    "complextype_struct_star_expansion" -> "SELECT s.* FROM (SELECT named_struct('a', 1, 'b', 2) AS s)",
    "complextype_nested_struct_access" -> "SELECT named_struct('o', named_struct('i', 7)).o.i",
    "complextype_struct_equality_fieldwise" ->
      "SELECT named_struct('a', 1, 'b', 2) = named_struct('a', 1, 'b', 2), struct(1, 2) = struct(1, 3)",
    "complextype_struct_ordering_lexicographic" ->
      "SELECT struct(1, 9) < struct(2, 0), struct(1, 9) < struct(1, 10)",
    "complextype_array_of_struct_field_pull" ->
      "SELECT transform(array(struct(1 AS a), struct(2 AS a)), x -> x.a)",
    "complextype_map_of_array_value" -> "SELECT map('k', array(1, 2))['k'][1]",
    "complextype_struct_rename_via_cast" ->
      "SELECT CAST(struct(1, 'x') AS STRUCT<n: INT, s: STRING>).n",
    "complextype_struct_in_group_by" ->
      "SELECT s, count(*) AS n FROM (SELECT struct(1) AS s UNION ALL SELECT struct(1)) GROUP BY s",
    "complextype_array_equality_in_filter" ->
      "SELECT count(*) FROM VALUES (array(1, 2)) t(a) WHERE a = array(1, 2)",
    "complextype_struct_with_field_builder" ->
      "SELECT named_struct('a', 1).a + named_struct('a', 2).a",
    "complextype_dropfields_like_projection" ->
      "SELECT struct(s.a) FROM (SELECT named_struct('a', 1, 'b', 2) AS s)",

    // ---- wave 6c: GlutenConditionalExpressionSuite / GlutenNullExpressionsSuite
    "conditional_case_when_first_match_wins" ->
      "SELECT CASE WHEN true THEN 1 WHEN true THEN 2 ELSE 3 END",
    "conditional_case_no_else_null" -> "SELECT CASE WHEN false THEN 1 END",
    "conditional_case_null_condition_skipped" ->
      "SELECT CASE WHEN CAST(NULL AS BOOLEAN) THEN 1 ELSE 2 END",
    "conditional_simple_case_null_never_matches" ->
      "SELECT CASE CAST(NULL AS INT) WHEN 1 THEN 'one' ELSE 'other' END",
    "conditional_if_null_condition_false_branch" -> "SELECT if(CAST(NULL AS BOOLEAN), 'y', 'n')",
    "conditional_if_true_branch" -> "SELECT if(2 > 1, 'y', 'n')",
    "conditional_nvl_nvl2" -> "SELECT nvl(NULL, 'd'), nvl2(NULL, 'a', 'b'), nvl2(1, 'a', 'b')",
    "conditional_ifnull_alias" -> "SELECT ifnull(NULL, 9)",
    "conditional_case_type_coercion_across_branches" ->
      "SELECT typeof(CASE WHEN true THEN 1 ELSE 2.5 END)",
    "nullexpr_isnull_isnotnull" -> "SELECT isnull(NULL), isnotnull(NULL), isnull(1)",
    "nullexpr_coalesce_type_coercion" -> "SELECT typeof(coalesce(NULL, CAST(1 AS SMALLINT), 2))",
    "nullexpr_nullifzero_zeroifnull" -> "SELECT nullifzero(0), nullifzero(3), zeroifnull(CAST(NULL AS INT))",
    "nullexpr_equal_null_function" -> "SELECT equal_null(NULL, NULL), equal_null(1, NULL)",
    "nullexpr_nullif_type" -> "SELECT typeof(nullif(1, 2))",

    // ---- wave 6c: GlutenPredicateSuite --------------------------------
    "predicate_like_underscore_percent" ->
      "SELECT 'abc' LIKE 'a_c', 'abc' LIKE 'a%', 'abc' LIKE 'A%'",
    "predicate_like_escape_custom" -> "SELECT '10%' LIKE '10!%' ESCAPE '!'",
    "predicate_ilike_case_insensitive" -> "SELECT 'ABC' ILIKE 'a%'",
    "predicate_like_all_any" ->
      "SELECT 'foo' LIKE ALL ('%o%', 'f%'), 'foo' LIKE ANY ('x%', 'f%')",
    "predicate_between_inclusive" -> "SELECT 5 BETWEEN 5 AND 6, 7 BETWEEN 5 AND 6",
    "predicate_not_between" -> "SELECT 4 NOT BETWEEN 5 AND 6",
    "predicate_in_type_coercion" -> "SELECT 1 IN (1.0, 2.0)",
    "predicate_is_distinct_from" ->
      "SELECT 1 IS DISTINCT FROM NULL, NULL IS DISTINCT FROM NULL",
    "predicate_is_true_false_unknown" ->
      "SELECT CAST(NULL AS BOOLEAN) IS TRUE, CAST(NULL AS BOOLEAN) IS NOT TRUE, CAST(NULL AS BOOLEAN) IS UNKNOWN",
    "predicate_string_number_comparison_coerces" -> "SELECT '10' = 10, '10' < 9",
    "predicate_date_string_comparison" -> "SELECT DATE '2020-01-02' = '2020-01-02'",
    "predicate_boolean_simplification_null" -> "SELECT (1 = 1) OR CAST(NULL AS BOOLEAN), (1 = 2) AND CAST(NULL AS BOOLEAN)",

    // ---- wave 6c: GlutenJsonFunctionsSuite / GlutenJsonExpressionsSuite
    "jsonfn_get_json_object_path" -> "SELECT get_json_object('{\"a\": {\"b\": 7}}', '$.a.b')",
    "jsonfn_get_json_object_array_index" -> "SELECT get_json_object('{\"a\": [1, 2, 3]}', '$.a[1]')",
    "jsonfn_get_json_object_missing_null" -> "SELECT get_json_object('{\"a\": 1}', '$.z')",
    "jsonfn_json_tuple_multi" -> "SELECT json_tuple('{\"a\": 1, \"b\": \"x\"}', 'a', 'b')",
    "jsonfn_from_json_basic_struct" ->
      "SELECT from_json('{\"a\": 1, \"b\": \"x\"}', 'a INT, b STRING').a",
    "jsonfn_from_json_malformed_null_permissive" ->
      "SELECT from_json('{bad', 'a INT').a",
    "jsonfn_from_json_array_of_struct" ->
      "SELECT from_json('[{\"a\": 1}, {\"a\": 2}]', 'ARRAY<STRUCT<a: INT>>')[1].a",
    "jsonfn_to_json_struct_render" -> "SELECT to_json(named_struct('a', 1, 'b', array('x')))",
    "jsonfn_to_json_map_render" -> "SELECT to_json(map('k', 1))",
    "jsonfn_to_json_null_fields_omitted" -> "SELECT to_json(named_struct('a', CAST(NULL AS INT), 'b', 1))",
    "jsonfn_json_array_length_fn" -> "SELECT json_array_length('[1, 2, [3, 4]]')",
    "jsonfn_json_object_keys_fn" -> "SELECT json_object_keys('{\"b\": 1, \"a\": 2}')",
    "jsonfn_schema_of_json_infers" -> "SELECT schema_of_json('{\"a\": [1], \"b\": \"x\"}')",
    "jsonfn_variant_get_nested_path" ->
      "SELECT variant_get(parse_json('{\"a\": {\"b\": [1, 9]}}'), '$.a.b[1]', 'int')",
    "jsonfn_variant_typeof" -> "SELECT schema_of_variant(parse_json('{\"a\": 1}'))",
    "jsonfn_to_variant_object_roundtrip" ->
      "SELECT CAST(variant_get(to_variant_object(named_struct('a', 5)), '$.a', 'int') AS INT)",
    "jsonfn_from_json_field_case_sensitive_null" ->
      "SELECT from_json('{\"A\": 1}', 'a INT').a",
    "jsonfn_get_json_object_double_quotes_stripped" ->
      "SELECT get_json_object('{\"a\": \"hi\"}', '$.a')",

    // ---- wave 6c: GlutenCsvFunctionsSuite -----------------------------
    "csvfn_from_csv_basic" -> "SELECT from_csv('1,x', 'a INT, b STRING').b",
    "csvfn_from_csv_custom_sep" ->
      "SELECT from_csv('1;x', 'a INT, b STRING', map('sep', ';')).a",
    "csvfn_to_csv_render" -> "SELECT to_csv(named_struct('a', 1, 'b', 'x'))",
    "csvfn_to_csv_quotes_when_needed" -> "SELECT to_csv(named_struct('a', 'x,y'))",
    "csvfn_schema_of_csv_infers" -> "SELECT schema_of_csv('1,abc,2.5')",

    // ---- wave 6c: GlutenUrlFunctionsSuite -----------------------------
    "urlfn_parse_url_parts" ->
      "SELECT parse_url('https://h.example.com:8443/p/q?x=1&y=2#frag', 'HOST'), parse_url('https://h.example.com:8443/p/q?x=1&y=2#frag', 'PATH'), parse_url('https://h.example.com:8443/p/q?x=1&y=2#frag', 'QUERY')",
    "urlfn_parse_url_query_key" ->
      "SELECT parse_url('https://e.com/p?x=1&y=2', 'QUERY', 'y')",
    "urlfn_parse_url_protocol_ref" ->
      "SELECT parse_url('https://e.com/p#sec', 'PROTOCOL'), parse_url('https://e.com/p#sec', 'REF')",
    "urlfn_url_encode_decode_roundtrip" ->
      "SELECT url_encode('a b&c'), url_decode('a+b%26c')",
    "urlfn_try_url_decode_malformed_null" -> "SELECT try_url_decode('%zz')",
    "urlfn_parse_url_userinfo" ->
      "SELECT parse_url('https://user:pw@e.com/p', 'USERINFO')",

    // ---- wave 6c: GlutenHashExpressionsSuite --------------------------
    "hashexpr_md5_known_vector" -> "SELECT md5('abc')",
    "hashexpr_sha1_known_vector" -> "SELECT sha1('abc')",
    "hashexpr_sha2_256_known_vector" -> "SELECT sha2('abc', 256)",
    "hashexpr_sha2_invalid_bits_null" -> "SELECT sha2('abc', 100)",
    "hashexpr_crc32_known_vector" -> "SELECT crc32('abc')",
    "hashexpr_murmur3_hash_stable" -> "SELECT hash(42), hash('abc', 42)",
    "hashexpr_xxhash64_stable" -> "SELECT xxhash64(42), xxhash64('abc')",
    "hashexpr_hash_null_input_seed" -> "SELECT hash(CAST(NULL AS INT)), xxhash64(CAST(NULL AS INT))",

    // ---- wave 6d: GlutenDataFrameAggregateSuite / GlutenSQLAggregateFunctionSuite
    "aggfn_count_star_vs_col_nulls" ->
      "SELECT count(*), count(v), count(DISTINCT v) FROM VALUES (1),(NULL),(1) t(v)",
    "aggfn_sum_empty_null_count_zero" ->
      "SELECT sum(v), count(v) FROM VALUES (1) t(v) WHERE v > 99",
    "aggfn_avg_int_returns_double" ->
      "SELECT avg(v), typeof(avg(v)) FROM VALUES (1),(2) t(v)",
    "aggfn_avg_decimal_scale_plus_four" ->
      "SELECT typeof(avg(CAST(1.5 AS DECIMAL(5,1))))",
    "aggfn_sum_int_widens_long" -> "SELECT typeof(sum(CAST(1 AS INT)))",
    "aggfn_min_max_strings_binary_order" ->
      "SELECT min(v), max(v) FROM VALUES ('b'),('A'),('a') t(v)",
    "aggfn_first_last_ignore_nulls" ->
      "SELECT first(v, true), last(v, true) FROM VALUES (NULL),(2),(3),(NULL) t(v)",
    "aggfn_any_value_deterministic_single" ->
      "SELECT any_value(v) FROM VALUES (7) t(v)",
    "aggfn_stddev_variance_sample_default" ->
      "SELECT round(stddev(v), 6), round(variance(v), 6) FROM VALUES (1e0),(2e0),(3e0) t(v)",
    "aggfn_stddev_pop_var_pop" ->
      "SELECT round(stddev_pop(v), 6), round(var_pop(v), 6) FROM VALUES (1e0),(2e0),(3e0) t(v)",
    "aggfn_stddev_single_row_nan" -> "SELECT stddev(v) FROM VALUES (1e0) t(v)",
    "aggfn_skewness_kurtosis" ->
      "SELECT round(skewness(v), 6), round(kurtosis(v), 6) FROM VALUES (1e0),(2e0),(3e0),(10e0) t(v)",
    "aggfn_covar_corr" ->
      "SELECT round(covar_samp(x, y), 6), round(corr(x, y), 6) FROM VALUES (1e0, 2e0),(2e0, 4e0),(3e0, 6e0) t(x, y)",
    "aggfn_percentile_exact_interpolates" ->
      "SELECT percentile(v, 0.5), percentile(v, 0.25) FROM VALUES (1),(2),(3),(4) t(v)",
    "aggfn_percentile_cont_disc" ->
      "SELECT percentile_cont(0.5) WITHIN GROUP (ORDER BY v), percentile_disc(0.5) WITHIN GROUP (ORDER BY v) FROM VALUES (1e0),(2e0),(3e0),(4e0) t(v)",
    "aggfn_median_even_count" -> "SELECT median(v) FROM VALUES (1),(2),(3),(4) t(v)",
    "aggfn_mode_deterministic_tie" -> "SELECT mode(v) FROM VALUES (1),(2),(1),(2) t(v)",
    "aggfn_approx_count_distinct_exact_small" ->
      "SELECT approx_count_distinct(v) FROM VALUES (1),(2),(3),(2) t(v)",
    "aggfn_approx_percentile_small_exact" ->
      "SELECT approx_percentile(v, 0.5, 10000) FROM VALUES (1),(2),(3) t(v)",
    "aggfn_collect_set_sorted_render" ->
      "SELECT sort_array(collect_set(v)) FROM VALUES (2),(1),(2) t(v)",
    "aggfn_bool_and_or_every_any" ->
      "SELECT bool_and(v), bool_or(v), every(v), any(v) FROM VALUES (true),(false) t(v)",
    "aggfn_count_if_predicate" -> "SELECT count_if(v % 2 = 0) FROM VALUES (1),(2),(4) t(v)",
    "aggfn_max_by_min_by_tie" ->
      "SELECT max_by(k, v), min_by(k, v) FROM VALUES ('a', 1),('b', 3),('c', 2) t(k, v)",
    "aggfn_sum_distinct_semantics" -> "SELECT sum(DISTINCT v) FROM VALUES (1),(1),(2) t(v)",
    "aggfn_filter_clause_per_aggregate" ->
      "SELECT sum(v) FILTER (WHERE v > 1), count(*) FILTER (WHERE v = 1) FROM VALUES (1),(2),(3) t(v)",
    "aggfn_grouping_sets_null_markers" ->
      "SELECT k, grouping(k), count(*) FROM VALUES ('a'),('b') t(k) GROUP BY GROUPING SETS ((k), ()) ORDER BY k NULLS LAST, 2",
    "aggfn_grouping_id_rollup" ->
      "SELECT k1, k2, grouping_id() FROM VALUES ('x', 'y') t(k1, k2) GROUP BY ROLLUP(k1, k2) ORDER BY 3",
    "aggfn_cube_row_count" ->
      "SELECT count(*) FROM (SELECT 1 FROM VALUES ('a', 'b') t(k1, k2) GROUP BY CUBE(k1, k2))",
    "aggfn_listagg_ordered" ->
      "SELECT listagg(v, ',') WITHIN GROUP (ORDER BY v) FROM VALUES ('b'),('a'),('c') t(v)",
    "aggfn_string_agg_alias" ->
      "SELECT string_agg(v, '-') WITHIN GROUP (ORDER BY v DESC) FROM VALUES ('b'),('a') t(v)",
    "aggfn_histogram_numeric_small" ->
      "SELECT histogram_numeric(v, 2) FROM VALUES (1e0),(1e0),(5e0) t(v)",
    "aggfn_count_min_sketch_shape" ->
      "SELECT octet_length(count_min_sketch(v, 0.01e0, 0.95e0, 42)) > 0 FROM VALUES (1),(2) t(v)",
    "aggfn_hll_sketch_estimate_roundtrip" ->
      "SELECT hll_sketch_estimate(hll_sketch_agg(v)) FROM VALUES (1),(2),(2) t(v)",
    "aggfn_regr_family" ->
      "SELECT regr_count(y, x), round(regr_slope(y, x), 6), round(regr_intercept(y, x), 6) FROM VALUES (1e0, 2e0),(2e0, 4e0),(3e0, 6e0) t(x, y)",
    "aggfn_regr_avgx_avgy_r2" ->
      "SELECT round(regr_avgx(y, x), 6), round(regr_avgy(y, x), 6), round(regr_r2(y, x), 6) FROM VALUES (1e0, 2e0),(2e0, 4e0),(3e0, 7e0) t(x, y)",
    "aggfn_percentile_approx_alias" ->
      "SELECT percentile_approx(v, 0.5, 10000) FROM VALUES (1),(2),(3) t(v)",

    // ---- wave 6d: GlutenSQLWindowFunctionSuite / GlutenDataFrameWindowFramesSuite
    "windowfn_row_number_rank_dense_rank_ties" ->
      """SELECT v, row_number() OVER (ORDER BY v), rank() OVER (ORDER BY v),
        |dense_rank() OVER (ORDER BY v) FROM VALUES (10),(20),(20),(30) t(v) ORDER BY v, 2""".stripMargin,
    "windowfn_percent_rank_cume_dist" ->
      "SELECT v, round(percent_rank() OVER (ORDER BY v), 6), round(cume_dist() OVER (ORDER BY v), 6) FROM VALUES (1),(2),(3) t(v) ORDER BY v",
    "windowfn_ntile_uneven_buckets" ->
      "SELECT v, ntile(3) OVER (ORDER BY v) FROM VALUES (1),(2),(3),(4),(5) t(v) ORDER BY v",
    "windowfn_lead_lag_defaults" ->
      "SELECT v, lag(v) OVER (ORDER BY v), lead(v, 1, -1) OVER (ORDER BY v) FROM VALUES (1),(2),(3) t(v) ORDER BY v",
    "windowfn_lag_ignore_nulls" ->
      "SELECT i, lag(v) IGNORE NULLS OVER (ORDER BY i) FROM VALUES (1, 'a'),(2, NULL),(3, 'c'),(4, 'd') t(i, v) ORDER BY i",
    "windowfn_nth_value_from_first" ->
      "SELECT v, nth_value(v, 2) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) FROM VALUES (1),(2),(3) t(v) ORDER BY v",
    "windowfn_first_last_value_default_frame" ->
      "SELECT v, first_value(v) OVER (ORDER BY v), last_value(v) OVER (ORDER BY v) FROM VALUES (1),(2),(3) t(v) ORDER BY v",
    "windowfn_running_sum_default_frame_with_orderby" ->
      "SELECT v, sum(v) OVER (ORDER BY v) FROM VALUES (1),(2),(3) t(v) ORDER BY v",
    "windowfn_rows_between_preceding_following" ->
      "SELECT v, sum(v) OVER (ORDER BY v ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING) FROM VALUES (1),(2),(3),(4) t(v) ORDER BY v",
    "windowfn_range_between_value_frame" ->
      "SELECT v, sum(v) OVER (ORDER BY v RANGE BETWEEN 1 PRECEDING AND CURRENT ROW) FROM VALUES (1),(2),(4),(5) t(v) ORDER BY v",
    "windowfn_range_default_peers_included" ->
      "SELECT v, sum(v) OVER (ORDER BY k) FROM VALUES (1, 1),(1, 2),(2, 4) t(k, v) ORDER BY v",
    "windowfn_partition_by_restarts" ->
      "SELECT p, v, row_number() OVER (PARTITION BY p ORDER BY v) FROM VALUES ('a', 1),('a', 2),('b', 3) t(p, v) ORDER BY p, v",
    "windowfn_unbounded_following_only" ->
      "SELECT v, count(*) OVER (ORDER BY v ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) FROM VALUES (1),(2),(3) t(v) ORDER BY v",
    "windowfn_window_in_expression_arith" ->
      "SELECT v, v - avg(v) OVER () FROM VALUES (1e0),(2e0),(3e0) t(v) ORDER BY v",

    // ---- wave 6d: GlutenHigherOrderFunctionsSuite ---------------------
    "hof_transform_with_index_concat" -> "SELECT transform(array('a', 'b'), (x, i) -> concat(x, i))",
    "hof_filter_by_index_skip" -> "SELECT filter(array(10, 20, 30), (x, i) -> i != 1)",
    "hof_aggregate_with_finish_lambda" ->
      "SELECT aggregate(array(1, 2, 3), 0, (acc, x) -> acc + x, acc -> acc * 10)",
    "hof_reduce_alias_sum6" -> "SELECT reduce(array(1, 2, 3), 0, (acc, x) -> acc + x)",
    "hof_exists_vs_null_element_pair" ->
      "SELECT exists(array(1, NULL), x -> x = 1), exists(array(NULL), x -> x > 0)",
    "hof_forall_with_null_element" ->
      "SELECT forall(array(1, 2), x -> x > 0), forall(array(1, NULL), x -> x > 0)",
    "hof_transform_keys_values" ->
      "SELECT transform_keys(map('a', 1), (k, v) -> upper(k)), transform_values(map('a', 1), (k, v) -> v * 10)",
    "hof_map_filter_predicate" -> "SELECT map_filter(map('a', 1, 'b', 2), (k, v) -> v > 1)",
    "hof_map_zip_with_missing_null" ->
      "SELECT map_zip_with(map('a', 1), map('a', 10, 'b', 20), (k, v1, v2) -> coalesce(v1, 0) + v2)",
    "hof_nested_lambda_shadowing" ->
      "SELECT transform(array(1, 2), x -> transform(array(10), y -> x + y))",
    "hof_aggregate_null_element_propagates" ->
      "SELECT aggregate(array(1, NULL, 3), 0, (acc, x) -> acc + x)",
    "hof_array_sort_custom_comparator" ->
      "SELECT array_sort(array('bb', 'a', 'ccc'), (l, r) -> CASE WHEN length(l) < length(r) THEN -1 WHEN length(l) > length(r) THEN 1 ELSE 0 END)",

    // ---- wave 6d: GlutenIntervalExpressionsSuite ----------------------
    "intervalexpr_ym_field_extract" ->
      "SELECT extract(YEAR FROM INTERVAL '2-11' YEAR TO MONTH), extract(MONTH FROM INTERVAL '2-11' YEAR TO MONTH)",
    "intervalexpr_dt_field_extract" ->
      "SELECT extract(DAY FROM INTERVAL '3 04:05:06' DAY TO SECOND), extract(SECOND FROM INTERVAL '3 04:05:06.789' DAY TO SECOND)",
    "intervalexpr_ym_add_same_type" ->
      "SELECT INTERVAL '1-1' YEAR TO MONTH + INTERVAL '0-2' YEAR TO MONTH",
    "intervalexpr_dt_subtract" ->
      "SELECT INTERVAL '1' DAY - INTERVAL '1' HOUR",
    "intervalexpr_negative_interval_abs_sign" ->
      "SELECT -INTERVAL '5' DAY, abs(-INTERVAL '5' DAY)",
    "intervalexpr_multiply_fractional" -> "SELECT INTERVAL '1' HOUR * 1.5",
    "intervalexpr_divide_yields_interval" -> "SELECT INTERVAL '1' DAY / 4",
    "intervalexpr_ym_compare" ->
      "SELECT INTERVAL '1-0' YEAR TO MONTH > INTERVAL '0-11' YEAR TO MONTH",
    "intervalexpr_date_minus_date_type" ->
      "SELECT typeof(DATE '2020-02-01' - DATE '2020-01-01')",
    "intervalexpr_ts_minus_ts_type" ->
      "SELECT typeof(TIMESTAMP '2020-01-02 00:00:00' - TIMESTAMP '2020-01-01 00:00:00')",

    // ---- wave 6d: GlutenMiscExpressionsSuite / GlutenSortOrderExpressionsSuite
    "misc_typeof_various" ->
      "SELECT typeof(1Y), typeof(1S), typeof(1), typeof(1L), typeof(CAST(1 AS FLOAT)), typeof(1e0), typeof('a'), typeof(x'00')",
    "misc_literal_suffixes_bd" -> "SELECT typeof(1.5BD), typeof(1.5)",
    "misc_spark_partition_id_single" ->
      "SELECT DISTINCT spark_partition_id() FROM VALUES (1) t(v)",
    "misc_monotonically_increasing_id_type" -> "SELECT typeof(monotonically_increasing_id())",
    "misc_input_file_name_empty_for_values" ->
      "SELECT input_file_name() FROM VALUES (1) t(v)",
    "misc_assert_true_void_type" -> "SELECT typeof(assert_true(1 < 2))",
    "misc_uuid_type_string" -> "SELECT typeof(uuid())",
    "misc_sortorder_asc_desc_in_array_sort" ->
      "SELECT sort_array(array(struct(2, 'b'), struct(1, 'a')))",
    "misc_current_catalog_database" -> "SELECT current_catalog(), current_database()",
    "misc_version_is_string" -> "SELECT typeof(version())",

    // ---- wave 6d: GlutenDataFrameSetOperationsSuite -------------------
    "setops_union_all_keeps_dups" ->
      "SELECT count(*) FROM (SELECT 1 AS v UNION ALL SELECT 1)",
    "setops_union_distinct_default" ->
      "SELECT count(*) FROM (SELECT 1 AS v UNION SELECT 1)",
    "setops_union_by_position_not_name" ->
      "SELECT * FROM (SELECT 1 AS a, 2 AS b UNION ALL SELECT 3, 4) ORDER BY a",
    "setops_intersect_distinct_dedupe" ->
      "SELECT v FROM (SELECT v FROM VALUES (1),(1),(2) t(v) INTERSECT SELECT v FROM VALUES (1),(1) s(v)) ORDER BY v",
    "setops_intersect_all_multiset" ->
      "SELECT count(*) FROM (SELECT v FROM VALUES (1),(1),(1) t(v) INTERSECT ALL SELECT v FROM VALUES (1),(1) s(v))",
    "setops_except_distinct" ->
      "SELECT v FROM (SELECT v FROM VALUES (1),(2),(2) t(v) EXCEPT SELECT v FROM VALUES (1) s(v)) ORDER BY v",
    "setops_except_all_multiset" ->
      "SELECT count(*) FROM (SELECT v FROM VALUES (1),(1),(1) t(v) EXCEPT ALL SELECT v FROM VALUES (1) s(v))",
    "setops_union_null_matches_in_distinct" ->
      "SELECT count(*) FROM (SELECT CAST(NULL AS INT) AS v UNION SELECT CAST(NULL AS INT))",
    "setops_intersect_nulls_match" ->
      "SELECT count(*) FROM (SELECT CAST(NULL AS INT) AS v INTERSECT SELECT CAST(NULL AS INT))",
    "setops_union_type_widening" ->
      "SELECT typeof(v) FROM (SELECT 1 AS v UNION ALL SELECT 2.5) LIMIT 1",

    // ---- wave 6d: GlutenSubquerySuite ---------------------------------
    "subquery_scalar_uncorrelated" ->
      "SELECT (SELECT max(v) FROM VALUES (1),(5) t(v))",
    "subquery_scalar_empty_null" ->
      "SELECT (SELECT v FROM VALUES (1) t(v) WHERE v > 9)",
    "subquery_scalar_correlated_per_row" ->
      """SELECT k, (SELECT max(v) FROM VALUES (1, 10),(1, 20),(2, 30) s(sk, v) WHERE s.sk = t.k)
        |FROM VALUES (1),(2) t(k) ORDER BY k""".stripMargin,
    "subquery_exists_correlated" ->
      """SELECT k FROM VALUES (1),(2),(3) t(k)
        |WHERE EXISTS (SELECT 1 FROM VALUES (1),(3) s(v) WHERE s.v = t.k) ORDER BY k""".stripMargin,
    "subquery_not_exists_correlated" ->
      """SELECT k FROM VALUES (1),(2) t(k)
        |WHERE NOT EXISTS (SELECT 1 FROM VALUES (1) s(v) WHERE s.v = t.k) ORDER BY k""".stripMargin,
    "subquery_in_returns_dedup" ->
      """SELECT k FROM VALUES (1),(2) t(k)
        |WHERE k IN (SELECT v FROM VALUES (1),(1) s(v)) ORDER BY k""".stripMargin,
    "subquery_lateral_join_correlated" ->
      """SELECT t.k, l.m FROM VALUES (1),(2) t(k),
        |LATERAL (SELECT t.k * 10 AS m) l ORDER BY t.k""".stripMargin,
    "subquery_in_select_list_arith" ->
      "SELECT 1 + (SELECT count(*) FROM VALUES (1),(2) t(v))",
    "subquery_with_cte_reference" ->
      "WITH c AS (SELECT 5 AS v) SELECT (SELECT v FROM c) + 1",
    // note: quantified comparisons (> ALL / > ANY) are not Spark SQL
    // syntax — the equivalent scalar-subquery rewrite is the pin
    "subquery_scalar_in_where_comparison" ->
      """SELECT k FROM VALUES (1),(3) t(k)
        |WHERE k > (SELECT max(v) FROM VALUES (1),(2) s(v)) ORDER BY k""".stripMargin,

    // ---- wave 6e: GlutenDSV2CharVarcharTestSuite faces ----------------
    "charvarchar_char_comparison_pads" ->
      "SELECT CAST('ab' AS CHAR(4)) = CAST('ab' AS CHAR(6)), CAST('ab' AS CHAR(4)) = 'ab'",
    "charvarchar_char_cast_no_runtime_pad" ->
      "SELECT length(CAST('ab' AS CHAR(4))), length(rtrim(CAST('ab' AS CHAR(4))))",
    "charvarchar_varchar_fits_unpadded" ->
      "SELECT length(CAST('ab' AS VARCHAR(4))), CAST('ab' AS VARCHAR(4)) = 'ab'",
    "charvarchar_varchar_cast_no_runtime_length_check" ->
      "SELECT try_cast('abcdef' AS VARCHAR(3))",
    "charvarchar_concat_shows_no_runtime_pad" ->
      "SELECT concat(CAST('a' AS CHAR(3)), '|')",
    "charvarchar_upper_shows_no_runtime_pad" -> "SELECT upper(CAST('a' AS CHAR(3))) = 'A  '",

    // ---- wave 6e: GlutenDataFramePivotSuite / GlutenDatasetUnpivotSuite (SQL faces)
    "pivotsql_basic_sum" ->
      """SELECT * FROM (SELECT k, v FROM VALUES ('a', 1),('a', 2),('b', 3) t(k, v))
        |PIVOT (sum(v) FOR k IN ('a', 'b'))""".stripMargin,
    "pivotsql_multi_agg_names" ->
      """SELECT * FROM (SELECT k, v FROM VALUES ('a', 1),('a', 2) t(k, v))
        |PIVOT (sum(v) AS s, count(v) AS c FOR k IN ('a' AS x))""".stripMargin,
    "pivotsql_missing_cell_null" ->
      """SELECT * FROM (SELECT k, g, v FROM VALUES ('a', 1, 10),('b', 2, 20) t(k, g, v))
        |PIVOT (sum(v) FOR k IN ('a', 'b')) ORDER BY g""".stripMargin,
    "unpivotsql_basic" ->
      """SELECT * FROM (SELECT 1 AS id, 10 AS x, 20 AS y)
        |UNPIVOT (val FOR metric IN (x, y)) ORDER BY metric""".stripMargin,
    "unpivotsql_nulls_excluded_by_default" ->
      """SELECT count(*) FROM (SELECT 1 AS id, 10 AS x, CAST(NULL AS INT) AS y)
        |UNPIVOT (val FOR metric IN (x, y))""".stripMargin,
    "unpivotsql_include_nulls" ->
      """SELECT count(*) FROM (SELECT 1 AS id, 10 AS x, CAST(NULL AS INT) AS y)
        |UNPIVOT INCLUDE NULLS (val FOR metric IN (x, y))""".stripMargin,

    // ---- wave 6e: GlutenDataFrameTimeWindowingSuite / SessionWindowing (batch SQL faces)
    "timewindow_tumbling_group_by" ->
      """SELECT CAST(window.start AS STRING) AS ws, sum(v) AS s
        |FROM VALUES (TIMESTAMP '2020-01-01 00:01:00', 1),
        |            (TIMESTAMP '2020-01-01 00:04:00', 2),
        |            (TIMESTAMP '2020-01-01 00:11:00', 4) t(ts, v)
        |GROUP BY window(ts, '10 minutes') ORDER BY ws""".stripMargin,
    "timewindow_sliding_overlaps" ->
      """SELECT count(*) FROM (
        |  SELECT window FROM VALUES (TIMESTAMP '2020-01-01 00:05:00', 1) t(ts, v)
        |  GROUP BY window(ts, '10 minutes', '5 minutes'))""".stripMargin,
    "timewindow_window_time_is_end_minus_1us" ->
      """SELECT CAST(any_value(window_time(window)) AS STRING)
        |FROM VALUES (TIMESTAMP '2020-01-01 00:01:00', 1) t(ts, v)
        |GROUP BY window(ts, '10 minutes')""".stripMargin,
    "timewindow_session_window_batch_merge" ->
      """SELECT count(*) FROM (
        |  SELECT session_window(ts, '5 minutes'), sum(v)
        |  FROM VALUES (TIMESTAMP '2020-01-01 00:00:00', 1),
        |              (TIMESTAMP '2020-01-01 00:03:00', 2),
        |              (TIMESTAMP '2020-01-01 00:20:00', 4) t(ts, v)
        |  GROUP BY session_window(ts, '5 minutes'))""".stripMargin,

    // ---- wave 6e: GlutenUnwrapCastInComparisonEndToEndSuite faces -----
    "unwrapcast_int_vs_double_literal" ->
      "SELECT count(*) FROM VALUES (1),(2) t(v) WHERE v = 1.0e0",
    "unwrapcast_int_vs_fractional_literal_no_match" ->
      "SELECT count(*) FROM VALUES (1),(2) t(v) WHERE v = 1.5e0",
    "unwrapcast_tinyint_vs_out_of_range_literal" ->
      "SELECT count(*) FROM VALUES (CAST(1 AS TINYINT)) t(v) WHERE v < 1000",
    "unwrapcast_tinyint_gt_out_of_range_empty" ->
      "SELECT count(*) FROM VALUES (CAST(1 AS TINYINT)) t(v) WHERE v > 1000",
    "unwrapcast_string_col_vs_int_literal" ->
      "SELECT count(*) FROM VALUES ('10'),('9') t(v) WHERE v > 9",
    "unwrapcast_date_vs_timestamp_literal" ->
      "SELECT DATE '2020-01-02' > TIMESTAMP '2020-01-01 23:00:00'",

    // ---- wave 6e: identifiers / resolution (GlutenColumnExpressionSuite faces)
    "identifiers_backtick_with_space" ->
      "SELECT `a b` FROM (SELECT 1 AS `a b`)",
    "identifiers_case_insensitive_resolution" ->
      "SELECT COL FROM (SELECT 1 AS col)",
    "identifiers_identifier_clause_function" -> "SELECT IDENTIFIER('abs')(-7)",
    "identifiers_qualified_star_subquery" ->
      "SELECT t.* FROM (SELECT 1 AS a, 2 AS b) t",
    "identifiers_duplicate_output_names_allowed" ->
      "SELECT 1 AS x, 2 AS x",

    // ---- wave 6e: TVFs / VALUES typing (GlutenDataFrameRangeSuite faces)
    "tvf_range_step" -> "SELECT * FROM range(2, 10, 3)",
    "tvf_range_negative_step" -> "SELECT * FROM range(3, 0, -1)",
    "tvf_range_type_is_bigint" -> "SELECT typeof(id) FROM range(1)",
    "values_type_widening_across_rows" ->
      "SELECT typeof(v) FROM VALUES (1),(2.5) t(v) LIMIT 1",
    "values_string_and_null_typing" ->
      "SELECT typeof(v) FROM VALUES ('a'),(NULL) t(v) LIMIT 1",
    "tablesample_hundred_percent_all" ->
      "SELECT count(*) FROM (SELECT * FROM VALUES (1),(2),(3) t(v)) TABLESAMPLE (100 PERCENT)",

    // ---- wave 6e: numeric-literal typing edges (GlutenLiteralExpressionSuite)
    "literal_int_overflow_promotes_bigint" -> "SELECT typeof(2147483648)",
    "literal_long_overflow_promotes_decimal" -> "SELECT typeof(9223372036854775808)",
    "literal_decimal_vs_double_forms" -> "SELECT typeof(1.5), typeof(1.5e0), typeof(1.5d)",
    "literal_tinyint_smallint_suffix_bounds" ->
      "SELECT 127Y, -128Y, 32767S",
    "literal_float_suffix" -> "SELECT typeof(1.5f)",
    "literal_unicode_escape" -> "SELECT 'a\\u0062c'",
    "literal_double_quoted_string" -> "SELECT \"double quoted\"",

    // ---- wave 6e: LATERAL VIEW (GlutenGeneratorFunctionSuite faces) ---
    "lateralview_explode_basic" ->
      """SELECT id, w FROM (SELECT 1 AS id, array('a', 'b') AS ws)
        |LATERAL VIEW explode(ws) t AS w ORDER BY w""".stripMargin,
    "lateralview_outer_keeps_empty" ->
      """SELECT id, w FROM (SELECT 1 AS id, CAST(array() AS ARRAY<STRING>) AS ws)
        |LATERAL VIEW OUTER explode(ws) t AS w""".stripMargin,
    "lateralview_posexplode_pairs" ->
      """SELECT p, w FROM (SELECT array('x', 'y') AS ws)
        |LATERAL VIEW posexplode(ws) t AS p, w ORDER BY p""".stripMargin,
    "lateralview_two_generators_cross" ->
      """SELECT a, b FROM (SELECT array(1, 2) AS xs, array('p') AS ys)
        |LATERAL VIEW explode(xs) t1 AS a
        |LATERAL VIEW explode(ys) t2 AS b ORDER BY a""".stripMargin,

    // ---- wave 7a: join semantics (GlutenJoinSuite / GlutenOuterJoinSuite
    // / GlutenInnerJoinSuite / GlutenExistenceJoinSuite shapes) ----------
    // null keys never equi-match on any side
    "joinpin_inner_null_keys_never_match" ->
      """SELECT count(*) FROM VALUES (1),(NULL) a(x)
        |JOIN VALUES (1),(NULL) b(x) ON a.x = b.x""".stripMargin,
    "joinpin_null_safe_join_matches_nulls" ->
      """SELECT a.x, b.x FROM VALUES (1),(NULL) a(x)
        |JOIN VALUES (1),(NULL) b(x) ON a.x <=> b.x ORDER BY a.x""".stripMargin,
    "joinpin_inner_duplicate_keys_multiply" ->
      """SELECT count(*) FROM VALUES (1),(1) a(x)
        |JOIN VALUES (1),(1),(1) b(x) ON a.x = b.x""".stripMargin,
    "joinpin_left_outer_null_padding" ->
      """SELECT a.x, b.y FROM VALUES (1),(2) a(x)
        |LEFT JOIN VALUES (1, 'm') b(x, y) ON a.x = b.x ORDER BY a.x""".stripMargin,
    // predicate in ON keeps unmatched left rows; same predicate in WHERE
    // turns the join inner — the classic ON-vs-WHERE outer-join gotcha
    "joinpin_left_outer_filter_in_on_keeps_rows" ->
      """SELECT a.x, b.x FROM VALUES (1),(2) a(x)
        |LEFT JOIN VALUES (1),(2) b(x) ON a.x = b.x AND b.x > 1 ORDER BY a.x""".stripMargin,
    "joinpin_left_outer_filter_in_where_drops_rows" ->
      """SELECT a.x, b.x FROM VALUES (1),(2) a(x)
        |LEFT JOIN VALUES (1),(2) b(x) ON a.x = b.x WHERE b.x > 1""".stripMargin,
    "joinpin_right_outer_null_padding" ->
      """SELECT a.y, b.x FROM VALUES (1, 'm') a(x, y)
        |RIGHT JOIN VALUES (1),(2) b(x) ON a.x = b.x ORDER BY b.x""".stripMargin,
    "joinpin_full_outer_pads_both_sides" ->
      """SELECT a.x, b.x FROM VALUES (1),(2) a(x)
        |FULL JOIN VALUES (2),(3) b(x) ON a.x = b.x ORDER BY coalesce(a.x, b.x)""".stripMargin,
    "joinpin_full_outer_null_keys_kept_unmatched" ->
      """SELECT a.x, b.x FROM VALUES (NULL) a(x)
        |FULL JOIN VALUES (NULL) b(x) ON a.x = b.x ORDER BY a.x NULLS FIRST, b.x""".stripMargin,
    // semi joins never multiply rows; anti keeps null-key rows (no match)
    "joinpin_left_semi_no_multiplication" ->
      """SELECT a.x FROM VALUES (1),(2) a(x)
        |LEFT SEMI JOIN VALUES (1),(1),(1) b(x) ON a.x = b.x ORDER BY a.x""".stripMargin,
    "joinpin_left_semi_null_key_no_match" ->
      """SELECT a.x FROM VALUES (1),(NULL) a(x)
        |LEFT SEMI JOIN VALUES (1),(NULL) b(x) ON a.x = b.x""".stripMargin,
    "joinpin_left_anti_keeps_nonmatch_and_null" ->
      """SELECT a.x FROM VALUES (1),(2),(NULL) a(x)
        |LEFT ANTI JOIN VALUES (1) b(x) ON a.x = b.x ORDER BY a.x NULLS FIRST""".stripMargin,
    "joinpin_semi_keeps_left_duplicates" ->
      """SELECT a.x FROM VALUES (1),(1) a(x)
        |LEFT SEMI JOIN VALUES (1) b(x) ON a.x = b.x""".stripMargin,
    // NULL-aware anti join: NOT IN with a NULL in the subquery = empty
    "joinpin_not_in_with_null_rhs_empty" ->
      """SELECT x FROM VALUES (1),(2) t(x)
        |WHERE x NOT IN (SELECT y FROM VALUES (1),(NULL) s(y))""".stripMargin,
    "joinpin_not_exists_unaffected_by_null" ->
      """SELECT x FROM VALUES (1),(2) t(x) WHERE NOT EXISTS
        |(SELECT 1 FROM VALUES (1),(NULL) s(y) WHERE s.y = t.x) ORDER BY x""".stripMargin,
    "joinpin_in_subquery_null_probe_filtered" ->
      """SELECT x FROM VALUES (1),(NULL) t(x)
        |WHERE x IN (SELECT y FROM VALUES (1),(NULL) s(y))""".stripMargin,
    // existence-join shape: IN inside a disjunction cannot be a semi join
    "joinpin_existence_in_disjunction" ->
      """SELECT x FROM VALUES (1),(2),(5) t(x)
        |WHERE x IN (SELECT y FROM VALUES (1) s(y)) OR x = 5 ORDER BY x""".stripMargin,
    "joinpin_cross_join_count" ->
      "SELECT count(*) FROM VALUES (1),(2),(3) a(x) CROSS JOIN VALUES (1),(2) b(y)",
    "joinpin_join_on_true_is_cross" ->
      """SELECT a.x, b.y FROM VALUES (1),(2) a(x)
        |JOIN VALUES ('p') b(y) ON true ORDER BY a.x""".stripMargin,
    // NATURAL / USING key-column handling
    "joinpin_natural_join_single_key_col" ->
      """SELECT * FROM VALUES (1, 'a') t1(k, v1)
        |NATURAL JOIN VALUES (1, 'b') t2(k, v2)""".stripMargin,
    "joinpin_using_join_output_one_key" ->
      """SELECT * FROM VALUES (1, 'a') t1(k, v1)
        |JOIN VALUES (1, 'b') t2(k, v2) USING (k)""".stripMargin,
    "joinpin_using_full_outer_coalesced_key" ->
      """SELECT k FROM VALUES (1) t1(k)
        |FULL JOIN VALUES (2) t2(k) USING (k) ORDER BY k""".stripMargin,
    "joinpin_self_join_aliases" ->
      """SELECT l.x, r.x FROM VALUES (1),(2) l(x)
        |JOIN VALUES (1),(2) r(x) ON l.x = r.x - 1""".stripMargin,
    "joinpin_non_equi_range" ->
      """SELECT a.x, b.y FROM VALUES (1),(5) a(x)
        |JOIN VALUES (0),(3),(9) b(y) ON b.y BETWEEN a.x AND a.x + 3
        |ORDER BY a.x, b.y""".stripMargin,
    "joinpin_inequality_only_condition" ->
      """SELECT a.x, b.y FROM VALUES (1),(2) a(x)
        |JOIN VALUES (1),(2) b(y) ON a.x < b.y ORDER BY a.x, b.y""".stripMargin,
    "joinpin_composite_key" ->
      """SELECT count(*) FROM VALUES (1, 'a'),(1, 'b') l(k1, k2)
        |JOIN VALUES (1, 'a'),(1, 'c') r(k1, k2) ON l.k1 = r.k1 AND l.k2 = r.k2""".stripMargin,
    "joinpin_string_keys_case_sensitive" ->
      """SELECT count(*) FROM VALUES ('A'),('a') l(k)
        |JOIN VALUES ('a') r(k) ON l.k = r.k""".stripMargin,
    // numeric key normalization: NaN equals NaN, -0.0 equals 0.0 in joins
    "joinpin_nan_keys_match" ->
      """SELECT count(*) FROM VALUES (double('NaN')) l(k)
        |JOIN VALUES (double('NaN')) r(k) ON l.k = r.k""".stripMargin,
    "joinpin_negzero_matches_poszero" ->
      """SELECT count(*) FROM VALUES (CAST('-0.0' AS DOUBLE)) l(k)
        |JOIN VALUES (CAST('0.0' AS DOUBLE)) r(k) ON l.k = r.k""".stripMargin,
    // implicit cast in the join condition (int vs string widens to bigint/
    // string comparison per type-coercion rules)
    "joinpin_mixed_type_key_coercion" ->
      """SELECT count(*) FROM VALUES (1) l(k)
        |JOIN VALUES ('1') r(k) ON l.k = r.k""".stripMargin,
    "joinpin_decimal_int_key_coercion" ->
      """SELECT count(*) FROM VALUES (CAST(1.00 AS DECIMAL(5,2))) l(k)
        |JOIN VALUES (1) r(k) ON l.k = r.k""".stripMargin,
    "joinpin_left_outer_empty_right" ->
      """SELECT a.x, b.x FROM VALUES (1) a(x)
        |LEFT JOIN (SELECT x FROM VALUES (1) t(x) WHERE x > 9) b ON a.x = b.x""".stripMargin,
    "joinpin_inner_empty_side_empty" ->
      """SELECT count(*) FROM VALUES (1) a(x)
        |JOIN (SELECT x FROM VALUES (1) t(x) WHERE x > 9) b ON a.x = b.x""".stripMargin,
    "joinpin_three_way_chain" ->
      """SELECT a.x, b.y, c.z FROM VALUES (1) a(x)
        |JOIN VALUES (1, 2) b(x, y) ON a.x = b.x
        |JOIN VALUES (2, 3) c(y, z) ON b.y = c.y""".stripMargin,
    // join strategy hints must not change results
    "joinpin_broadcast_hint_same_result" ->
      """SELECT /*+ BROADCAST(b) */ a.x, b.x FROM VALUES (1),(2) a(x)
        |JOIN VALUES (1) b(x) ON a.x = b.x""".stripMargin,
    "joinpin_merge_hint_same_result" ->
      """SELECT /*+ MERGE(b) */ a.x, b.x FROM VALUES (1),(2) a(x)
        |JOIN VALUES (1) b(x) ON a.x = b.x""".stripMargin,
    "joinpin_shuffle_hash_hint_same_result" ->
      """SELECT /*+ SHUFFLE_HASH(b) */ a.x, b.x FROM VALUES (1),(2) a(x)
        |JOIN VALUES (1) b(x) ON a.x = b.x""".stripMargin,
    "joinpin_lateral_correlated" ->
      """SELECT t.x, l.doubled FROM VALUES (1),(2) t(x),
        |LATERAL (SELECT t.x * 2 AS doubled) l ORDER BY t.x""".stripMargin,
    "joinpin_left_join_lateral_empty_padded" ->
      """SELECT t.x, l.y FROM VALUES (1),(2) t(x)
        |LEFT JOIN LATERAL (SELECT 10 AS y WHERE t.x > 1) l ON true ORDER BY t.x""".stripMargin,
    "joinpin_anti_empty_subquery_keeps_all" ->
      """SELECT x FROM VALUES (1),(2) t(x) WHERE NOT EXISTS
        |(SELECT 1 FROM VALUES (1) s(y) WHERE 1 = 0) ORDER BY x""".stripMargin,
    "joinpin_outer_join_coalesced_agg" ->
      """SELECT a.x, count(b.x) FROM VALUES (1),(2) a(x)
        |LEFT JOIN VALUES (1) b(x) ON a.x = b.x GROUP BY a.x ORDER BY a.x""".stripMargin,
    "joinpin_full_outer_using_both_vals" ->
      """SELECT k, v1, v2 FROM VALUES (1, 'a') t1(k, v1)
        |FULL JOIN VALUES (2, 'b') t2(k, v2) USING (k) ORDER BY k""".stripMargin,
    "joinpin_nested_loop_with_or_condition" ->
      """SELECT a.x, b.y FROM VALUES (1),(4) a(x)
        |JOIN VALUES (1),(5) b(y) ON a.x = b.y OR a.x + b.y = 9
        |ORDER BY a.x, b.y""".stripMargin,
    "joinpin_semi_via_intersect_distinct" ->
      """SELECT x FROM VALUES (1),(1),(2) t(x)
        |INTERSECT SELECT y FROM VALUES (1),(3) s(y)""".stripMargin,
    "joinpin_boolean_key_join" ->
      """SELECT count(*) FROM VALUES (true),(false) l(k)
        |JOIN VALUES (true) r(k) ON l.k = r.k""".stripMargin,
    "joinpin_date_key_join" ->
      """SELECT l.k FROM VALUES (DATE '2020-01-01') l(k)
        |JOIN VALUES (DATE '2020-01-01') r(k) ON l.k = r.k""".stripMargin,
    "joinpin_timestamp_vs_date_key_coercion" ->
      """SELECT count(*) FROM VALUES (DATE '2020-01-01') l(k)
        |JOIN VALUES (TIMESTAMP '2020-01-01 00:00:00') r(k) ON l.k = r.k""".stripMargin,
    "joinpin_struct_key_join" ->
      """SELECT count(*) FROM VALUES (named_struct('a', 1)) l(k)
        |JOIN VALUES (named_struct('a', 1)) r(k) ON l.k = r.k""".stripMargin,
    "joinpin_array_key_join" ->
      """SELECT count(*) FROM VALUES (array(1, 2)) l(k)
        |JOIN VALUES (array(1, 2)) r(k) ON l.k = r.k""".stripMargin,

    // ---- wave 7a: subquery semantics (GlutenSubquerySuite additions) ---
    "subq7_scalar_empty_is_null" ->
      "SELECT (SELECT x FROM VALUES (1) t(x) WHERE x > 9)",
    "subq7_scalar_in_select_list" ->
      "SELECT x + (SELECT max(y) FROM VALUES (10),(20) s(y)) FROM VALUES (1) t(x)",
    "subq7_correlated_scalar_agg" ->
      """SELECT x, (SELECT sum(y) FROM VALUES (1, 10),(1, 20),(2, 5) s(k, y)
        |WHERE s.k = t.x) FROM VALUES (1),(2),(3) t(x) ORDER BY x""".stripMargin,
    // the classic COUNT bug: correlated COUNT over an empty group is 0,
    // never NULL — a rewrite that breaks the left-outer+coalesce shape
    // regresses exactly here
    "subq7_correlated_count_empty_group_is_zero" ->
      """SELECT x, (SELECT count(*) FROM VALUES (1) s(k) WHERE s.k = t.x)
        |FROM VALUES (1),(5) t(x) ORDER BY x""".stripMargin,
    "subq7_tuple_in_subquery" ->
      """SELECT x, y FROM VALUES (1, 'a'),(2, 'b') t(x, y)
        |WHERE (x, y) IN (SELECT 1, 'a')""".stripMargin,
    "subq7_exists_limit_zero_false" ->
      "SELECT x FROM VALUES (1) t(x) WHERE EXISTS (SELECT 1 LIMIT 0)",
    "subq7_scalar_orderby_limit" ->
      "SELECT (SELECT y FROM VALUES (3),(1),(2) s(y) ORDER BY y DESC LIMIT 1)",
    "subq7_not_in_empty_rhs_keeps_all" ->
      """SELECT x FROM VALUES (1),(NULL) t(x)
        |WHERE x NOT IN (SELECT y FROM VALUES (1) s(y) WHERE 1 = 0)
        |ORDER BY x NULLS FIRST""".stripMargin,
    "subq7_in_against_duplicate_rhs" ->
      """SELECT x FROM VALUES (1),(1),(2) t(x)
        |WHERE x IN (SELECT y FROM VALUES (1),(1) s(y)) ORDER BY x""".stripMargin,
    "subq7_correlated_exists_two_columns" ->
      """SELECT x, y FROM VALUES (1, 10),(2, 20) t(x, y) WHERE EXISTS
        |(SELECT 1 FROM VALUES (1, 10),(2, 99) s(a, b)
        | WHERE s.a = t.x AND s.b = t.y)""".stripMargin,
    "subq7_in_case_when" ->
      """SELECT CASE WHEN x IN (SELECT y FROM VALUES (1) s(y)) THEN 'hit'
        |ELSE 'miss' END FROM VALUES (1),(2) t(x) ORDER BY 1""".stripMargin,
    "subq7_correlated_in_having" ->
      """SELECT k, count(*) FROM VALUES (1),(1),(2) t(k) GROUP BY k
        |HAVING count(*) > (SELECT max(y) FROM VALUES (1) s(y)) ORDER BY k""".stripMargin,
    "subq7_nested_two_levels" ->
      """SELECT x FROM VALUES (1),(2),(3) t(x) WHERE x IN
        |(SELECT y FROM VALUES (1),(2) s(y) WHERE y IN
        |  (SELECT z FROM VALUES (2) u(z))) ORDER BY x""".stripMargin,
    "subq7_scalar_subquery_in_agg" ->
      "SELECT max(x) + (SELECT 10) FROM VALUES (1),(2) t(x)",

    // ---- wave 7a: window frame additions (GlutenDataFrameWindowFrames) -
    "winfr7_lead_lag_defaults" ->
      """SELECT x, lag(x) OVER (ORDER BY x), lead(x, 1, -1) OVER (ORDER BY x)
        |FROM VALUES (1),(2),(3) t(x) ORDER BY x""".stripMargin,
    "winfr7_nth_value_from_first" ->
      """SELECT x, nth_value(x, 2) OVER (ORDER BY x
        |ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |FROM VALUES (10),(20),(30) t(x) ORDER BY x""".stripMargin,
    "winfr7_first_value_ignore_nulls" ->
      """SELECT x, first_value(v) IGNORE NULLS OVER (ORDER BY x)
        |FROM VALUES (1, NULL),(2, 'a'),(3, 'b') t(x, v) ORDER BY x""".stripMargin,
    "winfr7_range_frame_desc" ->
      """SELECT x, sum(x) OVER (ORDER BY x DESC RANGE BETWEEN 1 PRECEDING AND CURRENT ROW)
        |FROM VALUES (1),(2),(3) t(x) ORDER BY x""".stripMargin,
    "winfr7_range_frame_includes_peers" ->
      """SELECT x, sum(x) OVER (ORDER BY x RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |FROM VALUES (1),(1),(2) t(x) ORDER BY x""".stripMargin,
    "winfr7_rows_frame_excludes_peers" ->
      """SELECT x, sum(x) OVER (ORDER BY x, rn ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |FROM VALUES (1, 1),(1, 2),(2, 3) t(x, rn) ORDER BY x, rn""".stripMargin,
    "winfr7_cume_dist_percent_rank" ->
      """SELECT x, cume_dist() OVER (ORDER BY x), percent_rank() OVER (ORDER BY x)
        |FROM VALUES (1),(2),(2),(3) t(x) ORDER BY x""".stripMargin,
    "winfr7_ntile_uneven" ->
      """SELECT x, ntile(3) OVER (ORDER BY x)
        |FROM VALUES (1),(2),(3),(4),(5) t(x) ORDER BY x""".stripMargin,
    "winfr7_window_order_nulls_first_running_count" ->
      """SELECT x, count(x) OVER (ORDER BY x ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |FROM VALUES (NULL),(1),(2) t(x) ORDER BY x NULLS FIRST""".stripMargin,
    "winfr7_dense_rank_vs_rank_gaps" ->
      """SELECT x, rank() OVER (ORDER BY x), dense_rank() OVER (ORDER BY x)
        |FROM VALUES (1),(2),(2),(3) t(x) ORDER BY x""".stripMargin,

    // ---- wave 7b: string-function edges (GlutenStringFunctionsSuite) ---
    "strexpr7_initcap_mixed" -> "SELECT initcap('hELLO wORLD_x')",
    "strexpr7_translate_maps_chars" -> "SELECT translate('ababab', 'ab', 'xy')",
    "strexpr7_translate_short_to_deletes" -> "SELECT translate('abc', 'abc', 'xy')",
    "strexpr7_overlay_replaces_span" -> "SELECT overlay('Spark SQL' PLACING '_' FROM 6)",
    "strexpr7_overlay_with_len" -> "SELECT overlay('Spark SQL' PLACING 'ANSI ' FROM 7 FOR 0)",
    "strexpr7_sentences_splits" -> "SELECT sentences('Hi there. How are you?')",
    "strexpr7_format_number_grouping" -> "SELECT format_number(1234567.891, 2)",
    "strexpr7_format_number_zero_decimals" -> "SELECT format_number(1234.5, 0)",
    "strexpr7_format_string_printf" -> "SELECT format_string('%d-%s-%05.1f', 7, 'x', 2.5e0)",
    "strexpr7_locate_from_position" -> "SELECT locate('l', 'hello', 4)",
    "strexpr7_position_three_arg" -> "SELECT position('l', 'hello', 4)",
    "strexpr7_ascii_first_char" -> "SELECT ascii('Abc')",
    "strexpr7_chr_from_code" -> "SELECT chr(65.2)",
    "strexpr7_char_alias" -> "SELECT char(97)",
    "strexpr7_base64_roundtrip" -> "SELECT base64('spark'), unbase64(base64('spark'))",
    "strexpr7_encode_decode_utf8" -> "SELECT decode(encode('héllo', 'UTF-8'), 'UTF-8')",
    "strexpr7_soundex_code" -> "SELECT soundex('Robert'), soundex('Rupert')",
    "strexpr7_levenshtein_basic" -> "SELECT levenshtein('kitten', 'sitting')",
    "strexpr7_levenshtein_with_bound" -> "SELECT levenshtein('kitten', 'sitting', 2)",
    "strexpr7_char_vs_octet_length" -> "SELECT char_length('héllo'), octet_length('héllo')",
    "strexpr7_bit_length_utf8" -> "SELECT bit_length('héllo')",
    "strexpr7_find_in_set_position" -> "SELECT find_in_set('b', 'a,b,c')",
    "strexpr7_find_in_set_miss_zero" -> "SELECT find_in_set('z', 'a,b,c')",
    "strexpr7_substring_index_positive" -> "SELECT substring_index('a.b.c', '.', 2)",
    "strexpr7_substring_index_negative" -> "SELECT substring_index('a.b.c', '.', -1)",
    "strexpr7_regexp_replace_groups" ->
      "SELECT regexp_replace('a1b2', '([a-z])([0-9])', '$2$1')",
    "strexpr7_regexp_replace_from_pos" ->
      "SELECT regexp_replace('aaa', 'a', 'b', 2)",
    "strexpr7_rlike_partial_match" -> "SELECT 'abc123' rlike '[0-9]+'",
    "strexpr7_like_escape_clause" -> "SELECT '50%' LIKE '50!%' ESCAPE '!'",
    "strexpr7_ilike_case_insensitive" -> "SELECT 'ABC' ilike 'a%'",
    "strexpr7_startswith_endswith_contains" ->
      "SELECT startswith('spark', 'sp'), endswith('spark', 'rk'), contains('spark', 'ar')",
    "strexpr7_btrim_custom_chars" -> "SELECT btrim('xxhixx', 'x')",
    "strexpr7_trim_leading_trailing_sql" ->
      "SELECT trim(LEADING 'x' FROM 'xxax'), trim(TRAILING 'x' FROM 'xxax')",
    "strexpr7_luhn_check_valid" -> "SELECT luhn_check('4111111111111111')",
    "strexpr7_luhn_check_invalid" -> "SELECT luhn_check('4111111111111112')",
    "strexpr7_mask_defaults" -> "SELECT mask('AbCd-123')",
    "strexpr7_mask_custom_chars" -> "SELECT mask('AbCd-123', 'X', 'x', '#', '*')",
    "strexpr7_split_with_limit" -> "SELECT split('a,b,c,d', ',', 2)",
    "strexpr7_split_part_one_based" -> "SELECT split_part('a,b,c', ',', 2)",
    "strexpr7_split_part_negative" -> "SELECT split_part('a,b,c', ',', -1)",
    "strexpr7_replace_all_occurrences" -> "SELECT replace('aaa', 'a', 'b')",
    "strexpr7_reverse_string" -> "SELECT reverse('abc')",
    "strexpr7_concat_ws_array_args" -> "SELECT concat_ws('-', array('a','b'), 'c')",
    "strexpr7_to_varchar_numeric" -> "SELECT to_varchar(78.12, '$99.99')",
    "strexpr7_is_valid_utf8_and_try_validate" ->
      "SELECT is_valid_utf8('ok'), try_validate_utf8('ok')",
    "strexpr7_quote_literal" -> "SELECT quote(\"Don't\")",

    // ---- wave 7b: datetime extras (GlutenDateFunctionsSuite) -----------
    "dt7_to_char_timestamp_pattern" ->
      "SELECT to_char(TIMESTAMP '2020-03-01 14:05:09', 'yyyy/MM/dd HH:mm')",
    "dt7_date_part_field_names" ->
      "SELECT date_part('YEAR', DATE '2020-03-01'), date_part('DOY', DATE '2020-03-01')",
    "dt7_trunc_date_to_month" -> "SELECT trunc(DATE '2020-03-17', 'MM')",
    "dt7_trunc_invalid_fmt_null" -> "SELECT trunc(DATE '2020-03-17', 'bogus')",
    "dt7_date_trunc_hour" ->
      "SELECT date_trunc('HOUR', TIMESTAMP '2020-03-01 14:35:09')",
    "dt7_dayname_monthname" ->
      "SELECT dayname(DATE '2020-01-05'), monthname(DATE '2020-01-05')",
    "dt7_quarter_of_date" -> "SELECT quarter(DATE '2020-08-14')",
    "dt7_weekday_monday_zero" -> "SELECT weekday(DATE '2020-01-06')",
    "dt7_make_timestamp_fractional" ->
      "SELECT make_timestamp(2020, 2, 29, 23, 59, 59.123456)",
    "dt7_make_timestamp_ltz_tz_arg" ->
      "SELECT make_timestamp_ltz(2020, 1, 1, 12, 0, 0, 'UTC')",
    "dt7_make_ym_interval" -> "SELECT make_ym_interval(1, 14)",
    "dt7_make_dt_interval" -> "SELECT make_dt_interval(1, 2, 3, 4.5)",
    "dt7_timestamp_seconds_millis_micros" ->
      "SELECT timestamp_seconds(86400), timestamp_millis(1500), timestamp_micros(1500000)",
    "dt7_unix_date_days" -> "SELECT unix_date(DATE '1970-01-03')",
    "dt7_unix_micros_of_ts" -> "SELECT unix_micros(TIMESTAMP '1970-01-01 00:00:01')",
    "dt7_from_unixtime_format" -> "SELECT from_unixtime(86400, 'yyyy-MM-dd HH:mm')",
    "dt7_date_format_day_of_week_text" ->
      "SELECT date_format(DATE '2020-01-05', 'EEEE')",
    "dt7_date_format_am_pm" ->
      "SELECT date_format(TIMESTAMP '2020-01-05 13:01:00', 'h:mm a')",
    "dt7_date_format_day_of_year" ->
      "SELECT date_format(DATE '2020-02-01', 'D')",
    "dt7_next_day_from_saturday" -> "SELECT next_day(DATE '2020-01-04', 'MON')",
    "dt7_months_between_exact_day_matches" ->
      "SELECT months_between(DATE '2020-03-15', DATE '2020-01-15')",
    "dt7_months_between_roundoff_arg" ->
      "SELECT months_between(TIMESTAMP '2020-03-14 12:00:00', DATE '2020-01-15', false)",
    "dt7_datediff_negative" -> "SELECT datediff(DATE '2020-01-01', DATE '2020-01-05')",
    "dt7_date_sub_function" -> "SELECT date_sub(DATE '2020-01-01', 1)",
    "dt7_dateadd_alias" -> "SELECT dateadd(DAY, 3, DATE '2020-02-27')",
    "dt7_datepart_alias" -> "SELECT datepart('MONTH', DATE '2020-08-14')",
    "dt7_timestampdiff_months" ->
      "SELECT timestampdiff(MONTH, TIMESTAMP '2020-01-31 00:00:00', TIMESTAMP '2020-03-30 23:59:59')",
    "dt7_convert_timezone_three_arg" ->
      "SELECT convert_timezone('UTC', 'America/Los_Angeles', TIMESTAMP_NTZ '2020-06-01 12:00:00')",
    "dt7_extract_seconds_fractional" ->
      "SELECT extract(SECONDS FROM TIMESTAMP '1970-01-01 00:01:30.5')",
    "dt7_last_day_non_leap" -> "SELECT last_day(DATE '2019-02-10')",

    // ---- wave 7b: math/bitwise extras (GlutenMathExpressionsSuite) -----
    "math7_conv_binary_to_decimal" -> "SELECT conv('1010', 2, 10)",
    "math7_conv_decimal_to_hex" -> "SELECT conv('255', 10, 16)",
    "math7_conv_negative_base" -> "SELECT conv('-10', 10, -16)",
    "math7_hex_of_long_and_string" -> "SELECT hex(255), hex('ab')",
    "math7_unhex_roundtrip" -> "SELECT decode(unhex('4142'), 'UTF-8')",
    "math7_shiftleft_overflow_wraps" -> "SELECT shiftleft(1073741824, 2)",
    "math7_shiftright_sign_extends" -> "SELECT shiftright(-8, 1)",
    "math7_shiftrightunsigned_zero_fills" -> "SELECT shiftrightunsigned(-8, 1)",
    "math7_bit_get_positions" -> "SELECT bit_get(5, 0), bit_get(5, 1), getbit(5, 2)",
    "math7_bit_count_of_long" -> "SELECT bit_count(255)",
    "math7_factorial_20_max" -> "SELECT factorial(20)",
    "math7_factorial_21_null" -> "SELECT factorial(21)",
    "math7_hypot_345" -> "SELECT hypot(3.0, 4.0)",
    "math7_bin_of_negative" -> "SELECT bin(-1)",
    "math7_bround_negative_scale" -> "SELECT bround(25, -1), round(25, -1)",
    "math7_rint_half_even" -> "SELECT rint(2.5e0), rint(3.5e0)",
    "math7_pow_zero_zero_is_one" -> "SELECT pow(0, 0)",
    "math7_mod_doubles_sign" -> "SELECT mod(7.5e0, -2.0e0)",
    "math7_width_bucket_edges" ->
      "SELECT width_bucket(5, 0, 10, 5), width_bucket(10, 0, 10, 5), width_bucket(-1, 0, 10, 5)",
    "math7_log_with_base" -> "SELECT log(2, 8)",
    "math7_log_zero_null_ansi_off_guard" -> "SELECT try_divide(0, 0), ln(1)",
    "math7_negative_and_positive_fn" -> "SELECT negative(5), positive(-5)",
    "math7_sign_of_values" -> "SELECT sign(-2.5e0), signum(0.0e0), sign(7)",
    "math7_trunc_numeric_alias" -> "SELECT ceiling(2.1e0), floor(-2.1e0)",
    "math7_e_and_pi_reprs" -> "SELECT round(e(), 6), round(pi(), 6)",

    // ---- wave 7b: aggregate extras (GlutenDataFrameAggregateSuite) -----
    "aggfn7_count_if_predicate" ->
      "SELECT count_if(x % 2 = 0) FROM VALUES (1),(2),(4),(NULL) t(x)",
    "aggfn7_any_some_every" ->
      "SELECT any(x), some(x), every(x) FROM VALUES (true),(false) t(x)",
    "aggfn7_bool_and_or" ->
      "SELECT bool_and(x), bool_or(x) FROM VALUES (true),(false) t(x)",
    "aggfn7_first_last_ignore_nulls" ->
      """SELECT first(x) IGNORE NULLS, last(x) IGNORE NULLS
        |FROM (SELECT x FROM VALUES (NULL),(1),(2),(NULL) t(x) ORDER BY x NULLS FIRST)""".stripMargin,
    "aggfn7_sum_distinct_dedups" ->
      "SELECT sum(DISTINCT x) FROM VALUES (1),(1),(2) t(x)",
    "aggfn7_avg_distinct" -> "SELECT avg(DISTINCT x) FROM VALUES (1),(1),(4) t(x)",
    "aggfn7_max_by_min_by" ->
      "SELECT max_by(name, v), min_by(name, v) FROM VALUES ('a', 1),('b', 9),('c', 5) t(name, v)",
    "aggfn7_collect_set_sorted_face" ->
      "SELECT sort_array(collect_set(x)) FROM VALUES (2),(1),(2) t(x)",
    "aggfn7_corr_exact" ->
      "SELECT corr(x, y) FROM VALUES (1e0, 2e0),(2e0, 4e0),(3e0, 6e0) t(x, y)",
    "aggfn7_covar_pop_vs_samp" ->
      "SELECT covar_pop(x, y), covar_samp(x, y) FROM VALUES (1e0, 2e0),(2e0, 4e0) t(x, y)",
    "aggfn7_var_pop_vs_samp" ->
      "SELECT var_pop(x), var_samp(x) FROM VALUES (1e0),(3e0) t(x)",
    "aggfn7_regr_slope_intercept" ->
      "SELECT regr_slope(y, x), regr_intercept(y, x) FROM VALUES (1e0, 3e0),(2e0, 5e0) t(x, y)",
    "aggfn7_regr_count_r2" ->
      "SELECT regr_count(y, x), regr_r2(y, x) FROM VALUES (1e0, 3e0),(2e0, 5e0),(NULL, 1e0) t(x, y)",
    "aggfn7_percentile_disc_vs_cont" ->
      """SELECT percentile_cont(0.5) WITHIN GROUP (ORDER BY x),
        |percentile_disc(0.5) WITHIN GROUP (ORDER BY x)
        |FROM VALUES (1),(2),(3),(4) t(x)""".stripMargin,
    "aggfn7_approx_percentile_exact_accuracy" ->
      "SELECT approx_percentile(x, 0.5, 10000) FROM VALUES (1),(2),(3) t(x)",
    "aggfn7_try_sum_no_overflow" ->
      "SELECT try_sum(x) FROM VALUES (9223372036854775807), (1) t(x)",
    "aggfn7_try_avg_ok" -> "SELECT try_avg(x) FROM VALUES (1),(2) t(x)",
    "aggfn7_grouping_sets_grouping_fn" ->
      """SELECT k, grouping(k), count(*) FROM VALUES ('a'),(NULL) t(k)
        |GROUP BY GROUPING SETS ((k), ()) ORDER BY k NULLS FIRST, 2""".stripMargin,
    "aggfn7_count_min_sketch_face" ->
      "SELECT length(count_min_sketch(x, 0.1d, 0.9d, 1)) > 0 FROM VALUES (1),(2) t(x)",
    "aggfn7_array_agg_alias" ->
      "SELECT sort_array(array_agg(x)) FROM VALUES (2),(1) t(x)",

    // ---- wave 7b: complex-type extras (GlutenCollectionExpressionsSuite)
    "coll7_map_zip_with_merges" ->
      "SELECT map_zip_with(map('a', 1), map('a', 10), (k, v1, v2) -> coalesce(v1, 0) + coalesce(v2, 0))",
    "coll7_map_entries_struct_list" -> "SELECT map_entries(map('a', 1, 'b', 2))",
    "coll7_array_compact_drops_nulls" -> "SELECT array_compact(array(1, NULL, 2, NULL))",
    "coll7_array_repeat_builds" -> "SELECT array_repeat('x', 3)",
    "coll7_arrays_zip_field_names" ->
      "SELECT arrays_zip(array(1, 2), array('a', 'b'))",
    "coll7_array_except_dedups_left" ->
      "SELECT array_except(array(1, 1, 2, 3), array(3))",
    "coll7_arrays_overlap_with_null" ->
      "SELECT arrays_overlap(array(1, NULL), array(2)), arrays_overlap(array(1, NULL), array(1))",
    "coll7_get_zero_based_vs_element_at" ->
      "SELECT get(array(10, 20), 0), element_at(array(10, 20), 1)",
    "coll7_get_oob_null_even_ansi" -> "SELECT get(array(10), 5)",
    "coll7_map_from_arrays_pairs" -> "SELECT map_from_arrays(array('k1','k2'), array(1, 2))",
    "coll7_cardinality_alias" -> "SELECT cardinality(array(1, 2, 3)), cardinality(map('a', 1))",
    "coll7_array_insert_positive" -> "SELECT array_insert(array(1, 2, 4), 3, 3)",
    "coll7_array_remove_all_matches" -> "SELECT array_remove(array(1, 2, 1, 3), 1)",
    "coll7_array_distinct_keeps_first_order" -> "SELECT array_distinct(array(3, 1, 3, 2, 1))",
    "coll7_array_min_max_skip_null" ->
      "SELECT array_min(array(2, NULL, 1)), array_max(array(2, NULL, 3))",
    "coll7_array_join_null_replacement" ->
      "SELECT array_join(array('a', NULL, 'b'), ',', '?')",
    "coll7_named_struct_field_access_case" ->
      "SELECT named_struct('Field', 1).field",
    "coll7_struct_comparison_lexicographic" ->
      "SELECT named_struct('a', 1, 'b', 2) < named_struct('a', 1, 'b', 3)",
    "coll7_map_contains_key_fn" ->
      "SELECT map_contains_key(map('a', 1), 'a'), map_contains_key(map('a', 1), 'z')",
    "coll7_array_prepend_append" ->
      "SELECT array_prepend(array(2, 3), 1), array_append(array(1, 2), 3)",
    "coll7_array_size_fn" -> "SELECT array_size(array(1, 2, 3))",
    "coll7_shuffle_deterministic_size" ->
      "SELECT size(shuffle(array(1, 2, 3)))",

    // ---- wave 7b: JSON/CSV/URL extras (GlutenJsonFunctionsSuite) -------
    "json7_array_length" -> "SELECT json_array_length('[1, 2, 3]')",
    "json7_object_keys" -> "SELECT json_object_keys('{\"a\": 1, \"b\": 2}')",
    "json7_get_json_object_nested" ->
      "SELECT get_json_object('{\"a\": {\"b\": [1, 2]}}', '$.a.b[1]')",
    "json7_get_json_object_missing_null" ->
      "SELECT get_json_object('{\"a\": 1}', '$.z')",
    "json7_json_tuple_multi" ->
      "SELECT json_tuple('{\"a\": 1, \"b\": \"x\"}', 'a', 'b')",
    "json7_schema_of_json_infers" -> "SELECT schema_of_json('{\"a\": [1], \"b\": \"x\"}')",
    "json7_from_json_corrupt_null_fields" ->
      "SELECT from_json('not json', 'a INT, b STRING')",
    "json7_to_json_with_date" ->
      "SELECT to_json(named_struct('d', DATE '2020-01-02'))",
    "json7_from_json_array_of_struct" ->
      "SELECT from_json('[{\"a\": 1}, {\"a\": 2}]', 'ARRAY<STRUCT<a: INT>>')",
    "csv7_schema_of_csv" -> "SELECT schema_of_csv('1,x,true')",
    "csv7_to_csv_roundtrip" ->
      "SELECT to_csv(named_struct('a', 1, 'b', 'x')), from_csv('1,x', 'a INT, b STRING')",
    "url7_encode_decode_roundtrip" ->
      "SELECT url_encode('a b&c=d'), url_decode(url_encode('a b&c=d'))",
    "url7_try_url_decode_invalid_null" -> "SELECT try_url_decode('%zz')",
    "url7_parse_url_query_key" ->
      "SELECT parse_url('http://h/p?k1=v1&k2=v2', 'QUERY', 'k2')",
    "url7_parse_url_parts" ->
      "SELECT parse_url('https://u@host:8080/path?q=1#frag', 'HOST'), parse_url('https://u@host:8080/path?q=1#frag', 'PATH')")

  // ---- wave 8a: decimal precision/scale arithmetic
  // (GlutenDecimalPrecisionSuite face — the reference's own hard part:
  // `backends-velox/.../VeloxBackend.scala:546` rescaleDecimalArithmetic;
  // SURVEY.md §7 "decimal precision rescaling"). Every pin fixes BOTH
  // the derived DecimalType (renderDf's schema column) and the value,
  // so a rule or conf change that perturbs Spark's promotion algebra
  // (add: max(s1,s2) + max(p1-s1, p2-s2) + 1; mul: p1+p2+1 / s1+s2;
  // div: scale max(6, s1+s2+1); precision-loss clamp at 38) fails with
  // the exact drifted type or digit. ANSI-on is the session default;
  // overflow-raising forms are pinned through try_* here and as error
  // contracts below, and the nonansi_decimalpin_* group re-renders the
  // NULL-on-overflow faces.
  private val decimalPinned: Seq[(String, String)] = Seq(
    // -- literal typing ------------------------------------------------
    "decimalpin_literal_fraction_type" -> "SELECT 0.1",
    "decimalpin_literal_two_dp" -> "SELECT 123.45",
    "decimalpin_literal_negative" -> "SELECT -0.05",
    "decimalpin_literal_trailing_zeros_keep_scale" -> "SELECT 1.500",
    "decimalpin_literal_no_int_part" -> "SELECT .25",
    "decimalpin_literal_beyond_long_is_decimal" ->
      "SELECT 9223372036854775808, typeof(9223372036854775808)",
    "decimalpin_literal_bd_suffix" -> "SELECT 1.5BD, typeof(1.5BD)",
    "decimalpin_literal_exact_38_digits" ->
      "SELECT 99999999999999999999999999999999999999BD",
    // -- addition / subtraction promotion ------------------------------
    "decimalpin_add_same_scale_widens_one" ->
      "SELECT CAST(1.23 AS DECIMAL(5,2)) + CAST(4.56 AS DECIMAL(5,2))",
    "decimalpin_add_mixed_scale_takes_max" ->
      "SELECT CAST(1.2 AS DECIMAL(4,1)) + CAST(3.456 AS DECIMAL(6,3))",
    "decimalpin_add_int_widens_decimal" ->
      "SELECT CAST(7 AS INT) + CAST(1.25 AS DECIMAL(4,2))",
    "decimalpin_add_bigint_widens_decimal" ->
      "SELECT CAST(7 AS BIGINT) + CAST(1.25 AS DECIMAL(4,2))",
    "decimalpin_sub_negative_result" ->
      "SELECT CAST(1.00 AS DECIMAL(5,2)) - CAST(2.50 AS DECIMAL(5,2))",
    "decimalpin_add_38_scale_loss_clamp" ->
      "SELECT CAST(1 AS DECIMAL(38,18)) + CAST(1 AS DECIMAL(38,18))",
    "decimalpin_add_38_high_scale_keeps_6_min" ->
      "SELECT CAST(1.5 AS DECIMAL(38,37)) + CAST(0.25 AS DECIMAL(38,37))",
    "decimalpin_sub_sym_to_add" ->
      "SELECT CAST(5.5 AS DECIMAL(10,1)) - CAST(0.25 AS DECIMAL(10,2))",
    // -- multiplication ------------------------------------------------
    "decimalpin_mul_scale_is_sum" ->
      "SELECT CAST(1.5 AS DECIMAL(3,1)) * CAST(2.25 AS DECIMAL(4,2))",
    "decimalpin_mul_precision_sum_plus_one" ->
      "SELECT CAST(12.34 AS DECIMAL(10,2)) * CAST(5.678 AS DECIMAL(10,3))",
    "decimalpin_mul_negative_sign" ->
      "SELECT CAST(-1.5 AS DECIMAL(3,1)) * CAST(2.0 AS DECIMAL(3,1))",
    "decimalpin_mul_38_clamp_rounds" ->
      "SELECT CAST(1.123456789012345678 AS DECIMAL(38,18)) * CAST(1.123456789012345678 AS DECIMAL(38,18))",
    "decimalpin_mul_int_keeps_exact" ->
      "SELECT 100 * CAST(0.01 AS DECIMAL(4,2))",
    // -- division ------------------------------------------------------
    "decimalpin_div_min_scale_six" ->
      "SELECT CAST(1 AS DECIMAL(2,0)) / CAST(3 AS DECIMAL(2,0))",
    "decimalpin_div_rounds_half_up_at_scale" ->
      "SELECT CAST(2 AS DECIMAL(2,0)) / CAST(3 AS DECIMAL(2,0))",
    "decimalpin_div_negative_half_up_away" ->
      "SELECT CAST(-2 AS DECIMAL(2,0)) / CAST(3 AS DECIMAL(2,0))",
    "decimalpin_div_scale_s1_plus_s2_plus_1" ->
      "SELECT CAST(1.25 AS DECIMAL(10,2)) / CAST(0.5 AS DECIMAL(10,1))",
    "decimalpin_div_wide_inputs_precision_loss" ->
      "SELECT CAST(1 AS DECIMAL(38,18)) / CAST(3 AS DECIMAL(38,18))",
    "decimalpin_div_exact_terminating" ->
      "SELECT CAST(1 AS DECIMAL(5,2)) / CAST(8 AS DECIMAL(5,2))",
    "decimalpin_div_by_decimal_fraction" ->
      "SELECT CAST(10 AS DECIMAL(4,0)) / CAST(0.25 AS DECIMAL(4,2))",
    // -- mod / integral div -------------------------------------------
    "decimalpin_mod_scale_max" ->
      "SELECT CAST(10.5 AS DECIMAL(4,1)) % CAST(3.25 AS DECIMAL(4,2))",
    "decimalpin_mod_sign_follows_dividend" ->
      "SELECT CAST(-10.5 AS DECIMAL(4,1)) % CAST(3 AS DECIMAL(2,0))",
    "decimalpin_pmod_always_nonnegative" ->
      "SELECT pmod(CAST(-10.5 AS DECIMAL(4,1)), CAST(3 AS DECIMAL(2,0)))",
    "decimalpin_integral_div_returns_bigint" ->
      "SELECT CAST(10.5 AS DECIMAL(4,1)) div CAST(3 AS DECIMAL(2,0))",
    // -- unary / comparison / equality across scales -------------------
    "decimalpin_unary_minus_keeps_type" ->
      "SELECT -CAST(1.25 AS DECIMAL(4,2))",
    "decimalpin_abs_keeps_type" ->
      "SELECT abs(CAST(-1.25 AS DECIMAL(4,2)))",
    "decimalpin_eq_across_scales" ->
      "SELECT CAST(1.0 AS DECIMAL(2,1)) = CAST(1.00 AS DECIMAL(3,2))",
    "decimalpin_lt_across_scales" ->
      "SELECT CAST(0.9 AS DECIMAL(2,1)) < CAST(0.95 AS DECIMAL(3,2))",
    "decimalpin_distinct_unifies_scales" ->
      "SELECT DISTINCT v FROM VALUES (CAST(1.0 AS DECIMAL(2,1))), (CAST(1.00 AS DECIMAL(3,2))) t(v)",
    "decimalpin_least_greatest_promote" ->
      "SELECT least(CAST(1.5 AS DECIMAL(2,1)), CAST(1.25 AS DECIMAL(3,2))), greatest(CAST(1.5 AS DECIMAL(2,1)), CAST(1.25 AS DECIMAL(3,2)))",
    "decimalpin_if_branch_promotion" ->
      "SELECT if(true, CAST(1.5 AS DECIMAL(2,1)), CAST(2.25 AS DECIMAL(3,2)))",
    "decimalpin_coalesce_promotion" ->
      "SELECT coalesce(CAST(NULL AS DECIMAL(2,1)), CAST(2.25 AS DECIMAL(3,2)))",
    "decimalpin_case_branch_promotion" ->
      "SELECT CASE WHEN false THEN CAST(1 AS DECIMAL(10,0)) ELSE CAST(0.5 AS DECIMAL(2,1)) END",
    "decimalpin_in_list_decimal_int" ->
      "SELECT CAST(1.0 AS DECIMAL(2,1)) IN (1, 2)",
    // -- coercion with other numeric families --------------------------
    "decimalpin_mul_double_becomes_double" ->
      "SELECT CAST(1.5 AS DECIMAL(2,1)) * CAST(2 AS DOUBLE)",
    "decimalpin_add_float_becomes_double" ->
      "SELECT CAST(1.5 AS DECIMAL(2,1)) + CAST(2 AS FLOAT)",
    "decimalpin_union_decimal_double" ->
      "SELECT typeof(v) FROM (SELECT CAST(1.5 AS DECIMAL(2,1)) AS v UNION ALL SELECT 2e0) LIMIT 1",
    "decimalpin_union_mixed_decimal_scales" ->
      "SELECT v FROM (SELECT CAST(1.5 AS DECIMAL(2,1)) AS v UNION ALL SELECT CAST(2.25 AS DECIMAL(3,2))) ORDER BY v",
    "decimalpin_int_to_decimal_widening" ->
      "SELECT CAST(v AS DECIMAL(10,0)) FROM VALUES (2147483647) t(v)",
    "decimalpin_string_decimal_comparison_coerces" ->
      "SELECT CAST(1.50 AS DECIMAL(5,2)) = '1.5'",
    // -- casts / rescaling ---------------------------------------------
    "decimalpin_rescale_pads_zeros" ->
      "SELECT CAST(CAST(1.5 AS DECIMAL(3,1)) AS DECIMAL(8,4))",
    "decimalpin_rescale_down_rounds_half_up" ->
      "SELECT CAST(CAST(2.675 AS DECIMAL(6,3)) AS DECIMAL(6,2))",
    "decimalpin_rescale_down_negative_half_up" ->
      "SELECT CAST(CAST(-2.675 AS DECIMAL(6,3)) AS DECIMAL(6,2))",
    "decimalpin_cast_to_int_truncates_toward_zero" ->
      "SELECT CAST(CAST(-2.9 AS DECIMAL(3,1)) AS INT)",
    "decimalpin_cast_to_double_exact_repr" ->
      "SELECT CAST(CAST(0.1 AS DECIMAL(5,2)) AS DOUBLE)",
    "decimalpin_cast_string_plain_not_sci" ->
      "SELECT CAST(CAST(0.0000001 AS DECIMAL(10,8)) AS STRING)",
    "decimalpin_cast_from_double_rounds" ->
      "SELECT CAST(2.5e0 AS DECIMAL(10,0)), CAST(3.5e0 AS DECIMAL(10,0))",
    "decimalpin_try_cast_overflow_null" ->
      "SELECT try_cast(123.45 AS DECIMAL(3,2))",
    "decimalpin_cast_boolean_rejected_try" ->
      "SELECT try_cast('x' AS DECIMAL(4,2))",
    // -- rounding family on decimals -----------------------------------
    "decimalpin_round_half_up" ->
      "SELECT round(CAST(2.5 AS DECIMAL(2,1)), 0), round(CAST(3.5 AS DECIMAL(2,1)), 0)",
    "decimalpin_bround_half_even" ->
      "SELECT bround(CAST(2.5 AS DECIMAL(2,1)), 0), bround(CAST(3.5 AS DECIMAL(2,1)), 0)",
    "decimalpin_round_negative_target" ->
      "SELECT round(CAST(1250 AS DECIMAL(6,0)), -2)",
    "decimalpin_ceil_floor_scale_arg" ->
      "SELECT ceil(CAST(1.234 AS DECIMAL(6,3)), 1), floor(CAST(1.236 AS DECIMAL(6,3)), 1)",
    "decimalpin_truncate_via_cast_vs_round" ->
      "SELECT CAST(CAST(1.99 AS DECIMAL(4,2)) AS DECIMAL(4,0)), round(CAST(1.99 AS DECIMAL(4,2)), 0)",
    // -- aggregates ----------------------------------------------------
    "decimalpin_sum_widens_ten" ->
      "SELECT sum(v) FROM VALUES (CAST(1.25 AS DECIMAL(5,2))), (CAST(2.75 AS DECIMAL(5,2))) t(v)",
    "decimalpin_avg_scale_plus_four" ->
      "SELECT avg(v) FROM VALUES (CAST(1 AS DECIMAL(5,2))), (CAST(2 AS DECIMAL(5,2))) t(v)",
    "decimalpin_sum_distinct_same_widening" ->
      "SELECT sum(DISTINCT v) FROM VALUES (CAST(1.5 AS DECIMAL(4,1))), (CAST(1.5 AS DECIMAL(4,1))), (CAST(2.0 AS DECIMAL(4,1))) t(v)",
    "decimalpin_try_sum_overflow_null" ->
      "SELECT try_sum(v) FROM VALUES (CAST(9e37 AS DECIMAL(38,0))), (CAST(9e37 AS DECIMAL(38,0))) t(v)",
    "decimalpin_try_avg_overflow_null" ->
      "SELECT try_avg(v) FROM VALUES (CAST(9e37 AS DECIMAL(38,0))), (CAST(9e37 AS DECIMAL(38,0))) t(v)",
    "decimalpin_min_max_keep_type" ->
      "SELECT min(v), max(v) FROM VALUES (CAST(1.25 AS DECIMAL(5,2))), (CAST(2.75 AS DECIMAL(5,2))) t(v)",
    "decimalpin_window_sum_running" ->
      """SELECT v, sum(v) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS rs
        |FROM VALUES (CAST(1.1 AS DECIMAL(3,1))), (CAST(2.2 AS DECIMAL(3,1))) t(v)""".stripMargin,
    "decimalpin_group_key_scale_identity" ->
      """SELECT v, count(*) AS n FROM VALUES (CAST(1.50 AS DECIMAL(5,2))), (CAST(1.5 AS DECIMAL(5,2))) t(v)
        |GROUP BY v ORDER BY v""".stripMargin,
    "decimalpin_sort_orders_numerically" ->
      "SELECT v FROM VALUES (CAST(10.5 AS DECIMAL(4,1))), (CAST(9.75 AS DECIMAL(4,2))) t(v) ORDER BY v",
    // -- try_* arithmetic on decimals ----------------------------------
    "decimalpin_try_add_overflow_null" ->
      "SELECT try_add(CAST(9e37 AS DECIMAL(38,0)), CAST(9e37 AS DECIMAL(38,0)))",
    "decimalpin_try_multiply_overflow_null" ->
      "SELECT try_multiply(CAST(9e19 AS DECIMAL(38,0)), CAST(9e19 AS DECIMAL(38,0)))",
    "decimalpin_try_divide_zero_null" ->
      "SELECT try_divide(CAST(1.5 AS DECIMAL(2,1)), CAST(0 AS DECIMAL(1,0)))",
    "decimalpin_try_mod_zero_null" ->
      "SELECT try_mod(CAST(1.5 AS DECIMAL(2,1)), CAST(0 AS DECIMAL(1,0)))",
    "decimalpin_try_add_ok_same_as_add" ->
      "SELECT try_add(CAST(1.25 AS DECIMAL(4,2)), CAST(2.5 AS DECIMAL(3,1)))",
    // -- null propagation ----------------------------------------------
    "decimalpin_null_operand_propagates" ->
      "SELECT CAST(NULL AS DECIMAL(5,2)) + CAST(1 AS DECIMAL(5,2))",
    "decimalpin_null_literal_cast_type" ->
      "SELECT CAST(NULL AS DECIMAL(20,4))",
    // -- formatting / string functions over decimals -------------------
    "decimalpin_format_number_grouping" ->
      "SELECT format_number(CAST(1234567.891 AS DECIMAL(12,3)), 2)",
    "decimalpin_to_char_pattern" ->
      "SELECT to_char(CAST(45.1 AS DECIMAL(4,1)), '000.00')",
    "decimalpin_concat_uses_plain_string" ->
      "SELECT concat('v=', CAST(1.50 AS DECIMAL(5,2)))",
    // -- narrow/wide precision identities ------------------------------
    "decimalpin_max_precision_identity" ->
      "SELECT CAST(12345678901234567890.123456789012345678 AS DECIMAL(38,18))",
    "decimalpin_scale_zero_is_integral" ->
      "SELECT CAST(42 AS DECIMAL(38,0))",
    "decimalpin_smallest_decimal_1_0" ->
      "SELECT CAST(7 AS DECIMAL(1,0))",
    "decimalpin_positive_exp_literal_type" ->
      "SELECT 1.23E2BD, typeof(1.23E2BD)",
    // -- hash / partitioning determinism over scales -------------------
    "decimalpin_hash_equal_values_equal_scale_norm" ->
      "SELECT hash(CAST(1.0 AS DECIMAL(2,1))) = hash(CAST(1.0 AS DECIMAL(2,1)))",
    "decimalpin_array_of_decimal_promotes" ->
      "SELECT array(CAST(1.5 AS DECIMAL(2,1)), CAST(2.25 AS DECIMAL(3,2)))",
    "decimalpin_map_value_decimal_promotes" ->
      "SELECT map('a', CAST(1.5 AS DECIMAL(2,1)), 'b', CAST(2.25 AS DECIMAL(3,2)))",
    "decimalpin_struct_field_keeps_type" ->
      "SELECT named_struct('v', CAST(1.25 AS DECIMAL(4,2)))",
    "decimalpin_sequence_not_supported_int_ok" ->
      "SELECT sequence(1, 3)",
    // -- joins on decimal keys -----------------------------------------
    "decimalpin_join_key_mixed_scale" ->
      """SELECT l.v FROM VALUES (CAST(1.0 AS DECIMAL(3,1))) l(v)
        |JOIN VALUES (CAST(1.00 AS DECIMAL(4,2))) r(v) ON l.v = r.v""".stripMargin,
    "decimalpin_join_key_decimal_vs_int" ->
      """SELECT count(*) AS n FROM VALUES (CAST(1.0 AS DECIMAL(3,1))) l(v)
        |JOIN VALUES (1) r(v) ON l.v = r.v""".stripMargin,
    // -- mixed surfaces: math/stats over decimals, sign edges ----------
    "decimalpin_sqrt_power_become_double" ->
      "SELECT sqrt(CAST(2.25 AS DECIMAL(4,2))), power(CAST(2 AS DECIMAL(2,0)), 3)",
    "decimalpin_stddev_becomes_double" ->
      "SELECT stddev_samp(v) FROM VALUES (CAST(1 AS DECIMAL(5,2))), (CAST(3 AS DECIMAL(5,2))) t(v)",
    "decimalpin_percentile_interpolates" ->
      "SELECT percentile(v, 0.5) FROM VALUES (CAST(1.0 AS DECIMAL(3,1))), (CAST(2.0 AS DECIMAL(3,1))) t(v)",
    "decimalpin_signum_and_sign_edges" ->
      "SELECT signum(CAST(-1.5 AS DECIMAL(2,1))), signum(CAST(0.0 AS DECIMAL(2,1)))",
    "decimalpin_mod_negative_divisor" ->
      "SELECT CAST(10.5 AS DECIMAL(4,1)) % CAST(-3 AS DECIMAL(2,0))",
    "decimalpin_width_bucket_decimal_bounds" ->
      "SELECT width_bucket(CAST(3.5 AS DECIMAL(3,1)), 0, 10, 5)",
    "decimalpin_min_by_keeps_decimal" ->
      "SELECT min_by(k, v) FROM VALUES ('a', CAST(2.5 AS DECIMAL(3,1))), ('b', CAST(1.5 AS DECIMAL(3,1))) t(k, v)",
    "decimalpin_values_union_int_and_decimal" ->
      "SELECT v FROM VALUES (1), (CAST(2.5 AS DECIMAL(3,1))) t(v) ORDER BY v",
    "decimalpin_first_value_window_keeps_type" ->
      """SELECT first_value(v) OVER (ORDER BY v) AS f
        |FROM VALUES (CAST(2.25 AS DECIMAL(4,2))) t(v)""".stripMargin,
    "decimalpin_nanvl_not_applicable_double_path" ->
      "SELECT nanvl(CAST(CAST(1.5 AS DECIMAL(2,1)) AS DOUBLE), 0e0)")

  // ---- non-ANSI duplication (GlutenCastSuite / Gluten*AnsiOff faces) --
  // Spark 4 runs ANSI-on by default; the reference's gluten-ut matrix
  // re-runs the cast/overflow suites in BOTH modes
  // (`gluten-ut/spark35/.../velox/VeloxTestSettings.scala:49+` enables
  // GlutenCastSuite alongside the ANSI suites). These pins re-render
  // the hazard expressions under `spark.sql.ansi.enabled=false`, where
  // invalid casts return NULL, integral arithmetic wraps, and
  // out-of-bounds collection access returns NULL instead of erroring.
  private val nonAnsiPinned: Seq[(String, String)] = Seq(
    // invalid/lossy casts: NULL (not error) under non-ANSI
    "nonansi_cast_invalid_string_to_int" -> "SELECT CAST('abc' AS INT)",
    "nonansi_cast_decimal_string_to_int" -> "SELECT CAST('12.9' AS INT)",
    "nonansi_cast_invalid_date" -> "SELECT CAST('2020-02-30' AS DATE)",
    "nonansi_cast_yes_to_boolean" -> "SELECT CAST('yes' AS BOOLEAN)",
    "nonansi_cast_empty_string_to_int" -> "SELECT CAST('' AS INT)",
    "nonansi_cast_partial_number_string" -> "SELECT CAST('12abc' AS INT)",
    "nonansi_cast_plus_sign_string" -> "SELECT CAST('+7' AS INT)",
    "nonansi_cast_float_string_to_long" -> "SELECT CAST('3.99' AS BIGINT)",
    // overflowing casts: wrap/clamp under non-ANSI instead of erroring
    "nonansi_cast_int_overflow_to_tinyint_wraps" -> "SELECT CAST(128 AS TINYINT)",
    "nonansi_cast_int_overflow_to_smallint_wraps" -> "SELECT CAST(40000 AS SMALLINT)",
    "nonansi_cast_long_overflow_to_int_wraps" -> "SELECT CAST(2147483648 AS INT)",
    "nonansi_cast_double_overflow_to_int_clamps" -> "SELECT CAST(1e10 AS INT)",
    "nonansi_cast_negative_double_overflow_clamps" -> "SELECT CAST(-1e10 AS INT)",
    "nonansi_cast_nan_to_int_zero" -> "SELECT CAST(double('NaN') AS INT)",
    "nonansi_cast_infinity_to_long_clamps" -> "SELECT CAST(double('Infinity') AS BIGINT)",
    "nonansi_cast_decimal_overflow_null" -> "SELECT CAST(99999 AS DECIMAL(4,0))",
    "nonansi_cast_decimal_to_narrow_decimal_null" ->
      "SELECT CAST(CAST(123.45 AS DECIMAL(10,2)) AS DECIMAL(3,2))",
    // arithmetic: wraps / NULLs instead of hard errors
    "nonansi_int_add_overflow_wraps" -> "SELECT 2147483647 + 1",
    "nonansi_long_mul_overflow_wraps" -> "SELECT 9223372036854775807 * 2",
    "nonansi_int_unary_minus_min_wraps" -> "SELECT -(-2147483648)",
    "nonansi_abs_min_int_stays_negative" -> "SELECT abs(-2147483648)",
    "nonansi_divide_by_zero_null" -> "SELECT 1/0",
    "nonansi_integer_div_by_zero_null" -> "SELECT 1L div 0L",
    "nonansi_mod_by_zero_null" -> "SELECT 7 % 0",
    "nonansi_pmod_by_zero_null" -> "SELECT pmod(7, 0)",
    // note: INTERVAL / 0 hard-errors in BOTH modes (interval arithmetic
    // is always checked) — pinned as an ANSI error entry, not here
    "nonansi_try_divide_interval_by_zero" -> "SELECT try_divide(INTERVAL '1' DAY, 0)",
    "nonansi_corr_zero_variance_null" ->
      "SELECT corr(x, y) FROM VALUES (1e0, 2e0),(1e0, 3e0) t(x, y)",
    // collection access: NULL instead of INVALID_ARRAY_INDEX
    "nonansi_element_at_oob_null" -> "SELECT element_at(array(1), 3)",
    "nonansi_array_subscript_oob_null" -> "SELECT array(1, 2)[5]",
    "nonansi_map_key_missing_null" -> "SELECT map('a', 1)['b']",
    // string→number conversion helpers under non-ANSI
    "nonansi_conv_overflow_clamps" ->
      "SELECT conv('fffffffffffffffff', 16, 10)",
    "nonansi_to_date_malformed_null" -> "SELECT to_date('2020-99-01')",
    "nonansi_to_timestamp_malformed_null" -> "SELECT to_timestamp('not a time')",
    "nonansi_unix_timestamp_malformed_null" ->
      "SELECT unix_timestamp('nope', 'yyyy-MM-dd')",
    // sum/avg overflow semantics differ only at the hard edge; the
    // decimal aggregate overflow returns NULL under non-ANSI
    "nonansi_sum_decimal_overflow_null" ->
      "SELECT sum(v) FROM VALUES (CAST(9e37 AS DECIMAL(38,0))), (CAST(9e37 AS DECIMAL(38,0))) t(v)",
    "nonansi_make_date_invalid_null" -> "SELECT make_date(2020, 2, 30)",
    "nonansi_next_day_bad_dow_null" -> "SELECT next_day(DATE '2020-01-01', 'bogus')",
    "nonansi_substr_ok_unchanged" -> "SELECT substr('hello', 2, 2)",
    "nonansi_duplicate_map_key_last_wins_conf" -> "SELECT map('a', 1)['a']",
    "nonansi_parse_url_invalid_null" -> "SELECT parse_url('not a url', 'HOST')",
    "nonansi_csv_malformed_permissive" ->
      "SELECT from_csv('a,not_int', 'x STRING, y INT').y",

    // ---- wave 7a: non-ANSI duplication beyond cast/overflow — type
    // coercion, joins, aggregates, datetime parsing (the reference's
    // both-modes matrix covers these suites too) -------------------------
    // union/in coercion: non-ANSI silently widens int vs string to string
    "nonansi_union_int_string_widens_string" ->
      "SELECT typeof(v) FROM (SELECT 1 AS v UNION ALL SELECT 'x') LIMIT 1",
    "nonansi_in_list_int_string_coerces" -> "SELECT 1 IN ('1', '2')",
    "nonansi_if_branches_int_string_coerce" ->
      "SELECT typeof(if(true, 1, 'x'))",
    "nonansi_join_int_string_key_coercion" ->
      """SELECT count(*) FROM VALUES (1) l(k)
        |JOIN VALUES ('1x') r(k) ON l.k = r.k""".stripMargin,
    // aggregates over hazard inputs
    "nonansi_sum_long_overflow_wraps" ->
      "SELECT sum(v) FROM VALUES (9223372036854775807), (1) t(v)",
    "nonansi_avg_interval_no_error" ->
      "SELECT avg(v) FROM VALUES (INTERVAL '1' DAY),(INTERVAL '3' DAY) t(v)",
    // datetime parsing/arithmetic hazards
    "nonansi_date_add_huge_overflows_silently" ->
      "SELECT try_cast(date_add(DATE '2020-01-01', 2147483647) AS STRING) IS NOT NULL",
    "nonansi_timestampadd_overflow_behavior" ->
      "SELECT timestampadd(YEAR, 5, TIMESTAMP '2020-01-01 00:00:00')",
    "nonansi_date_format_week_year_pattern" ->
      "SELECT date_format(DATE '2019-12-31', 'yyyy')",
    "nonansi_string_date_comparison_coerces" ->
      "SELECT DATE '2020-01-02' > '2020-01-01'",
    // collection/string edge behavior under non-ANSI
    "nonansi_substr_oob_empty_not_error" -> "SELECT substr('ab', 5, 2)",
    "nonansi_left_negative_len_empty" -> "SELECT left('hello', -1)",
    "nonansi_array_insert_negative_index" ->
      "SELECT array_insert(array(1, 2), -1, 99)",
    "nonansi_elt_index_oob_null" -> "SELECT elt(5, 'a', 'b')",
    "nonansi_space_negative_empty" -> "SELECT space(-3)",
    // implicit numeric narrowing in function args
    "nonansi_round_scale_from_double_arg" -> "SELECT round(2.345, 2)",
    "nonansi_string_to_double_arith_coerces" -> "SELECT '1.5' + 1",
    "nonansi_string_minus_int_coerces" -> "SELECT '10' - 1",
    "nonansi_boolean_string_compare_coerces" -> "SELECT true = 'true'",
    "nonansi_hex_string_arith_null" -> "SELECT '0x1A' + 0",

    // ---- wave 8a: ANSI×decimal interaction, non-ANSI face — overflow
    // returns NULL instead of raising NUMERIC_VALUE_OUT_OF_RANGE ------
    "nonansi_decimalpin_add_overflow_null" ->
      "SELECT CAST(9e37 AS DECIMAL(38,0)) + CAST(9e37 AS DECIMAL(38,0))",
    "nonansi_decimalpin_mul_overflow_null" ->
      "SELECT CAST(9e19 AS DECIMAL(38,0)) * CAST(9e19 AS DECIMAL(38,0))",
    "nonansi_decimalpin_cast_narrow_null" ->
      "SELECT CAST(CAST(123.45 AS DECIMAL(5,2)) AS DECIMAL(3,2))",
    "nonansi_decimalpin_div_zero_null" ->
      "SELECT CAST(1.5 AS DECIMAL(2,1)) / CAST(0 AS DECIMAL(1,0))",
    "nonansi_decimalpin_mod_zero_null" ->
      "SELECT CAST(1.5 AS DECIMAL(2,1)) % CAST(0 AS DECIMAL(1,0))",
    "nonansi_decimalpin_sum_overflow_null" ->
      "SELECT sum(v) FROM VALUES (CAST(9e37 AS DECIMAL(38,0))), (CAST(9e37 AS DECIMAL(38,0))), (CAST(1 AS DECIMAL(38,0))) t(v)",
    "nonansi_decimalpin_avg_overflow_null" ->
      "SELECT avg(v) FROM VALUES (CAST(9e37 AS DECIMAL(38,0))), (CAST(9e37 AS DECIMAL(38,0))) t(v)",
    "nonansi_decimalpin_string_cast_invalid_null" ->
      "SELECT CAST('1.2.3' AS DECIMAL(5,2))",
    "nonansi_decimalpin_promotion_same_as_ansi" ->
      "SELECT CAST(1.2 AS DECIMAL(4,1)) + CAST(3.456 AS DECIMAL(6,3))",
    "nonansi_decimalpin_div_still_rounds_half_up" ->
      "SELECT CAST(2 AS DECIMAL(2,0)) / CAST(3 AS DECIMAL(2,0))",
    "nonansi_decimalpin_rescale_half_up_same" ->
      "SELECT CAST(CAST(2.675 AS DECIMAL(6,3)) AS DECIMAL(6,2))",
    "nonansi_decimalpin_int_cast_overflow_null" ->
      "SELECT CAST(CAST(3e9 AS DECIMAL(12,0)) AS INT)")

  // ---- ANSI error entries: (label, sql, expected error condition) ------
  private val ansiErrors: Seq[(String, String, String)] = Seq(
    ("ansi_divide_by_zero_errors", "SELECT 1/0", "DIVIDE_BY_ZERO"),
    ("ansi_invalid_cast_errors", "SELECT CAST('abc' AS INT)", "CAST_INVALID_INPUT"),
    ("ansi_cast_overflow_errors", "SELECT CAST(128 AS TINYINT)", "CAST_OVERFLOW"),
    ("ansi_element_at_oob_errors", "SELECT element_at(array(1), 3)", "INVALID_ARRAY_INDEX"),
    ("ansi_int_overflow_errors", "SELECT 2147483647 + 1", "ARITHMETIC_OVERFLOW"),
    ("ansi_duplicate_map_key_errors", "SELECT map_concat(map('a',1), map('a',2))",
      "DUPLICATED_MAP_KEY"),
    // round-4 extension
    ("ansi_element_at_zero_errors", "SELECT element_at(array(1), 0)",
      "INVALID_INDEX_OF_ZERO"),
    ("ansi_decimal_overflow_errors", "SELECT CAST(99999 AS DECIMAL(4,0))",
      "NUMERIC_VALUE_OUT_OF_RANGE"),
    ("ansi_abs_min_int_overflow_errors", "SELECT abs(-2147483648)",
      "ARITHMETIC_OVERFLOW"),
    ("ansi_array_subscript_oob_errors", "SELECT array(1, 2)[5]",
      "INVALID_ARRAY_INDEX"),
    ("ansi_to_number_malformed_errors", "SELECT to_number('abc', '999')",
      "INVALID_FORMAT"),
    ("ansi_long_division_by_zero_errors", "SELECT 1L div 0L",
      "DIVIDE_BY_ZERO"),
    ("ansi_pmod_by_zero_errors", "SELECT pmod(7, 0)",
      "REMAINDER_BY_ZERO"),
    ("ansi_interval_divide_by_zero_errors", "SELECT INTERVAL '1' DAY / 0",
      "INTERVAL_DIVIDED_BY_ZERO"),
    // round-5c: more hard-error contracts
    ("ansi_cast_nan_to_int_errors", "SELECT CAST(double('NaN') AS INT)",
      "CAST_OVERFLOW"),
    ("analysis_map_equality_unorderable_errors",
      "SELECT map('a', 1) = map('a', 1)", "DATATYPE_MISMATCH"),
    // round-5b: ANSI turns the zero-variance corr denominator into a
    // hard error (non-ANSI engines return NULL/NaN here)
    ("ansi_corr_zero_variance_errors",
      "SELECT corr(x, y) FROM VALUES (1e0, 2e0),(1e0, 3e0) t(x, y)",
      "DIVIDE_BY_ZERO"),
    // the week-based pattern is a hard analysis-time contract
    ("analysis_week_based_year_pattern_errors",
      "SELECT date_format(DATE '2020-01-01', 'YYYY')",
      "_PATTERN"),
    // round-6: compilation/parsing error contracts
    // (GlutenQueryCompilationErrorsSuite / GlutenQueryParsingErrorsSuite faces)
    ("analysis_unresolved_column_suggests",
      "SELECT nonexistent FROM VALUES (1) t(v)", "UNRESOLVED_COLUMN"),
    ("analysis_unresolved_routine",
      "SELECT no_such_function(1)", "UNRESOLVED_ROUTINE"),
    ("parse_syntax_error",
      "SELEC 1", "PARSE_SYNTAX_ERROR"),
    ("analysis_union_num_columns_mismatch",
      "SELECT 1 UNION ALL SELECT 1, 2", "NUM_COLUMNS_MISMATCH"),
    ("analysis_union_incompatible_types",
      "SELECT array(1) AS v UNION ALL SELECT 'x'", "INCOMPATIBLE_COLUMN_TYPE"),
    ("analysis_ambiguous_reference",
      "SELECT x FROM (SELECT 1 AS x, 2 AS x)", "AMBIGUOUS_REFERENCE"),
    ("analysis_group_by_position_range",
      "SELECT v FROM VALUES (1) t(v) GROUP BY 5", "GROUP_BY_POS_OUT_OF_RANGE"),
    ("analysis_order_by_position_range",
      "SELECT v FROM VALUES (1) t(v) ORDER BY 9", "ORDER_BY_POS_OUT_OF_RANGE"),
    ("analysis_missing_aggregation",
      "SELECT k, count(*) FROM VALUES (1, 2) t(k, v) GROUP BY v", "MISSING_AGGREGATION"),
    // no-format to_timestamp routes through CAST, so ANSI raises the
    // cast condition (CANNOT_PARSE_TIMESTAMP is the with-format path)
    ("ansi_to_timestamp_malformed_cast_errors",
      "SELECT to_timestamp('not a time')", "CAST_INVALID_INPUT"),
    ("ansi_to_timestamp_format_parse_errors",
      "SELECT to_timestamp('nope', 'yyyy-MM-dd')", "CANNOT_PARSE_TIMESTAMP"),
    ("ansi_datetime_field_overflow_errors",
      "SELECT timestampadd(YEAR, 999999, TIMESTAMP '2020-01-01 00:00:00')",
      "DATETIME"),
    ("analysis_nested_aggregate_rejected",
      "SELECT max(count(*)) FROM VALUES (1) t(v)", "NESTED_AGGREGATE_FUNCTION"),
    ("analysis_window_function_without_over",
      "SELECT row_number()", "WINDOW_FUNCTION_WITHOUT_OVER_CLAUSE"),
    ("analysis_generator_outside_select_rejected",
      "SELECT v FROM VALUES (1) t(v) WHERE explode(array(1)) = 1",
      "UNSUPPORTED_GENERATOR"),
    // wave 7a: subquery/join error contracts
    ("runtime_scalar_subquery_multi_row_errors",
      "SELECT (SELECT y FROM VALUES (1),(2) s(y))",
      "SCALAR_SUBQUERY_TOO_MANY_ROWS"),
    ("analysis_using_column_missing_errors",
      """SELECT * FROM VALUES (1) a(x) JOIN VALUES (1) b(y) USING (zz)""",
      "UNRESOLVED_USING_COLUMN_FOR_JOIN"),
    ("analysis_natural_cross_join_rejected",
      "SELECT * FROM VALUES (1) a(x) NATURAL CROSS JOIN VALUES (1) b(x)",
      "INCOMPATIBLE_JOIN_TYPES"),
    ("analysis_lateral_forward_reference",
      "SELECT * FROM LATERAL (SELECT t.x) , VALUES (1) t(x)",
      "UNRESOLVED_COLUMN"),
    // wave 8a: ANSI×decimal error contracts (the raising faces of the
    // decimalpin_* value pins; non-ANSI twins return NULL above)
    ("ansi_decimal_cast_overflow_errors",
      "SELECT CAST(123.45 AS DECIMAL(3,2))", "NUMERIC_VALUE_OUT_OF_RANGE"),
    ("ansi_decimal_add_overflow_errors",
      "SELECT CAST(9e37 AS DECIMAL(38,0)) + CAST(9e37 AS DECIMAL(38,0))",
      "NUMERIC_VALUE_OUT_OF_RANGE"),
    ("ansi_decimal_mul_overflow_errors",
      "SELECT CAST(9e19 AS DECIMAL(38,0)) * CAST(9e19 AS DECIMAL(38,0))",
      "NUMERIC_VALUE_OUT_OF_RANGE"),
    ("ansi_decimal_divide_by_zero_errors",
      "SELECT CAST(1.5 AS DECIMAL(2,1)) / CAST(0 AS DECIMAL(1,0))",
      "DIVIDE_BY_ZERO"),
    ("ansi_decimal_mod_by_zero_errors",
      "SELECT CAST(1.5 AS DECIMAL(2,1)) % CAST(0 AS DECIMAL(1,0))",
      "REMAINDER_BY_ZERO"),
    ("ansi_decimal_string_cast_invalid_errors",
      "SELECT CAST('abc' AS DECIMAL(5,2))", "CAST_INVALID_INPUT"),
    ("ansi_decimal_sum_overflow_errors",
      "SELECT sum(v) FROM VALUES (CAST(9e37 AS DECIMAL(38,0))), (CAST(9e37 AS DECIMAL(38,0))), (CAST(1 AS DECIMAL(38,0))) t(v)",
      "NUMERIC_VALUE_OUT_OF_RANGE"),
    ("ansi_decimal_cast_int_overflow_errors",
      "SELECT CAST(CAST(3e9 AS DECIMAL(12,0)) AS INT)", "CAST_OVERFLOW"),
    // wave 9b: parse-mode error contracts — FAILFAST raises on malformed
    // input; DROPMALFORMED is a file-source-only mode that the
    // from_json/from_csv functions reject at analysis time
    ("jsonmodepin_failfast_malformed_errors",
      "SELECT from_json('{bad', 'a INT', map('mode', 'FAILFAST'))",
      "MALFORMED_RECORD_IN_PARSING"),
    ("csvmodepin_failfast_malformed_errors",
      "SELECT from_csv('1,x', 'a INT, b INT', map('mode', 'FAILFAST'))",
      "MALFORMED_RECORD_IN_PARSING"),
    ("jsonmodepin_dropmalformed_unsupported_errors",
      "SELECT from_json('{bad', 'a INT', map('mode', 'DROPMALFORMED'))",
      "PARSE_MODE_UNSUPPORTED"),
    ("csvmodepin_dropmalformed_unsupported_errors",
      "SELECT from_csv('1,x', 'a INT', map('mode', 'DROPMALFORMED'))",
      "PARSE_MODE_UNSUPPORTED"))

  /** canonical rendering: dtypes :: rows (stable across JVMs) */
  private def renderDf(df: org.apache.spark.sql.DataFrame): String = {
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
    val schema = df.schema.map(_.dataType.simpleString).mkString(",")
    val rows = df.collect().map(_.toSeq.map(lit).mkString("|")).mkString(";")
    s"$schema :: $rows"
  }

  private def render(sql: String): String = renderDf(spark.sql(sql))

  /** render with whole-stage codegen AND expression codegen disabled
    * (interpreted projections/predicates), restoring after — the
    * gluten-ut matrix's codegen-on/off duplication: Spark evaluates
    * every expression through both a codegen and an interpreted path,
    * and a custom expression whose doGenCode and eval disagree shows
    * up ONLY when the interpreted path runs */
  private def renderNoCodegen(sql: String): String = {
    val pairs = Seq(
      "spark.sql.codegen.wholeStage" -> "false",
      "spark.sql.codegen.factoryMode" -> "NO_CODEGEN")
    val origs = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try render(sql)
    finally origs.foreach { case (k, o) =>
      o.fold(spark.conf.unset(k))(spark.conf.set(k, _)) }
  }

  // ---- wave 8c: codegen-off duplication — the same hazard families
  // re-rendered with interpreted expression evaluation. Each pin's
  // golden value is byte-identical to its codegen twin above (verified
  // at regen review), so a divergence between Tungsten codegen and the
  // interpreted path in ANY engine-touched expression family fails
  // here with the drifted value.
  private val noCodegenPinned: Seq[(String, String)] = Seq(
    "nocodegen_cast_double_to_int_truncates" -> "SELECT CAST(12.9e0 AS INT)",
    "nocodegen_try_cast_invalid_int" -> "SELECT try_cast('abc' AS INT)",
    "nocodegen_decimal_add_promotion" ->
      "SELECT CAST(1.2 AS DECIMAL(4,1)) + CAST(3.456 AS DECIMAL(6,3))",
    "nocodegen_decimal_div_half_up" ->
      "SELECT CAST(2 AS DECIMAL(2,0)) / CAST(3 AS DECIMAL(2,0))",
    "nocodegen_decimal_mul_38_clamp" ->
      "SELECT CAST(1.123456789012345678 AS DECIMAL(38,18)) * CAST(1.123456789012345678 AS DECIMAL(38,18))",
    "nocodegen_decimal_rescale_half_up" ->
      "SELECT CAST(CAST(2.675 AS DECIMAL(6,3)) AS DECIMAL(6,2))",
    "nocodegen_try_sum_decimal_overflow" ->
      "SELECT try_sum(v) FROM VALUES (CAST(9e37 AS DECIMAL(38,0))), (CAST(9e37 AS DECIMAL(38,0))) t(v)",
    "nocodegen_three_valued_logic" ->
      "SELECT NULL AND false, NULL OR true, 1 IN (2, NULL)",
    "nocodegen_null_safe_eq" -> "SELECT NULL <=> NULL, 1 <=> NULL",
    "nocodegen_string_trim_pad" ->
      "SELECT btrim('  x  '), lpad('7', 3, '0'), rpad('ab', 4, 'xy')",
    "nocodegen_string_split_index" ->
      "SELECT split('a,b,c', ','), substring_index('a.b.c', '.', 2)",
    "nocodegen_regexp_extract_replace" ->
      "SELECT regexp_extract('a1b2', '([0-9])', 1), regexp_replace('a1b2', '[0-9]', '#')",
    "nocodegen_math_domain_edges" ->
      "SELECT ln(0e0), sqrt(-1e0), power(0e0, 0e0), log(1e0)",
    "nocodegen_round_vs_bround" ->
      "SELECT round(2.5, 0), bround(2.5, 0), rint(2.5e0)",
    "nocodegen_pmod_negative" -> "SELECT pmod(-7, 3), -7 % 3",
    "nocodegen_datetime_extract" ->
      "SELECT year(DATE '2020-02-29'), weekofyear(DATE '2020-01-01'), dayofweek(DATE '2020-01-05')",
    "nocodegen_date_arith_clamp" ->
      "SELECT add_months(DATE '2020-01-31', 1), last_day(DATE '2020-02-10')",
    "nocodegen_timestamp_trunc" ->
      "SELECT date_trunc('HOUR', TIMESTAMP '2020-01-02 03:44:55')",
    "nocodegen_array_ops" ->
      "SELECT array_distinct(array(1, 2, 1)), array_position(array(5, 6), 6), element_at(array(1, 2), 2)",
    "nocodegen_array_sort_nulls" ->
      "SELECT sort_array(array(3, NULL, 1)), array_sort(array(3, NULL, 1))",
    "nocodegen_map_ops" ->
      "SELECT map_concat(map('a', 1), map('b', 2)), map_from_arrays(array('k'), array(9))",
    "nocodegen_hof_transform_filter" ->
      "SELECT transform(array(1, 2), x -> x * 10), filter(array(1, 2, 3), x -> x > 1)",
    "nocodegen_hof_aggregate_lambda" ->
      "SELECT aggregate(array(1, 2, 3), 0, (acc, x) -> acc + x, acc -> acc * 2)",
    "nocodegen_hash_family" ->
      "SELECT hash(42), xxhash64('x'), crc32('x'), md5('x')",
    "nocodegen_struct_field_access" ->
      "SELECT named_struct('a', 1, 'b', 'x').a",
    "nocodegen_json_get" ->
      "SELECT get_json_object('{\"k\": {\"v\": 7}}', '$.k.v')",
    "nocodegen_case_when_chain" ->
      "SELECT CASE WHEN 1 > 2 THEN 'a' WHEN 2 > 1 THEN 'b' ELSE 'c' END",
    "nocodegen_coalesce_nvl2" -> "SELECT coalesce(NULL, NULL, 3), nvl2(NULL, 1, 2)",
    "nocodegen_concat_ws_nulls" -> "SELECT concat_ws('-', 'a', NULL, 'b')",
    "nocodegen_greatest_least_nulls" ->
      "SELECT greatest(1, NULL, 3), least(1, NULL, 3)",
    "nocodegen_bitwise_shifts" ->
      "SELECT shiftleft(1, 3), shiftright(-8, 1), 5 & 3, 5 | 3, 5 ^ 3",
    "nocodegen_agg_groupby_sum_avg" ->
      """SELECT k, sum(v) AS s, avg(v) AS a FROM VALUES (1, 10), (1, 20), (2, 30) t(k, v)
        |GROUP BY k ORDER BY k""".stripMargin,
    "nocodegen_window_running_sum" ->
      """SELECT v, sum(v) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS rs
        |FROM VALUES (1), (2), (3) t(v)""".stripMargin,
    "nocodegen_distinct_normalizes_neg_zero" ->
      "SELECT DISTINCT v FROM VALUES (0e0), (-0e0) t(v)",
    "nocodegen_interval_arith" ->
      "SELECT DATE '2020-01-31' + INTERVAL '1' MONTH, INTERVAL '10' DAY / 4",
    // graft's own injected expressions through the interpreted path:
    // exactly the doGenCode-vs-eval parity this wave exists for
    "nocodegen_custom_simhash64" ->
      "SELECT simhash64(array('a', 'b', 'c'))",
    "nocodegen_custom_cosine_dot" ->
      "SELECT cosine_similarity(array(1e0, 0e0), array(1e0, 0e0)), dot_product(array(1e0, 2e0), array(3e0, 4e0))",
    "nocodegen_custom_topk_freq" ->
      "SELECT topk_freq(v, 2) FROM VALUES ('a'), ('a'), ('b'), ('c') t(v)")

  /** render under `spark.sql.ansi.enabled=false`, restoring after */
  private def renderNonAnsi(sql: String): String = {
    val orig = spark.conf.getOption("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "false")
    try render(sql)
    finally orig.fold(spark.conf.unset("spark.sql.ansi.enabled"))(
      spark.conf.set("spark.sql.ansi.enabled", _))
  }

  /** render under a non-UTC session timezone, restoring after — wave 9a:
    * the reference's test matrix runs the date/time suites under
    * multiple session zones (`VeloxTestSettings.scala:49+` enables
    * Spark's datetime suites, which internally sweep zones); every
    * correctness artifact in this repo runs UTC, so these pins fix the
    * zone-SENSITIVE behaviors — wall-clock parsing, LTZ rendering, DST
    * gap/overlap resolution, NTZ↔LTZ casts — under three offset
    * regimes: US (DST, negative offset), Japan (no DST), Europe (DST,
    * positive offset), plus a southern-hemisphere zone whose DST
    * transitions run opposite to the northern ones. */
  private def renderWithTz(tz: String)(sql: String): String = {
    val k = "spark.sql.session.timeZone"
    val orig = spark.conf.getOption(k)
    spark.conf.set(k, tz)
    try render(sql)
    finally orig.fold(spark.conf.unset(k))(spark.conf.set(k, _))
  }

  // ---- wave 9a: session-timezone pins. Each base SQL is rendered under
  // every zone; labels are tzpin_<zone>_<behavior>. Fixed instants used:
  //   1577836800 = 2020-01-01 00:00:00 UTC (date boundary per zone)
  //   1583661600 = 2020-03-08 10:00:00 UTC = the US spring-forward
  //                instant (02:00 PST -> 03:00 PDT in Los Angeles)
  //   1585443600 = 2020-03-29 01:00:00 UTC = the EU spring-forward
  //                instant (02:00 CET -> 03:00 CEST in Berlin)
  private val tzZones: Seq[(String, String)] = Seq(
    "la" -> "America/Los_Angeles",
    "tokyo" -> "Asia/Tokyo",
    "berlin" -> "Europe/Berlin",
    "sydney" -> "Australia/Sydney")

  private val tzBase: Seq[(String, String)] = Seq(
    "epoch_renders_in_session_zone" -> "SELECT CAST(timestamp_seconds(0) AS STRING)",
    "current_timezone_reports_session_zone" -> "SELECT current_timezone()",
    "unix_timestamp_parses_wall_clock" -> "SELECT unix_timestamp('2020-06-01 12:00:00')",
    "to_unix_timestamp_with_format" ->
      "SELECT to_unix_timestamp('01/06/2020 12:00', 'dd/MM/yyyy HH:mm')",
    "from_unixtime_renders_wall_clock" -> "SELECT from_unixtime(1577836800)",
    "epoch_to_date_crosses_midnight" -> "SELECT CAST(timestamp_seconds(1577836800) AS DATE)",
    "field_extraction_in_session_zone" ->
      "SELECT hour(timestamp_seconds(1577836800)), dayofweek(timestamp_seconds(1577836800))",
    "us_dst_gap_renders_skip_hour" ->
      "SELECT from_unixtime(1583661599), from_unixtime(1583661600)",
    "eu_dst_gap_renders_skip_hour" ->
      "SELECT from_unixtime(1585443599), from_unixtime(1585443600)",
    "make_timestamp_nonexistent_local_time" ->
      ("SELECT unix_timestamp(make_timestamp(2020, 3, 8, 2, 30, 0)), " +
        "CAST(make_timestamp(2020, 3, 8, 2, 30, 0) AS STRING)"),
    "make_timestamp_ambiguous_local_time" ->
      ("SELECT unix_timestamp(make_timestamp(2020, 11, 1, 1, 30, 0)), " +
        "CAST(make_timestamp(2020, 11, 1, 1, 30, 0) AS STRING)"),
    "make_timestamp_ltz_explicit_zone_ignores_session_for_parse" ->
      "SELECT CAST(make_timestamp_ltz(2020, 6, 1, 12, 0, 0, 'UTC') AS STRING)",
    "ntz_to_ltz_cast_applies_session_zone" ->
      "SELECT unix_timestamp(CAST(TIMESTAMP_NTZ '2020-06-01 12:00:00' AS TIMESTAMP))",
    "ltz_to_ntz_cast_renders_session_wall_clock" ->
      "SELECT CAST(CAST(timestamp_seconds(1577836800) AS TIMESTAMP_NTZ) AS STRING)",
    "from_utc_timestamp_shift_then_render" ->
      "SELECT CAST(from_utc_timestamp(timestamp_seconds(0), 'Asia/Tokyo') AS STRING)",
    "to_utc_timestamp_shifts_epoch" ->
      "SELECT unix_timestamp(to_utc_timestamp(timestamp_seconds(0), 'Asia/Tokyo'))",
    "date_trunc_day_in_session_zone" ->
      ("SELECT CAST(date_trunc('DAY', timestamp_seconds(1577840400)) AS STRING), " +
        "unix_timestamp(date_trunc('DAY', timestamp_seconds(1577840400)))"),
    "date_format_zone_abbreviation_token" ->
      "SELECT date_format(timestamp_seconds(0), 'yyyy-MM-dd HH:mm:ss z')",
    "to_date_of_ltz_in_session_zone" -> "SELECT to_date(timestamp_seconds(1583661600))",
    "ambiguous_parse_roundtrip" ->
      "SELECT from_unixtime(unix_timestamp('2020-11-01 01:30:00'))",
    "timestamp_literal_parsed_in_session_zone" ->
      "SELECT unix_timestamp(TIMESTAMP '2020-06-01 12:00:00')",
    "string_cast_into_dst_gap" ->
      "SELECT unix_timestamp(CAST('2020-03-08 02:30:00' AS TIMESTAMP))",
    "months_between_uses_session_wall_clocks" ->
      "SELECT months_between(timestamp_seconds(1583661600), timestamp_seconds(1577836800))")

  private val tzPinned: Seq[(String, String, String => String)] =
    for { (zl, zid) <- tzZones; (suffix, sql) <- tzBase }
      yield (s"tzpin_${zl}_$suffix", sql, renderWithTz(zid)(_))

  // ---- wave 9b: CSV/JSON parse-mode pins (the reference enables
  // Spark's CSV/JSON suites; PERMISSIVE/FAILFAST semantics,
  // columnNameOfCorruptRecord, and parser options are the behaviors a
  // custom engine most easily drifts on). from_csv/from_json faces are
  // plain SQL; file-source faces (DROPMALFORMED, multiLine) live in
  // apiPinned below because they need files + reader options.
  private val parseModePinned: Seq[(String, String)] = Seq(
    // CSV: PERMISSIVE (default) null-fills unparseable fields
    "csvmodepin_permissive_type_mismatch_field_null" ->
      "SELECT from_csv('1,x', 'a INT, b INT')",
    "csvmodepin_permissive_corrupt_record_default_col" ->
      "SELECT from_csv('1,x', 'a INT, b INT, _corrupt_record STRING')",
    "csvmodepin_permissive_corrupt_record_custom_col" ->
      ("SELECT from_csv('1,x', 'a INT, b INT, bad STRING', " +
        "map('mode', 'PERMISSIVE', 'columnNameOfCorruptRecord', 'bad'))"),
    "csvmodepin_permissive_missing_trailing_cols_null" ->
      "SELECT from_csv('1', 'a INT, b INT')",
    "csvmodepin_permissive_extra_tokens" ->
      "SELECT from_csv('1,2,3', 'a INT, b INT')",
    "csvmodepin_failfast_wellformed_ok" ->
      "SELECT from_csv('1,2', 'a INT, b INT', map('mode', 'FAILFAST'))",
    "csvmodepin_nullvalue_option" ->
      "SELECT from_csv('1,NA', 'a INT, b STRING', map('nullValue', 'NA'))",
    "csvmodepin_custom_sep_with_quote" ->
      "SELECT from_csv('1|\"x|y\"', 'a INT, b STRING', map('sep', '|'))",
    "csvmodepin_whitespace_trim_options" ->
      ("SELECT from_csv(' 1 , x ', 'a INT, b STRING', " +
        "map('ignoreLeadingWhiteSpace', 'true', 'ignoreTrailingWhiteSpace', 'true'))"),
    "csvmodepin_dateformat_option" ->
      "SELECT from_csv('01/02/2020', 'd DATE', map('dateFormat', 'dd/MM/yyyy'))",
    "csvmodepin_empty_string_field" -> "SELECT from_csv('1,', 'a INT, b STRING')",
    "csvmodepin_quoted_sep_inside_field" ->
      "SELECT from_csv('\"a,b\",2', 'a STRING, b INT')",
    // JSON: PERMISSIVE semantics and parser options
    "jsonmodepin_permissive_malformed_all_null" ->
      "SELECT from_json('{\"a\": 1,', 'a INT, b INT')",
    "jsonmodepin_permissive_corrupt_default_col" ->
      "SELECT from_json('{bad', 'a INT, _corrupt_record STRING')",
    "jsonmodepin_permissive_corrupt_custom_col" ->
      ("SELECT from_json('{bad', 'a INT, oops STRING', " +
        "map('columnNameOfCorruptRecord', 'oops'))"),
    "jsonmodepin_permissive_type_mismatch" ->
      "SELECT from_json('{\"a\": \"xyz\", \"b\": 2}', 'a INT, b INT')",
    "jsonmodepin_failfast_wellformed_ok" ->
      "SELECT from_json('{\"a\": 5}', 'a INT', map('mode', 'FAILFAST'))",
    "jsonmodepin_embedded_newlines_in_document" ->
      "SELECT from_json('{\n  \"a\": 7\n}', 'a INT')",
    "jsonmodepin_single_quotes_allowed_by_default" ->
      "SELECT from_json('{''a'': 3}', 'a INT')",
    "jsonmodepin_unquoted_field_names_option" ->
      "SELECT from_json('{a: 4}', 'a INT', map('allowUnquotedFieldNames', 'true'))",
    "jsonmodepin_allow_comments_option" ->
      "SELECT from_json('{\"a\": 1 /*c*/}', 'a INT', map('allowComments', 'true'))",
    "jsonmodepin_missing_field_null" ->
      "SELECT from_json('{\"b\": 2}', 'a INT, b INT')",
    "jsonmodepin_nested_struct_partial" ->
      "SELECT from_json('{\"o\": {\"x\": 1}}', 'o STRUCT<x: INT, y: INT>')",
    "jsonmodepin_array_root" ->
      "SELECT from_json('[{\"a\": 1}, {\"a\": 2}]', 'ARRAY<STRUCT<a: INT>>')")

  // ---- wave 7a: DataFrame-API pins (GlutenDataFrameSuite /
  // GlutenDataFrameNaFunctionsSuite / GlutenDataFrameSetOperationsSuite /
  // GlutenDataFramePivotSuite / GlutenDataFrameStatSuite API faces) ------
  // These behaviors have no single-SQL rendering (na.*, unionByName,
  // exceptAll/intersectAll multiplicities, stat.*, typed Dataset ops), so
  // the pin is a DataFrame program; output is golden-pinned identically.
  // ---- wave 10a: interval-arithmetic overflow faces (round-9 verdict
  // item 4; reference runs GlutenIntervalExpressionsSuite /
  // GlutenIntervalFunctionsSuite — VeloxTestSettings.scala:49+). ANSI
  // interval types (year-month = int months, day-time = long micros)
  // overflow-CHECK in every arithmetic op regardless of
  // spark.sql.ansi.enabled; the raising faces are contracts below
  // (intervalErrors, asserted under BOTH ANSI modes), the try_ variants
  // and boundary-exact values are pinned here.
  private val intervalPinned: Seq[(String, String)] = Seq(
    // try_* family absorbs interval overflow to NULL
    "intervalpin_try_add_dt_overflow_null" ->
      "SELECT try_add(INTERVAL '106751991' DAY, INTERVAL '1' DAY)",
    "intervalpin_try_add_ym_overflow_null" ->
      "SELECT try_add(INTERVAL '178956970' YEAR, INTERVAL '1' YEAR)",
    "intervalpin_try_subtract_dt_overflow_null" ->
      "SELECT try_subtract(INTERVAL '-106751991' DAY, INTERVAL '1' DAY)",
    "intervalpin_try_subtract_ym_overflow_null" ->
      "SELECT try_subtract(INTERVAL '-178956970' YEAR, INTERVAL '1' YEAR)",
    "intervalpin_try_multiply_dt_overflow_null" ->
      "SELECT try_multiply(INTERVAL '106751991' DAY, 2)",
    "intervalpin_try_multiply_ym_overflow_null" ->
      "SELECT try_multiply(INTERVAL '178956970' YEAR, 2)",
    "intervalpin_try_divide_dt_by_zero_null" ->
      "SELECT try_divide(INTERVAL '1' DAY, 0)",
    "intervalpin_try_divide_ym_by_zero_null" ->
      "SELECT try_divide(INTERVAL '1' YEAR, 0)",
    "intervalpin_try_add_in_range_value" ->
      "SELECT try_add(INTERVAL '1' DAY, INTERVAL '12' HOUR)",
    "intervalpin_try_multiply_in_range_value" ->
      "SELECT try_multiply(INTERVAL '2-3' YEAR TO MONTH, 2)",
    // exact type boundaries parse and survive identity arithmetic
    "intervalpin_ym_max_literal" ->
      "SELECT INTERVAL '178956970-7' YEAR TO MONTH",
    "intervalpin_ym_min_literal" ->
      "SELECT INTERVAL '-178956970-8' YEAR TO MONTH",
    "intervalpin_dt_max_literal" ->
      "SELECT INTERVAL '106751991 04:00:54.775807' DAY TO SECOND",
    "intervalpin_dt_max_plus_zero" ->
      "SELECT INTERVAL '106751991 04:00:54.775807' DAY TO SECOND + INTERVAL '0' SECOND",
    "intervalpin_ym_max_plus_zero" ->
      "SELECT INTERVAL '178956970-7' YEAR TO MONTH + INTERVAL '0-0' YEAR TO MONTH",
    // carry/rounding discipline
    "intervalpin_dt_second_carry_to_day" ->
      "SELECT INTERVAL '0 23:59:59.999999' DAY TO SECOND + INTERVAL '0.000001' SECOND",
    "intervalpin_dt_multiply_micro_rounding" ->
      "SELECT INTERVAL '1' SECOND * 0.0000015",
    "intervalpin_dt_divide_truncation" ->
      "SELECT INTERVAL '1' DAY / 3",
    "intervalpin_ym_multiply_fractional_rounding" ->
      "SELECT INTERVAL '1' YEAR * 1.5, INTERVAL '1' YEAR * 1.4999999",
    "intervalpin_negate_max_dt_ok" ->
      "SELECT -INTERVAL '106751991 04:00:54.775807' DAY TO SECOND",
    // datetime +/- interval edges (in-range)
    "intervalpin_date_plus_ym_month_clamp" ->
      "SELECT DATE'2024-01-31' + INTERVAL '1' MONTH, DATE'2024-02-29' + INTERVAL '1' YEAR",
    "intervalpin_date_minus_ym" ->
      "SELECT DATE'2020-03-31' - INTERVAL '1' MONTH",
    "intervalpin_ts_plus_dt_micros" ->
      "SELECT TIMESTAMP'2020-01-01 00:00:00' + INTERVAL '0.000001' SECOND",
    "intervalpin_date_max_reachable" ->
      "SELECT DATE'9999-12-30' + INTERVAL '1' DAY",
    // aggregates over ANSI intervals
    "intervalpin_sum_avg_dt_with_null" ->
      "SELECT sum(i), avg(i) FROM VALUES (INTERVAL '1' DAY),(INTERVAL '2' DAY),(CAST(NULL AS INTERVAL DAY)) t(i)",
    "intervalpin_sum_ym" ->
      "SELECT sum(i) FROM VALUES (INTERVAL '1-1' YEAR TO MONTH),(INTERVAL '2-11' YEAR TO MONTH) t(i)",
    "intervalpin_min_max_dt" ->
      "SELECT min(i), max(i) FROM VALUES (INTERVAL '-1' DAY),(INTERVAL '2' HOUR) t(i)",
    // casts and field width changes
    "intervalpin_cast_month_to_string" ->
      "SELECT CAST(INTERVAL '14' MONTH AS STRING)",
    "intervalpin_cast_ym_to_int_months" ->
      "SELECT CAST(INTERVAL '1-2' YEAR TO MONTH AS INT)",
    "intervalpin_cast_dt_second_to_long" ->
      "SELECT CAST(INTERVAL '1' SECOND AS BIGINT)",
    "intervalpin_cast_int_to_ym" ->
      "SELECT CAST(14 AS INTERVAL MONTH)",
    "intervalpin_extract_negative_fields" ->
      "SELECT extract(YEAR FROM INTERVAL '-1-7' YEAR TO MONTH), extract(MONTH FROM INTERVAL '-1-7' YEAR TO MONTH)",
    "intervalpin_compare_mixed_sign" ->
      "SELECT INTERVAL '-1' DAY < INTERVAL '1' HOUR, INTERVAL '0' DAY = INTERVAL '0' HOUR",
    "intervalpin_sort_dt_array" ->
      "SELECT array_sort(array(INTERVAL '2' DAY, INTERVAL '-1' DAY, INTERVAL '3' HOUR))",
    "intervalpin_make_interval_funcs" ->
      "SELECT make_ym_interval(1, 14), make_dt_interval(1, 25, 61, 61.5)")

  // the raising faces: ANSI interval overflow errors under BOTH ansi
  // modes (checked in a dedicated both-modes test below, not ansiErrors,
  // because ansiErrors runs only under the session default)
  private val intervalErrors: Seq[(String, String, String)] = Seq(
    ("intervalpin_dt_add_overflow_errors",
      "SELECT INTERVAL '106751991' DAY + INTERVAL '1' DAY", "overflow"),
    ("intervalpin_ym_add_overflow_errors",
      "SELECT INTERVAL '178956970' YEAR + INTERVAL '1' YEAR", "overflow"),
    ("intervalpin_dt_subtract_overflow_errors",
      "SELECT INTERVAL '-106751991' DAY - INTERVAL '2' DAY", "overflow"),
    ("intervalpin_ym_multiply_overflow_errors",
      "SELECT INTERVAL '178956970' YEAR * 2", "overflow"),
    ("intervalpin_dt_multiply_overflow_errors",
      "SELECT INTERVAL '106751991' DAY * 2", "overflow"),
    // note: DATE has no year-9999 cap (int days since epoch) — the
    // raising face is the int-days overflow, not a calendar ceiling
    ("intervalpin_date_plus_ym_overflow_errors",
      "SELECT DATE'2020-01-01' + INTERVAL '178956970' YEAR", "overflow"),
    // raises the RAW JVM face (java.lang.ArithmeticException "long
    // overflow" from the micros addExact), not a Spark error condition —
    // pin the real substring (advisor r10: the previous "" pin made
    // contains() vacuously true)
    ("intervalpin_ts_plus_dt_overflow_errors",
      "SELECT TIMESTAMP'2020-01-01 00:00:00' + INTERVAL '106751991' DAY", "long overflow"),
    ("intervalpin_divide_by_zero_ym_errors",
      "SELECT INTERVAL '1' YEAR / 0", "INTERVAL_DIVIDED_BY_ZERO"))

  // ---- wave 10b: collation-sensitive comparison/sort/grouping/join
  // (round-9 verdict item 4; reference runs the collation suites).
  // UTF8_BINARY is the codepoint baseline; UTF8_LCASE lowercases before
  // comparing; UNICODE/UNICODE_CI are the ICU root-order faces.
  private val collatePinned: Seq[(String, String)] = Seq(
    "collatepin_binary_vs_lcase_equality" ->
      "SELECT 'GRAFT' = 'graft', 'GRAFT' COLLATE UTF8_LCASE = 'graft'",
    "collatepin_binary_vs_lcase_less_than" ->
      "SELECT 'a' < 'B', 'a' COLLATE UTF8_LCASE < 'B' COLLATE UTF8_LCASE",
    "collatepin_lcase_inequality_still_distinguishes" ->
      "SELECT 'ab' COLLATE UTF8_LCASE = 'ac', 'ab' COLLATE UTF8_LCASE < 'AC' COLLATE UTF8_LCASE",
    "collatepin_collation_of_expressions" ->
      "SELECT collation('x'), collation('x' COLLATE UTF8_LCASE), collation('x' COLLATE UNICODE_CI)",
    "collatepin_order_by_lcase_with_binary_tiebreak" ->
      "SELECT s FROM VALUES ('b'),('A'),('a'),('B') t(s) ORDER BY s COLLATE UTF8_LCASE, s",
    "collatepin_order_by_binary_upper_block_first" ->
      "SELECT s FROM VALUES ('b'),('A'),('a'),('B') t(s) ORDER BY s",
    "collatepin_group_by_lcase_merges_case_variants" ->
      "SELECT count(DISTINCT s COLLATE UTF8_LCASE), count(DISTINCT s) FROM VALUES ('aa'),('AA'),('aA'),('bb') t(s)",
    "collatepin_group_by_lcase_counts" ->
      "SELECT lower(c), n FROM (SELECT s COLLATE UTF8_LCASE AS c, count(*) AS n FROM VALUES ('x'),('X'),('y') t(s) GROUP BY 1) ORDER BY 1",
    "collatepin_join_on_lcase_keys" ->
      "SELECT a.s, b.t FROM VALUES ('Foo') a(s) JOIN VALUES ('foo') b(t) ON a.s COLLATE UTF8_LCASE = b.t COLLATE UTF8_LCASE",
    "collatepin_join_on_binary_keys_misses" ->
      "SELECT count(*) FROM VALUES ('Foo') a(s) JOIN VALUES ('foo') b(t) ON a.s = b.t",
    "collatepin_min_max_under_lcase" ->
      "SELECT min(s COLLATE UTF8_LCASE), max(s COLLATE UTF8_LCASE), min(s), max(s) FROM VALUES ('a'),('B') t(s)",
    "collatepin_in_list_lcase" ->
      "SELECT 'ABC' COLLATE UTF8_LCASE IN ('abc', 'xyz'), 'ABC' IN ('abc', 'xyz')",
    "collatepin_case_when_comparison" ->
      "SELECT CASE WHEN 'A' COLLATE UTF8_LCASE = 'a' THEN 'ci' ELSE 'cs' END",
    "collatepin_contains_startswith_endswith_lcase" ->
      "SELECT contains('GRAFT' COLLATE UTF8_LCASE, 'raf'), startswith('GRAFT' COLLATE UTF8_LCASE, 'gr'), endswith('GRAFT' COLLATE UTF8_LCASE, 'FT' COLLATE UTF8_LCASE)",
    "collatepin_instr_locate_binary_baseline" ->
      "SELECT instr('GRAFT', 'raf'), instr('GRAFT', 'RAF')",
    "collatepin_unicode_ci_accents_fold_case_only" ->
      "SELECT 'é' COLLATE UNICODE_CI = 'É', 'e' COLLATE UNICODE_CI = 'é'",
    "collatepin_unicode_order_vs_binary" ->
      "SELECT 'ä' < 'z', 'ä' COLLATE UNICODE < 'z' COLLATE UNICODE",
    "collatepin_lcase_distinct_count_one" ->
      "SELECT count(*) FROM (SELECT DISTINCT s COLLATE UTF8_LCASE AS c FROM VALUES ('x'),('X') t(s))",
    "collatepin_greatest_least_lcase" ->
      "SELECT greatest('a' COLLATE UTF8_LCASE, 'B' COLLATE UTF8_LCASE), least('a' COLLATE UTF8_LCASE, 'B' COLLATE UTF8_LCASE)",
    "collatepin_array_sort_collated_elements" ->
      "SELECT array_sort(array('b' COLLATE UTF8_LCASE, 'A' COLLATE UTF8_LCASE, 'a' COLLATE UTF8_LCASE))",
    "collatepin_array_contains_lcase" ->
      "SELECT array_contains(array('Foo' COLLATE UTF8_LCASE, 'Bar' COLLATE UTF8_LCASE), 'foo')",
    "collatepin_nullif_lcase" ->
      "SELECT nullif('A' COLLATE UTF8_LCASE, 'a' COLLATE UTF8_LCASE), nullif('A', 'a')",
    "collatepin_between_lcase" ->
      "SELECT 'm' COLLATE UTF8_LCASE BETWEEN 'A' COLLATE UTF8_LCASE AND 'Z' COLLATE UTF8_LCASE, 'm' BETWEEN 'A' AND 'Z'",
    "collatepin_cast_strips_to_default" ->
      "SELECT collation(CAST('x' COLLATE UTF8_LCASE AS STRING))",
    "collatepin_concat_preserves_collation" ->
      "SELECT collation(concat('a' COLLATE UTF8_LCASE, 'b' COLLATE UTF8_LCASE))",
    "collatepin_upper_lower_on_collated" ->
      "SELECT upper('graft' COLLATE UTF8_LCASE), lower('GRAFT' COLLATE UTF8_LCASE)",
    "collatepin_typeof_collated_string" ->
      "SELECT typeof('x' COLLATE UTF8_LCASE)")

  // ---- wave 11a: correlated-subquery corner cases (round-10 verdict
  // item 5; the GlutenSubquerySuite analog beyond wave 6d's basics).
  // NULL-aware anti-join semantics, the COUNT-on-empty-group "count
  // bug", decorrelation of inequality/LIMIT/ORDER BY shapes, lateral
  // correlation, and the analysis limits (outer refs reach ONE level).
  private val subqPinned: Seq[(String, String)] = Seq(
    "subqpin_not_in_null_in_subquery_empty" ->
      "SELECT k FROM VALUES (1),(2) t(k) WHERE k NOT IN (SELECT v FROM VALUES (1),(NULL) s(v))",
    "subqpin_not_in_null_probe_and_null_subquery_empty" ->
      "SELECT k FROM VALUES (CAST(NULL AS INT)),(2) t(k) WHERE k NOT IN (SELECT v FROM VALUES (1),(NULL) s(v))",
    "subqpin_not_in_filtered_empty_subquery_keeps_all" ->
      "SELECT k FROM VALUES (CAST(NULL AS INT)),(2) t(k) WHERE k NOT IN (SELECT v FROM VALUES (1) s(v) WHERE v > 9) ORDER BY k",
    "subqpin_not_in_constant_false_subquery_keeps_all" ->
      "SELECT k FROM VALUES (CAST(NULL AS INT)),(2) t(k) WHERE k NOT IN (SELECT v FROM VALUES (1) s(v) WHERE 1=0) ORDER BY k",
    "subqpin_correlated_not_in" ->
      "SELECT k FROM VALUES (1),(2),(3) t(k) WHERE k NOT IN (SELECT v FROM VALUES (1,1),(2,5) s(v, g) WHERE s.g = t.k) ORDER BY k",
    // the "count bug": COUNT over an empty correlated group is 0, not
    // NULL — a naive decorrelating join would fabricate NULL
    "subqpin_count_bug_empty_group_zero" ->
      "SELECT k, (SELECT count(*) FROM VALUES (1) s(v) WHERE s.v = t.k) AS c FROM VALUES (1),(5) t(k) ORDER BY k",
    "subqpin_sum_empty_group_null" ->
      "SELECT k, (SELECT sum(v) FROM VALUES (1) s(v) WHERE s.v = t.k) AS c FROM VALUES (1),(5) t(k) ORDER BY k",
    "subqpin_correlated_group_having_empty_null" ->
      "SELECT k, (SELECT count(*) FROM VALUES (1) s(v) WHERE s.v = t.k GROUP BY v) AS c FROM VALUES (1),(5) t(k) ORDER BY k",
    "subqpin_nested_exists_two_level" ->
      "SELECT k FROM VALUES (1),(2) t(k) WHERE EXISTS (SELECT 1 FROM VALUES (1),(2) s(v) WHERE s.v = t.k AND EXISTS (SELECT 1 FROM VALUES (1) u(w) WHERE u.w = s.v))",
    "subqpin_tuple_in" ->
      "SELECT k FROM VALUES (1),(2) t(k) WHERE (k, k+1) IN (SELECT v, v+1 FROM VALUES (1) s(v))",
    "subqpin_left_lateral_empty_null" ->
      "SELECT t.k, l.m FROM VALUES (1),(2) t(k) LEFT JOIN LATERAL (SELECT v AS m FROM VALUES (1) s(v) WHERE s.v = t.k) l ON true ORDER BY t.k",
    "subqpin_lateral_aggregate" ->
      "SELECT t.k, l.m FROM VALUES (1),(2) t(k), LATERAL (SELECT max(v) AS m FROM VALUES (1),(2) s(v) WHERE s.v <= t.k) l ORDER BY t.k",
    "subqpin_correlated_inequality_count" ->
      "SELECT k, (SELECT count(*) FROM VALUES (1),(2),(3) s(v) WHERE s.v < t.k) AS c FROM VALUES (2),(4) t(k) ORDER BY k",
    "subqpin_having_scalar" ->
      "SELECT k, count(*) AS n FROM VALUES (1),(1),(2) t(k) GROUP BY k HAVING count(*) > (SELECT min(v) FROM VALUES (1) s(v)) ORDER BY k",
    "subqpin_case_when_in" ->
      "SELECT k, CASE WHEN k IN (SELECT v FROM VALUES (1) s(v)) THEN 'in' ELSE 'out' END FROM VALUES (1),(2) t(k) ORDER BY k",
    "subqpin_scalar_null_comparison_empty" ->
      "SELECT k FROM VALUES (1),(2) t(k) WHERE k > (SELECT CAST(NULL AS INT))",
    // a NULL join key matches nothing: EXISTS drops the NULL row,
    // NOT EXISTS keeps it — the semi/anti asymmetry
    "subqpin_exists_null_key_drops_null_row" ->
      "SELECT k FROM VALUES (CAST(NULL AS INT)),(1) t(k) WHERE EXISTS (SELECT 1 FROM VALUES (1),(NULL) s(v) WHERE s.v = t.k)",
    "subqpin_not_exists_null_key_keeps_null_row" ->
      "SELECT k FROM VALUES (CAST(NULL AS INT)),(1) t(k) WHERE NOT EXISTS (SELECT 1 FROM VALUES (1),(NULL) s(v) WHERE s.v = t.k)",
    "subqpin_scalar_struct" -> "SELECT (SELECT struct(1 AS a, 'x' AS b))",
    "subqpin_in_type_coercion" ->
      "SELECT k FROM VALUES ('1'),('2') t(k) WHERE k IN (SELECT v FROM VALUES (1) s(v))",
    "subqpin_correlated_limit_one" ->
      "SELECT k, (SELECT v FROM VALUES (1,'a'),(2,'b') s(v, w) WHERE s.v = t.k LIMIT 1) AS c FROM VALUES (1),(3) t(k) ORDER BY k",
    "subqpin_correlated_orderby_limit" ->
      "SELECT k, (SELECT w FROM VALUES (1,'z'),(1,'a'),(2,'b') s(v, w) WHERE s.v = t.k ORDER BY w LIMIT 1) AS c FROM VALUES (1),(2) t(k) ORDER BY k",
    "subqpin_exists_with_having_agg" ->
      "SELECT k FROM VALUES (1),(2) t(k) WHERE EXISTS (SELECT max(v) FROM VALUES (1) s(v) WHERE s.v = t.k HAVING max(v) > 0)",
    "subqpin_group_by_on_scalar_output" ->
      "SELECT k, (SELECT count(*) FROM VALUES (1),(1),(2) s(v) WHERE s.v = t.k) AS c FROM VALUES (1),(2) t(k) GROUP BY k, c ORDER BY k",
    "subqpin_exists_under_or" ->
      "SELECT k FROM VALUES (1),(2),(3) t(k) WHERE k = 3 OR EXISTS (SELECT 1 FROM VALUES (1) s(v) WHERE s.v = t.k) ORDER BY k",
    "subqpin_exists_limit_zero_false" ->
      "SELECT k FROM VALUES (1) t(k) WHERE EXISTS (SELECT 1 FROM VALUES (1) s(v) LIMIT 0)",
    "subqpin_scalar_inside_aggregate" ->
      "SELECT max(k + (SELECT min(v) FROM VALUES (5),(7) s(v))) FROM VALUES (1),(2) t(k)",
    "subqpin_in_subquery_orderby_limit" ->
      "SELECT k FROM VALUES (1),(2) t(k) WHERE k IN (SELECT v FROM VALUES (2),(1) s(v) ORDER BY v DESC LIMIT 1)",
    "subqpin_scalar_under_join" ->
      "SELECT t.k, (SELECT count(*) FROM VALUES (1),(2) s(v) WHERE s.v <= t.k) AS c FROM VALUES (1),(2) t(k) JOIN VALUES (1) u(z) ON t.k >= u.z ORDER BY t.k")

  // ---- wave 11b: char/varchar padding semantics (round-10 verdict
  // item 5; the reference runs Spark's char/varchar suites). The
  // LOAD-BEARING asymmetries: a CHAR(n) TABLE COLUMN reads back
  // space-padded to n and comparisons against STRING literals pad the
  // literal — but string-function, LIKE and cross-relation JOIN
  // semantics see the raw padded value; expression-level CAST to
  // CHAR/VARCHAR neither pads nor truncates; VARCHAR trims trailing
  // spaces to fit on write but never pads a comparison.
  private var charTableReady = false
  private def ensureCharTable(): Unit = synchronized {
    if (!charTableReady) {
      spark.sql("DROP TABLE IF EXISTS charpin_t")
      spark.sql("CREATE TABLE charpin_t (c CHAR(5), v VARCHAR(5)) USING parquet")
      spark.sql("INSERT INTO charpin_t VALUES ('ab', 'ab'), (NULL, NULL)")
      // 'abc   ' is OVER the VARCHAR(5) limit but only in trailing
      // spaces: the write trims to fit instead of raising
      spark.sql("INSERT INTO charpin_t VALUES ('abcde', 'abc   ')")
      charTableReady = true
    }
  }
  private def renderChar(sql: String): String = { ensureCharTable(); render(sql) }
  private val charPinned: Seq[(String, String)] = Seq(
    "charpin_read_pads_to_width" ->
      "SELECT c, length(c) FROM charpin_t WHERE c IS NOT NULL ORDER BY c",
    "charpin_varchar_write_trims_trailing_to_fit" ->
      "SELECT v, length(v) FROM charpin_t WHERE v IS NOT NULL ORDER BY v",
    "charpin_eq_string_literal_pads_literal" ->
      "SELECT c = 'ab', c = 'ab   ' FROM charpin_t WHERE rtrim(c) = 'ab'",
    "charpin_varchar_eq_never_pads" ->
      "SELECT v = 'abc', v = 'abc  ' FROM charpin_t WHERE rtrim(v) = 'abc'",
    "charpin_group_by_padded_key" ->
      "SELECT c, count(*) FROM charpin_t WHERE c IS NOT NULL GROUP BY c ORDER BY c",
    "charpin_distinct_padded" ->
      "SELECT DISTINCT c FROM charpin_t WHERE rtrim(c) = 'ab'",
    "charpin_concat_keeps_padding" ->
      "SELECT concat(c, 'X'), concat(v, 'X') FROM charpin_t WHERE rtrim(c) = 'ab'",
    "charpin_like_sees_padding" ->
      "SELECT c LIKE 'ab', c LIKE 'ab%', c LIKE 'ab   ' FROM charpin_t WHERE rtrim(c) = 'ab'",
    // literal padding is a COMPARISON-WITH-LITERAL rule, not a join
    // rule: the same 'ab' arriving through a relation does NOT pad, so
    // the join finds nothing
    "charpin_join_with_relation_literal_no_pad" ->
      "SELECT a.c FROM charpin_t a JOIN (SELECT 'ab' AS k) b ON a.c = b.k",
    "charpin_join_char_char_matches" ->
      "SELECT a.c FROM charpin_t a JOIN charpin_t b ON a.c = b.c WHERE a.v = 'ab'",
    "charpin_in_list_pads_literals" ->
      "SELECT count(*) FROM charpin_t WHERE c IN ('ab', 'zz')",
    "charpin_between_pads_bounds" ->
      "SELECT count(*) FROM charpin_t WHERE c BETWEEN 'aa' AND 'ac'",
    "charpin_substr_sees_pad_chars" ->
      "SELECT substr(c, 1, 3), length(substr(c, 1, 3)) FROM charpin_t WHERE rtrim(c) = 'ab'",
    "charpin_upper_preserves_padding" ->
      "SELECT upper(c), length(upper(c)) FROM charpin_t WHERE rtrim(c) = 'ab'",
    "charpin_cast_to_string_keeps_pad" ->
      "SELECT CAST(c AS STRING), length(CAST(c AS STRING)) FROM charpin_t WHERE rtrim(c) = 'ab'",
    "charpin_cast_col_to_shorter_varchar_no_trunc" ->
      "SELECT CAST(c AS VARCHAR(2)) FROM charpin_t WHERE rtrim(c) = 'ab'",
    "charpin_order_by_padded" ->
      "SELECT c FROM charpin_t WHERE c IS NOT NULL ORDER BY c",
    "charpin_union_char_varchar_widens_to_string" ->
      "SELECT x, length(x) FROM (SELECT c AS x FROM charpin_t UNION ALL SELECT v FROM charpin_t) WHERE x IS NOT NULL ORDER BY x, length(x)",
    "charpin_rpad_idempotent_on_char" ->
      "SELECT rpad(c, 5) = c FROM charpin_t WHERE c IS NOT NULL ORDER BY c",
    "charpin_null_roundtrip" ->
      "SELECT c, v FROM charpin_t WHERE c IS NULL",
    "charpin_trim_removes_padding" ->
      "SELECT count(*) FROM charpin_t WHERE trim(c) = 'ab'",
    "charpin_min_max_padded" ->
      "SELECT min(c), max(c), length(min(c)) FROM charpin_t",
    // expression-level casts: no pad, no truncation — char/varchar
    // width is enforced on TABLE WRITES only
    "charpin_cast_literal_char_no_pad" ->
      "SELECT CAST('a' AS CHAR(3)), length(CAST('a' AS CHAR(3)))",
    "charpin_cast_literal_char_no_trunc" ->
      "SELECT CAST('abcd' AS CHAR(3)), length(CAST('abcd' AS CHAR(3)))",
    "charpin_cast_literal_varchar_no_trunc" ->
      "SELECT CAST('abcdef' AS VARCHAR(3)), length(CAST('abcdef' AS VARCHAR(3)))",
    "charpin_where_eq_count" ->
      "SELECT count(*) FROM charpin_t WHERE c = 'ab'")

  // ---- wave 11c: decimal aggregate overflow faces (round-10 verdict
  // item 5; GlutenDataFrameAggregateSuite's overflow coverage). Value
  // faces under ANSI-on here; the overflow→NULL/wrap faces re-render
  // under ANSI-off below; the RAISING faces are contract-pinned with
  // their exact error conditions (note there are TWO: the expression
  // path raises NUMERIC_VALUE_OUT_OF_RANGE, the grouped sum raises
  // ARITHMETIC_OVERFLOW "Overflow in sum of decimals").
  private val dec38max = "CAST(99999999999999999999999999999999999999 AS DECIMAL(38,0))"
  private val decaggPinned: Seq[(String, String)] = Seq(
    "decaggpin_try_sum_dec38_overflow_null" ->
      s"SELECT try_sum(v) FROM VALUES ($dec38max), ($dec38max) t(v)",
    "decaggpin_try_avg_dec38_overflow_null" ->
      s"SELECT try_avg(v) FROM VALUES ($dec38max), ($dec38max) t(v)",
    "decaggpin_try_sum_long_overflow_null" ->
      "SELECT try_sum(v) FROM VALUES (9223372036854775807L), (1L) t(v)",
    "decaggpin_try_sum_window_overflow_null" ->
      s"SELECT try_sum(v) OVER () FROM VALUES ($dec38max), ($dec38max) t(v)",
    "decaggpin_sum_widens_precision_plus10" ->
      "SELECT sum(v) FROM VALUES (CAST(1.50 AS DECIMAL(5,2))) t(v)",
    "decaggpin_avg_scale_plus4" ->
      "SELECT avg(v) FROM VALUES (CAST(1.50 AS DECIMAL(5,2))), (CAST(2.00 AS DECIMAL(5,2))) t(v)",
    "decaggpin_avg_long_is_double_no_overflow" ->
      "SELECT avg(v) FROM VALUES (9223372036854775807L), (9223372036854775807L) t(v)",
    "decaggpin_sum_distinct_dec" ->
      "SELECT sum(DISTINCT v) FROM VALUES (CAST(1.5 AS DECIMAL(5,2))), (CAST(1.5 AS DECIMAL(5,2))), (CAST(2.5 AS DECIMAL(5,2))) t(v)",
    "decaggpin_sum_empty_null_count_zero" ->
      "SELECT avg(v), sum(v), count(v) FROM VALUES (CAST(1 AS DECIMAL(5,2))) t(v) WHERE v > 100",
    "decaggpin_sum_dec38_exact_fit_no_overflow" ->
      s"SELECT sum(v) FROM VALUES ($dec38max), (CAST(-1 AS DECIMAL(38,0))) t(v)")
  // ANSI-off: aggregate overflow degrades to NULL per group (decimal)
  // or WRAPS silently (long sum — the two's-complement face), never
  // raises; rendered with the nonansi_ prefix like the interval wave
  private val decaggNonAnsiPinned: Seq[(String, String)] = Seq(
    "decaggpin_sum_dec38_overflow_null" ->
      s"SELECT sum(v) FROM VALUES ($dec38max), ($dec38max) t(v)",
    "decaggpin_avg_dec38_overflow_null" ->
      s"SELECT avg(v) FROM VALUES ($dec38max), ($dec38max) t(v)",
    "decaggpin_sum_long_overflow_wraps" ->
      "SELECT sum(v) FROM VALUES (9223372036854775807L), (1L) t(v)",
    "decaggpin_sum_groupby_overflow_null_per_group" ->
      s"SELECT k, sum(v) FROM VALUES (1, $dec38max), (1, $dec38max), (2, CAST(1 AS DECIMAL(38,0))) t(k, v) GROUP BY k ORDER BY k",
    "decaggpin_window_sum_overflow_null" ->
      s"SELECT sum(v) OVER () FROM VALUES ($dec38max), ($dec38max) t(v)",
    "decaggpin_dec_multiply_overflow_null" ->
      "SELECT CAST(99999999999999999999 AS DECIMAL(38,0)) * CAST(99999999999999999999 AS DECIMAL(38,0))",
    "decaggpin_avg_long_is_double_both_modes" ->
      "SELECT avg(v) FROM VALUES (9223372036854775807L), (9223372036854775807L) t(v)")

  // raising contracts for waves 11a/11c (exact error conditions; the
  // analysis errors raise in BOTH ansi modes, the decimal-agg overflow
  // raising is ANSI-gated — its ANSI-off twins are value-pinned above)
  private val wave11Errors: Seq[(String, String, String)] = Seq(
    ("subqpin_outer_ref_two_levels_errors",
      "SELECT k FROM VALUES (1),(2) t(k) WHERE EXISTS (SELECT 1 FROM VALUES (1),(2) s(v) WHERE EXISTS (SELECT 1 FROM VALUES (1) u(w) WHERE u.w = t.k))",
      "UNRESOLVED_COLUMN"),
    ("subqpin_scalar_multi_column_errors",
      "SELECT (SELECT v, w FROM VALUES (1, 2) s(v, w))",
      "SCALAR_SUBQUERY_RETURN_MORE_THAN_ONE_OUTPUT_COLUMN"),
    ("subqpin_agg_mixing_outer_and_local_refs_errors",
      "SELECT k, (SELECT sum(v + t.k) FROM VALUES (1),(2) s(v)) FROM VALUES (10),(20) t(k)",
      "AGGREGATE_FUNCTION_MIXED_OUTER_LOCAL_REFERENCES"),
    ("decaggpin_sum_dec38_overflow_errors",
      s"SELECT sum(v) FROM VALUES ($dec38max), ($dec38max) t(v)",
      "NUMERIC_VALUE_OUT_OF_RANGE"),
    ("decaggpin_sum_groupby_overflow_errors",
      s"SELECT k, sum(v) FROM VALUES (1, $dec38max), (1, $dec38max) t(k, v) GROUP BY k",
      "ARITHMETIC_OVERFLOW"),
    ("decaggpin_sum_long_overflow_errors",
      "SELECT sum(v) FROM VALUES (9223372036854775807L), (1L) t(v)",
      "ARITHMETIC_OVERFLOW"),
    ("decaggpin_avg_dec38_overflow_errors",
      s"SELECT avg(v) FROM VALUES ($dec38max), ($dec38max) t(v)",
      "NUMERIC_VALUE_OUT_OF_RANGE"),
    ("decaggpin_sum_distinct_overflow_errors",
      s"SELECT sum(DISTINCT v) FROM VALUES ($dec38max), (CAST(89999999999999999999999999999999999999 AS DECIMAL(38,0))) t(v)",
      "ARITHMETIC_OVERFLOW"),
    ("decaggpin_window_sum_overflow_errors",
      s"SELECT sum(v) OVER () FROM VALUES ($dec38max), ($dec38max) t(v)",
      "NUMERIC_VALUE_OUT_OF_RANGE"))

  private val apiPinned: Seq[(String, org.apache.spark.sql.SparkSession =>
      org.apache.spark.sql.DataFrame)] = {
    import org.apache.spark.sql.{functions => F}
    val base: Seq[(String, org.apache.spark.sql.SparkSession =>
        org.apache.spark.sql.DataFrame)] = Seq(
      ("dfapi_union_by_name_reorders", s => {
        import s.implicits._
        val a = Seq((1, "x")).toDF("id", "v")
        val b = Seq(("y", 2)).toDF("v", "id")
        a.unionByName(b).orderBy("id")
      }),
      ("dfapi_union_by_name_allow_missing_nulls", s => {
        import s.implicits._
        val a = Seq((1, "x")).toDF("id", "v")
        val b = Seq(2).toDF("id")
        a.unionByName(b, allowMissingColumns = true).orderBy("id")
      }),
      ("dfapi_except_all_keeps_multiplicity", s => {
        import s.implicits._
        Seq(1, 1, 1, 2).toDF("v")
          .exceptAll(Seq(1).toDF("v")).orderBy("v")
      }),
      ("dfapi_intersect_all_min_multiplicity", s => {
        import s.implicits._
        Seq(1, 1, 2).toDF("v")
          .intersectAll(Seq(1, 1, 1).toDF("v")).orderBy("v")
      }),
      ("dfapi_drop_duplicates_subset", s => {
        import s.implicits._
        // duplicate rows are FULLY identical so the kept row is unique
        Seq((1, "a"), (1, "a"), (2, "b")).toDF("k", "v")
          .dropDuplicates("k").orderBy("k")
      }),
      ("dfapi_na_fill_per_column_map", s => {
        import s.implicits._
        Seq((Some(1), Option.empty[String]), (None, Some("x")))
          .toDF("i", "s").na.fill(Map("i" -> -1, "s" -> "?")).orderBy("i")
      }),
      ("dfapi_na_drop_how_all", s => {
        import s.implicits._
        Seq((Option.empty[Int], Option.empty[Int]), (Some(1), Option.empty[Int]))
          .toDF("a", "b").na.drop("all").orderBy("a")
      }),
      ("dfapi_na_drop_thresh", s => {
        import s.implicits._
        Seq((Some(1), Some(2), Option.empty[Int]), (Some(1), None, None))
          .toDF("a", "b", "c").na.drop(2).orderBy("a")
      }),
      ("dfapi_na_replace_values", s => {
        import s.implicits._
        Seq("unknown", "ok").toDF("v")
          .na.replace("v", Map("unknown" -> "?")).orderBy("v")
      }),
      ("dfapi_with_columns_renamed", s => {
        import s.implicits._
        Seq((1, 2)).toDF("a", "b")
          .withColumnsRenamed(Map("a" -> "x", "b" -> "y"))
      }),
      ("dfapi_with_column_replaces_existing", s => {
        import s.implicits._
        Seq(1).toDF("v").withColumn("v", F.col("v") * 10)
      }),
      ("dfapi_drop_missing_column_noop", s => {
        import s.implicits._
        Seq(1).toDF("v").drop("no_such_col")
      }),
      ("dfapi_unpivot_melt", s => {
        import s.implicits._
        Seq((1, 10.0, 20.0)).toDF("id", "m1", "m2")
          .unpivot(Array(F.col("id")), Array(F.col("m1"), F.col("m2")),
            "metric", "value").orderBy("metric")
      }),
      ("dfapi_pivot_explicit_values", s => {
        import s.implicits._
        Seq(("a", "x", 1), ("a", "y", 2), ("b", "x", 3)).toDF("k", "p", "v")
          .groupBy("k").pivot("p", Seq("x", "y")).sum("v").orderBy("k")
      }),
      ("dfapi_stat_corr_pearson", s => {
        import s.implicits._
        val df = Seq((1.0, 2.0), (2.0, 4.0), (3.0, 6.0)).toDF("x", "y")
        Seq(df.stat.corr("x", "y")).toDF("corr")
      }),
      ("dfapi_stat_cov_sample", s => {
        import s.implicits._
        val df = Seq((1.0, 2.0), (2.0, 4.0), (3.0, 6.0)).toDF("x", "y")
        Seq(df.stat.cov("x", "y")).toDF("cov")
      }),
      ("dfapi_crosstab_counts", s => {
        import s.implicits._
        Seq(("a", 1), ("a", 1), ("b", 2)).toDF("k", "v")
          .stat.crosstab("k", "v").orderBy("k_v")
      }),
      ("dfapi_describe_stats", s => {
        import s.implicits._
        Seq(1, 2, 3).toDF("v").describe("v").orderBy("summary")
      }),
      ("dfapi_summary_percentiles", s => {
        import s.implicits._
        Seq(1, 2, 3, 4).toDF("v").summary("min", "25%", "50%", "max")
          .orderBy("summary")
      }),
      ("dfapi_col_regex_select", s => {
        import s.implicits._
        val df = Seq((1, 2, 3)).toDF("ab1", "ab2", "cd")
        df.select(df.colRegex("`ab.*`"))
      }),
      ("dfapi_typed_map_filter_groupby", s => {
        import s.implicits._
        Seq(1, 2, 3, 4).toDS()
          .filter(_ % 2 == 0).map(_ * 10)
          .groupByKey(_ => "all").count().toDF("k", "n")
      }),
      ("dfapi_to_json_struct", s => {
        import s.implicits._
        Seq((1, "a")).toDF("id", "v")
          .select(F.to_json(F.struct(F.col("id"), F.col("v"))).as("js"))
      }),
      ("dfapi_from_json_schema", s => {
        import s.implicits._
        Seq("""{"a": 5, "b": "x"}""").toDF("js")
          .select(F.from_json(F.col("js"),
            org.apache.spark.sql.types.StructType.fromDDL("a INT, b STRING")).as("st"))
          .select("st.a", "st.b")
      }),
      ("dfapi_select_expr_struct_star", s => {
        import s.implicits._
        Seq((1, 2)).toDF("a", "b").selectExpr("struct(*) AS st")
          .select("st.*")
      }),
      ("dfapi_rollup_api_counts", s => {
        import s.implicits._
        Seq(("a", 1), ("a", 2), ("b", 3)).toDF("k", "v")
          .rollup("k").count().orderBy(F.col("k").asc_nulls_first)
      }),
      ("dfapi_cube_api_counts", s => {
        import s.implicits._
        Seq(("a", 1), ("b", 1)).toDF("k", "g")
          .cube("k", "g").count()
          .orderBy(F.col("k").asc_nulls_first, F.col("g").asc_nulls_first)
      }),
      ("dfapi_agg_map_form", s => {
        import s.implicits._
        Seq((1, 10), (2, 20)).toDF("k", "v")
          .agg(Map("v" -> "sum", "k" -> "max"))
      }),
      ("dfapi_sample_by_stratified_seed", s => {
        import s.implicits._
        // fractions 0 and 1 make stratified sampling deterministic at any
        // partitioning: keep every 'a', drop every 'b'
        Seq(("a", 1), ("a", 2), ("b", 3)).toDF("k", "v")
          .stat.sampleBy("k", Map("a" -> 1.0, "b" -> 0.0), 42L).orderBy("v")
      }),
      ("dfapi_freq_items_single_dominant", s => {
        import s.implicits._
        // one value >75% support: the sketch must report it regardless of
        // partition layout; render sorted for stability
        Seq(7, 7, 7, 7, 7, 7, 7, 1).toDF("v")
          .stat.freqItems(Array("v"), 0.75)
          .select(F.array_sort(F.col("v_freqItems")).as("items"))
      }),
      ("dfapi_offset_then_limit", s => {
        import s.implicits._
        Seq(1, 2, 3, 4, 5).toDF("v").orderBy("v").offset(2).limit(2)
      }))
    // wave 9b file-source faces: DROPMALFORMED and multiLine exist only
    // on the file reader (from_json/from_csv reject DROPMALFORMED), and
    // columnNameOfCorruptRecord interacts with schema pruning only
    // there. Files are (re)written deterministically per run under
    // target/; results are ordered so the pin is partition-stable.
    val parseModeFiles: Seq[(String, org.apache.spark.sql.SparkSession =>
        org.apache.spark.sql.DataFrame)] = {
      import java.nio.file.{Files => JFiles, Paths => JPaths}
      def writeFile(name: String, content: String): String = {
        val dir = JPaths.get("target", "parse_mode_pins")
        JFiles.createDirectories(dir)
        val p = dir.resolve(name)
        JFiles.write(p, content.getBytes("UTF-8"))
        p.toString
      }
      Seq(
        ("csvmodepin_read_dropmalformed_keeps_good_rows", s => {
          val p = writeFile("drop.csv", "1,a\nbad_row_only_one_field_no_int\n3,c\n")
          s.read.schema("id INT, v STRING").option("mode", "DROPMALFORMED")
            .csv(p).orderBy("id")
        }),
        ("csvmodepin_read_permissive_corrupt_column_captures_raw", s => {
          val p = writeFile("corrupt.csv", "1,a\nx,y\n3,c\n")
          s.read.schema("id INT, v STRING, _corrupt_record STRING").csv(p)
            .orderBy(F.col("id").asc_nulls_last)
        }),
        ("csvmodepin_read_multiline_quoted_newline", s => {
          val p = writeFile("multi.csv", "1,\"line1\nline2\"\n2,plain\n")
          // fold the embedded newline before rendering: the golden file
          // is line-per-pin, a raw \n in the value would split the entry
          s.read.schema("id INT, v STRING").option("multiLine", "true")
            .csv(p).select(F.col("id"), F.regexp_replace(F.col("v"), "\n", "<NL>").as("v"))
            .orderBy("id")
        }),
        ("csvmodepin_read_header_and_custom_null", s => {
          val p = writeFile("hdr.csv", "id,v\n1,NA\n2,x\n")
          s.read.schema("id INT, v STRING").option("header", "true")
            .option("nullValue", "NA").csv(p).orderBy("id")
        }),
        ("jsonmodepin_read_dropmalformed_keeps_good_rows", s => {
          val p = writeFile("drop.json", "{\"id\": 1}\n{bad\n{\"id\": 3}\n")
          s.read.schema("id INT").option("mode", "DROPMALFORMED")
            .json(p).orderBy("id")
        }),
        ("jsonmodepin_read_permissive_corrupt_column_captures_raw", s => {
          val p = writeFile("corrupt.json", "{\"id\": 1}\n{bad\n")
          s.read.schema("id INT, _corrupt_record STRING").json(p)
            .orderBy(F.col("id").asc_nulls_last)
        }),
        ("jsonmodepin_read_multiline_array_document", s => {
          val p = writeFile("multi.json", "[\n  {\"id\": 1},\n  {\"id\": 2}\n]\n")
          s.read.schema("id INT").option("multiLine", "true").json(p).orderBy("id")
        }),
        ("jsonmodepin_read_corrupt_column_requires_full_row_select", s => {
          // selecting ONLY the corrupt column alongside a data column is
          // the documented way to observe malformed rows; pin the shape
          val p = writeFile("mixed.json", "{\"id\": 1, \"v\": \"a\"}\nnot json\n")
          s.read.schema("id INT, v STRING, _corrupt_record STRING").json(p)
            .select("id", "v", "_corrupt_record")
            .orderBy(F.col("id").asc_nulls_last)
        }))
    }
    base ++ dsv2Pinned ++ encoderPinned ++ parseModeFiles ++ pqPinned ++ wrPinned
  }

  // ---- wave 12: parquet read-path pins (VERDICT r11 item 3 — the
  // ~35 GlutenParquet* file-source suites the reference enables in
  // gluten-ut/spark35/.../velox/VeloxTestSettings.scala:
  // GlutenParquetV1FilterSuite, GlutenParquetV1SchemaPruningSuite,
  // GlutenParquetV1PartitionDiscoverySuite,
  // GlutenParquetRebaseDatetimeV1Suite,
  // GlutenParquetFileMetadataStructRowIndexSuite,
  // GlutenParquetFieldIdIOSuite, …). Each pin writes a DETERMINISTIC
  // little parquet layout under /tmp/graft_pqpin (once per JVM) and
  // golden-pins what a read through the graft session returns:
  // pushdown corners (typed predicates, nested fields, missing
  // columns under schema merge, partition×data interaction), V1
  // partition discovery (type inference, mixed types,
  // __HIVE_DEFAULT_PARTITION__, basePath, escaping), the _metadata
  // struct (schema, row_index values, per-file restart — value pins
  // avoid the nondeterministic path/size/mtime fields, which are
  // asserted as booleans), and LEGACY/CORRECTED datetime rebase
  // round-trips. Plan-shape assertions (PushedFilters content,
  // pruned ReadSchema, partition pruning) live in SourcesSpec —
  // golden pins carry VALUES.
  private val pqBase = "/tmp/graft_pqpin"
  private var pqBuilt = false
  private def pqFix(s: org.apache.spark.sql.SparkSession): Unit = synchronized {
    if (!pqBuilt) {
      import org.apache.spark.sql.{functions => F, Row}
      import org.apache.spark.sql.types._
      import scala.jdk.CollectionConverters._
      // flat: ONE file (coalesce 1) so row_index is globally stable
      val flatSchema = StructType(Seq(
        StructField("id", LongType, nullable = false),
        StructField("v", IntegerType), StructField("s", StringType),
        StructField("d", DateType), StructField("ts", TimestampType),
        StructField("dec", DecimalType(10, 2)), StructField("b", BooleanType),
        StructField("f", FloatType), StructField("sh", ShortType),
        StructField("arr", ArrayType(IntegerType)),
        StructField("m", MapType(StringType, IntegerType))))
      def dt(x: String) = java.sql.Date.valueOf(x)
      def ts(x: String) = java.sql.Timestamp.valueOf(x)
      def bd(x: String) = new java.math.BigDecimal(x)
      val flatRows = Seq(
        Row(1L, 10, "alpha", dt("2020-01-01"), ts("2020-01-01 00:00:01"), bd("12.34"),
          true, 1.5f, 7.toShort, Seq(1, 2), Map("a" -> 1)),
        Row(2L, 20, "beta", dt("2020-06-15"), ts("2020-06-15 12:00:00"), bd("0.05"),
          false, Float.NaN, 8.toShort, Seq(3), Map("b" -> 2)),
        Row(3L, null, null, null, null, null, null, null, null, null, null),
        Row(4L, 40, "alphabet", dt("2021-01-01"), ts("2021-01-01 23:59:59"), bd("99999999.99"),
          true, -0.0f, 9.toShort, Seq.empty[Int], Map.empty[String, Int]),
        Row(5L, 50, "gamma", dt("2022-02-28"), ts("2022-02-28 06:30:00"), bd("-1.00"),
          false, 2.25f, 10.toShort, Seq(4, 5, 6), Map("c" -> 3)))
      s.createDataFrame(flatRows.asJava, flatSchema)
        .coalesce(1).write.mode("overwrite").parquet(s"$pqBase/flat")
      // nested: struct-in-struct + array-of-struct (schema pruning faces)
      val nestedSchema = StructType(Seq(
        StructField("id", LongType, nullable = false),
        StructField("person", StructType(Seq(
          StructField("name", StringType), StructField("age", IntegerType),
          StructField("addr", StructType(Seq(
            StructField("city", StringType), StructField("zip", StringType))))))),
        StructField("contacts", ArrayType(StructType(Seq(
          StructField("kind", StringType), StructField("value", StringType)))))))
      val nestedRows = Seq(
        Row(1L, Row("ann", 34, Row("oslo", "0150")), Seq(Row("mail", "a@x"))),
        Row(2L, Row("bob", 28, Row("rome", "00100")), Seq(Row("tel", "1"), Row("mail", "b@x"))),
        Row(3L, Row("cid", null, Row(null, "777")), Seq.empty[Row]),
        Row(4L, null, null))
      s.createDataFrame(nestedRows.asJava, nestedSchema)
        .coalesce(1).write.mode("overwrite").parquet(s"$pqBase/nested")
      // parts: int-valued partition col + a NULL partition
      import s.implicits._
      Seq((1L, Some(1), "x"), (2L, Some(1), "y"), (3L, Some(2), "z"), (4L, None, "w"))
        .toDF("id", "p", "v")
        .write.mode("overwrite").partitionBy("p").parquet(s"$pqBase/parts")
      // mixedparts: "1" and "abc" partition dirs → inference falls to string
      Seq((1L, "1"), (2L, "abc")).toDF("id", "p")
        .write.mode("overwrite").partitionBy("p").parquet(s"$pqBase/mixedparts")
      // dateparts: ISO-date partition values → inferred DATE
      Seq((1L, "2020-01-01"), (2L, "2020-06-01")).toDF("id", "p")
        .write.mode("overwrite").partitionBy("p").parquet(s"$pqBase/dateparts")
      // twolevel: country=…/city=… nested discovery
      Seq((1L, "no", "oslo"), (2L, "no", "bergen"), (3L, "it", "rome"))
        .toDF("id", "country", "city")
        .write.mode("overwrite").partitionBy("country", "city").parquet(s"$pqBase/twolevel")
      // escparts: partition value needing URL escaping in the dir name
      Seq((1L, "a b"), (2L, "c/d")).toDF("id", "p")
        .write.mode("overwrite").partitionBy("p").parquet(s"$pqBase/escparts")
      // evo: two files with DIFFERENT schemas in one directory
      Seq((1L, 10), (2L, 20)).toDF("id", "a")
        .coalesce(1).write.mode("overwrite").parquet(s"$pqBase/evo")
      Seq((3L, 30, "x"), (4L, 40, "y")).toDF("id", "a", "b")
        .coalesce(1).write.mode("append").parquet(s"$pqBase/evo")
      // rebase: ancient dates/timestamps under LEGACY vs CORRECTED write
      def withWriteConf(pairs: (String, String)*)(body: => Unit): Unit = {
        val origs = pairs.map { case (k, _) => k -> s.conf.getOption(k) }
        pairs.foreach { case (k, v) => s.conf.set(k, v) }
        try body finally origs.foreach { case (k, o) =>
          o.fold(s.conf.unset(k))(s.conf.set(k, _)) }
      }
      val ancient = Seq(
        (1L, dt("1500-03-01"), ts("1500-03-01 12:00:00")),
        (2L, dt("1582-10-04"), ts("1582-10-04 00:00:00")),
        (3L, dt("2020-01-01"), ts("2020-01-01 00:00:00")))
        .toDF("id", "d", "ts")
      withWriteConf(
        "spark.sql.parquet.datetimeRebaseModeInWrite" -> "LEGACY") {
        ancient.coalesce(1).write.mode("overwrite").parquet(s"$pqBase/rebase_legacy")
      }
      withWriteConf(
        "spark.sql.parquet.datetimeRebaseModeInWrite" -> "CORRECTED") {
        ancient.coalesce(1).write.mode("overwrite").parquet(s"$pqBase/rebase_corrected")
      }
      withWriteConf(
        "spark.sql.parquet.outputTimestampType" -> "INT96",
        "spark.sql.parquet.int96RebaseModeInWrite" -> "LEGACY") {
        ancient.select($"id", $"ts").coalesce(1)
          .write.mode("overwrite").parquet(s"$pqBase/rebase_int96")
      }
      // ntz: TIMESTAMP_NTZ physical round-trip
      s.sql("SELECT 1L AS id, TIMESTAMP_NTZ '2020-03-01 07:00:00' AS tn")
        .coalesce(1).write.mode("overwrite").parquet(s"$pqBase/ntz")
      // ---- wave 12b: the SAME logical fixtures as ORC (the
      // GlutenOrc* read-path suites mirror the parquet family) plus
      // CSV/JSON read-schema-evolution files (*ReadSchemaSuite)
      s.createDataFrame(flatRows.asJava, flatSchema)
        .coalesce(1).write.mode("overwrite").orc(s"$pqBase/orc_flat")
      s.createDataFrame(nestedRows.asJava, nestedSchema)
        .coalesce(1).write.mode("overwrite").orc(s"$pqBase/orc_nested")
      Seq((1L, Some(1), "x"), (2L, Some(1), "y"), (3L, Some(2), "z"), (4L, None, "w"))
        .toDF("id", "p", "v")
        .write.mode("overwrite").partitionBy("p").orc(s"$pqBase/orc_parts")
      Seq((1L, 10), (2L, 20)).toDF("id", "a")
        .coalesce(1).write.mode("overwrite").orc(s"$pqBase/orc_evo")
      Seq((3L, 30, "x"), (4L, 40, "y")).toDF("id", "a", "b")
        .coalesce(1).write.mode("append").orc(s"$pqBase/orc_evo")
      // csv evolution: same header width, a SHORT row, and a second
      // file with an extra trailing column
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$pqBase/csv_evo"))
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$pqBase/csv_evo/a.csv"),
        "id,a\n1,10\n2\n")
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$pqBase/csv_evo/b.csv"),
        "id,a,b\n3,30,x\n")
      // json evolution: int-vs-long widths, missing and extra fields,
      // nested subfield present in only one document
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$pqBase/evo.json"),
        """{"id": 1, "a": 10, "nest": {"x": 1}}
          |{"id": 2147483648, "a": 20, "extra": "ignored"}
          |{"id": 3, "nest": {"x": 2, "y": "only-here"}}
          |""".stripMargin)
      pqBuilt = true
    }
  }

  // lazy: referenced from apiPinned, which is declared earlier in the
  // class body (a strict val here would still be null at that point)
  private lazy val pqPinned: Seq[(String, org.apache.spark.sql.SparkSession =>
      org.apache.spark.sql.DataFrame)] = {
    import org.apache.spark.sql.{functions => F}
    def rd(s: org.apache.spark.sql.SparkSession, sub: String) = {
      pqFix(s); s.read.parquet(s"$pqBase/$sub")
    }
    def ro(s: org.apache.spark.sql.SparkSession, sub: String) = {
      pqFix(s); s.read.orc(s"$pqBase/$sub")
    }
    Seq(
      // -- GlutenParquetV1FilterSuite faces: typed predicate pushdown --
      ("pqpin_filter_long_eq", s => rd(s, "flat").filter(F.col("id") === 2L).select("id", "v")),
      ("pqpin_filter_int_lt", s =>
        rd(s, "flat").filter(F.col("v") < 30).select("id", "v").orderBy("id")),
      ("pqpin_filter_int_between", s =>
        rd(s, "flat").filter(F.col("v").between(20, 45)).select("id", "v").orderBy("id")),
      ("pqpin_filter_date_gt", s =>
        rd(s, "flat").filter(F.col("d") > F.lit("2020-06-01").cast("date"))
          .select("id", "d").orderBy("id")),
      ("pqpin_filter_ts_range", s =>
        rd(s, "flat").filter(F.col("ts") >= F.lit("2020-06-15 00:00:00").cast("timestamp") &&
          F.col("ts") < F.lit("2021-06-01 00:00:00").cast("timestamp"))
          .select("id", "ts").orderBy("id")),
      ("pqpin_filter_decimal_ge", s =>
        rd(s, "flat").filter(F.col("dec") >= F.lit("12.34").cast("decimal(10,2)"))
          .select("id", "dec").orderBy("id")),
      ("pqpin_filter_decimal_eq_exact", s =>
        rd(s, "flat").filter(F.col("dec") === F.lit("0.05").cast("decimal(10,2)"))
          .select("id", "dec")),
      ("pqpin_filter_string_startswith", s =>
        rd(s, "flat").filter(F.col("s").startsWith("alpha")).select("id", "s").orderBy("id")),
      ("pqpin_filter_string_endswith", s =>
        rd(s, "flat").filter(F.col("s").endsWith("bet")).select("id", "s")),
      ("pqpin_filter_string_contains", s =>
        rd(s, "flat").filter(F.col("s").contains("amm")).select("id", "s")),
      ("pqpin_filter_in_set", s =>
        rd(s, "flat").filter(F.col("v").isin(10, 50, 99)).select("id", "v").orderBy("id")),
      ("pqpin_filter_isnull", s =>
        rd(s, "flat").filter(F.col("v").isNull).select("id", "v")),
      ("pqpin_filter_isnotnull", s =>
        rd(s, "flat").filter(F.col("s").isNotNull).select(F.count(F.lit(1)).as("n"))),
      ("pqpin_filter_not_predicate", s =>
        rd(s, "flat").filter(!(F.col("v") > 20)).select("id", "v").orderBy("id")),
      ("pqpin_filter_and_or_mix", s =>
        rd(s, "flat").filter((F.col("v") === 10 || F.col("v") === 50) && F.col("b") === false)
          .select("id", "v", "b").orderBy("id")),
      ("pqpin_filter_boolean_eq", s =>
        rd(s, "flat").filter(F.col("b") === true).select("id", "b").orderBy("id")),
      ("pqpin_filter_null_never_matches_eq", s =>
        rd(s, "flat").filter(F.col("v") === 10 || F.col("v").isNull)
          .select("id", "v").orderBy("id")),
      // NaN semantics through the parquet scan: = NaN matches NaN rows
      // (Spark's NaN-normalized equality), and NaN sorts ABOVE +inf
      ("pqpin_filter_float_nan_eq", s =>
        rd(s, "flat").filter(F.col("f") === F.lit(Float.NaN)).select("id", "f")),
      ("pqpin_sort_float_nan_greatest", s =>
        rd(s, "flat").filter(F.col("f").isNotNull).select("id", "f")
          .orderBy(F.col("f").desc).limit(1)),
      ("pqpin_filter_negative_zero_eq_positive", s =>
        rd(s, "flat").filter(F.col("f") === 0.0f).select("id", "f")),
      ("pqpin_short_type_roundtrip", s =>
        rd(s, "flat").filter(F.col("sh") === 8.toShort).select("id", "sh")),
      ("pqpin_array_column_roundtrip", s =>
        rd(s, "flat").filter(F.size(F.col("arr")) >= 2).select("id", "arr").orderBy("id")),
      ("pqpin_map_column_roundtrip", s =>
        rd(s, "flat").filter(F.col("id") === 5L).select("id", "m")),
      ("pqpin_empty_array_vs_null", s =>
        rd(s, "flat").select(F.col("id"), F.col("arr").isNull.as("arr_null"),
          F.size(F.col("arr")).as("sz")).orderBy("id")),
      // -- GlutenParquetV1SchemaPruningSuite faces: nested access ------
      ("pqpin_nested_field_select", s =>
        rd(s, "nested").select(F.col("id"), F.col("person.name")).orderBy("id")),
      ("pqpin_nested_deep_select", s =>
        rd(s, "nested").select(F.col("id"), F.col("person.addr.city")).orderBy("id")),
      ("pqpin_nested_field_filter", s =>
        rd(s, "nested").filter(F.col("person.age") > 30)
          .select(F.col("id"), F.col("person.age"))),
      ("pqpin_nested_field_isnull_struct", s =>
        rd(s, "nested").filter(F.col("person").isNull).select("id")),
      ("pqpin_nested_inner_null_outer_present", s =>
        rd(s, "nested").filter(F.col("person.addr.city").isNull && F.col("person").isNotNull)
          .select(F.col("id"), F.col("person.addr.zip"))),
      ("pqpin_nested_array_of_struct_explode", s =>
        rd(s, "nested").select(F.col("id"), F.explode(F.col("contacts")).as("c"))
          .select(F.col("id"), F.col("c.kind"), F.col("c.value")).orderBy("id", "kind")),
      // -- schema evolution / merge ------------------------------------
      ("pqpin_evo_merge_schema_union", s => {
        pqFix(s)
        s.read.option("mergeSchema", "true").parquet(s"$pqBase/evo").orderBy("id")
      }),
      ("pqpin_evo_missing_col_isnull", s => {
        pqFix(s)
        s.read.option("mergeSchema", "true").parquet(s"$pqBase/evo")
          .filter(F.col("b").isNull).select("id", "a").orderBy("id")
      }),
      ("pqpin_evo_filter_on_missing_col", s => {
        pqFix(s)
        s.read.option("mergeSchema", "true").parquet(s"$pqBase/evo")
          .filter(F.col("b") === "y").select("id", "a", "b")
      }),
      ("pqpin_evo_user_schema_superset", s => {
        pqFix(s)
        s.read.schema("id BIGINT, a INT, b STRING, zzz DOUBLE").parquet(s"$pqBase/evo")
          .orderBy("id")
      }),
      ("pqpin_user_schema_subset_prunes", s => {
        pqFix(s)
        s.read.schema("id BIGINT, s STRING").parquet(s"$pqBase/flat").orderBy("id")
      }),
      ("pqpin_case_insensitive_column_match", s => {
        pqFix(s)
        // session default is case-insensitive resolution; "ID"/"S"
        // resolve against the file's lower-case columns
        s.read.parquet(s"$pqBase/flat").select(F.col("ID"), F.col("S")).orderBy("ID")
      }),
      // -- GlutenParquetV1PartitionDiscoverySuite faces ------------------
      ("pqpin_partdisc_int_inference", s =>
        rd(s, "parts").select(F.col("p")).distinct().orderBy(F.col("p").asc_nulls_first)),
      ("pqpin_partdisc_int_schema", s => {
        import s.implicits._
        Seq(rd(s, "parts").schema("p").dataType.simpleString).toDF("p_type")
      }),
      ("pqpin_partdisc_null_partition_read", s =>
        rd(s, "parts").filter(F.col("p").isNull).select("id", "p", "v")),
      ("pqpin_partdisc_null_partition_dirname", s => {
        import s.implicits._
        pqFix(s)
        val found = new java.io.File(s"$pqBase/parts")
          .listFiles().exists(_.getName == "p=__HIVE_DEFAULT_PARTITION__")
        Seq(found).toDF("hive_default_dir_exists")
      }),
      ("pqpin_partdisc_mixed_types_string", s => {
        import s.implicits._
        Seq(rd(s, "mixedparts").schema("p").dataType.simpleString).toDF("p_type")
      }),
      ("pqpin_partdisc_mixed_values", s =>
        rd(s, "mixedparts").select("id", "p").orderBy("id")),
      ("pqpin_partdisc_date_inference", s => {
        import s.implicits._
        Seq(rd(s, "dateparts").schema("p").dataType.simpleString).toDF("p_type")
      }),
      ("pqpin_partdisc_inference_disabled_string", s => {
        pqFix(s)
        val k = "spark.sql.sources.partitionColumnTypeInference.enabled"
        val orig = s.conf.getOption(k)
        s.conf.set(k, "false")
        try {
          import s.implicits._
          Seq(s.read.parquet(s"$pqBase/parts").schema("p").dataType.simpleString)
            .toDF("p_type")
        } finally orig.fold(s.conf.unset(k))(s.conf.set(k, _))
      }),
      ("pqpin_partdisc_two_levels", s =>
        rd(s, "twolevel").filter(F.col("country") === "no")
          .select("id", "country", "city").orderBy("id")),
      ("pqpin_partdisc_leaf_dir_loses_partition_col", s => {
        import s.implicits._
        pqFix(s)
        // reading a leaf dir directly: no partition column discovered
        val cols = s.read.parquet(s"$pqBase/parts/p=1").columns.mkString(",")
        Seq(cols).toDF("columns")
      }),
      ("pqpin_partdisc_base_path_keeps_partition_col", s => {
        pqFix(s)
        s.read.option("basePath", s"$pqBase/parts").parquet(s"$pqBase/parts/p=1")
          .select("id", "p", "v").orderBy("id")
      }),
      ("pqpin_partdisc_escaped_value_roundtrip", s =>
        rd(s, "escparts").select("id", "p").orderBy("id")),
      // -- partition × data pushdown interaction -------------------------
      ("pqpin_partfilter_only", s =>
        rd(s, "parts").filter(F.col("p") === 1).select("id", "v").orderBy("id")),
      ("pqpin_partfilter_and_data_filter", s =>
        rd(s, "parts").filter(F.col("p") === 1 && F.col("v") === "y").select("id", "p", "v")),
      ("pqpin_partfilter_in", s =>
        rd(s, "parts").filter(F.col("p").isin(1, 2)).select("id", "p").orderBy("id")),
      ("pqpin_partfilter_isnotnull", s =>
        rd(s, "parts").filter(F.col("p").isNotNull).select(F.count(F.lit(1)).as("n"))),
      ("pqpin_partcol_in_projection_only", s =>
        rd(s, "twolevel").select("country").distinct().orderBy("country")),
      // -- GlutenParquetFileMetadataStructRowIndexSuite faces -------------
      ("pqpin_meta_struct_schema", s => {
        import s.implicits._
        val t = rd(s, "flat").select(F.col("_metadata")).schema.head.dataType.simpleString
        Seq(t).toDF("metadata_type")
      }),
      ("pqpin_meta_row_index_single_file", s =>
        rd(s, "flat").select(F.col("id"), F.col("_metadata.row_index").as("ri"))
          .orderBy("id")),
      ("pqpin_meta_row_index_survives_filter", s =>
        rd(s, "flat").filter(F.col("v") > 15)
          .select(F.col("id"), F.col("_metadata.row_index").as("ri")).orderBy("id")),
      ("pqpin_meta_row_index_restarts_per_file", s => {
        import s.implicits._
        pqFix(s)
        val zeroes = s.read.parquet(s"$pqBase/evo")
          .select(F.col("_metadata.row_index").as("ri"))
          .filter(F.col("ri") === 0L).count()
        Seq(zeroes).toDF("files_with_row_zero")
      }),
      ("pqpin_meta_file_name_suffix", s =>
        rd(s, "flat").select(
          F.col("_metadata.file_name").endsWith(".parquet").as("is_parquet")).distinct()),
      ("pqpin_meta_file_path_contains_dir", s =>
        rd(s, "flat").select(
          F.col("_metadata.file_path").contains("graft_pqpin/flat").as("in_dir")).distinct()),
      ("pqpin_meta_file_size_and_mtime_present", s =>
        rd(s, "flat").select(
          (F.col("_metadata.file_size") > 0L).as("size_pos"),
          F.col("_metadata.file_modification_time").isNotNull.as("mtime_set")).distinct()),
      ("pqpin_meta_file_block_fields", s =>
        rd(s, "flat").select(
          (F.col("_metadata.file_block_start") >= 0L).as("blk_start_ok"),
          (F.col("_metadata.file_block_length") > 0L).as("blk_len_pos")).distinct()),
      // -- GlutenParquetRebaseDatetimeV1Suite faces ----------------------
      // LEGACY-written files carry the writer marker, so a plain read
      // auto-rebases back to the proleptic values — round-trip exact
      ("pqpin_rebase_legacy_write_roundtrip_date", s =>
        rd(s, "rebase_legacy").select("id", "d").orderBy("id")),
      ("pqpin_rebase_legacy_write_roundtrip_ts", s =>
        rd(s, "rebase_legacy").select("id", "ts").orderBy("id")),
      ("pqpin_rebase_corrected_write_roundtrip_date", s =>
        rd(s, "rebase_corrected").select("id", "d").orderBy("id")),
      ("pqpin_rebase_corrected_write_roundtrip_ts", s =>
        rd(s, "rebase_corrected").select("id", "ts").orderBy("id")),
      ("pqpin_rebase_legacy_vs_corrected_same_logical", s => {
        pqFix(s)
        // the two writes used DIFFERENT physical encodings of the
        // ancient dates; both reads must surface identical logical rows
        s.read.parquet(s"$pqBase/rebase_legacy").select("id", "d", "ts")
          .except(s.read.parquet(s"$pqBase/rebase_corrected").select("id", "d", "ts"))
      }),
      ("pqpin_rebase_int96_legacy_roundtrip", s =>
        rd(s, "rebase_int96").select("id", "ts").orderBy("id")),
      ("pqpin_rebase_modern_date_unaffected", s =>
        rd(s, "rebase_legacy").filter(F.col("id") === 3L).select("id", "d", "ts")),
      ("pqpin_ntz_roundtrip", s => rd(s, "ntz").select("id", "tn")),

      // ---- wave 12b: the ORC read-path twins (GlutenOrcV1FilterSuite /
      // GlutenOrcV1SchemaPruningSuite / GlutenOrcV1PartitionDiscoverySuite /
      // GlutenOrcReadSchemaSuite / GlutenOrcSourceSuite) — same logical
      // fixtures as the parquet wave, read through the ORC reader, so a
      // format-specific semantics drift (predicate handling, nulls,
      // temporal/decimal encodings, evolution) pins red on exactly the
      // face that moved
      ("orcpin_filter_long_eq", s => ro(s, "orc_flat").filter(F.col("id") === 2L).select("id", "v")),
      ("orcpin_filter_int_lt", s =>
        ro(s, "orc_flat").filter(F.col("v") < 30).select("id", "v").orderBy("id")),
      ("orcpin_filter_string_startswith", s =>
        ro(s, "orc_flat").filter(F.col("s").startsWith("alpha")).select("id", "s").orderBy("id")),
      ("orcpin_filter_in_set", s =>
        ro(s, "orc_flat").filter(F.col("v").isin(10, 50, 99)).select("id", "v").orderBy("id")),
      ("orcpin_filter_isnull", s =>
        ro(s, "orc_flat").filter(F.col("v").isNull).select("id", "v")),
      ("orcpin_filter_date_gt", s =>
        ro(s, "orc_flat").filter(F.col("d") > F.lit("2020-06-01").cast("date"))
          .select("id", "d").orderBy("id")),
      ("orcpin_filter_decimal_ge", s =>
        ro(s, "orc_flat").filter(F.col("dec") >= F.lit("12.34").cast("decimal(10,2)"))
          .select("id", "dec").orderBy("id")),
      ("orcpin_filter_boolean_eq", s =>
        ro(s, "orc_flat").filter(F.col("b") === true).select("id", "b").orderBy("id")),
      ("orcpin_filter_float_nan_eq", s =>
        ro(s, "orc_flat").filter(F.col("f") === F.lit(Float.NaN)).select("id", "f")),
      ("orcpin_temporal_roundtrip", s =>
        ro(s, "orc_flat").filter(F.col("ts").isNotNull).select("id", "d", "ts").orderBy("id")),
      ("orcpin_array_map_roundtrip", s =>
        ro(s, "orc_flat").filter(F.col("id") === 5L).select("id", "arr", "m")),
      ("orcpin_nested_field_select", s =>
        ro(s, "orc_nested").select(F.col("id"), F.col("person.addr.city")).orderBy("id")),
      ("orcpin_nested_field_filter", s =>
        ro(s, "orc_nested").filter(F.col("person.age") > 30)
          .select(F.col("id"), F.col("person.age"))),
      ("orcpin_partdisc_int_inference", s => {
        import s.implicits._
        Seq(ro(s, "orc_parts").schema("p").dataType.simpleString).toDF("p_type")
      }),
      ("orcpin_partdisc_null_partition_read", s =>
        ro(s, "orc_parts").filter(F.col("p").isNull).select("id", "p", "v")),
      ("orcpin_partfilter_and_data_filter", s =>
        ro(s, "orc_parts").filter(F.col("p") === 1 && F.col("v") === "y").select("id", "p", "v")),
      ("orcpin_evo_merge_schema_union", s => {
        pqFix(s)
        s.read.option("mergeSchema", "true").orc(s"$pqBase/orc_evo").orderBy("id")
      }),
      ("orcpin_evo_missing_col_isnull", s => {
        pqFix(s)
        s.read.option("mergeSchema", "true").orc(s"$pqBase/orc_evo")
          .filter(F.col("b").isNull).select("id", "a").orderBy("id")
      }),
      ("orcpin_user_schema_subset_prunes", s => {
        pqFix(s)
        s.read.schema("id BIGINT, s STRING").orc(s"$pqBase/orc_flat").orderBy("id")
      }),
      ("orcpin_case_insensitive_column_match", s => {
        pqFix(s)
        s.read.orc(s"$pqBase/orc_flat").select(F.col("ID"), F.col("S")).orderBy("ID")
      }),
      // ORC _metadata carries the FILE fields only — row_index is a
      // parquet-reader capability; pin the schema so that contract is
      // explicit
      ("orcpin_meta_struct_schema_no_row_index", s => {
        import s.implicits._
        val t = ro(s, "orc_flat").select(F.col("_metadata")).schema.head.dataType.simpleString
        Seq(t).toDF("metadata_type")
      }),

      // ---- wave 12b: CSV/JSON read-schema evolution faces
      // (Gluten{CSV,Header CSV,Json}ReadSchemaSuite)
      ("rspin_csv_short_row_fills_null", s => {
        pqFix(s)
        s.read.schema("id BIGINT, a INT").option("header", "true")
          .csv(s"$pqBase/csv_evo/a.csv").orderBy("id")
      }),
      ("rspin_csv_wider_user_schema_nulls", s => {
        pqFix(s)
        s.read.schema("id BIGINT, a INT, b STRING, zzz DOUBLE").option("header", "true")
          .csv(s"$pqBase/csv_evo").orderBy("id")
      }),
      ("rspin_csv_narrower_user_schema_drops_trailing", s => {
        pqFix(s)
        // positional mapping: the b.csv file's extra trailing column is
        // dropped when the user schema stops at (id, a)
        s.read.schema("id BIGINT, a INT").option("header", "true")
          .csv(s"$pqBase/csv_evo/b.csv").orderBy("id")
      }),
      ("rspin_csv_enforce_schema_ignores_header_names", s => {
        pqFix(s)
        // enforceSchema=true (the default): header names are NOT
        // matched against the user schema — mapping is positional
        s.read.schema("renamed BIGINT, other INT").option("header", "true")
          .option("enforceSchema", "true")
          .csv(s"$pqBase/csv_evo/a.csv").orderBy("renamed")
      }),
      ("rspin_json_type_widened_long", s => {
        pqFix(s)
        s.read.schema("id BIGINT, a INT").json(s"$pqBase/evo.json").orderBy("id")
      }),
      ("rspin_json_missing_field_null", s => {
        pqFix(s)
        s.read.schema("id BIGINT, a INT").json(s"$pqBase/evo.json")
          .filter(F.col("a").isNull).select("id")
      }),
      ("rspin_json_extra_fields_ignored", s => {
        pqFix(s)
        s.read.schema("id BIGINT").json(s"$pqBase/evo.json")
          .select(F.count(F.lit(1)).as("n"))
      }),
      ("rspin_json_nested_missing_subfield_null", s => {
        pqFix(s)
        s.read.schema("id BIGINT, nest STRUCT<x: INT, y: STRING>")
          .json(s"$pqBase/evo.json")
          .select(F.col("id"), F.col("nest.x"), F.col("nest.y"))
          .orderBy("id")
      }),
      ("rspin_json_inferred_schema_unions_fields", s => {
        import s.implicits._
        pqFix(s)
        Seq(s.read.json(s"$pqBase/evo.json").schema.simpleString).toDF("inferred")
      }),
      // the JSON PARSER matches schema fields against document keys
      // case-sensitively regardless of spark.sql.caseSensitive (that
      // conf governs catalyst resolution, not Jackson field lookup):
      // an upper-cased user schema reads all-NULL from lower-case docs
      ("rspin_json_schema_field_case_must_match_document", s => {
        pqFix(s)
        s.read.schema("ID BIGINT, A INT").json(s"$pqBase/evo.json").orderBy("ID")
      }))
  }

  // ---- wave 8b: typed Dataset / encoder pins (GlutenDatasetSuite /
  // ExpressionEncoderSuite faces — VERDICT r7 named typed-encoder edges
  // as a biggest-unmapped area). Each program exercises one encoder
  // derivation or typed-operator path; renderDf pins the derived
  // schema (struct/array/map/decimal/interval physical types) AND the
  // round-tripped values, so an encoder regression fails with the
  // exact drifted type or value.
  private lazy val encoderPinned: Seq[(String, org.apache.spark.sql.SparkSession =>
      org.apache.spark.sql.DataFrame)] = {
    import org.apache.spark.sql.{functions => F}
    val encBase: Seq[(String, org.apache.spark.sql.SparkSession =>
        org.apache.spark.sql.DataFrame)] = Seq(
      // product encoders: schema shape and field order
      ("encoderpin_tuple2_field_names", s => {
        import s.implicits._
        Seq((1, "a"), (2, "b")).toDS().toDF().orderBy("_1")
      }),
      ("encoderpin_tuple3_types", s => {
        import s.implicits._
        Seq((1L, 2.5, true)).toDS().toDF()
      }),
      ("encoderpin_tuple5_arity", s => {
        import s.implicits._
        Seq((1, "a", 2.0, false, 9L)).toDS().toDF()
      }),
      ("encoderpin_nested_tuple_struct", s => {
        import s.implicits._
        Seq((1, ("x", (2.5, 3L)))).toDS().toDF()
      }),
      ("encoderpin_case_class_field_order", s => {
        import s.implicits._
        Seq(EncPinUser(2, "bob", None), EncPinUser(1, "amy", Some(0.5)))
          .toDS().toDF().orderBy("id")
      }),
      ("encoderpin_nested_case_class_struct", s => {
        import s.implicits._
        Seq(EncPinNested(1, EncPinUser(7, "n", Some(1.25)))).toDS().toDF()
      }),
      ("encoderpin_option_none_is_null", s => {
        import s.implicits._
        Seq(Option(5), None, Option(7)).toDS().toDF().orderBy(F.col("value").asc_nulls_first)
      }),
      ("encoderpin_option_nested_struct_null", s => {
        import s.implicits._
        Seq(EncPinOptNested(1, None), EncPinOptNested(2, Some(EncPinUser(9, "z", None))))
          .toDS().toDF().orderBy("id")
      }),
      // primitive and boxed element encoders
      ("encoderpin_primitive_long_ds", s => {
        import s.implicits._
        Seq(3L, 1L, 2L).toDS().toDF().orderBy("value")
      }),
      ("encoderpin_primitive_byte_short_float", s => {
        import s.implicits._
        Seq((1.toByte, 2.toShort, 3.5f)).toDS().toDF()
      }),
      ("encoderpin_boxed_integer_nullable", s => {
        import s.implicits._
        Seq[java.lang.Integer](1, null, 3).toDS().toDF().orderBy(F.col("value").asc_nulls_first)
      }),
      ("encoderpin_string_with_null_element", s => {
        import s.implicits._
        Seq("a", null, "c").toDS().toDF().orderBy(F.col("value").asc_nulls_first)
      }),
      ("encoderpin_boolean_ds", s => {
        import s.implicits._
        Seq(true, false).toDS().toDF().orderBy("value")
      }),
      // collection field encoders
      ("encoderpin_seq_field_is_array", s => {
        import s.implicits._
        Seq(EncPinColl(Seq("x", "y"), Map("a" -> 1), Array[Byte](0x0a, 0x0b)))
          .toDS().toDF()
      }),
      ("encoderpin_array_int_primitive", s => {
        import s.implicits._
        Seq(Array(1, 2, 3)).toDS().toDF()
      }),
      ("encoderpin_set_encodes_as_array", s => {
        import s.implicits._
        // sort inside the typed map so the array payload is order-stable
        Seq(Set(3, 1, 2)).toDS().map(_.toSeq.sorted).toDF()
      }),
      ("encoderpin_map_int_to_seq", s => {
        import s.implicits._
        Seq(Map(1 -> Seq("a"), 2 -> Seq("b", "c"))).toDS().toDF()
      }),
      ("encoderpin_option_seq_field", s => {
        import s.implicits._
        Seq(Option(Seq(1, 2)), None).toDS().toDF()
          .select(F.col("value")).orderBy(F.col("value").asc_nulls_first)
      }),
      ("encoderpin_seq_of_case_class", s => {
        import s.implicits._
        Seq(EncPinSeqStruct(1, Seq(EncPinUser(1, "a", None), EncPinUser(2, "b", Some(2.0)))))
          .toDS().toDF()
      }),
      // numeric encoders
      ("encoderpin_bigdecimal_is_38_18", s => {
        import s.implicits._
        Seq(EncPinNums(BigDecimal("1.5"), BigInt("12345678901234567890"))).toDS().toDF()
      }),
      ("encoderpin_bigint_is_decimal_38_0", s => {
        import s.implicits._
        Seq(Tuple1(BigInt(42))).toDS().toDF()
      }),
      ("encoderpin_scala_bigdecimal_value_roundtrip", s => {
        import s.implicits._
        Seq(BigDecimal("123.456")).toDS().toDF()
      }),
      // datetime encoders
      ("encoderpin_sql_date_timestamp_localdate", s => {
        import s.implicits._
        Seq(EncPinTimes(java.sql.Date.valueOf("2020-01-02"),
          java.sql.Timestamp.valueOf("2020-01-02 03:04:05.123"),
          java.time.LocalDate.of(2021, 6, 15))).toDS()
          .select(F.col("d").cast("string"), F.col("ts").cast("string"),
            F.col("ld").cast("string"))
      }),
      ("encoderpin_instant_is_timestamp", s => {
        import s.implicits._
        Seq(java.time.Instant.parse("2020-01-02T03:04:05Z")).toDS()
          .select(F.col("value").cast("string"))
      }),
      ("encoderpin_localdatetime_is_ntz", s => {
        import s.implicits._
        Seq(EncPinNtz(java.time.LocalDateTime.of(2020, 1, 2, 3, 4, 5))).toDS()
          .select(F.col("ldt"), F.col("ldt").cast("string").as("ldt_str"))
      }),
      ("encoderpin_duration_period_intervals", s => {
        import s.implicits._
        Seq(EncPinIntervals(java.time.Duration.ofHours(25),
          java.time.Period.ofMonths(14))).toDS()
          .select(F.col("dur").cast("string"), F.col("per").cast("string"))
      }),
      // typed transforms
      ("encoderpin_map_preserves_type", s => {
        import s.implicits._
        Seq(1, 2, 3).toDS().map(_ * 10).toDF().orderBy("value")
      }),
      ("encoderpin_map_to_case_class", s => {
        import s.implicits._
        Seq(1L, 2L).toDS().map(i => EncPinUser(i, s"u$i", Some(i * 0.5)))
          .toDF().orderBy("id")
      }),
      ("encoderpin_filter_typed_predicate", s => {
        import s.implicits._
        Seq(1, 2, 3, 4).toDS().filter(_ % 2 == 0).toDF().orderBy("value")
      }),
      ("encoderpin_flatmap_words", s => {
        import s.implicits._
        Seq("a b", "c").toDS().flatMap(_.split(" ")).toDF().orderBy("value")
      }),
      ("encoderpin_mappartitions_typed", s => {
        import s.implicits._
        Seq(1, 2, 3).toDS().repartition(1)
          .mapPartitions(it => Iterator(it.sum)).toDF()
      }),
      ("encoderpin_ds_union_typed", s => {
        import s.implicits._
        Seq(1, 3).toDS().union(Seq(2).toDS()).toDF().orderBy("value")
      }),
      ("encoderpin_distinct_typed", s => {
        import s.implicits._
        Seq(1, 1, 2).toDS().distinct().toDF().orderBy("value")
      }),
      // groupByKey family
      ("encoderpin_groupbykey_count_colname", s => {
        import s.implicits._
        Seq("a", "b", "a").toDS().groupByKey(identity).count().toDF().orderBy("key")
      }),
      ("encoderpin_groupbykey_mapgroups", s => {
        import s.implicits._
        Seq((1, 10), (1, 20), (2, 30)).toDS()
          .groupByKey(_._1).mapGroups((k, it) => (k, it.map(_._2).sum))
          .toDF().orderBy("_1")
      }),
      ("encoderpin_groupbykey_reducegroups", s => {
        import s.implicits._
        Seq((1, 10), (1, 20), (2, 30)).toDS()
          .groupByKey(_._1).mapValues(_._2).reduceGroups(_ + _)
          .toDF().orderBy("key")
      }),
      ("encoderpin_groupbykey_flatmapgroups", s => {
        import s.implicits._
        Seq((1, "x"), (1, "y"), (2, "z")).toDS()
          .groupByKey(_._1)
          .flatMapGroups((k, it) => it.map(v => (k, v._2.toUpperCase)))
          .toDF().orderBy("_1", "_2")
      }),
      ("encoderpin_groupbykey_agg_typed_column", s => {
        import s.implicits._
        Seq((1, 2.0), (1, 4.0), (2, 6.0)).toDS()
          .groupByKey(_._1)
          .agg(F.sum($"_2").as("s").as[Double])
          .toDF().orderBy("key")
      }),
      // joinWith: tuple-of-struct result shape, outer null sides
      ("encoderpin_joinwith_inner_struct_pair", s => {
        import s.implicits._
        val l = Seq(EncPinUser(1, "a", None), EncPinUser(2, "b", None)).toDS()
        val r = Seq((1, "x")).toDS()
        l.joinWith(r, l("id") === r("_1"), "inner").toDF().orderBy("_1.id")
      }),
      ("encoderpin_joinwith_left_outer_null_side", s => {
        import s.implicits._
        val l = Seq(1, 2).toDS()
        val r = Seq((1, "x")).toDS()
        l.joinWith(r, l("value") === r("_1"), "left_outer")
          .toDF().orderBy("_1")
      }),
      // as[] rebinding and row encoders
      ("encoderpin_df_as_case_class_by_name", s => {
        import s.implicits._
        val df = Seq((1L, "a", 0.5)).toDF("id", "name", "score")
        df.as[EncPinUser].map(u => u.copy(name = u.name + "!")).toDF()
      }),
      ("encoderpin_df_as_tuple_by_position_names", s => {
        import s.implicits._
        Seq((1, "a")).toDF("_1", "_2").as[(Int, String)]
          .map { case (i, v) => (i + 1, v) }.toDF()
      }),
      ("encoderpin_row_encoder_createdataframe", s => {
        import org.apache.spark.sql.{Row, types => T}
        val schema = T.StructType(Seq(
          T.StructField("k", T.IntegerType), T.StructField("v", T.StringType)))
        s.createDataFrame(
          new java.util.ArrayList[Row](java.util.Arrays.asList(Row(1, "x"), Row(2, null))),
          schema).orderBy("k")
      }),
      ("encoderpin_range_as_long", s => {
        import s.implicits._
        s.range(3).as[Long].map(_ + 100).toDF().orderBy("value")
      }),
      ("encoderpin_select_typed_column", s => {
        import s.implicits._
        Seq((1, "a"), (2, "b")).toDF("id", "v")
          .select($"id".as[Int]).map(_ * 2).toDF().orderBy("value")
      }),
      ("encoderpin_binary_field_roundtrip", s => {
        import s.implicits._
        Seq(Array[Byte](1, 2, 0x7f)).toDS().toDF()
      }),
      ("encoderpin_unit_like_empty_ds_schema", s => {
        import s.implicits._
        s.emptyDataset[EncPinUser].toDF()
      }),
      ("encoderpin_dropduplicates_typed_then_map", s => {
        import s.implicits._
        Seq(EncPinUser(1, "a", None), EncPinUser(1, "a", None), EncPinUser(2, "b", None))
          .toDS().dropDuplicates("id").map(_.id).toDF().orderBy("value")
      }),
      ("encoderpin_typed_head_collect_parity", s => {
        import s.implicits._
        // first() on a typed ds yields the case class; re-wrap to pin it
        val u = Seq(EncPinUser(5, "h", Some(0.5))).toDS().head()
        Seq(u).toDS().toDF()
      }))
    encBase ++ cachePinned
  }

  // ---- wave 13a: write-path pins (VERDICT r12 item 1 — the write-side
  // gluten-ut battery the reference enables:
  // GlutenFileFormatWriterSuite VeloxTestSettings.scala:460,
  // GlutenV1WriteCommandSuite :494, GlutenPartitionedWriteSuite :590,
  // GlutenParquetCompressionCodecPrecedenceSuite :341). Each pin
  // performs a REAL write under /tmp/graft_wrpin (cleaned per entry,
  // deterministic inputs, single-task where file counts matter) and
  // golden-pins what comes back: dynamic vs static partition
  // overwrite, SaveMode faces, maxRecordsPerFile splitting (option vs
  // conf precedence), parquet codec precedence (option > conf) via
  // file extensions, partition-directory value rendering (escaping,
  // nulls, timestamps under two session time zones), insertInto's
  // by-POSITION vs saveAsTable-append's by-NAME resolution, and
  // CSV/JSON writer option semantics read back as raw text. File
  // names are normalized (the task uuid stripped) so layout pins are
  // run-stable; plan-shape contracts (the Sort below WriteFiles, the
  // file-per-partition clustering) live in WritePathSpec — golden
  // pins carry VALUES.
  private val wrBase = "/tmp/graft_wrpin"
  private lazy val wrPinned: Seq[(String, org.apache.spark.sql.SparkSession =>
      org.apache.spark.sql.DataFrame)] = {
    import org.apache.spark.sql.{functions => F}
    def clean(sub: String): String = {
      val root = new java.io.File(wrBase, sub)
      def del(f: java.io.File): Unit = {
        if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(del))
        f.delete(): Unit
      }
      del(root)
      root.toString
    }
    /** sorted relative ON-DISK paths of DATA files (no _SUCCESS/.crc) */
    def realFiles(sub: String): Seq[String] = {
      val root = java.nio.file.Paths.get(wrBase, sub)
      val buf = scala.collection.mutable.ArrayBuffer.empty[String]
      java.nio.file.Files.walk(root).forEach { p =>
        val n = p.getFileName.toString
        if (java.nio.file.Files.isRegularFile(p) && n != "_SUCCESS" &&
            !n.endsWith(".crc"))
          buf += root.relativize(p).toString
      }
      buf.sorted.toSeq
    }
    /** [[realFiles]] with the task uuid stripped so names are
      * run-stable for golden pinning */
    def files(sub: String): Seq[String] = realFiles(sub)
      .map(_.replaceAll("part-(\\d+)-[0-9a-fA-F-]{36}", "part-$1")).sorted
    def strDf(s: org.apache.spark.sql.SparkSession, vals: Seq[String], col: String) = {
      import s.implicits._
      vals.toDF(col)
    }
    def withConf[T](s: org.apache.spark.sql.SparkSession, kvs: (String, String)*)(
        body: => T): T = {
      val olds = kvs.map { case (k, _) => k -> s.conf.getOption(k) }
      kvs.foreach { case (k, v) => s.conf.set(k, v) }
      try body
      finally olds.foreach { case (k, o) => o.fold(s.conf.unset(k))(s.conf.set(k, _)) }
    }
    def kv(s: org.apache.spark.sql.SparkSession, rows: Seq[(Int, String)]) = {
      import s.implicits._
      rows.toDF("k", "p").repartition(1)
    }

    Seq[(String, org.apache.spark.sql.SparkSession => org.apache.spark.sql.DataFrame)](
      // -- partition-directory layout and value rendering ------------
      ("wrpin_partitioned_layout_one_file_per_value", s => {
        val p = clean("layout1")
        kv(s, Seq(1 -> "a", 2 -> "b", 3 -> "a")).write.partitionBy("p").parquet(p)
        strDf(s, files("layout1"), "f")
      }),
      ("wrpin_partitioned_nested_two_level_dirs", s => {
        import s.implicits._
        val p = clean("layout2")
        Seq((1, "x", 10), (2, "y", 20), (3, "x", 20)).toDF("k", "p1", "p2")
          .repartition(1).write.partitionBy("p1", "p2").parquet(p)
        strDf(s, files("layout2"), "f")
      }),
      ("wrpin_partition_value_escaping_dirs", s => {
        val p = clean("esc")
        kv(s, Seq(1 -> "a b", 2 -> "a:b", 3 -> "a/b", 4 -> "a=b"))
          .write.partitionBy("p").parquet(p)
        strDf(s, files("esc"), "f")
      }),
      ("wrpin_partition_value_escaping_roundtrip", s => {
        // the escaped directory names must decode back to the exact
        // original values on read
        s.read.parquet(s"$wrBase/esc").select("k", "p").orderBy("k")
      }),
      ("wrpin_partition_null_default_dir", s => {
        import s.implicits._
        val p = clean("nullp")
        Seq((1, Option("a")), (2, None: Option[String])).toDF("k", "p")
          .repartition(1).write.partitionBy("p").parquet(p)
        strDf(s, files("nullp"), "f")
      }),
      ("wrpin_partition_null_roundtrip_as_null", s =>
        s.read.parquet(s"$wrBase/nullp").select("k", "p")
          .orderBy(F.col("k"))),
      ("wrpin_partition_timestamp_dir_utc", s => {
        import s.implicits._
        val p = clean("tsp")
        Seq((1, java.sql.Timestamp.valueOf("2020-01-02 03:04:05")))
          .toDF("k", "ts").repartition(1).write.partitionBy("ts").parquet(p)
        strDf(s, files("tsp"), "f")
      }),
      ("wrpin_partition_timestamp_dir_la_tz", s => {
        // timezone-SENSITIVE partition rendering (the
        // GlutenPartitionedWriteSuite face): the same instant renders
        // as a different directory name under another session zone
        import s.implicits._
        val p = clean("tsp2")
        withConf(s, "spark.sql.session.timeZone" -> "America/Los_Angeles") {
          Seq((1, java.sql.Timestamp.from(
              java.time.Instant.parse("2020-01-02T03:04:05Z"))))
            .toDF("k", "ts").repartition(1).write.partitionBy("ts").parquet(p)
        }
        strDf(s, files("tsp2"), "f")
      }),
      ("wrpin_partition_date_dir", s => {
        import s.implicits._
        val p = clean("dp")
        Seq((1, java.sql.Date.valueOf("2020-02-29"))).toDF("k", "d")
          .repartition(1).write.partitionBy("d").parquet(p)
        strDf(s, files("dp"), "f")
      }),
      ("wrpin_partition_int_col_type_discovered", s => {
        import s.implicits._
        val p = clean("intp")
        Seq((1, 7), (2, 8)).toDF("k", "p").repartition(1)
          .write.partitionBy("p").parquet(p)
        // partition discovery types p back as INT (the schema prints in
        // the golden render)
        s.read.parquet(p).select("k", "p").orderBy("k")
      }),
      ("wrpin_partition_col_dropped_from_data_files", s => {
        // the partition column must NOT be duplicated inside the data
        // file: read one part file directly (no discovery) — only `k`
        val f = realFiles("intp").head
        s.read.parquet(s"$wrBase/intp/$f")
      }),
      ("wrpin_empty_unpartitioned_write_keeps_schema", s => {
        import s.implicits._
        val p = clean("empty1")
        Seq((1, "a")).toDF("k", "v").filter(F.lit(false)).repartition(1)
          .write.parquet(p)
        val back = s.read.parquet(p)
        Seq((files("empty1").length, back.count(), back.schema.simpleString))
          .toDF("n_files", "rows", "schema")
      }),
      ("wrpin_empty_partitioned_write_no_dirs", s => {
        import s.implicits._
        val p = clean("empty2")
        Seq((1, "a")).toDF("k", "p").filter(F.lit(false)).repartition(1)
          .write.partitionBy("p").parquet(p)
        Seq(files("empty2").length).toDF("n_files")
      }),

      // -- dynamic vs static partition overwrite ---------------------
      ("wrpin_dynamic_overwrite_replaces_touched_only", s => {
        val p = clean("dyn1")
        kv(s, Seq(1 -> "a", 2 -> "b", 3 -> "c")).write.partitionBy("p").parquet(p)
        kv(s, Seq(20 -> "b")).write.mode("overwrite")
          .option("partitionOverwriteMode", "dynamic").partitionBy("p").parquet(p)
        s.read.parquet(p).orderBy("k")
      }),
      ("wrpin_static_overwrite_truncates_table", s => {
        val p = clean("stat1")
        kv(s, Seq(1 -> "a", 2 -> "b", 3 -> "c")).write.partitionBy("p").parquet(p)
        kv(s, Seq(20 -> "b")).write.mode("overwrite").partitionBy("p").parquet(p)
        s.read.parquet(p).orderBy("k")
      }),
      ("wrpin_overwrite_mode_option_beats_conf", s => {
        // conf says dynamic, the write option says static → the static
        // truncate wins (per-write option precedence)
        val p = clean("prec1")
        kv(s, Seq(1 -> "a", 2 -> "b")).write.partitionBy("p").parquet(p)
        withConf(s, "spark.sql.sources.partitionOverwriteMode" -> "dynamic") {
          kv(s, Seq(20 -> "b")).write.mode("overwrite")
            .option("partitionOverwriteMode", "static").partitionBy("p").parquet(p)
        }
        s.read.parquet(p).orderBy("k")
      }),
      ("wrpin_dynamic_overwrite_conf_applies", s => {
        val p = clean("dyn2")
        kv(s, Seq(1 -> "a", 2 -> "b")).write.partitionBy("p").parquet(p)
        withConf(s, "spark.sql.sources.partitionOverwriteMode" -> "dynamic") {
          kv(s, Seq(20 -> "b", 30 -> "d")).write.mode("overwrite")
            .partitionBy("p").parquet(p)
        }
        // b replaced, d added, a untouched
        s.read.parquet(p).orderBy("k")
      }),
      ("wrpin_insert_overwrite_static_partition_spec", s => {
        // a static PARTITION (p='a') spec replaces ONLY that partition
        // even in static mode (the spec IS the overwrite scope)
        s.sql("DROP TABLE IF EXISTS wrpin_t1")
        s.sql("CREATE TABLE wrpin_t1 (k INT) USING parquet PARTITIONED BY (p STRING)")
        s.sql("INSERT INTO wrpin_t1 PARTITION (p='a') VALUES (1)")
        s.sql("INSERT INTO wrpin_t1 PARTITION (p='b') VALUES (2)")
        s.sql("INSERT OVERWRITE wrpin_t1 PARTITION (p='a') VALUES (10)")
        s.table("wrpin_t1").orderBy("k")
      }),
      ("wrpin_insert_overwrite_sql_dynamic_conf", s => {
        s.sql("DROP TABLE IF EXISTS wrpin_t2")
        s.sql("CREATE TABLE wrpin_t2 (k INT) USING parquet PARTITIONED BY (p STRING)")
        s.sql("INSERT INTO wrpin_t2 PARTITION (p='a') VALUES (1)")
        s.sql("INSERT INTO wrpin_t2 PARTITION (p='b') VALUES (2)")
        withConf(s, "spark.sql.sources.partitionOverwriteMode" -> "dynamic") {
          s.sql("INSERT OVERWRITE wrpin_t2 VALUES (20, 'b')")
        }
        s.table("wrpin_t2").orderBy("k")
      }),

      // -- SaveMode faces --------------------------------------------
      ("wrpin_savemode_append_accumulates", s => {
        val p = clean("sm_app")
        kv(s, Seq(1 -> "a")).write.parquet(p)
        kv(s, Seq(2 -> "b")).write.mode("append").parquet(p)
        s.read.parquet(p).orderBy("k")
      }),
      ("wrpin_savemode_ignore_is_noop_on_existing", s => {
        val p = clean("sm_ign")
        kv(s, Seq(1 -> "a")).write.parquet(p)
        kv(s, Seq(2 -> "b")).write.mode("ignore").parquet(p)
        s.read.parquet(p).orderBy("k")
      }),
      ("wrpin_savemode_overwrite_replaces_and_removes_stale", s => {
        import s.implicits._
        val p = clean("sm_ovr")
        // three-task first write → three files; single-task overwrite
        // must leave exactly ONE file (no stale parts)
        (1 to 9).map(i => (i, "x")).toDF("k", "p").repartition(3).write.parquet(p)
        kv(s, Seq(100 -> "y")).write.mode("overwrite").parquet(p)
        Seq((files("sm_ovr").length,
          s.read.parquet(p).collect().map(_.getInt(0)).toSeq.sorted.mkString(",")))
          .toDF("n_files", "ks")
      }),
      ("wrpin_savemode_errorifexists_raises", s => {
        import s.implicits._
        val p = clean("sm_err")
        kv(s, Seq(1 -> "a")).write.parquet(p)
        val caught = try {
          kv(s, Seq(2 -> "b")).write.mode("errorifexists").parquet(p); "none"
        } catch {
          case e: org.apache.spark.sql.AnalysisException =>
            if (e.getMessage.contains("already exists")) "already-exists"
            else "other-analysis"
        }
        Seq(caught).toDF("err")
      }),

      // -- maxRecordsPerFile splitting -------------------------------
      ("wrpin_max_records_per_file_option_splits", s => {
        import s.implicits._
        val p = clean("mrf1")
        (1 to 10).map(i => (i, "x")).toDF("k", "p").repartition(1)
          .write.option("maxRecordsPerFile", "3").parquet(p)
        val perFile = realFiles("mrf1").map(f =>
          s.read.parquet(s"$wrBase/mrf1/$f").count()).sorted
        Seq((files("mrf1").length, perFile.mkString(","),
          s.read.parquet(p).count())).toDF("n_files", "per_file", "rows")
      }),
      ("wrpin_max_records_per_file_conf_applies", s => {
        import s.implicits._
        val p = clean("mrf2")
        withConf(s, "spark.sql.files.maxRecordsPerFile" -> "4") {
          (1 to 10).map(i => (i, "x")).toDF("k", "p").repartition(1)
            .write.parquet(p)
        }
        Seq((files("mrf2").length, s.read.parquet(p).count()))
          .toDF("n_files", "rows")
      }),
      ("wrpin_max_records_option_beats_conf", s => {
        import s.implicits._
        val p = clean("mrf3")
        withConf(s, "spark.sql.files.maxRecordsPerFile" -> "2") {
          (1 to 10).map(i => (i, "x")).toDF("k", "p").repartition(1)
            .write.option("maxRecordsPerFile", "5").parquet(p)
        }
        Seq((files("mrf3").length, s.read.parquet(p).count()))
          .toDF("n_files", "rows")
      }),

      // -- parquet compression codec precedence ----------------------
      ("wrpin_codec_option_extension", s => {
        val p = clean("cod1")
        kv(s, Seq(1 -> "a")).write.option("compression", "gzip").parquet(p)
        strDf(s, files("cod1"), "f")
      }),
      ("wrpin_codec_conf_extension", s => {
        val p = clean("cod2")
        withConf(s, "spark.sql.parquet.compression.codec" -> "zstd") {
          kv(s, Seq(1 -> "a")).write.parquet(p)
        }
        strDf(s, files("cod2"), "f")
      }),
      ("wrpin_codec_option_beats_conf", s => {
        val p = clean("cod3")
        withConf(s, "spark.sql.parquet.compression.codec" -> "gzip") {
          kv(s, Seq(1 -> "a")).write.option("compression", "snappy").parquet(p)
        }
        strDf(s, files("cod3"), "f")
      }),
      ("wrpin_codec_uncompressed_plain_extension", s => {
        val p = clean("cod4")
        kv(s, Seq(1 -> "a")).write.option("compression", "uncompressed").parquet(p)
        strDf(s, files("cod4"), "f")
      }),
      ("wrpin_codec_gzip_readback_identical", s => {
        import s.implicits._
        val p = clean("cod5")
        Seq((1, "alpha", 1.5), (2, "beta", 2.5)).toDF("k", "v", "x")
          .repartition(1).write.option("compression", "gzip").parquet(p)
        s.read.parquet(p).orderBy("k")
      }),

      // -- insertInto vs saveAsTable resolution ----------------------
      ("wrpin_insertinto_resolves_by_position", s => {
        import s.implicits._
        s.sql("DROP TABLE IF EXISTS wrpin_t3")
        s.sql("CREATE TABLE wrpin_t3 (a INT, b INT) USING parquet")
        // columns NAMED the other way round: insertInto ignores names
        // and maps by position — a=10, b=1
        Seq((10, 1)).toDF("b", "a").write.insertInto("wrpin_t3")
        s.table("wrpin_t3").orderBy("a")
      }),
      ("wrpin_saveastable_append_resolves_by_name", s => {
        import s.implicits._
        s.sql("DROP TABLE IF EXISTS wrpin_t4")
        s.sql("CREATE TABLE wrpin_t4 (a INT, b INT) USING parquet")
        // saveAsTable in append mode matches by NAME — a=1, b=10
        Seq((10, 1)).toDF("b", "a").write.mode("append").saveAsTable("wrpin_t4")
        s.table("wrpin_t4").orderBy("a")
      }),
      ("wrpin_bucketby_plain_path_save_errors", s => {
        import s.implicits._
        val p = clean("bk_err")
        val caught = try {
          Seq((1, "a")).toDF("k", "v").write.bucketBy(4, "k").parquet(p); "none"
        } catch {
          case e: org.apache.spark.sql.AnalysisException =>
            if (e.getMessage.toLowerCase.contains("bucket")) "bucket-needs-table"
            else "other-analysis"
        }
        Seq(caught).toDF("err")
      }),

      // -- CSV / JSON writer option semantics (raw text pinned) ------
      ("wrpin_csv_write_header_null_roundtrip", s => {
        import s.implicits._
        val p = clean("csv1")
        Seq((1, Option("a")), (2, None: Option[String])).toDF("k", "v")
          .coalesce(1).sortWithinPartitions("k")
          .write.option("header", "true").option("nullValue", "NA").csv(p)
        strDf(s, s.read.text(p).collect().map(_.getString(0)).toSeq.sorted, "line")
      }),
      ("wrpin_csv_write_dateformat_applied", s => {
        import s.implicits._
        val p = clean("csv2")
        Seq((1, java.sql.Date.valueOf("2020-02-29"))).toDF("k", "d")
          .coalesce(1).write.option("dateFormat", "dd/MM/yyyy").csv(p)
        strDf(s, s.read.text(p).collect().map(_.getString(0)).toSeq.sorted, "line")
      }),
      ("wrpin_csv_write_quotes_only_when_needed", s => {
        import s.implicits._
        val p = clean("csv3")
        Seq((1, "plain"), (2, "has,comma"), (3, "has\"quote")).toDF("k", "v")
          .coalesce(1).sortWithinPartitions("k").write.csv(p)
        strDf(s, s.read.text(p).collect().map(_.getString(0)).toSeq.sorted, "line")
      }),
      ("wrpin_json_write_drops_null_fields_by_default", s => {
        import s.implicits._
        val p = clean("json1")
        Seq((1, Option("a")), (2, None: Option[String])).toDF("k", "v")
          .coalesce(1).sortWithinPartitions("k").write.json(p)
        strDf(s, s.read.text(p).collect().map(_.getString(0)).toSeq.sorted, "line")
      }),
      ("wrpin_json_write_keeps_null_fields_on_option", s => {
        import s.implicits._
        val p = clean("json2")
        Seq((1, Option("a")), (2, None: Option[String])).toDF("k", "v")
          .coalesce(1).sortWithinPartitions("k")
          .write.option("ignoreNullFields", "false").json(p)
        strDf(s, s.read.text(p).collect().map(_.getString(0)).toSeq.sorted, "line")
      }),
      ("wrpin_text_write_requires_single_string_column", s => {
        import s.implicits._
        val p = clean("txt1")
        // pin the ERROR CONDITION (stable error class), not message text
        val caught = try {
          Seq((1, "a")).toDF("k", "v").write.text(p); "none"
        } catch {
          case e: org.apache.spark.sql.AnalysisException =>
            Option(e.getCondition).getOrElse("no-condition")
        }
        Seq(caught).toDF("err")
      }),
      ("wrpin_coalesce_one_single_file", s => {
        import s.implicits._
        val p = clean("co1")
        (1 to 12).map(i => (i, "x")).toDF("k", "p").repartition(3)
          .coalesce(1).write.parquet(p)
        Seq((files("co1").length, s.read.parquet(p).count()))
          .toDF("n_files", "rows")
      })) ++ buckPinned
  }

  // ---- wave 13b: bucketing value pins (VERDICT r12 item 2 — the
  // GlutenBucketedRead/WriteWithoutHiveSupportSuite value half; plan
  // contracts live in BucketingSpec). The bucket id function is
  // `pmod(hash(col), n)` (Murmur3, seed 42) — pinned directly so a
  // hash regression moves rows across buckets VISIBLY, plus pinned
  // evidence that written files actually contain only their bucket's
  // keys, that two inserts stack per-bucket files, and that DESCRIBE
  // reports the bucket spec.
  private var buckBuilt = false
  private def buckFix(s: org.apache.spark.sql.SparkSession): Unit = synchronized {
    if (!buckBuilt) {
      import s.implicits._
      Seq("bkpin8a", "bkpin8b").foreach(t => s.sql(s"DROP TABLE IF EXISTS $t"))
      s.sql("""CREATE TABLE bkpin8a (k INT, v STRING) USING parquet
               CLUSTERED BY (k) SORTED BY (k) INTO 8 BUCKETS""")
      s.sql("""CREATE TABLE bkpin8b (k INT, w INT) USING parquet
               CLUSTERED BY (k) INTO 8 BUCKETS""")
      (1 to 40).map(i => (i, s"v$i")).toDF("k", "v")
        .repartition(1).write.mode("append").insertInto("bkpin8a")
      (1 to 40).map(i => (i, i * 10)).toDF("k", "w")
        .repartition(1).write.mode("append").insertInto("bkpin8b")
      buckBuilt = true
    }
  }
  private def buckLoc(s: org.apache.spark.sql.SparkSession, t: String): String =
    s.sql(s"DESCRIBE EXTENDED $t")
      .filter(org.apache.spark.sql.functions.col("col_name") === "Location")
      .head.getString(1).stripPrefix("file:")
  private lazy val buckPinned: Seq[(String, org.apache.spark.sql.SparkSession =>
      org.apache.spark.sql.DataFrame)] = {
    import org.apache.spark.sql.{functions => F}
    Seq[(String, org.apache.spark.sql.SparkSession => org.apache.spark.sql.DataFrame)](
      ("bucketpin_hash_bucket_ids_int", s =>
        s.sql("""SELECT k, pmod(hash(k), 8) AS b
                 FROM VALUES (0),(1),(2),(42),(100),(-7) t(k) ORDER BY k""")),
      ("bucketpin_hash_int_vs_long_differ", s =>
        // bucketing is TYPE-sensitive: INT 42 and BIGINT 42 hash
        // differently, so a schema-width change silently re-buckets
        s.sql("""SELECT pmod(hash(42), 8) AS bi,
                        pmod(hash(CAST(42 AS BIGINT)), 8) AS bl,
                        pmod(hash(42), 8) = pmod(hash(CAST(42 AS BIGINT)), 8) AS same""")),
      ("bucketpin_hash_string_and_null", s =>
        s.sql("""SELECT pmod(hash('alpha'), 8) AS ba, pmod(hash(''), 8) AS be,
                        pmod(hash(CAST(NULL AS INT)), 8) AS bn""")),
      ("bucketpin_filter_eq_values", s => {
        buckFix(s)
        s.table("bkpin8a").filter(F.col("k").isin(7, 8, 9)).orderBy("k")
      }),
      ("bucketpin_cobucket_join_values", s => {
        buckFix(s)
        s.table("bkpin8a").join(s.table("bkpin8b").hint("merge"), Seq("k"))
          .filter(F.col("k") <= 5).orderBy("k")
      }),
      ("bucketpin_groupby_values", s => {
        buckFix(s)
        s.table("bkpin8a").groupBy(F.pmod(F.col("k"), F.lit(3)).as("g"))
          .agg(F.count(F.lit(1)).as("n"), F.sum(F.col("k")).as("sk")).orderBy("g")
      }),
      ("bucketpin_file_contains_only_its_bucket_keys", s => {
        buckFix(s)
        // read ONE bucket file directly: every row's pmod(hash(k),8)
        // must equal the _0000N tag in its file name
        val loc = buckLoc(s, "bkpin8a")
        val f = new java.io.File(loc).listFiles()
          .map(_.getName).filter(n => n.contains("_00003") && !n.endsWith(".crc"))
          .sorted.head
        s.read.parquet(s"$loc/$f")
          .select(F.countDistinct(F.pmod(F.hash(F.col("k")), F.lit(8))).as("n_distinct"),
            F.min(F.pmod(F.hash(F.col("k")), F.lit(8))).as("the_bucket"))
      }),
      ("bucketpin_second_insert_stacks_per_bucket_files", s => {
        buckFix(s)
        import s.implicits._
        s.sql("DROP TABLE IF EXISTS bkpin_tw")
        s.sql("""CREATE TABLE bkpin_tw (k INT) USING parquet
                 CLUSTERED BY (k) INTO 4 BUCKETS""")
        (1 to 20).map(i => (i)).toDF("k").repartition(1)
          .write.mode("append").insertInto("bkpin_tw")
        (1 to 20).map(i => (i)).toDF("k").repartition(1)
          .write.mode("append").insertInto("bkpin_tw")
        val names = new java.io.File(buckLoc(s, "bkpin_tw")).listFiles()
          .map(_.getName).filter(n => n != "_SUCCESS" && !n.endsWith(".crc"))
        val perBucket = names.flatMap(n =>
          "_(\\d{5})".r.findFirstMatchIn(n).map(_.group(1))).groupBy(identity)
          .map { case (b, fs) => (b, fs.length) }.toSeq.sortBy(_._1)
        import s.implicits._
        perBucket.toDF("bucket", "n_files")
      }),
      ("bucketpin_describe_reports_bucket_spec", s => {
        buckFix(s)
        s.sql("DESCRIBE EXTENDED bkpin8a")
          .filter(F.col("col_name").isin("Num Buckets", "Bucket Columns", "Sort Columns"))
          .select("col_name", "data_type").orderBy("col_name")
      })) ++ dppPinned
  }

  // ---- wave 13c: DPP value pins (VERDICT r12 item 4; the four
  // reference suite modes `VeloxTestSettings.scala:765-768` distilled:
  // plan contracts — reuse-broadcast, standalone-subquery fallback,
  // SPARK-38148 static suppression, files-skipped metrics, ×AQE —
  // live in DppSpec). Every mode below must produce the SAME values;
  // a pruning filter that drops or duplicates rows fails with the
  // drifted aggregate.
  private var dppBuilt = false
  private def dppFix(s: org.apache.spark.sql.SparkSession): Unit = synchronized {
    if (!dppBuilt) {
      import s.implicits._
      Seq("dpppin_f", "dpppin_d").foreach(t => s.sql(s"DROP TABLE IF EXISTS $t"))
      s.sql("CREATE TABLE dpppin_f (k INT) USING parquet PARTITIONED BY (p INT)")
      (1 to 120).map(i => (i, i % 12)).toDF("k", "p")
        .repartition(1).write.mode("append").insertInto("dpppin_f")
      (0 to 11).map(p => (p, if (p < 3) "hot" else "cold")).toDF("p", "cat")
        .write.saveAsTable("dpppin_d")
      dppBuilt = true
    }
  }
  private lazy val dppPinned: Seq[(String, org.apache.spark.sql.SparkSession =>
      org.apache.spark.sql.DataFrame)] = {
    import org.apache.spark.sql.{functions => F}
    def withConf[T](s: org.apache.spark.sql.SparkSession, kvs: (String, String)*)(
        body: => T): T = {
      val olds = kvs.map { case (k, _) => k -> s.conf.getOption(k) }
      kvs.foreach { case (k, v) => s.conf.set(k, v) }
      try body
      finally olds.foreach { case (k, o) => o.fold(s.conf.unset(k))(s.conf.set(k, _)) }
    }
    def pruned(s: org.apache.spark.sql.SparkSession, hint: Option[String]) = {
      dppFix(s)
      val dim0 = s.table("dpppin_d").filter(F.col("cat") === "hot")
      val dim = hint.fold(dim0)(dim0.hint(_))
      s.table("dpppin_f").join(dim, Seq("p"))
        .groupBy(F.col("p")).agg(F.count(F.lit(1)).as("n"), F.sum(F.col("k")).as("sk"))
        .orderBy("p")
    }
    Seq[(String, org.apache.spark.sql.SparkSession => org.apache.spark.sql.DataFrame)](
      ("dpppin_bhj_reuse_values", s => { pruned(s, None).collect(); pruned(s, None) }),
      ("dpppin_smj_fallback_values", s =>
        withConf(s,
          "spark.sql.optimizer.dynamicPartitionPruning.reuseBroadcastOnly" -> "false",
          "spark.sql.optimizer.dynamicPartitionPruning.fallbackFilterRatio" -> "10") {
          // collect INSIDE the conf scope so the fallback path executes
          val df = pruned(s, Some("merge"))
          import s.implicits._
          df.collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSeq
            .toDF("p", "n", "sk")
        }),
      ("dpppin_disabled_same_values", s =>
        withConf(s, "spark.sql.optimizer.dynamicPartitionPruning.enabled" -> "false") {
          val df = pruned(s, None)
          import s.implicits._
          df.collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSeq
            .toDF("p", "n", "sk")
        }),
      ("dpppin_aqe_off_same_values", s =>
        withConf(s, "spark.sql.adaptive.enabled" -> "false") {
          val df = pruned(s, None)
          import s.implicits._
          df.collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSeq
            .toDF("p", "n", "sk")
        }),
      ("dpppin_static_suppressed_same_values", s => {
        dppFix(s)
        s.table("dpppin_f").filter(F.col("p") =!= 0)
          .join(s.table("dpppin_d").filter(F.col("cat") === "hot"), Seq("p"))
          .groupBy(F.col("p")).agg(F.count(F.lit(1)).as("n")).orderBy("p")
      }),
      ("dpppin_left_outer_keeps_unmatched_partitions", s => {
        dppFix(s)
        // LEFT OUTER preserves the fact side: DPP must NOT prune (a
        // pruned partition would silently drop preserved rows)
        s.table("dpppin_f")
          .join(s.table("dpppin_d").filter(F.col("cat") === "hot"), Seq("p"), "left")
          .groupBy(F.col("cat")).agg(F.count(F.lit(1)).as("n"))
          .orderBy(F.col("cat").asc_nulls_first)
      }),
      // wave 14b: the build-side-aggregate and both-legs faces (plan +
      // files-read contracts in DppSpec); values must equal the plain
      // pruned join's groups
      ("dpppin_build_side_aggregate_values", s => {
        dppFix(s)
        s.table("dpppin_f")
          .join(s.table("dpppin_d").filter(F.col("cat") === "hot")
            .groupBy(F.col("p")).agg(F.count(F.lit(1)).as("c")), Seq("p"))
          .groupBy(F.col("p")).agg(F.count(F.lit(1)).as("n"), F.sum(F.col("k")).as("sk"))
          .orderBy("p")
      }),
      ("dpppin_both_legs_values", s => {
        dppFix(s)
        val dim = s.table("dpppin_d").filter(F.col("cat") === "hot")
        s.table("dpppin_f").join(dim, Seq("p"))
          .join(s.table("dpppin_f").as("g").join(dim, Seq("p"))
            .select(F.col("p"), F.col("k").as("k2")), Seq("p"))
          .groupBy(F.col("p")).agg(F.count(F.lit(1)).as("n"),
            F.sum(F.col("k") + F.col("k2")).as("sk"))
          .orderBy("p")
      })) ++ spjPinned
  }

  // ---- wave 14a: storage-partitioned-join value pins (VERDICT r13
  // Missing #2 — the partial-compatibility faces of
  // `GlutenKeyGroupedPartitioningSuite`: partiallyClusteredDistribution
  // and join-keys-subset-of-partition-keys; plan contracts live in
  // LakeSpjSpec). Every conf face must produce IDENTICAL values, and
  // the shuffled-or-not behavior per face is itself pinned as data so
  // a Spark-side or scan-side change that silently starts (or stops)
  // exchanging fails the suite with the drifted face table.
  private var spjBuilt = false
  private def spjFix(s: org.apache.spark.sql.SparkSession): Unit = synchronized {
    if (!spjBuilt) {
      import s.implicits._
      s.conf.set("spark.sql.catalog.spjpin",
        classOf[graft.sources.GraftLakeCatalog].getName)
      Seq("pa", "pb").foreach(t => s.sql(s"DROP TABLE IF EXISTS spjpin.$t"))
      Seq("pa", "pb").foreach(t => s.sql(
        s"""CREATE TABLE spjpin.$t (id BIGINT, region STRING, v DOUBLE)
            PARTITIONED BY (region, bucket(4, id))"""))
      def rows(n: Int) = (1 to n).map(i => (i.toLong, s"r${i % 3}", i * 1.0))
        .toDF("id", "region", "v")
      rows(24).writeTo("spjpin.pa").append()
      // second append on pa: multiple files per partition tuple (the
      // split shape partially-clustered distribution exists for)
      rows(24).writeTo("spjpin.pa").append()
      rows(18).writeTo("spjpin.pb").append()
      spjBuilt = true
    }
  }
  private lazy val spjPinned: Seq[(String, org.apache.spark.sql.SparkSession =>
      org.apache.spark.sql.DataFrame)] = {
    import org.apache.spark.sql.{functions => F}
    def withConf[T](s: org.apache.spark.sql.SparkSession, kvs: (String, String)*)(
        body: => T): T = {
      val olds = kvs.map { case (k, _) => k -> s.conf.getOption(k) }
      kvs.foreach { case (k, v) => s.conf.set(k, v) }
      try body
      finally olds.foreach { case (k, o) => o.fold(s.conf.unset(k))(s.conf.set(k, _)) }
    }
    val subsetConfs = Seq(
      "spark.sql.sources.v2.bucketing.allowJoinKeysSubsetOfPartitionKeys.enabled" -> "true",
      "spark.sql.requireAllClusterKeysForCoPartition" -> "false")
    val pcConfs = Seq(
      "spark.sql.sources.v2.bucketing.partiallyClusteredDistribution.enabled" -> "true")
    // full-key join: both partition transforms covered (region + id)
    def fullKeyJoin(s: org.apache.spark.sql.SparkSession) =
      s.table("spjpin.pa").as("a")
        .join(s.table("spjpin.pb").hint("merge").as("b"), Seq("region", "id"))
        .groupBy(F.col("region")).agg(F.count(F.lit(1)).as("n"),
          F.sum(F.col("a.v") + F.col("b.v")).as("x"))
        .orderBy("region")
    // subset join: region only; keeps both ids in flight so the bucket
    // transform resolves against the scan output (a pruned partition
    // source column silently discards the reported partitioning)
    def subsetJoin(s: org.apache.spark.sql.SparkSession) =
      s.table("spjpin.pa").as("a")
        .join(s.table("spjpin.pb").hint("merge").as("b"), Seq("region"))
        .groupBy(F.col("region")).agg(F.count(F.lit(1)).as("n"),
          F.sum(F.col("a.id") + F.col("b.id")).cast("double").as("x"))
        .orderBy("region")
    def materialize(s: org.apache.spark.sql.SparkSession,
        df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
      import s.implicits._
      df.collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
        .toDF("region", "n", "x")
    }
    def shuffled(df: org.apache.spark.sql.DataFrame): Boolean = {
      df.collect()
      df.queryExecution.executedPlan.toString.contains("Exchange")
    }
    Seq[(String, org.apache.spark.sql.SparkSession => org.apache.spark.sql.DataFrame)](
      ("spjpin_fullkey_join_values", s => {
        spjFix(s)
        materialize(s, fullKeyJoin(s))
      }),
      ("spjpin_partially_clustered_same_values", s => {
        spjFix(s)
        withConf(s, pcConfs: _*) {
          materialize(s, fullKeyJoin(s))
        }
      }),
      ("spjpin_subset_keys_same_values", s => {
        spjFix(s)
        withConf(s, subsetConfs: _*) {
          materialize(s, subsetJoin(s))
        }
      }),
      ("spjpin_subset_keys_default_same_values", s => {
        spjFix(s)
        materialize(s, subsetJoin(s))
      }),
      ("spjpin_exchange_faces", s => {
        spjFix(s)
        import s.implicits._
        // BARE joins (no aggregate above): `shuffled` must reflect the
        // JOIN's exchanges — a groupBy(region) on top re-clusters on a
        // key subset and adds its own Exchange in every face
        def fullKeyBare = s.table("spjpin.pa").as("a")
          .join(s.table("spjpin.pb").hint("merge").as("b"), Seq("region", "id"))
          .select(F.col("id"), (F.col("a.v") + F.col("b.v")).as("x"))
        def subsetBare = s.table("spjpin.pa").as("a")
          .join(s.table("spjpin.pb").hint("merge").as("b"), Seq("region"))
          .select((F.col("a.id") + F.col("b.id")).as("x"))
        Seq(
          ("fullkey_default", shuffled(fullKeyBare)),
          ("fullkey_partially_clustered",
            withConf(s, pcConfs: _*) { shuffled(fullKeyBare) }),
          ("subset_default", shuffled(subsetBare)),
          ("subset_allowed",
            withConf(s, subsetConfs: _*) { shuffled(subsetBare) }))
          .toDF("face", "shuffled")
      }))
  }

  // ---- wave 8d: cache/persist pins (GlutenCachedTableSuite /
  // InMemoryColumnarQuerySuite faces — the last suite family VERDICT r7
  // named unmapped). The test session runs the engine's OWN columnar
  // cache encoding (`spark.sql.cache.serializer` =
  // GraftCachedBatchSerializer), so every pin here round-trips values
  // through that serializer's batch build + per-type column codecs and
  // pins the decoded output: a codec regression for ANY type family
  // fails with the drifted value. Each program materializes the cache
  // (count) before reading and unpersists after, so pins stay
  // independent.
  private lazy val cachePinned: Seq[(String, org.apache.spark.sql.SparkSession =>
      org.apache.spark.sql.DataFrame)] = {
    import org.apache.spark.sql.{functions => F}
    def cached(df: org.apache.spark.sql.DataFrame)
        (read: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame)
        : org.apache.spark.sql.DataFrame = {
      val c = df.cache()
      c.count(): Unit // materialize through the serializer
      try {
        val out = read(c)
        out.collect(): Unit // force the cached read before unpersist
        out
      } finally { c.unpersist(blocking = true): Unit }
    }
    Seq(
      ("cachepin_basic_row_roundtrip", s => {
        import s.implicits._
        cached(Seq((1, "a"), (2, null), (3, "c")).toDF("k", "v"))(_.orderBy("k"))
      }),
      ("cachepin_numeric_families", s => {
        import s.implicits._
        cached(Seq((1.toByte, 2.toShort, 3, 4L, 5.5f, 6.5e0, true))
          .toDF("b", "s", "i", "l", "f", "d", "bool"))(identity)
      }),
      ("cachepin_decimal_scales", s =>
        cached(s.sql(
          """SELECT CAST(1.25 AS DECIMAL(4,2)) AS small,
            |CAST(12345678901234567890.123456789012345678 AS DECIMAL(38,18)) AS wide,
            |CAST(NULL AS DECIMAL(10,4)) AS n""".stripMargin))(identity)),
      ("cachepin_string_edge_values", s =>
        cached(s.sql("SELECT v FROM VALUES (''), ('héllo wörld'), (NULL), (repeat('x', 100)) t(v)"))(
          _.select(F.length(F.col("v")).as("len"), F.col("v")).orderBy(F.col("v").asc_nulls_first))),
      ("cachepin_binary_roundtrip", s =>
        cached(s.sql("SELECT unhex('0a0b7f') AS raw, CAST(NULL AS BINARY) AS n"))(identity)),
      ("cachepin_array_map_struct", s =>
        cached(s.sql(
          """SELECT array(1, NULL, 3) AS arr, map('k', 1.5e0) AS m,
            |named_struct('a', 1, 'b', array('x')) AS st""".stripMargin))(identity)),
      ("cachepin_nested_deep", s =>
        cached(s.sql(
          "SELECT array(named_struct('m', map('k', array(1, 2)))) AS deep"))(identity)),
      ("cachepin_datetime_types", s =>
        cached(s.sql(
          """SELECT DATE '2020-02-29' AS d, TIMESTAMP '2020-01-02 03:04:05.123456' AS ts,
            |TIMESTAMP_NTZ '2020-01-02 03:04:05' AS ntz""".stripMargin))(
          _.select(F.col("d").cast("string"), F.col("ts").cast("string"),
            F.col("ntz").cast("string")))),
      ("cachepin_interval_types", s =>
        cached(s.sql(
          "SELECT INTERVAL '1-2' YEAR TO MONTH AS ym, INTERVAL '3 04:05:06' DAY TO SECOND AS dt"))(
          _.select(F.col("ym").cast("string"), F.col("dt").cast("string")))),
      ("cachepin_null_heavy_column", s =>
        cached(s.sql("SELECT v FROM VALUES (NULL), (NULL), (7), (NULL) t(v)"))(
          _.orderBy(F.col("v").asc_nulls_first))),
      ("cachepin_filter_on_cached", s => {
        import s.implicits._
        // predicate over the cached relation: InMemoryTableScan's
        // stats-based batch pruning path must not change results
        cached((1 to 100).map(i => (i, i % 7)).toDF("id", "m"))(
          _.filter(F.col("m") === 3 && F.col("id") < 50)
            .agg(F.count(F.lit(1)).as("n"), F.sum("id").as("s")))
      }),
      ("cachepin_agg_over_cached", s => {
        import s.implicits._
        cached(Seq(("a", 1.5), ("a", 2.5), ("b", 3.0)).toDF("k", "v"))(
          _.groupBy("k").agg(F.sum("v").as("s"), F.avg("v").as("a")).orderBy("k"))
      }),
      ("cachepin_uncache_recompute_equality", s => {
        import s.implicits._
        val df = Seq((1, "x"), (2, "y")).toDF("k", "v")
        val c = df.cache(); c.count(): Unit
        val fromCache = c.orderBy("k").collect().map(_.toString).mkString(";")
        c.unpersist(blocking = true): Unit
        val recomputed = df.orderBy("k").collect().map(_.toString).mkString(";")
        Seq((fromCache, recomputed, fromCache == recomputed))
          .toDF("cached", "recomputed", "equal")
      }),
      ("cachepin_disk_only_level", s => {
        import s.implicits._
        // DISK_ONLY forces full serialize→disk→deserialize through the
        // engine codec (no partially-built in-memory shortcut)
        val df = Seq((1, "x", 2.5), (2, null, -0.5)).toDF("k", "v", "d")
        val c = df.persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
        c.count(): Unit
        try { val out = c.orderBy("k"); out.collect(): Unit; out }
        finally { c.unpersist(blocking = true): Unit }
      }),
      ("cachepin_sql_cache_table_face", s => {
        import s.implicits._
        Seq((1, "a"), (2, "b")).toDF("k", "v").createOrReplaceTempView("cachepin_t")
        s.sql("CACHE TABLE cachepin_t")
        try s.sql("SELECT k, upper(v) AS u FROM cachepin_t ORDER BY k")
        finally { s.sql("UNCACHE TABLE cachepin_t"): Unit }
      }),
      ("cachepin_join_two_cached_sides", s => {
        import s.implicits._
        val l = Seq((1, "l1"), (2, "l2")).toDF("k", "lv").cache()
        val r = Seq((1, 9.5), (3, 8.5)).toDF("k", "rv").cache()
        l.count(): Unit; r.count(): Unit
        try { val out = l.join(r, Seq("k"), "full_outer").orderBy("k")
          out.collect(): Unit; out }
        finally { l.unpersist(true): Unit; r.unpersist(true): Unit }
      }))
  }

  // ---- wave 7c: DSv2 SQL faces (GlutenDataSourceV2SQLSuite analog) ----
  // DDL/DML programs against the engine's own DSv2 catalogs (the lake
  // catalog = the table-format connector analog, the memory catalog =
  // the plain TableCatalog). Each pin creates its own uniquely-named
  // table, runs the SQL face under test, and returns a deterministic
  // SELECT; outputs are golden-pinned like every other entry.
  private def dsv2Pinned: Seq[(String, org.apache.spark.sql.SparkSession =>
      org.apache.spark.sql.DataFrame)] = {
    def lake(s: org.apache.spark.sql.SparkSession): Unit =
      s.conf.set("spark.sql.catalog.lake", classOf[graft.sources.GraftLakeCatalog].getName)
    def mem(s: org.apache.spark.sql.SparkSession): Unit =
      s.conf.set("spark.sql.catalog.mem", classOf[graft.sources.GraftMemoryCatalog].getName)
    Seq(
      ("dsv2sql_create_insert_select", s => {
        lake(s)
        s.sql("DROP TABLE IF EXISTS lake.dsv2pin_a")
        s.sql("CREATE TABLE lake.dsv2pin_a (id BIGINT, v STRING)")
        s.sql("INSERT INTO lake.dsv2pin_a VALUES (2, 'b'), (1, 'a')")
        s.sql("SELECT id, v FROM lake.dsv2pin_a ORDER BY id")
      }),
      ("dsv2sql_insert_overwrite_replaces", s => {
        lake(s)
        s.sql("DROP TABLE IF EXISTS lake.dsv2pin_b")
        s.sql("CREATE TABLE lake.dsv2pin_b (id BIGINT)")
        s.sql("INSERT INTO lake.dsv2pin_b VALUES (1), (2)")
        s.sql("INSERT OVERWRITE lake.dsv2pin_b VALUES (9)")
        s.sql("SELECT id FROM lake.dsv2pin_b ORDER BY id")
      }),
      ("dsv2sql_alter_add_column_null_pads", s => {
        lake(s)
        s.sql("DROP TABLE IF EXISTS lake.dsv2pin_c")
        s.sql("CREATE TABLE lake.dsv2pin_c (id BIGINT)")
        s.sql("INSERT INTO lake.dsv2pin_c VALUES (1)")
        s.sql("ALTER TABLE lake.dsv2pin_c ADD COLUMN tag STRING")
        s.sql("INSERT INTO lake.dsv2pin_c VALUES (2, 'new')")
        s.sql("SELECT id, tag FROM lake.dsv2pin_c ORDER BY id")
      }),
      ("dsv2sql_alter_rename_column_keeps_data", s => {
        lake(s)
        s.sql("DROP TABLE IF EXISTS lake.dsv2pin_d")
        s.sql("CREATE TABLE lake.dsv2pin_d (id BIGINT, old_name STRING)")
        s.sql("INSERT INTO lake.dsv2pin_d VALUES (1, 'x')")
        s.sql("ALTER TABLE lake.dsv2pin_d RENAME COLUMN old_name TO new_name")
        s.sql("SELECT id, new_name FROM lake.dsv2pin_d")
      }),
      ("dsv2sql_time_travel_version_as_of", s => {
        lake(s)
        s.sql("DROP TABLE IF EXISTS lake.dsv2pin_e")
        s.sql("CREATE TABLE lake.dsv2pin_e (id BIGINT)")
        s.sql("INSERT INTO lake.dsv2pin_e VALUES (1)")
        s.sql("INSERT INTO lake.dsv2pin_e VALUES (2)")
        s.sql("""SELECT (SELECT count(*) FROM lake.dsv2pin_e VERSION AS OF 1) AS at_v1,
                 (SELECT count(*) FROM lake.dsv2pin_e) AS current""")
      }),
      ("dsv2sql_delete_where_partition", s => {
        lake(s)
        s.sql("DROP TABLE IF EXISTS lake.dsv2pin_f")
        s.sql("CREATE TABLE lake.dsv2pin_f (id BIGINT, region STRING) PARTITIONED BY (region)")
        s.sql("INSERT INTO lake.dsv2pin_f VALUES (1, 'eu'), (2, 'us')")
        s.sql("DELETE FROM lake.dsv2pin_f WHERE region = 'eu'")
        s.sql("SELECT id, region FROM lake.dsv2pin_f ORDER BY id")
      }),
      ("dsv2sql_update_set_rewrites", s => {
        lake(s)
        s.sql("DROP TABLE IF EXISTS lake.dsv2pin_g")
        s.sql("CREATE TABLE lake.dsv2pin_g (id BIGINT, v DOUBLE)")
        s.sql("INSERT INTO lake.dsv2pin_g VALUES (1, 1.0), (2, 2.0)")
        s.sql("UPDATE lake.dsv2pin_g SET v = v * 10 WHERE id = 2")
        s.sql("SELECT id, v FROM lake.dsv2pin_g ORDER BY id")
      }),
      ("dsv2sql_merge_upsert", s => {
        lake(s)
        s.sql("DROP TABLE IF EXISTS lake.dsv2pin_h")
        s.sql("CREATE TABLE lake.dsv2pin_h (id BIGINT, v STRING)")
        s.sql("INSERT INTO lake.dsv2pin_h VALUES (1, 'keep'), (2, 'old')")
        s.sql("""MERGE INTO lake.dsv2pin_h t
                 USING (SELECT * FROM VALUES (2, 'updated'), (3, 'inserted') src(id, v)) s
                 ON t.id = s.id
                 WHEN MATCHED THEN UPDATE SET v = s.v
                 WHEN NOT MATCHED THEN INSERT (id, v) VALUES (s.id, s.v)""")
        s.sql("SELECT id, v FROM lake.dsv2pin_h ORDER BY id")
      }),
      ("dsv2sql_describe_table_columns", s => {
        lake(s)
        s.sql("DROP TABLE IF EXISTS lake.dsv2pin_i")
        s.sql("CREATE TABLE lake.dsv2pin_i (id BIGINT, v STRING)")
        s.sql("DESCRIBE TABLE lake.dsv2pin_i")
          .select("col_name", "data_type").orderBy("col_name")
      }),
      ("dsv2sql_show_tables_pattern", s => {
        lake(s)
        s.sql("DROP TABLE IF EXISTS lake.dsv2pin_j")
        s.sql("CREATE TABLE lake.dsv2pin_j (id BIGINT)")
        s.sql("SHOW TABLES IN lake LIKE 'dsv2pin_j*'")
      }),
      ("dsv2sql_history_metadata_versions", s => {
        lake(s)
        s.sql("DROP TABLE IF EXISTS lake.dsv2pin_k")
        s.sql("CREATE TABLE lake.dsv2pin_k (id BIGINT)")
        s.sql("INSERT INTO lake.dsv2pin_k VALUES (1)")
        s.sql("INSERT INTO lake.dsv2pin_k VALUES (2)")
        s.sql("SELECT version, row_count FROM lake.`dsv2pin_k$history` ORDER BY version")
      }),
      ("dsv2sql_files_per_partition_value", s => {
        lake(s)
        s.sql("DROP TABLE IF EXISTS lake.dsv2pin_l")
        s.sql("CREATE TABLE lake.dsv2pin_l (id BIGINT, p STRING) PARTITIONED BY (p)")
        s.sql("INSERT INTO lake.dsv2pin_l VALUES (1, 'a'), (2, 'a'), (3, 'b')")
        s.sql("SELECT count(*) AS n_files FROM lake.`dsv2pin_l$files`")
      }),
      ("dsv2sql_branch_isolation_then_publish", s => {
        lake(s)
        s.sql("DROP TABLE IF EXISTS lake.dsv2pin_m")
        s.sql("CREATE TABLE lake.dsv2pin_m (id BIGINT)")
        s.sql("INSERT INTO lake.dsv2pin_m VALUES (1)")
        s.sql("CALL lake.system.create_branch('dsv2pin_m', 'audit')")
        s.sql("INSERT INTO lake.`dsv2pin_m$branch$audit` VALUES (2)")
        val staged = s.sql("SELECT count(*) FROM lake.dsv2pin_m VERSION AS OF 'audit'").head.getLong(0)
        val mainBefore = s.sql("SELECT count(*) FROM lake.dsv2pin_m").head.getLong(0)
        s.sql("CALL lake.system.fast_forward('dsv2pin_m', 'audit')")
        val mainAfter = s.sql("SELECT count(*) FROM lake.dsv2pin_m").head.getLong(0)
        import s.implicits._
        Seq((staged, mainBefore, mainAfter)).toDF("staged", "main_before", "main_after")
      }),
      ("dsv2sql_mem_catalog_roundtrip", s => {
        mem(s)
        s.sql("DROP TABLE IF EXISTS mem.dsv2pin_n")
        s.sql("CREATE TABLE mem.dsv2pin_n (id BIGINT, v STRING)")
        s.sql("INSERT INTO mem.dsv2pin_n VALUES (1, 'x'), (2, 'y')")
        s.sql("SELECT id, v FROM mem.dsv2pin_n ORDER BY id")
      }),
      ("dsv2sql_ctas_lake", s => {
        lake(s)
        s.sql("DROP TABLE IF EXISTS lake.dsv2pin_o")
        s.sql("CREATE TABLE lake.dsv2pin_o AS SELECT 1L AS id, 'a' AS v")
        s.sql("SELECT id, v FROM lake.dsv2pin_o")
      }),
      ("dsv2sql_partition_pruning_filter", s => {
        lake(s)
        s.sql("DROP TABLE IF EXISTS lake.dsv2pin_p")
        s.sql("CREATE TABLE lake.dsv2pin_p (id BIGINT, p STRING) PARTITIONED BY (p)")
        s.sql("INSERT INTO lake.dsv2pin_p VALUES (1, 'a'), (2, 'b'), (3, 'b')")
        s.sql("SELECT id FROM lake.dsv2pin_p WHERE p = 'b' ORDER BY id")
      }))
  }

  /** every golden-pinned entry with its renderer; the "sql" column for
    * API pins is the label itself (shown on failure instead of SQL) */
  private val allPinned: Seq[(String, String, String => String)] =
    (pinned ++ decimalPinned ++ parseModePinned ++ collatePinned ++
      subqPinned ++ decaggPinned).map { case (l, s) => (l, s, render(_)) } ++
      charPinned.map { case (l, s) => (l, s, renderChar(_)) } ++
      decaggNonAnsiPinned.map { case (l, s) => (s"nonansi_$l", s, renderNonAnsi(_)) } ++
      // interval wave runs under BOTH ansi modes: ANSI interval types
      // overflow-check independent of the flag, and the pins prove it
      intervalPinned.map { case (l, s) => (l, s, render(_)) } ++
      intervalPinned.map { case (l, s) => (s"nonansi_$l", s, renderNonAnsi(_)) } ++
      noCodegenPinned.map { case (l, s) => (l, s, renderNoCodegen(_)) } ++
      nonAnsiPinned.map { case (l, s) => (l, s, renderNonAnsi(_)) } ++
      tzPinned ++
      apiPinned.map { case (l, f) =>
        (l, s"<DataFrame program $l>", (_: String) => renderDf(f(spark))) }

  if (sys.env.contains("GRAFT_REGEN_GOLDEN")) {
    test("REGENERATE golden file (review the diff — it IS the semantics change)") {
      val lines = allPinned.map { case (label, sql, r) => s"$label\t${r(sql)}" }
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
      val dups = allPinned.groupBy(_._1).filter(_._2.size > 1).keys
      assert(dups.isEmpty, s"duplicate pin labels: ${dups.mkString(", ")}")
      assert(golden.size == allPinned.size,
        s"golden has ${golden.size} entries, spec pins ${allPinned.size} — regenerate and review")
      val missing = allPinned.map(_._1).filterNot(golden.contains)
      assert(missing.isEmpty, s"missing golden entries: ${missing.mkString(", ")}")
    }

    allPinned.foreach { case (label, sql, r) =>
      test(s"pinned: $label") {
        assert(r(sql) == golden(label), s"\n  sql: $sql")
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

  // wave 11a/11c raising contracts (ANSI-on session default; the
  // decimal-agg overflow raising is ansi-gated and its ANSI-off
  // degrade-to-NULL twins are value-pinned as nonansi_decaggpin_*)
  wave11Errors.foreach { case (label, sql, condition) =>
    test(s"pinned: $label") {
      val e = intercept[Exception] { spark.sql(sql).collect() }
      assert(e.getMessage.contains(condition),
        s"expected error condition $condition, got: ${e.getMessage.take(300)}")
    }
  }

  // char/varchar width enforcement on table writes (needs the charpin_t
  // setup; raises in BOTH ansi modes — the length check is a
  // char/varchar constraint, not an ANSI gate). Non-trailing-space
  // excess raises; trailing-space excess is trimmed to fit (the
  // charpin_varchar_write_trims_trailing_to_fit value pin above).
  test("pinned: charpin_insert_over_length_errors (char and varchar)") {
    ensureCharTable()
    for (ins <- Seq("INSERT INTO charpin_t VALUES ('ab', 'abcdef')",
                    "INSERT INTO charpin_t VALUES ('abcdef', 'ab')")) {
      val e = intercept[Exception] { spark.sql(ins).collect() }
      assert(e.getMessage.contains("EXCEED_LIMIT_LENGTH"),
        s"$ins => ${e.getMessage.take(300)}")
    }
  }

  // wave-12 parquet read-path error contracts (the raising faces of
  // the pqpin_* value wave)
  test("pinned: pqpin_read_nonexistent_path_errors") {
    val e = intercept[Exception] {
      spark.read.parquet("/tmp/graft_pqpin/definitely_not_there").collect()
    }
    assert(e.getMessage.contains("PATH_NOT_FOUND"), e.getMessage.take(300))
  }

  test("pinned: pqpin_merge_incompatible_types_errors") {
    // two files whose shared column disagrees on type: schema merge
    // must REFUSE, not silently coerce
    pqFix(spark)
    import spark.implicits._
    val dir2 = s"$pqBase/evo_conflict"
    Seq((1L, 10)).toDF("id", "a").coalesce(1).write.mode("overwrite").parquet(dir2)
    Seq((2L, "x")).toDF("id", "a").coalesce(1).write.mode("append").parquet(dir2)
    val e = intercept[Exception] {
      spark.read.option("mergeSchema", "true").parquet(dir2).collect()
    }
    assert(e.getMessage.contains("CANNOT_MERGE_SCHEMAS") ||
      e.getMessage.contains("Failed merging schema"), e.getMessage.take(400))
  }

  test("pinned: pqpin_case_sensitive_missing_column_errors") {
    // under case-SENSITIVE resolution the upper-cased column no longer
    // resolves against the file's lower-case schema
    pqFix(spark)
    val k = "spark.sql.caseSensitive"
    val orig = spark.conf.getOption(k)
    spark.conf.set(k, "true")
    try {
      val e = intercept[Exception] {
        spark.read.parquet(s"$pqBase/flat").select("ID").collect()
      }
      assert(e.getMessage.contains("UNRESOLVED_COLUMN"), e.getMessage.take(300))
    } finally orig.fold(spark.conf.unset(k))(spark.conf.set(k, _))
  }

  // interval overflow raises under BOTH ansi modes — the ANSI interval
  // types carry their own range checks, unlike int/long arithmetic
  // whose raising is ansi-gated (wave 10a contracts)
  intervalErrors.foreach { case (label, sql, condition) =>
    test(s"pinned: $label (both ansi modes)") {
      for (ansi <- Seq("true", "false")) {
        val orig = spark.conf.getOption("spark.sql.ansi.enabled")
        spark.conf.set("spark.sql.ansi.enabled", ansi)
        try {
          val e = intercept[Exception] { spark.sql(sql).collect() }
          assert(e.getMessage.toLowerCase.contains(condition.toLowerCase),
            s"ansi=$ansi: expected '$condition' in: ${e.getMessage.take(300)}")
        } finally orig.fold(spark.conf.unset("spark.sql.ansi.enabled"))(
          spark.conf.set("spark.sql.ansi.enabled", _))
      }
    }
  }
}
