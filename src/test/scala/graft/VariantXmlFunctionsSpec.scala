package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Spark-4 semi-structured surfaces with no DuckDB oracle: the VARIANT
  * type's engine-specific outputs (schema inference, canonical JSON,
  * malformed-input behavior) and the XML function family (DuckDB has no
  * XML support). Typed variant_get extraction IS oracled — `fn_variant`
  * in ScalarOps. Reference analog: the reference validates JSON through
  * JsonFunctionsValidateSuite and falls back for XML; here both run
  * native. */
class VariantXmlFunctionsSpec extends AnyFunSuite {
  private lazy val spark = GraftSparkSession.spark
  import spark.implicits._

  // ---- VARIANT ----

  test("schema_of_variant infers object shape; to_json canonicalizes") {
    val row = Seq("""{"b": 2, "a": [1, 2.5, "x"]}""").toDF("j")
      .select(schema_of_variant(parse_json(col("j"))).as("sch"),
        to_json(parse_json(col("j"))).as("canon"))
      .head()
    assert(row.getString(0) == "OBJECT<a: ARRAY<VARIANT>, b: BIGINT>", row.getString(0))
    // canonical form: fields sorted, whitespace dropped
    assert(row.getString(1) == """{"a":[1,2.5,"x"],"b":2}""", row.getString(1))
  }

  test("try_parse_json nulls malformed input; parse_json raises") {
    val got = Seq("""{"k": 1}""", "not json", "[1,").toDF("j")
      .select(try_parse_json(col("j")).isNull.as("bad")).as[Boolean].collect().toSeq
    assert(got == Seq(false, true, true))
    intercept[org.apache.spark.SparkException] {
      Seq("not json").toDF("j").select(parse_json(col("j"))).collect()
    }
  }

  test("variant round-trips through a parquet sink (binary shredding)") {
    val dir = java.nio.file.Files.createTempDirectory("variant_pq").toString
    Seq((1L, """{"k": 7, "tags": ["a", "b"]}"""), (2L, """{"k": 9}"""))
      .toDF("id", "j").select(col("id"), parse_json(col("j")).as("v"))
      .write.mode("overwrite").parquet(dir)
    val back = spark.read.parquet(dir)
      .select(col("id"),
        variant_get(col("v"), "$.k", "int").as("k"),
        variant_get(col("v"), "$.tags[1]", "string").as("t1"))
      .orderBy("id").collect()
    assert(back.map(r => (r.getLong(0), r.getInt(1))).toSeq == Seq((1L, 7), (2L, 9)))
    assert(back.head.getString(2) == "b" && back(1).isNullAt(2))
  }

  // ---- XML ----

  test("from_xml parses nested elements into a struct") {
    val xml = "<row><id>7</id><tags><tag>a</tag><tag>b</tag></tags></row>"
    val row = Seq(xml).toDF("x")
      .select(from_xml(col("x"),
        org.apache.spark.sql.types.StructType.fromDDL(
          "id INT, tags STRUCT<tag: ARRAY<STRING>>")).as("r"))
      .select(col("r.id"), col("r.tags.tag").as("tags"))
      .head()
    assert(row.getInt(0) == 7)
    assert(row.getSeq[String](1) == Seq("a", "b"))
  }

  test("xpath family extracts typed values") {
    val xml = "<doc><n>42</n><n>8</n><name>graft</name><ok>true</ok></doc>"
    val row = Seq(xml).toDF("x").select(
      xpath(col("x"), lit("//n/text()")).as("all_n"),
      xpath_int(col("x"), lit("/doc/n[1]/text()")).as("first_n"),
      xpath_long(col("x"), lit("sum(//n)")).as("sum_n"),
      xpath_double(col("x"), lit("/doc/n[2]/text()")).as("second_d"),
      xpath_string(col("x"), lit("/doc/name")).as("nm"),
      xpath_boolean(col("x"), lit("/doc/ok='true'")).as("ok"))
      .head()
    assert(row.getSeq[String](0) == Seq("42", "8"))
    assert(row.getInt(1) == 42 && row.getLong(2) == 50L)
    assert(row.getDouble(3) == 8.0)
    assert(row.getString(4) == "graft" && row.getBoolean(5))
  }

  test("XML data source round-trips rows through files") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("xml_src").toString + "/out"
    Seq((1L, "emea", 1.5), (2L, "apac", 2.5)).toDF("id", "region", "v")
      .write.format("xml").option("rootTag", "rows").option("rowTag", "row").save(dir)
    val back = spark.read.format("xml").option("rowTag", "row").load(dir)
      .select(col("id").cast("long"), col("region"), col("v").cast("double"))
      .orderBy("id").as[(Long, String, Double)].collect().toSeq
    assert(back == Seq((1L, "emea", 1.5), (2L, "apac", 2.5)), back.toString)
  }

  test("COLLATE UTF8_LCASE compares, groups, and joins case-insensitively") {
    import spark.implicits._
    // comparison semantics
    assert(spark.sql("SELECT 'GRAFT' COLLATE UTF8_LCASE = 'graft'").head.getBoolean(0))
    assert(!spark.sql("SELECT 'GRAFT' = 'graft'").head.getBoolean(0))
    // grouping under a case-insensitive collation merges case variants
    val counts = Seq("Spark", "SPARK", "spark", "flink")
      .toDF("s")
      .selectExpr("s COLLATE UTF8_LCASE AS sc")
      .groupBy("sc").count()
      .collect().map(r => (r.getString(0).toLowerCase, r.getLong(1))).toMap
    assert(counts == Map("spark" -> 3L, "flink" -> 1L), counts.toString)
    // ORDER BY under the collation is case-insensitive
    val sorted = Seq("b", "A", "a", "B").toDF("s")
      .selectExpr("s COLLATE UTF8_LCASE AS sc").orderBy("sc")
      .collect().map(_.getString(0).toLowerCase).toSeq
    assert(sorted == Seq("a", "a", "b", "b"), sorted.toString)
  }

  test("to_xml renders a struct row; schema_of_xml infers") {
    val out = Seq((5, "emea")).toDF("id", "region")
      .select(to_xml(struct(col("id"), col("region")))).as[String].head()
    assert(out.contains("<id>5</id>") && out.contains("<region>emea</region>"), out)
    val sch = Seq("<r><a>1</a><b>x</b></r>").toDF("x")
      .select(schema_of_xml(lit("<r><a>1</a><b>x</b></r>"))).as[String].head()
    assert(sch.contains("a") && sch.contains("b"), sch)
  }
}
