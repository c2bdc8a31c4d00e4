package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Functions from SURVEY §2.10 with no DuckDB-oracle equivalent —
  * checked against fixed expected values / structural properties
  * (reference analog: ScalarFunctionsValidateSuite rows whose semantics
  * are engine-specific).
  */
class MiscFunctionsSpec extends AnyFunSuite {
  private lazy val spark = GraftSparkSession.spark
  import spark.implicits._

  test("soundex follows the published algorithm") {
    val got = Seq("Robert", "Rupert", "Ashcraft", "Tymczak", "Pfister")
      .toDF("s").select(soundex(col("s"))).as[String].collect().toSeq
    assert(got == Seq("R163", "R163", "A261", "T522", "P236"))
  }

  test("format_number groups thousands and rounds") {
    val got = Seq(1234567.891, 0.5).toDF("x")
      .select(format_number(col("x"), 2)).as[String].collect().toSeq
    assert(got == Seq("1,234,567.89", "0.50"))
  }

  test("uuid() yields well-formed distinct values per row") {
    val ids = spark.range(100).select(expr("uuid()").as("u")).as[String].collect()
    assert(ids.distinct.length == 100)
    assert(ids.forall(_.matches("[0-9a-f]{8}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{12}")))
  }

  test("monotonically_increasing_id is increasing within a partition") {
    val df = spark.range(1000).repartition(4)
      .select(monotonically_increasing_id().as("id"), spark_partition_id().as("p"))
    val rows = df.collect().map(r => (r.getInt(1), r.getLong(0)))
    rows.groupBy(_._1).values.foreach { part =>
      val ids = part.map(_._2).toSeq
      assert(ids == ids.sorted && ids.distinct.size == ids.size)
    }
  }

  test("url_encode/url_decode round-trip and match known encodings") {
    val got = Seq("a b&c=d", "plain").toDF("s")
      .select(expr("url_encode(s)").as("enc"), expr("url_decode(url_encode(s))").as("rt"))
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(got == Seq(("a+b%26c%3Dd", "a b&c=d"), ("plain", "plain")))
  }

  test("luhn_check validates card-number checksums") {
    val got = Seq("79927398713", "79927398710", "4111111111111111").toDF("s")
      .select(expr("luhn_check(s)")).as[Boolean].collect().toSeq
    assert(got == Seq(true, false, true))
  }

  test("sentences tokenizes into sentence/word nesting") {
    val got = spark.sql("SELECT sentences('Hi there. Bye now.')")
      .first().getSeq[Seq[String]](0)
    assert(got == Seq(Seq("Hi", "there"), Seq("Bye", "now")))
  }

  test("raise_error raises and assert_true passes on true") {
    val ok = spark.range(1).select(expr("assert_true(id >= 0)")).collect()
    assert(ok.length == 1)
    val e = intercept[Exception] {
      spark.range(1).select(expr("raise_error('boom')")).collect()
    }
    assert(e.getMessage.contains("boom"))
  }

  test("parameterized SQL binds named and positional parameters") {
    spark.range(10).createOrReplaceTempView("param_t")
    val named = spark.sql("SELECT count(*) FROM param_t WHERE id < :lim",
      Map("lim" -> 4)).head().getLong(0)
    assert(named == 4L)
    val positional = spark.sql("SELECT count(*) FROM param_t WHERE id < ? OR id > ?",
      Array(2, 7)).head().getLong(0)
    assert(positional == 4L)
  }

  test("IDENTIFIER clause resolves table and column names from parameters") {
    spark.range(5).selectExpr("id", "id * 2 AS dbl").createOrReplaceTempView("ident_t")
    val n = spark.sql(
      "SELECT sum(IDENTIFIER(:col)) FROM IDENTIFIER(:tab) ",
      Map("col" -> "dbl", "tab" -> "ident_t")).head().getLong(0)
    assert(n == 20L)
  }
}
