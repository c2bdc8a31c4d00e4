package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.hive.GraftHiveUdfBridge
import org.scalatest.funsuite.AnyFunSuite

/** Hive UDF pass-through (SURVEY §2.11: the reference needs a dedicated
  * HiveUDFTransformer + partial-project fallback for these; Spark's
  * wrapper expressions run them natively — exercised here through
  * GraftHiveUdfBridge without requiring a Hive-enabled catalog).
  */
class HiveUdfSpec extends AnyFunSuite {
  private lazy val spark = GraftSparkSession.spark
  import spark.implicits._

  test("a Hive GenericUDF evaluates over columns") {
    val got = Seq("graft engine", "As-Of").toDF("s")
      .select(GraftHiveUdfBridge.genericUdf(
        "org.apache.hadoop.hive.ql.udf.generic.GenericUDFUpper", col("s")))
      .as[String].collect().toSeq
    assert(got == Seq("GRAFT ENGINE", "AS-OF"))
  }

  test("a legacy (simple) Hive UDF evaluates over table data") {
    val nation = Tables.load(spark, GraftSparkSession.sfDir, "nation")
    val rows = nation
      .select(col("n_name"),
        GraftHiveUdfBridge.simpleUdf("org.apache.hadoop.hive.ql.udf.UDFAscii", col("n_name")).as("a"))
      .orderBy(col("n_name")).collect()
    rows.foreach(r => assert(r.getInt(1) == r.getString(0).head.toInt))
  }

  test("Hive UDFs compose with built-in expressions in one projection") {
    val got = Seq("spark").toDF("s")
      .select(concat(
        GraftHiveUdfBridge.genericUdf(
          "org.apache.hadoop.hive.ql.udf.generic.GenericUDFUpper", col("s")),
        lit("-"), reverse(col("s"))))
      .as[String].head()
    assert(got == "SPARK-kraps")
  }
}
