package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** ANSI-mode semantics (SURVEY "hard parts": the reference simply falls
  * back on ANSI mode — we inherit exact behavior from Spark and pin it
  * here): arithmetic overflow, invalid casts and division by zero raise;
  * the try_* family and explicit non-ANSI casts give NULL instead.
  * Spark 4 defaults ANSI on, which the whole query library runs under.
  */
class AnsiBehaviorSpec extends AnyFunSuite {
  private lazy val spark = GraftSparkSession.spark
  import spark.implicits._

  test("session runs with ANSI enabled") {
    assert(spark.conf.get("spark.sql.ansi.enabled") == "true")
  }

  test("bigint overflow raises; try_add returns NULL") {
    val df = Seq(Long.MaxValue).toDF("x")
    // surfaces as SparkArithmeticException (an ArithmeticException with
    // SparkThrowable), not a SparkException subclass
    val e = intercept[Exception] {
      df.select(col("x") + 1L).collect()
    }
    assert(e.getMessage.toLowerCase.contains("overflow"))
    assert(df.select(expr("try_add(x, 1L)")).head().isNullAt(0))
  }

  test("invalid string-to-int cast raises; try_cast returns NULL") {
    val df = Seq("notanumber").toDF("s")
    intercept[Exception] { df.select(col("s").cast("int")).collect() }
    assert(df.select(expr("try_cast(s AS INT)")).head().isNullAt(0))
  }

  test("integer division by zero raises; try_divide returns NULL") {
    val df = Seq((1L, 0L)).toDF("a", "b")
    intercept[Exception] { df.select(col("a") / col("b")).collect() }
    assert(df.select(expr("try_divide(a, b)")).head().isNullAt(0))
  }

  test("array index out of bounds raises; try_element_at returns NULL") {
    val df = Seq(Seq("x")).toDF("arr")
    intercept[Exception] { df.select(element_at(col("arr"), 5)).collect() }
    assert(df.select(expr("try_element_at(arr, 5)")).head().isNullAt(0))
  }
}
