package graft

import java.sql.{Date, Timestamp}

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Type-matrix coverage (FIXTURES.md §2; reference analog:
  * VeloxParquetDataTypeValidationSuite over data-type-validation-data):
  * one column per supported type from SURVEY.md §1, pushed through the
  * operator families (filter/project/agg/join/sort/window/limit) and a
  * parquet round-trip.
  */
class TypeMatrixSpec extends AnyFunSuite {
  private lazy val spark = GraftSparkSession.spark

  private val schema = StructType(Seq(
    StructField("id", IntegerType, nullable = false),
    StructField("c_bool", BooleanType),
    StructField("c_byte", ByteType),
    StructField("c_short", ShortType),
    StructField("c_int", IntegerType),
    StructField("c_long", LongType),
    StructField("c_float", FloatType),
    StructField("c_double", DoubleType),
    StructField("c_string", StringType),
    StructField("c_binary", BinaryType),
    StructField("c_date", DateType),
    StructField("c_ts", TimestampType),
    StructField("c_dec", DecimalType(18, 2)),
    StructField("c_arr", ArrayType(IntegerType)),
    StructField("c_map", MapType(StringType, IntegerType)),
    StructField("c_struct", StructType(Seq(
      StructField("a", IntegerType), StructField("b", StringType))))))

  private def row(i: Int): Row = Row(
    i, i % 2 == 0, (i % 100).toByte, (i * 3).toShort, i * 7, i.toLong * 1000003L,
    i / 3.0f, i / 7.0, s"s$i", s"b$i".getBytes("UTF-8"),
    Date.valueOf(f"2020-${i % 12 + 1}%02d-15"), Timestamp.valueOf(f"2020-01-01 ${i % 24}%02d:00:00"),
    new java.math.BigDecimal(s"$i.25"), Seq(i, i + 1, i + 2), Map("k" -> i),
    Row(i, s"n$i"))

  private lazy val df = {
    val d = spark.createDataFrame(
      spark.sparkContext.parallelize((1 to 200).map(row), 4), schema)
    d.cache(); d.count(); d
  }

  test("filter + project across every type") {
    val out = df.filter(col("c_bool") && col("c_byte") >= 0 && col("c_short") > 30 &&
        col("c_int") > 70 && col("c_long") > 0L && col("c_float") > 1.0f &&
        col("c_double") > 1.0 && col("c_string").startsWith("s") &&
        col("c_date") >= lit("2020-01-01").cast("date") &&
        col("c_ts") >= lit("2020-01-01 00:00:00").cast("timestamp") &&
        col("c_dec") > BigDecimal(10) && size(col("c_arr")) === 3 &&
        col("c_map.k") > 10 && col("c_struct.a") > 10)
      .select(col("id"), length(col("c_binary")).as("bl"))
    assert(out.count() > 0)
  }

  test("aggregate on every orderable type") {
    val agg = df.agg(
      count(col("c_bool")), min(col("c_byte")), max(col("c_short")), sum(col("c_int")),
      sum(col("c_long")), avg(col("c_float")), avg(col("c_double")), max(col("c_string")),
      min(col("c_date")), max(col("c_ts")), sum(col("c_dec")), countDistinct(col("c_struct"))).head
    assert(agg.getLong(0) == 200)
    assert(agg.getDecimal(10) != null)
  }

  test("join on decimal, sort on timestamp+struct, window over date") {
    val j = df.alias("a").join(df.alias("b"),
      col("a.c_dec") === col("b.c_dec") && col("a.id") === col("b.id"))
    assert(j.count() == 200)
    val sorted = df.orderBy(col("c_ts").desc, col("c_struct")).select(col("id")).head
    assert(sorted.getInt(0) > 0)
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(month(col("c_date"))).orderBy(col("id"))
    assert(df.select(row_number().over(w).as("rn")).filter(col("rn") === 1).count() == 12)
  }

  test("group by map-extracted and struct fields") {
    val g = df.groupBy(col("c_struct.b")).agg(sum(col("c_map.k")).as("sk"))
    assert(g.count() == 200)
  }

  test("parquet round-trip preserves all types") {
    val tmp = java.nio.file.Files.createTempDirectory("typematrix").toString
    df.write.mode("overwrite").parquet(tmp)
    val back = spark.read.parquet(tmp)
    assert(back.schema.fields.map(f => (f.name, f.dataType)).toSet ==
      df.schema.fields.map(f => (f.name, f.dataType)).toSet)
    assert(back.count() == 200)
    val a = df.orderBy(col("id")).collect()
    val b = back.orderBy(col("id")).collect()
    a.zip(b).foreach { case (x, y) =>
      assert(x.getInt(0) == y.getInt(0))
      assert(x.getAs[Row]("c_struct") == y.getAs[Row]("c_struct"))
      assert(x.getAs[Map[String, Int]]("c_map") == y.getAs[Map[String, Int]]("c_map"))
    }
  }

  test("orc round-trip preserves nested types") {
    val tmp = java.nio.file.Files.createTempDirectory("typematrix_orc").toString
    df.write.mode("overwrite").orc(tmp)
    val back = spark.read.orc(tmp)
    assert(back.count() == 200)
    assert(back.schema("c_struct").dataType == df.schema("c_struct").dataType)
  }

  test("csv and json round-trips for flat columns") {
    val flat = df.select("id", "c_int", "c_double", "c_string", "c_date")
    for (fmt <- Seq("csv", "json")) {
      val tmp = java.nio.file.Files.createTempDirectory(s"rt_$fmt").toString
      flat.write.mode("overwrite").option("header", "true").format(fmt).save(tmp)
      val back = spark.read.option("header", "true").option("inferSchema", "true").format(fmt).load(tmp)
      assert(back.count() == 200, s"$fmt round trip")
    }
  }

  test("timestamp_ntz columns are first-class (reference hard-falls-back)") {
    val ntz = df.select(col("id"), col("c_ts").cast(TimestampNTZType).as("ntz"))
      .filter(col("ntz") >= lit("2020-01-01 00:00:00").cast(TimestampNTZType))
    assert(ntz.count() == 200)
  }
}
