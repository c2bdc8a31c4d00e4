package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** V2 write path through a custom TableCatalog (SURVEY §2.1 "V2 writes"):
  * writeTo create/append, read-back via spark.table, overwrite via
  * truncate, and round-tripping through the task→driver commit-message
  * protocol.
  */
class MemoryCatalogSpec extends AnyFunSuite {
  private lazy val spark = {
    val s = GraftSparkSession.spark
    s.conf.set("spark.sql.catalog.mem", classOf[graft.sources.GraftMemoryCatalog].getName)
    s
  }
  private val dir = GraftSparkSession.sfDir

  test("writeTo create populates a V2 table readable by spark.table") {
    val nation = Tables.load(spark, dir, "nation")
    nation.writeTo("mem.nation_v2").create()
    val back = spark.table("mem.nation_v2")
    assert(back.schema.fields.map(_.name).toSeq == nation.schema.fields.map(_.name).toSeq)
    assert(back.orderBy("n_nationkey").collect().toSeq ==
      nation.orderBy("n_nationkey").collect().toSeq)
  }

  test("writeTo append accumulates; overwrite truncates first") {
    val nation = Tables.load(spark, dir, "nation")
    val n = nation.count()
    nation.writeTo("mem.nation_app").create()
    nation.limit(3).writeTo("mem.nation_app").append()
    assert(spark.table("mem.nation_app").count() == n + 3)
    // overwrite-by-truncate through the V1 DataFrameWriter against the v2 catalog
    nation.limit(5).write.mode("overwrite").saveAsTable("mem.nation_app")
    assert(spark.table("mem.nation_app").count() == 5)
  }

  test("V2 table participates in joins with file-sourced data") {
    val region = Tables.load(spark, dir, "region")
    region.writeTo("mem.region_v2").create()
    val joined = Tables.load(spark, dir, "nation")
      .join(spark.table("mem.region_v2"), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name")).agg(count(lit(1)).as("n_nations"))
    assert(joined.agg(sum(col("n_nations"))).head().getLong(0) ==
      Tables.load(spark, dir, "nation").count())
  }
}
