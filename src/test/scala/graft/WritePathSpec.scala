package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Write-path plan + filesystem contracts (wave 13a's non-value half;
  * the value pins are the `wrpin_*` golden entries): the required sort
  * order of partitioned writes (GlutenV1WriteCommandSuite analog) and
  * the physical-file semantics of dynamic partition overwrite. */
class WritePathSpec extends AnyFunSuite {
  private lazy val spark = GraftSparkSession.spark

  test("partitioned INSERT plans a Sort on the partition column below the write") {
    spark.sql("DROP TABLE IF EXISTS wps_t1")
    spark.sql("CREATE TABLE wps_t1 (k INT) USING parquet PARTITIONED BY (p STRING)")
    // V1Writes requires partitioned writes sorted by the partition
    // expressions so each task holds ONE open file per partition value
    // instead of one per (value, arrival order) — the at-scale
    // small-files/memory defence. The contract is visible in the plan:
    // a Sort on p below the InsertIntoHadoopFsRelationCommand/WriteFiles.
    val plan = spark.sql(
      "EXPLAIN FORMATTED INSERT INTO wps_t1 SELECT id AS k, CAST(id % 3 AS STRING) AS p FROM range(10)")
      .head.getString(0)
    assert(plan.contains("WriteFiles"),
      "expected a file-write node:\n" + plan.take(2000))
    // formatted explain splits node and arguments: the Sort node sits
    // under WriteFiles and its Arguments order by the partition column
    assert("\\(\\d+\\) Sort".r.findFirstIn(plan).isDefined &&
      "Arguments: \\[p#\\d+ ASC NULLS FIRST\\]".r.findFirstIn(plan).isDefined,
      "partitioned write must sort by the partition column:\n" + plan.take(3000))
  }

  test("dynamic partition overwrite leaves untouched partitions' FILES physically in place") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("wps_dyn").toString + "/t"
    Seq((1, "a"), (2, "b"), (3, "c")).toDF("k", "p")
      .repartition(1).write.partitionBy("p").parquet(base)
    def filesUnder(sub: String): Set[String] = {
      val d = new java.io.File(s"$base/p=$sub")
      d.listFiles().map(_.getName).filter(n => !n.endsWith(".crc")).toSet
    }
    val aBefore = filesUnder("a")
    val cBefore = filesUnder("c")
    Seq((20, "b")).toDF("k", "p").repartition(1)
      .write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
      .partitionBy("p").parquet(base)
    // untouched partitions keep their exact files (no rewrite, no
    // rename) — only the touched partition's files are replaced
    assert(filesUnder("a") == aBefore && filesUnder("c") == cBefore,
      "dynamic overwrite must not touch unmodified partitions' files")
    val back = spark.read.parquet(base).orderBy("k")
      .collect().map(r => (r.getInt(0), r.getString(1))).toSeq
    assert(back == Seq((1, "a"), (3, "c"), (20, "b")))
  }

  test("static overwrite removes the whole table directory contents first") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("wps_stat").toString + "/t"
    Seq((1, "a"), (2, "b")).toDF("k", "p")
      .repartition(1).write.partitionBy("p").parquet(base)
    Seq((20, "b")).toDF("k", "p").repartition(1)
      .write.mode("overwrite").partitionBy("p").parquet(base)
    assert(!new java.io.File(s"$base/p=a").exists(),
      "static overwrite must drop partitions the new write does not touch")
    assert(spark.read.parquet(base).collect().map(_.getInt(0)).toSeq == Seq(20))
  }
}
