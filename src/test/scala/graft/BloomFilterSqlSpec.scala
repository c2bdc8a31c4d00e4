package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Explicit bloom-filter SQL surface (GraftExtensions registers Spark's
  * internal BloomFilterAggregate/BloomFilterMightContain under SQL
  * names, mirroring the reference's VeloxBloomFilter pair): build a
  * filter over one table, probe another through a scalar subquery —
  * no false negatives, bounded false positives.
  */
class BloomFilterSqlSpec extends AnyFunSuite {
  private lazy val spark = GraftSparkSession.spark
  private val dir = GraftSparkSession.sfDir

  test("bloom semi-filter keeps every true match and few extras") {
    Tables.registerAll(spark, dir)
    val probed = spark.sql(
      """SELECT l_orderkey, l_suppkey FROM lineitem
        |WHERE might_contain(
        |  (SELECT bloom_filter_agg(xxhash64(s_suppkey)) FROM supplier WHERE s_acctbal > 5000),
        |  xxhash64(l_suppkey))""".stripMargin)
    val exact = spark.sql(
      """SELECT l_orderkey, l_suppkey FROM lineitem
        |WHERE l_suppkey IN (SELECT s_suppkey FROM supplier WHERE s_acctbal > 5000)""".stripMargin)
    val nProbed = probed.count()
    val nExact = exact.count()
    // no false negatives: the probe is a superset of the exact semi join
    assert(exact.exceptAll(probed).count() == 0)
    // default 1M-item sizing on a tiny key set => false positives ~0
    assert(nProbed <= nExact * 1.05 + 10, s"probed=$nProbed exact=$nExact")
  }

  test("bloom filter aggregate serializes through the DataFrame API") {
    val bf = Tables.load(spark, dir, "supplier")
      .agg(expr("bloom_filter_agg(xxhash64(s_suppkey), 1000L, 8192L)").as("bf"))
      .head().getAs[Array[Byte]](0)
    assert(bf.nonEmpty)
  }
}
