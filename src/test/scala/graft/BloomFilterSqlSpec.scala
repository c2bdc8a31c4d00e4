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

  test("custom typed aggregates are SQL-callable (topk_freq, top_k_by_score)") {
    val freq = spark.sql(
      """SELECT topk_freq(w, 4) FROM VALUES ('a'),('b'),('a') t(w)""").head()
      .getSeq[org.apache.spark.sql.Row](0).map(r => (r.getString(0), r.getLong(1)))
    assert(freq == Seq(("a", 2L), ("b", 1L)))
    val top = spark.sql(
      """SELECT top_k_by_score(s, id, 2)
        |FROM VALUES (1.0d, 1L),(3.0d, 2L),(2.0d, 3L) t(s, id)""".stripMargin).head()
      .getSeq[org.apache.spark.sql.Row](0).map(r => (r.getDouble(0), r.getLong(1)))
    assert(top == Seq((3.0, 2L), (2.0, 3L)))
  }
}
