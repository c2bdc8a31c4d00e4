package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Skew mitigation by key salting (the manual complement to AQE's
  * skew-join splitting, per the 100 TB design checklist): a hot key is
  * split across N salt buckets; the dim side replicates per salt so the
  * join is still an equi-join, and the hot key's rows spread over N
  * tasks instead of one.
  */
class SaltedJoinSpec extends AnyFunSuite {
  private lazy val spark = GraftSparkSession.spark

  test("salted join equals direct join and spreads the hot key across partitions") {
    import spark.implicits._
    val salts = 8
    // heavily skewed fact: 90% of rows share key 1
    val fact = (1 to 20000).map(i => (if (i % 10 == 0) (i % 50).toLong else 1L, i.toLong))
      .toDF("k", "v")
    val dim = (0 to 49).map(i => (i.toLong, s"d$i")).toDF("dk", "name")

    val direct = fact.join(dim, col("k") === col("dk"))
      .groupBy(col("name")).agg(count(lit(1)).as("n"), sum(col("v")).as("s"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet

    val saltedFact = fact.withColumn("salt", pmod(xxhash64(col("v")), lit(salts)).cast("int"))
    val saltedDim = dim.withColumn("salt", explode(sequence(lit(0), lit(salts - 1))))
    val salted = saltedFact.join(saltedDim, col("k") === col("dk") && saltedFact("salt") === saltedDim("salt"))
      .groupBy(col("name")).agg(count(lit(1)).as("n"), sum(col("v")).as("s"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet

    assert(salted == direct, "salting must not change join semantics")

    // the hot key's rows now hash to multiple (k, salt) shuffle keys
    val spread = saltedFact.filter(col("k") === 1L)
      .select(col("salt")).distinct().count()
    assert(spread == salts, s"hot key should spread over $salts salt buckets, got $spread")
  }
}
