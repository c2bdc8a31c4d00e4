package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Partitioning surface (SURVEY §2.8): explicit distribution control —
  * hash/range repartitioning, DISTRIBUTE BY / CLUSTER BY SQL, and
  * partition-local sort — the primitives 100 TB layouts are built from
  * (write-side locality, co-located consumers, skew control).
  */
class PartitioningSpec extends AnyFunSuite {
  private lazy val spark = GraftSparkSession.spark
  private val dir = GraftSparkSession.sfDir

  private lazy val orders = Tables.load(spark, dir, "orders")

  test("repartition(col) co-locates every key in exactly one partition") {
    val parts = orders.repartition(8, col("o_custkey"))
      .select(col("o_custkey"), spark_partition_id().as("pid"))
      .groupBy(col("o_custkey"))
      .agg(countDistinct(col("pid")).as("n_parts"))
    assert(parts.filter(col("n_parts") =!= 1).count() == 0)
  }

  test("repartitionByRange plans RangePartitioning and orders partitions") {
    val df = orders.repartitionByRange(6, col("o_totalprice"))
    assert(df.queryExecution.executedPlan.toString.contains("rangepartitioning"),
      df.queryExecution.executedPlan.toString.take(800))
    // ranges are disjoint: each partition's [min,max] must not overlap others'
    val ranges = df.select(col("o_totalprice"), spark_partition_id().as("pid"))
      .groupBy(col("pid"))
      .agg(min(col("o_totalprice")).as("lo"), max(col("o_totalprice")).as("hi"))
      .collect().map(r => (r.getDouble(1), r.getDouble(2))).sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array((_, hiA), (loB, _)) => assert(hiA <= loB)
      case _ =>
    }
  }

  test("sortWithinPartitions keeps rows ordered inside each partition") {
    val df = orders.repartition(4, col("o_orderstatus"))
      .sortWithinPartitions(col("o_orderdate"))
      .select(col("o_orderdate"), spark_partition_id().as("pid"))
    val ok = df.mapPartitions { it =>
      // o_orderdate is TIMESTAMP_NTZ => external type LocalDateTime
      val ts = it.map(_.getAs[java.time.LocalDateTime](0)).toSeq
      Iterator.single(ts.zip(ts.drop(1)).forall { case (a, b) => !a.isAfter(b) })
    }(org.apache.spark.sql.Encoders.scalaBoolean).collect()
    assert(ok.forall(identity))
  }

  test("SQL DISTRIBUTE BY / CLUSTER BY plan hash distribution (+ sort)") {
    Tables.registerAll(spark, dir)
    val dist = spark.sql("SELECT o_orderkey FROM orders DISTRIBUTE BY o_custkey")
    assert(dist.queryExecution.executedPlan.toString.contains("hashpartitioning(o_custkey"))
    val clus = spark.sql("SELECT o_orderkey, o_custkey FROM orders CLUSTER BY o_custkey")
    val plan = clus.queryExecution.executedPlan.toString
    assert(plan.contains("hashpartitioning(o_custkey") && plan.contains("Sort [o_custkey"),
      plan.take(1200))
  }
}
