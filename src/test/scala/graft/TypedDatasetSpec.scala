package graft

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Typed Dataset[T] API surface (SURVEY.md §1 notes the reference has no
  * typed API — this is the Spark-native bonus): case-class encoders,
  * typed filters/maps, groupByKey with a custom Aggregator.
  */
case class TypedOrder(o_orderkey: Long, o_custkey: Long, o_orderstatus: String,
    o_totalprice: Double)

class TypedDatasetSpec extends AnyFunSuite {
  private lazy val spark = GraftSparkSession.spark
  import TypedDatasetSpec._

  test("typed pipeline: as[T], typed filter/map, groupByKey + custom Aggregator") {
    import spark.implicits._
    val ds: Dataset[TypedOrder] = Tables.load(spark, GraftSparkSession.sfDir, "orders")
      .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
      .as[TypedOrder]
    val filtered = ds.filter(_.o_totalprice > 0.0)
    val means = filtered.groupByKey(_.o_orderstatus)
      .agg(MeanPrice.toColumn.name("mean_price"))
      .collect().toMap
    assert(means.nonEmpty && means.values.forall(_ > 0.0))
    // cross-check against the untyped aggregation
    val untyped = filtered.toDF().groupBy(col("o_orderstatus"))
      .agg((sum(col("o_totalprice")) / count(lit(1))).as("m"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    means.foreach { case (k, v) => assert(math.abs(v - untyped(k)) < 1e-6) }
  }

  test("typed map and flatMap keep encoders") {
    import spark.implicits._
    val ds = Tables.load(spark, GraftSparkSession.sfDir, "orders")
      .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice").as[TypedOrder]
    val keys = ds.map(_.o_orderkey * 2).filter(_ % 2 == 0)
    assert(keys.count() == ds.count())
    val statuses = ds.flatMap(o => Seq(o.o_orderstatus, o.o_orderstatus.toLowerCase))
      .distinct().collect().toSet
    assert(statuses.exists(_ == "f") && statuses.exists(_ == "F"))
  }
}

object TypedDatasetSpec {
  /** typed mean aggregator (Aggregator[IN, BUF, OUT] — the user-facing
    * custom-aggregate mechanism of SURVEY.md §2.11) */
  object MeanPrice extends Aggregator[TypedOrder, (Double, Long), Double] {
    override def zero: (Double, Long) = (0.0, 0L)
    override def reduce(b: (Double, Long), o: TypedOrder): (Double, Long) =
      (b._1 + o.o_totalprice, b._2 + 1)
    override def merge(a: (Double, Long), b: (Double, Long)): (Double, Long) =
      (a._1 + b._1, a._2 + b._2)
    override def finish(r: (Double, Long)): Double =
      if (r._2 == 0) 0.0 else r._1 / r._2
    override def bufferEncoder = Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong)
    override def outputEncoder = Encoders.scalaDouble
  }
}
