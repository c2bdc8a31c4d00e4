package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** TPC-H scale-up generator for the sf1 performance run: replicates the
  * sf0.1 fact/dimension parquet N times with consistent key shifting
  * (each replica's keys offset by `replica * (max_key + 1)` so foreign
  * keys stay referentially intact: orders→customer, lineitem→orders/
  * part/supplier). Dimensions `region`/`nation` are fixed-size at every
  * TPC-H SF and are copied as-is. Non-key attributes keep their
  * original distributions, so selectivities — date windows, status
  * predicates, name-suffix classes — match the base data and query
  * plans stay representative at 10x the rows.
  *
  * `runMain graft.tools.ScaleUp [srcDir] [outDir] [factor]`
  * (defaults: /root/testdata/sf0.1 → /tmp/graft_sf1 × 10).
  * Bench's sf1 run uses SPARK_GRAFT_BENCH_SET=tpch against the output.
  */
object ScaleUp {
  def main(args: Array[String]): Unit = {
    val src = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val out = if (args.length > 1) args(1) else "/tmp/graft_sf1"
    val factor = if (args.length > 2) args(2).toInt else 10
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = graft.GraftSession.builder(s"local[$cpus]", cpus.toInt)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def tbl(name: String): DataFrame = spark.read.parquet(s"$src/$name.parquet")
    def write(df: DataFrame, name: String): Unit = {
      df.write.mode("overwrite").parquet(s"$out/$name.parquet")
      System.err.println(s"[scaleup] $name: ${spark.read.parquet(s"$out/$name.parquet").count()} rows")
    }

    // key strides (max + 1 per base table keeps replicas disjoint)
    def stride(name: String, key: String): Long =
      tbl(name).agg(max(col(key))).head.getLong(0) + 1L

    val custStride = stride("customer", "c_custkey")
    val suppStride = stride("supplier", "s_suppkey")
    val partStride = stride("part", "p_partkey")
    val orderStride = stride("orders", "o_orderkey")

    /** union of `factor` replicas with the given key columns shifted */
    def replicate(df: DataFrame, shifts: (String, Long)*): DataFrame =
      (0 until factor).map { i =>
        shifts.foldLeft(df) { case (d, (c, st)) =>
          d.withColumn(c, col(c) + lit(i * st))
        }
      }.reduce(_ union _)

    // fixed-size dimensions: unchanged at every TPC-H SF
    write(tbl("region"), "region")
    write(tbl("nation"), "nation")
    write(replicate(tbl("customer"), "c_custkey" -> custStride), "customer")
    write(replicate(tbl("supplier"), "s_suppkey" -> suppStride), "supplier")
    write(replicate(tbl("part"), "p_partkey" -> partStride), "part")
    write(replicate(tbl("orders"),
      "o_orderkey" -> orderStride, "o_custkey" -> custStride), "orders")
    write(replicate(tbl("lineitem"),
      "l_orderkey" -> orderStride, "l_partkey" -> partStride,
      "l_suppkey" -> suppStride), "lineitem")
    spark.stop()
  }
}
