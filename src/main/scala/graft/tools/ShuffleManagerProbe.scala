package graft.tools

import org.apache.spark.SparkEnv
import org.apache.spark.sql.functions._

/** Subprocess probe for shuffle-manager pluggability (driven by
  * ShuffleManagerSpec): builds an engine session whose
  * `spark.shuffle.manager` is [[org.apache.spark.shuffle.graft.GraftShuffleManager]],
  * runs a genuinely shuffling aggregation + join, and verifies the
  * active manager instance is the custom class. Exit 0 + the OK line
  * on stdout is the contract. */
object ShuffleManagerProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val spark = graft.GraftSession.builder("local[2]", 4)
      .appName("graft-shuffle-probe")
      .config("spark.ui.enabled", "false")
      .config("spark.shuffle.manager", classOf[org.apache.spark.shuffle.graft.GraftShuffleManager].getName)
      .getOrCreate()
    try {
      spark.sparkContext.setLogLevel("WARN")
      val mgr = SparkEnv.get.shuffleManager.getClass.getName
      require(mgr == classOf[org.apache.spark.shuffle.graft.GraftShuffleManager].getName,
        s"expected custom shuffle manager, got $mgr")
      val li = graft.Tables.load(spark, sfDir, "lineitem")
      val o = graft.Tables.load(spark, sfDir, "orders")
      // shuffled aggregation + shuffled join, both through the manager
      val n = li.groupBy(col("l_orderkey")).agg(count(lit(1)).as("c"))
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .agg(sum(col("c"))).head.getLong(0)
      require(n > 0, "empty shuffle result")
      // bypass-threshold path too (many reducers) — same manager
      val m = li.repartition(64, col("l_partkey")).count()
      require(m > 0)
      println(s"SHUFFLE_MANAGER_OK $mgr rows=$n")
    } finally spark.stop()
  }
}
