package graft.tools

import java.security.MessageDigest
import org.apache.spark.sql.SparkSession

/** Subprocess probe for spill-correctness: runs a shuffle-heavy
  * aggregation under a deliberately starved memory budget
  * (`spark.memory.fraction` floored so execution memory forces
  * sort/aggregate spills) and prints a digest of the result. The spec
  * compares it against the same query under normal memory — at 100 TB
  * every operator will spill; results must not depend on it.
  */
object SpillProbe {
  def digestOf(rows: Seq[String]): String = {
    val md = MessageDigest.getInstance("MD5")
    rows.sorted.foreach(r => md.update(r.getBytes("UTF-8")))
    md.digest().map("%02x".format(_)).mkString
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-spill-probe")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.memory.fraction", "0.05")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      val df = graft.operators.TpchLike
        .queries("tpch_q01_pricing_summary")(spark, sfDir)
      val rows = df.collect().map(_.toString).toSeq
      println(s"SPILL_PROBE_OK ${rows.length} ${digestOf(rows)}")
    } finally spark.stop()
  }
}
