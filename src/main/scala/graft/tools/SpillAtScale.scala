package graft.tools

import org.apache.spark.sql.SparkSession

/** Spill-correctness at BENCH scale (the SpillProbe pattern, sf10):
  * runs shuffle/sort/join-heavy TPC-H queries under a configurable
  * memory budget and prints, per query, a result digest plus the
  * measured spill volume from the executed plan's SQLMetrics. The
  * caller runs it twice — once starved (`SPARK_GRAFT_MEMORY_FRACTION`
  * low, spill_mb must be > 0) and once roomy — and asserts the digests
  * match: at 100 TB every operator spills, and results must not depend
  * on it.
  *
  * `runMain graft.tools.SpillAtScale <sfDir> [query...]`
  */
object SpillAtScale {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names =
      if (args.length > 1) args.drop(1).toSeq
      else Seq("tpch_q01_pricing_summary", "tpch_q09_nation_profit",
        "tpch_q18_large_orders", "tpch_q21_waiting_suppliers")
    val frac = sys.env.getOrElse("SPARK_GRAFT_MEMORY_FRACTION", "0.6") // Spark default = roomy
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = graft.GraftSession.builder(s"local[$cpus]", cpus.toInt)
      .appName("graft-spill-at-scale")
      .config("spark.ui.enabled", "false")
      .config("spark.memory.fraction", frac)
      // under starvation, keep the storage region evictable-small so an
      // in-query cache() cannot pin memory the aggregation maps need —
      // at real scale the cache would degrade to recompute, not OOM
      .config("spark.memory.storageFraction",
        sys.env.getOrElse("SPARK_GRAFT_STORAGE_FRACTION", "0.5"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      names.foreach { n =>
        val df = graft.SparkEntry.queries(n)(spark, sfDir)
        val rows = df.collect().map(_.toString).toSeq
        val m = graft.PlanHealth.runtimeSummary(df.queryExecution)
        println(f"SPILL_SCALE $n rows=${rows.length} digest=${SpillProbe.digestOf(rows)} " +
          f"spill_mb=${m("spill_bytes") / 1e6}%.1f shuffle_mb=${m("shuffle_bytes_written") / 1e6}%.1f")
        spark.catalog.clearCache()
      }
    } finally spark.stop()
  }

  /** convenience for shell comparison: true iff every query's digest
    * matches between two SpillAtScale outputs */
  def digestsMatch(a: String, b: String): Boolean = {
    def m(s: String) = s.linesIterator.filter(_.startsWith("SPILL_SCALE"))
      .map { l => val p = l.split(' '); p(1) -> p.find(_.startsWith("digest=")).get }
      .toMap
    m(a) == m(b)
  }
}
