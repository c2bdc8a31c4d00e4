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
        // Distributed, order-independent digest: per-row xxhash64 over
        // the full row struct, summed as DECIMAL (exact, no overflow at
        // any realistic row count). The old collect()-based digest
        // pulled the whole result to the driver — a heap OOM the moment
        // a 100x result set outgrew it; results must be digested where
        // they live.
        import org.apache.spark.sql.functions.{col, count, lit, struct, sum, to_json, xxhash64}
        // map-typed columns are not hashable by xxhash64 — route them
        // through their canonical JSON rendering first
        val cols = df.schema.fields.map { f =>
          if (graft.tools.SpillAtScale.hasMap(f.dataType)) to_json(col(f.name)) else col(f.name)
        }
        val digestDf = df.select(
          xxhash64(struct(cols.toIndexedSeq: _*)).cast("decimal(20,0)").as("h"))
          .agg(sum(col("h")).as("hsum"), count(lit(1)).as("n"))
        // collect(), not head(): head(n) executes a SEPARATE limited
        // QueryExecution, leaving digestDf's own metrics (the spill
        // evidence this tool exists for) empty
        val r = digestDf.collect()(0)
        val m = graft.PlanHealth.runtimeSummary(digestDf.queryExecution)
        println(f"SPILL_SCALE $n rows=${r.getLong(1)} digest=${r.getDecimal(0)} " +
          f"spill_mb=${m("spill_bytes") / 1e6}%.1f shuffle_mb=${m("shuffle_bytes_written") / 1e6}%.1f")
        spark.catalog.clearCache()
      }
    } finally spark.stop()
  }

  /** true if the type contains a MapType anywhere (maps are not
    * xxhash64-hashable and digest via to_json instead) */
  def hasMap(dt: org.apache.spark.sql.types.DataType): Boolean = {
    import org.apache.spark.sql.types._
    dt match {
      case _: MapType => true
      case ArrayType(et, _) => hasMap(et)
      case StructType(fs) => fs.exists(f => hasMap(f.dataType))
      case _ => false
    }
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
