package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs the headline queries against
  * SPARK_GRAFT_SF_DIR, forcing full plan execution through the noop
  * datasource sink (a bare .count() would let Catalyst prune the
  * per-row work we mean to measure). Prints ONE JSON line.
  */
object Bench {
  // headline set: the three biggest operator families (scan/agg, joins,
  // window) + the data-pipeline ops; bounded at any SF.
  val headline: Seq[String] = Seq(
    "tpch_q01_pricing_summary", "tpch_q03_topk_revenue", "tpch_q04_priority_check",
    "tpch_q05_local_supplier", "tpch_q06_forecast_revenue", "tpch_q09_nation_profit",
    "tpch_q12_ship_priority", "tpch_q13_order_counts", "tpch_q18_large_orders",
    "tpch_q21_waiting_suppliers", "tpch_q22_dormant_customers",
    "tpcds_style_q19_cross_nation", "tpcds_style_q53_ratio_window",
    "tpcds_style_q36_margin_rank", "tpcds_style_q2_week_pivot",
    "tpcds_style_q14_cross_channel",
    "cb_regex_extract_group", "cb_wide_sums",
    "sql_recursive_cte",
    "window_group_limit", "window_ntile_scalable", "ev_sessionize",
    "ev_asof_join_custom", "ev_uniq_users_by_type_day",
    "dedup_exact", "dedup_minhash_lsh", "dedup_embedding",
    "sim_ann_brute_topk", "sim_ann_lsh",
    "text_quality", "text_fingerprint", "text_decontaminate", "docs_curation",
    "docs_epoch_shuffle")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val qs = SparkEntry.queries
    // warm up JVM/codegen/parquet paths so the first timed query isn't
    // charged for session bootstrap: one cheap query per input family
    // (lineitem, documents, embeddings, events) primes the scan, shuffle,
    // and expression-eval machinery the headline queries share
    Seq("tpch_q06_forecast_revenue", "text_tokens", "sim_quantize_int8",
        "ev_top_users").foreach { w =>
      try qs(w)(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => }
    }
    spark.catalog.clearCache()
    val results = headline.filter(qs.contains).map { name =>
      val t0 = System.nanoTime()
      try qs(name)(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable => System.err.println(s"[bench] $name failed: $e") }
      val dt = (System.nanoTime() - t0) / 1e9
      // release intra-query caches OUTSIDE the timer: a query's persist()
      // is its own cost (timed above), but leaked storage blocks from
      // one query must not squeeze executor memory for the next
      spark.catalog.clearCache()
      name -> dt
    }
    val qj = results.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }.mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qj,"sf":"$sfDir"}""")
    spark.stop()
  }
}
