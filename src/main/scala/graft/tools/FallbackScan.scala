package graft.tools

import scala.collection.mutable

import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.execution.SparkPlan

/** Wave-9 HOF/CodegenFallback sweep (round-8 verdict item 6): enumerate
  * every oracled query whose PHYSICAL plan contains interpreted
  * (CodegenFallback) expressions — Spark's higher-order array/map
  * functions and a handful of others evaluate a boxed interpreted
  * lambda per element, which is invisible at oracle SF and dominant at
  * corpus scale (measured r8: sim_ann_pq 43.3→13.7 s and
  * dedup_substring_windows 23.6→12.9 s at 100x replicas after
  * converting exactly these to native codegen expressions).
  *
  * Output: one line per (query, fallback-expression class) with the
  * count of occurrences, plus a per-query rollup — rank against
  * BENCH_CORPUS walls to pick conversion targets.
  *
  * `runMain graft.tools.FallbackScan [sfDir]` (default sf0.01).
  */
object FallbackScan {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = graft.GraftSession.builder(s"local[$cpus]", cpus.toInt)
      .config("spark.ui.enabled", "false")
      // AQE off: with it on, executedPlan is an AdaptiveSparkPlanExec
      // whose input plan is hidden until execution, so every query with
      // an exchange would scan as fallback-free (first run of this tool
      // reported exactly that). This is a planning-only tool — the
      // expression set is identical either way.
      .config("spark.sql.adaptive.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // shared with the FallbackGateSpec regression gate (descends into
    // subquery plans too — a fallback inside a subquery runs per
    // subquery execution, still corpus-scale when it scans the corpus)
    def fallbacks(plan: SparkPlan): Seq[String] = QualityGates.codegenFallbacks(plan)

    val rows = mutable.ArrayBuffer[(String, Map[String, Int])]()
    for ((name, q) <- graft.SparkEntry.queries.toSeq.sortBy(_._1)) {
      try {
        val df = q(spark, sfDir)
        val fb = fallbacks(df.queryExecution.executedPlan)
        if (fb.nonEmpty) rows += name -> fb.groupBy(identity).map { case (k, v) => k -> v.size }
      } catch {
        case e: Throwable => System.err.println(s"[fallbackscan] $name failed to plan: $e")
      }
      spark.catalog.clearCache()
    }
    println("query\tfallback_exprs")
    rows.foreach { case (name, m) =>
      val s = m.toSeq.sortBy(-_._2).map { case (k, n) => s"$k x$n" }.mkString(", ")
      println(s"$name\t$s")
    }
    val byExpr = rows.flatMap(_._2).groupBy(_._1)
      .map { case (k, vs) => k -> (vs.size, vs.map(_._2).sum) }.toSeq.sortBy(-_._2._1)
    println("\nexpr\tqueries\ttotal_occurrences")
    byExpr.foreach { case (k, (q, n)) => println(s"$k\t$q\t$n") }
    spark.stop()
  }
}
