package graft

import scala.collection.mutable

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** Plan-health reporter — the GlutenFallbackReporter / gluten-ui analog
  * (SURVEY.md §4 "Fallback reporting/UI"): where the reference explains
  * which nodes fell back to vanilla Spark, we summarize each executed
  * query's physical plan (shuffle/broadcast counts, codegen coverage,
  * scan pushdown presence) so regressions in plan shape are observable
  * without reading full explains.
  */
object PlanHealth {

  final case class Record(
      name: String,
      durationNs: Long,
      exchanges: Int,
      broadcasts: Int,
      codegenSpans: Int,
      scans: Int,
      scansWithPushedFilters: Int,
      failed: Boolean)

  final class Listener extends QueryExecutionListener {
    val records = new mutable.ArrayBuffer[Record]()

    private def summarize(name: String, qe: QueryExecution, durationNs: Long,
        failed: Boolean): Record = {
      val plan = qe.executedPlan.toString
      def count(token: String): Int = {
        var n = 0; var i = plan.indexOf(token)
        while (i >= 0) { n += 1; i = plan.indexOf(token, i + 1) }
        n
      }
      Record(name, durationNs,
        exchanges = count("Exchange "),
        broadcasts = count("BroadcastExchange"),
        codegenSpans = count("WholeStageCodegen") max count("*("),
        scans = count("FileScan") + count("Scan parquet"),
        scansWithPushedFilters = count("PushedFilters: [") - count("PushedFilters: []"),
        failed = failed)
    }

    override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit =
      records.synchronized { records += summarize(funcName, qe, durationNs, failed = false) }

    override def onFailure(funcName: String, qe: QueryExecution, exception: Exception): Unit =
      records.synchronized { records += summarize(funcName, qe, 0L, failed = true) }
  }

  /** attach a fresh listener to the session and return it */
  def attach(spark: SparkSession): Listener = {
    val l = new Listener
    spark.listenerManager.register(l)
    l
  }

  def detach(spark: SparkSession, l: Listener): Unit =
    spark.listenerManager.unregister(l)

  /** Runtime operator metrics — the SQLMetrics half of the reference's
    * per-operator metrics UI: after a query executes, every physical
    * node's populated metric values (numOutputRows, shuffle
    * records/bytes written, spill sizes, peak memory, …) keyed by node
    * name. Plan-shape counters above say what the plan IS; these say
    * what it DID — the pair a fleet dashboard ingests per query. */
  final case class OpMetric(node: String, metric: String, value: Long, accumId: Long = -1L)

  def runtimeMetrics(qe: QueryExecution): Seq[OpMetric] = {
    // walk through AQE wrappers to the final executed tree
    def walk(p: org.apache.spark.sql.execution.SparkPlan): Seq[org.apache.spark.sql.execution.SparkPlan] =
      p match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          walk(a.executedPlan)
        case s: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          s +: walk(s.plan)
        case other => other +: other.children.flatMap(walk)
      }
    walk(qe.executedPlan).flatMap { p =>
      p.metrics.toSeq.map { case (k, m) => OpMetric(p.nodeName, k, m.value, m.id) }
    }
  }

  /** Aggregated headline numbers from [[runtimeMetrics]]. Reused
    * exchanges / reused query stages share the ORIGINAL node's
    * SQLMetric accumulators, and the plan walk visits each occurrence —
    * summing naively would double-count data movement, so each
    * accumulator id contributes once. */
  def runtimeSummary(qe: QueryExecution): Map[String, Long] = {
    val ms = runtimeMetrics(qe)
      .groupBy(_.accumId).map(_._2.head).toSeq // dedupe shared accumulators
    def sumOf(pred: String => Boolean): Long =
      ms.filter(m => pred(m.metric)).map(_.value).sum
    // metric KEYS are camelCase identifiers (display names differ)
    Map(
      "output_rows" -> sumOf(_ == "numOutputRows"),
      "shuffle_records_written" -> sumOf(_ == "shuffleRecordsWritten"),
      "shuffle_bytes_written" -> sumOf(_ == "shuffleBytesWritten"),
      "spill_bytes" -> sumOf(_ == "spillSize"))
  }

  /** one-line textual report per record */
  def report(l: Listener): Seq[String] = l.records.synchronized {
    l.records.map { r =>
      f"${r.name}%-12s ${r.durationNs / 1e6}%9.1f ms exch=${r.exchanges} bcast=${r.broadcasts} " +
        f"codegen=${r.codegenSpans} scans=${r.scans} pushed=${r.scansWithPushedFilters}" +
        (if (r.failed) " FAILED" else "")
    }.toSeq
  }
}
