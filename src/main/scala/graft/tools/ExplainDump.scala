package graft.tools

import java.nio.file.{Files, Paths}

/** Optimization-round aid: dump `explain("formatted")` for named queries
  * to `<outDir>/<name>_<tag>.txt` — the before/after plan evidence the
  * round's OPTIMIZATION_r*.md claims are checked against.
  * `sbt "runMain graft.tools.ExplainDump <outDir> <tag> <q1,q2,...> [sfDir]"`
  */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    if (args.length < 3) {
      System.err.println(
        "usage: ExplainDump <outDir> <tag> <q1,q2,...> [sfDir=/root/testdata/sf0.1]")
      sys.exit(1)
    }
    val outDir = args(0)
    val tag = args(1)
    val names = args(2).split(",").toSeq.filter(_.nonEmpty)
    val sfDir = if (args.length > 3) args(3) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.GraftSession.builder(s"local[$cpus]", cpus.toInt)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Files.createDirectories(Paths.get(outDir))
    names.foreach { n =>
      val plan = graft.SparkEntry.queries(n)(spark, sfDir).queryExecution
        .explainString(org.apache.spark.sql.execution.FormattedMode)
      Files.write(Paths.get(outDir, s"${n}_$tag.txt"), plan.getBytes("UTF-8"))
      println(s"[explain] wrote $outDir/${n}_$tag.txt")
      // a query's persist() registrations must not leak into the NEXT
      // query's dump (Verify/Bench clearCache() per query — the dump
      // must show the same per-query plan they run)
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
