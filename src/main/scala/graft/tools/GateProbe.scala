package graft.tools

/** Local iteration aid: run the rows-only quality gates (the
  * `recall_gates.json` content Verify emits) against any SF dir without
  * a full Verify dump — `sbt "runMain graft.tools.GateProbe <sfDir>"`. */
object GateProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.builder("local[8]", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val gates = QualityGates.measure(spark, args(0))
    gates.foreach(g => println(
      f"${g.query}%-22s ${g.metric}%-34s ${g.value}%.4f (bound ${g.bound}%.2f) ${if (g.pass) "ok" else "FAIL"}"))
    spark.stop()
    if (gates.exists(!_.pass)) sys.exit(1)
  }
}
