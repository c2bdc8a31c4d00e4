package graft.tools

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}

/** Scheduler-cost profile of an iterative/recursive query: counts the
  * jobs, stages and tasks one execution schedules. A recursive CTE runs
  * O(depth) sequential rounds and each round pays fixed scheduler/RPC cost
  * under a real cluster master — this profile is the evidence for
  * whether a cluster-vs-local wall ratio is plan debt (too many stages
  * per round — fixable) or the irreducible per-round floor (rounds ×
  * per-job RPC — not).
  *
  * `runMain graft.tools.RecursionProfile [sfDir] [query]`
  */
object RecursionProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val name = if (args.length > 1) args(1) else "sql_recursive_cte"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val master = sys.env.getOrElse("SPARK_GRAFT_MASTER", s"local[$cpus]")
    val spark = graft.GraftSession.builder(master, cpus.toInt)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val jobs = new AtomicLong; val stages = new AtomicLong; val tasks = new AtomicLong
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs.incrementAndGet(): Unit
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
        stages.incrementAndGet(): Unit
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = tasks.incrementAndGet(): Unit
    }
    try {
      // warm (JIT, parquet footers) — not counted
      graft.SparkEntry.queries(name)(spark, sfDir).write.format("noop").mode("overwrite").save()
      spark.catalog.clearCache()
      spark.sparkContext.addSparkListener(listener)
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, sfDir).write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(1000) // let the listener bus drain (private API otherwise)
      println(f"RC_PROFILE query=$name master=$master wall=$wall%.2f " +
        s"jobs=${jobs.get} stages=${stages.get} tasks=${tasks.get}")
    } finally spark.stop()
  }
}
