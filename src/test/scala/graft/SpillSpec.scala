package graft

import scala.sys.process._
import org.scalatest.funsuite.AnyFunSuite

/** Spill-correctness: the same aggregation under a starved execution
  * memory budget (subprocess with a small heap and
  * `spark.memory.fraction=0.05`, forcing sort/agg spills) must digest
  * identically to the normally-memoried session — the "every operator
  * spills at 100 TB" invariant. */
class SpillSpec extends AnyFunSuite {
  private lazy val spark = GraftSparkSession.spark
  private val dir = GraftSparkSession.sfDir

  test("starved-memory execution produces identical aggregation results") {
    val addOpens = Seq(
      "java.base/java.lang", "java.base/java.lang.invoke",
      "java.base/java.lang.reflect", "java.base/java.io",
      "java.base/java.net", "java.base/java.nio",
      "java.base/java.util", "java.base/java.util.concurrent",
      "java.base/java.util.concurrent.atomic",
      "java.base/sun.nio.ch", "java.base/sun.nio.cs",
      "java.base/sun.security.action", "java.base/sun.util.calendar",
    ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
    val javaBin = System.getProperty("java.home") + "/bin/java"
    val cmd = Seq(javaBin) ++ addOpens ++ Seq(
      "-Xmx512m", "-Dspark.ui.enabled=false",
      "-cp", System.getProperty("java.class.path"),
      "graft.tools.SpillProbe", dir)
    val out = new StringBuilder
    val code = Process(cmd).!(ProcessLogger(l => out.append(l).append('\n'), _ => ()))
    assert(code == 0, s"probe exited $code:\n${out.toString.takeRight(3000)}")
    val expected = graft.tools.SpillProbe.digestOf(
      operators.TpchLike.queries("tpch_q01_pricing_summary")(spark, dir)
        .collect().map(_.toString).toSeq)
    assert(out.toString.linesIterator.exists(_.startsWith("SPILL_PROBE_OK")),
      out.toString.takeRight(2000))
    val line = out.toString.linesIterator.find(_.startsWith("SPILL_PROBE_OK")).get
    assert(line.endsWith(expected),
      s"digest mismatch: probe '$line' vs session '$expected'")
  }
}
