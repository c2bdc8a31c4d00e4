package graft

import scala.sys.process._
import org.scalatest.funsuite.AnyFunSuite

/** Hive-metastore catalog path (reference analog:
  * HiveTableScanExecTransformer): the catalog implementation is a
  * static conf fixed at the first session, so the check runs a fresh
  * Hive-enabled session in a subprocess (same pattern as
  * [[ShuffleManagerSpec]]) over a throwaway Derby metastore and asserts
  * the probe's contract line — a genuine `HiveTableScan` over a text
  * serde table plus a partition-filtered read. */
class HiveMetastoreSpec extends AnyFunSuite {

  test("engine reads Hive-metastore tables through the Hive serde scan") {
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
      "-Xmx2g", "-Dspark.ui.enabled=false",
      "-cp", System.getProperty("java.class.path"),
      "graft.tools.HiveMetastoreProbe")
    val out = new StringBuilder
    val code = Process(cmd).!(ProcessLogger(l => out.append(l).append('\n'), _ => ()))
    assert(code == 0, s"probe exited $code:\n${out.toString.takeRight(3000)}")
    assert(out.toString.contains("HIVE_METASTORE_OK 2"), out.toString.takeRight(3000))
  }
}
