package graft

import scala.sys.process._
import org.scalatest.funsuite.AnyFunSuite

/** Remote-shuffle design compatibility: the engine must run under a
  * pluggable `spark.shuffle.manager` (the extension point Celeborn/
  * Uniffle-style services use). The manager is fixed at SparkContext
  * creation, so the check runs a fresh session in a subprocess with
  * [[org.apache.spark.shuffle.graft.GraftShuffleManager]] plugged in and asserts the
  * probe's contract line. */
class ShuffleManagerSpec extends AnyFunSuite {

  test("engine queries run under a non-default pluggable shuffle manager") {
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
      "graft.tools.ShuffleManagerProbe", GraftSparkSession.sfDir)
    val out = new StringBuilder
    val code = Process(cmd).!(ProcessLogger(l => out.append(l).append('\n'), _ => ()))
    assert(code == 0, s"probe exited $code:\n${out.toString.takeRight(3000)}")
    assert(out.toString.contains(
      s"SHUFFLE_MANAGER_OK ${classOf[org.apache.spark.shuffle.graft.GraftShuffleManager].getName}"),
      out.toString.takeRight(3000))
  }
}
