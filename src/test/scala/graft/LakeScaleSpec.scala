package graft

import scala.sys.process._
import org.scalatest.funsuite.AnyFunSuite

/** The lake catalog's by-construction scale ceiling is gone: data files
  * live on disk ([[graft.sources.LakeFileStore]]), so a table LARGER
  * THAN THE JVM HEAP must write and read correctly. The heap bound is
  * per-JVM, so the check runs a fresh session in a subprocess with a
  * small -Xmx and asserts the probe's contract line (which carries the
  * measured payload-bytes > heap-max comparison). */
class LakeScaleSpec extends AnyFunSuite {

  test("lake table larger than the JVM heap writes and reads through disk-backed files") {
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
    // 6M rows x 256 B payload ~= 1.5 GB logical vs a 1 GiB heap
    val cmd = Seq(javaBin) ++ addOpens ++ Seq(
      "-Xmx1g", "-Dspark.ui.enabled=false",
      "-cp", System.getProperty("java.class.path"),
      "graft.tools.LakeScaleProbe", "6000000")
    val out = new StringBuilder
    val code = Process(cmd).!(ProcessLogger(l => out.append(l).append('\n'), _ => ()))
    assert(code == 0, s"probe exited $code:\n${out.toString.takeRight(3000)}")
    val ok = out.toString.linesIterator.find(_.startsWith("LAKE_SCALE_OK"))
    assert(ok.isDefined, out.toString.takeRight(3000))
    val kv = ok.get.split(' ').drop(1).map { t =>
      val Array(k, v) = t.split('='); k -> v.toLong
    }.toMap
    assert(kv("payloadBytes") > kv("heapMax"),
      s"probe did not exceed heap: $ok")
  }
}
