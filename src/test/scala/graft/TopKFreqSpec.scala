package graft

import graft.functions.TopKFreq.topk_freq
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TopKFreqSpec extends AnyFunSuite {
  private lazy val spark = GraftSparkSession.spark
  import spark.implicits._

  private def sketchOf(words: Seq[String], k: Int): Seq[(String, Long)] =
    words.toDF("w").repartition(4) // force partial/merge path
      .agg(topk_freq($"w", k).as("s"))
      .select(explode($"s").as("e"))
      .select($"e.word", $"e.cnt").as[(String, Long)].collect().toSeq

  test("exact when capacity >= distinct count, across partition merges") {
    val words = Seq.fill(5)("a") ++ Seq.fill(3)("b") ++ Seq.fill(7)("c") ++ Seq("d")
    val got = sketchOf(words, 10).toMap
    assert(got == Map("a" -> 5L, "b" -> 3L, "c" -> 7L, "d" -> 1L))
  }

  test("bounded capacity: keeps heavy hitters, overestimates only") {
    val words = (1 to 100).flatMap(i => Seq.fill(i % 7 + 1)(s"w$i")) ++ Seq.fill(500)("HH")
    val got = sketchOf(words, 20)
    assert(got.size <= 20)
    val asMap = got.toMap
    assert(asMap.contains("HH"), "heavy hitter must survive eviction")
    assert(asMap("HH") >= 500L, "space-saving never undercounts")
  }

  test("deterministic output ordering (-cnt, word)") {
    val words = Seq("b", "a", "b", "a", "c")
    val got = sketchOf(words, 10)
    assert(got == Seq(("a", 2L), ("b", 2L), ("c", 1L)))
  }

  test("null inputs are ignored") {
    val df = Seq(Some("x"), None, Some("x")).toDF("w")
    val got = df.agg(topk_freq($"w", 4).as("s"))
      .select(explode($"s").as("e")).select($"e.word", $"e.cnt")
      .as[(String, Long)].collect().toSeq
    assert(got == Seq(("x", 2L)))
  }

  test("top_k_by_score equals the rank window on random data across partitions") {
    import graft.functions.TopKByScore.top_k_by_score
    val rnd = new scala.util.Random(23)
    val rows = (1L to 2000L).map(id => (s"g${id % 5}", rnd.nextInt(50).toDouble, id))
    val df = rows.toDF("g", "s", "id").repartition(8)
    val heap = df.groupBy($"g").agg(top_k_by_score($"s", $"id", 4).as("t"))
      .select($"g", explode($"t").as("e")).select($"g", $"e.score", $"e.id")
      .as[(String, Double, Long)].collect().toSet
    val win = {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy($"g").orderBy($"s".desc, $"id")
      df.withColumn("r", org.apache.spark.sql.functions.row_number().over(w))
        .filter($"r" <= 4).select($"g", $"s", $"id")
        .as[(String, Double, Long)].collect().toSet
    }
    assert(heap == win, "bounded-heap aggregate must match window top-k exactly")
  }

  test("SQL k argument: non-literal / NULL / non-integral k is a clean AnalysisException") {
    Seq("x" -> "a", "y" -> "b").toDF("w", "g").createOrReplaceTempView("tkf_in")
    // bad k shapes that previously surfaced as eval-time NPE/CCE
    val bad = Seq(
      "SELECT topk_freq(w, g) FROM tkf_in",            // column reference
      "SELECT topk_freq(w, NULL) FROM tkf_in",         // NULL
      "SELECT topk_freq(w, 'three') FROM tkf_in",      // string literal
      "SELECT top_k_by_score(1.0, 1L, w) FROM tkf_in") // column reference
    bad.foreach { q =>
      val ex = intercept[org.apache.spark.sql.AnalysisException](spark.sql(q).collect())
      assert(ex.getMessage.contains("k must be an integer literal"), s"for $q got: ${ex.getMessage}")
    }
    // good: a plain literal still works
    val ok = spark.sql("SELECT topk_freq(w, 2) AS s FROM tkf_in").collect()
    assert(ok.length == 1)
  }
}
