package graft.tools

import org.apache.spark.sql.functions._

/** One-off measurement behind the round-15 ring-width decision: panel
  * pair recall of the embedding-LSH pipeline at the big corpus's
  * scaled bits, split by exact-cosine band and by ring width — the
  * data for choosing between "pay 3-4x wall for the deep ring" and
  * "cheap ring + document that weak-band recall decays at scale".
  *
  * runMain graft.tools.RingBandProbe <bigDir> [widths…]
  */
object RingBandProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val widths = if (args.length > 1) args.drop(1).map(_.toInt).toSeq else Seq(4, 10)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.GraftSession.builder(s"local[$cpus]", cpus.toInt)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val qs = graft.SparkEntry.queries
    val bits = graft.operators.SimilarityOps.autoLshBits(spark, dir, 4)
    // exact panel pairs WITH their cosines (id_a < 256 pushes onto the
    // probe side of the nested loop — panel x corpus)
    val exact = qs("dedup_embedding")(spark, dir).filter(col("id_a") < 256)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2)))
    def band(c: Double): String =
      if (c >= 0.9) "0.9+" else if (c >= 0.7) "0.7-0.9"
      else if (c >= 0.55) "0.55-0.7" else "0.4-0.55"
    val byBand = exact.groupBy { case (_, c) => band(c) }
    println(s"bits=$bits exact panel pairs=${exact.length} " +
      byBand.map { case (b, xs) => s"$b:${xs.length}" }.mkString(" "))
    for (w <- widths) {
      val approx = spark.conf.getOption(graft.GraftConf.SimLshRingWidth.key) match {
        case _ =>
          spark.conf.set(graft.GraftConf.SimLshRingWidth.key, w.toString)
          try graft.operators.DedupOps
            .dedupEmbeddingLshPanelAt(spark, dir, bits, probeMax = 256L)
            .select(col("id_a"), col("id_b")).collect()
            .map(r => (r.getLong(0), r.getLong(1))).toSet
          finally spark.conf.unset(graft.GraftConf.SimLshRingWidth.key)
      }
      val rows = byBand.toSeq.sortBy(_._1).map { case (b, xs) =>
        val hit = xs.count { case (p, _) => approx(p) }
        f"$b: ${hit.toDouble / xs.length}%.3f ($hit/${xs.length})"
      }
      val total = exact.count { case (p, _) => approx(p) }
      println(f"w=$w overall=${total.toDouble / exact.length}%.3f  " + rows.mkString("  "))
    }
    spark.stop()
  }
}
