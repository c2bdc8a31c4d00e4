package graft.tools

import org.apache.spark.sql.functions._

/** Hot-bucket diagnostic for the LSH banding family: prints the
  * per-(band, key) bucket-size distribution (max / percentiles / counts
  * over the auto-cap threshold) for the MinHash and SimHash band tables
  * at a given SF dir. This is how the auto threshold for
  * `spark.graft.dedup.lsh.bucketAutoThreshold` is chosen and re-checked:
  * exact-by-construction at the oracle SF requires the max bucket to sit
  * below the threshold.
  *
  * `runMain graft.tools.BandBucketProbe <sfDir>...`
  */
object BandBucketProbe {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq else Seq("/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = graft.GraftSession.builder(s"local[$cpus]", cpus.toInt)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try dirs.foreach { dir =>
      val docs = graft.Tables.load(spark, dir, "documents")
        .select(col("doc_id"), array_distinct(split(col("text"), " ")).as("words"))
      val groups = docs.groupBy(col("words")).agg(min(col("doc_id")).as("gid"))
      val perms = graft.GraftConf.getInt(spark, graft.GraftConf.DedupLshPerms)
      val nBands = graft.GraftConf.getInt(spark, graft.GraftConf.DedupLshBands)
      val rpb = math.max(1, perms / nBands)
      val mh = groups
        .select(col("gid"),
          graft.functions.GraftExpressions.minhash_signature(col("words"), perms).as("sig"))
        .select(col("gid"), explode(sequence(lit(0), lit(nBands - 1))).as("band"), col("sig"))
        .select(col("band"),
          xxhash64(col("band"), slice(col("sig"), col("band") * rpb + 1, lit(rpb))).as("key"))
        .groupBy("band", "key").count()
      val sh = docs
        .select(col("doc_id"), graft.functions.GraftExpressions.simhash64(col("words")).as("sig"))
        .select(col("sig"), explode(sequence(lit(0), lit(3))).as("band"))
        .select(col("band"),
          expr("shiftright(sig, band * 16)").bitwiseAND(lit(0xFFFFL)).as("key"))
        .groupBy("band", "key").count()
      for ((tag, sz) <- Seq("minhash" -> mh, "simhash" -> sh)) {
        val r = sz.agg(max("count").as("max"),
          expr("percentile(count, array(0.5, 0.9, 0.99, 0.999))").as("pct"),
          sum(when(col("count") > 128, 1).otherwise(0)).as("gt128"),
          sum(when(col("count") > 512, 1).otherwise(0)).as("gt512"),
          sum(when(col("count") > 2048, 1).otherwise(0)).as("gt2048"),
          count(lit(1)).as("buckets")).head()
        println(s"BUCKETS $dir $tag max=${r.getLong(0)} " +
          s"pct(.5/.9/.99/.999)=${r.getSeq[Double](1).mkString(",")} " +
          s"gt128=${r.getLong(2)} gt512=${r.getLong(3)} gt2048=${r.getLong(4)} " +
          s"buckets=${r.getLong(5)}")
      }
    } finally spark.stop()
  }
}
