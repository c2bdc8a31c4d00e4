package graft.tools

import org.apache.spark.sql.functions._

/** Subprocess probe (driven by LakeScaleSpec): proves the lake
  * catalog's data files do NOT transit or reside in driver/JVM memory.
  * Launched with a small heap (-Xmx set by the spec), it writes a
  * partitioned lake table whose LOGICAL row payload exceeds the whole
  * JVM's max heap, then reads it back with aggregates and a
  * partition-pruned scan. Under the old driver-memory storage this
  * sized workload cannot complete; with [[graft.sources.LakeFileStore]]
  * rows stream task-side to parquet files on disk and only manifest
  * entries (path + stats + blooms) reach the catalog.
  *
  * Exit 0 + the OK line is the contract; the line carries the measured
  * payload bytes and heap bound so the spec can re-assert the
  * larger-than-heap claim. */
object LakeScaleProbe {
  def main(args: Array[String]): Unit = {
    val rows = args.headOption.map(_.toLong).getOrElse(3000000L)
    val spark = graft.GraftSession.builder("local[4]", 8)
      .appName("graft-lake-scale-probe")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.catalog.lake", classOf[graft.sources.GraftLakeCatalog].getName)
      // small parquet row groups: bounds each open writer's page buffer
      // so the probe's memory ceiling is the contract under test, not
      // the writer's default 128 MB row-group buffer
      .config("spark.hadoop.parquet.block.size", (16 * 1024 * 1024).toString)
      .getOrCreate()
    try {
      spark.sparkContext.setLogLevel("WARN")
      spark.sql("CREATE TABLE lake.big (id BIGINT, part INT, payload STRING) PARTITIONED BY (part)")
      // 256-char pseudo-random payload per row: dictionary-proof, so
      // bytes on disk track logical bytes instead of collapsing
      spark.range(rows)
        .select(col("id"), (col("id") % 4).cast("int").as("part"),
          concat(sha2(col("id").cast("string"), 256),
            sha2((col("id") + 1).cast("string"), 256),
            sha2((col("id") + 2).cast("string"), 256),
            sha2((col("id") + 3).cast("string"), 256)).as("payload"))
        .writeTo("lake.big").append()

      val agg = spark.sql(
        "SELECT count(*) AS n, sum(id) AS s, sum(length(payload)) AS b FROM lake.big").head()
      require(agg.getLong(0) == rows, s"row count ${agg.getLong(0)} != $rows")
      require(agg.getLong(1) == rows * (rows - 1) / 2, "sum(id) mismatch")
      val payloadBytes = agg.getLong(2)
      val heapMax = Runtime.getRuntime.maxMemory()
      require(payloadBytes > heapMax,
        s"probe misconfigured: payload $payloadBytes <= heap $heapMax")

      // partition-pruned read: one of four partitions, exact aggregate
      val one = spark.sql("SELECT count(*) AS n FROM lake.big WHERE part = 2").head()
      require(one.getLong(0) == (0L until rows).count(_ % 4 == 2),
        s"pruned count ${one.getLong(0)} wrong")

      // manifest sanity: files on disk, none in driver memory
      val files = spark.sql("SELECT sum(row_count) AS rc, count(*) AS fc FROM lake.`big$files`").head()
      require(files.getLong(0) == rows, "manifest row_count mismatch")
      println(s"LAKE_SCALE_OK rows=$rows payloadBytes=$payloadBytes heapMax=$heapMax files=${files.getLong(1)}")
    } finally spark.stop()
  }
}
