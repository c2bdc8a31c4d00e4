package graft.tools

import org.apache.spark.sql.SparkSession

/** Subprocess probe for the Hive-metastore scan path (reference analog:
  * HiveTableScanExecTransformer — the one §2.1 row that needs a real
  * metastore-backed catalog rather than the in-memory one).
  *
  * Builds a session with `enableHiveSupport()` over a throwaway Derby
  * metastore, creates a TEXTFILE table (text serde — the path Spark
  * does NOT convert to its native parquet scan), inserts through the
  * Hive write path, and asserts the read plans a genuine
  * `HiveTableScan`. Prints `HIVE_METASTORE_OK <n>` for the spec.
  */
object HiveMetastoreProbe {
  def main(args: Array[String]): Unit = {
    val wh = java.nio.file.Files.createTempDirectory("graft-hive-wh").toString
    val ms = java.nio.file.Files.createTempDirectory("graft-hive-ms").toString
    System.setProperty("derby.stream.error.file", s"$ms/derby.log")
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName("graft-hive-probe")
      .config("spark.sql.warehouse.dir", wh)
      .config("javax.jdo.option.ConnectionURL",
        s"jdbc:derby:;databaseName=$ms/metastore_db;create=true")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .enableHiveSupport()
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      require(spark.conf.get("spark.sql.catalogImplementation") == "hive",
        "session must run with the Hive catalog")
      spark.sql("CREATE TABLE hive_probe (k INT, v STRING) STORED AS TEXTFILE")
      spark.sql("INSERT INTO hive_probe VALUES (1,'a'),(2,'b'),(3,'c')")
      val df = spark.sql("SELECT k, v FROM hive_probe WHERE k > 1 ORDER BY k")
      val plan = df.queryExecution.executedPlan.toString
      require(plan.contains("HiveTableScan") || plan.contains("Scan hive"),
        "expected a Hive serde scan, got:\n" + plan.take(2000))
      val rows = df.collect()
      require(rows.map(_.getInt(0)).toSeq == Seq(2, 3), rows.mkString(","))
      // partitioned Hive table: static-partition insert + partition filter
      spark.sql(
        "CREATE TABLE hive_part (v STRING) PARTITIONED BY (p INT) STORED AS TEXTFILE")
      spark.sql("INSERT INTO hive_part PARTITION (p=1) VALUES ('x'),('y')")
      spark.sql("INSERT INTO hive_part PARTITION (p=2) VALUES ('z')")
      val part = spark.sql("SELECT v FROM hive_part WHERE p = 2")
      require(part.collect().map(_.getString(0)).toSeq == Seq("z"))
      require(spark.catalog.tableExists("hive_probe"))
      println(s"HIVE_METASTORE_OK ${rows.length}")
    } finally spark.stop()
  }
}
