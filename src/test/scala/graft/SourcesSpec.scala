package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Source/sink surface beyond the parquet default (SURVEY §2.1): ORC /
  * CSV / JSON round-trips, partitioned writes with partition pruning,
  * catalog tables, the columnar in-memory cache, and collect-limit /
  * tail execution. Reference analog: the read-format validation in
  * VeloxBackend (`backends-velox/.../VeloxBackend.scala:154-163,261-277`)
  * and ArrowCSVFileFormat; writes per WriteFilesExecTransformer
  * (`gluten-substrait/.../execution/WriteFilesExecTransformer.scala:1-309`).
  */
class SourcesSpec extends AnyFunSuite {
  private lazy val spark = GraftSparkSession.spark
  private val dir = GraftSparkSession.sfDir

  private def tmp(name: String): String =
    Files.createTempDirectory(s"graft_$name").resolve("out").toString

  private lazy val nation = Tables.load(spark, dir, "nation")

  test("ORC round-trip preserves schema and rows") {
    val path = tmp("orc")
    nation.write.orc(path)
    val back = spark.read.orc(path)
    assert(back.schema == nation.schema)
    assert(back.orderBy("n_nationkey").collect().toSeq ==
      nation.orderBy("n_nationkey").collect().toSeq)
  }

  test("CSV round-trip with header and explicit schema") {
    val path = tmp("csv")
    nation.write.option("header", "true").csv(path)
    val back = spark.read.option("header", "true").schema(nation.schema).csv(path)
    assert(back.orderBy("n_nationkey").collect().toSeq ==
      nation.orderBy("n_nationkey").collect().toSeq)
  }

  test("JSON round-trip (a plus over the reference, which has no JSON reader)") {
    val path = tmp("json")
    nation.write.json(path)
    val back = spark.read.schema(nation.schema).json(path)
    assert(back.orderBy("n_nationkey").collect().toSeq ==
      nation.orderBy("n_nationkey").collect().toSeq)
  }

  test("partitioned parquet write prunes partitions on read") {
    val path = tmp("part")
    Tables.load(spark, dir, "customer")
      .write.partitionBy("c_mktsegment").parquet(path)
    val one = spark.read.parquet(path).filter(col("c_mktsegment") === "BUILDING")
    val plan = one.queryExecution.executedPlan.toString
    // partition pruning shows up as a PartitionFilters entry on the scan
    assert(plan.contains("PartitionFilters: [isnotnull(c_mktsegment"), plan.take(1500))
    assert(one.count() ==
      Tables.load(spark, dir, "customer").filter(col("c_mktsegment") === "BUILDING").count())
  }

  // ---- wave 12: parquet read-path PLAN contracts (the value pins for
  // these faces are the pqpin_* golden entries in SparkSemanticsSpec;
  // reference: the GlutenParquetV1FilterSuite /
  // GlutenParquetV1SchemaPruningSuite enablement in
  // gluten-ut/spark35/.../velox/VeloxTestSettings.scala) ---------------

  /** full (untruncated) metadata of the first FileSourceScanExec — the
    * plan STRING truncates long filter lists at maxToStringFields */
  private def scanMeta(df: org.apache.spark.sql.DataFrame): Map[String, String] =
    df.queryExecution.executedPlan.collectFirst {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f.metadata
    }.get

  test("typed data filters reach the parquet scan as PushedFilters") {
    val path = tmp("pushdown")
    Tables.load(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"), col("o_orderdate"))
      .write.parquet(path)
    val q = spark.read.parquet(path)
      .filter(col("o_totalprice") > 1000.0 && col("o_orderdate") >= "1995-01-01" &&
        col("o_custkey").isNotNull)
      .select("o_orderkey")
    val m = scanMeta(q)
    val pushed = m("PushedFilters")
    assert(pushed.contains("GreaterThan(o_totalprice,1000.0)"), pushed)
    assert(pushed.contains("GreaterThanOrEqual(o_orderdate,"), pushed)
    assert(pushed.contains("IsNotNull(o_custkey)"), pushed)
    // column pruning: only the filter + projection columns are read
    // (o_orderdate ships as TIMESTAMP_NTZ in this testdata)
    assert(m("ReadSchema").contains("struct<o_orderkey:bigint,o_custkey:bigint," +
      "o_totalprice:double,o_orderdate:timestamp_ntz>"), m("ReadSchema"))
  }

  test("string and IN predicates push down; disabling the conf removes them") {
    val path = tmp("pushdown2")
    Tables.load(spark, dir, "nation").write.parquet(path)
    def q() = spark.read.parquet(path)
      .filter(col("n_name").startsWith("A") && col("n_regionkey").isin(0, 1))
    val on = scanMeta(q())("PushedFilters")
    assert(on.contains("StringStartsWith(n_name,A)"), on)
    assert(on.contains("In(n_regionkey, [0,1])"), on)
    // spark.sql.parquet.filterPushdown gates the READER's use of the
    // filters (row-group skipping), not the plan metadata — flipping it
    // must never change results, only the scan's work
    val key = "spark.sql.parquet.filterPushdown"
    val orig = spark.conf.getOption(key)
    spark.conf.set(key, "false")
    try {
      assert(q().collect().toSeq == q().collect().toSeq)
      assert(scanMeta(q())("PushedFilters") == on,
        "plan metadata should be conf-independent; the reader is what changes")
    } finally orig.fold(spark.conf.unset(key))(spark.conf.set(key, _))
  }

  test("nested schema pruning narrows ReadSchema to the accessed subfields") {
    val path = tmp("nestprune")
    Tables.load(spark, dir, "customer")
      .select(col("c_custkey"),
        struct(col("c_name").as("name"),
          struct(col("c_mktsegment").as("seg"), col("c_acctbal").as("bal")).as("contact"))
          .as("info"))
      .write.parquet(path)
    val q = spark.read.parquet(path).select(col("c_custkey"), col("info.contact.seg"))
    // only info.contact.seg survives in the scan schema — name and
    // bal are pruned away (spark.sql.optimizer.nestedSchemaPruning is
    // the engine default)
    val rs = scanMeta(q)("ReadSchema")
    assert(rs.contains("struct<c_custkey:bigint,info:struct<contact:struct<seg:string>>>"), rs)
  }

  test("partition filters prune at planning: pruned scan reads fewer files") {
    val path = tmp("partprune")
    Tables.load(spark, dir, "customer")
      .write.partitionBy("c_mktsegment").parquet(path)
    def scanOf(df: org.apache.spark.sql.DataFrame) =
      df.queryExecution.executedPlan.collectFirst {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => f
      }.get
    val all = scanOf(spark.read.parquet(path).select(col("c_custkey")))
    val pruned = scanOf(spark.read.parquet(path)
      .filter(col("c_mktsegment") === "BUILDING").select(col("c_custkey")))
    assert(pruned.relation.location.inputFiles.length == all.relation.location.inputFiles.length)
    // the FILE SELECTION after partition pruning is what shrinks
    assert(pruned.metadata("PartitionFilters").contains("c_mktsegment"),
      pruned.metadata.toString)
    val allFiles = all.selectedPartitions.totalNumberOfFiles
    val prunedFiles = pruned.selectedPartitions.totalNumberOfFiles
    assert(prunedFiles < allFiles, s"pruned $prunedFiles vs all $allFiles")
    // and the partition column itself is NOT in the data ReadSchema
    assert(!pruned.metadata("ReadSchema").contains("c_mktsegment"))
  }

  test("aggregate pushdown: MIN/MAX/COUNT answered from parquet footers") {
    // the engine sets spark.sql.parquet.aggregatePushdown=true; the
    // pushdown itself is a DSv2 ParquetScan capability (V1 FileScan has
    // no aggregate interface), so route this read through the V2 path
    val path = tmp("aggpush")
    Tables.load(spark, dir, "orders").select(col("o_orderkey"), col("o_totalprice"))
      .write.parquet(path)
    val key = "spark.sql.sources.useV1SourceList"
    val orig = spark.conf.getOption(key)
    spark.conf.set(key, "")
    try {
      val q = spark.read.parquet(path)
        .agg(min(col("o_orderkey")), max(col("o_orderkey")), count(lit(1)))
      val plan = q.queryExecution.executedPlan.toString
      assert(plan.contains(
        "PushedAggregation: [MIN(o_orderkey), MAX(o_orderkey), COUNT(*)]"), plan.take(2000))
      val expected = Tables.load(spark, dir, "orders")
        .agg(min(col("o_orderkey")), max(col("o_orderkey")), count(lit(1))).head
      assert(q.head == expected)
    } finally orig.fold(spark.conf.unset(key))(spark.conf.set(key, _))
  }

  test("ORC: typed filters reach the scan, nested ReadSchema prunes, footer aggregates push down") {
    val path = tmp("orcplan")
    Tables.load(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
        struct(col("o_orderstatus").as("st"), col("o_orderpriority").as("pri")).as("meta"))
      .write.orc(path)
    // V1 ORC scan: pushed filters + nested schema pruning
    val q = spark.read.orc(path)
      .filter(col("o_totalprice") > 1000.0 && col("o_custkey").isNotNull)
      .select(col("o_orderkey"), col("meta.pri"))
    val m = q.queryExecution.executedPlan.collectFirst {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f.metadata
    }.get
    assert(m("PushedFilters").contains("GreaterThan(o_totalprice,1000.0)"), m("PushedFilters"))
    assert(m("PushedFilters").contains("IsNotNull(o_custkey)"), m("PushedFilters"))
    assert(m("ReadSchema").contains("meta:struct<pri:string>") &&
      !m("ReadSchema").contains("st:string"), m("ReadSchema"))
    // DSv2 ORC scan: MIN/MAX/COUNT answered from file statistics
    val keys = Seq("spark.sql.sources.useV1SourceList" -> "",
      "spark.sql.orc.aggregatePushdown" -> "true")
    val origs = keys.map { case (k, _) => k -> spark.conf.getOption(k) }
    keys.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val agg = spark.read.orc(path)
        .agg(min(col("o_orderkey")), max(col("o_orderkey")), count(lit(1)))
      val plan = agg.queryExecution.executedPlan.toString
      assert(plan.contains(
        "PushedAggregation: [MIN(o_orderkey), MAX(o_orderkey), COUNT(*)]"), plan.take(2000))
      val expected = Tables.load(spark, dir, "orders")
        .agg(min(col("o_orderkey")), max(col("o_orderkey")), count(lit(1))).head
      assert(agg.head == expected)
    } finally origs.foreach { case (k, o) => o.fold(spark.conf.unset(k))(spark.conf.set(k, _)) }
  }

  test("catalog table: saveAsTable then spark.table + insertInto append") {
    spark.sql("DROP TABLE IF EXISTS graft_nation")
    nation.write.saveAsTable("graft_nation")
    val n0 = spark.table("graft_nation").count()
    assert(n0 == nation.count())
    nation.limit(1).write.mode("append").saveAsTable("graft_nation")
    assert(spark.table("graft_nation").count() == n0 + 1)
    spark.sql("DROP TABLE graft_nation")
  }

  test("insertInto appends by position into an existing table") {
    // (the default session catalog serves V1 tables, so the V2
    // `writeTo(...).append()` path requires an external TableCatalog —
    // DSv2 READ is exercised by EventsV2SourceSpec instead)
    spark.sql("DROP TABLE IF EXISTS graft_nation_ins")
    nation.write.saveAsTable("graft_nation_ins")
    try {
      nation.limit(2).write.insertInto("graft_nation_ins")
      assert(spark.table("graft_nation_ins").count() == nation.count() + 2)
    } finally spark.sql("DROP TABLE graft_nation_ins")
  }

  test("persist() plans InMemoryTableScan and survives source reuse") {
    val cached = nation.select(col("n_nationkey"), col("n_name")).persist()
    try {
      assert(cached.count() == nation.count())
      val plan = cached.filter(col("n_nationkey") > 2).queryExecution.executedPlan.toString
      assert(plan.contains("InMemoryTableScan"), plan.take(1500))
    } finally cached.unpersist()
  }

  test("head/tail run as collect-limit, not full materialization") {
    val sorted = Tables.load(spark, dir, "customer").orderBy("c_custkey")
    val h = sorted.head(3).map(_.getLong(0)).toSeq
    val t = sorted.tail(2).map(_.getLong(0)).toSeq
    val all = sorted.select("c_custkey").collect().map(_.getLong(0)).toSeq
    assert(h == all.take(3) && t == all.takeRight(2))
    val limitPlan = sorted.limit(3).queryExecution.executedPlan.toString
    assert(limitPlan.contains("TakeOrderedAndProject") || limitPlan.contains("CollectLimit"),
      limitPlan.take(800))
  }

  test("dynamic partition overwrite replaces only the partitions present in the write") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("dyn_overwrite").toString + "/t"
    Seq((1, "a"), (2, "b"), (3, "c")).toDF("v", "p")
      .write.partitionBy("p").parquet(dir)
    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try {
      // overwrite touches only partition p=b; a and c must survive
      Seq((20, "b")).toDF("v", "p")
        .write.mode("overwrite").partitionBy("p").parquet(dir)
      val rows = spark.read.parquet(dir).orderBy("p")
        .collect().map(r => (r.getInt(0), r.getString(1))).toSeq
      assert(rows == Seq((1, "a"), (20, "b"), (3, "c")), rows.toString)
      // static mode (the default) would have dropped a and c entirely
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
      case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    }
  }

  test("observe() attaches metrics to a query without a second pass") {
    import spark.implicits._
    val obs = new org.apache.spark.sql.Observation("src_metrics")
    val df = Tables.load(spark, dir, "orders")
      .observe(obs, count(lit(1)).as("rows"),
        sum(col("o_totalprice").cast("decimal(12,2)")).cast("double").as("total"))
      .filter(col("o_orderstatus") === "F")
    val filtered = df.count()
    val metrics = obs.get
    // metrics reflect ALL observed rows (pre-filter), collected inline
    assert(metrics("rows").asInstanceOf[Long] > filtered)
    assert(metrics("total").asInstanceOf[Double] > 0)
  }
}
