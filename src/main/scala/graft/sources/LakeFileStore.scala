package graft.sources

import java.io.File
import java.util.UUID

import org.apache.hadoop.mapreduce.{Job, TaskAttemptID, TaskID, TaskType, JobID}
import org.apache.hadoop.mapreduce.task.TaskAttemptContextImpl
import org.apache.spark.paths.SparkPath
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.execution.datasources.{FileFormat, OutputWriterFactory, PartitionedFile}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.types.{DataType, StructField, StructType}
import org.apache.spark.util.SerializableConfiguration

/** Data-file storage for [[GraftLakeCatalog]]: every committed data file
  * is a REAL parquet file on local disk (the sandbox's stand-in for
  * object storage), written and read through Spark's own parquet
  * machinery (`ParquetFileFormat.prepareWrite` task-side writers /
  * `buildReaderWithPartitionValues` streaming readers — the exact code
  * paths a production FileFormat write/scan uses). Only the MANIFEST
  * (paths, partition tuples, field ids, min/max stats, blooms) lives in
  * the catalog, matching the Iceberg/Delta split the reference
  * connectors target (`gluten-iceberg/.../IcebergScanTransformer.scala:44`):
  * metadata in the catalog/manifest, data in files.
  *
  * Column naming: files are written with SYNTHETIC field-id names
  * (`f<id>`), so storage never sees user column names — renames are
  * metadata-only and old files stay readable after any rename, exactly
  * the Iceberg field-id resolution model.
  *
  * Scale shape: writers run task-side and stream rows straight to their
  * own parquet file (no driver involvement until the manifest-entry
  * commit message); readers are the standard per-file streaming parquet
  * iterators with column pruning. Files are immutable; rewrites commit
  * new files and old snapshots stay time-travel readable, so physical
  * deletion happens only at JVM exit.
  */
object LakeFileStore {

  /** One warehouse directory per JVM (shared "object store" for all
    * catalog instances). The delete-on-exit hook is registered ONLY for
    * the auto-generated tmpdir default: a user-supplied
    * `-Dgraft.lake.warehouse` path may be a pre-existing directory with
    * unrelated contents, and recursively deleting it at JVM exit would
    * silently destroy it — user-named warehouses are left on disk. */
  lazy val warehouseDir: File = {
    val userPath = sys.props.get("graft.lake.warehouse")
    val d = new File(userPath.getOrElse(
      new File(System.getProperty("java.io.tmpdir"), s"graft-lake-${UUID.randomUUID()}").getPath))
    d.mkdirs()
    if (userPath.isEmpty)
      Runtime.getRuntime.addShutdownHook(new Thread(() => deleteRecursively(d)))
    d
  }

  private def deleteRecursively(f: File): Unit = {
    val cs = f.listFiles()
    if (cs != null) cs.foreach(deleteRecursively)
    f.delete(): Unit
  }

  /** storage schema of a file: synthetic names keyed by field id */
  def syntheticSchema(fieldIds: Seq[Int], types: Seq[DataType]): StructType =
    StructType(fieldIds.lazyZip(types).map((id, dt) =>
      StructField(s"f$id", dt, nullable = true)).toArray)

  /** Everything a task needs to write parquet files, captured ON THE
    * DRIVER (where the SparkSession lives) and shipped inside the
    * DataWriterFactory. The OutputWriterFactory and hadoop conf are the
    * same pair Spark's FileFormatWriter serializes to its write tasks. */
  final case class WriterBundle(
      factory: OutputWriterFactory,
      conf: SerializableConfiguration,
      dir: String,
      schemaJson: String) extends Serializable {
    @transient lazy val schema: StructType =
      DataType.fromJson(schemaJson).asInstanceOf[StructType]
  }

  def writerBundle(fieldIds: Seq[Int], types: Seq[DataType]): WriterBundle = {
    val spark = SparkSession.active
    val schema = syntheticSchema(fieldIds, types)
    val job = Job.getInstance(spark.sessionState.newHadoopConf())
    // The old in-memory lake stored pre-1582 dates/timestamps verbatim;
    // ParquetFileFormat would inherit rebaseModeInWrite=EXCEPTION and
    // throw SparkUpgradeException on them. CORRECTED preserves the old
    // store-what-you-were-given behavior (proleptic Gregorian on disk).
    job.getConfiguration.set("spark.sql.parquet.datetimeRebaseModeInWrite", "CORRECTED")
    job.getConfiguration.set("spark.sql.parquet.int96RebaseModeInWrite", "CORRECTED")
    val factory = new ParquetFileFormat().prepareWrite(spark, job, Map.empty, schema)
    WriterBundle(factory, new SerializableConfiguration(job.getConfiguration),
      warehouseDir.getAbsolutePath, schema.json)
  }

  private def taskAttemptContext(conf: org.apache.hadoop.conf.Configuration): TaskAttemptContextImpl =
    new TaskAttemptContextImpl(conf,
      new TaskAttemptID(new TaskID(new JobID("graft-lake", 0), TaskType.MAP, 0), 0))

  /** task-side (or driver-side for maintenance rewrites): stream rows in
    * the bundle's schema layout into a fresh parquet file; returns its
    * absolute path for the manifest entry */
  def write(bundle: WriterBundle, rows: Iterator[InternalRow]): String = {
    val (path, writer) = openWriter(bundle)
    try rows.foreach(writer.write) finally writer.close()
    path
  }

  /** open a fresh parquet file for incremental writing (path reserved
    * up front for the manifest entry) */
  def openWriter(bundle: WriterBundle)
      : (String, org.apache.spark.sql.execution.datasources.OutputWriter) = {
    val path = new File(bundle.dir, s"${UUID.randomUUID()}.parquet").getAbsolutePath
    (path, bundle.factory.newInstance(path, bundle.schema,
      taskAttemptContext(bundle.conf.value)))
  }

  /** Driver-side: a SERIALIZABLE per-file read function (column-pruned
    * to `requiredSchema`, a subset of `fileSchema`'s synthetic columns).
    * `OPTION_RETURNING_BATCH -> false` forces plain row iterators — the
    * DSv2 PartitionReader contract here is row-at-a-time. */
  def readerFunc(fileSchema: StructType, requiredSchema: StructType)
      : PartitionedFile => Iterator[InternalRow] = {
    val spark = SparkSession.active
    new ParquetFileFormat().buildReaderWithPartitionValues(
      spark,
      dataSchema = fileSchema,
      partitionSchema = new StructType(),
      requiredSchema = requiredSchema,
      filters = Nil,
      options = Map(FileFormat.OPTION_RETURNING_BATCH -> "false"),
      hadoopConf = spark.sessionState.newHadoopConf())
  }

  def partitionedFile(path: String): PartitionedFile = {
    val f = new File(path)
    PartitionedFile(InternalRow.empty, SparkPath.fromPathString(path),
      0L, f.length(), Array.empty, 0L, f.length(), Map.empty)
  }

  /** driver-side full read of one data file in its write-time layout
    * (compaction / CDF maintenance paths) */
  def readAll(path: String, fieldIds: Seq[Int], types: Seq[DataType]): Iterator[InternalRow] = {
    val schema = syntheticSchema(fieldIds, types)
    readerFunc(schema, schema)(partitionedFile(path))
  }
}

/** One data file mid-write: rows stream straight into the parquet
  * writer (NEVER buffered — a task's memory footprint is the open
  * writers' page buffers, not its input), while per-column (min, max)
  * stats and equality blooms accumulate incrementally. `finish()`
  * closes the file and returns its manifest entry. Streaming blooms are
  * fixed at the [[LakeBloom]] size cap (8 KB/column) because the row
  * count is unknown until the end. */
final class LakeOpenFile(bundle: LakeFileStore.WriterBundle,
    partition: IndexedSeq[Any], fieldIds: IndexedSeq[Int],
    types: IndexedSeq[DataType]) {
  private val (path, writer) = LakeFileStore.openWriter(bundle)
  private var count = 0L
  private val n = types.length
  private val statable: Array[Boolean] = types.map(LakeStats.supported).toArray
  private val mns = new Array[Any](n)
  private val mxs = new Array[Any](n)
  private val blooms: Array[Array[Long]] =
    statable.map(s => if (s) LakeBloom.streamBits() else null)
  private val seen = new Array[Boolean](n)

  def add(row: InternalRow): Unit = {
    writer.write(row)
    count += 1
    var i = 0
    while (i < n) {
      if (statable(i) && !row.isNullAt(i)) {
        // normalize() yields owned values (UTF8String -> String), safe to
        // retain past the projection buffer's reuse
        val v = LakePartField.normalize(row.get(i, types(i)))
        if (mns(i) == null || LakeStats.compare(v, mns(i)).exists(_ < 0)) mns(i) = v
        if (mxs(i) == null || LakeStats.compare(v, mxs(i)).exists(_ > 0)) mxs(i) = v
        LakeBloom.set(blooms(i), v)
        seen(i) = true
      }
      i += 1
    }
  }

  def finish(): LakeDataFile = {
    writer.close()
    LakeDataFile(partition, path, count, fieldIds, types,
      types.indices.map(i => if (seen(i)) Some((mns(i), mxs(i))) else None),
      types.indices.map(i => if (seen(i)) Some(blooms(i)) else None))
  }

  def abortQuietly(): Unit =
    try { writer.close(); new File(path).delete(): Unit } catch { case _: Exception => () }
}
