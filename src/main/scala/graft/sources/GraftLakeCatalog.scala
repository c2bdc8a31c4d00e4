package graft.sources

import java.util

import scala.collection.concurrent.TrieMap
import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.{NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.catalyst.expressions.{BoundReference, UnsafeProjection}
import org.apache.spark.sql.connector.catalog.{Column => V2Column, Identifier, SupportsRead, SupportsWrite, Table, TableCapability, TableCatalog, TableChange}
import org.apache.spark.sql.connector.expressions.{Literal => V2Literal, Transform}
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, SupportsTruncate, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.sources.{EqualTo, Filter, In}
import org.apache.spark.sql.types.{DataType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Lakehouse-table-format analog — the §2.1 "Connectors
  * (Iceberg/Delta/Hudi/Paimon)" row rebuilt on the exact DSv2 surface
  * those formats use (reference modules gluten-iceberg
  * IcebergScanTransformer.scala:44, gluten-delta/, gluten-hudi/,
  * gluten-paimon/ all enter Spark through TableCatalog + Scan/Write):
  *
  *  - **snapshot isolation + time travel**: every commit produces an
  *    immutable numbered snapshot (version + wall-clock timestamp);
  *    `VERSION AS OF n` / `TIMESTAMP AS OF t` resolve through the
  *    standard `TableCatalog.loadTable(ident, version/timestamp)`
  *    hooks, and a running scan binds to ONE snapshot (concurrent
  *    appends never tear a read);
  *  - **partition transforms**: `PARTITIONED BY (col, bucket(n, col))`
  *    — identity and bucket transforms; writers route rows to
  *    partition-addressed data files (one file per task ×
  *    partition-value, the Iceberg manifest-entry shape);
  *  - **partition pruning at the source**: EqualTo/In predicates on
  *    identity columns and EqualTo on bucket sources prune data files
  *    BEFORE any reader spins up (identity predicates are satisfied by
  *    pruning and not re-evaluated; bucket predicates stay residual);
  *    the scan description reports `files=kept/total` for plan
  *    assertions;
  *  - **column pruning**: readers project stored full-schema rows down
  *    to the scan's required columns.
  *
  * Data lives in driver memory (the sandbox's stand-in for object
  * storage) but every protocol step — task-side buffering, commit
  * messages, driver-side atomic snapshot swap — is the cluster-correct
  * shape: executors never share state, and a commit is one reference
  * swap.
  *
  * Enable: `spark.sql.catalog.lake=graft.sources.GraftLakeCatalog`.
  */
class GraftLakeCatalog extends TableCatalog {
  private var catalogName: String = _
  private val tables = new TrieMap[Identifier, LakeTableState]()

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit =
    catalogName = name
  override def name(): String = catalogName

  override def listTables(namespace: Array[String]): Array[Identifier] =
    tables.keys.filter(_.namespace().sameElements(namespace)).toArray

  private def state(ident: Identifier): LakeTableState =
    tables.getOrElse(ident, throw new NoSuchTableException(ident))

  override def loadTable(ident: Identifier): Table =
    new GraftLakeTable(state(ident), pinned = None)

  /** VERSION AS OF — pin the scan to a named snapshot. */
  override def loadTable(ident: Identifier, version: String): Table = {
    val st = state(ident)
    val snap = st.byVersion(version.toLong)
      .getOrElse(throw new NoSuchTableException(ident))
    new GraftLakeTable(st, pinned = Some(snap))
  }

  /** TIMESTAMP AS OF (micros) — latest snapshot at or before t. */
  override def loadTable(ident: Identifier, timestampMicros: Long): Table = {
    val st = state(ident)
    val snap = st.byTimestampMs(timestampMicros / 1000L)
      .getOrElse(throw new NoSuchTableException(ident))
    new GraftLakeTable(st, pinned = Some(snap))
  }

  override def createTable(ident: Identifier, columns: Array[V2Column],
      partitions: Array[Transform], properties: util.Map[String, String]): Table = {
    if (tables.contains(ident)) throw new TableAlreadyExistsException(ident)
    val schema = new StructType(columns.map(c =>
      org.apache.spark.sql.types.StructField(c.name(), c.dataType(), c.nullable())))
    val specs = partitions.map { t =>
      val idx = schema.fieldIndex(t.references().head.fieldNames().head)
      t.name() match {
        case "identity" => LakePartField(idx, schema(idx).dataType, bucket = 0)
        case "bucket" =>
          val n = t.arguments().collectFirst {
            case l: V2Literal[_] => l.value().asInstanceOf[Number].intValue()
          }.getOrElse(throw new IllegalArgumentException(s"bucket without count: $t"))
          LakePartField(idx, schema(idx).dataType, bucket = n)
        case other =>
          throw new UnsupportedOperationException(s"unsupported transform: $other")
      }
    }
    val st = new LakeTableState(ident.toString, schema, specs.toIndexedSeq)
    tables.put(ident, st)
    new GraftLakeTable(st, pinned = None)
  }

  /** snapshot history (version, timestampMs, rowCount) — the
    * `table.snapshots` metadata surface table formats expose */
  def snapshots(ident: Identifier): Seq[(Long, Long, Long)] =
    state(ident).history.map(s => (s.version, s.timestampMs, s.rowCount))

  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    throw new UnsupportedOperationException("alterTable not supported")
  override def dropTable(ident: Identifier): Boolean = tables.remove(ident).isDefined
  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit =
    throw new UnsupportedOperationException("renameTable not supported")
}

/** one partition-spec field: source ordinal + (bucket==0 → identity) */
case class LakePartField(ordinal: Int, dataType: DataType, bucket: Int) {
  /** partition value of a row: identity value (normalized) or bucket id */
  def eval(row: InternalRow): Any = {
    val v = LakePartField.normalize(row.get(ordinal, dataType))
    if (bucket == 0) v else LakePartField.bucketOf(v, bucket)
  }
}

object LakePartField {
  /** UTF8String → String etc. so write-side values and driver-side
    * filter literals hash/compare identically */
  def normalize(v: Any): Any = v match {
    case u: UTF8String => u.toString
    case other => other
  }
  def bucketOf(v: Any, n: Int): Int =
    if (v == null) 0 else ((v.hashCode % n) + n) % n
}

/** immutable data file: partition tuple + full-schema UnsafeRow payloads */
case class LakeDataFile(partition: IndexedSeq[Any], rows: Array[InternalRow])

case class LakeSnapshot(version: Long, timestampMs: Long, files: Vector[LakeDataFile]) {
  def rowCount: Long = files.map(_.rows.length.toLong).sum
}

/** all mutation = one synchronized snapshot append (commit protocol) */
class LakeTableState(val tableName: String, val schema: StructType,
    val partFields: IndexedSeq[LakePartField]) {
  @volatile private var snaps: Vector[LakeSnapshot] =
    Vector(LakeSnapshot(0L, System.currentTimeMillis(), Vector.empty))
  def current: LakeSnapshot = snaps.last
  def history: Vector[LakeSnapshot] = snaps
  def byVersion(v: Long): Option[LakeSnapshot] = snaps.find(_.version == v)
  def byTimestampMs(ms: Long): Option[LakeSnapshot] =
    snaps.filter(_.timestampMs <= ms).lastOption
  def commit(newFiles: Seq[LakeDataFile], truncate: Boolean): Unit = synchronized {
    val base = if (truncate) Vector.empty else current.files
    // monotone timestamps even when commits land within one millisecond
    val ts = math.max(System.currentTimeMillis(), current.timestampMs + 1)
    snaps = snaps :+ LakeSnapshot(current.version + 1, ts, base ++ newFiles)
  }

  /** streaming epoch commit, idempotent per (query, epoch): a replayed
    * epoch after a driver restart must not double-append */
  private val committedEpochs = scala.collection.mutable.HashSet[String]()
  def commitEpoch(queryId: String, epochId: Long, newFiles: Seq[LakeDataFile]): Unit =
    synchronized {
      val key = s"$queryId:$epochId"
      if (!committedEpochs.contains(key)) {
        committedEpochs += key
        commit(newFiles, truncate = false)
      }
    }
}

class GraftLakeTable(state: LakeTableState, pinned: Option[LakeSnapshot])
    extends Table with SupportsRead with SupportsWrite {

  override def name(): String = state.tableName
  override def schema(): StructType = state.schema
  override def partitioning(): Array[Transform] = {
    import org.apache.spark.sql.connector.expressions.Expressions
    state.partFields.map { pf =>
      val colName = state.schema(pf.ordinal).name
      if (pf.bucket == 0) Expressions.identity(colName)
      else Expressions.bucket(pf.bucket, colName)
    }.toArray
  }
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.TRUNCATE, TableCapability.STREAMING_WRITE)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new LakeScanBuilder(state, pinned.getOrElse(state.current))

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder with SupportsTruncate {
      private var truncateRequested = false
      override def truncate(): WriteBuilder = { truncateRequested = true; this }
      override def build(): Write = new Write {
        override def toBatch: BatchWrite = new BatchWrite {
          private val doTruncate = truncateRequested
          override def createBatchWriterFactory(pi: PhysicalWriteInfo): DataWriterFactory =
            new LakeWriterFactory(info.schema(), state.partFields)
          override def commit(messages: Array[WriterCommitMessage]): Unit =
            state.commit(messages.flatMap { case LakeCommit(files) => files }.toSeq, doTruncate)
          override def abort(messages: Array[WriterCommitMessage]): Unit = ()
        }

        /** streaming ingest: every micro-batch epoch commits one
          * snapshot (idempotent on epoch replay) — the lakehouse
          * streaming-sink shape */
        override def toStreaming: org.apache.spark.sql.connector.write.streaming.StreamingWrite =
          new org.apache.spark.sql.connector.write.streaming.StreamingWrite {
            private val queryId = info.queryId()
            override def createStreamingWriterFactory(pi: PhysicalWriteInfo)
                : org.apache.spark.sql.connector.write.streaming.StreamingDataWriterFactory =
              new LakeStreamingWriterFactory(info.schema(), state.partFields)
            override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit =
              state.commitEpoch(queryId, epochId,
                messages.flatMap { case LakeCommit(files) => files }.toSeq)
            override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit = ()
          }
      }
    }
}

class LakeScanBuilder(state: LakeTableState, snapshot: LakeSnapshot)
    extends ScanBuilder with SupportsPushDownFilters with SupportsPushDownRequiredColumns {

  private var accepted: Array[Filter] = Array.empty
  private var required: StructType = state.schema

  /** (partition-spec index, allowed partition values) per usable filter */
  private var pruneSets: Seq[(Int, Set[Any])] = Nil

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val fieldByName = state.partFields.zipWithIndex.map { case (pf, i) =>
      state.schema(pf.ordinal).name -> ((pf, i))
    }.toMap
    val acc = mutable.ArrayBuffer[Filter]()
    val residual = mutable.ArrayBuffer[Filter]()
    val prunes = mutable.ArrayBuffer[(Int, Set[Any])]()
    filters.foreach {
      case f @ EqualTo(col, value) if fieldByName.contains(col) =>
        val (pf, i) = fieldByName(col)
        val v = LakePartField.normalize(value)
        if (pf.bucket == 0) { prunes += ((i, Set(v))); acc += f }
        else {
          // bucket pruning keeps only the value's bucket; the equality
          // itself must still run on the rows → residual
          prunes += ((i, Set(LakePartField.bucketOf(v, pf.bucket)))); residual += f
        }
      case f @ In(col, values) if fieldByName.contains(col) &&
          fieldByName(col)._1.bucket == 0 =>
        val (_, i) = fieldByName(col)
        prunes += ((i, values.map(LakePartField.normalize).toSet)); acc += f
      case other => residual += other
    }
    accepted = acc.toArray
    pruneSets = prunes.toSeq
    residual.toArray
  }

  override def pushedFilters(): Array[Filter] = accepted

  override def pruneColumns(requiredSchema: StructType): Unit = required = requiredSchema

  override def build(): Scan = {
    val kept = snapshot.files.filter { f =>
      pruneSets.forall { case (i, allowed) => allowed.contains(f.partition(i)) }
    }
    new LakeScan(state, snapshot, kept, required)
  }
}

class LakeScan(state: LakeTableState, snapshot: LakeSnapshot,
    files: Vector[LakeDataFile], required: StructType) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def description(): String =
    s"graft-lake ${state.tableName} snapshot=v${snapshot.version} " +
      s"files=${files.length}/${snapshot.files.length} " +
      s"ReadSchema: ${required.simpleString}"
  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] =
    files.map(f => LakeFilePartition(f.rows, requiredOrdinals): InputPartition).toArray

  private def requiredOrdinals: Array[Int] =
    required.fields.map(f => state.schema.fieldIndex(f.name))

  override def createReaderFactory(): PartitionReaderFactory = {
    val fullSchema = state.schema
    new PartitionReaderFactory {
      override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
        val fp = p.asInstanceOf[LakeFilePartition]
        // column pruning: bind the projection to the stored full schema
        val proj = UnsafeProjection.create(fp.ordinals.toIndexedSeq.map(i =>
          BoundReference(i, fullSchema(i).dataType, fullSchema(i).nullable)))
        new PartitionReader[InternalRow] {
          private val it = fp.rows.iterator
          private var cur: InternalRow = _
          override def next(): Boolean = {
            val h = it.hasNext; if (h) cur = proj(it.next()); h
          }
          override def get(): InternalRow = cur
          override def close(): Unit = ()
        }
      }
    }
  }
}

case class LakeFilePartition(rows: Array[InternalRow], ordinals: Array[Int])
  extends InputPartition

case class LakeCommit(files: Array[LakeDataFile]) extends WriterCommitMessage

/** streaming variant of the writer factory: same task-side buffering,
  * keyed additionally by epoch through the streaming SPI */
class LakeStreamingWriterFactory(schema: StructType, partFields: IndexedSeq[LakePartField])
    extends org.apache.spark.sql.connector.write.streaming.StreamingDataWriterFactory {
  private val batch = new LakeWriterFactory(schema, partFields)
  override def createWriter(partitionId: Int, taskId: Long, epochId: Long)
      : DataWriter[InternalRow] = batch.createWriter(partitionId, taskId)
}

/** task-side writer: routes each row to its partition-addressed buffer;
  * one data file per (task, partition value) — the manifest-entry shape */
class LakeWriterFactory(schema: StructType, partFields: IndexedSeq[LakePartField])
    extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new DataWriter[InternalRow] {
      private val proj = UnsafeProjection.create(schema)
      private val buffers =
        mutable.LinkedHashMap[IndexedSeq[Any], mutable.ArrayBuffer[InternalRow]]()
      override def write(record: InternalRow): Unit = {
        val key: IndexedSeq[Any] = partFields.map(_.eval(record))
        buffers.getOrElseUpdate(key, mutable.ArrayBuffer[InternalRow]()) += proj(record).copy()
      }
      override def commit(): WriterCommitMessage =
        LakeCommit(buffers.map { case (k, rows) => LakeDataFile(k, rows.toArray) }.toArray)
      override def abort(): Unit = buffers.clear()
      override def close(): Unit = ()
    }
}
