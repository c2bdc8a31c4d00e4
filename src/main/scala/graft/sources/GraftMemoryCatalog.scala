package graft.sources

import java.util

import scala.collection.concurrent.TrieMap
import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.{NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.catalyst.expressions.UnsafeProjection
import org.apache.spark.sql.connector.catalog.{Column => V2Column, Identifier, SupportsRead, SupportsWrite, Table, TableCapability, TableCatalog, TableChange}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Minimal V2 TableCatalog backed by driver memory — the §2.1 "V2
  * writes (append/overwrite/replace)" row made concrete (reference
  * analog: ColumnarV2TableWriteExec and the validator gates in
  * Validators.scala:136-152; table-format connectors enter through this
  * same API). Cluster-correct write protocol: each task's DataWriter
  * buffers UnsafeRow copies and ships them back in its
  * WriterCommitMessage; BatchWrite.commit applies them on the driver —
  * no executor-side shared state.
  *
  * Enable with `spark.sql.catalog.mem=graft.sources.GraftMemoryCatalog`,
  * then `df.writeTo("mem.t").create()` / `.append()` /
  * `spark.table("mem.t")`.
  */
class GraftMemoryCatalog extends TableCatalog {
  private var catalogName: String = _
  private val tables = new TrieMap[Identifier, GraftMemoryTable]()

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit =
    catalogName = name
  override def name(): String = catalogName

  override def listTables(namespace: Array[String]): Array[Identifier] =
    tables.keys.filter(_.namespace().sameElements(namespace)).toArray

  override def loadTable(ident: Identifier): Table =
    tables.getOrElse(ident, throw new NoSuchTableException(ident))

  override def createTable(ident: Identifier, columns: Array[V2Column],
      partitions: Array[Transform], properties: util.Map[String, String]): Table = {
    if (tables.contains(ident)) throw new TableAlreadyExistsException(ident)
    val t = new GraftMemoryTable(ident.toString,
      new StructType(columns.map(c =>
        org.apache.spark.sql.types.StructField(c.name(), c.dataType(), c.nullable()))))
    tables.put(ident, t)
    t
  }

  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    throw new UnsupportedOperationException("alterTable not supported")

  override def dropTable(ident: Identifier): Boolean = tables.remove(ident).isDefined

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit =
    throw new UnsupportedOperationException("renameTable not supported")
}

class GraftMemoryTable(tableName: String, tableSchema: StructType)
    extends Table with SupportsRead with SupportsWrite {

  // driver-side storage; all mutation happens in BatchWrite.commit
  private val rows = ArrayBuffer[InternalRow]()

  override def name(): String = tableName
  override def schema(): StructType = tableSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.TRUNCATE)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan with Batch {
        private val snapshot = rows.synchronized(rows.toArray)
        override def readSchema(): StructType = tableSchema
        override def toBatch: Batch = this
        override def planInputPartitions(): Array[InputPartition] =
          snapshot.grouped(math.max(1, snapshot.length / 4 + 1))
            .map(chunk => MemRowsPartition(chunk): InputPartition).toArray
        override def createReaderFactory(): PartitionReaderFactory =
          new PartitionReaderFactory {
            override def createReader(p: InputPartition): PartitionReader[InternalRow] =
              new PartitionReader[InternalRow] {
                private val it = p.asInstanceOf[MemRowsPartition].rows.iterator
                private var cur: InternalRow = _
                override def next(): Boolean = { val h = it.hasNext; if (h) cur = it.next(); h }
                override def get(): InternalRow = cur
                override def close(): Unit = ()
              }
          }
      }
    }

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder with org.apache.spark.sql.connector.write.SupportsTruncate {
      private var truncateRequested = false
      override def truncate(): WriteBuilder = { truncateRequested = true; this }
      override def build(): Write = new Write {
        override def toBatch: BatchWrite = new BatchWrite {
          private val doTruncate = truncateRequested
          override def createBatchWriterFactory(pi: PhysicalWriteInfo): DataWriterFactory =
            new MemWriterFactory(info.schema())
          override def commit(messages: Array[WriterCommitMessage]): Unit =
            rows.synchronized {
              if (doTruncate) rows.clear()
              messages.foreach { case MemCommit(batch) => rows ++= batch }
            }
          override def abort(messages: Array[WriterCommitMessage]): Unit = ()
        }
      }
    }
}

case class MemRowsPartition(rows: Array[InternalRow]) extends InputPartition
case class MemCommit(rows: Array[InternalRow]) extends WriterCommitMessage

class MemWriterFactory(schema: StructType) extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new DataWriter[InternalRow] {
      private val proj = UnsafeProjection.create(schema)
      private val buf = ArrayBuffer[InternalRow]()
      override def write(record: InternalRow): Unit = buf += proj(record).copy()
      override def commit(): WriterCommitMessage = MemCommit(buf.toArray)
      override def abort(): Unit = buf.clear()
      override def close(): Unit = ()
    }
}
