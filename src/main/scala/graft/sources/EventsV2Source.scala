package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types.{DoubleType, IntegerType, LongType, StringType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Minimal DataSource V2 connector — the §2.1 "Connectors" row made
  * concrete (reference analogs: BatchScanExecTransformer and the
  * Iceberg/Delta/Hudi connector modules, which all enter Spark through
  * exactly this API). A deterministic synthetic event generator with:
  *  - configurable row count and input-partition count
  *    (`.option("rows", n)`, `.option("partitions", p)`),
  *  - column pruning (SupportsPushDownRequiredColumns),
  *  - id-range filter pushdown (SupportsPushDownFilters): =, <, <=, >, >=
  *    on `id` narrow each partition's generation range at the source —
  *    residual filters stay in Spark.
  *
  * Row i: (id=i, bucket=i%10, value=i*0.5, tag="t"+(i%3)).
  * Register: `spark.read.format("graft.sources.EventsV2Source")`.
  */
class EventsV2Source extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    EventsV2Source.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new EventsV2Table(properties.getOrDefault("rows", "1000").toLong,
      properties.getOrDefault("partitions", "4").toInt,
      properties.getOrDefault("rowsPerBatch", "100").toLong)
  override def supportsExternalMetadata(): Boolean = false
}

object EventsV2Source {
  val schema: StructType = new StructType()
    .add("id", LongType).add("bucket", IntegerType)
    .add("value", DoubleType).add("tag", StringType)
}

class EventsV2Table(rows: Long, partitions: Int, rowsPerBatch: Long)
    extends Table with SupportsRead {
  override def name(): String = s"graft_events_v2($rows)"
  override def schema(): StructType = EventsV2Source.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new EventsV2ScanBuilder(rows, partitions, rowsPerBatch)
}

/** id-offset for the micro-batch stream: rows [0, id) have been planned */
case class EventsV2Offset(id: Long) extends Offset {
  override def json(): String = id.toString
}

class EventsV2ScanBuilder(rows: Long, partitions: Int, rowsPerBatch: Long = 100L)
    extends ScanBuilder with SupportsPushDownFilters with SupportsPushDownRequiredColumns {

  private var lo: Long = 0L
  private var hi: Long = rows // exclusive
  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = EventsV2Source.schema

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accepted, residual) = filters.partition {
      case EqualTo("id", _: java.lang.Long) => true
      case GreaterThan("id", _: java.lang.Long) => true
      case GreaterThanOrEqual("id", _: java.lang.Long) => true
      case LessThan("id", _: java.lang.Long) => true
      case LessThanOrEqual("id", _: java.lang.Long) => true
      case _ => false
    }
    accepted.foreach {
      case EqualTo("id", v: java.lang.Long) =>
        lo = math.max(lo, v); hi = math.min(hi, v + 1)
      case GreaterThan("id", v: java.lang.Long) => lo = math.max(lo, v + 1)
      case GreaterThanOrEqual("id", v: java.lang.Long) => lo = math.max(lo, v)
      case LessThan("id", v: java.lang.Long) => hi = math.min(hi, v)
      case LessThanOrEqual("id", v: java.lang.Long) => hi = math.min(hi, v + 1)
      case _ =>
    }
    pushed = accepted
    residual
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan =
    new EventsV2Scan(math.max(lo, 0L), math.max(hi, lo), partitions, required, pushed,
      rowsPerBatch)
}

class EventsV2Scan(lo: Long, hi: Long, partitions: Int,
    required: StructType, pushed: Array[Filter], rowsPerBatch: Long)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def description(): String =
    s"graft-events-v2 range=[$lo,$hi) PushedFilters: ${pushed.mkString("[", ", ", "]")}, " +
      s"ReadSchema: ${required.simpleString}"
  override def toBatch: Batch = this

  /** micro-batch stream over the same generator: each batch advances the
    * id-offset by rowsPerBatch until the configured row count is
    * exhausted — the MicroBatchStream/Offset protocol table-format
    * streaming sources (Kafka module analog, gluten-kafka) plug into. */
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new MicroBatchStream {
      // rate limit lives in offset PACING: each latestOffset() call
      // advances at most rowsPerBatch; planInputPartitions always serves
      // exactly [start, end) so no offset range can skip rows
      private var cursor = lo
      override def initialOffset(): Offset = EventsV2Offset(lo)
      override def latestOffset(): Offset = {
        cursor = math.min(hi, cursor + rowsPerBatch)
        EventsV2Offset(cursor)
      }
      override def deserializeOffset(json: String): Offset = EventsV2Offset(json.toLong)
      override def commit(end: Offset): Unit = ()
      override def stop(): Unit = ()
      override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
        val s0 = start.asInstanceOf[EventsV2Offset].id
        val e0 = end.asInstanceOf[EventsV2Offset].id
        if (e0 <= s0) Array.empty
        else Array(EventsV2Partition(s0, e0, required.fieldNames))
      }
      override def createReaderFactory(): PartitionReaderFactory = new EventsV2ReaderFactory
    }

  override def planInputPartitions(): Array[InputPartition] = {
    val n = hi - lo
    if (n <= 0) return Array.empty
    val p = math.min(partitions.toLong, n).toInt
    (0 until p).map { i =>
      val start = lo + n * i / p
      val end = lo + n * (i + 1) / p
      EventsV2Partition(start, end, required.fieldNames): InputPartition
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new EventsV2ReaderFactory
}

case class EventsV2Partition(start: Long, end: Long, fields: Array[String])
  extends InputPartition

class EventsV2ReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[EventsV2Partition]
    new PartitionReader[InternalRow] {
      private var cur = p.start - 1
      override def next(): Boolean = { cur += 1; cur < p.end }
      override def get(): InternalRow = {
        val vals: Array[Any] = p.fields.map {
          case "id" => cur
          case "bucket" => (cur % 10).toInt
          case "value" => cur * 0.5
          case "tag" => UTF8String.fromString("t" + (cur % 3))
        }
        InternalRow.fromSeq(vals.toIndexedSeq)
      }
      override def close(): Unit = ()
    }
  }
}
