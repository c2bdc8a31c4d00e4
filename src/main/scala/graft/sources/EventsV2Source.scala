package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsAdmissionControl}
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

/** Per-source-partition offset vector for the micro-batch stream — the
  * Kafka offset model (partition → next position), serialized as a JSON
  * array indexed by partition. positions(i) means partition i has
  * planned all its rows below that id. */
case class EventsV2StreamOffset(positions: IndexedSeq[Long]) extends Offset {
  override def json(): String = positions.mkString("[", ",", "]")
}

object EventsV2StreamOffset {
  def fromJson(json: String): EventsV2StreamOffset = {
    val body = json.trim.stripPrefix("[").stripSuffix("]").trim
    // a legacy single-long offset ("300") parses as a 1-element vector
    val xs = if (body.isEmpty) IndexedSeq.empty[Long]
      else body.split(",").toIndexedSeq.map(_.trim.toLong)
    EventsV2StreamOffset(xs)
  }
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

  /** micro-batch stream over the same generator — the MicroBatchStream/
    * Offset protocol table-format streaming sources (the Kafka module
    * analog, gluten-kafka) plug into. Kafka-shaped: multiple source
    * partitions with independent per-partition offset cursors. */
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new EventsV2MicroBatchStream(lo, hi, partitions, rowsPerBatch, required)

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

/** Kafka-shaped micro-batch stream: the id range [lo, hi) is split into
  * `partitions` contiguous source partitions, each with its own monotone
  * cursor; the stream offset is the vector of per-partition positions
  * (the Kafka partition→offset model). Rate limiting lives in offset
  * PACING — each latestOffset() advances every partition by at most
  * ceil(rowsPerBatch/partitions); planInputPartitions always serves
  * exactly [start_i, end_i) per partition, so no offset range can skip
  * rows.
  *
  * Restart contract ([[SupportsAdmissionControl]]): a fresh stream
  * instance's pacing cursors start at the range floor, so Spark's
  * restored start offset must win — `latestOffset(start, limit)`
  * reconciles the cursors FORWARD from the checkpointed offset before
  * advancing (deserializeOffset and planInputPartitions clamp too, for
  * the replay-uncommitted-batch path). The offset log therefore stays
  * monotone across restarts and previously-committed ranges are never
  * re-planned — exactly-once into an append sink. Without admission
  * control the no-arg latestOffset() is called before the source ever
  * sees the restored offset and a restarted query would regress the log.
  */
class EventsV2MicroBatchStream(lo: Long, hi: Long, partitions: Int,
    rowsPerBatch: Long, required: StructType)
    extends MicroBatchStream with SupportsAdmissionControl {
  private val p = math.max(1L, math.min(partitions.toLong, math.max(hi - lo, 1L))).toInt
  /** partition i owns ids [bound(i), bound(i+1)) */
  private def bound(i: Int): Long = lo + (hi - lo) * i / p
  private val perBatch = math.max(1L, (rowsPerBatch + p - 1) / p)
  private val cursors: Array[Long] = Array.tabulate(p)(bound)

  private def clampForward(o: EventsV2StreamOffset): Unit = {
    var i = 0
    while (i < p && i < o.positions.length) {
      cursors(i) = math.max(cursors(i), o.positions(i)); i += 1
    }
  }

  override def initialOffset(): Offset =
    EventsV2StreamOffset(IndexedSeq.tabulate(p)(bound))

  private def advance(): Offset = {
    var i = 0
    while (i < p) {
      cursors(i) = math.min(bound(i + 1), cursors(i) + perBatch); i += 1
    }
    EventsV2StreamOffset(cursors.toIndexedSeq)
  }

  /** Admission-control pacing: Spark passes the restored/committed start
    * offset — reconcile forward, then advance one paced step. */
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    clampForward(start.asInstanceOf[EventsV2StreamOffset])
    advance()
  }

  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()

  override def reportLatestOffset(): Offset =
    EventsV2StreamOffset(IndexedSeq.tabulate(p)(i => bound(i + 1)))

  // Spark only calls this variant when the source does NOT implement
  // SupportsAdmissionControl; kept as a safe fallback
  override def latestOffset(): Offset = advance()

  override def deserializeOffset(json: String): Offset = {
    val o = EventsV2StreamOffset.fromJson(json)
    clampForward(o) // restart: never pace below a checkpointed offset
    o
  }

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[EventsV2StreamOffset]
    val e = end.asInstanceOf[EventsV2StreamOffset]
    clampForward(e) // restart path: first call may precede any latestOffset()
    (0 until p).flatMap { i =>
      val s0 = if (i < s.positions.length) s.positions(i) else bound(i)
      val e0 = if (i < e.positions.length) e.positions(i) else bound(i)
      if (e0 > s0) Some(EventsV2Partition(s0, e0, required.fieldNames): InputPartition)
      else None
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = new EventsV2ReaderFactory
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
