package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Space-saving heavy-hitters sketch as a `TypedImperativeAggregate`
  * (the mechanism SURVEY.md §7 prescribes for engine-added aggregates;
  * reference analog: the custom Velox aggregates like
  * VeloxBloomFilterAggregate, backends-velox/.../VeloxBloomFilterAggregate.scala:1-172).
  *
  * Tracks at most `k` keys; on overflow the minimum-count entry is
  * evicted and its count inherited (standard space-saving error bound:
  * reported − true ≤ err). When `k` ≥ true distinct count the sketch is
  * EXACT — which makes it oracle-checkable on bounded-vocabulary data
  * while staying a constant-memory mergeable sketch at 100 TB scale
  * (partial sketches merge associatively across partitions).
  *
  * Output: array<struct<word string, cnt bigint>> sorted by
  * (-cnt, word) for determinism.
  */
case class TopKFreq(
    child: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[String, (Long, Long)]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("word", StringType), StructField("cnt", LongType))))
  override def prettyName: String = "topk_freq"

  override def createAggregationBuffer(): mutable.HashMap[String, (Long, Long)] =
    mutable.HashMap.empty

  private def add(buf: mutable.HashMap[String, (Long, Long)], key: String,
      cnt: Long, err: Long): Unit = {
    buf.get(key) match {
      case Some((c, e)) => buf.update(key, (c + cnt, e + err))
      case None if buf.size < k => buf.update(key, (cnt, err))
      case None =>
        // evict the min-count entry, inherit its count as error
        val (mk, (mc, _)) = buf.minBy { case (kk, (c, _)) => (c, kk) }
        buf.remove(mk)
        buf.update(key, (mc + cnt, mc + err))
    }
  }

  override def update(buf: mutable.HashMap[String, (Long, Long)],
      input: InternalRow): mutable.HashMap[String, (Long, Long)] = {
    val v = child.eval(input)
    if (v != null) add(buf, v.asInstanceOf[UTF8String].toString, 1L, 0L)
    buf
  }

  override def merge(buf: mutable.HashMap[String, (Long, Long)],
      other: mutable.HashMap[String, (Long, Long)]): mutable.HashMap[String, (Long, Long)] = {
    other.toSeq.sortBy { case (kk, (c, _)) => (-c, kk) }
      .foreach { case (kk, (c, e)) => add(buf, kk, c, e) }
    buf
  }

  override def eval(buf: mutable.HashMap[String, (Long, Long)]): Any = {
    val rows = buf.toSeq.sortBy { case (kk, (c, _)) => (-c, kk) }
      .map { case (kk, (c, _)) => InternalRow(UTF8String.fromString(kk), c) }
    new GenericArrayData(rows.toArray[Any])
  }

  override def serialize(buf: mutable.HashMap[String, (Long, Long)]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (kk, (c, e)) =>
      val b = kk.getBytes("UTF-8")
      out.writeInt(b.length); out.write(b); out.writeLong(c); out.writeLong(e)
    }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, (Long, Long)] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[String, (Long, Long)]
    (0 until n).foreach { _ =>
      val len = in.readInt(); val b = new Array[Byte](len); in.readFully(b)
      buf.update(new String(b, "UTF-8"), (in.readLong(), in.readLong()))
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKFreq =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKFreq =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): TopKFreq =
    copy(child = newChildren.head)
}

object TopKFreq {
  /** heavy-hitters column helper: array<struct<word,cnt>> */
  def topk_freq(c: Column, k: Int): Column =
    ColumnBridge.column(TopKFreq(ColumnBridge.expression(c), k).toAggregateExpression())
}
