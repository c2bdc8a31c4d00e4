package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** EXACT bounded top-k by score as a `TypedImperativeAggregate` — the
  * scalable replacement for the rank-window-then-filter idiom: a window
  * shuffles EVERY row of a group to one task before ranking, while this
  * aggregate keeps only k (score, id) pairs per group in each partial
  * buffer and merges them associatively, so the shuffle carries k rows
  * per (group × partition) regardless of group size. Exact (not a
  * sketch): the per-partition top-k union always contains the global
  * top-k. Determinism: ordering is (score desc, id asc) with the id as
  * the total tie-break.
  *
  * Same engine mechanism as [[TopKFreq]] (SURVEY.md §7's prescription
  * for engine-added aggregates); output array<struct<score double,
  * id bigint>> in rank order.
  */
case class TopKByScore(
    scoreExpr: Expression,
    idExpr: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.ArrayBuffer[(Double, Long)]] {

  override def children: Seq[Expression] = Seq(scoreExpr, idExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("score", DoubleType), StructField("id", LongType))))
  override def prettyName: String = "top_k_by_score"

  override def createAggregationBuffer(): mutable.ArrayBuffer[(Double, Long)] =
    mutable.ArrayBuffer.empty

  // keep the buffer in (score desc, id asc) order, truncated at k
  private def add(buf: mutable.ArrayBuffer[(Double, Long)], s: Double, id: Long): Unit = {
    if (buf.size < k || s > buf.last._1 || (s == buf.last._1 && id < buf.last._2)) {
      buf += ((s, id))
      val sorted = buf.sortBy { case (sc, i) => (-sc, i) }
      buf.clear()
      buf ++= sorted.take(k)
    }
  }

  override def update(buf: mutable.ArrayBuffer[(Double, Long)],
      input: InternalRow): mutable.ArrayBuffer[(Double, Long)] = {
    val s = scoreExpr.eval(input)
    val id = idExpr.eval(input)
    if (s != null && id != null)
      add(buf, s.asInstanceOf[Double], id.asInstanceOf[Long])
    buf
  }

  override def merge(buf: mutable.ArrayBuffer[(Double, Long)],
      other: mutable.ArrayBuffer[(Double, Long)]): mutable.ArrayBuffer[(Double, Long)] = {
    other.foreach { case (s, id) => add(buf, s, id) }
    buf
  }

  override def eval(buf: mutable.ArrayBuffer[(Double, Long)]): Any =
    new GenericArrayData(buf.sortBy { case (s, i) => (-s, i) }
      .map { case (s, i) => InternalRow(s, i) }.toArray[Any])

  override def serialize(buf: mutable.ArrayBuffer[(Double, Long)]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (s, id) => out.writeDouble(s); out.writeLong(id) }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.ArrayBuffer[(Double, Long)] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.ArrayBuffer.empty[(Double, Long)]
    (0 until n).foreach(_ => buf += ((in.readDouble(), in.readLong())))
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByScore =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByScore =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): TopKByScore =
    copy(scoreExpr = newChildren(0), idExpr = newChildren(1))
}

object TopKByScore {
  /** exact mergeable top-k column helper: array<struct<score,id>> */
  def top_k_by_score(score: Column, id: Column, k: Int): Column =
    ColumnBridge.column(TopKByScore(
      ColumnBridge.expression(score), ColumnBridge.expression(id), k)
      .toAggregateExpression())
}
