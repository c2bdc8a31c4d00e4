package graft.sources

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.columnar.{CachedBatch, CachedBatchSerializer}
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.vectorized.ColumnarBatch
import org.apache.spark.storage.StorageLevel
import org.apache.spark.unsafe.Platform

/** Pluggable in-memory-cache serializer — the §2.1 cache-serializer row
  * (reference ColumnarCachedBatchSerializer,
  * backends-velox/.../ColumnarCachedBatchSerializer.scala:1-305, which
  * swaps Spark's columnar cache encoding for the native engine's).
  * This engine's analog packs each cached partition into dense
  * row-batches: one contiguous byte buffer of UnsafeRow payloads plus
  * an offset index per batch.
  *
  * Why this shape at scale: a cached batch is ONE JVM object + one
  * primitive array regardless of row count (no per-row boxing in the
  * block store), rows deserialize by pointing an UnsafeRow at the
  * shared buffer (zero-copy until the column-pruning projection), and
  * the pruning projection (cache schema → selected schema) runs
  * codegen'd per batch. Registered through the standard
  * `spark.sql.cache.serializer` static conf — proving the engine rides
  * the same pluggability the reference's columnar cache uses.
  */
class GraftCachedBatchSerializer extends CachedBatchSerializer {

  override def supportsColumnarInput(schema: Seq[Attribute]): Boolean = false

  override def convertColumnarBatchToCachedBatch(
      input: RDD[ColumnarBatch], schema: Seq[Attribute],
      storageLevel: StorageLevel, conf: SQLConf): RDD[CachedBatch] =
    throw new UnsupportedOperationException("row-based serializer: columnar input unsupported")

  override def convertInternalRowToCachedBatch(
      input: RDD[InternalRow], schema: Seq[Attribute],
      storageLevel: StorageLevel, conf: SQLConf): RDD[CachedBatch] = {
    val batchSize = conf.columnBatchSize
    val dataTypes = schema.map(_.dataType).toArray
    input.mapPartitions { rows =>
      val toUnsafe = UnsafeProjection.create(dataTypes)
      new Iterator[CachedBatch] {
        override def hasNext: Boolean = rows.hasNext
        override def next(): CachedBatch = {
          val offsets = new scala.collection.mutable.ArrayBuffer[Int](batchSize)
          val chunks = new scala.collection.mutable.ArrayBuffer[Array[Byte]](batchSize)
          var total = 0
          var n = 0
          while (rows.hasNext && n < batchSize) {
            val u = rows.next() match {
              case ur: UnsafeRow => ur
              case r => toUnsafe(r)
            }
            // ALWAYS copy: upstream operators (codegen writers, explode,
            // UnsafeProjection) reuse one backing buffer across rows, and
            // UnsafeRow.getBytes returns that buffer UN-copied whenever
            // its length happens to equal sizeInBytes — aliasing every
            // row in the batch to the last row written
            val bytes = new Array[Byte](u.getSizeInBytes)
            Platform.copyMemory(u.getBaseObject, u.getBaseOffset,
              bytes, Platform.BYTE_ARRAY_OFFSET, u.getSizeInBytes)
            offsets += total
            chunks += bytes
            total += bytes.length
            n += 1
          }
          val data = new Array[Byte](total)
          var i = 0
          var pos = 0
          while (i < chunks.length) {
            System.arraycopy(chunks(i), 0, data, pos, chunks(i).length)
            pos += chunks(i).length
            i += 1
          }
          GraftRowBatch(data, offsets.toArray, n)
        }
      }
    }
  }

  override def supportsColumnarOutput(schema: StructType): Boolean = false

  override def vectorTypes(attributes: Seq[Attribute], conf: SQLConf): Option[Seq[String]] = None

  override def convertCachedBatchToColumnarBatch(
      input: RDD[CachedBatch], cacheAttributes: Seq[Attribute],
      selectedAttributes: Seq[Attribute], conf: SQLConf): RDD[ColumnarBatch] =
    throw new UnsupportedOperationException("row-based serializer: columnar output unsupported")

  override def convertCachedBatchToInternalRow(
      input: RDD[CachedBatch], cacheAttributes: Seq[Attribute],
      selectedAttributes: Seq[Attribute], conf: SQLConf): RDD[InternalRow] = {
    val numFields = cacheAttributes.length
    input.mapPartitions { batches =>
      val row = new UnsafeRow(numFields)
      // column pruning happens here: project the cached schema down to
      // the attributes this scan actually selects
      val proj = UnsafeProjection.create(selectedAttributes, cacheAttributes)
      batches.flatMap { cb =>
        val b = cb.asInstanceOf[GraftRowBatch]
        (0 until b.numRows).iterator.map { i =>
          val start = b.offsets(i)
          val end = if (i + 1 < b.numRows) b.offsets(i + 1) else b.data.length
          row.pointTo(b.data, Platform.BYTE_ARRAY_OFFSET + start, end - start)
          proj(row)
        }
      }
    }
  }

  /** No per-batch stats are kept, so no batch pruning — every batch is
    * scanned (the projection above still prunes columns). */
  override def buildFilter(predicates: Seq[Expression], cachedAttributes: Seq[Attribute])
      : (Int, Iterator[CachedBatch]) => Iterator[CachedBatch] =
    (_, it) => it
}

/** One cached batch: concatenated UnsafeRow payloads + row offsets. */
case class GraftRowBatch(data: Array[Byte], offsets: Array[Int], numRows: Int)
    extends CachedBatch {
  override def sizeInBytes: Long = data.length.toLong + offsets.length.toLong * 4 + 16
}
