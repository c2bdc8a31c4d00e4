package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Z-order (interleaved-bit) clustering for multi-dimensional data
  * skipping — the lakehouse `OPTIMIZE ... ZORDER BY` shape (reference
  * analog: the Iceberg/Delta table-format connectors whose manifests
  * carry per-file column min/max, `gluten-iceberg/.../
  * IcebergScanTransformer.scala:44`; clustering is what makes those
  * stats selective on MORE THAN ONE column at once).
  *
  * Linear (sort-by-one-column) clustering gives tight file stats on
  * that column only: a predicate on any other column scans every file.
  * Mapping each row to a point on the Z-space-filling curve and
  * range-partitioning on the curve position keeps every file's
  * bounding box small in ALL clustered dimensions, so a 2-D box
  * predicate prunes ~(selA × selB) of the files instead of ~selA.
  *
  * Scale design:
  *  - the only driver-side work is a single min/max aggregate (at
  *    100 TB this is a catalog column-stats lookup, not a scan);
  *  - rank normalization + bit interleaving are composed entirely from
  *    codegen'd built-ins (`shiftleft`/`bitwiseOR`/`bitwiseAND`) — the
  *    whole key stays inside WholeStageCodegen, no UDF;
  *  - `repartitionByRange` samples the key distribution, so skewed
  *    dimensions still yield evenly-sized files (the small-files and
  *    giant-file defences in one);
  *  - within-partition sort by the key tightens row-group locality for
  *    formats whose readers skip at finer grain than whole files.
  */
object ZOrder {

  /** spread the low 16 bits of a non-negative value so consecutive
    * input bits land two positions apart (classic binary-magic
    * spreading, kept in LONG space so no shift touches a sign bit) */
  private def spread16(c: Column): Column = {
    val x0 = c.cast(LongType)
    val x1 = x0.bitwiseOR(shiftleft(x0, 8)).bitwiseAND(lit(0x00FF00FFL))
    val x2 = x1.bitwiseOR(shiftleft(x1, 4)).bitwiseAND(lit(0x0F0F0F0FL))
    val x3 = x2.bitwiseOR(shiftleft(x2, 2)).bitwiseAND(lit(0x33333333L))
    x3.bitwiseOR(shiftleft(x3, 1)).bitwiseAND(lit(0x55555555L))
  }

  /** interleave two 16-bit ranks into a 32-bit Z-curve position
    * (column a holds the even bit positions, b the odd) */
  def interleave16(a: Column, b: Column): Column =
    spread16(a).bitwiseOR(shiftleft(spread16(b), 1))

  /** map a numeric column onto 0..65535 given its [mn, mx] range; a
    * degenerate range collapses to rank 0 (layout-only — rank quality
    * affects clustering, never query results) */
  def rank16(c: Column, mn: Double, mx: Double): Column =
    if (mx <= mn) lit(0L)
    else least(lit(65535L),
      floor((c.cast("double") - lit(mn)) / lit(mx - mn) * lit(65536.0)).cast(LongType))

  /** cluster `df` on the Z-curve over (a, b) into `numFiles` range
    * partitions; the returned frame writes one tightly-boxed file per
    * partition through any sink that preserves input partitioning */
  def cluster(df: DataFrame, a: String, b: String, numFiles: Int): DataFrame = {
    val r = df.agg(min(col(a).cast("double")), max(col(a).cast("double")),
      min(col(b).cast("double")), max(col(b).cast("double"))).head()
    if (r.isNullAt(0) || r.isNullAt(2)) return df // empty/all-null input: nothing to cluster
    val key = interleave16(
      rank16(col(a), r.getDouble(0), r.getDouble(1)),
      rank16(col(b), r.getDouble(2), r.getDouble(3)))
    df.withColumn("__zkey", key)
      .repartitionByRange(numFiles, col("__zkey"))
      .sortWithinPartitions("__zkey")
      .drop("__zkey")
  }
}
