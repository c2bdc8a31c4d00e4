package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.expressions.RowOrdering
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DateType, IntegerType, LongType, TimestampType}

/** AS-OF JOIN — a whole-operator custom node (LogicalPlan + Strategy +
  * SparkPlan registered through SparkSessionExtensions), the mechanism
  * SURVEY.md §7 reserves for operators Spark lacks entirely. The
  * reference has no as-of/range join either (SURVEY.md §2.3) — this is
  * beyond-reference capability for time-series/event pipelines.
  *
  * Semantics: for every left row, the single right row with the same
  * partition key and
  *  - direction = backward: the greatest right-time <= left-time;
  *  - direction = forward: the smallest right-time >= left-time;
  * optionally rejected when the time gap exceeds `toleranceUnits`
  * (expressed in the time column's native units — microseconds for
  * timestamps, days for dates, raw values for integral columns).
  * Unmatched left rows keep nulls on the right; null times never match.
  *
  * Scale design: requires ClusteredDistribution on the keys for both
  * children (one co-partitioning shuffle each, exactly like a sort-merge
  * join) and per-partition ordering by (keys, time); execution is then a
  * single forward merge per partition — O(n+m), no per-row range scan,
  * no state beyond one buffered right row. At 100 TB this behaves like
  * SMJ: linear scans over co-partitioned sorted runs.
  */
case class AsOfJoin(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    forward: Boolean = false,
    toleranceUnits: Option[Long] = None) extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(l: LogicalPlan, r: LogicalPlan): AsOfJoin =
    copy(left = l, right = r)
}

object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoin(l, r, lk, rk, lt, rt, fwd, tol) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt, fwd, tol) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    forward: Boolean,
    toleranceUnits: Option[Long]) extends BinaryExecNode {

  // mixed time types (e.g. DateType vs TimestampType) would compare days
  // against microseconds in the tolerance arithmetic and feed mixed boxed
  // types to the interpreted ordering — reject at plan time
  require(rightTime.dataType == leftTime.dataType,
    s"as-of join requires matching time types, got ${leftTime.dataType} vs ${rightTime.dataType}")
  if (toleranceUnits.isDefined) {
    require(Seq(TimestampType, DateType, LongType, IntegerType).contains(leftTime.dataType),
      s"as-of tolerance requires an integral-backed time type, got ${leftTime.dataType}")
  }

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftTime).map(SortOrder(_, Ascending)),
    (rightKeys :+ rightTime).map(SortOrder(_, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override protected def doExecute(): RDD[InternalRow] = {
    // capture only serializable expressions/schemas; build codegen'd
    // projections and orderings inside the partition closure
    val lKeyExprs = leftKeys
    val rKeyExprs = rightKeys
    val lOutput = left.output
    val rOutput = right.output
    val keyTypes = leftKeys.map(_.dataType)
    val timeType = leftTime.dataType
    val ltEval = leftTime
    val rtEval = rightTime
    val nRight = right.output.size
    val outAttrs = output // right side already marked nullable
    val isForward = forward
    val tol = toleranceUnits

    left.execute().zipPartitions(right.execute()) { (lIterRaw, rIterRaw) =>
      val lProj = UnsafeProjection.create(lKeyExprs, lOutput)
      val rProj = UnsafeProjection.create(rKeyExprs, rOutput)
      val keyOrdering: Ordering[InternalRow] =
        RowOrdering.createNaturalAscendingOrdering(keyTypes)
      val timeOrdering = TypeUtils.getInterpretedOrdering(timeType)
        .asInstanceOf[Ordering[Any]]
      def units(v: Any): Long = v match {
        case l: java.lang.Long => l
        case i: java.lang.Integer => i.toLong
        case other => sys.error(s"unsupported time value for tolerance: $other")
      }
      val ltBound = org.apache.spark.sql.catalyst.expressions.BindReferences
        .bindReference(ltEval, lOutput)
      val rtBound = org.apache.spark.sql.catalyst.expressions.BindReferences
        .bindReference(rtEval, rOutput)
      val rIter = rIterRaw.buffered
      val nullRight = new GenericInternalRow(nRight)
      val joined = new JoinedRow
      // emit UnsafeRows: consumers (collect, exchanges) require the
      // unsafe format when this operator is the top of a stage
      val outProj = UnsafeProjection.create(outAttrs, outAttrs)

      new Iterator[InternalRow] {
        private var curKey: InternalRow = _
        private var lastRight: InternalRow = _
        override def hasNext: Boolean = lIterRaw.hasNext
        override def next(): InternalRow = {
          val l = lIterRaw.next()
          val lk = lProj(l)
          if (curKey == null || keyOrdering.compare(lk, curKey) != 0) {
            // advance right side to this key group
            while (rIter.hasNext && keyOrdering.compare(rProj(rIter.head), lk) < 0) rIter.next()
            curKey = lk.copy()
            lastRight = null
          }
          val lt = ltBound.eval(l)
          var candidate: InternalRow = null
          if (lt != null) {
            if (!isForward) {
              // consume in-group rows with time <= left time; null times
              // sort first and are skipped without becoming candidates
              var advancing = true
              while (advancing && rIter.hasNext &&
                  keyOrdering.compare(rProj(rIter.head), curKey) == 0) {
                val rt = rtBound.eval(rIter.head)
                if (rt == null) rIter.next()
                else if (timeOrdering.compare(rt, lt) <= 0) lastRight = rIter.next().copy()
                else advancing = false
              }
              candidate = lastRight
            } else {
              // drop in-group rows strictly before left time; the head —
              // if still in-group — is the forward match (peeked, not
              // consumed: later left rows may share it)
              var advancing = true
              while (advancing && rIter.hasNext &&
                  keyOrdering.compare(rProj(rIter.head), curKey) == 0) {
                val rt = rtBound.eval(rIter.head)
                if (rt == null || timeOrdering.compare(rt, lt) < 0) rIter.next()
                else advancing = false
              }
              if (rIter.hasNext && keyOrdering.compare(rProj(rIter.head), curKey) == 0)
                candidate = rIter.head
            }
            if (candidate != null && tol.isDefined) {
              val rt = rtBound.eval(candidate)
              if (math.abs(units(lt) - units(rt)) > tol.get) candidate = null
            }
          }
          outProj(joined(l, if (candidate == null) nullRight else candidate))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(l: SparkPlan, r: SparkPlan): AsOfJoinExec =
    copy(left = l, right = r)
}

object AsOfJoinApi {
  /** as-of join: every left row picks the latest right row with matching
    * keys and rightTime <= leftTime (direction "backward", the default)
    * or the earliest right row with rightTime >= leftTime (direction
    * "forward"); matches farther than `toleranceUnits` (time-column
    * native units: micros for timestamps, days for dates) are rejected.
    * Unmatched left rows get nulls. Key lists must be non-empty and
    * positionally aligned. Output carries left columns then right columns
    * (rename collisions on the right beforehand if you need to select
    * them by name). */
  def asofJoin(leftDf: DataFrame, rightDf: DataFrame,
      leftKeyCols: Seq[String], rightKeyCols: Seq[String],
      leftTimeCol: String, rightTimeCol: String,
      direction: String = "backward",
      toleranceUnits: Option[Long] = None): DataFrame = {
    require(leftKeyCols.nonEmpty && leftKeyCols.size == rightKeyCols.size,
      "as-of join needs aligned non-empty key lists")
    require(Seq("backward", "forward").contains(direction),
      s"direction must be backward|forward, got $direction")
    val spark = leftDf.sparkSession
    // robust in sessions built without GraftExtensions: register the
    // planner strategy on demand (synchronized — see OnDemandStrategy)
    OnDemandStrategy.register(spark, AsOfJoinStrategy)
    val lPlan = leftDf.queryExecution.analyzed
    val rPlan = rightDf.queryExecution.analyzed
    def attr(p: LogicalPlan, n: String) =
      p.output.find(_.name == n).getOrElse(sys.error(s"column $n not found"))
    ColumnBridge.dataFrame(spark, AsOfJoin(
      lPlan, rPlan,
      leftKeyCols.map(attr(lPlan, _)), rightKeyCols.map(attr(rPlan, _)),
      attr(lPlan, leftTimeCol), attr(rPlan, rightTimeCol),
      forward = direction == "forward",
      toleranceUnits = toleranceUnits))
  }
}
