package org.apache.spark.sql.hive

import org.apache.spark.sql.Column
import org.apache.spark.sql.graft.ColumnBridge

/** Hive UDF execution without a Hive-enabled catalog (SURVEY §2.11: the
  * reference routes these through HiveUDFTransformer; Spark's wrapper
  * expressions run them natively). `HiveGenericUDF`/`HiveSimpleUDF` are
  * private[hive], so this bridge lives in the hive package — same
  * pattern as ColumnBridge for Column↔Expression.
  */
object GraftHiveUdfBridge {

  /** wrap a GenericUDF class as a Column expression */
  def genericUdf(className: String, cols: Column*): Column =
    ColumnBridge.column(HiveGenericUDF(
      className.split('.').last,
      HiveShim.HiveFunctionWrapper(className),
      cols.map(ColumnBridge.expression)))

  /** wrap a legacy (simple) UDF class as a Column expression */
  def simpleUdf(className: String, cols: Column*): Column =
    ColumnBridge.column(HiveSimpleUDF(
      className.split('.').last,
      HiveShim.HiveFunctionWrapper(className),
      cols.map(ColumnBridge.expression)))
}
