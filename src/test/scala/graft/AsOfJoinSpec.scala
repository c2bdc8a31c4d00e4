package graft

import graft.plans.AsOfJoinApi.asofJoin
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.scalatest.funsuite.AnyFunSuite

class AsOfJoinSpec extends AnyFunSuite {
  private lazy val spark = GraftSparkSession.spark
  private val dir = GraftSparkSession.sfDir

  test("backward as-of join: latest right at-or-before left time, nulls on no match") {
    import spark.implicits._
    val trades = Seq((1L, 10L, "a"), (1L, 20L, "b"), (2L, 5L, "c"), (3L, 7L, "d"))
      .toDF("key", "t", "trade")
    val quotes = Seq((1L, 8L, 1.0), (1L, 15L, 2.0), (1L, 20L, 3.0), (2L, 9L, 9.0))
      .toDF("qkey", "qt", "px")
    val out = asofJoin(trades, quotes, Seq("key"), Seq("qkey"), "t", "qt")
      .select($"trade", $"px")
      .collect().map(r => (r.getString(0), if (r.isNullAt(1)) None else Some(r.getDouble(1))))
      .toSet
    assert(out == Set(
      ("a", Some(1.0)), // quote@8 <= 10
      ("b", Some(3.0)), // equal timestamp is inclusive
      ("c", None),      // only a later quote exists for key 2
      ("d", None)))     // key 3 has no quotes
  }

  test("mixed time types are rejected at planning") {
    import spark.implicits._
    val l = Seq((1L, java.sql.Date.valueOf("2024-01-02"))).toDF("k", "t")
    val r = Seq((1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"))).toDF("rk", "rt")
    val e = intercept[Exception] {
      asofJoin(l, r, Seq("k"), Seq("rk"), "t", "rt").collect()
    }
    // DateType days vs TimestampType micros must never be merged silently
    assert(e.getMessage != null && e.toString.contains("matching time types")
      || Option(e.getCause).exists(_.getMessage.contains("matching time types")),
      s"unexpected error: $e")
  }

  test("forward as-of join: earliest right at-or-after left time") {
    import spark.implicits._
    val trades = Seq((1L, 10L, "a"), (1L, 20L, "b"), (2L, 5L, "c"), (3L, 7L, "d"))
      .toDF("key", "t", "trade")
    val quotes = Seq((1L, 8L, 1.0), (1L, 15L, 2.0), (1L, 20L, 3.0), (2L, 9L, 9.0))
      .toDF("qkey", "qt", "px")
    val out = asofJoin(trades, quotes, Seq("key"), Seq("qkey"), "t", "qt",
        direction = "forward")
      .select($"trade", $"px")
      .collect().map(r => (r.getString(0), if (r.isNullAt(1)) None else Some(r.getDouble(1))))
      .toSet
    assert(out == Set(
      ("a", Some(2.0)), // next quote at 15
      ("b", Some(3.0)), // equal timestamp is inclusive
      ("c", Some(9.0)), // quote@9 >= 5
      ("d", None)))     // key 3 has no quotes
  }

  test("tolerance rejects matches beyond the gap in native units") {
    import spark.implicits._
    val trades = Seq((1L, 10L, "a"), (1L, 100L, "b")).toDF("key", "t", "trade")
    val quotes = Seq((1L, 8L, 1.0), (1L, 50L, 2.0)).toDF("qkey", "qt", "px")
    val out = asofJoin(trades, quotes, Seq("key"), Seq("qkey"), "t", "qt",
        toleranceUnits = Some(5L))
      .select($"trade", $"px")
      .collect().map(r => (r.getString(0), if (r.isNullAt(1)) None else Some(r.getDouble(1))))
      .toSet
    // a: latest quote@8, gap 2 <= 5 -> match; b: latest quote@50, gap 50 -> null
    assert(out == Set(("a", Some(1.0)), ("b", None)))
  }

  test("as-of plan shape: custom exec with co-partitioning exchanges and sorts") {
    import spark.implicits._
    val l = (1 to 1000).map(i => (i % 7L, i.toLong)).toDF("k", "t")
    val r = (1 to 500).map(i => (i % 7L, i.toLong * 2, i * 1.0)).toDF("rk", "rt", "v")
    val joined = asofJoin(l, r, Seq("k"), Seq("rk"), "t", "rt")
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin ["), plan.take(2000)) // nodeName strips the Exec suffix
    assert(plan.contains("Exchange hashpartitioning(k"), "left must co-partition\n" + plan.take(2000))
    assert(plan.contains("Exchange hashpartitioning(rk"), "right must co-partition\n" + plan.take(2000))
    assert(plan.contains("Sort [k"), "left must sort by (key, time)\n" + plan.take(2000))
    assert(joined.count() == 1000)
  }

  test("custom AsOfJoinExec agrees with the window-composition oracle on real events") {
    val events = Tables.load(spark, dir, "events")
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"))
    val custom = asofJoin(purchases, clicks, Seq("user_id"), Seq("c_user"), "ts", "c_ts")
      .select(col("event_id"), unix_micros(col("c_ts")).as("prev_click_us"))
      .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap

    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val composed = events
      .withColumn("prev_click_us",
        last(when(col("event_type") === "click", unix_micros(col("ts"))), ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), col("prev_click_us"))
      .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap

    assert(custom.size == composed.size && custom.nonEmpty)
    assert(custom == composed)
  }
}
