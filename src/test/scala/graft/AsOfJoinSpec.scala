package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.AsOfJoin

class AsOfJoinSpec extends AnyFunSuite with SharedSpark {

  test("as-of: picks the latest right row at or before each left timestamp") {
    import spark.implicits._
    val quotes = Seq(
      (1L, Timestamp.valueOf("2024-01-01 00:00:00"), 100.0),
      (1L, Timestamp.valueOf("2024-01-03 00:00:00"), 110.0),
      (1L, Timestamp.valueOf("2024-01-05 00:00:00"), 120.0),
      (2L, Timestamp.valueOf("2024-01-02 00:00:00"), 50.0)
    ).toDF("key", "qts", "price")
    val trades = Seq(
      (10L, 1L, Timestamp.valueOf("2024-01-04 00:00:00")), // → 110.0 (Jan 3)
      (11L, 1L, Timestamp.valueOf("2024-01-05 00:00:00")), // → 120.0 (same instant)
      (12L, 1L, Timestamp.valueOf("2023-12-31 00:00:00")), // → null (before all)
      (13L, 2L, Timestamp.valueOf("2024-06-01 00:00:00")), // → 50.0
      (14L, 3L, Timestamp.valueOf("2024-06-01 00:00:00"))  // → null (no key)
    ).toDF("trade_id", "key", "tts")
    val got = AsOfJoin.asOf(trades, quotes, "key", "key", "tts", "qts", Seq("price"))
      .orderBy("trade_id").collect()
    assert(got.map(r => Option(r.getAs[java.lang.Double]("price"))).toSeq ===
      Seq(Some(110.0), Some(120.0), None, Some(50.0), None))
    // every left row survives exactly once (left-join cardinality)
    assert(got.length === 5)
  }

  test("as-of: NULL payload fields come from the matched row, never a stale earlier row") {
    import spark.implicits._
    val quotes = Seq(
      (1L, Timestamp.valueOf("2024-01-01 00:00:00"), Option(1.0), Option(2.0)),
      (1L, Timestamp.valueOf("2024-01-02 00:00:00"), Option.empty[Double], Option(3.0))
    ).toDF("key", "qts", "a", "b")
    val trades = Seq((10L, 1L, Timestamp.valueOf("2024-01-03 00:00:00")))
      .toDF("trade_id", "key", "tts")
    val got = AsOfJoin.asOf(trades, quotes, "key", "key", "tts", "qts", Seq("a", "b"))
      .first()
    // the matched row is (ts=Jan2, a=NULL, b=3.0): a must be NULL, not Jan1's 1.0
    assert(got.isNullAt(got.fieldIndex("a")))
    assert(got.getAs[Double]("b") === 3.0)
  }

  test("as-of on harness data: match is that customer's max order date <= event time") {
    val result = SparkEntry.queries("q_asof_join")(spark, sf).cache()
    val ev = Tables.eventsMicros(spark, sf)
    assert(result.count() === ev.count())
    // all events are in 2024, all orders in 1992-1998 → matched order date must be the
    // customer's overall max order date
    val expected = graft.model.RefAdapter.orders(Tables.orders(spark, sf))
      .groupBy(col("customer_id").as("user_id"))
      .agg(to_date(max(col("order_date"))).as("expect_date"))
    val joined = result.join(expected, Seq("user_id"), "left")
    assert(joined.filter(col("last_order_date").isNotNull &&
      col("last_order_date") =!= col("expect_date")).count() === 0)
    // users with no matching customer id get nulls, and only those
    val noMatch = result.filter(col("last_order_id").isNull)
      .select("user_id").distinct()
    val orderUsers = expected.select("user_id")
    assert(noMatch.join(orderUsers, Seq("user_id"), "left_semi").count() === 0)
  }
}
