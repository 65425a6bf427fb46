package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.TimeSeries

class TimeSeriesSpec extends AnyFunSuite with SharedSpark {

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("resample: fills interior gaps, forward-fills values, flags gap rows") {
    import spark.implicits._
    val df = Seq(
      (1L, ts("2024-01-01 00:10:00"), 10.0),
      (1L, ts("2024-01-01 00:50:00"), 20.0),
      // hours 01 and 02 are silent for user 1
      (1L, ts("2024-01-01 03:05:00"), 5.0),
      (2L, ts("2024-01-01 02:00:00"), 7.0)
    ).toDF("user_id", "ts", "value")
    val got = TimeSeries.resample(df, "user_id", "ts", "value", unit = "hour")
      .orderBy("user_id", "bucket").collect()

    val u1 = got.filter(_.getLong(0) == 1L)
    assert(u1.map(_.getAs[Timestamp]("bucket").toString.substring(11, 13)).toSeq ===
      Seq("00", "01", "02", "03"))
    assert(u1.map(_.getAs[Long]("n_events")).toSeq === Seq(2L, 0L, 0L, 1L))
    // hour 00 aggregates both events; the silent hours carry it forward
    assert(u1.map(_.getAs[Double]("filled_value")).toSeq === Seq(30.0, 30.0, 30.0, 5.0))
    assert(u1.map(_.getAs[Boolean]("gap")).toSeq === Seq(false, true, true, false))
    // gap rows have no observed value of their own
    assert(u1(1).isNullAt(u1(1).fieldIndex("bucket_value")))
    // a single-bucket key produces exactly one, non-gap row
    val u2 = got.filter(_.getLong(0) == 2L)
    assert(u2.length === 1 && !u2(0).getAs[Boolean]("gap"))
  }

  test("resample: leading value is never back-filled (gap before first event impossible)") {
    import spark.implicits._
    val df = Seq((1L, ts("2024-01-01 05:30:00"), 1.0)).toDF("user_id", "ts", "value")
    val got = TimeSeries.resample(df, "user_id", "ts", "value").collect()
    assert(got.length === 1)
    assert(got(0).getAs[Double]("filled_value") === 1.0)
  }

  test("trailingAgg: hand-checked 30-day window, peers at the same instant included") {
    import spark.implicits._
    val df = Seq(
      (1L, 10L, ts("2024-01-01 00:00:00"), 100.0),
      (2L, 10L, ts("2024-01-20 00:00:00"), 50.0),  // within 30d of row 1
      (3L, 10L, ts("2024-03-01 00:00:00"), 10.0),  // row 1 and 2 aged out
      (4L, 10L, ts("2024-03-01 00:00:00"), 30.0),  // peer of row 3: same instant
      (5L, 99L, ts("2024-01-05 00:00:00"), 7.0)
    ).toDF("id", "k", "t", "v")
    val got = TimeSeries.trailingAgg(df, "k", "t", "v", windowSeconds = 30L * 86400)
      .orderBy("id").collect()
    assert(got.map(_.getAs[Long]("trailing_n")).toSeq === Seq(1L, 2L, 2L, 2L, 1L))
    assert(got.map(_.getAs[Double]("trailing_sum")).toSeq ===
      Seq(100.0, 150.0, 40.0, 40.0, 7.0))
    assert(got(1).getAs[Double]("trailing_avg") === 75.0)
  }

  test("resample plan: one shuffle feeds the grouped aggregate; spine joins on (key, bucket)") {
    val out = TimeSeries.resample(
      Tables.eventsMicros(spark, sf).select("user_id", "ts", "value"),
      "user_id", "ts", "value", unit = "day")
    val plan = out.queryExecution.executedPlan.toString
    // partial aggregation must run map-side before the exchange
    assert(plan.contains("HashAggregate"))
    assert(!plan.toLowerCase.contains("cartesian"))
    // conservation: sum of bucket_value over non-gap rows equals the raw decimal sum
    val filled = out.agg(sum(col("bucket_value").cast("decimal(18,2)"))).first().getDecimal(0)
    val raw = Tables.eventsMicros(spark, sf)
      .agg(sum(col("value").cast("decimal(18,2)"))).first().getDecimal(0)
    assert(filled.compareTo(raw) === 0)
  }
}
