package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.RangeJoin

class RangeJoinSpec extends AnyFunSuite with SharedSpark {

  import spark.implicits._

  private def points = Seq(
    (1L, "a", 5L), (2L, "a", 10L), (3L, "a", 99L), (4L, "b", 10L), (5L, "c", 10L))
    .toDF("event_id", "k", "ts")

  private def intervals = Seq(
    ("a", 0L, 10L),    // catches ts 5 (end exclusive: NOT ts 10)
    ("a", 10L, 20L),   // catches ts 10 (start inclusive)
    ("a", 0L, 100L),   // wide interval spanning many bins: catches 5, 10, 99
    ("b", 50L, 60L),   // right key, wrong time
    ("d", 0L, 100L),   // key matches nothing
    ("a", 30L, 30L),   // empty interval: dropped
    ("a", 40L, 20L))   // inverted interval: dropped
    .toDF("k", "s", "e")

  test("matches the naive inequality join exactly, boundaries included/excluded right") {
    val bucketed = RangeJoin.pointInInterval(points, intervals,
      "ts", "s", "e", binWidth = 7L, keys = Seq("k"))
    val naive = points.join(intervals, Seq("k"))
      .filter(col("s") <= col("ts") && col("ts") < col("e"))
    assert(bucketed.count() === naive.count())
    assert(bucketed.exceptAll(naive.select(bucketed.columns.map(col): _*)).count() === 0)
    // spot-pin the boundary semantics
    val byEvent = bucketed.groupBy("event_id").count().as[(Long, Long)].collect().toMap
    assert(byEvent(1L) === 2)        // [0,10) and [0,100)
    assert(byEvent(2L) === 2)        // [10,20) and [0,100) — NOT [0,10)
    assert(byEvent(3L) === 1)        // only the wide interval
    assert(!byEvent.contains(4L))    // b's interval misses its point
    assert(!byEvent.contains(5L))    // no interval for key c
  }

  test("plans as an equality join — no nested-loop, no cartesian product") {
    // collect() first: under AQE the join strategy is only final after execution
    def finalPlan(df: org.apache.spark.sql.DataFrame): String = {
      df.collect()
      df.queryExecution.executedPlan.toString
    }
    val bucketed = finalPlan(RangeJoin.pointInInterval(points, intervals,
      "ts", "s", "e", binWidth = 7L, keys = Seq("k")))
    assert(!bucketed.contains("NestedLoop") && !bucketed.contains("Cartesian"),
      s"range join fell back to a non-equality join:\n$bucketed")
    // a keyed naive range join hash-joins on the key but re-scans every interval of
    // a hot key per point; a PURE range predicate nested-loops outright — that is
    // the plan the bin bucket avoids even with no key at all
    val naiveKeyless = finalPlan(points.as("p").join(intervals.as("iv"),
      col("iv.s") <= col("p.ts") && col("p.ts") < col("iv.e")))
    assert(naiveKeyless.contains("NestedLoop"))
    val bucketedKeyless = finalPlan(RangeJoin.pointInInterval(points, intervals,
      "ts", "s", "e", binWidth = 7L))
    assert(!bucketedKeyless.contains("NestedLoop") &&
      !bucketedKeyless.contains("Cartesian"))
  }

  test("keyless variant joins on the bin alone") {
    val p = Seq((1L, 5L), (2L, 25L)).toDF("id", "ts")
    val iv = Seq((0L, 10L), (20L, 30L), (100L, 110L)).toDF("s", "e")
    val r = RangeJoin.pointInInterval(p, iv, "ts", "s", "e", binWidth = 10L)
      .select("id", "s").as[(Long, Long)].collect().toSet
    assert(r === Set((1L, 0L), (2L, 20L)))
  }

  test("intervalOverlap: matches the naive join exactly-once across bin widths") {
    val a = Seq((1L, "a", 0L, 50L), (2L, "a", 40L, 60L), (3L, "a", 60L, 70L),
      (4L, "b", 0L, 100L), (5L, "a", 200L, 300L))
      .toDF("a_id", "k", "a_s", "a_e")
    val b = Seq((10L, "a", 45L, 55L),  // overlaps 1 (tail) and 2
      (11L, "a", 50L, 60L),            // overlaps 2 only (1 is half-open at 50)
      (12L, "b", 99L, 150L),           // overlaps 4 by one unit
      (13L, "b", 100L, 150L),          // touches 4 exactly: NOT an overlap
      (14L, "a", 0L, 400L))            // spans many bins; overlaps 1, 2, 3, 5
      .toDF("b_id", "k", "b_s", "b_e")
    val naive = a.join(b, Seq("k"))
      .filter(col("a_s") < col("b_e") && col("b_s") < col("a_e"))
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(naive === Set((1L, 10L), (2L, 10L), (2L, 11L), (4L, 12L),
      (1L, 14L), (2L, 14L), (3L, 14L), (5L, 14L)))
    // wide-bin, narrow-bin, and pathological width: identical MULTISET each time
    // (a pair sharing many bins must still be emitted exactly once)
    Seq(1L, 7L, 64L, 1000L).foreach { w =>
      val got = RangeJoin.intervalOverlap(a, b, "a_s", "a_e", "b_s", "b_e",
        binWidth = w, keys = Seq("k")).select("a_id", "b_id")
      assert(got.count() === naive.size, s"binWidth=$w emitted duplicates or dropped")
      assert(got.as[(Long, Long)].collect().toSet === naive, s"binWidth=$w")
    }
    intercept[IllegalArgumentException] {
      RangeJoin.intervalOverlap(a, b, "s", "e", "s", "e", 10L)
    }
    // the rewrite's point: an equality join, never a nested loop
    val df = RangeJoin.intervalOverlap(a, b, "a_s", "a_e", "b_s", "b_e",
      binWidth = 7L, keys = Seq("k"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop") && !plan.contains("Cartesian"),
      s"interval overlap fell back to a non-equality join:\n$plan")
  }
}
