package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Funnel

class FunnelSpec extends AnyFunSuite with SharedSpark {

  import spark.implicits._

  private val steps = Seq("view", "click", "purchase")
  private val Second = 1000000L // micros

  // semantics fixture — every edge the min-recursion definition pins
  private def events = Seq(
    // u1: clean 3-step completion
    (1L, 10L, "view"), (1L, 20L, "click"), (1L, 30L, "purchase"),
    // u2: purchase BEFORE the click chain point — only 2 steps count
    (2L, 5L, "click"), (2L, 10L, "view"), (2L, 12L, "purchase"), (2L, 15L, "click"),
    // u3: skips the middle step — stuck at 1
    (3L, 10L, "view"), (3L, 20L, "purchase"),
    // u4: click lands outside the window (window = 100 s)
    (4L, 10L, "view"), (4L, 200L, "click"),
    // u5: enters mid-funnel — step 1 never happens
    (5L, 10L, "purchase"),
    // u7: same-timestamp events do NOT chain (strict t > t_prev)
    (7L, 10L, "view"), (7L, 10L, "click"), (7L, 40L, "click"),
    // u8: no step-typed events at all — not in the population
    (8L, 10L, "signup"))
    .toDF("user_id", "sec", "event_type")
    .withColumn("ts", timestamp_seconds(col("sec")))

  test("userFunnel: chain order, window bound, strictness, population") {
    val out = Funnel.userFunnel(events, steps, windowMicros = 100L * Second)
      .orderBy("user_id")
      .select("user_id", "steps_completed", "t1_us", "t2_us", "t3_us")
      .collect()
      .map(r => (r.getLong(0), r.getInt(1),
        Option(r.get(2)), Option(r.get(3)), Option(r.get(4))))

    def us(sec: Long): Option[Any] = Some(sec * Second)
    assert(out.toSeq === Seq(
      (1L, 3, us(10), us(20), us(30)),
      (2L, 2, us(10), us(15), None),
      (3L, 1, us(10), None, None),
      (4L, 1, us(10), None, None),
      (5L, 0, None, None, None),
      (7L, 2, us(10), us(40), None))) // u8 absent: no step-typed events
  }

  test("userFunnel: window bounds later steps against t1, not the previous step") {
    // t1=0s, click at 90s (inside), purchase at 150s: within 100s of the CLICK but
    // not of t1 — must not count
    val e = Seq((1L, 0L, "view"), (1L, 90L, "click"), (1L, 150L, "purchase"))
      .toDF("user_id", "sec", "event_type")
      .withColumn("ts", timestamp_seconds(col("sec")))
    val r = Funnel.userFunnel(e, steps, windowMicros = 100L * Second).first()
    assert(r.getAs[Int]("steps_completed") === 2)
  }

  test("summary: per-step reach and conversion vs step 1") {
    val s = Funnel.summary(events, steps, windowMicros = 100L * Second)
      .orderBy("step_index")
      .collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    // reached ≥1: u1,u2,u3,u4,u7 = 5; ≥2: u1,u2,u7 = 3; ≥3: u1 = 1
    assert(s.toSeq === Seq(
      (1, "view", 5L, 1.0), (2, "click", 3L, 0.6), (3, "purchase", 1L, 0.2)))
  }

  test("userFunnel: single shuffle, pushed type filter") {
    val ev = Tables.eventsMicros(spark, sf)
    val plan = Funnel.userFunnel(ev, steps, windowMicros = 86400L * Second)
      .queryExecution.executedPlan.toString
    assert(plan.split("Exchange").length - 1 === 1, s"expected 1 shuffle:\n$plan")
    assert(plan.contains("PushedFilters: [In(event_type"), s"filter not pushed:\n$plan")
  }

  test("streaming funnel advances the same walk across micro-batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.ops.Funnel.{FunnelEvent, FunnelProgress}
    implicit val s: org.apache.spark.sql.SparkSession = spark
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val Second = 1000000L
    val mem = MemoryStream[FunnelEvent]
    val q = Funnel.streaming(mem.toDS(), steps, windowMicros = 100L * Second)
      .writeStream.format("memory").queryName("sfunnel_out")
      .outputMode("update").start()
    def latest: Map[Long, (Int, Seq[Long])] = spark.table("sfunnel_out")
      .orderBy(col("steps_completed")) // latest update has the most progress
      .as[FunnelProgress].collect()
      .map(p => p.user_id -> (p.steps_completed, p.step_ts)).toMap
    try {
      // batch 1: u1 views (out-of-order within the batch: click before view by ts
      // works because the walk sorts the batch)
      mem.addData(FunnelEvent(1L, 20L * Second, "click"),
        FunnelEvent(1L, 10L * Second, "view"))
      q.processAllAvailable()
      assert(latest(1L) === ((2, Seq(10L * Second, 20L * Second))))
      // batch 2: the purchase arrives later, chains from state
      mem.addData(FunnelEvent(1L, 30L * Second, "purchase"),
        FunnelEvent(2L, 10L * Second, "view"))
      q.processAllAvailable()
      assert(latest(1L) === ((3, Seq(10L, 20L, 30L).map(_ * Second))))
      assert(latest(2L)._1 === 1)
      // batch 3: u2's click lands OUTSIDE the window → no advance; a cross-batch
      // straggler for u1 cannot regress completed state
      mem.addData(FunnelEvent(2L, 200L * Second, "click"),
        FunnelEvent(1L, 5L * Second, "view"))
      q.processAllAvailable()
      assert(latest(1L)._1 === 3)
      assert(latest(2L)._1 === 1)
    } finally q.stop()
  }

  test("streaming funnel over one batch equals the batch walk on real events") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.ops.Funnel.{FunnelEvent, FunnelProgress}
    implicit val s: org.apache.spark.sql.SparkSession = spark
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val win = 24L * 3600 * 1000000
    val ev = Tables.eventsMicros(spark, sf)
    val batchResult = Funnel.userFunnel(ev, steps, win)
      .select("user_id", "steps_completed").as[(Long, Int)].collect().toMap

    val feed = ev.filter(col("event_type").isInCollection(steps))
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"), col("event_type"))
      .as[FunnelEvent].collect()
    val mem = MemoryStream[FunnelEvent]
    val q = Funnel.streaming(mem.toDS(), steps, win)
      .writeStream.format("memory").queryName("sfunnel_eq")
      .outputMode("update").start()
    try {
      mem.addData(feed.toIndexedSeq)
      q.processAllAvailable()
      val streamed = spark.table("sfunnel_eq").as[FunnelProgress].collect()
        .map(p => p.user_id -> p.steps_completed).toMap
      assert(streamed === batchResult)
    } finally q.stop()
  }

  test("userFunnel rejects repeated steps and non-positive windows") {
    intercept[IllegalArgumentException] {
      Funnel.userFunnel(events, Seq("view", "view"), 100L)
    }
    intercept[IllegalArgumentException] {
      Funnel.userFunnel(events, steps, 0L)
    }
  }
}
