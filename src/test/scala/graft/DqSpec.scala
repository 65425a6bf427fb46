package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.dq.DqValidator
import graft.model.RefAdapter

class DqSpec extends AnyFunSuite with SharedSpark {

  private def o = RefAdapter.orders(Tables.orders(spark, sf))
  private def c = RefAdapter.customers(Tables.customer(spark, sf))

  test("completeness: clean data passes, injected nulls above threshold fail") {
    import spark.implicits._
    val v = new DqValidator().checkCompleteness(o, "orders", Seq("order_id", "order_amount"))
    assert(v.results.forall(_.status == "PASS"))
    assert(v.results.forall(_.metric_value == 0.0))

    // 10% nulls > 5% threshold → FAIL
    val dirty = Seq(Some(1), Some(2), Some(3), Some(4), Some(5),
      Some(6), Some(7), Some(8), Some(9), None).toDF("x")
    val v2 = new DqValidator().checkCompleteness(dirty, "t", Seq("x"))
    assert(v2.results.head.status == "FAIL")
    assert(math.abs(v2.results.head.metric_value - 10.0) < 1e-12)

    // exactly at threshold: 5% is NOT < 5% → FAIL (reference boundary semantics)
    val boundary = (1 to 19).map(Some(_)).toList :+ Option.empty[Int]
    val v3 = new DqValidator().checkCompleteness(boundary.toDF("x"), "t", Seq("x"))
    assert(v3.results.head.metric_value == 5.0 && v3.results.head.status == "FAIL")
  }

  test("accuracy: rule violations counted, null predicate rows are not violations") {
    import spark.implicits._
    val df = Seq[java.lang.Double](1.0, -1.0, null, 2.0).toDF("amt")
    val v = new DqValidator().checkAccuracy(df, "t", Seq("positive" -> (col("amt") > 0)))
    // one violation (-1.0) of 4 rows = 25% ≥ 1% → FAIL; null row not a violation
    assert(math.abs(v.results.head.metric_value - 25.0) < 1e-12)
    assert(v.results.head.status == "FAIL")
  }

  test("consistency + volume on harness data") {
    val v = new DqValidator()
      .checkConsistency(o, "orders", c, "customers", Seq("customer_id"))
      .checkVolume(o, "orders", 1, 1000000000L)
    assert(v.passed)
    val orphan = v.results.find(_.check_type == "consistency").get
    assert(orphan.metric_value == 0.0)
  }

  test("empty input: guarded division, 0% violations (reference would crash)") {
    val empty = o.filter(lit(false))
    val v = new DqValidator()
      .checkCompleteness(empty, "t", Seq("order_id"))
      .checkAccuracy(empty, "t", Seq("pos" -> (col("order_amount") > 0)))
      .checkVolume(empty, "t", 1, 10)
    assert(v.results.take(2).forall(r => r.metric_value == 0.0 && r.status == "PASS"))
    assert(v.results.last.status == "FAIL") // 0 rows below min volume
  }

  test("checkAll: one fused job for completeness + accuracy + volume; same results as the chain") {
    import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
    def countJobs(body: => Unit): Int = {
      val counter = new java.util.concurrent.atomic.AtomicInteger(0)
      val l = new SparkListener {
        override def onJobStart(j: SparkListenerJobStart): Unit =
          counter.incrementAndGet()
      }
      spark.sparkContext.addSparkListener(l)
      try {
        body
        // the listener bus is async: poll until the count stabilizes
        var last = -1; var spins = 0
        while (counter.get != last && spins < 40) {
          last = counter.get; Thread.sleep(50); spins += 1
        }
        counter.get
      } finally spark.sparkContext.removeSparkListener(l)
    }

    val cols = Seq("order_id", "order_amount")
    val rules = Seq("positive" -> (col("order_amount") > 0))
    val fused = new DqValidator()
    val chained = new DqValidator()
    val jobsFused = countJobs {
      fused.checkAll(o, "orders", cols, rules, Some((1L, 1000000000L)))
    }
    val jobsOneCheck = countJobs {
      new DqValidator().checkCompleteness(o, "orders", cols)
    }
    val jobsChained = countJobs {
      chained.checkCompleteness(o, "orders", cols)
        .checkAccuracy(o, "orders", rules)
        .checkVolume(o, "orders", 1L, 1000000000L)
    }
    // 3 check types cost exactly what ONE fused aggregate costs, and strictly less
    // than the 3-call chain
    assert(jobsFused === jobsOneCheck,
      s"checkAll must be one aggregate job (fused=$jobsFused, single=$jobsOneCheck)")
    assert(jobsFused < jobsChained,
      s"checkAll must beat the chain (fused=$jobsFused, chained=$jobsChained)")
    // drop-in replacement: identical rows in identical order
    assert(fused.results === chained.results)
  }

  test("gate: all-PASS curates parquet; FAIL quarantines JSON") {
    val tmp = Files.createTempDirectory("dq_gate").toString
    val pass = new DqValidator().checkCompleteness(o, "orders", Seq("order_id"))
    assert(DqValidator.gate(o, pass, s"$tmp/curated", s"$tmp/quarantine"))
    assert(spark.read.parquet(s"$tmp/curated").count() === o.count())

    val fail = new DqValidator().checkVolume(o, "orders", 0, 1) // too many rows
    assert(!DqValidator.gate(o, fail, s"$tmp/curated2", s"$tmp/quarantine2"))
    assert(spark.read.json(s"$tmp/quarantine2").count() === o.count())
  }

  test("report: summary counts match details") {
    val v = new DqValidator()
      .checkCompleteness(o, "orders", Seq("order_id", "order_amount"))
      .checkVolume(o, "orders", 0, 1)
    val r = v.report("2026-01-01T00:00:00Z")
    assert(r.summary.total_checks === 3)
    assert(r.summary.passed === 2 && r.summary.failed === 1)
    assert(r.details.size === 3)
  }
}
