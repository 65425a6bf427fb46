package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Drift

class DriftSpec extends AnyFunSuite with SharedSpark {

  import spark.implicits._

  test("psi: identical distributions score ~0, a shifted one scores high") {
    val base = (1 to 1000).map(i => i % 100).toDF("v")
    val same = (1 to 1000).map(i => (i * 7) % 100).toDF("v") // same uniform support
    val edges = Seq(25.0, 50.0, 75.0)
    assert(Drift.psiTotal(base, same, "v", edges) < 0.01)

    val shifted = (1 to 1000).map(i => 50 + i % 50).toDF("v") // mass leaves bins 0-1
    assert(Drift.psiTotal(base, shifted, "v", edges) > 0.25)
  }

  test("psi: per-bin frame covers empty bins via the epsilon floor") {
    val base = Seq(10.0, 20.0, 30.0, 90.0).toDF("v")
    val cur = Seq(90.0, 91.0, 92.0, 93.0).toDF("v")
    val rows = Drift.psi(base, cur, "v", edges = Seq(50.0))
      .orderBy("bin").collect()
    assert(rows.map(_.getInt(0)).toSeq === Seq(0, 1))
    assert(rows(0).getLong(1) === 3L && rows(0).getLong(2) === 0L)
    // bin 0 lost all its mass: contribution ≈ (eps - 0.75)·ln(eps/0.75) — large
    assert(rows(0).getDouble(3) > 5.0)

    // binning is the count-of-edges-≤-value contract
    val binned = base.select(Drift.binOf(col("v"), Seq(15.0, 25.0)).as("b"))
      .as[Int].collect().toSeq
    assert(binned === Seq(0, 1, 2, 2))

    intercept[IllegalArgumentException] {
      Drift.psi(base, cur, "v", edges = Seq(50.0, 10.0))
    }
  }

  test("psiCategorical: one-sided categories contribute via the epsilon floor") {
    val base = Seq("en", "en", "en", "de").toDF("lang")
    val cur = Seq("en", "en", "fr", "fr").toDF("lang")
    val rows = Drift.psiCategorical(base, cur, "lang").orderBy("category").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(rows.map(_._1) === Seq("de", "en", "fr"))
    assert(rows.map(r => (r._2, r._3)) === Seq((1L, 0L), (3L, 2L), (0L, 2L)))
    // de vanished and fr appeared: both one-sided terms are large and positive
    assert(rows.head._4 > 1.0 && rows.last._4 > 1.0)
    // the en term is modest (0.75 → 0.5)
    assert(math.abs(rows(1)._4 - (0.5 - 0.75) * math.log(0.5 / 0.75)) < 1e-6)
  }

  test("psi: each snapshot is scanned exactly once") {
    val o = Tables.orders(spark, sf)
    val cut = lit("1998-01-01").cast("timestamp")
    val plan = Drift.psi(
        o.filter(col("o_orderdate") < cut), o.filter(col("o_orderdate") >= cut),
        "o_totalprice", edges = Seq(100000.0, 200000.0))
      .queryExecution.executedPlan.toString
    val scans = "Scan parquet".r.findAllIn(plan).size
    assert(scans === 2, s"totals must not re-execute the histogram lineage:\n$plan")
  }

  test("streaming drift monitor: per-batch reports, alert fires on a shifted mix") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val baseline = Seq.fill(50)("en") ++ Seq.fill(30)("de") ++ Seq.fill(20)("fr")
    val reportDir = java.nio.file.Files.createTempDirectory("drift_rep").toString
    val ckpt = java.nio.file.Files.createTempDirectory("drift_ck").toString
    val mem = MemoryStream[String]
    val q = graft.streaming.DriftMonitor.start(
      mem.toDF().toDF("lang"), baseline.toDF("lang"), "lang",
      reportDir, ckpt, alertThreshold = 0.25,
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime("1 second"))
    try {
      // batch 0: same mix → no alert
      mem.addData(Seq.fill(25)("en") ++ Seq.fill(15)("de") ++ Seq.fill(10)("fr"): _*)
      q.processAllAvailable()
      // batch 1: the mix collapses to one language → alert
      mem.addData(Seq.fill(60)("zh"): _*)
      q.processAllAvailable()
      val rep = spark.read.parquet(reportDir)
      val byBatch = rep.groupBy("batch_id").agg(
          org.apache.spark.sql.functions.first("alert").as("alert"),
          org.apache.spark.sql.functions.first("psi_total").as("psi"))
        .collect().map(r => r.getLong(0) -> (r.getBoolean(1), r.getDouble(2))).toMap
      assert(!byBatch(0L)._1, s"stable mix must not alert: ${byBatch(0L)}")
      assert(byBatch(1L)._1, s"collapsed mix must alert: ${byBatch(1L)}")
      assert(byBatch(1L)._2 > byBatch(0L)._2)
      // per-category terms present for the union of categories
      assert(rep.filter(col("batch_id") === 1L).select("category")
        .collect().map(_.getString(0)).toSet === Set("en", "de", "fr", "zh"))
    } finally q.stop()
  }

  test("psi: NULLs are excluded, not binned") {
    val base = Seq(Some(10.0), Some(90.0), None).toDF("v")
    val cur = Seq(Some(10.0), Some(90.0)).toDF("v")
    val total = Drift.psiTotal(base, cur, "v", Seq(50.0))
    assert(math.abs(total) < 1e-9, s"null row must not shift fractions: $total")
  }
}
