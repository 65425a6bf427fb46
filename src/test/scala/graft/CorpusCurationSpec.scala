package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.CorpusCuration

class CorpusCurationSpec extends AnyFunSuite with SharedSpark {

  private val goodA = "the quick brown fox jumps over the lazy dog in a sunny field today"
  private val goodB = goodA.split(" ").toVector.updated(6, "my").mkString(" ")

  private def corpus = {
    import spark.implicits._
    Seq(
      (1L, "the cat and the hat went to the park for a day"),
      (2L, "the cat and the hat went to the park for a day"), // exact dup of 1
      (3L, goodA),
      (4L, goodB),                                            // near-dup of 3
      (5L, "!!! ??? ***** &&& %%%"),                          // junk: punct, no stopwords
      (6L, "der hund ist nicht mit der katze und dem vogel"), // German
      (7L, "please email me at bob@example.com for the details of it all")
    ).toDF("doc_id", "text")
  }

  test("curate: dedups, filters quality and language, scrubs PII, keeps canonicals") {
    val cfg = CorpusCuration.Config(langs = Some(Set("en")))
    val out = CorpusCuration.curate(corpus, cfg).collect()
    val ids = out.map(_.getAs[Long]("doc_id")).toSet
    assert(ids === Set(1L, 3L, 7L),
      "exact dup 2, near-dup 4, junk 5, and German 6 must all be dropped")
    val doc7 = out.find(_.getAs[Long]("doc_id") == 7L).get
    assert(!doc7.getAs[String]("text").contains("bob@example.com"))
    assert(doc7.getAs[Int]("n_redactions") === 1)
    assert(out.forall(_.getAs[Double]("quality_score") >= 0.5))
    assert(out.forall(_.getAs[String]("predicted_lang") == "en"))
  }

  test("report: attrition counts are monotone and consistent with curate") {
    val cfg = CorpusCuration.Config(langs = Some(Set("en")))
    val r = CorpusCuration.report(corpus, cfg)
    assert(r.input === 7L)
    assert(r.afterExactDedup === 6L)
    assert(r.afterNearDedup === 5L)
    assert(r.afterQuality <= r.afterNearDedup)
    assert(r.curated === 3L)
  }

  test("near-dup canonical keep: untouched docs survive, only cluster minima remain") {
    import spark.implicits._
    val df = Seq(
      (10L, goodA), (11L, goodB),   // one near-dup cluster
      (20L, "completely unrelated words forming another document here now today")
    ).toDF("doc_id", "text")
    val kept = CorpusCuration.keepNearDupCanonicals(df)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept === Set(10L, 20L))
  }

  test("keepTopFractionByGroup: per-group rank floor with deterministic tie-break") {
    import spark.implicits._
    val df = Seq(
      // group a: 5 rows, scores 5..1 → ceil(0.5·5)=3 keep ids 1,2,3
      (1L, "a", 5.0), (2L, "a", 4.0), (3L, "a", 3.0), (4L, "a", 2.0), (5L, "a", 1.0),
      // group b: all-tied scores → rank falls back to id order, keeps 10,11
      (10L, "b", 7.0), (11L, "b", 7.0), (12L, "b", 7.0),
      // group c: single row always survives (ceil(0.5·1)=1)
      (20L, "c", 0.0))
      .toDF("doc_id", "grp", "score")
    val kept = CorpusCuration.keepTopFractionByGroup(df, "grp", "score", 0.5)
      .select("doc_id").as[Long].collect().toSet
    assert(kept === Set(1L, 2L, 3L, 10L, 11L, 20L))

    // one shuffle: both windows share the group partitioning
    val plan = CorpusCuration.keepTopFractionByGroup(df, "grp", "score", 0.5)
      .queryExecution.executedPlan.toString
    val shuffles = plan.split("Exchange").length - 1 -
      (plan.split("BroadcastExchange").length - 1)
    assert(shuffles <= 1, s"expected one shuffle:\n$plan")

    intercept[IllegalArgumentException] {
      CorpusCuration.keepTopFractionByGroup(df, "grp", "score", 0.0)
    }
  }

  test("approx quality floor agrees with exact up to the cutoff row; no window shuffle") {
    import spark.implicits._
    val df = (0 until 100).flatMap(i =>
      Seq((i.toLong, "a", i * 2.0), (1000L + i, "b", 500.0 - i)))
      .toDF("doc_id", "grp", "score")
    val exact = CorpusCuration.keepTopFractionByGroup(df, "grp", "score", 0.3)
      .select("doc_id").as[Long].collect().toSet
    val approx = CorpusCuration.keepTopFractionByGroupApprox(df, "grp", "score", 0.3)
      .select("doc_id").as[Long].collect().toSet
    // the approx cut is >= the cutoff VALUE, so it keeps every exact survivor plus
    // at most the cutoff row itself per group — the documented fuzzy boundary
    assert(exact.subsetOf(approx), "approx must never drop an exact survivor")
    assert((approx -- exact).size <= 2, s"boundary slack too wide: ${approx -- exact}")

    // the scale property the variant exists for: broadcast cutoffs, no Window
    val plan = CorpusCuration.keepTopFractionByGroupApprox(df, "grp", "score", 0.3)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"approx path must not window-sort:\n$plan")
    assert(plan.contains("BroadcastExchange"), s"cutoffs must broadcast:\n$plan")
  }

  test("calibrateScores: within-group quantiles comparable across skewed sources") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // two sources whose raw score ranges don't overlap at all — a global
    // threshold would keep everything from 'hi' and nothing from 'lo'; after
    // calibration both groups cover [0, 1]
    val df = ((0 until 100).map(i => (i.toLong, "lo", i / 100.0)) ++
      (0 until 100).map(i => (i.toLong + 100, "hi", 50.0 + i / 100.0)))
      .toDF("doc_id", "source", "score")
    val cal = graft.ops.CorpusCuration.calibrateScores(df, "source", "score")
    val byGroup = cal.groupBy("source")
      .agg(min("score_cal").as("lo"), max("score_cal").as("hi"),
        count(when(col("score_cal") >= 0.9, 1)).as("top"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2),
        r.getLong(3))).toMap
    byGroup.values.foreach { case (lo, hi, top) =>
      assert(lo === 0.0 && hi === 1.0)
      assert(top === 10L) // percent_rank k/99 >= 0.9 → k = 90..99, ten rows
    }
    // monotone within each group: higher raw score never calibrates lower
    val viol = cal.as[(Long, String, Double, Double)].collect()
      .groupBy(_._2).values.flatMap { rows =>
        rows.sortBy(_._3).sliding(2).collect {
          case Array(a, b) if b._4 < a._4 => (a, b) } }
    assert(viol.isEmpty)
    // approx path: quantized but within 1.5 buckets of exact on a real column
    val docs = Tables.documents(spark, sf).select(col("doc_id"),
      col("source"), col("n_chars").cast("double").as("score"))
    val exact = graft.ops.CorpusCuration.calibrateScores(docs, "source", "score")
      .select("doc_id", "score_cal").as[(Long, Double)].collect().toMap
    val approx = graft.ops.CorpusCuration.calibrateScores(docs, "source",
      "score", exact = false, buckets = 100)
      .select("doc_id", "score_cal").as[(Long, Double)].collect().toMap
    assert(exact.keySet === approx.keySet)
    // tolerance is small-sample discreteness, not sketch error: the fixture's
    // groups hold ~50 rows, so one rank step is ~0.02 and tied scores shift
    // percent_rank (first-of-tie) vs bucket-count (last-of-tie) by several
    // steps; at corpus scale the gap shrinks as 1/group size
    val worst = exact.keys.map(k => math.abs(exact(k) - approx(k))).max
    assert(worst <= 0.15, s"approx calibration off by $worst")
    // approx plan never shuffles the corpus: no hash exchange on the doc side
    val plan = graft.ops.CorpusCuration.calibrateScores(docs, "source",
      "score", exact = false, buckets = 100)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"approx path must not window:\n$plan")
    // NULL group: its rows form their own calibration group on BOTH paths —
    // the approx join is null-safe, so no row silently vanishes
    val withNull = ((0 until 20).map(i => (i.toLong, "s1", i.toDouble)) ++
      (20 until 40).map(i => (i.toLong, null.asInstanceOf[String], i.toDouble)))
      .toDF("doc_id", "source", "score")
    val ex = graft.ops.CorpusCuration.calibrateScores(withNull, "source", "score")
    val ap = graft.ops.CorpusCuration.calibrateScores(withNull, "source",
      "score", exact = false, buckets = 100)
    assert(ex.count() === 40 && ap.count() === 40)
    assert(ap.filter(col("source").isNull).count() === 20)
  }

  test("curate with gopher gate and source cap: junk gated first, mix capped last") {
    import org.apache.spark.sql.functions.col
    val docs = Tables.documents(spark, sf)
    val cfg = CorpusCuration.Config(
      minQuality = 0.0, // isolate the new stages
      gopher = Some(graft.ops.TextAnalysis.GopherConfig(
        minWords = 20, maxWords = 80, minStopHits = 1)),
      sourceCap = Some(("source", 5)))
    val out = CorpusCuration.curate(docs, cfg).cache()
    // every survivor passes the gopher gate (word-count rule is the visible one)
    val wc = out.select(
      org.apache.spark.sql.functions.size(
        org.apache.spark.sql.functions.split(
          org.apache.spark.sql.functions.trim(col("text")), "\\s+")).as("n"))
    assert(wc.filter(col("n") < 20 || col("n") > 80).count() === 0)
    // no source exceeds its cap
    val over = out.groupBy("source").count().filter(col("count") > 5)
    assert(over.count() === 0)
    // gate-off config keeps strictly more rows
    val unGated = CorpusCuration.curate(docs,
      cfg.copy(gopher = None, sourceCap = None))
    assert(unGated.count() > out.count())
    out.unpersist()
  }
}
