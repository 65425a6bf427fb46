package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Profile, TextAnalysis}

class ProfileSpec extends AnyFunSuite with SharedSpark {

  test("profile: nulls, exact distincts, min/max in one aggregation") {
    import spark.implicits._
    val df = Seq[(java.lang.Long, java.lang.Double)](
      (1L, 10.0), (2L, 20.0), (2L, null), (null, 5.0)
    ).toDF("a", "b")
    val got = Profile.profile(df, Seq("a", "b")).orderBy("column").collect()
    val a = got(0)
    assert(a.getAs[String]("column") === "a")
    assert(a.getAs[Long]("n_nulls") === 1L)
    assert(a.getAs[Long]("n_distinct") === 2L)
    assert(a.getAs[Double]("min_value") === 1.0)
    assert(a.getAs[Double]("max_value") === 2.0)
    val b = got(1)
    assert(b.getAs[Long]("n_nulls") === 1L)
    assert(b.getAs[Long]("n_distinct") === 3L)
    assert(b.getAs[Double]("max_value") === 20.0)
  }

  test("histogram: counts conserve, edges exact, outliers clamp to edge bins") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val df = Seq(-5.0, 0.0, 1.0, 9.9, 10.0, 15.0, 99.9, 250.0)
      .toDF("x")
    val h = graft.ops.Profile.histogram(df, "x", 0.0, 100.0, 10)
      .orderBy("bin").collect()
    // total conserved (outliers clamped in, none dropped)
    assert(h.map(_.getAs[Long]("n")).sum === 8L)
    val byBin = h.map(r => r.getAs[Int]("bin") ->
      (r.getAs[Double]("bin_lo"), r.getAs[Double]("bin_hi"), r.getAs[Long]("n"))).toMap
    assert(byBin(0)._3 === 4L) // -5 (clamped), 0.0, 1.0, 9.9
    assert(byBin(0)._1 === 0.0 && byBin(0)._2 === 10.0)
    assert(byBin(1)._3 === 2L) // 10.0 and 15.0
    assert(byBin(9)._3 === 2L) // 99.9 and 250 (clamped)
    // corpus-scale sanity: orders histogram is non-empty and conserves row count
    val orders = Tables.orders(spark, sf)
    val oh = graft.ops.Profile.histogram(orders, "o_totalprice", 0.0, 600000.0, 24)
    assert(oh.agg(sum("n")).first().getLong(0) ===
      orders.filter(col("o_totalprice").isNotNull).count())
  }

  test("approxProfile: tracks exact distincts, avoids the Expand blow-up") {
    val o = Tables.orders(spark, sf)
    val cols = Seq("o_orderkey", "o_custkey", "o_totalprice")
    val exact = Profile.profile(o, cols).orderBy("column").collect()
    val approx = Profile.approxProfile(o, cols, rsd = 0.02).orderBy("column").collect()
    exact.zip(approx).foreach { case (e, ap) =>
      val (ne, na) = (e.getAs[Long]("n_distinct"), ap.getAs[Long]("n_distinct"))
      assert(math.abs(na - ne).toDouble / ne < 0.1, s"${e.getString(0)}: $na vs $ne")
      assert(e.getAs[Long]("n_nulls") === ap.getAs[Long]("n_nulls"))
    }
    // exact multi-distinct pays Expand; the HLL path must not
    val exactPlan = Profile.profile(o, cols).queryExecution.executedPlan.toString
    val approxPlan = Profile.approxProfile(o, cols).queryExecution.executedPlan.toString
    assert(exactPlan.contains("Expand"))
    assert(!approxPlan.contains("Expand"), s"approx profile must partial-agg:\n$approxPlan")
  }

  test("topShingles: document frequency ranking with lexicographic tie-break, top-k plan") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "the cat sat on a rug"),
      (3L, "a dog sat on the mat")
    ).toDF("doc_id", "text")
    val top = TextAnalysis.topShingles(docs, n = 3, k = 3)
    val rows = top.collect()
    assert(rows.head.getAs[String]("shingle") === "cat sat on")
    assert(rows.head.getAs[Long]("df_count") === 2L)
    assert(rows.map(_.getAs[String]("shingle")).toSeq ===
      rows.map(_.getAs[String]("shingle")).toSeq.sortBy(s =>
        (-rows.find(_.getString(0) == s).get.getLong(1), s)))
    // top-k must be TakeOrderedAndProject, not a global sort
    val plan = top.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"expected top-k operator:\n$plan")
  }
}
