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
