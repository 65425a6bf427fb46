package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Privacy

class PrivacySpec extends AnyFunSuite with SharedSpark {

  private def people = {
    import spark.implicits._
    Seq(
      // class (30, "NYC"): 3 rows, diverse conditions
      (30, "NYC", "flu"), (30, "NYC", "cold"), (30, "NYC", "ok"),
      // class (30, "SF"): 3 rows, all the same condition — not l-diverse
      (30, "SF", "flu"), (30, "SF", "flu"), (30, "SF", "flu"),
      // class (40, "NYC"): a singleton — re-identifiable
      (40, "NYC", "rare"))
      .toDF("age", "city", "condition")
  }

  test("equivalenceClasses: sizes, distinct sensitive values, and both flags") {
    val got = Privacy.equivalenceClasses(people, Seq("age", "city"), k = 2,
        sensitiveCol = Some("condition"), l = 2)
      .orderBy("age", "city").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4), r.getBoolean(5))).toSeq
    assert(got === Seq(
      (30, "NYC", 3L, 3L, true, true),
      (30, "SF", 3L, 1L, true, false), // k-anonymous yet leaks the condition
      (40, "NYC", 1L, 1L, false, false)))
  }

  test("equivalenceClasses without a sensitive column omits the l-diversity side") {
    val cols = Privacy.equivalenceClasses(people, Seq("age"), k = 2).columns.toSeq
    assert(cols === Seq("age", "class_size", "k_anonymous"))
  }

  test("riskSummary: the release-gate numbers") {
    val got = Privacy.riskSummary(people, Seq("age", "city"), k = 2).collect().head
    assert((got.getLong(0), got.getLong(1), got.getLong(2), got.getLong(3),
      got.getLong(4), got.getBoolean(5)) === (7L, 3L, 1L, 1L, 1L, false))
    val ok = Privacy.riskSummary(people, Seq("city"), k = 2).collect().head
    assert(ok.getBoolean(5), "grouping only by city, every class has >= 2 rows")
  }

  test("vacuous thresholds are rejected") {
    intercept[IllegalArgumentException] {
      Privacy.equivalenceClasses(people, Seq("age"), k = 1)
    }
    intercept[IllegalArgumentException] {
      Privacy.equivalenceClasses(people, Seq.empty, k = 2)
    }
  }
}
