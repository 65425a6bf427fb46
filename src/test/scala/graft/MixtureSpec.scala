package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Mixture

class MixtureSpec extends AnyFunSuite with SharedSpark {

  private def corpus = {
    import spark.implicits._
    Seq(
      ("a", "one two three four five six seven eight nine ten"), // 10 tokens
      ("b", "w1 w2 w3 w4 w5"), ("b", "v1 v2 v3 v4 v5"),
      ("b", "u1 u2 u3 u4 u5"), ("b", "t1 t2 t3 t4 t5"),
      ("b", "s1 s2 s3 s4 s5"), ("b", "r1 r2 r3 r4 r5"),
      ("b", "q1 q2 q3 q4 q5"), ("b", "p1 p2 p3 p4 p5"),
      ("b", "o1 o2 o3 o4 o5"), ("b", "n1 n2 n3 n4 n5"), // 50 tokens
      ("d", "x y")) // in the corpus but not in the targets
      .toDF("source", "text")
  }

  test("plan: upsample / downsample / missing / unused all surface correctly") {
    val got = Mixture.plan(corpus,
        targets = Map("a" -> 0.75, "b" -> 0.125, "c" -> 0.125),
        budgetTokens = 40)
      .orderBy("source").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getLong(4), Option(r.get(5)).map(_.asInstanceOf[Double]),
        r.getInt(6), r.getString(7))).toSeq
    assert(got === Seq(
      // a: 30 target / 10 available → 3 epochs of upsampling
      ("a", 1L, 10L, 0.75, 30L, Some(3.0), 3, "upsample"),
      // b: 5 target / 50 available → rate 0.1 downsample
      ("b", 10L, 50L, 0.125, 5L, Some(0.1), 1, "downsample"),
      // c: targeted but absent from the corpus
      ("c", 0L, 0L, 0.125, 5L, None, 0, "missing"),
      // d: in the corpus, carries no weight — surfaced, not silently dropped
      ("d", 1L, 2L, 0.0, 0L, Some(0.0), 0, "unused")))
  }

  test("plan: a source exactly at its target reports 'exact'") {
    val got = Mixture.plan(corpus, targets = Map("a" -> 0.2, "b" -> 0.8),
        budgetTokens = 50)
      .orderBy("source").collect()
      .map(r => (r.getString(0), r.getString(7))).toSeq
    // a: 10/10 = 1.0; b: 40/50 = 0.8
    assert(got === Seq(("a", "exact"), ("b", "downsample"), ("d", "unused")))
  }

  test("property: target tokens sum to the budget within per-source rounding") {
    for (budget <- Seq(100L, 999L, 12345L)) {
      val targets = Map("a" -> 0.37, "b" -> 0.23, "c" -> 0.4)
      val total = Mixture.plan(corpus, targets, budget)
        .agg(org.apache.spark.sql.functions.sum("target_tokens"))
        .collect().head.getLong(0)
      assert(math.abs(total - budget) <= targets.size / 2 + 1,
        s"budget $budget: targets sum to $total")
    }
  }

  test("plan rejects weights that do not sum to 1") {
    val e = intercept[IllegalArgumentException] {
      Mixture.plan(corpus, targets = Map("a" -> 0.5, "b" -> 0.2), budgetTokens = 10)
    }
    assert(e.getMessage.contains("sum to 1"))
  }
}
