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
}
