package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.HybridRetrieval

/** Reciprocal-rank fusion of lexical (token-overlap) and semantic (cosine)
  * retrieval — correctness on a hand-checkable corpus plus the plan shapes
  * that keep it 100 TB-safe.
  */
class HybridRetrievalSpec extends AnyFunSuite with SharedSpark {

  test("fuses both legs; a doc missing from one leg still ranks by the other") {
    import spark.implicits._
    // doc 0 is the query. doc 1 shares tokens AND is the nearest vector;
    // doc 2 shares tokens only (orthogonal vector); doc 3 is vector-near
    // only (disjoint tokens); doc 4 matches neither.
    val docs = Seq(
      (0L, "alpha beta gamma"),
      (1L, "alpha beta delta"),
      (2L, "alpha gamma epsilon"),
      (3L, "zeta eta theta"),
      (4L, "iota kappa lambda")
    ).toDF("doc_id", "text")
    val embeddings = Seq(
      (0L, Array(1.0f, 0.0f)),
      (1L, Array(0.9f, 0.1f)),
      (2L, Array(0.0f, 1.0f)),
      (3L, Array(0.8f, 0.2f)),
      (4L, Array(-1.0f, 0.0f))
    ).toDF("vec_id", "embedding")

    val out = HybridRetrieval.rrfTopK(docs, embeddings, numQueries = 1,
      legK = 3, k = 4).orderBy("rank").collect()
    val byDoc = out.map(r => r.getAs[Long]("doc_id") ->
      (r.getAs[Int]("rank"), r.getAs[Double]("rrf"))).toMap
    // doc 1: lexical rank 1 (2 shared tokens) AND semantic rank 1 → top
    assert(byDoc(1L)._1 == 1, s"doc 1 should fuse to rank 1: ${out.mkString(";")}")
    assert(byDoc(1L)._2 == 1.0 / 61 + 1.0 / 61)
    // doc 3: semantic-only (rank 2 — cos 0.8·· vs doc 1) still retrieved
    assert(byDoc.contains(3L) && byDoc(3L)._2 == 1.0 / 62)
    // doc 2: lexical rank 2 + semantic rank 3 (cosine 0 beats doc 4's -1)
    assert(byDoc.contains(2L) && byDoc(2L)._2 == 1.0 / 62 + 1.0 / 63)
    // doc 4: neither leg retrieves it within legK... semantic legK=3 keeps
    // top-3 of 4 candidates — doc 4 (cosine -1) is cut; lexical has no
    // overlap → absent entirely
    assert(!byDoc.contains(4L))
  }

  test("plan shape: broadcast lexical probe, no cartesian product") {
    val docs = Tables.documents(spark, sf)
    val emb = Tables.embeddings(spark, sf)
    val plan = HybridRetrieval.rrfTopK(docs, emb, numQueries = 3, legK = 5,
      k = 5).queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      s"hybrid retrieval must never plan a cartesian:\n$plan")
    assert(plan.contains("BroadcastHashJoin") ||
      plan.contains("BroadcastNestedLoopJoin"),
      "query side must broadcast")
    // end-to-end sanity at the fixture scale
    val n = HybridRetrieval.rrfTopK(docs, emb, numQueries = 3, legK = 5, k = 5)
      .count()
    assert(n == 15, s"expected 3 queries x 5 results, got $n")
  }
}
