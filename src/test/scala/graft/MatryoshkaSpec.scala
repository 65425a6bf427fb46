package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Similarity

/** Matryoshka (MRL) embedding truncation: prefix slice + optional unit-L2
  * renormalization — the cheap first pass of a funnel retrieval.
  */
class MatryoshkaSpec extends AnyFunSuite with SharedSpark {

  test("slices the prefix; renormalized prefixes are unit length") {
    import spark.implicits._
    val emb = Seq(
      (0L, Array(3.0f, 4.0f, 100.0f, -7.0f)),
      (1L, Array(0.0f, 0.0f, 5.0f, 5.0f)), // all-zero prefix stays zero
      (2L, Array(-1.0f, 0.0f, 0.0f, 0.0f))
    ).toDF("vec_id", "embedding")

    val raw = Similarity.matryoshkaTruncate(emb, dim = 2, renormalize = false)
      .orderBy("vec_id").collect()
    assert(raw.map(_.getSeq[Double](1).length).toSeq == Seq(2, 2, 2))
    assert(raw(0).getSeq[Double](1) == Seq(3.0, 4.0))

    val unit = Similarity.matryoshkaTruncate(emb, dim = 2)
      .orderBy("vec_id").collect()
    assert(unit(0).getSeq[Double](1) == Seq(0.6, 0.8)) // 3-4-5 triangle
    assert(unit(1).getSeq[Double](1) == Seq(0.0, 0.0)) // no divide-by-zero
    assert(unit(2).getSeq[Double](1) == Seq(-1.0, 0.0))
  }

  test("truncated cosine search runs the broadcast one-pass plan") {
    val emb = Tables.embeddings(spark, sf)
    val truncated = Similarity.matryoshkaTruncate(emb, dim = 16,
      renormalize = false)
    val q = Similarity.cosineTopK(truncated, numQueries = 5, k = 3)
    val plan = q.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
    assert(q.count() == 15)
    // funnel sanity: the truncated shortlist materially overlaps the
    // full-dim answer (MRL prefixes carry the coarse geometry — here the
    // synthetic embeddings aren't MRL-trained, so demand overlap, not
    // equality)
    val full = Similarity.cosineTopK(emb, numQueries = 5, k = 3)
      .select("query_id", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val trunc = q.select("query_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert((full intersect trunc).nonEmpty,
      "truncated search should recover part of the full-dim top-k")
  }
}
