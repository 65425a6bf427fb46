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

  test("funnel with a corpus-wide shortlist reproduces exact top-k") {
    val emb = Tables.embeddings(spark, sf)
    val corpus = emb.count().toInt
    val funnel = Similarity.funnelTopK(emb, numQueries = 5, k = 3,
        coarseDim = 16, shortlistK = corpus)
      .orderBy("query_id", "rank").collect().map(_.toString).toSeq
    val exact = Similarity.cosineTopK(emb, numQueries = 5, k = 3)
      .orderBy("query_id", "rank").collect().map(_.toString).toSeq
    // a shortlist covering every candidate makes the coarse pass a no-op
    // filter; the re-rank IS the exact scan — identical rows, ranks, cosines
    assert(funnel == exact, s"funnel != exact:\n$funnel\nvs\n$exact")
  }

  test("funnel recall on MRL-shaped embeddings within the paper-expected band") {
    import spark.implicits._
    // MRL-like synthetic corpus: the PREFIX carries the coarse cluster
    // geometry (what MRL training packs there), the tail adds small
    // deterministic noise. 200 vectors, 8 clusters, dim 16, prefix 4.
    val rnd = new scala.util.Random(7)
    val centroids = Array.fill(8)(Array.fill(4)(rnd.nextGaussian()))
    val vecs = (0 until 200).map { i =>
      val c = centroids(i % 8)
      val prefix = c.map(x => (x + 0.1 * rnd.nextGaussian()).toFloat)
      val tail = Array.fill(12)((0.05 * rnd.nextGaussian()).toFloat)
      (i.toLong, prefix ++ tail)
    }.toDF("vec_id", "embedding")

    val exact = Similarity.cosineTopK(vecs, numQueries = 10, k = 5)
      .select("query_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val funnel = Similarity.funnelTopK(vecs, numQueries = 10, k = 5,
        coarseDim = 4, shortlistK = 20)
      .select("query_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact intersect funnel).size.toDouble / exact.size
    // MRL reports coarse-to-full funnels holding ~0.9+ recall with a 4x
    // shortlist when the prefix carries the semantics (Kusupati et al. 2022
    // §4.3); the synthetic corpus is built to that shape
    assert(recall >= 0.9, s"funnel recall $recall below the MRL band")
  }

  test("funnel re-rank broadcasts the shortlist — no cartesian, no wide shuffle") {
    val emb = Tables.embeddings(spark, sf)
    val q = Similarity.funnelTopK(emb, numQueries = 5, k = 3,
      coarseDim = 16, shortlistK = 10)
    val plan = q.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), s"funnel planned a cartesian:\n$plan")
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"),
      "shortlist and queries must broadcast against the streaming corpus scan")
    assert(q.count() == 15)
  }
}
