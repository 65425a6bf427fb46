package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Ivf, SemanticDedup, Similarity}

class SemanticDedupSpec extends AnyFunSuite with SharedSpark {

  private def emb(rows: (Long, Seq[Double])*) = {
    import spark.implicits._
    rows.toDF("vec_id", "embedding")
  }

  test("pairs: finds intra-cluster near-dups exactly, misses only cross-cluster pairs") {
    // two well-separated directions; ids 0 and 1 are the seed centroids
    val df = emb(
      0L -> Seq(1.0, 0.0), 1L -> Seq(0.0, 1.0),
      2L -> Seq(0.999, 0.01),   // near-dup of 0, same cluster
      3L -> Seq(0.01, 0.999),   // near-dup of 1, same cluster
      4L -> Seq(0.7, 0.714))    // between the clusters
    val got = SemanticDedup.pairs(df, Ivf.seedCentroids(df, nlist = 2), threshold = 0.99)
      .orderBy("vec_a", "vec_b").collect()
    val pairs = got.map(r => (r.getAs[Long]("vec_a"), r.getAs[Long]("vec_b"))).toSet
    assert(pairs === Set((0L, 2L), (1L, 3L)))
    assert(got.forall(_.getAs[Double]("cosine") >= 0.99))
  }

  test("pairs are a subset of the exact all-pairs set (clustering only removes candidates)") {
    val e = Tables.embeddings(spark, sf)
    val clustered = SemanticDedup.pairs(e, Ivf.seedCentroids(e, nlist = 8), 0.4)
      .select("vec_a", "vec_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // exact reference: brute-force all pairs above the same threshold
    val n = e.select(col("vec_id"), Similarity.toDoubleVec(col("embedding")).as("v"))
      .withColumn("norm", Similarity.l2Norm(col("v")))
    val l = n.select(col("vec_id").as("a"), col("v").as("va"), col("norm").as("na"))
    val r = n.select(col("vec_id").as("b"), col("v").as("vb"), col("norm").as("nb"))
    val exact = l.join(r, col("a") < col("b"))
      .withColumn("cosine", round(Similarity.dot(col("va"), col("vb")) / (col("na") * col("nb")), 4))
      .filter(col("cosine") >= 0.4)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(clustered.nonEmpty)
    assert(clustered.subsetOf(exact))
  }

  test("dedup: greedy keep-lowest drops exactly the higher ids of pairs") {
    val df = emb(
      0L -> Seq(1.0, 0.0), 1L -> Seq(0.0, 1.0),
      2L -> Seq(0.999, 0.01), 3L -> Seq(0.998, 0.02))
    val kept = SemanticDedup.dedup(df, Ivf.seedCentroids(df, nlist = 2), 0.99)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    // 2 and 3 are both near-dups of 0 (and each other): only the lowest survives
    assert(kept === Set(0L, 1L))
  }

  test("plan: no cartesian product; candidate join is an equality join on cluster") {
    val e = Tables.embeddings(spark, sf)
    val plan = SemanticDedup.pairs(e, Ivf.seedCentroids(e, nlist = 8), 0.45)
      .queryExecution.executedPlan.toString
    assert(!plan.toLowerCase.contains("cartesian"))
    // the only nested-loop joins are Ivf.assign's folds against the ONE-row broadcast
    // centroid table; the quadratic candidate step itself must be an equality join
    assert(plan.contains("Join") && plan.contains("cluster"))
    val pairJoinIsEquality = plan.linesIterator.exists(l =>
      (l.contains("SortMergeJoin") || l.contains("BroadcastHashJoin") ||
        l.contains("ShuffledHashJoin")) && l.contains("cluster"))
    assert(pairJoinIsEquality, s"no equality join on cluster in:\n$plan")
  }
}
