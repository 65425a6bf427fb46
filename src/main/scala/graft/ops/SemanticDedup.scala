package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** SemDeDup-style semantic deduplication: embedding-space near-dup pruning with
  * k-means cluster bucketing (Abbas et al. 2023, "SemDeDup: Data-efficient learning
  * at web-scale through semantic deduplication").
  *
  * This is the third candidate-generation strategy next to
  * [[Similarity.embeddingNearDuplicates]] (data-oblivious LSH buckets) and
  * [[Dedup.minhashNearDuplicates]] (lexical shingles): cluster assignment puts
  * semantically close vectors in the SAME bucket by construction, so recall inside a
  * cluster is exact, and the cross-cluster misses are exactly the pairs k-means
  * separated — the trade SemDeDup accepts to bound the quadratic.
  *
  * 100 TB design:
  *  - assignment reuses [[Ivf.assign]]: the centroid table folds into ONE broadcast
  *    row and every vector computes its argmax map-side — zero shuffle on the corpus.
  *  - candidate pairs self-join on the cluster id (equality join, never a cartesian);
  *    per-cluster work is quadratic in CLUSTER size, which the caller bounds by
  *    choosing nlist ∝ √N (the k-means sizing rule) and, for pathological hub
  *    clusters, re-splitting them with a second-level assignment before pairing.
  *  - the dedup policy is the library-wide greedy keep-lowest: any vector that has a
  *    kept near-duplicate with a smaller id is dropped (one left-anti join).
  */
object SemanticDedup {

  /** Intra-cluster near-duplicate pairs at `threshold` cosine. Centroids are a
    * `(centroid_id, cv)` parameter as in [[Ivf]] — train with [[Ivf.trainCentroids]]
    * or seed with [[Ivf.seedCentroids]] for exact reproducibility. Cosine is rounded
    * to 4 dp with id-ordered pairs, as everywhere in the similarity tier.
    */
  def pairs(embeddings: DataFrame, centroids: DataFrame, threshold: Double,
            idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val assigned = Ivf.assign(embeddings, centroids, idCol, vecCol)
      .select(col("cluster"), col("vec_id"), col("v"), col("norm"))
    val left = assigned.select(col("cluster"), col("vec_id").as("vec_a"),
      col("v").as("va"), col("norm").as("na"))
    val right = assigned.select(col("cluster"), col("vec_id").as("vec_b"),
      col("v").as("vb"), col("norm").as("nb"))
    left.join(right, Seq("cluster"))
      .filter(col("vec_a") < col("vec_b"))
      .withColumn("cosine",
        round(Similarity.dot(col("va"), col("vb")) / (col("na") * col("nb")), 4))
      .filter(col("cosine") >= threshold)
      .select("cluster", "vec_a", "vec_b", "cosine")
  }

  /** The kept corpus: drops every vector appearing as the HIGHER id of a near-dup
    * pair (greedy keep-lowest, same policy as [[Dedup.exactDedup]]). Chains collapse
    * to their lowest member.
    */
  def dedup(embeddings: DataFrame, centroids: DataFrame, threshold: Double,
            idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val drop = pairs(embeddings, centroids, threshold, idCol, vecCol)
      .select(col("vec_b").as(idCol)).distinct()
    embeddings.join(drop, Seq(idCol), "left_anti")
  }
}
