package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Ivf, Similarity}

class IvfSpec extends AnyFunSuite with SharedSpark {

  private lazy val emb = Tables.embeddings(spark, sf)

  test("assign: every vector lands in exactly one cluster, centroids own themselves") {
    val seeds = Ivf.seedCentroids(emb, nlist = 8)
    val assigned = Ivf.assign(emb, seeds).cache()
    assert(assigned.count() === emb.count())
    assert(assigned.select("vec_id").distinct().count() === emb.count())
    // a centroid's own vector has cosine 1.0 with itself, so it must sit in its cluster
    val selfOwned = assigned.filter(col("vec_id") < 8)
      .filter(col("vec_id") === col("cluster")).count()
    assert(selfOwned === 8)
    assigned.unpersist()
  }

  test("ivfTopK with nprobe = nlist equals brute force exactly") {
    val nlist = 8
    val seeds = Ivf.seedCentroids(emb, nlist)
    val full = Ivf.ivfTopK(emb, seeds, numQueries = 5, k = 3, nprobe = nlist)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    val exact = Similarity.cosineTopK(emb, numQueries = 5, k = 3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    assert(full.sortBy(t => (t._1, t._2)).toSeq === exact.sortBy(t => (t._1, t._2)).toSeq,
      "probing every cluster is an exhaustive search and must equal cosineTopK")
  }

  test("ivfTopK partial probe: subset of corpus pairs with reasonable recall") {
    val seeds = Ivf.seedCentroids(emb, nlist = 16)
    val ivf = Ivf.ivfTopK(emb, seeds, numQueries = 10, k = 5, nprobe = 4)
      .select("query_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = Similarity.cosineTopK(emb, numQueries = 10, k = 5)
      .select("query_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(ivf.nonEmpty)
    val recall = (ivf & exact).size.toDouble / exact.size
    assert(recall > 0.3, s"recall $recall implausibly low for nprobe=4 of nlist=16")
  }

  test("trainCentroids: Lloyd iterations do not worsen quantization error") {
    def quantError(centroids: org.apache.spark.sql.DataFrame): Double = {
      val assigned = Ivf.assign(emb, centroids)
      val withC = assigned.join(
        broadcast(centroids.withColumn("cnorm", Similarity.l2Norm(col("cv")))),
        assigned("cluster") === col("centroid_id"))
      withC.select(avg(lit(1.0) -
        Similarity.dot(col("v"), col("cv")) / (col("norm") * col("cnorm"))))
        .first().getDouble(0)
    }
    val seeds = Ivf.seedCentroids(emb, nlist = 8)
    val trained = Ivf.trainCentroids(emb, seeds, iters = 3)
    assert(trained.count() <= 8)
    val e0 = quantError(seeds)
    val e1 = quantError(trained)
    assert(e1 <= e0 + 1e-9, s"training worsened quantization: $e0 -> $e1")
  }

  test("persisted index: append assigns only the batch (prior corpus deleted), " +
      "matches the one-shot path, and the probe set prunes the vector scan") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf_inc").toString
    val vecDir = java.nio.file.Files.createTempDirectory("graft_ivf_vecs").toString
    val seeds = Ivf.seedCentroids(emb, nlist = 8)

    // initial build from parquet the test then DELETES: a rescan would throw
    emb.filter(col("vec_id") < 300).write.parquet(s"$vecDir/base")
    Ivf.writeIvfIndex(spark.read.parquet(s"$vecDir/base"), seeds, s"$dir/idx")
    val fs = new org.apache.hadoop.fs.Path(vecDir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    assert(fs.delete(new org.apache.hadoop.fs.Path(s"$vecDir/base"), true))

    Ivf.appendToIvfIndex(emb.filter(col("vec_id") >= 300), s"$dir/idx")

    val idx = Ivf.readIvfIndex(spark, s"$dir/idx")
    val fromIndex = Ivf.ivfTopKFromIndex(idx, numQueries = 10, k = 5, nprobe = 4)
    val oneShot = Ivf.ivfTopK(emb, seeds, numQueries = 10, k = 5, nprobe = 4)
    assert(fromIndex.orderBy("query_id", "rank").collect().map(_.toString).toSeq ===
      oneShot.orderBy("query_id", "rank").collect().map(_.toString).toSeq)

    // the rerank's vector scan must carry the pushed cluster predicate
    val plan = fromIndex.queryExecution.executedPlan.toString
    val vecScans = plan.linesIterator
      .filter(l => l.contains("FileScan") && l.contains("/vectors")).toSeq
    assert(vecScans.nonEmpty, s"expected parquet vector scans:\n$plan")
    assert(vecScans.exists(l => l.contains("In(cluster") || l.contains("EqualTo(cluster")),
      s"probed clusters must push into the vector scan:\n${vecScans.mkString("\n")}")
  }
}
