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


  test("ivfTopKForQueries: external queries never scan the vectors table " +
      "unpruned; relabeled internal queries shift ranks by exactly the self-match") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf_ext").toString
    val seeds = Ivf.seedCentroids(emb, nlist = 8)
    Ivf.writeIvfIndex(emb, seeds, s"$dir/idx")
    val idx = Ivf.readIvfIndex(spark, s"$dir/idx")

    // external queries = the first 5 corpus vectors RELABELED outside the id
    // space: no self-exclusion applies, so each query's own source vector
    // must lead at cosine 1.0 and the rest must equal the internal answer
    val maxId = emb.agg(max(col("vec_id"))).head().getLong(0)
    val queries = emb.filter(col("vec_id") < 5)
      .select((col("vec_id") + maxId + 1000L).as("vec_id"), col("embedding"))
    val ext = Ivf.ivfTopKForQueries(idx, queries, k = 4, nprobe = 8)
      .collect().map(r => (r.getLong(0) - maxId - 1000L, r.getInt(1),
        r.getLong(2), r.getDouble(3)))
    val int = Ivf.ivfTopKFromIndex(idx, numQueries = 5, k = 3, nprobe = 8)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getDouble(3)))
    for (qid <- 0L until 5L) {
      val e = ext.filter(_._1 == qid).sortBy(_._2)
      val i = int.filter(_._1 == qid).sortBy(_._2)
      assert(e.head._3 == qid && e.head._4 == 1.0,
        s"query $qid: own vector must lead the external ranking: ${e.head}")
      assert(e.tail.map(t => (t._3, t._4)).toSeq ===
        i.map(t => (t._3, t._4)).toSeq,
        s"query $qid: external ranks 2..k must equal internal 1..k-1")
    }

    // plan shape: EVERY vectors read carries the pushed cluster set — the
    // external path has no extraction scan
    val plan = Ivf.ivfTopKForQueries(idx, queries, k = 4, nprobe = 2)
      .queryExecution.executedPlan.toString
    val vecScans = plan.linesIterator
      .filter(l => l.contains("FileScan") && l.contains("/vectors")).toSeq
    assert(vecScans.nonEmpty)
    vecScans.foreach { l =>
      assert(l.contains("In(cluster") || l.contains("EqualTo(cluster"),
        s"external path: unpruned vectors scan:\n$l")
    }
  }

  test("ivfDrift: identical distribution reads stable; a collapsed batch " +
      "reads retrain-grade; base PSI is exactly zero") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf_drift").toString
    val seeds = Ivf.seedCentroids(emb, nlist = 8)
    Ivf.writeIvfIndex(emb.filter(col("vec_id") < 200), seeds, s"$dir/idx",
      batchLabel = "base")
    // in-distribution: more of the same corpus
    Ivf.appendToIvfIndex(emb.filter(col("vec_id") >= 200 && col("vec_id") < 400),
      s"$dir/idx", batchLabel = "same")
    // off-distribution: every vector identical → occupancy collapses to one cluster
    val dim = emb.select("embedding")
      .as[Array[Float]].head().length
    val shifted = (100000L until 100200L)
      .map(i => (i, Array.fill(dim)(-1.0f))).toDF("vec_id", "embedding")
    Ivf.appendToIvfIndex(shifted, s"$dir/idx", batchLabel = "shift")

    val drift = Ivf.ivfDrift(spark, s"$dir/idx", baseBatch = "base")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(drift("base")._3 === 0.0, "base vs itself must be exactly zero PSI")
    assert(drift("shift")._3 > 0.25,
      s"collapsed occupancy must read retrain-grade: ${drift("shift")}")
    assert(drift("shift")._3 > drift("same")._3,
      s"off-distribution batch must out-drift the in-distribution one: $drift")
    assert(drift("shift")._1 === 200L)
  }

  test("ivfDrift orders the trend numerically: streamed batch '10' follows " +
      "'9', not '1' — lexicographic order would garble the signal") {
    import spark.implicits._
    import graft.catalog.VersionedTable
    val dir = java.nio.file.Files.createTempDirectory("ivf_drift_ord").toString
    VersionedTable.write(Seq((0, Array(1.0, 0.0))).toDF("centroid_id", "cv"),
      s"$dir/centroids", "overwrite")
    // the streaming maintainer labels quality batches with numeric txnId
    // strings — fabricate eleven of them plus the non-numeric base
    val labels = "base" +: (0 to 10).map(_.toString)
    VersionedTable.write(
      labels.map(l => (l, 0, 10L, 99990L))
        .toDF("batch", "cluster", "n_vecs", "sum_cos4"),
      s"$dir/quality", "overwrite")
    val order = Ivf.ivfDrift(spark, dir, baseBatch = "base")
      .select("batch").as[String].collect().toSeq
    assert(order === labels,
      s"drift report must read in ingest order, got: $order")
  }
}
