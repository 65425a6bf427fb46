package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.catalog.VersionedTable
import graft.ops.Ivf
import graft.streaming.IvfIngest

/** Streaming IVF maintenance: streamed batches equal the one-shot path,
  * replay is a no-op, centroids stay frozen.
  */
class IvfIngestSpec extends AnyFunSuite with SharedSpark {

  import spark.implicits._

  test("streamed vector batches match the one-shot IVF; replay re-appends nothing") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val emb = Tables.embeddings(spark, sf)
    val seeds = Ivf.seedCentroids(emb, nlist = 8)
    val idx = Files.createTempDirectory("ivf_stream_idx").toString
    val ckpt = Files.createTempDirectory("ivf_stream_ckpt").toString

    // the index exists before the stream starts (centroids freeze at build)
    Ivf.writeIvfIndex(emb.filter(col("vec_id") < 200), seeds, s"$idx/i")

    val later = emb.filter(col("vec_id") >= 200)
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])].collect().toSeq
    val (b1, b2) = later.partition(_._1 < 350)

    val mem = MemoryStream[(Long, Array[Float])]
    val q = IvfIngest.start(mem.toDF().toDF("vec_id", "embedding"),
      s"$idx/i", ckpt,
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime("1 second"))
    try {
      mem.addData(b1: _*)
      q.processAllAvailable()
      mem.addData(b2: _*)
      q.processAllAvailable()
    } finally q.stop()

    val fromIndex = Ivf.ivfTopKFromIndex(Ivf.readIvfIndex(spark, s"$idx/i"),
      numQueries = 10, k = 5, nprobe = 4)
    val oneShot = Ivf.ivfTopK(emb, seeds, numQueries = 10, k = 5, nprobe = 4)
    assert(fromIndex.orderBy("query_id", "rank").collect().map(_.toString).toSeq ===
      oneShot.orderBy("query_id", "rank").collect().map(_.toString).toSeq)

    // replaying a committed identity is a no-op; a fresh one appends
    val before = VersionedTable.read(spark, s"$idx/i/vectors").count()
    IvfIngest.ingestBatch(b2.toDF("vec_id", "embedding"), s"$idx/i", ckpt,
      txnId = 1L)
    assert(VersionedTable.read(spark, s"$idx/i/vectors").count() === before)
    IvfIngest.ingestBatch(Seq((9999L, Array.fill(emb.select("embedding")
        .as[Array[Float]].head().length)(0.5f))).toDF("vec_id", "embedding"),
      s"$idx/i", ckpt, txnId = 42L)
    assert(VersionedTable.read(spark, s"$idx/i/vectors").count() === before + 1)

    // every streamed micro-batch also recorded its quality rows under its
    // txnId label (the maintainer's drift feed), and the drift report is
    // computable straight off them — one row per recorded batch
    val qualityBatches = VersionedTable.read(spark, s"$idx/i/quality")
      .select("batch").distinct().as[String].collect().toSet
    assert(Set("base", "0", "1", "42").subsetOf(qualityBatches),
      s"streamed batches must land quality rows: $qualityBatches")
    val drift = Ivf.ivfDrift(spark, s"$idx/i", baseBatch = "base")
    assert(drift.count() === qualityBatches.size.toLong)
    assert(drift.filter(col("batch") === "base")
      .select("psi").head().getDouble(0) === 0.0)
  }

  test("drift signal through the maintainer: a shifted streamed batch moves " +
      "PSI where an in-distribution one barely does") {
    val emb = Tables.embeddings(spark, sf)
    val idx = Files.createTempDirectory("ivf_stream_drift").toString
    Ivf.writeIvfIndex(emb.filter(col("vec_id") < 200),
      Ivf.seedCentroids(emb, nlist = 8), idx)
    // in-distribution micro-batch vs an occupancy-collapsing one, both
    // through the maintainer's batch entry point
    IvfIngest.ingestBatch(
      emb.filter(col("vec_id") >= 200 && col("vec_id") < 400), idx, "ck", 7L)
    import spark.implicits._
    val dim = emb.select("embedding").as[Array[Float]].head().length
    IvfIngest.ingestBatch(
      (50000L until 50150L).map(i => (i, Array.fill(dim)(-1.0f)))
        .toDF("vec_id", "embedding"), idx, "ck", 8L)
    val byBatch = Ivf.ivfDrift(spark, idx).collect()
      .map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(byBatch("8") > 0.25, s"collapsed streamed batch must read retrain-grade: $byBatch")
    assert(byBatch("8") > byBatch("7"), s"shifted batch must out-drift the in-distribution one: $byBatch")
  }

  test("lifecycle hooks fire through the streaming path: compactEvery folds " +
      "and vacuumEvery reclaims per micro-batch, serving stays one-shot-equal " +
      "with pruning intact") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val emb = Tables.embeddings(spark, sf)
    val seeds = Ivf.seedCentroids(emb, nlist = 8)
    val idx = s"${Files.createTempDirectory("ivf_hooks")}/idx"
    val ckpt = Files.createTempDirectory("ivf_hooks_ckpt").toString
    Ivf.writeIvfIndex(emb.filter(col("vec_id") < 200), seeds, idx)

    val later = emb.filter(col("vec_id") >= 200)
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])].collect().toSeq
    val (b1, b2) = later.partition(_._1 < 350)
    val mem = MemoryStream[(Long, Array[Float])]
    val q = IvfIngest.start(mem.toDF().toDF("vec_id", "embedding"), idx, ckpt,
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime("1 second"),
      compactEvery = 1, vacuumEvery = 1, vacuumRetentionMs = 0L)
    try {
      mem.addData(b1: _*)
      q.processAllAvailable()
      mem.addData(b2: _*)
      q.processAllAvailable()
    } finally q.stop()

    // vacuumEvery reclaimed the shadowed pre-compact commits through the
    // stream: far fewer vectors data dirs than commits written
    // (base + 2 appends + 2 compacts = 5)
    val dirs = new java.io.File(s"$idx/vectors/_data")
      .listFiles().count(_.isDirectory)
    assert(dirs < 4, s"vacuum never reclaimed through the stream: $dirs dirs")

    // the maintained index still serves exactly the one-shot answer, and the
    // compacted layout still prunes (probed-cluster isin pushed into the scan)
    val served = Ivf.ivfTopKFromIndex(Ivf.readIvfIndex(spark, idx),
      numQueries = 10, k = 5, nprobe = 4)
    val oneShot = Ivf.ivfTopK(emb, seeds, numQueries = 10, k = 5, nprobe = 4)
    assert(served.orderBy("query_id", "rank").collect().map(_.toString).toSeq ===
      oneShot.orderBy("query_id", "rank").collect().map(_.toString).toSeq)
    val scans = served.queryExecution.executedPlan.toString.linesIterator
      .filter(l => l.contains("FileScan") && l.contains("/vectors")).toSeq
    // the internal-query convention's one extraction scan (vec_id < n) is
    // documented and bounded; every OTHER vectors read must stay
    // cluster-pruned after the streamed compaction
    val rerank = scans.filterNot(_.contains("LessThan(vec_id"))
    assert(rerank.nonEmpty && rerank.forall(l =>
      l.contains("In(cluster") || l.contains("EqualTo(cluster")),
      s"cluster pruning lost after streamed compaction:\n${scans.mkString("\n")}")
  }
}
