package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.catalog.VersionedTable
import graft.ops.IvfPq
import graft.streaming.PqIngest

/** Streaming IVF-PQ maintenance: streamed batches equal the batch-appended
  * and one-shot paths, replay is a no-op, codebooks stay frozen, the quality
  * rows carry a codebook-fit drift signal.
  */
class PqIngestSpec extends AnyFunSuite with SharedSpark {

  import spark.implicits._

  private lazy val emb = Tables.embeddings(spark, sf)
  private lazy val coarse = IvfPq.trainCoarse(emb, nlist = 8, iters = 2)
  private lazy val pqCb = IvfPq.trainResidualPq(emb, coarse, m = 4, ksub = 16,
    iters = 2)

  test("streamed code batches equal batch-appended and one-shot IVFADC; " +
      "replay re-appends nothing") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val idx = Files.createTempDirectory("pq_stream_idx").toString
    val ckpt = Files.createTempDirectory("pq_stream_ckpt").toString

    // the index exists before the stream starts (codebooks freeze at build)
    IvfPq.writePqIndex(emb.filter(col("vec_id") < 200), coarse, pqCb,
      s"$idx/i")

    val later = emb.filter(col("vec_id") >= 200)
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])].collect().toSeq
    val (b1, b2) = later.partition(_._1 < 350)

    val mem = MemoryStream[(Long, Array[Float])]
    val q = PqIngest.start(mem.toDF().toDF("vec_id", "embedding"),
      s"$idx/i", ckpt,
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime("1 second"))
    try {
      mem.addData(b1: _*)
      q.processAllAvailable()
      mem.addData(b2: _*)
      q.processAllAvailable()
    } finally q.stop()

    // streamed ≡ batch-appended ≡ one-shot, row for row
    val queries = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"),
        graft.ops.Similarity.toDoubleVec(col("embedding")).as("qv"))
    val streamedIdx = IvfPq.readPqIndex(spark, s"$idx/i")
    val streamed = IvfPq.searchCodes(streamedIdx.codes, queries,
        streamedIdx.coarse, streamedIdx.codebooks, k = 5, nprobe = 4)
      .orderBy("query_id", "rank").collect().map(_.toString).toSeq

    IvfPq.writePqIndex(emb.filter(col("vec_id") < 200), coarse, pqCb,
      s"$idx/b")
    IvfPq.appendToPqIndex(emb.filter(col("vec_id") >= 200), s"$idx/b")
    val batchIdx = IvfPq.readPqIndex(spark, s"$idx/b")
    val batchAppended = IvfPq.searchCodes(batchIdx.codes, queries,
        batchIdx.coarse, batchIdx.codebooks, k = 5, nprobe = 4)
      .orderBy("query_id", "rank").collect().map(_.toString).toSeq

    val oneShot = IvfPq.search(emb, coarse, pqCb, numQueries = 10, k = 5,
        nprobe = 4)
      .orderBy("query_id", "rank").collect().map(_.toString).toSeq
    assert(streamed === oneShot, "streamed index diverged from one-shot")
    assert(batchAppended === oneShot, "batch-appended index diverged")

    // replaying a committed identity is a no-op on BOTH artifacts; a fresh
    // one appends
    val before = (
      VersionedTable.read(spark, s"$idx/i/codes").count(),
      VersionedTable.read(spark, s"$idx/i/quality").count())
    PqIngest.ingestBatch(b2.toDF("vec_id", "embedding"), s"$idx/i", ckpt,
      txnId = 1L)
    val after = (
      VersionedTable.read(spark, s"$idx/i/codes").count(),
      VersionedTable.read(spark, s"$idx/i/quality").count())
    assert(after === before, s"replay must be a no-op: $before -> $after")
    val dim = emb.select("embedding").as[Array[Float]].head().length
    PqIngest.ingestBatch(
      Seq((99999L, Array.fill(dim)(0.5f))).toDF("vec_id", "embedding"),
      s"$idx/i", ckpt, txnId = 42L)
    assert(VersionedTable.read(spark, s"$idx/i/codes").count() === before._1 + 1)

    // every streamed micro-batch recorded quality rows under its txnId label
    val qualityBatches = VersionedTable.read(spark, s"$idx/i/quality")
      .select("batch").distinct().as[String].collect().toSet
    assert(Set("base", "0", "1", "42").subsetOf(qualityBatches),
      s"streamed batches must land quality rows: $qualityBatches")
  }

  test("codebook-fit drift through the maintainer: an off-distribution batch " +
      "moves mean_qerr and PSI where an in-distribution one barely does") {
    val idx = Files.createTempDirectory("pq_stream_drift").toString
    IvfPq.writePqIndex(emb.filter(col("vec_id") < 200), coarse, pqCb, idx)
    // in-distribution micro-batch vs one far off the trained codebooks, both
    // through the maintainer's batch entry point
    PqIngest.ingestBatch(
      emb.filter(col("vec_id") >= 200 && col("vec_id") < 400), idx, "ck", 7L)
    val dim = emb.select("embedding").as[Array[Float]].head().length
    PqIngest.ingestBatch(
      (50000L until 50150L).map(i => (i, Array.fill(dim)(-25.0f)))
        .toDF("vec_id", "embedding"), idx, "ck", 8L)

    val drift = IvfPq.pqDrift(spark, idx).collect()
      .map(r => r.getString(0) -> (r.getDouble(2), r.getDouble(3))).toMap
    assert(drift("base")._2 === 0.0, "base vs itself must be exactly zero PSI")
    assert(drift("8")._1 > drift("7")._1 * 2,
      s"off-distribution batch must blow up mean quantization error: $drift")
    assert(drift("8")._2 > drift("7")._2,
      s"collapsed occupancy must out-PSI the in-distribution batch: $drift")
  }

  test("PQ maintainer FS budget: an ingested micro-batch opens zero prior " +
      "codes or quality data files; compaction preserves probe pruning") {
    spark.sparkContext.hadoopConfiguration.set("fs.counted.impl",
      classOf[graft.testutil.CountingFileSystem].getName)
    val dir = s"counted://${Files.createTempDirectory("pq_ingest_count")}/idx"
    IvfPq.writePqIndex(emb.filter(col("vec_id") < 100), coarse, pqCb, dir)
    graft.testutil.CountingFileSystem.reset()
    PqIngest.ingestBatch(
      emb.filter(col("vec_id") >= 100 && col("vec_id") < 150), dir, "ck", 1L)
    val priorCodeOpens =
      graft.testutil.CountingFileSystem.total("open", "codes/_data/v=0")
    val priorQualityOpens =
      graft.testutil.CountingFileSystem.total("open", "quality/_data/v=0")
    assert(priorCodeOpens == 0 && priorQualityOpens == 0,
      s"maintainer must not read prior index data: codes=$priorCodeOpens " +
        s"quality=$priorQualityOpens")

    // compaction folds the accreted commits; answers unchanged and the
    // probed-cluster predicate still pushes into the compacted codes scan
    val queries = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"),
        graft.ops.Similarity.toDoubleVec(col("embedding")).as("qv"))
    def serve() = IvfPq.searchIndex(IvfPq.readPqIndex(spark, dir), queries,
      k = 5, nprobe = 4)
    val before = serve().orderBy("query_id", "rank")
      .collect().map(_.toString).toSeq
    PqIngest.compactIndex(spark, dir)
    val served = serve()
    val after = served.orderBy("query_id", "rank")
      .collect().map(_.toString).toSeq
    assert(after === before, "compaction must not change serving answers")
    val scans = served.queryExecution.executedPlan.toString.linesIterator
      .filter(l => l.contains("FileScan") && l.contains("/codes")).toSeq
    assert(scans.nonEmpty && scans.forall(l =>
      l.contains("In(cluster") || l.contains("EqualTo(cluster")),
      s"cluster pruning lost after compaction:\n${scans.mkString("\n")}")
  }

  test("lifecycle hooks fire through the streaming path: compactEvery folds " +
      "and vacuumEvery reclaims per micro-batch, serving stays one-shot-equal " +
      "with pruning intact") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val idx = s"${Files.createTempDirectory("pq_hooks")}/idx"
    val ckpt = Files.createTempDirectory("pq_hooks_ckpt").toString
    IvfPq.writePqIndex(emb.filter(col("vec_id") < 200), coarse, pqCb, idx)

    val later = emb.filter(col("vec_id") >= 200)
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])].collect().toSeq
    val (b1, b2) = later.partition(_._1 < 350)
    val mem = MemoryStream[(Long, Array[Float])]
    val q = PqIngest.start(mem.toDF().toDF("vec_id", "embedding"), idx, ckpt,
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime("1 second"),
      compactEvery = 1, vacuumEvery = 1, vacuumRetentionMs = 0L)
    try {
      mem.addData(b1: _*)
      q.processAllAvailable()
      mem.addData(b2: _*)
      q.processAllAvailable()
    } finally q.stop()

    val dirs = new java.io.File(s"$idx/codes/_data")
      .listFiles().count(_.isDirectory)
    assert(dirs < 4, s"vacuum never reclaimed through the stream: $dirs dirs")

    val queries = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"),
        graft.ops.Similarity.toDoubleVec(col("embedding")).as("qv"))
    val pidx = IvfPq.readPqIndex(spark, idx)
    val served = IvfPq.searchCodes(pidx.codes, queries, pidx.coarse,
      pidx.codebooks, k = 5, nprobe = 4, pruneScan = true)
    val oneShot = IvfPq.search(emb, coarse, pqCb, numQueries = 10, k = 5,
      nprobe = 4)
    assert(served.orderBy("query_id", "rank").collect().map(_.toString).toSeq ===
      oneShot.orderBy("query_id", "rank").collect().map(_.toString).toSeq)
    val scans = served.queryExecution.executedPlan.toString.linesIterator
      .filter(l => l.contains("FileScan") && l.contains("/codes")).toSeq
    assert(scans.nonEmpty && scans.forall(l =>
      l.contains("In(cluster") || l.contains("EqualTo(cluster")),
      s"cluster pruning lost after streamed compaction:\n${scans.mkString("\n")}")
  }
}
