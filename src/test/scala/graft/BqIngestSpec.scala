package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.catalog.VersionedTable
import graft.ops.Similarity
import graft.streaming.BqIngest

/** Streaming binary-quantization code maintenance: streamed batches equal
  * the one-shot quantization, replay is a no-op, and the maintainer needs no
  * pre-built state (the quantizer is stateless).
  */
class BqIngestSpec extends AnyFunSuite with SharedSpark {

  import spark.implicits._

  test("streamed vector batches match the one-shot bqTopK; replay re-appends nothing") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val emb = Tables.embeddings(spark, sf)
    val codes = Files.createTempDirectory("bq_stream").toString + "/codes"
    val ckpt = Files.createTempDirectory("bq_stream_ckpt").toString

    // seed the table with the base corpus, stream the rest in two batches
    Similarity.writeCodes(emb.filter(col("vec_id") < 200), codes)
    val later = emb.filter(col("vec_id") >= 200)
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])].collect().toSeq
    val (b1, b2) = later.partition(_._1 < 350)

    val mem = MemoryStream[(Long, Array[Float])]
    val q = BqIngest.start(mem.toDF().toDF("vec_id", "embedding"),
      codes, ckpt,
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime("1 second"))
    try {
      mem.addData(b1: _*)
      q.processAllAvailable()
      mem.addData(b2: _*)
      q.processAllAvailable()
    } finally q.stop()

    // serving off the streamed codes table ≡ the one-shot in-flight funnel
    val fromCodes = Similarity.bqTopKFromCodes(
      Similarity.readCodes(spark, codes), emb,
      numQueries = 10, k = 5, shortlistK = 30)
    val oneShot = Similarity.bqTopK(emb, numQueries = 10, k = 5,
      shortlistK = 30)
    assert(fromCodes.orderBy("query_id", "rank").collect().map(_.toString).toSeq ===
      oneShot.orderBy("query_id", "rank").collect().map(_.toString).toSeq)

    // replaying a committed identity is a no-op; a fresh one appends
    val before = VersionedTable.read(spark, codes).count()
    BqIngest.ingestBatch(b2.toDF("vec_id", "embedding"), codes, ckpt,
      txnId = 1L)
    assert(VersionedTable.read(spark, codes).count() === before)
    BqIngest.ingestBatch(Seq((9999L, Array.fill(emb.select("embedding")
        .as[Array[Float]].head().length)(0.5f))).toDF("vec_id", "embedding"),
      codes, ckpt, txnId = 42L)
    assert(VersionedTable.read(spark, codes).count() === before + 1)
  }

  test("append FS budget: zero opens of any prior code data file") {
    spark.sparkContext.hadoopConfiguration.set("fs.counted.impl",
      classOf[graft.testutil.CountingFileSystem].getName)
    val dir =
      s"counted://${Files.createTempDirectory("bq_count")}/codes"
    val emb = Tables.embeddings(spark, sf)
    Similarity.writeCodes(emb.filter(col("vec_id") < 100), dir) // v=0
    graft.testutil.CountingFileSystem.reset()
    Similarity.appendToCodes(
      emb.filter(col("vec_id") >= 100 && col("vec_id") < 150), dir)
    val priorOpens = graft.testutil.CountingFileSystem.total("open", "_data/v=0")
    assert(priorOpens == 0,
      s"append must not read prior code data files, opened $priorOpens")
  }

  test("bqTopKForQueries: relabeled external queries lead with their own " +
      "vector; the rest equals the internal answer") {
    val emb = Tables.embeddings(spark, sf)
    val codes = Similarity.binaryQuantize(emb)
    // external queries = the first 10 corpus vectors relabeled out of the id
    // space: no self-exclusion, so each query's own vector (Hamming 0,
    // cosine 1.0) must lead, and with the shortlist widened by exactly the
    // self slot the remaining ranks must equal the internal serving answer
    val maxId = emb.agg(max(col("vec_id"))).head().getLong(0)
    val queries = emb.filter(col("vec_id") < 10)
      .select((col("vec_id") + maxId + 1000L).as("vec_id"), col("embedding"))
    val ext = Similarity.bqTopKForQueries(codes, emb, queries,
        k = 6, shortlistK = 31)
      .collect().map(r => (r.getLong(0) - maxId - 1000L, r.getInt(1),
        r.getLong(2), r.getDouble(3)))
    val int = Similarity.bqTopKFromCodes(codes, emb, numQueries = 10,
        k = 5, shortlistK = 30)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getDouble(3)))
    for (qid <- 0L until 10L) {
      val e = ext.filter(_._1 == qid).sortBy(_._2)
      val i = int.filter(_._1 == qid).sortBy(_._2)
      assert(e.head._3 == qid && e.head._4 == 1.0,
        s"query $qid: own vector must lead the external ranking: ${e.head}")
      assert(e.tail.map(t => (t._3, t._4)).toSeq ===
        i.map(t => (t._3, t._4)).toSeq,
        s"query $qid: external ranks 2..k must equal internal 1..k-1")
    }
  }

  test("incremental codes: base embeddings deleted, appended table still " +
      "serves the exact one-shot ranking") {
    val emb = Tables.embeddings(spark, sf)
    val textDir = Files.createTempDirectory("bq_inc_src").toString
    val codes = Files.createTempDirectory("bq_inc").toString + "/codes"

    // quantize the base from a parquet copy, then DELETE that copy: any
    // append or read that rescanned base vectors would throw FileNotFound
    emb.filter(col("vec_id") < 300).write.parquet(s"$textDir/base")
    Similarity.writeCodes(spark.read.parquet(s"$textDir/base"), codes)
    val fs = new org.apache.hadoop.fs.Path(textDir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    assert(fs.delete(new org.apache.hadoop.fs.Path(s"$textDir/base"), true))

    Similarity.appendToCodes(emb.filter(col("vec_id") >= 300), codes)
    val fromCodes = Similarity.bqTopKFromCodes(
      Similarity.readCodes(spark, codes), emb,
      numQueries = 10, k = 5, shortlistK = 30)
    val oneShot = Similarity.bqTopK(emb, numQueries = 10, k = 5,
      shortlistK = 30)
    assert(fromCodes.orderBy("query_id", "rank").collect().map(_.toString).toSeq ===
      oneShot.orderBy("query_id", "rank").collect().map(_.toString).toSeq)
  }

  test("lifecycle hooks fire through the streaming path: compactEvery folds " +
      "and vacuumEvery reclaims per micro-batch, serving stays one-shot-equal") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val emb = Tables.embeddings(spark, sf)
    val codes = s"${Files.createTempDirectory("bq_hooks")}/codes"
    val ckpt = Files.createTempDirectory("bq_hooks_ckpt").toString
    Similarity.writeCodes(emb.filter(col("vec_id") < 200), codes)

    val later = emb.filter(col("vec_id") >= 200)
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])].collect().toSeq
    val (b1, b2) = later.partition(_._1 < 350)
    val mem = MemoryStream[(Long, Array[Float])]
    val q = BqIngest.start(mem.toDF().toDF("vec_id", "embedding"), codes, ckpt,
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime("1 second"),
      compactEvery = 1, vacuumEvery = 1, vacuumRetentionMs = 0L)
    try {
      mem.addData(b1: _*)
      q.processAllAvailable()
      mem.addData(b2: _*)
      q.processAllAvailable()
    } finally q.stop()

    val dirs = new java.io.File(s"$codes/_data")
      .listFiles().count(_.isDirectory)
    assert(dirs < 4, s"vacuum never reclaimed through the stream: $dirs dirs")

    val served = Similarity.bqTopKFromCodes(Similarity.readCodes(spark, codes),
      emb, numQueries = 10, k = 5, shortlistK = 30)
    val oneShot = Similarity.bqTopK(emb, numQueries = 10, k = 5,
      shortlistK = 30)
    assert(served.orderBy("query_id", "rank").collect().map(_.toString).toSeq ===
      oneShot.orderBy("query_id", "rank").collect().map(_.toString).toSeq)
  }
}
