package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Bm25
import graft.streaming.IndexIngest

/** Streaming BM25 index maintenance: per-micro-batch exactly-once appends,
  * serving equality with a from-scratch rebuild, replay no-op.
  */
class IndexIngestSpec extends AnyFunSuite with SharedSpark {

  import spark.implicits._

  private val d1 = (1L, "spark shuffles hash join vectors")
  private val d2 = (2L, "columnar vectors and hash maps")
  private val d3 = (3L, "streaming joins with watermarks")
  private val d4 = (4L, "hash hash hash everywhere")

  test("streaming index maintenance: batches land exactly once; " +
      "serving matches a from-scratch rebuild; replay is a no-op") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val idx = Files.createTempDirectory("bm25_stream_idx").toString
    val ckpt = Files.createTempDirectory("bm25_stream_ckpt").toString

    val mem = MemoryStream[(Long, String)]
    val q = IndexIngest.start(mem.toDF().toDF("doc_id", "text"), idx, ckpt,
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime("1 second"))
    try {
      mem.addData(d1, d2)
      q.processAllAvailable()
      mem.addData(d3, d4)
      q.processAllAvailable()
    } finally q.stop()

    // the streamed index answers EXACTLY what a one-shot build answers
    val streamed = Bm25.readIndexFrom(spark, idx)
    val rebuilt = Bm25.buildIndex(Seq(d1, d2, d3, d4).toDF("doc_id", "text"))
    val terms = Seq("hash", "vectors")
    assert(Bm25.topKFromIndex(streamed, terms, 10).collect().map(_.toString).toSeq ===
      Bm25.topKFromIndex(rebuilt, terms, 10).collect().map(_.toString).toSeq)
    assert(streamed.stats.collect().map(_.toString).toSeq ===
      rebuilt.stats.collect().map(_.toString).toSeq)
    assert(streamed.docLengths.orderBy("doc_id").collect().map(_.toString).toSeq ===
      rebuilt.docLengths.orderBy("doc_id").collect().map(_.toString).toSeq)

    // replaying an already-committed batch through the same identity keys
    // re-appends NOTHING to any of the three tables
    val before = (
      graft.catalog.VersionedTable.read(spark, s"$idx/postings").count(),
      graft.catalog.VersionedTable.read(spark, s"$idx/doclen").count(),
      graft.catalog.VersionedTable.read(spark, s"$idx/stats").count())
    IndexIngest.ingestBatch(Seq(d3, d4).toDF("doc_id", "text"), idx, ckpt,
      txnId = 1L)
    val after = (
      graft.catalog.VersionedTable.read(spark, s"$idx/postings").count(),
      graft.catalog.VersionedTable.read(spark, s"$idx/doclen").count(),
      graft.catalog.VersionedTable.read(spark, s"$idx/stats").count())
    assert(after === before, s"replay must be a no-op: $before -> $after")

    // a FRESH identity does append (it is a genuine new batch, not a replay)
    IndexIngest.ingestBatch(Seq((5L, "new arrival")).toDF("doc_id", "text"),
      idx, ckpt, txnId = 99L)
    assert(graft.catalog.VersionedTable.read(spark, s"$idx/doclen").count() ===
      before._2 + 1)
  }
}
