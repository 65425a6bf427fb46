package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.catalog.VersionedTable
import graft.streaming.NearDupIngest

class NearDupIngestSpec extends AnyFunSuite with SharedSpark {

  import spark.implicits._

  // long distinct documents so MinHash separates them cleanly
  private val docA = "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
    "lambda mu nu xi omicron pi rho sigma tau upsilon phi chi psi omega one two"
  private val docANear = docA.replace("one two", "one three") // near-dup of A
  private val docB = "entirely different content about distributed query engines " +
    "columnar storage vectorized execution adaptive planning shuffle partitions " +
    "broadcast joins predicate pushdown statistics pruning codegen pipelines"
  private val docC = "a third unrelated corpus document mentioning streaming state " +
    "watermarks triggers checkpoints exactly once semantics micro batch replay " +
    "idempotent sinks transactional commit logs versioned tables time travel"

  test("streaming near-dup ingest: novel docs land once, dups are suppressed") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val corpus = Files.createTempDirectory("ndi_corpus").toString
    val index = Files.createTempDirectory("ndi_index").toString
    val ckpt = Files.createTempDirectory("ndi_ckpt").toString

    val mem = MemoryStream[(Long, String)]
    val q = NearDupIngest.start(mem.toDF().toDF("doc_id", "text"),
      corpus, index, ckpt,
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime("1 second"))
    try {
      // batch 1: A and B are novel; A's near-dup arrives IN THE SAME batch and is
      // suppressed intra-batch (canonical = min id)
      mem.addData((1L, docA), (2L, docB), (3L, docANear))
      q.processAllAvailable()
      assert(VersionedTable.read(spark, corpus).select("doc_id")
        .as[Long].collect().toSet === Set(1L, 2L))

      // batch 2: another near-dup of A (cross-batch, caught by the index probe),
      // an exact dup of B, and novel C
      mem.addData((4L, docANear), (5L, docB), (6L, docC))
      q.processAllAvailable()
      val docs = VersionedTable.read(spark, corpus).select("doc_id")
        .as[Long].collect().toSet
      assert(docs === Set(1L, 2L, 6L), s"got $docs")

      // the index holds exactly the admitted docs' signatures
      assert(VersionedTable.read(spark, index).select("doc_id")
        .as[Long].collect().toSet === Set(1L, 2L, 6L))
    } finally q.stop()

    // replaying an already-committed batch through the same identity is a no-op
    val batch = Seq((6L, docC)).toDF("doc_id", "text")
    NearDupIngest.ingestBatch(batch, corpus, index, ckpt, txnId = 1L)
    assert(VersionedTable.read(spark, corpus).count() === 3)
  }

  test("compactTables folds per-batch commits: corpus reads open fewer data " +
      "files, contents unchanged") {
    spark.sparkContext.hadoopConfiguration.set("fs.counted.impl",
      classOf[graft.testutil.CountingFileSystem].getName)
    val root = s"counted://${Files.createTempDirectory("ndi_compact")}"
    val corpus = s"$root/corpus"
    val index = s"$root/index"
    // fully disjoint vocabularies per doc — no accidental near-dup suppression
    def batch(r: Range) =
      r.map(i => (i.toLong,
        (0 until 10).map(j => s"w${i}x$j").mkString(" "))).toDF("doc_id", "text")
    NearDupIngest.ingestBatch(batch(0 until 6), corpus, index, "ck", 0L)
    NearDupIngest.ingestBatch(batch(6 until 12), corpus, index, "ck", 1L)
    NearDupIngest.ingestBatch(batch(12 until 18), corpus, index, "ck", 2L)

    def readAll(): (Seq[String], Long) = {
      graft.testutil.CountingFileSystem.reset()
      val rows = VersionedTable.read(spark, corpus)
        .orderBy("doc_id").collect().map(_.toString).toSeq
      (rows, graft.testutil.CountingFileSystem.total("open", "/corpus/_data"))
    }
    val (before, opensBefore) = readAll()
    NearDupIngest.compactTables(spark, corpus, index)
    val (after, opensAfter) = readAll()
    assert(after === before, "compaction must not change the corpus")
    assert(opensAfter < opensBefore,
      s"compaction must reduce corpus data opens: $opensBefore -> $opensAfter")
    // the probe path still works against the compacted index: a replayed
    // batch of known near-dups admits nothing new
    val n0 = VersionedTable.read(spark, corpus).count()
    NearDupIngest.ingestBatch(batch(0 until 6), corpus, index, "ck2", 9L)
    assert(VersionedTable.read(spark, corpus).count() === n0)
  }
}
