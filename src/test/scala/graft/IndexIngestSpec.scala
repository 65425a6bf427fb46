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


  test("compaction folds per-batch commits: serving opens fewer postings data " +
      "files, answers unchanged, term pruning still pushed") {
    spark.sparkContext.hadoopConfiguration.set("fs.counted.impl",
      classOf[graft.testutil.CountingFileSystem].getName)
    val dir = s"counted://${Files.createTempDirectory("bm25_compact")}/idx"
    def batch(r: Range, salt: String) =
      r.map(i => (i.toLong, s"alpha beta w$i $salt hash join"))
        .toDF("doc_id", "text")
    Bm25.writeIndex(batch(0 until 40, "base"), dir)
    IndexIngest.ingestBatch(batch(40 until 60, "b1"), dir, "ckpt", 1L)
    IndexIngest.ingestBatch(batch(60 until 80, "b2"), dir, "ckpt", 2L)

    def serve(): (Seq[String], Long, String) = {
      graft.testutil.CountingFileSystem.reset()
      val df = Bm25.topKFromIndex(Bm25.readIndexFrom(spark, dir),
        Seq("hash", "join"), 10)
      val rows = df.collect().map(_.toString).toSeq
      val plan = df.queryExecution.executedPlan.toString
      (rows, graft.testutil.CountingFileSystem.total("open", "/postings/_data"),
        plan)
    }
    val (before, opensBefore, _) = serve()
    IndexIngest.compactIndex(spark, dir)
    val (after, opensAfter, planAfter) = serve()
    assert(after === before, "compaction must not change serving answers")
    assert(opensAfter < opensBefore,
      s"compaction must reduce postings data opens: $opensBefore -> $opensAfter")
    // the compacted layout still takes the pushed term predicate
    val scans = planAfter.linesIterator
      .filter(l => l.contains("FileScan") && l.contains("/postings")).toSeq
    assert(scans.nonEmpty && scans.forall(l =>
      l.contains("In(term") || l.contains("EqualTo(term")),
      s"term pruning lost after compaction:\n${scans.mkString("\n")}")

    // the stats table FOLDED to one row (not just fewer files), and the
    // maintainer keeps appending per-batch rows on top of the folded one —
    // serving equals a from-scratch rebuild of all four batches
    assert(graft.catalog.VersionedTable.read(spark, s"$dir/stats").count() === 1)
    IndexIngest.ingestBatch(batch(80 until 100, "b3"), dir, "ckpt", 3L)
    val served = Bm25.topKFromIndex(Bm25.readIndexFrom(spark, dir),
      Seq("hash", "join"), 10).collect().map(_.toString).toSeq
    val rebuilt = Bm25.topKFromIndex(
      Bm25.buildIndex(batch(0 until 40, "base")
        .unionAll(batch(40 until 60, "b1")).unionAll(batch(60 until 80, "b2"))
        .unionAll(batch(80 until 100, "b3"))),
      Seq("hash", "join"), 10).collect().map(_.toString).toSeq
    assert(served === rebuilt,
      "post-fold appends must keep serving exactly rebuild-equal")
  }

  test("lifecycle hooks fire through the streaming path: compactEvery folds " +
      "and vacuumEvery reclaims per micro-batch, serving stays rebuild-equal") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val idx = s"${Files.createTempDirectory("bm25_hooks")}/idx"
    val ckpt = Files.createTempDirectory("bm25_hooks_ckpt").toString
    val mem = MemoryStream[(Long, String)]
    val q = IndexIngest.start(mem.toDF().toDF("doc_id", "text"), idx, ckpt,
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime("1 second"),
      compactEvery = 1, vacuumEvery = 1, vacuumRetentionMs = 0L)
    try {
      mem.addData(d1, d2)
      q.processAllAvailable()
      mem.addData(d3, d4)
      q.processAllAvailable()
    } finally q.stop()

    // compactEvery folded the stats to ONE row after every micro-batch
    assert(graft.catalog.VersionedTable.read(spark, s"$idx/stats").count() === 1)
    // vacuumEvery reclaimed the shadowed commits: far fewer postings data
    // dirs on disk than commits written (2 appends + 2 compacts = 4)
    val dirs = new java.io.File(s"$idx/postings/_data")
      .listFiles().count(_.isDirectory)
    assert(dirs < 4, s"vacuum never reclaimed through the stream: $dirs dirs")
    // and the maintained index still serves exactly the from-scratch answer
    val streamed = Bm25.readIndexFrom(spark, idx)
    val rebuilt = Bm25.buildIndex(Seq(d1, d2, d3, d4).toDF("doc_id", "text"))
    val terms = Seq("hash", "vectors")
    assert(Bm25.topKFromIndex(streamed, terms, 10).collect().map(_.toString).toSeq ===
      Bm25.topKFromIndex(rebuilt, terms, 10).collect().map(_.toString).toSeq)
  }

  test("vacuumIndex reclaims pre-compact storage: data dirs drop, serving " +
      "unchanged, time travel past the window dies — storage stops growing " +
      "with stream lifetime") {
    val dir = s"${Files.createTempDirectory("bm25_vacuum")}/idx"
    def batch(r: Range, salt: String) =
      r.map(i => (i.toLong, s"alpha w$i $salt hash join")).toDF("doc_id", "text")
    Bm25.writeIndex(batch(0 until 40, "base"), dir)
    IndexIngest.ingestBatch(batch(40 until 60, "b1"), dir, "ckpt", 1L)
    IndexIngest.ingestBatch(batch(60 until 80, "b2"), dir, "ckpt", 2L)
    val terms = Seq("hash", "join")
    def serve() = Bm25.topKFromIndex(Bm25.readIndexFrom(spark, dir), terms, 10)
      .collect().map(_.toString).toSeq
    val before = serve()

    IndexIngest.compactIndex(spark, dir)
    def dataDirs(artifact: String): Int =
      new java.io.File(s"$dir/$artifact/_data").listFiles().count(_.isDirectory)
    val preVacuum = dataDirs("postings")
    // compaction SHADOWS the per-batch commits but leaves their files for
    // time travel — without vacuum, storage grows with stream lifetime
    assert(preVacuum > 1, s"expected shadowed pre-compact dirs, got $preVacuum")

    // retention 0: everything before the newest full-state commit reclaims
    val reclaimed = IndexIngest.vacuumIndex(spark, dir, retentionMs = 0L)
    assert(reclaimed.nonEmpty, "vacuum reclaimed nothing")
    assert(dataDirs("postings") < preVacuum,
      s"postings data dirs did not drop: $preVacuum -> ${dataDirs("postings")}")

    // current-state serving is untouched; pre-compact time travel is gone
    assert(serve() === before, "vacuum must not change current-state serving")
    intercept[Exception] {
      graft.catalog.VersionedTable.readAsOf(spark, s"$dir/postings", 0)
        .collect()
    }
  }

  test("stats fold is CAS-guarded: a rival append landing between the fold's " +
      "read and its overwrite is detected and kept — no (n, sumdl) row lost") {
    val dir = s"${Files.createTempDirectory("bm25_fold_race")}/idx"
    def batch(r: Range, salt: String) =
      r.map(i => (i.toLong, s"alpha w$i $salt hash")).toDF("doc_id", "text")
    Bm25.writeIndex(batch(0 until 30, "base"), dir)
    IndexIngest.ingestBatch(batch(30 until 50, "b1"), dir, "ckpt", 1L)

    // expected corpus totals INCLUDING the rival batch that lands mid-fold
    val expected = Bm25
      .buildIndex(batch(0 until 30, "base").unionAll(batch(30 until 50, "b1"))
        .unionAll(batch(50 until 70, "late")))
      .stats.collect().map(_.toString).toSeq

    // inject the rival append between the fold's pinned-snapshot read and its
    // CAS overwrite — exactly the honor-system window a public ingestBatch
    // backfill can hit; fire once so the retry converges
    var fired = false
    IndexIngest.foldStatsBeforeCommit = () => {
      if (!fired) {
        fired = true
        IndexIngest.ingestBatch(batch(50 until 70, "late"), dir, "ckpt", 2L)
      }
    }
    try IndexIngest.compactIndex(spark, dir)
    finally IndexIngest.foldStatsBeforeCommit = () => ()
    assert(fired, "test hook never fired — the interleave did not happen")

    // the old read-then-overwrite lost the late batch's (n, sumdl) row here,
    // silently skewing avgdl for every subsequent score; the CAS retry folds
    // it in — totals equal the three-batch rebuild
    val folded = Bm25.readIndexFrom(spark, dir).stats
      .collect().map(_.toString).toSeq
    assert(folded === expected,
      s"fold lost the rival append's stats row: $folded vs $expected")
  }
}
