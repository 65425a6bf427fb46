package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.catalog.VersionedTable

/** Schema-in-log (Delta parity): commits record their staged schema, so
  * assembling a snapshot's PLAN launches zero Spark jobs — the footer-merge
  * job `mergeSchema` inference costs is gone from every read. Pinned here the
  * way MetadataCallsSpec pins filesystem calls, because at 100 TB schema
  * inference is O(files) remote footer reads per query.
  */
class SchemaFromLogSpec extends AnyFunSuite with SharedSpark {

  private def countJobs(body: => Unit): Int = {
    org.apache.spark.graft.TestBus.drain(spark.sparkContext)
    val n = new java.util.concurrent.atomic.AtomicInteger(0)
    val l = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        n.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(l)
    try {
      body
      org.apache.spark.graft.TestBus.drain(spark.sparkContext)
      n.get()
    } finally spark.sparkContext.removeSparkListener(l)
  }

  test("snapshot plan assembly launches zero jobs; schema unions additively") {
    import spark.implicits._
    val loc = java.nio.file.Files.createTempDirectory("graft_sfl").toString + "/t"
    VersionedTable.write((1 to 50).map(i => (i.toLong, s"v$i")).toDF("id", "v"),
      loc, "overwrite")
    VersionedTable.write((51 to 60).map(i => (i.toLong, s"v$i")).toDF("id", "v"),
      loc, "append")
    // an append that ADDS a column: the log union must widen the read schema
    VersionedTable.write(
      (61 to 70).map(i => (i.toLong, s"v$i", i * 2.0)).toDF("id", "v", "score"),
      loc, "append")

    val jobs = countJobs {
      val df = VersionedTable.read(spark, loc) // plan only, no action
      assert(df.columns.toSeq == Seq("id", "v", "score"))
    }
    assert(jobs == 0,
      s"plan assembly must read its schema from the log, not run $jobs inference job(s)")
    // and the plan is RIGHT: rows that predate `score` surface NULL
    val head = VersionedTable.read(spark, loc)
    assert(head.count() == 70)
    assert(head.filter(col("score").isNull).count() == 60)
    assert(head.filter(col("id") === 65).select("score").head().getDouble(0) == 130.0)

    // time travel: same zero-job budget at a historical version
    val tt = countJobs {
      val df = VersionedTable.readAsOf(spark, loc, 0)
      assert(df.columns.toSeq == Seq("id", "v"))
    }
    assert(tt == 0, s"time-travel plan assembly ran $tt job(s)")
  }

  test("legacy commits without a recorded schema fall back to inference") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_sfl_legacy")
    val loc = s"$root/t"
    VersionedTable.write((1 to 20).map(i => (i.toLong, s"x$i")).toDF("id", "v"),
      loc, "overwrite")
    // strip the schema field from the commit body — a pre-upgrade log
    val logFile = new java.io.File(s"$loc/_commit_log/0.json")
    val body = new String(java.nio.file.Files.readAllBytes(logFile.toPath), "UTF-8")
    val stripped = body.replaceAll(""""schema":"((?:[^"\\]|\\.)*)",""", "")
    assert(stripped != body, "expected a schema field to strip")
    java.nio.file.Files.write(logFile.toPath, stripped.getBytes("UTF-8"))

    // the read still answers correctly (mergeSchema inference path)
    val df = VersionedTable.read(spark, loc)
    assert(df.columns.toSeq == Seq("id", "v"))
    assert(df.count() == 20)
    // and a NEW append records its schema; the mixed log still falls back
    // (one legacy commit poisons the union, by design — conservative)
    VersionedTable.write((21 to 25).map(i => (i.toLong, s"x$i")).toDF("id", "v"),
      loc, "append")
    assert(VersionedTable.read(spark, loc).count() == 25)
  }

  test("concurrent writers: every commit records a non-empty schema") {
    import spark.implicits._
    // the staged schema rides the staging tuple (a plain value handoff), so
    // no amount of concurrent staging — or cache pressure anywhere — can wipe
    // it between stageData and claimCommit; racers that lose a claim retry
    // with their schema intact
    val loc = java.nio.file.Files.createTempDirectory("graft_sfl_conc")
      .toString + "/t"
    VersionedTable.write(Seq((0L, "seed")).toDF("id", "v"), loc, "overwrite")
    val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
    try {
      val futures = (1 to 16).map { i =>
        pool.submit(new Runnable {
          override def run(): Unit =
            VersionedTable.write(Seq((i.toLong, s"w$i")).toDF("id", "v"),
              loc, "append")
        })
      }
      futures.foreach(_.get(120, java.util.concurrent.TimeUnit.SECONDS))
    } finally pool.shutdown()

    val logDir = new java.io.File(s"$loc/_commit_log")
    val commitFiles = logDir.listFiles()
      .filter(f => f.getName.endsWith(".json") &&
        f.getName.stripSuffix(".json").forall(_.isDigit))
    assert(commitFiles.length == 17, s"expected 17 commits, got ${commitFiles.length}")
    commitFiles.foreach { f =>
      val body = new String(java.nio.file.Files.readAllBytes(f.toPath), "UTF-8")
      assert(body.contains(""""schema":"{"""),
        s"commit ${f.getName} lost its staged schema: $body")
    }
    // and the zero-job fast path holds across the whole concurrent history
    val jobs = countJobs {
      assert(VersionedTable.read(spark, loc).columns.toSeq == Seq("id", "v"))
    }
    assert(jobs == 0, s"concurrent history broke the log-schema path: $jobs job(s)")
  }

  test("a WIDE schema's multi-KB escaped commit body parses without stack overflow") {
    // the old escaped-string field regex recursed once per character of the
    // escaped schema_json and overflowed the thread stack past a few KB —
    // which a table this wide crosses by 50x; the iterative reader must not
    val loc = java.nio.file.Files.createTempDirectory("graft_wide_schema").toString
    val wide = spark.range(1).select(
      col("id") +: (0 until 3000).map(i => lit(i).as(s"c$i")): _*)
    VersionedTable.write(wide, loc, "overwrite")
    VersionedTable.write(wide, loc, "append")
    val back = VersionedTable.read(spark, loc)
    assert(back.columns.length === 3001)
    assert(back.count() === 2)
    // history parses the same commit bodies driver-side
    assert(VersionedTable.history(spark, loc).count() === 2)
  }
}
