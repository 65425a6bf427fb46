package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.catalog.VersionedTable
import graft.sources.table.GraftTableSink
import graft.testutil.CountingFileSystem

/** The long-lived streaming-CDC table at depth: 100+ micro-batches through the
  * CDC-apply sink (the exact per-batch path a `writeStream` into a graft table
  * runs), then the metadata-cost invariants that make a 10⁵-commit table
  * usable — the shape round 9 flagged as where fixed per-op costs multiply.
  * Costs are COUNTED on the filesystem (MetadataCallsSpec's instrument), so
  * the bounds are wall-clock-independent: every open is an object-store GET
  * at scale, and the whole point of the checkpointed log + write-once parse
  * caches is that per-op reads stay O(checkpoint tail), never O(commits).
  */
class CdcDepthSpec extends AnyFunSuite with SharedSpark {

  test("105 CDC micro-batches: O(tail) log reads per op, answers stay exact") {
    spark.sparkContext.hadoopConfiguration.set("fs.counted.impl",
      classOf[CountingFileSystem].getName)
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_cdc_depth")
    val loc = s"counted://$root/t"
    val sink = new GraftTableSink(loc, partitionBy = Nil,
      explicitTxnApp = Some("cdc-depth-test"), mergeKeys = Seq("id"),
      deleteColumn = Some("_del"), sequenceBy = Some("seq"),
      changeFeed = true)

    val batches = 105
    CountingFileSystem.reset()
    // batch b upserts keys [b, b+4] (values = b), deletes key b-50 when it
    // exists — a steady churn with inserts, updates, and deletes throughout
    (0 until batches).foreach { b =>
      val upserts = (b to b + 4).map(k =>
        (k.toLong, b.toLong, b.toLong * 1000 + k, false))
      val dels =
        if (b >= 50) Seq(((b - 50).toLong, -1L, b.toLong * 1000 - 1, true))
        else Seq.empty
      sink.addBatch(b, (upserts ++ dels).toDF("id", "v", "seq", "_del"))
    }
    val runOpens = CountingFileSystem.total("open", "/_commit_log/")
    // every commit file and checkpoint parses ONCE (write-once cache): the
    // whole 105-batch run reads O(batches) log files, not O(batches²) as a
    // cache-less reader re-reading its tail per op would
    assert(runOpens <= 4L * batches,
      s"105-batch CDC run opened $runOpens commit-log files — the write-once " +
        "parse cache is not holding (O(batches^2) read pattern)")

    val cs = VersionedTable.commits(spark, loc)
    assert(cs.length == batches, s"expected $batches commits, got ${cs.length}")
    // the log is checkpoint-covered: a FRESH reader pays one checkpoint read
    // plus at most CheckpointInterval tail files, regardless of history depth
    val ckptDir = new java.io.File(s"$root/t/_commit_log")
    val newestCkpt = ckptDir.listFiles().map(_.getName)
      .flatMap { n =>
        """_checkpoint\.(\d+)\.jsonl""".r.findFirstMatchIn(n).map(_.group(1).toLong)
      }.maxOption.getOrElse(-1L)
    assert(newestCkpt >= cs.last.version - VersionedTable.CheckpointInterval,
      s"checkpoint lags: newest $newestCkpt vs head ${cs.last.version}")

    // warm steady-state budgets, the per-op cost a monitoring/serving layer
    // pays on this table every few seconds:
    CountingFileSystem.reset()
    val n = VersionedTable.fastCount(spark, loc)
    assert(CountingFileSystem.total("listStatus", "_commit_log") == 1)
    assert(CountingFileSystem.total("open", "/_commit_log/") == 0,
      "warm fastCount must be metadata-cache-only")

    CountingFileSystem.reset()
    VersionedTable.readChanges(spark, loc, cs.last.version - 4, cs.last.version)
      .count()
    assert(CountingFileSystem.total("open", "/_commit_log/") == 0,
      "warm CDF read must not re-read the log")

    CountingFileSystem.reset()
    val head = VersionedTable.read(spark, loc)
    assert(CountingFileSystem.total("listStatus", "_commit_log") == 1)
    assert(CountingFileSystem.total("open", "/_commit_log/") == 0,
      "warm snapshot assembly must not re-read the log")

    // and the answers are EXACT after 105 batches of churn: key k is upserted
    // by batches [k-4, k] and deleted at batch k+50, so keys 0..(batches-51)
    // are gone and the live set is [batches-50, (batches-1)+4]
    val expectedKeys = ((batches - 50).toLong to (batches + 3).toLong)
    assert(n == expectedKeys.length.toLong, s"fastCount $n")
    val got = head.select("id").as[Long].collect().sorted.toSeq
    assert(got == expectedKeys, s"live keys wrong: ${got.take(10)}...")
    // each surviving key carries the value of the LAST batch that upserted it
    val vOfHead = head.filter(col("id") === lit((batches + 3).toLong))
      .select("v").as[Long].head()
    assert(vOfHead == batches - 1L)
  }

  test("post-vacuum depth: floor above the checkpoint base, O(tail) budgets hold") {
    spark.sparkContext.hadoopConfiguration.set("fs.counted.impl",
      classOf[CountingFileSystem].getName)
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_cdc_vac")
    val loc = s"counted://$root/t"
    val sink = new GraftTableSink(loc, partitionBy = Nil,
      explicitTxnApp = Some("cdc-vac-test"), mergeKeys = Seq("id"),
      deleteColumn = Some("_del"), sequenceBy = Some("seq"),
      changeFeed = true)
    val batches = 60
    (0 until batches).foreach { b =>
      val upserts = (b to b + 4).map(k =>
        (k.toLong, b.toLong, b.toLong * 1000 + k, false))
      sink.addBatch(b, upserts.toDF("id", "v", "seq", "_del"))
    }
    // a full-state reset (compact), then vacuum everything it shadowed: the
    // floor lands at the compact version — ABOVE the newest checkpoint base
    val compacted = VersionedTable.compact(spark, loc)
    VersionedTable.vacuum(spark, loc, retentionMs = 0, orphanGraceMs = 0)
    val floor = VersionedTable.minReadableVersion(spark, loc)
    val ckptBase = new java.io.File(s"$root/t/_commit_log").listFiles()
      .map(_.getName).flatMap { n =>
        """_checkpoint\.(\d+)\.jsonl""".r.findFirstMatchIn(n)
          .map(_.group(1).toLong)
      }.maxOption.getOrElse(-1L)
    assert(floor == compacted, s"floor $floor != compact version $compacted")
    assert(floor > ckptBase,
      s"test shape requires floor $floor above the checkpoint base $ckptBase")

    // the table keeps ingesting above the floor
    (batches until batches + 2).foreach { b =>
      val upserts = (b to b + 4).map(k =>
        (k.toLong, b.toLong, b.toLong * 1000 + k, false))
      sink.addBatch(b, upserts.toDF("id", "v", "seq", "_del"))
    }
    val head = VersionedTable.commits(spark, loc).last.version

    // warm budgets ABOVE the floor: one listing per op; the only permitted
    // open is the floor file itself (rename-republished by vacuums, so it is
    // the one log artifact that is NOT write-once-cacheable)
    def floorOnlyOpens(): Unit = {
      val opens = CountingFileSystem.snapshot().collect {
        case (("open", p), n) if p.contains("/_commit_log/") => (p, n)
      }
      assert(opens.forall(_._1.contains("_vacuum_floor")),
        s"post-vacuum op opened non-floor log files: $opens")
    }
    CountingFileSystem.reset()
    val n = VersionedTable.fastCount(spark, loc)
    assert(CountingFileSystem.total("listStatus", "_commit_log") == 1)
    floorOnlyOpens()
    // live set = compact's snapshot + the two post-floor batches' keys
    assert(n == ((batches - 1) + 4 - 0 + 1).toLong + 2L,
      s"fastCount $n after compact+2 batches")

    CountingFileSystem.reset()
    VersionedTable.readChanges(spark, loc, head - 1, head).count()
    floorOnlyOpens()

    CountingFileSystem.reset()
    VersionedTable.read(spark, loc).count()
    assert(CountingFileSystem.total("listStatus", "_commit_log") == 1)
    floorOnlyOpens()

    // BELOW the floor every access path fails loudly with the floor error
    val e1 = intercept[IllegalStateException] {
      VersionedTable.readAsOf(spark, loc, floor - 5)
    }
    assert(e1.getMessage.contains("oldest readable"), e1.getMessage)
    val e2 = intercept[IllegalStateException] {
      VersionedTable.readChanges(spark, loc, floor - 10, floor - 5)
    }
    assert(e2.getMessage.contains("oldest readable"), e2.getMessage)
  }
}
