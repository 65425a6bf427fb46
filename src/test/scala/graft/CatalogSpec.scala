package graft

import java.nio.file.Files

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.catalog.{MetadataScanner, VersionedTable}

class CatalogSpec extends AnyFunSuite with SharedSpark {

  test("scan: per-table file stats match the filesystem") {
    val stats = MetadataScanner.scan(spark,
      Map("orders" -> s"$sf/orders.parquet", "region" -> s"$sf/region.parquet"))
    assert(stats.map(_.table_name) === Seq("orders", "region"))
    val orders = stats.head
    assert(orders.n_files === 1)
    assert(orders.total_bytes === new java.io.File(s"$sf/orders.parquet").length())
    assert(orders.max_modified_ms > 0)
  }

  test("register: catalog table is queryable via SQL") {
    MetadataScanner.registerParquetTable(spark, "graft_test", "region_t",
      s"$sf/region.parquet")
    val n = spark.sql("SELECT COUNT(*) FROM graft_test.region_t").first().getLong(0)
    assert(n === 5)
    assert(spark.catalog.tableExists("graft_test.region_t"))
  }

  test("ingest log: append-only history facsimile") {
    val loc = Files.createTempDirectory("ingest_log").toString
    MetadataScanner.appendIngestLog(spark, loc, "WRITE", 100)
    MetadataScanner.appendIngestLog(spark, loc, "OVERWRITE", 250)
    val log = MetadataScanner.readIngestLog(spark, loc)
    assert(log.count() === 2)
    assert(log.columns.toSet === Set("timestamp", "operation", "row_count"))
  }

  test("versioned table: reading version N-1 after an overwrite sees the old rows") {
    import spark.implicits._
    val loc = Files.createTempDirectory("vt_overwrite").toString
    val v0 = VersionedTable.write(
      Seq((1L, "old"), (2L, "old")).toDF("id", "tag"), loc, "overwrite")
    val v1 = VersionedTable.write(
      Seq((10L, "new")).toDF("id", "tag"), loc, "overwrite")
    assert(v0 === 0L && v1 === 1L)
    // latest = the overwrite; as-of v0 = exactly the pre-overwrite rows
    assert(VersionedTable.read(spark, loc).count() === 1)
    val old = VersionedTable.readAsOf(spark, loc, v0)
      .orderBy("id").as[(Long, String)].collect()
    assert(old.toSeq === Seq((1L, "old"), (2L, "old")))
  }

  test("versioned table: appends accumulate, overwrite resets the visible state") {
    import spark.implicits._
    val loc = Files.createTempDirectory("vt_append").toString
    VersionedTable.write(Seq(1L).toDF("id"), loc, "overwrite")   // v0
    VersionedTable.write(Seq(2L).toDF("id"), loc, "append")      // v1
    VersionedTable.write(Seq(3L).toDF("id"), loc, "append")      // v2
    VersionedTable.write(Seq(9L).toDF("id"), loc, "overwrite")   // v3
    assert(VersionedTable.readAsOf(spark, loc, 0).count() === 1)
    assert(VersionedTable.readAsOf(spark, loc, 1).count() === 2)
    assert(VersionedTable.readAsOf(spark, loc, 2)
      .orderBy("id").as[Long].collect().toSeq === Seq(1L, 2L, 3L))
    assert(VersionedTable.read(spark, loc).as[Long].collect().toSeq === Seq(9L))
    intercept[IllegalArgumentException] {
      VersionedTable.readAsOf(spark, loc, 7)
    }
  }

  test("versioned table: history lists commits newest-first with row counts") {
    import spark.implicits._
    val loc = Files.createTempDirectory("vt_history").toString
    VersionedTable.write(Seq(1L, 2L).toDF("id"), loc, "overwrite")
    VersionedTable.write(Seq(3L).toDF("id"), loc, "append")
    val h = VersionedTable.history(spark, loc).collect()
    assert(h.map(_.getAs[Long]("version")).toSeq === Seq(1L, 0L))
    assert(h.map(_.getAs[String]("operation")).toSeq === Seq("append", "overwrite"))
    assert(h.map(_.getAs[Long]("row_count")).toSeq === Seq(1L, 2L))
  }

  test("versioned table: a data dir without a log entry is invisible to readers") {
    import spark.implicits._
    val loc = Files.createTempDirectory("vt_orphan").toString
    VersionedTable.write(Seq(1L).toDF("id"), loc, "overwrite")
    // simulate a crash between data write and commit: data lands, log never does
    Seq(99L).toDF("id").write.parquet(s"$loc/_data/v=1")
    assert(VersionedTable.read(spark, loc).as[Long].collect().toSeq === Seq(1L))
    assert(VersionedTable.commits(spark, loc).map(_.version) === Seq(0L))
    // the next committed write claims version 1; its data lands in its own unique
    // dir, so the stranded orphan can never shadow or block it
    val v = VersionedTable.write(Seq(2L).toDF("id"), loc, "append")
    assert(v === 1L)
    assert(VersionedTable.read(spark, loc).orderBy("id")
      .as[Long].collect().toSeq === Seq(1L, 2L))
  }

  test("versioned table: string min/max stats; readPrunedString skips commits") {
    import spark.implicits._
    val loc = Files.createTempDirectory("vt_sskipping").toString
    // three appends with disjoint month prefixes — a date-range probe needs one
    def batch(m: String, n: Int) =
      (1 to n).map(d => (f"2024-$m%s-$d%02d", d.toLong)).toDF("day", "v")
    VersionedTable.write(batch("01", 20), loc, "overwrite")
    VersionedTable.write(batch("02", 20), loc, "append")
    VersionedTable.write(batch("03", 20), loc, "append")
    val cs = VersionedTable.commits(spark, loc)
    assert(cs.map(_.sstats("day")) === Seq(
      ("2024-01-01", "2024-01-20"), ("2024-02-01", "2024-02-20"),
      ("2024-03-01", "2024-03-20")))
    // the log round-trips through parse (stats survive checkpoint-style reread)
    val pruned = VersionedTable.readPrunedString(spark, loc, "day",
      "2024-02-05", "2024-02-10")
    assert(pruned.orderBy("day").select("day").as[String].collect().toSeq ===
      (5 to 10).map(d => f"2024-02-$d%02d"))
    val dirs = pruned.inputFiles.map(f =>
      f.split("/_data/")(1).split("/")(0)).distinct.toSeq
    assert(dirs === Seq(cs(1).data_dir), s"scanned $dirs, wanted ${cs(1).data_dir}")
    // point lookup prunes to one commit too
    assert(VersionedTable.readPrunedString(spark, loc, "day",
      "2024-03-07", "2024-03-07").count() === 1)
    // out-of-range: zero rows, still correct
    assert(VersionedTable.readPrunedString(spark, loc, "day",
      "2025-01-01", "2025-12-31").count() === 0)
    // a batch with an UNSAFE value (embedded quote) records no stats for the
    // column — conservative: it is scanned by every later probe, never skipped
    VersionedTable.write(Seq(("bad\"quote", 99L)).toDF("day", "v"), loc, "append")
    val cs2 = VersionedTable.commits(spark, loc)
    assert(!cs2.last.sstats.contains("day"))
    assert(VersionedTable.readPrunedString(spark, loc, "day",
      "bad", "bae").count() === 1) // stat-less commit scanned, predicate applies
  }

  test("versioned table: commits carry numeric min/max stats; readPruned skips commits") {
    import spark.implicits._
    val loc = Files.createTempDirectory("vt_skipping").toString
    // three appends with disjoint id ranges — an id-range query can only need one
    VersionedTable.write(spark.range(1, 101).toDF("id"), loc, "overwrite")
    VersionedTable.write(spark.range(101, 201).toDF("id"), loc, "append")
    VersionedTable.write(spark.range(201, 301).toDF("id"), loc, "append")

    val cs = VersionedTable.commits(spark, loc)
    assert(cs.map(_.stats("id")) === Seq((1.0, 100.0), (101.0, 200.0), (201.0, 300.0)))

    val pruned = VersionedTable.readPruned(spark, loc, "id", 150, 160)
    assert(pruned.orderBy("id").as[Long].collect().toSeq === (150L to 160L))
    // only the middle commit's dir is in the scan — the other two never list files
    val dirs = pruned.inputFiles.map(f =>
      f.split("/_data/")(1).split("/")(0)).distinct.toSeq
    assert(dirs === Seq(cs(1).data_dir), s"scanned $dirs, wanted ${cs(1).data_dir}")

    // no commit can match → zero rows, still correct
    assert(VersionedTable.readPruned(spark, loc, "id", 1000, 2000).count() === 0)
    // a column without stats is scanned conservatively but filters correctly
    assert(VersionedTable.readPruned(spark, loc, "id", 1, 300).count() === 300)
  }

  test("versioned table: checkpoint consolidates the log; reads and writes continue") {
    import spark.implicits._
    val loc = Files.createTempDirectory("vt_checkpoint").toString
    // 12 commits: the auto-checkpoint at CheckpointInterval=10 fires at version 9
    VersionedTable.write(spark.range(0, 10).toDF("id"), loc, "overwrite")
    (1 to 11).foreach(i =>
      VersionedTable.write(spark.range(i * 10L, i * 10L + 10).toDF("id"), loc, "append"))

    val ckpts = new java.io.File(s"$loc/_commit_log").listFiles()
      .map(_.getName).filter(_.startsWith("_checkpoint."))
    assert(ckpts.toSeq === Seq("_checkpoint.9.jsonl"))

    // the full log resolves identically through the checkpoint: 12 commits, stats intact
    val cs = VersionedTable.commits(spark, loc)
    assert(cs.map(_.version) === (0L to 11L))
    assert(cs.head.stats("id") === ((0.0, 9.0)))
    assert(VersionedTable.read(spark, loc).count() === 120)
    assert(VersionedTable.readAsOf(spark, loc, 4).count() === 50)

    // vacuum drops the per-commit files the checkpoint covers; nothing breaks
    val removed = VersionedTable.vacuum(spark, loc)
    assert(removed.exists(_.endsWith("/0.json")) && removed.exists(_.endsWith("/9.json")))
    assert(!removed.exists(_.endsWith("/10.json")), "uncovered tail must survive")
    assert(VersionedTable.commits(spark, loc).map(_.version) === (0L to 11L))
    assert(VersionedTable.readAsOf(spark, loc, 4).count() === 50)

    // the next write claims version 12 — resolved THROUGH the checkpoint
    assert(VersionedTable.write(spark.range(120, 130).toDF("id"), loc, "append") === 12L)

    // explicit checkpoint at the new head; commits() prefers the newest one
    assert(VersionedTable.checkpoint(spark, loc) === Some(12L))
    assert(VersionedTable.commits(spark, loc).map(_.version) === (0L to 12L))
    assert(VersionedTable.read(spark, loc).as[Long].collect().toSet === (0L until 130L).toSet)

    // a later vacuum drops the SUPERSEDED checkpoint and the newly covered tail
    val removed2 = VersionedTable.vacuum(spark, loc)
    assert(removed2.exists(_.endsWith("_checkpoint.9.jsonl")))
    assert(removed2.exists(_.endsWith("/12.json")))
    assert(VersionedTable.commits(spark, loc).map(_.version) === (0L to 12L))
    val logFiles = new java.io.File(s"$loc/_commit_log").listFiles().map(_.getName)
    assert(logFiles.count(_.startsWith("_checkpoint.")) === 1)
  }

  test("versioned table: vacuum removes orphan data dirs but keeps committed reads") {
    import spark.implicits._
    val loc = Files.createTempDirectory("vt_vacuum_orphan").toString
    val v0 = VersionedTable.write(Seq(1L).toDF("id"), loc, "overwrite")
    VersionedTable.write(Seq(2L).toDF("id"), loc, "append")
    // crash-orphan: data with no commit
    Seq(99L).toDF("id").write.parquet(s"$loc/_data/d-orphan")
    val deleted = VersionedTable.vacuum(spark, loc, orphanGraceMs = 0L)
    assert(deleted.size === 1 && deleted.head.endsWith("d-orphan"))
    assert(!new java.io.File(s"$loc/_data/d-orphan").exists())
    // everything inside retention still reads, including as-of the older version
    assert(VersionedTable.readAsOf(spark, loc, v0).as[Long].collect().toSeq === Seq(1L))
    assert(VersionedTable.read(spark, loc).orderBy("id")
      .as[Long].collect().toSeq === Seq(1L, 2L))
  }

  test("versioned table: vacuum with zero retention drops pre-overwrite data, keeps history") {
    import spark.implicits._
    val loc = Files.createTempDirectory("vt_vacuum_retention").toString
    VersionedTable.write(Seq(1L).toDF("id"), loc, "overwrite")   // v0
    VersionedTable.write(Seq(2L).toDF("id"), loc, "append")      // v1
    VersionedTable.write(Seq(9L).toDF("id"), loc, "overwrite")   // v2 supersedes v0+v1
    // a live writer's not-yet-committed dir must survive the default orphan grace
    Seq(5L).toDF("id").write.parquet(s"$loc/_data/d-inflight")
    val deleted = VersionedTable.vacuum(spark, loc, retentionMs = 0L)
    assert(deleted.size === 2)
    assert(new java.io.File(s"$loc/_data/d-inflight").exists())
    // current state intact; full lineage still in history; old versions unreadable
    assert(VersionedTable.read(spark, loc).as[Long].collect().toSeq === Seq(9L))
    assert(VersionedTable.history(spark, loc).count() === 3)
    intercept[Exception] { VersionedTable.readAsOf(spark, loc, 0).collect() }
  }

  test("versioned table: hive-partitioned commits keep partition columns and pruning") {
    import spark.implicits._
    val loc = Files.createTempDirectory("vt_part").toString
    VersionedTable.write(Seq((1L, "2024-01-01"), (2L, "2024-01-02")).toDF("id", "d"),
      loc, "overwrite", partitionBy = Seq("d"))
    VersionedTable.write(Seq((3L, "2024-01-02")).toDF("id", "d"),
      loc, "append", partitionBy = Seq("d"))
    val t = VersionedTable.read(spark, loc)
    assert(t.columns.toSet === Set("id", "d"))
    assert(t.orderBy("id").as[(Long, String)].collect().toSeq ===
      Seq((1L, "2024-01-01"), (2L, "2024-01-02"), (3L, "2024-01-02")))
    // partition filter prunes: only d=2024-01-02 dirs of both commits are scanned
    val pruned = t.filter(col("d") === "2024-01-02")
    assert(pruned.as[(Long, String)].collect().map(_._1).sorted.toSeq === Seq(2L, 3L))
    val scans = pruned.queryExecution.executedPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }
    assert(scans.nonEmpty)
    // the filter must prune EVERY commit's branch, not just one
    assert(scans.forall(_.metadata("PartitionFilters").contains("2024-01-02")))
  }

  test("versioned table: compact rewrites the live set into one full-state commit") {
    import spark.implicits._
    val loc = Files.createTempDirectory("vt_compact").toString
    VersionedTable.write(Seq((1L, 10L)).toDF("id", "v"), loc, "overwrite")
    VersionedTable.write(Seq((2L, 20L)).toDF("id", "v"), loc, "append")
    VersionedTable.write(Seq((3L, 30L)).toDF("id", "v"), loc, "append")
    val before = VersionedTable.read(spark, loc).orderBy("id").collect()
    val cv = VersionedTable.compact(spark, loc, numFiles = 1)
    assert(cv === 3L)
    assert(VersionedTable.commits(spark, loc).last.operation === "compact")
    // same rows, now served from a single commit dir
    assert(VersionedTable.read(spark, loc).orderBy("id").collect() === before)
    assert(VersionedTable.read(spark, loc).inputFiles.length === 1)
    // pre-compact versions still time-travel until vacuumed
    assert(VersionedTable.readAsOf(spark, loc, 1).count() === 2)
    // an append on top of the compaction reads compact + delta, not the old chain
    VersionedTable.write(Seq((4L, 40L)).toDF("id", "v"), loc, "append")
    assert(VersionedTable.read(spark, loc).as[(Long, Long)].collect().sorted.toSeq ===
      Seq((1L, 10L), (2L, 20L), (3L, 30L), (4L, 40L)))
  }

  test("versioned table: merge upserts, inserts, and deletes in one commit") {
    import spark.implicits._
    val loc = Files.createTempDirectory("vt_merge").toString
    VersionedTable.write(
      Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v"), loc, "overwrite")
    // update id=2, insert id=4, delete id=3
    val changes = Seq((2L, "B", false), (4L, "d", false), (3L, "", true))
      .toDF("id", "v", "is_delete")
    val mv = VersionedTable.merge(spark, loc, changes, Seq("id"),
      deleteCol = Some("is_delete"))
    assert(mv === 1L)
    assert(VersionedTable.commits(spark, loc).last.operation === "merge")
    assert(VersionedTable.read(spark, loc).as[(Long, String)].collect().sorted.toSeq
      === Seq((1L, "a"), (2L, "B"), (4L, "d")))
    // the pre-merge snapshot still time-travels
    assert(VersionedTable.readAsOf(spark, loc, 0).as[(Long, String)]
      .collect().sorted.toSeq === Seq((1L, "a"), (2L, "b"), (3L, "c")))
    // a second merge with no deleteCol is a pure upsert
    VersionedTable.merge(spark, loc, Seq((1L, "A"), (5L, "e")).toDF("id", "v"),
      Seq("id"))
    assert(VersionedTable.read(spark, loc).as[(Long, String)].collect().sorted.toSeq
      === Seq((1L, "A"), (2L, "B"), (4L, "d"), (5L, "e")))
  }

  test("versioned table: appends evolve the schema additively (mergeSchema)") {
    import spark.implicits._
    val loc = Files.createTempDirectory("vt_evolve").toString
    VersionedTable.write(Seq((1L, "a")).toDF("id", "v"), loc, "overwrite")
    VersionedTable.write(Seq((2L, "b", 9L)).toDF("id", "v", "extra"), loc, "append")
    val now = VersionedTable.read(spark, loc)
    assert(now.columns.toSet === Set("id", "v", "extra"))
    // pre-evolution rows surface NULL for the new column; as-of v0 never sees it
    assert(now.filter(col("id") === 1L).select("extra").first().isNullAt(0))
    assert(VersionedTable.readAsOf(spark, loc, 0).columns.toSet === Set("id", "v"))
  }

  test("versioned table: z-order compaction clusters files for min/max pruning") {
    import spark.implicits._
    val loc = Files.createTempDirectory("vt_zorder").toString
    // shuffled key space across several appends → every file spans the whole range
    val rows = scala.util.Random.shuffle((0L until 400L).toList)
    rows.grouped(100).foreach { chunk =>
      VersionedTable.write(chunk.toDF("k").repartition(4), loc, "append")
    }
    VersionedTable.compact(spark, loc, zorderBy = Seq("k"), numFiles = 4)
    // after z-order compaction a narrow key filter touches a subset of files
    val pruned = VersionedTable.read(spark, loc).filter(col("k") < 50)
    assert(pruned.count() === 50)
    assert(VersionedTable.read(spark, loc).inputFiles.length === 4)
  }

  test("versioned table: idempotentAppend deduplicates a replayed transaction") {
    import spark.implicits._
    val loc = Files.createTempDirectory("vt_txn").toString
    val v0 = VersionedTable.idempotentAppend(
      Seq(1L).toDF("id"), loc, txnApp = "ckpt-A", txnId = 0L)
    assert(v0 === Some(0L))
    // crash-replay of the same micro-batch: same (app, id) → no-op
    assert(VersionedTable.idempotentAppend(
      Seq(1L).toDF("id"), loc, "ckpt-A", 0L).isEmpty)
    // next batch and a different writer both commit normally
    assert(VersionedTable.idempotentAppend(
      Seq(2L).toDF("id"), loc, "ckpt-A", 1L) === Some(1L))
    assert(VersionedTable.idempotentAppend(
      Seq(3L).toDF("id"), loc, "ckpt-B", 0L) === Some(2L))
    assert(VersionedTable.read(spark, loc).orderBy("id")
      .as[Long].collect().toSeq === Seq(1L, 2L, 3L))
  }

  test("idempotentOverwrite CAS: a publish computed against a stale version is refused") {
    import spark.implicits._
    val loc = Files.createTempDirectory("vt_cas").toString + "/t"
    // bootstrap: expectedVersion -1 = "table must not exist yet"
    assert(VersionedTable.idempotentOverwrite(Seq(1L).toDF("id"), loc,
      txnApp = "m1", txnId = 0L, expectedVersion = Some(-1L)) === Some(0L))
    // read v0, compute next state… but a rival commits v1 in between
    VersionedTable.write(Seq(99L).toDF("id"), loc, "overwrite")          // v1
    val e = intercept[java.util.ConcurrentModificationException] {
      VersionedTable.idempotentOverwrite(Seq(2L).toDF("id"), loc,
        txnApp = "m1", txnId = 1L, expectedVersion = Some(0L))
    }
    assert(e.getMessage.contains("version 1"))
    // nothing landed: the rival's state survives, no orphan staging dir
    assert(VersionedTable.read(spark, loc).as[Long].collect().toSeq === Seq(99L))
    val staged = new java.io.File(s"$loc/_data").listFiles().toSeq.map(_.getName)
    val referenced = VersionedTable.commits(spark, loc).map(_.data_dir).toSet
    assert(staged.forall(referenced.contains))
    // a REPLAY of an already-committed batch short-circuits BEFORE the CAS:
    // exactly-once wins over staleness (the work is already durable)
    assert(VersionedTable.idempotentOverwrite(Seq(1L).toDF("id"), loc,
      txnApp = "m1", txnId = 0L, expectedVersion = Some(0L)).isEmpty)
    // and a publish against the CURRENT version lands
    assert(VersionedTable.idempotentOverwrite(Seq(3L).toDF("id"), loc,
      txnApp = "m1", txnId = 2L, expectedVersion = Some(1L)) === Some(2L))
  }

  test("versioned table: change feed captures merge inserts/updates/deletes row-level") {
    import spark.implicits._
    val loc = Files.createTempDirectory("vt_cdf").toString
    VersionedTable.write(
      Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v"), loc, "overwrite")
    // update id=2, insert id=4, delete id=3, delete of missing id=9 (a no-op)
    val changes = Seq((2L, "B", false), (4L, "d", false), (3L, "", true),
      (9L, "", true)).toDF("id", "v", "is_delete")
    val mv = VersionedTable.merge(spark, loc, changes, Seq("id"),
      deleteCol = Some("is_delete"), changeFeed = true)
    val feed = VersionedTable.readChanges(spark, loc, mv, mv)
    assert(feed.columns.toSet ===
      Set("id", "v", "_change_type", "_commit_version", "_commit_timestamp"))
    val rows = feed.select("id", "v", "_change_type", "_commit_version")
      .as[(Long, String, String, Long)].collect().sortBy(r => (r._1, r._3)).toSeq
    // sorted by (id, change_type): "update_postimage" < "update_preimage"
    assert(rows === Seq(
      (2L, "B", "update_postimage", 1L),
      (2L, "b", "update_preimage", 1L),
      (3L, "c", "delete", 1L),
      (4L, "d", "insert", 1L)))
    // merged state agrees with the non-CDF merge semantics
    assert(VersionedTable.read(spark, loc).as[(Long, String)].collect().sorted.toSeq
      === Seq((1L, "a"), (2L, "B"), (4L, "d")))
  }

  test("versioned table: change feed serves appends as inserts, skips compacts") {
    import spark.implicits._
    val loc = Files.createTempDirectory("vt_cdf_append").toString
    VersionedTable.write(Seq((1L, "a")).toDF("id", "v"), loc, "overwrite") // v0
    VersionedTable.write(Seq((2L, "b")).toDF("id", "v"), loc, "append")    // v1
    val cv = VersionedTable.compact(spark, loc, numFiles = 1)              // v2
    VersionedTable.write(Seq((3L, "c")).toDF("id", "v"), loc, "append")    // v3
    // appends in (v0, v3] are inserts; the compact contributes nothing
    val feed = VersionedTable.readChanges(spark, loc, 1L, 3L)
      .select("id", "v", "_change_type", "_commit_version")
      .as[(Long, String, String, Long)].collect().sortBy(_._1).toSeq
    assert(feed === Seq((2L, "b", "insert", 1L), (3L, "c", "insert", 3L)))
    // a compact-only range yields an empty frame with the CDF schema
    val empty = VersionedTable.readChanges(spark, loc, cv, cv)
    assert(empty.count() === 0)
    assert(empty.columns.contains("_change_type"))
    // full rewrites are resets: refused by default, inserts when opted in
    intercept[IllegalStateException] {
      VersionedTable.readChanges(spark, loc, 0L, 3L)
    }
    assert(VersionedTable.readChanges(spark, loc, 0L, 0L, allowFullRewrites = true)
      .select("_change_type").distinct().as[String].collect().toSeq === Seq("insert"))
    // a merge committed WITHOUT changeFeed cannot serve row-level changes…
    VersionedTable.merge(spark, loc, Seq((1L, "A")).toDF("id", "v"), Seq("id"))
    intercept[IllegalStateException] {
      VersionedTable.readChanges(spark, loc, 4L, 4L)
    }
    // …but allowFullRewrites serves its post-merge state as inserts (reset
    // semantics, same contract as overwrite) — the startingVersion path needs it
    val reset = VersionedTable.readChanges(spark, loc, 4L, 4L,
        allowFullRewrites = true)
      .select("id", "v", "_change_type")
      .as[(Long, String, String)].collect().sortBy(_._1).toSeq
    assert(reset === Seq((1L, "A", "insert"), (2L, "b", "insert"),
      (3L, "c", "insert")))
  }

  test("versioned table: vacuum reclaims change dirs with their expired commits") {
    import spark.implicits._
    val loc = Files.createTempDirectory("vt_cdf_vacuum").toString
    VersionedTable.write(Seq((1L, "a")).toDF("id", "v"), loc, "overwrite")
    val mv = VersionedTable.merge(spark, loc, Seq((2L, "b")).toDF("id", "v"),
      Seq("id"), changeFeed = true)
    val changeDir = VersionedTable.commits(spark, loc).last.change_dir
    assert(changeDir.nonEmpty)
    // still referenced → survives a vacuum
    VersionedTable.vacuum(spark, loc, retentionMs = 0L, orphanGraceMs = 0L)
    assert(new java.io.File(s"$loc/_data/$changeDir").exists())
    assert(VersionedTable.readChanges(spark, loc, mv, mv).count() === 1)
    // superseded by an overwrite + zero retention → the merge's data AND feed go
    VersionedTable.write(Seq((9L, "z")).toDF("id", "v"), loc, "overwrite")
    VersionedTable.vacuum(spark, loc, retentionMs = 0L, orphanGraceMs = 0L)
    assert(!new java.io.File(s"$loc/_data/$changeDir").exists())
  }

  test("versioned table: fastCount answers from the log without reading data") {
    import spark.implicits._
    val loc = Files.createTempDirectory("vt_fastcount").toString
    VersionedTable.write((1L to 10L).toDF("id"), loc, "overwrite")
    VersionedTable.write((11L to 15L).toDF("id"), loc, "append")
    assert(VersionedTable.fastCount(spark, loc) === 15L)
    // merge rewrites the full state; the log count tracks it
    VersionedTable.merge(spark, loc,
      Seq((1L, true), (16L, false)).toDF("id", "is_delete"), Seq("id"),
      deleteCol = Some("is_delete"))
    assert(VersionedTable.fastCount(spark, loc) === 15L) // -1 delete, +1 insert
    assert(VersionedTable.fastCount(spark, loc) ===
      VersionedTable.read(spark, loc).count())
  }

  test("versioned table: append with a flipped column type is rejected") {
    import spark.implicits._
    val loc = Files.createTempDirectory("vt_enforce").toString
    VersionedTable.write(Seq((1L, "a")).toDF("id", "v"), loc, "overwrite")
    // same column name, string → long: poison for every later merged read
    val bad = intercept[IllegalArgumentException] {
      VersionedTable.write(Seq((2L, 7L)).toDF("id", "v"), loc, "append")
    }
    assert(bad.getMessage.contains("schema mismatch"))
    // additive column still fine; table state untouched by the rejected append
    VersionedTable.write(Seq((2L, "b", 1L)).toDF("id", "v", "extra"), loc, "append")
    assert(VersionedTable.read(spark, loc).count() === 2)
  }

  test("versioned table: symlink manifest lists exactly the live snapshot's files") {
    import spark.implicits._
    val loc = Files.createTempDirectory("vt_manifest").toString
    VersionedTable.write(Seq(1L, 2L).toDF("id"), loc, "overwrite")
    VersionedTable.write(Seq(3L).toDF("id"), loc, "append")
    val listed = VersionedTable.generateManifest(spark, loc)
    assert(listed.toSet === VersionedTable.read(spark, loc).inputFiles.toSet)

    val body = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(loc, "_symlink_format_manifest", "manifest")), "UTF-8")
    assert(body.trim.split("\n").toSet === listed.map(_.trim).toSet)

    // an overwrite resets the live set; regeneration follows it
    VersionedTable.write(Seq(9L).toDF("id"), loc, "overwrite")
    val after = VersionedTable.generateManifest(spark, loc)
    assert(after.toSet === VersionedTable.read(spark, loc).inputFiles.toSet)
    assert(after.toSet.intersect(listed.toSet).isEmpty,
      "old snapshot files must leave the manifest after an overwrite")
  }

  test("partition-scoped merge: untouched partitions keep their exact files") {
    import spark.implicits._
    val loc = Files.createTempDirectory("vt_scoped_merge").toString
    def part(df: org.apache.spark.sql.DataFrame, op: String) =
      VersionedTable.write(df, loc, op, partitionBy = Seq("p"))
    part(Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0), (4L, "a", 40.0))
      .toDF("id", "p", "v"), "overwrite")                                  // v0
    part(Seq((5L, "b", 50.0)).toDF("id", "p", "v"), "append")              // v1

    def filesIn(pv: String): Set[String] =
      VersionedTable.read(spark, loc).inputFiles.toSet.filter(_.contains(s"/p=$pv/"))
    val bBefore = filesIn("b"); val cBefore = filesIn("c")
    assert(bBefore.nonEmpty && cBefore.nonEmpty)

    // touch only p=a: update id=1, insert id=6, delete id=4 — partition col in keys
    val mv = VersionedTable.merge(spark, loc,
      Seq((1L, "a", 11.0, false), (6L, "a", 60.0, false), (4L, "a", 0.0, true))
        .toDF("id", "p", "v", "del"),
      Seq("id", "p"), deleteCol = Some("del"))                             // v2
    val mc = VersionedTable.commits(spark, loc).last
    assert(mc.replace_where === "p=a", "merge must have taken the scoped path")
    assert(mc.replaced_rows === 2L, "p=a held 2 rows pre-merge")

    // THE point: untouched partitions were carried by reference, not rewritten
    assert(filesIn("b") === bBefore, "p=b files must be byte-identical (same paths)")
    assert(filesIn("c") === cBefore, "p=c files must be byte-identical (same paths)")

    // semantics identical to a full merge
    assert(VersionedTable.read(spark, loc).select("id", "p", "v")
      .as[(Long, String, Double)].collect().sortBy(_._1).toSeq === Seq(
        (1L, "a", 11.0), (2L, "b", 20.0), (3L, "c", 30.0), (5L, "b", 50.0),
        (6L, "a", 60.0)))
    // log-only count still agrees after a scoped merge
    assert(VersionedTable.fastCount(spark, loc) ===
      VersionedTable.read(spark, loc).count())
    // time travel still serves the PRE-merge p=a
    assert(VersionedTable.readAsOf(spark, loc, 1L).filter(col("p") === "a")
      .select("id").as[Long].collect().sorted.toSeq === Seq(1L, 4L))

    // a second scoped merge over p=b shadows transitively; p=c still untouched
    VersionedTable.merge(spark, loc,
      Seq((2L, "b", 22.0, false)).toDF("id", "p", "v", "del"),
      Seq("id", "p"), deleteCol = Some("del"))                             // v3
    assert(filesIn("c") === cBefore)
    assert(VersionedTable.read(spark, loc).filter(col("p") === "b")
      .select("id", "v").as[(Long, Double)].collect().sortBy(_._1).toSeq
      === Seq((2L, 22.0), (5L, 50.0)))
    assert(VersionedTable.fastCount(spark, loc) ===
      VersionedTable.read(spark, loc).count())

    // keys NOT covering the partition column → the always-correct full rewrite
    VersionedTable.merge(spark, loc,
      Seq((3L, "c", 33.0)).toDF("id", "p", "v"), Seq("id"))                // v4
    assert(VersionedTable.commits(spark, loc).last.replace_where === "",
      "partition col outside keys must fall back to the full-snapshot merge")
    assert(VersionedTable.read(spark, loc).filter(col("p") === "c")
      .select("v").as[Double].collect().toSeq === Seq(33.0))
  }

  test("partition-scoped merge captures an exact change feed for the touched slice") {
    import spark.implicits._
    val loc = Files.createTempDirectory("vt_scoped_cdf").toString
    VersionedTable.write(
      Seq((1L, "a", 10.0), (2L, "b", 20.0)).toDF("id", "p", "v"), loc,
      "overwrite", partitionBy = Seq("p"))
    val mv = VersionedTable.merge(spark, loc,
      Seq((1L, "a", 11.0, false), (3L, "a", 30.0, false))
        .toDF("id", "p", "v", "del"),
      Seq("id", "p"), deleteCol = Some("del"), changeFeed = true)
    assert(VersionedTable.commits(spark, loc).last.replace_where === "p=a")
    val feed = VersionedTable.readChanges(spark, loc, mv, mv)
      .select("id", "v", "_change_type")
      .as[(Long, Double, String)].collect().sortBy(r => (r._1, r._3)).toSeq
    assert(feed === Seq(
      (1L, 11.0, "update_postimage"), (1L, 10.0, "update_preimage"),
      (3L, 30.0, "insert")))
  }

  test("vacuum reclaims partitions shadowed by an out-of-retention scoped merge") {
    import spark.implicits._
    val loc = Files.createTempDirectory("vt_scoped_vacuum").toString
    VersionedTable.write(
      Seq((1L, "a", 10.0), (2L, "b", 20.0)).toDF("id", "p", "v"), loc,
      "overwrite", partitionBy = Seq("p"))                                 // v0
    val mv = VersionedTable.merge(spark, loc,
      Seq((1L, "a", 11.0)).toDF("id", "p", "v"), Seq("id", "p"))           // v1 scoped
    assert(VersionedTable.commits(spark, loc).last.replace_where === "p=a")
    val v0Dir = s"$loc/_data/${VersionedTable.commits(spark, loc).head.data_dir}"
    assert(new java.io.File(s"$v0Dir/p=a").exists())

    // within retention: nothing reclaimed, old version fully readable
    VersionedTable.vacuum(spark, loc, retentionMs = 3600000L, orphanGraceMs = 0L)
    assert(new java.io.File(s"$v0Dir/p=a").exists())
    assert(VersionedTable.readAsOf(spark, loc, 0L).count() === 2)

    // out of retention: ONLY the shadowed subdir goes; p=b stays (still live)
    VersionedTable.vacuum(spark, loc, retentionMs = 0L, orphanGraceMs = 0L)
    assert(!new java.io.File(s"$v0Dir/p=a").exists(),
      "the shadowed partition must be reclaimed")
    assert(new java.io.File(s"$v0Dir/p=b").exists(),
      "the still-live partition must survive")

    // current state is untouched; pre-merge reads now fail LOUDLY, not partially
    assert(VersionedTable.read(spark, loc).select("id", "v")
      .as[(Long, Double)].collect().sortBy(_._1).toSeq
      === Seq((1L, 11.0), (2L, 20.0)))
    assert(VersionedTable.minReadableVersion(spark, loc) === mv)
    val e = intercept[IllegalStateException] {
      VersionedTable.readAsOf(spark, loc, 0L)
    }
    assert(e.getMessage.contains("vacuumed"))
  }

  test("versioned table: partitioned tables get one manifest per partition directory") {
    import spark.implicits._
    val loc = Files.createTempDirectory("vt_manifest_part").toString
    VersionedTable.write(
      Seq((1L, "a"), (2L, "b"), (3L, "a")).toDF("id", "p"), loc, "overwrite",
      partitionBy = Seq("p"))
    VersionedTable.write(Seq((4L, "c")).toDF("id", "p"), loc, "append",
      partitionBy = Seq("p"))
    val listed = VersionedTable.generateManifest(spark, loc)
    assert(listed.toSet === VersionedTable.read(spark, loc).inputFiles.toSet)

    // the Hive/Trino/Athena layout: <root>/<partition>/manifest, no flat file
    val root = java.nio.file.Paths.get(loc, "_symlink_format_manifest")
    assert(!java.nio.file.Files.exists(root.resolve("manifest")),
      "a partitioned table must not emit a flat manifest")
    Seq("a", "b", "c").foreach { v =>
      val m = root.resolve(s"p=$v").resolve("manifest")
      assert(java.nio.file.Files.exists(m), s"missing manifest for p=$v")
      val body = new String(java.nio.file.Files.readAllBytes(m), "UTF-8")
      val expected = listed.filter(_.contains(s"/p=$v/"))
      assert(body.trim.split("\n").toSet === expected.toSet)
    }

    // regeneration replaces the tree: a dropped partition's manifest disappears
    VersionedTable.write(Seq((9L, "a")).toDF("id", "p"), loc, "overwrite",
      partitionBy = Seq("p"))
    VersionedTable.generateManifest(spark, loc)
    assert(java.nio.file.Files.exists(root.resolve("p=a").resolve("manifest")))
    assert(!java.nio.file.Files.exists(root.resolve("p=b").resolve("manifest")),
      "stale partition manifests must not survive regeneration")
  }

  test("CHECK constraints are fused into the write: no extra job, message preserved") {
    import spark.implicits._
    import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
    def countJobs(body: => Unit): Int = {
      // flush in-flight events from whatever ran before this window
      org.apache.spark.graft.TestBus.drain(spark.sparkContext)
      val counter = new java.util.concurrent.atomic.AtomicInteger(0)
      val l = new SparkListener {
        override def onJobStart(j: SparkListenerJobStart): Unit =
          counter.incrementAndGet()
      }
      spark.sparkContext.addSparkListener(l)
      try {
        body
        // the listener bus is async: drain it, then read once
        org.apache.spark.graft.TestBus.drain(spark.sparkContext)
        counter.get
      } finally spark.sparkContext.removeSparkListener(l)
    }

    val plain = Files.createTempDirectory("vt_fuse_plain").toString
    val checked = Files.createTempDirectory("vt_fuse_checked").toString
    Seq(plain, checked).foreach { loc =>
      VersionedTable.write(Seq((1L, 10.0)).toDF("id", "amount"), loc, "overwrite")
    }
    VersionedTable.addConstraint(spark, checked, "amount_positive", "amount > 0")

    val batch = Seq((2L, 7.0), (3L, 8.0)).toDF("id", "amount")
    val jobsPlain = countJobs { VersionedTable.write(batch, plain, "append") }
    val jobsChecked = countJobs { VersionedTable.write(batch, checked, "append") }
    assert(jobsChecked === jobsPlain,
      s"constrained append must not re-execute the batch lineage " +
        s"(plain=$jobsPlain, checked=$jobsChecked)")

    // the violation contract survives fusion: same exception type, constraint
    // named, nothing lands (not even a partial staging dir)
    val e = intercept[IllegalArgumentException] {
      VersionedTable.write(Seq((4L, -1.0)).toDF("id", "amount"), checked, "append")
    }
    assert(e.getMessage.contains("amount_positive"))
    assert(e.getMessage.contains("CHECK constraint"))
    // base row + the 2-row measured append; the refused batch added nothing
    assert(VersionedTable.read(spark, checked).count() === 3)
    val staged = new java.io.File(s"$checked/_data").listFiles().toSeq
      .map(_.getName)
    val referenced = VersionedTable.commits(spark, checked).map(_.data_dir).toSet
    assert(staged.forall(referenced.contains),
      s"aborted write left an orphan staging dir: $staged vs $referenced")
  }

  test("versioned table: CHECK constraints gate appends, overwrites, and merges") {
    import spark.implicits._
    val loc = Files.createTempDirectory("vt_check").toString
    VersionedTable.write(Seq((1L, 10.0)).toDF("id", "amount"), loc, "overwrite")
    VersionedTable.addConstraint(spark, loc, "amount_positive", "amount > 0")
    assert(VersionedTable.constraints(spark, loc) ===
      Map("amount_positive" -> "amount > 0"))

    // violating append fails fast, naming the constraint; nothing lands
    val e = intercept[IllegalArgumentException] {
      VersionedTable.write(Seq((2L, -5.0)).toDF("id", "amount"), loc, "append")
    }
    assert(e.getMessage.contains("amount_positive"))
    assert(VersionedTable.read(spark, loc).count() === 1)

    // clean append and a NULL (SQL CHECK: null passes) both land
    VersionedTable.write(Seq((2L, 7.0)).toDF("id", "amount"), loc, "append")
    VersionedTable.write(Seq((3L, Option.empty[Double])).toDF("id", "amount"),
      loc, "append")
    assert(VersionedTable.read(spark, loc).count() === 3)

    // merge: a violating upsert is refused, a delete marker is not checked
    val bad = intercept[IllegalArgumentException] {
      VersionedTable.merge(spark, loc,
        Seq((2L, -1.0, false)).toDF("id", "amount", "del"),
        Seq("id"), deleteCol = Some("del"))
    }
    assert(bad.getMessage.contains("amount_positive"))
    VersionedTable.merge(spark, loc,
      Seq((3L, -999.0, true)).toDF("id", "amount", "del"), // delete: dummy amount ok
      Seq("id"), deleteCol = Some("del"))
    assert(VersionedTable.read(spark, loc).count() === 2)

    // dropping the constraint lifts the gate
    VersionedTable.dropConstraint(spark, loc, "amount_positive")
    VersionedTable.write(Seq((4L, -5.0)).toDF("id", "amount"), loc, "append")
    assert(VersionedTable.read(spark, loc).count() === 3)

    // adding a constraint the EXISTING data violates is refused (Delta contract)
    val retro = intercept[IllegalArgumentException] {
      VersionedTable.addConstraint(spark, loc, "amount_positive", "amount > 0")
    }
    assert(retro.getMessage.contains("amount_positive"))
    assert(VersionedTable.constraints(spark, loc).isEmpty)
  }

  test("restore enforces CURRENT constraints against the restored snapshot") {
    import spark.implicits._
    val loc = Files.createTempDirectory("vt_restore_check").toString
    VersionedTable.write(Seq((1L, -5.0)).toDF("id", "amount"), loc, "overwrite") // v0
    VersionedTable.write(Seq((2L, 10.0)).toDF("id", "amount"), loc, "overwrite") // v1
    // valid against the LIVE data (v1) — but v0 predates it and violates it
    VersionedTable.addConstraint(spark, loc, "amount_positive", "amount > 0")
    val e = intercept[IllegalArgumentException] {
      VersionedTable.restore(spark, loc, 0L)
    }
    assert(e.getMessage.contains("amount_positive"))
    // the refused restore must leave no trace: no commit, state unchanged
    assert(VersionedTable.commits(spark, loc).last.version === 1L)
    assert(VersionedTable.read(spark, loc).as[(Long, Double)].collect().toSeq
      === Seq((2L, 10.0)))
  }

  test("versioned table: restore rolls back as a new auditable commit") {
    import spark.implicits._
    val loc = Files.createTempDirectory("vt_restore").toString
    VersionedTable.write(Seq(1L, 2L).toDF("id"), loc, "overwrite")   // v0
    VersionedTable.write(Seq(3L).toDF("id"), loc, "append")          // v1
    VersionedTable.write(Seq(99L).toDF("id"), loc, "overwrite")      // v2: the mistake

    val v = VersionedTable.restore(spark, loc, 1L)                   // v3
    assert(v === 3L)
    assert(VersionedTable.read(spark, loc).orderBy("id")
      .as[Long].collect().toSeq === Seq(1L, 2L, 3L))
    // append-only history: the mistake stays time-travelable, the restore is logged
    assert(VersionedTable.commits(spark, loc).last.operation === "restore")
    assert(VersionedTable.readAsOf(spark, loc, 2L)
      .as[Long].collect().toSeq === Seq(99L))
    // appends continue on top of the restored state
    VersionedTable.write(Seq(4L).toDF("id"), loc, "append")          // v4
    assert(VersionedTable.read(spark, loc).orderBy("id")
      .as[Long].collect().toSeq === Seq(1L, 2L, 3L, 4L))
  }

  test("versioned table: snapshot diff recovers row-level changes without a feed") {
    import spark.implicits._
    val loc = Files.createTempDirectory("vt_diff").toString
    VersionedTable.write(
      Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v"), loc, "overwrite") // v0
    // a FULL REWRITE — the case readChanges cannot serve row-level
    VersionedTable.write(
      Seq((2L, "B"), (3L, "c"), (4L, "d")).toDF("id", "v"), loc, "overwrite") // v1

    val got = VersionedTable.diffSnapshots(spark, loc, 0L, 1L, Seq("id"))
      .select("id", "v", "_change_type")
      .as[(Long, String, String)].collect().sortBy(r => (r._1, r._3)).toSeq
    // id=1 deleted, id=2 updated (pre+post), id=3 unchanged (absent), id=4 inserted
    assert(got === Seq(
      (1L, "a", "delete"),
      (2L, "B", "update_postimage"),
      (2L, "b", "update_preimage"),
      (4L, "d", "insert")))

    // identical snapshots diff to nothing
    assert(VersionedTable.diffSnapshots(spark, loc, 1L, 1L, Seq("id")).count() === 0)
  }

  test("overwritePartitions: replaces exactly the data's partitions, explicit set can clear") {
    import spark.implicits._
    val loc = Files.createTempDirectory("vt_dynover").toString
    val base = (0 until 90).map(i => (i.toLong, s"d${i % 3}")).toDF("id", "d")
    VersionedTable.write(base, loc, "overwrite", partitionBy = Seq("d"))
    // dynamic: the batch only carries d1 → only d1 replaced
    val v = VersionedTable.overwritePartitions(
      Seq((500L, "d1"), (501L, "d1")).toDF("id", "d"), loc)
    assert(v === 1L)
    assert(VersionedTable.read(spark, loc).filter(col("d") === "d1")
      .select("id").as[Long].collect().toSet === Set(500L, 501L))
    assert(VersionedTable.read(spark, loc).count() === 62L)
    assert(VersionedTable.fastCount(spark, loc) === 62L)
    // explicit replaced set with an EMPTY batch clears the partition
    VersionedTable.overwritePartitions(base.filter(col("id") < 0), loc,
      Some(Seq(Seq("d" -> "d0"))))
    assert(VersionedTable.read(spark, loc).filter(col("d") === "d0").count() === 0L)
    assert(VersionedTable.fastCount(spark, loc) === 32L)
    // out-of-bounds rows are refused when the set is explicit
    val e = intercept[Exception](VersionedTable.overwritePartitions(
      Seq((1L, "d2")).toDF("id", "d"), loc, Some(Seq(Seq("d" -> "d1")))))
    assert(e.getMessage.contains("replace_where_bounds"))
    // unpartitioned tables fail loudly — there is no safe fallback
    val flat = Files.createTempDirectory("vt_dynover_flat").toString
    VersionedTable.write(Seq(1L).toDF("id"), flat, "overwrite")
    val e2 = intercept[IllegalArgumentException](
      VersionedTable.overwritePartitions(Seq(2L).toDF("id"), flat))
    assert(e2.getMessage.contains("not partitioned"))
  }

  test("compactToFileSize sizes the rewrite from log-resolved bytes") {
    import spark.implicits._
    val loc = Files.createTempDirectory("vt_sizecompact").toString
    (0 until 3).foreach { i =>
      VersionedTable.write(
        (0 until 2000).map(j => (i * 2000L + j, s"payload_$i$j")).toDF("id", "s"),
        loc, if (i == 0) "overwrite" else "append")
    }
    val (rows, bytes) = VersionedTable.snapshotStats(spark, loc)
    assert(rows === 6000L && bytes > 0L)
    // target a third of the live bytes → ceil gives 3 (or 4 on rounding) files
    VersionedTable.compactToFileSize(spark, loc, targetFileBytes = bytes / 3)
    val detail = VersionedTable.detail(spark, loc).head()
    val expected = (bytes + bytes / 3 - 1) / (bytes / 3)
    assert(detail.getAs[Long]("num_files") === expected)
    assert(VersionedTable.read(spark, loc).count() === 6000L)
  }

  test("versioned table: concurrent writers each publish a distinct committed version") {
    import spark.implicits._
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val loc = Files.createTempDirectory("vt_race").toString
    VersionedTable.write(Seq(0L).toDF("id"), loc, "overwrite")
    val racers = (1 to 4).map { i =>
      Future(VersionedTable.write(Seq(i.toLong).toDF("id"), loc, "append"))
    }
    // generous: under a parallel suite run the shared local[4] session can starve
    // these four racing jobs for minutes without anything being wrong
    val versions = Await.result(Future.sequence(racers), 5.minutes)
    // all four commits land, on distinct versions, and every row is readable
    assert(versions.toSet.size === 4)
    assert(VersionedTable.read(spark, loc).orderBy("id")
      .as[Long].collect().toSeq === Seq(0L, 1L, 2L, 3L, 4L))
  }
}
