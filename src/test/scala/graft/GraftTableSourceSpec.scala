package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQueryException, Trigger}
import org.scalatest.funsuite.AnyFunSuite

import graft.catalog.VersionedTable

/** The versioned table as a Structured Streaming source (`format("graft-table")`):
  * initial-snapshot-then-incremental, version offsets in the checkpoint, compacts
  * skipped, rewrites refused without `ignoreChanges`, and change-feed mode serving
  * merges row-level. Each scenario drains with AvailableNow and restarts against
  * the SAME checkpoint to prove the offset log carries versions across runs.
  */
class GraftTableSourceSpec extends AnyFunSuite with SharedSpark {

  private def drain(loc: String, out: String, chk: String,
      options: Map[String, String] = Map.empty): Unit = {
    val reader = options.foldLeft(spark.readStream.format("graft-table")) {
      case (r, (k, v)) => r.option(k, v)
    }
    reader.load(loc).writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", chk)
      .trigger(Trigger.AvailableNow()).start().awaitTermination()
  }

  private def ids(out: String): Seq[Long] = {
    import spark.implicits._
    spark.read.parquet(out).select("id").as[Long].collect().sorted.toSeq
  }

  test("tailing: initial snapshot, then only new appends; compacts skipped") {
    import spark.implicits._
    val loc = Files.createTempDirectory("gts_tail").toString
    val out = Files.createTempDirectory("gts_tail_out").toString
    val chk = Files.createTempDirectory("gts_tail_chk").toString
    VersionedTable.write(Seq(1L, 2L, 3L).toDF("id"), loc, "overwrite") // v0
    VersionedTable.write(Seq(4L, 5L).toDF("id"), loc, "append")        // v1

    // first run: the complete snapshot as of the newest version
    drain(loc, out, chk)
    assert(ids(out) === Seq(1L, 2L, 3L, 4L, 5L))

    // nothing new → a restart delivers nothing
    drain(loc, out, chk)
    assert(ids(out) === Seq(1L, 2L, 3L, 4L, 5L))

    // new append + a compact: only the append's rows arrive, exactly once
    VersionedTable.write(Seq(6L, 7L).toDF("id"), loc, "append")        // v2
    VersionedTable.compact(spark, loc, numFiles = 1)                   // v3
    drain(loc, out, chk)
    assert(ids(out) === Seq(1L, 2L, 3L, 4L, 5L, 6L, 7L))
  }

  test("rewrites: stream fails without ignoreChanges, skips with it") {
    import spark.implicits._
    val loc = Files.createTempDirectory("gts_rw").toString
    val out = Files.createTempDirectory("gts_rw_out").toString
    val chk = Files.createTempDirectory("gts_rw_chk").toString
    VersionedTable.write(Seq(1L, 2L).toDF("id"), loc, "overwrite")     // v0
    drain(loc, out, chk)
    assert(ids(out) === Seq(1L, 2L))

    VersionedTable.write(Seq(9L).toDF("id"), loc, "overwrite")         // v1: rewrite
    val e = intercept[StreamingQueryException] { drain(loc, out, chk) }
    assert(e.getMessage.contains("rewritten"))

    // opting in skips the rewrite commit (rewritten rows are NOT re-delivered),
    // and later appends still flow
    VersionedTable.write(Seq(10L).toDF("id"), loc, "append")           // v2
    drain(loc, out, chk, Map("ignoreChanges" -> "true"))
    assert(ids(out) === Seq(1L, 2L, 10L))
  }

  test("replace commits: append stream fails without ignoreChanges, skips with it") {
    import spark.implicits._
    val loc = Files.createTempDirectory("gts_rp").toString
    val out = Files.createTempDirectory("gts_rp_out").toString
    val chk = Files.createTempDirectory("gts_rp_chk").toString
    VersionedTable.write((1L to 6L).map(i => (i, s"g${i % 2}")).toDF("id", "grp"),
      loc, "overwrite", partitionBy = Seq("grp"))                      // v0
    drain(loc, out, chk)
    assert(ids(out) === (1L to 6L))

    // v1: dynamic partition overwrite of g0 — rows were retired, not appended,
    // so an append-only tail must refuse rather than silently diverge
    VersionedTable.overwritePartitions(
      Seq((90L, "g0")).toDF("id", "grp"), loc)
    val e = intercept[StreamingQueryException] { drain(loc, out, chk) }
    assert(e.getMessage.contains("replace"))

    // opting in skips the replace (its rows are not delivered, the retired ones
    // not retracted — the documented reset gap); later appends still flow
    VersionedTable.write(Seq((100L, "g1")).toDF("id", "grp"), loc, "append") // v2
    drain(loc, out, chk, Map("ignoreChanges" -> "true"))
    assert(ids(out) === ((1L to 6L) :+ 100L))
  }

  test("change feed mode: merges arrive as row-level pre/post images and deletes") {
    import spark.implicits._
    val loc = Files.createTempDirectory("gts_cdf").toString
    val out = Files.createTempDirectory("gts_cdf_out").toString
    val chk = Files.createTempDirectory("gts_cdf_chk").toString
    VersionedTable.write(
      Seq((1L, "a"), (2L, "b")).toDF("id", "v"), loc, "overwrite")     // v0

    // initial snapshot arrives as inserts with CDF columns
    drain(loc, out, chk, Map("readChangeFeed" -> "true"))
    val snap = spark.read.parquet(out)
    assert(snap.columns.toSet ===
      Set("id", "v", "_change_type", "_commit_version", "_commit_timestamp"))
    assert(snap.filter(col("_change_type") === "insert").count() === 2)

    // one merge: update id=2, insert id=3, delete id=1
    VersionedTable.merge(spark, loc,
      Seq((2L, "B", false), (3L, "c", false), (1L, "", true))
        .toDF("id", "v", "is_delete"),
      Seq("id"), deleteCol = Some("is_delete"), changeFeed = true)     // v1
    drain(loc, out, chk, Map("readChangeFeed" -> "true"))
    val feed = spark.read.parquet(out).filter(col("_commit_version") === 1L)
      .select("id", "v", "_change_type")
      .as[(Long, String, String)].collect().sortBy(r => (r._1, r._3)).toSeq
    // sorted by (id, change_type): "update_postimage" < "update_preimage"
    assert(feed === Seq(
      (1L, "a", "delete"),
      (2L, "B", "update_postimage"),
      (2L, "b", "update_preimage"),
      (3L, "c", "insert")))
  }

  test("DV commits: append stream fails on a delete, skips it with ignoreChanges; CDF serves it row-level") {
    import spark.implicits._
    val loc = Files.createTempDirectory("gts_dv").toString
    val out = Files.createTempDirectory("gts_dv_out").toString
    val chk = Files.createTempDirectory("gts_dv_chk").toString
    VersionedTable.write(Seq(1L, 2L, 3L, 4L).toDF("id"), loc, "overwrite") // v0
    drain(loc, out, chk)
    assert(ids(out) === Seq(1L, 2L, 3L, 4L))

    VersionedTable.deleteWhere(spark, loc, "id <= 2")                      // v1
    VersionedTable.write(Seq(5L).toDF("id"), loc, "append")                // v2
    // append-mode streams cannot retract: fail loudly by default
    val e = intercept[StreamingQueryException] { drain(loc, out, chk) }
    assert(e.getMessage.contains("delete") || e.getCause.getMessage.contains("delete"))
    // ignoreChanges: the delete is skipped (no retraction), the append arrives
    drain(loc, out, chk, Map("ignoreChanges" -> "true"))
    assert(ids(out) === Seq(1L, 2L, 3L, 4L, 5L))

    // change-feed mode reconstructs the feedless delete from its DV
    val out2 = Files.createTempDirectory("gts_dv_out2").toString
    val chk2 = Files.createTempDirectory("gts_dv_chk2").toString
    val reader = spark.readStream.format("graft-table")
      .option("readChangeFeed", "true").option("startingVersion", 1)
    reader.load(loc).writeStream.format("parquet")
      .option("path", out2).option("checkpointLocation", chk2)
      .trigger(Trigger.AvailableNow()).start().awaitTermination()
    val feed = spark.read.parquet(out2)
      .select("id", "_change_type", "_commit_version")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(feed === Set((1L, "delete", 1L), (2L, "delete", 1L),
      (5L, "insert", 2L)))
  }

  test("admission control: a backlog drains in bounded batches, never one giant batch") {
    import spark.implicits._
    val loc = Files.createTempDirectory("gts_adm").toString
    val out = Files.createTempDirectory("gts_adm_out").toString
    val chk = Files.createTempDirectory("gts_adm_chk").toString
    VersionedTable.write(Seq(0L).toDF("id"), loc, "overwrite")            // v0 snapshot
    drain(loc, out, chk)                                                  // consume v0
    (1L to 6L).foreach(i =>
      VersionedTable.write(Seq(i * 10, i * 10 + 1).toDF("id"), loc, "append")) // v1..v6, 2 rows each

    // 6-commit backlog, 1 commit per trigger → exactly 6 batches of 2 rows
    var batchSizes = Vector.empty[Long]
    spark.readStream.format("graft-table")
      .option("maxCommitsPerTrigger", "1").load(loc)
      .writeStream.option("checkpointLocation", chk)
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        batchSizes :+= b.count()
      }
      .trigger(Trigger.AvailableNow()).start().awaitTermination()
    assert(batchSizes === Vector.fill(6)(2L))

    // row budget: 4 rows/trigger admits two 2-row commits per batch
    (7L to 8L).foreach(i =>
      VersionedTable.write(Seq(i * 10, i * 10 + 1).toDF("id"), loc, "append")) // v7, v8
    var sizes2 = Vector.empty[Long]
    spark.readStream.format("graft-table")
      .option("maxRowsPerTrigger", "4").load(loc)
      .writeStream.option("checkpointLocation", chk)
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        sizes2 :+= b.count()
      }
      .trigger(Trigger.AvailableNow()).start().awaitTermination()
    assert(sizes2 === Vector(4L))
  }

  test("startingVersion: a fresh stream skips the snapshot and tails from there") {
    import spark.implicits._
    val loc = Files.createTempDirectory("gts_sv").toString
    val out = Files.createTempDirectory("gts_sv_out").toString
    val chk = Files.createTempDirectory("gts_sv_chk").toString
    VersionedTable.write(Seq(1L, 2L).toDF("id"), loc, "overwrite")     // v0
    VersionedTable.write(Seq(3L).toDF("id"), loc, "append")            // v1
    VersionedTable.write(Seq(4L).toDF("id"), loc, "append")            // v2

    // from v1: no initial snapshot — only the appends from v1 on arrive
    drain(loc, out, chk, Map("startingVersion" -> "1"))
    assert(ids(out) === Seq(3L, 4L))

    // the checkpointed offset governs restarts: only NEW commits flow
    VersionedTable.write(Seq(5L).toDF("id"), loc, "append")            // v3
    drain(loc, out, chk, Map("startingVersion" -> "1"))
    assert(ids(out) === Seq(3L, 4L, 5L))
  }

  test("startingVersion=0 replays the full history, creating commit included") {
    import spark.implicits._
    val loc = Files.createTempDirectory("gts_sv0").toString
    val out = Files.createTempDirectory("gts_sv0_out").toString
    val chk = Files.createTempDirectory("gts_sv0_chk").toString
    VersionedTable.write(Seq(1L, 2L).toDF("id"), loc, "overwrite")     // v0: creation
    VersionedTable.write(Seq(3L).toDF("id"), loc, "append")            // v1
    // v0 is an overwrite, but as the CHOSEN starting commit it serves as the
    // stream's initial content instead of failing
    drain(loc, out, chk, Map("startingVersion" -> "0"))
    assert(ids(out) === Seq(1L, 2L, 3L))

    // change-feed mode: same rule, v0 arrives as insert rows
    val outCdf = Files.createTempDirectory("gts_sv0_cdf_out").toString
    val chkCdf = Files.createTempDirectory("gts_sv0_cdf_chk").toString
    drain(loc, outCdf, chkCdf,
      Map("startingVersion" -> "0", "readChangeFeed" -> "true"))
    val feed = spark.read.parquet(outCdf)
    assert(feed.filter(col("_change_type") === "insert").count() === 3)
  }

  test("startingVersion at a feedless merge serves its post-merge state as inserts") {
    import spark.implicits._
    val loc = Files.createTempDirectory("gts_svm").toString
    VersionedTable.write(
      Seq((1L, "a"), (2L, "b")).toDF("id", "v"), loc, "overwrite")     // v0
    VersionedTable.merge(spark, loc,
      Seq((2L, "B"), (3L, "c")).toDF("id", "v"), Seq("id"))            // v1: NO feed
    VersionedTable.write(Seq((4L, "d")).toDF("id", "v"), loc, "append") // v2

    // change-feed stream anchored AT the feedless merge: the documented contract
    // is that the chosen-start commit's full state arrives as inserts (reset
    // semantics) — it must not die on "changes were not captured"
    val out = Files.createTempDirectory("gts_svm_out").toString
    val chk = Files.createTempDirectory("gts_svm_chk").toString
    drain(loc, out, chk,
      Map("startingVersion" -> "1", "readChangeFeed" -> "true"))
    val rows = spark.read.parquet(out)
      .select("id", "v", "_change_type", "_commit_version")
      .as[(Long, String, String, Long)].collect().sortBy(_._1).toSeq
    assert(rows === Seq(
      (1L, "a", "insert", 1L), (2L, "B", "insert", 1L),
      (3L, "c", "insert", 1L), (4L, "d", "insert", 2L)))
  }

  test("sink: micro-batches commit exactly-once; checkpoint replay appends nothing") {
    import spark.implicits._
    val in = Files.createTempDirectory("gts_sink_in").toString
    val loc = Files.createTempDirectory("gts_sink_loc").toString + "/t"
    val chk = Files.createTempDirectory("gts_sink_chk").toString
    val src = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v")
    src.write.mode("overwrite").json(in)

    def run(): Unit = spark.readStream.schema(src.schema).json(in)
      .writeStream.format("graft-table")
      .option("checkpointLocation", chk)
      .trigger(Trigger.AvailableNow()).start(loc).awaitTermination()

    run()
    assert(VersionedTable.read(spark, loc).orderBy("id")
      .as[(Long, String)].collect().toSeq === Seq((1L, "a"), (2L, "b"), (3L, "c")))
    val commits1 = VersionedTable.commits(spark, loc)
    assert(commits1.forall(_.operation == "append"))

    // same checkpoint, no new input: the replayed query commits nothing
    run()
    assert(VersionedTable.commits(spark, loc).size === commits1.size)
    assert(VersionedTable.read(spark, loc).count() === 3)
  }

  test("sink: conf-based checkpoints give two queries on one table distinct identities") {
    import spark.implicits._
    val in1 = Files.createTempDirectory("gts_qid_in1").toString
    val in2 = Files.createTempDirectory("gts_qid_in2").toString
    val loc = Files.createTempDirectory("gts_qid_loc").toString + "/t"
    val chkRoot = Files.createTempDirectory("gts_qid_chk").toString
    val df1 = Seq((1L, "a")).toDF("id", "v")
    df1.write.mode("overwrite").json(in1)
    Seq((2L, "b")).toDF("id", "v").write.mode("overwrite").json(in2)

    // checkpoint via session conf: createSink never sees a checkpointLocation
    // option, so the sink must derive its transactional identity from the query
    // id — NOT the shared table location, or these two queries' identical
    // batchId 0 would dedupe one another and silently drop a micro-batch
    spark.conf.set("spark.sql.streaming.checkpointLocation", chkRoot)
    try {
      def run(in: String, name: String): Unit =
        spark.readStream.schema(df1.schema).json(in)
          .writeStream.format("graft-table").queryName(name)
          .trigger(Trigger.AvailableNow()).start(loc).awaitTermination()
      run(in1, "gts_qid_q1")
      run(in2, "gts_qid_q2") // also batchId 0 — must still land
      assert(VersionedTable.read(spark, loc).select("id")
        .as[Long].collect().sorted.toSeq === Seq(1L, 2L))
      val apps = VersionedTable.commits(spark, loc).map(_.txn_app).distinct
      assert(apps.size === 2, s"expected two distinct txn identities, got $apps")
    } finally spark.conf.unset("spark.sql.streaming.checkpointLocation")
  }

  test("table-to-table streaming: graft-table source feeds graft-table sink") {
    import spark.implicits._
    val srcLoc = Files.createTempDirectory("gts_t2t_src").toString
    val dstLoc = Files.createTempDirectory("gts_t2t_dst").toString + "/t"
    val chk = Files.createTempDirectory("gts_t2t_chk").toString
    VersionedTable.write(Seq(1L, 2L).toDF("id"), srcLoc, "overwrite")

    def pump(): Unit = spark.readStream.format("graft-table").load(srcLoc)
      .withColumn("doubled", col("id") * 2)
      .writeStream.format("graft-table").option("checkpointLocation", chk)
      .trigger(Trigger.AvailableNow()).start(dstLoc).awaitTermination()

    pump()
    assert(VersionedTable.read(spark, dstLoc).orderBy("id")
      .as[(Long, Long)].collect().toSeq === Seq((1L, 2L), (2L, 4L)))

    // incremental: only the new append flows on the next pump
    VersionedTable.write(Seq(5L).toDF("id"), srcLoc, "append")
    pump()
    assert(VersionedTable.read(spark, dstLoc).orderBy("id")
      .as[(Long, Long)].collect().toSeq === Seq((1L, 2L), (2L, 4L), (5L, 10L)))
  }
}
