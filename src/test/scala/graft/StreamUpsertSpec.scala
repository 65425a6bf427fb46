package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.catalog.VersionedTable
import graft.sources.table.GraftTableSink

/** Streaming CDC-apply through the graft-table sink (`mergeKeys` option):
  * per-batch sequence compaction, delete events, exactly-once replay dedupe,
  * fresh-table bootstrap, and the loud refusals for nondeterministic batches.
  */
class StreamUpsertSpec extends AnyFunSuite with SharedSpark {

  import spark.implicits._

  private def tmp(p: String): String =
    java.nio.file.Files.createTempDirectory(p).toString

  private def sink(loc: String, seqBy: Option[String] = Some("seq")) =
    new GraftTableSink(loc, Nil, explicitTxnApp = Some(s"test-app-$loc"),
      mergeKeys = Seq("id"), deleteColumn = Some("is_del"), sequenceBy = seqBy)

  test("merge sink: upsert + delete + insert, last sequence wins per key") {
    val loc = tmp("graft_susink") + "/t"
    VersionedTable.write(Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v"),
      loc, "overwrite")
    val s = sink(loc)
    // key 2: two events, seq 2 wins; key 3: delete; key 4: unmatched insert;
    // key 9: unmatched delete (no-op)
    s.addBatch(0L, Seq(
      (2L, "b-mid", false, 1L), (2L, "b2", false, 2L),
      (3L, "x", true, 1L), (4L, "d", false, 1L), (9L, "x", true, 1L))
      .toDF("id", "v", "is_del", "seq"))
    val got = VersionedTable.read(spark, loc).orderBy("id")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got === Seq((1L, "a"), (2L, "b2"), (4L, "d")))
  }

  test("merge sink: replaying the same batchId commits nothing") {
    val loc = tmp("graft_sureplay") + "/t"
    VersionedTable.write(Seq((1L, "a")).toDF("id", "v"), loc, "overwrite")
    val s = sink(loc)
    val batch = Seq((1L, "a2", false, 1L)).toDF("id", "v", "is_del", "seq")
    s.addBatch(5L, batch)
    val versions = VersionedTable.commits(spark, loc).map(_.version)
    s.addBatch(5L, batch) // crash-replay: same batchId
    assert(VersionedTable.commits(spark, loc).map(_.version) === versions)
    assert(VersionedTable.read(spark, loc).collect().map(_.getString(1)).toSeq
      === Seq("a2"))
  }

  test("merge sink: first batch bootstraps a fresh table, deletes are no-ops") {
    val loc = tmp("graft_suboot") + "/t"
    val s = sink(loc)
    s.addBatch(0L, Seq((1L, "a", false, 1L), (2L, "x", true, 1L))
      .toDF("id", "v", "is_del", "seq"))
    val got = VersionedTable.read(spark, loc).orderBy("id")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got === Seq((1L, "a")))
    // replay of the bootstrap batch after the table exists must dedupe, not merge
    s.addBatch(0L, Seq((1L, "a", false, 1L)).toDF("id", "v", "is_del", "seq"))
    assert(VersionedTable.commits(spark, loc).size === 1)
    // and the NEXT batch merges normally
    s.addBatch(1L, Seq((1L, "a2", false, 1L)).toDF("id", "v", "is_del", "seq"))
    assert(VersionedTable.read(spark, loc).collect().map(_.getString(1)).toSeq
      === Seq("a2"))
  }

  test("merge sink: sequence ties and unsequenced duplicate keys refuse loudly") {
    val loc = tmp("graft_sutie") + "/t"
    VersionedTable.write(Seq((1L, "a")).toDF("id", "v"), loc, "overwrite")
    val tied = intercept[IllegalArgumentException] {
      sink(loc).addBatch(0L, Seq((1L, "x", false, 7L), (1L, "y", false, 7L))
        .toDF("id", "v", "is_del", "seq"))
    }
    assert(tied.getMessage.contains("sequence ties"))
    val dup = intercept[IllegalArgumentException] {
      sink(loc, seqBy = None).addBatch(0L,
        Seq((1L, "x", false, 1L), (1L, "y", false, 2L))
          .toDF("id", "v", "is_del", "seq"))
    }
    assert(dup.getMessage.contains("duplicate keys"))
    // neither refusal committed anything
    assert(VersionedTable.commits(spark, loc).size === 1)
  }

  test("merge sink with changeFeed: the merge commit materializes CDF rows") {
    val loc = tmp("graft_sucdf") + "/t"
    VersionedTable.write(Seq((1L, "a"), (2L, "b")).toDF("id", "v"),
      loc, "overwrite")
    val s = new GraftTableSink(loc, Nil, explicitTxnApp = Some("cdf-app"),
      mergeKeys = Seq("id"), deleteColumn = Some("is_del"),
      sequenceBy = Some("seq"), changeFeed = true)
    s.addBatch(0L, Seq((1L, "a2", false, 1L), (2L, "", true, 1L),
      (3L, "c", false, 1L)).toDF("id", "v", "is_del", "seq"))
    val head = VersionedTable.commits(spark, loc).last.version
    val changes = VersionedTable.readChanges(spark, loc, head, head)
      .select("id", "_change_type").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(changes === Set((1L, "update_preimage"), (1L, "update_postimage"),
      (2L, "delete"), (3L, "insert")))
  }

  test("writeStream end-to-end: file CDC stream applied with AvailableNow") {
    val loc = tmp("graft_sue2e") + "/t"
    val in = tmp("graft_sue2e_in")
    val chk = tmp("graft_sue2e_chk")
    VersionedTable.write(
      (1L to 6L).map(i => (i, s"v$i")).toDF("id", "v"), loc, "overwrite")
    Seq((2L, "v2b", false, 1L), (2L, "v2c", false, 2L), (5L, "", true, 1L),
      (8L, "v8", false, 1L))
      .toDF("id", "v", "is_del", "seq").coalesce(1)
      .write.mode("overwrite").json(in)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("v",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("is_del",
        org.apache.spark.sql.types.BooleanType),
      org.apache.spark.sql.types.StructField("seq",
        org.apache.spark.sql.types.LongType)))
    val q = spark.readStream.schema(schema).json(in)
      .writeStream.format("graft-table")
      .option("mergeKeys", "id").option("deleteColumn", "is_del")
      .option("sequenceBy", "seq").option("checkpointLocation", chk)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start(loc)
    q.awaitTermination()
    val got = VersionedTable.read(spark, loc).orderBy("id")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got === Seq((1L, "v1"), (2L, "v2c"), (3L, "v3"), (4L, "v4"),
      (6L, "v6"), (8L, "v8")))
    // restarting the drained query re-commits nothing (offset log replay)
    val versions = VersionedTable.commits(spark, loc).map(_.version)
    val q2 = spark.readStream.schema(schema).json(in)
      .writeStream.format("graft-table")
      .option("mergeKeys", "id").option("deleteColumn", "is_del")
      .option("sequenceBy", "seq").option("checkpointLocation", chk)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start(loc)
    q2.awaitTermination()
    assert(VersionedTable.commits(spark, loc).map(_.version) === versions)
  }
}
