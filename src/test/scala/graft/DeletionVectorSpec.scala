package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.catalog.VersionedTable

/** Merge-on-read deletion vectors: deleteWhere / updateWhere must remove or
  * rewrite rows WITHOUT touching existing data files, compose with time travel,
  * CDF, constraints, compaction, restore, and vacuum, and keep fastCount
  * metadata-only.
  */
class DeletionVectorSpec extends AnyFunSuite with SharedSpark {

  private def freshLoc(tag: String): String =
    Files.createTempDirectory(s"dv_$tag").toString + "/t"

  private def base(loc: String, n: Int = 100): Unit = {
    import spark.implicits._
    val df = (0 until n).map(i => (i.toLong, s"name_$i", i % 10)).toDF("id", "name", "grp")
    VersionedTable.write(df, loc, "overwrite")
  }

  private def dataFiles(loc: String): Set[String] = {
    val dir = new java.io.File(loc, "_data")
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
    walk(dir).filter(_.getName.endsWith(".parquet")).map(_.getAbsolutePath).toSet
  }

  test("deleteWhere removes matching rows without rewriting any data file") {
    val loc = freshLoc("basic")
    base(loc)
    val before = dataFiles(loc)
    val v = VersionedTable.deleteWhere(spark, loc, "id % 10 = 3")
    assert(v === 1)
    val after = dataFiles(loc)
    // every pre-delete data file is still present, byte-identical path set plus
    // only the new DV parquet
    assert(before.subsetOf(after))
    assert((after -- before).forall(_.contains("/v-")))
    val ids = VersionedTable.read(spark, loc).select("id")
      .as[Long](org.apache.spark.sql.Encoders.scalaLong).collect().sorted
    assert(ids.length === 90)
    assert(ids.forall(_ % 10 != 3))
    assert(VersionedTable.fastCount(spark, loc) === 90)
  }

  test("deletes compose across commits and respect time travel") {
    val loc = freshLoc("compose")
    base(loc)
    VersionedTable.deleteWhere(spark, loc, "id < 20")            // v1
    VersionedTable.deleteWhere(spark, loc, "grp = 5")            // v2 (ids 25,35,..95)
    assert(VersionedTable.readAsOf(spark, loc, 0).count() === 100)
    assert(VersionedTable.readAsOf(spark, loc, 1).count() === 80)
    val now = VersionedTable.read(spark, loc)
    assert(now.count() === 72) // 80 - the 8 grp=5 survivors (25..95 step 10)
    assert(VersionedTable.fastCount(spark, loc) === 72)
    assert(now.filter(col("grp") === 5 || col("id") < 20).count() === 0)
  }

  test("delete matching zero rows still commits a versioned no-op") {
    val loc = freshLoc("noop")
    base(loc)
    val v = VersionedTable.deleteWhere(spark, loc, "id > 100000")
    assert(v === 1)
    assert(VersionedTable.fastCount(spark, loc) === 100)
    assert(VersionedTable.read(spark, loc).count() === 100)
  }

  test("NULL condition rows are not deleted (SQL DELETE semantics)") {
    import spark.implicits._
    val loc = freshLoc("nulls")
    val df = Seq((1L, Some(5)), (2L, None), (3L, Some(50))).toDF("id", "x")
    VersionedTable.write(df, loc, "overwrite")
    VersionedTable.deleteWhere(spark, loc, "x > 10") // NULL > 10 is NULL -> keep
    val ids = VersionedTable.read(spark, loc).select("id")
      .as[Long](org.apache.spark.sql.Encoders.scalaLong).collect().sorted
    assert(ids.toSeq === Seq(1L, 2L))
  }

  test("delete with changeFeed materializes the feed; without it the feed is reconstructed") {
    val loc = freshLoc("cdf")
    base(loc)
    VersionedTable.deleteWhere(spark, loc, "id < 5", changeFeed = true)  // v1
    VersionedTable.deleteWhere(spark, loc, "id >= 95")                   // v2, no feed
    val fed = VersionedTable.readChanges(spark, loc, 1, 1)
    assert(fed.select("_change_type").distinct().collect().map(_.getString(0)).toSeq
      === Seq("delete"))
    assert(fed.count() === 5)
    // v2 had no materialized feed: reconstructed from the DV + pre-delete snapshot
    val rec = VersionedTable.readChanges(spark, loc, 2, 2)
    assert(rec.count() === 5)
    assert(rec.select("id").collect().map(_.getLong(0)).sorted.toSeq
      === Seq(95L, 96L, 97L, 98L, 99L))
    assert(rec.columns.contains("_change_type"))
  }

  test("updateWhere rewrites only matched rows, keeps files, emits pre/post images") {
    val loc = freshLoc("update")
    base(loc)
    val before = dataFiles(loc)
    VersionedTable.updateWhere(spark, loc, "grp = 2",
      Map("name" -> "concat(name, '!')"), changeFeed = true)
    assert(before.subsetOf(dataFiles(loc)))
    val now = VersionedTable.read(spark, loc)
    assert(now.count() === 100)
    assert(VersionedTable.fastCount(spark, loc) === 100)
    assert(now.filter(col("grp") === 2 && !col("name").endsWith("!")).count() === 0)
    assert(now.filter(col("grp") =!= 2 && col("name").endsWith("!")).count() === 0)
    val feed = VersionedTable.readChanges(spark, loc, 1, 1)
    assert(feed.filter(col("_change_type") === "update_preimage").count() === 10)
    assert(feed.filter(col("_change_type") === "update_postimage").count() === 10)
  }

  test("updateWhere casts assignments back to the column type and enforces constraints") {
    val loc = freshLoc("constraint")
    base(loc)
    VersionedTable.addConstraint(spark, loc, "grp_range", "grp BETWEEN 0 AND 10")
    // int column assigned a long-producing expression: cast keeps the schema
    VersionedTable.updateWhere(spark, loc, "id = 0", Map("grp" -> "grp + 1"))
    assert(VersionedTable.read(spark, loc).schema("grp").dataType
      === org.apache.spark.sql.types.IntegerType)
    val e = intercept[IllegalArgumentException] {
      VersionedTable.updateWhere(spark, loc, "id = 1", Map("grp" -> "99"))
    }
    assert(e.getMessage.contains("grp_range"))
    // the failed update must not have landed
    assert(VersionedTable.read(spark, loc)
      .filter(col("grp") === 99).count() === 0)
  }

  test("compact materializes deletions away; restore resurrects them") {
    val loc = freshLoc("compact")
    base(loc)
    VersionedTable.deleteWhere(spark, loc, "id % 2 = 0")  // v1
    VersionedTable.compact(spark, loc)                     // v2
    assert(VersionedTable.read(spark, loc).count() === 50)
    // post-compact scan must come exclusively from the compacted commit
    val inputs = VersionedTable.read(spark, loc).inputFiles
    assert(inputs.nonEmpty)
    val compactDir = VersionedTable.commits(spark, loc).last.data_dir
    assert(inputs.forall(_.contains(compactDir)))
    VersionedTable.restore(spark, loc, 0)                  // v3
    assert(VersionedTable.read(spark, loc).count() === 100)
  }

  test("deletes work on a hive-partitioned table with partition pruning intact") {
    import spark.implicits._
    val loc = freshLoc("part")
    val df = (0 until 100).map(i => (i.toLong, s"p${i % 4}")).toDF("id", "part")
    VersionedTable.write(df, loc, "overwrite", partitionBy = Seq("part"))
    VersionedTable.deleteWhere(spark, loc, "part = 'p1' AND id < 50")
    val now = VersionedTable.read(spark, loc)
    assert(now.count() === 100 - 13) // p1 ids: 1,5,...,49 -> 13 under 50
    assert(VersionedTable.fastCount(spark, loc) === 87)
    assert(now.filter(col("part") === "p1").count() === 12)
  }

  test("vacuum reclaims DV dirs once a later full-state commit is out of retention") {
    val loc = freshLoc("vacuum")
    base(loc)
    VersionedTable.deleteWhere(spark, loc, "id < 10")  // v1 with DV
    val dvDir = VersionedTable.commits(spark, loc).last.dv_dir
    assert(dvDir.nonEmpty)
    VersionedTable.compact(spark, loc)                  // v2 full state
    VersionedTable.vacuum(spark, loc, retentionMs = 0L, orphanGraceMs = 0L)
    assert(!new java.io.File(s"$loc/_data/$dvDir").exists())
    assert(VersionedTable.read(spark, loc).count() === 90)
  }

  test("manifest generation refuses a DV-bearing snapshot") {
    val loc = freshLoc("manifest")
    base(loc)
    VersionedTable.deleteWhere(spark, loc, "id = 1")
    val e = intercept[IllegalArgumentException] {
      VersionedTable.generateManifest(spark, loc)
    }
    assert(e.getMessage.contains("deletion vectors"))
    VersionedTable.compact(spark, loc)
    assert(VersionedTable.generateManifest(spark, loc).nonEmpty)
  }

  test("history records delete/update commits with their DV metadata") {
    val loc = freshLoc("history")
    base(loc)
    VersionedTable.deleteWhere(spark, loc, "id < 10")
    VersionedTable.updateWhere(spark, loc, "id = 50", Map("name" -> "'x'"))
    val h = VersionedTable.history(spark, loc)
      .select("version", "operation", "row_count", "replaced_rows")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(h.toSet === Set((0L, "overwrite", 100L, 0L),
      (1L, "delete", 0L, 10L), (2L, "update", 1L, 1L)))
  }

  test("mergeOnRead: upsert semantics identical to copy-on-write merge, zero files rewritten") {
    import spark.implicits._
    val locA = freshLoc("mor_a"); val locB = freshLoc("mor_b")
    val baseDf = (0 until 100).map(i => (i.toLong, s"v0_$i", i % 10)).toDF("id", "name", "grp")
    VersionedTable.write(baseDf, locA, "overwrite")
    VersionedTable.write(baseDf, locB, "overwrite")
    // updates [50,80), inserts [100,110), deletes [0,10), delete no-ops [200,205)
    val changes = (50 until 80).map(i => (i.toLong, s"v1_$i", i % 10, false))
      .++((100 until 110).map(i => (i.toLong, s"new_$i", i % 10, false)))
      .++((0 until 10).map(i => (i.toLong, "", 0, true)))
      .++((200 until 205).map(i => (i.toLong, "", 0, true)))
      .toDF("id", "name", "grp", "is_del")
    val before = dataFiles(locA)
    VersionedTable.mergeOnRead(spark, locA, changes, Seq("id"),
      deleteCol = Some("is_del"))
    assert(before.subsetOf(dataFiles(locA))) // nothing rewritten
    VersionedTable.merge(spark, locB, changes, Seq("id"),
      deleteCol = Some("is_del"))
    val a = VersionedTable.read(spark, locA).orderBy("id").collect().toSeq
    val b = VersionedTable.read(spark, locB).orderBy("id").collect().toSeq
    assert(a === b)
    assert(VersionedTable.fastCount(spark, locA) === 100L)
    assert(VersionedTable.fastCount(spark, locA)
      === VersionedTable.read(spark, locA).count())
  }

  test("mergeOnRead change feed matches the copy-on-write merge feed") {
    import spark.implicits._
    val locA = freshLoc("morf_a"); val locB = freshLoc("morf_b")
    val baseDf = (0 until 50).map(i => (i.toLong, s"v0_$i")).toDF("id", "name")
    VersionedTable.write(baseDf, locA, "overwrite")
    VersionedTable.write(baseDf, locB, "overwrite")
    val changes = (40 until 60).map(i => (i.toLong, s"v1_$i", i % 4 == 0))
      .toDF("id", "name", "is_del")
    VersionedTable.mergeOnRead(spark, locA, changes, Seq("id"),
      deleteCol = Some("is_del"), changeFeed = true)
    VersionedTable.merge(spark, locB, changes, Seq("id"),
      deleteCol = Some("is_del"), changeFeed = true)
    def feed(loc: String) = VersionedTable.readChanges(spark, loc, 1, 1)
      .select("id", "name", "_change_type").orderBy("id", "_change_type")
      .collect().toSeq
    assert(feed(locA) === feed(locB))
  }

  test("a delete that loses every claim cleans up its staged DV and change dirs") {
    val loc = freshLoc("race")
    base(loc)
    // an in-flight writer holds the next version slot (incomplete commit body —
    // exactly what a crashed/flushing writer leaves): every claim attempt loses
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$loc/_commit_log/1.json"), "{\"version\":1")
    intercept[IllegalStateException] {
      VersionedTable.deleteWhere(spark, loc, "id < 5", changeFeed = true,
        maxAttempts = 2)
    }
    val dirs = new java.io.File(s"$loc/_data").listFiles().map(_.getName)
    assert(!dirs.exists(_.startsWith("v-")), s"staged DV dir leaked: ${dirs.toSeq}")
    assert(!dirs.exists(_.startsWith("c-")), s"staged feed dir leaked: ${dirs.toSeq}")
    // the table is untouched
    java.nio.file.Files.delete(java.nio.file.Paths.get(s"$loc/_commit_log/1.json"))
    assert(VersionedTable.read(spark, loc).count() === 100)
  }

  test("mixed concurrent appends, DV deletes, and an update keep the log linear and counts exact") {
    import spark.implicits._
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val loc = freshLoc("stress")
    base(loc) // ids 0..99
    // operand sets are disjoint, so the final state is deterministic no matter
    // how the 9 writers interleave; every lost claim must recompute, not corrupt
    val ops: Seq[() => Any] =
      (0 until 4).map(i => () => VersionedTable.write(
        (100 + i * 10 until 110 + i * 10).map(j => (j.toLong, s"a$j", j % 10))
          .toDF("id", "name", "grp"), loc, "append")) ++
      (0 until 4).map(i => () => VersionedTable.deleteWhere(spark, loc,
        s"id >= ${i * 10} AND id < ${i * 10 + 10}", maxAttempts = 64)) :+
      (() => VersionedTable.updateWhere(spark, loc, "id >= 90 AND id < 100",
        Map("name" -> "'upd'"), maxAttempts = 64))
    Await.result(Future.sequence(ops.map(f => Future(f()))), 5.minutes)
    val cs = VersionedTable.commits(spark, loc)
    assert(cs.map(_.version) === (0L to 9L))
    val now = VersionedTable.read(spark, loc)
    assert(now.count() === 100) // 100 - 40 deleted + 40 appended
    assert(VersionedTable.fastCount(spark, loc) === 100)
    assert(now.filter(col("id") < 40).count() === 0)
    assert(now.filter(col("id") >= 100).count() === 40)
    assert(now.filter(col("id") >= 90 && col("id") < 100 &&
      col("name") =!= "upd").count() === 0)
  }

  test("checkpointed log round-trips dv_dir") {
    val loc = freshLoc("ckpt")
    base(loc)
    VersionedTable.deleteWhere(spark, loc, "id < 10")
    VersionedTable.checkpoint(spark, loc)
    val cs = VersionedTable.commits(spark, loc)
    assert(cs.last.dv_dir.nonEmpty)
    assert(VersionedTable.read(spark, loc).count() === 90)
  }
}
