package graft

import java.nio.file.Files

import scala.util.Random

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.catalog.VersionedTable

/** Model-based property test of the whole commit protocol: a RANDOM sequence of
  * table operations (appends, copy-on-write and merge-on-read merges, DV
  * deletes and updates, compactions, restores) is applied both to a
  * [[VersionedTable]] and to a trivial in-memory model (a Map keyed by id);
  * after EVERY step the table's read, fastCount, and detail row count must
  * equal the model exactly. Restores check against the model's own history.
  * This is the net that catches cross-feature interactions no targeted spec
  * enumerates — a DV landing on rows a later restore resurrects, a compact
  * materializing between two deletes, a merge replacing DV'd keys.
  */
class ProtocolPropertySpec extends AnyFunSuite with SharedSpark {

  test("random op sequences: table state tracks the model at every version (seed 42)") {
    import spark.implicits._
    val rnd = new Random(42)
    val loc = Files.createTempDirectory("proto_prop").toString + "/t"

    var model = Map.empty[Long, Int]
    var history = Vector.empty[Map[Long, Int]] // index = version
    var nextId = 0L

    def freshIds(n: Int): Seq[Long] = {
      val ids = nextId until (nextId + n)
      nextId += n
      ids
    }
    def toDf(m: Seq[(Long, Int)]) = m.toDF("id", "value")

    def check(step: String): Unit = {
      val actual = VersionedTable.read(spark, loc).select("id", "value")
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      assert(actual === model, s"state diverged after: $step")
      assert(VersionedTable.fastCount(spark, loc) === model.size.toLong,
        s"fastCount diverged after: $step")
      history :+= model
    }

    // v0: base
    val baseIds = freshIds(50)
    model = baseIds.map(_ -> 0).toMap
    VersionedTable.write(toDf(model.toSeq), loc, "overwrite")
    check("base overwrite")

    (1 to 40).foreach { step =>
      rnd.nextInt(7) match {
        case 0 => // append fresh rows
          val rows = freshIds(1 + rnd.nextInt(10)).map(_ -> rnd.nextInt(100))
          VersionedTable.write(toDf(rows), loc, "append")
          model ++= rows
          check(s"$step append")
        case 1 => // DV delete by modulus
          val k = 2 + rnd.nextInt(5); val r = rnd.nextInt(k)
          VersionedTable.deleteWhere(spark, loc, s"id % $k = $r")
          model = model.filter { case (id, _) => id % k != r }
          check(s"$step delete id%$k=$r")
        case 2 => // DV update by modulus
          val k = 2 + rnd.nextInt(5); val r = rnd.nextInt(k)
          VersionedTable.updateWhere(spark, loc, s"id % $k = $r",
            Map("value" -> "value + 1000"))
          model = model.map { case (id, v) =>
            id -> (if (id % k == r) v + 1000 else v) }
          check(s"$step update id%$k=$r")
        case 3 => // copy-on-write merge: upserts over a sample + fresh inserts
          val hits = model.keys.toSeq.sorted.take(5).map(_ -> rnd.nextInt(100))
          val ins = freshIds(3).map(_ -> rnd.nextInt(100))
          VersionedTable.merge(spark, loc, toDf(hits ++ ins), Seq("id"))
          model ++= hits ++ ins
          check(s"$step merge")
        case 4 => // merge-on-read: upserts + explicit deletes + delete no-ops
          val keys = model.keys.toSeq.sorted
          val ups = keys.takeRight(4).map(id => (id, rnd.nextInt(100), false))
          val dels = keys.take(2).map(id => (id, 0, true))
          val noop = Seq((nextId + 999999L, 0, true)) // missing key: no-op
          VersionedTable.mergeOnRead(spark, loc,
            (ups ++ dels ++ noop).toDF("id", "value", "del"),
            Seq("id"), deleteCol = Some("del"))
          model = model -- dels.map(_._1) ++ ups.map(u => u._1 -> u._2)
          check(s"$step mergeOnRead")
        case 5 => // compact (pure rewrite, state unchanged)
          VersionedTable.compact(spark, loc)
          check(s"$step compact")
        case 6 => // restore to a random earlier version
          val v = rnd.nextInt(history.length)
          VersionedTable.restore(spark, loc, v.toLong)
          model = history(v)
          check(s"$step restore -> v$v")
      }
    }
  }

  /** The same net over a HIVE-PARTITIONED table, with dynamic partition
    * overwrite in the mix — the interactions no targeted spec enumerates:
    * a replace shadowing rows a later restore resurrects, a delete DV'ing
    * rows a replace then retires wholesale, a compact folding replace
    * commits, scoped merges stacking on replaces.
    */
  test("random op sequences on a partitioned table incl. replace (seed 7)") {
    import spark.implicits._
    val rnd = new Random(7)
    val loc = Files.createTempDirectory("proto_prop_part").toString + "/t"

    var model = Map.empty[Long, (String, Int)] // id -> (grp, value)
    var history = Vector.empty[Map[Long, (String, Int)]]
    var nextId = 0L

    def freshIds(n: Int): Seq[Long] = {
      val ids = nextId until (nextId + n)
      nextId += n
      ids
    }
    def toDf(m: Seq[(Long, (String, Int))]) =
      m.map { case (id, (g, v)) => (id, g, v) }.toDF("id", "grp", "value")

    def check(step: String): Unit = {
      val actual = VersionedTable.read(spark, loc).select("id", "grp", "value")
        .collect().map(r => r.getLong(0) -> (r.getString(1), r.getInt(2))).toMap
      assert(actual === model, s"state diverged after: $step")
      assert(VersionedTable.fastCount(spark, loc) === model.size.toLong,
        s"fastCount diverged after: $step")
      history :+= model
    }

    val baseIds = freshIds(60)
    model = baseIds.map(id => id -> (s"g${id % 4}", 0)).toMap
    VersionedTable.write(toDf(model.toSeq), loc, "overwrite",
      partitionBy = Seq("grp"))
    check("base overwrite")

    (1 to 30).foreach { step =>
      rnd.nextInt(6) match {
        case 0 => // append fresh rows across groups
          val rows = freshIds(1 + rnd.nextInt(8))
            .map(id => id -> (s"g${id % 4}", rnd.nextInt(100)))
          VersionedTable.write(toDf(rows), loc, "append", partitionBy = Seq("grp"))
          model ++= rows
          check(s"$step append")
        case 1 => // DV delete by modulus
          val k = 2 + rnd.nextInt(5); val r = rnd.nextInt(k)
          VersionedTable.deleteWhere(spark, loc, s"id % $k = $r")
          model = model.filter { case (id, _) => id % k != r }
          check(s"$step delete id%$k=$r")
        case 2 => // dynamic partition overwrite of one group; sometimes an
          // explicit clearing replace instead
          val g = s"g${rnd.nextInt(4)}"
          if (rnd.nextInt(4) == 0) {
            VersionedTable.overwritePartitions(
              toDf(Nil), loc, Some(Seq(Seq("grp" -> g))))
            model = model.filter { case (_, (mg, _)) => mg != g }
            check(s"$step clear $g")
          } else {
            val rows = freshIds(2 + rnd.nextInt(5))
              .map(id => id -> (g, rnd.nextInt(100)))
            VersionedTable.overwritePartitions(toDf(rows), loc)
            model = model.filter { case (_, (mg, _)) => mg != g } ++ rows
            check(s"$step replace $g")
          }
        case 3 => // merge keyed (id, grp): updates over a sample + fresh inserts
          val hits = model.toSeq.sortBy(_._1).take(5)
            .map { case (id, (g, _)) => id -> (g, rnd.nextInt(100)) }
          val ins = freshIds(2).map(id => id -> (s"g${id % 4}", rnd.nextInt(100)))
          VersionedTable.merge(spark, loc, toDf(hits ++ ins), Seq("id", "grp"))
          model ++= hits ++ ins
          check(s"$step merge")
        case 4 => // compact (pure rewrite, state unchanged)
          VersionedTable.compact(spark, loc)
          check(s"$step compact")
        case 5 => // restore to a random earlier version
          val v = rnd.nextInt(history.length)
          VersionedTable.restore(spark, loc, v.toLong)
          model = history(v)
          check(s"$step restore -> v$v")
      }
    }
  }

  /** CONCURRENT races through the optimistic claim loop: merge-on-read, DV
    * deletes (overlapping predicates), a DV update, and appends all run at
    * once on touching-but-deterministic key ranges. The exclusive-create log
    * claim serializes them in SOME order; losers must re-read the new head and
    * recompute their matches (the retry loop), so the final state is the
    * range-algebra answer regardless of interleaving. A stale DV double-apply,
    * a match set computed against a lost head, or a dropped commit all surface
    * as a wrong final map. Three rounds to vary the interleavings.
    */
  test("concurrent mergeOnRead/deleteWhere/updateWhere/appends race to a serializable state") {
    import spark.implicits._
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.global

    (1 to 3).foreach { round =>
      val loc = Files.createTempDirectory(s"proto_race_$round").toString + "/t"
      val base = (0L until 100L).map(_ -> 0)
      VersionedTable.write(base.toDF("id", "value"), loc, "overwrite")

      val ops = Seq(
        // upsert 0..9 → 1000+id, insert 1000..1004, delete-mark 90..94
        Future {
          val ch = (0L until 10L).map(id => (id, 1000 + id.toInt, false)) ++
            (1000L until 1005L).map(id => (id, id.toInt, false)) ++
            (90L until 95L).map(id => (id, 0, true))
          VersionedTable.mergeOnRead(spark, loc, ch.toDF("id", "value", "del"),
            Seq("id"), deleteCol = Some("del"), maxAttempts = 20)
        },
        // two OVERLAPPING DV deletes: 50..59 and 55..64 — the loser must
        // recompute against the winner's head, never re-apply stale matches
        Future { VersionedTable.deleteWhere(spark, loc,
          "id >= 50 AND id < 60", maxAttempts = 20) },
        Future { VersionedTable.deleteWhere(spark, loc,
          "id >= 55 AND id < 65", maxAttempts = 20) },
        Future { VersionedTable.updateWhere(spark, loc, "id >= 20 AND id < 30",
          Map("value" -> "value + 7"), maxAttempts = 20) },
        Future { VersionedTable.write(
          (200L until 210L).map(_ -> 1).toDF("id", "value"), loc, "append") })
      Await.result(Future.sequence(ops), 10.minutes)

      // range algebra: every op's effect is order-independent by construction
      val expected =
        (0L until 10L).map(id => id -> (1000 + id.toInt)).toMap ++
        (10L until 100L).map(_ -> 0).toMap --
        (50L until 65L) -- (90L until 95L) ++
        (20L until 30L).map(_ -> 7).toMap ++
        (1000L until 1005L).map(id => id -> id.toInt).toMap ++
        (200L until 210L).map(_ -> 1).toMap
      val actual = VersionedTable.read(spark, loc).select("id", "value")
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      assert(actual === expected, s"round $round diverged")
      assert(VersionedTable.fastCount(spark, loc) === expected.size.toLong)
      // all five commits landed, each at a distinct version
      val cs = VersionedTable.commits(spark, loc)
      assert(cs.length === 6, s"round $round: ${cs.map(_.operation)}")
      assert(cs.map(_.version) === cs.map(_.version).distinct)
    }
  }

  test("replay twins: racing idempotentMergeOnRead calls with one (txnApp, batchId) commit once") {
    import spark.implicits._
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.global
    (1 to 3).foreach { round =>
      val loc = Files.createTempDirectory(s"proto_twin_$round").toString + "/t"
      VersionedTable.write((0L until 50L).map(_ -> 0).toDF("id", "value"),
        loc, "overwrite")
      val change = (0L until 10L).map(id => (id, 7))
      // four replay twins of the SAME micro-batch (a crashed sink restarted
      // more than once): exactly one merge commit may land
      val results = Await.result(Future.sequence((1 to 4).map(_ => Future {
        VersionedTable.idempotentMergeOnRead(spark, loc,
          change.toDF("id", "value"), Seq("id"),
          txnApp = "twin-app", txnId = 42L, maxAttempts = 20)
      })), 10.minutes)
      assert(results.flatten.size === 1,
        s"round $round: ${results.mkString(",")} — exactly one twin commits")
      val cs = VersionedTable.commits(spark, loc)
      assert(cs.count(c => c.txn_app == "twin-app" && c.txn_id == 42L) === 1)
      assert(cs.length === 2, s"round $round: ${cs.map(_.operation)}")
      // applied exactly once
      val got = VersionedTable.read(spark, loc).select("id", "value")
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      assert(got === (0L until 50L).map(id => id -> (if (id < 10) 7 else 0)).toMap)
      // losers cleaned their staged dirs: everything under _data is referenced
      val referenced = cs.flatMap(c =>
        Seq(c.data_dir, c.dv_dir, c.change_dir).filter(_.nonEmpty)).toSet
      val onDisk = Option(new java.io.File(s"$loc/_data").listFiles()).toSeq
        .flatten.filter(_.isDirectory).map(_.getName).toSet
      assert(onDisk === referenced,
        s"round $round: orphan staged dirs ${onDisk -- referenced}")
      // a later replay of the same batch is a no-op too
      assert(VersionedTable.idempotentMergeOnRead(spark, loc,
        change.toDF("id", "value"), Seq("id"),
        txnApp = "twin-app", txnId = 42L).isEmpty)
    }
  }

  /** Scoped replaces racing merge-on-read and appends on a partitioned table:
    * the replace shadows one partition wholesale while a concurrent
    * merge-on-read rewrites rows of another and an append lands a third —
    * disjoint partitions, so the serialized result is deterministic. Proves
    * the replace's shadow predicate and the merge's DV entries compose under
    * races, not just in sequence.
    */
  test("concurrent scoped replace vs mergeOnRead vs append on a partitioned table") {
    import spark.implicits._
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.global

    (1 to 2).foreach { round =>
      val loc = Files.createTempDirectory(s"proto_race_part_$round").toString + "/t"
      val base = (0L until 90L).map(id => (id, s"g${id % 3}", 0))
      VersionedTable.write(base.toDF("id", "grp", "value"), loc, "overwrite",
        partitionBy = Seq("grp"))

      val ops = Seq(
        // rewrite g0 rows 0,3,6,...,27 via merge-on-read + delete-mark 60..69∩g0
        Future {
          val ch = (0L until 30L by 3).map(id => (id, "g0", 500, false)) ++
            (60L until 70L).filter(_ % 3 == 0).map(id => (id, "g0", 0, true))
          VersionedTable.mergeOnRead(spark, loc,
            ch.toDF("id", "grp", "value", "del"), Seq("id"),
            deleteCol = Some("del"), maxAttempts = 20)
        },
        // replace partition g1 wholesale with 5 fresh rows
        Future { VersionedTable.overwritePartitions(
          (2000L until 2005L).map(id => (id, "g1", 9)).toDF("id", "grp", "value"),
          loc, maxAttempts = 20) },
        // append fresh g2 rows
        Future { VersionedTable.write(
          (3000L until 3010L).map(id => (id, "g2", 1)).toDF("id", "grp", "value"),
          loc, "append", partitionBy = Seq("grp")) })
      Await.result(Future.sequence(ops), 10.minutes)

      val expected =
        base.filter(r => r._2 != "g1")
          .map { case (id, g, v) => id -> (g, v) }.toMap ++
        (0L until 30L by 3).map(id => id -> ("g0", 500)).toMap --
        (60L until 70L).filter(_ % 3 == 0) ++
        (2000L until 2005L).map(id => id -> ("g1", 9)).toMap ++
        (3000L until 3010L).map(id => id -> ("g2", 1)).toMap
      val actual = VersionedTable.read(spark, loc).select("id", "grp", "value")
        .collect().map(r => r.getLong(0) -> (r.getString(1), r.getInt(2))).toMap
      assert(actual === expected, s"round $round diverged")
      assert(VersionedTable.fastCount(spark, loc) === expected.size.toLong)
      assert(VersionedTable.commits(spark, loc).length === 4)
    }
  }
}
