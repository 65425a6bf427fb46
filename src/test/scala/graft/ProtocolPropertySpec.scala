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
}
