package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Scd2

class Scd2Spec extends AnyFunSuite with SharedSpark {

  private def ts(s: String) = Timestamp.valueOf(s)

  private def changes = {
    import spark.implicits._
    // key 1: create → update → update (current)
    // key 2: create → delete (no current row)
    // key 3: create → delete → re-insert (current again)
    Seq(
      (1L, ts("2024-01-01 00:00:00"), "c", "a"),
      (1L, ts("2024-01-02 00:00:00"), "u", "b"),
      (1L, ts("2024-01-03 00:00:00"), "u", "c"),
      (2L, ts("2024-01-01 12:00:00"), "c", "x"),
      (2L, ts("2024-01-02 12:00:00"), "d", "x"),
      (3L, ts("2024-01-01 06:00:00"), "c", "p"),
      (3L, ts("2024-01-02 06:00:00"), "d", "p"),
      (3L, ts("2024-01-03 06:00:00"), "c", "q")
    ).toDF("id", "ts", "op", "attr")
  }

  test("scd2 history: versions chain, ranges abut, one current per live key") {
    val h = Scd2.history(changes, key = Seq("id"), tsCol = "ts",
      opCol = Some("op")).orderBy("id", "version_seq").collect()
    // key 1: 3 versions; key 2: 1 (closed); key 3: 2 (first closed by delete)
    assert(h.length === 6)
    val k1 = h.filter(_.getLong(0) == 1L)
    assert(k1.map(_.getAs[Long]("version_seq")).toSeq === Seq(1L, 2L, 3L))
    // each version's effective_to equals the next version's effective_from
    assert(k1(0).getAs[Timestamp]("effective_to") ===
      k1(1).getAs[Timestamp]("effective_from"))
    assert(k1(1).getAs[Timestamp]("effective_to") ===
      k1(2).getAs[Timestamp]("effective_from"))
    assert(k1.map(_.getAs[Boolean]("is_current")).toSeq === Seq(false, false, true))
    // key 2: the delete closed the only version and emitted none itself
    val k2 = h.filter(_.getLong(0) == 2L)
    assert(k2.length === 1)
    assert(!k2(0).getAs[Boolean]("is_current"))
    assert(k2(0).getAs[Timestamp]("effective_to") === ts("2024-01-02 12:00:00"))
    // key 3: delete closed v1; re-insert is v2 and current (gapless numbering)
    val k3 = h.filter(_.getLong(0) == 3L)
    assert(k3.map(_.getAs[Long]("version_seq")).toSeq === Seq(1L, 2L))
    assert(k3.map(_.getAs[Boolean]("is_current")).toSeq === Seq(false, true))
    assert(k3(0).getAs[Timestamp]("effective_to") === ts("2024-01-02 06:00:00"))
  }

  test("scd2 current: one open row per surviving key, deletes suppress the key") {
    val c = Scd2.current(changes, key = Seq("id"), tsCol = "ts", opCol = Some("op"))
      .orderBy("id").collect()
    assert(c.map(_.getLong(0)).toSeq === Seq(1L, 3L))
    assert(c.map(_.getAs[String]("attr")).toSeq === Seq("c", "q"))
    // snapshot carries only the change-log columns
    assert(c.head.schema.fieldNames.toSet === Set("id", "ts", "op", "attr"))
  }

  test("scd2: same-timestamp changes order by the tie-break") {
    import spark.implicits._
    val df = Seq(
      (1L, ts("2024-01-01 00:00:00"), 2L, "second"),
      (1L, ts("2024-01-01 00:00:00"), 1L, "first")
    ).toDF("id", "ts", "seq", "attr")
    val h = Scd2.history(df, key = Seq("id"), tsCol = "ts", tieBreak = Seq("seq"))
      .orderBy("version_seq").collect()
    assert(h.map(_.getAs[String]("attr")).toSeq === Seq("first", "second"))
    assert(h(0).getAs[Timestamp]("effective_to") === ts("2024-01-01 00:00:00"))
    assert(h.map(_.getAs[Boolean]("is_current")).toSeq === Seq(false, true))
  }

  test("scd2 invariants hold on a randomized change log") {
    import spark.implicits._
    // deterministic pseudo-random log: 40 keys × up to 25 changes, ~15% deletes
    val rnd = new scala.util.Random(42)
    val log = (1 to 40).flatMap { k =>
      (0 until (1 + rnd.nextInt(25))).map { i =>
        val op = if (rnd.nextDouble() < 0.15) "d" else "u"
        (k.toLong, ts(f"2024-01-${1 + rnd.nextInt(28)}%02d 10:00:00"),
          rnd.nextLong().abs, op, s"v$i")
      }
    }
    val df = log.toDF("id", "ts", "seq", "op", "attr")
    val h = Scd2.history(df, key = Seq("id"), tsCol = "ts", tieBreak = Seq("seq"),
      opCol = Some("op")).collect()

    h.groupBy(_.getLong(0)).foreach { case (id, rows) =>
      val sorted = rows.sortBy(_.getAs[Long]("version_seq"))
      // gapless numbering from 1
      assert(sorted.map(_.getAs[Long]("version_seq")).toSeq ===
        (1L to sorted.length).toSeq, s"key $id")
      // ranges chain: each effective_to equals the NEXT surviving version's
      // effective_from — unless a delete intervened, which only shortens the gap
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          val to = a.getAs[Timestamp]("effective_to")
          assert(to !== null, s"key $id: non-final version left open")
          assert(!to.after(b.getAs[Timestamp]("effective_from")), s"key $id: overlap")
        case _ =>
      }
      // at most one current version, and only for keys whose final change survived
      val nCurrent = sorted.count(_.getAs[Boolean]("is_current"))
      assert(nCurrent <= 1, s"key $id: $nCurrent current rows")
      val lastOpen = sorted.last.getAs[Timestamp]("effective_to") == null
      assert((nCurrent == 1) === lastOpen, s"key $id")
    }
  }

  test("scd2 applyChanges: incremental fold equals the full rebuild on in-order splits") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val log = (1 to 30).flatMap { k =>
      (0 until (1 + rnd.nextInt(12))).map { i =>
        val op = if (rnd.nextDouble() < 0.2) "d" else "u"
        (k.toLong, ts(f"2024-${1 + rnd.nextInt(12)}%02d-${1 + rnd.nextInt(28)}%02d 10:00:00"),
          rnd.nextLong().abs, op, s"v$i")
      }
    }
    val cols = Seq("id", "ts", "seq", "op", "attr")
    // in-order split: per key, batch 1 = changes before the key's median ts
    val df = log.toDF(cols: _*)
    val cut = ts("2024-07-01 00:00:00")
    val b1 = df.filter(col("ts") < lit(cut))
    val b2 = df.filter(col("ts") >= lit(cut))
    val full = Scd2.history(df, Seq("id"), "ts", Seq("seq"), Some("op"))
    val incr = Scd2.applyChanges(
      Scd2.history(b1, Seq("id"), "ts", Seq("seq"), Some("op")),
      b2, Seq("id"), "ts", Seq("seq"), Some("op"))
    val sel = (d: org.apache.spark.sql.DataFrame) =>
      d.select("id", "ts", "seq", "op", "attr", "effective_from", "effective_to",
        "version_seq", "is_current").orderBy("id", "version_seq")
        .collect().map(_.toSeq).toSeq
    assert(sel(incr) === sel(full))
  }

  test("scd2 applyChanges: delete then re-insert across the batch boundary") {
    import spark.implicits._
    val cols = Seq("id", "ts", "op", "attr")
    val b1 = Seq(
      (1L, ts("2024-01-01 00:00:00"), "c", "a"),
      (1L, ts("2024-01-02 00:00:00"), "d", "a"),
      (2L, ts("2024-01-01 00:00:00"), "c", "x")).toDF(cols: _*)
    val b2 = Seq(
      (1L, ts("2024-01-03 00:00:00"), "c", "b"), // re-insert deleted key
      (3L, ts("2024-01-03 00:00:00"), "c", "z")).toDF(cols: _*)
    val h1 = Scd2.history(b1, Seq("id"), "ts", opCol = Some("op"))
    val got = Scd2.applyChanges(h1, b2, Seq("id"), "ts", opCol = Some("op"))
      .orderBy("id", "version_seq").collect()
    val full = Scd2.history(b1.unionByName(b2), Seq("id"), "ts", opCol = Some("op"))
      .orderBy("id", "version_seq").collect()
    assert(got.map(_.toSeq).toSeq === full.map(_.toSeq).toSeq)
    // untouched key 2 still current; key 1's re-insert continues the numbering
    val k1 = got.filter(_.getLong(0) == 1L)
    assert(k1.map(_.getAs[Long]("version_seq")).toSeq === Seq(1L, 2L))
    assert(k1.map(_.getAs[Boolean]("is_current")).toSeq === Seq(false, true))
  }

  test("scd2 maintained incrementally from a versioned table's change feed") {
    import spark.implicits._
    import graft.catalog.VersionedTable
    // the canonical CDC-consumption composition: a dimension table maintained by
    // merges, and a downstream SCD2 history fed ONLY from the change feed — the
    // consumer never rereads or diffs snapshots, exactly the 100 TB contract
    val loc = java.nio.file.Files.createTempDirectory("scd2_cdf").toString
    VersionedTable.write(Seq((1L, "a"), (2L, "b")).toDF("id", "v"), loc) // v0
    VersionedTable.merge(spark, loc,
      Seq((1L, "A", false), (3L, "c", false)).toDF("id", "v", "is_delete"),
      Seq("id"), deleteCol = Some("is_delete"), changeFeed = true)       // v1
    VersionedTable.merge(spark, loc,
      Seq((2L, "", true), (3L, "C", false)).toDF("id", "v", "is_delete"),
      Seq("id"), deleteCol = Some("is_delete"), changeFeed = true)       // v2

    // CDF → SCD2 change log: post-images and inserts upsert, deletes tombstone,
    // pre-images drop; the commit version is the effective ordering
    def asLog(feed: org.apache.spark.sql.DataFrame) = feed
      .filter(col("_change_type") =!= "update_preimage")
      .select(col("id"), col("v"), col("_commit_version").as("cv"),
        when(col("_change_type") === "delete", "d").otherwise("u").as("op"))
    def feed(from: Long, to: Long) = asLog(
      VersionedTable.readChanges(spark, loc, from, to, allowFullRewrites = true))

    val incr = Seq(1L, 2L).foldLeft(
      Scd2.history(feed(0, 0), Seq("id"), "cv", opCol = Some("op"))) {
      (h, v) => Scd2.applyChanges(h, feed(v, v), Seq("id"), "cv", opCol = Some("op"))
    }
    val full = Scd2.history(feed(0, 2), Seq("id"), "cv", opCol = Some("op"))
    val sel = (d: org.apache.spark.sql.DataFrame) =>
      d.select("id", "v", "cv", "effective_from", "effective_to", "version_seq",
        "is_current").orderBy("id", "version_seq").collect().map(_.toSeq).toSeq
    assert(sel(incr) === sel(full))
    // the history's current rows ARE the table's live state
    assert(incr.filter(col("is_current")).select("id", "v")
      .as[(Long, String)].collect().sortBy(_._1).toSeq ===
      VersionedTable.read(spark, loc).as[(Long, String)].collect().sortBy(_._1).toSeq)
    // and the closed row carries key 1's pre-update value with a bounded range
    val k1 = incr.filter(col("id") === 1L).orderBy("version_seq")
      .select("v", "is_current").as[(String, Boolean)].collect().toSeq
    assert(k1 === Seq(("a", false), ("A", true)))
  }

  test("scd2: single shuffle — one Exchange in the physical plan") {
    val h = Scd2.history(changes, key = Seq("id"), tsCol = "ts", opCol = Some("op"))
    val plan = h.queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges === 1, s"expected 1 shuffle, plan:\n$plan")
  }
}
