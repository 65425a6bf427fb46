package graft

import java.util.concurrent.atomic.AtomicReference

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.catalog.VersionedTable

/** GENERATED ALWAYS AS IDENTITY: engine-assigned, unique, monotone across the
  * table's whole life; deterministic under `orderWithin`; allocation
  * serialized against concurrent appends; ALWAYS enforced (a batch carrying
  * the column refuses).
  */
class IdentityColumnSpec extends AnyFunSuite with SharedSpark {

  import spark.implicits._

  private def fresh(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_id_$tag").toString + "/t"

  test("deterministic assignment under orderWithin; monotone across appends") {
    val loc = fresh("det")
    VersionedTable.addIdentityColumn(spark, loc, "rid", start = 1000L,
      step = 2L, orderWithin = Seq("k"))
    VersionedTable.write(Seq((5L, "e"), (1L, "a"), (3L, "c")).toDF("k", "v"),
      loc, "overwrite")
    VersionedTable.write(Seq((9L, "z"), (7L, "y")).toDF("k", "v"), loc, "append")
    val rows = VersionedTable.read(spark, loc).orderBy("k").collect()
      .map(r => (r.getAs[Long]("k"), r.getAs[Long]("rid"))).toSeq
    // batch 1 sorted by k → 1000, 1002, 1004; batch 2 continues at 1006
    assert(rows === Seq((1L, 1000L), (3L, 1002L), (5L, 1004L),
      (7L, 1006L), (9L, 1008L)))
    // reruns of the same batches assign identically (orderWithin determinism)
    val loc2 = fresh("det2")
    VersionedTable.addIdentityColumn(spark, loc2, "rid", 1000L, 2L, Seq("k"))
    VersionedTable.write(
      Seq((3L, "c"), (5L, "e"), (1L, "a")).toDF("k", "v").repartition(3),
      loc2, "overwrite")
    val r2 = VersionedTable.read(spark, loc2).orderBy("k").collect()
      .map(r => (r.getAs[Long]("k"), r.getAs[Long]("rid"))).toSeq
    assert(r2 === Seq((1L, 1000L), (3L, 1002L), (5L, 1004L)))
  }

  test("ids are never reused: deletes, overwrites, restores do not donate back") {
    val loc = fresh("mono")
    VersionedTable.addIdentityColumn(spark, loc, "rid", orderWithin = Seq("k"))
    VersionedTable.write((0L until 10L).toDF("k"), loc, "overwrite") // rids 0..9
    VersionedTable.deleteWhere(spark, loc, "rid >= 5")
    VersionedTable.write(Seq(100L).toDF("k"), loc, "append")
    // the deleted rids 5..9 are burnt: the append starts at 10
    assert(VersionedTable.read(spark, loc).agg(max(col("rid"))).collect()
      .head.getLong(0) === 10L)
    // an overwrite discards the rows but not the watermark
    VersionedTable.write(Seq(200L).toDF("k"), loc, "overwrite")
    val rid = VersionedTable.read(spark, loc).select("rid").collect()
      .map(_.getLong(0)).toSeq
    assert(rid === Seq(11L))
    // a RESTORE resurrects old rows WITH their old ids — and the next append
    // still allocates past the all-time watermark, not the restored max
    VersionedTable.restore(spark, loc, 0L) // back to rids 0..9
    VersionedTable.write(Seq(300L).toDF("k"), loc, "append")
    val after = VersionedTable.read(spark, loc).select("rid").collect()
      .map(_.getLong(0)).sorted.toSeq
    assert(after === ((0L until 10L) :+ 12L),
      s"restore leaked or reused identity values: $after")
  }

  test("concurrent appends allocate disjoint ranges (DDL-lock serialized)") {
    val loc = fresh("conc")
    VersionedTable.addIdentityColumn(spark, loc, "rid")
    VersionedTable.write(Seq(0L).toDF("k"), loc, "overwrite")
    val err = new AtomicReference[Throwable]()
    val threads = (1 to 4).map { i =>
      new Thread(() =>
        try VersionedTable.write(
          (0 until 25).map(j => i * 1000L + j).toDF("k"), loc, "append")
        catch { case t: Throwable => err.compareAndSet(null, t) })
    }
    threads.foreach(_.start()); threads.foreach(_.join(120000))
    assert(err.get() == null, String.valueOf(err.get()))
    val rids = VersionedTable.read(spark, loc).select("rid").collect()
      .map(_.getLong(0)).sorted.toSeq
    assert(rids === (0L until 101L), // 1 + 4×25 rows, dense, no duplicates
      s"identity ranges overlapped or gapped: ${rids.take(20)}...")
  }

  test("idempotentAppend assigns ids; a replayed txn never burns a range") {
    val loc = fresh("idem")
    VersionedTable.addIdentityColumn(spark, loc, "rid", orderWithin = Seq("k"))
    VersionedTable.write(Seq(0L).toDF("k"), loc, "overwrite") // rid 0
    assert(VersionedTable.idempotentAppend(
      Seq(10L, 11L).toDF("k"), loc, "app", 1L).isDefined)     // rids 1, 2
    // replay of the same (txnApp, txnId): deduped BEFORE allocation
    assert(VersionedTable.idempotentAppend(
      Seq(10L, 11L).toDF("k"), loc, "app", 1L).isEmpty)
    assert(VersionedTable.idempotentAppend(
      Seq(20L).toDF("k"), loc, "app", 2L).isDefined)          // rid 3, no gap
    val rids = VersionedTable.read(spark, loc).select("rid").collect()
      .map(_.getLong(0)).sorted.toSeq
    assert(rids === Seq(0L, 1L, 2L, 3L))
  }

  test("CALL add_identity declares through pure SQL") {
    val wh = java.nio.file.Files.createTempDirectory("graft_idsql").toString
    spark.conf.set("spark.sql.catalog.gid",
      classOf[graft.sources.table.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gid.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gid.t")
    spark.sql("CREATE TABLE gid.t.ids (k BIGINT, rid BIGINT)")
    spark.sql("CALL gid.system.add_identity(table => 't.ids', name => 'rid', " +
      "start => 5, step => 3, order_within => 'k')")
    spark.sql("INSERT INTO gid.t.ids (k) SELECT id FROM range(3)")
    val rows = spark.sql("SELECT k, rid FROM gid.t.ids ORDER BY k").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(rows === Seq((0L, 5L), (1L, 8L), (2L, 11L)))
    // SQL INSERT carrying the column refuses (ALWAYS)
    val e = intercept[Exception] {
      spark.sql("INSERT INTO gid.t.ids VALUES (9, 99)")
    }
    assert(e.getMessage.contains("GENERATED ALWAYS"))
    // and the sibling procedure declares expression-generated columns
    spark.sql("CREATE TABLE gid.t.gen (k BIGINT, dbl BIGINT)")
    spark.sql("CALL gid.system.add_generated(table => 't.gen', name => 'dbl', " +
      "gen_sql => 'k * 2')")
    spark.sql("INSERT INTO gid.t.gen (k) SELECT id FROM range(3)")
    assert(spark.sql("SELECT sum(dbl) FROM gid.t.gen").collect().head.getLong(0) === 6L)
  }

  test("ALWAYS is enforced; one identity per table; bad declarations refuse") {
    val loc = fresh("refuse")
    VersionedTable.addIdentityColumn(spark, loc, "rid")
    val e1 = intercept[IllegalArgumentException] {
      VersionedTable.write(Seq((1L, 9L)).toDF("k", "rid"), loc, "overwrite")
    }
    assert(e1.getMessage.contains("GENERATED ALWAYS"))
    val e2 = intercept[IllegalArgumentException] {
      VersionedTable.addIdentityColumn(spark, loc, "rid2")
    }
    assert(e2.getMessage.contains("one per table"))
    intercept[IllegalArgumentException] {
      VersionedTable.addIdentityColumn(spark, fresh("neg"), "x", step = 0L)
    }
    // declaring over a column that already holds data refuses
    val loc2 = fresh("data")
    VersionedTable.write(Seq((1L, 5L)).toDF("k", "rid"), loc2, "overwrite")
    val e3 = intercept[IllegalArgumentException] {
      VersionedTable.addIdentityColumn(spark, loc2, "rid")
    }
    assert(e3.getMessage.contains("already carries data"))
  }
}
