package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.catalog.VersionedTable

/** Type widening (`widenColumn` / SQL `ALTER COLUMN ... TYPE`): metadata-only,
  * value-preserving lattice only, schema-time-travel aware, composed with
  * merges, DVs, stats pruning, and compaction.
  */
class WideningSpec extends AnyFunSuite with SharedSpark {

  import spark.implicits._

  private def tmp(p: String): String =
    java.nio.file.Files.createTempDirectory(p).toString + "/t"

  test("int→bigint: no rewrite, mixed commits read wide, appends cast") {
    val loc = tmp("graft_widen")
    VersionedTable.write((0 until 50).map(i => (i, s"v$i")).toDF("n", "v"),
      loc, "overwrite")
    // second commit so the widen DDL binds at v1 — v0 stays pre-DDL for the
    // schema-time-travel assert (a DDL binds AT the head version, inclusive)
    VersionedTable.write((50 until 100).map(i => (i, s"v$i")).toDF("n", "v"),
      loc, "append")
    val filesBefore = VersionedTable.read(spark, loc).inputFiles.toSet
    VersionedTable.widenColumn(spark, loc, "n", "BIGINT")
    // metadata-only: same files, wide schema immediately
    val after = VersionedTable.read(spark, loc)
    assert(after.schema("n").dataType === LongType)
    assert(after.inputFiles.toSet === filesBefore)
    // an append past Int.MaxValue lands; a NARROW int append is accepted too
    VersionedTable.write(Seq((5000000000L, "big")).toDF("n", "v"), loc, "append")
    VersionedTable.write(Seq((777, "narrow")).toDF("n", "v"), loc, "append")
    val got = VersionedTable.read(spark, loc).orderBy("n")
    assert(got.schema("n").dataType === LongType)
    assert(got.filter(col("n") > 2000000000L).count() === 1)
    assert(got.count() === 102)
    // time travel BEFORE the DDL still reads the narrow type
    assert(VersionedTable.readAsOf(spark, loc, 0).schema("n").dataType
      === IntegerType)
    // stats pruning still fires across narrow and wide commits
    assert(VersionedTable.readPruned(spark, loc, "n", 5000000000.0, 6e9)
      .count() === 1)
    // a compact rewrites the live set wide and reads stay correct
    VersionedTable.compact(spark, loc)
    assert(VersionedTable.read(spark, loc).schema("n").dataType === LongType)
    assert(VersionedTable.read(spark, loc).count() === 102)
  }

  test("refusals: narrowing, non-lattice, partition and identity columns") {
    val loc = tmp("graft_widenref")
    VersionedTable.write(Seq((1L, 1.5f, 7)).toDF("id", "f", "p"),
      loc, "overwrite", partitionBy = Seq("p"))
    intercept[IllegalArgumentException] {
      VersionedTable.widenColumn(spark, loc, "id", "INT") // narrowing
    }
    intercept[IllegalArgumentException] {
      VersionedTable.widenColumn(spark, loc, "f", "STRING") // off-lattice
    }
    intercept[IllegalArgumentException] {
      VersionedTable.widenColumn(spark, loc, "p", "BIGINT") // partition col
    }
    VersionedTable.widenColumn(spark, loc, "f", "DOUBLE") // float→double OK
    assert(VersionedTable.read(spark, loc).schema("f").dataType === DoubleType)
    // idempotent second declaration is a no-op
    VersionedTable.widenColumn(spark, loc, "f", "DOUBLE")
  }

  test("SQL surface: ALTER COLUMN TYPE through the DSv2 catalog") {
    val wh = java.nio.file.Files.createTempDirectory("graft_widensql").toString
    spark.conf.set("spark.sql.catalog.gwd",
      classOf[graft.sources.table.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gwd.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gwd.t")
    spark.sql("CREATE TABLE gwd.t.w (id INT, v STRING)")
    spark.sql("INSERT INTO gwd.t.w VALUES (1, 'a'), (2, 'b')")
    spark.sql("ALTER TABLE gwd.t.w ALTER COLUMN id TYPE BIGINT")
    assert(spark.table("gwd.t.w").schema("id").dataType === LongType)
    spark.sql("INSERT INTO gwd.t.w VALUES (4000000000, 'big')")
    assert(spark.sql("SELECT max(id) FROM gwd.t.w").collect().head.getLong(0)
      === 4000000000L)
    // count-from-metadata still exact on the widened table
    assert(spark.sql("SELECT count(*) FROM gwd.t.w").collect().head.getLong(0)
      === 3L)
    // narrowing: Spark's own analysis refuses before the catalog is reached
    val narrow = intercept[Exception] {
      spark.sql("ALTER TABLE gwd.t.w ALTER COLUMN id TYPE INT")
    }
    assert(narrow.getMessage.contains("NOT_SUPPORTED_CHANGE_COLUMN"))
    // int→double passes Spark's up-cast gate but is OFF our value-preserving
    // lattice (precision loss past 2^53) — the catalog refuses it
    spark.sql("CREATE TABLE gwd.t.w2 (id INT)")
    spark.sql("INSERT INTO gwd.t.w2 VALUES (1)")
    val offLattice = intercept[Exception] {
      spark.sql("ALTER TABLE gwd.t.w2 ALTER COLUMN id TYPE DOUBLE")
    }
    assert(offLattice.getMessage.contains("value-preserving"))
  }

  test("MERGE WITH SCHEMA EVOLUTION widens the target through the same path") {
    val wh = java.nio.file.Files.createTempDirectory("graft_widenmev").toString
    spark.conf.set("spark.sql.catalog.gwm",
      classOf[graft.sources.table.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gwm.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gwm.t")
    spark.sql("CREATE TABLE gwm.t.m (id BIGINT, qty INT)")
    spark.sql("INSERT INTO gwm.t.m VALUES (1, 10), (2, 20)")
    Seq((2L, 7000000000L), (3L, 8000000000L)).toDF("id", "qty")
      .createOrReplaceTempView("mev_src")
    // source qty is BIGINT: evolution emits UpdateColumnType(BIGINT), which
    // lands on widenColumn — int→bigint is on the lattice, so the merge
    // widens the target and applies (Delta type-widening-in-merge parity)
    spark.sql("MERGE WITH SCHEMA EVOLUTION INTO gwm.t.m t USING mev_src s " +
      "ON t.id = s.id WHEN MATCHED THEN UPDATE SET * " +
      "WHEN NOT MATCHED THEN INSERT *")
    assert(spark.table("gwm.t.m").schema("qty").dataType === LongType)
    val rows = spark.sql("SELECT id, qty FROM gwm.t.m ORDER BY id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(rows === Seq((1L, 10L), (2L, 7000000000L), (3L, 8000000000L)))
  }

  test("widening composes with merge-on-read and DV deletes") {
    val loc = tmp("graft_widenmor")
    VersionedTable.write((0 until 50).map(i => (i, i * 2)).toDF("k", "x"),
      loc, "overwrite")
    VersionedTable.widenColumn(spark, loc, "x", "BIGINT")
    VersionedTable.mergeOnRead(spark, loc,
      Seq((7, 9000000000L), (99, 8000000000L)).toDF("k", "x"), keys = Seq("k"))
    VersionedTable.deleteWhere(spark, loc, "k = 3")
    val got = VersionedTable.read(spark, loc).orderBy("k").collect()
      .map(r => (r.getInt(0), r.getLong(1)))
    assert(got.length === 50) // 50 - 1 deleted + 1 inserted
    assert(got.find(_._1 == 7).map(_._2) === Some(9000000000L))
    assert(got.find(_._1 == 99).map(_._2) === Some(8000000000L))
    assert(!got.exists(_._1 == 3))
    // registry-only added column: widen edits the declaration in place
    VersionedTable.addColumn(spark, loc, "extra", "INT")
    VersionedTable.widenColumn(spark, loc, "extra", "BIGINT")
    assert(VersionedTable.read(spark, loc).schema("extra").dataType === LongType)
  }
}
