package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.catalog.VersionedTable

/** The round-9 procedure additions: `CALL system.detail` and vacuum's dry run. */
class ProcedureSurfaceSpec extends AnyFunSuite with SharedSpark {

  private lazy val wh: String = {
    val dir = Files.createTempDirectory("graft_proc").toString
    spark.conf.set("spark.sql.catalog.gproc",
      classOf[graft.sources.table.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gproc.warehouse", dir)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gproc.t")
    dir
  }

  test("CALL system.detail returns the snapshot summary row") {
    wh
    spark.sql("CREATE TABLE gproc.t.d (k BIGINT, v STRING)")
    spark.sql("INSERT INTO gproc.t.d SELECT id, CAST(id AS STRING) FROM range(10)")
    spark.sql("DELETE FROM gproc.t.d WHERE k < 3")
    val r = spark.sql("CALL gproc.system.detail(table => 't.d')").head()
    assert(r.getLong(1) == 2L, s"version: $r")         // create, insert, delete
    assert(r.getString(2) == "delete")
    assert(r.getLong(4) == 7L, s"num_rows: $r")        // fastCount under the DV
    assert(r.getLong(5) >= 1L && r.getLong(6) > 0L)    // files, bytes
    assert(r.getLong(9) == 3L, s"live_dv_rows: $r")
  }

  test("vacuum dry_run lists victims without deleting; the real run deletes them") {
    wh
    spark.sql("CREATE TABLE gproc.t.v (k BIGINT)")
    spark.sql("INSERT INTO gproc.t.v SELECT id FROM range(10)")
    spark.sql("INSERT OVERWRITE gproc.t.v SELECT id FROM range(5)")
    // the pre-overwrite commits are out of retention at zero; dry run must
    // name them and leave them on disk
    val dry = spark.sql("CALL gproc.system.vacuum(table => 't.v', " +
      "retention_hours => 0, orphan_grace_hours => 0, dry_run => 'true')")
      .collect().map(_.getString(0))
    assert(dry.nonEmpty, "dry run found no victims")
    dry.foreach(p => assert(new java.io.File(
      new java.net.URI(p).getPath).exists() ||
      new java.io.File(p).exists(), s"dry run deleted $p"))
    // time travel still works after the dry run (floor untouched)
    assert(VersionedTable.readAsOf(spark, s"$wh/t/v", 1).count() == 10L)
    val real = spark.sql("CALL gproc.system.vacuum(table => 't.v', " +
      "retention_hours => 0, orphan_grace_hours => 0)")
      .collect().map(_.getString(0))
    assert(real.toSet == dry.toSet,
      s"real vacuum deleted a different set: $real vs $dry")
    assert(spark.table("gproc.t.v").count() == 5L)
  }
}
