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

  test("CALL system.files itemizes the snapshot, attributed per commit") {
    wh
    spark.sql("CREATE TABLE gproc.t.f (k BIGINT, p STRING) PARTITIONED BY (p)")
    spark.sql("INSERT INTO gproc.t.f VALUES (1, 'a'), (2, 'b')") // v1
    spark.sql("INSERT INTO gproc.t.f VALUES (3, 'a')")           // v2
    val rows = spark.sql("CALL gproc.system.files(table => 't.f')").collect()
    assert(rows.nonEmpty)
    // every row: a real parquet file with its size on disk
    assert(rows.forall(r => r.getString(2).endsWith(".parquet") &&
      r.getLong(3) > 0L), rows.mkString(";"))
    // both INSERT commits contribute, hive-attributed and labeled append
    // (the CREATE's empty flat v0 file may also appear — zero rows, no p= path)
    val inserts = rows.filter(_.getLong(0) >= 1L)
    assert(inserts.map(_.getLong(0)).toSet == Set(1L, 2L))
    assert(inserts.forall(r => r.getString(1) == "append" &&
      r.getString(4).startsWith("p=")), inserts.mkString(";"))
    // partition attribution: v2 wrote only p=a
    assert(rows.filter(_.getLong(0) == 2L).forall(_.getString(4) == "p=a"))
    // the inventory IS the snapshot plan's input set
    assert(rows.map(_.getString(2)).toSet ==
      VersionedTable.read(spark, s"$wh/t/f").inputFiles.toSet)

    // a DV delete adds a deletion-vector parquet to the PLAN, but it is not
    // table data — the inventory must exclude it and pin to a version
    spark.sql("DELETE FROM gproc.t.f WHERE k = 1")
    val after = spark.sql("CALL gproc.system.files(table => 't.f')").collect()
    assert(after.map(_.getString(2)).toSet == rows.map(_.getString(2)).toSet,
      "a DV delete rewrites no data file and adds none to the inventory")
    val pinned = spark.sql(
      "CALL gproc.system.files(table => 't.f', version => 1)").collect()
    // at version 1 the live set is the CREATE's empty v0 file plus v1's data —
    // v2 must be absent
    assert(pinned.map(_.getLong(0)).toSet == Set(0L, 1L))
  }

  test("CALL system.files: partition prefix filter, and max_files truncates loudly") {
    wh
    spark.sql("CREATE TABLE gproc.t.fc (k BIGINT, p STRING) PARTITIONED BY (p)")
    // many small commits → many files
    (0 until 6).foreach(i =>
      spark.sql(s"INSERT INTO gproc.t.fc VALUES ($i, 'p${i % 2}')"))
    val all = spark.sql("CALL gproc.system.files(table => 't.fc')").collect()
    val dataRows = all.filter(_.getLong(0) >= 0L)
    assert(dataRows.length >= 6)
    // prefix filter: only the requested partition's files, no marker
    val onlyP0 = spark.sql(
      "CALL gproc.system.files(table => 't.fc', partition => 'p=p0')").collect()
    assert(onlyP0.nonEmpty && onlyP0.forall(_.getString(4) == "p=p0"))
    assert(onlyP0.forall(_.getString(1) != "TRUNCATED"))
    // cap: exactly max_files rows survive plus ONE loud marker naming the rest
    val capped = spark.sql(
      "CALL gproc.system.files(table => 't.fc', max_files => 3)").collect()
    assert(capped.length == 4, capped.mkString(";"))
    val marker = capped.last
    assert(marker.getLong(0) == -1L && marker.getString(1) == "TRUNCATED")
    assert(marker.getString(2).contains("more files omitted"),
      s"marker must name the remedy: $marker")
    // capped data rows are a prefix of the uncapped inventory (stable order)
    assert(capped.take(3).map(_.getString(2)).toSeq ==
      all.take(3).map(_.getString(2)).toSeq)
  }

  test("ALTER COLUMN COMMENT round-trips; DESCRIBE shows it") {
    wh
    spark.sql("CREATE TABLE gproc.t.c (k BIGINT, v STRING)")
    spark.sql("ALTER TABLE gproc.t.c ALTER COLUMN v COMMENT 'the payload'")
    val desc = spark.sql("DESCRIBE TABLE gproc.t.c").collect()
      .map(r => (r.getString(0), r.getString(2))).toMap
    assert(desc.get("v").contains("the payload"), s"comment missing: $desc")
    // comments survive a rename (physical-keyed)
    spark.sql("ALTER TABLE gproc.t.c RENAME COLUMN v TO payload")
    val desc2 = spark.sql("DESCRIBE TABLE gproc.t.c").collect()
      .map(r => (r.getString(0), r.getString(2))).toMap
    assert(desc2.get("payload").contains("the payload"), s"lost on rename: $desc2")
  }

  test("SET NOT NULL validates live data, then refuses null inserts; DROP reverts") {
    wh
    spark.sql("CREATE TABLE gproc.t.n (k BIGINT, v STRING)")
    spark.sql("INSERT INTO gproc.t.n VALUES (1, NULL)")
    // Spark's analyzer refuses v2 ALTER ... SET NOT NULL outright — the SET
    // direction rides the procedure. Live data violates -> must refuse.
    intercept[Exception] {
      spark.sql("CALL gproc.system.set_nullable(table => 't.n', column => 'v')")
    }
    spark.sql("DELETE FROM gproc.t.n WHERE v IS NULL")
    spark.sql("CALL gproc.system.set_nullable(table => 't.n', column => 'v')")
    assert(!spark.table("gproc.t.n").schema("v").nullable)
    intercept[Exception] {
      spark.sql("INSERT INTO gproc.t.n VALUES (2, NULL)")
    }
    spark.sql("INSERT INTO gproc.t.n VALUES (3, 'ok')")
    // the DROP direction works as plain SQL
    spark.sql("ALTER TABLE gproc.t.n ALTER COLUMN v DROP NOT NULL")
    assert(spark.table("gproc.t.n").schema("v").nullable)
    spark.sql("INSERT INTO gproc.t.n VALUES (4, NULL)")
    assert(spark.table("gproc.t.n").count() == 2L)
  }

  test("a renamed NOT NULL column keeps enforcing under its new name") {
    wh
    spark.sql("CREATE TABLE gproc.t.rn (k BIGINT, v STRING)")
    spark.sql("CALL gproc.system.set_nullable(table => 't.rn', column => 'v')")
    spark.sql("ALTER TABLE gproc.t.rn RENAME COLUMN v TO payload")
    // the engine-generated constraint migrated with the rename: writes still
    // refuse nulls (an unmigrated expr would fail as unresolved instead)
    intercept[Exception] {
      spark.sql("INSERT INTO gproc.t.rn VALUES (1, NULL)")
    }
    spark.sql("INSERT INTO gproc.t.rn VALUES (2, 'ok')")
    assert(!spark.table("gproc.t.rn").schema("payload").nullable)
    // and DROP COLUMN cleans the declaration up entirely
    spark.sql("ALTER TABLE gproc.t.rn DROP COLUMN payload")
    assert(VersionedTable.constraints(spark, s"$wh/t/rn").isEmpty)
    assert(VersionedTable.notNullColumns(spark, s"$wh/t/rn").isEmpty)
  }

  test("CALL system.clone makes a metadata-only copy that diverges independently") {
    wh
    spark.sql("CREATE TABLE gproc.t.src (k BIGINT)")
    spark.sql("INSERT INTO gproc.t.src SELECT id FROM range(10)")
    spark.sql("INSERT INTO gproc.t.src SELECT id + 10 FROM range(5)")
    // clone at the pinned earlier version
    spark.sql("CALL gproc.system.clone(table => 't.src', target => 't.dst', " +
      "version => 1)")
    assert(spark.table("gproc.t.dst").count() == 10L)
    spark.sql("INSERT INTO gproc.t.dst VALUES (99)")
    assert(spark.table("gproc.t.dst").count() == 11L)
    assert(spark.table("gproc.t.src").count() == 15L) // source untouched
    // the clone borrowed files: its own data dir holds only the new commit
    val borrowed = VersionedTable.commits(spark, s"$wh/t/dst")
      .count(c => c.data_dir.startsWith("abs:"))
    assert(borrowed >= 1, "clone did not borrow by reference")
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
