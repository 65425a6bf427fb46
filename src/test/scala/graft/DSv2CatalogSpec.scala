package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.catalog.VersionedTable

/** The DSv2 TableCatalog surface: full SQL lifecycle over versioned tables —
  * CREATE/INSERT/CTAS/SELECT with time travel/DELETE/TRUNCATE/ALTER/DROP — with
  * the same commit-log semantics as the Scala API underneath.
  */
class DSv2CatalogSpec extends AnyFunSuite with SharedSpark {

  /** One warehouse per JVM: catalog instances are cached per name, so the
    * warehouse conf must be stable for the session's lifetime.
    */
  private lazy val warehouse: String = {
    val wh = Files.createTempDirectory("graft_wh").toString
    spark.conf.set("spark.sql.catalog.gsql", classOf[graft.sources.table.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gsql.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gsql.t")
    wh
  }

  private def loc(table: String): String = s"$warehouse/t/$table"

  private def dataFiles(table: String): Set[String] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
    val dir = new java.io.File(loc(table), "_data")
    if (!dir.exists()) Set.empty
    else walk(dir).filter(_.getName.endsWith(".parquet")).map(_.getAbsolutePath)
      .filter(_.contains("/_data/d-")).toSet // data dirs only, not DV (v-) parquet
  }

  test("create, insert, select round-trip through pure SQL") {
    warehouse
    spark.sql("CREATE TABLE gsql.t.basic (id BIGINT, name STRING)")
    // empty create is immediately selectable with the declared schema
    val empty = spark.sql("SELECT * FROM gsql.t.basic")
    assert(empty.columns.toSeq === Seq("id", "name"))
    assert(empty.count() === 0)
    spark.sql("INSERT INTO gsql.t.basic VALUES (1, 'a'), (2, 'b')")
    spark.sql("INSERT INTO gsql.t.basic VALUES (3, 'c')")
    assert(spark.sql("SELECT * FROM gsql.t.basic ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
      === Seq((1L, "a"), (2L, "b"), (3L, "c")))
    // each INSERT is one commit on top of the empty v0
    assert(VersionedTable.commits(spark, loc("basic")).map(_.version) === Seq(0L, 1L, 2L))
    spark.sql("INSERT OVERWRITE gsql.t.basic VALUES (9, 'z')")
    assert(spark.sql("SELECT id FROM gsql.t.basic").collect().map(_.getLong(0)).toSeq
      === Seq(9L))
    assert(VersionedTable.commits(spark, loc("basic")).last.operation === "overwrite")
  }

  test("CTAS and SQL time travel (VERSION AS OF / TIMESTAMP AS OF)") {
    warehouse
    import spark.implicits._
    Seq((1L, "x"), (2L, "y")).toDF("id", "v").createOrReplaceTempView("ctas_src")
    spark.sql("CREATE TABLE gsql.t.ctas AS SELECT * FROM ctas_src")
    assert(spark.sql("SELECT count(*) FROM gsql.t.ctas").head.getLong(0) === 2L)
    spark.sql("INSERT OVERWRITE gsql.t.ctas VALUES (3, 'z')")
    // staged CTAS = ONE commit carrying the data (v0); the overwrite is v1
    assert(spark.sql("SELECT id FROM gsql.t.ctas VERSION AS OF 0 ORDER BY id")
      .collect().map(_.getLong(0)).toSeq === Seq(1L, 2L))
    assert(spark.sql("SELECT id FROM gsql.t.ctas ORDER BY id")
      .collect().map(_.getLong(0)).toSeq === Seq(3L))
    // a timestamp far in the future resolves to the latest commit
    assert(spark.sql("SELECT id FROM gsql.t.ctas TIMESTAMP AS OF '2200-01-01' ORDER BY id")
      .collect().map(_.getLong(0)).toSeq === Seq(3L))
    // writes to a pinned snapshot are refused (the SQL parser already blocks
    // INSERT ... VERSION AS OF; the table object itself also refuses)
    val pinned = new graft.sources.table.GraftSqlTable("gsql.t.ctas", loc("ctas"), Some(1L))
    val e = intercept[Exception](pinned.newWriteBuilder(null))
    assert(e.getMessage.contains("read-only"))
  }

  test("DELETE FROM commits a deletion vector — no data file rewritten") {
    warehouse
    spark.sql("CREATE TABLE gsql.t.del (id BIGINT, grp STRING)")
    spark.sql("INSERT INTO gsql.t.del SELECT id, CASE WHEN id % 2 = 0 THEN 'e' ELSE 'o' END" +
      " FROM range(100)")
    val before = dataFiles("del")
    spark.sql("DELETE FROM gsql.t.del WHERE grp = 'o'")
    assert(dataFiles("del") === before) // merge-on-read: zero rewrite
    val last = VersionedTable.commits(spark, loc("del")).last
    assert(last.operation === "delete" && last.dv_dir.nonEmpty)
    assert(spark.sql("SELECT count(*) FROM gsql.t.del").head.getLong(0) === 50L)
    assert(spark.sql("SELECT min(id), max(id) FROM gsql.t.del").head.toSeq === Seq(0L, 98L))
    spark.sql("TRUNCATE TABLE gsql.t.del")
    assert(spark.sql("SELECT count(*) FROM gsql.t.del").head.getLong(0) === 0L)
  }

  test("partitioned create: declared layout survives the empty v0 and prunes reads") {
    warehouse
    spark.sql("CREATE TABLE gsql.t.part (id BIGINT, d STRING) PARTITIONED BY (d)")
    // the declared partitioning is advertised before any row lands
    assert(spark.sql("DESCRIBE TABLE gsql.t.part").collect()
      .map(_.getString(0)).contains("# Partition Information") ||
      VersionedTable.tableSpec(spark, loc("part"))("partition_by") === "d")
    spark.sql("INSERT INTO gsql.t.part SELECT id, concat('d', cast(id % 3 AS STRING)) " +
      "FROM range(90)")
    // data landed hive-partitioned under the declared column
    assert(dataFiles("part").exists(_.contains("/d=d0/")))
    assert(spark.sql("SELECT count(*) FROM gsql.t.part WHERE d = 'd1'").head.getLong(0) === 30L)
    // filter pushdown reaches the scan: the physical plan advertises the pushed filter
    val plan = spark.sql("SELECT id FROM gsql.t.part WHERE d = 'd1'")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("EqualTo(d,d1)"), plan)
  }

  test("ALTER TABLE RENAME/DROP COLUMN is metadata-only through SQL") {
    warehouse
    spark.sql("CREATE TABLE gsql.t.alt (id BIGINT, tag STRING, junk STRING)")
    spark.sql("INSERT INTO gsql.t.alt VALUES (1, 'a', 'x'), (2, 'b', 'y')")
    val before = dataFiles("alt")
    spark.sql("ALTER TABLE gsql.t.alt RENAME COLUMN tag TO label")
    spark.sql("ALTER TABLE gsql.t.alt DROP COLUMN junk")
    assert(dataFiles("alt") === before) // no rewrite
    assert(spark.sql("SELECT * FROM gsql.t.alt ORDER BY id").columns.toSeq
      === Seq("id", "label"))
    assert(spark.sql("SELECT label FROM gsql.t.alt WHERE id = 2").head.getString(0) === "b")
  }

  test("catalog listing, drop, and rename") {
    warehouse
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gsql.listing")
    spark.sql("CREATE TABLE gsql.listing.a (id BIGINT)")
    spark.sql("CREATE TABLE gsql.listing.b (id BIGINT)")
    val shown = spark.sql("SHOW TABLES IN gsql.listing").collect().map(_.getString(1)).toSet
    assert(shown === Set("a", "b"))
    // the rename target is catalog-relative (Spark hands the multipart name to the
    // catalog verbatim, so a gsql. prefix would read as a nested namespace)
    spark.sql("ALTER TABLE gsql.listing.a RENAME TO listing.c")
    assert(spark.sql("SHOW TABLES IN gsql.listing").collect().map(_.getString(1)).toSet
      === Set("b", "c"))
    spark.sql("DROP TABLE gsql.listing.b")
    assert(spark.sql("SHOW TABLES IN gsql.listing").collect().map(_.getString(1)).toSet
      === Set("c"))
    assert(spark.sql("SHOW NAMESPACES IN gsql").collect().map(_.getString(0)).toSet
      .contains("listing"))
  }

  test("CALL procedures: compact, history, fast_count, restore through SQL") {
    warehouse
    spark.sql("CREATE TABLE gsql.t.proc (id BIGINT)")
    spark.sql("INSERT INTO gsql.t.proc SELECT id FROM range(50)")
    spark.sql("INSERT INTO gsql.t.proc SELECT id + 50 FROM range(50)")
    // history: empty create (v0) + two inserts
    val hist = spark.sql("CALL gsql.system.history(table => 't.proc')").collect()
    assert(hist.map(_.getLong(0)).toSeq === Seq(2L, 1L, 0L))
    assert(hist.map(_.getString(2)).toSeq === Seq("append", "append", "overwrite"))
    assert(spark.sql("CALL gsql.system.fast_count(table => 't.proc')")
      .head.getLong(0) === 100L)
    // compact folds the three commits into one rewritten v3
    val v = spark.sql("CALL gsql.system.compact(table => 't.proc', num_files => 1)")
      .head.getLong(0)
    assert(v === 3L)
    assert(spark.sql("SELECT count(*) FROM gsql.t.proc").head.getLong(0) === 100L)
    // restore rolls back to the 50-row state as a NEW commit
    spark.sql("CALL gsql.system.restore(table => 't.proc', version => 1)")
    assert(spark.sql("SELECT count(*), max(id) FROM gsql.t.proc").head.toSeq
      === Seq(50L, 49L))
    assert(spark.sql("SELECT count(*) FROM gsql.t.proc VERSION AS OF 3")
      .head.getLong(0) === 100L) // rolled-back state stays time-travelable
  }

  test("CALL procedures: constraints and vacuum through SQL") {
    warehouse
    spark.sql("CREATE TABLE gsql.t.proc2 (id BIGINT)")
    spark.sql("CALL gsql.system.add_constraint(table => 't.proc2', name => 'id_pos'," +
      " check_sql => 'id >= 0')")
    val e = intercept[Exception](spark.sql("INSERT INTO gsql.t.proc2 VALUES (-1)"))
    assert(e.getMessage.contains("id_pos"))
    spark.sql("CALL gsql.system.drop_constraint(table => 't.proc2', name => 'id_pos')")
    spark.sql("INSERT INTO gsql.t.proc2 VALUES (-1)") // gate lifted
    // overwrite then vacuum with zero retention reclaims the superseded commit dirs
    spark.sql("INSERT OVERWRITE gsql.t.proc2 VALUES (7)")
    val deleted = spark.sql("CALL gsql.system.vacuum(table => 't.proc2'," +
      " retention_hours => 0, orphan_grace_hours => 0)").collect()
    assert(deleted.nonEmpty)
    assert(spark.sql("SELECT id FROM gsql.t.proc2").head.getLong(0) === 7L)
  }

  test("CALL procedures: update_where and merge are the SQL UPDATE/MERGE verbs") {
    warehouse
    import spark.implicits._
    spark.sql("CREATE TABLE gsql.t.dml (id BIGINT, qty BIGINT)")
    spark.sql("INSERT INTO gsql.t.dml SELECT id, id * 10 FROM range(10)")
    val files = dataFiles("dml")
    spark.sql("CALL gsql.system.update_where(table => 't.dml'," +
      " condition => 'id < 3', assignments => 'qty = qty + 1')")
    // merge-on-read: the pre-update files are untouched (the update ADDS a dir
    // carrying the rewritten images; nothing is rewritten in place)
    assert(files.subsetOf(dataFiles("dml")))
    assert(spark.sql("SELECT sum(qty) FROM gsql.t.dml WHERE id < 3")
      .head.getLong(0) === 33L) // 1 + 11 + 21
    // MERGE: upsert id 5 (update) and 100 (insert), delete id 9
    Seq((5L, 999L, false), (100L, 1L, false), (9L, 0L, true))
      .toDF("id", "qty", "del").createOrReplaceTempView("dml_changes")
    spark.sql("CALL gsql.system.merge(table => 't.dml', source => 'dml_changes'," +
      " keys => 'id', delete_col => 'del')")
    val out = spark.sql("SELECT id, qty FROM gsql.t.dml ORDER BY id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(out(5L) === 999L && out(100L) === 1L && !out.contains(9L))
    assert(out.size === 10) // 10 - deleted + inserted
  }

  test("CREATE TABLE persists TBLPROPERTIES and COMMENT; SHOW TBLPROPERTIES surfaces them") {
    warehouse
    spark.sql("CREATE TABLE gsql.t.props (id BIGINT) " +
      "COMMENT 'scratch table' TBLPROPERTIES ('team' = 'data', 'pii' = 'false')")
    val props = spark.sql("SHOW TBLPROPERTIES gsql.t.props").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(props.get("team").contains("data"))
    assert(props.get("pii").contains("false"))
    // COMMENT is a SHOW-reserved key — assert it through the catalog load
    // (fresh Table instance, so this also proves persistence)
    val cat = spark.sessionState.catalogManager.catalog("gsql")
      .asInstanceOf[org.apache.spark.sql.connector.catalog.TableCatalog]
    val tbl = cat.loadTable(org.apache.spark.sql.connector.catalog.Identifier
      .of(Array("t"), "props"))
    assert(tbl.properties().get("comment") === "scratch table")
    // SET/UNSET TBLPROPERTIES round-trip through the spec sidecar
    spark.sql("ALTER TABLE gsql.t.props SET TBLPROPERTIES ('team' = 'ml', 'tier' = 'gold')")
    spark.sql("ALTER TABLE gsql.t.props UNSET TBLPROPERTIES ('pii')")
    val after = spark.sql("SHOW TBLPROPERTIES gsql.t.props").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(after.get("team").contains("ml"))
    assert(after.get("tier").contains("gold"))
    assert(!after.contains("pii"))
  }

  test("update_where procedure: commas inside SET expressions do not split assignments") {
    warehouse
    spark.sql("CREATE TABLE gsql.t.dmlc (id BIGINT, qty BIGINT, tag STRING)")
    spark.sql("INSERT INTO gsql.t.dmlc SELECT id, id - 5, concat('t', id) FROM range(10)")
    spark.sql("CALL gsql.system.update_where(table => 't.dmlc', " +
      "condition => 'id < 3', " +
      "assignments => 'qty = greatest(qty, 0), tag = concat(tag, \"-\", \"x\")')")
    val out = spark.sql("SELECT id, qty, tag FROM gsql.t.dmlc ORDER BY id").collect()
    assert(out.take(3).map(_.getLong(1)).toSeq === Seq(0L, 0L, 0L)) // clamped
    assert(out(0).getString(2) === "t0-x" && out(4).getString(2) === "t4")
  }

  test("native SQL UPDATE: merge-on-read commit, expressions and no-op identity sets") {
    warehouse
    spark.sql("CREATE TABLE gsql.t.supd (id BIGINT, qty BIGINT, tag STRING)")
    spark.sql("INSERT INTO gsql.t.supd SELECT id, id * 10, concat('t', id) FROM range(10)")
    val files = dataFiles("supd")
    spark.sql("UPDATE gsql.t.supd SET qty = greatest(qty + 1, 0)," +
      " tag = concat(tag, '!') WHERE id < 3")
    // merge-on-read: pre-update files untouched, a DV + change-row commit lands
    assert(files.subsetOf(dataFiles("supd")))
    val last = VersionedTable.commits(spark, loc("supd")).last
    assert(last.operation === "update" && last.dv_dir.nonEmpty)
    val out = spark.sql("SELECT id, qty, tag FROM gsql.t.supd ORDER BY id").collect()
    assert(out.take(3).map(_.getLong(1)).toSeq === Seq(1L, 11L, 21L))
    assert(out(0).getString(2) === "t0!" && out(5).getString(2) === "t5")
    // UPDATE with only identity assignments is a SQL no-op, not an error
    val v = VersionedTable.commits(spark, loc("supd")).last.version
    spark.sql("UPDATE gsql.t.supd SET qty = qty WHERE id = 1")
    assert(VersionedTable.commits(spark, loc("supd")).last.version === v)
    // subqueries in SET or WHERE refuse loudly (the condition replays over
    // the snapshot frame, which cannot re-resolve a subquery)
    val e = intercept[Exception] {
      spark.sql("UPDATE gsql.t.supd SET qty = (SELECT 41 + 1) WHERE id = 1")
    }
    assert(e.getMessage.contains("subquer"))
  }

  test("native SQL MERGE: upsert, matched-only, insert-only, delete-only shapes") {
    warehouse
    import spark.implicits._
    spark.sql("CREATE TABLE gsql.t.smrg (id BIGINT, qty BIGINT)")
    spark.sql("INSERT INTO gsql.t.smrg SELECT id, id * 10 FROM range(10)")
    // canonical upsert: UPDATE SET * + INSERT *
    Seq((5L, 999L), (100L, 1L)).toDF("id", "qty")
      .createOrReplaceTempView("smrg_up")
    spark.sql("MERGE INTO gsql.t.smrg t USING smrg_up s ON t.id = s.id " +
      "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *")
    var out = spark.sql("SELECT id, qty FROM gsql.t.smrg ORDER BY id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(out(5L) === 999L && out(100L) === 1L && out.size === 11)
    // matched-only merge: unmatched source rows are IGNORED, not inserted
    Seq((5L, 50L), (200L, 2L)).toDF("id", "qty")
      .createOrReplaceTempView("smrg_mo")
    spark.sql("MERGE INTO gsql.t.smrg t USING smrg_mo s ON t.id = s.id " +
      "WHEN MATCHED THEN UPDATE SET t.id = s.id, t.qty = s.qty")
    out = spark.sql("SELECT id, qty FROM gsql.t.smrg ORDER BY id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(out(5L) === 50L && !out.contains(200L) && out.size === 11)
    // insert-only merge: matched rows untouched, unmatched insert
    Seq((5L, 77L), (300L, 3L)).toDF("id", "qty")
      .createOrReplaceTempView("smrg_io")
    spark.sql("MERGE INTO gsql.t.smrg t USING smrg_io s ON t.id = s.id " +
      "WHEN NOT MATCHED THEN INSERT *")
    out = spark.sql("SELECT id, qty FROM gsql.t.smrg ORDER BY id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(out(5L) === 50L && out(300L) === 3L && out.size === 12)
    // delete-only merge: matched keys removed via a DV commit
    Seq(Tuple1(300L), Tuple1(999L)).toDF("id").createOrReplaceTempView("smrg_del")
    spark.sql("MERGE INTO gsql.t.smrg t USING smrg_del s ON t.id = s.id " +
      "WHEN MATCHED THEN DELETE")
    out = spark.sql("SELECT id, qty FROM gsql.t.smrg ORDER BY id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(!out.contains(300L) && out.size === 11)
    assert(VersionedTable.commits(spark, loc("smrg")).last.dv_dir.nonEmpty)
  }

  test("DELETE FROM with an unpushable condition rides the DV path") {
    warehouse
    spark.sql("CREATE TABLE gsql.t.delx (id BIGINT, name STRING)")
    spark.sql("INSERT INTO gsql.t.delx SELECT id, concat('n', repeat('x', CAST(id AS INT))) FROM range(6)")
    val files = dataFiles("delx")
    // length(name) > 3 is not expressible as a source Filter — the
    // SupportsDelete fast path can't take it; the rule routes it to the DV
    // commit instead of failing analysis
    spark.sql("DELETE FROM gsql.t.delx WHERE length(name) > 3 AND id % 2 = 0")
    val out = spark.sql("SELECT id FROM gsql.t.delx ORDER BY id").collect()
      .map(_.getLong(0)).toSeq
    assert(out === Seq(0L, 1L, 2L, 3L, 5L)) // ids 4 (nxxxx…) even+long deleted
    assert(files.subsetOf(dataFiles("delx"))) // no rewrite
    val last = VersionedTable.commits(spark, loc("delx")).last
    assert(last.operation === "delete" && last.dv_dir.nonEmpty)
  }

  test("native SQL MERGE: unsupported shapes refuse loudly, never drift") {
    warehouse
    import spark.implicits._
    spark.sql("CREATE TABLE gsql.t.smrgx (id BIGINT, qty BIGINT)")
    spark.sql("INSERT INTO gsql.t.smrgx SELECT id, id FROM range(5)")
    Seq((1L, 9L, true)).toDF("id", "qty", "kill")
      .createOrReplaceTempView("smrgx_src")
    // non-equi ON
    val e1 = intercept[Exception] {
      spark.sql("MERGE INTO gsql.t.smrgx t USING smrgx_src s ON t.id > s.id " +
        "WHEN MATCHED THEN UPDATE SET *")
    }
    assert(e1.getMessage.contains("conjunction"))
    // two UPDATE actions in one match group
    val e2 = intercept[Exception] {
      spark.sql("MERGE INTO gsql.t.smrgx t USING smrgx_src s ON t.id = s.id " +
        "WHEN MATCHED AND s.kill THEN UPDATE SET t.qty = 0 " +
        "WHEN MATCHED THEN UPDATE SET t.qty = s.qty")
    }
    assert(e2.getMessage.contains("at most one UPDATE"))
    // and the guarded CDC shape DOES work end-to-end
    spark.sql("MERGE INTO gsql.t.smrgx t USING smrgx_src s ON t.id = s.id " +
      "WHEN MATCHED AND s.kill THEN DELETE " +
      "WHEN MATCHED THEN UPDATE SET * " +
      "WHEN NOT MATCHED AND NOT (s.kill) THEN INSERT (id, qty) VALUES (s.id, s.qty)")
    val out = spark.sql("SELECT id FROM gsql.t.smrgx ORDER BY id").collect()
      .map(_.getLong(0)).toSet
    assert(!out.contains(1L) && out.size === 4)
    // the matched-only CDC shape (conditional DELETE + UPDATE, NO INSERT
    // branch) needs no guard — unmatched source rows are simply ignored
    Seq((2L, 77L, false), (3L, 0L, true), (500L, 9L, false))
      .toDF("id", "qty", "kill").createOrReplaceTempView("smrgx_mo")
    spark.sql("MERGE INTO gsql.t.smrgx t USING smrgx_mo s ON t.id = s.id " +
      "WHEN MATCHED AND s.kill THEN DELETE " +
      "WHEN MATCHED THEN UPDATE SET t.id = s.id, t.qty = s.qty")
    val out2 = spark.sql("SELECT id, qty FROM gsql.t.smrgx ORDER BY id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(out2(2L) === 77L)          // matched, updated
    assert(!out2.contains(3L))        // matched + kill, deleted
    assert(!out2.contains(500L))      // unmatched, IGNORED (no insert branch)
  }

  test("general SQL MERGE: partial-row SET keeps unset target columns") {
    warehouse
    import spark.implicits._
    spark.sql("CREATE TABLE gsql.t.gmrg1 (id BIGINT, qty BIGINT, tag STRING)")
    spark.sql("INSERT INTO gsql.t.gmrg1 " +
      "SELECT id, id * 10, concat('t', cast(id AS STRING)) FROM range(5)")
    Seq((1L, 100L), (3L, 300L), (9L, 900L)).toDF("id", "qty")
      .createOrReplaceTempView("gmrg1_src")
    // partial SET (tag untouched), value mixing target and source columns,
    // INSERT with an explicit column list (tag fills NULL)
    spark.sql("MERGE INTO gsql.t.gmrg1 t USING gmrg1_src s ON t.id = s.id " +
      "WHEN MATCHED THEN UPDATE SET t.qty = t.qty + s.qty " +
      "WHEN NOT MATCHED THEN INSERT (id, qty) VALUES (s.id, s.qty)")
    val rows = spark.sql("SELECT id, qty, tag FROM gsql.t.gmrg1 ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getLong(1),
        Option(r.getString(2)).getOrElse("NULL"))).toSeq
    assert(rows === Seq(
      (0L, 0L, "t0"), (1L, 110L, "t1"), (2L, 20L, "t2"),
      (3L, 330L, "t3"), (4L, 40L, "t4"), (9L, 900L, "NULL")))
    // the commit is merge-on-read: an update-class commit with a DV
    val last = VersionedTable.commits(spark, loc("gmrg1")).last
    assert(last.operation === "update" && last.dv_dir.nonEmpty)
  }

  test("general SQL MERGE: conditional matched UPDATE and unguarded INSERT") {
    warehouse
    import spark.implicits._
    spark.sql("CREATE TABLE gsql.t.gmrg2 (id BIGINT, qty BIGINT)")
    spark.sql("INSERT INTO gsql.t.gmrg2 SELECT id, id FROM range(6)")
    Seq((1L, 9L, true), (2L, 50L, false), (3L, 1L, false), (100L, 7L, true))
      .toDF("id", "qty", "kill").createOrReplaceTempView("gmrg2_src")
    // conditional DELETE + conditional UPDATE (target-referencing cond) +
    // UNGUARDED INSERT: SQL semantics — the unmatched kill row INSERTS
    spark.sql("MERGE INTO gsql.t.gmrg2 t USING gmrg2_src s ON t.id = s.id " +
      "WHEN MATCHED AND s.kill THEN DELETE " +
      "WHEN MATCHED AND s.qty > t.qty THEN UPDATE SET t.qty = s.qty " +
      "WHEN NOT MATCHED THEN INSERT (id, qty) VALUES (s.id, s.qty)")
    val rows = spark.sql("SELECT id, qty FROM gsql.t.gmrg2 ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(rows === Seq(
      (0L, 0L),      // untouched
      (2L, 50L),     // matched, s.qty > t.qty → updated
      (3L, 3L),      // matched, s.qty <= t.qty → condition false, untouched
      (4L, 4L), (5L, 5L),
      (100L, 7L)))   // unmatched → inserted (unguarded, kill irrelevant)
    // id 1 deleted (matched + kill)
    assert(!rows.map(_._1).contains(1L))
  }

  test("general SQL MERGE: WHEN NOT MATCHED BY SOURCE full-sync mirror") {
    warehouse
    import spark.implicits._
    spark.sql("CREATE TABLE gsql.t.gmrg3 (id BIGINT, qty BIGINT)")
    spark.sql("INSERT INTO gsql.t.gmrg3 SELECT id, id FROM range(8)")
    Seq((4L, 44L), (5L, 55L), (20L, 200L)).toDF("id", "qty")
      .createOrReplaceTempView("gmrg3_src")
    // ordered NMBS actions: stale ids < 2 delete, the rest flag with qty = -1
    spark.sql("MERGE INTO gsql.t.gmrg3 t USING gmrg3_src s ON t.id = s.id " +
      "WHEN MATCHED THEN UPDATE SET * " +
      "WHEN NOT MATCHED THEN INSERT * " +
      "WHEN NOT MATCHED BY SOURCE AND t.id < 2 THEN DELETE " +
      "WHEN NOT MATCHED BY SOURCE THEN UPDATE SET t.qty = -1")
    val rows = spark.sql("SELECT id, qty FROM gsql.t.gmrg3 ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(rows === Seq(
      (2L, -1L), (3L, -1L),            // NMBS, updated
      (4L, 44L), (5L, 55L),            // matched, mirrored
      (6L, -1L), (7L, -1L),            // NMBS, updated
      (20L, 200L)))                    // unmatched, inserted; 0/1 deleted
  }

  test("general SQL MERGE: multiple INSERT branches, first-match-wins") {
    warehouse
    import spark.implicits._
    spark.sql("CREATE TABLE gsql.t.gmrg5 (id BIGINT, qty BIGINT, tag STRING)")
    spark.sql("INSERT INTO gsql.t.gmrg5 VALUES (1, 10, 'base')")
    Seq((1L, 99L), (2L, 5L), (3L, 50L), (4L, 500L)).toDF("id", "qty")
      .createOrReplaceTempView("gmrg5_src")
    // three branches: small/large/fallback — a row takes the FIRST whose
    // condition holds; the matched row updates normally
    spark.sql("MERGE INTO gsql.t.gmrg5 t USING gmrg5_src s ON t.id = s.id " +
      "WHEN MATCHED THEN UPDATE SET t.qty = s.qty " +
      "WHEN NOT MATCHED AND s.qty < 10 THEN " +
      "  INSERT (id, qty, tag) VALUES (s.id, s.qty, 'small') " +
      "WHEN NOT MATCHED AND s.qty < 100 THEN " +
      "  INSERT (id, qty, tag) VALUES (s.id, s.qty, 'mid') " +
      "WHEN NOT MATCHED THEN INSERT (id, qty) VALUES (s.id, s.qty)")
    val rows = spark.sql("SELECT id, qty, tag FROM gsql.t.gmrg5 ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getLong(1),
        Option(r.getString(2)).getOrElse("NULL"))).toSeq
    assert(rows === Seq(
      (1L, 99L, "base"),   // matched: qty updated, tag kept (partial SET)
      (2L, 5L, "small"),   // first branch
      (3L, 50L, "mid"),    // second branch (first's cond false)
      (4L, 500L, "NULL"))) // fallback branch, tag unassigned → NULL
  }

  test("MERGE WITH SCHEMA EVOLUTION: source-only columns ADD-COLUMN through the catalog") {
    warehouse
    import spark.implicits._
    spark.sql("CREATE TABLE gsql.t.sev (id BIGINT, qty BIGINT)")
    spark.sql("INSERT INTO gsql.t.sev VALUES (1, 10), (2, 20)")
    val before = dataFiles("sev")
    Seq((2L, 99L, "hello"), (3L, 30L, "new")).toDF("id", "qty", "note")
      .createOrReplaceTempView("sev_src")
    spark.sql("MERGE WITH SCHEMA EVOLUTION INTO gsql.t.sev t USING sev_src s " +
      "ON t.id = s.id " +
      "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *")
    val rows = spark.sql("SELECT id, qty, note FROM gsql.t.sev ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getLong(1),
        Option(r.getString(2)).getOrElse("NULL"))).toSeq
    assert(rows === Seq((1L, 10L, "NULL"), (2L, 99L, "hello"), (3L, 30L, "new")))
    // the evolution is the metadata-only ADD COLUMN + a merge-on-read commit:
    // no pre-existing data file was rewritten
    assert(before.subsetOf(dataFiles("sev")))
    // schema time travel: versions BEFORE the evolution's bind point read the
    // OLD schema (the DDL binds to the head version at DDL time — the
    // documented approximation — so the empty v0 predates it)
    assert(spark.sql("SELECT * FROM gsql.t.sev VERSION AS OF 0")
      .columns.toSeq === Seq("id", "qty"))
    // an off-lattice type CHANGE through evolution is refused loudly (the
    // UpdateColumnType lands on widenColumn, whose lattice excludes
    // BIGINT→STRING — metadata-only evolution adds columns or widens, never
    // reinterprets)
    Seq((1L, "wide")).toDF("id", "qty").createOrReplaceTempView("sev_wide")
    val e = intercept[Exception] {
      spark.sql("MERGE WITH SCHEMA EVOLUTION INTO gsql.t.sev t " +
        "USING sev_wide s ON t.id = s.id WHEN MATCHED THEN UPDATE SET *")
    }
    assert(e.getMessage.toLowerCase.contains("value-preserving"))
  }

  test("SQL MERGE raises MERGE_CARDINALITY_VIOLATION on duplicate matched keys") {
    warehouse
    import spark.implicits._
    spark.sql("CREATE TABLE gsql.t.gmrg4 (id BIGINT, qty BIGINT)")
    spark.sql("INSERT INTO gsql.t.gmrg4 SELECT id, id FROM range(4)")
    Seq((2L, 10L), (2L, 20L), (50L, 1L), (50L, 2L)).toDF("id", "qty")
      .createOrReplaceTempView("gmrg4_src")
    // fast path: duplicate MATCHED key 2 → refuse (dup 50 alone would be
    // legal — two inserts)
    val e1 = intercept[Exception] {
      spark.sql("MERGE INTO gsql.t.gmrg4 t USING gmrg4_src s ON t.id = s.id " +
        "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *")
    }
    assert(e1.getMessage.contains("MERGE_CARDINALITY_VIOLATION"))
    // general path (partial SET): same duplicate, same refusal
    val e2 = intercept[Exception] {
      spark.sql("MERGE INTO gsql.t.gmrg4 t USING gmrg4_src s ON t.id = s.id " +
        "WHEN MATCHED THEN UPDATE SET t.qty = s.qty")
    }
    assert(e2.getMessage.contains("MERGE_CARDINALITY_VIOLATION"))
    // duplicate UNMATCHED keys are SQL-legal: both rows insert
    Seq((60L, 1L), (60L, 2L)).toDF("id", "qty")
      .createOrReplaceTempView("gmrg4_ins")
    spark.sql("MERGE INTO gsql.t.gmrg4 t USING gmrg4_ins s ON t.id = s.id " +
      "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *")
    assert(spark.sql("SELECT count(*) FROM gsql.t.gmrg4 WHERE id = 60")
      .collect().head.getLong(0) === 2L)
  }

  test("general MERGE: duplicate TARGET rows matched by ONE source row are legal") {
    warehouse
    import spark.implicits._
    // SQL cardinality is per target ROW, not per key: a target legitimately
    // holding duplicate-key rows, each matched by a single source row, must
    // update every one of those rows once — not raise
    spark.sql("CREATE TABLE gsql.t.gmrg6 (id BIGINT, tag STRING, qty BIGINT)")
    spark.sql("INSERT INTO gsql.t.gmrg6 VALUES " +
      "(1, 'a', 0), (1, 'b', 0), (2, 'c', 0)")
    Seq((1L, 7L)).toDF("id", "qty").createOrReplaceTempView("gmrg6_src")
    // partial SET → the general-merge path (the one whose guard must not
    // misread target-side duplication as a source cardinality violation)
    spark.sql("MERGE INTO gsql.t.gmrg6 t USING gmrg6_src s ON t.id = s.id " +
      "WHEN MATCHED THEN UPDATE SET t.qty = s.qty")
    val rows = spark.sql(
        "SELECT tag, qty FROM gsql.t.gmrg6 WHERE id = 1 ORDER BY tag")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    // both duplicate rows survive, each updated once, non-assigned cols kept
    assert(rows === Seq(("a", 7L), ("b", 7L)), s"got $rows")
    assert(spark.sql("SELECT qty FROM gsql.t.gmrg6 WHERE id = 2")
      .collect().head.getLong(0) === 0L)
    // and a genuine multi-source match on the SAME shape still raises
    Seq((1L, 8L), (1L, 9L)).toDF("id", "qty")
      .createOrReplaceTempView("gmrg6_dup")
    val e = intercept[Exception] {
      spark.sql("MERGE INTO gsql.t.gmrg6 t USING gmrg6_dup s ON t.id = s.id " +
        "WHEN MATCHED THEN UPDATE SET t.qty = s.qty")
    }
    assert(e.getMessage.contains("MERGE_CARDINALITY_VIOLATION"))
  }

  test("pure-SQL WHERE prunes whole commits via pushed filters (data skipping)") {
    warehouse
    spark.sql("CREATE TABLE gsql.t.skip (id BIGINT, src STRING, v DOUBLE)")
    // four appends with disjoint id ranges and distinct src tags — each commit's
    // logged min/max separates it from the others
    Seq(("a", 0), ("b", 1000), ("c", 2000), ("d", 3000)).foreach { case (tag, base) =>
      spark.sql(s"INSERT INTO gsql.t.skip " +
        s"SELECT id + $base, '$tag', cast(id AS DOUBLE) FROM range(100)")
    }
    def scannedFiles(sql: String): Set[String] = {
      val plan = spark.sql(sql).queryExecution.executedPlan
      val rels = plan.collect {
        case r: org.apache.spark.sql.execution.RowDataSourceScanExec => r.relation
      }
      assert(rels.nonEmpty, s"no V1 scan in plan for: $sql")
      rels.collect {
        case s: graft.sources.table.V1SnapshotScan => s.inputFiles.toSet
      }.flatten.toSet
    }
    val all = scannedFiles("SELECT * FROM gsql.t.skip")
    assert(all.nonEmpty)
    // numeric range probe: only the commit holding [2000, 2100) survives
    val numProbe = scannedFiles(
      "SELECT * FROM gsql.t.skip WHERE id BETWEEN 2000 AND 2050")
    assert(numProbe.nonEmpty && numProbe.size < all.size,
      s"numeric probe did not skip commits: ${numProbe.size} vs ${all.size}")
    // string equality probe: only src='b' commit survives
    val strProbe = scannedFiles("SELECT * FROM gsql.t.skip WHERE src = 'b'")
    assert(strProbe.nonEmpty && strProbe.size < all.size,
      s"string probe did not skip commits: ${strProbe.size} vs ${all.size}")
    assert(numProbe != strProbe)
    // and the skipped scans still return exactly the right rows
    assert(spark.sql("SELECT count(*) FROM gsql.t.skip WHERE id BETWEEN 2000 AND 2050")
      .collect().head.getLong(0) === 51L)
    assert(spark.sql("SELECT count(*), min(id), max(id) FROM gsql.t.skip WHERE src = 'b'")
      .collect().head.toSeq === Seq(100L, 1000L, 1099L))
    // a probe matching NOTHING prunes every commit yet keeps the schema
    assert(spark.sql("SELECT count(*) FROM gsql.t.skip WHERE id > 99999")
      .collect().head.getLong(0) === 0L)
    // correctness under DVs: delete some rows, then probe again — DV commits
    // are never pruned, so the deletes still apply inside a skipped scan
    spark.sql("DELETE FROM gsql.t.skip WHERE id = 2025")
    assert(spark.sql("SELECT count(*) FROM gsql.t.skip WHERE id BETWEEN 2000 AND 2050")
      .collect().head.getLong(0) === 50L)
  }

  test("CREATE OR REPLACE TABLE preserves history: time travel across the replace") {
    warehouse
    spark.sql("CREATE TABLE gsql.t.corr (id BIGINT, name STRING)")
    spark.sql("INSERT INTO gsql.t.corr VALUES (1, 'a'), (2, 'b')")
    spark.sql("ALTER TABLE gsql.t.corr ADD CONSTRAINT pos CHECK (id > 0)")
    val preVersions = VersionedTable.commits(spark, loc("corr")).map(_.version)
    // RTAS with a DIFFERENT schema — the staged path resets the definition
    // in place instead of dropping the directory
    spark.sql("CREATE OR REPLACE TABLE gsql.t.corr AS " +
      "SELECT id, id * 1.5 AS score FROM range(3)")
    assert(spark.sql("SELECT * FROM gsql.t.corr").columns.toSeq
      === Seq("id", "score"))
    assert(spark.sql("SELECT count(*) FROM gsql.t.corr").collect().head.getLong(0) === 3)
    // the commit log SURVIVED: old versions still list, and VERSION AS OF a
    // pre-replace version reads the OLD data under the OLD schema
    val versions = VersionedTable.commits(spark, loc("corr")).map(_.version)
    assert(preVersions.toSet.subsetOf(versions.toSet))
    val old = spark.sql(s"SELECT * FROM gsql.t.corr VERSION AS OF ${preVersions.last}")
    assert(old.columns.toSeq === Seq("id", "name"))
    assert(old.count() === 2)
    // the old CHECK constraint did NOT survive (a replace resets the
    // definition): inserting id = -5 into the new table succeeds
    spark.sql("INSERT INTO gsql.t.corr VALUES (-5, 0.0)")
    assert(spark.sql("SELECT count(*) FROM gsql.t.corr WHERE id = -5")
      .collect().head.getLong(0) === 1)
    // plain REPLACE TABLE (no AS SELECT) → empty table, declared schema,
    // still the same history chain
    spark.sql("REPLACE TABLE gsql.t.corr (k BIGINT, v STRING) PARTITIONED BY (v)")
    assert(spark.sql("SELECT * FROM gsql.t.corr").columns.toSeq === Seq("k", "v"))
    assert(spark.sql("SELECT count(*) FROM gsql.t.corr").collect().head.getLong(0) === 0)
    // declared partitioning applies to later INSERTs (spec-persisted)
    spark.sql("INSERT INTO gsql.t.corr VALUES (1, 'x'), (2, 'y')")
    assert(VersionedTable.commits(spark, loc("corr")).last.partition_by === "v")
    // REPLACE of a MISSING table refuses; CREATE OR REPLACE creates it
    val e = intercept[Exception] {
      spark.sql("REPLACE TABLE gsql.t.corr_missing (id BIGINT)")
    }
    assert(e.getMessage.toUpperCase.contains("TABLE_OR_VIEW_NOT_FOUND") ||
      e.getMessage.toLowerCase.contains("not found"))
    spark.sql("CREATE OR REPLACE TABLE gsql.t.corr_new AS SELECT 7L AS id")
    assert(spark.sql("SELECT id FROM gsql.t.corr_new").collect().head.getLong(0) === 7)
  }

  test("RESTORE across a replace resurrects the pre-replace table whole") {
    warehouse
    spark.sql("CREATE TABLE gsql.t.rrep AS SELECT id, 'old' AS tag FROM range(5)")
    spark.sql("CREATE OR REPLACE TABLE gsql.t.rrep AS " +
      "SELECT id, id * 2.0 AS score FROM range(3)")
    assert(spark.sql("SELECT * FROM gsql.t.rrep").columns.toSeq === Seq("id", "score"))
    // the replace kept the log, so RESTORE can roll straight back through it:
    // data AND schema return to the pre-replace state (v0 = the staged CTAS)
    spark.sql("CALL gsql.system.restore(table => 't.rrep', version => 0)")
    assert(spark.sql("SELECT * FROM gsql.t.rrep").columns.toSeq === Seq("id", "tag"))
    val rows = spark.sql("SELECT id, tag FROM gsql.t.rrep ORDER BY id").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(rows === (0L until 5L).map(i => (i, "old")))
  }

  test("INSERT OVERWRITE PARTITION replaces only the named partition") {
    warehouse
    spark.sql("CREATE TABLE gsql.t.powr (id BIGINT, d STRING) PARTITIONED BY (d)")
    spark.sql("INSERT INTO gsql.t.powr SELECT id, concat('d', cast(id % 3 AS STRING))" +
      " FROM range(90)")
    val before = dataFiles("powr")
    // a fully-static PARTITION spec: the SELECT carries only the data columns
    spark.sql("INSERT OVERWRITE gsql.t.powr PARTITION (d = 'd1') SELECT 1000")
    // untouched partitions' files carried by reference — byte-identical paths
    assert(before.filterNot(_.contains("/d=d1/")).subsetOf(dataFiles("powr")))
    assert(spark.sql("SELECT count(*) FROM gsql.t.powr WHERE d = 'd1'")
      .head.getLong(0) === 1L)
    assert(spark.sql("SELECT count(*) FROM gsql.t.powr").head.getLong(0) === 61L)
    val last = graft.catalog.VersionedTable.commits(spark, loc("powr")).last
    assert(last.operation === "replace" && last.replace_where === "d=d1"
      && last.replaced_rows === 30L)
    assert(graft.catalog.VersionedTable.fastCount(spark, loc("powr")) === 61L)
    // time travel still serves the pre-replace partition content
    assert(spark.sql("SELECT count(*) FROM gsql.t.powr VERSION AS OF 1 WHERE d = 'd1'")
      .head.getLong(0) === 30L)
    // an empty batch under a static PARTITION spec CLEARS the partition
    // (the bounds-contract refusal itself is pinned in CatalogSpec)
    spark.sql("INSERT OVERWRITE gsql.t.powr PARTITION (d = 'd0') SELECT id FROM range(0)")
    assert(spark.sql("SELECT count(*) FROM gsql.t.powr WHERE d = 'd0'")
      .head.getLong(0) === 0L)
    assert(spark.sql("SELECT count(*) FROM gsql.t.powr").head.getLong(0) === 31L)
  }

  test("INSERT OVERWRITE PARTITION on a multi-column-partitioned table") {
    warehouse
    spark.sql("CREATE TABLE gsql.t.powr2 (id BIGINT, a STRING, b STRING) " +
      "PARTITIONED BY (a, b)")
    spark.sql("INSERT INTO gsql.t.powr2 SELECT id, " +
      "concat('a', cast(id % 2 AS STRING)), concat('b', cast(id % 3 AS STRING)) " +
      "FROM range(60)")
    val before = dataFiles("powr2")
    // Spark splits the overwrite condition on AND: the two partition
    // equalities arrive as SEPARATE conjunctive filters and must bind as ONE
    // (a, b) tuple — not one tuple per filter
    spark.sql("INSERT OVERWRITE gsql.t.powr2 PARTITION (a = 'a1', b = 'b2') " +
      "SELECT 1000")
    assert(before.filterNot(f => f.contains("/a=a1/") && f.contains("/b=b2/"))
      .subsetOf(dataFiles("powr2")))
    assert(spark.sql(
      "SELECT count(*) FROM gsql.t.powr2 WHERE a = 'a1' AND b = 'b2'")
      .head.getLong(0) === 1L)
    assert(spark.sql("SELECT count(*) FROM gsql.t.powr2").head.getLong(0) === 51L)
    val last = graft.catalog.VersionedTable.commits(spark, loc("powr2")).last
    assert(last.operation === "replace" && last.replace_where === "a=a1/b=b2")
    // binding only ONE of the two partition columns is still refused
    val e = intercept[Exception] {
      spark.sql("INSERT OVERWRITE gsql.t.powr2 PARTITION (a = 'a0') SELECT 1, 'b0'")
    }
    assert(e.getMessage.contains("partition columns"))
  }

  test("dynamic partition overwrite through the DataFrame writer option") {
    warehouse
    spark.sql("CREATE TABLE gsql.t.pdyn (id BIGINT, d STRING) PARTITIONED BY (d)")
    spark.sql("INSERT INTO gsql.t.pdyn SELECT id, concat('d', cast(id % 3 AS STRING))" +
      " FROM range(90)")
    import spark.implicits._
    // the Delta-shaped writer surface: overwrite mode + partitionOverwriteMode=
    // dynamic replaces only the partitions present in the batch (the SQL
    // OverwritePartitionsDynamic plan needs a native DSv2 BatchWrite, so the
    // catalog deliberately does not advertise it — this option is the dynamic path)
    (0 until 5).map(i => (i.toLong, "d2")).toDF("id", "d")
      .write.format("graft-table").mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .save(loc("pdyn"))
    // d0/d1 intact, d2 replaced by the 5 new rows
    assert(spark.sql("SELECT d, count(*) AS n FROM gsql.t.pdyn GROUP BY d ORDER BY d")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      === Seq(("d0", 30L), ("d1", 30L), ("d2", 5L)))
    assert(graft.catalog.VersionedTable.commits(spark, loc("pdyn"))
      .last.replace_where === "d=d2")
  }

  test("scan reports log-resolved statistics: a small graft table broadcasts in SQL joins") {
    warehouse
    import spark.implicits._
    spark.sql("CREATE TABLE gsql.t.dim (k BIGINT, name STRING)")
    spark.sql("INSERT INTO gsql.t.dim SELECT id, concat('n', cast(id AS STRING)) " +
      "FROM range(20)")
    (0L until 5000L).map(i => (i, i % 20)).toDF("id", "k")
      .createOrReplaceTempView("stats_fact")
    val plan = spark.sql(
      "SELECT f.id, d.name FROM stats_fact f JOIN gsql.t.dim d ON f.k = d.k")
      .queryExecution.executedPlan.toString
    // without estimateStatistics the V1 bridge defaults to cluster-sized
    // estimates and this join could never broadcast the 20-row dimension
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("ALTER TABLE ADD COLUMN is metadata-only; the column fills until data lands") {
    warehouse
    spark.sql("CREATE TABLE gsql.t.addc (id BIGINT)")
    spark.sql("INSERT INTO gsql.t.addc SELECT id FROM range(3)")
    val before = dataFiles("addc")
    spark.sql("ALTER TABLE gsql.t.addc ADD COLUMN score DOUBLE")
    assert(dataFiles("addc") === before) // no rewrite
    // declared immediately, NULL until a write carries it
    assert(spark.sql("SELECT * FROM gsql.t.addc").columns.toSeq === Seq("id", "score"))
    assert(spark.sql("SELECT count(*) FROM gsql.t.addc WHERE score IS NULL")
      .head.getLong(0) === 3L)
    spark.sql("INSERT INTO gsql.t.addc VALUES (10, 0.5)")
    assert(spark.sql("SELECT id FROM gsql.t.addc WHERE score = 0.5")
      .head.getLong(0) === 10L)
    assert(spark.sql("SELECT count(*) FROM gsql.t.addc WHERE score IS NULL")
      .head.getLong(0) === 3L)
    // rename and drop compose with the registry-only column
    spark.sql("ALTER TABLE gsql.t.addc ADD COLUMN tag STRING")
    spark.sql("ALTER TABLE gsql.t.addc RENAME COLUMN tag TO label")
    assert(spark.sql("SELECT * FROM gsql.t.addc").columns.toSeq
      === Seq("id", "score", "label"))
    spark.sql("ALTER TABLE gsql.t.addc DROP COLUMN label")
    assert(spark.sql("SELECT * FROM gsql.t.addc").columns.toSeq === Seq("id", "score"))
  }

  test("ALTER TABLE ADD/DROP CONSTRAINT rides the CHECK machinery") {
    warehouse
    spark.sql("CREATE TABLE gsql.t.addcon (id BIGINT, qty BIGINT)")
    spark.sql("INSERT INTO gsql.t.addcon VALUES (1, 5)")
    spark.sql("ALTER TABLE gsql.t.addcon ADD CONSTRAINT qty_pos CHECK (qty > 0)")
    val e = intercept[Exception](spark.sql("INSERT INTO gsql.t.addcon VALUES (2, -1)"))
    assert(e.getMessage.contains("qty_pos"))
    // declaring over violating live data is refused (Spark pre-validates the
    // new CHECK against the table before the catalog ever sees it)
    val e2 = intercept[Exception](
      spark.sql("ALTER TABLE gsql.t.addcon ADD CONSTRAINT id_big CHECK (id > 100)"))
    assert(e2.getMessage.contains("id > 100"))
    // the DSv2 metadata API reports the declared CHECKs
    val reported = new graft.sources.table.GraftSqlTable(
      "gsql.t.addcon", loc("addcon"), None).constraints()
    assert(reported.map(_.name).toSeq === Seq("qty_pos"))
    assert(reported.head.enforced())
    spark.sql("ALTER TABLE gsql.t.addcon DROP CONSTRAINT qty_pos")
    spark.sql("INSERT INTO gsql.t.addcon VALUES (2, -1)") // gate lifted
    assert(spark.sql("SELECT count(*) FROM gsql.t.addcon").head.getLong(0) === 2L)
  }

  test("CALL maintain: compacts only past the live-commit or DV thresholds") {
    warehouse
    spark.sql("CREATE TABLE gsql.t.mnt (id BIGINT)")
    (1 to 3).foreach(i =>
      spark.sql(s"INSERT INTO gsql.t.mnt SELECT id + ${i * 100} FROM range(10)"))
    // 4 live commits (empty v0 + 3 appends), under the cap → noop, no data read
    val noop = spark.sql("CALL gsql.system.maintain(table => 't.mnt')").head
    assert(noop.getString(0) === "noop" && noop.getLong(1) === 3L)
    // cap of 2 live commits fires a compact
    val fired = spark.sql(
      "CALL gsql.system.maintain(table => 't.mnt', max_live_commits => 2)").head
    assert(fired.getString(0) === "compacted" && fired.getLong(1) === 4L)
    assert(spark.sql("SELECT count(*) FROM gsql.t.mnt").head.getLong(0) === 30L)
    // DV threshold: delete 10 rows, cap of 5 DV rows fires
    spark.sql("DELETE FROM gsql.t.mnt WHERE id < 200")
    val dvFired = spark.sql(
      "CALL gsql.system.maintain(table => 't.mnt', max_dv_rows => 5)").head
    assert(dvFired.getString(0) === "compacted")
    assert(spark.sql("SELECT count(*) FROM gsql.t.mnt").head.getLong(0) === 20L)
  }

  test("change feed through pure SQL: CREATE TEMPORARY VIEW USING graft-table") {
    warehouse
    spark.sql("CREATE TABLE gsql.t.cdf (id BIGINT, v STRING)")
    spark.sql("INSERT INTO gsql.t.cdf VALUES (1, 'a'), (2, 'b')")
    spark.sql("INSERT INTO gsql.t.cdf VALUES (3, 'c')")
    // the DSv1 relation provider already serves the feed to SQL-only users —
    // this pins that route so it keeps composing with the catalog layout
    spark.sql(s"""CREATE OR REPLACE TEMPORARY VIEW cdf_changes
      USING `graft-table`
      OPTIONS (path '${loc("cdf")}', readChangeFeed 'true', startingVersion '1')""")
    val rows = spark.sql(
      "SELECT id, _change_type, _commit_version FROM cdf_changes ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(rows === Seq((1L, "insert", 1L), (2L, "insert", 1L), (3L, "insert", 2L)))
  }

  test("SQL inserts honor CHECK constraints declared on the table") {
    warehouse
    spark.sql("CREATE TABLE gsql.t.con (id BIGINT, qty BIGINT)")
    VersionedTable.addConstraint(spark, loc("con"), "qty_pos", "qty > 0")
    spark.sql("INSERT INTO gsql.t.con VALUES (1, 5)")
    val e = intercept[Exception](spark.sql("INSERT INTO gsql.t.con VALUES (2, -1)"))
    assert(e.getMessage.contains("qty_pos"))
    assert(spark.sql("SELECT count(*) FROM gsql.t.con").head.getLong(0) === 1L)
  }
}
