package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.catalog.VersionedTable

/** Bloom-filter commit skipping: tables opting in via
  * `TBLPROPERTIES ('graft.bloom.columns' = ...)` prune POINT LOOKUPS on
  * hash-like columns where min/max stats cannot (every commit's range
  * overlaps every probe). Asserted at the SQL surface: the scanned file set
  * of `WHERE id = k` shrinks to the committing batch, and results stay
  * byte-identical to the unpruned read.
  */
class BloomSkippingSpec extends AnyFunSuite with SharedSpark {

  import spark.implicits._

  private def scannedFiles(sql: String): Set[String] = {
    val plan = spark.sql(sql).queryExecution.executedPlan
    plan.collect {
      case r: org.apache.spark.sql.execution.RowDataSourceScanExec => r.relation
    }.collect {
      case s: graft.sources.table.V1SnapshotScan => s.inputFiles.toSet
    }.flatten.toSet
  }

  /** Commit-granularity view of a scan: the distinct `d-*` data dirs touched
    * (a multi-threaded INSERT writes several part files per commit).
    */
  private def scannedCommits(sql: String): Set[String] =
    scannedFiles(sql).map(f => f.substring(0, f.indexOf("/part-")))

  test("equality probes skip commits whose bloom excludes the value") {
    val wh = java.nio.file.Files.createTempDirectory("graft_bloom").toString
    spark.conf.set("spark.sql.catalog.gbl",
      classOf[graft.sources.table.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gbl.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gbl.t")
    spark.sql("CREATE TABLE gbl.t.d (id BIGINT, tag STRING) " +
      "TBLPROPERTIES ('graft.bloom.columns' = 'id,tag')")
    // three commits with INTERLEAVED id ranges — min/max overlaps every probe,
    // only the bloom can tell the commits apart
    spark.sql("INSERT INTO gbl.t.d VALUES (1, 'a1'), (1000, 'a2'), (2000, 'a3')")
    spark.sql("INSERT INTO gbl.t.d VALUES (5, 'b1'), (1500, 'b2'), (2500, 'b3')")
    spark.sql("INSERT INTO gbl.t.d VALUES (7, 'c1'), (1700, 'c2'), (2700, 'c3')")
    // the CREATE's empty v0 file rides along in the BARE scan; the probe's
    // implicit IsNotNull prunes it via the null-count gate (0 rows), and the
    // bloom drops the two non-matching inserts — exactly one commit remains
    val all = scannedCommits("SELECT * FROM gbl.t.d")
    assert(all.size >= 3)

    val probe = scannedCommits("SELECT * FROM gbl.t.d WHERE id = 1500")
    assert(probe.size === 1,
      s"bloom + null gate should leave only the matching commit, scanned $probe of $all")
    assert(spark.sql("SELECT tag FROM gbl.t.d WHERE id = 1500")
      .collect().map(_.getString(0)).toSeq === Seq("b2"))

    // string probes prune too (min/max string stats also fire here — the
    // interleaved a/b/c prefixes keep them overlapping, so this still
    // exercises the bloom tier together with them)
    assert(spark.sql("SELECT id FROM gbl.t.d WHERE tag = 'c2'")
      .collect().map(_.getLong(0)).toSeq === Seq(1700L))

    // absent value: every commit's bloom excludes it (fpp permitting) and the
    // result is empty either way
    assert(spark.sql("SELECT * FROM gbl.t.d WHERE id = 999999").count() === 0)

    // a table WITHOUT the property scans every DATA commit on the same probe
    // shape (only the empty v0 prunes, via the null gate — no bloom tier)
    spark.sql("CREATE TABLE gbl.t.plain (id BIGINT)")
    spark.sql("INSERT INTO gbl.t.plain VALUES (1), (2000)")
    spark.sql("INSERT INTO gbl.t.plain VALUES (5), (2500)")
    val plainInserts = VersionedTable.commits(spark, s"$wh/t/plain")
      .filter(c => c.operation == "append" && c.row_count > 0)
    assert(scannedCommits("SELECT * FROM gbl.t.plain WHERE id = 5")
      === plainInserts.map(c => s"file://$wh/t/plain/_data/${c.data_dir}").toSet)
  }

  test("blooms stay conservative: DV commits kept, pre-property commits scanned") {
    val wh = java.nio.file.Files.createTempDirectory("graft_bloom2").toString
    spark.conf.set("spark.sql.catalog.gbl2",
      classOf[graft.sources.table.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gbl2.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gbl2.t")
    // property added AFTER the first insert: that commit has no bloom and
    // must stay in every probe's scan
    spark.sql("CREATE TABLE gbl2.t.d (id BIGINT)")
    spark.sql("INSERT INTO gbl2.t.d VALUES (1), (1000)")
    spark.sql("ALTER TABLE gbl2.t.d SET TBLPROPERTIES " +
      "('graft.bloom.columns' = 'id')")
    spark.sql("INSERT INTO gbl2.t.d VALUES (5), (1500)")
    // id=5 is in the bloomed commit; the pre-property commit's range [1,1000]
    // also covers 5 and it has NO bloom — it must be kept conservatively.
    // (The empty v0 CREATE commit legitimately prunes via the null-count
    // gate on the probe's implicit IsNotNull, so compare against the two
    // INSERT commits, not the bare scan.)
    val inserts = VersionedTable.commits(spark, s"$wh/t/d")
      .filter(c => c.operation == "append" && c.row_count > 0)
    val probed = scannedFiles("SELECT * FROM gbl2.t.d WHERE id = 5")
    assert(inserts.forall(c => probed.exists(_.contains(c.data_dir))),
      s"the pre-property commit has no bloom and must be kept: $probed")
    // delete some rows: the DV commit never prunes, and counts stay exact
    spark.sql("DELETE FROM gbl2.t.d WHERE id = 1000")
    assert(spark.sql("SELECT * FROM gbl2.t.d WHERE id = 1000").count() === 0)
    assert(spark.sql("SELECT id FROM gbl2.t.d WHERE id = 1500")
      .collect().map(_.getLong(0)).toSeq === Seq(1500L))
    // merge-on-read change rows get their own blooms: a probe for a merged
    // value scans the update commit, not the base ones
    VersionedTable.mergeOnRead(spark, s"$wh/t/d",
      Seq(9999L).toDF("id"), keys = Seq("id"))
    assert(spark.sql("SELECT id FROM gbl2.t.d WHERE id = 9999")
      .collect().map(_.getLong(0)).toSeq === Seq(9999L))
  }
}
