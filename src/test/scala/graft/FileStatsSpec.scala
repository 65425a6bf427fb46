package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.catalog.VersionedTable

/** Per-file stats (opt-in `TBLPROPERTIES ('graft.filestats' = 'true')`):
  * intra-commit skipping for bulk-loaded tables — one commit holding every
  * file is invisible to commit-level min/max, but its `_filestats.tsv`
  * sidecar lets a pruned read keep only the FILES whose per-file stats can
  * match. Values must cluster by file for pruning to fire (here:
  * range-repartitioned on the probe column, the documented contract).
  */
class FileStatsSpec extends AnyFunSuite with SharedSpark {

  import spark.implicits._

  private def scannedFiles(sql: String): Set[String] = {
    val plan = spark.sql(sql).queryExecution.executedPlan
    plan.collect {
      case r: org.apache.spark.sql.execution.RowDataSourceScanExec => r.relation
    }.collect {
      case s: graft.sources.table.V1SnapshotScan => s.inputFiles.toSet
    }.flatten.toSet
  }

  test("bulk-loaded commit prunes to the matching files; results stay exact") {
    val wh = java.nio.file.Files.createTempDirectory("graft_fstats").toString
    spark.conf.set("spark.sql.catalog.gfs",
      classOf[graft.sources.table.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gfs.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gfs.t")
    spark.sql("CREATE TABLE gfs.t.d (id BIGINT, s STRING, maybe STRING) " +
      "TBLPROPERTIES ('graft.filestats' = 'true')")
    val loc = s"$wh/t/d"
    // ONE bulk commit of 1000 rows across 4 range-clustered files; `s` sorts
    // with id (string tier prunes too); `maybe` is NULL except in [250,500)
    val bulk = spark.range(1000).toDF("id")
      .withColumn("s", format_string("k%04d", col("id")))
      .withColumn("maybe",
        when(col("id") >= 250 && col("id") < 500, lit("present")))
      .repartitionByRange(4, col("id"))
    VersionedTable.write(bulk, loc, "append")

    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(s"file://$loc"), spark.sparkContext.hadoopConfiguration)
    val dataDir = VersionedTable.commits(spark, loc).last.data_dir
    val sidecar = new org.apache.hadoop.fs.Path(s"$loc/_data/$dataDir/_filestats.tsv")
    assert(fs.exists(sidecar), "filestats sidecar not written")

    // the CREATE's empty v0 file rides along in the bare scan — assertions
    // are scoped to the BULK commit's own files (the intra-commit claim)
    def bulkFiles(files: Set[String]): Set[String] = files.filter(_.contains(dataDir))
    val all = bulkFiles(scannedFiles("SELECT * FROM gfs.t.d"))
    assert(all.size === 4, s"expected 4 data files in the bulk commit, got $all")
    // numeric range inside one file's span: scan shrinks WITHIN the commit
    val probe = bulkFiles(
      scannedFiles("SELECT * FROM gfs.t.d WHERE id BETWEEN 100 AND 150"))
    assert(probe.size < all.size,
      s"per-file stats did not prune: $probe of $all")
    assert(spark.sql("SELECT count(id) AS c FROM gfs.t.d WHERE id BETWEEN 100 AND 150")
      .collect().head.getLong(0) === 51L)
    // string tier prunes too
    val sProbe = bulkFiles(scannedFiles("SELECT * FROM gfs.t.d WHERE s = 'k0042'"))
    assert(sProbe.size < all.size, s"string file pruning missed: $sProbe")
    assert(spark.sql("SELECT id FROM gfs.t.d WHERE s = 'k0042'")
      .collect().map(_.getLong(0)).toSeq === Seq(42L))
    // IS NOT NULL on `maybe` keeps only files with non-null rows
    val nn = bulkFiles(scannedFiles("SELECT * FROM gfs.t.d WHERE maybe IS NOT NULL"))
    assert(nn.size < all.size, s"null-count file pruning missed: $nn")
    assert(spark.sql("SELECT count(*) FROM gfs.t.d WHERE maybe IS NOT NULL")
      .collect().head.getLong(0) === 250L)
    // a probe matching NOTHING (every file pruned) still answers, zero rows
    assert(spark.sql("SELECT * FROM gfs.t.d WHERE id = -5").count() === 0L)

    // deletion vectors compose: delete rows, file-pruned reads stay exact
    spark.sql("DELETE FROM gfs.t.d WHERE id = 120")
    assert(spark.sql("SELECT count(id) FROM gfs.t.d WHERE id BETWEEN 100 AND 150")
      .collect().head.getLong(0) === 50L)

    // a table WITHOUT the property writes no sidecar and scans whole commits
    spark.sql("CREATE TABLE gfs.t.plain (id BIGINT)")
    spark.sql("INSERT INTO gfs.t.plain SELECT id FROM range(100)")
    val plainDir = VersionedTable.commits(spark, s"$wh/t/plain").last.data_dir
    assert(!fs.exists(new org.apache.hadoop.fs.Path(
      s"$wh/t/plain/_data/$plainDir/_filestats.tsv")))
  }

  test("declared clustering makes plain INSERTs prune without caller ORDER BY") {
    val wh = java.nio.file.Files.createTempDirectory("graft_fstats3").toString
    spark.conf.set("spark.sql.catalog.gfs3",
      classOf[graft.sources.table.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gfs3.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gfs3.t")
    spark.sql("CREATE TABLE gfs3.t.c (id BIGINT, v STRING) TBLPROPERTIES " +
      "('graft.filestats' = 'true', 'graft.cluster.by' = 'id')")
    // deliberately SHUFFLED insert order — the declared clustering must
    // range-sort the batch itself for the per-file stats to become tight.
    // AQE rightly coalesces a 1000-row range exchange to ONE target-sized
    // partition (the at-scale behavior we want); suspend coalescing so this
    // toy batch still spans several files, as a real-sized batch would.
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    try spark.sql("INSERT INTO gfs3.t.c " +
      "SELECT (id * 839) % 1000 AS id, concat('v', id) AS v FROM range(1000)")
    finally spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    val dataDir = VersionedTable.commits(spark, s"$wh/t/c").last.data_dir
    def cFiles(files: Set[String]): Set[String] = files.filter(_.contains(dataDir))
    val all = cFiles(scannedFiles("SELECT * FROM gfs3.t.c"))
    assert(all.size > 1, s"expected a multi-file clustered commit, got $all")
    val probe = cFiles(scannedFiles("SELECT * FROM gfs3.t.c WHERE id < 100"))
    assert(probe.size < all.size,
      s"clustered write should make the range probe prune: $probe of $all")
    assert(spark.sql("SELECT count(*) FROM gfs3.t.c WHERE id < 100")
      .collect().head.getLong(0) === 100L)
  }

  test("hive-partitioned commits prune files on non-partition columns") {
    val wh = java.nio.file.Files.createTempDirectory("graft_fstats4").toString
    spark.conf.set("spark.sql.catalog.gfs4",
      classOf[graft.sources.table.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gfs4.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gfs4.t")
    spark.sql("CREATE TABLE gfs4.t.p (id BIGINT, src STRING) " +
      "PARTITIONED BY (src) TBLPROPERTIES ('graft.filestats' = 'true')")
    val loc = s"$wh/t/p"
    // one bulk commit: 4 id-range tasks × 2 src partitions = 8 files, each
    // covering one id quartile WITHIN its partition directory
    val bulk = spark.range(1000).toDF("id")
      .withColumn("src", when(col("id") % 2 === 0, lit("even")).otherwise(lit("odd")))
      .repartitionByRange(4, col("id"))
    VersionedTable.write(bulk, loc, "append", partitionBy = Seq("src"))
    val dataDir = VersionedTable.commits(spark, loc).last.data_dir
    def bulkFiles(fs: Set[String]): Set[String] = fs.filter(_.contains(dataDir))
    val all = bulkFiles(scannedFiles("SELECT * FROM gfs4.t.p"))
    assert(all.size === 8, s"expected 4 id-quartiles x 2 partitions, got $all")
    // probe on the NON-partition column: only the quartile files survive, in
    // BOTH partition dirs — the skip hive pruning alone can never make
    val probe = bulkFiles(
      scannedFiles("SELECT * FROM gfs4.t.p WHERE id BETWEEN 300 AND 320"))
    assert(probe.size === 2, s"partitioned per-file pruning missed: $probe")
    assert(probe.exists(_.contains("src=even")) && probe.exists(_.contains("src=odd")))
    // partition column still materializes off the file-listed read
    val rows = spark.sql(
      "SELECT id, src FROM gfs4.t.p WHERE id BETWEEN 300 AND 302 ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(rows === Seq((300L, "even"), (301L, "odd"), (302L, "even")))
    // partition filter composes: hive pruning drops the odd dir, file stats
    // the other quartiles
    assert(spark.sql(
      "SELECT count(*) FROM gfs4.t.p WHERE src = 'even' AND id BETWEEN 300 AND 320")
      .collect().head.getLong(0) === 11L)
    // deletion vectors compose with the file-listed partitioned branch
    spark.sql("DELETE FROM gfs4.t.p WHERE id = 310")
    assert(spark.sql(
      "SELECT count(*) FROM gfs4.t.p WHERE id BETWEEN 300 AND 320")
      .collect().head.getLong(0) === 20L)
  }

  test("declared clustering tiles a partitioned table's dirs by cluster range") {
    val wh = java.nio.file.Files.createTempDirectory("graft_fstats5").toString
    spark.conf.set("spark.sql.catalog.gfs5",
      classOf[graft.sources.table.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gfs5.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gfs5.t")
    spark.sql("CREATE TABLE gfs5.t.pc (id BIGINT, src STRING) PARTITIONED BY (src) " +
      "TBLPROPERTIES ('graft.filestats' = 'true', 'graft.cluster.by' = 'id')")
    // shuffled SQL INSERT; the declared clustering ranges on (src, id) so each
    // partition dir's files tile the id range (AQE coalescing suspended — the
    // toy batch must span files the way a real-sized one would)
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    try spark.sql("INSERT INTO gfs5.t.pc SELECT (id * 839) % 1000 AS id, " +
      "CASE WHEN id % 2 = 0 THEN 'even' ELSE 'odd' END AS src FROM range(1000)")
    finally spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    val dataDir = VersionedTable.commits(spark, s"$wh/t/pc").last.data_dir
    def cf(fs: Set[String]): Set[String] = fs.filter(_.contains(dataDir))
    val all = cf(scannedFiles("SELECT * FROM gfs5.t.pc"))
    assert(all.size > 2, s"expected several clustered files per dir, got $all")
    val probe = cf(scannedFiles("SELECT * FROM gfs5.t.pc WHERE id < 60"))
    assert(probe.size < all.size,
      s"partitioned clustering should make the id probe prune: $probe of $all")
    assert(spark.sql("SELECT count(*) FROM gfs5.t.pc WHERE id < 60")
      .collect().head.getLong(0) === 60L)
  }

  test("compaction re-clusters and re-records per-file stats") {
    val wh = java.nio.file.Files.createTempDirectory("graft_fstats2").toString
    spark.conf.set("spark.sql.catalog.gfs2",
      classOf[graft.sources.table.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gfs2.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gfs2.t")
    // write through the catalog so the property rides table creation
    spark.sql("CREATE TABLE gfs2.t.z (id BIGINT) " +
      "TBLPROPERTIES ('graft.filestats' = 'true')")
    spark.sql("INSERT INTO gfs2.t.z SELECT id FROM range(500)")
    spark.sql("INSERT INTO gfs2.t.z SELECT id + 500 FROM range(500)")
    // Z-order compact on id → one commit, range-clustered files with stats
    VersionedTable.compact(spark, s"$wh/t/z", zorderBy = Seq("id"))
    val last = VersionedTable.commits(spark, s"$wh/t/z").last
    assert(last.operation === "compact")
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(s"file://$wh"), spark.sparkContext.hadoopConfiguration)
    assert(fs.exists(new org.apache.hadoop.fs.Path(
      s"$wh/t/z/_data/${last.data_dir}/_filestats.tsv")),
      "compact should re-record per-file stats")
    // post-compact probe prunes within the single compacted commit
    val all = scannedFiles("SELECT * FROM gfs2.t.z")
    if (all.size > 1) {
      val probe = scannedFiles("SELECT * FROM gfs2.t.z WHERE id < 10")
      assert(probe.size < all.size, s"post-compact pruning missed: $probe of $all")
    }
    assert(spark.sql("SELECT count(*) FROM gfs2.t.z WHERE id < 10")
      .collect().head.getLong(0) === 10L)
  }
}
