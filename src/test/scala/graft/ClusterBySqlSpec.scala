package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.catalog.VersionedTable
import graft.sources.table.GraftCatalog

/** Native `CLUSTER BY` SQL syntax — CREATE TABLE and ALTER TABLE spellings of
  * the declared write clustering FileStatsSpec proves out via the
  * TBLPROPERTIES spelling (both map onto the same spec key and the same
  * staged-write range+sort).
  */
class ClusterBySqlSpec extends AnyFunSuite with SharedSpark {

  private lazy val wh: String = {
    val dir = Files.createTempDirectory("graft_cluster").toString
    spark.conf.set("spark.sql.catalog.gclu",
      classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gclu.warehouse", dir)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gclu.t")
    dir
  }
  private def loc(t: String): String = { wh; s"$wh/t/$t" }

  private def scannedFiles(sql: String): Set[String] = {
    val plan = spark.sql(sql).queryExecution.executedPlan
    plan.collect {
      case r: org.apache.spark.sql.execution.RowDataSourceScanExec => r.relation
    }.collect {
      case s: graft.sources.table.V1SnapshotScan => s.inputFiles.toSet
    }.flatten.toSet
  }

  /** Run `body` with AQE partition coalescing off: a 1000-row range exchange
    * rightly coalesces to ONE target-sized partition (the at-scale behavior),
    * but these toy batches must span several files to prove pruning.
    */
  private def multiFile[T](body: => T): T = {
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    try body
    finally spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
  }

  test("CREATE TABLE ... CLUSTER BY declares write clustering") {
    wh // force catalog registration
    spark.sql("DROP TABLE IF EXISTS gclu.t.c1")
    spark.sql("CREATE TABLE gclu.t.c1 (id BIGINT, s STRING) CLUSTER BY (id) " +
      "TBLPROPERTIES ('graft.filestats' = 'true')")
    assert(VersionedTable.tableSpec(spark, loc("c1"))
      .get(GraftCatalog.ClusterByProp).contains("id"))
    // shuffled insert order: the declared clustering must land tight files
    multiFile {
      spark.sql("INSERT INTO gclu.t.c1 SELECT * FROM " +
        "(SELECT id, CAST(id AS STRING) AS s FROM range(1000)) " +
        "DISTRIBUTE BY hash(id)")
    }
    // a narrow range probe over the clustered commit opens fewer files than
    // the commit wrote (per-file stats prune the rest)
    val all = scannedFiles("SELECT * FROM gclu.t.c1")
    val probe = scannedFiles("SELECT * FROM gclu.t.c1 WHERE id BETWEEN 10 AND 40")
    assert(all.size > 1, s"expected a multi-file commit, got ${all.size}")
    assert(probe.size < all.size,
      s"clustered write should make the range probe prune: $probe of $all")
    // DESCRIBE surfaces the clustering transform
    val described = spark.sql("DESCRIBE TABLE EXTENDED gclu.t.c1")
      .collect().map(_.mkString("|")).mkString("\n")
    assert(described.contains("cluster"), s"no clustering in DESCRIBE:\n$described")
  }

  test("ALTER TABLE ... CLUSTER BY flips the declaration; NONE clears it") {
    wh // force catalog registration
    spark.sql("DROP TABLE IF EXISTS gclu.t.c2")
    spark.sql("CREATE TABLE gclu.t.c2 (id BIGINT, v BIGINT)")
    assert(!VersionedTable.tableSpec(spark, loc("c2"))
      .contains(GraftCatalog.ClusterByProp))
    spark.sql("ALTER TABLE gclu.t.c2 CLUSTER BY (v)")
    assert(VersionedTable.tableSpec(spark, loc("c2"))
      .get(GraftCatalog.ClusterByProp).contains("v"))
    spark.sql("ALTER TABLE gclu.t.c2 CLUSTER BY NONE")
    assert(!VersionedTable.tableSpec(spark, loc("c2"))
      .contains(GraftCatalog.ClusterByProp))
    // unknown column refuses
    val e = intercept[Exception] {
      spark.sql("ALTER TABLE gclu.t.c2 CLUSTER BY (nope)")
    }
    assert(e.getMessage.contains("nope"))
  }

  test("re-clustering applies on the next OPTIMIZE (compact re-stages)") {
    wh // force catalog registration
    spark.sql("DROP TABLE IF EXISTS gclu.t.c3")
    spark.sql("CREATE TABLE gclu.t.c3 (id BIGINT, v BIGINT) " +
      "TBLPROPERTIES ('graft.filestats' = 'true')")
    spark.sql("INSERT INTO gclu.t.c3 SELECT * FROM " +
      "(SELECT id, id * 3 AS v FROM range(1000)) DISTRIBUTE BY hash(id)")
    spark.sql("ALTER TABLE gclu.t.c3 CLUSTER BY (id)")
    multiFile {
      spark.sql("CALL gclu.system.compact(table => 't.c3', num_files => 4)")
    }
    val all = scannedFiles("SELECT * FROM gclu.t.c3")
    val probe = scannedFiles("SELECT * FROM gclu.t.c3 WHERE id BETWEEN 10 AND 40")
    assert(all.size > 1 && probe.size < all.size,
      s"post-ALTER compact should cluster: ${probe.size} of ${all.size}")
  }
}
