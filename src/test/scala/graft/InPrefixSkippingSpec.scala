package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.catalog.VersionedTable

/** IN-list and LIKE-prefix data skipping through pure SQL on a catalog table.
  *
  * The conjunction envelope alone cannot serve either shape: `id IN (a, b)`
  * has envelope [a, b] which keeps every commit BETWEEN the two values, and
  * `s LIKE 'p%'` contributes no closed range at all. The per-VALUE gate
  * checks each IN value against commit min/max + bloom; the prefix gate
  * translates to the range [p, p + high-sentinel] (sound because string stats
  * record ASCII-safe values only — see FilterTranslation.ranges). Both tiers
  * also flow into the per-file sidecar gate (`graft.filestats`).
  */
class InPrefixSkippingSpec extends AnyFunSuite with SharedSpark {

  private def scanned(sql: String): Set[String] = {
    val plan = spark.sql(sql).queryExecution.executedPlan
    plan.collect {
      case r: org.apache.spark.sql.execution.RowDataSourceScanExec => r.relation
    }.collect {
      case s: graft.sources.table.V1SnapshotScan => s.inputFiles.toSet
    }.flatten.toSet
  }

  private def dirs(files: Set[String]): Set[String] =
    files.map(f => f.substring(0, f.lastIndexOf('/')))

  test("IN-list prunes per value: commits between the probed values drop") {
    val wh = java.nio.file.Files.createTempDirectory("graft_inskip").toString
    spark.conf.set("spark.sql.catalog.gin",
      classOf[graft.sources.table.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gin.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gin.t")
    spark.sql("CREATE TABLE gin.t.d (id BIGINT, s STRING)")
    // three commits at DISJOINT ranges — the middle one sits inside the
    // envelope of the probe below but matches none of its values
    spark.sql("INSERT INTO gin.t.d SELECT id, concat('aa', id) FROM range(0, 100)")
    spark.sql("INSERT INTO gin.t.d SELECT id, concat('mm', id) FROM range(1000, 1100)")
    spark.sql("INSERT INTO gin.t.d SELECT id, concat('zz', id) FROM range(2000, 2100)")
    val Seq(lo, mid, hi) = VersionedTable.commits(spark, s"$wh/t/d")
      .sortBy(_.version).takeRight(3).map(_.data_dir)
    val all = dirs(scanned("SELECT * FROM gin.t.d"))
    assert(Seq(lo, mid, hi).forall(d => all.exists(_.contains(d))),
      s"unpruned scan should read every insert: $all")
    val probe = dirs(scanned("SELECT * FROM gin.t.d WHERE id IN (50, 2050)"))
    assert(probe.exists(_.contains(lo)) && probe.exists(_.contains(hi)) &&
      !probe.exists(_.contains(mid)),
      s"per-value IN pruning missed the middle commit: $probe")
    assert(spark.sql("SELECT sum(id) FROM gin.t.d WHERE id IN (50, 2050)")
      .collect().head.getLong(0) === 2100L)
    // string IN prunes on sstats the same way
    val sProbe = dirs(scanned("SELECT * FROM gin.t.d WHERE s IN ('aa42', 'zz2042')"))
    assert(!sProbe.exists(_.contains(mid)), s"string IN pruning missed: $sProbe")
    assert(spark.sql("SELECT count(*) FROM gin.t.d WHERE s IN ('aa42', 'zz2042')")
      .collect().head.getLong(0) === 2L)
    // values matching NOTHING: every data commit drops, query still answers
    assert(spark.sql("SELECT * FROM gin.t.d WHERE id IN (500, 1500)").count() === 0L)
  }

  test("LIKE 'p%' prunes commits and files via the sentinel range") {
    val wh = java.nio.file.Files.createTempDirectory("graft_preskip").toString
    spark.conf.set("spark.sql.catalog.gpre",
      classOf[graft.sources.table.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gpre.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gpre.t")
    spark.sql("CREATE TABLE gpre.t.d (k STRING, v BIGINT)")
    spark.sql("INSERT INTO gpre.t.d SELECT concat('alpha/', id), id FROM range(100)")
    spark.sql("INSERT INTO gpre.t.d SELECT concat('beta/', id), id FROM range(100)")
    spark.sql("INSERT INTO gpre.t.d SELECT concat('gamma/', id), id FROM range(100)")
    val all = dirs(scanned("SELECT * FROM gpre.t.d"))
    val probe = dirs(scanned("SELECT * FROM gpre.t.d WHERE k LIKE 'beta/%'"))
    assert(probe.size < all.size, s"prefix pruning missed: $probe of $all")
    assert(spark.sql("SELECT count(*) FROM gpre.t.d WHERE k LIKE 'beta/%'")
      .collect().head.getLong(0) === 100L)
    // a prefix ABOVE every recorded max prunes all data commits; still exact
    assert(spark.sql("SELECT count(*) FROM gpre.t.d WHERE k LIKE 'zzz%'")
      .collect().head.getLong(0) === 0L)

    // non-ASCII-safe batch records no sstats → conservatively scanned, so a
    // probe that matches its rows stays exact
    spark.sql("INSERT INTO gpre.t.d VALUES ('beta/\"q\"', -1)")
    assert(spark.sql("SELECT count(*) FROM gpre.t.d WHERE k LIKE 'beta/%'")
      .collect().head.getLong(0) === 101L)
  }

  test("per-file tier: IN and prefix probes shrink a bulk commit's file set") {
    val wh = java.nio.file.Files.createTempDirectory("graft_infile").toString
    spark.conf.set("spark.sql.catalog.ginf",
      classOf[graft.sources.table.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.ginf.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS ginf.t")
    spark.sql("CREATE TABLE ginf.t.d (id BIGINT, s STRING) " +
      "TBLPROPERTIES ('graft.filestats' = 'true')")
    import spark.implicits._
    val bulk = spark.range(1000).toDF("id")
      .withColumn("s", format_string("k%04d", col("id")))
      .repartitionByRange(4, col("id"))
    VersionedTable.write(bulk, s"$wh/t/d", "append")
    val dataDir = VersionedTable.commits(spark, s"$wh/t/d").last.data_dir
    def bulkFiles(fs: Set[String]): Set[String] = fs.filter(_.contains(dataDir))
    val all = bulkFiles(scanned("SELECT * FROM ginf.t.d"))
    assert(all.size === 4)
    // two values landing in the same quartile: 1 of 4 files survives
    val inProbe = bulkFiles(
      scanned("SELECT * FROM ginf.t.d WHERE id IN (10, 40)"))
    assert(inProbe.size === 1, s"per-file IN pruning missed: $inProbe")
    assert(spark.sql("SELECT sum(id) FROM ginf.t.d WHERE id IN (10, 40)")
      .collect().head.getLong(0) === 50L)
    // prefix probe: k09xx lives in the last quartile only
    val pProbe = bulkFiles(
      scanned("SELECT * FROM ginf.t.d WHERE s LIKE 'k09%'"))
    assert(pProbe.size === 1, s"per-file prefix pruning missed: $pProbe")
    assert(spark.sql("SELECT count(*) FROM ginf.t.d WHERE s LIKE 'k09%'")
      .collect().head.getLong(0) === 100L)
  }
}
