package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.catalog.VersionedTable

/** Per-commit null counts (Delta nullCount parity): IS NOT NULL prunes
  * all-null commits — which record NO min/max and therefore dodge the range
  * gate — and IS NULL prunes null-free ones; absent counts (older logs) keep
  * conservatively. Null counts ride the same write-time observe as min/max.
  */
class NullStatsSpec extends AnyFunSuite with SharedSpark {

  import spark.implicits._

  private def scannedCommits(sql: String): Set[String] = {
    val plan = spark.sql(sql).queryExecution.executedPlan
    plan.collect {
      case r: org.apache.spark.sql.execution.RowDataSourceScanExec => r.relation
    }.collect {
      case s: graft.sources.table.V1SnapshotScan => s.inputFiles.toSet
    }.flatten.map(f => f.substring(0, f.indexOf("/part-"))).toSet
  }

  test("null counts land in commits; IS NULL / IS NOT NULL prune") {
    val wh = java.nio.file.Files.createTempDirectory("graft_nulls").toString
    spark.conf.set("spark.sql.catalog.gnl",
      classOf[graft.sources.table.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gnl.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gnl.t")
    spark.sql("CREATE TABLE gnl.t.d (id BIGINT, v STRING)")
    spark.sql("INSERT INTO gnl.t.d VALUES (1, 'a'), (2, 'b')")      // null-free
    spark.sql("INSERT INTO gnl.t.d VALUES (3, NULL), (4, NULL)")    // all-null v
    spark.sql("INSERT INTO gnl.t.d VALUES (5, 'c'), (6, NULL)")     // mixed

    val cs = VersionedTable.commits(spark, s"$wh/t/d")
    val byRows = cs.filter(_.operation == "append").sortBy(_.version)
    assert(byRows.map(_.nulls.get("v")) === Seq(Some(0L), Some(2L), Some(1L)))
    assert(byRows.forall(_.nulls.get("id").contains(0L)))

    val all = scannedCommits("SELECT * FROM gnl.t.d")
    def dirs(kept: Set[String]) =
      byRows.filter(c => kept.exists(_.endsWith(c.data_dir))).map(_.version)
    // IS NOT NULL drops the all-null commit (its v min/max is unrecorded, so
    // only the null count can prune it) AND the empty CREATE commit (0 rows
    // → no non-null row can exist — the range gate never sees either)
    val notNull = scannedCommits("SELECT * FROM gnl.t.d WHERE v IS NOT NULL")
    assert(dirs(notNull) === Seq(byRows(0).version, byRows(2).version),
      s"$notNull of $all")
    assert(spark.sql("SELECT id FROM gnl.t.d WHERE v IS NOT NULL")
      .collect().map(_.getLong(0)).sorted.toSeq === Seq(1L, 2L, 5L))
    // IS NULL drops the null-free commit (and the empty one)
    val isNull = scannedCommits("SELECT * FROM gnl.t.d WHERE v IS NULL")
    assert(dirs(isNull) === Seq(byRows(1).version, byRows(2).version),
      s"$isNull of $all")
    assert(spark.sql("SELECT id FROM gnl.t.d WHERE v IS NULL")
      .collect().map(_.getLong(0)).sorted.toSeq === Seq(3L, 4L, 6L))
    // the IMPLICIT IsNotNull Spark pushes with an ordinary predicate also
    // prunes the all-null commit — `WHERE v = 'a'` never visits it
    val eqScan = scannedCommits("SELECT * FROM gnl.t.d WHERE v = 'a'")
    assert(!eqScan.exists(d =>
        byRows(1).data_dir.nonEmpty && d.endsWith(byRows(1).data_dir)),
      s"all-null commit not pruned from $eqScan")
    // deletes keep results exact (DV commits are never pruned)
    spark.sql("DELETE FROM gnl.t.d WHERE id = 5")
    assert(spark.sql("SELECT id FROM gnl.t.d WHERE v IS NOT NULL")
      .collect().map(_.getLong(0)).sorted.toSeq === Seq(1L, 2L))
  }
}
