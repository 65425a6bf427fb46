package graft

import scala.util.Random

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.catalog.VersionedTable

/** Differential testing of commit-level data skipping: random commit
  * histories (disjoint and overlapping appends, deletion-vector DELETEs and
  * UPDATEs) probed with random numeric/string/combined SQL WHERE clauses.
  * Every probe's result through the DSv2 pushdown path (which prunes whole
  * commits on logged min/max) must equal the UNPRUNED Scala read filtered
  * after the fact — the keep-rules for DV commits and stat-less columns are
  * exactly where a skipping bug would silently drop or resurrect rows.
  * A final sanity assertion checks pruning actually engaged at least once
  * across the run (a vacuously-true equality over never-pruned scans would
  * test nothing).
  */
class SkippingPropertySpec extends AnyFunSuite with SharedSpark {

  private def scannedFiles(sql: String): Set[String] = {
    val plan = spark.sql(sql).queryExecution.executedPlan
    plan.collect {
      case r: org.apache.spark.sql.execution.RowDataSourceScanExec => r.relation
    }.collect {
      case s: graft.sources.table.V1SnapshotScan => s.inputFiles.toSet
    }.flatten.toSet
  }

  test("random histories x random probes: pruned SQL scans equal unpruned reads") {
    val wh = java.nio.file.Files.createTempDirectory("graft_skipprop").toString
    spark.conf.set("spark.sql.catalog.gsp",
      classOf[graft.sources.table.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gsp.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gsp.t")
    var everPruned = false

    (1 to 8).foreach { trial =>
      val rnd = new Random(4100 + trial)
      val tbl = s"gsp.t.sk$trial"
      val loc = s"$wh/t/sk$trial"
      // half the trials opt into bloom skipping — equality probes then
      // exercise the bloom tier under the same differential contract
      val bloomProps = if (trial % 2 == 0)
        " TBLPROPERTIES ('graft.bloom.columns' = 'id,src')" else ""
      spark.sql(s"CREATE TABLE $tbl (id BIGINT, src STRING, v DOUBLE)$bloomProps")
      val tags = Seq("alpha", "bravo", "carol", "delta")
      val nCommits = 3 + rnd.nextInt(4)
      (0 until nCommits).foreach { _ =>
        val base = rnd.nextInt(10) * 100
        val tag = tags(rnd.nextInt(tags.length))
        spark.sql(s"INSERT INTO $tbl SELECT id + $base, '$tag', " +
          s"cast(id AS DOUBLE) / 7 FROM range(60)")
      }
      // DV-carrying commits: the keep-rule must never prune them away
      if (rnd.nextBoolean())
        spark.sql(s"DELETE FROM $tbl WHERE id % ${5 + rnd.nextInt(5)} = 1")
      if (rnd.nextBoolean())
        spark.sql(s"UPDATE $tbl SET v = v + 1000 WHERE src = '${tags(rnd.nextInt(4))}'")

      def canon(rows: Array[org.apache.spark.sql.Row]): Seq[(Long, String, Double)] =
        rows.map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq.sorted

      (1 to 4).foreach { _ =>
        val predicate = rnd.nextInt(4) match {
          case 0 =>
            val lo = rnd.nextInt(1100); val hi = lo + rnd.nextInt(500)
            s"id BETWEEN $lo AND $hi"
          case 1 => s"src = '${tags(rnd.nextInt(tags.length))}'"
          case 2 =>
            val lo = rnd.nextInt(1100)
            s"id >= $lo AND src <= '${tags(rnd.nextInt(tags.length))}'"
          case _ => s"id = ${rnd.nextInt(1100)}" // bloom tier (when opted in)
        }
        val sql = s"SELECT id, src, v FROM $tbl WHERE $predicate"
        val full = scannedFiles(s"SELECT id, src, v FROM $tbl")
        val probe = scannedFiles(sql)
        if (probe.size < full.size) everPruned = true
        val pruned = canon(spark.sql(sql).collect())
        val unpruned = canon(VersionedTable.read(spark, loc)
          .filter(predicate).select(col("id"), col("src"), col("v")).collect())
        assert(pruned === unpruned,
          s"trial $trial probe '$predicate' diverged (${probe.size}/${full.size} files)")
      }
    }
    assert(everPruned, "no probe across the whole run pruned a commit — " +
      "the differential assertions were vacuous")
  }
}
