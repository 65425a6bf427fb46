package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.catalog.VersionedTable
import graft.ops.IncrementalAgg
import graft.streaming.LiveView

/** The full maintenance loop: source graft-table → change-feed stream → per-batch
  * deltas → exactly-once versioned view commits. The view must track a recompute
  * of the source snapshot at every drain, survive restarts on the same
  * checkpoint, and refuse to double-apply a replayed batch.
  */
class LiveViewSpec extends AnyFunSuite with SharedSpark {

  private def sortedRows(df: org.apache.spark.sql.DataFrame) =
    df.select(col("grp"), col("n_rows"), col("sum_v"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      .sortBy(_._1).toSeq

  test("live view tracks the source across snapshot bootstrap, merges, and appends") {
    import spark.implicits._
    val src = Files.createTempDirectory("lv_src").toString
    val view = Files.createTempDirectory("lv_view").toString + "/v"
    val chk = Files.createTempDirectory("lv_chk").toString
    def drain(): Unit = LiveView.maintain(
      spark, src, view, Seq("grp"), Seq("v"), chk).awaitTermination()
    def recomputed = IncrementalAgg.recompute(
      VersionedTable.read(spark, src), Seq("grp"), Seq("v"))

    VersionedTable.write(Seq(
        (1L, "a", 10.0), (2L, "a", 20.0), (3L, "b", 5.0)).toDF("id", "grp", "v"),
      src, "overwrite")                                                   // v0
    drain() // bootstrap: initial snapshot arrives as inserts
    assert(sortedRows(VersionedTable.read(spark, view)) === sortedRows(recomputed))

    // update + delete + group birth through a CDF merge, then a plain append
    VersionedTable.merge(spark, src, Seq(
        (2L, "a", 25.0, false), (3L, "b", 0.0, true), (4L, "c", 7.0, false))
        .toDF("id", "grp", "v", "del"),
      Seq("id"), deleteCol = Some("del"), changeFeed = true)              // v1
    VersionedTable.write(Seq((5L, "a", 3.0)).toDF("id", "grp", "v"), src, "append") // v2
    drain()
    assert(sortedRows(VersionedTable.read(spark, view)) === sortedRows(recomputed))
    assert(!sortedRows(VersionedTable.read(spark, view)).exists(_._1 == "b"),
      "group b died and must leave the view")

    // nothing new: a drain commits no new view version
    val versions = VersionedTable.commits(spark, view).size
    drain()
    assert(VersionedTable.commits(spark, view).size === versions)

    // replay protection: re-publishing an already-applied batch id is a no-op
    assert(VersionedTable.idempotentOverwrite(
      VersionedTable.read(spark, view), view, txnApp = chk, txnId = 0L).isEmpty)
  }
}
