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

  test("the reference's gold daily-sales aggregate runs as a live view") {
    import spark.implicits._
    // the reference recomputes daily sales from the full curated table per run
    // (enriched/daily_sales_aggregation.py); here the same (date, region) keys
    // and additive aggregates stay current from the change feed alone
    val src = Files.createTempDirectory("lv_ds_src").toString
    val view = Files.createTempDirectory("lv_ds_view").toString + "/v"
    val chk = Files.createTempDirectory("lv_ds_chk").toString
    def drain(): Unit = LiveView.maintain(
      spark, src, view, Seq("sale_date", "region"), Seq("order_amount"), chk)
      .awaitTermination()

    VersionedTable.write(Seq(
        (1L, "2025-01-01", "EU", 10.0), (2L, "2025-01-01", "EU", 20.0),
        (3L, "2025-01-01", "US", 5.0)).toDF("order_id", "sale_date", "region", "order_amount"),
      src, "overwrite")
    drain()
    // late-arriving orders append; a correction merges (CDF) an amount in place
    VersionedTable.write(Seq((4L, "2025-01-02", "EU", 7.0))
      .toDF("order_id", "sale_date", "region", "order_amount"), src, "append")
    VersionedTable.merge(spark, src, Seq((2L, "2025-01-01", "EU", 25.0, false))
        .toDF("order_id", "sale_date", "region", "order_amount", "del"),
      Seq("order_id"), deleteCol = Some("del"), changeFeed = true)
    drain()

    val got = VersionedTable.read(spark, view)
      .select(col("sale_date"), col("region"), col("n_rows"),
        col("sum_order_amount"),
        (col("sum_order_amount") / col("n_rows")).as("avg_order_value"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4))).sortBy(r => (r._1, r._2)).toSeq
    assert(got === Seq(
      ("2025-01-01", "EU", 2L, 35.0, 17.5),
      ("2025-01-01", "US", 1L, 5.0, 5.0),
      ("2025-01-02", "EU", 1L, 7.0, 7.0)))
  }

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

  test("a second maintainer of the same view fails fast instead of corrupting it") {
    import spark.implicits._
    val src = Files.createTempDirectory("lv2_src").toString
    val view = Files.createTempDirectory("lv2_view").toString + "/v"
    val chk1 = Files.createTempDirectory("lv2_chk1").toString
    val chk2 = Files.createTempDirectory("lv2_chk2").toString

    VersionedTable.write(Seq((1L, "a", 10.0), (2L, "b", 5.0)).toDF("id", "grp", "v"),
      src, "overwrite")
    LiveView.maintain(spark, src, view, Seq("grp"), Seq("v"), chk1).awaitTermination()
    val owned = sortedRows(VersionedTable.read(spark, view))

    // a RIVAL maintainer (different checkpoint = different identity) must throw
    // on its first batch, and the view must be byte-for-byte what chk1 left
    VersionedTable.write(Seq((3L, "a", 1.0)).toDF("id", "grp", "v"), src, "append")
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      LiveView.maintain(spark, src, view, Seq("grp"), Seq("v"), chk2).awaitTermination()
    }
    assert(e.getMessage.contains("second maintainer") ||
      Option(e.getCause).exists(_.getMessage.contains("second maintainer")))
    assert(sortedRows(VersionedTable.read(spark, view)) === owned,
      "the rejected rival must not have committed anything")

    // the legitimate maintainer keeps working
    LiveView.maintain(spark, src, view, Seq("grp"), Seq("v"), chk1).awaitTermination()
    assert(sortedRows(VersionedTable.read(spark, view)) === sortedRows(
      IncrementalAgg.recompute(VersionedTable.read(spark, src), Seq("grp"), Seq("v"))))
  }
}
