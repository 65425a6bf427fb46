package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.CdcApply

class CdcApplySpec extends AnyFunSuite with SharedSpark {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("cdc apply: upserts, deletes as tombstones, late older update stays dead") {
    import spark.implicits._
    val root = Files.createTempDirectory("cdc_snap").toString
    val b1 = Seq(
      (1L, ts("2024-01-01 10:00:00"), "c", "a"),
      (2L, ts("2024-01-01 10:00:00"), "c", "x")
    ).toDF("id", "ts", "op", "attr")
    CdcApply.applyBatch(b1, 0L, key = Seq("id"), tsCol = "ts", snapshotRoot = root)

    val b2 = Seq(
      (1L, ts("2024-01-02 10:00:00"), "u", "b"), // update k1
      (2L, ts("2024-01-02 11:00:00"), "d", "x"), // delete k2
      (3L, ts("2024-01-02 12:00:00"), "c", "z")  // create k3
    ).toDF("id", "ts", "op", "attr")
    CdcApply.applyBatch(b2, 1L, Seq("id"), "ts", root)

    val cur = CdcApply.readCurrent(spark, root).orderBy("id").collect()
    assert(cur.map(_.getLong(0)).toSeq === Seq(1L, 3L))
    assert(cur(0).getAs[String]("attr") === "b")
    // the tombstone is retained in the raw snapshot
    val raw = CdcApply.readSnapshot(spark, root).get
    assert(raw.filter(col("op") === "d").count() === 1)

    // a LATE, OLDER update for the deleted key must lose to the tombstone
    val b3 = Seq((2L, ts("2024-01-02 10:30:00"), "u", "y")).toDF("id", "ts", "op", "attr")
    CdcApply.applyBatch(b3, 2L, Seq("id"), "ts", root)
    assert(CdcApply.readCurrent(spark, root).filter(col("id") === 2L).count() === 0)
  }

  test("cdc apply: replaying a batch is idempotent") {
    import spark.implicits._
    val root = Files.createTempDirectory("cdc_replay").toString
    val b1 = Seq((1L, ts("2024-01-01 10:00:00"), "c", "a")).toDF("id", "ts", "op", "attr")
    val b2 = Seq((1L, ts("2024-01-02 10:00:00"), "u", "b")).toDF("id", "ts", "op", "attr")
    CdcApply.applyBatch(b1, 0L, Seq("id"), "ts", root)
    CdcApply.applyBatch(b2, 1L, Seq("id"), "ts", root)
    val before = CdcApply.readCurrent(spark, root).collect().toSeq
    CdcApply.applyBatch(b2, 1L, Seq("id"), "ts", root) // replay
    val after = CdcApply.readCurrent(spark, root).collect().toSeq
    assert(before === after)
    assert(after.head.getAs[String]("attr") === "b")
  }

  test("cdc apply: old snapshot versions are pruned") {
    import spark.implicits._
    val root = Files.createTempDirectory("cdc_prune").toString
    for (i <- 0 until 4) {
      val b = Seq((1L, ts(s"2024-01-0${i + 1} 10:00:00"), "u", s"v$i"))
        .toDF("id", "ts", "op", "attr")
      CdcApply.applyBatch(b, i.toLong, Seq("id"), "ts", root)
    }
    val dirs = new java.io.File(root).listFiles().filter(_.isDirectory).map(_.getName)
    assert(dirs.sorted.toSeq === Seq("v=2", "v=3"))
    assert(CdcApply.readCurrent(spark, root).first().getAs[String]("attr") === "v3")
  }

  test("cdc apply: keepVersions below 2 is rejected (replay would lose the merge base)") {
    import spark.implicits._
    val b = Seq((1L, ts("2024-01-01 10:00:00"), "c", "a")).toDF("id", "ts", "op", "attr")
    val e = intercept[IllegalArgumentException] {
      CdcApply.applyBatch(b, 0L, Seq("id"), "ts", "/tmp/never", keepVersions = 1)
    }
    assert(e.getMessage.contains("keepVersions"))
  }

  test("cdc apply: end-to-end from a stream with AvailableNow") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val root = Files.createTempDirectory("cdc_stream").toString
    val chk = Files.createTempDirectory("cdc_chk").toString
    val changes = MemoryStream[(Long, Timestamp, String, String)]
    changes.addData(
      (1L, ts("2024-01-01 10:00:00"), "c", "a"),
      (1L, ts("2024-01-02 10:00:00"), "u", "b"),
      (2L, ts("2024-01-01 10:00:00"), "c", "x"))
    val df = changes.toDF().toDF("id", "ts", "op", "attr")
    CdcApply.start(df, key = Seq("id"), tsCol = "ts",
      snapshotRoot = root, checkpointDir = chk).awaitTermination()
    val cur = CdcApply.readCurrent(spark, root).orderBy("id").collect()
    assert(cur.length === 2)
    assert(cur(0).getAs[String]("attr") === "b")
  }
}
