package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.catalog.VersionedTable

/** Batch `format("graft-table")`: snapshot + time travel + change feed through the
  * DataSource syntax, writes through SaveMode, SQL `CREATE TABLE ... USING`, and —
  * the design point — the unpartitioned read plan being the SAME native parquet
  * scan (vectorized, pushdown) the Scala API resolves, not an RDD bridge.
  */
class GraftTableBatchSpec extends AnyFunSuite with SharedSpark {

  test("read: latest snapshot, versionAsOf, and timestampAsOf") {
    import spark.implicits._
    val loc = Files.createTempDirectory("gtb_read").toString
    VersionedTable.write(Seq(1L, 2L).toDF("id"), loc, "overwrite")   // v0
    val t0 = VersionedTable.commits(spark, loc).last.timestamp
    VersionedTable.write(Seq(3L).toDF("id"), loc, "append")          // v1

    assert(spark.read.format("graft-table").load(loc)
      .as[Long].collect().sorted.toSeq === Seq(1L, 2L, 3L))
    assert(spark.read.format("graft-table").option("versionAsOf", 0).load(loc)
      .as[Long].collect().sorted.toSeq === Seq(1L, 2L))
    assert(spark.read.format("graft-table").option("timestampAsOf", t0).load(loc)
      .as[Long].collect().sorted.toSeq === Seq(1L, 2L))
  }

  test("CHECK constraints gate DataSource writes too") {
    import spark.implicits._
    val loc = Files.createTempDirectory("gtb_check").toString
    Seq((1L, 5.0)).toDF("id", "amount").write.format("graft-table")
      .mode("overwrite").save(loc)
    VersionedTable.addConstraint(spark, loc, "amount_positive", "amount > 0")
    val e = intercept[Exception] {
      Seq((2L, -1.0)).toDF("id", "amount").write.format("graft-table")
        .mode("append").save(loc)
    }
    assert(e.getMessage.contains("amount_positive"))
    assert(spark.read.format("graft-table").load(loc).count() === 1)
  }

  test("timestampAsOf tolerates a corrupt commit timestamp in the log") {
    import spark.implicits._
    val loc = Files.createTempDirectory("gtb_badts").toString
    VersionedTable.write(Seq(1L, 2L).toDF("id"), loc, "overwrite")   // v0
    VersionedTable.write(Seq(3L).toDF("id"), loc, "append")          // v1
    val t1 = VersionedTable.commits(spark, loc).last.timestamp

    // corrupt v0's stamp — one legacy/garbled commit must not take down every
    // timestampAsOf read; it just never matches a cutoff
    val logFile = java.nio.file.Paths.get(loc, "_commit_log", "0.json")
    val txt = new String(java.nio.file.Files.readAllBytes(logFile), "UTF-8")
    java.nio.file.Files.write(logFile, txt.replaceFirst(
      "\"timestamp\":\"[^\"]*\"", "\"timestamp\":\"not-a-timestamp\"").getBytes("UTF-8"))

    assert(spark.read.format("graft-table").option("timestampAsOf", t1).load(loc)
      .as[Long].collect().sorted.toSeq === Seq(1L, 2L, 3L))
  }

  test("timestampAsOf: version order dominates a regressed writer clock") {
    import spark.implicits._
    val loc = Files.createTempDirectory("gtb_skew").toString
    VersionedTable.write(Seq(1L).toDF("id"), loc, "overwrite")  // v0
    VersionedTable.write(Seq(2L).toDF("id"), loc, "append")     // v1
    VersionedTable.write(Seq(3L).toDF("id"), loc, "append")     // v2
    val t0 = java.time.Instant.parse(
      VersionedTable.commits(spark, loc).head.timestamp)

    // simulate an NTP step between writers: v1's raw stamp regresses to ten
    // seconds BEFORE v0 — raw-stamp resolution at cutoff t0 would then bind
    // to v1 (the newest raw stamp ≤ t0), silently including data committed
    // AFTER v0. Monotonic effective stamps clamp v1 to v0 + 1ms instead.
    val logFile = java.nio.file.Paths.get(loc, "_commit_log", "1.json")
    val txt = new String(java.nio.file.Files.readAllBytes(logFile), "UTF-8")
    java.nio.file.Files.write(logFile, txt.replaceFirst(
      "\"timestamp\":\"[^\"]*\"",
      "\"timestamp\":\"" + t0.minusSeconds(10).toString + "\"").getBytes("UTF-8"))

    assert(spark.read.format("graft-table")
      .option("timestampAsOf", t0.toString).load(loc)
      .as[Long].collect().sorted.toSeq === Seq(1L),
      "cutoff at v0's stamp must bind to v0, not the clock-regressed v1")
    // 1ms past v0 reaches exactly the clamped v1
    assert(spark.read.format("graft-table")
      .option("timestampAsOf", t0.plusMillis(1).toString).load(loc)
      .as[Long].collect().sorted.toSeq === Seq(1L, 2L))
    // the helper itself: strictly increasing effective stamps across all three
    assert(VersionedTable.versionAtOrBefore(spark, loc,
      java.time.Instant.parse(
        VersionedTable.commits(spark, loc).last.timestamp)) === Some(2L))
  }

  test("unpartitioned read IS the native parquet scan — pushdown and vectorization") {
    import spark.implicits._
    val loc = Files.createTempDirectory("gtb_plan").toString
    VersionedTable.write((1L to 100L).map(i => (i, s"s$i")).toDF("id", "s"), loc)
    val q = spark.read.format("graft-table").load(loc).filter(col("id") > 90).select("id")
    val scans = q.queryExecution.executedPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }
    assert(scans.size === 1, "expected the relation to BE a FileSourceScan")
    val scan = scans.head
    assert(scan.metadata("PushedFilters").contains("GreaterThan(id,90)"))
    assert(scan.schema.fieldNames.toSeq === Seq("id"), "column pruning must reach the scan")
    assert(q.as[Long].collect().sorted.toSeq === (91L to 100L))
  }

  test("partitioned fallback still prunes columns and pushes filters into branches") {
    import spark.implicits._
    val loc = Files.createTempDirectory("gtb_part").toString
    VersionedTable.write(Seq((1L, "a"), (2L, "b")).toDF("id", "p"),
      loc, "overwrite", partitionBy = Seq("p"))
    VersionedTable.write(Seq((3L, "b")).toDF("id", "p"),
      loc, "append", partitionBy = Seq("p"))
    val q = spark.read.format("graft-table").load(loc).filter(col("p") === "b")
    assert(q.select("id").as[Long].collect().sorted.toSeq === Seq(2L, 3L))
  }

  test("DataSource reads resolve deletion vectors (snapshot, as-of, and SQL)") {
    import spark.implicits._
    val loc = Files.createTempDirectory("gtb_dv").toString + "/t"
    val df = (0 until 40).map(i => (i.toLong, s"n$i")).toDF("id", "name")
    VersionedTable.write(df, loc, "overwrite")
    VersionedTable.deleteWhere(spark, loc, "id % 4 = 0")
    val read = spark.read.format("graft-table").load(loc)
    assert(read.count() === 30)
    assert(read.filter(col("id") % 4 === 0).count() === 0)
    // time travel through the DataSource sees the pre-delete state
    assert(spark.read.format("graft-table").option("versionAsOf", 0)
      .load(loc).count() === 40)
    // filters still prune through the DV anti-join plan
    assert(read.filter(col("id") > 20).count() ===
      (21 until 40).count(_ % 4 != 0))
  }

  test("batch change feed reads a version range") {
    import spark.implicits._
    val loc = Files.createTempDirectory("gtb_cdf").toString
    VersionedTable.write(Seq((1L, "a")).toDF("id", "v"), loc, "overwrite") // v0
    VersionedTable.merge(spark, loc, Seq((1L, "A"), (2L, "b")).toDF("id", "v"),
      Seq("id"), changeFeed = true)                                        // v1
    val feed = spark.read.format("graft-table")
      .option("readChangeFeed", "true")
      .option("startingVersion", 1).option("endingVersion", 1).load(loc)
      .select("id", "v", "_change_type")
      .as[(Long, String, String)].collect().sortBy(r => (r._1, r._3)).toSeq
    assert(feed === Seq(
      (1L, "A", "update_postimage"),
      (1L, "a", "update_preimage"),
      (2L, "b", "insert")))
  }

  test("write: SaveModes map onto commits; round-trips through the same format") {
    import spark.implicits._
    val loc = Files.createTempDirectory("gtb_write").toString + "/t"
    Seq(1L, 2L).toDF("id").write.format("graft-table").mode("overwrite").save(loc)
    Seq(3L).toDF("id").write.format("graft-table").mode("append").save(loc)
    assert(spark.read.format("graft-table").load(loc)
      .as[Long].collect().sorted.toSeq === Seq(1L, 2L, 3L))
    // history shows the two commits; ErrorIfExists refuses a second create
    assert(VersionedTable.history(spark, loc).count() === 2)
    intercept[Exception] {
      Seq(9L).toDF("id").write.format("graft-table").mode("errorifexists").save(loc)
    }
    // Ignore is a no-op on an existing table
    Seq(9L).toDF("id").write.format("graft-table").mode("ignore").save(loc)
    assert(spark.read.format("graft-table").load(loc).count() === 3)
  }

  test("write: partitionBy option lays out hive partitions") {
    import spark.implicits._
    val loc = Files.createTempDirectory("gtb_wpart").toString + "/t"
    Seq((1L, "x"), (2L, "y")).toDF("id", "p").write.format("graft-table")
      .option("partitionBy", "p").mode("overwrite").save(loc)
    val c = VersionedTable.commits(spark, loc).last
    assert(c.partition_by === "p")
    assert(spark.read.format("graft-table").load(loc).columns.toSet === Set("id", "p"))
  }

  test("SQL users: CREATE TABLE USING graft-table, then query and time travel") {
    import spark.implicits._
    val loc = Files.createTempDirectory("gtb_sql").toString
    VersionedTable.write(Seq((1L, "a"), (2L, "b")).toDF("id", "v"), loc) // v0
    VersionedTable.write(Seq((3L, "c")).toDF("id", "v"), loc, "append")  // v1
    spark.sql("DROP TABLE IF EXISTS gt_sql")
    spark.sql(s"CREATE TABLE gt_sql USING `graft-table` OPTIONS (path '$loc')")
    assert(spark.sql("SELECT count(*) FROM gt_sql").first().getLong(0) === 3L)
    spark.sql("DROP TABLE IF EXISTS gt_sql_v0")
    spark.sql(s"CREATE TABLE gt_sql_v0 USING `graft-table` " +
      s"OPTIONS (path '$loc', versionAsOf '0')")
    assert(spark.sql("SELECT count(*) FROM gt_sql_v0").first().getLong(0) === 2L)
    spark.sql("DROP TABLE gt_sql")
    spark.sql("DROP TABLE gt_sql_v0")
  }
}
