package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.catalog.VersionedTable

/** Generated columns: compute-on-write when absent, validate when present,
  * partitionable, and tracked through merges and updates.
  */
class GeneratedColumnsSpec extends AnyFunSuite with SharedSpark {

  private def fresh(tag: String): String =
    Files.createTempDirectory(s"gen_$tag").toString + "/t"

  test("absent generated column is computed on write; wrong explicit value refused") {
    import spark.implicits._
    val loc = fresh("basic")
    VersionedTable.write(Seq((1L, 10)).toDF("id", "n"), loc, "overwrite")
    VersionedTable.addGeneratedColumn(spark, loc, "n2", "n * 2")
    VersionedTable.write(Seq((2L, 20)).toDF("id", "n"), loc, "append")
    val rows = VersionedTable.read(spark, loc).orderBy("id").collect()
    // pre-declaration commit surfaces NULL (documented); new commit computes
    assert(rows(0).isNullAt(rows(0).fieldIndex("n2")))
    assert(rows(1).getAs[Int]("n2") === 40)
    // a batch carrying the column with the RIGHT values passes
    VersionedTable.write(Seq((3L, 30, 60)).toDF("id", "n", "n2"), loc, "append")
    // ... and with a wrong value is refused, naming the column
    val e = intercept[IllegalArgumentException] {
      VersionedTable.write(Seq((4L, 40, 99)).toDF("id", "n", "n2"), loc, "append")
    }
    assert(e.getMessage.contains("generated column n2"))
    assert(VersionedTable.read(spark, loc).count() === 3)
  }

  test("declaring over live data validates it; compact backfills absent columns") {
    import spark.implicits._
    val loc = fresh("backfill")
    VersionedTable.write(Seq((1L, 5), (2L, 7)).toDF("id", "n"), loc, "overwrite")
    VersionedTable.addGeneratedColumn(spark, loc, "n2", "n * 2")
    // compact's rewrite passes through the staged write -> computes n2 everywhere
    VersionedTable.compact(spark, loc)
    val rows = VersionedTable.read(spark, loc).orderBy("id").collect()
    assert(rows.map(_.getAs[Int]("n2")).toSeq === Seq(10, 14))
    // declaring a rule the live (now materialized) data violates is refused
    intercept[IllegalArgumentException] {
      VersionedTable.addGeneratedColumn(spark, loc, "n2", "n * 3")
    }
  }

  test("partitioning on a generated date column with pruning") {
    import spark.implicits._
    val loc = fresh("part")
    val df = Seq(
      (1L, "2024-01-01T10:00:00"), (2L, "2024-01-01T23:00:00"),
      (3L, "2024-01-02T05:00:00"))
      .toDF("id", "ts").withColumn("ts", to_timestamp(col("ts")))
    // declare BEFORE the first write — the Delta create-time shape
    VersionedTable.addGeneratedColumn(spark, loc, "day", "CAST(ts AS DATE)")
    VersionedTable.write(df, loc, "overwrite", partitionBy = Seq("day"))
    val read = VersionedTable.read(spark, loc)
    assert(read.count() === 3)
    // partition pruning: the filter lands in the scan's PartitionFilters
    // (inputFiles would show the pre-pruning listing, so assert on the plan)
    val pruned = read.filter(col("day") === "2024-01-01")
    assert(pruned.count() === 2)
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("day"), plan)
  }

  test("merge and mergeOnRead compute generated columns the change set omits") {
    import spark.implicits._
    val loc = fresh("merge")
    VersionedTable.write(Seq((1L, 10)).toDF("id", "n"), loc, "overwrite")
    VersionedTable.addGeneratedColumn(spark, loc, "n2", "n * 2")
    VersionedTable.compact(spark, loc) // materialize everywhere
    VersionedTable.merge(spark, loc, Seq((1L, 11), (2L, 20)).toDF("id", "n"),
      Seq("id"))
    var rows = VersionedTable.read(spark, loc).orderBy("id").collect()
    assert(rows.map(_.getAs[Int]("n2")).toSeq === Seq(22, 40))
    VersionedTable.mergeOnRead(spark, loc, Seq((2L, 21), (3L, 30)).toDF("id", "n"),
      Seq("id"))
    rows = VersionedTable.read(spark, loc).orderBy("id").collect()
    assert(rows.map(_.getAs[Int]("n2")).toSeq === Seq(22, 42, 60))
  }

  test("updateWhere recomputes unassigned generated columns, in data and feed") {
    import spark.implicits._
    val loc = fresh("update")
    VersionedTable.write(Seq((1L, 10), (2L, 20)).toDF("id", "n"), loc, "overwrite")
    VersionedTable.addGeneratedColumn(spark, loc, "n2", "n * 2")
    VersionedTable.compact(spark, loc)
    VersionedTable.updateWhere(spark, loc, "id = 1", Map("n" -> "n + 1"),
      changeFeed = true)
    val rows = VersionedTable.read(spark, loc).orderBy("id").collect()
    assert(rows.map(r => (r.getAs[Int]("n"), r.getAs[Int]("n2"))).toSeq
      === Seq((11, 22), (20, 40)))
    val post = VersionedTable.readChanges(spark, loc, 2, 2)
      .filter(col("_change_type") === "update_postimage").collect()
    assert(post.length === 1)
    assert(post(0).getAs[Int]("n2") === 22)
  }

  test("drop lifts computation; detail and clone carry the declarations") {
    import spark.implicits._
    val loc = fresh("drop")
    VersionedTable.write(Seq((1L, 10)).toDF("id", "n"), loc, "overwrite")
    VersionedTable.addGeneratedColumn(spark, loc, "n2", "n * 2")
    assert(VersionedTable.generatedColumns(spark, loc) === Map("n2" -> "n * 2"))
    VersionedTable.dropGeneratedColumn(spark, loc, "n2")
    assert(VersionedTable.generatedColumns(spark, loc).isEmpty)
    VersionedTable.write(Seq((2L, 20)).toDF("id", "n"), loc, "append")
    assert(!VersionedTable.read(spark, loc).columns.contains("n2"))
  }
}
