package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.catalog.VersionedTable
import graft.ops.IncrementalAgg

/** Incremental view maintenance: applying change-feed deltas to an aggregate view
  * must land row-identical to re-aggregating the source snapshot — across inserts,
  * updates, deletes, group births, and group deaths. Values are integer-valued
  * doubles so both paths sum exactly (no float-order tolerance hiding a bug).
  */
class IncrementalAggSpec extends AnyFunSuite with SharedSpark {

  private val keys = Seq("grp")
  private val sums = Seq("v")

  private def viewOf(df: org.apache.spark.sql.DataFrame) =
    IncrementalAgg.recompute(df, keys, sums)

  private def sortedRows(df: org.apache.spark.sql.DataFrame) =
    df.select(col("grp"), col("n_rows"), col("sum_v"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      .sortBy(_._1).toSeq

  test("feed-maintained view equals recompute across upserts, deletes, new groups") {
    import spark.implicits._
    val loc = Files.createTempDirectory("ivm").toString
    VersionedTable.write(Seq(
        (1L, "a", 10.0), (2L, "a", 20.0), (3L, "b", 5.0)).toDF("id", "grp", "v"),
      loc, "overwrite")                                                   // v0
    val view0 = viewOf(VersionedTable.readAsOf(spark, loc, 0))

    // v1: update id=2 (a: 20→25), delete id=3 (group b dies), insert id=4 (c born)
    VersionedTable.merge(spark, loc, Seq(
        (2L, "a", 25.0, false), (3L, "b", 0.0, true), (4L, "c", 7.0, false))
        .toDF("id", "grp", "v", "del"),
      Seq("id"), deleteCol = Some("del"), changeFeed = true)              // v1
    // v2: move id=1 across groups (a→c) — an update whose pre/post straddle groups
    VersionedTable.merge(spark, loc, Seq((1L, "c", 11.0, false))
        .toDF("id", "grp", "v", "del"),
      Seq("id"), deleteCol = Some("del"), changeFeed = true)              // v2

    val feed = VersionedTable.readChanges(spark, loc, 1, 2)
    val incremental = IncrementalAgg.applyFeed(view0, feed, keys, sums)
    val recomputed = viewOf(VersionedTable.read(spark, loc))
    assert(sortedRows(incremental) === sortedRows(recomputed))
    // group b must be GONE (count reached zero), not present with zeros
    assert(!sortedRows(incremental).exists(_._1 == "b"))
  }

  test("snapshot diff feeds the same maintenance when no feed was captured") {
    import spark.implicits._
    val loc = Files.createTempDirectory("ivm_diff").toString
    VersionedTable.write(Seq(
        (1L, "x", 3.0), (2L, "x", 4.0), (3L, "y", 9.0)).toDF("id", "grp", "v"),
      loc, "overwrite")                                                   // v0
    val view0 = viewOf(VersionedTable.readAsOf(spark, loc, 0))
    // a FULL REWRITE — readChanges cannot serve this range row-level
    VersionedTable.write(Seq(
        (2L, "x", 6.0), (3L, "y", 9.0), (5L, "z", 1.0)).toDF("id", "grp", "v"),
      loc, "overwrite")                                                   // v1

    val feed = VersionedTable.diffSnapshots(spark, loc, 0, 1, Seq("id"))
    val incremental = IncrementalAgg.applyFeed(view0, feed, keys, sums)
    val recomputed = viewOf(VersionedTable.read(spark, loc))
    assert(sortedRows(incremental) === sortedRows(recomputed))
  }

  test("null sum values: both paths pin the 0.0 convention, equivalence holds") {
    import spark.implicits._
    val loc = Files.createTempDirectory("ivm_null").toString
    VersionedTable.write(Seq(
        (1L, "a", Some(2.0)), (2L, "n", Option.empty[Double])).toDF("id", "grp", "v"),
      loc, "overwrite")                                                   // v0
    val view0 = viewOf(VersionedTable.readAsOf(spark, loc, 0))
    assert(sortedRows(view0).find(_._1 == "n").map(_._3) === Some(0.0))
    // another all-null insert into the null group
    VersionedTable.merge(spark, loc,
      Seq((3L, "n", Option.empty[Double], false)).toDF("id", "grp", "v", "del"),
      Seq("id"), deleteCol = Some("del"), changeFeed = true)              // v1
    val incremental = IncrementalAgg.applyFeed(view0,
      VersionedTable.readChanges(spark, loc, 1, 1), keys, sums)
    assert(sortedRows(incremental) ===
      sortedRows(viewOf(VersionedTable.read(spark, loc))))
  }

  test("an empty feed leaves the view untouched; a non-CDF feed fails loudly") {
    import spark.implicits._
    val base = Seq((1L, "a", 2.0)).toDF("id", "grp", "v")
    val view = viewOf(base)
    val emptyFeed = base.withColumn("_change_type", lit("insert")).limit(0)
    assert(sortedRows(IncrementalAgg.applyFeed(view, emptyFeed, keys, sums))
      === sortedRows(view))
    val badFeed = base.withColumn("_change_type", lit("upsert"))
    val e = intercept[Exception] {
      IncrementalAgg.applyFeed(view, badFeed, keys, sums).collect()
    }
    assert(e.getMessage.contains("not a change-feed row"))
  }
}
