package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.catalog.VersionedTable

/** Column mapping: rename/drop as metadata, old and new files served under one
  * logical schema, writes translated back to physical names, guarded edges.
  */
class ColumnMappingSpec extends AnyFunSuite with SharedSpark {

  private def fresh(tag: String): String =
    Files.createTempDirectory(s"cm_$tag").toString + "/t"

  test("rename: no file rewritten, old and new commits serve the logical name") {
    import spark.implicits._
    val loc = fresh("rename")
    VersionedTable.write(Seq((1L, "a"), (2L, "b")).toDF("id", "name"),
      loc, "overwrite")
    val before = VersionedTable.read(spark, loc).inputFiles.toSet
    VersionedTable.renameColumn(spark, loc, "name", "title")
    assert(VersionedTable.read(spark, loc).inputFiles.toSet === before)
    assert(VersionedTable.read(spark, loc).columns.toSeq === Seq("id", "title"))
    // a batch written with the NEW logical name lands physically consistent
    VersionedTable.write(Seq((3L, "c")).toDF("id", "title"), loc, "append")
    val rows = VersionedTable.read(spark, loc).orderBy("id").collect()
    assert(rows.map(_.getAs[String]("title")).toSeq === Seq("a", "b", "c"))
    // filters on the logical name work across both file generations
    assert(VersionedTable.read(spark, loc)
      .filter(col("title") === "c").count() === 1)
  }

  test("rename chains and collision/physical-name guards") {
    import spark.implicits._
    val loc = fresh("chain")
    VersionedTable.write(Seq((1L, "a")).toDF("id", "name"), loc, "overwrite")
    VersionedTable.renameColumn(spark, loc, "name", "title")
    VersionedTable.renameColumn(spark, loc, "title", "headline")
    assert(VersionedTable.columnMapping(spark, loc) === Map("name" -> "headline"))
    assert(VersionedTable.read(spark, loc).columns.toSeq === Seq("id", "headline"))
    // renaming onto an existing logical name is refused
    intercept[IllegalArgumentException] {
      VersionedTable.renameColumn(spark, loc, "headline", "id")
    }
    // a batch reusing the renamed-away PHYSICAL name is refused
    val e = intercept[IllegalArgumentException] {
      VersionedTable.write(Seq((2L, "x", "y")).toDF("id", "headline", "name"),
        loc, "append")
    }
    assert(e.getMessage.contains("PHYSICAL"))
  }

  test("drop: column vanishes from reads; reusing the name is refused until materialized") {
    import spark.implicits._
    val loc = fresh("drop")
    VersionedTable.write(Seq((1L, "a", 5)).toDF("id", "name", "n"),
      loc, "overwrite")
    VersionedTable.dropColumn(spark, loc, "n")
    assert(VersionedTable.read(spark, loc).columns.toSeq === Seq("id", "name"))
    intercept[IllegalArgumentException] {
      VersionedTable.write(Seq((2L, "b", 9)).toDF("id", "name", "n"),
        loc, "append")
    }
    // materializeMapping rewrites under the logical schema and frees the name
    VersionedTable.materializeMapping(spark, loc)
    assert(VersionedTable.columnMapping(spark, loc).isEmpty)
    VersionedTable.write(Seq((2L, "b", 9)).toDF("id", "name", "n"), loc, "append")
    val rows = VersionedTable.read(spark, loc).orderBy("id").collect()
    assert(rows.length === 2)
    assert(rows(0).isNullAt(rows(0).fieldIndex("n"))) // old rows: fresh column
    assert(rows(1).getAs[Int]("n") === 9)
  }

  test("materialized added column: rename keeps the data, drop actually drops") {
    import spark.implicits._
    val loc = fresh("addmat")
    VersionedTable.write(Seq((1L, "a")).toDF("id", "name"), loc, "overwrite")
    VersionedTable.addColumn(spark, loc, "score", "BIGINT")
    // a write MATERIALIZES the added column into files — from here on the
    // registry entry alone no longer owns the column
    VersionedTable.write(Seq((2L, "b", 7L)).toDF("id", "name", "score"),
      loc, "append")
    VersionedTable.renameColumn(spark, loc, "score", "rating")
    val afterRename = VersionedTable.read(spark, loc).orderBy("id")
    // the rename must carry the DATA to the new name — not surface the old
    // column with its data plus an all-NULL twin
    assert(afterRename.columns.toSeq === Seq("id", "name", "rating"))
    val rows = afterRename.collect()
    assert(rows(0).isNullAt(rows(0).fieldIndex("rating"))) // pre-ADD file
    assert(rows(1).getAs[Long]("rating") === 7L)           // materialized file
    // a batch under the new logical name stays physically consistent
    VersionedTable.write(Seq((3L, "c", 9L)).toDF("id", "name", "rating"),
      loc, "append")
    assert(VersionedTable.read(spark, loc).filter(col("rating") === 9L)
      .count() === 1)
    // DROP of the (renamed, materialized) column removes it from reads AND
    // blocks physical-name reuse like any mapped drop
    VersionedTable.dropColumn(spark, loc, "rating")
    assert(VersionedTable.read(spark, loc).columns.toSeq === Seq("id", "name"))
    intercept[IllegalArgumentException] {
      VersionedTable.write(Seq((4L, "d", 1L)).toDF("id", "name", "score"),
        loc, "append")
    }
    // and the spec entry is gone: nothing resurrects a NULL column
    VersionedTable.write(Seq((4L, "d")).toDF("id", "name"), loc, "append")
    assert(VersionedTable.read(spark, loc).columns.toSeq === Seq("id", "name"))
  }

  test("added column still spec-only: rename/drop stay metadata-only in the spec") {
    import spark.implicits._
    val loc = fresh("addspec")
    VersionedTable.write(Seq((1L, "a")).toDF("id", "name"), loc, "overwrite")
    VersionedTable.addColumn(spark, loc, "score", "BIGINT")
    VersionedTable.renameColumn(spark, loc, "score", "rating")
    // no file carries the column → the mapping must stay empty (it may never
    // reference a physical name no file holds)
    assert(VersionedTable.columnMapping(spark, loc).isEmpty)
    assert(VersionedTable.read(spark, loc).columns.toSeq ===
      Seq("id", "name", "rating"))
    VersionedTable.dropColumn(spark, loc, "rating")
    assert(VersionedTable.columnMapping(spark, loc).isEmpty)
    assert(VersionedTable.read(spark, loc).columns.toSeq === Seq("id", "name"))
  }

  test("partition columns and constraint/generated references are protected") {
    import spark.implicits._
    val loc = fresh("guards")
    VersionedTable.write(Seq((1L, "p1", 5)).toDF("id", "part", "n"),
      loc, "overwrite", partitionBy = Seq("part"))
    intercept[IllegalArgumentException] {
      VersionedTable.renameColumn(spark, loc, "part", "bucket")
    }
    VersionedTable.addConstraint(spark, loc, "n_pos", "n >= 0")
    val e = intercept[IllegalArgumentException] {
      VersionedTable.dropColumn(spark, loc, "n")
    }
    assert(e.getMessage.contains("n_pos"))
    VersionedTable.dropConstraint(spark, loc, "n_pos")
    VersionedTable.dropColumn(spark, loc, "n") // now fine
  }

  test("renames compose with merges, DV deletes, time travel, and stats pruning") {
    import spark.implicits._
    val loc = fresh("compose")
    VersionedTable.write((0 until 100).map(i => (i.toLong, i * 10))
      .toDF("id", "amount"), loc, "overwrite")
    VersionedTable.renameColumn(spark, loc, "amount", "value")
    VersionedTable.merge(spark, loc,
      Seq((100L, 12345)).toDF("id", "value"), Seq("id"))
    VersionedTable.deleteWhere(spark, loc, "value < 50")
    val now = VersionedTable.read(spark, loc)
    assert(now.count() === 96) // ids 0..4 dropped (values 0..40), +1 merged
    assert(now.filter(col("value") === 12345).count() === 1)
    // time travel serves the logical name for pre-rename commits too
    assert(VersionedTable.readAsOf(spark, loc, 0).columns.toSeq
      === Seq("id", "value"))
    // stats pruning translates the logical probe to the physical stats key
    assert(VersionedTable.readPruned(spark, loc, "value", 12000, 13000)
      .count() === 1)
  }

  test("schema time travel: each version reads under the schema in force then") {
    import spark.implicits._
    val loc = fresh("ddlver")
    VersionedTable.write(Seq((1L, "a")).toDF("id", "name"), loc, "overwrite")
    VersionedTable.write(Seq((2L, "b")).toDF("id", "name"), loc, "append")
    VersionedTable.addColumn(spark, loc, "score", "BIGINT")      // at head 1
    VersionedTable.write(Seq((3L, "c", 30L)).toDF("id", "name", "score"),
      loc, "append")                                             // v2
    VersionedTable.renameColumn(spark, loc, "score", "rating")   // at head 2
    VersionedTable.write(Seq((4L, "d", 40L)).toDF("id", "name", "rating"),
      loc, "append")                                             // v3
    VersionedTable.dropColumn(spark, loc, "name")                // at head 3
    // head: the current schema
    assert(VersionedTable.read(spark, loc).columns.toSeq === Seq("id", "rating"))
    // v0: before any DDL — the original two columns, nothing anachronistic
    assert(VersionedTable.readAsOf(spark, loc, 0).columns.toSeq ===
      Seq("id", "name"))
    // v1: ADD COLUMN was made at head 1 → score visible (typed NULL)
    val v1 = VersionedTable.readAsOf(spark, loc, 1)
    assert(v1.columns.toSeq === Seq("id", "name", "score"))
    assert(v1.collect().forall(_.isNullAt(2)))
    // v2: score carries v2's data; the rename (made at head 2) shows rating
    val v2 = VersionedTable.readAsOf(spark, loc, 2).orderBy("id")
    assert(v2.columns.toSeq === Seq("id", "name", "rating"))
    assert(v2.collect().last.getAs[Long]("rating") === 30L)
    // v3: name still present (drop came at head 3... which IS v3's head) —
    // the drop binds to head 3, so v3 shows the dropped state
    assert(VersionedTable.readAsOf(spark, loc, 3).columns.toSeq ===
      Seq("id", "rating"))
    // data under historical schemas stays exact
    assert(VersionedTable.readAsOf(spark, loc, 2)
      .filter(col("name") === "b").count() === 1)
  }

  test("clone carries the added-column registry; clone DDL stays independent") {
    import spark.implicits._
    val src = fresh("clonespec_src")
    val tgt = fresh("clonespec_tgt")
    VersionedTable.write(Seq((1L, "a")).toDF("id", "name"), src, "overwrite")
    VersionedTable.addColumn(spark, src, "score", "BIGINT")
    VersionedTable.shallowClone(spark, src, tgt)
    // the spec-only added column survives the clone
    assert(VersionedTable.read(spark, tgt).columns.toSeq ===
      Seq("id", "name", "score"))
    // diverging DDL: rename on the clone leaves the source untouched
    VersionedTable.renameColumn(spark, tgt, "score", "rating")
    assert(VersionedTable.read(spark, tgt).columns.toSeq ===
      Seq("id", "name", "rating"))
    assert(VersionedTable.read(spark, src).columns.toSeq ===
      Seq("id", "name", "score"))
  }

  test("change feed and streaming appends surface logical names") {
    import spark.implicits._
    val loc = fresh("cdf")
    VersionedTable.write(Seq((1L, "a")).toDF("id", "name"), loc, "overwrite")
    VersionedTable.renameColumn(spark, loc, "name", "title")
    VersionedTable.write(Seq((2L, "b")).toDF("id", "title"), loc, "append")
    val feed = VersionedTable.readChanges(spark, loc, 1, 1)
    assert(feed.columns.contains("title") && !feed.columns.contains("name"))
    assert(feed.select("title").collect().map(_.getString(0)).toSeq === Seq("b"))
  }

  test("clone carries the mapping") {
    import spark.implicits._
    val root = Files.createTempDirectory("cm_clone").toString
    val src = s"$root/src"; val dst = s"$root/dst"
    VersionedTable.write(Seq((1L, "a")).toDF("id", "name"), src, "overwrite")
    VersionedTable.renameColumn(spark, src, "name", "title")
    VersionedTable.shallowClone(spark, src, dst)
    assert(VersionedTable.read(spark, dst).columns.toSeq === Seq("id", "title"))
  }
}
