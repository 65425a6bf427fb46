package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.catalog.VersionedTable

/** Shallow clone: metadata-only table copies that serve the source's state by
  * reference, diverge independently, and never let the clone's vacuum touch
  * borrowed source files.
  */
class CloneSpec extends AnyFunSuite with SharedSpark {

  private def fresh(tag: String): String =
    Files.createTempDirectory(s"clone_$tag").toString

  private def mk(loc: String, n: Int = 100): Unit = {
    import spark.implicits._
    val df = (0 until n).map(i => (i.toLong, s"n$i", i % 5)).toDF("id", "name", "grp")
    VersionedTable.write(df, loc, "overwrite")
  }

  private def ownDataFiles(loc: String): Seq[String] = {
    val dir = new java.io.File(loc, "_data")
    if (!dir.exists()) return Nil
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
    walk(dir).filter(_.getName.endsWith(".parquet")).map(_.getAbsolutePath)
  }

  test("clone is metadata-only and reads identically to the source") {
    val root = fresh("basic")
    val src = s"$root/src"; val dst = s"$root/dst"
    mk(src)
    import spark.implicits._
    VersionedTable.write((100 until 150).map(i => (i.toLong, s"n$i", i % 5))
      .toDF("id", "name", "grp"), src, "append")
    VersionedTable.shallowClone(spark, src, dst)
    assert(ownDataFiles(dst).isEmpty) // zero bytes copied
    assert(VersionedTable.read(spark, dst).count() === 150)
    assert(VersionedTable.fastCount(spark, dst) === 150)
    assert(VersionedTable.read(spark, dst).orderBy("id").collect().toSeq
      === VersionedTable.read(spark, src).orderBy("id").collect().toSeq)
  }

  test("time-travel clone pins the chosen version") {
    val root = fresh("asof")
    val src = s"$root/src"; val dst = s"$root/dst"
    mk(src)                                                   // v0: 100 rows
    import spark.implicits._
    VersionedTable.write(Seq((999L, "x", 0)).toDF("id", "name", "grp"),
      src, "append")                                          // v1
    VersionedTable.shallowClone(spark, src, dst, version = Some(0L))
    assert(VersionedTable.read(spark, dst).count() === 100)
  }

  test("clone and source diverge independently after the clone") {
    val root = fresh("diverge")
    val src = s"$root/src"; val dst = s"$root/dst"
    mk(src)
    VersionedTable.shallowClone(spark, src, dst)
    import spark.implicits._
    VersionedTable.write(Seq((500L, "clone-only", 1)).toDF("id", "name", "grp"),
      dst, "append")
    VersionedTable.deleteWhere(spark, dst, "id < 10")
    VersionedTable.write(Seq((600L, "src-only", 2)).toDF("id", "name", "grp"),
      src, "append")
    assert(VersionedTable.read(spark, src).count() === 101)
    assert(VersionedTable.read(spark, dst).count() === 91)
    assert(VersionedTable.read(spark, src)
      .filter(col("name") === "clone-only").count() === 0)
    assert(VersionedTable.read(spark, dst)
      .filter(col("name") === "src-only").count() === 0)
  }

  test("clone of a DV-bearing snapshot serves the deletes by reference") {
    val root = fresh("dv")
    val src = s"$root/src"; val dst = s"$root/dst"
    mk(src)
    VersionedTable.deleteWhere(spark, src, "id % 2 = 0")
    VersionedTable.shallowClone(spark, src, dst)
    assert(ownDataFiles(dst).isEmpty)
    assert(VersionedTable.read(spark, dst).count() === 50)
    assert(VersionedTable.fastCount(spark, dst) === 50)
  }

  test("clone of a partitioned table with a scoped merge keeps shadowing") {
    import spark.implicits._
    val root = fresh("scoped")
    val src = s"$root/src"; val dst = s"$root/dst"
    val df = (0 until 100).map(i => (i.toLong, s"p${i % 4}", "v0"))
      .toDF("id", "part", "tag")
    VersionedTable.write(df, src, "overwrite", partitionBy = Seq("part"))
    val changes = df.filter(col("part") === "p1")
      .withColumn("tag", lit("v1"))
    VersionedTable.merge(spark, src, changes, Seq("id", "part"))
    assert(VersionedTable.commits(spark, src).last.replace_where.nonEmpty)
    VersionedTable.shallowClone(spark, src, dst)
    val d = VersionedTable.read(spark, dst)
    assert(d.count() === 100)
    assert(d.filter(col("part") === "p1" && col("tag") =!= "v1").count() === 0)
    assert(d.filter(col("part") =!= "p1" && col("tag") =!= "v0").count() === 0)
  }

  test("compact severs the dependency; the clone's vacuum never touches source files") {
    val root = fresh("vacuum")
    val src = s"$root/src"; val dst = s"$root/dst"
    mk(src)
    VersionedTable.shallowClone(spark, src, dst)
    val srcFiles = ownDataFiles(src).toSet
    // vacuum the clone aggressively BEFORE compact: borrowed dirs must survive
    VersionedTable.vacuum(spark, dst, retentionMs = 0L, orphanGraceMs = 0L)
    assert(ownDataFiles(src).toSet === srcFiles)
    assert(VersionedTable.read(spark, dst).count() === 100)
    VersionedTable.compact(spark, dst)
    VersionedTable.vacuum(spark, dst, retentionMs = 0L, orphanGraceMs = 0L)
    assert(ownDataFiles(src).toSet === srcFiles) // still untouched
    val files = VersionedTable.read(spark, dst).inputFiles
    assert(files.nonEmpty && files.forall(_.contains("/dst/")))
  }

  test("clone carries the source's constraints forward") {
    val root = fresh("constraints")
    val src = s"$root/src"; val dst = s"$root/dst"
    mk(src)
    VersionedTable.addConstraint(spark, src, "grp_ok", "grp BETWEEN 0 AND 5")
    VersionedTable.shallowClone(spark, src, dst)
    import spark.implicits._
    val e = intercept[IllegalArgumentException] {
      VersionedTable.write(Seq((1L, "bad", 99)).toDF("id", "name", "grp"),
        dst, "append")
    }
    assert(e.getMessage.contains("grp_ok"))
  }

  test("detail summarizes snapshot metadata, DV rows, and borrowed commits") {
    val root = fresh("detail")
    val src = s"$root/src"; val dst = s"$root/dst"
    mk(src)
    VersionedTable.deleteWhere(spark, src, "id < 10")
    VersionedTable.shallowClone(spark, src, dst)
    val d = VersionedTable.detail(spark, dst).collect()(0)
    assert(d.getAs[Long]("num_rows") === 90L)
    assert(d.getAs[Long]("live_dv_rows") === 10L)
    assert(d.getAs[Long]("borrowed_commits") === 2L) // data commit + dv commit
    assert(d.getAs[Long]("num_files") > 0)
    assert(d.getAs[Long]("size_bytes") > 0)
    val s = VersionedTable.detail(spark, src).collect()(0)
    assert(s.getAs[Long]("borrowed_commits") === 0L)
    assert(s.getAs[Long]("num_constraints") === 0L)
  }

  test("clone refuses an existing target and a vacuumed source version") {
    val root = fresh("refuse")
    val src = s"$root/src"; val dst = s"$root/dst"
    mk(src); mk(dst)
    intercept[IllegalArgumentException] {
      VersionedTable.shallowClone(spark, src, dst)
    }
  }
}
