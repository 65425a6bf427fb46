package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.catalog.VersionedTable

/** Partition-scoped compaction: content-preserving, slice-bounded, DV-folding.
  * The rewrite must land as a `replace` commit that shadows only the named
  * partitions, leave the other partitions' files untouched on disk, drop the
  * slice's deletion-vector rows permanently, and keep time travel intact.
  */
class ScopedCompactSpec extends AnyFunSuite with SharedSpark {

  import spark.implicits._

  private def dataFiles(loc: String): Set[String] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.flatMap(walk) else Seq(f)
    walk(new java.io.File(loc, "_data"))
      .filter(_.getName.endsWith(".parquet")).map(_.getAbsolutePath)
      .filter(_.contains("/_data/d-")).toSet
  }

  test("compactPartitions rewrites only the slice, folds its DVs, keeps history") {
    val loc = java.nio.file.Files.createTempDirectory("graft_scomp").toString + "/t"
    val df = (0L until 300L).map(i => (i, if (i % 3 == 0) "a" else "b"))
      .toDF("id", "p")
    // three appends → three live commits per partition-dir family
    VersionedTable.write(df.filter(col("id") < 100), loc, "overwrite", Seq("p"))
    VersionedTable.write(df.filter(col("id") >= 100 && col("id") < 200), loc,
      "append", Seq("p"))
    VersionedTable.write(df.filter(col("id") >= 200), loc, "append", Seq("p"))
    VersionedTable.deleteWhere(spark, loc, "p = 'a' AND id % 30 = 0")
    val expected = VersionedTable.read(spark, loc).orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    val bFilesBefore = dataFiles(loc).filter(_.contains("p=b"))

    val v = VersionedTable.compactPartitions(spark, loc,
      Seq(Seq("p" -> "a")), numFiles = 1)
    // content preserved exactly
    val after = VersionedTable.read(spark, loc).orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(after === expected)
    // the commit is a scoped replace at the new head
    val last = VersionedTable.commits(spark, loc).last
    assert(last.version === v && last.operation === "replace" &&
      last.replace_where == "p=a")
    // partition b's files were not rewritten
    assert(bFilesBefore.subsetOf(dataFiles(loc).filter(_.contains("p=b"))))
    // the slice's DV rows are FOLDED: reading partition a needs no DV anti-join
    // (its only live source is now the replace commit's own files)
    val aCount = VersionedTable.read(spark, loc).filter(col("p") === "a").count()
    assert(aCount === expected.count(_._2 == "a"))
    // time travel to the pre-compact version still serves the same content
    assert(VersionedTable.readAsOf(spark, loc, v - 1).orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq === expected)
  }

  test("CALL compact(partitions => ...) drives the scoped path through SQL") {
    val wh = java.nio.file.Files.createTempDirectory("graft_scompsql").toString
    spark.conf.set("spark.sql.catalog.gsc2",
      classOf[graft.sources.table.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gsc2.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gsc2.t")
    spark.sql("CREATE TABLE gsc2.t.sc (id BIGINT, p STRING) PARTITIONED BY (p)")
    spark.sql("INSERT INTO gsc2.t.sc SELECT id, CASE WHEN id % 2 = 0 " +
      "THEN 'x' ELSE 'y' END FROM range(100)")
    spark.sql("INSERT INTO gsc2.t.sc SELECT id + 100, 'x' FROM range(50)")
    val before = spark.sql("SELECT sum(id) FROM gsc2.t.sc").collect().head.getLong(0)
    spark.sql("CALL gsc2.system.compact(table => 't.sc', num_files => 1, " +
      "partitions => 'p=x')")
    assert(spark.sql("SELECT sum(id) FROM gsc2.t.sc").collect().head.getLong(0)
      === before)
    val last = VersionedTable.commits(spark, s"$wh/t/sc").last
    assert(last.operation === "replace" && last.replace_where == "p=x")
  }
}
