package graft

import java.util.concurrent.atomic.AtomicReference

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.catalog.VersionedTable

/** Concurrency properties of the schema-DDL protocol: compound DDL (spec +
  * column-mapping, two sidecar files) is serialized by the DDL lock and
  * published through single write-once archives, so
  *  - concurrent DDL writers never lose each other's edit (no last-writer-wins
  *    on the read-modify-write of a shared sidecar), and
  *  - concurrent READERS never observe a half-applied compound DDL (e.g. a
  *    renamed mapping with the spec still carrying the old name, which would
  *    resurrect a phantom NULL column — both names visible at once).
  * Mirrors what ProtocolPropertySpec does for data commits.
  */
class DdlRaceSpec extends AnyFunSuite with SharedSpark {

  import spark.implicits._

  private def freshLoc(tag: String): String = {
    val loc = java.nio.file.Files
      .createTempDirectory(s"graft_ddlrace_$tag").toString + "/t"
    loc
  }

  /** Run `bodies` concurrently; rethrow the first failure. */
  private def inParallel(bodies: Seq[() => Unit]): Unit = {
    val err = new AtomicReference[Throwable]()
    val ts = bodies.map { b =>
      new Thread(() =>
        try b() catch { case t: Throwable => err.compareAndSet(null, t) })
    }
    ts.foreach(_.start())
    ts.foreach(_.join(120000))
    if (err.get() != null) throw err.get()
  }

  test("racing compound renames: serialized by the lock, never torn for readers") {
    val loc = freshLoc("rename")
    val K = 4
    VersionedTable.write((0L until 50L).toDF("id"), loc, "overwrite")
    (0 until K).foreach(i => VersionedTable.addColumn(spark, loc, s"c$i", "BIGINT"))
    // materialize every added column so each rename takes the COMPOUND path
    // (mapping + spec in one archive)
    VersionedTable.write(
      (50L until 100L).toDF("id")
        .select(col("id") +: (0 until K).map(i => (col("id") * (i + 1)).as(s"c$i")): _*),
      loc, "append")

    // readers race the renames: for every i, EXACTLY ONE of {c_i, r_i} is
    // visible — both (phantom resurrection) or neither (vanished column) is a
    // torn compound DDL
    @volatile var done = false
    val torn = new AtomicReference[String]()
    def readerLoop(): Unit =
      while (!done && torn.get() == null) {
        val cols = VersionedTable.read(spark, loc).columns.map(_.toLowerCase).toSet
        (0 until K).foreach { i =>
          val c = cols(s"c$i"); val r = cols(s"r$i")
          if (c == r) torn.compareAndSet(null,
            s"torn state for column $i: saw ${cols.mkString(",")}")
        }
      }
    val writers = (0 until K).map(i =>
      () => VersionedTable.renameColumn(spark, loc, s"c$i", s"r$i"))
    inParallel(writers ++ Seq(() => readerLoop(), () => readerLoop()))
    done = true
    assert(torn.get() == null, String.valueOf(torn.get()))

    // no rename was lost to a concurrent writer
    val finalCols = VersionedTable.read(spark, loc).columns.map(_.toLowerCase).toSet
    (0 until K).foreach { i =>
      assert(finalCols(s"r$i") && !finalCols(s"c$i"),
        s"rename $i lost: $finalCols")
    }
    // data followed every rename (values, not NULL twins)
    val sums = VersionedTable.read(spark, loc)
      .agg(sum(col("r0")), sum(col("r3"))).collect().head
    assert(sums.getLong(0) === (50L until 100L).sum)
    assert(sums.getLong(1) === (50L until 100L).map(_ * 4).sum)
  }

  test("concurrent ADD COLUMNs: read-modify-write under the lock loses neither") {
    val loc = freshLoc("add")
    VersionedTable.write((0L until 10L).toDF("id"), loc, "overwrite")
    inParallel(Seq(
      () => VersionedTable.addColumn(spark, loc, "xa", "BIGINT"),
      () => VersionedTable.addColumn(spark, loc, "xb", "STRING"),
      () => VersionedTable.addColumn(spark, loc, "xc", "DOUBLE")))
    val cols = VersionedTable.read(spark, loc).columns.map(_.toLowerCase).toSet
    assert(Set("xa", "xb", "xc").subsetOf(cols),
      s"a concurrent ADD COLUMN was lost: $cols")
  }

  test("DDL racing commits: as-of reads bind to a consistent archived state") {
    val loc = freshLoc("commits")
    VersionedTable.write((0L until 20L).toDF("id"), loc, "overwrite")
    VersionedTable.addColumn(spark, loc, "c0", "BIGINT")
    VersionedTable.write((20L until 40L).toDF("id").withColumn("c0", col("id")),
      loc, "append")
    // one thread appends commits (bumping the head the DDL tags itself with),
    // one renames the materialized column through a chain — the interleaving
    // can land a LOWER at_version under a HIGHER archive sequence, the exact
    // shape the scan-all-archives resolution must absorb
    inParallel(Seq(
      () => (0 until 6).foreach { i =>
        VersionedTable.write(
          (0L until 10L).map(x => x + 100L * i).toDF("id"), loc, "append")
      },
      () => {
        VersionedTable.renameColumn(spark, loc, "c0", "r0")
        VersionedTable.renameColumn(spark, loc, "r0", "s0")
      }))
    // head: the end of the chain, exactly one survivor name
    val head = VersionedTable.read(spark, loc).columns.map(_.toLowerCase).toSet
    assert(head("s0") && !head("r0") && !head("c0"), s"head: $head")
    // EVERY historical version reads without error and shows exactly one
    // chain name — whichever archive its version binds to, never a blend
    VersionedTable.commits(spark, loc).map(_.version).foreach { v =>
      val cols = VersionedTable.readAsOf(spark, loc, v).columns
        .map(_.toLowerCase).toSet
      val present = Seq("c0", "r0", "s0").count(cols)
      assert(present === 1, s"version $v shows $present chain names: $cols")
    }
    // and the data kept following the final name
    assert(VersionedTable.read(spark, loc).agg(sum(col("s0"))).collect()
      .head.getLong(0) === (20L until 40L).sum)
  }
}
