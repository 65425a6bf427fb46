package graft

import scala.util.Random

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.catalog.VersionedTable

/** Differential property: reads whose schema comes FROM THE LOG must be
  * indistinguishable from mergeSchema-inference reads over the same files —
  * same columns, same types, same rows — across randomized append histories
  * with additive column evolution. The inference side is produced by
  * stripping the recorded schemas out of a byte-identical copy of the log
  * (the legacy-table shape), so the two paths read the very same data dirs.
  */
class SchemaEquivalenceSpec extends AnyFunSuite with SharedSpark {

  test("log-schema reads == inference reads over random append histories") {
    import spark.implicits._
    val rnd = new Random(20260815L)
    val pool = Seq("x1", "x2", "x3", "x4", "x5")
    (1 to 4).foreach { round =>
      val root = java.nio.file.Files.createTempDirectory(s"graft_seq$round")
      val loc = s"$root/t"
      // base: id + two of the pool columns; each append may add one more
      var cols = Seq("a", "b")
      def batch(n: Int, from: Int) = {
        val base = (from until from + n)
          .map(i => (i.toLong, i * 1.5, s"s$i")).toDF("id", "a", "b")
        cols.drop(2).zipWithIndex.foldLeft(base) { case (df, (c, j)) =>
          df.withColumn(c, col("id") * (j + 2))
        }
      }
      VersionedTable.write(batch(20, 0), loc, "overwrite")
      (1 to 4).foreach { k =>
        if (rnd.nextBoolean() && cols.length < pool.length + 2)
          cols = cols :+ pool(cols.length - 2)
        VersionedTable.write(batch(10, k * 100), loc, "append")
      }

      val viaLog = VersionedTable.read(spark, loc)
      // legacy twin: same data dirs, schemas stripped from every commit body
      val legacy = s"$root/legacy"
      org.apache.commons.io.FileUtils.copyDirectory(
        new java.io.File(loc), new java.io.File(legacy))
      val logDir = new java.io.File(s"$legacy/_commit_log")
      logDir.listFiles().filter(_.getName.endsWith(".json")).foreach { f =>
        val body = new String(java.nio.file.Files.readAllBytes(f.toPath), "UTF-8")
        java.nio.file.Files.write(f.toPath,
          body.replaceAll(""""schema":"((?:[^"\\]|\\.)*)",""", "").getBytes("UTF-8"))
      }
      val viaInference = VersionedTable.read(spark, legacy)

      assert(viaLog.columns.toSeq.map(_.toLowerCase).sorted ==
        viaInference.columns.toSeq.map(_.toLowerCase).sorted,
        s"round $round: column sets diverge")
      val typesLog = viaLog.schema.fields
        .map(f => f.name.toLowerCase -> f.dataType).toMap
      viaInference.schema.fields.foreach { f =>
        assert(typesLog(f.name.toLowerCase) == f.dataType,
          s"round $round: type of ${f.name} diverges")
      }
      val sortCols = viaLog.columns.sorted.toSeq
      val l = viaLog.select(sortCols.map(col): _*).orderBy(col("id")).collect()
      val i = viaInference.select(sortCols.map(col): _*).orderBy(col("id")).collect()
      assert(l.sameElements(i), s"round $round: row contents diverge")
    }
  }
}
