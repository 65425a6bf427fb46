package graft.catalog

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark

/** The write-once log-parse cache's one blind spot — a drop-and-recreate at
  * the same location colliding on the (path, mtime, length) key — and the
  * invalidation that closes it on every same-JVM create/drop path.
  */
class LogCacheSpec extends AnyFunSuite with SharedSpark {

  test("(path, mtime, length) collision serves stale until invalidated") {
    import spark.implicits._
    val loc = Files.createTempDirectory("graft_logcache").toString + "/t"
    VersionedTable.write(Seq(1L, 2L).toDF("id"), loc, "overwrite")
    val before = VersionedTable.commits(spark, loc).head // cache is now warm
    val f = Paths.get(loc, "_commit_log", "0.json")
    val mtime = f.toFile.lastModified()

    // forge the collision a second-granularity filesystem can produce: NEW
    // content, IDENTICAL length (flip one data_dir character), mtime forced
    // back to the cached value
    val body = new String(Files.readAllBytes(f), "UTF-8")
    val dirRe = """"data_dir":"d-([0-9a-f])""".r
    val flipped = dirRe.findFirstMatchIn(body).map { m =>
      val c = if (m.group(1) == "0") "f" else "0"
      body.patch(m.start(1), c, 1)
    }.getOrElse(fail("no data_dir to flip"))
    assert(flipped.length == body.length && flipped != body)
    Files.write(f, flipped.getBytes("UTF-8"))
    assert(f.toFile.setLastModified(mtime), "need a forgeable mtime")

    // identical key → the cache (correctly, per its write-once contract)
    // serves the old parse: this IS the collision window
    assert(VersionedTable.commits(spark, loc).head.data_dir == before.data_dir)

    // the create/drop hooks call this — after it, the fresh body is read
    VersionedTable.invalidateLogCaches(loc)
    val after = VersionedTable.commits(spark, loc).head
    assert(after.data_dir != before.data_dir,
      "invalidation must force a re-read of the forged commit body")
  }

  test("drop and recreate through the catalog never serves the old table") {
    val dir = Files.createTempDirectory("graft_logcache_cat").toString
    spark.conf.set("spark.sql.catalog.glc",
      classOf[graft.sources.table.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.glc.warehouse", dir)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS glc.ns")
    spark.sql("CREATE TABLE glc.ns.t (id BIGINT)")
    spark.sql("INSERT INTO glc.ns.t VALUES (1), (2)")
    assert(spark.table("glc.ns.t").count() == 2)
    spark.sql("DROP TABLE glc.ns.t")
    spark.sql("CREATE TABLE glc.ns.t (id BIGINT)")
    spark.sql("INSERT INTO glc.ns.t VALUES (7)")
    val got = spark.table("glc.ns.t").collect().map(_.getLong(0)).toSeq
    assert(got == Seq(7L), s"recreated table served stale state: $got")
  }
}
