package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.catalog.VersionedTable
import graft.testutil.CountingFileSystem

/** Pins the FILESYSTEM-CALL budget of a snapshot resolution, the way
  * CatalogSpec pins job counts: every counted call is one round-trip on an
  * object store, so these budgets are the table's metadata cost model at
  * 100 TB — where a log listing is ~10 ms and an unbudgeted exists-probe per
  * sidecar per read would dominate small-commit latency. The table lives on a
  * `counted://` filesystem ([[CountingFileSystem]]) that counts per (op, path).
  *
  * The steady-state contract, enforced here:
  *  - commit files, checkpoints, and DDL archives are WRITE-ONCE and parse
  *    once per JVM — a warm head read opens NONE of them;
  *  - the vacuum floor rides the same `_commit_log` listing that finds the
  *    commits — never a separate probe;
  *  - plan assembly costs exactly one `_commit_log` listing and (for a table
  *    with DDL history) one `_ddl` listing.
  */
class MetadataCallsSpec extends AnyFunSuite with SharedSpark {

  private def freshLoc(): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_fscount")
    s"counted://$dir/t"
  }

  private def withCountedFs[T](body: => T): T = {
    spark.sparkContext.hadoopConfiguration
      .set("fs.counted.impl", classOf[CountingFileSystem].getName)
    // the scheme resolves through the FileSystem cache; no cleanup needed —
    // the impl mapping is inert for every other test's file:// paths
    body
  }

  test("warm head read: one log listing, one ddl listing, zero metadata opens") {
    withCountedFs {
      import spark.implicits._
      val loc = freshLoc()
      val df = (1 to 300).map(i => (i.toLong, s"v$i")).toDF("id", "v")
      VersionedTable.write(df, loc, "overwrite")
      (1 to 3).foreach(_ =>
        VersionedTable.write(df.limit(50), loc, "append"))
      // a DDL so the `_ddl` archive path is exercised too
      VersionedTable.renameColumn(spark, loc, "v", "val")

      // warm the write-once caches (first resolution parses commit bodies)
      VersionedTable.read(spark, loc).count()

      CountingFileSystem.reset()
      val plan = VersionedTable.read(spark, loc) // plan assembly only
      val logLists = CountingFileSystem.total("listStatus", "_commit_log")
      val ddlLists = CountingFileSystem.total("listStatus", "_ddl")
      val commitOpens = CountingFileSystem.total("open", "_commit_log")
      val archiveOpens = CountingFileSystem.total("open", "_ddl")
      val sidecarOpens = CountingFileSystem.total("open", "_table_spec.json") +
        CountingFileSystem.total("open", "_columns.json")
      assert(logLists == 1, s"head read must list _commit_log exactly once, did $logLists")
      assert(ddlLists == 1, s"head read must list _ddl exactly once, did $ddlLists")
      assert(commitOpens == 0,
        s"warm read must open ZERO commit/checkpoint files (cached parses), opened $commitOpens")
      assert(archiveOpens == 0,
        s"warm read must open ZERO ddl archives (cached parses), opened $archiveOpens")
      // with an archive present the current sidecar FILES are never read —
      // readers resolve the write-once archive (DdlRaceSpec's atomicity point)
      assert(sidecarOpens == 0,
        s"archived table read must not open raw sidecars, opened $sidecarOpens")
      // the budget is for PLAN ASSEMBLY; the plan still computes the right answer
      assert(plan.count() == 450)
    }
  }

  test("vacuum floor is resolved from the log listing, not a separate probe") {
    withCountedFs {
      import spark.implicits._
      val loc = freshLoc()
      VersionedTable.write((1 to 100).toDF("n"), loc, "overwrite")
      VersionedTable.read(spark, loc).count() // warm caches
      CountingFileSystem.reset()
      VersionedTable.readAsOf(spark, loc, 0)
      val floorStats = CountingFileSystem.total("getFileStatus", "_vacuum_floor") +
        CountingFileSystem.total("open", "_vacuum_floor")
      assert(floorStats == 0,
        s"never-vacuumed table must learn 'no floor' from the log listing alone, probed $floorStats")
    }
  }

  test("time travel pays the same budget as a head read") {
    withCountedFs {
      import spark.implicits._
      val loc = freshLoc()
      val df = (1 to 100).map(i => (i.toLong, s"v$i")).toDF("id", "v")
      VersionedTable.write(df, loc, "overwrite")
      VersionedTable.write(df, loc, "append")
      VersionedTable.read(spark, loc).count() // warm
      CountingFileSystem.reset()
      VersionedTable.readAsOf(spark, loc, 0)
      assert(CountingFileSystem.total("listStatus", "_commit_log") == 1)
      assert(CountingFileSystem.total("open", "_commit_log") == 0)
    }
  }
}
