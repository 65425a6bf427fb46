package graft.catalog

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark
import graft.testutil.FlakyFileSystem

/** The lock-heartbeat protocol ([[VersionedTable.withFileLock]]) under
  * injected short beat/stale intervals — this thread guards every DDL and
  * ingest commit, so its timing behavior is pinned rather than trusted:
  * a LIVE holder is never stale-broken no matter how long its section runs,
  * a CRASHED holder self-breaks from its LAST heartbeat, releasing never
  * resurrects the lock, and one transient re-stamp failure costs one beat,
  * not the whole heartbeat.
  */
class LockHeartbeatSpec extends AnyFunSuite with SharedSpark {

  private def tmp(): String =
    Files.createTempDirectory("graft_lock_hb").toString

  /** The lock file's stamp. The heartbeat REWRITES the file (create-truncate
    * then write), so a read can land in that window and see it empty — the
    * production waiter guards exactly this torn read (VersionedTable
    * withFileLock treats it as age 0 and re-loops); the test helper retries
    * briefly instead of failing the suite on the benign race.
    */
  private def stampOf(loc: String, name: String): Long = {
    val deadline = System.currentTimeMillis() + 2000
    var s = ""
    while ({
      s = new String(Files.readAllBytes(Paths.get(s"$loc/$name")),
        StandardCharsets.UTF_8).trim
      s.isEmpty && System.currentTimeMillis() < deadline
    }) Thread.sleep(5)
    s.toLong
  }

  test("a live holder heartbeating past the stale threshold is never broken") {
    val loc = tmp()
    val holderIn = new java.util.concurrent.CountDownLatch(1)
    val holderDone = new java.util.concurrent.CountDownLatch(1)
    val holder = new Thread(() => {
      VersionedTable.withFileLock(spark, loc, "_hb_lock",
        heartbeatMs = 50, staleMs = 1000, waitMs = 5000) {
        holderIn.countDown() // the waiter starts only once we HOLD the lock
        Thread.sleep(3000) // sleeps 3x past the stale threshold — but beats
      }
      holderDone.countDown()
    })
    holder.start()
    assert(holderIn.await(10, java.util.concurrent.TimeUnit.SECONDS),
      "holder never acquired")
    // the waiter's patience expires BEFORE the holder exits; a live heartbeat
    // must keep the lock un-breakable the whole time (margins sized for a
    // loaded suite JVM: breaking would need 20 consecutive missed beats)
    val e = intercept[IllegalStateException] {
      VersionedTable.withFileLock(spark, loc, "_hb_lock",
        heartbeatMs = 50, staleMs = 1000, waitMs = 1500) { fail("must not acquire") }
    }
    assert(e.getMessage.contains("timed out"), e.getMessage)
    assert(holderDone.await(10, java.util.concurrent.TimeUnit.SECONDS))
    holder.join(10000)
  }

  test("a crashed holder self-breaks after staleMs from the LAST heartbeat") {
    val loc = tmp()
    // simulate a holder that crashed right after a heartbeat: the lock file
    // exists with a stamp and nobody refreshes it
    val old = System.currentTimeMillis() - 600
    Files.write(Paths.get(s"$loc/_hb_lock"),
      old.toString.getBytes(StandardCharsets.UTF_8))
    // stamp is 600ms old, stale at 300ms → the waiter breaks it and acquires
    var acquired = false
    VersionedTable.withFileLock(spark, loc, "_hb_lock",
      heartbeatMs = 50, staleMs = 300, waitMs = 2000) { acquired = true }
    assert(acquired, "stale lock (aged from its last stamp) must self-break")

    // a FRESH stamp ages from now: a short-patience waiter times out instead
    Files.write(Paths.get(s"$loc/_hb_lock"),
      System.currentTimeMillis().toString.getBytes(StandardCharsets.UTF_8))
    intercept[IllegalStateException] {
      VersionedTable.withFileLock(spark, loc, "_hb_lock",
        heartbeatMs = 50, staleMs = 5000, waitMs = 300) { fail("must not acquire") }
    }
  }

  test("release joins the heartbeat before deleting — the lock never resurrects") {
    val loc = tmp()
    VersionedTable.withFileLock(spark, loc, "_hb_lock",
      heartbeatMs = 25, staleMs = 5000, waitMs = 1000) {
      Thread.sleep(120) // several beats land while held
    }
    assert(!Files.exists(Paths.get(s"$loc/_hb_lock")),
      "lock file must be deleted on release")
    // an in-flight re-stamp racing the delete would recreate the file within
    // one beat; give it several beats to prove the join prevented that
    Thread.sleep(150)
    assert(!Files.exists(Paths.get(s"$loc/_hb_lock")),
      "a post-release re-stamp resurrected the lock")
  }

  test("one failed re-stamp skips a beat — heartbeating continues after it") {
    spark.sparkContext.hadoopConfiguration.set("fs.flaky.impl",
      classOf[FlakyFileSystem].getName)
    val root = tmp()
    val loc = s"flaky://$root"
    FlakyFileSystem.pathSubstring = "_hb_lock"
    FlakyFileSystem.failCreates(1) // the FIRST re-stamp throws
    try {
      VersionedTable.withFileLock(spark, loc, "_hb_lock",
        heartbeatMs = 50, staleMs = 10000, waitMs = 1000) {
        val acquiredStamp = stampOf(root, "_hb_lock")
        // poll: the FIRST beat must fail (injected), then a later beat must
        // re-stamp — bounded wait sized for a loaded suite JVM
        val deadline = System.currentTimeMillis() + 5000
        while ((FlakyFileSystem.failuresInjected < 1 ||
            stampOf(root, "_hb_lock") == acquiredStamp) &&
            System.currentTimeMillis() < deadline)
          Thread.sleep(25)
        assert(FlakyFileSystem.failuresInjected == 1,
          "the injected re-stamp failure never fired")
        assert(stampOf(root, "_hb_lock") > acquiredStamp,
          "heartbeat died after one transient failure — the stamp never advanced")
      }
    } finally FlakyFileSystem.failCreates(0)
  }
}
