package graft.testutil

import java.io.IOException
import java.net.URI
import java.util.concurrent.atomic.AtomicInteger

import org.apache.hadoop.fs.{FSDataOutputStream, Path, RawLocalFileSystem}
import org.apache.hadoop.fs.permission.FsPermission
import org.apache.hadoop.util.Progressable

/** A `flaky://` filesystem that delegates to local disk but fails `create()`
  * on demand — the fault injector behind LockHeartbeatSpec: a transient
  * object-store hiccup on a lock re-stamp must cost ONE missed beat, never
  * the whole heartbeat thread.
  *
  * Arm it with [[FlakyFileSystem.failCreates]]: the next N creates whose path
  * contains [[FlakyFileSystem.pathSubstring]] throw, then everything heals.
  */
class FlakyFileSystem extends RawLocalFileSystem {
  override def getScheme: String = "flaky"
  override def getUri: URI = URI.create("flaky:///")

  // both concrete overloads RawLocalFileSystem exposes — FileSystem.create(f,
  // overwrite) funnels to the permissionless one, so overriding only the
  // FsPermission variant would let re-stamps bypass the injection
  override def create(f: Path, permission: FsPermission, overwrite: Boolean,
      bufferSize: Int, replication: Short, blockSize: Long,
      progress: Progressable): FSDataOutputStream = {
    FlakyFileSystem.maybeFail(f)
    super.create(f, permission, overwrite, bufferSize, replication,
      blockSize, progress)
  }

  override def create(f: Path, overwrite: Boolean, bufferSize: Int,
      replication: Short, blockSize: Long,
      progress: Progressable): FSDataOutputStream = {
    FlakyFileSystem.maybeFail(f)
    super.create(f, overwrite, bufferSize, replication, blockSize, progress)
  }
}

object FlakyFileSystem {
  private val remaining = new AtomicInteger(0)
  private val injected = new AtomicInteger(0)
  @volatile var pathSubstring: String = "_lock"

  /** Fail the next `n` creates on paths containing [[pathSubstring]]. */
  def failCreates(n: Int): Unit = { injected.set(0); remaining.set(n) }

  /** How many creates actually failed since the last [[failCreates]]. */
  def failuresInjected: Int = injected.get()

  private[testutil] def maybeFail(f: Path): Unit =
    if (f.toUri.getPath.contains(pathSubstring) &&
        remaining.getAndUpdate(n => math.max(0, n - 1)) > 0) {
      injected.incrementAndGet()
      throw new IOException(s"flaky: injected create failure on $f")
    }
}
