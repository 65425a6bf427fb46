package graft.catalog

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, Observation, SparkSession}
import org.apache.spark.sql.functions._

/** A minimal versioned parquet table: commit log + time travel — the full K7 shape the
  * reference gets from Delta (`DeltaTable.forPath(...).history()` and version reads,
  * `mage-programs/delta_metadata.py:114-116`), rebuilt on plain parquet + a JSON commit
  * log, since delta-spark is unavailable offline.
  *
  * Layout under `location/`:
  *  - `_data/v=<N>/` — the parquet files commit N added (never rewritten afterwards)
  *  - `_commit_log/<N>.json` — one file per commit: version, operation, timestamp, rows
  *
  * Semantics:
  *  - `overwrite` starts a new table state; `append` adds to the previous state.
  *  - The state AS OF version V = the `_data` dirs of every commit in
  *    (last overwrite ≤ V) .. V — resolved from the log, metadata-only.
  *  - Commit N+1 claims its log file with create-exclusive, so two racing writers
  *    cannot both publish the same version on filesystems with atomic create
  *    (HDFS/local; object stores without atomic create need an external lock, as
  *    Delta itself does on S3).
  *  - A data dir with no matching log entry is an uncommitted write (crash between
  *    data and log) and is invisible to every reader — readers resolve the LOG, not
  *    the directory listing.
  *
  * Scale notes: the log is one tiny JSON file per commit, listed driver-side (pure
  * metadata); data files stream through the ordinary parquet reader with full
  * pushdown/pruning, and an as-of read of K commits is a K-path parquet scan, not a
  * union of K DataFrames (one FileSourceScan, shared schema).
  */
object VersionedTable {

  final case class Commit(
      version: Long, operation: String, timestamp: String, row_count: Long)

  /** Write `df` as the next commit; returns the committed version.
    * `operation` is "overwrite" or "append".
    */
  def write(df: DataFrame, location: String, operation: String = "overwrite"): Long = {
    require(operation == "overwrite" || operation == "append",
      s"unknown operation: $operation")
    val spark = df.sparkSession
    val fs = fileSystem(spark, location)
    // retry loop: losing an exclusive-create race just means re-claiming version+1
    var committed = -1L
    while (committed < 0) {
      val v = commits(spark, location).lastOption.map(_.version + 1).getOrElse(0L)
      val obs = Observation(s"vt_rows_$v")
      df.observe(obs, count(lit(1)).as("rows"))
        .write.mode("overwrite").parquet(s"$location/_data/v=$v")
      val rows = obs.get("rows").asInstanceOf[Long]
      if (claimCommit(fs, location, v, operation, rows)) committed = v
      // on a lost race the orphan _data/v=<v> dir stays invisible (no log entry) and
      // the loop retries at the next version
    }
    committed
  }

  /** The table as of its newest commit. */
  def read(spark: SparkSession, location: String): DataFrame = {
    val cs = commits(spark, location)
    require(cs.nonEmpty, s"no commits at $location")
    readAsOf(spark, location, cs.last.version)
  }

  /** Time travel: the table exactly as commit `version` left it. */
  def readAsOf(spark: SparkSession, location: String, version: Long): DataFrame = {
    val cs = commits(spark, location)
    require(cs.exists(_.version == version),
      s"version $version does not exist at $location (have ${cs.map(_.version)})")
    val visible = cs.filter(_.version <= version)
    val base = visible.lastIndexWhere(_.operation == "overwrite")
    val live = if (base < 0) visible else visible.drop(base)
    // one multi-path parquet scan — not a union of per-version DataFrames
    spark.read.parquet(live.map(c => s"$location/_data/v=${c.version}"): _*)
  }

  /** Delta-style `history()`: one row per commit, newest first. */
  def history(spark: SparkSession, location: String): DataFrame = {
    import spark.implicits._
    commits(spark, location).toDF().orderBy(col("version").desc)
  }

  /** The committed log, version-ascending (driver-side metadata walk). */
  def commits(spark: SparkSession, location: String): Seq[Commit] = {
    val fs = fileSystem(spark, location)
    val logDir = new Path(s"$location/_commit_log")
    if (!fs.exists(logDir)) Seq.empty
    else fs.listStatus(logDir).toSeq
      .filter(s => s.isFile && s.getPath.getName.endsWith(".json"))
      .map { s =>
        val in = fs.open(s.getPath)
        val body =
          try new String(in.readAllBytes(), StandardCharsets.UTF_8)
          finally in.close()
        parseCommit(body)
      }
      .sortBy(_.version)
  }

  /** Exclusive-create the commit file; false if another writer claimed the version. */
  private def claimCommit(fs: FileSystem, location: String, version: Long,
      operation: String, rows: Long): Boolean = {
    val path = new Path(s"$location/_commit_log/$version.json")
    fs.mkdirs(path.getParent)
    try {
      // create(path, overwrite = false) is atomic on HDFS/local — the loser throws
      val out = fs.create(path, false)
      try out.write(
        s"""{"version":$version,"operation":"$operation","timestamp":"${java.time.Instant.now()}","row_count":$rows}"""
          .getBytes(StandardCharsets.UTF_8))
      finally out.close()
      true
    } catch { case _: java.io.IOException => false }
  }

  // the log schema is controlled by claimCommit above; a tiny field extractor keeps
  // the hot path free of a per-file DataFrame read
  private def parseCommit(body: String): Commit = {
    def str(k: String) =
      s""""$k":"([^"]*)"""".r.findFirstMatchIn(body).map(_.group(1)).getOrElse("")
    def num(k: String) =
      s""""$k":(-?\\d+)""".r.findFirstMatchIn(body).map(_.group(1).toLong).getOrElse(-1L)
    Commit(num("version"), str("operation"), str("timestamp"), num("row_count"))
  }

  private def fileSystem(spark: SparkSession, location: String): FileSystem =
    new Path(location).getFileSystem(spark.sessionState.newHadoopConf())
}
