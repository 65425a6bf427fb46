package graft.catalog

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Catalog registration + object-store metadata scan.
  *
  * Reference: the Glue crawler + hand-rolled S3 ListObjectsV2 walk at
  * `curated/crawler.py:11-48,50-88` (per-file size/mtime, totals, file count, JSON report
  * to `_metadata/`), and Delta-style table registration `CREATE TABLE ... USING DELTA
  * LOCATION ...` at `mage-programs/delta_metadata.py:99-107` (SURVEY.md §2.1 S8, §2.2 K6).
  *
  * Spark-first notes: registration is plain session-catalog DDL (`USING PARQUET`), so
  * downstream queries get catalog stats and partition pruning; the file walk uses the
  * Hadoop FileSystem API (works for file://, hdfs://, s3a:// alike). The walk is
  * driver-side by design — it touches metadata only, never data.
  */
final case class TableStats(
    table_name: String, location: String, n_files: Long,
    total_bytes: Long, max_modified_ms: Long)

object MetadataScanner {

  /** K6: register a parquet location as an external table in the session catalog. */
  def registerParquetTable(spark: SparkSession, db: String, table: String,
      location: String): Unit = {
    spark.sql(s"CREATE SCHEMA IF NOT EXISTS $db")
    spark.sql(s"DROP TABLE IF EXISTS $db.$table")
    spark.sql(s"CREATE TABLE $db.$table USING PARQUET LOCATION '$location'")
  }

  /** S8: walk a directory tree, collecting per-table file stats. */
  def scan(spark: SparkSession, tables: Map[String, String]): Seq[TableStats] =
    tables.toSeq.sortBy(_._1).map { case (name, location) =>
      val conf = new Configuration()
      val p = new Path(location)
      val fs = p.getFileSystem(conf)
      val it = fs.listFiles(p, true)
      var n = 0L; var bytes = 0L; var maxM = 0L
      while (it.hasNext) {
        val st = it.next()
        if (st.isFile && !st.getPath.getName.startsWith("_")) {
          n += 1; bytes += st.getLen; maxM = math.max(maxM, st.getModificationTime)
        }
      }
      TableStats(name, location, n, bytes, maxM)
    }

  def scanToDf(spark: SparkSession, tables: Map[String, String]): DataFrame = {
    import spark.implicits._
    scan(spark, tables).toDF()
  }

  /** K7 lightweight log: append one JSON line per commit to an `_ingest_log` under the
    * table location — operation history only. For the full Delta shape (history AND
    * as-of-version reads) use [[VersionedTable]]; [[readTableAsOf]] is the entry point.
    */
  def appendIngestLog(spark: SparkSession, location: String, operation: String,
      rowCount: Long): Unit = {
    import spark.implicits._
    val entry = Seq((java.time.Instant.now().toString, operation, rowCount))
      .toDF("timestamp", "operation", "row_count")
    entry.coalesce(1).write.mode("append").json(s"$location/_ingest_log")
  }

  def readIngestLog(spark: SparkSession, location: String): DataFrame =
    spark.read.json(s"$location/_ingest_log")

  /** K7 time travel: the table at `location` exactly as commit `version` left it
    * (tables written via [[VersionedTable.write]]). Mirrors Delta's
    * `option("versionAsOf", N)` read (reference `delta_metadata.py:114-116`).
    */
  def readTableAsOf(spark: SparkSession, location: String, version: Long): DataFrame =
    VersionedTable.readAsOf(spark, location, version)
}
