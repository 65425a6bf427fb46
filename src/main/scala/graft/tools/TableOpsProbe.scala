package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.catalog.VersionedTable

/** Diagnostic main (not part of the library surface): reproduces the bench's
  * table-ops sequence and prints, per op, wall time + Spark job count + local
  * filesystem op counts (reads/writes via Hadoop's per-scheme Statistics).
  * Used to locate the round-9 table-op metadata regression; kept because a
  * per-op job/FS budget is the first thing to re-check on any future
  * commit-path change.
  */
object TableOpsProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    })

    def fsOps(): (Long, Long) = {
      import scala.jdk.CollectionConverters._
      org.apache.hadoop.fs.FileSystem.getAllStatistics.asScala
        .filter(_.getScheme == "file")
        .map(s => (s.getReadOps.toLong, s.getWriteOps.toLong))
        .foldLeft((0L, 0L)) { case ((r, w), (r2, w2)) => (r + r2, w + w2) }
    }

    def probe(name: String)(body: => Unit): Unit = {
      Thread.sleep(200) // let the listener bus drain between ops
      val j0 = jobs.get(); val (r0, w0) = fsOps()
      val t0 = System.nanoTime()
      body
      val secs = (System.nanoTime() - t0) / 1e9
      Thread.sleep(200)
      val (r1, w1) = fsOps()
      println(f"PROBE $name%-22s ${secs}%8.3f s  jobs=${jobs.get() - j0}%3d  fsRead=${r1 - r0}%6d  fsWrite=${w1 - w0}%5d")
    }

    val root = java.nio.file.Files.createTempDirectory("graft_probe_tops")
    val loc = s"$root/t"
    val locP = s"$root/tp"
    try {
      val orders = Tables.orders(spark, sfDir)
      probe("setup_write") { VersionedTable.write(orders, loc, "overwrite") }
      val changes = orders.filter(col("o_orderkey") % 100 === 0)
        .withColumn("o_orderstatus", lit("B"))
        .withColumn("__del", col("o_orderkey") % 300 === 0)
        .unionByName(orders.filter(col("o_orderkey") % 100 === 1)
          .withColumn("o_orderkey", col("o_orderkey") + 100000000L)
          .withColumn("__del", lit(false)))
      val preMerge = VersionedTable.commits(spark, loc).last.version
      probe("merge_cdf") { VersionedTable.merge(spark, loc, changes,
        Seq("o_orderkey"), deleteCol = Some("__del"), changeFeed = true) }
      val mv = VersionedTable.commits(spark, loc).last.version
      probe("read_changes") {
        VersionedTable.readChanges(spark, loc, mv, mv)
          .write.format("noop").mode("overwrite").save()
      }
      probe("restore") { VersionedTable.restore(spark, loc, preMerge) }
      probe("merge_on_read") { VersionedTable.mergeOnRead(spark, loc, changes,
        Seq("o_orderkey"), deleteCol = Some("__del")) }
      probe("delete_dv") {
        VersionedTable.deleteWhere(spark, loc, "o_orderkey % 97 = 0") }
      probe("read_with_dv") {
        VersionedTable.read(spark, loc)
          .write.format("noop").mode("overwrite").save()
      }
      probe("setup_write_part") { VersionedTable.write(orders, locP, "overwrite",
        partitionBy = Seq("o_orderpriority")) }
      val scoped = orders.filter(col("o_orderpriority") === "1-URGENT" &&
          col("o_orderkey") % 10 === 0)
        .withColumn("o_orderstatus", lit("S"))
      probe("merge_scoped") { VersionedTable.merge(spark, locP, scoped,
        Seq("o_orderkey", "o_orderpriority")) }
      val replacement = orders
        .filter(col("o_orderpriority") === "5-LOW" && col("o_orderkey") % 2 === 0)
        .withColumn("o_orderstatus", lit("R"))
      probe("replace_partition") {
        VersionedTable.overwritePartitions(replacement, locP) }
      // second rep of the reads to split JIT/first-plan cost from steady state
      probe("read_changes_2") {
        VersionedTable.readChanges(spark, loc, mv, mv)
          .write.format("noop").mode("overwrite").save()
      }
      probe("read_with_dv_2") {
        VersionedTable.read(spark, loc)
          .write.format("noop").mode("overwrite").save()
      }
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(root.toFile)
    }
    spark.stop()
  }
}
