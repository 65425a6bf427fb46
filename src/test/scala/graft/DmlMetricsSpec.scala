package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

/** Operation metrics from native SQL DML (the result set Delta's UPDATE/MERGE
  * return): num_affected_rows from UPDATE, and the
  * (affected, updated, deleted, inserted) quadruple from every MERGE shape.
  */
class DmlMetricsSpec extends AnyFunSuite with SharedSpark {

  private lazy val cat: String = {
    val dir = Files.createTempDirectory("graft_dml").toString
    spark.conf.set("spark.sql.catalog.gdml",
      classOf[graft.sources.table.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gdml.warehouse", dir)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gdml.t")
    "gdml"
  }

  private def freshTable(name: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $cat.t.$name")
    spark.sql(s"CREATE TABLE $cat.t.$name (k BIGINT, v BIGINT)")
    spark.sql(s"INSERT INTO $cat.t.$name SELECT id, id * 10 FROM range(10)")
  }

  test("UPDATE returns num_affected_rows") {
    freshTable("u")
    val r = spark.sql(s"UPDATE $cat.t.u SET v = v + 1 WHERE k < 4").head()
    assert(r.getLong(0) == 4L)
    val zero = spark.sql(s"UPDATE $cat.t.u SET v = v + 1 WHERE k > 100").head()
    assert(zero.getLong(0) == 0L)
  }

  test("fast-shape MERGE returns the metrics quadruple") {
    freshTable("m")
    spark.sql("SELECT id + 7 AS k, id AS v, id >= 5 AS del FROM range(8)")
      .createOrReplaceTempView("dml_src") // keys 7..14: 7..9 matched, 10..14 not
    val r = spark.sql(
      s"""MERGE INTO $cat.t.m t USING dml_src s ON t.k = s.k
         |WHEN MATCHED AND s.del THEN DELETE
         |WHEN MATCHED THEN UPDATE SET *
         |WHEN NOT MATCHED AND NOT s.del THEN INSERT *""".stripMargin).head()
    // matched: k=7,8 update (del false → id=0,1), k=9 has del true (id=2 ≥5?
    // no: del = id >= 5 → ids 5..7 = keys 12..14). Matched keys 7,8,9 all
    // del=false → updated=3; deleted=0; inserts: keys 10,11 (ids 3,4, not
    // del) → 2; keys 12..14 are del-flagged and unmatched → no-ops.
    assert((r.getLong(1), r.getLong(2), r.getLong(3)) == ((3L, 0L, 2L)),
      s"got $r")
    assert(r.getLong(0) == 5L)
  }

  test("delete-only and insert-only MERGE count from the commit log") {
    freshTable("d")
    spark.sql("SELECT id * 2 AS k FROM range(4)").createOrReplaceTempView("dml_del")
    val del = spark.sql(
      s"""MERGE INTO $cat.t.d t USING dml_del s ON t.k = s.k
         |WHEN MATCHED THEN DELETE""".stripMargin).head()
    assert((del.getLong(0), del.getLong(2)) == ((4L, 4L)), s"got $del")
    spark.sql("SELECT id + 5 AS k, id AS v FROM range(10)")
      .createOrReplaceTempView("dml_ins") // 5..14; 6,8 already present (0..9 minus deleted evens)
    val ins = spark.sql(
      s"""MERGE INTO $cat.t.d t USING dml_ins s ON t.k = s.k
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin).head()
    // current table: 1,3,5,7,9 (evens 0,2,4,6 deleted, 8 remains? k=8 > 6 —
    // dml_del holds 0,2,4,6 so 8 survives) → present: 1,3,5,7,8,9
    // source keys 5..14 → new: 6,10,11,12,13,14 = 6 inserts
    assert((ins.getLong(0), ins.getLong(3)) == ((6L, 6L)), s"got $ins")
  }

  test("fast-shape MERGE metrics add zero jobs over the unmetered merge") {
    // job parity: the quadruple must come from the merge's own pinned matched
    // set (one change-volume aggregation), never a separate scan of the
    // target — at 100 TB a metrics-only target probe would dominate a small
    // CDC merge. Pinned as: SQL MERGE jobs == bare mergeOnRead jobs + 1
    // (exactly the one metrics aggregation job).
    import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
    import org.apache.spark.sql.functions.{col, lit}
    def countJobs(body: => Unit): Int = {
      org.apache.spark.graft.TestBus.drain(spark.sparkContext)
      val n = new java.util.concurrent.atomic.AtomicInteger(0)
      val l = new SparkListener {
        override def onJobStart(j: SparkListenerJobStart): Unit =
          n.incrementAndGet()
      }
      spark.sparkContext.addSparkListener(l)
      try {
        body
        org.apache.spark.graft.TestBus.drain(spark.sparkContext)
        n.get()
      } finally spark.sparkContext.removeSparkListener(l)
    }
    freshTable("jp1")
    freshTable("jp2")
    spark.sql("SELECT id + 7 AS k, id AS v, id >= 5 AS del FROM range(8)")
      .createOrReplaceTempView("dml_jp_src")
    val changes = spark.table("dml_jp_src")
      .select(col("k"), col("v"), col("del"))
    val wh = spark.conf.get(s"spark.sql.catalog.$cat.warehouse")
    val jobsBare = countJobs {
      graft.catalog.VersionedTable.mergeOnRead(spark, s"$wh/t/jp1",
        changes, Seq("k"), deleteCol = Some("del"))
    }
    val jobsSql = countJobs {
      // the q_sql_merge fast shape: mirror upsert with delete flag
      spark.sql(
        s"""MERGE INTO $cat.t.jp2 t USING dml_jp_src s ON t.k = s.k
           |WHEN MATCHED AND s.del THEN DELETE
           |WHEN MATCHED THEN UPDATE SET *
           |WHEN NOT MATCHED AND NOT (s.del) THEN INSERT *""".stripMargin)
        .collect()
    }
    // measured composition of the SQL statement's extra jobs over the bare
    // merge (MergeJobsProbe): +1 metrics split (the ONE change-volume
    // aggregation inside the metered merge), +2 analysis-time target schema
    // resolutions, +3 cardinality guard incl. its AQE stages, +2 async-exec
    // wrappers. A metrics implementation that probed the TARGET again (the
    // pre-round-10 shape: changes ⟕ target-keys per statement) costs 2-3
    // more and must fail here.
    assert(jobsSql <= jobsBare + 8,
      s"SQL MERGE fixed overhead grew — a metrics/guard change is rescanning " +
        s"the target (bare=$jobsBare, sql=$jobsSql)")
  }

  test("duplicate-key target: inserted counts matched CHANGE keys, not target rows") {
    spark.sql(s"DROP TABLE IF EXISTS $cat.t.dup")
    spark.sql(s"CREATE TABLE $cat.t.dup (k BIGINT, v BIGINT)")
    spark.sql(s"INSERT INTO $cat.t.dup VALUES (1, 10), (1, 11), (2, 20)")
    spark.sql(
      "SELECT * FROM VALUES (CAST(1 AS BIGINT), CAST(100 AS BIGINT), false), " +
        "(CAST(99 AS BIGINT), CAST(990 AS BIGINT), false) AS t(k, v, del)")
      .createOrReplaceTempView("dml_dup_src")
    val r = spark.sql(
      s"""MERGE INTO $cat.t.dup t USING dml_dup_src s ON t.k = s.k
         |WHEN MATCHED AND s.del THEN DELETE
         |WHEN MATCHED THEN UPDATE SET *
         |WHEN NOT MATCHED AND NOT s.del THEN INSERT *""".stripMargin).head()
    // k=1 matches TWO target rows (updated=2) and lands ONE update image; k=99
    // inserts. Deriving inserts as addedRows - updated would absorb the insert
    // into the dup-key deficit and report 0 — it must report 1.
    assert((r.getLong(1), r.getLong(2), r.getLong(3)) == ((2L, 0L, 1L)),
      s"got $r")
    assert(r.getLong(0) == 3L)
    // key-collapse contract: k=1 now holds the single update image
    val rows = spark.table(s"$cat.t.dup").orderBy("k", "v").collect()
      .map(x => (x.getLong(0), x.getLong(1))).toSeq
    assert(rows == Seq((1L, 100L), (2L, 20L), (99L, 990L)), s"got $rows")
  }

  test("general-path MERGE (partial SET + NOT MATCHED BY SOURCE) counts branches") {
    freshTable("g")
    spark.sql("SELECT id AS k, id * 100 AS nv FROM range(3)")
      .createOrReplaceTempView("dml_gen") // keys 0,1,2 matched; 3..9 stale
    val r = spark.sql(
      s"""MERGE INTO $cat.t.g t USING dml_gen s ON t.k = s.k
         |WHEN MATCHED THEN UPDATE SET v = s.nv
         |WHEN NOT MATCHED BY SOURCE AND t.k >= 8 THEN DELETE""".stripMargin)
      .head()
    // updated: 3 (partial SET), deleted: k=8,9 → 2, inserted: 0
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      ((5L, 3L, 2L, 0L)), s"got $r")
    assert(spark.table(s"$cat.t.g").count() == 8L)
  }
}
