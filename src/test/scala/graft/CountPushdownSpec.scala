package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.catalog.VersionedTable

/** COUNT-FROM-METADATA through the DSv2 catalog: an unfiltered
  * `SELECT count(*) FROM t` must be served from the commit log
  * ([[VersionedTable.fastCount]]) with NO aggregate exec in the physical plan
  * (complete aggregate pushdown), stay exact under deletion vectors, scoped
  * replaces, and time travel, and fall back to a real scan the moment a
  * WHERE clause or a column-bearing aggregate appears.
  */
class CountPushdownSpec extends AnyFunSuite with SharedSpark {

  private lazy val wh = java.nio.file.Files.createTempDirectory("graft_cnt").toString

  private def setup(): Unit = {
    spark.conf.set("spark.sql.catalog.gcnt",
      classOf[graft.sources.table.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gcnt.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gcnt.n")
  }

  private def planOf(sql: String): String = {
    val df = spark.sql(sql)
    df.queryExecution.executedPlan.toString
  }

  test("count(*) is served from the log: no aggregate exec, exact under DVs") {
    setup()
    spark.sql("DROP TABLE IF EXISTS gcnt.n.t")
    spark.sql("CREATE TABLE gcnt.n.t (id BIGINT, p STRING) PARTITIONED BY (p)")
    spark.sql("INSERT INTO gcnt.n.t SELECT id, CASE WHEN id % 2 = 0 THEN 'x' " +
      "ELSE 'y' END FROM range(1000)")
    spark.sql("INSERT INTO gcnt.n.t SELECT id + 1000, 'x' FROM range(500)")
    assert(spark.sql("SELECT count(*) FROM gcnt.n.t").collect().head.getLong(0)
      === 1500L)
    val plan = planOf("SELECT count(*) FROM gcnt.n.t")
    assert(!plan.contains("HashAggregate") && !plan.contains("SortAggregate"),
      s"count(*) was not completely pushed down:\n$plan")

    // deletion-vector commit: the pushed count must track the subtraction
    spark.sql("DELETE FROM gcnt.n.t WHERE id % 10 = 0")
    assert(spark.sql("SELECT count(*) FROM gcnt.n.t").collect().head.getLong(0)
      === 1350L)
    assert(!planOf("SELECT count(*) FROM gcnt.n.t").contains("HashAggregate"))

    // the pushed value matches the log's own answer
    assert(VersionedTable.fastCount(spark, s"$wh/n/t") === 1350L)
  }

  test("count(*) time travel and fallbacks") {
    setup()
    spark.sql("DROP TABLE IF EXISTS gcnt.n.u")
    spark.sql("CREATE TABLE gcnt.n.u (id BIGINT)")
    spark.sql("INSERT INTO gcnt.n.u SELECT id FROM range(100)")
    spark.sql("INSERT INTO gcnt.n.u SELECT id + 100 FROM range(50)")
    // VERSION AS OF: count at the pre-second-insert version
    assert(spark.sql("SELECT count(*) FROM gcnt.n.u VERSION AS OF 1")
      .collect().head.getLong(0) === 100L)
    assert(!planOf("SELECT count(*) FROM gcnt.n.u VERSION AS OF 1")
      .contains("HashAggregate"))
    // a WHERE clause blocks the push — real aggregate, right answer
    val filtered = spark.sql("SELECT count(*) FROM gcnt.n.u WHERE id < 30")
    assert(filtered.collect().head.getLong(0) === 30L)
    assert(filtered.queryExecution.executedPlan.toString
      .contains("Aggregate"))
    // count(col) rides the per-commit null stats: zero recorded nulls in
    // every live commit → pushed, same as count(*)
    val byCol = spark.sql("SELECT count(id) FROM gcnt.n.u")
    assert(byCol.collect().head.getLong(0) === 150L)
    val byColPlan = byCol.queryExecution.executedPlan.toString
    assert(!byColPlan.contains("HashAggregate") &&
      !byColPlan.contains("SortAggregate"),
      "null-free count(col) should push down completely")
    // grouped counts are never pushed
    val grouped = spark.sql(
      "SELECT id % 2 AS g, count(*) AS c FROM gcnt.n.u GROUP BY 1 ORDER BY 1")
    assert(grouped.collect().map(_.getLong(1)).toSeq === Seq(75L, 75L))
  }

  test("count(col) from null stats: pushes when provable, falls back when not") {
    setup()
    spark.sql("DROP TABLE IF EXISTS gcnt.n.v")
    spark.sql("CREATE TABLE gcnt.n.v (id BIGINT, s STRING)")
    spark.sql("INSERT INTO gcnt.n.v VALUES (1, 'a'), (2, NULL), (3, 'c')")
    spark.sql("INSERT INTO gcnt.n.v VALUES (4, NULL), (5, NULL)")
    // append-only + recorded null counts: Σ(rows − nulls) = 2, no aggregate
    val byS = spark.sql("SELECT count(s) FROM gcnt.n.v")
    assert(byS.collect().head.getLong(0) === 2L)
    val bySPlan = byS.queryExecution.executedPlan.toString
    assert(!bySPlan.contains("HashAggregate") && !bySPlan.contains("SortAggregate"),
      "count(col) with recorded null counts should push down")
    assert(VersionedTable.fastCountCol(spark, s"$wh/n/v", "s") === Some(2L))
    // count(*) and count(col) in ONE projection both come from the log
    val both = spark.sql("SELECT count(*), count(s), count(id) FROM gcnt.n.v")
    assert(both.collect().head.toSeq === Seq(5L, 2L, 5L))
    assert(!both.queryExecution.executedPlan.toString.contains("HashAggregate"))
    // count(DISTINCT col) is never pushed
    val dist = spark.sql("SELECT count(DISTINCT s) FROM gcnt.n.v")
    assert(dist.collect().head.getLong(0) === 2L)
    assert(dist.queryExecution.executedPlan.toString.contains("HashAggregate"))

    // a DV delete makes retired rows' nullness unattributable for a column
    // WITH nulls → refuse the push, real scan, right answer...
    spark.sql("DELETE FROM gcnt.n.v WHERE id = 2")
    assert(VersionedTable.fastCountCol(spark, s"$wh/n/v", "s") === None)
    val afterDel = spark.sql("SELECT count(s) FROM gcnt.n.v")
    assert(afterDel.collect().head.getLong(0) === 2L)
    assert(afterDel.queryExecution.executedPlan.toString.contains("HashAggregate"),
      "count(col) must fall back once DVs retire rows of a nulled column")
    // ...but a null-FREE column stays provable under the same DV
    // (count(col) ≡ count(*), which is DV-exact)
    val byId = spark.sql("SELECT count(id) FROM gcnt.n.v")
    assert(byId.collect().head.getLong(0) === 4L)
    assert(!byId.queryExecution.executedPlan.toString.contains("HashAggregate"))
    // a column added by DDL after existing commits has no counts for the
    // older history → refuse, scan, exact
    spark.sql("ALTER TABLE gcnt.n.v ADD COLUMN extra STRING")
    spark.sql("INSERT INTO gcnt.n.v VALUES (9, 'z', 'e')")
    assert(VersionedTable.fastCountCol(spark, s"$wh/n/v", "extra") === None)
    assert(spark.sql("SELECT count(extra) FROM gcnt.n.v")
      .collect().head.getLong(0) === 1L)
  }

  test("min/max from commit stats: exact pushes, provability refusals") {
    setup()
    spark.sql("DROP TABLE IF EXISTS gcnt.n.w")
    spark.sql("CREATE TABLE gcnt.n.w (id BIGINT, s STRING, dead STRING)")
    spark.sql("INSERT INTO gcnt.n.w VALUES (5, 'bb', NULL), (17, 'aa', NULL)")
    spark.sql("INSERT INTO gcnt.n.w VALUES (-3, 'zz', NULL), (40, 'mm', NULL)")
    // numeric + string + count in ONE projection — all from the log
    val all = spark.sql(
      "SELECT min(id), max(id), min(s), max(s), count(*) FROM gcnt.n.w")
    assert(all.collect().head.toSeq === Seq(-3L, 40L, "aa", "zz", 4L))
    val plan = all.queryExecution.executedPlan.toString
    assert(!plan.contains("HashAggregate") && !plan.contains("SortAggregate"),
      s"min/max/count should push completely:\n$plan")
    // provably all-null column: the pushed answer is NULL
    assert(VersionedTable.fastMinMax(spark, s"$wh/n/w", "dead",
      org.apache.spark.sql.types.StringType, wantMax = true) === Some(None))
    val deadMax = spark.sql("SELECT max(dead) FROM gcnt.n.w")
    assert(deadMax.collect().head.isNullAt(0))
    assert(!deadMax.queryExecution.executedPlan.toString.contains("HashAggregate"))
    // a string batch with non-ASCII-safe values records no sstats → min(s)
    // must refuse (absent stats ≠ all-null) and the real scan answers
    spark.sql("INSERT INTO gcnt.n.w VALUES (50, '\"quoted\"', NULL)")
    assert(VersionedTable.fastMinMax(spark, s"$wh/n/w", "s",
      org.apache.spark.sql.types.StringType, wantMax = false) === None)
    val sMin = spark.sql("SELECT min(s) FROM gcnt.n.w")
    assert(sMin.collect().head.getString(0) === "\"quoted\"")
    // string min/max is not hash-aggregable — the fallback plans a
    // SortAggregate; either shape proves the push was refused
    assert(sMin.queryExecution.executedPlan.toString
      .matches("(?s).*(Hash|Sort)Aggregate.*"))
    // integral values at/beyond 2^53 are not exactly representable in the
    // double-typed stats → refuse rather than risk a rounded answer
    spark.sql("DROP TABLE IF EXISTS gcnt.n.big")
    spark.sql("CREATE TABLE gcnt.n.big (id BIGINT)")
    spark.sql("INSERT INTO gcnt.n.big VALUES (1), (9007199254740993)")
    assert(VersionedTable.fastMinMax(spark, s"$wh/n/big", "id",
      org.apache.spark.sql.types.LongType, wantMax = true) === None)
    assert(spark.sql("SELECT max(id) FROM gcnt.n.big")
      .collect().head.getLong(0) === 9007199254740993L)
    // a DV delete could have removed the extremum row → refuse, scan, exact
    spark.sql("DELETE FROM gcnt.n.w WHERE id = 40")
    assert(VersionedTable.fastMinMax(spark, s"$wh/n/w", "id",
      org.apache.spark.sql.types.LongType, wantMax = true) === None)
    assert(spark.sql("SELECT max(id) FROM gcnt.n.w")
      .collect().head.getLong(0) === 50L)
  }
}
