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
    // count(col) is null-sensitive — never pushed
    val byCol = spark.sql("SELECT count(id) FROM gcnt.n.u")
    assert(byCol.collect().head.getLong(0) === 150L)
    assert(byCol.queryExecution.executedPlan.toString.contains("Aggregate"))
    // grouped counts are never pushed
    val grouped = spark.sql(
      "SELECT id % 2 AS g, count(*) AS c FROM gcnt.n.u GROUP BY 1 ORDER BY 1")
    assert(grouped.collect().map(_.getLong(1)).toSeq === Seq(75L, 75L))
  }
}
