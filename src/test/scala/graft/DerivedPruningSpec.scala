package graft

import org.scalatest.funsuite.AnyFunSuite

/** Generated-column derived partition pruning: a plain `WHERE ts ...` range on
  * the SOURCE column must prune partitions laid out by a declared monotone
  * derivation (`day = CAST(ts AS DATE)`) — and never change results.
  */
class DerivedPruningSpec extends AnyFunSuite with SharedSpark {

  /** The inner (bridged) physical plan — partition pruning happens at file
    * scan planning, so `Dataset.inputFiles` cannot witness it; the scan's
    * `PartitionFilters` can.
    */
  private def innerPlan(sql: String): String =
    spark.sql(sql).queryExecution.executedPlan.collect {
      case r: org.apache.spark.sql.execution.RowDataSourceScanExec => r.relation
    }.collect {
      case s: graft.sources.table.V1SnapshotScan => s.innerExecutedPlan
    }.mkString("\n")

  private def partitionFilters(sql: String): Seq[String] =
    "PartitionFilters: \\[[^\\]]*\\]".r.findAllIn(innerPlan(sql)).toSeq

  test("ts range prunes day partitions; results identical to unpruned") {
    val wh = java.nio.file.Files.createTempDirectory("graft_dpr").toString
    spark.conf.set("spark.sql.catalog.gdp",
      classOf[graft.sources.table.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gdp.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gdp.t")
    spark.sql("CREATE TABLE gdp.t.e (ts TIMESTAMP, v BIGINT, day DATE) " +
      "PARTITIONED BY (day)")
    spark.sql("CALL gdp.system.add_generated(table => 't.e', name => 'day', " +
      "gen_sql => 'CAST(ts AS DATE)')")
    // 12 rows, 6-hour grid → four days of partitions
    spark.sql("INSERT INTO gdp.t.e (ts, v) SELECT " +
      "timestamp'2024-03-01 00:00:00' + make_interval(0, 0, 0, 0, " +
      "CAST(id * 6 AS INT), 0, 0), id FROM range(16)")
    // no filter → no partition filter on the scan
    assert(!partitionFilters("SELECT v FROM gdp.t.e")
      .exists(_.contains("day")))

    // a pure ts range: without derivation this prunes NOTHING (the filter
    // names ts, not day) — with it, the file scans carry day bounds as
    // PartitionFilters and the directories prune at planning time
    val probe = "SELECT v FROM gdp.t.e WHERE " +
      "ts >= timestamp'2024-03-02 00:00:00' AND " +
      "ts < timestamp'2024-03-02 23:59:00'"
    // (the CREATE's empty v0 branch is unpartitioned — its scan legitimately
    // carries no partition filters; every PARTITIONED branch must)
    val pf = partitionFilters(probe).filterNot(_ == "PartitionFilters: []")
    assert(pf.nonEmpty && pf.forall(f =>
        f.contains("day") && f.contains(">=") && f.contains("<=")),
      s"expected derived day bounds in PartitionFilters, got $pf\n${innerPlan(probe)}")
    // values: hours 24,30,36,42 → v = 4,5,6,7
    assert(spark.sql(probe).collect().map(_.getLong(0)).sorted.toSeq
      === Seq(4L, 5L, 6L, 7L))

    // an equality probe derives a one-day bound too
    val eqSql = "SELECT v FROM gdp.t.e WHERE " +
      "ts = timestamp'2024-03-03 12:00:00'"
    assert(partitionFilters(eqSql).exists(_.contains("day")))
    assert(spark.sql(eqSql).collect().map(_.getLong(0)).toSeq === Seq(10L))

    // a NON-monotone generated column must derive nothing (correctness trap):
    // month-of-year repeats across years, so no pruning predicate may appear
    spark.sql("CREATE TABLE gdp.t.m (ts TIMESTAMP, v BIGINT, m INT)")
    spark.sql("CALL gdp.system.add_generated(table => 't.m', name => 'm', " +
      "gen_sql => 'month(ts)')")
    spark.sql("INSERT INTO gdp.t.m (ts, v) VALUES " +
      "(timestamp'2023-05-01 00:00:00', 1), (timestamp'2024-05-01 00:00:00', 2)")
    assert(spark.sql("SELECT sum(v) FROM gdp.t.m WHERE " +
      "ts >= timestamp'2024-01-01 00:00:00'").collect().head.getLong(0) === 2L)
  }
}
