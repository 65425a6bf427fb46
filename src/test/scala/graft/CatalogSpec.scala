package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.catalog.MetadataScanner

class CatalogSpec extends AnyFunSuite with SharedSpark {

  test("scan: per-table file stats match the filesystem") {
    val stats = MetadataScanner.scan(spark,
      Map("orders" -> s"$sf/orders.parquet", "region" -> s"$sf/region.parquet"))
    assert(stats.map(_.table_name) === Seq("orders", "region"))
    val orders = stats.head
    assert(orders.n_files === 1)
    assert(orders.total_bytes === new java.io.File(s"$sf/orders.parquet").length())
    assert(orders.max_modified_ms > 0)
  }

  test("register: catalog table is queryable via SQL") {
    MetadataScanner.registerParquetTable(spark, "graft_test", "region_t",
      s"$sf/region.parquet")
    val n = spark.sql("SELECT COUNT(*) FROM graft_test.region_t").first().getLong(0)
    assert(n === 5)
    assert(spark.catalog.tableExists("graft_test.region_t"))
  }

  test("ingest log: append-only history facsimile") {
    val loc = Files.createTempDirectory("ingest_log").toString
    MetadataScanner.appendIngestLog(spark, loc, "WRITE", 100)
    MetadataScanner.appendIngestLog(spark, loc, "OVERWRITE", 250)
    val log = MetadataScanner.readIngestLog(spark, loc)
    assert(log.count() === 2)
    assert(log.columns.toSet === Set("timestamp", "operation", "row_count"))
  }
}
