package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.catalog.VersionedTable

/** EXTERNAL catalog registration: `CREATE TABLE <cat>.<ns>.<t> LOCATION
  * '<existing versioned table>'` makes the entry a POINTER at existing data —
  * the DSv2 route resolves the commit log per query, so SQL over the entry is
  * LIVE (appends visible with no re-registration), and DROP removes only the
  * pointer. The registration path for index artifacts and any other
  * out-of-warehouse versioned table.
  */
class ExternalTableSpec extends AnyFunSuite with SharedSpark {

  import spark.implicits._

  private lazy val wh: String = {
    val dir = Files.createTempDirectory("graft_ext_cat").toString
    spark.conf.set("spark.sql.catalog.gext",
      classOf[graft.sources.table.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gext.warehouse", dir)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gext.x")
    dir
  }

  test("external table serves the CURRENT snapshot per query — appends land " +
      "with no re-registration; DROP removes the pointer, never the data") {
    wh
    val loc = Files.createTempDirectory("ext_data").toString + "/t"
    VersionedTable.write(Seq((1L, "a"), (2L, "b")).toDF("id", "v"), loc)
    spark.sql(s"CREATE TABLE gext.x.ext LOCATION '$loc'")
    assert(spark.sql("SELECT count(*) FROM gext.x.ext").head().getLong(0) === 2L)

    // LIVE: an append through the Scala API is visible to the SAME statement
    VersionedTable.write(Seq((3L, "c")).toDF("id", "v"), loc, "append")
    assert(spark.sql("SELECT count(*) FROM gext.x.ext").head().getLong(0) === 3L)

    // writes THROUGH the entry land at the external location
    spark.sql("INSERT INTO gext.x.ext VALUES (4, 'd')")
    assert(VersionedTable.read(spark, loc).count() === 4L)

    // time travel works through the pointer
    assert(spark.sql("SELECT count(*) FROM gext.x.ext VERSION AS OF 0")
      .head().getLong(0) === 2L)

    // procedures resolve the pointer too
    assert(spark.sql("CALL gext.system.fast_count(table => 'x.ext')")
      .head().getLong(0) === 4L)

    // DROP removes the catalog entry only — the data lives on
    spark.sql("DROP TABLE gext.x.ext")
    assert(!spark.catalog.tableExists("gext.x.ext"))
    assert(VersionedTable.read(spark, loc).count() === 4L)
  }

  test("external registration validates: LOCATION must hold an existing " +
      "table; declared columns must exist; managed creates are unchanged") {
    wh
    val e1 = intercept[Exception] {
      spark.sql("CREATE TABLE gext.x.missing LOCATION '/no/such/table'")
    }
    assert(e1.getMessage.contains("existing"), e1.getMessage)

    val loc = Files.createTempDirectory("ext_data2").toString + "/t"
    VersionedTable.write(Seq((1L, "a")).toDF("id", "v"), loc)
    val e2 = intercept[Exception] {
      spark.sql(s"CREATE TABLE gext.x.bad (nope BIGINT) LOCATION '$loc'")
    }
    assert(e2.getMessage.contains("nope"), e2.getMessage)

    // declared columns that DO exist are accepted (names validated, schema
    // served from the data)
    spark.sql(s"CREATE TABLE gext.x.ok (id BIGINT) LOCATION '$loc'")
    assert(spark.sql("SELECT * FROM gext.x.ok").columns.toSet === Set("id", "v"))
    spark.sql("DROP TABLE gext.x.ok")

    // managed path untouched: no LOCATION → table under the warehouse
    spark.sql("CREATE TABLE gext.x.managed (id BIGINT)")
    spark.sql("INSERT INTO gext.x.managed VALUES (7)")
    assert(spark.sql("SELECT count(*) FROM gext.x.managed").head().getLong(0) === 1L)
    spark.sql("DROP TABLE gext.x.managed")
  }
}
