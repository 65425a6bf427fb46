package graft.sources.table

import java.util

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.Path
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, Row, SparkSession, SQLContext}
import org.apache.spark.sql.catalyst.analysis.{NoSuchNamespaceException, NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog.{Identifier, SupportsDelete, SupportsNamespaces, SupportsRead, SupportsWrite, Table, TableCapability, TableCatalog, TableChange}
import org.apache.spark.sql.connector.expressions.{Expressions, Transform}
import org.apache.spark.sql.connector.expressions.aggregate.{Aggregation, Count, CountStar}
import org.apache.spark.sql.connector.read.{Scan, ScanBuilder, SupportsPushDownAggregates, SupportsPushDownFilters, SupportsPushDownRequiredColumns, V1Scan}
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, SupportsTruncate, V1Write, Write, WriteBuilder}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.sources.{BaseRelation, Filter, InsertableRelation, TableScan}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.catalog.VersionedTable

/** DataSource V2 [[TableCatalog]] over [[VersionedTable]] — the pure-SQL surface of
  * the table layer, mirroring how Delta/Iceberg plug their formats into Spark's
  * catalog API so a SQL-only user (Thrift server, notebook, `spark-sql`) gets the
  * full versioned-table lifecycle with zero Scala:
  *
  * {{{
  *   spark.sql.catalog.graft                = graft.sources.table.GraftCatalog
  *   spark.sql.catalog.graft.warehouse      = /data/graft
  *
  *   CREATE NAMESPACE graft.curated;
  *   CREATE TABLE graft.curated.docs (doc_id BIGINT, lang STRING, d DATE)
  *     PARTITIONED BY (d);
  *   INSERT INTO graft.curated.docs SELECT ...;           -- append commit
  *   INSERT OVERWRITE graft.curated.docs SELECT ...;      -- overwrite commit
  *   CREATE TABLE graft.curated.top AS SELECT ...;        -- CTAS
  *   SELECT * FROM graft.curated.docs VERSION AS OF 0;    -- native SQL time travel
  *   SELECT * FROM graft.curated.docs TIMESTAMP AS OF '2026-01-01';
  *   DELETE FROM graft.curated.docs WHERE lang = 'und';   -- deletion-vector commit
  *   TRUNCATE TABLE graft.curated.docs;
  *   ALTER TABLE graft.curated.docs RENAME COLUMN lang TO language;  -- metadata-only
  *   DROP TABLE graft.curated.docs;
  * }}}
  *
  * Identifiers are laid out `warehouse/<namespace>/<table>` — the catalog is
  * filesystem-backed exactly like the commit log itself, so there is no extra
  * metastore to coordinate with and the same layout works on HDFS/S3A at any scale
  * (namespace operations are directory operations; table existence is the presence
  * of a `_commit_log`).
  *
  * Read path: the scan builder accepts column pruning and filter pushdown at the
  * DSv2 layer, applies both to the snapshot DataFrame (so they reach the parquet
  * branches BEFORE the bridge), and serves rows through [[V1Scan]] — the supported
  * migration shim Spark itself uses for JDBC v2. The DataFrame/`format("graft-table")`
  * path keeps the fully native plan; this SQL path trades the codegen'd scan root for
  * catalog semantics while keeping pushdown intact (asserted in DSv2CatalogSpec).
  *
  * Write path: [[V1Write]] → one [[VersionedTable.write]] commit per INSERT, with the
  * declared partitioning from the create-time spec sidecar. DELETE maps pushable
  * predicates onto [[VersionedTable.deleteWhere]] — a merge-on-read deletion-vector
  * commit, zero files rewritten; an unpushable DELETE condition fails analysis
  * loudly rather than silently rewriting the table. The UPDATE / MERGE INTO
  * statements would need `SupportsRowLevelOperations` over a native DSv2 write;
  * those verbs ride the stored-procedure surface instead
  * (`CALL <cat>.system.update_where/merge` — [[GraftProcedures]]). The scan
  * reports log-resolved statistics ([[VersionedTable.snapshotStats]]), so SQL
  * joins against small graft tables broadcast exactly as native sources do.
  *
  * CREATE TABLE commits an EMPTY version 0 written flat (zero rows lay out no
  * partition directories, so the declared partitioning is persisted in the
  * `_table_spec.json` sidecar and applied to every later INSERT). `CREATE TABLE
  * ... LOCATION '<path>'` over an EXISTING versioned table registers an
  * EXTERNAL entry — a pointer file under the warehouse naming the data's real
  * location, resolved per query (so SQL over the entry tracks appends live) and
  * removed by DROP without touching the data; creating NEW data at an external
  * location stays refused (staged CREATE OR REPLACE/CTAS likewise) — a
  * filesystem catalog cannot own paths outside its warehouse.
  */
class GraftCatalog extends TableCatalog with SupportsNamespaces
  with org.apache.spark.sql.connector.catalog.ProcedureCatalog
  with org.apache.spark.sql.connector.catalog.StagingTableCatalog {

  private var catalogName: String = _
  private var warehouse: String = _

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    warehouse = Option(options.get("warehouse")).map(_.stripSuffix("/")).getOrElse(
      throw new IllegalArgumentException(s"catalog '$name' needs a warehouse " +
        s"directory: set spark.sql.catalog.$name.warehouse"))
  }

  override def name(): String = catalogName
  override def defaultNamespace(): Array[String] = Array("default")

  private def spark: SparkSession = SparkSession.active
  private def fs = new Path(warehouse).getFileSystem(spark.sessionState.newHadoopConf())
  private def nsPath(ns: Array[String]): Path = {
    ns.foreach(n => require(n.nonEmpty && !n.contains("/") && !n.startsWith("_"),
      s"bad namespace element: '$n'"))
    ns.foldLeft(new Path(warehouse))((p, n) => new Path(p, n))
  }
  private def tablePath(ident: Identifier): Path = {
    require(ident.name.nonEmpty && !ident.name.contains("/") &&
      !ident.name.startsWith("_"), s"bad table name: '${ident.name}'")
    new Path(nsPath(ident.namespace), ident.name)
  }
  private def fullName(ident: Identifier): String =
    (catalogName +: ident.namespace :+ ident.name).mkString(".")

  // ---- tables ----

  /** EXTERNAL registrations: `CREATE TABLE ... LOCATION '<path>'` over an
    * EXISTING versioned table makes the catalog entry a POINTER — a one-line
    * `_external_location` file under the entry's warehouse dir naming the
    * data's real location. Every resolution indirects through it, so SQL over
    * the entry is LIVE against the target's commit log (the registration
    * route for index artifact dirs and other out-of-warehouse tables), and
    * DROP removes only the pointer, never the data.
    */
  private def externalPointer(ident: Identifier): Path =
    new Path(tablePath(ident), "_external_location")

  private def externalTarget(ident: Identifier): Option[String] = {
    val p = externalPointer(ident)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try Some(new String(in.readAllBytes(),
        java.nio.charset.StandardCharsets.UTF_8).trim)
      finally in.close()
    }
  }

  /** The identifier's DATA location: the external target for pointer
    * registrations, the warehouse path for managed tables.
    */
  private def resolvedLoc(ident: Identifier): String =
    externalTarget(ident).getOrElse(tablePath(ident).toString)

  override def tableExists(ident: Identifier): Boolean =
    externalTarget(ident).isDefined ||
      VersionedTable.exists(spark, tablePath(ident).toString)

  override def listTables(ns: Array[String]): Array[Identifier] = {
    val p = nsPath(ns)
    if (!fs.exists(p)) throw new NoSuchNamespaceException(ns)
    fs.listStatus(p).filter(_.isDirectory)
      .filter(st => VersionedTable.exists(spark, st.getPath.toString) ||
        fs.exists(new Path(st.getPath, "_external_location")))
      .map(st => Identifier.of(ns, st.getPath.getName))
  }

  override def loadTable(ident: Identifier): Table = {
    val loc = resolvedLoc(ident)
    if (!VersionedTable.exists(spark, loc)) throw new NoSuchTableException(ident)
    new GraftSqlTable(fullName(ident), loc, None)
  }

  /** `VERSION AS OF <v>` — Spark hands the raw token through; only numeric commit
    * versions are meaningful here (Delta also accepts them; we have no branch refs).
    */
  override def loadTable(ident: Identifier, version: String): Table = {
    val loc = resolvedLoc(ident)
    if (!VersionedTable.exists(spark, loc)) throw new NoSuchTableException(ident)
    val v = try version.toLong catch {
      case _: NumberFormatException => throw ColumnBridge.analysisError(
        s"VERSION AS OF '$version' on ${fullName(ident)}: expected a numeric commit version")
    }
    new GraftSqlTable(fullName(ident), loc, Some(v))
  }

  /** `TIMESTAMP AS OF <ts>` — Spark passes microseconds since the epoch; resolve to
    * the newest commit whose MONOTONIC effective stamp is at or before it
    * ([[VersionedTable.versionAtOrBefore]] — version order dominates raw
    * wall-clock order, so a writer-clock regression cannot bind the cutoff to
    * the wrong side of a later commit).
    */
  override def loadTable(ident: Identifier, timestamp: Long): Table = {
    val loc = resolvedLoc(ident)
    if (!VersionedTable.exists(spark, loc)) throw new NoSuchTableException(ident)
    val cutoff = java.time.Instant.EPOCH.plus(timestamp, java.time.temporal.ChronoUnit.MICROS)
    val v = VersionedTable.versionAtOrBefore(spark, loc, cutoff)
      .getOrElse(throw ColumnBridge.analysisError(
        s"no commit at ${fullName(ident)} at or before $cutoff"))
    new GraftSqlTable(fullName(ident), loc, Some(v))
  }

  /** Shared definition validation for plain and STAGED creates/replaces:
    * refuses LOCATION and non-identity partitioning, checks partition columns
    * and namespace existence, and renders (location, partitionBy, spec) —
    * user TBLPROPERTIES/COMMENT land in the spec sidecar under `prop.` keys
    * (declaring metadata and having it silently dropped is worse than a
    * refusal; engine-internal location keys are the only ones elided,
    * location IS the identity here).
    */
  private def validateDefinition(ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: util.Map[String, String])
      : (String, Seq[String], Map[String, String]) = {
    val loc = tablePath(ident).toString
    if (properties.containsKey(TableCatalog.PROP_LOCATION) &&
        !"true".equalsIgnoreCase(
          String.valueOf(properties.get(TableCatalog.PROP_IS_MANAGED_LOCATION))))
      throw ColumnBridge.analysisError(
        s"${fullName(ident)}: LOCATION is not supported — a filesystem catalog " +
          "cannot re-resolve external paths; tables live under the warehouse")
    // native `CLUSTER BY (cols)` arrives as a cluster_by transform: it maps
    // onto the SAME declaration as TBLPROPERTIES ('graft.cluster.by' = ...) —
    // one write-clustering code path (stageData's range+sort), two spellings
    val (clusterTs, partTs) = partitions.toSeq.partition(_.name == "cluster_by")
    val clusterBy = clusterTs.flatMap(_.references.toSeq
      .map(_.fieldNames.mkString(".")))
    val partitionBy = partTs.map {
      case t if t.name == "identity" && t.references.length == 1 =>
        t.references.head.fieldNames.mkString(".")
      case t => throw ColumnBridge.analysisError(
        s"${fullName(ident)}: only identity PARTITIONED BY columns (and " +
          s"CLUSTER BY) are supported, got $t")
    }
    (partitionBy ++ clusterBy).foreach(c =>
      require(schema.fieldNames.exists(_.equalsIgnoreCase(c)),
        s"partition/cluster column '$c' is not in the table schema"))
    if (!fs.exists(nsPath(ident.namespace)))
      throw new NoSuchNamespaceException(ident.namespace)
    val userProps = properties.asScala.toMap -- Seq(
      TableCatalog.PROP_LOCATION, TableCatalog.PROP_IS_MANAGED_LOCATION)
    val specProps = userProps.map { case (k, v) => s"prop.$k" -> v }
    val spec = (if (partitionBy.nonEmpty)
      Map("partition_by" -> partitionBy.mkString(","))
    else Map.empty[String, String]) ++ specProps ++
      (if (clusterBy.nonEmpty)
        Map(GraftCatalog.ClusterByProp -> clusterBy.mkString(","))
      else Map.empty)
    (loc, partitionBy, spec)
  }

  /** The empty v0 content: FLAT (see class doc) but with one real parquet
    * file, so schema inference on the empty table works; repartition(1)
    * forces the file.
    */
  private def emptyContent(schema: StructType) =
    spark.createDataFrame(new util.ArrayList[Row](), schema).repartition(1)

  /** CREATE TABLE, with column DDL clauses (`DEFAULT` / `GENERATED ALWAYS AS`
    * / `GENERATED ALWAYS AS IDENTITY`) landed where the engine keeps each —
    * defaults in the spec sidecar, generated/identity through their
    * declaration APIs (zero-rows guard trivially satisfied by the empty v0).
    * The `Column[]` overload is the one Spark calls and the only one that
    * still carries generation/identity; the StructType overload remains for
    * direct callers (defaults only — see [[ColumnDdl]]).
    */
  override def createTable(ident: Identifier,
      columns: Array[org.apache.spark.sql.connector.catalog.Column],
      partitions: Array[Transform], properties: util.Map[String, String]): Table =
    createInternal(ident, ColumnDdl.extract(columns, fullName(ident)),
      partitions, properties)

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: util.Map[String, String]): Table =
    createInternal(ident, ColumnDdl.extract(schema, fullName(ident)),
      partitions, properties)

  private def createInternal(ident: Identifier, ddl: ColumnDdl.Extracted,
      partitions: Array[Transform], properties: util.Map[String, String]): Table = {
    // user-specified LOCATION = external registration over existing data
    // (IS_MANAGED_LOCATION marks catalog-assigned defaults, not user intent)
    val external = Option(properties.get(TableCatalog.PROP_LOCATION))
      .filter(_ => !"true".equalsIgnoreCase(String.valueOf(
        properties.get(TableCatalog.PROP_IS_MANAGED_LOCATION))))
    external match {
      case Some(target) => createExternal(ident, ddl, partitions, target)
      case None =>
        val (loc, _, spec) = validateDefinition(ident, ddl.clean, partitions,
          properties)
        if (VersionedTable.exists(spark, loc))
          throw new TableAlreadyExistsException(ident)
        VersionedTable.write(emptyContent(ddl.clean), loc, "overwrite",
          partitionBy = Nil)
        val fullSpec = spec ++ ColumnDdl.defaultSpecKeys(ddl.defaults)
        if (fullSpec.nonEmpty) VersionedTable.writeTableSpec(spark, loc, fullSpec)
        ColumnDdl.declare(spark, loc, ddl.generated, ddl.identity)
        new GraftSqlTable(fullName(ident), loc, None)
    }
  }

  /** EXTERNAL registration (see [[externalPointer]]): validate the target
    * holds a versioned table, validate declared columns against its live
    * schema (a subset by NAME is accepted — the entry always serves the
    * target's actual schema; declaring a column that isn't there is refused
    * rather than silently served differently), then land the pointer file
    * with an EXCLUSIVE create so racing registrations lose loudly.
    */
  private def createExternal(ident: Identifier, ddl: ColumnDdl.Extracted,
      partitions: Array[Transform], target: String): Table = {
    require(partitions.isEmpty,
      s"${fullName(ident)}: an external registration takes its layout from " +
        "the existing table — PARTITIONED BY/CLUSTER BY are not accepted")
    require(ddl.generated.isEmpty && ddl.identity.isEmpty && ddl.defaults.isEmpty,
      s"${fullName(ident)}: column DDL clauses belong to the table at the " +
        "target location, not the pointer — declare them there")
    require(VersionedTable.exists(spark, target),
      s"${fullName(ident)}: LOCATION must hold an existing graft table " +
        s"(external registration over existing data) — nothing at $target")
    if (!fs.exists(nsPath(ident.namespace)))
      throw new NoSuchNamespaceException(ident.namespace)
    if (tableExists(ident)) throw new TableAlreadyExistsException(ident)
    if (ddl.clean.nonEmpty) {
      val actual = VersionedTable.read(spark, target).schema
        .fieldNames.map(_.toLowerCase).toSet
      val missing = ddl.clean.fieldNames
        .filterNot(f => actual.contains(f.toLowerCase))
      require(missing.isEmpty,
        s"${fullName(ident)}: declared column(s) ${missing.mkString(", ")} " +
          s"do not exist at $target — declare a subset of the actual schema " +
          "(or none; the entry always serves the target's live schema)")
    }
    val out = fs.create(externalPointer(ident), false)
    try out.write(target.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    new GraftSqlTable(fullName(ident), target, None)
  }

  // ---- staged (atomic) creates and replaces: CREATE OR REPLACE / RTAS ----

  /** `CREATE OR REPLACE TABLE` / `REPLACE TABLE` [AS SELECT] and atomic CTAS.
    * Without this interface Spark falls back to DROP + CREATE — which loses
    * the whole commit log. The staged path instead resets the table
    * DEFINITION in place through [[VersionedTable.replaceDefinition]]: one
    * overwrite commit + a sidecar reset, so history, RESTORE, and schema time
    * travel KEEP WORKING across the replace (`VERSION AS OF` a pre-replace
    * version reads the old data under the old schema). Nothing lands until
    * `commitStagedChanges`; abort is a true no-op.
    */
  override def stageCreate(ident: Identifier,
      columns: Array[org.apache.spark.sql.connector.catalog.Column],
      partitions: Array[Transform], properties: util.Map[String, String])
      : org.apache.spark.sql.connector.catalog.StagedTable = {
    if (tableExists(ident)) throw new TableAlreadyExistsException(ident)
    stagedTable(ident, ColumnDdl.extract(columns, fullName(ident)), partitions,
      properties, replaceExisting = false)
  }

  override def stageCreate(ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: util.Map[String, String])
      : org.apache.spark.sql.connector.catalog.StagedTable = {
    if (tableExists(ident)) throw new TableAlreadyExistsException(ident)
    stagedTable(ident, ColumnDdl.extract(schema, fullName(ident)), partitions,
      properties, replaceExisting = false)
  }

  override def stageReplace(ident: Identifier,
      columns: Array[org.apache.spark.sql.connector.catalog.Column],
      partitions: Array[Transform], properties: util.Map[String, String])
      : org.apache.spark.sql.connector.catalog.StagedTable = {
    if (!tableExists(ident)) throw new NoSuchTableException(ident)
    stagedTable(ident, ColumnDdl.extract(columns, fullName(ident)), partitions,
      properties, replaceExisting = true)
  }

  override def stageReplace(ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: util.Map[String, String])
      : org.apache.spark.sql.connector.catalog.StagedTable = {
    if (!tableExists(ident)) throw new NoSuchTableException(ident)
    stagedTable(ident, ColumnDdl.extract(schema, fullName(ident)), partitions,
      properties, replaceExisting = true)
  }

  override def stageCreateOrReplace(ident: Identifier,
      columns: Array[org.apache.spark.sql.connector.catalog.Column],
      partitions: Array[Transform], properties: util.Map[String, String])
      : org.apache.spark.sql.connector.catalog.StagedTable =
    stagedTable(ident, ColumnDdl.extract(columns, fullName(ident)), partitions,
      properties, replaceExisting = true)

  override def stageCreateOrReplace(ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: util.Map[String, String])
      : org.apache.spark.sql.connector.catalog.StagedTable =
    stagedTable(ident, ColumnDdl.extract(schema, fullName(ident)), partitions,
      properties, replaceExisting = true)

  private def stagedTable(ident: Identifier, ddl: ColumnDdl.Extracted,
      partitions: Array[Transform], properties: util.Map[String, String],
      replaceExisting: Boolean): StagedGraftTable = {
    val (loc, partitionBy, spec) = validateDefinition(ident, ddl.clean, partitions,
      properties)
    new StagedGraftTable(fullName(ident), loc, ddl.clean, partitionBy,
      spec ++ ColumnDdl.defaultSpecKeys(ddl.defaults), replaceExisting,
      () => emptyContent(ddl.clean), ddl.generated, ddl.identity)
  }

  /** Metadata-only column DDL rides the table layer's column mapping; everything
    * else (type changes, property churn) is refused rather than faked.
    */
  override def alterTable(ident: Identifier, changes: TableChange*): Table = {
    val loc = resolvedLoc(ident)
    if (!VersionedTable.exists(spark, loc)) throw new NoSuchTableException(ident)
    changes.foreach {
      case c: TableChange.RenameColumn =>
        require(c.fieldNames.length == 1, "nested column rename is not supported")
        VersionedTable.renameColumn(spark, loc, c.fieldNames.head, c.newName)
      case c: TableChange.DeleteColumn =>
        require(c.fieldNames.length == 1, "nested column drop is not supported")
        val name = c.fieldNames.head
        // drop the column's declarations first, while the name still resolves
        // — a lingering key would re-bind if a later column reused the
        // physical name (conditional: each cleanup is a DDL-archived write)
        if (VersionedTable.columnDefaults(spark, loc).keys
            .exists(_.equalsIgnoreCase(name)))
          VersionedTable.dropColumnDefault(spark, loc, name)
        if (VersionedTable.columnComments(spark, loc).keys
            .exists(_.equalsIgnoreCase(name)))
          VersionedTable.setColumnComment(spark, loc, name, None)
        // NOT NULL cleanup lives inside dropColumn (the Scala API needs it too)
        VersionedTable.dropColumn(spark, loc, name)
      case c: TableChange.AddColumn =>
        require(c.fieldNames.length == 1, "nested column add is not supported")
        require(c.position == null,
          "column position is not supported — added columns append at the end")
        require(c.defaultValue == null,
          "DEFAULT is not supported — an added column reads as NULL until data lands")
        require(c.isNullable,
          "added columns must be nullable (existing rows carry no value)")
        VersionedTable.addColumn(spark, loc, c.fieldNames.head, c.dataType.sql)
      case c: TableChange.AddConstraint => c.constraint match {
        case chk: org.apache.spark.sql.connector.catalog.constraints.Check =>
          require(chk.enforced,
            s"constraint ${chk.name} must be ENFORCED — NOT ENFORCED CHECKs are " +
              "not recorded (the table layer always enforces on write)")
          VersionedTable.addConstraint(spark, loc, chk.name, chk.predicateSql)
        case other => throw ColumnBridge.analysisError(
          s"${fullName(ident)}: only CHECK constraints are supported, got $other")
      }
      case c: TableChange.DropConstraint =>
        // dropConstraint is a no-op for unknown names, which covers IF EXISTS
        VersionedTable.dropConstraint(spark, loc, c.name)
      case c: TableChange.SetProperty =>
        require(c.property != TableCatalog.PROP_LOCATION,
          "LOCATION cannot be changed — tables live under the warehouse")
        VersionedTable.updateTableSpec(spark, loc)(
          _ + (s"prop.${c.property}" -> c.value))
      case c: TableChange.RemoveProperty =>
        VersionedTable.updateTableSpec(spark, loc)(_ - s"prop.${c.property}")
      case c: TableChange.UpdateColumnType =>
        require(c.fieldNames.length == 1,
          "nested column type change is not supported")
        VersionedTable.widenColumn(spark, loc, c.fieldNames.head,
          c.newDataType.sql)
      case c: TableChange.ClusterBy =>
        val cols = c.clusteringColumns.toSeq.map(_.fieldNames.mkString("."))
        val schema = VersionedTable.read(spark, loc).schema
        cols.foreach(col => require(
          schema.fieldNames.exists(_.equalsIgnoreCase(col)),
          s"cluster column '$col' is not in the table schema"))
        VersionedTable.updateTableSpec(spark, loc)(spec =>
          // CLUSTER BY NONE arrives as an empty column list
          if (cols.isEmpty) spec - GraftCatalog.ClusterByProp
          else spec + (GraftCatalog.ClusterByProp -> cols.mkString(",")))
      case c: TableChange.UpdateColumnComment =>
        require(c.fieldNames.length == 1,
          "nested column comment is not supported")
        VersionedTable.setColumnComment(spark, loc, c.fieldNames.head,
          Option(c.newComment).filter(_.nonEmpty))
      case c: TableChange.UpdateColumnNullability =>
        require(c.fieldNames.length == 1,
          "nested column nullability is not supported")
        VersionedTable.setColumnNullability(spark, loc, c.fieldNames.head,
          c.nullable)
      case c: TableChange.UpdateColumnDefaultValue =>
        require(c.fieldNames.length == 1,
          "nested column default is not supported")
        // SET DEFAULT carries the expression; DROP DEFAULT arrives as an
        // empty/absent one
        Option(c.newCurrentDefault()).map(_.getSql)
          .orElse(Option(c.newDefaultValue()).filter(_.trim.nonEmpty)) match {
          case Some(sql) =>
            VersionedTable.setColumnDefault(spark, loc, c.fieldNames.head, sql)
          case None =>
            VersionedTable.dropColumnDefault(spark, loc, c.fieldNames.head)
        }
      case c => throw ColumnBridge.analysisError(
        s"${fullName(ident)}: unsupported ALTER TABLE change $c — the SQL surface " +
          "covers ADD/RENAME/DROP COLUMN, ALTER COLUMN TYPE (widening), " +
          "ADD/DROP CONSTRAINT, and SET/UNSET TBLPROPERTIES (metadata-only); " +
          "use the Scala API for generated columns and maintenance operations")
    }
    loadTable(ident)
  }

  /** Advertises the column/constraint DDL this catalog accepts, so Spark
    * routes the clauses here instead of refusing them at analysis:
    * CHECK constraints (`ALTER TABLE ... ADD CONSTRAINT ... CHECK`), column
    * DEFAULTs (CREATE + `ALTER COLUMN ... SET/DROP DEFAULT` — persisted in
    * the spec sidecar, re-injected as schema metadata for INSERT resolution),
    * and CREATE TABLE with `GENERATED ALWAYS AS (expr)` / `GENERATED ALWAYS
    * AS IDENTITY` columns (extracted into the engine's generated/identity
    * declarations — [[ColumnDdl]]).
    */
  override def capabilities()
      : util.Set[org.apache.spark.sql.connector.catalog.TableCatalogCapability] = {
    import org.apache.spark.sql.connector.catalog.TableCatalogCapability._
    util.EnumSet.of(SUPPORT_TABLE_CONSTRAINT, SUPPORT_COLUMN_DEFAULT_VALUE,
      SUPPORTS_CREATE_TABLE_WITH_GENERATED_COLUMNS,
      SUPPORTS_CREATE_TABLE_WITH_IDENTITY_COLUMNS)
  }

  override def dropTable(ident: Identifier): Boolean = {
    val p = tablePath(ident)
    // an external DROP removes the POINTER dir only — the data at the target
    // location lives on, exactly Delta's external-table drop semantics
    val isExternal = externalTarget(ident).isDefined
    val dropped = (isExternal || VersionedTable.exists(spark, p.toString)) &&
      fs.delete(p, true)
    // a recreate at this location must never be served the dropped table's
    // cached commit bodies (mtime-second + near-fixed-width length can collide)
    if (dropped && !isExternal) VersionedTable.invalidateLogCaches(p.toString)
    dropped
  }

  override def renameTable(from: Identifier, to: Identifier): Unit = {
    val src = tablePath(from)
    val dst = tablePath(to)
    // renaming an external entry moves the pointer dir — the target data
    // location is unchanged, so the entry keeps serving the same table
    if (!VersionedTable.exists(spark, src.toString) &&
        externalTarget(from).isEmpty) throw new NoSuchTableException(from)
    if (fs.exists(dst)) throw new TableAlreadyExistsException(to)
    if (!fs.exists(dst.getParent)) throw new NoSuchNamespaceException(to.namespace)
    if (!fs.rename(src, dst)) throw new java.io.IOException(
      s"failed to rename ${fullName(from)} to ${fullName(to)}")
  }

  // ---- stored procedures: CALL <catalog>.system.<proc>(...) ----

  /** `ns.table` strings inside procedure arguments resolve against this catalog's
    * warehouse — same layout rule as identifiers, so `CALL gsql.system.compact(
    * table => 'curated.docs')` maintains the table `gsql.curated.docs`.
    */
  private def tableArgIdent(name: String): Identifier = {
    val parts = name.split('.')
    require(parts.length >= 1 && parts.forall(_.nonEmpty), s"bad table name: '$name'")
    if (parts.length == 1) Identifier.of(defaultNamespace(), parts.head)
    else Identifier.of(parts.init, parts.last)
  }

  /** Existing-table resolution for procedure arguments, plus `fresh` for
    * TARGET names a procedure is about to create (clone): the namespace must
    * exist, the table must NOT.
    */
  private object resolveTableArg extends GraftProcedures.TableResolver {
    override def apply(name: String): String = {
      val ident = tableArgIdent(name)
      val loc = resolvedLoc(ident) // procedures follow external pointers too
      if (!VersionedTable.exists(spark, loc)) throw new NoSuchTableException(ident)
      loc
    }
    override def fresh(name: String): String = {
      val ident = tableArgIdent(name)
      if (!fs.exists(nsPath(ident.namespace)))
        throw new NoSuchNamespaceException(ident.namespace)
      val loc = tablePath(ident).toString
      if (VersionedTable.exists(spark, loc))
        throw new TableAlreadyExistsException(ident)
      loc
    }
  }

  override def loadProcedure(ident: Identifier)
      : org.apache.spark.sql.connector.catalog.procedures.UnboundProcedure = {
    if (!(ident.namespace.sameElements(Array("system")) &&
        GraftProcedures.byName.contains(ident.name)))
      throw ColumnBridge.analysisError(
        s"unknown procedure ${fullName(ident)} — available: " +
          GraftProcedures.all.map(p => s"$catalogName.system.${p.procName}").mkString(", "))
    GraftProcedures.unbound(GraftProcedures.byName(ident.name), resolveTableArg)
  }

  override def listProcedures(ns: Array[String]): Array[Identifier] =
    if (ns.isEmpty || ns.sameElements(Array("system")))
      GraftProcedures.all.map(p => Identifier.of(Array("system"), p.procName)).toArray
    else Array.empty

  // ---- namespaces: plain directories under the warehouse ----

  override def listNamespaces(): Array[Array[String]] = {
    val root = new Path(warehouse)
    if (!fs.exists(root)) return Array.empty
    fs.listStatus(root).filter(_.isDirectory)
      .map(_.getPath.getName).filterNot(_.startsWith("_"))
      .filterNot(n => VersionedTable.exists(spark, s"$warehouse/$n"))
      .map(Array(_))
  }

  override def listNamespaces(ns: Array[String]): Array[Array[String]] =
    if (ns.isEmpty) listNamespaces()
    else if (namespaceExists(ns)) Array.empty // single-level namespaces
    else throw new NoSuchNamespaceException(ns)

  override def namespaceExists(ns: Array[String]): Boolean =
    ns.isEmpty || fs.exists(nsPath(ns))

  override def loadNamespaceMetadata(ns: Array[String]): util.Map[String, String] = {
    if (!namespaceExists(ns)) throw new NoSuchNamespaceException(ns)
    Map(SupportsNamespaces.PROP_LOCATION -> nsPath(ns).toString).asJava
  }

  override def createNamespace(ns: Array[String],
      metadata: util.Map[String, String]): Unit = {
    require(ns.length == 1, s"only single-level namespaces are supported, got " +
      ns.mkString("."))
    fs.mkdirs(nsPath(ns))
  }

  override def alterNamespace(ns: Array[String],
      changes: org.apache.spark.sql.connector.catalog.NamespaceChange*): Unit =
    throw ColumnBridge.analysisError(
      s"namespace properties are not supported on ${ns.mkString(".")}")

  override def dropNamespace(ns: Array[String], cascade: Boolean): Boolean = {
    val p = nsPath(ns)
    if (!fs.exists(p)) throw new NoSuchNamespaceException(ns)
    if (!cascade && fs.listStatus(p).nonEmpty)
      throw new org.apache.spark.sql.catalyst.analysis.NonEmptyNamespaceException(
        ns, "drop with CASCADE to remove its tables", None)
    fs.delete(p, true)
  }
}

object GraftCatalog {
  /** The spec-sidecar key behind BOTH clustering spellings — native
    * `CLUSTER BY (cols)` and `TBLPROPERTIES ('graft.cluster.by' = 'cols')`:
    * tables carrying it get every landing batch range-repartitioned + sorted
    * on the columns inside the staged write, so per-file min/max stats stay
    * tight and the filestats/bloom pruning tiers fire (FileStatsSpec).
    */
  val ClusterByProp = "prop.graft.cluster.by"
}

/** Column-level DDL clauses (`DEFAULT <expr>`, `GENERATED ALWAYS AS (expr)`,
  * `GENERATED ALWAYS AS IDENTITY`) as Spark's analyzer hands them to a
  * StructType-based catalog: encoded in the FIELD METADATA under the keys the
  * catalyst utilities own (`ResolveDefaultColumns.CURRENT_DEFAULT_COLUMN_
  * METADATA_KEY` et al. — string literals here because the objects are
  * catalyst-internal, values pinned by ColumnDdlSpec against the running
  * Spark). `extract` pulls the declarations out and STRIPS the keys, so the
  * empty v0 parquet never carries them — the spec sidecar is the single
  * source of truth and [[GraftSqlTable.schema]] re-injects defaults for the
  * analyzer on every load.
  */
private[table] object ColumnDdl {
  val CurrentDefaultKey = "CURRENT_DEFAULT"
  val ExistsDefaultKey = "EXISTS_DEFAULT"
  private val AllKeys = Seq(CurrentDefaultKey, ExistsDefaultKey)

  final case class Extracted(
      clean: StructType,
      defaults: Map[String, String],
      generated: Map[String, String],
      identity: Option[(String, Long, Long)])

  /** The authoritative extraction, from the V2 `Column` API — the ONLY place
    * generation expressions and identity specs survive (Spark's
    * `v2ColumnsToStructType` conversion drops them; only defaults are encoded
    * as metadata), which is why the catalog overrides the `Column[]` create
    * overloads.
    */
  def extract(columns: Array[org.apache.spark.sql.connector.catalog.Column],
      tableLabel: String): Extracted = {
    val defaults = scala.collection.mutable.Map.empty[String, String]
    val generated = scala.collection.mutable.Map.empty[String, String]
    var identity: Option[(String, Long, Long)] = None
    val clean = StructType(columns.map { c =>
      Option(c.defaultValue).foreach(d => defaults(c.name) = d.getSql)
      Option(c.generationExpression).foreach(g => generated(c.name) = g)
      Option(c.identityColumnSpec).foreach { i =>
        require(identity.isEmpty,
          s"$tableLabel: one identity column per table (the engine assigns it)")
        require(!i.isAllowExplicitInsert,
          s"$tableLabel: GENERATED BY DEFAULT AS IDENTITY is not supported — " +
            "the engine always assigns identity values (use GENERATED ALWAYS)")
        identity = Some((c.name, i.getStart, i.getStep))
      }
      val base = Option(c.metadataInJSON)
        .map(org.apache.spark.sql.types.Metadata.fromJson)
        .getOrElse(org.apache.spark.sql.types.Metadata.empty)
      val mb = new org.apache.spark.sql.types.MetadataBuilder().withMetadata(base)
      Option(c.comment).foreach(cm => mb.putString("comment", cm))
      org.apache.spark.sql.types.StructField(c.name, c.dataType, c.nullable,
        mb.build())
    })
    Extracted(clean, defaults.toMap, generated.toMap, identity)
  }

  /** Metadata-based extraction for the legacy StructType entry points (kept
    * because defaults DO ride the StructType conversion — a caller landing
    * there still gets them honored instead of leaking analyzer metadata into
    * the stored schema).
    */
  def extract(schema: StructType, tableLabel: String): Extracted = {
    val defaults = scala.collection.mutable.Map.empty[String, String]
    val clean = StructType(schema.fields.map { f =>
      val m = f.metadata
      if (m.contains(CurrentDefaultKey))
        defaults(f.name) = m.getString(CurrentDefaultKey)
      if (AllKeys.exists(m.contains)) {
        val mb = new org.apache.spark.sql.types.MetadataBuilder().withMetadata(m)
        AllKeys.foreach(mb.remove)
        f.copy(metadata = mb.build())
      } else f
    })
    Extracted(clean, defaults.toMap, Map.empty, None)
  }

  /** Spec-sidecar keys for the extracted defaults (physical == logical names
    * at create time; later renames migrate the keys through the mapping).
    */
  def defaultSpecKeys(defaults: Map[String, String]): Map[String, String] =
    defaults.map { case (c, cur) => s"default.$c" -> cur }

  /** Declare the extracted generated/identity columns on a just-created
    * table (empty v0 or staged replace — both satisfy the zero-rows guard
    * the declarations enforce).
    */
  def declare(spark: SparkSession, loc: String,
      generated: Map[String, String],
      identity: Option[(String, Long, Long)]): Unit = {
    generated.foreach { case (c, g) =>
      VersionedTable.addGeneratedColumn(spark, loc, c, g) }
    identity.foreach { case (c, start, step) =>
      VersionedTable.addIdentityColumn(spark, loc, c, start, step) }
  }
}

/** A staged table for the atomic CREATE OR REPLACE / REPLACE / CTAS verbs:
  * Spark writes the query result through [[newWriteBuilder]] (captured, not
  * landed) and then calls [[commitStagedChanges]], which performs the whole
  * definition swap through [[VersionedTable.replaceDefinition]] — one
  * overwrite commit + sidecar reset, history preserved. [[abortStagedChanges]]
  * is a true no-op: nothing exists outside this object until commit.
  */
private[graft] class StagedGraftTable(tableName: String, val location: String,
    declaredSchema: StructType, partitionBy: Seq[String],
    spec: Map[String, String], replaceExisting: Boolean,
    emptyContent: () => DataFrame,
    generated: Map[String, String] = Map.empty,
    identity: Option[(String, Long, Long)] = None)
  extends org.apache.spark.sql.connector.catalog.StagedTable with SupportsWrite {

  private def spark: SparkSession = SparkSession.active
  @volatile private var pending: Option[DataFrame] = None

  override def name(): String = tableName
  override def schema(): StructType = declaredSchema
  override def partitioning(): Array[Transform] =
    partitionBy.map(Expressions.identity).toArray
  override def properties(): util.Map[String, String] =
    spec.collect { case (k, v) if k.startsWith("prop.") =>
      k.stripPrefix("prop.") -> v }.asJava
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.V1_BATCH_WRITE, TableCapability.TRUNCATE)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder with SupportsTruncate {
      override def truncate(): WriteBuilder = this // staged content IS the table
      override def build(): Write = new V1Write {
        override def toInsertableRelation: InsertableRelation =
          new InsertableRelation {
            override def insert(data: DataFrame, overwrite: Boolean): Unit =
              pending = Some(data)
          }
      }
    }

  override def commitStagedChanges(): Unit = {
    if (!replaceExisting && VersionedTable.exists(spark, location))
      throw ColumnBridge.analysisError(
        s"$tableName was created concurrently — staged CREATE refuses to clobber")
    val data = pending.getOrElse(emptyContent())
    // an EMPTY declared-schema table cannot lay out partition directories —
    // the declared partitioning lives in the spec and applies to later
    // INSERTs, exactly like the plain CREATE path
    val layout = if (pending.isDefined) partitionBy else Nil
    VersionedTable.replaceDefinition(spark, location, data, layout, spec)
    // generated/identity declarations land AFTER the definition swap (the
    // reset cleared any previous ones); the zero-rows guard inside makes an
    // identity declaration over staged CONTENT refuse loudly rather than
    // retroactively blessing unassigned values
    ColumnDdl.declare(spark, location, generated, identity)
  }

  override def abortStagedChanges(): Unit = () // nothing landed
}

/** One versioned table (optionally pinned to a time-travel version) through the DSv2
  * [[Table]] API. Reads and writes delegate to the same [[VersionedTable]] code paths
  * as the Scala and DataSource surfaces, so SQL users get identical semantics —
  * commits, CHECK constraints, generated columns, column mapping, deletion vectors.
  */
class GraftSqlTable(tableName: String, val location: String,
    versionAsOf: Option[Long])
  extends Table with SupportsRead with SupportsWrite with SupportsDelete {

  /** Pinned time-travel version, if this relation was resolved `VERSION AS OF`
    * — row-level SQL refuses such targets ([[GraftRowLevelSql]]).
    */
  def asOfVersion: Option[Long] = versionAsOf

  private def spark: SparkSession = SparkSession.active

  private def snapshot: DataFrame = versionAsOf
    .map(VersionedTable.readAsOf(spark, location, _))
    .getOrElse(VersionedTable.read(spark, location))

  /** Declared partitioning: the create-time spec when present, else whatever the
    * latest commit used (tables created through the Scala API).
    */
  private def partitionCols: Seq[String] =
    VersionedTable.declaredPartitioning(spark, location)

  override def name(): String = tableName

  /** The snapshot schema with declared column DEFAULTs re-injected as the
    * analyzer's metadata keys — this is what makes an SQL `INSERT` that omits
    * the column (or writes `DEFAULT`) materialize the declared expression
    * instead of NULL. The parquet files never carry the keys; the spec
    * sidecar is the single source of truth ([[ColumnDdl]]).
    */
  override def schema(): StructType = {
    val base = snapshot.schema
    // one (spec, mapping) read for all three decoration kinds — this runs on
    // every analysis of the table
    val (defaults, comments, notNull) =
      VersionedTable.columnDecorations(spark, location)
    if (defaults.isEmpty && comments.isEmpty && notNull.isEmpty &&
        !base.fields.exists(VersionedTable.hasDefaultMeta))
      base
    else StructType(base.fields.map { f0 =>
      // SANITIZE first: pre-fix files may carry analyzer default metadata in
      // their footers (landed before stageData stripped it), and mergeSchema
      // surfaces it nondeterministically — a since-dropped default must not
      // resurrect from a stale footer. The spec is the single source of truth.
      val f1 = if (VersionedTable.hasDefaultMeta(f0))
        VersionedTable.withoutDefaultMeta(f0) else f0
      val f = if (notNull.contains(f1.name.toLowerCase))
        f1.copy(nullable = false) else f1
      val withDefault = defaults.collectFirst {
        case (n, cur) if n.equalsIgnoreCase(f.name) => cur
      } match {
        case Some(cur) =>
          // EXISTS_DEFAULT mirrors the current expression: reads never apply
          // it here (files carry their values), the analyzer just expects the
          // pair to travel together
          val mb = new org.apache.spark.sql.types.MetadataBuilder()
            .withMetadata(f.metadata)
            .putString(ColumnDdl.CurrentDefaultKey, cur)
            .putString(ColumnDdl.ExistsDefaultKey, cur)
          f.copy(metadata = mb.build())
        case None => f
      }
      comments.collectFirst {
        case (n, c) if n.equalsIgnoreCase(withDefault.name) => c
      } match {
        case Some(c) => withDefault.withComment(c)
        case None => withDefault
      }
    })
  }

  override def partitioning(): Array[Transform] = {
    // declared clustering surfaces as a cluster_by transform, so DESCRIBE and
    // catalog tooling show it exactly as Spark's parser spelled it
    val cluster = VersionedTable.tableSpec(spark, location)
      .get(GraftCatalog.ClusterByProp).toSeq
      .flatMap(_.split(",")).map(_.trim).filter(_.nonEmpty)
    partitionCols.map(Expressions.identity).toArray[Transform] ++
      (if (cluster.isEmpty) Array.empty[Transform]
       else Array[Transform](
         org.apache.spark.sql.connector.expressions.ClusterByTransform(
           cluster.map(c => Expressions.column(c)
             : org.apache.spark.sql.connector.expressions.NamedReference))))
  }
  override def version(): String =
    VersionedTable.commits(spark, location).lastOption.map(_.version.toString).orNull

  override def properties(): util.Map[String, String] = {
    // create-time user properties (TBLPROPERTIES/COMMENT/...) ride the spec
    // sidecar under `prop.` keys; engine identity keys are computed
    val stored = VersionedTable.tableSpec(spark, location).collect {
      case (k, v) if k.startsWith("prop.") => k.stripPrefix("prop.") -> v
    }
    (stored ++ Map(TableCatalog.PROP_LOCATION -> location,
      TableCatalog.PROP_PROVIDER -> "graft-table")).asJava
  }

  /** The table's CHECK constraints, surfaced through the DSv2 metadata API so
    * DESCRIBE and catalog tooling see what the write path enforces. Every graft
    * CHECK is enforced-on-write and validated against live data when declared.
    */
  override def constraints()
      : Array[org.apache.spark.sql.connector.catalog.constraints.Constraint] =
    VersionedTable.constraints(spark, location).toSeq.sortBy(_._1).map {
      case (n, sql) =>
        org.apache.spark.sql.connector.catalog.constraints.Constraint.check(n)
          .predicateSql(sql).build()
          : org.apache.spark.sql.connector.catalog.constraints.Constraint
    }.toArray

  /** AUTOMATIC_SCHEMA_EVOLUTION advertises `MERGE ... WITH SCHEMA EVOLUTION`:
    * Spark's analyzer (ResolveMergeIntoSchemaEvolution) computes the
    * source-minus-target column set and routes it through THIS catalog's
    * `alterTable` — i.e. the same metadata-only ADD COLUMN DDL a user would
    * write, archived for schema time travel — then re-resolves the merge
    * against the widened table. Type WIDENING arrives as an
    * UpdateColumnType change, which `alterTable` refuses loudly (metadata-only
    * evolution is additive here). Nothing else in Spark keys off the
    * capability (verified against the 4.1.2 bytecode: only
    * `DataSourceV2Relation.autoSchemaEvolution` → `MergeIntoTable`).
    */
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.V1_BATCH_WRITE,
      TableCapability.TRUNCATE, TableCapability.OVERWRITE_BY_FILTER,
      TableCapability.AUTOMATIC_SCHEMA_EVOLUTION)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GraftScanBuilder(snapshot, location, versionAsOf)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    versionAsOf.foreach(v => throw ColumnBridge.analysisError(
      s"$tableName VERSION AS OF $v is a read-only snapshot — write to the table head"))
    new GraftWriteBuilder(location, partitionCols)
  }

  // ---- DELETE FROM / TRUNCATE TABLE: a deletion-vector commit, no rewrite ----

  override def canDeleteWhere(filters: Array[Filter]): Boolean =
    filters.forall(f => FilterTranslation.toSql(f).isDefined)

  override def deleteWhere(filters: Array[Filter]): Unit = {
    versionAsOf.foreach(v => throw ColumnBridge.analysisError(
      s"$tableName VERSION AS OF $v is a read-only snapshot"))
    val condition = filters.flatMap(FilterTranslation.toSql)
      .reduceOption((l, r) => s"($l AND $r)")
      .getOrElse("true") // DELETE with no WHERE / TRUNCATE
    VersionedTable.deleteWhere(spark, location, condition)
  }
}

/** DSv2 scan with column pruning and filter pushdown applied to the snapshot plan
  * BEFORE the V1 bridge — the filters and projection reach the underlying parquet
  * branches (through the partitioned union when there is one), so partition pruning
  * and `PushedFilters` behave as on the native path. `pushFilters` keeps every
  * filter as post-scan residual (conservative, like the V1 relation's
  * unhandled-filter contract), so pushdown is a pure optimization.
  *
  * COMMIT-LEVEL DATA SKIPPING: the pushed conjunction is also resolved into
  * per-column ranges ([[FilterTranslation.ranges]]) and the scan re-assembles
  * from only the commits whose logged min/max can overlap
  * ([[VersionedTable.readPrunedConjunction]]) — a plain SQL
  * `WHERE ts BETWEEN ...` or `WHERE source = 'web'` on a long-appended catalog
  * table touches only the matching commits' files, driver-side from the log,
  * before parquet footers are even listed. The pushed filters still apply to
  * whatever survives, so skipping never changes semantics.
  */
class GraftScanBuilder(df: DataFrame, location: String, versionAsOf: Option[Long])
  extends ScanBuilder
  with SupportsPushDownFilters with SupportsPushDownRequiredColumns
  with SupportsPushDownAggregates {

  private var pushed: Array[Filter] = Array.empty
  private var required: Option[StructType] = None
  // AGGREGATE pushdown: the metadata-resolved (value, output type) per
  // aggregate expression, frozen at push time (planning) — COUNT(*) via
  // fastCount, COUNT(col) via fastCountCol's null-stat subtraction,
  // MIN/MAX(col) via fastMinMax over the commit stats. Empty = no push.
  private var aggValues: Seq[(Any, org.apache.spark.sql.types.DataType)] = Seq.empty

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    pushed = filters.filter(f => FilterTranslation.toColumn(f).isDefined)
    filters
  }
  override def pushedFilters(): Array[Filter] = pushed
  override def pruneColumns(requiredSchema: StructType): Unit =
    // after an aggregate push the "required columns" are the agg outputs, not
    // table columns — the pushed-agg scan ignores them (JDBC does the same)
    if (aggValues.isEmpty) required = Some(requiredSchema)

  /** AGGREGATE-FROM-METADATA (Delta parity): an unfiltered, ungrouped
    * `SELECT count(*) FROM t` never touches a data file — the count is the
    * log's row_count/replaced_rows subtraction ([[VersionedTable.fastCount]]),
    * exact under DVs, scoped merges, and time travel, the same at 100 rows or
    * 100 TB. `count(col)` rides the per-commit NULL counts the same way
    * ([[VersionedTable.fastCountCol]]), and `min(col)`/`max(col)` ride the
    * commit min/max stats ([[VersionedTable.fastMinMax]]) — each pushes only
    * when the log can PROVE the exact value (recorded stats for every
    * row-contributing commit, no DV/scoped retirement that could have removed
    * the extremum or an unattributably-null row, exact type representation);
    * otherwise the push is refused and Spark plans the ordinary
    * scan+aggregate. Only the COMPLETE push is accepted: Spark plans a
    * Project over this scan's single row, no aggregate exec at all. Any WHERE
    * clause blocks the push structurally — this builder keeps every filter as
    * post-scan residual, so a Filter node always sits between the Aggregate
    * and the scan and Spark never attempts the push; the `pushed.isEmpty`
    * guard is belt-and-braces.
    */
  private var lastResolved:
    Option[(Aggregation, Option[Seq[(Any, org.apache.spark.sql.types.DataType)]])] = None

  private def resolveAggs(agg: Aggregation)
      : Option[Seq[(Any, org.apache.spark.sql.types.DataType)]] =
    lastResolved match {
      // supportCompletePushDown and pushAggregation both resolve; same
      // Aggregation instance → one log read, not two
      case Some((a, r)) if a eq agg => r
      case _ =>
        val r = resolveAggsUncached(agg)
        lastResolved = Some((agg, r))
        r
    }

  private def singleColumn(e: org.apache.spark.sql.connector.expressions.Expression)
      : Option[String] = e match {
    case f: org.apache.spark.sql.connector.expressions.NamedReference
        if f.fieldNames.length == 1 => Some(f.fieldNames.head)
    case _ => None
  }

  private def resolveAggsUncached(agg: Aggregation)
      : Option[Seq[(Any, org.apache.spark.sql.types.DataType)]] = {
    if (pushed.nonEmpty || agg.groupByExpressions.nonEmpty ||
        agg.aggregateExpressions.isEmpty) return None
    val spark = df.sparkSession
    lazy val star = VersionedTable.fastCount(spark, location, versionAsOf)
    def typeOf(name: String): Option[org.apache.spark.sql.types.DataType] =
      df.schema.fields.find(_.name.equalsIgnoreCase(name)).map(_.dataType)
    val longT = org.apache.spark.sql.types.LongType
    val vals: Seq[Option[(Any, org.apache.spark.sql.types.DataType)]] =
      agg.aggregateExpressions.toSeq.map {
        case _: CountStar => Some((star, longT))
        case c: Count if !c.isDistinct =>
          singleColumn(c.column).flatMap(n =>
            VersionedTable.fastCountCol(spark, location, n, versionAsOf)
              .map(v => (v, longT)))
        case m: org.apache.spark.sql.connector.expressions.aggregate.Min =>
          singleColumn(m.column).flatMap(n => typeOf(n).flatMap(t =>
            VersionedTable.fastMinMax(spark, location, n, t, wantMax = false,
              versionAsOf).map(v => (v.orNull, t))))
        case m: org.apache.spark.sql.connector.expressions.aggregate.Max =>
          singleColumn(m.column).flatMap(n => typeOf(n).flatMap(t =>
            VersionedTable.fastMinMax(spark, location, n, t, wantMax = true,
              versionAsOf).map(v => (v.orNull, t))))
        case _ => None
      }
    if (vals.forall(_.isDefined)) Some(vals.flatten) else None
  }

  override def supportCompletePushDown(agg: Aggregation): Boolean =
    resolveAggs(agg).isDefined

  override def pushAggregation(agg: Aggregation): Boolean =
    resolveAggs(agg) match {
      case Some(vals) => aggValues = vals; true
      case None => false
    }

  override def build(): Scan =
    if (aggValues.nonEmpty) buildAggScan() else buildDataScan()

  private def buildAggScan(): Scan = {
    val vals = aggValues
    val schema = StructType(vals.zipWithIndex.map { case ((v, t), i) =>
      org.apache.spark.sql.types.StructField(s"agg_$i", t, nullable = v == null)
    })
    new V1Scan {
      override def readSchema(): StructType = schema
      override def toV1TableScan[T <: BaseRelation with TableScan](
          ctx: SQLContext): T = {
        val one = df.sparkSession.createDataFrame(
          java.util.Collections.singletonList(Row.fromSeq(vals.map(_._1))), schema)
        new V1SnapshotScan(ctx, one, schema).asInstanceOf[T]
      }
    }
  }

  private def buildDataScan(): Scan = new V1Scan
      with org.apache.spark.sql.connector.read.SupportsReportStatistics {
    private val readSchemaV: StructType = required.getOrElse(df.schema)
    override def readSchema(): StructType = readSchemaV

    /** Log-resolved planning statistics — without these the V1 bridge reports
      * nothing and Spark assumes the-whole-cluster-sized defaults, so a 1 MB
      * dimension table in a SQL join would never broadcast. Rows are exact from
      * commit metadata, bytes a driver-side live-dir listing (pre-pushdown, as
      * the DSv2 contract specifies for post-pruning estimates Spark scales
      * itself); no data file is opened.
      */
    override def estimateStatistics(): org.apache.spark.sql.connector.read.Statistics = {
      val (rows, bytes) =
        graft.catalog.VersionedTable.snapshotStats(df.sparkSession, location, versionAsOf)
      new org.apache.spark.sql.connector.read.Statistics {
        override def sizeInBytes(): java.util.OptionalLong =
          java.util.OptionalLong.of(bytes max 1L)
        override def numRows(): java.util.OptionalLong = java.util.OptionalLong.of(rows)
      }
    }

    override def toV1TableScan[T <: BaseRelation with TableScan](ctx: SQLContext): T = {
      val (num, str) = FilterTranslation.ranges(pushed.toSeq, df.schema)
      // native-typed equality/IN probes additionally consult per-commit bloom
      // filters (point-lookup skipping on hash-like columns, opt-in via
      // TBLPROPERTIES 'graft.bloom.columns') and prune per-VALUE: `id IN
      // (50, 2050)` drops a commit spanning [1000, 1099] that the conjunction
      // envelope [50, 2050] alone keeps. IN lists beyond 64 values fall back
      // to the envelope — the probe is O(commits × values) driver work
      def probeValue(v: Any): Boolean = v match {
        case _: java.lang.Long | _: java.lang.Integer | _: java.lang.Short |
             _: java.lang.Byte | _: String => true
        case _ => false
      }
      val inSets = pushed.toSeq.collect {
        case org.apache.spark.sql.sources.EqualTo(a, v) if probeValue(v) =>
          a -> Seq[Any](v)
        case org.apache.spark.sql.sources.In(a, vs)
            if vs.nonEmpty && vs.length <= 64 && vs.forall(probeValue) =>
          a -> vs.toSeq
      }.toMap
      // IS [NOT] NULL probes consult the logged per-commit null counts —
      // notably, Spark pushes IsNotNull alongside almost every predicate, so
      // all-null commits (which record NO min/max and dodge the range gate)
      // prune for free on ordinary WHERE clauses
      val nullProbes = pushed.toSeq.collect {
        case org.apache.spark.sql.sources.IsNull(a) => a -> true
        case org.apache.spark.sql.sources.IsNotNull(a) => a -> false
      }.toMap
      val base =
        if (num.isEmpty && str.isEmpty && inSets.isEmpty && nullProbes.isEmpty) df
        else VersionedTable.readPrunedConjunction(df.sparkSession, location,
          versionAsOf, num, str, inSets, nullProbes)
      val filtered = pushed.flatMap(FilterTranslation.toColumn).foldLeft(base)(_.filter(_))
      // generated-column derived pruning: a range on ts also bounds a declared
      // monotone `day = CAST(ts AS DATE)` partition column — the extra
      // predicate is implied (write-validated generation), and hive partition
      // pruning then drops whole directories the ts filter alone never could
      val derived = DerivedPruning.predicates(df.sparkSession, location,
        pushed.toSeq).foldLeft(filtered)(_.filter(_))
      // empty projection (COUNT(*) pruning) is a valid zero-column select
      val pruned = derived.select(readSchemaV.fieldNames.toIndexedSeq.map(col): _*)
      new V1SnapshotScan(ctx, pruned, readSchemaV).asInstanceOf[T]
    }
  }
}

private[graft] class V1SnapshotScan(ctx: SQLContext, df: DataFrame,
    override val schema: StructType) extends BaseRelation with TableScan {
  override def sqlContext: SQLContext = ctx
  override def buildScan(): RDD[Row] = df.rdd

  /** The data files the wrapped snapshot plan would read — how a test asserts
    * commit-level skipping shrank a pure-SQL scan (the V1 bridge hides the
    * inner parquet relations from `Dataset.inputFiles`). NOTE: this is the
    * file INDEX, before runtime partition pruning — hive partition pruning
    * shows in [[innerExecutedPlan]]'s `PartitionFilters`, not here.
    */
  private[graft] def inputFiles: Array[String] = df.inputFiles

  /** The wrapped snapshot plan as physically executed — where tests assert
    * partition-pruning predicates (incl. generated-column derived ones)
    * actually reached the file scans.
    */
  private[graft] def innerExecutedPlan: String =
    df.queryExecution.executedPlan.toString
}

/** INSERT INTO → append commit; INSERT OVERWRITE → overwrite commit (Spark signals
  * static full-table overwrite through [[SupportsTruncate]]); `INSERT OVERWRITE
  * ... PARTITION (k = v)` → a partition-scoped `"replace"` commit that rewrites
  * nothing outside the named partitions ([[SupportsOverwrite]] on the static
  * filters). SQL `partitionOverwriteMode=dynamic` is deliberately NOT advertised:
  * `OverwritePartitionsDynamic` cannot execute over the V1 write bridge (Spark
  * plans it only for native DSv2 BatchWrites) — data-driven partition replacement
  * is served by [[VersionedTable.overwritePartitions]] and the
  * `format("graft-table")` writer's `partitionOverwriteMode=dynamic` option
  * instead. One commit per INSERT, laid out with the table's declared
  * partitioning.
  */
class GraftWriteBuilder(location: String, partitionBy: Seq[String])
  extends WriteBuilder with SupportsTruncate
  with org.apache.spark.sql.connector.write.SupportsOverwrite {

  private sealed trait Mode
  private case object Append extends Mode
  private case object Truncate extends Mode
  private case class Static(values: Seq[Seq[(String, String)]]) extends Mode

  private var mode: Mode = Append

  override def truncate(): WriteBuilder = { mode = Truncate; this }

  override def overwrite(filters: Array[Filter]): WriteBuilder = {
    // the DSv2 SupportsOverwrite contract is CONJUNCTIVE: Spark splits the
    // overwrite condition on AND before the call, so a multi-column
    // PARTITION (a = 1, b = 2) arrives as [EqualNullSafe(a,1),
    // EqualNullSafe(b,2)] meaning a=1 AND b=2 — ONE partition tuple, never
    // one tuple per array element
    val conjuncts = filters.filterNot(_ == org.apache.spark.sql.sources.AlwaysTrue)
    mode =
      if (conjuncts.isEmpty) Truncate
      else Static(Seq(partitionTuple(
        conjuncts.reduce(org.apache.spark.sql.sources.And(_, _)))))
    this
  }

  /** The ANDed overwrite condition → one fully-bound partition tuple. The scoped
    * commit's shadow predicate and vacuum reclamation both speak whole partition
    * directories, so anything but a conjunction of partition-column equalities
    * (every partition column bound) is refused with the fix named.
    */
  private def partitionTuple(f: Filter): Seq[(String, String)] = {
    def eqs(f0: Filter): Seq[(String, String)] = f0 match {
      case org.apache.spark.sql.sources.EqualTo(a, v) if v != null =>
        Seq(a -> String.valueOf(v))
      // the SQL PARTITION (col = value) spec arrives null-safe
      case org.apache.spark.sql.sources.EqualNullSafe(a, v) if v != null =>
        Seq(a -> String.valueOf(v))
      case org.apache.spark.sql.sources.And(l, r) => eqs(l) ++ eqs(r)
      case other => throw ColumnBridge.analysisError(
        s"INSERT OVERWRITE condition $other on $location is not a partition " +
          "spec — scoped overwrite supports PARTITION (col = value, ...) with " +
          "every partition column bound; for data-driven partition replacement " +
          "set spark.sql.sources.partitionOverwriteMode=dynamic")
    }
    val bound = eqs(f).toMap
    if (bound.keySet.map(_.toLowerCase) != partitionBy.map(_.toLowerCase).toSet)
      throw ColumnBridge.analysisError(
        s"INSERT OVERWRITE on $location must bind exactly the partition columns " +
          s"(${partitionBy.mkString(", ")}); got ${bound.keySet.mkString(", ")}")
    partitionBy.map(k => k ->
      bound.collectFirst { case (a, v) if a.equalsIgnoreCase(k) => v }.get)
  }

  override def build(): Write = new V1Write {
    override def toInsertableRelation: InsertableRelation = new InsertableRelation {
      override def insert(data: DataFrame, ignored: Boolean): Unit = mode match {
        case Append => VersionedTable.write(data, location, "append", partitionBy)
        case Truncate => VersionedTable.write(data, location, "overwrite", partitionBy)
        case Static(values) =>
          VersionedTable.overwritePartitions(data, location, Some(values))
      }
    }
  }
}
