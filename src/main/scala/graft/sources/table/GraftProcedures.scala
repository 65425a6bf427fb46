package graft.sources.table

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.catalog.VersionedTable

/** The table-maintenance surface as DSv2 stored procedures — Spark 4's `CALL`
  * statement (the API Iceberg's `CALL catalog.system.rewrite_data_files` rides), so
  * OPTIMIZE/VACUUM/RESTORE-class operations need no Scala either:
  *
  * {{{
  *   CALL gsql.system.compact(table => 'ns.t', zorder_by => 'a,b')
  *   CALL gsql.system.vacuum(table => 'ns.t', retention_hours => 0, orphan_grace_hours => 0)
  *   CALL gsql.system.restore(table => 'ns.t', version => 3)
  *   CALL gsql.system.history(table => 'ns.t')
  *   CALL gsql.system.fast_count(table => 'ns.t')
  *   CALL gsql.system.add_constraint(table => 'ns.t', name => 'qty_pos', check_sql => 'qty > 0')
  *   CALL gsql.system.drop_constraint(table => 'ns.t', name => 'qty_pos')
  *   CALL gsql.system.generate_manifest(table => 'ns.t')
  *   CALL gsql.system.maintain(table => 'ns.t', max_live_commits => 16)
  *   CALL gsql.system.update_where(table => 'ns.t', condition => 'id < 5',
  *                                 assignments => 'qty = qty * 2')
  *   CALL gsql.system.merge(table => 'ns.t', source => 'changes_view', keys => 'id')
  *   CALL gsql.system.copy_into(table => 'ns.t', source => '/landing/orders')
  *   CALL gsql.system.detail(table => 'ns.t')
  *   CALL gsql.system.clone(table => 'ns.t', target => 'ns.t_dev', version => 3)
  *   CALL gsql.system.set_nullable(table => 'ns.t', column => 'v')
  *   CALL gsql.system.rebuild_index(location => '/indexes/ivf')
  *   CALL gsql.system.rebuild_index(location => '/indexes/pq', kind => 'ivfpq',
  *                                  source => 'embeddings_view')
  * }}}
  *
  * `update_where` and `merge` are the UPDATE / MERGE INTO verbs: Spark only plans
  * those statements against tables with native DSv2 row-level-operation writes,
  * which the V1 write bridge cannot provide — so they ride the procedure surface
  * (exactly how Iceberg shipped maintenance verbs before the plans existed).
  * `merge`'s source is any registered view or table name resolvable by
  * `spark.table`.
  *
  * Each procedure delegates to the [[VersionedTable]] entry point and returns its
  * outcome as a driver-local result set ([[LocalScan]] — these are all
  * metadata-sized outputs: a committed version, a count, the history rows). The
  * heavy lifting (compaction's rewrite, restore's copy) runs as the same
  * distributed jobs the Scala API plans; the procedure layer adds zero data work.
  */
private[table] object GraftProcedures {

  /** One procedure: `params` in declaration order, `resultSchema` for the result
    * scan, `run` maps the bound argument values (JVM types: String/Long/Int) to
    * result rows. `resolve` turns a catalog-relative `ns.table` string into the
    * table location.
    */
  /** Procedure-argument table resolution: `apply` demands an EXISTING table;
    * `fresh` resolves a TARGET the procedure will create (namespace must
    * exist, table must not).
    */
  trait TableResolver extends (String => String) {
    def fresh(name: String): String
  }

  final case class GraftProcedure(
      procName: String,
      describe: String,
      params: Seq[ProcedureParameter],
      resultSchema: StructType,
      run: (SparkSession, TableResolver, Seq[Any]) => Seq[Seq[Any]])

  private def in(name: String, dt: DataType): ProcedureParameter =
    ProcedureParameter.in(name, dt).build()
  private def inDefault(name: String, dt: DataType, default: String): ProcedureParameter =
    ProcedureParameter.in(name, dt).defaultValue(default).build()

  private def hours(h: Long): Long = h * 3600L * 1000L

  val all: Seq[GraftProcedure] = Seq(
    GraftProcedure("compact",
      "OPTIMIZE: rewrite the live set as one compacted commit, optionally " +
        "Z-ordered; partitions => 'k=v/k2=v2;...' scopes the rewrite to the " +
        "named partitions only (a replace commit — the rest of the table is " +
        "untouched)",
      Seq(in("table", StringType),
        inDefault("num_files", IntegerType, "0"),
        inDefault("zorder_by", StringType, "''"),
        inDefault("partitions", StringType, "''")),
      StructType(Seq(StructField("version", LongType))),
      (s, resolve, args) => {
        val zorder = args(2).asInstanceOf[String].split(",").toSeq
          .map(_.trim).filter(_.nonEmpty)
        val loc = resolve(args(0).asInstanceOf[String])
        val scoped = args(3).asInstanceOf[String].split(';').toSeq
          .map(_.trim).filter(_.nonEmpty)
          .map(_.split('/').toSeq.map { kv =>
            val i = kv.indexOf('=')
            require(i > 0, s"bad partition spec '$kv' — expected k=v")
            kv.take(i).trim -> kv.drop(i + 1).trim
          })
        val v =
          if (scoped.nonEmpty)
            VersionedTable.compactPartitions(s, loc, scoped, zorderBy = zorder,
              numFiles = args(1).asInstanceOf[Int])
          else VersionedTable.compact(s, loc, zorderBy = zorder,
            numFiles = args(1).asInstanceOf[Int])
        Seq(Seq(v))
      }),
    GraftProcedure("vacuum",
      "reclaim unreferenced and out-of-retention data dirs; returns deleted " +
        "paths; dry_run => 'true' only LISTS the victims (nothing deleted, " +
        "vacuum floor untouched)",
      Seq(in("table", StringType),
        inDefault("retention_hours", LongType, "168"),
        inDefault("orphan_grace_hours", LongType, "24"),
        inDefault("dry_run", StringType, "'false'")),
      StructType(Seq(StructField("deleted_path", StringType))),
      (s, resolve, args) => {
        VersionedTable.vacuum(s, resolve(args(0).asInstanceOf[String]),
            retentionMs = hours(args(1).asInstanceOf[Long]),
            orphanGraceMs = hours(args(2).asInstanceOf[Long]),
            dryRun = args(3).asInstanceOf[String].trim.toBoolean)
          .map(Seq(_))
      }),
    GraftProcedure("detail",
      "DESCRIBE DETAIL: one row of snapshot-level metadata (version, rows, " +
        "files, bytes, partitioning, constraints, live DV rows, borrowed " +
        "commits) - log + listing only, no data file opened",
      Seq(in("table", StringType)),
      StructType(Seq(StructField("location", StringType),
        StructField("version", LongType), StructField("operation", StringType),
        StructField("last_modified", StringType),
        StructField("num_rows", LongType), StructField("num_files", LongType),
        StructField("size_bytes", LongType),
        StructField("partition_columns", StringType),
        StructField("num_constraints", LongType),
        StructField("live_dv_rows", LongType),
        StructField("borrowed_commits", LongType))),
      (s, resolve, args) =>
        VersionedTable.detail(s, resolve(args(0).asInstanceOf[String]))
          .collect().toSeq.map(_.toSeq)),
    GraftProcedure("files",
      "per-file snapshot inventory: exactly the files the snapshot's plan " +
        "reads, attributed to their commit, with size and partition path " +
        "(version => -1 reads the head) - listing-only, no data file opened; " +
        "partition prefix-filters partition_path, and results past max_files " +
        "truncate with a loud TRUNCATED marker row (procedures return driver " +
        "rows - the cap is the guard for 10^7-file tables)",
      Seq(in("table", StringType), inDefault("version", LongType, "-1"),
        inDefault("partition", StringType, "''"),
        inDefault("max_files", LongType, "1000000")),
      StructType(Seq(StructField("commit_version", LongType),
        StructField("operation", StringType), StructField("file", StringType),
        StructField("size_bytes", LongType),
        StructField("partition_path", StringType))),
      (s, resolve, args) => {
        val v = args(1).asInstanceOf[Long]
        VersionedTable.files(s, resolve(args(0).asInstanceOf[String]),
            if (v < 0) None else Some(v),
            partitionPrefix = args(2).asInstanceOf[String].trim,
            maxFiles = args(3).asInstanceOf[Long])
          .collect().toSeq.map(_.toSeq)
      }),
    GraftProcedure("clone",
      "shallow clone: metadata-only table copy borrowing the source's files " +
        "by reference (optionally at a pinned version) — the clone diverges " +
        "independently; the SOURCE's vacuum is the only thing that can break " +
        "it (Delta's documented shallow-clone caveat)",
      Seq(in("table", StringType), in("target", StringType),
        inDefault("version", LongType, "-1")),
      StructType(Seq(StructField("version", LongType))),
      (s, resolve, args) => {
        val v = args(2).asInstanceOf[Long]
        Seq(Seq(VersionedTable.shallowClone(s,
          resolve(args(0).asInstanceOf[String]),
          resolve.fresh(args(1).asInstanceOf[String]),
          if (v < 0) None else Some(v))))
      }),
    GraftProcedure("set_nullable",
      "SET/DROP NOT NULL: nullable => 'false' validates the LIVE data, then " +
        "refuses null rows on every future write and flips the DSv2 schema " +
        "(Spark's analyzer refuses ALTER COLUMN ... SET NOT NULL on v2 " +
        "tables outright, so the SET direction rides this procedure; DROP " +
        "NOT NULL also works as plain SQL)",
      Seq(in("table", StringType), in("column", StringType),
        inDefault("nullable", StringType, "'false'")),
      StructType(Seq(StructField("column", StringType))),
      (s, resolve, args) => {
        VersionedTable.setColumnNullability(s,
          resolve(args(0).asInstanceOf[String]), args(1).asInstanceOf[String],
          args(2).asInstanceOf[String].trim.toBoolean)
        Seq(Seq(args(1)))
      }),
    GraftProcedure("restore",
      "roll the table back to a version as a new commit (history stays intact)",
      Seq(in("table", StringType), in("version", LongType)),
      StructType(Seq(StructField("version", LongType))),
      (s, resolve, args) => Seq(Seq(VersionedTable.restore(s,
        resolve(args(0).asInstanceOf[String]), args(1).asInstanceOf[Long])))),
    GraftProcedure("history",
      "DESCRIBE HISTORY: every commit, newest first",
      Seq(in("table", StringType)),
      StructType(Seq(StructField("version", LongType),
        StructField("timestamp", StringType), StructField("operation", StringType),
        StructField("row_count", LongType))),
      (s, resolve, args) =>
        VersionedTable.commits(s, resolve(args(0).asInstanceOf[String]))
          .sortBy(-_.version)
          .map(c => Seq(c.version, c.timestamp, c.operation, c.row_count))),
    GraftProcedure("fast_count",
      "live row count from commit metadata alone — zero files opened",
      Seq(in("table", StringType)),
      StructType(Seq(StructField("count", LongType))),
      (s, resolve, args) => Seq(Seq(VersionedTable.fastCount(s,
        resolve(args(0).asInstanceOf[String]))))),
    GraftProcedure("add_constraint",
      "declare a named CHECK constraint (validates live data, then gates every commit)",
      Seq(in("table", StringType), in("name", StringType), in("check_sql", StringType)),
      StructType(Seq(StructField("name", StringType))),
      (s, resolve, args) => {
        VersionedTable.addConstraint(s, resolve(args(0).asInstanceOf[String]),
          args(1).asInstanceOf[String], args(2).asInstanceOf[String])
        Seq(Seq(args(1)))
      }),
    GraftProcedure("drop_constraint",
      "drop a named CHECK constraint",
      Seq(in("table", StringType), in("name", StringType)),
      StructType(Seq(StructField("name", StringType))),
      (s, resolve, args) => {
        VersionedTable.dropConstraint(s, resolve(args(0).asInstanceOf[String]),
          args(1).asInstanceOf[String])
        Seq(Seq(args(1)))
      }),
    GraftProcedure("add_generated",
      "declare a GENERATED ALWAYS AS (expr) column: absent in a landing batch " +
        "→ computed; present → validated null-safe-equal, like a CHECK",
      Seq(in("table", StringType), in("name", StringType),
        in("gen_sql", StringType)),
      StructType(Seq(StructField("name", StringType))),
      (s, resolve, args) => {
        VersionedTable.addGeneratedColumn(s, resolve(args(0).asInstanceOf[String]),
          args(1).asInstanceOf[String], args(2).asInstanceOf[String])
        Seq(Seq(args(1)))
      }),
    GraftProcedure("add_identity",
      "declare a GENERATED ALWAYS AS IDENTITY column: the engine assigns it " +
        "on every landing batch (unique, monotone for the table's life); " +
        "order_within sorts each batch on the named columns for deterministic " +
        "assignment",
      Seq(in("table", StringType), in("name", StringType),
        inDefault("start", LongType, "0"),
        inDefault("step", LongType, "1"),
        inDefault("order_within", StringType, "''")),
      StructType(Seq(StructField("name", StringType))),
      (s, resolve, args) => {
        val order = args(4).asInstanceOf[String].split(",").toSeq
          .map(_.trim).filter(_.nonEmpty)
        VersionedTable.addIdentityColumn(s, resolve(args(0).asInstanceOf[String]),
          args(1).asInstanceOf[String], args(2).asInstanceOf[Long],
          args(3).asInstanceOf[Long], order)
        Seq(Seq(args(1)))
      }),
    GraftProcedure("maintain",
      "threshold-driven auto-OPTIMIZE: compact when the live commit count or " +
        "live deletion-vector rows cross their caps (both log-resolved, no data " +
        "read when nothing fires); returns the action taken",
      Seq(in("table", StringType),
        inDefault("max_live_commits", LongType, "16"),
        inDefault("max_dv_rows", LongType, "1000000"),
        inDefault("target_file_mb", LongType, "128")),
      StructType(Seq(StructField("action", StringType),
        StructField("version", LongType))),
      (s, resolve, args) => {
        val loc = resolve(args(0).asInstanceOf[String])
        val cs = VersionedTable.commits(s, loc)
        require(cs.nonEmpty, s"no commits at $loc")
        val live = cs.lastIndexWhere(_.isFullState) match {
          case i if i < 0 => cs
          case i => cs.drop(i)
        }
        val dvRows = live.filter(_.dv_dir.nonEmpty).map(_.replaced_rows).sum
        if (live.length > args(1).asInstanceOf[Long] ||
            dvRows > args(2).asInstanceOf[Long])
          Seq(Seq("compacted", VersionedTable.compactToFileSize(s, loc,
            targetFileBytes = args(3).asInstanceOf[Long] * 1024 * 1024)))
        else Seq(Seq("noop", cs.last.version))
      }),
    GraftProcedure("update_where",
      "merge-on-read UPDATE: SET assignments on matching rows via a deletion " +
        "vector + change-row append, no file rewritten ('col = expr, ...' syntax)",
      Seq(in("table", StringType), in("condition", StringType),
        in("assignments", StringType)),
      StructType(Seq(StructField("version", LongType))),
      (s, resolve, args) => {
        val sets = splitTopLevel(args(2).asInstanceOf[String]).map { a =>
          val i = a.indexOf('=')
          require(i > 0, s"bad assignment '$a' — expected 'col = expr, ...'")
          a.substring(0, i).trim -> a.substring(i + 1).trim
        }
        Seq(Seq(VersionedTable.updateWhere(s, resolve(args(0).asInstanceOf[String]),
          args(1).asInstanceOf[String], sets.toMap)))
      }),
    GraftProcedure("merge",
      "MERGE INTO: upsert (and optionally delete) the rows of a registered " +
        "view/table into the target, keyed on the given columns",
      Seq(in("table", StringType), in("source", StringType), in("keys", StringType),
        inDefault("delete_col", StringType, "''"),
        inDefault("change_feed", StringType, "'false'")),
      StructType(Seq(StructField("version", LongType))),
      (s, resolve, args) => {
        val keys = args(2).asInstanceOf[String].split(",").toSeq
          .map(_.trim).filter(_.nonEmpty)
        val deleteCol = Option(args(3).asInstanceOf[String]).map(_.trim)
          .filter(_.nonEmpty)
        Seq(Seq(VersionedTable.merge(s, resolve(args(0).asInstanceOf[String]),
          s.table(args(1).asInstanceOf[String]), keys, deleteCol,
          changeFeed = args(4).asInstanceOf[String].trim.toBoolean)))
      }),
    GraftProcedure("generate_manifest",
      "write the symlink manifest tree for log-blind external engines",
      Seq(in("table", StringType)),
      StructType(Seq(StructField("manifest_path", StringType))),
      (s, resolve, args) =>
        VersionedTable.generateManifest(s, resolve(args(0).asInstanceOf[String]))
          .map(Seq(_))),
    GraftProcedure("rebuild_index",
      "staleness actuator for the persisted ANN indexes: retrain from the " +
        "current corpus and overwrite the index artifacts (quality baseline " +
        "resets). location is the index ROOT PATH (indexes live outside the " +
        "warehouse), not a catalog table. kind => 'ivf' rebuilds from the " +
        "index's own retained vectors; kind => 'ivfpq' additionally needs " +
        "source => an embeddings view/table (codes are lossy). " +
        "nlist/m/ksub => 0 keep the persisted geometry",
      Seq(in("location", StringType), inDefault("kind", StringType, "'ivf'"),
        inDefault("source", StringType, "''"),
        inDefault("nlist", IntegerType, "0"),
        inDefault("m", IntegerType, "0"),
        inDefault("ksub", IntegerType, "0"),
        inDefault("iters", IntegerType, "4"),
        inDefault("batch_label", StringType, "'base'")),
      StructType(Seq(StructField("kind", StringType),
        StructField("location", StringType))),
      (s, resolve, args) => {
        val loc = args(0).asInstanceOf[String]
        val kind = args(1).asInstanceOf[String].trim.toLowerCase
        val src = args(2).asInstanceOf[String].trim
        val label = args(7).asInstanceOf[String]
        kind match {
          case "ivf" =>
            graft.ops.Ivf.rebuildIndex(s, loc, args(3).asInstanceOf[Int],
              args(6).asInstanceOf[Int], label)
          case "ivfpq" =>
            require(src.nonEmpty, "kind => 'ivfpq' needs source => an " +
              "embeddings view/table — PQ codes are lossy, the rebuild " +
              "cannot reconstruct its corpus")
            graft.ops.IvfPq.rebuildPqIndex(s.table(src), loc,
              args(3).asInstanceOf[Int], args(4).asInstanceOf[Int],
              args(5).asInstanceOf[Int], args(6).asInstanceOf[Int],
              batchLabel = label)
          case other => throw new IllegalArgumentException(
            s"unknown kind '$other' — expected 'ivf' or 'ivfpq'")
        }
        Seq(Seq(kind, loc))
      }),
    GraftProcedure("copy_into",
      "COPY INTO: idempotent file-granular bulk load — append every " +
        "not-yet-loaded file under `source` as one commit and remember it in " +
        "the ingest ledger, so re-running is a metadata-only no-op (version " +
        "-1); force => 'true' reloads everything; options => 'k=v,k2=v2'",
      Seq(in("table", StringType), in("source", StringType),
        inDefault("format", StringType, "'parquet'"),
        inDefault("pattern", StringType, "''"),
        inDefault("force", StringType, "'false'"),
        inDefault("options", StringType, "''")),
      StructType(Seq(StructField("version", LongType),
        StructField("files_loaded", LongType),
        StructField("rows_loaded", LongType),
        StructField("files_quarantined", LongType))),
      (s, resolve, args) => {
        val opts = splitTopLevel(args(5).asInstanceOf[String]).map { kv =>
          val i = kv.indexOf('=')
          require(i > 0, s"bad option '$kv' — expected 'k=v,k2=v2'")
          kv.take(i).trim -> kv.drop(i + 1).trim
        }.toMap
        val r = graft.catalog.CopyInto.copyInto(s,
          resolve(args(0).asInstanceOf[String]), args(1).asInstanceOf[String],
          args(2).asInstanceOf[String], opts, args(3).asInstanceOf[String],
          args(4).asInstanceOf[String].trim.toBoolean)
        Seq(Seq(r.version.getOrElse(-1L), r.filesLoaded, r.rowsLoaded,
          r.filesQuarantined))
      }))

  /** Split an assignment list on TOP-LEVEL commas only — `qty = greatest(qty,
    * 0), v = concat(a, ',')` is two assignments, not four: commas inside
    * parentheses/brackets or single/double/backtick quotes don't split
    * (backslash escapes respected inside quotes).
    */
  private[table] def splitTopLevel(s: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val cur = new StringBuilder
    var depth = 0
    var quote: Char = 0
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (quote != 0) {
        if (c == '\\' && i + 1 < s.length) { cur += c; i += 1; cur += s.charAt(i) }
        else { cur += c; if (c == quote) quote = 0 }
      } else c match {
        case '\'' | '"' | '`'   => quote = c; cur += c
        case '(' | '['          => depth += 1; cur += c
        case ')' | ']'          => depth -= 1; cur += c
        case ',' if depth == 0  => out += cur.toString; cur.clear()
        case _                  => cur += c
      }
      i += 1
    }
    out += cur.toString
    out.toSeq.map(_.trim).filter(_.nonEmpty)
  }

  val byName: Map[String, GraftProcedure] = all.map(p => p.procName -> p).toMap

  /** Bind a procedure definition into Spark's procedure API. Argument extraction
    * walks `params` by position (the analyzer has already reordered named args and
    * filled defaults); result rows convert to catalyst form for the LocalScan.
    */
  def unbound(p: GraftProcedure, resolve: TableResolver): UnboundProcedure =
    new UnboundProcedure {
      override def name(): String = p.procName
      override def description(): String = p.describe
      override def bind(inputType: StructType): BoundProcedure = new BoundProcedure {
        override def name(): String = p.procName
        override def description(): String = p.describe
        override def parameters(): Array[ProcedureParameter] = p.params.toArray
        override def isDeterministic: Boolean = false
        override def call(input: InternalRow): java.util.Iterator[Scan] = {
          val args = p.params.zipWithIndex.map { case (param, i) =>
            param.dataType() match {
              case StringType => input.getUTF8String(i).toString
              case LongType => input.getLong(i)
              case IntegerType => input.getInt(i)
              case dt => throw new IllegalStateException(s"unsupported param type $dt")
            }
          }
          // named so the LocalScan's own `rows()` member cannot shadow it (a
          // same-named local turns the override into a self-recursive loop)
          val resultRows = p.run(SparkSession.active, resolve, args).map { vals =>
            InternalRow.fromSeq(vals.map {
              case s: String => UTF8String.fromString(s)
              case other => other
            })
          }.toArray
          java.util.List.of[Scan](new LocalScan {
            override def rows(): Array[InternalRow] = resultRows
            override def readSchema(): StructType = p.resultSchema
            override def description(): String = s"graft.system.${p.procName}"
          }).iterator()
        }
      }
    }
}
