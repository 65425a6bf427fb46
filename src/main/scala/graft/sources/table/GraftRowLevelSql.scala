package graft.sources.table

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{And, Attribute, AttributeReference, EqualTo, Expression, Literal, Not, SubqueryExpression}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.graft.ColumnBridge

import graft.catalog.VersionedTable

/** Native SQL `UPDATE ... SET` and `MERGE INTO` against graft catalog tables.
  *
  * Spark's analyzer rewrites row-level commands only for connectors implementing
  * `SupportsRowLevelOperations`, whose delta protocol hands per-row operations to an
  * EXECUTOR-side `DeltaWriter` — a second, parallel write path to the driver-orchestrated
  * commit protocol this table already has (staged DataFrame writes + deletion vectors +
  * optimistic log claims, [[VersionedTable.updateWhere]]/[[VersionedTable.mergeOnRead]]).
  * Rather than duplicate that machinery behind Spark's `WriteDelta` plans, a post-hoc
  * resolution rule (the sanctioned `SparkSessionExtensions` seam) translates the RESOLVED
  * `UpdateTable`/`MergeIntoTable` command into the existing merge-on-read commit paths —
  * one implementation serves the Scala API, the `CALL` procedures, and plain SQL. The
  * rule runs before `CheckAnalysis`, so the "table does not support UPDATE" refusal for
  * non-row-level DSv2 tables never fires for graft tables.
  *
  * Deliberately scoped (anything outside refuses LOUDLY, naming the
  * `CALL gsqlc.system.update_where/merge` escape hatch — never a silent semantic drift):
  *  - UPDATE: top-level column assignments; condition/values may not carry subqueries.
  *  - MERGE: condition = conjunction of `target.k = source.k` equalities; actions from
  *    the canonical shapes (`UPDATE SET` full row [+ conditional DELETE], `INSERT`,
  *    DELETE-only), every value referencing only SOURCE columns. When a conditional
  *    DELETE is present the INSERT branch must carry `AND NOT (<delete cond>)` verbatim —
  *    merge-on-read never inserts an unmatched delete-marked row, and SQL's
  *    unconditional INSERT would.
  */
object GraftRowLevelSql {

  /** The graft table under a (possibly aliased) DSv2 relation; None for a
    * time-travel relation — row-level SQL mutates only the current snapshot.
    */
  def graftTarget(plan: LogicalPlan): Option[GraftSqlTable] =
    plan.collectFirst { case r: DataSourceV2Relation => r.table }.collect {
      case t: GraftSqlTable if t.asOfVersion.isEmpty => t
    }

  private[table] def refuse(msg: String): Nothing =
    throw ColumnBridge.analysisError(msg + " (the CALL gsqlc.system.update_where/" +
      "merge procedures and the Scala VersionedTable API cover the general forms)")

  private[table] def noSubquery(e: Expression, what: String): Unit =
    if (e.exists(_.isInstanceOf[SubqueryExpression]))
      refuse(s"graft SQL $what does not support subqueries")

  private[table] def splitAnd(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitAnd(l) ++ splitAnd(r)
    case other => Seq(other)
  }

  /** Render a resolved expression as SQL over the TABLE's own frame: resolved
    * attributes carry the catalog-qualified name (`` `gsqlc`.`ns`.`t`.`col` ``),
    * which cannot re-resolve against the snapshot DataFrame — strip qualifiers.
    */
  private[table] def bareSql(e: Expression): String =
    e.transform {
      case ar: AttributeReference => ar.withQualifier(Seq.empty)
    }.sql
}

/** Post-hoc resolution rule: `UpdateTable`/`MergeIntoTable` over a graft catalog
  * table → a runnable command delegating to the versioned-table commit paths.
  */
class GraftRowLevelSqlRule(session: SparkSession) extends Rule[LogicalPlan] {
  import GraftRowLevelSql._

  override def apply(plan: LogicalPlan): LogicalPlan = plan match {
    case u: UpdateTable if u.resolved =>
      graftTarget(u.table).map(t => rewriteUpdate(t, u)).getOrElse(u)
    case m: MergeIntoTable if m.resolved =>
      graftTarget(m.targetTable).map(t => rewriteMerge(t, m)).getOrElse(m)
    // a DELETE whose condition pushed down as source filters became
    // DeleteFromTableWithFilters in the main resolution batch (the
    // SupportsDelete fast path — untouched here); one still standing at
    // post-hoc time has an UNPUSHABLE condition (expressions, functions) that
    // would otherwise fail CheckAnalysis — the DV path evaluates any
    // deterministic predicate, so route it there
    case d: DeleteFromTable if d.resolved =>
      graftTarget(d.table).map { t =>
        noSubquery(d.condition, "DELETE")
        GraftDeleteCommand(t.location, bareSql(d.condition)): LogicalPlan
      }.getOrElse(d)
    case _ => plan
  }

  private def rewriteUpdate(t: GraftSqlTable, u: UpdateTable): LogicalPlan = {
    u.condition.foreach(noSubquery(_, "UPDATE"))
    val sets = u.assignments.flatMap { a =>
      val name = a.key match {
        case ar: AttributeReference => ar.name
        case other => refuse("graft SQL UPDATE supports top-level column " +
          s"assignments only, got ${other.sql}")
      }
      // assignment alignment maps unset columns to themselves — identity
      // assignments are no-ops, not rewrites
      if (a.value.semanticEquals(a.key)) None
      else { noSubquery(a.value, "UPDATE"); Some(name -> bareSql(a.value)) }
    }
    GraftUpdateCommand(t.location, u.condition.map(bareSql).getOrElse("TRUE"),
      sets.toMap)
  }

  private def rewriteMerge(t: GraftSqlTable, m: MergeIntoTable): LogicalPlan = {
    if (m.withSchemaEvolution)
      refuse("graft SQL MERGE does not support WITH SCHEMA EVOLUTION")
    if (m.notMatchedBySourceActions.nonEmpty)
      refuse("graft SQL MERGE does not support WHEN NOT MATCHED BY SOURCE")
    val tgtOut = m.targetTable.outputSet
    val srcOut = m.sourceTable.outputSet
    noSubquery(m.mergeCondition, "MERGE")

    // ON clause → upsert keys: target.k = source.k conjuncts, same column name
    // on both sides (the key IS the identity both engines join on)
    val keys: Seq[(String, Expression)] = splitAnd(m.mergeCondition).map {
      case EqualTo(l: AttributeReference, r: AttributeReference)
          if tgtOut.contains(l) && srcOut.contains(r) => (l.name, r)
      case EqualTo(l: AttributeReference, r: AttributeReference)
          if tgtOut.contains(r) && srcOut.contains(l) => (r.name, l)
      case other => refuse("graft SQL MERGE requires ON to be a conjunction of " +
        s"target.key = source.key equalities, got ${other.sql}")
    }
    keys.foreach { case (n, e) =>
      e match {
        case ar: AttributeReference if ar.name.equalsIgnoreCase(n) => ()
        case _ => refuse(s"graft SQL MERGE key '$n' must join a same-named " +
          "source column")
      }
    }

    def sourceOnly(e: Expression, what: String): Unit = {
      noSubquery(e, "MERGE")
      if (!e.references.subsetOf(srcOut))
        refuse(s"graft SQL MERGE $what may reference only SOURCE columns, " +
          s"got ${e.sql}")
    }
    // assignment list → (target column -> source-side expression), refusing
    // partial row updates (merge-on-read replaces whole rows; a partial SET
    // surfaces as identity assignments referencing TARGET columns)
    def assignPairs(as: Seq[Assignment], what: String): Seq[(String, Expression)] =
      as.map { a =>
        val name = a.key match {
          case ar: AttributeReference => ar.name
          case other => refuse("graft SQL MERGE supports top-level column " +
            s"assignments only, got ${other.sql}")
        }
        sourceOnly(a.value, s"$what of '$name' — partial-row SET keeps target " +
          "values, which merge-on-read cannot express; assign every column " +
          "(UPDATE SET *)")
        name -> a.value
      }

    var update: Option[Seq[(String, Expression)]] = None
    var deleteCond: Option[Expression] = None
    m.matchedActions match {
      case Seq() => ()
      case Seq(UpdateAction(None, as, _)) => update = Some(assignPairs(as, "SET"))
      case Seq(DeleteAction(cond)) =>
        cond.foreach(sourceOnly(_, "matched DELETE condition"))
        deleteCond = Some(cond.getOrElse(Literal.TrueLiteral))
      case Seq(DeleteAction(Some(c)), UpdateAction(None, as, _)) =>
        sourceOnly(c, "matched DELETE condition")
        deleteCond = Some(c); update = Some(assignPairs(as, "SET"))
      case other => refuse("graft SQL MERGE supports WHEN MATCHED action shapes " +
        "[UPDATE SET], [DELETE], [DELETE AND <cond> + UPDATE SET], got " +
        other.map(_.getClass.getSimpleName).mkString(", "))
    }
    var insert: Option[Seq[(String, Expression)]] = None
    var insertCond: Option[Expression] = None
    m.notMatchedActions match {
      case Seq() => ()
      case Seq(InsertAction(cond, as)) =>
        cond.foreach(sourceOnly(_, "INSERT condition"))
        insert = Some(assignPairs(as, "INSERT value")); insertCond = cond
      case other => refuse("graft SQL MERGE supports at most one unconditional-" +
        "shape WHEN NOT MATCHED THEN INSERT action, got " +
        other.map(_.getClass.getSimpleName).mkString(", "))
    }

    val targetCols = m.targetTable.output.map(_.name)
    (update, insert) match {
      case (Some(up), ins) =>
        // merge-on-read replaces whole rows: the SET must cover every target
        // column (a partial SET would silently null the rest)
        val missing = targetCols.filterNot(c =>
          up.exists(_._1.equalsIgnoreCase(c)))
        if (missing.nonEmpty)
          refuse("graft SQL MERGE must assign every target column " +
            "(merge-on-read replaces whole rows; use UPDATE SET *) — missing " +
            missing.mkString(", "))
        // upsert: one merge-on-read call serves matched-update + unmatched-insert.
        // INSERT values must mirror the SET values column-for-column — one change
        // row feeds both branches
        ins.foreach { ia =>
          val bySet = up.toMap
          val mismatch = ia.filterNot { case (n, e) =>
            bySet.get(n).exists(_.semanticEquals(e)) }
          if (mismatch.nonEmpty || ia.size != up.size)
            refuse("graft SQL MERGE INSERT values must mirror the UPDATE SET " +
              s"values column-for-column (INSERT *), differs on " +
              mismatch.map(_._1).mkString(", "))
        }
        // merge-on-read never inserts an unmatched delete-marked row; SQL's
        // unconditional INSERT would — require the guard spelled out. The
        // check only applies when an INSERT branch EXISTS: the matched-only
        // CDC shape (DELETE AND cond + UPDATE, no INSERT) needs no guard
        if (ins.isDefined) (deleteCond, insertCond) match {
          case (None, None) => ()
          case (None, Some(c)) => refuse("graft SQL MERGE with a conditional " +
            s"INSERT (${c.sql}) diverges from merge-on-read semantics — drop " +
            "the condition")
          case (Some(d), Some(c)) if c.semanticEquals(Not(d)) => ()
          case (Some(d), _) => refuse("graft SQL MERGE with a conditional " +
            "DELETE must guard the INSERT with AND NOT (" + d.sql + ") so " +
            "unmatched delete-marked rows do not insert")
        }
        // without an INSERT branch, unmatched source rows must be IGNORED
        // (SQL) — merge-on-read would insert them, so the matched_ mode
        // pre-filters the change set to keys present in the target
        GraftMergeCommand(t.location, m.sourceTable, up, keys.map(_._1),
          deleteCond, None, if (ins.isDefined) "upsert" else "matched_upsert")
      case (None, Some(ia)) =>
        deleteCond.foreach(_ => refuse("graft SQL MERGE cannot combine a " +
          "matched DELETE with INSERT but no UPDATE"))
        GraftMergeCommand(t.location, m.sourceTable, ia, keys.map(_._1),
          None, insertCond, "insert_only")
      case (None, None) if deleteCond.isDefined =>
        GraftMergeCommand(t.location, m.sourceTable, keys, keys.map(_._1),
          deleteCond, None, "delete_only")
      case _ => refuse("graft SQL MERGE needs at least one action")
    }
  }
}

/** SQL UPDATE → [[VersionedTable.updateWhere]] (deletion-vector merge-on-read
  * commit; no file rewritten). Empty effective SET (every assignment identity)
  * is a no-op, matching SQL.
  */
case class GraftUpdateCommand(location: String, condition: String,
    sets: Map[String, String]) extends LeafRunnableCommand {
  override def output: Seq[Attribute] = Seq.empty
  override def run(sparkSession: SparkSession): Seq[Row] = {
    if (sets.nonEmpty)
      VersionedTable.updateWhere(sparkSession, location, condition, sets)
    Seq.empty
  }
}

/** SQL DELETE with a condition the filter API cannot express →
  * [[VersionedTable.deleteWhere]] (deletion-vector commit; the snapshot filter
  * evaluates the full expression, not just source filters).
  */
case class GraftDeleteCommand(location: String, condition: String)
  extends LeafRunnableCommand {
  override def output: Seq[Attribute] = Seq.empty
  override def run(sparkSession: SparkSession): Seq[Row] = {
    VersionedTable.deleteWhere(sparkSession, location, condition)
    Seq.empty
  }
}

/** SQL MERGE INTO → the versioned-table merge paths. `columns` maps each target
  * column to its source-side expression (for `delete_only`, just the keys);
  * `mode` picks the commit path:
  *  - `upsert`         → [[VersionedTable.mergeOnRead]] (matched rows DV-deleted
  *                       + change rows appended; unmatched rows appended)
  *  - `matched_upsert` → same, with the change set pre-filtered (semi join) to
  *                       keys present in the target, so unmatched rows are
  *                       ignored as SQL requires when no INSERT branch exists
  *  - `insert_only`  → anti join against the target keys, then an append commit
  *  - `delete_only`  → delete-flagged keys through mergeOnRead (pure DV commit)
  */
case class GraftMergeCommand(location: String, source: LogicalPlan,
    columns: Seq[(String, Expression)], keys: Seq[String],
    deleteCond: Option[Expression], insertCond: Option[Expression],
    mode: String) extends LeafRunnableCommand {

  override def output: Seq[Attribute] = Seq.empty

  private val DelFlag = "_graft_sql_del"

  override def run(sparkSession: SparkSession): Seq[Row] = {
    val src = ColumnBridge.ofRows(sparkSession, source)
    mode match {
      case "upsert" | "matched_upsert" =>
        val flag = deleteCond.map(ColumnBridge.column).getOrElse(lit(false))
        val changes0 = src.select(columns.map { case (n, e) =>
          ColumnBridge.column(e).as(n) } :+ flag.as(DelFlag): _*)
        val changes =
          if (mode == "upsert") changes0
          else changes0.join(VersionedTable.read(sparkSession, location)
            .select(keys.map(col): _*), keys, "left_semi")
        VersionedTable.mergeOnRead(sparkSession, location, changes, keys,
          Some(DelFlag))
      case "insert_only" =>
        val pre = insertCond.map(c => src.filter(ColumnBridge.column(c)))
          .getOrElse(src)
        val proj = pre.select(columns.map { case (n, e) =>
          ColumnBridge.column(e).as(n) }: _*)
        // SQL fills unassigned columns with NULL on INSERT
        val tableSchema = VersionedTable.read(sparkSession, location).schema
        val full = tableSchema.fields.foldLeft(proj) { (d, f) =>
          if (d.columns.exists(_.equalsIgnoreCase(f.name))) d
          else d.withColumn(f.name, lit(null).cast(f.dataType))
        }
        val tgt = VersionedTable.read(sparkSession, location)
          .select(keys.map(col): _*)
        VersionedTable.write(full.join(tgt, keys, "left_anti"), location,
          "append", VersionedTable.declaredPartitioning(sparkSession, location))
      case "delete_only" =>
        // full table schema with nulls outside the keys — only the DV entries
        // land, but the staged (empty) upsert write needs the table's columns
        val tableCols = VersionedTable.read(sparkSession, location).schema
        val keyed = src.filter(deleteCond.map(ColumnBridge.column)
          .getOrElse(lit(true)))
          .select(columns.map { case (n, e) => ColumnBridge.column(e).as(n) }: _*)
        val full = tableCols.fields.foldLeft(keyed) { (d, f) =>
          if (d.columns.exists(_.equalsIgnoreCase(f.name))) d
          else d.withColumn(f.name, lit(null).cast(f.dataType))
        }.withColumn(DelFlag, lit(true))
        VersionedTable.mergeOnRead(sparkSession, location, full, keys,
          Some(DelFlag))
    }
    Seq.empty
  }
}
