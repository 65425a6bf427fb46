package graft.sources.table

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{And, Attribute, AttributeReference, AttributeSet, EqualTo, Expression, Literal, Not, SubqueryExpression}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.functions.{col, count, expr, lit, monotonically_increasing_id, when}
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
  * Two execution shapes, chosen per statement:
  *  - FAST: the canonical CDC-apply shapes (`UPDATE SET *` full row [+ conditional
  *    DELETE + mirrored guarded `INSERT *`], INSERT-only, DELETE-only, all values
  *    source-only) run WITHOUT a dedicated target join — one change-volume-sized
  *    [[VersionedTable.mergeOnRead]] commit, the path whose cost tracks the change
  *    set at 100 TB.
  *  - GENERAL: everything else SQL MERGE can say within equality-keyed semantics —
  *    partial-row `UPDATE SET col = expr` (unset columns keep their target values),
  *    conditions and values referencing BOTH sides, any number of conditional
  *    INSERT branches (first-match-wins), and
  *    `WHEN NOT MATCHED BY SOURCE` UPDATE/DELETE (full-sync mirroring). The matched
  *    image is synthesized by joining source to target, coalescing unset columns
  *    from the target row, and the completed change set feeds the same
  *    merge-on-read commit. Cost = one extra src⋈tgt join over the fast path;
  *    the commit itself still writes only change volume.
  *
  * Remaining refusals (loud, naming the `CALL gsqlc.system.update_where/merge`
  * escape hatch — never a silent semantic drift): non-equi or differently-named ON
  * keys, subqueries, schema evolution, more than one UPDATE/DELETE per match group,
  * and NOT-MATCHED-BY-SOURCE rows whose merge keys are NULL (merge-on-read locates
  * rows by key; a NULL key cannot be re-located).
  *
  * Both shapes enforce the SQL MERGE cardinality rule: a target row matched by more
  * than one source row that would update or delete it raises
  * `MERGE_CARDINALITY_VIOLATION` (as Spark/Delta do) instead of silently duplicating
  * rows — merge-on-read DV-deletes the matched row once but would append every
  * change row.
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

  /** Column-name prefixes disambiguating target from source in the general
    * path's joined frame (target and source usually share column names).
    */
  private[table] val TgtPrefix = "__gr_t_"
  private[table] val SrcPrefix = "__gr_s_"

  /** Render a resolved expression as SQL over the PREFIXED joined frame:
    * target attributes become `__gr_t_<name>`, source ones `__gr_s_<name>` —
    * exprId identity is resolved here, at rule time, where the attribute sets
    * are known; the command replays the string with `expr()` later.
    */
  private[table] def sidedSql(e: Expression, tgtOut: AttributeSet,
      srcOut: AttributeSet): String =
    e.transform {
      case ar: AttributeReference if srcOut.contains(ar) =>
        ar.withQualifier(Seq.empty).withName(SrcPrefix + ar.name)
      case ar: AttributeReference if tgtOut.contains(ar) =>
        ar.withQualifier(Seq.empty).withName(TgtPrefix + ar.name)
    }.sql

  private[table] def cardinalityViolation(): Nothing =
    throw ColumnBridge.analysisError(
      "MERGE_CARDINALITY_VIOLATION: the MERGE ON condition matched a single " +
        "target row with multiple source rows that would update or delete it — " +
        "the target row would be operated on more than once. Deduplicate the " +
        "source on the merge keys first")
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

  /** One parsed WHEN branch: optional raw condition + assignments (empty for
    * DELETE). At most one UPDATE and one DELETE per match group; SQL's
    * first-match-wins ordering is folded into EFFECTIVE conditions
    * ([[effective]]) so the two are disjoint by construction.
    */
  private case class Act(isDelete: Boolean, cond: Option[Expression],
      sets: Seq[(String, Expression)])

  /** (update effective cond, update sets, delete effective cond) for an
    * ordered action list: action 2 applies only where action 1's condition
    * does not hold.
    */
  private def effective(acts: Seq[Act])
      : (Option[(Expression, Seq[(String, Expression)])], Option[Expression]) = {
    var upd: Option[(Expression, Seq[(String, Expression)])] = None
    var del: Option[Expression] = None
    var guard: Option[Expression] = None // NOT(conditions of earlier actions)
    acts.foreach { a =>
      val own = a.cond.getOrElse(Literal.TrueLiteral)
      val eff = guard.map(g => And(g, own)).getOrElse(own)
      if (a.isDelete) del = Some(eff) else upd = Some((eff, a.sets))
      guard = Some(guard.map(g => And(g, Not(own))).getOrElse(Not(own)))
    }
    (upd, del)
  }

  private def rewriteMerge(t: GraftSqlTable, m: MergeIntoTable): LogicalPlan = {
    // WITH SCHEMA EVOLUTION needs no handling here: GraftSqlTable advertises
    // AUTOMATIC_SCHEMA_EVOLUTION, so by the time the command resolves, the
    // analyzer already ADD-COLUMNed the source-only columns through the
    // catalog (metadata-only, archived) and re-resolved the merge against the
    // widened schema — the actions below simply see the evolved target.
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
    val keyNames = keys.map(_._1)
    val targetCols = m.targetTable.output.map(_.name)

    def assignPairs(as: Seq[Assignment], what: String): Seq[(String, Expression)] =
      as.map { a =>
        val name = a.key match {
          case ar: AttributeReference => ar.name
          case other => refuse("graft SQL MERGE supports top-level column " +
            s"assignments only, got ${other.sql}")
        }
        noSubquery(a.value, what)
        name -> a.value
      }

    // parse each WHEN group into ≤1 UPDATE + ≤1 DELETE, order preserved
    def parseActs(actions: Seq[MergeAction], group: String): Seq[Act] = {
      val acts = actions.map {
        case UpdateAction(cond, as, _) =>
          cond.foreach(noSubquery(_, "MERGE"))
          Act(isDelete = false, cond, assignPairs(as, s"$group UPDATE SET"))
        case DeleteAction(cond) =>
          cond.foreach(noSubquery(_, "MERGE"))
          Act(isDelete = true, cond, Nil)
        case other => refuse(s"graft SQL MERGE $group supports UPDATE and " +
          s"DELETE actions, got ${other.getClass.getSimpleName}")
      }
      if (acts.count(_.isDelete) > 1 || acts.count(!_.isDelete) > 1)
        refuse(s"graft SQL MERGE supports at most one UPDATE and one DELETE " +
          s"per $group group")
      acts
    }
    val matched = parseActs(m.matchedActions, "WHEN MATCHED")
    val nmbs = parseActs(m.notMatchedBySourceActions, "WHEN NOT MATCHED BY SOURCE")
    nmbs.foreach { a =>
      (a.cond.toSeq ++ a.sets.map(_._2)).foreach { e =>
        if (!e.references.subsetOf(tgtOut))
          refuse("graft SQL MERGE WHEN NOT MATCHED BY SOURCE may reference " +
            s"only TARGET columns, got ${e.sql}")
      }
    }
    // any number of INSERT branches, first-match-wins (SQL's multi-branch
    // WHEN NOT MATCHED form); each may carry a source-only condition
    val insert: Seq[(Option[Expression], Seq[(String, Expression)])] =
      m.notMatchedActions.map {
        case InsertAction(cond, as) =>
          (cond.toSeq ++ as.map(_.value)).foreach { e =>
            noSubquery(e, "MERGE")
            if (!e.references.subsetOf(srcOut))
              refuse("graft SQL MERGE INSERT may reference only SOURCE " +
                s"columns, got ${e.sql}")
          }
          (cond, assignPairs(as, "INSERT VALUES"))
        case other => refuse("graft SQL MERGE WHEN NOT MATCHED supports " +
          s"INSERT actions, got ${other.getClass.getSimpleName}")
      }
    if (matched.isEmpty && nmbs.isEmpty && insert.isEmpty)
      refuse("graft SQL MERGE needs at least one action")

    fastMerge(t, srcOut, keys, targetCols, matched, insert, m)
      .getOrElse(generalMerge(t, tgtOut, srcOut, keys, targetCols, matched,
        nmbs, insert, m))
  }

  /** The canonical single-pass shapes (no target join needed): full-row
    * source-only mirror upserts, insert-only, delete-only. Returns None — fall
    * through to the general path — for anything else.
    */
  private def fastMerge(t: GraftSqlTable, srcOut: AttributeSet,
      keys: Seq[(String, Expression)], targetCols: Seq[String],
      matched: Seq[Act],
      inserts: Seq[(Option[Expression], Seq[(String, Expression)])],
      m: MergeIntoTable): Option[LogicalPlan] = {
    if (m.notMatchedBySourceActions.nonEmpty || inserts.length > 1) return None
    val insert = inserts.headOption
    def srcOnly(e: Expression): Boolean = e.references.subsetOf(srcOut)
    val keyNames = keys.map(_._1)
    val mUpd = matched.find(!_.isDelete)
    val mDel = matched.find(_.isDelete)
    val deleteFirst = matched.headOption.exists(_.isDelete)

    (mUpd, mDel, insert) match {
      // [DELETE AND c]? + UPDATE SET * (full row, source-only, unconditional)
      // [+ INSERT mirroring SET, guarded by NOT(c)]
      case (Some(Act(_, None, sets)), del, ins)
          if sets.forall(p => srcOnly(p._2)) &&
            targetCols.forall(c => sets.exists(_._1.equalsIgnoreCase(c))) &&
            sets.size == targetCols.size &&
            del.forall(d => deleteFirst && d.cond.exists(srcOnly)) &&
            ins.forall { case (ic, is) =>
              val bySet = sets.toMap
              is.size == sets.size &&
                is.forall { case (n, e) =>
                  bySet.get(n).exists(_.semanticEquals(e)) } &&
                ((del.flatMap(_.cond), ic) match {
                  case (None, None) => true
                  case (Some(d), Some(c)) => c.semanticEquals(Not(d))
                  case _ => false
                })
            } =>
        Some(GraftMergeCommand(t.location, m.sourceTable, sets, keyNames,
          del.flatMap(_.cond), None,
          if (ins.isDefined) "upsert" else "matched_upsert"))
      // INSERT-only (any source-only condition)
      case (None, None, Some((ic, is)))
          if matched.isEmpty && ic.forall(srcOnly) =>
        Some(GraftMergeCommand(t.location, m.sourceTable, is, keyNames,
          None, ic, "insert_only"))
      // DELETE-only (source-only condition)
      case (None, Some(d), None) if d.cond.forall(srcOnly) =>
        Some(GraftMergeCommand(t.location, m.sourceTable, keys, keyNames,
          Some(d.cond.getOrElse(Literal.TrueLiteral)), None, "delete_only"))
      case _ => None
    }
  }

  /** Everything the fast path cannot express: render every condition and value
    * to SQL over the prefixed joined frame and hand the pieces to
    * [[GraftGeneralMergeCommand]], which synthesizes complete change rows.
    */
  private def generalMerge(t: GraftSqlTable, tgtOut: AttributeSet,
      srcOut: AttributeSet, keys: Seq[(String, Expression)],
      targetCols: Seq[String], matched: Seq[Act], nmbs: Seq[Act],
      inserts: Seq[(Option[Expression], Seq[(String, Expression)])],
      m: MergeIntoTable): LogicalPlan = {
    // prefixed source column names must be unambiguous
    val srcNames = m.sourceTable.output.map(_.name.toLowerCase)
    if (srcNames.distinct.size != srcNames.size)
      refuse("graft SQL MERGE source has duplicate column names — alias them")
    def sql(e: Expression): String = sidedSql(e, tgtOut, srcOut)
    def setsSql(sets: Seq[(String, Expression)]): Seq[(String, String)] =
      sets.map { case (n, e) => n -> sql(e) }
    val (mUpd, mDel) = effective(matched)
    val (nUpd, nDel) = effective(nmbs)
    // INSERT branches: fold first-match-wins into disjoint effective conds,
    // same scheme as effective()
    val insertEff = {
      var guard: Option[Expression] = None
      inserts.map { case (cond, sets) =>
        val own = cond.getOrElse(Literal.TrueLiteral)
        val eff = guard.map(g => And(g, own)).getOrElse(own)
        guard = Some(guard.map(g => And(g, Not(own))).getOrElse(Not(own)))
        (sql(eff), setsSql(sets))
      }
    }
    GraftGeneralMergeCommand(
      t.location, m.sourceTable,
      keys.map { case (n, e) =>
        n -> e.asInstanceOf[AttributeReference].name },
      targetCols,
      mUpd.map { case (c, s) => (sql(c), setsSql(s)) },
      mDel.map(sql),
      insertEff,
      nUpd.map { case (c, s) => (sql(c), setsSql(s)) },
      nDel.map(sql))
  }
}

/** Operation-metrics output shared by the SQL DML commands (the result set
  * Delta's UPDATE/MERGE return): change-row-granular counts — under duplicate
  * TARGET keys merge-on-read may remove more physical rows per updated key
  * than one (its documented key-based semantics); the counts report the
  * change set the statement produced.
  */
private[table] object DmlMetrics {
  def affectedOnly: Seq[Attribute] =
    Seq(AttributeReference("num_affected_rows",
      org.apache.spark.sql.types.LongType, nullable = false)())
  def mergeOutput: Seq[Attribute] =
    Seq("num_affected_rows", "num_updated_rows", "num_deleted_rows",
      "num_inserted_rows").map(n => AttributeReference(n,
        org.apache.spark.sql.types.LongType, nullable = false)())
  def mergeRow(updated: Long, deleted: Long, inserted: Long): Seq[Row] =
    Seq(Row(updated + deleted + inserted, updated, deleted, inserted))
}

/** SQL UPDATE → [[VersionedTable.updateWhere]] (deletion-vector merge-on-read
  * commit; no file rewritten). Empty effective SET (every assignment identity)
  * is a no-op, matching SQL. Returns `num_affected_rows` (Delta parity) —
  * free from the commit's logged DV row count, no extra job.
  */
case class GraftUpdateCommand(location: String, condition: String,
    sets: Map[String, String]) extends LeafRunnableCommand {
  // val, not def: fresh AttributeReferences per call would give the plan an
  // unstable output identity across repeated .output reads
  override val output: Seq[Attribute] = DmlMetrics.affectedOnly
  override def run(sparkSession: SparkSession): Seq[Row] = {
    val affected =
      if (sets.isEmpty) 0L
      else {
        val v = VersionedTable.updateWhere(sparkSession, location, condition, sets)
        VersionedTable.commits(sparkSession, location)
          .find(_.version == v).map(_.replaced_rows).getOrElse(0L)
      }
    Seq(Row(affected))
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

/** SQL MERGE INTO, fast shapes → the versioned-table merge paths. `columns`
  * maps each target column to its source-side expression (for `delete_only`,
  * just the keys); `mode` picks the commit path:
  *  - `upsert`         → [[VersionedTable.mergeOnRead]] (matched rows DV-deleted
  *                       + change rows appended; unmatched rows appended)
  *  - `matched_upsert` → same, with the change set pre-filtered (semi join) to
  *                       keys present in the target, so unmatched rows are
  *                       ignored as SQL requires when no INSERT branch exists
  *  - `insert_only`  → anti join against the target keys, then an append commit
  *  - `delete_only`  → delete-flagged keys through mergeOnRead (pure DV commit)
  *
  * All but `insert_only` enforce the MERGE cardinality rule first: duplicate
  * source keys that are PRESENT in the target (unmatched duplicates legally
  * insert twice) raise rather than silently duplicating rows. The guard's
  * steady-state cost is one change-set-sized aggregation; the target is only
  * probed when duplicates actually exist.
  */
case class GraftMergeCommand(location: String, source: LogicalPlan,
    columns: Seq[(String, Expression)], keys: Seq[String],
    deleteCond: Option[Expression], insertCond: Option[Expression],
    mode: String) extends LeafRunnableCommand {

  override val output: Seq[Attribute] = DmlMetrics.mergeOutput

  private val DelFlag = "_graft_sql_del"

  private def cardinalityGuard(spark: SparkSession, changes: DataFrame): Unit = {
    val dups = changes.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("__gr_n")).filter(col("__gr_n") > 1)
      .select(keys.map(col): _*)
    if (dups.limit(1).count() > 0) {
      val matchedDup = dups.join(
        VersionedTable.read(spark, location).select(keys.map(col): _*),
        keys, "left_semi").limit(1).count()
      if (matchedDup > 0) GraftRowLevelSql.cardinalityViolation()
    }
  }

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
        cardinalityGuard(sparkSession, changes)
        // metrics come FROM the merge (measured on its pinned matched set —
        // change-volume cost) rather than from a separate probe join, which
        // would rescan the target's key columns once per MERGE purely for
        // bookkeeping. inserts = staged rows minus matched CHANGE rows
        // (matchedUpsertKeys): every non-delete change row lands, matched as
        // the update image or unmatched as the insert — exact even when the
        // target holds duplicate-key rows, where `updated` (matched TARGET
        // rows) over-subtracts. DmlMetricsSpec pins the job parity.
        val (_, mm) = VersionedTable.mergeOnReadMetered(sparkSession, location,
          changes, keys, Some(DelFlag))
        DmlMetrics.mergeRow(updated = mm.updated, deleted = mm.deleted,
          inserted = mm.addedRows - mm.matchedUpsertKeys)
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
        val v = VersionedTable.write(full.join(tgt, keys, "left_anti"), location,
          "append", VersionedTable.declaredPartitioning(sparkSession, location))
        // inserted count is free from the append commit's logged row count
        DmlMetrics.mergeRow(updated = 0L, deleted = 0L,
          inserted = VersionedTable.commits(sparkSession, location)
            .find(_.version == v).map(_.row_count).getOrElse(0L))
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
        cardinalityGuard(sparkSession, full)
        val v = VersionedTable.mergeOnRead(sparkSession, location, full, keys,
          Some(DelFlag))
        // deleted count is free from the commit's logged DV rows
        DmlMetrics.mergeRow(updated = 0L,
          deleted = VersionedTable.commits(sparkSession, location)
            .find(_.version == v).map(_.replaced_rows).getOrElse(0L),
          inserted = 0L)
    }
  }
}

/** SQL MERGE INTO, general shape: synthesize COMPLETE change rows by joining
  * source to target, then commit through ONE [[VersionedTable.mergeOnRead]].
  * Every condition/value arrives as SQL over the PREFIXED joined frame
  * (`__gr_t_<col>` target image, `__gr_s_<col>` source row — rendered by the
  * rule where attribute identity is known).
  *
  * Change-set construction, all three branches disjoint by key:
  *  - MATCHED (src ⋈ tgt inner on keys): rows where the effective UPDATE or
  *    DELETE condition holds; updated rows take assigned values and COALESCE
  *    unset columns from the target image, deleted rows carry the delete flag.
  *    First-match-wins ordering was folded into the conditions at rule time,
  *    so update and delete never both apply. Rows matching neither condition
  *    produce NO change row (untouched).
  *  - NOT MATCHED (src anti tgt): INSERT branches evaluated first-match-wins
  *    over one anti join (a when-chain — the effective conditions are
  *    disjoint); unassigned columns are NULL, SQL's INSERT semantics.
  *  - NOT MATCHED BY SOURCE (tgt anti src): UPDATE/DELETE rows from the target
  *    image alone — the full-sync mirroring shape. Rows whose merge keys are
  *    NULL refuse loudly: merge-on-read re-locates rows BY KEY, and a NULL key
  *    row cannot be re-located (it would duplicate instead of update).
  *
  * The MERGE cardinality rule is enforced on the matched branch: a target row
  * with multiple source rows whose action conditions hold raises
  * MERGE_CARDINALITY_VIOLATION. Assigned values cast to the target column type
  * (SQL store-assignment), so a `SET int_col = s.long_expr` behaves as the
  * aligned assignment would.
  *
  * Scale shape: the joins are plain equality joins on the merge keys (AQE
  * broadcasts a small source), the matched branch is persisted once and reused
  * for the guard + change rows, and the commit stays change-volume-sized
  * (deletion vectors + appended change rows — no target file rewritten).
  */
case class GraftGeneralMergeCommand(location: String, source: LogicalPlan,
    keys: Seq[(String, String)], targetCols: Seq[String],
    matchedUpdate: Option[(String, Seq[(String, String)])],
    matchedDelete: Option[String],
    inserts: Seq[(String, Seq[(String, String)])],
    nmbsUpdate: Option[(String, Seq[(String, String)])],
    nmbsDelete: Option[String]) extends LeafRunnableCommand {

  override val output: Seq[Attribute] = DmlMetrics.mergeOutput

  private val DelFlag = "_graft_sql_del"
  private val Origin = "_graft_sql_origin" // 'u'pdate-able match, 'i'nsert
  import GraftRowLevelSql.{SrcPrefix, TgtPrefix}

  override def run(sparkSession: SparkSession): Seq[Row] = {
    val spark = sparkSession
    val src = ColumnBridge.ofRows(spark, source)
    val srcP = src.select(source.output.map(a =>
      ColumnBridge.column(a).as(SrcPrefix + a.name)): _*)
    val tgt = VersionedTable.read(spark, location)
    val tgtSchema = tgt.schema
    def tgtType(n: String) =
      tgtSchema.fields.find(_.name.equalsIgnoreCase(n)).getOrElse(
        throw ColumnBridge.analysisError(
          s"MERGE assigns unknown target column '$n' at $location")).dataType
    val tgtP = tgt.select(tgt.columns.toSeq.map(c => col(c).as(TgtPrefix + c)): _*)
    val joinCond = keys.map { case (tk, sk) =>
      col(TgtPrefix + tk) === col(SrcPrefix + sk) }.reduce(_ && _)
    val keyNames = keys.map(_._1)

    // value of target column n under an optional (cond, sets) action: assigned
    // expression (cast to the column type) where the action applies, else the
    // target image
    def image(action: Option[(String, Seq[(String, String)])],
        applies: org.apache.spark.sql.Column)(n: String) =
      action.flatMap(_._2.find(_._1.equalsIgnoreCase(n))) match {
        case Some((_, sqlExpr)) =>
          when(applies, expr(sqlExpr).cast(tgtType(n)))
            .otherwise(col(TgtPrefix + n)).as(n)
        case None => col(TgtPrefix + n).as(n)
      }

    val parts = Seq.newBuilder[DataFrame]
    // the matched branch is read twice (cardinality guard + change rows) —
    // pin it so the src⋈tgt join runs once; released after the commit
    var pinned: Option[DataFrame] = None

    if (matchedUpdate.isDefined || matchedDelete.isDefined) {
      val updC = matchedUpdate.map(p => expr(p._1)).getOrElse(lit(false))
      val delC = matchedDelete.map(expr).getOrElse(lit(false))
      // each target ROW gets a transient identity BEFORE the join: the
      // cardinality rule is per target row, not per key — a target
      // legitimately holding duplicate-key rows, all matched by ONE source
      // row, is valid SQL MERGE (each row updates once; the key-based apply
      // below lands one updated image per target row and retires every old
      // row of the key), while >1 ACTIONABLE source row on the same target
      // row is the genuine nondeterministic update MERGE must refuse. The id
      // is assigned once — `touched` is persisted before both consumers read
      // it — so grouping on it is self-consistent.
      val RowId = "__gr_tid"
      val touched = tgtP.withColumn(RowId, monotonically_increasing_id())
        .join(srcP, joinCond, "inner").filter(updC || delC)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      pinned = Some(touched)
      val dup = touched.groupBy(col(RowId))
        .agg(count(lit(1)).as("__gr_n")).filter(col("__gr_n") > 1)
        .limit(1).count()
      if (dup > 0) {
        touched.unpersist()
        GraftRowLevelSql.cardinalityViolation()
      }
      parts += touched.select(
        targetCols.map(image(matchedUpdate, updC)) :+ delC.as(DelFlag)
          :+ lit("m").as(Origin): _*)
    }

    if (inserts.nonEmpty) {
      // all INSERT branches ride ONE anti join: effective conditions are
      // disjoint (first-match-wins folded at rule time), so a when-chain
      // picks each row's branch and the filter keeps rows any branch takes
      val branchConds = inserts.map(b => expr(b._1))
      val unmatched = srcP
        .join(tgtP.select(keyNames.map(k => col(TgtPrefix + k)): _*),
          joinCond, "left_anti")
        .filter(branchConds.reduce(_ || _))
      parts += unmatched.select(
        targetCols.map { n =>
          inserts.zip(branchConds).foldRight(
              lit(null).cast(tgtType(n))) { case (((_, sets), c), els) =>
            val v = sets.find(_._1.equalsIgnoreCase(n))
              .map { case (_, s) => expr(s).cast(tgtType(n)) }
              .getOrElse(lit(null).cast(tgtType(n)))
            when(c, v).otherwise(els)
          }.as(n)
        } :+ lit(false).as(DelFlag) :+ lit("i").as(Origin): _*)
    }

    if (nmbsUpdate.isDefined || nmbsDelete.isDefined) {
      val updC = nmbsUpdate.map(p => expr(p._1)).getOrElse(lit(false))
      val delC = nmbsDelete.map(expr).getOrElse(lit(false))
      // the anti join's build side is the DISTINCT source keys — typically
      // tiny, but NOT hinted broadcast: an explicit hint is binding (AQE never
      // demotes it), so a full-sync statement with a huge source would force
      // an executor-OOM broadcast. AQE's runtime size check promotes the
      // small case to a broadcast join on its own.
      val stale = tgtP
        .join(srcP.select(keys.map { case (_, sk) => col(SrcPrefix + sk) }: _*)
            .dropDuplicates(),
          joinCond, "left_anti")
        .filter(updC || delC)
      // a NULL-keyed target row can be not-matched-by-source, but merge-on-read
      // cannot re-locate it by key — refuse rather than silently duplicate
      val nullKeyed = stale.filter(
        keyNames.map(k => col(TgtPrefix + k).isNull).reduce(_ || _))
        .limit(1).count()
      if (nullKeyed > 0)
        throw ColumnBridge.analysisError(
          "graft SQL MERGE WHEN NOT MATCHED BY SOURCE would update/delete " +
            s"rows whose merge keys (${keyNames.mkString(", ")}) are NULL — " +
            "merge-on-read locates rows by key and cannot express this; " +
            "DELETE/UPDATE those rows by a non-null predicate instead")
      parts += stale.select(
        targetCols.map(image(nmbsUpdate, updC)) :+ delC.as(DelFlag)
          :+ lit("m").as(Origin): _*)
    }

    val tagged = parts.result().reduce(_.unionByName(_))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // metrics: one aggregate over the (persisted) change set — matched
      // branches split update/delete by the flag, the insert branch counts
      // whole. The persist also saves the union a recompute under the commit.
      val m = tagged.agg(
        org.apache.spark.sql.functions.sum(
          when(col(Origin) === "m" && !col(DelFlag), 1L).otherwise(0L)),
        org.apache.spark.sql.functions.sum(
          when(col(Origin) === "m" && col(DelFlag), 1L).otherwise(0L)),
        org.apache.spark.sql.functions.sum(
          when(col(Origin) === "i", 1L).otherwise(0L))).head()
      def n(i: Int) = if (m.isNullAt(i)) 0L else m.getLong(i)
      VersionedTable.mergeOnRead(spark, location, tagged.drop(Origin), keyNames,
        Some(DelFlag))
      DmlMetrics.mergeRow(updated = n(0), deleted = n(1), inserted = n(2))
    } finally {
      tagged.unpersist()
      pinned.foreach(_.unpersist())
    }
  }
}
