package graft.dq

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.ops.Integrity

/** One data-quality check outcome. `metric_value` is a percentage for
  * completeness/accuracy/consistency and a row count for volume.
  */
final case class DqResult(
    table_name: String,
    check_type: String,
    target: String,
    metric_value: Double,
    status: String)

final case class DqSummary(
    total_checks: Long, passed: Long, failed: Long, timestamp: String)

final case class DqReport(summary: DqSummary, details: Seq[DqResult])

/** Fluent data-quality validator.
  *
  * Reference: `DataQualityValidator` at `curated/data_quality.py:31-126` (copies at
  * `curated/dq_kafka.py:34-133`, `mage-programs/data_quality.py:40-150`): completeness
  * (null% < 5), accuracy (invalid% < 1), consistency (orphan% < 1), volume bounds, JSON
  * report, all-PASS gate.
  *
  * Spark-first notes: the reference runs ONE SPARK JOB PER COLUMN/RULE
  * (`curated/data_quality.py:37,39` — a count per null-check). Here each check call is a
  * single fused aggregate job: `count(*)` plus one `sum(when(...))` per column/rule in one
  * pass over the data — at 100 TB that is 1 scan instead of N+1 scans. Thresholds are
  * parameterized with the reference's hard-coded defaults. The reference's unguarded
  * divide-by-zero on empty input (`curated/data_quality.py:43`) is guarded here: an empty
  * frame has 0% violations.
  */
final class DqValidator(
    val completenessThresholdPct: Double = 5.0,
    val accuracyThresholdPct: Double = 1.0,
    val consistencyThresholdPct: Double = 1.0) {

  private val buf = ArrayBuffer.empty[DqResult]

  private def pctStatus(pct: Double, threshold: Double): String =
    if (pct < threshold) "PASS" else "FAIL"

  /** Q1: per-column null percentage, PASS iff < threshold (default 5%).
    * Single fused aggregation over all columns.
    */
  def checkCompleteness(df: DataFrame, table: String, columns: Seq[String]): this.type = {
    val aggs = count(lit(1)).as("__total") +:
      columns.map(c => sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__n_$c"))
    val row = df.agg(aggs.head, aggs.tail: _*).first()
    val total = row.getLong(0)
    columns.zipWithIndex.foreach { case (c, i) =>
      val nulls = if (row.isNullAt(i + 1)) 0L else row.getLong(i + 1)
      val pct = if (total == 0L) 0.0 else 100.0 * nulls / total
      buf += DqResult(table, "completeness", c, pct,
        pctStatus(pct, completenessThresholdPct))
    }
    this
  }

  /** Q2: per-rule invalid percentage (count of rows violating the predicate), PASS iff
    * < threshold (default 1%). Rows where the rule evaluates to NULL are not violations
    * (reference `filter(~rule)` drops them). Single fused aggregation over all rules.
    */
  def checkAccuracy(df: DataFrame, table: String, rules: Seq[(String, Column)]): this.type = {
    val aggs = count(lit(1)).as("__total") +:
      rules.map { case (n, rule) => sum(when(!rule, 1L).otherwise(0L)).as(s"__n_$n") }
    val row = df.agg(aggs.head, aggs.tail: _*).first()
    val total = row.getLong(0)
    rules.zipWithIndex.foreach { case ((n, _), i) =>
      val invalid = if (row.isNullAt(i + 1)) 0L else row.getLong(i + 1)
      val pct = if (total == 0L) 0.0 else 100.0 * invalid / total
      buf += DqResult(table, "accuracy", n, pct, pctStatus(pct, accuracyThresholdPct))
    }
    this
  }

  /** Q3: referential integrity — orphan percentage via left-anti join, PASS iff
    * < threshold (default 1%).
    */
  def checkConsistency(
      facts: DataFrame, factsTable: String,
      dimension: DataFrame, dimensionTable: String,
      key: Seq[String]): this.type = {
    val total = facts.count()
    val orphans = Integrity.orphanCount(facts, dimension, key)
    val pct = if (total == 0L) 0.0 else 100.0 * orphans / total
    buf += DqResult(factsTable, "consistency",
      s"${key.mkString(",")}->$dimensionTable", pct,
      pctStatus(pct, consistencyThresholdPct))
    this
  }

  /** Q1+Q2+Q4 fused ACROSS check types: every completeness column, accuracy rule, and
    * the volume bound for ONE table in a single aggregate job — one scan where chained
    * `checkCompleteness(...).checkAccuracy(...).checkVolume(...)` pays three. The
    * results are appended in exactly the order the chained calls would produce, so a
    * caller can swap a chain for `checkAll` without its report changing. Consistency
    * (Q3) stays separate — it is a join against a second table, not a scan of this one.
    */
  def checkAll(
      df: DataFrame, table: String,
      completenessColumns: Seq[String] = Nil,
      accuracyRules: Seq[(String, Column)] = Nil,
      volumeBounds: Option[(Long, Long)] = None): this.type = {
    val aggs = count(lit(1)).as("__total") +:
      (completenessColumns.map(c =>
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__null_$c")) ++
        accuracyRules.map { case (n, rule) =>
          sum(when(!rule, 1L).otherwise(0L)).as(s"__bad_$n") })
    val row = df.agg(aggs.head, aggs.tail: _*).first()
    val total = row.getLong(0)
    def at(i: Int): Long = if (row.isNullAt(i)) 0L else row.getLong(i)
    def pct(n: Long): Double = if (total == 0L) 0.0 else 100.0 * n / total
    completenessColumns.zipWithIndex.foreach { case (c, i) =>
      val p = pct(at(i + 1))
      buf += DqResult(table, "completeness", c, p,
        pctStatus(p, completenessThresholdPct))
    }
    accuracyRules.zipWithIndex.foreach { case ((n, _), i) =>
      val p = pct(at(completenessColumns.size + i + 1))
      buf += DqResult(table, "accuracy", n, p, pctStatus(p, accuracyThresholdPct))
    }
    volumeBounds.foreach { case (minRows, maxRows) =>
      val status = if (total >= minRows && total <= maxRows) "PASS" else "FAIL"
      buf += DqResult(table, "volume", "rows", total.toDouble, status)
    }
    this
  }

  /** Q4: row count within [minRows, maxRows]. `metric_value` is the count. */
  def checkVolume(df: DataFrame, table: String, minRows: Long, maxRows: Long): this.type = {
    val n = df.count()
    val status = if (n >= minRows && n <= maxRows) "PASS" else "FAIL"
    buf += DqResult(table, "volume", "rows", n.toDouble, status)
    this
  }

  def results: Seq[DqResult] = buf.toSeq

  /** Q6 gate condition: every accumulated check passed. */
  def passed: Boolean = buf.forall(_.status == "PASS")

  /** Q5: report document — summary + details (reference shape,
    * `curated/data_quality.py:108-126`).
    */
  def report(timestamp: String = java.time.Instant.now().toString): DqReport =
    DqReport(
      DqSummary(buf.size.toLong, buf.count(_.status == "PASS").toLong,
        buf.count(_.status == "FAIL").toLong, timestamp),
      buf.toSeq)
}

object DqValidator {

  /** Q6: all-PASS → curated parquet write (optionally partitioned); any FAIL → JSON
    * quarantine (reference `curated/data_quality.py:169-175`). Returns true when curated.
    */
  def gate(
      df: DataFrame,
      validator: DqValidator,
      curatedPath: String,
      quarantinePath: String,
      partitionColumns: Seq[String] = Nil,
      versioned: Boolean = false): Boolean =
    gateCounted(df, validator, curatedPath, quarantinePath, partitionColumns,
      versioned)._1

  /** [[gate]] that also returns how many rows the branch wrote (curated on pass,
    * quarantined on fail). The count rides the write via observe() — callers logging
    * layer row counts need neither a read-back scan nor any assumption about which
    * check ran last.
    */
  def gateCounted(
      df: DataFrame,
      validator: DqValidator,
      curatedPath: String,
      quarantinePath: String,
      partitionColumns: Seq[String] = Nil,
      versioned: Boolean = false): (Boolean, Long) = {
    val obs = org.apache.spark.sql.Observation()
    val observed = df.observe(obs, count(lit(1)).as("rows"))
    if (validator.passed) {
      // versioned: the curated layer becomes a time-travelable VersionedTable —
      // each gate pass is one overwrite commit, so yesterday's curated state stays
      // readable as-of its version (Delta-parity for the pipeline tables)
      if (versioned)
        graft.catalog.VersionedTable.write(observed, curatedPath, "overwrite",
          partitionColumns)
      else {
        val w = observed.write.mode("overwrite")
        (if (partitionColumns.nonEmpty) w.partitionBy(partitionColumns: _*) else w)
          .parquet(curatedPath)
      }
      (true, obs.get("rows").asInstanceOf[Long])
    } else {
      observed.write.mode("overwrite").json(quarantinePath)
      (false, obs.get("rows").asInstanceOf[Long])
    }
  }

  /** Serialize a report to a single JSON file (reference writes one object to S3,
    * `curated/data_quality.py:118-125`).
    */
  def writeReport(spark: org.apache.spark.sql.SparkSession, r: DqReport, path: String): Unit = {
    import spark.implicits._
    Seq(r).toDS.coalesce(1).write.mode("overwrite").json(path)
  }
}
