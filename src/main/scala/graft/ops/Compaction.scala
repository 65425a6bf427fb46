package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Column

/** Latest-record-per-key compaction (CDC upsert semantics).
  *
  * Reference: `enriched/custome_lifetime_value.py:1-2` imports `Window` + `row_number` for
  * exactly this (latest record per customer) but never calls them (SURVEY.md §2.6 W1); this
  * is the operator the reference intended — required to collapse a CDC change stream to
  * current state before gold aggregation.
  *
  * Spark-first notes: `row_number` over (key, ordered by version desc) is a single hash
  * shuffle on the key — the same exchange a groupBy would need, no extra passes. Tie-break
  * columns make the result deterministic under any partitioning. At scale this beats
  * `groupBy(key).agg(max_by(...))` when whole-row payloads are wide, because the window
  * avoids building max_by structs per column; with AQE skewed keys are split automatically.
  */
object Compaction {

  /** Keep the single latest row per `key`, ordered by `version` columns descending
    * (first column is the primary version, remaining are deterministic tie-breaks).
    */
  def latestPerKey(df: DataFrame, key: Seq[String], versionDesc: Seq[String]): DataFrame = {
    val w = Window
      .partitionBy(key.map(col): _*)
      .orderBy(versionDesc.map(c => col(c).desc): _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }
}
