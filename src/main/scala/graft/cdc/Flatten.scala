package graft.cdc

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Debezium CDC envelope flattening + logical-type decoding.
  *
  * Reference: `curated/dq_kafka.py:148-165`, `mage-programs/data_quality.py:165-185`,
  * `mage-programs/delta_metadata.py:56-62` — pull the `after` payload out of the envelope;
  * `enriched/kafka-aggregation.py:14-17` — decode Debezium `io.debezium.time.Date`
  * (epoch-days int) with `date_add('1970-01-01', n)`.
  *
  * Spark-first notes: struct-field projection is a pure `Project` — Catalyst pushes the
  * nested-schema pruning into the scan (`spark.sql.optimizer.nestedSchemaPruning.enabled`
  * is default-on), so only `after.*` is read off disk even though the envelope carries
  * before/source/transaction. Everything here stays inside whole-stage codegen.
  */
object Flatten {

  /** `select(after.*)` if the frame is an envelope; pass through untouched otherwise —
    * mirrors the reference's defensive `if "after" in df.columns` (SURVEY.md §2.3 P8).
    */
  def after(df: DataFrame): DataFrame =
    if (df.columns.contains("after")) df.select(col("after.*")) else df

  /** Decode epoch-days int columns to DATE (Debezium io.debezium.time.Date). */
  def decodeEpochDays(df: DataFrame, cols: String*): DataFrame =
    cols.foldLeft(df)((d, c) =>
      d.withColumn(c, date_add(to_date(lit("1970-01-01")), col(c))))

  /** Full orders-path flatten: envelope → flat row with decoded order_date. */
  def ordersAfter(envelope: DataFrame): DataFrame =
    decodeEpochDays(after(envelope), "order_date")
}
