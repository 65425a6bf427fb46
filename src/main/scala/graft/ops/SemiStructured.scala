package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Semi-structured (JSON) column analytics.
  *
  * The reference carries free-form JSON through its pipeline as strings (the event
  * payloads produced by `streaming-source/topic_orders_streaming.py` and landed verbatim
  * by the consumer). Downstream analytics need typed access to those payloads without a
  * declared schema migration.
  *
  * Spark-first notes: `parse_json` → VARIANT is the engine-native path (Spark 4):
  * parse once, extract many — `variant_get` paths are evaluated against the binary
  * variant encoding, not by re-parsing text, and a VARIANT column written to parquet
  * keeps the shredded binary form. For fixed known fields, `from_json` with an explicit
  * schema stays the codegen-friendly alternative; both are per-row scan-speed work with
  * zero shuffle.
  */
object SemiStructured {

  /** Typed field off a JSON string column via the VARIANT path: parse once, extract by
    * JSON path. `targetType` is a DDL type string ("bigint", "string", "double", ...).
    */
  def jsonField(jsonCol: Column, path: String, targetType: String): Column =
    variant_get(parse_json(jsonCol), path, targetType)

  /** Project typed fields out of a JSON string column: one `parse_json`, N extractions.
    * `fields` maps output column name → (JSON path, DDL type).
    */
  def flattenJson(df: DataFrame, jsonCol: String,
      fields: Seq[(String, (String, String))]): DataFrame = {
    val v = parse_json(col(jsonCol))
    df.select(col("*") +: fields.map { case (name, (path, tpe)) =>
      variant_get(v, path, tpe).as(name)
    }: _*)
  }
}
