package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join: for every left row, the single latest right row of the
  * same key with `right.ts <= left.ts` — the canonical enrichment for event streams
  * against slowly-changing facts. Spark has no native operator for this.
  *
  * Implementation is the union + running-`last` technique, NOT a range join:
  * tag both sides, union them, and run `last(payload, ignoreNulls)` over
  * (key ORDER BY ts, side) — right rows sort before left rows at equal timestamps, so
  * each left row sees exactly the most recent right payload. ONE hash shuffle on the
  * key, no O(|L|·|R|) range-condition explosion, no per-key driver loops; skewed keys
  * split fine under AQE because the window is a plain sort within partitions.
  *
  * Right rows must be unique per (key, ts) — pre-compact with
  * [[Compaction.latestPerKey]] or an aggregate when they are not.
  */
object AsOfJoin {

  def asOf(
      left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTs: String, rightTs: String,
      payload: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val l = left
      .withColumn("__key", col(leftKey))
      .withColumn("__ts", col(leftTs))
      .withColumn("__side", lit(1))
    // carry the payload as ONE struct so `last(ignoreNulls)` picks whole right rows:
    // per-column carries would resurrect stale values for legitimately-NULL fields and
    // could stitch together a composite row that never existed
    val r = right
      .select(col(rightKey).as("__key"), col(rightTs).as("__ts"),
        lit(0).as("__side"),
        struct(payload.map(col): _*).as("__payload"))
    val unioned = l.unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(col("__key"))
      .orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = unioned.withColumn("__matched",
      last(col("__payload"), ignoreNulls = true).over(w))
    carried
      .filter(col("__side") === 1)
      .select((leftCols.map(col) ++ payload.map(p => col(s"__matched.$p").as(p))): _*)
  }
}
