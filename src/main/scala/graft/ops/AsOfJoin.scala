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
    val r = right
      .select((Seq(col(rightKey).as("__key"), col(rightTs).as("__ts"),
        lit(0).as("__side")) ++ payload.map(p => col(p).as(s"__p_$p"))): _*)
    val unioned = l.unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(col("__key"))
      .orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = payload.foldLeft(unioned)((df, p) =>
      df.withColumn(p, last(col(s"__p_$p"), ignoreNulls = true).over(w)))
    carried
      .filter(col("__side") === 1)
      .select((leftCols ++ payload).map(col): _*)
  }
}
