package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Point-in-interval (range) join, bin-bucketed so it runs as an EQUALITY join.
  *
  * Open-source Spark plans `p.ts BETWEEN i.start AND i.end` as a broadcast
  * nested-loop (small side) or a sort-merge whose per-key range scan degenerates to
  * O(points × intervals) under hot keys — there is no built-in range-join
  * optimization. Bucketing by time bin restores hash-join shape: a point lands in
  * ONE bin, an interval explodes to the bins it covers, and the join key becomes
  * `(keys…, bin)` with the exact predicate re-checked afterwards. A (point,
  * interval) match is found exactly once — in the point's own bin — so no
  * deduplication pass is needed.
  *
  * Scale notes: shuffle volume is O(points + intervals × bins-per-interval); pick
  * `binWidth` on the order of the TYPICAL interval length so most intervals explode
  * to ≤ 2 bins. Skew from one hot key spreads across that key's populated bins
  * instead of landing in one task. The refine predicate stays inside whole-stage
  * codegen.
  */
object RangeJoin {

  /** Inner-join `points` to the `intervals` whose `[startCol, endCol)` window
    * contains `tsCol`, equality-matching `keys` first. All three range columns must
    * be the same numeric scale (e.g. epoch micros). Intervals with `end <= start`
    * are empty and dropped up front (also keeps `sequence` ascending).
    */
  def pointInInterval(
      points: DataFrame, intervals: DataFrame,
      tsCol: String, startCol: String, endCol: String,
      binWidth: Long, keys: Seq[String] = Nil): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val p = points.withColumn("__bin", floor(col(tsCol) / binWidth))
    val i = intervals
      .filter(col(endCol) > col(startCol))
      .withColumn("__bin", explode(sequence(
        floor(col(startCol) / binWidth), floor(col(endCol) / binWidth))))
    p.join(i, keys :+ "__bin")
      .filter(col(startCol) <= col(tsCol) && col(tsCol) < col(endCol))
      .drop("__bin")
  }
}
