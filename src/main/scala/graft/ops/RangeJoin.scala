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

  /** Interval-overlap join: pairs from `left` × `right` whose half-open windows
    * `[lStart, lEnd)` and `[rStart, rEnd)` intersect, equality-matching `keys`
    * first — same bin-bucketing rewrite as [[pointInInterval]], so it plans as a
    * hash join instead of a nested loop.
    *
    * Exactly-once without a dedup pass: a pair sharing several bins is emitted only
    * in the bin of `max(lStart, rStart)` — the overlap's first instant, which both
    * intervals' bin ranges necessarily cover. The four range columns must have
    * distinct names (both frames surface in the output row).
    */
  def intervalOverlap(
      left: DataFrame, right: DataFrame,
      lStart: String, lEnd: String, rStart: String, rEnd: String,
      binWidth: Long, keys: Seq[String] = Nil): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    require(Seq(lStart, lEnd, rStart, rEnd).distinct.size == 4,
      "range columns must be distinct names — both sides appear in the output")
    def binned(df: DataFrame, s: String, e: String) = df
      .filter(col(e) > col(s))
      .withColumn("__bin", explode(sequence(
        floor(col(s) / binWidth), floor(col(e) / binWidth))))
    binned(left, lStart, lEnd).join(binned(right, rStart, rEnd), keys :+ "__bin")
      .filter(col(lStart) < col(rEnd) && col(rStart) < col(lEnd))
      .filter(col("__bin") === floor(greatest(col(lStart), col(rStart)) / binWidth))
      .drop("__bin")
  }
}
