package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

import graft.functions.ApproxTopItems.approx_top_items

/** Exact heavy hitters over a (possibly very high cardinality) column without ever
  * shuffling one row per distinct value — the sketch-then-verify pattern:
  *
  *  1. ONE scan reduces every partition to a k-entry Misra–Gries summary
  *     ([[graft.functions.ApproxTopItems]]); merged driver-side into ≤ k candidate
  *     items. The MG guarantee (no item with true count > n/(k+1) can be lost, and
  *     k is chosen so threshold ≥ n/(k+1)) makes the candidate set a PROVABLE
  *     superset of the true heavy hitters.
  *  2. ONE more scan exact-counts only the candidates — the `isin` filter is a
  *     broadcast k-item membership test, so the groupBy shuffles ≤ k distinct keys
  *     after map-side combine.
  *
  * The result is EXACT (counts and membership), not approximate — the sketch only
  * decides what is worth counting. Contrast with the naive
  * `groupBy(col).count.filter` at 100 TB: for a column like user id or URL that is
  * a shuffle of billions of distinct keys to answer a question about a handful.
  */
object HeavyHitters {

  /** Items of `column` with frequency strictly above `minShare` of all rows, with
    * exact counts and shares. `minShare` ∈ (0, 1); e.g. 0.001 = items above 0.1%.
    * Null values are ignored (they are never a candidate).
    */
  def heavyHitters(df: DataFrame, column: String, minShare: Double): DataFrame = {
    require(minShare > 0 && minShare < 1,
      s"minShare must be in (0, 1); got $minShare")
    // threshold = minShare * n ≥ n/(k+1)  ⇔  k + 1 ≥ 1/minShare
    val k = math.max(8, math.ceil(1.0 / minShare).toInt)
    val item = col(column).cast("string")
    val sketch = df
      .agg(approx_top_items(item, k).as("items"), count(item).as("n"))
      .first()
    val n = sketch.getLong(1)
    val candidates = sketch.getSeq[Row](0).map(_.getString(0))
    val spark = df.sparkSession
    if (n == 0L || candidates.isEmpty)
      return spark.createDataFrame(spark.sparkContext.emptyRDD[Row],
        new org.apache.spark.sql.types.StructType()
          .add("item", "string", nullable = true)
          .add("item_count", "long", nullable = false)
          .add("share", "double", nullable = false))
    // k = ceil(1/minShare), so a small minShare means a LARGE candidate set: an
    // isin() of a million literals is a million-element In embedded in the plan —
    // driver memory and codegen blow up before any data moves. Past a modest size
    // the membership test becomes a broadcast semi-join instead: same semantics,
    // same map-side evaluation, but the candidates ship as a broadcast relation
    // rather than plan literals.
    val recount =
      if (candidates.size <= MaxInListCandidates)
        df.filter(item.isin(candidates: _*)).select(item.as("item"))
      else {
        import df.sparkSession.implicits._
        df.select(item.as("item"))
          .join(broadcast(candidates.toDF("item")), Seq("item"), "left_semi")
      }
    recount
      .groupBy("item")
      .agg(count(lit(1)).as("item_count"))
      .filter(col("item_count") > minShare * n)
      .withColumn("share", col("item_count") / lit(n.toDouble))
  }

  /** Above this, candidate membership is a broadcast semi-join, not an In-list. */
  private val MaxInListCandidates = 1000
}
