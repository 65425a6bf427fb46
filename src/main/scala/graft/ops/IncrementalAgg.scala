package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental view maintenance for additive aggregates — the consumer the change
  * data feed exists for: a gold-layer `GROUP BY` table kept current by applying
  * row-level deltas instead of re-aggregating the source. At 100 TB the difference
  * is the whole game: a recompute scans the full fact table per refresh, while the
  * delta path costs one scan of the CHANGE volume plus a join against the (small,
  * already-aggregated) view.
  *
  * The algebra is the standard one for self-maintainable aggregates (COUNT/SUM):
  * each feed row carries a sign — `insert`/`update_postimage` add, `delete`/
  * `update_preimage` subtract — so an update contributes (−old, +new) and the
  * deltas collapse per group in ONE map-side-combined aggregation before ever
  * touching the view. AVG is derived as SUM/COUNT at read time; MIN/MAX are NOT
  * self-maintainable under deletes (a retracted minimum needs the base data) and
  * are deliberately absent.
  *
  * Works over any feed with the [[graft.catalog.VersionedTable.readChanges]] /
  * [[graft.catalog.VersionedTable.diffSnapshots]] `_change_type` vocabulary.
  */
object IncrementalAgg {

  /** The per-group delta a feed batch induces: `(keys..., d_count, d_sum_<c>...)`.
    * One aggregation over the feed; groups whose deltas cancel to zero everywhere
    * are dropped (they cannot change the view).
    */
  def delta(feed: DataFrame, keys: Seq[String], sumCols: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "keys must not be empty")
    // an unknown change type means the feed is not CDF-shaped — corrupt input;
    // raise loudly rather than let a skipped null make the view silently wrong
    val sign = when(col("_change_type").isin("insert", "update_postimage"), 1)
      .when(col("_change_type").isin("delete", "update_preimage"), -1)
      .otherwise(raise_error(
        concat(lit("not a change-feed row: _change_type="), col("_change_type")))
        .cast("int"))
    val signed = feed.withColumn("__sign", sign)
    val aggs = sum(col("__sign")).cast("long").as("d_count") +:
      sumCols.map(c => sum(col("__sign") * col(c)).cast("double").as(s"d_sum_$c"))
    signed.groupBy(keys.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
      .filter(col("d_count") =!= 0 ||
        sumCols.map(c => col(s"d_sum_$c") =!= 0).foldLeft(lit(false))(_ || _))
  }

  /** The maintained view after applying a feed batch to `current`. Both inputs and
    * the output share the view schema: `(keys..., n_rows, sum_<c>...)` — build the
    * initial state with [[recompute]]. Groups whose row count reaches zero leave
    * the view (matching what a recompute would produce). A full-outer join on the
    * group keys — the view side is post-aggregation small, so at scale this is a
    * broadcast or a cheap shuffle, never a fact-table scan.
    */
  def applyFeed(current: DataFrame, feed: DataFrame, keys: Seq[String],
      sumCols: Seq[String]): DataFrame = {
    val d = delta(feed, keys, sumCols)
    current.join(d, keys, "full_outer")
      .select(
        keys.map(col) ++
          Seq((coalesce(col("n_rows"), lit(0L)) + coalesce(col("d_count"), lit(0L)))
            .as("n_rows")) ++
          sumCols.map(c =>
            (coalesce(col(s"sum_$c"), lit(0.0)) + coalesce(col(s"d_sum_$c"), lit(0.0)))
              .as(s"sum_$c")): _*)
      .filter(col("n_rows") > 0)
  }

  /** The same view from scratch — the bootstrap and the correctness oracle for the
    * incremental path (applyFeed over a change history must land row-identical).
    * Null sum values contribute nothing and an all-null group reports 0.0, not
    * NULL — the delta algebra cannot distinguish "no contribution" from "zero"
    * without tracking a per-column non-null count, so BOTH paths pin the 0.0
    * convention and the equivalence holds even on null-bearing data.
    */
  def recompute(source: DataFrame, keys: Seq[String], sumCols: Seq[String]): DataFrame = {
    val aggs = count(lit(1)).as("n_rows") +:
      sumCols.map(c => coalesce(sum(col(c)).cast("double"), lit(0.0)).as(s"sum_$c"))
    source.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }
}
