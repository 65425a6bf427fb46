package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distribution-drift detection between two snapshots of a table — the monitoring
  * primitive a long-running ingest pipeline runs per batch/day: "does today's data
  * still look like the corpus the model was trained on?"
  *
  * Metric: Population Stability Index over EXPLICIT bin edges,
  * `PSI = Σ_bins (cur% − base%) · ln(cur% / base%)` (common reading: < 0.1 stable,
  * 0.1–0.25 moderate shift, > 0.25 investigate). Edges are caller-fixed rather than
  * quantile-derived so the measurement is reproducible run-over-run and replayable
  * by any engine — a drifting quantile grid would move the ruler with the data.
  *
  * Scale shape: one filter+aggregate pass per side with map-side partial counts
  * (shuffle rows = bins, not data), a bins-sized full-outer join, and a broadcast
  * single-row totals join. Nothing about the computation grows with table size
  * except the two scans.
  */
object Drift {

  /** Bin index of a value for ascending `edges`: bin k ⇔ value in [e_k, e_k+1)
    * with e_0 = −∞ — i.e. the count of edges ≤ value. Integer-exact and trivially
    * replayable (a sum of boolean comparisons).
    */
  def binOf(c: Column, edges: Seq[Double]): Column =
    edges.map(e => when(c >= e, 1).otherwise(0)).reduce(_ + _)

  /** Per-bin PSI contributions (`bin, base_n, cur_n, psi_term` — psi_term rounded
    * to 6 decimals; total PSI = their sum). NULL values are excluded on both sides;
    * empty bins are floored at `epsilon` fraction, the standard guard that keeps
    * ln finite while still penalizing mass appearing where none existed.
    */
  def psi(baseline: DataFrame, current: DataFrame, column: String,
      edges: Seq[Double], epsilon: Double = 1e-6): DataFrame = {
    require(edges.nonEmpty, "need at least one bin edge")
    require(edges == edges.sorted && edges.distinct.size == edges.size,
      "edges must be strictly ascending")
    require(epsilon > 0 && epsilon < 1, "epsilon must be in (0, 1)")
    def hist(df: DataFrame, cnt: String) = df
      .filter(col(column).isNotNull)
      .groupBy(binOf(col(column), edges).as("bin"))
      .agg(count(lit(1)).as(cnt))
    val joined = hist(baseline, "base_n")
      .join(hist(current, "cur_n"), Seq("bin"), "full_outer")
      .select(col("bin"),
        coalesce(col("base_n"), lit(0L)).as("base_n"),
        coalesce(col("cur_n"), lit(0L)).as("cur_n"))
    psiTerms(joined, col("bin"), epsilon)
  }

  /** Shared fraction/ln chain over a (key, base_n, cur_n) frame. Totals come from a
    * whole-frame window, NOT a separate aggregate: a second aggregate would
    * re-execute the histogram lineage and scan both snapshots TWICE more (observed
    * in the plan), while the window reuses the one materialized frame — and that
    * frame is bins/categories-sized, so its single-partition window is free.
    */
  private def psiTerms(joined: DataFrame, key: Column, epsilon: Double): DataFrame = {
    val whole = org.apache.spark.sql.expressions.Window
      .partitionBy().rowsBetween(Long.MinValue, Long.MaxValue)
    val bt = sum("base_n").over(whole)
    val ct = sum("cur_n").over(whole)
    val baseFrac = greatest(col("base_n").cast("double") / bt, lit(epsilon))
    val curFrac = greatest(col("cur_n").cast("double") / ct, lit(epsilon))
    joined.select(key, col("base_n"), col("cur_n"),
      round((curFrac - baseFrac) * log(curFrac / baseFrac), 6).as("psi_term"))
  }

  /** The scalar PSI (sum of per-bin contributions) — for alert thresholds. */
  def psiTotal(baseline: DataFrame, current: DataFrame, column: String,
      edges: Seq[Double], epsilon: Double = 1e-6): Double =
    psi(baseline, current, column, edges, epsilon)
      .agg(sum("psi_term")).first().getDouble(0)

  /** Categorical PSI: same contributions keyed by the column's VALUES instead of
    * numeric bins — "did the language/source/status mix shift?". A category seen
    * on only one side still contributes (epsilon floor on the missing side);
    * NULL is excluded like the numeric path. Cardinality bounds the shuffle
    * exactly as bins do — guard high-cardinality columns by mapping to a coarser
    * key first (this is a mix monitor, not a join).
    */
  def psiCategorical(baseline: DataFrame, current: DataFrame, column: String,
      epsilon: Double = 1e-6): DataFrame = {
    require(epsilon > 0 && epsilon < 1, "epsilon must be in (0, 1)")
    def hist(df: DataFrame, cnt: String) = df
      .filter(col(column).isNotNull)
      .groupBy(col(column).as("category"))
      .agg(count(lit(1)).as(cnt))
    psiCategoricalFromCounts(hist(baseline, "n"), hist(current, "n"), epsilon)
  }

  /** Categorical PSI from PRECOMPUTED (category, count) histograms — the streaming
    * monitor's path, where the baseline histogram is collected once and replayed
    * per micro-batch instead of re-counted from the baseline table.
    */
  def psiCategoricalFromCounts(baseCounts: DataFrame, curCounts: DataFrame,
      epsilon: Double = 1e-6): DataFrame = {
    require(epsilon > 0 && epsilon < 1, "epsilon must be in (0, 1)")
    val joined = baseCounts.toDF("category", "base_n")
      .join(curCounts.toDF("category", "cur_n"), Seq("category"), "full_outer")
      .select(col("category"),
        coalesce(col("base_n"), lit(0L)).as("base_n"),
        coalesce(col("cur_n"), lit(0L)).as("cur_n"))
    psiTerms(joined, col("category"), epsilon)
  }
}
