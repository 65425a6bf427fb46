package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** One-pass column profiling — the first query anyone runs against an unknown 100 TB
  * table, so it must cost one scan, not one scan per column.
  *
  * All requested columns' metrics compute in a SINGLE aggregation over one scan; the
  * wide one-row result is then unpivoted to (column, metric...) rows by exploding an
  * in-memory array — no second pass, no per-column jobs (the reference's DQ layer runs
  * one Spark job per metric; see dq/DqValidator for the fused rewrite of its checks).
  *
  * [[profile]] uses exact distinct counts (Catalyst plans N distincts via one Expand —
  * N× the scan rows pre-aggregation); [[approxProfile]] swaps in HLL sketches, which
  * partial-aggregate map-side — the right default at extreme scale.
  */
object Profile {

  /** Exact profile of numeric columns: per column, null count, exact distinct count,
    * min and max (as double). One scan.
    */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame =
    unpivot(df, cols, c => countDistinct(col(c)))

  /** Scale variant: approximate distinct via HLL (`rsd` relative error). */
  def approxProfile(df: DataFrame, cols: Seq[String], rsd: Double = 0.05): DataFrame =
    unpivot(df, cols, c => approx_count_distinct(col(c), rsd))

  /** Exact fixed-width histogram of a numeric column: `bins` equal buckets over
    * [lo, hi), out-of-range values clamped into the edge buckets (the usual
    * behavior for a distribution plot over a known domain). Fixed caller-supplied
    * edges — like [[Drift]]'s PSI bins — keep the measurement reproducible run to
    * run; quantile-derived grids would move the ruler with the data.
    *
    * One aggregation on the bin id: at most `bins` rows shuffle (map-side
    * combined) no matter the table size. NULLs are excluded (profile them with
    * [[profile]]). Only non-empty buckets emit.
    */
  def histogram(df: DataFrame, colName: String, lo: Double, hi: Double,
      bins: Int): DataFrame = {
    require(bins > 0, "bins must be positive")
    require(hi > lo, s"need hi > lo, got [$lo, $hi)")
    val w = (hi - lo) / bins
    val x = col(colName).cast("double")
    val bin = least(greatest(
      floor((x - lo) / w).cast("int"), lit(0)), lit(bins - 1))
    df.filter(x.isNotNull)
      .select(bin.as("bin"))
      .groupBy("bin").agg(count(lit(1)).as("n"))
      .select(col("bin"),
        (lit(lo) + col("bin") * w).as("bin_lo"),
        (lit(lo) + (col("bin") + 1) * w).as("bin_hi"),
        col("n"))
  }

  private def unpivot(df: DataFrame, cols: Seq[String],
      distinctAgg: String => org.apache.spark.sql.Column): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val aggs = cols.flatMap { c =>
      Seq(
        count(lit(1)).minus(count(col(c))).cast("long").as(s"__nulls_$c"),
        distinctAgg(c).cast("long").as(s"__distinct_$c"),
        min(col(c)).cast("double").as(s"__min_$c"),
        max(col(c)).cast("double").as(s"__max_$c"))
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val stacked = array(cols.map { c =>
      struct(
        lit(c).as("column"),
        col(s"__nulls_$c").as("n_nulls"),
        col(s"__distinct_$c").as("n_distinct"),
        col(s"__min_$c").as("min_value"),
        col(s"__max_$c").as("max_value"))
    }: _*)
    wide.select(explode(stacked).as("p")).select("p.*")
  }
}
