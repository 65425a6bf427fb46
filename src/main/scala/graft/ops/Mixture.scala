package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dataset mixture planning for LLM pre-training: given the corpus as it exists
  * (per-source token inventories) and the mixture the training run wants (target
  * weights summing to 1 over a token budget), compute each source's sampling
  * plan — the rate, whether it up- or down-samples, and how many epochs an
  * upsampled source must repeat (the Pile / LLaMA-style "epochs over a source"
  * notion). The whole computation is ONE groupBy over the corpus: per-source
  * token sums reduce map-side, so the cost at 100 TB is a single scan's partial
  * aggregation — the plan itself is a handful of rows joined driver-small.
  *
  * This is deliberately a PLAN, not a sampler: the emitted `sampling_rate`
  * feeds the deterministic samplers in [[graft.ops.Splits]] /
  * `q_weighted_sample`-style md5-bucket selection, which keeps the actual
  * row-level sampling reproducible and oracle-checkable.
  */
object Mixture {

  /** Per-source sampling plan: `(source, n_docs, available_tokens, weight,
    * target_tokens, sampling_rate, epochs, status)`.
    *
    *  - `target_tokens = round(weight * budgetTokens)`
    *  - `sampling_rate = target_tokens / available_tokens` (rounded to 6 dp;
    *    null when the source has no tokens)
    *  - `epochs = ceil(sampling_rate)` — passes over the source an upsampling
    *    loader needs
    *  - `status`: `unused` (weight 0), `missing` (targeted but absent from the
    *    corpus), `upsample` (rate > 1), `downsample` (rate < 1), else `exact`
    *
    * Tokens are whitespace tokens, consistent with [[TextAnalysis.tokens]].
    * Sources present in the corpus but absent from `targets` surface with
    * weight 0 rather than vanishing — silently dropping a source from the plan
    * is how mixtures go wrong.
    */
  def plan(docs: DataFrame, targets: Map[String, Double], budgetTokens: Long,
      sourceCol: String = "source", textCol: String = "text"): DataFrame = {
    require(targets.nonEmpty, "targets must not be empty")
    require(math.abs(targets.values.sum - 1.0) < 1e-9,
      s"target weights must sum to 1; got ${targets.values.sum}")
    require(targets.values.forall(_ >= 0), "target weights must be non-negative")
    require(budgetTokens > 0, s"budgetTokens must be positive; got $budgetTokens")
    val spark = docs.sparkSession
    val avail = docs.groupBy(col(sourceCol).as("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(size(split(trim(col(textCol)), "\\s+")).cast("long")).as("available_tokens"))
    // both sides are tiny post-agg (one row per source); full outer keeps
    // corpus-only sources (weight 0) AND target-only sources (missing)
    val t = spark.createDataFrame(targets.toSeq).toDF("source", "weight")
    avail.join(t, Seq("source"), "full_outer")
      .na.fill(0.0, Seq("weight"))
      .na.fill(0L, Seq("n_docs", "available_tokens"))
      .withColumn("target_tokens",
        round(col("weight") * budgetTokens).cast("long"))
      .withColumn("sampling_rate",
        when(col("available_tokens") > 0,
          round(col("target_tokens") / col("available_tokens"), 6)))
      .withColumn("epochs",
        ceil(coalesce(col("sampling_rate"), lit(0.0))).cast("int"))
      .withColumn("status",
        when(col("weight") === 0, "unused")
          .when(col("available_tokens") === 0, "missing")
          .when(col("sampling_rate") > 1, "upsample")
          .when(col("sampling_rate") < 1, "downsample")
          .otherwise("exact"))
  }
}
