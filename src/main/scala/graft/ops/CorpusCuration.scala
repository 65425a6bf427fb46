package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** End-to-end training-corpus curation: the operator families of this package composed
  * into the standard cleaning pipeline —
  *
  *   exact dedup → near-dup clustering (keep canonical) → quality floor →
  *   language allowlist → PII scrub
  *
  * Every stage is the already-scale-analyzed operator (see SCALE.md); composing them
  * keeps each a pure DataFrame→DataFrame step, so Catalyst plans the whole pipeline as
  * one lineage with no driver-side data movement. Stage attrition counts ride the
  * final write via per-stage lit tags — call [[report]] for them (one aggregation job).
  */
object CorpusCuration {

  /** `gopher` (when set) gates rows BEFORE any dedup work — a zero-shuffle per-row
    * filter is the cheapest place to shed junk, so it runs first. `sourceCap`
    * (when set, as (column, cap)) caps every source/domain AFTER curation — it
    * shapes the surviving mix, so it runs last.
    */
  final case class Config(
      nGram: Int = 3,
      jaccardThreshold: Double = 0.5,
      numHashes: Int = 32,
      bands: Int = 16,
      minQuality: Double = 0.5,
      langs: Option[Set[String]] = None,
      scrubPii: Boolean = true,
      gopher: Option[TextAnalysis.GopherConfig] = None,
      sourceCap: Option[(String, Int)] = None)

  /** Keep each group's top `keepFraction` of rows by `scoreCol` (score descending,
    * `idCol` tiebreak) — the RELATIVE quality floor: "best half per language" rather
    * than a fixed threshold, so a strict global cut can't empty out a
    * low-scoring-on-average group. Rank-based (row_number ≤ ceil(f·n)), NOT an
    * interpolated percentile — rank semantics are identical in every engine, where
    * percentile interpolation is not, and ties resolve deterministically.
    *
    * Scale: both windows share one hash partitioning on the group — a single
    * shuffle; the per-group sort is the cost of exactness. For a 100 TB corpus
    * where even per-group sorts hurt, take the approximate path instead: an
    * `approx_percentile` cutoff per group (one agg + broadcast join + filter) at
    * the price of a fuzzy boundary.
    */
  def keepTopFractionByGroup(df: DataFrame, groupCol: String, scoreCol: String,
      keepFraction: Double, idCol: String = "doc_id"): DataFrame = {
    require(keepFraction > 0 && keepFraction <= 1,
      s"keepFraction must be in (0, 1], got $keepFraction")
    import org.apache.spark.sql.expressions.Window
    val ranked = Window.partitionBy(col(groupCol))
      .orderBy(col(scoreCol).desc, col(idCol))
    val whole = Window.partitionBy(col(groupCol))
    df.withColumn("__rn", row_number().over(ranked))
      .withColumn("__n", count(lit(1)).over(whole))
      .filter(col("__rn") <= ceil(lit(keepFraction) * col("__n")))
      .drop("__rn", "__n")
  }

  /** Per-group SCORE CALIBRATION: map each row's raw score to its within-group
    * quantile (`score_cal` ∈ [0, 1]), so scores from different sources become
    * comparable before any GLOBAL floor or mixture decision. Raw quality
    * scores are not comparable across sources — a web-crawl classifier and a
    * books classifier put their mass in different ranges, so one global
    * threshold silently over-prunes whichever source scores low — the same
    * reason CCNet buckets perplexity PER LANGUAGE rather than globally.
    *
    * Exact path (default): `percent_rank` over the (group, score) window —
    * ties share a rank, the calibrated value is exactly replayable by any
    * engine, and the cost is one shuffle with per-group sorts (the
    * [[keepTopFractionByGroup]] shape). 100 TB path (`exact = false`): B
    * `approx_percentile` cutoffs per group in ONE aggregation (group
    * cardinality × B values), broadcast back, each row binary-searched into
    * its bucket map-side — the corpus never shuffles, and the calibrated
    * value is quantized to 1/B with the sketch's rank error at bucket edges.
    */
  def calibrateScores(df: DataFrame, groupCol: String, scoreCol: String,
      exact: Boolean = true, buckets: Int = 1000): DataFrame = {
    require(buckets >= 2, s"buckets must be >= 2, got $buckets")
    if (exact) {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col(groupCol)).orderBy(col(scoreCol))
      df.withColumn("score_cal", percent_rank().over(w))
    } else {
      val fracs = (1 until buckets).map(_.toDouble / buckets)
      val cutoffs = df.groupBy(col(groupCol))
        .agg(percentile_approx(col(scoreCol),
          typedLit(fracs), lit(10000)).as("__cuts"))
        .withColumnRenamed(groupCol, "__cal_grp")
      // bucket index = count of cutoffs <= score; aggregate() keeps the
      // search inside codegen (B is bounded, the scan stays map-side).
      // NULL-SAFE join: a NULL group is its own calibration group (groupBy
      // keeps it), and an equi-join would silently DROP its rows — the exact
      // path keeps them as their own window partition, so this path must too
      df.join(broadcast(cutoffs), df(groupCol) <=> col("__cal_grp"))
        .withColumn("score_cal",
          aggregate(col("__cuts"), lit(0),
            (acc, c) => acc + when(col(scoreCol) >= c, 1).otherwise(0))
            .cast("double") / buckets)
        .drop("__cuts", "__cal_grp")
    }
  }

  /** The 100 TB variant of [[keepTopFractionByGroup]]: per-group score cutoffs from
    * ONE `approx_percentile` aggregation (group cardinality rows), broadcast back,
    * rows filtered map-side — no per-group sort, no window, the corpus never
    * shuffles. The boundary is fuzzy by `relativeError` of rank (rows whose score
    * ties the cutoff all survive), which is the explicit trade against the exact
    * rank cut.
    */
  def keepTopFractionByGroupApprox(df: DataFrame, groupCol: String, scoreCol: String,
      keepFraction: Double, relativeError: Double = 0.001): DataFrame = {
    require(keepFraction > 0 && keepFraction <= 1,
      s"keepFraction must be in (0, 1], got $keepFraction")
    val cutoffs = df.groupBy(col(groupCol))
      .agg(percentile_approx(col(scoreCol), lit(1.0 - keepFraction),
        lit((1.0 / relativeError).toInt)).as("__cutoff"))
    df.join(broadcast(cutoffs), Seq(groupCol))
      .filter(col(scoreCol) >= col("__cutoff"))
      .drop("__cutoff")
  }

  /** Drop every near-duplicate except its cluster's minimum-id canonical document.
    * Pairs come from MinHash+LSH (exact-verified); clusters from min-label
    * connected components, so transitive duplicate chains collapse to one survivor.
    */
  def keepNearDupCanonicals(
      docs: DataFrame, config: Config = Config(),
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val pairs = Dedup.minhashNearDuplicates(docs, idCol, textCol,
      config.nGram, config.numHashes, config.bands, config.jaccardThreshold)
      .select("doc_a", "doc_b")
    val comps = ConnectedComponents(pairs)
    docs.join(comps, docs(idCol) === comps("node"), "left")
      .filter(col("component").isNull || col(idCol) === col("component"))
      .drop("node", "component")
  }

  /** The full pipeline. Output keeps the input columns plus `quality_score`,
    * `predicted_lang`, and (when scrubbing) `n_redactions`, with `textCol` scrubbed.
    */
  def curate(
      docs: DataFrame, config: Config = Config(),
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val gated = config.gopher match {
      case Some(g) => TextAnalysis.gopherFilter(docs, g, textCol)
      case None    => docs
    }
    val exact = Dedup.exactDedup(gated, idCol, textCol)
    val nearDeduped = keepNearDupCanonicals(exact, config, idCol, textCol)
    val withQuality = nearDeduped.join(
      TextAnalysis.textStats(nearDeduped, idCol, textCol)
        .select(col(idCol), col("quality_score")),
      Seq(idCol))
      .filter(col("quality_score") >= config.minQuality)
    val withLang = withQuality.join(
      TextAnalysis.langId(withQuality, idCol, textCol)
        .select(col(idCol), col("predicted_lang")),
      Seq(idCol))
    val langFiltered = config.langs match {
      case Some(allowed) => withLang.filter(col("predicted_lang").isin(allowed.toSeq: _*))
      case None => withLang
    }
    val scrubbed =
      if (config.scrubPii) TextAnalysis.scrubPii(langFiltered, idCol, textCol)
      else langFiltered
    config.sourceCap match {
      case Some((groupCol, cap)) => Splits.capGroups(scrubbed, groupCol, cap, idCol)
      case None                  => scrubbed
    }
  }

  final case class CurationReport(
      input: Long, afterExactDedup: Long, afterNearDedup: Long,
      afterQuality: Long, curated: Long)

  /** Stage attrition counts (each stage is one count job over a shared prefix plan —
    * diagnostics, not the hot path; run on samples at full scale).
    */
  def report(docs: DataFrame, config: Config = Config(),
      idCol: String = "doc_id", textCol: String = "text"): CurationReport = {
    val exact = Dedup.exactDedup(docs, idCol, textCol)
    val near = keepNearDupCanonicals(exact, config, idCol, textCol)
    val quality = near.join(
      TextAnalysis.textStats(near, idCol, textCol).select(col(idCol), col("quality_score")),
      Seq(idCol)).filter(col("quality_score") >= config.minQuality)
    CurationReport(docs.count(), exact.count(), near.count(), quality.count(),
      curate(docs, config, idCol, textCol).count())
  }
}
