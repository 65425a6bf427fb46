package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bigram language-model perplexity scoring — the CCNet-style quality signal
  * (Wenzek et al. 2020, "CCNet: Extracting High Quality Monolingual Datasets"):
  * score each document by how predictable its text is under a reference corpus's
  * n-gram statistics; junk (gibberish, boilerplate, wrong-language) scores far from
  * the reference distribution and gets filtered or bucketed.
  *
  * The model here is an add-one-smoothed bigram LM:
  * `P(w2 | w1) = (c(w1 w2) + 1) / (c(w1) + V)`, V = reference unigram vocabulary
  * size. Deliberately integer-counted and closed-form, so an external engine can
  * replay every probability exactly.
  *
  * Scale shapes: counts are ordinary combine-shuffle aggregations over the REFERENCE
  * corpus (train on a sample; the tables are (distinct bigrams) rows, not corpus
  * rows). Scoring never collects a model to the driver: document bigrams explode
  * map-side (same staged-array discipline as everywhere), join the count tables by
  * key — Spark broadcasts them when small, shuffle-joins when not, both correct —
  * and a doc-keyed average finishes. Corpus text is scanned once.
  */
object NgramLm {

  private def staged(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).as("doc_id"),
      TextAnalysis.tokens(lower(col(textCol))).as("tk"))

  /** Per-document bigram stream `(doc_id, w1, w2)` — map-side, order preserved
    * by construction (zip each token array with its own tail).
    */
  private def docBigrams(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val s = staged(df, idCol, textCol)
    val tk = col("tk")
    val pairs = zip_with(tk, slice(tk, lit(2), greatest(size(tk) - 1, lit(0))),
      (a, b) => struct(a.as("w1"), b.as("w2")))
    s.select(col("doc_id"),
        explode(filter(pairs, p => p.getField("w2").isNotNull)).as("p"))
      .select(col("doc_id"), col("p.w1").as("w1"), col("p.w2").as("w2"))
  }

  /** Reference bigram counts `(w1, w2, n)` — one combine shuffle. */
  def bigramCounts(ref: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    docBigrams(ref, idCol, textCol)
      .groupBy("w1", "w2").agg(count(lit(1)).as("n"))

  /** Reference unigram counts `(w, n)` — one combine shuffle. */
  def unigramCounts(ref: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    staged(ref, idCol, textCol)
      .select(explode(col("tk")).as("w"))
      .filter(col("w") =!= "")
      .groupBy("w").agg(count(lit(1)).as("n"))

  /** Score `docs` under the reference statistics: per document, the mean add-one
    * bigram log-probability and the count of scored bigrams. Unseen bigrams and
    * unseen history words fall back to the smoothed floor — every document gets a
    * finite score. Documents with fewer than two tokens emit no row.
    *
    * Output: `(doc_id, n_bigrams, avg_logprob)` — `avg_logprob` rounded to 6
    * decimals so cross-engine float-summation order cannot flip a comparison.
    */
  def scoreDocs(docs: DataFrame, bigrams: DataFrame, unigrams: DataFrame,
      vocabSize: Long, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(vocabSize > 0, "vocabSize must be positive")
    scoredDocs(docs, bigrams, unigrams, idCol, textCol,
      identity, lit(vocabSize))
  }

  /** [[scoreDocs]] with V riding IN the plan: the vocabulary size joins the
    * bigram stream as a broadcast one-row cross join instead of a driver-side
    * `count()` action. Same arithmetic (long V, identical expression tree) —
    * but the unigram aggregation's exchange is computed once per action and
    * REUSED (same-plan exchange reuse) by the V count and the scoring join,
    * where the action form re-tokenized and re-aggregated the whole reference
    * corpus a second time just to learn V.
    */
  private def scoreDocsPlanV(docs: DataFrame, bigrams: DataFrame,
      unigrams: DataFrame, idCol: String, textCol: String): DataFrame = {
    val vRow = unigrams.agg(count(lit(1)).as("__vocab"))
    scoredDocs(docs, bigrams, unigrams, idCol, textCol,
      _.crossJoin(broadcast(vRow)), col("__vocab"))
  }

  private def scoredDocs(docs: DataFrame, bigrams: DataFrame,
      unigrams: DataFrame, idCol: String, textCol: String,
      attachV: DataFrame => DataFrame, vocab: Column): DataFrame = {
    val bg = bigrams.select(col("w1").as("b_w1"), col("w2").as("b_w2"),
      col("n").as("c_bigram"))
    val ug = unigrams.select(col("w").as("u_w"), col("n").as("c_w1"))
    attachV(docBigrams(docs, idCol, textCol))
      .join(bg, col("w1") === col("b_w1") && col("w2") === col("b_w2"), "left")
      .join(ug, col("w1") === col("u_w"), "left")
      .withColumn("lp",
        log((coalesce(col("c_bigram"), lit(0L)) + 1).cast("double") /
          (coalesce(col("c_w1"), lit(0L)) + vocab).cast("double")))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        round(avg(col("lp")), 6).as("avg_logprob"))
  }

  /** CCNet's head/middle/tail split: bucket scored documents by score terciles.
    * Scale shape: cutoffs come from ONE aggregation (two exact percentiles over the
    * already-rounded scores), broadcast back; bucketing is a map-side CASE — never
    * a global `ntile` sort. Comparisons are boundary-safe: scores are 6-dp-rounded
    * values, and an interpolated cutoff lands well clear of them in ulp terms.
    */
  def bucketByScore(scores: DataFrame,
      scoreCol: String = "avg_logprob"): DataFrame = {
    val cuts = scores.agg(
      expr(s"percentile($scoreCol, 2.0D / 3.0D)").as("__c_head"),
      expr(s"percentile($scoreCol, 1.0D / 3.0D)").as("__c_mid"))
    scores.crossJoin(broadcast(cuts))
      .withColumn("bucket",
        when(col(scoreCol) >= col("__c_head"), "head")
          .when(col(scoreCol) >= col("__c_mid"), "middle")
          .otherwise("tail"))
      .drop("__c_head", "__c_mid")
  }

  /** Self-contained convenience: train on `ref`, score `docs`. The vocabulary
    * size is the reference's distinct unigram count, folded into the plan as a
    * broadcast scalar ([[scoreDocsPlanV]]) rather than a separate driver action.
    */
  def perplexityScores(docs: DataFrame, ref: DataFrame,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    scoreDocsPlanV(docs, bigramCounts(ref, idCol, textCol),
      unigramCounts(ref, idCol, textCol), idCol, textCol)
}
