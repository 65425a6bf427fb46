package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** A trainable document-quality classifier — logistic regression over the
  * interpretable text statistics of [[TextAnalysis.textStats]] (the model family
  * behind fastText-style quality filters used to curate web corpora, reduced to
  * engine-native features so both training and scoring stay inside Spark).
  *
  * Scoring is a pure `Column` expression (weights folded into the plan as
  * literals): whole-stage codegen, no UDF, no shuffle — a scored 100 TB corpus is
  * one map-side pass. Training is full-batch gradient descent: one `treeAggregate`
  * per iteration over a persisted feature RDD (the multi-pass pin is the point —
  * without it every iteration would re-run the text statistics), gradients are a
  * k-element array regardless of data size, and the weight vector rides the
  * closure, never a driver-side row loop.
  */
object QualityClassifier {

  /** Feature names, index-aligned with [[featureExprs]]; index 0 is the bias. */
  val FeatureNames: Seq[String] =
    Seq("bias", "log_chars", "log_words", "avg_word_len", "punct_ratio",
      "stopword_ratio")

  /** Feature expressions over a [[TextAnalysis.textStats]] output. `log` is the
    * natural log; `1 +` keeps empty documents finite.
    */
  def featureExprs: Seq[Column] = Seq(
    lit(1.0),
    log(lit(1.0) + col("n_chars")),
    log(lit(1.0) + col("n_words")),
    col("avg_word_len"),
    col("punct_ratio"),
    col("stopword_ratio"))

  /** σ(w·x) as a single codegen'd column over a textStats row. */
  def scoreExpr(weights: Seq[Double]): Column = {
    require(weights.length == featureExprs.length,
      s"expected ${featureExprs.length} weights, got ${weights.length}")
    val z = weights.zip(featureExprs)
      .map { case (w, f) => lit(w) * f }.reduceLeft(_ + _)
    lit(1.0) / (lit(1.0) + exp(-z))
  }

  /** Scores raw documents: `(idCol, quality ∈ (0,1))`. */
  def score(docs: DataFrame, weights: Seq[Double], idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    TextAnalysis.textStats(docs, idCol, textCol)
      .select(col(idCol), scoreExpr(weights).as("quality"))

  /** Mean log-loss of `weights` against a labeled textStats frame (one scalar
    * aggregate; the epsilon clamp keeps saturated predictions finite).
    */
  def logLoss(stats: DataFrame, labelCol: String, weights: Seq[Double]): Double = {
    val y = col(labelCol).cast("double")
    val p = scoreExpr(weights)
    val eps = lit(1e-12)
    stats.select(avg(-(y * log(greatest(p, eps))
      + (lit(1.0) - y) * log(greatest(lit(1.0) - p, eps)))).as("loss"))
      .first().getDouble(0)
  }

  /** Full-batch gradient descent on labeled textStats rows (`labelCol` ∈ {0,1});
    * returns the learned weights, index-aligned with [[FeatureNames]].
    */
  def train(stats: DataFrame, labelCol: String, iterations: Int = 100,
      learningRate: Double = 0.5, l2: Double = 0.0): Array[Double] = {
    val k = featureExprs.length
    val data = stats
      .select(array(featureExprs: _*).as("x"), col(labelCol).cast("double").as("y"))
      .rdd.map(r => (r.getSeq[Double](0).toArray, r.getDouble(1)))
      .persist(StorageLevel.MEMORY_AND_DISK) // multi-pass: one scan per GD iteration
    val n = data.count().toDouble
    require(n > 0, "cannot train on an empty dataset")
    var weights = new Array[Double](k)
    for (_ <- 0 until iterations) {
      val w = weights // stable closure capture for this iteration
      val grad = data.treeAggregate(new Array[Double](k))(
        seqOp = { (g, xy) =>
          val (x, y) = xy
          var z = 0.0
          var i = 0
          while (i < k) { z += w(i) * x(i); i += 1 }
          val p = 1.0 / (1.0 + math.exp(-z))
          i = 0
          while (i < k) { g(i) += (p - y) * x(i); i += 1 }
          g
        },
        combOp = { (a, b) =>
          var i = 0
          while (i < k) { a(i) += b(i); i += 1 }
          a
        })
      weights = Array.tabulate(k)(i =>
        w(i) - learningRate * (grad(i) / n + l2 * w(i)))
    }
    data.unpersist()
    weights
  }
}
