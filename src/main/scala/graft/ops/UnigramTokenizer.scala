package graft.ops

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Unigram-LM subword tokenizer — the SentencePiece unigram model (Kudo 2018,
  * "Subword Regularization"): score a segmentation as the product of piece
  * unigram probabilities, pick the max by Viterbi, learn the piece inventory
  * by EM with a shrinking schedule. The OTHER subword family next to [[Bpe]]:
  * BPE grows a vocab bottom-up by merges, unigram starts from an over-large
  * seed and prunes toward the target — production tokenizers (Llama, T5,
  * XLNet lineage) ship this model.
  *
  * Faithful simplifications, documented rather than hidden:
  *  - HARD EM: the E-step counts pieces along the single Viterbi path per
  *    word (SentencePiece's default final decode) instead of full
  *    forward-backward expectations — same fixed points on the corpora this
  *    targets, and the counts stay exact integers, which keeps training
  *    bit-deterministic.
  *  - Pruning drops the lowest-Viterbi-count pieces per round (a frequency
  *    schedule) rather than ranking by exact likelihood loss.
  *
  * Scale design mirrors [[Bpe]]: the ONLY pass over the corpus is the
  * word-frequency aggregation (one combine shuffle); seeding, EM, and pruning
  * run driver-side over the capped distinct-word table (corpus-independent
  * size, Heaps' law); encoding broadcasts the model and streams through
  * `mapPartitions` with a per-partition word→pieces memo — no shuffle, no
  * driver involvement.
  */
object UnigramTokenizer {

  /** piece → natural-log probability. Every single character is decodable:
    * chars absent from the table score `fallbackLogProb`, so encoding is
    * lossless on any input (SentencePiece's byte/char fallback contract).
    */
  final case class UnigramModel(logProbs: Map[String, Double],
      fallbackLogProb: Double) extends Serializable {

    @transient lazy val maxPieceLen: Int =
      if (logProbs.isEmpty) 1 else logProbs.keysIterator.map(_.length).max

    /** Viterbi segmentation: maximize Σ log p(piece). Ties break toward the
      * longest last piece at every position (the first candidate scanned),
      * so the result is deterministic.
      */
    def encodeWord(word: String): Vector[String] = {
      if (word.isEmpty) return Vector.empty
      val n = word.length
      val best = Array.fill(n + 1)(Double.NegativeInfinity)
      val back = new Array[Int](n + 1)
      best(0) = 0.0
      var i = 1
      while (i <= n) {
        var j = math.max(0, i - maxPieceLen)
        while (j < i) {
          val piece = word.substring(j, i)
          val lp =
            if (piece.length == 1) logProbs.getOrElse(piece, fallbackLogProb)
            else logProbs.getOrElse(piece, Double.NegativeInfinity)
          if (lp > Double.NegativeInfinity && best(j) > Double.NegativeInfinity) {
            val s = best(j) + lp
            // strict >: the smallest j (longest last piece) wins ties
            if (s > best(i)) { best(i) = s; back(i) = j }
          }
          j += 1
        }
        i += 1
      }
      val out = mutable.ArrayBuffer.empty[String]
      var k = n
      while (k > 0) { out += word.substring(back(k), k); k = back(k) }
      out.reverseIterator.toVector
    }

    /** The learned multi-character inventory (single chars are implicit). */
    def learnedVocab: Set[String] = logProbs.keySet.filter(_.length > 1)
  }

  /** Train on a corpus: ONE distributed word-count pass, then the driver-side
    * seed → EM → prune schedule over at most `maxDistinctWords` words.
    * `vocabSize` bounds the TOTAL piece count (single chars included; they are
    * never pruned — decodability beats the budget when the two conflict).
    */
  def train(df: DataFrame, vocabSize: Int, textCol: String = "text",
      maxPieceLen: Int = 8, emRounds: Int = 2, pruneFraction: Double = 0.25,
      seedSize: Int = 1 << 16, maxDistinctWords: Int = 1 << 17): UnigramModel = {
    val freq = Bpe.wordCounts(df, textCol)
      .orderBy(col("n").desc, col("word"))
      .limit(maxDistinctWords)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
    trainFromCounts(freq.toSeq, vocabSize, maxPieceLen, emRounds,
      pruneFraction, seedSize)
  }

  /** The driver-side learner, exposed for tests and for callers holding a
    * saved word-frequency table. Deterministic: every materialization sorts,
    * counts are exact Longs, probabilities are derived once per round.
    */
  def trainFromCounts(wordFreq: Seq[(String, Long)], vocabSize: Int,
      maxPieceLen: Int = 8, emRounds: Int = 2, pruneFraction: Double = 0.25,
      seedSize: Int = 1 << 16): UnigramModel = {
    require(vocabSize > 0, "vocabSize must be positive")
    require(pruneFraction > 0 && pruneFraction < 1, "pruneFraction in (0,1)")

    // ---- seed: every substring up to maxPieceLen, weighted by word freq ----
    val subCounts = mutable.HashMap.empty[String, Long]
    wordFreq.foreach { case (w, c) =>
      var i = 0
      while (i < w.length) {
        var l = 1
        while (l <= maxPieceLen && i + l <= w.length) {
          val s = w.substring(i, i + l)
          subCounts.update(s, subCounts.getOrElse(s, 0L) + c)
          l += 1
        }
        i += 1
      }
    }
    val chars: Set[String] = subCounts.keysIterator.filter(_.length == 1).toSet
    val seedMultis = subCounts.iterator.filter(_._1.length > 1).toSeq
      .sortBy { case (p, c) => (-c, p) }.take(seedSize).map(_._1)
    var multis: Set[String] = seedMultis.toSet
    val targetMultis = math.max(0, vocabSize - chars.size)

    // log p from integer counts; +1 smoothing on single chars keeps every
    // char alive (a zero-count char would break decodability)
    def normalize(counts: Map[String, Long]): Map[String, Double] = {
      val kept = (multis.iterator.map(p => p -> counts.getOrElse(p, 0L)) ++
        chars.iterator.map(c => c -> (counts.getOrElse(c, 0L) + 1L))).toSeq
      val total = kept.iterator.map(_._2).sum.toDouble
      kept.iterator.filter(_._2 > 0L)
        .map { case (p, c) => p -> math.log(c / total) }.toMap
    }

    def eStep(m: UnigramModel): Map[String, Long] = {
      val counts = mutable.HashMap.empty[String, Long]
      wordFreq.foreach { case (w, c) =>
        m.encodeWord(w).foreach(p =>
          counts.update(p, counts.getOrElse(p, 0L) + c))
      }
      counts.toMap
    }

    var model = UnigramModel(normalize(
      subCounts.filter(kv => kv._1.length == 1 || multis(kv._1)).toMap),
      fallbackLogProb = -100.0)
    var round = 0
    while (round < emRounds) {
      model = UnigramModel(normalize(eStep(model)), model.fallbackLogProb)
      round += 1
    }

    // shrinking schedule: drop the lowest-Viterbi-count multis per round
    // (zero-count first — they are free), re-estimate, repeat to the target
    while (multis.size > targetMultis) {
      val counts = eStep(model)
      val ranked = multis.toSeq
        .map(p => (p, counts.getOrElse(p, 0L)))
        .sortBy { case (p, c) => (c, p) }
      val over = multis.size - targetMultis
      val drop = math.min(over,
        math.max(1, math.ceil(multis.size * pruneFraction).toInt))
      multis = multis -- ranked.take(drop).map(_._1)
      model = UnigramModel(normalize(counts), model.fallbackLogProb)
    }
    model
  }

  /** Persist: one parquet of (piece, log_prob) plus the fallback under the
    * reserved empty-string piece (no real piece is empty). Overwrites.
    */
  def writeModel(model: UnigramModel, dir: String)(
      implicit spark: SparkSession): Unit = {
    import spark.implicits._
    (model.logProbs.toSeq.sortBy(_._1) :+ ("" -> model.fallbackLogProb))
      .toDF("piece", "log_prob")
      .coalesce(1).write.mode("overwrite").parquet(dir)
  }

  def readModel(dir: String)(implicit spark: SparkSession): UnigramModel = {
    val rows = spark.read.parquet(dir).collect()
      .map(r => (r.getAs[String]("piece"), r.getAs[Double]("log_prob")))
    UnigramModel(rows.filter(_._1.nonEmpty).toMap,
      rows.find(_._1.isEmpty).map(_._2).getOrElse(-100.0))
  }

  /** Encode every document: `(doc_id, pieces, n_words, n_pieces, fertility)` —
    * the same contract as [[Bpe.encode]], so fertility reports compare the two
    * tokenizer families directly. Broadcast model, per-partition memo, no
    * shuffle.
    */
  def encode(df: DataFrame, model: UnigramModel, idCol: String = "doc_id",
      textCol: String = "text")(implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(model)
    val encoded = df.select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .mapPartitions { it =>
        val m = bc.value
        val memo = mutable.HashMap.empty[String, Vector[String]]
        it.map { case (id, text) =>
          val ws = Option(text).getOrElse("").trim.toLowerCase
            .split("\\s+").filter(_.nonEmpty)
          val pieces = ws.toSeq.flatMap(w => memo.getOrElseUpdate(w, m.encodeWord(w)))
          (id, pieces, ws.length, pieces.length)
        }
      }
      .toDF("doc_id", "pieces", "n_words", "n_pieces")
    encoded.withColumn("fertility",
      when(col("n_words") > 0,
        col("n_pieces").cast("double") / col("n_words")).otherwise(0.0))
  }
}
