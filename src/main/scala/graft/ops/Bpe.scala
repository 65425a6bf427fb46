package graft.ops

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer: distributed training-corpus statistics, driver-side
  * merge learning, distributed encoding — the "train a tokenizer on the corpus you
  * just cleaned" step of an LLM data pipeline (Sennrich et al. 2016, "Neural Machine
  * Translation of Rare Words with Subword Units").
  *
  * Scale design: the ONLY pass over the corpus is a word-frequency aggregation (one
  * combine shuffle, map-side partial counts — the same shape as every other count
  * here). The merge loop then runs on the *distinct-word* frequency table, whose size
  * is corpus-independent for a fixed cap (Heaps' law; `maxDistinctWords` bounds it
  * hard, keeping the most frequent words — exactly what every production BPE trainer
  * does). Encoding broadcasts the learned merge ranks and streams the corpus through
  * `mapPartitions` with a per-partition word→pieces memo, so each distinct word per
  * partition is encoded once regardless of how often it repeats. No shuffle, no
  * driver involvement, no state beyond the broadcast.
  */
object Bpe {

  /** An ordered BPE merge list. Rank = position in `merges` (lower merges first).
    * Encoding is the classic rank-greedy loop: repeatedly merge the adjacent pair
    * with the lowest rank until none applies — the exact algorithm GPT-2-style
    * tokenizers use, so the same merge table yields the same segmentation.
    */
  final case class BpeModel(merges: Seq[(String, String)]) extends Serializable {

    @transient lazy val ranks: Map[(String, String), Int] =
      merges.zipWithIndex.toMap

    /** Segment one word. Lossless: pieces always concatenate back to the word. */
    def encodeWord(word: String): Vector[String] = {
      // grapheme-naive char split is fine here: NFC-normalize upstream
      // (TextAnalysis.normalizeText) if combining sequences matter
      var parts: Vector[String] = word.map(_.toString).toVector
      var done = parts.length < 2
      while (!done) {
        var bestRank = Int.MaxValue
        var i = 0
        while (i < parts.length - 1) {
          val r = ranks.getOrElse((parts(i), parts(i + 1)), Int.MaxValue)
          if (r < bestRank) bestRank = r
          i += 1
        }
        if (bestRank == Int.MaxValue) done = true
        else {
          val (a, b) = merges(bestRank)
          // merge every non-overlapping occurrence left-to-right
          val out = Vector.newBuilder[String]
          var j = 0
          while (j < parts.length) {
            if (j < parts.length - 1 && parts(j) == a && parts(j + 1) == b) {
              out += (a + b); j += 2
            } else { out += parts(j); j += 1 }
          }
          parts = out.result()
        }
      }
      parts
    }

    /** The symbol vocabulary the merges imply: single characters stay implicit
      * (byte/char fallback); this is the set of LEARNED multi-char symbols.
      */
    def learnedVocab: Set[String] = merges.map { case (a, b) => a + b }.toSet
  }

  /** Distributed word-frequency table: `(word, n)` over lowercased whitespace
    * tokens — one combine shuffle; the input to [[train]].
    */
  def wordCounts(df: DataFrame, textCol: String = "text"): DataFrame =
    df.select(explode(split(trim(lower(col(textCol))), "\\s+")).as("word"))
      .filter(col("word") =!= "")
      .groupBy("word").agg(count(lit(1)).as("n"))

  /** Learn `numMerges` merges from the corpus. The distributed part is ONE
    * word-count aggregation; the loop runs driver-side over at most
    * `maxDistinctWords` (kept by frequency, word-lexicographic tiebreak — fully
    * deterministic). `minPairFreq` stops before memorizing pairs that occur once.
    *
    * Loop cost is O(numMerges × Σ|word symbols|) over DISTINCT words — independent
    * of corpus row count, which is what makes this viable at 100 TB: the cluster
    * does the counting, the driver does the (small) learning, the cluster does the
    * encoding.
    */
  def train(df: DataFrame, numMerges: Int, textCol: String = "text",
      minPairFreq: Long = 2L, maxDistinctWords: Int = 1 << 20): BpeModel = {
    require(numMerges >= 0, "numMerges must be >= 0")
    val freq: Array[(String, Long)] = wordCounts(df, textCol)
      .orderBy(col("n").desc, col("word"))
      .limit(maxDistinctWords)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
    trainFromCounts(freq.toSeq, numMerges, minPairFreq)
  }

  /** The driver-side merge loop, exposed for tests and for callers that already
    * hold a word-frequency table (e.g. from a saved [[wordCounts]] output).
    */
  def trainFromCounts(wordFreq: Seq[(String, Long)], numMerges: Int,
      minPairFreq: Long = 2L): BpeModel = {
    val words: Array[mutable.ArrayBuffer[String]] =
      wordFreq.map { case (w, _) =>
        mutable.ArrayBuffer.from(w.map(_.toString))
      }.toArray
    val counts: Array[Long] = wordFreq.map(_._2).toArray
    val merges = mutable.ArrayBuffer.empty[(String, String)]
    var iter = 0
    var exhausted = false
    while (iter < numMerges && !exhausted) {
      // count adjacent pairs, weighted by word frequency (overlaps counted, as in
      // the original algorithm — only the argmax matters and ties break on pair)
      val pc = mutable.HashMap.empty[(String, String), Long]
      var wi = 0
      while (wi < words.length) {
        val syms = words(wi); val c = counts(wi)
        var i = 0
        while (i < syms.length - 1) {
          val k = (syms(i), syms(i + 1))
          pc.update(k, pc.getOrElse(k, 0L) + c)
          i += 1
        }
        wi += 1
      }
      if (pc.isEmpty) exhausted = true
      else {
        val best = pc.reduceLeft { (x, y) =>
          if (y._2 > x._2 || (y._2 == x._2 &&
            Ordering[(String, String)].lt(y._1, x._1))) y else x
        }
        if (best._2 < minPairFreq) exhausted = true
        else {
          val (a, b) = best._1
          merges += best._1
          wi = 0
          while (wi < words.length) {
            val syms = words(wi)
            var i = 0
            while (i < syms.length - 1) {
              if (syms(i) == a && syms(i + 1) == b) {
                syms.update(i, a + b)
                syms.remove(i + 1)
              }
              i += 1 // post-merge advance also skips overlap re-use, left-to-right
            }
            wi += 1
          }
        }
      }
      iter += 1
    }
    BpeModel(merges.toSeq)
  }

  /** Persist a trained model: one parquet table of (rank, left, right) — rank IS
    * the row's merge order, so any engine (or a later session) reloads the exact
    * tokenizer. Overwrites.
    */
  def writeModel(model: BpeModel, dir: String)(
      implicit spark: SparkSession): Unit = {
    import spark.implicits._
    model.merges.zipWithIndex
      .map { case ((a, b), r) => (r, a, b) }
      .toDF("rank", "left", "right")
      .coalesce(1)
      .write.mode("overwrite").parquet(dir)
  }

  /** Reload a model written by [[writeModel]] — rank order restored exactly. */
  def readModel(dir: String)(implicit spark: SparkSession): BpeModel =
    BpeModel(spark.read.parquet(dir)
      .orderBy("rank")
      .collect()
      .map(r => (r.getAs[String]("left"), r.getAs[String]("right")))
      .toSeq)

  /** Per-group tokenizer fertility report: mean pieces-per-word, word and piece
    * totals per group (language, source, …) — the table a corpus report tracks to
    * see which slices a tokenizer serves poorly (high fertility = more compute per
    * word for those documents). One encode pass + one tiny group aggregation.
    */
  def fertilityByGroup(df: DataFrame, model: BpeModel, groupCol: String,
      idCol: String = "doc_id", textCol: String = "text")(
      implicit spark: SparkSession): DataFrame = {
    val enc = encode(df, model, idCol, textCol)
    df.select(col(idCol).cast("long").as("doc_id"), col(groupCol).as("group"))
      .join(enc, "doc_id")
      .groupBy(col("group"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_words")).as("n_words"),
        sum(col("n_pieces")).as("n_pieces"))
      .withColumn("fertility",
        when(col("n_words") > 0,
          col("n_pieces").cast("double") / col("n_words")).otherwise(0.0))
  }

  /** Encode every document: `(doc_id, pieces, n_words, n_pieces, fertility)`.
    * Fertility (pieces per word) is THE tokenizer-quality metric corpus reports
    * track per language/source. Broadcast model, per-partition memo, no shuffle.
    */
  def encode(df: DataFrame, model: BpeModel, idCol: String = "doc_id",
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
