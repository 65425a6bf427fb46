package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.UnigramTokenizer
import graft.ops.UnigramTokenizer.UnigramModel

/** Unigram-LM (SentencePiece-family) tokenizer: Viterbi segmentation
  * semantics, the seed→EM→prune trainer, losslessness, and the distributed
  * encode contract.
  */
class UnigramTokenizerSpec extends AnyFunSuite with SharedSpark {

  test("Viterbi picks the max-probability segmentation, not the greedy one") {
    // greedy longest-from-left says ab|c; the probabilities say a|bc
    val m = UnigramModel(Map(
      "a" -> math.log(0.2), "b" -> math.log(0.05), "c" -> math.log(0.1),
      "ab" -> math.log(0.4), "bc" -> math.log(0.45)), -100.0)
    assert(m.encodeWord("abc") == Vector("a", "bc")) // 0.09 beats 0.04
  }

  test("encoding is lossless, even over characters the model never saw") {
    val m = UnigramModel(Map("a" -> math.log(0.5), "b" -> math.log(0.5)), -100.0)
    for (w <- Seq("abab", "azb", "zzz", "", "a"))
      assert(m.encodeWord(w).mkString == w, s"round-trip broke on '$w'")
  }

  test("frequent words survive training as single pieces; vocab budget holds") {
    val corpus = Seq("lower" -> 100L, "lowest" -> 80L, "newer" -> 60L,
      "newest" -> 50L, "wide" -> 5L)
    val chars = corpus.flatMap(_._1.toSeq).map(_.toString).distinct.size
    val m = UnigramTokenizer.trainFromCounts(corpus, vocabSize = chars + 6,
      maxPieceLen = 6)
    assert(m.learnedVocab.size <= 6, s"budget breached: ${m.learnedVocab}")
    // the dominant word segments into far fewer pieces than characters
    assert(m.encodeWord("lower").length <= 2, m.encodeWord("lower").toString)
    // and every char remains decodable after pruning
    for ((w, _) <- corpus) assert(m.encodeWord(w).mkString == w)
  }

  test("training is deterministic and input-order-invariant") {
    val corpus = Seq("alpha" -> 9L, "alps" -> 7L, "beta" -> 5L, "bet" -> 3L)
    val a = UnigramTokenizer.trainFromCounts(corpus, vocabSize = 20)
    val b = UnigramTokenizer.trainFromCounts(corpus.reverse, vocabSize = 20)
    assert(a.logProbs == b.logProbs)
  }

  test("model round-trips through parquet; encode is a no-shuffle map") {
    implicit val s = spark
    import org.apache.spark.sql.functions._
    import s.implicits._
    val docs = Seq((0L, "river bank bank"), (1L, "river river flow"))
      .toDF("doc_id", "text")
    val m = UnigramTokenizer.train(docs, vocabSize = 40, maxPieceLen = 5)
    val dir = java.nio.file.Files.createTempDirectory("graft_unigram").toString
    UnigramTokenizer.writeModel(m, dir)
    val m2 = UnigramTokenizer.readModel(dir)
    assert(m2.logProbs == m.logProbs &&
      m2.fallbackLogProb == m.fallbackLogProb)

    val enc = UnigramTokenizer.encode(docs, m2)
    assert(!enc.queryExecution.executedPlan.toString.contains("Exchange"),
      "encode must be pure map work")
    val r = enc.orderBy("doc_id").collect()
    // a piece never spans a word boundary, so pieces-per-word is at least 1
    assert(r.forall(_.getAs[Double]("fertility") >= 1.0 - 1e-9), r.mkString(";"))
    // losslessness end-to-end: pieces concat back to the lowercased words
    val row0 = r(0)
    assert(row0.getSeq[String](1).mkString == "riverbankbank")
  }

  test("encode is partition-invariant; readModel round-trips a non-trivial vocab") {
    implicit val s = spark
    import org.apache.spark.sql.functions._
    import s.implicits._
    // repeated morphemes → a genuinely multi-piece learned vocabulary
    val words = Seq("internationalization", "internationalize", "nation",
      "national", "internal", "internet", "relation", "relational")
    val docs = (0L until 64L).map(i =>
        (i, (0 to (i % 5).toInt)
          .map(k => words(((i + k) % words.length).toInt)).mkString(" ")))
      .toDF("doc_id", "text")
    val m = UnigramTokenizer.train(docs, vocabSize = 80, maxPieceLen = 6)
    assert(m.learnedVocab.nonEmpty, "vocab must hold multi-char pieces")
    val dir = java.nio.file.Files.createTempDirectory("graft_unigram_nt").toString
    UnigramTokenizer.writeModel(m, dir)
    val m2 = UnigramTokenizer.readModel(dir)
    assert(m2.logProbs == m.logProbs && m2.fallbackLogProb == m.fallbackLogProb)

    def enc(df: org.apache.spark.sql.DataFrame): Seq[(Long, Seq[String])] =
      UnigramTokenizer.encode(df, m2).orderBy("doc_id").collect()
        .map(r => (r.getLong(0), r.getSeq[String](1))).toSeq
    val base = enc(docs.repartition(1))
    assert(enc(docs.repartition(7)) == base,
      "encode must not depend on partitioning")
    assert(enc(docs.repartition(32, col("doc_id"))) == base)
  }

  test("unigram fertility is competitive with BPE on a repetitive corpus") {
    implicit val s = spark
    import s.implicits._
    val docs = (0 until 50).map(i =>
      (i.toLong, "tokenization tokenizes the tokenizer tokens"))
      .toDF("doc_id", "text")
    val uni = UnigramTokenizer.train(docs, vocabSize = 60, maxPieceLen = 8)
    val fert = UnigramTokenizer.encode(docs, uni)
      .agg(org.apache.spark.sql.functions.avg("fertility")).head().getDouble(0)
    // 5 words; with a 60-piece budget the big shared stems collapse — pieces
    // per word must land far below the character baseline (~8.6 chars/word)
    assert(fert < 4.0, s"unigram fertility $fert — vocabulary never learned")
  }
}
