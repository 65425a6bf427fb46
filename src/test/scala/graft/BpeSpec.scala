package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Bpe

class BpeSpec extends AnyFunSuite with SharedSpark {

  private def mkDocs(rows: Seq[(Long, String)]) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("train: first merge is the most frequent weighted pair, ties break on pair") {
    // "low" x5, "lower" x2: pair (l,o) freq 7, (o,w) freq 7, (w,e) 2, (e,r) 2
    // tie between (l,o) and (o,w) → lexicographic: (l,o) first
    val m = Bpe.trainFromCounts(Seq("low" -> 5L, "lower" -> 2L), numMerges = 2)
    assert(m.merges.head === ("l", "o"))
    // after (l,o): "lo w" x5, "lo w e r" x2 → (lo,w)=7 wins
    assert(m.merges(1) === ("lo", "w"))
  }

  test("train: minPairFreq stops before memorizing hapax pairs") {
    val m = Bpe.trainFromCounts(Seq("abc" -> 1L), numMerges = 10, minPairFreq = 2)
    assert(m.merges.isEmpty)
    val m2 = Bpe.trainFromCounts(Seq("abc" -> 1L), numMerges = 10, minPairFreq = 1)
    assert(m2.merges.nonEmpty)
  }

  test("encodeWord: zero merges = chars; frequent word converges to one piece") {
    val empty = Bpe.BpeModel(Nil)
    assert(empty.encodeWord("hello") === Vector("h", "e", "l", "l", "o"))
    assert(empty.encodeWord("") === Vector.empty)
    assert(empty.encodeWord("x") === Vector("x"))
    val m = Bpe.trainFromCounts(Seq("low" -> 10L), numMerges = 10, minPairFreq = 2)
    assert(m.encodeWord("low") === Vector("low"))
  }

  test("encodeWord: lossless and rank-greedy on overlapping repeats") {
    val m = Bpe.BpeModel(Seq(("a", "a")))
    // all non-overlapping occurrences merge left-to-right per pass
    assert(m.encodeWord("aaaa") === Vector("aa", "aa"))
    assert(m.encodeWord("aaa") === Vector("aa", "a"))
    val samples = Seq("banana", "aabbaabb", "mississippi", "zzz")
    val trained = Bpe.trainFromCounts(
      samples.map(_ -> 3L), numMerges = 20, minPairFreq = 2)
    samples.foreach { w =>
      assert(trained.encodeWord(w).mkString === w, s"lossy encode of $w")
    }
  }

  test("train is deterministic") {
    val corpus = Seq("spark" -> 4L, "sparse" -> 3L, "park" -> 5L, "dark" -> 2L)
    val a = Bpe.trainFromCounts(corpus, numMerges = 8)
    val b = Bpe.trainFromCounts(corpus, numMerges = 8)
    assert(a.merges === b.merges)
  }

  test("distributed train + encode: lossless, memo-consistent with driver encode") {
    implicit val s = spark
    val df = Tables.documents(spark, sf).limit(200).cache()
    val model = Bpe.train(df, numMerges = 64)
    assert(model.merges.nonEmpty)
    val enc = Bpe.encode(df, model).cache()
    assert(enc.count() === df.count())
    // lossless: pieces concat (with the word boundaries dropped) == normalized text
    val bad = enc.join(df, "doc_id")
      .withColumn("rebuilt", concat_ws("", col("pieces")))
      .withColumn("expected",
        regexp_replace(trim(lower(col("text"))), "\\s+", ""))
      .filter(col("rebuilt") =!= col("expected"))
    assert(bad.count() === 0)
    // fertility bounds: one word is at least one piece, at most its chars
    assert(enc.filter(col("n_pieces") < col("n_words")).count() === 0)
    assert(enc.filter(col("fertility") < 1.0 && col("n_words") > 0).count() === 0)
    // driver/executor agreement on a sampled word
    val word = df.select(explode(split(trim(lower(col("text"))), "\\s+")).as("w"))
      .filter(col("w") =!= "").orderBy("w").first().getString(0)
    val viaDriver = model.encodeWord(word)
    assert(viaDriver.mkString === word)
    enc.unpersist(); df.unpersist()
  }

  test("fertilityByGroup: totals reconcile with per-doc encode, fertility >= 1") {
    implicit val s = spark
    val df = Tables.documents(spark, sf).limit(100).cache()
    val model = Bpe.train(df, numMerges = 32)
    val rep = Bpe.fertilityByGroup(df, model, "lang").cache()
    assert(rep.count() === df.select("lang").distinct().count())
    assert(rep.filter(col("fertility") < 1.0).count() === 0)
    val totals = rep.agg(sum("n_words"), sum("n_pieces")).first()
    val enc = Bpe.encode(df, model).agg(sum("n_words"), sum("n_pieces")).first()
    assert(totals.getLong(0) === enc.getLong(0))
    assert(totals.getLong(1) === enc.getLong(1))
    rep.unpersist(); df.unpersist()
  }

  test("model round trip: written and reloaded merges encode identically") {
    implicit val s = spark
    val df = Tables.documents(spark, sf).limit(100)
    val model = Bpe.train(df, numMerges = 32)
    val dir = java.nio.file.Files.createTempDirectory("bpe_model").toString
    Bpe.writeModel(model, dir)
    val back = Bpe.readModel(dir)
    assert(back.merges === model.merges)
    val enc1 = Bpe.encode(df, model).orderBy("doc_id")
    val enc2 = Bpe.encode(df, back).orderBy("doc_id")
    assert(enc1.exceptAll(enc2).count() === 0)
  }

  test("more merges never lengthen the encoding of a trained word") {
    val corpus = Seq("training" -> 9L, "train" -> 7L, "rain" -> 5L, "ring" -> 4L)
    val small = Bpe.trainFromCounts(corpus, numMerges = 3)
    val big = Bpe.trainFromCounts(corpus, numMerges = 12)
    corpus.map(_._1).foreach { w =>
      assert(big.encodeWord(w).length <= small.encodeWord(w).length, w)
    }
  }
}
