package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{RollingHash, SimHash64}
import graft.ops.Multimodal
import org.apache.spark.unsafe.types.UTF8String

/** Property-based tests for the pure computational kernels (no Spark session needed,
  * so ScalaCheck generators can run hundreds of cases cheaply). Deterministic seed.
  */
class KernelPropertySpec extends AnyFunSuite {

  private def forAll[A](gen: Gen[A], cases: Int = 100)(f: A => Unit): Unit = {
    val params = Gen.Parameters.default
    var seed = Seed(12345L)
    var run = 0
    var tries = 0
    while (run < cases && tries < cases * 10) {
      gen.apply(params, seed).foreach { a => f(a); run += 1 }
      seed = seed.next
      tries += 1
    }
    assert(run > cases / 2, s"generator too sparse: only $run cases produced")
  }

  private def forAll[A, B](ga: Gen[A], gb: Gen[B])(f: (A, B) => Unit): Unit =
    forAll(Gen.zip(ga, gb))(p => f(p._1, p._2))

  private def forAll[A, B, C](ga: Gen[A], gb: Gen[B], gc: Gen[C])(
      f: (A, B, C) => Unit): Unit =
    forAll(Gen.zip(ga, gb, gc))(p => f(p._1, p._2, p._3))

  private val asciiText: Gen[String] =
    Gen.listOf(Gen.oneOf(Gen.alphaNumStr.map(_.take(8)), Gen.const(" ")))
      .map(_.mkString(" ")).map(_.take(200))

  test("rolling hash: range [0, MOD), deterministic, prefix-sensitive") {
    forAll(asciiText) { s =>
      val h = RollingHash.hashString(s)
      assert(h >= 0L && h < RollingHash.RANGE)
      assert(h === RollingHash.hashString(s))
    }
    forAll(Gen.alphaNumStr.suchThat(_.nonEmpty)) { s =>
      // appending a character changes the hash (mod collision probability ~2^-61)
      assert(RollingHash.hashString(s) !== RollingHash.hashString(s + "x"))
    }
  }

  test("rolling hash: modular structure holds (no silent long overflow)") {
    // each 31-bit stream must satisfy the recurrence h' = (h*B + b) mod p exactly
    val bytes = "abcdefgh".getBytes("UTF-8")
    var h1 = 0L; var h2 = 0L
    bytes.foreach { b =>
      h1 = (h1 * RollingHash.BASE1 + (b & 0xff)) % RollingHash.MOD1
      h2 = (h2 * RollingHash.BASE2 + (b & 0xff)) % RollingHash.MOD2
      // invariant the old 61-bit formulation violated: h*base never overflows
      assert(h1 < RollingHash.MOD1 && h1 * RollingHash.BASE1 > 0)
      assert(h2 < RollingHash.MOD2 && h2 * RollingHash.BASE2 > 0)
    }
    assert(RollingHash.hashBytes(bytes) === ((h1 << 31) | h2))
  }

  test("native tokenization matches Spark split(trim(s)) on whitespace edge cases") {
    // Spark trim strips only SPACE; Java String.trim strips all <= U+0020 — these
    // inputs distinguish the two (and Java split's trailing-empty dropping)
    val edges = Seq("\thello world", "hello world\n", "  padded  ", "a\t\tb", "\n\n")
    edges.foreach { s =>
      val native = SimHash64.sparkTokens(UTF8String.fromString(s)).toSeq
      val spark = {
        var from = 0; var to = s.length
        while (from < to && s.charAt(from) == ' ') from += 1
        while (to > from && s.charAt(to - 1) == ' ') to -= 1
        s.substring(from, to).split("\\s+", -1).toSeq
      }
      assert(native === spark, s"for input ${s.map(_.toInt)}")
    }
  }

  test("simhash kernel: deterministic and invariant under token reordering") {
    val tokensGen = Gen.nonEmptyListOf(Gen.identifier.map(_.take(6)))
    forAll(tokensGen) { tokens =>
      val a = SimHash64.compute(UTF8String.fromString(tokens.mkString(" ")))
      val shuffled = scala.util.Random.shuffle(tokens)
      val b = SimHash64.compute(UTF8String.fromString(shuffled.mkString(" ")))
      assert(a === b, "simhash is a bag-of-tokens signature; order must not matter")
    }
  }

  test("simhash kernel: small mutations keep hamming distance below unrelated texts") {
    val base = (1 to 30).map(i => s"tok$i")
    val mutated = base.updated(15, "MUTATED")
    val unrelated = (100 to 129).map(i => s"other$i")
    def sig(ts: Seq[String]) = SimHash64.compute(UTF8String.fromString(ts.mkString(" ")))
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(sig(base), sig(mutated)) < ham(sig(base), sig(unrelated)))
  }

  test("resize stub: output length is ceil(n/factor), content is a subsequence") {
    forAll(Gen.chooseNum(0, 500), Gen.chooseNum(1, 20)) { (n: Int, factor: Int) =>
      val content = Array.tabulate(n)(_.toByte)
      val out = Multimodal.resizeStub(content, factor)
      assert(out.length === (n + factor - 1) / factor)
      assert(out.toSeq === content.indices.filter(_ % factor == 0).map(content(_)))
    }
  }

  test("frame sample stub: frames tile the payload with the expected stride") {
    forAll(Gen.chooseNum(1, 500), Gen.chooseNum(1, 32), Gen.chooseNum(1, 5)) {
      (n: Int, frameBytes: Int, nth: Int) =>
        val content = Array.tabulate(n)(_.toByte)
        val frames = Multimodal.frameSampleStub(content, frameBytes, nth)
        val totalFrames = (n + frameBytes - 1) / frameBytes
        assert(frames.size === (totalFrames + nth - 1) / nth)
        assert(frames.head.toSeq === content.take(math.min(frameBytes, n)).toSeq)
    }
  }

  test("bpe: training + encoding are lossless and deterministic on random corpora") {
    import graft.ops.Bpe
    val word = Gen.choose(1, 12).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf('a', 'b', 'c', 'd')).map(_.mkString))
    val corpus = Gen.choose(1, 15).flatMap(k =>
      Gen.listOfN(k, Gen.zip(word, Gen.choose(1L, 20L))))
    forAll(corpus, cases = 60) { wf =>
      val dedup = wf.toMap.toSeq // unique words, deterministic enough for training
      val m1 = Bpe.trainFromCounts(dedup, numMerges = 16)
      val m2 = Bpe.trainFromCounts(dedup, numMerges = 16)
      assert(m1.merges === m2.merges, "training must be deterministic")
      dedup.foreach { case (w, _) =>
        val pieces = m1.encodeWord(w)
        assert(pieces.mkString === w, s"lossy encode of '$w' via ${m1.merges}")
        assert(pieces.nonEmpty && pieces.length <= w.length)
      }
      // unseen words still encode losslessly (char fallback + learned merges)
      assert(m1.encodeWord("dcba").mkString === "dcba")
    }
  }

  test("unigram: train + Viterbi encode are lossless and deterministic on fuzzed unicode") {
    import graft.ops.UnigramTokenizer
    val uchar: Gen[Char] = Gen.frequency(
      6 -> Gen.alphaNumChar,
      2 -> Gen.oneOf('é', 'ß', 'ü', 'λ', 'Ω', 'я', '中', '文'),
      1 -> Gen.oneOf('́', '̈'),   // combining marks
      1 -> Gen.oneOf('\ud83d', '\ude00'))   // surrogate halves — still lossless
    val word = Gen.choose(1, 16).flatMap(n => Gen.listOfN(n, uchar).map(_.mkString))
    val corpus = Gen.choose(1, 12).flatMap(k =>
      Gen.listOfN(k, Gen.zip(word, Gen.choose(1L, 40L))))
    forAll(corpus, cases = 40) { wf =>
      val dedup = wf.toMap.toSeq
      val m1 = UnigramTokenizer.trainFromCounts(dedup, vocabSize = 48,
        maxPieceLen = 4)
      val m2 = UnigramTokenizer.trainFromCounts(dedup.reverse, vocabSize = 48,
        maxPieceLen = 4)
      assert(m1.logProbs === m2.logProbs && m1.fallbackLogProb === m2.fallbackLogProb,
        "training must be input-order-invariant")
      dedup.foreach { case (w, _) =>
        val pieces = m1.encodeWord(w)
        assert(pieces.mkString === w, s"lossy Viterbi encode of '$w'")
        assert(pieces === m1.encodeWord(w), "encode must be deterministic")
        assert(pieces.forall(_.nonEmpty))
      }
      // chars the model never saw ride the single-char fallback
      assert(m1.encodeWord("☃☄x").mkString === "☃☄x")
    }
  }
}
