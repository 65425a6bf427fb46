package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{QualityClassifier, TextAnalysis}

class QualityClassifierSpec extends AnyFunSuite with SharedSpark {

  /** Clean English-ish sentences (label 1) vs junk rows (label 0) whose text
    * statistics are separable: punctuation walls, single mega-tokens, emptiness.
    */
  private lazy val labeled: DataFrame = {
    import spark.implicits._
    val rng = new scala.util.Random(3)
    val words = Seq("the", "quick", "brown", "fox", "jumps", "over", "lazy",
      "dog", "and", "runs", "far", "away", "with", "some", "great", "speed")
    val good = (0 until 60).map { i =>
      val n = 8 + rng.nextInt(20)
      (i.toLong, (0 until n).map(_ => words(rng.nextInt(words.size)))
        .mkString(" ") + ".", 1)
    }
    val bad = (0 until 60).map { i =>
      val t = rng.nextInt(3) match {
        case 0 => "!!!???;;;***" * (2 + rng.nextInt(8))
        case 1 => "x" * (30 + rng.nextInt(200))
        case _ => (0 until 4).map(_ => "#@!").mkString("")
      }
      ((100 + i).toLong, t, 0)
    }
    (good ++ bad).toDF("doc_id", "text", "label")
  }

  test("training reduces log-loss and separates clean text from junk") {
    val stats = TextAnalysis.textStats(labeled)
      .join(labeled.select("doc_id", "label"), "doc_id")
    val before = QualityClassifier.logLoss(stats, "label",
      Seq.fill(QualityClassifier.featureExprs.length)(0.0))
    assert(math.abs(before - math.log(2.0)) < 1e-9) // all-zero weights → p = 0.5
    val w = QualityClassifier.train(stats, "label", iterations = 150,
      learningRate = 0.5)
    val after = QualityClassifier.logLoss(stats, "label", w.toSeq)
    assert(after < before / 2)
    val scored = QualityClassifier.score(labeled, w.toSeq)
      .join(labeled.select("doc_id", "label"), "doc_id")
    val acc = scored.select(avg(
      when((col("quality") > 0.5) === (col("label") === 1), 1.0).otherwise(0.0)))
      .first().getDouble(0)
    assert(acc >= 0.9, s"train-set accuracy $acc")
  }

  test("scoreExpr is the plain sigmoid of the weighted features") {
    import spark.implicits._
    val one = TextAnalysis.textStats(
      Seq((1L, "five small words right here.")).toDF("doc_id", "text"))
    val row = one.first()
    val nChars = row.getAs[Int]("n_chars").toDouble
    val nWords = row.getAs[Int]("n_words").toDouble
    val x = Array(1.0, math.log(1.0 + nChars), math.log(1.0 + nWords),
      row.getAs[Double]("avg_word_len"), row.getAs[Double]("punct_ratio"),
      row.getAs[Double]("stopword_ratio"))
    val w = Seq(-2.0, 0.25, 0.5, -0.25, -4.0, 1.5)
    val z = w.zip(x).map { case (a, b) => a * b }.sum
    val expected = 1.0 / (1.0 + math.exp(-z))
    val got = one.select(QualityClassifier.scoreExpr(w).as("q"))
      .first().getDouble(0)
    assert(math.abs(got - expected) < 1e-12)
  }

  test("scoring is a single codegen'd projection - no shuffle, no UDF") {
    // a parquet-backed frame: a local Seq would collapse to LocalTableScan and
    // hide the projection we want to audit
    val docsTable = spark.read.parquet(s"$sf/documents.parquet")
    val plan = QualityClassifier.score(docsTable, Seq(-2.0, 0.25, 0.5, -0.25, -4.0, 1.5))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"))
    // executedPlan renders whole-stage-codegen subtrees as "*(n)" stage markers
    assert(plan.contains("*("), s"scoring fell out of codegen:\n$plan")
  }
}
