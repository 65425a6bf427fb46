package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Dedup, IncrementalDedup}

class ShingleNoveltySpec extends org.scalatest.funsuite.AnyFunSuite with SharedSpark {

  test("novelty: copies score 0, fresh text scores 1, mixtures in between") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val ref = Seq((1L, "a b c d e f"), (2L, "x y z w v u")).toDF("doc_id", "text")
    val fresh = Seq(
      (10L, "a b c d e f"),          // exact copy: novelty 0
      (11L, "p q r s t o"),          // all-new: novelty 1
      (12L, "a b c d p q r"),        // 2 seen ("a b c", "b c d") of 5
      (13L, "xy"))                    // too short: no row
    val got = graft.ops.IncrementalDedup.shingleNovelty(
        fresh.toDF("doc_id", "text"), ref)
      .orderBy("doc_id").collect()
    assert(got.map(_.getLong(0)).toSeq === Seq(10L, 11L, 12L))
    assert(got(0).getAs[Double]("novelty") === 0.0)
    assert(got(1).getAs[Double]("novelty") === 1.0)
    assert(got(2).getAs[Long]("n_shingles") === 5L)
    assert(got(2).getAs[Long]("n_unseen") === 3L)
    assert(got(2).getAs[Double]("novelty") === 0.6)
  }
}

class IncrementalDedupSpec extends AnyFunSuite with SharedSpark {

  import spark.implicits._

  private def split = {
    val docs = Tables.documents(spark, sf)
    (docs.filter(col("doc_id") < 400), docs.filter(col("doc_id") >= 400))
  }

  test("matchesAgainstIndex finds the cross pairs the full pipeline finds") {
    val (index, batch) = split
    val k = 32; val bands = 16
    val indexSigs = Dedup.minHashSignatures(index, numHashes = k)
    val batchSigs = Dedup.minHashSignatures(batch, numHashes = k)
    val got = IncrementalDedup.matchesAgainstIndex(
        batchSigs, indexSigs, numHashes = k, bands = bands, threshold = 0.5)
      .select("new_doc", "index_doc").as[(Long, Long)].collect().toSet

    // reference: the full self-join pipeline over the union, restricted to cross
    // pairs, with the same ESTIMATED similarity (signature agreement) — candidate
    // sets are then identical by construction, so the incremental path must agree
    val unionSigs = Dedup.minHashSignatures(index.unionByName(batch), numHashes = k)
    val agree = (0 until k).map(i => when(col(s"a.h$i") === col(s"b.h$i"), 1)
      .otherwise(0)).reduce(_ + _)
    val full = Dedup.lshCandidates(unionSigs, numHashes = k, bands = bands).as("c")
      .join(unionSigs.as("a"), col("c.doc_a") === col("a.doc_id"))
      .join(unionSigs.as("b"), col("c.doc_b") === col("b.doc_id"))
      .filter(agree.cast("double") / k >= 0.5)
      .filter(col("doc_a") < 400 && col("doc_b") >= 400) // index side × batch side
      .select(col("doc_b"), col("doc_a")).as[(Long, Long)].collect().toSet

    assert(got.nonEmpty, "vacuous: no cross near-dups in the fixture")
    assert(got === full)
  }

  test("est_jaccard is the exact fraction of agreeing hashes") {
    val (index, batch) = split
    val indexSigs = Dedup.minHashSignatures(index)
    val batchSigs = Dedup.minHashSignatures(batch)
    val rows = IncrementalDedup.matchesAgainstIndex(batchSigs, indexSigs,
        threshold = 0.25)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val est = r.getAs[Double]("est_jaccard")
      // k=32: estimates live on the 1/32 grid, exactly representable as doubles
      assert(est >= 0.25 && est <= 1.0)
      assert((est * 32).isWhole, s"estimate $est not on the 1/32 grid")
    }
  }

  test("filterNovel drops exactly the matched batch docs") {
    val (index, batch) = split
    val indexSigs = Dedup.minHashSignatures(index)
    val batchSigs = Dedup.minHashSignatures(batch)
    val matched = IncrementalDedup.matchesAgainstIndex(batchSigs, indexSigs)
      .select("new_doc").distinct().as[Long].collect().toSet
    val novel = IncrementalDedup.filterNovel(batch, batchSigs, indexSigs)
      .select("doc_id").as[Long].collect().toSet
    val all = batch.select("doc_id").as[Long].collect().toSet
    assert(novel === all -- matched)
    assert(matched.nonEmpty)
  }

  test("writeIndex/readIndex roundtrip; mismatched build params fail fast") {
    import graft.ops.IncrementalDedup.IndexParams
    val (index, batch) = split
    val dir = java.nio.file.Files.createTempDirectory("sig_index_p").toString
    val params = IndexParams(n = 3, numHashes = 32, hashFamily = "xxhash64")
    IncrementalDedup.writeIndex(Dedup.minHashSignatures(index), dir, params)
    val loaded = IncrementalDedup.readIndex(spark, dir, params)
    val got = IncrementalDedup.matchesAgainstIndex(
      Dedup.minHashSignatures(batch), loaded).count()
    assert(got > 0)

    // growing the index = appending the novel signatures through the same params
    IncrementalDedup.writeIndex(
      Dedup.minHashSignatures(batch.limit(10)), dir, params, mode = "append")
    assert(IncrementalDedup.readIndex(spark, dir, params).count()
      === index.count() + 10)

    val wrong = intercept[IllegalArgumentException] {
      IncrementalDedup.readIndex(spark, dir, params.copy(numHashes = 64))
    }
    assert(wrong.getMessage.contains("mutually meaningless"))
  }

  test("the probe never reads index text: plan contains no second shingle pass") {
    val (index, batch) = split
    // simulate a persisted index: signatures parquet only, text long gone
    val dir = java.nio.file.Files.createTempDirectory("sig_index").toString
    Dedup.minHashSignatures(index).write.mode("overwrite").parquet(dir)
    val indexSigs = spark.read.parquet(dir)
    val batchSigs = Dedup.minHashSignatures(batch)
    val plan = IncrementalDedup.matchesAgainstIndex(batchSigs, indexSigs)
      .queryExecution.executedPlan.toString
    // exactly one text scan (the batch side); the index side reads signatures
    val textScans = "documents\\.parquet".r.findAllIn(plan).size
    assert(textScans <= 2, s"index text rescanned:\n$plan") // 2: batch sigs reused twice
    assert(plan.contains(dir.split("/").last), "index signatures not scanned")
  }
}
