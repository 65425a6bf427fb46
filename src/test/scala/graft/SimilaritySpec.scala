package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Multimodal, Similarity}

class SimilaritySpec extends AnyFunSuite with SharedSpark {

  test("cosineTopK: k rows per query, self excluded, cosine in [-1,1], descending") {
    val topk = Similarity.cosineTopK(Tables.embeddings(spark, sf),
      numQueries = 5, k = 3).cache()
    assert(topk.count() === 15)
    assert(topk.filter(col("query_id") === col("vec_id")).count() === 0)
    assert(topk.filter(abs(col("cosine")) > 1.0001).count() === 0)
    // within each query, rank order matches cosine descending
    val rows = topk.orderBy("query_id", "rank").collect()
    rows.groupBy(_.getAs[Long]("query_id")).foreach { case (_, rs) =>
      val cosines = rs.sortBy(_.getAs[Int]("rank")).map(_.getAs[Double]("cosine"))
      assert(cosines.zip(cosines.tail).forall { case (a, b) => a >= b })
    }
  }

  test("cosineTopK: nearest neighbor of a known vector is its duplicate") {
    import spark.implicits._
    val dup = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f)),
      (1L, Array(1.0f, 0.0f, 0.0f)),   // exact duplicate of 0
      (2L, Array(0.0f, 1.0f, 0.0f)),
      (3L, Array(-1.0f, 0.1f, 0.0f))
    ).toDF("vec_id", "embedding")
    val topk = Similarity.cosineTopK(dup, numQueries = 1, k = 2).collect()
    assert(topk(0).getAs[Long]("vec_id") === 1L)
    assert(topk(0).getAs[Double]("cosine") === 1.0)
  }

  test("hardNegatives: every negative crosses labels and outranks unpicked ones") {
    val emb = Tables.embeddings(spark, sf)
    val hn = Similarity.hardNegatives(emb, numQueries = 5, k = 3).cache()
    assert(hn.count() === 15)
    val labels = emb.select(col("vec_id"), col("label")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    hn.collect().foreach { r =>
      val q = r.getAs[Long]("query_id"); val n = r.getAs[Long]("vec_id")
      assert(labels(q) !== labels(n),
        s"negative $n shares label ${labels(q)} with query $q")
    }
    // the top hard negative is at least as similar as every other cross-label
    // candidate (spot-check query 0 against a brute-force fold)
    import spark.implicits._
    val top0 = hn.filter(col("query_id") === 0 && col("rank") === 1)
      .select("cosine").as[Double].head()
    val all0 = Similarity.cosineTopK(emb, numQueries = 1, k = Int.MaxValue)
    val bestCross = all0.join(emb.select(col("vec_id"), col("label")), "vec_id")
      .filter(col("label") =!= labels(0L))
      .agg(max("cosine")).as[Double].head()
    assert(top0 === bestCross)
  }

  test("annTopK: results are a subset of brute force with reasonable recall") {
    val emb = Tables.embeddings(spark, sf)
    val exact = Similarity.cosineTopK(emb, numQueries = 10, k = 5)
      .select("query_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ann = Similarity.annTopK(emb, numQueries = 10, k = 5,
        tables = 16, planesPerTable = 4)
      .select("query_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(ann.nonEmpty, "LSH buckets should produce candidates")
    // every ANN hit is a genuine vector pair; recall is partial by construction
    val recall = (ann & exact).size.toDouble / exact.size
    assert(recall > 0.5, s"recall $recall too low for 16 tables x 4 planes")
  }

  test("embeddingNearDuplicates: non-empty, subset of exact pairs, no cache residue") {
    val emb = Tables.embeddings(spark, sf)
    val cachedBefore = spark.sparkContext.getPersistentRDDs.keySet
    val exact = Similarity.embeddingNearDuplicatesExact(emb, threshold = 0.45)
      .select("vec_a", "vec_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Similarity.embeddingNearDuplicates(emb, threshold = 0.45,
        tables = 8, planesPerTable = 4)
      .select("vec_a", "vec_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh.nonEmpty, "threshold 0.45 must yield pairs — a 0-row result verifies nothing")
    assert(lsh.subsetOf(exact))
    // the LSH queries must leave nothing newly pinned in the storage pool
    val leaked = spark.sparkContext.getPersistentRDDs.keySet -- cachedBefore
    assert(leaked.isEmpty,
      s"near-dup queries may not leak cached blocks into a long-lived session: $leaked")
  }

  test("signatures: deterministic across runs, buckets partition the corpus") {
    val emb = Tables.embeddings(spark, sf)
    val planes = Similarity.hyperplanes(8, 64)
    val a = Similarity.withSignature(emb, planes).select("vec_id", "sig")
    val b = Similarity.withSignature(emb, planes).select("vec_id", "sig")
    assert(a.exceptAll(b).count() === 0)
    val sigs = a.agg(min("sig"), max("sig")).first()
    assert(sigs.getLong(0) >= 0L && sigs.getLong(1) < 256L) // 8-bit signatures
  }

  test("int8 quantization: codes bounded, cosine preserved, round trip deterministic") {
    import org.apache.spark.sql.functions._
    val emb = Tables.embeddings(spark, sf)
    val q = Similarity.quantizeInt8(emb).cache()
    assert(q.count() === emb.count())
    assert(q.filter(exists(col("codes"), c => c < -127 || c > 127)).count() === 0)
    // every vector's max-magnitude coordinate quantizes to ±127 (scale definition)
    assert(q.filter(col("scale") > 0)
      .filter(!exists(col("codes"), c => abs(c) === 127)).count() === 0)
    // dequantized vectors keep cosine with the originals (> 0.99 at 64 dims)
    val joined = Similarity.dequantizeInt8(q)
      .join(emb.select(col("vec_id"),
        Similarity.toDoubleVec(col("embedding")).as("v")), "vec_id")
      .withColumn("cos",
        Similarity.dot(col("v"), col("v_approx")) /
          (Similarity.l2Norm(col("v")) * Similarity.l2Norm(col("v_approx"))))
    assert(joined.filter(col("cos") < 0.99).count() === 0,
      "int8 round trip must preserve direction")
    val again = Similarity.quantizeInt8(emb.repartition(7))
    assert(q.exceptAll(again).count() === 0)
    q.unpersist()
  }

  test("int8 search: compressed-code top-k overlaps heavily with exact cosine") {
    import org.apache.spark.sql.functions._
    val emb = Tables.embeddings(spark, sf)
    val codes = Similarity.quantizeInt8(emb)
    val approx = Similarity.int8CosineTopK(codes, numQueries = 10, k = 5)
    assert(approx.count() === 50)
    val exact = Similarity.cosineTopK(emb, numQueries = 10, k = 5)
    val a = approx.select("query_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val e = exact.select("query_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val overlap = (a & e).size.toDouble / e.size
    assert(overlap > 0.8,
      s"int8 codes should nearly reproduce the exact top-k, overlap $overlap")
  }

  test("binary quantization: hand-checked packing, 32 dims per word") {
    import spark.implicits._
    // dims 0..3: +,-,0,+ → bits 0 and 3 → word 0 = 9; dims 32..33 land in word 1
    val v = Array.fill(34)(0.0f)
    v(0) = 1.0f; v(1) = -1.0f; v(3) = 2.0f; v(32) = 0.5f; v(33) = -0.5f
    val code = Similarity.binaryQuantize(Seq((1L, v)).toDF("vec_id", "embedding"))
      .select("code").as[Seq[Long]].head()
    assert(code === Seq(9L, 1L), s"got $code")
  }

  test("binary quantization: empty vector yields an EMPTY code, not spurious words") {
    import spark.implicits._
    // sequence(0, -1) descends to [0, -1] — unguarded, an empty vector would
    // emit two zero words and hammingDist would null-pad against real codes
    val code = Similarity.binaryQuantize(
        Seq((1L, Array.empty[Float])).toDF("vec_id", "embedding"))
      .select("code").as[Seq[Long]].head()
    assert(code === Seq.empty, s"got $code")
  }

  test("bqTopK: full shortlist equals brute force exactly; partial shortlist recalls well") {
    val emb = Tables.embeddings(spark, sf)
    val n = emb.count().toInt
    val exact = Similarity.cosineTopK(emb, numQueries = 10, k = 5)
    val full = Similarity.bqTopK(emb, numQueries = 10, k = 5, shortlistK = n - 1)
    assert(full.orderBy("query_id", "rank").collect().map(_.toString).toSeq ===
      exact.orderBy("query_id", "rank").collect().map(_.toString).toSeq,
      "a corpus-wide shortlist must reduce to brute force")
    val approx = Similarity.bqTopK(emb, numQueries = 10, k = 5, shortlistK = 30)
    assert(approx.count() === 50)
    // the serving path off MATERIALIZED codes answers identically (and its
    // coarse pass never touches the float column)
    val dir = java.nio.file.Files.createTempDirectory("bq_codes").toString
    Similarity.binaryQuantize(emb).write.parquet(s"$dir/codes")
    val fromCodes = Similarity.bqTopKFromCodes(
      spark.read.parquet(s"$dir/codes"), emb, numQueries = 10, k = 5,
      shortlistK = 30)
    assert(fromCodes.orderBy("query_id", "rank").collect().map(_.toString).toSeq ===
      approx.orderBy("query_id", "rank").collect().map(_.toString).toSeq)
    val a = approx.select("query_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val e = exact.select("query_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val overlap = (a & e).size.toDouble / e.size
    assert(overlap > 0.5,
      s"1-bit Hamming shortlist should recall most of the exact top-k: $overlap")
  }

  test("multimodal: real decode produces deterministic features and histogram sums to 1") {
    implicit val sp = spark
    val feats = Multimodal.featureTable(Tables.documents(spark, sf)).cache()
    assert(feats.count() === Tables.documents(spark, sf).count())
    assert(feats.filter(col("n_bytes") <= 0).count() === 0)
    assert(feats.filter(col("width") < 32 || col("width") >= 640).count() === 0)
    val histSum = feats.select(
      aggregate(col("histogram"), lit(0.0), (a, x) => a + x).as("s"))
    assert(histSum.filter(abs(col("s") - 1.0) > 1e-9).count() === 0)
  }

  test("multimodal: byte-level resize and frame-sample stubs are deterministic and shape-correct") {
    val content = (0 until 100).map(_.toByte).toArray
    val resized = Multimodal.resizeStub(content, 4)
    assert(resized.length === 25)
    assert(resized.toSeq === Multimodal.resizeStub(content, 4).toSeq)
    val frames = Multimodal.frameSampleStub(content, frameBytes = 10, everyNth = 2)
    assert(frames.size === 5)
    assert(frames.head.length === 10)
  }
}
