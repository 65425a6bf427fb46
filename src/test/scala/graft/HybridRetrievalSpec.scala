package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.HybridRetrieval

/** Reciprocal-rank fusion of lexical (token-overlap) and semantic (cosine)
  * retrieval — correctness on a hand-checkable corpus plus the plan shapes
  * that keep it 100 TB-safe.
  */
class HybridRetrievalSpec extends AnyFunSuite with SharedSpark {

  test("fuses both legs; a doc missing from one leg still ranks by the other") {
    import spark.implicits._
    // doc 0 is the query. doc 1 shares tokens AND is the nearest vector;
    // doc 2 shares tokens only (orthogonal vector); doc 3 is vector-near
    // only (disjoint tokens); doc 4 matches neither.
    val docs = Seq(
      (0L, "alpha beta gamma"),
      (1L, "alpha beta delta"),
      (2L, "alpha gamma epsilon"),
      (3L, "zeta eta theta"),
      (4L, "iota kappa lambda")
    ).toDF("doc_id", "text")
    val embeddings = Seq(
      (0L, Array(1.0f, 0.0f)),
      (1L, Array(0.9f, 0.1f)),
      (2L, Array(0.0f, 1.0f)),
      (3L, Array(0.8f, 0.2f)),
      (4L, Array(-1.0f, 0.0f))
    ).toDF("vec_id", "embedding")

    val out = HybridRetrieval.rrfTopK(docs, embeddings, numQueries = 1,
      legK = 3, k = 4).orderBy("rank").collect()
    val byDoc = out.map(r => r.getAs[Long]("doc_id") ->
      (r.getAs[Int]("rank"), r.getAs[Double]("rrf"))).toMap
    // doc 1: lexical rank 1 (2 shared tokens) AND semantic rank 1 → top
    assert(byDoc(1L)._1 == 1, s"doc 1 should fuse to rank 1: ${out.mkString(";")}")
    assert(byDoc(1L)._2 == 1.0 / 61 + 1.0 / 61)
    // doc 3: semantic-only (rank 2 — cos 0.8·· vs doc 1) still retrieved
    assert(byDoc.contains(3L) && byDoc(3L)._2 == 1.0 / 62)
    // doc 2: lexical rank 2 + semantic rank 3 (cosine 0 beats doc 4's -1)
    assert(byDoc.contains(2L) && byDoc(2L)._2 == 1.0 / 62 + 1.0 / 63)
    // doc 4: neither leg retrieves it within legK... semantic legK=3 keeps
    // top-3 of 4 candidates — doc 4 (cosine -1) is cut; lexical has no
    // overlap → absent entirely
    assert(!byDoc.contains(4L))
  }

  test("BM25 leg outranks binary overlap: rare-term match beats common-term match") {
    import spark.implicits._
    // query doc 0 holds a RARE term (zebra: df=2) and a COMMON one (alpha:
    // df=5). docs 1 and 2 each overlap the query in exactly ONE distinct term
    // — binary overlap ties them — but BM25's idf makes the zebra match (doc 2)
    // the better lexical hit.
    val docs = Seq(
      (0L, "zebra alpha"),
      (1L, "alpha alpha alpha"),
      (2L, "zebra beta"),
      (3L, "alpha gamma"),
      (4L, "alpha delta")
    ).toDF("doc_id", "text")
    val emb = Seq(
      (0L, Array(1.0f, 0.0f)), (1L, Array(0.0f, 1.0f)), (2L, Array(0.0f, 1.0f)),
      (3L, Array(0.0f, 1.0f)), (4L, Array(0.0f, 1.0f))
    ).toDF("vec_id", "embedding")
    val out = HybridRetrieval.bm25RrfTopK(docs, emb, numQueries = 1, legK = 4,
      k = 5).collect()
    val lexRank = out.map(r => r.getAs[Long]("doc_id") ->
      Option(r.getAs[Integer]("lex_rank"))).toMap
    assert(lexRank(2L).contains(1),
      s"rare-term doc must lead the BM25 leg: ${out.mkString(";")}")
    assert(lexRank(1L).exists(_ > 1))
  }

  test("index path answers from materialized artifacts — corpus text never rescanned") {
    import graft.ops.Bm25
    val docs = Tables.documents(spark, sf)
    val emb = Tables.embeddings(spark, sf)

    // materialize the index once, then drop every handle to the text
    val dir = java.nio.file.Files.createTempDirectory("graft_bm25_idx").toString
    val built = Bm25.buildIndex(docs)
    built.postings.write.parquet(s"$dir/postings")
    built.docLengths.write.parquet(s"$dir/doclen")
    built.stats.write.parquet(s"$dir/stats")
    val index = Bm25.Index(
      spark.read.parquet(s"$dir/postings"),
      spark.read.parquet(s"$dir/doclen"),
      spark.read.parquet(s"$dir/stats"))

    val fromIndex = HybridRetrieval.bm25RrfTopKFromIndex(index, emb,
      numQueries = 3, legK = 5, k = 5)
    // every file scan in the executed plan reads the index or the embeddings —
    // the documents table (the text) appears nowhere
    val plan = fromIndex.queryExecution.executedPlan.toString
    assert(!plan.contains("documents"),
      s"index-path plan must not scan corpus text:\n$plan")
    assert(!plan.contains("CartesianProduct"))
    // the query vocabulary must be PUSHED into every postings scan (row-group
    // pruning on a term-sorted table), not filtered post-read by a join
    val postingScans = plan.linesIterator
      .filter(l => l.contains("FileScan") && l.contains("/postings")).toSeq
    assert(postingScans.nonEmpty,
      s"expected parquet postings scans in the executed plan:\n$plan")
    postingScans.foreach { l =>
      assert(l.contains("In(term") || l.contains("EqualTo(term"),
        s"postings scan must push the query-term predicate:\n$l")
    }

    // and it answers exactly what the inline build answers
    val inline = HybridRetrieval.bm25RrfTopK(docs, emb, numQueries = 3,
      legK = 5, k = 5)
    val a = fromIndex.orderBy("query_id", "rank").collect().map(_.toString).toSeq
    val b = inline.orderBy("query_id", "rank").collect().map(_.toString).toSeq
    assert(a == b, s"index path diverged from inline build:\n$a\nvs\n$b")
  }

  test("plan shape: broadcast lexical probe, no cartesian product") {
    val docs = Tables.documents(spark, sf)
    val emb = Tables.embeddings(spark, sf)
    val plan = HybridRetrieval.rrfTopK(docs, emb, numQueries = 3, legK = 5,
      k = 5).queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      s"hybrid retrieval must never plan a cartesian:\n$plan")
    assert(plan.contains("BroadcastHashJoin") ||
      plan.contains("BroadcastNestedLoopJoin"),
      "query side must broadcast")
    // end-to-end sanity at the fixture scale
    val n = HybridRetrieval.rrfTopK(docs, emb, numQueries = 3, legK = 5, k = 5)
      .count()
    assert(n == 15, s"expected 3 queries x 5 results, got $n")
  }


  test("fully index-backed hybrid: both scans pruned, corpus tables untouched; " +
      "nprobe = nlist equals the exact-semantic-leg variant") {
    import graft.ops.{Bm25, Ivf}
    val docs = Tables.documents(spark, sf)
    val emb = Tables.embeddings(spark, sf)
    val dir = java.nio.file.Files.createTempDirectory("graft_hybrid_idx").toString
    Bm25.writeIndex(docs, s"$dir/bm25")
    Ivf.writeIvfIndex(emb, Ivf.seedCentroids(emb, nlist = 8), s"$dir/ivf")
    val bm25 = Bm25.readIndexFrom(spark, s"$dir/bm25")
    val ivf = Ivf.readIvfIndex(spark, s"$dir/ivf")

    val out = HybridRetrieval.hybridTopKFromIndexes(bm25, ivf,
      numQueries = 3, legK = 5, k = 5, nprobe = 2)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("documents"),
      s"index-backed plan must not scan corpus text:\n$plan")
    assert(!plan.contains("embeddings"),
      "semantic leg must serve from the IVF index, not the embedding table")
    assert(!plan.linesIterator.exists(l =>
        l.contains("FileScan") && l.contains("/doclen")),
      s"serving must not read the O(corpus-rows) doclen table — dl rides on " +
        s"the postings rows:\n$plan")
    assert(!plan.contains("CartesianProduct"))
    val postingScans = plan.linesIterator
      .filter(l => l.contains("FileScan") && l.contains("/postings")).toSeq
    assert(postingScans.nonEmpty)
    postingScans.foreach { l =>
      assert(l.contains("In(term") || l.contains("EqualTo(term"),
        s"postings scan must push the query-term predicate:\n$l")
    }
    val vecScans = plan.linesIterator
      .filter(l => l.contains("FileScan") && l.contains("/vectors")).toSeq
    assert(vecScans.exists(l =>
      l.contains("In(cluster") || l.contains("EqualTo(cluster")),
      s"rerank scan must push the probed clusters:\n${vecScans.mkString("\n")}")

    // exhaustive probe ≡ exact semantic leg, row for row
    val viaIvf = HybridRetrieval.hybridTopKFromIndexes(bm25, ivf,
        numQueries = 3, legK = 5, k = 5, nprobe = 8)
      .orderBy("query_id", "rank").collect().map(_.toString).toSeq
    val exact = HybridRetrieval.bm25RrfTopKFromIndex(bm25, emb,
        numQueries = 3, legK = 5, k = 5)
      .orderBy("query_id", "rank").collect().map(_.toString).toSeq
    assert(viaIvf === exact,
      "probing every cluster must reproduce the exact-leg hybrid answer")
  }

  test("external-queries serving: EVERY index read carries a pushed predicate, " +
      "and the fused ranking is the hand-checkable one") {
    import spark.implicits._
    import graft.ops.{Bm25, Ivf}
    // corpus: doc 0 and 2 carry the rare term; all corpus vectors but 0's
    // point along (0,1)
    val docs = Seq(
      (0L, "zebra alpha"),
      (1L, "alpha alpha alpha"),
      (2L, "zebra beta"),
      (3L, "alpha gamma"),
      (4L, "alpha delta")
    ).toDF("doc_id", "text")
    val emb = Seq(
      (0L, Array(1.0f, 0.0f)), (1L, Array(0.0f, 1.0f)), (2L, Array(0.0f, 1.0f)),
      (3L, Array(0.0f, 1.0f)), (4L, Array(0.0f, 1.0f))
    ).toDF("vec_id", "embedding")
    val dir = java.nio.file.Files.createTempDirectory("graft_hybrid_ext").toString
    Bm25.writeIndex(docs, s"$dir/bm25")
    Ivf.writeIvfIndex(emb, Ivf.seedCentroids(emb, nlist = 2), s"$dir/ivf")
    val bm25 = Bm25.readIndexFrom(spark, s"$dir/bm25")
    val ivf = Ivf.readIvfIndex(spark, s"$dir/ivf")

    // the query arrives from OUTSIDE the corpus: its own id space, its own text
    val queries = Seq((99L, "zebra", Array(0.0f, 1.0f)))
      .toDF("query_id", "text", "embedding")
    val out = HybridRetrieval.bm25RrfTopKForQueries(bm25, ivf, queries,
      legK = 4, k = 5, nprobe = 1)

    // EVERY postings read and EVERY vectors read is predicate-pruned — no
    // extraction scan exists on the external path
    val plan = out.queryExecution.executedPlan.toString
    val postingScans = plan.linesIterator
      .filter(l => l.contains("FileScan") && l.contains("/postings")).toSeq
    assert(postingScans.nonEmpty)
    postingScans.foreach { l =>
      assert(l.contains("In(term") || l.contains("EqualTo(term"),
        s"external path: unpruned postings scan:\n$l")
    }
    val vecScans = plan.linesIterator
      .filter(l => l.contains("FileScan") && l.contains("/vectors")).toSeq
    assert(vecScans.nonEmpty)
    vecScans.foreach { l =>
      assert(l.contains("In(cluster") || l.contains("EqualTo(cluster"),
        s"external path: unpruned vectors scan:\n$l")
    }

    // hand-checkable fusion: query vec (0,1) probes the (0,1) centroid only →
    // semantic candidates 1,2,3,4 (all cosine 1.0, id order); lexical zebra →
    // docs 0,2 with equal BM25 (id order). RRF: doc 2 fuses both legs (rank 2
    // lexical + rank 2 semantic) and wins; docs 0 and 1 tie on 1/61 → id order.
    val got = out.orderBy("rank").collect()
      .map(r => (r.getAs[Int]("rank"), r.getAs[Long]("doc_id"))).toSeq
    assert(got === Seq((1, 2L), (2, 0L), (3, 1L), (4, 3L), (5, 4L)),
      s"unexpected external-query fusion: $got")
    // no self-exclusion on the external path: corpus doc ids never collide
    // with query id 99, so every corpus doc was eligible

    // and the external serving plan never touches the doclen table either
    val extPlan = out.queryExecution.executedPlan.toString
    assert(!extPlan.linesIterator.exists(l =>
        l.contains("FileScan") && l.contains("/doclen")),
      s"external serving must not read the doclen table:\n$extPlan")
  }

  test("repeated tokens in an external query text do not double-count its " +
      "BM25 addends — distinct (query, term) pairs, the internal-path " +
      "convention") {
    import spark.implicits._
    import graft.ops.{Bm25, Ivf}
    val docs = Seq((0L, "zebra alpha"), (1L, "alpha alpha alpha"),
      (2L, "zebra beta"), (3L, "alpha gamma"), (4L, "alpha delta"))
      .toDF("doc_id", "text")
    val emb = Seq((0L, Array(1.0f, 0.0f)), (1L, Array(0.0f, 1.0f)),
      (2L, Array(0.0f, 1.0f)), (3L, Array(0.0f, 1.0f)), (4L, Array(0.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    val dir = java.nio.file.Files
      .createTempDirectory("graft_hybrid_dup").toString
    Bm25.writeIndex(docs, s"$dir/bm25")
    Ivf.writeIvfIndex(emb, Ivf.seedCentroids(emb, nlist = 2), s"$dir/ivf")
    val bm25 = Bm25.readIndexFrom(spark, s"$dir/bm25")
    val ivf = Ivf.readIvfIndex(spark, s"$dir/ivf")
    def serve(text: String) = HybridRetrieval.bm25RrfTopKForQueries(bm25, ivf,
        Seq((99L, text, Array(0.0f, 1.0f))).toDF("query_id", "text", "embedding"),
        legK = 4, k = 5, nprobe = 1)
      .orderBy("rank").collect().map(_.toString).toSeq
    assert(serve("zebra zebra alpha zebra") === serve("zebra alpha"),
      "a term repeated in the query text must score once, not per occurrence")
  }

  test("BQ-funnel hybrid external: at shortlistK = corpus the BQ semantic leg " +
      "is exact, so it reproduces the exhaustive-probe IVF hybrid row for row") {
    import graft.ops.{Bm25, Ivf, Similarity}
    val docs = Tables.documents(spark, sf)
    val emb = Tables.embeddings(spark, sf)
    val corpus = emb.count().toInt
    val dir = java.nio.file.Files.createTempDirectory("graft_hybrid_bqf").toString
    Bm25.writeIndex(docs, s"$dir/bm25")
    Similarity.writeCodes(emb, s"$dir/codes")
    Ivf.writeIvfIndex(emb, Ivf.seedCentroids(emb, nlist = 8), s"$dir/ivf")
    val bm25 = Bm25.readIndexFrom(spark, s"$dir/bm25")
    val codes = Similarity.readCodes(spark, s"$dir/codes")
    val ivf = Ivf.readIvfIndex(spark, s"$dir/ivf")
    val queries = docs.filter(col("doc_id") < 3)
      .join(emb.filter(col("vec_id") < 3), col("doc_id") === col("vec_id"))
      .select((col("doc_id") + 1000000L).as("query_id"), col("text"),
        col("embedding"))

    // exhaustive Hamming shortlist ≡ exact cosine leg ≡ nprobe-=-nlist IVF leg
    val viaBq = HybridRetrieval.bm25BqRrfTopKForQueries(bm25, codes, emb,
        queries, legK = 5, k = 5, shortlistK = corpus)
      .orderBy("query_id", "rank").collect().map(_.toString).toSeq
    val viaIvf = HybridRetrieval.bm25RrfTopKForQueries(bm25, ivf, queries,
        legK = 5, k = 5, nprobe = 8)
      .orderBy("query_id", "rank").collect().map(_.toString).toSeq
    assert(viaBq === viaIvf,
      "exhaustive BQ shortlist must reproduce the exact-semantic-leg hybrid")

    // a REALISTIC shortlist still returns k fused rows per query and never
    // reads the doclen table
    val funneled = HybridRetrieval.bm25BqRrfTopKForQueries(bm25, codes, emb,
      queries, legK = 5, k = 5, shortlistK = 30)
    assert(funneled.count() === 15)
    val plan = funneled.queryExecution.executedPlan.toString
    assert(!plan.linesIterator.exists(l =>
        l.contains("FileScan") && l.contains("/doclen")),
      s"BQ hybrid serving must not read the doclen table:\n$plan")
  }

  test("serving FS budget: a full hybrid query batch opens ZERO doclen data " +
      "files — the lexical leg's only corpus-sized read is the pruned postings") {
    import spark.implicits._
    import graft.ops.{Bm25, Ivf}
    spark.sparkContext.hadoopConfiguration.set("fs.counted.impl",
      classOf[graft.testutil.CountingFileSystem].getName)
    val dir = s"counted://${java.nio.file.Files
      .createTempDirectory("graft_hybrid_fsb")}/idx"
    val docs = (0L until 60L).map(i => (i, s"alpha beta w$i hash join"))
      .toDF("doc_id", "text")
    val emb = (0L until 60L)
      .map(i => (i, Array((i % 7).toFloat + 1f, (i % 3).toFloat)))
      .toDF("vec_id", "embedding")
    Bm25.writeIndex(docs, s"$dir/bm25")
    Ivf.writeIvfIndex(emb, Ivf.seedCentroids(emb, nlist = 4), s"$dir/ivf")
    val bm25 = Bm25.readIndexFrom(spark, s"$dir/bm25")
    val ivf = Ivf.readIvfIndex(spark, s"$dir/ivf")

    graft.testutil.CountingFileSystem.reset()
    val rows = HybridRetrieval.hybridTopKFromIndexes(bm25, ivf,
      numQueries = 3, legK = 5, k = 5, nprobe = 2).collect()
    assert(rows.nonEmpty)
    val doclenOpens =
      graft.testutil.CountingFileSystem.total("open", "/doclen/_data")
    assert(doclenOpens == 0,
      s"hybrid serving opened $doclenOpens doclen data files — the " +
        "O(corpus-rows) side-read the denormalized dl exists to remove")
  }

  test("pre-denormalization index (postings without dl) serves the hybrid " +
      "lexical leg through the docLengths join, identically") {
    import graft.ops.Bm25
    val docs = Tables.documents(spark, sf)
    val emb = Tables.embeddings(spark, sf)
    val built = Bm25.buildIndex(docs)
    val legacy = Bm25.Index(built.postings.drop("dl"), built.docLengths,
      built.stats)
    val viaLegacy = HybridRetrieval.bm25RrfTopKFromIndex(legacy, emb,
        numQueries = 3, legK = 5, k = 5)
      .orderBy("query_id", "rank").collect().map(_.toString).toSeq
    val viaNew = HybridRetrieval.bm25RrfTopKFromIndex(built, emb,
        numQueries = 3, legK = 5, k = 5)
      .orderBy("query_id", "rank").collect().map(_.toString).toSeq
    assert(viaLegacy === viaNew,
      "legacy-layout hybrid serving must match the denormalized layout")
  }

  test("IVFADC hybrid external: the PQ semantic leg completes the leg matrix " +
      "(exact/IVF/BQ/PQ) — leg ranks match the public tier APIs, plans stay " +
      "pruned, no doclen read") {
    import graft.ops.{Bm25, Ivf, IvfPq, Pq, Similarity}
    val docs = Tables.documents(spark, sf)
    val emb = Tables.embeddings(spark, sf)
    val coarse = Pq.seedCodebooks(emb, m = 1, ksub = 8)
      .select(col("code").as("cluster"), col("cw"))
    val pqCb = IvfPq.seedResidualCodebooks(emb, coarse, m = 4, ksub = 8,
      skip = 8)
    val dir = java.nio.file.Files.createTempDirectory("graft_hybrid_pqleg")
      .toString
    Bm25.writeIndex(docs, s"$dir/bm25")
    IvfPq.writePqIndex(emb, coarse, pqCb, s"$dir/pq")
    val bm25 = Bm25.readIndexFrom(spark, s"$dir/bm25")
    val pidx = IvfPq.readPqIndex(spark, s"$dir/pq")
    val queries = docs.filter(col("doc_id") < 3)
      .join(emb.filter(col("vec_id") < 3), col("doc_id") === col("vec_id"))
      .select((col("doc_id") + 1000000L).as("query_id"), col("text"),
        col("embedding"))

    val out = HybridRetrieval.bm25PqRrfTopKForQueries(bm25, pidx, queries,
      legK = 5, k = 5, nprobe = 4)
    val rows = out.orderBy("query_id", "rank").collect()
    assert(rows.length === 15, "3 queries x k=5 fused rows")

    // rrf is EXACTLY the fusion of the reported leg ranks
    rows.foreach { r =>
      def leg(i: Int): Double =
        if (r.isNullAt(i)) 0.0 else 1.0 / (60.0 + r.getInt(i))
      val want = leg(r.fieldIndex("lex_rank")) + leg(r.fieldIndex("sem_rank"))
      assert(math.abs(r.getAs[Double]("rrf") - want) < 1e-12, r.toString)
    }

    // the embedded sem ranks ARE IvfPq.searchIndex's ranks (the public tier
    // API), pinned pair by pair
    val q = queries.select(col("query_id"),
      Similarity.toDoubleVec(col("embedding")).as("qv"))
    val semRanks = IvfPq.searchIndex(pidx, q, k = 5, nprobe = 4)
      .collect().map(r => (r.getLong(0), r.getLong(2)) -> r.getInt(1)).toMap
    rows.filter(!_.isNullAt(5)).foreach { r =>
      val key = (r.getLong(0), r.getLong(2))
      assert(semRanks.get(key).contains(r.getInt(5)),
        s"sem_rank mismatch for $key: ${r.getInt(5)} vs ${semRanks.get(key)}")
    }

    // serving plan: postings pruned to the query terms, codes pruned to the
    // probed clusters, doclen never read
    val plan = out.queryExecution.executedPlan.toString
    val postingScans = plan.linesIterator
      .filter(l => l.contains("FileScan") && l.contains("/postings")).toSeq
    assert(postingScans.nonEmpty && postingScans.forall(l =>
      l.contains("In(term") || l.contains("EqualTo(term")),
      s"unpruned postings scan:\n${postingScans.mkString("\n")}")
    val codeScans = plan.linesIterator
      .filter(l => l.contains("FileScan") && l.contains("/codes")).toSeq
    assert(codeScans.nonEmpty && codeScans.forall(l =>
      l.contains("In(cluster") || l.contains("EqualTo(cluster")),
      s"unpruned codes scan:\n${codeScans.mkString("\n")}")
    assert(!plan.linesIterator.exists(l =>
      l.contains("FileScan") && l.contains("/doclen")),
      "PQ hybrid must not read the doclen table")
  }
}
