package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** HYBRID RETRIEVAL — reciprocal-rank fusion of a lexical leg and a semantic
  * leg, the standard two-tower retrieval primitive of RAG serving and
  * training-data mining (fuse BM25-ish term matching with embedding
  * similarity; RRF from Cormack/Clarke/Buettcher, SIGIR'09: score(d) =
  * Σ_legs 1 / (k + rank_leg(d)), robust to incomparable leg score scales).
  *
  * Query model here is doc-to-doc (the dedup/mining shape): each query
  * document retrieves by BOTH its distinct-token overlap (lexical) and its
  * embedding cosine (semantic); a document missing from a leg's top list
  * simply contributes nothing for that leg — the RRF convention.
  *
  * Scale shape (100 TB): the lexical leg explodes the CORPUS's distinct
  * tokens once and hash-joins them against the BROADCAST query-side token
  * set — O(corpus tokens) map work + one aggregation shuffle keyed
  * (query, doc), never corpus×corpus. The semantic leg broadcasts the query
  * vectors through [[Similarity.cosineTopK]]'s one-pass scan. Fusion itself
  * touches only 2·legK rows per query. Both legs cut to top-`legK` BEFORE
  * the fusion join, so skew is bounded by construction.
  */
object HybridRetrieval {

  /** Per query (`idCol < numQueries`, the library's query convention): fuse
    * the top-`legK` lexical candidates (distinct-token overlap with the query
    * document, empty tokens ignored) and top-`legK` semantic candidates
    * (embedding cosine) into RRF top-`k`. Output:
    * `(query_id, rank, doc_id, rrf, lex_rank, sem_rank)` with leg ranks NULL
    * where a leg did not retrieve the document. Ties break on doc_id at
    * every ranking, so the result is deterministic and oracle-replayable.
    */
  def rrfTopK(docs: DataFrame, embeddings: DataFrame, numQueries: Int = 5,
      legK: Int = 20, k: Int = 10, rrfK: Int = 60,
      idCol: String = "doc_id", textCol: String = "text",
      vecIdCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(numQueries > 0 && legK > 0 && k > 0 && rrfK > 0)

    // --- lexical leg: distinct-token overlap --------------------------------
    val toks = docs.select(col(idCol).as("doc_id"),
        explode(TextAnalysis.tokens(lower(coalesce(col(textCol), lit(""))))).as("tok"))
      .filter(col("tok") =!= "")
      .distinct()
    val qToks = toks.filter(col("doc_id") < numQueries)
      .select(col("doc_id").as("query_id"), col("tok"))
    // query tokens are numQueries documents' worth — broadcast by construction
    val overlap = toks.join(broadcast(qToks),
        toks("tok") === qToks("tok") && toks("doc_id") =!= qToks("query_id"))
      .groupBy(col("query_id"), toks("doc_id"))
      .agg(count(lit(1)).as("overlap"))
    val lexW = Window.partitionBy(col("query_id"))
      .orderBy(col("overlap").desc, col("doc_id"))
    val lex = overlap.withColumn("lex_rank", row_number().over(lexW))
      .filter(col("lex_rank") <= legK)
      .select(col("query_id"), col("doc_id"), col("lex_rank"))

    // --- semantic leg: embedding cosine (shared kernel) ---------------------
    val sem = Similarity.cosineTopK(embeddings, numQueries, legK,
        idCol = vecIdCol, vecCol = vecCol)
      .select(col("query_id"), col(vecIdCol).as("doc_id"),
        col("rank").as("sem_rank"))

    // --- fusion: RRF over whichever legs retrieved the document -------------
    fuse(lex, sem, k, rrfK)
  }

  /** RRF fusion of the two pre-cut legs — `lex(query_id, doc_id, lex_rank)` ×
    * `sem(query_id, doc_id, sem_rank)`, full-outer so a document missing from
    * one leg still scores on the other. Touches only 2·legK rows per query.
    */
  private def fuse(lex: DataFrame, sem: DataFrame, k: Int, rrfK: Int): DataFrame = {
    def leg(rank: Column): Column =
      coalesce(lit(1.0) / (lit(rrfK.toDouble) + rank.cast("double")), lit(0.0))
    val fused = lex.join(sem, Seq("query_id", "doc_id"), "full_outer")
      .withColumn("rrf", leg(col("lex_rank")) + leg(col("sem_rank")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("rrf").desc, col("doc_id"))
    fused.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("doc_id"), col("rrf"),
        col("lex_rank"), col("sem_rank"))
  }

  /** BM25-weighted hybrid retrieval off a prebuilt [[Bm25.Index]] — the
    * serving-path upgrade of [[rrfTopK]]: the lexical leg ranks candidates by
    * full Okapi BM25 (not binary token overlap), and it reads ONLY the index
    * artifacts (postings / doc lengths / corpus stats) — corpus TEXT is never
    * touched, so a materialized index amortizes the one tokenization scan
    * across every query batch. Even the QUERY documents' term sets come from
    * the postings (`doc_id < numQueries`), so the whole lexical leg is
    * index-only by construction.
    *
    * Scale shape (100 TB): the query term set is numQueries documents' worth —
    * bounded by construction — so it is collected driver-side ONCE (one
    * doc_id-pruned postings read) and re-enters every subsequent postings read
    * as an `isin` predicate the way [[Bm25.topKFromIndex]] pushes its terms:
    * the predicate reaches the parquet scan (`PushedFilters`, plan-asserted in
    * HybridRetrievalSpec), so row-group stats PRUNE the scans to the query
    * terms instead of a broadcast join filtering rows post-read. Pushdown
    * caveat: past `spark.sql.parquet.pushdown.inFilterThreshold` (default 10)
    * parquet rewrites the pushed In to a min/max RANGE filter — results stay
    * correct, and on the TERM-CLUSTERED index layout the range [min term, max
    * term] still skips row groups outside it, but pruning is coarser than the
    * exact set; raise the threshold (or chunk the term list) when a query
    * batch carries a very large vocabulary and needs exact-set pruning. Per-(query,
    * doc) BM25 is one map-side addend per posting hit + one aggregation
    * shuffle keyed (query, doc). The semantic leg and fusion are [[rrfTopK]]'s.
    *
    * Determinism: each BM25 addend is computed from exact-integer (tf, df, dl,
    * N, Σdl) inputs in one fixed operation order and rounded to 6 dp BEFORE the
    * per-pair sum, so partial sums live on a 1e-6 grid — the grouped sum is
    * order-independent after its own 6-dp rounding, and any engine replays the
    * identical ranking.
    */
  def bm25RrfTopKFromIndex(index: Bm25.Index, embeddings: DataFrame,
      numQueries: Int = 5, legK: Int = 20, k: Int = 10, rrfK: Int = 60,
      k1: Double = 1.2, b: Double = 0.75,
      vecIdCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(numQueries > 0 && legK > 0 && k > 0 && rrfK > 0)

    // --- lexical leg: BM25 from the inverted index ---------------------------
    // the (query_id, term) pairs are numQueries documents' worth — the one
    // bounded driver collect; the doc_id predicate prunes this read on a
    // doc_id-sorted postings table
    val qTermsScan = index.postings
      .filter(col("doc_id") < numQueries && col("term") =!= "")
      .select(col("doc_id").as("query_id"), col("term"))
    val qPairs = qTermsScan.collect()
    val termList = qPairs.map(_.getString(1)).distinct.toSeq
    // the collected pairs re-enter the plan as a broadcast local relation
    // (schema preserved so query_id keeps the postings' doc_id type)
    val qTerms = qTermsScan.sparkSession.createDataFrame(
      java.util.Arrays.asList(qPairs: _*), qTermsScan.schema)
    // query vocabulary pushed INTO the scans: parquet row-group stats prune
    // a term-sorted postings table to the query terms' row groups
    val termPruned =
      if (termList.isEmpty) index.postings.filter(lit(false))
      else index.postings.filter(col("term").isin(termList: _*))
    // per-term document frequency, restricted to the query vocabulary (tiny)
    val dfs = termPruned.groupBy("term").agg(count(lit(1)).as("df"))
    val hits = termPruned.join(broadcast(qTerms), Seq("term"))
      .filter(col("doc_id") =!= col("query_id"))

    val n = col("n").cast("double")
    val avgdl = col("sumdl").cast("double") / n
    val tf = col("tf").cast("double")
    val df = col("df").cast("double")
    val idf = log(lit(1.0) + (n - df + 0.5) / (df + 0.5))
    val addend = idf * tf * lit(k1 + 1.0) /
      (tf + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / avgdl))
    val scored = hits
      .join(index.docLengths, "doc_id")
      .join(broadcast(dfs), Seq("term"))
      .crossJoin(broadcast(index.stats))
      .select(col("query_id"), col("doc_id"), round(addend, 6).as("__a"))
      .groupBy("query_id", "doc_id")
      .agg(round(sum(col("__a")), 6).as("bm25"))
    val lexW = Window.partitionBy(col("query_id"))
      .orderBy(col("bm25").desc, col("doc_id"))
    val lex = scored.withColumn("lex_rank", row_number().over(lexW))
      .filter(col("lex_rank") <= legK)
      .select(col("query_id"), col("doc_id"), col("lex_rank"))

    // --- semantic leg + fusion: shared with [[rrfTopK]] ----------------------
    val sem = Similarity.cosineTopK(embeddings, numQueries, legK,
        idCol = vecIdCol, vecCol = vecCol)
      .select(col("query_id"), col(vecIdCol).as("doc_id"),
        col("rank").as("sem_rank"))
    fuse(lex, sem, k, rrfK)
  }

  /** One-shot convenience: build the [[Bm25.Index]] from `docs` (one
    * tokenization scan) and fuse. Serving paths that answer repeated query
    * batches should build/persist the index once and call
    * [[bm25RrfTopKFromIndex]].
    */
  def bm25RrfTopK(docs: DataFrame, embeddings: DataFrame, numQueries: Int = 5,
      legK: Int = 20, k: Int = 10, rrfK: Int = 60,
      k1: Double = 1.2, b: Double = 0.75,
      idCol: String = "doc_id", textCol: String = "text",
      vecIdCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    bm25RrfTopKFromIndex(Bm25.buildIndex(docs, idCol, textCol), embeddings,
      numQueries, legK, k, rrfK, k1, b, vecIdCol, vecCol)
}
