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
  *
  * Serving-tier ladder (what reads what, per query batch):
  *  - [[rrfTopK]] / [[bm25RrfTopK]]: corpus text + full embeddings (one-off).
  *  - [[bm25RrfTopKFromIndex]]: postings index (term-pruned) + full
  *    embeddings (exact semantic leg).
  *  - [[hybridTopKFromIndexes]]: postings index (term-pruned) + IVF index
  *    (cluster-pruned) — NO full-corpus scan on either leg.
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
    // the query side renames `tok` so the self-join condition binds the two
    // frames unambiguously (a same-named Column compared against its own
    // lineage logs a "trivially true equals predicate" warning)
    val qToks = toks.filter(col("doc_id") < numQueries)
      .select(col("doc_id").as("query_id"), col("tok").as("qtok"))
    // query tokens are numQueries documents' worth — broadcast by construction
    val overlap = toks.join(broadcast(qToks),
        toks("tok") === qToks("qtok") && toks("doc_id") =!= qToks("query_id"))
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

  /** The index-only BM25 lexical leg shared by every serving path:
    * `qTerms(query_id, term)` is a LOCAL (broadcast) relation of the query
    * term pairs and `termList` its distinct vocabulary — pushed INTO every
    * postings read as an `isin` predicate, so row-group stats on the
    * TERM-CLUSTERED layout prune the scans to the query terms' row groups.
    * Per-(query, doc) BM25 is one map-side addend per posting hit + one
    * aggregation shuffle keyed (query, doc); addends are 6-dp-rounded BEFORE
    * the per-pair sum so the grouped sum is order-independent. `dl` rides on
    * the posting rows ([[Bm25.buildIndex]]'s denormalized layout), so the leg
    * reads NOTHING corpus-sized beyond the term-pruned postings scan — a
    * pre-denormalization index (no `dl` on postings) falls back to the
    * docLengths join transparently.
    */
  private def bm25LexLeg(index: Bm25.Index, qTerms: DataFrame,
      termList: Seq[String], legK: Int, k1: Double, b: Double,
      excludeSelf: Boolean): DataFrame = {
    // Tables.spread (footer-gated, identity at scale): a harness-sized index
    // is one row group, so WITHOUT the exchange the pruned scan AND its whole
    // per-(query, doc) partial aggregation run in ONE task (profiled ~450 ms
    // of single-core hash-agg per rep in r15) — and the scan executes TWICE
    // per action (once under `dfs`, once under `hits`). The doc_id-hash
    // exchange parallelizes the partial aggregation and is REUSED by both
    // consumers, so the pruned postings are read once. Round-15's rejection
    // of this spread bundled it with an eager per-rep `.rdd` partition probe;
    // the footer-metadata gate removed that cost (re-adjudicated by
    // interleaved A/B this round — see OPTIMIZATION_r16.md).
    val termPruned = graft.Tables.spread(
      if (termList.isEmpty) index.postings.filter(lit(false))
      else index.postings.filter(col("term").isin(termList: _*)), "doc_id")
    // per-term document frequency, restricted to the query vocabulary (tiny)
    val dfs = termPruned.groupBy("term").agg(count(lit(1)).as("df"))
    val noSelf =
      if (excludeSelf) col("doc_id") =!= col("query_id") else lit(true)
    val hits = termPruned.join(broadcast(qTerms), Seq("term")).filter(noSelf)

    val n = col("n").cast("double")
    val avgdl = col("sumdl").cast("double") / n
    val tf = col("tf").cast("double")
    val df = col("df").cast("double")
    val idf = log(lit(1.0) + (n - df + 0.5) / (df + 0.5))
    val addend = idf * tf * lit(k1 + 1.0) /
      (tf + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / avgdl))
    val withDl =
      if (Bm25.postingsCarryDl(index)) hits
      else hits.join(index.docLengths, "doc_id")
    val scored = withDl
      .join(broadcast(dfs), Seq("term"))
      .crossJoin(broadcast(index.stats))
      .select(col("query_id"), col("doc_id"), round(addend, 6).as("__a"))
      .groupBy("query_id", "doc_id")
      .agg(round(sum(col("__a")), 6).as("bm25"))
    val lexW = Window.partitionBy(col("query_id"))
      .orderBy(col("bm25").desc, col("doc_id"))
    scored.withColumn("lex_rank", row_number().over(lexW))
      .filter(col("lex_rank") <= legK)
      .select(col("query_id"), col("doc_id"), col("lex_rank"))
  }

  /** Extract the internal query documents' term pairs from the postings
    * (`doc_id < numQueries`, the library's query convention): ONE bounded
    * driver collect (numQueries documents' worth of terms) that re-enters
    * the plan as a broadcast local relation, plus the distinct vocabulary
    * for scan pruning. This extraction read necessarily walks the postings
    * table (`doc_id` carries no clustering on the term-ordered layout) —
    * the external-queries paths ([[bm25RrfTopKForQueries]]) avoid it
    * entirely.
    */
  private def internalQueryTerms(index: Bm25.Index,
      numQueries: Int): (DataFrame, Seq[String]) = {
    val qTermsScan = index.postings
      .filter(col("doc_id") < numQueries && col("term") =!= "")
      .select(col("doc_id").as("query_id"), col("term"))
    val qPairs = qTermsScan.collect()
    val qTerms = qTermsScan.sparkSession.createDataFrame(
      java.util.Arrays.asList(qPairs: _*), qTermsScan.schema)
    (qTerms, qPairs.map(_.getString(1)).distinct.toSeq)
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
    * batch carries a very large vocabulary and needs exact-set pruning.
    * Per-(query, doc) BM25 is one map-side addend per posting hit + one
    * aggregation shuffle keyed (query, doc). The semantic leg and fusion are
    * [[rrfTopK]]'s.
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
    val (qTerms, termList) = internalQueryTerms(index, numQueries)
    val lex = bm25LexLeg(index, qTerms, termList, legK, k1, b,
      excludeSelf = true)
    val sem = Similarity.cosineTopK(embeddings, numQueries, legK,
        idCol = vecIdCol, vecCol = vecCol)
      .select(col("query_id"), col(vecIdCol).as("doc_id"),
        col("rank").as("sem_rank"))
    fuse(lex, sem, k, rrfK)
  }

  /** Fully index-backed hybrid retrieval — BOTH legs serve from persisted,
    * incrementally-maintained indexes, removing the serving tier's last
    * full-corpus scan: the lexical leg is the term-pruned BM25-from-postings
    * of [[bm25RrfTopKFromIndex]]; the semantic leg is
    * [[Ivf.ivfTopKFromIndex]] — probe `nprobe` clusters against the tiny
    * centroid table, then exact-rerank ONLY the probed clusters' row groups
    * (cluster-isin pushed into the vector scan). Per query batch the plan
    * reads: the query terms' postings row groups (which carry the
    * denormalized doc lengths), the probed clusters' vector row groups, and
    * two metadata-scale artifacts (the folded corpus stats and the centroid
    * table) — never the documents table, never the full embedding table,
    * never the O(corpus-rows) doc-lengths table.
    *
    * Semantics: at `nprobe = nlist` the IVF leg provably equals the exact
    * cosine leg, so this returns exactly [[bm25RrfTopKFromIndex]]'s answer
    * (spec-pinned); smaller nprobe trades semantic-leg recall for a rerank
    * bounded by the probed clusters, the standard IVF contract. Both indexes
    * must cover the same corpus (doc_id ↔ vec_id).
    */
  def hybridTopKFromIndexes(index: Bm25.Index, ivf: Ivf.IvfIndex,
      numQueries: Int = 5, legK: Int = 20, k: Int = 10, rrfK: Int = 60,
      k1: Double = 1.2, b: Double = 0.75, nprobe: Int = 4): DataFrame = {
    require(numQueries > 0 && legK > 0 && k > 0 && rrfK > 0 && nprobe > 0)
    val (qTerms, termList) = internalQueryTerms(index, numQueries)
    val lex = bm25LexLeg(index, qTerms, termList, legK, k1, b,
      excludeSelf = true)
    val sem = Ivf.ivfTopKFromIndex(ivf, numQueries, legK, nprobe)
      .select(col("query_id"), col("vec_id").as("doc_id"),
        col("rank").as("sem_rank"))
    fuse(lex, sem, k, rrfK)
  }

  /** Hybrid retrieval for EXTERNAL queries — the realistic serving shape: the
    * query batch arrives from OUTSIDE the corpus as `queries(queryIdCol,
    * queryTextCol, queryVecCol)` (id, text, embedding), so NO extraction scan
    * exists — the query terms come from tokenizing the (tiny) query frame
    * itself, and EVERY index read carries a pushed predicate: postings reads
    * the query terms' row groups ([[Bm25]] layout), the IVF vector scan reads
    * the probed clusters' row groups ([[Ivf]] layout). No self-exclusion on
    * either leg: the query id space is unrelated to corpus ids.
    *
    * The lexical leg uses each query's DISTINCT terms (matching the
    * internal-query convention, where term sets come from postings rows);
    * tokenization is [[Bm25.buildIndex]]'s ([[TextAnalysis.tokens]] of the
    * lowercased text).
    */
  def bm25RrfTopKForQueries(index: Bm25.Index, ivf: Ivf.IvfIndex,
      queries: DataFrame, legK: Int = 20, k: Int = 10, rrfK: Int = 60,
      k1: Double = 1.2, b: Double = 0.75, nprobe: Int = 4,
      queryIdCol: String = "query_id", queryTextCol: String = "text",
      queryVecCol: String = "embedding"): DataFrame = {
    require(legK > 0 && k > 0 && rrfK > 0 && nprobe > 0)
    val (qTerms, termList) = externalQueryTerms(queries, queryIdCol,
      queryTextCol)
    val lex = bm25LexLeg(index, qTerms, termList, legK, k1, b,
      excludeSelf = false)
    val sem = Ivf.ivfTopKForQueries(ivf, queries, legK, nprobe,
        idCol = queryIdCol, vecCol = queryVecCol)
      .select(col("query_id"), col("vec_id").as("doc_id"),
        col("rank").as("sem_rank"))
    fuse(lex, sem, k, rrfK)
  }

  /** Tokenize the CALLER'S query batch into (query_id, term) pairs + the
    * distinct vocabulary: the bounded driver collect is over the tiny request
    * frame — no index read at all; the pairs re-enter the plan as a broadcast
    * local relation and the vocabulary as the pushed isin.
    */
  private def externalQueryTerms(queries: DataFrame, queryIdCol: String,
      queryTextCol: String): (DataFrame, Seq[String]) = {
    val qTermsScan = queries.select(col(queryIdCol).as("query_id"),
        explode(TextAnalysis.tokens(lower(coalesce(col(queryTextCol),
          lit(""))))).as("term"))
      .filter(col("term") =!= "")
      .distinct()
    val qPairs = qTermsScan.collect()
    val qTerms = qTermsScan.sparkSession.createDataFrame(
      java.util.Arrays.asList(qPairs: _*), qTermsScan.schema)
    (qTerms, qPairs.map(_.getString(1)).distinct.toSeq)
  }

  /** Hybrid retrieval for EXTERNAL queries with a BINARY-QUANTIZED semantic
    * leg — the [[bm25RrfTopKForQueries]] variant for corpora where IVF recall
    * at small nprobe is the binding constraint: the semantic leg is
    * [[Similarity.bqTopKForQueries]]'s funnel (exact-integer Hamming sweep of
    * the 32×-compressed codes table → exact cosine rerank of `shortlistK`
    * candidates) instead of a probed-cluster rerank. The coarse pass is a
    * LINEAR sweep of the codes by design (the BQ tier's contract — tiny
    * codes, full sweep, no recall cliff), so recall degrades gracefully with
    * `shortlistK` rather than collapsing when a true neighbor lives outside
    * the probed clusters; at `shortlistK ≥ corpus size` the leg provably
    * equals the exact cosine leg (spec-pinned differential). The lexical leg
    * and fusion are identical to [[bm25RrfTopKForQueries]]'s; no
    * self-exclusion anywhere — the query id space is unrelated to corpus ids.
    */
  def bm25BqRrfTopKForQueries(index: Bm25.Index, codes: DataFrame,
      embeddings: DataFrame, queries: DataFrame, legK: Int = 20, k: Int = 10,
      rrfK: Int = 60, k1: Double = 1.2, b: Double = 0.75,
      shortlistK: Int = 30,
      queryIdCol: String = "query_id", queryTextCol: String = "text",
      queryVecCol: String = "embedding",
      vecIdCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(legK > 0 && k > 0 && rrfK > 0 && shortlistK >= legK,
      s"shortlistK ($shortlistK) must cover legK ($legK)")
    val (qTerms, termList) = externalQueryTerms(queries, queryIdCol,
      queryTextCol)
    val lex = bm25LexLeg(index, qTerms, termList, legK, k1, b,
      excludeSelf = false)
    val sem = Similarity.bqTopKForQueries(codes, embeddings, queries,
        k = legK, shortlistK = shortlistK, idCol = vecIdCol, vecCol = vecCol,
        queryIdCol = queryIdCol, queryVecCol = queryVecCol)
      .select(col("query_id"), col("vec_id").as("doc_id"),
        col("rank").as("sem_rank"))
    fuse(lex, sem, k, rrfK)
  }

  /** Hybrid retrieval for EXTERNAL queries with an IVFADC semantic leg — the
    * fourth semantic-leg option, completing the leg matrix (exact / IVF / BQ /
    * PQ): candidates come from [[IvfPq.searchIndex]]'s ADC sweep of the
    * probed clusters' m-byte codes — the most compressed serving tier, for
    * corpora where even the BQ linear sweep is too wide. RRF consumes only
    * the leg's RANKS, so the L2-metric ADC leg fuses with the BM25 leg
    * exactly like the cosine legs do. The lexical leg and fusion are
    * [[bm25RrfTopKForQueries]]'s; no self-exclusion anywhere — the query id
    * space is unrelated to corpus ids. Per query batch the plan reads the
    * query terms' postings row groups and the probed clusters' code row
    * groups plus broadcast metadata — nothing corpus-sized.
    */
  def bm25PqRrfTopKForQueries(index: Bm25.Index, pq: IvfPq.PqIndex,
      queries: DataFrame, legK: Int = 20, k: Int = 10, rrfK: Int = 60,
      k1: Double = 1.2, b: Double = 0.75, nprobe: Int = 4,
      queryIdCol: String = "query_id", queryTextCol: String = "text",
      queryVecCol: String = "embedding"): DataFrame = {
    require(legK > 0 && k > 0 && rrfK > 0 && nprobe > 0)
    val (qTerms, termList) = externalQueryTerms(queries, queryIdCol,
      queryTextCol)
    val lex = bm25LexLeg(index, qTerms, termList, legK, k1, b,
      excludeSelf = false)
    val q = queries.select(col(queryIdCol).as("query_id"),
      Similarity.toDoubleVec(col(queryVecCol)).as("qv"))
    val sem = IvfPq.searchIndex(pq, q, k = legK, nprobe = nprobe)
      .select(col("query_id"), col("vec_id").as("doc_id"),
        col("rank").as("sem_rank"))
    fuse(lex, sem, k, rrfK)
  }

  /** One-shot convenience: build the [[Bm25.Index]] from `docs` (one
    * tokenization scan) and fuse. Serving paths that answer repeated query
    * batches should build/persist the index once and call
    * [[bm25RrfTopKFromIndex]] (or [[hybridTopKFromIndexes]] with a persisted
    * IVF index for a fully pruned plan).
    */
  def bm25RrfTopK(docs: DataFrame, embeddings: DataFrame, numQueries: Int = 5,
      legK: Int = 20, k: Int = 10, rrfK: Int = 60,
      k1: Double = 1.2, b: Double = 0.75,
      idCol: String = "doc_id", textCol: String = "text",
      vecIdCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(numQueries > 0 && legK > 0 && k > 0 && rrfK > 0)
    val index = Bm25.buildIndex(docs, idCol, textCol)
    // the in-memory index is a LAZY plan over `docs`, so the postings-derived
    // query-term extraction ([[internalQueryTerms]]) would execute the WHOLE
    // corpus tokenize+aggregate once just for its driver collect and then
    // again inside the main plan. Here the corpus text is at hand: tokenize
    // the numQueries query documents directly — identical distinct
    // (query_id, term) pairs (same tokenizer, same ≠"" filter; postings are
    // distinct (term, doc) by construction), one corpus-scale execution saved.
    val (qTerms, termList) = externalQueryTerms(
      docs.filter(col(idCol) < numQueries)
        .select(col(idCol).as("query_id"), col(textCol)),
      "query_id", textCol)
    val lex = bm25LexLeg(index, qTerms, termList, legK, k1, b,
      excludeSelf = true)
    val sem = Similarity.cosineTopK(embeddings, numQueries, legK,
        idCol = vecIdCol, vecCol = vecCol)
      .select(col("query_id"), col(vecIdCol).as("doc_id"),
        col("rank").as("sem_rank"))
    fuse(lex, sem, k, rrfK)
  }
}
