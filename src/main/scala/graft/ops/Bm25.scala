package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** BM25 keyword relevance over a document corpus — the lexical-retrieval half of a
  * training-data pipeline (mining documents relevant to a topic, building retrieval
  * baselines next to the embedding ANN path in [[Similarity]]).
  *
  * Scoring is Robertson/Okapi BM25 with the +1 idf smoothing Lucene uses, over the
  * corpus-wide whitespace segmentation of [[TextAnalysis.tokens]] lowercased:
  * `score(d) = Σ_t ln(1 + (N − df_t + 0.5)/(df_t + 0.5)) · tf · (k1+1) /
  * (tf + k1·(1 − b + b·dl/avgdl))`.
  *
  * Scale shape: the query's term list is tiny and fixed, so there is NO inverted
  * index and NO explode — per-document `tf` for each term is a map-side
  * `size(filter(tokens, _ = term))`, `(N, Σdl, df_t…)` reduce to ONE stats row
  * (partial aggregation, no shuffle of document data), which broadcast-joins back for
  * a second map-side scoring pass. Top-k lands in `TakeOrderedAndProject`. Two scans
  * of the text column and zero wide shuffles at any corpus size; all arithmetic on
  * exact integer (tf, dl, df, N) inputs, so scores are reproducible across engines —
  * rounded to 6 decimals to absorb last-ulp libm drift.
  */
object Bm25 {

  /** `doc_id, score` for every document matching ≥ 1 term (score descending,
    * doc_id tiebreak). Terms must be lowercase (the text is lowercased before
    * tokenizing; a mixed-case term would silently never match).
    */
  def scores(docs: DataFrame, terms: Seq[String], k1: Double = 1.2, b: Double = 0.75,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(terms.nonEmpty, "need at least one query term")
    require(terms.forall(t => t == t.toLowerCase), s"terms must be lowercase: $terms")
    require(terms.distinct.size == terms.size, "repeated terms double-count")

    val toks = TextAnalysis.tokens(lower(col(textCol)))
    def tfCol(i: Int): String = s"__tf$i"
    val perDoc = docs.select(
      col(idCol) +: size(toks).as("__dl") +:
        terms.zipWithIndex.map { case (t, i) =>
          size(filter(toks, tok => tok === lit(t))).as(tfCol(i))
        }: _*)

    val statAggs = sum(col("__dl")).as("__sumdl") +:
      terms.indices.map(i =>
        sum(when(col(tfCol(i)) > 0, 1L).otherwise(0L)).as(s"__df$i"))
    val stats = perDoc.agg(count(lit(1)).as("__n"), statAggs: _*)

    val n = col("__n").cast("double")
    val avgdl = col("__sumdl").cast("double") / n
    // one addend per term, summed left-to-right — the oracle writes the identical
    // chain so the float result is bit-stable across engines before rounding
    val score = terms.indices.map { i =>
      val tf = col(tfCol(i)).cast("double")
      val df = col(s"__df$i").cast("double")
      val idf = log(lit(1.0) + (n - df + 0.5) / (df + 0.5))
      idf * tf * (k1 + 1.0) / (tf + lit(k1) * (lit(1.0 - b) + lit(b) * col("__dl") / avgdl))
    }.reduce(_ + _)

    perDoc.join(broadcast(stats))
      .filter(terms.indices.map(i => col(tfCol(i))).reduce(_ + _) > 0)
      .select(col(idCol), round(score, 6).as("score"))
  }

  /** Top-k matches: `orderBy(score desc, id) limit k` — plans as
    * TakeOrderedAndProject (per-partition heaps, no global sort).
    */
  def topK(docs: DataFrame, terms: Seq[String], k: Int, k1: Double = 1.2,
      b: Double = 0.75, idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    scores(docs, terms, k1, b, idCol, textCol)
      .orderBy(col("score").desc, col(idCol))
      .limit(k)

  /** Materialized inverted index for REPEATED queries: one corpus scan builds
    * `postings` (term, doc_id, tf, dl) and `docs` (doc_id, dl) + a single-row
    * corpus stats frame. [[topKFromIndex]] then answers any query from index
    * lookups — per query it touches only the query terms' postings
    * (partition/sort the postings table by term on write and the scan prunes
    * to them), never the text. The document length `dl` is DENORMALIZED onto
    * every posting row (the Lucene norms-adjacent-to-postings layout): one
    * extra int per posting buys serving that never reads the O(corpus-rows)
    * `docLengths` table — a query's only non-broadcast read is the term-pruned
    * postings scan. `docLengths` is retained for stats folds and for
    * version-tolerant serving of indexes persisted before the denormalization
    * (postings without a `dl` column fall back to the join). The scan-based
    * [[topK]] stays the right call for one-off queries; the index pays for
    * itself from the second query on.
    */
  final case class Index(postings: DataFrame, docLengths: DataFrame, stats: DataFrame)

  def buildIndex(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): Index = {
    val toks = TextAnalysis.tokens(lower(col(textCol)))
    val perDoc = docs.select(col(idCol).as("doc_id"), toks.as("toks"))
      .select(col("doc_id"), size(col("toks")).as("dl"), col("toks"))
    // dl is constant per doc_id, so grouping by it does not change the groups
    val postings = perDoc
      .select(col("doc_id"), col("dl"), explode(col("toks")).as("term"))
      .groupBy("term", "doc_id", "dl").agg(count(lit(1)).as("tf"))
      .select("term", "doc_id", "tf", "dl")
    val docLengths = perDoc.select("doc_id", "dl")
    val stats = docLengths.agg(
      count(lit(1)).as("n"), sum(col("dl")).as("sumdl"))
    Index(postings, docLengths, stats)
  }

  /** Whether an index's postings carry the denormalized per-document length —
    * true for every index built since the denormalization; false only for
    * pre-existing persisted indexes, which serve through the docLengths join.
    */
  private[graft] def postingsCarryDl(index: Index): Boolean =
    index.postings.columns.contains("dl")

  /** Whether the PERSISTED postings at `dir` use the pre-denormalization
    * 3-column layout (no `dl`). A missing/empty postings table reads as the
    * CURRENT layout — the first batch to land decides it. Appends consult
    * this so the on-disk layout stays uniform (see [[conformPostings]]).
    */
  private[graft] def legacyPostingsLayout(
      spark: org.apache.spark.sql.SparkSession, dir: String): Boolean =
    try !graft.catalog.VersionedTable.read(spark, s"$dir/postings")
      .columns.contains("dl")
    catch {
      // no table / no commits yet → nothing persisted to conform to
      case _: java.io.FileNotFoundException => false
      case _: IllegalArgumentException => false
    }

  /** Conform a batch's postings to the PERSISTED layout before an append:
    * appending dl-carrying rows onto a pre-denormalization index would pass
    * the additive schema check, read back as dl=NULL for every OLD row under
    * mergeSchema, and [[postingsCarryDl]] (column presence alone) would then
    * route serving to the dl-on-postings branch — silently NULL-scoring all
    * pre-append documents. Matching the legacy 3-column shape instead keeps
    * the layout uniform, and serving stays on the (correct) docLengths-join
    * fallback for the index's whole life. Shared by [[appendToIndex]] and the
    * streaming maintainer ([[graft.streaming.IndexIngest]]); costs one
    * metadata-scale log resolution per batch.
    */
  private[graft] def conformPostings(postings: DataFrame, dir: String): DataFrame =
    if (legacyPostingsLayout(postings.sparkSession, dir)) postings.drop("dl")
    else postings

  /** Persisted-index lifecycle over [[graft.catalog.VersionedTable]] — the
    * incremental maintenance path that keeps the index-only serving tier
    * ([[topKFromIndex]], [[HybridRetrieval.bm25RrfTopKFromIndex]]) sustainable
    * on a GROWING corpus: each arriving batch is tokenized ONCE, and its
    * postings / doc-lengths / stats land as ordinary versioned-table appends —
    * prior corpus TEXT is never rescanned (the [[IncrementalDedup]] sign-once
    * pattern applied to retrieval; reference intent: the medallion layers'
    * incremental ingest, `ingestion/s3-orders-ingestion.py:33-58`, extended to
    * the retrieval tier).
    *
    * Layout under `dir`: three versioned tables — `postings` (term, doc_id,
    * tf, dl — the denormalized doc length, so SERVING reads postings alone),
    * `doclen` (doc_id, dl — kept for stats folds and audits, never read on a
    * serving path), and `stats` holding ONE `(n, sumdl)` row PER batch;
    * [[readIndexFrom]] folds the stat rows into the single-row corpus
    * frame the scorers expect. Appending per-batch stat rows instead of
    * read-modify-writing a global row keeps every append a pure O(batch)
    * write — no read of prior state, no lost-update window.
    *
    * Contract: batches carry NOVEL doc_ids (route arrivals through an ingest
    * ledger — [[graft.catalog.CopyInto]] — or [[IncrementalDedup.filterNovel]]
    * first); re-appending an indexed doc_id would double-count its postings
    * exactly as re-inserting a row double-counts in any append-only store.
    */
  def writeIndex(docs: DataFrame, dir: String, idCol: String = "doc_id",
      textCol: String = "text"): Unit =
    landBatch(docs, dir, "overwrite", idCol, textCol)

  /** Append one batch to a persisted index: tokenizes ONLY `batch` (one
    * [[buildIndex]] pass over it), never the corpus behind the index.
    */
  def appendToIndex(batch: DataFrame, dir: String, idCol: String = "doc_id",
      textCol: String = "text"): Unit =
    landBatch(batch, dir, "append", idCol, textCol)

  private def landBatch(batch: DataFrame, dir: String, operation: String,
      idCol: String, textCol: String): Unit =
    landArtifacts(batch, idCol, textCol) { (df, artifact) =>
      val out =
        if (artifact == "postings" && operation == "append")
          conformPostings(df, dir)
        else df
      graft.catalog.VersionedTable.write(out, s"$dir/$artifact", operation); ()
    }

  /** Build the three index artifacts from ONE persisted tokenization of the
    * batch and hand each to `land(df, artifact)` (artifact ∈ "postings" |
    * "doclen" | "stats") — without the persist, the three landing jobs would
    * each re-tokenize the batch text. Postings land TERM-CLUSTERED
    * (range-partitioned + sorted within files): parquet row-group min/max
    * stats on `term` are then tight, so the isin pushdown of
    * [[topKFromIndex]] / [[HybridRetrieval.bm25RrfTopKFromIndex]] prunes the
    * scan to the query terms' row groups. One batch-sized range shuffle per
    * append buys it. Shared by the batch append path and the streaming
    * maintainer ([[graft.streaming.IndexIngest]]).
    */
  private[graft] def landArtifacts(batch: DataFrame, idCol: String,
      textCol: String)(land: (DataFrame, String) => Unit): Unit = {
    val perDoc = batch
      .select(col(idCol).as("doc_id"),
        TextAnalysis.tokens(lower(col(textCol))).as("toks"))
      .select(col("doc_id"), size(col("toks")).as("dl"), col("toks"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val postings = perDoc
        .select(col("doc_id"), col("dl"), explode(col("toks")).as("term"))
        .groupBy("term", "doc_id", "dl").agg(count(lit(1)).as("tf"))
        .select("term", "doc_id", "tf", "dl")
        .repartitionByRange(col("term"))
        .sortWithinPartitions("term", "doc_id")
      val docLengths = perDoc.select("doc_id", "dl")
      val stats = docLengths.agg(
        count(lit(1)).as("n"), sum(col("dl")).as("sumdl"))
      land(postings, "postings")
      land(docLengths, "doclen")
      land(stats, "stats")
    } finally { perDoc.unpersist(); () }
  }

  /** Load a persisted index. The per-batch stat rows fold to the single
    * corpus-stats row here — O(#batches), metadata-scale; coalesce covers the
    * all-empty-batches degenerate case the same way an empty corpus does.
    *
    * CROSS-ARTIFACT CONSISTENCY (why this tier needs no
    * [[graft.catalog.IndexManifest]]): every mutation is append-only and
    * lands postings → doclen → stats, while this reader resolves stats FIRST
    * (below) and postings last — so the stats snapshot is always a subset of
    * the postings snapshot. A concurrent append can at worst add documents
    * whose postings are visible but whose batch hasn't reached the stats fold
    * yet: those score against a slightly-stale (N, avgdl) — bounded
    * staleness, never a torn layout (on the legacy 3-column layout the inner
    * doclen join instead holds such docs out of results until their doclen
    * batch lands — same bound). Compaction rewrites each artifact
    * content-preserving, so mixing pre/post-compact versions across artifacts
    * is also harmless. Rebuild — the one content-changing multi-table
    * overwrite — exists only on the codebook tiers (IVF, IVF-PQ), which is
    * exactly where the manifest lives. Do not reorder these reads.
    */
  def readIndexFrom(spark: org.apache.spark.sql.SparkSession, dir: String): Index = {
    import graft.catalog.VersionedTable
    val stats = VersionedTable.read(spark, s"$dir/stats")
      .agg(coalesce(sum(col("n")), lit(0L)).as("n"),
        coalesce(sum(col("sumdl")), lit(0L)).as("sumdl"))
    Index(VersionedTable.read(spark, s"$dir/postings"),
      VersionedTable.read(spark, s"$dir/doclen"), stats)
  }

  /** Register a persisted index's artifact tables as TEMP VIEWS so the
    * pure-SQL serving recipes ([[SqlRecipes.bm25FromIndexSql]],
    * [[SqlRecipes.hybridFromIndexSql]]) run end-to-end against named tables:
    * `spark.sql(SqlRecipes.bm25FromIndexSql(postingsView, statsView, ...))`.
    * Returns (postingsView, doclenView, statsView). Views resolve through
    * [[graft.catalog.VersionedTable.read]], so they serve the CURRENT
    * committed snapshot with the same pushed-predicate pruning as the Scala
    * paths (re-register to pick up later appends — a temp view pins the
    * snapshot it was created from).
    *
    * The SQL recipes require the denormalized `postings.dl`; for a
    * pre-denormalization index (3-column postings) the postings view
    * SYNTHESIZES `dl` through the doclen join here, so the recipes serve
    * either layout unchanged — the join cost is exactly what the legacy
    * Scala serving path pays. The doclen view itself is registered for
    * audits/stat folds only; no recipe reads it.
    */
  def registerIndexViews(spark: org.apache.spark.sql.SparkSession, dir: String,
      prefix: String = "bm25_idx"): (String, String, String) = {
    import graft.catalog.VersionedTable
    val names = (s"${prefix}_postings", s"${prefix}_doclen", s"${prefix}_stats")
    val postings = VersionedTable.read(spark, s"$dir/postings")
    val served =
      if (postings.columns.contains("dl")) postings
      else postings.join(VersionedTable.read(spark, s"$dir/doclen"), "doc_id")
        .select("term", "doc_id", "tf", "dl")
    served.createOrReplaceTempView(names._1)
    VersionedTable.read(spark, s"$dir/doclen")
      .createOrReplaceTempView(names._2)
    VersionedTable.read(spark, s"$dir/stats")
      .createOrReplaceTempView(names._3)
    names
  }

  /** Register the index artifacts as PERMANENT catalog tables over their
    * versioned-table locations (`CREATE TABLE <catalog>.<ns>.<prefix>_*
    * LOCATION ...` — [[graft.sources.table.GraftCatalog]]'s external
    * registration): unlike [[registerIndexViews]]' temp views, which pin the
    * snapshot they were created from, a catalog entry re-resolves the commit
    * log PER QUERY, so the same SQL statement tracks appends with no
    * re-registration (pinned in SqlSurfaceSpec). Requires the denormalized
    * postings layout — a catalog table cannot synthesize `dl`; serve a legacy
    * index through [[registerIndexViews]] instead. Returns (postingsTable,
    * doclenTable, statsTable) as fully-qualified names.
    */
  def registerIndexTables(spark: org.apache.spark.sql.SparkSession,
      dir: String, catalog: String, namespace: String,
      prefix: String = "bm25_idx"): (String, String, String) = {
    require(!legacyPostingsLayout(spark, dir),
      s"$dir/postings uses the pre-denormalization layout (no dl column) — " +
        "the SQL recipes need dl on postings; serve this index through " +
        "registerIndexViews, which synthesizes dl via the doclen join")
    def reg(artifact: String): String = {
      val t = s"$catalog.$namespace.${prefix}_$artifact"
      spark.sql(s"DROP TABLE IF EXISTS $t")
      spark.sql(s"CREATE TABLE $t LOCATION '$dir/$artifact'")
      t
    }
    (reg("postings"), reg("doclen"), reg("stats"))
  }

  /** Corpus vocabulary with retrieval statistics: one row per distinct token —
    * document frequency, total term frequency, and the same smoothed idf the
    * scorer uses. The lexicon feed for tokenizer training, stopword discovery
    * (top-df tail), and query planning. One scan + one shuffle keyed by term
    * (map-side combined); top-k consumers cut with TakeOrderedAndProject.
    */
  def vocabulary(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val n = docs.count().toDouble
    docs.select(col(idCol).as("doc_id"),
        explode(TextAnalysis.tokens(lower(col(textCol)))).as("term"))
      .groupBy("term")
      .agg(countDistinct(col("doc_id")).as("df"), count(lit(1)).as("total_tf"))
      .withColumn("idf", round(log(lit(1.0) + (lit(n) - col("df") + 0.5) / (col("df") + 0.5)), 6))
  }

  /** BM25 top-k off a prebuilt [[Index]] — identical scores to the scan-based
    * [[topK]] (same idf smoothing, same addend order over the terms as given).
    * Per-term df comes from the postings; documents missing a term contribute a
    * zero addend exactly as tf=0 does in the scan formulation.
    *
    * Serving reads: the term-pruned postings scan plus two broadcast
    * metadata-scale frames (per-term dfs, corpus stats) — `dl` rides on the
    * posting rows, so the O(corpus-rows) docLengths table is never read
    * (pre-denormalization indexes fall back to the join transparently).
    */
  def topKFromIndex(index: Index, terms: Seq[String], k: Int, k1: Double = 1.2,
      b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty, "need at least one query term")
    require(terms.forall(t => t == t.toLowerCase), s"terms must be lowercase: $terms")
    require(terms.distinct.size == terms.size, "repeated terms double-count")

    // only the query terms' postings leave the index scan. NO input spread
    // here (unlike HybridRetrieval.bm25LexLeg): a hand-written query carries
    // a few terms, so the pruned stream is tiny and the exchange costs more
    // than the one-task aggregation it would parallelize (r16 interleaved
    // A/B: q_bm25_append serving 0.33 s unspread vs 0.47 s spread; the
    // hybrid legs' 5-document term sets are ~10× wider and win there)
    val hits = index.postings.filter(col("term").isin(terms: _*))
    val dfs = hits.groupBy("term").agg(count(lit(1)).as("df"))
    // per-doc (term, tf) pairs pivot to tf columns so the scoring chain is the
    // same left-to-right fold as the scan path
    val tfCols = terms.zipWithIndex.map { case (t, i) =>
      sum(when(col("term") === t, col("tf")).otherwise(0L)).as(s"__tf$i") }
    val perDoc =
      if (postingsCarryDl(index))
        // dl is constant per doc_id: max() recovers it without a join
        hits.groupBy("doc_id").agg(tfCols.head,
          tfCols.tail :+ max(col("dl")).as("dl"): _*)
      else
        hits.groupBy("doc_id").agg(tfCols.head, tfCols.tail: _*)
          .join(index.docLengths, "doc_id")

    // coalesce: aggregating an EMPTY dfs frame (no term matched anything) yields
    // one all-NULL row, and the scan path's semantics for a matchless term is df=0
    val dfLit = terms.zipWithIndex.map { case (t, i) =>
      coalesce(max(when(col("term") === t, col("df")).otherwise(0L)), lit(0L))
        .as(s"__df$i") }
    val statRow = broadcast(index.stats.crossJoin(
      broadcast(dfs).agg(dfLit.head, dfLit.tail: _*)))

    val n = col("n").cast("double")
    val avgdl = col("sumdl").cast("double") / n
    val score = terms.indices.map { i =>
      val tf = col(s"__tf$i").cast("double")
      val df = col(s"__df$i").cast("double")
      val idf = log(lit(1.0) + (n - df + 0.5) / (df + 0.5))
      idf * tf * (k1 + 1.0) / (tf + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / avgdl))
    }.reduce(_ + _)

    perDoc.join(statRow)
      .select(col("doc_id"), round(score, 6).as("score"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(k)
  }
}
