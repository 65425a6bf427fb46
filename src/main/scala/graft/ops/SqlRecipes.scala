package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Pure-SQL surface for the flagship table-valued operators: each recipe builds ONE
  * complete SQL statement over named views, using only `spark.sql` constructs plus the
  * native kernels [[graft.functions.Registry]] registers (`word_shingles`,
  * `simhash64`). A SQL-first user — BI tool, notebook, `spark-sql` shell — reaches
  * near-dup pairs, contamination sweeps and SCD2 builds without touching the Scala API,
  * and gets the same results (equivalence is pinned query-by-query in SqlSurfaceSpec).
  *
  * The recipes keep the Scala operators' scale shape, not just their semantics:
  * `ngramJaccardPairsSql` reproduces the single-shuffle co-occurrence formulation of
  * [[Dedup.ngramJaccardPairs]] (group-by-shingle + inline pair expansion — not the
  * naive two-shuffle self-join), `contaminationSql` broadcast-hints the reference
  * side exactly like [[Dedup.contamination]], and `scd2Sql` is the same one-window
  * pass as [[Scd2.history]].
  */
object SqlRecipes {

  private def q(name: String): String = s"`${name.replace("`", "``")}`"

  /** Distinct word n-gram shingle stream of a document view — shared CTE body. */
  private def shinglesCte(view: String, idCol: String, textCol: String, n: Int): String =
    s"""SELECT ${q(idCol)} AS doc_id, shingle
       |FROM $view
       |LATERAL VIEW explode(array_distinct(word_shingles(${q(textCol)}, $n))) t AS shingle""".stripMargin

  /** All pairs (a < b) with n-gram Jaccard ≥ threshold — SQL twin of
    * [[Dedup.ngramJaccardPairs]]: same stop-shingle df cap, same single-shuffle
    * co-occurrence pair expansion (lambda `transform` over the per-shingle doc list),
    * same output columns.
    */
  def ngramJaccardPairsSql(
      docsView: String, idCol: String = "doc_id", textCol: String = "text",
      n: Int = 3, threshold: Double = 0.5, maxShingleDf: Int = 1000): String =
    s"""WITH sh AS (
       |  ${shinglesCte(docsView, idCol, textCol, n)}
       |),
       |sizes AS (
       |  SELECT ${q(idCol)} AS doc_id, size(word_shingles(${q(textCol)}, $n)) AS n_shingles
       |  FROM $docsView
       |),
       |grouped AS (
       |  SELECT array_sort(collect_list(doc_id)) AS docs
       |  FROM sh GROUP BY shingle HAVING count(*) <= $maxShingleDf
       |),
       |pairs AS (
       |  SELECT p.doc_a, p.doc_b, count(*) AS n_common
       |  FROM grouped
       |  LATERAL VIEW explode(flatten(transform(docs, (a, i) ->
       |    transform(slice(docs, i + 2, greatest(size(docs) - i - 1, 0)),
       |      b -> named_struct('doc_a', a, 'doc_b', b))))) t AS p
       |  GROUP BY p.doc_a, p.doc_b
       |)
       |SELECT p.doc_a, p.doc_b, p.n_common, sa.n_shingles AS size_a,
       |  sb.n_shingles AS size_b,
       |  CAST(p.n_common AS DOUBLE) / (sa.n_shingles + sb.n_shingles - p.n_common) AS jaccard
       |FROM pairs p
       |JOIN sizes sa ON p.doc_a = sa.doc_id
       |JOIN sizes sb ON p.doc_b = sb.doc_id
       |WHERE CAST(p.n_common AS DOUBLE) / (sa.n_shingles + sb.n_shingles - p.n_common)
       |  >= $threshold""".stripMargin

  /** Near pairs by SimHash — SQL twin of [[Dedup.simHash]] + [[Dedup.simHashNearPairs]]:
    * the native `simhash64` kernel, 4×16-bit pigeonhole banding as an equality
    * self-join, exact `bit_count(xor)` hamming check (complete for maxHamming ≤ 3).
    */
  def simhashNearPairsSql(
      docsView: String, idCol: String = "doc_id", textCol: String = "text",
      maxHamming: Int = 3): String = {
    require(maxHamming <= 3, "4-chunk banding is only complete for hamming <= 3")
    s"""WITH sim AS (
       |  SELECT ${q(idCol)} AS doc_id, simhash64(${q(textCol)}) AS simhash FROM $docsView
       |),
       |chunks AS (
       |  SELECT doc_id, simhash, chunk,
       |    shiftright(simhash, chunk * 16) & 65535 AS chunk_val
       |  FROM sim LATERAL VIEW explode(array(0, 1, 2, 3)) t AS chunk
       |)
       |SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b,
       |  bit_count(x.simhash ^ y.simhash) AS hamming
       |FROM chunks x
       |JOIN chunks y ON x.chunk = y.chunk AND x.chunk_val = y.chunk_val
       |  AND x.doc_id < y.doc_id
       |WHERE bit_count(x.simhash ^ y.simhash) <= $maxHamming""".stripMargin
  }

  /** Benchmark-contamination sweep — SQL twin of [[Dedup.contamination]]: containment
    * n_common / |reference shingles|, stop-shingle cap on the corpus side, reference
    * stream broadcast-hinted so the corpus never shuffles raw shingles.
    */
  def contaminationSql(
      corpusView: String, referenceView: String,
      idCol: String = "doc_id", textCol: String = "text",
      n: Int = 3, threshold: Double = 0.5, maxShingleDf: Int = 1000): String =
    s"""WITH sh_c AS (
       |  ${shinglesCte(corpusView, idCol, textCol, n)}
       |),
       |kept AS (
       |  SELECT s.doc_id, s.shingle
       |  FROM sh_c s
       |  JOIN (SELECT shingle FROM sh_c GROUP BY shingle HAVING count(*) <= $maxShingleDf) k
       |    ON s.shingle = k.shingle
       |),
       |sh_r AS (
       |  SELECT ${q(idCol)} AS ref_doc, shingle
       |  FROM $referenceView
       |  LATERAL VIEW explode(array_distinct(word_shingles(${q(textCol)}, $n))) t AS shingle
       |),
       |ref_sizes AS (
       |  SELECT ${q(idCol)} AS ref_doc, size(word_shingles(${q(textCol)}, $n)) AS ref_shingles
       |  FROM $referenceView
       |),
       |common AS (
       |  SELECT /*+ BROADCAST(r) */ k.doc_id AS corpus_doc, r.ref_doc, count(*) AS n_common
       |  FROM kept k JOIN sh_r r ON k.shingle = r.shingle
       |  GROUP BY k.doc_id, r.ref_doc
       |)
       |SELECT /*+ BROADCAST(s) */ c.corpus_doc, c.ref_doc, c.n_common, s.ref_shingles,
       |  CAST(c.n_common AS DOUBLE) / s.ref_shingles AS containment
       |FROM common c JOIN ref_sizes s ON c.ref_doc = s.ref_doc
       |WHERE CAST(c.n_common AS DOUBLE) / s.ref_shingles >= $threshold""".stripMargin

  /** SCD2 history — SQL twin of [[Scd2.history]]: one window pass derives
    * effective_from / effective_to / version_seq / is_current; delete ops close the
    * prior version and emit none themselves; version numbering is gapless after
    * delete suppression.
    */
  def scd2Sql(
      changesView: String, key: Seq[String], tsCol: String,
      tieBreak: Seq[String] = Seq.empty,
      opCol: Option[String] = None, deleteOp: String = "d"): String = {
    val part = key.map(q).mkString(", ")
    val order = (tsCol +: tieBreak).map(q).mkString(", ")
    val aliveFilter = opCol
      .map(op => s"WHERE ${q(op)} <> '${deleteOp.replace("'", "''")}'")
      .getOrElse("")
    s"""WITH versioned AS (
       |  SELECT *, ${q(tsCol)} AS effective_from,
       |    lead(${q(tsCol)}) OVER (PARTITION BY $part ORDER BY $order) AS effective_to
       |  FROM $changesView
       |),
       |alive AS (
       |  SELECT * FROM versioned $aliveFilter
       |)
       |SELECT *,
       |  CAST(row_number() OVER (PARTITION BY $part ORDER BY $order) AS BIGINT) AS version_seq,
       |  effective_to IS NULL AS is_current
       |FROM alive""".stripMargin
  }

  /** BM25 top-k — SQL twin of [[Bm25.topK]]: same two-scan/broadcast-stats shape
    * (the singleton `stats` CTE cross-joins in as one row — Spark broadcasts it),
    * same Lucene +1 idf smoothing and left-to-right addend order, scores rounded to
    * 6 decimals with id tiebreak.
    */
  def bm25TopKSql(docsView: String, terms: Seq[String], k: Int,
      k1: Double = 1.2, b: Double = 0.75,
      idCol: String = "doc_id", textCol: String = "text"): String = {
    require(terms.nonEmpty && terms.forall(t => t == t.toLowerCase)
      && terms.distinct.size == terms.size, "terms: nonempty, lowercase, distinct")
    val lit = terms.map(t => s"'${t.replace("'", "''")}'")
    val tf = lit.zipWithIndex.map { case (t, i) =>
      s"size(filter(toks, x -> x = $t)) AS tf$i" }.mkString(", ")
    val df = terms.indices.map(i =>
      s"sum(CASE WHEN tf$i > 0 THEN 1 ELSE 0 END) AS df$i").mkString(", ")
    val addends = terms.indices.map { i =>
      s"ln(1.0 + (n - df$i + 0.5) / (df$i + 0.5)) * tf$i * ${k1 + 1.0}" +
        s" / (tf$i + $k1 * (${1.0 - b} + $b * dl / avgdl))"
    }.mkString("(", " + ", ")")
    val anyTf = terms.indices.map(i => s"tf$i").mkString(" + ")
    s"""WITH p AS (
       |  SELECT ${q(idCol)} AS doc_id, size(toks) AS dl, $tf
       |  FROM (SELECT ${q(idCol)}, split(trim(lower(${q(textCol)})), '\\\\s+') AS toks
       |        FROM $docsView)
       |),
       |stats AS (
       |  SELECT CAST(count(*) AS DOUBLE) AS n,
       |    CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl, $df
       |  FROM p
       |)
       |SELECT doc_id, round($addends, 6) AS score
       |FROM p CROSS JOIN stats WHERE $anyTf > 0
       |ORDER BY score DESC, doc_id LIMIT $k""".stripMargin
  }

  /** BM25 top-k FROM A PERSISTED INVERTED INDEX — pure-SQL twin of
    * [[Bm25.topKFromIndex]] over the index views ([[Bm25.writeIndex]]'s
    * layout registered as views/tables): `postings(term, doc_id, tf, dl)` —
    * the denormalized doc length rides on every posting row, so the recipe
    * reads NO doc-lengths table — and `stats` holding one `(n, sumdl)` row
    * PER BATCH, folded here by summing, exactly [[Bm25.readIndexFrom]]. Only
    * the query terms' postings leave the index scan (the IN list pushes into
    * the term-clustered layout); the scores are the identical fixed-order
    * addend chain rounded to 6 decimals, so the SQL and Scala paths rank
    * identically row for row.
    */
  def bm25FromIndexSql(postingsView: String, statsView: String,
      terms: Seq[String], k: Int,
      k1: Double = 1.2, b: Double = 0.75): String = {
    require(terms.nonEmpty && terms.forall(t => t == t.toLowerCase)
      && terms.distinct.size == terms.size, "terms: nonempty, lowercase, distinct")
    val lits = terms.map(t => s"'${t.replace("'", "''")}'")
    val inList = lits.mkString(", ")
    val tfCols = lits.zipWithIndex.map { case (t, i) =>
      s"sum(CASE WHEN term = $t THEN tf ELSE 0 END) AS tf$i" }.mkString(", ")
    val dfCols = lits.zipWithIndex.map { case (t, i) =>
      s"coalesce(max(CASE WHEN term = $t THEN df END), 0) AS df$i" }.mkString(", ")
    val addends = terms.indices.map { i =>
      s"ln(1.0 + (n - df$i + 0.5) / (df$i + 0.5)) * tf$i * ${k1 + 1.0}" +
        s" / (tf$i + $k1 * (${1.0 - b} + $b * dl / avgdl))"
    }.mkString("(", " + ", ")")
    s"""WITH hits AS (
       |  SELECT term, doc_id, tf, dl FROM $postingsView WHERE term IN ($inList)
       |),
       |dfs AS (SELECT term, count(*) AS df FROM hits GROUP BY term),
       |dfr AS (SELECT $dfCols FROM dfs),
       |st AS (
       |  SELECT CAST(coalesce(sum(n), 0) AS DOUBLE) AS n,
       |    CAST(coalesce(sum(sumdl), 0) AS DOUBLE)
       |      / CAST(coalesce(sum(n), 0) AS DOUBLE) AS avgdl
       |  FROM $statsView
       |),
       |pd AS (
       |  SELECT doc_id, max(dl) AS dl, $tfCols FROM hits GROUP BY doc_id
       |)
       |SELECT doc_id, round($addends, 6) AS score
       |FROM pd CROSS JOIN dfr CROSS JOIN st
       |ORDER BY score DESC, doc_id LIMIT $k""".stripMargin
  }

  /** IVF top-k FROM A PERSISTED INDEX — pure-SQL twin of
    * [[Ivf.ivfTopKFromIndex]] over the two index views ([[Ivf.writeIvfIndex]]'s
    * layout registered via [[Ivf.registerIndexViews]]): `vectors(vec_id, v,
    * norm, cluster)` and `centroids(centroid_id, cv)`. Probe argmax by
    * (cosine DESC, centroid_id), exact 4-dp rerank of the probed clusters
    * only, (cosine DESC, vec_id) tiebreak — all through the native
    * `dot_product` so float sums are bit-identical to the Scala path and the
    * two rank identically row for row. The cluster equality join prunes the
    * same candidate set the Scala path's pushed isin reads.
    */
  def ivfFromIndexSql(vectorsView: String, centroidsView: String,
      numQueries: Int, k: Int, nprobe: Int): String = {
    require(numQueries > 0 && k > 0 && nprobe > 0)
    s"""WITH c AS (SELECT centroid_id, cv,
       |    sqrt(dot_product(cv, cv)) AS cnorm FROM $centroidsView),
       |q AS (SELECT vec_id AS query_id, v AS qv, norm AS qnorm
       |  FROM $vectorsView WHERE vec_id < $numQueries),
       |probes AS (SELECT query_id, qv, qnorm, centroid_id AS cluster FROM (
       |    SELECT q.query_id, q.qv, q.qnorm, c.centroid_id,
       |      row_number() OVER (PARTITION BY q.query_id ORDER BY
       |        dot_product(q.qv, c.cv) / (q.qnorm * c.cnorm) DESC,
       |        c.centroid_id) AS prn
       |    FROM q CROSS JOIN c) WHERE prn <= $nprobe),
       |cand AS (SELECT p.query_id, vv.vec_id,
       |    round(dot_product(p.qv, vv.v) / (p.qnorm * vv.norm), 4) AS cosine
       |  FROM probes p JOIN $vectorsView vv
       |    ON vv.cluster = p.cluster AND vv.vec_id <> p.query_id)
       |SELECT query_id, rank, vec_id, cosine FROM (
       |  SELECT *, row_number() OVER (
       |    PARTITION BY query_id ORDER BY cosine DESC, vec_id) AS rank
       |  FROM cand)
       |WHERE rank <= $k""".stripMargin
  }

  /** Fully index-backed HYBRID RETRIEVAL in pure SQL — twin of
    * [[HybridRetrieval.hybridTopKFromIndexes]] over the four index views
    * (register via [[Bm25.registerIndexViews]] + [[Ivf.registerIndexViews]]):
    * the BM25 lexical leg serves from `postings(term, doc_id, tf, dl)` +
    * folded `stats` alone (dl denormalized — no doclen read), the semantic
    * leg is [[ivfFromIndexSql]]'s probe + rerank, fused by RRF
    * `1/(rrfK + rank)` with (rrf DESC, doc_id) tiebreak. Addends are
    * 6-dp-rounded BEFORE the per-pair sum (order-independent grouped sum)
    * and every float chain matches the Scala operators' operation order, so
    * SQL and Scala rank identically row for row.
    */
  def hybridFromIndexSql(postingsView: String, statsView: String,
      vectorsView: String, centroidsView: String,
      numQueries: Int, legK: Int, k: Int, rrfK: Int = 60,
      k1: Double = 1.2, b: Double = 0.75, nprobe: Int = 4): String = {
    require(numQueries > 0 && legK > 0 && k > 0 && rrfK > 0 && nprobe > 0)
    s"""WITH qt AS (SELECT DISTINCT doc_id AS query_id, term
       |  FROM $postingsView WHERE doc_id < $numQueries AND term <> ''),
       |hits AS (SELECT term, doc_id, tf, dl FROM $postingsView
       |  WHERE term IN (SELECT DISTINCT term FROM qt)),
       |dfs AS (SELECT term, count(*) AS df FROM hits GROUP BY term),
       |st AS (SELECT CAST(coalesce(sum(n), 0) AS DOUBLE) AS n,
       |    CAST(coalesce(sum(sumdl), 0) AS DOUBLE)
       |      / CAST(coalesce(sum(n), 0) AS DOUBLE) AS avgdl FROM $statsView),
       |a AS (SELECT qt.query_id, h.doc_id,
       |    round(ln(1.0 + (n - df + 0.5) / (df + 0.5)) * tf * ${k1 + 1.0}
       |      / (tf + $k1 * (${1.0 - b} + $b * dl / avgdl)), 6) AS a
       |  FROM hits h JOIN qt ON h.term = qt.term AND h.doc_id <> qt.query_id
       |  JOIN dfs ON dfs.term = h.term CROSS JOIN st),
       |lex0 AS (SELECT query_id, doc_id, round(sum(a), 6) AS bm25
       |  FROM a GROUP BY query_id, doc_id),
       |lex AS (SELECT query_id, doc_id, lex_rank FROM (
       |    SELECT *, row_number() OVER (
       |      PARTITION BY query_id ORDER BY bm25 DESC, doc_id) AS lex_rank
       |    FROM lex0) WHERE lex_rank <= $legK),
       |c AS (SELECT centroid_id, cv,
       |    sqrt(dot_product(cv, cv)) AS cnorm FROM $centroidsView),
       |q AS (SELECT vec_id AS query_id, v AS qv, norm AS qnorm
       |  FROM $vectorsView WHERE vec_id < $numQueries),
       |probes AS (SELECT query_id, qv, qnorm, centroid_id AS cluster FROM (
       |    SELECT q.query_id, q.qv, q.qnorm, c.centroid_id,
       |      row_number() OVER (PARTITION BY q.query_id ORDER BY
       |        dot_product(q.qv, c.cv) / (q.qnorm * c.cnorm) DESC,
       |        c.centroid_id) AS prn
       |    FROM q CROSS JOIN c) WHERE prn <= $nprobe),
       |cand AS (SELECT p.query_id, vv.vec_id AS doc_id,
       |    round(dot_product(p.qv, vv.v) / (p.qnorm * vv.norm), 4) AS cosine
       |  FROM probes p JOIN $vectorsView vv
       |    ON vv.cluster = p.cluster AND vv.vec_id <> p.query_id),
       |sem AS (SELECT query_id, doc_id, sem_rank FROM (
       |    SELECT *, row_number() OVER (
       |      PARTITION BY query_id ORDER BY cosine DESC, doc_id) AS sem_rank
       |    FROM cand) WHERE sem_rank <= $legK),
       |fused AS (SELECT coalesce(lex.query_id, sem.query_id) AS query_id,
       |    coalesce(lex.doc_id, sem.doc_id) AS doc_id,
       |    lex.lex_rank, sem.sem_rank,
       |    coalesce(CAST(1.0 AS DOUBLE)
       |        / (CAST($rrfK AS DOUBLE) + CAST(lex.lex_rank AS DOUBLE)),
       |      CAST(0 AS DOUBLE))
       |      + coalesce(CAST(1.0 AS DOUBLE)
       |        / (CAST($rrfK AS DOUBLE) + CAST(sem.sem_rank AS DOUBLE)),
       |      CAST(0 AS DOUBLE)) AS rrf
       |  FROM lex FULL OUTER JOIN sem
       |    ON lex.query_id = sem.query_id AND lex.doc_id = sem.doc_id)
       |SELECT query_id, rank, doc_id, rrf, lex_rank, sem_rank FROM (
       |  SELECT *, row_number() OVER (
       |    PARTITION BY query_id ORDER BY rrf DESC, doc_id) AS rank FROM fused)
       |WHERE rank <= $k""".stripMargin
  }

  /** Fully index-backed hybrid retrieval for EXTERNAL queries in pure SQL —
    * twin of [[HybridRetrieval.bm25RrfTopKForQueries]] over the four index
    * views plus a QUERY view `(query_id, text, embedding)` registered by the
    * caller (a request batch, a VALUES relation, a landed micro-batch): the
    * query terms come from tokenizing the query view's own text (distinct
    * pairs — [[Bm25.buildIndex]]'s whitespace segmentation of the lowercased
    * text), NO extraction scan of the postings exists, and NO self-exclusion
    * on either leg (the query id space is unrelated to corpus ids). Float
    * chains ride the registered native `dot_product` and the same 6-dp/4-dp
    * grids as the Scala path, so SQL and Scala rank identically row for row
    * (pinned in SqlSurfaceSpec).
    */
  def hybridForQueriesSql(postingsView: String, statsView: String,
      vectorsView: String, centroidsView: String, queriesView: String,
      legK: Int, k: Int, rrfK: Int = 60,
      k1: Double = 1.2, b: Double = 0.75, nprobe: Int = 4,
      queryIdCol: String = "query_id", queryTextCol: String = "text",
      queryVecCol: String = "embedding"): String = {
    require(legK > 0 && k > 0 && rrfK > 0 && nprobe > 0)
    s"""WITH qt AS (SELECT DISTINCT query_id, term FROM (
       |    SELECT ${q(queryIdCol)} AS query_id,
       |      explode(split(trim(lower(coalesce(${q(queryTextCol)}, ''))),
       |        '\\\\s+')) AS term
       |    FROM $queriesView) WHERE term <> ''),
       |hits AS (SELECT term, doc_id, tf, dl FROM $postingsView
       |  WHERE term IN (SELECT DISTINCT term FROM qt)),
       |dfs AS (SELECT term, count(*) AS df FROM hits GROUP BY term),
       |st AS (SELECT CAST(coalesce(sum(n), 0) AS DOUBLE) AS n,
       |    CAST(coalesce(sum(sumdl), 0) AS DOUBLE)
       |      / CAST(coalesce(sum(n), 0) AS DOUBLE) AS avgdl FROM $statsView),
       |a AS (SELECT qt.query_id, h.doc_id,
       |    round(ln(1.0 + (n - df + 0.5) / (df + 0.5)) * tf * ${k1 + 1.0}
       |      / (tf + $k1 * (${1.0 - b} + $b * dl / avgdl)), 6) AS a
       |  FROM hits h JOIN qt ON h.term = qt.term
       |  JOIN dfs ON dfs.term = h.term CROSS JOIN st),
       |lex0 AS (SELECT query_id, doc_id, round(sum(a), 6) AS bm25
       |  FROM a GROUP BY query_id, doc_id),
       |lex AS (SELECT query_id, doc_id, lex_rank FROM (
       |    SELECT *, row_number() OVER (
       |      PARTITION BY query_id ORDER BY bm25 DESC, doc_id) AS lex_rank
       |    FROM lex0) WHERE lex_rank <= $legK),
       |c AS (SELECT centroid_id, cv,
       |    sqrt(dot_product(cv, cv)) AS cnorm FROM $centroidsView),
       |q AS (SELECT ${q(queryIdCol)} AS query_id,
       |    transform(${q(queryVecCol)}, x -> CAST(x AS DOUBLE)) AS qv
       |  FROM $queriesView),
       |qn AS (SELECT query_id, qv, sqrt(dot_product(qv, qv)) AS qnorm FROM q),
       |probes AS (SELECT query_id, qv, qnorm, centroid_id AS cluster FROM (
       |    SELECT qn.query_id, qn.qv, qn.qnorm, c.centroid_id,
       |      row_number() OVER (PARTITION BY qn.query_id ORDER BY
       |        dot_product(qn.qv, c.cv) / (qn.qnorm * c.cnorm) DESC,
       |        c.centroid_id) AS prn
       |    FROM qn CROSS JOIN c) WHERE prn <= $nprobe),
       |cand AS (SELECT p.query_id, vv.vec_id AS doc_id,
       |    round(dot_product(p.qv, vv.v) / (p.qnorm * vv.norm), 4) AS cosine
       |  FROM probes p JOIN $vectorsView vv ON vv.cluster = p.cluster),
       |sem AS (SELECT query_id, doc_id, sem_rank FROM (
       |    SELECT *, row_number() OVER (
       |      PARTITION BY query_id ORDER BY cosine DESC, doc_id) AS sem_rank
       |    FROM cand) WHERE sem_rank <= $legK),
       |fused AS (SELECT coalesce(lex.query_id, sem.query_id) AS query_id,
       |    coalesce(lex.doc_id, sem.doc_id) AS doc_id,
       |    lex.lex_rank, sem.sem_rank,
       |    coalesce(CAST(1.0 AS DOUBLE)
       |        / (CAST($rrfK AS DOUBLE) + CAST(lex.lex_rank AS DOUBLE)),
       |      CAST(0 AS DOUBLE))
       |      + coalesce(CAST(1.0 AS DOUBLE)
       |        / (CAST($rrfK AS DOUBLE) + CAST(sem.sem_rank AS DOUBLE)),
       |      CAST(0 AS DOUBLE)) AS rrf
       |  FROM lex FULL OUTER JOIN sem
       |    ON lex.query_id = sem.query_id AND lex.doc_id = sem.doc_id)
       |SELECT query_id, rank, doc_id, rrf, lex_rank, sem_rank FROM (
       |  SELECT *, row_number() OVER (
       |    PARTITION BY query_id ORDER BY rrf DESC, doc_id) AS rank FROM fused)
       |WHERE rank <= $k""".stripMargin
  }

  /** Binary-quantized ANN FROM A PERSISTED CODES TABLE — pure-SQL twin of
    * [[Similarity.bqTopKFromCodes]] over `codes(vec_id, code)` plus the
    * embeddings view for the exact rerank (completing the SQL serving story
    * across the retrieval tiers: BM25, IVF, hybrid, BQ, IVFADC): exact-integer
    * Hamming sweep of the 32×-compressed codes (the tier's contract — a
    * LINEAR sweep, nothing to prune), shortlist with (hamming, vec_id) ties,
    * 4-dp cosine rerank of shortlist rows only through the native
    * `dot_product`, self excluded (the internal-query convention). Same float
    * chains as the Scala path, so the two rank identically row for row.
    */
  def bqFromCodesSql(codesView: String, embeddingsView: String,
      numQueries: Int, k: Int, shortlistK: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): String = {
    require(numQueries > 0 && k > 0 && shortlistK >= k,
      s"shortlistK ($shortlistK) must cover k ($k)")
    s"""WITH qc AS (SELECT vec_id AS query_id, code AS qcode
       |  FROM $codesView WHERE vec_id < $numQueries),
       |h AS (SELECT qc.query_id, c.vec_id,
       |    aggregate(zip_with(qc.qcode, c.code,
       |      (x, y) -> CAST(bit_count(x ^ y) AS BIGINT)),
       |      CAST(0 AS BIGINT), (acc, v) -> acc + v) AS hamming
       |  FROM $codesView c JOIN qc ON c.vec_id <> qc.query_id),
       |sl AS (SELECT query_id, vec_id FROM (
       |    SELECT *, row_number() OVER (
       |      PARTITION BY query_id ORDER BY hamming, vec_id) AS sr FROM h)
       |  WHERE sr <= $shortlistK),
       |n AS (SELECT ${q(idCol)} AS vec_id,
       |    transform(${q(vecCol)}, x -> CAST(x AS DOUBLE)) AS v
       |  FROM $embeddingsView),
       |nn AS (SELECT vec_id, v, sqrt(dot_product(v, v)) AS norm FROM n),
       |qv AS (SELECT vec_id AS query_id, v AS qv, norm AS qnorm FROM nn
       |  WHERE vec_id < $numQueries),
       |s AS (SELECT sl.query_id, sl.vec_id,
       |    round(dot_product(qv.qv, nn.v) / (qv.qnorm * nn.norm), 4) AS cosine
       |  FROM sl JOIN nn ON nn.vec_id = sl.vec_id
       |    JOIN qv ON qv.query_id = sl.query_id)
       |SELECT query_id, rank, vec_id, cosine FROM (
       |  SELECT *, row_number() OVER (
       |    PARTITION BY query_id ORDER BY cosine DESC, vec_id) AS rank FROM s)
       |WHERE rank <= $k""".stripMargin
  }

  /** IVFADC search FROM A PERSISTED INDEX for EXTERNAL queries — pure-SQL
    * twin of [[IvfPq.searchIndex]] over the three index views
    * ([[IvfPq.writePqIndex]]'s layout registered via
    * [[IvfPq.registerIndexViews]]): `codes(vec_id, cluster, codes)`,
    * `coarse(cluster, cw)`, `pq(subspace, code, cw)`, plus a registered query
    * view `(queryIdCol, queryVecCol)`. Replays the full chain in the Scala
    * operator's operation order — probe argmin by (squared L2 ASC, cluster),
    * per-(query, probe) residual lookup table, ADC sum over the probed
    * clusters' codes, `adist` on the 4-dp grid BEFORE ranking with vec_id
    * ties, NO self-exclusion (the external convention) — so SQL and Scala
    * rank identically row for row. The squared-L2 folds are written as the
    * identical interpreted `aggregate(zip_with(...))` chains the Scala path
    * evaluates, keeping float results bit-equal. The cluster equality join
    * prunes the same candidate set the Scala path's pushed isin reads
    * (exactly [[ivfFromIndexSql]]'s trade).
    */
  def ivfPqForQueriesSql(codesView: String, coarseView: String,
      pqView: String, queriesView: String, k: Int, nprobe: Int,
      queryIdCol: String = "query_id",
      queryVecCol: String = "embedding"): String = {
    require(k > 0 && nprobe > 0)
    val sq = "(x, y) -> (x - y) * (x - y)"
    s"""WITH cb AS (SELECT collect_list(struct(subspace, code, cw)) AS cbs,
       |    CAST(count(DISTINCT subspace) AS INT) AS m FROM $pqView),
       |qr AS (SELECT ${q(queryIdCol)} AS query_id,
       |    transform(${q(queryVecCol)}, x -> CAST(x AS DOUBLE)) AS qv
       |  FROM $queriesView),
       |probed AS (SELECT qr.query_id, qr.qv, cc.cluster, cc.cw AS ccw,
       |    aggregate(zip_with(qr.qv, cc.cw, $sq),
       |      CAST(0.0 AS DOUBLE), (acc, v) -> acc + v) AS cdist
       |  FROM qr CROSS JOIN $coarseView cc),
       |probes AS (SELECT query_id, qv, cluster, ccw FROM (
       |    SELECT *, row_number() OVER (
       |      PARTITION BY query_id ORDER BY cdist ASC, cluster) AS prn
       |    FROM probed) WHERE prn <= $nprobe),
       |luts AS (SELECT p.query_id, p.cluster, cb.m,
       |    map_from_entries(transform(cb.cbs, c ->
       |      struct(c.subspace * 65536 + c.code,
       |        aggregate(zip_with(
       |          zip_with(
       |            slice(p.qv, c.subspace * CAST(size(p.qv) / cb.m AS INT) + 1,
       |              CAST(size(p.qv) / cb.m AS INT)),
       |            slice(p.ccw, c.subspace * CAST(size(p.qv) / cb.m AS INT) + 1,
       |              CAST(size(p.qv) / cb.m AS INT)),
       |            (x, y) -> x - y),
       |          c.cw, $sq),
       |          CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)))) AS lut
       |  FROM probes p CROSS JOIN cb),
       |cand AS (SELECT l.query_id, cd.vec_id,
       |    round(aggregate(sequence(0, l.m - 1), CAST(0.0 AS DOUBLE),
       |      (acc, j) -> acc + element_at(l.lut,
       |        j * 65536 + element_at(cd.codes, j + 1))), 4) AS adist
       |  FROM $codesView cd JOIN luts l ON cd.cluster = l.cluster)
       |SELECT query_id, rank, vec_id, adist AS approx_sq_dist FROM (
       |  SELECT *, row_number() OVER (
       |    PARTITION BY query_id ORDER BY adist ASC, vec_id) AS rank
       |  FROM cand)
       |WHERE rank <= $k""".stripMargin
  }

  /** Ordered conversion funnel — SQL twin of [[Funnel.userFunnel]]: the same
    * single-shuffle collect→sort→aggregate-HOF walk (not k chained self-joins),
    * same min-recursion semantics and output columns.
    */
  def funnelSql(eventsView: String, steps: Seq[String], windowMicros: Long,
      userCol: String = "user_id", tsCol: String = "ts",
      typeCol: String = "event_type"): String = {
    require(steps.nonEmpty && steps.distinct.size == steps.size,
      "steps: nonempty, distinct")
    val n = steps.size
    val stepsArr = steps.map(s => s"'${s.replace("'", "''")}'").mkString("array(", ", ", ")")
    val inList = steps.map(s => s"'${s.replace("'", "''")}'").mkString(", ")
    val stepCols = steps.indices.map(i =>
      s"get(ts_arr, $i) AS t${i + 1}_us").mkString(", ")
    s"""WITH walked AS (
       |  SELECT ${q(userCol)} AS user_id,
       |    aggregate(
       |      array_sort(collect_list(struct(unix_micros(${q(tsCol)}) AS ts,
       |        ${q(typeCol)} AS et))),
       |      CAST(array() AS ARRAY<BIGINT>),
       |      (acc, e) -> IF(
       |        size(acc) < $n
       |          AND e.et = element_at($stepsArr, size(acc) + 1)
       |          AND (size(acc) = 0 OR (e.ts > get(acc, size(acc) - 1)
       |               AND e.ts <= get(acc, 0) + ${windowMicros}L)),
       |        concat(acc, array(e.ts)), acc)) AS ts_arr
       |  FROM $eventsView
       |  WHERE ${q(typeCol)} IN ($inList)
       |  GROUP BY ${q(userCol)}
       |)
       |SELECT user_id, size(ts_arr) AS steps_completed, $stepCols
       |FROM walked""".stripMargin
  }

  /** Gopher quality gate — SQL twin of [[TextAnalysis.gopherFilter]]: same staged
    * token/line arrays (materialized in a subquery so no lambda re-splits), same
    * rules and thresholds; returns the PASSING rows of the view.
    */
  def gopherFilterSql(docsView: String,
      g: TextAnalysis.GopherConfig = TextAnalysis.GopherConfig(),
      textCol: String = "text"): String = {
    val t = q(textCol)
    val stopSum = TextAnalysis.gopherStop.map(w =>
      s"CASE WHEN array_contains(ltoks, '$w') THEN 1 ELSE 0 END")
      .mkString("(", " + ", ")")
    s"""WITH staged AS (
       |  SELECT *, split(trim($t), '\\\\s+') AS toks,
       |    split(trim(lower($t)), '\\\\s+') AS ltoks,
       |    split($t, '\\\\n') AS lines
       |  FROM $docsView
       |),
       |m AS (
       |  SELECT *,
       |    CASE WHEN length(trim($t)) = 0 THEN 0 ELSE size(toks) END AS n_words,
       |    length(regexp_replace(trim($t), '\\\\s+', '')) AS n_nonspace,
       |    size(regexp_extract_all($t, '#|\\\\.\\\\.\\\\.|…', 0)) AS n_symbols,
       |    size(lines) AS n_lines,
       |    size(filter(lines, l -> l rlike '^[ \\\\t]*[-*•]')) AS n_bullet,
       |    size(filter(lines, l -> l rlike '(\\\\.\\\\.\\\\.|…)[ \\\\t]*$$')) AS n_ellipsis,
       |    size(filter(toks, x -> x rlike '[A-Za-z]')) AS n_alpha,
       |    $stopSum AS stop_hits
       |  FROM staged
       |)
       |SELECT * EXCEPT (toks, ltoks, lines, n_words, n_nonspace, n_symbols,
       |  n_lines, n_bullet, n_ellipsis, n_alpha, stop_hits)
       |FROM m
       |WHERE n_words BETWEEN ${g.minWords} AND ${g.maxWords}
       |  AND (CASE WHEN n_words > 0
       |    THEN CAST(n_nonspace AS DOUBLE) / n_words ELSE 0.0 END)
       |    BETWEEN ${g.minMeanWordLen} AND ${g.maxMeanWordLen}
       |  AND (CASE WHEN n_words > 0
       |    THEN CAST(n_symbols AS DOUBLE) / n_words ELSE 0.0 END)
       |    <= ${g.maxSymbolWordRatio}
       |  AND CAST(n_bullet AS DOUBLE) / n_lines <= ${g.maxBulletLineRatio}
       |  AND CAST(n_ellipsis AS DOUBLE) / n_lines <= ${g.maxEllipsisLineRatio}
       |  AND (CASE WHEN n_words > 0
       |    THEN CAST(n_alpha AS DOUBLE) / n_words ELSE 0.0 END)
       |    >= ${g.minAlphaWordRatio}
       |  AND stop_hits >= ${g.minStopHits}""".stripMargin
  }

  /** Per-source hard cap — SQL twin of [[Splits.capGroups]] (same deterministic
    * (md5(id), id) selection order; the window formulation, which the Scala
    * operator's bottom-k aggregate is proven row-identical to).
    */
  def capGroupsSql(docsView: String, groupCol: String, cap: Int,
      idCol: String = "doc_id"): String = {
    require(cap > 0, s"cap must be positive, got $cap")
    s"""SELECT * EXCEPT (__rn) FROM (
       |  SELECT *, row_number() OVER (PARTITION BY ${q(groupCol)}
       |    ORDER BY md5(CAST(${q(idCol)} AS STRING)),
       |      CAST(${q(idCol)} AS STRING)) AS __rn
       |  FROM $docsView
       |) WHERE __rn <= $cap""".stripMargin
  }

  /** Fuzzy entity-resolution pairs — SQL twin of [[FuzzyJoin.editDistancePairs]]
    * at depth 1: the same deletion-neighborhood blocking (string itself + every
    * single-character deletion), the same 8-byte `xxhash64` variant key, the same
    * dedup-then-verify order. Distance-2 needs the nested variant expansion and
    * stays Scala-API-only.
    */
  def fuzzyPairsSql(view: String, idCol: String = "id",
      strCol: String = "s"): String =
    s"""WITH base AS (SELECT ${q(idCol)} AS id, ${q(strCol)} AS s FROM $view),
       |v AS (
       |  SELECT id, s, xxhash64(variant) AS vh
       |  FROM base
       |  LATERAL VIEW explode(array_distinct(
       |    CASE WHEN length(s) <= 0 THEN array(s)
       |    ELSE concat(array(s), transform(sequence(0, length(s) - 1), i ->
       |      concat(substr(s, 1, i), substr(s, i + 2, length(s))))) END)) t AS variant
       |),
       |cand AS (
       |  SELECT DISTINCT a.id AS id_1, b.id AS id_2, a.s AS s_1, b.s AS s_2
       |  FROM v a JOIN v b ON a.vh = b.vh AND a.id < b.id
       |)
       |SELECT id_1, id_2, s_1, s_2, levenshtein(s_1, s_2) AS dist
       |FROM cand WHERE levenshtein(s_1, s_2) <= 1""".stripMargin

  /** Pinned-weight quality scoring — SQL twin of [[QualityClassifier.score]]:
    * the same textStats feature math and the same left-associated sigmoid.
    */
  def qualityScoreSql(docsView: String, weights: Seq[Double],
      idCol: String = "doc_id", textCol: String = "text"): String = {
    require(weights.length == 6, s"expected 6 weights, got ${weights.length}")
    val stop = TextAnalysis.enStop.map(w => s"'$w'").mkString("array(", ", ", ")")
    val t = q(textCol)
    val features = Seq("1.0", "ln(1.0 + n_chars)", "ln(1.0 + n_words)",
      "avg_word_len", "punct_ratio", "stopword_ratio")
    val z = weights.zip(features).map { case (w, f) => s"$w * $f" }.mkString(" + ")
    s"""WITH s AS (SELECT ${q(idCol)} AS doc_id, $t AS text,
       |    split(trim($t), '\\\\s+') AS toks FROM $docsView),
       |u AS (SELECT doc_id, length(text) AS n_chars, size(toks) AS n_words,
       |    length(regexp_replace(trim(text), '\\\\s+', '')) AS n_nonspace,
       |    size(regexp_extract_all(text, '[^\\\\w\\\\s]', 0)) AS n_punct,
       |    size(filter(toks, x -> array_contains($stop, x))) AS n_stop
       |  FROM s),
       |v AS (SELECT doc_id, n_chars, n_words,
       |    CASE WHEN n_words > 0 THEN CAST(n_nonspace AS DOUBLE) / n_words
       |      ELSE 0.0 END AS avg_word_len,
       |    CASE WHEN n_chars > 0 THEN CAST(n_punct AS DOUBLE) / n_chars
       |      ELSE 0.0 END AS punct_ratio,
       |    CASE WHEN n_words > 0 THEN CAST(n_stop AS DOUBLE) / n_words
       |      ELSE 0.0 END AS stopword_ratio
       |  FROM u)
       |SELECT doc_id, 1.0 / (1.0 + exp(-($z))) AS quality FROM v""".stripMargin
  }

  /** C4-style corpus-level chunk dedup — SQL twin of [[ChunkDedup.dedupChunks]]:
    * the same map-side-combined count groupBy on md5 keys (not a window sort), the
    * same `min(struct)` first-occurrence tiebreak, the same in-order rebuild.
    */
  def chunkDedupSql(docsView: String, chunkWords: Int, maxOccurrences: Long = 1,
      idCol: String = "doc_id", textCol: String = "text"): String = {
    val kept = s"""g.corpus_count <= $maxOccurrences
       |      OR (g.first_occ.doc_id = ch.doc_id AND g.first_occ.chunk_id = ch.chunk_id)""".stripMargin
    s"""WITH ch AS (
       |  SELECT doc_id, pe.chunk_id, pe.chunk_text, md5(pe.chunk_text) AS h
       |  FROM (SELECT ${q(idCol)} AS doc_id,
       |          split(trim(${q(textCol)}), '\\\\s+') AS toks FROM $docsView)
       |  LATERAL VIEW posexplode(transform(
       |    sequence(0, (size(toks) - 1) div $chunkWords),
       |    i -> array_join(slice(toks, i * $chunkWords + 1, $chunkWords), ' ')))
       |    pe AS chunk_id, chunk_text
       |),
       |g AS (
       |  SELECT h, count(*) AS corpus_count,
       |    min(named_struct('doc_id', doc_id, 'chunk_id', chunk_id)) AS first_occ
       |  FROM ch GROUP BY h
       |)
       |SELECT ch.doc_id,
       |  array_join(transform(array_sort(collect_list(
       |    CASE WHEN $kept
       |      THEN named_struct('chunk_id', ch.chunk_id, 'chunk_text', ch.chunk_text)
       |    END)), x -> x.chunk_text), ' ') AS clean_text,
       |  count(*) AS n_chunks,
       |  sum(CASE WHEN $kept THEN 1 ELSE 0 END) AS n_kept
       |FROM ch JOIN g ON ch.h = g.h
       |GROUP BY ch.doc_id""".stripMargin
  }

  /** The sentence-segmentation boundary body, shared by [[sentencesSql]] and
    * [[sentenceDedupSql]] — the identical sentinel-insert + split formulation
    * of [[TextAnalysis.sentences]] (chr(1) sentinel because lookbehind does
    * not exist in the replayable regex subset).
    */
  private def sentenceUnitsCte(view: String, idCol: String,
      textCol: String): String = {
    // TextAnalysis.abbreviationMaskPattern as a SQL string literal
    val mask = TextAnalysis.abbreviationMaskPattern.replace("\\", "\\\\")
    s"""SELECT doc_id, pe.sentence_idx,
       |    trim(translate(pe.sentence, chr(2), '.')) AS sentence
       |  FROM (SELECT ${q(idCol)} AS doc_id,
       |          split(regexp_replace(regexp_replace(coalesce(${q(textCol)}, ''),
       |            '$mask', concat('$$1', chr(2))),
       |            '([.!?]+[\")\\\\]\\']*)[ \\\\t\\\\n\\\\f\\\\r]+',
       |            concat('$$1', chr(1))), chr(1)) AS arr
       |        FROM $view)
       |  LATERAL VIEW posexplode(arr) pe AS sentence_idx, sentence
       |  WHERE trim(pe.sentence) != ''""".stripMargin
  }

  /** Rule-based sentence segmentation — SQL twin of
    * [[TextAnalysis.sentences]]: same boundary rule, same pre-filter 0-based
    * indices, same trims.
    */
  def sentencesSql(docsView: String, idCol: String = "doc_id",
      textCol: String = "text"): String =
    s"""WITH s AS (
       |  ${sentenceUnitsCte(docsView, idCol, textCol)}
       |)
       |SELECT doc_id AS ${q(idCol)}, sentence_idx, sentence FROM s""".stripMargin

  /** Sentence-grain corpus dedup — SQL twin of [[ChunkDedup.dedupSentences]]:
    * the segmentation CTE feeds the same md5 count + first-occurrence rule and
    * ordered reassembly as [[chunkDedupSql]].
    */
  def sentenceDedupSql(docsView: String, maxOccurrences: Long = 1,
      idCol: String = "doc_id", textCol: String = "text"): String = {
    val kept = s"""g.corpus_count <= $maxOccurrences
       |      OR (g.first_occ.doc_id = s.doc_id AND g.first_occ.sentence_idx = s.sentence_idx)""".stripMargin
    s"""WITH s0 AS (
       |  ${sentenceUnitsCte(docsView, idCol, textCol)}
       |),
       |s AS (SELECT doc_id, sentence_idx, sentence, md5(sentence) AS h FROM s0),
       |g AS (
       |  SELECT h, count(*) AS corpus_count,
       |    min(named_struct('doc_id', doc_id, 'sentence_idx', sentence_idx))
       |      AS first_occ
       |  FROM s GROUP BY h
       |)
       |SELECT s.doc_id AS ${q(idCol)},
       |  array_join(transform(array_sort(collect_list(
       |    CASE WHEN $kept
       |      THEN named_struct('sentence_idx', s.sentence_idx, 'sentence', s.sentence)
       |    END)), x -> x.sentence), ' ') AS clean_text,
       |  count(*) AS n_sentences,
       |  sum(CASE WHEN $kept THEN 1 ELSE 0 END) AS n_kept
       |FROM s JOIN g ON s.h = g.h
       |GROUP BY s.doc_id""".stripMargin
  }

  /** Block-level HTML main-content extraction — SQL twin of
    * [[HtmlExtract.mainContent]]: the identical non-content drop, block
    * split, per-block text/link-density scoring (computed ONCE per block via
    * a materialized struct array — array HOFs are interpreted, so consumers
    * must read an attribute, not re-run the chain), keep rule, and ordered
    * reassembly. Output: `(idCol, main_text, n_blocks, n_kept)`.
    */
  def mainContentSql(view: String, idCol: String = "doc_id",
      htmlCol: String = "html", minWords: Int = 5,
      maxLinkDensity: Double = 0.33): String = {
    require(minWords >= 1, "minWords must be >= 1")
    // Spark-SQL rendering of HtmlExtract's entity-decode + tag-strip chain
    def blockText(x: String): String =
      "trim(regexp_replace(" +
        "regexp_replace(regexp_replace(regexp_replace(regexp_replace(" +
        "regexp_replace(regexp_replace(" +
        s"regexp_replace($x, '<[^>]*>', ' ')" +
        ", '&nbsp;', ' '), '&lt;', '<'), '&gt;', '>'), '&quot;', '\"')," +
        " '&#39;', \"'\"), '&amp;', '&')" +
        ", '[ \\\\t\\\\n\\\\f\\\\r]+', ' '))"
    val noAnchor = "regexp_replace(x, '(?is)<a[^>]*>.*?</a>', ' ')"
    val dropNonContent =
      "regexp_replace(regexp_replace(regexp_replace(regexp_replace(" +
        s"coalesce(${q(htmlCol)}, '')" +
        ", '(?is)<script[^>]*>.*?</script>', ' ')" +
        ", '(?is)<style[^>]*>.*?</style>', ' ')" +
        ", '(?is)<noscript[^>]*>.*?</noscript>', ' ')" +
        ", '(?s)<!--.*?-->', ' ')"
    val blockPat = HtmlExtract.blockTagPattern.replace("\\", "\\\\")
    val keep = "s.t != '' " +
      s"AND size(split(s.t, ' ')) >= $minWords " +
      "AND CAST(greatest(length(s.t) - length(s.tn), 0) AS DOUBLE)" +
      s" / greatest(length(s.t), 1) <= $maxLinkDensity"
    s"""WITH b AS (
       |  SELECT ${q(idCol)},
       |    transform(
       |      split(regexp_replace($dropNonContent, '$blockPat', chr(1)), chr(1)),
       |      x -> named_struct('t', ${blockText("x")},
       |        'tn', ${blockText(noAnchor)})) AS scored
       |  FROM $view)
       |SELECT ${q(idCol)},
       |  array_join(transform(filter(scored, s -> $keep), s -> s.t), ' ')
       |    AS main_text,
       |  size(filter(scored, s -> s.t != '')) AS n_blocks,
       |  size(filter(scored, s -> $keep)) AS n_kept
       |FROM b""".stripMargin
  }

  /** Run a recipe and register its result as a temp view — the `CREATE VIEW ... AS`
    * convenience for chaining recipes from SQL-first code.
    */
  def installView(spark: SparkSession, viewName: String, sql: String): DataFrame = {
    val df = spark.sql(sql)
    df.createOrReplaceTempView(viewName)
    df
  }
}
