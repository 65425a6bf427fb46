package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`).
  *
  * Two tiers:
  *  - [[cosineTopK]]: exact brute-force — broadcast the query set against the corpus.
  *    The corpus side streams (no shuffle); norms are precomputed BEFORE the join so the
  *    per-pair work is one fused dot product inside codegen'd higher-order functions.
  *    This is the correct baseline up to ~thousands of queries × any corpus size.
  *  - [[annTopK]]: LSH random-hyperplane ANN — each vector gets a P-bit signature from
  *    deterministic hyperplanes; candidate pairs are an EQUALITY join on the signature
  *    (bucket), so the all-pairs cross product never materializes. At 100 TB this is the
  *    scale path: bucket join shuffles on a 8-byte key, recall tunes with P and the
  *    number of probe tables.
  *
  * All arithmetic is double (floats widened first): cheap, and keeps results stable
  * under any partitioning.
  */
object Similarity {

  /** Widen array<float> to array<double>. */
  def toDoubleVec(c: Column): Column = transform(c, x => x.cast("double"))

  /** Left-to-right dot product of two double arrays — native codegen'd expression
    * ([[graft.functions.DotProduct]]); bit-identical to the HOF formulation below.
    */
  def dot(a: Column, b: Column): Column =
    graft.functions.DotProduct.dot_product(a, b)

  /** Interpreted higher-order-function dot product, kept as the cross-check reference
    * for the native expression.
    */
  private[graft] def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  def l2Norm(v: Column): Column = sqrt(dot(v, v))

  private def normed(embeddings: DataFrame, idCol: String, vecCol: String): DataFrame =
    embeddings.select(col(idCol).as("vec_id"), toDoubleVec(col(vecCol)).as("v"))
      .withColumn("norm", l2Norm(col("v")))

  /** Exact top-k cosine neighbors for each query vector (vec_id < numQueries), self
    * excluded. Cosine is rounded to 4 dp and ranking tie-breaks on neighbor id, making
    * the result set independent of float summation noise and partitioning.
    */
  def cosineTopK(
      embeddings: DataFrame, numQueries: Int = 10, k: Int = 5,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val base = normed(embeddings, idCol, vecCol)
    val queries = base.filter(col("vec_id") < numQueries)
      .select(col("vec_id").as("query_id"), col("v").as("qv"), col("norm").as("qnorm"))
    val sims = base.join(broadcast(queries), col("vec_id") =!= col("query_id"))
      .withColumn("cosine",
        round(dot(col("qv"), col("v")) / (col("qnorm") * col("norm")), 4))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("vec_id"))
    sims.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "vec_id", "cosine")
  }

  /** Hard-negative mining for contrastive training (the data-prep step behind
    * DPR/SimCSE-style retrieval and embedding fine-tuning): for each query
    * vector, the top-k MOST-similar vectors carrying a DIFFERENT label — "hard"
    * because they resemble the query yet must be pushed apart, which is where
    * contrastive gradients come from (random negatives are trivially separable).
    * Same plan shape as [[cosineTopK]]: queries broadcast, the corpus streams
    * through one codegen'd dot product per (query, candidate) with the label
    * inequality fused into the join condition, and the only wide op is the
    * per-query top-k window (numQueries partitions). The [[annTopK]] bucketing
    * composes in front of this for the 100 TB path — probe candidates first,
    * then label-filter + re-rank.
    */
  def hardNegatives(
      embeddings: DataFrame, numQueries: Int = 10, k: Int = 5,
      idCol: String = "vec_id", vecCol: String = "embedding",
      labelCol: String = "label"): DataFrame = {
    val base = embeddings.select(col(idCol).as("vec_id"),
        toDoubleVec(col(vecCol)).as("v"), col(labelCol).as("lbl"))
      .withColumn("norm", l2Norm(col("v")))
    val queries = base.filter(col("vec_id") < numQueries)
      .select(col("vec_id").as("query_id"), col("v").as("qv"),
        col("norm").as("qnorm"), col("lbl").as("qlbl"))
    val sims = base.join(broadcast(queries), col("lbl") =!= col("qlbl"))
      .withColumn("cosine",
        round(dot(col("qv"), col("v")) / (col("qnorm") * col("norm")), 4))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("vec_id"))
    sims.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "vec_id", "cosine")
  }

  /** Deterministic pseudo-random unit-free hyperplanes (fixed seed → reproducible runs
    * and cluster-order independence).
    */
  def hyperplanes(numPlanes: Int, dim: Int, seed: Long = 42L): Seq[Seq[Double]] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(numPlanes)(Seq.fill(dim)(rnd.nextGaussian()))
  }

  /** Add a P-bit LSH signature column (`sig`) from sign(dot(plane, v)). */
  def withSignature(
      embeddings: DataFrame, planes: Seq[Seq[Double]],
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val planesLit = typedLit(planes)
    val base = normed(embeddings, idCol, vecCol)
    val bits = transform(planesLit, p => dot(p, col("v")) >= 0)
    base.withColumn("sig",
      aggregate(bits, lit(0L),
        (acc, b) => acc * 2 + when(b, 1L).otherwise(0L)))
  }

  /** Add multi-table LSH signatures: `tables` independent signatures of `planesPerTable`
    * bits each, exploded to (vec_id, v, norm, table, sig) — one row per (vector, table).
    */
  def withTableSignatures(
      embeddings: DataFrame, tables: Int, planesPerTable: Int, dim: Int,
      idCol: String = "vec_id", vecCol: String = "embedding",
      seed: Long = 42L): DataFrame = {
    val base = normed(embeddings, idCol, vecCol)
    val sigStructs = (0 until tables).map { t =>
      val planesLit = typedLit(hyperplanes(planesPerTable, dim, seed + t))
      val bits = transform(planesLit, p => dot(p, col("v")) >= 0)
      struct(lit(t).as("table"),
        aggregate(bits, lit(0L), (acc, b) => acc * 2 + when(b, 1L).otherwise(0L))
          .as("sig"))
    }
    base.withColumn("ts", explode(array(sigStructs: _*)))
      .select(col("vec_id"), col("v"), col("norm"), col("ts.table"), col("ts.sig"))
  }

  /** ANN top-k via multi-table LSH: a candidate must share the full bucket with the
    * query in AT LEAST ONE of the tables (the classic LSH-forest recall amplification:
    * recall ≈ 1−(1−p^P)^T). Exact cosine re-ranks the candidate union. Recall < 1 by
    * construction — measured against [[cosineTopK]] in tests.
    */
  /** Embedding dimensionality: the caller's `dim` when given (> 0), else probed from
    * the data with one metadata-sized limit-1 action. LSH hyperplanes must cover
    * every dimension — a hard-coded dim would silently hash a prefix of wider
    * embeddings. Pass `dim` explicitly in per-query serving paths to avoid the probe
    * job per call; pipelines that know their schema always can.
    */
  private def resolveDim(embeddings: DataFrame, vecCol: String, dim: Int): Int =
    if (dim > 0) dim else embeddings.select(size(col(vecCol))).first().getInt(0)

  def annTopK(
      embeddings: DataFrame, numQueries: Int = 10, k: Int = 5,
      tables: Int = 16, planesPerTable: Int = 4,
      idCol: String = "vec_id", vecCol: String = "embedding",
      dim: Int = -1): DataFrame = {
    val dim0 = resolveDim(embeddings, vecCol, dim)
    // No cache: the query side's vec_id filter pushes below the signature explode, so
    // signatures are only recomputed for the numQueries query vectors — cheaper than
    // pinning the whole signed corpus in the storage pool (which at 100 TB cannot fit
    // and would leak blocks into any long-lived session).
    val signed = withTableSignatures(embeddings, tables, planesPerTable, dim0,
      idCol, vecCol)
    val queries = signed.filter(col("vec_id") < numQueries)
      .select(col("vec_id").as("query_id"), col("v").as("qv"),
        col("norm").as("qnorm"), col("table").as("qtable"), col("sig").as("qsig"))
    // compute cosine BEFORE deduplicating across tables: a duplicate candidate costs one
    // cheap native dot product, while deduplicating first would shuffle the full vector
    // payloads (~1 KB/row) instead of 24-byte scalar rows
    val candidates = signed.join(broadcast(queries),
        col("table") === col("qtable") && col("sig") === col("qsig") &&
          col("vec_id") =!= col("query_id"))
      .withColumn("cosine",
        round(dot(col("qv"), col("v")) / (col("qnorm") * col("norm")), 4))
      .select("query_id", "vec_id", "cosine")
      .dropDuplicates("query_id", "vec_id")
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("vec_id"))
    candidates.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "vec_id", "cosine")
  }

  /** Exact embedding near-duplicate pairs: every (a < b) pair with cosine ≥ threshold.
    * All-pairs — correct recall 1.0, quadratic in corpus size; the reference answer the
    * LSH variant below is measured against. Broadcasting the (id, vector, norm)
    * projection keeps the big side streaming with no shuffle.
    */
  def embeddingNearDuplicatesExact(
      embeddings: DataFrame, threshold: Double = 0.45,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val base = normed(embeddings, idCol, vecCol)
    val right = broadcast(base.select(col("vec_id").as("b_id"), col("v").as("bv"),
      col("norm").as("b_norm")))
    base.join(right, col("vec_id") < col("b_id"))
      .withColumn("cosine",
        round(dot(col("v"), col("bv")) / (col("norm") * col("b_norm")), 4))
      .filter(col("cosine") >= threshold)
      .select(col("vec_id").as("vec_a"), col("b_id").as("vec_b"), col("cosine"))
  }

  /** Embedding near-duplicate pairs, LSH-bucketed (the 100 TB scale path): a pair is a
    * candidate when it shares a full bucket in AT LEAST ONE of `tables` signature tables
    * (OR-amplification — a single long signature has vanishing recall at moderate
    * thresholds), then exact cosine ≥ threshold filters candidates. Approximate:
    * recall measured against [[embeddingNearDuplicatesExact]] in tests.
    */
  def embeddingNearDuplicates(
      embeddings: DataFrame, threshold: Double = 0.45,
      tables: Int = 8, planesPerTable: Int = 4,
      idCol: String = "vec_id", vecCol: String = "embedding",
      dim: Int = -1): DataFrame = {
    val dim0 = resolveDim(embeddings, vecCol, dim)
    // No cache: the self-join recomputes signatures on each side (T×P dot products per
    // vector — cheap next to the scan), instead of pinning the signed corpus in the
    // storage pool, which at 100 TB cannot fit and would leak blocks into a long-lived
    // session.
    val signed = withTableSignatures(embeddings, tables, planesPerTable, dim0,
      idCol, vecCol)
    val right = signed.select(col("vec_id").as("b_id"), col("v").as("bv"),
      col("norm").as("b_norm"), col("table").as("b_table"), col("sig").as("b_sig"))
    // Cosine BEFORE dropDuplicates: a cross-table duplicate candidate costs one extra
    // fused dot product, while deduplicating first would shuffle the full vector
    // payloads (~KB/row) instead of 24-byte scalar rows — mirrors [[annTopK]].
    signed.join(right,
        col("table") === col("b_table") && col("sig") === col("b_sig") &&
          col("vec_id") < col("b_id"))
      .withColumn("cosine",
        round(dot(col("v"), col("bv")) / (col("norm") * col("b_norm")), 4))
      .filter(col("cosine") >= threshold)
      .select(col("vec_id").as("vec_a"), col("b_id").as("vec_b"), col("cosine"))
      .dropDuplicates("vec_a", "vec_b")
  }

  /** Per-vector max-abs int8 scalar quantization — the simplest embedding
    * compression (4× over float32): `code_i = round(x_i · 127 / max|x|)`, one
    * double `scale` per vector. Pure per-row map in codegen, no shuffle; the
    * arithmetic is written in one fixed operation order so any engine replays the
    * identical doubles (and therefore identical roundings).
    *
    * Output: `(vec_id, scale, codes ARRAY<TINYINT>)`. All-zero vectors quantize to
    * all-zero codes with scale 0.
    */
  def quantizeInt8(df: DataFrame, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val staged = df.select(col(idCol).as("vec_id"),
      toDoubleVec(col(vecCol)).as("v"))
      .withColumn("scale",
        aggregate(col("v"), lit(0.0), (m, x) => greatest(m, abs(x))))
    staged.select(col("vec_id"), col("scale"),
      transform(col("v"), x =>
        when(col("scale") > 0, round(x * 127.0 / col("scale")))
          .otherwise(0.0).cast("tinyint")).as("codes"))
  }

  /** Inverse of [[quantizeInt8]]: `x̂_i = code_i · scale / 127`. */
  def dequantizeInt8(df: DataFrame): DataFrame =
    df.withColumn("v_approx",
      transform(col("codes"), c => c.cast("double") * col("scale") / 127.0))

  /** MATRYOSHKA truncation (MRL, Kusupati et al. 2022): keep the first `dim`
    * components of each embedding — MRL-trained models pack the coarsest
    * semantics into the prefix, so a 4–16× narrower prefix retrieves nearly
    * as well at a fraction of the scan/storage cost, which is the standard
    * cheap-first-pass tier of a funnel retrieval (truncated scan → full-dim
    * re-rank of the shortlist). `renormalize` rescales the prefix to unit L2
    * (what a dot-product index expects); pass `renormalize = false` when the
    * consumer normalizes anyway — e.g. [[cosineTopK]] — so the arithmetic
    * stays single-pass (and engine-replayable). Pure codegen map work, zero
    * shuffle; an all-zero prefix stays all-zero rather than dividing by 0.
    */
  def matryoshkaTruncate(df: DataFrame, dim: Int, renormalize: Boolean = true,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(dim > 0, s"matryoshka dim must be positive, got $dim")
    val sliced = slice(toDoubleVec(col(vecCol)), 1, dim)
    if (!renormalize) df.select(col(idCol).as("vec_id"), sliced.as("embedding"))
    else {
      // norm materializes once per row (own attribute), not once per element
      val staged = df.select(col(idCol).as("vec_id"), sliced.as("__v"))
        .withColumn("__n",
          sqrt(aggregate(col("__v"), lit(0.0), (acc, x) => acc + x * x)))
      staged.select(col("vec_id"),
        when(col("__n") > 0, transform(col("__v"), x => x / col("__n")))
          .otherwise(col("__v")).as("embedding"))
    }
  }

  /** FUNNEL retrieval — the operator [[matryoshkaTruncate]] exists to serve
    * (MRL, Kusupati et al. 2022 §4): a cheap COARSE pass ranks the corpus by
    * cosine over the first `coarseDim` components only (a `coarseDim/dim`-width
    * scan) and keeps a per-query shortlist of `shortlistK` candidates; a
    * RE-RANK pass then scores ONLY the shortlist with full-dimension cosine.
    * Approximate: recall against exact [[cosineTopK]] rises with `shortlistK`
    * and equals 1.0 when the shortlist covers the corpus — measured in tests.
    *
    * Scale shape: the coarse pass is [[cosineTopK]]'s broadcast-queries ×
    * one-pass scan over a `coarseDim`-wide projection; the shortlist
    * (numQueries × shortlistK id pairs) BROADCASTS back against the streaming
    * full-width scan, so the re-rank touches full vectors for shortlist rows
    * only and nothing shuffles but the final per-query top-k window.
    */
  def funnelTopK(embeddings: DataFrame, numQueries: Int = 10, k: Int = 5,
      coarseDim: Int = 16, shortlistK: Int = 20,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(shortlistK >= k, s"shortlistK ($shortlistK) must cover k ($k)")
    val shortlist = cosineTopK(
        matryoshkaTruncate(embeddings, coarseDim, renormalize = false,
          idCol, vecCol),
        numQueries, shortlistK)
      .select(col("query_id"), col("vec_id"))
    val base = normed(embeddings, idCol, vecCol)
    val queries = base.filter(col("vec_id") < numQueries)
      .select(col("vec_id").as("query_id"), col("v").as("qv"),
        col("norm").as("qnorm"))
    val rescored = base.join(broadcast(shortlist), Seq("vec_id"))
      .join(broadcast(queries), Seq("query_id"))
      .withColumn("cosine",
        round(dot(col("qv"), col("v")) / (col("qnorm") * col("norm")), 4))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("vec_id"))
    rescored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "vec_id", "cosine")
  }

  /** 1-bit BINARY quantization: each dimension's sign bit (x > 0), packed 32
    * dims per BIGINT word — 32 per word, not 64, so the place-value fold
    * stays far from signed-64 overflow and DuckDB's strict BIGINT arithmetic
    * replays the packing exactly. 32× compression vs float32; Hamming
    * distance over the codes approximates angular distance (Charikar's
    * hyperplane family with the coordinate axes as the planes — the
    * data-oblivious cousin of [[quantizeInt8]]'s magnitude-preserving codes).
    * Output: `(vec_id, code: array<bigint>)`, word w holding dims
    * [32w, 32w+31], bit b = dim 32w+b.
    */
  def binaryQuantize(df: DataFrame, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val v = toDoubleVec(col(vecCol))
    // guard the degenerate empty vector: sequence(0, -1) would DESCEND to
    // [0, -1] and emit two spurious words where the oracle's floor-division
    // range emits none (and hammingDist would then null-pad against real
    // codes) — an empty vector must yield an empty code
    val words = transform(
      sequence(lit(0), floor((size(v) - 1) / 32).cast("int")), w =>
      aggregate(
        slice(v, w * 32 + 1, lit(32)),
        struct(lit(0L).as("bits"), lit(1L).as("place")),
        (acc, x) => struct(
          (acc.getField("bits") +
            when(x > 0, acc.getField("place")).otherwise(lit(0L))).as("bits"),
          (acc.getField("place") * 2).as("place")),
        acc => acc.getField("bits")))
    val packed = when(size(v) > 0, words)
      .otherwise(array().cast("array<bigint>"))
    df.select(col(idCol).as("vec_id"), packed.as("code"))
  }

  /** Hamming distance between two packed code arrays (equal length). */
  private def hammingDist(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) =>
        call_function("bit_count", x.bitwiseXOR(y)).cast("long")),
      lit(0L), (acc, h) => acc + h)

  /** Persisted-codes lifecycle over [[graft.catalog.VersionedTable]] — the
    * [[Bm25.writeIndex]] / [[Ivf.writeIvfIndex]] incremental-maintenance
    * pattern applied to the binary-quantization tier, and the simplest of the
    * three: the quantizer is STATELESS (per-row sign bits, no centroids, no
    * corpus statistics), so appends are trivially O(batch) — each arriving
    * vector batch quantizes map-side and lands as an ordinary append; prior
    * codes and prior vectors are never rescanned, and there is nothing to
    * freeze or retrain. Only with a MATERIALIZED codes table does the
    * [[bqTopKFromCodes]] coarse pass actually read 32× fewer bytes — this
    * lifecycle is what turns the one-shot [[bqTopK]] proof into a serving
    * tier. No clustering on write: the Hamming coarse pass is a linear scan
    * of every code by design (that's the tier's contract — tiny codes, full
    * sweep), so there is no predicate to prune for and the narrow layout is
    * already optimal.
    *
    * Contract: batches carry NOVEL vec_ids (same ledger/novelty routing as
    * the other index lifecycles).
    */
  def writeCodes(embeddings: DataFrame, dir: String,
      idCol: String = "vec_id", vecCol: String = "embedding"): Unit = {
    graft.catalog.VersionedTable.write(
      quantizedBatch(embeddings, idCol, vecCol), dir, "overwrite")
    ()
  }

  /** Append one vector batch's codes: ONE map-side quantization pass over
    * the batch, then a batch-sized write.
    */
  def appendToCodes(batch: DataFrame, dir: String,
      idCol: String = "vec_id", vecCol: String = "embedding"): Unit = {
    graft.catalog.VersionedTable.write(
      quantizedBatch(batch, idCol, vecCol), dir, "append")
    ()
  }

  /** The batch's codes in the persisted layout. Element nullability is
    * pinned: parquet reads carry nullable array elements, in-memory builds
    * don't, and the versioned table rightly refuses an append that flips a
    * type's nullability. Shared by the batch paths and the streaming
    * maintainer ([[graft.streaming.BqIngest]]).
    */
  private[graft] def quantizedBatch(batch: DataFrame, idCol: String,
      vecCol: String): DataFrame = {
    val codeType = org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.LongType, containsNull = true)
    binaryQuantize(batch, idCol, vecCol)
      .select(col("vec_id"), col("code").cast(codeType).as("code"))
  }

  /** Load a persisted codes table for [[bqTopKFromCodes]]. */
  def readCodes(spark: org.apache.spark.sql.SparkSession, dir: String): DataFrame =
    graft.catalog.VersionedTable.read(spark, dir)

  /** Register the codes table as a PERMANENT catalog table over its
    * versioned-table location ([[graft.sources.table.GraftCatalog]]'s
    * external registration) so [[SqlRecipes.bqFromCodesSql]] serves LIVE —
    * the catalog entry re-resolves the commit log per query, so the same SQL
    * statement tracks appends with no re-registration. One table, so every
    * resolution is atomic by construction (the stateless tier needs no
    * manifest and has no rebuild caveat). Returns the fully-qualified name.
    */
  def registerCodesTable(spark: org.apache.spark.sql.SparkSession,
      dir: String, catalog: String, namespace: String,
      name: String = "bq_codes"): String = {
    val t = s"$catalog.$namespace.$name"
    spark.sql(s"DROP TABLE IF EXISTS $t")
    spark.sql(s"CREATE TABLE $t LOCATION '$dir'")
    t
  }

  /** One-shot convenience: quantize `embeddings` in-flight and funnel
    * through [[bqTopKFromCodes]]. Serving paths that answer repeated query
    * batches should MATERIALIZE the codes once ([[binaryQuantize]] →
    * parquet / versioned table) and call [[bqTopKFromCodes]] — only then
    * does the coarse pass actually read 32× fewer bytes; this in-flight
    * variant still scans the floats to pack them (it saves nothing on IO,
    * only proves the ranking).
    */
  def bqTopK(embeddings: DataFrame, numQueries: Int = 10, k: Int = 5,
      shortlistK: Int = 30,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    bqTopKFromCodes(binaryQuantize(embeddings, idCol, vecCol), embeddings,
      numQueries, k, shortlistK, idCol, vecCol)

  /** Binary-quantized ANN off a prebuilt CODES table ([[binaryQuantize]]
    * output, persisted): Hamming over the 1-bit codes shortlists
    * `shortlistK` candidates per query (vec_id < numQueries, self excluded),
    * then exact cosine re-ranks ONLY the shortlist — the [[funnelTopK]]
    * funnel with a 32×-compressed coarse pass instead of a prefix
    * projection. `shortlistK = corpus size − 1` provably equals brute force
    * (tested). Scale shape: the coarse pass reads 2 BIGINT words per vector
    * instead of 64 floats when the codes table is materialized (queries
    * broadcast, map-side Hamming, one per-query window); the shortlist
    * (numQueries × shortlistK id pairs) broadcasts back against the
    * streaming full-width scan, which touches full vectors for shortlist
    * rows only. Determinism: Hamming is exact-integer; ties break on vec_id
    * at the shortlist AND the final ranking; cosine rounds to 4 dp as in
    * every tier.
    */
  def bqTopKFromCodes(codes: DataFrame, embeddings: DataFrame,
      numQueries: Int = 10, k: Int = 5, shortlistK: Int = 30,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val qCodes = codes.filter(col("vec_id") < numQueries)
      .select(col("vec_id").as("query_id"), col("code").as("qcode"))
    val qVecs = normed(embeddings, idCol, vecCol)
      .filter(col("vec_id") < numQueries)
      .select(col("vec_id").as("query_id"), col("v").as("qv"),
        col("norm").as("qnorm"))
    bqServe(codes, embeddings, qCodes, qVecs, k, shortlistK,
      excludeSelf = true, idCol, vecCol)
  }

  /** Binary-quantized ANN for EXTERNAL query vectors — the realistic serving
    * shape for the codes tier, completing the external-query symmetry with
    * [[graft.ops.Ivf.ivfTopKForQueries]] and the hybrid overloads: the query
    * batch (`queryIdCol`, `queryVecCol`) sign-quantizes IN-FLIGHT (tiny — a
    * request batch) and broadcasts against the materialized codes sweep; the
    * exact rerank touches full-width vectors for shortlist rows only. Unlike
    * the index tiers there is no extraction scan to avoid here even
    * internally — the coarse pass IS a linear sweep of the codes — so the
    * external win is semantic: no self-exclusion (the id spaces are
    * unrelated), queries need not live in the corpus.
    */
  def bqTopKForQueries(codes: DataFrame, embeddings: DataFrame,
      queries: DataFrame, k: Int = 5, shortlistK: Int = 30,
      idCol: String = "vec_id", vecCol: String = "embedding",
      queryIdCol: String = "vec_id",
      queryVecCol: String = "embedding"): DataFrame = {
    val qCodes = binaryQuantize(queries, queryIdCol, queryVecCol)
      .select(col("vec_id").as("query_id"), col("code").as("qcode"))
    val qVecs = queries.select(col(queryIdCol).as("query_id"),
        toDoubleVec(col(queryVecCol)).as("qv"))
      .withColumn("qnorm", l2Norm(col("qv")))
    bqServe(codes, embeddings, qCodes, qVecs, k, shortlistK,
      excludeSelf = false, idCol, vecCol)
  }

  /** Shared BQ funnel body: broadcast query codes against the streaming codes
    * sweep (exact-integer Hamming, per-query shortlist window), then exact
    * cosine over shortlist rows only.
    */
  private def bqServe(codes: DataFrame, embeddings: DataFrame,
      qCodes: DataFrame, qVecs: DataFrame, k: Int, shortlistK: Int,
      excludeSelf: Boolean, idCol: String, vecCol: String): DataFrame = {
    require(shortlistK >= k, s"shortlistK ($shortlistK) must cover k ($k)")
    val noSelf =
      if (excludeSelf) col("vec_id") =!= col("query_id") else lit(true)
    val wShort = Window.partitionBy(col("query_id"))
      .orderBy(col("hamming"), col("vec_id"))
    val shortlist = codes.join(broadcast(qCodes), noSelf)
      .withColumn("hamming", hammingDist(col("qcode"), col("code")))
      .withColumn("srank", row_number().over(wShort))
      .filter(col("srank") <= shortlistK)
      .select(col("query_id"), col("vec_id"))
    val base = normed(embeddings, idCol, vecCol)
    val rescored = base.join(broadcast(shortlist), Seq("vec_id"))
      .join(broadcast(qVecs), Seq("query_id"))
      .withColumn("cosine",
        round(dot(col("qv"), col("v")) / (col("qnorm") * col("norm")), 4))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("vec_id"))
    rescored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "vec_id", "cosine")
  }

  /** Approximate cosine top-k over the int8 CODES table — search on the compressed
    * representation, raw floats never rescanned: cosine is scale-invariant, so the
    * per-vector scales cancel and the integer code dot product ranks directly.
    * Same shape as [[cosineTopK]] (broadcast queries, corpus streams) but the scan
    * is 4× narrower; 4 dp rounding + id tiebreak as in the other tiers.
    */
  def int8CosineTopK(codes: DataFrame, numQueries: Int = 10,
      k: Int = 5): DataFrame = {
    val base = codes.select(col("vec_id"),
      transform(col("codes"), _.cast("double")).as("cv"))
      .withColumn("cnorm", l2Norm(col("cv")))
    val queries = base.filter(col("vec_id") < numQueries)
      .select(col("vec_id").as("query_id"), col("cv").as("qv"),
        col("cnorm").as("qnorm"))
    val pairs = base.crossJoin(broadcast(queries))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("cosine",
        round(dot(col("cv"), col("qv")) / (col("cnorm") * col("qnorm")), 4))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("vec_id"))
    pairs.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "vec_id", "cosine")
  }
}
