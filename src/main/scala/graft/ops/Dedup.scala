package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication family for training-data pipelines: exact, n-gram Jaccard, MinHash+LSH,
  * SimHash.
  *
  * Spark-first notes, per operator:
  *  - exact: one hash-groupBy shuffle keyed on the content hash — at 100 TB hash the
  *    CONTENT (md5), never groupBy the raw text (shuffle keys stay 16 bytes).
  *  - n-gram Jaccard: the shingle explode + self-join-on-shingle pattern; shuffle volume
  *    is Σ|shingles|, and the `maxShingleDf` stop-shingle cap bounds the worst-case
  *    quadratic join fan-out from boilerplate shingles (the standard trick at scale).
  *  - MinHash: signatures in ONE pass (explode shingles → groupBy doc → k min-aggs);
  *    banding turns all-pairs into equality joins on (band, band_hash) — only candidate
  *    pairs are ever verified. k and bands tune the jaccard-recall curve.
  *  - SimHash: 64-bit signature per doc; near-pair search uses the pigeonhole banding on
  *    16-bit chunks (hamming ≤ 3 ⟹ at least one of 4 chunks equal), so again only
  *    equality-join candidates get a full hamming check (`bit_count(xor)`).
  */
object Dedup {

  /** Exact duplicate groups keyed by content hash. */
  def exactGroups(df: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    df.groupBy(md5(col(textCol)).as("fingerprint"))
      .agg(
        min(col(idCol)).as("canonical_doc_id"),
        count(lit(1)).as("n_copies"))

  /** Drop exact duplicates, keeping the lowest id per content hash. */
  def exactDedup(df: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val w = Window.partitionBy(md5(col(textCol))).orderBy(col(idCol))
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }

  /** Priority-aware exact dedup: keep the BEST copy of each duplicated content,
    * not an arbitrary one — the cross-source rule curation pipelines apply when
    * the same document arrives from multiple crawls/sources of differing trust
    * (e.g. curated dump beats CommonCrawl beats scrape). `priorityCol` ranks
    * candidates ascending (lower wins); `tieCol` breaks ties deterministically.
    *
    * Plan shape: ONE hash aggregation on the 16-byte content md5 using
    * `min_by(struct(all columns), struct(priority, tie))` — map-side combine
    * keeps one winner per key per task, so a content duplicated a million times
    * shuffles one partial row per map task, where the window formulation
    * (row_number over a sort) would shuffle and SORT every copy. At 100 TB this
    * is the difference between an agg and a quadrillion-row sort.
    */
  def dedupByPriority(df: DataFrame, priorityCol: String,
      tieCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val cols = df.columns.toSeq
    df.groupBy(md5(col(textCol)).as("__fp"))
      .agg(min_by(struct(cols.map(col): _*),
        struct(col(priorityCol), col(tieCol))).as("__w"))
      .select(cols.map(c => col(s"__w.$c")): _*)
  }

  /** Distinct word n-gram shingles per document: (doc_id, shingle). Native kernel
    * ([[graft.functions.WordShingles]]); docs shorter than n yield no rows.
    */
  def shingles(df: DataFrame, idCol: String = "doc_id", textCol: String = "text",
      n: Int = 3): DataFrame =
    df.select(col(idCol).as("doc_id"),
      explode(graft.functions.WordShingles.word_shingles(col(textCol), n))
        .as("shingle"))

  /** Interpreted HOF shingle formulation, kept as the cross-check reference for the
    * native kernel.
    */
  private[graft] def shinglesHof(df: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", n: Int = 3): DataFrame = {
    val toks = TextAnalysis.tokens(col(textCol))
    // guard: sequence(1, 0) would generate a DESCENDING [1, 0] in Spark
    val sh = when(size(toks) >= n,
      transform(
        sequence(lit(1), size(toks) - (n - 1)),
        i => concat_ws(" ", slice(toks, i, lit(n)))))
      .otherwise(array())
    df.select(col(idCol).as("doc_id"), explode(array_distinct(sh)).as("shingle"))
  }

  /** The shingle stream that actually SHUFFLES. Production (`hashShingles = true`)
    * replaces each raw n-gram string with its xxhash64 — shuffle rows shrink from
    * (long, ~15-30 byte string) to (long, long), typically 2-3× less shuffle volume
    * on the hottest exchange of every near-dup pipeline. Set sizes and co-occurrence
    * counts are preserved modulo 64-bit collisions: at 10^12 distinct shingles the
    * expected colliding PAIRS are ~3·10^4 corpus-wide, shifting a Jaccard score by
    * at most ~1/|set| — noise far below the banding approximation already accepted.
    * Contract/oracle paths pass `false` so DuckDB can replay raw strings exactly.
    */
  private def shingleStream(df: DataFrame, idCol: String, textCol: String, n: Int,
      hashShingles: Boolean): DataFrame = {
    val raw = shingles(df, idCol, textCol, n)
    if (hashShingles) raw.select(col("doc_id"), xxhash64(col("shingle")).as("shingle"))
    else raw
  }

  /** All pairs (a < b) with n-gram Jaccard similarity ≥ threshold.
    *
    * `maxShingleDf` drops shingles occurring in more than that many documents before the
    * self-join (stop-shingle cap). Exact for pairs whose similarity is carried by
    * non-stop shingles; essential to bound join fan-out at scale.
    */
  def ngramJaccardPairs(
      df: DataFrame, idCol: String = "doc_id", textCol: String = "text",
      n: Int = 3, threshold: Double = 0.5, maxShingleDf: Int = 1000,
      hashShingles: Boolean = true): DataFrame = {
    // sh is consumed twice (sizes + pairs) but deliberately NOT cached: the native
    // shingle kernel recomputes at scan speed, which measures no slower than a cache
    // materialization pass and leaves no storage-pool blocks behind
    val sh = shingleStream(df, idCol, textCol, n, hashShingles)
    // per-doc sizes come straight off the shingle array — map-side, no explode/groupBy
    // shuffle. Sizes scale with the corpus, so no broadcast hint: AQE converts the final
    // joins to broadcast at runtime when they fit
    val sizes = df.select(col(idCol).as("doc_id"),
      size(graft.functions.WordShingles.word_shingles(col(textCol), n)).as("n_shingles"))
    val pairs = coOccurrencePairs(sh, maxShingleDf)
    pairs
      .join(sizes.withColumnRenamed("doc_id", "doc_a")
        .withColumnRenamed("n_shingles", "size_a"), Seq("doc_a"))
      .join(sizes.withColumnRenamed("doc_id", "doc_b")
        .withColumnRenamed("n_shingles", "size_b"), Seq("doc_b"))
      .withColumn("jaccard",
        col("n_common").cast("double") /
          (col("size_a") + col("size_b") - col("n_common")))
      .filter(col("jaccard") >= threshold)
      .select("doc_a", "doc_b", "n_common", "size_a", "size_b", "jaccard")
  }

  /** Ordered co-occurrence pair counts via ONE groupBy(shingle): collect each shingle's
    * (sorted, df-capped) doc list and emit its ordered pairs inline. A single shuffle of
    * the shingle stream replaces the self-join's two, and the df cap bounds per-group
    * fan-out at maxShingleDf² — which is why the cap is mandatory in this formulation.
    * Pair semantics are identical to the x.shingle = y.shingle ∧ x.doc < y.doc self-join.
    */
  private def coOccurrencePairs(sh: DataFrame, maxShingleDf: Int): DataFrame = {
    val grouped = sh.groupBy("shingle")
      .agg(array_sort(collect_list(col("doc_id"))).as("docs"))
      .filter(size(col("docs")) <= maxShingleDf)
    val pairArray = flatten(transform(col("docs"), (a, i) =>
      transform(
        slice(col("docs"), i + 2, greatest(size(col("docs")) - i - 1, lit(0))),
        b => struct(a.as("doc_a"), b.as("doc_b")))))
    grouped
      .select(explode(pairArray).as("p"))
      .groupBy(col("p.doc_a").as("doc_a"), col("p.doc_b").as("doc_b"))
      .agg(count(lit(1)).as("n_common"))
  }

  /** Production per-seed shingle hash: xxhash64 seeded by the hash index. */
  val xxHashFn: (Int, Column) => Column = (s, c) => xxhash64(lit(s), c)

  /** Oracle-replicable per-seed shingle hash: md5 of "seed:shingle" as a hex string
    * (min over hex strings is plain lexicographic order — identical in any engine that
    * has md5, which is how the DuckDB gate can replay the full banding pipeline).
    */
  val md5HashFn: (Int, Column) => Column = (s, c) => md5(concat(lit(s"$s:"), c))

  /** Production band fingerprint: xxhash64 over the band's signature columns. */
  val xxBandHash: Seq[Column] => Column = cs => xxhash64(cs: _*)

  /** Oracle-replicable band fingerprint: the band's signature columns joined with '|'. */
  val md5BandHash: Seq[Column] => Column = cs => concat_ws("|", cs: _*)

  /** MinHash signatures: k independent min-hashes of the shingle set, one pass.
    * Output: doc_id, h0..h{k-1}. `hashFn` picks the per-seed hash family
    * ([[xxHashFn]] production, [[md5HashFn]] oracle-replicable).
    */
  def minHashSignatures(
      df: DataFrame, idCol: String = "doc_id", textCol: String = "text",
      n: Int = 3, numHashes: Int = 32,
      hashFn: (Int, Column) => Column = xxHashFn): DataFrame = {
    val sh = shingles(df, idCol, textCol, n)
    val aggs = (0 until numHashes).map(s =>
      min(hashFn(s, col("shingle"))).as(s"h$s"))
    sh.groupBy("doc_id").agg(aggs.head, aggs.tail: _*)
  }

  /** LSH candidate pairs from banded signatures: docs agreeing on ALL rows of at least
    * one band. bands must divide numHashes.
    */
  /** (doc_id, band, band_hash) rows from a signature frame — the LSH bucket keys.
    * Shared by the self-join candidate path and the incremental new-vs-index path.
    */
  private[graft] def bandedSignatures(signatures: DataFrame, numHashes: Int, bands: Int,
      bandHash: Seq[Column] => Column): DataFrame = {
    require(numHashes % bands == 0, s"bands=$bands must divide numHashes=$numHashes")
    val rowsPerBand = numHashes / bands
    val bandHashes = (0 until bands).map { b =>
      val cols = (b * rowsPerBand until (b + 1) * rowsPerBand).map(i => col(s"h$i"))
      struct(lit(b).as("band"), bandHash(cols).as("band_hash"))
    }
    signatures
      .select(col("doc_id"), explode(array(bandHashes: _*)).as("bh"))
      .select(col("doc_id"), col("bh.band"), col("bh.band_hash"))
  }

  def lshCandidates(signatures: DataFrame, numHashes: Int = 32, bands: Int = 8,
      bandHash: Seq[Column] => Column = xxBandHash): DataFrame = {
    // No cache: the self-join's two sides canonicalize to the same shuffle, so Spark's
    // ReuseExchange runs the upstream signature aggregate ONCE and replays the exchange
    // for the other side — same work as a cache, zero storage-pool residue (a .cache()
    // here leaked blocks into long-lived sessions and cannot fit at 100 TB anyway).
    val exploded = bandedSignatures(signatures, numHashes, bands, bandHash)
    exploded.as("x")
      .join(exploded.as("y"),
        col("x.band") === col("y.band") &&
          col("x.band_hash") === col("y.band_hash") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()
  }

  /** Full MinHash+LSH near-duplicate detection: candidates from banding, then EXACT
    * Jaccard verification restricted to candidate pairs.
    */
  def minhashNearDuplicates(
      df: DataFrame, idCol: String = "doc_id", textCol: String = "text",
      n: Int = 3, numHashes: Int = 32, bands: Int = 8,
      threshold: Double = 0.5,
      hashFn: (Int, Column) => Column = xxHashFn,
      bandHash: Seq[Column] => Column = xxBandHash,
      maxShingleDf: Int = 1000,
      hashShingles: Boolean = true): DataFrame = {
    // the verify join below shuffles the shingle stream twice (df cap + common
    // count) — hashed keys cut that volume exactly as in [[ngramJaccardPairs]]
    val sh = shingleStream(df, idCol, textCol, n, hashShingles)
    // map-side count off the shingle array — same rewrite as [[ngramJaccardPairs]]
    val sizes = df.select(col(idCol).as("doc_id"),
      size(graft.functions.WordShingles.word_shingles(col(textCol), n)).as("n_shingles"))
    val candidates = lshCandidates(
      minHashSignatures(df, idCol, textCol, n, numHashes, hashFn), numHashes, bands,
      bandHash)
    // the common-shingle verify join gets the same stop-shingle df cap as
    // [[ngramJaccardPairs]]: it bounds the join fan-out of boilerplate shingles AND
    // keeps the scoring identical to the capped DuckDB oracle at any corpus size
    // (sizes stay uncapped — they are the pair's true shingle-set sizes)
    val kept = sh.join(
      sh.groupBy("shingle").agg(count(lit(1)).as("df"))
        .filter(col("df") <= maxShingleDf).select("shingle"),
      Seq("shingle"))
    val common = candidates
      .join(kept.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("shingle", "sa"),
        Seq("doc_a"))
      .join(kept.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("shingle", "sb"),
        Seq("doc_b"))
      .filter(col("sa") === col("sb"))
      .groupBy("doc_a", "doc_b")
      .agg(count(lit(1)).as("n_common"))
    common
      .join(sizes.withColumnRenamed("doc_id", "doc_a")
        .withColumnRenamed("n_shingles", "size_a"), Seq("doc_a"))
      .join(sizes.withColumnRenamed("doc_id", "doc_b")
        .withColumnRenamed("n_shingles", "size_b"), Seq("doc_b"))
      .withColumn("jaccard",
        col("n_common").cast("double") /
          (col("size_a") + col("size_b") - col("n_common")))
      .filter(col("jaccard") >= threshold)
      .select("doc_a", "doc_b", "jaccard")
  }

  /** Cross-corpus contamination sweep: for every (corpus, reference) document pair
    * sharing word n-gram shingles, the CONTAINMENT score n_common / |reference shingles|
    * — the standard benchmark-contamination metric (what fraction of the benchmark doc's
    * n-grams appear in the training doc; Jaccard would under-score a benchmark embedded
    * inside a long document).
    *
    * Scale shape: the reference set (benchmarks/blocklists) is small by definition, so
    * its shingle stream BROADCASTS — the corpus side streams through a map-side hash
    * join and only (corpus_doc, ref_doc) pair counts shuffle. The `maxShingleDf` cap
    * drops corpus boilerplate shingles before the join, as in [[ngramJaccardPairs]].
    */
  def contamination(
      corpus: DataFrame, reference: DataFrame,
      idCol: String = "doc_id", textCol: String = "text",
      n: Int = 3, threshold: Double = 0.5, maxShingleDf: Int = 1000,
      hashShingles: Boolean = true): DataFrame = {
    val shC = shingleStream(corpus, idCol, textCol, n, hashShingles)
    val keptShingles = shC.groupBy("shingle")
      .agg(count(lit(1)).as("df")).filter(col("df") <= maxShingleDf)
      .select("shingle")
    val kept = shC.join(keptShingles, Seq("shingle"))
    val shR = shingleStream(reference, idCol, textCol, n, hashShingles)
      .withColumnRenamed("doc_id", "ref_doc")
    // map-side count off the shingle array — no groupBy shuffle of the reference stream
    val refSizes = reference.select(col(idCol).as("ref_doc"),
      size(graft.functions.WordShingles.word_shingles(col(textCol), n)).as("ref_shingles"))
    val common = kept.join(broadcast(shR), Seq("shingle"))
      .groupBy(col("doc_id"), col("ref_doc"))
      .agg(count(lit(1)).as("n_common"))
      .withColumnRenamed("doc_id", "corpus_doc")
    common.join(broadcast(refSizes), Seq("ref_doc"))
      .withColumn("containment",
        col("n_common").cast("double") / col("ref_shingles"))
      .filter(col("containment") >= threshold)
      .select("corpus_doc", "ref_doc", "n_common", "ref_shingles", "containment")
  }

  /** 64-bit SimHash per document — single-pass native expression
    * ([[graft.functions.SimHash64]]): scan-speed map work, no explode/shuffle.
    */
  def simHash(df: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    df.select(col(idCol).as("doc_id"),
      graft.functions.SimHash64.simhash64(col(textCol)).as("simhash"))

  /** Shuffle-based SimHash (explode + 64 bit-sum aggregates), kept as the cross-check
    * reference for the native expression.
    */
  private[graft] def simHashViaExplode(
      df: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val tok = df.select(col(idCol).as("doc_id"),
      explode(TextAnalysis.tokens(col(textCol))).as("token"))
      .withColumn("th", xxhash64(col("token")))
    val bitSums = (0 until 64).map { b =>
      sum(when(shiftright(col("th"), b).bitwiseAND(1) === 1, 1).otherwise(-1)).as(s"b$b")
    }
    val summed = tok.groupBy("doc_id").agg(bitSums.head, bitSums.tail: _*)
    val sig = (0 until 64).map { b =>
      when(col(s"b$b") > 0, shiftleft(lit(1L), b)).otherwise(0L)
    }.reduce(_ + _)
    summed.select(col("doc_id"), sig.as("simhash"))
  }

  /** Oracle-replicable 60-bit SimHash: token hash = first 15 hex chars of md5(token)
    * parsed base-16 (a 60-bit value both Spark's `conv` and DuckDB hex arithmetic can
    * produce identically), then the standard per-bit ±1 sums. Production stays on the
    * native 64-bit [[simHash]] kernel; this variant exists so the DuckDB gate can replay
    * the signature end-to-end. [[simHashNearPairs]] works unchanged on its output: the
    * 4×16-bit pigeonhole chunks cover bits 0–63 ⊇ 0–59, so hamming ≤ 3 still guarantees
    * an equal chunk.
    */
  def simHashMd5(df: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val tok = df.select(col(idCol).as("doc_id"),
      explode(TextAnalysis.tokens(col(textCol))).as("token"))
      .withColumn("th", conv(substring(md5(col("token")), 1, 15), 16, 10).cast("long"))
    val bitSums = (0 until 60).map { b =>
      sum(when(shiftright(col("th"), b).bitwiseAND(1) === 1, 1).otherwise(-1)).as(s"b$b")
    }
    val summed = tok.groupBy("doc_id").agg(bitSums.head, bitSums.tail: _*)
    val sig = (0 until 60).map { b =>
      when(col(s"b$b") > 0, shiftleft(lit(1L), b)).otherwise(0L)
    }.reduce(_ + _)
    summed.select(col("doc_id"), sig.as("simhash"))
  }

  /** Exact duplicated-substring spans (the dedup tier of Lee et al. 2021,
    * "Deduplicating Training Data Makes Language Models Better"): every maximal
    * token range covered by L-token windows that occur MORE THAN ONCE corpus-wide.
    * Training pipelines cut these spans (boilerplate, licenses, templated headers)
    * out of documents rather than dropping whole near-duplicate docs.
    *
    * Sliding L-token windows fingerprint as md5 of the joined tokens (16-byte keys,
    * engine-replayable); a window is "duplicated" when its fingerprint's TOTAL
    * occurrence count (across and within documents) is ≥ 2; adjacent/overlapping
    * duplicated windows merge per document into maximal spans (gaps-and-islands:
    * a new island starts when the next duplicated position is > L tokens on).
    *
    * Output: `(doc_id, start_token, end_token, n_dup_windows)` — 0-based inclusive
    * token offsets.
    *
    * Scale shapes: windows build map-side from each row's own materialized token
    * array; the fingerprint count shuffles (fp, partial count) rows; the dup-mark
    * join reuses the same fingerprint key; span merging shuffles once on doc_id.
    * A suffix-array formulation finds arbitrary-length duplicates but needs a
    * global sort of every suffix — the fixed-L window trade (duplicates shorter
    * than L are invisible; longer ones appear as merged spans) is what makes this
    * a linear, shuffle-bounded pipeline at 100 TB.
    */
  def duplicatedSpans(df: DataFrame, windowTokens: Int = 8,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(windowTokens >= 2, s"windowTokens must be >= 2, got $windowTokens")
    val l = windowTokens
    // materialize the token array before any lambda (HOF lambdas re-run a captured
    // split() per element)
    val staged = df.select(col(idCol).as("doc_id"),
      TextAnalysis.tokens(lower(col(textCol))).as("tk"))
    val starts = when(size(col("tk")) >= l,
      sequence(lit(0), size(col("tk")) - l)).otherwise(array().cast("array<int>"))
    val wins = staged
      .select(col("doc_id"), col("tk"), explode(starts).as("pos"))
      .select(col("doc_id"), col("pos"),
        md5(concat_ws(" ", slice(col("tk"), col("pos") + 1, lit(l)))).as("fp"))
    val dupFps = wins.groupBy("fp").agg(count(lit(1)).as("occ"))
      .filter(col("occ") >= 2)
      .select("fp")
    val marked = wins.join(dupFps, Seq("fp"), "left_semi")
    val wDoc = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val islands = marked
      .withColumn("brk",
        when(col("pos") - lag(col("pos"), 1).over(wDoc) > l, 1).otherwise(0))
      .withColumn("island",
        sum(col("brk")).over(wDoc.rowsBetween(Window.unboundedPreceding, 0)))
    islands.groupBy(col("doc_id"), col("island"))
      .agg(min(col("pos")).as("start_token"),
        (max(col("pos")) + l - 1).as("end_token"),
        count(lit(1)).as("n_dup_windows"))
      .drop("island")
      .select("doc_id", "start_token", "end_token", "n_dup_windows")
  }

  /** Apply [[duplicatedSpans]] (or any span table) surgically: rebuild each
    * document's text WITHOUT the tokens covered by its spans, instead of dropping
    * whole documents. Output keeps every row with the rebuilt `textCol` and an
    * `n_tokens_removed` audit column; rebuilt text is single-space joined
    * (whitespace runs do not survive — fingerprints upstream already treat them
    * as one separator).
    *
    * Span positions index the WHITESPACE token array of the original text (the
    * same boundaries [[duplicatedSpans]] fingerprinted — lowercasing never changes
    * token positions). Spans aggregate per doc (small lists) and join back on the
    * id; the cut itself is per-row HOF work over materialized arrays.
    */
  def cutSpans(df: DataFrame, spans: DataFrame,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val sp = spans.groupBy(col("doc_id").as("__sid"))
      .agg(collect_list(struct(col("start_token").as("st"),
        col("end_token").as("en"))).as("__sps"))
    val staged = df.join(sp, col(idCol) === col("__sid"), "left")
      .drop("__sid")
      .withColumn("__sps",
        coalesce(col("__sps"),
          array().cast("array<struct<st:int,en:int>>")))
      .withColumn("__tk", TextAnalysis.tokens(col(textCol)))
    val kept = filter(sequence(lit(0), size(col("__tk")) - 1),
      i => !exists(col("__sps"), x =>
        i >= x.getField("st") && i <= x.getField("en")))
    staged
      .withColumn("__kept", kept)
      .withColumn(textCol,
        concat_ws(" ", transform(col("__kept"), i => element_at(col("__tk"), i + 1))))
      .withColumn("n_tokens_removed",
        (size(col("__tk")) - size(col("__kept"))).cast("int"))
      .drop("__sps", "__tk", "__kept")
  }

  /** The full Lee-et-al-style substring dedup: detect duplicated spans, cut them
    * from every document. (Keep-one-copy policies pass a filtered span table to
    * [[cutSpans]] instead.)
    */
  def dedupSubstrings(df: DataFrame, windowTokens: Int = 8,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    cutSpans(df, duplicatedSpans(df, windowTokens, idCol, textCol), idCol, textCol)

  /** Near pairs by SimHash: pigeonhole banding on 4×16-bit chunks, then exact hamming
    * check `bit_count(a XOR b) <= maxHamming` (sound for maxHamming ≤ 3).
    */
  def simHashNearPairs(sim: DataFrame, maxHamming: Int = 3): DataFrame = {
    require(maxHamming <= 3, "4-chunk banding is only complete for hamming <= 3")
    val chunks = (0 until 4).map { i =>
      struct(lit(i).as("chunk"),
        shiftright(col("simhash"), i * 16).bitwiseAND(0xffffL).as("chunk_val"))
    }
    val exploded = sim
      .select(col("doc_id"), col("simhash"), explode(array(chunks: _*)).as("c"))
      .select(col("doc_id"), col("simhash"), col("c.chunk"), col("c.chunk_val"))
    exploded.as("x")
      .join(exploded.as("y"),
        col("x.chunk") === col("y.chunk") &&
          col("x.chunk_val") === col("y.chunk_val") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
        bit_count(col("x.simhash").bitwiseXOR(col("y.simhash"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }
}
