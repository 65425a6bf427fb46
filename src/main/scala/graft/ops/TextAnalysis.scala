package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines: token counting,
  * quality scoring, stopword-profile language ID, fingerprinting.
  *
  * Spark-first notes: everything here is built from `org.apache.spark.sql.functions`
  * higher-order and regex functions — per-row, no shuffle, fully parallel, and inside
  * whole-stage codegen. At 100 TB these run at scan speed; the only care needed is
  * regex cost (all patterns below are single-pass, no backtracking blowups).
  */
object TextAnalysis {

  /** Whitespace tokens of trimmed text. */
  def tokens(c: Column): Column = split(trim(c), "\\s+")

  /** Canonical text normalization — run BEFORE any fingerprint/dedup pass so byte
    * hashes see one encoding of the same human text: Unicode NFC (native
    * [[graft.functions.NfcNormalize]]), control characters stripped, whitespace
    * runs collapsed to one space, ends trimmed, lowercased. Pure per-row map work
    * in whole-stage codegen; every step is engine-replayable (explicit byte-range
    * control class, not a library-specific \\p alias).
    */
  def normalizeText(c: Column): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    val nfc = ColumnBridge.column(
      graft.functions.NfcNormalize(ColumnBridge.expression(c)))
    // NON-whitespace controls strip first (whitespace controls \t\n\x0B\f\r must
    // reach the collapse step as separators, not vanish and glue words); the
    // whitespace class is explicit because Java's \s includes \x0B and RE2's does
    // not — an alias here would silently diverge between engine and oracle
    lower(trim(regexp_replace(
      regexp_replace(nfc, "[\\x00-\\x08\\x0E-\\x1F\\x7F]", ""),
      "[ \\t\\n\\x0B\\f\\r]+", " ")))
  }

  /** Adjacent token-pair frequencies — the counting step of one BPE/WordPiece merge
    * iteration ("which two adjacent units co-occur most?") and the bigram feed for
    * collocation mining. Pairs are generated map-side from each row's token array
    * (no self-join of an exploded token table, which would shuffle every token
    * twice and break adjacency); only (pair, partial count) rows reach the one
    * combine shuffle. Top-k consumers cut with TakeOrderedAndProject.
    */
  def tokenPairCounts(df: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    // materialize the token array as an attribute BEFORE the lambda touches it: a
    // lambda capturing the split() expression re-runs the regex split per element
    val withTk = df.select(tokens(lower(col(textCol))).as("tk"))
    val tk = col("tk")
    val pairs = when(size(tk) >= 2,
      transform(sequence(lit(1), size(tk) - 1),
        i => concat_ws(" ", element_at(tk, i), element_at(tk, i + 1))))
      .otherwise(array())
    withTk.select(explode(pairs).as("pair"))
      .groupBy("pair")
      .agg(count(lit(1)).as("n"))
  }

  /** BPE-ish segmentation: word pieces plus isolated punctuation. */
  def bpeishTokens(c: Column): Column =
    regexp_extract_all(c, lit("\\w+|[^\\w\\s]"), lit(0))

  /** Rule-based SENTENCE segmentation — the boundary primitive under
    * sentence-level dedup (C4 dedups three-sentence spans), citation-grain
    * attribution, and sentence-aware chunking. A boundary is a terminator run
    * `[.!?]+` (plus any closing quotes/brackets riding it) followed by
    * whitespace; the terminator stays WITH its sentence. Deliberately
    * rule-based, not a learned segmenter: the rule is engine-replayable
    * byte-for-byte (the pattern stays in the RE2 ∩ Java subset, no
    * lookaround — a sentinel insert + split, since lookbehind doesn't exist
    * in RE2), deterministic, and linear scan-speed work in codegen.
    *
    * A fixed common-abbreviation list ([[abbreviations]]) is protected by an
    * RE2-safe pre-mask: each abbreviation's trailing period becomes a
    * sentinel before boundary marking and is restored in the output, so
    * "Dr. Smith" and "e.g. this" stay one sentence. The list is closed and
    * case-literal by design — oracle-replayable, no locale model; an
    * abbreviation that legitimately ends a sentence ("... et al.") is the
    * residual documented trade.
    *
    * Output: one row per non-empty sentence — `(id, sentence_idx, sentence)`,
    * `sentence_idx` = the sentence's 0-based position in the pre-filter
    * split (gaps where empty segments were dropped), sentences trimmed.
    * Zero shuffle; order is carried by the index, so downstream repartitions
    * freely.
    */
  def sentences(df: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val masked = regexp_replace(coalesce(col(textCol), lit("")),
      abbreviationMaskPattern, "$1\u0002")
    val marked = regexp_replace(masked,
      "([.!?]+[\")\\]']*)[ \\t\\n\\f\\r]+", "$1\u0001")
    df.select(col(idCol),
        posexplode(split(marked, "\u0001")).as(Seq("sentence_idx", "sentence")))
      .filter(trim(col("sentence")) =!= "")
      .select(col(idCol), col("sentence_idx"),
        trim(translate(col("sentence"), "\u0002", ".")).as("sentence"))
  }

  /** The protected abbreviations (longest-first so the alternation behaves
    * identically under Java backtracking and RE2's simultaneous simulation);
    * `e\.g`/`i\.e` carry their internal periods as literals — only the
    * TRAILING period masks.
    */
  val abbreviations: Seq[String] =
    Seq("Prof", "Mrs", "Mr", "Ms", "Dr", "St", "Jr", "Sr",
      "vs", "cf", "e\\.g", "i\\.e")

  /** RE2 ∩ Java mask pattern: abbreviation at a word boundary with its
    * trailing period — replaced by `$1` + U+0002 before boundary marking,
    * restored to a period in the output.
    */
  val abbreviationMaskPattern: String =
    s"\\b(${abbreviations.mkString("|")})\\."

  /** Per-document CHARACTER Shannon entropy — the compression-style quality
    * signal (low entropy = repetitive machine junk, keyboard mashing,
    * padding; natural language sits ~3.5–4.5 bits/char) that complements the
    * token-level [[repetitionStats]]. `H = log2(n) − (Σ c·log2 c)/n` over the
    * per-char counts, so every input to the float math is an exact integer.
    *
    * Scale shape: ONE native expression ([[graft.functions.CharEntropy]])
    * folds the per-char counts in a per-row map — no Generate, no exchange,
    * whole-stage codegen; the signal is scan-speed map work at any corpus
    * size. Determinism across engines: each `c·log2 c` addend is rounded to
    * 8 dp before the sum (sums of grid values are order-independent), and the
    * final entropy rounds to 6 dp — the DuckDB oracle replays it exactly, and
    * NativeExprSpec pins bit-equality to the composed explode+aggregate
    * formulation it fused.
    *
    * Output: `(id, n_chars, distinct_chars, entropy)`; empty/null text rows
    * produce no output (no chars to measure).
    */
  def charEntropy(df: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    df.select(col(idCol),
        graft.functions.CharEntropy.charEntropy(
          coalesce(col(textCol), lit(""))).as("__e"))
      .filter(col("__e.n_chars") > 0)
      .select(col(idCol), col("__e.n_chars").as("n_chars"),
        col("__e.distinct_chars").as("distinct_chars"),
        col("__e.entropy").as("entropy"))

  /** The pre-fusion explode+aggregate formulation of [[charEntropy]], kept as
    * the differential oracle for the native expression (NativeExprSpec).
    */
  private[graft] def charEntropyComposed(df: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val perChar = df
      .select(col(idCol), explode(split(coalesce(col(textCol), lit("")), ""))
        .as("__ch"))
      .filter(col("__ch") =!= "")
      .groupBy(col(idCol), col("__ch"))
      .agg(count(lit(1)).as("__c"))
    perChar.groupBy(col(idCol))
      .agg(
        sum(col("__c")).as("n_chars"),
        count(lit(1)).as("distinct_chars"),
        sum(round(col("__c").cast("double") * log(2.0, col("__c")), 8))
          .as("__clogc"))
      .select(col(idCol), col("n_chars"), col("distinct_chars"),
        round(log(2.0, col("n_chars")) -
          col("__clogc") / col("n_chars").cast("double"), 6).as("entropy"))
  }

  /** Fixed-size token windows with overlap — the training-data chunking op (context-
    * length packing feeds on these). Chunk k starts at token `k·(chunkTokens−overlap)`;
    * starts run strictly below the token count, so the final chunk may be short.
    * Output: one row per (doc, chunk) with `chunk_id`, `n_tokens`, `chunk_text`.
    *
    * Scale shape: pure per-row array work (split → sequence of starts → explode →
    * slice), no shuffle, whole-stage codegen; output order inside a document is
    * implicit in `chunk_id`, so downstream packing can repartition freely.
    */
  def chunk(df: DataFrame, chunkTokens: Int, overlap: Int = 0,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(chunkTokens > 0, "chunkTokens must be positive")
    require(overlap >= 0 && overlap < chunkTokens,
      s"overlap must be in [0, chunkTokens): got $overlap of $chunkTokens")
    val step = (chunkTokens - overlap).toLong
    val toks = tokens(col(textCol))
    // explicit ascending step: sequence(a, b) alone steps DOWN when b < a
    val starts = when(size(toks) > 0,
      sequence(lit(0L), (size(toks) - 1).cast("long"), lit(step)))
      .otherwise(array().cast("array<long>"))
    df.select(col(idCol).as("doc_id"), toks.as("__toks"),
        explode(starts).as("__start"))
      .select(
        col("doc_id"),
        (col("__start") / step).cast("long").as("chunk_id"),
        size(slice(col("__toks"), col("__start") + 1, lit(chunkTokens))).as("n_tokens"),
        concat_ws(" ",
          slice(col("__toks"), col("__start") + 1, lit(chunkTokens))).as("chunk_text"))
  }

  // Small public stopword profiles (language-ID heuristic).
  val enStop: Seq[String] = Seq("the", "a", "an", "and", "of", "to", "in", "is", "it", "for")
  val deStop: Seq[String] = Seq("der", "die", "das", "und", "ist", "nicht", "mit", "ein", "zu", "von")
  val esStop: Seq[String] = Seq("el", "los", "las", "y", "es", "una", "que", "por", "con", "para")
  val frStop: Seq[String] = Seq("le", "les", "et", "est", "une", "des", "du", "dans", "pour", "sur")

  private def stopHits(toks: Column, stop: Seq[String]): Column =
    size(filter(toks, t => t.isInCollection(stop)))

  /** Per-document statistics + a composite quality score in [0,1].
    *
    * Quality components (¼ each): word count in [5, 10000]; mean word length in [2, 12];
    * punctuation ratio ≤ 0.2; any stopword present.
    */
  def textStats(df: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val toks = tokens(col(textCol))
    val nWords = size(toks)
    val nChars = length(col(textCol))
    val nNonSpace = length(regexp_replace(trim(col(textCol)), "\\s+", ""))
    // Punct tokens in the BPE-ish segmentation are exactly the [^\w\s] single-char
    // matches, so count them with ONE regex pass (the previous two regexp_extract_all
    // passes + per-token rlike made this the slowest per-row query in the bench).
    val nPunct = size(regexp_extract_all(col(textCol), lit("[^\\w\\s]"), lit(0)))
    val avgWordLen = when(nWords > 0, nNonSpace.cast("double") / nWords).otherwise(0.0)
    val punctRatio = when(nChars > 0, nPunct.cast("double") / nChars).otherwise(0.0)
    val stopRatio = when(nWords > 0,
      stopHits(toks, enStop).cast("double") / nWords).otherwise(0.0)
    val quality =
      (when(nWords.between(5, 10000), 0.25).otherwise(0.0)
        + when(avgWordLen.between(2.0, 12.0), 0.25).otherwise(0.0)
        + when(punctRatio <= 0.2, 0.25).otherwise(0.0)
        + when(stopRatio > 0.0, 0.25).otherwise(0.0))
    df.select(
      col(idCol),
      nChars.as("n_chars"),
      nWords.as("n_words"),
      avgWordLen.as("avg_word_len"),
      punctRatio.as("punct_ratio"),
      stopRatio.as("stopword_ratio"),
      quality.as("quality_score"))
  }

  /** The Gopher repetition-free quality gate's stopword list (Rae et al. 2021,
    * "Scaling Language Models", table A1: a document must contain at least two of
    * these to pass).
    */
  val gopherStop: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** The Gopher thresholds as one value, so [[gopherFilter]] and the curation
    * pipeline can carry them around. Defaults are the published numbers.
    */
  final case class GopherConfig(
      minWords: Int = 50, maxWords: Int = 100000,
      minMeanWordLen: Double = 3.0, maxMeanWordLen: Double = 10.0,
      maxSymbolWordRatio: Double = 0.1,
      maxBulletLineRatio: Double = 0.9,
      maxEllipsisLineRatio: Double = 0.3,
      minAlphaWordRatio: Double = 0.8,
      minStopHits: Int = 2)

  // staged split arrays as attributes BEFORE any lambda touches them: a lambda
  // capturing the split() expression re-runs the regex split per element
  private def gopherStaged(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("__toks", tokens(col(textCol)))
      .withColumn("__ltoks", tokens(lower(col(textCol))))
      .withColumn("__lines", split(col(textCol), "\n"))

  /** The `passes` predicate over [[gopherStaged]] columns. */
  private def gopherPasses(textCol: String, g: GopherConfig): Column = {
    val m = gopherMetrics(textCol)
    m("n_words").between(g.minWords, g.maxWords) &&
      m("mean_word_len").between(g.minMeanWordLen, g.maxMeanWordLen) &&
      m("symbol_word_ratio") <= g.maxSymbolWordRatio &&
      m("bullet_line_ratio") <= g.maxBulletLineRatio &&
      m("ellipsis_line_ratio") <= g.maxEllipsisLineRatio &&
      m("alpha_word_ratio") >= g.minAlphaWordRatio &&
      m("stop_hits") >= g.minStopHits
  }

  /** Zero-shuffle Gopher gate: the rows of `df` that pass every rule, original
    * columns untouched — the curation-pipeline form of [[gopherRules]] (which
    * emits the measurements instead). Pure per-row filter at scan speed.
    */
  def gopherFilter(df: DataFrame, config: GopherConfig = GopherConfig(),
      textCol: String = "text"): DataFrame =
    gopherStaged(df, textCol)
      .filter(gopherPasses(textCol, config))
      .drop("__toks", "__ltoks", "__lines")

  /** Each rule's raw measurement as a named Column over [[gopherStaged]] output. */
  private def gopherMetrics(textCol: String): Map[String, Column] = {
    val txt = col(textCol)
    val toks = col("__toks")
    // split("") yields [""], so an all-whitespace document needs the explicit zero
    val nWords = when(length(trim(txt)) === 0, 0).otherwise(size(toks))
    val nNonSpace = length(regexp_replace(trim(txt), "\\s+", ""))
    val nSymbols = size(regexp_extract_all(txt, lit("#|\\.\\.\\.|…"), lit(0)))
    val lines = col("__lines")
    val nLines = size(lines) // >= 1 always: split never returns an empty array
    val nBullet = size(filter(lines, l => l.rlike("^[ \\t]*[-*•]")))
    val nEllipsis = size(filter(lines, l => l.rlike("(\\.\\.\\.|…)[ \\t]*$")))
    val nAlpha = size(filter(toks, t => t.rlike("[A-Za-z]")))
    Map(
      "n_words" -> nWords,
      "mean_word_len" ->
        when(nWords > 0, nNonSpace.cast("double") / nWords).otherwise(0.0),
      "symbol_word_ratio" ->
        when(nWords > 0, nSymbols.cast("double") / nWords).otherwise(0.0),
      "bullet_line_ratio" -> nBullet.cast("double") / nLines,
      "ellipsis_line_ratio" -> nEllipsis.cast("double") / nLines,
      "alpha_word_ratio" ->
        when(nWords > 0, nAlpha.cast("double") / nWords).otherwise(0.0),
      "stop_hits" -> gopherStop.map(w =>
        when(array_contains(col("__ltoks"), w), 1).otherwise(0)).reduce(_ + _))
  }

  /** Gopher-style quality rules (Rae et al. 2021 §A1.1, the filter suite most
    * LLM corpus pipelines start from): word-count bounds, mean-word-length bounds,
    * symbol-to-word ratio (`#`, `...`, `…`), bullet-line and ellipsis-line ratios,
    * alphabetic-word ratio, and required-stopword hits. Emits the raw measurements,
    * and `passes` = 1 iff every rule holds — callers filter or route to quarantine
    * ([[gopherFilter]] is the keep-the-rows form).
    *
    * Defaults are the published thresholds; every bound is a parameter because real
    * corpora (and the synthetic test corpus) sit at different scales.
    *
    * Scale shape: pure per-row string/array expressions — no shuffle, whole-stage
    * codegen, runs at scan speed on 100 TB. All regexes are single-pass with no
    * backtracking ambiguity, and each is written in the engine-portable subset
    * (explicit char classes, no `\w`-style aliases inside line lambdas) so the
    * DuckDB oracle replays them exactly.
    */
  def gopherRules(df: DataFrame, idCol: String = "doc_id", textCol: String = "text",
      minWords: Int = 50, maxWords: Int = 100000,
      minMeanWordLen: Double = 3.0, maxMeanWordLen: Double = 10.0,
      maxSymbolWordRatio: Double = 0.1,
      maxBulletLineRatio: Double = 0.9,
      maxEllipsisLineRatio: Double = 0.3,
      minAlphaWordRatio: Double = 0.8,
      minStopHits: Int = 2): DataFrame = {
    val g = GopherConfig(minWords, maxWords, minMeanWordLen, maxMeanWordLen,
      maxSymbolWordRatio, maxBulletLineRatio, maxEllipsisLineRatio,
      minAlphaWordRatio, minStopHits)
    val m = gopherMetrics(textCol)
    gopherStaged(df, textCol).select(
      col(idCol),
      m("n_words").as("n_words"),
      m("mean_word_len").as("mean_word_len"),
      m("symbol_word_ratio").as("symbol_word_ratio"),
      m("bullet_line_ratio").as("bullet_line_ratio"),
      m("ellipsis_line_ratio").as("ellipsis_line_ratio"),
      m("alpha_word_ratio").as("alpha_word_ratio"),
      m("stop_hits").as("stop_hits"),
      // INT not BOOLEAN: the oracle compare stringifies values and boolean
      // renderings differ across engines
      gopherPasses(textCol, g).cast("int").as("passes"))
  }

  /** Token counts under both segmentations. */
  def tokenCounts(df: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    df.select(
      col(idCol),
      size(tokens(col(textCol))).as("n_ws_tokens"),
      size(bpeishTokens(col(textCol))).as("n_bpeish_tokens"))

  /** Stopword-profile language ID. Scores each language by stopword hits; predicts the
    * argmax with fixed priority (en, de, es, fr) on ties; 'und' when no profile hits.
    */
  def langId(df: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val toks = tokens(col(textCol))
    val en = stopHits(toks, enStop)
    val de = stopHits(toks, deStop)
    val es = stopHits(toks, esStop)
    val fr = stopHits(toks, frStop)
    val top = greatest(en, de, es, fr)
    val predicted = when(top === 0, lit("und"))
      .when(en === top, lit("en"))
      .when(de === top, lit("de"))
      .when(es === top, lit("es"))
      .otherwise(lit("fr"))
    df.select(col(idCol),
      en.as("en_hits"), de.as("de_hits"), es.as("es_hits"), fr.as("fr_hits"),
      predicted.as("predicted_lang"))
  }

  /** Content fingerprints: exact (md5) and rolling polynomial hash (custom native
    * expression, [[graft.functions.RollingHash]]).
    */
  def fingerprints(df: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    df.select(
      col(idCol),
      md5(col(textCol)).as("md5_fingerprint"),
      graft.functions.RollingHash.rolling_hash(col(textCol)).as("rolling_fingerprint"))

  /** Repetition profile — the boilerplate/degenerate-text quality signal training
    * pipelines filter on: distinct-token ratio, dominant-token share, and the repeated
    * bigram fraction.
    *
    * Deliberately explode + aggregate (two shuffles keyed on doc_id) rather than
    * per-row higher-order lambdas: mode frequency via HOFs is O(tokens²) interpreted
    * work per document, while this shape is linear, map-side-combined, and at 100 TB is
    * the same pattern as every other aggregation here.
    */
  def repetitionStats(df: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    // materialize the token array as an attribute BEFORE any lambda touches it: a
    // lambda that captures the split() expression itself re-runs the regex split per
    // element (measured 10x slower on the bench corpus)
    val withTk = df.select(col(idCol).as("doc_id"), tokens(col(textCol)).as("tk"))
    val tk = col("tk")
    val toks = withTk.select(col("doc_id"), explode(tk).as("token"))
    val tokenStats = toks.groupBy("doc_id", "token")
      .agg(count(lit(1)).as("c"))
      .groupBy("doc_id")
      .agg(sum(col("c")).as("n_tokens"),
        count(lit(1)).as("n_distinct_tokens"),
        max(col("c")).as("top"))
    // non-distinct bigrams: zip the tokens with their own tail; the final element pairs
    // with the slice's padding null and is filtered, so 0/1-token docs need no guard
    val pairs = zip_with(tk, slice(tk, lit(2), greatest(size(tk) - 1, lit(0))),
      (x, y) => struct(x.as("a"), y.as("b")))
    val bg = transform(filter(pairs, p => p.getField("b").isNotNull),
      p => concat_ws(" ", p.getField("a"), p.getField("b")))
    val bigramStats = withTk.select(col("doc_id"), explode(bg).as("bg"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        countDistinct(col("bg")).as("n_distinct_bigrams"))
    tokenStats.join(bigramStats, Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        col("n_tokens"),
        col("n_distinct_tokens"),
        (col("n_distinct_tokens").cast("double") / col("n_tokens"))
          .as("distinct_ratio"),
        (col("top").cast("double") / col("n_tokens")).as("top_token_ratio"),
        when(col("n_bigrams").isNull || col("n_bigrams") === 0, 0.0)
          .otherwise(lit(1.0) -
            col("n_distinct_bigrams").cast("double") / col("n_bigrams"))
          .as("rep_bigram_ratio"))
  }

  // PII patterns scrubbed by [[scrubPii]], most-specific first (an SSN must not be
  // half-eaten by the phone pattern).
  val piiPatterns: Seq[(String, String)] = Seq(
    "email" -> "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}",
    "ssn" -> "\\b\\d{3}-\\d{2}-\\d{4}\\b",
    "phone" -> "\\b(\\+\\d{1,2}[ .-]?)?(\\(\\d{3}\\)[ .-]?|\\d{3}[ .-])\\d{3}[ .-]\\d{4}\\b",
    "ipv4" -> "\\b\\d{1,3}(\\.\\d{1,3}){3}\\b")

  /** PII scrubbing for training corpora: masks emails, SSN-shaped ids, phone numbers,
    * and IPv4 addresses, and reports the per-document redaction count. Pure per-row
    * regexp work — scan speed, no shuffle. The match count is taken BEFORE replacement
    * so overlapping patterns can't hide redactions from the audit column.
    */
  def scrubPii(df: DataFrame, idCol: String = "doc_id", textCol: String = "text",
      replacement: String = "<PII>"): DataFrame = {
    val nRedactions = piiPatterns.map { case (_, p) =>
      size(regexp_extract_all(col(textCol), lit(p), lit(0)))
    }.reduce(_ + _)
    val scrubbed = piiPatterns.foldLeft(col(textCol)) { case (c, (_, p)) =>
      regexp_replace(c, lit(p), lit(replacement))
    }
    df.withColumn("n_redactions", nRedactions)
      .withColumn(textCol, scrubbed)
  }

  /** Corpus heavy hitters: the k most document-frequent n-gram shingles — the
    * boilerplate/template detector that feeds `maxShingleDf` tuning and stop-shingle
    * lists. Map-side partial counts shuffle one row per distinct shingle, and the
    * top-k is a `TakeOrderedAndProject` (per-partition heads merged on the driver),
    * never a global sort. Ties break lexicographically for determinism.
    */
  def topShingles(df: DataFrame, idCol: String = "doc_id", textCol: String = "text",
      n: Int = 3, k: Int = 50): DataFrame =
    Dedup.shingles(df, idCol, textCol, n)
      .groupBy("shingle").agg(count(lit(1)).as("df_count"))
      .orderBy(col("df_count").desc, col("shingle"))
      .limit(k)
}
