package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** C4-style corpus-level duplicate-text removal (Raffel et al. 2020 §2.2 "we
  * discard all but one of any three-sentence span occurring more than once"),
  * re-expressed over fixed-width word chunks: any chunk whose corpus-wide
  * occurrence count exceeds `maxOccurrences` keeps only its FIRST occurrence
  * (lowest `(doc_id, chunk_id)`), and every document is reassembled from its
  * surviving chunks. This is the corpus-level complement to the per-document
  * [[TextAnalysis]] repetition profile and the doc-level near-dup family in
  * [[Dedup]]: boilerplate (headers, licenses, navigation chrome) repeats across
  * millions of documents that are NOT near-duplicates of each other, and only a
  * corpus-wide count catches it.
  *
  * Scale shape (the reason this is not a window function): counting through
  * `groupBy(md5)` gets map-side partial aggregation — a chunk duplicated across
  * a billion documents arrives at the shuffle as one row per map task, not one
  * row per occurrence, where a `count(*) over (partition by md5)` window would
  * shuffle and SORT every occurrence. Three exchanges total: the count groupBy,
  * the count join back (both keyed on the 16-byte md5, never raw text), and the
  * per-document reassembly groupBy.
  *
  * The unit is a chunk of `chunkWords` whitespace tokens rather than a line
  * because the corpus under test carries no line structure; on real data pass
  * the text through a line/sentence splitter first and feed one row per line.
  */
object ChunkDedup {

  /** Non-overlapping `chunkWords`-token chunks per document:
    * `(doc_id, chunk_id, chunk_text)`. The tail chunk may be shorter.
    */
  def chunks(df: DataFrame, chunkWords: Int, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(chunkWords > 0, s"chunkWords must be positive; got $chunkWords")
    val toks = split(trim(col(textCol)), "\\s+")
    // Column `/` is DOUBLE division — floor+cast keeps sequence() on integers
    val lastChunk = floor((size(toks) - 1) / lit(chunkWords)).cast("int")
    df.select(col(idCol).as("doc_id"),
      posexplode(
        transform(
          sequence(lit(0), lastChunk),
          i => array_join(slice(toks, i * chunkWords + 1, lit(chunkWords)), " ")))
        .as(Seq("chunk_id", "chunk_text")))
  }

  /** Every chunk occurrence flagged with whether it survives:
    * `(doc_id, chunk_id, chunk_text, corpus_count, kept)`. A chunk survives iff
    * its corpus count is within `maxOccurrences`, or this occurrence is the
    * first (lowest `(doc_id, chunk_id)` — so exactly ONE copy of over-replicated
    * text remains, per the C4 rule, rather than none).
    *
    * `maxChunkDf` is the SKEW guard (the [[Dedup]] `maxShingleDf` pattern, but
    * output-preserving): without it, a universal boilerplate chunk — one header
    * present in a double-digit fraction of all documents — lands its ENTIRE
    * occurrence set on one reducer of the count join back. With a cap, chunk
    * hashes whose corpus count exceeds it are resolved driver-side (at most
    * totalChunks / maxChunkDf of them can exist, so the collect is small by
    * construction) and their occurrences take a BROADCAST join instead; the
    * shuffle join's probe side excludes them via a broadcast anti-join, so its
    * per-key row count is bounded by `maxChunkDf`. Flags are IDENTICAL to the
    * uncapped path — the cap changes the plan, never the answer — at the cost
    * of one extra aggregation pass to find the hot set. Pick a cap well above
    * any legitimate duplication level (e.g. 10k) so the hot set stays tiny.
    */
  def flaggedChunks(df: DataFrame, chunkWords: Int, maxOccurrences: Long = 1,
      idCol: String = "doc_id", textCol: String = "text",
      maxChunkDf: Option[Long] = None): DataFrame =
    flagUnits(chunks(df, chunkWords, idCol, textCol), maxOccurrences,
      maxChunkDf)

  /** [[flaggedChunks]] generalized to CALLER-PROVIDED units — the composition
    * point the object scaladoc promises ("pass the text through a
    * line/sentence splitter first"): any `(doc_id, chunk_id, chunk_text)`
    * frame flags the same way, with the same skew cap and the same
    * answer-preserving plan split.
    */
  private def flagUnits(units: DataFrame, maxOccurrences: Long,
      maxChunkDf: Option[Long]): DataFrame = {
    require(maxOccurrences >= 1, s"maxOccurrences must be >= 1; got $maxOccurrences")
    maxChunkDf.foreach(cap => require(cap >= maxOccurrences,
      s"maxChunkDf ($cap) must be >= maxOccurrences ($maxOccurrences)"))
    val df = units
    val ch = units.withColumn("__h", md5(col("chunk_text")))
    // min(struct) = lexicographically-first occurrence, found in the SAME
    // map-side-combined pass as the count — no second shuffle, no window sort
    val groups = ch.groupBy("__h").agg(
      count(lit(1)).as("corpus_count"),
      min(struct(col("doc_id"), col("chunk_id"))).as("__first"))
    val kept = col("corpus_count") <= maxOccurrences ||
      (col("__first.doc_id") === col("doc_id") &&
        col("__first.chunk_id") === col("chunk_id"))
    val out = Seq("doc_id", "chunk_id", "chunk_text", "corpus_count", "kept")
    val hotRows = maxChunkDf
      .map(cap => groups.filter(col("corpus_count") > cap).collect())
      .getOrElse(Array.empty)
    if (hotRows.isEmpty)
      ch.join(groups, "__h").withColumn("kept", kept).select(out.map(col): _*)
    else {
      val spark = df.sparkSession
      val hot = broadcast(spark.createDataFrame(
        java.util.Arrays.asList(hotRows: _*), groups.schema))
      // hot keys: map-side broadcast join, no shuffle of their occurrence sets
      val hotFlagged = ch.join(hot, "__h")
      // cold keys: the ordinary shuffle join, with hot keys anti-joined out of
      // the probe BEFORE the exchange — max rows per join key <= maxChunkDf
      val coldFlagged = ch
        .join(hot.select("__h"), Seq("__h"), "left_anti")
        .join(groups, "__h")
      hotFlagged.unionByName(coldFlagged)
        .withColumn("kept", kept).select(out.map(col): _*)
    }
  }

  /** Documents rebuilt from their surviving chunks:
    * `(doc_id, clean_text, n_chunks, n_kept)`. A document whose every chunk was
    * removed stays in the output with an empty `clean_text` — dropping rows is
    * the caller's policy decision, not the operator's.
    */
  def dedupChunks(df: DataFrame, chunkWords: Int, maxOccurrences: Long = 1,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    rebuild(flaggedChunks(df, chunkWords, maxOccurrences, idCol, textCol),
      "n_chunks")

  /** SENTENCE-grain corpus dedup — the composition C4 actually describes
    * (its spans are sentence runs, not token windows): segment with
    * [[TextAnalysis.sentences]], count each sentence corpus-wide, keep only
    * the first occurrence of any sentence past `maxOccurrences`, and rebuild
    * each document from its surviving sentences in order. Same three-exchange
    * shape and the same `maxSentenceDf` skew guard as the chunk path (one
    * universal boilerplate sentence — a license line, a cookie banner — is
    * exactly the hot key the cap exists for). Documents whose every sentence
    * was removed stay in the output with empty `clean_text`; documents with
    * NO sentences (empty text) produce no units and are absent, mirroring
    * the segmentation. Output: `(doc_id, clean_text, n_sentences, n_kept)`.
    */
  def dedupSentences(df: DataFrame, maxOccurrences: Long = 1,
      idCol: String = "doc_id", textCol: String = "text",
      maxSentenceDf: Option[Long] = None): DataFrame =
    rebuild(flagUnits(
        TextAnalysis.sentences(df, idCol, textCol)
          .toDF("doc_id", "chunk_id", "chunk_text"),
        maxOccurrences, maxSentenceDf),
      "n_sentences")

  /** Documents reassembled from their surviving units:
    * `(doc_id, clean_text, <nUnitsName>, n_kept)`. A document whose every
    * unit was removed stays in the output with an empty `clean_text` —
    * dropping rows is the caller's policy decision, not the operator's.
    */
  private def rebuild(flagged: DataFrame, nUnitsName: String): DataFrame =
    flagged
      .groupBy("doc_id")
      .agg(
        // collect_list drops the nulls `when` leaves for removed chunks, and
        // array_sort on (chunk_id, text) structs restores document order
        array_join(
          transform(
            array_sort(collect_list(
              when(col("kept"), struct(col("chunk_id"), col("chunk_text"))))),
            x => x("chunk_text")),
          " ").as("clean_text"),
        count(lit(1)).as(nUnitsName),
        sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept"))
}
