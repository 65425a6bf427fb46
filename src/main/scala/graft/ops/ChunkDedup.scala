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
    */
  def flaggedChunks(df: DataFrame, chunkWords: Int, maxOccurrences: Long = 1,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(maxOccurrences >= 1, s"maxOccurrences must be >= 1; got $maxOccurrences")
    val ch = chunks(df, chunkWords, idCol, textCol)
      .withColumn("__h", md5(col("chunk_text")))
    // min(struct) = lexicographically-first occurrence, found in the SAME
    // map-side-combined pass as the count — no second shuffle, no window sort
    val groups = ch.groupBy("__h").agg(
      count(lit(1)).as("corpus_count"),
      min(struct(col("doc_id"), col("chunk_id"))).as("__first"))
    ch.join(groups, "__h")
      .withColumn("kept",
        col("corpus_count") <= maxOccurrences ||
          (col("__first.doc_id") === col("doc_id") &&
            col("__first.chunk_id") === col("chunk_id")))
      .select("doc_id", "chunk_id", "chunk_text", "corpus_count", "kept")
  }

  /** Documents rebuilt from their surviving chunks:
    * `(doc_id, clean_text, n_chunks, n_kept)`. A document whose every chunk was
    * removed stays in the output with an empty `clean_text` — dropping rows is
    * the caller's policy decision, not the operator's.
    */
  def dedupChunks(df: DataFrame, chunkWords: Int, maxOccurrences: Long = 1,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    flaggedChunks(df, chunkWords, maxOccurrences, idCol, textCol)
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
        count(lit(1)).as("n_chunks"),
        sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept"))
}
