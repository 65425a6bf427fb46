package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental near-duplicate detection: score a NEW batch of documents against a
  * persisted MinHash signature index without touching the corpus text again.
  *
  * This is the operation a production ingest pipeline actually runs: the corpus was
  * signed once (and its signatures stored — [[Dedup.minHashSignatures]] output, e.g.
  * as a [[graft.catalog.VersionedTable]] the pipeline appends to); each arriving
  * batch signs ONLY its own documents, then probes the index. Re-running the full
  * [[Dedup.minhashNearDuplicates]] over corpus+batch would re-shingle and re-sign
  * 100 TB to admit a few GB.
  *
  * Scale shape: the index side carries `numHashes` longs per document (k=32 → 256
  * bytes/doc vs kilobytes of text — a 10⁹-doc index is ~0.25 TB of signatures, not
  * 100 TB of text). Candidates come from an EQUALITY join of banded batch signatures
  * against banded index signatures (the standard LSH bucket probe — never all-pairs);
  * similarity is then ESTIMATED map-side as the fraction of agreeing minhashes
  * (an unbiased estimator of Jaccard with s.d. ≈ √(j(1−j)/k)), so no index text and
  * no shingle stream is ever read. The batch side of the probe join is typically
  * orders of magnitude smaller than the index and broadcastable; the index-side
  * signature lookup shuffles only candidate doc ids.
  */
object IncrementalDedup {

  /** Near-dup matches of a new batch against a signature index.
    *
    * `batchSigs`/`indexSigs` are [[Dedup.minHashSignatures]] frames
    * (doc_id, h0..h{k-1}) built with the SAME (n, numHashes, hashFn) — mixing
    * families silently yields zero matches, which is why the index should persist
    * its build parameters alongside the signatures.
    *
    * Output: `new_doc, index_doc, est_jaccard` for candidate pairs (≥ 1 shared LSH
    * band) whose estimated Jaccard clears `threshold`. est_jaccard = agreeing
    * hashes / numHashes — exact in any engine (k a power of two ⇒ the division is
    * binary-exact, no rounding needed).
    */
  def matchesAgainstIndex(batchSigs: DataFrame, indexSigs: DataFrame,
      numHashes: Int = 32, bands: Int = 8,
      bandHash: Seq[Column] => Column = Dedup.xxBandHash,
      threshold: Double = 0.5): DataFrame = {
    val nb = Dedup.bandedSignatures(batchSigs, numHashes, bands, bandHash)
    val ib = Dedup.bandedSignatures(indexSigs, numHashes, bands, bandHash)
    val candidates = nb.as("n")
      .join(ib.as("i"),
        col("n.band") === col("i.band") && col("n.band_hash") === col("i.band_hash"))
      .select(col("n.doc_id").as("new_doc"), col("i.doc_id").as("index_doc"))
      .distinct()
    val agree = (0 until numHashes)
      .map(i => when(col(s"a.h$i") === col(s"b.h$i"), 1).otherwise(0))
      .reduce(_ + _)
    candidates
      .join(batchSigs.as("a"), col("new_doc") === col("a.doc_id"))
      .join(indexSigs.as("b"), col("index_doc") === col("b.doc_id"))
      .select(col("new_doc"), col("index_doc"),
        (agree.cast("double") / numHashes).as("est_jaccard"))
      .filter(col("est_jaccard") >= threshold)
  }

  /** The batch rows that matched nothing in the index — what an ingest pipeline
    * appends to the corpus (and whose signatures it appends to the index). Left-anti
    * on the match set: one small join, batch text streams through untouched.
    */
  def filterNovel(batch: DataFrame, batchSigs: DataFrame, indexSigs: DataFrame,
      numHashes: Int = 32, bands: Int = 8,
      bandHash: Seq[Column] => Column = Dedup.xxBandHash,
      threshold: Double = 0.5, idCol: String = "doc_id"): DataFrame = {
    val dupIds = matchesAgainstIndex(batchSigs, indexSigs, numHashes, bands, bandHash,
      threshold).select(col("new_doc"))
    batch.join(dupIds, batch(idCol) === dupIds("new_doc"), "left_anti")
  }

  /** The build parameters a persisted index was signed with. Signatures from two
    * different (n, numHashes, family) builds are mutually meaningless — a probe
    * joining them returns silent garbage (usually zero matches), which is why the
    * parameters travel WITH the index and are validated on read.
    */
  final case class IndexParams(n: Int, numHashes: Int, hashFamily: String)

  private def paramsPath(dir: String) = s"$dir/_index_params.json"

  /** Persist a signature index: [[Dedup.minHashSignatures]] output as parquet plus
    * the build parameters beside it. Growing the index is an ordinary parquet append
    * of the novel batch's signatures (same params — enforced by reading through
    * [[readIndex]]), or a [[graft.catalog.VersionedTable]] if history matters.
    */
  def writeIndex(sigs: DataFrame, dir: String, params: IndexParams,
      mode: String = "overwrite"): Unit = {
    sigs.write.mode(mode).parquet(s"$dir/signatures")
    val spark = sigs.sparkSession
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val out = fs.create(new org.apache.hadoop.fs.Path(paramsPath(dir)), true)
    try out.write(
      s"""{"n":${params.n},"numHashes":${params.numHashes},"hashFamily":"${params.hashFamily}"}"""
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  /** Load a persisted index, failing fast unless the caller's expected parameters
    * match what the index was actually built with.
    */
  def readIndex(spark: org.apache.spark.sql.SparkSession, dir: String,
      expected: IndexParams): DataFrame = {
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val in = fs.open(new org.apache.hadoop.fs.Path(paramsPath(dir)))
    val body = try new String(in.readAllBytes(),
      java.nio.charset.StandardCharsets.UTF_8) finally in.close()
    def num(k: String) = s""""$k":(\\d+)""".r.findFirstMatchIn(body)
      .map(_.group(1).toInt).getOrElse(-1)
    val stored = IndexParams(num("n"), num("numHashes"),
      """"hashFamily":"([^"]*)"""".r.findFirstMatchIn(body)
        .map(_.group(1)).getOrElse(""))
    require(stored == expected,
      s"signature index at $dir was built with $stored, probe expects $expected — " +
        "signatures from different builds are mutually meaningless")
    spark.read.parquet(s"$dir/signatures")
  }

  /** N-gram novelty of a new batch against a reference corpus: per new document,
    * the fraction of its distinct n-gram shingles never seen in the reference —
    * the data-freshness signal a mixing pipeline tracks per source/crawl (near-1
    * novelty = genuinely new material; near-0 = the batch re-crawls what the
    * corpus already holds). Documents shorter than n emit no row.
    *
    * Scale shapes: both shingle streams are the map-side kernel; the reference
    * side reduces to DISTINCT shingles once (persist it for repeated batches);
    * the unseen count is a LEFT ANTI equality join on the shingle key — at 100 TB
    * put a bloom filter of the reference set in front, the join stays the same.
    */
  def shingleNovelty(newDocs: DataFrame, refDocs: DataFrame, n: Int = 3,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val newSh = Dedup.shingles(newDocs, idCol, textCol, n)
    val refSh = Dedup.shingles(refDocs, idCol, textCol, n)
      .select("shingle").distinct()
    val totals = newSh.groupBy("doc_id").agg(count(lit(1)).as("n_shingles"))
    val unseen = newSh.join(refSh, Seq("shingle"), "left_anti")
      .groupBy("doc_id").agg(count(lit(1)).as("n_unseen"))
    totals.join(unseen, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_shingles"),
        coalesce(col("n_unseen"), lit(0L)).as("n_unseen"),
        round(coalesce(col("n_unseen"), lit(0L)).cast("double") /
          col("n_shingles"), 6).as("novelty"))
  }
}
