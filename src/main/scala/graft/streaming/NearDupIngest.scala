package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.catalog.VersionedTable
import graft.ops.{Dedup, IncrementalDedup}

/** Continuous corpus ingestion with near-duplicate suppression — the streaming
  * composition of the engine's dedup tier:
  *
  *   stream of documents
  *     → sign the micro-batch ([[Dedup.minHashSignatures]], batch text only)
  *     → probe the corpus signature index ([[IncrementalDedup.filterNovel]] —
  *       index TEXT is never read, only its k-longs-per-doc signatures)
  *     → append the novel documents to the corpus table AND their signatures to
  *       the index table, both as [[VersionedTable.idempotentAppend]] commits
  *       keyed (checkpoint, batchId), so a replayed micro-batch after a crash
  *       re-appends NOTHING (exactly-once, Delta-transactional-sink parity).
  *
  * Within a micro-batch the batch also self-dedups (intra-batch near-dup pairs keep
  * the min-id canonical) before probing, so two copies arriving together don't both
  * land. State lives entirely in the two versioned tables — the stream itself is
  * stateless, so a restart resumes from the tables + source offsets alone.
  *
  * Scale: per micro-batch work is the batch's own signing (∝ batch size), one
  * banded equality probe against the index signatures, and two small appends. The
  * index grows by 8·numHashes bytes per admitted doc; run [[VersionedTable.compact]]
  * on both tables periodically so readers stop paying per-batch scan branches.
  */
object NearDupIngest {

  /** Start the ingest. `docs` must be a streaming DataFrame with (`doc_id`, `text`).
    * Returns the running query; stop it for a graceful drain.
    */
  def start(docs: DataFrame, corpusDir: String, indexDir: String,
      checkpointDir: String,
      numHashes: Int = 32, bands: Int = 8, threshold: Double = 0.5,
      trigger: Trigger = Trigger.ProcessingTime("10 seconds"),
      compactEvery: Int = 0): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        ingestBatch(batch, corpusDir, indexDir, checkpointDir, batchId,
          numHashes, bands, threshold)
        if (compactEvery > 0 && (batchId + 1) % compactEvery == 0)
          compactTables(batch.sparkSession, corpusDir, indexDir)
      }
      .start()

  /** Fold the accreted per-batch commits on both tables into target-sized
    * files — the opt-in maintenance the scaladoc used to delegate to an
    * external job (same `compactEvery` contract as [[IndexIngest]] /
    * [[IvfIngest]] / [[BqIngest]]). Neither table carries a pruning sort:
    * the probe is a banded EQUALITY join over the signature rows, so the fold
    * is pure file-count maintenance. Idempotent under replay.
    */
  def compactTables(spark: org.apache.spark.sql.SparkSession,
      corpusDir: String, indexDir: String): Unit = {
    VersionedTable.compactToFileSize(spark, corpusDir)
    VersionedTable.compactToFileSize(spark, indexDir)
    ()
  }

  /** One micro-batch: self-dedup, probe, append-if-novel. Public so batch backfills
    * can reuse the identical path (same idempotency keying).
    */
  def ingestBatch(batch: DataFrame, corpusDir: String, indexDir: String,
      txnApp: String, txnId: Long,
      numHashes: Int = 32, bands: Int = 8, threshold: Double = 0.5): Unit = {
    if (batch.isEmpty) return
    val spark = batch.sparkSession

    // intra-batch: drop exact dups and near-dup non-canonicals among the arrivals
    val selfDeduped = Dedup.exactDedup(batch)
    val selfSigs = Dedup.minHashSignatures(selfDeduped, numHashes = numHashes)
    val intraDupIds = IncrementalDedup
      .matchesAgainstIndex(selfSigs, selfSigs, numHashes, bands,
        threshold = threshold)
      .filter(col("new_doc") > col("index_doc")) // keep each cluster's min id
      .select(col("new_doc").as("doc_id")).distinct()
    val canonical = selfDeduped.join(intraDupIds, Seq("doc_id"), "left_anti")
    val canonicalSigs = Dedup.minHashSignatures(canonical, numHashes = numHashes)

    // probe the persisted index (first batch: no index yet)
    val indexExists = new org.apache.hadoop.fs.Path(s"$indexDir/_commit_log")
      .getFileSystem(spark.sessionState.newHadoopConf())
      .exists(new org.apache.hadoop.fs.Path(s"$indexDir/_commit_log"))
    val novel =
      if (!indexExists) canonical
      else IncrementalDedup.filterNovel(canonical, canonicalSigs,
        VersionedTable.read(spark, indexDir), numHashes, bands,
        threshold = threshold)

    // exactly-once: both appends share the (txnApp, txnId) identity, so a replay
    // that already committed either table is a no-op for it
    VersionedTable.idempotentAppend(novel, corpusDir, s"$txnApp#corpus", txnId)
    VersionedTable.idempotentAppend(
      Dedup.minHashSignatures(novel, numHashes = numHashes),
      indexDir, s"$txnApp#index", txnId)
    ()
  }
}
