package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.catalog.VersionedTable
import graft.ops.Bm25

/** Continuous BM25 index maintenance — the streaming composition of the
  * retrieval tier, the way [[NearDupIngest]] composes the dedup tier:
  *
  *   stream of documents
  *     → tokenize the micro-batch ONCE ([[Bm25.landArtifacts]], batch text
  *       only — the corpus behind the index is never rescanned)
  *     → append postings (term-clustered) / doc-lengths / per-batch stats to
  *       the three versioned index tables, each an exactly-once
  *       [[VersionedTable.idempotentAppend]] keyed (checkpoint, batchId) —
  *       a replayed micro-batch after a crash re-appends NOTHING.
  *
  * The serving paths ([[Bm25.topKFromIndex]],
  * [[graft.ops.HybridRetrieval.bm25RrfTopKFromIndex]] over
  * [[Bm25.readIndexFrom]]) read the same tables with no coordination: the
  * commit log publishes each batch atomically, and the per-batch stats rows
  * fold at read. State lives entirely in the tables — the stream itself is
  * stateless, so a restart resumes from the tables + source offsets alone.
  *
  * Scale: per micro-batch work is the batch's own tokenization plus one
  * batch-sized combine shuffle and one range shuffle — independent of corpus
  * size. A long-running stream accretes one file-scan branch per micro-batch;
  * opt into `compactEvery` (or run [[compactIndex]] from a maintenance job)
  * so readers stop paying them.
  *
  * Contract: arriving doc_ids are novel (route through [[NearDupIngest]] or
  * an ingest ledger first — re-appending an indexed doc double-counts, as in
  * any append-only store).
  */
object IndexIngest {

  /** Start the maintainer. `docs` must be a streaming DataFrame carrying
    * (`idCol`, `textCol`). Returns the running query; stop it for a graceful
    * drain. `compactEvery > 0` folds the index tables every N micro-batches
    * (term-ordered rewrite — serving pruning survives) instead of leaving
    * compaction to an external maintenance job. `vacuumEvery > 0` additionally
    * RECLAIMS data files no live-or-retained version references every N
    * micro-batches ([[vacuumIndex]]) — compaction alone keeps every
    * pre-compact commit readable for time travel, so a long-running stream
    * otherwise accretes storage without bound; `vacuumRetentionMs` is the
    * time-travel window traded away (default 7 days, the Delta convention —
    * keep it comfortably above the longest concurrent reader).
    */
  def start(docs: DataFrame, indexDir: String, checkpointDir: String,
      idCol: String = "doc_id", textCol: String = "text",
      trigger: Trigger = Trigger.ProcessingTime("10 seconds"),
      compactEvery: Int = 0, vacuumEvery: Int = 0,
      vacuumRetentionMs: Long = 7L * 24 * 3600 * 1000): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        ingestBatch(batch, indexDir, checkpointDir, batchId, idCol, textCol)
        if (compactEvery > 0 && (batchId + 1) % compactEvery == 0)
          compactIndex(batch.sparkSession, indexDir)
        if (vacuumEvery > 0 && (batchId + 1) % vacuumEvery == 0) {
          vacuumIndex(batch.sparkSession, indexDir, vacuumRetentionMs)
          ()
        }
      }
      .start()

  /** One micro-batch: tokenize, land the three artifacts exactly-once. All
    * three appends share the (txnApp, txnId) identity (suffixed per artifact
    * so each table dedups independently — a crash between the postings and
    * stats appends replays only the missing ones). Public so batch backfills
    * can reuse the identical path with the same idempotency keying.
    */
  def ingestBatch(batch: DataFrame, indexDir: String, txnApp: String,
      txnId: Long, idCol: String = "doc_id", textCol: String = "text"): Unit = {
    if (batch.isEmpty) return
    Bm25.landArtifacts(batch, idCol, textCol) { (df, artifact) =>
      // match the persisted postings layout: a maintainer pointed at a
      // pre-denormalization index must keep its 3-column shape, or every
      // pre-append document would read dl=NULL and score NULL (Bm25.conformPostings)
      val out =
        if (artifact == "postings") Bm25.conformPostings(df, indexDir) else df
      VersionedTable.idempotentAppend(out, s"$indexDir/$artifact",
        s"$txnApp#$artifact", txnId)
      ()
    }
  }

  /** Fold the accreted per-batch commits: postings rewrite TERM-ordered (the
    * serving layout — pushed-term row-group pruning survives compaction),
    * doc lengths fold to target-sized files, stats to one file (the
    * per-batch rows are PRESERVED — [[Bm25.readIndexFrom]] still folds them
    * at read). Idempotent under replay — recompacting compacted state is a
    * no-op rewrite. Serving answers are unchanged; only the file count
    * readers open drops (spec-pinned on a counting filesystem).
    */
  def compactIndex(spark: SparkSession, indexDir: String): Unit = {
    VersionedTable.compact(spark, s"$indexDir/postings",
      sortBy = Seq("term", "doc_id"))
    VersionedTable.compactToFileSize(spark, s"$indexDir/doclen")
    foldStats(spark, s"$indexDir/stats")
  }

  /** Reclaim index storage no live-or-retained version references — the
    * missing half of [[compactIndex]]'s lifecycle: a compact commit shadows
    * the per-batch commits but leaves their data files on disk for time
    * travel, so compact-only maintenance still grows storage linearly with
    * stream lifetime. Vacuums all three artifact tables with the versioned
    * table's retention rule (a commit is reclaimable only once a LATER
    * full-state commit is itself older than `retentionMs`), so current-state
    * serving is never affected; only as-of reads past the window die. Returns
    * the reclaimed paths.
    */
  def vacuumIndex(spark: SparkSession, indexDir: String,
      retentionMs: Long = 7L * 24 * 3600 * 1000): Seq[String] =
    Seq("postings", "doclen", "stats").flatMap(artifact =>
      VersionedTable.vacuum(spark, s"$indexDir/$artifact", retentionMs))

  /** Stats FOLD, not just a file rewrite: the per-batch (n, sumdl) rows sum
    * to one row (exactly what [[Bm25.readIndexFrom]] computes at read), so
    * the table stays O(1) instead of O(batches).
    *
    * The fold is a read-modify-write, and [[ingestBatch]] is public for
    * batch backfills, so the streaming maintainer's single-writer serialization
    * is honor-system — a backfill append landing between the fold's read and
    * its overwrite would otherwise lose that batch's `(n, sumdl)` row and skew
    * avgdl for every subsequent score. Guarded here with the versioned table's
    * own CAS ([[VersionedTable.idempotentOverwrite]] `expectedVersion`,
    * [[VersionedTable.compact]]'s fresh-snapshot rule): the fold is computed
    * from a PINNED snapshot version and only lands while that version is
    * still the newest; a rival commit in between fails the CAS and the fold
    * recomputes from the new head. Re-folding a folded table is a no-op row.
    */
  /** Test seam: runs after the fold pins its snapshot version and before the
    * CAS commit — IndexIngestSpec injects a rival append here to prove the
    * fold detects it and retries instead of losing the row. Not part of the
    * API; always a no-op in production.
    */
  private[graft] var foldStatsBeforeCommit: () => Unit = () => ()

  private[graft] def foldStats(spark: SparkSession, statsLoc: String,
      maxAttempts: Int = 3): Unit = {
    import org.apache.spark.sql.functions.{coalesce, col, lit, sum}
    var attempt = 0
    while (true) {
      val cs = VersionedTable.commits(spark, statsLoc)
      require(cs.nonEmpty, s"no commits at $statsLoc — nothing to fold")
      val v0 = cs.last.version
      val folded = VersionedTable.readAsOf(spark, statsLoc, v0)
        .agg(coalesce(sum(col("n")), lit(0L)).as("n"),
          coalesce(sum(col("sumdl")), lit(0L)).as("sumdl"))
        .coalesce(1)
      foldStatsBeforeCommit()
      // txnId = the folded snapshot version: strictly increasing, so a replay
      // of the SAME fold dedups (no-op) while distinct folds never collide
      try {
        VersionedTable.idempotentOverwrite(folded, statsLoc,
          "graft.index_stats_fold", v0, expectedVersion = Some(v0))
        return
      } catch {
        case _: java.util.ConcurrentModificationException =>
          attempt += 1
          if (attempt >= maxAttempts) throw new IllegalStateException(
            s"stats fold at $statsLoc lost $maxAttempts snapshot races — " +
              "giving up (re-run once the appenders quiesce)")
      }
    }
  }
}
