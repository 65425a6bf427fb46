package graft.ops

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._

/** Sequence packing: assign token chunks to fixed-capacity training sequences
  * (context windows), minimizing padding waste.
  *
  * Greedy packing is inherently sequential — a chunk's bin depends on every prior
  * assignment — so it can never be a window function over the whole corpus. The
  * scalable shape: shard the corpus into independent PACK GROUPS by hash of the
  * document id (training does not care which sequences a document's chunks share,
  * only that sequences respect capacity), sort each group deterministically, and run
  * next-fit inside the group. One shuffle total; per-group state is a single running
  * counter; groups pack in parallel. Waste is bounded by next-fit's classic 2×
  * optimal, and in practice chunking upstream emits near-capacity chunks so bins
  * fill tightly.
  *
  * Determinism: (group, seq_id) assignments depend only on the sorted group content,
  * so the packing is identical under any input partitioning or rerun — the same
  * reproducibility contract as [[Splits]].
  */
object Packing {

  final case class Chunk(doc_id: Long, chunk_id: Long, n_tokens: Int, pack_group: Int)
  final case class Packed(
      doc_id: Long, chunk_id: Long, n_tokens: Int, pack_group: Int, seq_id: Long)

  /** Next-fit packing of `chunks` (as produced by [[TextAnalysis.chunk]]) into
    * sequences of at most `capacity` tokens. A chunk larger than `capacity` gets a
    * sequence of its own (callers chunking with `chunkTokens <= capacity` never
    * produce one). Output adds `pack_group` and the within-group `seq_id`.
    */
  def nextFit(chunks: DataFrame, capacity: Int, packGroups: Int = 256,
      idCol: String = "doc_id", chunkIdCol: String = "chunk_id",
      tokensCol: String = "n_tokens"): DataFrame = {
    require(capacity > 0, "capacity must be positive")
    require(packGroups > 0, "packGroups must be positive")
    val spark = chunks.sparkSession
    import spark.implicits._
    val typed = chunks.select(
      col(idCol).cast("long").as("doc_id"),
      col(chunkIdCol).cast("long").as("chunk_id"),
      col(tokensCol).cast("int").as("n_tokens"),
      pmod(xxhash64(col(idCol)), lit(packGroups)).cast("int").as("pack_group"))
      .as[Chunk]
    typed.groupByKey(_.pack_group)(Encoders.scalaInt)
      .flatMapSortedGroups(col("doc_id"), col("chunk_id")) { (_, it) =>
        // next-fit: one counter of state per group, streaming over the sorted chunks
        var seq = 0L
        var used = 0
        it.map { c =>
          if (used > 0 && used + c.n_tokens > capacity) { seq += 1; used = 0 }
          used += c.n_tokens
          Packed(c.doc_id, c.chunk_id, c.n_tokens, c.pack_group, seq)
        }
      }
      .toDF()
  }

  /** Length-bucketed INFERENCE batching (the serving-side twin of training
    * packing): pad-to-bucket batching wastes `bucket_cap − n_tokens` per row,
    * so rows are bucketed to the next power of two of their token count
    * (clamped to [`minCap`, `maxCap`]) and batches of `batchSize` form inside
    * each bucket in deterministic doc order. Emits per row: `bucket_cap` (what
    * the batch pads to), `batch_id` (globally unique: bucket-prefixed), and
    * `padding` (the waste this row pays) — feed the sum to capacity planning.
    *
    * Plan shape: one shuffle partitioned by (bucket, shard) with an in-partition
    * sort (row_number) — the latest-per-key shape. Buckets alone are only
    * ~log2(maxCap/minCap) keys (~10 with the defaults), which at 100 TB would
    * funnel the corpus through ~10 reducer tasks; `numShards` salts each bucket
    * into `numShards` independent windows keyed by a deterministic md5 shard of
    * the doc id, making parallelism a knob: the window partitions hold
    * ~corpus/(buckets·numShards) rows. Batches never span shards, so a batch
    * still pads to one `bucket_cap` and holds at most `batchSize` rows; the only
    * cost of salting is up to one under-full batch per (bucket, shard) instead
    * of per bucket — noise against 100 TB. `batch_id` is bucket#shard#index,
    * deterministic for a given (input, numShards) under any partitioning or
    * rerun — the same reproducibility contract as [[Splits.shardAssign]], whose
    * md5 shard formula this reuses (md5, not xxhash64, so external engines can
    * replay the assignment byte-for-byte).
    */
  def lengthBuckets(df: DataFrame, batchSize: Int, minCap: Int = 16,
      maxCap: Int = 8192, idCol: String = "doc_id",
      tokensCol: String = "n_tokens", numShards: Int = 1): DataFrame = {
    require(batchSize > 0, "batchSize must be positive")
    require(minCap > 0 && maxCap >= minCap, s"bad caps [$minCap, $maxCap]")
    require(numShards > 0, s"numShards must be positive, got $numShards")
    // next power of two >= n, clamped. PURE INTEGER arithmetic — floating log2
    // sits within an ulp of an integer exactly at the bucket boundaries, where
    // engines may disagree; 2^bitlength(n-1) (via bin()) cannot
    val cap = expr(
      s"least(greatest(shiftleft(CAST(1 AS BIGINT), " +
        s"length(bin(greatest(CAST($tokensCol AS BIGINT), 2L) - 1))), " +
        s"${minCap}L), ${maxCap}L)")
    val shard = Splits.md5Shard(col(idCol), numShards)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("bucket_cap"), col("__shard")).orderBy(col(idCol))
    df.withColumn("bucket_cap", cap)
      .withColumn("__shard", shard)
      .withColumn("batch_id",
        concat_ws("#", col("bucket_cap"), col("__shard"),
          ((row_number().over(w) - 1) / batchSize).cast("long")))
      .withColumn("padding",
        greatest(col("bucket_cap") - col(tokensCol), lit(0L)))
      .drop("__shard")
  }
}
