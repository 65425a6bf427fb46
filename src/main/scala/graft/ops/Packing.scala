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
}
