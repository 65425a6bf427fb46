package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Packing, TextAnalysis}

class PackingSpec extends AnyFunSuite with SharedSpark {

  import spark.implicits._

  test("next-fit: capacity respected, oversize chunks isolated, hand-checked bins") {
    // one pack group so the assignment is fully predictable
    val chunks = Seq(
      (1L, 0L, 6), (1L, 1L, 3),   // seq 0: 6+3 = 9 ≤ 10
      (1L, 2L, 2),                 // 9+2 > 10 → seq 1
      (2L, 0L, 12),                // oversize → its own seq (2)
      (3L, 0L, 10))                // exactly capacity → seq 3
      .toDF("doc_id", "chunk_id", "n_tokens")
    val packed = Packing.nextFit(chunks, capacity = 10, packGroups = 1)
      .orderBy("doc_id", "chunk_id").collect()
    assert(packed.map(_.getAs[Long]("seq_id")).toSeq === Seq(0L, 0L, 1L, 2L, 3L))
  }

  test("corpus chunks: every chunk packed once, bins within capacity, deterministic") {
    val docs = Tables.documents(spark, sf)
    val chunks = TextAnalysis.chunk(docs, chunkTokens = 64, overlap = 0)
    val packed = Packing.nextFit(chunks, capacity = 256, packGroups = 8)
    assert(packed.count() === chunks.count())
    // no (doc, chunk) lost or duplicated
    assert(packed.select("doc_id", "chunk_id").distinct().count() === chunks.count())
    // every sequence fits the context window (chunkTokens ≤ capacity → no oversize)
    val over = packed.groupBy("pack_group", "seq_id")
      .agg(sum("n_tokens").as("t")).filter(col("t") > 256)
    assert(over.count() === 0)
    // same assignment under a different input partitioning
    val repacked = Packing.nextFit(chunks.repartition(17), capacity = 256,
      packGroups = 8)
    assert(packed.exceptAll(repacked).count() === 0)
    assert(repacked.exceptAll(packed).count() === 0)
    // packing is tight: average fill of non-final bins well above half capacity
    val fill = packed.groupBy("pack_group", "seq_id").agg(sum("n_tokens").as("t"))
      .agg(avg("t")).first().getDouble(0)
    assert(fill > 128.0, s"average bin fill $fill suggests broken packing")
  }
}
