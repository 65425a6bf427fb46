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

  test("length buckets: exact power-of-two edges, batch size respected, deterministic") {
    val rows = Seq(
      (1L, 1L), (2L, 15L), (3L, 16L),   // all clamp/fit to cap 16
      (4L, 17L),                         // 17 -> 32
      (5L, 64L),                         // exactly 64 -> 64 (edge case)
      (6L, 65L),                         // 65 -> 128
      (7L, 5000L))                       // clamped to 1024
      .toDF("doc_id", "n_tokens")
    val b = Packing.lengthBuckets(rows, batchSize = 2, minCap = 16, maxCap = 1024)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("bucket_cap"), r.getAs[String]("batch_id"),
          r.getAs[Long]("padding"))).toMap
    assert(b(1L)._1 === 16L && b(2L)._1 === 16L && b(3L)._1 === 16L)
    assert(b(4L)._1 === 32L)
    assert(b(5L)._1 === 64L) // a float log2 ulp error would put this in 128
    assert(b(6L)._1 === 128L)
    assert(b(7L)._1 === 1024L)
    assert(b(7L)._3 === 0L) // padding never negative after clamping
    assert(b(1L)._3 === 15L)
    // cap-16 bucket holds docs 1,2,3 with batchSize 2: two batches (shard 0 —
    // the default numShards = 1 puts every row in shard 0)
    assert(b(1L)._2 === "16#0#0" && b(2L)._2 === "16#0#0" && b(3L)._2 === "16#0#1")
    // deterministic across reruns
    val again = Packing.lengthBuckets(rows, batchSize = 2, minCap = 16, maxCap = 1024)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("bucket_cap"), r.getAs[String]("batch_id"),
          r.getAs[Long]("padding"))).toMap
    assert(again === b)
  }

  test("length buckets: shard salt preserves caps/padding, batch size, determinism") {
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"),
        size(split(trim(col("text")), "\\s+")).cast("long").as("n_tokens"))
    val flat = Packing.lengthBuckets(docs, batchSize = 8, minCap = 16, maxCap = 1024)
    val salted = Packing.lengthBuckets(docs, batchSize = 8, minCap = 16,
      maxCap = 1024, numShards = 4)
    // salting never changes what a row pads to — bucket_cap and padding are
    // per-row functions of n_tokens, identical with and without the salt
    val flatCaps = flat.select("doc_id", "bucket_cap", "padding")
    val saltedCaps = salted.select("doc_id", "bucket_cap", "padding")
    assert(flatCaps.exceptAll(saltedCaps).count() === 0)
    assert(saltedCaps.exceptAll(flatCaps).count() === 0)
    // batches respect batchSize and never span (bucket, shard): every batch_id
    // holds ≤ 8 rows of a single bucket_cap
    val bad = salted.groupBy("batch_id")
      .agg(count(lit(1)).as("n"), countDistinct("bucket_cap").as("caps"))
      .filter(col("n") > 8 || col("caps") =!= 1)
    assert(bad.count() === 0)
    // the salt actually fans out: more distinct shard prefixes than buckets
    val shards = salted.select(split(col("batch_id"), "#").as("p"))
      .select(concat_ws("#", element_at(col("p"), 1), element_at(col("p"), 2))
        .as("bucket_shard")).distinct().count()
    val buckets = salted.select("bucket_cap").distinct().count()
    assert(shards > buckets, s"salt produced $shards (bucket, shard) keys for $buckets buckets")
    // deterministic under a different input partitioning
    val again = Packing.lengthBuckets(docs.repartition(17), batchSize = 8,
      minCap = 16, maxCap = 1024, numShards = 4)
    assert(salted.exceptAll(again).count() === 0)
    assert(again.exceptAll(salted).count() === 0)
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
