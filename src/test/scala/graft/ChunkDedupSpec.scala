package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.ChunkDedup

class ChunkDedupSpec extends AnyFunSuite with SharedSpark {

  test("chunks: fixed-width word windows with a short tail, in document order") {
    import spark.implicits._
    val df = Seq((0L, "a b c d e f g")).toDF("doc_id", "text")
    val got = ChunkDedup.chunks(df, chunkWords = 3).orderBy("chunk_id")
      .as[(Long, Int, String)].collect().toSeq
    assert(got === Seq((0L, 0, "a b c"), (0L, 1, "d e f"), (0L, 2, "g")))
  }

  test("dedupChunks: over-replicated chunks keep exactly their first occurrence") {
    import spark.implicits._
    val df = Seq(
      (0L, "a b c d e f"),        // "a b c" first occurrence + unique "d e f"
      (1L, "a b c x y z"),        // duplicate chunk dropped, "x y z" survives
      (2L, "a b c"),              // entire doc is the duplicate → empty rebuild
      (3L, "unique words here")). // untouched
      toDF("doc_id", "text")
    val got = ChunkDedup.dedupChunks(df, chunkWords = 3, maxOccurrences = 1)
      .orderBy("doc_id")
      .as[(Long, String, Long, Long)].collect().toSeq
    assert(got === Seq(
      (0L, "a b c d e f", 2L, 2L),
      (1L, "x y z", 2L, 1L),
      (2L, "", 1L, 0L),
      (3L, "unique words here", 1L, 1L)))
  }

  test("dedupChunks: maxOccurrences above the count leaves everything in place") {
    import spark.implicits._
    val df = Seq((0L, "a b c"), (1L, "a b c"), (2L, "a b c")).toDF("doc_id", "text")
    val got = ChunkDedup.dedupChunks(df, chunkWords = 3, maxOccurrences = 3)
      .orderBy("doc_id")
      .as[(Long, String, Long, Long)].collect().toSeq
    assert(got === Seq((0L, "a b c", 1L, 1L), (1L, "a b c", 1L, 1L),
      (2L, "a b c", 1L, 1L)))
  }

  test("dedupChunks invariants on real docs: kept ⊆ chunks, survivors unique-or-first") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val flagged = ChunkDedup.flaggedChunks(docs, chunkWords = 10)
    val bad = flagged.filter(
      org.apache.spark.sql.functions.expr("NOT kept AND corpus_count <= 1"))
    assert(bad.count() === 0, "a unique chunk was dropped")
    val rebuilt = ChunkDedup.dedupChunks(docs, chunkWords = 10)
    assert(rebuilt.count() === docs.count(), "every doc must survive, possibly empty")
    assert(rebuilt.filter(
      org.apache.spark.sql.functions.col("n_kept") >
        org.apache.spark.sql.functions.col("n_chunks")).count() === 0)
  }
}
