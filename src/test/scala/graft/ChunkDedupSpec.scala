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

  test("dedupSentences: boilerplate sentence survives only at its first occurrence") {
    import spark.implicits._
    val df = Seq(
      (0L, "All rights reserved. Original thought one."),
      (1L, "All rights reserved. Different body here!"),
      (2L, "All rights reserved."), // whole doc is the boilerplate → empty
      (3L, "No license at all?"),   // untouched
      (4L, "")).                    // no sentences → absent from the output
      toDF("doc_id", "text")
    val got = ChunkDedup.dedupSentences(df, maxOccurrences = 1)
      .orderBy("doc_id")
      .as[(Long, String, Long, Long)].collect().toSeq
    assert(got === Seq(
      (0L, "All rights reserved. Original thought one.", 2L, 2L),
      (1L, "Different body here!", 2L, 1L),
      (2L, "", 1L, 0L),
      (3L, "No license at all?", 1L, 1L)))
    // the skew cap changes the plan, never the answer
    val capped = ChunkDedup.dedupSentences(df, maxOccurrences = 1,
        maxSentenceDf = Some(2L))
      .orderBy("doc_id").as[(Long, String, Long, Long)].collect().toSeq
    assert(capped === got)
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

  test("property: random corpora — each duplicated chunk keeps exactly one copy") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    // small vocabulary forces chunk collisions; varying doc lengths exercise tails
    for (trial <- 1 to 3) {
      val docs = (0L until 40L).map { id =>
        val words = Seq.fill(1 + rnd.nextInt(12))(s"w${rnd.nextInt(4)}")
        (id, words.mkString(" "))
      }
      val df = docs.toDF("doc_id", "text").repartition(1 + trial)
      val flagged = ChunkDedup.flaggedChunks(df, chunkWords = 2)
      val keptPerDup = flagged
        .filter(org.apache.spark.sql.functions.col("corpus_count") > 1)
        .groupBy("chunk_text")
        .agg(org.apache.spark.sql.functions.sum(
          org.apache.spark.sql.functions.when(
            org.apache.spark.sql.functions.col("kept"), 1L).otherwise(0L)).as("n_kept"))
        .collect()
      assert(keptPerDup.nonEmpty, s"trial $trial: vocabulary too wide, test vacuous")
      keptPerDup.foreach(r =>
        assert(r.getLong(1) === 1L,
          s"trial $trial: duplicated chunk '${r.getString(0)}' kept ${r.getLong(1)} copies"))
      // a maxOccurrences above any count is the identity transform
      val roundTrip = ChunkDedup.dedupChunks(df, chunkWords = 2,
          maxOccurrences = Long.MaxValue)
        .select("doc_id", "clean_text")
        .as[(Long, String)].collect().sortBy(_._1).toSeq
      assert(roundTrip === docs.sortBy(_._1),
        s"trial $trial: identity reassembly must reproduce every document")
    }
  }

  test("maxChunkDf: a 50%-df boilerplate chunk takes the broadcast path, same answer") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    // one universal header chunk in half the docs — the join-key skew case —
    // plus organic low-df duplicates that must stay on the shuffle path
    val docs = (0L until 200L).map { id =>
      val header = if (id % 2 == 0) "universal header boilerplate " else ""
      val body = s"body w${id % 29} w${id % 31}"
      (id, header + body)
    }
    val df = docs.toDF("doc_id", "text").repartition(8)
    val uncapped = ChunkDedup.flaggedChunks(df, chunkWords = 3)
    val capped = ChunkDedup.flaggedChunks(df, chunkWords = 3,
      maxChunkDf = Some(20L))
    // the cap changes the PLAN, never the answer
    val key = Seq("doc_id", "chunk_id")
    assert(capped.orderBy(key.map(col): _*).collect().toSeq ===
      uncapped.orderBy(key.map(col): _*).collect().toSeq)
    // the hot chunk really is over the cap (the test is non-vacuous)…
    assert(capped.filter(col("corpus_count") > 20).count() === 100L)
    // …and the capped plan routes it through a broadcast join: the shuffle
    // join's probe side carries only under-cap keys, so its max per-key row
    // count is bounded by maxChunkDf
    val plan = capped.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"capped path must broadcast the hot chunk set:\n$plan")

    // a cap below maxOccurrences is self-contradictory
    intercept[IllegalArgumentException] {
      ChunkDedup.flaggedChunks(df, chunkWords = 3, maxOccurrences = 30,
        maxChunkDf = Some(20L))
    }
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
