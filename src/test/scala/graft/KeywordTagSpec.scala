package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.KeywordTag

/** Aho–Corasick keyword tagging: exact end-position match semantics
  * (overlapping, nested, case-insensitive), determinism, zero-shuffle plan.
  */
class KeywordTagSpec extends AnyFunSuite with SharedSpark {

  import spark.implicits._

  private def tag(rows: Seq[(Long, String)], kws: Seq[String]) =
    KeywordTag.tagKeywords(rows.toDF("doc_id", "text"), kws)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3))).toMap

  test("hand-checked counts: overlap, nesting, case, misses") {
    val out = tag(Seq(
      (1L, "aaa"),                 // "aa" ends at positions 2 and 3 → 2 hits
      (2L, "the Window wins"),     // "win" ×2 (inside Window, wins), "window" ×1
      (3L, "no matches here!"),    // nothing
      (4L, "AA aa aA")),           // case-insensitive: three "aa"
      Seq("aa", "win", "window"))
    assert(out(1L) === ((2L, 1L, "aa")))
    assert(out(2L) === ((3L, 2L, "win,window")))
    assert(out(3L) === ((0L, 0L, "")))
    assert(out(4L) === ((3L, 1L, "aa")))
  }

  test("single-char keyword counts every occurrence; keyword equal to text") {
    val out = tag(Seq((1L, "banana"), (2L, "b")), Seq("a", "b", "banana"))
    assert(out(1L) === ((5L, 3L, "a,b,banana"))) // 3×a + 1×b + 1×banana
    assert(out(2L) === ((1L, 1L, "b")))
  }

  test("null text, empty text, duplicate keywords deduplicate") {
    val df = Seq((1L, null.asInstanceOf[String]), (2L, "")).toDF("doc_id", "text")
    val out = KeywordTag.tagKeywords(df, Seq("x", "X", "x"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out === Map(1L -> 0L, 2L -> 0L))
  }

  test("corpus: deterministic across partitionings, matches contains() ground truth") {
    val docs = Tables.documents(spark, sf)
    val kws = Seq("merge", "window", "stream")
    val a = KeywordTag.tagKeywords(docs, kws)
    val b = KeywordTag.tagKeywords(docs.repartition(13), kws)
    assert(a.exceptAll(b).count() === 0 && b.exceptAll(a).count() === 0)
    // distinct-hit flags agree with per-keyword contains() on every doc
    import org.apache.spark.sql.functions._
    val truth = docs.select(col("doc_id"),
      kws.map(k => when(lower(col("text")).contains(k), 1).otherwise(0))
        .reduce(_ + _).cast("long").as("d"))
    val joined = a.select(col("doc_id"), col("kw_distinct")).join(truth, "doc_id")
      .filter(col("kw_distinct") =!= col("d"))
    assert(joined.count() === 0)
  }

  test("plan: zero shuffle — one mapPartitions pass over the scan") {
    val plan = KeywordTag.tagKeywords(Tables.documents(spark, sf), Seq("merge"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"tagging must not shuffle:\n$plan")
  }

  test("string/UUID ids pass through natively — no silent cast-to-NULL collapse") {
    val df = Seq(("doc-a", "win win"), ("9f0e8d7c-uuid", "nothing"))
      .toDF("doc_id", "text")
    val out = KeywordTag.tagKeywords(df, Seq("win"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out === Map("doc-a" -> 2L, "9f0e8d7c-uuid" -> 0L))
    // and the schema keeps the native type
    assert(KeywordTag.tagKeywords(df, Seq("win")).schema("doc_id").dataType
      === org.apache.spark.sql.types.StringType)
  }

  test("10^5-term automaton: bounded array footprint, correct scan") {
    // 100k distinct terms, avg ~9 chars — the advertised blocklist scale
    val terms = (0 until 100000).map(i => s"term${i}x${i % 97}")
    val ac = new KeywordTag.Automaton(
      terms.map(_.map(Character.toLowerCase)).distinct.toArray)
    // memory bound: steady state must stay within ~24 bytes per trie node
    // (edge keys 8B + targets 4B + offsets/fail/outLink/ownOut 4B each, CSR
    // arrays ≈ nodes) — the per-node-HashMap design was ~100 B per EDGE
    val perNode = ac.footprintBytes.toDouble / ac.nodeCount
    assert(perNode < 30.0,
      s"footprint $perNode B/node over bound (${ac.footprintBytes} B total)")
    // well under what 10^6 terms × 10 chars extrapolates to ~300 MB
    assert(ac.footprintBytes < 40L * 1000 * 1000,
      s"10^5-term automaton took ${ac.footprintBytes} B")
    // scan correctness at this scale: nested term0x0 endings inside longer ids
    val (total, hits) = ac.scan("term123x26 then term99999x89 and term9x9!")
    assert(hits.map(terms).toSet === Set("term123x26", "term99999x89", "term9x9"))
    assert(total === 3L)
    // dictionary-suffix emission: a term that is a suffix path of another
    val ac2 = new KeywordTag.Automaton(Array("a", "aa", "aaa"))
    val (t2, h2) = ac2.scan("aaaa")
    // ends: "a"×4, "aa"×3, "aaa"×2 — 9 matches, all 3 terms
    assert(t2 === 9L && h2.length === 3)
  }
}
