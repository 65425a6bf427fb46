package graft.ops

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._

/** Multi-keyword tagging for blocklist/allowlist curation: count and flag every
  * occurrence of a keyword set in each document in ONE text pass.
  *
  * The pipeline problem: safety blocklists and topic taggers run 10³–10⁶ terms.
  * The naive formulation — one `contains`/`rlike` per term — scans the corpus
  * once PER TERM (K × 100 TB), and a single mega-regex alternation backtracks
  * unpredictably. The classical answer is an Aho–Corasick automaton (Aho &
  * Corasick 1975): all keywords compile into one trie with failure links, and a
  * single left-to-right pass over each document reports every match of every
  * keyword — O(text + matches) regardless of K.
  *
  * Spark shape: the keyword array ships as ONE broadcast; each partition builds
  * the automaton once (lazily, at first row) and streams its documents through
  * it — `mapPartitions`, zero shuffle, cost = one scan of the corpus at any K.
  * Matching is case-insensitive (the blocklist convention) and counts every END
  * POSITION of every keyword — overlapping matches and nested keywords
  * ("win" inside "window") each count, the automaton's natural semantics, which
  * the contract oracle replays positionally.
  *
  * Output per row: `kw_total` (all match end positions), `kw_distinct`
  * (keywords hit at least once), `kw_list` (comma-joined sorted distinct hits —
  * a string, not an array, so external engines hash it identically).
  */
object KeywordTag {

  /** Aho–Corasick automaton; built per partition from the broadcast keywords. */
  private final class Automaton(keywords: Array[String]) {
    private val children = mutable.ArrayBuffer(mutable.Map.empty[Char, Int])
    private val out = mutable.ArrayBuffer(List.empty[Int])
    private val fail = mutable.ArrayBuffer(0)

    keywords.zipWithIndex.foreach { case (kw, i) =>
      var node = 0
      kw.foreach { c =>
        node = children(node).getOrElseUpdate(c, {
          children += mutable.Map.empty[Char, Int]
          out += Nil
          fail += 0
          children.length - 1
        })
      }
      out(node) ::= i
    }
    // BFS failure links; each node's output inherits its failure node's output,
    // so emitting at a node reports every keyword ending at this position
    private val queue = mutable.Queue.empty[Int]
    children(0).values.foreach(queue.enqueue(_))
    while (queue.nonEmpty) {
      val u = queue.dequeue()
      children(u).foreach { case (c, v) =>
        var f = fail(u)
        while (f != 0 && !children(f).contains(c)) f = fail(f)
        fail(v) = children(f).get(c).filter(_ != v).getOrElse(0)
        out(v) :::= out(fail(v))
        queue.enqueue(v)
      }
    }

    /** (total end-position matches, distinct keyword indices hit). */
    def scan(text: String): (Long, Array[Int]) = {
      var node = 0
      var total = 0L
      val seen = new Array[Boolean](keywords.length)
      var i = 0
      while (i < text.length) {
        val c = Character.toLowerCase(text.charAt(i))
        while (node != 0 && !children(node).contains(c)) node = fail(node)
        node = children(node).getOrElse(c, 0)
        var os = out(node)
        while (os.nonEmpty) { total += 1; seen(os.head) = true; os = os.tail }
        i += 1
      }
      (total, seen.indices.filter(seen).toArray)
    }
  }

  def tagKeywords(df: DataFrame, keywords: Seq[String],
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    require(keywords.nonEmpty, "tagKeywords needs at least one keyword")
    require(keywords.forall(_.nonEmpty), "empty keyword")
    val spark = df.sparkSession
    import spark.implicits._
    // fold keywords EXACTLY as the scan folds text — per-char, locale-free
    // Character.toLowerCase (String.toLowerCase would apply locale and
    // multi-char rules: tr-TR dotless i, Greek final sigma — and never match)
    val kws = keywords.map(_.map(Character.toLowerCase)).distinct.toArray
    val bc = spark.sparkContext.broadcast(kws)
    df.select(col(idCol).cast("long"), coalesce(col(textCol), lit("")))
      .as[(Long, String)]
      .mapPartitions { it =>
        lazy val ac = new Automaton(bc.value) // one build per partition
        it.map { case (id, text) =>
          val (total, hits) = ac.scan(text)
          (id, total, hits.length.toLong,
            hits.map(bc.value).sorted.mkString(","))
        }
      }(Encoders.product[(Long, Long, Long, String)])
      .toDF(idCol, "kw_total", "kw_distinct", "kw_list")
  }
}
