package graft.ops

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

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
  * ==Memory shape (the 10⁶-term case)==
  * The automaton is ARRAY-BACKED so the advertised blocklist sizes actually
  * fit: transitions live in one sorted long array (`(node<<16)|char` keys,
  * CSR-sliced per node, binary-searched), failure links and outputs in flat
  * int arrays. Outputs use the dictionary-suffix-link form — each node stores
  * only the keyword ending EXACTLY there plus a link to the nearest failure
  * ancestor that ends one — so memory is O(total keyword chars), never the
  * O(nodes × depth) of materialized inherited output lists ("a","aa","aaa",…
  * would otherwise square). Steady state ≈ 17 bytes per trie node
  * ([[Automaton.footprintBytes]], asserted in KeywordTagSpec at 10⁵ terms):
  * a 10⁶-term × 10-char blocklist is ~170 MB per executor — a real but
  * payable broadcast+build cost, vs ~100 bytes/edge for per-node hash maps.
  * Construction peaks one open-addressed LongMap higher (~20 B/edge),
  * released before scanning.
  *
  * Output per row: the id column UNCHANGED IN TYPE (string/UUID ids pass
  * through — no silent cast-to-NULL collapse), `kw_total` (all match end
  * positions), `kw_distinct` (keywords hit at least once), `kw_list`
  * (comma-joined sorted distinct hits — a string, not an array, so external
  * engines hash it identically).
  */
object KeywordTag {

  /** Array-backed Aho–Corasick automaton; built per partition from the
    * broadcast keywords. See the object doc for the memory design.
    */
  private[graft] final class Automaton(keywords: Array[String]) {
    private def key(node: Int, c: Char): Long = (node.toLong << 16) | c

    // ---- trie build (ONE long-keyed open-addressed map, no per-node
    // objects), flattened to CSR: sorted edge keys + aligned targets + node
    // offsets. The build map is LOCAL to this block — garbage after
    // construction, so the steady state is the flat arrays alone.
    /** ownOut(v): keyword ending exactly at node v (-1: none; unique
      * post-dedup).
      */
    private val (n, ownOut, edgeKeys, edgeTargets) = {
      val sizeHint = math.max(16, keywords.iterator.map(_.length).sum)
      val trie = new mutable.LongMap[Int](sizeHint)
      val own = mutable.ArrayBuffer(-1)
      var count = 1
      keywords.zipWithIndex.foreach { case (kw, i) =>
        var node = 0
        kw.foreach { c =>
          node = trie.getOrElseUpdate(key(node, c),
            { own += -1; count += 1; count - 1 })
        }
        own(node) = i
      }
      val ks = trie.keysIterator.toArray
      java.util.Arrays.sort(ks)
      (count, own.toArray, ks, ks.map(trie(_)))
    }
    private val offsets: Array[Int] = {
      val off = new Array[Int](n + 1)
      edgeKeys.foreach(k => off((k >>> 16).toInt + 1) += 1)
      var i = 0
      while (i < n) { off(i + 1) += off(i); i += 1 }
      off
    }

    /** goto(node, c): binary search the node's CSR slice; -1 when absent. */
    private def goto(node: Int, c: Char): Int = {
      val k = key(node, c)
      var lo = offsets(node)
      var hi = offsets(node + 1) - 1
      while (lo <= hi) {
        val mid = (lo + hi) >>> 1
        val mk = edgeKeys(mid)
        if (mk == k) return edgeTargets(mid)
        else if (mk < k) lo = mid + 1
        else hi = mid - 1
      }
      -1
    }

    // ---- BFS failure links + dictionary suffix links
    private val fail = new Array[Int](n)
    /** Nearest failure ancestor that ends a keyword (-1: none) — the emit
      * chain, each hop a real match.
      */
    private val outLink = new Array[Int](n)
    locally {
      java.util.Arrays.fill(outLink, -1)
      val queue = new java.util.ArrayDeque[Integer](n min 1024)
      var e = offsets(0)
      while (e < offsets(1)) { queue.add(edgeTargets(e)); e += 1 }
      while (!queue.isEmpty) {
        val u = queue.poll().intValue()
        var i = offsets(u)
        while (i < offsets(u + 1)) {
          val c = (edgeKeys(i) & 0xffffL).toChar
          val v = edgeTargets(i)
          var f = fail(u)
          var g = goto(f, c)
          while (f != 0 && g < 0) { f = fail(f); g = goto(f, c) }
          fail(v) = if (g >= 0 && g != v) g else 0
          outLink(v) =
            if (ownOut(fail(v)) >= 0) fail(v) else outLink(fail(v))
          queue.add(v)
          i += 1
        }
      }
    }

    /** Steady-state byte footprint of the scan structures (the LongMap used
      * during construction is larger but unreachable after build).
      */
    def footprintBytes: Long =
      edgeKeys.length.toLong * 8 + edgeTargets.length.toLong * 4 +
        (n + 1).toLong * 4 + n.toLong * 4 * 3 // offsets, fail, outLink, ownOut

    def nodeCount: Int = n

    /** (total end-position matches, distinct keyword indices hit). */
    def scan(text: String): (Long, Array[Int]) = {
      var node = 0
      var total = 0L
      val seen = new Array[Boolean](keywords.length)
      var i = 0
      while (i < text.length) {
        val c = Character.toLowerCase(text.charAt(i))
        var g = goto(node, c)
        while (node != 0 && g < 0) { node = fail(node); g = goto(node, c) }
        node = if (g >= 0) g else 0
        var o = if (ownOut(node) >= 0) node else outLink(node)
        while (o >= 0) { total += 1; seen(ownOut(o)) = true; o = outLink(o) }
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
    // the id column passes through with its NATIVE type (a cast-to-long would
    // silently NULL string/UUID ids and collapse those rows onto one key)
    val idField = df.schema.fields.find(_.name.equalsIgnoreCase(idCol))
      .getOrElse(throw new IllegalArgumentException(
        s"tagKeywords: no id column '$idCol' in ${df.schema.fieldNames.mkString(", ")}"))
    // fold keywords EXACTLY as the scan folds text — per-char, locale-free
    // Character.toLowerCase (String.toLowerCase would apply locale and
    // multi-char rules: tr-TR dotless i, Greek final sigma — and never match)
    val kws = keywords.map(_.map(Character.toLowerCase)).distinct.toArray
    val bc = spark.sparkContext.broadcast(kws)
    val outSchema = StructType(Seq(
      StructField(idField.name, idField.dataType, idField.nullable),
      StructField("kw_total", LongType, nullable = false),
      StructField("kw_distinct", LongType, nullable = false),
      StructField("kw_list", StringType, nullable = false)))
    df.select(col(idCol), coalesce(col(textCol), lit("")).cast("string"))
      .mapPartitions { it =>
        lazy val ac = new Automaton(bc.value) // one build per partition
        it.map { r =>
          val (total, hits) = ac.scan(r.getString(1))
          Row(r.get(0), total, hits.length.toLong,
            hits.map(bc.value).sorted.mkString(","))
        }
      }(Encoders.row(outSchema))
  }
}
