package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** HTML → training text extraction — the first step of every web-crawl
  * pipeline (CCNet / RefinedWeb / trafilatura territory): strip markup,
  * decode entities, and surface the structural quality signals (tag density,
  * anchor count, text-to-markup ratio) that downstream filters cut on.
  *
  * Spark-first shape: the whole extraction is a fixed chain of
  * `regexp_replace` / `regexp_extract_all` expressions — per-row map work in
  * whole-stage codegen, zero shuffle, linear in the HTML bytes. Every pattern
  * stays inside the RE2-compatible subset ((?is) flags, lazy `.*?`, character
  * classes — no backreferences or lookaround), so any engine replays the
  * extraction byte-for-byte; the DuckDB oracle for `q_html_extract` runs the
  * identical chain.
  *
  * Deliberately NOT a DOM parser: boilerplate-grade extraction at 100 TB is
  * bandwidth-bound string work, and a per-row parser (a UDF over jsoup et al.)
  * would leave codegen and serialize every row through the JVM object world.
  * The regex chain handles the well-formed-ish HTML a crawl pipeline actually
  * filters on; documents that need real DOM fidelity route to a
  * `mapPartitions` decoder the way [[Multimodal]] does binary codecs.
  */
object HtmlExtract {

  /** Script/style/noscript blocks and comments vanish BEFORE tag stripping —
    * their text content is code, not prose, and must not leak into the text.
    */
  private def dropNonContent(c: Column): Column = {
    val noScript = regexp_replace(c, "(?is)<script[^>]*>.*?</script>", " ")
    val noStyle = regexp_replace(noScript, "(?is)<style[^>]*>.*?</style>", " ")
    val noNoscript =
      regexp_replace(noStyle, "(?is)<noscript[^>]*>.*?</noscript>", " ")
    regexp_replace(noNoscript, "(?s)<!--.*?-->", " ")
  }

  /** The five XML entities plus the two numeric spellings crawl text actually
    * carries in volume; `&amp;` decodes LAST so `&amp;lt;` yields the literal
    * `&lt;` instead of double-decoding to `<` (the classic ordering bug).
    * Decoding runs AFTER tag stripping so an encoded `&lt;script&gt;` can
    * never materialize a tag the stripper already passed.
    */
  private def decodeEntities(c: Column): Column = {
    val nbsp = regexp_replace(c, "&nbsp;", " ")
    val lt = regexp_replace(nbsp, "&lt;", "<")
    val gt = regexp_replace(lt, "&gt;", ">")
    val quot = regexp_replace(gt, "&quot;", "\"")
    val apos = regexp_replace(quot, "&#39;", "'")
    regexp_replace(apos, "&amp;", "&")
  }

  /** Visible text of an HTML string: non-content blocks dropped, every
    * remaining tag replaced by a space (so adjacent text nodes never glue),
    * entities decoded, whitespace runs collapsed, ends trimmed.
    */
  def htmlToText(c: Column): Column = {
    val noTags = regexp_replace(dropNonContent(c), "(?s)<[^>]*>", " ")
    // explicit whitespace class, not \s: Java's \s includes \x0B, RE2's does
    // not — the one place this chain could diverge across engines
    trim(regexp_replace(decodeEntities(noTags), "[ \\t\\n\\f\\r]+", " "))
  }

  /** `<title>` text (entity-decoded, trimmed); empty string when absent. */
  def title(c: Column): Column =
    trim(decodeEntities(
      regexp_extract(c, "(?is)<title[^>]*>(.*?)</title>", 1)))

  /** Block-boundary tag pattern: any opening or closing block-level tag
    * splits the page into candidate content blocks (alternation ordered
    * longest-first so Java backtracking and RE2's simultaneous simulation
    * pick the same alternative).
    */
  private[graft] val blockTagPattern: String =
    "(?i)</?(blockquote|figcaption|fieldset|section|article|header|footer|" +
      "thead|tbody|figure|table|aside|main|form|div|nav|pre|h[1-6]|ul|ol|" +
      "dl|dt|dd|li|tr|td|th|br|hr|p)\\b[^>]*>"

  /** Visible text of one block: inline tags stripped, entities decoded,
    * whitespace collapsed — [[htmlToText]] minus the non-content drop (which
    * ran on the whole page before block splitting).
    */
  private def blockText(b: Column): Column =
    trim(regexp_replace(decodeEntities(
      regexp_replace(b, "(?s)<[^>]*>", " ")), "[ \\t\\n\\f\\r]+", " "))

  /** Block-level MAIN-CONTENT extraction — the boilerplate-removal step
    * (boilerpipe / CCNet grade) that whole-page [[extract]] signals only
    * approximate: split the page on block-level tags, score each block's
    * text mass and link density, keep only dense prose blocks, and rebuild
    * the document from the survivors in order. Nav bars, link lists, and
    * chrome footers are exactly the low-word-count / high-link-density
    * blocks the rule cuts.
    *
    * Keep rule (deterministic, engine-replayable): a block survives iff its
    * visible text has ≥ `minWords` whitespace-separated words AND its link
    * density ≤ `maxLinkDensity`, where link density = (text chars lost when
    * `<a>…</a>` spans are removed) / text chars — the boilerpipe linked-text
    * fraction computed with the same regex-chain discipline as the rest of
    * this file (no DOM parser; see the file scaladoc for why). All inputs to
    * the density division are exact integers, so the comparison is
    * bit-stable across engines.
    *
    * Zero shuffle: split, per-block scoring, filtering, and reassembly are
    * array higher-order functions over each row — scan-speed map work in
    * whole-stage codegen at any corpus size.
    *
    * Output: `(id, main_text, n_blocks, n_kept)`; `n_blocks` counts blocks
    * with any visible text.
    */
  def mainContent(df: DataFrame, idCol: String = "doc_id",
      htmlCol: String = "html", minWords: Int = 5,
      maxLinkDensity: Double = 0.33): DataFrame = {
    require(minWords >= 1, "minWords must be >= 1")
    val h = coalesce(col(htmlCol), lit(""))
    val blocks = split(
      regexp_replace(dropNonContent(h), blockTagPattern, ""), "")
    // score each block ONCE: the two regex chains (text, text-sans-anchors)
    // run exactly once per block inside one transform, and the scored array
    // MATERIALIZES as an attribute before any consumer touches it — array
    // higher-order functions are interpreted (no whole-stage codegen, no
    // common-subexpression elimination), so referencing the transform
    // expression from the three consumers below would re-run every regex
    // chain per consumer (the tokenPairCounts lesson; a naive formulation
    // re-derived the text ~6x per block)
    val scored = transform(blocks, b => struct(
      blockText(b).as("t"),
      blockText(regexp_replace(b, "(?is)<a[^>]*>.*?</a>", " ")).as("tn")))
    def isKept(s: Column): Column = {
      val t = s.getField("t")
      val linked = greatest(length(t) - length(s.getField("tn")), lit(0))
      t =!= "" && size(split(t, " ")) >= minWords &&
        linked.cast("double") / greatest(length(t), lit(1)).cast("double") <=
          maxLinkDensity
    }
    df.select(col(idCol), scored.as("__scored"))
      .select(col(idCol),
        array_join(transform(filter(col("__scored"), s => isKept(s)),
          s => s.getField("t")), " ").as("main_text"),
        size(filter(col("__scored"), s => s.getField("t") =!= ""))
          .as("n_blocks"),
        size(filter(col("__scored"), s => isKept(s))).as("n_kept"))
  }

  /** Extract text + structural quality signals from an HTML column:
    * `(id, title, text, html_len, text_len, text_ratio, tag_count,
    * anchor_count)`. `text_ratio` (text bytes per HTML byte) and
    * `anchor_count` are the boilerplate discriminators — link farms and nav
    * shells score near zero ratio with high anchor counts, article pages the
    * reverse (the link-density heuristic of boilerplate removal literature).
    */
  def extract(df: DataFrame, idCol: String = "doc_id",
      htmlCol: String = "html"): DataFrame = {
    val h = coalesce(col(htmlCol), lit(""))
    val text = htmlToText(h)
    df.select(
      col(idCol),
      title(h).as("title"),
      text.as("text"),
      length(h).as("html_len"),
      length(text).as("text_len"),
      when(length(h) > 0,
        round(length(text).cast("double") / length(h), 4))
        .otherwise(0.0).as("text_ratio"),
      size(regexp_extract_all(h, lit("<[^>]*>"), lit(0))).as("tag_count"),
      size(regexp_extract_all(h, lit("(?i)<a[ \\t\\n\\f\\r>]"), lit(0)))
        .as("anchor_count"))
  }
}
