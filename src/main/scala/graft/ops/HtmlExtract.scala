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
