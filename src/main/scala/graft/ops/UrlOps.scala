package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL-level corpus curation: domain extraction and suffix-aware blocklist
  * filtering — the first gate a web-crawl pipeline applies (Common-Crawl-style
  * curation drops ad/tracker/spam domains before any text is even read).
  *
  * Spark shape:
  *  - [[extractDomain]] is ONE codegen'd `regexp_extract` (no UDF, no
  *    parse_url round-trip) — lowercased host, ports/userinfo/paths stripped;
  *    scheme-less or malformed URLs yield NULL (callers decide their fate,
  *    nothing is silently guessed);
  *  - [[filterBlockedDomains]] must match SUBDOMAINS (`x.ads.example.com` is
  *    blocked by `ads.example.com`), which naively is a LIKE-join — a nested
  *    loop. Instead each row explodes its domain's ≤ L label-suffixes
  *    (`a.b.c` → `a.b.c`, `b.c`, `c`) and anti-joins the blocklist by
  *    EQUALITY: a broadcast hash join at any corpus size, rows × L probe keys,
  *    zero cartesian. The blocklist side is a DataFrame — thousands to
  *    millions of entries all broadcast fine (a 1M-domain list is ~30 MB).
  *
  * At 100 TB the filter is scan-speed: domain extraction fuses into the scan
  * projection and the anti-join never shuffles the corpus. Registrable-domain
  * grouping (public-suffix-list semantics, "co.uk" ≠ a registrable suffix) is
  * deliberately out of scope — suffix matching against an explicit blocklist
  * needs no PSL and stays engine-portable.
  */
object UrlOps {

  /** Lowercased host of `urlCol` as `domain`: `scheme://[user@]HOST[:port]/...`.
    * NULL when no `scheme://host` shape is present.
    */
  def extractDomain(df: DataFrame, urlCol: String = "url"): DataFrame =
    df.withColumn("domain", domainOf(col(urlCol)))

  private[ops] def domainOf(url: Column): Column = {
    val host = regexp_extract(lower(url),
      "^[a-z][a-z0-9+.-]*://(?:[^/@?#]*@)?([^/:?#]+)", 1)
    when(host === "", lit(null)).otherwise(host)
  }

  /** Drop every row whose domain — or ANY parent domain — appears in
    * `blocklist` (a one-column DataFrame of lowercase domains). Rows whose URL
    * yields no domain are KEPT (nothing matched; drop them separately if
    * policy demands). Adds nothing to the schema.
    *
    * Only DISTINCT domains explode into suffixes — never the corpus rows: the
    * shape is one distinct-domain aggregate (map-side combined, cardinality =
    * distinct hosts, orders of magnitude below rows), a broadcast equality
    * semi-join of their ≤ L label-suffixes against the blocklist, and one
    * anti-join of the corpus on the matched-domain set (AQE broadcasts it
    * when small — the overwhelmingly common case — and falls back to a
    * shuffle join when a spam-heavy crawl makes it huge; forcing broadcast
    * here would be the OOM shape).
    */
  def filterBlockedDomains(df: DataFrame, blocklist: DataFrame,
      urlCol: String = "url"): DataFrame = {
    val entry = blocklist.columns.head
    val keyed = df.withColumn("_g_dom", domainOf(col(urlCol)))
    val blocked = broadcast(blocklist
      .select(lower(trim(col(entry))).as("_g_blocked")).dropDuplicates())
    // distinct domains → suffix explode (a.b.c → a.b.c, b.c, c) → equality
    // semi-join: the domains with a blocked suffix
    val hit = keyed.select(col("_g_dom")).filter(col("_g_dom").isNotNull)
      .dropDuplicates()
      .withColumn("_g_suffix", explode(
        expr("transform(sequence(0, size(split(_g_dom, '[.]')) - 1), " +
          "i -> array_join(slice(split(_g_dom, '[.]'), i + 1, " +
          "size(split(_g_dom, '[.]'))), '.'))")))
    val hitDomains = hit.join(blocked,
        hit("_g_suffix") === blocked("_g_blocked"), "left_semi")
      .select(col("_g_dom")).dropDuplicates()
    keyed.join(hitDomains, Seq("_g_dom"), "left_anti").drop("_g_dom")
  }
}
