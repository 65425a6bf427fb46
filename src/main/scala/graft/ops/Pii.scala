package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII detection and redaction over a text corpus — the scrubbing pass every
  * large-scale training-data pipeline runs before release (C4/CCNet strip
  * emails and IPs; responsible-release checklists add phone/SSN/card shapes).
  *
  * Spark shape: pure per-row `regexp_count` / `regexp_replace` chains —
  * native codegen'd expressions, ZERO shuffle, no UDF. At 100 TB this is a
  * map-only pass whose cost is the scan itself; it composes with commit-level
  * pruning and lands redacted text via the ordinary write paths.
  *
  * Pattern philosophy: conservative, deterministic, ASCII-anchored SHAPES —
  * an email-looking token, a dotted quad, a 3-3-4 phone, an SSN triplet, a
  * 16-digit card grouping. Shape matching has false positives (a dotted quad
  * need not be an IP) and false negatives (no Luhn check, no international
  * phone grammar) by design: the patterns are auditable, replayable in any
  * regex engine (they avoid lookarounds and backreferences, so Java and RE2
  * agree), and never nondeterministic. Callers needing jurisdiction-grade
  * recall plug their own `patterns` map — the plumbing is pattern-agnostic.
  *
  * Order matters and is fixed: emails redact BEFORE ips/phones (an email's
  * host can contain a dotted quad; a phone-shaped fragment can sit inside a
  * longer digit run already consumed by the card pattern). [[redact]] applies
  * the chain in [[defaultPatterns]] order.
  */
object Pii {

  /** (type tag, regex, replacement token) — insertion-ordered. */
  val defaultPatterns: Seq[(String, String, String)] = Seq(
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    ("card", "\\b\\d{4}[- ]\\d{4}[- ]\\d{4}[- ]\\d{4}\\b", "<CARD>"),
    ("ssn", "\\b\\d{3}-\\d{2}-\\d{4}\\b", "<SSN>"),
    ("phone", "\\b\\d{3}[-.]\\d{3}[-.]\\d{4}\\b", "<PHONE>"),
    ("ip", "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b", "<IP>"))

  /** Per-row PII hit counts, one `pii_<type>` column per pattern plus a
    * `pii_total`; detection counts are on the ORIGINAL text (no masking
    * interplay), so `pii_total` can exceed the number of tokens [[redact]]
    * substitutes when shapes nest (an IP inside an email). Null text counts 0.
    */
  def detect(df: DataFrame, textCol: String = "text",
      patterns: Seq[(String, String, String)] = defaultPatterns): DataFrame = {
    val t = coalesce(col(textCol).cast("string"), lit(""))
    val counted = patterns.foldLeft(df) { case (acc, (tag, re, _)) =>
      acc.withColumn(s"pii_$tag", regexp_count(t, lit(re)))
    }
    counted.withColumn("pii_total",
      patterns.map(p => col(s"pii_${p._1}")).reduce(_ + _))
  }

  /** The text with every pattern substituted by its token, applied in
    * [[defaultPatterns]] order (earlier redactions shield later patterns from
    * matching inside already-redacted spans). Adds `<textCol>_redacted`;
    * original column untouched. Null text stays null.
    */
  def redact(df: DataFrame, textCol: String = "text",
      patterns: Seq[(String, String, String)] = defaultPatterns): DataFrame = {
    val out = patterns.foldLeft(col(textCol).cast("string")) {
      case (acc: Column, (_, re, token)) => regexp_replace(acc, re, token)
    }
    df.withColumn(s"${textCol}_redacted", out)
  }
}
