package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.HtmlExtract

/** HTML → text extraction: stripping, entity decoding order, and the
  * structural quality signals boilerplate filters cut on.
  */
class HtmlExtractSpec extends AnyFunSuite with SharedSpark {

  private def one(html: String) = {
    import spark.implicits._
    HtmlExtract.extract(Seq((1L, html)).toDF("doc_id", "html")).head()
  }

  test("scripts, styles and comments never leak into the text") {
    val r = one("<html><head><script>var hidden = 'SECRET';</script>" +
      "<style>.x{color:red}</style></head>" +
      "<body>visible <!-- note: CHROME --> words</body></html>")
    assert(r.getAs[String]("text") == "visible words")
  }

  test("entities decode after stripping, &amp; last — no double decode") {
    // &amp;lt; must yield the literal string "&lt;", NOT "<"; an encoded
    // script tag must never materialize as a strippable (or parsable) tag
    val r = one("<p>a &amp;lt; b &lt;script&gt; &quot;q&quot; &#39;s&#39;&nbsp;end</p>")
    assert(r.getAs[String]("text") == "a &lt; b <script> \"q\" 's' end")
  }

  test("title extracted and decoded; block boundaries never glue words") {
    val r = one("<html><head><title> Tom &amp; Co </title></head>" +
      "<body><p>one</p><p>two</p></body></html>")
    assert(r.getAs[String]("title") == "Tom & Co")
    assert(r.getAs[String]("text") == "Tom & Co one two")
  }

  test("structural signals: tag/anchor counts and text ratio") {
    val html = "<div><a href=\"/\">Home</a><a\nhref=\"/b\">B</a><p>body text</p></div>"
    val r = one(html)
    assert(r.getAs[Int]("anchor_count") == 2) // incl. the newline-split tag
    assert(r.getAs[Int]("tag_count") == 8)
    assert(r.getAs[Int]("html_len") == html.length)
    val expectText = "Home B body text" // tags become spaces, then collapse
    assert(r.getAs[String]("text") == expectText)
    assert(r.getAs[Double]("text_ratio") ==
      BigDecimal(expectText.length.toDouble / html.length)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("null and empty html extract to empty text with zeroed signals") {
    import spark.implicits._
    val rows = HtmlExtract.extract(
        Seq((1L, null.asInstanceOf[String]), (2L, "")).toDF("doc_id", "html"))
      .orderBy("doc_id").collect()
    rows.foreach { r =>
      assert(r.getAs[String]("text") == "" && r.getAs[String]("title") == "")
      assert(r.getAs[Int]("text_len") == 0 && r.getAs[Double]("text_ratio") == 0.0)
      assert(r.getAs[Int]("tag_count") == 0 && r.getAs[Int]("anchor_count") == 0)
    }
  }

  test("whole-stage codegen map: no shuffle, no UDF in the plan") {
    val df = Tables.documents(spark, sf).select(col("doc_id"),
      concat(lit("<p>"), col("text"), lit("</p>")).as("html"))
    val plan = HtmlExtract.extract(df).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"extraction must not shuffle:\n$plan")
    assert(!plan.contains("BatchEvalPython") && !plan.contains("SQL UDF"))
  }

  test("mainContent: keeps dense prose, drops nav / link lists / short chrome") {
    import spark.implicits._
    val html =
      "<html><body>" +
        "<div id=\"nav\"><a href=\"/\">Home</a> <a href=\"/a\">About</a></div>" +
        "<p>This paragraph carries the real article prose with many words " +
        "and no links at all so it must survive the filter.</p>" +
        "<ul><li><a href=\"/x\">Related link one</a></li>" +
        "<li><a href=\"/y\">Related link two</a></li></ul>" +
        "<div class=\"footer\">(c) site</div></body></html>"
    val out = HtmlExtract.mainContent(Seq((1L, html)).toDF("doc_id", "html"))
      .collect().head
    assert(out.getAs[String]("main_text").startsWith("This paragraph carries"))
    assert(!out.getAs[String]("main_text").contains("Home"))
    assert(!out.getAs[String]("main_text").contains("Related link"))
    assert(!out.getAs[String]("main_text").contains("(c) site"))
    assert(out.getAs[Int]("n_kept") == 1)
    assert(out.getAs[Int]("n_blocks") > 1)
  }

  test("mainContent: link density cuts a long but link-heavy block; " +
      "a long prose block with one small link survives") {
    import spark.implicits._
    // block A: 12 words, ~all inside anchors → density ~1 → dropped
    // block B: 14 words, one 1-word anchor → density small → kept
    val html =
      "<div><a href=\"/1\">one two three four five six</a> " +
        "<a href=\"/2\">seven eight nine ten eleven twelve</a></div>" +
        "<p>alpha beta gamma delta epsilon zeta eta theta iota kappa lambda " +
        "mu <a href=\"/3\">nu</a></p>"
    val out = HtmlExtract.mainContent(Seq((1L, html)).toDF("doc_id", "html"))
      .collect().head
    assert(out.getAs[String]("main_text").startsWith("alpha beta"))
    assert(out.getAs[Int]("n_blocks") == 2 && out.getAs[Int]("n_kept") == 1)
  }

  test("mainContent: null/empty html, and zero-shuffle plan") {
    import spark.implicits._
    val rows = HtmlExtract.mainContent(
        Seq((1L, null.asInstanceOf[String]), (2L, "")).toDF("doc_id", "html"))
      .orderBy("doc_id").collect()
    rows.foreach { r =>
      assert(r.getAs[String]("main_text") == "")
      assert(r.getAs[Int]("n_blocks") == 0 && r.getAs[Int]("n_kept") == 0)
    }
    val df = Tables.documents(spark, sf).select(col("doc_id"),
      concat(lit("<p>"), col("text"), lit("</p>")).as("html"))
    val plan = HtmlExtract.mainContent(df).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"mainContent must not shuffle:\n$plan")
    assert(!plan.contains("BatchEvalPython") && !plan.contains("SQL UDF"))
  }
}
