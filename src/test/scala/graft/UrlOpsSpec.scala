package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.UrlOps

/** URL curation: domain extraction edge cases, label-precise suffix blocking,
  * null handling, and the no-cartesian plan shape.
  */
class UrlOpsSpec extends AnyFunSuite with SharedSpark {

  import spark.implicits._

  private def dom(u: String): Option[String] =
    Option(UrlOps.extractDomain(Seq((1L, u)).toDF("id", "url"))
      .select("domain").collect().head.getString(0))

  test("extractDomain: scheme/userinfo/port/path stripped, lowercased") {
    assert(dom("https://Example.COM/path?q=1") === Some("example.com"))
    assert(dom("http://user:pw@sub.site.org:8080/x") === Some("sub.site.org"))
    assert(dom("ftp+ssh://a.b.c#frag") === Some("a.b.c"))
    assert(dom("https://10.1.2.3:443/") === Some("10.1.2.3"))
    assert(dom("no-scheme.example.com/path") === None)
    assert(dom("") === None)
  }

  test("blocklist: exact + subdomain matches drop, siblings and null survive") {
    val df = Seq(
      (1L, "https://ads.example.com/x"),      // exact
      (2L, "https://deep.x.ads.example.com"), // sub-subdomain
      (3L, "https://ok.example.com/y"),       // sibling — must survive
      (4L, "https://notads.example.com"),     // prefix-similar — must survive
      (5L, "https://example.com"),            // parent of entry — must survive
      (6L, "not a url at all"),               // null domain — kept
      (7L, "https://tracker.net")).toDF("id", "url")
    val blocked = Seq("ads.example.com", "tracker.net").toDF("domain")
    val got = UrlOps.filterBlockedDomains(df, blocked)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(got === Set(3L, 4L, 5L, 6L))
  }

  test("plan: equality joins only, blocklist broadcast, no cartesian") {
    val df = (0L until 100L).map(i => (i, s"https://h$i.site$i.com/p")).toDF("id", "url")
    val blocked = (0L until 50L).map(i => s"site$i.com").toDF("domain")
    val plan = UrlOps.filterBlockedDomains(df, blocked)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), s"non-equality join:\n$plan")
    assert(plan.contains("BroadcastHashJoin") ||
      plan.contains("BroadcastExchange"), s"blocklist not broadcast:\n$plan")
  }
}
