package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Pii

/** PII detection/redaction: every default shape fires, clean text passes
  * untouched, nulls are safe, counts are per-type and plan stays map-only.
  */
class PiiSpec extends AnyFunSuite with SharedSpark {

  import spark.implicits._

  private def redacted(s: String): String =
    Pii.redact(Seq((1L, s)).toDF("id", "text"))
      .select("text_redacted").collect().head.getString(0)

  test("each default shape redacts; clean text is untouched") {
    assert(redacted("mail a.b+c_1%d@sub-2.example.co today")
      === "mail <EMAIL> today")
    assert(redacted("dial 415-555-0142 or 415.555.0142.")
      === "dial <PHONE> or <PHONE>.")
    assert(redacted("ssn 078-05-1120!") === "ssn <SSN>!")
    assert(redacted("cc 4111-1111-1111-1111 and 4111 1111 1111 1111")
      === "cc <CARD> and <CARD>")
    assert(redacted("host 192.168.0.1:8080") === "host <IP>:8080")
    val clean = "version 1.2 costs $3,400 on 2024-01-02 at half past 12"
    assert(redacted(clean) === clean)
  }

  test("order shields nested shapes; detect counts on the original") {
    // the email's host CONTAINS a dotted quad: email redacts FIRST, so no
    // <IP> token appears inside it — but detect counts BOTH on the original
    assert(redacted("x root@10.1.2.34.example.com y") === "x <EMAIL> y")
    val d = Pii.detect(
      Seq((1L, "x root@10.1.2.34.example.com y")).toDF("id", "text"))
      .select("pii_email", "pii_ip", "pii_total").collect().head
    assert((d.getInt(0), d.getInt(1), d.getInt(2)) === ((1, 1, 2)))
  }

  test("null text: detect counts zero, redaction stays null") {
    val df = Seq((1L, null: String), (2L, "a@b.io")).toDF("id", "text")
    val det = Pii.detect(df).orderBy("id")
      .select("pii_total").collect().map(_.getInt(0)).toSeq
    assert(det === Seq(0, 1))
    val red = Pii.redact(df).orderBy("id")
      .select("text_redacted").collect()
    assert(red(0).isNullAt(0) && red(1).getString(0) === "<EMAIL>")
  }

  test("plan is map-only: no exchange, native regexp expressions") {
    val df = Pii.redact(Pii.detect(Seq((1L, "a@b.io")).toDF("id", "text")))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"PII pass must not shuffle:\n$plan")
    assert(!plan.contains("BatchEvalPython") && !plan.contains("ScalaUDF"))
  }
}
