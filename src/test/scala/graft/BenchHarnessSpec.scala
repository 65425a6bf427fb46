package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

/** Measurement integrity of the bench's build-once/serve-per-rep split: a
  * serving-thunk builder failure silently reverting the gate to
  * build-per-invocation timing would be exactly the apples-to-oranges the
  * split exists to end — so the fallback must be VISIBLE in the emitted JSON.
  */
class BenchHarnessSpec extends AnyFunSuite with SharedSpark {

  private val ok: (SparkSession, String) => () => DataFrame =
    (s, _) => () => s.range(3).toDF()
  private val boom: (SparkSession, String) => () => DataFrame =
    (_, _) => throw new IllegalStateException(
      "codebooks missing\nsecond line never leaks into the JSON")

  test("a failed serving builder is loud: -1.0 in index_build plus a " +
      "serving_fallback entry; healthy builders are unaffected") {
    val sb = Bench.buildServingThunks(
      Seq("q_good" -> ok, "q_bad" -> boom, "q_unselected" -> boom),
      name => name != "q_unselected", spark, "/unused")

    // the healthy gate keeps its thunk + timing; the failed one loses the
    // thunk (falls back to the contract gate) but records the failure
    assert(sb.thunks.contains("q_good") && !sb.thunks.contains("q_bad"))
    val secs = sb.buildSecs.toMap
    assert(secs("q_good") >= 0.0)
    assert(secs("q_bad") === -1.0)
    assert(sb.buildSecs.map(_._1) === Seq("q_good", "q_bad"),
      "unselected gates must not run their builders")

    val json = Bench.servingFallbackJson(sb.fallbacks)
    assert(json.contains(
      "\"q_bad\":\"IllegalStateException: codebooks missing\""), json)
    assert(!json.contains("\n"),
      "multi-line exception messages must not break the one-line JSON")
  }

  test("no failures emits the empty object round-over-round comparisons key on") {
    assert(Bench.servingFallbackJson(Nil) === "{}")
  }

  test("fatal builder errors propagate — an OOM must kill the bench, not " +
      "reroute the gate") {
    val fatal: (SparkSession, String) => () => DataFrame =
      (_, _) => throw new OutOfMemoryError("simulated")
    intercept[OutOfMemoryError] {
      Bench.buildServingThunks(Seq("q_fatal" -> fatal), _ => true,
        spark, "/unused")
    }
  }

  test("fallback JSON escapes quotes and backslashes") {
    val json = Bench.servingFallbackJson(
      Seq("q_x" -> """Err: path "C:\tmp" bad"""))
    assert(json ===
      """{"q_x":"Err: path \"C:\\tmp\" bad"}""")
  }
}
