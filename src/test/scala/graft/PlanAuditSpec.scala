package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.ExplainMode
import org.scalatest.funsuite.AnyFunSuite

/** Executable plan discipline: the 100 TB properties the operators are designed around
  * (filter pushdown, column pruning, broadcast dims, no accidental cross products,
  * whole-stage codegen on per-row paths) asserted on the actual physical plans, so a
  * regression in plan shape fails CI rather than surfacing as a cluster bill.
  */
class PlanAuditSpec extends AnyFunSuite with SharedSpark {

  private def formatted(df: DataFrame): String =
    df.queryExecution.explainString(ExplainMode.fromString("formatted"))

  /** Final adaptive plan, after AQE has made its runtime join/partition decisions.
    * collect() (not a write) so THIS DataFrame's own QueryExecution runs — a write
    * plans a separate QueryExecution and would leave this one unexecuted, with the
    * adaptive plan unfinalized and codegen stages uncollapsed.
    */
  private def finalPlan(df: DataFrame): String = {
    df.collect()
    df.queryExecution.executedPlan.toString
  }

  test("pricing summary: shipdate filter reaches the parquet scan, schema pruned") {
    val plan = formatted(SparkEntry.queries("q_pricing_summary")(spark, sf))
    assert(plan.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"),
      s"shipdate must push into the scan:\n$plan")
    val readSchema = plan.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!readSchema.contains("l_comment") && !readSchema.contains("l_partkey"),
      s"projection must prune unused lineitem columns: $readSchema")
  }

  test("token counts: documents scan prunes to (doc_id, text)") {
    val plan = formatted(SparkEntry.queries("q_token_counts")(spark, sf))
    val readSchema = plan.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.contains("doc_id") && readSchema.contains("text"))
    assert(!readSchema.contains("lang") && !readSchema.contains("source"),
      s"unused document columns must not be read: $readSchema")
  }

  test("daily sales: the customer dimension joins as a broadcast, never a cross product") {
    val plan = finalPlan(SparkEntry.queries("q_daily_sales")(spark, sf))
    assert(plan.contains("BroadcastHashJoin"), s"dim join should broadcast:\n$plan")
    assert(!plan.contains("CartesianProduct"))
  }

  test("ANN and IVF candidate retrieval are equality joins, not cross products") {
    for (q <- Seq("q_ann_topk", "q_ivf_topk", "q_embedding_neardup", "q_minhash_neardup")) {
      val plan = finalPlan(SparkEntry.queries(q)(spark, sf))
      assert(!plan.contains("CartesianProduct"),
        s"$q must bucket via equality joins, got a cross product")
      assert(!plan.contains("BroadcastNestedLoopJoin") || q == "q_ivf_topk",
        s"$q candidate retrieval must not be nested-loop")
    }
  }

  test("per-row text analytics stay inside whole-stage codegen") {
    for (q <- Seq("q_text_stats", "q_lang_id", "q_fingerprints")) {
      val plan = finalPlan(SparkEntry.queries(q)(spark, sf))
      // executedPlan renders whole-stage-codegen subtrees as "*(n)" stage markers
      assert(plan.contains("*("), s"$q fell out of codegen:\n$plan")
    }
  }

  test("contamination: reference shingles broadcast so the corpus side never shuffles pre-join") {
    val plan = finalPlan(SparkEntry.queries("q_contamination")(spark, sf))
    assert(plan.contains("BroadcastHashJoin"),
      s"reference side must broadcast:\n$plan")
    assert(!plan.contains("CartesianProduct"))
  }
}
