package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Layout

class LayoutSpec extends AnyFunSuite with SharedSpark {

  /** Mean per-partition value span for `c`, normalized by the global span — the fraction
    * of the column's range a scan of one random file must consider. Lower prunes better.
    */
  private def meanNormalizedSpan(df: DataFrame, c: String): Double = {
    val global = df.agg((max(col(c)) - min(col(c))).cast("double")).first().getDouble(0)
    val spans = df.withColumn("__pid", spark_partition_id())
      .groupBy("__pid")
      .agg((max(col(c)) - min(col(c))).cast("double").as("span"))
      .agg(avg("span")).first().getDouble(0)
    spans / global
  }

  test("zorder: every clustered column gets narrow per-file ranges; rows preserved") {
    val o = Tables.orders(spark, sf).select("o_orderkey", "o_custkey", "o_totalprice")
    val z = Layout.zorderBy(o, Seq("o_custkey", "o_totalprice"), numFiles = 8)

    assert(z.count() === o.count())

    val zCust = meanNormalizedSpan(z, "o_custkey")
    val zPrice = meanNormalizedSpan(z, "o_totalprice")
    // linear sort on custkey: perfect custkey clustering, no price clustering
    val linear = o.repartitionByRange(8, col("o_custkey"))
      .sortWithinPartitions("o_custkey")
    val linPrice = meanNormalizedSpan(linear, "o_totalprice")

    // both z-ordered columns must cluster meaningfully (< 60% of global span per file)
    assert(zCust < 0.6, s"custkey span $zCust")
    assert(zPrice < 0.6, s"totalprice span $zPrice")
    // and the second column must beat the linear layout, where it is unclustered (~1.0)
    assert(zPrice < linPrice * 0.7,
      s"zorder price span $zPrice should beat linear-sort $linPrice")
  }

  test("zvalue: bit positions past 31 stay in long arithmetic (6 cols × 6 bits)") {
    val li = Tables.lineitem(spark, sf).select(
      "l_orderkey", "l_partkey", "l_suppkey", "l_quantity", "l_extendedprice",
      "l_discount")
    val cols = Seq("l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
      "l_extendedprice", "l_discount")
    val withZ = li.withColumn("__z", Layout.zvalue(li, cols, bitsPerCol = 6))
    val row = withZ.agg(min("__z"), max("__z")).first()
    // an int shift would wrap positions ≥ 32 (negative values, cross-column collisions)
    assert(row.getLong(0) >= 0L, s"negative z-value: ${row.getLong(0)}")
    assert(row.getLong(1) < (1L << 36), s"z-value out of range: ${row.getLong(1)}")
    assert(row.getLong(1) >= (1L << 31), s"top column bits never set: ${row.getLong(1)}")
  }

  test("zvalue: a pure projection — sampled boundaries, no shuffle, no UDF") {
    val o = Tables.orders(spark, sf).select("o_custkey", "o_totalprice")
    val withZ = o.withColumn("__z",
      Layout.zvalue(o, Seq("o_custkey", "o_totalprice"), bitsPerCol = 4))
    val plan = withZ.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"zvalue must not shuffle:\n$plan")
    assert(!plan.contains("BatchEvalPython") && !plan.contains("ScalaUDF"))
    // resolution: 4 bits/col × 2 cols → z fits in 8 bits
    val mx = withZ.agg(max("__z")).first().getLong(0)
    assert(mx < 256, s"z-value out of range: $mx")
  }
}
