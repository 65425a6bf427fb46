package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Approximate aggregates — the sketch tier for 100 TB cardinality/quantile work where
  * exact distinct/percentile shuffles are unaffordable (SCALE.md: prefer
  * `approx_count_distinct` over `countDistinct` for the corrected unique_customers
  * variant at extreme scale).
  */
class SketchSpec extends AnyFunSuite with SharedSpark {

  test("approx_count_distinct within configured relative error of exact") {
    val o = Tables.orders(spark, sf)
    val exact = o.select(countDistinct(col("o_custkey"))).first().getLong(0)
    val approx = o.select(approx_count_distinct(col("o_custkey"), rsd = 0.05))
      .first().getLong(0)
    assert(math.abs(approx - exact).toDouble / exact < 0.15,
      s"approx=$approx exact=$exact")
  }

  test("percentile_approx brackets the exact interpolated percentile") {
    val ev = Tables.eventsMicros(spark, sf)
    val row = ev.agg(
      expr("percentile(value, 0.5)").as("exact"),
      expr("percentile_approx(value, 0.5, 1000)").as("approx"),
      min("value").as("lo"), max("value").as("hi")).first()
    val (exact, approx) = (row.getDouble(0), row.getDouble(1))
    val span = row.getDouble(3) - row.getDouble(2)
    assert(math.abs(approx - exact) / span < 0.05,
      s"approx median $approx too far from exact $exact over span $span")
  }

  test("mergeable HLL sketches: per-day sketches union to the global estimate") {
    // the incremental-rollup shape for 100 TB: sketch each partition/day once, persist
    // the binary sketch, and answer cross-day distincts by merging sketches — never by
    // rescanning history
    val o = Tables.orders(spark, sf)
    val exact = o.select(countDistinct(col("o_custkey"))).first().getLong(0)
    val perDay = o.groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(hll_sketch_agg(col("o_custkey")).as("sk"))
    val merged = perDay.agg(
      hll_sketch_estimate(hll_union_agg(col("sk"))).as("distinct_customers"))
      .first().getLong(0)
    assert(math.abs(merged - exact).toDouble / exact < 0.05,
      s"merged=$merged exact=$exact")
  }

  test("HLL sketches survive a parquet roundtrip and still merge") {
    val dir = java.nio.file.Files.createTempDirectory("hll_rt").toString
    val o = Tables.orders(spark, sf)
    o.groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(hll_sketch_agg(col("o_custkey")).as("sk"))
      .write.mode("overwrite").parquet(dir)
    val exact = o.select(countDistinct(col("o_custkey"))).first().getLong(0)
    val merged = spark.read.parquet(dir)
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))))
      .first().getLong(0)
    assert(math.abs(merged - exact).toDouble / exact < 0.05)
  }

  test("daily sales HLL variant agrees with exact distinct at small scale") {
    import graft.model.RefAdapter
    val o = RefAdapter.orders(Tables.orders(spark, sf))
    val c = RefAdapter.customers(Tables.customer(spark, sf))
    val joined = o.join(broadcast(c.select("customer_id", "region")), Seq("customer_id"))
    val perRegion = joined.groupBy("region").agg(
      countDistinct(col("customer_id")).as("exact"),
      approx_count_distinct(col("customer_id"), 0.02).as("approx"))
    val bad = perRegion
      .filter(abs(col("approx") - col("exact")) / col("exact") > 0.1)
      .count()
    assert(bad === 0)
  }
}
