package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.model.RefAdapter
import graft.ops.Salt

class SaltSpec extends AnyFunSuite with SharedSpark {

  private def o = RefAdapter.orders(Tables.orders(spark, sf))

  test("salted aggregation equals direct groupBy for any bucket count (decimal-exact)") {
    // decimal sums are associative → bit-exact under any salting (double sums are not)
    val oDec = o.withColumn("amount_dec", col("order_amount").cast("decimal(18,2)"))
    val direct = oDec.groupBy("customer_id")
      .agg(count(lit(1)).as("n_rows"),
        sum(col("amount_dec")).as("sum_amount_dec"))
    for (buckets <- Seq(1, 4, 32)) {
      val salted = Salt.saltedCountSum(oDec, Seq("customer_id"), "amount_dec",
        saltSource = col("order_id"), buckets = buckets)
      assert(salted.exceptAll(direct).count() === 0, s"buckets=$buckets")
      assert(direct.exceptAll(salted).count() === 0, s"buckets=$buckets")
    }
  }

  test("salted join equals direct join") {
    val c = RefAdapter.customers(Tables.customer(spark, sf))
    val direct = o.join(c, Seq("customer_id"))
      .select("order_id", "customer_id", "region")
    val salted = Salt.saltedJoin(o, c, Seq("customer_id"),
        saltSource = col("order_id"), buckets = 8)
      .select("order_id", "customer_id", "region")
    assert(salted.exceptAll(direct).count() === 0)
    assert(direct.exceptAll(salted).count() === 0)
  }

  test("salt distributes a hot key across buckets") {
    import spark.implicits._
    // one key, many rows: salting must spread them
    val hot = (1 to 1000).map(i => (1L, i.toLong)).toDF("key", "uid")
    val buckets = hot.select(Salt.saltColumn(col("uid"), 16).as("b"))
      .distinct().count()
    assert(buckets >= 12, s"expected most of 16 buckets used, got $buckets")
  }
}
