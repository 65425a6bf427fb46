package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.ApproxTopItems.approx_top_items
import graft.ops.HeavyHitters

class HeavyHittersSpec extends AnyFunSuite with SharedSpark {

  test("misra-gries: every item above n/(k+1) survives; counts never overcount") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    // zipf-ish: item i drawn with weight ~ 1/(i+1) over 200 distinct items
    val weights = (0 until 200).map(i => 1.0 / (i + 1))
    val total = weights.sum
    val data = Seq.fill(20000) {
      var u = rnd.nextDouble() * total; var i = 0
      while (u > weights(i)) { u -= weights(i); i += 1 }
      s"item_$i"
    }
    val truth = data.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val n = data.size
    for (k <- Seq(10, 50, 200)) {
      // partitioning varies the merge order — the guarantee must hold regardless
      val sketch = data.toDF("v").repartition(13)
        .agg(approx_top_items(col("v"), k)).first()
        .getSeq[Row](0).map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(sketch.size <= k)
      val bound = n.toDouble / (k + 1)
      truth.foreach { case (item, c) =>
        if (c > bound)
          assert(sketch.contains(item),
            s"k=$k: lost $item (true count $c > bound $bound)")
      }
      sketch.foreach { case (item, est) =>
        val c = truth(item)
        assert(est <= c, s"k=$k: $item overcounted ($est > $c)")
        assert(est >= c - bound - 1e-9, s"k=$k: $item undercounted past the bound")
      }
    }
  }

  test("heavyHitters: exact membership, counts, and shares vs a full groupBy") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val data = Seq.fill(5000)(s"u${rnd.nextInt(300)}")
    val df = data.toDF("user").repartition(7)
    val got = HeavyHitters.heavyHitters(df, "user", minShare = 0.005)
      .orderBy("item").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    val threshold = 0.005 * data.size
    val want = data.groupBy(identity).toSeq
      .map { case (k, v) => (k, v.size.toLong, v.size.toDouble / data.size) }
      .filter(_._2 > threshold).sortBy(_._1)
    assert(got === want)
    assert(got.nonEmpty && got.size < 300) // selective, non-vacuous
  }

  test("heavyHitters: a tiny minShare routes through the broadcast semi-join, exactly") {
    import spark.implicits._
    // minShare = 1e-4 → k = 10,000 candidates — far past the In-list cutoff, so
    // the recount must take the semi-join branch and still be exact
    val rnd = new scala.util.Random(11)
    val data = Seq.fill(4000)(s"w${rnd.nextInt(150)}")
    val df = data.toDF("w").repartition(5)
    val got = HeavyHitters.heavyHitters(df, "w", minShare = 1e-4)
      .orderBy("item").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    val want = data.groupBy(identity).toSeq
      .map { case (k, v) => (k, v.size.toLong, v.size.toDouble / data.size) }
      .filter(_._2 > 1e-4 * data.size).sortBy(_._1)
    assert(got === want)
  }

  test("heavyHitters: empty input and all-null column yield an empty result") {
    import spark.implicits._
    val empty = Seq.empty[String].toDF("v")
    assert(HeavyHitters.heavyHitters(empty, "v", 0.01).count() === 0)
    val nulls = Seq[Option[String]](None, None).toDF("v")
    assert(HeavyHitters.heavyHitters(nulls, "v", 0.01).count() === 0)
  }

  test("approx_top_items is callable from spark.sql") {
    import spark.implicits._
    graft.functions.Registry.registerAll(spark)
    Seq("a", "a", "a", "b", "b", "c").toDF("v")
      .createOrReplaceTempView("hh_sql")
    val arr = spark.sql(
      "SELECT approx_top_items(v, 10) AS items FROM hh_sql")
      .first().getSeq[Row](0)
    assert(arr.map(r => r.getString(0) -> r.getLong(1)) ===
      Seq("a" -> 3L, "b" -> 2L, "c" -> 1L))
  }
}
