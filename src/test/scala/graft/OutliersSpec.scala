package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Outliers

class OutliersSpec extends AnyFunSuite with SharedSpark {

  test("zscore outliers: flags the planted extreme, not the bulk") {
    import spark.implicits._
    val df = ((1 to 50).map(i => ("a", i.toLong, 100.0 + (i % 5))) :+
      (("a", 99L, 10000.0))).toDF("g", "id", "v")
    val got = Outliers.zscoreOutliers(df, "v", Seq("g"), threshold = 3.0).collect()
    assert(got.length === 1)
    assert(got(0).getAs[Long]("id") === 99L)
    assert(got(0).getAs[Double]("zscore") > 3.0)
  }

  test("zscore outliers: zero-variance and single-row groups flag nothing") {
    import spark.implicits._
    val df = Seq(
      ("const", 1L, 5.0), ("const", 2L, 5.0), ("const", 3L, 5.0),
      ("single", 4L, 42.0)
    ).toDF("g", "id", "v")
    assert(Outliers.zscoreOutliers(df, "v", Seq("g")).count() === 0)
  }

  test("zscore outliers: flagged set identical under repartitioning (decimal moments)") {
    val ev = Tables.events(spark, sf).select("event_id", "event_type", "value")
    val base = Outliers.zscoreOutliers(ev, "value", Seq("event_type"), 2.5)
      .select("event_id").orderBy("event_id").collect().map(_.getLong(0)).toSeq
    val shuffled = Outliers.zscoreOutliers(
      ev.repartition(17, col("event_id")), "value", Seq("event_type"), 2.5)
      .select("event_id").orderBy("event_id").collect().map(_.getLong(0)).toSeq
    assert(base === shuffled)
    assert(base.nonEmpty)
  }
}
