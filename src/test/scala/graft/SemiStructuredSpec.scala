package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.SemiStructured

class SemiStructuredSpec extends AnyFunSuite with SharedSpark {

  test("flattenJson: typed extraction, nested paths, missing fields go null") {
    import spark.implicits._
    val df = Seq(
      (1L, """{"k": 7, "tag": "a", "geo": {"lat": 1.5}}"""),
      (2L, """{"k": 9}"""),
      (3L, """{"tag": "c", "geo": {"lat": -2.25}}""")
    ).toDF("id", "props")
    val got = SemiStructured.flattenJson(df, "props", Seq(
      "k" -> ("$.k", "bigint"),
      "tag" -> ("$.tag", "string"),
      "lat" -> ("$.geo.lat", "double")
    )).orderBy("id").collect()
    assert(got(0).getAs[Long]("k") === 7L)
    assert(got(0).getAs[String]("tag") === "a")
    assert(got(0).getAs[Double]("lat") === 1.5)
    assert(got(1).getAs[String]("tag") === null)
    assert(got(1).isNullAt(got(1).fieldIndex("lat")))
    assert(got(2).isNullAt(got(2).fieldIndex("k")))
    assert(got(2).getAs[Double]("lat") === -2.25)
  }

  test("jsonField stays a per-row projection: no shuffle, inside codegen") {
    import spark.implicits._
    val df = Seq((1L, """{"k": 1}""")).toDF("id", "props")
      .select(col("id"), SemiStructured.jsonField(col("props"), "$.k", "bigint").as("k"))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"extraction must not shuffle:\n$plan")
  }
}
