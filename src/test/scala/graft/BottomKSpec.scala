package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.BottomKByKey.bottom_k_by_key

class BottomKSpec extends AnyFunSuite with SharedSpark {

  test("bottom-k: picks the k smallest keys per group, ascending") {
    import spark.implicits._
    val df = Seq(
      ("g1", "c", "payC"), ("g1", "a", "payA"), ("g1", "b", "payB"),
      ("g1", "d", "payD"), ("g2", "z", "payZ")
    ).toDF("g", "k", "p")
    val got = df.groupBy("g").agg(bottom_k_by_key(col("k"), col("p"), 2).as("s"))
      .orderBy("g").collect()
    assert(got(0).getSeq[String](1) === Seq("payA", "payB"))
    assert(got(1).getSeq[String](1) === Seq("payZ"))
  }

  test("bottom-k: partition-invariant (consistent sampling)") {
    val docs = Tables.documents(spark, sf)
    def sample(df: org.apache.spark.sql.DataFrame) = df
      .groupBy("lang")
      .agg(bottom_k_by_key(md5(col("text")), col("text"), 5).as("s"))
      .select(col("lang"), explode(col("s")).as("text"))
    val a = sample(docs)
    val b = sample(docs.repartition(17, col("doc_id")))
    assert(a.exceptAll(b).count() === 0)
    assert(b.exceptAll(a).count() === 0)
  }

  test("bottom-k: agrees with the window-function formulation") {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(spark, sf)
    val viaAgg = docs.groupBy("lang")
      .agg(bottom_k_by_key(md5(col("text")), col("text"), 3).as("s"))
      .select(col("lang"), explode(col("s")).as("text"))
    val w = Window.partitionBy("lang").orderBy(md5(col("text")), col("text"))
    val viaWindow = docs
      .withColumn("__rn", row_number().over(w)).filter(col("__rn") <= 3)
      .select("lang", "text")
    assert(viaAgg.exceptAll(viaWindow).count() === 0)
    assert(viaWindow.exceptAll(viaAgg).count() === 0)
  }

  test("bottom-k: null keys and payloads are skipped") {
    import spark.implicits._
    val df = Seq((Some("a"), Some("x")), (None, Some("y")), (Some("b"), None))
      .toDF("k", "p")
    val got = df.agg(bottom_k_by_key(col("k"), col("p"), 5)).first().getSeq[String](0)
    assert(got === Seq("x"))
  }
}
