package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.ConnectedComponents

class ComponentsSpec extends AnyFunSuite with SharedSpark {

  test("components: chains, cliques, and singleton edges resolve to min labels") {
    import spark.implicits._
    // chain 1-2-3-4, separate pair 10-11, triangle 20-21-22
    val edges = Seq(
      (2L, 1L), (2L, 3L), (4L, 3L),
      (10L, 11L),
      (20L, 21L), (21L, 22L), (20L, 22L)
    ).toDF("src", "dst")
    val got = ConnectedComponents(edges).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(Seq(1L, 2L, 3L, 4L).forall(got(_) == 1L))
    assert(Seq(10L, 11L).forall(got(_) == 10L))
    assert(Seq(20L, 21L, 22L).forall(got(_) == 20L))
  }

  test("components: converges on a long chain (diameter > a few rounds)") {
    import spark.implicits._
    val chain = (0L until 30L).map(i => (i, i + 1)).toDF("src", "dst")
    val got = ConnectedComponents(chain, maxIterations = 40)
    assert(got.select(countDistinct("component")).first().getLong(0) === 1L)
    assert(got.agg(min("component")).first().getLong(0) === 0L)
    assert(got.count() === 31)
  }

  test("near-dup clusters on harness docs: components consistent with pairs") {
    val docs = Tables.documents(spark, sf)
    val pairs = graft.ops.Dedup.ngramJaccardPairs(docs, threshold = 0.5)
      .select("doc_a", "doc_b").cache()
    val clusters = ConnectedComponents.nearDuplicateClusters(docs, threshold = 0.5)
      .cache()
    // every paired doc has a component; both endpoints share it
    val withComponents = pairs
      .join(clusters.withColumnRenamed("node", "doc_a")
        .withColumnRenamed("component", "comp_a"), Seq("doc_a"))
      .join(clusters.withColumnRenamed("node", "doc_b")
        .withColumnRenamed("component", "comp_b"), Seq("doc_b"))
    assert(withComponents.count() === pairs.count())
    assert(withComponents.filter(col("comp_a") =!= col("comp_b")).count() === 0)
    // component label is the minimum member id
    val labelCheck = clusters.groupBy("component").agg(min("node").as("min_node"))
    assert(labelCheck.filter(col("component") =!= col("min_node")).count() === 0)
  }
}
