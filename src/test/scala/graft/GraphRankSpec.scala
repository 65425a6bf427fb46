package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.GraphRank

class GraphRankSpec extends AnyFunSuite with SharedSpark {

  private def ranks(edges: Seq[(String, String, Double)], iters: Int)
      : Map[String, Double] = {
    import spark.implicits._
    GraphRank.pageRank(edges.toDF("src", "dst", "weight"), iters)
      .as[(String, Double)].collect().toMap
  }

  /** In-memory reference power iteration with uniform dangling redistribution. */
  private def reference(edges: Seq[(String, String, Double)], iters: Int,
      d: Double = 0.85): Map[String, Double] = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct.sorted
    val n = nodes.length.toDouble
    val outW = edges.groupBy(_._1).map { case (s, es) => s -> es.map(_._3).sum }
    var r = nodes.map(_ -> 1.0 / n).toMap
    for (_ <- 1 to iters) {
      val dangling = nodes.filterNot(outW.contains).map(r).sum
      val contrib = edges.groupBy(_._2).map { case (dst, es) =>
        dst -> es.map { case (s, _, w) => r(s) * (w / outW(s)) }.sum
      }
      r = nodes.map(v => v ->
        ((1.0 - d) / n + d * (contrib.getOrElse(v, 0.0) + dangling / n))).toMap
    }
    r
  }

  test("uniform cycle converges to equal ranks summing to 1") {
    val ring = Seq(("a", "b", 1.0), ("b", "c", 1.0), ("c", "a", 1.0))
    val r = ranks(ring, iters = 20)
    r.values.foreach(v => assert(math.abs(v - 1.0 / 3) < 1e-12))
    assert(math.abs(r.values.sum - 1.0) < 1e-12)
  }

  test("matches the in-memory reference on a weighted graph with dangling nodes") {
    val rng = new scala.util.Random(11)
    val nodes = (0 until 12).map(i => s"n$i")
    // n10/n11 receive edges but emit none → dangling mass every iteration
    val edges = (0 until 40).map { _ =>
      (nodes(rng.nextInt(10)), nodes(2 + rng.nextInt(10)), 1.0 + rng.nextInt(5))
    }.distinct
    val got = ranks(edges, iters = 10)
    val want = reference(edges, iters = 10)
    assert(got.keySet === want.keySet)
    got.foreach { case (node, v) => assert(math.abs(v - want(node)) < 1e-9, node) }
    assert(math.abs(got.values.sum - 1.0) < 1e-9) // dangling mass conserved
  }

  test("forced shuffle-join path (broadcastNodesBelow = 0) matches the broadcast path") {
    import spark.implicits._
    val rng = new scala.util.Random(13)
    val nodes = (0 until 12).map(i => s"n$i")
    val edges = (0 until 40).map { _ =>
      (nodes(rng.nextInt(10)), nodes(2 + rng.nextInt(10)), 1.0 + rng.nextInt(5))
    }.distinct
    val shuffled = GraphRank.pageRank(edges.toDF("src", "dst", "weight"), 10,
        broadcastNodesBelow = 0L)
      .as[(String, Double)].collect().toMap
    val want = reference(edges, iters = 10)
    assert(shuffled.keySet === want.keySet)
    shuffled.foreach { case (node, v) =>
      assert(math.abs(v - want(node)) < 1e-9, node) }
  }

  test("a sink hub out-ranks its spokes") {
    val star = (1 to 6).map(i => (s"s$i", "hub", 1.0)) :+ ("hub", "s1", 1.0)
    val r = ranks(star, iters = 15)
    assert(r("hub") > r("s2") * 3)
  }
}
