package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Weighted PageRank over an edge list — the graph-centrality half of corpus
  * curation (CommonCrawl-style host/domain ranking feeds crawl prioritization and
  * per-source quality priors; the same iteration ranks documents inside a near-dup
  * similarity graph built by `Dedup`/`Similarity` pairs).
  *
  * Power iteration, DataFrame-first:
  *   rank'(v) = (1-d)/N + d · ( Σ_{u→v} rank(u)·share(u,v) + dangling/N )
  * with share(u,v) = w(u,v)/outWeight(u) precomputed ONCE (it is loop-invariant)
  * and cached alongside the node list, so each iteration is exactly one shuffle
  * join (ranks ⋈ edges on src) + one aggregation on dst. Dangling mass (nodes with
  * no out-edges) is collected by an aggregate and attached via a broadcast
  * single-row cross join — no driver-side collect in the loop.
  *
  * Each iteration materializes its rank frame with an eager `localCheckpoint`:
  * the new ranks reference the old THREE times (dangling mass, contributions, and
  * the node join), so an unmaterialized loop would branch the logical plan
  * exponentially in the iteration count — one bounded job per iteration is the
  * textbook trade (GraphX's Pregel makes the same one). On a real cluster prefer
  * `spark.sparkContext.setCheckpointDir` + reliable checkpoints for fault
  * tolerance past executor loss.
  */
object GraphRank {

  /** Ranks after `iterations` rounds over `edges(src, dst, weight)`; returns
    * `(node, rank)`. Edge weights must be non-negative; parallel edges are summed.
    */
  def pageRank(edges: DataFrame, iterations: Int, damping: Double = 0.85,
      srcCol: String = "src", dstCol: String = "dst", weightCol: String = "weight")
      : DataFrame = {
    require(iterations >= 0, "iterations must be >= 0")
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"),
      col(weightCol).cast("double").as("w"))
      .groupBy("src", "dst").agg(sum("w").as("w"))
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
    val outW = e.groupBy("src").agg(sum("w").as("ow"))
    // share is loop-invariant: computed once, cached, reused every iteration
    val shares = e.join(outW, "src")
      .select(col("src"), col("dst"), (col("w") / col("ow")).as("share"))
      .persist()
    val cachedNodes = nodes.persist()
    val n = cachedNodes.count().toDouble // one scalar, fixed for the whole loop
    val teleport = (1.0 - damping) / n
    val srcs = shares.select("src").distinct()
    var ranks = cachedNodes.withColumn("rank", lit(1.0 / n))
    for (_ <- 1 to iterations) {
      // dangling nodes hold rank but emit no contributions; their mass spreads
      // uniformly (the standard stochastic-matrix fix), attached as ONE broadcast row
      val dangling = ranks.join(srcs, ranks("node") === srcs("src"), "left_anti")
        .agg(coalesce(sum("rank"), lit(0.0)).as("dm"))
      val contrib = ranks.join(shares, ranks("node") === shares("src"))
        .groupBy(col("dst").as("node"))
        .agg(sum(col("rank") * col("share")).as("c"))
      ranks = cachedNodes.join(contrib, Seq("node"), "left")
        .crossJoin(broadcast(dangling))
        .select(col("node"),
          (lit(teleport) + lit(damping) *
            (coalesce(col("c"), lit(0.0)) + col("dm") / lit(n))).as("rank"))
        .localCheckpoint() // see object doc: bounds the plan at one job/iteration
    }
    shares.unpersist()
    cachedNodes.unpersist()
    ranks
  }
}
