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
  * Plan-growth control: WITH dangling nodes the new ranks reference the old
  * TWICE (dangling mass + contributions), so an unmaterialized loop would
  * branch the logical plan exponentially in the iteration count — each
  * iteration materializes its rank frame with an eager `localCheckpoint`, one
  * bounded job per iteration, the textbook trade (GraphX's Pregel makes the
  * same one). WITHOUT dangling nodes the old ranks are referenced ONCE and
  * the plan is a linear chain, so `checkpointEvery > 1` can compose several
  * steps into one action — measured NEGATIVE at harness scale (r16
  * same-window profile: k=5 read ~2.9 s vs ~2.2 s at k=1 — the one deep
  * AQE plan costs more optimizer/driver time than the four saved
  * materialization jobs), so the default stays 1; the knob exists for
  * graphs whose per-iteration data cost dominates planning. On a real
  * cluster prefer `spark.sparkContext.setCheckpointDir` + reliable
  * checkpoints for fault tolerance past executor loss.
  */
object GraphRank {

  /** Ranks after `iterations` rounds over `edges(src, dst, weight)`; returns
    * `(node, rank)`. Edge weights must be non-negative; parallel edges are summed.
    *
    * `broadcastNodesBelow`: when the node count (known exactly — it is counted
    * once for the teleport term anyway) is at or under this bound, the O(nodes)
    * rank frame is broadcast-hinted into both per-iteration joins, so the
    * O(edges) share table is NEVER shuffled inside the loop — each iteration
    * reads it from cache through a broadcast hash join. Above the bound the
    * loop keeps the shuffle-join shape (web-scale graphs cannot broadcast
    * their node set). The default (500k nodes ≈ tens of MB framed) is far
    * under the 8 GB broadcast cap; pass 0 to force shuffle joins.
    */
  def pageRank(edges: DataFrame, iterations: Int, damping: Double = 0.85,
      srcCol: String = "src", dstCol: String = "dst", weightCol: String = "weight",
      broadcastNodesBelow: Long = 500000L, checkpointEvery: Int = 1): DataFrame = {
    require(iterations >= 0, "iterations must be >= 0")
    require(checkpointEvery >= 1, "checkpointEvery must be >= 1")
    val p = prepare(edges, srcCol, dstCol, weightCol)
    val teleport = (1.0 - damping) / p.n
    val bcastRanks = p.n <= broadcastNodesBelow.toDouble && broadcastNodesBelow > 0
    var ranks = p.cachedNodes.withColumn("rank", lit(1.0 / p.n))
    for (i <- 1 to iterations) {
      ranks = iterate(ranks, p.cachedNodes, p.shares, p.n, teleport, damping,
        p.hasDangling, bcastRanks)
      // plan-growth control — see the object doc: dangling graphs MUST
      // checkpoint per iteration (double reference ⇒ exponential plan);
      // dangle-free graphs may chain `checkpointEvery` linear steps per
      // action (default 1 — the chain measured slower at harness scale)
      if (p.hasDangling || i % checkpointEvery == 0 || i == iterations)
        ranks = ranks.localCheckpoint()
    }
    p.shares.unpersist()
    p.cachedNodes.unpersist()
    ranks.select("node", "rank")
  }

  /** The loop-invariant state: cached share table, cached dangling-flagged node
    * list, exact node count, and whether any node is dangling.
    */
  private[graft] final case class Prepared(shares: DataFrame,
      cachedNodes: DataFrame, n: Double, hasDangling: Boolean)

  private def prepare(edges: DataFrame, srcCol: String, dstCol: String,
      weightCol: String): Prepared = {
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"),
      col(weightCol).cast("double").as("w"))
      .groupBy("src", "dst").agg(sum("w").as("w"))
    val outW = e.groupBy("src").agg(sum("w").as("ow"))
    // share is loop-invariant: computed once, cached, reused every iteration
    val shares = e.join(outW, "src")
      .select(col("src"), col("dst"), (col("w") / col("ow")).as("share"))
      .persist()
    // nodes derive from the PERSISTED shares, not from `e`: shares holds
    // exactly e's (src, dst) pairs (the outW join matches every row by
    // construction), so the node set is identical — but every prepare-time
    // subtree now reads the one cached frame instead of re-running the
    // caller's edge pipeline per broadcast/distinct subtree (profiled r16:
    // the upstream window+aggregate executed 4× per invocation, single-task)
    val nodes = shares.select(col("src").as("node"))
      .union(shares.select(col("dst").as("node"))).distinct()
    // dangling-ness is a property of the NODE, not of the iteration: flag it
    // ONCE on the cached node list (guide §2.4 — this deletes the left-anti
    // join + its exchanges from every iteration; the flag rides the rank frame
    // through each checkpoint, so the per-iteration dangling mass is a plain
    // filter+sum over rows the iteration materializes anyway)
    val srcs = shares.select("src").distinct()
    val cachedNodes = nodes.join(srcs, nodes("node") === srcs("src"), "left")
      .select(col("node"), col("src").isNull.as("dangling"))
      .persist()
    // ONE fused job learns both loop constants (the count is exact-integer;
    // the dangling probe is an existence max) — was a count plus a separate
    // limit-1 count, two scheduler round-trips over the same cached frame
    val row = cachedNodes.agg(count(lit(1)),
      max(when(col("dangling"), 1).otherwise(0))).head()
    val n = row.getLong(0).toDouble // one scalar, fixed for the whole loop
    // a graph with NO dangling nodes (every node has an out-edge — common for
    // transition graphs) has dm = 0 in EVERY iteration: the filter+agg and its
    // one-row broadcast are then dropped from the loop outright (2 jobs per
    // iteration), and `+ 0.0/n` is elided — IEEE-identical since rank > 0
    val hasDangling = !row.isNullAt(1) && row.getInt(1) > 0
    Prepared(shares, cachedNodes, n, hasDangling)
  }

  /** The frame [[pageRank]] would checkpoint after its FIRST iteration — for
    * PLAN CAPTURE only (plans/r15): same prelude + one [[iterate]], no
    * checkpoint, cached prelude frames left persisted (callers are one-shot
    * inspection tools).
    */
  private[graft] def firstIterationForPlan(edges: DataFrame,
      damping: Double = 0.85, broadcastNodesBelow: Long = 500000L): DataFrame = {
    val p = prepare(edges, "src", "dst", "weight")
    iterate(p.cachedNodes.withColumn("rank", lit(1.0 / p.n)), p.cachedNodes,
      p.shares, p.n, (1.0 - damping) / p.n, damping, p.hasDangling,
      p.n <= broadcastNodesBelow.toDouble && broadcastNodesBelow > 0)
  }

  /** One power-iteration step (no checkpoint) — extracted so the loop body's
    * physical plan is inspectable on its own (`plans/r15/`); [[pageRank]] is
    * the only production caller and checkpoints each step.
    */
  private[graft] def iterate(ranks: DataFrame, cachedNodes: DataFrame,
      shares: DataFrame, n: Double, teleport: Double, damping: Double,
      hasDangling: Boolean, bcastRanks: Boolean): DataFrame = {
    def rankSide(df: DataFrame): DataFrame = if (bcastRanks) broadcast(df) else df
    val contrib = rankSide(ranks).join(shares, ranks("node") === shares("src"))
      .groupBy(col("dst").as("node"))
      .agg(sum(col("rank") * col("share")).as("c"))
    val joined = cachedNodes.join(rankSide(contrib), Seq("node"), "left")
    if (hasDangling) {
      // dangling nodes hold rank but emit no contributions; their mass spreads
      // uniformly (the standard stochastic-matrix fix), attached as ONE broadcast row
      val dangling = ranks.filter(col("dangling"))
        .agg(coalesce(sum("rank"), lit(0.0)).as("dm"))
      joined.crossJoin(broadcast(dangling))
        .select(col("node"), col("dangling"),
          (lit(teleport) + lit(damping) *
            (coalesce(col("c"), lit(0.0)) + col("dm") / lit(n))).as("rank"))
    } else
      joined.select(col("node"), col("dangling"),
        (lit(teleport) + lit(damping) * coalesce(col("c"), lit(0.0))).as("rank"))
  }
}
