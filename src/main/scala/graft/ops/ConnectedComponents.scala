package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over an undirected edge list by iterative min-label
  * propagation — the clustering step that turns near-duplicate PAIRS into duplicate
  * GROUPS (each cluster keeps its minimum doc id as the canonical representative).
  *
  * Spark-first notes: the classic DataFrame formulation — symmetrize edges once, then
  * repeat (join labels to neighbors → min per node → compare). Converges in
  * O(graph diameter) rounds; near-dup graphs are shallow (dup clusters are cliques or
  * short chains), so 3–5 rounds typical. Each round is one shuffle join + one
  * aggregation. At 100 TB scale: `localCheckpoint` every few rounds cuts the growing
  * lineage, and the per-round `changed` count doubles as the convergence telemetry.
  */
object ConnectedComponents {

  /** @param edges two-column DataFrame of undirected edges
    * @return (node, component) — component = min node id reachable from `node`
    *
    * Each round combines neighbor-min propagation with POINTER JUMPING (take the label
    * of your label), so long chains converge in O(log diameter) rounds instead of one
    * hop per round. `localCheckpoint` truncates the per-round lineage growth.
    */
  def apply(edges: DataFrame, maxIterations: Int = 20): DataFrame = {
    val e = edges.toDF("src", "dst")
    val sym = e.union(e.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .localCheckpoint(true)
    var labels = sym.select(col("src").as("node")).distinct()
      .withColumn("component", col("node"))
      .localCheckpoint(true)
    var changed = 1L
    var i = 0
    while (changed > 0 && i < maxIterations) {
      val neighborMin = sym
        .join(labels, sym("dst") === labels("node"))
        .groupBy(sym("src").as("nbr_node"))
        .agg(min(col("component")).as("nbr_component"))
      val propagated = labels
        .join(neighborMin, labels("node") === neighborMin("nbr_node"), "left")
        .select(col("node"), col("component"),
          least(col("component"),
            coalesce(col("nbr_component"), col("component"))).as("mid"))
      // pointer jump: follow the new label one more step through the CURRENT labels
      val lol = labels.select(col("node").as("p_node"), col("component").as("p_comp"))
      val updated = propagated
        .join(lol, propagated("mid") === lol("p_node"), "left")
        .select(col("node"), col("component"),
          least(col("mid"), coalesce(col("p_comp"), col("mid"))).as("next"))
        .localCheckpoint(true)
      changed = updated.filter(col("next") =!= col("component")).count()
      labels = updated.select(col("node"), col("next").as("component"))
        .localCheckpoint(true)
      i += 1
    }
    // silent non-convergence would hand downstream dedup WRONG cluster labels (groups
    // split or mislabeled with no signal) — fail loudly instead
    if (changed > 0) throw new IllegalStateException(
      s"connected components did not converge after $maxIterations iterations " +
        s"($changed labels still changing); raise maxIterations")
    labels
  }

  /** Full near-duplicate grouping: pairs above the Jaccard threshold → components.
    * Docs in no pair are singletons and are not returned (their component is
    * trivially themselves).
    */
  def nearDuplicateClusters(
      df: DataFrame, idCol: String = "doc_id", textCol: String = "text",
      n: Int = 3, threshold: Double = 0.5): DataFrame = {
    val pairs = Dedup.ngramJaccardPairs(df, idCol, textCol, n, threshold)
      .select("doc_a", "doc_b")
    apply(pairs)
  }
}
