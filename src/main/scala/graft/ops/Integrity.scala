package graft.ops

import org.apache.spark.sql.DataFrame

/** Referential-integrity / orphan detection.
  *
  * Reference: `curated/data_quality.py:75-76` — `df1.join(df2, on=key, how='left_anti')`
  * to find fact rows whose key has no match in the dimension (SURVEY.md §2.4 J2).
  *
  * Spark-first notes: when the dimension is broadcastable Catalyst plans a
  * BroadcastHashJoin(LeftAnti) — no shuffle of the fact side at all; otherwise AQE
  * converts to a shuffled hash anti-join sized at runtime. NULL fact keys are kept by
  * left_anti (SQL `NOT EXISTS` semantics on the equi-key).
  */
object Integrity {

  /** Rows of `facts` whose `key` does not appear in `dimension`. */
  def orphans(facts: DataFrame, dimension: DataFrame, key: Seq[String]): DataFrame =
    facts.join(dimension, key, "left_anti")

  /** Count of orphans — the reference's consistency-check scalar. */
  def orphanCount(facts: DataFrame, dimension: DataFrame, key: Seq[String]): Long =
    orphans(facts, dimension, key).count()
}
