package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Edit-distance self-join (fuzzy entity resolution) via deletion neighborhoods —
  * the FastSS / SymSpell blocking scheme: two strings within Levenshtein distance d
  * share at least one common variant among the strings reachable by deleting up to d
  * characters from each. Generating those variants per row turns the quadratic
  * all-pairs problem into an equality join on variant, with an exact
  * `levenshtein` verification on the (small) candidate set.
  *
  * The reference has no fuzzy matching; this is part of the training-data-curation
  * tier (duplicate entity names, near-identical titles/URLs) where exact dedup
  * (`Dedup.exact`) is too strict and shingle similarity (`Dedup.ngramJaccardPairs`)
  * is tuned for long documents, not short keys.
  *
  * Scale shape: each string of length L yields ≤ 1 + L (d=1) or O(L²) (d=2)
  * variants; the shuffle carries (id, 8-byte variant hash, short string) rows and
  * the join is a plain equality shuffle join — never a cartesian. Hash collisions
  * only add candidates, which the exact verification discards. `maxVariantDf` caps
  * pathological blocks (e.g. near-empty strings whose variants are shared by
  * thousands of rows) the same way `Dedup.maxShingleDf` caps shingle fan-out;
  * capping drops only pairs mediated exclusively by such ultra-common variants.
  */
object FuzzyJoin {

  /** All strings reachable from `v` by deleting exactly one character (empty
    * strings have none). `sequence` would flip into descending steps on
    * `length = 0`, hence the guard.
    */
  private def deletions(v: Column): Column =
    when(length(v) <= 0, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(0), length(v) - 1), i =>
        concat(v.substr(lit(1), i), v.substr(i + lit(2), length(v)))))

  /** The deletion neighborhood of `s` up to depth `maxDist` (including `s`). */
  private def neighborhood(s: Column, maxDist: Int): Column = maxDist match {
    case 1 => array_distinct(concat(array(s), deletions(s)))
    case 2 =>
      val d1 = deletions(s)
      array_distinct(concat(array(s), d1, flatten(transform(d1, deletions(_)))))
  }

  /** Exact pairs `(id_1 < id_2)` with `levenshtein(s_1, s_2) <= maxDist`
    * (`maxDist` ∈ {1, 2}), columns `id_1, id_2, s_1, s_2, dist`.
    * With `maxVariantDf > 0`, variants shared by more than that many rows are
    * dropped from candidate generation (recall cap, see object doc).
    */
  def editDistancePairs(df: DataFrame, idCol: String, strCol: String,
      maxDist: Int = 1, maxVariantDf: Int = 0): DataFrame = {
    require(maxDist == 1 || maxDist == 2, s"maxDist must be 1 or 2, got $maxDist")
    // two select steps: generating variants in the same projection that aliases
    // the string column trips Spark's lateral-column-alias resolution when the
    // input column is itself named "s"
    val base = df.select(col(idCol).as("id"), col(strCol).as("s"))
    val exploded = base
      .select(col("id"), col("s"),
        explode(neighborhood(col("s"), maxDist)).as("variant"))
      .select(col("id"), col("s"), xxhash64(col("variant")).as("vh"))
    val candidates =
      if (maxVariantDf <= 0) exploded
      else {
        val rare = exploded.groupBy("vh").count()
          .filter(col("count") <= maxVariantDf).select("vh")
        exploded.join(rare, "vh")
      }
    candidates.as("a")
      .join(candidates.as("b"),
        col("a.vh") === col("b.vh") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_1"), col("b.id").as("id_2"),
        col("a.s").as("s_1"), col("b.s").as("s_2"))
      // verify ONCE per pair, after the candidate dedup, not per shared variant
      .dropDuplicates("id_1", "id_2")
      .withColumn("dist", levenshtein(col("s_1"), col("s_2")))
      .filter(col("dist") <= maxDist)
  }
}
