package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation utilities: salted two-phase aggregation and salted broadcast-replicate
  * joins.
  *
  * AQE's skew-join splitting handles most runtime skew; these are for the pathological
  * cases AQE can't fix — a groupBy where one key holds a double-digit percentage of all
  * rows (hot partition saturates one task), or a shuffle join against a hot key. Salting
  * trades one extra (cheap, pre-reduced) shuffle for even task sizing.
  *
  * The salt is `pmod(hash(saltSource), buckets)` — deterministic (reruns produce
  * identical results), and `saltSource` should be a high-cardinality column so rows of a
  * hot key spread evenly.
  */
object Salt {

  def saltColumn(saltSource: Column, buckets: Int): Column =
    pmod(hash(saltSource), lit(buckets))

  /** Two-phase salted count+sum aggregation: phase 1 reduces (keys, salt) partitions,
    * phase 2 merges the per-salt partials. Counts and integer/decimal sums are identical
    * to a direct `groupBy(keys).agg(...)` for any bucket count; DOUBLE sums agree only up
    * to floating-point reassociation — pass a decimal-cast column when bit-exact results
    * matter (the engine's money paths already do).
    */
  def saltedCountSum(
      df: DataFrame, keys: Seq[String], sumCol: String,
      saltSource: Column, buckets: Int = 16): DataFrame = {
    val partial = df
      .withColumn("__salt", saltColumn(saltSource, buckets))
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(count(lit(1)).as("__n"), sum(col(sumCol)).as("__s"))
    partial
      .groupBy(keys.map(col): _*)
      .agg(sum(col("__n")).as("n_rows"), sum(col("__s")).as(s"sum_$sumCol"))
  }

  /** Skewed equi-join: salt the big (skewed) side, replicate the small side across all
    * salt buckets, join on (key, salt). Equivalent to `big.join(small, keys)` when keys
    * are unique on the small side; bounds any hot key's rows to `buckets` tasks.
    */
  def saltedJoin(
      big: DataFrame, small: DataFrame, keys: Seq[String],
      saltSource: Column, buckets: Int = 16): DataFrame = {
    val saltedBig = big.withColumn("__salt", saltColumn(saltSource, buckets))
    val replicatedSmall = small.withColumn("__salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    saltedBig.join(replicatedSmall, keys :+ "__salt").drop("__salt")
  }
}
