package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout clustering for scan pruning.
  *
  * At 100 TB the cheapest scan is the one that never reads the file: parquet keeps
  * per-file/row-group min-max stats, and Spark prunes files whose ranges miss the
  * predicate. A linear sort clusters ONE column; Z-ordering interleaves the bits of
  * several columns' bucket ranks so every output file covers a narrow range in EACH
  * clustered column — multi-dimensional pruning from one layout pass.
  *
  * Spark-first notes: bucket boundaries come from ONE sampled `approxQuantile` pass over
  * all columns (the same sample-based approach `repartitionByRange`'s RangePartitioner
  * uses); the z-value is a pure per-row Column expression (codegen'd bit math over
  * broadcast boundary literals — no UDF, no shuffle), and the only wide operation is the
  * final `repartitionByRange` + in-partition sort that the layout exists to pay for.
  */
object Layout {

  /** Cluster `df` by the Z-order of `cols`, producing `numFiles` range-partitioned,
    * internally sorted partitions (write each partition as one file). Null sorts as the
    * lowest bucket. `bitsPerCol` bounds layout resolution: 2^bits buckets per column.
    */
  def zorderBy(df: DataFrame, cols: Seq[String], numFiles: Int,
      bitsPerCol: Int = 6): DataFrame = {
    require(cols.nonEmpty, "zorderBy needs at least one column")
    val z = zvalue(df, cols, bitsPerCol)
    df.withColumn("__z", z)
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
  }

  /** The interleaved-bits z-value as a Column (exposed for tests/diagnostics). */
  private[graft] def zvalue(df: DataFrame, cols: Seq[String], bitsPerCol: Int): Column = {
    // validate BEFORE the approxQuantile scan — an invalid call must not pay a
    // full sampling pass over the dataset just to fail
    require(bitsPerCol * cols.length <= 63,
      s"z-value overflows a long: $bitsPerCol bits × ${cols.length} cols")
    val buckets = 1 << bitsPerCol
    val probs = (1 until buckets).map(_.toDouble / buckets).toArray
    // one sampled pass computes every column's boundaries
    val boundaries = df.stat.approxQuantile(cols.toArray, probs, 0.01)
    val ranks = cols.zip(boundaries).map { case (c, bs) =>
      // bucket rank = #boundaries ≤ value; nulls fall through to 0. LONG from the
      // start: interleaved bit positions reach bitsPerCol*ncols-1, and an int shift
      // would wrap its distance mod 32 (silently corrupting layouts past 5 columns)
      bs.distinct.sorted.foldLeft(lit(0L)) { (acc, b) =>
        acc + when(col(c).cast("double") >= lit(b), 1L).otherwise(0L)
      }
    }
    // interleave: bit i of column j lands at position i*ncols + j
    val terms = for {
      (rank, j) <- ranks.zipWithIndex
      i <- 0 until bitsPerCol
    } yield shiftleft(shiftright(rank, i).bitwiseAND(lit(1L)), i * cols.length + j)
    terms.reduce(_ + _)
  }
}
