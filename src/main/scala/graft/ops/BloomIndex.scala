package graft.ops

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.BinaryType

/** A persistable Bloom membership artifact for incremental corpus ingest — the
  * "have I ever seen this key" primitive that, at 100 TB, must not cost a join
  * against the full index.
  *
  * Built with Spark's own `BloomFilterAggregate` (the expression behind runtime
  * bloom-filter join pruning): each task folds its rows into a local bitset and the
  * partials OR together — one scan, no shuffle of the keys, and the artifact is
  * DETERMINISTIC (a bitset OR is order- and partitioning-independent, so the same
  * corpus always yields byte-identical bytes — asserted in the spec). Probing is the
  * native `BloomFilterMightContain` predicate over `xxhash64` — codegen'd, zero
  * shuffle, evaluated map-side against the broadcast-literal artifact.
  *
  * The design point is [[newKeysOnly]]: bloom answers are one-sided (no false
  * negatives), so rows the bloom has never seen skip the verify join ENTIRELY, and
  * only the maybe-seen sliver (true dups + ~fpp of the fresh rows) pays the exact
  * anti-join. The result is EXACT — the bloom only prunes; it never decides.
  *
  * Sizing: `BloomFilterAggregate` silently clamps its inputs to
  * `spark.sql.optimizer.runtime.bloomFilter.maxNumItems` / `.maxNumBits`
  * (defaults 4M items / 2^26 bits ≈ 8 MB) — a clamp would keep results exact (the
  * verify join catches the extra false positives) but quietly destroy the pruning
  * this artifact exists for, so [[build]] fails fast instead when the requested
  * size exceeds the session caps. For bigger corpora raise both confs for the
  * build (10^9 keys at 1% fpp needs ~1.2 GB of bits — still broadcastable), or
  * shard the index by key range.
  */
object BloomIndex {

  /** One-pass build over `key`: serialized bloom bytes sized for `expectedItems`
    * at `fpp`. Keys hash through xxhash64 (seed 42) — [[mightContain]] probes with
    * the identical hash, so build and probe stay consistent.
    */
  def build(df: DataFrame, key: Column, expectedItems: Long, fpp: Double): Array[Byte] = {
    require(expectedItems > 0, s"expectedItems must be positive; got $expectedItems")
    require(fpp > 0 && fpp < 1, s"fpp must be in (0, 1); got $fpp")
    val numBits = org.apache.spark.util.sketch.BloomFilter
      .optimalNumOfBits(expectedItems, fpp)
    // BloomFilterAggregate clamps to these session caps with Math.min — no error,
    // no log — which would silently inflate the effective fpp far past what the
    // caller asked for. Surface that as a hard failure with the remedy instead.
    val conf = df.sparkSession.conf
    val maxItems = conf.get("spark.sql.optimizer.runtime.bloomFilter.maxNumItems").toLong
    val maxBits = conf.get("spark.sql.optimizer.runtime.bloomFilter.maxNumBits").toLong
    require(expectedItems <= maxItems && numBits <= maxBits,
      s"bloom build of $expectedItems items at fpp=$fpp needs $numBits bits, but the " +
        s"session caps BloomFilterAggregate at $maxItems items / $maxBits bits and " +
        "would silently clamp (exactness survives, pruning does not). Raise " +
        "spark.sql.optimizer.runtime.bloomFilter.maxNumItems / .maxNumBits for the " +
        "build, or shard the index by key range.")
    val agg = new BloomFilterAggregate(
      new XxHash64(Seq(ColumnBridge.expression(key))),
      Literal(expectedItems), Literal(numBits))
    df.select(ColumnBridge.column(agg.toAggregateExpression()).as("bloom"))
      .head().getAs[Array[Byte]](0)
  }

  /** Native maybe-seen predicate: false ⇒ the key was definitely NOT in the built
    * corpus (the one-sided guarantee everything rests on); true ⇒ verify exactly.
    */
  def mightContain(bloom: Array[Byte], key: Column): Column =
    ColumnBridge.column(BloomFilterMightContain(
      Literal(bloom, BinaryType),
      new XxHash64(Seq(ColumnBridge.expression(key)))))

  /** Exact anti-join semantics (batch rows whose `keyCol` is absent from `index`),
    * with the bloom pruning the probe side: definitely-new rows never reach the
    * join, maybe-seen rows verify against the index. At a 1% fpp and a mostly-fresh
    * batch, the join processes ~(dup fraction + 1%) of the batch instead of all of
    * it — and the index side still prunes/pushes down as usual.
    */
  def newKeysOnly(batch: DataFrame, keyCol: String, index: DataFrame,
      bloom: Array[Byte]): DataFrame = {
    val flagged = batch.withColumn("__maybe_seen", mightContain(bloom, col(keyCol)))
    val definitelyNew = flagged.filter(!col("__maybe_seen"))
    val verifiedNew = flagged.filter(col("__maybe_seen"))
      .join(index.select(col(keyCol)).distinct(), Seq(keyCol), "left_anti")
    definitelyNew.unionByName(verifiedNew).drop("__maybe_seen")
  }

  /** Persist the artifact beside the corpus it indexes (tiny driver-side write). */
  def save(spark: SparkSession, bloom: Array[Byte], path: String): Unit = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val out = fs.create(p, true)
    try out.write(bloom) finally out.close()
  }

  def load(spark: SparkSession, path: String): Array[Byte] = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val len = fs.getFileStatus(p).getLen.toInt
    val in = fs.open(p)
    try {
      val bytes = new Array[Byte](len)
      in.readFully(bytes)
      bytes
    } finally in.close()
  }
}
