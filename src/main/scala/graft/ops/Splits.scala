package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic dataset splitting for training pipelines.
  *
  * `randomSplit` re-deals rows on every run and partitioning; training data needs the
  * OPPOSITE: the same document must land in the same split across reruns, engines,
  * repartitions and incremental loads, or held-out data leaks into training. Hashing
  * the stable id gives exactly that — assignment is a pure per-row function.
  *
  * Spark-first / 100 TB notes: map-side only (no shuffle, no RNG state, whole-stage
  * codegen); md5 rather than xxhash64 because split assignment is an AUDITABLE
  * contract — any engine (DuckDB, Python, SQL) can replay `md5(id) % buckets` and
  * verify membership, which is worth one short-string hash per row.
  */
object Splits {

  val Buckets = 1000

  /** The 0-999 assignment bucket: first 15 hex chars of md5(id) parsed base-16
    * (60 bits — exact in any engine's 64-bit integers), mod 1000.
    */
  def bucketOf(idCol: Column): Column =
    conv(substring(md5(idCol.cast("string")), 1, 15), 16, 10).cast("long") % Buckets

  /** THE md5 shard formula — first 15 hex chars of md5(id) parsed base-16
    * (60 bits, exact in 64-bit integers and replayable byte-for-byte by
    * external engines), mod `numShards`. Every sharded operator
    * ([[shardAssign]], [[curriculumSchedule]], `Packing.lengthBuckets`)
    * routes through HERE — the cross-engine determinism contract lives in
    * one place.
    */
  def md5Shard(idCol: Column, numShards: Int): Column =
    (conv(substring(md5(idCol.cast("string")), 1, 15), 16, 10)
      .cast("long") % numShards).cast("int")

  /** K-FOLD cross-validation assignment: `fold` ∈ [0, k) from the one
    * [[md5Shard]] formula, so every row's fold is a pure function of its id —
    * reproducible across engines, sessions, and partitionings, and disjoint
    * by construction (a row is in exactly one fold). The evaluation-protocol
    * sibling of [[assign]]: train/val/test carves once, k-fold rotates.
    */
  def kFold(df: DataFrame, k: Int, idCol: String = "doc_id"): DataFrame = {
    require(k >= 2, s"k-fold needs k >= 2, got $k")
    df.withColumn("fold", md5Shard(col(idCol), k))
  }

  /** One rotation of the k-fold protocol: (train = every fold but `fold`,
    * test = `fold`). Zero-shuffle filters over the same deterministic tag.
    */
  def foldTrainTest(df: DataFrame, k: Int, fold: Int,
      idCol: String = "doc_id"): (DataFrame, DataFrame) = {
    require(fold >= 0 && fold < k, s"fold $fold outside [0, $k)")
    val tagged = kFold(df, k, idCol)
    (tagged.filter(col("fold") =!= fold).drop("fold"),
      tagged.filter(col("fold") === fold).drop("fold"))
  }

  /** Tag every row with `bucket` and a `split` label; `weights` are (label, fraction)
    * in assignment order and must sum to 1. Fractions resolve to whole buckets
    * (round(cum·1000)), so every bucket maps to exactly one label.
    */
  def assign(df: DataFrame, idCol: String = "doc_id",
      weights: Seq[(String, Double)] =
        Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05)): DataFrame = {
    val label = splitLabel(col(idCol), weights)
    df.withColumn("bucket", bucketOf(col(idCol))).withColumn("split", label)
  }

  /** The split label as a Column (for use inside larger selects). */
  def splitLabel(idCol: Column, weights: Seq[(String, Double)]): Column = {
    val b = bucketOf(idCol)
    thresholds(weights).tail.foldLeft(
      when(b < thresholds(weights).head._2, thresholds(weights).head._1)) {
      case (acc, (name, t)) => acc.when(b < t, name)
    }.otherwise(weights.last._1)
  }

  /** Deterministic stratified sampling: keep a row iff its md5 bucket falls below the
    * stratum's cut (`round(fraction·1000)` buckets). The workhorse for rebalancing a
    * training mix — e.g. keep 10% of English but all of a rare language.
    *
    * Same guarantees as [[assign]]: pure per-row function of the stable id, so the
    * sample is reproducible across runs/engines/partitionings, composable with
    * [[assign]] (sampling then splitting never leaks across splits), and map-side
    * only — no shuffle, no RNG state, stays in whole-stage codegen. Unlike
    * `df.sample`/`sampleBy`, adding rows to the input never changes which EXISTING
    * rows are kept (incremental-load stability).
    */
  def sampleStratified(df: DataFrame, strataCol: String, fractions: Map[String, Double],
      defaultFraction: Double = 0.0, idCol: String = "doc_id"): DataFrame = {
    require((fractions.values ++ Seq(defaultFraction)).forall(f => f >= 0 && f <= 1),
      "fractions must be in [0, 1]")
    df.filter(bucketOf(col(idCol)) < cutExpr(col(strataCol), fractions, defaultFraction))
  }

  /** The per-stratum bucket cut as a CASE column (stable key order for plan
    * determinism); shared with the SQL oracle.
    */
  def cutExpr(strata: Column, fractions: Map[String, Double],
      defaultFraction: Double): Column = {
    val cuts = fractions.toSeq.sortBy(_._1)
      .map { case (k, f) => (k, math.round(f * Buckets).toInt) }
    val default = lit(math.round(defaultFraction * Buckets).toInt)
    cuts.foldLeft(Option.empty[Column]) {
      case (acc, (k, c)) =>
        Some(acc.fold(when(strata === k, c))(_.when(strata === k, c)))
    }.fold(default)(_.otherwise(default))
  }

  /** Temperature-flattened mixture fractions: per-group keep fractions making the
    * SAMPLED group shares proportional to n_g^alpha (alpha < 1 flattens a skewed
    * source mix — the standard multilingual "temperature sampling" recipe, alpha =
    * 1/T), with the total sample sized at `targetFraction` of the corpus. Fractions
    * cap at 1 — sampling is without replacement, so a heavily flattened mix whose
    * rare groups saturate lands under target rather than duplicating rows.
    *
    * The group arithmetic runs in lexicographic group order so a replaying engine
    * (the DuckDB oracle) folds the same doubles in the same order — double addition
    * is not associative, and an unordered SUM could land a fraction on the other
    * side of a bucket boundary.
    */
  def temperatureFractions(counts: Seq[(String, Long)], alpha: Double,
      targetFraction: Double): Map[String, Double] = {
    require(alpha > 0 && alpha <= 1, s"alpha must be in (0, 1], got $alpha")
    require(targetFraction > 0 && targetFraction <= 1,
      s"targetFraction must be in (0, 1], got $targetFraction")
    require(counts.nonEmpty && counts.forall(_._2 > 0), "need positive group counts")
    val sorted = counts.sortBy(_._1)
    val pw = sorted.map { case (_, n) => math.pow(n.toDouble, alpha) }
    val totalW = pw.foldLeft(0.0)(_ + _)
    val totalN = sorted.foldLeft(0.0)(_ + _._2.toDouble)
    sorted.zip(pw).map { case ((g, n), w) =>
      g -> math.min(1.0, targetFraction * totalN * w / totalW / n)
    }.toMap
  }

  /** Per-row weighted sampling: keep each row with probability `weightCol` (a
    * [0, 1] column — e.g. a quality score, so better documents survive more often),
    * decided by the row's own md5 bucket. Same determinism contract as the other
    * samplers: pure per-row function of (id, weight), zero shuffle, reproducible
    * across engines and incremental loads; rows with NULL weight are dropped.
    * Resolution is 1/[[Buckets]] — weights round to the nearest 0.1%.
    */
  def sampleByWeight(df: DataFrame, weightCol: String,
      idCol: String = "doc_id"): DataFrame =
    df.filter(bucketOf(col(idCol)) < round(col(weightCol) * Buckets))

  /** Count groups (ONE tiny aggregation — group cardinality is sources/langs, i.e.
    * driver-metadata scale), derive temperature fractions, and sample. Rows with a
    * NULL group are dropped (no fraction can be assigned to them).
    */
  def temperatureSample(df: DataFrame, groupCol: String, alpha: Double,
      targetFraction: Double, idCol: String = "doc_id"): DataFrame = {
    val counts = df.filter(col(groupCol).isNotNull).groupBy(groupCol).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
    sampleStratified(df, groupCol, temperatureFractions(counts, alpha, targetFraction),
      defaultFraction = 0.0, idCol = idCol)
  }

  /** Class balancing: downsample every group toward the SMALLEST group's size
    * (fraction_g = min_n / n_g) — the standard equalized training mix for a skewed
    * label/language distribution. Deterministic md5-bucket membership like every
    * sampler here; expected (not exact) per-group sizes, since membership must stay
    * a pure per-row function for reproducibility. One tiny counting aggregation,
    * then a zero-shuffle filter.
    */
  def equalizeGroups(df: DataFrame, groupCol: String,
      idCol: String = "doc_id"): DataFrame = {
    val counts = df.filter(col(groupCol).isNotNull).groupBy(groupCol).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
    require(counts.nonEmpty, "no non-null groups to balance")
    val minN = counts.map(_._2).min
    val fractions = counts.map { case (g, n) => g -> minN.toDouble / n }.toMap
    sampleStratified(df, groupCol, fractions, defaultFraction = 0.0, idCol = idCol)
  }

  /** Hard per-group cap: keep at most `cap` rows per group, chosen deterministically
    * by md5(id) order — the RefinedWeb-style per-domain/per-source cap that stops any
    * one origin from dominating a training mix. (The fraction samplers above give
    * EXPECTED sizes; a cap is a guarantee, so it needs exact per-group top-k.)
    *
    * Scale shape: selection runs through [[graft.functions.BottomKByKey]], a
    * TypedImperativeAggregate — every task reduces its partition to ≤ cap candidate
    * ids per group map-side, so only cap-sized buffers shuffle even when one hot
    * source holds billions of rows (the `row_number()` window formulation would
    * shuffle-and-sort the hot group onto one task). The kept-id set (≤ groups × cap)
    * then semi-joins back, where AQE broadcasts it whenever it is small.
    */
  def capGroups(df: DataFrame, groupCol: String, cap: Int,
      idCol: String = "doc_id"): DataFrame = {
    require(cap > 0, s"cap must be positive, got $cap")
    val id = col(idCol).cast("string")
    val kept = df.groupBy(col(groupCol))
      .agg(graft.functions.BottomKByKey.bottom_k_by_key(md5(id), id, cap).as("keep"))
      .select(explode(col("keep")).as("__keep_id"))
    df.join(kept, id === col("__keep_id"), "left_semi")
  }

  /** Deterministic training-shard assignment: shard = md5(id) mod `numShards`, and a
    * 1-based `position` within the shard following md5 order — a reproducible global
    * shuffle of the corpus into equal-sized shards, which is what a training run
    * needs for stable data order across reruns and engines (`orderBy(rand())`
    * re-deals every run; this never does).
    *
    * Scale shape: shard assignment is a pure per-row hash; only the within-shard
    * position pays a shuffle (one exchange on the shard key; the hash makes shards
    * uniform so no skew). To EMIT shards, follow with
    * `repartition(numShards, col("shard")).sortWithinPartitions("position")` and a
    * partitioned write — the same exchange, reused.
    */
  def shardAssign(df: DataFrame, numShards: Int,
      idCol: String = "doc_id"): DataFrame = {
    require(numShards > 0, s"numShards must be positive, got $numShards")
    val h = md5(col(idCol).cast("string"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard")).orderBy(h, col(idCol).cast("string"))
    df.withColumn("shard", md5Shard(col(idCol), numShards))
      .withColumn("position", row_number().over(w))
  }

  /** Curriculum schedule (curriculum-learning data prep): order the corpus
    * easy→hard without ever sorting it globally. `phases` equal-mass difficulty
    * bands are cut by broadcast percentile cutoffs over `scoreCol`
    * (phase 0 = lowest scores; ties at a cutoff stay in the lower phase), then
    * each phase gets the [[shardAssign]] treatment — deterministic md5 shard and
    * within-(phase, shard) position — so a trainer streams phase 0's shards,
    * then phase 1's, in a byte-reproducible order. Scale shape: one tiny
    * percentile agg broadcast back, one narrow md5 projection, and the position
    * window over (phase, shard) partitions of ~corpus/(phases·numShards) rows —
    * the same bound as plain shard assignment, never a global sort.
    *
    * `exact` picks the cutoff aggregate — the same dual path as the
    * per-group quality floor (see SCALE.md): `true` (default) uses exact
    * `percentile`, whose buffer is a value→count map — fine whenever the score
    * has bounded distinct values (int lengths, bucketed scores), and the
    * contract-replayable choice; `false` uses `approx_percentile`
    * (t-digest-style sketch, constant memory), the 100 TB path for CONTINUOUS
    * scores where distinct values ≈ rows and the exact buffer is an OOM shape.
    * Approx cutoffs move phase boundaries by the sketch's rank error (~1/acc);
    * everything else — shard, position, determinism — is unchanged.
    */
  def curriculumSchedule(df: DataFrame, scoreCol: String, phases: Int = 3,
      numShards: Int = 8, idCol: String = "doc_id",
      exact: Boolean = true, accuracy: Int = 10000): DataFrame = {
    require(phases >= 2, s"need at least 2 phases, got $phases")
    require(numShards > 0, s"numShards must be positive, got $numShards")
    require(accuracy > 0, s"accuracy must be positive, got $accuracy")
    val cutCols = (1 until phases).map { i =>
      val agg =
        if (exact) s"percentile($scoreCol, $i.0D / $phases)"
        else s"approx_percentile($scoreCol, $i.0D / $phases, $accuracy)"
      expr(agg).as(s"__cut_$i")
    }
    val cuts = df.agg(cutCols.head, cutCols.tail: _*)
    val h = md5(col(idCol).cast("string"))
    val shard = md5Shard(col(idCol), numShards)
    val phase = (1 until phases).foldLeft(lit(0)) { (acc, i) =>
      acc + when(col(scoreCol) > col(s"__cut_$i"), 1).otherwise(0) }
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("phase"), col("shard"))
      .orderBy(h, col(idCol).cast("string"))
    df.crossJoin(broadcast(cuts))
      .withColumn("phase", phase)
      .withColumn("shard", shard)
      .withColumn("position", row_number().over(w))
      .drop((1 until phases).map(i => s"__cut_$i"): _*)
  }

  /** (label, exclusive upper bucket) boundaries — shared with the SQL oracle so both
    * engines cut at identical buckets.
    */
  def thresholds(weights: Seq[(String, Double)]): Seq[(String, Int)] = {
    require(weights.nonEmpty, "need at least one split")
    val total = weights.map(_._2).sum
    require(math.abs(total - 1.0) < 1e-9, s"weights must sum to 1, got $total")
    val cum = weights.map(_._2).scanLeft(0.0)(_ + _).tail
    weights.map(_._1).zip(cum.map(c => math.round(c * Buckets).toInt))
  }
}
