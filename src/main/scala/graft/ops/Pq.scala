package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product quantization for embedding compression and fast approximate search
  * (Jégou, Douze, Schmid 2011, "Product Quantization for Nearest Neighbor Search").
  *
  * Each d-dim vector splits into `m` subvectors; each subspace gets its own
  * `ksub`-codeword codebook (subspace k-means); a vector is stored as `m` small
  * integer codes. At ksub ≤ 256 that is m bytes instead of 4d — a 32× reduction for
  * d=64/m=8 — which at 100 TB of embeddings is the difference between "the index
  * fits in cluster memory" and "it does not".
  *
  * Scale shapes:
  *  - training shuffles only (subspace, code, pos)-keyed means — corpus rows never
  *    shuffle; train on a sample at real scale (signature takes any DataFrame);
  *  - encoding is PURE MAP: the codebook folds into one broadcast row and every
  *    vector computes its m argmins in place — no shuffle, no driver action (m is
  *    derived column-side from the codebook, not probed);
  *  - ADC search scans the NARROW codes table; each query pre-computes an m×ksub
  *    lookup table once, so a (query, vector) pair costs m map lookups, not a
  *    d-dim distance.
  *
  * Distances are squared-L2 (the PQ-native metric; the cosine tiers live in
  * [[Similarity]] and [[Ivf]]).
  */
object Pq {

  /** Squared L2 distance between two equal-length double arrays. */
  private[ops] def sqDist(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)), lit(0.0), _ + _)

  /** codes for (j, code) pack into one map key; ksub ≤ 65536 enforced at train. */
  private[ops] def cbKey(j: Column, code: Column): Column = j * 65536 + code

  private[ops] def baseVecs(embeddings: DataFrame, idCol: String, vecCol: String) =
    embeddings.select(col(idCol).as("vec_id"),
      Similarity.toDoubleVec(col(vecCol)).as("v"))

  /** Per-subspace rows: (vec_id, j, sv) — the training layout. */
  private[ops] def subVecs(base: DataFrame, m: Int): DataFrame = {
    val dsub = (size(col("v")) / m).cast("int")
    base.select(col("vec_id"),
        explode(sequence(lit(0), lit(m - 1))).as("j"),
        col("v"))
      .select(col("vec_id"), col("j"),
        slice(col("v"), col("j") * dsub + 1, dsub).as("sv"))
  }

  /** Deterministic seed codebooks: subspace slices of the `ksub` lowest-id vectors
    * (same convention as [[Ivf.seedCentroids]] — keeps fixtures reproducible; real
    * deployments refine with [[trainCodebooks]]).
    */
  def seedCodebooks(embeddings: DataFrame, m: Int, ksub: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    subVecs(baseVecs(embeddings, idCol, vecCol), m)
      .filter(col("vec_id") < ksub)
      .select(col("j").as("subspace"), col("vec_id").cast("int").as("code"),
        col("sv").as("cw"))

  /** Assign every (vec_id, j, sv) row its argmin-L2 codeword (smallest code wins
    * ties). Codebook broadcast as one collected row; assignment is map-side.
    */
  private[ops] def assignCodes(sub: DataFrame, codebooks: DataFrame): DataFrame = {
    val cbRow = codebooks
      .agg(collect_list(struct(col("subspace"), col("code"), col("cw"))).as("cbs"))
    val mine = filter(col("cbs"), c => c.getField("subspace") === col("j"))
    val best = aggregate(mine,
      struct(lit(Double.MaxValue).as("bd"), lit(Int.MaxValue).as("bc")),
      (acc, c) => {
        val d = sqDist(col("sv"), c.getField("cw"))
        when(d < acc.getField("bd") ||
            (d === acc.getField("bd") && c.getField("code") < acc.getField("bc")),
          struct(d.as("bd"), c.getField("code").as("bc")))
          .otherwise(acc)
      })
    sub.crossJoin(broadcast(cbRow))
      .withColumn("code", best.getField("bc"))
      .drop("cbs")
  }

  /** Lloyd refinement of [[seedCodebooks]] in every subspace at once: each iteration
    * is one assignment scan plus an (m × ksub × dsub)-keyed mean — corpus rows never
    * shuffle. Empty codewords drop out (as in [[Ivf.trainCentroids]]).
    */
  def trainCodebooks(embeddings: DataFrame, m: Int, ksub: Int, iters: Int = 4,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(m > 0, "m must be positive")
    require(ksub > 0 && ksub <= 65536, s"ksub must be in [1, 65536], got $ksub")
    val sub = subVecs(baseVecs(embeddings, idCol, vecCol), m)
    var cb = seedCodebooks(embeddings, m, ksub, idCol, vecCol)
    for (_ <- 0 until iters) {
      cb = assignCodes(sub, cb)
        .select(col("j"), col("code"), posexplode(col("sv")).as(Seq("pos", "x")))
        .groupBy(col("j"), col("code"), col("pos"))
        .agg(avg(col("x")).as("mean"))
        .groupBy(col("j"), col("code"))
        .agg(array_sort(collect_list(struct(col("pos"), col("mean")))).as("pm"))
        .select(col("j").as("subspace"), col("code"),
          transform(col("pm"), p => p.getField("mean")).as("cw"))
        .localCheckpoint() // truncate the per-iteration plan lineage
    }
    cb
  }

  /** Encode every vector to its m codes — PURE MAP: broadcast codebook row, per-row
    * argmin in each subspace; `m` and `dsub` are derived column-side from the
    * codebook so no driver action runs. Output: `(vec_id, [passthrough...], codes
    * ARRAY<INT>)` — `passthrough` columns ride along so callers that need extra
    * attributes (e.g. IVF-PQ's cluster id) don't pay a second scan + self-join.
    *
    * `withError = true` additionally emits `qerr` — the vector's total squared
    * quantization error Σ_j ||sv_j − cw_j(code_j)||², available for free at
    * encode time (each subspace argmin already carries its best distance) —
    * the per-batch codebook-fit signal the persisted-index maintainers record
    * ([[IvfPq.pqDrift]]). The per-subspace (distance, code) structs land as an
    * ATTRIBUTE in their own projection first: array higher-order functions are
    * interpreted (no codegen CSE), so deriving codes and qerr from one
    * materialized array costs one argmin sweep, not two.
    */
  def encode(embeddings: DataFrame, codebooks: DataFrame,
      idCol: String = "vec_id", vecCol: String = "embedding",
      passthrough: Seq[String] = Nil, withError: Boolean = false): DataFrame = {
    val cbRow = codebooks
      .agg(collect_list(struct(col("subspace"), col("code"), col("cw"))).as("cbs"))
    val mCol = size(array_distinct(transform(col("cbs"), c => c.getField("subspace"))))
    val dsub = (size(col("v")) / mCol).cast("int")
    val encAt = (j: Column) => {
      val sv = slice(col("v"), j * dsub + 1, dsub)
      val mine = filter(col("cbs"), c => c.getField("subspace") === j)
      aggregate(mine,
        struct(lit(Double.MaxValue).as("bd"), lit(Int.MaxValue).as("bc")),
        (acc, c) => {
          val d = sqDist(sv, c.getField("cw"))
          when(d < acc.getField("bd") ||
              (d === acc.getField("bd") && c.getField("code") < acc.getField("bc")),
            struct(d.as("bd"), c.getField("code").as("bc")))
            .otherwise(acc)
        })
    }
    val encoded = embeddings
      .select((col(idCol).as("vec_id") +: passthrough.map(col)) :+
        Similarity.toDoubleVec(col(vecCol)).as("v"): _*)
      .crossJoin(broadcast(cbRow))
      .withColumn("__enc", transform(sequence(lit(0), mCol - 1), encAt))
    val codesCol = transform(col("__enc"), e => e.getField("bc")).as("codes")
    val outCols = (col("vec_id") +: passthrough.map(col)) :+ codesCol
    if (!withError) encoded.select(outCols: _*)
    else encoded.select(outCols :+ aggregate(col("__enc"), lit(0.0),
      (acc, e) => acc + e.getField("bd")).as("qerr"): _*)
  }

  /** Mean squared reconstruction error over the corpus — the codebook-quality
    * metric ([[trainCodebooks]] iterations must not increase it; property-tested).
    */
  def reconstructionError(embeddings: DataFrame, codebooks: DataFrame,
      idCol: String = "vec_id", vecCol: String = "embedding"): Double = {
    val m = codebooks.select(col("subspace")).distinct().count().toInt
    val sub = subVecs(baseVecs(embeddings, idCol, vecCol), m)
    val cb = codebooks.select(col("subspace").as("cb_sub"),
      col("code").as("cb_code"), col("cw"))
    assignCodes(sub, codebooks)
      .join(broadcast(cb),
        col("j") === col("cb_sub") && col("code") === col("cb_code"))
      .select(sqDist(col("sv"), col("cw")).as("e"))
      .agg(avg(col("e")).as("mse"))
      .first().getDouble(0)
  }

  /** ADC top-k: queries (vec_id < numQueries) search the CODES table. Each query
    * pre-computes its m×ksub lookup table of subspace distances ONCE (map from
    * packed (j, code) to distance), then every (query, vector) pair costs m map
    * lookups over the m-byte codes — never a d-dim distance against corpus
    * payloads. Approximate squared-L2 ascending, vec_id tiebreak.
    */
  def adcTopK(embeddings: DataFrame, codebooks: DataFrame,
      numQueries: Int = 10, k: Int = 5,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val codes = encode(embeddings, codebooks, idCol, vecCol)
    val cbRow = codebooks
      .agg(collect_list(struct(col("subspace"), col("code"), col("cw"))).as("cbs"))
    val mCol = size(array_distinct(transform(col("cbs"), c => c.getField("subspace"))))
    val dsub = (size(col("qv")) / mCol).cast("int")
    val luts = baseVecs(embeddings, idCol, vecCol)
      .filter(col("vec_id") < numQueries)
      .select(col("vec_id").as("query_id"), col("v").as("qv"))
      .crossJoin(broadcast(cbRow))
      .select(col("query_id"),
        map_from_entries(transform(col("cbs"), c => struct(
          cbKey(c.getField("subspace"), c.getField("code")),
          sqDist(slice(col("qv"),
            c.getField("subspace") * dsub + 1, dsub), c.getField("cw")))))
          .as("lut"),
        mCol.as("m"))
    // 4-dp grid BEFORE ranking, as in [[IvfPq.searchCodes]]: near-tied
    // quantization distances tie-break on vec_id identically in any engine
    val approx = codes.crossJoin(broadcast(luts))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("adist",
        round(aggregate(sequence(lit(0), col("m") - 1), lit(0.0),
          (acc, j) => acc + element_at(col("lut"),
            cbKey(j, element_at(col("codes"), j + 1)))), 4))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("adist").asc, col("vec_id"))
    approx.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("vec_id"),
        col("adist").as("approx_sq_dist"))
  }
}
