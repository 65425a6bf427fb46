package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF-Flat approximate nearest neighbor: coarse quantization (an inverted file over
  * centroids) restricts each query's exact search to its `nprobe` nearest clusters.
  * The third ANN tier next to [[Similarity.cosineTopK]] (exact) and
  * [[Similarity.annTopK]] (LSH): IVF gives data-adaptive buckets where LSH gives
  * data-oblivious ones, the standard trade at production scale.
  *
  * Centroids are a plain `(centroid_id, cv)` DataFrame PARAMETER: train them with
  * [[trainCentroids]] (Lloyd's), or pass any offline-trained/seeded table. At 100 TB the
  * centroid table stays tiny (nlist ≤ tens of thousands), so every join below is a
  * broadcast: assignment is one streaming scan with a map-side argmax — the only
  * shuffles are the nlist-key mean recomputations inside training.
  */
object Ivf {

  /** Deterministic seed centroids: the `nlist` lowest-id vectors. A real deployment
    * k-means-trains on a sample ([[trainCentroids]]); seeds keep fixtures and the
    * DuckDB oracle exactly reproducible (no floating-point averaging involved).
    */
  def seedCentroids(
      embeddings: DataFrame, nlist: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    embeddings.filter(col(idCol) < nlist)
      .select(col(idCol).as("centroid_id"),
        Similarity.toDoubleVec(col(vecCol)).as("cv"))

  private def withNorm(centroids: DataFrame): DataFrame =
    centroids.withColumn("cnorm", Similarity.l2Norm(col("cv")))

  /** Assign every vector to its max-cosine centroid, entirely map-side: the centroid
    * table folds into ONE broadcast row holding an array of (id, vector, norm) structs,
    * and each corpus row computes its argmax in-place over that array (ties break to
    * the smallest centroid_id, independent of array order). No shuffle at all — a
    * groupBy-argmax formulation would push every full vector payload through an
    * exchange, which at corpus scale is the whole dataset. Output carries the
    * assignment cosine as `acos` (the quantization-quality signal [[ivfDrift]]
    * aggregates); the argmax struct lands as its own attribute first so the
    * interpreted aggregate HOF is evaluated once, not once per consumer.
    */
  def assign(
      embeddings: DataFrame, centroids: DataFrame,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val base = embeddings.select(col(idCol).as("vec_id"),
      Similarity.toDoubleVec(col(vecCol)).as("v"))
      .withColumn("norm", Similarity.l2Norm(col("v")))
    val centroidRow = withNorm(centroids)
      .agg(collect_list(struct(col("centroid_id"), col("cv"), col("cnorm")))
        .as("cents"))
    val best = aggregate(
      col("cents"),
      struct(lit(-2.0).as("bcos"), lit(-1L).as("bid")),
      (acc, c) => {
        val ccos = Similarity.dot(col("v"), c.getField("cv")) /
          (col("norm") * c.getField("cnorm"))
        val cid = c.getField("centroid_id")
        when(ccos > acc.getField("bcos") ||
            (ccos === acc.getField("bcos") && cid < acc.getField("bid")),
          struct(ccos.as("bcos"), cid.as("bid")))
          .otherwise(acc)
      })
    base.crossJoin(broadcast(centroidRow))
      .withColumn("__best", best)
      .withColumn("cluster", col("__best").getField("bid"))
      .withColumn("acos", col("__best").getField("bcos"))
      .drop("cents", "__best")
  }

  /** IVF top-k: each query (vec_id < numQueries) probes its `nprobe` max-cosine
    * clusters and exact-reranks only their members. Recall < 1 by construction EXCEPT
    * `nprobe = nlist`, which provably equals brute force (tested). Cosine is rounded to
    * 4 dp with id tie-breaks, as in the other similarity tiers.
    */
  def ivfTopK(
      embeddings: DataFrame, centroids: DataFrame,
      numQueries: Int = 10, k: Int = 5, nprobe: Int = 4,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val assigned = assign(embeddings, centroids, idCol, vecCol)
    val queries = assigned.filter(col("vec_id") < numQueries)
      .select(col("vec_id").as("query_id"), col("v").as("qv"),
        col("norm").as("qnorm"))
    val wProbe = Window.partitionBy(col("query_id"))
      .orderBy(col("pcos").desc, col("centroid_id"))
    val probes = queries.crossJoin(broadcast(withNorm(centroids)))
      .withColumn("pcos",
        Similarity.dot(col("qv"), col("cv")) / (col("qnorm") * col("cnorm")))
      .withColumn("prn", row_number().over(wProbe))
      .filter(col("prn") <= nprobe)
      .select(col("query_id"), col("qv"), col("qnorm"),
        col("centroid_id").as("cluster"))
    // each vector lives in exactly one cluster, so a (query, vector) candidate pair is
    // unique — no dedup needed before the rerank
    val cands = assigned.join(broadcast(probes),
        assigned("cluster") === probes("cluster") &&
          col("vec_id") =!= col("query_id"))
      .withColumn("cosine",
        round(Similarity.dot(col("qv"), col("v")) / (col("qnorm") * col("norm")), 4))
    val wTop = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("vec_id"))
    cands.withColumn("rank", row_number().over(wTop))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "vec_id", "cosine")
  }

  /** Persisted-IVF lifecycle over [[graft.catalog.VersionedTable]] — the
    * [[Bm25.writeIndex]] incremental-maintenance pattern applied to the ANN
    * tier: centroids FREEZE at build time (the standard IVF maintenance
    * contract — retrain is a rebuild, not an append), and each arriving
    * vector batch is assigned map-side against the tiny persisted centroid
    * table and appended as pure O(batch) writes. Prior vectors are never
    * rescanned; the corpus behind the index can be gone.
    *
    * Layout under `dir`: `centroids` (centroid_id, cv), `vectors`
    * (vec_id, v, norm, cluster) landed CLUSTER-CLUSTERED (range-partitioned +
    * sorted within files) so parquet row-group stats on `cluster` are tight —
    * [[ivfTopKFromIndex]] pushes the probed cluster set into the scan and
    * reads only those clusters' row groups instead of the whole vector
    * table — and `quality`, one (batch, cluster, n_vecs, sum_cos4) row per
    * batch×cluster recording assignment quality at landing time (exact
    * integers: cos4 = round(acos·10⁴), order-independent sums), the feed for
    * [[ivfDrift]]'s retrain-is-a-rebuild decision.
    *
    * Contract: batches carry NOVEL vec_ids (same ledger/novelty routing as
    * [[Bm25.appendToIndex]]). Pass distinct `batchLabel`s to keep per-batch
    * drift resolution; reused labels merge their quality rows (still correct,
    * coarser).
    */
  def writeIvfIndex(embeddings: DataFrame, centroids: DataFrame, dir: String,
      idCol: String = "vec_id", vecCol: String = "embedding",
      batchLabel: String = "base"): Unit = {
    graft.catalog.VersionedTable.write(
      centroids.select(col("centroid_id"), col("cv")),
      s"$dir/centroids", "overwrite")
    landBatch(embeddings, centroids, dir, "overwrite", batchLabel, idCol, vecCol)
  }

  /** The index's artifact tables, in landing order; the
    * [[graft.catalog.IndexManifest]] pins all three so readers resolve one
    * consistent epoch across them.
    */
  private[graft] val IndexArtifacts = Seq("centroids", "vectors", "quality")

  /** Append one vector batch: ONE map-side assignment scan of the batch
    * against the persisted centroids, then a batch-sized clustered write
    * plus its quality row(s).
    */
  def appendToIvfIndex(batch: DataFrame, dir: String,
      idCol: String = "vec_id", vecCol: String = "embedding",
      batchLabel: String = "batch"): Unit = {
    val spark = batch.sparkSession
    val centroids = graft.catalog.IndexManifest.readArtifact(spark, dir,
      "centroids", graft.catalog.IndexManifest.pins(spark, dir))
    landBatch(batch, centroids, dir, "append", batchLabel, idCol, vecCol)
  }

  private def landBatch(batch: DataFrame, centroids: DataFrame, dir: String,
      operation: String, batchLabel: String, idCol: String,
      vecCol: String): Unit = {
    landArtifacts(batch, centroids, batchLabel, idCol, vecCol) { (df, artifact) =>
      graft.catalog.VersionedTable.write(df, s"$dir/$artifact", operation); ()
    }
    // publish point: ONE atomic manifest publish pins the artifacts' new
    // heads — readers see the whole mutation or none of it
    graft.catalog.IndexManifest.refresh(batch.sparkSession, dir, IndexArtifacts)
  }

  /** Build the batch's two index artifacts from ONE persisted assignment scan
    * and hand each to `land(df, artifact)` (artifact ∈ "vectors" |
    * "quality") — without the persist the two landing jobs would each re-run
    * the broadcast argmax over the batch. Shared by the batch append path and
    * the streaming maintainer ([[graft.streaming.IvfIngest]]), exactly
    * [[Bm25.landArtifacts]]'s shape.
    */
  private[graft] def landArtifacts(batch: DataFrame, centroids: DataFrame,
      batchLabel: String, idCol: String, vecCol: String)(
      land: (DataFrame, String) => Unit): Unit = {
    val assigned = assign(batch, centroids, idCol, vecCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      land(clusteredOf(assigned), "vectors")
      land(qualityOf(assigned, batchLabel), "quality")
    } finally { assigned.unpersist(); () }
  }

  /** The assignment in the index table's layout — cluster-clustered
    * (range-partitioned + sorted within files) so the probe-set isin of
    * [[ivfTopKFromIndex]] prunes row groups.
    */
  private def clusteredOf(assigned: DataFrame): DataFrame = {
    // pin the element nullability: sources differ (parquet reads carry
    // nullable elements, typed in-memory encoders don't), and the versioned
    // table rightly refuses an append that flips a type's nullability
    val vType = org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.DoubleType, containsNull = true)
    assigned
      .select(col("vec_id"), col("v").cast(vType).as("v"),
        col("norm"), col("cluster"))
      .repartitionByRange(col("cluster"))
      .sortWithinPartitions("cluster", "vec_id")
  }

  /** Per-cluster assignment quality of one batch, on an exact-integer grid so
    * any engine replays it: cos4 = round(acos·10⁴) summed as BIGINT (sums of
    * integers are order-independent; the mean is recovered at read).
    */
  private def qualityOf(assigned: DataFrame, batchLabel: String): DataFrame =
    assigned
      .select(col("cluster"),
        round(col("acos") * 10000).cast("bigint").as("cos4"))
      .groupBy("cluster")
      .agg(count(lit(1)).as("n_vecs"), sum(col("cos4")).as("sum_cos4"))
      .select(lit(batchLabel).as("batch"), col("cluster"), col("n_vecs"),
        col("sum_cos4"))
      // ≤ nlist rows per batch — land as ONE file instead of one per
      // post-aggregation shuffle partition
      .coalesce(1)

  final case class IvfIndex(centroids: DataFrame, assigned: DataFrame)

  /** Resolve the index at one consistent epoch: the manifest pins are read
    * ONCE (a single atomic commit), then both artifacts resolve AS OF their
    * pinned versions — a concurrent [[rebuildIndex]] (which overwrites
    * centroids and vectors in separate commits) can never hand this reader
    * one epoch's centroids with the other's assignments. Pre-manifest
    * indexes fall back to head reads.
    */
  def readIvfIndex(spark: org.apache.spark.sql.SparkSession,
      dir: String): IvfIndex = {
    import graft.catalog.IndexManifest
    val p = IndexManifest.pins(spark, dir)
    IvfIndex(IndexManifest.readArtifact(spark, dir, "centroids", p),
      IndexManifest.readArtifact(spark, dir, "vectors", p))
  }

  /** Register a persisted index's artifact tables as TEMP VIEWS so the
    * pure-SQL serving recipes ([[SqlRecipes.ivfFromIndexSql]],
    * [[SqlRecipes.hybridFromIndexSql]]) run end-to-end against named tables.
    * Returns (vectorsView, centroidsView); same snapshot semantics as
    * [[Bm25.registerIndexViews]].
    */
  def registerIndexViews(spark: org.apache.spark.sql.SparkSession, dir: String,
      prefix: String = "ivf_idx"): (String, String) = {
    import graft.catalog.IndexManifest
    val names = (s"${prefix}_vectors", s"${prefix}_centroids")
    val p = IndexManifest.pins(spark, dir)
    IndexManifest.readArtifact(spark, dir, "vectors", p)
      .createOrReplaceTempView(names._1)
    IndexManifest.readArtifact(spark, dir, "centroids", p)
      .createOrReplaceTempView(names._2)
    names
  }

  /** IVF top-k off a persisted index — identical results to [[ivfTopK]] over
    * the same vectors and centroids (assignment is deterministic, the rerank
    * is the same arithmetic), but the vector scan PRUNES: the probed cluster
    * set is bounded by construction (≤ numQueries × nprobe ids), so it
    * collects driver-side and re-enters the scan as an `isin` predicate that
    * parquet row-group stats resolve against the cluster-clustered layout —
    * at 100 TB the rerank reads only the probed clusters' row groups, never
    * the full vector table. (Past
    * `spark.sql.parquet.pushdown.inFilterThreshold` — default 10 — parquet
    * rewrites the In to a min/max range filter; the cluster-sorted layout
    * keeps range skipping effective, but raise the threshold for exact-set
    * pruning with large numQueries × nprobe.)
    *
    * This convenience overload takes its queries from INSIDE the index
    * (`vec_id < numQueries`), and that one extraction read necessarily walks
    * the vectors table — `vec_id` carries no clustering on the
    * cluster-ordered layout. Serving tiers answering EXTERNAL query batches
    * should call [[ivfTopKForQueries]], whose only index reads are the
    * cluster-pruned ones.
    */
  def ivfTopKFromIndex(index: IvfIndex, numQueries: Int = 10, k: Int = 5,
      nprobe: Int = 4): DataFrame = {
    val queries = index.assigned.filter(col("vec_id") < numQueries)
      .select(col("vec_id").as("query_id"), col("v").as("qv"),
        col("norm").as("qnorm"))
    serveFromIndex(index, queries, k, nprobe, excludeSelf = true)
  }

  /** IVF top-k for EXTERNAL query vectors — the realistic serving shape
    * (queries arrive from outside the index, e.g. a request batch): `queries`
    * carries (`idCol`, `vecCol`), broadcasts against the tiny centroid table
    * for probing, and the ONLY read of the vectors table is the
    * cluster-pruned rerank scan — no extraction scan exists, so serving cost
    * is O(probed clusters), never O(index). No self-exclusion: the query id
    * space is unrelated to the corpus ids.
    */
  def ivfTopKForQueries(index: IvfIndex, queries: DataFrame, k: Int = 5,
      nprobe: Int = 4, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"),
        Similarity.toDoubleVec(col(vecCol)).as("qv"))
      .withColumn("qnorm", Similarity.l2Norm(col("qv")))
    serveFromIndex(index, q, k, nprobe, excludeSelf = false)
  }

  /** Shared pruned-serving body: probe against broadcast centroids, collect
    * the bounded probed-cluster set, push it into the vectors scan as isin,
    * exact-rerank the pruned candidates.
    */
  private def serveFromIndex(index: IvfIndex, queries: DataFrame, k: Int,
      nprobe: Int, excludeSelf: Boolean): DataFrame = {
    val wProbe = Window.partitionBy(col("query_id"))
      .orderBy(col("pcos").desc, col("centroid_id"))
    val probes = queries.crossJoin(broadcast(withNorm(index.centroids)))
      .withColumn("pcos",
        Similarity.dot(col("qv"), col("cv")) / (col("qnorm") * col("cnorm")))
      .withColumn("prn", row_number().over(wProbe))
      .filter(col("prn") <= nprobe)
      .select(col("query_id"), col("qv"), col("qnorm"),
        col("centroid_id").as("cluster"))
    // the bounded driver collect that buys scan pruning (the
    // HybridRetrieval.bm25RrfTopKFromIndex pattern)
    val probed = probes.select("cluster").distinct().collect().map(_.get(0))
    val pruned =
      if (probed.isEmpty) index.assigned.filter(lit(false))
      else index.assigned.filter(col("cluster").isin(probed: _*))
    val noSelf =
      if (excludeSelf) col("vec_id") =!= col("query_id") else lit(true)
    val cands = pruned.join(broadcast(probes),
        pruned("cluster") === probes("cluster") && noSelf)
      .withColumn("cosine",
        round(Similarity.dot(col("qv"), col("v")) / (col("qnorm") * col("norm")), 4))
    val wTop = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("vec_id"))
    cands.withColumn("rank", row_number().over(wTop))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "vec_id", "cosine")
  }

  /** Centroid-staleness signal for the frozen-centroid contract: one row per
    * recorded batch, scoring how well the frozen centroids still fit the data
    * that has arrived since — the data-driven trigger for the
    * retrain-is-a-rebuild decision. Per batch:
    *
    *   - `n_vecs` — vectors landed,
    *   - `mean_cos` — mean assignment cosine (how central vectors sit in
    *     their clusters; falls as the distribution drifts off-centroid),
    *   - `psi` — population-stability index of the batch's cluster-occupancy
    *     distribution vs `baseBatch`'s (the [[Drift]] convention:
    *     epsilon-floored fractions, per-cluster terms on an 8-dp grid,
    *     6-dp total — order-independent, replayed exactly by any engine).
    *     Standard reading: < 0.1 stable, 0.1–0.25 drifting, > 0.25 retrain.
    *
    * Cost: reads only the metadata-scale `quality` table (batches × nlist
    * rows) and the centroid ids — never the vectors.
    */
  def ivfDrift(spark: org.apache.spark.sql.SparkSession, dir: String,
      baseBatch: String = "base", epsilon: Double = 1e-6): DataFrame = {
    require(epsilon > 0 && epsilon < 1, "epsilon must be in (0, 1)")
    val p = graft.catalog.IndexManifest.pins(spark, dir)
    val quality = graft.catalog.IndexManifest
      .readArtifact(spark, dir, "quality", p)
    val clusters = graft.catalog.IndexManifest
      .readArtifact(spark, dir, "centroids", p)
      .select(col("centroid_id").as("cluster"))
    // dense (batch × cluster) grid so zero-occupancy clusters still
    // contribute through the epsilon floor — both frames are metadata-scale
    val grid = quality.select("batch").distinct()
      .crossJoin(broadcast(clusters))
      .join(quality, Seq("batch", "cluster"), "left")
      .select(col("batch"), col("cluster"),
        coalesce(col("n_vecs"), lit(0L)).as("n_vecs"),
        coalesce(col("sum_cos4"), lit(0L)).as("sum_cos4"))
    val withTot = grid.withColumn("tot",
      sum(col("n_vecs")).over(Window.partitionBy(col("batch"))))
    val cur = withTot.withColumn("frac",
      greatest(col("n_vecs").cast("double") / col("tot"), lit(epsilon)))
    val base = cur.filter(col("batch") === baseBatch)
      .select(col("cluster"), col("frac").as("base_frac"))
    cur.join(broadcast(base), Seq("cluster"))
      .withColumn("psi_term",
        round((col("frac") - col("base_frac")) *
          log(col("frac") / col("base_frac")), 8))
      .groupBy("batch")
      .agg(sum(col("n_vecs")).as("n_vecs"),
        round(sum(col("sum_cos4")).cast("double") /
          (lit(10000.0) * sum(col("n_vecs"))), 6).as("mean_cos"),
        round(sum(col("psi_term")), 6).as("psi"))
      // trend order, not lexicographic: the streaming maintainer labels
      // batches with numeric txnId strings ("0","1",...,"10"), and a string
      // sort would interleave "10" before "2", garbling the drift trend past
      // ten batches. Numeric labels sort numerically AFTER the non-numeric
      // ones (e.g. "base" leads); non-numeric labels keep string order.
      .orderBy(expr("try_cast(batch AS BIGINT)").asc_nulls_first, col("batch"))
  }

  /** STALENESS ACTUATOR — the consumer of [[ivfDrift]]'s retrain trigger.
    * Retrains the centroids from the CURRENT corpus and replaces the index:
    * IVF retains full vectors in its `vectors` artifact, so the rebuild needs
    * no external input — it reads the persisted vectors back, seeds from the
    * `nlist` lowest-id vectors PRESENT (a maintained corpus may carry an
    * arbitrary id space), Lloyd-refines `iters` rounds ([[trainCentroids]];
    * `iters = 0` keeps the raw seeds for fixture-grade reproducibility),
    * reassigns every vector map-side, and lands all three artifacts as
    * OVERWRITE commits. The quality history resets to ONE `batchLabel` row —
    * the new drift baseline (PSI compares against post-rebuild occupancy from
    * here on). Contrast [[IvfPq.rebuildPqIndex]], which must take the corpus
    * as a parameter — PQ codes are lossy, the base vectors are gone.
    *
    * Atomicity is PER ARTIFACT (each overwrite is one commit — a reader of
    * any one table sees old-complete or new-complete state, never half), not
    * transactional across the three: a query resolving mid-rebuild can pair
    * new centroids with old assignments for one batch. Quiesce serving across
    * the rebuild (or retry) when that matters; old-generation serving stays
    * fully correct until the swap, and old files survive until vacuum.
    *
    * Scale: training costs `iters` map-side assignment scans of the corpus —
    * at 100 TB train the centroids on a sample offline and call
    * [[writeIvfIndex]] directly; the reassignment itself is one map-side
    * scan, the same cost as the original build.
    */
  def rebuildIndex(spark: org.apache.spark.sql.SparkSession, dir: String,
      nlist: Int = 0, iters: Int = 4, batchLabel: String = "base"): Unit = {
    import graft.catalog.IndexManifest
    // pins the pre-rebuild snapshot (one manifest epoch): the overwrite below
    // writes new files and new commits, so reading the old file list while
    // rewriting is safe
    val p = IndexManifest.pins(spark, dir)
    val corpus = IndexManifest.readArtifact(spark, dir, "vectors", p)
      .select(col("vec_id"), col("v").as("embedding"))
    val k =
      if (nlist > 0) nlist
      else IndexManifest.readArtifact(spark, dir, "centroids", p).count().toInt
    val seeds = corpus.orderBy(col("vec_id")).limit(k)
      .select(col("vec_id").as("centroid_id"),
        Similarity.toDoubleVec(col("embedding")).as("cv"))
    val centroids =
      if (iters > 0) trainCentroids(corpus, seeds, iters,
        idCol = "vec_id", vecCol = "embedding")
      else seeds
    writeIvfIndex(corpus, centroids, dir, idCol = "vec_id",
      vecCol = "embedding", batchLabel = batchLabel)
  }

  /** Register the index artifacts as PERMANENT catalog tables over their
    * versioned-table locations (`CREATE TABLE <catalog>.<ns>.<prefix>_*
    * LOCATION ...` — [[graft.sources.table.GraftCatalog]]'s external
    * registration): unlike [[registerIndexViews]]' temp views, which pin the
    * snapshot they were created from, a catalog entry re-resolves the commit
    * log PER QUERY, so the same SQL statement tracks appends with no
    * re-registration, and statements issued AFTER a rebuild settles see the
    * new epoch. A statement RACING a rebuild is the one case the live route
    * cannot pin: it resolves each catalog table independently, so it can mix
    * codebook epochs — serve rebuild windows through [[registerIndexViews]]
    * (manifest-pinned) or quiesce SQL for the rebuild. Returns
    * (vectorsTable, centroidsTable) as fully-qualified names.
    */
  def registerIndexTables(spark: org.apache.spark.sql.SparkSession,
      dir: String, catalog: String, namespace: String,
      prefix: String = "ivf_idx"): (String, String) = {
    def reg(artifact: String, suffix: String): String = {
      val t = s"$catalog.$namespace.${prefix}_$suffix"
      spark.sql(s"DROP TABLE IF EXISTS $t")
      spark.sql(s"CREATE TABLE $t LOCATION '$dir/$artifact'")
      t
    }
    (reg("vectors", "vectors"), reg("centroids", "centroids"))
  }

  /** Lloyd's k-means refinement of the given centroids (the production path for
    * centroid quality; not oracle-gated because distributed float summation is not
    * bit-reproducible). Empty clusters drop out. `iters` small (3–10); each iteration
    * is one assignment scan plus an nlist×dim-keyed mean — at 100 TB train on a sample,
    * which is the standard practice this signature supports directly.
    */
  def trainCentroids(
      embeddings: DataFrame, seeds: DataFrame, iters: Int = 4,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    var centroids = seeds
    for (_ <- 0 until iters) {
      val means = assign(embeddings, centroids, idCol, vecCol)
        .select(col("cluster"), posexplode(col("v")).as(Seq("pos", "x")))
        .groupBy(col("cluster"), col("pos"))
        .agg(avg(col("x")).as("m"))
        .groupBy(col("cluster"))
        .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("pm"))
        .select(col("cluster").as("centroid_id"),
          transform(col("pm"), p => p.getField("m")).as("cv"))
      centroids = means.localCheckpoint() // truncate the per-iteration plan lineage
    }
    centroids
  }
}
