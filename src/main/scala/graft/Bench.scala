package graft

import org.apache.spark.sql.{DataFrame, Row, SparkSession}

/** Benchmark main: times the headline queries at SPARK_GRAFT_SF_DIR and prints ONE JSON
  * line. Results are forced with a `noop` sink write so every column is fully computed
  * (a bare `count()` would let Catalyst prune the computed columns away).
  */
object Bench {

  /** Representative/heavy queries; IO micro-roundtrips excluded. */
  val headline: Seq[String] = Seq(
    "q_pricing_summary", "q_top_customers", "q_asof_join", "q_sales_rollup",
    "q_daily_sales", "q_clv", "q_latest_order_per_customer", "q_orphan_orders",
    "q_events_hourly", "q_sessionize", "q_dq_report",
    "q_text_stats", "q_dedup_exact", "q_ngram_jaccard", "q_minhash_neardup",
    "q_simhash", "q_similarity_topk", "q_ann_topk", "q_ivf_topk", "q_repetition",
    "q_multimodal_features", "q_funnel", "q_bm25_topk", "q_incremental_neardup",
    "q_token_pairs", "q_vocabulary", "q_gopher_rules", "q_source_caps",
    "q_dup_spans", "q_span_cut", "q_audio_features", "q_shards", "q_lm_score",
    "q_novelty", "q_fuzzy_pairs", "q_quality_score", "q_pagerank",
    "q_heavy_hitters", "q_chunk_dedup", "q_mixture_plan", "q_k_anonymity",
    "q_dedup_priority", "q_curation_pipeline", "q_length_buckets",
    "q_dp_counts", "q_hard_negatives", "q_curriculum",
    "q_length_buckets_sharded", "q_dp_sums", "q_score_calibration",
    "q_sql_update", "q_sql_merge", "q_keyword_tags",
    "q_sql_merge_partial", "q_sql_merge_full_sync", "q_sql_merge_evolution",
    "q_sql_replace", "q_identity_column", "q_scoped_compact", "q_stream_upsert",
    "q_pii_redact", "q_widen_column", "q_url_filter", "q_count_cols",
    "q_hybrid_retrieval", "q_matryoshka_topk", "q_hybrid_bm25", "q_funnel_topk",
    "q_html_extract", "q_sentence_dedup", "q_char_entropy",
    "q_html_main_content", "q_bm25_append", "q_ivf_append", "q_bq_topk",
    "q_hybrid_ivf", "q_bq_append", "q_ivf_drift", "q_hybrid_external",
    "q_hybrid_bq", "q_ivfpq_topk", "q_pq_drift", "q_hybrid_pq")

  /** The DuckDB gate cannot replay xxhash64, so the CONTRACT queries for minhash and
    * simhash run md5-derived twins (see SparkEntry). The bench measures the production
    * xxhash64 kernels under the same names — the path a library user actually runs at
    * scale; the twins exist only so the oracle can verify the banding pipeline.
    */
  private val production: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Tables.spread on every documents input: the per-row shingle hashing is
    // the CPU-heavy side and the harness corpus is a single-row-group file —
    // the same scale-adaptive input-spread the contract twins apply
    "q_minhash_neardup" -> ((s, dir) =>
      graft.ops.Dedup.minhashNearDuplicates(Tables.documents(s, dir),
        numHashes = 32, bands = 16, threshold = 0.5).orderBy("doc_a", "doc_b")),
    // NO spread on the production simhash: its xxhash64 kernel is too light
    // to buy back the exchange (r16 interleaved A/B at 32 cores: 0.27 s
    // unspread vs 0.38 spread, and spreading re-created the inverse
    // 8-vs-32-core ratio). The md5 CONTRACT twin is ~20× heavier per row
    // and keeps its spread.
    "q_simhash" -> ((s, dir) =>
      graft.ops.Dedup.simHash(Tables.documents(s, dir))
        .orderBy("doc_id")),
    // production shuffles xxhash64 shingle keys (hashShingles default), the
    // contract query raw strings the oracle can replay
    "q_ngram_jaccard" -> ((s, dir) =>
      graft.ops.Dedup.ngramJaccardPairs(
        Tables.spread(Tables.documents(s, dir), "doc_id"), threshold = 0.5)
        .orderBy("doc_a", "doc_b")),
    "q_incremental_neardup" -> ((s, dir) => {
      import org.apache.spark.sql.functions.col
      val d = Tables.spread(Tables.documents(s, dir), "doc_id")
      def sigs(part: org.apache.spark.sql.DataFrame) =
        graft.ops.Dedup.minHashSignatures(part, numHashes = 32)
      graft.ops.IncrementalDedup.matchesAgainstIndex(
          sigs(d.filter(col("doc_id") >= 400)), sigs(d.filter(col("doc_id") < 400)),
          numHashes = 32, bands = 16, threshold = 0.5)
        .orderBy("new_doc", "index_doc")
    }))

  def main(args: Array[String]): Unit = {
    // run context, recorded into the JSON so cross-window comparisons
    // self-identify (round-10 lesson: identical code read 0.86x in one window
    // and 1.08x in another — uniform machine/JVM drift, not a regression).
    // Compare ratios ONLY between same-context runs; interleave A/B when in
    // doubt (tools/bench_tableops_ab.json protocol).
    val os = java.lang.management.ManagementFactory.getOperatingSystemMXBean
    val rt = java.lang.management.ManagementFactory.getRuntimeMXBean
    val loadStart = os.getSystemLoadAverage
    val jvmUptimeStartMs = rt.getUptime // small = cold JVM (fresh fork)
    val wallStart = System.nanoTime()
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // iteration aid: SPARK_GRAFT_BENCH_ONLY=q_a,q_b restricts the run (the
    // driver never sets it, so round benches always cover the full headline set)
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    val selected = only.fold(headline)(f => headline.filter(f))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // the context block interpolates this into JSON — a non-numeric setting
    // like "*" (plausible for local[*]) must emit as a quoted string, not
    // break bench_ab.py's json.loads of bench_latest.json
    val cpusJson = cpus.trim.toIntOption.map(_.toString).getOrElse(
      "\"" + cpus.replace("\\", "\\\\").replace("\"", "\\\"") + "\"")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Absorb one-time JVM/engine initialization UNTIMED before ANY reported
    // number (guide §1.4: time the computation): the first Spark action in a
    // cold JVM pays ~8-10 s of classloading + codegen-compiler + shuffle/
    // parquet-reader init that belongs to the JVM, not to whichever index
    // BUILDER happens to run first — measured r16: q_ivf_append's build read
    // 12.0 s as the first action and its true cost is ~2 s; q_pq_drift's
    // build read 11.9 s alone vs 9.7 s when another gate went first. Nothing
    // here caches or precomputes query state (noop sink, no persist):
    // one scan + join + agg + sort warms the machinery only. DECLARED
    // measurement-methodology change in OPTIMIZATION_r16.md; pre-change
    // numbers retained in tools/bench_r16_before.json and BENCH_r15.json.
    {
      val t = Tables.orders(spark, sfDir)
      t.join(t.groupBy("o_orderpriority").count(), "o_orderpriority")
        .orderBy("o_orderkey").limit(5)
        .write.format("noop").mode("overwrite").save()
      spark.catalog.clearCache()
      System.gc()
    }

    // BUILD-ONCE / SERVE-PER-REP split for the persisted-index gates: the
    // contract queries rebuild their index per invocation (the oracle needs
    // construction + serving in one expression), but benching that form times
    // index CONSTRUCTION — the serving path the tier exists for cost a
    // fraction of the reported number (round-13 finding). Here each index
    // builds exactly once (timed, reported under "index_build"), and the rep
    // loop times only the serving thunk, so the headline number tracks the
    // pruned serving path and a serving regression is visible instead of
    // drowned in commit protocol.
    val sb = buildServingThunks(SparkEntry.servingBench,
      name => selected.contains(name) && SparkEntry.queries.contains(name),
      spark, sfDir)
    val servingThunks = sb.thunks
    val buildSecs = sb.buildSecs

    def force(name: String, dir: String): Unit =
      servingThunks.get(name).map(_())
        .getOrElse(production.getOrElse(name, SparkEntry.queries(name))(spark, dir))
        .write.format("noop").mode("overwrite").save()

    // defensive hygiene BETWEEN runs: clearCache is a no-op on the current operator
    // set (nothing caches), but keeps a future cached path from letting blocks
    // accumulate across measurements; the GC nudge lets the ContextCleaner release
    // shuffle files from prior queries (freed only on GC of their RDD references).
    // MEASUREMENT FIX (r15, declared in OPTIMIZATION_r15.md): this used to run
    // INSIDE force(), i.e. inside every timed rep — charging each of the 83
    // queries a full-heap System.gc() per rep, a fixed harness tax that measured
    // JVM hygiene, not the query (guide §1.4: time the computation only). It now
    // runs between reps, outside the timed window; the hygiene itself is
    // unchanged. Old-methodology numbers are kept in tools/bench_r15_before.json
    // and BENCH_r14.json for comparison.
    def hygiene(): Unit = {
      spark.catalog.clearCache()
      System.gc()
    }

    // warmup: run every headline query once at the target SF before timing. Whole-stage
    // codegen + JIT are one-time per-plan-shape costs (~10s for the widest expression
    // trees), and AQE re-plans per data size, so warming at a smaller SF doesn't
    // precompile the measured shapes.
    selected.filter(SparkEntry.queries.contains).foreach { name =>
      try force(name, sfDir) catch { case _: Throwable => () }
      hygiene()
    }

    // Methodology: each query is timed REPS times post-warmup and reported as the
    // TRIMMED MEAN (drop the single fastest and slowest run, average the rest).
    // Single-run numbers on a shared 32-thread JVM carry ±0.2-0.3 s of GC/JIT/OS
    // noise — enough to masquerade as a per-query regression round-over-round; the
    // trimmed mean removes exactly those outliers without hiding real shifts.
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "5").toInt
    val results = selected.filter(SparkEntry.queries.contains).map { name =>
      val times = (1 to reps).flatMap { _ =>
        val t0 = System.nanoTime()
        val ok = try { force(name, sfDir); true } catch { case _: Throwable => false }
        val dt = (System.nanoTime() - t0) / 1e9
        hygiene() // untimed — see the measurement-fix note above
        if (ok) Some(dt) else None
      }
      // ANY failed rep marks the query failed (-1.0): a mean over the surviving runs
      // would make a flaky query look healthy, which is worse than a loud failure
      val secs =
        if (times.length < reps) -1.0
        else if (times.length <= 2) times.sum / times.length
        else { val s = times.sorted; val mid = s.slice(1, s.length - 1); mid.sum / mid.length }
      name -> (secs, reps - times.length)
    }
    // 4-decimal seconds (0.1 ms resolution — far below run-to-run noise):
    // full double precision tripled the line length and the caller's log-tail
    // capture truncated it mid-JSON two rounds running
    def fmt(v: Double): String =
      if (v < 0) "-1.0" else BigDecimal(v).setScale(4, BigDecimal.RoundingMode.HALF_UP).toString
    val qs = results.map { case (k, (v, _)) => "\"" + k + "\":" + fmt(v) }
      .mkString("{", ",", "}")
    val failedReps = results.filter(_._2._2 > 0)
      .map { case (k, (_, f)) => "\"" + k + "\":" + f }
      .mkString("{", ",", "}")
    val total = results.map(_._2._1).filter(_ >= 0).sum
    // one-time index-construction costs for the split gates, amortized out of
    // the headline serving numbers above but reported so maintenance-path
    // regressions stay visible round-over-round
    val indexBuild = buildSecs
      .map { case (k, v) => "\"" + k + "\":" + fmt(v) }.mkString("{", ",", "}")
    // builder failures are LOUD: -1.0 above plus the exception summary here,
    // so a gate silently reverting to build+serve timing (2-5x the serving
    // number) can never masquerade as a serving regression — or hide one
    val servingFallback = servingFallbackJson(sb.fallbacks)
    // iteration aid, driver-invisible (the driver never sets BENCH_ONLY): a
    // query-restricted run skips the table-ops loop unless asked for it
    val tableOps = (if (only.isEmpty || only.exists(_.contains("table_ops")))
        benchTableOps(spark, sfDir) else Seq.empty[(String, Double)])
      .map { case (k, v) => "\"" + k + "\":" + fmt(v) }.mkString("{", ",", "}")
    val context = {
      val loadEnd = os.getSystemLoadAverage
      val wallSec = (System.nanoTime() - wallStart) / 1e9
      s""""context":{"load_start":${fmt(loadStart)},"load_end":${fmt(loadEnd)},""" +
        s""""jvm_uptime_ms_at_start":$jvmUptimeStartMs,""" +
        s""""jvm_warm":${jvmUptimeStartMs > 60000},""" +
        s""""wall_sec":${fmt(wallSec)},"cpus":$cpusJson}"""
    }
    val json =
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":$qs,"failed_reps":$failedReps,"index_build":$indexBuild,"serving_fallback":$servingFallback,"table_ops":$tableOps,"sf":"$sfDir","reps":$reps,"aggregation":"trimmed_mean",$context}"""
    // durability: the caller's log-tail capture once truncated the result line
    // mid-JSON (round 7) — land it on disk FIRST, then print and flush before
    // spark.stop() can interleave shutdown logging
    try java.nio.file.Files.writeString(
      java.nio.file.Paths.get("tools/bench_latest.json"), json + "\n")
    catch { case _: Throwable => () } // a read-only cwd must not fail the bench
    println(json)
    Console.out.flush()
    spark.stop()
    // once more AFTER shutdown: nothing can interleave past this point, so a
    // tail capture's final line IS the whole (now ~1 KB) JSON
    println(json)
    Console.out.flush()
  }

  /** The serve-per-rep preparation outcome: built thunks, per-gate build
    * seconds (-1.0 where the builder failed), and the failures themselves.
    */
  private[graft] final case class ServingBuild(
      thunks: Map[String, () => DataFrame],
      buildSecs: Seq[(String, Double)],
      fallbacks: Seq[(String, String)])

  /** Build each gate's serving thunk once, timed. A builder failure is
    * RECORDED, not swallowed: the gate falls back to the build-per-invocation
    * contract query — a number 2-5× the serving one — so the fallback must be
    * visible in the emitted JSON (`index_build` = -1.0 + a `serving_fallback`
    * entry) or a reader would diagnose a serving regression that doesn't
    * exist. NonFatal only — an OOM should kill the bench, not reroute it.
    */
  private[graft] def buildServingThunks(
      builders: Iterable[(String, (SparkSession, String) => () => DataFrame)],
      shouldBuild: String => Boolean,
      spark: SparkSession, sfDir: String): ServingBuild = {
    val thunks = scala.collection.mutable.Map[String, () => DataFrame]()
    val buildSecs = scala.collection.mutable.ArrayBuffer[(String, Double)]()
    val fallbacks = scala.collection.mutable.ArrayBuffer[(String, String)]()
    builders.foreach { case (name, builder) =>
      if (shouldBuild(name)) {
        val t0 = System.nanoTime()
        try {
          thunks(name) = builder(spark, sfDir)
          buildSecs += name -> (System.nanoTime() - t0) / 1e9
        } catch {
          case scala.util.control.NonFatal(e) =>
            buildSecs += name -> -1.0
            fallbacks += name -> (e.getClass.getSimpleName + ": " +
              Option(e.getMessage).getOrElse("").linesIterator
                .take(1).mkString.take(160))
            System.err.println(s"[bench] serving builder for $name failed — " +
              s"falling back to the build+serve contract gate: $e")
        }
      }
    }
    ServingBuild(thunks.toMap, buildSecs.toSeq, fallbacks.toSeq)
  }

  /** `{"gate":"ExceptionClass: message", ...}` — `{}` when every builder
    * succeeded (the healthy case round-over-round comparisons key on).
    */
  private[graft] def servingFallbackJson(fallbacks: Seq[(String, String)]): String =
    fallbacks.map { case (k, v) =>
      def esc(s: String) = s.replace("\\", "\\\\").replace("\"", "\\\"")
      "\"" + esc(k) + "\":\"" + esc(v) + "\""
    }.mkString("{", ",", "}")

  /** Table-layer (commit protocol) timings, separate from the analytic-query
    * loop so a regression in merge/CDF/restore is visible per round. Each rep
    * rebuilds a fresh versioned table from the SF's orders (so every op sees
    * identical state), then times: a CDF-capturing MERGE of a ~1% change set, a
    * batch change-feed read of the captured commit, RESTORE back past the
    * merge, a merge-on-read upsert of the same change set (DV path, no
    * rewrite), a DV delete of ~1% of keys plus the DV-resolving read, and a
    * partition-SCOPED merge on a hive-partitioned copy (the path that must
    * stay O(touched slice)). Aggregated like the query loop: 5 reps, trimmed
    * mean (drop the single fastest and slowest); setup is not timed.
    *
    * MEASUREMENT-CONTEXT caveat, learned the hard way in round 9: these ops
    * are sub-second and planning-dominated, so their wall-clock swings ~2x
    * with JVM/JIT warmth — a table-ops-only run in a fresh JVM reads far
    * slower than the same code after the full query loop has warmed
    * catalyst. Compare runs against numbers from the SAME context only
    * (tools/bench_tableops_ab.json holds a controlled A/B).
    */
  private def benchTableOps(spark: SparkSession,
      sfDir: String): Seq[(String, Double)] = {
    import org.apache.spark.sql.functions._
    import graft.catalog.VersionedTable
    def timed(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    val reps = 5
    val runs = (1 to reps).map { _ =>
      val root = java.nio.file.Files.createTempDirectory("graft_bench_tops")
      val loc = s"$root/t"
      val locP = s"$root/tp"
      try {
        val orders = Tables.orders(spark, sfDir)
        VersionedTable.write(orders, loc, "overwrite")
        // ~1% of keys: updates (priority flip) + deletes + fresh inserts
        val changes = orders.filter(col("o_orderkey") % 100 === 0)
          .withColumn("o_orderstatus", lit("B"))
          .withColumn("__del", col("o_orderkey") % 300 === 0)
          .unionByName(orders.filter(col("o_orderkey") % 100 === 1)
            .withColumn("o_orderkey", col("o_orderkey") + 100000000L)
            .withColumn("__del", lit(false)))
        val preMerge = VersionedTable.commits(spark, loc).last.version
        val tMerge = timed { VersionedTable.merge(spark, loc, changes,
          Seq("o_orderkey"), deleteCol = Some("__del"), changeFeed = true) }
        val mv = VersionedTable.commits(spark, loc).last.version
        val tChanges = timed {
          VersionedTable.readChanges(spark, loc, mv, mv)
            .write.format("noop").mode("overwrite").save()
        }
        val tRestore = timed { VersionedTable.restore(spark, loc, preMerge) }
        // merge-on-read upsert of the same ~1% change set (DV + change-row
        // append, no rewrite) — contrast with merge_cdf's copy-on-write cost
        val tMor = timed { VersionedTable.mergeOnRead(spark, loc, changes,
          Seq("o_orderkey"), deleteCol = Some("__del")) }
        // merge-on-read delete of ~1% of keys (no file rewritten), then a read
        // that resolves the deletion vector — the steady-state DV tax
        val tDelete = timed {
          VersionedTable.deleteWhere(spark, loc, "o_orderkey % 97 = 0") }
        val tDvRead = timed {
          VersionedTable.read(spark, loc)
            .write.format("noop").mode("overwrite").save()
        }
        // scoped merge: partitioned table, change set touching ONE priority
        VersionedTable.write(orders, locP, "overwrite",
          partitionBy = Seq("o_orderpriority"))
        val scoped = orders.filter(col("o_orderpriority") === "1-URGENT" &&
            col("o_orderkey") % 10 === 0)
          .withColumn("o_orderstatus", lit("S"))
        val tScoped = timed { VersionedTable.merge(spark, locP, scoped,
          Seq("o_orderkey", "o_orderpriority")) }
        require(VersionedTable.commits(spark, locP).last.replace_where.nonEmpty,
          "scoped merge fell back to a full rewrite — bench precondition broken")
        // metadata-only table copy — must stay O(live commits), data-size-blind
        val tClone = timed {
          VersionedTable.shallowClone(spark, locP, s"$root/clone") }
        // dynamic partition overwrite: replace ONE priority partition — the
        // write must cost the batch + a pruned count, never the table
        val replacement = orders
          .filter(col("o_orderpriority") === "5-LOW" && col("o_orderkey") % 2 === 0)
          .withColumn("o_orderstatus", lit("R"))
        val tReplace = timed {
          VersionedTable.overwritePartitions(replacement, locP) }
        require(VersionedTable.commits(spark, locP).last.operation == "replace",
          "dynamic overwrite did not commit a replace — bench precondition broken")
        // commit-level data skipping: 8 disjoint o_orderkey-band commits
        // (setup untimed), then a one-band probe vs the full scan — the
        // pruned read must cost ~1 band, and a skipping regression (stats
        // lost, pruner keeping everything) shows up as the ratio → 1
        val locS = s"$root/ts"
        val Row(loKey: Long, hiKey: Long) =
          orders.agg(min("o_orderkey"), max("o_orderkey")).head()
        val band = (hiKey - loKey) / 8 + 1
        (0 until 8).foreach { i =>
          VersionedTable.write(
            orders.filter(col("o_orderkey") >= loKey + i * band &&
              col("o_orderkey") < loKey + (i + 1) * band),
            locS, if (i == 0) "overwrite" else "append")
        }
        val tPruned = timed {
          VersionedTable.readPruned(spark, locS, "o_orderkey",
            (loKey + 3 * band).toDouble, (loKey + 4 * band - 1).toDouble)
            .write.format("noop").mode("overwrite").save()
        }
        val tFull = timed {
          VersionedTable.read(spark, locS)
            .write.format("noop").mode("overwrite").save()
        }
        // at bench SFs the wall-clock of both reads is planning-dominated, so
        // ALSO record the deterministic evidence: files the scan would open —
        // the ratio the pruning buys at ANY scale (~1/8 here by construction)
        val prunedFiles = VersionedTable.readPruned(spark, locS, "o_orderkey",
          (loKey + 3 * band).toDouble, (loKey + 4 * band - 1).toDouble)
          .inputFiles.length.toDouble
        val fullFiles = VersionedTable.read(spark, locS)
          .inputFiles.length.toDouble
        // COPY INTO: first load ingests the files; the re-run must be
        // metadata-only (ledger + LIST, no data read) — a ledger regression
        // shows up as noop ≈ first
        val locC = s"$root/copy"
        VersionedTable.write(orders.limit(0), locC, "overwrite")
        orders.repartition(8).write.mode("append").parquet(s"$root/copy_src")
        val tCopy = timed {
          graft.catalog.CopyInto.copyInto(spark, locC, s"$root/copy_src")
        }
        val tCopyNoop = timed {
          graft.catalog.CopyInto.copyInto(spark, locC, s"$root/copy_src")
        }
        Seq("merge_cdf" -> tMerge, "read_changes" -> tChanges,
          "restore" -> tRestore, "merge_on_read" -> tMor,
          "delete_dv" -> tDelete, "read_with_dv" -> tDvRead,
          "merge_scoped" -> tScoped, "shallow_clone" -> tClone,
          "replace_partition" -> tReplace, "pruned_read" -> tPruned,
          "full_read" -> tFull, "pruned_read_files" -> prunedFiles,
          "full_read_files" -> fullFiles, "copy_into" -> tCopy,
          "copy_into_noop" -> tCopyNoop)
      } finally {
        org.apache.commons.io.FileUtils.deleteDirectory(root.toFile)
      }
    }
    runs.head.map(_._1).map { k =>
      val xs = runs.map(_.toMap.apply(k)).sorted
      // trimmed mean, matching the query loop's aggregation (file-count
      // "evidence" entries are identical across reps, so trimming is a no-op)
      val mid = if (xs.length <= 2) xs else xs.slice(1, xs.length - 1)
      k -> mid.sum / mid.length
    }
  }
}
