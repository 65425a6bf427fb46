package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.ExplainMode
import org.scalatest.funsuite.AnyFunSuite

/** Executable plan discipline: the 100 TB properties the operators are designed around
  * (filter pushdown, column pruning, broadcast dims, no accidental cross products,
  * whole-stage codegen on per-row paths) asserted on the actual physical plans, so a
  * regression in plan shape fails CI rather than surfacing as a cluster bill.
  */
class PlanAuditSpec extends AnyFunSuite with SharedSpark {

  private def formatted(df: DataFrame): String =
    df.queryExecution.explainString(ExplainMode.fromString("formatted"))

  /** Final adaptive plan, after AQE has made its runtime join/partition decisions.
    * collect() (not a write) so THIS DataFrame's own QueryExecution runs — a write
    * plans a separate QueryExecution and would leave this one unexecuted, with the
    * adaptive plan unfinalized and codegen stages uncollapsed.
    */
  private def finalPlan(df: DataFrame): String = {
    df.collect()
    df.queryExecution.executedPlan.toString
  }

  test("pricing summary: shipdate filter reaches the parquet scan, schema pruned") {
    val plan = formatted(SparkEntry.queries("q_pricing_summary")(spark, sf))
    assert(plan.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"),
      s"shipdate must push into the scan:\n$plan")
    val readSchema = plan.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!readSchema.contains("l_comment") && !readSchema.contains("l_partkey"),
      s"projection must prune unused lineitem columns: $readSchema")
  }

  test("token counts: documents scan prunes to (doc_id, text)") {
    val plan = formatted(SparkEntry.queries("q_token_counts")(spark, sf))
    val readSchema = plan.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.contains("doc_id") && readSchema.contains("text"))
    assert(!readSchema.contains("lang") && !readSchema.contains("source"),
      s"unused document columns must not be read: $readSchema")
  }

  test("daily sales: the customer dimension joins as a broadcast, never a cross product") {
    val plan = finalPlan(SparkEntry.queries("q_daily_sales")(spark, sf))
    assert(plan.contains("BroadcastHashJoin"), s"dim join should broadcast:\n$plan")
    assert(!plan.contains("CartesianProduct"))
  }

  test("ANN and IVF candidate retrieval are equality joins, not cross products") {
    for (q <- Seq("q_ann_topk", "q_ivf_topk", "q_embedding_neardup", "q_minhash_neardup")) {
      val plan = finalPlan(SparkEntry.queries(q)(spark, sf))
      assert(!plan.contains("CartesianProduct"),
        s"$q must bucket via equality joins, got a cross product")
      assert(!plan.contains("BroadcastNestedLoopJoin") || q == "q_ivf_topk",
        s"$q candidate retrieval must not be nested-loop")
    }
  }

  test("fuzzy pairs: custkey filter pushes into the scan, schema prunes to (key, name)") {
    val plan = formatted(SparkEntry.queries("q_fuzzy_pairs")(spark, sf))
    assert(plan.contains("LessThanOrEqual(c_custkey"),
      s"custkey cap must push into the customer scan:\n$plan")
    val readSchema = plan.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!readSchema.contains("c_acctbal") && !readSchema.contains("c_mktsegment"),
      s"unused customer columns must not be read: $readSchema")
    val executed = finalPlan(SparkEntry.queries("q_fuzzy_pairs")(spark, sf))
    assert(!executed.contains("CartesianProduct"),
      "variant blocking must stay an equality join")
  }

  test("quality score: documents scan prunes to (doc_id, text)") {
    val plan = formatted(SparkEntry.queries("q_quality_score")(spark, sf))
    val readSchema = plan.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.contains("doc_id") && readSchema.contains("text"))
    assert(!readSchema.contains("lang") && !readSchema.contains("source"),
      s"scoring must not read unused document columns: $readSchema")
  }

  test("per-row text analytics stay inside whole-stage codegen") {
    for (q <- Seq("q_text_stats", "q_lang_id", "q_fingerprints")) {
      val plan = finalPlan(SparkEntry.queries(q)(spark, sf))
      // executedPlan renders whole-stage-codegen subtrees as "*(n)" stage markers
      assert(plan.contains("*("), s"$q fell out of codegen:\n$plan")
    }
  }

  test("DV read: the deletion-vector anti-join broadcasts the small DV side") {
    import spark.implicits._
    val loc = java.nio.file.Files.createTempDirectory("pa_dv").toString + "/t"
    val vt = graft.catalog.VersionedTable
    vt.write((0 until 1000).map(i => (i.toLong, s"n$i")).toDF("id", "name"),
      loc, "overwrite")
    vt.deleteWhere(spark, loc, "id % 100 = 0")
    val read = vt.read(spark, loc)
    val plan = finalPlan(read)
    // the DV total is log-known small -> broadcast anti-join, not a shuffle
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
    // data-column filters still push into the parquet scan under the join
    val filtered = read.filter($"id" > 500)
    assert(formatted(filtered).contains("PushedFilters: [IsNotNull(id), GreaterThan(id,500)"),
      formatted(filtered))
  }

  test("runtime bloom filter: a selective dim filter injects a bloom probe into the fact scan") {
    // At 100 TB a shuffled fact-dim join with a selective dim filter should prefilter
    // the fact side with Spark's runtime bloom filter (on by default; size-gated).
    // Locally the 10 MB/10 GB gates never open, so drop them to zero and pin that the
    // engine's join shape actually receives the injected probe.
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold").map(k => k -> conf.getOption(k))
    try {
      // creationSideThreshold is a MAX (dim must be small enough to build the filter);
      // applicationSideScanSizeThreshold is a MIN (fact must be big enough to bother)
      conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "1GB")
      conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      val orders = Tables.orders(spark, sf).filter(
        org.apache.spark.sql.functions.col("o_orderpriority") === "1-URGENT")
      val joined = Tables.lineitem(spark, sf)
        .join(orders, org.apache.spark.sql.functions.col("l_orderkey") ===
          org.apache.spark.sql.functions.col("o_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("might_contain"),
        s"fact side should carry the injected bloom probe:\n$plan")
      assert(plan.contains("bloom_filter_agg"),
        s"dim side should build the bloom filter:\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None)    => conf.unset(k)
    }
  }

  test("hard negatives: queries broadcast with the label filter in the join, no cartesian") {
    val plan = finalPlan(graft.ops.Similarity.hardNegatives(
      Tables.embeddings(spark, sf), numQueries = 5, k = 3))
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"),
      s"the query set must broadcast:\n$plan")
    assert(!plan.contains("CartesianProduct"),
      s"label-inequality join must not plan a cartesian product:\n$plan")
  }

  test("curriculum schedule: broadcast cutoffs, one window shuffle, no global sort") {
    val sched = graft.ops.Splits.curriculumSchedule(
      Tables.documents(spark, sf), scoreCol = "n_chars", phases = 3, numShards = 4)
    // executedPlan.toString prints the Final AND Initial AQE sections — audit
    // only the final one
    val plan = finalPlan(sched).split("== Initial Plan ==").head
    assert(plan.contains("BroadcastExchange"),
      s"percentile cutoffs must broadcast back, not re-join wide:\n$plan")
    // the only Exchange beyond the cutoff broadcast is the (phase, shard)
    // window's hash partitioning — a global ORDER BY would add a range exchange
    assert(!plan.contains("rangepartitioning"),
      s"a curriculum must not globally sort the corpus:\n$plan")
    val shuffles = plan.linesIterator.count(l =>
      l.contains("Exchange hashpartitioning"))
    assert(shuffles <= 1, s"expected at most one hash exchange (the window), " +
      s"got $shuffles:\n$plan")
  }

  test("dp sums: one map-side-combined exchange, noise stays post-agg arithmetic") {
    val plan = finalPlan(graft.ops.Privacy.dpSums(Tables.documents(spark, sf),
      Seq("lang", "source"), "n_chars", lo = 0.0, hi = 500.0, epsilon = 1.0,
      seed = "audit")).split("== Initial Plan ==").head
    val shuffles = plan.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(shuffles <= 1, s"expected one group-by exchange, got $shuffles:\n$plan")
    assert(plan.contains("partial_sum"),
      s"sum must combine map-side (partial_sum):\n$plan")
    assert(!plan.contains("Window"), s"a DP release must never window:\n$plan")
  }

  test("length buckets: salted window exchange partitions on (bucket, shard)") {
    val docs = Tables.documents(spark, sf)
      .select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.size(org.apache.spark.sql.functions.split(
          org.apache.spark.sql.functions.trim(
            org.apache.spark.sql.functions.col("text")), "\\s+"))
          .cast("long").as("n_tokens"))
    val salted = graft.ops.Packing.lengthBuckets(docs, batchSize = 8,
      minCap = 16, maxCap = 1024, numShards = 4)
    val plan = finalPlan(salted).split("== Initial Plan ==").head
    // the window's hash exchange must key on BOTH bucket_cap and the shard —
    // bucket_cap alone is the ~10-task parallelism ceiling the salt removes
    val exchange = plan.linesIterator
      .find(l => l.contains("Exchange hashpartitioning"))
      .getOrElse(fail(s"no hash exchange found:\n$plan"))
    assert(exchange.contains("bucket_cap") && exchange.contains("__shard"),
      s"window exchange must partition on (bucket_cap, __shard):\n$exchange")
    assert(!plan.contains("rangepartitioning"),
      s"batching must not globally sort:\n$plan")
  }

  test("outliers: group stats broadcast back onto the stream, never a cross product") {
    val plan = finalPlan(SparkEntry.queries("q_outliers")(spark, sf))
    assert(plan.contains("BroadcastHashJoin"), s"stats join should broadcast:\n$plan")
    assert(!plan.contains("CartesianProduct"))
  }

  test("contamination: reference shingles broadcast so the corpus side never shuffles pre-join") {
    val plan = finalPlan(SparkEntry.queries("q_contamination")(spark, sf))
    assert(plan.contains("BroadcastHashJoin"),
      s"reference side must broadcast:\n$plan")
    assert(!plan.contains("CartesianProduct"))
  }

  test("gopher rules: zero shuffles, stays in whole-stage codegen") {
    val df = SparkEntry.queries("q_gopher_rules")(spark, sf)
    // the orderBy in the contract query is presentation; audit the operator itself
    val op = graft.ops.TextAnalysis.gopherRules(Tables.documents(spark, sf),
      minWords = 20, maxWords = 80, minStopHits = 1)
    val plan = finalPlan(op)
    assert(!plan.contains("Exchange"), s"per-row rules must not shuffle:\n$plan")
    assert(plan.contains("*("), s"rules fell out of codegen:\n$plan")
    df.collect() // and the gated query still runs
  }

  test("general SQL MERGE: source broadcasts into every join, no cartesian anywhere") {
    val wh = java.nio.file.Files.createTempDirectory("graft_planmrg").toString
    spark.conf.set("spark.sql.catalog.gpa",
      classOf[graft.sources.table.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gpa.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gpa.t")
    spark.sql("CREATE TABLE gpa.t.pm (id BIGINT, qty BIGINT, tag STRING)")
    spark.sql("INSERT INTO gpa.t.pm SELECT id, id, concat('t', id) FROM range(50000)")
    // source straddles the target boundary: ids 49900, 49907, … 51293 —
    // 15 matched (49900..49998), 185 unmatched
    spark.sql("CREATE OR REPLACE TEMPORARY VIEW pm_src AS " +
      "SELECT id * 7 + 49900 AS id, id AS qty FROM range(200)")
    val plans = new scala.collection.mutable.ArrayBuffer[String]()
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(f: String,
          qe: org.apache.spark.sql.execution.QueryExecution, d: Long): Unit =
        plans.synchronized { plans += qe.executedPlan.toString }
      override def onFailure(f: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          e: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      // partial SET + both-side refs + NMBS: the full general path — a big
      // target, a tiny source; every src⋈tgt join must broadcast the source
      spark.sql("MERGE INTO gpa.t.pm t USING pm_src s ON t.id = s.id " +
        "WHEN MATCHED AND s.qty > t.qty THEN UPDATE SET t.qty = t.qty + s.qty " +
        "WHEN NOT MATCHED THEN INSERT (id, qty) VALUES (s.id, s.qty) " +
        "WHEN NOT MATCHED BY SOURCE AND t.id > 49990 THEN DELETE")
      // listener delivery is async — wait for the executions to drain
      val deadline = System.currentTimeMillis() + 30000
      while (plans.synchronized(plans.isEmpty) &&
        System.currentTimeMillis() < deadline) Thread.sleep(100)
      Thread.sleep(500)
    } finally spark.listenerManager.unregister(listener)
    val all = plans.synchronized(plans.mkString("\n"))
    assert(all.nonEmpty, "no execution plans captured")
    assert(!all.contains("CartesianProduct"),
      s"general merge must never plan a cartesian:\n${all.take(4000)}")
    assert(all.contains("BroadcastHashJoin"),
      s"the small source should broadcast into the merge joins:\n${all.take(4000)}")
    // and the result is right (guards the audit against a silently-empty run):
    // NMBS deletes ids 49991..49999 except the matched 49991/49998 → 7 gone;
    // 185 unmatched source rows insert
    assert(spark.sql("SELECT count(*) FROM gpa.t.pm").collect().head.getLong(0)
      === 50000L - 7L + 185L)
  }

  test("PQ encode: pure map — broadcast codebook, no shuffle of corpus rows") {
    val emb = Tables.embeddings(spark, sf)
    val cb = graft.ops.Pq.seedCodebooks(emb, m = 8, ksub = 16)
    val plan = finalPlan(graft.ops.Pq.encode(emb, cb))
    assert(!plan.contains("ShuffleExchange") && !plan.contains("Exchange hashpartitioning"),
      s"encode must not shuffle corpus rows:\n$plan")
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("Broadcast"),
      s"codebook row must broadcast:\n$plan")
  }

  test("per-source caps: the hot group never shuffle-sorts; kept ids broadcast back") {
    val plan = finalPlan(
      graft.ops.Splits.capGroups(Tables.documents(spark, sf), "source", 10))
    assert(!plan.contains("Window"), s"cap must use the bottom-k aggregate, not a window:\n$plan")
    assert(plan.contains("ObjectHashAggregate") || plan.contains("SortAggregate"),
      s"bottom-k is a typed imperative aggregate:\n$plan")
    assert(plan.contains("BroadcastHashJoin"),
      s"the small kept-id set should broadcast for the semi-join:\n$plan")
  }

  test("chunk dedup: counts via map-side-combined groupBy, never a window sort") {
    val plan = finalPlan(
      graft.ops.ChunkDedup.dedupChunks(Tables.documents(spark, sf), chunkWords = 10))
    assert(!plan.contains("Window"),
      s"corpus counts must come from a groupBy (partial agg), not a window:\n$plan")
    assert(plan.contains("HashAggregate"),
      s"the md5 count must be a hash aggregate with map-side partials:\n$plan")
  }

  test("IVF-PQ search: candidate retrieval is an equality join on the cluster id") {
    val emb = Tables.embeddings(spark, sf)
    val coarse = graft.ops.IvfPq.trainCoarse(emb, nlist = 8, iters = 1)
    val pqCb = graft.ops.IvfPq.trainResidualPq(emb, coarse, m = 8, ksub = 16, iters = 1)
    val plan = finalPlan(
      graft.ops.IvfPq.search(emb, coarse, pqCb, numQueries = 5, k = 3, nprobe = 2))
    assert(plan.contains("BroadcastHashJoin"),
      s"probe rows must broadcast onto the codes table by cluster equality:\n$plan")
    assert(!plan.contains("CartesianProduct"),
      s"IVF-PQ must never cross-product the corpus:\n$plan")
  }
}
