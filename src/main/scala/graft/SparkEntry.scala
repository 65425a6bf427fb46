package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.model.{RefAdapter, Schemas}
import graft.gold.{CustomerLifetimeValue, DailySales}
import graft.ops.{AsOfJoin, Bm25, ChunkDedup, Compaction, CorpusCuration, Dedup, Drift, Funnel, GraphRank, HtmlExtract, HybridRetrieval, IncrementalDedup, Integrity, Ivf, IvfPq, Mixture, Multimodal, NgramLm, Outliers, Pq, Privacy, Profile, QualityClassifier, RangeJoin, Scd2, SemanticDedup, SemiStructured, Similarity, SqlRecipes, Splits, TextAnalysis, TimeSeries}
import graft.cdc.Flatten
import graft.sources.{AvroEnvelopeIO, FlatFiles, Synthetic}
import graft.streaming.{LakeWriter, Sessionize, StreamAggregates}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry pairs a Spark query (the library operator under test, wrapped to a
  * deterministic, oracle-comparable output: stable ordering, exact decimal money math,
  * dates instead of raw timestamps) with equivalent ANSI SQL for DuckDB.
  */
object SparkEntry {

  // ---- harness → reference-shape adapters ------------------------------------------
  private def refOrders(s: SparkSession, dir: String): DataFrame =
    RefAdapter.orders(Tables.orders(s, dir))
  private def refCustomers(s: SparkSession, dir: String): DataFrame =
    RefAdapter.customers(Tables.customer(s, dir))

  private val oSql = RefAdapter.ordersSql
  private val cSql = RefAdapter.customersSql

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q_daily_sales")(spark, "/root/testdata/sf0.001")

  // ---- queries ----------------------------------------------------------------------

  private def qDailySales(distinct: Boolean)(s: SparkSession, dir: String): DataFrame =
    DailySales(refOrders(s, dir), refCustomers(s, dir), distinctCustomers = distinct)
      .orderBy("sale_date", "region")

  private def qClv(s: SparkSession, dir: String): DataFrame =
    CustomerLifetimeValue(refOrders(s, dir), refCustomers(s, dir))
      .withColumn("first_order_date", to_date(col("first_order_date")))
      .withColumn("last_order_date", to_date(col("last_order_date")))
      .orderBy("customer_id")

  private def qLatestOrder(s: SparkSession, dir: String): DataFrame =
    Compaction.latestPerKey(refOrders(s, dir),
        key = Seq("customer_id"), versionDesc = Seq("order_date", "order_id"))
      .select(col("customer_id"), col("order_id"),
        to_date(col("order_date")).as("order_date"), col("order_amount"))
      .orderBy("customer_id")

  private def qOrphans(s: SparkSession, dir: String): DataFrame =
    Integrity.orphans(
        refOrders(s, dir),
        refCustomers(s, dir).filter(col("customer_id") % 3 =!= 0),
        key = Seq("customer_id"))
      .select("order_id", "customer_id")
      .orderBy("order_id")

  /** Builds a Debezium-shaped envelope from orders (epoch-days date, decimal(10,2)
    * amount), then exercises the CDC flatten + logical-type decode path.
    */
  private def qCdcFlatten(s: SparkSession, dir: String): DataFrame = {
    val envelope = refOrders(s, dir).select(
      lit(null).cast(Schemas.orderCdcValue).as("before"),
      struct(
        col("order_id"),
        datediff(col("order_date"), to_date(lit("1970-01-01"))).as("order_date"),
        col("order_amount").cast(DecimalType(10, 2)).as("order_amount"),
        col("customer_id")).as("after"),
      lit("c").as("op"),
      (unix_timestamp(col("order_date")) * 1000).as("ts_ms"))
    // decimal decode is exercised inside the flatten; surface the money column as
    // double — the driver's comparator canonicalizes doubles, not DECIMAL(10,2)
    Flatten.ordersAfter(envelope)
      .withColumn("order_amount", col("order_amount").cast("double"))
      .orderBy("order_id")
  }

  private def tmpDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  /** S1/K-CSV: write the customer dimension as header CSV, read it back with an explicit
    * schema — the reference's CSV-scan entry point (pandas read_csv → producer).
    */
  private def qCsvRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val src = Tables.customer(s, dir)
    val out = tmpDir("graft_csv")
    FlatFiles.writeCsv(src, out)
    FlatFiles.readCsv(s, out, src.schema).orderBy("c_custkey")
  }

  /** S4/K2: land orders as JSON-lines Hive-partitioned by sale date, read back with
    * partition discovery — the reference's lake landing + DQ-read path.
    */
  private def qJsonPartitionedRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val src = refOrders(s, dir)
      .withColumn("sale_date", date_format(col("order_date"), "yyyy-MM-dd"))
    val out = tmpDir("graft_json")
    FlatFiles.writePartitionedJson(src, out, "sale_date")
    val schema = StructType(src.schema.fields.filterNot(_.name == "sale_date"))
      .add("sale_date", StringType)
    FlatFiles.readPartitionedJson(s, out, schema)
      .select(col("order_id"), col("sale_date"), col("order_amount"),
        col("customer_id"), to_date(col("order_date")).as("order_date"))
      .orderBy("order_id")
  }

  /** S6: full Avro CDC path — orders → Debezium envelope container files on disk
    * (epoch-days date, decimal-bytes amount) → `spark.read.format("avro")` (the
    * reference's own syntax, `curated/dq_kafka.py:140-141`, served offline by
    * [[graft.sources.avro.AvroFileFormat]]) → flatten+decode.
    */
  private def qAvroCdcRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val out = tmpDir("graft_avro")
    AvroEnvelopeIO.writeOrdersEnvelopes(refOrders(s, dir), out)
    Flatten.ordersAfter(s.read.format("avro").load(out))
      .withColumn("order_amount", col("order_amount").cast("double"))
      .orderBy("order_id")
  }

  /** S6 (customers topic): generic envelope writer/reader roundtrip for the second CDC
    * entity — proves the Avro layer is schema-driven, not orders-specific.
    */
  private def qAvroCustomersRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val value = AvroEnvelopeIO.customersCdcValue
    val envSchema = AvroEnvelopeIO.envelopeStructType(value)
    val envelopes = refCustomers(s, dir).select(
      lit(null).cast(value).as("before"),
      struct(col("customer_id"), col("name"), col("email"), col("region"),
        col("customer_tenure_days")).as("after"),
      lit("c").as("op"),
      (col("customer_id") * 1000L).as("ts_ms"))
    val out = tmpDir("graft_avro_cust")
    AvroEnvelopeIO.writeEnvelopes(envelopes,
      AvroEnvelopeIO.customersEnvelopeSchemaJson, out)
    Flatten.after(AvroEnvelopeIO.readEnvelopes(s, out, envSchema))
      .orderBy("customer_id")
  }

  /** S2: deterministic distributed synthetic generator (Faker-producer replacement). */
  private def qSyntheticOrders(s: SparkSession, dir: String): DataFrame =
    Synthetic.orders(s, 10000).orderBy("order_id")

  /** T1–T5: end-to-end Structured Streaming ingest — events → JSON-lines input dir →
    * file-stream source → foreachBatch partitioned landing with ingest_time stamp →
    * read back. Timestamps ride as epoch-micros longs through JSON (lossless).
    */
  private def qStreamIngest(s: SparkSession, dir: String): DataFrame = {
    val src = Tables.eventsMicros(s, dir)
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"),
        unix_micros(col("ts")).as("ts_us"))
    val in = tmpDir("graft_si_in")
    val out = tmpDir("graft_si_out")
    val chk = tmpDir("graft_si_chk")
    src.write.mode("overwrite").json(in)
    val q = LakeWriter.ingestJsonStream(s, in, src.schema,
      dateCol = date_format(timestamp_micros(col("ts_us")), "yyyy-MM-dd"),
      outputDir = out, checkpointDir = chk)
    q.awaitTermination()
    val outSchema = StructType(src.schema.fields)
      .add("ingest_time", StringType).add("date", StringType)
      .add("batch_id", StringType)
    FlatFiles.readPartitionedJson(s, out, outSchema)
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"),
        timestamp_micros(col("ts_us")).as("ts"), col("date"))
      .orderBy("event_id")
  }

  /** Streaming CDC-apply: a versioned base table, then ONE `writeStream` with
    * `mergeKeys`/`deleteColumn`/`sequenceBy` applies a change stream as
    * merge-on-read upserts — per-key the HIGHEST-sequence event wins inside a
    * batch (the 'mid' events must lose to the 'upd' events), delete events
    * remove matched keys, unmatched deletes are no-ops, unmatched upserts
    * insert. The oracle states the final upserted table; a sink that applied
    * events in file order, double-applied a batch, or dropped the compaction
    * would diverge.
    */
  private def qStreamUpsert(s: SparkSession, dir: String): DataFrame = {
    val vt = graft.catalog.VersionedTable
    val d = docs(s, dir).select("doc_id", "lang", "source")
    val loc = tmpDir("graft_su_t") + "/t"
    val in = tmpDir("graft_su_in")
    val chk = tmpDir("graft_su_chk")
    vt.write(d.filter(col("doc_id") < 400).withColumn("state", lit("base")),
      loc, "overwrite")
    val changes = d.filter(col("doc_id") >= 200 && col("doc_id") < 600)
    val dels = changes.filter(col("doc_id") % 10 === 0)
      .withColumn("state", lit("del"))
      .withColumn("is_del", lit(true)).withColumn("seq", lit(3L))
    val mids = changes.filter(col("doc_id") % 10 =!= 0)
      .withColumn("state", lit("mid"))
      .withColumn("is_del", lit(false)).withColumn("seq", lit(1L))
    val upds = changes.filter(col("doc_id") % 10 =!= 0)
      .withColumn("state", lit("upd"))
      .withColumn("is_del", lit(false)).withColumn("seq", lit(2L))
    // one file → one micro-batch: the in-batch sequence compaction is what's
    // under test, not the file source's batching
    dels.unionByName(mids).unionByName(upds).coalesce(1)
      .write.mode("overwrite").json(in)
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("lang", StringType),
      StructField("source", StringType), StructField("state", StringType),
      StructField("is_del", BooleanType), StructField("seq", LongType)))
    val q = s.readStream.schema(schema).json(in)
      .writeStream.format("graft-table")
      .option("mergeKeys", "doc_id").option("deleteColumn", "is_del")
      .option("sequenceBy", "seq").option("checkpointLocation", chk)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start(loc)
    q.awaitTermination()
    vt.read(s, loc).select("doc_id", "lang", "source", "state").orderBy("doc_id")
  }

  /** Event-time tumbling-window aggregation (streaming extension; batch-equivalent plan). */
  private def qEventsHourly(s: SparkSession, dir: String): DataFrame =
    StreamAggregates.hourlyEventStats(Tables.eventsMicros(s, dir))
      .orderBy("bucket_start", "event_type")

  /** Gap-based sessionization via lag + running-sum window functions. */
  private def qSessionize(s: SparkSession, dir: String): DataFrame =
    Sessionize.batch(Tables.eventsMicros(s, dir), gapMinutes = 30)
      .orderBy("user_id", "session_seq")

  /** Fixed-grid hourly resampling of the event stream per user ([[TimeSeries.resample]]):
    * explicit gap rows between a user's first and last active hour, forward-filled
    * last observation — the regularization step before windowed feature extraction.
    */
  private def qResample(s: SparkSession, dir: String): DataFrame =
    TimeSeries.resample(Tables.eventsMicros(s, dir).select("user_id", "ts", "value"),
      keyCol = "user_id", tsCol = "ts", valueCol = "value", unit = "hour")
      .orderBy("user_id", "bucket")

  /** 30-day trailing revenue per customer at each order ([[TimeSeries.trailingAgg]]):
    * an event-time RANGE window (peers at the same instant included), the moving-window
    * companion to the grouped daily-sales rollup.
    */
  private def qRollingRevenue(s: SparkSession, dir: String): DataFrame =
    TimeSeries.trailingAgg(
      Tables.orders(s, dir).select("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"),
      keyCol = "o_custkey", tsCol = "o_orderdate", valueCol = "o_totalprice",
      windowSeconds = 30L * 86400)
      .drop("o_totalprice")
      .orderBy("o_orderkey")

  /** Distribution-based outlier flags over event values per type ([[Outliers]]):
    * decimal-exact group moments so the flagged set is deterministic and
    * oracle-checkable.
    */
  private def qOutliers(s: SparkSession, dir: String): DataFrame =
    Outliers.zscoreOutliers(
      Tables.events(s, dir).select("event_id", "event_type", "value"),
      valueCol = "value", groupCols = Seq("event_type"), threshold = 3.0)
      .select("event_id", "event_type", "value", "group_mean", "group_stddev", "zscore")
      .orderBy("event_id")

  /** Corpus heavy hitters: most document-frequent shingles (boilerplate detector). */
  private def qTopShingles(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.topShingles(docs(s, dir), n = 3, k = 50)
      .orderBy(col("df_count").desc, col("shingle"))

  /** One-scan numeric column profile over orders. */
  private def qProfile(s: SparkSession, dir: String): DataFrame =
    Profile.profile(Tables.orders(s, dir),
      Seq("o_orderkey", "o_custkey", "o_totalprice")).orderBy("column")

  /** Typed extraction from the free-form JSON event payloads via the VARIANT path
    * ([[graft.ops.SemiStructured]]): parse once, extract typed fields, zero shuffle.
    */
  private def qJsonFlatten(s: SparkSession, dir: String): DataFrame =
    SemiStructured.flattenJson(Tables.events(s, dir), "props",
      Seq("k" -> (("$.k", "bigint"))))
      .select("event_id", "event_type", "k").orderBy("event_id")

  /** Engine-native session windows ([[Sessionize.sessionWindows]]): membership matches
    * the lag/running-sum form exactly (boundary merges pinned in StreamingSpec), so the
    * oracle replays the same gap logic and reports last-event + gap as the window end.
    */
  private def qSessionWindows(s: SparkSession, dir: String): DataFrame =
    Sessionize.sessionWindows(Tables.eventsMicros(s, dir), gapMinutes = 30)
      .orderBy("user_id", "session_start")

  /** SCD Type 2 history over the events change log: per-user versions with abutting
    * effective ranges ([[graft.ops.Scd2]], one shuffle on the business key).
    */
  private def qScd2(s: SparkSession, dir: String): DataFrame =
    Scd2.history(
      Tables.eventsMicros(s, dir)
        .select("event_id", "user_id", "event_type", "value", "ts"),
      key = Seq("user_id"), tsCol = "ts", tieBreak = Seq("event_id"))
      .orderBy("user_id", "version_seq")

  // ---- LLM-data-pipeline operators over documents ----------------------------------

  private def docs(s: SparkSession, dir: String): DataFrame = Tables.documents(s, dir)

  /** [[docs]] spread across cores for the CPU-HEAVY per-row gates (regex
    * chains, codecs, wide HOF arrays) — [[Tables.spread]]: identity at scale,
    * a doc_id-hash exchange only when the input is a single-row-group file
    * that would otherwise run the whole gate on one task of one core.
    */
  private def docsSpread(s: SparkSession, dir: String): DataFrame =
    Tables.spread(docs(s, dir), "doc_id")

  private def qTextStats(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.textStats(docsSpread(s, dir)).orderBy("doc_id")

  /** Gopher quality rules with corpus-scaled bounds (the synthetic docs run 10–99
    * words and carry exactly one Gopher stopword when any): word count in [20, 80],
    * at least one required stopword; everything else at the published defaults.
    */
  private def qGopherRules(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.gopherRules(docsSpread(s, dir),
      minWords = 20, maxWords = 80, minStopHits = 1)
      .orderBy("doc_id")

  private def qTokenCounts(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.tokenCounts(docs(s, dir)).orderBy("doc_id")

  /** Shared between the Spark side and the oracle so the two sigmoids are built
    * from the same literals in the same association order; every weight is an
    * exact binary double, so literal round-tripping cannot perturb the math.
    */
  private val qualityWeights = Seq(-2.0, 0.25, 0.5, -0.25, -4.0, 1.5)

  /** Logistic quality score with pinned weights: the contract gates the scoring
    * path (feature extraction + sigmoid as one codegen'd expression); training is
    * covered by QualityClassifierSpec (loss descent + separation), which no SQL
    * oracle can replay.
    */
  private def qQualityScore(s: SparkSession, dir: String): DataFrame =
    QualityClassifier.score(docsSpread(s, dir), qualityWeights)
      .select(col("doc_id"), round(col("quality"), 6).as("quality"))
      .orderBy("doc_id")

  /** Weighted PageRank over the user-behavior transition graph (event_type →
    * next event_type per user, deterministic (ts, event_id) ordering): the oracle
    * replays 5 power iterations as unrolled CTEs with the identical share/teleport
    * arithmetic, so the dangling-mass term, the damping, and the contribution sums
    * are all hash-gated.
    */
  private def qPageRank(s: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("ts", "event_id")
    // spread by the WINDOW key: the single-row-group events scan otherwise
    // runs the lag window + edge aggregation in one task, and the window
    // reuses this exchange's partitioning (no second shuffle added)
    val edges = Tables.spread(Tables.load(s, dir, "events"), "user_id")
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
      .withColumn("src", lag("event_type", 1).over(w))
      .filter(col("src").isNotNull)
      .groupBy(col("src"), col("event_type").as("dst"))
      .agg(count(lit(1)).as("weight"))
    GraphRank.pageRank(edges, iterations = 5)
      .select(col("node"), round(col("rank"), 6).as("rank"))
      .orderBy("node")
  }

  private def qLangId(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.langId(docs(s, dir)).orderBy("doc_id")

  private def qDedupExact(s: SparkSession, dir: String): DataFrame =
    Dedup.exactGroups(docs(s, dir)).orderBy("fingerprint")

  // hashShingles = false on the contract paths: the DuckDB oracle replays raw
  // n-gram strings; production defaults shuffle xxhash64 keys (Bench measures those)
  private def qNgramJaccard(s: SparkSession, dir: String): DataFrame =
    Dedup.ngramJaccardPairs(docsSpread(s, dir), threshold = 0.5, hashShingles = false)
      .orderBy("doc_a", "doc_b")

  /** Fuzzy entity resolution via FastSS deletion-neighborhood blocking: every
    * customer-name pair within edit distance 1, found through an equality join on
    * deletion variants — the oracle brute-forces the same pairs with DuckDB's own
    * `levenshtein`, so both the blocking (no missed pairs) and the verification
    * (no false pairs) are gated. The custkey cap keeps the oracle's quadratic
    * replay bounded at every sf.
    */
  private def qFuzzyPairs(s: SparkSession, dir: String): DataFrame =
    graft.ops.FuzzyJoin.editDistancePairs(
      Tables.spread(Tables.load(s, dir, "customer")
        .filter(col("c_custkey") <= 2000), "c_custkey"),
      "c_custkey", "c_name", maxDist = 1)
      .select(col("id_1"), col("id_2"), col("dist"))
      .orderBy("id_1", "id_2")

  private def qMinhashNearDup(s: SparkSession, dir: String): DataFrame =
    Dedup.minhashNearDuplicates(docsSpread(s, dir), numHashes = 32, bands = 16,
      threshold = 0.5, hashFn = Dedup.md5HashFn, bandHash = Dedup.md5BandHash,
      hashShingles = false)
      .orderBy("doc_a", "doc_b")

  /** Incremental new-batch-vs-index near-dup (docs ≥ 400 probe the signature index of
    * docs < 400): md5-twin signatures so the oracle replays the banding AND the
    * agreement estimator; est_jaccard = agreeing hashes / 32 is binary-exact.
    */
  private def qIncrementalNearDup(s: SparkSession, dir: String): DataFrame = {
    val d = docsSpread(s, dir)
    def sigs(part: DataFrame) = Dedup.minHashSignatures(
      part, numHashes = 32, hashFn = Dedup.md5HashFn)
    IncrementalDedup.matchesAgainstIndex(
        sigs(d.filter(col("doc_id") >= 400)), sigs(d.filter(col("doc_id") < 400)),
        numHashes = 32, bands = 16, bandHash = Dedup.md5BandHash, threshold = 0.5)
      .orderBy("new_doc", "index_doc")
  }

  private def qSimhash(s: SparkSession, dir: String): DataFrame =
    Dedup.simHashMd5(docsSpread(s, dir)).orderBy("doc_id")

  private def qSimhashNearPairs(s: SparkSession, dir: String): DataFrame =
    Dedup.simHashNearPairs(Dedup.simHashMd5(docsSpread(s, dir)), maxHamming = 3)
      .orderBy("doc_a", "doc_b")

  private def qFingerprints(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.fingerprints(docs(s, dir)).orderBy("doc_id")

  private def qSimilarityTopK(s: SparkSession, dir: String): DataFrame =
    Similarity.cosineTopK(Tables.embeddings(s, dir), numQueries = 10, k = 5)
      .orderBy("query_id", "rank")

  /** Hard-negative mining gate: per query, the top-5 most-similar DIFFERENT-label
    * vectors — the contrastive-training data-prep step. The oracle replays the
    * cosine arithmetic with the label-inequality join, so a wrong label filter,
    * a self-match leak, or a ranking drift hash-mismatches.
    */
  private def qHardNegatives(s: SparkSession, dir: String): DataFrame =
    Similarity.hardNegatives(Tables.embeddings(s, dir), numQueries = 10, k = 5)
      .orderBy("query_id", "rank")

  private def qAnnTopK(s: SparkSession, dir: String): DataFrame =
    Similarity.annTopK(Tables.embeddings(s, dir), numQueries = 10, k = 5,
      tables = 16, planesPerTable = 4).orderBy("query_id", "rank")

  /** Hybrid retrieval gate ([[HybridRetrieval.rrfTopK]]): reciprocal-rank
    * fusion of the distinct-token-overlap lexical leg and the embedding-cosine
    * semantic leg, doc-to-doc. The oracle replays BOTH legs' rankings and the
    * 1/(60+rank) fusion arithmetic exactly (double division is IEEE-identical
    * across engines), so a leg-ranking drift, a lost leg contribution, or a
    * fusion-order change hash-mismatches.
    */
  private def qHybridRetrieval(s: SparkSession, dir: String): DataFrame =
    HybridRetrieval.rrfTopK(docsSpread(s, dir), Tables.embeddings(s, dir),
      numQueries = 5, legK = 20, k = 10).orderBy("query_id", "rank")

  /** Matryoshka funnel gate: cosine top-k over the 16-component PREFIX of
    * each embedding ([[Similarity.matryoshkaTruncate]], slice-only — the
    * cosine normalizes, so the arithmetic is the plain formula over sliced
    * lists and the oracle replays it exactly). The cheap first pass of a
    * truncate-scan → full-dim-re-rank funnel.
    */
  private def qMatryoshkaTopK(s: SparkSession, dir: String): DataFrame =
    Similarity.cosineTopK(
        Similarity.matryoshkaTruncate(Tables.embeddings(s, dir), dim = 16,
          renormalize = false),
        numQueries = 10, k = 5)
      .orderBy("query_id", "rank")

  /** BM25-weighted hybrid retrieval gate
    * ([[HybridRetrieval.bm25RrfTopKFromIndex]]): the lexical leg ranks by full
    * Okapi BM25 computed FROM the inverted index (query term sets included —
    * corpus text is tokenized exactly once, in [[Bm25.buildIndex]]), fused with
    * the cosine leg by RRF. The oracle replays the postings build, the
    * fixed-order BM25 addend arithmetic (6-dp rounded before and after the
    * per-pair sum, so the grouped sum is order-independent), both leg rankings,
    * and the 1/(60+rank) fusion.
    */
  private def qHybridBm25(s: SparkSession, dir: String): DataFrame =
    HybridRetrieval.bm25RrfTopK(docsSpread(s, dir), Tables.embeddings(s, dir),
      numQueries = 5, legK = 20, k = 10).orderBy("query_id", "rank")

  /** Matryoshka FUNNEL gate ([[Similarity.funnelTopK]]): coarse cosine over the
    * 16-component prefix shortlists 20 candidates per query; full-64-dim cosine
    * re-ranks the shortlist to top-5. The oracle replays both passes exactly
    * (4-dp rounding + id tiebreak at each ranking).
    */
  private def qFunnelTopK(s: SparkSession, dir: String): DataFrame =
    Similarity.funnelTopK(Tables.embeddings(s, dir), numQueries = 10, k = 5,
      coarseDim = 16, shortlistK = 20).orderBy("query_id", "rank")

  /** HTML extraction gate ([[HtmlExtract.extract]]): every document is
    * wrapped in a deterministic HTML template carrying the full boilerplate
    * vocabulary — script/style/comment blocks, a nav with anchors, a title
    * with an entity, and all six decoded entities in a trailing div — then
    * extracted. The oracle replays the wrap AND the identical regex chain in
    * DuckDB (the patterns stay inside the RE2 ∩ Java subset, with explicit
    * whitespace classes), so a stripping, decoding-order, or counting drift
    * hash-mismatches.
    */
  private def qHtmlExtract(s: SparkSession, dir: String): DataFrame = {
    val wrapped = docsSpread(s, dir).select(col("doc_id"), concat(
      lit("<html><head><title>Doc "), col("doc_id"),
      lit(" &amp; co</title><script type=\"text/javascript\">var t = 1 < 2;" +
        "</script><style>.nav{color:red}</style></head><body>" +
        "<div id=\"nav\"><a href=\"/\">Home</a> <a href=\"/a\">About</a></div><p>"),
      coalesce(col("text"), lit("")),
      lit("</p><!-- chrome --><div>&quot;tail&quot; &#39;q&#39;" +
        " &nbsp;&lt;x&gt;</div></body></html>")).as("html"))
    HtmlExtract.extract(wrapped).orderBy("doc_id")
  }

  /** Block-level main-content gate ([[HtmlExtract.mainContent]]): the wrap
    * plants a link-farm nav (3 words, link density 1), the doc text as a
    * dense prose paragraph (link density 0), a related-links list, and a
    * two-word footer — the keep rule must survive exactly the prose block.
    * The oracle replays the identical block split, scoring, and reassembly.
    */
  private def qHtmlMainContent(s: SparkSession, dir: String): DataFrame = {
    val wrapped = docsSpread(s, dir).select(col("doc_id"), concat(
      lit("<html><head><title>T</title><script>var x = 1;</script></head>" +
        "<body><div id=\"nav\"><a href=\"/\">Home</a> <a href=\"/a\">About</a> " +
        "<a href=\"/b\">Contact</a></div><p>"),
      coalesce(col("text"), lit("")),
      lit(" tail &amp; more.</p><ul><li><a href=\"/x\">One link here</a></li>" +
        "<li><a href=\"/y\">Another link text</a></li></ul>" +
        "<div class=\"footer\">(c) site</div></body></html>")).as("html"))
    HtmlExtract.mainContent(wrapped).orderBy("doc_id")
  }

  /** Sentence-segmentation gate ([[TextAnalysis.sentences]]): the fixture
    * text carries no terminators, so both sides first inject them (plus two
    * abbreviation phrases) with [[sentenceFixture]]'s four replacements,
    * then segment. The oracle replays the abbreviation mask and the
    * sentinel-insert + split + position + trim chain exactly — a
    * boundary-rule, mask, or index drift hash-mismatches.
    */
  private def qSentences(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.sentences(sentenceFixture(s, dir))
      .orderBy("doc_id", "sentence_idx")

  /** Deterministic sentence fixture: terminators injected (the fixture text
    * carries none), plus abbreviation injections ("Dr.", "e.g.") that
    * exercise the abbreviation guard — without the mask these would split
    * mid-phrase and the oracle (which replays the mask) would mismatch.
    */
  private def sentenceFixture(s: SparkSession, dir: String): DataFrame =
    docs(s, dir).select(col("doc_id"),
      regexp_replace(regexp_replace(regexp_replace(regexp_replace(
        coalesce(col("text"), lit("")),
        "table ", "table. "), "row ", "row! "),
        "data ", "Dr. data "), "key ", "e.g. key ").as("text"))

  /** Sentence-grain corpus dedup gate ([[ChunkDedup.dedupSentences]]): same
    * deterministic terminator injection as q_sentences, then the C4 rule at
    * sentence grain — corpus-wide counts, first occurrence survives past
    * maxOccurrences=2, documents rebuilt in order. The oracle replays the
    * segmentation, the count/first-occurrence flags (window formulation —
    * answer-identical to the groupBy+min(struct) the operator uses), and the
    * ordered reassembly.
    */
  private def qSentenceDedup(s: SparkSession, dir: String): DataFrame =
    ChunkDedup.dedupSentences(Tables.spread(sentenceFixture(s, dir), "doc_id"),
      maxOccurrences = 2)
      .orderBy("doc_id")

  /** Character-entropy gate ([[TextAnalysis.charEntropy]]): exact-integer
    * char counts, 8-dp-rounded `c·log2 c` addends (grid sums are
    * order-independent), 6-dp entropy — the oracle replays the identical
    * arithmetic.
    */
  private def qCharEntropy(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.charEntropy(docsSpread(s, dir)).orderBy("doc_id")

  private def qEmbeddingNearDup(s: SparkSession, dir: String): DataFrame =
    Similarity.embeddingNearDuplicates(Tables.embeddings(s, dir),
      threshold = 0.45, tables = 8, planesPerTable = 4).orderBy("vec_a", "vec_b")

  /** SemDeDup semantic near-dup pairs ([[SemanticDedup.pairs]]): cluster-bucketed
    * (seed centroids = 8 lowest-id vectors, so the DuckDB oracle can replay the
    * assignment argmax exactly), intra-cluster cosine ≥ 0.45.
    */
  private def qSemanticDedup(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    SemanticDedup.pairs(emb, Ivf.seedCentroids(emb, nlist = 8), threshold = 0.45)
      .orderBy("vec_a", "vec_b")
  }

  /** Binary-quantization ANN gate ([[Similarity.bqTopK]]): 1-bit sign codes
    * packed 32 dims per BIGINT word, exact-integer Hamming shortlist, exact
    * cosine rerank. The oracle replays the packing (place-value sums are
    * sums of distinct powers of two — integer-exact in any engine), the
    * Hamming window, and the rerank arithmetic.
    */
  private def qBqTopK(s: SparkSession, dir: String): DataFrame =
    Similarity.bqTopK(Tables.embeddings(s, dir), numQueries = 10, k = 5,
      shortlistK = 30).orderBy("query_id", "rank")

  private def qIvfTopK(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    Ivf.ivfTopK(emb, Ivf.seedCentroids(emb, nlist = 16),
      numQueries = 10, k = 5, nprobe = 4).orderBy("query_id", "rank")
  }

  /** Incrementally-maintained IVF index ([[Ivf.writeIvfIndex]] + an
    * [[Ivf.appendToIvfIndex]] batch, each assigned map-side once) answering
    * the SAME query as [[qIvfTopK]] — the oracle replays the one-shot IVF
    * over the full corpus, so a pass proves the appends reconstruct the
    * full-build answer and the pruned serving path reranks identically.
    */
  /** Per-invocation scratch directory, reclaimed at JVM exit: the index-append
    * gates build a throwaway index per rep, and the returned DataFrame reads
    * it lazily (so it cannot be deleted before the driver collects) — the
    * shutdown hook stops repeated bench/verify runs from accreting index
    * copies under /tmp.
    */
  private def scratchDir(prefix: String): String = {
    val p = java.nio.file.Files.createTempDirectory(prefix)
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      import java.nio.file.{Files, Path}
      import java.util.Comparator
      if (Files.exists(p)) {
        val walk = Files.walk(p)
        try walk.sorted(Comparator.reverseOrder[Path]()).forEach { f =>
          try { Files.deleteIfExists(f); () } catch { case _: Exception => () }
        } finally walk.close()
      }
    }))
    p.toString
  }

  private def qIvfAppend(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    val idx = scratchDir("graft_ivf_inc")
    Ivf.writeIvfIndex(emb.filter(col("vec_id") < 300),
      Ivf.seedCentroids(emb, nlist = 16), idx)
    Ivf.appendToIvfIndex(emb.filter(col("vec_id") >= 300), idx)
    Ivf.ivfTopKFromIndex(Ivf.readIvfIndex(s, idx),
        numQueries = 10, k = 5, nprobe = 4)
      .orderBy("query_id", "rank")
  }

  /** Fully index-backed hybrid gate
    * ([[HybridRetrieval.hybridTopKFromIndexes]]): BOTH legs serve from
    * persisted indexes — the term-pruned BM25 postings and a cluster-pruned
    * IVF probe (16 seed centroids, nprobe=4) — never the documents table and
    * never the full embedding table. The oracle replays the postings build,
    * the fixed-order BM25 addend arithmetic, the IVF assignment/probe argmax
    * with (cosine DESC, id) tie-breaks, the 4-dp rerank, both leg rankings,
    * and the 1/(60+rank) fusion.
    */
  private def qHybridIvf(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    val emb = Tables.embeddings(s, dir)
    val idx = scratchDir("graft_hybrid_ivf")
    Bm25.writeIndex(d, s"$idx/bm25")
    Ivf.writeIvfIndex(emb, Ivf.seedCentroids(emb, nlist = 16), s"$idx/ivf")
    HybridRetrieval.hybridTopKFromIndexes(
        Bm25.readIndexFrom(s, s"$idx/bm25"), Ivf.readIvfIndex(s, s"$idx/ivf"),
        numQueries = 5, legK = 20, k = 10, nprobe = 4)
      .orderBy("query_id", "rank")
  }

  /** External-query hybrid serving gate
    * ([[HybridRetrieval.bm25RrfTopKForQueries]]): the query batch is the 5
    * lowest-id documents RELABELED out of the corpus id space (+10⁶) with
    * their embeddings — arriving from "outside", so NO extraction scan runs
    * and NO self-exclusion applies (each query's own source document is an
    * eligible, and typically top-ranked, candidate). The oracle replays the
    * exclusion-free BM25 leg, the IVF probe from the relabeled vectors, and
    * the fusion.
    */
  private def qHybridExternal(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    val emb = Tables.embeddings(s, dir)
    val idx = scratchDir("graft_hybrid_ext")
    Bm25.writeIndex(d, s"$idx/bm25")
    Ivf.writeIvfIndex(emb, Ivf.seedCentroids(emb, nlist = 16), s"$idx/ivf")
    val queries = d.filter(col("doc_id") < 5)
      .join(emb.filter(col("vec_id") < 5), col("doc_id") === col("vec_id"))
      .select((col("doc_id") + 1000000L).as("query_id"), col("text"),
        col("embedding"))
    HybridRetrieval.bm25RrfTopKForQueries(
        Bm25.readIndexFrom(s, s"$idx/bm25"), Ivf.readIvfIndex(s, s"$idx/ivf"),
        queries, legK = 20, k = 10, nprobe = 4)
      .orderBy("query_id", "rank")
  }

  /** BQ-funnel hybrid external serving gate
    * ([[HybridRetrieval.bm25BqRrfTopKForQueries]]): the qHybridExternal query
    * batch (5 lowest-id documents relabeled +10⁶), but the semantic leg is
    * the binary-quantization funnel over a persisted codes table — Hamming
    * sweep shortlist (30), exact cosine rerank — instead of an IVF probe.
    * The oracle replays the exclusion-free BM25 leg, the integer-exact
    * place-value packing + bit_count Hamming + 4-dp rerank, and the fusion.
    */
  private def qHybridBq(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    val emb = Tables.embeddings(s, dir)
    val idx = scratchDir("graft_hybrid_bq")
    Bm25.writeIndex(d, s"$idx/bm25")
    Similarity.writeCodes(emb, s"$idx/codes")
    val queries = d.filter(col("doc_id") < 5)
      .join(emb.filter(col("vec_id") < 5), col("doc_id") === col("vec_id"))
      .select((col("doc_id") + 1000000L).as("query_id"), col("text"),
        col("embedding"))
    HybridRetrieval.bm25BqRrfTopKForQueries(
        Bm25.readIndexFrom(s, s"$idx/bm25"),
        Similarity.readCodes(s, s"$idx/codes"), emb, queries,
        legK = 20, k = 10, shortlistK = 30)
      .orderBy("query_id", "rank")
  }

  /** IVFADC hybrid external serving gate
    * ([[HybridRetrieval.bm25PqRrfTopKForQueries]]): the qHybridExternal query
    * batch (5 lowest-id documents relabeled +10⁶), with the semantic leg the
    * most compressed tier — ADC over the probed clusters' m-byte codes using
    * the q_ivfpq_topk seeded codebooks (coarse = vectors 0-7, residual
    * codewords = residual slices of vectors 8-15). The oracle replays the
    * exclusion-free BM25 leg, the full IVFADC chain on the 4-dp grid, and the
    * RRF fusion.
    */
  private def qHybridPq(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    val emb = Tables.embeddings(s, dir)
    val coarse = Pq.seedCodebooks(emb, m = 1, ksub = 8)
      .select(col("code").as("cluster"), col("cw"))
    val pqCb = IvfPq.seedResidualCodebooks(emb, coarse, m = 4, ksub = 8,
      skip = 8)
    val idx = scratchDir("graft_hybrid_pq")
    Bm25.writeIndex(d, s"$idx/bm25")
    IvfPq.writePqIndex(emb, coarse, pqCb, s"$idx/pq")
    val queries = d.filter(col("doc_id") < 5)
      .join(emb.filter(col("vec_id") < 5), col("doc_id") === col("vec_id"))
      .select((col("doc_id") + 1000000L).as("query_id"), col("text"),
        col("embedding"))
    HybridRetrieval.bm25PqRrfTopKForQueries(
        Bm25.readIndexFrom(s, s"$idx/bm25"), IvfPq.readPqIndex(s, s"$idx/pq"),
        queries, legK = 20, k = 10, nprobe = 4)
      .orderBy("query_id", "rank")
  }

  /** Pure-SQL external hybrid gate ([[SqlRecipes.hybridForQueriesSql]]): the
    * qHybridExternal semantics end-to-end in ONE SQL statement over the
    * registered index views plus a registered query view — same oracle, so
    * the gate pins the recipe (not just the Scala path) to the DuckDB replay.
    */
  private def qHybridExternalSql(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    val emb = Tables.embeddings(s, dir)
    val idx = scratchDir("graft_hybrid_extsql")
    Bm25.writeIndex(d, s"$idx/bm25")
    Ivf.writeIvfIndex(emb, Ivf.seedCentroids(emb, nlist = 16), s"$idx/ivf")
    val (postingsV, _, statsV) =
      Bm25.registerIndexViews(s, s"$idx/bm25", "hes_bm25")
    val (vectorsV, centroidsV) = Ivf.registerIndexViews(s, s"$idx/ivf",
      "hes_ivf")
    d.filter(col("doc_id") < 5)
      .join(emb.filter(col("vec_id") < 5), col("doc_id") === col("vec_id"))
      .select((col("doc_id") + 1000000L).as("query_id"), col("text"),
        col("embedding"))
      .createOrReplaceTempView("hes_queries")
    s.sql(SqlRecipes.hybridForQueriesSql(postingsV, statsV, vectorsV,
        centroidsV, "hes_queries", legK = 20, k = 10, nprobe = 4))
      .orderBy("query_id", "rank")
  }

  /** Pure-SQL BQ serving gate ([[SqlRecipes.bqFromCodesSql]]): the q_bq_topk
    * funnel end-to-end in ONE SQL statement over a registered persisted codes
    * view plus the embeddings — the SAME oracle as q_bq_topk, so the recipe
    * itself (not just the Scala path) is hash-gated.
    */
  private def qBqSql(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    val codes = scratchDir("graft_bq_sql") + "/codes"
    Similarity.writeCodes(emb, codes)
    Similarity.readCodes(s, codes).createOrReplaceTempView("bqsql_codes")
    emb.createOrReplaceTempView("bqsql_emb")
    s.sql(SqlRecipes.bqFromCodesSql("bqsql_codes", "bqsql_emb",
        numQueries = 10, k = 5, shortlistK = 30))
      .orderBy("query_id", "rank")
  }

  /** Pure-SQL IVFADC serving gate ([[SqlRecipes.ivfPqForQueriesSql]]): the
    * q_ivfpq_topk seeded-codebook index served to an EXTERNAL query batch
    * (vectors 0-4 relabeled +10⁶, no self-exclusion) in ONE SQL statement
    * over the registered index views; the oracle replays the full IVFADC
    * chain with the relabeled exclusion-free semantics.
    */
  private def qIvfPqSql(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    val coarse = Pq.seedCodebooks(emb, m = 1, ksub = 8)
      .select(col("code").as("cluster"), col("cw"))
    val pqCb = IvfPq.seedResidualCodebooks(emb, coarse, m = 4, ksub = 8,
      skip = 8)
    val idx = scratchDir("graft_ivfpq_sql")
    IvfPq.writePqIndex(emb, coarse, pqCb, idx)
    val (codesV, coarseV, pqV) = IvfPq.registerIndexViews(s, idx, "pqsql_idx")
    emb.filter(col("vec_id") < 5)
      .select((col("vec_id") + 1000000L).as("query_id"), col("embedding"))
      .createOrReplaceTempView("pqsql_queries")
    s.sql(SqlRecipes.ivfPqForQueriesSql(codesV, coarseV, pqV,
        "pqsql_queries", k = 5, nprobe = 4))
      .orderBy("query_id", "rank")
  }

  /** Incrementally-maintained BQ codes table ([[Similarity.writeCodes]] + an
    * [[Similarity.appendToCodes]] batch, each quantized per row — the
    * stateless tier, nothing to freeze) answering the SAME funnel as
    * [[qBqTopK]]: the oracle replays the one-shot packing + Hamming +
    * rerank over the full corpus, so a pass proves the appended codes table
    * reconstructs the exact one-shot ranking.
    */
  private def qBqAppend(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    val codes = scratchDir("graft_bq_codes") + "/codes"
    Similarity.writeCodes(emb.filter(col("vec_id") < 300), codes)
    Similarity.appendToCodes(emb.filter(col("vec_id") >= 300), codes)
    Similarity.bqTopKFromCodes(Similarity.readCodes(s, codes), emb,
        numQueries = 10, k = 5, shortlistK = 30)
      .orderBy("query_id", "rank")
  }

  /** Centroid-staleness gate ([[Ivf.ivfDrift]]): two deterministic batches
    * (vec_id < 300 labeled b0 = base, the rest b1) land per-batch quality
    * rows at index-append time; the drift report's occupancy PSI
    * (epsilon-floored fractions, 8-dp-grid terms, 6-dp total) and mean
    * assignment cosine (exact-integer cos4 sums) are replayed by the oracle.
    */
  private def qIvfDrift(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    val idx = scratchDir("graft_ivf_drift")
    Ivf.writeIvfIndex(emb.filter(col("vec_id") < 300),
      Ivf.seedCentroids(emb, nlist = 16), idx, batchLabel = "b0")
    Ivf.appendToIvfIndex(emb.filter(col("vec_id") >= 300), idx,
      batchLabel = "b1")
    Ivf.ivfDrift(s, idx, baseBatch = "b0")
  }

  /** Build-once / serve-per-rep twins of the persisted-index gates for
    * [[graft.Bench]]: the CONTRACT queries above rightly rebuild their index
    * per invocation (the oracle must replay construction + serving in one
    * expression), but benching that form times the maintenance path —
    * per-rep index construction dominated the serving call it exists to
    * prove. Each entry here returns a THUNK after building the persisted
    * index once; Bench times only the thunk per rep (and reports the build
    * separately), so the headline number tracks the pruned serving path the
    * tier optimizes. The thunk re-resolves the index from disk each rep —
    * commit-log resolution is part of a real serving call.
    *
    * The EXTERNAL-query gates' request batch is materialized ONCE in the
    * builder ([[localRelation]]): a real serving call RECEIVES its query
    * batch as a local payload; deriving the 5-row fixture from corpus joins
    * is harness setup, and leaving it lazy made every rep re-execute that
    * corpus join 2-3× (the term-extraction collect, the probe collect, and
    * the main plan). Declared in OPTIMIZATION_r15.md; index resolution is
    * untouched — still per rep, from disk.
    */
  private def localRelation(df: DataFrame): DataFrame = {
    val rows = df.collect()
    df.sparkSession.createDataFrame(
      java.util.Arrays.asList(rows: _*), df.schema)
  }

  private[graft] def servingBench
      : Map[String, (SparkSession, String) => () => DataFrame] = Map(
    "q_bm25_append" -> ((s, dir) => {
      val d = docs(s, dir)
      val idx = scratchDir("graft_bm25_srv")
      Bm25.writeIndex(d.filter(col("doc_id") < 250), idx)
      Bm25.appendToIndex(d.filter(col("doc_id") >= 250 && col("doc_id") < 400), idx)
      Bm25.appendToIndex(d.filter(col("doc_id") >= 400), idx)
      () => Bm25.topKFromIndex(Bm25.readIndexFrom(s, idx),
          Seq("hash", "join", "vector"), k = 20)
        .orderBy(col("score").desc, col("doc_id"))
    }),
    "q_ivf_append" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val idx = scratchDir("graft_ivf_srv")
      Ivf.writeIvfIndex(emb.filter(col("vec_id") < 300),
        Ivf.seedCentroids(emb, nlist = 16), idx)
      Ivf.appendToIvfIndex(emb.filter(col("vec_id") >= 300), idx)
      () => Ivf.ivfTopKFromIndex(Ivf.readIvfIndex(s, idx),
          numQueries = 10, k = 5, nprobe = 4)
        .orderBy("query_id", "rank")
    }),
    "q_bq_append" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val codes = scratchDir("graft_bq_srv") + "/codes"
      Similarity.writeCodes(emb.filter(col("vec_id") < 300), codes)
      Similarity.appendToCodes(emb.filter(col("vec_id") >= 300), codes)
      () => Similarity.bqTopKFromCodes(Similarity.readCodes(s, codes), emb,
          numQueries = 10, k = 5, shortlistK = 30)
        .orderBy("query_id", "rank")
    }),
    "q_hybrid_ivf" -> ((s, dir) => {
      val idx = scratchDir("graft_hybrid_ivf_srv")
      Bm25.writeIndex(docs(s, dir), s"$idx/bm25")
      val emb = Tables.embeddings(s, dir)
      Ivf.writeIvfIndex(emb, Ivf.seedCentroids(emb, nlist = 16), s"$idx/ivf")
      () => HybridRetrieval.hybridTopKFromIndexes(
          Bm25.readIndexFrom(s, s"$idx/bm25"), Ivf.readIvfIndex(s, s"$idx/ivf"),
          numQueries = 5, legK = 20, k = 10, nprobe = 4)
        .orderBy("query_id", "rank")
    }),
    "q_hybrid_external" -> ((s, dir) => {
      val d = docs(s, dir)
      val emb = Tables.embeddings(s, dir)
      val idx = scratchDir("graft_hybrid_ext_srv")
      Bm25.writeIndex(d, s"$idx/bm25")
      Ivf.writeIvfIndex(emb, Ivf.seedCentroids(emb, nlist = 16), s"$idx/ivf")
      val queries = localRelation(d.filter(col("doc_id") < 5)
        .join(emb.filter(col("vec_id") < 5), col("doc_id") === col("vec_id"))
        .select((col("doc_id") + 1000000L).as("query_id"), col("text"),
          col("embedding")))
      () => HybridRetrieval.bm25RrfTopKForQueries(
          Bm25.readIndexFrom(s, s"$idx/bm25"), Ivf.readIvfIndex(s, s"$idx/ivf"),
          queries, legK = 20, k = 10, nprobe = 4)
        .orderBy("query_id", "rank")
    }),
    "q_hybrid_bq" -> ((s, dir) => {
      val d = docs(s, dir)
      val emb = Tables.embeddings(s, dir)
      val idx = scratchDir("graft_hybrid_bq_srv")
      Bm25.writeIndex(d, s"$idx/bm25")
      Similarity.writeCodes(emb, s"$idx/codes")
      val queries = localRelation(d.filter(col("doc_id") < 5)
        .join(emb.filter(col("vec_id") < 5), col("doc_id") === col("vec_id"))
        .select((col("doc_id") + 1000000L).as("query_id"), col("text"),
          col("embedding")))
      () => HybridRetrieval.bm25BqRrfTopKForQueries(
          Bm25.readIndexFrom(s, s"$idx/bm25"),
          Similarity.readCodes(s, s"$idx/codes"), emb, queries,
          legK = 20, k = 10, shortlistK = 30)
        .orderBy("query_id", "rank")
    }),
    "q_hybrid_pq" -> ((s, dir) => {
      val d = docs(s, dir)
      val emb = Tables.embeddings(s, dir)
      val coarse = Pq.seedCodebooks(emb, m = 1, ksub = 8)
        .select(col("code").as("cluster"), col("cw"))
      val pqCb = IvfPq.seedResidualCodebooks(emb, coarse, m = 4, ksub = 8,
        skip = 8)
      val idx = scratchDir("graft_hybrid_pq_srv")
      Bm25.writeIndex(d, s"$idx/bm25")
      IvfPq.writePqIndex(emb, coarse, pqCb, s"$idx/pq")
      val queries = localRelation(d.filter(col("doc_id") < 5)
        .join(emb.filter(col("vec_id") < 5), col("doc_id") === col("vec_id"))
        .select((col("doc_id") + 1000000L).as("query_id"), col("text"),
          col("embedding")))
      () => HybridRetrieval.bm25PqRrfTopKForQueries(
          Bm25.readIndexFrom(s, s"$idx/bm25"),
          IvfPq.readPqIndex(s, s"$idx/pq"),
          queries, legK = 20, k = 10, nprobe = 4)
        .orderBy("query_id", "rank")
    }),
    "q_ivf_drift" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val idx = scratchDir("graft_ivf_drift_srv")
      Ivf.writeIvfIndex(emb.filter(col("vec_id") < 300),
        Ivf.seedCentroids(emb, nlist = 16), idx, batchLabel = "b0")
      Ivf.appendToIvfIndex(emb.filter(col("vec_id") >= 300), idx,
        batchLabel = "b1")
      () => Ivf.ivfDrift(s, idx, baseBatch = "b0")
    }),
    "q_ivfpq_topk" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val coarse = Pq.seedCodebooks(emb, m = 1, ksub = 8)
        .select(col("code").as("cluster"), col("cw"))
      val pqCb = IvfPq.seedResidualCodebooks(emb, coarse, m = 4, ksub = 8,
        skip = 8)
      val idx = scratchDir("graft_ivfpq_srv")
      IvfPq.writePqIndex(emb, coarse, pqCb, idx)
      () => {
        val pidx = IvfPq.readPqIndex(s, idx)
        val queries = emb.filter(col("vec_id") < 5)
          .select(col("vec_id").as("query_id"),
            Similarity.toDoubleVec(col("embedding")).as("qv"))
        IvfPq.searchCodes(pidx.codes, queries, pidx.coarse, pidx.codebooks,
            k = 5, nprobe = 4, pruneScan = true)
          .orderBy("query_id", "rank")
      }
    }),
    "q_pq_drift" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val coarse = Pq.seedCodebooks(emb, m = 1, ksub = 8)
        .select(col("code").as("cluster"), col("cw"))
      val pqCb = IvfPq.seedResidualCodebooks(emb, coarse, m = 4, ksub = 8,
        skip = 8)
      val idx = scratchDir("graft_pq_drift_srv")
      IvfPq.writePqIndex(emb.filter(col("vec_id") < 300), coarse, pqCb, idx,
        batchLabel = "b0")
      IvfPq.appendToPqIndex(emb.filter(col("vec_id") >= 300), idx,
        batchLabel = "b1")
      () => IvfPq.pqDrift(s, idx, baseBatch = "b0")
    }))

  /** IVFADC gate ([[IvfPq.search]]) — the fourth ANN tier's first ORACLE gate
    * (it was test-only through round 13: trained codebooks aren't
    * cross-engine-replayable). Both codebooks SEED deterministically: coarse
    * centroid c = vector c (the [[Ivf.seedCentroids]] convention, L2 here);
    * residual codeword q of every subspace = the residual slice of vector
    * 8 + q — skipping the coarse seeds, whose own residuals are exactly zero
    * ([[IvfPq.seedResidualCodebooks]]). The oracle replays assignment argmin,
    * residuals, per-subspace encode argmin, probe ranking, and the ADC
    * lookup-table sum on the 4-dp grid with (adist ASC, vec_id) ties.
    */
  private def qIvfPqTopK(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    val coarse = Pq.seedCodebooks(emb, m = 1, ksub = 8)
      .select(col("code").as("cluster"), col("cw"))
    val pqCb = IvfPq.seedResidualCodebooks(emb, coarse, m = 4, ksub = 8,
      skip = 8)
    IvfPq.search(emb, coarse, pqCb, numQueries = 5, k = 5, nprobe = 4)
      .orderBy("query_id", "rank")
  }

  /** Codebook-fit drift gate ([[IvfPq.pqDrift]]) — the PQ twin of
    * [[qIvfDrift]], over the SEEDED codebooks of [[qIvfPqTopK]] so the whole
    * lifecycle replays: two deterministic batches (vec_id < 300 = b0 base,
    * the rest b1) land per-batch quality rows (qerr4 exact-integer sums) at
    * index-append time; the report's occupancy PSI and mean residual
    * quantization error are replayed by the oracle.
    */
  private def qPqDrift(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    val coarse = Pq.seedCodebooks(emb, m = 1, ksub = 8)
      .select(col("code").as("cluster"), col("cw"))
    val pqCb = IvfPq.seedResidualCodebooks(emb, coarse, m = 4, ksub = 8,
      skip = 8)
    val idx = scratchDir("graft_pq_drift")
    IvfPq.writePqIndex(emb.filter(col("vec_id") < 300), coarse, pqCb, idx,
      batchLabel = "b0")
    IvfPq.appendToPqIndex(emb.filter(col("vec_id") >= 300), idx,
      batchLabel = "b1")
    IvfPq.pqDrift(s, idx, baseBatch = "b0")
  }

  private def qRepetition(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.repetitionStats(docsSpread(s, dir)).orderBy("doc_id")

  /** Contamination sweep of the corpus against a stand-in benchmark set (the 20
    * lowest-id documents) — exact self-copies surface at containment 1.0.
    */
  private def qContamination(s: SparkSession, dir: String): DataFrame =
    Dedup.contamination(docs(s, dir), docs(s, dir).filter(col("doc_id") < 20),
      threshold = 0.5, hashShingles = false).orderBy("corpus_doc", "ref_doc")

  /** Real decode gate: text bytes → genuine grayscale PNG ([[Multimodal.encodePng]]) →
    * `javax.imageio` decode → features read off the DECODED raster. The oracle predicts
    * what a correct decoder must recover (geometry is a pure function of payload
    * length; the (0,0) pixel is the first text byte), so a decoder that fabricated
    * dimensions instead of decoding would hash-mismatch.
    */
  private def qMultimodalFeatures(s: SparkSession, dir: String): DataFrame = {
    implicit val sp: SparkSession = s
    Multimodal.featureTable(docsSpread(s, dir))
      .select("doc_id", "width", "height", "channels", "n_pixels", "first_byte")
      .orderBy("doc_id")
  }

  /** Real WAV round-trip: deterministic integer waveforms encode as genuine RIFF
    * containers, `javax.sound` decodes them, and every signal feature (RMS, zero
    * crossings, peak) is recomputed by the oracle from the same integer recurrence —
    * a decoder that fabricated features instead of reading the PCM stream would
    * hash-mismatch.
    */
  private def qAudioFeatures(s: SparkSession, dir: String): DataFrame = {
    implicit val sp: SparkSession = s
    Multimodal.audioFeatureTable(docsSpread(s, dir))
      .select("doc_id", "sample_rate", "channels", "bits", "n_frames",
        "duration_ms", "rms", "zero_crossings", "peak")
      // a global sort's range-sampling pass re-executes its child, so the
      // WAV encode+decode would run TWICE per action; checkpoint the decoded
      // features (metadata-width rows) so the codec runs once (guide §5)
      .localCheckpoint()
      .orderBy("doc_id")
  }

  /** As-of join: each event enriched with the latest order of the same customer at or
    * before the event time (union + running-last; one shuffle). Orders are pre-compacted
    * to unique (customer, date) so the match is deterministic.
    */
  private def qAsofJoin(s: SparkSession, dir: String): DataFrame = {
    val compacted = refOrders(s, dir)
      .groupBy(col("customer_id"), col("order_date").as("order_ts"))
      .agg(max(col("order_id")).as("last_order_id"),
        max(col("order_amount")).as("last_order_amount"))
      .withColumn("last_order_date", to_date(col("order_ts")))
    val ev = Tables.eventsMicros(s, dir).select(col("event_id"), col("user_id"), col("ts"))
    AsOfJoin.asOf(ev, compacted,
        leftKey = "user_id", rightKey = "customer_id",
        leftTs = "ts", rightTs = "order_ts",
        payload = Seq("last_order_id", "last_order_amount", "last_order_date"))
      .orderBy("event_id")
  }

  /** Bin-bucketed range join gate: every event counted against the 1-hour attribution
    * windows the same user's `purchase` events open. [[RangeJoin.pointInInterval]]
    * turns the interval containment into an equality join on (user, bin) + exact
    * refine; the oracle replays the plain inequality join — results must agree
    * exactly.
    */
  /** Interval-overlap join: per-user pairs of concurrent 1-hour activity windows
    * (each event opens a half-open hour). The oracle replays the plain inequality
    * self-join; the engine's bin-bucketed equality join must agree exactly —
    * including emitting each overlapping pair exactly once.
    */
  private def qIntervalOverlap(s: SparkSession, dir: String): DataFrame = {
    val hour = 3600L * 1000000L
    val ev = Tables.eventsMicros(s, dir)
    def side(p: String) = ev.select(col("user_id"),
      col("event_id").as(s"${p}_id"), unix_micros(col("ts")).as(s"${p}_s"),
      (unix_micros(col("ts")) + hour).as(s"${p}_e"))
    RangeJoin.intervalOverlap(side("a"), side("b"), "a_s", "a_e", "b_s", "b_e",
        binWidth = hour, keys = Seq("user_id"))
      .filter(col("a_id") < col("b_id"))
      .select("user_id", "a_id", "b_id")
      .orderBy("user_id", "a_id", "b_id")
  }

  private def qRangeJoin(s: SparkSession, dir: String): DataFrame = {
    val hour = 3600L * 1000000L
    val ev = Tables.eventsMicros(s, dir)
    val pts = ev.select(col("event_id"), col("user_id"),
      unix_micros(col("ts")).as("ts_us"))
    val iv = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), unix_micros(col("ts")).as("start_us"))
      .withColumn("end_us", col("start_us") + hour)
    RangeJoin.pointInInterval(pts, iv, "ts_us", "start_us", "end_us",
        binWidth = hour, keys = Seq("user_id"))
      .groupBy("event_id", "user_id")
      .agg(count(lit(1)).as("n_windows"))
      .orderBy("event_id")
  }

  /** Fixed-token chunking with overlap (64-token windows, 16 overlap) — the
    * training-data windowing op; the oracle replays the identical token slicing.
    */
  private def qDocChunks(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.chunk(docs(s, dir), chunkTokens = 64, overlap = 16)
      .orderBy("doc_id", "chunk_id")

  /** Deterministic hash-bucketed train/val/test assignment; the oracle recomputes
    * the md5 bucket and cuts at the same boundaries — engine-independent membership.
    */
  private def qDatasetSplit(s: SparkSession, dir: String): DataFrame =
    Splits.assign(docs(s, dir))
      .select("doc_id", "bucket", "split")
      .orderBy("doc_id")

  /** k-fold gate ([[Splits.kFold]]): the md5 fold tag for k=5 — the oracle
    * replays the one shard formula, so folds are provably engine-portable.
    */
  private def qKfold(s: SparkSession, dir: String): DataFrame =
    Splits.kFold(docs(s, dir), k = 5)
      .select("doc_id", "fold")
      .orderBy("doc_id")

  /** Per-stratum deterministic sampling: half of English, all of Chinese, none of the
    * rest — the oracle replays the md5 bucket and the same CASE cuts.
    */
  private def qStratifiedSample(s: SparkSession, dir: String): DataFrame =
    Splits.sampleStratified(docs(s, dir), "lang",
        Map("en" -> 0.5, "zh" -> 1.0), defaultFraction = 0.0)
      .select("doc_id", "lang", "source")
      .orderBy("doc_id")

  /** Distribution drift: PSI of order value between pre- and post-1998 orders over
    * fixed 50k-wide bins. The oracle recomputes the identical binning (count of
    * edges ≤ value), fractions, epsilon floor, and ln chain, rounded to 6 decimals.
    */
  private def qDrift(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
    val cut = lit("1998-01-01").cast("timestamp")
    Drift.psi(
        o.filter(col("o_orderdate") < cut), o.filter(col("o_orderdate") >= cut),
        "o_totalprice", edges = (1 to 9).map(_ * 50000.0))
      .orderBy("bin")
  }

  /** Categorical drift: PSI of the language mix between the two halves of the
    * document corpus (doc_id split) — the training-mix monitor.
    */
  private def qDriftCategorical(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    Drift.psiCategorical(
        d.filter(col("doc_id") % 2 === 0), d.filter(col("doc_id") % 2 === 1), "lang")
      .orderBy("category")
  }

  /** Relative quality floor: each language's top half by composite quality score,
    * rank-based with doc_id tiebreak (engine-exact, unlike interpolated
    * percentiles). The oracle recomputes the score and replays the same window.
    */
  private def qQualityFloor(s: SparkSession, dir: String): DataFrame = {
    val scored = TextAnalysis.textStats(docs(s, dir))
      .select("doc_id", "quality_score")
      .join(docs(s, dir).select("doc_id", "lang"), "doc_id")
    CorpusCuration.keepTopFractionByGroup(scored, "lang", "quality_score", 0.5)
      .select("doc_id", "lang", "quality_score")
      .orderBy("doc_id")
  }

  /** Class balancing: every language downsampled toward the rarest language's
    * count (fraction = min_n/n_g); the oracle recomputes the same fractions from
    * the same counts and replays the md5 cut.
    */
  private def qBalancedSample(s: SparkSession, dir: String): DataFrame =
    Splits.equalizeGroups(docs(s, dir), "lang")
      .select("doc_id", "lang")
      .orderBy("doc_id")

  /** Maximal duplicated 8-token spans corpus-wide (Lee-et-al-style substring dedup);
    * the oracle replays window fingerprints, the occurrence threshold, and the
    * gaps-and-islands merge.
    */
  private def qDupSpans(s: SparkSession, dir: String): DataFrame =
    Dedup.duplicatedSpans(docsSpread(s, dir), windowTokens = 8)
      .orderBy("doc_id", "start_token")

  /** Fixed 24-bin histogram of order totals over [0, 600000); the oracle replays
    * the identical bin arithmetic (same w = (hi-lo)/bins expression, same clamp).
    */
  private def qHistogram(s: SparkSession, dir: String): DataFrame =
    Profile.histogram(Tables.orders(s, dir), "o_totalprice", 0.0, 600000.0, 24)
      .orderBy("bin")

  /** N-gram novelty of the "new batch" (doc_id >= 400, the same split as
    * q_incremental_neardup) against the reference slice; the oracle replays the
    * shingle sets, the anti-join, and the ratio.
    */
  private def qNovelty(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    IncrementalDedup.shingleNovelty(
        d.filter(col("doc_id") >= 400), d.filter(col("doc_id") < 400))
      .orderBy("doc_id")
  }

  /** CCNet-style bigram LM self-scoring: documents scored under the corpus's own
    * add-one bigram statistics; the oracle replays counts, smoothing, and the ln
    * chain (mean rounded to 6 dp for summation-order neutrality).
    */
  private def qLmScore(s: SparkSession, dir: String): DataFrame =
    NgramLm.perplexityScores(docs(s, dir), docs(s, dir))
      .orderBy("doc_id")

  /** CCNet head/middle/tail bucketing of the LM scores; the oracle recomputes the
    * tercile cutoffs with the same interpolated-percentile definition and replays
    * the CASE.
    */
  private def qLmBuckets(s: SparkSession, dir: String): DataFrame =
    NgramLm.bucketByScore(NgramLm.perplexityScores(docs(s, dir), docs(s, dir)))
      .orderBy("doc_id")

  /** Int8 scalar quantization of every embedding; the oracle replays the max-abs
    * scale and the exact `round(x·127/scale)` chain (identical operation order →
    * identical doubles → identical roundings). Codes surface comma-joined so the
    * compare is engine-neutral on arrays.
    */
  private def qInt8Quant(s: SparkSession, dir: String): DataFrame =
    Similarity.quantizeInt8(Tables.embeddings(s, dir))
      .select(col("vec_id"), col("scale"),
        concat_ws(",", col("codes")).as("codes_csv"))
      .orderBy("vec_id")

  /** Surgical substring dedup: documents with their duplicated 8-token spans cut
    * out; the oracle re-derives the spans and replays the token-index filter and
    * single-space rebuild.
    */
  private def qSpanCut(s: SparkSession, dir: String): DataFrame =
    Dedup.dedupSubstrings(docsSpread(s, dir), windowTokens = 8)
      .select("doc_id", "text", "n_tokens_removed")
      .orderBy("doc_id")

  /** Deterministic 8-shard training-order assignment; the oracle replays the md5
    * mod and the within-shard row_number over the identical (md5, id) order.
    */
  private def qShards(s: SparkSession, dir: String): DataFrame =
    Splits.shardAssign(docs(s, dir), numShards = 8)
      .select("doc_id", "shard", "position")
      .orderBy("doc_id")

  /** Curriculum-schedule gate: easy→hard phase bands by exact percentile cutoffs
    * over document length, md5 shard + position within each (phase, shard). The
    * oracle replays the interpolated cutoffs, the tie-to-lower-phase rule, and
    * the md5 ordering, so a cutoff drift or an order instability hash-mismatches.
    */
  private def qCurriculum(s: SparkSession, dir: String): DataFrame =
    Splits.curriculumSchedule(docs(s, dir), scoreCol = "n_chars",
        phases = 3, numShards = 4)
      .select("doc_id", "phase", "shard", "position")
      .orderBy("doc_id")

  /** C4-style corpus-level chunk dedup: 20-word chunks occurring more than once
    * corpus-wide keep only their first occurrence, documents reassemble from the
    * survivors. The oracle replays the chunking, the corpus-wide count, the
    * first-occurrence tiebreak, and the in-order rebuild.
    */
  private def qChunkDedup(s: SparkSession, dir: String): DataFrame =
    ChunkDedup.dedupChunks(docsSpread(s, dir), chunkWords = 20, maxOccurrences = 1)
      .orderBy("doc_id")

  // targets and budget shared verbatim by the Spark plan and the oracle SQL —
  // src_books is deliberately absent from the corpus (exercises 'missing'), and
  // most corpus sources carry no weight (exercise 'unused')
  private val mixtureTargets = Seq(
    "src0" -> 0.3, "src1" -> 0.25, "src2" -> 0.2, "src3" -> 0.15, "src_books" -> 0.1)
  private val mixtureBudget = 5000L

  /** Pre-training mixture plan: per-source token inventories vs target weights
    * over a fixed budget — sampling rates, upsample epochs, and status flags.
    * The oracle replays the token sums and every arithmetic step.
    */
  private def qMixturePlan(s: SparkSession, dir: String): DataFrame =
    Mixture.plan(docs(s, dir), mixtureTargets.toMap, mixtureBudget)
      .orderBy("source")

  /** k-anonymity / l-diversity audit of the customer table over the
    * (nation, market segment) quasi-identifier with account balance as the
    * sensitive attribute; thresholds chosen so both flags split non-vacuously
    * at sf0.01 (class sizes straddle k=8, distinct balances straddle l=6).
    */
  private def qKAnonymity(s: SparkSession, dir: String): DataFrame =
    Privacy.equivalenceClasses(Tables.load(s, dir, "customer"),
        Seq("c_nationkey", "c_mktsegment"), k = 8,
        sensitiveCol = Some("c_acctbal"), l = 6)
      .orderBy("c_nationkey", "c_mktsegment")

  /** Entropy l-diversity over (nation → market segment): the distinct count
    * passes everywhere (all 5 segments appear in every nation) while the
    * entropy flag splits on how BALANCED each nation's segment mix is — the
    * distinction the entropy variant exists to draw. The entropy value is
    * rounded to 6 decimals so the double arithmetic hashes identically across
    * engines; the flags compare the unrounded value (a class within 1e-15 of
    * ln(l) is the only way they could diverge).
    */
  private def qLDiversity(s: SparkSession, dir: String): DataFrame =
    Privacy.equivalenceClasses(Tables.load(s, dir, "customer"),
        Seq("c_nationkey"), k = 8,
        sensitiveCol = Some("c_mktsegment"), l = 5, entropy = true)
      .withColumn("sensitive_entropy", round(col("sensitive_entropy"), 6))
      .orderBy("c_nationkey")

  /** Per-source hard cap (10 docs per source) via the bottom-k aggregate; the
    * oracle replays selection as a row_number window over the identical
    * (md5(id), id) order — the two formulations must pick row-identical sets.
    */
  private def qSourceCaps(s: SparkSession, dir: String): DataFrame =
    Splits.capGroups(docs(s, dir), "source", 10)
      .select("doc_id", "source")
      .orderBy("source", "doc_id")

  /** Canonical text normalization (NFC, control strip, whitespace collapse, trim,
    * lower) with the md5 of the result — the fingerprint a normalized-dedup pass
    * would group on; the oracle replays every step via DuckDB's nfc_normalize.
    */
  private def qNormalizeText(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .select(col("doc_id"),
        md5(TextAnalysis.normalizeText(col("text"))).as("norm_fingerprint"))
      .orderBy("doc_id")

  /** PII scrubbing ([[graft.ops.Pii]]): deterministic per-doc synthetic text
    * carrying one email, phone, card, SSN, and IP shape each — detection
    * counts on the original, redaction tokens in the output. The oracle
    * replays the exact regex chain in DuckDB (RE2) against Spark (Java regex):
    * the patterns avoid lookarounds/backreferences precisely so both engines
    * provably agree; a count or substitution divergence hash-mismatches.
    */
  private def qPiiRedact(s: SparkSession, dir: String): DataFrame = {
    val id = col("doc_id").cast("string")
    val synth = docsSpread(s, dir).select(col("doc_id")).withColumn("text", concat(
      lit("Reach user"), id, lit("@mail"), (col("doc_id") % 7).cast("string"),
      lit(".org or call "), ((col("doc_id") % 900) + 100).cast("string"),
      lit("-555-"), lpad((col("doc_id") % 10000).cast("string"), 4, "0"),
      lit(" card 4111-1111-1111-1111 from 10.0."),
      (col("doc_id") % 256).cast("string"), lit("."),
      (col("doc_id") % 100).cast("string"), lit(" ssn 123-45-"),
      lpad((col("doc_id") % 10000).cast("string"), 4, "0"),
      lit(" tail "), id))
    graft.ops.Pii.redact(graft.ops.Pii.detect(synth), "text")
      .select(col("doc_id"), col("pii_email").cast("long").as("pii_email"),
        col("pii_phone").cast("long").as("pii_phone"),
        col("pii_card").cast("long").as("pii_card"),
        col("pii_ssn").cast("long").as("pii_ssn"),
        col("pii_ip").cast("long").as("pii_ip"),
        col("pii_total").cast("long").as("pii_total"), col("text_redacted"))
      .orderBy("doc_id")
  }

  /** URL curation gate ([[graft.ops.UrlOps]]): deterministic per-doc URLs over
    * five hosts; domain extraction must strip scheme/port/path, and the
    * blocklist must drop exact AND subdomain matches (`x.ads.example.com`
    * falls to `ads.example.com`) while `ok.example.com` — a SIBLING under the
    * same parent — survives, proving suffix matching is label-precise, not a
    * substring test. The oracle states the surviving rows and domains.
    */
  private def qUrlFilter(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val host = when(col("doc_id") % 5 === 0, lit("ads.example.com"))
      .when(col("doc_id") % 5 === 1, lit("x.ads.example.com"))
      .when(col("doc_id") % 5 === 2, lit("ok.example.com"))
      .when(col("doc_id") % 5 === 3, lit("tracker.net"))
      .otherwise(lit("good.org"))
    val urls = docs(s, dir).select(col("doc_id"),
      concat(lit("https://"), host, lit(":8080/p/"),
        col("doc_id").cast("string")).as("url"))
    val blocklist = Seq("ads.example.com", "tracker.net").toDF("domain")
    graft.ops.UrlOps.filterBlockedDomains(
      graft.ops.UrlOps.extractDomain(urls), blocklist)
      .orderBy("doc_id")
  }

  /** Quality-weighted sampling: each document survives with probability equal to
    * its composite quality score — better documents oversampled, junk culled, all
    * decided by the deterministic md5 bucket (score steps are exact quarters, so
    * the cut has no float-boundary risk).
    */
  private def qWeightedSample(s: SparkSession, dir: String): DataFrame =
    Splits.sampleByWeight(
        TextAnalysis.textStats(docs(s, dir)).select("doc_id", "quality_score"),
        "quality_score")
      .orderBy("doc_id")

  /** Temperature sampling (alpha=0.5, target 30% of the corpus): the sampled language
    * mix flattens toward sqrt-proportional shares. The oracle recomputes fractions
    * from the same counts with the identical fold order, then replays the md5 cut.
    */
  private def qTemperatureSample(s: SparkSession, dir: String): DataFrame =
    Splits.temperatureSample(docs(s, dir), "lang", alpha = 0.5, targetFraction = 0.3)
      .select("doc_id", "lang")
      .orderBy("doc_id")

  /** 3-step ordered funnel (view → click → purchase) per user, 24 h completion
    * window; step timestamps surface as epoch micros so the min-recursion chain is
    * integer-exact in both engines.
    */
  private def qFunnel(s: SparkSession, dir: String): DataFrame =
    Funnel.userFunnel(Tables.eventsMicros(s, dir),
        Seq("view", "click", "purchase"), windowMicros = 24L * 3600 * 1000000)
      .orderBy("user_id")

  /** Top-50 adjacent token pairs by frequency (pair tiebreak) — one BPE merge
    * iteration's candidate list; the oracle rebuilds pairs by zipping each token
    * list with its own tail.
    */
  private def qTokenPairs(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.tokenPairCounts(docs(s, dir))
      .orderBy(col("n").desc, col("pair"))
      .limit(50)

  /** Top-100 vocabulary by document frequency (term tiebreak): df, total tf, and
    * the smoothed idf, each replayed exactly by the oracle.
    */
  private def qVocabulary(s: SparkSession, dir: String): DataFrame =
    Bm25.vocabulary(docs(s, dir))
      .orderBy(col("df").desc, col("term"))
      .limit(100)

  /** BM25 top-20 for a 3-term keyword query; scores rounded to 6 decimals on both
    * sides (exact-integer tf/df/dl inputs, identical addend order) with doc_id
    * tiebreak so the ranking hashes identically.
    */
  private def qBm25(s: SparkSession, dir: String): DataFrame =
    Bm25.topK(docsSpread(s, dir), Seq("hash", "join", "vector"), k = 20)
      .orderBy(col("score").desc, col("doc_id"))

  /** DuckDB replay of [[HtmlExtract.mainContent]]'s block rule over the
    * q_html_main_content wrap — the block-text chain (tag strip, entity
    * decode in the same order, whitespace collapse) is generated once here
    * and inlined at every use, exactly what the Spark HOFs compute per block.
    */
  private lazy val htmlMainContentOracle: String = {
    def text(x: String): String =
      "trim(regexp_replace(replace(replace(replace(replace(replace(replace(" +
        s"regexp_replace($x, '<[^>]*>', ' ', 'g'), '&nbsp;', ' '), " +
        "'&lt;', '<'), '&gt;', '>'), '&quot;', '\"'), '&#39;', ''''), " +
        "'&amp;', '&'), '[ \\t\\n\\f\\r]+', ' ', 'g'))"
    val noAnchor = "regexp_replace(x, '(?is)<a[^>]*>.*?</a>', ' ', 'g')"
    val keep = s"${text("x")} <> '' " +
      s"AND len(string_split(${text("x")}, ' ')) >= 5 " +
      s"AND CAST(greatest(len(${text("x")}) - len(${text(noAnchor)}), 0) AS DOUBLE)" +
      s" / greatest(len(${text("x")}), 1) <= 0.33"
    s"""WITH w AS (SELECT doc_id,
       |  '<html><head><title>T</title><script>var x = 1;</script></head>' ||
       |  '<body><div id="nav"><a href="/">Home</a> <a href="/a">About</a> ' ||
       |  '<a href="/b">Contact</a></div><p>' || coalesce(text, '') ||
       |  ' tail &amp; more.</p><ul><li><a href="/x">One link here</a></li>' ||
       |  '<li><a href="/y">Another link text</a></li></ul>' ||
       |  '<div class="footer">(c) site</div></body></html>' AS html
       | FROM documents),
       |nc AS (SELECT doc_id,
       |  regexp_replace(regexp_replace(regexp_replace(regexp_replace(html,
       |    '(?is)<script[^>]*>.*?</script>', ' ', 'g'),
       |    '(?is)<style[^>]*>.*?</style>', ' ', 'g'),
       |    '(?is)<noscript[^>]*>.*?</noscript>', ' ', 'g'),
       |    '(?s)<!--.*?-->', ' ', 'g') AS pre
       | FROM w),
       |b AS (SELECT doc_id, string_split(regexp_replace(pre,
       |    '${HtmlExtract.blockTagPattern}', chr(1), 'g'), chr(1)) AS blocks
       | FROM nc)
       |SELECT doc_id,
       |  array_to_string(list_transform(
       |    list_filter(blocks, x -> $keep), x -> ${text("x")}), ' ')
       |    AS main_text,
       |  CAST(len(list_filter(blocks, x -> ${text("x")} <> '')) AS INT)
       |    AS n_blocks,
       |  CAST(len(list_filter(blocks, x -> $keep)) AS INT) AS n_kept
       |FROM b ORDER BY doc_id""".stripMargin
  }

  /** DuckDB-side shared sentence segmentation chain (q_sentences /
    * q_sentence_dedup): the four deterministic injections, the abbreviation
    * mask (chr(2) sentinel — [[TextAnalysis.abbreviationMaskPattern]] spliced
    * verbatim, RE2-safe), then the sentinel-insert + split + positional
    * unnest. Consumers restore chr(2) to '.' and trim.
    */
  private lazy val sentenceUnitsDuck: String =
    """WITH p AS (SELECT doc_id,
      |    regexp_replace(regexp_replace(regexp_replace(regexp_replace(
      |      coalesce(text, ''),
      |      'table ', 'table. ', 'g'), 'row ', 'row! ', 'g'),
      |      'data ', 'Dr. data ', 'g'), 'key ', 'e.g. key ', 'g') AS text
      |  FROM documents),
      |mk AS (SELECT doc_id, regexp_replace(text,
      |      '""".stripMargin + TextAnalysis.abbreviationMaskPattern +
    """', '\1' || chr(2), 'g') AS text
      |  FROM p),
      |m AS (SELECT doc_id,
      |    string_split(regexp_replace(text,
      |      '([.!?]+["\)\]'']*)[ \t\n\f\r]+', '\1' || chr(1), 'g'),
      |      chr(1)) AS arr
      |  FROM mk),
      |u AS (SELECT doc_id, unnest(arr) AS s0,
      |    unnest(range(len(arr))) AS idx FROM m)""".stripMargin

  /** DuckDB replay of the 3-term Okapi BM25 scan formulation — shared by the
    * scan-path gate (`q_bm25_topk`) and the incremental-index gate
    * (`q_bm25_append`), whose pass therefore proves append-equality too.
    */
  private lazy val bm25OracleSql: String = {
    val terms = Seq("hash", "join", "vector")
    val tf = terms.zipWithIndex.map { case (t, i) =>
      s"len(list_filter(toks, x -> x = '$t')) AS tf$i" }.mkString(", ")
    val df = terms.indices.map(i =>
      s"SUM(CASE WHEN tf$i > 0 THEN 1 ELSE 0 END) AS df$i").mkString(", ")
    val addends = terms.indices.map { i =>
      s"""ln(1.0 + (n - df$i + 0.5) / (df$i + 0.5)) * tf$i * 2.2
         | / (tf$i + 1.2 * (0.25 + 0.75 * dl / avgdl))""".stripMargin.replace("\n", "")
    }.mkString("(", " + ", ")")
    val anyTf = terms.indices.map(i => s"tf$i").mkString(" + ")
    s"""WITH p AS (
       |  SELECT doc_id, len(toks) AS dl, $tf
       |  FROM (SELECT doc_id,
       |    string_split_regex(trim(lower(text)), '\\s+') AS toks FROM documents)),
       |st AS (
       |  SELECT CAST(COUNT(*) AS DOUBLE) AS n,
       |    CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl, $df
       |  FROM p)
       |SELECT doc_id, round($addends, 6) AS score
       |FROM p, st WHERE $anyTf > 0
       |ORDER BY score DESC, doc_id LIMIT 20""".stripMargin
  }

  /** Incrementally-maintained BM25 index ([[Bm25.writeIndex]] + two
    * [[Bm25.appendToIndex]] batches, each tokenized once, through the
    * versioned table) answering the SAME query as [[qBm25]] — the oracle
    * replays the scan formulation over the full corpus, so a pass proves the
    * incremental appends reconstruct the exact full-build ranking.
    */
  private def qBm25Append(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    val idx = scratchDir("graft_bm25_inc")
    Bm25.writeIndex(d.filter(col("doc_id") < 250), idx)
    Bm25.appendToIndex(d.filter(col("doc_id") >= 250 && col("doc_id") < 400), idx)
    Bm25.appendToIndex(d.filter(col("doc_id") >= 400), idx)
    Bm25.topKFromIndex(Bm25.readIndexFrom(s, idx), Seq("hash", "join", "vector"),
        k = 20)
      .orderBy(col("score").desc, col("doc_id"))
  }

  /** Rollup subtotals over daily sales (date, region hierarchy + grand total). */
  private def qSalesRollup(s: SparkSession, dir: String): DataFrame = {
    val dec = col("order_amount").cast(DecimalType(18, 2))
    refOrders(s, dir)
      .join(broadcast(refCustomers(s, dir).select("customer_id", "region")),
        Seq("customer_id"))
      .withColumn("sale_date", date_format(col("order_date"), "yyyy-MM-dd"))
      .rollup(col("sale_date"), col("region"))
      .agg(count(lit(1)).as("n_orders"), sum(dec).cast("double").as("revenue"))
      .orderBy(asc_nulls_first("sale_date"), asc_nulls_first("region"))
  }

  /** CUBE over the same frame: all four grouping sets — (date, region), date-only,
    * region-only, grand total — completing §2.7 subtotal parity next to ROLLUP.
    */
  private def qSalesCube(s: SparkSession, dir: String): DataFrame = {
    val dec = col("order_amount").cast(DecimalType(18, 2))
    refOrders(s, dir)
      .join(broadcast(refCustomers(s, dir).select("customer_id", "region")),
        Seq("customer_id"))
      .withColumn("sale_date", date_format(col("order_date"), "yyyy-MM-dd"))
      .cube(col("sale_date"), col("region"))
      .agg(count(lit(1)).as("n_orders"), sum(dec).cast("double").as("revenue"))
      .orderBy(asc_nulls_first("sale_date"), asc_nulls_first("region"))
  }

  /** Analytic window functions: rank / dense_rank / lag / ntile / running decimal total
    * per customer (frame specs beyond the reference's unused Window import).
    */
  private def qWindowAnalytics(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("customer_id"))
      .orderBy(col("order_date"), col("order_id"))
    val wAmt = Window.partitionBy(col("customer_id"))
      .orderBy(col("order_amount").desc, col("order_id"))
    refOrders(s, dir).select(
      col("customer_id"), col("order_id"),
      to_date(col("order_date")).as("order_date"),
      col("order_amount"),
      rank().over(wAmt).as("amount_rank"),
      dense_rank().over(wAmt).as("amount_dense_rank"),
      ntile(4).over(wAmt).as("amount_quartile"),
      datediff(col("order_date"), lag(col("order_date"), 1).over(w))
        .as("days_since_prev"),
      sum(col("order_amount").cast(DecimalType(18, 2)))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("double").as("running_total"))
      .orderBy("customer_id", "order_id")
  }

  /** Set operations: customers ordering in 1995 minus 1996, and both-years intersect. */
  private def qSetOps(s: SparkSession, dir: String): DataFrame = {
    val o = refOrders(s, dir)
    def custsIn(y: Int) =
      o.filter(year(col("order_date")) === y)
        .select(col("customer_id")).distinct()
    val onlyY1 = custsIn(1995).except(custsIn(1996))
      .withColumn("segment", lit("only_1995"))
    val both = custsIn(1995).intersect(custsIn(1996))
      .withColumn("segment", lit("both_years"))
    onlyY1.unionAll(both).orderBy("segment", "customer_id")
  }

  /** Pivot: revenue per sale year pivoted to one column per region (explicit values for
    * a deterministic schema).
    */
  private def qPivotRevenue(s: SparkSession, dir: String): DataFrame = {
    val regions = Seq("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY")
    refOrders(s, dir)
      .join(broadcast(refCustomers(s, dir).select("customer_id", "region")),
        Seq("customer_id"))
      .withColumn("sale_year", year(col("order_date")))
      .groupBy("sale_year")
      .pivot("region", regions)
      .agg(sum(col("order_amount").cast(DecimalType(18, 2))).cast("double"))
      .orderBy("sale_year")
  }

  /** Exact interpolated percentiles of event value per type (Spark `percentile` ≡
    * DuckDB `quantile_cont`: both interpolate at rank (n−1)·p).
    */
  private def qValuePercentiles(s: SparkSession, dir: String): DataFrame =
    Tables.eventsMicros(s, dir)
      .groupBy("event_type")
      .agg(
        expr("percentile(value, 0.25)").as("p25"),
        expr("percentile(value, 0.5)").as("p50"),
        expr("percentile(value, 0.75)").as("p75"),
        expr("percentile(value, 0.95)").as("p95"),
        count(lit(1)).as("n"))
      .orderBy("event_type")

  /** Scan-heavy pricing summary over lineitem (TPC-H Q1 shape): single pass, partial
    * aggregation map-side, exact decimal money math. The pure scan-agg benchmark.
    */
  private def qPricingSummary(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.spread(Tables.lineitem(s, dir), "l_orderkey")
    val qty = col("l_quantity").cast(DecimalType(18, 2))
    val price = col("l_extendedprice").cast(DecimalType(18, 2))
    val disc = col("l_discount").cast(DecimalType(18, 2))
    li.filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(qty).cast("double").as("sum_qty"),
        sum(price).cast("double").as("sum_base_price"),
        sum(price * (lit(1).cast(DecimalType(18, 2)) - disc)).cast("double")
          .as("sum_disc_price"),
        (sum(qty).cast("double") / count(lit(1))).as("avg_qty"),
        (sum(price).cast("double") / count(lit(1))).as("avg_price"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  /** Three-way join top-k (TPC-H Q3 flavor): lineitem ⋈ orders shuffle join, then
    * broadcast customer; revenue per customer, top 20 deterministic.
    */
  private def qTopCustomers(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.spread(Tables.lineitem(s, dir), "l_orderkey")
    val o = Tables.orders(s, dir)
    val c = Tables.customer(s, dir)
    val price = col("l_extendedprice").cast(DecimalType(18, 2))
    val disc = col("l_discount").cast(DecimalType(18, 2))
    val revenue = li
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_custkey"))
      .agg(sum(price * (lit(1).cast(DecimalType(18, 2)) - disc)).cast("double")
        .as("revenue"))
    revenue
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .select(col("o_custkey").as("custkey"), col("c_name").as("name"),
        col("c_mktsegment").as("mktsegment"), col("revenue"))
      .orderBy(col("revenue").desc, col("custkey"))
      .limit(20)
  }

  /** Near-duplicate clusters: connected components over the Jaccard≥0.5 pair graph
    * (iterative min-label propagation; oracle = recursive-CTE reachability closure).
    */
  private def qDedupClusters(s: SparkSession, dir: String): DataFrame =
    graft.ops.ConnectedComponents.nearDuplicateClusters(docs(s, dir), threshold = 0.5)
      .orderBy("node")

  /** Consistent per-group sampling: the 3 documents per language with the smallest
    * content hash — identical selection under any partitioning/rerun (custom
    * TypedImperativeAggregate; oracle = the equivalent window formulation).
    */
  private def qDeterministicSample(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .groupBy(col("lang"))
      .agg(graft.functions.BottomKByKey.bottom_k_by_key(
        md5(col("text")), col("text"), 3).as("sample"))
      .select(col("lang"), explode(col("sample")).as("text"))
      .withColumn("fingerprint", md5(col("text")))
      .select("lang", "fingerprint")
      .orderBy("lang", "fingerprint")

  /** S8/K6: file-level metadata scan over the harness tables. Oracle-gated via DuckDB
    * `read_blob` over the same directory (filename + on-disk size per file); the oracle
    * SQL recovers the sfdir from the gate's own view definitions, so it tracks whatever
    * scale factor the gate mounts.
    */
  private def qCatalogStats(s: SparkSession, dir: String): DataFrame = {
    val locations = Tables.all.map(n => n -> s"$dir/$n.parquet").toMap
    graft.catalog.MetadataScanner.scanToDf(s, locations)
      .select("table_name", "n_files", "total_bytes")
      .orderBy("table_name")
  }

  /** Runs the full DQ validator suite (Q1-Q4) over reference-shaped orders/customers and
    * returns the detail rows — each row one check outcome (SURVEY.md §2.10).
    */
  private def qDqReport(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val o = refOrders(s, dir)
    val c = refCustomers(s, dir)
    // checkAll fuses each table's completeness+accuracy+volume into ONE aggregate job
    // (2 scans + the consistency join, vs 6 jobs as separate calls); the emitted rows
    // are identical to the chained formulation and the output is re-sorted anyway
    val v = new graft.dq.DqValidator()
      .checkAll(o, "orders",
        completenessColumns = Seq("order_id", "order_date", "order_amount", "customer_id"),
        accuracyRules = Seq(
          "amount_positive" -> (col("order_amount") > 0),
          "date_not_future" -> (col("order_date") <= lit("2026-01-01").cast("timestamp"))),
        volumeBounds = Some((1L, 1000000000000L)))
      .checkAll(c, "customers",
        completenessColumns =
          Seq("customer_id", "name", "email", "region", "customer_tenure_days"),
        accuracyRules = Seq(
          "tenure_1_100" -> col("customer_tenure_days").between(1, 100)))
      .checkConsistency(o, "orders", c, "customers", Seq("customer_id"))
    v.results.toDS().toDF()
      .orderBy("table_name", "check_type", "target")
  }

  /** K7 time-travel gate: write documents(<100) as version 0, overwrite with the full
    * table as version 1, then read AS OF version 0 — a correct versioned reader must
    * recover the pre-overwrite rows, which the oracle states directly. The scratch
    * table is rebuilt from nothing each run (idempotent under driver re-execution).
    */
  private def qTimeTravel(s: SparkSession, dir: String): DataFrame = {
    // suffixed with the application id so concurrent drivers on one host can't
    // race on the same scratch table
    val loc =
      s"${System.getProperty("java.io.tmpdir")}/graft_time_travel_${s.sparkContext.applicationId}"
    val p = new org.apache.hadoop.fs.Path(loc)
    val fs = p.getFileSystem(s.sessionState.newHadoopConf())
    if (fs.exists(p)) fs.delete(p, true)
    val v0 = graft.catalog.VersionedTable.write(
      docs(s, dir).filter(col("doc_id") < 100).select("doc_id", "lang"),
      loc, "overwrite")
    graft.catalog.VersionedTable.write(
      docs(s, dir).select("doc_id", "lang"), loc, "overwrite")
    graft.catalog.MetadataScanner.readTableAsOf(s, loc, v0).orderBy("doc_id")
  }

  /** Compaction gate: three append commits, an OPTIMIZE-style compact, one more
    * append — the read after compaction must still be exactly the union of every
    * append, served from the compacted commit + the post-compact delta. The oracle
    * states the expected content directly; a compact that dropped or duplicated
    * rows would hash-mismatch.
    */
  private def qCompaction(s: SparkSession, dir: String): DataFrame = {
    val vt = graft.catalog.VersionedTable
    val loc =
      s"${System.getProperty("java.io.tmpdir")}/graft_compaction_${s.sparkContext.applicationId}"
    val p = new org.apache.hadoop.fs.Path(loc)
    val fs = p.getFileSystem(s.sessionState.newHadoopConf())
    if (fs.exists(p)) fs.delete(p, true)
    val d = docs(s, dir).select("doc_id", "lang")
    vt.write(d.filter(col("doc_id") < 50), loc, "overwrite")
    vt.write(d.filter(col("doc_id") >= 50 && col("doc_id") < 100), loc, "append")
    vt.compact(s, loc, numFiles = 2)
    vt.write(d.filter(col("doc_id") >= 100 && col("doc_id") < 150), loc, "append")
    vt.read(s, loc).orderBy("doc_id")
  }

  /** MERGE gate: base = documents(<400); changes = upserts for [200,600) with a
    * rewritten lang plus delete markers for [0,50). The merged table must show
    * untouched [50,200), the rewritten lang across [200,600) (updates AND
    * inserts through the same path), and no trace of the deleted keys — the
    * oracle states that final state directly, so a merge that dropped inserts,
    * kept deletes, or double-applied updates would hash-mismatch.
    */
  private def qMergeUpsert(s: SparkSession, dir: String): DataFrame = {
    val vt = graft.catalog.VersionedTable
    val loc =
      s"${System.getProperty("java.io.tmpdir")}/graft_merge_${s.sparkContext.applicationId}"
    val p = new org.apache.hadoop.fs.Path(loc)
    val fs = p.getFileSystem(s.sessionState.newHadoopConf())
    if (fs.exists(p)) fs.delete(p, true)
    val d = docs(s, dir).select("doc_id", "lang", "source")
    vt.write(d.filter(col("doc_id") < 400), loc, "overwrite")
    val changes = d.filter(col("doc_id") >= 200 && col("doc_id") < 600)
      .withColumn("lang", concat(col("lang"), lit("+u")))
      .withColumn("is_delete", lit(false))
      .unionByName(
        d.filter(col("doc_id") < 50).withColumn("is_delete", lit(true)))
    vt.merge(s, loc, changes, Seq("doc_id"), deleteCol = Some("is_delete"))
    vt.read(s, loc).orderBy("doc_id")
  }

  /** Merge-on-read MERGE gate: the exact q_merge_upsert scenario driven through
    * mergeOnRead — matched rows deletion-vectored, change rows landing as the
    * commit's own files, zero pre-existing files rewritten. The oracle states
    * the same final state, so DV-based matching that dropped an insert, kept a
    * deleted key, or double-served an updated row would hash-mismatch.
    */
  private def qMergeOnRead(s: SparkSession, dir: String): DataFrame = {
    val vt = graft.catalog.VersionedTable
    val loc =
      s"${System.getProperty("java.io.tmpdir")}/graft_mor_${s.sparkContext.applicationId}"
    val p = new org.apache.hadoop.fs.Path(loc)
    val fs = p.getFileSystem(s.sessionState.newHadoopConf())
    if (fs.exists(p)) fs.delete(p, true)
    val d = docs(s, dir).select("doc_id", "lang", "source")
    vt.write(d.filter(col("doc_id") < 400), loc, "overwrite")
    val changes = d.filter(col("doc_id") >= 200 && col("doc_id") < 600)
      .withColumn("lang", concat(col("lang"), lit("+u")))
      .withColumn("is_delete", lit(false))
      .unionByName(
        d.filter(col("doc_id") < 50).withColumn("is_delete", lit(true)))
    vt.mergeOnRead(s, loc, changes, Seq("doc_id"), deleteCol = Some("is_delete"))
    vt.read(s, loc).orderBy("doc_id")
  }

  /** Change-Data-Feed gate: base = documents(<400); ONE merge (changeFeed = true)
    * rewrites lang for [200,600) and deletes every fifth doc among them. The feed of
    * that single commit must show exactly the row-level deltas — pre/post images
    * where the upsert hit, inserts where it missed, deletes (old values) only for
    * keys that existed, and NOTHING for deletes of missing keys — which the oracle
    * states directly from the documents table. A feed that diffed snapshots
    * wholesale, dropped pre-images, or emitted no-op deletes would hash-mismatch.
    */
  private def qChangeFeed(s: SparkSession, dir: String): DataFrame = {
    val vt = graft.catalog.VersionedTable
    val loc =
      s"${System.getProperty("java.io.tmpdir")}/graft_change_feed_${s.sparkContext.applicationId}"
    val p = new org.apache.hadoop.fs.Path(loc)
    val fs = p.getFileSystem(s.sessionState.newHadoopConf())
    if (fs.exists(p)) fs.delete(p, true)
    val d = docs(s, dir).select("doc_id", "lang")
    vt.write(d.filter(col("doc_id") < 400), loc, "overwrite")
    val changes = d.filter(col("doc_id") >= 200 && col("doc_id") < 600)
      .withColumn("lang", concat(col("lang"), lit("+u")))
      .withColumn("is_delete", col("doc_id") % 5 === 0)
    val mv = vt.merge(s, loc, changes, Seq("doc_id"),
      deleteCol = Some("is_delete"), changeFeed = true)
    vt.readChanges(s, loc, mv, mv)
      .select(col("doc_id"), col("lang"),
        col("_change_type").as("change_type"),
        col("_commit_version").as("commit_version"))
      .orderBy("doc_id", "change_type")
  }

  /** Incremental-view-maintenance gate: a scratch versioned table goes through an
    * overwrite base, a CDF merge (updates + deletes + inserts + delete no-ops),
    * and a plain append; the view bootstrapped from version 0 and maintained
    * PURELY from the change feed must equal the aggregate the oracle states
    * directly from the final row set — a maintenance that double-applied a
    * replay, missed delete retractions, or mis-signed pre-images would
    * hash-mismatch.
    */
  private def qIncrementalView(s: SparkSession, dir: String): DataFrame = {
    val vt = graft.catalog.VersionedTable
    val loc =
      s"${System.getProperty("java.io.tmpdir")}/graft_ivm_${s.sparkContext.applicationId}"
    val p = new org.apache.hadoop.fs.Path(loc)
    val fs = p.getFileSystem(s.sessionState.newHadoopConf())
    if (fs.exists(p)) fs.delete(p, true)
    val d = docs(s, dir).select("doc_id", "lang", "n_chars")
    vt.write(d.filter(col("doc_id") < 300), loc, "overwrite")            // v0
    val view0 = graft.ops.IncrementalAgg.recompute(
      vt.readAsOf(s, loc, 0), Seq("lang"), Seq("n_chars"))
    // updates [100,300) %3!=0, deletes [100,300) %3=0, inserts [300,400) %3!=0,
    // delete no-ops [300,400) %3=0 (missing keys must emit nothing)
    val changes = d.filter(col("doc_id") >= 100 && col("doc_id") < 400)
      .withColumn("n_chars", col("n_chars") + 1)
      .withColumn("is_delete", col("doc_id") % 3 === 0)
    vt.merge(s, loc, changes, Seq("doc_id"),
      deleteCol = Some("is_delete"), changeFeed = true)                  // v1
    vt.write(d.filter(col("doc_id") >= 400 && col("doc_id") < 500),
      loc, "append")                                                     // v2
    graft.ops.IncrementalAgg.applyFeed(
        view0, vt.readChanges(s, loc, 1, 2), Seq("lang"), Seq("n_chars"))
      .orderBy("lang")
  }

  /** RESTORE gate: base (docs < 200) + append [200,300), then a destructive
    * overwrite (docs < 50), then restore to the pre-mistake version and one more
    * append [300,350). The read must be exactly base+appends — the oracle states
    * it directly — and a restore that resurrected the overwrite, lost the
    * appended commit, or restored the wrong version would hash-mismatch.
    */
  private def qRestore(s: SparkSession, dir: String): DataFrame = {
    val vt = graft.catalog.VersionedTable
    val loc =
      s"${System.getProperty("java.io.tmpdir")}/graft_restore_${s.sparkContext.applicationId}"
    val p = new org.apache.hadoop.fs.Path(loc)
    val fs = p.getFileSystem(s.sessionState.newHadoopConf())
    if (fs.exists(p)) fs.delete(p, true)
    val d = docs(s, dir).select("doc_id", "lang")
    vt.write(d.filter(col("doc_id") < 200), loc, "overwrite")             // v0
    val good = vt.write(
      d.filter(col("doc_id") >= 200 && col("doc_id") < 300), loc, "append") // v1
    vt.write(d.filter(col("doc_id") < 50), loc, "overwrite")              // v2: mistake
    vt.restore(s, loc, good)                                              // v3
    vt.write(d.filter(col("doc_id") >= 300 && col("doc_id") < 350), loc, "append") // v4
    vt.read(s, loc).orderBy("doc_id")
  }

  /** Deletion-vector DELETE gate: base = documents(<600); two merge-on-read
    * deletes (every 7th doc, then German docs among the survivors) that rewrite
    * NO data files — the read must apply both deletion vectors, and the oracle
    * states the surviving rows directly, so a DV that leaked a deleted row,
    * dropped a live one, or mis-composed across commits would hash-mismatch.
    */
  private def qDeleteWhere(s: SparkSession, dir: String): DataFrame = {
    val vt = graft.catalog.VersionedTable
    val loc =
      s"${System.getProperty("java.io.tmpdir")}/graft_delete_${s.sparkContext.applicationId}"
    val p = new org.apache.hadoop.fs.Path(loc)
    val fs = p.getFileSystem(s.sessionState.newHadoopConf())
    if (fs.exists(p)) fs.delete(p, true)
    val d = docs(s, dir).select("doc_id", "lang", "source")
    vt.write(d.filter(col("doc_id") < 600), loc, "overwrite")   // v0
    vt.deleteWhere(s, loc, "doc_id % 7 = 0")                    // v1 (DV)
    vt.deleteWhere(s, loc, "lang = 'de'")                       // v2 (DV)
    vt.read(s, loc).orderBy("doc_id")
  }

  /** Deletion-vector UPDATE gate: base = documents(<600); one merge-on-read
    * update rewrites n_chars (+1000) for English docs only — matched rows are
    * DV'd out and re-land as the commit's own files, everything else is served
    * untouched from the original files. The oracle states the post-update state
    * with a CASE, so an update that missed rows, double-applied, or leaked the
    * pre-image would hash-mismatch.
    */
  private def qUpdateWhere(s: SparkSession, dir: String): DataFrame = {
    val vt = graft.catalog.VersionedTable
    val loc =
      s"${System.getProperty("java.io.tmpdir")}/graft_update_${s.sparkContext.applicationId}"
    val p = new org.apache.hadoop.fs.Path(loc)
    val fs = p.getFileSystem(s.sessionState.newHadoopConf())
    if (fs.exists(p)) fs.delete(p, true)
    val d = docs(s, dir).select("doc_id", "lang", "n_chars")
    vt.write(d.filter(col("doc_id") < 600), loc, "overwrite")   // v0
    vt.updateWhere(s, loc, "lang = 'en'",
      Map("n_chars" -> "n_chars + 1000"))                        // v1 (DV + new rows)
    vt.read(s, loc).orderBy("doc_id")
  }

  /** DV change-feed reconstruction gate: a delete committed WITHOUT a
    * materialized feed must still serve exact row-level deletes through
    * readChanges — reconstructed on demand from the deletion vector and the
    * pre-delete snapshot. The oracle states the deleted rows directly.
    */
  private def qDeleteCdf(s: SparkSession, dir: String): DataFrame = {
    val vt = graft.catalog.VersionedTable
    val loc =
      s"${System.getProperty("java.io.tmpdir")}/graft_delete_cdf_${s.sparkContext.applicationId}"
    val p = new org.apache.hadoop.fs.Path(loc)
    val fs = p.getFileSystem(s.sessionState.newHadoopConf())
    if (fs.exists(p)) fs.delete(p, true)
    val d = docs(s, dir).select("doc_id", "lang")
    vt.write(d.filter(col("doc_id") < 400), loc, "overwrite")   // v0
    vt.deleteWhere(s, loc, "doc_id % 9 = 4")                    // v1, no feed
    vt.readChanges(s, loc, 1, 1)
      .select(col("doc_id"), col("lang"),
        col("_change_type").as("change_type"),
        col("_commit_version").as("commit_version"))
      .orderBy("doc_id")
  }

  /** DP count-release gate: per-(lang, source) counts with seeded Laplace noise
    * (ε = 1). The noise is a keyed-hash inverse-CDF draw, so the oracle replays
    * the identical md5 → uniform → Laplace arithmetic — an implementation that
    * drew real randomness, mis-scaled the noise, or broke determinism would
    * hash-mismatch.
    */
  private def qDpCounts(s: SparkSession, dir: String): DataFrame =
    graft.ops.Privacy.dpCounts(docs(s, dir), Seq("lang", "source"),
      epsilon = 1.0, seed = "r7")
      .orderBy("lang", "source")

  /** Score-calibration gate: each doc's n_chars mapped to its within-SOURCE
    * percent_rank quantile — the normalization that makes per-source quality
    * scores comparable before a global floor. Exact path; ties share a rank,
    * so the value is engine-replayable (the oracle is the same window).
    */
  private def qScoreCalibration(s: SparkSession, dir: String): DataFrame =
    graft.ops.CorpusCuration.calibrateScores(
      docs(s, dir).select("doc_id", "source", "n_chars"), "source", "n_chars")
      .orderBy("doc_id")

  /** Schema-time-travel gate: DDL history is versioned — a column added after
    * v0 and renamed after v2 must show each snapshot under the schema in force
    * AT that version (v0 without the column, v1 with its pre-rename name, head
    * renamed), not today's. The result pins each state's exact column list as
    * a literal string plus row/valued counts, so an engine that applied
    * current DDL to history (the pre-versioning behavior) or lost the added
    * column's data through the rename would hash-mismatch.
    */
  private def qSchemaTimeTravel(s: SparkSession, dir: String): DataFrame = {
    val vt = graft.catalog.VersionedTable
    val loc =
      s"${System.getProperty("java.io.tmpdir")}/graft_ddlver_${s.sparkContext.applicationId}"
    val p = new org.apache.hadoop.fs.Path(loc)
    val fs = p.getFileSystem(s.sessionState.newHadoopConf())
    if (fs.exists(p)) fs.delete(p, true)
    val d = docs(s, dir).select("doc_id", "lang")
    vt.write(d.filter(col("doc_id") < 200), loc, "overwrite")             // v0
    vt.write(d.filter(col("doc_id") >= 200 && col("doc_id") < 250), loc,
      "append")                                                           // v1
    vt.addColumn(s, loc, "note", "STRING")             // bound at head 1
    vt.write(d.filter(col("doc_id") >= 250 && col("doc_id") < 300)
      .withColumn("note", col("lang")), loc, "append")                    // v2
    vt.renameColumn(s, loc, "note", "comment")         // bound at head 2
    def state(name: String, df: DataFrame, valued: Option[String]): DataFrame =
      df.agg(count(lit(1)).as("n_rows"),
        valued.map(c => count(col(c))).getOrElse(lit(0L)).cast("long")
          .as("n_valued"))
        .select(lit(name).as("state"),
          lit(df.columns.mkString("|")).as("table_schema"),
          col("n_rows"), col("n_valued"))
    state("v0", vt.readAsOf(s, loc, 0), None)
      .unionByName(state("v1", vt.readAsOf(s, loc, 1), Some("note")))
      .unionByName(state("head", vt.read(s, loc), Some("comment")))
      .orderBy("state")
  }

  /** Keyword-tagging gate: one Aho–Corasick pass counts every end-position
    * match of a keyword set per document. The set is chosen adversarially for
    * the semantics: "a" (overlaps everywhere), "win" nested inside "window"
    * (both must count at their own end positions). The oracle replays the
    * counts POSITIONALLY (substr at every offset), so an automaton that missed
    * overlapping or nested matches, or a non-automaton shortcut with
    * non-overlap semantics, would hash-mismatch.
    */
  private def qKeywordTags(s: SparkSession, dir: String): DataFrame =
    graft.ops.KeywordTag.tagKeywords(docs(s, dir),
      Seq("a", "data", "merge", "win", "window")).orderBy("doc_id")

  /** DP sum-release gate: per-(lang, source) sums of n_chars CLIPPED to
    * [0, 500] plus Laplace(500/ε) keyed-hash noise. The oracle replays the
    * clip, the exact DECIMAL summation (order-independent — a double sum
    * would drift by partition order), and the tagged md5 → uniform → Laplace
    * arithmetic; a release that skipped the clip, mis-scaled to the wrong
    * sensitivity, or shared noise with the count release would hash-mismatch.
    */
  private def qDpSums(s: SparkSession, dir: String): DataFrame =
    graft.ops.Privacy.dpSums(docs(s, dir), Seq("lang", "source"), "n_chars",
      lo = 0.0, hi = 500.0, epsilon = 1.0, seed = "r8")
      .orderBy("lang", "source")

  /** DP mean-release gate: the split-budget quotient — sum at ε/2, count at
    * ε/2, dp_mean = dp_sum / max(dp_count, 1). The oracle replays BOTH halves
    * (the sum draw tagged, the count draw untagged) and the guarded division.
    */
  private def qDpMeans(s: SparkSession, dir: String): DataFrame =
    graft.ops.Privacy.dpMeans(docs(s, dir), Seq("lang", "source"), "n_chars",
      lo = 0.0, hi = 500.0, epsilon = 1.0, seed = "r8m")
      .orderBy("lang", "source")

  /** Length-bucketed batching gate: docs bucket to the next power of two of
    * their whitespace token count (clamped [16, 1024]), batches of 8 form
    * inside each bucket in doc order, padding = cap − tokens. The bucket edge
    * is PURE INTEGER (2^bitlength) so both engines agree exactly at powers of
    * two — the place a float log2 would diverge.
    */
  private def qLengthBuckets(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir).select(col("doc_id"),
      size(split(trim(col("text")), "\\s+")).cast("long").as("n_tokens"))
    graft.ops.Packing.lengthBuckets(d, batchSize = 8, minCap = 16, maxCap = 1024)
      .select("doc_id", "n_tokens", "bucket_cap", "batch_id", "padding")
      .orderBy("doc_id")
  }

  /** Sharded length-bucketed batching gate: same contract as
    * [[qLengthBuckets]] but with the 100 TB parallelism knob engaged
    * (`numShards = 4`) — each bucket's window splits into four independent
    * md5-keyed shards, so the oracle must replay the shard assignment AND the
    * per-(bucket, shard) batch numbering byte-for-byte. A salt that leaked
    * rows across shards, renumbered batches globally, or used a
    * non-replayable hash would hash-mismatch.
    */
  private def qLengthBucketsSharded(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir).select(col("doc_id"),
      size(split(trim(col("text")), "\\s+")).cast("long").as("n_tokens"))
    graft.ops.Packing.lengthBuckets(d, batchSize = 8, minCap = 16, maxCap = 1024,
      numShards = 4)
      .select("doc_id", "n_tokens", "bucket_cap", "batch_id", "padding")
      .orderBy("doc_id")
  }

  /** Generated-columns gate: `len_class` declared GENERATED ALWAYS AS a CASE
    * over n_chars BEFORE the first write; the writer never materializes it —
    * the staged write computes it, an appended batch goes through the same
    * path, and the read shows it everywhere. The oracle states the expression
    * directly, so a generation that skipped a batch or computed at read time
    * from a stale rule would hash-mismatch.
    */
  private def qGeneratedColumns(s: SparkSession, dir: String): DataFrame = {
    val vt = graft.catalog.VersionedTable
    val loc =
      s"${System.getProperty("java.io.tmpdir")}/graft_gencol_${s.sparkContext.applicationId}"
    val p = new org.apache.hadoop.fs.Path(loc)
    val fs = p.getFileSystem(s.sessionState.newHadoopConf())
    if (fs.exists(p)) fs.delete(p, true)
    val d = docs(s, dir).select("doc_id", "lang", "n_chars")
    vt.addGeneratedColumn(s, loc, "len_class",
      "CASE WHEN n_chars < 500 THEN 'short' ELSE 'long' END")
    vt.write(d.filter(col("doc_id") < 300), loc, "overwrite")
    vt.write(d.filter(col("doc_id") >= 300 && col("doc_id") < 500), loc, "append")
    vt.read(s, loc).orderBy("doc_id")
  }

  /** Column-mapping gate: base commit written under `lang`, the column renamed
    * to `language` (metadata-only), a second commit written under the NEW name,
    * and `n_chars` dropped — the read must serve one logical schema across
    * both file generations with the dropped column gone. The oracle states
    * that schema directly; files rewritten, columns leaked, or a generation
    * served under the wrong name would hash-mismatch.
    */
  /** DSv2 catalog gate: the versioned table's PURE-SQL lifecycle — CTAS, INSERT
    * INTO (append commit), DELETE FROM (a deletion-vector commit, no rewrite), and
    * native `VERSION AS OF` time travel — all through `spark.sql` against a
    * [[graft.sources.table.GraftCatalog]] warehouse, zero Scala table calls. The
    * result carries the table head AND the pre-delete snapshot, so the oracle
    * pins both the DV subtraction and SQL time travel in one hash.
    */
  private def qSqlCatalog(s: SparkSession, dir: String): DataFrame = {
    val wh =
      s"${System.getProperty("java.io.tmpdir")}/graft_sqlcat_${s.sparkContext.applicationId}"
    // the catalog instance (and its warehouse conf) is minted once per JVM on
    // first reference; the applicationId suffix keeps concurrent drivers apart
    s.conf.set("spark.sql.catalog.gsqlc", classOf[graft.sources.table.GraftCatalog].getName)
    s.conf.set("spark.sql.catalog.gsqlc.warehouse", wh)
    s.sql("CREATE NAMESPACE IF NOT EXISTS gsqlc.contract")
    s.sql("DROP TABLE IF EXISTS gsqlc.contract.docs")
    docs(s, dir).select("doc_id", "lang", "source").createOrReplaceTempView("sqlcat_docs")
    // staged CTAS = ONE data commit v0; the INSERT is v1, the CALLed OPTIMIZE
    // a content-preserving v2, the DELETE a DV-only v3
    s.sql("CREATE TABLE gsqlc.contract.docs AS SELECT * FROM sqlcat_docs WHERE doc_id < 300")
    s.sql("INSERT INTO gsqlc.contract.docs SELECT * FROM sqlcat_docs " +
      "WHERE doc_id >= 300 AND doc_id < 500")
    s.sql("CALL gsqlc.system.compact(table => 'contract.docs', num_files => 2)")
    s.sql("DELETE FROM gsqlc.contract.docs WHERE lang = 'en'")
    s.sql("""SELECT 'head' AS state, doc_id, lang, source FROM gsqlc.contract.docs
            |UNION ALL
            |SELECT 'pre_delete' AS state, doc_id, lang, source
            |FROM gsqlc.contract.docs VERSION AS OF 2""".stripMargin)
      .orderBy("state", "doc_id")
  }

  /** Native SQL UPDATE gate: `UPDATE ... SET ... WHERE` as plain SQL against the
    * DSv2 catalog — no CALL procedure. The extension rule routes the resolved
    * UpdateTable into the deletion-vector merge-on-read commit
    * ([[graft.sources.table.GraftRowLevelSqlRule]]); the oracle states the final
    * table with a CASE, so an update that missed rows, hit extra rows, or
    * mangled an expression would hash-mismatch.
    */
  private def qSqlUpdate(s: SparkSession, dir: String): DataFrame = {
    val wh =
      s"${System.getProperty("java.io.tmpdir")}/graft_sqlcat_${s.sparkContext.applicationId}"
    s.conf.set("spark.sql.catalog.gsqlc", classOf[graft.sources.table.GraftCatalog].getName)
    s.conf.set("spark.sql.catalog.gsqlc.warehouse", wh)
    s.sql("CREATE NAMESPACE IF NOT EXISTS gsqlc.contract")
    s.sql("DROP TABLE IF EXISTS gsqlc.contract.upd")
    docs(s, dir).select("doc_id", "lang", "source", "n_chars")
      .createOrReplaceTempView("sqlupd_docs")
    s.sql("CREATE TABLE gsqlc.contract.upd AS " +
      "SELECT * FROM sqlupd_docs WHERE doc_id < 500")
    s.sql("UPDATE gsqlc.contract.upd " +
      "SET source = concat(source, '+u'), n_chars = n_chars + 10 " +
      "WHERE lang = 'en' AND doc_id < 300")
    s.sql("SELECT doc_id, lang, source, n_chars FROM gsqlc.contract.upd")
      .orderBy("doc_id")
  }

  /** Native SQL MERGE INTO gate: the full CDC-apply shape as plain SQL —
    * conditional DELETE on the change marker, `UPDATE SET *` for matched
    * upserts, guarded `INSERT *` for unmatched — one merge-on-read commit.
    * The oracle states the final table directly; a merge that inserted
    * delete-marked rows, deleted the wrong matches, or dropped the unmatched
    * inserts would hash-mismatch.
    */
  private def qSqlMerge(s: SparkSession, dir: String): DataFrame = {
    val wh =
      s"${System.getProperty("java.io.tmpdir")}/graft_sqlcat_${s.sparkContext.applicationId}"
    s.conf.set("spark.sql.catalog.gsqlc", classOf[graft.sources.table.GraftCatalog].getName)
    s.conf.set("spark.sql.catalog.gsqlc.warehouse", wh)
    s.sql("CREATE NAMESPACE IF NOT EXISTS gsqlc.contract")
    s.sql("DROP TABLE IF EXISTS gsqlc.contract.mrg")
    docs(s, dir).select("doc_id", "lang", "source")
      .createOrReplaceTempView("sqlmrg_docs")
    s.sql("CREATE TABLE gsqlc.contract.mrg AS " +
      "SELECT * FROM sqlmrg_docs WHERE doc_id < 400")
    s.sql("""CREATE OR REPLACE TEMPORARY VIEW sqlmrg_src AS
            |SELECT doc_id, concat(lang, '+u') AS lang, source,
            |  doc_id % 5 = 0 AS kill
            |FROM sqlmrg_docs WHERE doc_id >= 200 AND doc_id < 600""".stripMargin)
    s.sql("""MERGE INTO gsqlc.contract.mrg t USING sqlmrg_src s
            |ON t.doc_id = s.doc_id
            |WHEN MATCHED AND s.kill THEN DELETE
            |WHEN MATCHED THEN UPDATE SET *
            |WHEN NOT MATCHED AND NOT (s.kill) THEN INSERT *""".stripMargin)
    s.sql("SELECT doc_id, lang, source FROM gsqlc.contract.mrg").orderBy("doc_id")
  }

  /** Partial-row SQL MERGE gate: `UPDATE SET <some columns>` — the most common
    * MERGE shape a SQL user writes — with a matched CONDITION and a SET value
    * referencing the TARGET row (`concat(t.lang, ...)`). The general path joins
    * source to target, coalesces unset columns (`source` here) from the target
    * image, and commits through the same merge-on-read path
    * ([[graft.sources.table.GraftGeneralMergeCommand]]). The oracle states the
    * final table with CASEs; a merge that nulled the unset column, ignored the
    * condition, or missed the target reference would hash-mismatch.
    */
  private def qSqlMergePartial(s: SparkSession, dir: String): DataFrame = {
    val wh =
      s"${System.getProperty("java.io.tmpdir")}/graft_sqlcat_${s.sparkContext.applicationId}"
    s.conf.set("spark.sql.catalog.gsqlc", classOf[graft.sources.table.GraftCatalog].getName)
    s.conf.set("spark.sql.catalog.gsqlc.warehouse", wh)
    s.sql("CREATE NAMESPACE IF NOT EXISTS gsqlc.contract")
    s.sql("DROP TABLE IF EXISTS gsqlc.contract.mrgp")
    docs(s, dir).select("doc_id", "lang", "source", "n_chars")
      .createOrReplaceTempView("sqlmrgp_docs")
    s.sql("CREATE TABLE gsqlc.contract.mrgp AS " +
      "SELECT * FROM sqlmrgp_docs WHERE doc_id < 400")
    s.sql("""CREATE OR REPLACE TEMPORARY VIEW sqlmrgp_src AS
            |SELECT doc_id, lang, source, n_chars
            |FROM sqlmrgp_docs WHERE doc_id >= 200 AND doc_id < 600""".stripMargin)
    s.sql("""MERGE INTO gsqlc.contract.mrgp t USING sqlmrgp_src s
            |ON t.doc_id = s.doc_id
            |WHEN MATCHED AND t.doc_id % 7 != 0 THEN
            |  UPDATE SET t.lang = concat(t.lang, '+p'), t.n_chars = s.n_chars + 5
            |WHEN NOT MATCHED THEN
            |  INSERT (doc_id, lang, source, n_chars)
            |  VALUES (s.doc_id, s.lang, s.source, s.n_chars)""".stripMargin)
    s.sql("SELECT doc_id, lang, source, n_chars FROM gsqlc.contract.mrgp")
      .orderBy("doc_id")
  }

  /** Full-sync SQL MERGE gate: `WHEN NOT MATCHED BY SOURCE` — the CDC mirroring
    * shape (make the target exactly reflect the source, flagging or dropping
    * stale rows). Ordered NMBS actions: stale ids below 50 DELETE, the rest
    * UPDATE to a sentinel lang — first-match-wins, folded into disjoint
    * effective conditions at rule time. The oracle states the final mirror
    * directly.
    */
  private def qSqlMergeFullSync(s: SparkSession, dir: String): DataFrame = {
    val wh =
      s"${System.getProperty("java.io.tmpdir")}/graft_sqlcat_${s.sparkContext.applicationId}"
    s.conf.set("spark.sql.catalog.gsqlc", classOf[graft.sources.table.GraftCatalog].getName)
    s.conf.set("spark.sql.catalog.gsqlc.warehouse", wh)
    s.sql("CREATE NAMESPACE IF NOT EXISTS gsqlc.contract")
    s.sql("DROP TABLE IF EXISTS gsqlc.contract.mrgf")
    docs(s, dir).select("doc_id", "lang", "source")
      .createOrReplaceTempView("sqlmrgf_docs")
    s.sql("CREATE TABLE gsqlc.contract.mrgf AS " +
      "SELECT * FROM sqlmrgf_docs WHERE doc_id < 400")
    s.sql("""CREATE OR REPLACE TEMPORARY VIEW sqlmrgf_src AS
            |SELECT doc_id, concat(lang, '+f') AS lang, source
            |FROM sqlmrgf_docs WHERE doc_id >= 100 AND doc_id < 500""".stripMargin)
    s.sql("""MERGE INTO gsqlc.contract.mrgf t USING sqlmrgf_src s
            |ON t.doc_id = s.doc_id
            |WHEN MATCHED THEN UPDATE SET *
            |WHEN NOT MATCHED THEN INSERT *
            |WHEN NOT MATCHED BY SOURCE AND t.doc_id < 50 THEN DELETE
            |WHEN NOT MATCHED BY SOURCE THEN UPDATE SET t.lang = 'stale'""".stripMargin)
    s.sql("SELECT doc_id, lang, source FROM gsqlc.contract.mrgf").orderBy("doc_id")
  }

  /** MERGE WITH SCHEMA EVOLUTION gate: the source carries a column the target
    * lacks (`n_chars`); the analyzer ADD-COLUMNs it through the catalog
    * (metadata-only, archived for schema time travel) and the merge lands
    * values for matched/inserted rows while pre-merge rows read typed NULL.
    * The oracle states all three slices — a merge that dropped the new
    * column, filled the old rows with junk, or missed the evolution would
    * hash-mismatch.
    */
  private def qSqlMergeEvolution(s: SparkSession, dir: String): DataFrame = {
    val wh =
      s"${System.getProperty("java.io.tmpdir")}/graft_sqlcat_${s.sparkContext.applicationId}"
    s.conf.set("spark.sql.catalog.gsqlc", classOf[graft.sources.table.GraftCatalog].getName)
    s.conf.set("spark.sql.catalog.gsqlc.warehouse", wh)
    s.sql("CREATE NAMESPACE IF NOT EXISTS gsqlc.contract")
    s.sql("DROP TABLE IF EXISTS gsqlc.contract.mrge")
    docs(s, dir).select("doc_id", "lang", "source", "n_chars")
      .createOrReplaceTempView("sqlmrge_docs")
    s.sql("CREATE TABLE gsqlc.contract.mrge AS " +
      "SELECT doc_id, lang FROM sqlmrge_docs WHERE doc_id < 400")
    s.sql("""CREATE OR REPLACE TEMPORARY VIEW sqlmrge_src AS
            |SELECT doc_id, concat(lang, '+e') AS lang, n_chars
            |FROM sqlmrge_docs WHERE doc_id >= 200 AND doc_id < 600""".stripMargin)
    s.sql("""MERGE WITH SCHEMA EVOLUTION INTO gsqlc.contract.mrge t
            |USING sqlmrge_src s ON t.doc_id = s.doc_id
            |WHEN MATCHED THEN UPDATE SET *
            |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    s.sql("SELECT doc_id, lang, n_chars FROM gsqlc.contract.mrge")
      .orderBy("doc_id")
  }

  /** Staged-replace gate: `CREATE OR REPLACE TABLE ... AS SELECT` resets the
    * definition IN PLACE (new schema, one overwrite commit) while the commit
    * log survives — the result carries the post-replace head AND a
    * `VERSION AS OF` read of the pre-replace content, so the oracle pins both
    * the swap and the preserved history in one hash. A drop+create
    * implementation (history lost) or a leaked old column would mismatch.
    */
  private def qSqlReplace(s: SparkSession, dir: String): DataFrame = {
    val wh =
      s"${System.getProperty("java.io.tmpdir")}/graft_sqlcat_${s.sparkContext.applicationId}"
    s.conf.set("spark.sql.catalog.gsqlc", classOf[graft.sources.table.GraftCatalog].getName)
    s.conf.set("spark.sql.catalog.gsqlc.warehouse", wh)
    s.sql("CREATE NAMESPACE IF NOT EXISTS gsqlc.contract")
    s.sql("DROP TABLE IF EXISTS gsqlc.contract.repl")
    docs(s, dir).select("doc_id", "lang", "source", "n_chars")
      .createOrReplaceTempView("sqlrepl_docs")
    // staged CTAS → v0 holds (doc_id, lang) for doc_id < 300
    s.sql("CREATE TABLE gsqlc.contract.repl AS " +
      "SELECT doc_id, lang FROM sqlrepl_docs WHERE doc_id < 300")
    // in-place replace: DIFFERENT schema, different slice — v1
    s.sql("CREATE OR REPLACE TABLE gsqlc.contract.repl AS " +
      "SELECT doc_id, source, n_chars FROM sqlrepl_docs " +
      "WHERE doc_id >= 100 AND doc_id < 500")
    s.sql("""SELECT 'head' AS state, doc_id, source AS tag, n_chars
            |FROM gsqlc.contract.repl
            |UNION ALL
            |SELECT 'pre_replace' AS state, doc_id, lang AS tag,
            |  CAST(NULL AS BIGINT) AS n_chars
            |FROM gsqlc.contract.repl VERSION AS OF 0""".stripMargin)
      .orderBy("state", "doc_id")
  }

  /** Data-skipping semantics gate: three disjoint doc_id-range commits (so a
    * range probe CAN prune whole commits and, within survivors, whole files)
    * plus one SQL UPDATE (a DV + change-row commit whose stats span the
    * table — the "always kept" class). The probe is PURE SQL, so it rides the
    * DSv2 filter pushdown into [[graft.catalog.VersionedTable.readPrunedConjunction]];
    * the oracle states the same filter over the source table directly. Pruning
    * must be a pure optimization: a skip tier that dropped the DV commit, a
    * matching commit, or a file whose stats actually overlap would lose rows
    * (or resurrect the pre-update image) and hash-mismatch. The plan-level
    * assertion that files really ARE skipped lives in DSv2CatalogSpec — this
    * gate pins the VALUES under pruning.
    */
  private def qFileSkipping(s: SparkSession, dir: String): DataFrame = {
    val wh =
      s"${System.getProperty("java.io.tmpdir")}/graft_sqlcat_${s.sparkContext.applicationId}"
    s.conf.set("spark.sql.catalog.gsqlc", classOf[graft.sources.table.GraftCatalog].getName)
    s.conf.set("spark.sql.catalog.gsqlc.warehouse", wh)
    s.sql("CREATE NAMESPACE IF NOT EXISTS gsqlc.contract")
    s.sql("DROP TABLE IF EXISTS gsqlc.contract.skip")
    docs(s, dir).select("doc_id", "lang", "source", "n_chars")
      .createOrReplaceTempView("sqlskip_docs")
    // three disjoint-range commits: [0,200), [200,400), [400,∞)
    s.sql("CREATE TABLE gsqlc.contract.skip AS " +
      "SELECT * FROM sqlskip_docs WHERE doc_id < 200")
    s.sql("INSERT INTO gsqlc.contract.skip SELECT * FROM sqlskip_docs " +
      "WHERE doc_id >= 200 AND doc_id < 400")
    s.sql("INSERT INTO gsqlc.contract.skip SELECT * FROM sqlskip_docs " +
      "WHERE doc_id >= 400")
    // a DV + change-row commit the pruner must NEVER drop (dropping it would
    // serve the pre-update image / resurrect the DV-deleted originals)
    s.sql("UPDATE gsqlc.contract.skip SET n_chars = n_chars + 1000 " +
      "WHERE doc_id % 50 = 0")
    // range + equality probe: prunes the [400,∞) commit, keeps the rest
    s.sql("""SELECT doc_id, lang, source, n_chars FROM gsqlc.contract.skip
            |WHERE doc_id BETWEEN 120 AND 380 AND lang = 'en'""".stripMargin)
      .orderBy("doc_id")
  }

  /** COPY INTO gate: files arrive in a landing directory in two waves; each
    * `copyInto` run loads ONLY the not-yet-ingested files (file-granular
    * ledger, [[graft.catalog.CopyInto]]), and the deliberate RE-RUN between
    * the waves must load nothing — a ledger regression double-loads wave one
    * and the row counts (and hash) diverge from the oracle, which states the
    * source table exactly once.
    */
  private def qCopyInto(s: SparkSession, dir: String): DataFrame = {
    val root = java.nio.file.Files.createTempDirectory("graft_copy").toString
    val d = docs(s, dir).select("doc_id", "lang", "source", "n_chars")
    val loc = s"$root/table"
    graft.catalog.VersionedTable.write(d.limit(0), loc, "overwrite")
    d.filter(col("doc_id") % 2 === 0).repartition(2)
      .write.mode("append").parquet(s"$root/landing")
    val first = graft.catalog.CopyInto.copyInto(s, loc, s"$root/landing")
    require(first.filesLoaded >= 1, s"wave one loaded nothing: $first")
    val rerun = graft.catalog.CopyInto.copyInto(s, loc, s"$root/landing")
    require(rerun.filesLoaded == 0 && rerun.version.isEmpty,
      s"re-run must be a no-op, got $rerun")
    d.filter(col("doc_id") % 2 === 1).repartition(2)
      .write.mode("append").parquet(s"$root/landing")
    val second = graft.catalog.CopyInto.copyInto(s, loc, s"$root/landing")
    require(second.filesLoaded >= 1, s"wave two loaded nothing: $second")
    graft.catalog.VersionedTable.read(s, loc).orderBy("doc_id")
  }

  /** Native CLUSTER BY gate: a clustered table loaded from a deliberately
    * SHUFFLED insert, probed with a range predicate — the probe rides the
    * per-file stats the clustering made tight, so this pins the VALUES under
    * file-level pruning (a wrongly skipped file loses rows and
    * hash-mismatches; the plan-level file-count assertion lives in
    * ClusterBySqlSpec). The oracle states the same filter over the source.
    */
  private def qClusterBy(s: SparkSession, dir: String): DataFrame = {
    val wh =
      s"${System.getProperty("java.io.tmpdir")}/graft_sqlcat_${s.sparkContext.applicationId}"
    s.conf.set("spark.sql.catalog.gsqlc", classOf[graft.sources.table.GraftCatalog].getName)
    s.conf.set("spark.sql.catalog.gsqlc.warehouse", wh)
    s.sql("CREATE NAMESPACE IF NOT EXISTS gsqlc.contract")
    s.sql("DROP TABLE IF EXISTS gsqlc.contract.clus")
    docs(s, dir).select("doc_id", "lang", "n_chars")
      // shuffled arrival order: the declared clustering must impose the layout
      .orderBy(expr("md5(cast(doc_id as string))"))
      .createOrReplaceTempView("sqlclus_docs")
    s.sql("CREATE TABLE gsqlc.contract.clus (doc_id BIGINT, lang STRING, " +
      "n_chars BIGINT) CLUSTER BY (doc_id) " +
      "TBLPROPERTIES ('graft.filestats' = 'true')")
    s.sql("INSERT INTO gsqlc.contract.clus SELECT * FROM sqlclus_docs")
    s.sql("""SELECT doc_id, lang, n_chars FROM gsqlc.contract.clus
            |WHERE doc_id BETWEEN 100 AND 260""".stripMargin)
      .orderBy("doc_id")
  }

  /** Column-DDL gate: `CREATE TABLE` declaring a `DEFAULT` column and a
    * `GENERATED ALWAYS AS` column through pure SQL, then three INSERT waves —
    * defaults fill omitted columns (and `ALTER COLUMN ... SET DEFAULT` flips
    * the fill mid-table, metadata-only), the generated column is computed
    * when absent and validated when carried. The oracle restates every value
    * from the source table, so a default that stopped filling (NULL), a stale
    * default after the ALTER, or an uncomputed generated column all
    * hash-mismatch.
    */
  private def qColumnDefaults(s: SparkSession, dir: String): DataFrame = {
    val wh =
      s"${System.getProperty("java.io.tmpdir")}/graft_sqlcat_${s.sparkContext.applicationId}"
    s.conf.set("spark.sql.catalog.gsqlc", classOf[graft.sources.table.GraftCatalog].getName)
    s.conf.set("spark.sql.catalog.gsqlc.warehouse", wh)
    s.sql("CREATE NAMESPACE IF NOT EXISTS gsqlc.contract")
    s.sql("DROP TABLE IF EXISTS gsqlc.contract.cdft")
    docs(s, dir).select("doc_id", "lang").createOrReplaceTempView("sqldft_docs")
    s.sql("CREATE TABLE gsqlc.contract.cdft (doc_id BIGINT, lang STRING, " +
      "quality STRING DEFAULT 'unreviewed', " +
      "n2 BIGINT GENERATED ALWAYS AS (doc_id * 2))")
    s.sql("INSERT INTO gsqlc.contract.cdft (doc_id, lang) " +
      "SELECT doc_id, lang FROM sqldft_docs WHERE doc_id < 250")
    s.sql("ALTER TABLE gsqlc.contract.cdft ALTER COLUMN quality SET DEFAULT 'auto'")
    s.sql("INSERT INTO gsqlc.contract.cdft (doc_id, lang) " +
      "SELECT doc_id, lang FROM sqldft_docs WHERE doc_id >= 250 AND doc_id < 500")
    // the third wave carries BOTH explicitly: the default must not override,
    // and the generated column validates the carried value
    s.sql("INSERT INTO gsqlc.contract.cdft " +
      "SELECT doc_id, lang, 'gold', doc_id * 2 FROM sqldft_docs WHERE doc_id >= 500")
    s.sql("SELECT doc_id, lang, quality, n2 FROM gsqlc.contract.cdft")
      .orderBy("doc_id")
  }

  /** Identity-column gate: `GENERATED ALWAYS AS IDENTITY` with
    * `orderWithin = doc_id` — the engine assigns `rid` densely in doc_id
    * order per batch, continuing monotonically across the second append
    * (high-water mark from commit stats, no data read). The oracle replays
    * the exact allocation with per-slice ROW_NUMBER plus the first slice's
    * count as the second slice's offset; a duplicate, a gap, or a
    * non-deterministic assignment would hash-mismatch.
    */
  private def qIdentityColumn(s: SparkSession, dir: String): DataFrame = {
    val vt = graft.catalog.VersionedTable
    val loc =
      s"${System.getProperty("java.io.tmpdir")}/graft_idcol_${s.sparkContext.applicationId}"
    val p = new org.apache.hadoop.fs.Path(loc)
    val fs = p.getFileSystem(s.sessionState.newHadoopConf())
    if (fs.exists(p)) fs.delete(p, true)
    vt.addIdentityColumn(s, loc, "rid", start = 1000L, step = 2L,
      orderWithin = Seq("doc_id"))
    val d = docs(s, dir).select("doc_id", "lang")
    vt.write(d.filter(col("doc_id") < 300), loc, "overwrite")
    vt.write(d.filter(col("doc_id") >= 300 && col("doc_id") < 500), loc, "append")
    vt.read(s, loc).orderBy("doc_id")
  }

  /** Partition-scoped compaction gate (OPTIMIZE ... WHERE): a lang-partitioned
    * base across two commits with a DV delete inside lang='en', then
    * `compactPartitions(lang=en)` — ONE replace commit rewrites that slice
    * (DVs folded), every other partition untouched. The oracle states the
    * final logical content; a scoped compact that leaked rows across
    * partitions, resurrected deleted rows, or dropped live ones would
    * hash-mismatch.
    */
  private def qScopedCompact(s: SparkSession, dir: String): DataFrame = {
    val vt = graft.catalog.VersionedTable
    val loc =
      s"${System.getProperty("java.io.tmpdir")}/graft_scompact_${s.sparkContext.applicationId}"
    val p = new org.apache.hadoop.fs.Path(loc)
    val fs = p.getFileSystem(s.sessionState.newHadoopConf())
    if (fs.exists(p)) fs.delete(p, true)
    val d = docs(s, dir).select("doc_id", "lang", "source")
    vt.write(d.filter(col("doc_id") < 300), loc, "overwrite", partitionBy = Seq("lang"))
    vt.write(d.filter(col("doc_id") >= 300 && col("doc_id") < 500), loc,
      "append", Seq("lang"))
    vt.deleteWhere(s, loc, "lang = 'en' AND doc_id % 7 = 0")
    vt.compactPartitions(s, loc, Seq(Seq("lang" -> "en")), numFiles = 1)
    vt.read(s, loc).orderBy("doc_id")
  }

  /** Dynamic-partition-overwrite gate: a lang-partitioned base, then a batch
    * carrying ONLY lang='en' rows replaces exactly that partition (a `"replace"`
    * commit — every other partition carried by reference, zero rewrite). The
    * oracle states the final mixed state directly: untouched partitions from the
    * base, the replaced partition from the new batch — an overwrite that leaked
    * into other partitions, appended instead of replacing, or dropped the
    * untouched slice would hash-mismatch.
    */
  private def qReplacePartition(s: SparkSession, dir: String): DataFrame = {
    val vt = graft.catalog.VersionedTable
    val loc =
      s"${System.getProperty("java.io.tmpdir")}/graft_replace_${s.sparkContext.applicationId}"
    val p = new org.apache.hadoop.fs.Path(loc)
    val fs = p.getFileSystem(s.sessionState.newHadoopConf())
    if (fs.exists(p)) fs.delete(p, true)
    val d = docs(s, dir).select("doc_id", "lang", "source")
    vt.write(d.filter(col("doc_id") < 400), loc, "overwrite", partitionBy = Seq("lang"))
    vt.overwritePartitions(
      d.filter(col("doc_id") >= 400 && col("doc_id") < 500 && col("lang") === "en"), loc)
    vt.read(s, loc).orderBy("doc_id")
  }

  /** ADD COLUMN gate: a column declared after the base commit must read as typed
    * NULL across the pre-declaration rows and carry real values from the append
    * that lands it (metadata-only — no base file rewritten). The oracle states
    * both halves directly.
    */
  private def qAddColumn(s: SparkSession, dir: String): DataFrame = {
    val vt = graft.catalog.VersionedTable
    val loc =
      s"${System.getProperty("java.io.tmpdir")}/graft_addcol_${s.sparkContext.applicationId}"
    val p = new org.apache.hadoop.fs.Path(loc)
    val fs = p.getFileSystem(s.sessionState.newHadoopConf())
    if (fs.exists(p)) fs.delete(p, true)
    val d = docs(s, dir)
    vt.write(d.filter(col("doc_id") < 300).select("doc_id", "lang"), loc, "overwrite")
    vt.addColumn(s, loc, "score", "DOUBLE")
    vt.write(d.filter(col("doc_id") >= 300 && col("doc_id") < 500)
      .select(col("doc_id"), col("lang"), (col("n_chars") / 1000.0).as("score")),
      loc, "append")
    vt.read(s, loc).orderBy("doc_id")
  }

  /** TYPE WIDENING gate: an INT column widened to BIGINT as metadata — the
    * pre-widen commit's int files and a post-widen append carrying values past
    * Int.MaxValue read back as ONE BIGINT column, no file rewritten. A read
    * that lost the cast, dropped a branch in the widened union, or let the
    * narrow files truncate would diverge from the oracle's stated values.
    */
  private def qWidenColumn(s: SparkSession, dir: String): DataFrame = {
    val vt = graft.catalog.VersionedTable
    val loc =
      s"${System.getProperty("java.io.tmpdir")}/graft_widen_${s.sparkContext.applicationId}"
    val p = new org.apache.hadoop.fs.Path(loc)
    val fs = p.getFileSystem(s.sessionState.newHadoopConf())
    if (fs.exists(p)) fs.delete(p, true)
    val d = docs(s, dir)
    vt.write(d.filter(col("doc_id") < 300)
      .select(col("doc_id").cast("int").as("n"), col("lang")), loc, "overwrite")
    vt.widenColumn(s, loc, "n", "BIGINT")
    vt.write(d.filter(col("doc_id") >= 300 && col("doc_id") < 500)
      .select((col("doc_id") + 3000000000L).as("n"), col("lang")), loc, "append")
    vt.read(s, loc).orderBy("n")
  }

  private def qRenameColumn(s: SparkSession, dir: String): DataFrame = {
    val vt = graft.catalog.VersionedTable
    val loc =
      s"${System.getProperty("java.io.tmpdir")}/graft_colmap_${s.sparkContext.applicationId}"
    val p = new org.apache.hadoop.fs.Path(loc)
    val fs = p.getFileSystem(s.sessionState.newHadoopConf())
    if (fs.exists(p)) fs.delete(p, true)
    val d = docs(s, dir).select("doc_id", "lang", "n_chars")
    vt.write(d.filter(col("doc_id") < 300), loc, "overwrite")
    vt.renameColumn(s, loc, "lang", "language")
    vt.dropColumn(s, loc, "n_chars")
    vt.write(d.filter(col("doc_id") >= 300 && col("doc_id") < 500)
      .withColumnRenamed("lang", "language").drop("n_chars"), loc, "append")
    vt.read(s, loc).orderBy("doc_id")
  }

  /** End-to-end curation-pipeline gate: the composition proof that the LLM-data
    * operators chain — quality gate (token count + mean word length) →
    * priority dedup over a mirrored corpus → exact benchmark decontamination →
    * deterministic stratified sampling — in ONE lazy plan (no materialization
    * between stages; Catalyst fuses the per-row stages into the scan). The
    * oracle replays all four stages, so a stage reordering, a dedup winner
    * flip, or a sampling-cut drift anywhere in the chain hash-mismatches.
    */
  private def qCurationPipeline(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir).select("doc_id", "text", "lang", "source", "n_chars")
    val withTok = d.withColumn("n_tokens",
      size(split(trim(col("text")), "\\s+")).cast("long"))
    val quality = withTok.filter(col("n_tokens") >= 50 &&
      (col("n_chars").cast("double") / col("n_tokens")).between(3.0, 12.0))
    val mirror = quality.withColumn("doc_id", col("doc_id") + 10000)
      .withColumn("source", concat(lit("mirror_"), col("source")))
    val all = quality.unionByName(mirror)
      .withColumn("priority", col("doc_id") % 3)
    val deduped = graft.ops.Dedup.dedupByPriority(all, "priority")
    val bench = d.filter(col("doc_id") % 97 === 13)
      .select(md5(col("text")).as("bh"))
    val clean = deduped.join(bench,
      md5(deduped("text")) === bench("bh"), "left_anti")
    graft.ops.Splits.sampleStratified(clean, "lang",
        Map("en" -> 0.5, "zh" -> 1.0), defaultFraction = 0.25)
      .select("doc_id", "lang", "source", "priority", "n_tokens")
      .orderBy("doc_id")
  }

  /** Priority-dedup gate: the corpus unioned with a mirrored copy (same text,
    * shifted id, different source) so every text exists exactly twice; priority
    * = doc_id % 3 varies per pair, so sometimes the original wins, sometimes
    * the mirror. The operator keeps the min-(priority, doc_id) copy per content
    * hash via one min_by aggregation; the oracle replays the rule with a window
    * — an operator that kept an arbitrary copy would hash-mismatch.
    */
  private def qDedupPriority(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir).select("doc_id", "text", "source")
    val mirror = d
      .withColumn("doc_id", col("doc_id") + 10000)
      .withColumn("source", concat(lit("mirror_"), col("source")))
    val all = d.unionByName(mirror)
      .withColumn("priority", col("doc_id") % 3)
    graft.ops.Dedup.dedupByPriority(all, "priority")
      .select("doc_id", "source", "priority")
      .orderBy("doc_id")
  }

  /** Shallow-clone gate: source = documents(<300) minus a DV delete; the clone
    * is metadata-only (borrowed files), then diverges with its own append
    * [300,350). The read must show the source's DV-filtered state plus only the
    * clone's append — the oracle states it directly, so a clone that copied
    * stale state, dropped the borrowed DV, or leaked divergent writes back
    * would hash-mismatch.
    */
  private def qShallowClone(s: SparkSession, dir: String): DataFrame = {
    val vt = graft.catalog.VersionedTable
    val root =
      s"${System.getProperty("java.io.tmpdir")}/graft_clone_${s.sparkContext.applicationId}"
    val p = new org.apache.hadoop.fs.Path(root)
    val fs = p.getFileSystem(s.sessionState.newHadoopConf())
    if (fs.exists(p)) fs.delete(p, true)
    val d = docs(s, dir).select("doc_id", "lang")
    vt.write(d.filter(col("doc_id") < 300), s"$root/src", "overwrite")
    vt.deleteWhere(s, s"$root/src", "doc_id % 11 = 2")
    vt.shallowClone(s, s"$root/src", s"$root/dst")
    vt.write(d.filter(col("doc_id") >= 300 && col("doc_id") < 350),
      s"$root/dst", "append")
    // divergence after the clone must NOT surface in the clone's read
    vt.write(d.filter(col("doc_id") >= 900), s"$root/src", "append")
    vt.read(s, s"$root/dst").orderBy("doc_id")
  }

  /** Heavy-hitters gate: customers with strictly more than 0.1% of all orders
    * (threshold 15 at sf0.01, where per-customer counts run 1..25 — genuinely
    * selective). The operator is sketch-then-verify (Misra–Gries candidates, exact
    * recount); the oracle is the exact GROUP BY/HAVING, so a sketch that LOST a
    * true heavy hitter — the one failure mode the MG bound forbids — or an
    * inexact final count would hash-mismatch.
    */
  private def qHeavyHitters(s: SparkSession, dir: String): DataFrame =
    graft.ops.HeavyHitters
      .heavyHitters(Tables.load(s, dir, "orders"), "o_custkey", minShare = 0.001)
      .orderBy("item")

  /** Bloom-pruned incremental dedup gate: batch (doc_id ≥ 400) keeps only rows whose
    * text hash never appeared in the corpus (< 400). The bloom prunes the verify
    * join's probe side; the RESULT is exact anti-join semantics, which is exactly
    * what the oracle states — a bloom that produced a false NEGATIVE (the one error
    * its contract forbids) would leak a duplicate row and hash-mismatch.
    */
  private def qBloomDedup(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir).select(col("doc_id"), md5(col("text")).as("text_hash"))
    val corpus = d.filter(col("doc_id") < 400)
    val batch = d.filter(col("doc_id") >= 400)
    val bloom = graft.ops.BloomIndex.build(corpus, col("text_hash"),
      expectedItems = 5000, fpp = 0.01)
    graft.ops.BloomIndex.newKeysOnly(batch, "text_hash", corpus, bloom)
      .orderBy("doc_id")
  }

  private def qTableCounts(s: SparkSession, dir: String): DataFrame = {
    val tables = Seq("customer", "documents", "embeddings", "events", "lineitem", "orders")
    tables.map { n =>
      Tables.load(s, dir, n)
        .agg(count(lit(1)).as("row_count"))
        .select(lit(n).as("table_name"), col("row_count"))
    }.reduce(_.unionAll(_)).orderBy("table_name")
  }

  /** COUNT(col)-from-metadata gate: a catalog table whose `lang3` column is
    * NULL for every third doc; both `count(*)` and `count(lang3)` are then
    * answered from the commit log's row/null counts alone (complete DSv2
    * aggregate pushdown, [[graft.catalog.VersionedTable.fastCountCol]] — the
    * plan shape is asserted in CountPushdownSpec; this gate pins the VALUES
    * against the oracle's real aggregation).
    */
  private def qCountCols(s: SparkSession, dir: String): DataFrame = {
    val wh =
      s"${System.getProperty("java.io.tmpdir")}/graft_sqlcat_${s.sparkContext.applicationId}"
    s.conf.set("spark.sql.catalog.gsqlc", classOf[graft.sources.table.GraftCatalog].getName)
    s.conf.set("spark.sql.catalog.gsqlc.warehouse", wh)
    s.sql("CREATE NAMESPACE IF NOT EXISTS gsqlc.contract")
    s.sql("DROP TABLE IF EXISTS gsqlc.contract.cnt")
    docs(s, dir).select(col("doc_id"),
        when(col("doc_id") % 3 === 0, lit(null)).otherwise(col("lang")).as("lang3"))
      .createOrReplaceTempView("cntcols_docs")
    s.sql("CREATE TABLE gsqlc.contract.cnt AS SELECT * FROM cntcols_docs")
    s.sql("SELECT count(*) AS n_all, count(lang3) AS n_lang " +
      "FROM gsqlc.contract.cnt")
  }

  /** One per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_daily_sales" -> qDailySales(distinct = false),
    "q_daily_sales_distinct" -> qDailySales(distinct = true),
    "q_clv" -> qClv,
    "q_latest_order_per_customer" -> qLatestOrder,
    "q_orphan_orders" -> qOrphans,
    "q_cdc_flatten" -> qCdcFlatten,
    "q_dq_report" -> qDqReport,
    "q_table_counts" -> qTableCounts,
    "q_count_cols" -> qCountCols,
    "q_csv_roundtrip" -> qCsvRoundtrip,
    "q_json_partitioned_roundtrip" -> qJsonPartitionedRoundtrip,
    "q_avro_cdc_roundtrip" -> qAvroCdcRoundtrip,
    "q_avro_customers_roundtrip" -> qAvroCustomersRoundtrip,
    "q_synthetic_orders" -> qSyntheticOrders,
    "q_stream_ingest" -> qStreamIngest,
    "q_stream_upsert" -> qStreamUpsert,
    "q_events_hourly" -> qEventsHourly,
    "q_resample" -> qResample,
    "q_rolling_revenue" -> qRollingRevenue,
    "q_sessionize" -> qSessionize,
    "q_session_windows" -> qSessionWindows,
    "q_json_flatten" -> qJsonFlatten,
    "q_top_shingles" -> qTopShingles,
    "q_profile" -> qProfile,
    "q_outliers" -> qOutliers,
    "q_scd2" -> qScd2,
    "q_text_stats" -> qTextStats,
    "q_quality_score" -> qQualityScore,
    "q_pagerank" -> qPageRank,
    "q_gopher_rules" -> qGopherRules,
    "q_quality_floor" -> qQualityFloor,
    "q_drift" -> qDrift,
    "q_drift_categorical" -> qDriftCategorical,
    "q_token_counts" -> qTokenCounts,
    "q_lang_id" -> qLangId,
    "q_dedup_exact" -> qDedupExact,
    "q_ngram_jaccard" -> qNgramJaccard,
    "q_minhash_neardup" -> qMinhashNearDup,
    "q_fuzzy_pairs" -> qFuzzyPairs,
    "q_incremental_neardup" -> qIncrementalNearDup,
    "q_simhash" -> qSimhash,
    "q_simhash_near_pairs" -> qSimhashNearPairs,
    "q_fingerprints" -> qFingerprints,
    "q_similarity_topk" -> qSimilarityTopK,
    "q_hard_negatives" -> qHardNegatives,
    "q_ann_topk" -> qAnnTopK,
    "q_hybrid_retrieval" -> qHybridRetrieval,
    "q_hybrid_bm25" -> qHybridBm25,
    "q_matryoshka_topk" -> qMatryoshkaTopK,
    "q_funnel_topk" -> qFunnelTopK,
    "q_html_extract" -> qHtmlExtract,
    "q_html_main_content" -> qHtmlMainContent,
    "q_sentences" -> qSentences,
    "q_sentence_dedup" -> qSentenceDedup,
    "q_char_entropy" -> qCharEntropy,
    "q_ivf_topk" -> qIvfTopK,
    "q_ivfpq_topk" -> qIvfPqTopK,
    "q_pq_drift" -> qPqDrift,
    "q_ivf_append" -> qIvfAppend,
    "q_ivf_drift" -> qIvfDrift,
    "q_hybrid_ivf" -> qHybridIvf,
    "q_hybrid_external" -> qHybridExternal,
    "q_hybrid_bq" -> qHybridBq,
    "q_hybrid_pq" -> qHybridPq,
    "q_hybrid_external_sql" -> qHybridExternalSql,
    "q_bq_sql" -> qBqSql,
    "q_ivfpq_sql" -> qIvfPqSql,
    "q_bq_topk" -> qBqTopK,
    "q_bq_append" -> qBqAppend,
    "q_embedding_neardup" -> qEmbeddingNearDup,
    "q_semantic_dedup" -> qSemanticDedup,
    "q_repetition" -> qRepetition,
    "q_contamination" -> qContamination,
    "q_deterministic_sample" -> qDeterministicSample,
    "q_dedup_clusters" -> qDedupClusters,
    "q_multimodal_features" -> qMultimodalFeatures,
    "q_audio_features" -> qAudioFeatures,
    "q_catalog_stats" -> qCatalogStats,
    "q_time_travel" -> qTimeTravel,
    "q_compaction" -> qCompaction,
    "q_merge_upsert" -> qMergeUpsert,
    "q_change_feed" -> qChangeFeed,
    "q_heavy_hitters" -> qHeavyHitters,
    "q_bloom_dedup" -> qBloomDedup,
    "q_pricing_summary" -> qPricingSummary,
    "q_top_customers" -> qTopCustomers,
    "q_asof_join" -> qAsofJoin,
    "q_range_join" -> qRangeJoin,
    "q_interval_overlap" -> qIntervalOverlap,
    "q_doc_chunks" -> qDocChunks,
    "q_dataset_split" -> qDatasetSplit,
    "q_kfold" -> qKfold,
    "q_stratified_sample" -> qStratifiedSample,
    "q_temperature_sample" -> qTemperatureSample,
    "q_weighted_sample" -> qWeightedSample,
    "q_normalize_text" -> qNormalizeText,
    "q_pii_redact" -> qPiiRedact,
    "q_url_filter" -> qUrlFilter,
    "q_balanced_sample" -> qBalancedSample,
    "q_source_caps" -> qSourceCaps,
    "q_shards" -> qShards,
    "q_curriculum" -> qCurriculum,
    "q_dup_spans" -> qDupSpans,
    "q_span_cut" -> qSpanCut,
    "q_int8_quant" -> qInt8Quant,
    "q_lm_score" -> qLmScore,
    "q_lm_buckets" -> qLmBuckets,
    "q_novelty" -> qNovelty,
    "q_histogram" -> qHistogram,
    "q_funnel" -> qFunnel,
    "q_bm25_topk" -> qBm25,
    "q_bm25_append" -> qBm25Append,
    "q_vocabulary" -> qVocabulary,
    "q_token_pairs" -> qTokenPairs,
    "q_sales_rollup" -> qSalesRollup,
    "q_sales_cube" -> qSalesCube,
    "q_window_analytics" -> qWindowAnalytics,
    "q_set_ops" -> qSetOps,
    "q_pivot_revenue" -> qPivotRevenue,
    "q_value_percentiles" -> qValuePercentiles,
    "q_chunk_dedup" -> qChunkDedup,
    "q_mixture_plan" -> qMixturePlan,
    "q_k_anonymity" -> qKAnonymity,
    "q_l_diversity" -> qLDiversity,
    "q_incremental_view" -> qIncrementalView,
    "q_restore" -> qRestore,
    "q_delete_where" -> qDeleteWhere,
    "q_update_where" -> qUpdateWhere,
    "q_delete_cdf" -> qDeleteCdf,
    "q_shallow_clone" -> qShallowClone,
    "q_dedup_priority" -> qDedupPriority,
    "q_merge_on_read" -> qMergeOnRead,
    "q_dp_counts" -> qDpCounts,
    "q_dp_sums" -> qDpSums,
    "q_dp_means" -> qDpMeans,
    "q_score_calibration" -> qScoreCalibration,
    "q_keyword_tags" -> qKeywordTags,
    "q_schema_time_travel" -> qSchemaTimeTravel,
    "q_length_buckets" -> qLengthBuckets,
    "q_length_buckets_sharded" -> qLengthBucketsSharded,
    "q_generated_columns" -> qGeneratedColumns,
    "q_rename_column" -> qRenameColumn,
    "q_sql_catalog" -> qSqlCatalog,
    "q_sql_update" -> qSqlUpdate,
    "q_sql_merge" -> qSqlMerge,
    "q_sql_merge_partial" -> qSqlMergePartial,
    "q_sql_merge_full_sync" -> qSqlMergeFullSync,
    "q_sql_merge_evolution" -> qSqlMergeEvolution,
    "q_sql_replace" -> qSqlReplace,
    "q_file_skipping" -> qFileSkipping,
    "q_copy_into" -> qCopyInto,
    "q_column_defaults" -> qColumnDefaults,
    "q_cluster_by" -> qClusterBy,
    "q_identity_column" -> qIdentityColumn,
    "q_scoped_compact" -> qScopedCompact,
    "q_replace_partition" -> qReplacePartition,
    "q_add_column" -> qAddColumn,
    "q_widen_column" -> qWidenColumn,
    "q_curation_pipeline" -> qCurationPipeline)

  // ---- oracle SQL -------------------------------------------------------------------

  private def dailySalesSql(uniqueExpr: String): String =
    s"""WITH o AS ($oSql), c AS ($cSql)
       |SELECT strftime(o.order_date, '%Y-%m-%d') AS sale_date, c.region AS region,
       |  COUNT(o.order_id) AS total_orders,
       |  CAST(SUM(CAST(o.order_amount AS DECIMAL(18,2))) AS DOUBLE) AS total_revenue,
       |  CAST(SUM(CAST(o.order_amount AS DECIMAL(18,2))) AS DOUBLE) / COUNT(o.order_id)
       |    AS avg_order_value,
       |  $uniqueExpr AS unique_customers
       |FROM o JOIN c USING (customer_id)
       |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  private def dqReportSql: String = {
    def pct(table: String, check: String, target: String, viol: String,
        threshold: Double, rel: String): String = {
      val metric = "CASE WHEN COUNT(*) = 0 THEN 0.0 ELSE " +
        s"100.0 * SUM(CASE WHEN $viol THEN 1 ELSE 0 END) / COUNT(*) END"
      s"SELECT '$table' AS table_name, '$check' AS check_type, '$target' AS target, " +
        s"$metric AS metric_value, " +
        s"CASE WHEN ($metric) < $threshold THEN 'PASS' ELSE 'FAIL' END AS status FROM $rel"
    }
    val completeness =
      Seq("order_id", "order_date", "order_amount", "customer_id").map(c =>
        pct("orders", "completeness", c, s"$c IS NULL", 5.0, "o")) ++
      Seq("customer_id", "name", "email", "region", "customer_tenure_days").map(c =>
        pct("customers", "completeness", c, s"$c IS NULL", 5.0, "c"))
    val accuracy = Seq(
      pct("orders", "accuracy", "amount_positive", "NOT (order_amount > 0)", 1.0, "o"),
      pct("orders", "accuracy", "date_not_future",
        "NOT (order_date <= TIMESTAMP '2026-01-01')", 1.0, "o"),
      pct("customers", "accuracy", "tenure_1_100",
        "NOT (customer_tenure_days BETWEEN 1 AND 100)", 1.0, "c"))
    val orphanPct = "CASE WHEN (SELECT COUNT(*) FROM o) = 0 THEN 0.0 ELSE " +
      "100.0 * (SELECT COUNT(*) FROM o WHERE NOT EXISTS " +
      "(SELECT 1 FROM c WHERE c.customer_id = o.customer_id)) / " +
      "(SELECT COUNT(*) FROM o) END"
    val consistency =
      "SELECT 'orders' AS table_name, 'consistency' AS check_type, " +
        "'customer_id->customers' AS target, " +
        s"$orphanPct AS metric_value, " +
        s"CASE WHEN ($orphanPct) < 1.0 THEN 'PASS' ELSE 'FAIL' END AS status"
    val volume =
      "SELECT 'orders' AS table_name, 'volume' AS check_type, 'rows' AS target, " +
        "CAST(COUNT(*) AS DOUBLE) AS metric_value, " +
        "CASE WHEN COUNT(*) BETWEEN 1 AND 1000000000000 THEN 'PASS' ELSE 'FAIL' END " +
        "AS status FROM o"
    s"WITH o AS ($oSql), c AS ($cSql)\n" +
      (completeness ++ accuracy ++ Seq(consistency, volume)).mkString(" UNION ALL ") +
      " ORDER BY table_name, check_type, target"
  }

  private def sqlList(words: Seq[String]): String =
    words.map(w => s"'$w'").mkString("[", ", ", "]")

  private val textStatsSql: String = {
    val stop = sqlList(TextAnalysis.enStop)
    s"""WITH t AS (SELECT doc_id, text,
       |    string_split_regex(trim(text), '\\s+') AS toks,
       |    regexp_extract_all(text, '\\w+|[^\\w\\s]') AS bp
       |  FROM documents),
       |u AS (SELECT doc_id, length(text) AS n_chars, len(toks) AS n_words,
       |    length(regexp_replace(trim(text), '\\s+', '', 'g')) AS n_nonspace,
       |    len(bp) - len(list_filter(bp, x -> regexp_full_match(x, '\\w+'))) AS n_punct,
       |    len(list_filter(toks, x -> list_contains($stop, x))) AS n_stop
       |  FROM t),
       |v AS (SELECT doc_id, n_chars, n_words,
       |    CASE WHEN n_words > 0 THEN CAST(n_nonspace AS DOUBLE) / n_words ELSE 0.0 END
       |      AS avg_word_len,
       |    CASE WHEN n_chars > 0 THEN CAST(n_punct AS DOUBLE) / n_chars ELSE 0.0 END
       |      AS punct_ratio,
       |    CASE WHEN n_words > 0 THEN CAST(n_stop AS DOUBLE) / n_words ELSE 0.0 END
       |      AS stopword_ratio
       |  FROM u)
       |SELECT doc_id, n_chars, n_words, avg_word_len, punct_ratio, stopword_ratio,
       |  CAST(CASE WHEN n_words BETWEEN 5 AND 10000 THEN 0.25 ELSE 0.0 END
       |   + CASE WHEN avg_word_len BETWEEN 2.0 AND 12.0 THEN 0.25 ELSE 0.0 END
       |   + CASE WHEN punct_ratio <= 0.2 THEN 0.25 ELSE 0.0 END
       |   + CASE WHEN stopword_ratio > 0.0 THEN 0.25 ELSE 0.0 END AS DOUBLE)
       |   AS quality_score
       |FROM v ORDER BY doc_id""".stripMargin
  }

  /** Replays [[QualityClassifier.score]]: the proven textStats CTE feeds the same
    * left-associated weighted sum and sigmoid, weights emitted from the one shared
    * list (`qualityWeights`), so Spark and DuckDB evaluate bit-identical IEEE
    * expression trees before the 6-dp round.
    */
  private val qualityScoreSql: String = {
    val features = Seq("1.0", "ln(1.0 + n_chars)", "ln(1.0 + n_words)",
      "avg_word_len", "punct_ratio", "stopword_ratio")
    val z = qualityWeights.zip(features)
      .map { case (w, f) => s"$w * $f" }.mkString(" + ")
    s"""WITH s AS (${textStatsSql.replace("ORDER BY doc_id", "")})
       |SELECT doc_id, round(1.0 / (1.0 + exp(-($z))), 6) AS quality
       |FROM s ORDER BY doc_id""".stripMargin
  }

  /** Replays [[graft.ops.GraphRank.pageRank]] as unrolled power-iteration CTEs:
    * identical share precomputation (w/ow once, then rank·share), identical
    * teleport `(1.0-0.85)/n`, and the explicit `+ 0.0/n` dangling term (zero on
    * this graph — every event type has out-edges — but kept so the expression
    * trees match op-for-op).
    */
  private val pageRankSql: String = {
    val iters = 5
    val body = (1 to iters).map { i =>
      s"""c$i AS (SELECT sh.dst AS node, SUM(r${i - 1}.rank * sh.share) AS c
         |  FROM r${i - 1} JOIN sh ON r${i - 1}.node = sh.src GROUP BY sh.dst),
         |r$i AS (SELECT nodes.node,
         |  (1.0 - 0.85) / (SELECT n FROM nn)
         |    + 0.85 * (COALESCE(c$i.c, 0.0) + 0.0 / (SELECT n FROM nn)) AS rank
         |  FROM nodes LEFT JOIN c$i ON nodes.node = c$i.node)""".stripMargin
    }.mkString(",\n")
    s"""WITH p AS (SELECT lag(event_type) OVER (
       |    PARTITION BY user_id ORDER BY ts, event_id) AS src,
       |    event_type AS dst FROM events),
       |e AS (SELECT src, dst, CAST(COUNT(*) AS DOUBLE) AS w FROM p
       |  WHERE src IS NOT NULL GROUP BY src, dst),
       |nodes AS (SELECT DISTINCT node FROM
       |  (SELECT src AS node FROM e UNION SELECT dst FROM e)),
       |nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM nodes),
       |ow AS (SELECT src, SUM(w) AS ow FROM e GROUP BY src),
       |sh AS (SELECT e.src, e.dst, e.w / ow.ow AS share
       |  FROM e JOIN ow ON e.src = ow.src),
       |r0 AS (SELECT node, 1.0 / (SELECT n FROM nn) AS rank FROM nodes),
       |$body
       |SELECT node, round(rank, 6) AS rank FROM r$iters ORDER BY node""".stripMargin
  }

  /** Replays [[TextAnalysis.gopherRules]] at the contract thresholds: same token /
    * line splits, same engine-portable regexes, same ratio math and rule chain.
    */
  private val gopherRulesSql: String = {
    val stopSum = TextAnalysis.gopherStop.map(w =>
      s"CASE WHEN list_contains(ltoks, '$w') THEN 1 ELSE 0 END")
      .mkString("(", " + ", ")")
    s"""WITH t AS (SELECT doc_id, text,
       |    string_split_regex(trim(text), '\\s+') AS toks,
       |    string_split_regex(trim(lower(text)), '\\s+') AS ltoks,
       |    string_split(text, chr(10)) AS lines
       |  FROM documents),
       |u AS (SELECT doc_id,
       |    CASE WHEN length(trim(text)) = 0 THEN 0 ELSE len(toks) END AS n_words,
       |    length(regexp_replace(trim(text), '\\s+', '', 'g')) AS n_nonspace,
       |    len(regexp_extract_all(text, '#|\\.\\.\\.|…')) AS n_symbols,
       |    len(lines) AS n_lines,
       |    len(list_filter(lines, l -> regexp_matches(l, '^[ \\t]*[-*•]')))
       |      AS n_bullet,
       |    len(list_filter(lines, l -> regexp_matches(l, '(\\.\\.\\.|…)[ \\t]*$$')))
       |      AS n_ellipsis,
       |    len(list_filter(toks, x -> regexp_matches(x, '[A-Za-z]'))) AS n_alpha,
       |    $stopSum AS stop_hits
       |  FROM t),
       |v AS (SELECT doc_id, n_words,
       |    CASE WHEN n_words > 0 THEN CAST(n_nonspace AS DOUBLE) / n_words
       |      ELSE 0.0 END AS mean_word_len,
       |    CASE WHEN n_words > 0 THEN CAST(n_symbols AS DOUBLE) / n_words
       |      ELSE 0.0 END AS symbol_word_ratio,
       |    CAST(n_bullet AS DOUBLE) / n_lines AS bullet_line_ratio,
       |    CAST(n_ellipsis AS DOUBLE) / n_lines AS ellipsis_line_ratio,
       |    CASE WHEN n_words > 0 THEN CAST(n_alpha AS DOUBLE) / n_words
       |      ELSE 0.0 END AS alpha_word_ratio,
       |    stop_hits
       |  FROM u)
       |SELECT doc_id, n_words, mean_word_len, symbol_word_ratio, bullet_line_ratio,
       |  ellipsis_line_ratio, alpha_word_ratio, stop_hits,
       |  CAST(CASE WHEN n_words BETWEEN 20 AND 80
       |    AND mean_word_len BETWEEN 3.0 AND 10.0
       |    AND symbol_word_ratio <= 0.1
       |    AND bullet_line_ratio <= 0.9
       |    AND ellipsis_line_ratio <= 0.3
       |    AND alpha_word_ratio >= 0.8
       |    AND stop_hits >= 1 THEN 1 ELSE 0 END AS INT) AS passes
       |FROM v ORDER BY doc_id""".stripMargin
  }

  private val langIdSql: String = {
    def hits(l: Seq[String]) =
      s"len(list_filter(toks, x -> list_contains(${sqlList(l)}, x)))"
    s"""WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks
       |  FROM documents),
       |s AS (SELECT doc_id, ${hits(TextAnalysis.enStop)} AS en_hits,
       |    ${hits(TextAnalysis.deStop)} AS de_hits,
       |    ${hits(TextAnalysis.esStop)} AS es_hits,
       |    ${hits(TextAnalysis.frStop)} AS fr_hits FROM t)
       |SELECT doc_id, en_hits, de_hits, es_hits, fr_hits,
       |  CASE WHEN greatest(en_hits, de_hits, es_hits, fr_hits) = 0 THEN 'und'
       |    WHEN en_hits = greatest(en_hits, de_hits, es_hits, fr_hits) THEN 'en'
       |    WHEN de_hits = greatest(en_hits, de_hits, es_hits, fr_hits) THEN 'de'
       |    WHEN es_hits = greatest(en_hits, de_hits, es_hits, fr_hits) THEN 'es'
       |    ELSE 'fr' END AS predicted_lang
       |FROM s ORDER BY doc_id""".stripMargin
  }

  /** Shared CTE chain producing the Jaccard-filtered near-dup pair columns. */
  private val jaccardPairCtes: String =
    """toks AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS tk
      |  FROM documents),
      |t AS (SELECT doc_id, CASE WHEN len(tk) >= 3 THEN
      |    list_distinct(list_transform(generate_series(1, len(tk) - 2),
      |      i -> array_to_string(tk[i:i+2], ' ')))
      |    ELSE [] END AS shs FROM toks),
      |sh AS (SELECT doc_id, unnest(shs) AS shingle FROM t),
      |sizes AS (SELECT doc_id, COUNT(*) AS n_shingles FROM sh GROUP BY 1),
      |kept AS (SELECT sh.* FROM sh JOIN (
      |  SELECT shingle FROM sh GROUP BY shingle HAVING COUNT(*) <= 1000) k
      |  USING (shingle)),
      |pairs AS (SELECT x.doc_id AS doc_a, y.doc_id AS doc_b, COUNT(*) AS n_common
      |  FROM kept x JOIN kept y ON x.shingle = y.shingle AND x.doc_id < y.doc_id
      |  GROUP BY 1, 2),
      |scored AS (SELECT doc_a, doc_b, n_common,
      |  sa.n_shingles AS size_a, sb.n_shingles AS size_b,
      |  CAST(n_common AS DOUBLE) / (sa.n_shingles + sb.n_shingles - n_common) AS jaccard
      |FROM pairs
      |JOIN sizes sa ON pairs.doc_a = sa.doc_id
      |JOIN sizes sb ON pairs.doc_b = sb.doc_id
      |WHERE CAST(n_common AS DOUBLE) / (sa.n_shingles + sb.n_shingles - n_common) >= 0.5)""".stripMargin

  private val ngramJaccardSql: String =
    s"""WITH $jaccardPairCtes
       |SELECT doc_a, doc_b, n_common, size_a, size_b, jaccard FROM scored
       |ORDER BY doc_a, doc_b""".stripMargin

  /** Connected components of the near-dup pair graph via recursive reachability. */
  private val dedupClustersSql: String =
    s"""WITH RECURSIVE $jaccardPairCtes,
       |edges AS (SELECT doc_a AS src, doc_b AS dst FROM scored
       |  UNION SELECT doc_b, doc_a FROM scored),
       |nodes AS (SELECT DISTINCT src AS node FROM edges),
       |reach AS (SELECT node, node AS r FROM nodes
       |  UNION SELECT reach.node, e.dst AS r FROM reach JOIN edges e ON reach.r = e.src)
       |SELECT node, MIN(r) AS component FROM reach GROUP BY node
       |ORDER BY node""".stripMargin

  /** MinHash+LSH banding replayed in DuckDB: per-seed hash = md5('seed:' || shingle)
    * (lexicographic MIN over hex strings — exactly [[graft.ops.Dedup.md5HashFn]]), bands
    * of 2 joined with '|' ([[graft.ops.Dedup.md5BandHash]]), then the Jaccard-verified
    * pairs are the banding candidates ∩ `scored`. The df-capped `kept` in `scored` is a
    * no-op below 1000 documents, so common-shingle counts agree with the uncapped Spark
    * verify join at the gate's sf0.01.
    */
  private val minhashNearDupSql: String = {
    val numHashes = 32
    val bands = 16
    val rowsPerBand = numHashes / bands
    val minCols = (0 until numHashes)
      .map(s => s"MIN(md5('$s:' || shingle)) AS h$s").mkString(", ")
    val bandSelects = (0 until bands).map { b =>
      val cols = (b * rowsPerBand until (b + 1) * rowsPerBand).map(i => s"h$i")
        .mkString(" || '|' || ")
      s"SELECT doc_id, $b AS band, $cols AS bv FROM mins"
    }.mkString(" UNION ALL ")
    s"""WITH $jaccardPairCtes,
       |mins AS (SELECT doc_id, $minCols FROM sh GROUP BY doc_id),
       |mbands AS ($bandSelects),
       |mcand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM mbands a JOIN mbands b
       |  ON a.band = b.band AND a.bv = b.bv AND a.doc_id < b.doc_id)
       |SELECT s.doc_a, s.doc_b, s.jaccard FROM scored s
       |JOIN mcand USING (doc_a, doc_b)
       |ORDER BY doc_a, doc_b""".stripMargin
  }

  /** [[graft.ops.IncrementalDedup.matchesAgainstIndex]] replayed: md5-twin signatures
    * over the whole corpus, banded probe of new (doc_id ≥ 400) against index
    * (doc_id < 400), similarity = fraction of agreeing minhashes (exact: /32 is
    * binary-representable).
    */
  private val incrementalNearDupSql: String = {
    val numHashes = 32
    val bands = 16
    val rowsPerBand = numHashes / bands
    val minCols = (0 until numHashes)
      .map(s => s"MIN(md5('$s:' || shingle)) AS h$s").mkString(", ")
    val bandSelects = (0 until bands).map { b =>
      val cols = (b * rowsPerBand until (b + 1) * rowsPerBand).map(i => s"h$i")
        .mkString(" || '|' || ")
      s"SELECT doc_id, $b AS band, $cols AS bv FROM mins"
    }.mkString(" UNION ALL ")
    val agree = (0 until numHashes)
      .map(i => s"CASE WHEN a.h$i = b.h$i THEN 1 ELSE 0 END").mkString(" + ")
    s"""WITH toks AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS tk
       |  FROM documents),
       |t AS (SELECT doc_id, CASE WHEN len(tk) >= 3 THEN
       |    list_distinct(list_transform(generate_series(1, len(tk) - 2),
       |      i -> array_to_string(tk[i:i+2], ' ')))
       |    ELSE [] END AS shs FROM toks),
       |sh AS (SELECT doc_id, unnest(shs) AS shingle FROM t),
       |mins AS (SELECT doc_id, $minCols FROM sh GROUP BY doc_id),
       |bb AS ($bandSelects),
       |cand AS (SELECT DISTINCT n.doc_id AS new_doc, i.doc_id AS index_doc
       |  FROM bb n JOIN bb i ON n.band = i.band AND n.bv = i.bv
       |  WHERE n.doc_id >= 400 AND i.doc_id < 400)
       |SELECT new_doc, index_doc, ($agree) / 32.0 AS est_jaccard
       |FROM cand
       |JOIN mins a ON cand.new_doc = a.doc_id
       |JOIN mins b ON cand.index_doc = b.doc_id
       |WHERE ($agree) / 32.0 >= 0.5
       |ORDER BY new_doc, index_doc""".stripMargin
  }

  /** 60-bit md5 SimHash CTE chain ([[graft.ops.Dedup.simHashMd5]] replayed in DuckDB):
    * token hash = first 15 hex chars of md5(token) parsed base-16, per-bit ±1 sums,
    * bit set where the sum is positive.
    */
  private val simhashMd5Ctes: String =
    """tok AS (SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS token
      |  FROM documents),
      |th AS (SELECT doc_id, list_reduce(list_prepend(CAST(0 AS BIGINT),
      |    list_transform(range(1, 16),
      |      i -> CAST(strpos('0123456789abcdef', substr(md5(token), i, 1)) - 1
      |        AS BIGINT))),
      |    (acc, x) -> acc * 16 + x) AS h FROM tok),
      |bitsums AS (SELECT doc_id, b,
      |    SUM(CASE WHEN ((h >> b) & 1) = 1 THEN 1 ELSE -1 END) AS s
      |  FROM th CROSS JOIN range(0, 60) t(b) GROUP BY doc_id, b),
      |sims AS (SELECT doc_id,
      |    CAST(SUM(CASE WHEN s > 0 THEN (CAST(1 AS BIGINT) << b) ELSE 0 END) AS BIGINT)
      |      AS simhash
      |  FROM bitsums GROUP BY doc_id)""".stripMargin

  private val simhashSql: String =
    s"""WITH $simhashMd5Ctes
       |SELECT doc_id, simhash FROM sims ORDER BY doc_id""".stripMargin

  private val simhashNearPairsSql: String =
    s"""WITH $simhashMd5Ctes
       |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |  CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
       |FROM sims a JOIN sims b ON a.doc_id < b.doc_id
       |WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
       |ORDER BY doc_a, doc_b""".stripMargin

  /** [[graft.functions.RollingHash]] replayed byte-for-byte in DuckDB: hex(encode(text))
    * exposes the UTF-8 bytes, two modular polynomial folds over them, packed as
    * (h1 << 31) | h2 — h2 < 2³¹ makes the OR a plain addition of h1 * 2³¹.
    */
  private val fingerprintsSql: String =
    """WITH t AS (SELECT doc_id, md5(text) AS md5_fingerprint, hex(encode(text)) AS hx,
      |    octet_length(encode(text)) AS n FROM documents),
      |b AS (SELECT doc_id, md5_fingerprint, list_transform(range(0, n),
      |    i -> CAST(strpos('0123456789ABCDEF', substr(hx, 2 * i + 1, 1)) * 16
      |       + strpos('0123456789ABCDEF', substr(hx, 2 * i + 2, 1)) - 17 AS BIGINT))
      |    AS bs
      |  FROM t)
      |SELECT doc_id, md5_fingerprint,
      |  list_reduce(list_prepend(CAST(0 AS BIGINT), bs),
      |    (acc, x) -> (acc * 1000003 + x) % 2147483647) * 2147483648
      |  + list_reduce(list_prepend(CAST(0 AS BIGINT), bs),
      |    (acc, x) -> (acc * 998244353 + x) % 2147483629) AS rolling_fingerprint
      |FROM b ORDER BY doc_id""".stripMargin

  /** The seed-42 hyperplanes of [[graft.ops.Similarity.withTableSignatures]] as DuckDB
    * `(table, planes)` VALUES rows. %.17e round-trips every double exactly, and
    * scientific notation parses as DOUBLE (a bare decimal literal would become DECIMAL
    * and trip the driver-risky-type gate).
    */
  private def planesValues(tables: Int, planesPerTable: Int, dim: Int): String =
    (0 until tables).map { t =>
      val planes = Similarity.hyperplanes(planesPerTable, dim, 42L + t)
      val planesLit = planes
        .map(_.map(d => f"$d%.17e").mkString("[", ", ", "]"))
        .mkString("[", ", ", "]")
      s"($t, $planesLit)"
    }.mkString(", ")

  /** Multi-table LSH signatures replayed in DuckDB. The embeddings fixtures are dim-64
    * at every SF (the Spark side probes this; the literal planes must cover it).
    * Signature fold (acc*2 + bit over plane order) and dot-product summation order
    * mirror the Spark expressions exactly, so the bucket assignment is bit-identical.
    */
  private def lshSigCtes(tables: Int, planesPerTable: Int): String =
    s"""e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       |  FROM embeddings),
       |n AS (SELECT vec_id, v, sqrt(list_sum(list_transform(v, x -> x * x))) AS norm
       |  FROM e),
       |p(t, planes) AS (VALUES ${planesValues(tables, planesPerTable, 64)}),
       |sigs AS (SELECT vec_id, v, norm, t,
       |  list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(planes,
       |    pl -> CASE WHEN list_sum(list_transform(list_zip(pl, v),
       |      z -> CAST(z[1] AS DOUBLE) * CAST(z[2] AS DOUBLE))) >= 0
       |      THEN 1 ELSE 0 END)), (acc, b) -> acc * 2 + b) AS sig
       |  FROM n CROSS JOIN p)""".stripMargin

  private val annTopkSql: String =
    s"""WITH ${lshSigCtes(tables = 16, planesPerTable = 4)},
       |q AS (SELECT vec_id AS query_id, v AS qv, norm AS qnorm, t, sig FROM sigs
       |  WHERE vec_id < 10),
       |cand AS (SELECT DISTINCT q.query_id, s.vec_id,
       |    round(list_sum(list_transform(list_zip(q.qv, s.v),
       |      z -> CAST(z[1] AS DOUBLE) * CAST(z[2] AS DOUBLE))) / (q.qnorm * s.norm), 4)
       |      AS cosine
       |  FROM sigs s JOIN q ON s.t = q.t AND s.sig = q.sig AND s.vec_id <> q.query_id)
       |SELECT query_id, rank, vec_id, cosine FROM (
       |  SELECT *, CAST(row_number() OVER (
       |    PARTITION BY query_id ORDER BY cosine DESC, vec_id) AS INT) AS rank
       |  FROM cand)
       |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin

  /** Fused double dot product — mirrors [[graft.functions.DotProduct]]'s left-to-right
    * summation (identical doubles ⇒ identical argmax/rank everywhere it is used).
    */
  private def dotSql(a: String, b: String): String =
    s"list_sum(list_transform(list_zip($a, $b), z -> CAST(z[1] AS DOUBLE) * CAST(z[2] AS DOUBLE)))"

  /** [[graft.ops.Ivf.ivfTopK]] replayed in DuckDB: centroids are the 16 lowest-id
    * vectors (the deterministic seed path — no floating-point averaging to diverge on),
    * assignment/probing argmax by (cosine DESC, centroid_id), nprobe=4, exact rerank.
    */
  /** The binary-quantization funnel replayed exactly: place-value packing
    * (sums of distinct powers of two — integer-exact), Hamming via
    * bit_count(xor) on the BIGINT words, shortlist window with vec_id
    * tiebreak, then the identical cosine rerank as q_similarity_topk.
    * Shared by the one-shot gate (q_bq_topk) and the incremental codes
    * gate (q_bq_append), whose pass therefore proves append-equality too.
    */
  private lazy val bqTopkSql: String =
    """WITH e AS (SELECT vec_id,
        |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
        |c AS (SELECT vec_id,
        |    list_transform(range((len(v) - 1) // 32 + 1), w ->
        |      CAST(list_sum(list_transform(range(32), b ->
        |        CASE WHEN v[w * 32 + b + 1] > 0
        |          THEN (CAST(1 AS BIGINT) << b) ELSE 0 END)) AS BIGINT)) AS code
        |  FROM e),
        |qc AS (SELECT vec_id AS query_id, code AS qcode FROM c WHERE vec_id < 10),
        |h AS (SELECT qc.query_id, c.vec_id,
        |    CAST(list_sum(list_transform(range(len(c.code)), i ->
        |      bit_count(xor(c.code[i + 1], qc.qcode[i + 1])))) AS BIGINT) AS hamming
        |  FROM c JOIN qc ON c.vec_id <> qc.query_id),
        |sl AS (SELECT query_id, vec_id FROM (
        |    SELECT *, row_number() OVER (PARTITION BY query_id
        |      ORDER BY hamming, vec_id) AS sr FROM h) WHERE sr <= 30),
        |n AS (SELECT vec_id, v,
        |    sqrt(list_sum(list_transform(v, x -> x * x))) AS norm FROM e),
        |q AS (SELECT vec_id AS query_id, v AS qv, norm AS qnorm FROM n
        |  WHERE vec_id < 10),
        |s AS (SELECT sl.query_id, sl.vec_id,
        |    round(list_sum(list_transform(list_zip(q.qv, n.v),
        |      p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
        |      / (q.qnorm * n.norm), 4) AS cosine
        |  FROM sl JOIN n ON n.vec_id = sl.vec_id
        |    JOIN q ON q.query_id = sl.query_id)
        |SELECT query_id, rank, vec_id, cosine FROM (
        |  SELECT *, CAST(row_number() OVER (
        |    PARTITION BY query_id ORDER BY cosine DESC, vec_id) AS INT) AS rank FROM s)
        |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin

  /** q_hybrid_ivf: the BM25-from-postings lexical leg exactly as in
    * q_hybrid_bm25, fused with an IVF-probed semantic leg — assignment and
    * probe argmax by (cosine DESC, centroid_id) as in q_ivf_topk, legK
    * ranking window, then the 1/(60+rank) fusion. Lexical CTEs stay in a
    * plain (non-interpolated) literal so the regex backslashes survive.
    */
  private lazy val hybridIvfSql: String =
    """WITH d AS (SELECT doc_id,
      |    string_split_regex(trim(lower(text)), '\s+') AS toks FROM documents),
      |post AS (SELECT doc_id, tok AS term, count(*) AS tf FROM
      |  (SELECT doc_id, unnest(toks) AS tok FROM d) GROUP BY 1, 2),
      |dl AS (SELECT doc_id, len(toks) AS dl FROM d),
      |st AS (SELECT CAST(count(*) AS DOUBLE) AS n,
      |    CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl FROM dl),
      |qt AS (SELECT doc_id AS query_id, term FROM post
      |  WHERE doc_id < 5 AND term <> ''),
      |dfs AS (SELECT term, count(*) AS df FROM post
      |  WHERE term IN (SELECT DISTINCT term FROM qt) GROUP BY term),
      |hit AS (SELECT qt.query_id, p.doc_id, p.term, p.tf
      |  FROM post p JOIN qt ON p.term = qt.term AND p.doc_id <> qt.query_id),
      |a AS (SELECT query_id, h.doc_id,
      |    round(ln(1.0 + (n - df + 0.5) / (df + 0.5)) * tf * 2.2
      |      / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl)), 6) AS a
      |  FROM hit h JOIN dfs USING (term) JOIN dl USING (doc_id), st),
      |lex0 AS (SELECT query_id, doc_id, round(sum(a), 6) AS bm25
      |  FROM a GROUP BY 1, 2),
      |lex AS (SELECT query_id, doc_id, CAST(r AS INT) AS lex_rank FROM (
      |    SELECT *, row_number() OVER (
      |      PARTITION BY query_id ORDER BY bm25 DESC, doc_id) AS r FROM lex0)
      |  WHERE r <= 20),""".stripMargin +
    s"""
      |e AS (SELECT vec_id,
      |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
      |n AS (SELECT vec_id, v,
      |    sqrt(list_sum(list_transform(v, x -> x * x))) AS norm FROM e),
      |c AS (SELECT vec_id AS centroid_id, v AS cv, norm AS cnorm FROM n
      |  WHERE vec_id < 16),
      |asg AS (SELECT vec_id, v, norm, centroid_id AS cluster FROM (
      |  SELECT n.vec_id, n.v, n.norm, c.centroid_id,
      |    row_number() OVER (PARTITION BY n.vec_id ORDER BY
      |      ${dotSql("n.v", "c.cv")} / (n.norm * c.cnorm) DESC, c.centroid_id) AS rn
      |  FROM n CROSS JOIN c) WHERE rn = 1),
      |q AS (SELECT vec_id AS query_id, v AS qv, norm AS qnorm FROM n
      |  WHERE vec_id < 5),
      |probes AS (SELECT query_id, qv, qnorm, centroid_id AS cluster FROM (
      |  SELECT q.query_id, q.qv, q.qnorm, c.centroid_id,
      |    row_number() OVER (PARTITION BY q.query_id ORDER BY
      |      ${dotSql("q.qv", "c.cv")} / (q.qnorm * c.cnorm) DESC, c.centroid_id)
      |      AS prn
      |  FROM q CROSS JOIN c) WHERE prn <= 4),
      |cand AS (SELECT p.query_id, a2.vec_id AS doc_id,
      |    round(${dotSql("p.qv", "a2.v")} / (p.qnorm * a2.norm), 4) AS cosine
      |  FROM probes p JOIN asg a2
      |    ON a2.cluster = p.cluster AND a2.vec_id <> p.query_id),
      |sem AS (SELECT query_id, doc_id, CAST(r AS INT) AS sem_rank FROM (
      |    SELECT *, row_number() OVER (
      |      PARTITION BY query_id ORDER BY cosine DESC, doc_id) AS r FROM cand)
      |  WHERE r <= 20),
      |fused AS (SELECT coalesce(lex.query_id, sem.query_id) AS query_id,
      |    coalesce(lex.doc_id, sem.doc_id) AS doc_id,
      |    lex.lex_rank, sem.sem_rank,
      |    coalesce(CAST(1.0 AS DOUBLE) / (60 + lex.lex_rank), CAST(0 AS DOUBLE))
      |      + coalesce(CAST(1.0 AS DOUBLE) / (60 + sem.sem_rank), CAST(0 AS DOUBLE))
      |      AS rrf
      |  FROM lex FULL OUTER JOIN sem
      |    ON lex.query_id = sem.query_id AND lex.doc_id = sem.doc_id)
      |SELECT query_id, CAST(rank AS INT) AS rank, doc_id, rrf,
      |  lex_rank, sem_rank FROM (
      |  SELECT *, row_number() OVER (
      |    PARTITION BY query_id ORDER BY rrf DESC, doc_id) AS rank FROM fused)
      |WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin

  /** q_hybrid_external: the q_hybrid_ivf replay with the query batch
    * RELABELED out of the corpus id space (+10⁶) and NO self-exclusion on
    * either leg — the external-serving semantics of bm25RrfTopKForQueries
    * (query terms are the query documents' distinct terms, identical to the
    * postings-derived sets for those documents).
    */
  private lazy val hybridExternalSql: String =
    """WITH d AS (SELECT doc_id,
      |    string_split_regex(trim(lower(text)), '\s+') AS toks FROM documents),
      |post AS (SELECT doc_id, tok AS term, count(*) AS tf FROM
      |  (SELECT doc_id, unnest(toks) AS tok FROM d) GROUP BY 1, 2),
      |dl AS (SELECT doc_id, len(toks) AS dl FROM d),
      |st AS (SELECT CAST(count(*) AS DOUBLE) AS n,
      |    CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl FROM dl),
      |qt AS (SELECT doc_id + 1000000 AS query_id, term FROM post
      |  WHERE doc_id < 5 AND term <> ''),
      |dfs AS (SELECT term, count(*) AS df FROM post
      |  WHERE term IN (SELECT DISTINCT term FROM qt) GROUP BY term),
      |hit AS (SELECT qt.query_id, p.doc_id, p.term, p.tf
      |  FROM post p JOIN qt ON p.term = qt.term),
      |a AS (SELECT query_id, h.doc_id,
      |    round(ln(1.0 + (n - df + 0.5) / (df + 0.5)) * tf * 2.2
      |      / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl)), 6) AS a
      |  FROM hit h JOIN dfs USING (term) JOIN dl USING (doc_id), st),
      |lex0 AS (SELECT query_id, doc_id, round(sum(a), 6) AS bm25
      |  FROM a GROUP BY 1, 2),
      |lex AS (SELECT query_id, doc_id, CAST(r AS INT) AS lex_rank FROM (
      |    SELECT *, row_number() OVER (
      |      PARTITION BY query_id ORDER BY bm25 DESC, doc_id) AS r FROM lex0)
      |  WHERE r <= 20),""".stripMargin +
    s"""
      |e AS (SELECT vec_id,
      |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
      |n AS (SELECT vec_id, v,
      |    sqrt(list_sum(list_transform(v, x -> x * x))) AS norm FROM e),
      |c AS (SELECT vec_id AS centroid_id, v AS cv, norm AS cnorm FROM n
      |  WHERE vec_id < 16),
      |asg AS (SELECT vec_id, v, norm, centroid_id AS cluster FROM (
      |  SELECT n.vec_id, n.v, n.norm, c.centroid_id,
      |    row_number() OVER (PARTITION BY n.vec_id ORDER BY
      |      ${dotSql("n.v", "c.cv")} / (n.norm * c.cnorm) DESC, c.centroid_id) AS rn
      |  FROM n CROSS JOIN c) WHERE rn = 1),
      |q AS (SELECT vec_id + 1000000 AS query_id, v AS qv, norm AS qnorm FROM n
      |  WHERE vec_id < 5),
      |probes AS (SELECT query_id, qv, qnorm, centroid_id AS cluster FROM (
      |  SELECT q.query_id, q.qv, q.qnorm, c.centroid_id,
      |    row_number() OVER (PARTITION BY q.query_id ORDER BY
      |      ${dotSql("q.qv", "c.cv")} / (q.qnorm * c.cnorm) DESC, c.centroid_id)
      |      AS prn
      |  FROM q CROSS JOIN c) WHERE prn <= 4),
      |cand AS (SELECT p.query_id, a2.vec_id AS doc_id,
      |    round(${dotSql("p.qv", "a2.v")} / (p.qnorm * a2.norm), 4) AS cosine
      |  FROM probes p JOIN asg a2 ON a2.cluster = p.cluster),
      |sem AS (SELECT query_id, doc_id, CAST(r AS INT) AS sem_rank FROM (
      |    SELECT *, row_number() OVER (
      |      PARTITION BY query_id ORDER BY cosine DESC, doc_id) AS r FROM cand)
      |  WHERE r <= 20),
      |fused AS (SELECT coalesce(lex.query_id, sem.query_id) AS query_id,
      |    coalesce(lex.doc_id, sem.doc_id) AS doc_id,
      |    lex.lex_rank, sem.sem_rank,
      |    coalesce(CAST(1.0 AS DOUBLE) / (60 + lex.lex_rank), CAST(0 AS DOUBLE))
      |      + coalesce(CAST(1.0 AS DOUBLE) / (60 + sem.sem_rank), CAST(0 AS DOUBLE))
      |      AS rrf
      |  FROM lex FULL OUTER JOIN sem
      |    ON lex.query_id = sem.query_id AND lex.doc_id = sem.doc_id)
      |SELECT query_id, CAST(rank AS INT) AS rank, doc_id, rrf,
      |  lex_rank, sem_rank FROM (
      |  SELECT *, row_number() OVER (
      |    PARTITION BY query_id ORDER BY rrf DESC, doc_id) AS rank FROM fused)
      |WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin

  /** q_hybrid_bq: the q_hybrid_external lexical leg (exclusion-free BM25 from
    * the relabeled +10⁶ query batch) fused with the BINARY-QUANTIZATION
    * semantic leg — the q_bq_topk replay (integer-exact place-value packing,
    * bit_count(xor) Hamming, shortlist 30 with vec_id tiebreak, 4-dp cosine
    * rerank) with relabeled external queries and NO self-exclusion (plain
    * cross join where the internal gate excludes `vec_id <> query_id`).
    */
  private lazy val hybridBqSql: String =
    """WITH d AS (SELECT doc_id,
      |    string_split_regex(trim(lower(text)), '\s+') AS toks FROM documents),
      |post AS (SELECT doc_id, tok AS term, count(*) AS tf FROM
      |  (SELECT doc_id, unnest(toks) AS tok FROM d) GROUP BY 1, 2),
      |dl AS (SELECT doc_id, len(toks) AS dl FROM d),
      |st AS (SELECT CAST(count(*) AS DOUBLE) AS n,
      |    CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl FROM dl),
      |qt AS (SELECT doc_id + 1000000 AS query_id, term FROM post
      |  WHERE doc_id < 5 AND term <> ''),
      |dfs AS (SELECT term, count(*) AS df FROM post
      |  WHERE term IN (SELECT DISTINCT term FROM qt) GROUP BY term),
      |hit AS (SELECT qt.query_id, p.doc_id, p.term, p.tf
      |  FROM post p JOIN qt ON p.term = qt.term),
      |a AS (SELECT query_id, h.doc_id,
      |    round(ln(1.0 + (n - df + 0.5) / (df + 0.5)) * tf * 2.2
      |      / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl)), 6) AS a
      |  FROM hit h JOIN dfs USING (term) JOIN dl USING (doc_id), st),
      |lex0 AS (SELECT query_id, doc_id, round(sum(a), 6) AS bm25
      |  FROM a GROUP BY 1, 2),
      |lex AS (SELECT query_id, doc_id, CAST(r AS INT) AS lex_rank FROM (
      |    SELECT *, row_number() OVER (
      |      PARTITION BY query_id ORDER BY bm25 DESC, doc_id) AS r FROM lex0)
      |  WHERE r <= 20),
      |e AS (SELECT vec_id,
      |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
      |c AS (SELECT vec_id,
      |    list_transform(range((len(v) - 1) // 32 + 1), w ->
      |      CAST(list_sum(list_transform(range(32), b ->
      |        CASE WHEN v[w * 32 + b + 1] > 0
      |          THEN (CAST(1 AS BIGINT) << b) ELSE 0 END)) AS BIGINT)) AS code
      |  FROM e),
      |qc AS (SELECT vec_id + 1000000 AS query_id, code AS qcode FROM c
      |  WHERE vec_id < 5),
      |h AS (SELECT qc.query_id, c.vec_id,
      |    CAST(list_sum(list_transform(range(len(c.code)), i ->
      |      bit_count(xor(c.code[i + 1], qc.qcode[i + 1])))) AS BIGINT) AS hamming
      |  FROM c CROSS JOIN qc),
      |sl AS (SELECT query_id, vec_id FROM (
      |    SELECT *, row_number() OVER (PARTITION BY query_id
      |      ORDER BY hamming, vec_id) AS sr FROM h) WHERE sr <= 30),
      |n AS (SELECT vec_id, v,
      |    sqrt(list_sum(list_transform(v, x -> x * x))) AS norm FROM e),
      |q AS (SELECT vec_id + 1000000 AS query_id, v AS qv, norm AS qnorm FROM n
      |  WHERE vec_id < 5),
      |s AS (SELECT sl.query_id, sl.vec_id,
      |    round(list_sum(list_transform(list_zip(q.qv, n.v),
      |      p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
      |      / (q.qnorm * n.norm), 4) AS cosine
      |  FROM sl JOIN n ON n.vec_id = sl.vec_id
      |    JOIN q ON q.query_id = sl.query_id),
      |sem AS (SELECT query_id, vec_id AS doc_id, CAST(r AS INT) AS sem_rank FROM (
      |    SELECT *, row_number() OVER (
      |      PARTITION BY query_id ORDER BY cosine DESC, vec_id) AS r FROM s)
      |  WHERE r <= 20),
      |fused AS (SELECT coalesce(lex.query_id, sem.query_id) AS query_id,
      |    coalesce(lex.doc_id, sem.doc_id) AS doc_id,
      |    lex.lex_rank, sem.sem_rank,
      |    coalesce(CAST(1.0 AS DOUBLE) / (60 + lex.lex_rank), CAST(0 AS DOUBLE))
      |      + coalesce(CAST(1.0 AS DOUBLE) / (60 + sem.sem_rank), CAST(0 AS DOUBLE))
      |      AS rrf
      |  FROM lex FULL OUTER JOIN sem
      |    ON lex.query_id = sem.query_id AND lex.doc_id = sem.doc_id)
      |SELECT query_id, CAST(rank AS INT) AS rank, doc_id, rrf,
      |  lex_rank, sem_rank FROM (
      |  SELECT *, row_number() OVER (
      |    PARTITION BY query_id ORDER BY rrf DESC, doc_id) AS rank FROM fused)
      |WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin

  /** q_hybrid_pq: the q_hybrid_external lexical leg (exclusion-free BM25 from
    * the relabeled +10⁶ query batch) fused with the IVFADC semantic leg — the
    * q_ivfpq_topk replay (seeded codebooks: coarse = vectors 0-7, residual
    * codewords = residual slices of vectors 8-15; assignment/encode argmins;
    * explicit left-to-right ADC chain on the 4-dp grid) with relabeled
    * external queries, legK = 20 cut, and NO self-exclusion anywhere.
    */
  private lazy val hybridPqSql: String = {
    def term(j: Int): String =
      s"list_sum(list_transform(list_zip(c2.qr[${j * 16 + 1} : ${(j + 1) * 16}], " +
        s"p$j.pcw), z -> (z[1] - z[2]) * (z[1] - z[2])))"
    val adist = s"(((${term(0)} + ${term(1)}) + ${term(2)}) + ${term(3)})"
    """WITH d AS (SELECT doc_id,
      |    string_split_regex(trim(lower(text)), '\s+') AS toks FROM documents),
      |post AS (SELECT doc_id, tok AS term, count(*) AS tf FROM
      |  (SELECT doc_id, unnest(toks) AS tok FROM d) GROUP BY 1, 2),
      |dl AS (SELECT doc_id, len(toks) AS dl FROM d),
      |st AS (SELECT CAST(count(*) AS DOUBLE) AS n,
      |    CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl FROM dl),
      |qt AS (SELECT doc_id + 1000000 AS query_id, term FROM post
      |  WHERE doc_id < 5 AND term <> ''),
      |dfs AS (SELECT term, count(*) AS df FROM post
      |  WHERE term IN (SELECT DISTINCT term FROM qt) GROUP BY term),
      |hit AS (SELECT qt.query_id, p.doc_id, p.term, p.tf
      |  FROM post p JOIN qt ON p.term = qt.term),
      |a AS (SELECT query_id, h.doc_id,
      |    round(ln(1.0 + (n - df + 0.5) / (df + 0.5)) * tf * 2.2
      |      / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl)), 6) AS a
      |  FROM hit h JOIN dfs USING (term) JOIN dl USING (doc_id), st),
      |lex0 AS (SELECT query_id, doc_id, round(sum(a), 6) AS bm25
      |  FROM a GROUP BY 1, 2),
      |lex AS (SELECT query_id, doc_id, CAST(r AS INT) AS lex_rank FROM (
      |    SELECT *, row_number() OVER (
      |      PARTITION BY query_id ORDER BY bm25 DESC, doc_id) AS r FROM lex0)
      |  WHERE r <= 20),
      |e AS (SELECT vec_id,
      |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
      |cc AS (SELECT vec_id AS cluster, v AS cw FROM e WHERE vec_id < 8),
      |asg AS (SELECT vec_id, v, cluster, cw FROM (
      |    SELECT e.vec_id, e.v, cc.cluster, cc.cw,
      |      row_number() OVER (PARTITION BY e.vec_id ORDER BY
      |        list_sum(list_transform(list_zip(e.v, cc.cw),
      |          z -> (z[1] - z[2]) * (z[1] - z[2]))) ASC, cc.cluster) AS rn
      |    FROM e CROSS JOIN cc) WHERE rn = 1),
      |res AS (SELECT vec_id, cluster,
      |    list_transform(list_zip(v, cw), z -> z[1] - z[2]) AS rv FROM asg),
      |pq AS (SELECT j, vec_id - 8 AS code,
      |    rv[j * 16 + 1 : j * 16 + 16] AS pcw
      |  FROM res, (SELECT unnest(range(4)) AS j) js
      |  WHERE vec_id >= 8 AND vec_id < 16),
      |enc AS (SELECT vec_id, j, code FROM (
      |    SELECT r.vec_id, p.j, p.code,
      |      row_number() OVER (PARTITION BY r.vec_id, p.j ORDER BY
      |        list_sum(list_transform(
      |          list_zip(r.rv[p.j * 16 + 1 : p.j * 16 + 16], p.pcw),
      |          z -> (z[1] - z[2]) * (z[1] - z[2]))) ASC, p.code) AS rn
      |    FROM res r CROSS JOIN pq p) WHERE rn = 1),
      |q AS (SELECT vec_id + 1000000 AS query_id, v AS qv FROM e
      |  WHERE vec_id < 5),
      |probes AS (SELECT query_id, qv, cluster, cw FROM (
      |    SELECT q.query_id, q.qv, cc.cluster, cc.cw,
      |      row_number() OVER (PARTITION BY q.query_id ORDER BY
      |        list_sum(list_transform(list_zip(q.qv, cc.cw),
      |          z -> (z[1] - z[2]) * (z[1] - z[2]))) ASC, cc.cluster) AS prn
      |    FROM q CROSS JOIN cc) WHERE prn <= 4),
      |cand AS (SELECT pr.query_id, a2.vec_id,
      |    list_transform(list_zip(pr.qv, pr.cw), z -> z[1] - z[2]) AS qr
      |  FROM probes pr JOIN asg a2 ON a2.cluster = pr.cluster),
      |""".stripMargin +
    s"""ad AS (SELECT c2.query_id, c2.vec_id, round($adist, 4) AS adist
      |  FROM cand c2
      |  JOIN enc e0 ON e0.vec_id = c2.vec_id AND e0.j = 0
      |  JOIN pq p0 ON p0.j = 0 AND p0.code = e0.code
      |  JOIN enc e1 ON e1.vec_id = c2.vec_id AND e1.j = 1
      |  JOIN pq p1 ON p1.j = 1 AND p1.code = e1.code
      |  JOIN enc e2 ON e2.vec_id = c2.vec_id AND e2.j = 2
      |  JOIN pq p2 ON p2.j = 2 AND p2.code = e2.code
      |  JOIN enc e3 ON e3.vec_id = c2.vec_id AND e3.j = 3
      |  JOIN pq p3 ON p3.j = 3 AND p3.code = e3.code),
      |sem AS (SELECT query_id, vec_id AS doc_id, CAST(r AS INT) AS sem_rank
      |  FROM (SELECT *, row_number() OVER (
      |      PARTITION BY query_id ORDER BY adist ASC, vec_id) AS r FROM ad)
      |  WHERE r <= 20),
      |fused AS (SELECT coalesce(lex.query_id, sem.query_id) AS query_id,
      |    coalesce(lex.doc_id, sem.doc_id) AS doc_id,
      |    lex.lex_rank, sem.sem_rank,
      |    coalesce(CAST(1.0 AS DOUBLE) / (60 + lex.lex_rank), CAST(0 AS DOUBLE))
      |      + coalesce(CAST(1.0 AS DOUBLE) / (60 + sem.sem_rank), CAST(0 AS DOUBLE))
      |      AS rrf
      |  FROM lex FULL OUTER JOIN sem
      |    ON lex.query_id = sem.query_id AND lex.doc_id = sem.doc_id)
      |SELECT query_id, CAST(rank AS INT) AS rank, doc_id, rrf,
      |  lex_rank, sem_rank FROM (
      |  SELECT *, row_number() OVER (
      |    PARTITION BY query_id ORDER BY rrf DESC, doc_id) AS rank FROM fused)
      |WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin
  }

  /** q_ivfpq_sql: [[ivfPqTopkSql]]'s seeded IVFADC chain with the EXTERNAL
    * serving semantics — queries relabeled +10⁶ and NO self-exclusion in the
    * candidate set (the [[SqlRecipes.ivfPqForQueriesSql]] contract) — 4-dp
    * grid, (adist ASC, vec_id) ties.
    */
  private lazy val ivfPqExternalSql: String = {
    def term(j: Int): String =
      s"list_sum(list_transform(list_zip(c2.qr[${j * 16 + 1} : ${(j + 1) * 16}], " +
        s"p$j.pcw), z -> (z[1] - z[2]) * (z[1] - z[2])))"
    val adist = s"(((${term(0)} + ${term(1)}) + ${term(2)}) + ${term(3)})"
    """WITH e AS (SELECT vec_id,
      |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
      |cc AS (SELECT vec_id AS cluster, v AS cw FROM e WHERE vec_id < 8),
      |asg AS (SELECT vec_id, v, cluster, cw FROM (
      |    SELECT e.vec_id, e.v, cc.cluster, cc.cw,
      |      row_number() OVER (PARTITION BY e.vec_id ORDER BY
      |        list_sum(list_transform(list_zip(e.v, cc.cw),
      |          z -> (z[1] - z[2]) * (z[1] - z[2]))) ASC, cc.cluster) AS rn
      |    FROM e CROSS JOIN cc) WHERE rn = 1),
      |res AS (SELECT vec_id, cluster,
      |    list_transform(list_zip(v, cw), z -> z[1] - z[2]) AS rv FROM asg),
      |pq AS (SELECT j, vec_id - 8 AS code,
      |    rv[j * 16 + 1 : j * 16 + 16] AS pcw
      |  FROM res, (SELECT unnest(range(4)) AS j) js
      |  WHERE vec_id >= 8 AND vec_id < 16),
      |enc AS (SELECT vec_id, j, code FROM (
      |    SELECT r.vec_id, p.j, p.code,
      |      row_number() OVER (PARTITION BY r.vec_id, p.j ORDER BY
      |        list_sum(list_transform(
      |          list_zip(r.rv[p.j * 16 + 1 : p.j * 16 + 16], p.pcw),
      |          z -> (z[1] - z[2]) * (z[1] - z[2]))) ASC, p.code) AS rn
      |    FROM res r CROSS JOIN pq p) WHERE rn = 1),
      |q AS (SELECT vec_id + 1000000 AS query_id, v AS qv FROM e
      |  WHERE vec_id < 5),
      |probes AS (SELECT query_id, qv, cluster, cw FROM (
      |    SELECT q.query_id, q.qv, cc.cluster, cc.cw,
      |      row_number() OVER (PARTITION BY q.query_id ORDER BY
      |        list_sum(list_transform(list_zip(q.qv, cc.cw),
      |          z -> (z[1] - z[2]) * (z[1] - z[2]))) ASC, cc.cluster) AS prn
      |    FROM q CROSS JOIN cc) WHERE prn <= 4),
      |cand AS (SELECT pr.query_id, a2.vec_id,
      |    list_transform(list_zip(pr.qv, pr.cw), z -> z[1] - z[2]) AS qr
      |  FROM probes pr JOIN asg a2 ON a2.cluster = pr.cluster),
      |""".stripMargin +
    s"""ad AS (SELECT c2.query_id, c2.vec_id, round($adist, 4) AS adist
      |  FROM cand c2
      |  JOIN enc e0 ON e0.vec_id = c2.vec_id AND e0.j = 0
      |  JOIN pq p0 ON p0.j = 0 AND p0.code = e0.code
      |  JOIN enc e1 ON e1.vec_id = c2.vec_id AND e1.j = 1
      |  JOIN pq p1 ON p1.j = 1 AND p1.code = e1.code
      |  JOIN enc e2 ON e2.vec_id = c2.vec_id AND e2.j = 2
      |  JOIN pq p2 ON p2.j = 2 AND p2.code = e2.code
      |  JOIN enc e3 ON e3.vec_id = c2.vec_id AND e3.j = 3
      |  JOIN pq p3 ON p3.j = 3 AND p3.code = e3.code)
      |SELECT query_id, CAST(rank AS INT) AS rank, vec_id,
      |  adist AS approx_sq_dist FROM (
      |  SELECT *, row_number() OVER (
      |    PARTITION BY query_id ORDER BY adist ASC, vec_id) AS rank FROM ad)
      |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin
  }

  /** q_ivfpq_topk: IVFADC replayed end-to-end in DuckDB off the seeded
    * codebooks — coarse centroids = vectors 0-7 (argmin L2, cluster-id ties),
    * residual codewords = residual slices of vectors 8-15 (16 dims per
    * subspace at d=64, m=4), per-subspace encode argmin (code-id ties),
    * nprobe=4 probe ranking, and the ADC sum written as the explicit
    * left-to-right chain ((t0+t1)+t2)+t3 so the float result is bit-stable,
    * rounded to 4 dp BEFORE ranking with vec_id ties — exactly the Spark
    * operator's grid.
    */
  private lazy val ivfPqTopkSql: String = {
    def term(j: Int): String =
      s"list_sum(list_transform(list_zip(c.qr[${j * 16 + 1} : ${(j + 1) * 16}], " +
        s"p$j.pcw), z -> (z[1] - z[2]) * (z[1] - z[2])))"
    val adist = s"(((${term(0)} + ${term(1)}) + ${term(2)}) + ${term(3)})"
    """WITH e AS (SELECT vec_id,
      |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
      |cc AS (SELECT vec_id AS cluster, v AS cw FROM e WHERE vec_id < 8),
      |asg AS (SELECT vec_id, v, cluster, cw FROM (
      |    SELECT e.vec_id, e.v, cc.cluster, cc.cw,
      |      row_number() OVER (PARTITION BY e.vec_id ORDER BY
      |        list_sum(list_transform(list_zip(e.v, cc.cw),
      |          z -> (z[1] - z[2]) * (z[1] - z[2]))) ASC, cc.cluster) AS rn
      |    FROM e CROSS JOIN cc) WHERE rn = 1),
      |res AS (SELECT vec_id, cluster,
      |    list_transform(list_zip(v, cw), z -> z[1] - z[2]) AS rv FROM asg),
      |pq AS (SELECT j, vec_id - 8 AS code,
      |    rv[j * 16 + 1 : j * 16 + 16] AS pcw
      |  FROM res, (SELECT unnest(range(4)) AS j) js
      |  WHERE vec_id >= 8 AND vec_id < 16),
      |enc AS (SELECT vec_id, j, code FROM (
      |    SELECT r.vec_id, p.j, p.code,
      |      row_number() OVER (PARTITION BY r.vec_id, p.j ORDER BY
      |        list_sum(list_transform(
      |          list_zip(r.rv[p.j * 16 + 1 : p.j * 16 + 16], p.pcw),
      |          z -> (z[1] - z[2]) * (z[1] - z[2]))) ASC, p.code) AS rn
      |    FROM res r CROSS JOIN pq p) WHERE rn = 1),
      |q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 5),
      |probes AS (SELECT query_id, qv, cluster, cw FROM (
      |    SELECT q.query_id, q.qv, cc.cluster, cc.cw,
      |      row_number() OVER (PARTITION BY q.query_id ORDER BY
      |        list_sum(list_transform(list_zip(q.qv, cc.cw),
      |          z -> (z[1] - z[2]) * (z[1] - z[2]))) ASC, cc.cluster) AS prn
      |    FROM q CROSS JOIN cc) WHERE prn <= 4),
      |cand AS (SELECT pr.query_id, a.vec_id,
      |    list_transform(list_zip(pr.qv, pr.cw), z -> z[1] - z[2]) AS qr
      |  FROM probes pr JOIN asg a
      |    ON a.cluster = pr.cluster AND a.vec_id <> pr.query_id),
      |""".stripMargin +
    s"""ad AS (SELECT c.query_id, c.vec_id, round($adist, 4) AS adist
      |  FROM cand c
      |  JOIN enc e0 ON e0.vec_id = c.vec_id AND e0.j = 0
      |  JOIN pq p0 ON p0.j = 0 AND p0.code = e0.code
      |  JOIN enc e1 ON e1.vec_id = c.vec_id AND e1.j = 1
      |  JOIN pq p1 ON p1.j = 1 AND p1.code = e1.code
      |  JOIN enc e2 ON e2.vec_id = c.vec_id AND e2.j = 2
      |  JOIN pq p2 ON p2.j = 2 AND p2.code = e2.code
      |  JOIN enc e3 ON e3.vec_id = c.vec_id AND e3.j = 3
      |  JOIN pq p3 ON p3.j = 3 AND p3.code = e3.code)
      |SELECT query_id, CAST(rank AS INT) AS rank, vec_id,
      |  adist AS approx_sq_dist FROM (
      |  SELECT *, row_number() OVER (
      |    PARTITION BY query_id ORDER BY adist ASC, vec_id) AS rank FROM ad)
      |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin
  }

  /** q_pq_drift: [[ivfPqTopkSql]]'s seeded assignment / residual / encode
    * CTEs, but keeping each subspace argmin's winning DISTANCE — summed per
    * vector in the explicit j order as the quantization error, then the
    * identical drift algebra as q_ivf_drift (qerr4 exact-integer sums on the
    * dense batch×cluster grid, epsilon-floored PSI on an 8-dp grid, 6-dp
    * totals) with batches b0 = vec_id < 300, b1 = rest.
    */
  private lazy val pqDriftSql: String =
    """WITH e AS (SELECT vec_id,
      |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
      |cc AS (SELECT vec_id AS cluster, v AS cw FROM e WHERE vec_id < 8),
      |asg AS (SELECT vec_id, v, cluster, cw FROM (
      |    SELECT e.vec_id, e.v, cc.cluster, cc.cw,
      |      row_number() OVER (PARTITION BY e.vec_id ORDER BY
      |        list_sum(list_transform(list_zip(e.v, cc.cw),
      |          z -> (z[1] - z[2]) * (z[1] - z[2]))) ASC, cc.cluster) AS rn
      |    FROM e CROSS JOIN cc) WHERE rn = 1),
      |res AS (SELECT vec_id, cluster,
      |    list_transform(list_zip(v, cw), z -> z[1] - z[2]) AS rv FROM asg),
      |pq AS (SELECT j, vec_id - 8 AS code,
      |    rv[j * 16 + 1 : j * 16 + 16] AS pcw
      |  FROM res, (SELECT unnest(range(4)) AS j) js
      |  WHERE vec_id >= 8 AND vec_id < 16),
      |encd AS (SELECT vec_id, j, d FROM (
      |    SELECT r.vec_id, p.j,
      |      list_sum(list_transform(
      |        list_zip(r.rv[p.j * 16 + 1 : p.j * 16 + 16], p.pcw),
      |        z -> (z[1] - z[2]) * (z[1] - z[2]))) AS d,
      |      row_number() OVER (PARTITION BY r.vec_id, p.j ORDER BY
      |        list_sum(list_transform(
      |          list_zip(r.rv[p.j * 16 + 1 : p.j * 16 + 16], p.pcw),
      |          z -> (z[1] - z[2]) * (z[1] - z[2]))) ASC, p.code) AS rn
      |    FROM res r CROSS JOIN pq p) WHERE rn = 1),
      |qe AS (SELECT v0.vec_id, (((v0.d + v1.d) + v2.d) + v3.d) AS qerr
      |  FROM (SELECT vec_id, d FROM encd WHERE j = 0) v0
      |  JOIN (SELECT vec_id, d FROM encd WHERE j = 1) v1 USING (vec_id)
      |  JOIN (SELECT vec_id, d FROM encd WHERE j = 2) v2 USING (vec_id)
      |  JOIN (SELECT vec_id, d FROM encd WHERE j = 3) v3 USING (vec_id)),
      |lab AS (SELECT CASE WHEN qe.vec_id < 300 THEN 'b0' ELSE 'b1' END AS batch,
      |    a.cluster, CAST(round(qe.qerr * 10000) AS BIGINT) AS qerr4
      |  FROM qe JOIN asg a ON a.vec_id = qe.vec_id),
      |qual AS (SELECT batch, cluster, count(*) AS n_vecs, sum(qerr4) AS sum_qerr4
      |  FROM lab GROUP BY 1, 2),
      |batches AS (SELECT DISTINCT batch FROM qual),
      |grid AS (SELECT b.batch, cc.cluster,
      |    coalesce(q.n_vecs, 0) AS n_vecs, coalesce(q.sum_qerr4, 0) AS sum_qerr4
      |  FROM batches b CROSS JOIN cc LEFT JOIN qual q
      |    ON q.batch = b.batch AND q.cluster = cc.cluster),
      |wt AS (SELECT *, sum(n_vecs) OVER (PARTITION BY batch) AS tot FROM grid),
      |fr AS (SELECT batch, cluster, n_vecs, sum_qerr4,
      |    greatest(CAST(n_vecs AS DOUBLE) / tot, 1e-6) AS frac FROM wt),
      |base AS (SELECT cluster, frac AS base_frac FROM fr WHERE batch = 'b0'),
      |t AS (SELECT fr.batch, fr.n_vecs, fr.sum_qerr4,
      |    round((fr.frac - base.base_frac) * ln(fr.frac / base.base_frac), 8)
      |      AS psi_term
      |  FROM fr JOIN base USING (cluster))
      |SELECT batch, CAST(sum(n_vecs) AS BIGINT) AS n_vecs,
      |  round(CAST(sum(sum_qerr4) AS DOUBLE) / (10000.0 * sum(n_vecs)), 6)
      |    AS mean_qerr,
      |  round(sum(psi_term), 6) AS psi
      |FROM t GROUP BY batch ORDER BY batch""".stripMargin

  /** q_ivf_drift: the same deterministic assignment argmax as q_ivf_topk,
    * labeled by batch (vec_id < 300 = b0), per-(batch, cluster) exact-integer
    * occupancy and cos4 sums on the dense batch×centroid grid, epsilon-floored
    * PSI terms on an 8-dp grid, totals rounded to 6 dp.
    */
  private lazy val ivfDriftSql: String =
    s"""WITH e AS (SELECT vec_id,
      |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
      |n AS (SELECT vec_id, v,
      |    sqrt(list_sum(list_transform(v, x -> x * x))) AS norm FROM e),
      |c AS (SELECT vec_id AS centroid_id, v AS cv, norm AS cnorm FROM n
      |  WHERE vec_id < 16),
      |asg AS (SELECT vec_id, cluster, acos FROM (
      |  SELECT n.vec_id, c.centroid_id AS cluster,
      |    ${dotSql("n.v", "c.cv")} / (n.norm * c.cnorm) AS acos,
      |    row_number() OVER (PARTITION BY n.vec_id ORDER BY
      |      ${dotSql("n.v", "c.cv")} / (n.norm * c.cnorm) DESC, c.centroid_id) AS rn
      |  FROM n CROSS JOIN c) WHERE rn = 1),
      |lab AS (SELECT CASE WHEN vec_id < 300 THEN 'b0' ELSE 'b1' END AS batch,
      |    cluster, CAST(round(acos * 10000) AS BIGINT) AS cos4 FROM asg),
      |qual AS (SELECT batch, cluster, count(*) AS n_vecs, sum(cos4) AS sum_cos4
      |  FROM lab GROUP BY 1, 2),
      |batches AS (SELECT DISTINCT batch FROM qual),
      |grid AS (SELECT b.batch, c.centroid_id AS cluster,
      |    coalesce(q.n_vecs, 0) AS n_vecs, coalesce(q.sum_cos4, 0) AS sum_cos4
      |  FROM batches b CROSS JOIN c LEFT JOIN qual q
      |    ON q.batch = b.batch AND q.cluster = c.centroid_id),
      |wt AS (SELECT *, sum(n_vecs) OVER (PARTITION BY batch) AS tot FROM grid),
      |fr AS (SELECT batch, cluster, n_vecs, sum_cos4,
      |    greatest(CAST(n_vecs AS DOUBLE) / tot, 1e-6) AS frac FROM wt),
      |base AS (SELECT cluster, frac AS base_frac FROM fr WHERE batch = 'b0'),
      |t AS (SELECT fr.batch, fr.n_vecs, fr.sum_cos4,
      |    round((fr.frac - base.base_frac) * ln(fr.frac / base.base_frac), 8)
      |      AS psi_term
      |  FROM fr JOIN base USING (cluster))
      |SELECT batch, CAST(sum(n_vecs) AS BIGINT) AS n_vecs,
      |  round(CAST(sum(sum_cos4) AS DOUBLE) / (10000.0 * sum(n_vecs)), 6)
      |    AS mean_cos,
      |  round(sum(psi_term), 6) AS psi
      |FROM t GROUP BY batch ORDER BY batch""".stripMargin

  private val ivfTopkSql: String =
    s"""WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       |  FROM embeddings),
       |n AS (SELECT vec_id, v, sqrt(list_sum(list_transform(v, x -> x * x))) AS norm
       |  FROM e),
       |c AS (SELECT vec_id AS centroid_id, v AS cv, norm AS cnorm FROM n
       |  WHERE vec_id < 16),
       |a AS (SELECT vec_id, v, norm, centroid_id AS cluster FROM (
       |  SELECT n.vec_id, n.v, n.norm, c.centroid_id,
       |    row_number() OVER (PARTITION BY n.vec_id ORDER BY
       |      ${dotSql("n.v", "c.cv")} / (n.norm * c.cnorm) DESC, c.centroid_id) AS rn
       |  FROM n CROSS JOIN c) WHERE rn = 1),
       |q AS (SELECT vec_id AS query_id, v AS qv, norm AS qnorm FROM n
       |  WHERE vec_id < 10),
       |probes AS (SELECT query_id, qv, qnorm, centroid_id AS cluster FROM (
       |  SELECT q.query_id, q.qv, q.qnorm, c.centroid_id,
       |    row_number() OVER (PARTITION BY q.query_id ORDER BY
       |      ${dotSql("q.qv", "c.cv")} / (q.qnorm * c.cnorm) DESC, c.centroid_id)
       |      AS prn
       |  FROM q CROSS JOIN c) WHERE prn <= 4),
       |cand AS (SELECT p.query_id, a.vec_id,
       |    round(${dotSql("p.qv", "a.v")} / (p.qnorm * a.norm), 4) AS cosine
       |  FROM probes p JOIN a ON a.cluster = p.cluster AND a.vec_id <> p.query_id)
       |SELECT query_id, rank, vec_id, cosine FROM (
       |  SELECT *, CAST(row_number() OVER (
       |    PARTITION BY query_id ORDER BY cosine DESC, vec_id) AS INT) AS rank
       |  FROM cand)
       |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin

  /** [[graft.ops.SemanticDedup.pairs]] replayed in DuckDB: seed centroids are the 8
    * lowest-id vectors, assignment argmax by (cosine DESC, centroid_id) exactly as
    * [[graft.ops.Ivf.assign]] tie-breaks, then intra-cluster pairs at cosine ≥ 0.45.
    */
  private val semanticDedupSql: String =
    s"""WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       |  FROM embeddings),
       |n AS (SELECT vec_id, v, sqrt(list_sum(list_transform(v, x -> x * x))) AS norm
       |  FROM e),
       |c AS (SELECT vec_id AS centroid_id, v AS cv, norm AS cnorm FROM n
       |  WHERE vec_id < 8),
       |a AS (SELECT vec_id, v, norm, centroid_id AS cluster FROM (
       |  SELECT n.vec_id, n.v, n.norm, c.centroid_id,
       |    row_number() OVER (PARTITION BY n.vec_id ORDER BY
       |      ${dotSql("n.v", "c.cv")} / (n.norm * c.cnorm) DESC, c.centroid_id) AS rn
       |  FROM n CROSS JOIN c) WHERE rn = 1),
       |p AS (SELECT l.cluster, l.vec_id AS vec_a, r.vec_id AS vec_b,
       |    round(${dotSql("l.v", "r.v")} / (l.norm * r.norm), 4) AS cosine
       |  FROM a l JOIN a r ON l.cluster = r.cluster AND l.vec_id < r.vec_id)
       |SELECT cluster, vec_a, vec_b, cosine FROM p WHERE cosine >= 0.45
       |ORDER BY vec_a, vec_b""".stripMargin

  /** [[graft.ops.Dedup.contamination]] replayed in DuckDB: corpus shingles df-capped,
    * reference = doc_id < 20 (uncapped), containment = n_common / ref_shingles ≥ 0.5.
    */
  private val contaminationSql: String =
    """WITH toks AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS tk
      |  FROM documents),
      |t AS (SELECT doc_id, CASE WHEN len(tk) >= 3 THEN
      |    list_distinct(list_transform(generate_series(1, len(tk) - 2),
      |      i -> array_to_string(tk[i:i+2], ' ')))
      |    ELSE [] END AS shs FROM toks),
      |sh AS (SELECT doc_id, unnest(shs) AS shingle FROM t),
      |kept AS (SELECT sh.* FROM sh JOIN (
      |  SELECT shingle FROM sh GROUP BY shingle HAVING COUNT(*) <= 1000) k
      |  USING (shingle)),
      |refsh AS (SELECT doc_id AS ref_doc, shingle FROM sh WHERE doc_id < 20),
      |refsize AS (SELECT ref_doc, COUNT(*) AS ref_shingles FROM refsh GROUP BY 1),
      |common AS (SELECT kept.doc_id AS corpus_doc, refsh.ref_doc, COUNT(*) AS n_common
      |  FROM kept JOIN refsh USING (shingle) GROUP BY 1, 2)
      |SELECT corpus_doc, ref_doc, n_common, ref_shingles,
      |  CAST(n_common AS DOUBLE) / ref_shingles AS containment
      |FROM common JOIN refsize USING (ref_doc)
      |WHERE CAST(n_common AS DOUBLE) / ref_shingles >= 0.5
      |ORDER BY corpus_doc, ref_doc""".stripMargin

  /** [[graft.ops.TextAnalysis.repetitionStats]] replayed in DuckDB. */
  private val repetitionSql: String =
    """WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS tk
      |  FROM documents),
      |tok AS (SELECT doc_id, unnest(tk) AS token FROM t),
      |tc AS (SELECT doc_id, token, COUNT(*) AS c FROM tok GROUP BY 1, 2),
      |ts AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_tokens,
      |    COUNT(*) AS n_distinct_tokens, MAX(c) AS top FROM tc GROUP BY 1),
      |bg AS (SELECT doc_id, unnest(CASE WHEN len(tk) >= 2 THEN
      |    list_transform(generate_series(1, len(tk) - 1), i -> tk[i] || ' ' || tk[i+1])
      |    ELSE [] END) AS b FROM t),
      |bs AS (SELECT doc_id, COUNT(*) AS n_bigrams,
      |    COUNT(DISTINCT b) AS n_distinct_bigrams FROM bg GROUP BY 1)
      |SELECT ts.doc_id, ts.n_tokens, ts.n_distinct_tokens,
      |  CAST(ts.n_distinct_tokens AS DOUBLE) / ts.n_tokens AS distinct_ratio,
      |  CAST(ts.top AS DOUBLE) / ts.n_tokens AS top_token_ratio,
      |  CASE WHEN bs.n_bigrams IS NULL OR bs.n_bigrams = 0 THEN 0.0
      |    ELSE 1.0 - CAST(bs.n_distinct_bigrams AS DOUBLE) / bs.n_bigrams END
      |    AS rep_bigram_ratio
      |FROM ts LEFT JOIN bs USING (doc_id) ORDER BY doc_id""".stripMargin

  private val embeddingNearDupSql: String =
    s"""WITH ${lshSigCtes(tables = 8, planesPerTable = 4)},
       |cand AS (SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b,
       |    round(list_sum(list_transform(list_zip(a.v, b.v),
       |      z -> CAST(z[1] AS DOUBLE) * CAST(z[2] AS DOUBLE))) / (a.norm * b.norm), 4)
       |      AS cosine
       |  FROM sigs a JOIN sigs b
       |  ON a.t = b.t AND a.sig = b.sig AND a.vec_id < b.vec_id)
       |SELECT vec_a, vec_b, cosine FROM cand WHERE cosine >= 0.45
       |ORDER BY vec_a, vec_b""".stripMargin

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] = Map(
    "q_daily_sales" -> dailySalesSql("COUNT(o.customer_id)"),
    "q_daily_sales_distinct" -> dailySalesSql("COUNT(DISTINCT o.customer_id)"),
    "q_clv" ->
      s"""WITH o AS ($oSql), c AS ($cSql),
         |m AS (
         |  SELECT customer_id, COUNT(order_id) AS total_orders,
         |    CAST(SUM(CAST(order_amount AS DECIMAL(18,2))) AS DOUBLE) AS lifetime_value,
         |    CAST(SUM(CAST(order_amount AS DECIMAL(18,2))) AS DOUBLE) / COUNT(order_id)
         |      AS avg_order_value,
         |    MIN(order_date) AS first_ts, MAX(order_date) AS last_ts
         |  FROM o GROUP BY customer_id)
         |SELECT m.customer_id AS customer_id, c.name AS name, c.email AS email,
         |  c.region AS region, m.total_orders, m.lifetime_value, m.avg_order_value,
         |  c.customer_tenure_days AS customer_tenure_days,
         |  date_diff('day', CAST(m.first_ts AS DATE), CAST(m.last_ts AS DATE))
         |    / m.total_orders AS avg_days_between_orders,
         |  CAST(m.first_ts AS DATE) AS first_order_date,
         |  CAST(m.last_ts AS DATE) AS last_order_date
         |FROM m JOIN c ON m.customer_id = c.customer_id
         |ORDER BY customer_id""".stripMargin,
    "q_latest_order_per_customer" ->
      s"""WITH o AS ($oSql)
         |SELECT customer_id, order_id, CAST(order_date AS DATE) AS order_date, order_amount
         |FROM o
         |QUALIFY row_number() OVER (
         |  PARTITION BY customer_id ORDER BY order_date DESC, order_id DESC) = 1
         |ORDER BY customer_id""".stripMargin,
    "q_orphan_orders" ->
      s"""WITH o AS ($oSql), c AS ($cSql)
         |SELECT order_id, customer_id FROM o
         |WHERE NOT EXISTS (SELECT 1 FROM c
         |  WHERE c.customer_id = o.customer_id AND c.customer_id % 3 <> 0)
         |ORDER BY order_id""".stripMargin,
    "q_cdc_flatten" ->
      """SELECT o_orderkey AS order_id, CAST(o_orderdate AS DATE) AS order_date,
        |  CAST(CAST(o_totalprice AS DECIMAL(10,2)) AS DOUBLE) AS order_amount,
        |  o_custkey AS customer_id
        |FROM orders ORDER BY order_id""".stripMargin,
    "q_dq_report" -> dqReportSql,
    "q_text_stats" -> textStatsSql,
    "q_quality_score" -> qualityScoreSql,
    "q_pagerank" -> pageRankSql,
    "q_gopher_rules" -> gopherRulesSql,
    // PSI replay: identical bin chain (count of edges <= value), fraction math,
    // epsilon floor and ln argument order, rounded to 6 decimals
    "q_drift" -> {
      val binExpr = (1 to 9).map(e =>
        s"CASE WHEN o_totalprice >= ${e * 50000.0} THEN 1 ELSE 0 END")
        .mkString("(", " + ", ")")
      s"""WITH b AS (
         |  SELECT $binExpr AS bin, COUNT(*) AS base_n FROM orders
         |  WHERE o_totalprice IS NOT NULL
         |    AND o_orderdate < TIMESTAMP '1998-01-01' GROUP BY 1),
         |c AS (
         |  SELECT $binExpr AS bin, COUNT(*) AS cur_n FROM orders
         |  WHERE o_totalprice IS NOT NULL
         |    AND o_orderdate >= TIMESTAMP '1998-01-01' GROUP BY 1),
         |j AS (
         |  SELECT COALESCE(b.bin, c.bin) AS bin,
         |    CAST(COALESCE(base_n, 0) AS BIGINT) AS base_n,
         |    CAST(COALESCE(cur_n, 0) AS BIGINT) AS cur_n
         |  FROM b FULL OUTER JOIN c ON b.bin = c.bin),
         |t AS (SELECT CAST(SUM(base_n) AS DOUBLE) AS bt,
         |  CAST(SUM(cur_n) AS DOUBLE) AS ct FROM j)
         |SELECT bin, base_n, cur_n,
         |  round((greatest(cur_n / ct, 1e-6) - greatest(base_n / bt, 1e-6))
         |    * ln(greatest(cur_n / ct, 1e-6) / greatest(base_n / bt, 1e-6)), 6)
         |    AS psi_term
         |FROM j, t ORDER BY bin""".stripMargin
    },
    // categorical PSI over the language mix, same replayed math keyed by value
    "q_drift_categorical" ->
      """WITH b AS (
        |  SELECT lang AS category, COUNT(*) AS base_n FROM documents
        |  WHERE lang IS NOT NULL AND doc_id % 2 = 0 GROUP BY 1),
        |c AS (
        |  SELECT lang AS category, COUNT(*) AS cur_n FROM documents
        |  WHERE lang IS NOT NULL AND doc_id % 2 = 1 GROUP BY 1),
        |j AS (
        |  SELECT COALESCE(b.category, c.category) AS category,
        |    CAST(COALESCE(base_n, 0) AS BIGINT) AS base_n,
        |    CAST(COALESCE(cur_n, 0) AS BIGINT) AS cur_n
        |  FROM b FULL OUTER JOIN c ON b.category = c.category),
        |t AS (SELECT CAST(SUM(base_n) AS DOUBLE) AS bt,
        |  CAST(SUM(cur_n) AS DOUBLE) AS ct FROM j)
        |SELECT category, base_n, cur_n,
        |  round((greatest(cur_n / ct, 1e-6) - greatest(base_n / bt, 1e-6))
        |    * ln(greatest(cur_n / ct, 1e-6) / greatest(base_n / bt, 1e-6)), 6)
        |    AS psi_term
        |FROM j, t ORDER BY category""".stripMargin,
    // the same score expression, cut at each language's rank-based median
    "q_quality_floor" -> {
      val scored = textStatsSql.replace("ORDER BY doc_id", "")
      s"""WITH q AS ($scored),
         |j AS (SELECT q.doc_id AS doc_id, d.lang AS lang,
         |    q.quality_score AS quality_score
         |  FROM q JOIN documents d ON q.doc_id = d.doc_id),
         |r AS (SELECT *, row_number() OVER
         |    (PARTITION BY lang ORDER BY quality_score DESC, doc_id) AS rn,
         |  COUNT(*) OVER (PARTITION BY lang) AS n FROM j)
         |SELECT doc_id, lang, quality_score FROM r
         |WHERE rn <= ceil(0.5 * n) ORDER BY doc_id""".stripMargin
    },
    "q_token_counts" ->
      """SELECT doc_id, len(string_split_regex(trim(text), '\s+')) AS n_ws_tokens,
        |  len(regexp_extract_all(text, '\w+|[^\w\s]')) AS n_bpeish_tokens
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q_lang_id" -> langIdSql,
    "q_dedup_exact" ->
      """SELECT md5(text) AS fingerprint, MIN(doc_id) AS canonical_doc_id,
        |  COUNT(*) AS n_copies
        |FROM documents GROUP BY 1 ORDER BY fingerprint""".stripMargin,
    "q_ngram_jaccard" -> ngramJaccardSql,
    "q_minhash_neardup" -> minhashNearDupSql,
    // the oracle brute-forces what the Spark side finds via deletion-variant
    // blocking: identical pair sets gate blocking recall exactly
    "q_fuzzy_pairs" ->
      """WITH c AS (SELECT c_custkey AS id, c_name AS s FROM customer
        |  WHERE c_custkey <= 2000)
        |SELECT a.id AS id_1, b.id AS id_2,
        |  CAST(levenshtein(a.s, b.s) AS INTEGER) AS dist
        |FROM c a JOIN c b ON a.id < b.id AND levenshtein(a.s, b.s) <= 1
        |ORDER BY id_1, id_2""".stripMargin,
    "q_incremental_neardup" -> incrementalNearDupSql,
    "q_simhash" -> simhashSql,
    "q_simhash_near_pairs" -> simhashNearPairsSql,
    "q_fingerprints" -> fingerprintsSql,
    "q_ann_topk" -> annTopkSql,
    "q_ivf_topk" -> ivfTopkSql,
    "q_ivfpq_topk" -> ivfPqTopkSql,
    "q_pq_drift" -> pqDriftSql,
    // the incremental-index gate replays the SAME one-shot IVF formulation:
    // oracle equality proves the per-batch appends reconstruct the full build
    "q_ivf_append" -> ivfTopkSql,
    "q_ivf_drift" -> ivfDriftSql,
    "q_hybrid_ivf" -> hybridIvfSql,
    "q_hybrid_external" -> hybridExternalSql,
    "q_hybrid_bq" -> hybridBqSql,
    "q_hybrid_pq" -> hybridPqSql,
    // the SQL-recipe gate replays the SAME external-hybrid formulation: oracle
    // equality proves the recipe, not just the Scala path, matches DuckDB
    "q_hybrid_external_sql" -> hybridExternalSql,
    // the BQ recipe gate replays the SAME one-shot funnel oracle as q_bq_topk
    "q_bq_sql" -> bqTopkSql,
    "q_ivfpq_sql" -> ivfPqExternalSql,
    "q_embedding_neardup" -> embeddingNearDupSql,
    "q_semantic_dedup" -> semanticDedupSql,
    "q_repetition" -> repetitionSql,
    "q_contamination" -> contaminationSql,
    "q_dedup_clusters" -> dedupClustersSql,
    "q_deterministic_sample" ->
      """SELECT lang, md5(text) AS fingerprint FROM documents
        |QUALIFY row_number() OVER (PARTITION BY lang ORDER BY md5(text), text) <= 3
        |ORDER BY lang, fingerprint""".stripMargin,
    // both legs' rankings replayed exactly, then the 1/(60+rank) fusion in
    // DOUBLE arithmetic (bit-identical across engines for these rationals)
    "q_hybrid_retrieval" ->
      """WITH d AS (SELECT doc_id,
        |    string_split_regex(trim(lower(coalesce(text, ''))), '\s+') AS toks
        |  FROM documents),
        |tok AS (SELECT DISTINCT doc_id, tok FROM
        |  (SELECT doc_id, unnest(toks) AS tok FROM d) WHERE tok <> ''),
        |lex0 AS (SELECT q.doc_id AS query_id, c.doc_id AS doc_id,
        |    count(*) AS overlap
        |  FROM tok q JOIN tok c ON c.tok = q.tok AND c.doc_id <> q.doc_id
        |  WHERE q.doc_id < 5 GROUP BY 1, 2),
        |lex AS (SELECT query_id, doc_id, CAST(r AS INT) AS lex_rank FROM (
        |    SELECT *, row_number() OVER (
        |      PARTITION BY query_id ORDER BY overlap DESC, doc_id) AS r FROM lex0)
        |  WHERE r <= 20),
        |e AS (SELECT vec_id,
        |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
        |n AS (SELECT vec_id, v,
        |    sqrt(list_sum(list_transform(v, x -> x * x))) AS norm FROM e),
        |qv AS (SELECT vec_id AS query_id, v AS qvec, norm AS qnorm FROM n
        |  WHERE vec_id < 5),
        |s0 AS (SELECT qv.query_id, n.vec_id AS doc_id,
        |    round(list_sum(list_transform(list_zip(qv.qvec, n.v),
        |      p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
        |      / (qv.qnorm * n.norm), 4) AS cosine
        |  FROM qv JOIN n ON n.vec_id <> qv.query_id),
        |sem AS (SELECT query_id, doc_id, CAST(r AS INT) AS sem_rank FROM (
        |    SELECT *, row_number() OVER (
        |      PARTITION BY query_id ORDER BY cosine DESC, doc_id) AS r FROM s0)
        |  WHERE r <= 20),
        |fused AS (SELECT coalesce(lex.query_id, sem.query_id) AS query_id,
        |    coalesce(lex.doc_id, sem.doc_id) AS doc_id,
        |    lex.lex_rank, sem.sem_rank,
        |    coalesce(CAST(1.0 AS DOUBLE) / (60 + lex.lex_rank), CAST(0 AS DOUBLE))
        |      + coalesce(CAST(1.0 AS DOUBLE) / (60 + sem.sem_rank), CAST(0 AS DOUBLE))
        |      AS rrf
        |  FROM lex FULL OUTER JOIN sem
        |    ON lex.query_id = sem.query_id AND lex.doc_id = sem.doc_id)
        |SELECT query_id, CAST(rank AS INT) AS rank, doc_id, rrf,
        |  lex_rank, sem_rank FROM (
        |  SELECT *, row_number() OVER (
        |    PARTITION BY query_id ORDER BY rrf DESC, doc_id) AS rank FROM fused)
        |WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin,
    // exact-integer char counts; HUGEINT sums cast off; the grid-rounded
    // addend chain replayed exactly
    "q_char_entropy" ->
      """WITH ch AS (SELECT doc_id,
        |    unnest(string_split(coalesce(text, ''), '')) AS c FROM documents),
        |pc AS (SELECT doc_id, c, count(*) AS n FROM ch
        |  WHERE c <> '' GROUP BY 1, 2),
        |a AS (SELECT doc_id, CAST(sum(n) AS BIGINT) AS n_chars,
        |    count(*) AS distinct_chars,
        |    sum(round(CAST(n AS DOUBLE) * log2(n), 8)) AS clogc
        |  FROM pc GROUP BY doc_id)
        |SELECT doc_id, n_chars, distinct_chars,
        |  round(log2(n_chars) - clogc / CAST(n_chars AS DOUBLE), 6) AS entropy
        |FROM a ORDER BY doc_id""".stripMargin,
    // segmentation + C4 sentence-grain dedup: counts and the first-occurrence
    // rule via windows (answer-identical to the operator's groupBy+min(struct)),
    // ordered reassembly via string_agg; n_kept cast off DuckDB's HUGEINT sum
    "q_sentence_dedup" ->
      (sentenceUnitsDuck + """,
        |s AS (SELECT doc_id, CAST(idx AS INT) AS idx,
        |    trim(replace(s0, chr(2), '.')) AS sent
        |  FROM u WHERE trim(s0) <> ''),
        |f AS (SELECT doc_id, idx, sent,
        |    count(*) OVER (PARTITION BY md5(sent)) AS cc,
        |    row_number() OVER (PARTITION BY md5(sent)
        |      ORDER BY doc_id, idx) AS rn
        |  FROM s)
        |SELECT doc_id,
        |  coalesce(string_agg(sent, ' ' ORDER BY idx)
        |    FILTER (WHERE cc <= 2 OR rn = 1), '') AS clean_text,
        |  count(*) AS n_sentences,
        |  CAST(sum(CASE WHEN cc <= 2 OR rn = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_kept
        |FROM f GROUP BY doc_id ORDER BY doc_id""".stripMargin),
    // the sentinel-insert + split segmentation replayed exactly (abbreviation
    // mask included): DuckDB's parallel unnests zip positionally, giving
    // posexplode's 0-based index
    "q_sentences" ->
      (sentenceUnitsDuck + """,
        |st AS (SELECT doc_id, CAST(idx AS INT) AS sentence_idx,
        |    trim(replace(s0, chr(2), '.')) AS sentence
        |  FROM u WHERE trim(s0) <> '')
        |SELECT doc_id, sentence_idx, sentence FROM st
        |ORDER BY doc_id, sentence_idx""".stripMargin),
    // the identical regex chain (RE2 ∩ Java subset, explicit whitespace
    // classes, &amp; decoded last) over the identical HTML template — DuckDB
    // regexp_replace needs the explicit 'g' flag Spark applies implicitly
    "q_html_extract" ->
      """WITH w AS (SELECT doc_id,
        |  '<html><head><title>Doc ' || doc_id || ' &amp; co</title>' ||
        |  '<script type="text/javascript">var t = 1 < 2;</script>' ||
        |  '<style>.nav{color:red}</style></head><body>' ||
        |  '<div id="nav"><a href="/">Home</a> <a href="/a">About</a></div><p>' ||
        |  coalesce(text, '') ||
        |  '</p><!-- chrome --><div>&quot;tail&quot; &#39;q&#39; &nbsp;&lt;x&gt;</div></body></html>'
        |  AS html FROM documents),
        |nc AS (SELECT doc_id, html,
        |  regexp_replace(regexp_replace(regexp_replace(regexp_replace(html,
        |    '(?is)<script[^>]*>.*?</script>', ' ', 'g'),
        |    '(?is)<style[^>]*>.*?</style>', ' ', 'g'),
        |    '(?is)<noscript[^>]*>.*?</noscript>', ' ', 'g'),
        |    '(?s)<!--.*?-->', ' ', 'g') AS x FROM w),
        |nt AS (SELECT doc_id, html,
        |  regexp_replace(x, '(?s)<[^>]*>', ' ', 'g') AS x FROM nc),
        |de AS (SELECT doc_id, html,
        |  regexp_replace(regexp_replace(regexp_replace(regexp_replace(
        |    regexp_replace(regexp_replace(x,
        |    '&nbsp;', ' ', 'g'), '&lt;', '<', 'g'), '&gt;', '>', 'g'),
        |    '&quot;', '"', 'g'), '&#39;', '''', 'g'), '&amp;', '&', 'g') AS x
        |  FROM nt),
        |t AS (SELECT doc_id, html,
        |  trim(regexp_replace(x, '[ \t\n\f\r]+', ' ', 'g')) AS text FROM de),
        |ti AS (SELECT doc_id,
        |  trim(regexp_replace(regexp_replace(regexp_replace(regexp_replace(
        |    regexp_replace(regexp_replace(
        |    regexp_extract(html, '(?is)<title[^>]*>(.*?)</title>', 1),
        |    '&nbsp;', ' ', 'g'), '&lt;', '<', 'g'), '&gt;', '>', 'g'),
        |    '&quot;', '"', 'g'), '&#39;', '''', 'g'), '&amp;', '&', 'g'))
        |  AS title, html FROM w)
        |SELECT t.doc_id, ti.title, t.text,
        |  CAST(length(t.html) AS INT) AS html_len,
        |  CAST(length(t.text) AS INT) AS text_len,
        |  CASE WHEN length(t.html) > 0
        |    THEN round(CAST(length(t.text) AS DOUBLE) / length(t.html), 4)
        |    ELSE 0.0 END AS text_ratio,
        |  CAST(len(regexp_extract_all(t.html, '<[^>]*>')) AS INT) AS tag_count,
        |  CAST(len(regexp_extract_all(t.html, '(?i)<a[ \t\n\f\r>]')) AS INT)
        |    AS anchor_count
        |FROM t JOIN ti ON t.doc_id = ti.doc_id
        |ORDER BY t.doc_id""".stripMargin,
    "q_html_main_content" -> htmlMainContentOracle,
    // the BM25 lexical leg replayed from first principles (postings → df →
    // fixed-order addend arithmetic, 6-dp rounded before AND after the
    // per-pair sum so the sum is order-independent), the cosine leg and the
    // RRF fusion as in q_hybrid_retrieval
    "q_hybrid_bm25" ->
      """WITH d AS (SELECT doc_id,
        |    string_split_regex(trim(lower(text)), '\s+') AS toks FROM documents),
        |post AS (SELECT doc_id, tok AS term, count(*) AS tf FROM
        |  (SELECT doc_id, unnest(toks) AS tok FROM d) GROUP BY 1, 2),
        |dl AS (SELECT doc_id, len(toks) AS dl FROM d),
        |st AS (SELECT CAST(count(*) AS DOUBLE) AS n,
        |    CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl FROM dl),
        |qt AS (SELECT doc_id AS query_id, term FROM post
        |  WHERE doc_id < 5 AND term <> ''),
        |dfs AS (SELECT term, count(*) AS df FROM post
        |  WHERE term IN (SELECT DISTINCT term FROM qt) GROUP BY term),
        |hit AS (SELECT qt.query_id, p.doc_id, p.term, p.tf
        |  FROM post p JOIN qt ON p.term = qt.term AND p.doc_id <> qt.query_id),
        |a AS (SELECT query_id, h.doc_id,
        |    round(ln(1.0 + (n - df + 0.5) / (df + 0.5)) * tf * 2.2
        |      / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl)), 6) AS a
        |  FROM hit h JOIN dfs USING (term) JOIN dl USING (doc_id), st),
        |lex0 AS (SELECT query_id, doc_id, round(sum(a), 6) AS bm25
        |  FROM a GROUP BY 1, 2),
        |lex AS (SELECT query_id, doc_id, CAST(r AS INT) AS lex_rank FROM (
        |    SELECT *, row_number() OVER (
        |      PARTITION BY query_id ORDER BY bm25 DESC, doc_id) AS r FROM lex0)
        |  WHERE r <= 20),
        |e AS (SELECT vec_id,
        |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
        |n AS (SELECT vec_id, v,
        |    sqrt(list_sum(list_transform(v, x -> x * x))) AS norm FROM e),
        |qv AS (SELECT vec_id AS query_id, v AS qvec, norm AS qnorm FROM n
        |  WHERE vec_id < 5),
        |s0 AS (SELECT qv.query_id, n.vec_id AS doc_id,
        |    round(list_sum(list_transform(list_zip(qv.qvec, n.v),
        |      p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
        |      / (qv.qnorm * n.norm), 4) AS cosine
        |  FROM qv JOIN n ON n.vec_id <> qv.query_id),
        |sem AS (SELECT query_id, doc_id, CAST(r AS INT) AS sem_rank FROM (
        |    SELECT *, row_number() OVER (
        |      PARTITION BY query_id ORDER BY cosine DESC, doc_id) AS r FROM s0)
        |  WHERE r <= 20),
        |fused AS (SELECT coalesce(lex.query_id, sem.query_id) AS query_id,
        |    coalesce(lex.doc_id, sem.doc_id) AS doc_id,
        |    lex.lex_rank, sem.sem_rank,
        |    coalesce(CAST(1.0 AS DOUBLE) / (60 + lex.lex_rank), CAST(0 AS DOUBLE))
        |      + coalesce(CAST(1.0 AS DOUBLE) / (60 + sem.sem_rank), CAST(0 AS DOUBLE))
        |      AS rrf
        |  FROM lex FULL OUTER JOIN sem
        |    ON lex.query_id = sem.query_id AND lex.doc_id = sem.doc_id)
        |SELECT query_id, CAST(rank AS INT) AS rank, doc_id, rrf,
        |  lex_rank, sem_rank FROM (
        |  SELECT *, row_number() OVER (
        |    PARTITION BY query_id ORDER BY rrf DESC, doc_id) AS rank FROM fused)
        |WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin,
    // funnel replay: coarse ranking over the 16-component prefix shortlists 20,
    // full-dim cosine re-ranks the shortlist — both passes 4-dp + id tiebreak
    "q_funnel_topk" ->
      """WITH c AS (SELECT vec_id,
        |    list_transform(embedding[1:16], x -> CAST(x AS DOUBLE)) AS v
        |  FROM embeddings),
        |cn AS (SELECT vec_id, v,
        |    sqrt(list_sum(list_transform(v, x -> x * x))) AS norm FROM c),
        |cq AS (SELECT vec_id AS query_id, v AS qv, norm AS qnorm FROM cn
        |  WHERE vec_id < 10),
        |cs AS (SELECT cq.query_id, cn.vec_id,
        |    round(list_sum(list_transform(list_zip(cq.qv, cn.v),
        |      p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
        |      / (cq.qnorm * cn.norm), 4) AS cosine
        |  FROM cq JOIN cn ON cn.vec_id <> cq.query_id),
        |short AS (SELECT query_id, vec_id FROM (
        |    SELECT *, row_number() OVER (
        |      PARTITION BY query_id ORDER BY cosine DESC, vec_id) AS r FROM cs)
        |  WHERE r <= 20),
        |e AS (SELECT vec_id,
        |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
        |n AS (SELECT vec_id, v,
        |    sqrt(list_sum(list_transform(v, x -> x * x))) AS norm FROM e),
        |q AS (SELECT vec_id AS query_id, v AS qv, norm AS qnorm FROM n
        |  WHERE vec_id < 10),
        |s AS (SELECT sh.query_id, n.vec_id,
        |    round(list_sum(list_transform(list_zip(q.qv, n.v),
        |      p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
        |      / (q.qnorm * n.norm), 4) AS cosine
        |  FROM short sh JOIN n USING (vec_id) JOIN q ON q.query_id = sh.query_id)
        |SELECT query_id, rank, vec_id, cosine FROM (
        |  SELECT *, CAST(row_number() OVER (
        |    PARTITION BY query_id ORDER BY cosine DESC, vec_id) AS INT) AS rank FROM s)
        |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,
    // the same cosine replay as q_similarity_topk, over the 16-component
    // embedding PREFIX (DuckDB list slice is 1-based inclusive)
    "q_matryoshka_topk" ->
      """WITH e AS (SELECT vec_id,
        |    list_transform(embedding[1:16], x -> CAST(x AS DOUBLE)) AS v
        |  FROM embeddings),
        |n AS (SELECT vec_id, v,
        |    sqrt(list_sum(list_transform(v, x -> x * x))) AS norm FROM e),
        |q AS (SELECT vec_id AS query_id, v AS qv, norm AS qnorm FROM n
        |  WHERE vec_id < 10),
        |s AS (SELECT q.query_id, n.vec_id,
        |    round(list_sum(list_transform(list_zip(q.qv, n.v),
        |      p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
        |      / (q.qnorm * n.norm), 4) AS cosine
        |  FROM q JOIN n ON n.vec_id <> q.query_id)
        |SELECT query_id, rank, vec_id, cosine FROM (
        |  SELECT *, CAST(row_number() OVER (
        |    PARTITION BY query_id ORDER BY cosine DESC, vec_id) AS INT) AS rank FROM s)
        |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,
    "q_similarity_topk" ->
      """WITH e AS (SELECT vec_id,
        |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
        |n AS (SELECT vec_id, v,
        |    sqrt(list_sum(list_transform(v, x -> x * x))) AS norm FROM e),
        |q AS (SELECT vec_id AS query_id, v AS qv, norm AS qnorm FROM n
        |  WHERE vec_id < 10),
        |s AS (SELECT q.query_id, n.vec_id,
        |    round(list_sum(list_transform(list_zip(q.qv, n.v),
        |      p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
        |      / (q.qnorm * n.norm), 4) AS cosine
        |  FROM q JOIN n ON n.vec_id <> q.query_id)
        |SELECT query_id, rank, vec_id, cosine FROM (
        |  SELECT *, CAST(row_number() OVER (
        |    PARTITION BY query_id ORDER BY cosine DESC, vec_id) AS INT) AS rank FROM s)
        |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,
    "q_bq_topk" -> bqTopkSql,
    "q_bq_append" -> bqTopkSql,
    // first_byte is byte-exact: hex(encode(..)) takes the first UTF-8 BYTE (what the
    // raster's (0,0) pixel actually holds), not the first character's codepoint —
    // ascii() would diverge on any document leading with a multi-byte char. NULL text
    // encodes as the empty payload on the Spark side, hence coalesce + the 0 case.
    "q_multimodal_features" ->
      """WITH d AS (
        |  SELECT doc_id, coalesce(text, '') AS t,
        |    octet_length(encode(coalesce(text, ''))) AS n,
        |    32 + octet_length(encode(coalesce(text, ''))) % 97 AS w
        |  FROM documents),
        |g AS (
        |  SELECT doc_id, t, n, w,
        |    greatest(1, CAST(ceil(n / CAST(w AS DOUBLE)) AS BIGINT)) AS h
        |  FROM d)
        |SELECT doc_id, CAST(w AS INT) AS width, CAST(h AS INT) AS height,
        |  1 AS channels, CAST(w * h AS INT) AS n_pixels,
        |  CASE WHEN n = 0 THEN 0
        |    ELSE CAST(concat('0x', substring(hex(encode(t)), 1, 2)) AS INT)
        |  END AS first_byte
        |FROM g ORDER BY doc_id""".stripMargin,
    // audio replay: the oracle regenerates the integer waveform from doc_id and
    // recomputes RMS / zero crossings / peak — the Spark side must recover the
    // identical values from the DECODED WAV PCM stream
    "q_audio_features" ->
      """WITH d AS (SELECT doc_id, (4000 + (doc_id % 7) * 500) AS n,
        |    (37 + (doc_id % 8) * 101) AS k FROM documents),
        |s AS (SELECT doc_id, n, k, unnest(range(0, n)) AS i FROM d),
        |v AS (SELECT doc_id, n, i, ((i * k) % 20001) - 10000 AS smp FROM s),
        |w AS (SELECT doc_id, n, smp,
        |    lag(smp) OVER (PARTITION BY doc_id ORDER BY i) AS prev FROM v),
        |a AS (SELECT doc_id, MAX(n) AS n_frames,
        |    SUM(smp * smp) AS ss,
        |    CAST(SUM(CASE WHEN smp * prev < 0 THEN 1 ELSE 0 END) AS BIGINT) AS zc,
        |    MAX(ABS(smp)) AS peak
        |  FROM w GROUP BY doc_id)
        |SELECT doc_id, 8000 AS sample_rate, 1 AS channels, 16 AS bits,
        |  n_frames, n_frames * 1000.0 / 8000 AS duration_ms,
        |  sqrt(CAST(ss AS DOUBLE) / n_frames) AS rms,
        |  zc AS zero_crossings, CAST(peak AS INT) AS peak
        |FROM a ORDER BY doc_id""".stripMargin,
    "q_asof_join" ->
      s"""WITH o AS (
         |  SELECT o_custkey AS customer_id, o_orderdate AS order_ts,
         |    MAX(o_orderkey) AS last_order_id, MAX(o_totalprice) AS last_order_amount
         |  FROM orders GROUP BY 1, 2),
         |e AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts FROM events)
         |SELECT e.event_id, e.user_id, e.ts, o.last_order_id, o.last_order_amount,
         |  CAST(o.order_ts AS DATE) AS last_order_date
         |FROM e ASOF LEFT JOIN o
         |  ON e.user_id = o.customer_id AND e.ts >= o.order_ts
         |ORDER BY event_id""".stripMargin,
    "q_sales_rollup" ->
      s"""WITH o AS ($oSql), c AS ($cSql)
         |SELECT strftime(o.order_date, '%Y-%m-%d') AS sale_date, c.region AS region,
         |  COUNT(*) AS n_orders,
         |  CAST(SUM(CAST(o.order_amount AS DECIMAL(18,2))) AS DOUBLE) AS revenue
         |FROM o JOIN c USING (customer_id)
         |GROUP BY ROLLUP(1, 2)
         |ORDER BY sale_date NULLS FIRST, region NULLS FIRST""".stripMargin,
    "q_sales_cube" ->
      s"""WITH o AS ($oSql), c AS ($cSql)
         |SELECT strftime(o.order_date, '%Y-%m-%d') AS sale_date, c.region AS region,
         |  COUNT(*) AS n_orders,
         |  CAST(SUM(CAST(o.order_amount AS DECIMAL(18,2))) AS DOUBLE) AS revenue
         |FROM o JOIN c USING (customer_id)
         |GROUP BY CUBE(1, 2)
         |ORDER BY sale_date NULLS FIRST, region NULLS FIRST""".stripMargin,
    // the oracle runs the PLAIN inequality join the bin-bucketed equality join must
    // reproduce exactly (1 hour = 3_600_000_000 µs)
    "q_range_join" ->
      """WITH e AS (SELECT event_id, user_id, event_type,
        |    epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us FROM events),
        |w AS (SELECT user_id, ts_us AS start_us FROM e WHERE event_type = 'purchase')
        |SELECT e.event_id, e.user_id, COUNT(*) AS n_windows
        |FROM e JOIN w ON e.user_id = w.user_id
        |  AND w.start_us <= e.ts_us AND e.ts_us < w.start_us + 3600000000
        |GROUP BY 1, 2 ORDER BY 1""".stripMargin,
    // plain inequality self-join the exactly-once bucketed overlap join must match
    "q_interval_overlap" ->
      """WITH e AS (SELECT user_id, event_id,
        |    epoch_us(CAST(ts AS TIMESTAMP)) AS s,
        |    epoch_us(CAST(ts AS TIMESTAMP)) + 3600000000 AS e FROM events)
        |SELECT a.user_id AS user_id, a.event_id AS a_id, b.event_id AS b_id
        |FROM e a JOIN e b
        |  ON a.user_id = b.user_id AND a.event_id < b.event_id
        |  AND a.s < b.e AND b.s < a.e
        |ORDER BY 1, 2, 3""".stripMargin,
    // 64-token windows, 16 overlap → starts every 48 tokens; DuckDB list slices are
    // 1-based-inclusive and clamp, exactly like Spark's slice()
    "q_doc_chunks" ->
      """WITH t AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
        |  FROM documents),
        |s AS (
        |  SELECT doc_id, toks,
        |    unnest(generate_series(0, len(toks) - 1, 48)) AS start
        |  FROM t)
        |SELECT doc_id, CAST(start / 48 AS BIGINT) AS chunk_id,
        |  CAST(len(toks[start + 1 : start + 64]) AS INT) AS n_tokens,
        |  array_to_string(toks[start + 1 : start + 64], ' ') AS chunk_text
        |FROM s ORDER BY doc_id, chunk_id""".stripMargin,
    // split membership is an engine-independent contract: the oracle recomputes the
    // md5 bucket and cuts at the boundaries Splits.thresholds publishes
    "q_dataset_split" -> {
      val cuts = Splits.thresholds(
        Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05))
      val cases = cuts.init
        .map { case (name, t) => s"WHEN bucket < $t THEN '$name'" }
        .mkString(" ")
      s"""WITH b AS (
         |  SELECT doc_id,
         |    CAST(concat('0x', substring(md5(CAST(doc_id AS VARCHAR)), 1, 15))
         |      AS BIGINT) % ${Splits.Buckets} AS bucket
         |  FROM documents)
         |SELECT doc_id, bucket,
         |  CASE $cases ELSE '${cuts.last._1}' END AS split
         |FROM b ORDER BY doc_id""".stripMargin
    },
    // the one md5 shard formula, mod k — folds replay on any engine
    "q_kfold" ->
      """SELECT doc_id,
        |  CAST(CAST(concat('0x', substring(md5(CAST(doc_id AS VARCHAR)), 1, 15))
        |    AS BIGINT) % 5 AS INT) AS fold
        |FROM documents ORDER BY doc_id""".stripMargin,
    // stratified sampling replays the same md5 bucket against per-stratum cuts
    "q_stratified_sample" ->
      s"""SELECT doc_id, lang, source FROM documents
         |WHERE CAST(concat('0x', substring(md5(CAST(doc_id AS VARCHAR)), 1, 15))
         |    AS BIGINT) % ${Splits.Buckets} <
         |  CASE WHEN lang = 'en' THEN 500 WHEN lang = 'zh' THEN 1000 ELSE 0 END
         |ORDER BY doc_id""".stripMargin,
    // normalization replay: identical NFC -> control-strip -> ws-collapse -> trim
    // -> lower chain (explicit byte-range control class on both sides)
    "q_normalize_text" ->
      """SELECT doc_id,
        |  md5(lower(trim(regexp_replace(regexp_replace(nfc_normalize(text),
        |    '[\x00-\x08\x0E-\x1F\x7F]', '', 'g'),
        |    '[ \t\n\x0B\f\r]+', ' ', 'g')))) AS norm_fingerprint
        |FROM documents ORDER BY doc_id""".stripMargin,
    // PII scrub replay: same synthetic text, same regex chain (RE2 and Java
    // agree on these lookaround-free patterns), same substitution order
    "q_pii_redact" ->
      """WITH synth AS (
        |  SELECT doc_id,
        |    'Reach user' || doc_id || '@mail' || (doc_id % 7) ||
        |    '.org or call ' || ((doc_id % 900) + 100) || '-555-' ||
        |    lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ||
        |    ' card 4111-1111-1111-1111 from 10.0.' || (doc_id % 256) || '.' ||
        |    (doc_id % 100) || ' ssn 123-45-' ||
        |    lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ||
        |    ' tail ' || doc_id AS text
        |  FROM documents)
        |SELECT doc_id,
        |  len(regexp_extract_all(text,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS pii_email,
        |  len(regexp_extract_all(text,
        |    '\b\d{3}[-.]\d{3}[-.]\d{4}\b')) AS pii_phone,
        |  len(regexp_extract_all(text,
        |    '\b\d{4}[- ]\d{4}[- ]\d{4}[- ]\d{4}\b')) AS pii_card,
        |  len(regexp_extract_all(text,
        |    '\b\d{3}-\d{2}-\d{4}\b')) AS pii_ssn,
        |  len(regexp_extract_all(text,
        |    '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS pii_ip,
        |  len(regexp_extract_all(text,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) +
        |  len(regexp_extract_all(text, '\b\d{3}[-.]\d{3}[-.]\d{4}\b')) +
        |  len(regexp_extract_all(text,
        |    '\b\d{4}[- ]\d{4}[- ]\d{4}[- ]\d{4}\b')) +
        |  len(regexp_extract_all(text, '\b\d{3}-\d{2}-\d{4}\b')) +
        |  len(regexp_extract_all(text,
        |    '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS pii_total,
        |  regexp_replace(regexp_replace(regexp_replace(regexp_replace(
        |    regexp_replace(text,
        |      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |      '\b\d{4}[- ]\d{4}[- ]\d{4}[- ]\d{4}\b', '<CARD>', 'g'),
        |      '\b\d{3}-\d{2}-\d{4}\b', '<SSN>', 'g'),
        |      '\b\d{3}[-.]\d{3}[-.]\d{4}\b', '<PHONE>', 'g'),
        |      '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g')
        |    AS text_redacted
        |FROM synth ORDER BY doc_id""".stripMargin,
    // URL curation: blocked = exact or subdomain of a blocklist entry; the
    // sibling ok.example.com and good.org survive, domains port/path-stripped
    "q_url_filter" ->
      """WITH u AS (
        |  SELECT doc_id,
        |    CASE doc_id % 5 WHEN 0 THEN 'ads.example.com'
        |      WHEN 1 THEN 'x.ads.example.com' WHEN 2 THEN 'ok.example.com'
        |      WHEN 3 THEN 'tracker.net' ELSE 'good.org' END AS host
        |  FROM documents)
        |SELECT doc_id, 'https://' || host || ':8080/p/' || doc_id AS url,
        |  host AS domain
        |FROM u WHERE doc_id % 5 IN (2, 4) ORDER BY doc_id""".stripMargin,
    // class balancing: fractions = min group count / group count, same cut replay
    "q_balanced_sample" ->
      s"""WITH c AS (
         |  SELECT lang, COUNT(*) AS n FROM documents
         |  WHERE lang IS NOT NULL GROUP BY lang),
         |m AS (SELECT MIN(n) AS mn FROM c),
         |f AS (SELECT lang, CAST(mn AS DOUBLE) / n AS frac FROM c, m)
         |SELECT d.doc_id, d.lang FROM documents d JOIN f USING (lang)
         |WHERE CAST(concat('0x', substring(md5(CAST(doc_id AS VARCHAR)), 1, 15))
         |    AS BIGINT) % ${Splits.Buckets} < round(frac * ${Splits.Buckets})
         |ORDER BY doc_id""".stripMargin,
    // duplicated-span replay: same window fingerprints (md5 of space-joined token
    // slice), same >= 2 occurrence threshold, same islands merge (break at gap > L)
    "q_dup_spans" ->
      """WITH t AS (SELECT doc_id,
        |    string_split_regex(trim(lower(text)), '\s+') AS tk FROM documents),
        |w AS (SELECT doc_id,
        |    unnest(range(0, greatest(len(tk) - 8 + 1, 0))) AS pos, tk FROM t),
        |w2 AS (SELECT doc_id, pos,
        |    md5(array_to_string(tk[pos+1 : pos+8], ' ')) AS fp FROM w),
        |d AS (SELECT fp FROM w2 GROUP BY fp HAVING count(*) >= 2),
        |m AS (SELECT doc_id, pos FROM w2 WHERE fp IN (SELECT fp FROM d)),
        |i AS (SELECT doc_id, pos, CASE WHEN pos - lag(pos)
        |    OVER (PARTITION BY doc_id ORDER BY pos) > 8 THEN 1 ELSE 0 END AS brk
        |  FROM m),
        |s AS (SELECT doc_id, pos, SUM(brk)
        |    OVER (PARTITION BY doc_id ORDER BY pos) AS island FROM i)
        |SELECT doc_id, CAST(MIN(pos) AS INT) AS start_token,
        |  CAST(MAX(pos) + 8 - 1 AS INT) AS end_token,
        |  COUNT(*) AS n_dup_windows
        |FROM s GROUP BY doc_id, island
        |ORDER BY doc_id, start_token""".stripMargin,
    // histogram replay: identical w expression, floor, clamp, and edge arithmetic
    "q_histogram" ->
      """WITH p AS (SELECT least(greatest(CAST(floor(
        |    (CAST(o_totalprice AS DOUBLE) - 0.0) / ((600000.0 - 0.0) / 24))
        |    AS INT), 0), 23) AS bin
        |  FROM orders WHERE o_totalprice IS NOT NULL)
        |SELECT bin,
        |  0.0 + bin * ((600000.0 - 0.0) / 24) AS bin_lo,
        |  0.0 + (bin + 1) * ((600000.0 - 0.0) / 24) AS bin_hi,
        |  COUNT(*) AS n
        |FROM p GROUP BY bin ORDER BY bin""".stripMargin,
    // novelty replay: same distinct shingles, same >= 400 split, anti-join, ratio
    "q_novelty" ->
      """WITH toks AS (SELECT doc_id,
        |    string_split_regex(trim(text), '\s+') AS tk FROM documents),
        |t AS (SELECT doc_id, CASE WHEN len(tk) >= 3 THEN
        |    list_distinct(list_transform(generate_series(1, len(tk) - 2),
        |      i -> array_to_string(tk[i:i+2], ' ')))
        |    ELSE [] END AS shs FROM toks),
        |sh AS (SELECT doc_id, unnest(shs) AS shingle FROM t),
        |newsh AS (SELECT * FROM sh WHERE doc_id >= 400),
        |refsh AS (SELECT DISTINCT shingle FROM sh WHERE doc_id < 400),
        |tot AS (SELECT doc_id, COUNT(*) AS n_shingles FROM newsh GROUP BY 1),
        |uns AS (SELECT doc_id, COUNT(*) AS n_unseen FROM newsh
        |  WHERE shingle NOT IN (SELECT shingle FROM refsh) GROUP BY 1)
        |SELECT t.doc_id, t.n_shingles,
        |  coalesce(u.n_unseen, 0) AS n_unseen,
        |  round(CAST(coalesce(u.n_unseen, 0) AS DOUBLE) / t.n_shingles, 6)
        |    AS novelty
        |FROM tot t LEFT JOIN uns u USING (doc_id) ORDER BY doc_id""".stripMargin,
    // LM replay: same bigram/unigram counts, same add-one smoothing and ln chain
    "q_lm_score" ->
      """WITH t AS (SELECT doc_id,
        |    string_split_regex(trim(lower(text)), '\s+') AS tk FROM documents),
        |b AS (SELECT doc_id, tk[i] AS w1, tk[i+1] AS w2
        |  FROM (SELECT doc_id, tk, unnest(range(1, len(tk))) AS i FROM t)),
        |bc AS (SELECT w1, w2, count(*) AS cb FROM b GROUP BY 1, 2),
        |u AS (SELECT w, count(*) AS cw
        |  FROM (SELECT unnest(tk) AS w FROM t) WHERE w <> '' GROUP BY w),
        |v AS (SELECT count(*) AS vs FROM u),
        |s AS (SELECT b.doc_id,
        |    ln(CAST(coalesce(bc.cb, 0) + 1 AS DOUBLE) /
        |       CAST(coalesce(u.cw, 0) + vs AS DOUBLE)) AS lp
        |  FROM b LEFT JOIN bc USING (w1, w2) LEFT JOIN u ON b.w1 = u.w
        |  CROSS JOIN v)
        |SELECT doc_id, COUNT(*) AS n_bigrams, round(AVG(lp), 6) AS avg_logprob
        |FROM s GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // bucket replay: same scores, same interpolated tercile cutoffs, same CASE
    "q_lm_buckets" ->
      """WITH t AS (SELECT doc_id,
        |    string_split_regex(trim(lower(text)), '\s+') AS tk FROM documents),
        |b AS (SELECT doc_id, tk[i] AS w1, tk[i+1] AS w2
        |  FROM (SELECT doc_id, tk, unnest(range(1, len(tk))) AS i FROM t)),
        |bc AS (SELECT w1, w2, count(*) AS cb FROM b GROUP BY 1, 2),
        |u AS (SELECT w, count(*) AS cw
        |  FROM (SELECT unnest(tk) AS w FROM t) WHERE w <> '' GROUP BY w),
        |v AS (SELECT count(*) AS vs FROM u),
        |s AS (SELECT b.doc_id,
        |    ln(CAST(coalesce(bc.cb, 0) + 1 AS DOUBLE) /
        |       CAST(coalesce(u.cw, 0) + vs AS DOUBLE)) AS lp
        |  FROM b LEFT JOIN bc USING (w1, w2) LEFT JOIN u ON b.w1 = u.w
        |  CROSS JOIN v),
        |scores AS (SELECT doc_id, COUNT(*) AS n_bigrams,
        |    round(AVG(lp), 6) AS avg_logprob FROM s GROUP BY doc_id),
        |c AS (SELECT quantile_cont(avg_logprob, 2.0 / 3.0) AS ch,
        |    quantile_cont(avg_logprob, 1.0 / 3.0) AS cm FROM scores)
        |SELECT sc.doc_id, sc.n_bigrams, sc.avg_logprob,
        |  CASE WHEN sc.avg_logprob >= c.ch THEN 'head'
        |       WHEN sc.avg_logprob >= c.cm THEN 'middle'
        |       ELSE 'tail' END AS bucket
        |FROM scores sc CROSS JOIN c ORDER BY doc_id""".stripMargin,
    // int8 replay: same max-abs scale, same x*127/scale operation order, same
    // away-from-zero rounding in both engines
    "q_int8_quant" ->
      """WITH v AS (SELECT vec_id,
        |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS dv
        |  FROM embeddings),
        |s AS (SELECT vec_id, dv,
        |    list_aggregate(list_transform(dv, x -> abs(x)), 'max') AS scale FROM v)
        |SELECT vec_id, scale,
        |  array_to_string(list_transform(dv, x ->
        |    CASE WHEN scale > 0
        |      THEN CAST(CAST(round(x * 127.0 / scale) AS TINYINT) AS VARCHAR)
        |      ELSE '0' END), ',') AS codes_csv
        |FROM s ORDER BY vec_id""".stripMargin,
    // span-cut replay: re-derive the spans, filter token indexes, single-space join
    "q_span_cut" ->
      """WITH t AS (SELECT doc_id, text,
        |    string_split_regex(trim(lower(text)), '\s+') AS ltk FROM documents),
        |w AS (SELECT doc_id,
        |    unnest(range(0, greatest(len(ltk) - 8 + 1, 0))) AS pos, ltk FROM t),
        |w2 AS (SELECT doc_id, pos,
        |    md5(array_to_string(ltk[pos+1 : pos+8], ' ')) AS fp FROM w),
        |d AS (SELECT fp FROM w2 GROUP BY fp HAVING count(*) >= 2),
        |m AS (SELECT doc_id, pos FROM w2 WHERE fp IN (SELECT fp FROM d)),
        |i AS (SELECT doc_id, pos, CASE WHEN pos - lag(pos)
        |    OVER (PARTITION BY doc_id ORDER BY pos) > 8 THEN 1 ELSE 0 END AS brk
        |  FROM m),
        |s AS (SELECT doc_id, pos, SUM(brk)
        |    OVER (PARTITION BY doc_id ORDER BY pos) AS island FROM i),
        |spans AS (SELECT doc_id, MIN(pos) AS st, MAX(pos) + 7 AS en
        |  FROM s GROUP BY doc_id, island),
        |sp AS (SELECT doc_id, list(struct_pack(st := st, en := en)) AS sps
        |  FROM spans GROUP BY doc_id),
        |j AS (SELECT t.doc_id, string_split_regex(trim(t.text), '\s+') AS tk,
        |    coalesce(sp.sps, []) AS sps
        |  FROM t LEFT JOIN sp USING (doc_id)),
        |c AS (SELECT doc_id,
        |    list_filter(range(0, len(tk)),
        |      i -> len(list_filter(sps, x -> i >= x.st AND i <= x.en)) = 0) AS kept,
        |    tk, len(tk) AS n FROM j)
        |SELECT doc_id,
        |  -- a fully-cut doc is the empty string (concat_ws semantics), not NULL
        |  coalesce(array_to_string(list_transform(kept, i -> tk[i+1]), ' '), '')
        |    AS text,
        |  CAST(n - len(kept) AS INT) AS n_tokens_removed
        |FROM c ORDER BY doc_id""".stripMargin,
    // shard replay: same md5 mod for the shard, same window order for the position
    // hard negatives: same cosine replay as q_similarity_topk, with the label
    // inequality in the join (self-match exclusion is implied: same label)
    "q_hard_negatives" ->
      """WITH e AS (SELECT vec_id, label,
        |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
        |n AS (SELECT vec_id, label, v,
        |    sqrt(list_sum(list_transform(v, x -> x * x))) AS norm FROM e),
        |q AS (SELECT vec_id AS query_id, label AS qlbl, v AS qv, norm AS qnorm
        |  FROM n WHERE vec_id < 10),
        |s AS (SELECT q.query_id, n.vec_id,
        |    round(list_sum(list_transform(list_zip(q.qv, n.v),
        |      p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
        |      / (q.qnorm * n.norm), 4) AS cosine
        |  FROM q JOIN n ON n.label <> q.qlbl)
        |SELECT query_id, rank, vec_id, cosine FROM (
        |  SELECT *, CAST(row_number() OVER (
        |    PARTITION BY query_id ORDER BY cosine DESC, vec_id) AS INT) AS rank FROM s)
        |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,
    // curriculum: interpolated tercile cutoffs over n_chars (ties stay in the
    // lower phase), md5 shard + within-(phase, shard) md5 order
    "q_curriculum" ->
      """WITH c AS (SELECT quantile_cont(n_chars, 1.0 / 3.0) AS c1,
        |    quantile_cont(n_chars, 2.0 / 3.0) AS c2 FROM documents),
        |s AS (
        |  SELECT doc_id,
        |    CAST(CASE WHEN n_chars > c2 THEN 2 WHEN n_chars > c1 THEN 1
        |      ELSE 0 END AS INT) AS phase,
        |    CAST(CAST(concat('0x', substring(md5(CAST(doc_id AS VARCHAR)), 1, 15))
        |      AS BIGINT) % 4 AS INT) AS shard,
        |    md5(CAST(doc_id AS VARCHAR)) AS h
        |  FROM documents CROSS JOIN c)
        |SELECT doc_id, phase, shard,
        |  CAST(row_number() OVER (PARTITION BY phase, shard
        |    ORDER BY h, CAST(doc_id AS VARCHAR)) AS INT) AS position
        |FROM s ORDER BY doc_id""".stripMargin,
    "q_shards" ->
      s"""WITH s AS (
         |  SELECT doc_id,
         |    CAST(CAST(concat('0x', substring(md5(CAST(doc_id AS VARCHAR)), 1, 15))
         |      AS BIGINT) % 8 AS INT) AS shard,
         |    md5(CAST(doc_id AS VARCHAR)) AS h
         |  FROM documents)
         |SELECT doc_id, shard,
         |  CAST(row_number() OVER (PARTITION BY shard
         |    ORDER BY h, CAST(doc_id AS VARCHAR)) AS INT) AS position
         |FROM s ORDER BY doc_id""".stripMargin,
    // per-source cap replay: row_number over (md5(id), id) within each source must
    // pick the exact rows the bottom-k aggregate keeps
    "q_source_caps" ->
      """WITH r AS (
        |  SELECT doc_id, source,
        |    row_number() OVER (PARTITION BY source
        |      ORDER BY md5(CAST(doc_id AS VARCHAR)), CAST(doc_id AS VARCHAR)) AS rn
        |  FROM documents)
        |SELECT doc_id, source FROM r WHERE rn <= 10
        |ORDER BY source, doc_id""".stripMargin,
    // per-row weighted keep: the oracle recomputes the quality score and replays
    // bucket < round(score*1000) — scores are exact quarters, no boundary risk
    "q_weighted_sample" -> {
      val scored = textStatsSql.replace("ORDER BY doc_id", "")
      s"""WITH q AS ($scored)
         |SELECT doc_id, quality_score FROM q
         |WHERE CAST(concat('0x', substring(md5(CAST(doc_id AS VARCHAR)), 1, 15))
         |    AS BIGINT) % ${Splits.Buckets} < round(quality_score * ${Splits.Buckets})
         |ORDER BY doc_id""".stripMargin
    },
    // temperature fractions recomputed from group counts: pow weights folded in
    // lexicographic lang order (list_reduce over an ORDER BY list — an unordered SUM
    // could differ in the last ulp and flip a bucket boundary), same cut replay
    "q_temperature_sample" ->
      s"""WITH c AS (
         |  SELECT lang, COUNT(*) AS n FROM documents
         |  WHERE lang IS NOT NULL GROUP BY lang),
         |agg AS (SELECT
         |  list_reduce(list_prepend(CAST(0 AS DOUBLE),
         |    list(pow(CAST(n AS DOUBLE), 0.5) ORDER BY lang)), (a, b) -> a + b)
         |    AS totalw,
         |  CAST(SUM(n) AS DOUBLE) AS totaln FROM c),
         |f AS (SELECT lang,
         |  least(1.0, 0.3 * totaln * pow(CAST(n AS DOUBLE), 0.5) / totalw / n)
         |    AS frac FROM c, agg)
         |SELECT d.doc_id, d.lang FROM documents d JOIN f USING (lang)
         |WHERE CAST(concat('0x', substring(md5(CAST(doc_id AS VARCHAR)), 1, 15))
         |    AS BIGINT) % ${Splits.Buckets} < round(frac * ${Splits.Buckets})
         |ORDER BY doc_id""".stripMargin,
    // the funnel oracle is the min-recursion definition itself (correlated MINs),
    // deliberately NOT the greedy walk the Spark side executes — equality of the two
    // formulations is exactly what the gate should prove
    "q_funnel" ->
      """WITH e AS (
        |  SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us, event_type
        |  FROM events WHERE event_type IN ('view', 'click', 'purchase')),
        |u AS (SELECT DISTINCT user_id FROM e),
        |s1 AS (
        |  SELECT u.user_id,
        |    (SELECT MIN(ts_us) FROM e
        |     WHERE e.user_id = u.user_id AND event_type = 'view') AS t1
        |  FROM u),
        |s2 AS (
        |  SELECT s1.*,
        |    (SELECT MIN(ts_us) FROM e
        |     WHERE e.user_id = s1.user_id AND event_type = 'click'
        |       AND ts_us > s1.t1 AND ts_us <= s1.t1 + 86400000000) AS t2
        |  FROM s1),
        |s3 AS (
        |  SELECT s2.*,
        |    (SELECT MIN(ts_us) FROM e
        |     WHERE e.user_id = s2.user_id AND event_type = 'purchase'
        |       AND ts_us > s2.t2 AND ts_us <= s2.t1 + 86400000000) AS t3
        |  FROM s2)
        |SELECT user_id,
        |  CAST(CASE WHEN t1 IS NULL THEN 0 WHEN t2 IS NULL THEN 1
        |            WHEN t3 IS NULL THEN 2 ELSE 3 END AS INT) AS steps_completed,
        |  t1 AS t1_us, t2 AS t2_us, t3 AS t3_us
        |FROM s3 ORDER BY user_id""".stripMargin,
    // adjacent-pair replay: zip each token list with its own tail, count, top-50
    "q_token_pairs" ->
      """WITH t AS (
        |  SELECT string_split_regex(trim(lower(text)), '\s+') AS tk FROM documents),
        |p AS (
        |  SELECT unnest(list_transform(range(1, len(tk)),
        |    i -> tk[i] || ' ' || tk[i + 1])) AS pair
        |  FROM t WHERE len(tk) >= 2)
        |SELECT pair, COUNT(*) AS n FROM p
        |GROUP BY pair ORDER BY n DESC, pair LIMIT 50""".stripMargin,
    // vocabulary stats replay: same tokenization, df/tf aggregates, idf chain
    "q_vocabulary" ->
      """WITH tok AS (
        |  SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\s+')) AS term
        |  FROM documents),
        |n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs FROM documents)
        |SELECT term, COUNT(DISTINCT doc_id) AS df, COUNT(*) AS total_tf,
        |  round(ln(1.0 + (n_docs - COUNT(DISTINCT doc_id) + 0.5)
        |    / (COUNT(DISTINCT doc_id) + 0.5)), 6) AS idf
        |FROM tok, n GROUP BY term, n_docs
        |ORDER BY df DESC, term LIMIT 100""".stripMargin,
    // BM25 with the identical left-to-right addend chain (lowercased whitespace
    // tokens, Lucene +1 idf smoothing, k1=1.2 b=0.75), rounded to 6 decimals
    "q_bm25_topk" -> bm25OracleSql,
    // the incremental-index gate replays the SAME full-corpus scan formulation:
    // oracle equality proves the per-batch appends reconstruct the full build
    "q_bm25_append" -> bm25OracleSql,
    "q_window_analytics" ->
      s"""WITH o AS ($oSql)
         |SELECT customer_id, order_id, CAST(order_date AS DATE) AS order_date,
         |  order_amount,
         |  CAST(rank() OVER wa AS INT) AS amount_rank,
         |  CAST(dense_rank() OVER wa AS INT) AS amount_dense_rank,
         |  CAST(ntile(4) OVER wa AS INT) AS amount_quartile,
         |  CAST(date_diff('day', CAST(lag(order_date, 1) OVER wt AS DATE),
         |    CAST(order_date AS DATE)) AS INT) AS days_since_prev,
         |  CAST(SUM(CAST(order_amount AS DECIMAL(18,2))) OVER
         |    (PARTITION BY customer_id ORDER BY order_date, order_id
         |     ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS running_total
         |FROM o
         |WINDOW
         |  wa AS (PARTITION BY customer_id ORDER BY order_amount DESC, order_id),
         |  wt AS (PARTITION BY customer_id ORDER BY order_date, order_id)
         |ORDER BY customer_id, order_id""".stripMargin,
    "q_set_ops" ->
      s"""WITH o AS ($oSql),
         |y95 AS (SELECT DISTINCT customer_id FROM o
         |  WHERE EXTRACT(year FROM order_date) = 1995),
         |y96 AS (SELECT DISTINCT customer_id FROM o
         |  WHERE EXTRACT(year FROM order_date) = 1996)
         |SELECT customer_id, 'only_1995' AS segment
         |  FROM (SELECT customer_id FROM y95 EXCEPT SELECT customer_id FROM y96)
         |UNION ALL
         |SELECT customer_id, 'both_years' AS segment
         |  FROM (SELECT customer_id FROM y95 INTERSECT SELECT customer_id FROM y96)
         |ORDER BY segment, customer_id""".stripMargin,
    "q_pivot_revenue" ->
      s"""WITH o AS ($oSql), c AS ($cSql)
         |SELECT EXTRACT(year FROM o.order_date) AS sale_year,
         |  CAST(SUM(CASE WHEN c.region = 'AUTOMOBILE'
         |    THEN CAST(o.order_amount AS DECIMAL(18,2)) END) AS DOUBLE) AS AUTOMOBILE,
         |  CAST(SUM(CASE WHEN c.region = 'BUILDING'
         |    THEN CAST(o.order_amount AS DECIMAL(18,2)) END) AS DOUBLE) AS BUILDING,
         |  CAST(SUM(CASE WHEN c.region = 'FURNITURE'
         |    THEN CAST(o.order_amount AS DECIMAL(18,2)) END) AS DOUBLE) AS FURNITURE,
         |  CAST(SUM(CASE WHEN c.region = 'HOUSEHOLD'
         |    THEN CAST(o.order_amount AS DECIMAL(18,2)) END) AS DOUBLE) AS HOUSEHOLD,
         |  CAST(SUM(CASE WHEN c.region = 'MACHINERY'
         |    THEN CAST(o.order_amount AS DECIMAL(18,2)) END) AS DOUBLE) AS MACHINERY
         |FROM o JOIN c USING (customer_id)
         |GROUP BY 1 ORDER BY sale_year""".stripMargin,
    "q_value_percentiles" ->
      """SELECT event_type,
        |  quantile_cont(value, 0.25) AS p25, quantile_cont(value, 0.5) AS p50,
        |  quantile_cont(value, 0.75) AS p75, quantile_cont(value, 0.95) AS p95,
        |  COUNT(*) AS n
        |FROM events GROUP BY 1 ORDER BY event_type""".stripMargin,
    "q_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |    (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
        |    AS sum_disc_price,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
        |    AS avg_price,
        |  COUNT(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q_top_customers" ->
      """WITH r AS (
        |  SELECT o_custkey,
        |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |      (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
        |      AS revenue
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  GROUP BY o_custkey)
        |SELECT o_custkey AS custkey, c_name AS name, c_mktsegment AS mktsegment, revenue
        |FROM r JOIN customer ON o_custkey = c_custkey
        |ORDER BY revenue DESC, custkey LIMIT 20""".stripMargin,
    "q_csv_roundtrip" -> "SELECT * FROM customer ORDER BY c_custkey",
    "q_json_partitioned_roundtrip" ->
      """SELECT o_orderkey AS order_id, strftime(o_orderdate, '%Y-%m-%d') AS sale_date,
        |  o_totalprice AS order_amount, o_custkey AS customer_id,
        |  CAST(o_orderdate AS DATE) AS order_date
        |FROM orders ORDER BY order_id""".stripMargin,
    "q_avro_cdc_roundtrip" ->
      """SELECT o_orderkey AS order_id, CAST(o_orderdate AS DATE) AS order_date,
        |  CAST(CAST(o_totalprice AS DECIMAL(10,2)) AS DOUBLE) AS order_amount,
        |  o_custkey AS customer_id
        |FROM orders ORDER BY order_id""".stripMargin,
    "q_avro_customers_roundtrip" ->
      s"""WITH c AS ($cSql)
         |SELECT customer_id, name, email, region, customer_tenure_days
         |FROM c ORDER BY customer_id""".stripMargin,
    "q_synthetic_orders" ->
      """SELECT i + 1 AS order_id, DATE '2024-01-01' + CAST(i % 365 AS INT) AS order_date,
        |  CAST((i * 37) % 1000 + 1 AS DOUBLE) AS order_amount, i % 50 + 1 AS customer_id
        |FROM range(0, 10000) t(i) ORDER BY order_id""".stripMargin,
    "q_stream_ingest" ->
      """SELECT event_id, user_id, event_type, value, CAST(ts AS TIMESTAMP) AS ts,
        |  strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d') AS date
        |FROM events ORDER BY event_id""".stripMargin,
    // streaming CDC-apply: base (<400, 'base') upserted with 'upd' events for
    // [200,600) keys not %10, deletes for %10 keys (unmatched ones no-ops);
    // the losing 'mid' events must never appear
    "q_stream_upsert" ->
      """SELECT doc_id, lang, source,
        |  CASE WHEN doc_id >= 200 THEN 'upd' ELSE 'base' END AS state
        |FROM documents
        |WHERE doc_id < 200 OR (doc_id < 600 AND doc_id % 10 <> 0)
        |ORDER BY doc_id""".stripMargin,
    "q_events_hourly" ->
      """SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS bucket_start, event_type,
        |  COUNT(*) AS n_events,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q_resample" ->
      """WITH b AS (
        |  SELECT user_id, date_trunc('hour', CAST(ts AS TIMESTAMP)) AS bucket,
        |    COUNT(*) AS n_events,
        |    CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS bucket_value
        |  FROM events GROUP BY 1, 2),
        |s AS (
        |  SELECT user_id,
        |    UNNEST(generate_series(MIN(bucket), MAX(bucket), INTERVAL 1 HOUR)) AS bucket
        |  FROM b GROUP BY user_id)
        |SELECT s.user_id, s.bucket, COALESCE(b.n_events, 0) AS n_events,
        |  b.bucket_value AS bucket_value,
        |  LAST_VALUE(b.bucket_value IGNORE NULLS)
        |    OVER (PARTITION BY s.user_id ORDER BY s.bucket) AS filled_value,
        |  b.n_events IS NULL AS gap
        |FROM s LEFT JOIN b ON s.user_id = b.user_id AND s.bucket = b.bucket
        |ORDER BY s.user_id, s.bucket""".stripMargin,
    "q_rolling_revenue" ->
      """SELECT o_orderkey, o_custkey, o_orderdate,
        |  COUNT(*) OVER w AS trailing_n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS DOUBLE) AS trailing_sum,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS DOUBLE)
        |    / COUNT(*) OVER w AS trailing_avg
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY CAST(epoch(o_orderdate) AS BIGINT)
        |             RANGE BETWEEN 2592000 PRECEDING AND CURRENT ROW)
        |ORDER BY o_orderkey""".stripMargin,
    "q_sessionize" ->
      """WITH e AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts FROM events),
        |g AS (SELECT user_id, ts, event_id,
        |  CASE WHEN lag(ts) OVER w IS NULL
        |    OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000 THEN 1 ELSE 0 END
        |    AS is_new
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |s AS (SELECT user_id, ts, CAST(SUM(is_new) OVER (
        |  PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING)
        |  AS BIGINT) AS session_seq FROM g)
        |SELECT user_id, session_seq, COUNT(*) AS n_events,
        |  MIN(ts) AS session_start, MAX(ts) AS session_end
        |FROM s GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q_outliers" ->
      """WITH s AS (SELECT event_type, COUNT(value) AS n,
        |    SUM(CAST(value AS DECIMAL(28,8))) AS sm,
        |    SUM(CAST(value*value AS DECIMAL(38,10))) AS sq
        |  FROM events GROUP BY 1),
        |g AS (SELECT event_type, round(CAST(sm AS DOUBLE)/n, 6) AS group_mean,
        |    CASE WHEN n > 1 THEN round(sqrt(
        |      (CAST(sq AS DOUBLE) - CAST(sm AS DOUBLE)*(CAST(sm AS DOUBLE)/n))/(n-1)), 6)
        |    END AS group_stddev FROM s)
        |SELECT e.event_id, e.event_type, e.value, g.group_mean, g.group_stddev,
        |  (e.value - g.group_mean)/g.group_stddev AS zscore
        |FROM events e JOIN g USING (event_type)
        |WHERE g.group_stddev > 0
        |  AND abs((e.value - g.group_mean)/g.group_stddev) > 3.0
        |ORDER BY event_id""".stripMargin,
    "q_top_shingles" ->
      """WITH toks AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS tk
        |  FROM documents),
        |t AS (SELECT doc_id, CASE WHEN len(tk) >= 3 THEN
        |    list_distinct(list_transform(generate_series(1, len(tk) - 2),
        |      i -> array_to_string(tk[i:i+2], ' ')))
        |    ELSE [] END AS shs FROM toks),
        |sh AS (SELECT doc_id, unnest(shs) AS shingle FROM t)
        |SELECT shingle, COUNT(*) AS df_count FROM sh GROUP BY 1
        |ORDER BY df_count DESC, shingle LIMIT 50""".stripMargin,
    "q_profile" ->
      Seq("o_orderkey", "o_custkey", "o_totalprice").map(c =>
        s"""SELECT '$c' AS "column", COUNT(*) - COUNT($c) AS n_nulls,
           |  COUNT(DISTINCT $c) AS n_distinct,
           |  CAST(MIN($c) AS DOUBLE) AS min_value,
           |  CAST(MAX($c) AS DOUBLE) AS max_value FROM orders""".stripMargin)
        .mkString("", " UNION ALL ", """ ORDER BY "column""""),
    "q_json_flatten" ->
      """SELECT event_id, event_type,
        |  CAST(json_extract(props, '$.k') AS BIGINT) AS k
        |FROM events ORDER BY event_id""".stripMargin,
    "q_session_windows" ->
      """WITH e AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts FROM events),
        |g AS (SELECT user_id, ts, event_id,
        |  CASE WHEN lag(ts) OVER w IS NULL
        |    OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000 THEN 1 ELSE 0 END
        |    AS is_new
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |s AS (SELECT user_id, ts, SUM(is_new) OVER (
        |  PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING)
        |  AS session_seq FROM g)
        |SELECT user_id, MIN(ts) AS session_start,
        |  MAX(ts) + INTERVAL 30 MINUTE AS session_end, COUNT(*) AS n_events
        |FROM s GROUP BY user_id, session_seq ORDER BY user_id, session_start""".stripMargin,
    "q_scd2" ->
      """WITH e AS (SELECT event_id, user_id, event_type, value,
        |  CAST(ts AS TIMESTAMP) AS ts FROM events)
        |SELECT event_id, user_id, event_type, value, ts,
        |  ts AS effective_from,
        |  lead(ts) OVER w AS effective_to,
        |  CAST(row_number() OVER w AS BIGINT) AS version_seq,
        |  lead(ts) OVER w IS NULL AS is_current
        |FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |ORDER BY user_id, version_seq""".stripMargin,
    "q_table_counts" ->
      Seq("customer", "documents", "embeddings", "events", "lineitem", "orders")
        .map(n => s"SELECT '$n' AS table_name, COUNT(*) AS row_count FROM $n")
        .mkString("", " UNION ALL ", " ORDER BY table_name"),
    // count-from-metadata: count(*) and count(col) answered from the commit
    // log's row/null counts (lang3 = lang NULLed on every third doc)
    "q_count_cols" ->
      """SELECT count(*) AS n_all,
        |  count(CASE WHEN doc_id % 3 = 0 THEN NULL ELSE lang END) AS n_lang
        |FROM documents""".stripMargin,
    // time travel: version 0 was documents(<100); the as-of read must recover it
    "q_time_travel" ->
      "SELECT doc_id, lang FROM documents WHERE doc_id < 100 ORDER BY doc_id",
    // compaction: append(<50) + append(50-100) → compact → append(100-150); the
    // post-compact read must be exactly the union of every append
    "q_compaction" ->
      "SELECT doc_id, lang FROM documents WHERE doc_id < 150 ORDER BY doc_id",
    // merge: base(<400) + upserts[200,600) with rewritten lang + deletes[0,50)
    // → the exact post-merge state, stated directly
    "q_merge_upsert" ->
      """SELECT doc_id, lang, source FROM documents
        |WHERE doc_id >= 50 AND doc_id < 200
        |UNION ALL
        |SELECT doc_id, lang || '+u' AS lang, source FROM documents
        |WHERE doc_id >= 200 AND doc_id < 600
        |ORDER BY doc_id""".stripMargin,
    // native SQL UPDATE: the final table stated with a CASE over the base
    "q_sql_update" ->
      """SELECT doc_id, lang,
        |  CASE WHEN lang = 'en' AND doc_id < 300
        |       THEN source || '+u' ELSE source END AS source,
        |  CASE WHEN lang = 'en' AND doc_id < 300
        |       THEN n_chars + 10 ELSE n_chars END AS n_chars
        |FROM documents WHERE doc_id < 500 ORDER BY doc_id""".stripMargin,
    // native SQL MERGE (CDC shape): base(<400); changes [200,600) with lang+'+u',
    // kill marker on doc_id%5=0 — matched kills delete, matched others update,
    // unmatched non-kill insert, unmatched kills no-op
    "q_sql_merge" ->
      """SELECT doc_id, lang, source FROM documents WHERE doc_id < 200
        |UNION ALL
        |SELECT doc_id, lang || '+u' AS lang, source FROM documents
        |WHERE doc_id >= 200 AND doc_id < 600 AND doc_id % 5 <> 0
        |ORDER BY doc_id""".stripMargin,
    // partial-row MERGE: base(<400); matched [200,400) with doc_id%7<>0 get
    // lang||'+p' and n_chars+5 (source column UNSET → keeps target value);
    // unmatched [400,600) insert as-is
    "q_sql_merge_partial" ->
      """SELECT doc_id,
        |  CASE WHEN doc_id >= 200 AND doc_id % 7 <> 0
        |       THEN lang || '+p' ELSE lang END AS lang,
        |  source,
        |  CASE WHEN doc_id >= 200 AND doc_id % 7 <> 0
        |       THEN n_chars + 5 ELSE n_chars END AS n_chars
        |FROM documents WHERE doc_id < 400
        |UNION ALL
        |SELECT doc_id, lang, source, n_chars FROM documents
        |WHERE doc_id >= 400 AND doc_id < 600
        |ORDER BY doc_id""".stripMargin,
    // scoped compact: the logical content is unchanged by the rewrite —
    // docs < 500 minus the lang='en' doc_id%7=0 deletes
    "q_scoped_compact" ->
      """SELECT doc_id, lang, source FROM documents
        |WHERE doc_id < 500 AND NOT (lang = 'en' AND doc_id % 7 = 0)
        |ORDER BY doc_id""".stripMargin,
    // identity column: rid assigned densely by doc_id order per batch —
    // batch 1 (<300) starts at 1000 step 2; batch 2 [300,500) continues at
    // the watermark (1000 + 2 × batch-1 count)
    "q_identity_column" ->
      """SELECT doc_id, lang,
        |  1000 + 2 * (ROW_NUMBER() OVER (ORDER BY doc_id) - 1) AS rid
        |FROM documents WHERE doc_id < 300
        |UNION ALL
        |SELECT doc_id, lang,
        |  1000 + 2 * (SELECT count(*) FROM documents WHERE doc_id < 300)
        |       + 2 * (ROW_NUMBER() OVER (ORDER BY doc_id) - 1) AS rid
        |FROM documents WHERE doc_id >= 300 AND doc_id < 500
        |ORDER BY doc_id""".stripMargin,
    // staged replace: head = the replacement content [100,500) under the NEW
    // schema; pre_replace = the original CTAS content (<300) time-traveled
    "q_sql_replace" ->
      """SELECT 'head' AS state, doc_id, source AS tag, n_chars FROM documents
        |WHERE doc_id >= 100 AND doc_id < 500
        |UNION ALL
        |SELECT 'pre_replace' AS state, doc_id, lang AS tag,
        |  CAST(NULL AS BIGINT) AS n_chars
        |FROM documents WHERE doc_id < 300
        |ORDER BY state, doc_id""".stripMargin,
    // data-skipping probe over three range commits + one %50 UPDATE: the final
    // values under pruning, stated directly from the source table
    "q_file_skipping" ->
      """SELECT doc_id, lang, source,
        |  CASE WHEN doc_id % 50 = 0 THEN n_chars + 1000 ELSE n_chars END AS n_chars
        |FROM documents
        |WHERE doc_id BETWEEN 120 AND 380 AND lang = 'en'
        |ORDER BY doc_id""".stripMargin,
    // COPY INTO idempotence: two waves + a deliberate no-op re-run — the final
    // table is the source exactly once (a ledger regression duplicates wave one)
    "q_copy_into" ->
      """SELECT doc_id, lang, source, n_chars FROM documents
        |ORDER BY doc_id""".stripMargin,
    // column DDL: three insert waves under two successive DEFAULTs plus a
    // computed/validated generated column, every value restated from source
    "q_column_defaults" ->
      """SELECT doc_id, lang,
        |  CASE WHEN doc_id < 250 THEN 'unreviewed'
        |       WHEN doc_id < 500 THEN 'auto'
        |       ELSE 'gold' END AS quality,
        |  doc_id * 2 AS n2
        |FROM documents
        |ORDER BY doc_id""".stripMargin,
    // native CLUSTER BY: values under file-level pruning on a clustered load
    "q_cluster_by" ->
      """SELECT doc_id, lang, n_chars FROM documents
        |WHERE doc_id BETWEEN 100 AND 260
        |ORDER BY doc_id""".stripMargin,
    // schema-evolution MERGE: base(<400) with (doc_id, lang); source [200,600)
    // adds n_chars — pre-merge rows read NULL, matched rows update + carry it,
    // unmatched rows insert with it
    "q_sql_merge_evolution" ->
      """SELECT doc_id, lang, CAST(NULL AS BIGINT) AS n_chars FROM documents
        |WHERE doc_id < 200
        |UNION ALL
        |SELECT doc_id, lang || '+e' AS lang, n_chars FROM documents
        |WHERE doc_id >= 200 AND doc_id < 600
        |ORDER BY doc_id""".stripMargin,
    // full-sync MERGE: base(<400) mirrored to source [100,500) with lang||'+f';
    // stale rows <50 deleted, [50,100) flagged lang='stale'
    "q_sql_merge_full_sync" ->
      """SELECT doc_id, 'stale' AS lang, source FROM documents
        |WHERE doc_id >= 50 AND doc_id < 100
        |UNION ALL
        |SELECT doc_id, lang || '+f' AS lang, source FROM documents
        |WHERE doc_id >= 100 AND doc_id < 500
        |ORDER BY doc_id""".stripMargin,
    // merge-on-read merge: identical final-state contract as q_merge_upsert,
    // reached through deletion vectors + change-row appends instead of a rewrite
    "q_merge_on_read" ->
      """SELECT doc_id, lang, source FROM documents
        |WHERE doc_id >= 50 AND doc_id < 200
        |UNION ALL
        |SELECT doc_id, lang || '+u' AS lang, source FROM documents
        |WHERE doc_id >= 200 AND doc_id < 600
        |ORDER BY doc_id""".stripMargin,
    // change feed: one merge over base(<400) — upserts [200,600) with lang||'+u',
    // deletes doc_id%5=0 among them. Row-level deltas stated directly; delete
    // no-ops (missing keys) emit nothing, deletes carry the OLD values.
    "q_change_feed" ->
      """WITH d AS (SELECT doc_id, lang FROM documents)
        |SELECT * FROM (
        |  SELECT doc_id, lang, 'delete' AS change_type,
        |    CAST(1 AS BIGINT) AS commit_version
        |  FROM d WHERE doc_id >= 200 AND doc_id < 400 AND doc_id % 5 = 0
        |  UNION ALL
        |  SELECT doc_id, lang, 'update_preimage', 1
        |  FROM d WHERE doc_id >= 200 AND doc_id < 400 AND doc_id % 5 <> 0
        |  UNION ALL
        |  SELECT doc_id, lang || '+u', 'update_postimage', 1
        |  FROM d WHERE doc_id >= 200 AND doc_id < 400 AND doc_id % 5 <> 0
        |  UNION ALL
        |  SELECT doc_id, lang || '+u', 'insert', 1
        |  FROM d WHERE doc_id >= 400 AND doc_id < 600 AND doc_id % 5 <> 0
        |) ORDER BY doc_id, change_type""".stripMargin,
    // bloom-pruned dedup is EXACT anti-join semantics — the bloom only prunes the
    // verify join, so the oracle is the plain NOT EXISTS
    "q_bloom_dedup" ->
      """SELECT d.doc_id, md5(d.text) AS text_hash FROM documents d
        |WHERE d.doc_id >= 400
        |  AND NOT EXISTS (SELECT 1 FROM documents c
        |                  WHERE c.doc_id < 400 AND md5(c.text) = md5(d.text))
        |ORDER BY d.doc_id""".stripMargin,
    // heavy hitters: exact membership + counts above 0.1% of rows; the Spark side
    // must agree although it counted only sketch-nominated candidates
    "q_heavy_hitters" ->
      """SELECT CAST(o_custkey AS VARCHAR) AS item,
        |  count(*) AS item_count,
        |  CAST(count(*) AS DOUBLE) / (SELECT count(*) FROM orders) AS share
        |FROM orders GROUP BY 1
        |HAVING count(*) > 0.001 * (SELECT count(*) FROM orders)
        |ORDER BY item""".stripMargin,
    // DuckDB CAN see the filesystem: read_blob exposes filename + on-disk size per
    // file. DuckDB table functions reject subquery arguments, so the scanned glob
    // cannot be computed inside the SQL — Verify substitutes the __SF_DIR__ token
    // with its actual sfDir when dumping oracle_sql.json, making the oracle follow
    // whatever directory the gate mounts. The IN list scopes both sides to exactly
    // Tables.all, so stray .parquet files in the sfdir cannot diverge the compare.
    // C4-style chunk dedup: corpus-wide count + first-occurrence keep, replayed
    // with window functions (the semantics, not the plan — Spark counts via a
    // map-side-combined groupBy and joins back)
    "q_chunk_dedup" ->
      """WITH t AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks FROM documents),
        |s AS (
        |  SELECT doc_id, toks, unnest(generate_series(0, len(toks) - 1, 20)) AS start
        |  FROM t),
        |c AS (
        |  SELECT doc_id, CAST(start / 20 AS BIGINT) AS chunk_id,
        |    array_to_string(toks[start + 1 : start + 20], ' ') AS chunk_text FROM s),
        |f AS (
        |  SELECT doc_id, chunk_id, chunk_text,
        |    count(*) OVER (PARTITION BY md5(chunk_text)) AS cnt,
        |    row_number() OVER (PARTITION BY md5(chunk_text)
        |                       ORDER BY doc_id, chunk_id) AS rn
        |  FROM c)
        |SELECT doc_id,
        |  coalesce(string_agg(CASE WHEN cnt <= 1 OR rn = 1 THEN chunk_text END,
        |                      ' ' ORDER BY chunk_id), '') AS clean_text,
        |  count(*) AS n_chunks,
        |  CAST(sum(CASE WHEN cnt <= 1 OR rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
        |FROM f GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // mixture plan: identical token sums, rounding chain, and status CASE;
    // the VALUES list is generated from the same Scala constants the query uses
    "q_mixture_plan" -> {
      val values = mixtureTargets
        .map { case (s, w) => s"('$s', $w)" }.mkString(", ")
      s"""WITH avail AS (
         |  SELECT source, count(*) AS n_docs,
         |    CAST(sum(len(string_split_regex(trim(text), '\\s+'))) AS BIGINT)
         |      AS available_tokens
         |  FROM documents GROUP BY 1),
         |t(source, weight) AS (VALUES $values),
         |j AS (
         |  SELECT coalesce(a.source, t.source) AS source,
         |    coalesce(a.n_docs, 0) AS n_docs,
         |    coalesce(a.available_tokens, 0) AS available_tokens,
         |    coalesce(CAST(t.weight AS DOUBLE), 0.0) AS weight
         |  FROM avail a FULL OUTER JOIN t ON a.source = t.source),
         |p AS (
         |  SELECT *, CAST(round(weight * $mixtureBudget) AS BIGINT) AS target_tokens
         |  FROM j),
         |r AS (
         |  SELECT *, CASE WHEN available_tokens > 0
         |      THEN round(CAST(target_tokens AS DOUBLE) / available_tokens, 6)
         |    END AS sampling_rate
         |  FROM p)
         |SELECT source, n_docs, available_tokens, weight, target_tokens, sampling_rate,
         |  CAST(ceil(coalesce(sampling_rate, 0.0)) AS INT) AS epochs,
         |  CASE WHEN weight = 0 THEN 'unused'
         |       WHEN available_tokens = 0 THEN 'missing'
         |       WHEN sampling_rate > 1 THEN 'upsample'
         |       WHEN sampling_rate < 1 THEN 'downsample'
         |       ELSE 'exact' END AS status
         |FROM r ORDER BY source""".stripMargin
    },
    // incremental view maintenance: the oracle states the FINAL row set the
    // feed-maintained view must aggregate to — base rows untouched below 100,
    // updated (+1) where the merge hit and did not delete, appended [400,500)
    "q_incremental_view" ->
      """WITH final AS (
        |  SELECT lang, n_chars FROM documents WHERE doc_id < 100
        |  UNION ALL
        |  SELECT lang, n_chars + 1 FROM documents
        |  WHERE doc_id >= 100 AND doc_id < 400 AND doc_id % 3 <> 0
        |  UNION ALL
        |  SELECT lang, n_chars FROM documents WHERE doc_id >= 400 AND doc_id < 500)
        |SELECT lang, count(*) AS n_rows,
        |  CAST(sum(n_chars) AS DOUBLE) AS sum_n_chars
        |FROM final GROUP BY lang ORDER BY lang""".stripMargin,
    // deletion vectors: base(<600) minus two DV deletes (every 7th doc, then
    // German docs) — the oracle states the survivors; NO file was rewritten on
    // the Spark side, so a leaked or lost row is a DV resolution bug
    "q_delete_where" ->
      """SELECT doc_id, lang, source FROM documents
        |WHERE doc_id < 600 AND doc_id % 7 <> 0 AND lang <> 'de'
        |ORDER BY doc_id""".stripMargin,
    // merge-on-read update: English docs' n_chars shifted by +1000, everything
    // else untouched — served from the ORIGINAL files plus the update commit
    "q_update_where" ->
      """SELECT doc_id, lang,
        |  CASE WHEN lang = 'en' THEN n_chars + 1000 ELSE n_chars END AS n_chars
        |FROM documents WHERE doc_id < 600
        |ORDER BY doc_id""".stripMargin,
    // DV delete committed WITHOUT a feed: readChanges must reconstruct the
    // deleted rows exactly (old values, 'delete' type, the delete's version)
    "q_delete_cdf" ->
      """SELECT doc_id, lang, 'delete' AS change_type,
        |  CAST(1 AS BIGINT) AS commit_version
        |FROM documents WHERE doc_id < 400 AND doc_id % 9 = 4
        |ORDER BY doc_id""".stripMargin,
    // curation pipeline: all four stages replayed in one SQL chain — quality
    // gate, window-replayed priority dedup, NOT-IN decontamination, md5-cut
    // stratified sampling
    "q_curation_pipeline" ->
      """WITH q AS (
        |  SELECT doc_id, text, lang, source, n_chars,
        |    CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_tokens
        |  FROM documents
        |  WHERE len(string_split_regex(trim(text), '\s+')) >= 50
        |    AND CAST(n_chars AS DOUBLE) / len(string_split_regex(trim(text), '\s+'))
        |        BETWEEN 3.0 AND 12.0),
        |a AS (
        |  SELECT doc_id, text, lang, source, n_tokens FROM q
        |  UNION ALL
        |  SELECT doc_id + 10000, text, lang, 'mirror_' || source, n_tokens FROM q),
        |p AS (
        |  SELECT *, doc_id % 3 AS priority,
        |    row_number() OVER (PARTITION BY md5(text)
        |                       ORDER BY doc_id % 3, doc_id) AS rn
        |  FROM a),
        |d AS (SELECT * FROM p WHERE rn = 1),
        |c AS (
        |  SELECT * FROM d WHERE md5(text) NOT IN
        |    (SELECT md5(text) FROM documents WHERE doc_id % 97 = 13)),
        |s AS (
        |  SELECT * FROM c
        |  WHERE CAST(concat('0x', substring(md5(CAST(doc_id AS VARCHAR)), 1, 15))
        |        AS BIGINT) % 1000
        |    < CASE WHEN lang = 'en' THEN 500 WHEN lang = 'zh' THEN 1000
        |           ELSE 250 END)
        |SELECT doc_id, lang, source, priority, n_tokens FROM s
        |ORDER BY doc_id""".stripMargin,
    // column mapping: one logical schema across pre- and post-rename commits,
    // dropped column absent
    "q_rename_column" ->
      """SELECT doc_id, lang AS language FROM documents WHERE doc_id < 500
        |ORDER BY doc_id""".stripMargin,
    // ADD COLUMN: typed NULL before the declaring append, real values after
    "q_add_column" ->
      """SELECT doc_id, lang, CAST(NULL AS DOUBLE) AS score FROM documents
        |WHERE doc_id < 300
        |UNION ALL
        |SELECT doc_id, lang, n_chars / 1000.0 AS score FROM documents
        |WHERE doc_id >= 300 AND doc_id < 500
        |ORDER BY doc_id""".stripMargin,
    // type widening: int-file rows surface as BIGINT, the post-widen append
    // carries values no INT can hold
    "q_widen_column" ->
      """SELECT CAST(doc_id AS BIGINT) AS n, lang FROM documents
        |WHERE doc_id < 300
        |UNION ALL
        |SELECT doc_id + 3000000000 AS n, lang FROM documents
        |WHERE doc_id >= 300 AND doc_id < 500
        |ORDER BY n""".stripMargin,
    // dynamic partition overwrite: untouched partitions from the base, the
    // replaced 'en' partition from the new batch — stated directly
    "q_replace_partition" ->
      """SELECT doc_id, lang, source FROM documents
        |WHERE doc_id < 400 AND lang <> 'en'
        |UNION ALL
        |SELECT doc_id, lang, source FROM documents
        |WHERE doc_id >= 400 AND doc_id < 500 AND lang = 'en'
        |ORDER BY doc_id""".stripMargin,
    // DSv2 SQL catalog: head = post-DELETE survivors, pre_delete = the VERSION AS
    // OF 2 snapshot (CTAS + INSERT, before the DV commit) — stated directly
    "q_sql_catalog" ->
      """SELECT 'head' AS state, doc_id, lang, source FROM documents
        |WHERE doc_id < 500 AND lang <> 'en'
        |UNION ALL
        |SELECT 'pre_delete' AS state, doc_id, lang, source FROM documents
        |WHERE doc_id < 500
        |ORDER BY state, doc_id""".stripMargin,
    // generated columns: the oracle states the declared expression over the
    // written rows — both commits must carry the computed value
    "q_generated_columns" ->
      """SELECT doc_id, lang, n_chars,
        |  CASE WHEN n_chars < 500 THEN 'short' ELSE 'long' END AS len_class
        |FROM documents WHERE doc_id < 500
        |ORDER BY doc_id""".stripMargin,
    // DP counts: identical md5(seed, key) -> 10^6-quantized uniform -> Laplace
    // inverse-CDF arithmetic, rounded to 6dp on both engines
    "q_dp_counts" ->
      """WITH c AS (
        |  SELECT lang, source, count(*) AS true_count FROM documents GROUP BY 1, 2),
        |u AS (
        |  SELECT *, (CAST(concat('0x', substring(
        |      md5('r7' || chr(1) || lang || chr(1) || source), 1, 15)) AS BIGINT)
        |      % 1000000 + 0.5) / 1000000.0 AS uu
        |  FROM c)
        |SELECT lang, source, true_count,
        |  round(true_count + (-1.0) * sign(uu - 0.5) * ln(1 - 2 * abs(uu - 0.5)), 6)
        |    AS dp_count
        |FROM u ORDER BY lang, source""".stripMargin,
    // schema time travel: each state's column list stated literally
    "q_schema_time_travel" ->
      """WITH d AS (SELECT doc_id, lang FROM documents)
        |SELECT 'head' AS state, 'doc_id|lang|comment' AS table_schema,
        |  (SELECT count(*) FROM d WHERE doc_id < 300) AS n_rows,
        |  (SELECT count(*) FROM d WHERE doc_id >= 250 AND doc_id < 300) AS n_valued
        |UNION ALL
        |SELECT 'v0', 'doc_id|lang',
        |  (SELECT count(*) FROM d WHERE doc_id < 200), CAST(0 AS BIGINT)
        |UNION ALL
        |SELECT 'v1', 'doc_id|lang|note',
        |  (SELECT count(*) FROM d WHERE doc_id < 250), CAST(0 AS BIGINT)
        |ORDER BY state""".stripMargin,
    // keyword tagging: positional replay of every end-position match
    "q_keyword_tags" ->
      """WITH t AS (SELECT doc_id, lower(coalesce(text, '')) AS s FROM documents),
        |k AS (SELECT unnest(['a', 'data', 'merge', 'win', 'window']) AS kw),
        |m AS (
        |  SELECT t.doc_id, k.kw,
        |    len([i for i in range(1, len(t.s) - len(k.kw) + 2)
        |         if substr(t.s, i, len(k.kw)) = k.kw]) AS hits
        |  FROM t CROSS JOIN k)
        |SELECT doc_id,
        |  CAST(sum(hits) AS BIGINT) AS kw_total,
        |  CAST(count(*) FILTER (WHERE hits > 0) AS BIGINT) AS kw_distinct,
        |  coalesce(string_agg(kw, ',' ORDER BY kw) FILTER (WHERE hits > 0), '')
        |    AS kw_list
        |FROM m GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // score calibration: identical percent_rank window in both engines
    "q_score_calibration" ->
      """SELECT doc_id, source, n_chars,
        |  percent_rank() OVER (PARTITION BY source ORDER BY n_chars) AS score_cal
        |FROM documents ORDER BY doc_id""".stripMargin,
    // DP sum release: replay clip → DECIMAL-exact sum → tagged md5 Laplace
    "q_dp_sums" ->
      """WITH g AS (
        |  SELECT lang, source,
        |    CAST(SUM(CAST(round(least(greatest(CAST(n_chars AS DOUBLE), 0.0),
        |      500.0), 6) AS DECIMAL(28,6))) AS DOUBLE) AS true_sum
        |  FROM documents GROUP BY 1, 2),
        |u AS (
        |  SELECT *, (CAST(concat('0x', substring(
        |      md5('r8' || chr(1) || 'sum:n_chars' || chr(1) || lang || chr(1)
        |        || source), 1, 15)) AS BIGINT)
        |      % 1000000 + 0.5) / 1000000.0 AS uu
        |  FROM g)
        |SELECT lang, source, true_sum,
        |  round(true_sum + (-500.0) * sign(uu - 0.5) * ln(1 - 2 * abs(uu - 0.5)), 6)
        |    AS dp_sum
        |FROM u ORDER BY lang, source""".stripMargin,
    // DP mean release: both split-budget halves replayed, guarded quotient
    "q_dp_means" ->
      """WITH g AS (
        |  SELECT lang, source, count(*) AS true_count,
        |    CAST(SUM(CAST(round(least(greatest(CAST(n_chars AS DOUBLE), 0.0),
        |      500.0), 6) AS DECIMAL(28,6))) AS DOUBLE) AS true_sum
        |  FROM documents GROUP BY 1, 2),
        |u AS (
        |  SELECT *,
        |    (CAST(concat('0x', substring(
        |      md5('r8m' || chr(1) || 'sum:n_chars' || chr(1) || lang || chr(1)
        |        || source), 1, 15)) AS BIGINT)
        |      % 1000000 + 0.5) / 1000000.0 AS us,
        |    (CAST(concat('0x', substring(
        |      md5('r8m' || chr(1) || lang || chr(1) || source), 1, 15)) AS BIGINT)
        |      % 1000000 + 0.5) / 1000000.0 AS uc
        |  FROM g),
        |r AS (
        |  SELECT lang, source, true_sum, true_count,
        |    round(true_sum + (-1000.0) * sign(us - 0.5) * ln(1 - 2 * abs(us - 0.5)), 6)
        |      AS dp_sum,
        |    round(true_count + (-2.0) * sign(uc - 0.5) * ln(1 - 2 * abs(uc - 0.5)), 6)
        |      AS dp_count
        |  FROM u)
        |SELECT lang, source, true_sum, true_count, dp_sum, dp_count,
        |  round(dp_sum / greatest(dp_count, 1.0), 6) AS dp_mean
        |FROM r ORDER BY lang, source""".stripMargin,
    // length-bucketed batching: identical integer bucket edge (2^bitlength via
    // bin()), window batch numbering, and padding arithmetic
    "q_length_buckets" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_tokens
        |  FROM documents),
        |b AS (
        |  SELECT *, least(greatest(
        |      (CAST(1 AS BIGINT) << length(bin(greatest(n_tokens, 2) - 1))),
        |      16), 1024) AS bucket_cap
        |  FROM t),
        |r AS (
        |  SELECT *, row_number() OVER (PARTITION BY bucket_cap ORDER BY doc_id) AS rn
        |  FROM b)
        |SELECT doc_id, n_tokens, bucket_cap,
        |  concat(bucket_cap, '#0#', (rn - 1) // 8) AS batch_id,
        |  greatest(bucket_cap - n_tokens, 0) AS padding
        |FROM r ORDER BY doc_id""".stripMargin,
    // sharded variant: the oracle replays the md5 shard assignment (same
    // formula as q_shards) and numbers batches within (bucket_cap, shard)
    "q_length_buckets_sharded" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_tokens,
        |    CAST(CAST(concat('0x', substring(md5(CAST(doc_id AS VARCHAR)), 1, 15))
        |      AS BIGINT) % 4 AS INT) AS shard
        |  FROM documents),
        |b AS (
        |  SELECT *, least(greatest(
        |      (CAST(1 AS BIGINT) << length(bin(greatest(n_tokens, 2) - 1))),
        |      16), 1024) AS bucket_cap
        |  FROM t),
        |r AS (
        |  SELECT *, row_number() OVER (PARTITION BY bucket_cap, shard
        |    ORDER BY doc_id) AS rn
        |  FROM b)
        |SELECT doc_id, n_tokens, bucket_cap,
        |  concat(bucket_cap, '#', shard, '#', (rn - 1) // 8) AS batch_id,
        |  greatest(bucket_cap - n_tokens, 0) AS padding
        |FROM r ORDER BY doc_id""".stripMargin,
    // priority dedup: per content hash keep the min-(priority, doc_id) copy;
    // the oracle replays the rule with a window (semantics, not the plan —
    // Spark keeps winners via a map-side-combined min_by agg, never a sort)
    "q_dedup_priority" ->
      """WITH all_docs AS (
        |  SELECT doc_id, text, source FROM documents
        |  UNION ALL
        |  SELECT doc_id + 10000, text, 'mirror_' || source FROM documents),
        |r AS (
        |  SELECT doc_id, source, doc_id % 3 AS priority,
        |    row_number() OVER (PARTITION BY md5(text)
        |                       ORDER BY doc_id % 3, doc_id) AS rn
        |  FROM all_docs)
        |SELECT doc_id, source, priority FROM r WHERE rn = 1
        |ORDER BY doc_id""".stripMargin,
    // shallow clone: source(<300) minus the DV delete, plus ONLY the clone's
    // own append [300,350); the source's post-clone append (>=900) must not leak
    "q_shallow_clone" ->
      """SELECT doc_id, lang FROM documents
        |WHERE (doc_id < 300 AND doc_id % 11 <> 2)
        |   OR (doc_id >= 300 AND doc_id < 350)
        |ORDER BY doc_id""".stripMargin,
    // restore: the oracle states the post-rollback content directly — the base,
    // the pre-mistake append, and the post-restore append; the overwritten
    // mistake must leave no trace
    "q_restore" ->
      """SELECT doc_id, lang FROM documents WHERE doc_id < 350
        |ORDER BY doc_id""".stripMargin,
    // k-anonymity / l-diversity: one grouped aggregation, engine-identical
    "q_k_anonymity" ->
      """SELECT c_nationkey, c_mktsegment,
        |  count(*) AS class_size,
        |  count(DISTINCT c_acctbal) AS distinct_sensitive,
        |  count(*) >= 8 AS k_anonymous,
        |  count(DISTINCT c_acctbal) >= 6 AS l_diverse
        |FROM customer GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // entropy l-diversity: per-(class, value) counts, then the per-class fold
    // H = ln(N) - Σ n·ln(n)/N — the oracle replays the identical arithmetic
    "q_l_diversity" ->
      """WITH counts AS (
        |  SELECT c_nationkey, c_mktsegment, count(*) AS n
        |  FROM customer GROUP BY 1, 2)
        |SELECT c_nationkey,
        |  CAST(sum(n) AS BIGINT) AS class_size,
        |  count(*) AS distinct_sensitive,
        |  round(ln(sum(n)) - sum(n * ln(n)) / sum(n), 6) AS sensitive_entropy,
        |  sum(n) >= 8 AS k_anonymous,
        |  count(*) >= 5 AS l_diverse,
        |  (ln(sum(n)) - sum(n * ln(n)) / sum(n)) >= ln(5) AS entropy_l_diverse
        |FROM counts GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_catalog_stats" ->
      s"""SELECT regexp_extract(filename, '([^/]+)\\.parquet$$', 1) AS table_name,
         |  CAST(count(*) AS BIGINT) AS n_files,
         |  CAST(sum(size) AS BIGINT) AS total_bytes
         |FROM read_blob('__SF_DIR__/*.parquet')
         |WHERE regexp_extract(filename, '([^/]+)\\.parquet$$', 1) IN
         |  (${Tables.all.map(t => s"'$t'").mkString(", ")})
         |GROUP BY 1 ORDER BY table_name""".stripMargin)
}
