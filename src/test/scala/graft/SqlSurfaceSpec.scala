package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{Registry, RollingHash}
import graft.streaming.LakeWriter

class SqlSurfaceSpec extends AnyFunSuite with SharedSpark {

  test("GraftExtensions injects every native function into a fresh registry") {
    import org.apache.spark.sql.SparkSessionExtensions
    val ext = new SparkSessionExtensions
    new GraftExtensions().apply(ext)
    val reg = org.apache.spark.sql.graft.ExtensionsProbe.registeredInto(ext)
    for ((ident, _, _) <- graft.functions.Registry.injectables)
      assert(reg.functionExists(ident), s"missing injected function $ident")
  }

  test("custom expressions are callable from spark.sql") {
    Registry.registerAll(spark)
    val r = spark.sql(
      """SELECT rolling_hash('hello world') AS rh,
        |  simhash64('alpha beta gamma') AS sh,
        |  dot_product(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS dp""".stripMargin)
      .first()
    assert(r.getAs[Long]("rh") === RollingHash.hashString("hello world"))
    assert(r.getAs[Double]("dp") === 11.0)
    assert(r.getAs[Long]("sh") !== 0L)
  }

  test("custom aggregate and shingles are callable from spark.sql") {
    Registry.registerAll(spark)
    Tables.documents(spark, sf).createOrReplaceTempView("docs_sql")
    val agg = spark.sql(
      """SELECT lang, bottom_k_by_key(md5(text), text, 2) AS sample
        |FROM docs_sql GROUP BY lang""".stripMargin)
    assert(agg.count() === 5) // one row per language
    assert(agg.selectExpr("size(sample)").collect().forall(_.getInt(0) == 2))
    val sh = spark.sql("SELECT word_shingles('a b c d', 3) AS s").first().getSeq[String](0)
    assert(sh === Seq("a b c", "b c d"))
  }

  test("SQL functions agree with the Column API on real data") {
    Registry.registerAll(spark)
    Tables.documents(spark, sf).createOrReplaceTempView("docs_v")
    val viaSql = spark.sql(
      "SELECT doc_id, simhash64(text) AS simhash FROM docs_v ORDER BY doc_id")
    val viaApi = graft.ops.Dedup.simHash(Tables.documents(spark, sf))
      .orderBy("doc_id")
    assert(viaSql.exceptAll(viaApi).count() === 0)
  }

  test("pure-SQL near-dup: ngram Jaccard recipe matches the Scala operator") {
    Registry.registerAll(spark)
    val docs = Tables.documents(spark, sf)
    docs.createOrReplaceTempView("docs_recipe")
    val viaSql = spark.sql(graft.ops.SqlRecipes.ngramJaccardPairsSql(
      "docs_recipe", threshold = 0.3))
    val viaApi = graft.ops.Dedup.ngramJaccardPairs(docs, threshold = 0.3)
    assert(viaSql.count() > 0)
    assert(viaSql.exceptAll(viaApi).count() === 0)
    assert(viaApi.exceptAll(viaSql).count() === 0)
  }

  test("pure-SQL chunk dedup recipe matches the Scala operator") {
    val docs = Tables.documents(spark, sf)
    docs.createOrReplaceTempView("docs_chunkdedup")
    val viaSql = spark.sql(graft.ops.SqlRecipes.chunkDedupSql(
      "docs_chunkdedup", chunkWords = 10))
    val viaApi = graft.ops.ChunkDedup.dedupChunks(docs, chunkWords = 10)
    assert(viaSql.count() === docs.count())
    // non-vacuous: the corpus must actually contain over-replicated chunks
    assert(viaApi.filter(org.apache.spark.sql.functions
      .col("n_kept") < org.apache.spark.sql.functions.col("n_chunks")).count() > 0)
    assert(viaSql.exceptAll(viaApi).count() === 0)
    assert(viaApi.exceptAll(viaSql).count() === 0)
  }

  test("pure-SQL sentence recipes match the Scala operators row for row") {
    // inject terminators so the segmentation is non-vacuous on the fixture
    val docs = Tables.documents(spark, sf).select(col("doc_id"),
      regexp_replace(regexp_replace(coalesce(col("text"), lit("")),
        "table ", "table. "), "row ", "row! ").as("text"))
    docs.createOrReplaceTempView("docs_sentences")

    val segSql = spark.sql(graft.ops.SqlRecipes.sentencesSql("docs_sentences"))
    val segApi = graft.ops.TextAnalysis.sentences(docs)
    assert(segSql.count() > docs.count(), "segmentation must be non-vacuous")
    assert(segSql.exceptAll(segApi).count() === 0)
    assert(segApi.exceptAll(segSql).count() === 0)

    val dedupSql = spark.sql(graft.ops.SqlRecipes.sentenceDedupSql(
      "docs_sentences", maxOccurrences = 2))
    val dedupApi = graft.ops.ChunkDedup.dedupSentences(docs, maxOccurrences = 2)
    assert(dedupApi.filter(col("n_kept") < col("n_sentences")).count() > 0,
      "the corpus must actually contain over-replicated sentences")
    assert(dedupSql.exceptAll(dedupApi).count() === 0)
    assert(dedupApi.exceptAll(dedupSql).count() === 0)
  }

  test("pure-SQL main-content recipe matches HtmlExtract.mainContent row for row") {
    val wrapped = Tables.documents(spark, sf).select(col("doc_id"), concat(
      lit("<html><body><div id=\"nav\"><a href=\"/\">Home</a> " +
        "<a href=\"/a\">About</a></div><p>"),
      coalesce(col("text"), lit("")),
      lit(" extra tail.</p><ul><li><a href=\"/x\">Linked item</a></li></ul>" +
        "<div>(c) chrome</div></body></html>")).as("html"))
    wrapped.createOrReplaceTempView("docs_mc")
    val viaSql = spark.sql(graft.ops.SqlRecipes.mainContentSql("docs_mc"))
    val viaApi = graft.ops.HtmlExtract.mainContent(wrapped)
    assert(viaApi.filter(col("n_kept") < col("n_blocks")).count() > 0,
      "the wrap must actually contain dropped boilerplate blocks")
    assert(viaSql.exceptAll(viaApi).count() === 0)
    assert(viaApi.exceptAll(viaSql).count() === 0)
  }

  test("pure-SQL gopher filter matches gopherFilter row for row") {
    val docs = Tables.documents(spark, sf)
    docs.createOrReplaceTempView("docs_gopher")
    val cfg = graft.ops.TextAnalysis.GopherConfig(
      minWords = 20, maxWords = 80, minStopHits = 1)
    val viaSql = spark.sql(graft.ops.SqlRecipes.gopherFilterSql("docs_gopher", cfg))
    val viaApi = graft.ops.TextAnalysis.gopherFilter(docs, cfg)
    assert(viaSql.count() > 0 && viaSql.count() < docs.count())
    assert(viaSql.exceptAll(viaApi).count() === 0)
    assert(viaApi.exceptAll(viaSql).count() === 0)
  }

  test("pure-SQL per-source cap matches capGroups row for row") {
    val docs = Tables.documents(spark, sf)
    docs.createOrReplaceTempView("docs_caps")
    val viaSql = spark.sql(graft.ops.SqlRecipes.capGroupsSql("docs_caps", "source", 7))
    val viaApi = graft.ops.Splits.capGroups(docs, "source", 7)
    assert(viaSql.count() > 0)
    assert(viaSql.exceptAll(viaApi).count() === 0)
    assert(viaApi.exceptAll(viaSql).count() === 0)
  }

  test("pure-SQL near-dup: simhash banding recipe matches the Scala operator") {
    Registry.registerAll(spark)
    val docs = Tables.documents(spark, sf)
    docs.createOrReplaceTempView("docs_simhash")
    val viaSql = spark.sql(graft.ops.SqlRecipes.simhashNearPairsSql("docs_simhash"))
    val viaApi = graft.ops.Dedup.simHashNearPairs(graft.ops.Dedup.simHash(docs))
    assert(viaSql.exceptAll(viaApi).count() === 0)
    assert(viaApi.exceptAll(viaSql).count() === 0)
  }

  test("pure-SQL contamination recipe matches the Scala operator") {
    Registry.registerAll(spark)
    val docs = Tables.documents(spark, sf)
    val reference = docs.filter(col("doc_id") % 25 === 0)
    docs.createOrReplaceTempView("corpus_recipe")
    reference.createOrReplaceTempView("ref_recipe")
    val viaSql = spark.sql(graft.ops.SqlRecipes.contaminationSql(
      "corpus_recipe", "ref_recipe", threshold = 0.3))
    val viaApi = graft.ops.Dedup.contamination(docs, reference, threshold = 0.3)
    assert(viaSql.count() > 0)
    assert(viaSql.exceptAll(viaApi).count() === 0)
    assert(viaApi.exceptAll(viaSql).count() === 0)
  }

  test("pure-SQL SCD2 build matches Scd2.history, including delete suppression") {
    import spark.implicits._
    val changes = Seq(
      (1L, "a1", 10L, 1L, "c"),
      (1L, "a2", 20L, 2L, "u"),
      (1L, "a3", 30L, 3L, "d"), // delete: closes a2, emits no version
      (2L, "b1", 15L, 1L, "c"),
      (2L, "b2", 15L, 2L, "u"), // same-ts tie broken by seq
      (3L, "c1", 40L, 1L, "c"))
      .toDF("id", "payload", "ts", "seq", "op")
    changes.createOrReplaceTempView("scd2_changes")
    val viaSql = spark.sql(graft.ops.SqlRecipes.scd2Sql(
      "scd2_changes", key = Seq("id"), tsCol = "ts", tieBreak = Seq("seq"),
      opCol = Some("op")))
    val viaApi = graft.ops.Scd2.history(changes, key = Seq("id"), tsCol = "ts",
      tieBreak = Seq("seq"), opCol = Some("op"))
    assert(viaSql.columns.toSeq === viaApi.columns.toSeq)
    assert(viaSql.exceptAll(viaApi).count() === 0)
    assert(viaApi.exceptAll(viaSql).count() === 0)
    // chaining: installView makes the history queryable downstream in SQL
    graft.ops.SqlRecipes.installView(spark, "scd2_hist",
      graft.ops.SqlRecipes.scd2Sql("scd2_changes", Seq("id"), "ts", Seq("seq"),
        Some("op")))
    assert(spark.sql("SELECT count(*) FROM scd2_hist WHERE is_current")
      .first().getLong(0) === 2) // id=1 deleted, id=2 and id=3 current
  }

  test("pure-SQL fuzzy pairs recipe matches FuzzyJoin at depth 1") {
    val names = spark.read.parquet(s"$sf/customer.parquet")
      .selectExpr("c_custkey AS id", "c_name AS s")
    names.createOrReplaceTempView("names_fuzzy")
    import spark.implicits._
    // set-compare on the projected key columns: exceptAll over the LATERAL VIEW
    // plan trips a Spark binding bug (attribute pruned out of GenerateExec)
    def pairSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Int)] =
      df.select("id_1", "id_2", "dist").as[(Long, Long, Int)].collect().toSet
    val viaSql = pairSet(spark.sql(graft.ops.SqlRecipes.fuzzyPairsSql("names_fuzzy")))
    val viaApi = pairSet(
      graft.ops.FuzzyJoin.editDistancePairs(names, "id", "s", maxDist = 1))
    assert(viaSql.nonEmpty)
    assert(viaSql === viaApi)
  }

  test("pure-SQL quality score matches QualityClassifier.score bit-for-bit") {
    val docs = Tables.documents(spark, sf)
    docs.createOrReplaceTempView("docs_quality")
    val w = Seq(-2.0, 0.25, 0.5, -0.25, -4.0, 1.5)
    val viaSql = spark.sql(graft.ops.SqlRecipes.qualityScoreSql("docs_quality", w))
    val viaApi = graft.ops.QualityClassifier.score(docs, w)
    assert(viaSql.count() === docs.count())
    // identical expression trees → identical doubles, so exact set compare holds
    assert(viaSql.exceptAll(viaApi).count() === 0)
    assert(viaApi.exceptAll(viaSql).count() === 0)
  }

  test("pure-SQL BM25 recipe matches the Scala operator") {
    val docs = Tables.documents(spark, sf)
    docs.createOrReplaceTempView("docs_bm25")
    val terms = Seq("hash", "join", "vector")
    val viaSql = spark.sql(graft.ops.SqlRecipes.bm25TopKSql("docs_bm25", terms, k = 20))
    val viaApi = graft.ops.Bm25.topK(docs, terms, k = 20)
    assert(viaSql.count() === 20)
    assert(viaSql.exceptAll(viaApi).count() === 0)
    assert(viaApi.exceptAll(viaSql).count() === 0)
  }

  test("pure-SQL funnel recipe matches the Scala operator") {
    val ev = Tables.eventsMicros(spark, sf)
    ev.createOrReplaceTempView("events_funnel")
    val steps = Seq("view", "click", "purchase")
    val win = 24L * 3600 * 1000000
    val viaSql = spark.sql(graft.ops.SqlRecipes.funnelSql("events_funnel", steps, win))
    val viaApi = graft.ops.Funnel.userFunnel(ev, steps, win)
    assert(viaSql.count() > 0)
    assert(viaSql.exceptAll(viaApi).count() === 0)
    assert(viaApi.exceptAll(viaSql).count() === 0)
  }

  test("producer encoding: to_json messages roundtrip through from_json (K1)") {
    val src = graft.model.RefAdapter.orders(Tables.orders(spark, sf))
    val messages = LakeWriter.toJsonMessages(src)
    assert(messages.columns.toSeq === Seq("value"))
    val back = messages
      .select(from_json(col("value"), src.schema).as("r"))
      .select(col("r.*"))
    assert(back.exceptAll(src).count() === 0)
    assert(src.exceptAll(back).count() === 0)
  }

  test("GraftSession builder carries the engine configuration") {
    // the shared test session already exists; builder conf is inspected without starting
    val conf = GraftSession.builder("probe", master = "local[2]",
      shufflePartitions = Some(2))
    // getOrCreate returns the existing session but applies nothing destructive;
    // assert the standard knobs on the active session instead
    assert(spark.conf.get("spark.sql.session.timeZone") === "UTC")
    assert(spark.conf.get("spark.sql.adaptive.enabled") === "true")
  }


  test("pure-SQL BM25-from-index recipe matches the Scala serving path on a " +
      "persisted, incrementally-appended index") {
    import graft.catalog.VersionedTable
    val docs = Tables.documents(spark, sf)
    val dir = java.nio.file.Files.createTempDirectory("bm25_sql_idx")
      .toString + "/idx"
    graft.ops.Bm25.writeIndex(docs.filter(col("doc_id") < 300), dir)
    graft.ops.Bm25.appendToIndex(docs.filter(col("doc_id") >= 300), dir)
    VersionedTable.read(spark, s"$dir/postings")
      .createOrReplaceTempView("idx_postings")
    VersionedTable.read(spark, s"$dir/stats")
      .createOrReplaceTempView("idx_stats")
    val terms = Seq("hash", "join", "vector")
    val viaSql = spark.sql(graft.ops.SqlRecipes.bm25FromIndexSql(
      "idx_postings", "idx_stats", terms, k = 20))
    val viaApi = graft.ops.Bm25.topKFromIndex(
      graft.ops.Bm25.readIndexFrom(spark, dir), terms, 20)
    assert(viaSql.count() === 20)
    assert(viaSql.exceptAll(viaApi).count() === 0)
    assert(viaApi.exceptAll(viaSql).count() === 0)
  }

  test("full hybrid retrieval in pure SQL against registered index views " +
      "matches the Scala serving paths row for row") {
    import graft.ops.{Bm25, HybridRetrieval, Ivf, SqlRecipes}
    val docs = Tables.documents(spark, sf)
    val emb = Tables.embeddings(spark, sf)
    val dir = java.nio.file.Files.createTempDirectory("hybrid_sql_idx").toString
    Bm25.writeIndex(docs, s"$dir/bm25")
    Ivf.writeIvfIndex(emb, Ivf.seedCentroids(emb, nlist = 8), s"$dir/ivf")
    val (postingsV, _, statsV) =
      Bm25.registerIndexViews(spark, s"$dir/bm25", "hyb_bm25")
    val (vectorsV, centroidsV) =
      Ivf.registerIndexViews(spark, s"$dir/ivf", "hyb_ivf")

    // the IVF probe twin alone
    val ivfSql = spark.sql(SqlRecipes.ivfFromIndexSql(vectorsV, centroidsV,
        numQueries = 3, k = 5, nprobe = 2))
      .orderBy("query_id", "rank").collect().map(_.toString).toSeq
    val ivfApi = Ivf.ivfTopKFromIndex(Ivf.readIvfIndex(spark, s"$dir/ivf"),
        numQueries = 3, k = 5, nprobe = 2)
      .orderBy("query_id", "rank").collect().map(_.toString).toSeq
    assert(ivfSql === ivfApi, "SQL IVF probe diverged from the Scala path")

    // the full hybrid: BM25-from-postings leg + IVF leg + RRF, end to end in
    // one SQL statement over the registered views
    val hySql = spark.sql(SqlRecipes.hybridFromIndexSql(postingsV, statsV,
        vectorsV, centroidsV, numQueries = 3, legK = 5, k = 5, nprobe = 2))
      .orderBy("query_id", "rank").collect().map(_.toString).toSeq
    val hyApi = HybridRetrieval.hybridTopKFromIndexes(
        Bm25.readIndexFrom(spark, s"$dir/bm25"),
        Ivf.readIvfIndex(spark, s"$dir/ivf"),
        numQueries = 3, legK = 5, k = 5, nprobe = 2)
      .orderBy("query_id", "rank").collect().map(_.toString).toSeq
    assert(hySql === hyApi, "SQL hybrid diverged from hybridTopKFromIndexes")
  }

  test("external-query hybrid in pure SQL: the recipe over index views plus " +
      "a registered query view matches bm25RrfTopKForQueries row for row") {
    import graft.ops.{Bm25, HybridRetrieval, Ivf, SqlRecipes}
    val docs = Tables.documents(spark, sf)
    val emb = Tables.embeddings(spark, sf)
    val dir = java.nio.file.Files.createTempDirectory("hybrid_ext_sql").toString
    Bm25.writeIndex(docs, s"$dir/bm25")
    Ivf.writeIvfIndex(emb, Ivf.seedCentroids(emb, nlist = 8), s"$dir/ivf")
    val (postingsV, _, statsV) =
      Bm25.registerIndexViews(spark, s"$dir/bm25", "hext_bm25")
    val (vectorsV, centroidsV) =
      Ivf.registerIndexViews(spark, s"$dir/ivf", "hext_ivf")
    // external queries: corpus docs 0-2 relabeled OUT of the corpus id space
    val queries = docs.filter(col("doc_id") < 3)
      .join(emb.filter(col("vec_id") < 3), col("doc_id") === col("vec_id"))
      .select((col("doc_id") + 1000000L).as("query_id"), col("text"),
        col("embedding"))
    queries.createOrReplaceTempView("hext_queries")

    val viaSql = spark.sql(SqlRecipes.hybridForQueriesSql(postingsV, statsV,
        vectorsV, centroidsV, "hext_queries", legK = 5, k = 5, nprobe = 2))
      .orderBy("query_id", "rank").collect().map(_.toString).toSeq
    val viaApi = HybridRetrieval.bm25RrfTopKForQueries(
        Bm25.readIndexFrom(spark, s"$dir/bm25"),
        Ivf.readIvfIndex(spark, s"$dir/ivf"),
        queries, legK = 5, k = 5, nprobe = 2)
      .orderBy("query_id", "rank").collect().map(_.toString).toSeq
    assert(viaSql === viaApi,
      "SQL external hybrid diverged from bm25RrfTopKForQueries")
  }

  test("LIVE SQL index tables: registerIndexTables binds catalog entries " +
      "over the artifact dirs, and the SAME statement tracks appends with " +
      "no re-registration") {
    import graft.ops.{Bm25, SqlRecipes}
    val docs = Tables.documents(spark, sf)
    spark.conf.set("spark.sql.catalog.gidx",
      classOf[graft.sources.table.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gidx.warehouse",
      java.nio.file.Files.createTempDirectory("gidx_wh").toString)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gidx.idx")

    val dir = java.nio.file.Files.createTempDirectory("bm25_live_idx")
      .toString + "/idx"
    Bm25.writeIndex(docs.filter(col("doc_id") < 300), dir)
    val (pt, _, st) = Bm25.registerIndexTables(spark, dir, "gidx", "idx",
      "live_bm25")
    val terms = Seq("hash", "join", "vector")
    val sql = SqlRecipes.bm25FromIndexSql(pt, st, terms, k = 20)

    def viaApi() = graft.ops.Bm25.topKFromIndex(
        graft.ops.Bm25.readIndexFrom(spark, dir), terms, 20)
      .collect().map(_.toString).toSeq
    val before = spark.sql(sql).collect().map(_.toString).toSeq
    assert(before === viaApi(), "pre-append SQL must match the Scala path")

    // the append lands through the Scala API; the SAME SQL statement serves
    // the post-append snapshot — the catalog entry re-resolves per query,
    // unlike a temp view's pinned snapshot
    Bm25.appendToIndex(docs.filter(col("doc_id") >= 300), dir)
    val after = spark.sql(sql).collect().map(_.toString).toSeq
    assert(after === viaApi(), "post-append SQL must match the Scala path")
    assert(after !== before, "the appended docs must have changed the answer")
  }

  test("LIVE SQL BQ codes table: registerCodesTable binds a catalog entry " +
      "over the codes dir, and the SAME statement tracks appends with no " +
      "re-registration") {
    import graft.ops.{Similarity, SqlRecipes}
    val emb = Tables.embeddings(spark, sf)
    spark.conf.set("spark.sql.catalog.gidx",
      classOf[graft.sources.table.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gidx.warehouse",
      java.nio.file.Files.createTempDirectory("gidx_wh_bq").toString)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gidx.idx")

    val dir = java.nio.file.Files.createTempDirectory("bq_live_codes")
      .toString + "/codes"
    Similarity.writeCodes(emb.filter(col("vec_id") < 300), dir)
    val ct = Similarity.registerCodesTable(spark, dir, "gidx", "idx",
      "live_bq_codes")
    emb.createOrReplaceTempView("bq_live_emb")
    val sql = SqlRecipes.bqFromCodesSql(ct, "bq_live_emb",
      numQueries = 10, k = 5, shortlistK = 30)

    def viaApi() = Similarity.bqTopKFromCodes(Similarity.readCodes(spark, dir),
        emb, numQueries = 10, k = 5, shortlistK = 30)
      .orderBy("query_id", "rank").collect().map(_.toString).toSeq
    def viaSql() = spark.sql(sql)
      .orderBy("query_id", "rank").collect().map(_.toString).toSeq
    val before = viaSql()
    assert(before === viaApi(), "pre-append SQL must match the Scala path")

    Similarity.appendToCodes(emb.filter(col("vec_id") >= 300), dir)
    val after = viaSql()
    assert(after === viaApi(), "post-append SQL must match the Scala path")
    assert(after !== before, "the appended codes must have changed the answer")
  }

  test("LIVE SQL IVFADC tables: registerIndexTables binds catalog entries " +
      "over the artifact dirs, and the SAME statement tracks appends with " +
      "no re-registration") {
    import graft.ops.{IvfPq, Pq, Similarity, SqlRecipes}
    val emb = Tables.embeddings(spark, sf)
    spark.conf.set("spark.sql.catalog.gidx",
      classOf[graft.sources.table.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gidx.warehouse",
      java.nio.file.Files.createTempDirectory("gidx_wh_pq").toString)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gidx.idx")

    val coarse = Pq.seedCodebooks(emb, m = 1, ksub = 8)
      .select(col("code").as("cluster"), col("cw"))
    val pqCb = IvfPq.seedResidualCodebooks(emb, coarse, m = 4, ksub = 8,
      skip = 8)
    val dir = java.nio.file.Files.createTempDirectory("pq_live_idx")
      .toString + "/idx"
    IvfPq.writePqIndex(emb.filter(col("vec_id") < 300), coarse, pqCb, dir)
    val (ct, cct, pt) = IvfPq.registerIndexTables(spark, dir, "gidx", "idx",
      "live_pq")
    val queries = emb.filter(col("vec_id") < 4)
      .select((col("vec_id") + 1000000L).as("query_id"), col("embedding"))
    queries.createOrReplaceTempView("pq_live_queries")
    val sql = SqlRecipes.ivfPqForQueriesSql(ct, cct, pt, "pq_live_queries",
      k = 5, nprobe = 3)

    def viaApi() = IvfPq.searchIndex(IvfPq.readPqIndex(spark, dir),
        queries.select(col("query_id"),
          Similarity.toDoubleVec(col("embedding")).as("qv")),
        k = 5, nprobe = 3)
      .orderBy("query_id", "rank").collect().map(_.toString).toSeq
    def viaSql() = spark.sql(sql)
      .orderBy("query_id", "rank").collect().map(_.toString).toSeq
    val before = viaSql()
    assert(before === viaApi(), "pre-append SQL must match the Scala path")

    IvfPq.appendToPqIndex(emb.filter(col("vec_id") >= 300), dir)
    val after = viaSql()
    assert(after === viaApi(), "post-append SQL must match the Scala path")
    assert(after !== before, "the appended codes must have changed the answer")
  }

  test("pure-SQL BQ-from-codes recipe matches the Scala funnel on a " +
      "persisted, incrementally-appended codes table") {
    import graft.ops.Similarity
    val emb = Tables.embeddings(spark, sf)
    val dir = java.nio.file.Files.createTempDirectory("bq_sql_codes")
      .toString + "/codes"
    Similarity.writeCodes(emb.filter(col("vec_id") < 300), dir)
    Similarity.appendToCodes(emb.filter(col("vec_id") >= 300), dir)
    Similarity.readCodes(spark, dir).createOrReplaceTempView("bqp_codes")
    emb.createOrReplaceTempView("bqp_emb")
    val viaSql = spark.sql(graft.ops.SqlRecipes.bqFromCodesSql(
        "bqp_codes", "bqp_emb", numQueries = 10, k = 5, shortlistK = 30))
      .orderBy("query_id", "rank").collect().map(_.toString).toSeq
    val viaApi = Similarity.bqTopKFromCodes(Similarity.readCodes(spark, dir),
        emb, numQueries = 10, k = 5, shortlistK = 30)
      .orderBy("query_id", "rank").collect().map(_.toString).toSeq
    assert(viaSql === viaApi, "SQL BQ funnel diverged from bqTopKFromCodes")
  }

  test("pure-SQL IVFADC recipe matches IvfPq.searchIndex row for row on an " +
      "external query batch") {
    import graft.ops.{IvfPq, Pq, Similarity}
    val emb = Tables.embeddings(spark, sf)
    val coarse = Pq.seedCodebooks(emb, m = 1, ksub = 8)
      .select(col("code").as("cluster"), col("cw"))
    val pqCb = IvfPq.seedResidualCodebooks(emb, coarse, m = 4, ksub = 8,
      skip = 8)
    val dir = java.nio.file.Files.createTempDirectory("pq_sql_idx")
      .toString + "/idx"
    IvfPq.writePqIndex(emb.filter(col("vec_id") < 300), coarse, pqCb, dir)
    IvfPq.appendToPqIndex(emb.filter(col("vec_id") >= 300), dir)
    val (codesV, coarseV, pqV) = IvfPq.registerIndexViews(spark, dir, "pqp_idx")
    val queries = emb.filter(col("vec_id") < 4)
      .select((col("vec_id") + 1000000L).as("query_id"), col("embedding"))
    queries.createOrReplaceTempView("pqp_queries")
    val viaSql = spark.sql(graft.ops.SqlRecipes.ivfPqForQueriesSql(
        codesV, coarseV, pqV, "pqp_queries", k = 5, nprobe = 3))
      .orderBy("query_id", "rank").collect().map(_.toString).toSeq
    val viaApi = IvfPq.searchIndex(IvfPq.readPqIndex(spark, dir),
        queries.select(col("query_id"),
          Similarity.toDoubleVec(col("embedding")).as("qv")),
        k = 5, nprobe = 3)
      .orderBy("query_id", "rank").collect().map(_.toString).toSeq
    assert(viaSql === viaApi, "SQL IVFADC diverged from searchIndex")
  }
}
