package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Bm25

class Bm25Spec extends AnyFunSuite with SharedSpark {

  import spark.implicits._

  private def corpus = Seq(
    (1L, "hash join hash"),        // tf(hash)=2 tf(join)=1 dl=3
    (2L, "join the small table"),  // tf(join)=1 dl=4
    (3L, "scan scan scan scan"),   // no query terms, dl=4
    (4L, "hash"))                  // tf(hash)=1 dl=1
    .toDF("doc_id", "text")

  // the textbook formula, written independently of the operator
  private def expected(tf: Map[String, Long], dl: Long): Double = {
    val n = 4.0; val avgdl = 12.0 / 4.0; val k1 = 1.2; val b = 0.75
    val df = Map("hash" -> 2.0, "join" -> 2.0)
    Seq("hash", "join").map { t =>
      val f = tf.getOrElse(t, 0L).toDouble
      math.log(1.0 + (n - df(t) + 0.5) / (df(t) + 0.5)) *
        f * (k1 + 1.0) / (f + k1 * (1.0 - b + b * dl / avgdl))
    }.sum
  }

  test("scores match a hand-rolled BM25 and exclude no-match docs") {
    val out = Bm25.scores(corpus, Seq("hash", "join"))
      .orderBy("doc_id").as[(Long, Double)].collect().toSeq
    assert(out.map(_._1) === Seq(1L, 2L, 4L)) // doc 3 matches nothing
    val want = Seq(
      1L -> expected(Map("hash" -> 2L, "join" -> 1L), 3L),
      2L -> expected(Map("join" -> 1L), 4L),
      4L -> expected(Map("hash" -> 1L), 1L))
    out.zip(want).foreach { case ((id, got), (wid, w)) =>
      assert(id === wid)
      // got is rounded to 6 decimals by the operator; w is the unrounded truth
      assert(math.abs(got - w) < 1e-6, s"doc $id: got $got want $w")
    }
  }

  test("inverted index: topKFromIndex scores identically to the scan path") {
    val docs = Tables.documents(spark, sf)
    // persist the index as a real deployment would — queries must run off parquet
    // postings with the text table long gone
    val dir = java.nio.file.Files.createTempDirectory("bm25_index").toString
    val built = Bm25.buildIndex(docs)
    built.postings.write.partitionBy("term").parquet(s"$dir/postings")
    built.docLengths.write.parquet(s"$dir/dl")
    built.stats.write.parquet(s"$dir/stats")
    val index = Bm25.Index(
      spark.read.parquet(s"$dir/postings"),
      spark.read.parquet(s"$dir/dl"),
      spark.read.parquet(s"$dir/stats"))

    val terms = Seq("hash", "join", "vector")
    val viaScan = Bm25.topK(docs, terms, 20).collect().map(r => (r.getLong(0), r.getDouble(1)))
    val viaIndex = Bm25.topKFromIndex(index, terms, 20).collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(viaIndex.toSeq === viaScan.toSeq)

    // a term that matches nothing contributes a zero addend, same as the scan path
    val scanZ = Bm25.topK(docs, Seq("hash", "zzzznonexistent"), 5)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    val idxZ = Bm25.topKFromIndex(index, Seq("hash", "zzzznonexistent"), 5)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(idxZ.toSeq === scanZ.toSeq)

    // per-query cost: the term-partitioned postings scan PRUNES to the query terms,
    // and the text column is never touched
    val exec = Bm25.topKFromIndex(index, terms, 20).queryExecution
    val plan = exec.executedPlan.toString
    assert(!plan.contains("split("), s"index query must not re-tokenize text:\n$plan")
    assert("PartitionFilters: \\[term#\\d+ IN \\(hash,join,vector\\)".r
      .findFirstIn(plan).isDefined, s"postings scan must prune on term:\n$plan")
  }

  test("incremental index: append tokenizes only the batch — prior corpus text " +
      "deleted, answers still match a from-scratch rebuild") {
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("bm25_inc").toString
    val textDir = java.nio.file.Files.createTempDirectory("bm25_inc_text").toString
    val docs = Tables.documents(spark, sf)

    // land the initial corpus as parquet TEXT and build the index from that scan
    docs.filter(col("doc_id") < 300).write.parquet(s"$textDir/base")
    Bm25.writeIndex(spark.read.parquet(s"$textDir/base"), s"$dir/idx")

    // DELETE the base text: if any append or read rescanned prior corpus text
    // it would now throw FileNotFound — the index artifacts are the only state
    val fs = new org.apache.hadoop.fs.Path(textDir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    assert(fs.delete(new org.apache.hadoop.fs.Path(s"$textDir/base"), true))

    Bm25.appendToIndex(docs.filter(col("doc_id") >= 300 && col("doc_id") < 400),
      s"$dir/idx")
    Bm25.appendToIndex(docs.filter(col("doc_id") >= 400), s"$dir/idx")

    // differential equality with a from-scratch rebuild — top-k AND artifacts
    val full = Bm25.buildIndex(docs)
    val inc = Bm25.readIndexFrom(spark, s"$dir/idx")
    val terms = Seq("hash", "join", "vector")
    assert(Bm25.topKFromIndex(inc, terms, 20).collect().map(_.toString).toSeq ===
      Bm25.topKFromIndex(full, terms, 20).collect().map(_.toString).toSeq)
    assert(inc.stats.collect().map(_.toString).toSeq ===
      full.stats.collect().map(_.toString).toSeq)
    assert(inc.docLengths.orderBy("doc_id").collect().map(_.toString).toSeq ===
      full.docLengths.orderBy("doc_id").collect().map(_.toString).toSeq)
    assert(inc.postings.orderBy("term", "doc_id").collect().map(_.toString).toSeq ===
      full.postings.orderBy("term", "doc_id").collect().map(_.toString).toSeq)
  }

  test("append FS budget: zero opens of any prior index data file") {
    import spark.implicits._
    spark.sparkContext.hadoopConfiguration.set("fs.counted.impl",
      classOf[graft.testutil.CountingFileSystem].getName)
    val dir =
      s"counted://${java.nio.file.Files.createTempDirectory("bm25_count")}/idx"
    val base = (0L until 50L).map(i => (i, s"alpha beta w$i hash join"))
      .toDF("doc_id", "text")
    Bm25.writeIndex(base, dir) // v=0 in postings/doclen/stats
    graft.testutil.CountingFileSystem.reset()
    Bm25.appendToIndex(
      (50L until 60L).map(i => (i, s"gamma delta w$i")).toDF("doc_id", "text"),
      dir)
    // the append is O(batch): prior commits' parquet (under _data/v=0) is
    // never OPENED — the deletion-based test proves no text rescan, this one
    // proves no index-data rescan either, as a counted budget
    val priorOpens = graft.testutil.CountingFileSystem.total("open", "_data/v=0")
    assert(priorOpens == 0,
      s"append must not read prior index data files, opened $priorOpens")
  }

  test("serving never reads the doclen table: dl rides on the postings rows " +
      "(no doclen FileScan; zero doclen data-file opens)") {
    import spark.implicits._
    spark.sparkContext.hadoopConfiguration.set("fs.counted.impl",
      classOf[graft.testutil.CountingFileSystem].getName)
    val dir =
      s"counted://${java.nio.file.Files.createTempDirectory("bm25_serve")}/idx"
    val docs = (0L until 60L).map(i => (i, s"alpha beta w$i hash join"))
      .toDF("doc_id", "text")
    Bm25.writeIndex(docs, dir)
    val index = Bm25.readIndexFrom(spark, dir)
    val terms = Seq("hash", "alpha")

    val served = Bm25.topKFromIndex(index, terms, 10)
    val plan = served.queryExecution.executedPlan.toString
    assert(!plan.linesIterator.exists(l =>
        l.contains("FileScan") && l.contains("/doclen")),
      s"serving plan must not scan the doclen table:\n$plan")

    graft.testutil.CountingFileSystem.reset()
    val rows = served.collect()
    assert(rows.length === 10)
    val doclenOpens =
      graft.testutil.CountingFileSystem.total("open", "/doclen/_data")
    assert(doclenOpens == 0,
      s"serving opened $doclenOpens doclen data files — the O(corpus) " +
        "side-read is back")
  }

  test("pre-denormalization index (postings without dl) still serves through " +
      "the docLengths join, identically") {
    val docs = Tables.documents(spark, sf)
    val built = Bm25.buildIndex(docs)
    // strip dl off the postings — the layout every index persisted before the
    // denormalization carries
    val legacy = Bm25.Index(built.postings.drop("dl"), built.docLengths,
      built.stats)
    val terms = Seq("hash", "join", "vector")
    val viaLegacy = Bm25.topKFromIndex(legacy, terms, 20)
      .collect().map(_.toString).toSeq
    val viaNew = Bm25.topKFromIndex(built, terms, 20)
      .collect().map(_.toString).toSeq
    assert(viaLegacy === viaNew,
      "legacy-layout serving must match the denormalized layout row for row")
  }

  test("appending onto a PERSISTED pre-denormalization index keeps the " +
      "legacy 3-column shape — every pre-append document still scores") {
    import graft.catalog.VersionedTable
    import org.apache.spark.sql.functions.col
    val dir = java.nio.file.Files
      .createTempDirectory("bm25_legacy_append").toString + "/idx"
    def batch(r: Range, salt: String) =
      r.map(i => (i.toLong, s"alpha w$i $salt hash join")).toDF("doc_id", "text")
    Bm25.writeIndex(batch(0 until 30, "base"), dir)
    // strip dl ON DISK — the layout every index persisted before the
    // denormalization carries
    VersionedTable.write(
      VersionedTable.read(spark, s"$dir/postings").drop("dl"),
      s"$dir/postings", "overwrite")

    // both append paths (batch + streaming maintainer) conform to it: a
    // dl-carrying append would read back dl=NULL for all OLD rows under
    // mergeSchema and the column-presence branch would NULL-score them
    Bm25.appendToIndex(batch(30 until 45, "b1"), dir)
    graft.streaming.IndexIngest.ingestBatch(batch(45 until 60, "b2"), dir,
      "legacy_ck", 5L)
    assert(!VersionedTable.read(spark, s"$dir/postings")
        .columns.contains("dl"),
      "appends onto a legacy index must keep the 3-column postings shape")

    // serving equals a from-scratch rebuild over all 60 docs — in particular
    // the 30 PRE-append docs rank normally instead of scoring NULL
    val served = Bm25.topKFromIndex(Bm25.readIndexFrom(spark, dir),
      Seq("hash", "join"), 60).collect()
    val rebuilt = Bm25.topKFromIndex(
      Bm25.buildIndex(batch(0 until 30, "base")
        .unionAll(batch(30 until 45, "b1"))
        .unionAll(batch(45 until 60, "b2"))),
      Seq("hash", "join"), 60).collect()
    assert(served.map(_.toString).toSeq === rebuilt.map(_.toString).toSeq)
    assert(served.length === 60 && served.forall(!_.isNullAt(1)),
      "every document (old and new) must carry a real score")

    // a FRESH index (nothing persisted) keeps the denormalized layout
    val fresh = java.nio.file.Files
      .createTempDirectory("bm25_fresh_append").toString + "/idx"
    Bm25.appendToIndex(batch(0 until 5, "f"), fresh)
    assert(VersionedTable.read(spark, s"$fresh/postings")
      .columns.contains("dl"))
  }

  test("registerIndexViews synthesizes dl for a legacy index, so the SQL " +
      "recipe serves either layout") {
    import graft.catalog.VersionedTable
    val dir = java.nio.file.Files
      .createTempDirectory("bm25_legacy_views").toString + "/idx"
    Bm25.writeIndex(Tables.documents(spark, sf), dir)
    VersionedTable.write(
      VersionedTable.read(spark, s"$dir/postings").drop("dl"),
      s"$dir/postings", "overwrite")
    val (pv, _, sv) = Bm25.registerIndexViews(spark, dir, "legacy_sql_idx")
    val terms = Seq("hash", "join", "vector")
    val viaSql = spark.sql(
        graft.ops.SqlRecipes.bm25FromIndexSql(pv, sv, terms, 20))
      .collect().map(_.toString).toSeq
    val viaScala = Bm25.topKFromIndex(Bm25.readIndexFrom(spark, dir),
      terms, 20).collect().map(_.toString).toSeq
    assert(viaSql === viaScala,
      "SQL recipe over the synthesized-dl view must match the Scala path")
  }

  test("matching is case-insensitive on the document side") {
    val mixed = Seq((1L, "Hash JOIN"), (2L, "HASH")).toDF("doc_id", "text")
    val ids = Bm25.scores(mixed, Seq("hash")).select("doc_id")
      .as[Long].collect().toSet
    assert(ids === Set(1L, 2L))
    intercept[IllegalArgumentException] { Bm25.scores(mixed, Seq("Hash")) }
    intercept[IllegalArgumentException] { Bm25.scores(mixed, Seq("hash", "hash")) }
  }

  test("topK: score-descending with doc_id tiebreak, TakeOrderedAndProject plan") {
    val docs = Tables.documents(spark, sf)
    val top = Bm25.topK(docs, Seq("hash", "join", "vector"), 10)
    val rows = top.as[(Long, Double)].collect()
    assert(rows.length === 10)
    assert(rows.map(_._2).toSeq === rows.map(_._2).sortBy(-_).toSeq)
    val plan = top.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"no top-k operator:\n$plan")
    // corpus-sized top-k must not shuffle document rows: the only shuffle exchange is
    // the single-row stats aggregation (the broadcast exchange is not a shuffle)
    val shuffles = plan.split("Exchange").length - 1 - (plan.split("BroadcastExchange").length - 1)
    assert(shuffles <= 1, s"unexpected shuffles:\n$plan")
  }
}
