package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.catalog.VersionedTable
import graft.ops.{Ivf, IvfPq, Similarity}
import graft.streaming.{IvfIngest, PqIngest}

/** The drift tier's ACTUATOR — staleness-triggered index rebuild: an
  * off-distribution corpus drives the drift report out of band, the rebuild
  * retrains from the current corpus and restores it, the quality baseline
  * resets, and serving loses nothing. Plus the opt-in maintainer hook
  * (`rebuildWhen`, checked on the compactEvery cadence) and the honest
  * IVF/IVF-PQ asymmetry: IVF rebuilds from its own retained vectors; PQ codes
  * are lossy, so the PQ rebuild must be handed the corpus.
  */
class RebuildSpec extends AnyFunSuite with SharedSpark {

  import spark.implicits._

  private val dim = 4

  /** Unit-ish vector along `axis` with deterministic per-id jitter on the
    * next dimension — distinct vectors, reproducible fixtures.
    */
  private def e(axis: Int, i: Long): Array[Float] = {
    val v = Array.fill(dim)(0.0f)
    v(axis) = 1.0f
    v((axis + 1) % dim) = 0.001f * (i % 37).toInt
    v
  }

  private def baseVecs = (0L until 40L)
    .map(i => (i, e((i % 2).toInt, i))).toDF("vec_id", "embedding")
  private def offTuples(startId: Long): Seq[(Long, Array[Float])] =
    (startId until startId + 40L).map(i => (i, e(2, i)))
  private def offVecs(startId: Long) =
    offTuples(startId).toDF("vec_id", "embedding")

  private def driftMap(dir: String): Map[String, (Double, Double)] =
    Ivf.ivfDrift(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getDouble(2), r.getDouble(3))).toMap

  test("IVF: off-distribution appends read retrain-grade; rebuildIndex " +
      "retrains from the index's own vectors, resets the baseline, loses " +
      "nothing") {
    val dir = Files.createTempDirectory("ivf_rebuild").toString + "/idx"
    Ivf.writeIvfIndex(baseVecs, Ivf.seedCentroids(baseVecs, nlist = 4), dir)
    Ivf.appendToIvfIndex(offVecs(1000L), dir, batchLabel = "off")

    // the frozen e1/e2-region centroids cannot fit the e3-region batch:
    // assignment cosine collapses and occupancy concentrates
    val pre = driftMap(dir)
    assert(pre("off")._1 < 0.3,
      s"off-distribution batch must sink mean_cos: $pre")
    assert(pre("off")._2 > 0.25, s"and read retrain-grade PSI: $pre")

    Ivf.rebuildIndex(spark, dir, iters = 4)

    // baseline reset: ONE quality row labeled base, covering the whole corpus
    val batches = VersionedTable.read(spark, s"$dir/quality")
      .select("batch").distinct().as[String].collect().toSeq
    assert(batches === Seq("base"), s"quality must reset to base: $batches")
    assert(VersionedTable.read(spark, s"$dir/vectors").count() === 80L,
      "rebuild must retain every vector")

    // the SAME distribution that read retrain-grade now fits the centroids
    Ivf.appendToIvfIndex(offVecs(2000L), dir, batchLabel = "off2")
    val post = driftMap(dir)
    assert(post("off2")._1 > 0.9,
      s"rebuilt centroids must fit the drifted region: $post")

    // nothing lost: nprobe = nlist serving equals exact cosine over the union
    val idx = Ivf.readIvfIndex(spark, dir)
    val nlist = idx.centroids.count().toInt
    val union = baseVecs.unionAll(offVecs(1000L)).unionAll(offVecs(2000L))
    val viaIndex = Ivf.ivfTopKFromIndex(idx, numQueries = 5, k = 5,
        nprobe = nlist)
      .select("query_id", "rank", "vec_id", "cosine")
      .orderBy("query_id", "rank").collect().map(_.toString).toSeq
    val exact = Similarity.cosineTopK(union, numQueries = 5, k = 5)
      .select("query_id", "rank", "vec_id", "cosine")
      .orderBy("query_id", "rank").collect().map(_.toString).toSeq
    assert(viaIndex === exact,
      "post-rebuild serving at nprobe = nlist must equal exact cosine")
  }

  test("IVF maintainer hook: rebuildWhen fires on the compactEvery cadence " +
      "when the latest drift row reads stale, and resets the baseline") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val idx = Files.createTempDirectory("ivf_hook").toString + "/idx"
    val ckpt = Files.createTempDirectory("ivf_hook_ckpt").toString
    Ivf.writeIvfIndex(baseVecs, Ivf.seedCentroids(baseVecs, nlist = 4), idx)

    val mem = MemoryStream[(Long, Array[Float])]
    val q = IvfIngest.start(mem.toDF().toDF("vec_id", "embedding"), idx, ckpt,
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime("1 second"),
      compactEvery = 1,
      rebuildWhen = Some(r => r.getAs[Double]("mean_cos") < 0.5),
      rebuildIters = 4)
    try {
      mem.addData(offTuples(1000L): _*)
      q.processAllAvailable()
    } finally q.stop()

    // the off-distribution micro-batch triggered the rebuild inside the
    // stream: quality reset to one base row over the full 80-vector corpus
    val batches = VersionedTable.read(spark, s"$idx/quality")
      .select("batch").distinct().as[String].collect().toSeq
    assert(batches === Seq("base"),
      s"hook must have rebuilt (quality reset): $batches")
    assert(VersionedTable.read(spark, s"$idx/vectors").count() === 80L)

    // post-rebuild the same distribution is in-band — the hook would not
    // fire again
    Ivf.appendToIvfIndex(offVecs(2000L), idx, batchLabel = "off2")
    assert(driftMap(idx)("off2")._1 > 0.9)
  }

  test("IVF-PQ: rebuildPqIndex retrains BOTH codebooks from the PASSED " +
      "corpus (codes are lossy — the index cannot reconstruct it); geometry " +
      "defaults to the persisted index") {
    val emb = Tables.embeddings(spark, sf)
    val base = emb.filter(col("vec_id") < 200)
    val coarse = IvfPq.trainCoarse(base, nlist = 8, iters = 2)
    val pqCb = IvfPq.trainResidualPq(base, coarse, m = 4, ksub = 16, iters = 2)
    val idx = Files.createTempDirectory("pq_rebuild").toString + "/idx"
    IvfPq.writePqIndex(base, coarse, pqCb, idx)

    val embDim = emb.select("embedding")
      .as[Array[Float]].head().length
    def offBatch(startId: Long) = (startId until startId + 100L)
      .map(i => (i, Array.fill(embDim)(-25.0f))).toDF("vec_id", "embedding")
    IvfPq.appendToPqIndex(offBatch(50000L), idx, batchLabel = "off")
    def qerrOf(label: String): Double = IvfPq.pqDrift(spark, idx).collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap.apply(label)
    val preOff = qerrOf("off")
    val preBase = qerrOf("base")
    assert(preOff > preBase * 2,
      s"off-distribution batch must blow up mean_qerr: off=$preOff base=$preBase")

    // rebuild from the CURRENT corpus — passed in, the documented asymmetry
    val corpus = base.select(col("vec_id"), col("embedding"))
      .unionAll(offBatch(50000L))
    IvfPq.rebuildPqIndex(corpus, idx, iters = 2)

    val batches = VersionedTable.read(spark, s"$idx/quality")
      .select("batch").distinct().as[String].collect().toSeq
    assert(batches === Seq("base"), s"quality must reset to base: $batches")
    assert(VersionedTable.read(spark, s"$idx/codes").count() === 300L,
      "rebuild must re-encode the full passed corpus")
    // geometry preserved without being respecified
    assert(VersionedTable.read(spark, s"$idx/pq")
      .select("subspace").distinct().count() === 4L)

    // the drifted region now has codewords: the same distribution re-lands
    // at a fraction of its pre-rebuild quantization error
    IvfPq.appendToPqIndex(offBatch(60000L), idx, batchLabel = "off2")
    val post = qerrOf("off2")
    assert(post < preOff / 10,
      s"retrained codebooks must fit the drifted region: $post vs $preOff")
  }

  test("PQ maintainer hook: rebuildWhen + rebuildFrom fire through the " +
      "stream; rebuildWhen without rebuildFrom is refused loudly") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val emb = Tables.embeddings(spark, sf)
    val base = emb.filter(col("vec_id") < 200)
    val coarse = IvfPq.trainCoarse(base, nlist = 8, iters = 2)
    val pqCb = IvfPq.trainResidualPq(base, coarse, m = 4, ksub = 16, iters = 2)
    val idx = Files.createTempDirectory("pq_hook").toString + "/idx"
    val ckpt = Files.createTempDirectory("pq_hook_ckpt").toString
    IvfPq.writePqIndex(base, coarse, pqCb, idx)

    val embDim = emb.select("embedding").as[Array[Float]].head().length
    val off = (50000L until 50100L)
      .map(i => (i, Array.fill(embDim)(-25.0f)))
    val baseQerr = IvfPq.pqDrift(spark, idx).collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap.apply("base")

    // the corpus supplier the lossy tier requires: here, base + streamed
    val mem = MemoryStream[(Long, Array[Float])]
    val q = PqIngest.start(mem.toDF().toDF("vec_id", "embedding"), idx, ckpt,
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime("1 second"),
      compactEvery = 1,
      rebuildWhen = Some(r => r.getAs[Double]("mean_qerr") > baseQerr * 2),
      rebuildFrom = Some(s => {
        import s.implicits._
        base.select(col("vec_id"), col("embedding"))
          .unionAll(off.toDF("vec_id", "embedding"))
      }),
      rebuildIters = 2)
    try {
      mem.addData(off: _*)
      q.processAllAvailable()
    } finally q.stop()

    val batches = VersionedTable.read(spark, s"$idx/quality")
      .select("batch").distinct().as[String].collect().toSeq
    assert(batches === Seq("base"),
      s"hook must have rebuilt (quality reset): $batches")
    assert(VersionedTable.read(spark, s"$idx/codes").count() === 300L)

    // half-configured actuator refused at start — a silent never-firing hook
    // would defeat the drift tier's whole point
    val err = intercept[IllegalArgumentException] {
      PqIngest.start(mem.toDF().toDF("vec_id", "embedding"), idx,
        Files.createTempDirectory("pq_hook_ckpt2").toString,
        rebuildWhen = Some(_ => true))
    }
    assert(err.getMessage.contains("rebuildFrom"))
  }

  test("CALL system.rebuild_index completes the SQL story for both kinds") {
    val wh = Files.createTempDirectory("graft_rebuild_proc").toString
    spark.conf.set("spark.sql.catalog.grb",
      classOf[graft.sources.table.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.grb.warehouse", wh)

    // IVF: rebuilds from the index's own vectors — location only
    val ivfDir = Files.createTempDirectory("ivf_proc").toString + "/idx"
    Ivf.writeIvfIndex(baseVecs, Ivf.seedCentroids(baseVecs, nlist = 4), ivfDir)
    Ivf.appendToIvfIndex(offVecs(1000L), ivfDir, batchLabel = "off")
    val r = spark.sql(
      s"CALL grb.system.rebuild_index(location => '$ivfDir')").head()
    assert(r.getString(0) === "ivf")
    assert(VersionedTable.read(spark, s"$ivfDir/quality")
      .select("batch").distinct().count() === 1L)
    Ivf.appendToIvfIndex(offVecs(2000L), ivfDir, batchLabel = "off2")
    assert(driftMap(ivfDir)("off2")._1 > 0.9,
      "the procedure must have actually retrained")

    // IVF-PQ: needs source => an embeddings view (codes are lossy)
    val emb = Tables.embeddings(spark, sf)
    val base = emb.filter(col("vec_id") < 200)
    val pqDir = Files.createTempDirectory("pq_proc").toString + "/idx"
    val pqCoarse = IvfPq.trainCoarse(base, nlist = 8, iters = 2)
    IvfPq.writePqIndex(base, pqCoarse,
      IvfPq.trainResidualPq(base, pqCoarse, m = 4, ksub = 16, iters = 2),
      pqDir)
    base.select("vec_id", "embedding").createOrReplaceTempView("rb_corpus")
    spark.sql("CALL grb.system.rebuild_index(location => '" + pqDir +
      "', kind => 'ivfpq', source => 'rb_corpus', iters => 2)")
    assert(VersionedTable.read(spark, s"$pqDir/codes").count() === 200L)

    // ivfpq WITHOUT source refuses loudly
    val err = intercept[Exception] {
      spark.sql("CALL grb.system.rebuild_index(location => '" + pqDir +
        "', kind => 'ivfpq')").collect()
    }
    assert(err.getMessage.contains("source"))
  }
}
