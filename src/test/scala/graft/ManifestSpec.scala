package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.catalog.{IndexManifest, VersionedTable}
import graft.ops.{Ivf, IvfPq}

/** Cross-artifact snapshot consistency for the multi-table index tiers: the
  * manifest pins every artifact's version in ONE atomic commit, so a reader
  * racing a rebuild (the only content-changing multi-table overwrite) serves
  * the whole pre-rebuild epoch or the whole post-rebuild epoch — never one
  * epoch's codebooks with another's codes/assignments. The race itself is
  * driven through the `afterPinsResolved` seam: a rival rebuild fires after
  * the reader's pins resolve and before its artifact reads.
  */
class ManifestSpec extends AnyFunSuite with SharedSpark {

  import spark.implicits._

  private val dim = 4

  private def e(axis: Int, i: Long): Array[Float] = {
    val v = Array.fill(dim)(0.0f)
    v(axis) = 1.0f
    v((axis + 1) % dim) = 0.001f * (i % 37).toInt
    v
  }

  private def baseVecs = (0L until 40L)
    .map(i => (i, e((i % 2).toInt, i))).toDF("vec_id", "embedding")

  private def rows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).toSeq

  /** Arm the seam to fire `rival` exactly once, self-disarming FIRST —
    * writer paths (rebuild, append) resolve pins themselves, so a
    * non-disarming seam would recurse.
    */
  private def armSeam(rival: => Unit): Unit =
    IndexManifest.afterPinsResolved = () => {
      IndexManifest.afterPinsResolved = () => ()
      rival
    }

  test("IVF: a reader racing a rebuild serves ONE consistent epoch — " +
      "pins resolved before the rival rebuild yield the full pre-rebuild " +
      "index, a fresh read the full post-rebuild index") {
    val dir = Files.createTempDirectory("ivf_manifest").toString + "/idx"
    Ivf.writeIvfIndex(baseVecs, Ivf.seedCentroids(baseVecs, nlist = 4), dir)
    val expected = rows(Ivf.ivfTopKFromIndex(Ivf.readIvfIndex(spark, dir),
      numQueries = 5, k = 5, nprobe = 4).orderBy("query_id", "rank"))

    // rival rebuild lands between the reader's pins and its artifact reads —
    // the exact window where an unpinned reader would mix epochs
    armSeam { Ivf.rebuildIndex(spark, dir, nlist = 2, iters = 2) }
    val racing =
      try Ivf.readIvfIndex(spark, dir)
      finally IndexManifest.afterPinsResolved = () => ()

    // the racing handle is ENTIRELY pre-rebuild: 4 centroids, and serving
    // reproduces the pre-rebuild answer row for row
    assert(racing.centroids.count() === 4L,
      "pinned reader must hold the pre-rebuild centroid epoch")
    assert(rows(Ivf.ivfTopKFromIndex(racing, numQueries = 5, k = 5,
      nprobe = 4).orderBy("query_id", "rank")) === expected)

    // a fresh resolution is ENTIRELY post-rebuild
    val fresh = Ivf.readIvfIndex(spark, dir)
    assert(fresh.centroids.count() === 2L,
      "fresh reader must hold the post-rebuild centroid epoch")
    assert(fresh.assigned.count() === 40L)
  }

  test("IVF-PQ: a reader racing a rebuild decodes codes against the SAME " +
      "epoch's codebooks") {
    val emb = Tables.embeddings(spark, sf).filter(col("vec_id") < 200)
    val coarse = IvfPq.trainCoarse(emb, nlist = 8, iters = 2)
    val pqCb = IvfPq.trainResidualPq(emb, coarse, m = 4, ksub = 16, iters = 2)
    val dir = Files.createTempDirectory("pq_manifest").toString + "/idx"
    IvfPq.writePqIndex(emb, coarse, pqCb, dir)

    val queries = emb.filter(col("vec_id") < 3)
      .select((col("vec_id") + 1000000L).as("query_id"),
        col("embedding").as("qv"))
    def serve(idx: IvfPq.PqIndex): Seq[String] =
      rows(IvfPq.searchIndex(idx, queries, k = 5, nprobe = 4)
        .orderBy("query_id", "rank"))
    val expected = serve(IvfPq.readPqIndex(spark, dir))

    // the rival rebuild retrains BOTH codebooks and re-encodes every code;
    // mixing its codebooks with the old codes (or vice versa) would decode
    // garbage ADC distances — the pinned reader never can
    armSeam { IvfPq.rebuildPqIndex(emb.select(col("vec_id"),
      col("embedding")), dir, iters = 2) }
    val racing =
      try IvfPq.readPqIndex(spark, dir)
      finally IndexManifest.afterPinsResolved = () => ()
    assert(serve(racing) === expected,
      "racing reader must serve the full pre-rebuild epoch")

    // fresh read: ENTIRELY the post-rebuild epoch — retrained-quality
    // baseline (one base batch) and the re-encoded codes, resolved together
    val freshIdx = IvfPq.readPqIndex(spark, dir)
    assert(IndexManifest.readArtifact(spark, dir, "quality",
        IndexManifest.pins(spark, dir))
      .select("batch").distinct().as[String].collect().toSeq === Seq("base"),
      "fresh pins must hold the post-rebuild quality baseline")
    assert(freshIdx.codes.count() === 200L)
    assert(serve(freshIdx).size === expected.size)
  }

  test("pre-manifest indexes fall back to head reads and upgrade in place " +
      "on the first mutation") {
    val dir = Files.createTempDirectory("ivf_legacy").toString + "/idx"
    Ivf.writeIvfIndex(baseVecs, Ivf.seedCentroids(baseVecs, nlist = 4), dir)
    val expected = rows(Ivf.ivfTopKFromIndex(Ivf.readIvfIndex(spark, dir),
      numQueries = 5, k = 5, nprobe = 4).orderBy("query_id", "rank"))

    // simulate an index built before the manifest protocol
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(s"$dir/_index_manifest.json"),
      false)
    assert(IndexManifest.pins(spark, dir).isEmpty, "no manifest → no pins")
    assert(rows(Ivf.ivfTopKFromIndex(Ivf.readIvfIndex(spark, dir),
      numQueries = 5, k = 5, nprobe = 4).orderBy("query_id", "rank"))
      === expected, "legacy head reads must still serve")

    // first mutation writes the manifest; readers see the append through it
    Ivf.appendToIvfIndex((1000L until 1010L).map(i => (i, e(2, i)))
      .toDF("vec_id", "embedding"), dir, batchLabel = "b1")
    val pins = IndexManifest.pins(spark, dir)
    assert(pins.exists(p => Ivf.IndexArtifacts.forall(p.contains)),
      s"first mutation must pin every artifact: $pins")
    assert(Ivf.readIvfIndex(spark, dir).assigned.count() === 50L,
      "pinned reads must track the append")
  }

  test("maintainer lifecycle keeps pins on reclaimable-safe versions: " +
      "compact re-pins, vacuum(0) after compact cannot strand the manifest") {
    val dir = Files.createTempDirectory("ivf_mpin").toString + "/idx"
    Ivf.writeIvfIndex(baseVecs, Ivf.seedCentroids(baseVecs, nlist = 4), dir)
    Ivf.appendToIvfIndex((1000L until 1020L).map(i => (i, e(1, i)))
      .toDF("vec_id", "embedding"), dir, batchLabel = "b1")

    graft.streaming.IvfIngest.compactIndex(spark, dir)
    val reclaimed = graft.streaming.IvfIngest.vacuumIndex(spark, dir,
      retentionMs = 0L)
    assert(reclaimed.nonEmpty, "vacuum after compact must reclaim something")

    // pins survived the reclaim: the pinned epoch IS the compacted head
    val idx = Ivf.readIvfIndex(spark, dir)
    assert(idx.assigned.count() === 60L)
    assert(rows(Ivf.ivfTopKFromIndex(idx, numQueries = 3, k = 3, nprobe = 4))
      .nonEmpty)
  }
}
