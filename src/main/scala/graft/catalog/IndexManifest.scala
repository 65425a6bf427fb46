package graft.catalog

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Cross-artifact snapshot consistency for multi-table indexes.
  *
  * An index (IVF, IVF-PQ) is several versioned tables — codebooks, codes,
  * quality — each with its OWN commit log, so a multi-commit mutation is not
  * atomic across them. Appends are benign (append-only tables plus a fixed
  * reader resolution order bound the skew to stale corpus stats), but a
  * REBUILD ([[graft.ops.Ivf.rebuildIndex]], [[graft.ops.IvfPq.rebuildPqIndex]])
  * overwrites every artifact with content that is only meaningful TOGETHER:
  * a reader that resolves centroids before the rebuild's centroid commit and
  * codes after its codes commit mixes two codebook epochs — silently missing
  * candidates on the IVF tier, garbage ADC distances on the PQ tier (codes
  * decoded against the wrong codebooks).
  *
  * The fix is the one-atom pattern every multi-file table format uses for
  * exactly this (Delta's single `_delta_log`, Iceberg's snapshot pointer),
  * applied one level up: an `_index_manifest.json` POINTER FILE under the
  * index dir pinning each artifact's version, published with the same
  * write-temp-then-rename discipline as the commit log and the constraint
  * sidecar. Writers land all artifacts, then publish the manifest LAST — one
  * atomic rename publishes the new epoch. Readers resolve the pointer ONCE
  * (a driver-side read of a tiny file — no Spark job, no scan) and
  * [[VersionedTable.readAsOf]] each artifact at its pinned version: they see
  * the pre-mutation epoch or the post-mutation epoch, never a mix, regardless
  * of how many commits the mutation spans. A pointer file rather than a
  * versioned table keeps resolution at metadata cost: serving already pays
  * one log listing per artifact, and the pointer adds one small file read.
  *
  * The publish is delete-then-rename (Hadoop rename won't clobber on all
  * filesystems), which leaves a missing-file window but never a torn body —
  * and the window is benign BY ORDER OF OPERATIONS: the pointer is only
  * absent after every artifact commit of the mutation has landed, so the
  * head-read fallback a reader takes in that window resolves a settled,
  * consistent epoch. Pins always point at each artifact's head as of the
  * last mutation, so vacuum (which preserves the head's files) cannot
  * reclaim pinned data; a reader holding pins across a later rebuild+vacuum
  * is exposed exactly like any long-running Delta reader across VACUUM — the
  * retention window is the guard.
  *
  * Indexes built before this protocol have no manifest; readers fall back to
  * per-artifact head reads (the legacy behavior), and the first mutation
  * through any writer path upgrades them in place.
  */
object IndexManifest {

  private val ManifestFile = "_index_manifest.json"

  /** Test seam: fired after pins resolve, before artifact reads — lets specs
    * interleave a rival rebuild to prove readers serve one consistent epoch.
    */
  private[graft] var afterPinsResolved: () => Unit = () => ()

  /** Pin each EXISTING artifact's current head version and publish the
    * pointer atomically. Call LAST in every mutation (build, append, rebuild,
    * compact) — the rename is the publish point. Idempotent under replay:
    * re-landing a deduped batch republishes the same pins.
    */
  def refresh(spark: SparkSession, dir: String,
      artifacts: Seq[String]): Unit = {
    val pins = artifacts.flatMap { a =>
      val loc = s"$dir/$a"
      if (VersionedTable.exists(spark, loc))
        Some(a -> VersionedTable.commits(spark, loc).last.version)
      else None
    }
    val body = pins.sortBy(_._1)
      .map { case (a, v) => s""""$a": "$v"""" }
      .mkString("{", ", ", "}")
    val p = new Path(s"$dir/$ManifestFile")
    val tmp = new Path(s"$dir/$ManifestFile.tmp-${java.util.UUID.randomUUID()}")
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val out = fs.create(tmp, true)
    try out.write(body.getBytes("UTF-8")) finally out.close()
    fs.delete(p, false)
    if (!fs.rename(tmp, p)) {
      fs.delete(tmp, false)
      throw new java.io.IOException(s"failed to publish index manifest at $p")
    }
  }

  /** The pinned (artifact → version) map, or None for a pre-manifest index
    * (readers then fall back to head reads). One driver-side read of a tiny
    * file; a concurrent publish's delete-rename window reads as None, which
    * is safe (see class doc). Parsed with the iterative JSON reader — never
    * a regex (stack growth must not depend on input size).
    */
  def pins(spark: SparkSession, dir: String): Option[Map[String, Long]] = {
    val p = new Path(s"$dir/$ManifestFile")
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val out =
      try {
        val in = fs.open(p)
        val body =
          try {
            val bytes = new java.io.ByteArrayOutputStream()
            val buf = new Array[Byte](8192)
            var n = in.read(buf)
            while (n >= 0) { bytes.write(buf, 0, n); n = in.read(buf) }
            new String(bytes.toByteArray, "UTF-8")
          } finally in.close()
        Some(VersionedTable.jsonStringPairs(body)
          .map { case (a, v) => a -> v.toLong })
      } catch { case _: java.io.FileNotFoundException => None }
    afterPinsResolved()
    out
  }

  /** One artifact at its pinned version; head read when the index (or this
    * artifact) predates the manifest.
    */
  def readArtifact(spark: SparkSession, dir: String, artifact: String,
      pinned: Option[Map[String, Long]]): DataFrame =
    pinned.flatMap(_.get(artifact)) match {
      case Some(v) => VersionedTable.readAsOf(spark, s"$dir/$artifact", v)
      case None => VersionedTable.read(spark, s"$dir/$artifact")
    }
}
