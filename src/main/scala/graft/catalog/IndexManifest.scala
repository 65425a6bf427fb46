package graft.catalog

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
  * applied one level up: a `manifest` table under the index dir whose single
  * overwrite commit pins each artifact's version. Writers land all artifacts,
  * then refresh the manifest LAST — one atomic commit publishes the new
  * epoch. Readers resolve the manifest ONCE and [[VersionedTable.readAsOf]]
  * each artifact at its pinned version: they see the pre-mutation epoch or
  * the post-mutation epoch, never a mix, regardless of how many commits the
  * mutation spans. Cost: one metadata-scale table read per index resolution.
  *
  * Pins always point at each artifact's HEAD as of the last mutation, so
  * vacuum (which preserves the head's files) cannot reclaim pinned data; a
  * reader holding pins across a later rebuild+vacuum is exposed exactly like
  * any long-running Delta reader across VACUUM — the retention window is the
  * guard.
  *
  * Indexes built before this protocol have no manifest; readers fall back to
  * per-artifact head reads (the legacy behavior), and the first mutation
  * through any writer path upgrades them in place.
  */
object IndexManifest {

  /** Test seam: fired after pins resolve, before artifact reads — lets specs
    * interleave a rival rebuild to prove readers serve one consistent epoch.
    */
  private[graft] var afterPinsResolved: () => Unit = () => ()

  /** Pin each EXISTING artifact's current head version in ONE atomic
    * overwrite commit of `dir/manifest`. Call LAST in every mutation
    * (build, append, rebuild, compact) — the manifest commit is the publish
    * point. Idempotent under replay: re-landing a deduped batch rewrites the
    * same pins.
    */
  def refresh(spark: SparkSession, dir: String,
      artifacts: Seq[String]): Unit = {
    import spark.implicits._
    val pins = artifacts.flatMap { a =>
      val loc = s"$dir/$a"
      if (VersionedTable.exists(spark, loc))
        Some((a, VersionedTable.commits(spark, loc).last.version))
      else None
    }
    VersionedTable.write(pins.toDF("artifact", "version"),
      s"$dir/manifest", "overwrite")
  }

  /** The manifest's pinned (artifact → version) map, or None for a
    * pre-manifest index (readers then fall back to head reads). The map is
    * one bounded collect of a ≤#artifacts-row table.
    */
  def pins(spark: SparkSession, dir: String): Option[Map[String, Long]] = {
    val out =
      if (!VersionedTable.exists(spark, s"$dir/manifest")) None
      else Some(VersionedTable.read(spark, s"$dir/manifest").collect()
        .map(r => r.getAs[String]("artifact") -> r.getAs[Long]("version"))
        .toMap)
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
