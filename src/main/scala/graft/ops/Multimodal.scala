package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: opaque binary payloads + typed metadata, with the decode /
  * feature-extract / resize / frame-sample steps STUBBED as deterministic fakes (no media
  * codecs in this environment — the Spark-side schema, partitioning, and batch shape are
  * real; swap `decodeStub` internals for a real codec to productionize).
  *
  * Spark-first notes: binary columns ride Parquet as BYTE_ARRAY untouched; decode runs in
  * `mapPartitions` so a real implementation amortizes codec init per partition (the same
  * batch shape `mapInPandas` gives Python). Feature vectors come back as typed columns so
  * everything downstream (dedup, ANN) is ordinary columnar work. At scale, repartition by
  * payload-size buckets before decode to even out skew from mixed media sizes.
  */
object Multimodal {

  /** An opaque media payload: what an image/audio/video ingest would carry. */
  final case class MediaRecord(doc_id: Long, media_type: String, content: Array[Byte])

  /** Decoded metadata + features (fake, deterministic). */
  final case class MediaFeatures(
      doc_id: Long,
      n_bytes: Int,
      width: Int,
      height: Int,
      channels: Int,
      first_byte: Int,
      histogram: Array[Double])

  /** Stand-in ingest: treat document text bytes as the opaque payload. */
  def fromText(df: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    df.select(
      col(idCol).as("doc_id"),
      lit("image/fake").as("media_type"),
      encode(col(textCol), "UTF-8").as("content"))

  /** STUB decode — deterministic fake in place of a real image codec. A production
    * implementation replaces the body of the per-record function only; the partition
    * batching, schema, and downstream contract stay identical.
    */
  def decodeStub(records: Dataset[MediaRecord])(
      implicit spark: SparkSession): Dataset[MediaFeatures] = {
    import spark.implicits._
    records.mapPartitions { it =>
      // per-partition init would go here (codec handles, model weights, ...)
      it.map { r =>
        val b = r.content
        val n = b.length
        val hist = new Array[Double](16)
        var i = 0
        while (i < n) { hist((b(i) & 0xff) % 16) += 1.0; i += 1 }
        if (n > 0) { var j = 0; while (j < 16) { hist(j) /= n; j += 1 } }
        MediaFeatures(
          doc_id = r.doc_id,
          n_bytes = n,
          width = 32 + n % 608,
          height = 32 + (n * 7) % 448,
          channels = 3,
          first_byte = if (n > 0) b(0) & 0xff else 0,
          histogram = hist)
      }
    }
  }

  /** STUB resize: deterministic byte-level downsample standing in for pixel resampling. */
  def resizeStub(content: Array[Byte], factor: Int): Array[Byte] = {
    require(factor > 0)
    content.indices.collect { case i if i % factor == 0 => content(i) }.toArray
  }

  /** STUB frame sampling: every nth "frame" (fixed-size byte window) of a fake video. */
  def frameSampleStub(content: Array[Byte], frameBytes: Int, everyNth: Int): Seq[Array[Byte]] = {
    require(frameBytes > 0 && everyNth > 0)
    content.grouped(frameBytes).zipWithIndex
      .collect { case (f, i) if i % everyNth == 0 => f }
      .toSeq
  }

  /** Full pipeline: documents → payloads → decoded feature table. */
  def featureTable(df: DataFrame)(implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    decodeStub(fromText(df).as[MediaRecord]).toDF()
  }
}
