package graft.ops

import java.awt.RenderingHints
import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

import scala.util.control.NonFatal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: opaque binary payloads + typed metadata, with a REAL
  * image decode path via `javax.imageio` (in-JDK, zero extra dependencies).
  *
  * Images are first-class: [[encodePng]] produces genuine PNG bytes, [[decode]] reads
  * any ImageIO-supported format (PNG/BMP/JPEG/GIF) and extracts width / height /
  * channels / pixel histogram from the DECODED RASTER, and [[resizeImage]] is real
  * bilinear resampling. Only the video path ([[frameSampleStub]]) remains a byte-window
  * stub — the JDK ships no video codec, and the stub keeps the batch shape honest.
  *
  * Spark-first notes: binary columns ride Parquet as BYTE_ARRAY untouched; decode runs
  * in `mapPartitions` so codec setup (ImageIO disk-cache off) is amortized per
  * partition — the same batch shape `mapInPandas` gives Python. Feature vectors come
  * back as typed columns so everything downstream (dedup, ANN) is ordinary columnar
  * work. At scale, repartition by payload-size buckets before decode to even out skew
  * from mixed media sizes.
  */
object Multimodal {

  /** An opaque media payload: what an image/audio/video ingest would carry. */
  final case class MediaRecord(doc_id: Long, media_type: String, content: Array[Byte])

  /** Decoded metadata + features. `n_bytes` is the on-the-wire payload size; the
    * remaining fields come from the decoded image and are null (empty histogram) when
    * the payload is not a decodable image — undecodable rows are KEPT, not dropped, so
    * a corrupt-payload audit is one `filter(width.isNull)` away.
    */
  final case class MediaFeatures(
      doc_id: Long,
      n_bytes: Int,
      width: Option[Int],
      height: Option[Int],
      channels: Option[Int],
      n_pixels: Option[Int],
      first_byte: Option[Int],
      histogram: Array[Double])

  /** Deterministic payload→PNG encoder: bytes become 8-bit grayscale pixels, row-major,
    * in a `32 + n % 97`-wide image, zero-padded to fill the last row. The output is a
    * REAL PNG — `file`-identifiable, openable in any viewer — and the geometry is a
    * pure function of payload length, so an external oracle can predict what a correct
    * decoder must recover.
    */
  def encodePng(payload: Array[Byte]): Array[Byte] = {
    val n = payload.length
    val w = 32 + n % 97
    val h = math.max(1, (n + w - 1) / w)
    val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
    val pixels = new Array[Byte](w * h)
    System.arraycopy(payload, 0, pixels, 0, n)
    img.getRaster.setDataElements(0, 0, w, h, pixels)
    val out = new ByteArrayOutputStream()
    ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** Stand-in ingest: render each document's text bytes as a real grayscale PNG. */
  def fromText(df: DataFrame, idCol: String = "doc_id", textCol: String = "text")(
      implicit spark: SparkSession): Dataset[MediaRecord] = {
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(textCol)).as[(Long, String)]
      .map { case (id, text) =>
        MediaRecord(id, "image/png",
          encodePng(Option(text).getOrElse("").getBytes("UTF-8")))
      }
  }

  /** REAL decode: `javax.imageio` parses the payload and the features come from the
    * decoded raster — width/height from the image header, channels from the sample
    * model, `first_byte` as the (0,0) sample of band 0, and a 16-bucket normalized
    * histogram over every sample of every band.
    */
  def decode(records: Dataset[MediaRecord])(
      implicit spark: SparkSession): Dataset[MediaFeatures] = {
    import spark.implicits._
    records.mapPartitions { it =>
      // per-partition codec init: no tmp-file cache churn on executor-local
      // disks, and ONE ImageReader reused for every row — `ImageIO.read`
      // re-runs the service-provider registry scan per call, a fixed cost
      // that dominates small-image decode; `setInput` resets the reader
      // between payloads and `ignoreMetadata` skips ancillary PNG chunks.
      // Non-PNG or corrupt payloads fall back to the generic path (and then
      // to None), so behavior is unchanged — only the per-row overhead moves.
      ImageIO.setUseCache(false)
      val pngReader = {
        val rs = ImageIO.getImageReadersByFormatName("png")
        if (rs.hasNext) Some(rs.next()) else None
      }
      def readImage(bytes: Array[Byte]): Option[java.awt.image.BufferedImage] =
        pngReader.flatMap { rd =>
          try {
            val iis = ImageIO.createImageInputStream(new ByteArrayInputStream(bytes))
            try {
              rd.setInput(iis, true, true)
              Option(rd.read(0))
            } finally iis.close()
          } catch { case NonFatal(_) => None }
        }.orElse(
          try Option(ImageIO.read(new ByteArrayInputStream(bytes)))
          catch { case NonFatal(_) => None })
      it.map { r =>
        val img = readImage(r.content)
        img match {
          case Some(im) =>
            val w = im.getWidth
            val h = im.getHeight
            val raster = im.getRaster
            val bands = raster.getNumBands
            val hist = new Array[Double](16)
            // bulk row reads: getSamples fills a reused row buffer straight off the
            // data buffer — h·bands raster calls instead of w·h·bands getSample calls
            val rowBuf = new Array[Int](w)
            var b = 0
            while (b < bands) {
              var y = 0
              while (y < h) {
                raster.getSamples(0, y, w, 1, b, rowBuf)
                var x = 0
                while (x < w) {
                  hist((rowBuf(x) & 0xff) % 16) += 1.0
                  x += 1
                }
                y += 1
              }
              b += 1
            }
            val total = w.toDouble * h * bands
            var j = 0
            while (j < 16) { hist(j) /= total; j += 1 }
            MediaFeatures(r.doc_id, r.content.length, Some(w), Some(h), Some(bands),
              Some(w * h), Some(raster.getSample(0, 0, 0) & 0xff), hist)
          case None =>
            MediaFeatures(r.doc_id, r.content.length,
              None, None, None, None, None, Array.empty)
        }
      }
    }
  }

  /** REAL resize: decode, bilinear-resample to `targetW × targetH`, re-encode as PNG.
    * Throws on an undecodable payload — resize of garbage is a caller bug, not a row
    * to quarantine silently.
    */
  def resizeImage(content: Array[Byte], targetW: Int, targetH: Int): Array[Byte] = {
    require(targetW > 0 && targetH > 0, "target dimensions must be positive")
    val src = Option(ImageIO.read(new ByteArrayInputStream(content)))
      .getOrElse(throw new IllegalArgumentException("payload is not a decodable image"))
    val dstType =
      if (src.getType == BufferedImage.TYPE_CUSTOM) BufferedImage.TYPE_INT_RGB
      else src.getType
    val dst = new BufferedImage(targetW, targetH, dstType)
    val g = dst.createGraphics()
    try {
      g.setRenderingHint(RenderingHints.KEY_INTERPOLATION,
        RenderingHints.VALUE_INTERPOLATION_BILINEAR)
      g.drawImage(src, 0, 0, targetW, targetH, null)
    } finally g.dispose()
    val out = new ByteArrayOutputStream()
    ImageIO.write(dst, "png", out)
    out.toByteArray
  }

  /** STUB resize at the BYTE level (kept for opaque non-image payloads): deterministic
    * downsample standing in for media-specific resampling. For images use
    * [[resizeImage]] — real pixels.
    */
  def resizeStub(content: Array[Byte], factor: Int): Array[Byte] = {
    require(factor > 0)
    content.indices.collect { case i if i % factor == 0 => content(i) }.toArray
  }

  /** STUB frame sampling: every nth "frame" (fixed-size byte window) of a fake video.
    * Honest stub — the JDK has no video codec; the window/stride contract is what a
    * real demuxer would slot into.
    */
  def frameSampleStub(content: Array[Byte], frameBytes: Int, everyNth: Int): Seq[Array[Byte]] = {
    require(frameBytes > 0 && everyNth > 0)
    content.grouped(frameBytes).zipWithIndex
      .collect { case (f, i) if i % everyNth == 0 => f }
      .toSeq
  }

  /** Full pipeline: documents → real PNG payloads → decoded feature table. */
  def featureTable(df: DataFrame)(implicit spark: SparkSession): DataFrame =
    decode(fromText(df)).toDF()

  // ---- audio: real WAV encode/decode via javax.sound (in-JDK, like imageio) ------

  /** Decoded audio metadata + signal features. Fields are None when the payload is
    * not a decodable audio stream — undecodable rows are KEPT for corrupt-payload
    * audits, mirroring [[MediaFeatures]].
    */
  final case class AudioFeatures(
      doc_id: Long,
      n_bytes: Int,
      sample_rate: Option[Int],
      channels: Option[Int],
      bits: Option[Int],
      n_frames: Option[Long],
      duration_ms: Option[Double],
      rms: Option[Double],
      zero_crossings: Option[Long],
      peak: Option[Int])

  /** Deterministic integer test waveform for `doc_id`: length `4000 + (id % 7)·500`,
    * sample_i = ((i · k) mod 20001) − 10000 with `k = 37 + (id % 8)·101`. Pure
    * integer arithmetic, so an external engine can replay every derived feature
    * (RMS, zero crossings, peak) EXACTLY — which is what lets the decode path be
    * oracle-gated rather than trusted.
    */
  def synthSamples(docId: Long): Array[Short] = {
    val n = 4000 + (docId % 7).toInt * 500
    val k = 37 + (docId % 8) * 101
    Array.tabulate(n)(i => (((i.toLong * k) % 20001) - 10000).toShort)
  }

  /** REAL WAV encode: mono signed PCM16 little-endian at `sampleRate`, written
    * through `javax.sound.sampled.AudioSystem` — a genuine RIFF/WAVE container any
    * player opens.
    */
  def encodeWav(samples: Array[Short], sampleRate: Int = 8000): Array[Byte] = {
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    val fmt = new AudioFormat(sampleRate.toFloat, 16, 1, true, false)
    val bytes = new Array[Byte](samples.length * 2)
    var i = 0
    while (i < samples.length) {
      bytes(2 * i) = (samples(i) & 0xff).toByte
      bytes(2 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
      i += 1
    }
    val ais = new AudioInputStream(
      new ByteArrayInputStream(bytes), fmt, samples.length.toLong)
    val out = new ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  /** One WAVE-capable writer, resolved through the ServiceLoader ONCE per
    * partition: `AudioSystem.write` re-runs `JDK13Services.getProviders` — a
    * JVM-GLOBAL synchronized registry lookup — per call, which serializes
    * parallel encode tasks on one monitor (measured: a 32-way parallel encode
    * ran SLOWER than single-task until this hoist). Same real codec, same
    * bytes; only the provider lookup moves out of the per-row path.
    */
  private lazy val resolveWavWriter: Option[javax.sound.sampled.spi.AudioFileWriter] = {
    import scala.jdk.CollectionConverters._
    java.util.ServiceLoader.load(classOf[javax.sound.sampled.spi.AudioFileWriter])
      .iterator().asScala
      .find(_.isFileTypeSupported(javax.sound.sampled.AudioFileFormat.Type.WAVE))
  }

  /** The WAVE-capable readers, ServiceLoader-resolved once per JVM for the
    * same registry-contention reason as [[resolveWavWriter]]. The provider
    * instances are the same stateless codec objects `AudioSystem` itself
    * hands every caller JVM-wide — sharing them across tasks is exactly the
    * platform's own usage.
    */
  private lazy val resolveAudioReaders: Seq[javax.sound.sampled.spi.AudioFileReader] = {
    import scala.jdk.CollectionConverters._
    java.util.ServiceLoader.load(classOf[javax.sound.sampled.spi.AudioFileReader])
      .iterator().asScala.toSeq
  }

  /** Stand-in audio ingest: one deterministic WAV per document id. */
  def audioFromIds(df: DataFrame, idCol: String = "doc_id")(
      implicit spark: SparkSession): Dataset[MediaRecord] = {
    import spark.implicits._
    df.select(col(idCol).cast("long")).as[Long]
      .mapPartitions { it =>
        val writer = resolveWavWriter
        it.map(id => MediaRecord(id, "audio/wav",
          encodeWavVia(writer, synthSamples(id))))
      }
  }

  /** [[encodeWav]] through a pre-resolved writer (falls back to the
    * registry-scanning `AudioSystem.write` when resolution found none —
    * byte-identical output either way, it is the same platform codec).
    */
  private def encodeWavVia(writer: Option[javax.sound.sampled.spi.AudioFileWriter],
      samples: Array[Short], sampleRate: Int = 8000): Array[Byte] = {
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream}
    writer match {
      case None => encodeWav(samples, sampleRate)
      case Some(w) =>
        val fmt = new AudioFormat(sampleRate.toFloat, 16, 1, true, false)
        val bytes = new Array[Byte](samples.length * 2)
        var i = 0
        while (i < samples.length) {
          bytes(2 * i) = (samples(i) & 0xff).toByte
          bytes(2 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
          i += 1
        }
        val ais = new AudioInputStream(
          new ByteArrayInputStream(bytes), fmt, samples.length.toLong)
        val out = new ByteArrayOutputStream()
        w.write(ais, AudioFileFormat.Type.WAVE, out)
        out.toByteArray
    }
  }

  /** REAL audio decode: `AudioSystem` parses the container, features come from the
    * DECODED PCM stream — format fields from the header; RMS = sqrt(Σs²/n) over all
    * samples, zero crossings as strict sign changes on channel 0, peak = max |s|.
    * Non-PCM16 payloads and undecodable bytes yield null features (kept rows).
    * Same `mapPartitions` batch shape as the image path.
    */
  def decodeAudio(records: Dataset[MediaRecord])(
      implicit spark: SparkSession): Dataset[AudioFeatures] = {
    import spark.implicits._
    records.mapPartitions { it =>
      import javax.sound.sampled.AudioSystem
      // provider list resolved ONCE per partition — AudioSystem.getAudioInputStream
      // re-runs the JVM-global synchronized registry scan per call (see
      // resolveWavWriter); the readers themselves are the same platform codecs
      val readers = resolveAudioReaders
      def open(bytes: Array[Byte]): javax.sound.sampled.AudioInputStream = {
        val found = readers.iterator.flatMap { rd =>
          try Some(rd.getAudioInputStream(new ByteArrayInputStream(bytes)))
          catch {
            case _: javax.sound.sampled.UnsupportedAudioFileException => None
          }
        }.take(1).toSeq
        // same terminal behavior as AudioSystem: no provider accepts → throw
        found.headOption.getOrElse(
          AudioSystem.getAudioInputStream(new ByteArrayInputStream(bytes)))
      }
      it.map { r =>
        val decoded =
          try {
            val ais = open(r.content)
            val fmt = ais.getFormat
            if (fmt.getSampleSizeInBits != 16) None
            else {
              val data = ais.readAllBytes()
              val ch = fmt.getChannels
              val frameSize = fmt.getFrameSize // hoisted: a getter call per sample
              val frames = data.length / frameSize
              val big = fmt.isBigEndian
              def sampleAt(frame: Int, c: Int): Int = {
                val off = frame * frameSize + c * 2
                val lo = data(off + (if (big) 1 else 0)) & 0xff
                val hi = data(off + (if (big) 0 else 1))
                (hi << 8) | lo
              }
              var sumSq = 0L
              var zc = 0L
              var peak = 0
              var prev0 = 0
              var f = 0
              while (f < frames) {
                var s0 = 0
                var c = 0
                while (c < ch) {
                  val s = sampleAt(f, c)
                  if (c == 0) s0 = s // channel 0 already read — no second decode
                  sumSq += s.toLong * s
                  val a = math.abs(s)
                  if (a > peak) peak = a
                  c += 1
                }
                if (f > 0 && s0.toLong * prev0 < 0) zc += 1
                prev0 = s0
                f += 1
              }
              val n = frames.toLong * ch
              val rms = if (n > 0) math.sqrt(sumSq.toDouble / n) else 0.0
              Some(AudioFeatures(r.doc_id, r.content.length,
                Some(fmt.getSampleRate.toInt), Some(ch), Some(16),
                Some(frames.toLong),
                Some(frames.toLong * 1000.0 / fmt.getSampleRate.toInt),
                Some(rms), Some(zc), Some(peak)))
            }
          } catch { case NonFatal(_) => None }
        decoded.getOrElse(AudioFeatures(r.doc_id, r.content.length,
          None, None, None, None, None, None, None, None))
      }
    }
  }

  /** Full audio pipeline: ids → real WAVs → decoded feature table. */
  def audioFeatureTable(df: DataFrame)(implicit spark: SparkSession): DataFrame =
    decodeAudio(audioFromIds(df)).toDF()
}
