package graft

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Multimodal
import graft.ops.Multimodal.MediaRecord

/** Real-decode evidence: every assertion here is about pixels `javax.imageio` actually
  * decoded, not about metadata derived from payload length.
  */
class MultimodalSpec extends AnyFunSuite with SharedSpark {

  /** A hand-built RGB PNG with known dimensions and a known top-left pixel. */
  private def rgbPng(w: Int, h: Int, topLeft: (Int, Int, Int)): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, (x * 31 + y * 7) & 0xffffff)
    val (r, g, b) = topLeft
    img.setRGB(0, 0, (r << 16) | (g << 8) | b)
    val out = new ByteArrayOutputStream()
    ImageIO.write(img, "png", out)
    out.toByteArray
  }

  test("decode recovers known dimensions and pixels from hand-built PNGs") {
    implicit val sp = spark
    import spark.implicits._
    val records = Seq(
      MediaRecord(1L, "image/png", rgbPng(17, 9, (200, 10, 10))),
      MediaRecord(2L, "image/png", rgbPng(64, 3, (5, 5, 5))),
      MediaRecord(3L, "application/octet-stream", Array[Byte](1, 2, 3, 4)) // not an image
    ).toDS()
    val feats = Multimodal.decode(records).collect().sortBy(_.doc_id)

    assert(feats(0).width === Some(17) && feats(0).height === Some(9))
    assert(feats(0).channels === Some(3) && feats(0).n_pixels === Some(153))
    assert(feats(0).first_byte === Some(200)) // band 0 = red of the (0,0) pixel

    assert(feats(1).width === Some(64) && feats(1).height === Some(3))

    // undecodable payloads are kept with null features, not dropped
    assert(feats(2).width.isEmpty && feats(2).histogram.isEmpty)
    assert(feats(2).n_bytes === 4)
  }

  test("non-ASCII lead: first_byte is the first UTF-8 BYTE, not the codepoint") {
    implicit val sp = spark
    import spark.implicits._
    // 'é' = U+00E9 = codepoint 233, but UTF-8 bytes C3 A9 — a codepoint-based
    // first_byte (oracle ascii()) would report 233 where the raster holds 195
    val docs = Seq(
      (1L, "élan vital"),
      (2L, "日本語 text"), // U+65E5 → E6 97 A5
      (3L, null.asInstanceOf[String]), // encodes as the empty payload
      (4L, "ascii lead")).toDF("doc_id", "text")
    val feats = Multimodal.featureTable(docs).orderBy("doc_id").collect()
    assert(feats(0).getAs[Int]("first_byte") === 0xC3)
    assert(feats(1).getAs[Int]("first_byte") === 0xE6)
    // null text: empty payload → 32×1 zero image, first byte 0 (matches the oracle)
    assert(feats(2).getAs[Int]("first_byte") === 0)
    assert(feats(2).getAs[Int]("width") === 32 && feats(2).getAs[Int]("height") === 1)
    assert(feats(3).getAs[Int]("first_byte") === 'a'.toInt)
  }

  test("encodePng emits a real PNG whose decoded pixels are the payload bytes") {
    val payload = Array.tabulate(100)(i => (i * 3 % 251).toByte)
    val png = Multimodal.encodePng(payload)
    // PNG magic — this is a genuine file, not a tagged blob
    assert((png(0) & 0xff) === 0x89 && png(1) === 'P'.toByte)
    val img = ImageIO.read(new ByteArrayInputStream(png))
    assert(img.getWidth === 32 + 100 % 97)    // 35
    assert(img.getHeight === 3)               // ceil(100/35)
    val raster = img.getRaster
    for (i <- payload.indices)
      assert(raster.getSample(i % 35, i / 35, 0) === (payload(i) & 0xff),
        s"pixel $i must equal payload byte $i")
    // padding beyond the payload is zero
    assert(raster.getSample(34, 2, 0) === 0)
  }

  test("resizeImage really resamples: dimensions change, constant image stays constant") {
    val img = new BufferedImage(40, 20, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 20; x <- 0 until 40) img.setRGB(x, y, 0x336699)
    val out = new ByteArrayOutputStream()
    ImageIO.write(img, "png", out)
    val resized = ImageIO.read(new ByteArrayInputStream(
      Multimodal.resizeImage(out.toByteArray, 10, 5)))
    assert(resized.getWidth === 10 && resized.getHeight === 5)
    // bilinear resample of a constant image is the same constant
    assert((resized.getRGB(4, 2) & 0xffffff) === 0x336699)
    intercept[IllegalArgumentException] {
      Multimodal.resizeImage(Array[Byte](9, 9, 9), 4, 4)
    }
  }

  test("featureTable at sf0.001: geometry matches the documented encoder contract") {
    implicit val sp = spark
    val docs = Tables.documents(spark, sf)
    val feats = Multimodal.featureTable(docs).cache()
    try {
      assert(feats.count() === docs.count())
      // every payload decoded (all are valid PNGs)
      assert(feats.filter(col("width").isNull).count() === 0)
      assert(feats.filter(col("channels") =!= 1).count() === 0)
      // width histogram bucket range and pixel-count consistency
      assert(feats.filter(col("width") < 32 || col("width") > 128).count() === 0)
      assert(feats.filter(col("n_pixels") =!= col("width") * col("height")).count() === 0)
      val histSum = feats.select(
        aggregate(col("histogram"), lit(0.0), (a, x) => a + x).as("s"))
      assert(histSum.filter(abs(col("s") - 1.0) > 1e-9).count() === 0)
    } finally feats.unpersist()
  }

  test("wav round-trip: decoded features match hand-computed signal math") {
    implicit val sp = spark
    import spark.implicits._
    // a hand-built square-ish wave: +1000 x4, -1000 x4, repeated 100 times
    val sq = Array.tabulate(800)(i => if ((i / 4) % 2 == 0) 1000 else -1000)
      .map(_.toShort)
    val wav = Multimodal.encodeWav(sq, sampleRate = 8000)
    // genuine RIFF/WAVE container
    assert(new String(wav.slice(0, 4), "US-ASCII") === "RIFF")
    assert(new String(wav.slice(8, 12), "US-ASCII") === "WAVE")
    val recs = Seq(
      Multimodal.MediaRecord(1L, "audio/wav", wav),
      Multimodal.MediaRecord(2L, "audio/wav", Array[Byte](1, 2, 3))).toDS()
    val got = Multimodal.decodeAudio(recs).collect().sortBy(_.doc_id)
    val a = got(0)
    assert(a.sample_rate === Some(8000))
    assert(a.channels === Some(1))
    assert(a.n_frames === Some(800L))
    assert(a.duration_ms === Some(100.0))
    assert(a.rms === Some(1000.0))        // constant |s| = 1000
    assert(a.peak === Some(1000))
    assert(a.zero_crossings === Some(199L)) // sign flips every 4 samples: 800/4 - 1
    // corrupt payload: kept with null features
    assert(got(1).sample_rate === None && got(1).n_frames === None)
  }

  test("audio feature table: synthesized corpus decodes with replayable features") {
    implicit val sp = spark
    val docs = Tables.documents(spark, sf).limit(50)
    val feats = Multimodal.audioFeatureTable(docs).cache()
    try {
      assert(feats.count() === 50)
      assert(feats.filter(col("sample_rate").isNull).count() === 0)
      // recompute one doc's features from the generator contract
      val id = 7L
      val samples = Multimodal.synthSamples(id)
      val row = feats.filter(col("doc_id") === id).first()
      assert(row.getAs[Long]("n_frames") === samples.length.toLong)
      val ss = samples.map(s => s.toLong * s).sum
      val rms = math.sqrt(ss.toDouble / samples.length)
      assert(math.abs(row.getAs[Double]("rms") - rms) < 1e-12)
      val zc = samples.sliding(2).count(p => p(0).toLong * p(1) < 0)
      assert(row.getAs[Long]("zero_crossings") === zc.toLong)
      assert(row.getAs[Int]("peak") === samples.map(s => math.abs(s.toInt)).max)
    } finally feats.unpersist()
  }
}
