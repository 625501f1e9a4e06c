package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline.Multimodal

/** Real multimodal decode via the JDK's own codecs: ImageIO (BMP/PNG)
  * pixels and javax.sound (WAV) samples, driven through the distributed
  * extractFeatures/resizeImages passes. Fixtures are generated in-test,
  * so expected features are known in closed form. */
class MultimodalCodecSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  private def imageBytes(w: Int, h: Int, rgb: Int, format: String): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb)
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, format, bos), s"no $format writer")
    bos.toByteArray
  }

  /** 16-bit mono PCM WAV of a full-scale-`amp` sine at `freq` Hz. */
  private def wavBytes(rate: Float, seconds: Double, freq: Double, amp: Double): Array[Byte] = {
    val n = (rate * seconds).toInt
    val data = new Array[Byte](n * 2)
    for (i <- 0 until n) {
      val s = (amp * math.sin(2 * math.Pi * freq * i / rate) * Short.MaxValue).toInt
      data(2 * i) = (s & 0xFF).toByte
      data(2 * i + 1) = ((s >> 8) & 0xFF).toByte
    }
    val fmt = new javax.sound.sampled.AudioFormat(rate, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(data), fmt, n.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  test("sniff identifies the JDK-decodable containers by magic") {
    assert(Multimodal.sniff(imageBytes(2, 2, 0xFF0000, "bmp")) == "bmp")
    assert(Multimodal.sniff(imageBytes(2, 2, 0xFF0000, "png")) == "png")
    assert(Multimodal.sniff(wavBytes(8000f, 0.01, 440, 0.5)) == "wav")
    assert(Multimodal.sniff("plain text".getBytes) == "unknown")
    assert(Multimodal.sniff("BMisleading text".getBytes) == "bmp") // sniffs, then decode fails → stub
  }

  test("image features are real pixel statistics (solid-color closed form)") {
    // solid red 8x4: mean bands (255, 0, 0), luma = 0.299*255
    val feat = Multimodal.decode(imageBytes(8, 4, 0xFF0000, "bmp"))
    assert(feat(0) == 8.0 && feat(1) == 4.0 && feat(2) == 3.0)
    assert(math.abs(feat(3) - 0.299 * 255) < 1e-9)
    assert(feat(4) == 255.0 && feat(5) == 0.0 && feat(6) == 0.0)
    // PNG path decodes identically
    val png = Multimodal.decode(imageBytes(8, 4, 0xFF0000, "png"))
    assert(png.toSeq == feat.toSeq)
    // a payload that sniffs bmp but doesn't decode falls back to the stub
    val junk = "BMisleading text".getBytes
    assert(Multimodal.decode(junk).toSeq == Multimodal.stubDecode(junk).toSeq)
  }

  test("wav features recover sample count, duration, and sine RMS") {
    val rate = 8000f
    val feat = Multimodal.decode(wavBytes(rate, 0.5, 440, 0.8))
    assert(feat(0) == (rate * 0.5).toInt.toDouble) // n_samples
    assert(feat(1) == rate.toDouble && feat(2) == 1.0)
    assert(math.abs(feat(3) - 0.5) < 1e-6) // duration
    assert(math.abs(feat(4) - 0.8 / math.sqrt(2)) < 0.01) // sine RMS = amp/√2
    assert(math.abs(feat(5) - 0.8) < 0.01) // peak ≈ amp
  }

  test("extractFeatures dispatches per-row across modalities in one pass") {
    import spark.implicits._
    val rows = Seq(
      (1L, "image", imageBytes(4, 4, 0x00FF00, "bmp")),
      (2L, "audio", wavBytes(8000f, 0.1, 100, 0.5)),
      (3L, "video", "not really video".getBytes))
      .toDF("id", "modality", "content")
    val out = Multimodal.extractFeatures(spark, rows)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](4)).toMap
    assert(out(1L).take(3) == Seq(4.0, 4.0, 3.0)) // real image dims
    assert(out(2L)(1) == 8000.0) // real sample rate
    assert(out(3L) == Multimodal.stubDecode("not really video".getBytes).toSeq)
  }

  test("resizeImages produces a real PNG at the target dimensions") {
    import spark.implicits._
    val rows = Seq(
      (1L, "image", imageBytes(16, 8, 0x0000FF, "bmp")),
      (2L, "video", "junk".getBytes))
      .toDF("id", "modality", "content")
    val out = Multimodal.resizeImages(spark, rows, 4, 4)
      .collect().map(r => r.getLong(0) -> r).toMap
    val resized = out(1L).getAs[Array[Byte]]("content")
    assert(Multimodal.sniff(resized) == "png")
    val img = Multimodal.decodeImage(resized).get
    assert(img.getWidth == 4 && img.getHeight == 4)
    // solid blue survives the bilinear resample exactly
    assert((img.getRGB(1, 1) & 0xFFFFFF) == 0x0000FF)
    assert(out(1L).getAs[org.apache.spark.sql.Row]("meta").getInt(1) == 4)
    // non-image rows pass through the stub path: w*h sampled bytes
    assert(out(2L).getAs[Array[Byte]]("content").length == 16)
  }
}
