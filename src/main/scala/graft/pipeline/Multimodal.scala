package graft.pipeline

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video payloads ride through the
  * engine as opaque `binary` columns with typed metadata, and per-batch
  * feature extraction runs as a partition-local pass (the Scala analogue of
  * a vectorized Python UDF: one iterator per partition, batched work, no
  * driver involvement).
  *
  * Decode status, per modality:
  *  - IMAGE (BMP/PNG/GIF/JPEG): REAL — `javax.imageio` ships these codecs
  *    in the JDK, so [[decodeImage]]/[[imageFeature]]/[[resizeImages]] run
  *    actual pixel work, headless, executor-local.
  *  - AUDIO (WAV/PCM): REAL — `javax.sound.sampled` parses RIFF/WAVE in
  *    pure JVM; [[audioFeature]] computes sample-domain statistics.
  *  - VIDEO: STUBBED — no pure-JVM demuxer exists in the JDK; the
  *    deterministic fake (`stubDecode`/`stubResize`) keeps the Spark-side
  *    plumbing (schema, batching, partition locality) real and testable,
  *    and [[decode]] falls back to it for any payload that doesn't sniff
  *    as a supported container.
  */
object Multimodal {
  /** Feature row produced by the extraction pass. */
  val featureSchema: StructType = StructType(Seq(
    StructField("id", LongType),
    StructField("modality", StringType),
    StructField("n_bytes", LongType),
    StructField("first_code", LongType),
    StructField("feature", ArrayType(DoubleType))))

  /** Wrap a text/binary source into the multimodal layout:
    * (id, modality, content binary, meta struct). */
  def asBinaryColumn(df: DataFrame, idCol: String, payloadCol: String,
                     modality: String): DataFrame =
    df.select(col(idCol).cast("long").as("id"), lit(modality).as("modality"),
      col(payloadCol).cast("binary").as("content"),
      struct(octet_length(col(payloadCol).cast("binary")).cast("long").as("n_bytes")).as("meta"))

  // ------------------------------------------------------- real codecs

  /** Container sniff by magic bytes: "bmp" | "png" | "gif" | "jpeg" |
    * "wav" | "unknown". Cheap (first 12 bytes), runs per-row on
    * executors. */
  def sniff(bytes: Array[Byte]): String = {
    def at(i: Int): Int = if (i < bytes.length) bytes(i) & 0xFF else -1
    if (at(0) == 'B' && at(1) == 'M') "bmp"
    else if (at(0) == 0x89 && at(1) == 'P' && at(2) == 'N' && at(3) == 'G') "png"
    else if (at(0) == 'G' && at(1) == 'I' && at(2) == 'F') "gif"
    else if (at(0) == 0xFF && at(1) == 0xD8) "jpeg"
    else if (at(0) == 'R' && at(1) == 'I' && at(2) == 'F' && at(3) == 'F' &&
             at(8) == 'W' && at(9) == 'A' && at(10) == 'V' && at(11) == 'E') "wav"
    else "unknown"
  }

  /** Real image decode (JDK ImageIO: BMP/PNG/GIF/JPEG). None when the
    * payload isn't a readable image. */
  def decodeImage(bytes: Array[Byte]): Option[java.awt.image.BufferedImage] =
    try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes)))
    catch { case _: Exception => None }

  /** Image feature vector: [width, height, bands, mean luminance,
    * mean band0..2] — one raster pass, no boxing. */
  def imageFeature(img: java.awt.image.BufferedImage): Array[Double] = {
    val (w, h) = (img.getWidth, img.getHeight)
    val raster = img.getRaster
    val bands = raster.getNumBands
    val sums = new Array[Double](math.min(bands, 3))
    val px = new Array[Int](bands)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        raster.getPixel(x, y, px)
        var b = 0
        while (b < sums.length) { sums(b) += px(b); b += 1 }
        x += 1
      }
      y += 1
    }
    val n = (w.toLong * h).toDouble
    val means = sums.map(_ / n).padTo(3, 0.0)
    val luma = bands match {
      case 1 => means(0)
      case _ => 0.299 * means(0) + 0.587 * means(1) + 0.114 * means(2)
    }
    Array(w.toDouble, h.toDouble, bands.toDouble, luma, means(0), means(1), means(2))
  }

  /** Real WAV decode (JDK javax.sound): feature vector [n_samples,
    * sample_rate, channels, duration_sec, rms, peak] over the first
    * channel's PCM samples, normalized to [-1, 1]. */
  def audioFeature(bytes: Array[Byte]): Option[Array[Double]] =
    try {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val fmt = in.getFormat
        val bytesPerSample = fmt.getSampleSizeInBits / 8
        val frameSize = fmt.getFrameSize
        val data = in.readAllBytes()
        val nFrames = if (frameSize > 0) data.length / frameSize else 0
        val big = fmt.isBigEndian
        val signed = fmt.getEncoding == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED
        val full = (1L << (fmt.getSampleSizeInBits - 1)).toDouble
        var sumSq = 0.0; var peak = 0.0
        var f = 0
        while (f < nFrames) {
          val base = f * frameSize // channel 0 leads each frame
          var v = 0L
          if (bytesPerSample == 1) {
            v = if (signed) data(base).toLong else ((data(base) & 0xFF) - 128).toLong
          } else {
            // assemble little- or big-endian signed integer
            var i = 0
            while (i < bytesPerSample) {
              val byteIdx = base + (if (big) i else bytesPerSample - 1 - i)
              v = (v << 8) | (data(byteIdx) & 0xFFL)
              i += 1
            }
            val shift = 64 - fmt.getSampleSizeInBits
            v = (v << shift) >> shift // sign-extend
          }
          val s = v / full
          sumSq += s * s
          if (math.abs(s) > peak) peak = math.abs(s)
          f += 1
        }
        val rms = if (nFrames == 0) 0.0 else math.sqrt(sumSq / nFrames)
        Some(Array(nFrames.toDouble, fmt.getSampleRate.toDouble,
          fmt.getChannels.toDouble, nFrames / fmt.getSampleRate.toDouble, rms, peak))
      } finally in.close()
    } catch { case _: Exception => None }

  /** Modality-dispatched decode: real pixels/samples for supported
    * containers, the deterministic stub otherwise (so unknown payloads
    * still produce a feature row instead of a dropped record — a 100 TB
    * crawl always contains junk bytes). */
  def decode(bytes: Array[Byte]): Array[Double] = sniff(bytes) match {
    case "bmp" | "png" | "gif" | "jpeg" =>
      decodeImage(bytes).map(imageFeature).getOrElse(stubDecode(bytes))
    case "wav" => audioFeature(bytes).getOrElse(stubDecode(bytes))
    case _ => stubDecode(bytes)
  }

  /** STUB decoder: the fallback for payloads with no JDK codec (video,
    * truncated or unknown containers) — derives a deterministic
    * pseudo-feature from the raw bytes so tests and oracles can check the
    * plumbing end to end. */
  def stubDecode(bytes: Array[Byte]): Array[Double] = {
    val n = bytes.length.toDouble
    val first = if (bytes.isEmpty) 0d else (bytes(0) & 0xFF).toDouble
    val last = if (bytes.isEmpty) 0d else (bytes(bytes.length - 1) & 0xFF).toDouble
    Array(n, first, last, n % 251)
  }

  /** STUB resize: a real implementation decodes, resamples WxH, re-encodes;
    * the stub nearest-neighbor-samples the raw bytes to `outLen` so the
    * transform keeps the binary-in/binary-out shape and determinism. */
  def stubResize(bytes: Array[Byte], outLen: Int): Array[Byte] =
    if (bytes.isEmpty || outLen <= 0) Array.emptyByteArray
    else Array.tabulate(outLen) { j =>
      // center sampling (standard nearest-neighbor): ((j+0.5)/outLen)*len
      bytes((((2L * j + 1) * bytes.length) / (2L * outLen)).toInt)
    }

  /** Resize pass: binary→binary per row, partition-local, meta updated with
    * the output size — the shape of an image thumbnailing stage. */
  def resize(spark: SparkSession, df: DataFrame, outLen: Int): DataFrame = {
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("modality", StringType),
      StructField("content", BinaryType),
      StructField("meta", StructType(Seq(StructField("n_bytes", LongType))))))
    val rdd = df.select(col("id"), col("modality"), col("content")).rdd.mapPartitions { it =>
      it.map { row =>
        val out = stubResize(row.getAs[Array[Byte]](2), outLen)
        Row(row.getLong(0), row.getString(1), out, Row(out.length.toLong))
      }
    }
    spark.createDataFrame(rdd, schema)
  }

  /** Frame sampling: one row per kept frame — content is sliced into
    * `frameBytes`-sized frames and every `every`-th frame survives (a real
    * video decoder would demux; the row-multiplying explode shape, frame
    * indexing, and partition locality are what the engine contributes).
    * Output: (id, modality, frame_idx, frame binary). */
  def sampleFrames(spark: SparkSession, df: DataFrame,
                   frameBytes: Int, every: Int): DataFrame = {
    require(frameBytes > 0 && every > 0, "frameBytes and every must be positive")
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("modality", StringType),
      StructField("frame_idx", LongType), StructField("frame", BinaryType)))
    val rdd = df.select(col("id"), col("modality"), col("content")).rdd.mapPartitions { it =>
      it.flatMap { row =>
        val bytes = row.getAs[Array[Byte]](2)
        val nFrames = (bytes.length + frameBytes - 1) / frameBytes
        (0 until nFrames by every).iterator.map { i =>
          val from = i * frameBytes
          Row(row.getLong(0), row.getString(1), i.toLong,
            java.util.Arrays.copyOfRange(bytes, from, math.min(from + frameBytes, bytes.length)))
        }
      }
    }
    spark.createDataFrame(rdd, schema)
  }

  /** Real image resize: decode (ImageIO), bilinear-rescale to `w`×`h`,
    * re-encode as PNG. Partition-local, binary-in/binary-out; rows whose
    * payload doesn't decode as an image pass through byte-stub-resized so
    * the operator is total. Output: (id, modality, content, meta(n_bytes,
    * width, height)). */
  def resizeImages(spark: SparkSession, df: DataFrame, w: Int, h: Int): DataFrame = {
    require(w > 0 && h > 0, "target dimensions must be positive")
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("modality", StringType),
      StructField("content", BinaryType),
      StructField("meta", StructType(Seq(StructField("n_bytes", LongType),
        StructField("width", IntegerType), StructField("height", IntegerType))))))
    val rdd = df.select(col("id"), col("modality"), col("content")).rdd.mapPartitions { it =>
      it.map { row =>
        val bytes = row.getAs[Array[Byte]](2)
        val out = decodeImage(bytes) match {
          case Some(img) =>
            val dst = new java.awt.image.BufferedImage(w, h,
              java.awt.image.BufferedImage.TYPE_INT_RGB)
            val g = dst.createGraphics()
            g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
              java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
            g.drawImage(img, 0, 0, w, h, null)
            g.dispose()
            val bos = new java.io.ByteArrayOutputStream()
            javax.imageio.ImageIO.write(dst, "png", bos)
            bos.toByteArray
          case None => stubResize(bytes, w * h)
        }
        Row(row.getLong(0), row.getString(1), out, Row(out.length.toLong, w, h))
      }
    }
    spark.createDataFrame(rdd, schema)
  }

  /** Partition-local batched feature extraction over the binary column.
    * mapPartitions keeps the decode loop off the driver and amortizes any
    * per-batch codec setup. Dispatches to the REAL decoders (image pixels
    * via ImageIO, WAV samples via javax.sound) by container sniff, the
    * deterministic stub otherwise. */
  def extractFeatures(spark: SparkSession, df: DataFrame): DataFrame = {
    val rdd = df.select(col("id"), col("modality"), col("content")).rdd.mapPartitions { it =>
      it.map { row =>
        val id = row.getLong(0)
        val modality = row.getString(1)
        val bytes = row.getAs[Array[Byte]](2)
        val feat = decode(bytes)
        Row(id, modality, bytes.length.toLong,
          if (bytes.isEmpty) 0L else (bytes(0) & 0xFF).toLong, feat)
      }
    }
    spark.createDataFrame(rdd, featureSchema)
  }
}
