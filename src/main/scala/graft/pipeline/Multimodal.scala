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
  * The actual media decode is STUBBED — the container has no image/audio
  * codecs — with a deterministic fake (`stubDecode`) so the Spark-side
  * plumbing (schema, batching, partition locality) is real and testable.
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

  /** STUB decoder: a real implementation would decode the media container
    * and run a feature extractor; here it derives a deterministic
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

  /** Partition-local batched feature extraction over the binary column.
    * mapPartitions keeps the decode loop off the driver and amortizes any
    * per-batch model setup a real decoder would need. */
  def extractFeatures(spark: SparkSession, df: DataFrame): DataFrame = {
    val rdd = df.select(col("id"), col("modality"), col("content")).rdd.mapPartitions { it =>
      it.map { row =>
        val id = row.getLong(0)
        val modality = row.getString(1)
        val bytes = row.getAs[Array[Byte]](2)
        val feat = stubDecode(bytes)
        Row(id, modality, bytes.length.toLong,
          if (bytes.isEmpty) 0L else (bytes(0) & 0xFF).toLong, feat)
      }
    }
    spark.createDataFrame(rdd, featureSchema)
  }
}
