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
