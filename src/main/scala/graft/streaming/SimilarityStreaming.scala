package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.pipeline.Similarity

/** Streaming twin of [[graft.pipeline.Similarity.nearDupEmbedANN]]: flag
  * arriving embeddings that near-duplicate a static reference corpus —
  * the vector-space sibling of [[DedupStreaming.nearDupAgainstCorpus]].
  * The corpus is bucketed ONCE at index-build time (multi-table
  * random-hyperplane LSH); each micro-batch computes its rows' buckets,
  * equi-joins the static index, and verifies candidates with the exact
  * native dot product. Per-batch work is rows × tables bucket lookups —
  * the corpus is never rescanned. */
object SimilarityStreaming {
  private def toDouble(v: Column): Column = transform(v, x => x.cast("double"))

  /** Prebuilt LSH index of a static embedding corpus: one row per
    * (table, bucket) membership carrying the vector and its norm for
    * exact verification. Build once, persist, hand to
    * [[nearDupEmbedStream]]. */
  def embedIndex(corpus: DataFrame, idCol: String, vecCol: String,
                 bits: Int = 8, dim: Int = 64, tables: Int = 4,
                 seed: Long = 42L): DataFrame =
    corpus.select(col(idCol).as("__cid"), toDouble(col(vecCol)).as("__cv"))
      .withColumn("__cn", Similarity.norm(col("__cv")))
      .filter(col("__cn") > 0)
      .select(col("__cid"), col("__cv"), col("__cn"),
        posexplode(array((0 until tables).map(t =>
          Similarity.lshBucket(col("__cv"), bits, dim, seed + t)): _*)))
      .select(col("__cid"), col("__cv"), col("__cn"),
        col("pos").as("__t"), col("col").as("__b"))

  /** Flag streaming embeddings whose cosine against some corpus vector
    * clears `tau`. Output: (idCol, dup_of, cosine) append stream,
    * deduplicated per (arrival, corpus doc) within the watermark horizon
    * (a pair colliding in several tables emits once). The LSH miss-rate
    * math is [[graft.pipeline.Similarity.nearDupEmbedANN]]'s. */
  def nearDupEmbedStream(stream: DataFrame, idCol: String, vecCol: String,
                         tsCol: String, index: DataFrame, tau: Double,
                         bits: Int = 8, dim: Int = 64, tables: Int = 4,
                         seed: Long = 42L, horizon: String = "1 hour"): DataFrame = {
    val withBuckets = stream
      .select(col(idCol), col(tsCol), toDouble(col(vecCol)).as("__v"))
      .withColumn("__n", Similarity.norm(col("__v")))
      .filter(col("__n") > 0)
      .select(col(idCol), col(tsCol), col("__v"), col("__n"),
        posexplode(array((0 until tables).map(t =>
          Similarity.lshBucket(col("__v"), bits, dim, seed + t)): _*)))
      .select(col(idCol), col(tsCol), col("__v"), col("__n"),
        col("pos").as("__t"), col("col").as("__b"))
    withBuckets.join(index, Seq("__t", "__b"))
      .withColumn("__cos", Similarity.dot(col("__v"), col("__cv")) / (col("__n") * col("__cn")))
      .filter(col("__cos") >= tau)
      .withWatermark(tsCol, horizon)
      .dropDuplicatesWithinWatermark(idCol, "__cid")
      .select(col(idCol), col("__cid").as("dup_of"), col("__cos").as("cosine"))
  }
}
