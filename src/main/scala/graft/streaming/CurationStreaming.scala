package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.pipeline.TextAnalysis

/** Streaming twin of [[graft.pipeline.Curation]]: the same curation gates
  * applied to an unbounded arrival stream. The batch op's exact-dedup step
  * (a groupBy over the whole corpus) becomes the watermarked
  * first-arrival dedup of [[DedupStreaming.exactStream]]; the quality /
  * language / token signals are pure column expressions, so they apply to
  * a micro-batch plan unchanged — that statelessness is the design point
  * of the TextAnalysis family. */
object CurationStreaming {
  /** First arrival per normalized content inside the watermark horizon,
    * language-tagged, quality- and token-gated.
    * Output: (idCol, lang_pred, quality, ws_tokens) append stream. */
  def curateStream(docs: DataFrame, idCol: String, textCol: String,
                   tsCol: String, horizon: String = "1 hour",
                   minQuality: Double = 0.5,
                   minTokens: Long = 5, maxTokens: Long = 10000): DataFrame =
    DedupStreaming.exactStream(docs, textCol, tsCol, horizon)
      .select(col(idCol),
        TextAnalysis.langId(col(textCol)).as("lang_pred"),
        TextAnalysis.qualityScore(col(textCol)).as("quality"),
        TextAnalysis.wsTokens(col(textCol)).as("ws_tokens"))
      .filter(col("quality") >= minQuality &&
        col("ws_tokens").between(minTokens, maxTokens))
}
