package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** One-call corpus curation — the composition a training-data pipeline
  * runs before tokenization: exact-dedup survivors that clear a quality
  * score and a token-count band, tagged with predicted language.
  *
  * Plan shape at scale: ONE narrow shuffle for the dedup survivor set
  * (hash-groupBy in [[Dedup.exact]]) + one semi-join back on the id, with
  * every per-document signal (language, quality, tokens) computed as pure
  * column expressions in the same pass — no second scan of the corpus.
  * Near-dup removal composes upstream: feed `Dedup.survivors(...)` output
  * in as `df` when MinHash/SimHash-level dedup is wanted too. */
object Curation {
  def curate(df: DataFrame, idCol: String, textCol: String,
             minQuality: Double = 0.5,
             minTokens: Long = 5, maxTokens: Long = 10000): DataFrame = {
    val keep = Dedup.exact(df, idCol, textCol)
    df.join(keep, Seq(idCol), "left_semi")
      .select(col(idCol),
        TextAnalysis.langId(col(textCol)).as("lang_pred"),
        TextAnalysis.qualityScore(col(textCol)).as("quality"),
        TextAnalysis.wsTokens(col(textCol)).as("ws_tokens"))
      .filter(col("quality") >= minQuality &&
        col("ws_tokens").between(minTokens, maxTokens))
  }
}
