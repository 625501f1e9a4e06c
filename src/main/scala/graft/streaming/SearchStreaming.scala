package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Streaming twin of [[graft.pipeline.Search]]: score an unbounded
  * document stream against FROZEN corpus statistics — the build/probe
  * split every other streaming twin here uses (the corpus index is built
  * once from the batch side; arrivals are scored statelessly).
  *
  * The batch op's corpus aggregates (df per term, N, avgdl) cannot be
  * computed on the stream itself without unbounded state, and a
  * retrieval system doesn't want them to drift per micro-batch anyway —
  * idf against the reference corpus is the semantic. So the stats
  * collapse to per-term constants at plan-build time and the score is a
  * pure column fold: no shuffle, no state store, append-mode safe. */
object SearchStreaming {
  /** Per-term BM25 statistics from the reference corpus, collected to the
    * driver (|terms| rows — a bounded driver decision like the ANN index
    * params): term → (idf, avgdl). */
  def bm25Stats(corpus: DataFrame, idCol: String, textCol: String,
                terms: Seq[String]): (Map[String, Double], Double) = {
    val lens = corpus.select(size(split(lower(trim(col(textCol))), " "))
      .cast("double").as("dl"))
    val Array(nDocs, avgdl) = lens.agg(count(lit(1)).cast("double"), avg(col("dl")))
      .collect()(0).toSeq.map(_.asInstanceOf[Double]).toArray
    val dfs = graft.pipeline.Search.termFrequencies(corpus, idCol, textCol, terms)
      .groupBy("term").agg(count(lit(1)).cast("double").as("df"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val idf = terms.map { t =>
      val df = dfs.getOrElse(t, 0.0)
      t -> math.log(1.0 + (nDocs - df + 0.5) / (df + 0.5))
    }.toMap
    (idf, avgdl)
  }

  /** Score arrivals against frozen stats; documents matching no term are
    * dropped (matching the batch result shape). Pure column expressions —
    * runs unchanged on a stream. Output: (idCol, score). */
  def bm25ScoreStream(stream: DataFrame, idCol: String, textCol: String,
                      idf: Map[String, Double], avgdl: Double,
                      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val w = split(lower(trim(col(textCol))), " ")
    val dl = size(w).cast("double")
    val norm = lit(k1) * (lit(1.0 - b) + lit(b) * dl / lit(avgdl))
    val score = idf.toSeq.sortBy(_._1).map { case (t, i) =>
      val tf = size(filter(w, x => x === t)).cast("double")
      lit(i) * (tf * (k1 + 1.0)) / (tf + norm)
    }.reduce(_ + _)
    val matched = idf.keySet.toSeq.sorted
      .map(t => array_contains(w, t)).reduce(_ || _)
    stream.filter(matched).select(col(idCol), round(score, 4).as("score"))
  }
}
