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

  /** Streaming twin of [[graft.pipeline.Curation.ingestGate]] for its
    * STATELESS gates: each arrival is scored against a static exact-hash
    * index ([[graft.pipeline.Dedup.buildExactIndex]] — stream-static
    * left join on the 8-byte key), the benchmark Bloom bitmap
    * ([[graft.pipeline.Dedup.benchmarkBloom]] — join-free bit
    * arithmetic, no false negatives), and the quality score — one output
    * row per arrival inside the watermark horizon. The near-dup flag is
    * deliberately NOT folded in: its candidate verify is inherently
    * per-(arrival, corpus-doc) and streams separately as
    * [[DedupStreaming.nearDupAgainstCorpus]]; the nightly batch
    * [[graft.pipeline.Curation.ingestGate]] is the exact
    * reconciliation, the same contract as the other twins. Output:
    * (idCol, tsCol, exact_dup, contaminated, quality, keep). */
  def ingestStream(stream: DataFrame, idCol: String, textCol: String, tsCol: String,
                   exactIndex: DataFrame, bloom: graft.pipeline.Dedup.BloomIndex,
                   benchShingleN: Int = 4, minQuality: Double = 0.5,
                   horizon: String = "1 hour"): DataFrame = {
    import graft.pipeline.Dedup
    val contaminated = exists(
      graft.functions.VectorExprs.hashArray(Dedup.shingles(col(textCol), benchShingleN)),
      h => graft.functions.VectorExprs.bloomContains(h, bloom.words, bloom.m, bloom.k))
    stream
      .withColumn("__h", xxhash64(Dedup.normalize(col(textCol))))
      .join(exactIndex.select(col("__h"), lit(true).as("__ex")), Seq("__h"), "left")
      .withWatermark(tsCol, horizon)
      .dropDuplicatesWithinWatermark(idCol)
      .select(col(idCol), col(tsCol),
        coalesce(col("__ex"), lit(false)).as("exact_dup"),
        contaminated.as("contaminated"),
        TextAnalysis.qualityScore(col(textCol)).as("quality"))
      .withColumn("keep", !col("exact_dup") && !col("contaminated") &&
        col("quality") >= minQuality)
  }

  /** Welford accumulator for one source: count, running mean, and sum of
    * squared deviations (M2) — numerically stable online variance. */
  case class PriorState(n: Long, mean: Double, m2: Double)
  case class PriorRow(source: String, id: String, quality: Double,
                      src_n: Long, src_mean: Double, src_z: Double)

  /** Streaming twin of [[graft.pipeline.Curation.sourcePriors]]: per-source
    * quality statistics as KEYED STATE (Welford's online mean/M2 — three
    * doubles per source, bounded by the source population), each arrival
    * scored against the stats INCLUDING itself. Within a micro-batch,
    * arrivals apply in id order for determinism.
    *
    * Exactness: after the stream drains a corpus, each source's final
    * (n, mean, std) equals the batch op's — Welford computes the same
    * population moments. Per-document z differs by design: the stream
    * scores against stats-known-so-far (all an online gate can have),
    * the batch against the full corpus; the nightly batch
    * [[graft.pipeline.Curation.sourcePriors]] is the exact
    * reconciliation, the same contract as the other twins. */
  def sourcePriorsStream(spark: org.apache.spark.sql.SparkSession,
                         stream: DataFrame, idCol: String, textCol: String,
                         sourceCol: String): org.apache.spark.sql.Dataset[PriorRow] = {
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    import spark.implicits._
    val scored = stream.select(
      col(sourceCol).cast("string").as("_1"),
      col(idCol).cast("string").as("_2"),
      TextAnalysis.qualityScore(col(textCol)).as("_3")).as[(String, String, Double)]
    scored.groupByKey(_._1)
      .flatMapGroupsWithState[PriorState, PriorRow](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (src, rows, state) =>
          var st = state.getOption.getOrElse(PriorState(0L, 0.0, 0.0))
          val out = rows.toSeq.sortBy(_._2).map { case (_, id, q) =>
            val n1 = st.n + 1
            val d = q - st.mean
            val mean1 = st.mean + d / n1
            st = PriorState(n1, mean1, st.m2 + d * (q - mean1))
            val sd = math.sqrt(st.m2 / st.n)
            val z = if (sd == 0.0) 0.0
              else math.rint((q - st.mean) / sd * 1e4) / 1e4
            PriorRow(src, id, q, st.n, math.rint(st.mean * 1e6) / 1e6, z)
          }
          state.update(st)
          out.iterator
      }
  }

  /** Pruned bigram LM frozen from the reference corpus for streaming
    * perplexity scoring: the `maxModel` most frequent bigrams' −ln P
    * (P = (c+1)/(c(w₁)+V), matching
    * [[graft.pipeline.TextAnalysis.bigramLogLoss]]), the `maxVocab` most
    * frequent unigram counts for unseen-bigram backoff, and the vocab
    * size. Pruning is how production perplexity filters ship their LM
    * (KenLM models are pruned the same way); within the caps the stream
    * score equals the batch op exactly. */
  case class BigramLm(nl: Map[String, Double], cu: Map[String, Long], v: Long)

  def bigramLmStats(corpus: DataFrame, textCol: String,
                    maxModel: Int = 100000, maxVocab: Int = 100000): BigramLm = {
    val w = split(lower(trim(col(textCol))), " ")
    val uni = corpus.select(explode(w).as("__t"))
      .groupBy("__t").agg(count(lit(1)).as("__cu"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val v = uni.count()
      val cu = uni.orderBy(col("__cu").desc, col("__t").asc).limit(maxVocab)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val bi = corpus.select(explode(zip_with(
          slice(w, lit(1), size(w) - 1), slice(w, lit(2), size(w) - 1),
          (a, b) => concat(a, lit(" "), b))).as("__bg"))
        .groupBy("__bg").agg(count(lit(1)).as("__cb"))
        .select(col("__bg"), col("__cb"),
          element_at(split(col("__bg"), " "), 1).as("__w1"))
        .join(uni.withColumnRenamed("__t", "__w1"), "__w1")
        .select(col("__bg"),
          (-log((col("__cb") + 1.0) / (col("__cu") + lit(v)))).as("__nl"),
          col("__cb"))
        .orderBy(col("__cb").desc, col("__bg").asc).limit(maxModel)
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      BigramLm(bi, cu, v)
    } finally uni.unpersist(false)
  }

  /** Score arrivals against the frozen LM — a pure per-row fold, no
    * state store, no shuffle, append-safe. Unseen bigrams back off to
    * the add-one floor −ln(1/(c(w₁)+V)) (c(w₁)=0 for out-of-vocab
    * words), which is exactly what the batch model assigns a bigram it
    * never counted. Output: (idCol, n_bigrams, nll) like the batch op;
    * sub-2-word docs are dropped. */
  def nllScoreStream(stream: DataFrame, idCol: String, textCol: String,
                     lm: BigramLm): DataFrame = {
    val nlLit = typedLit(lm.nl)
    val cuLit = typedLit(lm.cu)
    val w = split(lower(trim(col(textCol))), " ")
    val bgs = zip_with(slice(w, lit(1), size(w) - 1), slice(w, lit(2), size(w) - 1),
      (a, b) => concat(a, lit(" "), b))
    val fallback = (bg: org.apache.spark.sql.Column) =>
      -log(lit(1.0) / (coalesce(cuLit(element_at(split(bg, " "), 1)), lit(0L)) + lit(lm.v)))
    val total = aggregate(bgs, lit(0.0d),
      (acc, bg) => acc + coalesce(nlLit(bg), fallback(bg)))
    stream.filter(size(w) >= 2)
      .select(col(idCol), size(bgs).cast("long").as("n_bigrams"),
        round(total / size(bgs), 4).as("nll"))
  }
}
