package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
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

  /** Per-document rule-based quality gates in the Gopher/C4 style
    * (Rae et al. 2021 §A1.1 reduced to this corpus's signals): explicit
    * named pass/fail flags, each a pure column expression, plus the
    * conjunction — so a curation run can report WHICH rule rejected each
    * document, not just a score. Word-level rules only (this engine's
    * documents are single-line); the thresholds are the standard ones
    * scaled to the corpus. Output: (id, n_words, mean_word_len,
    * dup_frac, stop_hits, ok_words, ok_word_len, ok_dup, ok_stop, keep).
    *
    * Scale shape: one corpus scan, zero shuffles — every signal is a
    * column expression over the same split-words array. */
  def qualityRules(df: DataFrame, idCol: String, textCol: String,
                   minWords: Long = 50, maxWords: Long = 2500,
                   minMeanLen: Double = 3.0, maxMeanLen: Double = 10.0,
                   maxDupFrac: Double = 0.4, minStopHits: Long = 2): DataFrame = {
    val w = org.apache.spark.sql.functions.split(lower(trim(col(textCol))), " ")
    val n = size(w).cast("long")
    val meanLen = round(aggregate(w, lit(0L), (acc, x) => acc + length(x))
      .cast("double") / n, 4)
    val dupFrac = TextAnalysis.dupWordFrac(col(textCol))
    val stopHits = TextAnalysis.hitCount(col(textCol), TextAnalysis.stopwords.head._2)
      .cast("long")
    df.select(col(idCol), n.as("n_words"), meanLen.as("mean_word_len"),
        dupFrac.as("dup_frac"), stopHits.as("stop_hits"))
      .withColumn("ok_words", col("n_words").between(minWords, maxWords))
      .withColumn("ok_word_len", col("mean_word_len").between(minMeanLen, maxMeanLen))
      .withColumn("ok_dup", col("dup_frac") <= maxDupFrac)
      .withColumn("ok_stop", col("stop_hits") >= minStopHits)
      .withColumn("keep",
        col("ok_words") && col("ok_word_len") && col("ok_dup") && col("ok_stop"))
  }

  /** Per-source quality priors (the CCNet/RefinedWeb per-domain pass):
    * group statistics of the quality score by origin — doc count, mean,
    * population std — joined back so every document carries its
    * within-source z-score. A crawl's quality distribution is
    * source-conditional; the z-score separates "bad for its site" from
    * "bad site", which a global threshold conflates. Output: (id, group,
    * quality, src_n, src_mean, src_z); z is 0.0 for constant-quality
    * sources. All stats computed over the ROUNDED (4-place) quality so an
    * external replay agrees bit-for-bit.
    *
    * Scale shape: one hash-aggregate on the source key (sources ≪ docs),
    * stats broadcast back onto the corpus — the doc frame never shuffles.
    */
  def sourcePriors(df: DataFrame, idCol: String, textCol: String,
                   groupCol: String): DataFrame = {
    val q = df.select(col(idCol), col(groupCol),
      TextAnalysis.qualityScore(col(textCol)).as("quality"))
    val stats = q.groupBy(col(groupCol)).agg(
      count(lit(1)).as("src_n"),
      avg("quality").as("__m"),
      stddev_pop(col("quality")).as("__sd"))
    q.join(broadcast(stats), Seq(groupCol))
      .select(col(idCol), col(groupCol), col("quality"), col("src_n"),
        round(col("__m"), 6).as("src_mean"),
        when(col("__sd") === 0.0, lit(0.0))
          .otherwise(round((col("quality") - col("__m")) / col("__sd"), 4)).as("src_z"))
  }

  /** One-scan corpus report card — the summary row every curation run
    * should log before and after its gates: document count, token mass,
    * exact token-count percentiles (interpolated, the `percentile`
    * aggregate — sortable within a corpus scan, unlike a sketch it
    * hash-matches an external oracle), mean quality, and the English
    * share by the stopword language id. Output: one row
    * (n_docs, total_tokens, mean_tokens, p50/p90/p99_tokens,
    * mean_quality, en_share), floats rounded to 4.
    *
    * Scale note: a single aggregation over per-row column expressions —
    * the exact percentile is the one sort-bearing term (memory bounded
    * by DISTINCT token counts, so it holds far longer than a raw-value
    * percentile would). `approx = true` swaps in `percentile_approx`
    * (KLL-style bounded sketch, accuracy 1/10000) for corpora where
    * even the distinct-count map outgrows an executor and bit-exact
    * reporting stops mattering; exact stays the oracle-parity default. */
  def corpusReport(df: DataFrame, idCol: String, textCol: String,
                   approx: Boolean = false): DataFrame = {
    val sig = df.select(
      TextAnalysis.wsTokens(col(textCol)).as("__t"),
      TextAnalysis.qualityScore(col(textCol)).as("__q"),
      (TextAnalysis.langId(col(textCol)) === "en").cast("int").as("__en"))
    def pct(p: Double) =
      // approx returns the input type (long); cast so both paths report
      // the same double-typed schema
      if (approx) expr(s"percentile_approx(__t, $p, 10000)").cast("double")
      else expr(s"percentile(__t, $p)")
    sig.agg(
      count(lit(1)).as("n_docs"),
      sum(col("__t")).as("total_tokens"),
      round(avg(col("__t")), 4).as("mean_tokens"),
      round(pct(0.5), 4).as("p50_tokens"),
      round(pct(0.9), 4).as("p90_tokens"),
      round(pct(0.99), 4).as("p99_tokens"),
      round(avg(col("__q")), 4).as("mean_quality"),
      round(avg(col("__en")), 4).as("en_share"))
  }

  /** One-call incremental-ingest gate — the decision pass a crawl batch
    * runs against an EXISTING corpus before admission, composing the
    * index family: exact repeats ([[graft.pipeline.Dedup.probeExactIndex]]
    * — the cheap first gate), cross-corpus near-dups
    * ([[graft.pipeline.Dedup.nearDupCross]] — banded MinHash candidates
    * form only ACROSS the sides), benchmark contamination
    * ([[graft.pipeline.Dedup.decontaminate]] — broadcast 4-gram
    * semi-join), and the quality score. Output: one row per NEW
    * document — (idCol, exact_dup, near_dup, contaminated, quality,
    * keep), keep = no flag AND quality ≥ minQuality. Long-lived systems
    * should build the exact/minhash indexes once and probe per batch;
    * this composition is the per-batch semantics.
    *
    * Recall note: the near_dup flag is banded-MinHash (probabilistic
    * recall ≈ 1−(1−t^r)^b — about 1e-4 miss per pair at J≈0.5 with the
    * default banding), while an exact cross n-gram join would be
    * deterministic. For fixed data and the fixed hash seeds the outcome
    * is deterministic either way (the p58 oracle pairing relies on this);
    * production batches with many borderline-J pairs should expect the
    * documented banding recall, not exactness.
    *
    * Scale shape: each flag frame is (new-batch)-sized or smaller and
    * returns to the batch by left broadcast joins; the reference corpus
    * is touched only through the index builds, never joined row-wise
    * against the batch. */
  def ingestGate(ref: DataFrame, newDf: DataFrame, idCol: String, textCol: String,
                 bench: DataFrame, benchTextCol: String,
                 shingleN: Int = 3, threshold: Double = 0.5,
                 benchShingleN: Int = 4, minQuality: Double = 0.5): DataFrame = {
    import graft.pipeline.{Dedup, TextAnalysis}
    val batch = newDf.select(col(idCol), col(textCol))
    val ex = Dedup.probeExactIndex(Dedup.buildExactIndex(ref, textCol), batch, idCol, textCol)
      .withColumn("__ex", lit(true))
    val nd = Dedup.nearDupCross(batch, idCol, textCol, ref, idCol, textCol,
        shingleN = shingleN, threshold = threshold)
      .select(col("a_id").as(idCol)).distinct()
      .withColumn("__nd", lit(true))
    val ct = Dedup.decontaminate(batch, idCol, textCol, bench, benchTextCol,
        shingleN = benchShingleN)
      .select(col(idCol)).withColumn("__ct", lit(true))
    batch.select(col(idCol), TextAnalysis.qualityScore(col(textCol)).as("quality"))
      .join(ex, Seq(idCol), "left")
      .join(nd, Seq(idCol), "left")
      .join(ct, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("__ex"), lit(false)).as("exact_dup"),
        coalesce(col("__nd"), lit(false)).as("near_dup"),
        coalesce(col("__ct"), lit(false)).as("contaminated"),
        col("quality"))
      .withColumn("keep", !col("exact_dup") && !col("near_dup") &&
        !col("contaminated") && col("quality") >= minQuality)
  }

  /** Percentile-rank normalization of a score within each group — the
    * calibration step before mixing heterogeneous sources: a quality
    * score's raw scale differs per source (different boilerplate, length
    * profiles), so curation thresholds are applied to the per-source
    * RANK of the score, not its value. pct = (rank−1)/(n−1) (percent_rank
    * semantics: 0 for the group minimum, 1 for the maximum; 0 for a
    * single-row group), ties share the lowest rank. Output: input rows'
    * (idCol, groupCol) plus score and pct rounded to 6.
    *
    * Scale shape: one window partitioned by the group — the shuffle is
    * on the group key, and training-corpus sources are few and large,
    * so each partition is a per-source sort (the same cost class as the
    * per-source sampling ops). */
  def percentileRank(df: DataFrame, idCol: String, groupCol: String,
                     score: Column): DataFrame =
    df.select(col(idCol), col(groupCol), score.as("score"))
      .withColumn("pct", round(percent_rank().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col(groupCol)).orderBy(col("score").asc)), 6))

  /** Cumulative fraction boundaries as fixed-width lowercase hex strings;
    * 8 hex digits of md5 give 2^32 buckets, so fraction resolution is
    * ~2.3e-10. Fixed width + lowercase hex makes lexicographic comparison
    * equal numeric comparison (digits sort before a-f in ASCII). Shared by
    * the Column implementation and the generated oracle SQL — they cannot
    * drift. */
  def splitBoundaries(fractions: Seq[(String, Double)]): Seq[(String, String)] = {
    require(fractions.nonEmpty && fractions.forall(_._2 > 0) &&
      math.abs(fractions.map(_._2).sum - 1.0) < 1e-9,
      s"fractions must be positive and sum to 1, got $fractions")
    val cum = fractions.scanLeft(0.0)(_ + _._2).tail
    fractions.map(_._1).zip(cum.map(hexBound))
  }

  /** The md5-prefix cut point below which a fraction `f` of ids fall —
    * the shared currency of [[splitAssign]], [[mix]], and their SQL
    * oracles (generated from the same call, so they cannot drift). */
  private[graft] def hexBound(f: Double): String =
    f"${math.min((f * 4294967296.0).toLong, 4294967295L)}%08x"

  /** Deterministic train/val/test assignment: bucket each document by the
    * first 8 hex digits of md5(id) and cut at the cumulative-fraction
    * boundaries. Output: (idCol, part). The assignment is a pure property
    * of the id — stable under reruns, re-partitioning, corpus growth, and
    * engine changes — which is what makes held-out splits reproducible.
    *
    * Scale shape: a narrow per-row map, no shuffle, no state; the parquet
    * scan prunes to the id column alone. */
  def split(df: DataFrame, idCol: String,
            fractions: Seq[(String, Double)] =
              Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05)): DataFrame =
    df.select(col(idCol), splitAssign(col(idCol), fractions).as("part"))

  /** The split assignment as a bare Column, for composing into a wider
    * projection without a join. */
  def splitAssign(id: Column,
                  fractions: Seq[(String, Double)] =
                    Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05)): Column = {
    val bounds = splitBoundaries(fractions)
    val bucket = substring(md5(id.cast("string").cast("binary")), 1, 8)
    // last boundary is the exhaustive else-branch: everything below ffffffff+1
    bounds.dropRight(1).foldRight(lit(bounds.last._1): Column) {
      case ((name, hexBound), elseCol) => when(bucket < hexBound, lit(name)).otherwise(elseCol)
    }
  }

  /** Deterministic per-group downsampling — the source-rebalancing step of
    * a data-mixing pipeline: keep at most `k` rows per group, chosen by
    * md5(id) order so the sample is uniform-random in effect yet identical
    * across reruns (ties broken by the id itself). Keeps every row of
    * groups smaller than `k`.
    *
    * Scale shape: one shuffle on the group key, rank inside each
    * partition. A group far larger than its siblings makes its partition
    * the straggler; when k ≪ group size, pre-filter with a generous
    * hash-prefix cutoff (e.g. `split`-style bucketing to ~4k candidates)
    * before ranking so the skewed partition ranks a bounded candidate set
    * instead of the whole group. */
  def sampleByGroup(df: DataFrame, idCol: String, groupCol: String, k: Int): DataFrame = {
    require(k > 0, s"need k > 0, got $k")
    import org.apache.spark.sql.expressions.Window
    val bucket = substring(md5(col(idCol).cast("string").cast("binary")), 1, 8)
    val w = Window.partitionBy(col(groupCol)).orderBy(bucket, col(idCol))
    df.withColumn("__rank", row_number().over(w))
      .filter(col("__rank") <= k)
      .drop("__rank")
  }

  /** Deterministic mixture upsampling — the "epochs per source" step of a
    * data-mixing recipe: a source with weight w contributes ⌊w⌋ full
    * copies of every document plus one extra copy of a deterministic
    * frac(w) share of them, chosen by the same md5(id) bucketing
    * [[splitAssign]] cuts on, so the extra-copy set is a stable property
    * of the id. Sources absent from `weights` default to 1.0; weight 0
    * drops the source. Output: one row per (id, group, copy) with
    * copy = 0..n−1 — the repetition map a shuffled training shard is
    * written from.
    *
    * Scale shape: the weight table goes into the plan as a literal CASE
    * chain (no join — mixture recipes are dozens of sources, not
    * millions), then one explode multiplies rows by ~w. A pure narrow
    * map: no shuffle, scan prunes to (id, group). */
  def mix(df: DataFrame, idCol: String, groupCol: String,
          weights: Map[String, Double]): DataFrame = {
    require(weights.values.forall(w => w >= 0.0 && w <= 1000.0),
      s"mixture weights must be in [0, 1000], got $weights")
    val bucket = substring(md5(col(idCol).cast("string").cast("binary")), 1, 8)
    val n = weights.toSeq.sortBy(_._1).foldLeft(lit(1): Column) { case (els, (g, w)) =>
      val base = math.floor(w).toInt
      val frac = w - base
      val extra: Column = if (frac == 0.0) lit(0)
        else when(bucket < lit(hexBound(frac)), lit(1)).otherwise(lit(0))
      when(col(groupCol) === g, lit(base) + extra).otherwise(els)
    }
    df.select(col(idCol), col(groupCol), n.as("__n"))
      .withColumn("copy", explode(when(col("__n") > 0, sequence(lit(0), col("__n") - 1))
        .otherwise(array().cast("array<int>"))))
      .select(col(idCol), col(groupCol), col("copy").cast("long").as("copy"))
  }

  /** GPT-style sequence packing map: documents are concatenated per group
    * in id order and cut every `seqLen` tokens; each document is assigned
    * the sequence index and offset where it STARTS (documents span cut
    * points — the standard concatenate-then-chop pre-training layout, not
    * first-fit bin packing). Output: (idCol, groupCol, seq_idx, seq_off).
    *
    * Scale shape: one shuffle on the group key and a running prefix sum
    * inside each group — the same window the per-group sampler uses. The
    * group is the packing unit (a shard/source), so no global total order
    * is ever required. */
  def pack(df: DataFrame, idCol: String, textCol: String, groupCol: String,
           seqLen: Long): DataFrame = {
    require(seqLen > 0, s"need seqLen > 0, got $seqLen")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(groupCol)).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    df.select(col(idCol), col(groupCol),
        TextAnalysis.wsTokens(col(textCol)).as("__t"))
      .withColumn("__cum", coalesce(sum(col("__t")).over(w), lit(0L)))
      // `div`, not `/`: exact long division (a double round-trip loses
      // exactness past 2^53 cumulative tokens per group)
      .select(col(idCol), col(groupCol),
        expr(s"__cum div ${seqLen}L").as("seq_idx"),
        (col("__cum") % seqLen).as("seq_off"))
  }
}
