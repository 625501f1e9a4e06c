package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, functions}
import org.apache.spark.sql.functions._

/** Text analysis over a document corpus: language ID, quality scoring,
  * token counting, fingerprinting. Every function is a pure column
  * expression (codegen-friendly, no UDFs) and each has an exact ANSI-SQL
  * equivalent so the DuckDB oracle can verify it row-for-row.
  */
object TextAnalysis {
  /** Fixed per-language stopword profiles (heuristic n-gram/stopword
    * language ID — the classic trigram-profile method reduced to word
    * unigrams; deterministic and SQL-mirrorable). */
  val stopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "on", "for", "with"),
    "de" -> Seq("der", "die", "das", "und", "ist", "mit", "ein", "zu", "auf", "von"),
    "es" -> Seq("el", "la", "de", "y", "en", "es", "con", "para", "un", "por"),
    "fr" -> Seq("le", "la", "de", "et", "en", "est", "avec", "pour", "un", "sur"),
    "zh" -> Seq("de0", "shi", "zai", "he", "le0", "you", "wo", "bu", "ren", "zhe"))

  private def words(text: Column): Column = split(lower(trim(text)), " ")

  /** Occurrences of any word from `list` in the text. */
  def hitCount(text: Column, list: Seq[String]): Column =
    size(filter(words(text), w => array_contains(typedLit(list), w)))

  /** Predicted language: argmax of stopword hits; the chained CASE
    * evaluates in list order, so the first-listed language wins ties —
    * same shape as the equivalent SQL CASE expression. */
  def langId(text: Column): Column = {
    val hits = stopwords.map { case (lang, list) => lang -> hitCount(text, list) }
    val cases = hits.map { case (lang, h) =>
      val geAll = hits.filter(_._1 != lang).map { case (_, o) => h >= o }.reduce(_ && _)
      (geAll, lang)
    }
    cases.dropRight(1).foldRight(lit(cases.last._2): Column) {
      case ((cond, lang), elseCol) => when(cond, lit(lang)).otherwise(elseCol)
    }
  }

  /** Quality score in [0,1]: length saturation + stopword density, the
    * standard cheap pre-filters of a training-data pipeline. Rounded to 4
    * decimals so float formatting is stable across engines. */
  def qualityScore(text: Column): Column = {
    val n = size(words(text)).cast("double")
    val stop = hitCount(text, stopwords.head._2).cast("double")
    round(least(lit(1.0), n / 100.0) * 0.5 + least(lit(1.0), stop / n * 5.0) * 0.5, 4)
  }

  /** Whitespace token count. */
  def wsTokens(text: Column): Column = size(split(text, " ")).cast("long")

  /** BPE-ish token count: alnum runs and single punctuation marks each
    * count as one token (a cheap proxy for subword tokenizer cost). */
  def reTokens(text: Column): Column = regexp_count(text, lit("[A-Za-z0-9]+|[^A-Za-z0-9\\s]"))

  /** Duplicate-word fraction (1 − distinct/total over whitespace words) —
    * the classic repetition quality signal: templated or looping text
    * scores high, natural prose low. Rounded to 4 decimals like
    * [[qualityScore]]. */
  def dupWordFrac(text: Column): Column = {
    val w = words(text)
    round(lit(1.0) - size(array_distinct(w)).cast("double") / size(w), 4)
  }

  /** Duplicate word-bigram fraction — catches phrase-level repetition that
    * the unigram signal misses (alternating boilerplate). Documents with
    * fewer than two words have no bigrams and score 0. Distinct bigrams
    * come from the native [[graft.functions.ShingleArray]] pass. */
  def dupBigramFrac(text: Column): Column = {
    val w = words(text)
    val total = (size(w) - 1).cast("double")
    when(total <= 0, lit(0.0)).otherwise(
      round(lit(1.0) -
        size(graft.functions.VectorExprs.shingleArray(w, 2)).cast("double") / total, 4))
  }

  /** Rolling-hash document fingerprint: fold word lengths through
    * h = (h*31 + len) mod 1e9+7, seeded with 7. Order-sensitive (catches
    * shuffled copies that a bag-of-words hash would miss). Native loop
    * ([[graft.functions.RollingLengthHash]]) — the aggregate/transform
    * HOF form ran two interpreted lambda dispatches per word. */
  def fingerprint(text: Column): Column =
    graft.functions.VectorExprs.rollingLengthHash(words(text))

  /** Split documents into overlapping token-window chunks — the standard
    * pre-embedding/pre-training segmentation. Chunk c covers whitespace
    * tokens [c·(size−overlap), c·(size−overlap)+size); every document
    * yields at least one chunk; the last chunk may be short. Output:
    * (id, chunk_id, chunk_text, chunk_tokens).
    *
    * Scale shape: one `posexplode` per document — row count grows by
    * ~n/stride with NO shuffle at all (chunking is embarrassingly
    * parallel); the window arithmetic is pure column expressions, so the
    * whole op stays inside one codegen stage and the parquet scan still
    * prunes to (id, text). */
  def chunk(df: DataFrame, idCol: String, textCol: String,
            size: Int = 256, overlap: Int = 32): DataFrame = {
    require(overlap >= 0 && overlap < size, s"need 0 <= overlap < size, got $overlap/$size")
    val stride = size - overlap
    val w = split(col(textCol), " ")
    df.select(col(idCol), w.as("__w"))
      .withColumn("__k", greatest(lit(1),
        ceil((functions.size(col("__w")) - lit(size)).cast("double") / stride).cast("int") + 1))
      .select(col(idCol), col("__w"),
        posexplode(transform(sequence(lit(0), col("__k") - 1), c =>
          concat_ws(" ", slice(col("__w"), c * stride + 1, lit(size))))))
      .select(col(idCol), col("pos").cast("long").as("chunk_id"),
        col("col").as("chunk_text"),
        least(lit(size), functions.size(col("__w")) - col("pos") * stride).cast("long")
          .as("chunk_tokens"))
  }

  /** PII patterns scrubbed by [[redact]]: kept RE2-compatible (no
    * backreferences/lookaround) so the exact same pattern text runs in
    * Spark's Java regex AND the DuckDB oracle's RE2. Order matters:
    * emails first (digit rules would tear them apart), then bare long
    * digit runs as <ID>, then separator-bearing spans as <PHONE> — a
    * pure digit run is an id/account number, not a phone. */
  val piiPatterns: Seq[(String, String)] = Seq(
    "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}" -> "<EMAIL>",
    "[0-9]{6,}" -> "<ID>",
    "\\+?[0-9][0-9() .-]{7,}[0-9]" -> "<PHONE>")

  /** Redact PII-looking spans (emails, phone-shaped digit runs, long ids)
    * with typed placeholders — the cheap regex scrub every training-data
    * pipeline runs before tokenization. Pure `regexp_replace` chain:
    * codegen'd, shuffle-free, linear scan per document. */
  def redact(text: Column): Column =
    piiPatterns.foldLeft(text) { case (c, (pat, tag)) =>
      regexp_replace(c, lit(pat), lit(tag))
    }

  /** Corpus-statistics document score: the mean corpus frequency of the
    * document's tokens (CCNet's LM quality filter reduced to a unigram
    * model). Low mean frequency marks documents built from rare tokens —
    * OCR garbage, code, off-target languages. Kept integer-exact on
    * purpose: long counts summed per document and divided ONCE at the
    * end, so a SQL oracle reproduces it bit-for-bit (per-token float
    * log-probs would accumulate in engine-dependent order).
    *
    * Scale shape: the vocabulary is a self-aggregate (one shuffle on the
    * token), joined back to the exploded tokens on the same key. Hot
    * zipfian tokens skew only the PROBE side — the build side holds one
    * row per distinct token, so there is no row explosion; at extreme
    * scale broadcast the vocabulary head and join only the tail. */
  def corpusRarity(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tok = df.select(col(idCol), explode(words(col(textCol))).as("__t"))
    val vocab = tok.groupBy("__t").agg(count(lit(1)).as("__c"))
    tok.join(vocab, "__t")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"), sum("__c").as("freq_sum"))
      .withColumn("mean_freq", round(col("freq_sum") * lit(1.0) / col("n_tokens"), 4))
  }

  /** Per-document lexical diversity: type-token ratio, hapax-legomenon
    * fraction, and mean word length — the vocabulary-richness signals
    * that separate template/boilerplate text (low TTR, low hapax) from
    * natural prose, complementing the repetition fractions
    * ([[dupWordFrac]]) which catch only ADJACENT structure. Output:
    * (id, n_tokens, n_types, ttr, hapax_frac, mean_word_len).
    *
    * Scale shape: explode → (doc, token) hash-aggregate → (doc)
    * hash-aggregate; two shuffles on the natural keys with map-side
    * partial aggregation, the same shape as [[corpusRarity]] — never a
    * per-row quadratic fold. */
  def lexicalDiversity(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val counts = df.select(col(idCol), explode(words(col(textCol))).as("__t"))
      .groupBy(col(idCol), col("__t")).agg(count(lit(1)).as("__c"))
    counts.groupBy(col(idCol)).agg(
      sum("__c").cast("long").as("n_tokens"),
      count(lit(1)).cast("long").as("n_types"),
      round(count(lit(1)) / sum("__c"), 6).as("ttr"),
      round(sum(when(col("__c") === 1, 1L).otherwise(0L)) / count(lit(1)), 6).as("hapax_frac"),
      round(sum(length(col("__t")) * col("__c")) / sum("__c"), 6).as("mean_word_len"))
  }

  /** Stable token→bucket feature hashing (Weinberger et al. 2009): the
    * first 8 hex chars of md5 mod `dim`. md5 because every engine renders
    * it identically (a SQL oracle replays the bucketing exactly), and
    * because feature hashing is what makes the vectorizers below scale —
    * fixed dimensionality, no driver-side vocabulary, no OOV handling. */
  private def hashBucket(t: Column, dim: Int): Column =
    conv(substring(md5(t), 1, 8), 16, 10).cast("long") % dim

  /** Hashed TF-IDF document vectors: tokens feature-hash into `dim`
    * buckets ([[hashBucket]]), per-bucket weight = tf · idf with the
    * smoothed idf = ln((N+1)/(df+1)) + 1 (sklearn's variant — strictly
    * positive, so empty vectors cannot arise), then L2-normalized so the
    * downstream pair dot product IS the cosine. Output: (id, tfidf:
    * array<double>[dim]) — unit vectors, feedable straight into the
    * [[Similarity]] family (near-dup pairs, ANN, kNN).
    *
    * Scale shape: one explode→hash-aggregate on (id, bucket), a ≤ dim-row
    * bucket-frequency aggregate broadcast back with the corpus-count
    * scalar, and one per-document aggregate that builds the dense vector
    * via map_from_entries — no window, no driver vocabulary, shuffle
    * volume ∝ distinct (doc, bucket) pairs, never corpus tokens². */
  def hashedTfidf(df: DataFrame, idCol: String, textCol: String,
                  dim: Int = 64): DataFrame = {
    require(dim >= 1, s"need dim >= 1, got $dim")
    val tok = df.select(col(idCol).as("__id"), explode(words(col(textCol))).as("__t"))
    val tf = tok.groupBy(col("__id"), hashBucket(col("__t"), dim).as("__b"))
      .agg(count(lit(1)).cast("double").as("__tf"))
    val dfreq = tf.groupBy("__b").agg(count(lit(1)).cast("double").as("__df"))
    val stats = df.agg(count(lit(1)).cast("double").as("__n"))
    val wtd = tf.join(broadcast(dfreq.crossJoin(stats)), "__b")
      .select(col("__id"), col("__b"),
        (col("__tf") * (log((col("__n") + 1.0) / (col("__df") + 1.0)) + 1.0)).as("__w"))
    wtd.groupBy("__id")
      .agg(map_from_entries(collect_list(struct(col("__b"), col("__w")))).as("__m"),
        sqrt(sum(col("__w") * col("__w"))).as("__nz"))
      .select(col("__id").as(idCol),
        transform(sequence(lit(0L), lit((dim - 1).toLong)), i =>
          coalesce(element_at(col("__m"), i), lit(0.0)) / col("__nz")).as("tfidf"))
  }

  /** DSIR-style importance weights (Xie et al. 2023, reduced from hashed
    * bigrams to hashed unigrams): score every document by how much more
    * likely its tokens are under the TARGET token distribution than under
    * the corpus-wide background,
    * weight(d) = Σ_b tf(d,b) · ln( p̂_target(b) / p̂_background(b) ),
    * with add-one-smoothed bucket probabilities p̂(b) = (c(b)+1)/(total+dim)
    * over the [[hashBucket]] feature space. Positive = looks like the
    * target slice; sampling ∝ weight is the DSIR recipe for steering a
    * 100 TB crawl toward a high-quality target domain. `isTarget` is any
    * boolean column expression over `df`'s rows (e.g. lang = 'en').
    * Output: (id, weight) rounded to 4 decimals.
    *
    * Scale shape: one explode→hash-aggregate on (id, bucket) feeds both
    * the per-document probe side and (re-aggregated) the two ≤ dim-row
    * bucket-count frames; the log-ratio table is broadcast back, so the
    * only wide shuffle is the (id, bucket) aggregate — same bound as
    * [[hashedTfidf]], independent of corpus size in the join. */
  def dsirWeights(df: DataFrame, idCol: String, textCol: String,
                  isTarget: Column, dim: Int = 64): DataFrame = {
    require(dim >= 1, s"need dim >= 1, got $dim")
    val tok = df.select(col(idCol).as("__id"), isTarget.as("__tgt"),
      explode(words(col(textCol))).as("__t"))
    val tf = tok.groupBy(col("__id"), col("__tgt"), hashBucket(col("__t"), dim).as("__b"))
      .agg(count(lit(1)).as("__tf"))
    val tgt = tf.filter(col("__tgt")).groupBy("__b").agg(sum("__tf").as("__ct"))
    val all = tf.groupBy("__b").agg(sum("__tf").as("__cb"))
    val tots = tgt.agg(coalesce(sum("__ct"), lit(0L)).cast("double").as("__t"))
      .crossJoin(all.agg(sum("__cb").cast("double").as("__g")))
    val ratio = all.join(tgt, Seq("__b"), "left").crossJoin(tots)
      .select(col("__b"),
        log(((coalesce(col("__ct"), lit(0L)) + 1.0) / (col("__t") + dim)) /
          ((col("__cb") + 1.0) / (col("__g") + dim))).as("__r"))
    tf.join(broadcast(ratio), "__b")
      .groupBy(col("__id").as(idCol))
      .agg(round(sum(col("__tf") * col("__r")), 4).as("weight"))
  }

  /** Per-document n-gram novelty: the fraction of a document's distinct
    * shingles occurring NOWHERE else in the corpus — the inverse of a
    * boilerplate ratio, and the cheap "how much unique content does
    * this doc actually add" curation signal (near-1 = fresh material,
    * near-0 = assembled from corpus-common fragments). Output:
    * (id, n_shingles, novelty rounded to 4).
    *
    * Scale shape: one shingle explode → document-frequency
    * hash-aggregate on the 8-byte shingle hash → one join back on the
    * same key → per-doc aggregate. Same bound as [[corpusRarity]];
    * nothing pairwise. */
  def novelty(df: DataFrame, idCol: String, textCol: String,
              shingleN: Int = 3): DataFrame = {
    val sh = df.select(col(idCol).as("__id"),
      explode(graft.functions.VectorExprs.hashArray(
        graft.pipeline.Dedup.shingles(col(textCol), shingleN))).as("__s"))
    val dfreq = sh.groupBy("__s").agg(count(lit(1)).as("__df"))
    sh.join(dfreq, "__s")
      .groupBy(col("__id").as(idCol))
      .agg(count(lit(1)).as("n_shingles"),
        round(sum(when(col("__df") === 1, 1L).otherwise(0L)).cast("double") /
          count(lit(1)), 4).as("novelty"))
  }

  /** Per-document negative log-likelihood under a corpus-trained bigram
    * language model with add-one smoothing — the CCNet/KenLM-style
    * "perplexity filter" reduced to a self-trained bigram model:
    * P(w₂|w₁) = (c(w₁w₂)+1) / (c(w₁)+V), V = |vocabulary|, and
    * nll(d) = mean over d's bigram instances of −ln P. Templated or
    * in-distribution text scores LOW, out-of-distribution or garbled
    * text HIGH — rank and cut at a percentile, exactly how production
    * perplexity filters are applied. Output: (id, n_bigrams, nll)
    * (rounded to 4); documents with fewer than 2 words have no bigrams
    * and are not scored.
    *
    * Scale shape: the bigram instance frame is built once (explode of a
    * zip_with over adjacent tokens) and feeds BOTH the model counts (one
    * hash-aggregate on the bigram key) and the scoring side; counts
    * attach back via one join on the bigram key after the unigram count
    * and the broadcast vocabulary scalar fold into the model table — so
    * the wide work is two token-keyed hash-aggregates and one
    * model-sized join, all partial-aggregated map-side. Counts stay
    * integer until the single ln per distinct bigram. */
  def bigramLogLoss(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val w = words(col(textCol))
    val inst = df.select(col(idCol).as("__id"), explode(zip_with(
        slice(w, lit(1), size(w) - 1), slice(w, lit(2), size(w) - 1),
        (a, b) => struct(a.as("w1"), b.as("w2")))).as("__b"))
      .select(col("__id"), col("__b.w1").as("__w1"), col("__b.w2").as("__w2"))
    val uni = df.select(explode(w).as("__t")).groupBy("__t").agg(count(lit(1)).as("__cu"))
    val vocab = uni.agg(count(lit(1)).as("__v"))
    // model table: per-bigram −ln P computed ONCE per distinct bigram,
    // instances then join it on the bigram key
    val model = inst.groupBy("__w1", "__w2").agg(count(lit(1)).as("__cb"))
      .join(uni.withColumnRenamed("__t", "__w1"), "__w1")
      .crossJoin(broadcast(vocab))
      .select(col("__w1"), col("__w2"),
        (-log((col("__cb") + 1.0) / (col("__cu") + col("__v")))).as("__nl"))
    inst.join(model, Seq("__w1", "__w2"))
      .groupBy(col("__id").as(idCol))
      .agg(count(lit(1)).as("n_bigrams"),
        round(sum(col("__nl")) / count(lit(1)), 4).as("nll"))
  }

  /** Corpus collocations by pointwise mutual information: adjacent word
    * pairs occurring ≥ `minCount` times, scored
    * PMI = ln( p(w1 w2) / (p(w1)·p(w2)) )
    *     = ln( c(w1 w2) · U² / (B · c(w1) · c(w2)) )
    * with U = total unigram tokens, B = total bigram tokens — the classic
    * collocation-extraction statistic (Church & Hanks 1990), useful for
    * spotting templated boilerplate phrases in a crawl. All counts stay
    * integer until the single ratio+ln at the end (rounded to 4), so the
    * SQL oracle matches bit-for-bit. Output: (w1, w2, n, pmi).
    *
    * Scale shape: two explode→hash-aggregate passes over the corpus
    * (unigrams, bigrams — each one shuffle on the token), then the
    * ≥ minCount bigram survivors join the unigram vocabulary twice on
    * its key. The survivor side shrinks by the count floor before any
    * join, and the corpus-total scalars ride in as a broadcast. */
  def collocations(df: DataFrame, textCol: String, minCount: Int = 5): DataFrame = {
    val w = words(col(textCol))
    val uni = df.select(explode(w).as("__t"))
      .groupBy("__t").agg(count(lit(1)).as("__c"))
    val bi = df.select(explode(zip_with(
        slice(w, lit(1), size(w) - 1), slice(w, lit(2), size(w) - 1),
        (a, b) => struct(a.as("w1"), b.as("w2")))).as("__b"))
      .groupBy(col("__b.w1").as("w1"), col("__b.w2").as("w2"))
      .agg(count(lit(1)).as("n"))
    val totals = uni.agg(sum("__c").cast("double").as("u_total"))
      .crossJoin(bi.agg(sum("n").cast("double").as("b_total")))
    bi.filter(col("n") >= minCount)
      .join(uni.select(col("__t").as("w1"), col("__c").as("c1")), "w1")
      .join(uni.select(col("__t").as("w2"), col("__c").as("c2")), "w2")
      .crossJoin(broadcast(totals))
      .select(col("w1"), col("w2"), col("n"),
        round(log(col("n") * col("u_total") * col("u_total") /
          (col("b_total") * col("c1") * col("c2"))), 4).as("pmi"))
  }
}
