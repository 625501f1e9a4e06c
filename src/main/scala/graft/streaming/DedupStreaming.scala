package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.pipeline.Dedup

/** Structured Streaming twins of the batch dedup family
  * (graft.pipeline.Dedup) — the shapes a continuously-ingesting training
  * -data pipeline runs: suppress exact repeats as documents arrive, and
  * flag arrivals that near-duplicate a fixed reference corpus.
  *
  * Both are state-bounded by construction: exact dedup keeps content
  * hashes only within an explicit watermark horizon; the near-dup check
  * keeps NO stream state at all (a stream-static join against a prebuilt
  * band index) beyond the pair-dedup horizon.
  */
object DedupStreaming {
  /** Convenience arrival-row shape for typed streams. */
  case class Doc(doc_id: Long, text: String, ts: java.sql.Timestamp)

  /** Emit only the first-seen document per normalized content hash.
    * Duplicates separated by more than `horizon` of event time may
    * re-emit — that is the explicit state/recall tradeoff (state is
    * dropped at the watermark), same contract as
    * `dropDuplicatesWithinWatermark`. */
  def exactStream(docs: DataFrame, textCol: String, tsCol: String,
                  horizon: String = "1 hour"): DataFrame =
    docs.withColumn("__h", xxhash64(Dedup.normalize(col(textCol))))
      .withWatermark(tsCol, horizon)
      .dropDuplicatesWithinWatermark("__h")
      .drop("__h")

  /** Band keys of a minhash signature — (band index, band hash) rows.
    * Kept private and shared by BOTH the index build and the stream side
    * so the two bucketings cannot drift. */
  private def bandKeys(sig: Column, bands: Int, rows: Int): Column =
    transform(sequence(lit(0), lit(bands - 1)),
      j => xxhash64(concat_ws(",", slice(sig, j * rows + 1, lit(rows)))))

  /** Prebuilt LSH index of a static reference corpus: one row per
    * (band, band-hash) bucket membership, carrying the corpus document's
    * hashed shingle set for exact verification. Build once, persist, and
    * hand to [[nearDupAgainstCorpus]] — the corpus is scanned only at
    * build time, never per micro-batch. */
  def corpusIndex(corpus: DataFrame, idCol: String, textCol: String,
                  shingleN: Int = 3, numHashes: Int = 64,
                  bands: Int = 32): DataFrame = {
    val rows = numHashes / bands
    val sh = corpus.select(col(idCol).as("__cid"),
      Dedup.shingles(col(textCol), shingleN).as("__sh"))
    val signed = Dedup.minhashSignatures(sh, "__cid", "__sh", numHashes)
      .join(sh, "__cid")
      // sorted+distinct so the per-candidate verify is a merge scan
      // (graft_sorted_intersect) — must match the stream side's encoding
      .select(col("__cid"),
        sort_array(array_distinct(graft.functions.VectorExprs.hashArray(col("__sh")))).as("__cshh"),
        posexplode(bandKeys(col("__sig"), bands, rows)))
    signed.select(col("__cid"), col("__cshh"),
      col("pos").as("__band"), col("col").as("__bh"))
  }

  /** Flag streaming documents that near-duplicate the reference corpus:
    * per-row signature (expression-form minhash) → band explode →
    * equi-join the static index on (band, band hash) → exact Jaccard
    * verify → one row per (arrival, corpus doc) pair above `threshold`,
    * deduplicated across bands within the watermark horizon.
    * Output: (idCol, dup_of, jaccard). */
  def nearDupAgainstCorpus(stream: DataFrame, idCol: String, textCol: String,
                           tsCol: String, index: DataFrame,
                           shingleN: Int = 3, numHashes: Int = 64,
                           bands: Int = 32, threshold: Double = 0.5,
                           horizon: String = "1 hour"): DataFrame = {
    val rows = numHashes / bands
    val sh = Dedup.shingles(col(textCol), shingleN)
    val withSig = stream
      .withColumn("__shh", sort_array(array_distinct(graft.functions.VectorExprs.hashArray(sh))))
      .withColumn("__sig", Dedup.minhashSignature(sh, numHashes))
      .select(col(idCol), col(tsCol), col("__shh"),
        posexplode(bandKeys(col("__sig"), bands, rows)))
      .select(col(idCol), col(tsCol), col("__shh"),
        col("pos").as("__band"), col("col").as("__bh"))
    val cand = withSig.join(index, Seq("__band", "__bh"))
    val inter = graft.functions.VectorExprs
      .sortedIntersectCount(col("__shh"), col("__cshh")).cast("double")
    cand
      .withColumn("__i", inter)
      .withColumn("jaccard",
        col("__i") / (size(col("__shh")) + size(col("__cshh")) - col("__i")))
      .filter(col("jaccard") >= threshold)
      .withWatermark(tsCol, horizon)
      .dropDuplicatesWithinWatermark(idCol, "__cid")
      .select(col(idCol), col("__cid").as("dup_of"), col("jaccard"))
  }

  /** Distinct shingle-hash set of a benchmark suite — the static side of
    * [[contaminatedStream]]. Benchmarks are tiny next to the stream's
    * lifetime volume, so this builds in one narrow aggregation and is
    * broadcast into every micro-batch's semi-join. Build once, persist. */
  def benchmarkIndex(bench: DataFrame, textCol: String, shingleN: Int = 4): DataFrame =
    bench.select(explode(graft.functions.VectorExprs.hashArray(
        Dedup.shingles(col(textCol), shingleN))).as("__s"))
      .distinct()

  /** Streaming twin of [[graft.pipeline.Dedup.decontaminate]]: flag
    * arriving documents sharing ANY word n-gram shingle with the static
    * benchmark suite, as they arrive. Output: (idCol, tsCol) append rows,
    * one per contaminated arrival within the watermark horizon.
    *
    * State shape: the shingle explode + stream-static semi-join keep NO
    * stream state; the only state is the per-id dedup within the
    * watermark (a doc matching several benchmark shingles emits once).
    * Arrivals needing an overlap threshold > 1 belong in the batch op —
    * counting per doc would force a stateful aggregation for a signal the
    * nightly batch pass computes exactly. */
  def contaminatedStream(stream: DataFrame, idCol: String, textCol: String,
                         tsCol: String, benchIndex: DataFrame,
                         shingleN: Int = 4, horizon: String = "1 hour"): DataFrame =
    stream.select(col(idCol), col(tsCol),
        explode(graft.functions.VectorExprs.hashArray(
          Dedup.shingles(col(textCol), shingleN))).as("__s"))
      .join(benchIndex, Seq("__s"), "left_semi")
      .withWatermark(tsCol, horizon)
      .dropDuplicatesWithinWatermark(idCol)
      .select(col(idCol), col(tsCol))

  /** Bloom variant of [[contaminatedStream]] for benchmark suites whose
    * exact shingle index outgrows the broadcast budget: membership is the
    * same join-free bit arithmetic as
    * [[graft.pipeline.Dedup.decontaminateBloom]], so each micro-batch is
    * a pure scan — the only state is the per-id watermark dedup. Same
    * one-sided error: no false negatives, ~fpp spurious flags. */
  def contaminatedStreamBloom(stream: DataFrame, idCol: String, textCol: String,
                              tsCol: String, bloom: Dedup.BloomIndex,
                              shingleN: Int = 4, horizon: String = "1 hour"): DataFrame =
    Dedup.bloomHits(stream, Seq(idCol, tsCol), textCol, bloom, shingleN)
      .withWatermark(tsCol, horizon)
      .dropDuplicatesWithinWatermark(idCol)
      .select(col(idCol), col(tsCol))

  /** Streaming twin of [[graft.pipeline.Dedup.dedupPassages]]: rewrite
    * arriving documents with a KNOWN boilerplate set removed. The common
    * passages (from [[graft.pipeline.Dedup.commonPassages]] over the
    * at-rest corpus) are collected ONCE at stream construction and
    * inlined as a literal lookup, so the running stream is a pure per-row
    * map — no state, no shuffle, no per-batch join; every micro-batch
    * rewrites its rows independently and the output is plain append.
    *
    * Right-sized for real boilerplate sets (10³–10⁴ passages — headers,
    * licenses, navigation chrome). A flagged set too large to inline is
    * the batch rewrite's job: a per-doc streaming REASSEMBLY after an
    * exploded stream-static join would force a stateful aggregation, and
    * recall on passages discovered after a document has passed is
    * impossible in any streaming design — the nightly batch pass is the
    * exact version. */
  def scrubStream(stream: DataFrame, idCol: String, textCol: String,
                  passageIndex: DataFrame, k: Int = 8): DataFrame = {
    val common = passageIndex.collect().map(_.getString(0))
    val pass = Dedup.passageArray(col(textCol), k)
    val kept =
      if (common.isEmpty) pass
      else {
        // literal map for O(small) membership inside codegen — no UDF
        val lookup = map(common.flatMap(p => Seq(lit(p), lit(true))).toIndexedSeq: _*)
        filter(pass, p => !map_contains_key(lookup, p))
      }
    stream.select(col(idCol), array_join(kept, " ").as(textCol))
  }
}
