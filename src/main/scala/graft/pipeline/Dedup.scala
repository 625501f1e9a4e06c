package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for large-scale document corpora.
  *
  * All variants are shuffle-bounded bucket joins — never an all-pairs
  * cartesian — so they hold at 100 TB: candidate generation groups rows by a
  * short key (exact hash / LSH band / simhash chunk / shared shingle) and
  * only pairs rows *within* a bucket, then verifies candidates exactly.
  *
  * MinHash/banding math: P(candidate | jaccard=j) = 1-(1-j^r)^b; with the
  * defaults (64 hashes, 32 bands × 2 rows) a 0.9-similar pair is missed with
  * probability ~3e-24 while a 0.1-similar pair is bucketed with p < 0.03.
  */
object Dedup {
  /** 2^31-1 (Mersenne prime) — hash domain for the affine min-hash family.
    * a,b < 2^31 and x < 2^32 keep a*x+b < 2^63 (no Long overflow). */
  private val P = 2147483647L
  private val HASH_DOMAIN = 4294967296L // 2^32

  /** Deterministic affine-permutation coefficients (fixed-seed LCG). */
  private def coeffs(n: Int, seed: Long): (Array[Long], Array[Long]) = {
    var s = seed
    def next(): Long = { s = s * 6364136223846793005L + 1442695040888963407L; (s >>> 33) % (P - 1) }
    val a = Array.fill(n)(next() + 1) // a != 0
    val b = Array.fill(n)(next())
    (a, b)
  }

  def normalize(text: Column): Column = lower(trim(text))

  /** Distinct word n-gram shingles of a text column: native split (codegen)
    * into the native [[graft.functions.ShingleArray]] window builder — the
    * earlier Column-expression form ran one interpreted lambda dispatch
    * per shingle (HOFs get no codegen) and dominated every near-dup op's
    * corpus scan. Output identical: distinct n-grams in first-occurrence
    * order; fewer than n words → one shingle = the normalized text. */
  def shingles(text: Column, n: Int): Column =
    graft.functions.VectorExprs.shingleArray(split(normalize(text), " "), n)

  /** Exact dedup: one survivor (min id) per normalized-text group.
    * At scale this is a single hash-shuffle on a 64-bit text hash; grouping
    * by xxhash64(text) instead of the full text keeps shuffle rows narrow. */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(xxhash64(normalize(col(textCol))).as("__h"))
      .agg(min(col(idCol)).as(idCol))
      .drop("__h")

  /** MinHash signature (array<long> of length numHashes) over shingles —
    * expression form for single-column use. For whole-corpus signing prefer
    * [[minhashSignatures]] (explode + hash-aggregate, stays in codegen). */
  def minhashSignature(sh: Column, numHashes: Int, seed: Long = 42L): Column = {
    val (a, b) = coeffs(numHashes, seed)
    val aCol = typedLit(a); val bCol = typedLit(b)
    // shingle hashes bound ONCE per row (single-element transform lambda):
    // referencing the hash subtree inside the per-hash lambda would
    // re-hash every shingle once per hash function (64x) — same
    // no-subexpression-elimination-in-lambdas trap as shingles()
    element_at(transform(array(transform(sh, s => pmod(xxhash64(s), lit(HASH_DOMAIN)))), hs =>
      transform(sequence(lit(0), lit(numHashes - 1)),
        i => array_min(transform(hs,
          x => pmod(element_at(aCol, i + 1) * x + element_at(bCol, i + 1), lit(P)))))), 1)
  }

  /** Corpus-wide MinHash signatures as (id, sig): explode shingles, hash
    * once, then ONE hash-aggregate computing all numHashes minima as plain
    * agg columns — fully inside whole-stage codegen and spillable, unlike
    * nested array lambdas which run interpreted per row. */
  def minhashSignatures(shingleDf: DataFrame, idCol: String, shCol: String,
                        numHashes: Int, seed: Long = 42L): DataFrame = {
    val (a, b) = coeffs(numHashes, seed)
    val ex = shingleDf.select(col(idCol), explode(col(shCol)).as("__s"))
      .withColumn("__h", pmod(xxhash64(col("__s")), lit(HASH_DOMAIN)))
    val aggs = (0 until numHashes).map(i =>
      min(pmod(col("__h") * a(i) + b(i), lit(P))).as(s"__m$i"))
    ex.groupBy(col(idCol))
      .agg(aggs.head, aggs.tail: _*)
      .select(col(idCol), array((0 until numHashes).map(i => col(s"__m$i")): _*).as("__sig"))
  }

  /** Banded LSH keys of minhash signatures: (outId, band index, band
    * hash). Band hashes are a static array(...) of codegen'd expressions —
    * a transform(sequence(...)) lambda runs interpreted per row (HOFs get
    * no codegen, measured ~3 s/50k docs). */
  private def bandedKeys(sigDf: DataFrame, idCol: String, sigCol: String,
                         outId: String, bands: Int, rows: Int): DataFrame =
    sigDf.select(col(idCol).as(outId),
        posexplode(array((0 until bands).map(j =>
          xxhash64(concat_ws(",", slice(col(sigCol), j * rows + 1, rows)))): _*)))
      .select(col(outId), col("pos").as("__band"), col("col").as("__bh"))

  /** LSH candidate pairs (a < b) from banded minhash signatures: one
    * shuffle to bucket by (band index, band hash), pairs built only
    * within buckets — the scale-safe alternative to all-pairs.
    *
    * Degenerate-bucket guard (same policy as [[simhashCandidates]]):
    * buckets above `maxBucket` — mass-identical documents collide in
    * EVERY band, making the bucket join O(n²) on them — are dropped from
    * the join and LOGGED. Run exact dedup first (as
    * [[graft.pipeline.Curation.curate]] does) and such buckets cannot
    * exist. */
  def lshCandidates(sigDf: DataFrame, idCol: String, sigCol: String,
                    bands: Int, rows: Int, maxBucket: Long = 100000L): DataFrame = {
    // materialized once and released after the (small) pair list is
    // checkpointed
    val banded = bandedKeys(sigDf, idCol, sigCol, "__id", bands, rows)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val big = banded.groupBy("__band", "__bh").agg(count(lit(1)).as("__n"))
        .filter(col("__n") > maxBucket)
      val bigRows = big.collect()
      if (bigRows.nonEmpty)
        org.apache.logging.log4j.LogManager.getLogger(getClass).warn(
          s"lshCandidates: dropping ${bigRows.length} degenerate band buckets (> $maxBucket " +
          s"docs): ${bigRows.take(5).mkString(", ")} — mass-identical documents collide in " +
          "every band; exact-dedup the corpus first")
      val kept =
        if (bigRows.isEmpty) banded
        else banded.join(broadcast(big.select("__band", "__bh")), Seq("__band", "__bh"), "left_anti")
      // band-bucket self-join; per-pair work stays codegen'd (see
      // simhashCandidates for why not groupBy+emit), strategy left to stats
      val l = kept.alias("l"); val r = kept.alias("r")
      l.join(r, col("l.__band") === col("r.__band") && col("l.__bh") === col("r.__bh") &&
          col("l.__id") < col("r.__id"))
        .select(col("l.__id").as("a_id"), col("r.__id").as("b_id"))
        .distinct()
        .localCheckpoint(true)
    } finally banded.unpersist(false)
  }

  /** (__id, sorted distinct xxhash64 shingle hashes) — the per-document
    * projection the exact-Jaccard verify merge-scans. Sorted + deduped
    * once per DOCUMENT so the per-PAIR intersection is a native
    * allocation-free merge scan (graft_sorted_intersect) instead of a
    * hash set built per candidate pair. */
  private def hashedSets(shingleDf: DataFrame): DataFrame =
    shingleDf.select(col("__id"),
      sort_array(array_distinct(
        graft.functions.VectorExprs.hashArray(col("__sh")))).as("__shh"))

  /** Exact Jaccard over a PRE-BUILT [[hashedSets]] frame (the caller owns
    * its persist/unpersist bracket) — the verify core behind
    * [[verifyJaccard]] and [[verifyOverlapped]]. Shingles are hashed to
    * longs once per document before the candidate join: at high candidate
    * volume the verify join dominates, and moving 8-byte elements (with
    * primitive intersection) instead of ~30-byte shingle strings cut the
    * measured verify time ~30%. An xxhash64 collision inside one pair's
    * union (~10² shingles over a 2⁶⁴ domain, p ≈ 10⁻¹⁵) is the only way
    * this diverges from string Jaccard. */
  private def verifyJaccardHashed(pairs: DataFrame, hashed: DataFrame, threshold: Double,
                                  keepScores: Boolean): DataFrame = {
    val sa = hashed.select(col("__id").as("a_id"), col("__shh").as("__sha"))
    val sb = hashed.select(col("__id").as("b_id"), col("__shh").as("__shb"))
    pairs.join(sa, "a_id").join(sb, "b_id")
      .withColumn("__i", graft.functions.VectorExprs
        .sortedIntersectCount(col("__sha"), col("__shb")).cast("double"))
      .withColumn("jaccard", col("__i") / (size(col("__sha")) + size(col("__shb")) - col("__i")))
      .filter(col("jaccard") >= threshold)
      .select((Seq(col("a_id"), col("b_id")) ++ (if (keepScores) Seq(
        col("__i").cast("long").as("n_common"),
        size(col("__sha")).cast("long").as("n_a"),
        size(col("__shb")).cast("long").as("n_b")) else Nil)): _*)
      .localCheckpoint(true)
  }

  private def verifyJaccard(pairs: DataFrame, shingleDf: DataFrame, threshold: Double,
                            keepScores: Boolean = false): DataFrame = {
    // Materialized ONCE: the hash+sort projection is per-row lambda work
    // (interpreted) and the two join sides would each recompute it.
    val hashed = hashedSets(shingleDf)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try verifyJaccardHashed(pairs, hashed, threshold, keepScores)
    finally hashed.unpersist(false)
  }

  /** Side threads for overlapping an independent Spark job with the
    * driver's own synchronous job sequence (guide §2.6): the side job's
    * tasks back-fill executor slots the foreground stages' tails leave
    * idle. A CACHED pool, not a single thread: each concurrent caller
    * gets its own side job (the one-side-job invariant is per CALL), so
    * one caller's Await never queues behind another caller's side count.
    * Threads idle out after 60 s; side jobs are rare and short. */
  private lazy val overlapEc = scala.concurrent.ExecutionContext.fromExecutor(
    java.util.concurrent.Executors.newCachedThreadPool((r: Runnable) => {
      val t = new Thread(r, "dedup-overlap"); t.setDaemon(true); t
    }))

  /** Submit `body` as an overlapped side job with the inherited Spark
    * local properties CLEARED: pool threads are created (and reused)
    * under whichever caller thread first triggers them and would
    * otherwise replay that caller's job group / scheduler pool / SQL
    * execution id into every later side job — a cancelJobGroup or
    * FAIR-pool assignment from a different caller could then hit or miss
    * the wrong side job. */
  private[graft] def sideJob[T](sc: org.apache.spark.SparkContext)(body: => T)
      : scala.concurrent.Future[T] =
    scala.concurrent.Future {
      for (k <- Seq("spark.jobGroup.id", "spark.job.description",
                    "spark.job.interruptOnCancel", "spark.scheduler.pool",
                    "spark.sql.execution.id"))
        sc.setLocalProperty(k, null)
      body
    }(overlapEc)

  /** Bounded drain of a side job on the owner's exit path: on success the
    * future is already complete and this returns instantly; on the
    * FAILURE path it refuses to let a slow side count delay the real
    * exception forever (10 min is far beyond any side job's honest
    * runtime). If the bound trips, the caches the side job reads are
    * unpersisted under it — safe, its tasks just recompute from lineage. */
  private[graft] def drainSide(side: scala.concurrent.Future[_]): Unit =
    scala.util.Try(scala.concurrent.Await.ready(
      side, scala.concurrent.duration.Duration(600, "s")))

  /** [[verifyJaccard]] overlapped with candidate generation (guide §2.6):
    * the verify join's per-document hash+sort projection is independent of
    * the candidate pairs, so when `mkPairs` runs driver-synchronous jobs
    * of its own (the banded/chunked histogram collect, an eager candidate
    * checkpoint), the projection is materialized CONCURRENTLY on a side
    * thread instead of serially inside the verify job. Failures on either
    * side propagate (Await rethrows); the cache is released on all paths,
    * never before the side job has finished with it. */
  /** Storage-residency note (scale): while the side count runs, the
    * shingle cache, the banded-keys cache (inside mkPairs) and this
    * hashed projection are resident TOGETHER — three MEMORY_AND_DISK
    * frames where the pre-overlap code held two. On memory-tight
    * executors the eviction/spill of the shingle cache can erode the
    * overlap win; watch storage metrics before assuming the overlap
    * helps at a new scale. */
  private def verifyOverlapped(shingleDf: DataFrame, threshold: Double,
                               keepScores: Boolean = false)
                              (mkPairs: => DataFrame): DataFrame = {
    val hashed = hashedSets(shingleDf)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val side = sideJob(shingleDf.sparkSession.sparkContext)(hashed.count())
    try {
      val pairs = mkPairs
      scala.concurrent.Await.result(side, scala.concurrent.duration.Duration.Inf)
      verifyJaccardHashed(pairs, hashed, threshold, keepScores)
    } finally {
      // mkPairs may have thrown with the side job still running: drain it
      // (bounded; already complete on the success path) before dropping
      // the blocks it is writing
      drainSide(side)
      hashed.unpersist(false)
    }
  }

  /** Near-dup pairs via MinHash-LSH candidates + exact Jaccard verification.
    * Returns (a_id, b_id) with a < b and shingle-Jaccard >= threshold. */
  /** Share the (big) shingle table across consumers, then materialize the
    * (small) pair result and RELEASE the shingle cache — no storage leak
    * per call in long-lived sessions.
    *
    * `checkpoint = false` for bodies that already RETURN an eagerly
    * checkpointed frame (the verify-join paths): re-checkpointing a
    * materialized frame is a full copy pass + one more driver-blocking
    * job per call for nothing (guide §1.2 — the per-call fixed cost is
    * the algorithm cost on these small-output ops). Bodies that return a
    * LAZY plan must keep the default: the checkpoint is what makes the
    * result independent of the shingle cache released in `finally`. */
  private def withShingles(df: DataFrame, idCol: String, textCol: String, shingleN: Int,
                           checkpoint: Boolean = true)
                          (body: DataFrame => DataFrame): DataFrame = {
    val sh = df.select(col(idCol).as("__id"), shingles(col(textCol), shingleN).as("__sh"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try { val out = body(sh); if (checkpoint) out.localCheckpoint(true) else out }
    finally sh.unpersist(false)
  }

  def nearDupMinhash(df: DataFrame, idCol: String, textCol: String,
                     shingleN: Int = 3, numHashes: Int = 64,
                     bands: Int = 32, threshold: Double = 0.5): DataFrame = {
    val rows = numHashes / bands
    withShingles(df, idCol, textCol, shingleN, checkpoint = false) { sh =>
      val sig = minhashSignatures(sh, "__id", "__sh", numHashes)
      verifyOverlapped(sh, threshold)(lshCandidates(sig, "__id", "__sig", bands, rows))
    }
  }

  /** [[nearDupMinhash]] keeping the verify pass's set statistics:
    * (a_id, b_id, n_common, n_a, n_b) — the shared-shingle count and the
    * two distinct-shingle set sizes the Jaccard was computed from. The
    * symmetric difference n_a + n_b − 2·n_common is an integer edge
    * weight ("how far from identical") for weighted graph analytics over
    * the near-dup graph; exposing it here costs nothing because the
    * verify join already holds all three numbers. */
  def nearDupMinhashScored(df: DataFrame, idCol: String, textCol: String,
                           shingleN: Int = 3, numHashes: Int = 64,
                           bands: Int = 32, threshold: Double = 0.5): DataFrame = {
    val rows = numHashes / bands
    withShingles(df, idCol, textCol, shingleN, checkpoint = false) { sh =>
      val sig = minhashSignatures(sh, "__id", "__sh", numHashes)
      verifyOverlapped(sh, threshold, keepScores = true)(
        lshCandidates(sig, "__id", "__sig", bands, rows))
    }
  }

  /** Exact n-gram-Jaccard near-dup pairs via an inverted shingle index:
    * explode (shingle → id), bucket-join on the shingle, count shared
    * shingles per pair, then the Jaccard from the per-doc set sizes.
    *
    * Skew guard: shingles with document frequency above `maxDf` are a
    * TINY set by construction (at most |corpus|/maxDf of the vocabulary
    * can exceed it) but each would create O(df²) join rows — one
    * boilerplate 3-gram shared by a million documents is a 10¹²-row
    * self-join. They are anti-joined (broadcast) out of the index, and
    * their contribution to each pair's intersection is restored EXACTLY
    * via a per-document common-shingle array (small, bounded by the
    * common set) — so the output is unchanged except for pairs whose
    * every shared shingle is corpus-common boilerplate. The collect of
    * the common set is a driver-side read of a bounded-tiny aggregate,
    * like the loop frontier counts. */
  def nearDupNgram(df: DataFrame, idCol: String, textCol: String,
                   shingleN: Int = 3, threshold: Double = 0.5,
                   maxDf: Long = 1000L): DataFrame =
    withShingles(df, idCol, textCol, shingleN) { sh =>
      sharedShingleCounts(sh, maxDf, "nearDupNgram")
        .withColumn("jaccard", col("__i").cast("double") / (col("__na") + col("__nb") - col("__i")))
        .filter(col("jaccard") >= threshold)
        .select(col("a_id"), col("b_id"))
    }

  /** Shared-shingle counts for every unordered doc pair with at least one
    * rare shared shingle: (a_id, b_id, __i, __na, __nb) with a < b —
    * the exact-intersection core behind [[nearDupNgram]] and
    * [[containmentPairs]] (df-cap skew guard documented there). */
  /** Audit-only accessor for the lazy kernel plan (the public consumers
    * return checkpointed frames whose executed plans hide it). */
  private[graft] def sharedShingleCountsForAudit(sh: DataFrame, maxDf: Long): DataFrame =
    sharedShingleCounts(sh, maxDf, "audit")

  private def sharedShingleCounts(sh: DataFrame, maxDf: Long, opName: String): DataFrame = {
    // the index carries xxhash64(shingle), not the ~30-byte string: the
    // self-join shuffles 8-byte keys and compares longs (same collision
    // argument as verifyJaccard — one in-doc-pair collision per ~10^15)
    val inv = sh.select(col("__id"),
      explode(graft.functions.VectorExprs.hashArray(col("__sh"))).as("__s"))
    val common = inv.groupBy("__s").agg(count(lit(1)).as("__df"))
      .filter(col("__df") > maxDf).select("__s")
    val commonList = common.collect().map(_.getLong(0))
    if (commonList.nonEmpty) {
      // mirror simhashCandidates' policy: recall loss is explicit, never
      // silent — a pair whose EVERY shared shingle is corpus-common
      // boilerplate is invisible to the capped index
      org.apache.logging.log4j.LogManager.getLogger(getClass).warn(
        s"$opName: ${commonList.length} shingles above df=$maxDf excluded from the " +
        "inverted index (their intersection contribution is restored exactly, but pairs " +
        "sharing ONLY corpus-common shingles cannot become candidates)")
    }
    val rareInv =
      if (commonList.isEmpty) inv
      else inv.join(broadcast(common), Seq("__s"), "left_anti")
    // index self-join; join + count beats a groupBy-and-emit-pairs form
    // because pair volume is Σ df² — per-pair work must stay codegen'd,
    // not inside an interpreted array lambda (measured 40% slower). The
    // join strategy is left to stats: broadcast is right while the
    // index fits (it did at bench scale) and is never picked once the
    // estimate is corpus-sized.
    val l = rareInv.alias("l"); val r = rareInv.alias("r")
    val shared = l.join(r, col("l.__s") === col("r.__s") && col("l.__id") < col("r.__id"))
      .groupBy(col("l.__id").as("a_id"), col("r.__id").as("b_id"))
      .agg(count(lit(1)).as("__ir"))
    val sizes = sh.select(col("__id"), size(col("__sh")).as("__n"))
    val withSizes = shared
      .join(sizes.select(col("__id").as("a_id"), col("__n").as("__na")), "a_id")
      .join(sizes.select(col("__id").as("b_id"), col("__n").as("__nb")), "b_id")
    if (commonList.isEmpty) withSizes.withColumn("__i", col("__ir"))
    else {
      val cpd = sh.select(col("__id"),
        array_intersect(graft.functions.VectorExprs.hashArray(col("__sh")),
          typedLit(commonList)).as("__c"))
      withSizes
        .join(cpd.select(col("__id").as("a_id"), col("__c").as("__ca")), "a_id")
        .join(cpd.select(col("__id").as("b_id"), col("__c").as("__cb")), "b_id")
        .withColumn("__i", col("__ir") + size(array_intersect(col("__ca"), col("__cb"))))
    }
  }

  /** Shingle-containment pairs (contained_id, container_id): ordered pairs
    * where |A∩B| / |A| ≥ `threshold` — the asymmetric cousin of
    * [[nearDupNgram]] that catches a document EMBEDDED in a larger one
    * (quote farms, wrapper pages, partial scrapes), which symmetric
    * Jaccard misses whenever the container is much bigger (J ≤ |A|/|B|).
    * One inverted-index pass serves both directions: the symmetric
    * (a, b, i, na, nb) counts yield containment a→b as i/na and b→a as
    * i/nb, so the candidate join runs ONCE and the direction split is a
    * pure projection (union of two filters, no second shuffle).
    *
    * Recall caveat (inherited from the `maxDf` cap in the shared-count
    * pass, and WORSE here than for symmetric Jaccard): a pair is visible
    * only if it shares at least one shingle with df ≤ `maxDf`. The
    * typical containment target — a short document embedded in
    * boilerplate — is exactly the case where EVERY shared shingle can be
    * corpus-common and exceed the cap, making the pair invisible. When
    * the contained side is small or the corpus is boilerplate-heavy,
    * raise `maxDf` (or pass Long.MaxValue to disable the cap) and absorb
    * the larger candidate join instead. */
  def containmentPairs(df: DataFrame, idCol: String, textCol: String,
                       shingleN: Int = 3, threshold: Double = 0.6,
                       maxDf: Long = 1000L): DataFrame =
    withShingles(df, idCol, textCol, shingleN) { sh =>
      val c = sharedShingleCounts(sh, maxDf, "containmentPairs")
      val iD = col("__i").cast("double")
      // both directions in ONE pass over the counts (a union of two
      // filters would execute the candidate join twice): emit the 0-2
      // passing directions per pair via explode of a filtered pair array
      c.select(explode(filter(array(
          struct((iD / col("__na") >= threshold).as("ok"),
            col("a_id").as("contained_id"), col("b_id").as("container_id")),
          struct((iD / col("__nb") >= threshold).as("ok"),
            col("b_id").as("contained_id"), col("a_id").as("container_id"))),
          s => s.getField("ok"))).as("__d"))
        .select(col("__d.contained_id").as("contained_id"),
          col("__d.container_id").as("container_id"))
    }

  /** Exact n-gram-Jaccard near-dup pairs via PREFIX FILTERING (Bayardo et
    * al. 2007 "Scaling Up All Pairs", Xiao et al. PPJoin): same output
    * contract as [[nearDupNgram]], different candidate generator. Shingle
    * hashes are globally ordered by (document frequency asc, hash asc) —
    * rarest first — and only each document's PREFIX (the first
    * n − ⌈t·n⌉ + 1 ordered shingles) enters the inverted index: two sets
    * with J ≥ t must share ≥ ⌈t·n⌉ elements, and by the prefix lemma two
    * such sets must collide inside these prefixes. Candidates then verify
    * exactly ([[verifyJaccard]]'s sorted-merge intersect).
    *
    * Scale shape vs the full inverted index: index volume drops by ~t
    * (at t=0.5, half), and — decisively — the indexed shingles are the
    * RAREST of each document, so Σ df² over index entries collapses:
    * high-df boilerplate shingles sort to the suffix and never join.
    * That removes the need for [[nearDupNgram]]'s df-cap recall caveat —
    * this variant is exact with no excluded-pair class. A size-ratio
    * pruning predicate (⌈t·max(na,nb)⌉ ≤ min(na,nb)) rides the candidate
    * join for free. */
  def nearDupPrefix(df: DataFrame, idCol: String, textCol: String,
                    shingleN: Int = 3, threshold: Double = 0.5): DataFrame =
    withShingles(df, idCol, textCol, shingleN, checkpoint = false) { sh =>
      val hashed = sh.select(col("__id"),
        array_distinct(graft.functions.VectorExprs.hashArray(col("__sh"))).as("__hs"))
      val inv = hashed.select(col("__id"), explode(col("__hs")).as("__s"))
      val dfreq = inv.groupBy("__s").agg(count(lit(1)).as("__df"))
      // per-doc shingles re-assembled in global rarity order; one shuffle
      // on __id (the struct sort makes (df, hash) the order inside the
      // collected array, no window needed)
      val ordered = inv.join(dfreq, "__s")
        .groupBy("__id")
        .agg(sort_array(collect_list(struct(col("__df"), col("__s")))).as("__o"))
        .select(col("__id"),
          transform(col("__o"), x => x.getField("__s")).as("__os"),
          size(col("__o")).as("__n"))
      val prefLen = (col("__n") - ceil(lit(threshold) * col("__n")) + 1).cast("int")
      val pref = ordered.select(col("__id"), col("__n"),
        explode(slice(col("__os"), lit(1), prefLen)).as("__s"))
      val l = pref.alias("l"); val r = pref.alias("r")
      val cand = l.join(r,
          col("l.__s") === col("r.__s") && col("l.__id") < col("r.__id") &&
          ceil(lit(threshold) * greatest(col("l.__n"), col("r.__n"))) <=
            least(col("l.__n"), col("r.__n")))
        .select(col("l.__id").as("a_id"), col("r.__id").as("b_id"))
        .distinct()
      verifyJaccard(cand, sh, threshold)
    }

  /** 64-bit SimHash over the word multiset: bit i of the fingerprint is the
    * majority vote of bit i across xxhash64(word) of every token. */
  def simhash64(text: Column): Column = {
    val tokens = split(normalize(text), " ")
    val n = size(tokens)
    (0 until 64).map { i =>
      val cnt = size(filter(tokens, t => (shiftrightunsigned(xxhash64(t), i).bitwiseAND(lit(1L))) === 1))
      when(cnt * 2 > n, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)
  }

  /** Corpus-wide SimHash as (id, sim): explode tokens, hash once, then one
    * hash-aggregate summing all 64 bit counts — same codegen/scale argument
    * as [[minhashSignatures]].
    *
    * Votes are deliberately UNWEIGHTED. IDF-weighted votes (Charikar/Manku
    * tf-idf simhash) were measured on this workload and made things worse:
    * the tokens on which two near-duplicate copies DIFFER are exactly the
    * rare, high-IDF ones, so weighting pushes true pairs from hamming <= 12
    * out to hamming 23+ while leaving the all-pairs median distance
    * unchanged (template-generated corpora sit at ~18/64 either way). */
  def simhashes(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    // The 64 per-bit majority counters are packed into 16 longs of four
    // 16-bit lanes each, so the hash aggregate carries 17 buffers per doc
    // instead of 65 — measured ~2x faster and the same one-shuffle shape.
    // Lane counts stay carry-free while a document has <= 32,767 tokens
    // (also the bound keeping the packed sum below Long.MaxValue); longer
    // documents are fingerprinted over their first 32,767 tokens — chunk
    // upstream if whole-doc fidelity matters at that size.
    val ex = df.select(col(idCol),
        explode(slice(split(normalize(col(textCol)), " "), 1, 32767)).as("__t"))
      .withColumn("__h", xxhash64(col("__t")))
    // pack j holds counters for bit positions {l*16 + j : l < 4}
    val aggs = (0 until 16).map { j =>
      sum((0 until 4).map { l =>
        shiftrightunsigned(col("__h"), l * 16 + j).bitwiseAND(lit(1L)) * lit(1L << (l * 16))
      }.reduce(_ + _)).as(s"__p$j")
    } :+ count(lit(1)).as("__n")
    val bits = ex.groupBy(col(idCol)).agg(aggs.head, aggs.tail: _*)
    // fingerprint reconstruction as ONE native loop expression — the
    // equivalent 64-term when() tree costs ~3 s of whole-stage Janino
    // compile on first run (graft.functions.PackedMajority's scaladoc)
    val sim = graft.functions.VectorExprs.packedMajority(
      array((0 until 16).map(j => col(s"__p$j")): _*), col("__n"))
    bits.select(col(idCol), sim.as("__sim"))
  }

  /** Candidate pairs within `maxHamming` of each other, from (__id, __sim)
    * fingerprints. Pigeonhole: the 64 bits are split into maxHamming+1
    * chunks, so any pair within the radius agrees on at least one whole
    * chunk at the same position; candidates = the (position, value)
    * bucket self-join, then hamming verified via bit_count(xor).
    *
    * Exposed separately so candidate volume is testable — the quadratic
    * failure mode of simhash is degenerate candidates, not wrong output.
    *
    * Scale guard: a (position, value) bucket of size n contributes O(n²)
    * join rows. On a template-homogeneous corpus fingerprints correlate
    * (measured all-pairs median hamming ~18/64, 1st percentile ~9, vs 32
    * for independent docs) and a loose radius makes buckets — and the true
    * candidate set itself — grow quadratically. Buckets larger than
    * `maxBucket` are dropped from the join and LOGGED (recall loss is
    * explicit, never silent). At web scale use a tight radius (Manku et
    * al. use 3) or MinHash-LSH ([[nearDupMinhash]]), whose band buckets
    * key on content, not on 8-bit fingerprint chunks. */
  def simhashCandidates(sims: DataFrame, maxHamming: Int = 7,
                        maxBucket: Long = 100000L): DataFrame = {
    val m = maxHamming + 1
    require(m >= 2 && m <= 32, s"maxHamming must be in [1,31], got $maxHamming")
    val base = 64 / m; val rem = 64 % m // rem chunks of base+1 bits, then base
    val offsets = (0 until m).map(k => if (k < rem) k * (base + 1) else rem * (base + 1) + (k - rem) * base)
    val widths = (0 until m).map(k => if (k < rem) base + 1 else base)
    // one row per (doc, chunk) via posexplode — the fingerprint is computed
    // once, not once per chunk branch
    val chunks = sims.select(col("__id"), col("__sim"),
        posexplode(array((0 until m).map(k =>
          shiftrightunsigned(col("__sim"), offsets(k)).bitwiseAND(lit((1L << widths(k)) - 1))): _*)))
      .withColumnRenamed("pos", "__ck").withColumnRenamed("col", "__cv")
    val big = chunks.groupBy("__ck", "__cv").agg(count(lit(1)).as("__n"))
      .filter(col("__n") > maxBucket)
    val bigRows = big.collect()
    if (bigRows.nonEmpty) {
      val log = org.apache.logging.log4j.LogManager.getLogger(getClass)
      log.warn(s"simhashCandidates: dropping ${bigRows.length} degenerate buckets " +
        s"(> $maxBucket docs): ${bigRows.take(5).mkString(", ")} — pairs whose every " +
        "shared chunk is degenerate will be missed; tighten maxHamming or use MinHash-LSH")
    }
    val kept =
      if (bigRows.isEmpty) chunks
      else chunks.join(broadcast(big.select("__ck", "__cv")), Seq("__ck", "__cv"), "left_anti")
    // chunk-bucket self-join. Under a wide radius the candidate ball is
    // millions of pairs, so the per-pair hamming test must stay inside
    // codegen: a groupBy-and-emit-pairs form puts it in an interpreted
    // array lambda and measured 10× slower at radius 13.
    val l = kept.alias("l"); val r = kept.alias("r")
    l.join(r, col("l.__ck") === col("r.__ck") && col("l.__cv") === col("r.__cv") &&
        col("l.__id") < col("r.__id"))
      .filter(bit_count(col("l.__sim").bitwiseXOR(col("r.__sim"))) <= maxHamming)
      .select(col("l.__id").as("a_id"), col("r.__id").as("b_id"))
      .distinct()
  }

  /** SimHash near-dup pairs: unweighted fingerprints (see [[simhashes]]),
    * radius-sized chunk-pigeonhole candidates, then exact Jaccard so output
    * matches the exact oracle.
    *
    * The default radius 7 (8 chunks of 8 bits) is the scale-sane regime —
    * production simhash dedup runs at radius ~3 on 64 bits (Manku et al.,
    * WWW'07) precisely because a wide radius is quadratic on correlated
    * corpora: at radius 13 the hamming ball over the driver's
    * template-generated sf0.1 corpus already holds 13% of ALL pairs (1.6M
    * of 12.5M — measured; the candidate join is exactly that ball, so no
    * bucketing scheme can save it). A Jaccard-0.9 pair flips each of the
    * 64 projections with p≈0.10 — hamming Binomial(64, 0.10), mean 6.6,
    * measured tail 12 across 256 true pairs at sf0.1 — so callers that
    * need FULL parity with a Jaccard oracle (the p03 conformance query)
    * must pass the tail radius explicitly and pay its candidate volume. */
  def nearDupSimhash(df: DataFrame, idCol: String, textCol: String,
                     maxHamming: Int = 7, shingleN: Int = 3,
                     threshold: Double = 0.5): DataFrame = {
    val sims = simhashes(df.select(col(idCol).as("__id"), col(textCol).as("__text")), "__id", "__text")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val sh = df.select(col(idCol).as("__id"), shingles(col(textCol), shingleN).as("__sh"))
      // small pair result materialized, fingerprint cache released; the
      // hash+sort projection overlaps the fingerprint/histogram jobs
      verifyOverlapped(sh, threshold)(simhashCandidates(sims, maxHamming))
    } finally sims.unpersist(false)
  }

  /** Connected components over a near-dup pair list: every id that occurs
    * in `pairs` is assigned `cluster_id` = the minimum id reachable
    * through the pairs (undirected). This is the step that turns pair
    * lists from [[nearDupMinhash]]/[[nearDupSimhash]]/
    * [[graft.pipeline.Similarity.nearDupEmbed]] into dedup decisions:
    * keep each cluster's canonical (min) id, drop the rest.
    *
    * Algorithm: alternating large-star / small-star (Kiveris et al.,
    * "Connected Components in MapReduce and Beyond", SoCC'14) — each round
    * is two hash-shuffles on the node id and the edge set only shrinks
    * toward stars, so it converges in O(log n) rounds even on adversarial
    * chains (plain min-label propagation needs O(diameter)). No
    * per-component state ever sits on one executor, so skew is bounded by
    * the max-degree star, not the component size. Driver-side loop
    * hygiene mirrors the traversal jump loop: every round ends in an
    * eager localCheckpoint (cuts lineage) whose materialization doubles
    * as the convergence count, and the previous round's blocks are
    * released immediately.
    *
    * Ids may be any orderable type (long doc ids, string gids).
    *
    * Pair lists are usually MUCH smaller than the corpus they came from
    * (only verified near-dups survive), so below `localThreshold` edges
    * the components come from a driver-side union-find over the collected
    * pairs — one collect, zero iterative jobs, bounded memory (~50 MB at
    * the 1M default). Above it, the distributed star loop runs; the two
    * paths compute the same assignment. */
  /** Rounds the last [[clusters]] call's distributed star loop ran
    * (0 = local union-find path taken). Observability for scale tests and
    * BASELINE notes; plan-building is single-threaded per session. */
  @volatile private[graft] var lastClusterRounds: Int = -1

  def clusters(pairs: DataFrame, aCol: String, bCol: String,
               maxIters: Int = 50, localThreshold: Long = 1L << 20): DataFrame = {
    val idType = pairs.schema(aCol).dataType
    require(pairs.schema(bCol).dataType == idType,
      s"pair columns must share a type, got $idType vs ${pairs.schema(bCol).dataType}")
    // Checkpoint bookkeeping: Dataset.unpersist is a NO-OP for
    // localCheckpoint blocks (they live outside the CacheManager), so each
    // round tracks the RDD ids its checkpoint registered and releases the
    // previous round's ids directly — the same mechanism as the traversal
    // jump loop. Ids are diffed around the checkpoint call, so a caller's
    // own persisted data is never touched (assumes no concurrent job is
    // persisting in this session mid-diff).
    val sc = pairs.sparkSession.sparkContext
    def tracked(df: DataFrame): (DataFrame, Set[Int]) = {
      val before = sc.getPersistentRDDs.keySet.toSet
      val out = df.localCheckpoint(true)
      (out, sc.getPersistentRDDs.keySet.toSet -- before)
    }
    def release(ids: Set[Int]): Unit =
      for (id <- ids; rdd <- sc.getPersistentRDDs.get(id)) rdd.unpersist(false)
    // current edge set (u, v): an undirected forest-in-progress; starts as
    // the input pairs minus self-loops
    var (edges, edgeIds) = tracked(pairs.select(col(aCol).as("u"), col(bCol).as("v"))
      .filter(col("u") =!= col("v")).distinct())
    // fixpoint test: the edge set is a set; same size + same order-free
    // content hash ⇒ unchanged. bit_xor of row hashes, not sum — XOR is
    // order-free, cannot overflow under ANSI, and rows are distinct so
    // nothing self-cancels; collision odds ~2^-64 per round (an
    // except().count() would cost two more shuffles for the same answer)
    def sig(df: DataFrame): (Long, Long) = {
      val r = df.agg(count(lit(1)),
        coalesce(bit_xor(xxhash64(col("u"), col("v"))), lit(0L))).head()
      (r.getLong(0), r.getLong(1))
    }
    var prevSig = sig(edges)
    if (prevSig._1 <= localThreshold) {
      // the local result is plain driver rows — the seed checkpoint can go
      lastClusterRounds = 0
      val out = clustersLocal(edges, idType)
      release(edgeIds)
      return out
    }
    var converged = false
    var iter = 0
    while (!converged && iter < maxIters) {
      // large-star: around every node u, link each LARGER neighbor to the
      // minimum of the neighborhood (incl. u) — long chains collapse
      val bi = edges.union(edges.select(col("v").as("u"), col("u").as("v")))
      val lsMin = bi.groupBy("u").agg(least(min(col("v")), col("u")).as("m"))
      val ls = bi.join(lsMin, "u").filter(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v"))
        .filter(col("u") =!= col("v")).distinct()
      // small-star: orient edges big→small, link every smaller neighbor
      // (and u itself) to the minimum neighbor
      val canon = ls.select(greatest(col("u"), col("v")).as("u"), least(col("u"), col("v")).as("v"))
        .distinct()
      val ssMin = canon.groupBy("u").agg(min(col("v")).as("m"))
      val (ss, ssIds) = tracked(canon.join(ssMin, "u")
        .select(col("v").as("u"), col("m").as("v"))
        .union(ssMin.select(col("u"), col("m").as("v")))
        .filter(col("u") =!= col("v")).distinct())
      // one sig job per round: this round's signature doubles as the next
      // round's "previous"
      val ssSig = sig(ss)
      converged = ssSig == prevSig
      prevSig = ssSig
      release(edgeIds)
      edges = ss; edgeIds = ssIds
      iter += 1
    }
    // the final round's checkpoint intentionally stays persisted: the
    // returned plan reads from it (callers release it with their usual
    // post-query cleanup, e.g. Bench's scoped unpersist)
    lastClusterRounds = iter
    if (!converged)
      org.apache.logging.log4j.LogManager.getLogger(getClass).warn(
        s"clusters: not converged after $maxIters rounds; assignments may chain")
    // post-convergence the edge set IS the assignment (u → its component
    // min); roots appear only on the right, so add their self-assignments
    val roots = edges.select(col("v")).distinct()
      .join(edges.select(col("u").as("v")), Seq("v"), "left_anti")
    edges.select(col("u").as("id"), col("v").as("cluster_id"))
      .union(roots.select(col("v").as("id"), col("v").as("cluster_id")))
  }

  /** Driver-side fast path for [[clusters]]: union-find (path compression)
    * over the collected edge list, then min-id per component. Only called
    * under `localThreshold`, so memory is bounded by construction. */
  private def clustersLocal(edges: DataFrame,
                            idType: org.apache.spark.sql.types.DataType): DataFrame = {
    import scala.collection.mutable
    import scala.jdk.CollectionConverters._
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{StructField, StructType}
    val parent = mutable.HashMap.empty[Any, Any]
    def find(x: Any): Any = {
      var r = x
      while (parent.getOrElse(r, r) != r) r = parent(r)
      var c = x
      while (parent.getOrElse(c, c) != r) { val n = parent(c); parent(c) = r; c = n }
      r
    }
    val ids = mutable.HashSet.empty[Any]
    for (row <- edges.collect()) {
      val (a, b) = (row.get(0), row.get(1))
      ids += a; ids += b
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(rb) = ra // arbitrary link; min resolved below
    }
    def lt(x: Any, y: Any): Boolean = x.asInstanceOf[Comparable[Any]].compareTo(y) < 0
    val minOf = mutable.HashMap.empty[Any, Any]
    for (id <- ids) {
      val r = find(id)
      if (!minOf.contains(r) || lt(id, minOf(r))) minOf(r) = id
    }
    val rows: java.util.List[Row] = ids.toSeq.map(id => Row(id, minOf(find(id)))).asJava
    edges.sparkSession.createDataFrame(rows,
      StructType(Seq(StructField("id", idType), StructField("cluster_id", idType))))
  }

  /** One row per surviving document: the canonical (min-id) member of each
    * near-dup cluster plus every unpaired document. `pairs` must use ids
    * from `idCol`. */
  def survivors(df: DataFrame, idCol: String, pairs: DataFrame,
                aCol: String = "a_id", bCol: String = "b_id"): DataFrame = {
    val drop = clusters(pairs, aCol, bCol)
      .filter(col("id") =!= col("cluster_id"))
      .select(col("id").as(idCol))
    df.join(drop, Seq(idCol), "left_anti")
  }

  /** [[survivors]] with a QUALITY policy instead of min-id: per near-dup
    * cluster keep the row maximizing `scoreCol` (ties break on min id) —
    * the survivorship rule real curation pipelines want, since near-dups
    * routinely differ in boilerplate, truncation, or encoding damage and
    * "keep the best copy" beats "keep an arbitrary copy".
    *
    * Scale shape: [[clusters]]' log-round contraction produces the
    * (id, cluster_id) frame; the score joins on the id key, the per-
    * cluster argmax is one window over cluster_id (clusters are
    * near-dup-sized, so no skewed partitions), and the loser set — by
    * construction smaller than the pair list — anti-joins back against
    * the corpus (broadcast while it fits). The corpus itself is never
    * shuffled. */
  def survivorsBy(df: DataFrame, idCol: String, scoreCol: Column,
                  pairs: DataFrame,
                  aCol: String = "a_id", bCol: String = "b_id"): DataFrame = {
    val scored = df.select(col(idCol).as("id"), scoreCol.as("__score"))
    val ranked = clusters(pairs, aCol, bCol).join(scored, "id")
      .withColumn("__rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("cluster_id"))
          .orderBy(col("__score").desc, col("id").asc)))
    val losers = ranked.filter(col("__rn") > 1).select(col("id").as(idCol))
    df.join(losers, Seq(idCol), "left_anti")
  }

  /** Benchmark decontamination: flag corpus documents sharing at least
    * `minOverlap` distinct word n-gram shingles with ANY benchmark
    * document — the hygiene pass that keeps evaluation sets out of a
    * training corpus. Output: (idCol, hits) per contaminated document,
    * hits = how many of its distinct shingles occur anywhere in the
    * benchmark. Drop flagged rows with a left_anti on the result to clean.
    *
    * Scale shape: a benchmark suite is tiny next to a 100 TB corpus, so
    * the distinct benchmark shingle-hash set builds in one narrow
    * aggregation and broadcasts into the corpus-side semi-join (Catalyst
    * picks broadcast from stats while it fits; the corpus itself never
    * shuffles before the per-document count). Shingles join as xxhash64
    * keys — 8-byte shuffle rows, same collision bound as the near-dup
    * verifies (~one in-doc collision per 10^15). */
  def decontaminate(corpus: DataFrame, idCol: String, textCol: String,
                    bench: DataFrame, benchTextCol: String,
                    shingleN: Int = 4, minOverlap: Long = 1L): DataFrame = {
    val bsh = bench.select(explode(graft.functions.VectorExprs.hashArray(
        shingles(col(benchTextCol), shingleN))).as("__s"))
      .distinct()
    val csh = corpus.select(col(idCol), explode(graft.functions.VectorExprs.hashArray(
        shingles(col(textCol), shingleN))).as("__s"))
    // shingles() emits distinct shingles per document, so count(*) after the
    // semi-join IS |doc shingles ∩ benchmark shingles|
    csh.join(bsh, Seq("__s"), "left_semi")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("hits"))
      .filter(col("hits") >= minOverlap)
  }

  /** The reverse direction of [[decontaminate]]: a per-BENCHMARK-ITEM
    * compromise report — for each eval item, how many corpus documents
    * share at least one `shingleN`-gram with it (`n_docs`) and the total
    * shared-shingle count (`n_hits`), zero rows included. [[decontaminate]]
    * answers "which training docs must go"; this answers "which eval items
    * can no longer be trusted" — the audit a leaderboard claim needs.
    * Output: (benchIdCol, n_docs, n_hits), one row per bench item.
    *
    * Scale shape: the benchmark shingle set is eval-suite-sized and
    * broadcast; the corpus explodes once and hash-joins on the 64-bit
    * shingle key with map-side partial counts. A corpus-common shingle
    * that also appears in the benchmark multiplies rows by its df — the
    * same worst case as decontaminate's semi-join, bounded by
    * |bench shingles| × df, and shingleN=4 keeps natural-language df low
    * (the p29/p47 df analyses). */
  def contaminationReport(corpus: DataFrame, idCol: String, textCol: String,
                          bench: DataFrame, benchIdCol: String, benchTextCol: String,
                          shingleN: Int = 4): DataFrame = {
    val bsh = bench.select(col(benchIdCol), explode(graft.functions.VectorExprs.hashArray(
        shingles(col(benchTextCol), shingleN))).as("__s"))
    val csh = corpus.select(col(idCol).as("__cid"), explode(graft.functions.VectorExprs.hashArray(
        shingles(col(textCol), shingleN))).as("__s"))
    // shingles() emits distinct shingles per document on BOTH sides, so
    // count(*) per (item, doc) is |item shingles ∩ doc shingles|
    val hits = csh.join(broadcast(bsh), Seq("__s"))
      .groupBy(col(benchIdCol))
      .agg(countDistinct(col("__cid")).as("n_docs"), count(lit(1)).as("n_hits"))
    bench.select(col(benchIdCol)).distinct()
      .join(hits, Seq(benchIdCol), "left")
      .select(col(benchIdCol),
        coalesce(col("n_docs"), lit(0L)).as("n_docs"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"))
  }

  /** A Bloom filter over the benchmark's shingle hashes: `words` is the
    * packed bitmap, probes use Kirsch–Mitzenmacher double hashing over
    * the two 32-bit halves of the shingle hash (masked so the probe
    * arithmetic stays overflow-free under ANSI mode). */
  case class BloomIndex(words: Array[Long], m: Long, k: Int)

  /** Build the [[BloomIndex]] for [[decontaminateBloom]] — `bitsPerItem`
    * trades space for false-positive rate (16 bits/item ≈ 5e-4 per
    * probe set). Build once per benchmark suite, reuse across runs.
    *
    * The bitmap assembles EXECUTOR-side: probe positions fold into packed
    * 64-bit words through a map-side-combined `bit_or` aggregation, so the
    * driver collects at most m/64 longs — the bitmap itself (≤128 MiB at
    * the 2^30-bit cap, typically KBs) — never the k×n raw positions. */
  def benchmarkBloom(bench: DataFrame, benchTextCol: String,
                     shingleN: Int = 4, bitsPerItem: Int = 16): BloomIndex = {
    require(bitsPerItem >= 2 && bitsPerItem <= 64, s"bitsPerItem in [2,64], got $bitsPerItem")
    val hashes = bench.select(explode(graft.functions.VectorExprs.hashArray(
        shingles(col(benchTextCol), shingleN))).as("__h")).distinct()
    val n = math.max(1L, hashes.count())
    val m = math.min(1L << 30, math.max(64L, n * bitsPerItem))
    val k = math.max(1, math.round(bitsPerItem * 0.693).toInt)
    val h1 = col("__h").bitwiseAND(lit(0xffffffffL))
    val h2 = shiftrightunsigned(col("__h"), 32).bitwiseOR(lit(1L))
    // bit_or is idempotent, so no per-position distinct is needed — the
    // word-level aggregation dedups repeated positions for free.
    val wordRows = hashes.select(explode(transform(sequence(lit(0), lit(k - 1)), i =>
        pmod(h1 + i.cast("long") * h2, lit(m)))).as("__p"))
      .select(expr("cast(__p div 64 as int)").as("__w"),
        expr("shiftleft(1L, cast(__p % 64 as int))").as("__b"))
      .groupBy("__w").agg(expr("bit_or(__b)").as("__word"))
      .collect()
    val words = new Array[Long]((m / 64 + 1).toInt)
    wordRows.foreach(r => words(r.getInt(0)) = r.getLong(1))
    BloomIndex(words, m, k)
  }

  /** Space-bounded decontamination — the scale path when the benchmark's
    * exact distinct-shingle frame outgrows the broadcast budget of
    * [[decontaminate]]'s semi-join: the shingle set compresses to a Bloom
    * bitmap that ships to executors as a codegen reference object inside
    * the stage-broadcast task binary ([[graft.functions.BloomContains]] —
    * not a plan literal the optimizer re-traverses), and membership is
    * pure bit arithmetic inside codegen (no UDF, no join at all — the
    * corpus scan never shuffles until the per-doc count).
    * One-sided error: NO false negatives — every truly contaminated
    * document is flagged; false positives inflate the flagged set by
    * ~fpp per shingle, acceptable for a REMOVAL list, never a keep list.
    * Output: (idCol, hits) like the exact op; hits may over-count by
    * the same one-sided error. */
  /** The rows of `keep` whose document has at least one Bloom-positive
    * shingle, one row per positive shingle — the join-free membership
    * scan [[decontaminateBloom]] and the streaming twin share. */
  private[graft] def bloomHits(df: DataFrame, keep: Seq[String], textCol: String,
                               bloom: BloomIndex, shingleN: Int): DataFrame =
    df.select(keep.map(col) :+ explode(graft.functions.VectorExprs.hashArray(
        shingles(col(textCol), shingleN))).as("__h"): _*)
      .filter(graft.functions.VectorExprs.bloomContains(
        col("__h"), bloom.words, bloom.m, bloom.k))
      .select(keep.map(col): _*)

  def decontaminateBloom(corpus: DataFrame, idCol: String, textCol: String,
                         bloom: BloomIndex, shingleN: Int = 4,
                         minOverlap: Long = 1L): DataFrame =
    bloomHits(corpus, Seq(idCol), textCol, bloom, shingleN)
      .groupBy(col(idCol)).agg(count(lit(1)).as("hits"))
      .filter(col("hits") >= minOverlap)

  /** Cross-corpus near-dup pairs: (a_id from `newDf`, b_id from `ref`)
    * with shingle-Jaccard >= threshold — the incremental-ingest shape:
    * near-dup a new crawl against the existing training corpus without
    * re-pairing the old corpus against itself. Same banded-minhash
    * candidate generation and exact merge-scan verify as
    * [[nearDupMinhash]], but candidates only form ACROSS the two sides
    * (per bucket the join is |bucketA|×|bucketB|), and the
    * degenerate-bucket guard drops a bucket when EITHER side exceeds
    * `maxBucket`. At scale the reference side's band keys and hashed
    * shingle sets are loop-invariant across ingest runs —
    * [[buildMinhashIndex]]/[[saveMinhashIndex]]/[[loadMinhashIndex]]
    * persist exactly those two tables, and [[probeMinhashIndex]] (which
    * this one-shot form delegates to) signs only the new side per run. */
  def nearDupCross(newDf: DataFrame, newId: String, newText: String,
                   ref: DataFrame, refId: String, refText: String,
                   shingleN: Int = 3, numHashes: Int = 64, bands: Int = 32,
                   threshold: Double = 0.5, maxBucket: Long = 100000L): DataFrame = {
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val shB = ref.select(col(refId).as("__id"), shingles(col(refText), shingleN).as("__sh")).persist(lvl)
    try {
      val idx = indexFromShingles(shB, shingleN, numHashes, bands, threshold, maxBucket)
      idx.banded.persist(lvl); idx.shingleHashes.persist(lvl)
      // Warm the REFERENCE side's two caches on the side thread (guide
      // §2.6): the probe's own driver-synchronous chain (probe-side
      // signatures → histogram collect → candidate checkpoint) otherwise
      // pays the ref-side signature scan inside its histogram job and the
      // ref-side shingle hashing inside the verify join, serially. Both
      // sides' corpus scans are independent, so they back-fill each
      // other's stage tails. banded first — the histogram needs it
      // earlier than the verify needs the hashed sets.
      val warm = sideJob(shB.sparkSession.sparkContext) {
        idx.banded.count(); idx.shingleHashes.count()
      }
      try probeMinhashIndex(idx, newDf, newId, newText)
      finally {
        drainSide(warm)
        idx.banded.unpersist(false); idx.shingleHashes.unpersist(false)
      }
    } finally shB.unpersist(false)
  }

  /** A reusable MinHash band index over a reference corpus — the
    * loop-invariant half of [[nearDupCross]] for incremental ingest:
    * `banded` is the (b_id, band, band-hash) LSH key table, `shingleHashes`
    * the sorted distinct shingle-hash sets the exact Jaccard verify scans,
    * and the scalars the build parameters a probe must reuse (probing with
    * different shingle/band parameters would be comparing different
    * signatures). Build or [[loadMinhashIndex]] once per reference corpus;
    * [[probeMinhashIndex]] signs only the new side per run. */
  /** `bigBuckets` is the index side's precomputed degenerate-bucket list
    * (band buckets holding more than `maxBucket` reference docs): that
    * histogram is loop-invariant for a persisted index, so computing it at
    * build time saves one full groupBy over `banded` on EVERY probe. */
  case class MinhashIndex(banded: DataFrame, shingleHashes: DataFrame, bigBuckets: DataFrame,
                          shingleN: Int, numHashes: Int, bands: Int, threshold: Double,
                          maxBucket: Long)

  def buildMinhashIndex(ref: DataFrame, refId: String, refText: String,
                        shingleN: Int = 3, numHashes: Int = 64, bands: Int = 32,
                        threshold: Double = 0.5, maxBucket: Long = 100000L): MinhashIndex =
    indexFromShingles(
      ref.select(col(refId).as("__id"), shingles(col(refText), shingleN).as("__sh")),
      shingleN, numHashes, bands, threshold, maxBucket)

  private def indexFromShingles(sh: DataFrame, shingleN: Int, numHashes: Int,
                                bands: Int, threshold: Double, maxBucket: Long): MinhashIndex = {
    val banded = bandedKeys(minhashSignatures(sh, "__id", "__sh", numHashes),
      "__id", "__sig", "b_id", bands, numHashes / bands)
    val hashed = sh.select(col("__id").as("b_id"),
      sort_array(array_distinct(graft.functions.VectorExprs.hashArray(col("__sh")))).as("__shb"))
    val big = banded.groupBy("__band", "__bh").agg(count(lit(1)).as("__n"))
      .filter(col("__n") > maxBucket).select("__band", "__bh")
    MinhashIndex(banded, hashed, big, shingleN, numHashes, bands, threshold, maxBucket)
  }

  /** Persist the index as three parquet tables (band keys, shingle-hash
    * sets, one-row params) — the mirror of
    * [[graft.pipeline.Similarity.saveIvf]]: sign the reference corpus
    * once, probe every later crawl against the files. */
  def saveMinhashIndex(index: MinhashIndex, dir: String): Unit = {
    index.banded.write.mode("overwrite").parquet(s"$dir/banded")
    index.shingleHashes.write.mode("overwrite").parquet(s"$dir/shingles")
    index.bigBuckets.write.mode("overwrite").parquet(s"$dir/bigbuckets")
    val spark = index.banded.sparkSession
    import spark.implicits._
    Seq((index.shingleN, index.numHashes, index.bands, index.threshold, index.maxBucket))
      .toDF("shingleN", "numHashes", "bands", "threshold", "maxBucket")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/params")
  }

  def loadMinhashIndex(spark: org.apache.spark.sql.SparkSession, dir: String): MinhashIndex = {
    val p = spark.read.parquet(s"$dir/params").collect().head
    MinhashIndex(
      spark.read.parquet(s"$dir/banded"), spark.read.parquet(s"$dir/shingles"),
      spark.read.parquet(s"$dir/bigbuckets"),
      p.getAs[Int]("shingleN"), p.getAs[Int]("numHashes"),
      p.getAs[Int]("bands"), p.getAs[Double]("threshold"), p.getAs[Long]("maxBucket"))
  }

  /** Near-dup pairs (a_id from `newDf`, b_id from the index's corpus)
    * against a prebuilt [[MinhashIndex]] — candidates form only ACROSS
    * the two sides inside shared band buckets, with the same
    * degenerate-bucket drop+log guard as [[nearDupMinhash]] (applied per
    * side), then the exact merge-scan Jaccard verify at the index's
    * threshold. */
  def probeMinhashIndex(index: MinhashIndex, newDf: DataFrame,
                        newId: String, newText: String): DataFrame = {
    val maxBucket = index.maxBucket
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val shA = newDf.select(col(newId).as("__id"),
      shingles(col(newText), index.shingleN).as("__sh")).persist(lvl)
    try {
      val bA = bandedKeys(minhashSignatures(shA, "__id", "__sh", index.numHashes),
        "__id", "__sig", "a_id", index.bands, index.numHashes / index.bands).persist(lvl)
      // the probe side's hash+sort projection is independent of candidate
      // generation — materialize it on the side thread while the histogram
      // collect and the candidate checkpoint run (guide §2.6, the same
      // overlap as verifyOverlapped)
      val hashedA = shA.select(col("__id").as("a_id"),
        sort_array(array_distinct(graft.functions.VectorExprs.hashArray(col("__sh")))).as("__sha"))
        .persist(lvl)
      val side = sideJob(newDf.sparkSession.sparkContext)(hashedA.count())
      try {
        // the index side's degenerate buckets were precomputed at build
        // time (loop-invariant for a persisted index) — only the probe
        // side's histogram is computed per run
        def overfull(b: DataFrame) =
          b.groupBy("__band", "__bh").agg(count(lit(1)).as("__n"))
            .filter(col("__n") > maxBucket).select("__band", "__bh")
        val big = overfull(bA).union(index.bigBuckets).distinct()
        val bigRows = big.collect()
        if (bigRows.nonEmpty)
          org.apache.logging.log4j.LogManager.getLogger(getClass).warn(
            s"probeMinhashIndex: dropping ${bigRows.length} degenerate band buckets (> $maxBucket " +
            "docs on one side) — exact-dedup each corpus first")
        def kept(b: DataFrame) =
          if (bigRows.isEmpty) b
          else b.join(broadcast(big), Seq("__band", "__bh"), "left_anti")
        val cand = kept(bA).join(kept(index.banded), Seq("__band", "__bh"))
          .select("a_id", "b_id").distinct().localCheckpoint(true)
        scala.concurrent.Await.result(side, scala.concurrent.duration.Duration.Inf)
        cand.join(hashedA, "a_id")
          .join(index.shingleHashes, "b_id")
          .withColumn("__i", graft.functions.VectorExprs
            .sortedIntersectCount(col("__sha"), col("__shb")).cast("double"))
          .withColumn("jaccard", col("__i") / (size(col("__sha")) + size(col("__shb")) - col("__i")))
          .filter(col("jaccard") >= index.threshold)
          .select(col("a_id"), col("b_id"))
          .localCheckpoint(true)
      } finally {
        drainSide(side)
        hashedA.unpersist(false)
        bA.unpersist(false)
      }
    } finally shA.unpersist(false)
  }

  /** Cross-source shingle-overlap matrix: for every pair of corpus
    * sources (crawl snapshots, site buckets, dataset shards), the
    * distinct-shingle intersection size and Jaccard — the planning
    * signal for WHERE to spend cross-corpus dedup effort before running
    * it ("src3 is 40% src1; dedup them against each other first").
    * Output: (source_a, source_b, n_common, n_a, n_b, jaccard rounded
    * to 6) for source pairs (a < b) sharing at least one shingle.
    *
    * Scale shape: per-source distinct shingle sets (one hash-aggregate
    * on the 8-byte shingle hash), then a self-join on the shingle key
    * whose fan-out per shingle is bounded by the SOURCE count — sources
    * are few and large by definition, so the join output is ≤ |groups|²
    * rows per distinct shingle, and the matrix itself is tiny. */
  def sourceOverlap(df: DataFrame, textCol: String, groupCol: String,
                    shingleN: Int = 3): DataFrame = {
    val gs = df.select(col(groupCol).as("__g"),
        explode(graft.functions.VectorExprs.hashArray(
          shingles(col(textCol), shingleN))).as("__s"))
      .distinct()
    val sizes = gs.groupBy("__g").agg(count(lit(1)).as("__n"))
    // renamed projections instead of l/r aliases: the pair condition and
    // grouping then reference unambiguous column names
    val a = gs.select(col("__g").as("source_a"), col("__s"))
    val b = gs.select(col("__g").as("source_b"), col("__s"))
    val inter = a.join(b, Seq("__s"))
      .filter(col("source_a") < col("source_b"))
      .groupBy("source_a", "source_b")
      .agg(count(lit(1)).as("n_common"))
    inter
      .join(sizes.select(col("__g").as("source_a"), col("__n").as("n_a")), "source_a")
      .join(sizes.select(col("__g").as("source_b"), col("__n").as("n_b")), "source_b")
      .withColumn("jaccard", round(col("n_common").cast("double") /
        (col("n_a") + col("n_b") - col("n_common")), 6))
      // USING joins lead with their key — restore the documented order
      .select(col("source_a"), col("source_b"), col("n_common"),
        col("n_a"), col("n_b"), col("jaccard"))
  }

  /** Incremental EXACT dedup against a persisted reference corpus — the
    * identity-case mirror of the MinHash band index: sign the reference
    * once as a distinct set of normalized-text hashes (8 bytes/doc, no
    * text retained), then flag every later crawl's exact repeats with
    * one semi-join. The first gate of an incremental ingest pipeline:
    * cheap enough to run on every batch before the near-dup machinery.
    * Same xxhash64 identity argument as [[exact]] (~1e-15 collision
    * odds across a trillion-doc corpus pair). */
  def buildExactIndex(ref: DataFrame, refTextCol: String): DataFrame =
    ref.select(xxhash64(normalize(col(refTextCol))).as("__h")).distinct()

  def saveExactIndex(index: DataFrame, dir: String): Unit =
    index.write.mode("overwrite").parquet(dir)

  def loadExactIndex(spark: org.apache.spark.sql.SparkSession, dir: String): DataFrame =
    spark.read.parquet(dir)

  /** Rows of `newDf` whose normalized text already occurs in the
    * reference index. Output: (idCol) of the exact repeats — anti-join
    * the result to keep only novel documents.
    *
    * Scale shape: one narrow semi-join on an 8-byte key; the index side
    * is pre-distinct so stats-driven broadcast applies while it fits,
    * and past that it is a plain hash join — the probe side never
    * carries text through the shuffle. */
  def probeExactIndex(index: DataFrame, newDf: DataFrame,
                      idCol: String, textCol: String): DataFrame =
    newDf.select(col(idCol), xxhash64(normalize(col(textCol))).as("__h"))
      .join(index, Seq("__h"), "left_semi")
      .select(col(idCol))

  /** Boilerplate detection: word n-gram passages appearing in at least
    * `minDf` distinct documents, with their document frequency — the
    * corpus-health report behind the n-gram index's df-cap (headers,
    * license blocks, templated navigation all surface here). Output:
    * (shingle, n_docs), the passage TEXT kept for inspectability.
    *
    * Scale shape: explode + one hash-shuffle keyed by the shingle string
    * with map-side partial counts; the `>= minDf` filter cuts the result
    * to the (tiny) over-represented tail. Shingles are distinct per
    * document, so the count is a true document frequency. */
  def commonShingles(df: DataFrame, idCol: String, textCol: String,
                     shingleN: Int = 3, minDf: Long = 5L): DataFrame =
    df.select(explode(shingles(col(textCol), shingleN)).as("shingle"))
      .groupBy("shingle")
      .agg(count(lit(1)).as("n_docs"))
      .filter(col("n_docs") >= minDf)

  /** Passage-level exact dedup — the CCNet/RefinedWeb "repeated lines
    * removal" recipe instantiated for unstructured text: split each
    * document into contiguous k-token passages of the normalized text,
    * drop every passage whose exact text occurs in more than `maxDf`
    * DISTINCT documents, and reassemble the survivors in order. Documents
    * reduced to nothing come back as empty strings — row count is
    * preserved so a downstream length filter makes the drop decision.
    * (p29/[[commonShingles]] only REPORTS boilerplate; this op rewrites
    * the corpus. The reference has no corpus-rewrite op.)
    *
    * Scale shape: passage building is one `posexplode` per document — no
    * shuffle; the document-frequency aggregate shuffles once on the
    * passage text; the flagged set (df > maxDf) is small by construction,
    * so removal is a BROADCAST anti-join; reassembly shuffles once on the
    * doc id and the final id join reuses that partitioning. Two narrow
    * shuffles + one broadcast, nothing quadratic. */
  /** The contiguous k-token passages of the normalized text, in order —
    * the decomposition [[dedupPassages]] and the streaming scrub share. */
  private[graft] def passageArray(text: Column, k: Int): Column = {
    require(k >= 1, s"passage size must be >= 1, got $k")
    val w = split(normalize(text), " ")
    val nP = greatest(lit(1), ceil(size(w).cast("double") / k).cast("int"))
    transform(sequence(lit(0), nP - 1), c => concat_ws(" ", slice(w, c * k + 1, lit(k))))
  }

  /** The boilerplate set: passages occurring in more than `maxDf` distinct
    * documents. One column (`__p`); the thing a streaming scrub indexes. */
  def commonPassages(df: DataFrame, idCol: String, textCol: String,
                     k: Int = 8, maxDf: Long = 1L): DataFrame =
    df.select(col(idCol).as("__id"), explode(passageArray(col(textCol), k)).as("__p"))
      .groupBy("__p")
      .agg(countDistinct("__id").as("__df"))
      .filter(col("__df") > maxDf)
      .select("__p")

  def dedupPassages(df: DataFrame, idCol: String, textCol: String,
                    k: Int = 8, maxDf: Long = 1L): DataFrame = {
    val pass = df.select(col(idCol).as("__id"),
        posexplode(passageArray(col(textCol), k)))
      .select(col("__id"), col("pos").as("__c"), col("col").as("__p"))
    val common = pass.groupBy("__p")
      .agg(countDistinct("__id").as("__df"))
      .filter(col("__df") > maxDf)
      .select("__p")
    // reassemble: passages are few per doc, so the interpreted transform
    // lambda runs once per document, not once per corpus token
    val rebuilt = pass.join(broadcast(common), Seq("__p"), "left_anti")
      .groupBy("__id")
      .agg(array_join(transform(array_sort(collect_list(struct(col("__c"), col("__p")))),
        s => s.getField("__p")), " ").as("__text"))
    df.select(col(idCol))
      .join(rebuilt, col(idCol) === col("__id"), "left")
      .select(col(idCol), coalesce(col("__text"), lit("")).as(textCol))
  }

  /** Exact repeated-SPAN scrub — the ExactSubstr recipe (Lee et al. 2021,
    * "Deduplicating Training Data Makes Language Models Better") as a
    * distributed plan: remove from every document every maximal token
    * span of length >= `k` whose k-token window also appears in at least
    * `minDocs` distinct documents. Unlike [[dedupPassages]] (fixed
    * non-overlapping chunks), windows here start at EVERY token position,
    * so repeated material is caught at arbitrary alignment — the paper's
    * semantics, minus its single-node suffix array.
    *
    * Scale shape: suffix arrays don't distribute; overlapping k-windows
    * do. One posexplode builds the windows (×k characters, same class as
    * the minhash shingle explode), document frequency is one hash
    * shuffle on the window text, islands-and-gaps span merging is a
    * per-document window over repeated start positions (shuffles on the
    * doc id, which the coverage anti-join and reassembly then reuse).
    * Everything is linear in corpus size; nothing is pairwise. */
  def scrubRepeatedSpans(df: DataFrame, idCol: String, textCol: String,
                         k: Int = 50, minDocs: Long = 2L): DataFrame = {
    require(k >= 1, s"span window must be >= 1 token, got $k")
    import org.apache.spark.sql.expressions.Window
    val toks = df.select(col(idCol).as("__id"), split(normalize(col(textCol)), " ").as("__ws"))
    // overlapping k-token windows with their start positions (docs shorter
    // than k contribute no windows and keep all tokens)
    val starts = toks.filter(size(col("__ws")) >= k)
      .select(col("__id"), posexplode(expr(
        s"transform(sequence(0, size(__ws) - $k), i -> concat_ws(' ', slice(__ws, i + 1, $k)))")))
      .select(col("__id"), col("pos").as("__p"), col("col").as("__sh"))
    val repeated = starts.groupBy("__sh")
      .agg(countDistinct("__id").as("__df"))
      .filter(col("__df") >= minDocs)
      .select("__sh")
    val repStarts = starts.join(repeated, Seq("__sh")).select("__id", "__p")
    // islands-and-gaps: starts closer than k merge into one maximal span
    val w = Window.partitionBy("__id").orderBy("__p")
    val spans = repStarts
      .withColumn("__prev", lag(col("__p"), 1).over(w))
      .withColumn("__ni", when(col("__prev").isNull || col("__p") - col("__prev") > k, 1).otherwise(0))
      .withColumn("__iid", sum(col("__ni")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("__id", "__iid")
      .agg(min("__p").as("__s"), (max(col("__p")) + lit(k - 1)).as("__e"))
    val covered = spans.select(col("__id"), explode(sequence(col("__s"), col("__e"))).as("__p"))
    val words = toks.select(col("__id"), posexplode(col("__ws")))
      .select(col("__id"), col("pos").as("__p"), col("col").as("__w"))
    val rebuilt = words.join(covered, Seq("__id", "__p"), "left_anti")
      .groupBy("__id")
      .agg(array_join(transform(array_sort(collect_list(struct(col("__p"), col("__w")))),
        s => s.getField("__w")), " ").as("__text"))
    df.select(col(idCol))
      .join(rebuilt, col(idCol) === col("__id"), "left")
      .select(col(idCol), coalesce(col("__text"), lit("")).as(textCol))
  }
}
