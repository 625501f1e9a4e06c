package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (array<float>).
  *
  * `bruteTopK` is the exact baseline: broadcast the (small) query set
  * against the corpus — one pass, no shuffle of the corpus, window top-k.
  * `annLsh` is the scale path: random-hyperplane LSH buckets both sides so
  * each query only scores its bucket — candidate volume drops ~2^bits×
  * while recall stays high for near neighbors (own spec measures it).
  */
object Similarity {
  /** Sum via fold — deterministic left-to-right accumulation. */
  private def fsum(arr: Column): Column = aggregate(arr, lit(0.0d), (acc, x) => acc + x)

  private def toDouble(v: Column): Column = transform(v, x => x.cast("double"))

  /** Native loop-codegen dot product ([[graft.functions.VectorExprs]]) —
    * same left-to-right double accumulation as the higher-order fold it
    * replaced, ~100x cheaper per pair in join conditions. */
  def dot(a: Column, b: Column): Column = graft.functions.VectorExprs.dotProduct(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Exact top-k cosine neighbors for each query vector.
    * queries: (qid, qvec) — expected small; Spark broadcasts it (hinted).
    * corpus:  (id, vec). Self-matches (qid == id) are excluded.
    * Output: (query_id, neighbor_id, rank) with rank 1..k ordered by
    * similarity desc, neighbor id asc as the deterministic tie-break. */
  def bruteTopK(corpus: DataFrame, idCol: String, vecCol: String,
                queries: DataFrame, qidCol: String, qvecCol: String, k: Int): DataFrame = {
    val c = corpus.select(col(idCol).as("neighbor_id"), toDouble(col(vecCol)).as("__v"))
    val q = broadcast(queries.select(col(qidCol).as("query_id"), toDouble(col(qvecCol)).as("__q")))
    val scored = c.crossJoin(q)
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("__sim", cosine(col("__q"), col("__v")))
    scored.withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("query_id"))
          .orderBy(col("__sim").desc, col("neighbor_id").asc)))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank").cast("long").as("rank"))
  }

  /** Deterministic pseudo-random hyperplane matrix (bits × dim). */
  private def hyperplanes(bits: Int, dim: Int, seed: Long): Array[Array[Double]] = {
    var s = seed
    def next(): Double = { s = s * 6364136223846793005L + 1442695040888963407L; ((s >>> 11).toDouble / (1L << 53).toDouble) * 2 - 1 }
    Array.fill(bits)(Array.fill(dim)(next()))
  }

  /** Random-hyperplane LSH bucket id (int of `bits` sign bits). The raw
    * vector feeds graft_dot directly (it casts per element), so the
    * array-level double cast isn't re-materialized once per bit. */
  def lshBucket(vec: Column, bits: Int, dim: Int, seed: Long = 42L): Column = {
    val planes = hyperplanes(bits, dim, seed)
    (0 until bits).map { i =>
      when(dot(vec, typedLit(planes(i))) >= 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)
  }

  /** IVF (inverted-file) approximate top-k: a KMeans coarse quantizer
    * buckets the corpus once; each query probes its `nprobe` nearest
    * centroids and scores only those buckets. The scale path when corpus
    * >> queries: the corpus shuffles once at build, probing is an equi-join
    * on the centroid id. */
  /** A built IVF index: the bucket-assigned corpus and the (tiny)
    * centroid table — both plain DataFrames, so the index persists as
    * two parquet directories and a probe run never refits KMeans. */
  case class IvfIndex(assigned: DataFrame, centroids: DataFrame)

  /** Fit the coarse quantizer and assign every corpus vector to its cell
    * — the expensive, corpus-sized half of IVF, done once per corpus
    * version and reused across every probe batch ([[saveIvf]]/
    * [[loadIvf]] round-trip it through parquet). */
  def buildIvf(corpus: DataFrame, idCol: String, vecCol: String,
               nlist: Int = 16, seed: Long = 42L): IvfIndex = {
    val c = corpus.select(col(idCol).as("neighbor_id"), toDouble(col(vecCol)).as("__v"))
    // Sample-trained coarse quantizer (the production IVF shape — Faiss
    // trains quantizers on a bounded sample and assigns the full corpus
    // in one scan): a deterministic hash-thresholded sample collects to
    // the driver (the whole corpus when it is under the cap), Lloyd's
    // iterations run locally over kilobyte-scale state, and only the
    // ASSIGNMENT touches the corpus — as a pure argmin expression over
    // centroid literals, no fit jobs at all. The previous MLlib KMeans
    // fit ran ~a dozen driver-synchronous jobs whose fixed latency
    // dominated every IVF entry at bench scale and bought nothing:
    // IVF recall depends on nprobe covering the query's neighborhood,
    // not on near-optimal centroids (the planted-probe constructions
    // and the clustered-recall spec hold for any reasonable fit).
    // Deterministic: hash-thresholded sample, farthest-point init with
    // lexicographic tie-breaks, fixed iteration count.
    val cap = 1L << 16
    val n = math.max(1L, c.count())
    val p = math.min(997L, math.max(1L, 997L * cap / n))
    val sample = c.filter(
        pmod(abs(xxhash64(col("__v"), lit(seed))), lit(997L)) < lit(p) || lit(n <= cap))
      .select(col("__v")).collect().map(_.getSeq[Double](0).toArray)
    require(sample.nonEmpty, "IVF init sample is empty")
    // farthest-point init (deterministic k-means++ flavor): start from
    // the lexicographically-least vector, then greedily add the sample
    // point farthest from its nearest chosen centroid (ties lexicographic)
    implicit val ord: Ordering[Seq[Double]] = Ordering.Implicits.seqOrdering
    def sq(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length && i < b.length) { val d = a(i) - b(i); s += d * d; i += 1 }
      s
    }
    val distinct = sample.map(_.toSeq).distinct.sorted.map(_.toArray)
    val chosen = scala.collection.mutable.ArrayBuffer(distinct.head)
    val nearest = Array.fill(distinct.length)(Double.MaxValue)
    while (chosen.length < math.min(nlist, distinct.length)) {
      var i = 0
      while (i < distinct.length) {
        val d = sq(distinct(i), chosen.last)
        if (d < nearest(i)) nearest(i) = d
        i += 1
      }
      val far = distinct.indices.minBy(i => (-nearest(i), distinct(i).toSeq))(
        Ordering.Tuple2(Ordering.Double.TotalOrdering, ord))
      chosen += distinct(far)
    }
    // pad to nlist with the first centroid: assignment ties break to the
    // lower bucket id, so padded cells stay empty and probe order is
    // stable
    var cents = (chosen ++ Seq.fill(nlist - chosen.length)(chosen.head)).toArray
    // local Lloyd over the sample: assign (tie -> lower index), mean
    // update, empty cluster keeps its centroid — the same rules the
    // distributed fit used
    val iters = 10
    var it = 0
    while (it < iters) {
      val k = cents.length
      val dim0 = sample.head.length
      val sums = Array.fill(k)(new Array[Double](dim0))
      val cnts = new Array[Long](k)
      for (pt <- sample) {
        var best = 0; var bd = Double.MaxValue; var ci = 0
        while (ci < k) {
          val d = sq(pt, cents(ci)); if (d < bd) { bd = d; best = ci }; ci += 1
        }
        cnts(best) += 1
        var i = 0; while (i < dim0) { sums(best)(i) += pt(i); i += 1 }
      }
      cents = Array.tabulate(k)(ci =>
        if (cnts(ci) == 0) cents(ci) else sums(ci).map(_ / cnts(ci)))
      it += 1
    }
    // assignment: one scan, argmin over centroid literals (ties -> lower
    // bucket via the (dist, bucket) struct order), no shuffle
    val dists = cents.zipWithIndex.map { case (ct, i) =>
      struct(fsum(zip_with(col("__v"), typedLit(ct.toSeq), (a, b) => (a - b) * (a - b))).as("d"),
        lit(i).as("c"))
    }
    val assigned = c.withColumn("__bucket", least(dists.toSeq: _*).getField("c"))
      .select(col("neighbor_id"), col("__v"), col("__bucket"))
    IvfIndex(assigned,
      corpus.sparkSession.createDataFrame(
        cents.zipWithIndex.map { case (v, i) => (i, v.toSeq) }.toSeq)
        .toDF("__bucket", "__cent"))
  }

  def saveIvf(index: IvfIndex, dir: String): Unit = {
    index.assigned.write.mode("overwrite").parquet(s"$dir/assigned")
    index.centroids.write.mode("overwrite").parquet(s"$dir/centroids")
  }

  def loadIvf(spark: org.apache.spark.sql.SparkSession, dir: String): IvfIndex =
    IvfIndex(spark.read.parquet(s"$dir/assigned"), spark.read.parquet(s"$dir/centroids"))

  /** Probe a built index: nprobe nearest cells per query, exact cosine
    * rerank inside them. The probe side is the only per-batch work. */
  def probeIvf(index: IvfIndex, queries: DataFrame, qidCol: String, qvecCol: String,
               k: Int, nprobe: Int = 4): DataFrame = {
    val assigned = index.assigned
    // nprobe nearest centroids per query (centroid table is tiny: broadcast)
    val centDf = broadcast(index.centroids)
    val q = queries.select(col(qidCol).as("query_id"), toDouble(col(qvecCol)).as("__q"))
    val probes = q.crossJoin(centDf)
      .withColumn("__dist", fsum(zip_with(col("__q"), col("__cent"), (a, b) => (a - b) * (a - b))))
      .withColumn("__pr", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("query_id"))
          .orderBy(col("__dist").asc, col("__bucket").asc)))
      .filter(col("__pr") <= nprobe)
      .select(col("query_id"), col("__q"), col("__bucket"))
    val scored = assigned.join(probes, "__bucket")
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("__sim", cosine(col("__q"), col("__v")))
    scored.withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("query_id"))
          .orderBy(col("__sim").desc, col("neighbor_id").asc)))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank").cast("long").as("rank"))
  }

  /** One-shot IVF ANN: build + probe in a single call (the per-query
    * driver entry); long-lived systems call [[buildIvf]] once and
    * [[probeIvf]] per batch instead. */
  def annIvf(corpus: DataFrame, idCol: String, vecCol: String,
             queries: DataFrame, qidCol: String, qvecCol: String,
             k: Int, nlist: Int = 16, nprobe: Int = 4, seed: Long = 42L): DataFrame =
    probeIvf(buildIvf(corpus, idCol, vecCol, nlist, seed),
      queries, qidCol, qvecCol, k, nprobe)

  /** SemDeDup-style semantic deduplication (Abbas et al. 2023,
    * arXiv:2303.09540): KMeans-cluster the embedding corpus, form pairs
    * only WITHIN a cluster, verify exact cosine ≥ tau, and keep one
    * representative per near-dup component (the min id — the paper keeps
    * an arbitrary member; min-id makes the choice deterministic and
    * SQL-mirrorable). Returns the surviving corpus rows.
    *
    * Scale shape: the clustering is the same coarse quantizer as
    * [[buildIvf]] (fit once, assignments shuffle the corpus once on the
    * cell id); candidate pairs never leave a cell, so pair volume is
    * Σ |cell|² rather than |corpus|² — the paper's exact trick. Systems
    * deduping a growing corpus should build the index once
    * ([[buildIvf]]/[[saveIvf]]) and pass it here per batch. */
  /** Per-label centroid outliers: each vector's cosine to its OWN label's
    * centroid (per-dimension mean), flagged when the (rounded) cosine
    * falls below `tau` — the embedding-space mislabeled/noise pruning
    * step of a curated training set (the centroid-distance filter of the
    * SemDeDup/CLIP-filtering family, aimed at labels instead of
    * duplicates). Output: (id, label, cos_centroid rounded to 4, outlier).
    *
    * Scale shape: centroids come from ONE posexplode + (label, dim)
    * hash-aggregate — dims × rows narrow rows with map-side partial
    * means, no per-label collect. The centroid table is |labels| × dim
    * and broadcast back, so scoring is a map-only pass over the corpus.
    * The flag compares the ROUNDED cosine so an engine-replay (oracle,
    * backfill) can reproduce it bit-for-bit. */
  def centroidOutliers(df: DataFrame, idCol: String, vecCol: String,
                       labelCol: String, tau: Double = 0.0): DataFrame = {
    val v = df.select(col(idCol), col(labelCol), toDouble(col(vecCol)).as("__v"))
    val cents = v.select(col(labelCol), posexplode(col("__v")).as(Seq("__i", "__x")))
      .groupBy(col(labelCol), col("__i")).agg(avg("__x").as("__m"))
      .groupBy(col(labelCol))
      .agg(transform(array_sort(collect_list(struct(col("__i"), col("__m")))),
        s => s.getField("__m")).as("__c"))
    v.join(broadcast(cents), Seq(labelCol))
      .select(col(idCol), col(labelCol),
        round(dot(col("__v"), col("__c")) / (norm(col("__v")) * norm(col("__c"))), 4)
          .as("cos_centroid"))
      .withColumn("outlier", col("cos_centroid") < tau)
  }

  def semanticDedup(corpus: DataFrame, idCol: String, vecCol: String,
                    tau: Double, nlist: Int = 16, seed: Long = 42L,
                    prebuilt: Option[IvfIndex] = None): DataFrame = {
    val idx = prebuilt.getOrElse(buildIvf(corpus, idCol, vecCol, nlist, seed))
    val withNorm = idx.assigned.withColumn("__n", norm(col("__v")))
      .filter(col("__n") > 0)
    val l = withNorm.select(col("__bucket"), col("neighbor_id").as("a_id"),
      col("__v").as("__va"), col("__n").as("__na"))
    val r = withNorm.select(col("__bucket"), col("neighbor_id").as("b_id"),
      col("__v").as("__vb"), col("__n").as("__nb"))
    val pairs = l.join(r, "__bucket")
      .filter(col("a_id") < col("b_id") &&
        dot(col("__va"), col("__vb")) >= lit(tau) * col("__na") * col("__nb"))
      .select(col("a_id"), col("b_id"))
    graft.pipeline.Dedup.survivors(corpus, idCol, pairs)
  }

  /** Embedding-cosine near-dup pairs: (a_id, b_id) with a < b and
    * cosine(va, vb) >= tau — the embedding-space sibling of the text
    * dedup family in [[graft.pipeline.Dedup]].
    *
    * This exact form is an upper-triangle nested-loop join and therefore
    * INHERENTLY quadratic in corpus size — right for corpora up to ~10⁵
    * vectors per partition-block and for oracle parity; at 100 TB compose
    * the IVF/LSH candidate machinery above instead (bucket the corpus
    * once, pair only within cells, verify exactly — same recall/cost
    * split as simhash vs exact n-gram in Dedup). Vectors are normalized
    * ONCE before the join so the pair predicate is a bare dot product. */
  def nearDupEmbed(corpus: DataFrame, idCol: String, vecCol: String, tau: Double): DataFrame = {
    // norms precomputed per row; the pair test is dot >= tau*|a|*|b|
    // (equivalent to cosine >= tau for nonzero norms, no per-pair
    // division); zero-norm vectors have undefined cosine and are dropped,
    // matching NaN-cosine exclusion. The dot is the native loop-codegen
    // expression — see VectorExprs for why neither a higher-order fold
    // (interpreted) nor an unrolled element_at sum (too big to JIT) can
    // sit in a 12.5M-pair join condition.
    // materialize the normed vectors ONCE: both join sides read this
    // frame, and when it arrives as a lazy plan (e.g. p45's hashed-TFIDF
    // aggregation pipeline) the optimizer would otherwise duplicate the
    // whole upstream subtree into each side AND lose its size estimate —
    // the planner then falls back to CartesianProduct, which runs outside
    // whole-stage codegen (measured 55 CPU-s for 12.5M pairs vs the
    // codegen'd nested-loop's ~4). The quadratic exact form is documented
    // for corpora up to ~1e5 vectors, so the checkpointed frame is
    // megabytes and the bench sweep releases it per query.
    val spark = corpus.sparkSession
    val beforeIds = spark.sparkContext.getPersistentRDDs.keySet
    val withNorm = corpus.select(col(idCol).as("__id"), col(vecCol).as("__v"))
      .withColumn("__n", norm(col("__v")))
      .filter(col("__n") > 0)
      .localCheckpoint(true)
    // broadcast-size guard: the ~1e5-vector bound above is documentation,
    // not enforcement, and at that bound with wide embeddings the build
    // side is hundreds of MB — enough to OOM the driver that collects it.
    // The checkpoint blocks' actual byte size is already known (the frame
    // just materialized), so the bound self-enforces: under
    // `graft.embed.broadcastBytes` (default 512 MB, well inside the 8 GB
    // broadcast cap) the build side broadcasts; above it the join runs as
    // the partitioned nested loop over the SAME checkpointed frame — no
    // re-derived subtree, no duplicated upstream pipeline on either path.
    val ckptIds = spark.sparkContext.getPersistentRDDs.keySet -- beforeIds
    val ckptBytes = spark.sparkContext.getRDDStorageInfo
      .filter(i => ckptIds.contains(i.id)).map(i => i.memSize + i.diskSize).sum
    val guardBytes = spark.conf.getOption("graft.embed.broadcastBytes")
      .flatMap(s => scala.util.Try(s.toLong).toOption).getOrElse(512L << 20)
    // the nested-loop stream side inherits the scan's partitioning — a
    // single local file means ONE task; spread it when the source has
    // fewer splits than cores (at scale the scan is already wide and this
    // is a no-op — never coalesce a big corpus here)
    val want = spark.sparkContext.defaultParallelism
    val spread = if (withNorm.rdd.getNumPartitions < want) withNorm.repartition(want) else withNorm
    val a = spread.select(col("__id").as("a_id"), col("__v").as("__va"), col("__n").as("__na"))
    val b = withNorm.select(col("__id").as("b_id"), col("__v").as("__vb"), col("__n").as("__nb"))
    // cheap ordered-pair test FIRST so the dot short-circuits on the
    // lower triangle (condition conjunct order is preserved into the
    // nested-loop join); the build side is explicitly broadcast — while
    // the guard allows — so the pair join is a codegen'd
    // BroadcastNestedLoopJoin, never a CartesianProduct of re-derived
    // subtrees (right-sized by the same ~1e5-vector bound). Above the
    // guard the opposite hint is just as explicit: SHUFFLE_REPLICATE_NL
    // forces the partitioned nested loop over the same checkpointed
    // leaves — merely OMITTING the broadcast hint is not enough, because
    // the planner's own size estimate can still pick a driver-collected
    // broadcast for a frame the guard has already measured as over-budget
    val build = if (ckptBytes <= guardBytes) broadcast(b)
                else b.hint("shuffle_replicate_nl")
    a.join(build, col("a_id") < col("b_id") &&
        dot(col("__va"), col("__vb")) >= lit(tau) * col("__na") * col("__nb"))
      .select(col("a_id"), col("b_id"))
  }

  /** Embedding near-dup pairs at scale: multi-table random-hyperplane LSH
    * buckets the corpus, pairs form only WITHIN a bucket (per table),
    * then exact cosine verification — the embedding-space analogue of
    * [[graft.pipeline.Dedup.nearDupMinhash]]'s candidates+verify split,
    * and the scale path [[nearDupEmbed]]'s scaladoc promises: shuffle
    * volume is corpus × tables, never all-pairs. A pair at angle θ
    * collides in one table with p = (1 − θ/π)^bits and is missed by all
    * L tables with (1−p)^L — for near-dup-grade pairs (θ ≈ 0.02 rad,
    * bits=8, L=4) the miss rate is ~6e-6, and the fixed-seed hyperplanes
    * make any given corpus's outcome deterministic. */
  def nearDupEmbedANN(corpus: DataFrame, idCol: String, vecCol: String,
                      tau: Double, bits: Int = 8, dim: Int = 64,
                      tables: Int = 4, seed: Long = 42L): DataFrame = {
    val withNorm = corpus.select(col(idCol).as("__id"), toDouble(col(vecCol)).as("__v"))
      .withColumn("__n", norm(col("__v")))
      .filter(col("__n") > 0)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val cand = (0 until tables).map { t =>
        val bucketed = withNorm.select(col("__id"),
          lshBucket(col("__v"), bits, dim, seed + t).as("__b"))
        val l = bucketed.alias("l"); val r = bucketed.alias("r")
        l.join(r, col("l.__b") === col("r.__b") && col("l.__id") < col("r.__id"))
          .select(col("l.__id").as("a_id"), col("r.__id").as("b_id"))
      }.reduce(_ unionByName _).distinct()
      val va = withNorm.select(col("__id").as("a_id"), col("__v").as("__va"), col("__n").as("__na"))
      val vb = withNorm.select(col("__id").as("b_id"), col("__v").as("__vb"), col("__n").as("__nb"))
      cand.join(va, "a_id").join(vb, "b_id")
        .filter(dot(col("__va"), col("__vb")) >= lit(tau) * col("__na") * col("__nb"))
        .select(col("a_id"), col("b_id"))
        .localCheckpoint(true)
    } finally withNorm.unpersist(false)
  }

  /** Approximate top-k via multi-table random-hyperplane LSH (the classic
    * E2LSH shape): candidates share the query's bucket in ANY of `tables`
    * independent hyperplane tables. A pair at angle θ collides in one
    * table with p = (1 - θ/π)^bits; L tables drive the miss rate to
    * (1-p)^L. Everything is equi-joins on bucket ids — candidate dedup on
    * id pairs, then ONE vector join to score — never a cartesian; the
    * query side is assumed small and broadcast. Own spec measures recall
    * vs bruteTopK on clustered vectors. */
  def annLsh(corpus: DataFrame, idCol: String, vecCol: String,
             queries: DataFrame, qidCol: String, qvecCol: String,
             k: Int, bits: Int = 8, dim: Int = 64, tables: Int = 4,
             seed: Long = 42L): DataFrame = {
    val c = corpus.select(col(idCol).as("neighbor_id"), toDouble(col(vecCol)).as("__v"))
    val q = queries.select(col(qidCol).as("query_id"), toDouble(col(qvecCol)).as("__q"))
    val cand = (0 until tables).map { t =>
      val s = seed + 1000003L * t
      val cb = c.select(col("neighbor_id"), lshBucket(col("__v"), bits, dim, s).as("__b"))
      val qb = broadcast(q.select(col("query_id"), lshBucket(col("__q"), bits, dim, s).as("__b")))
      cb.join(qb, "__b").select(col("query_id"), col("neighbor_id"))
    }.reduce(_ unionByName _).distinct()
      .filter(col("query_id") =!= col("neighbor_id"))
    val scored = cand.join(c, "neighbor_id").join(broadcast(q), "query_id")
      .withColumn("__sim", cosine(col("__q"), col("__v")))
    scored.withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("query_id"))
          .orderBy(col("__sim").desc, col("neighbor_id").asc)))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank").cast("long").as("rank"))
  }

  /** Product-quantization codebooks: `m` per-subspace KMeans models over
    * dim/m-wide vector slices (Jégou et al. 2011). cents(sub)(code) is
    * the dsub-dim centroid; the whole codebook is m·ksub·dsub doubles —
    * kilobytes — so it travels as expression literals, never a join. */
  case class PqCodebook(cents: Array[Array[Array[Double]]], dim: Int) {
    def m: Int = cents.length
    def ksub: Int = cents(0).length
    def dsub: Int = dim / m
  }

  /** Fit the PQ codebook: Lloyd's iterations over ALL m subspaces at
    * once — each iteration is ONE job over the cached vector frame using
    * the same per-subspace argmin expressions as [[encodePq]] (flat
    * small literals, whole plan reused), re-centering via an
    * explode→avg aggregate whose output (m·ksub·dsub doubles,
    * kilobytes) collects to the driver and rides back as next
    * iteration's literals. One Spark job per iteration instead of a
    * full MLlib KMeans run per subspace (m fits measured ~7 s of
    * scheduler overhead; a long-format variant with one shared nested
    * codebook literal measured ~4 s/iteration in optimizer time — flat
    * per-centroid literals are the fast shape). Deterministic: init
    * picks ksub lexicographically-least distinct slices per subspace
    * from a hash-thresholded sample; a codebook's job is coverage, not
    * optimality (same rationale as [[buildIvf]]'s random init — recall
    * comes from the shortlist+rerank, not perfect centroids). At
    * 100 TB, fit on a sampled corpus and [[encodePq]] everything in one
    * scan. */
  def buildPqCodebook(corpus: DataFrame, vecCol: String, dim: Int,
                      m: Int = 4, ksub: Int = 16, seed: Long = 42L,
                      iters: Int = 3): PqCodebook = {
    require(dim % m == 0, s"dim $dim must divide into m=$m subspaces")
    val dsub = dim / m
    val baseV = corpus.select(toDouble(col(vecCol)).as("__v"))
    val n = math.max(1L, baseV.count())
    // Sample-trained fit, entirely on the driver (the production PQ
    // shape — Faiss trains codebooks on a bounded sample): one
    // hash-thresholded collect (the whole corpus when under the cap),
    // then Lloyd's iterations over driver arrays. The previous
    // distributed fit ran one explode→aggregate→collect job per
    // iteration whose planning latency (m·ksub HOF distance trees
    // re-optimized per round) dominated the entry at bench scale; the
    // codebook is kilobytes either way, and its job is coverage, not
    // optimality (recall comes from the shortlist+rerank). Deterministic:
    // fixed sample threshold, lexicographic init, fixed tie-breaks.
    val cap = 1L << 16
    val p = math.min(997L, math.max(1L, 997L * cap / n))
    val sample = baseV.filter(
        pmod(abs(xxhash64(col("__v"), lit(seed))), lit(997L)) < lit(p) ||
          lit(n <= cap))
      .collect().map(_.getSeq[Double](0).toArray)
    require(sample.nonEmpty, "PQ init sample is empty")
    var cents: Array[Array[Array[Double]]] = Array.tabulate(m) { j =>
      sample.map(v => v.slice(j * dsub, (j + 1) * dsub).toSeq).distinct
        .sortBy(_.mkString(","))
        .take(ksub).map(_.toArray)
    }
    // pad short subspaces (tiny/dup-heavy corpora) to a UNIFORM code
    // count by repeating the first centroid — a duplicate can only tie,
    // and ties break to the lower code, so assignments are unchanged
    val ks = cents.map(_.length).max
    cents = cents.map(a => a ++ Array.fill(ks - a.length)(a(0)))
    def sq(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length && i < b.length) { val d = a(i) - b(i); s += d * d; i += 1 }
      s
    }
    var it = 0
    while (it < iters) {
      // per subspace: assign each sample slice to its argmin centroid
      // (ties -> lower code, matching encodePq's least-of-structs), mean
      // update, empty cluster keeps its centroid
      cents = Array.tabulate(m) { j =>
        val k = cents(j).length
        val sums = Array.fill(k)(new Array[Double](dsub))
        val cnts = new Array[Long](k)
        for (v <- sample) {
          val sl = v.slice(j * dsub, (j + 1) * dsub)
          var best = 0; var bd = Double.MaxValue; var c = 0
          while (c < k) { val d = sq(sl, cents(j)(c)); if (d < bd) { bd = d; best = c }; c += 1 }
          cnts(best) += 1
          var i = 0; while (i < dsub) { sums(best)(i) += sl(i); i += 1 }
        }
        Array.tabulate(k)(c => if (cnts(c) == 0) cents(j)(c) else sums(c).map(_ / cnts(c)))
      }
      it += 1
    }
    PqCodebook(cents, dim)
  }

  /** Per-subspace squared distances of a vector slice to every centroid
    * of that subspace's codebook — the shared kernel of encode (argmin)
    * and ADC (lookup-table build). The zip_with+aggregate fold runs
    * interpreted (HOFs get no codegen) but keeps the expression tree
    * SMALL — an unrolled (vec[i] − literal)² scalar form was tried and
    * measured 4x SLOWER end-to-end: m·ksub·dsub unique literal terms per
    * iteration forced Janino to recompile a giant projection per Lloyd
    * round, dwarfing the interpreted-eval cost it saved. */
  private def subDists(vec: Column, cb: PqCodebook, j: Int): Seq[Column] = {
    val sl = slice(vec, j * cb.dsub + 1, cb.dsub)
    cb.cents(j).toSeq.map { cent =>
      fsum(zip_with(sl, typedLit(cent.toSeq), (a, b) => (a - b) * (a - b)))
    }
  }

  /** PQ-encode a corpus in ONE scan with no shuffle: per subspace, the
    * argmin-distance code (ties to the lower code). Output: (id, code:
    * array<int>[m]) — m bytes of payload per vector instead of dim
    * floats; the 16-64x compression is what makes billion-vector ANN
    * memory-resident. */
  def encodePq(df: DataFrame, idCol: String, vecCol: String, cb: PqCodebook): DataFrame = {
    val v = toDouble(col(vecCol))
    val codes = (0 until cb.m).map { j =>
      val ds = subDists(v, cb, j)
      // argmin via least-of-structs: (dist, code) pairs, min is the code
      least(ds.zipWithIndex.map { case (d, c) => struct(d.as("d"), lit(c).as("c")) }: _*)
        .getField("c")
    }
    df.select(col(idCol), array(codes: _*).as("code"))
  }

  /** IVF-PQ approximate nearest neighbors — the standard billion-scale
    * composition (Faiss IVFPQ, here without residual encoding): the IVF
    * coarse quantizer prunes to `nprobe` cells, PQ codes give each
    * candidate an asymmetric-distance (ADC) score from a per-query
    * lookup table WITHOUT touching the stored vectors, the best
    * `shortlist` per query rerank exactly, and the top `k` of the
    * rerank return. Distances are squared-L2; `rank` orders ascending.
    *
    * Scale shape: the corpus is scanned twice at build (cell assignment,
    * PQ codes — both shuffle-free after the fits) and NEVER per query:
    * a probe joins the query's nprobe cells, scores |cell| candidates
    * through an m-term sum of broadcast-literal table lookups, and only
    * `shortlist` full vectors per query are touched for the exact
    * rerank. Probe cost per query ≈ (corpus/nlist)·nprobe code reads —
    * independent of dim until the rerank. */
  def annIvfPq(corpus: DataFrame, idCol: String, vecCol: String,
               queries: DataFrame, qidCol: String, qvecCol: String,
               k: Int, dim: Int, nlist: Int = 16, nprobe: Int = 4,
               m: Int = 4, ksub: Int = 16, shortlist: Int = 32,
               seed: Long = 42L): DataFrame = {
    // The two quantizer fits are independent reads of the same corpus,
    // and each is a serial pair of driver-blocking jobs (count + sample
    // collect) before a driver-local Lloyd's. Run the IVF fit on the
    // overlap side thread while the PQ fit's jobs run from this thread
    // (guide §2.6 — the same bracket as Dedup.verifyOverlapped): the
    // four fixed-latency jobs collapse to two serial rounds. Identical
    // fits, identical centroids — concurrency changes when the jobs run,
    // never what they compute.
    val sideIvf = graft.pipeline.Dedup.sideJob(corpus.sparkSession.sparkContext)(
      buildIvf(corpus, idCol, vecCol, nlist, seed))
    val cb =
      try buildPqCodebook(corpus, vecCol, dim, m, ksub, seed)
      catch { case t: Throwable => graft.pipeline.Dedup.drainSide(sideIvf); throw t }
    val ivf = scala.concurrent.Await.result(
      sideIvf, scala.concurrent.duration.Duration.Inf)
    // assigned cells + codes, one narrow frame: (neighbor_id, __bucket,
    // code) — deliberately WITHOUT the raw vector, so every candidate row
    // that shuffles through the probe join and the shortlist window
    // carries m bytes of code, not dim×8 bytes of payload (the whole
    // point of PQ's 16-64x compression; PlanShapeSpec pins this)
    val coded = ivf.assigned.join(
      encodePq(corpus, idCol, vecCol, cb).withColumnRenamed(idCol, "neighbor_id"), "neighbor_id")
      .select(col("neighbor_id"), col("__bucket"), col("code"))
    val centDf = broadcast(ivf.centroids)
    val q = queries.select(col(qidCol).as("query_id"), toDouble(col(qvecCol)).as("__q"))
    // ADC: per query the m×ksub table d(j,c) = ||q_j − cent_j,c||² is an
    // expression over __q; a candidate's score indexes it by its codes.
    // The tables are MATERIALIZED in the probe projection and __q itself
    // is dropped — like __v on the corpus side, the raw query vector must
    // not ride every candidate row through the bucket join and shortlist
    // window (dim×8 bytes × (corpus/nlist)·nprobe rows); the rerank joins
    // it back per query below
    val tables = (0 until m).map(j => array(subDists(col("__q"), cb, j): _*).as(s"__t$j"))
    val probes = q.crossJoin(centDf)
      .withColumn("__dist", fsum(zip_with(col("__q"), col("__cent"), (a, b) => (a - b) * (a - b))))
      .withColumn("__pr", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("query_id"))
          .orderBy(col("__dist").asc, col("__bucket").asc)))
      .filter(col("__pr") <= nprobe)
      .select((col("query_id") +: col("__bucket") +: tables): _*)
    val adcScore = (0 until m).map(j =>
      element_at(col(s"__t$j"), element_at(col("code"), j + 1) + 1)).reduce(_ + _)
    val scored = coded.join(probes, "__bucket")
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("__adc", adcScore)
    val short = scored.withColumn("__sr", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("query_id"))
          .orderBy(col("__adc").asc, col("neighbor_id").asc)))
      .filter(col("__sr") <= shortlist)
    // exact rerank: only the ≤shortlist survivors per query join back to
    // the stored vectors AND the query vector (semi-join-sized probes —
    // the only stage that ever touches dim floats per candidate)
    short.select(col("query_id"), col("neighbor_id"))
      .join(q, "query_id")
      .join(ivf.assigned.select(col("neighbor_id"), col("__v")), "neighbor_id")
      .withColumn("__d", fsum(zip_with(col("__q"), col("__v"), (a, b) => (a - b) * (a - b))))
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("query_id"))
          .orderBy(col("__d").asc, col("neighbor_id").asc)))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank").cast("long").as("rank"))
  }
}
