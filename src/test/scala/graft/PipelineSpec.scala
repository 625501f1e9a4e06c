package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline._

/** Unit tests for the LLM-data-pipeline operators on crafted corpora with
  * hand-computable answers; the DuckDB oracle entries in SparkEntry cover
  * the driver data, these cover the operator math. */
class PipelineSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  lazy val docs: DataFrame = Seq(
    (0L, "the quick brown fox jumps over the lazy dog"),
    (1L, "the quick brown fox jumps over the lazy cat"),      // near-dup of 0
    (2L, "THE QUICK BROWN FOX JUMPS OVER THE LAZY DOG"),      // exact dup of 0 after normalize
    (3L, "completely different words entirely unrelated text here now"),
    (4L, "the quick brown fox jumps over the lazy dog")        // exact dup of 0
  ).toDF("doc_id", "text")

  test("exact dedup keeps one survivor per normalized text") {
    val out = Dedup.exact(docs, "doc_id", "text").as[Long].collect().sorted
    assert(out.toSeq == Seq(0L, 1L, 3L))
  }

  test("minhash-LSH, simhash, and exact ngram near-dup all find the planted pairs") {
    // truth at threshold 0.5 on 3-gram shingles: (0,2), (0,4), (2,4) identical,
    // (0,1)/(1,2)/(1,4) differ in last word -> jaccard 6/8 = 0.75
    val expect = Set((0L, 1L), (0L, 2L), (0L, 4L), (1L, 2L), (1L, 4L), (2L, 4L))
    def pairs(df: DataFrame): Set[(Long, Long)] =
      df.as[(Long, Long)].collect().toSet
    assert(pairs(Dedup.nearDupNgram(docs, "doc_id", "text")) == expect)
    assert(pairs(Dedup.nearDupMinhash(docs, "doc_id", "text")) == expect)
    // simhash majority bits are volatile on 9-token docs, so only the
    // identical pairs (hamming 0) are guaranteed; found pairs are always
    // jaccard-verified so precision is exact
    val sp = pairs(Dedup.nearDupSimhash(docs, "doc_id", "text"))
    assert(sp.subsetOf(expect))
    assert(Set((0L, 2L), (0L, 4L), (2L, 4L)).subsetOf(sp))
  }

  test("packed-counter simhashes equal the per-row expression form") {
    // the corpus aggregate packs 64 majority counters into 16 longs of
    // four 16-bit lanes; it must agree bit-for-bit with the direct
    // expression form on varied texts (dup-heavy, unicode, single token)
    val varied = ((0 until 200).map(i =>
      (i.toLong, s"word$i the quick ${"x" * (i % 7 + 1)} lazy token${i % 13} " * (i % 5 + 1))) ++
      Seq((200L, "solo"), (201L, "ünïcøde tökens ünïcøde"), (202L, "a b a b a b a")))
      .toDF("doc_id", "text")
    val packed = Dedup.simhashes(varied.select($"doc_id".as("__id"), $"text".as("__text")), "__id", "__text")
      .as[(Long, Long)].collect().toMap
    val direct = varied.select($"doc_id", Dedup.simhash64($"text").as("s"))
      .as[(Long, Long)].collect().toMap
    assert(packed == direct)
  }

  test("simhash candidates stay bounded on a degenerate homogeneous corpus") {
    // 300 copies of one template with a unique trailing token: every
    // fingerprint is near-identical, so without the bucket cap the chunk
    // index degenerates to all-pairs (~45k candidates)
    val homog = (0 until 300).map(i =>
      (i.toLong, s"alpha beta gamma delta epsilon zeta eta theta iota kappa tok$i"))
      .toDF("doc_id", "text")
    val sims = Dedup.simhashes(
      homog.select($"doc_id".as("__id"), $"text".as("__text")), "__id", "__text")
    val capped = Dedup.simhashCandidates(sims, maxHamming = 13, maxBucket = 50L)
    val n = capped.count()
    // every bucket holding >50 docs is dropped, so the candidate count is
    // bounded by sum over kept buckets of C(50,2) * chunks, far below all-pairs
    assert(n < 10000L, s"cap did not bound candidates: $n")
    val uncapped = Dedup.simhashCandidates(sims, maxHamming = 13)
    assert(uncapped.count() > n, "degenerate corpus should exceed the capped count")
  }

  test("embedding-cosine near-dup pairs with zero-norm exclusion") {
    val vecs = Seq(
      (0L, Array(1f, 0f, 0f)),
      (1L, Array(0.9f, 0.1f, 0f)),   // cos(0,1) ≈ 0.994
      (2L, Array(0f, 1f, 0f)),       // orthogonal to 0
      (3L, Array(-1f, 0f, 0f)),      // opposite of 0
      (4L, Array(0f, 0f, 0f)),       // zero norm: undefined cosine, dropped
      (5L, Array(2f, 0f, 0f))        // cos(0,5) = 1 despite different norms
    ).toDF("vec_id", "embedding")
    val got = Similarity.nearDupEmbed(vecs, "vec_id", "embedding", 0.9)
      .as[(Long, Long)].collect().toSet
    assert(got == Set((0L, 1L), (0L, 5L), (1L, 5L)))
  }

  test("ann-LSH recall vs brute force on clustered vectors") {
    // two tight clusters: near neighbors share LSH buckets with high prob
    val vecs = (0 until 40).map { i =>
      val base = if (i < 20) Array.fill(8)(1.0f) else Array.fill(8)(-1.0f)
      (i.toLong, base.zipWithIndex.map { case (v, j) => v + 0.01f * ((i * 7 + j) % 5) })
    }.toDF("vec_id", "embedding")
    val q = vecs.filter($"vec_id" === 0 || $"vec_id" === 20)
    val brute = Similarity.bruteTopK(vecs, "vec_id", "embedding", q, "vec_id", "embedding", 5)
      .as[(Long, Long, Long)].collect().toSet
    val ann = Similarity.annLsh(vecs, "vec_id", "embedding", q, "vec_id", "embedding", 5, bits = 4, dim = 8)
      .as[(Long, Long, Long)].collect().toSet
    // same-cluster queries should recover most brute-force neighbors
    val recall = (brute & ann).size.toDouble / brute.size
    assert(recall >= 0.8, s"ANN recall $recall too low")
    val ivf = Similarity.annIvf(vecs, "vec_id", "embedding", q, "vec_id", "embedding", 5,
        nlist = 4, nprobe = 2)
      .as[(Long, Long, Long)].collect().toSet
    val ivfRecall = (brute & ivf).size.toDouble / brute.size
    assert(ivfRecall >= 0.8, s"IVF recall $ivfRecall too low")
    // index persistence: a probe against the saved-and-reloaded index
    // returns exactly the one-shot results, with no refit
    val dir = java.nio.file.Files.createTempDirectory("ivf").toString
    Similarity.saveIvf(Similarity.buildIvf(vecs, "vec_id", "embedding", nlist = 4), dir)
    val probed = Similarity.probeIvf(Similarity.loadIvf(spark, dir),
        q, "vec_id", "embedding", 5, nprobe = 2)
      .as[(Long, Long, Long)].collect().toSet
    assert(probed == ivf, s"persisted probe drifted: ${probed.diff(ivf)} vs ${ivf.diff(probed)}")
  }

  test("ivf-pq: codes well-formed, ADC shortlist + exact rerank matches exact L2 top-k") {
    val dim = 8
    val vecs = (0 until 40).map { i =>
      val base = if (i < 20) Array.fill(dim)(1.0f) else Array.fill(dim)(-1.0f)
      (i.toLong, base.zipWithIndex.map { case (v, j) => v + 0.01f * ((i * 7 + j) % 5) })
    }.toDF("vec_id", "embedding")
    val cb = Similarity.buildPqCodebook(vecs, "embedding", dim, m = 2, ksub = 4)
    // KMeans may collapse empty clusters on degenerate two-mode data, so
    // the realized codebook can be smaller than ksub — never larger
    assert(cb.m == 2 && cb.dsub == 4 && cb.cents.forall(c => c.nonEmpty && c.length <= 4))
    val codes = Similarity.encodePq(vecs, "vec_id", "embedding", cb)
      .as[(Long, Seq[Int])].collect().toMap
    assert(codes.size == 40)
    assert(codes.values.forall(c => c.length == 2 &&
      c.zipWithIndex.forall { case (x, j) => x >= 0 && x < cb.cents(j).length }))
    // identical inputs encode identically (encoding is a pure expression)
    val again = Similarity.encodePq(vecs, "vec_id", "embedding", cb)
      .as[(Long, Seq[Int])].collect().toMap
    assert(again == codes)
    // with a shortlist covering the cells, the exact rerank makes the
    // output EQUAL the exact squared-L2 top-5 (not merely high recall)
    val q = vecs.filter($"vec_id" === 0 || $"vec_id" === 20)
    val all = vecs.as[(Long, Seq[Float])].collect().toMap
    def l2(a: Seq[Float], b: Seq[Float]) =
      a.zip(b).map { case (x, y) => (x - y).toDouble * (x - y) }.sum
    val exact = (for (qid <- Seq(0L, 20L)) yield {
      all.toSeq.filter(_._1 != qid)
        .map { case (nid, v) => (nid, l2(all(qid), v)) }
        .sortBy { case (nid, d) => (d, nid) }.take(5).zipWithIndex
        .map { case ((nid, _), r) => (qid, nid, (r + 1).toLong) }
    }).flatten.toSet
    val got = Similarity.annIvfPq(vecs, "vec_id", "embedding", q, "vec_id", "embedding",
        k = 5, dim = dim, nlist = 4, nprobe = 2, m = 2, ksub = 4, shortlist = 20)
      .as[(Long, Long, Long)].collect().toSet
    assert(got == exact, s"missing=${exact.diff(got)} extra=${got.diff(exact)}")
  }

  test("text analysis: langid, quality, tokens, fingerprint are deterministic") {
    val d = Seq((1L, "the cat is on the mat"), (2L, "el gato es de la casa")).toDF("doc_id", "text")
    val lang = d.select($"doc_id", TextAnalysis.langId($"text").as("l")).as[(Long, String)].collect().toMap
    assert(lang(1L) == "en")
    assert(lang(2L) == "es")
    val toks = d.select($"doc_id", TextAnalysis.wsTokens($"text")).as[(Long, Long)].collect().toMap
    assert(toks(1L) == 6)
    val fp1 = d.select(TextAnalysis.fingerprint($"text")).as[Long].collect()
    val fp2 = d.select(TextAnalysis.fingerprint($"text")).as[Long].collect()
    assert(fp1.toSeq == fp2.toSeq)
    val q = d.select(TextAnalysis.qualityScore($"text")).as[Double].collect()
    assert(q.forall(x => x >= 0.0 && x <= 1.0))
  }

  test("multimodal plumbing: binary column + stubbed batch feature extraction") {
    val d = Seq((7L, "abc"), (8L, "")).toDF("doc_id", "text")
    val bin = Multimodal.asBinaryColumn(d, "doc_id", "text", "text")
    assert(bin.schema("content").dataType.typeName == "binary")
    val m = Multimodal.extractFeatures(spark, bin).collect()
      .map(r => (r.getLong(0), (r.getLong(2), r.getLong(3)))).toMap
    assert(m(7L) == ((3L, 'a'.toLong)))
    assert(m(8L) == ((0L, 0L)))
  }

  test("multimodal resize and frame sampling keep shape and determinism") {
    val payload = ("x" * 1000) + "Z" // 1001 bytes
    val d = Seq((1L, payload), (2L, ""), (3L, ("a" * 31) + "Z")).toDF("doc_id", "text")
    val bin = Multimodal.asBinaryColumn(d, "doc_id", "text", "video")
    // resize: binary→binary at the requested size, empty stays empty,
    // center sampling reaches the tail on aligned inputs
    val rs = Multimodal.resize(spark, bin, 16).collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]](2)).toMap
    assert(rs(1L).length == 16 && rs(1L).forall(_ == 'x'.toByte))
    assert(rs(2L).length == 0)
    assert(rs(3L)(15) == 'Z'.toByte && rs(3L)(0) == 'a'.toByte)
    // frames: 1001 bytes / 256 = 4 frames (sizes 256,256,256,233),
    // every 2nd frame kept -> idx 0 and 2
    val fr = Multimodal.sampleFrames(spark, bin, 256, 2).collect()
      .filter(_.getLong(0) == 1L)
      .map(r => r.getLong(2) -> r.getAs[Array[Byte]](3).length).toMap
    assert(fr == Map(0L -> 256, 2L -> 256))
    // a non-multiple tail frame survives when sampled
    val fr3 = Multimodal.sampleFrames(spark, bin, 256, 3).collect()
      .filter(_.getLong(0) == 1L).map(r => r.getLong(2) -> r.getAs[Array[Byte]](3).length).toMap
    assert(fr3 == Map(0L -> 256, 3L -> 233))
    // empty payload produces no frames
    assert(Multimodal.sampleFrames(spark, bin, 256, 1).filter(col("id") === 2L).count() == 0)
  }

  test("events sessionization counts gap-separated sessions") {
    // ns-long timestamps: user 1 has events at t=0s, 10s, 4000s -> 2 sessions
    val e = Seq(
      (1L, 0L * 1000000000L, 1L, "a", 1.0, "{}"),
      (2L, 10L * 1000000000L, 1L, "a", 2.0, "{}"),
      (3L, 4000L * 1000000000L, 1L, "a", 3.0, "{}"),
      (4L, 5L * 1000000000L, 2L, "b", 4.0, "{}")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val s = Events.sessionize(e).as[(Long, Long, Long)].collect()
      .map { case (u, ns, ne) => u -> ((ns, ne)) }.toMap
    assert(s(1L) == ((2L, 3L)))
    assert(s(2L) == ((1L, 1L)))
  }

  test("anomaly: hand-computed hourly z-scores; constant-volume types emit nothing") {
    def ev(id: Long, hour: Long, idx: Long, typ: String) =
      (id, (hour * 3600 + idx) * 1000000000L, 1L, typ, 1.0, "{}")
    // type a: hourly counts [1, 1, 4] -> mu=2, sd=sqrt(3); type b: one hour
    val e = (Seq(ev(1, 0, 0, "a"), ev(2, 1, 0, "a")) ++
      (0 until 4).map(i => ev(10 + i, 2, i, "a")) ++
      Seq(ev(20, 0, 0, "b")))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = Events.anomaly(e).as[(String, Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r._4).toMap
    def round4(x: Double) = BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val sd = math.sqrt(3.0)
    assert(out == Map(("a", 0L) -> round4(-1 / sd), ("a", 3600L) -> round4(-1 / sd),
      ("a", 7200L) -> round4(2 / sd)), out.toString)
  }

  test("corpusReport: one-row summary with hand-computed interpolated percentiles") {
    val d = Seq(
      (0L, "the"), (1L, "the fox"), (2L, "the quick brown"),
      (3L, "der und ist echt")).toDF("doc_id", "text")
    val r = Curation.corpusReport(d, "doc_id", "text").collect()(0)
    assert(r.getAs[Long]("n_docs") == 4)
    assert(r.getAs[Long]("total_tokens") == 10)
    assert(r.getAs[Double]("mean_tokens") == 2.5)
    // sorted token counts [1,2,3,4]: p50 = 2.5, p90 = 3.7, p99 = 3.97
    assert(r.getAs[Double]("p50_tokens") == 2.5)
    assert(r.getAs[Double]("p90_tokens") == 3.7)
    assert(r.getAs[Double]("p99_tokens") == 3.97)
    // 3 of 4 docs lead with English stopwords
    assert(r.getAs[Double]("en_share") == 0.75)
    // approx = true: same schema, same non-percentile stats; percentiles
    // come from the sketch (discrete — lands ON an observed count) and at
    // this accuracy/size sit within one count of the interpolated exact
    val a = Curation.corpusReport(d, "doc_id", "text", approx = true).collect()(0)
    assert(a.schema.fieldNames.sameElements(r.schema.fieldNames))
    assert(a.getAs[Long]("n_docs") == 4 && a.getAs[Long]("total_tokens") == 10)
    assert(a.getAs[Double]("en_share") == 0.75)
    assert(math.abs(a.getAs[Double]("p50_tokens") - 2.5) <= 1.0)
    assert(math.abs(a.getAs[Double]("p99_tokens") - 3.97) <= 1.0)
  }

  test("asOf: latest right at-or-before each left, per key, deterministic on ties") {
    // user 1: views at 10, 20, 20 (ids 2, 3, 4 -> tie keeps max id 4);
    // purchases at 5 (no prior -> null), 15 (view 2), 20 (at-or-before -> 4)
    // user 2: view at 100 only reaches user 2's purchase, not user 1's
    def ev(id: Long, sec: Long, u: Long, t: String) = (id, sec * 1000000000L, u, t, 0.0, "{}")
    val e = Seq(
      ev(2, 10, 1, "view"), ev(3, 20, 1, "view"), ev(4, 20, 1, "view"),
      ev(10, 5, 1, "purchase"), ev(11, 15, 1, "purchase"), ev(12, 20, 1, "purchase"),
      ev(20, 100, 2, "view"), ev(21, 150, 2, "purchase")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val got = Events.asOf(
        e.filter($"event_type" === "purchase").withColumnRenamed("event_id", "purchase_id"),
        e.filter($"event_type" === "view"),
        "user_id", "ts", "purchase_id", "event_id")
      .as[(Long, Long, Option[Long])].collect().map(r => r._1 -> r._3).toMap
    assert(got == Map(10L -> None, 11L -> Some(2L), 12L -> Some(4L), 21L -> Some(20L)))
  }

  test("rangeJoin: half-open containment via bin buckets, boundary-exact") {
    // interval A: user 1, [10, 30) — catches ts 10 (start inclusive) and 29,
    // not 30 (end exclusive) or 5; interval B: user 2, [10, 30) must not
    // catch user 1's points; bin=7 exercises intervals spanning bins
    val pts = Seq((1L, 10L, 100L), (1L, 29L, 101L), (1L, 30L, 102L), (1L, 5L, 103L),
      (2L, 15L, 200L)).toDF("user_id", "ts", "event_id")
    val iv = Seq((1L, 900L, 10L, 30L), (2L, 901L, 10L, 30L))
      .toDF("user_id", "interval_id", "start", "end")
    val got = Events.rangeJoin(pts, "event_id", "ts", iv, "interval_id",
        "start", "end", "user_id", bin = 7L)
      .as[(Long, Long, Long)].collect().map(r => r._2 -> r._3).toSet
    assert(got == Set(100L -> 900L, 101L -> 900L, 200L -> 901L))
  }

  test("retention: cohort by first active bucket, offsets count returning users") {
    // bucket = 10s. user 1 active in buckets 0,10,30 (cohort 0 -> offsets 0,1,3)
    // user 2 active in buckets 10,20 (cohort 10 -> offsets 0,1)
    // user 3 active in bucket 10 twice -> single (10, 0) row
    def ev(id: Long, sec: Long, u: Long) = (id, sec * 1000000000L, u, "view", 0.0, "{}")
    val e = Seq(
      ev(1, 0, 1), ev(2, 12, 1), ev(3, 35, 1),
      ev(4, 11, 2), ev(5, 25, 2),
      ev(6, 13, 3), ev(7, 17, 3)
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val got = Events.retention(e, bucketSec = 10L)
      .as[(Long, Long, Long)].collect().map(r => (r._1, r._2) -> r._3).toMap
    assert(got == Map(
      (0L, 0L) -> 1L, (0L, 1L) -> 1L, (0L, 3L) -> 1L,
      (10L, 0L) -> 2L, (10L, 1L) -> 1L))
  }

  test("funnel: strictly-after sequential-earliest stage progression") {
    // user 1: view@0 click@10 purchase@20 -> 3 stages
    // user 2: click@0 view@10 click@5 -> view first at 10, no click AFTER it -> 1
    // user 3: view@0 purchase@5 click@10 -> purchase precedes the click -> 2
    // user 4: purchase@0 only -> never enters (no stage-1 row)
    // user 5: view@0 click@0 (same ts, strict >) -> 1
    def ev(id: Long, sec: Long, u: Long, t: String) = (id, sec * 1000000000L, u, t, 0.0, "{}")
    val e = Seq(
      ev(1, 0, 1, "view"), ev(2, 10, 1, "click"), ev(3, 20, 1, "purchase"),
      ev(4, 0, 2, "click"), ev(5, 10, 2, "view"), ev(6, 5, 2, "click"),
      ev(7, 0, 3, "view"), ev(8, 5, 3, "purchase"), ev(9, 10, 3, "click"),
      ev(10, 0, 4, "purchase"),
      ev(11, 0, 5, "view"), ev(12, 0, 5, "click")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val got = Events.funnel(e, Seq("view", "click", "purchase"))
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 3L, 2L -> 1L, 3L -> 2L, 5L -> 1L))
  }

  test("clusters: chain, triangle, and separate components all collapse to min id") {
    // chain 1-2-3-4-5 exercises multi-round star convergence; {10,11,12}
    // is a triangle; {20,21} a lone pair
    val pairs = Seq(
      (1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L),
      (10L, 11L), (11L, 12L), (10L, 12L),
      (21L, 20L)
    ).toDF("a_id", "b_id")
    val expect = Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L, 21L -> 20L)
    // local union-find path (default threshold) and the distributed
    // star-loop path (threshold 0) must agree
    val local = Dedup.clusters(pairs, "a_id", "b_id").as[(Long, Long)].collect().toMap
    val dist = Dedup.clusters(pairs, "a_id", "b_id", localThreshold = 0L)
      .as[(Long, Long)].collect().toMap
    assert(local == expect)
    assert(dist == expect)
  }

  test("clusters releases its per-round checkpoint blocks") {
    val sc = spark.sparkContext
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("a_id", "b_id")
    val before = sc.getPersistentRDDs.size
    Dedup.clusters(pairs, "a_id", "b_id", localThreshold = 0L).count()
    // only the FINAL round's checkpoint may remain (the result reads from
    // it); every intermediate round must have been released
    assert(sc.getPersistentRDDs.size <= before + 1)
  }

  test("clusters at scale: 2M+ pairs engage the distributed star loop; equals union-find") {
    import org.apache.spark.sql.functions.{col, expr}
    // ~2.18M edges over ~3.3M nodes: twenty 50k-node chains (adversarial
    // diameter for plain min-propagation) plus 1.2M functional-graph edges
    // inside 1000 blocks of 1200 nodes
    val chains = spark.range(0L, 1000000L)
      .filter((col("id") + 1) % 50000 =!= 0)
      .select(col("id").as("a_id"), (col("id") + 1).as("b_id"))
    val blocks = spark.range(0L, 1200000L).select(
      (col("id") + 10000000L).as("a_id"),
      (expr("(id div 1200) * 1200") + (col("id") * 7919) % 1200 + 10000000L).as("b_id"))
    // materialized seed: feeding the raw Union(Project(Range)) plan into
    // clusters trips a Spark 4.1 optimizer fault (UnionBase.
    // rewriteConstraints "key not found" on the pushed-through alias) that
    // has nothing to do with the operator under test
    val pairs = chains.union(blocks).localCheckpoint(true)
    // distributed path must engage at the DEFAULT threshold (2.18M > 1M)
    val dist = Dedup.clusters(pairs, "a_id", "b_id")
    val distOut = dist.persist()
    val nDist = distOut.count()
    val rounds = Dedup.lastClusterRounds
    assert(rounds > 0, s"expected the distributed star loop, got rounds=$rounds")
    // star rounds are O(log n) — a linear (diameter-bound) regression on
    // the 50k chains would blow straight past this
    assert(rounds <= 20, s"star loop took $rounds rounds on 2M pairs")
    // the driver union-find over the same edges is the ground truth
    val local = Dedup.clusters(pairs, "a_id", "b_id", localThreshold = Long.MaxValue)
    assert(Dedup.lastClusterRounds == 0)
    val localOut = local.persist()
    assert(localOut.count() == nDist)
    val mismatches = distOut.withColumnRenamed("cluster_id", "d")
      .join(localOut.withColumnRenamed("cluster_id", "l"), "id")
      .filter(col("d") =!= col("l")).count()
    assert(mismatches == 0L, s"$mismatches assignments differ between paths")
    // chains are analytically known: every chain node maps to its chain head
    val badChain = distOut.filter(col("id") < 1000000L)
      .filter(col("cluster_id") =!= expr("(id div 50000) * 50000")).count()
    assert(badChain == 0L, s"$badChain chain nodes not mapped to their chain head")
    distOut.unpersist(); localOut.unpersist()
    info(s"distributed path: $rounds rounds over ${pairs.count()} pairs")
  }

  test("clusters: empty pair list and string ids") {
    val empty = Seq.empty[(Long, Long)].toDF("a_id", "b_id")
    assert(Dedup.clusters(empty, "a_id", "b_id").count() == 0)
    val sp = Seq(("doc-b", "doc-a"), ("doc-b", "doc-c")).toDF("a_id", "b_id")
    val got = Dedup.clusters(sp, "a_id", "b_id").as[(String, String)].collect().toMap
    assert(got == Map("doc-a" -> "doc-a", "doc-b" -> "doc-a", "doc-c" -> "doc-a"))
  }

  test("curate drops exact dups and low-quality docs in one pass") {
    // docs 2 and 4 are normalized dups of 0 (dropped); doc 3 has no
    // stopwords (quality 0.04 < 0.5, dropped); 0 and 1 pass at 0.545
    val out = Curation.curate(docs, "doc_id", "text")
    assert(out.select("doc_id").as[Long].collect().sorted.toSeq == Seq(0L, 1L))
    val row = out.filter(col("doc_id") === 0).head()
    assert(row.getAs[String]("lang_pred") == "en")
    assert(row.getAs[Double]("quality") == 0.545)
    assert(row.getAs[Long]("ws_tokens") == 9L)
  }

  test("survivors keeps cluster canonicals and unpaired docs") {
    // docs 0,2,4 are mutual dups, 1 pairs with 0's cluster too -> one
    // cluster {0,1,2,4} with canonical 0; doc 3 unpaired
    val out = Dedup.survivors(docs, "doc_id", Dedup.nearDupNgram(docs, "doc_id", "text"))
      .select("doc_id").as[Long].collect().sorted
    assert(out.toSeq == Seq(0L, 3L))
  }

  test("LSH-bucketed embedding near-dup matches the exact quadratic form") {
    // tight clusters (within-cluster angle ~0.03 rad): ANN candidates must
    // recover every exact pair at tau=0.9 — per-pair miss rate ~3e-5 over
    // 150 pairs with FIXED hyperplanes, so the comparison is deterministic
    val vecs = (0 until 60).map { i =>
      val c = i / 6
      val base = Array.tabulate(8)(j => math.cos(c * 0.7 + j).toFloat)
      (i.toLong, base.zipWithIndex.map { case (v, j) => v + 0.005f * ((i * 13 + j) % 7) })
    }.toDF("vec_id", "embedding")
    val exact = Similarity.nearDupEmbed(vecs, "vec_id", "embedding", 0.9)
      .as[(Long, Long)].collect().toSet
    val ann = Similarity.nearDupEmbedANN(vecs, "vec_id", "embedding", 0.9,
        bits = 6, dim = 8)
      .as[(Long, Long)].collect().toSet
    assert(exact.nonEmpty, "fixture drifted: no exact pairs at tau=0.9")
    // precision is exact by construction (ANN verifies with the same dot)
    assert(ann.subsetOf(exact), s"ANN emitted non-pairs: ${(ann -- exact).take(5)}")
    assert(ann == exact, s"ANN missed ${(exact -- ann).size} of ${exact.size} pairs")
  }

  test("chunking covers every token with the configured overlap") {
    val words = (1 to 25).map(i => s"w$i")
    val docs = Seq((1L, words.mkString(" ")), (2L, "a b"), (3L, "solo")).toDF("doc_id", "text")
    val out = TextAnalysis.chunk(docs, "doc_id", "text", size = 10, overlap = 3)
      .as[(Long, Long, String, Long)].collect().sortBy(r => (r._1, r._2))
    // 25 tokens, stride 7: chunks at 0,7,14,21 -> 4 chunks, last holds 4
    val d1 = out.filter(_._1 == 1L)
    assert(d1.map(_._2).toSeq == Seq(0L, 1L, 2L, 3L))
    assert(d1.map(_._4).toSeq == Seq(10L, 10L, 10L, 4L))
    assert(d1(1)._3.startsWith("w8 ") && d1(3)._3 == "w22 w23 w24 w25")
    // every token appears in some chunk; consecutive chunks share `overlap`
    assert(d1.flatMap(_._3.split(" ")).toSet == words.toSet)
    assert(d1(0)._3.split(" ").takeRight(3).toSeq == d1(1)._3.split(" ").take(3).toSeq)
    // short docs: one chunk, whole text
    assert(out.filter(_._1 == 2L).toSeq == Seq((2L, 0L, "a b", 2L)))
    assert(out.filter(_._1 == 3L).toSeq == Seq((3L, 0L, "solo", 1L)))
  }

  test("redact scrubs emails, phone spans, and long ids but not prose") {
    val rows = Seq(
      "mail bob.smith+x@corp.example.org now",
      "call +1 (555) 010-7788 today",
      "order 123456789 shipped",
      "short 12345 stays, year 2024 stays",
      "plain text untouched").toDF("text")
    val got = rows.select(TextAnalysis.redact($"text").as("r")).as[String].collect().toSeq
    assert(got == Seq(
      "mail <EMAIL> now",
      "call <PHONE> today",
      "order <ID> shipped",
      "short 12345 stays, year 2024 stays",
      "plain text untouched"))
  }

  test("decontaminate flags exactly the docs sharing an n-gram with the benchmark") {
    val bench = Seq((100L, "alpha beta gamma delta epsilon")).toDF("doc_id", "text")
    val corpus = Seq(
      (0L, "prefix words alpha beta gamma delta suffix"), // shares 4-grams
      (1L, "alpha beta gamma unrelated delta epsilon x"), // no shared 4-gram window
      (2L, "nothing in common at all here friend")
    ).toDF("doc_id", "text")
    val got = Dedup.decontaminate(corpus, "doc_id", "text", bench, "text")
      .as[(Long, Long)].collect().toMap
    // doc 0 shares windows "alpha beta gamma delta" only -> hits 1
    assert(got == Map(0L -> 1L))
    // raising minOverlap above the hit count clears the flag
    assert(Dedup.decontaminate(corpus, "doc_id", "text", bench, "text",
      minOverlap = 2L).count() == 0)
  }

  test("split: deterministic, exhaustive, and proportional to the fractions") {
    val ids = spark.range(20000).select($"id".as("doc_id"))
    val a = Curation.split(ids, "doc_id").as[(Long, String)].collect().toMap
    val b = Curation.split(ids.orderBy(rand(7)), "doc_id").as[(Long, String)].collect().toMap
    assert(a == b) // pure function of the id, not of row order
    val byPart = a.groupBy(_._2).view.mapValues(_.size).toMap
    assert(byPart.keySet == Set("train", "val", "test"))
    assert(math.abs(byPart("train") / 20000.0 - 0.9) < 0.01)
    assert(math.abs(byPart("val") / 20000.0 - 0.05) < 0.005)
    assert(math.abs(byPart("test") / 20000.0 - 0.05) < 0.005)
    // invalid fractions rejected
    intercept[IllegalArgumentException] {
      Curation.splitBoundaries(Seq("a" -> 0.5, "b" -> 0.6))
    }
  }

  test("sampleByGroup keeps at most k per group, deterministically") {
    val rows = spark.range(1000).select($"id".as("doc_id"),
      (pmod($"id", lit(4L))).cast("string").as("src"))
    val a = Curation.sampleByGroup(rows, "doc_id", "src", 10)
      .as[(Long, String)].collect().toSet
    val b = Curation.sampleByGroup(rows.orderBy(rand(11)), "doc_id", "src", 10)
      .as[(Long, String)].collect().toSet
    assert(a == b && a.size == 40)
    assert(a.groupBy(_._2).forall(_._2.size == 10))
    // a group smaller than k survives whole
    val small = Seq((1L, "x"), (2L, "x"), (3L, "y")).toDF("doc_id", "src")
    assert(Curation.sampleByGroup(small, "doc_id", "src", 10).count() == 3)
  }

  test("repeated-span scrub removes cross-document spans at any alignment") {
    // docs 0/1 share an 8-token run at DIFFERENT positions (the case the
    // fixed-chunk passage dedup cannot catch); docs 3/4 share a 10-token
    // run whose three overlapping 8-windows must merge into ONE maximal
    // span; doc 2 is untouched
    val shared8 = "a b c d e f g h"
    val shared10 = "q r s t u v w x y z"
    val rows = Seq(
      (0L, s"x $shared8 y"),
      (1L, s"p q $shared8"),
      (2L, "totally unique words that repeat nowhere else at all"),
      (3L, s"one $shared10"),
      (4L, s"$shared10 two")
    ).toDF("doc_id", "text")
    val got = Dedup.scrubRepeatedSpans(rows, "doc_id", "text", k = 8)
      .as[(Long, String)].collect().toMap
    assert(got(0L) == "x y")
    assert(got(1L) == "p q")
    assert(got(2L) == "totally unique words that repeat nowhere else at all")
    assert(got(3L) == "one")
    assert(got(4L) == "two")

    // below-threshold runs survive: 7 shared tokens, k = 8
    val short = Seq((0L, "a b c d e f g tail1"), (1L, "a b c d e f g tail2"))
      .toDF("doc_id", "text")
    val keptAll = Dedup.scrubRepeatedSpans(short, "doc_id", "text", k = 8)
      .as[(Long, String)].collect().toMap
    assert(keptAll(0L) == "a b c d e f g tail1")
    assert(keptAll(1L) == "a b c d e f g tail2")
  }

  test("cross-corpus near-dup pairs only across the two sides") {
    // new = docs {0,1}, ref = docs {2,3,4}; truth at 0.5 on 3-grams:
    // 0-2 and 0-4 identical (j=1), 1-2 and 1-4 differ last word (j=0.75);
    // doc 3 matches nothing; the 0-1 within-new pair must NOT appear
    val newSide = docs.filter($"doc_id" < 2)
    val refSide = docs.filter($"doc_id" >= 2)
    val got = Dedup.nearDupCross(newSide, "doc_id", "text", refSide, "doc_id", "text")
      .as[(Long, Long)].collect().toSet
    assert(got == Set((0L, 2L), (0L, 4L), (1L, 2L), (1L, 4L)))

    // persisted band index: save -> load -> probe equals the one-shot path
    // (same signatures, same buckets, same verify threshold)
    val dir = java.nio.file.Files.createTempDirectory("mh-index").toString
    Dedup.saveMinhashIndex(Dedup.buildMinhashIndex(refSide, "doc_id", "text"), dir)
    val loaded = Dedup.loadMinhashIndex(spark, dir)
    val probed = Dedup.probeMinhashIndex(loaded, newSide, "doc_id", "text")
      .as[(Long, Long)].collect().toSet
    assert(probed == got, s"persisted probe drifted: ${probed.diff(got)} vs ${got.diff(probed)}")
    // the index side's degenerate-bucket list persists with the index, so
    // a probe never re-aggregates the reference band table: bigbuckets is
    // one of the saved tables and round-trips with the build parameters
    assert(new java.io.File(s"$dir/bigbuckets").exists())
    assert(loaded.maxBucket == 100000L)
    assert(loaded.bigBuckets.columns.toSeq == Seq("__band", "__bh"))
    // a tiny maxBucket forces every shared bucket onto the list and the
    // probe to drop all candidates — proving the stored list is live
    val strict = Dedup.buildMinhashIndex(refSide, "doc_id", "text", maxBucket = 0L)
    assert(Dedup.probeMinhashIndex(strict, newSide, "doc_id", "text").count() == 0L)
  }

  test("commonShingles reports passages at or above the df threshold") {
    val rows = Seq(
      (0L, "legal header text alpha"),
      (1L, "legal header text beta"),
      (2L, "legal header text gamma"),
      (3L, "unique content only here")
    ).toDF("doc_id", "text")
    val got = Dedup.commonShingles(rows, "doc_id", "text", shingleN = 3, minDf = 3)
      .as[(String, Long)].collect().toMap
    assert(got == Map("legal header text" -> 3L))
  }

  test("pack assigns starting sequence and offset from the per-group prefix sum") {
    // group g: docs of 3, 4, 2 tokens; seqLen 5 ->
    //   doc 1 starts at cum 0 (seq 0 off 0), doc 2 at 3 (seq 0 off 3),
    //   doc 3 at 7 (seq 1 off 2); group h restarts at zero
    val rows = Seq(
      (1L, "a b c", "g"), (2L, "d e f g", "g"), (3L, "h i", "g"),
      (9L, "x y z", "h")
    ).toDF("doc_id", "text", "source")
    val got = Curation.pack(rows, "doc_id", "text", "source", 5L)
      .as[(Long, String, Long, Long)].collect()
      .map(r => r._1 -> (r._3, r._4)).toMap
    assert(got == Map(1L -> (0L, 0L), 2L -> (0L, 3L), 3L -> (1L, 2L), 9L -> (0L, 0L)))
  }

  test("repetition fractions: hand-computed dup word and bigram rates") {
    val rows = Seq(
      (0L, "a b c d"),          // no repetition
      (1L, "a a a a"),          // words 4->1 dup .75; bigrams 3 -> 1 distinct -> 2/3
      (2L, "a b a b a"),        // words 5->2 dup .6; bigrams: "a b","b a" over 4 -> .5
      (3L, "solo")              // single word: bigram rate defined as 0
    ).toDF("doc_id", "text")
    val got = rows.select($"doc_id",
        TextAnalysis.dupWordFrac($"text").as("w"),
        TextAnalysis.dupBigramFrac($"text").as("b"))
      .as[(Long, Double, Double)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(got(0L) == (0.0, 0.0))
    assert(got(1L) == (0.75, 0.6667))
    assert(got(2L) == (0.6, 0.5))
    assert(got(3L) == (0.0, 0.0))
  }

  test("dedupPassages removes shared passages, keeps order, preserves rows") {
    // k=2 passages: doc 0 = ["a b","c d","e f"], doc 1 = ["a b","c d","x y"],
    // doc 2 = ["a b","q r"], doc 3 = ["z w"]. With maxDf=1:
    // "a b" (df 3) and "c d" (df 2) are boilerplate; survivors keep order.
    val rows = Seq(
      (0L, "a b c d e f"),
      (1L, "a b c d x y"),
      (2L, "a b q r"),
      (3L, "z w")
    ).toDF("doc_id", "text")
    val got = Dedup.dedupPassages(rows, "doc_id", "text", k = 2, maxDf = 1L)
      .as[(Long, String)].collect().toMap
    assert(got == Map(0L -> "e f", 1L -> "x y", 2L -> "q r", 3L -> "z w"))
    // a doc that is ALL boilerplate comes back empty, not dropped
    val all = Seq((0L, "a b"), (1L, "a b"), (2L, "c d")).toDF("doc_id", "text")
    val got2 = Dedup.dedupPassages(all, "doc_id", "text", k = 2, maxDf = 1L)
      .as[(Long, String)].collect().toMap
    assert(got2 == Map(0L -> "", 1L -> "", 2L -> "c d"))
  }

  test("bloom decontamination: no false negatives vs the exact semi-join") {
    val corpus = ((0 until 60).map(i =>
      (i.toLong, s"alpha bravo w$i x${i % 7} y${i % 5} z${i % 3} tail end here"))).toDF("doc_id", "text")
    val bench = Seq((900L, "alpha bravo w3 x3 shared fragment"),
      (901L, "y2 z1 tail end here closing")).toDF("doc_id", "text")
    val exact = Dedup.decontaminate(corpus, "doc_id", "text", bench, "text")
      .as[(Long, Long)].collect().toMap
    val bloom = Dedup.benchmarkBloom(bench, "text")
    val got = Dedup.decontaminateBloom(corpus, "doc_id", "text", bloom)
      .as[(Long, Long)].collect().toMap
    assert(exact.nonEmpty, "fixture must actually contaminate")
    // one-sided error: every exact flag present, with at-least-equal hits
    exact.foreach { case (id, hits) =>
      assert(got.contains(id) && got(id) >= hits, s"doc $id lost by bloom: $got vs $exact")
    }
    // 16 bits/item on this tiny set: expect no false positives at all
    assert(got.keySet == exact.keySet, s"unexpected FPs: ${got.keySet -- exact.keySet}")
  }

  test("mix replicates by weight with md5-deterministic extra copies") {
    val rows = (0L until 40L).map(i => (i, s"s${i % 4}")).toDF("doc_id", "source")
    val weights = Map("s0" -> 2.5, "s1" -> 0.4, "s2" -> 0.0) // s3 defaults to 1.0
    val got = Curation.mix(rows, "doc_id", "source", weights)
      .as[(Long, String, Long)].collect()
    val byDoc = got.groupBy(_._1).view.mapValues(_.map(_._3).sorted.toSeq).toMap
    // independent recomputation of the extra-copy rule: first 8 hex chars
    // of md5(id) below the fraction's cut point
    def md5hex(s: String): String = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(8)
    for (i <- 0L until 40L) {
      val w = weights.getOrElse(s"s${i % 4}", 1.0)
      val base = math.floor(w).toInt
      val frac = w - base
      val cut = f"${(frac * 4294967296.0).toLong}%08x"
      val n = base + (if (frac > 0 && md5hex(i.toString) < cut) 1 else 0)
      assert(byDoc.getOrElse(i, Seq.empty) == (0 until n).map(_.toLong),
        s"doc $i weight $w expected $n copies")
    }
  }

  test("corpusRarity scores docs by mean corpus token frequency, integer-exact") {
    // corpus counts: a=3, b=2, c=1, d=1 over docs
    //   doc 0 "a b"   -> n=2 sum=5  mean 2.5
    //   doc 1 "a b c" -> n=3 sum=6  mean 2.0
    //   doc 2 "a d"   -> n=2 sum=4  mean 2.0
    val rows = Seq((0L, "a b"), (1L, "a b c"), (2L, "a d")).toDF("doc_id", "text")
    val got = TextAnalysis.corpusRarity(rows, "doc_id", "text")
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(got == Map(0L -> (2L, 5L, 2.5), 1L -> (3L, 6L, 2.0), 2L -> (2L, 4L, 2.0)))
  }

  test("contaminationReport: per-bench-item doc and hit counts, clean items zero") {
    // 4-shingles: corpus doc 1 shares bench item 100's full text (1 shingle),
    // doc 2 shares nothing; bench item 101 is clean
    val corpus = Seq(
      (1L, "alpha beta gamma delta"), (2L, "totally unrelated words here"))
      .toDF("doc_id", "text")
    val bench = Seq(
      (100L, "alpha beta gamma delta"), (101L, "pristine eval question text"))
      .toDF("doc_id", "text")
    val got = Dedup.contaminationReport(corpus, "doc_id", "text", bench, "doc_id", "text")
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(got(100L) == ((1L, 1L)))
    assert(got(101L) == ((0L, 0L)))
    // the report direction agrees with decontaminate's: doc 1 is the flagged one
    val flagged = Dedup.decontaminate(corpus, "doc_id", "text", bench, "text")
      .as[(Long, Long)].collect().toMap
    assert(flagged == Map(1L -> 1L))
  }

  test("sourcePriors: within-source z-scores, constant sources get z=0") {
    val rows = Seq(
      (0L, "the a of and to in", "a"), (1L, "the a of and to in", "a"), // identical
      (2L, "the the the the", "b"), (3L, "zz zz zz zz", "b")) // differing quality
      .toDF("doc_id", "text", "source")
    val got = Curation.sourcePriors(rows, "doc_id", "text", "source")
      .as[(Long, String, Double, Long, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    // constant-quality source: sd = 0 → z pinned to 0, mean = quality
    assert(got(0L)._4 == 2L && got(0L)._6 == 0.0 && got(0L)._5 == got(0L)._3)
    assert(got(1L)._6 == 0.0)
    // two distinct values: population z is exactly ±1
    assert(got(2L)._6 == 1.0 && got(3L)._6 == -1.0)
    assert(got(2L)._3 > got(3L)._3) // stopword-heavy doc scores higher
  }

  test("lexicalDiversity: hand-computed TTR, hapax fraction, mean word length") {
    // doc 0 "a a b": 3 tokens, 2 types, ttr 2/3, hapax {b}/2 types = 0.5, mwl 1.0
    // doc 1 "x yy zzz": all distinct → ttr 1, hapax 1, mwl (1+2+3)/3 = 2.0
    val rows = Seq((0L, "a a b"), (1L, "x yy zzz")).toDF("doc_id", "text")
    val got = TextAnalysis.lexicalDiversity(rows, "doc_id", "text")
      .as[(Long, Long, Long, Double, Double, Double)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4, r._5, r._6)).toMap
    assert(got(0L) == ((3L, 2L, 0.666667, 0.5, 1.0)))
    assert(got(1L) == ((3L, 3L, 1.0, 1.0, 2.0)))
  }

  test("centroidOutliers flags vectors pointing away from their label centroid") {
    // label 0: (1,0), (0,1), (-2,-1) → centroid (-1/3, 0)
    //   cos((1,0))  = -1   → outlier
    //   cos((0,1))  =  0   → not (< 0 is strict)
    //   cos((-2,-1)) = 2/√5 ≈ 0.8944 → not
    // label 1: single vector is its own centroid → cos 1
    val rows = Seq(
      (0L, Seq(1f, 0f), 0), (1L, Seq(0f, 1f), 0), (2L, Seq(-2f, -1f), 0),
      (3L, Seq(5f, 5f), 1)).toDF("vec_id", "embedding", "label")
    val got = Similarity.centroidOutliers(rows, "vec_id", "embedding", "label")
      .as[(Long, Int, Double, Boolean)].collect().map(r => r._1 -> (r._3, r._4)).toMap
    assert(got(0L) == ((-1.0, true)))
    assert(got(1L) == ((0.0, false)))
    assert(got(2L) == ((0.8944, false)))
    assert(got(3L) == ((1.0, false)))
  }

  test("semanticDedup drops planted near-copies, keeps min id, matches exact form") {
    // two tight clusters in R^4 plus one near-copy inside each; distinct
    // members of a cluster are ~0.97 apart in cosine? no: crafted so
    // within-cluster distinct cosines < 0.99 and the copies > 0.999
    val rows = Seq(
      (0L, Seq(1.0, 0.02, 0.0, 0.0)),
      (1L, Seq(1.0, 0.021, 0.0005, 0.0)),   // near-copy of 0
      (2L, Seq(0.9, 0.4, 0.0, 0.1)),        // same cluster, not a dup at 0.999
      (10L, Seq(0.0, 0.0, 1.0, 0.03)),
      (11L, Seq(0.0005, 0.0, 1.0, 0.031)),  // near-copy of 10
      (12L, Seq(0.1, 0.0, 0.9, 0.4))
    ).toDF("vec_id", "embedding")
    val got = Similarity.semanticDedup(rows, "vec_id", "embedding",
        tau = 0.999, nlist = 2)
      .select("vec_id").as[Long].collect().sorted.toSeq
    assert(got == Seq(0L, 2L, 10L, 12L), got.toString)
    // parity with the exact quadratic pair set + survivors composition
    val exact = Dedup.survivors(rows, "vec_id",
      Similarity.nearDupEmbed(rows, "vec_id", "embedding", 0.999))
      .select("vec_id").as[Long].collect().sorted.toSeq
    assert(got == exact)
  }

  test("bm25: hand-computed scores, rarer term outranks common at equal tf") {
    // 4 docs; "rare" appears in 1 doc, "shared" in 3. Equal tf and equal
    // doc length -> the rare-term doc MUST outscore the shared-only docs.
    val rows = Seq(
      (0L, "rare x y z"), (1L, "shared x y z"), (2L, "shared x y z"),
      (3L, "shared x y z")).toDF("doc_id", "text")
    val got = Search.bm25(rows, "doc_id", "text", Seq("rare", "shared"))
      .as[(Long, Double)].collect().toMap
    // every dl = 4 = avgdl -> denominator = tf + k1 = 2.2; tf factor =
    // 1*(2.2)/2.2 = 1.0, so score = idf exactly.
    def idf(df: Double) = math.log(1.0 + (4.0 - df + 0.5) / (df + 0.5))
    def r4(x: Double) = BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got.keySet == Set(0L, 1L, 2L, 3L))
    assert(got(0L) == r4(idf(1.0)) && got(1L) == r4(idf(3.0)), got.toString)
    assert(got(0L) > got(1L))
    // a doc matching no term never appears
    assert(!Search.bm25(rows, "doc_id", "text", Seq("absent"))
      .collect().exists(_ => true))
  }

  test("bm25: longer documents score lower at equal tf (length normalization)") {
    val rows = Seq(
      (0L, "t a b c"),
      (1L, "t a b c d e f g h i j k l m n o p q r s")).toDF("doc_id", "text")
    val got = Search.bm25(rows, "doc_id", "text", Seq("t")).as[(Long, Double)].collect().toMap
    assert(got(0L) > got(1L), got.toString)
  }

  test("collocations: PMI of a perfect pair beats an independent pair; floor filters") {
    // "x y" always adjacent (5 times, only as a pair); "p q" co-occur but p
    // and q also appear apart. minCount=2 keeps both; minCount=6 drops all.
    val rows = Seq(
      (0L, "x y p q"), (1L, "x y q p"), (2L, "x y p q"),
      (3L, "x y q p"), (4L, "x y p q")).toDF("doc_id", "text")
    val got = TextAnalysis.collocations(rows, "text", minCount = 2)
      .as[(String, String, Long, Double)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    assert(got.contains(("x", "y")) && got(("x", "y"))._1 == 5L)
    assert(got.contains(("p", "q")) && got(("p", "q"))._1 == 3L)
    assert(got(("x", "y"))._2 > got(("p", "q"))._2, got.toString)
    assert(TextAnalysis.collocations(rows, "text", minCount = 6).isEmpty)
  }

  test("qualityRules: each gate trips independently and keep is the conjunction") {
    val longDoc = (1 to 60).map(i => s"word$i").mkString(" ") + " the of and is in"
    val rows = Seq(
      (0L, longDoc),                                  // passes everything
      (1L, "the of and is in"),                       // too few words
      (2L, ("the of and " * 22).trim),                // dup_frac too high
      (3L, (1 to 60).map(i => s"w$i").mkString(" "))  // no stopwords
    ).toDF("doc_id", "text")
    val got = Curation.qualityRules(rows, "doc_id", "text")
      .select("doc_id", "ok_words", "ok_word_len", "ok_dup", "ok_stop", "keep")
      .as[(Long, Boolean, Boolean, Boolean, Boolean, Boolean)].collect()
      .map(r => r._1 -> r).toMap
    assert(got(0L)._6, got(0L).toString)                       // keep
    assert(!got(1L)._2 && !got(1L)._6)                         // word floor
    assert(!got(2L)._4 && !got(2L)._6)                         // dup gate
    assert(got(3L)._2 && !got(3L)._5 && !got(3L)._6)           // stopword gate
  }

  test("hashedTfidf: unit vectors of the right dim; duplicates identical, disjoint docs orthogonal-ish") {
    val out = TextAnalysis.hashedTfidf(docs, "doc_id", "text", dim = 32)
      .as[(Long, Seq[Double])].collect().toMap
    assert(out.size == 5 && out.values.forall(_.length == 32))
    // unit norm
    out.values.foreach { v =>
      assert(math.abs(v.map(x => x * x).sum - 1.0) < 1e-9) }
    // exact duplicates (after lower/trim) hash to the same vector — up to
    // 1-ulp norm differences from per-group float summation order
    def close(a: Seq[Double], b: Seq[Double]) =
      a.zip(b).forall { case (x, y) => math.abs(x - y) < 1e-12 }
    assert(close(out(0L), out(2L)) && close(out(0L), out(4L)))
    // cosine(dup pair) = 1; the disjoint-vocab doc scores far lower
    def cos(a: Seq[Double], b: Seq[Double]) = a.zip(b).map { case (x, y) => x * y }.sum
    assert(math.abs(cos(out(0L), out(2L)) - 1.0) < 1e-9)
    assert(cos(out(0L), out(1L)) > 0.8)           // near-dup: 8 of 9 words shared
    assert(cos(out(0L), out(3L)) < 0.1)           // no shared words (modulo bucket collisions)
  }

  test("nearDupPrefix equals the full-index exact join on planted and varied corpora") {
    def pairs(df: DataFrame): Set[(Long, Long)] = df.as[(Long, Long)].collect().toSet
    assert(pairs(Dedup.nearDupPrefix(docs, "doc_id", "text")) ==
      pairs(Dedup.nearDupNgram(docs, "doc_id", "text")))
    // varied corpus: templated families with per-doc unique tails exercise
    // the rarity ordering (unique shingles land in prefixes, family
    // boilerplate sorts to the suffix and never enters the index)
    val varied = (0 until 120).map { i =>
      (i.toLong, s"family${i % 6} shared template body tokens here tail${i} unique${i * 7}")
    }.toDF("doc_id", "text")
    val exact = pairs(Dedup.nearDupNgram(varied, "doc_id", "text", maxDf = 1000000L))
    assert(exact.nonEmpty)
    assert(pairs(Dedup.nearDupPrefix(varied, "doc_id", "text")) == exact)
    // and at a different threshold (prefix length depends on t)
    assert(pairs(Dedup.nearDupPrefix(varied, "doc_id", "text", threshold = 0.8)) ==
      pairs(Dedup.nearDupNgram(varied, "doc_id", "text", threshold = 0.8, maxDf = 1000000L)))
  }

  test("containmentPairs: embedded doc found in its container, asymmetric by construction") {
    val d = Seq(
      (0L, "alpha beta gamma delta epsilon"),
      (1L, "alpha beta gamma delta epsilon and then a very long unrelated continuation of many words"),
      (2L, "totally disjoint vocabulary document")
    ).toDF("doc_id", "text")
    // doc0's 3 shingles all occur in doc1 -> containment(0 in 1) = 1.0;
    // doc1 has 14 shingles, only 3 shared -> containment(1 in 0) = 3/14
    val out = Dedup.containmentPairs(d, "doc_id", "text", threshold = 0.6)
      .as[(Long, Long)].collect().toSet
    assert(out == Set((0L, 1L)))
    // symmetric Jaccard misses the pair entirely at the same bar:
    // 3/(3+14-3) ≈ 0.21
    assert(Dedup.nearDupNgram(d, "doc_id", "text", threshold = 0.6).count() == 0)
  }

  test("novelty: unique-shingle fraction hand-computed, shared shingles count once") {
    val d = Seq(
      (0L, "alpha beta gamma delta"),   // shingles: "a b g", "b g d"
      (1L, "alpha beta gamma other"),   // shares "a b g" with 0
      (2L, "totally unrelated words here")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.novelty(d, "doc_id", "text")
      .as[(Long, Long, Double)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    // docs 0 and 1: 2 shingles each, one shared (df=2) -> novelty 0.5
    assert(out == Map(0L -> ((2L, 0.5)), 1L -> ((2L, 0.5)), 2L -> ((2L, 1.0))), out.toString)
  }

  test("percentileRank: per-group percent_rank, ties share the lower rank") {
    val d = Seq((0L, "a", 1.0), (1L, "a", 3.0), (2L, "a", 3.0), (3L, "a", 9.0),
      (4L, "b", 5.0), (5L, "c", 7.0)).toDF("doc_id", "source", "s")
    val out = Curation.percentileRank(d, "doc_id", "source", col("s"))
      .as[(Long, String, Double, Double)].collect().map(r => r._1 -> r._4).toMap
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // group a (n=4): ranks 1,2,2,4 -> pct 0, 1/3, 1/3, 1
    assert(out == Map(0L -> 0.0, 1L -> r6(1.0 / 3), 2L -> r6(1.0 / 3), 3L -> 1.0,
      4L -> 0.0, 5L -> 0.0), out.toString)
  }

  test("sourceOverlap: hand-computed shingle intersections between sources") {
    val d = Seq(
      (0L, "alpha beta gamma delta", "s1"),   // shingles: ab g, b g d
      (1L, "alpha beta gamma other", "s2"),   // shares 'alpha beta gamma' with s1
      (2L, "totally different text here", "s3")
    ).toDF("doc_id", "text", "source")
    val out = Dedup.sourceOverlap(d, "text", "source")
      .as[(String, String, Long, Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5, r._6))).toMap
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // s1 and s2 each have 2 shingles, share exactly 1; s3 disjoint
    assert(out == Map(("s1", "s2") -> ((1L, 2L, 2L, r6(1.0 / 3)))), out.toString)
  }

  test("ingestGate: each flag fires on its planted case, keep is the conjunction") {
    val filler = "the of and a to in is on for with here now then also more text body words going on and on"
    val ref = Seq(
      (0L, s"reference document one $filler"),
      (1L, s"reference document two quite different $filler wording")
    ).toDF("doc_id", "text")
    val bench = Seq((100L, "secret benchmark question four grams")).toDF("doc_id", "text")
    val newb = Seq(
      (10L, s"REFERENCE DOCUMENT ONE $filler"),                  // exact (case) dup -> also near
      (11L, s"reference document two quite different $filler rewording"), // near-dup only
      (12L, "the of and a to in is on for with secret benchmark question four grams plus plenty own distinct tail"), // contaminated
      (13L, "the of and a to in is on for with fresh novel acceptable content entirely standalone topic matter"),    // keep
      (14L, "short junk")                                         // low quality only
    ).toDF("doc_id", "text")
    val out = Curation.ingestGate(ref, newb, "doc_id", "text", bench, "text")
      .as[(Long, Boolean, Boolean, Boolean, Double, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._6))).toMap
    assert(out(10L) == ((true, true, false, false)), out.toString)
    assert(out(11L) == ((false, true, false, false)), out.toString)
    assert(out(12L) == ((false, false, true, false)), out.toString)
    assert(out(13L) == ((false, false, false, true)), out.toString)
    assert(out(14L) == ((false, false, false, false)), out.toString)
  }

  test("exact index: probe flags only normalized repeats, persists exactly") {
    val ref = Seq((0L, "Hello World"), (1L, "unique reference text here")).toDF("doc_id", "text")
    val probe = Seq(
      (10L, "hello world"),             // case-normalized repeat of 0
      (11L, "HELLO WORLD  "),           // trim+lower normalizes to the same
      (12L, "novel arrival")
    ).toDF("doc_id", "text")
    val idx = Dedup.buildExactIndex(ref, "text")
    val flagged = Dedup.probeExactIndex(idx, probe, "doc_id", "text")
      .as[Long].collect().toSet
    assert(flagged == Set(10L, 11L))
    // persistence round-trip returns the identical flag set
    val dir = java.nio.file.Files.createTempDirectory("exidx").toString
    Dedup.saveExactIndex(idx, dir)
    val again = Dedup.probeExactIndex(Dedup.loadExactIndex(spark, dir), probe, "doc_id", "text")
      .as[Long].collect().toSet
    assert(again == flagged)
  }

  test("survivorsBy keeps the max-score member per cluster, min id on ties") {
    val d = Seq(
      (0L, 0.2), (1L, 0.9), (2L, 0.9),   // cluster {0,1,2}: 1 wins (0.9, tie beats 2 on id)
      (3L, 0.5), (4L, 0.1),              // cluster {3,4}: 3 wins
      (5L, 0.0)                          // unpaired: always survives
    ).toDF("doc_id", "score")
    val pairs = Seq((0L, 1L), (1L, 2L), (3L, 4L)).toDF("a_id", "b_id")
    val out = Dedup.survivorsBy(d, "doc_id", col("score"), pairs)
      .select("doc_id").as[Long].collect().toSet
    assert(out == Set(1L, 3L, 5L))
  }

  test("bigramLogLoss: hand-computed add-one bigram NLL; single-word docs unscored") {
    val d = Seq((0L, "a b a b"), (1L, "a c"), (2L, "solo")).toDF("doc_id", "text")
    // uni: a:3 b:2 c:1 solo:1, V=4; bigrams: (a,b):2 (b,a):1 (a,c):1
    // P(b|a)=(2+1)/(3+4)  P(a|b)=(1+1)/(2+4)  P(c|a)=(1+1)/(3+4)
    val out = TextAnalysis.bigramLogLoss(d, "doc_id", "text")
      .as[(Long, Long, Double)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    def round4(x: Double) = BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val e0 = round4(-(math.log(3.0 / 7) + math.log(2.0 / 6) + math.log(3.0 / 7)) / 3)
    val e1 = round4(-math.log(2.0 / 7))
    assert(out(0L) == ((3L, e0)), out.toString)
    assert(out(1L) == ((1L, e1)), out.toString)
    assert(!out.contains(2L))
  }

  test("rrfFuse: hand-computed reciprocal ranks, single-list docs fuse with one term") {
    val la = Seq((10L, 3.0), (11L, 2.0), (12L, 1.0)).toDF("doc_id", "score")
    val lb = Seq((11L, 9.0), (13L, 8.0)).toDF("doc_id", "score")
    val out = graft.pipeline.Search.rrfFuse(Seq(la, lb), "doc_id", "score")
      .as[(Long, Double, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    def round6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // ranks: la = 10:1, 11:2, 12:3; lb = 11:1, 13:2
    assert(out(10L) == ((round6(1.0 / 61), 1L)))
    assert(out(11L) == ((round6(1.0 / 62 + 1.0 / 61), 2L)))
    assert(out(12L) == ((round6(1.0 / 63), 1L)))
    assert(out(13L) == ((round6(1.0 / 62), 1L)))
    // score ties rank deterministically by id: equal scores -> lower id first
    val tied = Seq((5L, 1.0), (4L, 1.0)).toDF("doc_id", "score")
    val t = graft.pipeline.Search.rrfFuse(Seq(tied), "doc_id", "score")
      .as[(Long, Double, Long)].collect().map(r => r._1 -> r._2).toMap
    assert(t(4L) == round6(1.0 / 61) && t(5L) == round6(1.0 / 62))
  }

  test("dsirWeights: target-like docs score positive, off-target negative, hand-checked ratio") {
    // target slice = docs containing "spark"; the pure-target doc must
    // score positive, the pure-background doc negative
    val d = Seq(
      (0L, "spark spark spark"),
      (1L, "hadoop hadoop hadoop"),
      (2L, "spark hadoop")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.dsirWeights(d, "doc_id", "text",
      isTarget = col("text").contains("spark"), dim = 16)
      .as[(Long, Double)].collect().toMap
    assert(out(0L) > 0, out.toString)
    assert(out(1L) < 0, out.toString)
    // replay the math: target tokens = docs 0,2 -> spark:4, hadoop:1 (T=5);
    // background: spark:4, hadoop:4 (B=8); dim=16, add-one smoothing
    def r(ct: Long, cb: Long) = math.log(((ct + 1.0) / (5 + 16.0)) / ((cb + 1.0) / (8 + 16.0)))
    val expect0 = BigDecimal(3 * r(4, 4)).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out(0L) == expect0, s"${out(0L)} vs $expect0")
    val expect2 = BigDecimal(r(4, 4) + r(1, 4)).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out(2L) == expect2, s"${out(2L)} vs $expect2")
  }
}
