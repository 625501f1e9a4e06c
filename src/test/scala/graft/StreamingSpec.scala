package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.EventsStreaming
import graft.streaming.EventsStreaming.{Event, Session}

case class EmbedArrival(vec_id: Long, embedding: Array[Double], ts: java.sql.Timestamp)

/** Structured Streaming event analytics driven through MemoryStream. */
class StreamingSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  private def ts(sec: Long) = new java.sql.Timestamp(sec * 1000)

  test("watermarked hourly aggregation finalizes windows incrementally") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = EventsStreaming.hourlyStream(input.toDF(), "10 minutes")
      .writeStream.format("memory").queryName("hourly_out")
      .outputMode("append").start()
    try {
      input.addData(
        Event(1, ts(100), 1, "click", 1.0),
        Event(2, ts(200), 1, "click", 2.0),
        Event(3, ts(3700), 2, "view", 5.0))
      q.processAllAvailable()
      // advance watermark far past the first hour so its window finalizes
      input.addData(Event(4, ts(20000), 2, "view", 1.0))
      q.processAllAvailable()
      val rows = spark.sql("SELECT event_type, n, sum_value FROM hourly_out").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
      assert(rows.contains(("click", 2L, 3.0)))
    } finally q.stop()
  }

  test("streaming anomaly z-scores finalized windows against a frozen profile") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // reference profile: type a hourly counts [1, 1, 4] -> mu=2, sd=sqrt(3)
    val ref = (Seq((1L, 0L, "a"), (2L, 3600L, "a")) ++
      (0 until 4).map(i => (10L + i, 7200L + i, "a")))
      .map { case (id, sec, t) => (id, sec * 1000000000L, 1L, t, 1.0, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val stats = EventsStreaming.anomalyStats(ref)
    val input = MemoryStream[Event]
    val q = EventsStreaming.anomalyScoreStream(
        EventsStreaming.hourlyStream(input.toDF(), "10 minutes"), stats)
      .writeStream.format("memory").queryName("anom_out")
      .outputMode("append").start()
    try {
      // an hour with 3 'a' events, plus an unknown type, then advance the
      // watermark far enough to finalize the first hour
      input.addData(Event(1, ts(100), 1, "a", 1.0), Event(2, ts(200), 1, "a", 1.0),
        Event(3, ts(300), 1, "a", 1.0), Event(4, ts(400), 1, "zz", 1.0))
      q.processAllAvailable()
      input.addData(Event(9, ts(50000), 1, "a", 1.0))
      q.processAllAvailable()
      val got = spark.sql("SELECT event_type, n, z FROM anom_out")
        .as[(String, Long, Double)].collect().toSet
      def round4(x: Double) = BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(got == Set(("a", 3L, round4(1 / math.sqrt(3)))), got.toString)
    } finally q.stop()
  }

  test("stateful gap sessionization closes sessions on timeout") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = EventsStreaming.sessionizeStream(spark, input.toDS(), gapSec = 60)
      .writeStream.format("memory").queryName("session_out")
      .outputMode("append").start()
    try {
      // user 1: events at 1000s and 1030s (one session); then silence.
      // (timestamps sit well above epoch 0 - an event AT the initial
      // watermark would be dropped as late)
      input.addData(Event(1, ts(1000), 1, "a", 1.0), Event(2, ts(1030), 1, "a", 1.0))
      q.processAllAvailable()
      // another user's much-later events advance the watermark -> timeout fires
      input.addData(Event(3, ts(2000), 2, "a", 1.0))
      q.processAllAvailable()
      input.addData(Event(4, ts(6000), 2, "a", 1.0))
      q.processAllAvailable()
      val sessions = spark.sql("SELECT user_id, start_sec, end_sec, n_events FROM session_out")
        .as[Session].collect()
      assert(sessions.exists(s => s.user_id == 1 && s.start_sec == 1000 && s.end_sec == 1030 && s.n_events == 2))
    } finally q.stop()
  }

  test("streaming funnel advances keyed stage state across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = EventsStreaming.funnelStream(spark, input.toDS(),
        Seq("view", "click", "purchase"))
      .writeStream.format("memory").queryName("funnel_out")
      .outputMode("update").start()
    try {
      // batch 1: user 1 views; user 2 clicks first (wrong stage -> 0)
      input.addData(Event(1, ts(1000), 1, "view", 1.0), Event(2, ts(1000), 2, "click", 1.0))
      q.processAllAvailable()
      // batch 2: user 1 completes click+purchase (in-batch order by ts);
      // user 2 views, but its earlier click is gone -> stays at stage 1
      input.addData(
        Event(3, ts(1010), 1, "click", 1.0), Event(4, ts(1020), 1, "purchase", 1.0),
        Event(5, ts(1010), 2, "view", 1.0))
      q.processAllAvailable()
      val rows = spark.sql("SELECT user_id, stages_completed FROM funnel_out")
        .as[(Long, Int)].collect().toSeq
      // update-mode memory sink accumulates one progress row per touched batch
      val latest = rows.groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
      assert(latest == Map(1L -> 3, 2L -> 1))
      assert(rows.contains((1L, 1)), "batch-1 progress must have been emitted")
    } finally q.stop()
  }

  test("range join runs unchanged as a stream-static join (streaming points)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // timestamp cast to long = epoch seconds; intervals in the same unit
    val intervals = Seq((1L, 900L, 10L, 30L))
      .toDF("user_id", "interval_id", "start", "end")
    val input = MemoryStream[Event]
    val pts = input.toDS().toDF()
      .select($"user_id", $"ts".cast("long").as("ts"), $"event_id")
    val q = graft.pipeline.Events.rangeJoin(pts, "event_id", "ts",
        intervals, "interval_id", "start", "end", "user_id", bin = 7L)
      .writeStream.format("memory").queryName("srange_out")
      .outputMode("append").start()
    try {
      input.addData(Event(100, ts(15), 1, "view", 1.0),  // inside [10, 30)
        Event(101, ts(35), 1, "view", 1.0),              // outside
        Event(102, ts(15), 2, "view", 1.0))              // wrong user
      q.processAllAvailable()
      val rows = spark.sql("SELECT event_id, interval_id FROM srange_out")
        .as[(Long, Long)].collect().toSeq
      assert(rows == Seq((100L, 900L)))
    } finally q.stop()
  }

  test("streaming exact dedup suppresses normalized repeats within the horizon") {
    import spark.implicits._
    import graft.streaming.DedupStreaming
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[DedupStreaming.Doc]
    val q = DedupStreaming.exactStream(input.toDF(), "text", "ts")
      .writeStream.format("memory").queryName("sdedup_out")
      .outputMode("append").start()
    try {
      input.addData(
        DedupStreaming.Doc(1, "hello world", ts(1000)),
        DedupStreaming.Doc(3, "unrelated text", ts(1010)))
      q.processAllAvailable()
      // later batch: a case/whitespace variant of doc 1 must be suppressed
      input.addData(DedupStreaming.Doc(2, "  Hello World", ts(1020)))
      q.processAllAvailable()
      val ids = spark.sql("SELECT doc_id FROM sdedup_out").as[Long].collect().toSet
      assert(ids == Set(1L, 3L))
    } finally q.stop()
  }

  test("streaming near-dup flags arrivals against a static corpus index") {
    import spark.implicits._
    import graft.streaming.DedupStreaming
    implicit val sqlCtx = spark.sqlContext
    val corpus = Seq(
      (0L, "the quick brown fox jumps over the lazy dog"),
      (1L, "the quick brown fox jumps over the lazy cat"),
      (2L, "THE QUICK BROWN FOX JUMPS OVER THE LAZY DOG"),
      (3L, "completely different words entirely unrelated text here now")
    ).toDF("doc_id", "text")
    val index = DedupStreaming.corpusIndex(corpus, "doc_id", "text")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val input = MemoryStream[DedupStreaming.Doc]
    val q = DedupStreaming.nearDupAgainstCorpus(
        input.toDF(), "doc_id", "text", "ts", index)
      .writeStream.format("memory").queryName("sneardup_out")
      .outputMode("append").start()
    try {
      input.addData(
        DedupStreaming.Doc(100, "the quick brown fox jumps over the lazy dog", ts(1000)),
        DedupStreaming.Doc(101, "nothing in common with anything here at all", ts(1001)))
      q.processAllAvailable()
      val rows = spark.sql("SELECT doc_id, dup_of, jaccard FROM sneardup_out").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      assert(rows.forall(_._1 == 100L)) // 101 matches nothing
      assert(rows.map(_._2).toSet == Set(0L, 1L, 2L)) // exact, last-word variant, case variant
      assert(rows.filter(r => r._2 == 0L || r._2 == 2L).forall(_._3 == 1.0))
    } finally {
      q.stop(); index.unpersist()
    }
  }

  test("streaming decontamination flags arrivals overlapping the benchmark") {
    import spark.implicits._
    import graft.streaming.DedupStreaming
    implicit val sqlCtx = spark.sqlContext
    val bench = Seq((0L, "alpha beta gamma delta epsilon")).toDF("doc_id", "text")
    val index = DedupStreaming.benchmarkIndex(bench, "text").persist()
    val input = MemoryStream[DedupStreaming.Doc]
    val q = DedupStreaming.contaminatedStream(
        input.toDF(), "doc_id", "text", "ts", index)
      .writeStream.format("memory").queryName("sdecon_out")
      .outputMode("append").start()
    try {
      input.addData(
        DedupStreaming.Doc(10, "prefix alpha beta gamma delta epsilon suffix", ts(1000)),
        DedupStreaming.Doc(11, "alpha beta unrelated gamma delta epsilon no window", ts(1001)),
        DedupStreaming.Doc(12, "nothing shared with the benchmark here at all", ts(1002)))
      q.processAllAvailable()
      val rows = spark.sql("SELECT doc_id FROM sdecon_out").as[Long].collect().toSeq
      assert(rows == Seq(10L)) // one row despite doc 10 sharing two 4-gram windows
    } finally {
      q.stop(); index.unpersist()
    }
  }

  test("streaming bloom decontamination flags the same arrivals join-free") {
    import spark.implicits._
    import graft.streaming.DedupStreaming
    implicit val sqlCtx = spark.sqlContext
    val bench = Seq((0L, "alpha beta gamma delta epsilon")).toDF("doc_id", "text")
    val bloom = graft.pipeline.Dedup.benchmarkBloom(bench, "text")
    val input = MemoryStream[DedupStreaming.Doc]
    val q = DedupStreaming.contaminatedStreamBloom(
        input.toDF(), "doc_id", "text", "ts", bloom)
      .writeStream.format("memory").queryName("sbloom_out")
      .outputMode("append").start()
    try {
      input.addData(
        DedupStreaming.Doc(10, "prefix alpha beta gamma delta epsilon suffix", ts(1000)),
        DedupStreaming.Doc(12, "nothing shared with the benchmark here at all", ts(1002)))
      q.processAllAvailable()
      val rows = spark.sql("SELECT doc_id FROM sbloom_out").as[Long].collect().toSeq
      assert(rows == Seq(10L))
    } finally q.stop()
  }

  test("streaming source priors accumulate Welford state across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String, String)]
    val q = graft.streaming.CurationStreaming.sourcePriorsStream(
        spark, input.toDF().toDF("doc_id", "text", "source"),
        "doc_id", "text", "source")
      .writeStream.format("memory").queryName("priors_out")
      .outputMode("append").start()
    try {
      input.addData((1L, "the the the the", "b"))
      q.processAllAvailable()
      input.addData((2L, "zz zz zz zz", "b"))
      q.processAllAvailable()
      val rows = spark.sql("SELECT id, quality, src_n, src_mean, src_z FROM priors_out")
        .collect().map(r => r.getString(0) ->
          (r.getDouble(1), r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
      // first arrival: stats are itself — sd 0, z pinned to 0
      val (q1, n1, m1, z1) = rows("1")
      assert(n1 == 1L && m1 == q1 && z1 == 0.0)
      // second arrival updates the running mean; z against both-so-far
      val (q2, n2, m2, z2) = rows("2")
      assert(n2 == 2L)
      assert(math.abs(m2 - (q1 + q2) / 2) < 1e-6)
      assert(z2 == -1.0) // two distinct values → population z = ±1
      // final per-source stats equal the batch op's
      val batch = graft.pipeline.Curation.sourcePriors(
          Seq((1L, "the the the the", "b"), (2L, "zz zz zz zz", "b"))
            .toDF("doc_id", "text", "source"), "doc_id", "text", "source")
        .select("src_n", "src_mean").distinct().as[(Long, Double)].collect().head
      assert(batch == ((n2, m2)))
    } finally q.stop()
  }

  test("streaming curation dedups, tags, and gates arrivals") {
    import spark.implicits._
    import graft.streaming.{CurationStreaming, DedupStreaming}
    implicit val sqlCtx = spark.sqlContext
    val good = "the quick brown fox jumps over the lazy dog again and again today"
    val input = MemoryStream[DedupStreaming.Doc]
    val q = CurationStreaming.curateStream(input.toDF(), "doc_id", "text", "ts")
      .writeStream.format("memory").queryName("scurate_out")
      .outputMode("append").start()
    try {
      input.addData(
        DedupStreaming.Doc(1, good, ts(1000)),
        DedupStreaming.Doc(2, "too short", ts(1001)),          // token gate
        DedupStreaming.Doc(3, "%%% ### !!! *** %%% ### !!! *** %%% ### !!!", ts(1002))) // quality gate
      q.processAllAvailable()
      input.addData(DedupStreaming.Doc(4, "  " + good.toUpperCase, ts(1010))) // dup of 1
      q.processAllAvailable()
      val rows = spark.sql("SELECT doc_id, lang_pred FROM scurate_out").collect()
        .map(r => (r.getLong(0), r.getString(1)))
      assert(rows.map(_._1).toSet == Set(1L))
      assert(rows.head._2 == "en")
    } finally q.stop()
  }

  test("streaming embedding near-dup flags arrivals against a static index") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    import graft.streaming.SimilarityStreaming
    implicit val sqlCtx = spark.sqlContext
    // static corpus: two well-separated directions in R^8
    val corpus = Seq(
      (100L, Array.tabulate(8)(j => math.cos(j * 0.5))),
      (200L, Array.tabulate(8)(j => math.sin(j * 0.9) - 0.5))).toDF("vec_id", "embedding")
    val index = SimilarityStreaming.embedIndex(corpus, "vec_id", "embedding", bits = 6, dim = 8)
      .persist()
    index.count()
    val input = MemoryStream[EmbedArrival]
    val q = SimilarityStreaming.nearDupEmbedStream(
        input.toDF(), "vec_id", "embedding", "ts", index, tau = 0.95, bits = 6, dim = 8)
      .writeStream.format("memory").queryName("semb_out")
      .outputMode("append").start()
    try {
      input.addData(
        // near-copy of corpus vector 100 (tiny perturbation)
        EmbedArrival(1, Array.tabulate(8)(j => math.cos(j * 0.5) + 0.004 * j), ts(1000)),
        // unrelated direction: must not be flagged
        EmbedArrival(2, Array.tabulate(8)(j => if (j % 2 == 0) 1.0 else -1.0), ts(1001)))
      q.processAllAvailable()
      val rows = spark.sql("SELECT vec_id, dup_of FROM semb_out")
        .as[(Long, Long)].collect().toSeq
      assert(rows == Seq((1L, 100L)), s"got $rows")
    } finally { q.stop(); index.unpersist() }
  }

  test("chunking and redaction apply to a stream unchanged (stateless ops)") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, concat, lit}
    import graft.pipeline.TextAnalysis
    import graft.streaming.DedupStreaming
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[DedupStreaming.Doc]
    // both are pure per-row transforms, so the BATCH operator runs on the
    // micro-batch plan as-is — no watermark, no state, append mode
    val q = TextAnalysis.chunk(
        input.toDF().withColumn("text",
          concat(col("text"), lit(" ping 123456789 or user7@ex.org"))),
        "doc_id", "text", size = 4, overlap = 1)
      .withColumn("chunk_text", TextAnalysis.redact(col("chunk_text")))
      .writeStream.format("memory").queryName("schunk_out")
      .outputMode("append").start()
    try {
      input.addData(DedupStreaming.Doc(1, "a b c d e", ts(1000)))
      q.processAllAvailable()
      val rows = spark.sql("SELECT chunk_id, chunk_text FROM schunk_out ORDER BY chunk_id")
        .as[(Long, String)].collect().toSeq
      // 9 tokens, size 4 stride 3: chunks at 0,3,6 — redaction fires inside
      assert(rows == Seq((0L, "a b c d"), (1L, "d e ping <ID>"), (2L, "<ID> or <EMAIL>")))
    } finally q.stop()
  }

  test("streaming bm25 scores arrivals against frozen corpus stats, batch-equal") {
    import spark.implicits._
    import graft.streaming.{DedupStreaming, SearchStreaming}
    implicit val sqlCtx = spark.sqlContext
    val corpus = Seq(
      (0L, "rare x y z"), (1L, "shared x y z"), (2L, "shared x y z"),
      (3L, "shared x y z")).toDF("doc_id", "text")
    val terms = Seq("rare", "shared")
    val (idf, avgdl) = SearchStreaming.bm25Stats(corpus, "doc_id", "text", terms)
    val input = MemoryStream[DedupStreaming.Doc]
    val q = SearchStreaming.bm25ScoreStream(input.toDF(), "doc_id", "text", idf, avgdl)
      .writeStream.format("memory").queryName("sbm25_out")
      .outputMode("append").start()
    try {
      // re-stream the corpus docs themselves plus a no-match arrival:
      // scores must equal the batch operator's on identical stats
      input.addData(
        DedupStreaming.Doc(0, "rare x y z", ts(1000)),
        DedupStreaming.Doc(1, "shared x y z", ts(1001)),
        DedupStreaming.Doc(9, "nothing matches here ok", ts(1002)))
      q.processAllAvailable()
      val got = spark.sql("SELECT doc_id, score FROM sbm25_out")
        .as[(Long, Double)].collect().toMap
      val batch = graft.pipeline.Search.bm25(corpus, "doc_id", "text", terms)
        .as[(Long, Double)].collect().toMap
      assert(got.keySet == Set(0L, 1L)) // 9 matches no term
      assert(got(0L) == batch(0L) && got(1L) == batch(1L), s"$got vs $batch")
    } finally q.stop()
  }

  test("streaming ingest gate: exact/contamination/quality flags match the batch gate") {
    import spark.implicits._
    import graft.streaming.{CurationStreaming, DedupStreaming}
    import graft.pipeline.Dedup
    implicit val sqlCtx = spark.sqlContext
    val filler = "the of and a to in is on for with more body text going here now again and again still"
    val ref = Seq((0L, s"reference document alpha $filler")).toDF("doc_id", "text")
    val bench = Seq((9L, "secret benchmark question four grams")).toDF("doc_id", "text")
    val exIdx = Dedup.buildExactIndex(ref, "text")
    val bloom = Dedup.benchmarkBloom(bench, "text")
    val input = MemoryStream[DedupStreaming.Doc]
    val q = CurationStreaming.ingestStream(input.toDF(), "doc_id", "text", "ts", exIdx, bloom)
      .writeStream.format("memory").queryName("ing_out")
      .outputMode("append").start()
    try {
      input.addData(
        DedupStreaming.Doc(10, s"REFERENCE document alpha $filler", ts(1000)),  // exact dup
        DedupStreaming.Doc(11, s"the of and a to in is on for with secret benchmark question four grams own tail", ts(1001)), // contaminated
        DedupStreaming.Doc(12, s"the of and a to in is on for with fresh novel standalone topic matter entirely", ts(1002)), // keep
        DedupStreaming.Doc(13, "short junk", ts(1003)))                          // low quality
      q.processAllAvailable()
      val got = spark.sql("SELECT doc_id, exact_dup, contaminated, keep FROM ing_out")
        .as[(Long, Boolean, Boolean, Boolean)].collect()
        .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
      assert(got(10L) == ((true, false, false)), got.toString)
      assert(got(11L) == ((false, true, false)), got.toString)
      assert(got(12L) == ((false, false, true)), got.toString)
      assert(got(13L) == ((false, false, false)), got.toString)
    } finally q.stop()
  }

  test("streaming bigram-LM NLL equals the batch scorer within the model caps") {
    import spark.implicits._
    import graft.streaming.{CurationStreaming, DedupStreaming}
    implicit val sqlCtx = spark.sqlContext
    val corpus = Seq(
      (0L, "a b a b"), (1L, "a c"), (2L, "b c a b")).toDF("doc_id", "text")
    val lm = CurationStreaming.bigramLmStats(corpus, "text")
    val input = MemoryStream[DedupStreaming.Doc]
    val q = CurationStreaming.nllScoreStream(input.toDF(), "doc_id", "text", lm)
      .writeStream.format("memory").queryName("slm_out")
      .outputMode("append").start()
    try {
      input.addData(
        DedupStreaming.Doc(0, "a b a b", ts(1000)),
        DedupStreaming.Doc(1, "a c", ts(1001)),
        DedupStreaming.Doc(7, "solo", ts(1002)),          // < 2 words: dropped
        DedupStreaming.Doc(8, "zz qq", ts(1003)))         // fully out-of-model
      q.processAllAvailable()
      val got = spark.sql("SELECT doc_id, n_bigrams, nll FROM slm_out")
        .as[(Long, Long, Double)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
      val batch = graft.pipeline.TextAnalysis.bigramLogLoss(corpus, "doc_id", "text")
        .as[(Long, Long, Double)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
      assert(got(0L) == batch(0L) && got(1L) == batch(1L), s"$got vs $batch")
      assert(!got.contains(7L))
      // unseen bigram of unseen words: −ln(1/V) with V=3 vocab words (a,b,c)
      def round4(x: Double) = BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(got(8L) == ((1L, round4(-math.log(1.0 / 3)))), got.toString)
    } finally q.stop()
  }

  test("quality rule gates run unchanged on a stream (stateless conjunction)") {
    import spark.implicits._
    import graft.pipeline.Curation
    import graft.streaming.DedupStreaming
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[DedupStreaming.Doc]
    val q = Curation.qualityRules(input.toDF(), "doc_id", "text")
      .writeStream.format("memory").queryName("srules_out")
      .outputMode("append").start()
    try {
      val good = (1 to 60).map(i => s"word$i").mkString(" ") + " the of and is in"
      input.addData(
        DedupStreaming.Doc(1, good, ts(1000)),
        DedupStreaming.Doc(2, "too short", ts(1001)))
      q.processAllAvailable()
      val got = spark.sql("SELECT doc_id, keep FROM srules_out")
        .as[(Long, Boolean)].collect().toMap
      assert(got == Map(1L -> true, 2L -> false), got.toString)
    } finally q.stop()
  }

  test("streaming passage scrub rewrites arrivals against the static boilerplate set") {
    import spark.implicits._
    import graft.streaming.DedupStreaming
    implicit val sqlCtx = spark.sqlContext
    // corpus where "a b" (df 3) and "c d" (df 2) are boilerplate at k=2
    val corpus = Seq((0L, "a b c d e f"), (1L, "a b c d x y"), (2L, "a b q r"))
      .toDF("doc_id", "text")
    val index = graft.pipeline.Dedup.commonPassages(corpus, "doc_id", "text", k = 2, maxDf = 1L)
    val input = MemoryStream[DedupStreaming.Doc]
    val q = DedupStreaming.scrubStream(input.toDF(), "doc_id", "text", index, k = 2)
      .writeStream.format("memory").queryName("sscrub_out")
      .outputMode("append").start()
    try {
      input.addData(
        DedupStreaming.Doc(100, "a b fresh words", ts(1000)),   // leading boilerplate dropped
        DedupStreaming.Doc(101, "c d", ts(1001)),               // all boilerplate -> empty
        DedupStreaming.Doc(102, "nothing shared here", ts(1002)))
      q.processAllAvailable()
      val rows = spark.sql("SELECT doc_id, text FROM sscrub_out ORDER BY doc_id")
        .as[(Long, String)].collect().toSeq
      assert(rows == Seq((100L, "fresh words"), (101L, ""), (102L, "nothing shared here")))
    } finally q.stop()
  }

  test("mixture upsampling runs unchanged on a stream (pure narrow map)") {
    import spark.implicits._
    import graft.streaming.DedupStreaming
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[DedupStreaming.Doc]
    // weight 3.0 on every doc (no fractional part -> no md5 dependence)
    val q = graft.pipeline.Curation.mix(
        input.toDF().withColumn("source",
          org.apache.spark.sql.functions.lit("s")), "doc_id", "source", Map("s" -> 3.0))
      .writeStream.format("memory").queryName("smix_out")
      .outputMode("append").start()
    try {
      input.addData(DedupStreaming.Doc(7, "whatever", ts(1000)))
      q.processAllAvailable()
      val rows = spark.sql("SELECT doc_id, copy FROM smix_out ORDER BY copy")
        .as[(Long, Long)].collect().toSeq
      assert(rows == Seq((7L, 0L), (7L, 1L), (7L, 2L)))
    } finally q.stop()
  }

  test("streaming graph ingest upserts micro-batches through touched-partition rewrites") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    import graft.streaming.GraphIngestStreaming
    import graft.streaming.GraphIngestStreaming.VertexEvent
    implicit val sqlCtx = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("graft-sink").toString
    val cat = new graft.model.Catalog(spark, root)
    // pre-existing INDEXED graph: per-batch upserts must keep the
    // physical field index correct (touched labels relayout per batch)
    val v0 = Seq(("p1", "P", """{"name":"a"}"""), ("q1", "Qq", """{"name":"z"}"""))
      .toDF("gid", "label", "data")
    val e0 = Seq.empty[(String, String, String, String, String)]
      .toDF("gid", "label", "from", "to", "data")
    cat.createGraph("sg", graft.model.GraphFrame(v0, e0))
    cat.addIndex("sg", "P", "name")
    val input = MemoryStream[VertexEvent]
    val q = input.toDF().writeStream
      .foreachBatch(GraphIngestStreaming.vertexUpserts(cat, "sg"))
      .start()
    try {
      input.addData(VertexEvent("p2", "P", """{"name":"b"}"""))
      q.processAllAvailable()
      // second batch: new row + an overwrite of batch-1's row
      input.addData(
        VertexEvent("p3", "P", """{"name":"b"}"""),
        VertexEvent("p2", "P", """{"name":"c"}"""))
      q.processAllAvailable()
      val g = cat.graph("sg")
      assert(g.vertices.count() == 4)
      // the indexed predicate answers the post-stream truth (the index
      // was rebuilt per batch, not left stale over the rewritten label)
      val out = graft.compiler.Traversal.run(spark, g,
        gripql.Query().V().hasLabel("P").has(gripql.P.eq_("name", "b")))
        .select("gid").collect().map(_.getString(0)).toSet
      assert(out == Set("p3"), out.toString)
      val plan = graft.compiler.Traversal.run(spark, g,
        gripql.Query().V().hasLabel("P").has(gripql.P.eq_("name", "b")))
        .queryExecution.executedPlan.toString
      assert(plan.contains("__idx_name"), plan)
      // untouched label survived every batch untouched
      assert(g.vertices.filter(col("label") === "Qq").count() == 1)
    } finally q.stop()
  }
}
