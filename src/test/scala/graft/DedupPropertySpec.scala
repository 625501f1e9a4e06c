package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, rng}

/** Property-based check of the exact n-gram near-dup operator against a
  * brute-force model, including the document-frequency cap's exact-restore
  * path (Dedup.nearDupNgram's skew guard anti-joins corpus-common shingles
  * out of the inverted index and restores their intersection contribution
  * from a per-document common-shingle array).
  *
  * Two regimes per corpus:
  *  - maxDf >= |corpus|: no shingle is capped; output must equal plain
  *    brute-force shingle-Jaccard >= threshold (every qualifying pair
  *    shares a shingle, so the inverted index sees it).
  *  - tiny maxDf: output must equal the DOCUMENTED model — candidates are
  *    pairs sharing at least one RARE (df <= maxDf) shingle, verified with
  *    the FULL exact Jaccard (common shingles restored); pairs whose every
  *    shared shingle is corpus-common are the explicit recall loss.
  *
  * The tiny vocabulary forces heavy shingle sharing so the cap actually
  * fires, and short docs (< n words) exercise the whole-text-shingle
  * fallback. */
class DedupPropertySpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  private val vocab = Vector("ape", "bee", "cat", "dog", "elk", "fox")
  private val genDoc: Gen[String] = for {
    k <- Gen.chooseNum(1, 8)
    ws <- Gen.listOfN(k, Gen.oneOf(vocab))
  } yield ws.mkString(" ")

  private def sample[T](g: Gen[T], n: Int, seed: Long): Seq[T] = {
    var s = rng.Seed(seed)
    (1 to n).map { _ =>
      val r = g.pureApply(Gen.Parameters.default, s)
      s = s.next
      r
    }
  }

  // mirror of Dedup.shingles (distinct word 3-grams, whole-text fallback)
  private def shingleSet(text: String, n: Int = 3): Set[String] = {
    val norm = text.trim.toLowerCase
    val w = norm.split(" ", -1)
    if (w.length >= n) w.sliding(n).map(_.mkString(" ")).toSet
    else Set(norm)
  }

  private def jaccard(a: Set[String], b: Set[String]): Double =
    if (a.isEmpty && b.isEmpty) 0.0
    else a.intersect(b).size.toDouble / a.union(b).size

  /** The documented model: pairs sharing >= 1 rare shingle whose FULL
    * Jaccard clears the threshold. */
  private def model(docs: Seq[(Long, String)], threshold: Double,
                    maxDf: Long): Set[(Long, Long)] = {
    val sh = docs.map { case (id, t) => id -> shingleSet(t) }.toMap
    val df = sh.values.flatten.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val ids = docs.map(_._1).sorted
    (for {
      i <- ids.indices; j <- (i + 1) until ids.length
      a = ids(i); b = ids(j)
      shared = sh(a).intersect(sh(b))
      if shared.exists(s => df(s) <= maxDf)
      if jaccard(sh(a), sh(b)) >= threshold
    } yield (a, b)).toSet
  }

  test("nearDupNgram == brute force (uncapped) and == documented model (capped)") {
    for ((seed, round) <- Seq(7L, 23L, 41L).zipWithIndex) {
      val texts = sample(genDoc, 24, seed)
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      val df = docs.toDF("doc_id", "text")
      for ((maxDf, label) <- Seq(1000L -> "uncapped", 3L -> "capped")) {
        val got = graft.pipeline.Dedup
          .nearDupNgram(df, "doc_id", "text", threshold = 0.4, maxDf = maxDf)
          .as[(Long, Long)].collect().toSet
        val want = model(docs, 0.4, maxDf)
        assert(got == want,
          s"round $round ($label, maxDf=$maxDf): got ${got.size} pairs, want ${want.size}; " +
            s"extra=${(got -- want).take(5)} missing=${(want -- got).take(5)}")
      }
    }
  }

  test("nearDupPrefix == brute force on random corpora at several thresholds") {
    // the prefix filter must lose NOTHING vs plain brute-force Jaccard —
    // no capped-recall class exists for this variant
    for (seed <- Seq(5L, 17L, 37L); threshold <- Seq(0.4, 0.6, 0.8)) {
      val texts = sample(genDoc, 24, seed)
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      val got = graft.pipeline.Dedup
        .nearDupPrefix(docs.toDF("doc_id", "text"), "doc_id", "text", threshold = threshold)
        .as[(Long, Long)].collect().toSet
      val want = model(docs, threshold, Long.MaxValue)
      assert(got == want,
        s"seed $seed t=$threshold: extra=${(got -- want).take(5)} missing=${(want -- got).take(5)}")
    }
  }

  test("containmentPairs == brute-force directional containment model") {
    for (seed <- Seq(13L, 31L)) {
      val texts = sample(genDoc, 24, seed)
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      val sh = docs.map { case (id, t) => id -> shingleSet(t) }.toMap
      val ids = docs.map(_._1)
      val want = (for {
        a <- ids; b <- ids if a != b
        i = sh(a).intersect(sh(b)).size
        if i > 0 && i.toDouble / sh(a).size >= 0.6
      } yield (a, b)).toSet
      val got = graft.pipeline.Dedup
        .containmentPairs(docs.toDF("doc_id", "text"), "doc_id", "text", threshold = 0.6,
          maxDf = 1000000L)
        .as[(Long, Long)].collect().toSet
      assert(got == want,
        s"seed $seed: extra=${(got -- want).take(5)} missing=${(want -- got).take(5)}")
    }
  }

  test("decontaminate == brute-force shingle intersection on random corpora") {
    for (seed <- Seq(11L, 29L)) {
      val texts = sample(genDoc, 30, seed)
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      val (benchDocs, corpusDocs) = docs.partition(_._1 % 5 == 0)
      val benchSh = benchDocs.flatMap(d => shingleSet(d._2, 4)).toSet
      val want = corpusDocs
        .map { case (id, t) => id -> shingleSet(t, 4).count(benchSh) }
        .filter(_._2 >= 1).toMap
      val got = graft.pipeline.Dedup.decontaminate(
          corpusDocs.toDF("doc_id", "text"), "doc_id", "text",
          benchDocs.toDF("doc_id", "text"), "text")
        .as[(Long, Long)].collect().map(r => r._1 -> r._2.toInt).toMap
      assert(got == want, s"seed $seed: extra=${(got.toSet -- want.toSet).take(5)} " +
        s"missing=${(want.toSet -- got.toSet).take(5)}")
    }
  }

  test("capped run restores common-shingle contributions exactly") {
    // two docs that share BOTH a corpus-common shingle and a rare one: the
    // rare shingle makes them a candidate, and the pair only clears the
    // threshold if the common shingle's contribution is restored
    val boiler = "ape bee cat" // shared by everyone -> df-capped
    val docs = Seq(
      (0L, s"$boiler dog elk fox"),   // shingles incl. rare "cat dog elk"...
      (1L, s"$boiler dog elk ape"),   // shares boiler + rare middle with 0
      (2L, s"$boiler fox fox fox"),
      (3L, s"$boiler elk ape bee"),
      (4L, boiler), (5L, boiler), (6L, boiler)) // pure boilerplate
    val df = docs.toDF("doc_id", "text")
    val got = graft.pipeline.Dedup
      .nearDupNgram(df, "doc_id", "text", threshold = 0.5, maxDf = 3L)
      .as[(Long, Long)].collect().toSet
    assert(got == model(docs, 0.5, 3L))
    // sanity: the model itself relies on the restore — pair (0,1) shares
    // rare AND common shingles and sits above 0.4 only with both counted
    val s0 = shingleSet(docs(0)._2); val s1 = shingleSet(docs(1)._2)
    val common = Seq("ape bee cat").toSet
    val rareOnlyJ = (s0.intersect(s1) -- common).size.toDouble / s0.union(s1).size
    assert(jaccard(s0, s1) >= 0.5 && rareOnlyJ < 0.5,
      s"fixture drifted: full=${jaccard(s0, s1)} rareOnly=$rareOnlyJ")
  }

  test("dedupPassages == brute-force passage model on random corpora") {
    // brute-force model: split normalized words into k-chunks, drop chunks
    // whose text occurs in > maxDf distinct docs, rejoin survivors in order
    def model(docs: Seq[(Long, String)], k: Int, maxDf: Int): Map[Long, String] = {
      def passages(t: String): Seq[String] =
        t.trim.toLowerCase.split(" ", -1).grouped(k).map(_.mkString(" ")).toSeq
      val df = docs.flatMap { case (id, t) => passages(t).distinct.map(_ -> id) }
        .groupBy(_._1).view.mapValues(_.map(_._2).distinct.size).toMap
      docs.map { case (id, t) =>
        id -> passages(t).filter(p => df(p) <= maxDf).mkString(" ")
      }.toMap
    }
    for (seed <- Seq(11L, 77L, 443L)) {
      val docs = sample(genDoc, 30, seed).zipWithIndex.map { case (t, i) => (i.toLong, t) }
      for ((k, maxDf) <- Seq((2, 1), (3, 2))) {
        val got = graft.pipeline.Dedup
          .dedupPassages(docs.toDF("doc_id", "text"), "doc_id", "text", k, maxDf.toLong)
          .as[(Long, String)].collect().toMap
        assert(got == model(docs, k, maxDf), s"seed=$seed k=$k maxDf=$maxDf")
      }
    }
  }
}
