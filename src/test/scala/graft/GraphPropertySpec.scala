package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.model.{GraphAlgos, GraphFrame}

/** Property-based checks of the peel/wedge graph algorithms against
  * driver-local reference implementations on seeded random graphs —
  * the distributed loop shapes (per-round anti-joins, wedge joins) must
  * agree with the obvious sequential algorithm on every instance, not
  * just the hand-traced fixtures. */
class GraphPropertySpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  /** Deterministic random undirected edge set on n vertices. */
  private def randomEdges(n: Int, m: Int, seed: Long): Set[(String, String)] = {
    val r = new scala.util.Random(seed)
    (1 to m).flatMap { _ =>
      val a = s"v${r.nextInt(n)}"; val b = s"v${r.nextInt(n)}"
      // canonicalize on STRING order — the engine's least/greatest over
      // gids — so the reference's adjacency lookups use the same key
      if (a == b) None
      else Some((if (a < b) a else b, if (a < b) b else a))
    }.toSet
  }

  private def frame(n: Int, edges: Set[(String, String)]): GraphFrame = {
    val v = (0 until n).map(i => (s"v$i", "n", "{}")).toDF("gid", "label", "data")
    val e = edges.toSeq.zipWithIndex
      .map { case ((a, b), i) => (s"e$i", "link", a, b, "{}") }
      .toDF("gid", "label", "from", "to", "data")
    GraphFrame(v, e)
  }

  /** Reference k-core: sequential peel to fixpoint. */
  private def refKCore(edges: Set[(String, String)], k: Int): Map[String, Int] = {
    var es = edges
    var changed = true
    while (changed) {
      val deg = es.toSeq.flatMap { case (a, b) => Seq(a, b) }
        .groupBy(identity).map { case (v, xs) => v -> xs.size }
      val bad = deg.filter(_._2 < k).keySet
      changed = bad.nonEmpty
      es = es.filterNot { case (a, b) => bad(a) || bad(b) }
    }
    es.toSeq.flatMap { case (a, b) => Seq(a, b) }
      .groupBy(identity).map { case (v, xs) => v -> xs.size }
  }

  /** Reference link prediction: brute-force neighbor-set Jaccard on
    * non-adjacent pairs with >= 1 common neighbor. */
  private def refLinkPred(edges: Set[(String, String)]): Map[(String, String), (Long, Double)] = {
    val nbrs = edges.toSeq.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).map { case (v, xs) => v -> xs.map(_._2).toSet }
    val verts = nbrs.keys.toSeq.sorted
    (for {
      a <- verts; b <- verts if a < b
      if !edges((if (a < b) a else b, if (a < b) b else a))
      common = (nbrs(a) & nbrs(b)).size if common > 0
    } yield {
      val score = common.toDouble / (nbrs(a).size + nbrs(b).size - common)
      (a, b) -> (common.toLong,
        BigDecimal(score).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }).toMap
  }

  test("kCore equals the sequential peel on random graphs, several k") {
    for (seed <- 1L to 4L; k <- Seq(2, 3)) {
      val edges = randomEdges(14, 22, seed)
      val got = GraphAlgos.kCore(frame(14, edges), "link", k)
        .as[(String, Long)].collect().toMap
      val want = refKCore(edges, k).map { case (v, d) => v -> d.toLong }
      assert(got == want, s"seed=$seed k=$k got=$got want=$want edges=$edges")
    }
  }

  test("linkPredictJaccard equals brute force on random graphs") {
    for (seed <- 1L to 4L) {
      val edges = randomEdges(12, 18, seed)
      val got = GraphAlgos.linkPredictJaccard(frame(12, edges), "link")
        .as[(String, String, Long, Double)].collect()
        .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
      assert(got == refLinkPred(edges), s"seed=$seed got=$got edges=$edges")
    }
  }
}
