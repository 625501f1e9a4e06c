package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.model.{GraphAlgos, GraphFrame}

class GraphAlgosSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  test("degree histogram buckets per-vertex counts, zero-degree included") {
    // a has 2 out "knows", b has 1, c has 0; d is a different label;
    // the "likes" edge must not count
    val v = Seq(
      ("a", "person", "{}"), ("b", "person", "{}"), ("c", "person", "{}"),
      ("d", "robot", "{}")
    ).toDF("gid", "label", "data")
    val e = Seq(
      ("e1", "knows", "a", "b", "{}"), ("e2", "knows", "a", "c", "{}"),
      ("e3", "knows", "b", "c", "{}"), ("e4", "likes", "c", "a", "{}"),
      ("e5", "knows", "d", "a", "{}")
    ).toDF("gid", "label", "from", "to", "data")
    val g = GraphFrame(v, e)
    val out = GraphAlgos.degreeHistogram(g, "person", "knows", "out")
      .as[(Long, Long)].collect().toMap
    assert(out == Map(2L -> 1L, 1L -> 1L, 0L -> 1L))
    // in-degree: a<-d(1), b<-a(1), c<-a,b(2)
    val in = GraphAlgos.degreeHistogram(g, "person", "knows", "in")
      .as[(Long, Long)].collect().toMap
    assert(in == Map(1L -> 2L, 2L -> 1L))
  }

  test("bfs: hop distances, undirected expansion, maxHops cutoff") {
    // chain a-b-c-d plus branch b-e; f unreachable; edges stored one way
    val v = Seq("a", "b", "c", "d", "e", "f").map(g => (g, "n", "{}")).toDF("gid", "label", "data")
    val e = Seq(("e1", "link", "a", "b", "{}"), ("e2", "link", "c", "b", "{}"),
      ("e3", "link", "c", "d", "{}"), ("e4", "link", "b", "e", "{}"))
      .toDF("gid", "label", "from", "to", "data")
    val g = GraphFrame(v, e)
    val seeds = Seq("a").toDF("gid")
    val got = GraphAlgos.bfs(g, "link", seeds)
      .as[(String, Long)].collect().toMap
    assert(got == Map("a" -> 0L, "b" -> 1L, "c" -> 2L, "e" -> 2L, "d" -> 3L))
    // cutoff: with maxHops = 1 only the first ring appears
    val cut = GraphAlgos.bfs(g, "link", seeds, maxHops = 1)
      .as[(String, Long)].collect().toMap
    assert(cut == Map("a" -> 0L, "b" -> 1L))
  }

  test("betweenness (Brandes sampled): path and diamond hand-computed, multi-seed sums") {
    // path a-b-c-d from seed a: pairs (a,c) cross b, (a,d) cross b and c
    // → δ(b)=2, δ(c)=1, δ(d)=0
    val pv = Seq("a", "b", "c", "d").map(g => (g, "n", "{}")).toDF("gid", "label", "data")
    val pe = Seq(("e1", "link", "a", "b", "{}"), ("e2", "link", "b", "c", "{}"),
      ("e3", "link", "c", "d", "{}")).toDF("gid", "label", "from", "to", "data")
    val path = GraphAlgos.betweennessSampled(GraphFrame(pv, pe), "link", Seq("a").toDF("gid"))
      .as[(String, Double)].collect().toMap
    assert(path == Map("b" -> 2.0, "c" -> 1.0, "d" -> 0.0))
    // diamond a-b-d, a-c-d: two shortest a→d paths split the dependency
    // (σ(d)=2, δ(b)=δ(c)=1/2·(1+0)=0.5); with both end seeds the middles sum
    val dv = Seq("a", "b", "c", "d").map(g => (g, "n", "{}")).toDF("gid", "label", "data")
    val de = Seq(("e1", "link", "a", "b", "{}"), ("e2", "link", "a", "c", "{}"),
      ("e3", "link", "b", "d", "{}"), ("e4", "link", "c", "d", "{}"))
      .toDF("gid", "label", "from", "to", "data")
    val dg = GraphFrame(dv, de)
    val one = GraphAlgos.betweennessSampled(dg, "link", Seq("a").toDF("gid"))
      .as[(String, Double)].collect().toMap
    assert(one == Map("b" -> 0.5, "c" -> 0.5, "d" -> 0.0))
    val two = GraphAlgos.betweennessSampled(dg, "link", Seq("a", "d").toDF("gid"))
      .as[(String, Double)].collect().toMap
    assert(two == Map("a" -> 0.0, "b" -> 1.0, "c" -> 1.0, "d" -> 0.0))
    // horizon truncation: maxHops=1 sees no layer-2 successors → all zeros
    val cut = GraphAlgos.betweennessSampled(dg, "link", Seq("a").toDF("gid"), maxHops = 1)
      .as[(String, Double)].collect().toMap
    assert(cut == Map("b" -> 0.0, "c" -> 0.0))
  }

  test("closeness: per-seed distances, isolated seed zeros, hop cutoff") {
    // chain a-b-c-d plus branch b-e; f isolated
    val v = Seq("a", "b", "c", "d", "e", "f").map(g => (g, "n", "{}")).toDF("gid", "label", "data")
    val e = Seq(("e1", "link", "a", "b", "{}"), ("e2", "link", "c", "b", "{}"),
      ("e3", "link", "c", "d", "{}"), ("e4", "link", "b", "e", "{}"))
      .toDF("gid", "label", "from", "to", "data")
    val g = GraphFrame(v, e)
    val out = GraphAlgos.closenessCentrality(g, "link", Seq("a", "b", "f").toDF("gid"))
      .as[(String, Long, Long, Double, Double)].collect().map(r => r._1 -> r).toMap
    // from a: b=1, c=2, e=2, d=3 → n=4, T=8, closeness=0.5, harmonic=1+0.5+0.5+1.0/3
    assert(out("a") == (("a", 4L, 8L, 0.5, math.rint((1.0 + 0.5 + 0.5 + 1.0 / 3) * 1e6) / 1e6)))
    // from b: a=1, c=1, e=1, d=2 → n=4, T=5
    assert(out("b") == (("b", 4L, 5L, 0.8, 3.5)))
    // isolated seed: zero row, not a dropped row
    assert(out("f") == (("f", 0L, 0L, 0.0, 0.0)))
    // hop cutoff: from a with maxHops=2, d is out of range → n=3, T=5
    val cut = GraphAlgos.closenessCentrality(g, "link", Seq("a").toDF("gid"), maxHops = 2)
      .as[(String, Long, Long, Double, Double)].collect().head
    assert(cut == (("a", 3L, 5L, 0.6, 2.0)))
    // eccentricity over the same labeled BFS: a's farthest reach is d at 3;
    // isolated f stays a zero row
    val ecc = GraphAlgos.eccentricity(g, "link", Seq("a", "b", "f").toDF("gid"))
      .as[(String, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(ecc("a") == ((4L, 3L)))
    assert(ecc("b") == ((4L, 2L)))
    assert(ecc("f") == ((0L, 0L)))
  }

  test("connected components: string min representative, singletons included") {
    // chain x10-x2-x9 must key on the STRING min "x10" (not numeric 2);
    // y1-y2 a second component; z is isolated -> its own component;
    // the "other" edge label must not connect w1-w2
    val v = Seq("x10", "x2", "x9", "y1", "y2", "z", "w1", "w2")
      .map(g => (g, "n", "{}")).toDF("gid", "label", "data")
    val e = Seq(
      ("e1", "link", "x10", "x2", "{}"), ("e2", "link", "x2", "x9", "{}"),
      ("e3", "link", "y1", "y2", "{}"),
      ("e4", "other", "w1", "w2", "{}")
    ).toDF("gid", "label", "from", "to", "data")
    val got = GraphAlgos.connectedComponents(GraphFrame(v, e), "link")
      .as[(String, String)].collect().toMap
    assert(got == Map(
      "x10" -> "x10", "x2" -> "x10", "x9" -> "x10",
      "y1" -> "y1", "y2" -> "y1",
      "z" -> "z", "w1" -> "w1", "w2" -> "w2"))
  }

  /** Driver-local power iteration with the same dangling handling — the
    * oracle for the distributed pageRank at identical iteration counts. */
  private def refPageRank(vertices: Seq[String], edges: Seq[(String, String)],
                          iters: Int, d: Double): Map[String, Double] = {
    val n = vertices.size
    val out = edges.groupBy(_._1).view.mapValues(_.size.toDouble).toMap
    var r = vertices.map(_ -> 1.0 / n).toMap
    for (_ <- 1 to iters) {
      val dangling = vertices.filterNot(out.contains).map(r).sum
      val contrib = scala.collection.mutable.Map[String, Double]().withDefaultValue(0.0)
      for ((u, v) <- edges) contrib(v) += r(u) / out(u)
      r = vertices.map(v => v -> ((1 - d) / n + d * (contrib(v) + dangling / n))).toMap
    }
    r
  }

  test("pageRank matches driver-local power iteration, dangling mass included") {
    val vs = Seq("a", "b", "c", "d")
    val es = Seq(("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"), ("b", "d"))
    val v = vs.map(g => (g, "n", "{}")).toDF("gid", "label", "data")
    val e = es.zipWithIndex.map { case ((f, t), i) => (s"e$i", "link", f, t, "{}") }
      .toDF("gid", "label", "from", "to", "data")
    val got = GraphAlgos.pageRank(GraphFrame(v, e), "link", iters = 10)
      .as[(String, Double)].collect().toMap
    val exp = refPageRank(vs, es, 10, 0.85)
    assert(got.keySet == exp.keySet)
    got.foreach { case (g, r) => assert(math.abs(r - exp(g)) < 1e-9, s"$g: $r vs ${exp(g)}") }
    assert(math.abs(got.values.sum - 1.0) < 1e-9, s"ranks must sum to 1: ${got.values.sum}")
  }

  test("pageRank: a directed cycle is the exact uniform fixed point") {
    val v = Seq("a", "b", "c").map(g => (g, "n", "{}")).toDF("gid", "label", "data")
    val e = Seq(("e1", "link", "a", "b", "{}"), ("e2", "link", "b", "c", "{}"),
      ("e3", "link", "c", "a", "{}")).toDF("gid", "label", "from", "to", "data")
    val got = GraphAlgos.pageRank(GraphFrame(v, e), "link", iters = 5)
      .as[(String, Double)].collect().toMap
    got.values.foreach(r => assert(math.abs(r - 1.0 / 3) < 1e-12, got.toString))
  }

  test("katzCentrality: closed-form chain, undirected pair, label filter") {
    // chain a->b->c, plus a 'likes' edge that must not count:
    // x0 = 1 everywhere; b = 1 + .1 = 1.1 (stable); c = 1 + .1·x(b) → 1.11
    val v = Seq("a", "b", "c").map(g => (g, "n", "{}")).toDF("gid", "label", "data")
    val e = Seq(("e1", "link", "a", "b", "{}"), ("e2", "link", "b", "c", "{}"),
      ("e3", "likes", "c", "a", "{}")).toDF("gid", "label", "from", "to", "data")
    val got = GraphAlgos.katzCentrality(GraphFrame(v, e), "link", iters = 3)
      .as[(String, Double)].collect().toMap
    assert(math.abs(got("a") - 1.0) < 1e-12 && math.abs(got("b") - 1.1) < 1e-12 &&
      math.abs(got("c") - 1.11) < 1e-12, got.toString)
    // undirected pair: x3 = 1 + .1·(1 + .1·(1 + .1)) = 1.111 on both ends
    val v2 = Seq("a", "b").map(g => (g, "n", "{}")).toDF("gid", "label", "data")
    val e2 = Seq(("e1", "link", "a", "b", "{}")).toDF("gid", "label", "from", "to", "data")
    val u = GraphAlgos.katzCentrality(GraphFrame(v2, e2), "link", iters = 3,
      undirected = true).as[(String, Double)].collect().toMap
    assert(u.values.forall(x => math.abs(x - 1.111) < 1e-12), u.toString)
  }

  test("triangle count: K4 has 4, direction and duplicates don't inflate") {
    // K4 on {a,b,c,d} = 4 triangles; edges deliberately mixed-direction
    // with one reversed duplicate (a->b AND b->a must canonicalize to one)
    val v = Seq("a", "b", "c", "d").map(g => (g, "n", "{}")).toDF("gid", "label", "data")
    val e = Seq(
      ("e1", "link", "a", "b", "{}"), ("e2", "link", "b", "a", "{}"),
      ("e3", "link", "a", "c", "{}"), ("e4", "link", "d", "a", "{}"),
      ("e5", "link", "b", "c", "{}"), ("e6", "link", "c", "d", "{}"),
      ("e7", "link", "b", "d", "{}"),
      ("e8", "other", "a", "d", "{}")) // off-label: ignored
      .toDF("gid", "label", "from", "to", "data")
    val got = GraphAlgos.triangleCount(GraphFrame(v, e), "link")
      .as[Long].collect().head
    assert(got == 4L)
    // a triangle-free star is 0
    val star = Seq(("s1", "link", "a", "b", "{}"), ("s2", "link", "a", "c", "{}"),
      ("s3", "link", "a", "d", "{}")).toDF("gid", "label", "from", "to", "data")
    assert(GraphAlgos.triangleCount(GraphFrame(v, star), "link")
      .as[Long].collect().head == 0L)
  }

  test("clustering coefficient: K4 is 1.0, star is 0, path is 0") {
    val v = Seq("a", "b", "c", "d").map(g => (g, "n", "{}")).toDF("gid", "label", "data")
    def ed(pairs: (String, String)*) = pairs.zipWithIndex
      .map { case ((f, t), i) => (s"e$i", "link", f, t, "{}") }
      .toDF("gid", "label", "from", "to", "data")
    // K4: 4 triangles, 12 wedges, coefficient 1.0
    val k4 = GraphAlgos.clusteringCoefficient(GraphFrame(v,
        ed("a" -> "b", "a" -> "c", "a" -> "d", "b" -> "c", "b" -> "d", "c" -> "d")), "link")
      .as[(Long, Long, Double)].collect().head
    assert(k4 == ((4L, 12L, 1.0)))
    // star: 3 wedges through the hub, no triangles
    val star = GraphAlgos.clusteringCoefficient(GraphFrame(v,
        ed("a" -> "b", "a" -> "c", "a" -> "d")), "link")
      .as[(Long, Long, Double)].collect().head
    assert(star == ((0L, 3L, 0.0)))
  }

  test("hits: hand-traced 2 alternating rounds, L2-normalized, zero off-sides") {
    // edges a->b, c->b, c->d. After 2 rounds: hubs a=5/sqrt(89),
    // c=8/sqrt(89); authorities b=5/sqrt(34), d=3/sqrt(34); pure-source
    // vertices have authority 0, pure-sink vertices hub 0.
    val v = Seq("a", "b", "c", "d").map(g => (g, "n", "{}")).toDF("gid", "label", "data")
    val e = Seq(("e1", "link", "a", "b", "{}"), ("e2", "link", "c", "b", "{}"),
      ("e3", "link", "c", "d", "{}")).toDF("gid", "label", "from", "to", "data")
    val got = GraphAlgos.hits(GraphFrame(v, e), "link", iters = 2)
      .as[(String, Double, Double)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    def ~=(x: Double, y: Double) = math.abs(x - y) < 1e-12
    assert(~=(got("a")._1, 5 / math.sqrt(89)) && ~=(got("c")._1, 8 / math.sqrt(89)), got.toString)
    assert(~=(got("b")._2, 5 / math.sqrt(34)) && ~=(got("d")._2, 3 / math.sqrt(34)), got.toString)
    assert(got("a")._2 == 0.0 && got("c")._2 == 0.0 && got("b")._1 == 0.0 && got("d")._1 == 0.0)
  }

  test("personalized pagerank: hand-traced 2 rounds, mass conserved, seed-local") {
    // a -> b, c isolated; seeds = {a}, d = 0.85.
    // r0 = (1, 0, 0); r1 = (0.15, 0.85, 0); r2: dangling = 0.85 teleports
    // through p (all to a): a = 0.15 + 0.85*0.85 = 0.8725, b = 0.85*0.15
    // = 0.1275, c stays 0 (teleport never reaches a non-seed sink's ring)
    val v = Seq("a", "b", "c").map(g => (g, "n", "{}")).toDF("gid", "label", "data")
    val e = Seq(("e1", "link", "a", "b", "{}")).toDF("gid", "label", "from", "to", "data")
    val seeds = Seq("a").toDF("gid")
    val got = GraphAlgos.personalizedPageRank(GraphFrame(v, e), "link", seeds, iters = 2)
      .as[(String, Double)].collect().toMap
    assert(math.abs(got("a") - 0.8725) < 1e-12, got.toString)
    assert(math.abs(got("b") - 0.1275) < 1e-12, got.toString)
    assert(got("c") == 0.0, got.toString)
    assert(math.abs(got.values.sum - 1.0) < 1e-12)
  }

  test("kCore: peel cascade, early convergence, empty core") {
    // triangle a-b-c with a pendant chain c-d-e: round 1 removes e
    // (deg 1), round 2 removes d — the 2-core is exactly the triangle,
    // reached only by CASCADING peels (a one-shot degree filter would
    // keep d). Mixed edge directions on purpose.
    val v = Seq("a", "b", "c", "d", "e").map(g => (g, "n", "{}")).toDF("gid", "label", "data")
    val e = Seq(("e1", "link", "a", "b", "{}"), ("e2", "link", "c", "b", "{}"),
      ("e3", "link", "c", "a", "{}"), ("e4", "link", "c", "d", "{}"),
      ("e5", "link", "e", "d", "{}"))
      .toDF("gid", "label", "from", "to", "data")
    val g = GraphFrame(v, e)
    val core2 = GraphAlgos.kCore(g, "link", k = 2).as[(String, Long)].collect().toMap
    assert(core2 == Map("a" -> 2L, "b" -> 2L, "c" -> 2L), core2.toString)
    // k=3: the triangle's degree-2 vertices all peel — empty core
    assert(GraphAlgos.kCore(g, "link", k = 3).isEmpty)
    // maxPeels truncation: one round only removes e, so d survives with
    // its post-round-1 degree 1
    val one = GraphAlgos.kCore(g, "link", k = 2, maxPeels = 1)
      .as[(String, Long)].collect().toMap
    assert(one == Map("a" -> 2L, "b" -> 2L, "c" -> 3L, "d" -> 1L), one.toString)
  }

  test("linkPredictJaccard: wedge pairs only, adjacency excluded, exact scores") {
    // path a-b-c plus c-d: candidates (a,c) share {b}: N(a)={b}, N(c)={b,d}
    // -> 1/2; (b,d) share {c}: N(b)={a,c}, N(d)={c} -> 1/2; (a,c) vs (a,d)?
    // a,d share nothing (N(a)={b}); b-c adjacent pairs never appear.
    val v = Seq("a", "b", "c", "d").map(g => (g, "n", "{}")).toDF("gid", "label", "data")
    val e = Seq(("e1", "link", "a", "b", "{}"), ("e2", "link", "b", "c", "{}"),
      ("e3", "link", "c", "d", "{}"))
      .toDF("gid", "label", "from", "to", "data")
    val got = GraphAlgos.linkPredictJaccard(GraphFrame(v, e), "link")
      .as[(String, String, Long, Double)].collect().toSet
    assert(got == Set(("a", "c", 1L, 0.5), ("b", "d", 1L, 0.5)), got.toString)
    // K3: every pair adjacent -> no candidates at all
    val k3 = Seq(("e1", "link", "a", "b", "{}"), ("e2", "link", "b", "c", "{}"),
      ("e3", "link", "a", "c", "{}")).toDF("gid", "label", "from", "to", "data")
    assert(GraphAlgos.linkPredictJaccard(GraphFrame(v, k3), "link").isEmpty)
  }

  test("shortestPaths: relaxation beats the direct edge, truncation bounds hops") {
    // a-b(1), b-c(1), a-c(5): the 2-hop route to c (2) must beat the
    // direct edge (5); d hangs off c (weight 2 -> dist 4); f unreachable
    import org.apache.spark.sql.functions.{col, get_json_object}
    val v = Seq("a", "b", "c", "d", "f").map(g => (g, "n", "{}")).toDF("gid", "label", "data")
    val e = Seq(
      ("e1", "link", "a", "b", """{"w":1}"""), ("e2", "link", "b", "c", """{"w":1}"""),
      ("e3", "link", "a", "c", """{"w":5}"""), ("e4", "link", "c", "d", """{"w":2}"""))
      .toDF("gid", "label", "from", "to", "data")
    val g = GraphFrame(v, e)
    val seeds = Seq("a").toDF("gid")
    val w = get_json_object(col("data"), "$.w")
    val got = GraphAlgos.shortestPaths(g, "link", seeds, w)
      .as[(String, Long)].collect().toMap
    assert(got == Map("a" -> 0L, "b" -> 1L, "c" -> 2L, "d" -> 4L), got.toString)
    // one round only relaxes direct edges: c keeps the weight-5 edge
    val trunc = GraphAlgos.shortestPaths(g, "link", seeds, w, maxRounds = 1)
      .as[(String, Long)].collect().toMap
    assert(trunc == Map("a" -> 0L, "b" -> 1L, "c" -> 5L), trunc.toString)
    // directed: nothing reaches back over reversed edges
    val dir = GraphAlgos.shortestPaths(g, "link", Seq("d").toDF("gid"), w,
      undirected = false).as[(String, Long)].collect().toMap
    assert(dir == Map("d" -> 0L), dir.toString)
  }

  test("randomWalks: md5-argmin choice replays, walks follow edges, dead ends stop") {
    import org.apache.spark.sql.functions.col
    val v = Seq("a", "b", "c", "z").map(g => (g, "n", "{}")).toDF("gid", "label", "data")
    val e = Seq(("e1", "link", "a", "b", "{}"), ("e2", "link", "a", "c", "{}"),
      ("e3", "link", "b", "c", "{}"))
      .toDF("gid", "label", "from", "to", "data")
    val g = GraphFrame(v, e)
    val got = GraphAlgos.randomWalks(g, "link", Seq("a").toDF("gid"), steps = 2)
      .as[(String, Long, String)].collect().toSet
    // replay the choice rule sequentially: md5("a|1|b") vs md5("a|1|c")
    def h(s: String): String = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val sym = Map("a" -> Seq("b", "c"), "b" -> Seq("a", "c"), "c" -> Seq("a", "b"))
    var cur = "a"
    var expect = Set(("a", 0L, "a"))
    for (t <- 1 to 2) {
      cur = sym(cur).minBy(n => (h(s"a|$t|$n"), n))
      expect += (("a", t.toLong, cur))
    }
    assert(got == expect, s"got $got expect $expect")
    // a seed with no edges emits only its step-0 row
    val lone = GraphAlgos.randomWalks(g, "link", Seq("z").toDF("gid"), steps = 3)
      .as[(String, Long, String)].collect().toSet
    assert(lone == Set(("z", 0L, "z")))
    // determinism: the same call twice is identical
    val again = GraphAlgos.randomWalks(g, "link", Seq("a").toDF("gid"), steps = 2)
      .as[(String, Long, String)].collect().toSet
    assert(again == got)
  }

  test("label propagation: triangle converges, min-id tie break, isolated keeps own") {
    // triangle a-b-c (hand-traced: r1 a->b,b->a,c->a; r2 all tie-break to a;
    // r3 stable all "a"), bridgeless pair d-e (synchronous oscillation —
    // after the EVEN 4th round back to d->"d", e->"e"), isolated z
    val v = Seq("a", "b", "c", "d", "e", "z").map(g => (g, "n", "{}")).toDF("gid", "label", "data")
    val ed = Seq(("e1", "link", "a", "b", "{}"), ("e2", "link", "b", "c", "{}"),
      ("e3", "link", "c", "a", "{}"), ("e4", "link", "d", "e", "{}"))
      .toDF("gid", "label", "from", "to", "data")
    val got = GraphAlgos.labelPropagation(GraphFrame(v, ed), "link", maxIters = 4)
      .as[(String, String)].collect().toMap
    assert(got == Map("a" -> "a", "b" -> "a", "c" -> "a",
      "d" -> "d", "e" -> "e", "z" -> "z"), got.toString)
  }

  test("modularity: two clean communities hand-computed; mixed assignment scores lower") {
    // two triangles {a,b,c} and {d,e,f} joined by one bridge c-d; m = 7
    val v = Seq("a", "b", "c", "d", "e", "f").map(g => (g, "n", "{}")).toDF("gid", "label", "data")
    val ed = Seq(("1", "a", "b"), ("2", "b", "c"), ("3", "c", "a"),
      ("4", "d", "e"), ("5", "e", "f"), ("6", "f", "d"), ("7", "c", "d"))
      .map { case (i, u, w) => (s"e$i", "link", u, w, "{}") }
      .toDF("gid", "label", "from", "to", "data")
    val g = GraphFrame(v, ed)
    val two = Seq(("a", "x"), ("b", "x"), ("c", "x"),
      ("d", "y"), ("e", "y"), ("f", "y")).toDF("gid", "community")
    val out = GraphAlgos.modularity(g, "link", two)
      .as[(String, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // community x: L=3 intra, D = deg(a)+deg(b)+deg(c) = 2+2+3 = 7
    def q(l: Long, d: Long) = BigDecimal(l / 7.0 - math.pow(d / 14.0, 2))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out == Map("x" -> ((3L, 7L, q(3, 7))), "y" -> ((3L, 7L, q(3, 7)))), out.toString)
    // everything in ONE community: Q = 7/7 - 1 = 0 — worse than the split
    val one = v.select($"gid", org.apache.spark.sql.functions.lit("z").as("community"))
    val qOne = GraphAlgos.modularity(g, "link", one)
      .as[(String, Long, Long, Double)].collect()
    assert(qOne.map(_._4).sum == 0.0)
    assert(out.values.map(_._3).sum > 0.3)
  }

  test("localClustering: K4 corners are 1.0, pendant zero, bridge dilutes") {
    // K4 on a,b,c,d plus pendant d-z: a,b,c have deg 3 and 3 triangles
    // of their possible 3 -> 1.0; d has deg 4, 3 triangles of 6 wedges
    // -> 0.5; z deg 1 -> 0
    val v = Seq("a", "b", "c", "d", "z").map(g => (g, "n", "{}")).toDF("gid", "label", "data")
    val ed = Seq(("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"), ("b", "d"), ("c", "d"), ("d", "z"))
      .zipWithIndex.map { case ((u, w), i) => (s"e$i", "link", u, w, "{}") }
      .toDF("gid", "label", "from", "to", "data")
    val out = GraphAlgos.localClustering(GraphFrame(v, ed), "link")
      .as[(String, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out == Map("a" -> ((3L, 3L, 1.0)), "b" -> ((3L, 3L, 1.0)), "c" -> ((3L, 3L, 1.0)),
      "d" -> ((4L, 3L, 0.5)), "z" -> ((1L, 0L, 0.0))), out.toString)
  }

  test("weighted pagerank: one hand-traced round, weight shares and dangling mass") {
    // a->b (w=3), a->c (w=1); b, c dangling. r0 = 1/3 each; W(a) = 4.
    // r1(b) = .15/3 + .85*((1/3)(3/4) + (2/3)/3), r1(c) analog with 1/4
    val v = Seq("a", "b", "c").map(g => (g, "n", "{}")).toDF("gid", "label", "data")
    val ed = Seq(("e1", "link", "a", "b", """{"w":3}"""),
      ("e2", "link", "a", "c", """{"w":1}"""))
      .toDF("gid", "label", "from", "to", "data")
    val out = GraphAlgos.pageRankWeighted(GraphFrame(v, ed), "link",
        org.apache.spark.sql.functions.get_json_object(
          org.apache.spark.sql.functions.col("data"), "$.w").cast("double"),
        iters = 1)
      .as[(String, Double)].collect().toMap
    def close(x: Double, y: Double) = math.abs(x - y) < 1e-12
    assert(close(out("a"), 0.05 + 0.85 * (2.0 / 9)), out.toString)
    assert(close(out("b"), 0.05 + 0.85 * (0.25 + 2.0 / 9)), out.toString)
    assert(close(out("c"), 0.05 + 0.85 * (1.0 / 12 + 2.0 / 9)), out.toString)
    assert(close(out.values.sum, 1.0), out.toString)
  }

  test("trussSupport: K4 edges support 2, bridge supports 0, pendant edge 0") {
    // K4 on a,b,c,d plus a pendant edge d-z: every K4 edge closes 2
    // triangles; the pendant closes none
    val v = Seq("a", "b", "c", "d", "z").map(g => (g, "n", "{}")).toDF("gid", "label", "data")
    val k4 = Seq(("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"), ("b", "d"), ("c", "d"), ("d", "z"))
    val ed = k4.zipWithIndex.map { case ((u, w), i) => (s"e$i", "link", u, w, "{}") }
      .toDF("gid", "label", "from", "to", "data")
    val out = GraphAlgos.trussSupport(GraphFrame(v, ed), "link")
      .as[(String, String, Long)].collect().map(r => (r._1, r._2) -> r._3).toMap
    assert(out == Map(("a", "b") -> 2L, ("a", "c") -> 2L, ("a", "d") -> 2L,
      ("b", "c") -> 2L, ("b", "d") -> 2L, ("c", "d") -> 2L, ("d", "z") -> 0L), out.toString)
  }

  test("assortativity: star is exactly -1, regular graph has undefined (null) r") {
    val v = Seq("a", "b", "c", "d").map(g => (g, "n", "{}")).toDF("gid", "label", "data")
    val star = Seq(("e1", "link", "c", "a", "{}"), ("e2", "link", "c", "b", "{}"),
      ("e3", "link", "c", "d", "{}")).toDF("gid", "label", "from", "to", "data")
    val out = GraphAlgos.assortativity(GraphFrame(v, star), "link").collect()(0)
    assert(out.getAs[Long]("n_edges") == 3)
    assert(out.getAs[Double]("r") == -1.0)
    // triangle: every degree 2 -> zero variance -> r is null, edges still counted
    val tri = Seq(("e1", "link", "a", "b", "{}"), ("e2", "link", "b", "c", "{}"),
      ("e3", "link", "c", "a", "{}")).toDF("gid", "label", "from", "to", "data")
    val t = GraphAlgos.assortativity(GraphFrame(v, tri), "link").collect()(0)
    assert(t.getAs[Long]("n_edges") == 3)
    assert(t.isNullAt(t.fieldIndex("r")))
  }

  test("neighborhood mean aggregation: two rounds hand-traced, isolated keeps value") {
    // path a-b-c with features 0, 6, 12; isolated z = 99
    // r1: a = 6, b = (0+12)/2 = 6, c = 6, z = 99
    // r2: a = 6, b = (6+6)/2 = 6, c = 6
    val v = Seq("a", "b", "c", "z").map(g => (g, "n", "{}")).toDF("gid", "label", "data")
    val ed = Seq(("e1", "link", "a", "b", "{}"), ("e2", "link", "b", "c", "{}"))
      .toDF("gid", "label", "from", "to", "data")
    val feats = Seq(("a", 0.0), ("b", 6.0), ("c", 12.0), ("z", 99.0)).toDF("gid", "f")
    val out = GraphAlgos.aggregateNeighborhood(GraphFrame(v, ed), "link", feats, rounds = 2)
      .as[(String, Double)].collect().toMap
    assert(out == Map("a" -> 6.0, "b" -> 6.0, "c" -> 6.0, "z" -> 99.0), out.toString)
    // one round from asymmetric start: a gets b's 6, c gets b's 6, b mean(0,12)=6
    val r1 = GraphAlgos.aggregateNeighborhood(GraphFrame(v, ed), "link",
      Seq(("a", 0.0), ("b", 4.0), ("c", 12.0), ("z", 1.0)).toDF("gid", "f"), rounds = 1)
      .as[(String, Double)].collect().toMap
    assert(r1 == Map("a" -> 4.0, "b" -> 6.0, "c" -> 4.0, "z" -> 1.0), r1.toString)
  }

  test("pageRank rounds stay job-lean: fused dangling mass, no per-round driver scalar") {
    // the dangling scalar is a broadcast 1-row frame inside the round's
    // single checkpoint action, so adding iterations must add only that
    // action's own jobs (AQE submits one job per materialized stage:
    // measured 8/iteration fused vs 9 plus a driver-sync barrier for the
    // separate-.first() shape this replaced) — a reintroduced per-round
    // driver scalar pushes the count back up and breaks the pin
    val v = (1 to 40).map(i => (s"v$i", "n", "{}")).toDF("gid", "label", "data")
    val e = (1 to 39).map(i => (s"e$i", "link", s"v$i", s"v${i + 1}", "{}"))
      .toDF("gid", "label", "from", "to", "data")
    val g = GraphFrame(v, e)
    def jobsFor(iters: Int): Int = {
      val n = new java.util.concurrent.atomic.AtomicInteger(0)
      val l = new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          n.incrementAndGet()
      }
      spark.sparkContext.addSparkListener(l)
      try {
        GraphAlgos.pageRank(g, "link", iters = iters).count()
        // listener bus is async; give it a moment to drain
        Thread.sleep(1500)
      } finally spark.sparkContext.removeSparkListener(l)
      n.get()
    }
    val base = jobsFor(2)
    val more = jobsFor(6)
    val perIter = (more - base) / 4.0
    info(f"jobs: iters=2 -> $base, iters=6 -> $more, per-iteration $perIter%.2f")
    assert(perIter <= 8.5,
      f"per-iteration job count $perIter%.2f suggests a driver-synchronous scalar crept back in")
  }
}
