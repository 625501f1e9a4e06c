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
}
