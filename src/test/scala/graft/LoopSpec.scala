package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.gripql._
import graft.model.GraphFrame
import graft.compiler.Traversal

/** Deep jump-loop behavior: >100 iterations must complete exactly (no
  * silent truncation — reference terminates only on frontier exhaustion,
  * engine/logic/jump.go:71-123), exceeding maxIters must ERROR, and a
  * downstream limit reachable through row-preserving statements must stop
  * the loop early with the right result. */
class LoopSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  lazy val tiny: GraphFrame = {
    import spark.implicits._
    GraphFrame(
      Seq(("v1", "node", """{"x":1}"""), ("v2", "node", """{"x":2}"""))
        .toDF("gid", "label", "data"),
      Seq(("e1", "link", "v1", "v2", "{}"))
        .toDF("gid", "label", "from", "to", "data"))
  }

  def Q = Query()

  test("counter loop runs 150 iterations without truncation") {
    val q = Q.V("v1").set("n", GValue.GInt(0)).mark("a").increment("n", 1)
      .has(P.lt("n", 150)).jump("a", None, emit = true)
    assert(Traversal.run(spark, tiny, q).count() == 149)
  }

  test("hasId between hops inside a loop body filters per-iteration state") {
    // regression pin for the point-seek state machine: the body's second
    // hop must read the id set established by the hasId BEFORE it in the
    // SAME iteration — a stale jump-time snapshot (v2, the body's final
    // hasId) would filter the first hop's edges wrongly and kill the
    // second iteration. Cycle: v1 -link-> v2 -back-> v1.
    val cyc = {
      import spark.implicits._
      GraphFrame(
        Seq(("v1", "node", "{}"), ("v2", "node", "{}")).toDF("gid", "label", "data"),
        Seq(("e1", "link", "v1", "v2", "{}"), ("e2", "back", "v2", "v1", "{}"))
          .toDF("gid", "label", "from", "to", "data"))
    }
    // counter rides the $start mark namespace (current-element vars are
    // intentionally dropped on hops — the reference's ot_repeat pattern)
    val q = Q.V("v1").set("n", GValue.GInt(0)).as("s").mark("a")
      .increment("$s.n", 1)
      .out("link").hasId("v2").out("back").hasId("v1")
      .has(P.lt("$s.n", 3)).jump("a", None, emit = true)
    // iterations arrive at the jump with n = 1 and 2 (n = 3 dies at the
    // has() before the jump); both emitted. A stale id set would kill the
    // second iteration's `out("back")` and leave only one row.
    assert(Traversal.run(spark, cyc, q).count() == 2)
  }

  test("exceeding maxIters is an error, not a truncated result") {
    val q = Q.V("v1").set("n", GValue.GInt(0)).mark("a").increment("n", 1)
      .has(P.lt("n", 50)).jump("a", None, emit = true)
    val e = intercept[IllegalStateException] {
      Traversal.run(spark, tiny, q, maxIters = 10).count()
    }
    assert(e.getMessage.contains("exceeded"))
  }

  test("downstream limit through row-preserving statements stops the loop") {
    // as() is 1:1, so the limit(3) bound must reach the loop and stop it
    // well before the 600-iteration frontier exhausts
    val q = Q.V("v1").set("n", GValue.GInt(0)).mark("a").increment("n", 1)
      .has(P.lt("n", 600)).jump("a", None, emit = true)
      .as("z").limit(3)
    val t0 = System.nanoTime()
    assert(Traversal.run(spark, tiny, q).count() == 3)
    // 600 iterations would take minutes; early exit should be fast
    assert((System.nanoTime() - t0) / 1e9 < 120)
  }

  test("loop state survives alongside marks ($start.count pattern)") {
    val q = Q.V("v1").set("count", GValue.GInt(0)).as("start").mark("a")
      .increment("$start.count", 1)
      .has(P.lt("$start.count", 3)).jump("a", None, emit = true)
    assert(Traversal.run(spark, tiny, q).count() == 2)
  }

  test("kind-changing loop body errors at compile time") {
    val q = Q.V("v1").mark("a").outE().jump("a", None, emit = true)
    assertThrows[IllegalArgumentException] {
      Traversal.run(spark, tiny, q).count()
    }
  }
}
