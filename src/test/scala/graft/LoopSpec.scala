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
