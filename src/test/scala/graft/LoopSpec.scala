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

  test("scale: 20-round mark/jump over a 1M-row frontier stays linear per round") {
    // the components loop's scale proof, mirrored for mark/jump
    // (reference: engine/logic/jump.go; conformance ot_repeat.py:35-57):
    // a 1M-vertex ring walked by a counter-terminated loop keeps the
    // frontier at exactly 1M rows EVERY round, so 20-round vs 5-round
    // wall-time directly measures per-round cost. Near-linear scaling
    // (~4×, asserted < 8× for box noise) is the evidence the
    // per-iteration localCheckpoint keeps lineage flat — quadratic
    // lineage growth would superlinearize the total and eventually
    // overflow the planner. Correctness: the ring is a bijection, so
    // every round preserves exactly n travelers.
    import org.apache.spark.sql.functions.{col, concat, lit, pmod}
    val n = 1000000L
    val lv = spark.range(n).select(concat(lit("v"), col("id")).as("gid"),
      lit("N").as("label"), lit("{}").as("data")).localCheckpoint(true)
    val le = spark.range(n).select(concat(lit("e"), col("id")).as("gid"),
      lit("n").as("label"), concat(lit("v"), col("id")).as("from"),
      concat(lit("v"), pmod(col("id") + 1L, lit(n))).as("to"),
      lit("{}").as("data")).localCheckpoint(true)
    val lg = GraphFrame(lv, le)
    // jump semantics (reference engine/logic/jump.go:155-190): travelers
    // matching the condition go BACK to the mark; downstream sees copies
    // only under emit=true. A pure emit=false walk therefore ends with 0
    // rows — the loop's work is the k rounds themselves — and only ever
    // needs the LATEST frontier checkpoint, which the engine frees
    // round-by-round (an emit=true loop's result is semantically
    // O(rounds×frontier): its batches are kept because they ARE the
    // result). The counter lives on a MARK ($s.c): set() on the current
    // element is dropped when out() replaces it (the set-then-hop rule).
    def walk(k: Int) = Q.V().hasLabel("N").set("c", GValue.GInt(0)).as("s")
      .mark("a").increment("$s.c", 1).out("n")
      .jump("a", Some(P.lt("$s.c", k)), emit = false).count()
    def runWalk(k: Int): Long =
      Traversal.run(spark, lg, walk(k)).head().getLong(0)
    assert(runWalk(2) == 0) // warm the loop machinery before timing
    val t0 = System.nanoTime()
    assert(runWalk(5) == 0)
    val t5 = (System.nanoTime() - t0) / 1e9
    val beforeIds = spark.sparkContext.getPersistentRDDs.keySet
    val t1 = System.nanoTime()
    assert(runWalk(20) == 0)
    val t20 = (System.nanoTime() - t1) / 1e9
    // the loop storage did not accumulate: at most the final (empty)
    // result checkpoint survives the run — every per-round frontier
    // checkpoint was freed as the next round materialized (the session is
    // shared across suites, so the check is scoped to NEW rdd ids)
    val leaked = spark.sparkContext.getPersistentRDDs.keySet -- beforeIds
    assert(leaked.size <= 1, s"loop leaked ${leaked.size} persisted RDDs")
    info(f"1M-row frontier: 5 rounds $t5%.1f s, 20 rounds $t20%.1f s (ratio ${t20 / t5}%.2f)")
    assert(t20 < t5 * 8,
      f"20 rounds took $t20%.1f s vs $t5%.1f s for 5 — superlinear per-round growth")
    lv.unpersist(); le.unpersist()
  }
}
