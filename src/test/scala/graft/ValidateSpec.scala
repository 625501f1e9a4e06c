package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.gripql._
import graft.compiler.{Traversal, Validate}

/** Error-semantics conformance — the reference rejects malformed
  * traversals at compile time, before any execution starts
  * (reference: conformance/tests/ot_error.py, engine/core/compile.go:368-382
  * Validate, plus the per-statement type-state rows at compile.go:93-350).
  * Every case here must throw BEFORE a Spark job is launched; Traversal.run
  * calls Validate first, so running against an empty graph pins that. */
class ValidateSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  lazy val empty: graft.model.GraphFrame = {
    import spark.implicits._
    graft.model.GraphFrame(
      Seq.empty[(String, String, String)].toDF("gid", "label", "data"),
      Seq.empty[(String, String, String, String, String)]
        .toDF("gid", "label", "from", "to", "data"))
  }

  def Q = Query()

  private def err(q: Query): String =
    intercept[IllegalArgumentException](Validate(q.stmts)).getMessage

  // ---- ot_error.py test_fields: a traversal not starting with V()/E()
  // must raise, and must raise through the execution entry point too.
  test("first statement must be V() or E() (ot_error.test_fields)") {
    assert(err(Q.out()).contains("only valid for edge or vertex"))
    val e = intercept[IllegalArgumentException] {
      Traversal.run(spark, empty, Q.out())
    }
    assert(e.getMessage.contains("only valid for edge or vertex"))
  }

  test("empty query is an error, empty extension is not") {
    assert(err(Q).contains("empty query"))
    // job resume replays the spooled stream (gdbi/pipeline.go:19-23)
    Validate(Seq.empty, initial = Validate.VertexS)
  }

  // ---- compile.go:98,106 — V/E only at the beginning
  test("V()/E() mid-traversal is an error") {
    assert(err(Q.V().out().V()).contains("only valid at the beginning"))
    assert(err(Q.V().E()).contains("only valid at the beginning"))
    // and on a pipeline extension, even first position is not a fresh start
    val e = intercept[IllegalArgumentException] {
      Validate(Q.V().stmts, initial = Validate.VertexS)
    }
    assert(e.getMessage.contains("only valid at the beginning"))
  }

  // ---- compile.go:121-214 — hop/filter statements need an element stream
  test("hops and filters demand the element kind the reference demands") {
    assert(err(Q.V().count().out()).contains("not: CountS"))
    assert(err(Q.E().outE()).contains("only valid for the vertex type"))
    assert(err(Q.V().count().has(P.eq_("x", 1))).contains("\"has\" statement"))
    assert(err(Q.V().render(GValue.GString("_gid")).out())
      .contains("not: RenderS"))
    assert(err(Q.V().path().hasLabel("a")).contains("not: PathS"))
  }

  // ---- compile.go:302 + jsonpath — select/mark name rules
  test("unknown and reserved mark names (compile.go:279-302)") {
    assert(err(Q.V().select("nope")).contains("unknown mark 'nope'"))
    assert(err(Q.V().as("a").out().select("a", "ghost"))
      .contains("unknown mark 'ghost'"))
    assert(err(Q.V().as("__current__")).contains("reserved name __current__"))
    assert(err(Q.V().as("bad name")).contains("bad mark name"))
    assert(err(Q.V().as("_label")).contains("bad mark name"))
  }

  test("jump referencing a mark() that never appears is an error") {
    assert(err(Q.V().jump("missing", None, emit = true))
      .contains("unknown mark 'missing'"))
  }

  // ---- compile.go:341 aggregate rows
  test("aggregate needs elements and unique names") {
    assert(err(Q.V().count().aggregate(Agg.Term("t", "f", 0)))
      .contains("\"aggregate\" statement"))
    assert(err(Q.V().aggregate(Agg.Term("t", "f", 0), Agg.Term("t", "g", 0)))
      .contains("duplicate aggregation name 't'"))
  }

  test("hasLabel/hasId/hasKey with empty argument lists error like the reference") {
    assert(err(Q.V().hasLabel()).contains("no labels provided"))
    assert(err(Q.V().hasId()).contains("no ids provided"))
    assert(err(Q.V().hasKey()).contains("no keys provided"))
  }
}
