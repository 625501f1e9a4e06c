package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.gripql._

/** JS query strings: the reference CLI's goja→JSON→protojson pipeline
  * (cmd/query/main.go, gripql/javascript/gripql.js) re-expressed with a
  * purpose-built interpreter whose output feeds the same protojson parser
  * the wire uses — so a JS query and its fluent twin parse to the SAME
  * [[Query]] AST. */
class JsQuerySpec extends AnyFunSuite {

  test("a plain fluent chain is valid JS and matches Parser.parse") {
    val text = """V().hasLabel("Variant").out("annotations").limit(5)"""
    assert(JsQuery.eval(text) == Parser.parse(text))
  }

  test("variables, concatenation, and arithmetic resolve before parsing") {
    val q = JsQuery.eval(
      """var kind = "Vari" + "ant";
        |let n = 2 + 3;
        |V().hasLabel(kind).limit(n)""".stripMargin)
    assert(q == Parser.parse("""V().hasLabel("Variant").limit(5)"""))
  }

  test("builder aliasing mutates like the JS original") {
    val q = JsQuery.eval(
      """var q = V("a");
        |q.out("knows");
        |q.count()""".stripMargin)
    assert(q == Parser.parse("""V("a").out("knows").count()"""))
  }

  test("predicate and aggregation builders produce the wire shapes") {
    val q = JsQuery.eval(
      """var minAge = 18 * 2 - 7;
        |V().has(and_(gt("age", minAge), within("state", ["CA", "OR"])))
        |   .aggregate(term("byState", "state", 10), histogram("ages", "age", 5))""".stripMargin)
    val twin = Parser.parse(
      """V().has(and(gt("age", 29), within("state", ["CA", "OR"])))""" +
        """.aggregate(term("byState", "state", 10), histogram("ages", "age", 5))""")
    assert(q == twin)
  }

  test("underscore method aliases (in_, as_) and reserved-word forms both work") {
    val a = JsQuery.eval("""V().as_("x").in_("knows").select("x")""")
    val b = JsQuery.eval("""V().as("x").in("knows").select("x")""")
    assert(a == b && a == Parser.parse("""V().as("x").in("knows").select("x")"""))
  }

  test("objects, arrays, comments, and render templates evaluate") {
    val q = JsQuery.eval(
      """// pick a template
        |var tpl = {name: "$.name", zip: "$.address.zip"};
        |V().hasLabel("Person").render(tpl) /* done */""".stripMargin)
    assert(q == Parser.parse(
      """V().hasLabel("Person").render({"name": "$.name", "zip": "$.address.zip"})"""))
  }

  test("boolean logic and comparisons follow JS truthiness") {
    assert(JsQuery.evalValue("1 < 2 && \"a\" == \"a\"").asBoolean())
    assert(JsQuery.evalValue("0 || \"fallback\"").asText() == "fallback")
    assert(JsQuery.evalValue("!null").asBoolean())
    assert(JsQuery.evalValue("10 % 3").asInt() == 1)
    assert(JsQuery.evalValue("7 / 2").asDouble() == 3.5)
    // integral doubles serialize like JSON.stringify (no ".0")
    assert(JsQuery.evalValue("2 + 3").toString == "5")
  }

  test("member access and indexing read evaluated structures") {
    assert(JsQuery.evalValue(
      """var labels = ["Gene", "Variant"];
        |labels[1]""".stripMargin).asText() == "Variant")
    assert(JsQuery.evalValue(
      """var cfg = {target: "Gene"};
        |cfg.target""".stripMargin).asText() == "Gene")
  }

  test("errors are loud: undefined vars, unknown methods, non-traversal results") {
    assert(intercept[IllegalArgumentException](
      JsQuery.eval("V().hasLabel(missing)")).getMessage.contains("undefined variable"))
    assert(intercept[IllegalArgumentException](
      JsQuery.eval("V().frobnicate()")).getMessage.contains("unknown traversal method"))
    assert(intercept[IllegalArgumentException](
      JsQuery.eval("1 + 1")).getMessage.contains("must evaluate to a traversal"))
    assert(intercept[IllegalArgumentException](
      JsQuery.eval("explode()")).getMessage.contains("unknown function"))
  }

  test("subset boundary: out-of-scope JS constructs fail naming the construct") {
    // reference surface: cmd/query/main.go:29-62 runs a full goja VM; this
    // interpreter covers the query idiom only — each boundary case must
    // say WHICH construct was rejected, not emit a confusing parse error
    def boundary(js: String, construct: String): Unit = {
      val e = intercept[IllegalArgumentException](JsQuery.eval(js))
      assert(e.getMessage.contains(s"unsupported JS construct '$construct'"), s"$js → ${e.getMessage}")
    }
    boundary("for (var i = 0; i < 3; i++) { }", "for")
    boundary("while (true) { }", "while")
    boundary("function f(x) { return x }; f(1)", "function")
    boundary("if (x) { V() }", "if")
    boundary("try { V() } catch (e) { }", "try")
    boundary("class Q { }", "class")
    boundary("var f = 1; return f", "return")
    boundary("x => x + 1", "arrow function")
    boundary("async function f() { }", "async function")
    // boundary rejections carry the sentinel type so callers with a
    // non-JS fallback (the CLI) can surface this message instead
    intercept[JsQuery.UnsupportedJsConstruct](JsQuery.eval("while (true) { }"))
  }

  test("contextual keywords stay usable as identifiers (they are not reserved words)") {
    // 'of'/'async'/'await'/'yield' are contextual in JS — a classic script
    // may use them as variable names; the reference's full VM accepts these
    def lastLong(js: String): Long = JsQuery.evalValue(js).asLong()
    assert(lastLong("var of = 2; of + 1") == 3)
    assert(lastLong("var await = 5; await") == 5)
    assert(lastLong("var yield = 7; yield * 2") == 14)
    assert(lastLong("var async = 1; async + async") == 2)
  }

  test("malformed input is always IllegalArgumentException, never a lexer slip") {
    // truncated \u escape used to surface StringIndexOutOfBoundsException;
    // bad number forms NumberFormatException — both now normalized
    intercept[IllegalArgumentException](JsQuery.eval("\"trunc\\" + "u00"))
    intercept[IllegalArgumentException](JsQuery.eval("1.2.3"))
    intercept[IllegalArgumentException](JsQuery.eval(""" "unterminated """))
  }

  test("jump/mark/set/increment loop statements round-trip through the wire shape") {
    val js = JsQuery.eval(
      """V("start").mark("loop").set("seen", true)
        |  .increment("hops", 1)
        |  .jump("loop", lt("_.hops", 3), false)""".stripMargin)
    val twin = Parser.parse(
      """V("start").mark("loop").set("seen", true)""" +
        """.increment("hops", 1).jump("loop", lt("_.hops", 3), false)""")
    assert(js == twin)
  }
}
