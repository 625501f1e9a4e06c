package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.gripql.{JsQuery, Parser, Query}

/** Golden parity over the reference's OWN query-string corpus: every
  * builder chain that appears in the reference's conformance modules
  * (`/root/reference/conformance/tests/ot_*.py`) plus the `cmd/query`
  * CLI examples, evaluated through BOTH front doors — the JS
  * interpreter ([[JsQuery]], the `grip query` path, cmd/query/main.go:
  * 29-62) and the fluent text parser ([[Parser]]) — pinning
  * statement-list equality, with hand-written protojson goldens for
  * representative shapes (the exact JSON gripql.js pushes,
  * gripql/javascript/gripql.js:12-148).
  *
  * The conformance chains are written for the python builder; the
  * mechanical spellings that differ from what the CLI's JS VM would
  * see are normalized before parsing (`gripql.` module prefix dropped —
  * gripql.js exposes the builders as globals; python literals
  * True/False/None; one local `percents` variable inlined). `as_`/`in_`
  * and `and_`/`or_`/`not_` are NOT rewritten: gripql.js itself uses the
  * underscore spellings, and both front doors accept both.
  */
class JsGoldenSpec extends AnyFunSuite {
  private val testsDir = new java.io.File("/root/reference/conformance/tests")

  /** Scan one python source for `G.query()...` chains, tracking paren
    * depth and string literals so chains may span lines and contain
    * nested builder calls. Returns the chain text from `query()` on. */
  private def extract(srcRaw: String): Seq[String] = {
    // docstring/f-string copies escape their quotes; unescape so both
    // spellings of the same chain dedupe
    val src = srcRaw.replace("\\\"", "\"")
    val out = Seq.newBuilder[String]
    val marker = "G.query()"
    var idx = src.indexOf(marker)
    while (idx >= 0) {
      var j = idx + marker.length
      var depth = 0
      var done = false
      while (!done && j < src.length) {
        src.charAt(j) match {
          case '(' => depth += 1; j += 1
          case ')' if depth > 0 => depth -= 1; j += 1
          case q @ ('"' | '\'') if depth > 0 =>
            j += 1
            while (j < src.length && src.charAt(j) != q) {
              if (src.charAt(j) == '\\') j += 1
              j += 1
            }
            j += 1
          case '.' if depth == 0 =>
            var k = j + 1
            while (k < src.length && src.charAt(k).isWhitespace) k += 1
            if (k < src.length && (src.charAt(k).isLetter || src.charAt(k) == '_')) j = k
            else done = true
          case c if depth > 0 || c.isLetterOrDigit || c == '_' => j += 1
          case _ => done = true
        }
      }
      out += src.substring(idx + 2, j) // drop the "G."
      idx = src.indexOf(marker, j)
    }
    out.result()
  }

  /** python-module spelling → the JS the reference CLI's VM would run. */
  private def toJs(chain: String): String =
    chain
      .replace("\n", " ")
      .replaceAll("\\bgripql\\.", "") // JS builders are globals, not a module
      .replaceAll("\\bTrue\\b", "true")
      .replaceAll("\\bFalse\\b", "false")
      .replaceAll("\\bNone\\b", "null")
      // the one free python variable in the corpus (ot_aggregations.py:97)
      .replaceAll("\\bpercents\\b", "[1, 5, 25, 50, 75, 95, 99, 99.9]")
      .replaceAll(",\\s*\\)", ")") // python trailing commas
      // client-side terminal methods, not traversal statements
      .replaceAll("\\.(execute|submit|searchJobs)\\(\\)$", "")
      .replaceAll("\\.(execute|submit|searchJobs)\\(\\)$", "")
      .trim

  test("every conformance-module builder chain: JS eval == fluent parse (statement lists)") {
    assume(testsDir.isDirectory, "reference conformance tree unavailable")
    val files = testsDir.listFiles().filter(_.getName.matches("ot_.*\\.py")).sorted
    val chains = files.flatMap(f =>
      extract(java.nio.file.Files.readString(f.toPath))).map(toJs).distinct
    var checked = 0
    val skipped = Seq.newBuilder[String]
    chains.foreach { js0 =>
      // both front doors take the seed-first form; `query().` is JS-only sugar
      val js = js0.stripPrefix("query().")
      if (js.contains(" for ")) skipped += js // python generator expression
      else if (!(js.startsWith("V(") || js.startsWith("E("))) skipped += js // error-path fixture
      else {
        val viaJs = JsQuery.eval(js)
        val viaText = Parser.parse(js)
        assert(viaJs == viaText, s"front doors disagree on: $js")
        checked += 1
      }
    }
    val sk = skipped.result()
    // the corpus is large and the skips are exactly the two known
    // non-traversal forms — a shrunken corpus means extraction broke
    assert(checked >= 120, s"only $checked chains checked — extraction regressed?")
    assert(sk.size <= 3, s"unexpected skips: $sk")
  }

  test("CLI example queries (cmd/query/main.go:26, website docs) parse identically") {
    for (js <- Seq(
        """V().hasLabel("Variant").out().limit(5)""",
        """V().hasLabel("Pathway").count()""")) {
      assert(JsQuery.eval(js) == Parser.parse(js), js)
    }
  }

  test("golden protojson: representative chains emit exactly what gripql.js pushes") {
    // hand-written against gripql/javascript/gripql.js:12-148 (builder
    // push shapes) and :151-209 (where operators)
    def json(js: String): String = JsQuery.evalValue(js).toString
    assert(json("""V("Starship:12").out("pilots")""") ==
      """{"query":[{"v":["Starship:12"]},{"out":["pilots"]}]}""")
    assert(json("""E().count()""") == """{"query":[{"e":[]},{"count":""}]}""")
    assert(json("""V().has(and_(eq("_label", "Character"), eq("eye_color", "blue")))""") ==
      """{"query":[{"v":[]},{"has":{"and":{"expressions":[""" +
      """{"condition":{"key":"_label","value":"Character","condition":"EQ"}},""" +
      """{"condition":{"key":"eye_color","value":"blue","condition":"EQ"}}]}}}]}""")
    assert(json("""V().as_("a").out().select(["a"])""") ==
      """{"query":[{"v":[]},{"as":"a"},{"out":[]},{"select":{"marks":["a"]}}]}""")
    assert(json("""V().range(3, 5)""") ==
      """{"query":[{"v":[]},{"range":{"start":3,"stop":5}}]}""")
    assert(json("""V().hasLabel("Planet").aggregate(term("t", "terrain"))""") ==
      """{"query":[{"v":[]},{"hasLabel":["Planet"]},""" +
      """{"aggregate":{"aggregations":[{"name":"t","term":{"field":"terrain"}}]}}]}""")
    // process() coerces falsy to [] — within("x", 0) means "within empty set"
    assert(json("""V().has(within("eye_color", 0))""") ==
      """{"query":[{"v":[]},{"has":{"condition":{"key":"eye_color","value":[],"condition":"WITHIN"}}}]}""")
  }
}
