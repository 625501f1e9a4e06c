package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.gripql._
import graft.model.GraphFrame
import graft.compiler.Traversal

/** Textual query parsing (reference behavior: cmd/query/main.go:29-62
  * evaluates the same chains in a JS VM) — AST equivalence against the
  * fluent builder, plus conformance queries REPLAYED FROM STRINGS over the
  * SWAPI fixture with the ot_* golden counts. */
class ParserSpec extends AnyFunSuite {
  def Q = Query()
  private def p(s: String) = Parser.parse(s)

  test("statement coverage: parsed text equals builder AST") {
    assert(p("""V()""") == Q.V())
    assert(p("""V("a", 'b')""") == Q.V("a", "b"))
    assert(p("""E("x")""") == Q.E("x"))
    assert(p("""V().hasLabel("Film").out("characters").count()""") ==
      Q.V().hasLabel("Film").out("characters").count())
    assert(p("""V().outNull().inNull().both("k").outE().inE().bothE().outENull().inENull()""") ==
      Q.V().outNull().inNull().both("k").outE().inE().bothE().outENull().inENull())
    assert(p("""V().hasId("a").hasKey("k1","k2").limit(5).skip(2).range(3, 10)""") ==
      Q.V().hasId("a").hasKey("k1", "k2").limit(5).skip(2).range(3, 10))
    assert(p("""V().distinct().distinct("f1","f2")""") == Q.V().distinct().distinct("f1", "f2"))
    assert(p("""V().as("a").select("a")""") == Q.V().as("a").select("a"))
    assert(p("""V().as_('a').select("a","b")""") == Q.V().as("a").select("a", "b"))
    assert(p("""V().fields("x","-y").unwind("arr").path()""") ==
      Q.V().fields("x", "-y").unwind("arr").path())
    assert(p("""V().set("k", {name: "x", n: [1, 2.5, true, null]}).increment("n").increment("m", 3)""") ==
      Q.V().set("k", GValue.GObj(Seq("name" -> GValue.GString("x"),
        "n" -> GValue.GArray(Seq(GValue.GInt(1), GValue.GNum(2.5), GValue.GBool(true), GValue.GNull)))))
        .increment("n").increment("m", 3))
    assert(p("""V().render({"gid": "_gid"})""") ==
      Q.V().render(GValue.GObj(Seq("gid" -> GValue.GString("_gid")))))
    assert(p("""V().mark("s").out().jump("s", null, true)""") ==
      Q.V().mark("s").out().jump("s", None, emit = true))
    assert(p("""V().mark("s").jump("s", gripql.lt("n", 4), false)""") ==
      Q.V().mark("s").jump("s", Some(P.lt("n", 4)), emit = false))
  }

  test("predicates: every leaf op, nesting, gripql namespace, arrays") {
    assert(p("""V().has(eq("a", 1))""") == Q.V().has(P.eq_("a", 1)))
    assert(p("""V().has(gripql.neq("a", "x"))""") == Q.V().has(P.neq("a", "x")))
    assert(p("""V().has(and(gt("h", 100), lte("h", 200)))""") ==
      Q.V().has(P.and_(P.gt("h", 100), P.lte("h", 200))))
    assert(p("""V().has(or(lt("h", 1.5), gte("h", 2.5)))""") ==
      Q.V().has(P.or_(P.lt("h", 1.5), P.gte("h", 2.5))))
    assert(p("""V().has(not(eq("a", null)))""") == Q.V().has(P.not_(P.eq_("a", null))))
    assert(p("""V().has(inside("h", 100, 200))""") == Q.V().has(P.inside("h", 100, 200)))
    assert(p("""V().has(outside("h", [100, 200]))""") == Q.V().has(P.outside("h", 100, 200)))
    assert(p("""V().has(between("h", 100, 200))""") == Q.V().has(P.between("h", 100, 200)))
    assert(p("""V().has(within("c", ["a", "b"]))""") == Q.V().has(P.within("c", "a", "b")))
    assert(p("""V().has(without("c", "a", "b"))""") == Q.V().has(P.without("c", "a", "b")))
    assert(p("""V().has(contains("arr", "x"))""") == Q.V().has(P.contains("arr", "x")))
  }

  test("aggregations parse") {
    assert(p("""V().aggregate(term("t", "f", 5), histogram("h", "g", 100), percentile("p", "g", 25, 50, 75))""") ==
      Q.V().aggregate(Agg.Term("t", "f", 5), Agg.Histogram("h", "g", 100),
        Agg.Percentile("p", "g", Seq(25, 50, 75))))
    assert(p("""V().aggregate(gripql.field("f", "_data"), gripql.type("ty", "x"), gripql.count("n"))""") ==
      Q.V().aggregate(Agg.FieldAgg("f", "_data"), Agg.TypeAgg("ty", "x"), Agg.CountAgg("n")))
  }

  test("malformed queries fail with positioned errors") {
    def bad(s: String): String =
      intercept[IllegalArgumentException](p(s)).getMessage
    assert(bad("""out()""").contains("must start with V"))
    assert(bad("""V().frobnicate()""").contains("unknown method"))
    assert(bad("""V().has(zorp("a", 1))""").contains("unknown predicate"))
    assert(bad("""V().hasLabel("x").count""").contains("expected '('"))
    assert(bad("""V().limit("five")""").contains("expected number"))
    assert(bad("""V().count() trailing""").contains("trailing"))
    assert(bad("""V().has(eq("a", 1)""").contains("expected ')'"))
  }

  // ---- conformance counts replayed from STRINGS (same golden numbers as
  // SwapiConformanceSpec's builder forms; reference: conformance/tests/ot_*.py)
  lazy val spark: SparkSession = SparkTestSession.spark
  lazy val g: GraphFrame = {
    val res = getClass.getResource("/swapi/swapi.vertices").getPath
    val dir = new java.io.File(res).getParent
    val gf = GraphFrame.fromJsonLines(spark, s"$dir/swapi.vertices", s"$dir/swapi.edges")
    GraphFrame(gf.vertices.cache(), gf.edges.cache())
  }
  private def n(text: String): Long = Traversal.run(spark, g, p(text)).count()

  test("swapi conformance from query strings") {
    assert(n("""V()""") == 39)
    assert(n("""V("Character:1")""") == 1)
    assert(n("""E()""") == 144)
    assert(n("""V().hasLabel("Film")""") == 1)
    assert(n("""V("Starship:12").out("pilots")""") == 4)
    assert(n("""V().has(gripql.eq("_label", "Planet"))""") == 3)
    assert(n("""V().hasLabel("Character").has(and(gt("height", 100), lt("height", 200)))""") == 14)
    assert(n("""V("Film:1").out().out().out()""") == 1814)
    assert(n("""V("Character:1").as("c").out("homeworld").select("c")""") == 1)
    // emit=true emits each loop's arrivals at the jump: the 18 characters
    // (who then have no outgoing "characters" edges, ending the walk)
    assert(n("""V("Film:1").mark("a").out("characters").jump("a", null, true)""") == 18)
  }

  test("extension chains parse without a seed (job-resume form)") {
    import graft.gripql.{Parser, Stmt}
    val q = Parser.parseExtension(""".out("knows").count()""")
    assert(q.stmts == Vector(Stmt.Out(Seq("knows")), Stmt.Count()))
    // the leading dot is optional
    assert(Parser.parseExtension("""hasLabel("x").limit(3)""").stmts ==
      Vector(Stmt.HasLabel(Seq("x")), Stmt.Limit(3)))
    // a seeded query is still rejected as an extension, and vice versa
    intercept[IllegalArgumentException](Parser.parseExtension("""V().count()"""))
    intercept[IllegalArgumentException](Parser.parse(""".out().count()"""))
  }
}
