package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.cypher.Cypher
import graft.gripql._
import graft.compiler.Traversal
import graft.model.GraphFrame

/** The Cypher MATCH subset: translation-level checks against the
  * expected statement lists (the reference's own cypher test shape,
  * endpoints/cypher/test/cypher_test.go) plus end-to-end counts on the
  * SWAPI fixture. */
class CypherSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  lazy val g: GraphFrame = {
    val res = getClass.getResource("/swapi/swapi.vertices").getPath
    val dir = new java.io.File(res).getParent
    GraphFrame.fromJsonLines(spark, s"$dir/swapi.vertices", s"$dir/swapi.edges")
  }

  test("node pattern with label and props translates like the reference test") {
    // reference: cypher_test.go pair 1 (plus the render the builder emits)
    val q = Cypher.parse("MATCH (n:Person {name: 'Bob'}) RETURN n")
    assert(q.stmts == Query().V().hasLabel("Person")
      .has(HasExpr.Cond("name", GValue.GString("Bob"), CondOp.EQ))
      .as("n")
      .render(GValue.GObj(Seq("n" -> GValue.GString("$n._data")))).stmts)
  }

  test("relationships translate to out/in/both with types") {
    val q = Cypher.parse(
      "MATCH (a:Film)-[:characters]->(b)<-[:homeworld]-(c)-[]-(d) RETURN count(*)")
    assert(q.stmts == Query().V().hasLabel("Film").as("a")
      .out("characters").as("b")
      .in("homeworld").as("c")
      .both().as("d").count().stmts)
  }

  test("WHERE becomes a mark-namespaced has expression") {
    val q = Cypher.parse(
      "MATCH (a:Character)-[:homeworld]->(p) WHERE a.gender = 'male' AND p.name <> 'Tatooine' RETURN a.name AS an")
    assert(q.stmts.contains(Stmt.Has(HasExpr.And(Seq(
      HasExpr.Cond("$a.gender", GValue.GString("male"), CondOp.EQ),
      HasExpr.Cond("$p.name", GValue.GString("Tatooine"), CondOp.NEQ))))))
    assert(q.stmts.last == Stmt.Render(
      GValue.GObj(Seq("an" -> GValue.GString("$a.name")))))
  }

  test("end-to-end on SWAPI: counts and rendered rows") {
    def run(c: String) = Traversal.run(spark, g, Cypher.parse(c))
    assert(run("MATCH (f:Film) RETURN count(*)").head().getLong(0) == 1L)
    assert(run("MATCH (f:Film)-[:characters]->(c) RETURN count(*)").head().getLong(0) == 18L)
    // IN + OR where-clauses
    assert(run(
      "MATCH (c:Character) WHERE c.gender IN ['male'] OR c.name = 'Leia Organa' RETURN c"
    ).count() > 1)
    // rendered projection carries the aliased value
    val rows = run("MATCH (c:Character {name: 'Luke Skywalker'})-[:homeworld]->(p) RETURN p.name AS home")
      .collect()
    assert(rows.length == 1)
    assert(rows.head.toString.contains("Tatooine"))
    // LIMIT applies
    assert(run("MATCH (c:Character) RETURN c LIMIT 3").count() == 3)
  }

  test("relationship property maps filter in edge state") {
    val q = Cypher.parse("MATCH (a)-[:knows {weight: 5}]->(b) RETURN count(*)")
    assert(q.stmts == Query().V().as("a").outE("knows")
      .has(HasExpr.Cond("weight", GValue.GInt(5), CondOp.EQ)).out()
      .as("b").count().stmts)
    intercept[IllegalArgumentException](
      Cypher.parse("MATCH (a)-[:knows {weight: 5}]-(b) RETURN count(*)"))
  }

  test("no-space operators and spaced patterns parse (driver-emitted forms)") {
    // a.age>=21 with no spaces: the operand char after >= must not be
    // mistaken for a keyword boundary
    val q = Cypher.parse("MATCH (a:Character) WHERE a.height>=170 AND a.mass<>77 RETURN count(*)")
    assert(q.stmts.exists {
      case Stmt.Has(HasExpr.And(cs)) => cs == Seq(
        HasExpr.Cond("$a.height", GValue.GInt(170), CondOp.GTE),
        HasExpr.Cond("$a.mass", GValue.GInt(77), CondOp.NEQ))
      case _ => false
    })
    // whitespace between pattern elements is legal Cypher
    val q2 = Cypher.parse("MATCH (a:Film)-[:characters]->(b) <-[:homeworld]-(c) RETURN count(*)")
    assert(q2.stmts.count { case _: Stmt.In => true; case _: Stmt.Out => true; case _ => false } == 2)
    // SKIP/LIMIT after count(*) is refused, not silently dropped
    intercept[IllegalArgumentException](
      Cypher.parse("MATCH (n:Film) RETURN count(*) SKIP 1"))
  }

  test("unsupported constructs fail with clear errors") {
    intercept[IllegalArgumentException](Cypher.parse("MATCH (a:X:Y) RETURN a"))
    intercept[IllegalArgumentException](Cypher.parse("MATCH (a)-[:K*1..2]-(b) RETURN a"))
    intercept[IllegalArgumentException](Cypher.parse("MATCH (a) RETURN b"))
    intercept[IllegalArgumentException](Cypher.parse("CREATE (a:X) RETURN a"))
  }
}
