package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.model.GraphFrame
import graft.server.GraphQL

/** GraphQL endpoint over the SWAPI fixture (reference behavior:
  * endpoints/graphqlv2 — schema-typed nested reads). The whole selection
  * tree compiles into one plan; children roll up via collect_list. */
class GraphQLSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  lazy val g: GraphFrame = {
    val res = getClass.getResource("/swapi/swapi.vertices").getPath
    val dir = new java.io.File(res).getParent
    val gf = GraphFrame.fromJsonLines(spark, s"$dir/swapi.vertices", s"$dir/swapi.edges")
    GraphFrame(gf.vertices.cache(), gf.edges.cache())
  }
  private val om = new com.fasterxml.jackson.databind.ObjectMapper()
  private def run(q: String): Seq[com.fasterxml.jackson.databind.JsonNode] =
    GraphQL.run(spark, g, q).collect().map(r => om.readTree(r.getString(0))).toSeq

  test("point read with nested edge hop") {
    val rows = run("""{ Character(gid: "Character:1") { name homeworld { name } } }""")
    assert(rows.size == 1)
    val c = rows.head
    assert(c.get("name").asText() == "Luke Skywalker")
    assert(c.get("homeworld").size() == 1)
    assert(c.get("homeworld").get(0).get("name").asText() == "Tatooine")
  }

  test("three-level nesting in one plan") {
    val rows = run("""{ Film(gid: "Film:1") { title characters { name homeworld { name } } } }""")
    assert(rows.size == 1)
    val f = rows.head
    assert(f.get("title").asText() == "A New Hope")
    assert(f.get("characters").size() == 18)
    val luke = (0 until 18).map(f.get("characters").get)
      .find(_.get("name").asText() == "Luke Skywalker").get
    assert(luke.get("homeworld").get(0).get("name").asText() == "Tatooine")
  }

  test("label-wide query, gid/label reserved fields, empty edge lists") {
    val rows = run("""{ Planet { gid label residents { name } } }""")
    assert(rows.size == 3)
    assert(rows.forall(_.get("label").asText() == "Planet"))
    // every Planet row has a residents array (possibly empty), sorted children
    assert(rows.map(_.get("gid").asText()).toSet == Set("Planet:1", "Planet:2", "Planet:3"))
    assert(rows.forall(_.get("residents").isArray))
  }

  test("errors: unknown edge selection, malformed text") {
    val e1 = intercept[IllegalArgumentException](run("""{ Character { bogus { name } } }"""))
    assert(e1.getMessage.contains("not an edge label"))
    val e2 = intercept[IllegalArgumentException](run("""{ A { x } { B { y } }"""))
    assert(e2.getMessage.contains("root field"))
  }
}
