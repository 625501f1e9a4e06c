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

  test("root arguments: ids, scalar shorthand, filter object, first/offset paging") {
    // ids multi-select
    val two = run("""{ Planet(ids: ["Planet:1", "Planet:2"]) { gid } }""")
    assert(two.map(_.get("gid").asText()).toSet == Set("Planet:1", "Planet:2"))
    // id behaves like gid (graphqlv2's ARG_ID)
    val one = run("""{ Planet(id: "Planet:1") { name } }""")
    assert(one.map(_.get("name").asText()) == Seq("Tatooine"))
    // scalar field shorthand arg → equality on the data document
    val blue = run("""{ Character(eye_color: "blue") { name } }""")
    assert(blue.map(_.get("name").asText()).toSet contains "Luke Skywalker")
    assert(blue.forall(_.get("name").asText() != "C-3PO"))
    // filter object: {gt: {...}} with numeric cast, {eq: {id: ...}} maps to gid
    val tall = run("""{ Character(filter: {gt: {height: 200}}) { name height } }""")
    assert(tall.nonEmpty && tall.forall(_.get("height").asText().toDouble > 200))
    val byId = run("""{ Character(filter: {eq: {id: "Character:1"}}) { name } }""")
    assert(byId.map(_.get("name").asText()) == Seq("Luke Skywalker"))
    // first/offset page on the sorted root gid — deterministic
    val all = run("""{ Planet { gid } }""").map(_.get("gid").asText()).sorted
    val page = run("""{ Planet(first: 1, offset: 1) { gid } }""").map(_.get("gid").asText())
    assert(page == all.slice(1, 2))
    // unknown filter operator is loud
    val e = intercept[IllegalArgumentException](
      run("""{ Planet(filter: {regex: {name: "T.*"}}) { gid } }"""))
    assert(e.getMessage.contains("unsupported filter operator"))
  }

  test("keyset paging: after cursor pages like offset but with no global sort") {
    val all = run("""{ Planet { gid } }""").map(_.get("gid").asText()).sorted
    // page 2 via cursor == page 2 via offset
    val cursorPage = run(s"""{ Planet(first: 1, after: "${all.head}") { gid } }""")
      .map(_.get("gid").asText())
    assert(cursorPage == all.slice(1, 2))
    // cursor composes with other predicates
    val filtered = run(s"""{ Character(eye_color: "blue", first: 2, after: "") { gid } }""")
    assert(filtered.nonEmpty)
    // plan shape: after+first plans as TakeOrderedAndProjectExec with NO
    // standalone SortExec (a global sort+exchange is offset paging's
    // cost). Probed by node class on the pre-AQE physical plan — not by
    // plan-string formatting — so the pin survives rendering/AQE changes.
    val df = GraphQL.run(spark, g, s"""{ Planet(first: 1, after: "${all.head}") { gid } }""")
    import org.apache.spark.sql.execution.{SortExec, TakeOrderedAndProjectExec}
    val pp = df.queryExecution.sparkPlan
    assert(pp.collect { case t: TakeOrderedAndProjectExec => t }.nonEmpty,
      s"after+first must plan as TakeOrdered:\n$pp")
    assert(pp.collect { case s: SortExec => s }.isEmpty,
      s"no standalone global sort for keyset paging:\n$pp")
    // malformed paging args are loud, not ignored
    val e1 = intercept[IllegalArgumentException](run("""{ Planet(first: "10") { gid } }"""))
    assert(e1.getMessage.contains("paging argument"))
    val e2 = intercept[IllegalArgumentException](run("""{ Planet(after: 3) { gid } }"""))
    assert(e2.getMessage.contains("paging argument"))
    // 'after' + 'offset' don't compose — rejected, not silently reshaped
    val e3 = intercept[IllegalArgumentException](
      run("""{ Planet(first: 1, offset: 1, after: "x") { gid } }"""))
    assert(e3.getMessage.contains("cannot be combined"))
  }

  test("nested-field arguments are rejected loudly, not silently dropped") {
    val e = intercept[IllegalArgumentException](
      run("""{ Character(gid: "Character:1") { name homeworld(first: 2) { name } } }"""))
    assert(e.getMessage.contains("nested field 'homeworld'"))
  }

  test("<Label>Aggregation: _totalCount + term histograms, filter arg, sorted buckets") {
    val rows = run("""{ CharacterAggregation { _totalCount eye_color } }""")
    assert(rows.size == 1)
    val a = rows.head
    val total = a.get("_totalCount").asLong()
    assert(total == 18) // the fixture's Character vertices
    val hist = a.get("eye_color").get("histogram")
    assert(hist.isArray && hist.size() > 1)
    // buckets sort count desc, then key asc
    val counts = (0 until hist.size()).map(hist.get(_).get("count").asLong())
    assert(counts == counts.sortBy(-_))
    assert(counts.sum <= total) // docs without the field don't bucket
    // filter narrows the stream before aggregation
    val blue = run(
      """{ CharacterAggregation(filter: {eq: {eye_color: "blue"}}) { _totalCount } }""").head
    val blueTotal = blue.get("_totalCount").asLong()
    assert(blueTotal > 0 && blueTotal < total)
    assert(!blue.has("eye_color")) // only the selected fields appear
  }

  test("typeSystem builds object types + edge list fields from the sampled schema") {
    val schema = graft.model.SchemaSampler.sampleSchema(spark, g)
    val types = GraphQL.typeSystem(schema)
    val byName = types.map(t => t.name -> t).toMap
    assert(byName.contains("Character") && byName.contains("Planet") && byName.contains("Film"))
    val ch = byName("Character")
    // id is always first; sampled scalars map STRING→String, NUMERIC→Float
    assert(ch.fields.head == GraphQL.GqlField("id", "String", list = false))
    assert(ch.fields.exists(f => f.name == "name" && f.tpe == "String" && !f.list))
    assert(ch.fields.exists(f => f.name == "height" && f.tpe == "Float"))
    // edge triples become object-list fields
    assert(ch.fields.exists(f => f.name == "homeworld" && f.tpe == "Planet" && f.list))
    assert(byName("Film").fields.exists(f => f.name == "characters" && f.tpe == "Character" && f.list))
    // SDL renders every type plus the Query root with the standard args
    val sdl = GraphQL.sdl(types)
    assert(sdl.contains("scalar JSON"))
    assert(sdl.contains("type Character {"))
    assert(sdl.contains("homeworld: [Planet]"))
    assert(sdl.contains(
      "Character(id: String, ids: [String], first: Int, offset: Int, filter: JSON): [Character]"))
    // aggregation companions: histogram plumbing + per-label objects
    assert(sdl.contains("type BucketsForString {"))
    assert(sdl.contains("type CharacterAggregation {"))
    assert(sdl.contains("eye_color: Histogram"))
    assert(sdl.contains("CharacterAggregation(filter: JSON): CharacterAggregation"))
  }

  test("__schema and __type introspection answer from the type system") {
    val types = GraphQL.typeSystem(graft.model.SchemaSampler.sampleSchema(spark, g))
    // a data query is not introspection
    assert(GraphQL.introspection(types, "{ Planet { gid } }").isEmpty)
    val schemaResp = om.readTree(GraphQL.introspection(types,
      "{ __schema { queryType { name } types { name kind } } }").get)
    val sch = schemaResp.get("data").get("__schema")
    assert(sch.get("queryType").get("name").asText() == "Query")
    val names = (0 until sch.get("types").size()).map(sch.get("types").get(_).get("name").asText())
    assert(names.contains("Query") && names.contains("Character") && names.contains("JSON"))
    // the selection is honored: only name+kind were asked for
    assert(!sch.get("types").get(0).has("fields"))
    // __type drills into one object with field types
    val t = om.readTree(GraphQL.introspection(types,
      """{ __type(name: "Character") { name fields { name type { kind name ofType { name } } } } }""").get)
      .get("data").get("__type")
    assert(t.get("name").asText() == "Character")
    val fields = (0 until t.get("fields").size()).map(t.get("fields").get)
    val hw = fields.find(_.get("name").asText() == "homeworld").get
    assert(hw.get("type").get("kind").asText() == "LIST")
    assert(hw.get("type").get("ofType").get("name").asText() == "Planet")
    // unknown type name → null result; unknown field → loud error
    assert(om.readTree(GraphQL.introspection(types,
      """{ __type(name: "Midichlorian") { name } }""").get).get("data").get("__type").isNull)
    val e = intercept[IllegalArgumentException](
      GraphQL.introspection(types, "{ __schema { bogus } }"))
    assert(e.getMessage.contains("unknown introspection field"))
  }

  test("errors: unknown edge selection, malformed text") {
    val e1 = intercept[IllegalArgumentException](run("""{ Character { bogus { name } } }"""))
    assert(e1.getMessage.contains("not an edge label"))
    val e2 = intercept[IllegalArgumentException](run("""{ A { x } { B { y } }"""))
    assert(e2.getMessage.contains("root field"))
  }
}
