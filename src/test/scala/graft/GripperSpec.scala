package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.gripql._
import graft.model.{Gripper, EdgeType}
import graft.model.Gripper.FrameSource
import graft.compiler.Traversal

/** Declarative "collections as graph" mapping — the Spark-native GRIPPER
  * (reference: gripper/config.go, gripper/graph.go, fixtures
  * gripper/test-graph/swapi.yaml). The mapping shape, gid construction,
  * edge-skip rules, and validation errors mirror the reference; the test
  * tables are a hand-built swapi-like subset. */
class GripperSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  // swapi.yaml-shaped mapping: vertex collections keyed by `id`, one
  // field-to-id edge (homeworld lives ON the Character rows) and one
  // link-table edge (filmCharacters rows carry from/to fields)
  private val mappingYaml =
    """
vertices:
  - gid: "Character:"
    label: Character
    data:
      source: tableServer
      collection: Character
  - gid: "Planet:"
    label: Planet
    data:
      source: tableServer
      collection: Planet
  - gid: "Film:"
    label: Film
    data:
      source: tableServer
      collection: Film
edges:
  - gid: homeworld
    from: "Character:"
    to: "Planet:"
    label: homeworld
    data:
      source: tableServer
      collection: Character
      fromField: id
      toField: homeworld
  - gid: characters
    from: "Film:"
    to: "Character:"
    label: characters
    data:
      source: tableServer
      collection: filmCharacters
      fromField: from
      toField: to
"""

  private lazy val source = FrameSource(Map(
    "Character" -> Seq(
      ("1", "Luke Skywalker", "blue", "1"),
      ("2", "C-3PO", "yellow", "1"),
      ("5", "Leia Organa", "brown", "2"),
      ("22", "Boba Fett", "brown", "")) // empty homeworld → no edge
      .toDF("id", "name", "eye_color", "homeworld"),
    "Planet" -> Seq(("1", "Tatooine"), ("2", "Alderaan")).toDF("id", "name"),
    "Film" -> Seq(("1", "A New Hope")).toDF("id", "title"),
    "filmCharacters" -> Seq(("1", "1", "1"), ("2", "1", "5"), ("3", "1", "9"))
      .toDF("id", "from", "to"))) // "9" dangles: edge row emitted, hop finds no vertex

  private lazy val graph = Gripper.graph(Gripper.parse(mappingYaml),
    Map("tableServer" -> source))

  private def Q = Query()

  test("mapping parses from YAML (list layout) and from JSON (map layout)") {
    val conf = Gripper.parse(mappingYaml)
    assert(conf.vertices.map(_.prefix) == Seq("Character:", "Planet:", "Film:"))
    assert(conf.edges.map(_.prefix) == Seq("homeworld", "characters"))
    assert(conf.edges.head.data.toField == "homeworld")
    // map-keyed layout (gripper/config.go GraphConfig), JSON is valid YAML
    val json =
      """{"vertices": {"P:": {"label": "Planet",
        |  "data": {"source": "s", "collection": "Planet"}}}, "edges": {}}""".stripMargin
    val conf2 = Gripper.parse(json)
    assert(conf2.vertices == Seq(
      Gripper.VertexConfig("P:", "Planet", Gripper.ElementConfig("s", "Planet"))))
  }

  test("vertex and edge gids follow the reference's construction") {
    val vGids = graph.vertices.select("gid").as[String].collect().toSet
    assert(vGids.contains("Character:1") && vGids.contains("Planet:2") && vGids.contains("Film:1"))
    // GenID: from + "-" + label + "-" + to (reference: gripper/sources.go:16-21)
    val eGids = graph.edges.select("gid").as[String].collect().toSet
    assert(eGids.contains("Character:1-homeworld-Planet:1"))
    assert(eGids.contains("Film:1-characters-Character:5"))
    // Boba Fett's empty homeworld produced no edge (graph.go:377-390)
    assert(!eGids.exists(_.startsWith("Character:22-")))
  }

  test("traversals run over the mapped graph in both directions") {
    assert(Traversal.run(spark, graph, Q.V().count()).collect()(0).getLong(0) == 7)
    // field-to-id edge: Character → homeworld Planet
    val home = Traversal.run(spark, graph,
      Q.V("Character:1").out("homeworld")).collect()
    assert(home.map(_.getAs[String]("gid")).toSeq == Seq("Planet:1"))
    // reverse: who lives on Tatooine
    assert(Traversal.run(spark, graph,
      Q.V("Planet:1").in("homeworld").count()).collect()(0).getLong(0) == 2)
    // link-table edge; the dangling "9" endpoint joins to no vertex
    assert(Traversal.run(spark, graph,
      Q.V("Film:1").out("characters").count()).collect()(0).getLong(0) == 2)
    // row document (incl. the id field) is the element data, as in the
    // reference's table server rows
    val luke = Traversal.run(spark, graph,
      Q.V().hasLabel("Character").has(P.eq_("eye_color", "blue"))).collect()
    assert(luke.length == 1 && luke(0).getAs[String]("data").contains("\"name\":\"Luke Skywalker\""))
  }

  test("the mapping's edge triples become the planner topology") {
    assert(graph.topology.contains(Seq(
      EdgeType("Character", "homeworld", "Planet"),
      EdgeType("Film", "characters", "Character"))))
  }

  test("a fully mapped SWAPI is traversal-equivalent to the loaded fixture") {
    import org.apache.spark.sql.functions._
    val res = getClass.getResource("/swapi/swapi.vertices").getPath
    val dir = new java.io.File(res).getParent
    val direct = graft.model.GraphFrame.fromJsonLines(
      spark, s"$dir/swapi.vertices", s"$dir/swapi.edges")

    // derive one collection per vertex label (id = gid sans prefix) and one
    // per (fromLabel, label, toLabel) triple — the shape the reference's
    // table server exposes (gripper/test-graph: entity TSVs + link TSVs)
    val vLab = direct.vertices.select(col("gid"), col("label"))
    val triples = direct.edges.alias("e")
      .join(vLab.select(col("gid").as("from"), col("label").as("fl")), "from")
      .join(vLab.select(col("gid").as("to"), col("label").as("tl")), "to")
      .select(col("fl"), col("e.label").as("el"), col("tl"))
      .distinct().collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
      .sortBy(t => (t._1, t._2, t._3))
    val vertexLabels = vLab.select("label").distinct().as[String].collect().sorted

    val vCollections = vertexLabels.map { l =>
      l -> direct.vertices.filter(col("label") === l)
        .select(expr(s"substring(gid, ${l.length + 2})").as("id"))
    }
    val eCollections = triples.map { case (fl, el, tl) =>
      s"${fl}_${el}_$tl" -> direct.edges.filter(col("label") === el).alias("e")
        .join(vLab.filter(col("label") === fl).select(col("gid").as("from")), "from")
        .join(vLab.filter(col("label") === tl).select(col("gid").as("to")), "to")
        .select(monotonically_increasing_id().cast("string").as("id"),
          expr(s"substring(from, ${fl.length + 2})").as("src"),
          expr(s"substring(to, ${tl.length + 2})").as("dst"))
    }
    val source = FrameSource((vCollections ++ eCollections).toMap)

    val conf = Gripper.GraphConfig(
      vertices = vertexLabels.map(l =>
        Gripper.VertexConfig(s"$l:", l, Gripper.ElementConfig("s", l))),
      edges = triples.zipWithIndex.map { case ((fl, el, tl), i) =>
        Gripper.EdgeConfig(s"e$i", from = s"$fl:", to = s"$tl:", label = el,
          data = Gripper.ElementConfig("s", s"${fl}_${el}_$tl", "src", "dst"))
      })
    val mapped = Gripper.graph(conf, Map("s" -> source))

    // identical vertex gid set, identical (from, label, to) edge multiset
    assert(mapped.vertices.select("gid").as[String].collect().sorted.toSeq ==
      direct.vertices.select("gid").as[String].collect().sorted.toSeq)
    def fmt(df: org.apache.spark.sql.DataFrame) =
      df.select(col("from"), col("label"), col("to")).as[(String, String, String)]
        .collect().sorted.toSeq
    assert(fmt(mapped.edges) == fmt(direct.edges))

    // same conformance answers through the full compiler
    def n(g: graft.model.GraphFrame, q: Query) =
      Traversal.run(spark, g, q).collect()(0).getLong(0)
    for (q <- Seq(
        Q.V().hasLabel("Character").out("homeworld").count(),
        Q.V("Film:1").out().out().out().count(),
        Q.V("Starship:12").out("pilots").count()))
      assert(n(mapped, q) == n(direct, q))
  }

  test("config validation mirrors NewTabularGraph's errors") {
    def failing(tweak: Gripper.GraphConfig => Gripper.GraphConfig): String = {
      val e = intercept[RuntimeException] {
        Gripper.graph(tweak(Gripper.parse(mappingYaml)), Map("tableServer" -> source))
      }
      e.getMessage
    }
    // unknown collection (graph.go:66-70)
    assert(failing(c => c.copy(vertices = c.vertices.map(v =>
      v.copy(data = v.data.copy(collection = "Nope"))))).contains("Unable to get collection"))
    // edge endpoint not a vertex config (graph.go:74-79)
    assert(failing(c => c.copy(edges = c.edges.map(e => e.copy(to = "Starship:"))))
      .contains("Edge ToVertex not found"))
    // missing fromField/toField info (graph.go:97-99)
    assert(failing(c => c.copy(edges = c.edges.map(e =>
      e.copy(data = e.data.copy(toField = ""))))).contains("Edge missing config info"))
    // from/to field absent from the edge collection (graph.go:87-95)
    assert(failing(c => c.copy(edges = c.edges.map(e =>
      e.copy(data = e.data.copy(toField = "no_such_col")))))
      .contains("'To' Field not indexed"))
  }
}
