package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.gripql._
import graft.model.GraphFrame
import graft.compiler.Traversal

/** Protojson query replay: JSON statement lists (the wire format the
  * reference's clients emit) parse and produce the same results as the
  * builder DSL on the SWAPI fixture. */
class JsonSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  lazy val g: GraphFrame = {
    val res = getClass.getResource("/swapi/swapi.vertices").getPath
    val dir = new java.io.File(res).getParent
    GraphFrame.fromJsonLines(spark, s"$dir/swapi.vertices", s"$dir/swapi.edges")
  }

  def run(json: String): Long =
    Traversal.run(spark, g, Json.parseQuery(json)).count()

  test("ot_basic shapes replay from JSON") {
    assert(run("""[{"v": []}]""") == 39)
    assert(run("""[{"v": ["Character:1"]}]""") == 1)
    assert(run("""[{"e": []}]""") == 144)
    assert(run("""[{"v": ["Starship:12"]}, {"out": ["pilots"]}]""") == 4)
    assert(run("""[{"v": []}, {"hasLabel": ["Character"]}]""") == 18)
    assert(run("""{"graph": "swapi", "query": [{"v": ["Film:1"]}, {"out": []}, {"out": []}, {"out": []}]}""") == 1814)
  }

  test("has expressions and aggregations replay from JSON") {
    assert(run("""[{"v": []}, {"has": {"condition": {"key": "eye_color", "value": "blue", "condition": "EQ"}}}]""") == 6)
    assert(run(
      """[{"v": []}, {"has": {"and": {"expressions": [
        |{"condition": {"key": "_label", "value": "Character", "condition": "EQ"}},
        |{"condition": {"key": "gender", "value": "male", "condition": "EQ"}}]}}}]""".stripMargin) ==
      Traversal.run(spark, g, Query().V().has(
        P.and_(P.eq_("_label", "Character"), P.eq_("gender", "male")))).count())
    val agg = Traversal.run(spark, g, Json.parseQuery(
      """[{"v": []}, {"hasLabel": ["Character"]},
        |{"aggregate": {"aggregations": [{"name": "gender", "term": {"field": "gender"}}]}}]""".stripMargin))
      .collect().map(r => (r.getString(1), r.getDouble(2))).toMap
    assert(agg("male") > 0 && agg("female") > 0)
  }

  test("control flow replays from JSON (ot_repeat shape)") {
    val json =
      """[{"v": ["Character:1"]}, {"set": {"key": "count", "value": 0}}, {"as": "start"},
        |{"mark": "a"}, {"out": []}, {"increment": {"key": "$start.count", "value": 1}},
        |{"has": {"condition": {"key": "$start.count", "value": 2, "condition": "LT"}}},
        |{"jump": {"mark": "a", "expression": null, "emit": true}}]""".stripMargin
    assert(run(json) == 4)
  }

  test("select/render/path replay from JSON") {
    assert(run("""[{"v": ["Film:1"]}, {"as": "a"}, {"out": ["characters"]}, {"select": {"marks": ["a"]}}]""") == 18)
    assert(run("""[{"v": ["Film:1"]}, {"render": {"title": "$.title"}}]""") == 1)
    assert(run("""[{"v": ["Film:1"]}, {"out": []}, {"path": []}]""") == n_out_film1)
    assert(run("""[{"v": []}, {"hasLabel": ["Character"]}, {"range": {"start": 2, "stop": 7}}]""") == 5)
  }

  lazy val n_out_film1: Long = Traversal.run(spark, g, Query().V("Film:1").out()).count()
}
