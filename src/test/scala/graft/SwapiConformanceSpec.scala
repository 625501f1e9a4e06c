package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite
import graft.gripql._
import graft.model.GraphFrame
import graft.compiler.Traversal

/** Golden-count conformance tests ported from the reference's black-box
  * suite (reference: conformance/tests/ot_*.py) over the SWAPI fixture
  * (39 vertices / 144 edges).
  */
object SparkTestSession {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      // the shipped extension set (optimizer rules + graft_dot), exactly
      // as the Verify/Bench/server sessions run
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      // deliberately NO ansi/mapKeyDedupPolicy overrides: the engine must
      // behave correctly under Spark 4 defaults (ANSI on)
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}

class SwapiConformanceSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  lazy val g: GraphFrame = {
    val res = getClass.getResource("/swapi/swapi.vertices").getPath
    val dir = new java.io.File(res).getParent
    val gf = GraphFrame.fromJsonLines(spark, s"$dir/swapi.vertices", s"$dir/swapi.edges")
    GraphFrame(gf.vertices.cache(), gf.edges.cache())
  }

  def run(q: Query): DataFrame = Traversal.run(spark, g, q)
  def n(q: Query): Long = run(q).count()
  def cnt(q: Query): Long = run(q).collect()(0).getLong(0)
  def Q = Query()

  // ---- ot_basic.py
  test("V() = 39, E() = 144, point lookups") {
    assert(n(Q.V()) == 39)
    assert(n(Q.V("Character:1")) == 1)
    assert(n(Q.V("non-existent")) == 0)
    assert(n(Q.E()) == 144)
    assert(n(Q.E("Film:1-characters-Character:1")) == 1)
  }

  test("out/in basics") {
    assert(n(Q.V("Starship:12").out()) == 5)
    assert(n(Q.V("Starship:12").out("pilots")) == 4)
    assert(n(Q.E("Film:1-characters-Character:1").out()) == 1)
    assert(run(Q.E("Film:1-characters-Character:1").out()).collect()(0).getString(0) == "Character:1")
    assert(n(Q.V("Starship:12").in()) == 5)
    assert(n(Q.V("Starship:12").in("starships")) == 5)
    assert(n(Q.V("Starship:12").in("pilots")) == 0)
    assert(n(Q.E("Film:1-characters-Character:1").in()) == 1)
    assert(run(Q.E("Film:1-characters-Character:1").in()).collect()(0).getString(0) == "Film:1")
  }

  test("outE/inE/both/bothE") {
    assert(cnt(Q.V("Character:1").outE().count()) == 4)
    assert(cnt(Q.V("Character:1").outE("homeworld").count()) == 1)
    assert(cnt(Q.V("Character:1").inE().count()) == 4)
    assert(cnt(Q.V("Character:1").inE("residents").count()) == 1)
    assert(n(Q.V("Starship:12").both()) == 10)
    assert(n(Q.V("Starship:12").both("pilots", "starships")) == 9)
    assert(n(Q.E("Film:1-characters-Character:1").both()) == 2)
    assert(cnt(Q.V("Character:1").bothE().count()) == 8)
    assert(cnt(Q.V("Character:1").bothE("homeworld", "residents").count()) == 2)
  }

  test("limit/skip/range") {
    assert(n(Q.V().limit(3)) == 3)
    assert(n(Q.E().limit(3)) == 3)
    assert(n(Q.V().skip(3).limit(3)) == 3)
    assert(n(Q.V().range(3, 5)) == 2)
    assert(n(Q.V().range(34, -1)) == 5)
    assert(n(Q.E().range(120, 123)) == 3)
    assert(n(Q.E().range(140, -1)) == 4)
  }

  // ---- ot_count.py
  test("count terminal") {
    assert(cnt(Q.V().count()) == 39)
    assert(cnt(Q.V("non-existent").count()) == 0)
    assert(cnt(Q.E().count()) == 144)
    assert(cnt(Q.E("non-existent").count()) == 0)
  }

  // ---- ot_has.py
  test("hasLabel / hasKey / hasId") {
    assert(n(Q.V().hasLabel("Vehicle")) == 4)
    assert(n(Q.V().hasLabel("Vehicle", "Starship")) == 12)
    assert(n(Q.V().hasKey("manufacturer")) == 12)
    assert(n(Q.V().hasKey("hyperdrive_rating", "manufacturer")) == 8)
    assert(n(Q.V().hasId("Character:1")) == 1)
    assert(n(Q.V().hasId("Character:1", "Character:2")) == 2)
  }

  test("has eq/neq") {
    assert(n(Q.V().has(P.eq_("_gid", "Character:3"))) == 1)
    assert(n(Q.V().has(P.eq_("_label", "Character"))) == 18)
    assert(n(Q.V().has(P.eq_("eye_color", "brown"))) == 4)
    assert(n(Q.V().has(P.neq("_gid", "Character:1"))) == 38)
    assert(n(Q.V().has(P.neq("_label", "Character"))) == 21)
    assert(n(Q.V().hasLabel("Character").has(P.neq("eye_color", "brown"))) == 14)
  }

  test("has numeric comparisons") {
    assert(n(Q.V().has(P.gt("height", 202))) == 1)
    assert(n(Q.V().has(P.gte("height", 202))) == 2)
    assert(n(Q.V().has(P.lt("height", 97))) == 1)
    assert(n(Q.V().has(P.lte("height", 97))) == 2)
    assert(n(Q.V().has(P.inside("height", 100, 200))) == 14)
    assert(n(Q.V().has(P.outside("height", 100, 200))) == 4)
    assert(n(Q.V().has(P.between("height", 180, 200))) == 6)
  }

  test("has within/without/contains") {
    assert(n(Q.V().has(P.within("eye_color", "brown", "hazel"))) == 5)
    assert(n(Q.V().has(P.within("eye_color"))) == 0)
    assert(n(Q.V().has(P.without("eye_color", "brown"))) == 35)
    assert(n(Q.V().has(P.without("occupation"))) == 39)
    assert(n(Q.V().has(P.contains("terrain", "jungle"))) == 1)
  }

  test("has boolean combinators") {
    assert(n(Q.V().has(P.and_(P.eq_("_label", "Character"), P.eq_("eye_color", "blue")))) == 6)
    assert(n(Q.V().has(P.or_(P.eq_("eye_color", "blue"), P.eq_("eye_color", "hazel")))) == 7)
    assert(n(Q.V().has(P.not_(P.or_(P.eq_("_label", "Character"),
      P.or_(P.eq_("name", "Human"), P.contains("terrain", "jungle")))))) == 19)
    assert(n(Q.V().has(P.not_(P.and_(P.eq_("_label", "Planet"),
      P.or_(P.eq_("surface_water", 1), P.contains("terrain", "jungle")))))) == 37)
  }

  // ---- ot_distinct.py
  test("distinct") {
    assert(n(Q.V().distinct()) == 39)
    assert(n(Q.V().distinct("_gid")) == 39)
    assert(n(Q.V().distinct("eye_color")) == 8)
    assert(n(Q.V().distinct("gender")) == 4)
    assert(n(Q.V().distinct("non-existent-field")) == 0)
    assert(n(Q.V().hasLabel("Character").as("person").out().distinct("$person.name")) == 18)
    assert(n(Q.V().hasLabel("Character").as("person").out().distinct("$person.eye_color")) == 8)
    assert(n(Q.V().as("a").out().distinct("$a.eye_color", "_gid")) == 29)
  }

  // ---- ot_select.py / ot_mark.py
  test("as/select") {
    val one = run(Q.V().hasLabel("Character").as("a").out().select("a"))
    assert(one.count() == 52)
    assert(one.select("label").distinct().collect().map(_.getString(0)).toSet == Set("Character"))
    assert(n(Q.V().hasLabel("Character").as("person")
      .out("homeworld").has(P.eq_("name", "Tatooine")).select("person").out("species")) == 7)
    assert(n(Q.V("Film:1").as("a").out().as("b").select("a", "b")) == 38)
    assert(n(Q.V("Character:1").as("a").out().as("b").out().as("c").select("a", "b", "c")) == 64)
  }

  // ---- ot_path_optimize.py
  test("multi-hop traversals") {
    assert(n(Q.V("Film:1").out().out().out()) == 1814)
    assert(n(Q.V("Film:1").in().in()) == 106)
  }

  // ---- ot_path.py
  test("path") {
    val rows = run(Q.V("Film:1").out().out().out().path()).collect()
    assert(rows.length == 1814)
    val first = rows(0).getSeq[org.apache.spark.sql.Row](0)
    assert(first.length == 4)
    assert(first.head.getString(0) == "Film:1")
    val sel = run(Q.V("Film:1").as("a").outE().as("b").out().select("b").path()).collect()
    assert(sel.nonEmpty)
    sel.foreach { r =>
      val p = r.getSeq[org.apache.spark.sql.Row](0)
      assert(p.length == 4)
      assert(p(1) == p(3))
    }
  }

  // ---- ot_null.py
  test("null traversals") {
    val noStarship = Set("Character:2", "Character:3", "Character:5", "Character:6",
      "Character:7", "Character:8", "Character:10", "Character:12", "Character:15", "Character:16")
    val rows = run(Q.V().hasLabel("Character").as("a").outNull("starships").as("b")
      .render(GValue.GArray(Seq(GValue.GString("$a._gid"), GValue.GString("$b._gid")))))
      .collect().map(_.getString(0))
    val nullFound = rows.filter { s =>
      noStarship.exists(c => s.contains("\"" + c + "\""))
    }
    assert(nullFound.length == noStarship.size)
  }

  // ---- ot_aggregations.py
  test("term aggregation") {
    val rows = run(Q.V().aggregate(Agg.Term("simple-agg", "eye_color")))
      .collect().map(r => r.getString(1) -> r.getDouble(2)).toMap
    assert(rows == Map("brown" -> 4d, "blue" -> 6d, "red" -> 2d, "yellow" -> 2d,
      "black" -> 1d, "blue-gray" -> 1d, "hazel" -> 1d, "orange" -> 1d))
  }

  test("histogram aggregation with dense buckets") {
    val rows = run(Q.V("Film:1").out().hasLabel("Character")
      .aggregate(Agg.Histogram("hist", "height", 25)))
      .collect().map(r => r.getString(1).toDouble.toInt -> r.getDouble(2)).toMap
    assert(rows == Map(75 -> 2d, 100 -> 0d, 125 -> 0d, 150 -> 6d, 175 -> 8d, 200 -> 1d, 225 -> 1d))
  }

  test("percentile aggregation within 15%") {
    val percents = Seq(1d, 5d, 25d, 50d, 75d, 95d, 99d, 99.9)
    val heights = Seq(96, 97, 150, 165, 167, 170, 172, 173, 175, 178, 180, 180, 180, 182, 183, 188, 202, 228)
      .map(_.toDouble).sorted
    def npPercentile(p: Double): Double = {
      val idx = (heights.length - 1) * p / 100.0
      val lo = idx.floor.toInt; val hi = idx.ceil.toInt
      heights(lo) + (heights(hi) - heights(lo)) * (idx - lo)
    }
    val rows = run(Q.V("Film:1").out().hasLabel("Character")
      .aggregate(Agg.Percentile("pct", "height", percents)))
      .collect().map(r => r.getString(1).toDouble -> r.getDouble(2)).toMap
    assert(rows.size == percents.size)
    for ((p, v) <- rows) {
      val expect = npPercentile(p)
      assert(v > expect * 0.85 && v < expect * 1.15, s"percentile $p: $v vs $expect")
    }
  }

  test("field and type aggregations") {
    val fieldRows = run(Q.V().hasLabel("Character").aggregate(Agg.FieldAgg("f", "_data")))
      .collect().map(r => r.getString(1) -> r.getDouble(2)).toMap
    assert(fieldRows("name") == 18d)
    assert(fieldRows("eye_color") == 18d)
    val typeRows = run(Q.V().hasLabel("Character").aggregate(Agg.TypeAgg("t", "height")))
      .collect().map(r => r.getString(1) -> r.getDouble(2)).toMap
    assert(typeRows.getOrElse("NUMERIC", 0d) >= 17d)
  }

  // ---- ot_fields.py
  test("fields include/exclude") {
    val r = run(Q.V("Character:1").fields("name")).collect()(0)
    assert(r.getString(0) == "Character:1")
    assert(r.getString(1) == "Character")
    assert(r.getString(4) == """{"name":"Luke Skywalker"}""")
    val r2 = run(Q.V("Character:1").fields("non-existent")).collect()(0)
    assert(r2.getString(4) == "{}")
  }

  // ---- ot_render.py (shape checks on swapi labels)
  test("render") {
    val rows = run(Q.V().hasLabel("Character").render(GValue.GObj(Seq(
      "Name" -> GValue.GString("name"), "NonExistent" -> GValue.GString("non-existent")))))
      .collect().map(_.getString(0))
    assert(rows.length == 18)
    assert(rows.forall(s => s.contains("\"Name\":") && s.contains("\"NonExistent\":null")))
    val luke = run(Q.V("Character:1").render(GValue.GObj(Seq(
      "n" -> GValue.GString("name"), "h" -> GValue.GString("height")))))
      .collect()(0).getString(0)
    assert(luke == """{"n":"Luke Skywalker","h":172}""")
  }

  // ---- ot_repeat.py
  test("jump: basic cycle = 4 rows") {
    val q = Q.V("Character:1").set("count", GValue.GInt(0)).as("start").mark("a").out()
      .increment("$start.count").has(P.lt("$start.count", 2))
      .jump("a", None, emit = true)
    assert(n(q) == 4)
  }

  test("jump: deep walk = 11786 rows") {
    val q = Q.V().set("count", GValue.GInt(0)).as("start").mark("a")
      .increment("$start.count").has(P.lt("$start.count", 4)).out()
      .jump("a", None, emit = true)
    assert(n(q) == 11786)
  }

  test("jump: forward jump") {
    val q = Q.V().jump("skip", Some(P.eq_("_label", "Character")), emit = true).out()
      .has(P.eq_("_label", "Character")).mark("skip").path()
    val rows = run(q).collect().map(_.getSeq[org.apache.spark.sql.Row](0))
    assert(rows.count(_.length == 1) == 18)
    assert(rows.count(_.length == 2) == 52)
    rows.foreach(p => assert(p.last.getString(0).startsWith("Character:")))
  }

  test("jump: infinite loop bounded by limit") {
    val q = Q.V("Character:1").mark("a").out().jump("a", None, emit = true).limit(100)
    assert(n(q) == 100)
  }

  // ---- ot_repeat.py test_set
  test("set/increment") {
    val r1 = run(Q.V("Character:1").set("count", GValue.GInt(0)).as("start")
      .render(GValue.GString("$start._data"))).collect()(0).getString(0)
    assert(r1.contains("\"count\":0"))
    val r2 = run(Q.V("Character:1").set("count", GValue.GInt(0)).as("start").out()
      .increment("$start.count").render(GValue.GString("$start._data")))
      .collect().map(_.getString(0))
    assert(r2.forall(_.contains("\"count\":1")))
    val r3 = run(Q.V("Character:1").set("count", GValue.GInt(0)).as("start").out()
      .increment("$start.count").increment("$start.count")
      .has(P.gt("$start.count", 1.0)).render(GValue.GString("$start._data")))
      .collect().map(_.getString(0))
    assert(r3.length == 4)
    assert(r3.forall(_.contains("\"count\":2")))
    val r4 = run(Q.V("Character:1").set("count", GValue.GInt(0)).increment("count", 2).as("start")
      .out().increment("$start.count").render(GValue.GString("$start._data")))
      .collect().map(_.getString(0))
    assert(r4.forall(_.contains("\"count\":3")))
  }

  // ---- ot_unwind-ish (unwind on array field)
  test("unwind") {
    val terrains = run(Q.V().hasLabel("Planet").unwind("terrain")).count()
    assert(terrains >= 3)
  }
}
