package graft

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.scalatest.funsuite.AnyFunSuite
import graft.gripql._
import graft.model.GraphFrame
import graft.compiler.Traversal

/** Port of the reference's table-driven engine tests over the
  * users/products/purchases fixture (reference:
  * test/processors_test.go:24-617, fixture test/resources/smtest_*). The
  * fixture is 170 vertices / 200 edges; expected values are the reference's
  * golden answers. */
class SmtestSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  lazy val g: GraphFrame = {
    val res = getClass.getResource("/smtest/smtest_vertices.txt").getPath
    val dir = new java.io.File(res).getParent
    val gf = GraphFrame.fromJsonLines(spark, s"$dir/smtest_vertices.txt", s"$dir/smtest_edges.txt")
    GraphFrame(gf.vertices.cache(), gf.edges.cache())
  }

  private val mapper = new ObjectMapper()
  def Q = Query()
  def run(q: Query): DataFrame = Traversal.run(spark, g, q)
  def cnt(q: Query): Long = run(q).collect()(0).getLong(0)
  def gids(q: Query): Seq[String] = run(q).collect().map(_.getAs[String]("gid")).toSeq.sorted

  def assertPick(q: Query, expect: String*): Unit =
    assert(gids(q) == expect.sorted, s"for $q")

  // ---- scans + label filters (processors_test.go:31-77)
  test("V/E counts and label scans") {
    assert(cnt(Q.V().count()) == 170)
    assert(cnt(Q.E().count()) == 200)
    assert(cnt(Q.V().hasLabel("users").count()) == 50)
    assert(cnt(Q.V().hasLabel("products").count()) == 20)
    assert(cnt(Q.V().hasLabel("purchases").count()) == 100)
    assert(cnt(Q.V().hasLabel("users", "products", "purchases").count()) == 170)
    assert(cnt(Q.E().hasLabel("purchasedProducts").count()) == 100)
    assert(cnt(Q.E().hasLabel("userPurchases").count()) == 100)
    assert(cnt(Q.V().hasLabel("does-not-exist").count()) == 0)
    assert(cnt(Q.E().hasLabel("does-not-exist").count()) == 0)
  }

  // ---- adjacency (processors_test.go:84-225)
  test("out/in/both from each label") {
    assert(cnt(Q.V().hasLabel("users").out().count()) == 100)
    assertPick(Q.V("users:1").out(), "purchases:57")
    assert(cnt(Q.V().hasLabel("purchases").out().count()) == 100)
    assertPick(Q.V("purchases:1").out(), "products:3", "products:8")
    assert(cnt(Q.V().hasLabel("products").out().count()) == 0)
    assertPick(Q.V("products:1").out())
    assert(cnt(Q.V().hasLabel("users").in().count()) == 0)
    assertPick(Q.V("users:1").in())
    assert(cnt(Q.V().hasLabel("purchases").in().count()) == 100)
    assertPick(Q.V("purchases:1").in(), "users:7")
    assert(cnt(Q.V().hasLabel("products").in().count()) == 100)
    assertPick(Q.V("products:1").in(),
      "purchases:2", "purchases:19", "purchases:34", "purchases:59", "purchases:60")
    assert(cnt(Q.V().hasLabel("users").both().count()) == 100)
    assertPick(Q.V("users:1").both(), "purchases:57")
    assert(cnt(Q.V().hasLabel("purchases").both().count()) == 200)
    assertPick(Q.V("purchases:1").both(), "users:7", "products:3", "products:8")
    assert(cnt(Q.V().hasLabel("products").both().count()) == 100)
  }

  test("outE/inE/bothE from each label") {
    assert(cnt(Q.V().hasLabel("users").outE().count()) == 100)
    assertPick(Q.V("users:1").outE(), "userPurchases:users:1:purchases:57")
    assert(cnt(Q.V().hasLabel("purchases").outE().count()) == 100)
    assertPick(Q.V("purchases:1").outE(), "purchase_items:2", "purchase_items:3")
    assert(cnt(Q.V().hasLabel("products").outE().count()) == 0)
    assert(cnt(Q.V().hasLabel("users").inE().count()) == 0)
    assert(cnt(Q.V().hasLabel("purchases").inE().count()) == 100)
    assertPick(Q.V("purchases:1").inE(), "userPurchases:users:7:purchases:1")
    assert(cnt(Q.V().hasLabel("products").inE().count()) == 100)
    assertPick(Q.V("products:1").inE(),
      "purchase_items:4", "purchase_items:30", "purchase_items:56", "purchase_items:88", "purchase_items:89")
    assert(cnt(Q.V().hasLabel("users").bothE().count()) == 100)
    assert(cnt(Q.V().hasLabel("purchases").bothE().count()) == 200)
    assertPick(Q.V("purchases:1").bothE(),
      "userPurchases:users:7:purchases:1", "purchase_items:2", "purchase_items:3")
    assert(cnt(Q.V().hasLabel("products").bothE().count()) == 100)
  }

  // ---- predicates (processors_test.go:225-290)
  test("has conditions golden counts") {
    assert(cnt(Q.V().hasLabel("users").has(P.eq_("details", "\"sex\"=>\"M\"")).count()) == 17)
    assert(cnt(Q.V().hasLabel("users").has(P.not_(P.eq_("details", "\"sex\"=>\"M\""))).count()) == 33)
    assert(cnt(Q.V().hasLabel("users").has(P.neq("details", "\"sex\"=>\"M\"")).count()) == 33)
    assert(cnt(Q.V().hasLabel("purchases").has(P.or_(P.eq_("state", "TX"), P.eq_("state", "WY"))).count()) == 19)
    assertPick(Q.V().hasLabel("products").has(P.eq_("price", 29.99)), "products:2")
    assert(cnt(Q.V().hasLabel("products").has(P.gt("price", 29.99)).count()) == 5)
    assert(cnt(Q.V().hasLabel("products").has(P.gte("price", 29.99)).count()) == 6)
    assert(cnt(Q.V().hasLabel("products").has(P.lt("price", 29.99)).count()) == 14)
    assert(cnt(Q.V().hasLabel("products").has(P.lte("price", 29.99)).count()) == 15)
    assert(cnt(Q.V().hasLabel("products").has(P.inside("price", 9.99, 19.99)).count()) == 5)
    assert(cnt(Q.V().hasLabel("products").has(P.between("price", 9.99, 19.99)).count()) == 11)
    assert(cnt(Q.V().hasLabel("products").has(P.outside("price", 9.99, 19.99)).count()) == 9)
    assert(cnt(Q.V().hasLabel("products").has(P.and_(P.lt("price", 29.99), P.gt("price", 9.99))).count()) == 6)
    assert(cnt(Q.V().hasLabel("products").has(P.contains("tags", "Movie")).count()) == 5)
    assertPick(Q.V().hasLabel("products").has(P.within("title", "Action", "Drama")), "products:19", "products:20")
    assert(cnt(Q.V().hasLabel("products").has(P.without("title", "Action", "Drama")).count()) == 18)
  }

  // ---- paging (processors_test.go:290-300)
  test("limit/skip/range") {
    assert(cnt(Q.V().limit(10).count()) == 10)
    assert(cnt(Q.V().skip(100).count()) == 70)
    assert(cnt(Q.V().range(10, 50).count()) == 40)
  }

  // ---- fields projection (processors_test.go:300-345)
  def dataOf(q: Query): (String, String, com.fasterxml.jackson.databind.JsonNode) = {
    val r = run(q).collect()(0)
    (r.getAs[String]("gid"), r.getAs[String]("label"),
      mapper.readTree(Option(r.getAs[String]("data")).getOrElse("{}")))
  }
  def j(s: String) = mapper.readTree(s)

  test("fields include/exclude incl. reserved") {
    assert(dataOf(Q.V("users:1").fields()) == (("users:1", "users", j("{}"))))
    assert(dataOf(Q.V("users:1").fields("email", "id")) ==
      (("users:1", "users", j("""{"email":"Earlean.Bonacci@yahoo.com","id":1}"""))))
    assert(dataOf(Q.V("users:1").fields("-password", "email", "id")) ==
      (("users:1", "users", j("""{"email":"Earlean.Bonacci@yahoo.com","id":1}"""))))
    assert(dataOf(Q.V("users:1").fields("-_gid", "-_label", "email", "id")) ==
      ((null, null, j("""{"email":"Earlean.Bonacci@yahoo.com","id":1}"""))))
    assert(dataOf(Q.V("users:1").fields("-created_at", "-deleted_at", "-details")) ==
      (("users:1", "users", j("""{"email":"Earlean.Bonacci@yahoo.com","id":1,"password":"029761dd44fec0b14825843ad0dfface"}"""))))
    val full = dataOf(Q.V("users:1").fields("-_label"))
    assert(full._1 == "users:1" && full._2 == null)
    assert(full._3 == j("""{"created_at":"2009-12-20 20:36:00 +0000 UTC","deleted_at":null,"details":null,"email":"Earlean.Bonacci@yahoo.com","id":1,"password":"029761dd44fec0b14825843ad0dfface"}"""))
  }

  // ---- marks / select (processors_test.go:345-380)
  test("as/select traversal positions") {
    assertPick(Q.V("users:1").as("a").out().as("b").select("a"), "users:1")
    assertPick(Q.V("users:1").as("a").outE().as("b").out().as("c").select("b"),
      "userPurchases:users:1:purchases:57")
    assert(cnt(Q.V("users:11").as("a").outE().as("b").out().select("b").count()) == 2)
    assert(cnt(Q.V("users:11").as("a").outE().as("b").out()
      .has(P.neq("_gid", "purchases:4")).select("b").count()) == 1)
    assertPick(Q.V("users:11").as("a").outE().as("b").out()
      .has(P.neq("_gid", "purchases:4")).select("b").out(), "purchases:26")
  }

  test("select many returns mark map") {
    val row = run(Q.V("users:1").as("a").out().as("b").select("a", "b")).collect()(0)
    val a = row.getAs[Row]("a"); val b = row.getAs[Row]("b")
    assert(a.getAs[String]("gid") == "users:1" && b.getAs[String]("gid") == "purchases:57")
    // fields() before as(): the marked element carries the projected data
    val row2 = run(Q.V("users:1").fields().as("a").out().fields().as("b").select("a", "b")).collect()(0)
    assert(mapper.readTree(row2.getAs[Row]("a").getAs[String]("data")) == j("{}"))
    val row3 = run(Q.V("users:1").fields().as("a").out().fields("state").as("b").select("a", "b")).collect()(0)
    assert(mapper.readTree(row3.getAs[Row]("b").getAs[String]("data")) == j("""{"state":"IL"}"""))
  }

  // ---- render (processors_test.go:392-396)
  test("render template over marks") {
    val out = run(Q.V("users:1").as("a").out().as("b")
      .render(GValue.GObj(Seq(
        "user_id" -> GValue.GString("$a._gid"),
        "purchase_id" -> GValue.GString("$b._gid"),
        "purchaser" -> GValue.GString("$b.name")))))
      .collect()(0).getString(0)
    assert(mapper.readTree(out) ==
      j("""{"user_id":"users:1","purchase_id":"purchases:57","purchaser":"Letitia Sprau"}"""))
  }
}
