package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, rng}
import graft.gripql._
import graft.gripql.GValue._
import graft.compiler.Traversal
import graft.model.{GraphFrame, TableGraph}

/** Property-based check of the condition evaluator: random Has-expression
  * trees over random documents, evaluated by Spark — BOTH over a plain
  * JSON-string graph and over a TableGraph-synthesized view where the
  * JsonShredding rule rewrites the predicates — must agree with a clean
  * three-valued-logic model of the documented semantics (textual JSON
  * extraction + `cast.ToFloat64E`-style numeric coercion, reference:
  * engine/logic/match.go:14-255; null drops in filter context; `not`
  * coerces null→false before negating).
  *
  * The generator space deliberately includes the traps: numeric-looking
  * strings, non-castable comparison constants (match.go says false — an
  * encoding via NaN literals differs because NaN sorts LARGEST in Spark),
  * missing fields under not(), malformed range arrays, and empty
  * within/without lists.
  */
case class PropDoc(id: Long, s: Option[String], i: Option[Long],
                   d: Option[Double], b: Option[Boolean], arr: Option[Seq[String]])

class ConditionPropertySpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  private type Doc = PropDoc
  private def Doc = PropDoc

  private val genStr: Gen[String] =
    Gen.oneOf(Gen.oneOf("alpha", "beta", "gamma", "x y", ""),
      Gen.chooseNum(-50L, 50L).map(_.toString)) // numeric-looking strings probe coercion
  private val genDoc: Gen[Doc] = for {
    id <- Gen.chooseNum(0L, Long.MaxValue)
    s <- Gen.option(genStr)
    i <- Gen.option(Gen.chooseNum(-100L, 100L))
    d <- Gen.option(Gen.chooseNum(-9999L, 9999L).map(_ / 10.0))
    b <- Gen.option(Gen.oneOf(true, false))
    arr <- Gen.option(Gen.listOfN(3, Gen.oneOf("red", "green", "blue", "5")).map(_.distinct))
  } yield Doc(id, s, i, d, b, arr)

  // ---- condition generator -------------------------------------------
  private val genKey: Gen[String] = Gen.oneOf("s", "i", "d", "b", "arr", "nope")
  private val genScalar: Gen[GValue] = Gen.oneOf(
    genStr.map(GString), Gen.chooseNum(-100L, 100L).map(GInt),
    Gen.chooseNum(-9999L, 9999L).map(x => GNum(x / 10.0)),
    Gen.oneOf(true, false).map(GBool), Gen.const(GNull))
  private val genRange: Gen[GValue] = Gen.oneOf(
    for { a <- Gen.chooseNum(-100L, 100L); w <- Gen.chooseNum(0L, 100L) }
      yield GArray(Seq(GInt(a), GInt(a + w))),
    Gen.const(GArray(Seq(GString("junk"), GInt(3)))), // non-castable bound → false
    Gen.const(GNull))                                  // malformed → false
  private val genLeaf: Gen[HasExpr] = for {
    k <- genKey
    op <- Gen.oneOf(CondOp.EQ, CondOp.NEQ, CondOp.GT, CondOp.GTE, CondOp.LT,
      CondOp.LTE, CondOp.INSIDE, CondOp.OUTSIDE, CondOp.BETWEEN,
      CondOp.WITHIN, CondOp.WITHOUT, CondOp.CONTAINS)
    v <- op match {
      case CondOp.INSIDE | CondOp.OUTSIDE | CondOp.BETWEEN => genRange
      case CondOp.WITHIN | CondOp.WITHOUT =>
        Gen.choose(0, 3).flatMap(n => Gen.listOfN(n, genScalar).map(GArray(_)))
      case CondOp.CONTAINS => Gen.oneOf("red", "blue", "5", "nope").map(GString)
      case _ => genScalar
    }
  } yield HasExpr.Cond(k, v, op)
  private def genExpr(depth: Int): Gen[HasExpr] =
    if (depth <= 0) genLeaf
    else Gen.frequency(
      4 -> genLeaf,
      2 -> Gen.listOfN(2, genExpr(depth - 1)).map(HasExpr.And(_)),
      2 -> Gen.listOfN(2, genExpr(depth - 1)).map(HasExpr.Or(_)),
      2 -> genExpr(depth - 1).map(HasExpr.Not(_)))

  // ---- the reference model (3VL over textual extraction) -------------
  private def text(doc: Doc, key: String): Option[String] = key match {
    case "s" => doc.s
    case "i" => doc.i.map(_.toString)
    case "d" => doc.d.map(_.toString)
    case "b" => doc.b.map(_.toString)
    case "arr" => doc.arr.map {
      case Seq() => "[]"
      case vs => vs.mkString("[\"", "\",\"", "\"]")
    }
    case _ => None
  }
  private def toD(s: String): Option[Double] = scala.util.Try(s.trim.toDouble).toOption
  private def constNum(v: GValue): Option[Double] = v match {
    case GNum(x) => Some(x)
    case GInt(x) => Some(x.toDouble)
    case GString(x) => scala.util.Try(x.toDouble).toOption
    case GBool(x) => Some(if (x) 1d else 0d)
    case _ => None
  }
  private def eqModel(t: Option[String], v: GValue): Option[Boolean] = v match {
    case GString(x) => t.map(_ == x)
    case GNum(x) => t.flatMap(toD).map(_ == x) match {
      case None if t.isDefined => None // non-castable text: null === d is null
      case r => if (t.isEmpty) None else r
    }
    case GInt(x) => eqModel(t, GNum(x.toDouble))
    case GBool(x) => t.map(_ == x.toString)
    case GNull => Some(t.isEmpty)
    case other => t.map(_ == GValue.toJson(other))
  }
  private def cmpModel(t: Option[String], v: GValue)(f: (Double, Double) => Boolean): Option[Boolean] =
    constNum(v) match {
      case None => Some(false)
      case Some(c) => t match {
        case None => None
        case Some(x) => toD(x) match {
          case None => None
          case Some(d) => Some(f(d, c))
        }
      }
    }
  private def rangeModel(t: Option[String], v: GValue)(f: (Double, Double, Double) => Boolean): Option[Boolean] = {
    val bounds = v match {
      case GArray(Seq(a, b)) => (constNum(a), constNum(b)) match {
        case (Some(x), Some(y)) => Some((x, y))
        case _ => None
      }
      case _ => None
    }
    bounds match {
      case None => Some(false)
      case Some((a, b)) => t match {
        case None => None
        case Some(x) => toD(x) match {
          case None => None
          case Some(d) => Some(f(d, a, b))
        }
      }
    }
  }
  private def leafModel(doc: Doc, c: HasExpr.Cond): Option[Boolean] = {
    val t = text(doc, c.key)
    c.op match {
      case CondOp.EQ => eqModel(t, c.value)
      case CondOp.NEQ => Some(!eqModel(t, c.value).getOrElse(false))
      case CondOp.GT => cmpModel(t, c.value)(_ > _)
      case CondOp.GTE => cmpModel(t, c.value)(_ >= _)
      case CondOp.LT => cmpModel(t, c.value)(_ < _)
      case CondOp.LTE => cmpModel(t, c.value)(_ <= _)
      case CondOp.INSIDE => rangeModel(t, c.value)((x, a, b) => x > a && x < b)
      case CondOp.OUTSIDE => rangeModel(t, c.value)((x, a, b) => x < a || x > b)
      case CondOp.BETWEEN => rangeModel(t, c.value)((x, a, b) => x >= a && x < b)
      case CondOp.WITHIN => c.value match {
        case GArray(vs) if vs.nonEmpty =>
          Some(vs.exists(v => eqModel(t, v).getOrElse(false)))
        case _ => Some(false)
      }
      case CondOp.WITHOUT => c.value match {
        case GArray(vs) if vs.nonEmpty =>
          Some(!vs.exists(v => eqModel(t, v).getOrElse(false)))
        case _ => Some(true)
      }
      case CondOp.CONTAINS => c.value match {
        // only the arr field holds JSON arrays; any other field's text
        // fails from_json(array<...>) → null → row drops (None)
        case GString(x) => if (c.key == "arr") doc.arr.map(_.contains(x)) else None
        case _ => Some(false)
      }
    }
  }
  private def evalModel(doc: Doc, e: HasExpr): Option[Boolean] = e match {
    case HasExpr.And(cs) =>
      val rs = cs.map(evalModel(doc, _))
      if (rs.contains(Some(false))) Some(false)
      else if (rs.contains(None)) None else Some(true)
    case HasExpr.Or(cs) =>
      val rs = cs.map(evalModel(doc, _))
      if (rs.contains(Some(true))) Some(true)
      else if (rs.contains(None)) None else Some(false)
    case HasExpr.Not(c) => Some(!evalModel(doc, c).getOrElse(false))
    case c: HasExpr.Cond => leafModel(doc, c)
  }

  // ---- the property ---------------------------------------------------
  private def sample[T](g: Gen[T], n: Int, seed: Long): Seq[T] = {
    var s = rng.Seed(seed)
    (1 to n).map { _ =>
      val r = g.pureApply(Gen.Parameters.default, s)
      s = s.next
      r
    }
  }

  test("non-castable comparison constants are false, never NaN comparisons") {
    // regression pin for the property the generator hunts: match.go casts
    // the constant and returns false on error; encoding the error as a NaN
    // literal instead keeps every row on the small side of the comparison
    // (NaN sorts LARGEST in Spark's ordering, unlike Java/Go float compares)
    val g = TableGraph(
      Seq(TableGraph.VertexMapping(
        Seq((1L, 5.0), (2L, -3.0)).toDF("id", "x"), "v:", "id", "doc", Seq("x"))), Nil)
    def n(e: HasExpr) =
      Traversal.run(spark, g, Query().V().has(e)).count()
    assert(n(HasExpr.Cond("x", GString("junk"), CondOp.LT)) == 0)
    assert(n(HasExpr.Cond("x", GNull, CondOp.LTE)) == 0)
    assert(n(HasExpr.Cond("x", GArray(Seq(GString("junk"), GInt(3))), CondOp.OUTSIDE)) == 0)
    assert(n(HasExpr.Cond("x", GArray(Seq(GString("junk"), GInt(3))), CondOp.BETWEEN)) == 0)
    // numeric-looking strings DO cast (cast.ToFloat64E accepts them)
    assert(n(HasExpr.Cond("x", GString("0"), CondOp.GT)) == 1)
  }

  test("_label/_gid equality filters normalize to indexed statement forms") {
    import graft.compiler.{Traversal => T}
    val in = Vector(
      Stmt.V(Nil),
      Stmt.Has(HasExpr.And(Seq(
        HasExpr.Cond("_label", GString("Person"), CondOp.EQ),
        HasExpr.Cond("age", GInt(21), CondOp.GT)))),
      Stmt.Has(HasExpr.Cond("_gid", GArray(Seq(GString("a"), GString("b"))), CondOp.WITHIN)))
    assert(T.normalize(in) == Vector(
      Stmt.V(Nil),
      Stmt.HasLabel(Seq("Person")),
      Stmt.Has(HasExpr.Cond("age", GInt(21), CondOp.GT)),
      Stmt.HasId(Seq("a", "b"))))
    // NOT rewritten: deep-equal to an array, mixed-type within, or/not trees
    val keep = Vector(
      Stmt.Has(HasExpr.Cond("_label", GArray(Seq(GString("x"))), CondOp.EQ)),
      Stmt.Has(HasExpr.Cond("_label", GArray(Seq(GString("x"), GInt(5))), CondOp.WITHIN)),
      Stmt.Has(HasExpr.Or(Seq(HasExpr.Cond("_label", GString("x"), CondOp.EQ)))))
    assert(T.normalize(keep) == keep)
    // and the rewritten spelling returns the same rows as the native one
    val res = getClass.getResource("/swapi/swapi.vertices").getPath
    val dir = new java.io.File(res).getParent
    val swapi = GraphFrame.fromJsonLines(spark, s"$dir/swapi.vertices", s"$dir/swapi.edges")
    def n(q: Query) = Traversal.run(spark, swapi, q).collect()(0).getLong(0)
    assert(n(Query().V().has(HasExpr.Cond("_label", GString("Character"), CondOp.EQ))
      .out("homeworld").count()) ==
      n(Query().V().hasLabel("Character").out("homeworld").count()))
  }

  test("random condition trees: Spark (plain + shredded views) == 3VL model") {
    val docs = sample(genDoc, 120, 11L).zipWithIndex
      .map { case (d, i) => d.copy(id = i.toLong) }
    val typed = docs.toDF()
    // variant A: plain JSON-string graph (no optimizer rewrite fires)
    import org.apache.spark.sql.functions._
    val plainV = typed.select(concat(lit("d:"), col("id")).as("gid"), lit("doc").as("label"),
      to_json(struct(col("s"), col("i"), col("d"), col("b"), col("arr"))).as("data"))
    val emptyE = spark.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](), GraphFrame.edgeSchema)
    val plain = GraphFrame(plainV, emptyE)
    // variant B: synthesized view — JsonShredding rewrites the predicates
    val shredded = TableGraph(
      Seq(TableGraph.VertexMapping(typed, "d:", "id", "doc",
        dataCols = Seq("s", "i", "d", "b", "arr"))), Nil)

    val exprs = sample(genExpr(2), 120, 97L)
    for ((e, n) <- exprs.zipWithIndex; (g, variant) <- Seq(plain -> "plain", shredded -> "shredded")) {
      val got = Traversal.run(spark, g,
          Query().V().has(e)).select("gid").as[String].collect()
        .map(_.stripPrefix("d:").toLong).toSet
      val want = docs.filter(d => evalModel(d, e) == Some(true)).map(_.id).toSet
      assert(got == want,
        s"case #$n ($variant): $e\n  spark=${got.toSeq.sorted}\n  model=${want.toSeq.sorted}")
    }
  }
}
