package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, rng}
import graft.gripql._
import graft.gripql.GValue._

/** Parser round-trip property: for random queries in the grammar's normal
  * form, `Parser.parse(Parser.render(q)) == q` (and the seedless
  * extension form likewise). Strings include quotes, backslashes,
  * newlines, unicode, and empties, so the JSON escaping on both sides is
  * exercised; value generators avoid the two documented normalizations
  * (integral GNum re-parses as GInt; Percentile.exact has no spelling). */
class ParserRoundTripSpec extends AnyFunSuite {

  private val genName: Gen[String] = Gen.oneOf(
    Gen.alphaNumStr.map(_.take(8)).suchThat(_ => true),
    Gen.oneOf("a\"b", "x\ny", "tab\tle", "backs\\lash", "ünïcødé", "", "a b c",
      "$mark.field", "-excluded", "nested.path"))
  private val genScalar: Gen[GValue] = Gen.oneOf(
    genName.map(GString), Gen.chooseNum(-1000L, 1000L).map(GInt),
    Gen.oneOf(true, false).map(GBool), Gen.const(GNull),
    Gen.chooseNum(-999L, 999L).map(x => GNum(x + 0.5)))
  private def genValue(depth: Int): Gen[GValue] =
    if (depth <= 0) genScalar
    else Gen.frequency(
      4 -> genScalar,
      1 -> Gen.listOfN(2, genValue(depth - 1)).map(GArray(_)),
      1 -> Gen.listOfN(2, Gen.zip(genName, genValue(depth - 1))).map(GObj(_)))
  private val genNum: Gen[GValue] = Gen.oneOf(
    Gen.chooseNum(-999L, 999L).map(x => GNum(x + 0.5)),
    Gen.chooseNum(-1000L, 1000L).map(x => GNum(x.toDouble))) // re-coerced by the grammar
  private def genPred(depth: Int): Gen[HasExpr] = {
    val leaf: Gen[HasExpr] = for {
      k <- genName
      op <- Gen.oneOf(CondOp.EQ, CondOp.NEQ, CondOp.GT, CondOp.GTE, CondOp.LT,
        CondOp.LTE, CondOp.INSIDE, CondOp.OUTSIDE, CondOp.BETWEEN,
        CondOp.WITHIN, CondOp.WITHOUT, CondOp.CONTAINS)
      v <- op match {
        case CondOp.INSIDE | CondOp.OUTSIDE | CondOp.BETWEEN =>
          Gen.zip(genNum, genNum).map { case (a, b) => GArray(Seq(a, b)) }
        case CondOp.WITHIN | CondOp.WITHOUT =>
          Gen.choose(1, 3).flatMap(n => Gen.listOfN(n, genScalar).map(GArray(_)))
        case _ => Gen.frequency(4 -> genScalar,
          1 -> Gen.listOfN(2, genScalar).map(GArray(_)))
      }
    } yield HasExpr.Cond(k, v, op)
    if (depth <= 0) leaf
    else Gen.frequency(
      4 -> leaf,
      1 -> Gen.listOfN(2, genPred(depth - 1)).map(HasExpr.And(_)),
      1 -> Gen.listOfN(2, genPred(depth - 1)).map(HasExpr.Or(_)),
      1 -> genPred(depth - 1).map(HasExpr.Not(_)))
  }
  private val genAgg: Gen[Agg] = Gen.oneOf(
    Gen.zip(genName, genName, Gen.choose(0, 10)).map { case (n, f, s) => Agg.Term(n, f, s) },
    Gen.zip(genName, genName, Gen.chooseNum(1L, 100L)).map { case (n, f, i) => Agg.Histogram(n, f, i.toDouble) },
    Gen.zip(genName, genName, Gen.choose(1, 3).flatMap(k =>
      Gen.listOfN(k, Gen.chooseNum(1L, 99L).map(_.toDouble)))).map { case (n, f, ps) => Agg.Percentile(n, f, ps) },
    Gen.zip(genName, genName).map { case (n, f) => Agg.FieldAgg(n, f) },
    Gen.zip(genName, genName).map { case (n, f) => Agg.TypeAgg(n, f) },
    genName.map(Agg.CountAgg))
  private val genNames: Gen[Seq[String]] = Gen.choose(0, 3).flatMap(Gen.listOfN(_, genName))
  private val genStmt: Gen[Stmt] = Gen.frequency[Stmt](
    3 -> genNames.map(Stmt.Out(_)), 2 -> genNames.map(Stmt.In(_)),
    1 -> genNames.map(Stmt.Out(_, emitNull = true)), 1 -> genNames.map(Stmt.In(_, emitNull = true)),
    1 -> genNames.map(Stmt.Both(_)), 1 -> genNames.map(Stmt.OutE(_)),
    1 -> genNames.map(Stmt.InE(_, emitNull = true)), 1 -> genNames.map(Stmt.BothE(_)),
    3 -> genPred(2).map(Stmt.Has), 2 -> genNames.map(Stmt.HasLabel),
    1 -> genNames.map(Stmt.HasId), 1 -> genNames.map(Stmt.HasKey),
    1 -> Gen.chooseNum(0L, 500L).map(Stmt.Limit), 1 -> Gen.chooseNum(0L, 500L).map(Stmt.Skip),
    1 -> Gen.zip(Gen.chooseNum(0L, 50L), Gen.chooseNum(-1L, 100L)).map { case (a, b) => Stmt.Range(a, b) },
    1 -> genNames.map(Stmt.Distinct(_)), 1 -> genName.map(Stmt.As),
    1 -> genName.map(Stmt.SelectOne),
    1 -> Gen.listOfN(2, genName).map(Stmt.SelectMany),
    1 -> genNames.map(Stmt.Fields), 1 -> genValue(2).map(Stmt.Render),
    1 -> Gen.const(Stmt.Path()), 1 -> genName.map(Stmt.Unwind),
    1 -> Gen.zip(genName, genValue(1)).map { case (k, v) => Stmt.SetField(k, v) },
    1 -> Gen.zip(genName, Gen.chooseNum(-5L, 5L)).map { case (k, d) => Stmt.Increment(k, d) },
    1 -> genName.map(Stmt.Mark),
    1 -> Gen.zip(genName, Gen.option(genPred(1)), Gen.oneOf(true, false))
      .map { case (m, c, e) => Stmt.Jump(m, c, e) },
    1 -> Gen.const(Stmt.Count()),
    1 -> Gen.choose(1, 3).flatMap(Gen.listOfN(_, genAgg)).map(Stmt.Aggregate(_)))
  private val genSeed: Gen[Stmt] = Gen.oneOf(
    genNames.map(Stmt.V(_)), genNames.map(Stmt.E(_)))
  private val genQuery: Gen[Query] = for {
    seed <- genSeed
    rest <- Gen.choose(0, 6).flatMap(Gen.listOfN(_, genStmt))
  } yield Query((seed +: rest).toVector)

  /** The grammar's parse-time normalization: an integral GNum renders
    * without ".0" (the JSON-wire spelling) so it re-parses as GInt —
    * `GValue.num` is the shared rule; apply it everywhere a value is
    * spelled out in the text form. */
  private def normalize(q: Query): Query = Query(q.stmts.map {
    case Stmt.Has(e) => Stmt.Has(normPred(e))
    case Stmt.Jump(m, c, em) => Stmt.Jump(m, c.map(normPred), em)
    case Stmt.Render(t) => Stmt.Render(normVal(t))
    case Stmt.SetField(k, v) => Stmt.SetField(k, normVal(v))
    case s => s
  })
  private def normVal(v: GValue): GValue = v match {
    case GNum(d) => GValue.num(d)
    case GArray(vs) => GArray(vs.map(normVal))
    case GObj(fs) => GObj(fs.map { case (k, x) => k -> normVal(x) })
    case o => o
  }
  private def normPred(e: HasExpr): HasExpr = e match {
    case HasExpr.And(cs) => HasExpr.And(cs.map(normPred))
    case HasExpr.Or(cs) => HasExpr.Or(cs.map(normPred))
    case HasExpr.Not(c) => HasExpr.Not(normPred(c))
    case HasExpr.Cond(k, v, op) => HasExpr.Cond(k, normVal(v), op)
  }

  private def sample[T](g: Gen[T], n: Int, seed: Long): Seq[T] = {
    var s = rng.Seed(seed)
    (1 to n).map { _ =>
      val r = g.pureApply(Gen.Parameters.default, s)
      s = s.next
      r
    }
  }

  test("parse(render(q)) == q for 300 random queries") {
    for ((q, i) <- sample(genQuery, 300, 1234L).zipWithIndex) {
      val text = Parser.render(q)
      scala.util.Try(Parser.parse(text)) match {
        case scala.util.Failure(e) => fail(s"case #$i failed to parse: $text\n$e")
        case scala.util.Success(back) =>
          assert(back == normalize(q), s"case #$i: $text")
      }
    }
  }

  test("parseExtension(render-chain) == chain for 100 random extensions") {
    for ((stmts, i) <- sample(Gen.choose(1, 5).flatMap(Gen.listOfN(_, genStmt)), 100, 77L).zipWithIndex) {
      val q = Query(stmts.toVector)
      val text = "." + Parser.render(q)
      scala.util.Try(Parser.parseExtension(text)) match {
        case scala.util.Failure(e) => fail(s"case #$i failed to parse: $text\n$e")
        case scala.util.Success(back) =>
          assert(back == normalize(q), s"case #$i: $text")
      }
    }
  }
}
