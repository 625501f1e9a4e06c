package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.objects.{Invoke, StaticInvoke}
import org.apache.spark.sql.catalyst.expressions.variant.{ParseJson, SchemaOfVariant, VariantGet}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** JSON shredding: rewrite `get_json_object(to_json(struct(...)), '$.k')`
  * to a direct struct-field access with get_json_object's text semantics.
  *
  * Why: the engine's `data` column is schemaless JSON, but graph VIEWS over
  * typed tables (TpchGraph, GRIPPER-style sources) synthesize it with
  * to_json — so every has() predicate would serialize the struct and
  * re-parse it per row, and the resulting expression blocks parquet filter
  * pushdown. After shredding, the predicate is a plain column comparison
  * that Catalyst pushes into the scan (the Spark analogue of the
  * reference's IndexStartOptimize, engine/core/optimize.go:12-120).
  *
  * Injected into the operator-optimization batch (so pushdown sees the
  * rewritten predicate) via `spark.sql.extensions=graft.plans.GraftExtensions`.
  * Only top-level scalar fields rewrite; anything else keeps the original
  * expression.
  */
object JsonShredding extends Rule[LogicalPlan] {
  private val TopLevel = """^\$\.([A-Za-z0-9_]+)$""".r

  /** The struct child of a to_json call, whether it is still StructsToJson
    * or already lowered to Invoke(StructsToJsonEvaluator, "evaluate", ...)
    * by ReplaceExpressions. Only default-options casts are eligible. */
  private def structChild(json: Expression): Option[Expression] = json match {
    case s: StructsToJson if s.options.isEmpty => Some(s.child)
    case i: Invoke if i.functionName == "evaluate" &&
        i.targetObject.dataType.toString.contains("StructsToJsonEvaluator") =>
      i.arguments.headOption
    case _ => None
  }

  private def fieldAsText(child: Expression, st: StructType, name: String): Option[Expression] = {
    val idx = st.fieldNames.indexOf(name)
    // path into a field the struct does not HAVE → always null (to_json of
    // a struct yields an object; a JSON path miss is null; and a null
    // struct makes the original null too). Folding to a null literal is
    // what lets predicates pushed into union branches collapse to `false`
    // and prune the wrong-label branches of a multi-hop far side entirely.
    if (idx < 0) return Some(Literal(null, StringType))
    val field = GetStructField(child, idx, Some(name))
    st.fields(idx).dataType match {
      case StringType => Some(field)
      case ByteType | ShortType | IntegerType | LongType | _: DecimalType |
           DoubleType | FloatType | BooleanType =>
        Some(Cast(field, StringType))
      case _ => None // nested/array/temporal: keep the JSON path semantics
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val shredded = plan.transformAllExpressions {
      case g @ GetJsonObject(json, Literal(path: UTF8String, StringType)) =>
        (path.toString match {
          case TopLevel(name) =>
            structChild(json).flatMap { child =>
              child.dataType match {
                case st: StructType => fieldAsText(child, st, name)
                case _ => None
              }
            }
          case _ => None
        }).getOrElse(g)

      // collapse the numeric→string→DOUBLE chains the shredded predicates
      // leave behind (Conditions uses try_cast("double")), so the final
      // comparison is a bare pushable column ref. Scope is deliberately
      // narrow: only double targets — rewriting fractional→string→integral
      // would turn a null/error into a truncation — and float sources are
      // excluded (float→string→double parses the short decimal
      // representation, which differs from widening the float).
      case Cast(Cast(e, StringType, _, _), DoubleType, tz, mode)
          if numericLike(e.dataType) =>
        Cast(e, DoubleType, tz, mode)
    }
    // id-prefix rewrites ONLY inside Filter conditions: at the top level of
    // a filter NULL and FALSE are interchangeable (both drop the row), so
    // replacing a null-when-null result with a literal boolean is
    // semantics-preserving. The container-test fold is null-preserving on
    // its own (see below) but stays Filter-scoped — it is only ever
    // generated there, and the narrow scope keeps the rule cheap.
    shredded.transform {
      case f @ org.apache.spark.sql.catalyst.plans.logical.Filter(cond, child) =>
        org.apache.spark.sql.catalyst.plans.logical.Filter(
          cond.transform {
            case e if rewriteIdPredicates.isDefinedAt(e) => rewriteIdPredicates(e)
            case e if foldContainerTest.isDefinedAt(e) => foldContainerTest(e)
          },
          child)
    }
  }

  // ---- static container-type tests over synthesized views: the term
  // aggregation's array/map skip check is
  //   startswith(schema_of_variant(try_variant_get(try_parse_json(
  //     to_json(struct(...))), '$.k')), 'ARRAY'|'OBJECT')
  // — three full JSON serialize+parse passes per row once the key filter is
  // also counted, and it gets PUSHED into every union branch of a hop's far
  // side. When the struct type is static the answer is static — but the
  // runtime expression is NULL (not false) whenever the field value or the
  // struct is null (to_json drops null fields under its default options, so
  // the variant path misses), and the framework wraps the test in Not(...),
  // where null and false are NOT interchangeable. So the fold must preserve
  // the null flow: a missing field folds to a null literal (the runtime
  // value for every row), a present field folds to
  // If(IsNotNull(field), <static answer>, null). SimplifyExtractValueOps
  // then reduces the guard to a bare column IsNotNull, and Catalyst's own
  // ReplaceNullWithFalseInPredicate does the top-level null==false
  // simplification where it IS sound — wrong-label union branches still
  // collapse to Filter(false) and prune.

  private def unwrapSchemaOfVariant(e: Expression): Option[Expression] = e match {
    case s: SchemaOfVariant => Some(s.child)
    case si: StaticInvoke if si.functionName == "schemaOfVariant" => si.arguments.headOption
    case _ => None
  }

  private def unwrapParseJson(e: Expression): Option[Expression] = e match {
    case p: ParseJson => Some(p.child)
    case si: StaticInvoke if si.functionName == "parseJson" => si.arguments.headOption
    case _ => None
  }

  private def foldContainerTest: PartialFunction[Expression, Expression] = {
    case sw @ StartsWith(sv, Literal(prefix: UTF8String, StringType))
        if (prefix.toString == "ARRAY" || prefix.toString == "OBJECT") &&
          staticContainerAnswer(sv, prefix.toString).isDefined =>
      staticContainerAnswer(sv, prefix.toString).get
  }

  private val nullBool = Literal(null, BooleanType)

  private def staticContainerAnswer(sv: Expression, prefix: String): Option[Expression] =
    for {
      vgExpr <- unwrapSchemaOfVariant(sv)
      vg <- vgExpr match { case v: VariantGet => Some(v); case _ => None }
      pathLit <- vg.path match {
        case Literal(p: UTF8String, StringType) => Some(p.toString); case _ => None
      }
      name <- pathLit match { case TopLevel(n) => Some(n); case _ => None }
      pj <- unwrapParseJson(vg.child)
      sc <- structChild(pj)
      st <- sc.dataType match { case s: StructType => Some(s); case _ => None }
    } yield {
      val idx = st.fieldNames.indexOf(name)
      if (idx < 0) nullBool // missing field → variant path miss → NULL for every row
      else {
        val answer = st.fields(idx).dataType match {
          case _: ArrayType => prefix == "ARRAY"
          case _: StructType | _: MapType => prefix == "OBJECT"
          case _ => false // atomic scalar is never ARRAY/OBJECT
        }
        // null field value (or null struct) → to_json omits it → NULL
        If(IsNotNull(GetStructField(sc, idx, Some(name))), Literal(answer, BooleanType), nullBool)
      }
    }

  private def numericLike(t: DataType): Boolean = t match {
    case ByteType | ShortType | IntegerType | LongType | DoubleType | _: DecimalType => true
    case _ => false
  }

  // ---- prefix-encoded id lookups (the reference's IndexStartOptimize,
  // engine/core/optimize.go:12-120): V("c:17") compares
  // concat('c:', cast(key)) = 'c:17' per row on EVERY union branch. The
  // rewrite turns wrong-prefix branches into `false` (pruned away) and the
  // matching branch into a bare key equality parquet can skip row groups on.
  // NULL note: `false` (vs the original's NULL) diverges only for NULL key
  // columns, which the graph contract forbids (gid is mandatory — reference
  // gripql/util.go:53-68, GraphFrame.vertexSchema nullable=false).

  private def isIntegral(t: DataType): Boolean = t match {
    case ByteType | ShortType | IntegerType | LongType => true
    case _ => false
  }

  /** s is the canonical decimal rendering of a Long (no leading zeros/+)
    * AND fits the target integral type — an out-of-range literal must fold
    * to false, not to an ANSI cast overflow error. */
  private def canonicalLong(s: String, target: DataType): Boolean =
    s.matches("0|-?[1-9][0-9]*") && scala.util.Try(s.toLong).toOption.exists { v =>
      target match {
        case ByteType => v >= Byte.MinValue && v <= Byte.MaxValue
        case ShortType => v >= Short.MinValue && v <= Short.MaxValue
        case IntegerType => v >= Int.MinValue && v <= Int.MaxValue
        case _ => true
      }
    }

  /** concat(<'prefix'>, cast(e as string)) = 'value' → typed equality. */
  private def prefixEq(children: Seq[Expression], value: String): Option[Expression] =
    children match {
      case Seq(Literal(p: UTF8String, StringType), Cast(e, StringType, _, _)) =>
        val ps = p.toString
        if (!value.startsWith(ps)) Some(Literal.FalseLiteral)
        else {
          val suffix = value.substring(ps.length)
          if (isIntegral(e.dataType)) {
            if (canonicalLong(suffix, e.dataType))
              Some(EqualTo(e, Cast(Literal(UTF8String.fromString(suffix), StringType), e.dataType)))
            else Some(Literal.FalseLiteral)
          } else if (e.dataType == StringType) Some(EqualTo(e, Literal(UTF8String.fromString(suffix), StringType)))
          else None
        }
      case _ => None
    }

  private def rewriteIdPredicates: PartialFunction[Expression, Expression] = {
    case eq @ EqualTo(c: Concat, Literal(v: UTF8String, StringType)) =>
      prefixEq(c.children, v.toString).getOrElse(eq)
    case eq @ EqualTo(Literal(v: UTF8String, StringType), c: Concat) =>
      prefixEq(c.children, v.toString).getOrElse(eq)
    case in @ In(c: Concat, values) if values.forall {
        case Literal(_: UTF8String, StringType) => true; case _ => false } =>
      c.children match {
        case Seq(Literal(p: UTF8String, StringType), Cast(e, StringType, _, _)) if isIntegral(e.dataType) =>
          val ps = p.toString
          val keys = values.collect {
            case Literal(v: UTF8String, StringType)
                if v.toString.startsWith(ps) && canonicalLong(v.toString.substring(ps.length), e.dataType) =>
              v.toString.substring(ps.length)
          }
          if (keys.isEmpty) Literal.FalseLiteral
          else In(e, keys.map(k => Cast(Literal(UTF8String.fromString(k), StringType), e.dataType)))
        case _ => in
      }
  }
}

/** Session extension registration:
  * `.config("spark.sql.extensions", "graft.plans.GraftExtensions")`. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectOptimizerRule(_ => JsonShredding)
    // graft_dot(a, b): the native vector dot product, reachable from SQL
    // (server queries, spark.sql) as well as the Column API
    e.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[graft.functions.DotProduct].getName, "graft_dot"),
      (args: Seq[Expression]) => {
        require(args.length == 2, s"graft_dot expects 2 arguments, got ${args.length}")
        graft.functions.DotProduct(args.head, args(1))
      }))
    // graft_sorted_intersect(a, b): merge-scan common-element count over
    // sorted long arrays — the near-dup verify hot path
    e.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("graft_sorted_intersect"),
      new ExpressionInfo(classOf[graft.functions.SortedIntersectCount].getName,
        "graft_sorted_intersect"),
      (args: Seq[Expression]) => {
        require(args.length == 2,
          s"graft_sorted_intersect expects 2 arguments, got ${args.length}")
        graft.functions.SortedIntersectCount(args.head, args(1))
      }))
    // graft_hash_array(arr): xxhash64 of every string element in one pass
    e.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("graft_hash_array"),
      new ExpressionInfo(classOf[graft.functions.HashArray].getName, "graft_hash_array"),
      (args: Seq[Expression]) => {
        require(args.length == 1, s"graft_hash_array expects 1 argument, got ${args.length}")
        graft.functions.HashArray(args.head)
      }))
    // graft_shingles(tokens, n): distinct word n-grams of a token array;
    // n must be an integer literal (it is part of the expression's shape)
    e.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("graft_shingles"),
      new ExpressionInfo(classOf[graft.functions.ShingleArray].getName, "graft_shingles"),
      (args: Seq[Expression]) => {
        require(args.length == 2, s"graft_shingles expects 2 arguments, got ${args.length}")
        val n = args(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"graft_shingles width must be an integer literal, got $other")
        }
        graft.functions.ShingleArray(args.head, n)
      }))
  }
}
