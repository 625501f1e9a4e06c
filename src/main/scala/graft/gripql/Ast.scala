package graft.gripql

/** GripQL query AST — a brand-new Spark-first re-expression of the
  * statement algebra described by the reference protobuf
  * (reference: gripql/gripql.proto:25-67 `GraphStatement`).
  *
  * A query is an ordered list of statements; the first must be V()/E().
  * Terminal statements (count/aggregate/select-many/path/render) change
  * the result shape.
  */
sealed trait Stmt

/** JSON-ish literal values used in conditions, render templates, set().
  * (reference: google.protobuf.Value usage in gripql/gripql.proto:197).
  */
sealed trait GValue
object GValue {
  case class GString(v: String) extends GValue
  case class GNum(v: Double) extends GValue
  case class GInt(v: Long) extends GValue
  case class GBool(v: Boolean) extends GValue
  case object GNull extends GValue
  case class GArray(v: Seq[GValue]) extends GValue
  case class GObj(v: Seq[(String, GValue)]) extends GValue

  /** Normalize a double to the GValue the JSON wire would round-trip:
    * JSON has one number type and every marshaller in the reference
    * stack (JS JSON.stringify, protojson) prints integral floats
    * without ".0", so an integral double IS an integer once it has
    * crossed any wire. Constructing it as GInt up front keeps builder,
    * text-parser, JS and protojson ASTs equal for equal queries. */
  def num(d: Double): GValue =
    if (d == d.floor && !d.isInfinite && math.abs(d) < (1L << 53).toDouble) GInt(d.toLong)
    else GNum(d)

  /** Render a GValue as a JSON text fragment (deterministic key order). */
  def toJson(g: GValue): String = g match {
    case GString(s) => "\"" + s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
      case '\r' => "\\r"; case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
    } + "\""
    case GNum(d) => if (d == d.floor && !d.isInfinite && math.abs(d) < 1e15) d.toLong.toString else d.toString
    case GInt(i) => i.toString
    case GBool(b) => b.toString
    case GNull => "null"
    case GArray(vs) => vs.map(toJson).mkString("[", ",", "]")
    case GObj(fs) => fs.map { case (k, v) => toJson(GString(k)) + ":" + toJson(v) }.mkString("{", ",", "}")
  }

  /** Unquoted text form — matches what get_json_object yields for the same
    * value (strings bare, scalars as text, containers as JSON text). */
  def rawText(g: GValue): String = g match {
    case GString(s) => s
    case GNull => null
    case other => toJson(other)
  }
}

/** Predicate tree for has()/jump-conditions
  * (reference: gripql/gripql.proto:128-161 `HasExpression`,
  * leaf conditions gripql/gripql.proto Condition enum). */
sealed trait HasExpr
object HasExpr {
  case class And(children: Seq[HasExpr]) extends HasExpr
  case class Or(children: Seq[HasExpr]) extends HasExpr
  case class Not(child: HasExpr) extends HasExpr
  case class Cond(key: String, value: GValue, op: CondOp) extends HasExpr
}

sealed trait CondOp
object CondOp {
  case object EQ extends CondOp
  case object NEQ extends CondOp
  case object GT extends CondOp
  case object GTE extends CondOp
  case object LT extends CondOp
  case object LTE extends CondOp
  case object INSIDE extends CondOp   // a < x < b
  case object OUTSIDE extends CondOp  // x < a || x > b
  case object BETWEEN extends CondOp  // a <= x < b
  case object WITHIN extends CondOp
  case object WITHOUT extends CondOp
  case object CONTAINS extends CondOp // array field contains value
}

/** Aggregation forms (reference: gripql/gripql.proto Aggregate message,
  * executors engine/core/processors.go:980-1134). */
sealed trait Agg { def name: String }
object Agg {
  case class Term(name: String, field: String, size: Int = 0) extends Agg
  case class Histogram(name: String, field: String, interval: Double) extends Agg
  /** `exact=false` (the engine default) uses t-digest approximate
    * quantiles, the scale-safe choice the reference's conformance suite
    * allows ±15% tolerance for; `exact=true` sorts and interpolates
    * positionally (parity with the reference's Mongo backend,
    * mongo/percentile.go:7-30) — one total sort of the value column. */
  case class Percentile(name: String, field: String, percents: Seq[Double],
                        exact: Boolean = false) extends Agg
  case class FieldAgg(name: String, field: String) extends Agg
  case class TypeAgg(name: String, field: String) extends Agg
  case class CountAgg(name: String) extends Agg
}

object Stmt {
  // ---- sources (reference: engine/core/compile.go:96-110)
  case class V(ids: Seq[String] = Nil) extends Stmt
  case class E(ids: Seq[String] = Nil) extends Stmt

  // ---- traversal joins (reference: engine/core/processors.go:160-391,880-940)
  case class Out(labels: Seq[String] = Nil, emitNull: Boolean = false) extends Stmt
  case class In(labels: Seq[String] = Nil, emitNull: Boolean = false) extends Stmt
  case class Both(labels: Seq[String] = Nil) extends Stmt
  case class OutE(labels: Seq[String] = Nil, emitNull: Boolean = false) extends Stmt
  case class InE(labels: Seq[String] = Nil, emitNull: Boolean = false) extends Stmt
  case class BothE(labels: Seq[String] = Nil) extends Stmt

  // ---- filters (reference: engine/core/processors.go:508-608)
  case class Has(expr: HasExpr) extends Stmt
  case class HasLabel(labels: Seq[String]) extends Stmt
  case class HasId(ids: Seq[String]) extends Stmt
  case class HasKey(keys: Seq[String]) extends Stmt

  // ---- paging (reference: engine/core/processors.go:635-718)
  case class Limit(n: Long) extends Stmt
  case class Skip(n: Long) extends Stmt
  case class Range(start: Long, stop: Long) extends Stmt // stop = -1 → unbounded

  // ---- dedup (reference: engine/core/processors.go:723-756)
  case class Distinct(fields: Seq[String] = Nil) extends Stmt

  // ---- marks & selection (reference: engine/core/processors.go:761-876)
  case class As(name: String) extends Stmt
  case class SelectOne(name: String) extends Stmt
  case class SelectMany(names: Seq[String]) extends Stmt

  // ---- projection / transformation (reference: engine/core/processors.go:396-503,812-853)
  case class Fields(fields: Seq[String]) extends Stmt // "-x" = exclude
  case class Render(template: GValue) extends Stmt
  case class Path() extends Stmt
  case class Unwind(field: String) extends Stmt
  case class SetField(key: String, value: GValue) extends Stmt
  case class Increment(key: String, delta: Long) extends Stmt

  // ---- control flow (reference: engine/logic/jump.go)
  case class Mark(name: String) extends Stmt
  case class Jump(mark: String, cond: Option[HasExpr], emit: Boolean) extends Stmt

  // ---- terminals
  case class Count() extends Stmt
  case class Aggregate(aggs: Seq[Agg]) extends Stmt
}

/** Fluent immutable query builder (reference: gripql/query.go:43-201). */
case class Query(stmts: Vector[Stmt] = Vector.empty) {
  private def add(s: Stmt) = copy(stmts = stmts :+ s)
  def V(ids: String*): Query = add(Stmt.V(ids))
  def E(ids: String*): Query = add(Stmt.E(ids))
  def out(labels: String*): Query = add(Stmt.Out(labels))
  def outNull(labels: String*): Query = add(Stmt.Out(labels, emitNull = true))
  def in(labels: String*): Query = add(Stmt.In(labels))
  def inNull(labels: String*): Query = add(Stmt.In(labels, emitNull = true))
  def both(labels: String*): Query = add(Stmt.Both(labels))
  def outE(labels: String*): Query = add(Stmt.OutE(labels))
  def outENull(labels: String*): Query = add(Stmt.OutE(labels, emitNull = true))
  def inE(labels: String*): Query = add(Stmt.InE(labels))
  def inENull(labels: String*): Query = add(Stmt.InE(labels, emitNull = true))
  def bothE(labels: String*): Query = add(Stmt.BothE(labels))
  def has(expr: HasExpr): Query = add(Stmt.Has(expr))
  def hasLabel(labels: String*): Query = add(Stmt.HasLabel(labels))
  def hasId(ids: String*): Query = add(Stmt.HasId(ids))
  def hasKey(keys: String*): Query = add(Stmt.HasKey(keys))
  def limit(n: Long): Query = add(Stmt.Limit(n))
  def skip(n: Long): Query = add(Stmt.Skip(n))
  def range(start: Long, stop: Long): Query = add(Stmt.Range(start, stop))
  def distinct(fields: String*): Query = add(Stmt.Distinct(fields))
  def as(name: String): Query = add(Stmt.As(name))
  def select(names: String*): Query =
    if (names.size == 1) add(Stmt.SelectOne(names.head)) else add(Stmt.SelectMany(names))
  def fields(fs: String*): Query = add(Stmt.Fields(fs))
  def render(template: GValue): Query = add(Stmt.Render(template))
  def path(): Query = add(Stmt.Path())
  def unwind(field: String): Query = add(Stmt.Unwind(field))
  def set(key: String, value: GValue): Query = add(Stmt.SetField(key, value))
  def increment(key: String, delta: Long = 1): Query = add(Stmt.Increment(key, delta))
  def mark(name: String): Query = add(Stmt.Mark(name))
  def jump(mark: String, cond: Option[HasExpr], emit: Boolean): Query =
    add(Stmt.Jump(mark, cond, emit))
  def count(): Query = add(Stmt.Count())
  def aggregate(aggs: Agg*): Query = add(Stmt.Aggregate(aggs))
}

/** Condition shorthand builders (reference: gripql/has_operators.go:6-205). */
object P {
  import GValue._
  import HasExpr._
  private def gv(v: Any): GValue = v match {
    case null => GNull
    case s: String => GString(s)
    case i: Int => GInt(i.toLong)
    case l: Long => GInt(l)
    case d: Double => GValue.num(d)
    case f: Float => GValue.num(f.toDouble)
    case b: Boolean => GBool(b)
    case xs: Seq[_] => GArray(xs.map(gv))
    case g: GValue => g
    case other => GString(other.toString)
  }
  def eq_(key: String, v: Any): HasExpr = Cond(key, gv(v), CondOp.EQ)
  def neq(key: String, v: Any): HasExpr = Cond(key, gv(v), CondOp.NEQ)
  def gt(key: String, v: Any): HasExpr = Cond(key, gv(v), CondOp.GT)
  def gte(key: String, v: Any): HasExpr = Cond(key, gv(v), CondOp.GTE)
  def lt(key: String, v: Any): HasExpr = Cond(key, gv(v), CondOp.LT)
  def lte(key: String, v: Any): HasExpr = Cond(key, gv(v), CondOp.LTE)
  def inside(key: String, a: Double, b: Double): HasExpr = Cond(key, GArray(Seq(GValue.num(a), GValue.num(b))), CondOp.INSIDE)
  def outside(key: String, a: Double, b: Double): HasExpr = Cond(key, GArray(Seq(GValue.num(a), GValue.num(b))), CondOp.OUTSIDE)
  def between(key: String, a: Double, b: Double): HasExpr = Cond(key, GArray(Seq(GValue.num(a), GValue.num(b))), CondOp.BETWEEN)
  def within(key: String, vs: Any*): HasExpr = Cond(key, GArray(vs.map(gv)), CondOp.WITHIN)
  def without(key: String, vs: Any*): HasExpr = Cond(key, GArray(vs.map(gv)), CondOp.WITHOUT)
  def contains(key: String, v: Any): HasExpr = Cond(key, gv(v), CondOp.CONTAINS)
  def and_(es: HasExpr*): HasExpr = And(es)
  def or_(es: HasExpr*): HasExpr = Or(es)
  def not_(e: HasExpr): HasExpr = Not(e)
}
