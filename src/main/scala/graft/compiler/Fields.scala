package graft.compiler

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, StringType, DoubleType, BooleanType}
import graft.gripql.{GValue, HasExpr, CondOp}
import graft.functions.GJson

/** Field addressing — the reference's mini JSON-path with mark namespaces
  * (reference: jsonpath/jsonpath.go:21-60):
  *   "name" / "$.name"   → current element, data field `name`
  *   "$m.field.sub"      → mark `m`, nested data field
  *   reserved: _gid _label _from _to _data
  */
object FieldRef {
  /** Whether the traversal being compiled carries a `vars` column (typed
    * loop-state for set/increment — see Traversal). Set around plan
    * construction; plan building is single-threaded inside run(). */
  val hasVars = new scala.util.DynamicVariable[Boolean](false)

  /** Materialized sidecar columns riding the traveler frame for the
    * CURRENT element's data fields: field path → (string column name,
    * numeric column name when the stored layout carries the float64
    * sibling, presence/type-tag column name when it carries the r13
    * `__idxt_*` sibling). Set by Traversal around each statement's
    * compilation, and
    * ONLY when the statically-known label state is fully covered by a
    * physical field index whose `__idx_*` columns the frame carries —
    * then a field read is a plain column reference instead of a per-row
    * `get_json_object` parse, and (being a real scan column) the
    * predicate built on it pushes through hop joins into the parquet
    * scan. The string column is the stored `get_json_object` of the
    * field (Catalog.relayout), so substitution is exact by construction. */
  val sidecar = new scala.util.DynamicVariable[Map[String, (String, Option[String], Option[String])]](Map.empty)

  /** vars map key for a (namespace, path) pair. */
  def varKey(ns: String, parts: Seq[String]): String = ns + "\u0000" + parts.mkString(".")

  private def varField(ns: String, parts: Seq[String], field: String): Column =
    try_element_at(col("vars"), lit(varKey(ns, parts))).getField(field)

  /** Whole data document with any pending vars folded in (UDF — only on
    * _data reads, which sit at plan output, not in traversal hot paths). */
  private def dataWithVars(ns: String, e: Column): Column =
    if (hasVars.value) GJson.json_merge_vars(e.getField("data"), col("vars"), lit(ns))
    else e.getField("data")

  /** (namespace, dotted parts). namespace "" = current element. */
  def parse(key: String): (String, Seq[String]) = {
    if (key.startsWith("$")) {
      val body = key.stripPrefix("$")
      val parts = body.split('.').toSeq
      if (body.startsWith(".")) ("", parts.drop(1).filter(_.nonEmpty))
      else (parts.head, parts.tail)
    } else ("", key.split('.').toSeq)
  }

  /** The element struct column for a namespace. */
  def elem(ns: String): Column =
    if (ns.isEmpty) col("cur") else element_at(col("marks"), ns)

  /** Raw value of a field as a string column:
    * reserved fields come straight off the struct; data fields via
    * get_json_object (strings unquoted, numbers/bools as text, containers
    * as JSON text) — Catalyst keeps all of this inside codegen.
    */
  def resolve(key: String): Column = {
    val (ns, parts) = parse(key)
    val e = elem(ns)
    parts.headOption.getOrElse("") match {
      case "_gid" => e.getField("gid")
      case "_label" => e.getField("label")
      case "_from" => e.getField("from")
      case "_to" => e.getField("to")
      case "_data" | "" => dataWithVars(ns, e)
      case _ =>
        val path = parts.mkString(".")
        val base = sidecar.value.get(path).filter(_ => ns.isEmpty) match {
          // sidecar hit: the frame carries this field's materialized
          // extraction (identical to the get_json_object below by
          // construction) as a real column — no parse, pushdown-eligible
          case Some((strCol, _, _)) => col(strCol)
          case None => get_json_object(e.getField("data"), "$." + path)
        }
        if (hasVars.value) {
          // entry-presence guard, not coalesce: set(field, null) must
          // OVERRIDE a stored value with null, not fall back to it
          val entry = try_element_at(col("vars"), lit(varKey(ns, parts)))
          when(entry.isNotNull, entry.getField("raw")).otherwise(base)
        } else base
    }
  }

  /** The field's float64 reading straight from the stored `__idxn_*`
    * sidecar column when the frame carries it — materialized as
    * `try_cast(__idx_<f> AS double)` at build time (Catalog.relayout), so
    * it equals `resolve(key).try_cast("double")` exactly while being a
    * plain scan column that ordered predicates push into parquet. None
    * when the field has no active numeric sidecar (callers fall back to
    * casting [[resolve]]). */
  def resolveNumeric(key: String): Option[Column] = {
    val (ns, parts) = parse(key)
    if (ns.nonEmpty || parts.headOption.forall(p => p.isEmpty || p.startsWith("_"))) None
    else sidecar.value.get(parts.mkString(".")).flatMap(_._2).map { numName =>
      val base = col(numName)
      if (hasVars.value) {
        val entry = try_element_at(col("vars"), lit(varKey(ns, parts)))
        when(entry.isNotNull, entry.getField("raw").try_cast("double")).otherwise(base)
      } else base
    }
  }

  /** The field's stored presence/type tag column when the frame carries
    * it — NULL = key missing, "VOID" = stored JSON null, else the
    * FieldType name (Catalog.idxTypeCol). Raw (no vars folding): the
    * consumers that need vars wrap it themselves. */
  def resolveTypeTag(key: String): Option[Column] = {
    val (ns, parts) = parse(key)
    if (ns.nonEmpty || parts.headOption.forall(p => p.isEmpty || p.startsWith("_"))) None
    else sidecar.value.get(parts.mkString(".")).flatMap(_._3).map(col)
  }

  /** Does the field EXIST (a JSON-null value still exists; a missing key
    * does not) — needed by distinct's drop-missing rule
    * (reference: engine/core/processors.go:737-750). With an active
    * type-tag sidecar this is `tag IS NOT NULL` — a plain (pushable)
    * column test instead of a json_object_keys parse. */
  def exists(key: String): Column = {
    val (ns, parts) = parse(key)
    val e = elem(ns)
    parts.headOption.getOrElse("") match {
      case "_gid" | "_label" | "_from" | "_to" | "_data" | "" => e.getField("gid").isNotNull
      case _ =>
        val inData = resolveTypeTag(key) match {
          case Some(tag) => tag.isNotNull
          case None =>
            val parent =
              if (parts.length == 1) e.getField("data")
              else get_json_object(e.getField("data"), "$." + parts.dropRight(1).mkString("."))
            coalesce(array_contains(json_object_keys(parent), parts.last), lit(false))
        }
        // entry presence (a field set to JSON null still EXISTS)
        if (hasVars.value)
          try_element_at(col("vars"), lit(varKey(ns, parts))).isNotNull || inData
        else inData
    }
  }

  /** Type-faithful JSON fragment of a field (strings stay quoted, numbers
    * stay numbers) — used by render templates. Reserved string fields are
    * JSON-encoded via to_json; data fields via variant extraction. */
  def resolveAsJson(key: String): Column = {
    val (ns, parts) = parse(key)
    val e = elem(ns)
    def quote(c: Column): Column =
      when(c.isNull, lit("null")).otherwise(to_json(map(lit("k"), c)).substr(lit(6), length(to_json(map(lit("k"), c))) - lit(6)))
    parts.headOption.getOrElse("") match {
      case "_gid" => quote(e.getField("gid"))
      case "_label" => quote(e.getField("label"))
      case "_from" => quote(e.getField("from"))
      case "_to" => quote(e.getField("to"))
      case "_data" | "" => coalesce(dataWithVars(ns, e), lit("null"))
      case _ =>
        val base = to_json(try_variant_get(try_parse_json(e.getField("data")), "$." + parts.mkString("."), "variant"))
        val withVars = if (hasVars.value) coalesce(varField(ns, parts, "json"), base) else base
        coalesce(withVars, lit("null"))
    }
  }
}

/** HasExpression → boolean Column
  * (reference: engine/logic/match.go:14-255; numeric comparisons cast both
  * sides to float64 and a failed cast is FALSE, not an error — we mirror
  * that with non-ANSI cast-to-null + coalesce(false)).
  */
object Conditions {
  import GValue._

  // try_cast, not cast: the engine must behave identically under ANSI mode
  // (Spark 4 default) — a non-numeric value compares false, never errors
  // (reference: engine/logic/match.go:27-69 cast.ToFloat64E semantics).
  private def num(c: Column): Column = c.try_cast("double")

  // also used by Traversal's index-seed rewrite, which must interpret
  // constants EXACTLY like the engine predicate it mirrors
  private[compiler] def valueNum(v: GValue): Option[Double] = v match {
    case GNum(d) => Some(d)
    case GInt(i) => Some(i.toDouble)
    case GString(s) => scala.util.Try(s.toDouble).toOption
    case GBool(b) => Some(if (b) 1d else 0d)
    case _ => None
  }

  /** Deep-equal leaf — null-safe, missing field never matches non-null.
    * `rawNum` is the field's float64 reading (sidecar column when active,
    * else try_cast of `raw` — identical values either way). */
  private def eqExpr(raw: Column, rawNum: Column, v: GValue): Column = v match {
    case GString(s) => raw === lit(s)
    case GNum(d) => rawNum === lit(d)
    case GInt(i) => rawNum === lit(i.toDouble)
    case GBool(b) => raw === lit(b.toString)
    case GNull => raw.isNull
    case arr: GArray => raw === lit(GValue.toJson(arr))
    case obj: GObj => raw === lit(GValue.toJson(obj))
  }

  private[compiler] def rangePair(v: GValue): (Double, Double) = v match {
    case GArray(Seq(a, b)) => (valueNum(a).getOrElse(Double.NaN), valueNum(b).getOrElse(Double.NaN))
    case _ => (Double.NaN, Double.NaN)
  }

  private def leaf(key: String, v: GValue, op: CondOp): Column = {
    val raw = FieldRef.resolve(key)
    // stored float64 sidecar when active — same value as num(raw) by
    // construction, but a plain column parquet pushes ordered predicates on
    val rawNum = FieldRef.resolveNumeric(key).getOrElse(num(raw))
    // A non-castable CONSTANT is known false at compile time (reference:
    // match.go cast.ToFloat64E error → false). Encoding it as a NaN
    // literal would be wrong on the small side of a comparison: in
    // Spark's SQL ordering NaN sorts LARGEST, so `x < NaN` KEEPS every
    // row the reference drops (Java/Go float semantics make any NaN
    // comparison false; Spark's differ by design).
    def cmp(f: (Column, Column) => Column): Column = valueNum(v) match {
      case Some(d) => f(rawNum, lit(d))
      case None => lit(false)
    }
    def range(f: (Column, Double, Double) => Column): Column = {
      val (a, b) = rangePair(v)
      if (a.isNaN || b.isNaN) lit(false) else f(rawNum, a, b)
    }
    val c = op match {
      case CondOp.EQ => eqExpr(raw, rawNum, v)
      case CondOp.NEQ => !coalesce(eqExpr(raw, rawNum, v), lit(false))
      case CondOp.GT => cmp(_ > _)
      case CondOp.GTE => cmp(_ >= _)
      case CondOp.LT => cmp(_ < _)
      case CondOp.LTE => cmp(_ <= _)
      case CondOp.INSIDE => range((x, a, b) => x > lit(a) && x < lit(b))
      case CondOp.OUTSIDE => range((x, a, b) => x < lit(a) || x > lit(b))
      case CondOp.BETWEEN => range((x, a, b) => x >= lit(a) && x < lit(b))
      case CondOp.WITHIN => v match {
        case GArray(vs) if vs.nonEmpty => vs.map(x => coalesce(eqExpr(raw, rawNum, x), lit(false))).reduce(_ || _)
        case _ => lit(false)
      }
      case CondOp.WITHOUT => v match {
        case GArray(vs) if vs.nonEmpty => !vs.map(x => coalesce(eqExpr(raw, rawNum, x), lit(false))).reduce(_ || _)
        case _ => lit(true)
      }
      case CondOp.CONTAINS =>
        // raw is the JSON text of an array-valued field
        v match {
          case GString(s) => array_contains(from_json(raw, ArrayType(StringType)), s)
          case GNum(d) => array_contains(from_json(raw, ArrayType(DoubleType)), d)
          case GInt(i) => array_contains(from_json(raw, ArrayType(DoubleType)), i.toDouble)
          case GBool(b) => array_contains(from_json(raw, ArrayType(BooleanType)), b)
          case _ => lit(false)
        }
    }
    // NO outer coalesce: in filter context a null predicate drops the row,
    // which already matches "missing field never matches" — and the bare
    // comparison shape is what parquet pushdown recognizes. not() below
    // supplies the null→false coercion where three-valued logic differs.
    c
  }

  def toColumn(e: HasExpr): Column = e match {
    case HasExpr.And(cs) => cs.map(toColumn).reduceOption(_ && _).getOrElse(lit(true))
    case HasExpr.Or(cs) => cs.map(toColumn).reduceOption(_ || _).getOrElse(lit(false))
    case HasExpr.Not(c) => !coalesce(toColumn(c), lit(false))
    case HasExpr.Cond(k, v, op) => leaf(k, v, op)
  }
}
