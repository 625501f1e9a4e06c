package graft.compiler

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.gripql.GValue

/** render(template) — reshape the traveler into an arbitrary JSON value
  * (reference: engine/core/processors.go:419-437,
  * jsonpath/jsonpath.go:169-190: template strings are field lookups,
  * maps/lists recurse, other literals pass through).
  *
  * Output is a JSON text column built by string concatenation of
  * type-faithful fragments (variant extraction keeps numbers numbers) —
  * stays fully inside whole-stage codegen.
  */
object Render {
  def column(template: GValue): Column = jsonCol(template)

  private def escape(s: String): String = GValue.toJson(GValue.GString(s))

  private def jsonCol(t: GValue): Column = t match {
    case GValue.GString(s) => FieldRef.resolveAsJson(s)
    case GValue.GArray(vs) =>
      concat(Seq(lit("[")) ++ intersperse(vs.map(jsonCol), lit(",")) ++ Seq(lit("]")): _*)
    case GValue.GObj(fs) =>
      val entries = fs.map { case (k, v) => concat(lit(escape(k) + ":"), jsonCol(v)) }
      concat(Seq(lit("{")) ++ intersperse(entries, lit(",")) ++ Seq(lit("}")): _*)
    case other => lit(GValue.toJson(other))
  }

  private def intersperse(cols: Seq[Column], sep: Column): Seq[Column] =
    cols.zipWithIndex.flatMap { case (c, i) => if (i == 0) Seq(c) else Seq(sep, c) }
}
