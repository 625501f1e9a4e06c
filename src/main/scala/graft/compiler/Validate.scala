package graft.compiler

import graft.gripql._

/** Static statement-list validation — the Spark engine's port of the
  * reference compiler's type-state checks (reference:
  * engine/core/compile.go:93-382, Validate :368-382). Invalid traversals
  * fail BEFORE any Spark job runs, with the same class of error messages.
  */
object Validate {
  sealed trait S
  case object NoS extends S
  case object VertexS extends S
  case object EdgeS extends S
  case object CountS extends S
  case object AggS extends S
  case object SelectionS extends S
  case object RenderS extends S
  case object PathS extends S

  private def elementState(s: S): Boolean = s == VertexS || s == EdgeS

  private val badChars = """!@#$%^&*()+={}[] :;"',.<>?/\|~"""

  /** reference: gripql/util.go:146-168 */
  def validFieldName(k: String): Boolean =
    !Seq("_gid", "_label", "_to", "_from", "_data").contains(k) &&
      !k.exists(badChars.contains(_)) &&
      !k.startsWith("_") && !k.startsWith("-")

  private def fail(msg: String): Nothing = throw new IllegalArgumentException(msg)

  /** Throws IllegalArgumentException on the first invalid statement;
    * returns the final pipeline state otherwise. `initial` other than NoS
    * validates a pipeline EXTENSION (job resume — reference:
    * gdbi/pipeline.go:19-23 CompileOptions.PipelineExtension). */
  def apply(stmts: Seq[Stmt], initial: S = NoS, extMarks: Map[String, S] = Map.empty): S = {
    // an empty EXTENSION is valid: it replays the spooled stream as full
    // elements (Jobs.view); an empty top-level query stays an error
    if (stmts.isEmpty && initial == NoS) fail("empty query")
    var state: S = initial
    val markTypes = scala.collection.mutable.Map.empty[String, S] ++ extMarks
    val jumpMarks = stmts.collect { case Stmt.Mark(n) => n }.toSet
    val markStmtState = scala.collection.mutable.Map.empty[String, S]
    for ((s, i) <- stmts.zipWithIndex) s match {
      case _: Stmt.V | _: Stmt.E =>
        if (i != 0 || initial != NoS)
          fail(s""""${s.getClass.getSimpleName}" statement is only valid at the beginning of the traversal""")
        state = if (s.isInstanceOf[Stmt.V]) VertexS else EdgeS

      case _: Stmt.In | _: Stmt.Out | _: Stmt.Both =>
        if (!elementState(state)) fail(s""""in/out/both" statement is only valid for edge or vertex types not: $state""")
        state = VertexS

      case _: Stmt.InE | _: Stmt.OutE | _: Stmt.BothE =>
        if (state != VertexS) fail(s""""inE/outE/bothE" statement is only valid for the vertex type not: $state""")
        state = EdgeS

      case _: Stmt.Has =>
        if (!elementState(state)) fail(s""""has" statement is only valid for edge or vertex types not: $state""")
      case Stmt.HasLabel(ls) =>
        if (!elementState(state)) fail(s""""hasLabel" statement is only valid for edge or vertex types not: $state""")
        if (ls.isEmpty) fail("""no labels provided to "hasLabel" statement""")
      case Stmt.HasId(ids) =>
        if (!elementState(state)) fail(s""""hasId" statement is only valid for edge or vertex types not: $state""")
        if (ids.isEmpty) fail("""no ids provided to "hasId" statement""")
      case Stmt.HasKey(ks) =>
        if (!elementState(state)) fail(s""""hasKey" statement is only valid for edge or vertex types not: $state""")
        if (ks.isEmpty) fail("""no keys provided to "hasKey" statement""")

      case Stmt.Distinct(_) =>
        if (!elementState(state)) fail(s""""distinct" statement is only valid for edge or vertex types not: $state""")

      case Stmt.As(name) =>
        if (state == NoS) fail(""""as" statement is not valid at the beginning of a traversal""")
        if (name.isEmpty) fail(""""as" statement cannot have an empty name""")
        if (name == "__current__") fail(s""""as" statement invalid; uses reserved name __current__""")
        if (!validFieldName(name)) fail(s""""as" statement invalid; bad mark name '$name'""")
        markTypes(name) = state

      case Stmt.SelectOne(name) =>
        if (!elementState(state)) fail(s""""select" statement is only valid for edge or vertex types not: $state""")
        state = markTypes.getOrElse(name, fail(s""""select" statement references unknown mark '$name'"""))
      case Stmt.SelectMany(names) =>
        if (!elementState(state)) fail(s""""select" statement is only valid for edge or vertex types not: $state""")
        if (names.isEmpty) fail(""""select" statement has an empty list of mark names""")
        names.foreach(n => if (!markTypes.contains(n)) fail(s""""select" statement references unknown mark '$n'"""))
        state = SelectionS

      case _: Stmt.Render =>
        if (!elementState(state)) fail(s""""render" statement is only valid for edge or vertex types not: $state""")
        state = RenderS
      case _: Stmt.Path =>
        if (!elementState(state)) fail(s""""path" statement is only valid for edge or vertex types not: $state""")
        state = PathS
      case _: Stmt.Fields =>
        if (!elementState(state)) fail(s""""fields" statement is only valid for edge or vertex types not: $state""")

      case Stmt.Aggregate(aggs) =>
        if (!elementState(state)) fail(s""""aggregate" statement is only valid for edge or vertex types not: $state""")
        val dup = aggs.groupBy(_.name).collectFirst { case (n, as) if as.size > 1 => n }
        dup.foreach(n => fail(s"duplicate aggregation name '$n' found; all aggregations must have a unique name"))
        state = AggS

      case _: Stmt.Count => state = CountS

      case Stmt.Jump(mark, _, _) =>
        if (!jumpMarks.contains(mark)) fail(s""""jump" statement references unknown mark '$mark'""")
        // backward jump: the loop segment must preserve the element kind
        markStmtState.get(mark).foreach { ms =>
          if (ms != state) fail(s""""jump" to mark '$mark' arrives as $state but the mark position holds $ms""")
        }

      case Stmt.Mark(n) => markStmtState(n) = state

      // limit/skip/range/set/increment/unwind: valid in any state
      // (reference adds no static check for these, compile.go:248-298)
      case _: Stmt.Limit | _: Stmt.Skip | _: Stmt.Range | _: Stmt.SetField |
           _: Stmt.Increment | _: Stmt.Unwind => ()
    }
    state
  }
}
