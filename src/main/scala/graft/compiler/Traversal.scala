package graft.compiler

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.gripql._
import graft.model.{EdgeType, GraphFrame}
import graft.functions.GJson

/** Element kind flowing through the pipeline — the reference's pipeline
  * type-state (reference: gdbi/interface.go:87-99). */
sealed trait Kind
case object VertexK extends Kind
case object EdgeK extends Kind

/** Compiles a GripQL statement list into ONE composed DataFrame plan and
  * lets Catalyst optimize the whole traversal — the same architectural move
  * as the reference's Mongo backend, which compiles a full traversal into a
  * single aggregation pipeline (reference: mongo/compile.go:57-951), except
  * here the "database" is Spark itself.
  *
  * Traveler = one row (reference: gdbi/interface.go:56-65):
  *   cur   STRUCT<gid,label,from,to,data>   — current element
  *   marks MAP<STRING, STRUCT<...>>          — saved positions (only if used)
  *   path  ARRAY<STRUCT<vertex,edge>>        — visited elements (only if used)
  *
  * Scale notes (100 TB design):
  *  - every hop is an equi-join on gid keys → shuffle hash / SMJ, AQE picks;
  *    a small vertex/edge side gets broadcast automatically.
  *  - marks/path columns are materialized ONLY when the query uses them —
  *    the static `needMarks`/`needPath` pass below is the analogue of the
  *    reference's load-data inspection (reference: engine/inspect/inspect.go:80-138),
  *    except Catalyst additionally prunes `data` out of scans when unused.
  *  - jump loops are driver-side frontier iteration with localCheckpoint to
  *    cut lineage (GraphX-Pregel shape).
  */
class Traversal(g: GraphFrame, stmts0: IndexedSeq[Stmt], spark: SparkSession,
                extensionMode: Boolean = false) {
  import Traversal._

  // statement normalization mirroring the reference's IndexStartOptimize
  // (engine/core/optimize.go:9-100): top-level has(and(...)) flattens to a
  // filter sequence, and has(eq/within on _label/_gid) becomes
  // hasLabel/hasId — same rows (label and gid are never null), but the
  // compiler's label-state then sees it, so union-branch and topology
  // hop pruning fire on the spelled-out form too
  private val stmts: IndexedSeq[Stmt] = Traversal.normalize(stmts0)

  /** Element kind saved by as(name) — select(name) restores it (the
    * reference's MarkTypes, engine/core/compile.go:284,306). */
  private val asKinds = scala.collection.mutable.Map.empty[String, Kind]

  /** Statically-known superset of the current travelers' gids — defined
    * after a literal V(ids)/E(ids)/hasId and preserved through
    * gid-preserving statements. A hop from a known point set pre-filters
    * the edge side on its join key, so `V("x").bothE()` seeks the seed's
    * adjacency instead of scanning every edge branch — the batch analogue
    * of the reference's per-id adjacency-prefix seeks
    * (kvgraph/graph.go:352-431). */
  private var pointIds: Option[Seq[String]] = None
  private val pointIdsMax = 10000

  /** Pure state transition — every execution path that applies a statement
    * (the main loop AND each jump-loop iteration) must step this in
    * lockstep, or a later hop would read a stale id set. */
  private def nextPoints(cur: Option[Seq[String]], s: Stmt): Option[Seq[String]] = s match {
    case Stmt.V(ids) if ids.nonEmpty => Some(ids)
    case Stmt.E(ids) if ids.nonEmpty => Some(ids)
    case Stmt.HasId(ids) => Some(cur.fold(ids)(_ intersect ids))
    // gid-preserving statements keep the superset invariant
    case _: Stmt.Has | _: Stmt.HasLabel | _: Stmt.HasKey | _: Stmt.Limit |
         _: Stmt.Skip | _: Stmt.Range | _: Stmt.Distinct | _: Stmt.Fields |
         _: Stmt.SetField | _: Stmt.Increment | _: Stmt.As | _: Stmt.Unwind |
         _: Stmt.Render | _: Stmt.Path => cur
    case _ => None
  }

  /** Statically-known label set saved by as(name); merged (not replaced) on
    * re-binding so a select() after a loop sees every iteration's labels —
    * a larger set only costs pruning precision, never correctness. */
  private val asLabels = scala.collection.mutable.Map.empty[String, Labels]

  private val needMarks: Boolean = extensionMode || stmts.exists {
    case _: Stmt.As | _: Stmt.SelectOne | _: Stmt.SelectMany => true
    case Stmt.Has(e) => usesMarks(e)
    case Stmt.Jump(_, Some(e), _) => usesMarks(e)
    case Stmt.SetField(k, _) => k.startsWith("$") && !k.startsWith("$.")
    case Stmt.Increment(k, _) => k.startsWith("$") && !k.startsWith("$.")
    case Stmt.Render(t) => renderUsesMarks(t)
    case Stmt.Distinct(fs) => fs.exists(f => f.startsWith("$") && !f.startsWith("$."))
    case _ => false
  }
  private val needPath: Boolean = extensionMode ||
    stmts.exists { case _: Stmt.Path => true; case _ => false }

  // ---- sidecar columns riding the traveler (r13): when a field the query
  // reads is physically indexed/shredded, the seed scan and every hop's
  // far side read the INDEX frame and carry the field's materialized
  // `__idx_*`/`__idxn_*` columns alongside `cur`. Statements whose label
  // state is fully covered then compile field reads as plain column
  // references (FieldRef.sidecar) instead of per-row get_json_object —
  // and because those are real scan columns, Catalyst pushes the
  // predicates through the hop join into the parquet scan (row-group
  // skip over the index-sorted layout). At 100 TB this turns
  // `out().has(...)` from "join everything, parse JSON per joined row"
  // into "join against a filter-pruned scan". OFF for mark/jump queries
  // (loop frontier unions and forward-jump injections must keep one
  // traveler schema across rounds/paths) and for extension runs (seed
  // frames arrive from spooled storage without the columns).

  /** Whether sidecar riding is available for this query at all. */
  private val sidecarOn: Boolean = !extensionMode && !stmts.exists {
    case _: Stmt.Mark | _: Stmt.Jump => true
    case _ => false
  }

  /** Current-element data-field paths a statement reads through
    * FieldRef.resolve (the sidecar-eligible reads). */
  private def stmtRefFields(s: Stmt): Seq[String] = {
    val keys = s match {
      case Stmt.Has(e) => Traversal.condFields(e)
      case Stmt.Jump(_, Some(e), _) => Traversal.condFields(e)
      case Stmt.Distinct(fs) => fs
      case Stmt.HasKey(ks) => ks
      case Stmt.Increment(k, _) => Seq(k)
      case Stmt.Aggregate(aggs) => aggs.collect {
        case Agg.Term(_, f, _) => f
        case Agg.Histogram(_, f, _) => f
        case Agg.Percentile(_, f, _, _) => f
        case Agg.FieldAgg(_, f) => f
        case Agg.TypeAgg(_, f) => f
      }
      case _ => Nil
    }
    keys.flatMap { k =>
      val (ns, parts) = FieldRef.parse(k)
      if (ns.isEmpty && parts.nonEmpty && parts.head.nonEmpty && !parts.head.startsWith("_"))
        Some(parts.mkString("."))
      else None
    }
  }

  /** refsAfter(i) = fields read at or after statement i — a hop carries
    * only the sidecar columns someone downstream will actually read, so
    * unused columns never widen a shuffle. */
  private val refsAfter: Array[Set[String]] = {
    val a = new Array[Set[String]](stmts.length + 1)
    a(stmts.length) = Set.empty
    for (j <- stmts.length - 1 to 0 by -1) a(j) = a(j + 1) ++ stmtRefFields(stmts(j))
    a
  }
  /** Downstream reads at the statement being compiled (stepped by exec). */
  private var remainingRefs: Set[String] = Set.empty

  /** Indexed fields (any label) on one side, restricted to query reads. */
  private def sideIndexed(kind: Kind): Seq[String] = {
    val fi = if (kind == VertexK) g.fieldIndex else g.edgeFieldIndex
    if (!sidecarOn || fi.isEmpty) Nil
    else refsAfter(0).filter(f => fi.get.entries.exists(_._2 == f)).toSeq.sorted
  }
  private lazy val vSideFields = sideIndexed(VertexK)
  private lazy val eSideFields = sideIndexed(EdgeK)

  /** Fields worth carrying onto a frame of `kind` landed right now. */
  private def carriedFields(kind: Kind): Seq[String] =
    (if (kind == VertexK) vSideFields else eSideFields).filter(remainingRefs.contains)

  /** Field paths whose sidecar columns the CURRENT frame carries. */
  private var sidecarLive: Seq[String] = Nil

  private def sidecarColNames(fields: Seq[String]): Seq[String] =
    fields.flatMap(f => Seq(graft.model.Catalog.idxCol(f),
      graft.model.Catalog.idxNumCol(f), graft.model.Catalog.idxTypeCol(f)))

  /** Pass-through projection of the live sidecar columns (for statements
    * that rebuild the frame but keep the current element). */
  private def sidecarExtra: Seq[Column] = sidecarColNames(sidecarLive).map(col)

  /** Source frame for a hop far side / seed carrying sidecar columns for
    * `fields` — the index frame (same rows, imposed schema has the
    * materialized columns) projected to the element shape + sidecar. */
  private def sourceWith(kind: Kind, fields: Seq[String]): DataFrame = {
    val fi = (if (kind == VertexK) g.fieldIndex else g.edgeFieldIndex).get
    val shapeCols = if (kind == VertexK) Seq("gid", "label", "data")
                    else Seq("gid", "label", "from", "to", "data")
    fi.rows.select((shapeCols ++ sidecarColNames(fields)).map(col): _*)
  }

  /** FieldRef.sidecar binding for compiling one statement: the live
    * fields whose (label, field) coverage holds for EVERY label the
    * current element can carry — substituting under partial coverage
    * would read null for uncovered labels whose real field is non-null. */
  private def activeSidecar(kind: Kind, labels0: Labels): Map[String, (String, Option[String], Option[String])] = {
    val fiOpt = if (kind == VertexK) g.fieldIndex else g.edgeFieldIndex
    (for {
      fi <- fiOpt.toList
      ls <- labels0.toList
      if ls.nonEmpty
      f <- sidecarLive
      if ls.forall(l => fi.entries((l, f)))
    } yield f -> (graft.model.Catalog.idxCol(f),
      if (ls.forall(l => fi.numEntries((l, f)))) Some(graft.model.Catalog.idxNumCol(f))
      else None,
      if (ls.forall(l => fi.typeEntries((l, f)))) Some(graft.model.Catalog.idxTypeCol(f))
      else None)).toMap
  }

  /** set()/increment() state rides in a typed `vars` column
    * (MAP<key, STRUCT<raw, json>>, key = "ns\u0000path") maintained by pure
    * map expressions — NO JSON rewrite inside iterated plans. Values merge
    * into the `data` document once, at output / mark selection
    * (reference semantics: engine/core/processors.go:812-853). */
  private val needVars: Boolean = extensionMode || stmts.exists {
    case _: Stmt.SetField | _: Stmt.Increment => true
    case _ => false
  }

  private val elemType = StructType(Seq(
    StructField("gid", StringType), StructField("label", StringType),
    StructField("from", StringType), StructField("to", StringType),
    StructField("data", StringType)))

  private val varsType = MapType(StringType, StructType(Seq(
    StructField("raw", StringType), StructField("json", StringType))))

  private def vertexStruct(df: DataFrame): Column = struct(
    df("gid").as("gid"), df("label").as("label"),
    lit(null).cast(StringType).as("from"), lit(null).cast(StringType).as("to"),
    df("data").as("data"))

  private def edgeStruct(df: DataFrame): Column = struct(
    df("gid").as("gid"), df("label").as("label"),
    df("from").as("from"), df("to").as("to"), df("data").as("data"))

  /** Travelers' fixed column set (+ any sidecar columns riding along). */
  private def shape(df: DataFrame, cur: Column, marks: Column, path: Column,
                    vars: Column = if (needVars) col("vars") else lit(null),
                    extra: Seq[Column] = Nil): DataFrame = {
    val cols = Seq(cur.as("cur")) ++
      (if (needMarks) Seq(marks.as("marks")) else Nil) ++
      (if (needVars) Seq(vars.as("vars")) else Nil) ++
      (if (needPath) Seq(path.as("path")) else Nil) ++
      extra
    df.select(cols: _*)
  }

  private def keep(df: DataFrame, cur: Column, pathAppend: Option[Column],
                   newVars: Option[Column] = None,
                   extra: Seq[Column] = Nil): DataFrame =
    shape(df, cur,
      if (needMarks) col("marks") else lit(null),
      if (needPath) pathAppend.map(p => concat(col("path"), array(p))).getOrElse(col("path")) else lit(null),
      if (needVars) newVars.getOrElse(col("vars")) else lit(null),
      extra)

  /** Drop current-element vars when the current element CHANGES (hop,
    * select): the reference's set() mutates the then-current DataElement,
    * which is replaced wholesale on the next traversal step — pending
    * fields must not leak onto the landed element. Mark-namespaced entries
    * survive (the marks map carries its mutated elements). */
  private def clearCurVars: Option[Column] =
    if (needVars) Some(map_filter(col("vars"), (k, _) => !k.startsWith("\u0000"))) else None

  /** Upsert one vars entry (pure map expressions, stays in codegen). */
  private def varUpsert(vars: Column, key: String, value: Column): Column =
    map_concat(map_filter(vars, (k, _) => k =!= lit(key)), map(lit(key), value))

  /** skip(n): GripQL results are unordered — the reference drops whichever
    * travelers arrive first (engine/core/processors.go:664-685) — so ANY
    * n rows may be dropped. Spark's native `Dataset.offset` (3.4+) keeps
    * the whole stream in one declarative plan (single scan, codegen intact)
    * instead of the previous two-pass RDD count-then-drop, which scanned
    * the lineage twice and broke whole-stage codegen at the `df.rdd`
    * boundary. The physical offset runs where the limit would — skip is a
    * paging operator, so n is small by construction. */
  private def dropRows(df: DataFrame, n: Long): DataFrame =
    if (n <= 0) df else df.offset(math.min(n, Int.MaxValue.toLong).toInt)

  private def pathVertexEntry(gid: Column): Column =
    struct(gid.as("vertex"), lit(null).cast(StringType).as("edge"))
  private def pathEdgeEntry(gid: Column): Column =
    struct(lit(null).cast(StringType).as("vertex"), gid.as("edge"))

  /** Pushable field-index predicate for the seed scan: the statement
    * prefix right after V() is filter-only (hasLabel/has/hasId commute),
    * so when it pins the label set to labels that ALL carry a physical
    * (label, field) index ([[graft.model.FieldIndex]]), a string
    * point predicate on that field can ALSO run against the materialized
    * `__idx_<field>` parquet column — a plain column comparison Spark
    * pushes into the scan (row-group min/max skip over the build-time
    * range-sorted layout), the reference's kvindex seek
    * (kvindex/kvindex.go:88-145, term + range iteration :307-460). Only
    * exactly-equivalent forms are rewritten: EQ/WITHIN over strings run
    * against the string `__idx_*` column (the same `raw === lit`
    * comparisons Conditions compiles); ordered predicates (GT/GTE/LT/LTE/
    * INSIDE/OUTSIDE/BETWEEN) and numeric EQ/WITHIN run against the stored
    * float64 `__idxn_*` column — materialized `try_cast(extract AS
    * double)`, identical to the engine comparison's cast
    * (engine/logic/match.go:27-69 cast.ToFloat64E; non-castable ⇒ null ⇒
    * row dropped, matching "non-castable compares false"). NEQ/WITHOUT
    * are never rewritten: they KEEP rows whose field is missing, which a
    * pushed column comparison would drop. The original filter still runs
    * on the travelers, so this is a strictly additive scan predicate. */
  private def indexSeedPredicate(fiOpt: Option[graft.model.FieldIndex]): Option[Column] = fiOpt.flatMap { fi =>
    val prefix = stmts.drop(1).takeWhile {
      case _: Stmt.Has | _: Stmt.HasLabel | _: Stmt.HasId => true
      case _ => false
    }
    val labelSets = prefix.collect { case Stmt.HasLabel(ls) => ls.toSet }
    if (labelSets.isEmpty) None
    else {
      val labels = labelSets.reduce(_ intersect _)
      // string vs numeric coverage are separate sets: the stored files
      // may carry only the string column (pre-r12 layout) — see FieldIndex
      def covered(entries: Set[(String, String)])(field: String): Boolean =
        labels.nonEmpty && labels.forall(l => entries((l, field)))
      // data-field key with no mark namespace and no reserved head
      def fieldOf(key: String): Option[String] = {
        val (ns, parts) = FieldRef.parse(key)
        if (ns.isEmpty && parts.nonEmpty && !parts.head.startsWith("_"))
          Some(parts.mkString("."))
        else None
      }
      def strCol(key: String): Option[Column] =
        fieldOf(key).filter(covered(fi.entries)).map(f => col(graft.model.Catalog.idxCol(f)))
      def numCol(key: String): Option[Column] =
        fieldOf(key).filter(covered(fi.numEntries)).map(f => col(graft.model.Catalog.idxNumCol(f)))
      val conjuncts = prefix.collect { case Stmt.Has(e) => e }.flatMap {
        case HasExpr.Cond(key, v, CondOp.EQ) => v match {
          case GValue.GString(s) => strCol(key).map(_ === lit(s))
          case GValue.GNum(d) => numCol(key).map(_ === lit(d))
          case GValue.GInt(i) => numCol(key).map(_ === lit(i.toDouble))
          case _ => None
        }
        case HasExpr.Cond(key, GValue.GArray(vs), CondOp.WITHIN) if vs.nonEmpty =>
          if (vs.forall(_.isInstanceOf[GValue.GString]))
            strCol(key).map(_.isin(vs.collect { case GValue.GString(s) => s }: _*))
          else if (vs.forall(x => x.isInstanceOf[GValue.GNum] || x.isInstanceOf[GValue.GInt]))
            numCol(key).map(_.isin(vs.flatMap(Conditions.valueNum): _*))
          else None
        case HasExpr.Cond(key, v, op @ (CondOp.GT | CondOp.GTE | CondOp.LT | CondOp.LTE)) =>
          for (d <- Conditions.valueNum(v); c <- numCol(key)) yield op match {
            case CondOp.GT => c > lit(d)
            case CondOp.GTE => c >= lit(d)
            case CondOp.LT => c < lit(d)
            case _ => c <= lit(d)
          }
        case HasExpr.Cond(key, v, op @ (CondOp.INSIDE | CondOp.OUTSIDE | CondOp.BETWEEN)) =>
          val (a, b) = Conditions.rangePair(v)
          if (a.isNaN || b.isNaN) None
          else numCol(key).map(c => op match {
            case CondOp.INSIDE => c > lit(a) && c < lit(b)
            case CondOp.OUTSIDE => c < lit(a) || c > lit(b)
            case _ => c >= lit(a) && c < lit(b)
          })
        case _ => None
      }
      conjuncts.reduceOption(_ && _)
    }
  }

  /** Seed travelers from the vertex/edge tables. V() seeds consult the
    * vertex field index, E() seeds the edge-side one (addEdgeIndex) —
    * the same rewrite, the same exactly-equivalent-forms-only rule. */
  private def seed(ids: Seq[String], fromVerts: Boolean): DataFrame = {
    val fiOpt = if (fromVerts) g.fieldIndex else g.edgeFieldIndex
    val kind0 = if (fromVerts) VertexK else EdgeK
    val shapeCols = if (fromVerts) Seq("gid", "label", "data")
                    else Seq("gid", "label", "from", "to", "data")
    val carried = if (fiOpt.isDefined) carriedFields(kind0) else Nil
    val scNames = sidecarColNames(carried)
    val base0 = (indexSeedPredicate(fiOpt), carried) match {
      // filter on the index frame FIRST (real columns → pushed filters),
      // then project back to the traveler shape (+ sidecar columns any
      // downstream statement will read)
      case (Some(pred), _) =>
        fiOpt.get.rows.filter(pred).select((shapeCols ++ scNames).map(col): _*)
      case (None, c) if c.nonEmpty => sourceWith(kind0, carried)
      case _ => if (fromVerts) g.vertices else g.edges
    }
    val base = if (ids.nonEmpty) base0.filter(col("gid").isin(ids: _*)) else base0
    val cur = if (fromVerts) vertexStruct(base) else edgeStruct(base)
    sidecarLive = carried
    shape(base, cur,
      from_json(lit("{}"), MapType(StringType, elemType)),
      array(if (fromVerts) pathVertexEntry(base("gid")) else pathEdgeEntry(base("gid"))),
      from_json(lit("{}"), varsType),
      extra = scNames.map(base(_)))
  }

  // ---- topology-based hop pruning (the reference's schema-guided planning,
  // schema/scan.go + engine/core/optimize.go): when the graph declares its
  // EdgeType triples, a hop from a statically-known label set joins only the
  // reachable edge labels and far-side vertex labels. The label filters are
  // plain `label isin (...)` predicates, so Catalyst pushes them into the
  // vertex/edge UNION branches and prunes wrong-label branches entirely —
  // at 100 TB a 2-hop traversal touches 2 tables, not 2 full unions.

  /** Edge types a hop can traverse: requested edge labels (empty = all)
    * restricted to those leaving (dir) / entering (!dir) the known source
    * vertex labels. None = graph declares no topology. Relies on the
    * GraphFrame contract that a declared topology covers EVERY edge label. */
  private def feasibleTypes(stmtLabels: Seq[String], src: Labels, dir: Boolean): Option[Seq[EdgeType]] =
    g.topology.map(_.filter(t =>
      (stmtLabels.isEmpty || stmtLabels.contains(t.label)) &&
        src.forall(_.contains(if (dir) t.from else t.to))))

  private def labelIsin(df: DataFrame, alias: String, ls: Labels): DataFrame = ls match {
    case Some(s) => df.filter(col(s"$alias.label").isin(s.toSeq.sorted: _*))
    case None => df
  }

  // Adjacency step. dir: true=out (follow from→to), false=in.
  // toEdge: land on the edge instead of the far vertex.
  // srcLabels: statically-known labels of the current element (vertex labels
  // in vertex state, edge labels in edge state); the third result component
  // is the landed element's label set.
  private def hop(df: DataFrame, kind: Kind, srcLabels: Labels, labels: Seq[String], dir: Boolean,
                  toEdge: Boolean, emitNull: Boolean): (DataFrame, Kind, Labels) = {
    val joinType = if (emitNull) "left_outer" else "inner"
    kind match {
      case EdgeK if !toEdge =>
        // edge state: out() jumps to head (`to`), in() to tail (`from`)
        // (reference: engine/core/processors.go:202-236, 281-315)
        val feas = g.topology.map(_.filter(t => srcLabels.forall(_.contains(t.label))))
        val farLabels: Labels = feas.map(_.map(t => if (dir) t.to else t.from).toSet)
        val carried = if (g.fieldIndex.isDefined) carriedFields(VertexK) else Nil
        val vSrc = if (carried.nonEmpty) sourceWith(VertexK, carried) else g.vertices
        val v = labelIsin(vSrc.alias("__v"), "__v", farLabels)
        val key = if (dir) col("cur.to") else col("cur.from")
        val joined = df.join(v, key === col("__v.gid"), joinType)
        val cur = struct(col("__v.gid").as("gid"), col("__v.label").as("label"),
          lit(null).cast(StringType).as("from"), lit(null).cast(StringType).as("to"),
          col("__v.data").as("data"))
        sidecarLive = carried
        (keep(joined, cur, Some(pathVertexEntry(col("__v.gid"))), clearCurVars,
          extra = sidecarColNames(carried).map(n => col(s"__v.$n").as(n))), VertexK, farLabels)
      case _ =>
        val feas = feasibleTypes(labels, srcLabels, dir)
        // the feasible set can narrow an unlabeled hop too (out() from a
        // known label joins only that label's outgoing edge types)
        val edgeLabels: Labels = feas.map(_.map(_.label).toSet)
        // landing ON an edge with downstream indexed-field reads: the edge
        // side comes from the index frame carrying sidecar columns (worth
        // more than the to-keyed bucketed copy — the pushed filter prunes
        // the scan before any join layout matters)
        val carriedE = if (toEdge && g.edgeFieldIndex.isDefined) carriedFields(EdgeK) else Nil
        // in-direction hops prefer the to-keyed edge copy when the graph
        // is bucketed storage (BucketedGraph) — same rows, join-key layout
        val e0 = (if (carriedE.nonEmpty) sourceWith(EdgeK, carriedE)
                  else if (dir) g.edges
                  else g.edgesByTo.getOrElse(g.edges)).alias("__e")
        val e = edgeLabels match {
          case Some(s) => e0.filter(col("__e.label").isin(s.toSeq.sorted: _*))
          case None if labels.nonEmpty => e0.filter(col("__e.label").isin(labels: _*))
          case None => e0
        }
        val eKey = if (dir) col("__e.from") else col("__e.to")
        // point-seed adjacency seek: travelers' gids are a known literal
        // set, so only matching edge rows can join (safe under left_outer
        // too — a filtered-out row could only have matched a gid outside
        // the set, which no traveler carries)
        val e1 = (kind, pointIds) match {
          case (VertexK, Some(ids)) if ids.nonEmpty && ids.size <= pointIdsMax =>
            e.filter(eKey.isin(ids: _*))
          case _ => e
        }
        val joined = df.join(e1, col("cur.gid") === eKey, joinType)
        if (toEdge) {
          val cur = struct(col("__e.gid").as("gid"), col("__e.label").as("label"),
            col("__e.from").as("from"), col("__e.to").as("to"), col("__e.data").as("data"))
          sidecarLive = carriedE
          (keep(joined, cur, Some(pathEdgeEntry(col("__e.gid"))), clearCurVars,
            extra = sidecarColNames(carriedE).map(n => col(s"__e.$n").as(n))), EdgeK, edgeLabels)
        } else {
          val farLabels: Labels = feas.map(_.map(t => if (dir) t.to else t.from).toSet)
          val carriedV = if (g.fieldIndex.isDefined) carriedFields(VertexK) else Nil
          val vSrc = if (carriedV.nonEmpty) sourceWith(VertexK, carriedV) else g.vertices
          val v = labelIsin(vSrc.alias("__v"), "__v", farLabels)
          val vKey = if (dir) col("__e.to") else col("__e.from")
          val j2 = joined.join(v, vKey === col("__v.gid"), joinType)
          val cur = struct(col("__v.gid").as("gid"), col("__v.label").as("label"),
            lit(null).cast(StringType).as("from"), lit(null).cast(StringType).as("to"),
            col("__v.data").as("data"))
          sidecarLive = carriedV
          (keep(j2, cur, Some(pathVertexEntry(col("__v.gid"))), clearCurVars,
            extra = sidecarColNames(carriedV).map(n => col(s"__v.$n").as(n))), VertexK, farLabels)
        }
    }
  }


  /** Apply one statement with the sidecar binding for the CURRENT frame in
    * scope: field reads compiled inside resolve to live sidecar columns
    * when this element's label state is fully index-covered. */
  private def applySimple(df: DataFrame, kind: Kind, labels0: Labels, s: Stmt): (DataFrame, Kind, Labels) =
    FieldRef.sidecar.withValue(activeSidecar(kind, labels0)) { applySimple0(df, kind, labels0, s) }

  private def applySimple0(df: DataFrame, kind: Kind, labels0: Labels, s: Stmt): (DataFrame, Kind, Labels) = s match {
    case Stmt.Out(labels, nul) => hop(df, kind, labels0, labels, dir = true, toEdge = false, emitNull = nul)
    case Stmt.In(labels, nul) => hop(df, kind, labels0, labels, dir = false, toEdge = false, emitNull = nul)
    case Stmt.OutE(labels, nul) => hop(df, kind, labels0, labels, dir = true, toEdge = true, emitNull = nul)
    case Stmt.InE(labels, nul) => hop(df, kind, labels0, labels, dir = false, toEdge = true, emitNull = nul)
    case Stmt.Both(labels) =>
      val (a, _, la) = hop(df, kind, labels0, labels, dir = true, toEdge = false, emitNull = false)
      val (b, _, lb) = hop(df, kind, labels0, labels, dir = false, toEdge = false, emitNull = false)
      (a.unionByName(b), VertexK, mergeLabels(la, lb))
    case Stmt.BothE(labels) =>
      val (a, _, la) = hop(df, kind, labels0, labels, dir = true, toEdge = true, emitNull = false)
      val (b, _, lb) = hop(df, kind, labels0, labels, dir = false, toEdge = true, emitNull = false)
      (a.unionByName(b), EdgeK, mergeLabels(la, lb))

    case Stmt.Has(e) => (df.filter(Conditions.toColumn(e)), kind, labels0)
    case Stmt.HasLabel(ls) =>
      (df.filter(col("cur.label").isin(ls: _*)), kind,
        Some(labels0.fold(ls.toSet)(_ intersect ls.toSet)))
    case Stmt.HasId(ids) => (df.filter(col("cur.gid").isin(ids: _*)), kind, labels0)
    case Stmt.HasKey(ks) =>
      (df.filter(ks.map(FieldRef.exists).reduce(_ && _)), kind, labels0)

    case Stmt.Limit(n) => (df.limit(n.toInt), kind, labels0)
    case Stmt.Skip(n) => (dropRows(df, n), kind, labels0)
    case Stmt.Range(start, stop) =>
      val skipped = if (start > 0) dropRows(df, start) else df
      (if (stop >= 0) skipped.limit((stop - start).toInt) else skipped, kind, labels0)

    case Stmt.Distinct(fields) =>
      // missing-field travelers are dropped; first-wins on the key tuple
      // (reference: engine/core/processors.go:723-756)
      val fs = if (fields.nonEmpty) fields else Seq("_gid")
      val keyCols = fs.map(FieldRef.resolve)
      val kept = df.filter(fs.map(FieldRef.exists).reduce(_ && _))
      (kept.withColumn("__dk", struct(keyCols: _*))
        .dropDuplicates("__dk").drop("__dk"), kind, labels0)

    case Stmt.As(name) =>
      // drop any existing binding first — no dependence on the session's
      // mapKeyDedupPolicy (re-marking the same name must be last-wins,
      // reference: engine/core/processors.go:761-778)
      asKinds(name) = kind
      asLabels(name) = if (asLabels.contains(name)) mergeLabels(asLabels(name), labels0) else labels0
      val newMarks = map_concat(map_filter(col("marks"), (k, _) => k =!= lit(name)), map(lit(name), col("cur")))
      // the mark snapshots the current element INCLUDING pending vars:
      // re-key current-element entries ("\u0000path") under the mark's
      // namespace ("name\u0000path") so $name.path lookups see them
      val newVars =
        if (!needVars) lit(null)
        else {
          val curEntries = filter(map_entries(col("vars")),
            e => e.getField("key").startsWith("\u0000"))
          val rekeyed = map_from_entries(transform(curEntries,
            e => struct(concat(lit(name), e.getField("key")).as("key"), e.getField("value").as("value"))))
          map_concat(map_filter(col("vars"), (k, _) => !k.startsWith(name + "\u0000")), rekeyed)
        }
      (shape(df, col("cur"), newMarks,
        if (needPath) col("path") else lit(null), newVars,
        extra = sidecarExtra), kind, labels0)

    case Stmt.SelectOne(name) =>
      val m = element_at(col("marks"), name)
      // fold the mark's pending vars into its data so the selected element
      // is self-contained (one UDF call at the select, not per iteration)
      val selData =
        if (needVars) GJson.json_merge_vars(m.getField("data"), col("vars"), lit(name))
        else m.getField("data")
      val sel = struct(m.getField("gid").as("gid"), m.getField("label").as("label"),
        m.getField("from").as("from"), m.getField("to").as("to"), selData.as("data"))
      val entry = when(m.getField("from").isNull, pathVertexEntry(m.getField("gid")))
        .otherwise(pathEdgeEntry(m.getField("gid")))
      sidecarLive = Nil // the mark's element has no sidecar columns here
      (keep(df, sel, Some(entry), clearCurVars), asKinds.getOrElse(name, kind),
        asLabels.getOrElse(name, None))

    case Stmt.Fields(fs) =>
      // mark-namespaced paths are not routed to the marks map here — fail
      // loudly rather than silently projecting the wrong element
      fs.foreach { f =>
        val (ns, _) = FieldRef.parse(f.stripPrefix("-"))
        require(ns.isEmpty, s"fields() does not support mark-namespaced path $f")
      }
      val (excAll, incAll) = fs.partition(_.startsWith("-"))
      val excStripped = excAll.map(_.stripPrefix("-"))
      val excReserved = excStripped.filter(_.startsWith("_")).toSet
      val excData = excStripped.filterNot(_.startsWith("_"))
      val incData = incAll.filterNot(_.startsWith("_"))
      val c = col("cur")
      // pending set() vars apply to the element BEFORE projection
      // (reference order: ValueSet mutates the document, Fields filters
      // it), and are consumed here — a later output merge must not
      // resurrect excluded fields
      val baseData =
        if (needVars) GJson.json_merge_vars(c.getField("data"), col("vars"), lit(""))
        else c.getField("data")
      // fields() with NO args strips all data; exclude-only keeps the rest
      // (reference: test/processors_test.go:299-330 — Fields() → data{},
      // Fields("-_label") → full data with label blanked)
      val newData =
        if (fs.isEmpty) lit("{}")
        else GJson.json_select(baseData,
          typedLit(incData.toArray), typedLit(excData.toArray))
      def res(name: String): Column =
        if (excReserved.contains("_" + name)) lit(null).cast(StringType)
        else c.getField(name)
      val newDataFinal = if (excReserved.contains("_data")) lit("{}") else newData
      sidecarLive = Nil // projection rewrote data; stored extractions are stale
      (keep(df, struct(res("gid").as("gid"), res("label").as("label"),
        res("from").as("from"), res("to").as("to"), newDataFinal.as("data")), None,
        clearCurVars), kind, labels0)

    case Stmt.Unwind(field) =>
      val (uns, parts) = FieldRef.parse(field)
      require(uns.isEmpty, s"unwind() does not support mark-namespaced path $field")
      val fieldPath = parts.mkString(".")
      val elems = GJson.json_array_elems(col("cur.data"), fieldPath)
      // explode_outer: empty/missing array → one traveler with field = null
      // (reference: engine/core/processors.go:464-503)
      val exploded = df.withColumn("__uw", explode_outer(elems))
      val out = exploded.withColumn("cur", struct(
        col("cur.gid").as("gid"), col("cur.label").as("label"),
        col("cur.from").as("from"), col("cur.to").as("to"),
        GJson.json_set(col("cur.data"), lit(fieldPath), coalesce(col("__uw"), lit("null"))).as("data")))
        .drop("__uw")
      // the frame still carries the column, but it no longer matches the
      // rewritten field — stop resolving through it
      sidecarLive = sidecarLive.filterNot(_ == fieldPath)
      (out, kind, labels0)

    case Stmt.SetField(key, value) =>
      val (ns, parts) = FieldRef.parse(key)
      require(parts.nonEmpty && !parts.head.startsWith("_"), s"cannot set reserved field $key")
      val entry = struct(lit(GValue.rawText(value)).cast(StringType).as("raw"),
        lit(GValue.toJson(value)).as("json"))
      (shape(df, col("cur"),
        if (needMarks) col("marks") else lit(null),
        if (needPath) col("path") else lit(null),
        varUpsert(col("vars"), FieldRef.varKey(ns, parts), entry),
        extra = sidecarExtra), kind, labels0)

    case Stmt.Increment(key, delta) =>
      val (ns, parts) = FieldRef.parse(key)
      require(parts.nonEmpty && !parts.head.startsWith("_"), s"cannot increment reserved field $key")
      // resolve() consults vars first, then the stored data document
      val next = coalesce(FieldRef.resolve(key).try_cast("double"), lit(0d)) + delta
      // preserve integer-ness (reference: engine/core/processors.go:832-853)
      val txt = when(next === floor(next) && abs(next) < 1e15,
        next.cast("long").cast("string")).otherwise(next.cast("string"))
      val entry = struct(txt.as("raw"), txt.as("json"))
      (shape(df, col("cur"),
        if (needMarks) col("marks") else lit(null),
        if (needPath) col("path") else lit(null),
        varUpsert(col("vars"), FieldRef.varKey(ns, parts), entry),
        extra = sidecarExtra), kind, labels0)

    case Stmt.Render(template) => (df.select(Render.column(template).as("render")), kind, labels0)
    case Stmt.Path() => (df.select(col("path")), kind, labels0)
    case Stmt.SelectMany(names) =>
      val cols = names.map { n =>
        val m = element_at(col("marks"), n)
        if (needVars)
          struct(m.getField("gid").as("gid"), m.getField("label").as("label"),
            m.getField("from").as("from"), m.getField("to").as("to"),
            GJson.json_merge_vars(m.getField("data"), col("vars"), lit(n)).as("data")).as(n)
        else m.as(n)
      }
      (df.select(cols: _*), kind, labels0)
    case Stmt.Count() => (df.agg(count(lit(1)).as("count")), kind, labels0)
    case Stmt.Aggregate(aggs) => (Aggregations.run(df, aggs), kind, labels0)

    case other => throw new IllegalArgumentException(s"unhandled statement $other at this position")
  }

  /** Execute with control-flow (mark/jump) handled as driver-side frontier
    * iteration (reference: engine/logic/jump.go — signal-token termination
    * becomes frontier-emptiness + localCheckpoint).
    *
    * Loop hygiene (100 TB design):
    *  - one driver action per iteration beyond the checkpoint (a combined
    *    count(arrivals) / count(frontier) aggregate);
    *  - every per-iteration checkpoint except the final result is
    *    unpersisted once the loop's output is materialized — no executor
    *    memory creep over deep walks;
    *  - exceeding maxIters is an ERROR, never a silently truncated result
    *    (the reference terminates only on frontier exhaustion,
    *    engine/logic/jump.go:71-123).
    */
  def run(maxIters: Int = 1000): DataFrame = FieldRef.hasVars.withValue(needVars) {
    Validate(stmts) // type-state check BEFORE any Spark work
    val (df, _) = exec(None, maxIters)
    finish(df)
  }

  /** Resume from spooled travelers (job/pipeline extension — reference:
    * gdbi/pipeline.go:19-23 CompileOptions incl. ExtensionMarkTypes,
    * server/job_manager.go:110-140). `seed` must be the normalized traveler
    * shape (cur, marks, vars, path). */
  def runExtension(seedDf: DataFrame, seedKind: Kind,
                   extMarks: Map[String, Kind] = Map.empty,
                   maxIters: Int = 1000): DataFrame =
    FieldRef.hasVars.withValue(needVars) {
      def vs(k: Kind) = if (k == VertexK) Validate.VertexS else Validate.EdgeS
      asKinds ++= extMarks
      Validate(stmts, vs(seedKind), extMarks.map { case (n, k) => n -> (vs(k): Validate.S) })
      val (df, _) = exec(Some((seedDf, seedKind)), maxIters)
      finish(df)
    }

  /** Run and return the raw traveler table, final kind, and mark kinds for
    * spooling (result must be element-typed). Construct with
    * extensionMode=true so all traveler columns are materialized. */
  def spool(maxIters: Int = 1000): (DataFrame, Kind, Map[String, Kind]) =
    FieldRef.hasVars.withValue(needVars) {
      val st = Validate(stmts)
      require(st == Validate.VertexS || st == Validate.EdgeS,
        s"only element-typed results can be spooled for extension, not $st")
      val (df, k) = exec(None, maxIters)
      (df, k, asKinds.toMap)
    }

  private def exec(seedOpt: Option[(DataFrame, Kind)], maxIters: Int): (DataFrame, Kind) = {
    val markPos: Map[String, Int] = stmts.zipWithIndex.collect { case (Stmt.Mark(n), i) => n -> i }.toMap

    var kind: Kind = VertexK
    var labels: Labels = None
    var df: DataFrame = seedOpt match {
      case Some((sdf, k)) =>
        kind = k
        shape(sdf, col("cur"), col("marks"), col("path"), col("vars"))
      case None => stmts.head match {
        case Stmt.V(ids) =>
          kind = VertexK; pointIds = nextPoints(None, stmts.head)
          remainingRefs = refsAfter(1); seed(ids, fromVerts = true)
        case Stmt.E(ids) =>
          kind = EdgeK; pointIds = nextPoints(None, stmts.head)
          remainingRefs = refsAfter(1); seed(ids, fromVerts = false)
        case other => throw new IllegalArgumentException(s"query must start with V() or E(), got $other")
      }
    }

    // forward-jump injections: mark position → travelers arriving there
    val injections = scala.collection.mutable.Map.empty[Int, List[(DataFrame, Kind, Labels)]]
    // element kind observed at each mark position — loop-back and forward
    // jumps must arrive with the same kind (the reference compiler's
    // type-state check, engine/core/compile.go:93-382)
    val markKinds = scala.collection.mutable.Map.empty[Int, Kind]
    var i = if (seedOpt.isDefined) 0 else 1
    while (i < stmts.length) {
      // sidecar columns a hop at THIS statement should carry forward
      remainingRefs = refsAfter(i + 1)
      stmts(i) match {
        case Stmt.Mark(_) =>
          markKinds(i) = kind
          for (in <- injections.remove(i); (d, k, l) <- in) {
            require(k == kind, s"forward jump into mark of different element kind ($k vs $kind)")
            df = df.unionByName(d)
            labels = mergeLabels(labels, l)
          }

        case Stmt.Jump(mark, cond, emit) =>
          val target = markPos.getOrElse(mark, throw new IllegalArgumentException(s"unknown mark $mark"))
          if (target > i) { // forward jump: route matching travelers ahead
            val jumpers = cond.map(c => df.filter(Conditions.toColumn(c))).getOrElse(df)
            injections(target) = (jumpers, kind, labels) :: injections.getOrElse(target, Nil)
            df = if (emit) df else df.limit(0)
          } else { // backward jump: iterate the mark..jump segment
            require(markKinds.get(target).forall(_ == kind),
              s"jump to mark '$mark' arrives as $kind but the mark position holds ${markKinds(target)} — " +
              "the loop segment changes the element kind")
            val body = stmts.slice(target + 1, i)
            // early-exit bound: the first Limit/Range downstream of the jump,
            // reachable through row-preserving (1:1) statements only — the
            // batch analogue of the reference's context-cancel from any
            // downstream limit (engine/core/processors.go:641,700)
            val suffix = stmts.drop(i + 1)
            val preserving = suffix.takeWhile {
              case _: Stmt.As | _: Stmt.SelectOne | _: Stmt.Fields | _: Stmt.Render |
                   _: Stmt.SetField | _: Stmt.Increment | _: Stmt.Path => true
              case _ => false
            }
            val downstreamLimit = suffix.drop(preserving.length).headOption.collect {
              case Stmt.Limit(n) => n
              case Stmt.Range(_, stop) if stop >= 0 => stop
            }
            val condCol = cond.map(Conditions.toColumn)
            // Per-iteration cost discipline: the checkpoint is LAZY, so the
            // counts aggregate below both materializes it and measures it in
            // ONE Spark job (eager checkpoint + separate count = two full
            // passes); and the frontier is coalesced to a partition count
            // proportional to its measured size, so a 3-row frontier doesn't
            // pay 32 tasks per subsequent job. Coalesce only ever narrows —
            // a 1B-row frontier keeps its parallelism.
            val rowsPerPart = 65536L
            def sized(d: DataFrame, n: Long): DataFrame = {
              val cur = d.rdd.getNumPartitions
              val want = math.max(1L, math.min(cur.toLong, (n + rowsPerPart - 1) / rowsPerPart)).toInt
              if (want < cur) d.coalesce(want) else d
            }
            // one action: (total arrivals, arrivals matching the jump condition)
            def counts(d: DataFrame): (Long, Long) = {
              val r = d.agg(count(lit(1)), count(when(condCol.getOrElse(lit(true)), 1))).head()
              (r.getLong(0), r.getLong(1))
            }
            // Join-free bodies (pure row-local statements) are UNROLLED in
            // blocks of `unrollK` iterations between checkpoints: one plan,
            // one job, one codegen unit per block instead of per iteration —
            // the fixed overhead was the dominant cost of counter-style
            // loops. Bodies with adjacency joins are NOT unrolled: chaining
            // k joins lazily would re-stream the edge table for every
            // overlapping stage prefix, which loses at scale.
            val narrowBody = body.forall {
              case _: Stmt.Has | _: Stmt.HasLabel | _: Stmt.HasId | _: Stmt.HasKey |
                   _: Stmt.SetField | _: Stmt.Increment | _: Stmt.As | _: Stmt.SelectOne |
                   _: Stmt.Fields | _: Stmt.Unwind => true
              case _ => false
            }
            // NOTE on raising unrollK: the inter-stage RDD barriers below
            // are deliberately unpersisted, so stage j's row-local work is
            // re-executed by each later stage prefix — O(k²)/2 redundant
            // row-local evaluations per block. Cheap at k=4; cache the
            // barrier RDDs within the block before going much higher.
            val unrollK = if (narrowBody) 4 else 1
            // label state: per-iteration transfer through the body (each
            // applyBody call advances it), union over every emitted batch
            var loopLabels: Labels = labels
            var outLabels: Labels = labels
            def applyBody(d0: DataFrame): DataFrame = {
              var d2 = d0
              var k2 = kind
              var l2 = loopLabels
              // arrivals enter with the jump-time gid superset (they are
              // the filtered END of the previous body pass); inside the
              // body the point state must step per statement exactly like
              // the main loop, then reset for the next iteration
              val entryPoints = pointIds
              for (s <- body) {
                val r = applySimple(d2, k2, l2, s); d2 = r._1; k2 = r._2; l2 = r._3
                pointIds = nextPoints(pointIds, s)
              }
              pointIds = entryPoints
              require(k2 == kind,
                s"jump loop body must preserve the element kind (starts $kind, ends $k2)")
              loopLabels = l2
              outLabels = mergeLabels(outLabels, l2)
              d2
            }
            // ids of the localCheckpoints THIS loop created — the only
            // RDDs the per-round and post-loop sweeps may free. Diffing
            // the session-global getPersistentRDDs instead (the previous
            // shape) would unpersist a concurrent query's checkpoint
            // created mid-loop on a shared SparkSession (server/gRPC
            // pool), and a checkpoint's truncated lineage cannot
            // recompute. localCheckpoint registers its persist at call
            // time on the driver, so the before/after diff brackets just
            // this call — any concurrent id landing inside the bracket is
            // at worst freed later than its owner intended, never while a
            // job still needs it computed (unpersist leaves materialized
            // block readers unaffected; recompute-after-free is what
            // kills checkpoints, and we only free ids we created).
            val ownIds = scala.collection.mutable.Set.empty[Int]
            def ckpt(d: DataFrame): DataFrame = {
              val before = spark.sparkContext.getPersistentRDDs.keySet
              val c = d.localCheckpoint(false)
              ownIds ++= spark.sparkContext.getPersistentRDDs.keySet.diff(before)
              c
            }
            var arrivals = ckpt(df)
            var (nArr, nFront) = counts(arrivals)
            arrivals = sized(arrivals, nArr)
            var emitted: Option[DataFrame] = if (emit) Some(arrivals) else None
            var emittedCount = if (emit) nArr else 0L
            var iter = 0
            def overrun(): Nothing = throw new IllegalStateException(
              s"jump loop to mark '$mark' exceeded $maxIters iterations with a non-empty frontier; " +
              "raise maxIters if the walk is legitimately this deep")
            val loopDebug = sys.env.contains("GRAFT_LOOP_DEBUG")
            // emit=false walks need only the LATEST frontier checkpoint:
            // freeing the previous round's blocks right after the new
            // round's counts() materializes keeps loop storage at O(1
            // round) regardless of depth — without this, a 1M-row
            // frontier accumulates ~0.4 GB/round until eviction spills
            // every later round to disk (measured: rounds 1-9 constant
            // 1.8-2 s, rounds 16+ at 5.7-6.4 s once storage passed 4 GB).
            // emit=true keeps its batches: they ARE the result. The sweep
            // frees exactly the loop's OWN checkpoints that predate this
            // round's (the new one is already materialized by counts(),
            // so nothing can recompute through the freed lineage).
            def freeStale(prevOwn: Set[Int]): Unit = if (!emit) {
              val persisted = spark.sparkContext.getPersistentRDDs
              for (id <- prevOwn; rdd <- persisted.get(id)) rdd.unpersist(false)
              ownIds --= prevOwn
            }
            while (nFront > 0 && downstreamLimit.forall(emittedCount < _)) {
              if (iter >= maxIters) overrun()
              val k = math.min(unrollK, maxIters - iter)
              if (k <= 1) {
                iter += 1
                val rt0 = if (loopDebug) System.nanoTime() else 0L
                val prevOwn = ownIds.toSet
                arrivals = ckpt(applyBody(condCol.map(arrivals.filter).getOrElse(arrivals)))
                val c = counts(arrivals); nArr = c._1; nFront = c._2
                arrivals = sized(arrivals, nArr)
                freeStale(prevOwn)
                if (emit) {
                  emitted = Some(emitted.get.unionByName(arrivals))
                  emittedCount += nArr
                }
                if (loopDebug) {
                  val st = spark.sparkContext.getRDDStorageInfo
                  System.err.println(f"[loop] round $iter ${(System.nanoTime() - rt0) / 1e9}%.2f s " +
                    f"rows=$nArr front=$nFront storageMem=${st.map(_.memSize).sum >> 20}MB " +
                    f"storageDisk=${st.map(_.diskSize).sum >> 20}MB rdds=${st.length}")
                }
              } else {
                // k chained stages, tagged and unioned under ONE checkpoint;
                // stages after the frontier empties are body(empty) = empty,
                // so unioning them changes nothing. Each stage is separated
                // by a LAZY RDD barrier: without it CollapseProject inlines
                // the per-stage vars/filter expressions into one another and
                // the expression tree grows exponentially in k (each stage
                // references `vars` several times). The barrier keeps k
                // small independent plans composed at the RDD level — still
                // ONE job materializes the whole block.
                val prevOwn = ownIds.toSet
                var d2 = arrivals
                val stages = (1 to k).map { j =>
                  d2 = applyBody(condCol.map(d2.filter).getOrElse(d2))
                  if (j < k) d2 = spark.createDataFrame(d2.rdd, d2.schema)
                  d2.withColumn("__stage", lit(j))
                }
                val u = ckpt(stages.reduce(_ unionByName _))
                val byStage = u.groupBy(col("__stage")).agg(
                    count(lit(1)), count(when(condCol.getOrElse(lit(true)), 1)))
                  .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2))).toMap
                val stats = (1 to k).map(j => byStage.getOrElse(j, (0L, 0L)))
                // material iterations = stages up to and including the first
                // empty-frontier stage (where the original loop would exit)
                val jEnd = stats.indexWhere(_._2 == 0L) match {
                  case -1 => k
                  case idx => idx + 1
                }
                iter += jEnd
                nArr = stats(k - 1)._1; nFront = stats(k - 1)._2
                arrivals = sized(u.filter(col("__stage") === k).drop("__stage"), nArr)
                freeStale(prevOwn) // u is materialized; prior blocks are dead weight
                if (emit) {
                  emitted = Some(emitted.get.unionByName(u.drop("__stage")))
                  emittedCount += stats.map(_._1).sum
                }
              }
            }
            df = emitted.getOrElse(df.limit(0))
            labels = if (emit) outLabels else loopLabels
            // materialize the loop output, then free every intermediate
            // checkpoint this loop owns — including the pre-loop arrivals
            // checkpoint that exists even when the loop ran zero
            // iterations. Only the final eager checkpoint (the ids minted
            // by THIS call) survives.
            val beforeFinal = spark.sparkContext.getPersistentRDDs.keySet
            df = df.localCheckpoint(true)
            val keep = spark.sparkContext.getPersistentRDDs.keySet.diff(beforeFinal)
            val persisted = spark.sparkContext.getPersistentRDDs
            for (id <- ownIds if !keep.contains(id); rdd <- persisted.get(id))
              rdd.unpersist(false)
          }

        case Stmt.Unwind(field) if Traversal.fusableUnwindAgg(field, stmts.lift(i + 1)) =>
          // unwind→aggregate fusion: the aggregate is terminal and reads
          // ONLY the unwound field, so the exploded element needn't be
          // json_set back into the full property bag (a whole-document
          // parse+serialize UDF per exploded row) — or even wrapped into a
          // minimal document: each element is already JSON text, so the
          // aggregation key is its scalar decode ([elem] → $[0], one tiny
          // parse) and the container-skip test is its first character,
          // replacing two variant parses per exploded row
          val (_, parts) = FieldRef.parse(field)
          val elems = GJson.json_array_elems(col("cur.data"), parts.mkString("."))
          val exploded = df.withColumn("__uw", explode_outer(elems))
          val pre = Aggregations.Pre(
            scalar = get_json_object(concat(lit("["), col("__uw"), lit("]")), "$[0]"),
            isContainer = col("__uw").startsWith("[") || col("__uw").startsWith("{"))
          val aggs = stmts(i + 1).asInstanceOf[Stmt.Aggregate].aggs
          df = Aggregations.run(exploded, aggs, Some(pre))
          i += 1 // the aggregate was consumed by the fusion

        case s =>
          val r = applySimple(df, kind, labels, s)
          df = r._1; kind = r._2; labels = r._3
      }
      // the hop that just ran read the PRE-statement point set; update it
      // for the next statement (Mark/Jump/hops invalidate, filters keep)
      pointIds = nextPoints(pointIds, stmts(i))
      i += 1
    }

    (df, kind)
  }

  /** Default output: flatten current element (reference: pipes.go:118-243
    * Convert); pending vars fold into data HERE, once — never per iteration. */
  private def finish(df: DataFrame): DataFrame =
    stmts.lastOption match {
      case Some(_: Stmt.Count | _: Stmt.Aggregate | _: Stmt.Render | _: Stmt.Path | _: Stmt.SelectMany) => df
      // None = empty extension (Jobs.view): emit the full element
      case _ =>
        val dataOut =
          if (needVars) GJson.json_merge_vars(col("cur.data"), col("vars"), lit(""))
          else col("cur.data")
        df.select(col("cur.gid").as("gid"), col("cur.label").as("label"),
          col("cur.from").as("from"), col("cur.to").as("to"), dataOut.as("data"))
    }
}

object Traversal {
  /** Statement-level normalization (reference: engine/core/optimize.go
    * IndexStartOptimize): flatten top-level has(and(...)) and rewrite
    * label/gid equality filters into their indexed statement forms. */
  private[graft] def normalize(stmts: IndexedSeq[Stmt]): IndexedSeq[Stmt] = {
    def strings(v: GValue): Option[Seq[String]] = v match {
      case GValue.GString(s) => Some(Seq(s))
      case GValue.GArray(vs) =>
        val ss = vs.collect { case GValue.GString(s) => s }
        if (ss.length == vs.length) Some(ss) else None
      case _ => None
    }
    def expand(e: HasExpr): Seq[Stmt] = e match {
      case HasExpr.And(cs) => cs.flatMap(expand)
      case HasExpr.Cond("_label", GValue.GString(s), CondOp.EQ) =>
        Seq(Stmt.HasLabel(Seq(s)))
      case HasExpr.Cond("_label", v @ GValue.GArray(_), CondOp.WITHIN) if strings(v).isDefined =>
        Seq(Stmt.HasLabel(strings(v).get))
      case HasExpr.Cond("_gid", GValue.GString(s), CondOp.EQ) =>
        Seq(Stmt.HasId(Seq(s)))
      case HasExpr.Cond("_gid", v @ GValue.GArray(_), CondOp.WITHIN) if strings(v).isDefined =>
        Seq(Stmt.HasId(strings(v).get))
      case other => Seq(Stmt.Has(other))
    }
    stmts.flatMap {
      case Stmt.Has(e) => expand(e)
      case s => IndexedSeq(s)
    }
  }

  /** Statically-known label set of the current element; None = unknown. */
  type Labels = Option[Set[String]]

  /** Label state of a union of two traveler streams: known only when both
    * sides are known. */
  def mergeLabels(a: Labels, b: Labels): Labels = for (x <- a; y <- b) yield x ++ y

  def run(spark: SparkSession, g: GraphFrame, q: Query): DataFrame =
    new Traversal(g, q.stmts.toIndexedSeq, spark).run()

  def run(spark: SparkSession, g: GraphFrame, q: Query, maxIters: Int): DataFrame =
    new Traversal(g, q.stmts.toIndexedSeq, spark).run(maxIters)

  /** unwind(f) directly feeding aggregate(...) where every aggregation
    * reads exactly f (same-document, plain identifier segments): safe to
    * fuse — the aggregate is the sole consumer of the rebuilt document. */
  private[compiler] def fusableUnwindAgg(field: String, next: Option[Stmt]): Boolean = next match {
    case Some(Stmt.Aggregate(aggs)) =>
      val (ns, parts) = FieldRef.parse(field)
      ns.isEmpty && parts.nonEmpty && !parts.head.startsWith("_") &&
        parts.forall(_.matches("[A-Za-z0-9_]+")) &&
        aggs.nonEmpty && aggs.forall {
          case Agg.Term(_, f, _) => f == field
          case Agg.Histogram(_, f, _) => f == field
          case Agg.Percentile(_, f, _, _) => f == field
          case _ => false
        }
    case _ => false
  }

  /** All condition keys in a has-expression (for sidecar planning). */
  private[compiler] def condFields(e: HasExpr): Seq[String] = e match {
    case HasExpr.And(cs) => cs.flatMap(condFields)
    case HasExpr.Or(cs) => cs.flatMap(condFields)
    case HasExpr.Not(c) => condFields(c)
    case HasExpr.Cond(k, _, _) => Seq(k)
  }

  private[compiler] def usesMarks(e: HasExpr): Boolean = e match {
    case HasExpr.And(cs) => cs.exists(usesMarks)
    case HasExpr.Or(cs) => cs.exists(usesMarks)
    case HasExpr.Not(c) => usesMarks(c)
    case HasExpr.Cond(k, _, _) => k.startsWith("$") && !k.startsWith("$.")
  }

  private[compiler] def renderUsesMarks(t: GValue): Boolean = t match {
    case GValue.GString(s) => s.startsWith("$") && !s.startsWith("$.")
    case GValue.GArray(vs) => vs.exists(renderUsesMarks)
    case GValue.GObj(fs) => fs.exists(f => renderUsesMarks(f._2))
    case _ => false
  }
}
