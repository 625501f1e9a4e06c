package graft.compiler

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.gripql.Agg
import graft.functions.GJson

/** Terminal aggregate([...]) — N named aggregations over the same traveler
  * stream (reference: engine/core/processors.go:948-1134). Result rows are
  * (name STRING, key STRING, value DOUBLE), the flattened form of the
  * reference's NamedAggregationResult (gripql/gripql.proto:122-126).
  *
  * Fan-out shape: each aggregation's INPUT columns (the resolved field
  * value, its container-type test, ...) are row-local derivations, so they
  * are computed first and only that narrow projection feeds the fan-out —
  * never the full traveler rows. At 100 TB the difference is a few strings
  * per row vs re-serializing every property bag into storage memory.
  *
  * Every key→count-shaped aggregation (term / type / field / count) merges
  * into ONE explode + groupBy(name, key) pass: a single scan and a single
  * shuffle no matter how many such aggregations the statement fans out to,
  * with Spark's native map-side partial aggregation (the reference's
  * disk-spilling KV variant, processors_extra.go, collapses into Spark's
  * spillable hash aggregate). Term sizing (top-k per name) rides a window
  * over the already-aggregated tiny frame. Only histogram / percentile —
  * whose shapes need bounds passes or t-digests — run as separate
  * aggregations, and only then is the narrow projection persisted and the
  * fan-out materialized eagerly (so the shared cache can be released).
  * A pure key-count statement returns a LAZY single-shuffle plan.
  */
object Aggregations {
  /** "25" for 25.0, "99.9" for 99.9 — percent keys render like the JSON numbers. */
  private def fmtNum(d: Double): String =
    if (d == d.floor && math.abs(d) < 1e15) d.toLong.toString else d.toString

  /** Pre-resolved aggregation input (the unwind→aggregate fusion): every
    * aggregation reads this scalar instead of re-extracting its field from
    * a rebuilt document. `scalar` is the decoded field value as text;
    * `isContainer` the array/object skip test. */
  case class Pre(scalar: Column, isContainer: Column)

  private def isKeyCount(a: Agg): Boolean = a match {
    case _: Agg.Term | _: Agg.TypeAgg | _: Agg.FieldAgg | _: Agg.CountAgg => true
    case _ => false
  }

  def run(df0: DataFrame, aggs: Seq[Agg], pre: Option[Pre] = None): DataFrame = {
    // histogram/percentile evaluate the narrow frame more than once — only
    // they force a persist + eager materialization of the fan-out
    val heavy = aggs.filterNot(isKeyCount)
    val multi = heavy.nonEmpty && aggs.size > 1

    // ---- per-agg input derivations (row-local, pre-cache) ----
    def p(i: Int, n: String) = s"__a${i}_$n"
    val inputs: Seq[Seq[(String, Column)]] = aggs.zipWithIndex.map {
      case (Agg.Term(_, field, _), i) =>
        // value → frequency; container-valued (array/map) fields are
        // skipped (reference: processors.go:980-1019, 1001-1003). Typing
        // via native variant expressions, not a UDF.
        pre match {
          case Some(pr) =>
            Seq(p(i, "key") -> pr.scalar, p(i, "skip") -> pr.isContainer)
          case None =>
            val (ns, pathParts) = FieldRef.parse(field)
            val isDataField = pathParts.headOption.exists(x => x.nonEmpty && !x.startsWith("_"))
            // container test from the stored type tag when the sidecar is
            // active (tag "MAP"/"ARRAY" ⟺ variant schema OBJECT/ARRAY by
            // construction) — the LAST document parse a covered term paid
            val skip =
              if (isDataField) FieldRef.resolveTypeTag(field) match {
                case Some(tag) => coalesce(tag.isin("MAP", "ARRAY"), lit(false))
                case None =>
                  val t = schema_of_variant(try_variant_get(
                    try_parse_json(FieldRef.elem(ns).getField("data")),
                    "$." + pathParts.mkString("."), "variant"))
                  t.startsWith("ARRAY") || t.startsWith("OBJECT")
              } else lit(false)
            Seq(p(i, "key") -> FieldRef.resolve(field), p(i, "skip") -> skip)
        }
      case (Agg.Histogram(_, field, _), i) =>
        // the stored float64 sidecar column when the frame carries it —
        // identical to try_cast(resolve) by construction, zero parse
        Seq(p(i, "x") -> pre.map(_.scalar.try_cast("double"))
          .orElse(FieldRef.resolveNumeric(field))
          .getOrElse(FieldRef.resolve(field).try_cast("double")))
      case (Agg.Percentile(_, field, _, _), i) =>
        Seq(p(i, "x") -> pre.map(_.scalar.try_cast("double"))
          .orElse(FieldRef.resolveNumeric(field))
          .getOrElse(FieldRef.resolve(field).try_cast("double")))
      case (Agg.FieldAgg(_, field), i) =>
        Seq(p(i, "keys") -> json_object_keys(FieldRef.resolve(field)))
      case (Agg.TypeAgg(_, field), i) =>
        // stored tag when covered: fold missing (NULL) and JSON null
        // ("VOID") to UNKNOWN exactly like GJson.json_type does
        val (ns, parts) = FieldRef.parse(field)
        Seq(p(i, "t") -> (FieldRef.resolveTypeTag(field) match {
          case Some(tag) =>
            when(tag.isNull || tag === "VOID", lit("UNKNOWN")).otherwise(tag)
          case None =>
            GJson.json_type(FieldRef.elem(ns).getField("data"), parts.mkString("."))
        }))
      case (Agg.CountAgg(_), _) => Nil
    }
    val narrow = df0.select(inputs.flatten.map { case (n, c) => c.as(n) }: _*)
    val df = if (multi) narrow.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
             else narrow

    // ---- ONE explode + groupBy(name, key) for every key→count agg ----
    // (0..n (name, key) pairs per row per agg; a term whose value is
    // container-typed or null contributes nothing, a field agg fans out
    // its map keys, count contributes a constant key)
    def emptyLike(arr: Column): Column = filter(arr, _ => lit(false))
    val keyCountCols: Seq[Column] = aggs.zipWithIndex.collect {
      case (Agg.Term(name, _, _), i) =>
        val one = array(struct(lit(name).as("name"), col(p(i, "key")).as("key")))
        when(col(p(i, "key")).isNotNull && !col(p(i, "skip")), one)
          .otherwise(emptyLike(one))
      case (Agg.TypeAgg(name, _), i) =>
        array(struct(lit(name).as("name"), col(p(i, "t")).as("key")))
      case (Agg.FieldAgg(name, _), i) =>
        coalesce(
          transform(col(p(i, "keys")), k => struct(lit(name).as("name"), k.as("key"))),
          emptyLike(array(struct(lit(name).as("name"), lit("").as("key")))))
      case (Agg.CountAgg(name), _) =>
        array(struct(lit(name).as("name"), lit("count").as("key")))
    }
    val keyCountPart: Option[DataFrame] =
      if (keyCountCols.isEmpty) None
      else {
        val merged = df.select(explode(concat(keyCountCols: _*)).as("kv"))
          .groupBy(col("kv.name").as("name"), col("kv.key").as("key"))
          .agg(count(lit(1)).cast("double").as("value"))
        // top-k per sized term, over the already-aggregated (tiny) frame —
        // same (value desc, key) order as the reference's sort+truncate
        val sizes = aggs.collect { case Agg.Term(n, _, s) if s > 0 => (n, s) }
        val sized =
          if (sizes.isEmpty) merged
          else {
            val w = org.apache.spark.sql.expressions.Window
              .partitionBy("name").orderBy(col("value").desc, col("key"))
            val cap = sizes.foldLeft(lit(Int.MaxValue)) { case (acc, (n, s)) =>
              when(col("name") === n, lit(s)).otherwise(acc)
            }
            merged.withColumn("__r", row_number().over(w))
              .filter(col("__r") <= cap).drop("__r")
          }
        Some(sized.select(col("name"), col("key"), col("value")))
      }

    // ---- the bounds/digest-shaped aggs keep their own passes ----
    val parts = keyCountPart.toSeq ++ aggs.zipWithIndex.collect[DataFrame] {
      case (Agg.Histogram(name, _, interval), i) =>
        // dense buckets min→max including zeros (reference: processors.go:1021-1065)
        val bucketed = df.select((floor(col(p(i, "x")) / interval) * interval).as("bucket"))
          .filter(col("bucket").isNotNull)
          .groupBy("bucket").agg(count(lit(1)).cast("double").as("value"))
        val bounds = bucketed.agg(min("bucket").as("lo"), max("bucket").as("hi"))
        // sequence() is integral-only; generate bucket ordinals then scale
        val dense = bounds.select(col("lo"),
            explode(sequence(lit(0L), ((col("hi") - col("lo")) / interval).cast("long"))).as("i"))
          .select((col("lo") + col("i") * interval).as("bucket"))
        dense.join(bucketed, Seq("bucket"), "left_outer")
          .select(lit(name).as("name"), col("bucket").cast("string").as("key"),
            coalesce(col("value"), lit(0d)).as("value"))

      case (Agg.Percentile(name, _, percents, exact), i) =>
        // default: t-digest approximate quantiles; conformance tolerance
        // ±15% (reference: processors.go:1067-1091, ot_aggregations.py:108-116).
        // exact: positional linear interpolation over the sorted values —
        // same definition as DuckDB quantile_cont / the Mongo backend.
        val vals = df.select(col(p(i, "x")).as("x")).filter(col("x").isNotNull)
        val aggCols = percents.zipWithIndex.map { case (pc, j) =>
          (if (exact) percentile(col("x"), lit(pc / 100.0))
           else percentile_approx(col("x"), lit(pc / 100.0), lit(10000))).as(s"q$j") }
        val one = vals.agg(aggCols.head, aggCols.tail: _*)
        percents.zipWithIndex.map { case (pc, j) =>
          one.select(lit(name).as("name"),
            lit(fmtNum(pc)).as("key"), col(s"q$j").as("value"))
        }.reduce(_ unionByName _)
    }
    val out = parts.reduce(_ unionByName _)
    if (multi) {
      // a mixed fan-out re-evaluates the persisted narrow frame: its
      // output is small, so materialize eagerly and release the shared
      // cache so long-lived sessions don't leak blocks (the reference's
      // per-query temp KV store is likewise dropped at query end). The
      // pure key-count case above never takes this path — it is one lazy
      // single-shuffle plan with nothing to release.
      val res = out.localCheckpoint(true)
      df.unpersist(false)
      res
    } else out
  }
}
