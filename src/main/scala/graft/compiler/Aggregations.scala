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
  * are computed first and only that narrow projection is cached for the
  * fan-out — never the full traveler rows. At 100 TB the difference is
  * caching a few doubles per row vs re-serializing every property bag into
  * storage memory. Each aggregation is then a groupBy whose partial
  * (map-side) aggregation Spark handles natively; the reference's
  * disk-spilling KV variant (processors_extra.go) collapses into Spark's
  * spillable hash aggregate.
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

  def run(df0: DataFrame, aggs: Seq[Agg], pre: Option[Pre] = None): DataFrame = {
    val multi = aggs.size > 1

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
            val skip =
              if (isDataField) {
                val t = schema_of_variant(try_variant_get(
                  try_parse_json(FieldRef.elem(ns).getField("data")),
                  "$." + pathParts.mkString("."), "variant"))
                t.startsWith("ARRAY") || t.startsWith("OBJECT")
              } else lit(false)
            Seq(p(i, "key") -> FieldRef.resolve(field), p(i, "skip") -> skip)
        }
      case (Agg.Histogram(_, field, _), i) =>
        Seq(p(i, "x") -> pre.map(_.scalar).getOrElse(FieldRef.resolve(field)).try_cast("double"))
      case (Agg.Percentile(_, field, _, _), i) =>
        Seq(p(i, "x") -> pre.map(_.scalar).getOrElse(FieldRef.resolve(field)).try_cast("double"))
      case (Agg.FieldAgg(_, field), i) =>
        Seq(p(i, "keys") -> json_object_keys(FieldRef.resolve(field)))
      case (Agg.TypeAgg(_, field), i) =>
        val (ns, parts) = FieldRef.parse(field)
        Seq(p(i, "t") -> GJson.json_type(FieldRef.elem(ns).getField("data"), parts.mkString(".")))
      case (Agg.CountAgg(_), _) => Nil
    }
    val narrow = df0.select(inputs.flatten.map { case (n, c) => c.as(n) }: _*)
    val df = if (multi) narrow.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
             else narrow

    // ---- per-agg groupBys over the narrow inputs ----
    val parts = aggs.zipWithIndex.map {
      case (Agg.Term(name, _, size), i) =>
        val keyed = df
          .filter(col(p(i, "key")).isNotNull && !col(p(i, "skip")))
          .groupBy(col(p(i, "key")).as("key"))
          .agg(count(lit(1)).cast("double").as("value"))
        val sized = if (size > 0) keyed.orderBy(col("value").desc, col("key")).limit(size) else keyed
        sized.select(lit(name).as("name"), col("key"), col("value"))

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

      case (Agg.FieldAgg(name, _), i) =>
        // map-valued field: key → #docs containing key (processors.go:1093-1109)
        df.select(explode(col(p(i, "keys"))).as("key"))
          .groupBy("key").agg(count(lit(1)).cast("double").as("value"))
          .select(lit(name).as("name"), col("key"), col("value"))

      case (Agg.TypeAgg(name, _), i) =>
        // runtime type name → count (processors.go:1111-1124)
        df.select(col(p(i, "t")).as("key")).groupBy("key")
          .agg(count(lit(1)).cast("double").as("value"))
          .select(lit(name).as("name"), col("key"), col("value"))

      case (Agg.CountAgg(name), _) =>
        df.agg(count(lit(1)).cast("double").as("value"))
          .select(lit(name).as("name"), lit("count").as("key"), col("value"))
    }
    val out = parts.reduce(_ unionByName _)
    if (multi) {
      // aggregate() is terminal and its output is small: materialize the
      // fan-out eagerly, then release the shared upstream cache so long-lived
      // sessions don't leak blocks (the reference's per-query temp KV store
      // is likewise dropped at query end).
      val res = out.localCheckpoint(true)
      df.unpersist(false)
      res
    } else out
  }
}
