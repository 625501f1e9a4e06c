package graft.compiler

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.gripql.Agg
import graft.functions.GJson

/** Terminal aggregate([...]) — N named aggregations over the same traveler
  * stream (reference: engine/core/processors.go:948-1134). Result rows are
  * (name STRING, key STRING, value DOUBLE), the flattened form of the
  * reference's NamedAggregationResult (gripql/gripql.proto:122-126).
  *
  * The input is computed once and cached for the fan-out; each aggregation
  * is a groupBy whose partial (map-side) aggregation Spark handles natively;
  * the reference's disk-spilling KV variant (processors_extra.go) collapses
  * into Spark's spillable hash aggregate.
  */
object Aggregations {
  /** "25" for 25.0, "99.9" for 99.9 — percent keys render like the JSON numbers. */
  private def fmtNum(d: Double): String =
    if (d == d.floor && math.abs(d) < 1e15) d.toLong.toString else d.toString

  def run(df0: DataFrame, aggs: Seq[Agg]): DataFrame = {
    val multi = aggs.size > 1
    val df = if (multi) df0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK) else df0
    val parts = aggs.map {
      case Agg.Term(name, field, size) =>
        // value → frequency, top-`size`; container-valued (array/map) fields
        // are skipped (reference: processors.go:980-1019, 1001-1003).
        // Typing via native variant expressions, not a UDF.
        val (ns, pathParts) = FieldRef.parse(field)
        val isDataField = pathParts.headOption.exists(p => p.nonEmpty && !p.startsWith("_"))
        val typed = df.select(FieldRef.resolve(field).as("key"),
          (if (isDataField)
             schema_of_variant(try_variant_get(try_parse_json(FieldRef.elem(ns).getField("data")),
               "$." + pathParts.mkString("."), "variant"))
           else lit("STRING")).as("__t"))
        val keyed = typed
          .filter(col("key").isNotNull &&
            !col("__t").startsWith("ARRAY") && !col("__t").startsWith("OBJECT"))
          .groupBy("key").agg(count(lit(1)).cast("double").as("value"))
        val sized = if (size > 0) keyed.orderBy(col("value").desc, col("key")).limit(size) else keyed
        sized.select(lit(name).as("name"), col("key"), col("value"))

      case Agg.Histogram(name, field, interval) =>
        // dense buckets min→max including zeros (reference: processors.go:1021-1065)
        val x = FieldRef.resolve(field).try_cast("double")
        val bucketed = df.select((floor(x / interval) * interval).as("bucket"))
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

      case Agg.Percentile(name, field, percents, exact) =>
        // default: t-digest approximate quantiles; conformance tolerance
        // ±15% (reference: processors.go:1067-1091, ot_aggregations.py:108-116).
        // exact: positional linear interpolation over the sorted values —
        // same definition as DuckDB quantile_cont / the Mongo backend.
        val x = FieldRef.resolve(field).try_cast("double")
        val vals = df.select(x.as("x")).filter(col("x").isNotNull)
        val aggCols = percents.zipWithIndex.map { case (p, i) =>
          (if (exact) percentile(col("x"), lit(p / 100.0))
           else percentile_approx(col("x"), lit(p / 100.0), lit(10000))).as(s"q$i") }
        val one = vals.agg(aggCols.head, aggCols.tail: _*)
        percents.zipWithIndex.map { case (p, i) =>
          one.select(lit(name).as("name"),
            lit(fmtNum(p)).as("key"), col(s"q$i").as("value"))
        }.reduce(_ unionByName _)

      case Agg.FieldAgg(name, field) =>
        // map-valued field: key → #docs containing key (processors.go:1093-1109)
        val raw = FieldRef.resolve(field)
        df.select(explode(json_object_keys(raw)).as("key"))
          .groupBy("key").agg(count(lit(1)).cast("double").as("value"))
          .select(lit(name).as("name"), col("key"), col("value"))

      case Agg.TypeAgg(name, field) =>
        // runtime type name → count (processors.go:1111-1124)
        val (ns, parts) = FieldRef.parse(field)
        val e = FieldRef.elem(ns)
        val t = GJson.json_type(e.getField("data"), lit(parts.mkString(".")))
        df.select(t.as("key")).groupBy("key").agg(count(lit(1)).cast("double").as("value"))
          .select(lit(name).as("name"), col("key"), col("value"))

      case Agg.CountAgg(name) =>
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
