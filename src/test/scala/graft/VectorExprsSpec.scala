package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.VectorExprs.dotProduct

/** The native DotProduct expression: codegen and interpreted paths must
  * agree, and both must match the higher-order fold it replaced (null
  * semantics included — zip_with pads ragged arrays with null, so length
  * mismatch and null elements both yield null). */
class VectorExprsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  private def hofDot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0d), (acc, x) => acc + x)

  lazy val vecs: DataFrame = Seq(
    (1L, Seq(1.0f, 2.0f, 3.0f), Seq(4.0f, 5.0f, 6.0f)),
    (2L, Seq(0.5f, -1.5f, 2.25f), Seq(-2.0f, 0.0f, 8.0f)),
    (3L, Seq(0.1f, 0.2f, 0.3f), Seq(0.4f, 0.5f, 0.6f))
  ).toDF("id", "a", "b")

  test("float dot matches the double fold bit-for-bit") {
    val rows = vecs.select(
      dotProduct(col("a"), col("b")).as("fast"),
      hofDot(transform(col("a"), _.cast("double")), transform(col("b"), _.cast("double"))).as("ref")
    ).as[(Double, Double)].collect()
    rows.foreach { case (fast, ref) => assert(fast == ref) }
  }

  test("double arrays accepted; mixed float/double accepted") {
    val d = vecs.select(
      dotProduct(transform(col("a"), _.cast("double")), transform(col("b"), _.cast("double"))).as("dd"),
      dotProduct(col("a"), transform(col("b"), _.cast("double"))).as("fd"))
      .as[(Double, Double)].head()
    assert(d._1 == 32.0 && d._2 == 32.0)
  }

  test("null array, ragged lengths, and null elements all yield null") {
    val df = Seq(
      (Some(Seq(Some(1.0f), Some(2.0f))), Some(Seq(Some(1.0f)))),            // ragged
      (Some(Seq(Some(1.0f), None)), Some(Seq(Some(1.0f), Some(2.0f)))),      // null elem
      (None: Option[Seq[Option[Float]]], Some(Seq(Some(1.0f), Some(2.0f)))) // null array
    ).toDF("a", "b")
    val out = df.select(dotProduct(col("a"), col("b"))).collect()
    assert(out.forall(_.isNullAt(0)))
  }

  test("interpreted eval agrees with codegen") {
    val e = graft.functions.DotProduct(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Array(1.0f, 2.0f, 3.0f), org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType)),
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Array(4.0f, 5.0f, 6.0f), org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType)))
    assert(e.eval(null) == 32.0)
  }

  test("graft_dot is callable from SQL via the session extensions") {
    vecs.createOrReplaceTempView("__vecs")
    val r = spark.sql("SELECT graft_dot(a, b) AS d FROM __vecs WHERE id = 1").as[Double].head()
    assert(r == 32.0)
  }

  test("rejects non-numeric-array inputs at analysis") {
    val bad = Seq((1, "x")).toDF("i", "s")
    val err = intercept[Exception] {
      bad.select(dotProduct(col("s"), col("s"))).collect()
    }
    assert(err.getMessage.toLowerCase.contains("graft_dot") ||
      err.getMessage.toLowerCase.contains("datatype_mismatch") ||
      err.getMessage.toLowerCase.contains("cannot resolve"))
  }

  test("sorted intersect count matches size(array_intersect) on random sets") {
    import graft.functions.VectorExprs.sortedIntersectCount
    // deterministic pseudo-random distinct-long sets of varied size/overlap
    val sets = spark.range(200).select(col("id"),
      sort_array(array_distinct(transform(
        sequence(lit(0L), pmod(xxhash64(col("id")), lit(40L))),
        i => pmod(xxhash64(col("id") * 7 + i), lit(60L))))).as("s"))
    val l = sets.select(col("id").as("la"), col("s").as("a"))
    val r = sets.select(col("id").as("lb"), col("s").as("b"))
    val both = l.crossJoin(r).select(
      sortedIntersectCount(col("a"), col("b")).as("fast"),
      size(array_intersect(col("a"), col("b"))).as("ref"))
    assert(both.filter(col("fast") =!= col("ref")).count() == 0)
    assert(both.filter(col("fast") > 0).count() > 0)
  }

  test("sorted intersect: null input null, empty array zero, SQL callable") {
    val df = Seq(
      (Some(Seq(1L, 2L, 3L)), Some(Seq(2L, 3L, 9L))),
      (Some(Seq[Long]()), Some(Seq(1L, 2L))),
      (None: Option[Seq[Long]], Some(Seq(1L)))
    ).toDF("a", "b")
    val out = df.select(graft.functions.VectorExprs
      .sortedIntersectCount(col("a"), col("b")).as("c")).collect()
    assert(out(0).getInt(0) == 2 && out(1).getInt(0) == 0 && out(2).isNullAt(0))
    df.createOrReplaceTempView("__sic")
    assert(spark.sql("SELECT graft_sorted_intersect(a, b) FROM __sic").collect().head.getInt(0) == 2)
  }

  /** The HOF form ShingleArray replaced — kept here as the reference model. */
  private def hofShingles(text: org.apache.spark.sql.Column, n: Int) =
    element_at(transform(array(split(lower(trim(text)), " ")), w =>
      when(size(w) >= n,
        array_distinct(transform(sequence(lit(0), size(w) - n),
          i => concat_ws(" ", slice(w, i + 1, lit(n))))))
        .otherwise(array(lower(trim(text))))), 1)

  test("shingles: native expression matches the HOF form on random texts") {
    // pseudo-random word sequences of varied length (0..24 words) with a
    // small vocabulary so duplicate shingles occur and dedup order matters
    val texts = spark.range(300).select(col("id"),
      concat_ws(" ", transform(
        sequence(lit(0L), pmod(xxhash64(col("id")), lit(25L))),
        i => concat(lit("w"), pmod(xxhash64(col("id") * 13 + i), lit(7L))))).as("t"))
    for (n <- Seq(1, 3, 5)) {
      val cmp = texts.select(
        graft.pipeline.Dedup.shingles(col("t"), n).as("fast"),
        hofShingles(col("t"), n).as("ref"))
      assert(cmp.filter(not(col("fast") === col("ref"))).count() == 0, s"n=$n")
    }
  }

  test("shingles: fewer than n words collapses to the normalized text; null is null") {
    val df = Seq(Some("  Two WORDS  "), Some(""), None).toDF("t")
    val out = df.select(graft.pipeline.Dedup.shingles(col("t"), 3).as("s")).collect()
    assert(out(0).getSeq[String](0) == Seq("two words"))
    assert(out(1).getSeq[String](0) == Seq(""))
    assert(out(2).isNullAt(0))
  }

  test("rolling length hash matches the HOF fold; null element poisons to null") {
    val arrs = spark.range(150).select(
      transform(sequence(lit(0L), pmod(xxhash64(col("id")), lit(15L))),
        i => concat(lit("w"), xxhash64(col("id") * 17 + i) % 1000)).as("a"))
    val cmp = arrs.select(
      graft.functions.VectorExprs.rollingLengthHash(col("a")).as("fast"),
      aggregate(transform(col("a"), w => length(w).cast("long")),
        lit(7L), (acc, x) => pmod(acc * 31 + x, lit(1000000007L))).as("ref"))
    assert(cmp.filter(not(col("fast") === col("ref"))).count() == 0)
    val edge = Seq(
      (Some(Seq(Some("ab"), None)), 1),
      (None: Option[Seq[Option[String]]], 2),
      (Some(Seq[Option[String]]()), 3)
    ).toDF("a", "i")
    val out = edge.orderBy("i")
      .select(graft.functions.VectorExprs.rollingLengthHash(col("a"))).collect()
    assert(out(0).isNullAt(0) && out(1).isNullAt(0) && out(2).getLong(0) == 7L)
  }

  test("hash array matches per-element xxhash64 builtin") {
    val arrs = spark.range(200).select(
      transform(sequence(lit(0L), pmod(xxhash64(col("id")), lit(12L))),
        i => concat(lit("s"), xxhash64(col("id") * 31 + i))).as("a"))
    val cmp = arrs.select(
      graft.functions.VectorExprs.hashArray(col("a")).as("fast"),
      transform(col("a"), s => xxhash64(s)).as("ref"))
    assert(cmp.filter(not(col("fast") === col("ref"))).count() == 0)
  }

  test("every native expression force-compiles (no silent interpreted fallback)") {
    // Predicate/Projection factories swallow CompileException and fall back
    // to interpreted eval with only a log line — results stay correct, the
    // perf win silently vanishes. Generating the projection directly throws.
    import org.apache.spark.sql.catalyst.expressions.{BoundReference, Literal}
    import org.apache.spark.sql.catalyst.expressions.codegen.GenerateUnsafeProjection
    import org.apache.spark.sql.types._
    val strArr = BoundReference(0, ArrayType(StringType), nullable = true)
    val fltArr = BoundReference(1, ArrayType(FloatType), nullable = true)
    val lngArr = BoundReference(2, ArrayType(LongType), nullable = true)
    val exprs = Seq(
      graft.functions.ShingleArray(strArr, 3),
      graft.functions.HashArray(strArr),
      graft.functions.DotProduct(fltArr, fltArr),
      graft.functions.SortedIntersectCount(lngArr, lngArr),
      graft.functions.PackedMajority(lngArr, Literal(5L)),
      graft.functions.RollingLengthHash(strArr),
      graft.functions.BloomContains(BoundReference(3, LongType, nullable = true),
        Array(0x5L, 0x1L), 128L, 3))
    exprs.foreach { e =>
      GenerateUnsafeProjection.generate(Seq(e.asInstanceOf[
        org.apache.spark.sql.catalyst.expressions.Expression])) // throws on codegen failure
    }
  }

  test("graft_shingles and graft_hash_array are callable from SQL") {
    val r = spark.sql(
      "SELECT graft_hash_array(graft_shingles(split('a b c d', ' '), 2)) AS h")
      .collect().head.getSeq[Long](0)
    assert(r.length == 3) // "a b", "b c", "c d"
    val err = intercept[Exception] {
      spark.sql("SELECT graft_shingles(split('a b', ' '), 1 + 1)").collect()
    }
    assert(err.getMessage.contains("integer literal") ||
      err.getMessage.toLowerCase.contains("foldable"))
  }

  test("bloom contains: one-sided error — inserted hashes always probe true") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    // build a tiny bitmap by hand with the same double-hash schedule
    val m = 256L; val k = 5
    val words = new Array[Long]((m / 64 + 1).toInt)
    val inserted = Seq(0L, -1L, 42L, Long.MinValue, 0xdeadbeefL, 7L << 40)
    inserted.foreach { h =>
      val h1 = h & 0xffffffffL; val h2 = (h >>> 32) | 1L
      (0 until k).foreach { i =>
        val p = (h1 + i * h2) % m
        words((p / 64).toInt) |= 1L << (p % 64).toInt
      }
    }
    inserted.foreach { h =>
      assert(graft.functions.BloomContains(Literal(h), words, m, k)
        .eval(null) == true, s"false negative for $h")
    }
    // absent hashes: mostly false at this load factor (not guaranteed per
    // hash — assert at least one rejects so the probe isn't vacuously true)
    val absent = (100L until 140L).map(h =>
      graft.functions.BloomContains(Literal(h), words, m, k).eval(null) == false)
    assert(absent.count(identity) > 0)
  }

  test("shingles: interpreted eval agrees with codegen result") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{ArrayType, StringType}
    val toks = Literal.create(Array("a", "b", "a", "b", "c"), ArrayType(StringType))
    val e = graft.functions.ShingleArray(toks, 2)
    val interp = e.eval(null).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val got = (0 until interp.numElements()).map(interp.getUTF8String(_).toString)
    assert(got == Seq("a b", "b a", "b c")) // distinct, first-occurrence order
  }
}
