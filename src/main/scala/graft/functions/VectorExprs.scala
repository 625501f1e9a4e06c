package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Dot product of two float/double array columns as a native Catalyst
  * expression with loop codegen.
  *
  * Why not `aggregate(zip_with(a, b, _ * _))`: higher-order functions
  * evaluate interpreted, one lambda dispatch per element (~25x slower over
  * the 12.5M-pair sf0.1 near-dup verify). Why not an unrolled
  * `element_at` sum: a 64-dim unroll inside a join condition compiles to
  * a single >8 KB-bytecode method that HotSpot refuses to JIT
  * (-XX:DontCompileHugeMethods), so it runs in the bytecode interpreter
  * at ~20 µs/pair. A loop over `ArrayData` is a ~40-byte method body that
  * JITs immediately — measured ~100x faster per pair than either.
  *
  * Semantics match the higher-order fold the pipeline ops originally
  * used: null input → null, length mismatch (zip_with's null padding) →
  * null, any null element → null, else Σ (double)aᵢ·(double)bᵢ
  * accumulated left-to-right (deterministic, and bit-identical to the
  * DuckDB oracle's sequential list fold over double[]).
  */
case class DotProduct(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  private def elemType(e: Expression): Option[DataType] = e.dataType match {
    case ArrayType(FloatType, _)  => Some(FloatType)
    case ArrayType(DoubleType, _) => Some(DoubleType)
    case _                        => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemType(left).isDefined && elemType(right).isDefined) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_dot expects array<float>/array<double> inputs, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")

  private def get(a: ArrayData, t: DataType, i: Int): Double =
    if (t == FloatType) a.getFloat(i).toDouble else a.getDouble(i)

  override def nullSafeEval(l: Any, r: Any): Any = {
    val (a, b) = (l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])
    val n = a.numElements()
    if (b.numElements() != n) return null
    val (ta, tb) = (elemType(left).get, elemType(right).get)
    var s = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      s += get(a, ta, i) * get(b, tb, i)
      i += 1
    }
    s
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    def getter(t: DataType) = if (t == FloatType) "getFloat" else "getDouble"
    val (ga, gb) = (getter(elemType(left).get), getter(elemType(right).get))
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val (n, i, s) = (ctx.freshName("n"), ctx.freshName("i"), ctx.freshName("s"))
      s"""
         |int $n = $a.numElements();
         |if ($b.numElements() != $n) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $s += (double) $a.$ga($i) * (double) $b.$gb($i);
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $s;
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_dot"
}

/** Count of common elements between two SORTED ascending long arrays, as a
  * native codegen merge scan. The near-dup verify joins intersect a hashed
  * shingle set per candidate pair; `array_intersect` allocates and fills a
  * hash set per CALL (per pair — millions of times under a wide-radius
  * candidate ball), while a merge over two sorted ArrayData is
  * allocation-free and ~na+nb long comparisons. Inputs are produced once
  * per DOCUMENT (array_distinct + sort_array), so the per-pair hot path
  * does only the scan.
  *
  * Semantics: null input → null; null elements are skipped (none exist in
  * the shingle pipeline, which hashes non-null strings); duplicate
  * elements (possible only via 64-bit hash collision) count once on the
  * probe side per match, matching size(array_intersect) on the
  * already-distinct inputs the pipeline feeds it. */
case class SortedIntersectCount(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true

  private def ok(e: Expression): Boolean = e.dataType match {
    case ArrayType(LongType, _) => true
    case _                      => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (ok(left) && ok(right)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_sorted_intersect expects array<bigint> inputs, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")

  override def nullSafeEval(l: Any, r: Any): Any = {
    val (a, b) = (l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])
    val (na, nb) = (a.numElements(), b.numElements())
    var i = 0; var j = 0; var c = 0
    while (i < na && j < nb) {
      if (a.isNullAt(i)) i += 1
      else if (b.isNullAt(j)) j += 1
      else {
        val x = a.getLong(i); val y = b.getLong(j)
        if (x < y) i += 1 else if (x > y) j += 1 else { c += 1; i += 1; j += 1 }
      }
    }
    c
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val na = ctx.freshName("na"); val nb = ctx.freshName("nb")
      val i = ctx.freshName("i"); val j = ctx.freshName("j"); val c = ctx.freshName("c")
      val x = ctx.freshName("x"); val y = ctx.freshName("y")
      s"""
         |int $na = $a.numElements(); int $nb = $b.numElements();
         |int $i = 0; int $j = 0; int $c = 0;
         |while ($i < $na && $j < $nb) {
         |  if ($a.isNullAt($i)) { $i++; }
         |  else if ($b.isNullAt($j)) { $j++; }
         |  else {
         |    long $x = $a.getLong($i); long $y = $b.getLong($j);
         |    if ($x < $y) { $i++; } else if ($x > $y) { $j++; }
         |    else { $c++; $i++; $j++; }
         |  }
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_sorted_intersect"
}

/** xxhash64 of every element of a string array, as one native loop — the
  * per-document "hash the shingle set" step of the near-dup verifies.
  * `transform(arr, s => xxhash64(s))` runs the lambda interpreted per
  * element (HOFs get no codegen): ~7M dispatches per 50k-doc corpus,
  * measured seconds per pass. This loop hashes UTF8String bytes directly.
  *
  * Null array → null; null elements hash like xxhash64(null) does NOT —
  * they are skipped by emitting the seed (42), matching what the verify
  * pipeline feeds it (shingle arrays never carry nulls). */
case class HashArray(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_hash_array expects array<string>, got ${t.simpleString}")
  }

  private def hashOne(a: ArrayData, i: Int): Long =
    if (a.isNullAt(i)) 42L
    else {
      val s = a.getUTF8String(i)
      org.apache.spark.sql.catalyst.expressions.XxHash64Function.hash(
        s, StringType, 42L)
    }

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val n = a.numElements()
    val out = new Array[Long](n)
    var i = 0
    while (i < n) { out(i) = hashOne(a, i); i += 1 }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(out)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i"); val out = ctx.freshName("out")
      // XXH64.hashUTF8String is the public static XxHash64Function.hash
      // delegates to for strings; a MODULE$ path through the Scala object
      // is unresolvable from Janino (silent interpreted fallback).
      val xx = "org.apache.spark.sql.catalyst.expressions.XXH64"
      s"""
         |int $n = $a.numElements();
         |long[] $out = new long[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  $out[$i] = $a.isNullAt($i) ? 42L
         |    : $xx.hashUTF8String($a.getUTF8String($i), 42L);
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "graft_hash_array"
}

/** Distinct word n-gram shingles from a pre-split token array, as one
  * native pass — the corpus-scan hot path of every text near-dup op.
  * The Column-expression form (`transform(sequence(...), i =>
  * concat_ws(slice(...)))` + `array_distinct`) runs its lambdas
  * interpreted per shingle; this loop builds each shingle with one
  * UTF8String.concatWs and dedups in insertion order via LinkedHashSet,
  * matching array_distinct's first-occurrence semantics exactly.
  *
  * Fallback parity with Dedup.shingles: fewer than n tokens → one
  * shingle = all tokens joined (split-on-space is lossless, so this IS
  * the normalized text). Null array → null; null tokens (never produced
  * by split) join as empty. */
case class ShingleArray(child: Expression, n: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  require(n >= 1, s"shingle width must be >= 1, got $n")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_shingles expects array<string>, got ${t.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    ShingleArray.build(input.asInstanceOf[ArrayData], n)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      // addReferenceObj, not a MODULE$ path: the companion's MODULE$ field
      // lives on class `ShingleArray$`, which Janino can't resolve through
      // the case-class name (falls back to interpreted silently).
      val b = ctx.addReferenceObj("shingleBuilder", ShingleArray, ShingleArray.getClass.getName)
      s"${ev.value} = $b.build($a, $n);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "graft_shingles"
}

object ShingleArray {
  private val SP = org.apache.spark.unsafe.types.UTF8String.fromString(" ")
  private val EMPTY = org.apache.spark.unsafe.types.UTF8String.fromString("")

  /** Shared by eval and codegen: one allocation-light pass. */
  def build(a: ArrayData, n: Int): ArrayData = {
    import org.apache.spark.unsafe.types.UTF8String
    val len = a.numElements()
    def tok(i: Int): UTF8String = if (a.isNullAt(i)) EMPTY else a.getUTF8String(i)
    val out = new java.util.LinkedHashSet[UTF8String]()
    if (len < n) {
      val all = new Array[UTF8String](len)
      var i = 0
      while (i < len) { all(i) = tok(i); i += 1 }
      out.add(UTF8String.concatWs(SP, all: _*))
    } else {
      val w = new Array[UTF8String](n)
      var i = 0
      while (i <= len - n) {
        var j = 0
        while (j < n) { w(j) = tok(i + j); j += 1 }
        out.add(UTF8String.concatWs(SP, w: _*))
        i += 1
      }
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
      out.toArray(new Array[UTF8String](out.size())))
  }
}

/** Rolling length hash over a token array — the document fingerprint's
  * fold h = (h·31 + numChars(token)) mod 1e9+7 seeded with 7, as one
  * native loop. The `aggregate(transform(...))` HOF form it replaces runs
  * two interpreted lambda dispatches per word. Order-sensitive by
  * construction. Null array → null; a null element poisons the fold to
  * null (parity with the HOF form, where `acc + null` is null) — split()
  * never produces one. numChars matches the builtin `length()` on
  * strings, so the DuckDB oracle's character-length fold is unchanged. */
case class RollingLengthHash(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_rolling_len_hash expects array<string>, got ${t.simpleString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val len = a.numElements()
    var h = 7L
    var i = 0
    while (i < len) {
      if (a.isNullAt(i)) return null
      h = (h * 31L + a.getUTF8String(i).numChars()) % 1000000007L
      i += 1
    }
    h
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i"); val h = ctx.freshName("h")
      s"""
         |int $n = $a.numElements();
         |long $h = 7L;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  $h = ($h * 31L + $a.getUTF8String($i).numChars()) % 1000000007L;
         |}
         |if (!${ev.isNull}) ${ev.value} = $h;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "graft_rolling_len_hash"
}

/** Reconstruct a 64-bit SimHash fingerprint from 16 lane-packed majority
  * counters (4 × 16-bit lanes per long; pack j lane l = count of hash bit
  * l*16+j) and the token count: bit p of the result is set iff its counter
  * strictly exceeds n/2.
  *
  * Why an expression: the equivalent Column tree is 64 ×
  * (shift + mask + compare + when) folded by adds — ~500 Catalyst nodes
  * whose whole-stage source costs seconds of Janino compile time on first
  * run (measured 3.3 s of p03's first-run 7.6 s). This loop is a ~30-line
  * method body that compiles instantly and JITs immediately. */
case class PackedMajority(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(LongType, _), LongType) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"graft_packed_majority expects (array<bigint>, bigint), got ${l.simpleString} and ${r.simpleString}")
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]; val n = r.asInstanceOf[Long]
    if (a.numElements() != 16) return null
    var sim = 0L
    var p = 0
    while (p < 64) {
      val cnt = (a.getLong(p & 15) >>> ((p >> 4) << 4)) & 0xFFFFL
      if (cnt * 2 > n) sim |= 1L << p
      p += 1
    }
    sim
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, n) => {
      val p = ctx.freshName("p"); val cnt = ctx.freshName("cnt"); val sim = ctx.freshName("sim")
      s"""
         |if ($a.numElements() != 16) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $sim = 0L;
         |  for (int $p = 0; $p < 64; $p++) {
         |    long $cnt = ($a.getLong($p & 15) >>> (($p >> 4) << 4)) & 0xFFFFL;
         |    if ($cnt * 2 > $n) $sim |= 1L << $p;
         |  }
         |  ${ev.value} = $sim;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_packed_majority"
}

/** Bloom-filter membership probe of a 64-bit shingle hash against a packed
  * bitmap — Kirsch–Mitzenmacher double hashing: probe i tests bit
  * (h1 + i·h2) mod m with h1 = low 32 bits, h2 = high 32 bits | 1 (the
  * 32-bit split keeps h1 + i·h2 far below Long overflow for any k ≤ 64,
  * so the arithmetic is ANSI-safe).
  *
  * Why an expression: the bitmap rides to executors inside the
  * stage-broadcast task binary as a codegen reference object — NOT as a
  * up-to-16M-element `typedlit` Literal that every optimizer pass
  * re-traverses and every plan string renders — and the k probes compile
  * to one tight loop instead of k chained SQL bit tests. */
case class BloomContains(child: Expression, words: Array[Long], m: Long, k: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_bloom_contains expects bigint, got ${t.simpleString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val h = input.asInstanceOf[Long]
    val h1 = h & 0xffffffffL
    val h2 = (h >>> 32) | 1L
    var i = 0
    while (i < k) {
      val p = (h1 + i * h2) % m
      if (((words((p / 64).toInt) >>> (p % 64).toInt) & 1L) == 0L) return false
      i += 1
    }
    true
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val w = ctx.addReferenceObj("bloomWords", words, "long[]")
    nullSafeCodeGen(ctx, ev, h => {
      val h1 = ctx.freshName("h1"); val h2 = ctx.freshName("h2")
      val i = ctx.freshName("i"); val p = ctx.freshName("p")
      val hit = ctx.freshName("hit")
      s"""
         |long $h1 = $h & 0xffffffffL;
         |long $h2 = ($h >>> 32) | 1L;
         |boolean $hit = true;
         |for (int $i = 0; $i < $k; $i++) {
         |  long $p = ($h1 + $i * $h2) % ${m}L;
         |  if ((($w[(int)($p / 64)] >>> (int)($p % 64)) & 1L) == 0L) { $hit = false; break; }
         |}
         |${ev.value} = $hit;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "graft_bloom_contains"
}

object VectorExprs {
  /** `graft_dot(a, b)` as a Column — the fast path for every dot/cosine
    * in [[graft.pipeline.Similarity]]. */
  def dotProduct(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graft.shims
    shims.column(DotProduct(shims.expression(a), shims.expression(b)))
  }

  /** `graft_bloom_contains(h)` as a Column — k-probe Bloom membership of a
    * 64-bit hash, the join-free decontamination filter. */
  def bloomContains(h: Column, words: Array[Long], m: Long, k: Int): Column = {
    import org.apache.spark.sql.graft.shims
    shims.column(BloomContains(shims.expression(h), words, m, k))
  }

  /** `graft_sorted_intersect(a, b)` as a Column — the per-pair hot path of
    * the near-dup Jaccard verify. */
  def sortedIntersectCount(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graft.shims
    shims.column(SortedIntersectCount(shims.expression(a), shims.expression(b)))
  }

  /** `graft_packed_majority(packs, n)` as a Column — SimHash fingerprint
    * reconstruction from the packed majority counters. */
  def packedMajority(packs: Column, n: Column): Column = {
    import org.apache.spark.sql.graft.shims
    shims.column(PackedMajority(shims.expression(packs), shims.expression(n)))
  }

  /** `graft_hash_array(arr)` as a Column — xxhash64 per element of a
    * string array (same seed as the xxhash64() column function). */
  def hashArray(arr: Column): Column = {
    import org.apache.spark.sql.graft.shims
    shims.column(HashArray(shims.expression(arr)))
  }

  /** `graft_shingles(tokens, n)` as a Column — distinct word n-grams from
    * a pre-split token array, first-occurrence order. */
  def shingleArray(tokens: Column, n: Int): Column = {
    import org.apache.spark.sql.graft.shims
    shims.column(ShingleArray(shims.expression(tokens), n))
  }

  /** `graft_rolling_len_hash(tokens)` as a Column — the fingerprint fold
    * h = (h·31 + length) mod 1e9+7 over token lengths. */
  def rollingLengthHash(tokens: Column): Column = {
    import org.apache.spark.sql.graft.shims
    shims.column(RollingLengthHash(shims.expression(tokens)))
  }
}
