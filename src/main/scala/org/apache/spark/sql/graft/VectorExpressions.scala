package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native codegen expressions for embedding vectors (SURVEY §4.3 item 1).
  *
  * The semantics are identical to the double-cast higher-order-function
  * form `aggregate(zip_with(a, b, (x,y) -> CAST(x AS DOUBLE) * CAST(y
  * AS DOUBLE)), 0D, (acc,x) -> acc+x)` (which the test suite uses as
  * the oracle — the raw-float `x*y` form rounds each product to float
  * precision and is deliberately not equivalent); this form stays inside
  * whole-stage codegen with a primitive float loop — the "keep the hot
  * decode loop tight" lesson of the reference's windowed DPU writer
  * (`dpu_decompress.c:134-219`), applied to Spark's execution model.
  *
  * Accumulation is in Double, left-to-right, matching both the HOF
  * fallback and DuckDB's list_dot_product evaluation order closely
  * enough that results agree after ROUND(,6) (FIXTURES.md float rule).
  */
case class DotProductF32(left: Expression, right: Expression)
    extends BinaryExpression
    with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "dot_f32"

  // Exactly the HOF's null semantics (zip_with null-pads unequal
  // lengths; x*y and acc+v null-poison): length mismatch or any null
  // element → NULL. Required for RewriteHofDotProduct to be a pure
  // optimization.
  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) { ${ev.isNull} = true; }
         |else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $acc; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Single-pass cosine similarity over two float vectors; null on zero
  * norms. One loop computes dot, |a|², |b|² — one pass over the data
  * instead of the three the compositional form would take.
  */
case class CosineSimF32(left: Expression, right: Expression)
    extends BinaryExpression
    with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "cosine_f32"

  // Same strictness as dot_f32: length mismatch, null element, or a
  // zero-norm side → NULL.
  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != b.numElements()) return null
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = a.getFloat(i).toDouble
      val y = b.getFloat(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    if (na == 0.0 || nb == 0.0) null
    else dot / math.sqrt(na * nb)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) { ${ev.isNull} = true; }
         |else {
         |  double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    double $x = (double) $a.getFloat($i);
         |    double $y = (double) $b.getFloat($i);
         |    $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
         |  }
         |  if (!${ev.isNull}) {
         |    if ($na == 0.0 || $nb == 0.0) { ${ev.isNull} = true; }
         |    else { ${ev.value} = $dot / java.lang.Math.sqrt($na * $nb); }
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** SimHash over pre-hashed token longs: for each of the low `bits` bit
  * positions, emit 1 iff strictly more tokens set it than clear it.
  * 60 bits keeps the result in a non-negative BIGINT in both Spark and
  * the DuckDB oracle (which rebuilds the same value from md5-derived
  * token hashes with pure integer SQL).
  */
case class SimHash64(child: Expression, bits: Int = 60)
    extends UnaryExpression
    with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "simhash64"

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val counts = new Array[Int](bits)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val h = arr.getLong(i)
        var b = 0
        while (b < bits) {
          if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < bits) {
      if (counts(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val b = ctx.freshName("b")
      val h = ctx.freshName("h")
      val counts = ctx.freshName("counts")
      val out = ctx.freshName("out")
      s"""
         |int $n = $a.numElements();
         |int[] $counts = new int[$bits];
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i)) {
         |    long $h = $a.getLong($i);
         |    for (int $b = 0; $b < $bits; $b++) {
         |      if ((($h >>> $b) & 1L) == 1L) $counts[$b]++; else $counts[$b]--;
         |    }
         |  }
         |}
         |long $out = 0L;
         |for (int $b = 0; $b < $bits; $b++) {
         |  if ($counts[$b] > 0) $out |= (1L << $b);
         |}
         |${ev.value} = $out;
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** Single-pass MinHash signature: one traversal of the shingle array
  * updates all `numPerms` running minima — replacing the compositional
  * `array_min(transform(...))` × 32 form, which re-walks the array per
  * permutation with per-element lambda dispatch. Permutation p of a
  * shingle is XXH64(XXH64(bytes, 42), seed = p), matching the seeded
  * re-hash scheme (no modular arithmetic, so ANSI overflow checking
  * can't trip — `reader.cc`-era wrap-around semantics are banned in
  * Spark 4 ANSI mode).
  *
  * Output has no SQL oracle (hash-dependent); q20's verified pair set
  * is the oracle-gated product, and the spec suite pins this expression
  * against the compositional form.
  */
case class MinHashSignature(child: Expression, numPerms: Int = 32)
    extends UnaryExpression
    with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "minhash_sig"

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val mins = Array.fill(numPerms)(Long.MaxValue)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val s = arr.getUTF8String(i)
        val base = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)
        var p = 0
        while (p < numPerms) {
          val h = XXH64.hashLong(base, p.toLong)
          if (h < mins(p)) mins(p) = h
          p += 1
        }
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val xxh = classOf[XXH64].getName
      val utf8 = classOf[org.apache.spark.unsafe.types.UTF8String].getName
      val gad = classOf[org.apache.spark.sql.catalyst.util.GenericArrayData].getName
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val p = ctx.freshName("p")
      val s = ctx.freshName("s")
      val base = ctx.freshName("base")
      val h = ctx.freshName("h")
      val mins = ctx.freshName("mins")
      s"""
         |int $n = $a.numElements();
         |long[] $mins = new long[$numPerms];
         |java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i)) {
         |    $utf8 $s = $a.getUTF8String($i);
         |    long $base = $xxh.hashUnsafeBytes($s.getBaseObject(), $s.getBaseOffset(), $s.numBytes(), 42L);
         |    for (int $p = 0; $p < $numPerms; $p++) {
         |      long $h = $xxh.hashLong($base, (long) $p);
         |      if ($h < $mins[$p]) $mins[$p] = $h;
         |    }
         |  }
         |}
         |${ev.value} = new $gad($mins);
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** Bridge into `private[sql]` surface for code living outside
  * `org.apache.spark.sql` (Column ↔ Expression, as in
  * `org.apache.spark.sql.classic.ExpressionUtils`).
  */
object Shims {
  def toColumn(e: Expression): Column =
    org.apache.spark.sql.classic.ExpressionUtils.column(e)
  def toExpression(c: Column): Expression =
    org.apache.spark.sql.classic.ExpressionUtils.expression(c)

  /** Broadcast the session Hadoop conf for use inside tasks
    * (`SerializableConfiguration` is `private[spark]`).
    */
  def broadcastHadoopConf(spark: org.apache.spark.sql.SparkSession): HadoopConfBroadcast =
    new HadoopConfBroadcast(
      org.apache.spark.util.SerializableConfiguration.broadcast(
        spark.sparkContext, spark.sessionState.newHadoopConf()))
}

/** Serializable handle to a broadcast Hadoop configuration. */
final class HadoopConfBroadcast(
    private val bc: org.apache.spark.broadcast.Broadcast[
      org.apache.spark.util.SerializableConfiguration])
    extends Serializable {
  def conf: org.apache.hadoop.conf.Configuration = bc.value.value
}

/** Fused late-interaction MaxSim score over two 64-dim float vectors
  * viewed as eight 8-dim token slices (q310's scoring rule):
  * score(q, d) = Σ over q's slices of the MAX over d's slices of
  * ROUND(cosine, 6), each rounded cosine carried as an exact
  * DECIMAL(18,6) so the per-token max and the 8-term sum are
  * order-free on the 1e-6 grid.
  *
  * Fusion rationale (optimization round 14, guide §1.2/§2.3): the
  * compositional form — posexplode both sides into 8 token rows each,
  * a 64-row-per-pair join, a (q, d, qi) grouped MAX, a (q, d) grouped
  * SUM — materializes and shuffles 64 rows and two hash-aggregate
  * passes per candidate pair. The score is a pure function of the two
  * vectors, so one codegen-friendly expression computes it in a tight
  * loop per pair; SimilaritySpec pins bit-equality against the
  * compositional form on the real fixture, and the q310/q329/q330/q339
  * oracles replay the full scoring from scratch.
  *
  * Semantics replicated EXACTLY from the compositional pipeline:
  *  - slices are `slice(embedding, m*8+1, 8)` for m = 0..7 on EACH
  *    side's own array (short arrays yield short/empty slices);
  *  - cosine = [[CosineSimF32]]: length mismatch, null element, or a
  *    zero-norm side → NULL (skipped by MAX);
  *  - ROUND(x, 6) = Spark's RoundBase on DoubleType:
  *    BigDecimal.valueOf(x).setScale(6, HALF_UP), NaN/Infinity pass
  *    through and the DECIMAL cast turns them into NULL (skipped);
  *  - a q-slice whose 8 cosines are all NULL contributes nothing
  *    (MAX of all-null is NULL, SUM skips NULL); all-NULL → NULL.
  */
case class MaxSimScoreF32(left: Expression, right: Expression)
    extends BinaryExpression
    with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def dataType: DataType = DecimalType(18, 6)
  override def nullable: Boolean = true
  override def prettyName: String = "maxsim_f32"

  override def nullSafeEval(l: Any, r: Any): Any =
    MaxSimScoreF32.score(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val s = ctx.freshName("msim")
      // one static call per pair keeps the operator inside whole-stage
      // codegen; the loop body is scalar JVM code either way
      s"""
         |org.apache.spark.sql.types.Decimal $s =
         |  org.apache.spark.sql.graft.MaxSimScoreF32.score($a, $b);
         |if ($s == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $s; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object MaxSimScoreF32 {
  private val Slices = 8
  private val SliceLen = 8

  /** The fused scoring loop — static so generated code can call it. */
  def score(qa: ArrayData, da: ArrayData): Decimal = {
    val ql = qa.numElements()
    val dl = da.numElements()
    var sumMicros = 0L
    var anySlice = false
    var qi = 0
    while (qi < Slices) {
      val qs = qi * SliceLen
      val qLen = math.max(0, math.min(SliceLen, ql - qs))
      var best = 0L
      var bestSet = false
      var di = 0
      while (di < Slices) {
        val ds = di * SliceLen
        val dLen = math.max(0, math.min(SliceLen, dl - ds))
        // cosine(slice q, slice d) with CosineSimF32 semantics
        if (qLen == dLen && qLen > 0) {
          var dot = 0.0
          var na = 0.0
          var nb = 0.0
          var i = 0
          var isNull = false
          while (i < qLen && !isNull) {
            if (qa.isNullAt(qs + i) || da.isNullAt(ds + i)) isNull = true
            else {
              val x = qa.getFloat(qs + i).toDouble
              val y = da.getFloat(ds + i).toDouble
              dot += x * y; na += x * x; nb += y * y
              i += 1
            }
          }
          if (!isNull && na != 0.0 && nb != 0.0) {
            val c = dot / math.sqrt(na * nb)
            // ROUND(c, 6): NaN/Infinity would null out in the DECIMAL
            // cast of the compositional form — skip them here
            if (!java.lang.Double.isNaN(c) && !java.lang.Double.isInfinite(c)) {
              val m = java.math.BigDecimal.valueOf(c)
                .setScale(6, java.math.RoundingMode.HALF_UP)
                .unscaledValue().longValueExact()
              if (!bestSet || m > best) { best = m; bestSet = true }
            }
          }
        }
        di += 1
      }
      if (bestSet) { sumMicros += best; anySlice = true }
      qi += 1
    }
    if (anySlice) Decimal(sumMicros, 18, 6) else null
  }
}
