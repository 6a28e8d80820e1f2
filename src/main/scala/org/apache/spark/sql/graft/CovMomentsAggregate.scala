package org.apache.spark.sql.graft

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Accumulator for the q206 covariance sufficient statistics: per-dim
  * counts and 1e7-scaled-long sums, plus the upper-triangle (incl.
  * diagonal) 1e7-scaled-long product sums — all exact integer sums, so
  * partial/final merge is elementwise addition and the result is
  * independent of row order and partitioning by construction.
  *
  * Grows to the longest row seen (rows shorter than the current `d`
  * accumulate into the SAME leading flat-triangle positions the
  * compositional `transform`+`posexplode` form used — within-row
  * positional semantics preserved exactly).
  */
final class CovMomentsBuffer {
  var d: Int = 0
  var n: Array[Long] = Array.emptyLongArray
  var sx: Array[Long] = Array.emptyLongArray
  var sxy: Array[Long] = Array.emptyLongArray

  def grow(nd: Int): Unit = if (nd > d) {
    n = java.util.Arrays.copyOf(n, nd)
    sx = java.util.Arrays.copyOf(sx, nd)
    sxy = java.util.Arrays.copyOf(sxy, nd * (nd + 1) / 2)
    d = nd
  }

  def mergeFrom(o: CovMomentsBuffer): Unit = {
    grow(o.d)
    var i = 0
    while (i < o.d) { n(i) += o.n(i); sx(i) += o.sx(i); i += 1 }
    var p = 0
    val op = o.d * (o.d + 1) / 2
    while (p < op) { sxy(p) += o.sxy(p); p += 1 }
  }
}

/** `cov_moments(array<float>)` → struct(n array<long>, sx array<long>,
  * sxy array<long>): one-pass exact sufficient statistics for the
  * embedding-dimension covariance (q206/q228/q236).
  *
  * Replaces the compositional per-row product frame (a nested
  * `transform` producing d(d+1)/2 longs per row + `posexplode` into
  * n·d²/2 rows + a 2k-key hash aggregate) with an in-place long-array
  * accumulation: the generator and both aggregate passes disappear,
  * the shuffle carries one ~2k-long buffer per map task, and every
  * per-product value is the IDENTICAL Spark ROUND-on-double grid
  * (BigDecimal.valueOf(x·y·1e7).setScale(0, HALF_UP), the exact
  * arithmetic the oracle replays). CovarianceSpec pins equality of the
  * emitted statistics against the compositional form on the fixture.
  *
  * Positional semantics match the old flat-triangle frame: row products
  * enumerate i ≤ j within the ROW's own length; null elements
  * contribute to neither sx nor sxy but DO count in n (posexplode
  * emitted the null row; `count(lit(1))` counted it).
  */
case class CovMoments(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[CovMomentsBuffer]
    with UnaryLike[Expression] {

  private val S = 1e7

  override def dataType: DataType = StructType(Seq(
    StructField("n", ArrayType(LongType, containsNull = false)),
    StructField("sx", ArrayType(LongType, containsNull = false)),
    StructField("sxy", ArrayType(LongType, containsNull = false))))
  override def nullable: Boolean = false
  override def prettyName: String = "cov_moments"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"cov_moments expects array<float>, got ${other.simpleString}")
    }

  override def createAggregationBuffer(): CovMomentsBuffer = new CovMomentsBuffer

  /** ROUND(v, 0) on double, Spark RoundBase semantics, then the long
    * cast the compositional form applied (integral value — exact).
    * NaN/Infinity short-circuit BEFORE BigDecimal.valueOf (which throws
    * on them): the replaced round(x,0).cast(long) pipeline passed them
    * through — round leaves NaN/Inf as-is and the double→long cast
    * yields 0 / Long.MaxValue / Long.MinValue (Java conversion rules) —
    * so a non-finite float in an embedding must reproduce the old
    * statistics, not crash the query (r14 ADVICE item 1).
    */
  private def roundToLong(v: Double): Long =
    if (java.lang.Double.isNaN(v)) 0L
    else if (java.lang.Double.isInfinite(v))
      (if (v > 0) Long.MaxValue else Long.MinValue)
    else java.math.BigDecimal.valueOf(v)
      .setScale(0, java.math.RoundingMode.HALF_UP).doubleValue().toLong

  override def update(buf: CovMomentsBuffer, row: InternalRow): CovMomentsBuffer = {
    val v = child.eval(row)
    if (v == null) return buf
    val arr = v.asInstanceOf[ArrayData]
    val len = arr.numElements()
    if (len == 0) return buf
    buf.grow(len)
    // pre-read the row once (isNullAt + getFloat per element)
    val xs = new Array[Double](len)
    val nulls = new Array[Boolean](len)
    var i = 0
    while (i < len) {
      if (arr.isNullAt(i)) nulls(i) = true
      else xs(i) = arr.getFloat(i).toDouble
      i += 1
    }
    i = 0
    var p = 0
    while (i < len) {
      buf.n(i) += 1
      if (!nulls(i)) buf.sx(i) += roundToLong(xs(i) * S)
      var j = i
      while (j < len) {
        if (!nulls(i) && !nulls(j)) buf.sxy(p) += roundToLong(xs(i) * xs(j) * S)
        p += 1
        j += 1
      }
      i += 1
    }
    buf
  }

  override def merge(a: CovMomentsBuffer, b: CovMomentsBuffer): CovMomentsBuffer = {
    a.mergeFrom(b); a
  }

  override def eval(buf: CovMomentsBuffer): Any =
    InternalRow(new GenericArrayData(buf.n), new GenericArrayData(buf.sx),
      new GenericArrayData(buf.sxy))

  override def serialize(buf: CovMomentsBuffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * (2 * buf.d + buf.sxy.length))
    bb.putInt(buf.d)
    buf.n.foreach(bb.putLong)
    buf.sx.foreach(bb.putLong)
    buf.sxy.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): CovMomentsBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new CovMomentsBuffer
    val d = bb.getInt
    buf.grow(d)
    var i = 0
    while (i < d) { buf.n(i) = bb.getLong; i += 1 }
    i = 0
    while (i < d) { buf.sx(i) = bb.getLong; i += 1 }
    i = 0
    val t = d * (d + 1) / 2
    while (i < t) { buf.sxy(i) = bb.getLong; i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CovMoments =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CovMoments =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): CovMoments =
    copy(child = newChild)
}
