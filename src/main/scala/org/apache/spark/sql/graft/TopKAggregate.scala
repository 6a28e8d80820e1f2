package org.apache.spark.sql.graft

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Bounded k-best buffer ordered by (score DESC, id ASC): a binary
  * min-heap keyed on "worseness" whose root is the worst survivor, so
  * admission against a full buffer is one O(log k) compare-and-sift.
  * Never holds more than k entries — the property that makes grouped
  * top-k aggregation scale: each map-side partial ships at most k rows
  * per group into the shuffle, regardless of group size.
  */
final class TopKHeap(val k: Int) {
  var size: Int = 0
  val scores: Array[Double] = new Array[Double](k)
  val ids: Array[Long] = new Array[Long](k)

  /** (s1,i1) strictly worse than (s2,i2) under (score DESC, id ASC). */
  private def worse(s1: Double, i1: Long, s2: Double, i2: Long): Boolean =
    s1 < s2 || (s1 == s2 && i1 > i2)

  def insert(s: Double, id: Long): Unit =
    if (size < k) {
      var i = size
      scores(i) = s; ids(i) = id; size += 1
      while (i > 0 && worse(scores(i), ids(i), scores((i - 1) / 2), ids((i - 1) / 2))) {
        swap(i, (i - 1) / 2); i = (i - 1) / 2
      }
    } else if (k > 0 && worse(scores(0), ids(0), s, id)) {
      scores(0) = s; ids(0) = id
      var i = 0
      var done = false
      while (!done) {
        val l = 2 * i + 1
        val r = 2 * i + 2
        var w = i
        if (l < size && worse(scores(l), ids(l), scores(w), ids(w))) w = l
        if (r < size && worse(scores(r), ids(r), scores(w), ids(w))) w = r
        if (w == i) done = true else { swap(i, w); i = w }
      }
    }

  private def swap(a: Int, b: Int): Unit = {
    val s = scores(a); scores(a) = scores(b); scores(b) = s
    val i = ids(a); ids(a) = ids(b); ids(b) = i
  }

  def mergeFrom(other: TopKHeap): Unit = {
    var i = 0
    while (i < other.size) { insert(other.scores(i), other.ids(i)); i += 1 }
  }

  /** Entries sorted best-first: (score DESC, id ASC). */
  def sorted: Array[(Double, Long)] =
    (0 until size).map(i => (scores(i), ids(i))).toArray
      .sortBy { case (s, id) => (-s, id) }
}

/** `topk_score_id(score, id, k)` → `array<struct<score:double,id:bigint>>`
  * sorted by (score DESC, id ASC): grouped top-k as a native
  * [[TypedImperativeAggregate]] over a [[TopKHeap]].
  *
  * Why an aggregate and not a window: `row_number() OVER (PARTITION BY
  * g ORDER BY score)` must shuffle and sort EVERY scored row on the
  * group key before discarding all but k — for a k-NN join over a
  * corpus that is |corpus|·|probes| rows through the exchange. This
  * aggregate admits rows into a k-bounded heap map-side (partial mode),
  * so the exchange carries at most k entries per (group, map task) and
  * the final merge is a k·partials heap union per group. Null score or
  * id rows are ignored (SQL aggregate convention).
  */
case class TopKScoreId(
    score: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[TopKHeap]
    with BinaryLike[Expression] {

  require(k > 0, s"topk_score_id requires k > 0, got $k")

  override def left: Expression = score
  override def right: Expression = id
  override def prettyName: String = "topk_score_id"

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("score", DoubleType, nullable = false),
      StructField("id", LongType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = false

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (score.dataType == DoubleType && id.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"topk_score_id expects (double, bigint), got " +
          s"(${score.dataType.simpleString}, ${id.dataType.simpleString})")
  }

  override def createAggregationBuffer(): TopKHeap = new TopKHeap(k)

  override def update(buffer: TopKHeap, input: InternalRow): TopKHeap = {
    val s = score.eval(input)
    val i = id.eval(input)
    // NaN is unordered under < / == — it could lodge at the heap root
    // and block all admissions; treat it like NULL (SQL aggregates
    // skip non-values)
    if (s != null && i != null && !s.asInstanceOf[Double].isNaN)
      buffer.insert(s.asInstanceOf[Double], i.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: TopKHeap, other: TopKHeap): TopKHeap = {
    buffer.mergeFrom(other)
    buffer
  }

  override def eval(buffer: TopKHeap): Any =
    new GenericArrayData(buffer.sorted.map { case (s, i) =>
      InternalRow(s, i)
    })

  override def serialize(buffer: TopKHeap): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 16 * buffer.size)
    bb.putInt(buffer.size)
    var i = 0
    while (i < buffer.size) {
      bb.putDouble(buffer.scores(i)); bb.putLong(buffer.ids(i)); i += 1
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKHeap = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val h = new TopKHeap(k)
    var i = 0
    while (i < n) { h.insert(bb.getDouble, bb.getLong); i += 1 }
    h
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKScoreId =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKScoreId =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): TopKScoreId =
    copy(score = newLeft, id = newRight)
}

/** String-payload sibling of [[TopKHeap]]: k-best (score DESC, key ASC
  * by UTF-8 byte order — which IS UTF8String's comparison order, so the
  * tie-break matches ORDER BY on the string column).
  */
final class TopKStrHeap(val k: Int) {
  var size: Int = 0
  val scores: Array[Double] = new Array[Double](k)
  val keys: Array[UTF8String] = new Array[UTF8String](k)

  private def worse(s1: Double, k1: UTF8String, s2: Double, k2: UTF8String): Boolean =
    s1 < s2 || (s1 == s2 && k1.compareTo(k2) > 0)

  def insert(s: Double, key: UTF8String): Unit =
    if (size < k) {
      var i = size
      scores(i) = s; keys(i) = key; size += 1
      while (i > 0 && worse(scores(i), keys(i), scores((i - 1) / 2), keys((i - 1) / 2))) {
        swap(i, (i - 1) / 2); i = (i - 1) / 2
      }
    } else if (k > 0 && worse(scores(0), keys(0), s, key)) {
      scores(0) = s; keys(0) = key
      var i = 0
      var done = false
      while (!done) {
        val l = 2 * i + 1
        val r = 2 * i + 2
        var w = i
        if (l < size && worse(scores(l), keys(l), scores(w), keys(w))) w = l
        if (r < size && worse(scores(r), keys(r), scores(w), keys(w))) w = r
        if (w == i) done = true else { swap(i, w); i = w }
      }
    }

  private def swap(a: Int, b: Int): Unit = {
    val s = scores(a); scores(a) = scores(b); scores(b) = s
    val t = keys(a); keys(a) = keys(b); keys(b) = t
  }

  def mergeFrom(other: TopKStrHeap): Unit = {
    var i = 0
    while (i < other.size) { insert(other.scores(i), other.keys(i)); i += 1 }
  }

  def sorted: Array[(Double, UTF8String)] =
    (0 until size).map(i => (scores(i), keys(i))).toArray
      .sortWith { case ((s1, k1), (s2, k2)) =>
        s1 > s2 || (s1 == s2 && k1.compareTo(k2) < 0)
      }
}

/** `topk_score_str(score, key, k)` → `array<struct<score:double,key:string>>`
  * sorted (score DESC, key ASC): [[TopKScoreId]] generalized to string
  * payloads — grouped "top terms per language"-style rankings with the
  * same k-bounded map-side partial property.
  */
case class TopKScoreStr(
    score: Expression,
    key: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[TopKStrHeap]
    with BinaryLike[Expression] {

  require(k > 0, s"topk_score_str requires k > 0, got $k")

  override def left: Expression = score
  override def right: Expression = key
  override def prettyName: String = "topk_score_str"

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("score", DoubleType, nullable = false),
      StructField("key", StringType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = false

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (score.dataType == DoubleType && key.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"topk_score_str expects (double, string), got " +
          s"(${score.dataType.simpleString}, ${key.dataType.simpleString})")
  }

  override def createAggregationBuffer(): TopKStrHeap = new TopKStrHeap(k)

  override def update(buffer: TopKStrHeap, input: InternalRow): TopKStrHeap = {
    val s = score.eval(input)
    val v = key.eval(input)
    // NaN skipped for the same reason as TopKScoreId
    if (s != null && v != null && !s.asInstanceOf[Double].isNaN)
      // clone: the input UTF8String may be backed by a reused row buffer
      buffer.insert(s.asInstanceOf[Double], v.asInstanceOf[UTF8String].clone())
    buffer
  }

  override def merge(buffer: TopKStrHeap, other: TopKStrHeap): TopKStrHeap = {
    buffer.mergeFrom(other)
    buffer
  }

  override def eval(buffer: TopKStrHeap): Any =
    new GenericArrayData(buffer.sorted.map { case (s, v) =>
      InternalRow(s, v)
    })

  override def serialize(buffer: TopKStrHeap): Array[Byte] = {
    var bytes = 4
    var i = 0
    while (i < buffer.size) { bytes += 12 + buffer.keys(i).numBytes(); i += 1 }
    val bb = ByteBuffer.allocate(bytes)
    bb.putInt(buffer.size)
    i = 0
    while (i < buffer.size) {
      bb.putDouble(buffer.scores(i))
      val kb = buffer.keys(i).getBytes
      bb.putInt(kb.length)
      bb.put(kb)
      i += 1
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKStrHeap = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val h = new TopKStrHeap(k)
    var i = 0
    while (i < n) {
      val s = bb.getDouble
      val len = bb.getInt
      val kb = new Array[Byte](len)
      bb.get(kb)
      h.insert(s, UTF8String.fromBytes(kb))
      i += 1
    }
    h
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKScoreStr =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKScoreStr =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): TopKScoreStr =
    copy(score = newLeft, key = newRight)
}
