package org.apache.spark.sql.graft

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries frequency-sketch state: at most k (item, count)
  * counters. Admitting an unseen item against a full buffer decrements
  * ALL counters by 1 (dropping zeros) — the classic guarantee is that
  * any item with true frequency > N/(k+1) survives with
  * `true - N/(k+1) <= est <= true`. Merge follows Agarwal et al.
  * (PODS'12, mergeable summaries): sum counters pairwise, then if more
  * than k remain subtract the (k+1)-th largest count from every
  * counter and drop the non-positives — the error bounds compose, so
  * the partial/final aggregate split is correct by construction.
  *
  * EXACTNESS REGIME: while a group's distinct-item count never exceeds
  * k, no decrement ever fires (in update or merge) and every estimate
  * equals the true count — which is what makes the aggregate
  * differential-oracle-able against exact GROUP BY counts.
  */
final class FreqBuffer(val k: Int) {
  val counts = new java.util.TreeMap[UTF8String, Long]()

  def add(item: UTF8String, n: Long): Unit = {
    // containsKey, not get: the Long value type unboxes a missing key's
    // null to 0, which would silently admit unseen items past k
    if (counts.containsKey(item)) counts.put(item, counts.get(item) + n)
    else if (counts.size < k) counts.put(item.clone(), n)
    else {
      // decrement-all by min(n, smallest count): amortized O(1) per
      // admission in the classic n=1 case; entries hitting zero leave
      val it = counts.entrySet().iterator()
      var minC = Long.MaxValue
      while (it.hasNext) { val c = it.next().getValue; if (c < minC) minC = c }
      val dec = math.min(n, minC)
      val it2 = counts.entrySet().iterator()
      while (it2.hasNext) {
        val e = it2.next()
        if (e.getValue <= dec) it2.remove() else e.setValue(e.getValue - dec)
      }
      if (n > dec) add(item, n - dec)
    }
  }

  def mergeFrom(other: FreqBuffer): Unit = {
    val it = other.counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      if (counts.containsKey(e.getKey)) counts.put(e.getKey, counts.get(e.getKey) + e.getValue)
      else counts.put(e.getKey, e.getValue) // may overflow k; trimmed below
    }
    if (counts.size > k) {
      // subtract the (k+1)-th largest count from all, drop non-positive
      val vals = new Array[Long](counts.size)
      val vit = counts.values().iterator()
      var i = 0
      while (vit.hasNext) { vals(i) = vit.next(); i += 1 }
      java.util.Arrays.sort(vals)
      val cut = vals(counts.size - k - 1) // (k+1)-th largest
      val eit = counts.entrySet().iterator()
      while (eit.hasNext) {
        val e = eit.next()
        if (e.getValue <= cut) eit.remove() else e.setValue(e.getValue - cut)
      }
    }
  }
}

/** `freq_sketch(item, k)` → `map<string,bigint>`: Misra–Gries top-k
  * frequency estimation as a native [[TypedImperativeAggregate]] —
  * per-(group, task) state bounded by k counters regardless of input
  * size, partial/final merge with composed error bounds. NULL items
  * are skipped (SQL aggregate convention).
  */
case class FreqSketch(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[FreqBuffer]
    with UnaryLike[Expression] {

  require(k > 0, s"freq_sketch requires k > 0, got $k")

  override def prettyName: String = "freq_sketch"
  override def dataType: DataType =
    MapType(StringType, LongType, valueContainsNull = false)
  override def nullable: Boolean = false

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"freq_sketch expects a string item column, got ${child.dataType.simpleString}")
  }

  override def createAggregationBuffer(): FreqBuffer = new FreqBuffer(k)

  override def update(buffer: FreqBuffer, input: InternalRow): FreqBuffer = {
    val v = child.eval(input)
    if (v != null) buffer.add(v.asInstanceOf[UTF8String], 1L)
    buffer
  }

  override def merge(buffer: FreqBuffer, other: FreqBuffer): FreqBuffer = {
    buffer.mergeFrom(other)
    buffer
  }

  /** Item-ascending map (TreeMap iteration order) — deterministic
    * output independent of arrival order in the exact regime.
    */
  override def eval(buffer: FreqBuffer): Any = {
    val n = buffer.counts.size
    val keys = new Array[Any](n)
    val vals = new Array[Any](n)
    val it = buffer.counts.entrySet().iterator()
    var i = 0
    while (it.hasNext) {
      val e = it.next()
      keys(i) = e.getKey
      vals(i) = e.getValue
      i += 1
    }
    new ArrayBasedMapData(new GenericArrayData(keys), new GenericArrayData(vals))
  }

  override def serialize(buffer: FreqBuffer): Array[Byte] = {
    var bytes = 4
    val it0 = buffer.counts.keySet().iterator()
    while (it0.hasNext) { bytes += 4 + 8 + it0.next().numBytes() }
    val bb = ByteBuffer.allocate(bytes)
    bb.putInt(buffer.counts.size)
    val it = buffer.counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val b = e.getKey.getBytes
      bb.putInt(b.length)
      bb.put(b)
      bb.putLong(e.getValue)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): FreqBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new FreqBuffer(k)
    var i = 0
    while (i < n) {
      val len = bb.getInt
      val b = new Array[Byte](len)
      bb.get(b)
      // deserialized buffers hold at most k entries (their own invariant),
      // so direct put preserves counts without re-running admission
      buf.counts.put(UTF8String.fromBytes(b), bb.getLong)
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): FreqSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): FreqSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): FreqSketch =
    copy(child = newChild)
}
