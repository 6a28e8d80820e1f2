package org.apache.spark.sql.graft

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Bounded bottom-k DISTINCT set of strings ordered ascending — the KMV
  * sketch state (Bar-Yossef et al., RANDOM'02). Admission against a
  * full buffer is one compareTo against the current k-th value, so a
  * task's state never exceeds k entries no matter how many rows it
  * scans; merge is "union, keep the k smallest", which is EXACTLY the
  * sketch of the union (Beyer et al., SIGMOD'07) — the identity that
  * makes the aggregate's partial/final split correct by construction.
  */
final class KmvSetBuffer(val k: Int) {
  val set = new java.util.TreeSet[UTF8String]()

  def add(h: UTF8String): Unit =
    if (set.size < k || h.compareTo(set.last()) < 0) {
      // clone only on admission: the input UTF8String may be backed by
      // a reused row buffer; TreeSet dedups re-inserts of equal values
      if (set.add(h.clone()) && set.size > k) set.pollLast()
    }

  def mergeFrom(other: KmvSetBuffer): Unit = {
    val it = other.set.iterator()
    while (it.hasNext) add(it.next())
  }
}

/** `kmv_sketch(hash, k)` → `array<string>`: the k smallest DISTINCT
  * values of `hash` per group, ascending — a KMV distinct-count sketch
  * as a native [[TypedImperativeAggregate]], the groupable form of the
  * table-level bottom-k ([[graft.operators.Kmv.bottomK]] builds on it).
  *
  * The input is the HASH column (md5 hex in the engine's convention),
  * not the raw key: hashing stays a codegen'd scalar expression and the
  * aggregate is pure order statistics — any uniform hex/string hash
  * works. NULL inputs are skipped (SQL aggregate convention; a NULL key
  * has no hash).
  *
  * Why an aggregate and not mapPartitions: the aggregate composes with
  * `groupBy` (per-group distinct estimation), runs partial/final with a
  * k-bounded buffer per (group, map task), and stays inside the
  * ObjectHashAggregate operator — the mapPartitions form was
  * table-level only and opaque to Catalyst.
  */
case class KmvSketch(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[KmvSetBuffer]
    with UnaryLike[Expression] {

  require(k > 0, s"kmv_sketch requires k > 0, got $k")

  override def prettyName: String = "kmv_sketch"
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = false

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"kmv_sketch expects a string hash column, got ${child.dataType.simpleString}")
  }

  override def createAggregationBuffer(): KmvSetBuffer = new KmvSetBuffer(k)

  override def update(buffer: KmvSetBuffer, input: InternalRow): KmvSetBuffer = {
    val v = child.eval(input)
    if (v != null) buffer.add(v.asInstanceOf[UTF8String])
    buffer
  }

  override def merge(buffer: KmvSetBuffer, other: KmvSetBuffer): KmvSetBuffer = {
    buffer.mergeFrom(other)
    buffer
  }

  /** Ascending bottom-k (TreeSet iteration order). */
  override def eval(buffer: KmvSetBuffer): Any = {
    val out = new Array[Any](buffer.set.size)
    val it = buffer.set.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buffer: KmvSetBuffer): Array[Byte] = {
    var bytes = 4
    val it0 = buffer.set.iterator()
    while (it0.hasNext) { bytes += 4 + it0.next().numBytes() }
    val bb = ByteBuffer.allocate(bytes)
    bb.putInt(buffer.set.size)
    val it = buffer.set.iterator()
    while (it.hasNext) {
      val b = it.next().getBytes
      bb.putInt(b.length)
      bb.put(b)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): KmvSetBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new KmvSetBuffer(k)
    var i = 0
    while (i < n) {
      val len = bb.getInt
      val b = new Array[Byte](len)
      bb.get(b)
      buf.add(UTF8String.fromBytes(b))
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KmvSketch =
    copy(child = newChild)
}
