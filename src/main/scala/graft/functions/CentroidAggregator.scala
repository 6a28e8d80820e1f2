package graft.functions

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Column, Encoder}

/** Typed UDAF (the Aggregator extension surface, SURVEY §2.3 "UDF/UDAF"
  * row): element-wise mean of float vectors — the centroid primitive
  * behind the IVF index (`operators.Ivf`).
  *
  * Buffer is (running double sums, count); merge is element-wise, so
  * the aggregation is a standard partial/final two-phase plan — one
  * buffer per group per partition, never a per-row shuffle of
  * exploded (label, dim) pairs.
  */
object CentroidAggregator
    extends Aggregator[Seq[Float], (Array[Double], Long), Array[Double]] {

  def zero: (Array[Double], Long) = (Array.empty[Double], 0L)

  def reduce(b: (Array[Double], Long), v: Seq[Float]): (Array[Double], Long) = {
    val sums = if (b._1.isEmpty) new Array[Double](v.length) else b._1
    // fail fast on ragged input — silent truncation would make the
    // centroid depend on partition order
    require(v.length == sums.length,
      s"centroid over ragged vectors: ${v.length} vs ${sums.length}")
    var i = 0
    while (i < sums.length) {
      sums(i) += v(i).toDouble
      i += 1
    }
    (sums, b._2 + 1)
  }

  def merge(a: (Array[Double], Long), b: (Array[Double], Long)): (Array[Double], Long) = {
    if (a._1.isEmpty) b
    else if (b._1.isEmpty) a
    else {
      require(a._1.length == b._1.length,
        s"centroid over ragged vectors: ${a._1.length} vs ${b._1.length}")
      val out = a._1.clone()
      var i = 0
      while (i < out.length) {
        out(i) += b._1(i)
        i += 1
      }
      (out, a._2 + b._2)
    }
  }

  def finish(r: (Array[Double], Long)): Array[Double] =
    if (r._2 == 0) Array.empty else r._1.map(_ / r._2)

  def bufferEncoder: Encoder[(Array[Double], Long)] =
    ExpressionEncoder[(Array[Double], Long)]()
  def outputEncoder: Encoder[Array[Double]] =
    ExpressionEncoder[Array[Double]]()

  /** Column form for `groupBy(...).agg(...)`. */
  def centroid(c: Column): Column =
    org.apache.spark.sql.functions.udaf(this).apply(c)
}
