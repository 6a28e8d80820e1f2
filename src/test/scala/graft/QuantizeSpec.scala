package graft

import graft.operators.Quantize
import org.apache.spark.sql.functions._

/** Int8 quantization invariants: the per-element error never exceeds
  * half a quantization step for in-range components, and the fixture's
  * unit-normalized vectors never saturate.
  */
class QuantizeSpec extends SparkSpec {

  test("per-element reconstruction error ≤ half step (1/254) in range") {
    val worst = Quantize.elements(Tables(spark, sf).embeddings)
      .filter(abs(col("xd")) <= 1.0)
      .select(max(abs(col("xd") - col("qv") / lit(127.0))))
      .head().getDouble(0)
    assert(worst <= 0.5 / 127.0 + 1e-12, s"worst error $worst")
  }

  test("unit-normalized fixture never saturates; totals are consistent") {
    val rows = run("q70_int8_quant").collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getLong(3) == 0L), "n_sat must be 0 on unit vectors")
    val nElems = rows.map(_.getLong(1)).sum
    val dim = Tables(spark, sf).embeddings
      .select(size(col("embedding"))).head().getInt(0)
    val nVecs = Tables(spark, sf).embeddings.count()
    assert(nElems == nVecs * dim)
  }
}
