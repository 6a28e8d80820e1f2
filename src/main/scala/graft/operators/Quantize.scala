package graft.operators

import graft.{QueryEntry, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Int8 scalar quantization of embedding vectors — the standard 4×
  * compression step before ANN indexing (IVF/LSH in [[Ivf]] /
  * [[Similarity]] probe quantized codes at scale; this operator is the
  * codec).
  *
  * Symmetric int8: q = clamp(round(x·127), −127, 127); dequant
  * x̂ = q/127. The quality query reports per-label reconstruction
  * error. Everything is exact cross-engine: float32→double casts are
  * exact, x·127 is exact in double (24-bit mantissa × 7-bit constant ≤
  * 53 bits), per-element squared errors are rounded then accumulated
  * in DECIMAL(38,12) — order-independent — with one final cast to
  * double.
  *
  * Scale shape: pure per-element map + one grouped aggregate; no
  * joins, no driver state. At 100 TB the quantized corpus is written
  * back columnar and the error profile is the same single shuffle.
  */
object Quantize {

  /** Per-element quantization frame: (label, xd, qv). */
  def elements(embeddings: DataFrame): DataFrame = {
    val xd = col("x").cast(DoubleType)
    val qv = least(lit(127.0), greatest(lit(-127.0), round(xd * lit(127.0), 0)))
    embeddings
      .select(col("label"), explode(col("embedding")).as("x"))
      .select(col("label"), xd.as("xd"), qv.as("qv"))
  }

  val entries: Seq[QueryEntry] = Seq(
    // Reconstruction-error profile per label: element count, exact
    // accumulated squared error, and saturation count (elements at the
    // ±127 clamp — zero on unit-normalized vectors unless a component
    // exceeds 1).
    QueryEntry.sql(
      "q70_int8_quant",
      """WITH x AS (
        |  SELECT label, unnest(embedding) AS x FROM embeddings
        |), q AS (
        |  SELECT label, CAST(x AS DOUBLE) AS xd,
        |         LEAST(CAST(127.0 AS DOUBLE),
        |               GREATEST(CAST(-127.0 AS DOUBLE),
        |                        ROUND(CAST(x AS DOUBLE) * CAST(127.0 AS DOUBLE), 0)))
        |           AS qv
        |  FROM x
        |)
        |SELECT label, COUNT(*) AS n_elems,
        |       CAST(SUM(CAST(ROUND((xd - qv / CAST(127.0 AS DOUBLE))
        |                           * (xd - qv / CAST(127.0 AS DOUBLE)), 12)
        |                     AS DECIMAL(38,12))) AS DOUBLE) AS total_err,
        |       CAST(SUM(CASE WHEN abs(qv) = CAST(127.0 AS DOUBLE)
        |                     THEN 1 ELSE 0 END) AS BIGINT) AS n_sat
        |FROM q GROUP BY label ORDER BY label""".stripMargin,
    ) { (s, dir) =>
      val d = col("xd") - col("qv") / lit(127.0)
      elements(Tables(s, dir).embeddings)
        .groupBy("label")
        .agg(
          count(lit(1)).as("n_elems"),
          sum(round(d * d, 12).cast(DecimalType(38, 12)))
            .cast(DoubleType).as("total_err"),
          sum(when(abs(col("qv")) === 127.0, 1L).otherwise(0L)).as("n_sat"),
        )
        .orderBy("label")
    },
  )
}
