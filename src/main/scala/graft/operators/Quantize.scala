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

    // q252 — Matryoshka (MRL) truncation quality: for prefix dims
    // {8, 16, 32, 64}, the top-1 cosine neighbor of each probe vector
    // under the TRUNCATED embedding, vs the full-dim answer — top-1
    // agreement rate and mean best-neighbor cosine per dim (what a
    // dim-vs-recall budget decision actually reads). A FIXED 128-probe
    // panel keeps the scan input-linear (probes × corpus, never
    // corpus²). Scores are 1e6-scaled longs rounded once; the argmax
    // is an exact integer MAX over a packed (score, ¬cand) key —
    // map-side combinable, identical in both engines (the q202
    // HUGEINT-pack precedent, here fitting in a BIGINT).
    QueryEntry.sql(
      "q252_mrl_truncation",
      s"""WITH pro AS (
         |  SELECT vec_id AS p, embedding AS pe FROM embeddings
         |  WHERE vec_id < 128
         |), scored AS MATERIALIZED (
         |  SELECT p,
         |${Seq(8, 16, 32, 64).map { d =>
           s"""         MAX((CAST(ROUND(list_cosine_similarity(
              |                CAST(ce[1:$d] AS DOUBLE[]),
              |                CAST(pe[1:$d] AS DOUBLE[])) * 1000000.0, 0)
              |              AS BIGINT) + 1000000) * 4294967296
              |             + (4294967295 - c)) AS k$d""".stripMargin
         }.mkString(",\n")}
         |  FROM (SELECT vec_id AS c, embedding AS ce FROM embeddings) cand,
         |       pro
         |  WHERE c <> p
         |  GROUP BY p
         |), dims AS (
         |${Seq(8, 16, 32, 64).map { d =>
           s"""  SELECT $d AS dim, p,
              |         k$d // 4294967296 - 1000000 AS s6,
              |         4294967295 - (k$d % 4294967296) AS best,
              |         4294967295 - (k64 % 4294967296) AS best_full
              |  FROM scored""".stripMargin
         }.mkString("\n  UNION ALL\n")}
         |)
         |SELECT dim, CAST(COUNT(*) AS BIGINT) AS n_probes,
         |       CAST(SUM(CASE WHEN best = best_full THEN 1 ELSE 0 END)
         |            AS BIGINT) AS n_agree,
         |       ROUND(CAST(SUM(s6) AS DOUBLE) / 1000000.0 / COUNT(*), 6)
         |         AS mean_best_cos
         |FROM dims GROUP BY dim ORDER BY dim""".stripMargin,
    ) { (s, dir) =>
      val emb = Tables(s, dir).embeddings
      val pro = emb.filter(col("vec_id") < 128)
        .select(col("vec_id").as("p"), col("embedding").as("pe"))
      val cand = emb.select(col("vec_id").as("c"), col("embedding").as("ce"))
      val dims = Seq(8, 16, 32, 64)
      val packed = dims.map { d =>
        val s6 = round(graft.functions.GraftFunctions.cosineF32(
          slice(col("ce"), 1, d), slice(col("pe"), 1, d)) * lit(1e6), 0)
          .cast(LongType)
        max((s6 + lit(1000000L)) * lit(4294967296L) +
          (lit(4294967295L) - col("c"))).as(s"k$d")
      }
      val scored = cand.crossJoin(broadcast(pro))
        .filter(col("c") =!= col("p"))
        .groupBy("p")
        .agg(packed.head, packed.tail: _*)
      val unpiv = scored.select(col("p"), explode(array(dims.map { d =>
        struct(lit(d).as("dim"),
          (expr(s"k$d div 4294967296") - lit(1000000L)).as("s6"),
          (lit(4294967295L) - pmod(col(s"k$d"), lit(4294967296L))).as("best"),
          (lit(4294967295L) - pmod(col("k64"), lit(4294967296L)))
            .as("best_full"))
      }: _*)).as("r"))
      unpiv.groupBy(col("r.dim").as("dim"))
        .agg(count(lit(1)).as("n_probes"),
          sum(when(col("r.best") === col("r.best_full"), 1L).otherwise(0L))
            .as("n_agree"),
          round(sum(col("r.s6")).cast(DoubleType) / lit(1e6) / count(lit(1)), 6)
            .as("mean_best_cos"))
        .orderBy("dim")
    },
  )
}
