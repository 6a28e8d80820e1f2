package graft.operators

import graft.{QueryEntry, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Portable Bloom filter over long keys — membership, the fourth
  * member of the pinned-hash sketch family (cardinality/frequency/
  * quantiles in [[Hll]]/[[CountMin]]/[[HistQuantile]]). k=3 bit
  * positions per key, each the top 16 bits of
  * splitmix64(splitmix64(x) XOR j) (m = 65536 bits); the filter is
  * materialized as the DISTINCT set of set-bit positions, membership =
  * all k positions present. Pinned integer math means even the FALSE
  * POSITIVES are engine-independent, so the operator sits under the
  * DuckDB differential gate.
  *
  * Use case surfaced in q55: decontamination pre-filtering — the
  * bloom "maybe" count dominates the exact hit count (no false
  * negatives, by construction), and at 100 TB the ≤ m-row position
  * set broadcasts where the exact eval-set anti-join would shuffle.
  */
object Bloom {

  private val K = 3
  private val Shift = 48 // top 16 bits → m = 65536

  private def positions(colName: String) =
    (0 until K).map { j =>
      struct(lit(j).as("j"),
        expr(s"shiftright(splitmix64(splitmix64($colName) ^ $j), $Shift) & 65535")
          .as("p"))
    }

  /** The set-bit positions for a frame of keys (column `x`). */
  def build(keys: DataFrame): DataFrame =
    keys.select(explode(array(positions("x"): _*)).as("q"))
      .select(col("q.p").as("p")).distinct()

  /** `maybe` column: true iff every one of the key's k positions is
    * set in `bloom` (built by [[build]]). No false negatives; false
    * positives at the pinned hash's collision rate.
    *
    * The filter collapses to ONE broadcast row (the ≤ m set-bit
    * positions as an array) probed per input row, so duplicate input
    * rows are preserved verbatim — a groupBy-based probe would merge
    * duplicates and could turn the hit count into K×(dup count),
    * breaking the no-false-negatives contract on non-unique input.
    */
  def withMembership(df: DataFrame, keyCol: String, bloom: DataFrame): DataFrame = {
    val bits = bloom.agg(collect_set(col("p")).as("graft_bloom_bits"))
    val maybe = positions(keyCol)
      .map(s => array_contains(col("graft_bloom_bits"), s.getField("p")))
      .reduce(_ && _)
    df.crossJoin(broadcast(bits))
      .withColumn("maybe", maybe)
      .drop("graft_bloom_bits")
  }

  val entries: Seq[QueryEntry] = Seq(
    // Bloom-prefiltered decontamination (the q42 eval set): per
    // language, the bloom "maybe" count next to the exact-hit count.
    // maybe ≥ exact always (no false negatives); both integers are
    // identical across engines because every bit position comes from
    // the pinned hash.
    QueryEntry.sql(
      "q55_bloom_membership",
      s"""WITH fp AS (
         |  SELECT doc_id, lang,
         |         CAST('0x' || substr(md5(regexp_replace(lower(text), '\\s+', ' ', 'g')), 1, 15)
         |              AS BIGINT) AS x
         |  FROM documents
         |), hx AS (
         |  SELECT doc_id, lang, x, ${Hll.splitmixSqlFor("x")} AS hx FROM fp
         |), pos AS (
         |  SELECT doc_id, lang, x, j,
         |         (${Hll.splitmixSqlFor("xor(hx, CAST(j AS UBIGINT))")}) >> $Shift AS p
         |  FROM hx, (SELECT unnest(range(0, $K)) AS j) js
         |), bloom AS (
         |  SELECT DISTINCT p FROM pos WHERE doc_id % 97 = 0
         |), evalset AS (
         |  SELECT DISTINCT x FROM fp WHERE doc_id % 97 = 0
         |), membership AS (
         |  SELECT pos.doc_id, pos.lang, pos.x,
         |         CAST(SUM(CASE WHEN bloom.p IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS hits
         |  FROM pos LEFT JOIN bloom ON bloom.p = pos.p
         |  GROUP BY 1, 2, 3
         |)
         |SELECT m.lang,
         |       CAST(SUM(CASE WHEN m.hits = $K THEN 1 ELSE 0 END) AS BIGINT) AS n_maybe,
         |       CAST(SUM(CASE WHEN e.x IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_exact
         |FROM membership m LEFT JOIN evalset e ON e.x = m.x
         |GROUP BY m.lang ORDER BY m.lang""".stripMargin,
    ) { (s, dir) =>
      val fp = Tables(s, dir).documentsRebalanced.select(
        col("doc_id"), col("lang"),
        graft.functions.GraftFunctions.md5Long(
          regexp_replace(lower(col("text")), "\\s+", " ")
            .cast(BinaryType)).as("x"))
      val evalKeys = fp.filter(col("doc_id") % 97 === 0).select("x").distinct()
      val bloom = build(evalKeys)
      val withM = withMembership(fp, "x", bloom)
      withM
        .join(broadcast(evalKeys.withColumn("ex", lit(1))), Seq("x"), "left")
        .groupBy("lang")
        .agg(
          sum(when(col("maybe"), 1L).otherwise(0L)).as("n_maybe"),
          sum(when(col("ex").isNotNull, 1L).otherwise(0L)).as("n_exact"),
        )
        .orderBy("lang")
    },
  )
}
