package graft.operators

import graft.{QueryEntry, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Fixed-memory histogram quantiles — the third member of the
  * engine-independent sketch family (cardinality = [[Hll]], frequency
  * = [[CountMin]], quantiles = this). A single pass bins values into B
  * equal-width buckets over a declared [lo, hi) domain; quantile q is
  * answered from the cumulative bin counts as the midpoint of the bin
  * containing rank ⌈q·N⌉. Everything after the binning FLOOR is
  * integer math, and the FLOOR itself is one identical double op in
  * both engines, so estimates sit under the DuckDB differential gate.
  * Error is bounded by half a bin width by construction (spec-pinned
  * against the exact percentile).
  *
  * Scale shape vs exact quantiles: `percentile` needs a full sort /
  * large state per group; this is one map-side-combined groupBy onto
  * ≤ B cells then a B-row scan — constant memory at any data size,
  * and the sketch is trivially mergeable (cell-wise add).
  */
object HistQuantile {

  /** Quantile estimates for `qs` over a numeric column. Values outside
    * [lo, hi) clamp into the edge bins (their rank mass still counts,
    * as in any fixed-domain histogram).
    */
  def estimate(df: DataFrame, column: String, lo: Double, hi: Double,
      bins: Int, qs: Seq[Double]): DataFrame = {
    val w = (hi - lo) / bins
    val bin = least(lit(bins - 1), greatest(lit(0),
      floor((col(column) - lo) / w).cast(LongType)))
    // ONE distributed pass builds the ≤`bins`-row histogram; the
    // sketch itself is collected (it is the model, like the IVF
    // centroids) and the rank lookups are plain driver arithmetic —
    // re-deriving them as Spark jobs would re-scan the source once per
    // quantile.
    // model-sized: ≤n_bins rows — the histogram, not the data
    val cells = df.filter(col(column).isNotNull)
      .select(bin.as("b"))
      .groupBy("b").agg(count(lit(1)).as("c"))
      .orderBy("b")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val n = cells.map(_._2).sum
    val spark = df.sparkSession
    import spark.implicits._
    if (n == 0L) {
      // empty input: a quantile has no value — zero rows, same schema
      return Seq.empty[(Double, Double)].toDF("q", "est")
    }
    val cum = cells.scanLeft((0L, 0L)) { case ((_, acc), (b, c)) => (b, acc + c) }.tail
    val ests = qs.sorted.flatMap { q =>
      val rank = math.ceil(q * n).toLong.max(1L)
      // q outside (0, 1] can exceed every cumulative count — emit no
      // row for it (the pre-collect formulation's behavior) rather
      // than crash
      cum.find(_._2 >= rank).map { case (b, _) =>
        // same double ops the oracle spells: lo + (b + 0.5) * w, HALF_UP
        val est = BigDecimal(lo + (b + 0.5) * w)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        (q, est)
      }
    }
    ests.toDF("q", "est")
  }

  /** DuckDB mirror of [[estimate]] — same FLOOR binning, same integer
    * cumulative ranks, same midpoint arithmetic.
    */
  def oracleSql(table: String, column: String, lo: Double, hi: Double,
      bins: Int, qs: Seq[Double]): String = {
    val w = s"((CAST($hi AS DOUBLE) - CAST($lo AS DOUBLE)) / $bins)"
    val qsSql = qs.map(q => s"SELECT CAST($q AS DOUBLE) AS q").mkString(" UNION ALL ")
    s"""WITH cells AS (
       |  SELECT LEAST(${bins - 1}, GREATEST(0,
       |           CAST(FLOOR(($column - CAST($lo AS DOUBLE)) / $w) AS BIGINT))) AS b,
       |         COUNT(*) AS c
       |  FROM $table WHERE $column IS NOT NULL GROUP BY 1
       |), cum AS (
       |  SELECT b, c, SUM(c) OVER (ORDER BY b
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
       |  FROM cells
       |), n AS (SELECT MAX(cum) AS n FROM cum),
       |quants AS ($qsSql)
       |SELECT q.q,
       |       ROUND(CAST($lo AS DOUBLE) + (CAST(pick.b AS DOUBLE) + CAST(0.5 AS DOUBLE)) * $w, 6) AS est
       |FROM quants q, n,
       |LATERAL (SELECT b FROM cum
       |         WHERE cum >= GREATEST(CAST(1 AS BIGINT), CAST(CEIL(q.q * n.n) AS BIGINT))
       |         ORDER BY b LIMIT 1) pick
       |ORDER BY q.q""".stripMargin
  }

  val entries: Seq[QueryEntry] = Seq(
    // Histogram quantiles of l_extendedprice over a declared domain —
    // single-pass, constant memory, mergeable; exact-percentile error
    // bound pinned in the spec suite.
    QueryEntry.sql(
      "q54_hist_quantiles",
      oracleSql("lineitem", "l_extendedprice", lo = 0.0, hi = 120000.0,
        bins = 1024, qs = Seq(0.5, 0.9, 0.99)),
    ) { (s, dir) =>
      estimate(Tables(s, dir).lineitem, "l_extendedprice",
        lo = 0.0, hi = 120000.0, bins = 1024, qs = Seq(0.5, 0.9, 0.99))
    },

    // q157 — EXACT equi-depth histogram (the optimizer-statistics
    // companion to q54's fixed-width sketch: equal ROW counts per
    // bucket, data-dependent boundaries — what a planner wants for
    // selectivity on skewed columns). bucket = (rank−1)·B div N on the
    // two-phase distributed rank (q147's machinery — no
    // single-partition window, unlike NTILE); all integer arithmetic.
    QueryEntry.sql(
      "q157_equidepth_histogram",
      """WITH ranked AS (
        |  SELECT n_chars,
        |         ROW_NUMBER() OVER (ORDER BY n_chars, doc_id) AS r,
        |         COUNT(*) OVER () AS n
        |  FROM documents)
        |SELECT CAST((r - 1) * 8 // n AS BIGINT) AS bucket,
        |       CAST(COUNT(*) AS BIGINT) AS n_rows,
        |       CAST(MIN(n_chars) AS BIGINT) AS lo,
        |       CAST(MAX(n_chars) AS BIGINT) AS hi
        |FROM ranked GROUP BY bucket ORDER BY bucket""".stripMargin,
    ) { (s, dir) => equiDepth(Tables(s, dir).documentsRebalanced, buckets = 8) },
  )

  /** Exact equi-depth histogram of `n_chars` over a (doc_id, n_chars)
    * frame: `buckets` buckets of equal row count (±1), boundaries from
    * the data. Exact global ranks via [[Curation.withGlobalRank]]; the
    * total count rides in as a 1-row broadcast.
    */
  def equiDepth(docs: DataFrame, buckets: Int): DataFrame = {
    val n = docs.agg(count(lit(1)).as("n"))
    Curation.withGlobalRank(docs.select("doc_id", "n_chars"),
        key = "n_chars", tie = "doc_id", descending = false)
      .crossJoin(broadcast(n))
      .withColumn("bucket", expr(s"((rk - 1) * $buckets) div n"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_rows"),
        min(col("n_chars")).as("lo"), max(col("n_chars")).as("hi"))
      .orderBy("bucket")
  }
}
