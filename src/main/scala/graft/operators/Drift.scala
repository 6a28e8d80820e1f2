package graft.operators

import graft.{QueryEntry, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.DataFrame

/** Population Stability Index — the standard distribution-drift score
  * between a reference slice and a current slice (feature monitoring,
  * model-retraining triggers): PSI = Σ_buckets (p_ref − p_cur) ·
  * ln(p_ref / p_cur), here reported per bucket so the drift is
  * attributable, with the scalar PSI the sum of `contrib`.
  *
  * Scale shape: one pass buckets every row (codegen CASE + clamp),
  * one map-side-combined count to slices × buckets cells, and all the
  * ratio/log arithmetic runs on that cell frame — the corpus is
  * touched once regardless of bucket count. Empty cells take the
  * conventional ε = 1e-6 floor (deterministic in both engines) so a
  * vanished bucket contributes a large-but-finite drift, not ±∞.
  */
object Drift {

  val Eps = 1e-6

  /** Per-bucket (p_ref, p_cur, contribution) for `value` distributions
    * before/after `boundary` (a `yyyy-MM-dd` date): fixed-width
    * buckets `floor(value/width)` clamped to [0, buckets).
    */
  def psiBuckets(events: DataFrame, boundary: String,
      buckets: Int = 10, width: Double = 10.0): DataFrame = {
    val base = events.select(
      when(to_date(col("ts")) < lit(boundary).cast(DateType), "ref")
        .otherwise("cur").as("slice"),
      least(greatest(floor(col("value") / width).cast(IntegerType), lit(0)),
        lit(buckets - 1)).as("bucket"))
    val cnt = base.groupBy("slice", "bucket").agg(count(lit(1)).as("c"))
    val tot = cnt.groupBy("slice").agg(sum("c").as("t"))
    val p = cnt.join(broadcast(tot), Seq("slice"))
      .groupBy("bucket")
      .agg(
        max(when(col("slice") === "ref", col("c") / col("t"))).as("pa"),
        max(when(col("slice") === "cur", col("c") / col("t"))).as("pb"))
    val pa = coalesce(col("pa"), lit(Eps))
    val pb = coalesce(col("pb"), lit(Eps))
    p.select(col("bucket"),
        round(pa, 6).as("p_ref"),
        round(pb, 6).as("p_cur"),
        round((pa - pb) * log(pa / pb), 6).as("contrib"))
      .orderBy("bucket")
  }

  val entries: Seq[QueryEntry] = Seq(
    // Value-distribution drift across the mid-January boundary; DuckDB
    // re-derives bucket shares and the per-bucket PSI contribution.
    QueryEntry.sql(
      "q126_psi_drift",
      """WITH base AS (
        |  SELECT CASE WHEN CAST(ts AS DATE) < DATE '2024-01-15'
        |              THEN 'ref' ELSE 'cur' END AS slice,
        |         LEAST(GREATEST(CAST(FLOOR(value / 10) AS INTEGER), 0), 9)
        |           AS bucket
        |  FROM events
        |), cnt AS (
        |  SELECT slice, bucket, COUNT(*) AS c FROM base GROUP BY 1, 2
        |), tot AS (SELECT slice, SUM(c) AS t FROM cnt GROUP BY 1),
        |p AS (
        |  SELECT bucket,
        |         MAX(CASE WHEN cnt.slice = 'ref' THEN c / t END) AS pa,
        |         MAX(CASE WHEN cnt.slice = 'cur' THEN c / t END) AS pb
        |  FROM cnt JOIN tot ON cnt.slice = tot.slice GROUP BY 1
        |)
        |SELECT bucket, ROUND(COALESCE(pa, 1e-6), 6) AS p_ref,
        |       ROUND(COALESCE(pb, 1e-6), 6) AS p_cur,
        |       ROUND((COALESCE(pa, 1e-6) - COALESCE(pb, 1e-6))
        |             * ln(COALESCE(pa, 1e-6) / COALESCE(pb, 1e-6)), 6)
        |         AS contrib
        |FROM p ORDER BY 1""".stripMargin,
    ) { (s, dir) =>
      psiBuckets(Tables(s, dir).events, "2024-01-15")
    },
  )
}
