package graft.operators

import graft.{QueryEntry, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.DataFrame

/** Exponentially-weighted moving average per entity — the standard
  * smoothing primitive for event streams (load averages, per-user
  * engagement decay). The recurrence s₁ = v₁, sᵢ = α·vᵢ + (1-α)·sᵢ₋₁
  * is evaluated in CLOSED FORM as one weighted window sum,
  *
  *   sₙ = (1-α)ⁿ⁻¹·v₁ + Σ_{i=2..n} α·(1-α)ⁿ⁻ⁱ·vᵢ,
  *
  * so the sequential-looking operator becomes a plain two-window +
  * group-by plan with no iterative lineage and no UDAF state.
  *
  * Scale shape: one shuffle on the entity key; row_number and the
  * partition count share that partitioning (no second exchange). All
  * events of one entity land in one task — inherent to any
  * order-sensitive per-entity statistic (the q49 sessionization
  * shape); entity cardinality, not corpus size, sets the parallelism,
  * and per-user event counts are human-bounded. The weights underflow
  * to exact 0.0 beyond ~log(ε)/log(1-α) steps (≈2980 for α=0.3), so a
  * bounded-tail rewrite (keep each entity's last T events) yields
  * bit-identical sums if a skewed entity ever needs it.
  *
  * Oracle parity: weights are IEEE `pow` per row (deterministic given
  * rn, n); the sum is rounded to 6 dp — the float-sum-order rule from
  * FIXTURES.md (effective terms decay geometrically, so cross-engine
  * accumulation-order drift is orders below the rounding grain).
  */
object Ewma {

  val Alpha = 0.3

  /** The closed form over any (key, order, value) frame: one row per
    * key with (count, smoothed value). `nName`/`sName` label the two
    * output columns so callers keep their domain vocabulary.
    */
  def smoothed(df: DataFrame, keyCol: String, orderCols: Seq[String],
      valueCol: String, alpha: Double, nName: String, sName: String): DataFrame = {
    val byKey = Window.partitionBy(keyCol)
    val ordered = byKey.orderBy(orderCols.map(col): _*)
    df
      .withColumn("rn", row_number().over(ordered))
      .withColumn("n", count(lit(1)).over(byKey))
      .withColumn("wt",
        when(col("rn") === 1, pow(lit(1 - alpha), col("n") - 1))
          .otherwise(lit(alpha) * pow(lit(1 - alpha), col("n") - col("rn"))))
      .groupBy(keyCol)
      .agg(
        count(lit(1)).as(nName),
        round(sum(col("wt") * col(valueCol)), 6).as(sName),
      )
      .orderBy(keyCol)
  }

  /** Final smoothed `value` per `user_id` over the (ts, event_id)
    * timeline.
    */
  def ewmaByUser(events: DataFrame, alpha: Double = Alpha): DataFrame =
    smoothed(
      events.select(col("user_id"), col("ts"), col("event_id"), col("value")),
      "user_id", Seq("ts", "event_id"), "value", alpha, "n_events", "ewma")

  val entries: Seq[QueryEntry] = Seq(
    // Per-user EWMA (α=0.3) over the event stream; DuckDB evaluates
    // the identical closed form and must agree to 6 dp user by user.
    QueryEntry.sql(
      "q114_ewma",
      s"""WITH e AS (
         |  SELECT user_id, value,
         |         row_number() OVER (PARTITION BY user_id
         |                            ORDER BY ts, event_id) AS rn,
         |         count(*) OVER (PARTITION BY user_id) AS n
         |  FROM events)
         |SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
         |       ROUND(SUM(CASE WHEN rn = 1 THEN power(${1 - Alpha}, n - 1)
         |                      ELSE $Alpha * power(${1 - Alpha}, n - rn)
         |                 END * value), 6) AS ewma
         |FROM e GROUP BY 1 ORDER BY 1""".stripMargin,
    ) { (s, dir) =>
      ewmaByUser(Tables(s, dir).events)
    },

    // Trending score: the same closed form over each event type's
    // DAILY COUNT series — recency-weighted volume, the "what's rising
    // now" ranking. The window input here is days-per-type (bounded by
    // calendar), the corpus only pays the daily rollup.
    QueryEntry.sql(
      "q123_trending",
      s"""WITH daily AS (
         |  SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS cnt
         |  FROM events GROUP BY 1, 2
         |), e AS (
         |  SELECT event_type, cnt,
         |         row_number() OVER (PARTITION BY event_type ORDER BY day) AS rn,
         |         count(*) OVER (PARTITION BY event_type) AS n
         |  FROM daily)
         |SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_days,
         |       ROUND(SUM(CASE WHEN rn = 1 THEN power(${1 - Alpha}, n - 1)
         |                      ELSE $Alpha * power(${1 - Alpha}, n - rn)
         |                 END * cnt), 6) AS trend
         |FROM e GROUP BY 1 ORDER BY 1""".stripMargin,
    ) { (s, dir) =>
      val daily = Tables(s, dir).events
        .select(col("event_type"), to_date(col("ts")).as("day"))
        .groupBy("event_type", "day").agg(count(lit(1)).as("cnt"))
      smoothed(daily, "event_type", Seq("day"), "cnt", Alpha, "n_days", "trend")
    },
  )
}
