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

  /** Final smoothed `value` per `user_id` over the (ts, event_id)
    * timeline.
    */
  def ewmaByUser(events: DataFrame, alpha: Double = Alpha): DataFrame = {
    val byUser = Window.partitionBy("user_id")
    val ordered = byUser.orderBy(col("ts"), col("event_id"))
    events
      .select(col("user_id"), col("ts"), col("event_id"), col("value"))
      .withColumn("rn", row_number().over(ordered))
      .withColumn("n", count(lit(1)).over(byUser))
      .withColumn("wt",
        when(col("rn") === 1, pow(lit(1 - alpha), col("n") - 1))
          .otherwise(lit(alpha) * pow(lit(1 - alpha), col("n") - col("rn"))))
      .groupBy("user_id")
      .agg(
        count(lit(1)).as("n_events"),
        round(sum(col("wt") * col("value")), 6).as("ewma"),
      )
      .orderBy("user_id")
  }

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
  )
}
