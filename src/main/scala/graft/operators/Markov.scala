package graft.operators

import graft.{QueryEntry, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** First-order Markov transition matrix over per-user event streams —
  * the "what happens after X" analytic behind funnel discovery,
  * next-action prediction features, and bot detection (a user whose
  * transition row is one spike is a script).
  *
  * Scale shape: ONE shuffle on user_id for the ordered `lag` pass
  * (event order is per-user state, the q49 sessionization shape), then
  * a map-side-combined count to at most |event_types|² rows — the
  * matrix is alphabet-sized, not corpus-sized (the q79 bigram-model
  * bound, one level up). The row-normalizing window runs on that
  * matrix-sized frame, so its full-partition frame is ≤ |event_types|
  * rows.
  */
object Markov {

  /** (prev, next) transition counts and row-normalized probabilities
    * over each user's (ts, event_id)-ordered event sequence. The first
    * event of each user has no predecessor and drops out (lag = NULL).
    */
  def transitions(events: DataFrame): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    events
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("prev", lag(col("event_type"), 1).over(byUser))
      .filter(col("prev").isNotNull)
      .groupBy(col("prev"), col("event_type").as("next"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("prob",
        round(col("cnt") / sum("cnt").over(Window.partitionBy("prev")), 6))
      .orderBy("prev", "next")
  }

  val entries: Seq[QueryEntry] = Seq(
    // Event-type transition matrix; DuckDB re-derives the lag pairs
    // and row normalization and must agree cell by cell.
    QueryEntry.sql(
      "q116_transition_matrix",
      """WITH seq AS (
        |  SELECT event_type,
        |         lag(event_type) OVER (PARTITION BY user_id
        |                               ORDER BY ts, event_id) AS prev
        |  FROM events
        |), cells AS (
        |  SELECT prev, event_type AS next, COUNT(*) AS cnt
        |  FROM seq WHERE prev IS NOT NULL GROUP BY 1, 2
        |)
        |SELECT prev, next, CAST(cnt AS BIGINT) AS cnt,
        |       ROUND(cnt / SUM(cnt) OVER (PARTITION BY prev), 6) AS prob
        |FROM cells ORDER BY prev, next""".stripMargin,
    ) { (s, dir) =>
      transitions(Tables(s, dir).events)
    },
  )
}
