package graft.operators

import graft.{QueryEntry, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** Trailing-window distinct counting — distinct users over the last W
  * days, per day: the DAU/WAU family, and the query HLL sketches
  * usually stand in for. This is the exact form; its cost model is
  * explicit so the sketch swap is an informed decision, not a default.
  *
  * Scale shape: dedup to the (user, day) frame first (map-side
  * combined; the corpus is touched once), then each row EXPLODES into
  * the ≤W window-ends it serves — a bounded ×W fanout on the
  * users·days frame, no self-join, no per-window rescan. A semi-join
  * against the (calendar-sized, broadcast) day grid drops phantom
  * window-ends past the data's edge. The per-window distinct is the
  * one real shuffle, keyed by (window_end, user). At 100 TB with wide
  * windows, swap the tail for q62's mergeable HLL registers per day
  * (union W register sets per window) — same frame, ×1 instead of ×W.
  */
object Sliding {

  def slidingDistinctUsers(events: DataFrame, windowDays: Int): DataFrame = {
    val d = events.select(to_date(col("ts")).as("day"), col("user_id")).distinct()
    val grid = d.select(col("day")).distinct()
    d.select(col("user_id"),
        explode(sequence(col("day"), date_add(col("day"), windowDays - 1)))
          .as("wday"))
      .join(broadcast(grid), col("wday") === col("day"), "left_semi")
      .select("user_id", "wday").distinct()
      .groupBy("wday")
      .agg(count(lit(1)).as("users_window"))
      .select(date_format(col("wday"), "yyyy-MM-dd").as("day"),
        col("users_window"))
      .orderBy("day")
  }

  val entries: Seq[QueryEntry] = Seq(
    // Trailing-7-day distinct users per day; DuckDB re-derives the
    // window-end explode and the exact distinct (dates cross the gate
    // as strings — the DATE-column oracle rule).
    QueryEntry.sql(
      "q125_sliding_distinct",
      """WITH d AS (
        |  SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events
        |), grid AS (SELECT DISTINCT day FROM d),
        |x AS (
        |  SELECT user_id,
        |         CAST(unnest(generate_series(day, day + INTERVAL 6 DAY,
        |                                     INTERVAL 1 DAY)) AS DATE) AS wday
        |  FROM d
        |), w AS (
        |  SELECT DISTINCT user_id, wday FROM x
        |  WHERE wday IN (SELECT day FROM grid)
        |)
        |SELECT strftime(wday, '%Y-%m-%d') AS day, COUNT(*) AS users_window
        |FROM w GROUP BY 1 ORDER BY 1""".stripMargin,
    ) { (s, dir) =>
      slidingDistinctUsers(Tables(s, dir).events, windowDays = 7)
    },
  )
}
