package graft.operators

import graft.{QueryEntry, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** Audience-overlap matrix: for every pair of event types, how many
  * users did BOTH — the co-engagement / co-occurrence analytic behind
  * audience segmentation and feature co-activation reports, with the
  * per-pair Jaccard normalizing away audience size.
  *
  * Scale shape: dedup to distinct (user, type) first (map-side
  * combined — the frame is users·|types| at most), then ONE self
  * equi-join on user_id with per-user fanout bounded by |types|²
  * (alphabet-sized, not corpus-sized), rolled up map-side to ≤
  * |types|² cells. The per-type audience totals frame is
  * |types|-sized and broadcast back for the Jaccard.
  */
object Overlap {

  def audienceOverlap(events: DataFrame): DataFrame = {
    val ut = events.select(col("user_id"), col("event_type")).distinct()
    val totals = ut.groupBy(col("event_type")).agg(count(lit(1)).as("total"))
    val pairs = ut.as("a").join(ut.as("b"), Seq("user_id"))
      .filter(col("a.event_type") < col("b.event_type"))
      .groupBy(col("a.event_type").as("type_a"), col("b.event_type").as("type_b"))
      .agg(count(lit(1)).as("users_both"))
    pairs
      .join(broadcast(totals.select(col("event_type").as("type_a"), col("total").as("ta"))), Seq("type_a"))
      .join(broadcast(totals.select(col("event_type").as("type_b"), col("total").as("tb"))), Seq("type_b"))
      .select(col("type_a"), col("type_b"), col("users_both"),
        round(col("users_both") / (col("ta") + col("tb") - col("users_both")), 6).as("jaccard"))
      .orderBy("type_a", "type_b")
  }

  val entries: Seq[QueryEntry] = Seq(
    // Pairwise audience overlap with Jaccard; DuckDB re-derives the
    // distinct (user, type) frame, the pair counts, and the totals.
    QueryEntry.sql(
      "q121_audience_overlap",
      """WITH ut AS (
        |  SELECT DISTINCT user_id, event_type FROM events
        |), totals AS (
        |  SELECT event_type, COUNT(*) AS total FROM ut GROUP BY 1
        |), pairs AS (
        |  SELECT a.event_type AS type_a, b.event_type AS type_b,
        |         COUNT(*) AS users_both
        |  FROM ut a JOIN ut b ON a.user_id = b.user_id
        |  WHERE a.event_type < b.event_type
        |  GROUP BY 1, 2
        |)
        |SELECT type_a, type_b, CAST(users_both AS BIGINT) AS users_both,
        |       ROUND(users_both / (ta.total + tb.total - users_both), 6) AS jaccard
        |FROM pairs
        |JOIN totals ta ON ta.event_type = type_a
        |JOIN totals tb ON tb.event_type = type_b
        |ORDER BY type_a, type_b""".stripMargin,
    ) { (s, dir) =>
      audienceOverlap(Tables(s, dir).events)
    },
  )
}
