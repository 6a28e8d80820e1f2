package graft.operators

import graft.{QueryEntry, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** User-behavior analytics over `events`: weekly cohort retention and a
  * strictly-ordered conversion funnel.
  *
  * Both decompose into per-user aggregates joined on `user_id` — every
  * shuffle is on the user key (uniform in the fixture; the salted-join
  * path q52 covers the skewed-user case), no window over the global
  * event stream, no driver state. The event-type filters sit directly
  * on the scan so each stage reads only its slice.
  */
object Retention {

  /** Weekly cohort retention: users bucketed by the Monday of their
    * first event (cohort), then distinct-user counts per (cohort week,
    * weeks since cohort). Two aggregates and one equi-join on user_id.
    */
  def cohortRetention(events: DataFrame): DataFrame = {
    val weeks = events.select(
      col("user_id"),
      to_date(date_trunc("week", col("ts"))).as("week"))
    val cohort = weeks.groupBy("user_id").agg(min("week").as("cohort_week"))
    weeks.distinct()
      .join(cohort, Seq("user_id"))
      .select(col("cohort_week"),
        (datediff(col("week"), col("cohort_week")) / 7)
          .cast(IntegerType).as("week_no"),
        col("user_id"))
      .groupBy("cohort_week", "week_no")
      .agg(countDistinct("user_id").as("n_users"))
      // dates leave as strings (FIXTURES.md date rule: parquet DATE vs
      // DuckDB DATE render differently through the compare harness)
      .select(date_format(col("cohort_week"), "yyyy-MM-dd").as("cohort_week"),
        col("week_no"), col("n_users"))
      .orderBy("cohort_week", "week_no")
  }

  /** Strictly-ordered funnel view → click → purchase: a user advances a
    * stage only with an event strictly after their first qualifying
    * event of the previous stage. Stage frames chain by an equi-join on
    * user_id, each pass reading only its event-type slice.
    */
  def funnel(events: DataFrame): DataFrame = {
    val v = events.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min("ts").as("vts"))
    val c = events.filter(col("event_type") === "click")
      .join(v, Seq("user_id"))
      .filter(col("ts") > col("vts"))
      .groupBy("user_id").agg(min("ts").as("cts"))
    val p = events.filter(col("event_type") === "purchase")
      .join(c, Seq("user_id"))
      .filter(col("ts") > col("cts"))
      .groupBy("user_id").agg(min("ts").as("pts"))
    v.agg(count(lit(1)).as("n_viewers"))
      .crossJoin(c.agg(count(lit(1)).as("n_clickers")))
      .crossJoin(p.agg(count(lit(1)).as("n_purchasers")))
  }

  val entries: Seq[QueryEntry] = Seq(
    QueryEntry.sql(
      "q103_cohort_retention",
      """WITH weeks AS (
        |  SELECT user_id, CAST(date_trunc('week', ts) AS DATE) AS week
        |  FROM events
        |), cohort AS (
        |  SELECT user_id, MIN(week) AS cohort_week FROM weeks GROUP BY 1
        |)
        |SELECT strftime(c.cohort_week, '%Y-%m-%d') AS cohort_week,
        |       CAST(date_diff('day', c.cohort_week, w.week) / 7 AS INT) AS week_no,
        |       COUNT(DISTINCT w.user_id) AS n_users
        |FROM (SELECT DISTINCT user_id, week FROM weeks) w
        |JOIN cohort c USING (user_id)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    ) { (s, dir) => cohortRetention(Tables(s, dir).events) },

    QueryEntry.sql(
      "q104_funnel",
      """WITH v AS (
        |  SELECT user_id, MIN(ts) AS vts FROM events
        |  WHERE event_type = 'view' GROUP BY 1
        |), c AS (
        |  SELECT e.user_id, MIN(e.ts) AS cts FROM events e
        |  JOIN v USING (user_id)
        |  WHERE e.event_type = 'click' AND e.ts > v.vts GROUP BY 1
        |), p AS (
        |  SELECT e.user_id, MIN(e.ts) AS pts FROM events e
        |  JOIN c USING (user_id)
        |  WHERE e.event_type = 'purchase' AND e.ts > c.cts GROUP BY 1
        |)
        |SELECT (SELECT COUNT(*) FROM v) AS n_viewers,
        |       (SELECT COUNT(*) FROM c) AS n_clickers,
        |       (SELECT COUNT(*) FROM p) AS n_purchasers""".stripMargin,
    ) { (s, dir) => funnel(Tables(s, dir).events) },
  )
}
