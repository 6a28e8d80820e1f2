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

  /** Conversion-latency distribution: for users who complete the full
    * strictly-ordered view → click → purchase funnel, the quantiles of
    * (first purchase − first view). The "how long does converting
    * take" number product teams pair with q104's "how many convert".
    *
    * All timestamps are compared and differenced as epoch MICROS on
    * both engines (the q108 truncation bound: Spark's nanos→micros
    * conversion ≡ DuckDB's TIMESTAMP_NS→TIMESTAMP cast), so strictness
    * and latency values are grain-identical. Same user-key join shape
    * as [[funnel]]; the quantile runs over one row per converted user.
    */
  def conversionLatency(events: DataFrame): DataFrame = {
    val tus = unix_micros(col("ts"))
    val v = events.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min(tus).as("vts"))
    val c = events.filter(col("event_type") === "click")
      .join(v, Seq("user_id"))
      .filter(tus > col("vts"))
      .groupBy(col("user_id"), col("vts")).agg(min(tus).as("cts"))
    val p = events.filter(col("event_type") === "purchase")
      .join(c, Seq("user_id"))
      .filter(tus > col("cts"))
      .groupBy(col("user_id"), col("vts")).agg(min(tus).as("pts"))
    p.select(((col("pts") - col("vts")) / lit(1000000.0)).as("latency_sec"))
      .agg(
        count(lit(1)).as("n_converted"),
        round(expr("percentile(latency_sec, 0.25)"), 6).as("p25"),
        round(expr("percentile(latency_sec, 0.5)"), 6).as("p50"),
        round(expr("percentile(latency_sec, 0.9)"), 6).as("p90"),
      )
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

    // Funnel latency quantiles; DuckDB re-walks the stage chain on the
    // same epoch-micro grain and re-interpolates the quantiles.
    QueryEntry.sql(
      "q128_conversion_latency",
      """WITH v AS (
        |  SELECT user_id, MIN(epoch_us(CAST(ts AS TIMESTAMP))) AS vts
        |  FROM events WHERE event_type = 'view' GROUP BY 1
        |), c AS (
        |  SELECT e.user_id, v.vts,
        |         MIN(epoch_us(CAST(e.ts AS TIMESTAMP))) AS cts
        |  FROM events e JOIN v USING (user_id)
        |  WHERE e.event_type = 'click'
        |    AND epoch_us(CAST(e.ts AS TIMESTAMP)) > v.vts
        |  GROUP BY 1, 2
        |), p AS (
        |  SELECT e.user_id, c.vts,
        |         MIN(epoch_us(CAST(e.ts AS TIMESTAMP))) AS pts
        |  FROM events e JOIN c USING (user_id)
        |  WHERE e.event_type = 'purchase'
        |    AND epoch_us(CAST(e.ts AS TIMESTAMP)) > c.cts
        |  GROUP BY 1, 2
        |), lat AS (
        |  SELECT (pts - vts) / 1000000.0 AS latency_sec FROM p
        |)
        |SELECT CAST(COUNT(*) AS BIGINT) AS n_converted,
        |       ROUND(quantile_cont(latency_sec, 0.25), 6) AS p25,
        |       ROUND(quantile_cont(latency_sec, 0.5), 6) AS p50,
        |       ROUND(quantile_cont(latency_sec, 0.9), 6) AS p90
        |FROM lat""".stripMargin,
    ) { (s, dir) => conversionLatency(Tables(s, dir).events) },
  )
}
