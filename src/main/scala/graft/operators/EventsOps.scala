package graft.operators

import graft.{QueryEntry, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Tier C events surface (SURVEY §2.4 row 6): the batch forms of the
  * streaming aggregations. `streaming.StreamingEvents` runs the same
  * tumbling-window aggregation as a watermarked Structured Streaming
  * query (`Trigger.AvailableNow`) and the test suite asserts
  * batch ≡ streaming equivalence.
  */
object EventsOps {

  val entries: Seq[QueryEntry] = Seq(
    // Q14 — filtered typed rollup (batch form of the streaming agg).
    // Money-style SUM in DECIMAL then DOUBLE for cross-engine
    // determinism; JSON props are parsed (scalar function surface) to
    // average the payload's k field.
    QueryEntry.sql(
      "q14_events_agg",
      """SELECT event_type, COUNT(*) AS cnt,
        |       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
        |       CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT)
        |         AS sum_k
        |FROM events
        |WHERE ts >= TIMESTAMP '2024-01-15 00:00:00'
        |GROUP BY event_type ORDER BY event_type""".stripMargin,
    ) { (s, dir) =>
      Tables(s, dir).events
        .filter(col("ts") >= lit("2024-01-15 00:00:00").cast(TimestampType))
        .groupBy("event_type")
        .agg(
          count(lit(1)).as("cnt"),
          sum(col("value").cast(DecimalType(18, 2))).cast(DoubleType).as("sum_value"),
          sum(get_json_object(col("props"), "$.k").cast(LongType)).as("sum_k"),
        )
        .orderBy("event_type")
    },

    // Tumbling 1-hour windows — the exact shape the streaming variant
    // runs with a watermark; window rendered as a string for oracle
    // parity.
    QueryEntry.sql(
      "q24_events_hourly",
      """SELECT strftime(date_trunc('hour', CAST(ts AS TIMESTAMP)),
        |                '%Y-%m-%d %H:%M') AS w,
        |       event_type, COUNT(*) AS cnt
        |FROM events
        |GROUP BY 1, 2 ORDER BY w, event_type""".stripMargin,
    ) { (s, dir) =>
      Tables(s, dir).events
        .groupBy(
          date_format(window(col("ts"), "1 hour").getField("start"),
            "yyyy-MM-dd HH:mm").as("w"),
          col("event_type"),
        )
        .agg(count(lit(1)).as("cnt"))
        .orderBy("w", "event_type")
    },
  )
}
