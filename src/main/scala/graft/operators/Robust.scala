package graft.operators

import graft.{QueryEntry, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** Winsorized (clipped) robust statistics per group — the outlier-
  * resistant mean a data-quality pipeline reports next to the raw one
  * (a handful of corrupt readings should not move a 100 TB average).
  * Values are clipped to the group's [p5, p95] before averaging, so
  * the statistic is a pure function of the distribution, not of the
  * worst row.
  *
  * Scale shape: pass 1 computes per-group clip bounds, pass 2 clips
  * and averages — the bounds frame is GROUP-cardinality (broadcast
  * side of the join), the data side shuffles once for its aggregate.
  * The bounds use Spark's exact `percentile` (per-group value-count
  * buffer — fine while a group's distinct values fit an executor); at
  * 100 TB swap in `approx_percentile`, which is one line here and
  * keeps the same plan shape (the q102 exact-vs-approx trade,
  * documented rather than silently made).
  */
object Robust {

  def winsorizedStats(events: DataFrame, pLo: Double, pHi: Double): DataFrame = {
    val bounds = events.groupBy("event_type").agg(
      expr(s"percentile(value, $pLo)").as("lo"),
      expr(s"percentile(value, $pHi)").as("hi"))
    events.join(broadcast(bounds), Seq("event_type"))
      .select(col("event_type"),
        col("value"),
        least(greatest(col("value"), col("lo")), col("hi")).as("clipped"))
      .groupBy("event_type")
      .agg(
        round(avg("clipped"), 6).as("wmean"),
        round(avg("value"), 6).as("mean"),
        count(lit(1)).as("n"),
      )
      .orderBy("event_type")
  }

  val entries: Seq[QueryEntry] = Seq(
    // Winsorized vs raw mean per event type; DuckDB re-derives the
    // exact interpolated quantile bounds (quantile_cont ≡ Spark's
    // percentile: linear interpolation at (n-1)·p on sorted values)
    // and the clipped average.
    QueryEntry.sql(
      "q118_winsorized_stats",
      """WITH q AS (
        |  SELECT event_type,
        |         quantile_cont(value, 0.05) AS lo,
        |         quantile_cont(value, 0.95) AS hi
        |  FROM events GROUP BY 1
        |)
        |SELECT e.event_type,
        |       ROUND(AVG(LEAST(GREATEST(e.value, q.lo), q.hi)), 6) AS wmean,
        |       ROUND(AVG(e.value), 6) AS mean,
        |       COUNT(*) AS n
        |FROM events e JOIN q USING (event_type)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    ) { (s, dir) =>
      winsorizedStats(Tables(s, dir).events, 0.05, 0.95)
    },
  )
}
