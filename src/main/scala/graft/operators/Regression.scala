package graft.operators

import graft.{QueryEntry, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.DataFrame

/** Group-wise ordinary least squares — slope/intercept of `value` over
  * time per group, the trend DETECTOR next to q114/q123's trend
  * followers (EWMA says where the level is; the slope says where it is
  * going, with a sign a monitor can alert on).
  *
  * One aggregation pass computes the five sufficient statistics
  * (n, Σx, Σy, Σxy, Σx²) — map-side combined, constant-width buffer,
  * nothing downstream is bigger than the group count. Oracle-parity
  * design (the q90/q93 split): x is an exact integer day offset, y and
  * the cross products accumulate in DECIMAL — sums are bit-identical
  * in any engine and any shuffle order — and only the final
  * slope/intercept arithmetic drops to IEEE double. x is centered on a
  * fixed epoch day, not epoch micros: day-scale integers keep the
  * normal-equation cancellation (nΣx² − (Σx)²) exact where raw
  * timestamps would eat 10 of the 16 double digits.
  */
object Regression {

  /** Per-group (n, slope, intercept) of y=`valueCol` over x=day(`tsCol`). */
  def dailyTrend(df: DataFrame, groupCol: String, tsCol: String,
      valueCol: String): DataFrame = {
    val x = datediff(to_date(col(tsCol)), lit("1990-01-01").cast(DateType))
    val y = col(valueCol).cast(DecimalType(18, 6))
    val s = df
      .select(col(groupCol), x.as("x"), y.as("y"))
      .groupBy(groupCol)
      .agg(
        count(lit(1)).as("n"),
        sum("x").as("sx"),
        sum("y").as("sy"),
        sum((col("x") * col("y")).cast(DecimalType(38, 6))).as("sxy"),
        sum(col("x").cast(LongType) * col("x")).as("sxx"),
      )
    val nD = col("n").cast(DoubleType)
    val sxD = col("sx").cast(DoubleType)
    val syD = col("sy").cast(DoubleType)
    // den = nΣx² − (Σx)² ≥ 0, and 0 exactly when the group has a
    // single distinct x — an undefined slope. Guarded to NULL in both
    // engines (unguarded, Spark's double division and DuckDB's would
    // diverge on the degenerate group — the q90 z-score lesson).
    val den = nD * col("sxx").cast(DoubleType) - sxD * sxD
    val slope = when(den > 0, (nD * col("sxy").cast(DoubleType) - sxD * syD) / den)
    s.select(col(groupCol), col("n"),
        round(slope, 6).as("slope"),
        round((syD - slope * sxD) / nD, 6).as("intercept"))
      .orderBy(groupCol)
  }

  val entries: Seq[QueryEntry] = Seq(
    // Per-event-type daily value trend; DuckDB re-derives the exact
    // decimal sufficient statistics and the same normal-equation
    // doubles — slope and intercept must agree to 6 dp.
    QueryEntry.sql(
      "q124_group_regression",
      """WITH b AS (
        |  SELECT event_type,
        |         date_diff('day', DATE '1990-01-01', CAST(ts AS DATE)) AS x,
        |         CAST(value AS DECIMAL(18,6)) AS y
        |  FROM events
        |), s AS (
        |  SELECT event_type, COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
        |         SUM(CAST(x * y AS DECIMAL(38,6))) AS sxy,
        |         SUM(CAST(x AS BIGINT) * x) AS sxx
        |  FROM b GROUP BY 1
        |)
        |, g AS (
        |  SELECT event_type, n, sx, sy, sxy, sxx,
        |         n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx AS den
        |  FROM s
        |)
        |SELECT event_type, CAST(n AS BIGINT) AS n,
        |       ROUND(CASE WHEN den > 0 THEN
        |               (n * CAST(sxy AS DOUBLE) - sx * CAST(sy AS DOUBLE)) / den
        |             END, 6) AS slope,
        |       ROUND((CAST(sy AS DOUBLE) -
        |              CASE WHEN den > 0 THEN
        |                (n * CAST(sxy AS DOUBLE) - sx * CAST(sy AS DOUBLE)) / den
        |              END * sx) / n, 6) AS intercept
        |FROM g ORDER BY 1""".stripMargin,
    ) { (s, dir) =>
      dailyTrend(Tables(s, dir).events, "event_type", "ts", "value")
    },
  )
}
