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

    // q240 — exact per-source median + MAD of document token counts:
    // the robust center/spread pair outlier gates should use instead
    // of mean/stddev (one 10M-token spam doc moves a mean, not a
    // median). EXACT at any scale and cross-engine: medians come from
    // rank arithmetic over the (source, token-count) HISTOGRAM — the
    // cumulative walk runs over distinct count VALUES (bounded by max
    // doc length, model-sized), never a per-doc sort — and every
    // median is carried doubled (lo+hi order stats) so even-n halves
    // stay integers until the final /2 and /4. DuckDB re-derives both
    // histograms and all four order statistics.
    QueryEntry.sql(
      "q240_robust_median_mad",
      """WITH per AS (
        |  SELECT source,
        |         CAST(len(regexp_split_to_array(trim(lower(text)), '\s+'))
        |              AS BIGINT) AS n
        |  FROM documents
        |), h AS (
        |  SELECT source, n, COUNT(*) AS c FROM per GROUP BY 1, 2
        |), cum AS (
        |  SELECT source, n, SUM(c) OVER (PARTITION BY source ORDER BY n) AS cum
        |  FROM h
        |), tot AS (SELECT source, COUNT(*) AS nt FROM per GROUP BY 1),
        |m2 AS (
        |  SELECT t.source,
        |         (SELECT MIN(n) FROM cum WHERE cum.source = t.source
        |            AND cum.cum >= (t.nt + 1) // 2)
        |         + (SELECT MIN(n) FROM cum WHERE cum.source = t.source
        |            AND cum.cum >= (t.nt + 2) // 2) AS m2
        |  FROM tot t
        |), dev AS (
        |  SELECT p.source, ABS(2 * p.n - m2.m2) AS d
        |  FROM per p JOIN m2 ON m2.source = p.source
        |), dh AS (
        |  SELECT source, d, COUNT(*) AS c FROM dev GROUP BY 1, 2
        |), dcum AS (
        |  SELECT source, d, SUM(c) OVER (PARTITION BY source ORDER BY d) AS cum
        |  FROM dh
        |), m4 AS (
        |  SELECT t.source,
        |         (SELECT MIN(d) FROM dcum WHERE dcum.source = t.source
        |            AND dcum.cum >= (t.nt + 1) // 2)
        |         + (SELECT MIN(d) FROM dcum WHERE dcum.source = t.source
        |            AND dcum.cum >= (t.nt + 2) // 2) AS m4
        |  FROM tot t
        |)
        |SELECT t.source, CAST(t.nt AS BIGINT) AS n_docs,
        |       CAST(m2.m2 AS DOUBLE) / 2.0 AS median_tokens,
        |       CAST(m4.m4 AS DOUBLE) / 4.0 AS mad_tokens
        |FROM tot t JOIN m2 ON m2.source = t.source
        |JOIN m4 ON m4.source = t.source
        |ORDER BY t.source""".stripMargin,
    ) { (s, dir) =>
      robustMedianMad(Tables(s, dir).documentsRebalanced)
    },
  )

  /** Exact per-source median + MAD of token counts (q240) — see the
    * entry comment for the doubled-order-stat histogram design.
    */
  def robustMedianMad(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val per = docs.select(col("source"),
      size(TextAnalysis.tokens(col("text"))).cast("long").as("n"))
    val tot = per.groupBy("source").agg(count(lit(1)).as("nt"))
    val lo = (col("nt") + 1) / 2 // integer halves via floor on longs
    val hi = (col("nt") + 2) / 2

    // doubled median of `v` over frame f(source, v): histogram +
    // cumulative walk over DISTINCT values (model-sized per source)
    def doubledMedian(f: DataFrame, v: String, out: String): DataFrame = {
      val h = f.groupBy("source", v).agg(count(lit(1)).as("c"))
      val cum = h.withColumn("cum",
        sum("c").over(Window.partitionBy("source").orderBy(v)))
        .join(tot, "source")
      val mLo = cum.filter(col("cum") >= floor(lo))
        .groupBy("source").agg(min(v).as("mlo"))
      val mHi = cum.filter(col("cum") >= floor(hi))
        .groupBy("source").agg(min(v).as("mhi"))
      mLo.join(mHi, "source")
        .select(col("source"), (col("mlo") + col("mhi")).as(out))
    }

    val m2 = doubledMedian(per, "n", "m2")
    val dev = per.join(m2, "source")
      .select(col("source"), abs(lit(2) * col("n") - col("m2")).as("d"))
    val m4 = doubledMedian(dev, "d", "m4")
    tot.join(m2, "source").join(m4, "source")
      .select(col("source"), col("nt").cast("long").as("n_docs"),
        (col("m2").cast("double") / 2.0).as("median_tokens"),
        (col("m4").cast("double") / 4.0).as("mad_tokens"))
      .orderBy("source")
  }
}
