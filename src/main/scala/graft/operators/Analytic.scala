package graft.operators

import graft.{QueryEntry, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Analytic extensions beyond the reference surface (SURVEY §2.3 rows
  * marked "none"): multi-level aggregation (ROLLUP), exact quantiles,
  * sketch aggregates, and an event-time as-of join.
  */
object Analytic {

  val entries: Seq[QueryEntry] = Seq(
    // ROLLUP with grouping-set disambiguation. Subtotal rows surface
    // NULL group keys — COALESCEd to a sentinel so ordering is
    // null-free and engine-independent.
    QueryEntry.sql(
      "q34_rollup_pricing",
      """SELECT COALESCE(l_returnflag, 'ALL') AS rf,
        |       COALESCE(l_linestatus, 'ALL') AS ls,
        |       GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS gid,
        |       COUNT(*) AS cnt,
        |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM lineitem
        |GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY gid, rf, ls""".stripMargin,
    ) { (s, dir) =>
      // Two-level rollup: aggregate to the (rf, ls) grain FIRST (one
      // scan, no Expand), then ROLLUP the tiny pre-aggregate with
      // re-aggregable partials (COUNT→SUM, decimal SUM→SUM — exact, so
      // results are identical to rolling up the raw rows). Catalyst's
      // ROLLUP Expand otherwise triples the full scan through the
      // aggregate; here it triples six rows.
      val base = Tables(s, dir).lineitem
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          count(lit(1)).as("pc"),
          sum(col("l_extendedprice").cast(DecimalType(18, 2))).as("ps"),
        )
      base
        .rollup("l_returnflag", "l_linestatus")
        .agg(
          (grouping(col("l_returnflag")) * 2 + grouping(col("l_linestatus"))).as("gid"),
          sum(col("pc")).as("cnt"),
          sum(col("ps")).cast(DoubleType).as("sum_price"),
        )
        .select(
          coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
          coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
          col("gid"), col("cnt"), col("sum_price"),
        )
        .orderBy("gid", "rf", "ls")
    },

    // Exact interpolated quantiles (Spark `percentile` ≡ DuckDB
    // `quantile_cont`) per return flag.
    QueryEntry.sql(
      "q36_percentiles",
      """SELECT l_returnflag,
        |       ROUND(quantile_cont(l_quantity, 0.25), 6) AS p25,
        |       ROUND(quantile_cont(l_quantity, 0.5), 6) AS p50,
        |       ROUND(quantile_cont(l_quantity, 0.75), 6) AS p75,
        |       ROUND(quantile_cont(l_quantity, 0.99), 6) AS p99
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    ) { (s, dir) =>
      val li = Tables(s, dir).lineitem
      def p(q: Double, name: String) =
        round(percentile(col("l_quantity"), lit(q)), 6).as(name)
      li.groupBy("l_returnflag")
        .agg(p(0.25, "p25"), p(0.5, "p50"), p(0.75, "p75"), p(0.99, "p99"))
        .orderBy("l_returnflag")
    },

    // HLL sketch — the "novel sketch" custom-operator class. Built on
    // the pinned SplitMix64 hash so the ESTIMATE itself is
    // engine-independent and sits under the full DuckDB differential
    // gate (engine-private approx_count_distinct never could); the
    // spec suite additionally bounds relative error vs the exact
    // distinct counts. See graft.operators.Hll.
    QueryEntry.sql(
      "q35_approx_distinct",
      s"""SELECT o.approx_orders, p.approx_parts
         |FROM (${Hll.oracleSql("lineitem", "l_orderkey", "approx_orders")}) o
         |CROSS JOIN (${Hll.oracleSql("lineitem", "l_partkey", "approx_parts")}) p""".stripMargin,
    ) { (s, dir) =>
      val li = Tables(s, dir).lineitem
      Hll.estimate(li, "l_orderkey", "approx_orders")
        .crossJoin(Hll.estimate(li, "l_partkey", "approx_parts"))
    },

    // Grouped HLL — the sketch as re-aggregable partial state: per
    // return-flag distinct-order estimates from (group, register)
    // cells. EngineFacadeSpec additionally proves mergeability (cell-wise MAX
    // of the per-group registers reproduces the global estimate
    // exactly), the property that makes sketches distributable.
    QueryEntry.sql(
      "q62_hll_by_group",
      Hll.groupedOracleSql("lineitem", "l_returnflag", "l_orderkey", "approx_orders"),
    ) { (s, dir) =>
      Hll.estimateByGroup(Tables(s, dir).lineitem, "l_returnflag", "l_orderkey",
        "approx_orders")
    },

    // Window-function breadth: lag deltas and bounded-frame moving
    // averages per user over event time (the session-analytics shape).
    // Frames are fully ordered (ts is ns-unique per user) so float
    // accumulation order is identical in both engines.
    QueryEntry.sql(
      "q44_window_breadth",
      """SELECT user_id, event_id,
        |       ROUND(value - LAG(value, 1, 0.0) OVER w, 6) AS delta,
        |       ROUND(AVG(value) OVER (w ROWS BETWEEN 3 PRECEDING AND CURRENT ROW), 6)
        |         AS mov_avg,
        |       ROW_NUMBER() OVER w AS rn
        |FROM events
        |WHERE user_id < 5
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts)
        |ORDER BY user_id, rn""".stripMargin,
    ) { (s, dir) =>
      val w = Window.partitionBy("user_id").orderBy("ts")
      val wf = w.rowsBetween(-3, Window.currentRow)
      Tables(s, dir).events
        .filter(col("user_id") < 5)
        .select(
          col("user_id"), col("event_id"),
          round(col("value") - lag(col("value"), 1, 0.0).over(w), 6).as("delta"),
          round(avg(col("value")).over(wf), 6).as("mov_avg"),
          row_number().over(w).as("rn"),
        )
        .orderBy("user_id", "rn")
    },

    // Window-frame breadth beyond q44: NTILE quartiles, FIRST_VALUE,
    // CUME_DIST, and a value-based RANGE frame (trailing 30 days of
    // order value). The RANGE order key is an integer day offset so
    // both engines frame on identical values; w1 is a total order
    // (price desc, then unique key) so NTILE/CUME_DIST are
    // deterministic; the frame sum accumulates in DECIMAL (exact,
    // order-free).
    QueryEntry.sql(
      "q47_window_frames",
      """SELECT o_orderkey,
        |       NTILE(4) OVER w1 AS qtile,
        |       FIRST_VALUE(o_orderkey) OVER w1 AS first_ok,
        |       ROUND(CUME_DIST() OVER w1, 6) AS cd,
        |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
        |              PARTITION BY o_orderstatus
        |              ORDER BY date_diff('day', DATE '1990-01-01', CAST(o_orderdate AS DATE))
        |              RANGE BETWEEN 30 PRECEDING AND CURRENT ROW) AS DOUBLE)
        |         AS rolling_30d
        |FROM orders WHERE o_custkey < 200
        |WINDOW w1 AS (PARTITION BY o_orderstatus
        |              ORDER BY o_totalprice DESC, o_orderkey)
        |ORDER BY o_orderkey""".stripMargin,
    ) { (s, dir) =>
      val w1 = Window.partitionBy("o_orderstatus")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      val w2 = Window.partitionBy("o_orderstatus").orderBy(col("day_off"))
        .rangeBetween(-30, Window.currentRow)
      Tables(s, dir).orders
        .filter(col("o_custkey") < 200)
        .withColumn("day_off",
          datediff(col("o_orderdate").cast(DateType), lit("1990-01-01").cast(DateType)))
        .select(
          col("o_orderkey"),
          ntile(4).over(w1).as("qtile"),
          first(col("o_orderkey")).over(w1).as("first_ok"),
          round(cume_dist().over(w1), 6).as("cd"),
          sum(col("o_totalprice").cast(DecimalType(18, 2))).over(w2)
            .cast(DoubleType).as("rolling_30d"),
        )
        .orderBy("o_orderkey")
    },

    // As-of join — an operator Spark lacks natively (guide's canonical
    // custom-operator case), composed Spark-first: union the two
    // keyed timelines, one pass of `last(_, ignoreNulls)` over a
    // (key)-partitioned event-time window. Scales as a single shuffle
    // on the join key + per-partition sort — the sort-merge shape —
    // with no unpartitioned global window. Semantics: for each event,
    // the latest order of the same key at-or-before the event's time;
    // ties on time take the largest o_orderkey (encoded in the sort
    // order). Key = user_id ≡ o_custkey % 100 (the fixtures share no
    // natural key; the mapping is deterministic in both engines).
    QueryEntry.sql(
      "q37_asof_join",
      """SELECT e.event_id,
        |       (SELECT MAX(o.o_orderkey)
        |        FROM orders o
        |        WHERE o.o_custkey % 100 = e.user_id
        |          AND o.o_orderdate <= e.ts
        |          AND o.o_orderdate = (SELECT MAX(o2.o_orderdate)
        |                               FROM orders o2
        |                               WHERE o2.o_custkey % 100 = e.user_id
        |                                 AND o2.o_orderdate <= e.ts)
        |       ) AS asof_orderkey
        |FROM events e
        |ORDER BY e.event_id""".stripMargin,
    ) { (s, dir) =>
      val t = Tables(s, dir)
      val orders = t.orders.select(
        (col("o_custkey") % 100).as("k"),
        // o_orderdate arrives as TIMESTAMP_NTZ; align with the events
        // timeline's TIMESTAMP (UTC session ⇒ value-identical).
        col("o_orderdate").cast(TimestampType).as("ts"),
        lit(0).as("side"),
        col("o_orderkey").as("ok"),
        lit(null).cast(LongType).as("event_id"),
      )
      val events = t.events.select(
        col("user_id").as("k"),
        col("ts"),
        lit(1).as("side"),
        lit(null).cast(LongType).as("ok"),
        col("event_id"),
      )
      // Orders sort before events at the same instant (side 0 < 1);
      // same-date orders ascend by key so `last` carries the max key.
      val w = Window.partitionBy("k")
        .orderBy(col("ts"), col("side"), col("ok").asc_nulls_last)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      orders.unionAll(events)
        .withColumn("asof_orderkey", last(col("ok"), ignoreNulls = true).over(w))
        .filter(col("side") === 1)
        .select(col("event_id"), col("asof_orderkey"))
        .orderBy("event_id")
    },

    // As-of join WITH TOLERANCE — the production variant (a staleness
    // bound: a match older than Δ is no match). Same single-shuffle
    // union/last plan as q37, additionally carrying the matched
    // timestamp so the tolerance check is one codegen filter on the
    // output; restricting candidates to [ts−Δ, ts] is equivalent to
    // post-filtering the unrestricted latest (every other candidate is
    // older still), so no second pass exists.
    QueryEntry.sql(
      "q153_asof_tolerance",
      """WITH m AS (
        |  SELECT e.event_id, e.ts, e.user_id, MAX(o.o_orderdate) AS md
        |  FROM events e LEFT JOIN orders o
        |    ON o.o_custkey % 100 = e.user_id AND o.o_orderdate <= e.ts
        |  GROUP BY 1, 2, 3
        |)
        |SELECT m.event_id,
        |       CASE WHEN m.md IS NOT NULL
        |                 AND date_diff('day', CAST(m.md AS TIMESTAMP), m.ts) <= 45
        |            THEN (SELECT MAX(o.o_orderkey) FROM orders o
        |                  WHERE o.o_custkey % 100 = m.user_id
        |                    AND o.o_orderdate = m.md)
        |            END AS asof_orderkey
        |FROM m ORDER BY m.event_id""".stripMargin,
    ) { (s, dir) =>
      val t = Tables(s, dir)
      val orders = t.orders.select(
        (col("o_custkey") % 100).as("k"),
        col("o_orderdate").cast(TimestampType).as("ts"),
        lit(0).as("side"),
        col("o_orderkey").as("ok"),
        lit(null).cast(LongType).as("event_id"),
      )
      val events = t.events.select(
        col("user_id").as("k"),
        col("ts"),
        lit(1).as("side"),
        lit(null).cast(LongType).as("ok"),
        col("event_id"),
      )
      val w = Window.partitionBy("k")
        .orderBy(col("ts"), col("side"), col("ok").asc_nulls_last)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      orders.unionAll(events)
        .withColumn("cand", last(col("ok"), ignoreNulls = true).over(w))
        .withColumn("cand_ts",
          last(when(col("side") === 0, col("ts")), ignoreNulls = true).over(w))
        .filter(col("side") === 1)
        .select(col("event_id"),
          when(datediff(col("ts").cast(DateType), col("cand_ts").cast(DateType)) <= 45,
            col("cand")).as("asof_orderkey"))
        .orderBy("event_id")
    },
  )
}
