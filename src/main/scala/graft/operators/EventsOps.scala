package graft.operators

import graft.{QueryEntry, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Tier C events surface (SURVEY §2.4 row 6): the batch forms of the
  * streaming aggregations. `streaming.StreamingEvents` runs the same
  * tumbling-window aggregation as a watermarked Structured Streaming
  * query (`Trigger.AvailableNow`) and the test suite asserts
  * batch ≡ streaming equivalence.
  */
object EventsOps {

  /** 1 hour in microseconds — the q50 interval length AND bucket width
    * (bucket = interval length ⇒ every interval spans ≤ 2 buckets,
    * which is what makes the equi-join decomposition exact).
    */
  private val HourUs = 3600L * 1000000L

  /** From-scratch gaps-and-islands session reconstruction with the
    * session_window boundary convention (gap >= 30 min opens a session:
    * windows merge only when they OVERLAP, so an exact-gap event starts
    * a new one). Shared VERBATIM by q207 (default state store) and q301
    * (RocksDB) — one truth, two state backends.
    */
  private val sessionsOracleSql: String =
    """WITH e AS (
      |  SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS tus
      |  FROM events WHERE user_id < 20
      |), flagged AS (
      |  SELECT user_id, tus,
      |         CASE WHEN LAG(tus) OVER w IS NULL
      |                OR tus - LAG(tus) OVER w >= 1800000000 THEN 1
      |              ELSE 0 END AS new_s
      |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tus)
      |), sess AS (
      |  SELECT user_id, tus,
      |         CAST(SUM(new_s) OVER (PARTITION BY user_id ORDER BY tus
      |              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |              AS BIGINT) AS sid
      |  FROM flagged
      |)
      |SELECT user_id, CAST(MIN(tus) AS BIGINT) AS w_start,
      |       ROUND((MAX(tus) - MIN(tus)) / CAST(1000000.0 AS DOUBLE), 6)
      |         AS dur_sec,
      |       COUNT(*) AS n_events
      |FROM sess GROUP BY user_id, sid
      |ORDER BY user_id, w_start""".stripMargin

  /** q212/q326 shared oracle: the from-scratch range join the
    * stream-stream interval join must reproduce under either state
    * backend. */
  private val streamJoinOracleSql: String =
    """WITH e AS (
      |  SELECT user_id, event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS t
      |  FROM events WHERE user_id < 50
      |)
      |SELECT a.user_id AS user_id, a.event_id AS pid, b.event_id AS fid
      |FROM (SELECT * FROM e WHERE event_id % 10 = 0) a
      |JOIN e b ON b.user_id = a.user_id
      |        AND b.t > a.t AND b.t <= a.t + 86400000000
      |ORDER BY a.user_id, pid, fid""".stripMargin

  /** q215/q327 shared oracle: the from-scratch exact-integer per-user
    * fold the mapGroupsWithState stream must reproduce under either
    * state backend. */
  private val userStateOracleSql: String =
    """SELECT user_id, COUNT(*) AS cnt,
      |       ROUND(SUM(CAST(ROUND(value * 1000000.0, 0) AS BIGINT))
      |             / 1000000.0, 6) + 0.0 AS sum_v
      |FROM events GROUP BY 1 ORDER BY user_id""".stripMargin

  /** q311/q328 shared oracle: the 4-batch dropDuplicatesWithinWatermark
    * state machine (drops, non-refreshing duplicates, end-of-batch
    * eviction, re-emits) replayed from scratch — see the q311 entry
    * comment for the measured semantics it encodes. */
  private val dedupExpiryOracleSql: String =
    """WITH base AS MATERIALIZED (
      |  SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS tu FROM events
      |), bounds AS MATERIALIZED (
      |  SELECT MIN(tu) AS mn, MAX(tu) - MIN(tu) + 1 AS span FROM base
      |), r AS MATERIALIZED (
      |  SELECT user_id, LEAST(3, (tu - mn) * 4 // span) AS q,
      |         CAST(MIN(tu) AS BIGINT) AS tu, COUNT(*) AS n
      |  FROM base, bounds GROUP BY 1, 2
      |), wm AS MATERIALIZED (
      |  -- wm_k = watermark before batch k: ms-floored max event time
      |  -- of batches < k minus the 60 h delay (216000000 ms)
      |  SELECT k, (MAX(tu) // 1000 - 216000000) * 1000 AS w
      |  FROM (SELECT 1 AS k UNION ALL SELECT 2 UNION ALL SELECT 3) ks
      |  JOIN r ON r.q < ks.k GROUP BY k
      |), e0 AS MATERIALIZED (SELECT user_id, tu, n FROM r WHERE q = 0),
      |s0 AS MATERIALIZED (SELECT user_id, tu FROM e0),
      |e1 AS MATERIALIZED (
      |  SELECT user_id, tu, n FROM r
      |  WHERE q = 1 AND user_id NOT IN (SELECT user_id FROM s0)
      |), s1 AS MATERIALIZED (
      |  SELECT user_id, tu FROM (
      |    SELECT user_id, tu FROM s0 UNION ALL SELECT user_id, tu FROM e1) u
      |  WHERE tu + 216000000000 >= (SELECT w FROM wm WHERE k = 1)
      |), e2 AS MATERIALIZED (
      |  SELECT user_id, tu, n FROM r
      |  WHERE q = 2 AND user_id NOT IN (SELECT user_id FROM s1)
      |), s2 AS MATERIALIZED (
      |  SELECT user_id, tu FROM (
      |    SELECT user_id, tu FROM s1 UNION ALL SELECT user_id, tu FROM e2) u
      |  WHERE tu + 216000000000 >= (SELECT w FROM wm WHERE k = 2)
      |), e3 AS (
      |  SELECT user_id, tu, n FROM r
      |  WHERE q = 3 AND user_id NOT IN (SELECT user_id FROM s2)
      |)
      |SELECT user_id, tu, n FROM e0
      |UNION ALL SELECT user_id, tu, n FROM e1
      |UNION ALL SELECT user_id, tu, n FROM e2
      |UNION ALL SELECT user_id, tu, n FROM e3
      |ORDER BY user_id, tu""".stripMargin

  /** Interval (range) join decomposed into an equi-join — the operator
    * Spark would otherwise plan as a broadcast nested-loop. Probe
    * events (event_id % 10 = 0) open a (t, t+1h] follower window over
    * the same user's timeline. Buckets of width = interval length mean
    * every window overlaps exactly 2 buckets, so the probe side is
    * exploded ×2 and joined on (user, bucket) — a plain
    * shuffle-partitioned hash join — with the precise range as a
    * residual condition. Each matching pair is produced exactly once
    * (the follower's timestamp lies in ONE bucket). At 100 TB this
    * shuffles each side once on (user, bucket); no quadratic operator
    * anywhere (spec asserts no BroadcastNestedLoopJoin).
    */
  def intervalJoinPairs(events: DataFrame): DataFrame = {
    val e = events.select(col("user_id"), col("event_id"),
      unix_micros(col("ts")).as("tus"))
    val followers = e.select(
      col("user_id").as("fu"), col("event_id").as("fid"), col("tus").as("ft"))
      .withColumn("fbucket", expr(s"ft div $HourUs"))
    val probes = e.filter(col("event_id") % 10 === 0)
      .select(col("user_id").as("pu"), col("event_id").as("pid"),
        col("tus").as("pt"))
      .withColumn("pb", expr(s"pt div $HourUs"))
      .withColumn("pbucket", explode(array(col("pb"), col("pb") + 1)))
    probes.join(followers,
      col("pu") === col("fu") && col("pbucket") === col("fbucket") &&
        col("ft") > col("pt") && col("ft") <= col("pt") + HourUs)
  }

  /** Gaps-and-islands sessionization: per-key sessions split where the
    * event gap exceeds `gapMinutes`. Returns one row per (key,
    * session) with count and duration; session ids are dense per key
    * starting at 1. One shuffle on the key, two window passes — state
    * never leaves the key partition.
    */
  def sessionize(events: DataFrame, keyCol: String, tsCol: String,
      gapMinutes: Int): DataFrame = {
    val gapUs = gapMinutes * 60L * 1000000L
    val w = Window.partitionBy(keyCol).orderBy("tus")
    val wcum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val lagT = lag(col("tus"), 1).over(w)
    events
      .select(col(keyCol), unix_micros(col(tsCol)).as("tus"))
      .withColumn("new_s",
        when(lagT.isNull || col("tus") - lagT > gapUs, 1).otherwise(0))
      .withColumn("session_id", sum("new_s").over(wcum).cast(LongType))
      .groupBy(keyCol, "session_id")
      .agg(
        count(lit(1)).as("n_events"),
        round((max("tus") - min("tus")) / lit(1000000.0), 6).as("dur_sec"),
      )
  }

  /** Threshold-crossing alerts: one row per event whose running
    * per-user cumulative value crosses a multiple of `step`. The fold
    * is ordered by event_id, so the cumulative doubles are
    * bit-identical in any engine that folds the same order — which is
    * what lets the batch form sit under the gate and the
    * flatMapGroupsWithState streaming twin (which emits 0..n rows per
    * group from explicit state) be asserted equal in StreamingSpec.
    */
  def thresholdCrossings(events: DataFrame, step: Double): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("event_id")
    val wCum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // previous total = the running prefix EXCLUDING this row — the
    // same left fold the streaming twin keeps in state.
    val wPrev = w.rowsBetween(Window.unboundedPreceding, -1)
    // INTEGER cents, not a double running sum: a windowed double SUM
    // is ordered identically in both engines but not ACCUMULATED
    // identically (DuckDB's window aggregation uses segment-tree
    // partial sums, Spark a running fold), so low-bit drift can flip a
    // floor() exactly at a threshold multiple — measured at the ×10
    // blowup as a 3-row sf1 divergence. Cents via the q14 money rule
    // (CAST value AS DECIMAL(18,2), the cross-engine-proven rounding
    // on this column) make the fold exact, order-free, and the level
    // an integer division; values are non-negative so div ≡ floor.
    val stepCents = math.round(step * 100)
    events
      .select(col("user_id"), col("event_id"),
        (col("value").cast(DecimalType(18, 2)) * lit(100))
          .cast(LongType).as("c"))
      .withColumn("cum", sum("c").over(wCum))
      .withColumn("prev", coalesce(sum("c").over(wPrev), lit(0L)))
      .withColumn("level", expr(s"cum div $stepCents"))
      .withColumn("prev_level", expr(s"prev div $stepCents"))
      .filter(col("level") > col("prev_level"))
      .select(col("user_id"), col("event_id"), col("level"))
  }

  /** Per-group z-score anomaly flags: two-pass shape — a map-side-
    * combined stats pass (group count + exact DECIMAL sums of value and
    * value², so the mean/std are order-independent — a double SUM would
    * be shuffle-order-dependent and unoracleable), broadcast the tiny
    * stats frame back onto the stream, flag |z| > `cut`. At 100 TB the
    * stats pass reduces to one row per group before the broadcast; the
    * flagging pass is per-row codegen. A window over the group key
    * would instead funnel each group through one task — with 5 event
    * types that is 5 tasks total, the classic low-cardinality skew.
    *
    * Degenerate groups — one event, or a constant value — define no
    * z-score and are dropped (n > 1 AND std > 0), and the variance is
    * clamped at zero before the sqrt: `s2/n − mean²` can round a hair
    * negative for near-constant groups, where Spark would yield NaN
    * but an ANSI engine raises. Magnitude bound for the exact-stats
    * claim: SUM(value²) accumulates in DECIMAL(38,12) with 26 integer
    * digits of headroom, so the stats stay exact (no silent NULL
    * overflow) while n·value² < 10²⁶ — e.g. |value| ≤ 3·10⁶ across
    * 10¹² rows. Values beyond that need pre-centering or a wider
    * intermediate; the events fixture is orders of magnitude inside it.
    */
  def zScoreAnomalies(events: DataFrame, cut: Double): DataFrame = {
    val dec = col("value").cast(DecimalType(18, 6))
    val stats = events.groupBy("event_type").agg(
      count(lit(1)).as("n"),
      sum(dec).cast(DoubleType).as("s1"),
      sum(dec * dec).cast(DoubleType).as("s2"))
      .withColumn("mean", col("s1") / col("n"))
      .withColumn("std",
        sqrt(greatest(col("s2") / col("n") - col("mean") * col("mean"), lit(0.0))))
      .filter(col("n") > 1 && col("std") > 0.0)
    events.join(broadcast(stats), Seq("event_type"))
      .withColumn("z", (col("value") - col("mean")) / col("std"))
      .filter(abs(col("z")) > cut)
  }

  val entries: Seq[QueryEntry] = Seq(
    // Outlier detection: per-type mean/σ from exact decimal sums, then
    // per-row z-scores; anomalies (|z| > 2.5) rolled up per type. The
    // per-row double arithmetic (sub/div/abs) is IEEE-identical in both
    // engines because each z is a scalar function of exact aggregates.
    QueryEntry.sql(
      "q90_anomaly_zscore",
      """WITH stats AS (
        |  SELECT event_type, COUNT(*) AS n,
        |         CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS s1,
        |         CAST(SUM(CAST(value AS DECIMAL(18,6)) * CAST(value AS DECIMAL(18,6)))
        |              AS DOUBLE) AS s2
        |  FROM events GROUP BY event_type
        |), st AS (
        |  SELECT * FROM (
        |    SELECT event_type, n, s1 / n AS mean,
        |           sqrt(greatest(s2 / n - (s1 / n) * (s1 / n),
        |                CAST(0.0 AS DOUBLE))) AS std
        |    FROM stats
        |  ) WHERE n > 1 AND std > CAST(0.0 AS DOUBLE)
        |), z AS (
        |  SELECT e.event_type, (e.value - st.mean) / st.std AS z
        |  FROM events e JOIN st ON e.event_type = st.event_type
        |)
        |SELECT event_type, COUNT(*) AS n_anomalies,
        |       ROUND(MAX(ABS(z)), 6) AS max_abs_z
        |FROM z WHERE ABS(z) > CAST(2.5 AS DOUBLE)
        |GROUP BY event_type ORDER BY event_type""".stripMargin,
    ) { (s, dir) =>
      zScoreAnomalies(Tables(s, dir).events, cut = 2.5)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_anomalies"),
          round(max(abs(col("z"))), 6).as("max_abs_z"))
        .orderBy("event_type")
    },

    // Threshold crossings (batch form of the flatMapGroupsWithState
    // alert emitter): the per-user value stream alarms every time its
    // running total passes another multiple of 100.
    QueryEntry.sql(
      "q78_threshold_crossings",
      """WITH c AS (
        |  SELECT user_id, event_id,
        |         CAST(SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT))
        |              OVER (PARTITION BY user_id ORDER BY event_id
        |              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |              AS BIGINT) AS cum,
        |         CAST(COALESCE(SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100
        |                               AS BIGINT))
        |              OVER (PARTITION BY user_id ORDER BY event_id
        |              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |              AS BIGINT) AS prev
        |  FROM events
        |)
        |SELECT user_id, event_id, cum // 10000 AS level
        |FROM c
        |WHERE cum // 10000 > prev // 10000
        |ORDER BY user_id, event_id""".stripMargin,
    ) { (s, dir) =>
      thresholdCrossings(Tables(s, dir).events, step = 100.0)
        .orderBy("user_id", "event_id")
    },
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

    // Sliding windows (1 hour sliding by 15 minutes): every event
    // lands in exactly 4 overlapping windows. Window starts are
    // compared as epoch-microsecond integers so alignment is exact in
    // both engines (Spark floors against the epoch; the oracle spells
    // the same floor with integer division). The streaming twin is the
    // same groupBy under a watermark.
    QueryEntry.sql(
      "q61_sliding_windows",
      """WITH e AS (
        |  SELECT epoch_us(CAST(ts AS TIMESTAMP)) AS tu, event_type FROM events
        |), wins AS (
        |  SELECT event_type,
        |         (tu // 900000000) * 900000000 - k.k * 900000000 AS ws
        |  FROM e, (SELECT unnest(range(0, 4)) AS k) k
        |)
        |SELECT CAST(ws AS BIGINT) AS ws, event_type, COUNT(*) AS cnt
        |FROM wins GROUP BY 1, 2 ORDER BY ws, event_type""".stripMargin,
    ) { (s, dir) =>
      Tables(s, dir).events
        .groupBy(window(col("ts"), "1 hour", "15 minutes").as("win"),
          col("event_type"))
        .agg(count(lit(1)).as("cnt"))
        .select(unix_micros(col("win.start")).as("ws"), col("event_type"),
          col("cnt"))
        .orderBy("ws", "event_type")
    },

    // Sessionization (gaps-and-islands): a new session starts when the
    // per-user event gap exceeds 30 minutes. One shuffle on user_id,
    // two window passes (lag flag, running sum), then a grouped
    // rollup — the canonical distributed sessionization shape; state
    // never leaves the user partition, so it scales per-key. Gap math
    // is integer microseconds (exact in both engines); per-user
    // timestamps are unique so the order is total.
    QueryEntry.sql(
      "q49_sessionization",
      """WITH e AS (
        |  SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS tus
        |  FROM events WHERE user_id < 20
        |), flagged AS (
        |  SELECT user_id, tus,
        |         CASE WHEN LAG(tus) OVER w IS NULL
        |                OR tus - LAG(tus) OVER w > 1800000000 THEN 1
        |              ELSE 0 END AS new_s
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tus)
        |), sess AS (
        |  SELECT user_id, tus,
        |         CAST(SUM(new_s) OVER (PARTITION BY user_id ORDER BY tus
        |              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |           AS session_id
        |  FROM flagged
        |)
        |SELECT user_id, session_id, COUNT(*) AS n_events,
        |       ROUND((MAX(tus) - MIN(tus)) / CAST(1000000.0 AS DOUBLE), 6) AS dur_sec
        |FROM sess GROUP BY 1, 2 ORDER BY user_id, session_id""".stripMargin,
    ) { (s, dir) =>
      sessionize(Tables(s, dir).events.filter(col("user_id") < 20),
        "user_id", "ts", gapMinutes = 30)
        .orderBy("user_id", "session_id")
    },

    // Interval (range) join via bucket decomposition — see
    // intervalJoinPairs. The oracle states the semantics directly as a
    // non-equi range join; the engine plan is the ×2-exploded
    // equi-join, so a hash match proves the decomposition exact.
    QueryEntry.sql(
      "q50_range_join",
      """WITH e AS (
        |  SELECT user_id, event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS t
        |  FROM events
        |)
        |SELECT a.user_id, COUNT(*) AS n_pairs,
        |       CAST(MIN(b.event_id) AS BIGINT) AS min_fid,
        |       CAST(MAX(b.event_id) AS BIGINT) AS max_fid
        |FROM (SELECT * FROM e WHERE event_id % 10 = 0) a
        |JOIN e b ON b.user_id = a.user_id
        |        AND b.t > a.t AND b.t <= a.t + 3600000000
        |GROUP BY a.user_id ORDER BY a.user_id""".stripMargin,
    ) { (s, dir) =>
      intervalJoinPairs(Tables(s, dir).events)
        .groupBy(col("pu").as("user_id"))
        .agg(
          count(lit(1)).as("n_pairs"),
          min("fid").as("min_fid"),
          max("fid").as("max_fid"),
        )
        .orderBy("user_id")
    },

    // Time-series gap-fill + forward-fill: densify each user's hourly
    // timeline over their own [min, max] hour range (sequence +
    // explode — no driver-side range materialization), left-join the
    // real aggregates, and forward-fill the last observed hourly sum
    // with last_value(IGNORE NULLS). The canonical
    // feature-engineering resample; per-user state never leaves its
    // partition, so the shape holds at any user count.
    QueryEntry.sql(
      "q67_gapfill_ffill",
      """WITH e AS (
        |  SELECT user_id, date_trunc('hour', CAST(ts AS TIMESTAMP)) AS h, value
        |  FROM events WHERE user_id < 5
        |), agg AS (
        |  SELECT user_id, h, COUNT(*) AS c,
        |         CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sv
        |  FROM e GROUP BY 1, 2
        |), bounds AS (
        |  SELECT user_id, MIN(h) AS h0, MAX(h) AS h1 FROM e GROUP BY 1
        |), grid AS (
        |  SELECT user_id, unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS h
        |  FROM bounds
        |), j AS (
        |  SELECT g.user_id, g.h, COALESCE(a.c, 0) AS cnt, a.sv
        |  FROM grid g LEFT JOIN agg a ON a.user_id = g.user_id AND a.h = g.h
        |)
        |SELECT user_id, strftime(h, '%Y-%m-%d %H:%M') AS hour,
        |       CAST(cnt AS BIGINT) AS cnt,
        |       ROUND(COALESCE(
        |         LAST_VALUE(sv IGNORE NULLS) OVER (
        |           PARTITION BY user_id ORDER BY h
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0), 6)
        |         AS filled_sum
        |FROM j ORDER BY user_id, hour""".stripMargin,
    ) { (s, dir) =>
      val e = Tables(s, dir).events.filter(col("user_id") < 5)
        .select(col("user_id"), date_trunc("hour", col("ts")).as("h"),
          col("value"))
      val agg = e.groupBy("user_id", "h").agg(
        count(lit(1)).as("cnt"),
        sum(col("value").cast(DecimalType(18, 2))).cast(DoubleType).as("sv"))
      val grid = e.groupBy("user_id")
        .agg(min("h").as("h0"), max("h").as("h1"))
        .select(col("user_id"),
          explode(expr("sequence(h0, h1, interval 1 hour)")).as("h"))
      val w = Window.partitionBy("user_id").orderBy("h")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      grid.join(agg, Seq("user_id", "h"), "left")
        .withColumn("cnt", coalesce(col("cnt"), lit(0L)))
        .withColumn("filled_sum",
          round(coalesce(last(col("sv"), ignoreNulls = true).over(w), lit(0.0)), 6))
        .select(col("user_id"),
          date_format(col("h"), "yyyy-MM-dd HH:mm").as("hour"),
          col("cnt"), col("filled_sum"))
        .orderBy("user_id", "hour")
    },

    // Exactly-once restated over an at-least-once feed: the doubled
    // events stream deduplicated on event_id, then aggregated. The
    // batch form of streaming dropDuplicatesWithinWatermark
    // (StreamingSpec asserts batch ≡ stream on the same doubled
    // source); dedup key is the natural event id, so the state is one
    // row per key — the shape that bounds streaming state at scale.
    QueryEntry.sql(
      "q71_stream_dedup",
      """WITH d AS (
        |  SELECT event_id, event_type, value,
        |         row_number() OVER (PARTITION BY event_id
        |                            ORDER BY event_type, value) AS rn
        |  FROM events
        |)
        |SELECT event_type, COUNT(*) AS cnt,
        |       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM d WHERE rn = 1
        |GROUP BY event_type ORDER BY event_type""".stripMargin,
    ) { (s, dir) =>
      val e = Tables(s, dir).events.select("event_id", "event_type", "value")
      // deterministic survivor (min payload per key), NOT a bare
      // dropDuplicates("event_id"): if a key ever carried two distinct
      // payloads — exactly the at-least-once scenario — an arbitrary
      // pick could not be mirrored by any oracle
      val w = Window.partitionBy("event_id").orderBy("event_type", "value")
      e.unionAll(e)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .groupBy("event_type")
        .agg(
          count(lit(1)).as("cnt"),
          sum(col("value").cast(DecimalType(18, 2))).cast(DoubleType)
            .as("sum_value"),
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

    // Session windows EXECUTED BY A STREAM under the gate (q181 proved
    // append-mode dedup state, q184 complete-mode grouped sums; this
    // proves MERGING state — sessions opened in one micro-batch absorb
    // later batches' events). The oracle is the from-scratch
    // gaps-and-islands reconstruction with the session_window boundary
    // convention (gap >= 30 min opens a session: windows merge only
    // when they OVERLAP, so an exact-gap event starts a new one).
    QueryEntry.sql(
      "q207_stream_sessions",
      sessionsOracleSql,
    ) { (s, dir) =>
      graft.streaming.StreamingEvents.runSessionFeedToCompletion(s, dir)
    },

    // q301 — the q207 session stream under the ROCKSDB state-store
    // provider (the backend a 100 TB stream actually needs: keyed
    // state off-heap in embedded RocksDB, checkpointed per batch,
    // bounded only by disk — the default HDFSBackedStateStore holds
    // every key in executor memory). Same feed, same micro-batch
    // session merges, same from-scratch gaps-and-islands oracle; the
    // runner fails loud if RocksDB did not engage. A hash match
    // certifies lossless state round-trips through serialize → SST →
    // merge → read-back across all four batches.
    QueryEntry.sql(
      "q301_stream_sessions_rocksdb",
      sessionsOracleSql,
    ) { (s, dir) =>
      graft.streaming.StreamingEvents.runSessionFeedRocksDb(s, dir)
    },

    // q311 — dropDuplicatesWithinWatermark EXECUTED BY A STREAM under
    // the gate: the eighth streaming state family — dedup state with
    // WATERMARK-DRIVEN EXPIRY (q181's dropDuplicates holds every key
    // forever; this is the bounded-state form an unbounded stream
    // needs). Feed: one row per (user, time-quartile) — the
    // single-row-per-key-per-batch shape that makes the operator's
    // output exactly replayable (see dedupFeedStaged). The oracle
    // unrolls the 4-batch state machine the engine was MEASURED to
    // run (probed at sf0.001, then hash-validated at 0.001/0.01/0.1):
    //   - a stored key drops every later same-key row it sees;
    //   - duplicates do NOT refresh the stored event time;
    //   - eviction happens at the END of batch k, using the watermark
    //     COMPUTED FROM BATCHES < k (q245's ms-floored arithmetic), so
    //     an expired entry still drops the row in the batch where its
    //     eviction runs, and the key re-emits in the NEXT batch.
    // With a 60 h delay against ~7.5-day quartiles, drops and
    // re-emits both occur at every scale factor.
    QueryEntry.sql(
      "q311_stream_dedup_expiry",
      dedupExpiryOracleSql,
    ) { (s, dir) =>
      graft.streaming.StreamingEvents.runDedupWithinWatermark(s, dir)
    },

    // q328 — the q311 watermark-expiry dedup stream under the ROCKSDB
    // provider (r11 VERDICT item 3): the bounded-state dedup a 100 TB
    // stream runs needs its eviction arithmetic to survive the
    // RocksDB round-trip — state entries written as SSTs in batch k
    // must still expire at exactly the batch-(k)-end watermark. Same
    // feed, same 4-batch state-machine oracle, fail-loud engage check.
    QueryEntry.sql(
      "q328_stream_dedup_expiry_rocksdb",
      dedupExpiryOracleSql,
    ) { (s, dir) =>
      graft.streaming.StreamingEvents.runDedupWithinWatermark(s, dir,
        rocksDb = true)
    },

    // q245 — late-data accounting EXECUTED BY A STREAM under the gate:
    // the 5-file feed replays quartile 0 as its LAST file, so every
    // replayed row arrives weeks below the 90-minute watermark and
    // must be dropped, and append mode must emit exactly the windows
    // the final watermark finalized. The oracle recomputes both
    // effects from scratch: hourly counts over the ORIGINAL events
    // only (a leaked late row inflates a count), restricted to windows
    // whose end ≤ the final watermark ((max_ms − 90 min) in Spark's
    // millisecond watermark arithmetic — micros floor-divided, then
    // re-scaled). Either semantic drifting breaks the hash.
    QueryEntry.sql(
      "q245_stream_late_data",
      """WITH wm AS (
        |  SELECT ((MAX(epoch_us(CAST(ts AS TIMESTAMP))) // 1000) - 5400000)
        |           * 1000 AS wm_us
        |  FROM events
        |)
        |SELECT strftime(date_trunc('hour', CAST(ts AS TIMESTAMP)),
        |                '%Y-%m-%d %H:%M') AS w,
        |       event_type, COUNT(*) AS cnt
        |FROM events, wm
        |WHERE epoch_us(date_trunc('hour', CAST(ts AS TIMESTAMP)))
        |      + 3600000000 <= wm.wm_us
        |GROUP BY 1, 2, wm.wm_us
        |ORDER BY w, event_type""".stripMargin,
    ) { (s, dir) =>
      graft.streaming.StreamingEvents.runLateDataToCompletion(s, dir)
    },

    // Stream-STREAM interval join executed under the gate (q212): both
    // sides stream from the 4-file time feed, pairs buffer across
    // micro-batch boundaries; the oracle is the from-scratch range
    // join over all pairs (q50's semantics at row grain).
    QueryEntry.sql(
      "q212_stream_stream_join",
      streamJoinOracleSql,
    ) { (s, dir) =>
      graft.streaming.StreamingEvents.runStreamFeedJoinToCompletion(s, dir)
    },

    // q326 — the q212 stream-stream interval join under the ROCKSDB
    // provider (r11 VERDICT item 3): the join's FOUR buffer stores per
    // partition (left/right keyed rows + watermark indexes) are the
    // heaviest state shape in the engine — this certifies buffered
    // rows written in batch k still match probes arriving in batch
    // k+1 after the RocksDB round-trip. Same feed, same from-scratch
    // range-join oracle, fail-loud engage check.
    QueryEntry.sql(
      "q326_stream_join_rocksdb",
      streamJoinOracleSql,
    ) { (s, dir) =>
      graft.streaming.StreamingEvents.runStreamFeedJoinToCompletion(s, dir,
        rocksDb = true)
    },

    // Explicit mapGroupsWithState under the gate (q215): per-user
    // (count, micros-scaled sum) folded by user code across the
    // 4-file feed's batches — exact integer state, so the from-scratch
    // oracle must hash-match whatever path the batches took.
    QueryEntry.sql(
      "q215_stream_user_state",
      userStateOracleSql,
    ) { (s, dir) =>
      graft.streaming.StreamingEvents.runExactUserStateToCompletion(s, dir)
    },

    // q327 — the q215 explicit mapGroupsWithState fold under the
    // ROCKSDB provider (r11 VERDICT item 3): user-code state (the
    // encoded (count, micros-sum) tuple) serializes through RocksDB
    // instead of the heap map — this certifies the ENCODER round-trip,
    // which the built-in state families never exercise. Same feed,
    // same from-scratch oracle, fail-loud engage check.
    QueryEntry.sql(
      "q327_stream_user_state_rocksdb",
      userStateOracleSql,
    ) { (s, dir) =>
      graft.streaming.StreamingEvents.runExactUserStateToCompletion(s, dir,
        rocksDb = true)
    },

    // q341 — Spark 4 `transformWithState` under the gate: the ninth
    // streaming state family and the first with MULTIPLE named state
    // variables per key (ValueState "agg" + MapState "types", each its
    // own RocksDB column family — the provider transformWithState
    // requires). The ValueState carries q215's exact (count,
    // micros-scaled sum) integer fold; the MapState carries per-type
    // counts re-read THROUGH the store each batch to derive the
    // distinct-type count and the lexicographic-tie-break arg-max
    // type. The oracle recomputes all five outputs from scratch — a
    // value lost, re-applied, or read from the wrong column family at
    // any batch boundary breaks the hash.
    QueryEntry.sql(
      "q341_stream_tws_profile",
      """WITH per AS (
        |  SELECT user_id, event_type, COUNT(*) AS c
        |  FROM events GROUP BY 1, 2
        |), top AS (
        |  SELECT user_id, event_type, c,
        |         ROW_NUMBER() OVER (PARTITION BY user_id
        |                            ORDER BY c DESC, event_type) AS rn
        |  FROM per
        |), agg AS (
        |  SELECT user_id, COUNT(*) AS cnt,
        |         ROUND(SUM(CAST(ROUND(value * 1000000.0, 0) AS BIGINT))
        |               / 1000000.0, 6) + 0.0 AS sum_v,
        |         COUNT(DISTINCT event_type) AS n_types
        |  FROM events GROUP BY 1
        |)
        |SELECT a.user_id, a.cnt, a.sum_v, a.n_types,
        |       t.event_type AS top_type, t.c AS top_cnt
        |FROM agg a JOIN top t ON a.user_id = t.user_id AND t.rn = 1
        |ORDER BY a.user_id""".stripMargin,
    ) { (s, dir) =>
      graft.streaming.StreamingEvents.runTwsProfileToCompletion(s, dir)
    },

    // q342 — `transformWithState` EVENT-TIME TIMERS: exact 30-minute
    // gap sessionization where an idle user's open session is closed
    // by the WATERMARK (registerTimer/handleExpiredTimer), not by a
    // following event. Every non-final session is emitted exactly once
    // (event-close or timer-close — identical content either way); the
    // final session of a user appears iff its close timer
    // (end_ms + 30 min) is strictly below the final watermark
    // (max event ms − 90 min). The oracle replays exactly that rule
    // from scratch — a timer lost, fired against the wrong session, or
    // mis-compared to the watermark changes the emitted set.
    QueryEntry.sql(
      "q342_stream_tws_timers",
      """WITH e AS (
        |  SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS tus
        |  FROM events
        |), flagged AS (
        |  SELECT user_id, tus,
        |         CASE WHEN LAG(tus) OVER w IS NULL
        |                OR tus - LAG(tus) OVER w > 1800000000 THEN 1
        |              ELSE 0 END AS new_s
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tus)
        |), sess AS (
        |  SELECT user_id, tus,
        |         CAST(SUM(new_s) OVER (PARTITION BY user_id ORDER BY tus
        |              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |              AS BIGINT) AS sid
        |  FROM flagged
        |), agg AS (
        |  SELECT user_id, sid, MIN(tus) AS start_us, MAX(tus) AS end_us,
        |         COUNT(*) AS n_events
        |  FROM sess GROUP BY 1, 2
        |), agg2 AS (
        |  SELECT *, MAX(sid) OVER (PARTITION BY user_id) AS max_sid
        |  FROM agg
        |), wm AS (
        |  SELECT MAX(tus) // 1000 - 5400000 AS final_wm_ms FROM e
        |)
        |SELECT user_id, start_us, end_us, n_events
        |FROM agg2, wm
        |WHERE sid < max_sid
        |   OR end_us // 1000 + 1800000 < final_wm_ms
        |ORDER BY user_id, start_us""".stripMargin,
    ) { (s, dir) =>
      graft.streaming.StreamingEvents.runTwsSessionsToCompletion(s, dir)
    },

    // q343 — offline state-store inspection: a complete-mode streaming
    // aggregation runs to completion against a retained checkpoint,
    // then Spark 4's `statestore` BATCH source reads the operator
    // state back (one task per state partition — distributed
    // inspection, nothing through the driver) and the STATE ITSELF is
    // hash-certified against the from-scratch oracle. A lost state
    // row, a stale batch version, or an agg-buffer layout drift all
    // break the hash.
    QueryEntry.sql(
      "q343_stream_state_read",
      """SELECT user_id, COUNT(*) AS cnt,
        |       ROUND(SUM(CAST(ROUND(value * 1000000.0, 0) AS BIGINT))
        |             / 1000000.0, 6) + 0.0 AS sum_v,
        |       MIN(epoch_us(CAST(ts AS TIMESTAMP))) AS min_tu,
        |       MAX(epoch_us(CAST(ts AS TIMESTAMP))) AS max_tu
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    ) { (s, dir) =>
      graft.streaming.StreamingEvents.runStateReadToCompletion(s, dir)
    },

    // q344 — `transformWithState` MapState read back OFFLINE through
    // the statestore source (stateVarName → RocksDB column family,
    // one row per map entry): the store's contents must equal the
    // from-scratch per-(user, type) counts.
    QueryEntry.sql(
      "q344_stream_tws_map_read",
      """SELECT user_id, event_type, COUNT(*) AS c
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    ) { (s, dir) =>
      graft.streaming.StreamingEvents.runTwsMapStateRead(s, dir)
    },

    // q346 — state TIME TRAVEL: the q343 checkpoint read at
    // batchId = 1, i.e. the store's exact content after the second of
    // the four quartile micro-batches. The quartile frontier is
    // integer arithmetic on the global (min, max) event micros, so the
    // oracle recomputes the batch-1 aggregation from scratch; a
    // version off by one, a non-retained snapshot, or frontier drift
    // all break the hash.
    QueryEntry.sql(
      "q346_stream_state_travel",
      """WITH e AS (
        |  SELECT user_id, value, epoch_us(CAST(ts AS TIMESTAMP)) AS tus
        |  FROM events
        |), b AS (
        |  SELECT MIN(tus) AS mn, MAX(tus) - MIN(tus) + 1 AS span FROM e
        |), h AS (
        |  SELECT e.* FROM e, b WHERE tus < mn + (span * 2) // 4
        |)
        |SELECT user_id, COUNT(*) AS cnt,
        |       ROUND(SUM(CAST(ROUND(value * 1000000.0, 0) AS BIGINT))
        |             / 1000000.0, 6) + 0.0 AS sum_v,
        |       MIN(tus) AS min_tu, MAX(tus) AS max_tu
        |FROM h GROUP BY 1 ORDER BY 1""".stripMargin,
    ) { (s, dir) =>
      graft.streaming.StreamingEvents.runStateTimeTravelRead(s, dir)
    },

    // q345 — registered event-time TIMERS read back offline: exactly
    // the q342 suppressed-final set survives (fired timers are
    // consumed), each at (user's final event ms + 30 min). The oracle
    // needs no sessionization: the final session's end IS the user's
    // max event time.
    QueryEntry.sql(
      "q345_stream_timer_read",
      """WITH e AS (
        |  SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS tus
        |  FROM events
        |), last AS (
        |  SELECT user_id, MAX(tus) AS max_tu FROM e GROUP BY 1
        |), wm AS (
        |  SELECT MAX(tus) // 1000 - 5400000 AS w FROM e
        |)
        |SELECT user_id, max_tu // 1000 + 1800000 AS expiry_ms
        |FROM last, wm
        |WHERE max_tu // 1000 + 1800000 >= w
        |ORDER BY user_id""".stripMargin,
    ) { (s, dir) =>
      graft.streaming.StreamingEvents.runTwsTimerStateRead(s, dir)
    },

    // q216 — two-proportion z-test (the experiment readout): users
    // split A/B by id parity, outcome = error-event rate per arm.
    // All four counts are exact integers; p̂_A, p̂_B, the pooled p̂,
    // and z are pinned double arithmetic rounded at 6 dp — the
    // analyst-facing number a feature launch gates on, computed
    // entirely in one grouped pass (no per-user state).
    QueryEntry.sql(
      "q216_ab_ztest",
      """WITH arms AS (
        |  SELECT CASE WHEN user_id % 2 = 0 THEN 'A' ELSE 'B' END AS arm,
        |         CASE WHEN event_type = 'error' THEN 1 ELSE 0 END AS is_err
        |  FROM events
        |), agg AS (
        |  SELECT
        |    CAST(SUM(CASE WHEN arm = 'A' THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
        |    CAST(SUM(CASE WHEN arm = 'B' THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
        |    CAST(SUM(CASE WHEN arm = 'A' THEN is_err ELSE 0 END) AS BIGINT)
        |      AS err_a,
        |    CAST(SUM(CASE WHEN arm = 'B' THEN is_err ELSE 0 END) AS BIGINT)
        |      AS err_b
        |  FROM arms
        |)
        |SELECT n_a, n_b, err_a, err_b,
        |       ROUND(CAST(err_a AS DOUBLE) / n_a, 6) AS p_a,
        |       ROUND(CAST(err_b AS DOUBLE) / n_b, 6) AS p_b,
        |       ROUND((CAST(err_a AS DOUBLE) / n_a - CAST(err_b AS DOUBLE) / n_b)
        |             / sqrt((CAST(err_a + err_b AS DOUBLE) / (n_a + n_b))
        |                    * (1.0 - CAST(err_a + err_b AS DOUBLE) / (n_a + n_b))
        |                    * (1.0 / n_a + 1.0 / n_b)), 6) + 0.0 AS z
        |FROM agg""".stripMargin,
    ) { (s, dir) =>
      abZTest(Tables(s, dir).events)
    },

    // q227 — checkpoint restart (exactly-once across a stop/start):
    // two stream lifetimes share one checkpoint; the second must admit
    // exactly the files that arrived in between. The oracle recomputes
    // from scratch, so replayed or skipped files break the hash.
    QueryEntry.sql(
      "q227_stream_restart",
      """SELECT event_type, COUNT(*) AS n,
        |       ROUND(SUM(CAST(ROUND(value * 1000000.0, 0) AS BIGINT))
        |             / 1000000.0, 6) + 0.0 AS sum_v
        |FROM events GROUP BY 1 ORDER BY event_type""".stripMargin,
    ) { (s, dir) =>
      graft.streaming.StreamingEvents.runRestartIngestToCompletion(s, dir)
    },

    // q226 — interval UNION per user (activity coverage): each event
    // opens a 10-minute presence interval; overlaps merge, and the
    // report is merged-interval count + covered seconds — the
    // "actually active time" number sessionization (q49, gap-based)
    // does not give. Islands via the running max of interval ends
    // (windows partitioned by user — state never leaves the key
    // partition); all microsecond integers until one final division.
    QueryEntry.sql(
      "q226_interval_union",
      """WITH iv AS (
        |  SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS s,
        |         epoch_us(CAST(ts AS TIMESTAMP)) + 600000000 AS e
        |  FROM events WHERE user_id < 20
        |), flagged AS (
        |  SELECT user_id, s, e,
        |         CASE WHEN MAX(e) OVER (PARTITION BY user_id ORDER BY s, e
        |                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |                >= s THEN 0 ELSE 1 END AS new_i
        |  FROM iv
        |), isl AS (
        |  SELECT user_id, s, e,
        |         CAST(SUM(new_i) OVER (PARTITION BY user_id ORDER BY s, e
        |              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |              AS BIGINT) AS island
        |  FROM flagged
        |), spans AS (
        |  SELECT user_id, island, MIN(s) AS lo, MAX(e) AS hi
        |  FROM isl GROUP BY 1, 2
        |)
        |SELECT user_id, COUNT(*) AS n_intervals,
        |       ROUND(CAST(SUM(hi - lo) AS DOUBLE) / 1000000.0, 6)
        |         AS covered_sec
        |FROM spans GROUP BY 1 ORDER BY user_id""".stripMargin,
    ) { (s, dir) =>
      intervalUnion(Tables(s, dir).events.filter(col("user_id") < 20),
        lengthUs = 600000000L)
    },

    // q222 — RECURSIVE CTE executed BY SPARK (the SQL-surface
    // recursion Spark 4 added): every user's activity rolled up the
    // binary-tree reporting chain parent(u) = u DIV 2 — each node sees
    // its whole subtree's user count and event total. Spark's
    // recursion is UNION ALL-only (UNION-dedup unsupported, so cyclic
    // reachability cannot terminate — that regime stays on q180's
    // min-label propagation); an ACYCLIC ancestor chain terminates in
    // ⌈log₂ maxUser⌉ iterations. DuckDB replays the identical
    // recursion (its `//` spelling of integer division).
    QueryEntry.sql(
      "q222_recursive_rollup",
      """WITH RECURSIVE users AS (
        |  SELECT DISTINCT user_id AS u FROM events
        |), anc(u, a) AS (
        |  SELECT u, u FROM users
        |  UNION ALL
        |  SELECT u, a // 2 FROM anc WHERE a > 0
        |), uc AS (
        |  SELECT user_id AS u, COUNT(*) AS c FROM events GROUP BY 1
        |)
        |SELECT anc.a AS node, COUNT(*) AS n_desc,
        |       CAST(SUM(uc.c) AS BIGINT) AS events_rollup
        |FROM anc JOIN uc ON uc.u = anc.u
        |GROUP BY 1 ORDER BY node""".stripMargin,
    ) { (s, dir) =>
      Tables(s, dir).events.createOrReplaceTempView("graft_events_rec")
      s.sql("""WITH RECURSIVE users AS (
        |  SELECT DISTINCT user_id AS u FROM graft_events_rec
        |), anc(u, a) AS (
        |  SELECT u, u FROM users
        |  UNION ALL
        |  SELECT u, a DIV 2 FROM anc WHERE a > 0
        |), uc AS (
        |  SELECT user_id AS u, COUNT(*) AS c FROM graft_events_rec GROUP BY 1
        |)
        |SELECT anc.a AS node, COUNT(*) AS n_desc,
        |       CAST(SUM(uc.c) AS BIGINT) AS events_rollup
        |FROM anc JOIN uc ON uc.u = anc.u
        |GROUP BY 1 ORDER BY node""".stripMargin)
    },

    // q290 — linear multi-touch attribution (the marketing-analytics
    // rollup a conversion pipeline runs): each purchase's unit of
    // credit splits equally over the user's view/click touches in the
    // prior 7 days; per touch type: touches credited + total credit
    // (per-touch 1/k rounded once onto the DECIMAL(18,7) grid — sums
    // are order-free); the scalar columns carry purchases and the
    // unattributed count (purchases with no touch in window). Scale:
    // the purchase×touch join is USER-KEYED with a time-range filter —
    // per-user event counts are bounded, so fan-out is per-user
    // constant-ish, never events×events.
    QueryEntry.sql(
      "q290_attribution",
      """WITH p AS (
        |  SELECT event_id AS pid, user_id, CAST(ts AS TIMESTAMP) AS pts
        |  FROM events WHERE event_type = 'purchase'
        |), t AS (
        |  SELECT event_id AS tid, user_id, event_type,
        |         CAST(ts AS TIMESTAMP) AS tts
        |  FROM events WHERE event_type IN ('view', 'click')
        |), j AS (
        |  SELECT p.pid, t.event_type
        |  FROM p JOIN t ON t.user_id = p.user_id
        |    AND t.tts <= p.pts AND t.tts > p.pts - INTERVAL 7 DAY
        |), k AS (SELECT pid, COUNT(*) AS k FROM j GROUP BY 1),
        |cr AS (
        |  SELECT j.event_type,
        |         CAST(ROUND(1.0 / k, 7) AS DECIMAL(18,7)) AS c
        |  FROM j JOIN k USING (pid)
        |), np AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_purchases FROM p),
        |ua AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n_unattributed
        |  FROM p WHERE pid NOT IN (SELECT pid FROM k)
        |)
        |SELECT event_type AS touch_type,
        |       CAST(COUNT(*) AS BIGINT) AS n_touches,
        |       ROUND(CAST(SUM(c) AS DOUBLE), 6) AS total_credit,
        |       n_purchases, n_unattributed
        |FROM cr, np, ua
        |GROUP BY 1, n_purchases, n_unattributed
        |ORDER BY touch_type""".stripMargin,
    ) { (s, dir) =>
      val ev = Tables(s, dir).events
      val p = ev.filter(col("event_type") === "purchase")
        .select(col("event_id").as("pid"), col("user_id"),
          col("ts").as("pts"))
      val t = ev.filter(col("event_type").isin("view", "click"))
        .select(col("event_id").as("tid"), col("user_id"),
          col("event_type"), col("ts").as("tts"))
      val j = p.join(t, Seq("user_id"))
        .filter(col("tts") <= col("pts") &&
          col("tts") > col("pts") - expr("INTERVAL 7 DAY"))
        .select(col("pid"), col("event_type"))
      val k = j.groupBy("pid").agg(count(lit(1)).as("k"))
      val cr = j.join(k, "pid")
        .select(col("event_type"),
          round(lit(1.0) / col("k"), 7).cast(DecimalType(18, 7)).as("c"))
      val np = p.agg(count(lit(1)).cast(LongType).as("n_purchases"))
      val ua = p.join(k, Seq("pid"), "left_anti")
        .agg(count(lit(1)).cast(LongType).as("n_unattributed"))
      cr.groupBy(col("event_type").as("touch_type"))
        .agg(count(lit(1)).as("n_touches"),
          round(sum("c").cast(DoubleType), 6).as("total_credit"))
        .crossJoin(broadcast(np)).crossJoin(broadcast(ua))
        .select(col("touch_type"), col("n_touches"), col("total_credit"),
          col("n_purchases"), col("n_unattributed"))
        .orderBy("touch_type")
    },

    // q295 — expected best-of-n reward (the BoN sampling readout an
    // RLHF data team computes from the empirical reward distribution):
    // per event type, E[max of n i.i.d. draws] for n ∈ {1, 2, 4, 8}
    // by exact order statistics — Σ_v v·(F(v)ⁿ − F(v⁻)ⁿ) over the
    // 2dp-gridded value histogram. F = k/N is an exact rational; the
    // powers are built by REPEATED SQUARING (f², f⁴ = f²·f², f⁸) so
    // both engines run identical IEEE multiplications — never pow(),
    // whose libm rounding is not contractually identical. Per-value
    // contributions round once onto the DECIMAL(18,7) grid. Scale: one
    // grouped histogram + a cumulative over the per-type VALUE GRID
    // (2dp-bounded), ×4 constant fan-out.
    QueryEntry.sql(
      "q295_best_of_n",
      """WITH v AS (
        |  SELECT event_type,
        |         CAST(ROUND(value * 100.0, 0) AS BIGINT) AS v2
        |  FROM events WHERE value IS NOT NULL
        |), hist AS (
        |  SELECT event_type, v2, COUNT(*) AS c FROM v GROUP BY 1, 2
        |), cum AS (
        |  SELECT event_type, v2, c,
        |         SUM(c) OVER (PARTITION BY event_type ORDER BY v2) AS k,
        |         SUM(c) OVER (PARTITION BY event_type) AS nt
        |  FROM hist
        |), f AS (
        |  SELECT event_type, v2, nt,
        |         CAST(k AS DOUBLE) / nt AS fc,
        |         CAST(k - c AS DOUBLE) / nt AS fp
        |  FROM cum
        |), powed AS (
        |  SELECT event_type, v2, nt, n,
        |         CASE n WHEN 1 THEN fc WHEN 2 THEN fc * fc
        |                WHEN 4 THEN (fc * fc) * (fc * fc)
        |                ELSE ((fc * fc) * (fc * fc)) * ((fc * fc) * (fc * fc))
        |         END AS fcn,
        |         CASE n WHEN 1 THEN fp WHEN 2 THEN fp * fp
        |                WHEN 4 THEN (fp * fp) * (fp * fp)
        |                ELSE ((fp * fp) * (fp * fp)) * ((fp * fp) * (fp * fp))
        |         END AS fpn
        |  FROM f, (SELECT unnest([1, 2, 4, 8]) AS n)
        |)
        |SELECT event_type, n, CAST(MAX(nt) AS BIGINT) AS n_events,
        |       ROUND(CAST(SUM(CAST(ROUND((v2 / 100.0) * (fcn - fpn), 7)
        |                          AS DECIMAL(18,7))) AS DOUBLE), 6) AS e_max
        |FROM powed GROUP BY 1, 2 ORDER BY event_type, n""".stripMargin,
    ) { (s, dir) =>
      val v = Tables(s, dir).events
        .filter(col("value").isNotNull)
        .select(col("event_type"),
          round(col("value") * 100.0, 0).cast(LongType).as("v2"))
      val hist = v.groupBy("event_type", "v2").agg(count(lit(1)).as("c"))
      val wT = Window.partitionBy("event_type")
      val cum = hist.select(col("event_type"), col("v2"), col("c"),
        sum("c").over(wT.orderBy("v2")).as("k"),
        sum("c").over(wT).as("nt"))
      val fc = col("k").cast(DoubleType) / col("nt")
      val fp = (col("k") - col("c")).cast(DoubleType) / col("nt")
      val f = cum.select(col("event_type"), col("v2"), col("nt"),
        fc.as("fc"), fp.as("fp"))
      val ns = s.range(1).select(explode(typedlit(Seq(1, 2, 4, 8))).as("n"))
      def p(x: org.apache.spark.sql.Column) = {
        val x2 = x * x
        when(col("n") === 1, x).when(col("n") === 2, x2)
          .when(col("n") === 4, x2 * x2)
          .otherwise((x2 * x2) * (x2 * x2))
      }
      f.crossJoin(broadcast(ns))
        .select(col("event_type"), col("n"), col("nt"),
          round((col("v2") / lit(100.0)) * (p(col("fc")) - p(col("fp"))), 7)
            .cast(DecimalType(18, 7)).as("contrib"))
        .groupBy("event_type", "n")
        .agg(max("nt").cast(LongType).as("n_events"),
          round(sum("contrib").cast(DoubleType), 6).as("e_max"))
        .orderBy("event_type", "n")
    },
  )

  /** Per-user union of fixed-length presence intervals (q226):
    * merged-interval count and covered time from the running-max-end
    * island construction. Windows are user-partitioned; everything is
    * integer microseconds until the single output division.
    */
  def intervalUnion(events: DataFrame, lengthUs: Long): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("s", "e")
    val wPrev = w.rowsBetween(Window.unboundedPreceding, -1)
    val wCum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      .select(col("user_id"), unix_micros(col("ts")).as("s"),
        (unix_micros(col("ts")) + lengthUs).as("e"))
      .withColumn("new_i",
        when(max("e").over(wPrev) >= col("s"), 0).otherwise(1))
      .withColumn("island", sum("new_i").over(wCum).cast(LongType))
      .groupBy("user_id", "island")
      .agg(min("s").as("lo"), max("e").as("hi"))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_intervals"),
        round(sum(col("hi") - col("lo")).cast("double") / lit(1000000.0), 6)
          .as("covered_sec"))
      .orderBy("user_id")
  }

  /** Two-proportion z-test over id-parity arms (q216). */
  def abZTest(events: DataFrame): DataFrame = {
    val isA = (col("user_id") % 2 === 0).cast("long")
    val isErr = (col("event_type") === "error").cast("long")
    val agg = events.agg(
      sum(isA).as("n_a"),
      sum(lit(1L) - isA).as("n_b"),
      sum(isA * isErr).as("err_a"),
      sum((lit(1L) - isA) * isErr).as("err_b"))
    val pa = col("err_a").cast("double") / col("n_a")
    val pb = col("err_b").cast("double") / col("n_b")
    val pp = (col("err_a") + col("err_b")).cast("double") /
      (col("n_a") + col("n_b"))
    agg.select(col("n_a"), col("n_b"), col("err_a"), col("err_b"),
      round(pa, 6).as("p_a"), round(pb, 6).as("p_b"),
      (round((pa - pb) /
        sqrt(pp * (lit(1.0) - pp) *
          (lit(1.0) / col("n_a") + lit(1.0) / col("n_b"))), 6) + lit(0.0))
        .as("z"))
  }
}
