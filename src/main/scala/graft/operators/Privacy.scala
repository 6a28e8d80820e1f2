package graft.operators

import graft.{QueryEntry, Tables}
import graft.functions.GraftFunctions
import graft.operators.{Hll => HllOps}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Differentially-private release of per-group counts — the report a
  * corpus owner publishes when the grouping itself is sensitive
  * (per-source contribution counts, per-language member counts):
  * ε-DP Laplace noise on each count. The noise here is PINNED, not
  * sampled at runtime: u ← SplitMix64(group fingerprint) as an EXACT
  * dyadic rational (53 high bits / 2⁵³ — no float rounding anywhere in
  * the uniform), then the inverse-CDF Laplace transform with the one
  * `ln` rounded once at 6 dp (the q173 determinism pattern). A pinned
  * per-release seed is exactly how a production DP pipeline makes a
  * release auditable/reproducible; re-keying the seed per release
  * period restores fresh noise. Sensitivity 1 (each doc contributes to
  * one group), scale b = 1/ε.
  *
  * Scale shape: one grouped count (map-side combined) + per-GROUP
  * constant-cost noise — nothing beyond the rollup touches data.
  */
object Privacy {

  /** Exact dyadic uniform in [0,1) from the pinned hash of a string
    * group key (md5 leading 60 bits → SplitMix64 → top 53 bits).
    */
  private def uniform(key: Column): Column =
    shiftrightunsigned(
      GraftFunctions.splitmix64(GraftFunctions.md5Long(key.cast("binary"))),
      11).cast("double") / lit(9007199254740992.0)

  /** Laplace(b) inverse-CDF noise on the pinned uniform: the single
    * transcendental is rounded ONCE at 6 dp.
    */
  private def laplaceNoise(u: Column, b: Double): Column = {
    val centered = u - lit(0.5)
    val lnTerm = round(log(lit(1.0) - lit(2.0) * abs(centered)), 6)
    when(centered >= 0, lit(-b) * lnTerm).otherwise(lit(b) * lnTerm)
  }

  /** ε-DP noised per-language doc counts (ε = 1). */
  def dpLangCounts(docs: org.apache.spark.sql.DataFrame, epsilon: Double = 1.0): org.apache.spark.sql.DataFrame =
    docs.groupBy("lang")
      .agg(count(lit(1)).as("n"))
      .select(col("lang"), col("n"),
        round(col("n") + laplaceNoise(uniform(col("lang")), 1.0 / epsilon), 6)
          .as("n_dp"))
      .orderBy("lang")

  val entries: Seq[QueryEntry] = Seq(
    // DuckDB replays the md5-60bit fingerprint, the SplitMix64 mirror,
    // the exact dyadic uniform, and the rounded inverse-CDF transform
    // — a single bit of drift anywhere in the noise chain moves n_dp.
    QueryEntry.sql(
      "q210_dp_counts",
      s"""WITH g AS (
         |  SELECT lang, COUNT(*) AS n FROM documents GROUP BY 1
         |), h AS (
         |  SELECT lang, n,
         |         ${HllOps.splitmixSqlFor(
              "CAST('0x' || substr(md5(lang), 1, 15) AS BIGINT)")} AS z
         |  FROM g
         |), u AS (
         |  SELECT lang, n,
         |         CAST(z >> 11 AS DOUBLE) / 9007199254740992.0 AS uu
         |  FROM h
         |)
         |SELECT lang, n,
         |       ROUND(n + CASE WHEN uu - 0.5 >= 0
         |                 THEN -1.0 * ROUND(ln(1.0 - 2.0 * abs(uu - 0.5)), 6)
         |                 ELSE 1.0 * ROUND(ln(1.0 - 2.0 * abs(uu - 0.5)), 6)
         |                 END, 6) AS n_dp
         |FROM u ORDER BY lang""".stripMargin,
    ) { (s, dir) =>
      dpLangCounts(Tables(s, dir).documents)
    },

    // q256 — k-anonymity audit over the events table: quasi-identifier
    // = (event_type, event date, user-id bucket). For each k in
    // {2, 5, 10}: how many equivalence classes violate k, how many
    // rows sit in violating classes (= rows a release would have to
    // suppress or generalize), and the violating-row fraction. One
    // grouped count over the QI (map-side combined), then a 3-way
    // constant fan-out over the CLASS frame — nothing beyond the
    // rollup touches data, so the audit is one-shuffle at any scale.
    QueryEntry.sql(
      "q256_k_anonymity",
      """WITH classes AS (
        |  SELECT event_type, strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d') AS d,
        |         user_id % 100 AS ub, COUNT(*) AS n
        |  FROM events GROUP BY 1, 2, 3
        |), tot AS (SELECT CAST(SUM(n) AS BIGINT) AS total_rows,
        |                  CAST(COUNT(*) AS BIGINT) AS total_classes
        |           FROM classes)
        |SELECT k, total_classes, total_rows,
        |       CAST(SUM(CASE WHEN n < k THEN 1 ELSE 0 END) AS BIGINT)
        |         AS violating_classes,
        |       CAST(SUM(CASE WHEN n < k THEN n ELSE 0 END) AS BIGINT)
        |         AS violating_rows,
        |       ROUND(SUM(CASE WHEN n < k THEN n ELSE 0 END) * 1.0
        |             / total_rows, 6) AS violating_frac
        |FROM classes, tot, (SELECT unnest([2, 5, 10]) AS k)
        |GROUP BY k, total_classes, total_rows ORDER BY k""".stripMargin,
    ) { (s, dir) =>
      val classes = Tables(s, dir).events
        .groupBy(col("event_type"),
          date_format(col("ts"), "yyyy-MM-dd").as("d"),
          pmod(col("user_id"), lit(100)).as("ub"))
        .agg(count(lit(1)).as("n"))
      val tot = classes.agg(sum("n").as("total_rows"),
        count(lit(1)).as("total_classes"))
      val ks = s.range(1).select(explode(typedlit(Seq(2, 5, 10))).as("k"))
      classes.crossJoin(broadcast(tot)).crossJoin(broadcast(ks))
        .groupBy("k", "total_classes", "total_rows")
        .agg(
          sum(when(col("n") < col("k"), 1L).otherwise(0L))
            .as("violating_classes"),
          sum(when(col("n") < col("k"), col("n")).otherwise(0L))
            .as("violating_rows"),
          round(sum(when(col("n") < col("k"), col("n")).otherwise(0L))
            * lit(1.0) / col("total_rows"), 6).as("violating_frac"))
        .select(col("k"), col("total_classes"), col("total_rows"),
          col("violating_classes"), col("violating_rows"),
          col("violating_frac"))
        .orderBy("k")
    },

    // q263 — (distinct) l-diversity audit, q256's sibling: k-anonymity
    // bounds re-identification but a k-anonymous class whose rows all
    // share ONE sensitive value still leaks it (homogeneity attack,
    // Machanavajjhala et al. 2007). QI = (event date, user-id bucket);
    // sensitive = event_type; for each l in {2, 3, 5}: classes with
    // fewer than l DISTINCT sensitive values, rows inside them, and
    // the violating-row fraction. Same scale shape as q256: one
    // grouped exact count-distinct over the QI (two-phase hash agg,
    // map-side combined), then a 3-way constant fan-out over the
    // CLASS frame — one shuffle at any scale.
    QueryEntry.sql(
      "q263_l_diversity",
      """WITH classes AS (
        |  SELECT strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d') AS d,
        |         user_id % 100 AS ub,
        |         COUNT(*) AS n, COUNT(DISTINCT event_type) AS ndist
        |  FROM events GROUP BY 1, 2
        |), tot AS (SELECT CAST(SUM(n) AS BIGINT) AS total_rows,
        |                  CAST(COUNT(*) AS BIGINT) AS total_classes
        |           FROM classes)
        |SELECT l, total_classes, total_rows,
        |       CAST(SUM(CASE WHEN ndist < l THEN 1 ELSE 0 END) AS BIGINT)
        |         AS violating_classes,
        |       CAST(SUM(CASE WHEN ndist < l THEN n ELSE 0 END) AS BIGINT)
        |         AS violating_rows,
        |       ROUND(SUM(CASE WHEN ndist < l THEN n ELSE 0 END) * 1.0
        |             / total_rows, 6) AS violating_frac
        |FROM classes, tot, (SELECT unnest([2, 3, 5]) AS l)
        |GROUP BY l, total_classes, total_rows ORDER BY l""".stripMargin,
    ) { (s, dir) =>
      val classes = Tables(s, dir).events
        .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("d"),
          pmod(col("user_id"), lit(100)).as("ub"))
        .agg(count(lit(1)).as("n"),
          countDistinct(col("event_type")).as("ndist"))
      val tot = classes.agg(sum("n").as("total_rows"),
        count(lit(1)).as("total_classes"))
      val ls = s.range(1).select(explode(typedlit(Seq(2, 3, 5))).as("l"))
      classes.crossJoin(broadcast(tot)).crossJoin(broadcast(ls))
        .groupBy("l", "total_classes", "total_rows")
        .agg(
          sum(when(col("ndist") < col("l"), 1L).otherwise(0L))
            .as("violating_classes"),
          sum(when(col("ndist") < col("l"), col("n")).otherwise(0L))
            .as("violating_rows"),
          round(sum(when(col("ndist") < col("l"), col("n")).otherwise(0L))
            * lit(1.0) / col("total_rows"), 6).as("violating_frac"))
        .select(col("l"), col("total_classes"), col("total_rows"),
          col("violating_classes"), col("violating_rows"),
          col("violating_frac"))
        .orderBy("l")
    },

    // q267 — DP release with BOUNDED per-user contribution: q210's
    // noise is only ε-DP if each user moves the count by at most the
    // claimed sensitivity, and raw event counts violate that (one
    // user can dominate a day). Clamp each (user, day) to C = 3
    // events — Σ min(c, 3), no row ranking needed — then add
    // Laplace(C/ε) noise on the clamped count (pinned-seed chain,
    // q210's md5→SplitMix64→inverse-CDF construction with b = 3).
    // The release row also carries the audit columns a reviewer
    // reads: raw count, clamped count, users actually clamped.
    // Scale shape: one (user, day) grouped count + one day rollup —
    // two keyed shuffles, per-day constant noise work.
    QueryEntry.sql(
      "q267_dp_bounded",
      s"""WITH pu AS (
         |  SELECT strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d') AS d,
         |         user_id, COUNT(*) AS c
         |  FROM events GROUP BY 1, 2
         |), g AS (
         |  SELECT d, CAST(SUM(c) AS BIGINT) AS n_raw,
         |         CAST(SUM(LEAST(c, 3)) AS BIGINT) AS n_clamped,
         |         CAST(SUM(CASE WHEN c > 3 THEN 1 ELSE 0 END) AS BIGINT)
         |           AS n_users_clamped
         |  FROM pu GROUP BY 1
         |), h AS (
         |  SELECT d, n_raw, n_clamped, n_users_clamped,
         |         ${HllOps.splitmixSqlFor(
              "CAST('0x' || substr(md5(d), 1, 15) AS BIGINT)")} AS z
         |  FROM g
         |), u AS (
         |  SELECT d, n_raw, n_clamped, n_users_clamped,
         |         CAST(z >> 11 AS DOUBLE) / 9007199254740992.0 AS uu
         |  FROM h
         |)
         |SELECT d, n_raw, n_clamped, n_users_clamped,
         |       ROUND(n_clamped + CASE WHEN uu - 0.5 >= 0
         |                 THEN -3.0 * ROUND(ln(1.0 - 2.0 * abs(uu - 0.5)), 6)
         |                 ELSE 3.0 * ROUND(ln(1.0 - 2.0 * abs(uu - 0.5)), 6)
         |                 END, 6) AS n_dp
         |FROM u ORDER BY d""".stripMargin,
    ) { (s, dir) =>
      Tables(s, dir).events
        .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("d"), col("user_id"))
        .agg(count(lit(1)).as("c"))
        .groupBy("d")
        .agg(sum("c").as("n_raw"),
          sum(least(col("c"), lit(3L))).as("n_clamped"),
          sum(when(col("c") > 3L, 1L).otherwise(0L)).as("n_users_clamped"))
        .select(col("d"), col("n_raw"), col("n_clamped"),
          col("n_users_clamped"),
          round(col("n_clamped") +
            laplaceNoise(uniform(col("d")), 3.0), 6).as("n_dp"))
        .orderBy("d")
    },
  )
}
