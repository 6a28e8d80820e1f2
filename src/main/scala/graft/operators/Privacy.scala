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

    // q276 — t-closeness audit (Li et al. 2007), completing the
    // k-anonymity (q256) / l-diversity (q263) triad: an l-diverse
    // class can still leak when its sensitive-value DISTRIBUTION
    // diverges from the table's. QI = (event date, user-id bucket);
    // sensitive = event_type; distance = variational distance
    // ½·Σ_k |p_ck − q_k|, kept EXACT as the integer numerator
    // Σ_k |n_ck·N − N_k·n_c| over the common denominator 2·n_c·N, so
    // every threshold test (t ∈ {0.2, 0.3, 0.5}, carried as per-mille
    // ints) is pure integer comparison — no float ever gates a class.
    // Scale shape: one grouped count over (QI, sensitive), a ×|K|
    // constant fan-out against the broadcast global distribution, and
    // a 3-way constant fan-out over the CLASS frame — one keyed
    // shuffle at any scale.
    QueryEntry.sql(
      "q276_t_closeness",
      """WITH ek AS (
        |  SELECT strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d') AS d,
        |         user_id % 100 AS ub, event_type
        |  FROM events
        |), nck AS (
        |  SELECT d, ub, event_type, COUNT(*) AS n_ck FROM ek GROUP BY 1, 2, 3
        |), nc AS (
        |  SELECT d, ub, CAST(SUM(n_ck) AS BIGINT) AS n_c FROM nck GROUP BY 1, 2
        |), gk AS (SELECT event_type, COUNT(*) AS nk FROM ek GROUP BY 1),
        |tot AS (SELECT CAST(SUM(nk) AS BIGINT) AS nn FROM gk),
        |cls AS (
        |  SELECT nc.d, nc.ub, nc.n_c,
        |         CAST(SUM(ABS(CAST(COALESCE(nck.n_ck, 0) AS HUGEINT) * tot.nn
        |                      - CAST(gk.nk AS HUGEINT) * nc.n_c)) AS HUGEINT)
        |           AS num
        |  FROM nc CROSS JOIN gk CROSS JOIN tot
        |  LEFT JOIN nck ON nck.d = nc.d AND nck.ub = nc.ub
        |                AND nck.event_type = gk.event_type
        |  GROUP BY 1, 2, 3
        |), stats AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS total_classes,
        |         CAST(SUM(n_c) AS BIGINT) AS total_rows,
        |         MAX(ROUND(CAST(num AS DOUBLE)
        |                   / (2.0 * n_c * (SELECT nn FROM tot)), 6)) AS max_t
        |  FROM cls
        |)
        |SELECT t_permille, total_classes, total_rows,
        |       CAST(SUM(CASE WHEN 1000 * num
        |                       > 2 * t_permille * n_c * (SELECT nn FROM tot)
        |                 THEN 1 ELSE 0 END) AS BIGINT) AS violating_classes,
        |       CAST(SUM(CASE WHEN 1000 * num
        |                       > 2 * t_permille * n_c * (SELECT nn FROM tot)
        |                 THEN n_c ELSE 0 END) AS BIGINT) AS violating_rows,
        |       ROUND(SUM(CASE WHEN 1000 * num
        |                        > 2 * t_permille * n_c * (SELECT nn FROM tot)
        |                 THEN n_c ELSE 0 END) * 1.0 / total_rows, 6)
        |         AS violating_frac,
        |       max_t
        |FROM cls, stats, (SELECT unnest([200, 300, 500]) AS t_permille)
        |GROUP BY t_permille, total_classes, total_rows, max_t
        |ORDER BY t_permille""".stripMargin,
    ) { (s, dir) =>
      import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}
      val dec = DecimalType(38, 0)
      val ek = Tables(s, dir).events
        .select(date_format(col("ts"), "yyyy-MM-dd").as("d"),
          pmod(col("user_id"), lit(100)).as("ub"), col("event_type"))
      val nck = ek.groupBy("d", "ub", "event_type")
        .agg(count(lit(1)).as("n_ck"))
      val nc = nck.groupBy("d", "ub").agg(sum("n_ck").as("n_c"))
      val gk = ek.groupBy("event_type").agg(count(lit(1)).as("nk"))
      val tot = gk.agg(sum("nk").cast(LongType).as("nn"))
      val cls = nc.crossJoin(broadcast(gk)).crossJoin(broadcast(tot))
        .join(nck, Seq("d", "ub", "event_type"), "left")
        .groupBy("d", "ub", "n_c")
        .agg(sum(abs(coalesce(col("n_ck"), lit(0L)).cast(dec) * col("nn")
          - col("nk").cast(dec) * col("n_c"))).as("num"),
          first("nn").as("nn"))
      val stats = cls.agg(count(lit(1)).as("total_classes"),
        sum("n_c").cast(LongType).as("total_rows"),
        max(round(col("num").cast(DoubleType)
          / (lit(2.0) * col("n_c") * col("nn")), 6)).as("max_t"))
      val ts2 = s.range(1)
        .select(explode(typedlit(Seq(200, 300, 500))).as("t_permille"))
      val viol = col("num") * 1000 >
        col("t_permille").cast(dec) * 2 * col("n_c") * col("nn")
      cls.crossJoin(broadcast(stats)).crossJoin(broadcast(ts2))
        .groupBy("t_permille", "total_classes", "total_rows", "max_t")
        .agg(sum(when(viol, 1L).otherwise(0L)).as("violating_classes"),
          sum(when(viol, col("n_c")).otherwise(0L)).as("violating_rows"),
          round(sum(when(viol, col("n_c")).otherwise(0L)) * lit(1.0)
            / col("total_rows"), 6).as("violating_frac"))
        .select(col("t_permille"), col("total_classes"), col("total_rows"),
          col("violating_classes"), col("violating_rows"),
          col("violating_frac"), col("max_t"))
        .orderBy("t_permille")
    },

    // q279 — randomized-response release of the language histogram
    // (Warner 1965, the local-DP primitive): each document reports its
    // true lang with p = 3/4, else a deterministic pseudo-uniform lang
    // from the pinned SplitMix64 grid (both draws are exact integer
    // threshold tests on the 2^53 grid — the q241 Poisson precedent);
    // the debiased estimate t̂_k = (4·o_k·K − n)/(3K) inverts the
    // mechanism in closed form. The release row carries true count,
    // observed count, estimate, and |error| — the table a privacy
    // reviewer reads to judge utility at a given p. One per-doc map +
    // two grouped counts + a |K|-row join; one shuffle at any scale.
    QueryEntry.sql(
      "q279_randomized_response",
      s"""WITH dim AS (
         |  SELECT lang, row_number() OVER (ORDER BY lang) AS idx
         |  FROM (SELECT DISTINCT lang FROM documents)
         |), kf AS (SELECT COUNT(*) AS kk FROM dim),
         |rep AS (
         |  SELECT d.lang AS true_lang,
         |         CASE WHEN (${HllOps.splitmixSqlFor("d.doc_id")}) >> 11
         |                   < 6755399441055744
         |              THEN d.lang ELSE dim.lang END AS reported
         |  FROM documents d
         |  CROSS JOIN kf
         |  JOIN dim ON dim.idx = 1 +
         |    ((${HllOps.splitmixSqlFor("(d.doc_id + 1000000007)")}) >> 11) % kf.kk
         |), o AS (SELECT reported AS lang, COUNT(*) AS n_obs FROM rep GROUP BY 1),
         |tr AS (SELECT true_lang AS lang, COUNT(*) AS n_true FROM rep GROUP BY 1),
         |tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM rep)
         |SELECT lang, CAST(COALESCE(tr.n_true, 0) AS BIGINT) AS n_true,
         |       CAST(COALESCE(o.n_obs, 0) AS BIGINT) AS n_obs,
         |       ROUND((4.0 * COALESCE(o.n_obs, 0) * kk - n) / (3.0 * kk), 6)
         |         AS n_est,
         |       ROUND(ABS((4.0 * COALESCE(o.n_obs, 0) * kk - n) / (3.0 * kk)
         |                 - COALESCE(tr.n_true, 0)), 6) AS abs_err
         |FROM tr FULL JOIN o USING (lang), kf, tot
         |ORDER BY lang""".stripMargin,
    ) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      import org.apache.spark.sql.types.{DoubleType, LongType}
      val docs = Tables(s, dir).documents
      // model-sized frame (|langs| rows) — the unpartitioned window is
      // bounded by the language dimension, never by data
      val dim = docs.select("lang").distinct()
        .select(col("lang"), row_number().over(Window.orderBy("lang")).as("idx"))
      val kf = dim.agg(count(lit(1)).as("kk"))
      val keep = shiftrightunsigned(
        GraftFunctions.splitmix64(col("doc_id")), 11) < lit(6755399441055744L)
      val idx2 = pmod(shiftrightunsigned(
        GraftFunctions.splitmix64(col("doc_id") + lit(1000000007L)), 11),
        col("kk")) + 1
      val rep = docs.crossJoin(broadcast(kf))
        .join(broadcast(dim).withColumnRenamed("lang", "rl"),
          idx2 === col("idx"))
        .select(col("lang").as("true_lang"),
          when(keep, col("lang")).otherwise(col("rl")).as("reported"))
      val o = rep.groupBy(col("reported").as("lang"))
        .agg(count(lit(1)).as("n_obs"))
      val tr = rep.groupBy(col("true_lang").as("lang"))
        .agg(count(lit(1)).as("n_true"))
      val tot = rep.agg(count(lit(1)).as("n"))
      val est = (lit(4.0) * coalesce(col("n_obs"), lit(0L)) * col("kk")
        - col("n")) / (lit(3.0) * col("kk"))
      tr.join(o, Seq("lang"), "full")
        .crossJoin(broadcast(kf)).crossJoin(broadcast(tot))
        .select(col("lang"),
          coalesce(col("n_true"), lit(0L)).cast(LongType).as("n_true"),
          coalesce(col("n_obs"), lit(0L)).cast(LongType).as("n_obs"),
          round(est, 6).as("n_est"),
          round(abs(est - coalesce(col("n_true"), lit(0L))), 6).as("abs_err"))
        .orderBy("lang")
    },
  )
}
