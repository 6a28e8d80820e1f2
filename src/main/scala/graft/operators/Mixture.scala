package graft.operators

import graft.{QueryEntry, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.DataFrame

/** Temperature-based mixture sampling across corpus strata — the
  * standard multi-source rebalancing step of LLM training-data
  * pipelines (sampled size per stratum ∝ n^α, α < 1 upsampling rare
  * strata relative to dominant ones; cf. the multilingual sampling
  * rule of Conneau & Lample, NeurIPS'19).
  *
  * Determinism discipline: the usual formulation normalizes by
  * Σ_s n_s^α — a cross-row DOUBLE sum whose accumulation order an
  * engine does not pin, so a differential oracle could flip on an ulp.
  * This operator instead uses the UNNORMALIZED per-stratum rate
  *   rate_s = C / sqrt(n_s)   (α = 1/2 ⇒ sampled_s ∝ sqrt(n_s)),
  * which needs only IEEE-exact operations (sqrt, one multiply, one
  * divide, floor) — bit-identical in any IEEE engine, no float sum
  * anywhere. Membership is the house hash rule (md5-derived 60-bit
  * key bucket, q41's): a pure function of the row key, rerunnable at
  * any scale and oracle-able.
  *
  * Scale shape: one tiny groupBy for stratum sizes, broadcast back,
  * one codegen filter, one grouped count — two scans of the corpus (or
  * one plus a reused cache), state bounded by the stratum count.
  */
object Mixture {

  private val Buckets = 1048576L // 2^20 hash space for membership

  /** Per-stratum sampling report: size, integer hash threshold,
    * sampled count, effective rate.
    */
  def temperatureSample(df: DataFrame, stratumCol: String, c: Double): DataFrame = {
    val sizes = df.groupBy(col(stratumCol)).agg(count(lit(1)).as("n_docs"))
      .withColumn("threshold",
        least(
          floor(lit(c * Buckets.toDouble) / sqrt(col("n_docs").cast(DoubleType)))
            .cast(LongType),
          lit(Buckets)))
    val bucket =
      graft.functions.GraftFunctions.md5Long(
        col("doc_id").cast(StringType).cast(BinaryType)) % Buckets
    df.join(broadcast(sizes), stratumCol)
      .select(col(stratumCol), col("n_docs"), col("threshold"),
        (bucket < col("threshold")).as("in_sample"))
      .groupBy(col(stratumCol), col("n_docs"), col("threshold"))
      .agg(sum(when(col("in_sample"), 1L).otherwise(0L)).as("n_sampled"))
      .select(col(stratumCol), col("n_docs"), col("threshold"), col("n_sampled"),
        round(col("n_sampled").cast(DoubleType) / col("n_docs").cast(DoubleType), 6)
          .as("eff_rate"))
      .orderBy(stratumCol)
  }

  def entries: Seq[QueryEntry] = Seq(
    // q137 — sqrt-temperature sampling of documents by language
    // (C=6: at sf0.01 'en' keeps ~41%, the rare languages ~70% — the
    // rebalancing visibly favors the tail, which is the point).
    QueryEntry.sql(
      "q137_mixture_sample",
      """WITH sizes AS (
        |  SELECT lang, COUNT(*) AS n_docs,
        |         LEAST(CAST(FLOOR(6291456.0 / sqrt(CAST(COUNT(*) AS DOUBLE))) AS BIGINT),
        |               1048576) AS threshold
        |  FROM documents GROUP BY lang
        |), hashed AS (
        |  SELECT d.lang, s.n_docs, s.threshold,
        |         CAST('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 15) AS BIGINT)
        |           % 1048576 AS bucket
        |  FROM documents d JOIN sizes s ON d.lang = s.lang
        |)
        |SELECT lang, CAST(n_docs AS BIGINT) AS n_docs, threshold,
        |       CAST(SUM(CASE WHEN bucket < threshold THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled,
        |       ROUND(CAST(SUM(CASE WHEN bucket < threshold THEN 1 ELSE 0 END) AS DOUBLE)
        |             / CAST(n_docs AS DOUBLE), 6) AS eff_rate
        |FROM hashed GROUP BY lang, n_docs, threshold ORDER BY lang""".stripMargin,
    ) { (s, dir) =>
      temperatureSample(Tables(s, dir).documentsRebalanced, "lang", c = 6.0)
    },

    // q211 — deterministic weighted sampling without replacement
    // (Efraimidis–Spirakis A-ES): key = ln(u)/w with u an EXACT dyadic
    // uniform from the pinned SplitMix64 of doc_id (53 high bits /
    // 2⁵³) and the one ln rounded at 6 dp — so "take the top-k keys"
    // is a reproducible, engine-independent weighted sample, where
    // ORDER BY rand() LIMIT k is neither reproducible nor weighted.
    // Per-language top-5 by n_chars weight through the k-bounded heap
    // (≤k rows per group per map task — no global sort, no window over
    // the corpus). DuckDB replays hash, uniform, rounded ln, division,
    // and the (key DESC, doc_id) rank.
    QueryEntry.sql(
      "q211_weighted_sample",
      s"""WITH u AS (
         |  SELECT lang, doc_id, n_chars,
         |         CAST(${graft.operators.Hll.splitmixSqlFor("doc_id")} >> 11
         |              AS DOUBLE) / 9007199254740992.0 AS uu
         |  FROM documents
         |), keyed AS (
         |  SELECT lang, doc_id,
         |         ROUND(ln(uu), 6) / n_chars AS k
         |  FROM u
         |), ranked AS (
         |  SELECT lang, doc_id, k,
         |         CAST(row_number() OVER (PARTITION BY lang
         |                ORDER BY k DESC, doc_id) AS INT) AS rank
         |  FROM keyed
         |)
         |SELECT lang, rank, doc_id, ROUND(k, 6) + 0.0 AS skey
         |FROM ranked WHERE rank <= 5 ORDER BY lang, rank""".stripMargin,
    ) { (s, dir) =>
      weightedSample(Tables(s, dir).documentsRebalanced, k = 5)
    },

    // q229 — water-filling quota: max-min-fair source allocation under
    // a 60% budget (small feeds keep everything, big feeds share a
    // common cap; Σ alloc = B exactly). The oracle re-solves the
    // boundary search and the remainder hand-out on its own
    // |sources|-row frame — an off-by-one anywhere in the integer
    // solve breaks the per-source allocations.
    QueryEntry.sql(
      "q229_water_fill",
      """WITH counts AS (
        |  SELECT source, COUNT(*) AS n FROM documents GROUP BY 1
        |), ranked AS (
        |  SELECT source, n,
        |         row_number() OVER (ORDER BY n, source) AS idx,
        |         COALESCE(SUM(n) OVER (ORDER BY n, source
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |           AS pre
        |  FROM counts
        |), tot AS (
        |  SELECT CAST(SUM(n) AS BIGINT) AS nn, COUNT(*) AS s FROM counts
        |), cand AS (
        |  SELECT r.source, r.n, r.idx, r.pre,
        |         (t.nn * 3) // 5 AS b, t.s - r.idx + 1 AS m
        |  FROM ranked r CROSS JOIN tot t
        |), cand2 AS (
        |  SELECT *, (b - pre) // m AS theta, (b - pre) % m AS rem
        |  FROM cand
        |), boundary AS (
        |  SELECT MIN(idx) AS bidx, arg_min(theta, idx) AS btheta,
        |         arg_min(rem, idx) AS brem
        |  FROM cand2 WHERE theta < n
        |)
        |SELECT c.source, c.n AS n_docs,
        |       CAST(CASE WHEN b.bidx IS NULL OR c.idx < b.bidx THEN c.n
        |            ELSE b.btheta +
        |                 CASE WHEN c.idx - b.bidx < b.brem THEN 1 ELSE 0 END
        |            END AS BIGINT) AS alloc
        |FROM cand2 c CROSS JOIN boundary b
        |ORDER BY c.source""".stripMargin,
    ) { (s, dir) =>
      waterFill(Tables(s, dir).documents)
    },

    // q333 — temperature-scaled mixture WEIGHTS (τ = 0.7): the per-
    // source sampling-weight table a trainer consumes (w_s ∝ share_s^τ,
    // the multilingual rebalancing rule), reported as token volume, raw
    // share, reweighted share, and boost = temp_share/share (the
    // effective-epochs multiplier — >1 upsamples the tail). Where q137
    // SAMPLES membership at a sqrt rate, this emits the weights
    // themselves. Determinism: share^τ runs as exp(τ·ln) with the ln
    // rounded once at 6dp DECIMAL (the q251 transcendental rule), and —
    // unlike the float Σn^α normalization q137's note rejects — the
    // normalizer here is an EXACT decimal sum of the 6dp-rounded
    // weights, so no cross-row double accumulation exists.
    // Scale: one map-side-combined grouped token sum over documents;
    // everything after runs on the model-sized source frame with two
    // broadcast scalar carries.
    QueryEntry.sql(
      "q333_temperature_weights",
      """WITH t AS (
        |  SELECT source,
        |         SUM(CAST(len(regexp_split_to_array(trim(lower(text)), '\s+'))
        |                  AS BIGINT)) AS n_tokens
        |  FROM documents GROUP BY source
        |), tt AS (SELECT SUM(n_tokens) AS tt FROM t),
        |sh AS (
        |  SELECT source, n_tokens,
        |         ROUND(n_tokens * 1.0 / tt, 6) AS share
        |  FROM t, tt
        |), a AS (
        |  SELECT source, n_tokens, share,
        |         CAST(ROUND(exp(CAST(CAST(ROUND(ln(share), 6) AS DECIMAL(18,6))
        |                             AS DOUBLE) * 0.7), 6)
        |              AS DECIMAL(18,6)) AS a
        |  FROM sh
        |), ws AS (SELECT SUM(a) AS wsum FROM a)
        |SELECT source, CAST(n_tokens AS BIGINT) AS n_tokens, share,
        |       ROUND(CAST(a AS DOUBLE) / CAST(wsum AS DOUBLE), 6) AS temp_share,
        |       ROUND(ROUND(CAST(a AS DOUBLE) / CAST(wsum AS DOUBLE), 6)
        |             / share, 6) AS boost
        |FROM a, ws ORDER BY source""".stripMargin,
    ) { (s, dir) =>
      temperatureWeights(Tables(s, dir).documentsRebalanced, tau = 0.7)
    },
  )

  /** Per-source τ-temperature mixture weights over whitespace-token
    * volume — see the q333 entry for the determinism contract.
    */
  def temperatureWeights(docs: DataFrame, tau: Double): DataFrame = {
    val dec6 = DataTypes.createDecimalType(18, 6)
    val per = docs
      .select(col("source"),
        size(split(trim(lower(col("text"))), "\\s+")).cast(LongType).as("nt"))
      .groupBy("source").agg(sum(col("nt")).as("n_tokens"))
    val tot = per.agg(sum(col("n_tokens")).as("tt"))
    val sh = per.crossJoin(broadcast(tot))
      .select(col("source"), col("n_tokens"),
        round(col("n_tokens") * lit(1.0) / col("tt"), 6).as("share"))
    val a = sh.withColumn("a",
      round(exp(round(log(col("share")), 6).cast(dec6).cast(DoubleType)
        * lit(tau)), 6).cast(dec6))
    val ws = a.agg(sum(col("a")).as("wsum"))
    val tempShare = round(col("a").cast(DoubleType)
      / col("wsum").cast(DoubleType), 6)
    a.crossJoin(broadcast(ws))
      .select(col("source"), col("n_tokens"), col("share"),
        tempShare.as("temp_share"),
        round(tempShare / col("share"), 6).as("boost"))
      .orderBy("source")
  }

  /** Water-filling quota allocation (q229): given per-source doc
    * counts and a total budget B, find the cap θ with
    * Σ min(n_s, θ) = B — small feeds keep everything, large feeds are
    * capped at a COMMON level (the max-min-fair allocation a balanced
    * training mixture uses; a proportional cut would shrink small
    * feeds that are already under-represented). Exact integer solve
    * on the |sources|-row counts frame: for each candidate boundary
    * idx (sources sorted by (n, source)), θ = (B − prefix)/m floor
    * with the mod-m remainder handed to the first `rem` capped
    * sources in sort order; the boundary is the FIRST idx whose θ
    * falls below its own count. Σ alloc = B exactly, by construction.
    */
  def waterFill(docs: org.apache.spark.sql.DataFrame, budgetNum: Long = 3L,
      budgetDen: Long = 5L): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val counts = docs.groupBy("source").agg(count(lit(1)).as("n"))
    val w = Window.orderBy("n", "source") // |sources|-row frame
    val ranked = counts
      .withColumn("idx", row_number().over(w))
      .withColumn("pre", coalesce(sum("n")
        .over(w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    val tot = counts.agg(sum("n").as("nn"), count(lit(1)).as("s"))
    val cand = ranked.crossJoin(tot)
      .withColumn("b", expr(s"(nn * $budgetNum) DIV $budgetDen"))
      .withColumn("m", col("s") - col("idx") + 1)
      .withColumn("theta", expr("(b - pre) DIV m"))
      .withColumn("rem", expr("(b - pre) % m"))
    val boundary = cand.filter(col("theta") < col("n"))
      .agg(min(struct(col("idx"), col("theta"), col("rem"))).as("mb"))
      .select(col("mb.idx").as("bidx"), col("mb.theta").as("btheta"),
        col("mb.rem").as("brem"))
    cand.crossJoin(broadcast(boundary))
      .select(col("source"), col("n").as("n_docs"),
        when(col("bidx").isNull || col("idx") < col("bidx"), col("n"))
          .otherwise(col("btheta") +
            when(col("idx") - col("bidx") < col("brem"), 1L).otherwise(0L))
          .as("alloc"))
      .orderBy("source")
  }

  /** A-ES weighted reservoir: per-language top-k docs by
    * `round(ln(u),6) / weight` (weight = n_chars) through
    * [[graft.functions.GraftFunctions.topkScoreId]].
    */
  def weightedSample(docs: org.apache.spark.sql.DataFrame, k: Int): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    val u = shiftrightunsigned(
      graft.functions.GraftFunctions.splitmix64(col("doc_id")), 11)
      .cast("double") / lit(9007199254740992.0)
    docs.select(col("lang"), col("doc_id"),
        (round(log(u), 6) / col("n_chars")).as("k"))
      .groupBy("lang")
      .agg(graft.functions.GraftFunctions.topkScoreId(col("k"), col("doc_id"), k)
        .as("nn"))
      .select(col("lang"), posexplode(col("nn")))
      .select(col("lang"), (col("pos") + 1).cast("int").as("rank"),
        col("col.id").as("doc_id"),
        (round(col("col.score"), 6) + lit(0.0)).as("skey"))
      .orderBy("lang", "rank")
  }
}
