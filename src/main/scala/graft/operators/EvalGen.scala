package graft.operators

import graft.{QueryEntry, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}

/** Generation-evaluation operators — the two readouts an LLM-data team
  * computes over model OUTPUTS rather than over the corpus itself:
  * ROUGE-N overlap (is a generated summary lexically faithful to its
  * reference?) and the unbiased pass@k estimator (given n sampled
  * attempts per task with c successes, what success rate would k
  * samples achieve?). Both reduce to exact integer sufficient
  * statistics — n-gram multiset intersections and falling-factorial
  * ratios — with one rounded division per (doc|task), carried as
  * DECIMAL so corpus means are summation-order-free (the q160/q173
  * determinism pattern).
  *
  * The fixture has no model outputs, so the candidate/trial frames are
  * constructed DETERMINISTICALLY from the tables in both engines (the
  * q63/q201/q218 planted-input precedent): the ROUGE candidate for a
  * document is the even-position token subsequence of its first 40
  * tokens scored against the first-30-token reference, and a pass@k
  * "task" is a user's first ≤16 events with success = `purchase`.
  *
  * Scale shape: ROUGE is per-doc gram explodes + one (doc, n, gram)
  * grouped count + doc-keyed rollups — no cross-doc joins; pass@k is
  * one per-user window over user-bounded partitions + a user-grouped
  * count + a 3-way constant fan-out. Both are one keyed shuffle wide
  * at any corpus size.
  */
object EvalGen {

  private val RefLen = 30 // reference = first 30 tokens
  private val CandSpan = 40 // candidate drawn from the first 40 tokens
  private val D7 = DecimalType(18, 7)

  /** Per-document ROUGE-1/ROUGE-2 precision, recall, F1 between the
    * planted candidate (even-position tokens of the first [[CandSpan]])
    * and reference (first [[RefLen]] tokens). Multiset overlap =
    * Σ_g min(count_cand, count_ref); F1 folds to 2·ov/(ctot+rtot), so
    * every per-doc metric is a single exact-integer division.
    */
  def rougePerDoc(docs: DataFrame): DataFrame = {
    val base = docs
      .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("t"))
      .select(col("doc_id"), col("t"), size(col("t")).as("len"))
      .filter(col("len") >= 4)
    def grams(side: String, n: Int, idx: String, gram: org.apache.spark.sql.Column,
        bound: org.apache.spark.sql.Column): DataFrame =
      base.select(col("doc_id"),
          explode(sequence(lit(1), bound)).as(idx), col("t"))
        .select(col("doc_id"), lit(n).as("n"), lit(side).as("side"),
          gram.as("g"))
    val i = col("i")
    val refUni = grams("r", 1, "i", element_at(col("t"), i),
      least(lit(RefLen), col("len")))
    val refBi = grams("r", 2, "i",
      concat(element_at(col("t"), i), lit(" "), element_at(col("t"), i + 1)),
      least(lit(RefLen - 1), col("len") - 1))
    val candUni = grams("c", 1, "i", element_at(col("t"), i * 2),
      least(lit(CandSpan / 2), floor(col("len") / 2).cast("int")))
    val candBi = grams("c", 2, "i",
      concat(element_at(col("t"), i * 2), lit(" "),
        element_at(col("t"), i * 2 + 2)),
      least(lit(CandSpan / 2 - 1), floor(col("len") / 2).cast("int") - 1))
    val all = refUni.union(refBi).union(candUni).union(candBi)
    val per = all.groupBy("doc_id", "n", "g")
      .agg(sum(when(col("side") === "r", 1L).otherwise(0L)).as("cr"),
        sum(when(col("side") === "c", 1L).otherwise(0L)).as("cc"))
    per.groupBy("doc_id", "n")
      .agg(sum(least(col("cr"), col("cc"))).as("ov"),
        sum("cr").as("rtot"), sum("cc").as("ctot"))
  }

  /** Corpus ROUGE report: one row per gram order n ∈ {1, 2} with doc
    * count, exact total overlap, and order-free mean P/R/F1.
    */
  def rougeReport(docs: DataFrame): DataFrame =
    rougePerDoc(docs)
      .select(col("n"), col("ov"),
        round(col("ov").cast(DoubleType) / col("ctot"), 7).cast(D7).as("p"),
        round(col("ov").cast(DoubleType) / col("rtot"), 7).cast(D7).as("r"),
        round(col("ov") * lit(2.0) / (col("ctot") + col("rtot")), 7)
          .cast(D7).as("f"))
      .groupBy("n")
      .agg(count(lit(1)).as("n_docs"), sum("ov").as("sum_overlap"),
        sum("p").as("sp"), sum("r").as("sr"), sum("f").as("sf"))
      .select(col("n"), col("n_docs").cast(LongType).as("n_docs"),
        col("sum_overlap").cast(LongType).as("sum_overlap"),
        round(col("sp").cast(DoubleType) / col("n_docs"), 6).as("mean_precision"),
        round(col("sr").cast(DoubleType) / col("n_docs"), 6).as("mean_recall"),
        round(col("sf").cast(DoubleType) / col("n_docs"), 6).as("mean_f1"))
      .orderBy("n")

  private val rougeSql: String = {
    val R = RefLen; val C2 = CandSpan / 2
    s"""WITH base AS (
       |  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\\s+') AS t,
       |         len(regexp_split_to_array(trim(lower(text)), '\\s+')) AS tl
       |  FROM documents
       |  WHERE len(regexp_split_to_array(trim(lower(text)), '\\s+')) >= 4
       |), g AS (
       |  SELECT doc_id, 1 AS n, 'r' AS side, t[i] AS g
       |  FROM (SELECT doc_id, t, unnest(generate_series(1, LEAST($R, tl))) AS i
       |        FROM base)
       |  UNION ALL
       |  SELECT doc_id, 2, 'r', t[i] || ' ' || t[i + 1]
       |  FROM (SELECT doc_id, t, unnest(generate_series(1, LEAST(${R - 1}, tl - 1))) AS i
       |        FROM base)
       |  UNION ALL
       |  SELECT doc_id, 1, 'c', t[i * 2]
       |  FROM (SELECT doc_id, t, unnest(generate_series(1, LEAST($C2, tl // 2))) AS i
       |        FROM base)
       |  UNION ALL
       |  SELECT doc_id, 2, 'c', t[i * 2] || ' ' || t[i * 2 + 2]
       |  FROM (SELECT doc_id, t, unnest(generate_series(1, LEAST(${C2 - 1}, tl // 2 - 1))) AS i
       |        FROM base)
       |), per AS (
       |  SELECT doc_id, n, g,
       |         SUM(CASE WHEN side = 'r' THEN 1 ELSE 0 END) AS cr,
       |         SUM(CASE WHEN side = 'c' THEN 1 ELSE 0 END) AS cc
       |  FROM g GROUP BY 1, 2, 3
       |), d AS (
       |  SELECT doc_id, n, SUM(LEAST(cr, cc)) AS ov,
       |         SUM(cr) AS rtot, SUM(cc) AS ctot
       |  FROM per GROUP BY 1, 2
       |), m AS (
       |  SELECT n, ov,
       |         CAST(ROUND(CAST(ov AS DOUBLE) / ctot, 7) AS DECIMAL(18,7)) AS p,
       |         CAST(ROUND(CAST(ov AS DOUBLE) / rtot, 7) AS DECIMAL(18,7)) AS r,
       |         CAST(ROUND(ov * 2.0 / (ctot + rtot), 7) AS DECIMAL(18,7)) AS f
       |  FROM d
       |)
       |SELECT n, CAST(COUNT(*) AS BIGINT) AS n_docs,
       |       CAST(SUM(ov) AS BIGINT) AS sum_overlap,
       |       ROUND(CAST(SUM(p) AS DOUBLE) / COUNT(*), 6) AS mean_precision,
       |       ROUND(CAST(SUM(r) AS DOUBLE) / COUNT(*), 6) AS mean_recall,
       |       ROUND(CAST(SUM(f) AS DOUBLE) / COUNT(*), 6) AS mean_f1
       |FROM m GROUP BY n ORDER BY n""".stripMargin
  }

  private val TrialCap = 16 // first ≤16 attempts per task
  private val PassKs = Seq(1, 5, 10)

  /** Unbiased pass@k (Chen et al. 2021, eq. 1): per task,
    * 1 − C(n−c, k)/C(n, k), evaluated as an exact falling-factorial
    * ratio (n ≤ 16, so both factorials fit a long), averaged over
    * tasks with n ≥ k.
    */
  def passAtK(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("event_id")
    val per = events
      .select(col("user_id"), col("event_id"),
        when(col("event_type") === "purchase", 1L).otherwise(0L).as("s"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= TrialCap)
      .groupBy("user_id")
      .agg(count(lit(1)).as("n"), sum("s").as("c"))
    val ks = per.sparkSession.range(1)
      .select(explode(typedlit(PassKs)).as("k"))
    // C(n−c,k)/C(n,k) = (n−c)!/(n−c−k)! ÷ n!/(n−k)! — zero when n−c<k
    val num = when(col("n") - col("c") >= col("k"),
      factorial((col("n") - col("c")).cast("int")) /
        factorial((col("n") - col("c") - col("k")).cast("int")))
      .otherwise(lit(0L))
    val den = factorial(col("n").cast("int")) /
      factorial((col("n") - col("k")).cast("int"))
    per.crossJoin(broadcast(ks))
      .filter(col("n") >= col("k"))
      .select(col("k"), col("n"), col("c"),
        round(lit(1.0) - num.cast(DoubleType) / den, 7).cast(D7).as("pk"))
      .groupBy("k")
      .agg(count(lit(1)).as("n_tasks"), sum("n").as("sum_trials"),
        sum("c").as("sum_successes"), sum("pk").as("sp"))
      .select(col("k"), col("n_tasks").cast(LongType).as("n_tasks"),
        col("sum_trials").cast(LongType).as("sum_trials"),
        col("sum_successes").cast(LongType).as("sum_successes"),
        round(col("sp").cast(DoubleType) / col("n_tasks"), 6).as("mean_pass_at_k"))
      .orderBy("k")
  }

  private val passAtKSql: String =
    s"""WITH r AS (
       |  SELECT user_id,
       |         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS s,
       |         row_number() OVER (PARTITION BY user_id ORDER BY event_id) AS rn
       |  FROM events
       |), per AS (
       |  SELECT user_id, COUNT(*) AS n, SUM(s) AS c
       |  FROM r WHERE rn <= $TrialCap GROUP BY 1
       |), x AS (
       |  SELECT k, n, c,
       |         CAST(ROUND(1.0 - CAST(CASE WHEN n - c >= k
       |                 THEN factorial(CAST(n - c AS INT))
       |                      // factorial(CAST(n - c - k AS INT))
       |                 ELSE 0 END AS DOUBLE)
       |               / (factorial(CAST(n AS INT)) // factorial(CAST(n - k AS INT))),
       |             7) AS DECIMAL(18,7)) AS pk
       |  FROM per, (SELECT unnest([${PassKs.mkString(", ")}]) AS k)
       |  WHERE n >= k
       |)
       |SELECT k, CAST(COUNT(*) AS BIGINT) AS n_tasks,
       |       CAST(SUM(n) AS BIGINT) AS sum_trials,
       |       CAST(SUM(c) AS BIGINT) AS sum_successes,
       |       ROUND(CAST(SUM(pk) AS DOUBLE) / COUNT(*), 6) AS mean_pass_at_k
       |FROM x GROUP BY k ORDER BY k""".stripMargin

  val entries: Seq[QueryEntry] = Seq(
    // q272 — ROUGE-1/2 P/R/F1 on the planted candidate/reference pairs;
    // DuckDB re-derives every gram multiset, the min-overlaps, and the
    // per-doc divisions.
    QueryEntry.sql("q272_rouge_overlap", rougeSql) { (s, dir) =>
      rougeReport(Tables(s, dir).documentsRebalanced)
    },

    // q273 — unbiased pass@k over per-user trial records; DuckDB
    // replays the trial cap, the success counts, and the exact
    // combinatorial estimator.
    QueryEntry.sql("q273_pass_at_k", passAtKSql) { (s, dir) =>
      passAtK(Tables(s, dir).events)
    },
  )
}
