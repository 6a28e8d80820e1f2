package graft.operators

import graft.{QueryEntry, Tables}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Signal-diagnostics statistics over the corpus — the numbers a
  * curation team reads before trusting a quality signal:
  *
  *  - q204: per-language Pearson correlation between two per-doc
  *    signals (token count vs distinct-token count) — "is this signal
  *    just length in disguise?" is the first question asked of any new
  *    quality score. Computed from the five moment sums, every one an
  *    exact integer (the signals are integer-valued), so both engines
  *    reach the identical double at the single final division — no
  *    rank pass, no window, no data-scale sort (the reason Pearson
  *    over integer signals is preferred here to Spearman: rank-based
  *    statistics need a global sort per group; moment sums are one
  *    map-side-combined aggregation).
  *
  *  - q205: Cohen's kappa between the gold `lang` label and the q17
  *    char-class lang-ID prediction — chance-corrected agreement, the
  *    honest form of "the classifier is right 90% of the time" when
  *    the label distribution is skewed. Confusion marginals are exact
  *    integer counts; po/pe/kappa are three final divisions rounded
  *    at 6 dp.
  *
  * Scale shape: one pass over the corpus each (per-row token work in
  * codegen), grouped rollups bounded by |langs| or |langs|² — nothing
  * wider than label cardinality ever shuffles.
  */
object Correlate {

  /** Per-language Pearson r between token count and distinct-token
    * count, from exact integer moment sums (DECIMAL(38,0) carries the
    * squares past BIGINT at corpus scale).
    */
  def signalCorrelation(docs: DataFrame): DataFrame = {
    val toks = TextAnalysis.tokens(col("text"))
    val base = docs.select(col("lang"),
      size(toks).cast("long").as("x"),
      size(array_distinct(toks)).cast("long").as("y"))
    val d = "decimal(38,0)"
    base.groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("x").cast(d)).as("sx"),
        sum(col("y").cast(d)).as("sy"),
        sum((col("x") * col("x")).cast(d)).as("sxx"),
        sum((col("y") * col("y")).cast(d)).as("syy"),
        sum((col("x") * col("y")).cast(d)).as("sxy"))
      .select(col("lang"), col("n_docs"),
        round(
          (col("n_docs").cast(d) * col("sxy") - col("sx") * col("sy")).cast("double") /
            sqrt((col("n_docs").cast(d) * col("sxx") - col("sx") * col("sx")).cast("double") *
              (col("n_docs").cast(d) * col("syy") - col("sy") * col("sy")).cast("double")),
          6).as("pearson_r"))
      .orderBy("lang")
  }

  /** Gold-vs-predicted agreement: n, observed agreement po, chance
    * agreement pe (from the confusion marginals), Cohen's kappa.
    */
  def labelAgreement(docs: DataFrame): DataFrame = {
    val pred = docs.select(col("lang").as("gold"),
      TextAnalysis.langPredicted(col("text")).as("pred"))
    val totals = pred.agg(count(lit(1)).as("n"),
      sum(when(col("gold") === col("pred"), 1L).otherwise(0L)).as("agree"))
    val marg = pred.groupBy("gold").agg(count(lit(1)).as("ng"))
      .join(pred.groupBy("pred").agg(count(lit(1)).as("np")),
        col("gold") === col("pred"), "full_outer")
      .agg(sum(coalesce(col("ng"), lit(0L)).cast("decimal(38,0)") *
        coalesce(col("np"), lit(0L)).cast("decimal(38,0)")).as("pesum"))
    totals.crossJoin(marg)
      .select(col("n"), col("agree"),
        round(col("agree").cast("double") / col("n").cast("double"), 6).as("po"),
        round(col("pesum").cast("double") /
          (col("n").cast("double") * col("n").cast("double")), 6).as("pe"),
        round(
          (col("agree").cast("double") / col("n").cast("double") -
            col("pesum").cast("double") /
              (col("n").cast("double") * col("n").cast("double"))) /
            (lit(1.0) - col("pesum").cast("double") /
              (col("n").cast("double") * col("n").cast("double"))),
          6).as("kappa"))
  }

  val entries: Seq[QueryEntry] = Seq(
    // Is distinct-token count just token count in disguise? DuckDB
    // re-derives both signals and the five moment sums (HUGEINT-exact)
    // and must land on the identical rounded r per language.
    QueryEntry.sql(
      "q204_signal_correlation",
      """WITH sig AS (
        |  SELECT lang,
        |         len(regexp_split_to_array(trim(lower(text)), '\s+')) AS x,
        |         len(list_distinct(regexp_split_to_array(trim(lower(text)), '\s+'))) AS y
        |  FROM documents
        |), m AS (
        |  SELECT lang, COUNT(*) AS n_docs,
        |         CAST(SUM(x) AS HUGEINT) AS sx, CAST(SUM(y) AS HUGEINT) AS sy,
        |         CAST(SUM(x * x) AS HUGEINT) AS sxx,
        |         CAST(SUM(y * y) AS HUGEINT) AS syy,
        |         CAST(SUM(x * y) AS HUGEINT) AS sxy
        |  FROM sig GROUP BY 1
        |)
        |SELECT lang, n_docs,
        |       ROUND(CAST(n_docs * sxy - sx * sy AS DOUBLE) /
        |             sqrt(CAST(n_docs * sxx - sx * sx AS DOUBLE) *
        |                  CAST(n_docs * syy - sy * sy AS DOUBLE)), 6) AS pearson_r
        |FROM m ORDER BY lang""".stripMargin,
    ) { (s, dir) =>
      signalCorrelation(Tables(s, dir).documentsRebalanced)
    },

    // Chance-corrected gold-vs-heuristic agreement; DuckDB rebuilds
    // the prediction, the confusion marginals, and all three rounded
    // ratios.
    QueryEntry.sql(
      "q205_label_agreement",
      s"""WITH scored AS (
         |  SELECT lang AS gold, text,
         |         regexp_split_to_array(trim(lower(text)), '\\s+') AS toks
         |  FROM documents
         |), p AS (
         |  SELECT gold, $predictedSql AS pred
         |  FROM (SELECT gold, text, toks,
         |               ${TextAnalysis.langScoresSql}
         |        FROM scored) s
         |), t AS (
         |  SELECT COUNT(*) AS n,
         |         CAST(SUM(CASE WHEN gold = pred THEN 1 ELSE 0 END) AS BIGINT)
         |           AS agree
         |  FROM p
         |), marg AS (
         |  SELECT CAST(SUM(CAST(COALESCE(g.ng, 0) AS HUGEINT) *
         |                  CAST(COALESCE(q.np, 0) AS HUGEINT)) AS HUGEINT)
         |           AS pesum
         |  FROM (SELECT gold AS lbl, COUNT(*) AS ng FROM p GROUP BY 1) g
         |  FULL OUTER JOIN
         |       (SELECT pred AS lbl, COUNT(*) AS np FROM p GROUP BY 1) q
         |  ON g.lbl = q.lbl
         |)
         |SELECT n, agree,
         |       ROUND(CAST(agree AS DOUBLE) / CAST(n AS DOUBLE), 6) AS po,
         |       ROUND(CAST(pesum AS DOUBLE) /
         |             (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)), 6) AS pe,
         |       ROUND((CAST(agree AS DOUBLE) / CAST(n AS DOUBLE)
         |              - CAST(pesum AS DOUBLE) /
         |                (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))) /
         |             (1.0 - CAST(pesum AS DOUBLE) /
         |                    (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))), 6)
         |         AS kappa
         |FROM t CROSS JOIN marg""".stripMargin,
    ) { (s, dir) =>
      labelAgreement(Tables(s, dir).documentsRebalanced)
    },
  )

  /** [[TextAnalysis.langPredictedSql]], needed by name inside the
    * interpolated q205 oracle.
    */
  private def predictedSql: String = TextAnalysis.langPredictedSql
}
