package graft.operators

import graft.{QueryEntry, Tables}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Tier C text analysis (SURVEY §2.4): token counting, language-ID
  * heuristic, quality scoring, document fingerprinting — the text side
  * of a training-data pipeline, all as narrow per-row expressions that
  * stay inside whole-stage codegen and aggregate with plain shuffles
  * (no driver-side collection at any scale).
  *
  * Oracle parity rules used throughout: numeric literals are cast to
  * DOUBLE in the DuckDB SQL (DuckDB parses bare `0.4` as DECIMAL),
  * integer aggregates are cast to BIGINT, and every mixed-type division
  * multiplies by a double first so neither engine does integer division.
  */
object TextAnalysis {

  /** Whitespace tokenizer shared by all text operators. */
  def tokens(text: Column): Column = split(trim(lower(text)), "\\s+")

  private val stopEn = Seq("the", "a", "of", "and", "to", "is")
  private val stopEs = Seq("el", "la", "de", "y", "que", "en")
  private val stopDe = Seq("der", "die", "das", "und", "ist", "ein")
  private val stopFr = Seq("le", "la", "de", "et", "les", "un")
  private val stopZh = Seq("的", "是", "了", "在", "和", "有")

  private def stopCount(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => t.isin(words: _*)))

  private def sqlStopCount(words: Seq[String]): String =
    s"len(list_filter(toks, t -> t IN (${words.map(w => s"'$w'").mkString(", ")})))"

  /** Quality score, defined ONCE for both engines (q18 and the q39
    * pipeline reuse these; the Column and SQL forms must stay term-
    * for-term identical for oracle parity).
    */
  def qualityScore(toks: Column, nChars: Column): Column =
    lit(0.4) * least(size(toks), lit(100)) / lit(100.0) +
      lit(0.4) * stopCount(toks, stopEn) / size(toks) +
      when(nChars.between(100, 1000), lit(0.2)).otherwise(lit(0.0))

  /** DuckDB mirror of [[qualityScore]] over columns `toks`, `n_chars`. */
  val qualityScoreSql: String =
    s"""CAST(0.4 AS DOUBLE) * LEAST(len(toks), 100) / CAST(100.0 AS DOUBLE)
       |         + CAST(0.4 AS DOUBLE) * ${sqlStopCount(stopEn)} / len(toks)
       |         + CASE WHEN n_chars BETWEEN 100 AND 1000
       |                THEN CAST(0.2 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END""".stripMargin

  val entries: Seq[QueryEntry] = Seq(
    // Q12 — per-language stats straight off the labeled column.
    QueryEntry.sql(
      "q12_text_stats",
      """SELECT lang, COUNT(*) AS cnt, CAST(SUM(n_chars) AS BIGINT) AS sum_chars
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,
    ) { (s, dir) =>
      Tables(s, dir).documentsRebalanced
        .groupBy("lang")
        .agg(count(lit(1)).as("cnt"), sum("n_chars").as("sum_chars"))
        .orderBy("lang")
    },

    // Token counting rolled up per language: whitespace tokenizer plus
    // a BPE-ish regex segmentation (letter runs / digit runs / single
    // other-symbols — the pre-tokenization pattern BPE vocabularies
    // are trained over).
    QueryEntry.sql(
      "q16_token_counts",
      """SELECT lang,
        |       CAST(SUM(len(regexp_split_to_array(trim(lower(text)), '\s+'))) AS BIGINT)
        |         AS sum_tokens,
        |       CAST(SUM(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9 ]'))) AS BIGINT)
        |         AS sum_subtokens,
        |       COUNT(*) AS cnt
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,
    ) { (s, dir) =>
      val d = Tables(s, dir).documentsRebalanced
      d.groupBy("lang")
        .agg(
          sum(size(tokens(col("text")))).as("sum_tokens"),
          sum(size(regexp_extract_all(lower(col("text")),
            lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), lit(0)))).as("sum_subtokens"),
          count(lit(1)).as("cnt"),
        )
        .orderBy("lang")
    },

    // Language-ID: stopword-marker heuristic with a fixed priority order
    // (en > es > de > fr > zh) on ties; reported as a confusion rollup
    // against the labeled `lang`.
    QueryEntry.sql(
      "q17_lang_id",
      s"""WITH tok AS (
         |  SELECT lang, regexp_split_to_array(trim(lower(text)), '\\s+') AS toks
         |  FROM documents
         |), scored AS (
         |  SELECT lang,
         |         ${sqlStopCount(stopEn)} AS c_en,
         |         ${sqlStopCount(stopEs)} AS c_es,
         |         ${sqlStopCount(stopDe)} AS c_de,
         |         ${sqlStopCount(stopFr)} AS c_fr,
         |         ${sqlStopCount(stopZh)} AS c_zh
         |  FROM tok
         |)
         |SELECT lang,
         |       CASE
         |         WHEN c_en >= c_es AND c_en >= c_de AND c_en >= c_fr AND c_en >= c_zh THEN 'en'
         |         WHEN c_es >= c_de AND c_es >= c_fr AND c_es >= c_zh THEN 'es'
         |         WHEN c_de >= c_fr AND c_de >= c_zh THEN 'de'
         |         WHEN c_fr >= c_zh THEN 'fr'
         |         ELSE 'zh'
         |       END AS predicted,
         |       COUNT(*) AS cnt
         |FROM scored GROUP BY 1, 2 ORDER BY lang, predicted""".stripMargin,
    ) { (s, dir) =>
      val toks = tokens(col("text"))
      val cEn = stopCount(toks, stopEn)
      val cEs = stopCount(toks, stopEs)
      val cDe = stopCount(toks, stopDe)
      val cFr = stopCount(toks, stopFr)
      val cZh = stopCount(toks, stopZh)
      val predicted = when(cEn >= cEs && cEn >= cDe && cEn >= cFr && cEn >= cZh, "en")
        .when(cEs >= cDe && cEs >= cFr && cEs >= cZh, "es")
        .when(cDe >= cFr && cDe >= cZh, "de")
        .when(cFr >= cZh, "fr")
        .otherwise("zh")
      Tables(s, dir).documentsRebalanced
        .select(col("lang"), predicted.as("predicted"))
        .groupBy("lang", "predicted")
        .agg(count(lit(1)).as("cnt"))
        .orderBy("lang", "predicted")
    },

    // Quality scoring: length + stopword-ratio + char-range terms,
    // averaged per source. Term order is identical in both engines so
    // the double arithmetic is bit-reproducible pre-ROUND.
    QueryEntry.sql(
      "q18_quality_score",
      s"""WITH tok AS (
         |  SELECT source, n_chars,
         |         regexp_split_to_array(trim(lower(text)), '\\s+') AS toks
         |  FROM documents
         |), scored AS (
         |  SELECT source,
         |         $qualityScoreSql
         |           AS score
         |  FROM tok
         |)
         |SELECT source, ROUND(AVG(score), 6) AS avg_quality, COUNT(*) AS cnt
         |FROM scored GROUP BY source ORDER BY source""".stripMargin,
    ) { (s, dir) =>
      val toks = tokens(col("text"))
      Tables(s, dir).documentsRebalanced
        .select(col("source"), qualityScore(toks, col("n_chars")).as("score"))
        .groupBy("source")
        .agg(round(avg("score"), 6).as("avg_quality"), count(lit(1)).as("cnt"))
        .orderBy("source")
    },

    // Document fingerprinting: md5 over whitespace-normalized text.
    // (The near-dup pipeline uses xxhash64 internally — hash-function
    // dependent, so the oracle-able fingerprint is the md5 one.)
    QueryEntry.sql(
      "q19_fingerprint_md5",
      """SELECT doc_id, md5(regexp_replace(lower(text), '\s+', ' ', 'g')) AS fp
        |FROM documents ORDER BY doc_id""".stripMargin,
    ) { (s, dir) =>
      Tables(s, dir).documentsRebalanced
        .select(
          col("doc_id"),
          md5(regexp_replace(lower(col("text")), "\\s+", " ").cast(BinaryType)).as("fp"),
        )
        .orderBy("doc_id")
    },

    // The operators composed as one pipeline — the actual shape of a
    // training-data preparation job: exact-dedup survivors → quality
    // gate → per-language token accounting. One declarative plan, so
    // Catalyst fuses the stages (dedup's shuffle is the only exchange
    // before the final rollup).
    QueryEntry.sql(
      "q39_training_pipeline",
      s"""WITH survivors AS (
         |  SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY text
         |), d AS (
         |  SELECT doc.lang, doc.n_chars, doc.text
         |  FROM documents doc JOIN survivors s ON doc.doc_id = s.doc_id
         |), tok AS (
         |  SELECT lang, n_chars,
         |         regexp_split_to_array(trim(lower(text)), '\\s+') AS toks
         |  FROM d
         |), scored AS (
         |  SELECT lang, len(toks) AS n_tok,
         |         $qualityScoreSql
         |           AS score
         |  FROM tok
         |)
         |SELECT lang, COUNT(*) AS cnt, CAST(SUM(n_tok) AS BIGINT) AS sum_tokens
         |FROM scored WHERE score >= CAST(0.5 AS DOUBLE)
         |GROUP BY lang ORDER BY lang""".stripMargin,
    ) { (s, dir) =>
      val docs = Tables(s, dir).documentsRebalanced
      val survivors = docs.groupBy("text")
        .agg(min("doc_id").as("sdoc_id"))
        .select("sdoc_id")
      val d = docs.join(survivors, col("doc_id") === col("sdoc_id"))
      val toks = tokens(col("text"))
      d.select(col("lang"), size(toks).as("n_tok"),
          qualityScore(toks, col("n_chars")).as("score"))
        .filter(col("score") >= lit(0.5))
        .groupBy("lang")
        .agg(count(lit(1)).as("cnt"), sum("n_tok").cast("long").as("sum_tokens"))
        .orderBy("lang")
    },

    // Deterministic stratified sampling — the training-data staple that
    // must be reproducible across reruns and engines: membership is a
    // pure function of the row key (md5-derived 60-bit hash threshold),
    // with per-language rates. No RNG state, no seed plumbing, exactly
    // rerunnable at any scale — and therefore oracle-able.
    QueryEntry.sql(
      "q41_stratified_sample",
      """WITH hashed AS (
        |  SELECT lang, doc_id,
        |         CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT)
        |           % 100 AS bucket
        |  FROM documents
        |)
        |SELECT lang, COUNT(*) AS n_sampled,
        |       CAST(MIN(doc_id) AS BIGINT) AS min_id,
        |       CAST(MAX(doc_id) AS BIGINT) AS max_id
        |FROM hashed
        |WHERE bucket < CASE lang WHEN 'en' THEN 50 ELSE 20 END
        |GROUP BY lang ORDER BY lang""".stripMargin,
    ) { (s, dir) =>
      val bucket =
        conv(substring(md5(col("doc_id").cast(StringType).cast(BinaryType)), 1, 15), 16, 10)
          .cast(LongType) % 100
      Tables(s, dir).documentsRebalanced
        .select(col("lang"), col("doc_id"), bucket.as("bucket"))
        .filter(col("bucket") < when(col("lang") === "en", 50).otherwise(20))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_sampled"),
          min("doc_id").as("min_id"), max("doc_id").as("max_id"))
        .orderBy("lang")
    },
  )
}
