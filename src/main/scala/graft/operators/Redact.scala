package graft.operators

import graft.{QueryEntry, Tables}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** PII scrubbing — the compliance pass every training-data pipeline
  * runs before a corpus ships: find-and-mask structured identifiers
  * (emails, phone numbers) with per-document audit counts.
  *
  * The synthetic fixture text carries no natural PII, so the operator
  * is differential-tested over a PLANTED contact line: both engines
  * append the identical deterministic contact string (derived from
  * (source, doc_id) — the q63 planted-input pattern) and must then
  * find, count, and mask the identical spans. The patterns use only
  * the regex intersection both engines compile the same way (character
  * classes, bounded quantifiers — no backreferences, no lookaround,
  * which RE2-family engines reject).
  *
  * Scale shape: pure per-row regex work inside whole-stage codegen —
  * embarrassingly parallel, no shuffle before the output sort; the
  * masked text never leaves the executors (only its fingerprint and
  * the audit counts do).
  */
object Redact {

  /** Regex source shared verbatim by both engines (RE2 ∩ java.util.regex). */
  val emailPattern = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
  val phonePattern = "\\+1-555-[0-9]{4}"

  /** The planted contact line: a pure function of (source, doc_id). */
  def plantedText(text: Column, source: Column, docId: Column): Column =
    concat(text, lit(" contact "), source, lit("."),
      docId.cast(StringType), lit("@example.com or tel +1-555-"),
      lpad(pmod(docId, lit(10000)).cast(StringType), 4, "0"))

  /** Mask every email/phone span; count what was masked. */
  def redacted(full: Column): Column =
    regexp_replace(
      regexp_replace(full, emailPattern, "[EMAIL]"),
      phonePattern, "[PHONE]")

  val entries: Seq[QueryEntry] = Seq(
    // PII redaction under the differential gate: per-doc mask counts
    // plus the md5 fingerprint of the masked text (the full masked
    // corpus stays distributed; only fingerprints reach the check).
    QueryEntry.sql(
      "q85_pii_redact",
      s"""WITH planted AS (
         |  SELECT doc_id,
         |         text || ' contact ' || source || '.' ||
         |         CAST(doc_id AS VARCHAR) || '@example.com or tel +1-555-' ||
         |         lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS full_text
         |  FROM documents
         |)
         |SELECT doc_id,
         |       CAST(len(regexp_extract_all(full_text, '$emailPattern')) AS BIGINT)
         |         AS n_emails,
         |       CAST(len(regexp_extract_all(full_text, '$phonePattern')) AS BIGINT)
         |         AS n_phones,
         |       md5(regexp_replace(regexp_replace(full_text, '$emailPattern',
         |             '[EMAIL]', 'g'), '$phonePattern', '[PHONE]', 'g')) AS redacted_fp
         |FROM planted ORDER BY doc_id""".stripMargin,
    ) { (s, dir) =>
      Tables(s, dir).documentsRebalanced
        .select(col("doc_id"),
          plantedText(col("text"), col("source"), col("doc_id")).as("full_text"))
        .select(
          col("doc_id"),
          size(regexp_extract_all(col("full_text"), lit(emailPattern), lit(0)))
            .cast(LongType).as("n_emails"),
          size(regexp_extract_all(col("full_text"), lit(phonePattern), lit(0)))
            .cast(LongType).as("n_phones"),
          md5(redacted(col("full_text")).cast(BinaryType)).as("redacted_fp"),
        )
        .orderBy("doc_id")
    },

    // q238 — multi-pattern substring scan (blocklist density): the
    // content-policy filter that runs beside PII redaction — count
    // non-overlapping occurrences of every blocklist pattern per doc
    // (plain substrings, not word-bounded: policy terms cross token
    // boundaries), flag docs whose hit density crosses 1 hit / 100
    // chars, roll up per source. Pure integer arithmetic end to end:
    // occurrences via the length-difference identity, the density
    // threshold cross-multiplied (hits·100 ≥ n_chars), so both
    // engines agree exactly at any scale. Scale shape: per-row codegen
    // string work + one source-grouped aggregate.
    QueryEntry.sql(
      "q238_blocklist_density",
      s"""WITH scored AS (
         |  SELECT source, n_chars,
         |         ${Redact.blocklist.map(p =>
               s"(length(lower(text)) - length(replace(lower(text), '$p', ''))) // ${p.length}")
               .mkString("\n         |         + ")} AS hits
         |  FROM documents
         |)
         |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
         |       CAST(SUM(CASE WHEN hits * 100 >= n_chars THEN 1 ELSE 0 END)
         |            AS BIGINT) AS flagged,
         |       CAST(SUM(hits) AS BIGINT) AS total_hits
         |FROM scored GROUP BY 1 ORDER BY source""".stripMargin,
    ) { (s, dir) =>
      val hits = blocklist.map(p =>
        ((length(lower(col("text"))) -
          length(expr(s"replace(lower(text), '$p', '')"))) / p.length)
          .cast(LongType))
        .reduce(_ + _)
      Tables(s, dir).documentsRebalanced
        .select(col("source"), col("n_chars"), hits.as("hits"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("hits") * 100 >= col("n_chars"), 1L).otherwise(0L))
            .as("flagged"),
          sum("hits").as("total_hits"))
        .orderBy("source")
    },

    // q299 — canary extraction audit (the Carlini-style memorization
    // screen a data owner runs on anything a model might regurgitate):
    // unique canary tokens are PLANTED into every 101st document (in
    // BOTH engines — the q63/q283 precedent), and a detector that does
    // NOT know the plant rule scans the whole corpus for the canary
    // pattern with a real regex pass. Per source: docs, planted,
    // detected, cross-contaminated detections (detected but not
    // planted — must be zero on a clean corpus; nonzero means canaries
    // leaked across documents, the event the audit exists to catch),
    // and the extraction rate. One regex map pass + one rollup.
    QueryEntry.sql(
      "q299_canary_extraction",
      """WITH planted AS (
        |  SELECT doc_id, source,
        |         CASE WHEN doc_id % 101 = 0
        |              THEN text || ' zq' ||
        |                   CAST(((doc_id % 1000000) * 435761) % 1000000
        |                        AS VARCHAR)
        |              ELSE text END AS text,
        |         doc_id % 101 = 0 AS is_planted
        |  FROM documents
        |), scanned AS (
        |  SELECT source, is_planted,
        |         len(regexp_extract_all(text, 'zq[0-9]+')) > 0 AS detected
        |  FROM planted
        |)
        |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |       CAST(SUM(CASE WHEN is_planted THEN 1 ELSE 0 END) AS BIGINT)
        |         AS n_planted,
        |       CAST(SUM(CASE WHEN detected THEN 1 ELSE 0 END) AS BIGINT)
        |         AS n_detected,
        |       CAST(SUM(CASE WHEN detected AND NOT is_planted
        |                THEN 1 ELSE 0 END) AS BIGINT) AS n_cross,
        |       ROUND(SUM(CASE WHEN detected AND is_planted THEN 1 ELSE 0 END)
        |             * 1.0 / GREATEST(SUM(CASE WHEN is_planted THEN 1
        |                                  ELSE 0 END), 1), 6)
        |         AS extraction_rate
        |FROM scanned GROUP BY source ORDER BY source""".stripMargin,
    ) { (s, dir) =>
      val planted = Tables(s, dir).documentsRebalanced
        .select(col("doc_id"), col("source"),
          // Overflow-safe canary suffix: reduce doc_id mod 1e6 BEFORE the
          // Knuth-constant multiply (435761 = 2654435761 % 1e6, same residue
          // class) — doc_id * 2654435761 overflows BIGINT past doc_id≈3.47e9,
          // where Spark (non-ANSI) wraps but DuckDB throws.
          when(pmod(col("doc_id"), lit(101L)) === 0,
            concat(col("text"), lit(" zq"),
              pmod(pmod(col("doc_id"), lit(1000000L)) * lit(435761L),
                lit(1000000L)).cast(StringType)))
            .otherwise(col("text")).as("text"),
          (pmod(col("doc_id"), lit(101L)) === 0).as("is_planted"))
      planted
        .select(col("source"), col("is_planted"),
          (size(regexp_extract_all(col("text"), lit("zq[0-9]+"), lit(0))) > 0)
            .as("detected"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("is_planted"), 1L).otherwise(0L)).as("n_planted"),
          sum(when(col("detected"), 1L).otherwise(0L)).as("n_detected"),
          sum(when(col("detected") && !col("is_planted"), 1L).otherwise(0L))
            .as("n_cross"),
          round(sum(when(col("detected") && col("is_planted"), 1L)
            .otherwise(0L)) * lit(1.0)
            / greatest(sum(when(col("is_planted"), 1L).otherwise(0L)),
              lit(1L)), 6).as("extraction_rate"))
        .orderBy("source")
    },
  )

  /** The q238 blocklist: plain substrings over the fixture vocabulary
    * (policy terms would be a config input at 100 TB — the mechanism,
    * one scan for ALL patterns, is what's under test). Lazy: referenced
    * during `entries` initialization, which textually precedes this.
    */
  lazy val blocklist: Seq[String] = Seq("agg", "spill", "slow", "dup")
}
