package graft.operators

import graft.{QueryEntry, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Term-level IR surface over `documents`: inverted-index construction
  * and TF-IDF term ranking — the retrieval side of a corpus pipeline
  * (dedup/decontamination find near-copies; these find *relevant*
  * documents).
  *
  * Both operators run on the shared whitespace tokenizer
  * ([[TextAnalysis.tokens]]) so token identity agrees with every other
  * text operator (and with the DuckDB mirrors' `regexp_split_to_array`).
  */
object Search {

  /** Inverted index: term → (document frequency, ordered postings).
    * Two shuffles — (term, doc) distinct, then groupBy term — both on
    * uniform keys. The postings list for a term is assembled per term
    * partition; at 100 TB a stopword's postings outgrow one task, and
    * production sharding splits postings by (term, doc_id range) —
    * here the list is certified by fingerprint instead of shipped
    * whole, so only df/bounds/md5 leave the executors.
    */
  def invertedIndex(docs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    docs
      .select(col("doc_id"), explode(TextAnalysis.tokens(col("text"))).as("term"))
      .distinct()
      .groupBy("term")
      .agg(
        count(lit(1)).as("df"),
        min("doc_id").as("first_doc"),
        max("doc_id").as("last_doc"),
        md5(array_join(
          transform(sort_array(collect_list(col("doc_id"))),
            d => d.cast(StringType)), ",").cast(BinaryType)).as("postings_md5"),
      )

  /** Per-document TF-IDF top terms: tf = in-doc term count, idf =
    * ln(N/df) with df over the WHOLE corpus (restricting df to the
    * scored slice would inflate rare-term scores). Ranking uses the
    * ROUNDed score (FIXTURES.md float rule: mathematically-equal
    * products computed differently — ln(4) vs 2·ln(2) — differ by an
    * ulp; rounding to 6 dp before ranking plus the term tie-break
    * makes the order engine-independent), then the term
    * lexicographically.
    */
  def tfidfTopTerms(docs: org.apache.spark.sql.DataFrame, k: Int,
      docLimit: Long): org.apache.spark.sql.DataFrame = {
    val tok = docs
      .select(col("doc_id"), explode(TextAnalysis.tokens(col("text"))).as("term"))
    val n = docs.select(count(lit(1)).as("n"))
    val tf = tok.filter(col("doc_id") < docLimit)
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val df = tok.select(col("term"), col("doc_id")).distinct()
      .groupBy("term").agg(count(lit(1)).as("df"))
    val w = Window.partitionBy("doc_id")
      .orderBy(col("score").desc, col("term"))
    tf.join(df.hint("broadcast"), Seq("term"))
      .crossJoin(broadcast(n))
      .withColumn("score",
        round(col("tf") * log(col("n").cast(DoubleType) / col("df")), 6))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("doc_id"), col("rank"), col("term"), col("tf"), col("df"),
        col("score"))
      .orderBy("doc_id", "rank")
  }

  val entries: Seq[QueryEntry] = Seq(
    // Inverted-index build under the differential gate: DuckDB
    // re-derives every postings list (ordered, distinct) and the md5
    // fingerprints must agree term by term.
    QueryEntry.sql(
      "q86_inverted_index",
      """WITH tok AS (
        |  SELECT DISTINCT term, doc_id FROM (
        |    SELECT doc_id,
        |           unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS term
        |    FROM documents) t
        |)
        |SELECT term, COUNT(*) AS df,
        |       CAST(MIN(doc_id) AS BIGINT) AS first_doc,
        |       CAST(MAX(doc_id) AS BIGINT) AS last_doc,
        |       md5(string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id))
        |         AS postings_md5
        |FROM tok GROUP BY term ORDER BY term""".stripMargin,
    ) { (s, dir) =>
      invertedIndex(Tables(s, dir).documentsRebalanced).orderBy("term")
    },

    // TF-IDF top-3 terms for the first 100 documents (df fitted on the
    // whole corpus). The idf is the one transcendental under the gate;
    // see tfidfTopTerms for why ranking happens on the rounded score.
    QueryEntry.sql(
      "q87_tfidf_topterms",
      """WITH tok AS (
        |  SELECT doc_id,
        |         unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS term
        |  FROM documents
        |), tf AS (
        |  SELECT doc_id, term, COUNT(*) AS tf FROM tok
        |  WHERE doc_id < 100 GROUP BY 1, 2
        |), df AS (
        |  SELECT term, COUNT(DISTINCT doc_id) AS df FROM tok GROUP BY 1
        |), n AS (
        |  SELECT COUNT(*) AS n FROM documents
        |), scored AS (
        |  SELECT t.doc_id, t.term, t.tf, d.df,
        |         ROUND(t.tf * ln(CAST(n.n AS DOUBLE) / d.df), 6) AS score
        |  FROM tf t JOIN df d USING (term), n
        |), ranked AS (
        |  SELECT doc_id, term, tf, df, score,
        |         CAST(row_number() OVER (PARTITION BY doc_id
        |                ORDER BY score DESC, term) AS INTEGER) AS rank
        |  FROM scored
        |)
        |SELECT doc_id, rank, term, CAST(tf AS BIGINT) AS tf,
        |       CAST(df AS BIGINT) AS df, score
        |FROM ranked WHERE rank <= 3 ORDER BY doc_id, rank""".stripMargin,
    ) { (s, dir) =>
      tfidfTopTerms(Tables(s, dir).documentsRebalanced, k = 3, docLimit = 100L)
    },
  )
}
