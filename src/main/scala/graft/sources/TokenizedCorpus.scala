package graft.sources

import graft.Tables
import graft.operators.TextAnalysis
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** The staged positional token table: `documents` tokenized ONCE per
  * fixture fingerprint into a durable (doc_id, pos, term) parquet
  * layout the whole retrieval family reads (inverted index, TF-IDF,
  * term lookup, BM25, phrase, proximity).
  *
  * Why it exists: before this layout each retrieval query re-ran the
  * regex split over the full corpus — at 100 TB, six queries meant six
  * tokenize passes over the same bytes. Staging is the bucketed-tables
  * pay-once trade ([[BucketedTables]]): one explode+write, then every
  * consumer is a columnar scan that PRUNES (a term-filtered query reads
  * the `term` column with the predicate pushed to parquet; a
  * bag-of-words consumer never reads `pos`). Freshness is structural —
  * the path embeds the source file's (mtime, size) fingerprint
  * ([[Staging.fingerprintPath]]), so a regenerated corpus re-stages.
  *
  * Token identity is [[TextAnalysis.tokens]] applied to
  * [[Tables.documentsRebalanced]] — literally the same expression the
  * inline paths ran, written out; derived queries are equal by
  * construction, and the DuckDB mirrors keep re-tokenizing from
  * `documents` independently (the staged layout sits UNDER the
  * differential gate, never beside it).
  */
object TokenizedCorpus {

  def stagedPath(dir: String): String =
    Staging.fingerprintPath("graft_tokens", dir, "documents.parquet", "tokens_term_v2")

  /** The (doc_id, pos, term) token table, staged on first use. Written
    * RANGE-PARTITIONED BY TERM and term-sorted within partitions: a
    * term-filtered consumer (q94 lookup, q98/q112/q131/q132 query
    * terms) pushes its predicate to parquet, and because each row
    * group covers a narrow term range, min/max statistics skip nearly
    * every row group — the on-disk analogue of the reference's
    * persisted row index (`orc-parser/reader.cc:47`: seek works
    * because the index is durable). Bag-of-words consumers (q86/q87
    * group by term) read term-clustered input for the same price. The
    * write pays one extra shuffle+sort ONCE per corpus fingerprint —
    * the staging pay-once trade, amortized across every retrieval
    * query thereafter.
    */
  def tokens(spark: SparkSession, dir: String): DataFrame = {
    val dest = stagedPath(dir)
    Staging.ensureStaged(dest) {
      val par = spark.sessionState.conf.numShufflePartitions
      Tables(spark, dir).documentsRebalanced
        .select(col("doc_id"),
          posexplode(TextAnalysis.tokens(col("text"))).as(Seq("pos", "term")))
        .repartitionByRange(par, col("term"))
        .sortWithinPartitions("term", "doc_id", "pos")
        .write.mode("overwrite").parquet(dest)
    }
    spark.read.parquet(dest)
  }
}
