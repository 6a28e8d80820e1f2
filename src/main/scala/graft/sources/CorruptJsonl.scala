package graft.sources

import graft.{QueryEntry, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructType}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Malformed-record ingestion — the dead-letter side of a JSONL source:
  * real feeds carry truncated/garbled lines, and an engine must ingest
  * the good rows while ACCOUNTING for the bad ones rather than
  * dropping them silently (FAILFAST would abort a 100 TB job on one
  * bad line; DROPMALFORMED lies about row counts).
  *
  * Surface: Spark's PERMISSIVE mode with `columnNameOfCorruptRecord` —
  * a malformed line yields a row with every schema field NULL and the
  * raw line preserved in the corrupt column (the dead-letter payload).
  * The staged fixture serializes `documents` as JSONL with every
  * doc_id ≡ 0 (mod 97) line truncated mid-object (guaranteed-invalid
  * JSON), so the oracle can recompute the audit exactly from the
  * source table.
  */
object CorruptJsonl {

  private val CorruptCol = "_corrupt_record"

  def corruptPath(dir: String): String =
    Staging.fingerprintPath("graft_jsonl", dir, "documents.parquet",
      "documents_corrupt")

  /** Documents as JSONL with planted malformed lines, staged once. */
  def corruptDocuments(spark: SparkSession, dir: String): DataFrame = {
    val dest = corruptPath(dir)
    val src = Tables.load(spark, dir, "documents")
    Staging.ensureStaged(dest) {
      val js = to_json(struct(src.columns.map(col): _*))
      src.select(
        when(col("doc_id") % 97 === 0,
          // drop the closing brace: unterminated object, always invalid
          js.substr(lit(1), length(js) - 1))
          .otherwise(js).as("value"))
        .write.mode("overwrite").text(dest)
    }
    val schema = StructType(src.schema.fields)
      .add(CorruptCol, StringType, nullable = true)
    spark.read
      .schema(schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .json(dest)
  }

  val entries: Seq[QueryEntry] = Seq(
    // q107 — dead-letter audit over the corrupt JSONL read: good/bad
    // counts and good-row checksums; the oracle recomputes all four
    // from the clean source table using the planting rule.
    QueryEntry.sql(
      "q107_corrupt_jsonl",
      """SELECT
        |  CAST(SUM(CASE WHEN doc_id % 97 = 0 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_bad,
        |  CAST(SUM(CASE WHEN doc_id % 97 <> 0 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_good,
        |  CAST(SUM(CASE WHEN doc_id % 97 <> 0 THEN doc_id END) AS BIGINT)
        |    AS sum_good_ids,
        |  CAST(SUM(CASE WHEN doc_id % 97 <> 0 THEN n_chars END) AS BIGINT)
        |    AS sum_good_chars
        |FROM documents""".stripMargin,
    ) { (s, dir) =>
      corruptDocuments(s, dir).agg(
        count(col(CorruptCol)).as("n_bad"),
        count(col("doc_id")).as("n_good"),
        sum(col("doc_id")).cast("bigint").as("sum_good_ids"),
        sum(col("n_chars")).cast("bigint").as("sum_good_chars"))
    },
  )
}
