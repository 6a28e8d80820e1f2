package graft

import graft.operators.{Ivf, Redact, Search}
import org.apache.spark.sql.functions._

/** q85 PII redaction, q86 inverted index, q87 TF-IDF, q88 SemDeDup —
  * semantics pinned on planted inputs where the fixture carries no
  * natural signal (no real PII, shared vocabulary, no engineered
  * duplicate vectors).
  */
class SearchRedactSpec extends SparkSpec {
  import spark.implicits._

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("redaction masks the planted email and phone spans exactly") {
    val df = Seq(("hello world", "srcx", 7L)).toDF("text", "source", "doc_id")
      .select(Redact.plantedText(col("text"), col("source"), col("doc_id"))
        .as("full"))
    val full = df.as[String].head()
    assert(full == "hello world contact srcx.7@example.com or tel +1-555-0007")
    val masked = df.select(Redact.redacted(col("full"))).as[String].head()
    assert(masked == "hello world contact [EMAIL] or tel [PHONE]")
  }

  test("redaction is a no-op on the clean fixture text (no false positives)") {
    val changed = Tables(spark, sf).documents
      .filter(Redact.redacted(col("text")) =!= col("text")).count()
    assert(changed == 0L)
  }

  test("every fixture doc gets exactly one email and one phone redaction") {
    val bad = run("q85_pii_redact")
      .filter(col("n_emails") =!= 1 || col("n_phones") =!= 1).count()
    assert(bad == 0L)
  }

  test("inverted index: df, bounds and ordered postings on a planted corpus") {
    val docs = Seq((1L, "a b a"), (2L, "b c"), (3L, "a"))
      .toDF("doc_id", "text")
    val got = Search.invertedIndex(docs).orderBy("term")
      .as[(String, Long, Long, Long, String)].collect().toSeq
    assert(got == Seq(
      ("a", 2L, 1L, 3L, md5Hex("1,3")),
      ("b", 2L, 1L, 2L, md5Hex("1,2")),
      ("c", 1L, 2L, 2L, md5Hex("2")),
    ))
  }

  test("tfidf: scores and ranks on a planted corpus, df over the whole corpus") {
    // doc 2 is OUTSIDE docLimit but still contributes to df — the
    // corpus-wide-idf rule the operator documents.
    val docs = Seq((0L, "a a b"), (1L, "b c"), (2L, "c"))
      .toDF("doc_id", "text")
    val got = Search.tfidfTopTerms(docs, k = 3, docLimit = 2L)
      .as[(Long, Int, String, Long, Long, Double)].collect().toSeq
    def s(tf: Long, df: Long): Double =
      BigDecimal(tf * math.log(3.0 / df))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got == Seq(
      (0L, 1, "a", 2L, 1L, s(2, 1)), // 2·ln3  — rare term, high tf
      (0L, 2, "b", 1L, 2L, s(1, 2)), // ln(1.5)
      (1L, 1, "b", 1L, 2L, s(1, 2)), // tie with c → ascending term tiebreak
      (1L, 2, "c", 1L, 2L, s(1, 2)), // c: df=2 because doc 2 counts too
    ))
  }

  test("semanticDedup: keep-first within clusters, planted duplicates dropped") {
    // Two obvious clusters (init = the two smallest vec_ids): ids
    // 0/2/4 near (1,0,0,0), ids 1/3 at (0,0,1,0). Drops: 2 (dup of 0),
    // 4 (cos 0.8 to id 0), 3 (dup of 1); survivors are the smallest id
    // of each cluster — never dropped, by the keep-first rule.
    val emb = Seq(
      (0L, Array(1f, 0f, 0f, 0f)),
      (1L, Array(0f, 0f, 1f, 0f)),
      (2L, Array(1f, 0f, 0f, 0f)),
      (3L, Array(0f, 0f, 1f, 0f)),
      (4L, Array(0.8f, 0.6f, 0f, 0f)),
    ).toDF("vec_id", "embedding")
    val got = Ivf.semanticDedup(emb, threshold = 0.45, nClusters = 2, iters = 1)
      .as[(Int, Long, Long, Long)].collect().toSeq
    assert(got == Seq((0, 3L, 2L, 1L), (1, 2L, 1L, 1L)))
  }
}
