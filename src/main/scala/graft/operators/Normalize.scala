package graft.operators

import graft.{QueryEntry, Tables}
import graft.functions.GraftFunctions
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Unicode-normalized exact dedup — the canonicalization pass that runs
  * BEFORE hash-keyed dedup in a multilingual corpus: the same article
  * crawled twice can differ only in Unicode form (precomposed U+00E9 vs
  * "e" + combining U+0301), so byte-exact dedup under-counts its
  * duplicates. The operator reports the per-language dedup LIFT of
  * NFC canonicalization: distinct count over raw bytes vs distinct
  * count over `nfc_normalize`d text.
  *
  * The synthetic fixture is already byte-distinct and carries no
  * decomposed forms, so the phenomenon is PLANTED (the q85/q63
  * planted-input pattern): docs pair up (2k, 2k+1), both members carry
  * the PARTNER's base text, and each appends the same accent suffix in
  * a different normal form — precomposed for even ids, decomposed for
  * odd. Both engines build the identical decorated corpus, so raw
  * distinct = n while NFC distinct = pair count, and any divergence in
  * the normalizer itself breaks the hash.
  *
  * Scale shape: one broadcast-free self-join on the pair key (partner
  * lookup — at 100 TB this is the "same article, two crawls" join the
  * real corpus arrives with for free), then pure per-row NFC + md5
  * inside whole-stage codegen, then one grouped distinct-count over
  * 128-bit digests — the text itself never reaches the shuffle, only
  * its fingerprint (the hash-before-distinct rule for wide columns).
  */
object Normalize {

  /** Precomposed accent suffix: " café résumé" with U+00E9. */
  val suffixNfc = " caf\u00e9 r\u00e9sum\u00e9"

  /** The same string with every é decomposed to "e" + U+0301. */
  val suffixNfd = " cafe\u0301 re\u0301sume\u0301"

  /** Decorated corpus: (doc_id, lang-of-partner, decorated text). */
  def decoratedPairs(docs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val partner = docs.select(col("doc_id").as("p_id"), col("text").as("p_text"),
      col("lang").as("p_lang"))
    docs.select(col("doc_id"))
      .withColumn("p_id", col("doc_id") - pmod(col("doc_id"), lit(2)))
      .join(partner, "p_id")
      .select(col("doc_id"), col("p_lang").as("lang"),
        concat(col("p_text"),
          when(pmod(col("doc_id"), lit(2)) === 0, lit(suffixNfc))
            .otherwise(lit(suffixNfd))).as("decorated"))
  }

  /** DuckDB twin of [[decoratedPairs]] (suffixes via chr() so the SQL
    * stays ASCII-safe in transport): yields (doc_id, lang, decorated).
    */
  val decoratedPairsSql: String = {
    // chr(233) = é precomposed; chr(769) = combining acute
    val nfc = "' caf' || chr(233) || ' r' || chr(233) || 'sum' || chr(233)"
    val nfd = "' cafe' || chr(769) || ' re' || chr(769) || 'sume' || chr(769)"
    s"""SELECT d.doc_id, p.lang,
       |       p.text || CASE WHEN d.doc_id % 2 = 0 THEN $nfc ELSE $nfd END
       |         AS decorated
       |FROM documents d
       |JOIN documents p ON p.doc_id = d.doc_id - d.doc_id % 2""".stripMargin
  }

  val entries: Seq[QueryEntry] = Seq(
    // Per-language NFC dedup lift over the planted two-crawl corpus:
    // raw md5-distinct counts every byte variant, NFC md5-distinct
    // collapses canonically-equal pairs; lift = raw - nfc. DuckDB
    // re-derives both fingerprint sets with its own nfc_normalize —
    // a normalizer disagreement on ANY doc breaks the hash.
    QueryEntry.sql(
      "q201_nfc_dedup",
      s"""WITH deco AS ($decoratedPairsSql)
         |SELECT lang,
         |       COUNT(*) AS n_docs,
         |       COUNT(DISTINCT md5(decorated)) AS distinct_raw,
         |       COUNT(DISTINCT md5(nfc_normalize(decorated))) AS distinct_nfc,
         |       COUNT(DISTINCT md5(decorated))
         |         - COUNT(DISTINCT md5(nfc_normalize(decorated))) AS dup_lift
         |FROM deco GROUP BY 1 ORDER BY lang""".stripMargin,
    ) { (s, dir) =>
      val deco = decoratedPairs(Tables(s, dir).documentsRebalanced)
      deco.groupBy("lang")
        .agg(
          count(lit(1)).as("n_docs"),
          countDistinct(md5(col("decorated"))).as("distinct_raw"),
          countDistinct(md5(GraftFunctions.nfcNormalize(col("decorated"))))
            .as("distinct_nfc"),
          (countDistinct(md5(col("decorated"))) -
            countDistinct(md5(GraftFunctions.nfcNormalize(col("decorated")))))
            .as("dup_lift"))
        .orderBy("lang")
    },
  )
}
