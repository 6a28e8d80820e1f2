package graft

import org.apache.spark.sql.functions._

/** Round-15 (optimization round 2) equivalence pins: every fused or
  * restructured operator must reproduce its compositional form
  * bit-for-bit on the real fixture plus adversarial inputs.
  */
class Round15Spec extends SparkSpec {

  test("char_bigram_counts equals the compositional substr occurrence counts") {
    import spark.implicits._
    // real fixture text (the q251 normalization), plus adversarial
    // unicode: combining marks, CJK, supplementary-plane emoji (4-byte
    // UTF-8 — one CHARACTER to substr), and the minimal 2-char string
    val docs = Tables(spark, sf).documents
      .select(col("doc_id"),
        regexp_replace(lower(col("text")), "\\s+", " ").as("t"))
      .filter(length(col("t")) >= 2)
    val uni = Seq(
      (900001L, "añb́ añ"),
      (900002L, "日本語テキ日本"),
      (900003L, "a😀b😀a"),
      (900004L, "ab")).toDF("doc_id", "t")
    val all = docs.union(uni)
    val fused = all
      .select(col("doc_id"),
        explode(graft.functions.GraftFunctions.charBigramCounts(col("t")))
          .as(Seq("bg", "c")))
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    val compositional = all
      .select(col("doc_id"), col("t"),
        explode(expr("sequence(1, length(t) - 1)")).as("p"))
      .select(col("doc_id"), expr("substr(t, p, 2)").as("bg"))
      .groupBy("doc_id", "bg").count()
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(fused === compositional)
    assert(fused.nonEmpty)
  }

  test("nb_score_accum sums equal the per-lang join/aggregate form") {
    import spark.implicits._
    val langs = Seq("de", "en", "fr")
    val rows = Seq(
      // (doc, bg, c) with a model map per bg
      (1L, "ab", 3L, Map("en" -> 10L, "fr" -> -7L)),
      (1L, "bc", 2L, Map("de" -> 5L)),
      (2L, "ab", 1L, Map("en" -> 10L, "fr" -> -7L)),
      (2L, "zz", 4L, Map.empty[String, Long]))
      .toDF("doc_id", "c", "cc", "lps")
      .select(col("doc_id"), col("cc").as("c"), col("lps"))
    val acc = rows.groupBy("doc_id")
      .agg(graft.functions.GraftFunctions
        .nbScoreAccum(col("c"), col("lps"), langs).as("a"))
      .collect().map(r => r.getLong(0) -> r.getStruct(1)).toMap
    // doc 1: nb=5; en: sm=3*10, mc=3; fr: sm=3*-7, mc=3; de: sm=2*5, mc=2
    val a1 = acc(1L)
    assert(a1.getLong(0) === 5L)
    assert(a1.getSeq[Long](1) === Seq(10L, 30L, -21L)) // de, en, fr
    assert(a1.getSeq[Long](2) === Seq(2L, 3L, 3L))
    // doc 2: nb=5 (the unmatched zz counts in nb only)
    val a2 = acc(2L)
    assert(a2.getLong(0) === 5L)
    assert(a2.getSeq[Long](1) === Seq(0L, 10L, -7L))
    assert(a2.getSeq[Long](2) === Seq(0L, 1L, 1L))
  }

  test("cov_moments passes NaN/Infinity through with the old cast semantics") {
    import spark.implicits._
    // the replaced round(x,0).cast(long) pipeline mapped NaN → 0 and
    // ±Inf → Long.Max/MinValue; a non-finite float must not crash
    val df = Seq(
      Array(Float.PositiveInfinity, Float.NaN)).toDF("embedding")
      .select(col("embedding").cast("array<float>"))
    val m = df.agg(graft.functions.GraftFunctions
      .covMoments(col("embedding")).as("m")).select("m.*").head()
    assert(m.getSeq[Long](0) === Seq(1L, 1L)) // n counts the row
    assert(m.getSeq[Long](1) === Seq(Long.MaxValue, 0L)) // +Inf, NaN
    // products: Inf·Inf → MaxValue, Inf·NaN → 0, NaN·NaN → 0
    assert(m.getSeq[Long](2) === Seq(Long.MaxValue, 0L, 0L))
  }
}
