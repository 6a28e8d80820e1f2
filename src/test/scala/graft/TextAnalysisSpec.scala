package graft

import graft.operators.TextAnalysis
import org.apache.spark.sql.functions._

/** Language-ID scorer semantics on text with REAL signal — the
  * synthetic fixture draws from one shared English-like vocabulary for
  * every lang label, so the meaningful diagonal test lives here, on
  * planted native-orthography sentences.
  */
class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  private val planted = TextAnalysis.plantedSentences

  test("lang-ID scores a perfect diagonal on planted native text (>90% required)") {
    val df = planted.toDF("lang", "text")
      .select(col("lang"), TextAnalysis.langPredicted(col("text")).as("predicted"))
    val rows = df.collect().map(r => (r.getString(0), r.getString(1)))
    val correct = rows.count { case (l, p) => l == p }
    assert(correct.toDouble / rows.length > 0.9,
      s"diagonal ${correct}/${rows.length}: ${rows.mkString(", ")}")
  }

  test("q58 packing computes its prefix sum without a single-partition window") {
    // inspect the lazy pre-checkpoint plan — the materialized form
    // returns a checkpoint-backed scan that hides the window shape
    val df = TextAnalysis.sequencePack(Tables(spark, sf).documents,
      budget = 512, materialize = false)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange SinglePartition"), plan.take(2000))
    assert(plan.toLowerCase.contains("hashpartitioning(bkt"), plan.take(2000))
  }

  test("q183 packing efficiency conserves docs and tokens; overflow only past budget") {
    import org.apache.spark.sql.functions._
    val r = run("q183_packing_efficiency").collect().head
    val docs = Tables(spark, sf).documents
    val nDocs = docs.count()
    val totTok = docs
      .select(sum(size(TextAnalysis.tokens(col("text")))).cast("long"))
      .head().getLong(0)
    assert(r.getLong(1) == nDocs, "every doc lands in exactly one pack")
    assert(r.getLong(2) == totTok, "token conservation across packs")
    assert(r.getLong(3) >= 1 && r.getLong(3) <= r.getLong(4))
    assert(r.getLong(6) <= r.getLong(0), "overflow packs bounded by pack count")
  }

  test("lang-ID falls back to stopword evidence, then the en prior") {
    val df = Seq(
      "der und ist das die ein",   // German stopwords, no markers
      "xyzzy plugh 12345",         // no evidence at all → en prior
    ).toDF("text").select(TextAnalysis.langPredicted(col("text")).as("p"))
    val ps = df.as[String].collect()
    assert(ps(0) == "de", ps.mkString(","))
    assert(ps(1) == "en", ps.mkString(","))
  }

  test("normalizeText is idempotent and strips case/punct/space noise") {
    val df = Seq(
      "  Hello,   WORLD!! ",
      "hello world",
      "a--b\tc",
    ).toDF("text").select(TextAnalysis.normalizeText(col("text")).as("n"))
    val ns = df.as[String].collect()
    assert(ns(0) == "hello world", ns(0))
    assert(ns(1) == "hello world")
    assert(ns(2) == "a b c", ns(2))
    // idempotence: normalizing a normalized string is the identity
    val twice = df.select(TextAnalysis.normalizeText(col("n")).as("n2"))
      .as[String].collect()
    assert(ns.sameElements(twice))
  }

  test("q91 weighted sample favors the weighted sources and is top-k planned") {
    val got = run("q91_weighted_sample")
    val bySource = got.collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // weight-4 sources (src0-4) must outdraw weight-1 sources in total;
    // each source holds 25 docs at this sf, so counts are comparable
    val w4 = (0 to 4).map(i => bySource.getOrElse(s"src$i", 0L)).sum
    val w1 = (10 to 19).map(i => bySource.getOrElse(s"src$i", 0L)).sum / 2
    assert(w4 > w1, s"w4=$w4 vs scaled w1=$w1: $bySource")
    // the selection is TakeOrdered, never a global sort
    val plan = SparkEntry.queries("q91_weighted_sample")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan.take(2000))
  }
}
