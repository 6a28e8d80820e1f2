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

  test("lang-ID falls back to stopword evidence, then the en prior") {
    val df = Seq(
      "der und ist das die ein",   // German stopwords, no markers
      "xyzzy plugh 12345",         // no evidence at all → en prior
    ).toDF("text").select(TextAnalysis.langPredicted(col("text")).as("p"))
    val ps = df.as[String].collect()
    assert(ps(0) == "de", ps.mkString(","))
    assert(ps(1) == "en", ps.mkString(","))
  }
}
