package graft

import graft.operators.{AutoDispatch, Fuzzy, Similarity}
import org.apache.spark.sql.functions._

/** r10 VERDICT item 3: the documented reference-semantics quadratics
  * (q22/q155/q172) must auto-route to their certified escape paths
  * above a size threshold, with an explicit reference-mode opt-out —
  * these laws prove the dispatch flips exactly at the threshold and
  * that each side of the flip is the intended operator.
  */
class AutoDispatchSpec extends SparkSpec {
  import spark.implicits._

  test("useExact flips exactly at the threshold; reference mode overrides") {
    assert(AutoDispatch.useExact(100L, 100L, refSemantics = false))
    assert(!AutoDispatch.useExact(101L, 100L, refSemantics = false))
    assert(AutoDispatch.useExact(101L, 100L, refSemantics = true))
    assert(AutoDispatch.useExact(Long.MaxValue, 0L, refSemantics = true))
    assert(!AutoDispatch.useExact(1L, 0L, refSemantics = false))
  }

  test("oracle-gated escape dispatch fails loud, naming op and threshold") {
    // ungated: the escape route is a plain false
    assert(!AutoDispatch.decide(101L, 100L, "q22_x",
      refSemantics = false, gated = false))
    // gated + over budget: throws rather than silently failing the
    // exact-form oracle downstream (r11 ADVICE item 3)
    val e = intercept[IllegalStateException] {
      AutoDispatch.decide(101L, 100L, "q22_x",
        refSemantics = false, gated = true)
    }
    assert(e.getMessage.contains("q22_x") && e.getMessage.contains("100"))
    // gated + under budget, or gated + reference mode: exact, no throw
    assert(AutoDispatch.decide(100L, 100L, "q22_x",
      refSemantics = false, gated = true))
    assert(AutoDispatch.decide(101L, 100L, "q22_x",
      refSemantics = true, gated = true))
  }

  test("q155 dispatch: below threshold = brand-blocked, above = prefix-blocked") {
    // two parts, same brand, DIFFERENT first tokens: the pair is a
    // brand-block candidate but NOT a prefix-block candidate — the
    // observable that distinguishes the two paths
    val part = Seq(
      (1L, "Brand#1", "alpha steel wide"),
      (2L, "Brand#1", "omega steel wide"),
      (3L, "Brand#1", "alpha steel fine"),
    ).toDF("p_partkey", "p_brand", "p_name")
    val exact = Fuzzy.jaroWinklerTopKAuto(part, k = 20, maxExactRows = 3L)
      .select("key_a", "key_b").as[(Long, Long)].collect().toSet
    val escaped = Fuzzy.jaroWinklerTopKAuto(part, k = 20, maxExactRows = 2L)
      .select("key_a", "key_b").as[(Long, Long)].collect().toSet
    // exact (reference) path: all three same-brand pairs
    assert(exact == Set((1L, 2L), (1L, 3L), (2L, 3L)), exact)
    // escape path: only the shared-first-token pair survives
    assert(escaped == Set((1L, 3L)), escaped)
    // both routes agree with their named operators
    assert(exact == Fuzzy.jaroWinklerBlocked(part, 20)
      .select("key_a", "key_b").as[(Long, Long)].collect().toSet)
    assert(escaped == Fuzzy.jaroWinklerPrefixBlocked(part, 20)
      .select("key_a", "key_b").as[(Long, Long)].collect().toSet)
  }

  test("q172 dispatch: same columns both sides; escape = bucketed estimator") {
    val part = Tables(spark, sf).part.limit(200)
    val exact = Fuzzy.erBlockingRecallAuto(part, minJw = 0.9,
      maxExactRows = 1000000L)
    val escaped = Fuzzy.erBlockingRecallAuto(part, minJw = 0.9,
      maxExactRows = 1L)
    assert(exact.columns.toSeq == Seq("n_full", "n_prefix", "n_overlap", "pair_recall"))
    assert(escaped.columns.toSeq == exact.columns.toSeq)
    val eRow = exact.collect().head
    val sRow = escaped.collect().head
    // the estimator samples pairs: counts can only shrink
    assert(sRow.getAs[Long]("n_full") <= eRow.getAs[Long]("n_full"))
    assert(sRow.getAs[Long]("n_prefix") <= eRow.getAs[Long]("n_prefix"))
    // routing identity with the named operators
    assert(eRow == Fuzzy.erBlockingRecall(part, 0.9).collect().head)
    assert(sRow == Fuzzy.erBlockingRecallBucketed(part, 0.9)
      .select("n_full", "n_prefix", "n_overlap", "pair_recall").collect().head)
  }

  test("q22 dispatch: below threshold = exact pairs, above = ANN candidates") {
    val emb = Tables(spark, sf).embeddings.limit(64)
    val n = emb.count()
    val exact = Similarity.cosinePairsAuto(emb, threshold = 0.45,
      maxExactRows = n)
      .as[(Long, Long, Double)].collect().toSet
    val escaped = Similarity.cosinePairsAuto(emb, threshold = 0.45,
      maxExactRows = n - 1)
      .as[(Long, Long, Double)].collect().toSet
    // routing identity with the named operators
    assert(exact == Similarity.exactCosinePairs(emb, 0.45)
      .as[(Long, Long, Double)].collect().toSet)
    assert(escaped == operators.Ivf.annNearDupPairs(emb, 0.45)
      .as[(Long, Long, Double)].collect().toSet)
    // the escape generates a SUBSET of the exact pairs (candidate
    // pruning never invents a pair, and scores are computed the same)
    assert(escaped.subsetOf(exact), (escaped -- exact).take(5).toString)
  }
}
