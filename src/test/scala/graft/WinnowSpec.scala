package graft

import graft.operators.Winnow

/** The winnowing guarantee (Schleimer/Wilkerson/Aiken): documents
  * sharing a substring of length ≥ k+w−1 share at least one selected
  * fingerprint — that containment is the whole point of the scheme.
  */
class WinnowSpec extends SparkSpec {
  import spark.implicits._

  test("shared long substring ⇒ shared fingerprint; disjoint texts ⇒ none") {
    val shared = "the quick brown fox jumps over the lazy dog"
    val docs = Seq(
      (1L, s"prefix one $shared and then something"),
      (2L, s"a different beginning $shared with another tail"),
      (3L, "entirely unrelated content with zero overlap at all here"),
    ).toDF("doc_id", "text")
    val fps = Winnow.fingerprints(docs).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    assert((fps(1L) & fps(2L)).nonEmpty, "shared substring must surface")
    assert((fps(1L) & fps(3L)).isEmpty, "disjoint docs must not collide")
  }

  test("boundary: a doc of exactly k+w-1 chars yields exactly one fingerprint") {
    val docs = Seq((1L, "abcdefghijk"), (2L, "abcdefghij")) // 11 and 10 chars
      .toDF("doc_id", "text")
    val fps = Winnow.fingerprints(docs).collect()
    assert(fps.map(_.getLong(0)).toSet == Set(1L), "10-char doc must be filtered")
    assert(fps.length == 1, "k+w-1 chars → one full window → one fingerprint")
  }

  test("fingerprint count is bounded by kept positions and ≥ 1") {
    val out = run("q68_winnow_fingerprints").collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val n = r.getLong(1)
      assert(n >= 1L)
      assert(r.getLong(2) <= r.getLong(3)) // min_fp ≤ max_fp
    }
  }

  test("bigram familiarity ranks repetitive-common text above rare-char text") {
    val docs = Seq(
      (1L, "the cat sat on the mat and the cat sat again"),
      (2L, "zqxj wvkq bzpf jqzv xkwq"),
    ).toDF("doc_id", "text")
    val f = Winnow.bigramFamiliarity(docs).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(f(1L) > f(2L), s"common-bigram doc must score higher: $f")
  }

  test("hot-key report: counts, shares, and deterministic tie order") {
    import graft.operators.Skew
    val df = (Seq.fill(6)(7L) ++ Seq.fill(3)(1L) ++ Seq.fill(3)(2L) ++ Seq(9L))
      .toDF("k")
    val top = Skew.hotKeys(df, "k", 3).collect()
    assert(top.map(_.getLong(0)).toSeq == Seq(7L, 1L, 2L)) // ties → key asc
    assert(top.head.getLong(1) == 6L)
    assert(math.abs(top.head.getDouble(2) - 6.0 / 13.0) < 1e-6)
  }

  test("n-gram decontamination flags a shared 5-word phrase, not disjoint text") {
    val phrase = "the quick brown fox jumps"
    val eval = Seq((100L, s"evaluation question about $phrase here")).toDF("doc_id", "text")
    val train = Seq(
      (1L, s"training text containing $phrase in the middle of it"),
      (2L, "completely different words with no overlap whatsoever at all"),
    ).toDF("doc_id", "text")
    val flagged = Winnow.ngramContaminated(train, eval, n = 5)
      .collect().map(_.getLong(0)).toSet
    assert(flagged == Set(1L))
  }

  test("repetition ratio: repeated text scores high, unique text low") {
    val docs = Seq(
      (1L, "spamspam" * 20), // one 8-gram repeated
      (2L, ('a' to 'z').mkString + ('0' to '9').mkString), // all distinct (post-lowering)
    ).toDF("doc_id", "text")
    val r = Winnow.repetitionRatio(docs).collect()
      .map(x => x.getLong(0) -> x.getDouble(3)).toMap
    assert(r(1L) > 0.9, s"repeated doc: ${r(1L)}")
    assert(r(2L) == 0.0, s"unique doc: ${r(2L)}")
  }

  test("corpus split is exhaustive, disjoint, and ~80/10/10") {
    val rows = run("q69_corpus_split").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = Tables(spark, sf).documents.count()
    assert(rows.values.sum == total)
    assert(rows("train") > rows("val") && rows("train") > rows("test"))
    // hash split at n=500: generous tolerance, determinism is the contract
    assert(rows("train").toDouble / total > 0.7)
  }
}
