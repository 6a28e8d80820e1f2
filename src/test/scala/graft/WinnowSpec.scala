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

  test("filter funnel: gates are cumulative and each drops documents on the fixture") {
    val rows = run("q186_filter_funnel").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, l, rp, f) = (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(n >= l && l >= rp && rp >= f, s"funnel must be monotone: $r")
      assert(f > 0, s"thresholds must not annihilate a language: $r")
    }
    // across the corpus, every gate must actually discriminate
    val tot = rows.map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .reduce((a, b) => (a._1 + b._1, a._2 + b._2, a._3 + b._3, a._4 + b._4))
    assert(tot._2 < tot._1 && tot._3 < tot._2 && tot._4 < tot._3,
      s"some gate dropped nothing: $tot")
  }

  test("source scorecard: dup rate and mean tokens on a known mini-corpus") {
    val docs = Seq(
      (1L, "srcA", "the quick brown fox jumps over it"),
      (2L, "srcA", "the quick brown fox jumps over it"), // exact dup of 1
      (3L, "srcA", "completely different content here today"),
      (4L, "srcB", "one single document for this source"),
    ).toDF("doc_id", "source", "text")
    val rows = Winnow.sourceScorecard(docs).collect()
      .map(r => r.getString(0) -> r).toMap
    val a = rows("srcA")
    assert(a.getLong(1) == 3L)
    assert(math.abs(a.getDouble(2) - 1.0 / 3) < 1e-6, s"dup_rate ${a.getDouble(2)}")
    assert(math.abs(a.getDouble(3) - (7 + 7 + 5) / 3.0) < 1e-6) // mean tokens
    val b = rows("srcB")
    assert(b.getLong(1) == 1L && b.getDouble(2) == 0.0 && b.getDouble(3) == 6.0)
    // signal means exist and are in range
    rows.values.foreach { r =>
      assert(r.getDouble(4) > 0.0)              // familiarity ≥ 1 by definition
      assert(r.getDouble(5) >= 0.0 && r.getDouble(5) <= 1.0)
    }
  }

  test("contamination attribution: names the eval doc and counts shared grams") {
    val phrase = "the quick brown fox jumps" // one 5-gram
    val eval = Seq((100L, s"question about $phrase here maybe")).toDF("doc_id", "text")
    val train = Seq(
      (1L, s"some training row with $phrase inside of it"),
      (2L, "completely different words with no overlap whatsoever at all"),
      (3L, s"another one also containing $phrase and $phrase again"),
    ).toDF("doc_id", "text")
    val rows = Winnow.contaminationAttribution(train, eval, n = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(rows.keySet == Set((1L, 100L), (3L, 100L)), s"got $rows")
    assert(rows((1L, 100L)) == 1L) // exactly the one shared 5-gram
    assert(rows((3L, 100L)) == 1L) // repeats in doc 3 count once (distinct)
  }

  test("bigram log-prob: hand-computed smoothed model on a 2-doc corpus") {
    // doc1 = "a b a b", doc2 = "a b c": c12(a,b)=3, c12(b,a)=1,
    // c12(b,c)=1; ctx(a)=3, ctx(b)=2; V=3.
    // lp(a,b)=round(ln(4/6),6)=-0.405465; lp(b,a)=lp(b,c)=round(ln(2/5),6)=-0.916291
    val toks = Seq(
      (1L, 0, "a"), (1L, 1, "b"), (1L, 2, "a"), (1L, 3, "b"),
      (2L, 0, "a"), (2L, 1, "b"), (2L, 2, "c"),
    ).toDF("doc_id", "pos", "term")
    val out = Winnow.bigramLogProb(toks).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3))))
      .toMap
    val (n1, s1, a1) = out(1L)
    assert(n1 == 3L)
    assert(math.abs(s1 - (2 * -0.405465 + -0.916291)) < 1e-9, s"doc1 sum $s1")
    assert(math.abs(a1 - s1 / 3) < 1e-12)
    val (n2, s2, _) = out(2L)
    assert(n2 == 2L)
    assert(math.abs(s2 - (-0.405465 + -0.916291)) < 1e-9, s"doc2 sum $s2")
    // the common bigram scores above the rare ones: doc1's mean beats doc2's
    assert(a1 > out(2L)._3)
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
