package graft

import graft.operators.Curation
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Quota capping, BPE pair counting, and balanced shard striping —
  * each checked against an in-test brute force.
  */
class CurationSpec extends SparkSpec {
  import spark.implicits._

  // -- domain quota cap ----------------------------------------------

  test("domainQuotaCap: under-cap domains survive whole, capped domains match window brute force") {
    val docs = Tables(spark, sf).documents
    val cap = 3
    val got = Curation.domainQuotaCap(docs, "lang", cap).collect()
      .map(r => r.getAs[String]("domain") ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("n_kept"), r.getAs[Long]("chars_kept"))).toMap

    val bucket =
      conv(substring(md5(col("doc_id").cast("string").cast("binary")), 1, 15), 16, 10)
        .cast("long") % 1048576L
    val w = Window.partitionBy("lang").orderBy(col("b"), col("doc_id"))
    val brute = docs.withColumn("b", bucket)
      .withColumn("rk", row_number().over(w))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("rk") <= cap, 1L).otherwise(0L)).as("k"),
        sum(when(col("rk") <= cap, col("n_chars")).otherwise(0L)).as("ch"))
      .collect()
      .map(r => r.getAs[String]("lang") ->
        (r.getAs[Long]("n"), r.getAs[Long]("k"), r.getAs[Long]("ch"))).toMap

    assert(got == brute)
    assert(got.values.forall { case (n, k, _) => k == math.min(n, cap.toLong) })
  }

  test("domainQuotaCap: deterministic across reruns and input partitioning") {
    val docs = Tables(spark, sf).documents
    val a = Curation.domainQuotaCap(docs, "lang", 5).collect().toSeq
    val b = Curation.domainQuotaCap(docs.repartition(13), "lang", 5).collect().toSeq
    assert(a == b)
  }

  // -- BPE pair counts ------------------------------------------------

  test("bpePairCounts: hand-checked pair weights; single-char terms contribute nothing") {
    // vocab: "abc" freq 2 -> pairs ab, bc each weighted 2
    //        "ab"  freq 1 -> pair ab weighted 1
    //        "a"   freq 5 -> no pairs (the sequence(1, len-1) guard)
    val toks = (Seq.fill(2)("abc") ++ Seq("ab") ++ Seq.fill(5)("a"))
      .zipWithIndex.map { case (t, i) => (i.toLong, i, t) }
      .toDF("doc_id", "pos", "term")
    val rows = Curation.bpePairCounts(toks, k = 10)
      .as[(String, Long)].collect().toSeq
    assert(rows == Seq(("ab", 3L), ("bc", 2L)))
  }

  test("bpePairCounts: explodes the vocab, not the corpus (weighting is by term freq)") {
    // one term repeated 1000x must weight its pairs 1000, from ONE vocab row
    val toks = Seq.fill(1000)("xy").zipWithIndex
      .map { case (t, i) => (i.toLong, i, t) }.toDF("doc_id", "pos", "term")
    val rows = Curation.bpePairCounts(toks, k = 5).as[(String, Long)].collect().toSeq
    assert(rows == Seq(("xy", 1000L)))
  }

  // -- duplicated n-gram rate ----------------------------------------

  test("dupNgramRate: hand-checked counts; a unique doc dilutes the rate") {
    // doc 1 "a b a b a": bigrams (a b)x2 (b a)x2 -> all 4 duplicated
    // doc 2 "x y": bigram (x y)x1 -> unique
    val toks = Seq(
      (1L, 0, "a"), (1L, 1, "b"), (1L, 2, "a"), (1L, 3, "b"), (1L, 4, "a"),
      (2L, 0, "x"), (2L, 1, "y"),
    ).toDF("doc_id", "pos", "term")
    val r = Curation.dupNgramRate(toks, n = 2).collect().head
    assert(r.getAs[Long]("n_grams") == 5L)
    assert(r.getAs[Long]("n_distinct") == 3L)
    assert(r.getAs[Long]("dup_occurrences") == 4L)
    assert(r.getAs[Double]("dup_rate") == 0.8)
  }

  test("dupNgramRate: grams never span documents") {
    // two docs ending/starting with the same terms must NOT join up
    val toks = Seq((1L, 0, "a"), (1L, 1, "b"), (2L, 0, "b"), (2L, 1, "a"))
      .toDF("doc_id", "pos", "term")
    val r = Curation.dupNgramRate(toks, n = 2).collect().head
    assert(r.getAs[Long]("n_grams") == 2L) // "a b" and "b a", one each
    assert(r.getAs[Long]("dup_occurrences") == 0L)
  }

  // -- contamination score -------------------------------------------

  test("contaminationScore: hand-checked hit fraction against the train split") {
    // eval doc 2 "a b c" -> grams {a b, b c}; train doc 1 has "a b",
    // train doc 3 shares nothing -> contamination 1/2
    val toks = Seq(
      (1L, 0, "a"), (1L, 1, "b"), (1L, 2, "x"),
      (2L, 0, "a"), (2L, 1, "b"), (2L, 2, "c"),
      (3L, 0, "q"), (3L, 1, "r"),
    ).toDF("doc_id", "pos", "term")
    val rows = Curation.contaminationScore(toks, n = 2, evalMod = 2).collect()
    assert(rows.length == 1)
    val r = rows.head
    assert(r.getAs[Long]("doc_id") == 2L)
    assert(r.getAs[Long]("n_grams") == 2L)
    assert(r.getAs[Long]("n_hit") == 1L)
    assert(r.getAs[Double]("contamination") == 0.5)
  }

  test("contaminationScore: repeated eval grams count once (distinct semantics)") {
    // eval doc 4 repeats "a b" three times; train has it -> 1 gram, 1 hit
    val toks = Seq(
      (4L, 0, "a"), (4L, 1, "b"), (4L, 2, "a"), (4L, 3, "b"), (4L, 4, "a"), (4L, 5, "b"),
      (1L, 0, "a"), (1L, 1, "b"),
    ).toDF("doc_id", "pos", "term")
    val r = Curation.contaminationScore(toks, n = 2, evalMod = 2).collect().head
    assert(r.getAs[Long]("n_grams") == 2L) // distinct grams: "a b", "b a"
    assert(r.getAs[Long]("n_hit") == 1L)
  }

  // -- balanced shards ------------------------------------------------

  test("balancedShards: two-phase distributed rank equals the single-window brute force") {
    val docs = Tables(spark, sf).documents
    val n = 8
    val got = Curation.balancedShards(docs, n).collect()
      .map(r => (r.getAs[Long]("shard"), r.getAs[Long]("n_docs"), r.getAs[Long]("total_chars")))

    val w = Window.orderBy(desc("n_chars"), col("doc_id"))
    val brute = docs.withColumn("rk", row_number().over(w))
      .withColumn("shard", (col("rk") - 1) % n)
      .groupBy("shard")
      .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("total_chars"))
      .orderBy("shard").collect()
      .map(r => (r.getAs[Long]("shard"), r.getAs[Long]("n_docs"), r.getAs[Long]("total_chars")))

    assert(got.toSeq == brute.toSeq)
    // striping property: per-shard doc counts differ by at most 1
    val counts = got.map(_._2)
    assert(counts.max - counts.min <= 1)
  }

  test("percentileTransform: matches the single-window brute force; endpoints are 0 and 1") {
    val docs = Tables(spark, sf).documents.select("doc_id", "n_chars")
    val got = Curation.percentileTransform(docs, "n_chars", "doc_id").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("pct")).toMap
    val w = Window.orderBy(col("n_chars"), col("doc_id"))
    val n = docs.count()
    val brute = docs.withColumn("rk", row_number().over(w))
      .withColumn("pct", round((col("rk") - 1).cast("double") / (n - 1).toDouble, 6))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("pct")).toMap
    assert(got == brute)
    assert(got.values.min == 0.0 && got.values.max == 1.0)
  }

  test("equiDepth: equal bucket depths (B | N), contiguous non-overlapping bounds") {
    val docs = Tables(spark, sf).documents
    val rows = operators.HistQuantile.equiDepth(docs, buckets = 10).collect()
      .map(r => (r.getAs[Long]("bucket"), r.getAs[Long]("n_rows"),
        r.getAs[Long]("lo"), r.getAs[Long]("hi")))
    assert(rows.map(_._1).toSeq == (0L until 10L))
    // 500 docs / 10 buckets: exactly 50 each
    assert(rows.forall(_._2 == docs.count() / 10))
    // boundaries are monotone: each bucket's lo >= the previous hi is
    // not guaranteed at ties, but hi must be non-decreasing and lo <= hi
    assert(rows.forall(r => r._3 <= r._4))
    assert(rows.map(_._4).toSeq == rows.map(_._4).toSeq.sorted)
  }

  test("sortedNeighborhood: string-bucket two-phase rank reproduces the single-window pair set") {
    val part = Tables(spark, sf).part
    val got = operators.Fuzzy.sortedNeighborhood(part, w = 4, minJw = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val w = Window.orderBy(col("p_name"), col("p_partkey"))
    val ranked = part.select(col("p_partkey"), col("p_name"))
      .withColumn("r", row_number().over(w))
    val brute = ranked.as("a").join(ranked.as("b"),
        col("b.r") > col("a.r") && col("b.r") <= col("a.r") + 4)
      .filter(round(graft.functions.GraftFunctions
        .jaroWinkler(col("a.p_name"), col("b.p_name")), 6) >= 0.9)
      .select(col("a.p_partkey"), col("b.p_partkey"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == brute && got.nonEmpty)
  }

  test("balancedShards: exact ranks survive ties inside and across buckets") {
    // widths all in one or two buckets, heavy ties on n_chars
    val docs = (1 to 97).map(i => (i.toLong, 64 + (i % 3))).toDF("doc_id", "n_chars")
    val got = Curation.balancedShards(docs, nShards = 4, bucketWidth = 2).collect()
      .map(r => (r.getAs[Long]("shard"), r.getAs[Long]("n_docs"), r.getAs[Long]("total_chars")))
    val w = Window.orderBy(desc("n_chars"), col("doc_id"))
    val brute = docs.withColumn("rk", row_number().over(w))
      .withColumn("shard", (col("rk") - 1) % 4)
      .groupBy("shard")
      .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("total_chars"))
      .orderBy("shard").collect()
      .map(r => (r.getAs[Long]("shard"), r.getAs[Long]("n_docs"), r.getAs[Long]("total_chars")))
    assert(got.toSeq == brute.toSeq)
  }

  // -- exact-substring span-removal dedup -----------------------------

  test("spanDedup: hand-built corpus — cross-doc and within-doc duplicated grams cover correctly") {
    // bigrams (n=2): "a b" appears in docs 1 and 2 (cross-doc dup);
    // "p q" appears twice inside doc 3 (within-doc dup); doc 4 is clean
    val toks = Seq(
      (1L, Seq("a", "b", "c", "d")),
      (2L, Seq("x", "a", "b", "y")),
      (3L, Seq("p", "q", "p", "q")),
      (4L, Seq("u", "v", "w")),
    ).flatMap { case (d, ts) =>
      ts.zipWithIndex.map { case (t, i) => (d, i + 1, t) }
    }.toDF("doc_id", "pos", "term")

    val got = Curation.spanDedup(toks, n = 2).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_tokens"), r.getAs[Long]("n_removed"),
          r.getAs[String]("clean_md5"))).toMap

    def md5hex(s: String): String = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      d.map("%02x".format(_)).mkString
    }
    // doc 1: a,b removed -> "c d"; doc 2: a,b removed -> "x y";
    // doc 3: fully covered -> ""; doc 4: untouched
    assert(got(1L) == ((4L, 2L, md5hex("c d"))))
    assert(got(2L) == ((4L, 2L, md5hex("x y"))))
    assert(got(3L) == ((4L, 4L, md5hex(""))))
    assert(got(4L) == ((3L, 0L, md5hex("u v w"))))
  }

  test("spanDedup: partitioning-invariant and removal counts bounded by doc size") {
    val toks = sources.TokenizedCorpus.tokens(spark, sf)
    val a = Curation.spanDedup(toks, n = 5).collect().toSeq
    val b = Curation.spanDedup(toks.repartition(17), n = 5).collect().toSeq
    assert(a == b && a.nonEmpty)
    assert(a.forall { r =>
      val n = r.getAs[Long]("n_tokens"); val rm = r.getAs[Long]("n_removed")
      rm >= 0L && rm <= n
    })
  }

  // -- DSIR importance weights ----------------------------------------

  test("dsirWeights: toy corpus matches a plain-Scala refit of the hashed model") {
    val docs = Seq((1L, "en"), (2L, "fr"), (3L, "fr"))
      .toDF("doc_id", "lang")
    val toks = Seq(
      (1L, 1, "a"), (1L, 2, "b"),
      (2L, 1, "a"), (2L, 2, "b"),
      (3L, 1, "c"), (3L, 2, "d"),
    ).toDF("doc_id", "pos", "term")
    val B = 4096

    // independent refit: MessageDigest md5 -> leading 60 bits -> bucket
    def bucket(g: String): Long = {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(g.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(h.take(15), 16) % B
    }
    val grams = Seq((1L, "a b", true), (2L, "a b", false), (3L, "c d", false))
    val byB = grams.groupBy { case (_, g, _) => bucket(g) }
    val (tt, tr) = (grams.count(_._3).toDouble, grams.size.toDouble)
    def lw(b: Long): BigDecimal = {
      val cell = byB(b)
      val nt = cell.count(_._3); val nr = cell.size
      BigDecimal(math.log((nt + 1.0) / (tt + B)) - math.log((nr + 1.0) / (tr + B)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP)
    }
    val expected = grams.groupBy(_._1).map { case (d, gs) =>
      d -> gs.map(g => lw(bucket(g._2))).sum.toDouble
    }

    val got = Curation.dsirWeights(toks, docs, "en", buckets = B).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_bigrams"), r.getAs[Double]("weight"))).toMap
    assert(got.keySet == Set(1L, 2L, 3L))
    assert(got.values.forall(_._1 == 1L))
    expected.foreach { case (d, w) =>
      assert(math.abs(got(d)._2 - w) < 1e-9, s"doc $d: ${got(d)._2} vs $w")
    }
    // the target doc's bigram is target-heavy -> strictly higher weight
    assert(got(1L)._2 > got(3L)._2)
  }

  test("dsirWeights: partitioning-invariant; en docs outscore non-en on the fixture") {
    val toks = sources.TokenizedCorpus.tokens(spark, sf)
    val docs = Tables(spark, sf).documents
    val a = Curation.dsirWeights(toks, docs, "en").collect().toSeq
    val b = Curation.dsirWeights(toks.repartition(13), docs, "en").collect().toSeq
    assert(a == b && a.nonEmpty)
    val byLang = docs.select("doc_id", "lang").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("lang")).toMap
    val (en, rest) = a.partition(r => byLang(r.getAs[Long]("doc_id")) == "en")
    def mean(rs: Seq[org.apache.spark.sql.Row]) =
      rs.map(_.getAs[Double]("weight")).sum / rs.size
    assert(mean(en) > mean(rest),
      s"DSIR should rank the target slice higher: ${mean(en)} vs ${mean(rest)}")
  }

  // -- span corruption (q244) ----------------------------------------

  test("q244 mask rate is ~15% corpus-wide and spans merge adjacent blocks") {
    val rows = run("q244_span_corruption").collect()
    val nTok = rows.map(_.getAs[Long]("n_tokens")).sum
    val nMask = rows.map(_.getAs[Long]("n_masked")).sum
    val rate = nMask.toDouble / nTok
    assert(rate > 0.10 && rate < 0.20, s"mask rate $rate")
    rows.foreach { r =>
      val (m, sp, t) = (r.getAs[Long]("n_masked"), r.getAs[Long]("n_spans"),
        r.getAs[Long]("n_tokens"))
      assert(m <= t && sp <= (m + 2) / 3 + 1, r.toString)
      assert((m == 0) == (sp == 0), r.toString)
      assert(r.getAs[String]("corrupted_md5") != null)
    }
  }

  test("q244 reconstruction matches a driver-side replay for every doc") {
    val rows = run("q244_span_corruption").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("corrupted_md5")).toMap
    val docs = Tables(spark, sf).documents
      .select(col("doc_id"), col("text")).as[(Long, String)].collect()
    def mix(x: Long): Long = {
      var z = x + 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }
    def masked(doc: Long, b: Long): Boolean =
      java.lang.Long.remainderUnsigned(mix(doc * 1048576L + b) >>> 11, 100) < 15
    docs.foreach { case (id, text) =>
      val toks = text.trim.toLowerCase.split("\\s+")
      val parts = toks.zipWithIndex.flatMap { case (t, p) =>
        val b = p / 3
        if (!masked(id, b)) Some(t)
        else if (p % 3 == 0 && (b == 0 || !masked(id, b - 1))) Some("<x>")
        else None
      }
      val md5 = java.security.MessageDigest.getInstance("MD5")
        .digest(parts.mkString(" ").getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      assert(rows(id) == md5, s"doc $id")
    }
  }
}
