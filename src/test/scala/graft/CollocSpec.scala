package graft

import graft.functions.GraftFunctions
import graft.operators.{Colloc, HeavyHitters, Mixture}
import org.apache.spark.sql.functions._

/** Collocation/MI counts, the Misra–Gries sketch in both regimes, and
  * the determinism contract of temperature mixture sampling.
  */
class CollocSpec extends SparkSpec {
  import spark.implicits._

  // -- PMI / MI -------------------------------------------------------

  test("pmiBigrams: hand-checked PMI on a 3-doc corpus") {
    // corpus: "a b", "a b", "a c" -> tokens: a,b,a,b,a,c (n_tok=6)
    // bigrams: (a,b)x2, (a,c)x1 (n_big=3)
    val tok = Seq(
      (1L, 0, "a"), (1L, 1, "b"),
      (2L, 0, "a"), (2L, 1, "b"),
      (3L, 0, "a"), (3L, 1, "c"),
    ).toDF("doc_id", "pos", "term")
    val rows = Colloc.pmiBigrams(tok, minCount = 1, k = 10).collect()
    val ab = rows.find(r => r.getString(0) == "a" && r.getString(1) == "b").get
    // pmi(a,b) = ln((2*6*6)/(3*3*2)) = ln(4)
    assert(ab.getAs[Long]("n_xy") == 2L)
    assert(math.abs(ab.getAs[Double]("pmi") - math.log(4.0)) < 1e-5)
    val ac = rows.find(r => r.getString(0) == "a" && r.getString(1) == "c").get
    // pmi(a,c) = ln((1*36)/(3*3*1)) = ln(4)
    assert(math.abs(ac.getAs[Double]("pmi") - math.log(4.0)) < 1e-5)
  }

  test("pmiBigrams: minCount filters hapax pairs; k caps output") {
    val tok = Seq(
      (1L, 0, "x"), (1L, 1, "y"),
      (2L, 0, "p"), (2L, 1, "q"), (2L, 2, "p"), (2L, 3, "q"),
    ).toDF("doc_id", "pos", "term")
    val rows = Colloc.pmiBigrams(tok, minCount = 2, k = 10).collect()
    // only (p,q) reaches count 2 — (x,y), (q,p) are hapax
    assert(rows.map(r => (r.getString(0), r.getString(1))).toSeq == Seq(("p", "q")))
  }

  test("miCells: independent columns give ~zero MI, dependent give positive") {
    // perfectly dependent: b == a
    val dep = (1 to 100).map(i => (s"k${i % 4}", s"k${i % 4}")).toDF("a", "b")
    val depMi = Colloc.miCells(dep, "a", "b").agg(sum("mi_contrib")).as[Double].head()
    assert(math.abs(depMi - math.log(4.0)) < 1e-4) // H(X) = ln 4 for uniform 4-way
    // independent uniform grid: every cell contributes exactly 0
    val ind = (0 until 100).map(i => (s"a${i % 4}", s"b${i / 4 % 5}")).toDF("a", "b")
    val cells = Colloc.miCells(ind, "a", "b").collect()
    assert(cells.length == 20)
    assert(cells.forall(r => math.abs(r.getAs[Double]("mi_contrib")) < 1e-9))
  }

  // -- Misra–Gries ----------------------------------------------------

  test("freq_sketch exact regime: distinct <= k reproduces exact counts") {
    val df = (1 to 300).map(i => (i % 3, s"item${i % 7}")).toDF("g", "item")
    val got = HeavyHitters.groupedHeavyHitters(df, "g", "item", k = 8)
      .as[(Int, String, Long)].collect().toSeq
    val exact = df.groupBy("g", "item").count()
      .orderBy("g", "item").as[(Int, String, Long)].collect().toSeq
    assert(got == exact)
  }

  test("freq_sketch lossy regime: the N/(k+1) heavy hitter survives with bounded error") {
    // 1000 rows: "hot" appears 400 times, 600 singletons. k=9 ->
    // anything with freq > 1000/10 = 100 must survive; est >= true - N/(k+1).
    val rows = Seq.fill(400)("hot") ++ (1 to 600).map(i => s"cold$i")
    val df = rows.zipWithIndex.map { case (s, i) => (1, s, i) }.toDF("g", "item", "i")
    val sketch = df.groupBy("g")
      .agg(GraftFunctions.freqSketch(col("item"), 9).as("m"))
      .select(explode(col("m"))).as[(String, Long)].collect().toMap
    assert(sketch.contains("hot"))
    assert(sketch("hot") <= 400L)
    assert(sketch("hot") >= 400L - 1000L / 10)
    assert(sketch.size <= 9)
  }

  test("freq_sketch merge: estimates never exceed true counts and survive partial/final") {
    // force many partitions so merge actually runs across partial buffers
    val rows = (1 to 2000).map(i => (1, if (i % 5 == 0) "big" else s"t${i % 40}"))
    val df = rows.toDF("g", "item").repartition(8)
    val sketch = df.groupBy("g")
      .agg(GraftFunctions.freqSketch(col("item"), 12).as("m"))
      .select(explode(col("m"))).as[(String, Long)].collect().toMap
    val exact = rows.groupBy(_._2).map { case (k, v) => k -> v.size.toLong }
    // one-sided error: est <= true, always
    sketch.foreach { case (item, est) => assert(est <= exact(item)) }
    assert(sketch.size <= 12)
  }

  test("freq_sketch: NULL items are skipped") {
    val df = Seq((1, Some("a")), (1, None), (1, Some("a")), (1, None))
      .toDF("g", "item")
    val m = df.groupBy("g").agg(GraftFunctions.freqSketch(col("item"), 4).as("m"))
      .select(explode(col("m"))).as[(String, Long)].collect().toMap
    assert(m == Map("a" -> 2L))
  }

  test("freq_sketch SQL registration") {
    GraftFunctions.registerAll(spark)
    Seq((1, "x"), (1, "x"), (1, "y")).toDF("g", "item").createOrReplaceTempView("fs_in")
    val m = spark.sql("SELECT freq_sketch(item, 4) AS m FROM fs_in GROUP BY g")
      .select(explode(col("m"))).as[(String, Long)].collect().toMap
    assert(m == Map("x" -> 2L, "y" -> 1L))
  }

  // -- vocab coverage / length histogram ------------------------------

  test("vocabCoverage: known corpus; k past the vocabulary covers everything") {
    // terms: a x5, b x3, c x1, d x1 (total 10, vocab 4)
    val toks = Seq.fill(5)("a") ++ Seq.fill(3)("b") ++ Seq("c", "d")
    val df = toks.zipWithIndex.map { case (t, i) => (i.toLong, i, t) }
      .toDF("doc_id", "pos", "term")
    val rows = operators.CorpusOps.vocabCoverage(df, Seq(1, 2, 10)).collect()
    val byK = rows.map(r => r.getAs[Int]("k") ->
      (r.getAs[Long]("covered"), r.getAs[Long]("total"), r.getAs[Long]("vocab"))).toMap
    assert(byK(1) == ((5L, 10L, 4L)))
    assert(byK(2) == ((8L, 10L, 4L)))
    assert(byK(10) == ((10L, 10L, 4L)))
    assert(rows.map(_.getAs[Double]("share")).toSeq == Seq(0.5, 0.8, 1.0))
  }

  test("lengthHistogram: exact power-of-2 buckets, no libm in the path") {
    val docs = Seq(
      (1L, "a"), (2L, "a b"), (3L, "a b c"), (4L, "a b c d"),
      (5L, "a b c d e f g"), (6L, "a b c d e f g h"),
    ).toDF("doc_id", "text")
    val rows = operators.CorpusOps.lengthHistogram(docs)
      .collect().map(r => (r.getAs[Long]("bucket"), r.getAs[Long]("bucket_lo"),
        r.getAs[Long]("n_docs"), r.getAs[Long]("min_len"), r.getAs[Long]("max_len")))
    // lengths 1,2,3,4,7,8 -> buckets 0,1,1,2,2,3
    assert(rows.toSeq == Seq((0L, 1L, 1L, 1L, 1L), (1L, 2L, 2L, 2L, 3L),
      (2L, 4L, 2L, 4L, 7L), (3L, 8L, 1L, 8L, 8L)))
  }

  // -- source overlap / Zipf slope ------------------------------------

  test("sourceOverlap: known gram sets, shared and disjoint pairs, zero rows kept") {
    val docs = Seq(
      (1L, "srcA", "a b c d"), // trigrams {a b c, b c d}
      (2L, "srcB", "a b c"),   // {a b c}
      (3L, "srcC", "x y z"),   // {x y z}
    ).toDF("doc_id", "source", "text")
    val rows = operators.CorpusOps.sourceOverlap(docs, n = 3).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getDouble(3)))).toMap
    assert(rows.size == 3, "all pairs present, including zero-overlap ones")
    assert(rows(("srcA", "srcB")) == ((1L, 0.5))) // 1 / (2 + 1 - 1)
    assert(rows(("srcA", "srcC")) == ((0L, 0.0)))
    assert(rows(("srcB", "srcC")) == ((0L, 0.0)))
  }

  test("zipfSlope: an exact C/rank corpus fits slope -1, intercept ln C") {
    // counts 12, 6, 4, 3 = 12/rank for ranks 1..4 → ln-ln slope = -1
    val words = Seq.fill(12)("a") ++ Seq.fill(6)("b") ++ Seq.fill(4)("c") ++
      Seq.fill(3)("d")
    val docs = Seq((1L, "en", words.mkString(" "))).toDF("doc_id", "lang", "text")
    val r = operators.CorpusOps.zipfSlope(docs, k = 100).collect()
    assert(r.length == 1)
    assert(r(0).getLong(1) == 4L)
    assert(math.abs(r(0).getDouble(2) - -1.0) < 1e-4, s"slope ${r(0).getDouble(2)}")
    assert(math.abs(r(0).getDouble(3) - math.log(12.0)) < 1e-4)
  }

  // -- Mixture sampling ----------------------------------------------

  test("temperatureSample: deterministic across reruns; rare strata keep higher rates") {
    val docs = Tables(spark, sf).documents
    val a = Mixture.temperatureSample(docs, "lang", c = 6.0).collect()
    val b = Mixture.temperatureSample(docs, "lang", c = 6.0).collect()
    assert(a.toSeq == b.toSeq)
    // thresholds scale as 1/sqrt(n): the largest stratum gets the lowest
    val byN = a.sortBy(_.getAs[Long]("n_docs"))
    assert(byN.head.getAs[Long]("threshold") >= byN.last.getAs[Long]("threshold"))
    // sampled counts ∝ sqrt(n): ratio of (sampled/sqrt(n)) across strata ≈ constant
    val ratios = a.filter(_.getAs[Long]("n_sampled") > 10).map(r =>
      r.getAs[Long]("n_sampled") / math.sqrt(r.getAs[Long]("n_docs").toDouble))
    if (ratios.length > 1)
      assert(ratios.max / ratios.min < 1.6) // hash noise at tiny sf
  }

  test("temperatureSample: threshold caps at the full hash space (rate <= 1)") {
    val tiny = Seq((1L, "only"), (2L, "only")).toDF("doc_id", "lang")
    val row = Mixture.temperatureSample(tiny, "lang", c = 6.0).collect().head
    assert(row.getAs[Long]("threshold") == 1048576L)
    assert(row.getAs[Long]("n_sampled") == 2L)
    assert(row.getAs[Double]("eff_rate") == 1.0)
  }
}
