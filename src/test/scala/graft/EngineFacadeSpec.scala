package graft

import org.apache.spark.sql.functions._

class EngineFacadeSpec extends SparkSpec {

  lazy val engine = new GraftEngine(spark)

  test("sumFirstColumn reproduces the reference program on its own fixture") {
    assert(engine.sumFirstColumn(
      "/root/reference/testfiles/store_sales-scale0-parts1.snappy.orc") == 2451897L)
  }

  test("registerViews exposes the full surface to spark.sql incl. graft functions") {
    engine.registerViews(sf)
    val r = spark.sql(
      """SELECT e.vec_id, round(cosine_f32(e.embedding, q.embedding), 6) AS score
        |FROM embeddings e, (SELECT embedding FROM embeddings WHERE vec_id = 42) q
        |WHERE e.vec_id <> 42
        |ORDER BY score DESC, e.vec_id LIMIT 5""".stripMargin).collect()
    assert(r.length == 5)
    val viaApi = engine.topKCosine(Tables(spark, sf).embeddings, 42, 5)
      .collect()
    assert(r.map(_.getLong(0)).toSeq == viaApi.map(_.getLong(0)).toSeq)
  }

  test("dedupExact keeps exactly the min-id survivor per key") {
    import spark.implicits._
    val df = Seq((1L, "a"), (2L, "a"), (3L, "b")).toDF("id", "key")
    val out = engine.dedupExact(df, Seq("key"), "id")
      .orderBy("id").as[(Long, String)].collect().toSeq
    assert(out == Seq((1L, "a"), (3L, "b")))
  }

  test("HLL sketch estimates are within 5% of exact (q35 sketch bound)") {
    val r = run("q35_approx_distinct").head
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val exactOrders = li.select(countDistinct("l_orderkey")).head.getLong(0)
    val exactParts = li.select(countDistinct("l_partkey")).head.getLong(0)
    val approxOrders = r.getAs[Double]("approx_orders")
    val approxParts = r.getAs[Double]("approx_parts")
    assert(math.abs(approxOrders - exactOrders) / exactOrders < 0.05,
      s"approx=$approxOrders exact=$exactOrders")
    assert(math.abs(approxParts - exactParts) / exactParts < 0.05,
      s"approx=$approxParts exact=$exactParts")
  }

  test("count-min estimates dominate exact counts with bounded overcount (q53)") {
    val r = run("q53_countmin_freq").collect()
    assert(r.nonEmpty)
    val n = spark.read.parquet(s"$sf/lineitem.parquet").count()
    r.foreach { row =>
      val est = row.getAs[Long]("est")
      val exact = row.getAs[Long]("true_cnt")
      assert(est >= exact, s"CMS must never undercount: $row")
      assert(est - exact <= 8 * n / 1024,
        s"overcount beyond the d=4,w=1024 bound: $row (n=$n)")
    }
  }

  test("histogram quantiles land within half a bin of the exact percentile (q54)") {
    val r = run("q54_hist_quantiles").collect()
      .map(row => row.getDouble(0) -> row.getDouble(1)).toMap
    assert(r.keySet == Set(0.5, 0.9, 0.99))
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val exact = li.select(
      percentile(col("l_extendedprice"), lit(0.5)),
      percentile(col("l_extendedprice"), lit(0.9)),
      percentile(col("l_extendedprice"), lit(0.99))).head
    val w = 120000.0 / 1024
    Seq(0.5 -> exact.getDouble(0), 0.9 -> exact.getDouble(1), 0.99 -> exact.getDouble(2))
      .foreach { case (q, ex) =>
        assert(math.abs(r(q) - ex) <= w, s"q=$q est=${r(q)} exact=$ex width=$w")
      }
  }

  test("bloom membership never false-negatives and dominates exact hits (q55)") {
    val rows = run("q55_bloom_membership").collect()
    assert(rows.nonEmpty)
    var exactTotal = 0L
    rows.foreach { r =>
      val maybe = r.getAs[Long]("n_maybe")
      val exact = r.getAs[Long]("n_exact")
      assert(maybe >= exact, s"false negative: $r")
      exactTotal += exact
    }
    assert(exactTotal > 0, "eval set should hit itself at minimum")
  }

  test("facade delegations: round-5 families (colloc, sketch, sampling, joins, planning)") {
    val docs = Tables(spark, sf).documents
    val toks = sources.TokenizedCorpus.tokens(spark, sf)
    assert(engine.pmiCollocations(toks, minCount = 2, k = 5).count() <= 5)
    val mi = engine.mutualInformation(docs, "lang", "source")
    assert(mi.columns.toSeq == Seq("a", "b", "n_ab", "mi_contrib"))
    val hh = engine.heavyHitters(Tables(spark, sf).events, "event_type", "event_type", k = 8)
    assert(hh.count() == 5) // exact regime: one row per (type, type) diagonal
    assert(engine.temperatureSample(docs, "lang").count() ==
      docs.select("lang").distinct().count())
    val sh = engine.simhashNearDup(docs)
    assert(sh.columns.toSeq == Seq("doc_a", "doc_b", "hamming"))
    assert(engine.jaccardJoin(docs).count() ==
      operators.SetJoin.jaccardSelfJoin(docs, 4, 5).count())
    val emb = Tables(spark, sf).embeddings
    val probes = emb.filter(col("vec_id") < 2)
      .select(col("vec_id").as("probe_id"), col("embedding").as("pvec"),
        col("label").as("plabel"))
    assert(engine.hardNegatives(emb, probes, k = 2).count() <= 4)
    assert(engine.decontaminatePairs(docs, docs.filter(col("doc_id") % 10 === 0))
      .columns.toSeq == Seq("eval_id", "train_id", "inter", "uni"))
    assert(engine.vocabCoverage(toks, Seq(10)).head.getAs[Long]("covered") > 0)
    assert(engine.lengthHistogram(docs).agg(sum("n_docs")).head.getLong(0) == docs.count())
    assert(engine.domainQuotaCap(docs, "lang", 5)
      .agg(sum("n_kept")).head.getLong(0) <= 5L * 5)
    assert(engine.bpePairCounts(toks, k = 10).count() == 10)
    assert(engine.balancedShards(docs).agg(sum("n_docs")).head.getLong(0) == docs.count())
    assert(engine.dupNgramRate(toks).head.getAs[Double]("dup_rate") >= 0.0)
    assert(engine.contaminationScore(toks).count() ==
      docs.filter(col("doc_id") % 10 === 0).count())
    assert(engine.cusumChangepoint(Tables(spark, sf).events).count() == 5)
    val tri = engine.triangleStats(
      operators.PageRank.tradeEdges(spark, sf), minFrac = 0.05).head
    assert(tri.getAs[Long]("n_triangles") >= 0L)
    val pct = engine.percentileTransform(docs.select("doc_id", "n_chars"),
      "n_chars", "doc_id")
    assert(pct.agg(max("pct")).head.getDouble(0) == 1.0)
    assert(engine.bucketChecksums(docs, expr("doc_id div 100"),
      Seq(col("doc_id"), col("lang"))).count() == 5)
    val jwTop = engine.jaroWinklerBlocked(Tables(spark, sf).part, k = 5).collect()
    assert(jwTop.length == 5 && jwTop.forall(_.getAs[Double]("jw") >= 0.0))
    assert(engine.sortedNeighborhood(Tables(spark, sf).part, w = 3).count() > 0)
    assert(engine.equiDepthHistogram(docs).agg(sum("n_rows")).head.getLong(0) ==
      docs.count())
  }

  test("facade delegations: sessionize, sequencePack, approxDistinctByGroup") {
    val engine = new GraftEngine(spark)
    val ev = Tables(spark, sf).events.filter(col("user_id") < 5)
    val sessions = engine.sessionize(ev, "user_id", "ts", gapMinutes = 30)
    assert(sessions.agg(sum("n_events")).head.getLong(0) == ev.count())
    val packs = engine.sequencePack(Tables(spark, sf).documents, budget = 512)
    assert(packs.count() == Tables(spark, sf).documents.count())
    val byGroup = engine.approxDistinctByGroup(
      spark.read.parquet(s"$sf/lineitem.parquet"), "l_returnflag", "l_orderkey")
    assert(byGroup.columns.toSeq == Seq("l_returnflag", "approx_distinct"))
    assert(byGroup.count() == 3)
  }

  test("HLL sketches merge: MAX of per-group registers equals the global sketch (q62)") {
    import graft.operators.Hll
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    // merge = cell-wise MAX of the per-group register frames
    val merged = Hll.finishEstimate(
      Hll.registers(li, "l_orderkey", Seq("l_returnflag"))
        .groupBy("idx").agg(max("mr").as("mr")),
      Seq.empty, "est").head.getDouble(0)
    val direct = Hll.estimate(li, "l_orderkey", "est").head.getDouble(0)
    assert(merged == direct, s"merged=$merged direct=$direct")
  }

  test("facade delegations: winnow, splitColumn, bloomMembership, int8 elements") {
    val engine = new GraftEngine(spark)
    val docs = Tables(spark, sf).documents
    val fps = engine.winnowFingerprints(docs)
    assert(fps.columns.toSeq == Seq("doc_id", "fp"))
    assert(fps.count() > 0)
    val split = docs.select(engine.splitColumn(col("doc_id")).as("s"))
      .groupBy("s").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(split.keySet.subsetOf(Set("train", "val", "test")))
    assert(split.values.sum == docs.count())
    val keys = docs.filter(col("doc_id") % 7 === 0).select(col("doc_id").as("x"))
    val mem = engine.bloomMembership(docs.select(col("doc_id").as("x")), "x", keys)
    assert(mem.filter(col("x") % 7 === 0).collect().forall(_.getAs[Boolean]("maybe")))
    val q = engine.int8QuantElements(Tables(spark, sf).embeddings)
    assert(q.columns.toSeq == Seq("label", "xd", "qv"))
  }

  test("facade compact: preservation plus the fresh-location contract") {
    val engine = new GraftEngine(spark)
    val dest = java.nio.file.Files.createTempDirectory("graft_compact_t")
      .toString + "/out"
    val src = Tables(spark, sf).region
    val out = engine.compact(src, dest, 2)
    assert(out.count() == src.count())
    intercept[IllegalArgumentException] {
      engine.compact(src, dest, 2) // dest now exists → must refuse
    }
  }

  test("md5_long equals the composed conv(substring(md5,1,15),16,10) form") {
    import org.apache.spark.sql.functions._
    // the strings the engine actually hashes: ascii tokens, empty,
    // whitespace-normalized text, unicode, long text, numeric ids
    val samples = Seq("", "a", "the", "hello world", "éclair ünïcødé 中文",
      "x" * 5000, "42", "doc-000123", "|", "a|b|c") ++
      (0 until 200).map(i => s"tok$i")
    val df = spark.createDataFrame(samples.map(Tuple1(_))).toDF("s")
      .select(col("s"),
        graft.functions.GraftFunctions.md5Long(
          col("s").cast(org.apache.spark.sql.types.BinaryType)).as("fast"),
        conv(substring(md5(col("s").cast(org.apache.spark.sql.types.BinaryType)),
          1, 15), 16, 10).cast(org.apache.spark.sql.types.LongType).as("slow"))
    assert(df.filter(col("fast") =!= col("slow")).count() == 0)
    assert(df.filter(col("fast") < 0).count() == 0) // 60-bit ⇒ non-negative
    // SQL registration path agrees, and NULL propagates
    val viaSql = spark.sql(
      "SELECT md5_long(CAST('hello world' AS BINARY)) a, md5_long(NULL) b").head
    assert(viaSql.getLong(0) ==
      df.filter(col("s") === "hello world").head.getLong(1))
    assert(viaSql.isNullAt(1))
  }

  test("splitmix64 SQL function matches the reference finalizer") {
    // pinned vectors, independently computable from the published
    // splitmix64 constants
    val got = spark.sql(
      "SELECT splitmix64(CAST(0 AS BIGINT)) a, splitmix64(CAST(12345 AS BIGINT)) b")
      .head
    assert(got.getLong(0) == java.lang.Long.parseUnsignedLong("16294208416658607535"))
    assert(got.getLong(1) == java.lang.Long.parseUnsignedLong("2454886589211414944"))
  }
}
