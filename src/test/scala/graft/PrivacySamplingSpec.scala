package graft

import org.apache.spark.sql.functions._

import graft.operators.{Mixture, Privacy}

/** Pinned-noise DP release (q210) + deterministic weighted sampling
  * (q211): both must be exactly reproducible and match a driver-side
  * recompute of the same pinned math.
  */
class PrivacySamplingSpec extends SparkSpec {

  import spark.implicits._

  private def splitmix(x0: Long): Long = {
    var z = x0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  test("q210 noise matches the driver-side inverse-CDF recompute; reproducible") {
    val rows = run("q210_dp_counts").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (lang, n, ndp) =
        (r.getString(0), r.getAs[Long]("n"), r.getAs[Double]("n_dp"))
      // recompute: md5 leading 60 bits → splitmix → dyadic uniform →
      // Laplace inverse CDF with the ln rounded at 6 dp
      val md5hex = java.security.MessageDigest.getInstance("MD5")
        .digest(lang.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(15)
      val h = splitmix(java.lang.Long.parseLong(md5hex, 16))
      val u = (h >>> 11).toDouble / 9007199254740992.0
      val lnTerm = BigDecimal(math.log(1.0 - 2.0 * math.abs(u - 0.5)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      val noise = if (u - 0.5 >= 0) -lnTerm else lnTerm
      val expected = BigDecimal(n + noise)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(ndp - expected) < 1e-9, s"$lang: $ndp vs $expected")
      assert(ndp !== n.toDouble, s"$lang: noise must be nonzero")
    }
    // pinned seed → byte-identical release on re-run
    val again = run("q210_dp_counts").collect()
    assert(rows.map(_.toString).toSeq === again.map(_.toString).toSeq)
  }

  test("q229 water-fill: skewed sources hit the boundary search; budget exact") {
    import graft.operators.Mixture
    // fixture sources are uniform (boundary at idx 1 — everything
    // capped); a skewed synthetic frame exercises the real search:
    // counts 5/10/40/100, budget 60% of 155 = 93
    //   keep 5 and 10 fully (15), remaining 78 over 2 sources →
    //   θ = 39, rem 0 → alloc 5, 10, 39, 39; Σ = 93 ✓
    val docs = Seq.tabulate(5)(i => ("a", i)) ++
      Seq.tabulate(10)(i => ("b", 100 + i)) ++
      Seq.tabulate(40)(i => ("c", 200 + i)) ++
      Seq.tabulate(100)(i => ("d", 300 + i))
    val df = docs.toDF("source", "doc_id")
    val got = Mixture.waterFill(df).collect()
      .map(r => r.getString(0) -> r.getAs[Long]("alloc")).toMap
    assert(got === Map("a" -> 5L, "b" -> 10L, "c" -> 39L, "d" -> 39L))
    // a larger budget moves the boundary: 3/4 of 155 = 116 → candidate
    // θ = (116-15)/2 = 50 ≥ n_c = 40, so c is ALSO fully kept and d
    // alone absorbs the rest: 116 − 55 = 61
    val got2 = Mixture.waterFill(df, budgetNum = 3L, budgetDen = 4L)
      .collect().map(r => r.getString(0) -> r.getAs[Long]("alloc")).toMap
    assert(got2 === Map("a" -> 5L, "b" -> 10L, "c" -> 40L, "d" -> 61L))
    assert(got2.values.sum === (155L * 3) / 4)
    // fixture run: exact budget conservation + never over-allocated
    val fix = run("q229_water_fill").collect()
    val (allocs, ns) = (fix.map(_.getAs[Long]("alloc")),
      fix.map(_.getAs[Long]("n_docs")))
    assert(allocs.sum === (ns.sum * 3) / 5)
    fix.foreach(r => assert(r.getAs[Long]("alloc") <= r.getAs[Long]("n_docs")))
  }

  test("q211 equals the brute-force A-ES top-5 per language") {
    val rows = run("q211_weighted_sample").collect()
      .map(r => (r.getString(0), r.getInt(1)) ->
        (r.getAs[Long]("doc_id"), r.getAs[Double]("skey"))).toMap
    val docs = Tables(spark, sf).documents
      .select("lang", "doc_id", "n_chars")
      .as[(String, Long, Long)].collect()
    val brute = docs.groupBy(_._1).toSeq.flatMap { case (lang, ds) =>
      val keyed = ds.map { case (_, d, w) =>
        val u = (splitmix(d) >>> 11).toDouble / 9007199254740992.0
        val lnu = BigDecimal(math.log(u))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        (d, lnu / w)
      }.sortBy { case (d, k) => (-k, d) }.take(5)
      keyed.zipWithIndex.map { case ((d, k), i) => (lang, i + 1) -> d }
    }.toMap
    assert(rows.keySet === brute.keySet)
    rows.foreach { case (key, (d, skey)) =>
      assert(d === brute(key), s"$key: $d vs ${brute(key)}")
      assert(skey <= 0.0)
    }
    // heavier docs should be over-represented relative to a uniform
    // pick: the sampled mean weight exceeds the corpus mean weight
    val sampledIds = rows.values.map(_._1).toSet
    val byId = docs.map(t => t._2 -> t._3).toMap
    val sampledMean = sampledIds.toSeq.map(byId).sum.toDouble / sampledIds.size
    val corpusMean = docs.map(_._3).sum.toDouble / docs.length
    assert(sampledMean > corpusMean * 0.9,
      s"weighted sample mean $sampledMean vs corpus $corpusMean")
  }
}
