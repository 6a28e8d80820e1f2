package graft

import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** q216–q218 coverage beyond the oracle gate: statistics match
  * driver-side recomputes; containment finds what Jaccard misses.
  */
class AbEntropyContainSpec extends SparkSpec {

  import spark.implicits._

  test("q216 z-test matches a driver-side recompute of the pooled z") {
    val r = run("q216_ab_ztest").collect()(0)
    val (na, nb, ea, eb) = (r.getAs[Long]("n_a"), r.getAs[Long]("n_b"),
      r.getAs[Long]("err_a"), r.getAs[Long]("err_b"))
    val events = Tables(spark, sf).events
      .select(col("user_id"), col("event_type")).as[(Long, String)].collect()
    assert(na === events.count(_._1 % 2 == 0).toLong)
    assert(ea === events.count(e => e._1 % 2 == 0 && e._2 == "error").toLong)
    assert(na + nb === events.length.toLong)
    val (pa, pb) = (ea.toDouble / na, eb.toDouble / nb)
    val pp = (ea + eb).toDouble / (na + nb)
    val z = (pa - pb) / math.sqrt(pp * (1 - pp) * (1.0 / na + 1.0 / nb))
    assert(math.abs(r.getAs[Double]("z") - z) < 1e-6)
  }

  test("q217 entropy: bounds 0 ≤ H ≤ ln(distinct); matches recompute for one source") {
    val rows = run("q217_token_entropy").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val h = r.getAs[Double]("entropy")
      val d = r.getAs[Long]("n_distinct")
      assert(h >= 0.0 && h <= math.log(d.toDouble) + 1e-6, r.toString)
    }
    val src0 = rows.head.getString(0)
    val toks = Tables(spark, sf).documents.filter(col("source") === src0)
      .select(explode(graft.operators.TextAnalysis.tokens(col("text"))).as("t"))
      .as[String].collect()
    val counts = toks.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val t = toks.length.toDouble
    val h = math.log(t) - counts.values.map { c =>
      c * BigDecimal(math.log(c.toDouble))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }.sum / t
    assert(math.abs(rows.head.getAs[Double]("entropy") - h) < 1e-5)
  }

  test("q218 finds every planted excerpt pair; Jaccard at 4/5 finds none of them") {
    val rows = run("q218_containment_pairs").collect()
      .map(r => (r.getAs[Long]("contained"), r.getAs[Long]("container"))).toSet
    val planted = Tables(spark, sf).documents
      .filter(pmod(col("doc_id"), lit(7)) === 0)
      .select("doc_id").as[Long].collect()
    planted.foreach { d =>
      assert(rows.contains((-d - 1L, d)),
        s"excerpt of doc $d not recovered as contained")
    }
    // the same excerpt pairs are invisible to the Jaccard near-dup
    // join at the SAME 4/5 threshold — containment is not redundant
    val jac = Dedup.nearDupPairs(Dedup.docsWithExcerpts(
        Tables(spark, sf).documents))
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    val excerptPairsInJaccard = planted.count(d =>
      jac.contains((-d - 1L, d)) || jac.contains((d, -d - 1L)))
    assert(excerptPairsInJaccard === 0,
      s"$excerptPairsInJaccard excerpt pairs unexpectedly pass Jaccard 4/5")
  }
}
