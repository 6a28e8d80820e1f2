package graft

import org.apache.spark.sql.functions._

/** Coverage for the round-9 session-3 audit/source batch (q237–q240)
  * beyond the differential gate: plan-shape assertions for the bloom
  * copy, and driver-side brute-force recomputes for the density,
  * integrity, and robust-statistics operators.
  */
class AuditSourcesSpec extends SparkSpec {

  import spark.implicits._

  test("q237 pushes the point predicate into the bloom-parquet scan") {
    val df = graft.sources.ParquetBloom.bloomParquetCopy(spark, sf)
      .filter(col("l_partkey") === 250)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") &&
      plan.contains("EqualTo(l_partkey,250)"), plan.take(800))
    // value preservation vs the parquet fixture
    val want = Tables(spark, sf).lineitem.filter(col("l_partkey") === 250).count()
    assert(run("q237_parquet_bloom").head().getAs[Long]("cnt") == want)
  }

  test("q238 blocklist totals match a driver-side scan") {
    val rows = run("q238_blocklist_density").collect()
      .map(r => r.getString(0) -> r.getAs[Long]("total_hits")).toMap
    val docs = Tables(spark, sf).documents
      .select(col("source"), lower(col("text"))).as[(String, String)].collect()
    def occ(hay: String, pat: String): Int = {
      var i = 0; var n = 0
      while ({ i = hay.indexOf(pat, i); i >= 0 }) { n += 1; i += pat.length }
      n
    }
    val want = docs.groupBy(_._1).map { case (src, ds) =>
      src -> ds.map { case (_, t) =>
        graft.operators.Redact.blocklist.map(occ(t, _)).sum.toLong
      }.sum
    }
    assert(rows == want)
    assert(rows.values.sum > 0, "fixture should contain blocklist hits")
  }

  test("q239 orphan counts match driver-side set difference") {
    val rows = run("q239_fk_orphans").collect()
      .map(r => r.getString(0) -> r.getAs[Long]("orphans")).toMap
    val t = Tables(spark, sf)
    val custKeys = t.customer.select("c_custkey").as[Long].collect().toSet
    val orphanOrders = t.orders.select("o_custkey").as[Long].collect()
      .count(k => !custKeys.contains(k)).toLong
    assert(rows("orders.o_custkey->customer") == orphanOrders)
    assert(rows.size == 4)
  }

  test("q240 median/MAD match a driver-side sort") {
    val rows = run("q240_robust_median_mad").collect()
    val per = Tables(spark, sf).documents
      .select(col("source"),
        size(graft.operators.TextAnalysis.tokens(col("text"))).cast("long"))
      .as[(String, Long)].collect().groupBy(_._1)
    def med(xs: Seq[Long]): Double = {
      val s = xs.sorted
      (s((s.length - 1) / 2) + s(s.length / 2)) / 2.0
    }
    rows.foreach { r =>
      val xs = per(r.getString(0)).map(_._2).toSeq
      val m = med(xs)
      assert(r.getAs[Long]("n_docs") == xs.length.toLong)
      assert(r.getAs[Double]("median_tokens") == m, r.toString)
      val mad = med(xs.map(x => math.abs(2 * x - (2 * m).toLong)))
      assert(r.getAs[Double]("mad_tokens") == mad / 2.0, r.toString)
    }
  }
}
