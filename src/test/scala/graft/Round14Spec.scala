package graft

import org.apache.spark.sql.functions._

/** Round-14 laws: q340 (TPC-H Q12) closes the TPC-H surface at 22/22
  * via the q338 derived-pinned-column pattern (r13 VERDICT item 3).
  */
class Round14Spec extends SparkSpec {

  private def entry(name: String) =
    SparkEntry.allEntries.find(_.name == name)
      .getOrElse(fail(s"no entry $name"))

  test("q340 plan law: single scan pair, one equi-join, conditional aggregation") {
    // the canonical Q12 plan: derive + filter lineitem in ONE pass,
    // equi-join orders on orderkey, two-branch CASE rollup — no second
    // lineitem scan, no join beyond orders⋈lineitem
    val df = entry("q340_tpch_q12").run(spark, sf)
    val plan = df.queryExecution.optimizedPlan
    val joins = plan.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
    }
    assert(joins.length == 1, s"expected exactly the orders⋈lineitem join:\n$plan")
    assert(joins.head.joinType == org.apache.spark.sql.catalyst.plans.Inner)
    val scans = plan.collect {
      case l: org.apache.spark.sql.execution.datasources.LogicalRelation => l
    }
    assert(scans.length == 2, s"expected one orders scan + one lineitem scan:\n$plan")
    // the two-branch conditional aggregation is a single Aggregate
    val aggs = plan.collect {
      case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a
    }
    assert(aggs.length == 1, s"Q12 is one rollup, found ${aggs.length}")
  }

  test("q340 semantics law: derived columns replay and branch counts are exhaustive") {
    val out = entry("q340_tpch_q12").run(spark, sf).collect()
    assert(out.nonEmpty, "receipt-year window missed the fixture")
    // only the two filtered modes can appear
    val modes = out.map(_.getString(0)).toSeq
    assert(modes.toSet.subsetOf(Set("MAIL", "SHIP")), modes.toString)
    assert(modes == modes.sorted)
    // high + low must equal an independent derivation of the total
    // qualifying line count per mode (branch exhaustiveness: every
    // joined line lands in exactly one of the two CASE branches)
    val t = Tables(spark, sf)
    val h = graft.functions.GraftFunctions.splitmix64(
      col("l_orderkey") * 8 + col("l_linenumber"))
    val su = unix_micros(col("l_shipdate").cast("timestamp"))
    val cd = shiftrightunsigned(h, 8) % 91 - 30
    val rd = shiftrightunsigned(h, 16) % 31 - 5
    val mi = shiftrightunsigned(h, 32) % 7
    val day = lit(86400000000L)
    val expect = t.lineitem
      .select(col("l_orderkey"),
        when(mi === 3, "SHIP").when(mi === 5, "MAIL").as("m"),
        su.as("s"), (su + cd * day).as("c"), (su + (cd + rd) * day).as("r"))
      .filter(col("m").isNotNull && col("s") < col("c") && col("c") < col("r") &&
        col("r") >= unix_micros(lit("1997-01-01 00:00:00").cast("timestamp")) &&
        col("r") < unix_micros(lit("1998-01-01 00:00:00").cast("timestamp")))
      .join(t.orders.select("o_orderkey"),
        col("o_orderkey") === col("l_orderkey"), "inner")
      .groupBy("m").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    out.foreach { r =>
      val total = r.getLong(1) + r.getLong(2)
      assert(total == expect(r.getString(0)),
        s"mode ${r.getString(0)}: high+low=$total vs ${expect(r.getString(0))}")
    }
    // both priority branches are non-trivially exercised at this sf
    assert(out.map(_.getLong(1)).sum > 0, "high branch empty")
    assert(out.map(_.getLong(2)).sum > 0, "low branch empty")
  }
}
