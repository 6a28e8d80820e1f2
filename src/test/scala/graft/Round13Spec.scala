package graft

import org.apache.spark.sql.catalyst.plans.logical.{Window => LogicalWindow}
import org.apache.spark.sql.functions._

/** Round-13 laws: the q332 two-phase capacity rank (r12 VERDICT
  * item 4) keeps its plan free of E-bounded global windows while
  * staying exact.
  */
class Round13Spec extends SparkSpec {

  private def entry(name: String) =
    SparkEntry.allEntries.find(_.name == name)
      .getOrElse(fail(s"no entry $name"))

  test("q332 plan law: no single global window per expert (two-phase rank)") {
    // r12 VERDICT item 4: the old plan ranked with ONE window
    // partitioned by expert alone — parallelism bounded by E = 8 on a
    // 1000-executor cluster. The two-phase form ranks within physical
    // range partitions (windows keyed by (pid, expert) — parallelism
    // P×E) and merges parallelism-sized offset counts; no Window in
    // the optimized plan may partition on fewer than 2 expressions.
    val df = entry("q332_expert_capacity").run(spark, sf)
    val windows = df.queryExecution.optimizedPlan.collect {
      case w: LogicalWindow => w
    }
    assert(windows.nonEmpty, "expected the (pid, expert) local-rank window")
    windows.foreach { w =>
      assert(w.partitionSpec.length >= 2,
        s"E-bounded window found: partitionSpec=${w.partitionSpec}")
    }
  }

  test("q338 plan law: EXISTS decorrelates to a left-semi join") {
    // r12 VERDICT item 5: the entry is WRITTEN as a correlated EXISTS
    // in Spark SQL; Catalyst's RewritePredicateSubquery must turn it
    // into a LeftSemi join with no subquery expression surviving
    val df = entry("q338_tpch_q4_exists").run(spark, sf)
    val plan = df.queryExecution.optimizedPlan
    val semis = plan.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join
        if j.joinType == org.apache.spark.sql.catalyst.plans.LeftSemi => j
    }
    assert(semis.nonEmpty, s"no LeftSemi in optimized plan:\n$plan")
    val survivors = plan.expressions.flatMap(_.collect {
      case e: org.apache.spark.sql.catalyst.expressions.Exists => e
    })
    assert(survivors.isEmpty, "correlated EXISTS survived optimization")
  }

  test("q338 semantics law: EXISTS counts each order once") {
    // however many lines of an order are late, the order contributes
    // exactly once — cross-check against an explicit distinct-orderkey
    // derivation of the same counts
    val out = entry("q338_tpch_q4_exists").run(spark, sf).collect()
    val t = Tables(spark, sf)
    val late = t.lineitem.select(col("l_orderkey"),
        shiftrightunsigned(graft.functions.GraftFunctions.splitmix64(
          col("l_orderkey") * 8 + col("l_linenumber")), 62).as("top2"))
      .filter(col("top2") === 0)
      .select("l_orderkey").distinct()
    val expect = t.orders
      .filter(col("o_orderdate") >= lit("1996-07-01 00:00:00").cast("timestamp") &&
        col("o_orderdate") < lit("1996-10-01 00:00:00").cast("timestamp"))
      .join(late, col("o_orderkey") === col("l_orderkey"), "left_semi")
      .groupBy("o_orderpriority").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out.nonEmpty, "empty Q4 result — date window missed the fixture")
    out.foreach { r =>
      assert(r.getLong(1) == expect(r.getString(0)),
        s"priority ${r.getString(0)}: ${r.getLong(1)} vs ${expect(r.getString(0))}")
    }
  }

  test("q339 curve laws: recall monotone in nprobe, exact at full depth") {
    val rows = entry("q339_maxsim_ivf_curve").run(spark, sf).collect()
    assert(rows.length == 3)
    val byNp = rows.sortBy(_.getInt(0))
    // candidate volume and recall both monotone non-decreasing
    byNp.sliding(2).filter(_.length == 2).foreach { case Array(lo, hi) =>
      assert(lo.getLong(2) <= hi.getLong(2), "candidates not monotone")
      assert(lo.getDouble(4) <= hi.getDouble(4), "recall not monotone")
    }
    // nprobe = nClusters = 16 probes every cluster: the composition
    // equals exact MaxSim, so recall is 1.0 BY LAW, not by luck
    val full = byNp.last
    assert(full.getInt(0) == 16)
    assert(full.getDouble(4) == 1.0, s"full-depth recall ${full.getDouble(4)}")
    assert(byNp.head.getDouble(4) > 0.0, "nprobe=3 found nothing — dead candidates")
  }

  test("q332 two-phase rank equals the direct global-window rank") {
    // the offset-merge must reproduce EXACTLY what a single global
    // window per expert would compute: same kept set, same aggregates
    // (vec_id totalizes the rank key, so ranks are unambiguous)
    val twoPhase = entry("q332_expert_capacity").run(spark, sf).collect()
    val r = graft.operators.Router.routed(Tables(spark, sf).embeddings)
      .select(col("vec_id"), col("expert"), col("gate"))
    val n = r.count()
    val cap = (125L * n + 799) / 800
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("expert")).orderBy(col("gate").desc, col("vec_id"))
    val direct = r
      .withColumn("rk", row_number().over(w))
      .groupBy(col("expert"))
      .agg(
        count(lit(1)).as("n_routed"),
        sum(when(col("rk") > cap, 1L).otherwise(0L)).as("n_dropped"))
      .orderBy("expert")
      .collect()
    assert(twoPhase.length == direct.length)
    twoPhase.zip(direct).foreach { case (tp, d) =>
      assert(tp.getInt(0) == d.getInt(0))
      assert(tp.getLong(1) == d.getLong(1), s"n_routed differs at expert ${d.getInt(0)}")
      assert(tp.getLong(2) == cap, s"capacity differs at expert ${d.getInt(0)}")
      assert(tp.getLong(3) == d.getLong(2), s"n_dropped differs at expert ${d.getInt(0)}")
    }
  }
}
