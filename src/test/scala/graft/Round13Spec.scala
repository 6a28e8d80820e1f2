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
