package graft

import graft.operators.PageRank
import org.apache.spark.sql.functions._

class PageRankSpec extends SparkSpec {
  import spark.implicits._

  test("pageRank is stationary-uniform on a cycle and mass-conserving") {
    // 3-cycle with frac=1: the uniform vector is the exact fixed point,
    // so 10 iterations must return exactly 1/3 per node (the update is
    // base + d*(1/3) = 1/3 in exact arithmetic; decimal sums keep it).
    val edges = Seq((0L, 1L, 1.0), (1L, 2L, 1.0), (2L, 0L, 1.0))
      .toDF("src", "dst", "frac")
    val nodes = Seq(0L, 1L, 2L).toDF("node")
    val ranks = PageRank.pageRank(edges, nodes, damping = 0.85, iters = 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // base is computed against PageRank.N (25), so the fixed point here
    // is b + d*x = x with b = 0.15/25 => x = 0.04
    val expected = (1.0 - 0.85) / PageRank.N / (1.0 - 0.85)
    nodes.as[Long].collect().foreach { n =>
      assert(math.abs(ranks(n) - expected) < 1e-12, s"node $n -> ${ranks(n)}")
    }
  }

  test("q93 ranks: positive, bounded, sink-free mass stays under 1") {
    val got = run("q93_pagerank").collect().map(_.getDouble(1))
    assert(got.forall(r => r > 0 && r < 1))
    val total = got.sum
    assert(total > 0.5 && total <= 1.0 + 1e-9, s"total mass $total")
    // trade graph is near-complete at this sf: ranks must not be uniform
    assert(got.max > got.min, "weighted graph must differentiate ranks")
  }

  test("each iteration broadcasts the rank vector, never shuffles edges twice") {
    val got = SparkEntry.queries("q93_pagerank")(spark, sf)
    got.collect()
    val plan = got.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(1500))
  }
}
