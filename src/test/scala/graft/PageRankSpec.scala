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
    // base derives from THIS graph's node count (3), so uniform 1/3 is
    // the exact fixed point: b + d*(1/3) = 0.05 + 0.85/3 = 1/3
    val expected = 1.0 / 3.0
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

  test("large-graph path: broadcasts the rank vector, pins it per iteration") {
    // same graph forced down the distributed loop the >LiteralCarryLimit
    // path takes: the returned frame must be a 1-deep broadcast-join+agg
    // over pinned (checkpointed) inputs, not a 10-deep stacked lineage
    val edges = Seq((0L, 1L, 1.0), (1L, 2L, 1.0), (2L, 0L, 1.0))
      .toDF("src", "dst", "frac")
    val nodes = Seq(0L, 1L, 2L).toDF("node")
    val got = operators.PageRank.distributedLoop(edges, nodes,
      damping = 0.85, iters = 3, nodeCount = 3L)
    got.collect()
    val plan = got.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(1500))
    assert(plan.contains("ExistingRDD") || plan.contains("Scan ExistingRDD"),
      plan.take(1500))
    // bit-identity across ALL paths: driver math (default), literal
    // ranks over a distributed edge agg (edgeLocalLimit=0), and the
    // distributed rank-frame loop must agree to the last bit
    val a = got.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val lit = operators.PageRank.pageRank(edges, nodes, damping = 0.85, iters = 3)
    val b = lit.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val mid = operators.PageRank.literalLoop(edges, nodes, damping = 0.85,
      iters = 3, nodeCount = 3L, edgeLocalLimit = 0L)
    val c = mid.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(a == b, s"driver path diverges: $a vs $b")
    assert(a == c, s"literal-agg path diverges: $a vs $c")
    // forceShuffle (q300's certification mode) must pin BOTH joins to
    // the shuffle regime — no broadcast anywhere in the plan — and
    // still agree to the last bit
    val forced = operators.PageRank.distributedLoop(edges, nodes,
      damping = 0.85, iters = 3, nodeCount = 3L, forceShuffle = true)
    forced.collect()
    val fPlan = forced.queryExecution.executedPlan.toString
    assert(!fPlan.contains("BroadcastHashJoin"), fPlan.take(1500))
    assert(fPlan.contains("ShuffledHashJoin"), fPlan.take(1500))
    val d = forced.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(a == d, s"forced-shuffle path diverges: $a vs $d")
  }
  test("kHop: chain graph distances, unreachable nodes absent — both paths") {
    val chain = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (9L, 0L))
      .toDF("src", "dst")
    val expect = Map(0L -> 0, 1L -> 1, 2L -> 2, 3L -> 3, 4L -> 4)
    // 4 iterations reach hop 4; node 5 (hop 5) and node 9 (upstream
    // only — BFS follows edge direction) must be absent
    val driver = PageRank.kHop(chain, source = 0L, iters = 4)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(driver == expect)
    val distributed = PageRank.kHop(chain, source = 0L, iters = 4,
        edgeLocalLimit = 0L)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(distributed == expect, "distributed path diverges from driver path")
  }

  test("kHop: min over multiple paths wins — both paths") {
    val g = Seq((0L, 1L), (1L, 2L), (2L, 3L), (0L, 3L)).toDF("src", "dst")
    val expect = Map(0L -> 0, 1L -> 1, 2L -> 2, 3L -> 1)
    val driver = PageRank.kHop(g, source = 0L, iters = 4)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(driver == expect)
    val distributed = PageRank.kHop(g, source = 0L, iters = 4,
        edgeLocalLimit = 0L)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(distributed == expect)
  }

  test("triangleStats: hand graph — one triangle plus a pendant; dedup of direction/loops") {
    // 1-2, 2-3, 1-3 (triangle) + 3-4 (pendant); plus a reversed
    // duplicate and a self-loop that must collapse away
    val e = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (2L, 1L), (4L, 4L))
      .toDF("src", "dst").withColumn("frac", lit(1.0))
    val r = PageRank.triangleStats(e, minFrac = 0.0).collect().head
    assert(r.getAs[Long]("n_vertices") == 4L)
    assert(r.getAs[Long]("n_edges") == 4L)
    // degrees 2,2,3,1 -> wedges 1+1+3+0 = 5
    assert(r.getAs[Long]("n_wedges") == 5L)
    assert(r.getAs[Long]("n_triangles") == 1L)
    assert(r.getAs[Double]("global_clustering") == 0.6)
  }

  test("triangleStats: matches the canonical triple-join brute force on a pseudo-random graph") {
    val edges = (for {
      i <- 0L until 30L; j <- 0L until 30L
      if i != j && (i * 31 + j * 17) % 7 == 0
    } yield (i, j)).toDF("src", "dst").withColumn("frac", lit(1.0))
    val r = PageRank.triangleStats(edges, minFrac = 0.0).collect().head

    val und = edges.select(least(col("src"), col("dst")).as("a"),
      greatest(col("src"), col("dst")).as("b")).distinct()
    val brute = und.as("e1")
      .join(und.as("e2"), col("e1.b") === col("e2.a"))
      .join(und.as("e3"),
        col("e3.a") === col("e1.a") && col("e3.b") === col("e2.b"))
      .count()
    assert(r.getAs[Long]("n_triangles") == brute)
    assert(r.getAs[Long]("n_edges") == und.count())
  }

  test("triangleStats: empty thinned graph reports zeros, no division error") {
    val e = Seq((1L, 2L)).toDF("src", "dst").withColumn("frac", lit(0.01))
    val r = PageRank.triangleStats(e, minFrac = 0.5).collect().head
    assert(r.getAs[Long]("n_vertices") == 0L)
    assert(r.getAs[Long]("n_triangles") == 0L)
    assert(r.getAs[Double]("global_clustering") == 0.0)
  }
}
