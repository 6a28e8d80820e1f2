package graft

import graft.operators.Skyline

class SkylineSpec extends SparkSpec {
  import spark.implicits._

  test("skyline keeps exactly the non-dominated set; duplicates collapse") {
    val pts = Seq(
      (0.5, 1.0), // frontier: nothing cheaper
      (1.0, 5.0), // frontier
      (2.0, 7.0), // frontier
      (2.0, 7.0), // duplicate -> one row
      (3.0, 6.0), // dominated by (2,7)
      (1.5, 5.0), // dominated by (1,5): more expensive, same qty
      (1.0, 4.0), // dominated by (1,5): same price, less qty
    ).toDF("p", "q").repartition(5) // scatter to exercise the prefilter
    val got = Skyline.skyline2d(pts, "p", "q")
      .as[(Double, Double)].collect().toSeq
    assert(got == Seq((0.5, 1.0), (1.0, 5.0), (2.0, 7.0)), got.toString)
  }

  test("grouped skyline: independent per-group frontiers, brute-force checked") {
    val pts = (1 to 300).map { i =>
      val g = s"g${i % 3}"
      val x = (i * 37 % 101).toDouble
      val y = (i * 61 % 97).toDouble
      (g, x, y)
    }
    val expected = pts.distinct.groupBy(_._1).toSeq.flatMap { case (g, rows) =>
      rows.distinct.filter { case (_, px, qx) =>
        !rows.exists { case (_, pb, qb) =>
          pb <= px && qb >= qx && (pb < px || qb > qx)
        }
      }
    }.sortBy(r => (r._1, r._2))
    val got = Skyline.groupedSkyline2d(
        pts.toDF("g", "p", "q").repartition(7), "g", "p", "q")
      .as[(String, Double, Double)].collect().toSeq
    assert(got == expected, s"got $got\nexpected $expected")
    // the grouped window must be partitioned (parallel), never global
    val plan = Skyline.groupedSkyline2d(
        pts.toDF("g", "p", "q"), "g", "p", "q")
      .queryExecution.executedPlan.toString
    assert(plan.contains("partitionBy") || !plan.contains("SinglePartition"),
      plan.take(2000))
  }

  test("two-phase plan matches the brute-force dominance definition") {
    // deterministic pseudo-random cloud
    val pts = (1 to 400).map { i =>
      val x = (i * 37 % 101).toDouble
      val y = (i * 61 % 97).toDouble
      (x, y)
    }
    val expected = pts.distinct.filter { case (px, qx) =>
      !pts.exists { case (pb, qb) =>
        pb <= px && qb >= qx && (pb < px || qb > qx)
      }
    }.sortBy(_._1)
    val got = Skyline.skyline2d(pts.toDF("p", "q").repartition(7), "p", "q")
      .as[(Double, Double)].collect().toSeq
    assert(got == expected, s"got $got\nexpected $expected")
  }
}
