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
