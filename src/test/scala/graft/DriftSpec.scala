package graft

import graft.operators.Drift

class DriftSpec extends SparkSpec {
  import spark.implicits._

  private def ts(day: Int) = java.time.LocalDateTime.of(2024, 1, day, 9, 0)

  test("identical slices drift zero; vanished bucket takes the eps floor") {
    // ref (days < 15) and cur (days >= 15) both uniform over buckets 0,1
    val same = (1 to 40).map { i =>
      (ts(if (i <= 20) 1 else 20), (i % 2) * 10.0 + 5.0)
    }.toDF("ts", "value")
    val zero = Drift.psiBuckets(same, "2024-01-15").collect()
    assert(zero.forall(_.getAs[Double]("contrib") == 0.0), zero.mkString(","))

    // bucket 3 present only in ref -> cur share takes the 1e-6 floor,
    // contribution large and positive
    val gone = ((1 to 10).map(_ => (ts(1), 35.0)) ++
      (1 to 10).map(_ => (ts(1), 5.0)) ++
      (1 to 20).map(_ => (ts(20), 5.0))).toDF("ts", "value")
    val rows = Drift.psiBuckets(gone, "2024-01-15").collect()
      .map(r => r.getInt(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(rows(3)._2 == Drift.Eps)
    assert(rows(3)._3 > 1.0, s"vanished bucket contribution ${rows(3)._3}")
    // PSI total = sum of contributions, all finite
    assert(rows.values.map(_._3).sum < Double.PositiveInfinity)
  }

  test("cusumChangepoint: hand-computed level shift lands on the shift day") {
    // daily counts 1,1,1,5,5,5 (days 1..6): total=18, n_days=6,
    // S'_k = 6*prefix_k - 18k = -12,-24,-36,-24,-12,0 -> max |S'| = 36 at day 3
    val perDay = Seq(1, 1, 1, 5, 5, 5)
    val rows = perDay.zipWithIndex.flatMap { case (n, i) =>
      (1 to n).map(j => (ts(i + 1).plusMinutes(j.toLong), "shift"))
    }.toDF("ts", "event_type")
    val r = operators.Drift.cusumChangepoint(rows).collect().head
    assert(r.getAs[Long]("n_days") == 6L)
    assert(r.getAs[Long]("total") == 18L)
    assert(r.getAs[String]("change_day") == "2024-01-03")
    assert(r.getAs[Long]("s_abs") == 36L)
  }

  test("cusumChangepoint: flat series peaks nowhere special with tiny |S|; earliest-day tie-break") {
    // constant 3/day for 4 days: S'_k = 0 for every k -> tie on 0,
    // earliest day must win
    val rows = (1 to 4).flatMap(d => (1 to 3).map(j =>
      (ts(d).plusMinutes(j.toLong), "flat"))).toDF("ts", "event_type")
    val r = operators.Drift.cusumChangepoint(rows).collect().head
    assert(r.getAs[Long]("s_abs") == 0L)
    assert(r.getAs[String]("change_day") == "2024-01-01")
  }

  test("centroidDrift: hand-computed L2 between parity-half means; identical halves drift zero") {
    // label 0: half A (vec_id 0,2) mean [2,3]; half B (vec_id 1,3)
    // mean [2,1] -> L2 = sqrt(0+4) = 2. label 1: halves identical -> 0.
    val emb = Seq(
      (0L, Seq(1.0f, 2.0f), 0),
      (2L, Seq(3.0f, 4.0f), 0),
      (1L, Seq(0.0f, 1.0f), 0),
      (3L, Seq(4.0f, 1.0f), 0),
      (10L, Seq(5.0f, 5.0f), 1),
      (11L, Seq(5.0f, 5.0f), 1),
    ).toDF("vec_id", "embedding", "label")
    val got = Drift.centroidDrift(emb).collect()
      .map(r => r.getAs[Int]("label") ->
        (r.getAs[Long]("n_a"), r.getAs[Long]("n_b"),
          r.getAs[Double]("drift"))).toMap
    assert(got(0) == ((2L, 2L, 2.0)))
    assert(got(1) == ((1L, 1L, 0.0)))
  }

  test("daviesBouldin: hand-computed three-cluster geometry") {
    // label 0: [0,0],[2,0] -> centroid [1,0], scatter 1
    // label 1: [10,0],[10,2] -> centroid [10,1], scatter 1
    // label 2: [4,0] singleton -> scatter 0
    // d(0,2)=3, d(0,1)=sqrt(82), d(1,2)=sqrt(37)
    // worst ratios: i=0 -> j=2 (1/3); i=1 -> j=0 (2/sqrt82); i=2 -> j=0 (1/3)
    val emb = Seq(
      (0L, Seq(0.0f, 0.0f), 0), (1L, Seq(2.0f, 0.0f), 0),
      (2L, Seq(10.0f, 0.0f), 1), (3L, Seq(10.0f, 2.0f), 1),
      (4L, Seq(4.0f, 0.0f), 2),
    ).toDF("vec_id", "embedding", "label")
    val got = Drift.daviesBouldin(emb).collect()
      .map(r => r.getAs[Int]("label") ->
        (r.getAs[Long]("n_vecs"), r.getAs[Double]("scatter"),
          r.getAs[Int]("worst_label"), r.getAs[Double]("db_term"))).toMap
    assert(got(0) == ((2L, 1.0, 2, 0.333333)))
    assert(got(1)._3 == 0)
    assert(math.abs(got(1)._4 - 2.0 / math.sqrt(82.0)) < 1e-6)
    assert(got(2) == ((1L, 0.0, 0, 0.333333)))
  }

  test("daviesBouldin: partitioning-invariant; scatters and terms nonnegative") {
    val emb = Tables(spark, sf).embeddings
    val a = Drift.daviesBouldin(emb).collect().toSeq
    val b = Drift.daviesBouldin(emb.repartition(7)).collect().toSeq
    assert(a == b && a.nonEmpty)
    assert(a.forall(r => r.getAs[Double]("scatter") >= 0.0 &&
      r.getAs[Double]("db_term") >= 0.0))
  }

  test("centroidDrift: partitioning-invariant on the fixture corpus") {
    val emb = Tables(spark, sf).embeddings
    val a = Drift.centroidDrift(emb).collect().toSeq
    val b = Drift.centroidDrift(emb.repartition(11)).collect().toSeq
    assert(a == b && a.nonEmpty)
    assert(a.forall(_.getAs[Double]("drift") >= 0.0))
  }

  test("q214 KS: bounds, and one source matches a driver-side recompute") {
    import org.apache.spark.sql.functions._
    val rows = run("q214_ks_drift").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val ks = r.getAs[Double]("ks")
      assert(ks >= 0.0 && ks <= 1.0, r.toString)
    }
    // exact recompute for the first source
    import spark.implicits._
    val all = Tables(spark, sf).documents
      .select(col("source"), col("n_chars")).as[(String, Long)].collect()
    val src0 = rows.head.getString(0)
    val mine = all.filter(_._1 == src0).map(_._2)
    val n = all.length.toLong
    val ns = mine.length.toLong
    val vals = all.map(_._2).distinct.sorted
    val best = vals.map { v =>
      val cums = mine.count(_ <= v).toLong
      val cumg = all.count(_._2 <= v).toLong
      (math.abs(cums * n - cumg * ns), v)
    }.sortBy { case (dn, v) => (-dn, v) }.head
    val expected = BigDecimal(best._1.toDouble / (ns.toDouble * n.toDouble))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(rows.head.getAs[Long]("ks_at") === best._2)
    assert(math.abs(rows.head.getAs[Double]("ks") - expected) < 1e-9)
  }
}
