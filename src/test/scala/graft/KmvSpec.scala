package graft

import graft.operators.Kmv
import org.apache.spark.sql.functions._

/** KMV bottom-k sketch: boundedness of what leaves the map stage, the
  * exact-below-k regime, and the estimator's accuracy envelope.
  */
class KmvSpec extends SparkSpec {
  import spark.implicits._

  test("bottomK returns at most k rows, sorted, distinct") {
    val bot = Kmv.bottomK(Tables(spark, sf).lineitem, "l_orderkey", k = 16)
      .as[String].collect()
    assert(bot.length == 16)
    assert(bot.toSeq == bot.toSeq.sorted)
    assert(bot.distinct.length == bot.length)
    // the global bottom-k must equal brute force over all distinct hashes
    val brute = Tables(spark, sf).lineitem
      .select(md5(col("l_orderkey").cast("string")).as("h"))
      .distinct().as[String].collect().sorted.take(16)
    assert(bot.toSeq == brute.toSeq)
  }

  test("NULL keys are excluded, not NPEd") {
    val withNulls = Seq(Some(1), None, Some(2), None, Some(1)).toDF("key")
    val bot = Kmv.bottomK(withNulls, "key", k = 8).collect()
    assert(bot.length == 2)
  }

  test("fewer than k distinct keys -> estimate is the exact count") {
    val small = (1 to 40).map(i => i % 10).toDF("key") // 10 distinct
    val row = Kmv.distinctEstimate(small, "key", k = 64).collect().head
    assert(row.getAs[Long]("kept") == 10L)
    assert(row.getAs[Double]("estimate") == 10.0)
    assert(row.getAs[Long]("exact") == 10L)
    assert(row.getAs[Double]("rel_err") == 0.0)
  }

  test("jaccardSketch: identical, disjoint, and half-overlap sets") {
    val a = (1 to 200).toDF("key")
    val same = Kmv.jaccardSketch(a, "key", a, "key", k = 32).collect().head
    assert(same.getAs[Double]("jaccard_est") == 1.0)
    assert(same.getAs[Double]("jaccard_exact") == 1.0)

    val b = (201 to 400).toDF("key")
    val disj = Kmv.jaccardSketch(a, "key", b, "key", k = 32).collect().head
    assert(disj.getAs[Double]("jaccard_est") == 0.0)
    assert(disj.getAs[Double]("jaccard_exact") == 0.0)
    assert(disj.getAs[Long]("union_exact") == 400L)

    // sketch-of-union property: merged bottom-k == bottom-k of A∪B
    val c = (101 to 300).toDF("key")
    val merged = Kmv.jaccardSketch(a, "key", c, "key", k = 32).collect().head
    val unionKth = Kmv.bottomK((1 to 300).toDF("key"), "key", k = 32)
      .agg(max("h")).collect().head.getString(0)
    val est = merged.getAs[Double]("union_est")
    val fromUnion = Kmv.distinctEstimate((1 to 300).toDF("key"), "key", k = 32)
      .collect().head.getAs[Double]("estimate")
    assert(est == fromUnion, s"merged-sketch estimate $est != union-sketch $fromUnion")
    assert(unionKth.nonEmpty)
  }

  test("grouped kmv_sketch: per-group bottom-k equals per-group brute force") {
    val li = Tables(spark, sf).lineitem
    val got = Kmv.groupedDistinctEstimate(li, "l_returnflag", "l_orderkey", k = 16)
      .select("l_returnflag", "kept", "kth_hash")
      .as[(String, Long, String)].collect().toSeq
    val brute = li
      .select(col("l_returnflag").as("g"),
        md5(col("l_orderkey").cast("string")).as("h"))
      .distinct().as[(String, String)].collect()
      .groupBy(_._1).map { case (g, hs) =>
        val bot = hs.map(_._2).distinct.sorted.take(16)
        (g, bot.length.toLong, bot.last)
      }.toSeq.sortBy(_._1)
    assert(got == brute)
  }

  test("kmv_sketch is partitioning-invariant (merge = union-keep-k is exact)") {
    val df = (1 to 500).toDF("key")
    def sketch(parts: Int): Seq[String] =
      Kmv.bottomK(df.repartition(parts), "key", k = 32).as[String].collect().toSeq
    assert(sketch(1) == sketch(7))
    assert(sketch(7) == sketch(32))
  }

  test("bottomK plans as a partial/final native aggregate, not mapPartitions") {
    val plan = Kmv.bottomK(Tables(spark, sf).lineitem, "l_orderkey")
      .queryExecution.executedPlan.toString
    assert(plan.contains("kmv_sketch"), plan.take(2000))
    assert(plan.contains("ObjectHashAggregate"), plan.take(2000))
    assert(!plan.contains("MapPartitions"), plan.take(2000))
  }

  test("kmv_sketch works from SQL registration") {
    graft.functions.GraftFunctions.registerAll(spark)
    Seq(3, 1, 2, 3, 1).toDF("k").createOrReplaceTempView("kmv_sql_t")
    val arr = spark.sql(
      "SELECT kmv_sketch(md5(CAST(k AS STRING)), 2) AS sk FROM kmv_sql_t")
      .collect().head.getSeq[String](0)
    val expect = Seq(1, 2, 3).map(i =>
      java.security.MessageDigest.getInstance("MD5")
        .digest(i.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString).distinct.sorted.take(2)
    assert(arr == expect)
  }

  test("k=64 estimate lands within the theoretical error envelope") {
    // KMV std error ~ 1/sqrt(k-2) = 12.7% at k=64; 4 sigma = 51%.
    val row = Kmv.distinctEstimate(Tables(spark, sf).lineitem, "l_orderkey")
      .collect().head
    assert(row.getAs[Long]("kept") == 64L)
    assert(row.getAs[Double]("rel_err") < 0.51,
      s"rel_err ${row.getAs[Double]("rel_err")} outside 4-sigma envelope")
  }
}
