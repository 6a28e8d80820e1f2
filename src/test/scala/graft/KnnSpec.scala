package graft

import graft.functions.GraftFunctions
import graft.operators.Knn
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class KnnSpec extends SparkSpec {
  import spark.implicits._

  test("knnJoin equals the window-rank brute force") {
    val emb = Tables(spark, sf).embeddings
    val got = run("q97_knn_join")
      .as[(Long, Int, Long, Double)].collect().toSeq

    val probes = emb.filter(col("vec_id") < 16)
      .select(col("vec_id").as("probe_id"), col("embedding").as("pvec"))
    val w = Window.partitionBy("probe_id")
      .orderBy(col("score").desc, col("vec_id"))
    val brute = emb.crossJoin(broadcast(probes))
      .filter(col("vec_id") =!= col("probe_id"))
      .select(col("probe_id"), col("vec_id"),
        round(GraftFunctions.cosineF32(col("embedding"), col("pvec")), 6).as("score"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .select(col("probe_id"), col("rank"), col("vec_id"), col("score"))
      .orderBy("probe_id", "rank")
      .as[(Long, Int, Long, Double)].collect().toSeq

    assert(got == brute)
  }

  test("grouped top-k aggregates with a k-bounded partial (no window exchange of scored rows)") {
    val plan = run("q97_knn_join").queryExecution.executedPlan.toString
    // the native heap aggregate plans as ObjectHashAggregate with a
    // partial mode before the exchange; a window formulation would show
    // a Window node over the full scored set instead
    assert(plan.contains("ObjectHashAggregate"), plan.take(2000))
    assert(!plan.contains("Window"), plan.take(2000))
  }

  test("topk_score_id: ties break by smaller id; k beyond group size returns all, sorted") {
    val df = Seq(
      (1L, 0.5, 10L), (1L, 0.5, 3L), (1L, 0.9, 7L), (1L, 0.1, 1L),
      (2L, 0.4, 2L),
    ).toDF("g", "score", "id")
    val out = df.groupBy("g")
      .agg(GraftFunctions.topkScoreId(col("score"), col("id"), 3).as("nn"))
      .select(col("g"), expr("transform(nn, x -> x.id)").as("ids"))
      .orderBy("g")
      .as[(Long, Seq[Long])].collect().toSeq
    assert(out == Seq((1L, Seq(7L, 3L, 10L)), (2L, Seq(2L))))
  }

  test("topk_score_id merges partial heaps across partitions and ignores nulls") {
    val df = spark.range(0, 1000, 1, 8)
      .select(col("id"),
        when(col("id") % 97 === 0, lit(null))
          .otherwise((col("id") % 101).cast("double")).as("score"))
    val got = df.groupBy(lit(1).as("g"))
      .agg(GraftFunctions.topkScoreId(col("score"), col("id"), 5).as("nn"))
      .select(expr("transform(nn, x -> x.id)"))
      .as[Seq[Long]].head()
    // best score is 100 at id % 101 == 100, smallest ids first
    val expected = (0L until 1000L)
      .filter(i => i % 97 != 0)
      .map(i => (i % 101, i))
      .sortBy { case (s, i) => (-s, i) }
      .take(5).map(_._2)
    assert(got == expected)
  }

  test("topk_score_id skips NaN scores (they would jam the heap root)") {
    val got = spark.sql(
      "SELECT topk_score_id(c, i, 2) AS nn FROM VALUES " +
        "(CAST('NaN' AS DOUBLE), 1L), (1.0D, 2L), (2.0D, 3L) AS t(c, i)")
      .select(expr("transform(nn, x -> x.id)")).as[Seq[Long]].head()
    assert(got == Seq(3L, 2L))
  }

  test("topk_score_id works from SQL registration") {
    val one = spark.sql(
      "SELECT topk_score_id(CAST(c AS DOUBLE), CAST(i AS BIGINT), 2) AS nn " +
        "FROM VALUES (1.0, 1), (3.0, 2), (2.0, 3) AS t(c, i)")
      .select(expr("transform(nn, x -> x.id)")).as[Seq[Long]].head()
    assert(one == Seq(2L, 3L))
  }

  test("knnJoin probe-batch gate fails loudly") {
    val emb = Tables(spark, sf).embeddings
    val probes = emb.select(col("vec_id").as("probe_id"), col("embedding").as("pvec"))
    val e = intercept[IllegalArgumentException] {
      Knn.knnJoin(emb, probes, k = 5, maxProbes = 3L)
    }
    assert(e.getMessage.contains("maxProbes"))
  }

  test("q209 margin mining: top-1 is the true cross-side max; margins ordered") {
    import graft.functions.GraftFunctions
    val emb = Tables(spark, sf).embeddings
    val rows = run("q209_margin_mining").collect()
    assert(rows.length === 20)
    // margins arrive sorted descending with qid tiebreak
    val margins = rows.map(_.getAs[Double]("margin"))
    assert(margins.zip(margins.tail).forall { case (x, y) => x >= y })
    assert(margins.forall(m => m > 0.0))
    // cos_top1 must be the exact brute-force max over the other side
    val a = emb.filter(pmod(col("label"), lit(2)) === 0)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val b = emb.filter(pmod(col("label"), lit(2)) === 1)
      .select(col("vec_id").as("cid"), col("embedding").as("cv"))
    val best = a.crossJoin(b)
      .select(col("qid"),
        round(GraftFunctions.cosineF32(col("qv"), col("cv")), 6).as("s"))
      .groupBy("qid").agg(max(col("s")).as("mx"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    rows.foreach { r =>
      assert(r.getAs[Double]("cos_top1") === best(r.getAs[Long]("qid")))
    }
  }
}
