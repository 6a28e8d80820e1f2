package graft

import graft.operators.Similarity
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  test("topKCosine equals the HOF-computed brute force ranking") {
    val emb = Tables(spark, sf).embeddings
    val got = run("q13_topk_cosine").as[(Long, Double)].collect().toSeq

    val q = emb.filter(col("vec_id") === 42).select(col("embedding").as("q"))
    val oracle = emb.crossJoin(q)
      .filter(col("vec_id") =!= 42)
      .selectExpr(
        "vec_id",
        """round(
          |  aggregate(zip_with(embedding, q, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), CAST(0 AS DOUBLE), (a, v) -> a + v)
          |  / (sqrt(aggregate(embedding, CAST(0 AS DOUBLE), (a, x) -> a + CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))
          |     * sqrt(aggregate(q, CAST(0 AS DOUBLE), (a, x) -> a + CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 6) AS score""".stripMargin,
      )
      .orderBy(col("score").desc, col("vec_id"))
      .limit(20).as[(Long, Double)].collect().toSeq

    assert(got == oracle)
  }

  test("top-k plan is TakeOrderedAndProject (no global sort)") {
    val plan = run("q13_topk_cosine").queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan.take(1500))
  }

  test("q22 block-grid exact pairs equal brute-force all-pairs, with no full-table broadcast") {
    val emb = Tables(spark, sf).embeddings
    val got = run("q22_embed_neardup")
    // semantic oracle: the naive upper-triangle self-join
    val a = emb.select(col("vec_id").as("vec_a"), col("embedding").as("ea"))
    val b = emb.select(col("vec_id").as("vec_b"), col("embedding").as("eb"))
    val brute = a.join(b, col("vec_a") < col("vec_b"))
      .select(col("vec_a"), col("vec_b"),
        round(graft.functions.GraftFunctions.cosineF32(col("ea"), col("eb")), 6).as("score"))
      .filter(col("score") >= 0.45)
      .orderBy("vec_a", "vec_b")
      .as[(Long, Long, Double)].collect().toSeq
    assert(got.as[(Long, Long, Double)].collect().toSeq == brute)
    // the 100 TB property: no broadcast nested-loop over the table —
    // the only broadcast is the tiny block-pair tile relation
    val plan = got.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(2000))
  }

  test("exactCosinePairs size gate fails loudly beyond maxRows") {
    val emb = Tables(spark, sf).embeddings
    val e = intercept[IllegalArgumentException] {
      Similarity.exactCosinePairs(emb, 0.45, maxRows = 10L)
    }
    assert(e.getMessage.contains("O(n²)"))
  }

  test("lshBuckets is deterministic and bucket-compatible for identical vectors") {
    val emb = Tables(spark, sf).embeddings
    val b1 = Similarity.lshBuckets(emb).as[(Long, Long)].collect().toMap
    val b2 = Similarity.lshBuckets(emb).as[(Long, Long)].collect().toMap
    assert(b1 == b2)
    // a vector joined to itself must land in its own bucket
    val dup = emb.limit(5).union(emb.limit(5))
    val counts = Similarity.lshBuckets(dup).groupBy("vec_id", "bucket").count()
    assert(counts.filter(col("count") =!= 2).count() == 0)
  }
}
