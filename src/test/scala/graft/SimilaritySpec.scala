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

  test("maxsim_f32 fused score bit-equals the compositional explode/max/sum form") {
    // the r14 fusion's equivalence law: for every (probe, doc) pair of
    // the real fixture, the fused expression equals the exploded
    // 8-slice pipeline it replaced (same ROUND(cos,6) grid, same
    // DECIMAL sum-of-max, same null semantics)
    val emb = Tables(spark, sf).embeddings
    val d = emb.select(col("vec_id"), col("embedding").as("dv"))
    val q = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("embedding").as("qv"))
    val fused = d.join(broadcast(q), col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"),
        graft.functions.GraftFunctions.maxSimF32(col("qv"), col("dv"))
          .cast("double").as("score"))
      .orderBy("q_id", "vec_id")
      .as[(Long, Long, Double)].collect().toSeq
    def sliced(df: org.apache.spark.sql.DataFrame) = df.select(col("vec_id"),
      posexplode(array((0 until 8).map(m =>
        slice(col("embedding"), m * 8 + 1, 8)): _*)).as(Seq("si", "sv")))
    val de = sliced(emb).select(col("vec_id"), col("si").as("di"), col("sv").as("dvs"))
    val qe = sliced(emb.filter(col("vec_id") < 10))
      .select(col("vec_id").as("q_id"), col("si").as("qi"), col("sv").as("qvs"))
    val D6 = org.apache.spark.sql.types.DecimalType(18, 6)
    val compositional = de.join(broadcast(qe), col("vec_id") =!= col("q_id"))
      .groupBy("q_id", "vec_id", "qi")
      .agg(max(round(graft.functions.GraftFunctions.cosineF32(col("qvs"), col("dvs")), 6)
        .cast(D6)).as("m"))
      .groupBy("q_id", "vec_id").agg(sum("m").cast("double").as("score"))
      .orderBy("q_id", "vec_id")
      .as[(Long, Long, Double)].collect().toSeq
    assert(fused == compositional)
    assert(fused.nonEmpty)
  }

  test("maxsim_f32 null semantics: zero-norm and short arrays match the compositional rules") {
    val df = Seq(
      (1L, Array.fill(64)(0.0f)),                     // all-zero: every cosine null
      (2L, Array.tabulate(64)(i => (i % 7 + 1).toFloat)), // normal
      (3L, Array.tabulate(40)(i => (i + 1).toFloat))  // short: slices 5..7 empty
    ).toDF("vec_id", "embedding")
    val a = df.filter(col("vec_id") === 2).select(col("embedding").as("qv"))
    val zero = df.filter(col("vec_id") === 1).select(col("embedding").as("dv"))
    val short = df.filter(col("vec_id") === 3).select(col("embedding").as("dv"))
    // all-zero doc: every cosine NULL → score NULL
    val z = a.crossJoin(zero)
      .select(graft.functions.GraftFunctions.maxSimF32(col("qv"), col("dv")).as("s"))
      .collect()(0)
    assert(z.isNullAt(0))
    // 40-dim doc vs 64-dim query: slices 0..4 pair (8 vs 8), slice 5+
    // length-mismatch → those q-slices still score via... no: each
    // q-slice maxes over ALL d-slices, so slices 0..4 of d suffice and
    // the score is non-null
    val sh = a.crossJoin(short)
      .select(graft.functions.GraftFunctions.maxSimF32(col("qv"), col("dv")).as("s"))
      .collect()(0)
    assert(!sh.isNullAt(0))
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
