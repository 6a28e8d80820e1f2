package graft

import org.apache.spark.sql.functions._

/** The HOF→codegen dot-product rewrite: users write the portable
  * `aggregate(zip_with(...))` form; the optimizer swaps in
  * `DotProductF32`.
  */
class OptimizerRuleSpec extends SparkSpec {
  import spark.implicits._

  private val hof =
    "aggregate(zip_with(a, b, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), CAST(0 AS DOUBLE), (acc, v) -> acc + v)"

  test("HOF dot-product rewrites to dot_f32 and preserves results") {
    // file-backed source — a literal-backed LocalRelation would be
    // constant-folded away before the rewrite is observable
    val df = Tables(spark, sf).embeddings
      .select(col("embedding").as("a"), col("embedding").as("b"), col("vec_id"))
    val q = df.selectExpr("vec_id", s"$hof AS d")
    val optimized = q.queryExecution.optimizedPlan.toString
    assert(optimized.contains("dot_f32"), optimized)
    // results equal the unrewritten computation (norms² of unit vectors ≈ 1)
    val vals = q.orderBy("vec_id").limit(5).select("d").as[Double].collect()
    vals.foreach(v => assert(math.abs(v - 1.0) < 1e-3, v))
  }

  test("value-changing casts in the multiply lambda are not rewritten") {
    // CAST(x AS INT) truncates — rewriting to dot_f32 would silently
    // drop the truncation; the rule must keep the original expression.
    val df = Tables(spark, sf).embeddings
      .select(col("embedding").as("a"), col("embedding").as("b"))
    val q = df.selectExpr(
      "aggregate(zip_with(a, b, (x, y) -> CAST(CAST(x AS INT) AS DOUBLE) * CAST(y AS DOUBLE)), CAST(0 AS DOUBLE), (acc, v) -> acc + v) AS d")
    assert(!q.queryExecution.optimizedPlan.toString.contains("dot_f32"),
      q.queryExecution.optimizedPlan.toString)
  }

  test("non-matching shapes are left alone") {
    val df = Seq((Seq(1.0f, 2.0f), Seq(3.0f, 4.0f))).toDF("a", "b")
    // subtraction merge — not a dot product
    val q = df.selectExpr(
      "aggregate(zip_with(a, b, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), CAST(0 AS DOUBLE), (acc, v) -> acc - v) AS d")
    assert(!q.queryExecution.optimizedPlan.toString.contains("dot_f32"))
    // double arrays — outside the float fast path
    val dd = Seq((Seq(1.0, 2.0), Seq(3.0, 4.0))).toDF("a", "b")
    val q2 = dd.selectExpr(
      "aggregate(zip_with(a, b, (x, y) -> x * y), CAST(0 AS DOUBLE), (acc, v) -> acc + v) AS d")
    assert(!q2.queryExecution.optimizedPlan.toString.contains("dot_f32"))
    assert(q2.as[Double].head == 11.0)
  }
}
