package graft

import org.apache.spark.sql.functions._

import graft.operators.{Correlate, Covariance}

/** Signal-diagnostics coverage beyond the q204–q206 oracle gate: the
  * exact-decimal statistics must agree with Spark's own float
  * implementations to well under the 6 dp the queries round at, and
  * the structural invariants (bounds, matrix shape, PSD diagonal)
  * must hold.
  */
class CorrelateSpec extends SparkSpec {

  import spark.implicits._

  test("q204 pearson matches Spark's corr() to 1e-6 and stays in [-1, 1]") {
    val docs = Tables(spark, sf).documents
    val toks = graft.operators.TextAnalysis.tokens(col("text"))
    val ours = run("q204_signal_correlation").collect()
      .map(r => r.getString(0) -> r.getAs[Double]("pearson_r")).toMap
    val ref = docs.select(col("lang"),
        size(toks).cast("double").as("x"),
        size(array_distinct(toks)).cast("double").as("y"))
      .groupBy("lang").agg(corr(col("x"), col("y")).as("c"))
      .collect().map(r => r.getString(0) -> r.getAs[Double]("c")).toMap
    assert(ours.nonEmpty && ours.keySet === ref.keySet)
    ours.foreach { case (lang, r) =>
      assert(r >= -1.0 && r <= 1.0, s"$lang: $r")
      assert(math.abs(r - ref(lang)) < 1e-6, s"$lang: $r vs ${ref(lang)}")
    }
  }

  test("q205 kappa agrees with a driver-side confusion-matrix recompute") {
    val row = run("q205_label_agreement").collect()(0)
    val (n, agree) = (row.getAs[Long]("n"), row.getAs[Long]("agree"))
    val pairs = Tables(spark, sf).documents
      .select(col("lang").as("gold"),
        graft.operators.TextAnalysis.langPredicted(col("text")).as("pred"))
      .as[(String, String)].collect()
    assert(n === pairs.length.toLong)
    assert(agree === pairs.count { case (g, p) => g == p }.toLong)
    val po = agree.toDouble / n
    val gold = pairs.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val pred = pairs.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val pe = (gold.keySet ++ pred.keySet).toSeq
      .map(k => gold.getOrElse(k, 0L) * pred.getOrElse(k, 0L)).sum
      .toDouble / (n.toDouble * n.toDouble)
    val kappa = (po - pe) / (1.0 - pe)
    assert(math.abs(row.getAs[Double]("po") - po) < 1e-6)
    assert(math.abs(row.getAs[Double]("pe") - pe) < 1e-6)
    assert(math.abs(row.getAs[Double]("kappa") - kappa) < 1e-6)
    assert(kappa <= 1.0 && kappa >= -1.0)
  }

  test("q228 power iteration: unit vector, Rayleigh residual small, λ ≤ trace") {
    val rows = run("q228_power_iteration").collect()
    val d = rows.length
    val v = rows.sortBy(_.getAs[Int]("i")).map(_.getAs[Double]("loading"))
    val lambda = rows.head.getAs[Double]("lambda")
    // normalized on the 1e6 grid → unit within rounding
    val norm = math.sqrt(v.map(x => x * x).sum)
    assert(math.abs(norm - 1.0) < 1e-4, s"‖v‖=$norm")
    // residual of the eigen equation on the actual covariance matrix
    val cov = run("q206_embed_covariance").collect()
    val m = Array.ofDim[Double](d, d)
    cov.foreach { r =>
      val (i, j, c) = (r.getAs[Int]("i"), r.getAs[Int]("j"), r.getAs[Double]("cov"))
      m(i)(j) = c; m(j)(i) = c
    }
    val cv = Array.tabulate(d)(i => (0 until d).map(j => m(i)(j) * v(j)).sum)
    // the fixture spectrum is nearly flat at the top (λ₂/λ₁ ≈ 0.97
    // measured), so a 12-step iteration is near, not at, the fixpoint:
    // assert a 10% residual band plus the symmetric-PSD bracket
    // max_ii C_ii ≤ λ₁ ≤ trace
    val resid = math.sqrt(
      cv.zip(v).map { case (a, b) => math.pow(a - lambda * b, 2) }.sum)
    assert(resid < 0.1 * lambda, s"residual $resid vs λ=$lambda")
    val diag = (0 until d).map(i => m(i)(i))
    assert(lambda >= diag.max * 0.9, s"λ=$lambda vs max var ${diag.max}")
    assert(lambda > 0.0 && lambda <= diag.sum + 1e-9)
  }

  test("cov_moments equals the compositional posexplode statistics bit-for-bit") {
    // the r14 fused aggregate's equivalence law: counts, scaled-long
    // dim sums, and flat-triangle scaled-long product sums all equal
    // the transform+posexplode+hash-aggregate frame it replaced
    val emb = Tables(spark, sf).embeddings
    val arr = col("embedding")
    val S = 1e7
    val m = emb.agg(graft.functions.GraftFunctions.covMoments(arr).as("m"))
      .select(col("m.n"), col("m.sx"), col("m.sxy")).collect()(0)
    val gotN = m.getSeq[Long](0)
    val gotSx = m.getSeq[Long](1)
    val gotSxy = m.getSeq[Long](2)
    val dims = emb.select(posexplode(arr).as(Seq("i", "x")))
      .groupBy("i")
      .agg(count(lit(1)).as("n"),
        sum(round(col("x").cast("double") * lit(S), 0).cast("long")).as("sx"))
      .orderBy("i")
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(gotN == dims.map(_._1).toSeq)
    assert(gotSx == dims.map(_._2).toSeq)
    val prods = flatten(transform(arr, (xi, i) =>
      transform(slice(arr, i + 1, size(arr) - i), xj =>
        round(xi.cast("double") * xj.cast("double") * lit(S), 0)
          .cast("long"))))
    val sums = emb.select(posexplode(prods).as(Seq("pos", "pl")))
      .groupBy("pos").agg(sum(col("pl")).as("sxy"))
      .orderBy("pos").collect().map(_.getLong(1))
    assert(gotSxy == sums.toSeq)
  }

  test("q206 covariance: full upper triangle, non-negative diagonal, matches covar_pop") {
    val emb = Tables(spark, sf).embeddings
    val d = emb.select(size(col("embedding"))).as[Int].head()
    val rows = run("q206_embed_covariance").collect()
    assert(rows.length === d * (d + 1) / 2)
    val byIj = rows.map(r =>
      (r.getAs[Int]("i"), r.getAs[Int]("j")) -> r.getAs[Double]("cov")).toMap
    (0 until d).foreach(i => assert(byIj((i, i)) >= 0.0, s"var($i) < 0"))
    // spot-check a few cells against Spark's float covar_pop
    val ref = emb.select(posexplode(col("embedding")).as(Seq("i", "x")),
        col("vec_id"))
      .filter(col("i") < 3)
      .groupBy("vec_id").pivot("i", Seq(0, 1, 2)).agg(first(col("x")))
      .agg(covar_pop(col("0"), col("1")).as("c01"),
        covar_pop(col("0"), col("2")).as("c02"),
        covar_pop(col("1"), col("2")).as("c12"))
      .head()
    assert(math.abs(byIj((0, 1)) - ref.getAs[Double]("c01")) < 1e-5)
    assert(math.abs(byIj((0, 2)) - ref.getAs[Double]("c02")) < 1e-5)
    assert(math.abs(byIj((1, 2)) - ref.getAs[Double]("c12")) < 1e-5)
  }
}
