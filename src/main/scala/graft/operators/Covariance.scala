package graft.operators

import graft.{QueryEntry, Tables}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding-dimension covariance matrix — the first diagnostic run on
  * a new embedding column: collapsed or duplicated dimensions show up
  * as off-diagonal mass, dead dimensions as zero variance, and the
  * spectrum (computed downstream from this matrix) decides whether PQ
  * or dimension-trimming is safe. For d-dim vectors the result is the
  * d(d+1)/2 upper triangle.
  *
  * Exactness: each pairwise product is rounded ONCE at 7 dp and summed
  * as DECIMAL(18,7) — order-free exact sums (the q160/q124 pattern),
  * so both engines reach identical covariances bit-for-bit at the
  * final rounded division.
  *
  * Scale shape: the pair frame is generated PER ROW in codegen (nested
  * `transform` over the array + one explode — no self-join) and lands
  * in a partial aggregation with only d(d+1)/2 ≈ 2k grouping keys, so
  * executors stream n·d²/2 products through map-side combine and the
  * shuffle carries one partial matrix per task, not per row. A
  * float-accumulating `Aggregator` would cut the explode cost ~3× but
  * loses cross-engine bit-exactness — the declared trade, documented
  * here and cheap to flip at deployment.
  */
object Covariance {

  /** Upper-triangle covariance of the embedding dimensions. */
  def embeddingCovariance(emb: DataFrame): DataFrame = {
    val d7 = "decimal(18,7)"
    val arr = col("embedding")
    // per-row upper-triangle products: struct(i, j, round(xi·xj, 7))
    val pairs = flatten(transform(arr, (xi, i) =>
      transform(slice(arr, i + 1, size(arr) - i), (xj, k) =>
        struct(i.as("i"), (i + k).as("j"),
          round(xi.cast("double") * xj.cast("double"), 7).cast(d7).as("p")))))
    val sums = emb.select(explode(pairs).as("e"))
      .select(col("e.i"), col("e.j"), col("e.p"))
      .groupBy("i", "j")
      .agg(sum(col("p")).as("sxy"))
    val dims = emb.select(posexplode(arr).as(Seq("i", "x")))
      .groupBy("i")
      .agg(count(lit(1)).as("n"),
        sum(round(col("x").cast("double"), 7).cast(d7)).as("sx"))
    sums
      .join(dims.select(col("i"), col("n"), col("sx")), Seq("i"))
      .join(dims.select(col("i").as("j"), col("sx").as("sy")), Seq("j"))
      .select(col("i"), col("j"),
        round((col("sxy").cast("double") -
          col("sx").cast("double") * col("sy").cast("double") /
            col("n").cast("double")) / col("n").cast("double"), 6)
          .plus(lit(0.0)) // -0.0 → 0.0: sign-normalize before formatting
          .as("cov"))
      .orderBy("i", "j")
  }

  val entries: Seq[QueryEntry] = Seq(
    // DuckDB regenerates the pair frame by lockstep unnest + self-join
    // and must reproduce every rounded decimal sum — a single product
    // rounded differently anywhere in the n·d²/2 stream breaks the
    // hash.
    QueryEntry.sql(
      "q206_embed_covariance",
      """WITH x AS (
        |  SELECT vec_id,
        |         generate_subscripts(embedding, 1) - 1 AS i,
        |         unnest(embedding) AS v
        |  FROM embeddings
        |), sums AS (
        |  SELECT a.i AS i, b.i AS j,
        |         SUM(CAST(ROUND(CAST(a.v AS DOUBLE) * CAST(b.v AS DOUBLE), 7)
        |                  AS DECIMAL(18,7))) AS sxy
        |  FROM x a JOIN x b ON a.vec_id = b.vec_id AND a.i <= b.i
        |  GROUP BY 1, 2
        |), dims AS (
        |  SELECT i, COUNT(*) AS n,
        |         SUM(CAST(ROUND(CAST(v AS DOUBLE), 7) AS DECIMAL(18,7))) AS sx
        |  FROM x GROUP BY 1
        |)
        |SELECT s.i, s.j,
        |       ROUND((CAST(s.sxy AS DOUBLE) -
        |              CAST(di.sx AS DOUBLE) * CAST(dj.sx AS DOUBLE) /
        |              CAST(di.n AS DOUBLE)) / CAST(di.n AS DOUBLE), 6) + 0.0
        |         AS cov
        |FROM sums s
        |JOIN dims di ON di.i = s.i
        |JOIN dims dj ON dj.i = s.j
        |ORDER BY s.i, s.j""".stripMargin,
    ) { (s, dir) =>
      embeddingCovariance(Tables(s, dir).embeddings)
    },
  )
}
