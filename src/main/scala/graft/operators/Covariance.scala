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
  * Exactness: each pairwise product is scaled by 1e7 and rounded ONCE
  * to an integer, then summed as LONG — order-free exact sums (the
  * q160 exactness argument with a long carrier instead of DECIMAL:
  * measured 3× cheaper in the 10M-products/s hot loop, and overflow-
  * safe to ~9e11 products per cell). Both engines reach identical
  * covariances at the final pinned double arithmetic.
  *
  * Scale shape: the product frame is generated PER ROW in codegen
  * (nested `transform` over the array producing a FLAT long array —
  * no per-product structs — plus one posexplode) and lands in a
  * partial aggregation keyed by triangle position (d(d+1)/2 ≈ 2k
  * keys), so executors stream n·d²/2 products through map-side
  * combine and the shuffle carries one partial matrix per task, not
  * per row; (pos → i,j) is a broadcast model-sized lookup joined
  * after aggregation.
  */
object Covariance {

  private val S = 1e7 // product scale: 7 fractional digits carried

  /** Upper-triangle covariance of the embedding dimensions. */
  def embeddingCovariance(emb: DataFrame): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val arr = col("embedding")
    // flat per-row upper-triangle products, scaled+rounded to longs
    val prods = flatten(transform(arr, (xi, i) =>
      transform(slice(arr, i + 1, size(arr) - i), xj =>
        round(xi.cast("double") * xj.cast("double") * lit(S), 0)
          .cast("long"))))
    val sums = emb.select(posexplode(prods).as(Seq("pos", "pl")))
      .groupBy("pos")
      .agg(sum(col("pl")).as("sxy"))
    val dims = emb.select(posexplode(arr).as(Seq("i", "x")))
      .groupBy("i")
      .agg(count(lit(1)).as("n"),
        sum(round(col("x").cast("double") * lit(S), 0).cast("long")).as("sx"))
    val d = emb.select(max(size(arr))).as[Int].head()
    val posmap = broadcast(
      (for (i <- 0 until d; j <- i until d) yield (i, j))
        .zipWithIndex.map { case ((i, j), pos) => (pos, i, j) }
        .toDF("pos", "i", "j"))
    sums.join(posmap, "pos")
      .join(dims.select(col("i"), col("n"), col("sx")), Seq("i"))
      .join(dims.select(col("i").as("j"), col("sx").as("sy")), Seq("j"))
      .select(col("i"), col("j"),
        round((col("sxy").cast("double") / lit(S) -
          (col("sx").cast("double") / lit(S)) *
            (col("sy").cast("double") / lit(S)) /
            col("n").cast("double")) / col("n").cast("double"), 6)
          .plus(lit(0.0)) // -0.0 → 0.0: sign-normalize before formatting
          .as("cov"))
      .orderBy("i", "j")
  }

  val entries: Seq[QueryEntry] = Seq(
    // DuckDB regenerates the product frame by lockstep unnest +
    // self-join and must reproduce every scaled-long sum — a single
    // product rounded differently anywhere in the n·d²/2 stream breaks
    // the hash.
    QueryEntry.sql(
      "q206_embed_covariance",
      """WITH x AS (
        |  SELECT vec_id,
        |         generate_subscripts(embedding, 1) - 1 AS i,
        |         unnest(embedding) AS v
        |  FROM embeddings
        |), sums AS (
        |  SELECT a.i AS i, b.i AS j,
        |         SUM(CAST(ROUND(CAST(a.v AS DOUBLE) * CAST(b.v AS DOUBLE)
        |                        * 10000000.0, 0) AS BIGINT)) AS sxy
        |  FROM x a JOIN x b ON a.vec_id = b.vec_id AND a.i <= b.i
        |  GROUP BY 1, 2
        |), dims AS (
        |  SELECT i, COUNT(*) AS n,
        |         SUM(CAST(ROUND(CAST(v AS DOUBLE) * 10000000.0, 0)
        |                  AS BIGINT)) AS sx
        |  FROM x GROUP BY 1
        |)
        |SELECT s.i, s.j,
        |       ROUND((CAST(s.sxy AS DOUBLE) / 10000000.0 -
        |              (CAST(di.sx AS DOUBLE) / 10000000.0) *
        |              (CAST(dj.sx AS DOUBLE) / 10000000.0) /
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
