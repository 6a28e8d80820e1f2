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

  /** Upper-triangle covariance of the embedding dimensions.
    *
    * r14 optimization: the sufficient statistics (per-dim counts and
    * scaled-long sums, flat-triangle scaled-long product sums) come
    * from ONE `cov_moments` pass — the compositional form generated
    * d(d+1)/2 product longs per row, posexploded them into n·d²/2 rows
    * and hash-aggregated 2k keys twice (products + dims). The
    * aggregate accumulates the identical ROUND-grid longs in place
    * (CovarianceSpec pins equality of the statistics), the shuffle
    * carries one ~2k-long buffer per task, and the final arithmetic
    * below is unchanged — same posmap join, same pinned double
    * divisions, same oracle.
    */
  def embeddingCovariance(emb: DataFrame): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val arr = col("embedding")
    val d = emb.select(max(size(arr))).as[Int].head()
    val posmap = broadcast(
      (for (i <- 0 until d; j <- i until d) yield (i, j))
        .zipWithIndex.map { case ((i, j), pos) => (pos, i, j) }
        .toDF("pos", "i", "j"))
    val mom = emb.agg(graft.functions.GraftFunctions
      .covMoments(arr).as("m"))
    mom.select(col("m.n").as("ns"), col("m.sx").as("sxs"),
        posexplode(col("m.sxy")).as(Seq("pos", "sxy")))
      .join(posmap, "pos")
      .select(col("i"), col("j"),
        round((col("sxy").cast("double") / lit(S) -
          (element_at(col("sxs"), col("i") + 1).cast("double") / lit(S)) *
            (element_at(col("sxs"), col("j") + 1).cast("double") / lit(S)) /
            element_at(col("ns"), col("i") + 1).cast("double")) /
          element_at(col("ns"), col("i") + 1).cast("double"), 6)
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

    // q228 — the spectral diagnostic on top of q206: dominant
    // eigenvector + eigenvalue of the covariance matrix by TWELVE
    // power iterations carried in scaled integers (matvec = exact
    // long sums, norms = exact 128-bit integer sums, one double
    // sqrt+division per component per iteration, re-rounded to the
    // 1e6 grid) — so both engines walk the identical trajectory and
    // the final loadings hash-match. The iteration itself is
    // model-sized (d×d on the driver / a 36-CTE unroll in DuckDB);
    // all data-scale work is q206's one covariance pass.
    QueryEntry.sql(
      "q228_power_iteration",
      powerIterationOracleSql(12),
    ) { (s, dir) =>
      powerIteration(Tables(s, dir).embeddings, iters = 12)
    },

    // q236 — per-label statistics of the projection onto q228's
    // dominant eigenvector: the 1-D "does the top PC separate the
    // labels?" diagnostic (class-mean spread along the principal axis
    // vs within-class variance) read before trusting PCA-reduced
    // embeddings for retrieval or clustering. DuckDB re-runs the whole
    // 12-iteration trajectory AND the projection/moment pass.
    QueryEntry.sql(
      "q236_pca_project",
      pcaProjectOracleSql(12),
    ) { (s, dir) =>
      pcaProject(Tables(s, dir).embeddings, iters = 12)
    },

    // q266 — per-label embedding-centroid drift between the two
    // vec_id-parity halves: the encoder-health check a pipeline runs
    // between corpus snapshots (a re-embedded or corrupted batch moves
    // its class centroid; same-encoder halves should sit ~identical).
    // Per label: both half sizes, squared L2 distance between the
    // half centroids, and their cosine. Determinism: per-dim sums are
    // 1e7-scaled exact longs (the q206 carrier), per-dim means rounded
    // once at 7dp, the four per-dim second-order terms rounded once at
    // 14dp into DECIMAL(38,14) sums (order-free), l2 emitted via
    // DECIMAL scale-8 cast (never ROUND on a double), cosine one
    // double chain rounded 6dp (q206 precedent).
    // Scale shape: one posexplode + one (label, half, dim) grouped
    // exact aggregate — dims-bounded output, corpus touched once, no
    // vector pair ever forms.
    QueryEntry.sql(
      "q266_centroid_drift",
      """WITH x AS (
        |  SELECT label, vec_id % 2 AS h,
        |         generate_subscripts(embedding, 1) - 1 AS i,
        |         unnest(embedding) AS v
        |  FROM embeddings
        |), dims AS (
        |  SELECT label, h, i, COUNT(*) AS n,
        |         SUM(CAST(ROUND(CAST(v AS DOUBLE) * 10000000.0, 0)
        |                  AS BIGINT)) AS sx
        |  FROM x GROUP BY 1, 2, 3
        |), m AS (
        |  SELECT label, h, i, n,
        |         ROUND(CAST(sx AS DOUBLE) / 10000000.0 / CAST(n AS DOUBLE), 7)
        |           AS m
        |  FROM dims
        |), j AS (
        |  SELECT a.label AS label, a.i AS i, a.n AS n_a, b.n AS n_b,
        |         a.m AS ma, b.m AS mb
        |  FROM m a JOIN m b ON a.label = b.label AND a.i = b.i
        |  WHERE a.h = 0 AND b.h = 1
        |)
        |SELECT label, CAST(MAX(n_a) AS BIGINT) AS n_a,
        |       CAST(MAX(n_b) AS BIGINT) AS n_b,
        |       CAST(CAST(SUM(CAST(ROUND((ma - mb) * (ma - mb), 14)
        |                          AS DECIMAL(38,14))) AS DECIMAL(38,8))
        |            AS DOUBLE) + 0.0 AS l2_sq,
        |       ROUND(CAST(SUM(CAST(ROUND(ma * mb, 14) AS DECIMAL(38,14)))
        |                  AS DOUBLE)
        |             / sqrt(CAST(SUM(CAST(ROUND(ma * ma, 14)
        |                                  AS DECIMAL(38,14))) AS DOUBLE)
        |                    * CAST(SUM(CAST(ROUND(mb * mb, 14)
        |                                    AS DECIMAL(38,14))) AS DOUBLE)),
        |             6) + 0.0 AS cos_centroids
        |FROM j GROUP BY label ORDER BY label""".stripMargin,
    ) { (s, dir) =>
      centroidDrift(Tables(s, dir).embeddings)
    },
  )

  /** The q266 engine path — see the entry's scaladoc for the
    * determinism protocol.
    */
  def centroidDrift(emb: DataFrame): DataFrame = {
    val dims = emb
      .select(col("label"), pmod(col("vec_id"), lit(2)).as("h"),
        posexplode(col("embedding")).as(Seq("i", "x")))
      .groupBy("label", "h", "i")
      .agg(count(lit(1)).as("n"),
        sum(round(col("x").cast("double") * lit(S), 0).cast("long")).as("sx"))
    val m = dims.select(col("label"), col("h"), col("i"), col("n"),
      round(col("sx").cast("double") / lit(S) / col("n").cast("double"), 7)
        .as("m"))
    val a = m.filter(col("h") === 0)
      .select(col("label"), col("i"), col("n").as("n_a"), col("m").as("ma"))
    val b = m.filter(col("h") === 1)
      .select(col("label"), col("i"), col("n").as("n_b"), col("m").as("mb"))
    val dec = org.apache.spark.sql.types.DecimalType(38, 14)
    a.join(b, Seq("label", "i"))
      .groupBy("label")
      .agg(
        max(col("n_a")).as("n_a"),
        max(col("n_b")).as("n_b"),
        sum(round((col("ma") - col("mb")) * (col("ma") - col("mb")), 14)
          .cast(dec)).as("dd"),
        sum(round(col("ma") * col("mb"), 14).cast(dec)).as("dab"),
        sum(round(col("ma") * col("ma"), 14).cast(dec)).as("daa"),
        sum(round(col("mb") * col("mb"), 14).cast(dec)).as("dbb"))
      .select(col("label"), col("n_a"), col("n_b"),
        (col("dd").cast(org.apache.spark.sql.types.DecimalType(38, 8))
          .cast("double") + lit(0.0)).as("l2_sq"),
        (round(col("dab").cast("double") /
          sqrt(col("daa").cast("double") * col("dbb").cast("double")), 6)
          + lit(0.0)).as("cos_centroids"))
      .orderBy("label")
  }

  /** Half-away-from-zero rounding to long — the SQL ROUND(x, 0)
    * semantic (math.round would round toward +inf for negatives).
    */
  private def halfAway(x: Double): Long =
    (if (x >= 0) math.floor(x + 0.5) else math.ceil(x - 0.5)).toLong

  /** Dominant eigenpair of [[embeddingCovariance]] by integer-exact
    * power iteration (q228). Deterministic: pinned uniform start
    * (1/√d on the 1e6 grid), every iterate re-rounded to that grid.
    */
  def powerIteration(emb: DataFrame, iters: Int): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val cells = embeddingCovariance(emb).collect() // model-sized: d(d+1)/2
    val d = cells.map(_.getAs[Int]("j")).max + 1
    val m = Array.ofDim[Long](d, d)
    cells.foreach { r =>
      val i = r.getAs[Int]("i"); val j = r.getAs[Int]("j")
      val c = halfAway(r.getAs[Double]("cov") * 1e6)
      m(i)(j) = c; m(j)(i) = c
    }
    var v = Array.fill(d)(halfAway(1e6 / math.sqrt(d.toDouble)))
    var lambda = 0.0
    for (_ <- 1 to iters) {
      val w = Array.tabulate(d)(i =>
        (0 until d).foldLeft(0L)((acc, j) => acc + m(i)(j) * v(j)))
      val n2w = w.iterator.map(x => BigInt(x) * BigInt(x)).sum
      val n2v = v.iterator.map(x => BigInt(x) * BigInt(x)).sum
      val norm = math.sqrt(n2w.toDouble)
      lambda = math.sqrt(n2w.toDouble) / math.sqrt(n2v.toDouble) / 1e6
      v = w.map(x => halfAway(x.toDouble / norm * 1e6))
    }
    val lam = BigDecimal(lambda).setScale(6, BigDecimal.RoundingMode.HALF_UP)
      .toDouble
    v.zipWithIndex.map { case (x, i) => (i, x.toDouble / 1e6 + 0.0, lam) }
      .toSeq.toDF("i", "loading", "lambda")
      .orderBy("i")
  }

  /** DuckDB unroll of [[powerIteration]]: q206's covariance sums →
    * scaled-integer full matrix → `iters` matvec/normalize rounds →
    * loadings + Rayleigh eigenvalue.
    */
  def powerIterationOracleSql(iters: Int): String =
    s"""${powerIterationCtes(iters)}
       |SELECT v$iters.j AS i,
       |       CAST(v$iters.v AS DOUBLE) / 1000000.0 + 0.0 AS loading,
       |       ROUND(sqrt(CAST(n$iters.n2w AS DOUBLE))
       |             / sqrt(CAST(n$iters.n2v AS DOUBLE)) / 1000000.0, 6)
       |         AS lambda
       |FROM v$iters, n$iters ORDER BY i""".stripMargin

  /** The WITH-chain shared by q228 and q236: covariance → scaled
    * matrix → `iters` matvec/normalize rounds; exposes `x` (unnested
    * embeddings) and `v$iters` (final grid loadings) to the caller's
    * final SELECT.
    */
  def powerIterationCtes(iters: Int): String = {
    val base =
      """WITH x AS MATERIALIZED (
        |  SELECT vec_id,
        |         generate_subscripts(embedding, 1) - 1 AS i,
        |         unnest(embedding) AS v
        |  FROM embeddings
        |), sums AS MATERIALIZED (
        |  SELECT a.i AS i, b.i AS j,
        |         SUM(CAST(ROUND(CAST(a.v AS DOUBLE) * CAST(b.v AS DOUBLE)
        |                        * 10000000.0, 0) AS BIGINT)) AS sxy
        |  FROM x a JOIN x b ON a.vec_id = b.vec_id AND a.i <= b.i
        |  GROUP BY 1, 2
        |), dims AS MATERIALIZED (
        |  SELECT i, COUNT(*) AS n,
        |         SUM(CAST(ROUND(CAST(v AS DOUBLE) * 10000000.0, 0)
        |                  AS BIGINT)) AS sx
        |  FROM x GROUP BY 1
        |), cov AS MATERIALIZED (
        |  SELECT s.i, s.j,
        |         ROUND((CAST(s.sxy AS DOUBLE) / 10000000.0 -
        |                (CAST(di.sx AS DOUBLE) / 10000000.0) *
        |                (CAST(dj.sx AS DOUBLE) / 10000000.0) /
        |                CAST(di.n AS DOUBLE)) / CAST(di.n AS DOUBLE), 6) + 0.0
        |           AS c
        |  FROM sums s
        |  JOIN dims di ON di.i = s.i
        |  JOIN dims dj ON dj.i = s.j
        |), cm AS MATERIALIZED (
        |  SELECT i, j, CAST(ROUND(c * 1000000.0, 0) AS BIGINT) AS m FROM cov
        |  UNION ALL
        |  SELECT j, i, CAST(ROUND(c * 1000000.0, 0) AS BIGINT) FROM cov
        |  WHERE i <> j
        |), dd AS (SELECT MAX(i) + 1 AS d FROM cm),
        |v0 AS MATERIALIZED (
        |  SELECT i AS j,
        |         CAST(ROUND(1000000.0 / sqrt(CAST(d AS DOUBLE)), 0) AS BIGINT)
        |           AS v
        |  FROM (SELECT DISTINCT i FROM cm), dd
        |)""".stripMargin
    val its = (1 to iters).map { k =>
      s"""w$k AS MATERIALIZED (
         |  SELECT cm.i, SUM(cm.m * v${k - 1}.v) AS w
         |  FROM cm JOIN v${k - 1} ON v${k - 1}.j = cm.j GROUP BY 1
         |), n$k AS MATERIALIZED (
         |  SELECT SUM(CAST(w AS HUGEINT) * w) AS n2w,
         |         (SELECT SUM(CAST(v AS HUGEINT) * v) FROM v${k - 1}) AS n2v
         |  FROM w$k
         |), v$k AS MATERIALIZED (
         |  SELECT i AS j,
         |         CAST(ROUND(CAST(w AS DOUBLE) / sqrt(CAST(n2w AS DOUBLE))
         |                    * 1000000.0, 0) AS BIGINT) AS v
         |  FROM w$k, n$k
         |)""".stripMargin
    }.mkString(",\n")
    s"""$base,
       |$its""".stripMargin
  }

  /** Per-label projection moments onto the dominant eigenvector
    * (q236). Exactness: the fitted loadings are 1e6-grid doubles
    * (identical in both engines by q228's construction); each
    * component product is rounded ONCE to the 1e7 grid and summed as
    * LONG per vector (the q206 carrier), so per-vector projections are
    * exact integers and the label moments reduce to integer sums.
    *
    * Scale shape: the eigenpair fit is q228 (one covariance pass +
    * model-sized iteration); the projection is one codegen
    * `zip_with`/`aggregate` pass with a broadcast-literal loading
    * array; moments are one grouped aggregation over |labels| keys.
    */
  def pcaProject(emb: DataFrame, iters: Int): DataFrame = {
    val loadings = powerIteration(emb, iters).collect() // d rows, model-sized
      .map(r => (r.getAs[Int]("i"), r.getAs[Double]("loading")))
      .sortBy(_._1).map(_._2)
    val vCol = array(loadings.map(lit(_)): _*)
    val p = aggregate(
      zip_with(col("embedding"), vCol, (x, v) =>
        round(x.cast("double") * v * lit(S), 0).cast("long")),
      lit(0L), (acc, y) => acc + y)
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    emb.select(col("label"), p.as("p"))
      .groupBy("label")
      .agg(count(lit(1)).as("n"),
        sum(col("p").cast(dec)).as("sp"),
        sum(col("p").cast(dec) * col("p")).as("spp"))
      .select(col("label"), col("n").cast("long").as("n"),
        (round(col("sp").cast("double") / (lit(S) * col("n")), 6) + lit(0.0))
          .as("mean_proj"),
        (round((col("spp").cast("double") / lit(S * S) -
          (col("sp").cast("double") / lit(S)) *
            (col("sp").cast("double") / lit(S)) / col("n")) / col("n"), 6)
          + lit(0.0)).as("var_proj"))
      .orderBy("label")
  }

  /** DuckDB mirror of [[pcaProject]]: the q228 CTE chain + the
    * projection and per-label moment pass.
    */
  def pcaProjectOracleSql(iters: Int): String =
    s"""${powerIterationCtes(iters)},
       |proj AS (
       |  SELECT x.vec_id,
       |         SUM(CAST(ROUND(CAST(x.v AS DOUBLE)
       |                        * (CAST(vv.v AS DOUBLE) / 1000000.0)
       |                        * 10000000.0, 0) AS BIGINT)) AS p
       |  FROM x JOIN v$iters vv ON vv.j = x.i
       |  GROUP BY 1
       |), lab AS (SELECT vec_id, label FROM embeddings),
       |per AS (
       |  SELECT l.label, COUNT(*) AS n,
       |         SUM(CAST(p AS HUGEINT)) AS sp,
       |         SUM(CAST(p AS HUGEINT) * p) AS spp
       |  FROM proj pr JOIN lab l ON l.vec_id = pr.vec_id
       |  GROUP BY 1
       |)
       |SELECT label, CAST(n AS BIGINT) AS n,
       |       ROUND(CAST(sp AS DOUBLE) / (10000000.0 * n), 6) + 0.0
       |         AS mean_proj,
       |       ROUND((CAST(spp AS DOUBLE) / 100000000000000.0 -
       |              (CAST(sp AS DOUBLE) / 10000000.0) *
       |              (CAST(sp AS DOUBLE) / 10000000.0) / n) / n, 6) + 0.0
       |         AS var_proj
       |FROM per ORDER BY label""".stripMargin
}
