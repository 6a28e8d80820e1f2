package graft.operators

import graft.{QueryEntry, Tables}
import graft.functions.GraftFunctions
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.DataFrame

/** Population Stability Index — the standard distribution-drift score
  * between a reference slice and a current slice (feature monitoring,
  * model-retraining triggers): PSI = Σ_buckets (p_ref − p_cur) ·
  * ln(p_ref / p_cur), here reported per bucket so the drift is
  * attributable, with the scalar PSI the sum of `contrib`.
  *
  * Scale shape: one pass buckets every row (codegen CASE + clamp),
  * one map-side-combined count to slices × buckets cells, and all the
  * ratio/log arithmetic runs on that cell frame — the corpus is
  * touched once regardless of bucket count. Empty cells take the
  * conventional ε = 1e-6 floor (deterministic in both engines) so a
  * vanished bucket contributes a large-but-finite drift, not ±∞.
  */
object Drift {

  val Eps = 1e-6

  /** Per-bucket (p_ref, p_cur, contribution) for `value` distributions
    * before/after `boundary` (a `yyyy-MM-dd` date): fixed-width
    * buckets `floor(value/width)` clamped to [0, buckets).
    */
  def psiBuckets(events: DataFrame, boundary: String,
      buckets: Int = 10, width: Double = 10.0): DataFrame = {
    val base = events.select(
      when(to_date(col("ts")) < lit(boundary).cast(DateType), "ref")
        .otherwise("cur").as("slice"),
      least(greatest(floor(col("value") / width).cast(IntegerType), lit(0)),
        lit(buckets - 1)).as("bucket"))
    val cnt = base.groupBy("slice", "bucket").agg(count(lit(1)).as("c"))
    val tot = cnt.groupBy("slice").agg(sum("c").as("t"))
    val p = cnt.join(broadcast(tot), Seq("slice"))
      .groupBy("bucket")
      .agg(
        max(when(col("slice") === "ref", col("c") / col("t"))).as("pa"),
        max(when(col("slice") === "cur", col("c") / col("t"))).as("pb"))
    val pa = coalesce(col("pa"), lit(Eps))
    val pb = coalesce(col("pb"), lit(Eps))
    p.select(col("bucket"),
        round(pa, 6).as("p_ref"),
        round(pb, 6).as("p_cur"),
        round((pa - pb) * log(pa / pb), 6).as("contrib"))
      .orderBy("bucket")
  }

  /** Offline CUSUM change-point estimate per series: the day k
    * maximizing |S_k|, S_k = Σ_{i≤k}(x_i − x̄) over the series' daily
    * counts — the classic single-change-point location estimator
    * (Page's CUSUM in its offline form).
    *
    * INTEGER-EXACT by construction: the mean subtraction is cleared of
    * division by scaling with n_days — S'_k = n_days·prefix_k −
    * k·total — so the running statistic is integer arithmetic end to
    * end and the argmax cannot flip on an ulp (the magnitude bound
    * n_days·total < 2⁵³ is the caller contract; daily grain on yearly
    * windows leaves ~2⁴⁰ headroom for the count). The running sum is a
    * per-series ordered window (partitioned by series — parallel across
    * series); the argmax is the house k-bounded heap with k=1
    * ((|S| DESC, day ASC), so ties resolve to the earliest day).
    */
  def cusumChangepoint(events: DataFrame): DataFrame = {
    val daily = events
      .groupBy(col("event_type"), to_date(col("ts")).as("d"))
      .agg(count(lit(1)).as("n"))
    val tot = daily.groupBy("event_type")
      .agg(sum("n").as("total"), count(lit(1)).as("n_days"))
    val w = Window.partitionBy("event_type").orderBy("d")
    val s = daily.join(broadcast(tot), "event_type")
      .withColumn("prefix", sum("n").over(w))
      .withColumn("k", row_number().over(w))
      .withColumn("s_abs",
        abs(col("n_days") * col("prefix") - col("k") * col("total")))
    s.groupBy(col("event_type"), col("n_days"), col("total"))
      .agg(GraftFunctions.topkScoreId(
        col("s_abs").cast(DoubleType),
        datediff(col("d"), lit("1970-01-01").cast(DateType)).cast(LongType), 1).as("top"))
      .select(col("event_type"), col("n_days"), col("total"),
        date_format(
          date_add(lit("1970-01-01").cast(DateType),
            element_at(col("top"), 1).getField("id").cast(IntegerType)),
          "yyyy-MM-dd").as("change_day"),
        element_at(col("top"), 1).getField("score").cast(LongType).as("s_abs"))
      .orderBy("event_type")
  }

  /** Per-label embedding centroid drift between two corpus halves
    * (vec_id parity): the L2 distance between each label's half-A and
    * half-B mean vectors — the EMBEDDING-space counterpart to the
    * scalar PSI above (PSI watches a feature's distribution; this
    * watches a representation, the standard "did my encoder or my
    * corpus move?" monitor between ingestion batches).
    *
    * Scale shape: ONE posexplode pass over the vectors, one grouped
    * aggregate to (label × dim) cells with the two half-means computed
    * as conditional AVGs in the same shuffle, then the L2 folds the
    * dim-sized cell frame per label — the corpus is touched once, and
    * nothing larger than labels × dims is ever materialized. Counts
    * ride a separate vector-level aggregate (labels-sized, broadcast
    * back). The half-means are snapped to 6 decimals BEFORE the L2 so
    * the statistic is insensitive to summation order (same pin both
    * engines — differential-safe under parallel aggregation).
    */
  def centroidDrift(emb: DataFrame): DataFrame = {
    val half = (col("vec_id") % 2).as("half")
    val cells = emb
      .select(col("label"), half, posexplode(col("embedding")).as(Seq("d", "v")))
      .groupBy("label", "d")
      .agg(
        round(avg(when(col("half") === 0, col("v").cast(DoubleType))), 6).as("ma"),
        round(avg(when(col("half") === 1, col("v").cast(DoubleType))), 6).as("mb"))
    val counts = emb.groupBy("label").agg(
      sum(when(col("vec_id") % 2 === 0, 1L).otherwise(0L)).as("n_a"),
      sum(when(col("vec_id") % 2 === 1, 1L).otherwise(0L)).as("n_b"))
    cells
      .groupBy("label")
      .agg(round(sqrt(sum((col("ma") - col("mb")) * (col("ma") - col("mb")))), 6)
        .as("drift"))
      .join(broadcast(counts), Seq("label"))
      .select(col("label"), col("n_a"), col("n_b"), col("drift"))
      .orderBy("label")
  }

  /** Per-label Davies–Bouldin cluster-quality terms (Davies & Bouldin,
    * IEEE TPAMI 1979): for each label i, scatter s_i = mean L2 of the
    * label's vectors to their centroid, and the DB term
    * max_{j≠i}(s_i+s_j)/d_ij — the worst separation ratio against any
    * other label, with the offending label named. The scalar DB index
    * is the mean of `db_term`; reported per label so a degrading
    * cluster is attributable (the same per-group-attribution stance as
    * PSI above and q126's buckets). The standard "are my labels still
    * separable in embedding space?" monitor after an encoder or corpus
    * change — the quality companion to [[centroidDrift]].
    *
    * Scale shape: the corpus is streamed twice and materialized never —
    * once to fit the labels×dims centroid cell frame, once to score
    * each vector's distance against its own centroid (cells broadcast,
    * so scoring is shuffle-free up to the per-vector aggregate).
    * Everything downstream (pairwise centroid distances, ratio argmax)
    * runs on labels²-sized frames. Centroid means are snapped to 6dp
    * in both engines (q159's order-insensitivity pin); the ratio
    * argmax tie-breaks to the smallest label id.
    */
  def daviesBouldin(emb: DataFrame): DataFrame = {
    val cells = emb
      .select(col("label"), posexplode(col("embedding")).as(Seq("d", "v")))
      .groupBy("label", "d")
      .agg(round(avg(col("v").cast(DoubleType)), 6).as("m"))
    val dist = emb
      .select(col("vec_id"), col("label"),
        posexplode(col("embedding")).as(Seq("d", "v")))
      .join(broadcast(cells), Seq("label", "d"))
      .groupBy(col("vec_id"), col("label"))
      .agg(sqrt(sum((col("v").cast(DoubleType) - col("m"))
        * (col("v").cast(DoubleType) - col("m")))).as("dist"))
    val scatter = dist.groupBy("label")
      .agg(count(lit(1)).as("n_vecs"), round(avg("dist"), 6).as("s"))
    val dij = cells.select(col("label").as("i"), col("d"), col("m").as("mi"))
      .join(cells.select(col("label").as("j"), col("d"), col("m").as("mj")),
        Seq("d"))
      .filter(col("i") =!= col("j"))
      .groupBy("i", "j")
      .agg(sqrt(sum((col("mi") - col("mj")) * (col("mi") - col("mj")))).as("dij"))
    val ratios = dij
      .join(broadcast(scatter.select(
        col("label").as("i"), col("s").as("si"), col("n_vecs"))), Seq("i"))
      .join(broadcast(scatter.select(col("label").as("j"), col("s").as("sj"))),
        Seq("j"))
      .select(col("i"), col("n_vecs"), col("si"), col("j"),
        round((col("si") + col("sj")) / col("dij"), 6).as("db_term"))
    val w = Window.partitionBy("i").orderBy(desc("db_term"), col("j"))
    ratios.withColumn("rk", row_number().over(w)).filter(col("rk") === 1)
      .select(col("i").as("label"), col("n_vecs"), col("si").as("scatter"),
        col("j").as("worst_label"), col("db_term"))
      .orderBy("label")
  }

  val entries: Seq[QueryEntry] = Seq(
    // Value-distribution drift across the mid-January boundary; DuckDB
    // re-derives bucket shares and the per-bucket PSI contribution.
    QueryEntry.sql(
      "q126_psi_drift",
      """WITH base AS (
        |  SELECT CASE WHEN CAST(ts AS DATE) < DATE '2024-01-15'
        |              THEN 'ref' ELSE 'cur' END AS slice,
        |         LEAST(GREATEST(CAST(FLOOR(value / 10) AS INTEGER), 0), 9)
        |           AS bucket
        |  FROM events
        |), cnt AS (
        |  SELECT slice, bucket, COUNT(*) AS c FROM base GROUP BY 1, 2
        |), tot AS (SELECT slice, SUM(c) AS t FROM cnt GROUP BY 1),
        |p AS (
        |  SELECT bucket,
        |         MAX(CASE WHEN cnt.slice = 'ref' THEN c / t END) AS pa,
        |         MAX(CASE WHEN cnt.slice = 'cur' THEN c / t END) AS pb
        |  FROM cnt JOIN tot ON cnt.slice = tot.slice GROUP BY 1
        |)
        |SELECT bucket, ROUND(COALESCE(pa, 1e-6), 6) AS p_ref,
        |       ROUND(COALESCE(pb, 1e-6), 6) AS p_cur,
        |       ROUND((COALESCE(pa, 1e-6) - COALESCE(pb, 1e-6))
        |             * ln(COALESCE(pa, 1e-6) / COALESCE(pb, 1e-6)), 6)
        |         AS contrib
        |FROM p ORDER BY 1""".stripMargin,
    ) { (s, dir) =>
      psiBuckets(Tables(s, dir).events, "2024-01-15")
    },

    // q150 — CUSUM change-point day per event_type over daily counts;
    // the statistic is the n_days-scaled running deviation (integer
    // arithmetic end to end on both sides).
    QueryEntry.sql(
      "q150_cusum_changepoint",
      """WITH daily AS (
        |  SELECT event_type, CAST(ts AS DATE) AS d, COUNT(*) AS n
        |  FROM events GROUP BY 1, 2
        |), tot AS (
        |  SELECT event_type, SUM(n) AS total, COUNT(*) AS n_days FROM daily GROUP BY 1
        |), s AS (
        |  SELECT daily.event_type, d, t.n_days, t.total,
        |         ABS(t.n_days * SUM(n) OVER (PARTITION BY daily.event_type ORDER BY d)
        |             - ROW_NUMBER() OVER (PARTITION BY daily.event_type ORDER BY d)
        |               * t.total) AS s_abs
        |  FROM daily JOIN tot t ON daily.event_type = t.event_type
        |), ranked AS (
        |  SELECT event_type, n_days, total, d, s_abs,
        |         ROW_NUMBER() OVER (PARTITION BY event_type
        |                            ORDER BY s_abs DESC, d) AS rk
        |  FROM s
        |)
        |SELECT event_type, CAST(n_days AS BIGINT) AS n_days,
        |       CAST(total AS BIGINT) AS total,
        |       strftime(d, '%Y-%m-%d') AS change_day,
        |       CAST(s_abs AS BIGINT) AS s_abs
        |FROM ranked WHERE rk = 1 ORDER BY event_type""".stripMargin,
    ) { (s, dir) =>
      cusumChangepoint(Tables(s, dir).events)
    },

    // q159 — per-label centroid drift between the vec_id-parity halves
    // of the embedding corpus; DuckDB re-derives the half-means by list
    // indexing and re-folds the L2 independently. Both engines snap the
    // means to 6 decimals before the fold (order-insensitivity pin).
    QueryEntry.sql(
      "q159_centroid_drift",
      """WITH cells AS (
        |  SELECT label, d,
        |         ROUND(AVG(CASE WHEN vec_id % 2 = 0
        |                        THEN CAST(embedding[d] AS DOUBLE) END), 6) AS ma,
        |         ROUND(AVG(CASE WHEN vec_id % 2 = 1
        |                        THEN CAST(embedding[d] AS DOUBLE) END), 6) AS mb
        |  FROM embeddings, (SELECT unnest(range(1, 65)) AS d) dims
        |  GROUP BY label, d
        |), drift AS (
        |  SELECT label, ROUND(sqrt(SUM((ma - mb) * (ma - mb))), 6) AS drift
        |  FROM cells GROUP BY label
        |), counts AS (
        |  SELECT label,
        |         CAST(SUM(CASE WHEN vec_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
        |         CAST(SUM(CASE WHEN vec_id % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b
        |  FROM embeddings GROUP BY label
        |)
        |SELECT d.label, c.n_a, c.n_b, d.drift
        |FROM drift d JOIN counts c USING (label) ORDER BY label""".stripMargin,
    ) { (s, dir) =>
      centroidDrift(Tables(s, dir).embeddings)
    },

    // q161 — per-label Davies–Bouldin terms: scatter, worst-separated
    // neighbor label, and the (s_i+s_j)/d_ij ratio; DuckDB refits the
    // centroids by list indexing and re-derives distances, scatters,
    // and the argmax independently.
    QueryEntry.sql(
      "q161_davies_bouldin",
      """WITH dims AS (SELECT unnest(range(1, 65)) AS d),
        |cells AS (
        |  SELECT label, d, ROUND(AVG(CAST(embedding[d] AS DOUBLE)), 6) AS m
        |  FROM embeddings CROSS JOIN dims GROUP BY label, d
        |), dist AS (
        |  SELECT vec_id, e.label,
        |         sqrt(SUM((CAST(e.embedding[c.d] AS DOUBLE) - c.m)
        |                  * (CAST(e.embedding[c.d] AS DOUBLE) - c.m))) AS dist
        |  FROM embeddings e JOIN cells c ON c.label = e.label
        |  GROUP BY vec_id, e.label
        |), scatter AS (
        |  SELECT label, CAST(COUNT(*) AS BIGINT) AS n_vecs,
        |         ROUND(AVG(dist), 6) AS s
        |  FROM dist GROUP BY label
        |), dij AS (
        |  SELECT a.label AS i, b.label AS j,
        |         sqrt(SUM((a.m - b.m) * (a.m - b.m))) AS dij
        |  FROM cells a JOIN cells b ON a.d = b.d AND a.label <> b.label
        |  GROUP BY a.label, b.label
        |), ratios AS (
        |  SELECT i, j, si.n_vecs, si.s AS scatter_i,
        |         ROUND((si.s + sj.s) / dij, 6) AS db_term,
        |         ROW_NUMBER() OVER (
        |           PARTITION BY i
        |           ORDER BY ROUND((si.s + sj.s) / dij, 6) DESC, j) AS rk
        |  FROM dij
        |  JOIN scatter si ON si.label = i
        |  JOIN scatter sj ON sj.label = j
        |)
        |SELECT i AS label, n_vecs, scatter_i AS scatter,
        |       j AS worst_label, db_term
        |FROM ratios WHERE rk = 1 ORDER BY label""".stripMargin,
    ) { (s, dir) =>
      daviesBouldin(Tables(s, dir).embeddings)
    },

    // q214 — two-sample Kolmogorov–Smirnov drift per source vs the
    // whole corpus over the doc-length distribution: PSI (q126) needs
    // a bucket choice; KS is bucket-free — the max CDF gap. Exact to
    // the last bit: the max of |F_s − F| is taken over the INTEGER
    // cross-multiplied numerators |cum_s·n − cum·n_s| (denominators
    // n_s·n are per-source constants), so the argmax needs no float
    // comparison anywhere; one division at the end. Cumulative sums
    // run over the VALUE DOMAIN (distinct n_chars — hundreds), never
    // the corpus: the grid is |sources|·|values|.
    QueryEntry.sql(
      "q214_ks_drift",
      """WITH vc AS (
        |  SELECT source, n_chars AS v, COUNT(*) AS c
        |  FROM documents GROUP BY 1, 2
        |), vals AS (SELECT DISTINCT n_chars AS v FROM documents),
        |srcs AS (SELECT source, COUNT(*) AS ns FROM documents GROUP BY 1),
        |tot AS (SELECT COUNT(*) AS n FROM documents),
        |gc AS (
        |  SELECT v, SUM(c) OVER (ORDER BY v
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumg
        |  FROM (SELECT n_chars AS v, COUNT(*) AS c FROM documents GROUP BY 1) g
        |), cells AS (
        |  SELECT s.source, s.ns, va.v, COALESCE(vc.c, 0) AS c
        |  FROM srcs s CROSS JOIN vals va
        |  LEFT JOIN vc ON vc.source = s.source AND vc.v = va.v
        |), cum AS (
        |  SELECT source, ns, v,
        |         SUM(c) OVER (PARTITION BY source ORDER BY v
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cums
        |  FROM cells
        |), diffs AS (
        |  SELECT c.source, c.ns, c.v,
        |         abs(c.cums * t.n - g.cumg * c.ns) AS dn
        |  FROM cum c JOIN gc g ON g.v = c.v CROSS JOIN tot t
        |), ranked AS (
        |  SELECT source, ns, v, dn,
        |         row_number() OVER (PARTITION BY source
        |           ORDER BY dn DESC, v ASC) AS rk
        |  FROM diffs
        |)
        |SELECT r.source, r.ns AS n_docs, r.v AS ks_at,
        |       ROUND(CAST(r.dn AS DOUBLE) /
        |             (CAST(r.ns AS DOUBLE) * CAST(t.n AS DOUBLE)), 6) AS ks
        |FROM ranked r CROSS JOIN tot t
        |WHERE r.rk = 1 ORDER BY r.source""".stripMargin,
    ) { (s, dir) =>
      ksDrift(Tables(s, dir).documents)
    },

    // q243 — simplified (centroid-based) silhouette per label: the
    // third leg of the cluster-quality triad (q159 drift, q161
    // Davies–Bouldin) and the LINEAR silhouette variant — distance to
    // own centroid vs nearest other centroid, never the O(n²)
    // all-pairs form. Exactness: centroids from exact 1e7-grid integer
    // sums (not float AVG), per-(vec, label) squared distances as
    // order-free scaled-long sums, per-vec scores rounded once into
    // DECIMAL for the label mean. DuckDB re-derives centroids, all
    // n·|labels| distances, and every score.
    QueryEntry.sql(
      "q243_silhouette",
      """WITH x AS (
        |  SELECT vec_id, label,
        |         generate_subscripts(embedding, 1) AS d,
        |         unnest(embedding) AS v
        |  FROM embeddings
        |), cents AS (
        |  SELECT label, d,
        |         CAST(SUM(CAST(ROUND(CAST(v AS DOUBLE) * 10000000.0, 0)
        |                       AS BIGINT)) AS DOUBLE)
        |           / (10000000.0 * COUNT(*)) AS c
        |  FROM x GROUP BY 1, 2
        |), d2 AS (
        |  SELECT x.vec_id, x.label AS own, cents.label AS l,
        |         SUM(CAST(ROUND((CAST(x.v AS DOUBLE) - cents.c)
        |                        * (CAST(x.v AS DOUBLE) - cents.c)
        |                        * 10000000.0, 0) AS BIGINT)) AS d2
        |  FROM x JOIN cents ON cents.d = x.d
        |  GROUP BY 1, 2, 3
        |), ab AS (
        |  SELECT vec_id, own,
        |         MAX(CASE WHEN l = own THEN d2 END) AS a,
        |         MIN(CASE WHEN l <> own THEN d2 END) AS b
        |  FROM d2 GROUP BY 1, 2
        |), s AS (
        |  SELECT own AS label,
        |         CAST(ROUND(CAST(b - a AS DOUBLE)
        |                    / CAST(GREATEST(a, b) AS DOUBLE), 6)
        |              AS DECIMAL(18,6)) AS s
        |  FROM ab
        |)
        |SELECT label, CAST(COUNT(*) AS BIGINT) AS n_vecs,
        |       ROUND(CAST(SUM(s) AS DOUBLE) / COUNT(*), 6) + 0.0 AS mean_sil
        |FROM s GROUP BY 1 ORDER BY label""".stripMargin,
    ) { (s, dir) =>
      silhouette(Tables(s, dir).embeddings)
    },
  )

  /** Simplified per-label silhouette (q243) — see the entry comment.
    *
    * Scale shape: one posexplode, one (label, dim)-grouped centroid
    * pass, one broadcast join of the model-sized centroid table
    * (|labels|·d rows) against the component stream (n·d·|labels|
    * scaled-long products through map-side combine), then per-vec
    * min/max over |labels| rows and one label-grouped mean. Linear in
    * n — the all-pairs silhouette this replaces is O(n²).
    */
  def silhouette(emb: DataFrame): DataFrame = {
    val S = 1e7
    val x = emb.select(col("vec_id"), col("label").as("own"),
      posexplode(col("embedding")).as(Seq("d", "v")))
    val cents = x.groupBy(col("own").as("l"), col("d"))
      .agg((sum(round(col("v").cast(DoubleType) * S, 0).cast(LongType))
        .cast(DoubleType) / (lit(S) * count(lit(1)))).as("c"))
    val diff = col("v").cast(DoubleType) - col("c")
    val d2 = x.join(broadcast(cents), Seq("d"))
      .groupBy("vec_id", "own", "l")
      .agg(sum(round(diff * diff * S, 0).cast(LongType)).as("d2"))
    val ab = d2.groupBy("vec_id", "own")
      .agg(max(when(col("l") === col("own"), col("d2"))).as("a"),
        min(when(col("l") =!= col("own"), col("d2"))).as("b"))
    val sc = round((col("b") - col("a")).cast(DoubleType) /
      greatest(col("a"), col("b")).cast(DoubleType), 6)
      .cast(DecimalType(18, 6))
    ab.select(col("own").as("label"), sc.as("s"))
      .groupBy("label")
      .agg(count(lit(1)).as("n_vecs"),
        (round(sum("s").cast(DoubleType) / count(lit(1)), 6) + lit(0.0))
          .as("mean_sil"))
      .select(col("label"), col("n_vecs").cast(LongType).as("n_vecs"),
        col("mean_sil"))
      .orderBy("label")
  }

  /** Per-source two-sample KS vs the corpus over `n_chars` (q214). */
  def ksDrift(docs: DataFrame): DataFrame = {
    val vc = docs.groupBy(col("source"), col("n_chars").as("v"))
      .agg(count(lit(1)).as("c"))
    val vals = docs.select(col("n_chars").as("v")).distinct()
    val srcs = docs.groupBy("source").agg(count(lit(1)).as("ns"))
    val tot = docs.agg(count(lit(1)).as("n"))
    val wg = Window.orderBy("v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // value-domain frame (hundreds of rows): the one unpartitioned
    // window in the operator runs over it, not the corpus
    val gc = docs.groupBy(col("n_chars").as("v")).agg(count(lit(1)).as("c"))
      .withColumn("cumg", sum("c").over(wg)).drop("c")
    val ws = Window.partitionBy("source").orderBy("v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cells = srcs.crossJoin(vals)
      .join(vc, Seq("source", "v"), "left_outer")
      .na.fill(0L, Seq("c"))
      .withColumn("cums", sum("c").over(ws))
    val diffs = cells.join(gc, "v").crossJoin(tot)
      .select(col("source"), col("ns"), col("v"),
        abs(col("cums") * col("n") - col("cumg") * col("ns")).as("dn"),
        col("n"))
    diffs.groupBy("source")
      .agg(first(col("ns")).as("n_docs"), first(col("n")).as("n"),
        max(struct(col("dn"), (-col("v")).as("negv"))).as("m"))
      .select(col("source"), col("n_docs"),
        (-col("m.negv")).as("ks_at"),
        round(col("m.dn").cast("double") /
          (col("n_docs").cast("double") * col("n").cast("double")), 6).as("ks"))
      .orderBy("source")
  }
}
