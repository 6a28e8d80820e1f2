package graft.operators

import graft.functions.{CentroidAggregator, GraftFunctions}
import graft.sources.Staging
import graft.{QueryEntry, Tables}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** IVF-style ANN (SURVEY §2.4 "similarity search — IVF or LSH-bucketed
  * variant as the scale path").
  *
  * Coarse quantizer = k-means-lite fitted deterministically (init =
  * the first k vectors by vec_id, fixed Lloyd iterations, ties broken
  * by cluster id). Search: rank centroids per query, probe the top
  * `nprobe` inverted lists, exact-score only those lists, top-k per
  * query.
  *
  * Scale shape: assignment and re-centering are DataFrame jobs
  * (broadcast k literal centroids into a codegen argmax; centroid
  * recompute is the two-phase UDAF) — only the k×dim model ever
  * reaches the driver. Search touches ~nprobe/k of the corpus via a
  * cluster-key join: the whole point of IVF at 100 TB.
  */
object Ivf {

  /** Per-label centroid of the embedding vectors (uses the typed
    * Aggregator UDAF → two-phase agg, no explode shuffle).
    */
  def centroids(emb: DataFrame): DataFrame =
    emb.groupBy("label")
      .agg(CentroidAggregator.centroid(col("embedding")).as("centroid"))

  /** array<struct<s,c>> of (cosine to centroid i, i) — the shared
    * scoring expression for assignment and probe ranking.
    */
  private def centScores(vec: Column, cents: IndexedSeq[Array[Float]]): Column =
    array(cents.indices.map { i =>
      struct(GraftFunctions.cosineF32(vec, typedlit(cents(i))).as("s"),
        lit(i).as("c"))
    }: _*)

  /** Nearest-centroid assignment (struct array_max: score then cluster
    * id — deterministic tie-break).
    */
  def withCluster(emb: DataFrame, cents: IndexedSeq[Array[Float]]): DataFrame =
    emb.withColumn("cluster",
      array_max(centScores(col("embedding"), cents)).getField("c"))

  /** Deterministic Lloyd's: init = embeddings of the k smallest
    * vec_ids; empty clusters keep their previous centroid. Only k×dim
    * floats cross the driver boundary per iteration.
    */
  def fitCentroids(emb: DataFrame, k: Int = 16, iters: Int = 3): IndexedSeq[Array[Float]] = {
    val spark = emb.sparkSession
    import spark.implicits._
    // model-sized: ≤k rows — centroid seeds
    var cents: IndexedSeq[Array[Float]] = emb
      .orderBy("vec_id").limit(k)
      .select("embedding").as[Array[Float]].collect().toIndexedSeq
    for (_ <- 1 to iters) {
      // model-sized: ≤k rows — one centroid per cluster per iteration
      val next = withCluster(emb, cents)
        .groupBy("cluster")
        .agg(CentroidAggregator.centroid(col("embedding")).as("c"))
        .select(col("cluster"), col("c"))
        .as[(Int, Array[Double])].collect().toMap
      cents = cents.indices.map(i =>
        next.get(i).map(_.map(_.toFloat)).getOrElse(cents(i)))
    }
    cents
  }

  /** Fitted-quantizer memo: an IVF index is built once and queried
    * many times; refitting per query would misrepresent the operator's
    * cost. Keyed by the logical plan's semantic hash, which includes
    * the resolved file listing — so a FRESH `spark.read` after a
    * same-path rewrite misses the memo and refits automatically
    * (spec-asserted in IvfSpec). The stale hazard is holding the SAME
    * DataFrame across a rewrite (unchanged plan → unchanged hash):
    * Spark's CacheManager re-caches the persisted inverted lists on a
    * same-session overwrite, but THIS memo keeps serving the
    * quantizer fitted on the old data — call [[invalidateIndex]] and
    * re-read, the engine's `REFRESH TABLE` analogue. Bounded to 64
    * fitted models.
    */
  private val centroidCache =
    scala.collection.concurrent.TrieMap.empty[(String, Int, Int), IndexedSeq[Array[Float]]]

  /** The inverted lists themselves — the clustered corpus,
    * materialized once per (session, plan, model): this IS the IVF
    * index, and re-assigning every vector on every search would
    * misrepresent the operator's query-time cost exactly like
    * refitting would. Keyed by SESSION too (unlike the quantizer memo,
    * whose values are plain arrays): a cached DataFrame is bound to
    * the session that persisted it, and plan hashes collide across
    * sessions. Entries of stopped sessions are evicted on access.
    */
  private val listsCache = scala.collection.concurrent.TrieMap
    .empty[(org.apache.spark.sql.SparkSession, String, Int, Int), DataFrame]

  def invalidateIndex(blocking: Boolean = false): Unit = {
    centroidCache.clear()
    listsCache.values.foreach(df =>
      try df.unpersist(blocking) catch { case _: Throwable => () })
    listsCache.clear()
    // staged-index in-JVM memos too (the staged FILES stay — they are
    // the index; fingerprint-keyed paths make them stale-proof)
    stagedCentroidCache.clear()
  }

  def fittedCentroids(emb: DataFrame, k: Int, iters: Int): IndexedSeq[Array[Float]] = {
    val key = (emb.queryExecution.analyzed.semanticHash().toString, k, iters)
    // bound the memo by evicting strangers, never the key being served
    if (centroidCache.size > 64)
      centroidCache.keys.find(_ != key).foreach(centroidCache.remove)
    centroidCache.getOrElseUpdate(key, fitCentroids(emb, k, iters))
  }

  /** (q_id, q_vec, pc = top-nprobe cluster ids) per probe — shared by
    * plain IVF (q33) and IVF-PQ (q74) search.
    */
  def probeRanked(probes: DataFrame, cents: IndexedSeq[Array[Float]],
      nprobe: Int): DataFrame =
    probes
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
      .withColumn("pc",
        transform(
          slice(sort_array(centScores(col("q_vec"), cents), asc = false), 1, nprobe),
          x => x.getField("c")))

  /** The shared IVF query plan: rank centroids per probe, explode to
    * (probe, cluster) pairs, hash equi-join against the inverted
    * lists, exact-score, top-k. `corpus` is (vec_id, embedding,
    * cluster) — memo-persisted ([[annSearch]]) or parquet-backed
    * ([[annSearchStaged]]); the plan is identical either way.
    *
    * The probe set is exploded to (probe, cluster) rows so the
    * candidate join is a hash EQUI-join on cluster — array_contains
    * would plan a nested-loop, fine for 10 probes but the wrong shape
    * for a large probe batch; each (probe, cluster) pair is unique, so
    * no duplicate candidates.
    */
  private def searchLists(corpus: DataFrame, cents: IndexedSeq[Array[Float]],
      probes: DataFrame, nprobe: Int, k: Int): DataFrame = {
    val probeLists = probeRanked(probes, cents, nprobe)
    broadcast(probeLists.withColumn("cluster", explode(col("pc"))).drop("pc"))
      .join(corpus, Seq("cluster"))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"),
        round(GraftFunctions.cosineF32(col("q_vec"), col("embedding")), 6).as("score"))
      .withColumn("rank",
        row_number().over(Window.partitionBy("q_id")
          .orderBy(col("score").desc, col("vec_id"))))
      .filter(col("rank") <= k)
      .select("q_id", "vec_id", "rank", "score")
      .orderBy("q_id", "rank")
  }

  /** Top-k neighbors for each probe query via nprobe-bounded IVF over
    * the fitted quantizer. Session-scoped index (in-JVM memo +
    * persisted lists) — for corpora addressed as DataFrames; the
    * DURABLE form for dir-anchored corpora is [[annSearchStaged]].
    */
  def annSearch(emb: DataFrame, probes: DataFrame, nprobe: Int, k: Int,
      nClusters: Int = 16, iters: Int = 3): DataFrame = {
    val cents = fittedCentroids(emb, nClusters, iters)
    val key = (emb.sparkSession,
      emb.queryExecution.analyzed.semanticHash().toString, nClusters, iters)
    def drop(k: (org.apache.spark.sql.SparkSession, String, Int, Int)): Unit =
      listsCache.remove(k).foreach(df =>
        try df.unpersist() catch { case _: Throwable => () })
    listsCache.keys.filter(_._1.sparkContext.isStopped).foreach(drop)
    // bound, don't flush: evict ONE stranger past the cap (the
    // centroidCache policy)
    if (listsCache.size > 64) listsCache.keys.find(_ != key).foreach(drop)
    // build under a lock — TrieMap.getOrElseUpdate may run the builder
    // twice concurrently, and the loser would stay persisted forever
    val corpus = listsCache.get(key).getOrElse(listsCache.synchronized {
      listsCache.get(key).getOrElse {
        val c = withCluster(emb, cents)
          .select(col("vec_id"), col("embedding"), col("cluster"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        c.count() // materialize the index eagerly
        listsCache.put(key, c)
        c
      }
    })
    // NOTE an external RDD-level unpersist of the materialized blocks is
    // NOT detectable here (Dataset.storageLevel reports the requested
    // level, not live block state) — callers that free pinned storage
    // behind the engine's back must call invalidateIndex() so the memo
    // is rebuilt instead of silently recomputing per search. The bench
    // loop does exactly that between queries.
    searchLists(corpus, cents, probes, nprobe, k)
  }

  // ---- durable index (index-as-file) ---------------------------------------
  //
  // The reference's design premise is a PERSISTED index: ORC row-index
  // seeks work because the index lives in the file footer
  // (orc-parser/reader.cc:47), not in any process's memory. The
  // session-keyed memos above refit a 100 TB corpus on every JVM
  // restart; the staged layout below writes the fitted quantizer and
  // the clustered corpus (the inverted lists) to parquet ONCE per
  // fixture fingerprint, and every later session — including a fresh
  // JVM — reloads instead of refitting. Freshness is structural: the
  // path embeds the source file's (mtime, size), so a regenerated
  // corpus can never be served a stale index (Staging.fingerprintPath).

  def stagedCentroidsPath(dir: String, nClusters: Int, iters: Int): String =
    Staging.fingerprintPath("graft_ivf", dir, "embeddings.parquet",
      s"centroids_${nClusters}_$iters")

  def stagedListsPath(dir: String, nClusters: Int, iters: Int): String =
    Staging.fingerprintPath("graft_ivf", dir, "embeddings.parquet",
      s"lists_${nClusters}_$iters")

  /** Reloaded staged-centroid arrays, memoized per staged path (the
    * path carries the fixture fingerprint, so the memo can't go stale).
    */
  private val stagedCentroidCache =
    scala.collection.concurrent.TrieMap.empty[String, IndexedSeq[Array[Float]]]

  /** Fit-once-load-forever quantizer: the k×dim model as a k-row
    * parquet file. A JVM that finds the file reads k rows; only the
    * first JVM ever to see this fixture pays the fit.
    */
  def stagedCentroids(spark: org.apache.spark.sql.SparkSession, dir: String,
      nClusters: Int = 16, iters: Int = 3): IndexedSeq[Array[Float]] = {
    import spark.implicits._
    val dest = stagedCentroidsPath(dir, nClusters, iters)
    stagedCentroidCache.getOrElseUpdate(dest, {
      Staging.ensureStaged(dest) {
        val cents = fitCentroids(Tables(spark, dir).embeddings, nClusters, iters)
        cents.indices.map(i => (i, cents(i)))
          .toDF("cluster_id", "centroid")
          .coalesce(1).write.mode("overwrite").parquet(dest)
      }
      // model-sized: ≤k rows — the staged centroid table
      spark.read.parquet(dest)
        .orderBy("cluster_id")
        .select("centroid").as[Array[Float]].collect().toIndexedSeq
    })
  }

  /** The durable inverted lists: the corpus clustered under the staged
    * quantizer, written once as parquet. Readers get an ordinary
    * parquet scan — partition pruning, column pruning, and predicate
    * pushdown all apply, which is exactly what "the index is a file"
    * buys at 100 TB.
    */
  def stagedLists(spark: org.apache.spark.sql.SparkSession, dir: String,
      nClusters: Int = 16, iters: Int = 3): DataFrame = {
    val dest = stagedListsPath(dir, nClusters, iters)
    Staging.ensureStaged(dest) {
      val cents = stagedCentroids(spark, dir, nClusters, iters)
      withCluster(Tables(spark, dir).embeddings, cents)
        .select(col("vec_id"), col("embedding"), col("cluster"))
        .write.mode("overwrite").parquet(dest)
    }
    spark.read.parquet(dest)
  }

  /** IVF search against the DURABLE staged index — reload, never
    * refit: identical results to [[annSearch]] (spec-proved), but a
    * fresh session's cost is two parquet reads, not a corpus refit.
    */
  def annSearchStaged(spark: org.apache.spark.sql.SparkSession, dir: String,
      probes: DataFrame, nprobe: Int, k: Int,
      nClusters: Int = 16, iters: Int = 3): DataFrame = {
    val cents = stagedCentroids(spark, dir, nClusters, iters)
    searchLists(stagedLists(spark, dir, nClusters, iters), cents, probes, nprobe, k)
  }

  // ---- DuckDB mirror of the IVF search -------------------------------------
  //
  // The fitted quantizer (deterministic: fixed init, fixed Lloyd
  // iterations) is a model PARAMETER of the search operator; the oracle
  // inlines its k×dim floats as exact double literals and DuckDB then
  // independently re-executes the whole search — corpus assignment
  // (argmax over per-centroid cosines), probe-side centroid ranking,
  // candidate scoring, and top-k — so q33 sits under the full
  // differential gate. Exactness rests on the same identity as q23:
  // (double)float * (double)float is exact, and every accumulation is
  // spelled as the same left-associated chain cosine_f32 executes, so
  // both engines round identically at every step.

  private def d2s(d: Double): String = s"CAST('${d.toString}' AS DOUBLE)"

  /** Σ v[i]·c[i] as the left-associated chain of exact products. */
  private def dotChain(vec: String, c: Array[Float]): String =
    c.indices.map(i => s"CAST($vec[${i + 1}] AS DOUBLE) * ${d2s(c(i).toDouble)}")
      .mkString(" + ")

  /** Σ v[i]² as the left-associated chain. */
  private def normChain(vec: String, dim: Int): String =
    (0 until dim).map(i =>
      s"CAST($vec[${i + 1}] AS DOUBLE) * CAST($vec[${i + 1}] AS DOUBLE)")
      .mkString(" + ")

  /** Σ a[i]·b[i] between two table vectors, left-associated. */
  private def dotChain2(a: String, b: String, dim: Int): String =
    (0 until dim).map(i =>
      s"CAST($a[${i + 1}] AS DOUBLE) * CAST($b[${i + 1}] AS DOUBLE)")
      .mkString(" + ")

  /** `e1..e<dim>` flattened DOUBLE columns for a pair-scoring CTE: the
    * list_extract+CAST happens ONCE per vector at materialization; the
    * per-PAIR dot is then plain column math. Same IEEE ops in the same
    * order as [[dotChain2]] over raw lists, but the sf1 replay of a
    * 20M-candidate pair join dropped 170 s → 23 s (per-pair
    * list_extract dominated — r10 VERDICT item 6).
    */
  private def flatCols(dim: Int, vec: String = "embedding"): String =
    (1 to dim).map(i => s"CAST($vec[$i] AS DOUBLE) AS e$i").mkString(", ")

  /** The flattened-column twin of [[dotChain2]], left-associated. */
  private def flatDot(a: String, b: String, dim: Int): String =
    (1 to dim).map(i => s"$a.e$i * $b.e$i").mkString(" + ")

  /** The centroid's ‖c‖² accumulated exactly as cosine_f32 does. */
  private def centNormSq(c: Array[Float]): Double = {
    var nb = 0.0
    var i = 0
    while (i < c.length) { val y = c(i).toDouble; nb += y * y; i += 1 }
    nb
  }

  /** The shared coarse-quantizer CTE block (corpus assignment + probe
    * cluster ranking) — everything q33 and q74 both need; returns the
    * text BETWEEN `WITH` and the consumer's own CTEs.
    */
  def coarseCtes(spark: org.apache.spark.sql.SparkSession, dir: String,
      nprobe: Int, nClusters: Int = 16, iters: Int = 3,
      fitFilter: Option[org.apache.spark.sql.Column] = None): String = {
    // fitFilter restricts the QUANTIZER FIT (e.g. q191 fits on history
    // only — the index-build snapshot); assignments in ranked_c still
    // cover every vector, which is what the incremental probe needs
    val embAll = Tables(spark, dir).embeddings
    val cents = fittedCentroids(
      fitFilter.map(embAll.filter).getOrElse(embAll), nClusters, iters)
    val dim = cents.head.length
    val sCols = cents.indices.map { c =>
      s"(${dotChain("embedding", cents(c))}) / sqrt(na * ${d2s(centNormSq(cents(c)))}) AS s$c"
    }.mkString(",\n         ")
    val unions = cents.indices.map { c =>
      s"SELECT vec_id, embedding, na, $c AS c, s$c AS s FROM scores"
    }.mkString("\n    UNION ALL ")
    // Every multiply-referenced CTE is MATERIALIZED (the q228 lesson):
    // `scores` is referenced once per UNION ALL branch in `unp` — k
    // branches — and DuckDB inlines CTEs per reference, so without
    // materialization the k-column scoring re-runs k times
    // (O(k²·dim·n): at sf1 scale, k≈126, that was 220–240 s per ANN
    // oracle; materialized, the same exact replay runs in ~29 s —
    // r10 VERDICT item 6). ranked_c/corpus are re-read by most
    // consumers' probe/history CTEs.
    s"""base AS MATERIALIZED (
       |  SELECT vec_id, embedding, (${normChain("embedding", dim)}) AS na
       |  FROM embeddings
       |), scores AS MATERIALIZED (
       |  SELECT vec_id, embedding, na,
       |         $sCols
       |  FROM base
       |), unp AS (
       |    $unions
       |), ranked_c AS MATERIALIZED (
       |  SELECT vec_id, embedding, na, c, s,
       |         row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, c DESC) AS rn
       |  FROM unp
       |), corpus AS MATERIALIZED (
       |  SELECT vec_id, embedding, na AS ne, c AS cluster FROM ranked_c WHERE rn = 1
       |), probes AS (
       |  SELECT vec_id AS q_id, embedding AS q_emb, na AS nq, c AS pcluster
       |  FROM ranked_c WHERE rn <= $nprobe AND vec_id < 10
       |)""".stripMargin
  }

  /** Generated DuckDB SQL equivalent of the q33 IVF search. */
  def annSearchOracleSql(spark: org.apache.spark.sql.SparkSession, dir: String,
      nprobe: Int = 3, k: Int = 5, nClusters: Int = 16, iters: Int = 3): String = {
    val cents = fittedCentroids(Tables(spark, dir).embeddings, nClusters, iters)
    val dim = cents.head.length
    s"""WITH ${coarseCtes(spark, dir, nprobe, nClusters, iters)}, cand AS (
       |  SELECT p.q_id, co.vec_id,
       |         ROUND((${dotChain2("p.q_emb", "co.embedding", dim)})
       |               / sqrt(p.nq * co.ne), 6) AS score
       |  FROM probes p JOIN corpus co ON co.cluster = p.pcluster
       |  WHERE co.vec_id <> p.q_id
       |), topk AS (
       |  SELECT q_id, vec_id,
       |         CAST(row_number() OVER (PARTITION BY q_id
       |                                 ORDER BY score DESC, vec_id) AS INTEGER) AS rank,
       |         score
       |  FROM cand
       |)
       |SELECT q_id, vec_id, rank, score FROM topk
       |WHERE rank <= $k ORDER BY q_id, rank""".stripMargin
  }

  /** Recall@k of the IVF search against exact brute force — the
    * quality metric every ANN benchmark reports, as a first-class
    * oracled operator: the approximation an index buys is only usable
    * if its recall is MEASURED, and measuring it distributed (brute
    * force = 10 fixed probes × corpus, broadcast probe side, one
    * window pass) is itself a pipeline operation. Both sides score
    * with the same 6dp-rounded cosine and (score DESC, vec_id)
    * tiebreak, so the k-boundary is deterministic in both engines;
    * probes with zero overlap still appear via the probe-list left
    * join.
    */
  def annRecall(spark: org.apache.spark.sql.SparkSession, dir: String,
      nprobe: Int, k: Int): DataFrame = {
    val emb = Tables(spark, dir).embeddings
    val probes = emb.filter(col("vec_id") < 10)
    val ivf = annSearchStaged(spark, dir, probes, nprobe, k)
      .select(col("q_id"), col("vec_id"))
    val p = probes.select(col("vec_id").as("q_id"), col("embedding").as("qe"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("q_id").orderBy(desc("score"), col("vec_id"))
    val brute = broadcast(p)
      .join(emb.select(col("vec_id"), col("embedding").as("ce")),
        col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"),
        round(GraftFunctions.cosineF32(col("qe"), col("ce")), 6).as("score"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("q_id"), col("vec_id"))
    val overlap = ivf.join(brute, Seq("q_id", "vec_id"))
      .groupBy("q_id").agg(count(lit(1)).as("n"))
    p.select(col("q_id")).distinct()
      .join(overlap, Seq("q_id"), "left")
      .select(col("q_id"),
        coalesce(col("n"), lit(0L)).as("n_overlap"),
        round(coalesce(col("n"), lit(0L)).cast(DoubleType) / k, 6).as("recall"))
      .orderBy("q_id")
  }

  /** Generated DuckDB mirror of [[annRecall]]: the fitted quantizer is
    * inlined and DuckDB independently re-executes BOTH searches — the
    * IVF chain (assignment, probe ranking, cluster-filtered scoring,
    * top-k) and the exact brute force — then the overlap count.
    */
  def annRecallOracleSql(spark: org.apache.spark.sql.SparkSession, dir: String,
      nprobe: Int = 3, k: Int = 5, nClusters: Int = 16, iters: Int = 3): String = {
    val cents = fittedCentroids(Tables(spark, dir).embeddings, nClusters, iters)
    val dim = cents.head.length
    s"""WITH ${coarseCtes(spark, dir, nprobe, nClusters, iters)}, cand AS (
       |  SELECT p.q_id, co.vec_id,
       |         ROUND((${dotChain2("p.q_emb", "co.embedding", dim)})
       |               / sqrt(p.nq * co.ne), 6) AS score
       |  FROM probes p JOIN corpus co ON co.cluster = p.pcluster
       |  WHERE co.vec_id <> p.q_id
       |), ivfk AS (
       |  SELECT q_id, vec_id FROM (
       |    SELECT q_id, vec_id,
       |           row_number() OVER (PARTITION BY q_id
       |                              ORDER BY score DESC, vec_id) AS rank
       |    FROM cand) WHERE rank <= $k
       |), bprobes AS (
       |  SELECT vec_id AS q_id, embedding AS q_emb, na AS nq
       |  FROM ranked_c WHERE rn = 1 AND vec_id < 10
       |), bcand AS (
       |  SELECT p.q_id, co.vec_id,
       |         ROUND((${dotChain2("p.q_emb", "co.embedding", dim)})
       |               / sqrt(p.nq * co.ne), 6) AS score
       |  FROM bprobes p JOIN corpus co ON co.vec_id <> p.q_id
       |), btopk AS (
       |  SELECT q_id, vec_id FROM (
       |    SELECT q_id, vec_id,
       |           row_number() OVER (PARTITION BY q_id
       |                              ORDER BY score DESC, vec_id) AS rank
       |    FROM bcand) WHERE rank <= $k
       |), ov AS (
       |  SELECT i.q_id, COUNT(*) AS n
       |  FROM ivfk i JOIN btopk b ON b.q_id = i.q_id AND b.vec_id = i.vec_id
       |  GROUP BY i.q_id
       |)
       |SELECT pr.q_id, CAST(COALESCE(ov.n, 0) AS BIGINT) AS n_overlap,
       |       ROUND(COALESCE(ov.n, 0) / CAST($k AS DOUBLE), 6) AS recall
       |FROM (SELECT DISTINCT q_id FROM bprobes) pr
       |LEFT JOIN ov ON ov.q_id = pr.q_id
       |ORDER BY pr.q_id""".stripMargin
  }

  /** nprobe cost–recall sweep (q247): the index-tuning curve an ANN
    * deployment reads before pinning nprobe — per probed-list count,
    * MEAN recall@k against exact brute force and the fraction of the
    * corpus actually scored. One row per nprobe level; recall rises
    * with candidate cost, and the sweep quantifies the trade the
    * single-point q169 cannot.
    *
    * Scale shape: three reuses of the q169 machinery (staged index,
    * broadcast 10-probe side, windowed brute force) plus one COUNT of
    * each candidate join — nothing new materializes; the brute-force
    * leg is shared semantics with q169 and stays a broadcast × corpus
    * scan.
    */
  def nprobeSweep(spark: org.apache.spark.sql.SparkSession, dir: String,
      nps: Seq[Int] = Seq(1, 3, 8), k: Int = 5): DataFrame = {
    val emb = Tables(spark, dir).embeddings
    val lists = stagedLists(spark, dir)
    val cents = stagedCentroids(spark, dir)
    val probes = emb.filter(col("vec_id") < 10)
    val total = emb.count() // model-sized scalar: the corpus row count
    val per = nps.map { np =>
      val rec = annRecall(spark, dir, np, k)
        .agg(count(lit(1)).as("nq"), sum("n_overlap").as("ov"))
      val pl = probeRanked(probes, cents, np)
        .withColumn("cluster", explode(col("pc")))
        .select("q_id", "cluster")
      val cand = broadcast(pl)
        .join(lists.select("vec_id", "cluster"), Seq("cluster"))
        .filter(col("vec_id") =!= col("q_id"))
        .agg(count(lit(1)).as("nc"))
      rec.crossJoin(cand).select(
        lit(np).as("nprobe"),
        col("nq").cast(LongType).as("n_queries"),
        col("ov").cast(LongType).as("sum_overlap"),
        round(col("ov").cast(DoubleType) / (lit(k) * col("nq")), 6)
          .as("mean_recall"),
        round(col("nc").cast(DoubleType) /
          (col("nq") * lit((total - 1).toDouble)), 6).as("cand_frac"))
    }
    per.reduce(_ union _).orderBy("nprobe")
  }

  /** DuckDB mirror of [[nprobeSweep]]: one full q169-style block per
    * nprobe level (quantizer inlined, both searches re-executed, the
    * candidate join counted), UNION ALL'd.
    */
  def nprobeSweepOracleSql(spark: org.apache.spark.sql.SparkSession,
      dir: String, nps: Seq[Int] = Seq(1, 3, 8), k: Int = 5,
      nClusters: Int = 16, iters: Int = 3): String = {
    val cents = fittedCentroids(Tables(spark, dir).embeddings, nClusters, iters)
    val dim = cents.head.length
    val blocks = nps.map { np =>
      s"""SELECT * FROM (
         |WITH ${coarseCtes(spark, dir, np, nClusters, iters)}, cand AS (
         |  SELECT p.q_id, co.vec_id,
         |         ROUND((${dotChain2("p.q_emb", "co.embedding", dim)})
         |               / sqrt(p.nq * co.ne), 6) AS score
         |  FROM probes p JOIN corpus co ON co.cluster = p.pcluster
         |  WHERE co.vec_id <> p.q_id
         |), ivfk AS (
         |  SELECT q_id, vec_id FROM (
         |    SELECT q_id, vec_id,
         |           row_number() OVER (PARTITION BY q_id
         |                              ORDER BY score DESC, vec_id) AS rank
         |    FROM cand) WHERE rank <= $k
         |), bprobes AS (
         |  SELECT vec_id AS q_id, embedding AS q_emb, na AS nq
         |  FROM ranked_c WHERE rn = 1 AND vec_id < 10
         |), bcand AS (
         |  SELECT p.q_id, co.vec_id,
         |         ROUND((${dotChain2("p.q_emb", "co.embedding", dim)})
         |               / sqrt(p.nq * co.ne), 6) AS score
         |  FROM bprobes p JOIN corpus co ON co.vec_id <> p.q_id
         |), btopk AS (
         |  SELECT q_id, vec_id FROM (
         |    SELECT q_id, vec_id,
         |           row_number() OVER (PARTITION BY q_id
         |                              ORDER BY score DESC, vec_id) AS rank
         |    FROM bcand) WHERE rank <= $k
         |), ov AS (
         |  SELECT i.q_id, COUNT(*) AS n
         |  FROM ivfk i JOIN btopk b ON b.q_id = i.q_id AND b.vec_id = i.vec_id
         |  GROUP BY i.q_id
         |), rec AS (
         |  SELECT COUNT(*) AS nq,
         |         CAST(SUM(COALESCE(ov.n, 0)) AS BIGINT) AS ov
         |  FROM (SELECT DISTINCT q_id FROM bprobes) pr
         |  LEFT JOIN ov ON ov.q_id = pr.q_id
         |), nc AS (SELECT COUNT(*) AS nc FROM cand)
         |SELECT $np AS nprobe, CAST(nq AS BIGINT) AS n_queries,
         |       ov AS sum_overlap,
         |       ROUND(CAST(ov AS DOUBLE) / ($k * nq), 6) AS mean_recall,
         |       ROUND(CAST(nc AS DOUBLE) /
         |             (nq * CAST((SELECT COUNT(*) - 1 FROM embeddings)
         |                        AS DOUBLE)), 6) AS cand_frac
         |FROM rec, nc
         |)""".stripMargin
    }
    blocks.mkString("\nUNION ALL\n") + "\nORDER BY nprobe"
  }

  /** Adaptive cluster count for corpus-wide pair generation: K = ⌈√n⌉
    * (floored at the fixture's 16) is the published SemDeDup operating
    * point — with K ∝ √n and a bounded assignment fan-out, both the
    * fit/assignment cost (n·K) and the candidate-pair volume
    * (n²·nAssign²/K) grow as n^1.5: sub-quadratic by DESIGN, not by
    * constant-factor luck, which is what replaces q22's O(n²) at
    * corpus scale.
    */
  def adaptiveClusters(n: Long): Int =
    math.max(16, math.ceil(math.sqrt(n.toDouble)).toInt)

  /** Each vector assigned to its top-`nAssign` clusters (exploded) —
    * multi-assignment is the pair-generation analogue of query-side
    * nprobe: a near-dup pair straddling a cluster boundary is caught
    * iff the two vectors share ANY assigned cluster, so the boundary
    * miss probability decays with nAssign instead of being fixed by
    * the Voronoi partition.
    */
  def multiAssigned(emb: DataFrame, cents: IndexedSeq[Array[Float]],
      nAssign: Int): DataFrame =
    emb.select(col("vec_id"), col("embedding"))
      .withColumn("cluster",
        explode(transform(
          slice(sort_array(centScores(col("embedding"), cents), asc = false),
            1, nAssign),
          x => x.getField("c"))))

  /** ANN-backed embedding near-dup — the declared SCALE PATH for
    * q22's exact block-grid (same output contract: (vec_a, vec_b,
    * score ≥ threshold), approximate candidate generation): vectors
    * multi-assign to their top-`nAssign` of K=⌈√n⌉ fitted clusters,
    * candidate pairs are the same-cluster equi-join (deduped across
    * shared clusters), and only candidates are exact-scored. Compute
    * is n^1.5 against q22's n² (see [[adaptiveClusters]]); the recall
    * given up is MEASURED, not asserted — q171 reports it under the
    * full DuckDB gate, the q169 pattern.
    */
  def annNearDupPairs(emb: DataFrame, threshold: Double, nAssign: Int = 4,
      iters: Int = 3): DataFrame = {
    val k = adaptiveClusters(emb.count())
    val cents = fittedCentroids(emb, k, iters)
    val m = multiAssigned(emb, cents, nAssign)
    val a = m.select(col("cluster"), col("vec_id").as("vec_a"),
      col("embedding").as("ea"))
    val b = m.select(col("cluster"), col("vec_id").as("vec_b"),
      col("embedding").as("eb"))
    a.join(b, Seq("cluster"))
      .filter(col("vec_a") < col("vec_b"))
      .select(col("vec_a"), col("vec_b"),
        round(GraftFunctions.cosineF32(col("ea"), col("eb")), 6).as("score"))
      .filter(col("score") >= threshold)
      // a pair sharing several assigned clusters is generated once per
      // shared cluster; identical rounded score each time → distinct
      .distinct()
      .orderBy("vec_a", "vec_b")
  }

  /** Pair recall of [[annNearDupPairs]] against q22's exact pairs —
    * the quality metric that certifies the approximate scale path
    * (what q169 is for query-side ANN, this is for pair generation):
    * one row (n_exact, n_ann, n_overlap, pair_recall). The exact side
    * reuses the gated block-grid, so this report is itself O(n²) and
    * is a FIXTURE-SCALE certification, not a production operator —
    * production runs q170 alone.
    */
  def annNearDupRecall(emb: DataFrame, threshold: Double,
      nAssign: Int = 4): DataFrame = {
    val exact = Similarity.exactCosinePairs(emb, threshold)
      .select("vec_a", "vec_b")
    val ann = annNearDupPairs(emb, threshold, nAssign)
      .select("vec_a", "vec_b")
    val ex = exact.agg(count(lit(1)).as("n_exact"))
    val an = ann.agg(count(lit(1)).as("n_ann"))
    val ov = ann.join(exact, Seq("vec_a", "vec_b"))
      .agg(count(lit(1)).as("n_overlap"))
    ex.crossJoin(an).crossJoin(ov)
      .select(col("n_exact"), col("n_ann"), col("n_overlap"),
        // vacuous recall (no exact pairs at this scale) reports 1.0 —
        // a 0/0 NaN would format differently across the two engines
        when(col("n_exact") === 0, lit(1.0))
          .otherwise(round(col("n_overlap").cast(DoubleType) /
            col("n_exact").cast(DoubleType), 6)).as("pair_recall"))
  }

  /** SemDeDup-style semantic deduplication: cluster with the coarse
    * quantizer, then drop every vector that has an EARLIER (smaller
    * vec_id) same-cluster neighbor at rounded cosine ≥ `threshold` —
    * the deterministic keep-first rule, so survivors need no
    * connected-components pass. Pairwise scoring happens only WITHIN a
    * cluster (an equi-join on the cluster key): compute per cluster is
    * (n/k)², which is the published SemDeDup trade — k grows with the
    * corpus so cluster population stays bounded (production uses
    * k ~ √n; the fixture uses the shared 16-cluster quantizer). Cross-
    * cluster near-dups are missed by construction — that is the
    * approximation being bought, same as IVF's nprobe.
    */
  def semanticDedup(emb: DataFrame, threshold: Double,
      nClusters: Int = 16, iters: Int = 3): DataFrame = {
    val cents = fittedCentroids(emb, nClusters, iters)
    val c = withCluster(emb, cents)
      .select(col("vec_id"), col("embedding"), col("cluster"))
    val a = c.select(col("cluster"), col("vec_id").as("va"),
      col("embedding").as("ea"))
    val b = c.select(col("cluster"), col("vec_id").as("vb"),
      col("embedding").as("eb"))
    val dropped = a.join(b, Seq("cluster"))
      .filter(col("va") > col("vb") &&
        round(GraftFunctions.cosineF32(col("ea"), col("eb")), 6) >= threshold)
      .select(col("cluster"), col("va").as("vec_id")).distinct()
    c.groupBy("cluster").agg(count(lit(1)).as("n_vecs"))
      .join(dropped.groupBy("cluster").agg(count(lit(1)).as("nd")), Seq("cluster"),
        "left")
      .select(col("cluster"), col("n_vecs"),
        coalesce(col("nd"), lit(0L)).as("n_dropped"),
        (col("n_vecs") - coalesce(col("nd"), lit(0L))).as("n_kept"))
      .orderBy("cluster")
  }

  /** Generated DuckDB mirror of [[semanticDedup]]: the fitted quantizer
    * is inlined (coarseCtes) and DuckDB independently re-clusters the
    * corpus and re-derives the keep-first drop set.
    */
  def semanticDedupOracleSql(spark: org.apache.spark.sql.SparkSession,
      dir: String, threshold: Double, nClusters: Int = 16,
      iters: Int = 3): String = {
    val cents = fittedCentroids(Tables(spark, dir).embeddings, nClusters, iters)
    val dim = cents.head.length
    s"""WITH ${coarseCtes(spark, dir, nprobe = 1, nClusters, iters)}, drops AS (
       |  SELECT DISTINCT a.cluster, a.vec_id
       |  FROM corpus a JOIN corpus b
       |    ON b.cluster = a.cluster AND a.vec_id > b.vec_id
       |  WHERE ROUND((${dotChain2("a.embedding", "b.embedding", dim)})
       |              / sqrt(a.ne * b.ne), 6) >= CAST('$threshold' AS DOUBLE)
       |), per AS (
       |  SELECT cluster, COUNT(*) AS n_vecs FROM corpus GROUP BY 1
       |), dc AS (
       |  SELECT cluster, COUNT(*) AS nd FROM drops GROUP BY 1
       |)
       |SELECT p.cluster, p.n_vecs,
       |       CAST(COALESCE(dc.nd, 0) AS BIGINT) AS n_dropped,
       |       CAST(p.n_vecs - COALESCE(dc.nd, 0) AS BIGINT) AS n_kept
       |FROM per p LEFT JOIN dc USING (cluster) ORDER BY cluster""".stripMargin
  }

  /** Generated DuckDB mirror of [[annNearDupPairs]]: the fitted
    * quantizer is inlined and DuckDB re-derives multi-assignment
    * (rn ≤ nAssign over the same per-centroid scores), the
    * same-cluster candidate join, exact scoring, and the cross-shared-
    * cluster dedup.
    */
  def annNearDupOracleSql(spark: org.apache.spark.sql.SparkSession, dir: String,
      threshold: Double, nAssign: Int = 4, iters: Int = 3): String = {
    val emb = Tables(spark, dir).embeddings
    val k = adaptiveClusters(emb.count())
    val dim = fittedCentroids(emb, k, iters).head.length
    s"""WITH ${coarseCtes(spark, dir, nprobe = 1, k, iters)}, massign AS MATERIALIZED (
       |  SELECT vec_id, na, ${flatCols(dim)}, c AS cluster
       |  FROM ranked_c WHERE rn <= $nAssign
       |), scored AS (
       |  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       |         ROUND((${flatDot("a", "b", dim)})
       |               / sqrt(a.na * b.na), 6) AS score
       |  FROM massign a JOIN massign b
       |    ON b.cluster = a.cluster AND a.vec_id < b.vec_id
       |)
       |SELECT DISTINCT vec_a, vec_b, score FROM scored
       |WHERE score >= CAST('$threshold' AS DOUBLE)
       |ORDER BY vec_a, vec_b""".stripMargin
  }

  /** Generated DuckDB mirror of [[annNearDupRecall]]: DuckDB
    * re-executes BOTH pair generations — the exact all-pairs join and
    * the multi-assign cluster-bucketed join — then the overlap counts.
    */
  def annNearDupRecallOracleSql(spark: org.apache.spark.sql.SparkSession,
      dir: String, threshold: Double, nAssign: Int = 4, iters: Int = 3): String = {
    val emb = Tables(spark, dir).embeddings
    val k = adaptiveClusters(emb.count())
    val dim = fittedCentroids(emb, k, iters).head.length
    val th = s"CAST('$threshold' AS DOUBLE)"
    s"""WITH ${coarseCtes(spark, dir, nprobe = 1, k, iters)}, massign AS (
       |  SELECT vec_id, embedding, na, c AS cluster FROM ranked_c WHERE rn <= $nAssign
       |), ann AS (
       |  SELECT DISTINCT vec_a, vec_b FROM (
       |    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       |           ROUND((${dotChain2("a.embedding", "b.embedding", dim)})
       |                 / sqrt(a.na * b.na), 6) AS score
       |    FROM massign a JOIN massign b
       |      ON b.cluster = a.cluster AND a.vec_id < b.vec_id) s
       |  WHERE score >= $th
       |), ex AS (
       |  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
       |  FROM base a JOIN base b ON a.vec_id < b.vec_id
       |  WHERE ROUND((${dotChain2("a.embedding", "b.embedding", dim)})
       |              / sqrt(a.na * b.na), 6) >= $th
       |)
       |SELECT (SELECT COUNT(*) FROM ex) AS n_exact,
       |       (SELECT COUNT(*) FROM ann) AS n_ann,
       |       (SELECT COUNT(*) FROM ann JOIN ex USING (vec_a, vec_b)) AS n_overlap,
       |       CASE WHEN (SELECT COUNT(*) FROM ex) = 0 THEN 1.0
       |            ELSE ROUND((SELECT COUNT(*) FROM ann JOIN ex USING (vec_a, vec_b))
       |                       / CAST((SELECT COUNT(*) FROM ex) AS DOUBLE), 6)
       |       END AS pair_recall""".stripMargin
  }

  /** IVF list-size imbalance (q182): the index-health number that
    * governs QUERY-COST VARIANCE at scale — imbalance = K·Σs²/(Σs)²
    * over the inverted-list sizes (1.0 = perfectly balanced; a probe
    * of an over-full list costs proportionally more). Completes the
    * index-quality family: q169 measures what search loses, q176 what
    * encoding loses, q182 what the partitioning costs. Σs² is carried
    * as DECIMAL (list sizes square past bigint at corpus scale); one
    * grouped count + one scalar aggregate.
    */
  def ivfImbalance(emb: DataFrame, k: Int = 16, iters: Int = 3): DataFrame = {
    val sizes = withCluster(emb, fittedCentroids(emb, k, iters))
      .groupBy("cluster").agg(count(lit(1)).as("s"))
    val ssD = sum((col("s").cast(DecimalType(19, 0)) *
        col("s").cast(DecimalType(19, 0))).cast(DecimalType(38, 0)))
      .cast(DoubleType)
    val nD = sum("s").cast(DoubleType)
    sizes.agg(count(lit(1)).as("n_lists"),
        sum("s").cast(LongType).as("n_vecs"),
        min("s").as("min_list"), max("s").as("max_list"),
        round(lit(k) * ssD / (nD * nD), 6).as("imbalance"))
  }

  /** Oracle twin of [[ivfImbalance]]: `k` parameterizes BOTH the
    * quantizer fit and the imbalance numerator, so engine and oracle
    * derive from one value at any list count (an earlier revision
    * hardcoded 16 here while the engine took a k argument — a k != 16
    * caller would have silently diverged from the oracle).
    */
  def ivfImbalanceOracleSql(spark: org.apache.spark.sql.SparkSession,
      dir: String, k: Int = 16, iters: Int = 3): String =
    s"""WITH ${coarseCtes(spark, dir, nprobe = 1, nClusters = k, iters = iters)},
       |sizes AS (SELECT cluster, COUNT(*) AS s FROM corpus GROUP BY cluster)
       |SELECT CAST(COUNT(*) AS BIGINT) AS n_lists,
       |       CAST(SUM(s) AS BIGINT) AS n_vecs,
       |       CAST(MIN(s) AS BIGINT) AS min_list,
       |       CAST(MAX(s) AS BIGINT) AS max_list,
       |       ROUND($k * CAST(SUM(CAST(CAST(s AS DECIMAL(19,0)) * CAST(s AS DECIMAL(19,0))
       |                                AS DECIMAL(38,0))) AS DOUBLE)
       |             / (CAST(SUM(s) AS DOUBLE) * CAST(SUM(s) AS DOUBLE)), 6)
       |         AS imbalance
       |FROM sizes""".stripMargin


  /** q191 — INCREMENTAL ANN near-dup (the q185 index-probe pattern for
    * embeddings): the quantizer is fitted on HISTORY only (vec_id % 5
    * != 0 — the index-build snapshot), history vectors sit
    * single-assigned in their inverted lists, and each NEW vector
    * (vec_id % 5 == 0) multi-assigns to its top-`nAssign` lists and is
    * exact-scored against only those lists' members — per-increment
    * cost is probe-side work + visited-list lookups, never a recompute
    * over history (the durable staged form of the lists is q33's
    * machinery; the probe plan is identical either way). Approximation
    * contract matches q170: a cross-list pair is missed iff the new
    * vector's nAssign nearest lists all miss the neighbor's list.
    */
  def incrementalAnnNearDups(spark: org.apache.spark.sql.SparkSession,
      dir: String, threshold: Double, nAssign: Int = 4,
      iters: Int = 3): DataFrame = {
    val emb = Tables(spark, dir).embeddings
    val (cents, lists) = historyAnnIndex(spark, dir, iters)
    probeAnnLists(emb.filter(col("vec_id") % 5 === 0), cents, lists,
        threshold, nAssign)
      .orderBy("new_vec", "hist_vec")
  }

  /** The q191/q196 historical ANN index: quantizer fitted on history
    * (vec_id % 5 != 0) and the history's single-assigned inverted
    * lists. Both are memo-backed ([[fittedCentroids]]); the durable
    * parquet form of the same layout is the q33 staging machinery.
    */
  def historyAnnIndex(spark: org.apache.spark.sql.SparkSession, dir: String,
      iters: Int = 3): (IndexedSeq[Array[Float]], DataFrame) = {
    val hist = Tables(spark, dir).embeddings.filter(col("vec_id") % 5 =!= 0)
    val k = adaptiveClusters(hist.count())
    val cents = fittedCentroids(hist, k, iters)
    val lists = withCluster(hist, cents)
      .select(col("cluster"), col("vec_id").as("hist_vec"),
        col("embedding").as("eh"))
    (cents, lists)
  }

  /** Probe an ARRIVING vector frame against the inverted lists — the
    * per-micro-batch body of q196 and the batch body of q191: new
    * vectors multi-assign to their top-`nAssign` lists, exact-score
    * only those lists' members, keep rounded cosine >= threshold.
    */
  def probeAnnLists(newVecs: DataFrame, cents: IndexedSeq[Array[Float]],
      lists: DataFrame, threshold: Double, nAssign: Int): DataFrame = {
    val probe = multiAssigned(newVecs, cents, nAssign)
      .select(col("cluster"), col("vec_id").as("new_vec"),
        col("embedding").as("ep"))
    probe.join(lists, Seq("cluster"))
      .select(col("new_vec"), col("hist_vec"),
        round(GraftFunctions.cosineF32(col("ep"), col("eh")), 6).as("score"))
      .filter(col("score") >= threshold)
      // a pair sharing several visited lists is generated once per
      // shared list; identical rounded score each time -> distinct
      .distinct()
  }

  /** Generated DuckDB mirror of [[incrementalAnnNearDups]]: the
    * history-fitted quantizer is inlined, and DuckDB re-executes
    * history assignment (rn = 1), probe multi-assignment (rn <=
    * nAssign), the list join, exact scoring, and dedup.
    */
  def incrementalAnnOracleSql(spark: org.apache.spark.sql.SparkSession,
      dir: String, threshold: Double, nAssign: Int = 4,
      iters: Int = 3): String = {
    val hist = Tables(spark, dir).embeddings.filter(col("vec_id") % 5 =!= 0)
    val k = adaptiveClusters(hist.count())
    val dim = fittedCentroids(hist, k, iters).head.length
    s"""WITH ${coarseCtes(spark, dir, nprobe = 1, k, iters,
          fitFilter = Some(col("vec_id") % 5 =!= 0))},
       |histc AS MATERIALIZED (
       |  SELECT vec_id, na, ${flatCols(dim)}, c AS cluster FROM ranked_c
       |  WHERE rn = 1 AND vec_id % 5 <> 0
       |), probec AS MATERIALIZED (
       |  SELECT vec_id, na, ${flatCols(dim)}, c AS cluster FROM ranked_c
       |  WHERE rn <= $nAssign AND vec_id % 5 = 0
       |), scored AS (
       |  SELECT p.vec_id AS new_vec, h.vec_id AS hist_vec,
       |         ROUND((${flatDot("p", "h", dim)})
       |               / sqrt(p.na * h.na), 6) AS score
       |  FROM probec p JOIN histc h ON h.cluster = p.cluster
       |)
       |SELECT DISTINCT new_vec, hist_vec, score FROM scored
       |WHERE score >= CAST('$threshold' AS DOUBLE)
       |ORDER BY new_vec, hist_vec""".stripMargin
  }


  /** q271 — ANN-index RETRACTION (q270's twin for embeddings): forget
    * history vectors vec_id % 7 == 0. The quantizer stays FROZEN —
    * the production posture: a retraction removes list entries, it
    * never refits (refitting would re-assign history and rewrite
    * every list) — the purged inverted lists drop exactly the
    * tombstoned members (engine-guarded by an exact entry count), and
    * the q191 batch probes the purged lists. A purge that leaves a
    * tombstoned vector's list entry behind resurfaces its pairs and
    * breaks the hash against the from-scratch minus-deleted oracle.
    */
  def retractedAnnProbe(spark: org.apache.spark.sql.SparkSession,
      dir: String, threshold: Double, nAssign: Int = 4,
      iters: Int = 3): DataFrame = {
    val emb = Tables(spark, dir).embeddings
    val (cents, lists) = historyAnnIndex(spark, dir, iters)
    val pinned = lists
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
    val nBefore = pinned.count()
    val nTomb = pinned.filter(col("hist_vec") % 7 === 0).count()
    val purged = pinned.filter(col("hist_vec") % 7 =!= 0)
      .localCheckpoint(true, org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
    require(nTomb > 0 && purged.count() == nBefore - nTomb,
      s"ANN purge drift: $nBefore entries, $nTomb tombstoned")
    pinned.unpersist()
    probeAnnLists(emb.filter(col("vec_id") % 5 === 0), cents, purged,
        threshold, nAssign)
      .orderBy("new_vec", "hist_vec")
  }

  /** q271 oracle: [[incrementalAnnOracleSql]] with the tombstoned
    * vectors excluded from the HISTORY side only — the quantizer CTEs
    * still fit on the full history (frozen-quantizer semantics).
    */
  def retractedAnnOracleSql(spark: org.apache.spark.sql.SparkSession,
      dir: String, threshold: Double, nAssign: Int = 4,
      iters: Int = 3): String = {
    val hist = Tables(spark, dir).embeddings.filter(col("vec_id") % 5 =!= 0)
    val k = adaptiveClusters(hist.count())
    val dim = fittedCentroids(hist, k, iters).head.length
    s"""WITH ${coarseCtes(spark, dir, nprobe = 1, k, iters,
          fitFilter = Some(col("vec_id") % 5 =!= 0))},
       |histc AS MATERIALIZED (
       |  SELECT vec_id, na, ${flatCols(dim)}, c AS cluster FROM ranked_c
       |  WHERE rn = 1 AND vec_id % 5 <> 0 AND vec_id % 7 <> 0
       |), probec AS MATERIALIZED (
       |  SELECT vec_id, na, ${flatCols(dim)}, c AS cluster FROM ranked_c
       |  WHERE rn <= $nAssign AND vec_id % 5 = 0
       |), scored AS (
       |  SELECT p.vec_id AS new_vec, h.vec_id AS hist_vec,
       |         ROUND((${flatDot("p", "h", dim)})
       |               / sqrt(p.na * h.na), 6) AS score
       |  FROM probec p JOIN histc h ON h.cluster = p.cluster
       |)
       |SELECT DISTINCT new_vec, hist_vec, score FROM scored
       |WHERE score >= CAST('$threshold' AS DOUBLE)
       |ORDER BY new_vec, hist_vec""".stripMargin
  }

  /** q193 — the FOLD-IN that makes q191 a growing index (q187's
    * two-increment protocol for embeddings): the quantizer is fitted
    * on the base history ONLY (vec_id % 5 in 2..4) and FROZEN — the
    * production IVF posture: re-fitting per increment would re-assign
    * history and rewrite every list — then increment 1 (vec_id % 5 ==
    * 1) probes the base lists and is folded in (assigned under the
    * frozen quantizer), and increment 2 (vec_id % 5 == 0) probes
    * base+delta lists — its pairs include batch-2-vs-batch-1 matches
    * that exist only if the fold-in happened. Output (batch, new_vec,
    * hist_vec, score).
    */
  def foldingIncrementalAnn(spark: org.apache.spark.sql.SparkSession,
      dir: String, threshold: Double, nAssign: Int = 4,
      iters: Int = 3): DataFrame = {
    val emb = Tables(spark, dir).embeddings
    def batchNo(id: Column): Column =
      when(id % 5 === 1, lit(1)).when(id % 5 === 0, lit(2)).otherwise(lit(0))
    val hist0 = emb.filter(batchNo(col("vec_id")) === 0)
    val k = adaptiveClusters(hist0.count())
    val cents = fittedCentroids(hist0, k, iters) // frozen at index build
    val increments = (1 to 2).map { b =>
      val lists = withCluster(emb.filter(batchNo(col("vec_id")) < b), cents)
        .select(col("cluster"), col("vec_id").as("hist_vec"),
          col("embedding").as("eh"))
      val probe = multiAssigned(emb.filter(batchNo(col("vec_id")) === b),
          cents, nAssign)
        .select(col("cluster"), col("vec_id").as("new_vec"),
          col("embedding").as("ep"))
      probe.join(lists, Seq("cluster"))
        .select(lit(b).as("batch"), col("new_vec"), col("hist_vec"),
          round(GraftFunctions.cosineF32(col("ep"), col("eh")), 6).as("score"))
        .filter(col("score") >= threshold)
        .distinct()
    }
    increments.reduce(_ unionAll _)
      .orderBy("batch", "new_vec", "hist_vec")
  }

  /** Generated DuckDB mirror of [[foldingIncrementalAnn]]: batch-0-
    * fitted centroids inlined; every cross-batch pair where the
    * history side's rn=1 list is among the new side's top-nAssign.
    */
  def foldingIncrementalAnnOracleSql(
      spark: org.apache.spark.sql.SparkSession, dir: String,
      threshold: Double, nAssign: Int = 4, iters: Int = 3): String = {
    val hist0 = Tables(spark, dir).embeddings
      .filter(col("vec_id") % 5 =!= 0 && col("vec_id") % 5 =!= 1)
    val k = adaptiveClusters(hist0.count())
    val dim = fittedCentroids(hist0, k, iters).head.length
    val bNo = (c: String) => s"CASE $c % 5 WHEN 1 THEN 1 WHEN 0 THEN 2 ELSE 0 END"
    s"""WITH ${coarseCtes(spark, dir, nprobe = 1, k, iters,
          fitFilter = Some(col("vec_id") % 5 =!= 0 && col("vec_id") % 5 =!= 1))},
       |assigned AS MATERIALIZED (
       |  SELECT vec_id, na, ${flatCols(dim)}, c AS cluster,
       |         ${bNo("vec_id")} AS bn
       |  FROM ranked_c WHERE rn = 1
       |), probes_m AS MATERIALIZED (
       |  SELECT vec_id, na, ${flatCols(dim)}, c AS cluster,
       |         ${bNo("vec_id")} AS bn
       |  FROM ranked_c WHERE rn <= $nAssign
       |), scored AS (
       |  SELECT p.bn AS batch, p.vec_id AS new_vec, h.vec_id AS hist_vec,
       |         ROUND((${flatDot("p", "h", dim)})
       |               / sqrt(p.na * h.na), 6) AS score
       |  FROM probes_m p JOIN assigned h
       |    ON h.cluster = p.cluster AND h.bn < p.bn
       |  WHERE p.bn > 0
       |)
       |SELECT DISTINCT CAST(batch AS INT) AS batch, new_vec, hist_vec, score
       |FROM scored
       |WHERE score >= CAST('$threshold' AS DOUBLE)
       |ORDER BY batch, new_vec, hist_vec""".stripMargin
  }

  val entries: Seq[QueryEntry] = Seq(
    // q182 — IVF list imbalance: DuckDB refits the coarse quantizer
    // and re-derives every list size and the imbalance factor.
    QueryEntry.dynamicSql("q182_ivf_imbalance") { (s, dir) =>
      ivfImbalanceOracleSql(s, dir)
    } { (s, dir) => ivfImbalance(Tables(s, dir).embeddings) },

    // Centroid computation itself is oracle-able: explode the UDAF's
    // vector output to (label, d, v) and DuckDB recomputes per-dim
    // means by list indexing.
    QueryEntry.sql(
      "q32_label_centroids",
      """SELECT label, d, ROUND(SUM(CAST(embedding[d] AS DOUBLE)) / COUNT(*), 6) AS v
        |FROM embeddings, (SELECT unnest(range(1, 65)) AS d) dims
        |GROUP BY label, d ORDER BY label, d""".stripMargin,
    ) { (s, dir) =>
      centroids(Tables(s, dir).embeddings)
        .select(col("label"), posexplode(col("centroid")).as(Seq("pos", "raw")))
        .select(col("label"), (col("pos") + 1).as("d"), round(col("raw"), 6).as("v"))
        .orderBy("label", "d")
    },

    // IVF search for the first 10 vec_ids as probes. The fit is
    // deterministic, so the search is differential-tested end-to-end:
    // the oracle (generated at Verify time) inlines the fitted
    // centroids and DuckDB re-executes assignment, probe ranking,
    // scoring and top-k independently. Recall against brute force is
    // additionally pinned in IvfSpec.
    QueryEntry.dynamicSql("q33_ann_ivf") { (s, dir) =>
      annSearchOracleSql(s, dir, nprobe = 3, k = 5)
    } { (s, dir) =>
      // the DURABLE index path: search reads the staged quantizer +
      // inverted-list files (built once per fixture fingerprint); the
      // oracle refits deterministically and must agree — reload ≡ refit
      // under the differential gate itself
      val emb = Tables(s, dir).embeddings
      annSearchStaged(s, dir, emb.filter(col("vec_id") < 10), nprobe = 3, k = 5)
    },

    // SemDeDup: per-cluster semantic dedup rollup under the full
    // differential gate — DuckDB refits nothing (the deterministic
    // quantizer is inlined) but re-executes clustering, within-cluster
    // pair scoring, and the keep-first drop rule end to end.
    QueryEntry.dynamicSql("q88_semantic_dedup") { (s, dir) =>
      semanticDedupOracleSql(s, dir, threshold = 0.45)
    } { (s, dir) =>
      semanticDedup(Tables(s, dir).embeddings, threshold = 0.45)
    },

    // q169 — recall@k of the IVF index vs exact brute force, fully
    // differential: DuckDB re-executes both searches from the inlined
    // quantizer and recomputes the overlap. The IvfSpec recall pin is
    // a spec assertion; this is the same property as a FIRST-CLASS
    // oracled operator, which is what an ANN benchmark report needs.
    QueryEntry.dynamicSql("q169_ann_recall") { (s, dir) =>
      annRecallOracleSql(s, dir, nprobe = 3, k = 5)
    } { (s, dir) =>
      annRecall(s, dir, nprobe = 3, k = 5)
    },

    // q247 — the nprobe cost–recall SWEEP over {1, 3, 8}: q169 is one
    // operating point; this is the tuning curve (mean recall AND the
    // scored-candidate fraction per level). DuckDB re-executes all
    // three IVF searches, the brute force, and each candidate count.
    QueryEntry.dynamicSql("q247_nprobe_sweep") { (s, dir) =>
      nprobeSweepOracleSql(s, dir)
    } { (s, dir) =>
      nprobeSweep(s, dir)
    },

    // q170 — ANN-backed embed near-dup: q22's output contract through
    // K=√n multi-assign candidate generation (n^1.5, the declared
    // scale path; r7 VERDICT item 4). DuckDB re-derives assignment,
    // candidate join, scoring, and dedup from the inlined quantizer.
    QueryEntry.dynamicSql("q170_embed_neardup_ann") { (s, dir) =>
      annNearDupOracleSql(s, dir, threshold = 0.45)
    } { (s, dir) =>
      annNearDupPairs(Tables(s, dir).embeddings, threshold = 0.45)
    },

    // q191 — incremental ANN near-dup: new vectors probe the
    // history-fitted inverted lists for near-dups at cosine >= 0.45;
    // DuckDB re-derives the history-fitted quantizer, both
    // assignments, the list join, and the scoring end-to-end.
    QueryEntry.dynamicSql("q191_incremental_ann") { (s, dir) =>
      incrementalAnnOracleSql(s, dir, threshold = 0.45)
    } { (s, dir) =>
      incrementalAnnNearDups(s, dir, threshold = 0.45)
    },

    // q271 — ANN-index retraction (q270's embedding twin): purged
    // inverted lists under the frozen quantizer; DuckDB re-derives
    // the history-minus-deleted probe from scratch.
    QueryEntry.dynamicSql("q271_ann_retraction") { (s, dir) =>
      retractedAnnOracleSql(s, dir, threshold = 0.45)
    } { (s, dir) =>
      retractedAnnProbe(s, dir, threshold = 0.45)
    },

    // q196 — streaming ANN ingest: q191's probe inside foreachBatch
    // over a 4-file AvailableNow stream of arriving vectors, the
    // history index built once at stream start. Same oracle as q191.
    QueryEntry.dynamicSql("q196_stream_ann_ingest") { (s, dir) =>
      incrementalAnnOracleSql(s, dir, threshold = 0.45)
    } { (s, dir) =>
      graft.streaming.StreamingDocs.runAnnIngestToCompletion(s, dir)
    },

    // q193 — incremental ANN with FOLD-IN (two increments under a
    // frozen base-fitted quantizer): increment 2's pairs include
    // batch-2-vs-batch-1 matches only if increment 1 was folded into
    // the lists — DuckDB replays the frozen fit, both increments'
    // assignments, and every cross-batch pair.
    QueryEntry.dynamicSql("q193_incremental_ann_fold") { (s, dir) =>
      foldingIncrementalAnnOracleSql(s, dir, threshold = 0.45)
    } { (s, dir) =>
      foldingIncrementalAnn(s, dir, threshold = 0.45)
    },

    // q171 — measured pair-recall of q170 vs q22's exact pairs (the
    // q169 pattern applied to pair generation): the approximation is
    // certified by a number in an oracled result, not by argument.
    QueryEntry.dynamicSql("q171_embed_neardup_recall") { (s, dir) =>
      annNearDupRecallOracleSql(s, dir, threshold = 0.45)
    } { (s, dir) =>
      annNearDupRecall(Tables(s, dir).embeddings, threshold = 0.45)
    },
  )
}
