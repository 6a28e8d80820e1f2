package graft.operators

import graft.functions.GraftFunctions
import graft.{QueryEntry, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Batch k-NN join: every probe vector gets its k nearest corpus
  * vectors by cosine — the batched form of [[Similarity.topKCosine]]
  * (one probe) and the exact building block ANN variants approximate.
  *
  * Scale shape: the probe batch is broadcast (a query batch is
  * request-sized by contract — thousands, not corpus-sized; the loud
  * `maxProbes` gate stops corpus-scale misuse, for which the join
  * through the IVF index is the declared path), scoring runs inside
  * whole-stage codegen over one corpus scan, and the grouped top-k is
  * the native k-bounded heap aggregate
  * ([[org.apache.spark.sql.graft.TopKScoreId]]): each map task ships at
  * most k entries per probe into the exchange, so shuffle volume is
  * |probes|·k·partials — independent of corpus size — where the window
  * `row_number` formulation would shuffle all |corpus|·|probes| scored
  * rows. Scores are ROUNDed to 6 dp before admission (FIXTURES.md
  * float rule) with the vec_id tie-break, so the kept set is
  * engine-independent.
  */
object Knn {

  /** @param excludeSelf drop candidates with `vec_id == probe_id` —
    *   correct ONLY when the probe batch is drawn from the corpus and
    *   shares its id space (the q97 self-probe shape, hence the
    *   default). An EXTERNAL probe batch whose ids coincidentally
    *   collide with corpus vec_ids must pass `excludeSelf = false` or
    *   legitimate nearest neighbors are silently dropped.
    */
  def knnJoin(emb: DataFrame, probes: DataFrame, k: Int,
      maxProbes: Long = 100000L, excludeSelf: Boolean = true): DataFrame = {
    val n = probes.count()
    require(n <= maxProbes,
      s"knnJoin broadcasts the probe batch: $n probes exceeds maxProbes=" +
        s"$maxProbes — route corpus-scale probe sets through Ivf.annSearch " +
        "or raise maxProbes explicitly")
    emb.crossJoin(broadcast(probes))
      .filter(if (excludeSelf) col("vec_id") =!= col("probe_id") else lit(true))
      .select(
        col("probe_id"),
        col("vec_id"),
        round(GraftFunctions.cosineF32(col("embedding"), col("pvec")), 6)
          .as("score"))
      .groupBy("probe_id")
      .agg(GraftFunctions.topkScoreId(col("score"), col("vec_id"), k).as("nn"))
      .select(col("probe_id"), posexplode(col("nn")))
      .select(
        col("probe_id"),
        (col("pos") + 1).cast("int").as("rank"),
        col("col.id").as("vec_id"),
        col("col.score").as("score"))
      .orderBy("probe_id", "rank")
  }

  val entries: Seq[QueryEntry] = Seq(
    // q97 — 5-NN for the first 16 vectors against the rest of the
    // corpus; DuckDB brute-forces the same join with a window rank.
    QueryEntry.sql(
      "q97_knn_join",
      """WITH probes AS (
        |  SELECT vec_id AS probe_id, embedding AS pvec FROM embeddings
        |  WHERE vec_id < 16
        |), scored AS (
        |  SELECT p.probe_id, e.vec_id,
        |         ROUND(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
        |                                      CAST(p.pvec AS DOUBLE[])), 6) AS score
        |  FROM embeddings e, probes p
        |  WHERE e.vec_id <> p.probe_id
        |), ranked AS (
        |  SELECT probe_id, vec_id, score,
        |         CAST(row_number() OVER (PARTITION BY probe_id
        |                ORDER BY score DESC, vec_id) AS INT) AS rank
        |  FROM scored
        |)
        |SELECT probe_id, rank, vec_id, score
        |FROM ranked WHERE rank <= 5 ORDER BY probe_id, rank""".stripMargin,
    ) { (s, dir) =>
      val emb = Tables(s, dir).embeddings
      val probes = emb.filter(col("vec_id") < 16)
        .select(col("vec_id").as("probe_id"), col("embedding").as("pvec"))
      knnJoin(emb, probes, k = 5)
    },

    // q141 — hard-negative mining (contrastive-training staple): for
    // each probe, the top-3 most-similar vectors whose LABEL differs —
    // high-score wrong-class neighbors are exactly the negatives a
    // contrastive loss learns most from. Same broadcast + k-bounded
    // heap-aggregate shape as q97; the label inequality rides the
    // codegen filter before any aggregation state exists.
    QueryEntry.sql(
      "q141_hard_negatives",
      """WITH probes AS (
        |  SELECT vec_id AS probe_id, embedding AS pvec, label AS plabel
        |  FROM embeddings WHERE vec_id < 8
        |), scored AS (
        |  SELECT p.probe_id, e.vec_id, e.label,
        |         ROUND(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
        |                                      CAST(p.pvec AS DOUBLE[])), 6) AS score
        |  FROM embeddings e, probes p
        |  WHERE e.vec_id <> p.probe_id AND e.label <> p.plabel
        |), ranked AS (
        |  SELECT probe_id, vec_id, label, score,
        |         CAST(row_number() OVER (PARTITION BY probe_id
        |                ORDER BY score DESC, vec_id) AS INT) AS rank
        |  FROM scored
        |)
        |SELECT probe_id, rank, vec_id, label, score
        |FROM ranked WHERE rank <= 3 ORDER BY probe_id, rank""".stripMargin,
    ) { (s, dir) =>
      val emb = Tables(s, dir).embeddings
      val probes = emb.filter(col("vec_id") < 8)
        .select(col("vec_id").as("probe_id"), col("embedding").as("pvec"),
          col("label").as("plabel"))
      hardNegatives(emb, probes, k = 3)
    },
  )

  /** Top-k cross-label neighbors per probe (hard negatives). The probe
    * frame carries (probe_id, pvec, plabel); negatives exclude the
    * probe itself and anything sharing its label. Labels rejoin the
    * heap output by vec_id (the heap payload stays a bare id so the
    * k-bounded [[GraftFunctions.topkScoreId]] buffer is reused as-is).
    */
  def hardNegatives(emb: DataFrame, probes: DataFrame, k: Int,
      maxProbes: Long = 100000L): DataFrame = {
    val n = probes.count()
    require(n <= maxProbes,
      s"hardNegatives broadcasts the probe batch: $n probes exceeds " +
        s"maxProbes=$maxProbes — stage probes through Ivf.annSearch instead")
    val ranked = emb.crossJoin(broadcast(probes))
      .filter(col("vec_id") =!= col("probe_id") && col("label") =!= col("plabel"))
      .select(col("probe_id"),
        col("vec_id"),
        round(GraftFunctions.cosineF32(col("embedding"), col("pvec")), 6).as("score"))
      .groupBy("probe_id")
      .agg(GraftFunctions.topkScoreId(col("score"), col("vec_id"), k).as("nn"))
      .select(col("probe_id"), posexplode(col("nn")))
      .select(col("probe_id"), (col("pos") + 1).cast("int").as("rank"),
        col("col.id").as("vec_id"), col("col.score").as("score"))
    ranked
      .join(emb.select(col("vec_id"), col("label")), "vec_id")
      .select(col("probe_id"), col("rank"), col("vec_id"), col("label"), col("score"))
      .orderBy("probe_id", "rank")
  }
}
