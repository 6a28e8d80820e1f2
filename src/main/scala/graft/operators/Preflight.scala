package graft.operators

import graft.{QueryEntry, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** Join-cardinality preflight — compute a prospective equi-join's
  * output size and skew profile WITHOUT executing the join: per-key
  * counts on each side, then Σ cnt_a·cnt_b over shared keys. For an
  * equi-join this is exact, and it costs two aggregation shuffles on
  * key-cardinality frames instead of materializing a possibly-
  * explosive join (the self-join on l_partkey below would emit
  * `join_rows` rows if actually run — the preflight is how a pipeline
  * refuses to run it). Complements q80's per-key skew report with the
  * one number a scheduler gates on, plus the argmax key that would
  * dominate a skewed build.
  *
  * Scale shape: groupBy(key) count on each side (map-side combined),
  * an equi-join of the two COUNT frames (key-cardinality, not
  * row-cardinality), one scalar rollup, and a TakeOrdered(1) for the
  * argmax — nothing in the plan is proportional to the join output.
  */
object Preflight {

  /** One-row preflight for `a ⋈ b` on `key` — ALWAYS one row: no
    * shared keys yields (0, NULL, NULL, NULL) (the argmax row is
    * LEFT-joined, so an empty cell frame cannot erase the report),
    * matching what `FROM cells, top` aggregates to in the SQL mirror.
    * Callers gate on `join_rows` (NULL ≡ empty join).
    */
  def joinSize(a: DataFrame, keyA: String, b: DataFrame, keyB: String): DataFrame = {
    val ca = a.groupBy(col(keyA).as("k")).agg(count(lit(1)).as("ca"))
    val cb = b.groupBy(col(keyB).as("k")).agg(count(lit(1)).as("cb"))
    val cells = ca.join(cb, Seq("k")).select(col("k"), (col("ca") * col("cb")).as("cell"))
    val top = cells.orderBy(col("cell").desc, col("k")).limit(1)
      .select(col("k").as("max_key"), col("cell").as("max_key_rows"))
    cells.agg(
        count(lit(1)).as("shared_keys"),
        sum("cell").as("join_rows"),
      )
      .join(broadcast(top), lit(true), "left")
      .select(col("shared_keys"), col("join_rows"),
        col("max_key"), col("max_key_rows"))
  }

  val entries: Seq[QueryEntry] = Seq(
    // Preflight for the (never-executed) lineitem self-join on
    // l_partkey; DuckDB recomputes the per-key count algebra and the
    // deterministic argmax (count desc, key asc).
    QueryEntry.sql(
      "q120_join_preflight",
      """WITH c AS (
        |  SELECT l_partkey AS k, COUNT(*) AS n FROM lineitem GROUP BY 1
        |), cells AS (
        |  SELECT k, n * n AS cell FROM c
        |), top AS (
        |  SELECT k AS max_key, cell AS max_key_rows FROM cells
        |  ORDER BY cell DESC, max_key LIMIT 1
        |)
        |SELECT CAST(COUNT(*) AS BIGINT) AS shared_keys,
        |       CAST(SUM(cell) AS BIGINT) AS join_rows,
        |       CAST(MAX(max_key) AS BIGINT) AS max_key,
        |       CAST(MAX(max_key_rows) AS BIGINT) AS max_key_rows
        |FROM cells, top""".stripMargin,
    ) { (s, dir) =>
      val li = Tables(s, dir).lineitem
      joinSize(li, "l_partkey", li, "l_partkey")
    },
  )
}
