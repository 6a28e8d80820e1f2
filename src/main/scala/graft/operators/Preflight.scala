package graft.operators

import graft.{QueryEntry, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types.LongType

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

    // q239 — referential-integrity audit: per FK relation, child rows,
    // null keys, and orphans (children whose key misses the parent) —
    // the ingest-preflight a star-schema pipeline runs before trusting
    // joins (an orphan silently DROPS rows from every inner join
    // downstream; this measures the loss before it happens). DuckDB
    // re-derives every count with NOT EXISTS semantics.
    QueryEntry.sql(
      "q239_fk_orphans",
      """SELECT relation, CAST(child_rows AS BIGINT) AS child_rows,
        |       CAST(null_keys AS BIGINT) AS null_keys,
        |       CAST(orphans AS BIGINT) AS orphans
        |FROM (
        |  SELECT 'lineitem.l_orderkey->orders' AS relation,
        |         (SELECT COUNT(*) FROM lineitem) AS child_rows,
        |         (SELECT COUNT(*) FROM lineitem WHERE l_orderkey IS NULL) AS null_keys,
        |         (SELECT COUNT(*) FROM lineitem l WHERE l.l_orderkey IS NOT NULL
        |            AND NOT EXISTS (SELECT 1 FROM orders o
        |                            WHERE o.o_orderkey = l.l_orderkey)) AS orphans
        |  UNION ALL
        |  SELECT 'lineitem.l_partkey->part',
        |         (SELECT COUNT(*) FROM lineitem),
        |         (SELECT COUNT(*) FROM lineitem WHERE l_partkey IS NULL),
        |         (SELECT COUNT(*) FROM lineitem l WHERE l.l_partkey IS NOT NULL
        |            AND NOT EXISTS (SELECT 1 FROM part p
        |                            WHERE p.p_partkey = l.l_partkey))
        |  UNION ALL
        |  SELECT 'lineitem.l_suppkey->supplier',
        |         (SELECT COUNT(*) FROM lineitem),
        |         (SELECT COUNT(*) FROM lineitem WHERE l_suppkey IS NULL),
        |         (SELECT COUNT(*) FROM lineitem l WHERE l.l_suppkey IS NOT NULL
        |            AND NOT EXISTS (SELECT 1 FROM supplier s
        |                            WHERE s.s_suppkey = l.l_suppkey))
        |  UNION ALL
        |  SELECT 'orders.o_custkey->customer',
        |         (SELECT COUNT(*) FROM orders),
        |         (SELECT COUNT(*) FROM orders WHERE o_custkey IS NULL),
        |         (SELECT COUNT(*) FROM orders o WHERE o.o_custkey IS NOT NULL
        |            AND NOT EXISTS (SELECT 1 FROM customer c
        |                            WHERE c.c_custkey = o.o_custkey))
        |) t ORDER BY relation""".stripMargin,
    ) { (s, dir) =>
      val t = Tables(s, dir)
      fkAudit(Seq(
        ("lineitem.l_orderkey->orders", t.lineitem, "l_orderkey", t.orders, "o_orderkey"),
        ("lineitem.l_partkey->part", t.lineitem, "l_partkey", t.part, "p_partkey"),
        ("lineitem.l_suppkey->supplier", t.lineitem, "l_suppkey", t.supplier, "s_suppkey"),
        ("orders.o_custkey->customer", t.orders, "o_custkey", t.customer, "c_custkey")))
    },
  )

  /** Referential-integrity audit (q239): one row per FK relation.
    *
    * Scale shape: per relation, one column-pruned child scan feeding a
    * count/null rollup and one LEFT ANTI join against the (distinct)
    * parent key — Spark broadcasts the parent side when it's small
    * (dims here) and falls back to a shuffled anti join at 100 TB
    * parent sizes; nothing wider than the key column moves.
    */
  def fkAudit(rels: Seq[(String, DataFrame, String, DataFrame, String)]): DataFrame =
    rels.map { case (name, child, key, parent, pkey) =>
      val ck = child.select(col(key).as("k"))
      val base = ck.agg(count(lit(1)).as("child_rows"),
        sum(when(col("k").isNull, 1L).otherwise(0L)).as("null_keys"))
      val orph = ck.filter(col("k").isNotNull)
        .join(parent.select(col(pkey).as("k")), Seq("k"), "left_anti")
        .agg(count(lit(1)).as("orphans"))
      base.crossJoin(orph)
        .select(lit(name).as("relation"),
          col("child_rows").cast(LongType).as("child_rows"),
          col("null_keys").cast(LongType).as("null_keys"),
          col("orphans").cast(LongType).as("orphans"))
    }.reduce(_ union _).orderBy("relation")
}
