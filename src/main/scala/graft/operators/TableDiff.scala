package graft.operators

import graft.{QueryEntry, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** Keyed table reconciliation (anti-entropy diff) — classify every key
  * of two table versions as added / removed / changed / unchanged, the
  * operator behind replica repair, snapshot drift reports, and
  * migration sign-off (q75's checksum says WHETHER two tables differ;
  * this says WHERE). Complements q76's CDC merge: merge APPLIES a
  * changeset, diff RECOVERS one.
  *
  * Scale shape: one full-outer shuffle join on the key — both sides
  * hash-partition once, per-row classification is codegen, and the
  * report is a map-side-combined rollup to 4 rows. The per-class
  * `key_sum` is an order-free content anchor (the q75 combine trick):
  * two engines agreeing on counts AND key sums agree on the
  * membership of every class with overwhelming probability.
  */
object TableDiff {

  /** Per-class (added/removed/changed/unchanged) counts and key sums
    * between `a` and `b`, keyed by `key`; rows compare on `cmp`.
    */
  def diffReport(a: DataFrame, b: DataFrame, key: String, cmp: String): DataFrame = {
    val left = a.select(col(key).as("ka"), col(cmp).as("va"))
    val right = b.select(col(key).as("kb"), col(cmp).as("vb"))
    left.join(right, col("ka") === col("kb"), "full_outer")
      .select(
        when(col("kb").isNull, "removed")
          .when(col("ka").isNull, "added")
          // null-safe: a NULL payload vs a value IS a change (the <=>
        // negation; plain != would classify it "unchanged" via NULL)
        .when(!(col("va") <=> col("vb")), "changed")
          .otherwise("unchanged").as("status"),
        coalesce(col("ka"), col("kb")).as("k"),
      )
      .groupBy("status")
      .agg(count(lit(1)).as("cnt"), sum("k").as("key_sum"))
      .orderBy("status")
  }

  /** The deterministic "drifted replica" of orders used by q119: every
    * 101st key dropped, every 17th surviving key's total bumped, and a
    * shifted copy of every 113th key inserted beyond the key range.
    */
  def driftedOrders(orders: DataFrame): DataFrame = {
    val kept = orders.filter(col("o_orderkey") % 101 =!= 0)
      .select(col("o_orderkey"), col("o_orderdate"),
        when(col("o_orderkey") % 17 === 0, col("o_totalprice") + 1.5)
          .otherwise(col("o_totalprice")).as("o_totalprice"))
    val inserted = orders.filter(col("o_orderkey") % 113 === 0)
      .select((col("o_orderkey") + 100000000L).as("o_orderkey"),
        col("o_orderdate"), col("o_totalprice"))
    kept.unionByName(inserted)
  }

  val entries: Seq[QueryEntry] = Seq(
    // Reconciliation report between orders and its drifted replica;
    // DuckDB rebuilds the replica from the same mutation rules and
    // must agree on every class's count and key sum.
    QueryEntry.sql(
      "q119_table_diff",
      """WITH b AS (
        |  SELECT o_orderkey,
        |         CASE WHEN o_orderkey % 17 = 0 THEN o_totalprice + 1.5
        |              ELSE o_totalprice END AS o_totalprice
        |  FROM orders WHERE o_orderkey % 101 <> 0
        |  UNION ALL
        |  SELECT o_orderkey + 100000000 AS o_orderkey, o_totalprice
        |  FROM orders WHERE o_orderkey % 113 = 0
        |), d AS (
        |  SELECT CASE WHEN b.o_orderkey IS NULL THEN 'removed'
        |              WHEN a.o_orderkey IS NULL THEN 'added'
        |              WHEN a.o_totalprice IS DISTINCT FROM b.o_totalprice
        |                THEN 'changed'
        |              ELSE 'unchanged' END AS status,
        |         COALESCE(a.o_orderkey, b.o_orderkey) AS k
        |  FROM orders a FULL OUTER JOIN b ON a.o_orderkey = b.o_orderkey
        |)
        |SELECT status, COUNT(*) AS cnt, CAST(SUM(k) AS BIGINT) AS key_sum
        |FROM d GROUP BY 1 ORDER BY 1""".stripMargin,
    ) { (s, dir) =>
      val orders = Tables(s, dir).orders
      diffReport(orders, driftedOrders(orders), "o_orderkey", "o_totalprice")
    },
  )
}
