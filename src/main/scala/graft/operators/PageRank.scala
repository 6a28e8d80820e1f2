package graft.operators

import graft.{QueryEntry, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Weighted PageRank as a fixed-iteration distributed join-aggregate —
  * the canonical iterative graph pattern (the same shuffle shape as
  * q38's label propagation, but with floating-point mass instead of
  * min-labels). Each iteration joins the edge list against the current
  * rank vector and aggregates contributions by destination; at real
  * scale the edge list is the big distributed side and the rank vector
  * the broadcast side, so one iteration costs one broadcast + one
  * map-side-combined aggregation — no global sort, no driver state.
  *
  * Oracle-parity design: every PER-ROW step is IEEE double arithmetic
  * (deterministic in any engine); every AGGREGATION is an exact
  * DECIMAL(38,18) sum over double-cast contributions, so iteration
  * results are bit-identical regardless of shuffle order — the same
  * decimal-for-aggregation/double-for-scalars split as q90. Dangling
  * mass is NOT redistributed (documented choice: ranks then sum to <1,
  * but the per-node computation stays a pure function of the graph).
  */
object PageRank {

  val Damping = 0.85
  val Iters = 10
  /** 25 TPC-H nations at every scale factor (asserted at run time). */
  val N = 25
  private val Base = (1.0 - Damping) / N // exact same double in the SQL literal
  private val Init = 1.0 / N

  /** Trade edges: customer nation → supplier nation, weighted by
    * revenue. Dimension sides broadcast; the one shuffle is
    * lineitem⨝orders on l_orderkey, then a map-side-combined rollup to
    * ≤ N² edge rows.
    */
  def tradeEdges(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val w = sum(col("l_extendedprice").cast(DecimalType(18, 2)) *
      (lit(1) - col("l_discount").cast(DecimalType(18, 2)))).as("w")
    t.lineitem
      .join(t.orders, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(t.customer), col("o_custkey") === col("c_custkey"))
      .join(broadcast(t.supplier), col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("c_nationkey").as("src"), col("s_nationkey").as("dst"))
      .agg(w)
      .withColumn("frac", col("w").cast(DoubleType) /
        sum("w").over(Window.partitionBy("src")).cast(DoubleType))
      .select("src", "dst", "frac")
  }

  /** `iters` synchronous iterations over (src, dst, frac) edges and a
    * (node) vertex frame. The edge frame is pinned eagerly so the
    * chained iteration plans don't recompute its upstream joins.
    */
  def pageRank(edges: DataFrame, nodes: DataFrame, damping: Double,
      iters: Int): DataFrame = {
    val e = graft.metrics.RuntimeBreakdown.noteExecuted(edges).localCheckpoint(true)
    val base = (1.0 - damping) / N
    var ranks = nodes.select(col("node"), lit(1.0 / N).as("pr"))
    for (_ <- 1 to iters) {
      val contrib = e.join(broadcast(ranks), col("src") === col("node"))
        .select(col("dst"), (col("pr") * col("frac")).cast(DecimalType(38, 18)).as("c"))
        .groupBy("dst")
        .agg(sum("c").cast(DoubleType).as("in_sum"))
      ranks = nodes.join(contrib, nodes("node") === contrib("dst"), "left")
        .select(col("node"),
          (lit(base) + lit(damping) * coalesce(col("in_sum"), lit(0.0))).as("pr"))
    }
    ranks
  }

  /** One unrolled oracle iteration (DuckDB): LEFT JOIN keeps in-edge-
    * less nodes at the base rank; the contribution sum is the same
    * DECIMAL(38,18)-over-double-products as the Spark side.
    */
  private def iterSql(k: Int): String =
    s"""r$k AS (
       |  SELECT n.node,
       |         CAST($Base AS DOUBLE) + CAST($Damping AS DOUBLE) *
       |           COALESCE(CAST(SUM(CAST(r.pr * e.frac AS DECIMAL(38,18))) AS DOUBLE),
       |                    CAST(0.0 AS DOUBLE)) AS pr
       |  FROM nodes n
       |  LEFT JOIN edges e ON e.dst = n.node
       |  LEFT JOIN r${k - 1} r ON r.node = e.src
       |  GROUP BY n.node
       |)""".stripMargin

  val entries: Seq[QueryEntry] = Seq(
    // PageRank over the nation trade graph, 10 iterations; the oracle
    // unrolls the iterations as chained CTEs and must match rank-for-
    // rank to 12 decimals.
    QueryEntry.sql(
      "q93_pagerank",
      s"""WITH raw AS (
         |  SELECT c_nationkey AS src, s_nationkey AS dst,
         |         SUM(CAST(l_extendedprice AS DECIMAL(18,2))
         |             * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS w
         |  FROM lineitem
         |  JOIN orders ON l_orderkey = o_orderkey
         |  JOIN customer ON o_custkey = c_custkey
         |  JOIN supplier ON l_suppkey = s_suppkey
         |  GROUP BY 1, 2
         |), edges AS (
         |  SELECT src, dst,
         |         CAST(w AS DOUBLE) / CAST(SUM(w) OVER (PARTITION BY src) AS DOUBLE)
         |           AS frac
         |  FROM raw
         |), nodes AS (
         |  SELECT n_nationkey AS node FROM nation
         |), r0 AS (
         |  SELECT node, CAST($Init AS DOUBLE) AS pr FROM nodes
         |),
         |${(1 to Iters).map(iterSql).mkString(",\n")}
         |SELECT node, ROUND(pr, 12) AS pr
         |FROM r$Iters ORDER BY pr DESC, node""".stripMargin,
    ) { (s, dir) =>
      val nodes = Tables(s, dir).nation.select(col("n_nationkey").as("node"))
      require(nodes.count() == N, s"expected $N nations")
      pageRank(tradeEdges(s, dir), nodes, Damping, Iters)
        .select(col("node"), round(col("pr"), 12).as("pr"))
        .orderBy(col("pr").desc, col("node"))
    },
  )
}
