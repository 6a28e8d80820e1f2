package graft.operators

import graft.{QueryEntry, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.DataFrame

/** 2-D skyline (Pareto frontier): the rows no other row dominates —
  * here "cheaper or equal AND at least as much quantity, better in at
  * least one". The multi-criteria shortlist operator (price/quality
  * trade curves, model accuracy/latency frontiers) that has no single
  * ORDER BY.
  *
  * For two dimensions the frontier has a monotone structure: sorted by
  * (price asc, qty desc), a row is on the skyline iff its qty strictly
  * exceeds every EARLIER row's — one running-max scan. The distributed
  * shape exploits that twice:
  *
  *  1. partition-LOCAL prefilter: sortWithinPartitions (no exchange)
  *     + a per-partition running-max scan keeps only locally
  *     undominated rows — sound because local dominators are global
  *     dominators, so anything dropped was never frontier material;
  *  2. the GLOBAL running-max pass then runs over the surviving
  *     candidate set, which is frontier-sized per partition, not
  *     corpus-sized — its single-task window is the same bounded
  *     final step as a TakeOrdered merge.
  *
  * Without the prefilter the global window would sort the full table
  * into one task — the classic scale-killer this plan exists to avoid.
  */
object Skyline {

  /** Pareto frontier minimizing `minCol`, maximizing `maxCol`;
    * duplicates collapse to one row. Output: (price, qty) ordered by
    * price.
    */
  def skyline2d(df: DataFrame, minCol: String, maxCol: String): DataFrame = {
    import df.sparkSession.implicits._
    val cand = df
      .select(col(minCol).cast(DoubleType).as("price"),
        col(maxCol).cast(DoubleType).as("qty"))
      .sortWithinPartitions(col("price").asc, col("qty").desc)
      .as[(Double, Double)]
      .mapPartitions { it =>
        var best = Double.NegativeInfinity
        it.filter { case (_, q) => if (q > best) { best = q; true } else false }
      }
      .toDF("price", "qty")
    val g = Window.orderBy(col("price").asc, col("qty").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    cand.withColumn("pm", max("qty").over(g))
      .filter(col("pm").isNull || col("qty") > col("pm"))
      .select("price", "qty")
      .orderBy("price")
  }

  /** Per-group Pareto frontier — one skyline per `groupCol` value.
    *
    * Unlike the GLOBAL 2-D case (whose final window is inherently
    * single-task and therefore needs the partition-local prefilter),
    * the grouped form is the embarrassingly-parallel one: a window
    * PARTITIONED BY the group shuffles each group to one task and runs
    * the monotone running-max scan there — every group's frontier
    * computes independently, no global sort, no single-task stage.
    * Groups are event/category-sized by contract; a single pathological
    * group degenerates to the global case and would take the q127
    * prefilter INSIDE that group.
    *
    * Dimensions d ≥ 3 need a DIFFERENT algorithm, not a wider window:
    * the 2-D trick works because after sorting by (price asc, qty
    * desc), dominance collapses to a SCALAR running max — one number
    * summarizes the entire "seen" set. With a third criterion the
    * dominated region is the union of axis-aligned boxes and no scalar
    * summary exists; the standard distributed shapes are block-
    * nested-loop / sort-filter-skyline with a partition-local frontier
    * SET as the prefilter (same soundness argument as q127's local
    * pass: local dominators are global dominators) and a frontier-
    * sized merge. Declared out of scope here; the 2-D monotone case is
    * what composes into a window-free plan.
    */
  def groupedSkyline2d(df: DataFrame, groupCol: String, minCol: String,
      maxCol: String): DataFrame = {
    val g = Window.partitionBy("grp")
      .orderBy(col("price").asc, col("qty").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    df
      .select(col(groupCol).as("grp"),
        col(minCol).cast(DoubleType).as("price"),
        col(maxCol).cast(DoubleType).as("qty"))
      .withColumn("pm", max("qty").over(g))
      .filter(col("pm").isNull || col("qty") > col("pm"))
      .select(col("grp").as(groupCol), col("price"), col("qty"))
      .orderBy(groupCol, "price")
  }

  val entries: Seq[QueryEntry] = Seq(
    // Price/quantity frontier of lineitem; DuckDB runs the monotone
    // single-window formulation over the whole table — the engine's
    // two-phase plan must land on the identical frontier.
    QueryEntry.sql(
      "q127_skyline",
      """WITH s AS (
        |  SELECT CAST(l_extendedprice AS DOUBLE) AS price,
        |         CAST(l_quantity AS DOUBLE) AS qty,
        |         MAX(CAST(l_quantity AS DOUBLE)) OVER (
        |           ORDER BY l_extendedprice, l_quantity DESC
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pm
        |  FROM lineitem
        |)
        |SELECT price, qty FROM s
        |WHERE pm IS NULL OR qty > pm
        |ORDER BY price""".stripMargin,
    ) { (s, dir) =>
      skyline2d(Tables(s, dir).lineitem, "l_extendedprice", "l_quantity")
    },

    // Per-returnflag frontiers: the grouped (partitioned-window) form.
    // DuckDB partitions the same monotone window by the group and must
    // land on identical per-group frontiers.
    QueryEntry.sql(
      "q133_skyline_grouped",
      """WITH s AS (
        |  SELECT l_returnflag,
        |         CAST(l_extendedprice AS DOUBLE) AS price,
        |         CAST(l_quantity AS DOUBLE) AS qty,
        |         MAX(CAST(l_quantity AS DOUBLE)) OVER (
        |           PARTITION BY l_returnflag
        |           ORDER BY l_extendedprice, l_quantity DESC
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pm
        |  FROM lineitem
        |)
        |SELECT l_returnflag, price, qty FROM s
        |WHERE pm IS NULL OR qty > pm
        |ORDER BY l_returnflag, price""".stripMargin,
    ) { (s, dir) =>
      groupedSkyline2d(Tables(s, dir).lineitem, "l_returnflag",
        "l_extendedprice", "l_quantity")
    },
  )
}
