package graft.operators

import graft.{QueryEntry, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.DataFrame

/** Incremental view maintenance: apply a keyed changeset to a
  * materialized aggregate WITHOUT rescanning the base table — the
  * operation that makes a 100 TB rollup refreshable from a CDC feed
  * instead of a nightly full recompute. COUNT and exact-DECIMAL SUM
  * are self-maintainable: each change row carries a signed
  * contribution (insert +1/+v, delete −1/−v, update Δv), contributions
  * aggregate map-side to a GROUP-cardinality delta frame, and the
  * merge is a group-key outer join of two aggregate-sized frames —
  * nothing in the maintenance path is proportional to the base table.
  *
  * The q129 certificate is the IVM contract itself: maintained view ≡
  * the view recomputed from scratch over the changed table, group by
  * group, to the last decimal digit (groups whose count reaches zero
  * vanish, exactly as a recompute would drop them).
  */
object Ivm {

  private def monthOf(c: org.apache.spark.sql.Column) =
    date_format(c, "yyyy-MM")

  /** The materialized view: per-month order counts and exact total. */
  def orderRollup(orders: DataFrame): DataFrame =
    orders.groupBy(monthOf(col("o_orderdate")).as("month"))
      .agg(count(lit(1)).as("cnt"),
        sum(col("o_totalprice").cast(DecimalType(18, 2))).as("total"))

  /** Signed per-group delta from a keyed before/after pair — stands in
    * for a CDC feed (in production the feed arrives delta-sized; the
    * full-outer derivation here exists only to plant a deterministic
    * changeset in the fixture). Updates are assumed to keep their
    * group (true for the q119 drift); a group-moving update is a
    * delete+insert pair in any real CDC encoding and lands in the
    * NULL-side branches here.
    */
  def changeDelta(before: DataFrame, after: DataFrame): DataFrame =
    changeRows(before, after)
      .groupBy("month")
      .agg(sum("dc").as("dc"), sum("dv").as("dv"))

  /** The un-aggregated signed change feed — one row per changed order:
    * what a CDC source actually emits, and the input the STREAMING twin
    * consumes batch by batch ([[graft.streaming.StreamingEvents.ivmMaintainedRollup]]).
    * [[changeDelta]] is its per-group rollup.
    */
  def changeRows(before: DataFrame, after: DataFrame): DataFrame = {
    val a = before.select(col("o_orderkey").as("ka"),
      monthOf(col("o_orderdate")).as("ma"),
      col("o_totalprice").cast(DecimalType(18, 2)).as("va"))
    val b = after.select(col("o_orderkey").as("kb"),
      monthOf(col("o_orderdate")).as("mb"),
      col("o_totalprice").cast(DecimalType(18, 2)).as("vb"))
    a.join(b, col("ka") === col("kb"), "full_outer")
      .select(
        coalesce(col("ma"), col("mb")).as("month"),
        when(col("kb").isNull, lit(-1)).when(col("ka").isNull, lit(1))
          .otherwise(lit(0)).as("dc"),
        (coalesce(col("vb"), lit(0).cast(DecimalType(18, 2))) -
          coalesce(col("va"), lit(0).cast(DecimalType(18, 2)))).as("dv"),
      )
  }

  /** base view + delta → maintained view: one outer join of two
    * group-sized frames; zero-count groups vanish.
    */
  def maintain(view: DataFrame, delta: DataFrame): DataFrame =
    view.join(delta.withColumnRenamed("month", "dmonth"),
        col("month") === col("dmonth"), "full_outer")
      .select(
        coalesce(col("month"), col("dmonth")).as("month"),
        (coalesce(col("cnt"), lit(0L)) + coalesce(col("dc"), lit(0L))).as("cnt"),
        (coalesce(col("total"), lit(0).cast(DecimalType(18, 2))) +
          coalesce(col("dv"), lit(0).cast(DecimalType(18, 2)))).as("total"),
      )
      .filter(col("cnt") > 0)

  val entries: Seq[QueryEntry] = Seq(
    // Maintained rollup after the q119 drift changeset; the oracle
    // RECOMPUTES the view from scratch over the drifted table — a hash
    // match IS the IVM correctness certificate.
    QueryEntry.sql(
      "q129_incremental_view",
      """WITH b AS (
        |  SELECT o_orderkey, o_orderdate,
        |         CASE WHEN o_orderkey % 17 = 0 THEN o_totalprice + 1.5
        |              ELSE o_totalprice END AS o_totalprice
        |  FROM orders WHERE o_orderkey % 101 <> 0
        |  UNION ALL
        |  SELECT o_orderkey + 100000000 AS o_orderkey, o_orderdate, o_totalprice
        |  FROM orders WHERE o_orderkey % 113 = 0
        |)
        |SELECT strftime(CAST(o_orderdate AS DATE), '%Y-%m') AS month,
        |       COUNT(*) AS cnt,
        |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM b GROUP BY 1 ORDER BY 1""".stripMargin,
    ) { (s, dir) =>
      val orders = Tables(s, dir).orders
      maintain(orderRollup(orders),
          changeDelta(orders, TableDiff.driftedOrders(orders)))
        .select(col("month"), col("cnt"),
          col("total").cast(DoubleType).as("total"))
        .orderBy("month")
    },
  )
}
