package graft.operators

import graft.{QueryEntry, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Table reshaping — pivot (long→wide), unpivot (wide→long), and CUBE
  * grouping-set rollups with grouping-id provenance.
  *
  * All three are pure Catalyst shapes: pivot compiles to one
  * partial+final aggregate over `CASE WHEN` projections (one shuffle,
  * no per-value scans), unpivot to an Expand node (rows×values, no
  * shuffle), CUBE to Expand×4 feeding one aggregate — each is the plan
  * you'd want at 100 TB, and `.explain` shows no extra exchanges
  * beyond the single aggregation shuffle.
  *
  * Reference grounding: the reference's only aggregation is the SUM
  * pipeline over an ORC scan (`orc-parser/reader.cc:58-66`); these are
  * the declared Tier-C widenings of that same partial→final aggregate
  * dataflow (SURVEY §2.4).
  */
object Reshape {

  val entries: Seq[QueryEntry] = Seq(
    // Pivot: per return-flag quantity totals, one column per line
    // status. Explicit pivot values keep the output schema static (no
    // driver-side distinct scan) — the form that scales: values are
    // enum-like and known.
    QueryEntry.sql(
      "q64_pivot",
      """SELECT l_returnflag,
        |       CAST(SUM(CASE WHEN l_linestatus = 'F'
        |                     THEN CAST(l_quantity AS DECIMAL(18,2)) END)
        |            AS DOUBLE) AS "F",
        |       CAST(SUM(CASE WHEN l_linestatus = 'O'
        |                     THEN CAST(l_quantity AS DECIMAL(18,2)) END)
        |            AS DOUBLE) AS "O"
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    ) { (s, dir) =>
      Tables(s, dir).lineitem
        .groupBy("l_returnflag")
        .pivot("l_linestatus", Seq("F", "O"))
        .agg(sum(col("l_quantity").cast(DecimalType(18, 2))).cast(DoubleType))
        .orderBy("l_returnflag")
    },

    // Unpivot (melt): the four lineitem measures to (metric, value)
    // rows, re-aggregated per metric. Expand emits rows×4 with no
    // shuffle; the one shuffle is the final 4-group aggregate.
    QueryEntry.sql(
      "q65_unpivot",
      """WITH m AS (
        |  SELECT 'l_quantity' AS metric, l_quantity AS value FROM lineitem
        |  UNION ALL SELECT 'l_extendedprice', l_extendedprice FROM lineitem
        |  UNION ALL SELECT 'l_discount', l_discount FROM lineitem
        |  UNION ALL SELECT 'l_tax', l_tax FROM lineitem
        |)
        |SELECT metric, COUNT(*) AS cnt,
        |       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM m GROUP BY metric ORDER BY metric""".stripMargin,
    ) { (s, dir) =>
      // aggregate early, reshape late: the four sums reduce to ONE row
      // before the melt, so Expand multiplies 1 row — not the fact
      // table (1.2 s → scan-bound at sf0.1). Decimal partials are
      // exact, so the result is identical to melting first.
      val sums = Tables(s, dir).lineitem.agg(
        count(lit(1)).as("cnt"),
        sum(col("l_quantity").cast(DecimalType(18, 2))).as("l_quantity"),
        sum(col("l_extendedprice").cast(DecimalType(18, 2))).as("l_extendedprice"),
        sum(col("l_discount").cast(DecimalType(18, 2))).as("l_discount"),
        sum(col("l_tax").cast(DecimalType(18, 2))).as("l_tax"))
      sums
        .unpivot(
          Array(col("cnt")),
          Array(col("l_quantity"), col("l_extendedprice"),
            col("l_discount"), col("l_tax")),
          "metric", "total_dec")
        .select(col("metric"), col("cnt"),
          col("total_dec").cast(DoubleType).as("total"))
        .orderBy("metric")
    },

    // CUBE over (returnflag, linestatus) with grouping-id provenance —
    // all four grouping sets in one pass (Expand×4 → one aggregate).
    // Spark's grouping_id() and DuckDB's GROUPING() share the
    // Postgres bit convention (leftmost column = MSB); NULLS LAST on
    // both sides because the subtotal rows carry NULL keys.
    QueryEntry.sql(
      "q66_cube_grouping",
      """SELECT l_returnflag, l_linestatus,
        |       CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
        |       COUNT(*) AS cnt,
        |       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM lineitem
        |GROUP BY CUBE (l_returnflag, l_linestatus)
        |ORDER BY gid, l_returnflag NULLS LAST, l_linestatus NULLS LAST""".stripMargin,
    ) { (s, dir) =>
      // two-level cube (the q34 rollup trick): pre-aggregate to the
      // (rf, ls) grain — COUNT and exact decimal SUM are re-aggregable
      // partials — so Expand×4 multiplies SIX rows, not the table.
      val grain = Tables(s, dir).lineitem
        .groupBy("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("cnt0"),
          sum(col("l_quantity").cast(DecimalType(18, 2))).as("tot0"))
      grain
        .cube("l_returnflag", "l_linestatus")
        .agg(
          grouping_id().cast(LongType).as("gid"),
          sum("cnt0").as("cnt"),
          sum("tot0").cast(DoubleType).as("total"),
        )
        .select("l_returnflag", "l_linestatus", "gid", "cnt", "total")
        .orderBy(col("gid"), col("l_returnflag").asc_nulls_last,
          col("l_linestatus").asc_nulls_last)
    },
  )
}
