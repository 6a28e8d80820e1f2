package graft.operators

import graft.{QueryEntry, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Single-pass column profiler — the data-quality pre-flight a training
  * pipeline runs before ingesting a new table: per column, row count,
  * null count, exact distinct count, and min/max rendered as strings.
  *
  * Shape: ONE wide aggregate over one scan (4 aggregates per column),
  * then a narrow 1-row→n-columns unpivot of the result. The exact
  * `countDistinct` per column is what makes the single pass expand
  * (Catalyst plans multi-distinct via `Expand`, one duplicate of the
  * input per distinct aggregate); that exactness is what the DuckDB
  * differential gate needs. At 100 TB swap `countDistinct` for
  * `approx_count_distinct` and the Expand disappears — same plan
  * otherwise, a documented 1-line trade.
  */
object Profile {

  def profile(df: DataFrame, columns: Seq[String]): DataFrame = {
    val aggs = columns.flatMap { c =>
      Seq(
        count(col(c)).as(s"${c}__nn"),
        countDistinct(col(c)).as(s"${c}__nd"),
        min(col(c)).cast(StringType).as(s"${c}__mn"),
        max(col(c)).cast(StringType).as(s"${c}__mx"))
    }
    val wide = df.agg(count(lit(1)).as("__n"), aggs: _*)
    val stacked = columns.map { c =>
      struct(
        lit(c).as("col_name"),
        col("__n").as("n_rows"),
        (col("__n") - col(s"${c}__nn")).as("n_nulls"),
        col(s"${c}__nd").as("n_distinct"),
        col(s"${c}__mn").as("min_value"),
        col(s"${c}__mx").as("max_value"))
    }
    wide
      .select(explode(array(stacked: _*)).as("p"))
      .select(col("p.*"))
      .orderBy("col_name")
  }

  /** DuckDB mirror: one SELECT per column UNION ALL'd (DuckDB plans
    * each as its own aggregate; semantics identical).
    */
  def profileOracleSql(table: String, columns: Seq[String]): String =
    columns.map { c =>
      s"""SELECT '$c' AS col_name, COUNT(*) AS n_rows,
         |  COUNT(*) - COUNT($c) AS n_nulls,
         |  COUNT(DISTINCT $c) AS n_distinct,
         |  CAST(MIN($c) AS VARCHAR) AS min_value,
         |  CAST(MAX($c) AS VARCHAR) AS max_value
         |FROM $table""".stripMargin
    }.mkString("", "\nUNION ALL\n", "\nORDER BY col_name")

  private val lineitemCols = Seq(
    "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_returnflag",
    "l_linestatus", "l_shipdate")

  val entries: Seq[QueryEntry] = Seq(
    // q102 — profile the lineitem key/flag/date columns (the double
    // columns are excluded: Java's shortest-round-trip double rendering
    // and DuckDB's %g-style rendering disagree on strings like
    // "1.0E-2", which is a formatting difference, not a stats one —
    // the numeric stats over doubles are already gated by q04/q05).
    QueryEntry.sql(
      "q102_column_profile",
      profileOracleSql("lineitem", lineitemCols),
    ) { (s, dir) => profile(Tables(s, dir).lineitem, lineitemCols) },
  )
}
