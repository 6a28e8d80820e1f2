package graft.sources

import graft.{QueryEntry, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** Z-order (Morton-curve) data layout — the multi-dimensional
  * clustering trick behind Delta/Iceberg `OPTIMIZE ZORDER BY`: bit-
  * interleave two dimensions into one sort key, range-partition and
  * sort the table by it, and min/max footer stats on BOTH dimensions
  * become selective in every file — so a 2-d box predicate skips most
  * row groups, where a single-column sort only helps its own column.
  *
  * At 100 TB this is the difference between scanning the whole table
  * and scanning the files that intersect the query box; the layout
  * write is one range shuffle (same cost class as any sorted write).
  * ZOrderSpec measures the effect: scan output rows under a box filter
  * drop ~an order of magnitude vs the identical data laid out by
  * insertion order.
  */
object ZOrderLayout {

  /** Morton z-value of the low `bits` of two non-negative ints: bit i
    * of `x` lands at position 2i, bit i of `y` at 2i+1. Pure integer
    * expression — stays in whole-stage codegen and is exactly
    * mirrorable in any engine.
    */
  def zValue(x: Column, y: Column, bits: Int): Column =
    (0 until bits).map { i =>
      shiftright(x, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i)) +
        shiftright(y, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i + 1))
    }.reduce(_ + _)

  /** DuckDB mirror of [[zValue]] over SQL expressions `x`, `y`. */
  def zValueSql(x: String, y: String, bits: Int): String =
    (0 until bits).map { i =>
      s"((($x) >> $i) & 1) * ${1L << (2 * i)} + ((($y) >> $i) & 1) * ${1L << (2 * i + 1)}"
    }.mkString(" + ")

  private val Bits = 8
  private val Files = 16

  /** The z-layout operator: project the two cluster dimensions (here
    * part/supplier keys folded to 8 bits), compute the z key, and
    * rewrite range-partitioned + sorted by it. Returns the laid-out
    * frame (read back from `dest`).
    */
  def writeZOrdered(df: DataFrame, dest: String): Unit =
    df.select(
        (col("l_partkey") % 256).cast(LongType).as("px"),
        (col("l_suppkey") % 256).cast(LongType).as("py"),
        col("l_orderkey"), col("l_quantity"))
      .withColumn("z", zValue(col("px"), col("py"), Bits))
      .repartitionByRange(Files, col("z"))
      .sortWithinPartitions("z")
      .write.mode("overwrite").parquet(dest)

  def zOrderedPath(dir: String): String =
    Staging.fingerprintPath("graft_zorder", dir, "lineitem.parquet",
      s"lineitem_z${Bits}x$Files")

  /** Staged write-once z-ordered copy of lineitem. */
  def zOrderedLineitem(spark: SparkSession, dir: String): DataFrame = {
    val dest = zOrderedPath(dir)
    Staging.ensureStaged(dest) {
      writeZOrdered(Tables.load(spark, dir, "lineitem"), dest)
    }
    OrcRoundTrip.memoRead(spark, dest)(spark.read.parquet(dest))
  }

  val entries: Seq[QueryEntry] = Seq(
    // Layout certificate: the per-z-range rollup read from the
    // REWRITTEN (z-sorted) copy, oracled by the same integer math over
    // the ORIGINAL lineitem — a hash match proves the layout rewrite
    // preserved content exactly and the interleave is bit-correct. The
    // min/max columns show the locality the curve buys: every 4096-wide
    // z range confines both dimensions to a 64-wide band.
    QueryEntry.sql(
      "q92_zorder_layout",
      s"""WITH z AS (
         |  SELECT ${zValueSql("l_partkey % 256", "l_suppkey % 256", Bits)} AS z,
         |         l_partkey % 256 AS px, l_suppkey % 256 AS py
         |  FROM lineitem
         |)
         |SELECT CAST(z // 4096 AS BIGINT) AS z_range, COUNT(*) AS cnt,
         |       CAST(MIN(px) AS BIGINT) AS min_px, CAST(MAX(px) AS BIGINT) AS max_px,
         |       CAST(MIN(py) AS BIGINT) AS min_py, CAST(MAX(py) AS BIGINT) AS max_py
         |FROM z GROUP BY 1 ORDER BY z_range""".stripMargin,
    ) { (s, dir) =>
      zOrderedLineitem(s, dir)
        .groupBy(expr("z div 4096").as("z_range"))
        .agg(count(lit(1)).as("cnt"),
          min("px").as("min_px"), max("px").as("max_px"),
          min("py").as("min_py"), max("py").as("max_py"))
        .orderBy("z_range")
    },
  )
}
