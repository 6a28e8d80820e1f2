package graft.operators

import graft.functions.GraftFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Portable HyperLogLog over long keys (SURVEY §2.4 "sketches" — the
  * "novel sketch" custom-operator class).
  *
  * Design goal: a sketch whose ESTIMATE is engine-independent, so it
  * can sit under the DuckDB differential gate like every exact
  * operator (Spark's `approx_count_distinct` and DuckDB's
  * `approx_count_distinct` use engine-private hashes and can never
  * hash-match). Everything is pinned:
  *  - hash = SplitMix64 (pure wrap-around integer math, mirrored in
  *    the oracle SQL with HUGEINT mod-2⁶⁴ arithmetic);
  *  - p = 12 → m = 4096 registers; register = top 12 hash bits,
  *    rho = leading-zero rank of the remaining 52 bits (via `bin()`
  *    string length — identical in both engines);
  *  - the register sum Σ 2^(−M[j]) is scaled by 2⁵³ into an EXACT
  *    integer (DECIMAL(38,0) here, HUGEINT in DuckDB) so no float
  *    accumulation order can flip a bit; one cast to double at the
  *    end;
  *  - estimator = standard HLL alpha·m²/Σ with the linear-counting
  *    small-range correction (E ≤ 2.5m and empty registers exist).
  *
  * Scale shape: one narrow shuffle to at most m=4096 (idx, max-rho)
  * registers, then a scalar — the classic two-phase sketch dataflow;
  * at 100 TB the register aggregation is a map-side-combined groupBy
  * on a 12-bit key.
  */
object Hll {

  private val M = 4096
  private val W = 4503599627370495L // 2^52 - 1

  /** One-row, one-column DataFrame: the HLL estimate of
    * COUNT(DISTINCT column), ROUND(…, 4) — the ungrouped
    * specialization of [[registers]] + [[finishEstimate]], so exactly
    * one copy of the pinned estimator math exists.
    */
  def estimate(df: DataFrame, column: String, alias: String): DataFrame =
    finishEstimate(registers(df, column, Seq.empty), Seq.empty, alias)

  /** Per-group HLL estimates: registers keyed by (group, idx), the
    * same estimator per group. The register frame is the MERGEABLE
    * partial state — union of sketches = cell-wise MAX of registers —
    * which is what makes the sketch distributable at any scale;
    * EngineFacadeSpec asserts that merging the per-group sketches
    * reproduces the global estimate exactly.
    */
  def estimateByGroup(df: DataFrame, groupCol: String, column: String,
      alias: String): DataFrame = {
    val regs = registers(df, column, Seq(groupCol))
    // asc_nulls_last: DuckDB's ORDER BY defaults to NULLS LAST, and
    // the driver gate compares rows IN ORDER — Spark's NULLS FIRST
    // default would flip a NULL group to the other end
    finishEstimate(regs, Seq(groupCol), alias)
      .orderBy(col(groupCol).asc_nulls_last)
  }

  /** The raw (group*, idx, mr) register frame — the sketch state. */
  def registers(df: DataFrame, column: String, groupCols: Seq[String]): DataFrame = {
    val keep = groupCols.map(col) :+
      GraftFunctions.splitmix64(col(column).cast(LongType)).as("z")
    df.filter(col(column).isNotNull)
      .select(keep: _*)
      .select((groupCols.map(col) :+ expr("shiftrightunsigned(z, 52)").as("idx") :+
        expr(s"z & $W").as("w")): _*)
      .select((groupCols.map(col) :+ col("idx") :+
        when(col("w") === 0, lit(53))
          .otherwise(lit(53) - length(bin(col("w")))).as("rho")): _*)
      .groupBy((groupCols :+ "idx").map(col): _*)
      .agg(max("rho").as("mr"))
  }

  /** Estimator over a register frame, optionally grouped. */
  def finishEstimate(regs: DataFrame, groupCols: Seq[String], alias: String): DataFrame = {
    val grouped =
      if (groupCols.isEmpty) regs.groupBy()
      else regs.groupBy(groupCols.map(col): _*)
    grouped
      .agg(
        coalesce(
          sum(expr("CAST(shiftleft(CAST(1 AS BIGINT), 53 - mr) AS DECIMAL(38,0))")),
          lit(0).cast(DecimalType(38, 0))).as("tp"),
        count(lit(1)).as("np"))
      .select((groupCols.map(col) :+
        (col("tp") + (lit(M.toLong) - col("np")) *
          lit(9007199254740992L).cast(DecimalType(38, 0)))
          .cast(DoubleType).as("tt") :+
        (lit(M.toLong) - col("np")).as("v")): _*)
      .select((groupCols.map(col) :+
        ((lit(0.7213) / (lit(1.0) + lit(1.079) / lit(4096.0)))
          * lit(16777216.0) * lit(9007199254740992.0) / col("tt")).as("raw") :+
        col("v")): _*)
      .select((groupCols.map(col) :+
        round(
          when(col("raw") <= lit(10240.0) && col("v") > 0,
            lit(4096.0) * log(lit(4096.0) / col("v")))
            .otherwise(col("raw")),
          4).as(alias)): _*)
  }

  /** DuckDB mirror of [[estimateByGroup]]. */
  def groupedOracleSql(table: String, groupCol: String, column: String,
      alias: String): String =
    oracleSqlImpl(table, Some(groupCol), column, alias)

  /** One SQL builder for both mirrors — grouped and global differ only
    * in the projected/grouped key; keeping a single copy of the
    * estimator SQL matches the single Scala copy in
    * [[finishEstimate]].
    */
  private def oracleSqlImpl(table: String, group: Option[String],
      column: String, alias: String): String = {
    val gSel = group.map(g => s"$g, ").getOrElse("")
    val gBy = group.map(g => s" GROUP BY $g").getOrElse("")
    val gByIdx = group.map(g => s"$g, idx").getOrElse("idx")
    val order = group.map(g => s"\nORDER BY $g").getOrElse("")
    s"""SELECT ${gSel}ROUND(CASE WHEN raw <= CAST(10240.0 AS DOUBLE) AND v > 0
       |             THEN CAST(4096.0 AS DOUBLE) * ln(CAST(4096.0 AS DOUBLE) / v)
       |             ELSE raw END, 4) AS $alias
       |FROM (
       |  SELECT $gSel(CAST(0.7213 AS DOUBLE) / (CAST(1.0 AS DOUBLE) + CAST(1.079 AS DOUBLE) / CAST(4096.0 AS DOUBLE)))
       |         * CAST(16777216.0 AS DOUBLE) * CAST(9007199254740992.0 AS DOUBLE)
       |         / CAST(tp + (4096 - np) * CAST(9007199254740992 AS HUGEINT) AS DOUBLE) AS raw,
       |         4096 - np AS v
       |  FROM (
       |    SELECT ${gSel}COALESCE(SUM(CAST(1 AS BIGINT) << (53 - mr)), 0) AS tp,
       |           COUNT(*) AS np
       |    FROM (
       |      SELECT ${gSel}idx,
       |             MAX(CASE WHEN w = 0 THEN 53 ELSE 53 - length(bin(w)) END) AS mr
       |      FROM (SELECT ${gSel}z >> 52 AS idx, z & $W AS w
       |            FROM (SELECT $gSel${splitmixSql(column)} AS z
       |                  FROM $table WHERE $column IS NOT NULL) zz) ww
       |      GROUP BY $gByIdx) gg$gBy) tt) ee$order""".stripMargin
  }

  // ---- DuckDB mirror -------------------------------------------------------

  /** (a * c) mod 2⁶⁴ in HUGEINT arithmetic: split a into 32-bit halves
    * so every intermediate fits in 128 bits.
    */
  private def mulMod(a: String, c: BigInt): String =
    s"CAST(((((CAST($a AS HUGEINT) // 4294967296) * $c) % 4294967296) * 4294967296" +
      s" + (CAST($a AS HUGEINT) % 4294967296) * $c) % 18446744073709551616 AS UBIGINT)"

  /** SplitMix64 of a column, bit-identical to the Spark expression.
    * Shared with the other pinned-hash sketches (see `CountMin`).
    */
  def splitmixSqlFor(x: String): String = splitmixSql(x)

  private def splitmixSql(x: String): String = {
    val z0 = s"CAST((CAST($x AS HUGEINT) + 11400714819323198485) % 18446744073709551616 AS UBIGINT)"
    val z1 = mulMod(s"xor($z0, $z0 >> 30)", BigInt("13787848793156543929"))
    val z2 = mulMod(s"xor($z1, $z1 >> 27)", BigInt("10723151780598845931"))
    s"xor($z2, $z2 >> 31)"
  }

  /** DuckDB SQL computing the identical estimate for one column. */
  def oracleSql(table: String, column: String, alias: String): String =
    oracleSqlImpl(table, None, column, alias)
}
