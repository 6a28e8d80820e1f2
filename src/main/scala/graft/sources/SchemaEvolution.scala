package graft.sources

import graft.{QueryEntry, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Schema evolution across parquet file generations — the source-side
  * reality of any long-lived ingest: files written before a column
  * existed sit next to files written after, and one read must span
  * both.
  *
  * The engine surface is Spark's `mergeSchema` parquet read: the
  * footer schemas of every file union into one relation, columns
  * absent from older files read as NULL. The staged fixture writes the
  * `orders` table as two generations — v1 with the original columns,
  * v2 adding a `priority_score` column — and the query aggregates
  * across the boundary, counting rows where the late column is
  * genuinely absent (not defaulted): exactly what a backfill audit
  * runs. Generation provenance comes from the `generation` partition
  * directory column, so the scan also proves partition-column
  * discovery composes with footer-schema merging.
  *
  * Scale note: `mergeSchema` reads every file footer at planning time
  * (a distributed job over footers, not a driver loop); for
  * petabyte-scale tables the declared production path is a metastore
  * schema — the READ semantics certified here are identical.
  */
object SchemaEvolution {

  /** Two-generation orders copy: `generation=1` without, `generation=2`
    * with the evolved `priority_score` column. Staged write-once.
    */
  def evolvedPath(dir: String): String =
    Staging.fingerprintPath("graft_evolve", dir, "orders.parquet",
      "orders_two_generations")

  def evolvedOrders(spark: SparkSession, dir: String): DataFrame = {
    val dest = evolvedPath(dir)
    Staging.ensureStaged(dest, marker = "generation=2/_SUCCESS") {
      val orders = Tables.load(spark, dir, "orders")
      val v1 = orders.filter(col("o_orderkey") % 2 === 0)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      val v2 = orders.filter(col("o_orderkey") % 2 =!= 0)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
          (col("o_totalprice") / 1000.0).as("priority_score"))
      // overwrite: a re-entered write block (v2 failed after v1
      // succeeded → no marker) must be idempotent
      v1.write.mode("overwrite").parquet(s"$dest/generation=1")
      v2.write.mode("overwrite").parquet(s"$dest/generation=2")
    }
    spark.read.option("mergeSchema", "true").parquet(dest)
  }

  val entries: Seq[QueryEntry] = Seq(
    // q105 — per-generation audit over the merged read: row counts,
    // how many rows lack the evolved column, and checksums over the
    // shared columns. The oracle recomputes both generations from the
    // source table (v1 rows carry NULL priority_score by
    // construction).
    QueryEntry.sql(
      "q105_schema_evolution",
      """WITH merged AS (
        |  SELECT o_orderkey, o_custkey, o_totalprice,
        |         CAST(NULL AS DOUBLE) AS priority_score, 1 AS generation
        |  FROM orders WHERE o_orderkey % 2 = 0
        |  UNION ALL
        |  SELECT o_orderkey, o_custkey, o_totalprice,
        |         o_totalprice / 1000.0 AS priority_score, 2 AS generation
        |  FROM orders WHERE o_orderkey % 2 <> 0
        |)
        |SELECT generation, COUNT(*) AS n_rows,
        |       CAST(SUM(CASE WHEN priority_score IS NULL THEN 1 ELSE 0 END)
        |         AS BIGINT) AS n_missing_score,
        |       CAST(SUM(o_orderkey) AS BIGINT) AS sum_key,
        |       CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,2))), 2)
        |         AS DOUBLE) AS sum_price
        |FROM merged GROUP BY generation ORDER BY generation""".stripMargin,
    ) { (s, dir) =>
      evolvedOrders(s, dir)
        .groupBy(col("generation"))
        .agg(
          count(lit(1)).as("n_rows"),
          sum(when(col("priority_score").isNull, 1).otherwise(0))
            .cast("bigint").as("n_missing_score"),
          sum("o_orderkey").cast("bigint").as("sum_key"),
          round(sum(col("o_totalprice").cast("decimal(18,2)")), 2)
            .cast("double").as("sum_price"))
        .orderBy("generation")
    },
  )
}
