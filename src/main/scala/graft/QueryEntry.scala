package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One declared engine operation: a Spark program plus (when the
  * semantics are ANSI-SQL-expressible) the equivalent DuckDB SQL the
  * driver uses as a differential oracle — the Spark-era form of the
  * reference's USE_PIM=0-vs-1 differential check
  * (`orc-parser/Makefile:16`, `README.md:6-9`).
  *
  * Contract (SURVEY §2.5): every query's output has a total ORDER BY or
  * is an order-insensitive scalar aggregate, and every output column is
  * aliased identically in both the Spark program and the oracle SQL.
  */
final case class QueryEntry(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    oracleGen: Option[(SparkSession, String) => String] = None,
)

object QueryEntry {
  def sql(name: String, oracleSql: String)(
      fn: (SparkSession, String) => DataFrame): QueryEntry =
    QueryEntry(name, fn, Some(oracleSql))

  /** Oracle SQL generated at Verify time with the live session — for
    * operators whose oracle embeds a deterministically-FITTED model
    * (e.g. IVF centroids): the model parameters are inlined as exact
    * literals, and DuckDB independently re-executes the whole *search*
    * computation against them.
    */
  def dynamicSql(name: String)(gen: (SparkSession, String) => String)(
      fn: (SparkSession, String) => DataFrame): QueryEntry =
    QueryEntry(name, fn, None, Some(gen))

  /** Rows-only check: no SQL-expressible oracle (hash-function-dependent
    * output etc.); correctness covered by ScalaTest instead.
    */
  def rowsOnly(name: String)(
      fn: (SparkSession, String) => DataFrame): QueryEntry =
    QueryEntry(name, fn, None)
}
