package graft.operators

import graft.{QueryEntry, Tables}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Order-independent table fingerprints — the migration/replication
  * integrity check: the exact integer SUM of per-row md5-derived
  * hashes plus the row count, one narrow scan + an order-free 1-row
  * combine (no sort, no wide shuffle). The sum accumulates in
  * DECIMAL(38,0), so unlike an XOR fold it cannot cancel even
  * multiplicities (two tables differing by a swapped PAIR of rows
  * XOR to the same value; their hash sums differ). Matching
  * (n_rows, checksum) is collision-proof up to md5-sum collisions —
  * cryptographically unlikely, not a theorem.
  *
  * Only columns with engine-independent string forms participate
  * (integers, strings, explicitly formatted dates) — double formatting
  * differs across engines, so callers format or exclude floats.
  */
object Checksum {

  /** Sum-of-row-hashes checksum over the given (pre-formatted) columns. */
  def tableChecksum(df: DataFrame, cols: Seq[Column]): DataFrame = {
    val row = concat_ws("|", cols: _*)
    val h = graft.functions.GraftFunctions.md5Long(row.cast(BinaryType))
    // checksum travels as a STRING: a 2^74-scale decimal survives any
    // client layer verbatim, where DECIMAL/HUGEINT degrade to float in
    // dataframe bridges and lose the low digits
    df.select(h.as("h")).agg(
      count(lit(1)).as("n_rows"),
      sum(col("h").cast(org.apache.spark.sql.types.DecimalType(38, 0)))
        .cast(org.apache.spark.sql.types.StringType).as("checksum"))
  }

  val entries: Seq[QueryEntry] = Seq(
    // Fingerprints of orders (with a formatted date) and lineitem key
    // columns in one row; a hash match here means both engines agree
    // on every participating cell of every row.
    QueryEntry.sql(
      "q75_table_checksum",
      """WITH o AS (
        |  SELECT COUNT(*) AS o_rows,
        |         CAST(SUM(CAST(CAST('0x' || substr(md5(concat_ws('|',
        |             o_orderkey, o_custkey, o_orderstatus, o_orderpriority,
        |             strftime(CAST(o_orderdate AS TIMESTAMP), '%Y-%m-%d'))), 1, 15)
        |           AS BIGINT) AS DECIMAL(38,0))) AS VARCHAR) AS o_checksum
        |  FROM orders
        |), l AS (
        |  SELECT COUNT(*) AS l_rows,
        |         CAST(SUM(CAST(CAST('0x' || substr(md5(concat_ws('|',
        |             l_orderkey, l_partkey, l_returnflag, l_linestatus)), 1, 15)
        |           AS BIGINT) AS DECIMAL(38,0))) AS VARCHAR) AS l_checksum
        |  FROM lineitem
        |)
        |SELECT o_rows, o_checksum, l_rows, l_checksum FROM o CROSS JOIN l""".stripMargin,
    ) { (s, dir) =>
      val t = Tables(s, dir)
      val o = tableChecksum(t.orders, Seq(
        col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        col("o_orderpriority"),
        date_format(col("o_orderdate"), "yyyy-MM-dd")))
        .select(col("n_rows").as("o_rows"), col("checksum").as("o_checksum"))
      val l = tableChecksum(t.lineitem, Seq(
        col("l_orderkey"), col("l_partkey"), col("l_returnflag"),
        col("l_linestatus")))
        .select(col("n_rows").as("l_rows"), col("checksum").as("l_checksum"))
      o.crossJoin(l)
    },

    // q154 — merkle-style PER-BUCKET checksums: the sync/repair
    // companion to q75's single fingerprint. Two replicas compare
    // bucket rows and re-transfer only buckets whose (n_rows,
    // checksum) differ — at 100 TB that is the difference between
    // re-shipping a key range and re-shipping the table. Same
    // order-free decimal hash-sum, grouped by an id-range bucket (one
    // map-side-combined aggregation; bucket count is the only state).
    QueryEntry.sql(
      "q154_bucket_checksums",
      """SELECT doc_id // 50 AS bucket, CAST(COUNT(*) AS BIGINT) AS n_rows,
        |       CAST(SUM(CAST(CAST('0x' || substr(md5(concat_ws('|',
        |           doc_id, lang, source, n_chars)), 1, 15)
        |         AS BIGINT) AS DECIMAL(38,0))) AS VARCHAR) AS checksum
        |FROM documents GROUP BY bucket ORDER BY bucket""".stripMargin,
    ) { (s, dir) =>
      bucketChecksums(Tables(s, dir).documentsRebalanced,
        expr("doc_id div 50"),
        Seq(col("doc_id"), col("lang"), col("source"), col("n_chars")))
    },
  )

  /** Grouped [[tableChecksum]]: one checksum row per bucket. */
  def bucketChecksums(df: DataFrame, bucket: Column, cols: Seq[Column]): DataFrame = {
    val h = graft.functions.GraftFunctions.md5Long(
      concat_ws("|", cols: _*).cast(BinaryType))
    df.select(bucket.as("bucket"), h.as("h"))
      .groupBy("bucket")
      .agg(
        count(lit(1)).as("n_rows"),
        sum(col("h").cast(DecimalType(38, 0))).cast(StringType).as("checksum"))
      .orderBy("bucket")
  }
}
