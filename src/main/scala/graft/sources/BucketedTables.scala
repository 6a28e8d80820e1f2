package graft.sources

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.QueryEntry

/** Bucketed (pre-partitioned) table layout — the co-located-join
  * storage strategy for 100 TB fact⨝fact joins: both sides are written
  * `bucketBy(n, key)` so the join key's partitioning is baked into the
  * file layout and the join planner needs NO shuffle exchange on
  * either side (spec-asserted). This is the standing answer to "is
  * there a shuffle here that becomes the bottleneck at scale?" for
  * repeated joins on a stable key: pay the partitioning once at write
  * time, never at read time.
  *
  * Tables are registered in the session catalog with an explicit
  * external path under scratch (fingerprint-keyed like the ORC
  * copies), so no warehouse-dir assumption leaks into the driver's
  * session.
  */
object BucketedTables {

  private val NBuckets = 8

  /** Bucketed copy of a fixture table, staged once per (dir, source
    * fingerprint) and registered in the session catalog.
    */
  def bucketedTable(spark: SparkSession, dir: String, name: String,
      key: String): DataFrame = synchronized {
    // synchronized: concurrent first calls would race saveAsTable on
    // the same catalog name (parallel test suites share the session)
    val dest = Staging.fingerprintPath("graft_bucketed", dir, s"$name.parquet",
      s"${name}_$key")
    val src = new java.io.File(s"$dir/$name.parquet")
    val table =
      s"graft_bucketed_${dir}_${name}_${key}_${src.lastModified()}_${src.length()}"
        .replaceAll("[^A-Za-z0-9_]", "_")
    // Files and catalog entry are verified INDEPENDENTLY: the catalog
    // can outlive cleaned tmp files (scan would fail at read time) and
    // staged files can outlive the catalog (a fresh JVM would silently
    // rewrite them). The write itself goes through Staging.ensureStaged
    // so the bucketed copy obeys the same fingerprint-keyed write-once
    // policy as every other derived fixture.
    val filesStaged = new java.io.File(dest, "_SUCCESS").exists()
    if (!filesStaged) {
      if (spark.catalog.tableExists(table))
        spark.sql(s"DROP TABLE IF EXISTS $table")
      // we just observed the marker missing: drop the in-JVM write-once
      // memo too, or ensureStaged would no-op over a cleaned directory
      // and the re-register below would mount an empty table
      Staging.invalidate(dest)
      Staging.ensureStaged(dest) {
        spark.read.parquet(s"$dir/$name.parquet")
          .write.mode("overwrite")
          .option("path", dest)
          .bucketBy(NBuckets, key)
          .sortBy(key)
          .saveAsTable(table)
      }
    }
    if (!spark.catalog.tableExists(table)) {
      // files staged by an earlier JVM — re-register the external
      // bucketed table over them instead of rewriting
      val schema = spark.read.parquet(s"$dir/$name.parquet").schema.toDDL
      spark.sql(
        s"""CREATE TABLE $table ($schema) USING parquet
           |CLUSTERED BY ($key) SORTED BY ($key) INTO $NBuckets BUCKETS
           |LOCATION '$dest'""".stripMargin)
    }
    spark.table(table)
  }

  val entries: Seq[QueryEntry] = Seq(
    // Co-located fact⨝dimension-as-fact join: both sides bucketed on
    // the join key, merge-join hint so the bucketed layout (not a
    // broadcast) carries the join; the oracle is the plain join on the
    // parquet sources, so a match proves the bucketed write+read path
    // is value-preserving. BucketedJoinSpec asserts the plan has no
    // shuffle exchange on either join input.
    QueryEntry.sql(
      "q51_bucketed_join",
      """SELECT c_mktsegment, COUNT(*) AS n_orders,
        |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    ) { (s, dir) =>
      val o = bucketedTable(s, dir, "orders", "o_custkey")
      val c = bucketedTable(s, dir, "customer", "c_custkey")
      o.hint("merge")
        .join(c, col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(
          count(lit(1)).as("n_orders"),
          sum(col("o_totalprice").cast(DecimalType(18, 2)))
            .cast(DoubleType).as("total"),
        )
        .orderBy("c_mktsegment")
    },
  )
}
