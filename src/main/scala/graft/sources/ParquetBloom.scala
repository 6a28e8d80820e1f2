package graft.sources

import graft.QueryEntry
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Parquet split-block bloom filters — the parquet twin of the ORC
  * bloom path (q95): a point-lookup workload over a column that is
  * NOT the file's sort key gets nothing from min/max row-group stats
  * (every row group spans the whole key range), so the writer attaches
  * a bloom filter per row group and the vectorized reader drops row
  * groups whose filter proves the key absent.
  *
  * The copy is staged once per fixture fingerprint (the q33/q95
  * pay-once pattern): lineitem written in its natural l_orderkey
  * arrival order (l_partkey scattered — the layout where blooms beat
  * stats), small row groups so skipping has real granularity,
  * dictionary encoding disabled for the bloom column (a dictionary
  * page already gives exact membership; disabling it forces the bloom
  * to be the pruning mechanism, matching the high-NDV columns blooms
  * exist for at 100 TB).
  *
  * The oracle recomputes the lookup aggregate from the parquet fixture
  * — value preservation and no-row-lost-to-a-bloom in one gate;
  * pushdown shape is spec-asserted (`ParquetBloomSpec`).
  */
object ParquetBloom {

  def bloomParquetPath(dir: String): String =
    Staging.fingerprintPath("graft_pqbloom", dir, "lineitem.parquet",
      "lineitem_bloom_v1")

  /** Stage (once) and read the bloom-indexed parquet copy. */
  def bloomParquetCopy(spark: SparkSession, dir: String): DataFrame = {
    val dest = bloomParquetPath(dir)
    Staging.ensureStaged(dest) {
      spark.read.parquet(s"$dir/lineitem.parquet")
        .coalesce(1) // one file, many row groups: skipping is intra-file
        .write.mode("overwrite")
        .option("parquet.bloom.filter.enabled#l_partkey", "true")
        .option("parquet.bloom.filter.expected.ndv#l_partkey", "200000")
        .option("parquet.enable.dictionary#l_partkey", "false")
        .option("parquet.block.size", (256 * 1024).toString)
        .parquet(dest)
    }
    OrcRoundTrip.memoRead(spark, dest)(spark.read.parquet(dest))
  }

  val entries: Seq[QueryEntry] = Seq(
    // q237 — point lookup through the bloom-indexed parquet copy; the
    // equality predicate reaches the scan (PushedFilters) and the
    // bloom prunes row groups min/max can't. DuckDB recomputes the
    // aggregate from the fixture source.
    QueryEntry.sql(
      "q237_parquet_bloom",
      """SELECT CAST(SUM(l_orderkey) AS BIGINT) AS sum_ok,
        |       CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS n_supp,
        |       COUNT(*) AS cnt
        |FROM lineitem WHERE l_partkey = 250""".stripMargin,
    ) { (s, dir) =>
      bloomParquetCopy(s, dir)
        .filter(col("l_partkey") === 250)
        .agg(sum("l_orderkey").as("sum_ok"),
          countDistinct("l_suppkey").as("n_supp"),
          count(lit(1)).as("cnt"))
    },
  )
}
