package graft

import graft.sources.StatsManifest
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Stats-manifest data skipping: the pruning must be REAL (fewer files
  * opened, measured from scan metrics) and LOSSLESS (same answer as
  * the unpruned scan).
  */
class ManifestSpec extends SparkSpec {

  private def filesRead(df: org.apache.spark.sql.DataFrame): Long = {
    df.collect()
    df.queryExecution.executedPlan.collectLeaves().collect {
      case s: FileSourceScanExec => s.metrics("numFiles").value
    }.sum
  }

  test("manifest prunes files and the scan metric proves it") {
    val staged = StatsManifest.stagedLineitem(spark, sf)
    val (files, total) = StatsManifest.prunedFiles(
      spark, staged, "1995-01-01 00:00:00", "1996-01-01 00:00:00")
    assert(total >= 5, s"expected year-sliced layout, got $total files")
    assert(files.length < total,
      s"pruning kept ${files.length}/$total — nothing skipped")
    val scan = StatsManifest.prunedScan(
      spark, sf, "1995-01-01 00:00:00", "1996-01-01 00:00:00")
    assert(filesRead(scan) == files.length.toLong)
  }

  test("pruned scan loses no qualifying row vs the full-table filter") {
    val pruned = StatsManifest.prunedScan(
      spark, sf, "1995-01-01 00:00:00", "1996-01-01 00:00:00")
      .agg(count(lit(1)), sum(col("l_orderkey"))).collect().head
    val full = Tables(spark, sf).lineitem
      .filter(col("l_shipdate") >= lit("1995-01-01 00:00:00").cast(TimestampType) &&
        col("l_shipdate") < lit("1996-01-01 00:00:00").cast(TimestampType))
      .agg(count(lit(1)), sum(col("l_orderkey"))).collect().head
    assert(pruned == full)
  }

  test("empty intersection yields an empty frame, not an error") {
    val none = StatsManifest.prunedScan(
      spark, sf, "2050-01-01 00:00:00", "2051-01-01 00:00:00")
    assert(none.count() == 0L)
  }
}
