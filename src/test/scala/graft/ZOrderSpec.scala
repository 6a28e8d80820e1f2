package graft

import graft.sources.ZOrderLayout
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

/** Z-order layout: interleave correctness and the actual data-skipping
  * effect (measured from scan metrics, not asserted from plan text).
  */
class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  test("zValue is a bijection on the 16x16 grid and interleaves bits") {
    val grid = (0 until 16).flatMap(x => (0 until 16).map(y => (x.toLong, y.toLong)))
      .toDF("x", "y")
      .select(col("x"), col("y"), ZOrderLayout.zValue(col("x"), col("y"), 4).as("z"))
    val rows = grid.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.map(_._3).distinct.length == 256, "z must be injective")
    assert(rows.forall { case (_, _, z) => z >= 0 && z < 256 })
    // spot-check the canonical Morton values
    val at = rows.map { case (x, y, z) => (x, y) -> z }.toMap
    assert(at((0L, 0L)) == 0L)
    assert(at((1L, 0L)) == 1L)
    assert(at((0L, 1L)) == 2L)
    assert(at((3L, 3L)) == 15L)
    assert(at((15L, 15L)) == 255L)
  }

  private def scanOutputRows(df: DataFrame): Long = {
    df.collect()
    df.queryExecution.executedPlan.collectLeaves().collect {
      case s: FileSourceScanExec => s.metrics("numOutputRows").value
    }.sum
  }

  test("z-sorted layout skips row groups a linear layout cannot") {
    val li = Tables(spark, sf).lineitem
    val tmp = java.nio.file.Files.createTempDirectory("zorder_spec").toString
    ZOrderLayout.writeZOrdered(li, s"$tmp/zsorted")
    // identical content, insertion-order layout, same file count
    li.select(
        (col("l_partkey") % 256).cast("long").as("px"),
        (col("l_suppkey") % 256).cast("long").as("py"),
        col("l_orderkey"), col("l_quantity"))
      .withColumn("z", ZOrderLayout.zValue(col("px"), col("py"), 8))
      .repartition(16)
      .write.parquet(s"$tmp/linear")

    def boxCount(path: String): (Long, Long) = {
      val df = spark.read.parquet(path)
        .filter(col("px") < 32 && col("py") < 32)
      (df.count(), scanOutputRows(
        spark.read.parquet(path).filter(col("px") < 32 && col("py") < 32)))
    }
    val (sortedHits, sortedScanned) = boxCount(s"$tmp/zsorted")
    val (linearHits, linearScanned) = boxCount(s"$tmp/linear")
    assert(sortedHits == linearHits, "layout must not change results")
    // the box covers (32/256)^2 ≈ 1.6% of the key space; the z layout
    // confines it to few row groups while the linear layout reads all
    assert(sortedScanned * 2 < linearScanned,
      s"z-sorted scanned $sortedScanned rows vs linear $linearScanned")
  }
}
