package graft

import org.apache.spark.sql.functions._

/** Reshaping semantics beyond the oracle rows: static pivot schema,
  * unpivot row algebra, cube grouping-set accounting.
  */
class ReshapeSpec extends SparkSpec {

  test("pivot output schema is static (explicit values, no distinct scan)") {
    val out = run("q64_pivot")
    assert(out.columns.toSeq == Seq("l_returnflag", "F", "O"))
    // wide totals must re-add to the plain groupBy totals
    val wide = out.collect().map(r =>
      (if (r.isNullAt(1)) 0.0 else r.getDouble(1)) +
        (if (r.isNullAt(2)) 0.0 else r.getDouble(2))).sum
    val plain = Tables(spark, sf).lineitem
      .agg(sum(col("l_quantity").cast("decimal(18,2)")).cast("double"))
      .head().getDouble(0)
    assert(math.abs(wide - plain) < 1e-6)
  }

  test("unpivot emits rows × value-columns, no shuffle before the aggregate") {
    val li = Tables(spark, sf).lineitem
    val melted = li.unpivot(
      Array(col("l_orderkey")),
      Array(col("l_quantity"), col("l_extendedprice"), col("l_discount"),
        col("l_tax")),
      "metric", "value")
    assert(melted.count() == li.count() * 4)
    // Expand is shuffle-free: the melted frame plans with zero exchanges
    assert(!melted.queryExecution.executedPlan.toString.contains("Exchange"))
  }

  test("cube emits all four grouping sets with consistent gids") {
    val out = run("q66_cube_grouping").collect()
    val byGid = out.groupBy(_.getLong(2)).view.mapValues(_.length).toMap
    val flags = Tables(spark, sf).lineitem.select("l_returnflag").distinct().count()
    val statuses = Tables(spark, sf).lineitem.select("l_linestatus").distinct().count()
    assert(byGid(3L) == 1) // grand total
    assert(byGid(1L) == flags) // per-returnflag subtotal (status rolled up)
    assert(byGid(2L) == statuses) // per-status subtotal
    val grand = out.find(_.getLong(2) == 3L).get.getLong(3)
    assert(grand == Tables(spark, sf).lineitem.count())
  }
}
