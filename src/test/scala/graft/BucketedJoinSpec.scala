package graft

import graft.sources.BucketedTables
import org.apache.spark.sql.functions._

/** The co-located join claim: bucketed layout removes the join-time
  * shuffle entirely.
  */
class BucketedJoinSpec extends SparkSpec {

  test("bucketed⨝bucketed join plans with zero shuffle exchanges") {
    val o = BucketedTables.bucketedTable(spark, sf, "orders", "o_custkey")
    val c = BucketedTables.bucketedTable(spark, sf, "customer", "c_custkey")
    val joined = o.hint("merge")
      .join(c, col("o_custkey") === col("c_custkey"))
      .select("o_orderkey", "c_mktsegment")
    joined.collect() // execute so AQE finalizes the plan
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), plan.take(2000))
    assert(!plan.contains("Exchange"), plan.take(2000))
    // and it is the same join result as the parquet sources
    val expected = Tables(spark, sf).orders
      .join(Tables(spark, sf).customer, col("o_custkey") === col("c_custkey"))
      .count()
    assert(joined.count() == expected)
  }
}
