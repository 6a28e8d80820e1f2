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

  test("lost catalog entry over staged files → re-registered, not rewritten") {
    BucketedTables.bucketedTable(spark, sf, "orders", "o_custkey")
    def names() = spark.catalog.listTables().collect().map(_.name)
      .filter(n => n.startsWith("graft_bucketed_") && n.contains("_orders_"))
    names().foreach(t => spark.sql(s"DROP TABLE $t"))
    // a metastore wipe with surviving files must come back as the SAME
    // bucketed external table, not a silent re-stage
    val again = BucketedTables.bucketedTable(spark, sf, "orders", "o_custkey")
    assert(again.count() == Tables(spark, sf).orders.count())
    val desc = spark.sql(s"DESCRIBE FORMATTED ${names().head}")
      .collect().map(r => s"${r.get(0)} ${r.get(1)}").mkString("\n")
    assert(desc.contains("Num Buckets"), desc)
    assert(desc.linesIterator.exists(l => l.contains("Num Buckets") && l.contains("8")), desc)
  }

  test("tune() re-asserts runtime confs after external drift") {
    spark.conf.set("spark.sql.orc.columnarReaderBatchSize", "4096")
    EngineSession.tune(spark)
    assert(spark.conf.get("spark.sql.orc.columnarReaderBatchSize") == "10000")
  }
}
