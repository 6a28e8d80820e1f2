package graft

import org.apache.spark.sql.functions._

/** Tier A/B semantics: the reference dataflow invariants
  * (`reader.cc:60-63,104-144,156-160`) generalized to Spark plans.
  */
class RelationalSpec extends SparkSpec {

  test("q01 equals a directly-computed sum (A7/A8)") {
    val expected = spark.read.parquet(s"$sf/lineitem.parquet")
      .agg(sum("l_orderkey")).head.getLong(0)
    assert(run("q01_sum_first_col").head.getLong(0) == expected)
  }

  test("aggregation result is partitioning-invariant (A2/A8, reader.cc:110)") {
    // The reference's invariant: thread/stripe placement never changes
    // the sum. Spark form: any repartitioning yields the same result.
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val base = li.agg(sum("l_orderkey")).head.getLong(0)
    for (n <- Seq(1, 3, 17)) {
      assert(li.repartition(n).agg(sum("l_orderkey")).head.getLong(0) == base)
    }
  }

  test("q02 null semantics (A6): injected nulls are uncounted") {
    val r = run("q02_count_sum_nulls").head
    val cntAll = r.getAs[Long]("cnt_all")
    val cntQty = r.getAs[Long]("cnt_qty")
    assert(cntQty < cntAll, "NULLIF must produce some nulls on fixture data")
  }

  test("q31 manual JSON serialization equals Spark's to_json") {
    // The oracled q31 spells the JSON out field-by-field; it must stay
    // in lockstep with Spark's own row-to-text rendering of the table.
    val manual = run("q31_row_to_json").select("js").collect().map(_.getString(0))
    val builtin = Tables(spark, sf).nation
      .select(col("n_nationkey"), to_json(struct(col("*"))).as("js"))
      .orderBy("n_nationkey").select("js").collect().map(_.getString(0))
    assert(manual.sameElements(builtin), s"${manual.head} vs ${builtin.head}")
  }

  test("q07 emits at most rank 3 (plus ties) per status group") {
    val df = run("q07_window_topk")
    assert(df.filter(col("r") > 3).count() == 0)
    assert(df.groupBy("o_orderstatus").count().filter(col("count") < 3).count() == 0)
  }

  test("q06 plan broadcasts both dimension tables") {
    val plan = run("q06_join_revenue_by_nation").queryExecution.executedPlan.toString
    assert("BroadcastHashJoin".r.findAllIn(plan).size >= 2, plan.take(2000))
  }

  test("q03 filter is pushed down to the parquet scan") {
    val plan = run("q03_filter_revenue").queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(l_shipdate), LessThan(l_shipdate"), plan.take(2000))
  }

  test("TPC-H shapes: filters pushed, dims broadcast, top-k via TakeOrdered") {
    val p3 = run("q219_tpch_q3").queryExecution.executedPlan.toString
    assert(p3.contains("BroadcastHashJoin"), "q3: filtered customers must broadcast")
    assert(p3.contains("TakeOrderedAndProject"), "q3: top-10 must not global-sort")
    assert(p3.contains("EqualTo(c_mktsegment,BUILDING)"), "q3: segment filter must push")
    val p5 = run("q220_tpch_q5").queryExecution.executedPlan.toString
    assert(p5.contains("BroadcastHashJoin"), "q5: nation/region must broadcast")
    assert(p5.contains("GreaterThanOrEqual(o_orderdate"), "q5: date filter must push")
    val p10 = run("q221_tpch_q10").queryExecution.executedPlan.toString
    assert(p10.contains("EqualTo(l_returnflag,R)"), "q10: returnflag must push")
    assert(p10.contains("TakeOrderedAndProject"), "q10: top-20 must not global-sort")
  }
}
