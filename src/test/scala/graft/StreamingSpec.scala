package graft

import graft.streaming.StreamingEvents

/** M4: the watermarked streaming window aggregation must equal its
  * batch form (q24) over the bounded fixture.
  */
class StreamingSpec extends SparkSpec {

  test("streaming hourly counts ≡ batch q24 (Trigger.AvailableNow)") {
    val streamed = StreamingEvents.runToCompletion(spark, sf)
      .collect().map(_.toSeq).toSet
    val batch = run("q24_events_hourly")
      .collect().map(_.toSeq).toSet
    assert(streamed == batch)
    assert(batch.nonEmpty)
  }

  test("mapGroupsWithState per-user aggregates ≡ batch groupBy") {
    import org.apache.spark.sql.functions._
    val stateful = StreamingEvents.statefulUserCounts(spark, sf)
      .collect().map(_.toSeq).toSet
    val batch = Tables(spark, sf).events
      .groupBy("user_id")
      .agg(count(lit(1)).as("cnt"), round(sum("value"), 6).as("sum_value"))
      .collect().map(_.toSeq).toSet
    assert(stateful == batch)
    assert(batch.nonEmpty)
  }
}
