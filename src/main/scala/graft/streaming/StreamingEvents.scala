package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Structured Streaming slice (SURVEY §7.2 M4): the q24 tumbling-window
  * aggregation as a watermarked streaming query.
  *
  * The reference has no streaming (SURVEY §2.3); this is the declared
  * Tier C extension: event-time tumbling windows with a watermark bound
  * on state, which scales because state is partitioned by (window,
  * event_type) and expired by the watermark — no unbounded driver
  * state.
  */
object StreamingEvents {

  /** The streaming form of q24_events_hourly. `ts` arrives as raw
    * nanosecond longs (see Tables.events) and is converted before the
    * watermark is applied.
    */
  def hourlyCounts(spark: SparkSession, dir: String): DataFrame = {
    // The file streaming source requires a directory; the fixture is a
    // single parquet file — stage a copy under scratch once.
    val src = java.nio.file.Paths.get(s"$dir/events.parquet")
    val streamDir = java.nio.file.Paths.get(
      sys.props("java.io.tmpdir"), "graft_stream_src",
      dir.replaceAll("[^A-Za-z0-9.]", "_"))
    java.nio.file.Files.createDirectories(streamDir)
    val dest = streamDir.resolve("events.parquet")
    if (!java.nio.file.Files.exists(dest))
      java.nio.file.Files.copy(src, dest)
    val schema = spark.read.parquet(dest.toString).schema
    spark.readStream
      .schema(schema)
      .parquet(streamDir.toString)
      .withColumn("ts", graft.Tables.eventsTsFromNanos)
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour").as("win"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .select(
        date_format(col("win.start"), "yyyy-MM-dd HH:mm").as("w"),
        col("event_type"), col("cnt"),
      )
  }

  /** Run to completion over the (bounded) fixture with AvailableNow and
    * return the complete result — used by the batch-equivalence spec.
    */
  def runToCompletion(spark: SparkSession, dir: String): DataFrame = {
    val name = s"graft_stream_${System.identityHashCode(spark)}"
    val q = hourlyCounts(spark, dir).writeStream
      .format("memory")
      .queryName(name)
      .outputMode("complete")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(name).orderBy("w", "event_type")
  }
}
