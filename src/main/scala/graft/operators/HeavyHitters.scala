package graft.operators

import graft.{QueryEntry, Tables}
import graft.functions.GraftFunctions
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.DataFrame

/** Grouped heavy-hitter estimation via the native Misra–Gries
  * aggregate (`freq_sketch`, [[org.apache.spark.sql.graft.FreqSketch]]):
  * per-(group, task) state bounded by k counters no matter how many
  * rows stream past — the deterministic counter-based alternative to
  * count-min ([[CountMin]] is the hashed/randomized row of the same
  * sketch family; Misra–Gries gives one-sided error `true - N/(k+1) <=
  * est <= true` and needs no hash choices).
  *
  * Scale shape: ObjectHashAggregate with partial/final split — map
  * tasks each keep ≤ k counters per group, merge subtracts the
  * (k+1)-th largest (Agarwal PODS'12), so the shuffle carries at most
  * k (item, count) pairs per (group, map task). At 100 TB the state is
  * `groups x k`, never `groups x distinct_items`.
  *
  * The oracled query runs in the sketch's EXACTNESS regime (k=8 ≥ 5
  * distinct event types, so no decrement ever fires and estimates are
  * exact counts — differential-checkable); the lossy-regime error
  * bound is property-tested in HeavyHittersSpec instead, where SQL
  * cannot express the sketch.
  */
object HeavyHitters {

  /** Per-group heavy hitters: group → exploded (item, est) rows,
    * item-ordered within group.
    */
  def groupedHeavyHitters(df: DataFrame, groupCol: String, itemCol: String,
      k: Int): DataFrame =
    df.groupBy(col(groupCol).as("grp"))
      .agg(GraftFunctions.freqSketch(col(itemCol), k).as("sketch"))
      .select(col("grp"), explode(col("sketch")).as(Seq("item", "est_n")))
      .orderBy("grp", "item")

  def entries: Seq[QueryEntry] = Seq(
    // q136 — event-type heavy hitters per user-id bucket (16 buckets,
    // k=8 > 5 distinct types → exact regime; the oracle is the exact
    // GROUP BY the sketch must reproduce).
    QueryEntry.sql(
      "q136_heavy_hitters",
      """SELECT CAST(user_id % 16 AS BIGINT) AS grp, event_type AS item,
        |       COUNT(*) AS est_n
        |FROM events GROUP BY 1, 2 ORDER BY grp, item""".stripMargin,
    ) { (s, dir) =>
      groupedHeavyHitters(
        Tables(s, dir).events.withColumn("bucket", pmod(col("user_id"), lit(16)).cast(LongType)),
        "bucket", "event_type", k = 8)
    },
  )
}
