package graft.operators

import graft.{QueryEntry, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** CDC upsert (MERGE INTO semantics) as a pure Catalyst shape: one
  * keyed FULL OUTER join of the base snapshot against a change batch,
  * delta columns winning where present, with per-row action
  * provenance (insert / update / keep). Spark core has no MERGE
  * without a table format; this is the engine-level operator a
  * training-data pipeline runs to roll a corpus snapshot forward.
  *
  * Scale shape: one shuffle per side on the merge key (or zero against
  * bucketed layouts — see [[graft.sources.BucketedTables]]); no driver
  * state, no row-by-row lookups. Deletes compose as a follow-up
  * left_anti on a tombstone set (the q42 decontamination shape).
  */
object Cdc {

  /** Roll `base` forward by `delta` on `key`: delta rows win, base
    * rows without a delta survive, delta rows without a base insert.
    * Output = base schema + `action` column.
    */
  def upsert(base: DataFrame, delta: DataFrame, key: String): DataFrame = {
    val cols = base.columns
    require(delta.columns.sameElements(cols),
      s"delta schema ${delta.columns.toSeq} must match base ${cols.toSeq}")
    // "delta wins" keys off an explicit presence MARKER, not the delta
    // key column: a per-column coalesce would drop explicit NULL
    // updates, and keying off the delta key would erase the payload of
    // a NULL-keyed delta row (a legitimate insert under join-miss
    // semantics).
    val d = delta.select(
      cols.map(c => col(c).as(s"__d_$c")) :+ lit(1).as("__d_present"): _*)
    val joined = base.join(d, col(key) === col(s"__d_$key"), "full_outer")
    val merged = cols.map {
      case `key` => coalesce(col(key), col(s"__d_$key")).as(key)
      case c => when(col("__d_present").isNotNull, col(s"__d_$c"))
        .otherwise(col(c)).as(c)
    }
    val action = when(col(key).isNull && col("__d_present").isNotNull, "insert")
      .when(col("__d_present").isNull, "keep")
      .otherwise("update")
    joined.select(merged :+ action.as("action"): _*)
  }

  /** SCD2 history build — the warehouse-side complement of [[upsert]]:
    * from a change-event stream, produce validity intervals
    * [valid_from, valid_to) per key, collapsing consecutive no-change
    * events so each row is one distinct state (the type-2
    * slowly-changing-dimension shape). Two window passes over the SAME
    * (user_id) partitioning — one shuffle total: lag() drops
    * no-change events, lead() over the survivors closes each interval;
    * the open (current) state carries valid_to = NULL. Ties at equal
    * ts break by event_id in both engines.
    */
  def scd2History(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    events
      .select(col("user_id"), col("ts"), col("event_id"),
        floor(col("value")).cast(LongType).as("v"))
      .withColumn("prev", lag(col("v"), 1).over(w))
      .filter(col("prev").isNull || col("v") =!= col("prev"))
      .withColumn("valid_to_ts", lead(col("ts"), 1).over(w))
      .select(col("user_id"),
        unix_micros(col("ts")).as("valid_from"),
        unix_micros(col("valid_to_ts")).as("valid_to"),
        col("v"))
      .orderBy("user_id", "valid_from")
  }

  val entries: Seq[QueryEntry] = Seq(
    // q108 — SCD2 validity intervals over the events stream (state =
    // floor(value) so consecutive repeats exist to collapse); epoch-
    // microsecond interval bounds are integer-exact in both engines.
    QueryEntry.sql(
      "q108_scd2_history",
      """WITH base AS (
        |  SELECT user_id, ts, event_id, CAST(FLOOR(value) AS BIGINT) AS v
        |  FROM events
        |), changed AS (
        |  SELECT user_id, ts, event_id, v FROM (
        |    SELECT user_id, ts, event_id, v,
        |           lag(v) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |             AS prev
        |    FROM base) t
        |  WHERE prev IS NULL OR v <> prev
        |)
        |SELECT user_id,
        |       epoch_us(CAST(ts AS TIMESTAMP)) AS valid_from,
        |       epoch_us(CAST(lead(ts) OVER (PARTITION BY user_id
        |                ORDER BY ts, event_id) AS TIMESTAMP)) AS valid_to,
        |       v
        |FROM changed ORDER BY user_id, valid_from""".stripMargin,
    ) { (s, dir) => scd2History(Tables(s, dir).events) },
    // Deterministic change batch derived from orders: keys ≡ 0 (mod
    // 10) are price updates (+1.00), keys ≡ 1 are inserts (removed
    // from the base first). The merged snapshot is summarized per
    // action; the oracle restates the same merge as a FULL OUTER join.
    QueryEntry.sql(
      "q76_cdc_merge",
      """WITH base AS (
        |  SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey % 10 <> 1
        |), delta AS (
        |  SELECT o_orderkey,
        |         CAST(CAST(o_totalprice AS DECIMAL(18,2)) + CAST(1.00 AS DECIMAL(18,2))
        |              AS DOUBLE) AS o_totalprice
        |  FROM orders WHERE o_orderkey % 10 IN (0, 1)
        |), merged AS (
        |  SELECT COALESCE(b.o_orderkey, d.o_orderkey) AS k,
        |         CASE WHEN d.o_orderkey IS NOT NULL THEN d.o_totalprice
        |              ELSE b.o_totalprice END AS price,
        |         CASE WHEN b.o_orderkey IS NULL THEN 'insert'
        |              WHEN d.o_orderkey IS NULL THEN 'keep'
        |              ELSE 'update' END AS action
        |  FROM base b FULL OUTER JOIN delta d ON b.o_orderkey = d.o_orderkey
        |)
        |SELECT action, COUNT(*) AS cnt,
        |       CAST(SUM(CAST(price AS DECIMAL(18,2))) AS DOUBLE) AS total,
        |       MIN(k) AS min_key
        |FROM merged GROUP BY action ORDER BY action""".stripMargin,
    ) { (s, dir) =>
      val o = Tables(s, dir).orders.select("o_orderkey", "o_totalprice")
      val base = o.filter(col("o_orderkey") % 10 =!= 1)
      val delta = o.filter(col("o_orderkey") % 10 === 0 ||
          col("o_orderkey") % 10 === 1)
        .withColumn("o_totalprice",
          (col("o_totalprice").cast(DecimalType(18, 2)) +
            lit(BigDecimal("1.00")).cast(DecimalType(18, 2)))
            .cast(DoubleType))
      upsert(base, delta, "o_orderkey")
        .groupBy("action")
        .agg(
          count(lit(1)).as("cnt"),
          sum(col("o_totalprice").cast(DecimalType(18, 2)))
            .cast(DoubleType).as("total"),
          min("o_orderkey").as("min_key"),
        )
        .orderBy("action")
    },
  )
}
