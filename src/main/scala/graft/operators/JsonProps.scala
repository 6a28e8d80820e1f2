package graft.operators

import graft.{QueryEntry, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.DataFrame

/** Semi-structured property extraction — pull typed fields out of a
  * JSON string column and aggregate on them, the everyday ingestion
  * shape for event streams whose payload schema outlives the table
  * schema (q31 writes rows TO json; this is the read side).
  *
  * Scale shape: `get_json_object` is a per-row codegen expression (no
  * UDF, no shuffle of its own); the aggregate after it is an ordinary
  * map-side-combined rollup on (type, bucket) — alphabet × 10 cells.
  * A malformed or missing key extracts NULL and lands in the NULL
  * bucket rather than failing the query (the PERMISSIVE stance of
  * q107, expression-level).
  */
object JsonProps {

  /** Per (event_type, k-decile) counts and value means, with `k`
    * extracted from the `props` JSON payload.
    */
  def propsBuckets(events: DataFrame): DataFrame =
    events
      .select(col("event_type"), col("value"),
        get_json_object(col("props"), "$.k").cast(IntegerType).as("k"))
      // floor, not plain cast: `/` is double division and Int cast
      // truncates toward zero, so a negative k would bucket to 0 where
      // the oracle's `//` (floor division) gives -1 — floor() matches
      // DuckDB for ALL inputs, not just the non-negative fixture
      .select(col("event_type"), col("value"),
        floor(col("k") / 10).cast(IntegerType).as("k_bucket"))
      .groupBy("event_type", "k_bucket")
      .agg(count(lit(1)).as("cnt"), round(avg("value"), 6).as("avg_value"))
      .orderBy("event_type", "k_bucket")

  val entries: Seq[QueryEntry] = Seq(
    // JSON property extraction + decile rollup; DuckDB re-extracts via
    // json_extract_string and must agree cell by cell.
    QueryEntry.sql(
      "q122_json_extract",
      """SELECT event_type,
        |       CAST(CAST(json_extract_string(props, '$.k') AS INTEGER) // 10
        |            AS INTEGER) AS k_bucket,
        |       COUNT(*) AS cnt,
        |       ROUND(AVG(value), 6) AS avg_value
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    ) { (s, dir) =>
      propsBuckets(Tables(s, dir).events)
    },

    // q225 — the VARIANT path (Spark 4's typed semi-structured
    // surface): props parsed ONCE into a variant, fields extracted
    // with variant_get — the shredding-friendly encoding that replaces
    // per-access get_json_object string re-parsing. Missing paths via
    // try_variant_get come back NULL, not an error; the rollup proves
    // parse + typed extract + null semantics against DuckDB's JSON
    // reading of the identical column.
    QueryEntry.sql(
      "q225_variant_extract",
      """SELECT event_type,
        |       COUNT(*) AS n,
        |       CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT))
        |            AS BIGINT) AS sum_k,
        |       CAST(MIN(CAST(json_extract_string(props, '$.k') AS BIGINT))
        |            AS BIGINT) AS min_k,
        |       CAST(MAX(CAST(json_extract_string(props, '$.k') AS BIGINT))
        |            AS BIGINT) AS max_k,
        |       CAST(COUNT(json_extract_string(props, '$.missing')) AS BIGINT)
        |         AS n_missing_field
        |FROM events GROUP BY 1 ORDER BY event_type""".stripMargin,
    ) { (s, dir) =>
      Tables(s, dir).events
        .select(col("event_type"),
          expr("variant_get(parse_json(props), '$.k', 'long')").as("k"),
          expr("try_variant_get(parse_json(props), '$.missing', 'string')")
            .as("miss"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          sum(col("k")).as("sum_k"),
          min(col("k")).as("min_k"),
          max(col("k")).as("max_k"),
          count(col("miss")).as("n_missing_field"))
        .orderBy("event_type")
    },
  )
}
