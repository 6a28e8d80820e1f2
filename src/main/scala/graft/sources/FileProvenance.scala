package graft.sources

import graft.QueryEntry
import org.apache.spark.sql.functions._

/** Row-level file provenance via the hidden `_metadata` columns —
  * the lineage surface a curation pipeline uses to answer "which
  * ingest file did this row come from" without materializing a
  * provenance column at write time: Spark's file sources expose
  * `_metadata.file_name` / `file_path` / `file_size` / `row_index` on
  * demand, costing nothing when unselected.
  *
  * The entry reads the 4-file time-quartile events feed (a real
  * multi-file source) and rolls up per-file row counts and id ranges;
  * the oracle reads the SAME staged files through DuckDB's
  * `filename=true` — a dynamic oracle, because the staged path is
  * only known at run time (the q33 fitted-model pattern applied to a
  * path instead of a model).
  */
object FileProvenance {

  val entries: Seq[QueryEntry] = Seq(
    QueryEntry.dynamicSql("q224_file_provenance") { (spark, dir) =>
      val feed = graft.streaming.StreamingEvents.stagedTimeOrderedFeed(spark, dir)
      s"""SELECT regexp_extract(filename, '[^/]+$$') AS file_name,
         |       COUNT(*) AS n_rows,
         |       MIN(event_id) AS min_id, MAX(event_id) AS max_id
         |FROM read_parquet('$feed/*.parquet', filename=true)
         |GROUP BY 1 ORDER BY file_name""".stripMargin
    } { (spark, dir) =>
      val feed = graft.streaming.StreamingEvents.stagedTimeOrderedFeed(spark, dir)
      spark.read.parquet(feed)
        .select(col("_metadata.file_name").as("file_name"), col("event_id"))
        .groupBy("file_name")
        .agg(count(lit(1)).as("n_rows"),
          min(col("event_id")).as("min_id"),
          max(col("event_id")).as("max_id"))
        .orderBy("file_name")
    },
  )
}
