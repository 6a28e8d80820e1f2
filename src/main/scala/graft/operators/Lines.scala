package graft.operators

import graft.{QueryEntry, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Line-level boilerplate removal — the CCNet/RefinedWeb cleanup pass
  * that runs BEFORE document-level dedup in a web-scale pipeline: the
  * same cookie banner / nav footer / subscribe prompt appears verbatim
  * on millions of pages, inflating near-dup scores and poisoning
  * n-gram statistics, so lines whose corpus-wide document frequency
  * crosses a threshold are dropped from every document while the
  * unique content stays.
  *
  * The synthetic fixture is one line per document with no shared
  * boilerplate, so the phenomenon is PLANTED (the q63/q85/q201
  * planted-input pattern): every document becomes a 4-line "page" —
  * its original text, a cookie line shared by doc_id % 3, a banner
  * line shared by doc_id % 7, and a `ref <doc_id>` line that is unique
  * by construction (so no document ever loses ALL lines — an empty
  * reconstruction would be '' in Spark's `concat_ws` but NULL in
  * DuckDB's `string_agg`). Both engines build the identical decorated
  * corpus, so a disagreement anywhere in the frequency pass, the
  * threshold, or the orderly reconstruction breaks the md5 hash.
  *
  * Scale shape: one posexplode to the line frame, one map-side-combined
  * (line → distinct-doc count) aggregation, one shuffle equi-join back
  * on the line value (the CCNet shard-by-line-hash layout — never a
  * driver-side frequent-line set, which is NOT model-bounded: at ≥10
  * docs per boilerplate line the distinct-frequent set can still be
  * corpus/10), then a per-doc `collect_list` bounded by document line
  * count. No windows, no collects.
  */
object Lines {

  /** Corpus-wide document-frequency threshold: a line present in at
    * least this many distinct documents is boilerplate.
    */
  val boilerplateDf = 10

  /** Decorated page corpus: (doc_id, page) with the three planted
    * lines appended — see class doc.
    */
  def decoratedPages(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      concat_ws("\n", col("text"),
        concat(lit("cookie notice "), pmod(col("doc_id"), lit(3))),
        concat(lit("subscribe banner "), pmod(col("doc_id"), lit(7))),
        concat(lit("ref "), col("doc_id"))).as("page"))

  /** DuckDB twin of [[decoratedPages]]: yields (doc_id, page). */
  // NOTE: no line may BEGIN with '||' — this snippet is interpolated
  // into outer stripMargin oracles, which would eat the first bar.
  val decoratedPagesSql: String =
    """SELECT doc_id,
      |       text || chr(10) || 'cookie notice ' || (doc_id % 3) ||
      |         chr(10) || 'subscribe banner ' || (doc_id % 7) ||
      |         chr(10) || 'ref ' || doc_id AS page
      |FROM documents""".stripMargin

  /** Per-document line-dedup report: kept/removed line counts plus the
    * md5 of the cleaned document (kept lines re-joined in original
    * order) — the reconstruction hash makes line ORDER part of the
    * contract, not just the counts.
    */
  def lineDedup(docs: DataFrame, minDf: Int = boilerplateDf): DataFrame = {
    val lines = decoratedPages(docs)
      .select(col("doc_id"), posexplode(split(col("page"), "\n")).as(Seq("pos", "line")))
    val freq = lines.groupBy("line")
      .agg(countDistinct(col("doc_id")).as("nd"))
    val bp = col("nd") >= minDf
    lines.join(freq, "line")
      .groupBy("doc_id")
      .agg(
        sum(when(bp, 0L).otherwise(1L)).as("kept_lines"),
        sum(when(bp, 1L).otherwise(0L)).as("removed_lines"),
        md5(concat_ws("\n",
          transform(
            array_sort(collect_list(when(!bp, struct(col("pos"), col("line"))))),
            r => r.getField("line")))).as("clean_md5"))
      .select(col("doc_id"),
        col("kept_lines").cast(LongType).as("kept_lines"),
        col("removed_lines").cast(LongType).as("removed_lines"),
        col("clean_md5"))
      .orderBy("doc_id")
  }

  val entries: Seq[QueryEntry] = Seq(
    // q230 — CCNet line-frequency boilerplate removal over the planted
    // page corpus. DuckDB re-derives the line frame, every line's
    // distinct-document frequency, the threshold split, and the
    // order-preserving reconstruction md5 per document.
    QueryEntry.sql(
      "q230_line_dedup",
      s"""WITH deco AS ($decoratedPagesSql
         |), ls AS (
         |  SELECT doc_id,
         |         generate_subscripts(str_split(page, chr(10)), 1) AS pos,
         |         unnest(str_split(page, chr(10))) AS line
         |  FROM deco
         |), freq AS (
         |  SELECT line, COUNT(DISTINCT doc_id) AS nd FROM ls GROUP BY 1
         |)
         |SELECT l.doc_id,
         |       CAST(SUM(CASE WHEN f.nd >= $boilerplateDf THEN 0 ELSE 1 END)
         |            AS BIGINT) AS kept_lines,
         |       CAST(SUM(CASE WHEN f.nd >= $boilerplateDf THEN 1 ELSE 0 END)
         |            AS BIGINT) AS removed_lines,
         |       md5(string_agg(CASE WHEN f.nd < $boilerplateDf THEN l.line END,
         |                      chr(10) ORDER BY l.pos)) AS clean_md5
         |FROM ls l JOIN freq f USING (line)
         |GROUP BY 1 ORDER BY 1""".stripMargin,
    ) { (s, dir) =>
      lineDedup(Tables(s, dir).documentsRebalanced)
    },
  )
}
