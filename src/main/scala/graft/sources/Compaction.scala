package graft.sources

import graft.operators.Checksum
import graft.{QueryEntry, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Small-file compaction — the table-maintenance operator every
  * long-lived 100 TB dataset needs: streaming ingest and fine-grained
  * partitioning leave tables as thousands of KB-scale files whose
  * per-file open/footer cost dominates scans; compaction rewrites them
  * into target-sized files with identical content.
  *
  * The operator is a read → `repartition(target)` → write (one
  * shuffle, fully parallel). Content preservation is certified the
  * honest way: the compacted copy's order-independent checksum
  * ([[Checksum]]) must equal the source's — which is exactly what the
  * q83 oracle checks from the ORIGINAL parquet table, so a hash match
  * proves the fragment+compact round-trip byte-preserved every
  * participating cell.
  */
object Compaction {

  private val FragmentFiles = 64
  private val CompactFiles = 4

  /** Generic compaction: rewrite `df` as `targetFiles` files at the
    * FRESH location `dest` and return the compacted frame. `dest` must
    * not already exist: compacting a table onto its own path would
    * race the read against the overwrite (Spark rejects the simple
    * case; a cached plan that hides the source relation would destroy
    * the only copy on a mid-write crash) — swap directories only after
    * this returns.
    */
  def compact(df: DataFrame, dest: String, targetFiles: Int): DataFrame = {
    require(!new java.io.File(dest).exists(),
      s"compaction destination must be a fresh location: $dest exists " +
        "(in-place compaction would race the read against the overwrite)")
    df.repartition(targetFiles).write.parquet(dest)
    df.sparkSession.read.parquet(dest)
  }

  /** Fragmented copy of documents (64 files), staged write-once. */
  def fragmentedPath(dir: String): String =
    Staging.fingerprintPath("graft_compact", dir, "documents.parquet",
      s"documents_frag$FragmentFiles")

  /** Compacted rewrite of the fragmented copy (4 files). */
  def compactedPath(dir: String): String =
    Staging.fingerprintPath("graft_compact", dir, "documents.parquet",
      s"documents_compact$CompactFiles")

  /** Stage fragment → compact, return the compacted frame. */
  def compactedDocuments(spark: SparkSession, dir: String): DataFrame = {
    val frag = fragmentedPath(dir)
    Staging.ensureStaged(frag) {
      Tables.load(spark, dir, "documents")
        .repartition(FragmentFiles)
        .write.mode("overwrite").parquet(frag)
    }
    val compact = compactedPath(dir)
    Staging.ensureStaged(compact) {
      spark.read.parquet(frag)
        .repartition(CompactFiles)
        .write.mode("overwrite").parquet(compact)
    }
    // memoized read: re-listing + schema inference per call was the
    // round-1 fixed per-query tax Tables.load eliminated
    OrcRoundTrip.memoRead(spark, compact)(spark.read.parquet(compact))
  }

  /** Parquet data files under a staged dir (excludes markers). */
  def dataFiles(path: String): Seq[java.io.File] =
    Option(new java.io.File(path).listFiles()).getOrElse(Array.empty)
      .filter(f => f.getName.endsWith(".parquet")).toSeq

  val entries: Seq[QueryEntry] = Seq(
    // Compaction preservation certificate: the checksum of the
    // twice-rewritten (fragmented then compacted) documents table,
    // oracled by the same checksum over the ORIGINAL table. File-count
    // mechanics (64 → 4) are asserted in CompactionSpec.
    QueryEntry.sql(
      "q83_compaction",
      """SELECT COUNT(*) AS n_rows,
        |       CAST(SUM(CAST(CAST('0x' || substr(md5(concat_ws('|',
        |             doc_id, lang, source, n_chars, text)), 1, 15)
        |           AS BIGINT) AS DECIMAL(38,0))) AS VARCHAR) AS checksum
        |FROM documents""".stripMargin,
    ) { (s, dir) =>
      Checksum.tableChecksum(compactedDocuments(s, dir),
        Seq(col("doc_id"), col("lang"), col("source"), col("n_chars"),
          col("text")))
    },
  )
}
