package graft

import graft.sources.Compaction
import org.apache.spark.sql.functions._

/** Compaction mechanics: the fragmented copy really is many files, the
  * compacted rewrite really is few, and content survives byte-for-byte
  * (the q83 gate proves the checksum; here we pin file counts and row
  * identity).
  */
class CompactionSpec extends SparkSpec {

  test("64 fragments compact to 4 files with identical rows") {
    val compacted = Compaction.compactedDocuments(spark, sf)
    assert(Compaction.dataFiles(Compaction.fragmentedPath(sf)).size == 64)
    assert(Compaction.dataFiles(Compaction.compactedPath(sf)).size == 4)
    val orig = Tables(spark, sf).documents
    assert(compacted.count() == orig.count())
    // row identity beyond the checksum: anti-joins empty in both directions
    assert(compacted.join(orig, Seq("doc_id"), "left_anti").count() == 0)
    assert(orig.join(compacted, Seq("doc_id"), "left_anti").count() == 0)
  }
}
