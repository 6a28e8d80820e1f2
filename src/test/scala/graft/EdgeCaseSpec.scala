package graft

import graft.operators.{Dedup, Similarity}
import org.apache.spark.sql.functions._

/** Operators must degrade to empty results — not errors — on empty or
  * non-matching inputs (an empty partition is routine at 100 TB).
  */
class EdgeCaseSpec extends SparkSpec {
  import spark.implicits._

  test("nearDupPairs on empty and singleton inputs") {
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(Dedup.nearDupPairs(empty).count() == 0)
    val one = Seq((1L, "only one document here")).toDF("doc_id", "text")
    assert(Dedup.nearDupPairs(one).count() == 0)
  }

  test("topKCosine with a missing query vector yields empty") {
    val emb = Tables(spark, sf).embeddings
    assert(Similarity.topKCosine(emb, queryVecId = -1, k = 5).count() == 0)
  }

  test("engine dedupExact on empty input") {
    val engine = new GraftEngine(spark)
    val empty = Seq.empty[(Long, String)].toDF("id", "key")
    assert(engine.dedupExact(empty, Seq("key"), "id").count() == 0)
  }

  test("shingles of single-token and empty-ish text are well-formed") {
    val df = Seq((1L, "word"), (2L, "two words"), (3L, "a b c d")).toDF("doc_id", "text")
    val sh = df.select(col("doc_id"), Dedup.shingles(col("text")).as("s"))
      .as[(Long, Seq[String])].collect().toMap
    assert(sh(1L) == Seq("word"))
    assert(sh(2L) == Seq("two words"))
    assert(sh(3L) == Seq("a b c", "b c d"))
  }
}
