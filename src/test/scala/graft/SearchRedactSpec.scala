package graft

import graft.operators.{Ivf, Redact, Search}
import org.apache.spark.sql.functions._

/** q85 PII redaction, q86 inverted index, q87 TF-IDF, q88 SemDeDup —
  * semantics pinned on planted inputs where the fixture carries no
  * natural signal (no real PII, shared vocabulary, no engineered
  * duplicate vectors).
  */
class SearchRedactSpec extends SparkSpec {
  import spark.implicits._

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("redaction masks the planted email and phone spans exactly") {
    val df = Seq(("hello world", "srcx", 7L)).toDF("text", "source", "doc_id")
      .select(Redact.plantedText(col("text"), col("source"), col("doc_id"))
        .as("full"))
    val full = df.as[String].head()
    assert(full == "hello world contact srcx.7@example.com or tel +1-555-0007")
    val masked = df.select(Redact.redacted(col("full"))).as[String].head()
    assert(masked == "hello world contact [EMAIL] or tel [PHONE]")
  }

  test("redaction is a no-op on the clean fixture text (no false positives)") {
    val changed = Tables(spark, sf).documents
      .filter(Redact.redacted(col("text")) =!= col("text")).count()
    assert(changed == 0L)
  }

  test("every fixture doc gets exactly one email and one phone redaction") {
    val bad = run("q85_pii_redact")
      .filter(col("n_emails") =!= 1 || col("n_phones") =!= 1).count()
    assert(bad == 0L)
  }

  /** The q75-style chunk-digest combine: 60-bit md5 prefix, summed. */
  private def chunkHash(postings: String): BigInt =
    BigInt(md5Hex(postings).take(15), 16)

  test("inverted index: df, bounds and chunk-digest signature on a planted corpus") {
    val docs = Seq((1L, "a b a"), (2L, "b c"), (3L, "a"))
      .toDF("doc_id", "text")
    val got = Search.invertedIndex(docs).orderBy("term")
      .as[(String, Long, Long, Long, String)].collect().toSeq
    // all ids < PostingsChunk → one chunk per term; sig = that chunk's hash
    assert(got == Seq(
      ("a", 2L, 1L, 3L, chunkHash("1,3").toString),
      ("b", 2L, 1L, 2L, chunkHash("1,2").toString),
      ("c", 1L, 2L, 2L, chunkHash("2").toString),
    ))
  }

  test("inverted index: postings spanning chunks sum their per-chunk digests") {
    val b = Search.PostingsChunk.toLong
    // term x: ids {1, B-1} land in chunk 0, {B, 2B+5} in chunks 1 and 2 —
    // the signature is the order-free SUM of the three chunk digests
    val docs = Seq((1L, "x"), (b - 1, "x"), (b, "x"), (2 * b + 5, "x y"))
      .toDF("doc_id", "text")
    val got = Search.invertedIndex(docs).orderBy("term")
      .as[(String, Long, Long, Long, String)].collect().toSeq
    val xSig = chunkHash(s"1,${b - 1}") + chunkHash(s"$b") + chunkHash(s"${2 * b + 5}")
    assert(got == Seq(
      ("x", 4L, 1L, 2 * b + 5, xSig.toString),
      ("y", 1L, 2 * b + 5, 2 * b + 5, chunkHash(s"${2 * b + 5}").toString),
    ))
  }

  test("inverted index plan: every postings collect_list is chunk-bounded") {
    // the scale gate: no aggregation may assemble a term's FULL postings
    // list — any collect_list must sit under a (term, chunk) grouping
    val q = run("q86_inverted_index")
    val listAggs = q.queryExecution.optimizedPlan.collect {
      case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate
          if a.aggregateExpressions.exists(_.toString.contains("collect_list")) =>
        a.groupingExpressions.size
    }
    assert(listAggs.nonEmpty && listAggs.forall(_ == 2),
      s"collect_list grouping arities: $listAggs")
  }

  test("tfidf plan: the corpus-derived vocabulary is never broadcast") {
    val q = run("q87_tfidf_topterms")
    val hintedEquiJoins = q.queryExecution.optimizedPlan.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join
          if j.condition.isDefined =>
        j.hint.toString.toLowerCase.contains("broadcast")
    }
    assert(hintedEquiJoins.nonEmpty && hintedEquiJoins.forall(_ == false),
      s"equi-join broadcast hints: $hintedEquiJoins")
  }

  test("termLookup ranks docs by tf with doc_id tie-break and joins metadata") {
    val docs = Seq(
      (1L, "q q q pad"), (2L, "q"), (3L, "q q longer text here"),
      (4L, "none"), (5L, "q q"),
    ).toDF("doc_id", "text")
    val got = Search.termLookup(docs, term = "q", k = 3)
      .as[(Long, Long, Int)].collect().toSeq
    assert(got == Seq(
      (1L, 3L, 9),   // "q q q pad"
      (3L, 2L, 20),  // tf tie at 2 → doc_id 3 before 5
      (5L, 2L, 3),
    ))
  }

  test("staged token table equals the inline tokenize pass, row for row") {
    val staged = graft.sources.TokenizedCorpus.tokens(spark, sf)
      .select("doc_id", "pos", "term").as[(Long, Int, String)].collect().sorted.toSeq
    val inline = Search.tokenPositions(Tables(spark, sf).documentsRebalanced)
      .select("doc_id", "pos", "term").as[(Long, Int, String)].collect().sorted.toSeq
    assert(staged == inline)
    assert(staged.nonEmpty)
  }

  test("phraseSearchN counts n-term occurrences; overlapping and boundary cases") {
    val docs = Seq(
      (1L, "a b c a b c a b"),   // "a b c" at pos 0 and 3; trailing "a b" is not a hit
      (2L, "a b c"),             // exactly one
      (3L, "c b a"),             // reversed — no hit (order matters)
      (4L, "a b x c"),           // gap breaks adjacency
      (5L, "a a b c"),           // one hit starting at pos 1
    ).toDF("doc_id", "text")
    val got = Search.phraseSearchN(docs, Seq("a", "b", "c"))
      .as[(Long, Long)].collect().toSeq
    assert(got == Seq((1L, 2L), (2L, 1L), (5L, 1L)))
  }

  test("proximitySearch: band pairs and min distance; bucket join, no cartesian") {
    val docs = Seq(
      (1L, "x q q y"),       // |0-3| = 3 <= 3: one pair, dist 3
      (2L, "x q q q q y"),   // |0-5| = 5 > 3: no pair
      (3L, "y x y"),         // x at 1, y at {0,2}: two pairs, min dist 1
      (4L, "x q x q y"),     // x at {0,2}, y at 4: |2-4|=2 in, |0-4|=4 out
    ).toDF("doc_id", "text")
    val q = Search.proximitySearch(docs, "x", "y", w = 3)
    val got = q.as[(Long, Long, Int)].collect().toSeq
    assert(got == Seq((1L, 1L, 3), (3L, 2L, 1), (4L, 1L, 2)))
    val plan = q.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan.take(2000))
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(2000))
  }

  test("tfidf: scores and ranks on a planted corpus, df over the whole corpus") {
    // doc 2 is OUTSIDE docLimit but still contributes to df — the
    // corpus-wide-idf rule the operator documents.
    val docs = Seq((0L, "a a b"), (1L, "b c"), (2L, "c"))
      .toDF("doc_id", "text")
    val got = Search.tfidfTopTerms(docs, k = 3, docLimit = 2L)
      .as[(Long, Int, String, Long, Long, Double)].collect().toSeq
    def s(tf: Long, df: Long): Double =
      BigDecimal(tf * math.log(3.0 / df))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got == Seq(
      (0L, 1, "a", 2L, 1L, s(2, 1)), // 2·ln3  — rare term, high tf
      (0L, 2, "b", 1L, 2L, s(1, 2)), // ln(1.5)
      (1L, 1, "b", 1L, 2L, s(1, 2)), // tie with c → ascending term tiebreak
      (1L, 2, "c", 1L, 2L, s(1, 2)), // c: df=2 because doc 2 counts too
    ))
  }

  test("semanticDedup: keep-first within clusters, planted duplicates dropped") {
    // Two obvious clusters (init = the two smallest vec_ids): ids
    // 0/2/4 near (1,0,0,0), ids 1/3 at (0,0,1,0). Drops: 2 (dup of 0),
    // 4 (cos 0.8 to id 0), 3 (dup of 1); survivors are the smallest id
    // of each cluster — never dropped, by the keep-first rule.
    val emb = Seq(
      (0L, Array(1f, 0f, 0f, 0f)),
      (1L, Array(0f, 0f, 1f, 0f)),
      (2L, Array(1f, 0f, 0f, 0f)),
      (3L, Array(0f, 0f, 1f, 0f)),
      (4L, Array(0.8f, 0.6f, 0f, 0f)),
    ).toDF("vec_id", "embedding")
    val got = Ivf.semanticDedup(emb, threshold = 0.45, nClusters = 2, iters = 1)
      .as[(Int, Long, Long, Long)].collect().toSeq
    assert(got == Seq((0, 3L, 2L, 1L), (1, 2L, 1L, 1L)))
  }
  test("phraseSearch: adjacency in order, not co-occurrence") {
    val docs = Seq(
      (1L, "hash join is fast"),        // 1 hit
      (2L, "join hash"),                // reversed - no hit
      (3L, "hash and join"),            // not adjacent - no hit
      (4L, "hash join hash join"),      // 2 hits
      (5L, "HASH  JOIN"),               // case/whitespace-normalized hit
    ).toDF("doc_id", "text")
    val got = Search.phraseSearch(docs, "hash", "join")
      .as[(Long, Long)].collect().toSeq
    assert(got == Seq((1L, 1L), (4L, 2L), (5L, 1L)))
  }
}
