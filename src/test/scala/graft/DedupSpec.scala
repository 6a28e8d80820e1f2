package graft

import graft.operators.Dedup
import org.apache.spark.sql.functions._

/** Near-dup pipeline semantics: LSH candidates + exact verify must
  * equal brute-force exact Jaccard (the oracle relationship the driver
  * checks in SQL, asserted here engine-side on crafted data).
  */
class DedupSpec extends SparkSpec {
  import spark.implicits._

  test("nearDupPairs finds planted near-duplicates and no false positives") {
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu nu xi omicron pi rho sigma tau upsilon"
    val docs = Seq(
      (0L, base),
      (1L, base + " extra"),                       // near-dup of 0
      (2L, base.replace("alpha", "ALPHA2")),       // near-dup of 0 (one-token diff)
      (3L, "totally different words only here now man sun moon star"),
      (4L, "totally different words only here now man sun moon star"), // exact dup of 3
      (5L, (1 to 30).map(i => s"w$i").mkString(" ")),
    ).toDF("doc_id", "text")

    val got = Dedup.nearDupPairs(docs).select("doc_a", "doc_b")
      .as[(Long, Long)].collect().toSet

    // brute-force exact jaccard over word 3-gram shingles
    def sh(t: String): Set[String] = {
      val w = t.toLowerCase.trim.split("\\s+").toSeq
      (1 to math.max(1, w.size - 2)).map(i => w.slice(i - 1, i + 2).mkString(" ")).toSet
    }
    val texts = docs.as[(Long, String)].collect()
    val expect = (for {
      (ia, ta) <- texts; (ib, tb) <- texts if ia < ib
      i = sh(ta).intersect(sh(tb)).size
      u = sh(ta).union(sh(tb)).size
      if i * 5 >= u * 4
    } yield (ia, ib)).toSet

    assert(got == expect, s"got=$got expect=$expect")
    assert(expect.contains((3L, 4L)), "exact dup must be caught")
    assert(expect.exists { case (a, b) => a == 0L && (b == 1L || b == 2L) })
  }

  test("minhash LSH recall is exhaustive on the fixture near-dups (sf0.001)") {
    // Engine output (LSH candidates → exact verify) vs full brute force
    // on the real documents table: equality means 100% recall at the
    // declared threshold.
    val docs = Tables(spark, sf).documents
    val lsh = Dedup.nearDupPairs(docs).select("doc_a", "doc_b")
      .as[(Long, Long)].collect().toSet

    val shDf = docs.select(col("doc_id"), Dedup.shingles(col("text")).as("sh"))
    val a = shDf.select(col("doc_id").as("ia"), col("sh").as("sa"))
    val b = shDf.select(col("doc_id").as("ib"), col("sh").as("sb"))
    val brute = a.join(b, col("ia") < col("ib"))
      .select(col("ia"), col("ib"),
        size(array_intersect(col("sa"), col("sb"))).as("i"),
        (size(col("sa")) + size(col("sb")) - size(array_intersect(col("sa"), col("sb")))).as("u"))
      .filter(col("i") * 5 >= col("u") * 4)
      .select("ia", "ib").as[(Long, Long)].collect().toSet

    assert(lsh == brute)
    assert(brute.nonEmpty, "fixture should contain planted near-dups")
  }

  test("codegen minhash_sig equals the compositional transform/array_min form") {
    val docs = Tables(spark, sf).documents
    val fast = Dedup.minhashSignatures(docs)
      .select("doc_id", "sig").as[(Long, Seq[Long])].collect().toMap
    val slow = Dedup.minhashSignaturesCompositional(docs)
      .select("doc_id", "sig").as[(Long, Seq[Long])].collect().toMap
    assert(fast == slow)
    assert(fast.valuesIterator.next().size == 32)
  }

  test("exact dedup survivor is deterministic (min doc_id)") {
    val df = run("q15_dedup_survivors")
    val again = run("q15_dedup_survivors")
    assert(df.collect().toSeq == again.collect().toSeq)
  }

  test("connected components: driver union-find ≡ distributed min-label propagation") {
    val docs = Tables(spark, sf).documents
    val viaUnionFind = Dedup.nearDupGroups(docs).collect().toSeq
    val viaPropagation = Dedup.nearDupGroups(docs, smallGraphMax = -1L)
      .collect().toSeq // threshold -1 forces the distributed path
    assert(viaUnionFind == viaPropagation)
    assert(viaUnionFind.nonEmpty, "fixture should contain near-dup clusters")
  }

  test("full-corpus deterministic shuffle plans as a range-partitioned sort") {
    val docs = Tables(spark, sf).documents
    val shuffled = Dedup.deterministicShuffle(docs)
    // the scalable total-order shape: range partitioning, not a
    // single-partition global sort
    val plan = shuffled.queryExecution.executedPlan.toString.toLowerCase
    assert(plan.contains("rangepartitioning"), plan.take(1500))
    // reproducible: same permutation on rerun, and a true permutation
    val ids1 = shuffled.select("doc_id").collect().map(_.getLong(0)).toSeq
    val ids2 = Dedup.deterministicShuffle(docs)
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(ids1 == ids2)
    assert(ids1.sorted != ids1, "hash order should differ from id order")
    assert(ids1.toSet.size == ids1.size)
  }

  test("fold-in incremental dedup: increment 2 matches batch-1 history only via the fold-in") {
    val out = Dedup.foldingIncrementalNearDups(spark, sf).collect()
    assert(out.nonEmpty)
    assert(out.map(_.getInt(0)).toSet.subsetOf(Set(1, 2)))
    // the property q187 exists to certify: a batch-2 probe finding a
    // batch-1 historical doc (doc_id % 5 == 1) can only happen if
    // increment 1 was folded into the index before increment 2 probed
    assert(out.exists(r => r.getInt(0) == 2 && r.getLong(2) % 5 == 1),
      "no batch-2-vs-batch-1 pair: the fold-in did not take effect")
  }

  test("compacted probe reproduces the uncompacted increment exactly (q189 ≡ q187 batch 2)") {
    val folded = Dedup.foldingIncrementalNearDups(spark, sf)
      .filter(col("batch") === 2)
      .select("new_doc", "hist_doc", "inter", "uni")
      .as[(Long, Long, Long, Long)].collect().toSet
    val compacted = Dedup.compactedIncrementalProbe(spark, sf)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(folded == compacted)
    assert(compacted.nonEmpty)
  }

  test("clusterSurvivors keeps the longest member, min-id tiebreak") {
    val base = (1 to 40).map(i => s"tok$i").mkString(" ")
    val docs = Seq(
      (10L, base + " longer tail here", 300L), // near-dup of 11, longest
      (11L, base, 250L),
      (12L, base + " tail", 300L),             // same length as 10 -> min id wins
      (99L, "unrelated words entirely different corner", 50L),
    ).toDF("doc_id", "text", "n_chars")
    val out = Dedup.clusterSurvivors(docs)
      .as[(Long, Long, Long, Long)].collect().toSeq
    // one cluster {10,11,12}; survivor = max n_chars (300), tie -> min id = 10
    assert(out == Seq((10L, 10L, 3L, 300L)))
  }

  test("graphMetrics counts a planted triangle exactly once") {
    // K3 on {1,2,3} plus a pendant edge (3,4): 4 nodes, 4 edges,
    // 1 triangle, max degree 3
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L))
      .toDF("doc_a", "doc_b")
    val r = Dedup.graphMetrics(edges).head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      == ((4L, 4L, 1L, 3L)))
    // two disjoint edges: no triangle, degrees all 1
    val r2 = Dedup.graphMetrics(
      Seq((1L, 2L), (3L, 4L)).toDF("doc_a", "doc_b")).head
    assert((r2.getLong(0), r2.getLong(1), r2.getLong(2), r2.getLong(3))
      == ((4L, 2L, 0L, 1L)))
  }

  test("q223 agreement indices match a driver-side contingency recompute") {
    val r = run("q223_clustering_agreement").collect()(0)
    val t = Tables(spark, sf)
    import spark.implicits._
    val g1 = Dedup.nearDupGroups(t.documents)
      .as[(Long, Long)].collect().toMap
    val g2 = Dedup.groupsFromPairs(
        Dedup.simhashNearDup(Dedup.docsWithSimhash(t), 3)
          .select("doc_a", "doc_b"))
      .as[(Long, Long)].collect().toMap
    val ids = t.documents.select("doc_id").as[Long].collect()
    val lab = ids.map(d => (g1.getOrElse(d, d), g2.getOrElse(d, d)))
    def c2(x: Long) = x * (x - 1) / 2
    val i2 = lab.groupBy(identity).values.map(v => c2(v.size.toLong)).sum
    val a2 = lab.groupBy(_._1).values.map(v => c2(v.size.toLong)).sum
    val b2 = lab.groupBy(_._2).values.map(v => c2(v.size.toLong)).sum
    assert(r.getAs[Long]("n") === ids.length.toLong)
    assert(r.getAs[Long]("pairs_both") === i2)
    assert(r.getAs[Long]("pairs_1") === a2)
    assert(r.getAs[Long]("pairs_2") === b2)
    val np = ids.length.toDouble * (ids.length - 1) / 2.0
    val rand = 1.0 - (a2 + b2 - 2 * i2).toDouble / np
    val exp = a2.toDouble * b2 / np
    val ari = (i2 - exp) / ((a2 + b2) / 2.0 - exp)
    assert(math.abs(r.getAs[Double]("rand_index") - rand) < 1e-6)
    assert(math.abs(r.getAs[Double]("ari") - ari) < 1e-6)
    assert(r.getAs[Double]("ari") <= 1.0 && r.getAs[Double]("rand_index") <= 1.0)
  }

  test("q213 modularity: degrees sum to 2m, Q in [-1, 1], matches recompute") {
    val rows = run("q213_graph_modularity").collect()
    assert(rows.nonEmpty)
    val m = Dedup.nearDupPairs(Tables(spark, sf).documents).count()
    val intraTotal = rows.map(_.getAs[Long]("intra_edges")).sum
    val degTotal = rows.map(_.getAs[Long]("degree_sum")).sum
    assert(degTotal === 2 * m, s"degree sum $degTotal vs 2m=${2 * m}")
    assert(intraTotal <= m)
    val q = rows.map(_.getAs[Double]("contribution")).sum
    assert(q >= -1.0 && q <= 1.0, s"Q=$q")
    rows.foreach { r =>
      val expected = r.getAs[Long]("intra_edges").toDouble / m -
        math.pow(r.getAs[Long]("degree_sum").toDouble / (2.0 * m), 2)
      assert(math.abs(r.getAs[Double]("contribution") - expected) < 1e-6)
    }
  }
}
