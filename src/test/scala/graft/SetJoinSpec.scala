package graft

import graft.operators.{Dedup, SetJoin}
import org.apache.spark.sql.functions._

/** SimHash hamming-join banding completeness and prefix-filter
  * completeness of the exact Jaccard self-join — each checked against
  * in-test brute force, independent of the DuckDB gate.
  */
class SetJoinSpec extends SparkSpec {
  import spark.implicits._

  test("simhashNearDup: banding recovers exactly the brute-force hamming ball") {
    // deterministic signature set with pairs at distances 0..5
    val base = 0x0F0F0F0F0F0FL
    val sigs = Seq(
      1L -> base,
      2L -> base, // d=0
      3L -> (base ^ 0x7L), // d=3
      4L -> (base ^ 0x1FL), // d=5 — excluded
      5L -> (base ^ (1L << 59)), // d=1, bit in the top band
      6L -> 0x0L,
    ).toDF("doc_id", "sh")
    val got = Dedup.simhashNearDup(sigs, maxHamming = 3)
      .as[(Long, Long, Int)].collect().toSet
    val rows = Seq(1L -> base, 2L -> base, 3L -> (base ^ 0x7L),
      4L -> (base ^ 0x1FL), 5L -> (base ^ (1L << 59)), 6L -> 0x0L)
    val brute = (for {
      (ia, sa) <- rows; (ib, sb) <- rows if ia < ib
      d = java.lang.Long.bitCount(sa ^ sb) if d <= 3
    } yield (ia, ib, d)).toSet
    assert(got == brute)
    assert(brute.contains((1L, 2L, 0)) && brute.contains((1L, 3L, 3))
      && brute.contains((1L, 5L, 1)))
  }

  test("jaccardSelfJoin: equals brute force over the fixture corpus") {
    val docs = Tables(spark, sf).documents.limit(60)
    val got = SetJoin.jaccardSelfJoin(docs, num = 4, den = 5)
      .as[(Long, Long, Long, Long)].collect().toSet
    val sets = docs
      .select(col("doc_id"), Dedup.shingles(col("text")).as("sh"))
      .as[(Long, Seq[String])].collect()
    val brute = (for {
      (ia, sa) <- sets; (ib, sb) <- sets if ia < ib
      inter = sa.toSet.intersect(sb.toSet).size
      uni = sa.toSet.union(sb.toSet).size
      if uni > 0 && 5 * inter >= 4 * uni
    } yield (ia, ib, inter.toLong, uni.toLong)).toSet
    assert(got == brute)
    assert(brute.nonEmpty) // the fixture plants near-dups; the test must see them
  }

  test("jaccardSelfJoin: empty-token docs never pair; identical docs always do") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon"),
      (2L, "alpha beta gamma delta epsilon"),
      (3L, ""), (4L, ""),
      (5L, "zeta eta theta iota kappa"),
    ).toDF("doc_id", "text")
    val got = SetJoin.jaccardSelfJoin(docs, num = 4, den = 5)
      .as[(Long, Long, Long, Long)].collect().toSet
    // docs 3/4 tokenize to [""] -> shingle [""], a NONEMPTY identical
    // set: they pair (uni=1). Only truly disjoint sets never pair.
    assert(got == Set((1L, 2L, 3L, 3L), (3L, 4L, 1L, 1L)))
  }

  test("crossCorpusNearDup: equals brute force; self-ids excluded, cross-id copies found") {
    val docs = Tables(spark, sf).documents.limit(80)
    val probes = docs.filter(col("doc_id") % 10 === 0)
    val got = Dedup.crossCorpusNearDup(docs, probes)
      .as[(Long, Long, Long, Long)].collect().toSet
    val sets = docs.select(col("doc_id"), Dedup.shingles(col("text")).as("sh"))
      .as[(Long, Seq[String])].collect()
    val probeIds = sets.map(_._1).filter(_ % 10 == 0).toSet
    val brute = (for {
      (pe, se) <- sets if probeIds.contains(pe)
      (pt, st) <- sets if pt != pe
      inter = se.toSet.intersect(st.toSet).size
      uni = se.toSet.union(st.toSet).size
      if 5 * inter >= 4 * uni
    } yield (pe, pt, inter.toLong, uni.toLong)).toSet
    assert(got == brute)
    assert(got.forall { case (e, t, _, _) => e != t })
  }

  test("hardNegatives: every returned neighbor has a different label than its probe") {
    val emb = Tables(spark, sf).embeddings
    val probes = emb.filter(col("vec_id") < 4)
      .select(col("vec_id").as("probe_id"), col("embedding").as("pvec"),
        col("label").as("plabel"))
    val labels = emb.select(col("vec_id"), col("label")).as[(Long, Int)].collect().toMap
    val got = operators.Knn.hardNegatives(emb, probes, k = 3)
      .as[(Long, Int, Long, Int, Double)].collect()
    assert(got.nonEmpty)
    got.foreach { case (pid, _, vid, lab, _) =>
      assert(vid != pid)
      assert(lab != labels(pid))
      assert(lab == labels(vid))
    }
    // ranks are 1..k per probe, scores non-increasing
    got.groupBy(_._1).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == (1 to sorted.length).toSeq)
      assert(sorted.map(_._5).toSeq == sorted.map(_._5).sortBy(-_).toSeq)
    }
  }

  test("q140 small-quantity revenue: matches the explicit two-pass computation") {
    val t = Tables(spark, sf)
    val avgQty = t.lineitem.groupBy("l_partkey").agg(avg("l_quantity").as("aq"))
      .as[(Long, Double)].collect().toMap
    val brandParts = t.part.filter(col("p_brand") === "Brand#1")
      .select("p_partkey").as[Long].collect().toSet
    val expect = t.lineitem.select("l_partkey", "l_quantity", "l_extendedprice")
      .as[(Long, Double, Double)].collect()
      .filter { case (pk, q, _) => brandParts.contains(pk) && q < 0.2 * avgQty(pk) }
    val row = run("q140_small_qty_revenue").collect().head
    assert(row.getAs[Long]("n_lines") == expect.length.toLong)
    if (expect.nonEmpty) {
      val sum = expect.map { case (_, _, p) => BigDecimal(p).setScale(2, BigDecimal.RoundingMode.HALF_UP) }.sum
      val want = (sum / 7).setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(row.getAs[Double]("avg_yearly") - want) < 0.02)
    }
  }
}
