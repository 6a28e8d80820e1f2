package graft

import org.apache.spark.sql.functions._

/** Structural laws for the round-11 additions — the hash gate proves
  * engine=oracle; these pin that the operators MEASURE what they
  * claim (the q296 lesson: a green hash does not certify usefulness).
  */
class Round11Spec extends SparkSpec {
  import spark.implicits._

  test("q309: members score higher than non-members (the memorization signal)") {
    val rows = run("q309_min_k_membership")
      .select(col("member"), col("n_docs"), col("mean_mink"))
      .as[(Boolean, Long, Double)].collect()
    val mem = rows.filter(_._1)
    val non = rows.filterNot(_._1)
    assert(mem.nonEmpty && non.nonEmpty)
    def wmean(xs: Array[(Boolean, Long, Double)]) =
      xs.map(r => r._2 * r._3).sum / xs.map(_._2).sum
    val gap = wmean(mem) - wmean(non)
    // the add-one LM must assign its own training split materially
    // higher bottom-20% log-probs; measured ~0.66 nats at sf0.001
    assert(gap > 0.2, s"membership gap collapsed: $gap")
    // and the screen is not vacuous: both splits populated per source
    assert(rows.map(_._2).forall(_ > 0))
  }

  test("q310: MaxSim top-10 is a full, ordered, bounded ranking per probe") {
    val rows = run("q310_late_interaction")
      .select(col("q_id"), col("rank"), col("score"))
      .as[(Long, Int, Double)].collect()
    val byProbe = rows.groupBy(_._1)
    assert(byProbe.size == 5)
    byProbe.foreach { case (q, rs) =>
      assert(rs.map(_._2).sorted.toSeq == (1 to 10), s"probe $q ranks")
      val scores = rs.sortBy(_._2).map(_._3)
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b },
        s"probe $q not monotone")
      // 8 cosines each in [-1, 1]
      assert(scores.forall(s => s >= -8.0 && s <= 8.0))
    }
  }

  test("q311: dedup-with-expiry drops AND re-emits (never degenerates to distinct or passthrough)") {
    val emitted = run("q311_stream_dedup_expiry")
      .select(col("user_id"), col("tu")).as[(Long, Long)].collect()
    val users = emitted.map(_._1).distinct.length
    // a passthrough would emit every feed row (4/user here); a plain
    // distinct would emit exactly one per user; expiry-dedup sits
    // strictly between, and every user appears (first row always emits)
    val perUser = emitted.groupBy(_._1).view.mapValues(_.length)
    assert(perUser.values.forall(n => n >= 1))
    assert(emitted.length > users, "no re-emits: behaves like distinct")
    assert(perUser.values.exists(_ < 4), "no drops: behaves like passthrough")
    // re-emits are time-ordered within a user
    emitted.groupBy(_._1).foreach { case (_, rs) =>
      val ts = rs.map(_._2).sorted
      assert(ts.distinct.length == ts.length)
    }
  }

  test("q312: every pipeline stage bites (quota saturated, checksum in range)") {
    val rows = run("q312_curation_pipeline")
      .select(col("source"), col("n_docs"), col("checksum"))
      .as[(String, Long, Long)].collect()
    assert(rows.nonEmpty)
    // the quota stage must actually gate something somewhere, and no
    // source can exceed it
    assert(rows.forall(_._2 <= 50))
    assert(rows.forall(r => r._3 >= 0 && r._3 < 1000000007L))
  }

  test("q313/q314: rates live in their contracts and are non-degenerate") {
    val bleu = run("q313_self_bleu")
      .select(col("mean_bleu")).as[Double].collect()
    assert(bleu.nonEmpty && bleu.forall(b => b >= 0.0 && b <= 1.0))
    // the 31-token fixture vocabulary makes neighboring docs overlap:
    // a 0 everywhere would mean the clipping joins are broken
    assert(bleu.exists(_ > 0.0), "self-BLEU all zero — dead clipping")
    val acc = run("q314_spec_decode_accept")
      .select(col("accept_rate")).as[Double].collect()
    assert(acc.nonEmpty && acc.forall(a => a > 0.0 && a <= 1.0))
    // the trigram target must disagree with the bigram draft somewhere
    // (acceptance exactly 1.0 everywhere = the ratio never computed)
    assert(acc.exists(_ < 1.0), "acceptance saturated — dead ratio")
  }

  test("q315: the fitted scaling law learns (negative slope, decade gain in (0,1))") {
    val r = run("q315_scaling_fit").collect().head
    assert(r.getAs[Double]("slope") < 0.0, "more data did not reduce loss")
    val gain = r.getAs[Double]("decade_gain_frac")
    assert(gain > 0.0 && gain < 1.0, s"decade gain out of range: $gain")
    assert(r.getAs[Double]("pred_loss_10x") < r.getAs[Double]("loss_100"))
  }

  test("q316: consistent hashing moves keys ONLY to the new shard, ~1/(n+1) of them") {
    val rows = run("q316_consistent_ring").collect()
    assert(rows.length == 8)
    assert(rows.forall(_.getAs[Long]("n_moved_elsewhere") == 0L),
      "keys moved between OLD shards — not a consistent ring")
    val moved = rows.map(_.getAs[Long]("n_moved")).sum.toDouble
    val total = rows.map(_.getAs[Long]("n_docs")).sum.toDouble
    val frac = moved / total
    assert(frac > 0.0 && frac < 0.3, s"moved fraction $frac out of the ring contract")
  }

  test("q317: flow matrix conserves the q20 pair count") {
    val cells = run("q317_dup_flow_matrix")
      .select(col("n_pairs")).as[Long].collect()
    val pairs = run("q20_minhash_neardup").count()
    assert(cells.sum == pairs, s"${cells.sum} cells vs $pairs pairs")
    assert(cells.forall(_ > 0))
  }

  test("q318: dedup removes planted train dups and improves held-out log-prob") {
    val r = run("q318_dedup_ablation").collect().head
    assert(r.getAs[Long]("n_train_bigrams_raw") >
      r.getAs[Long]("n_train_bigrams_dedup"),
      "planted duplicates did not inflate the raw train set")
    assert(r.getAs[Double]("dedup_delta") > 0.0,
      "dedup did not improve held-out log-prob on the planted corpus")
  }

  test("q306/q308: exact-decimal max ties and the dormancy screen are non-vacuous") {
    val q15 = run("q306_tpch_q15").collect()
    assert(q15.nonEmpty, "no top supplier found")
    val q22 = run("q308_tpch_q22")
      .agg(sum("numcust")).as[Long].collect().head
    assert(q22 > 0, "dormant-rich screen found nobody — dead operator")
  }
}
