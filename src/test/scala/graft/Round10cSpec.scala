package graft

/** q272–q280 coverage beyond the oracle gate: the estimators satisfy
  * the structural laws their definitions promise (monotonicity,
  * conservation, bucket separation), not just cross-engine equality.
  */
class Round10cSpec extends SparkSpec {

  test("q272 ROUGE: unigram overlap dominates bigram, metrics in (0,1]") {
    val rows = run("q272_rouge_overlap").collect()
      .map(r => r.getAs[Int]("n") ->
        (r.getAs[Double]("mean_precision"), r.getAs[Double]("mean_recall"),
          r.getAs[Double]("mean_f1"))).toMap
    assert(rows.keySet === Set(1, 2))
    val (p1, r1, f1) = rows(1)
    val (p2, r2, f2) = rows(2)
    // dropping every other token wrecks bigrams far more than unigrams
    assert(r1 > r2, s"rouge-1 recall $r1 should beat rouge-2 $r2")
    assert(f1 > f2)
    // the candidate keeps ~half the reference span
    assert(r1 > 0.3 && r1 < 0.8, s"rouge-1 recall $r1")
    Seq(p1, r1, f1, p2, r2, f2).foreach(m => assert(m > 0.0 && m <= 1.0))
  }

  test("q273 pass@k: estimator is monotone in k and anchored at the rate") {
    val rows = run("q273_pass_at_k").collect()
      .map(r => r.getAs[Int]("k") ->
        (r.getAs[Long]("n_tasks"), r.getAs[Long]("sum_trials"),
          r.getAs[Long]("sum_successes"), r.getAs[Double]("mean_pass_at_k")))
      .toMap
    assert(rows.keySet === Set(1, 5, 10))
    val p1 = rows(1)._4; val p5 = rows(5)._4; val p10 = rows(10)._4
    assert(p1 < p5 && p5 < p10, s"pass@k must grow: $p1 $p5 $p10")
    // pass@1 is exactly the per-task mean success rate
    val (n1, trials, succ, _) = rows(1)
    assert(n1 > 0 && succ > 0 && succ < trials)
    assert(math.abs(p1 - succ.toDouble / trials) < 0.15)
  }

  test("q274 Kneser-Ney: finite negative scores, real held-out OOV") {
    val rows = run("q274_kneser_ney").collect()
    assert(rows.length === 20)
    rows.foreach { r =>
      val avg = r.getAs[Double]("avg_logprob")
      assert(avg < 0.0 && avg > -20.0, s"avg_logprob $avg out of range")
      assert(r.getAs[Long]("n_pairs") <= r.getAs[Long]("n_bigrams"))
    }
    // the floor exists because held-out pairs ARE unseen sometimes
    assert(rows.map(_.getAs[Long]("n_unseen_pairs")).sum > 0)
  }

  test("q275 buckets: terciles are separated and roughly balanced") {
    val rows = run("q275_perplexity_buckets").collect()
      .map(r => (r.getAs[String]("bucket"), r.getAs[Long]("n_docs"),
        r.getAs[Double]("mean_logprob")))
    val byBucket = rows.groupBy(_._1)
    assert(byBucket.keySet === Set("head", "middle", "tail"))
    val headMin = byBucket("head").map(_._3).min
    val tailMax = byBucket("tail").map(_._3).max
    assert(headMin > tailMax,
      s"head per-source means ($headMin) must clear tail ($tailMax)")
    val counts = byBucket.view.mapValues(_.map(_._2).sum).toMap
    val n = counts.values.sum.toDouble
    counts.values.foreach(c =>
      assert(c > 0.2 * n && c < 0.5 * n, s"bucket sizes $counts"))
  }

  test("q276 t-closeness: violations shrink as the threshold loosens") {
    val rows = run("q276_t_closeness").collect()
      .map(r => r.getAs[Int]("t_permille") ->
        (r.getAs[Long]("violating_classes"), r.getAs[Long]("violating_rows"),
          r.getAs[Double]("max_t"))).toMap
    assert(rows.keySet === Set(200, 300, 500))
    assert(rows(200)._1 >= rows(300)._1 && rows(300)._1 >= rows(500)._1)
    assert(rows(200)._2 >= rows(300)._2 && rows(300)._2 >= rows(500)._2)
    val maxT = rows(200)._3
    assert(maxT > 0.0 && maxT <= 1.0)
    // a class at max_t above a threshold implies at least one violation
    if (maxT > 0.2) assert(rows(200)._1 > 0)
  }

  test("q277 Bradley-Terry: wins conserve and strength tracks win rate") {
    val rows = run("q277_bradley_terry").collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("games"),
        r.getAs[Long]("wins"), r.getAs[Double]("strength")))
    assert(rows.length === 20)
    // every match contributes one win and two game slots
    assert(2 * rows.map(_._3).sum === rows.map(_._2).sum)
    rows.foreach { case (_, g, w, s) =>
      assert(w <= g); assert(s >= 0.0)
    }
    // normalization: strengths average to ~1
    assert(math.abs(rows.map(_._4).sum / rows.length - 1.0) < 0.01)
    val best = rows.maxBy(r => r._3.toDouble / r._2)
    val worst = rows.minBy(r => r._3.toDouble / r._2)
    assert(best._4 > worst._4,
      s"best win-rate ${best} must out-rank ${worst}")
  }

  test("q278 LOO: vocab partition is exact and deltas mirror quality") {
    val rows = run("q278_loo_source_value").collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("n_docs_other"),
        r.getAs[Double]("quality_delta"), r.getAs[Long]("loo_vocab"),
        r.getAs[Long]("vocab_lost")))
    assert(rows.length === 20)
    // loo_vocab + vocab_lost = total vocabulary, for EVERY source
    val totals = rows.map(r => r._4 + r._5).distinct
    assert(totals.length === 1, s"vocab conservation broke: $totals")
    // deltas are centered: removing every source cannot improve (or
    // worsen) the mean everywhere at once
    assert(rows.exists(_._3 >= 0.0) && rows.exists(_._3 <= 0.0))
  }

  test("q279 randomized response: estimates conserve mass and debias") {
    val rows = run("q279_randomized_response").collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[Long]("n_true"),
        r.getAs[Long]("n_obs"), r.getAs[Double]("n_est"),
        r.getAs[Double]("abs_err")))
    assert(rows.length === 5)
    val n = rows.map(_._2).sum
    assert(rows.map(_._3).sum === n)
    // Σ estimates = n exactly (closed-form inversion conserves mass)
    assert(math.abs(rows.map(_._4).sum - n) < 0.001)
    // the mechanism shrinks the DOMINANT class toward uniform by a
    // deterministic (1−p)(t_max − n/K) ≈ 23 docs here — debiasing must
    // recover it better than the raw observed count (the aggregate
    // comparison is NOT sound at this n: debiasing trades bias for
    // variance, and near-uniform classes have almost no bias to fix)
    val dom = rows.maxBy(_._2)
    assert(dom._5 < math.abs(dom._3.toDouble - dom._2),
      s"dominant class $dom: debiased error must beat raw shrinkage")
  }

  test("q281 epoch schedule: caps bind, budget conserves") {
    val rows = run("q281_epoch_schedule").collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("n_tokens"),
        r.getAs[Boolean]("capped"), r.getAs[Double]("epochs"),
        r.getAs[Long]("alloc_tokens")))
    assert(rows.length === 20)
    // the planted weight skew must make the cap REAL on both sides
    assert(rows.exists(_._3) && rows.exists(!_._3))
    rows.foreach { case (_, t, c, e, a) =>
      assert(e > 0.0 && e <= 4.0)
      if (c) { assert(e === 4.0); assert(a === 4 * t) }
    }
    // water-filling conserves the budget B = 3T (per-source rounding)
    val b = 3 * rows.map(_._2).sum
    assert(math.abs(rows.map(_._5).sum - b) <= rows.length,
      s"sum alloc ${rows.map(_._5).sum} vs budget $b")
  }

  test("q282 Good-Turing: adjusted counts discount the rare tail") {
    val rows = run("q282_good_turing").collect()
      .map(r => (r.getAs[Long]("r"), r.getAs[Long]("n_r"),
        r.getAs[Double]("r_star"), r.getAs[Double]("p0_unseen")))
    assert(rows.map(_._1).toSeq === Seq(1L, 2L, 3L, 4L, 5L))
    // Zipf tail: N_1 > N_2 > N_3
    val nr = rows.map(_._2)
    assert(nr(0) > nr(1) && nr(1) > nr(2), s"counts-of-counts $nr")
    // GT discounts singletons: r*(1) < 1
    assert(rows(0)._3 > 0.0 && rows(0)._3 < 1.0)
    val p0 = rows(0)._4
    assert(p0 > 0.0 && p0 < 0.5)
  }

  test("q283 watermark z-test: planted docs flag, natural docs do not") {
    val rows = run("q283_watermark_detect").collect()
      .map(r => (r.getAs[Boolean]("planted"), r.getAs[Long]("n_docs"),
        r.getAs[Double]("mean_z"), r.getAs[Double]("flagged_frac")))
    val planted = rows.filter(_._1)
    val natural = rows.filterNot(_._1)
    assert(planted.nonEmpty && natural.nonEmpty)
    // planted: z = sqrt(g) with g ~ half of >=10 tokens → all flagged
    assert(planted.forall(_._4 === 1.0), s"planted $planted")
    assert(planted.map(_._3).min > 2.0)
    // natural text hovers near zero
    assert(math.abs(natural.map(r => r._3 * r._2).sum /
      natural.map(_._2).sum) < 1.0)
    assert(natural.map(r => r._4 * r._2).sum / natural.map(_._2).sum < 0.2)
  }

  test("q284 rater reliability: weighted revote never hurts the best rater") {
    val rows = run("q284_rater_reliability").collect()
      .map(r => (r.getAs[Int]("rater"), r.getAs[Long]("n_docs"),
        r.getAs[Double]("pi_majority"), r.getAs[Double]("pi_weighted")))
    assert(rows.map(_._1).sorted.toSeq === Seq(1, 2, 3))
    rows.foreach { case (_, n, p1, p2) =>
      assert(n > 0); assert(p1 > 0.0 && p1 <= 1.0); assert(p2 > 0.0 && p2 <= 1.0)
    }
    // rater 1 (full classifier) is the most reliable of the three
    val byR = rows.map(r => r._1 -> r._3).toMap
    assert(byR(1) >= byR(2) && byR(1) >= byR(3), s"pi by rater $byR")
  }

  test("q285 InfoNCE: loss sits at the 9-way chance anchor") {
    val rows = run("q285_infonce_eval").collect()
      .map(r => (r.getAs[Long]("n_anchors"), r.getAs[Double]("mean_loss"),
        r.getAs[Double]("acc1")))
    assert(rows.length === 20)
    val n = rows.map(_._1).sum.toDouble
    val acc = rows.map(r => r._3 * r._1).sum / n
    val loss = rows.map(r => r._2 * r._1).sum / n
    // pooled byte vectors vs random embeddings: retrieval is chance
    // (1/9) and loss is near ln(9) ≈ 2.197 — the calibration a real
    // encoder must BEAT before the q280 gate means anything
    assert(acc > 0.02 && acc < 0.4, s"acc1 $acc")
    assert(loss > 1.0 && loss < 4.0, s"mean loss $loss")
  }

  test("q286 interpolation: held-out likelihood is concave in alpha") {
    val rows = run("q286_mix_interpolation").collect()
      .map(r => r.getAs[Int]("alpha_pct") -> r.getAs[Double]("avg_logprob"))
      .toMap
    assert(rows.keySet === Set(25, 50, 75))
    // mixture log-likelihood is concave in alpha: midpoint beats chord
    assert(rows(50) >= (rows(25) + rows(75)) / 2 - 1e-9,
      s"concavity broke: $rows")
    rows.values.foreach(v => assert(v < 0.0 && v > -20.0))
  }

  test("q287 prefix cache: savings are real and consistent") {
    val rows = run("q287_prefix_cache").collect()
      .map(r => (r.getAs[Long]("n_docs"), r.getAs[Long]("n_cached"),
        r.getAs[Long]("tokens_saved")))
    assert(rows.length === 20)
    rows.foreach { case (nd, nc, ts) =>
      assert(nc <= nd); assert(ts === 16 * nc)
    }
    // the fixture's exact-dup families guarantee shared prefixes exist
    assert(rows.map(_._2).sum > 0)
  }

  test("q288 TPC-H Q21: grouped quantifier form equals the semi/anti-join form") {
    val rows = run("q288_tpch_q21").collect()
      .map(r => (r.getAs[String]("s_name"), r.getAs[Long]("numwait")))
    assert(rows.nonEmpty && rows.forall(_._2 > 0))
    // the folded (n_supp >= 2 && n_late = 1) form must equal the
    // textbook EXISTS/NOT EXISTS via explicit semi + anti joins
    import org.apache.spark.sql.functions._
    val t = Tables(spark, sf)
    val lf = t.lineitem
      .join(t.orders.filter(col("o_orderstatus") === "F"),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("l_orderkey"), col("l_suppkey"),
        (col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAY"))
          .as("late"))
    val os = lf.groupBy("l_orderkey", "l_suppkey").agg(max("late").as("sl"))
    val lateS = os.filter(col("sl"))
    val other = os.select(col("l_orderkey"), col("l_suppkey").as("o_supp"))
    val withOther = lateS.join(other,
      lateS("l_orderkey") === other("l_orderkey")
        && col("l_suppkey") =!= col("o_supp"), "left_semi")
    val otherLate = lateS.select(col("l_orderkey"), col("l_suppkey").as("o_supp"))
    val alone = withOther.join(otherLate,
      withOther("l_orderkey") === otherLate("l_orderkey")
        && col("l_suppkey") =!= col("o_supp"), "left_anti")
    val expected = alone
      .join(t.supplier, col("s_suppkey") === col("l_suppkey"))
      .groupBy("s_name").agg(count(lit(1)).as("numwait"))
      .orderBy(col("numwait").desc, col("s_name")).limit(20)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(rows.toSeq === expected.toSeq)
  }

  test("q289 split skew: JS within [0, ln 2] and small for a hash split") {
    val rows = run("q289_split_skew").collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Double]("js")))
    assert(rows.length === 20)
    rows.foreach { case (s, js) =>
      assert(js >= 0.0 && js <= math.log(2.0) + 1e-9, s"$s js=$js")
    }
    // a hash split over same-distribution docs should sit well under
    // the ln 2 ceiling — a source NEAR the ceiling is the alarm the
    // audit exists to raise
    assert(rows.map(_._2).max < 0.5)
  }

  test("q290 attribution: credit conserves against unattributed purchases") {
    val rows = run("q290_attribution").collect()
    assert(rows.map(_.getAs[String]("touch_type")).sorted.toSeq
      === Seq("click", "view"))
    val nP = rows.head.getAs[Long]("n_purchases")
    val nU = rows.head.getAs[Long]("n_unattributed")
    val credit = rows.map(_.getAs[Double]("total_credit")).sum
    // every attributed purchase hands out exactly one unit of credit
    assert(math.abs(credit - (nP - nU)) < 0.01,
      s"credit $credit vs attributed ${nP - nU}")
  }

  test("q291 risk-coverage: coverage shrinks as the threshold rises") {
    val rows = run("q291_risk_coverage").collect()
      .map(r => (r.getAs[Int]("tau_pct"), r.getAs[Double]("coverage"),
        r.getAs[Double]("sel_accuracy")))
      .sortBy(_._1)
    assert(rows.map(_._1) === Seq(50, 60, 70, 80, 90))
    // τ = 0.5 covers everything (conf = max(p, 1−p) ≥ 0.5 always)
    assert(rows.head._2 === 1.0)
    rows.sliding(2).foreach { w =>
      assert(w(0)._2 >= w(1)._2, s"coverage must shrink: ${w(0)} -> ${w(1)}")
    }
    rows.foreach(r => assert(r._3 > 0.5 && r._3 <= 1.0))
  }

  test("q292 ESS: weights >= 1, ESS bounded by n, design effect sane") {
    val rows = run("q292_ess_weights").collect()
      .map(r => (r.getAs[Long]("n_kept"), r.getAs[Double]("sum_w"),
        r.getAs[Double]("ess"), r.getAs[Double]("ess_ratio")))
    assert(rows.nonEmpty)
    rows.foreach { case (n, sw, ess, ratio) =>
      assert(sw >= n - 0.01, s"w = 1e6/s6 >= 1 ⇒ Σw >= n ($sw vs $n)")
      assert(ess <= n + 0.01, s"ESS cannot exceed n ($ess vs $n)")
      // weights live in [1, 2] ⇒ the design effect stays mild
      assert(ratio > 0.8 && ratio <= 1.0, s"ess_ratio $ratio")
    }
  }

  test("q293 scaling curve: more train data means better held-out log-prob") {
    val rows = run("q293_scaling_curve").collect()
      .map(r => (r.getAs[Int]("fraction_pct"), r.getAs[Long]("n_train_bigrams"),
        r.getAs[Long]("n_eval_bigrams"), r.getAs[Double]("avg_logprob")))
      .sortBy(_._1)
    assert(rows.map(_._1) === Seq(25, 50, 100))
    // nested subsets: train volume strictly grows
    assert(rows(0)._2 < rows(1)._2 && rows(1)._2 < rows(2)._2)
    // held-out set is FIXED across fractions
    assert(rows.map(_._3).distinct.length === 1)
    // the scaling law: held-out log-prob improves with volume
    assert(rows(0)._4 < rows(1)._4 && rows(1)._4 < rows(2)._4,
      s"curve not monotone: ${rows.map(_._4).toSeq}")
  }

  test("q294 fair thresholds: post-hoc rates never exceed the global rate") {
    val rows = run("q294_fair_thresholds").collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[Double]("rate_before"),
        r.getAs[Double]("rate_after"), r.getAs[Double]("global_rate")))
    assert(rows.length === 5)
    val g = rows.head._4
    rows.foreach { case (l, _, after, _) =>
      assert(after <= g + 1e-6, s"$l rate_after $after exceeds global $g")
    }
    // parity post-processing must shrink the cross-lang spread
    val spreadBefore = rows.map(_._2).max - rows.map(_._2).min
    val spreadAfter = rows.map(_._3).max - rows.map(_._3).min
    assert(spreadAfter <= spreadBefore + 1e-6,
      s"spread grew: $spreadBefore -> $spreadAfter")
  }

  test("q295 best-of-n: expected max grows with n toward the ceiling") {
    val rows = run("q295_best_of_n").collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Int]("n"),
        r.getAs[Double]("e_max")))
    val byType = rows.groupBy(_._1)
    assert(byType.size === 5)
    byType.foreach { case (t, rs) =>
      val curve = rs.sortBy(_._2).map(_._3)
      curve.sliding(2).foreach { w =>
        assert(w(0) < w(1), s"$t: E[max] must grow in n: ${curve.toSeq}")
      }
    }
  }

  test("q296 Platt: recalibration actually repairs the reliability table") {
    val rows = run("q296_platt_scaling").collect()
      .map(r => (r.getAs[Int]("bin"), r.getAs[Double]("acc"),
        r.getAs[Double]("conf_before"), r.getAs[Double]("conf_after"),
        r.getAs[Double]("ece_before"), r.getAs[Double]("ece_after")))
    assert(rows.nonEmpty)
    val (eb, ea) = (rows.head._5, rows.head._6)
    assert(ea < eb - 0.05, s"ECE must drop materially: $eb -> $ea")
    // badly-miscalibrated bins (gap > 0.2) must improve; near-perfect
    // bins may give back a little (a sigmoid cannot hit exactly 0/1)
    rows.foreach { case (bin, acc, cb, ca, _, _) =>
      if (math.abs(cb - acc) > 0.2)
        assert(math.abs(ca - acc) < math.abs(cb - acc),
          s"bin $bin: conf moved away from acc ($cb -> $ca vs $acc)")
    }
  }

  test("q297 temperature sampling: lower tau flattens the distribution") {
    val rows = run("q297_temperature_sampling").collect()
      .map(r => (r.getAs[Int]("tau_pct"), r.getAs[String]("source"),
        r.getAs[Double]("share_before"), r.getAs[Double]("share_after")))
    val byTau = rows.groupBy(_._1)
    assert(byTau.keySet === Set(30, 70, 100))
    byTau.foreach { case (_, rs) =>
      assert(math.abs(rs.map(_._4).sum - 1.0) < 0.001)
    }
    // τ = 1 is the identity (up to rounding)
    byTau(100).foreach { case (_, s, before, after) =>
      assert(math.abs(after - before) < 0.001, s"$s: $before -> $after")
    }
    // flattening: the max share shrinks monotonically as τ drops
    def maxShare(t: Int) = byTau(t).map(_._4).max
    assert(maxShare(30) <= maxShare(70) + 1e-9)
    assert(maxShare(70) <= maxShare(100) + 1e-9)
  }

  test("q298 quality-length bias: rho in [-1, 1] and strongly positive") {
    val rows = run("q298_quality_length_bias").collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[Long]("n_docs"),
        r.getAs[Double]("spearman_rho")))
    assert(rows.length === 5)
    rows.foreach { case (l, n, rho) =>
      assert(n > 0)
      assert(rho >= -1.0 && rho <= 1.0, s"$l rho $rho")
    }
    // the quality score HAS a length term (0.4·min(tokens,100)/100 and
    // the n_chars window bonus) — the audit must expose that bias
    assert(rows.map(_._3).min > 0.2,
      s"expected a positive length bias: ${rows.toSeq}")
  }

  test("q299 canary audit: full extraction, zero cross-contamination") {
    val rows = run("q299_canary_extraction").collect()
      .map(r => (r.getAs[Long]("n_docs"), r.getAs[Long]("n_planted"),
        r.getAs[Long]("n_detected"), r.getAs[Long]("n_cross"),
        r.getAs[Double]("extraction_rate")))
    assert(rows.length === 20)
    assert(rows.map(_._2).sum > 0, "some canaries must be planted")
    rows.foreach { case (_, planted, detected, cross, rate) =>
      assert(cross === 0L, "clean corpus must have no cross detections")
      assert(detected === planted)
      if (planted > 0) assert(rate === 1.0)
    }
  }

  test("q280 alignment gate: sane fractions and full pairing") {
    val rows = run("q280_alignment_filter").collect()
      .map(r => (r.getAs[Long]("n_pairs"), r.getAs[Long]("n_kept"),
        r.getAs[Double]("kept_frac"), r.getAs[Double]("mean_score")))
    assert(rows.length === 20)
    rows.foreach { case (np, nk, kf, ms) =>
      assert(nk >= 0 && nk <= np)
      assert(kf >= 0.0 && kf <= 1.0)
      assert(ms >= -1.0 && ms <= 1.0)
    }
    // every doc with an embedding pairs exactly once
    assert(rows.map(_._1).sum === 500)
  }
}
