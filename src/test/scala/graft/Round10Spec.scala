package graft

import org.apache.spark.sql.functions._

/** q250–q256 coverage beyond the oracle gate: the trained models
  * actually LEARN (not just hash-match), the truncation sweep is
  * monotone, fertility separates scripts, and the audits satisfy
  * their structural invariants.
  */
class Round10Spec extends SparkSpec {

  test("q250 logreg: training separates clean docs from corrupted twins") {
    val rows = run("q250_quality_logreg").collect()
      .map(r => r.getAs[Int]("label") ->
        (r.getAs[Long]("n_docs"), r.getAs[Double]("mean_score"),
          r.getAs[Long]("n_kept"))).toMap
    assert(rows.keySet === Set(0, 1))
    val (nClean, meanClean, keptClean) = rows(1)
    val (nBad, meanBad, keptBad) = rows(0)
    assert(nClean > nBad && nBad > 0)
    // after 3 GD steps the corrupted class must score clearly lower
    assert(meanClean > meanBad + 0.2,
      s"clean mean $meanClean vs corrupted mean $meanBad")
    // the 0.5 gate keeps most clean docs and drops most corrupted ones
    assert(keptClean * 2 > nClean, s"kept $keptClean of $nClean clean")
    assert(keptBad * 2 < nBad, s"kept $keptBad of $nBad corrupted")
  }

  test("q250 weights: engine fit matches a driver-side recompute") {
    val feats = operators.Classify
      .logregFeatures(operators.Classify.corpusWithCorruptions(
        Tables(spark, sf).documents))
      .select("y", "x1", "x2", "x3")
      .collect().map(r => (r.getDouble(0), r.getDouble(1), r.getDouble(2),
        r.getDouble(3)))
    val n = feats.length.toDouble
    val w = Array(0.0, 0.0, 0.0, 0.0)
    for (_ <- 1 to 3) {
      val g = Array(0L, 0L, 0L, 0L)
      feats.foreach { case (y, x1, x2, x3) =>
        val z = w(0) + w(1) * x1 + w(2) * x2 + w(3) * x3
        val r = y - 1.0 / (1.0 + math.exp(-z))
        Seq(1.0, x1, x2, x3).zipWithIndex.foreach { case (x, j) =>
          g(j) += BigDecimal(r * x * 1e7)
            .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
        }
      }
      for (j <- 0 to 3)
        w(j) = BigDecimal(w(j) + 2.0 * (g(j).toDouble / 1e7 / n))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val engineW = operators.Classify.logregFit(
      operators.Classify.logregFeatures(
        operators.Classify.corpusWithCorruptions(Tables(spark, sf).documents)))
    assert(engineW.toSeq === w.toSeq)
  }

  test("q251 NB lang-ID: diagonal dominates every row of the confusion matrix") {
    val rows = run("q251_nb_langid").collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[String]("pred"),
        r.getAs[Long]("n")))
    val byLang = rows.groupBy(_._1)
    byLang.foreach { case (lang, preds) =>
      val diag = preds.collectFirst { case (_, p, n) if p == lang => n }
        .getOrElse(0L)
      val off = preds.collect { case (_, p, n) if p != lang => n }.sum
      assert(diag > off,
        s"$lang: diagonal $diag must beat off-diagonal $off " +
          "(resubstitution NB on char bigrams)")
    }
  }

  test("q252 MRL: agreement is monotone in dim and perfect at full dim") {
    val rows = run("q252_mrl_truncation").collect()
      .map(r => (r.getAs[Int]("dim"), r.getAs[Long]("n_probes"),
        r.getAs[Long]("n_agree"), r.getAs[Double]("mean_best_cos")))
      .sortBy(_._1)
    assert(rows.map(_._1).toSeq === Seq(8, 16, 32, 64))
    val probes = rows.head._2
    assert(rows.forall(_._2 == probes))
    // full dim agrees with itself by construction; truncation can only
    // lose agreement (NOTE: mean best COS is *higher* at low dims —
    // short random prefixes align more easily — so cos is not monotone,
    // only agreement is meaningful)
    assert(rows.last._3 === probes)
    rows.foreach { case (dim, _, agree, cos) =>
      assert(agree >= 0 && agree <= probes, s"dim $dim agree $agree")
      assert(cos >= -1.0 - 1e-9 && cos <= 1.0 + 1e-9, s"dim $dim cos $cos")
    }
    assert(rows.head._3 < probes,
      "8-dim truncation should lose at least one top-1 on this fixture")
  }

  test("q253 fertility: CJK fragments harder than Latin; sums positive") {
    val rows = run("q253_tokenizer_fertility").collect()
      .map(r => r.getAs[String]("lang") ->
        (r.getAs[Double]("fertility"), r.getAs[Double]("bytes_per_subtoken")))
      .toMap
    rows.values.foreach { case (f, b) => assert(f > 0 && b > 0) }
    assert(rows("zh")._1 > rows("en")._1,
      s"zh fertility ${rows("zh")._1} must exceed en ${rows("en")._1}")
  }

  test("q254 TPC-H Q18: every order exceeds the quantity threshold") {
    val rows = run("q254_tpch_q18").collect()
    assert(rows.nonEmpty && rows.length <= 100)
    rows.foreach(r => assert(r.getAs[Double]("total_qty") > 300.0))
    val prices = rows.map(_.getAs[Double]("o_totalprice")).toSeq
    assert(prices === prices.sortBy(-_), "descending by totalprice")
  }

  test("q255 block dedup: invariants and cross-check against raw sizes") {
    val rows = run("q255_block_dedup").collect()
    assert(rows.nonEmpty)
    var total = 0L
    rows.foreach { r =>
      val (t, d, sh) = (r.getAs[Long]("total_blocks"),
        r.getAs[Long]("distinct_blocks"), r.getAs[Long]("shared_blocks"))
      assert(t >= d && d >= sh && sh >= 0)
      val ratio = r.getAs[Double]("dedup_ratio")
      assert(ratio > 0.0 && ratio <= 1.0)
      total += t
    }
    // total block count == sum over docs of ceil(bytes/32)
    val expect = Tables(spark, sf).documents
      .select(sum(ceil(octet_length(col("text")) / lit(32.0))))
      .collect()(0).getAs[Any](0).toString.toDouble.toLong
    assert(total === expect, s"blocks $total vs ceil-sum $expect")
  }

  test("q257 streaming quality filter: stream ≡ batch; the drop gate fires") {
    val streamed = run("q257_stream_quality_filter").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("s6"))).toSeq
    assert(streamed.nonEmpty)
    streamed.foreach { case (_, s6) => assert(s6 >= 500000L) }
    val w = operators.Classify.fittedWeights(spark, sf)
    val mixed = operators.Classify
      .corpusWithCorruptions(Tables(spark, sf).documents).drop("y")
    val batch = operators.Classify.scoreDocs(mixed, w)
      .filter(col("s6") >= 500000L)
      .orderBy("doc_id")
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("s6"))).toSeq
    assert(streamed === batch,
      "micro-batched scoring must equal the one-shot batch scoring")
    // the gate actually DROPS rows: fewer keepers than mixed-feed rows
    assert(streamed.length < mixed.count(),
      "some planted twins must be rejected by the 0.5 gate")
  }

  test("q258 calibration: bins bounded, volumes conserve, top bin cleanest") {
    val rows = run("q258_model_calibration").collect()
      .map(r => (r.getAs[Int]("bin"), r.getAs[Long]("n"),
        r.getAs[Double]("mean_pred"), r.getAs[Double]("frac_clean")))
      .sortBy(_._1)
    assert(rows.nonEmpty)
    rows.foreach { case (bin, n, mp, fc) =>
      assert(bin >= 0 && bin <= 9 && n > 0)
      assert(mp >= bin * 0.1 - 1e-6 && mp <= (bin + 1) * 0.1 + 1e-6 ||
        bin == 9 && mp <= 1.0 + 1e-6, s"bin $bin mean_pred $mp")
      assert(fc >= 0.0 && fc <= 1.0)
    }
    val total = rows.map(_._2).sum
    val docs = Tables(spark, sf).documents.count()
    val twins = Tables(spark, sf).documents
      .filter(pmod(col("doc_id"), lit(3)) === 0).count()
    assert(total === docs + twins,
      s"bin volumes $total must conserve the corpus+twins size")
    // the model is calibrated in direction: the top-scoring bin is
    // cleaner than the bottom-scoring bin
    assert(rows.last._4 > rows.head._4,
      s"top bin frac_clean ${rows.last._4} vs bottom ${rows.head._4}")
  }

  test("q259 b-bit minhash: estimator tracks exact Jaccard on every pair") {
    val rows = run("q259_bbit_minhash").collect()
      .map(r => (r.getAs[Double]("exact_j"), r.getAs[Int]("matched"),
        r.getAs[Double]("est_j")))
    assert(rows.nonEmpty)
    rows.foreach { case (ex, m, est) =>
      assert(m >= 0 && m <= 32)
      assert(math.abs(est - (m - 2.0) / 30.0) < 1e-6)
      // 32 perms at b=4: sd(Ê) ≈ 0.09 ⇒ 4.5σ envelope per pair
      assert(math.abs(est - ex) < 0.45,
        s"estimate $est too far from exact $ex")
      assert(ex >= 0.5 - 1e-9, "pair set is the τ ≥ 1/2 exact join")
    }
    val mae = rows.map(r => math.abs(r._3 - r._1)).sum / rows.length
    assert(mae < 0.12, s"mean abs error $mae — sketch must track Jaccard")
  }

  test("q260 k-center coreset: matches a brute-force greedy recompute") {
    val rows = run("q260_kcenter_coreset").collect()
      .map(r => (r.getAs[Int]("rank"), r.getAs[Long]("vec_id"),
        r.getAs[Double]("max_cos"))).sortBy(_._1)
    assert(rows.map(_._1).toSeq === (1 to 8))
    // coverage tightens monotonically: each pick's max-cos-to-chosen
    // can only grow as the chosen set densifies
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(b._3 >= a._3 - 1e-9, s"rank ${b._1} cos ${b._3} < ${a._3}")
    }
    assert(rows.map(_._2).distinct.length === 8, "picks must be distinct")
    // driver-side greedy replay on the raw vectors
    val vecs = Tables(spark, sf).embeddings
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def cos6(a: Array[Float], b: Array[Float]): Long = {
      var i = 0; var dot = 0.0; var na = 0.0; var nb = 0.0
      while (i < a.length) {
        dot += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i).toDouble
        nb += b(i).toDouble * b(i).toDouble
        i += 1
      }
      // the exact CosineSimF32 arithmetic: dot / sqrt(na * nb)
      BigDecimal(dot / math.sqrt(na * nb) * 1e6)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    }
    var chosen = Vector(0L)
    val replay = (1 to 8).map { r =>
      val best = vecs.keys.filterNot(chosen.contains).toSeq
        .map(v => (chosen.map(c => cos6(vecs(v), vecs(c))).max, v))
        .minBy(identity)
      chosen :+= best._2
      (r, best._2, best._1.toDouble / 1e6)
    }
    assert(rows.toSeq === replay)
  }

  test("q261 k-core: matches a driver-side peel replay; cores nest") {
    val rows = run("q261_kcore").collect()
      .map(r => (r.getAs[Int]("k"), r.getAs[Long]("n_core_nodes"),
        r.getAs[Long]("n_core_edges"))).sortBy(_._1)
    assert(rows.map(_._1).toSeq === Seq(2, 3))
    // nesting: the 3-core is contained in the 2-core
    assert(rows(1)._2 <= rows(0)._2 && rows(1)._3 <= rows(0)._3)
    // driver-side peel to fixpoint on the exact pair set
    val pairs = operators.SetJoin
      .jaccardSelfJoin(Tables(spark, sf).documentsRebalanced, num = 1, den = 2)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    def core(k: Int): (Long, Long) = {
      var edges = pairs.toSet
      var changed = true
      while (changed) {
        val deg = edges.toSeq.flatMap(e => Seq(e._1, e._2))
          .groupBy(identity).map { case (v, vs) => v -> vs.size }
        val next = edges.filter(e =>
          deg.getOrElse(e._1, 0) >= k && deg.getOrElse(e._2, 0) >= k)
        changed = next != edges
        edges = next
      }
      (edges.flatMap(e => Seq(e._1, e._2)).size.toLong, edges.size.toLong)
    }
    assert(rows.map(t => (t._2, t._3)).toSeq === Seq(core(2), core(3)))
    // handshake bound: every core node has in-core degree >= k
    rows.foreach { case (k, n, e) => assert(2 * e >= k * n, s"k=$k") }
  }

  test("q262 BPE merges: match a driver-side full-induction replay") {
    val rows = run("q262_bpe_merges").collect()
      .map(r => (r.getAs[Int]("rank"), r.getAs[String]("sym_a"),
        r.getAs[String]("sym_b"), r.getAs[Long]("pair_count"),
        r.getAs[Long]("total_symbols"))).sortBy(_._1)
    assert(rows.map(_._1).toSeq === (1 to 6))
    // the max pair count can only shrink as merges consume pairs
    rows.sliding(2).foreach { case Array(a, b) => assert(b._4 <= a._4) }
    // each merge application removes exactly one symbol, and there is
    // at least one application and at most cnt of them
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(b._5 < a._5 && a._5 - b._5 <= b._4,
        s"rank ${b._1}: total ${b._5} vs ${a._5}, cnt ${b._4}")
    }
    // full driver replay: same vocab slice, same iterated-replace
    // merge semantics (java String.replace is the identical
    // non-overlapping left-to-right scan)
    var v = operators.Bpe.vocab(sources.TokenizedCorpus.tokens(spark, sf))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .map { case (t, f) => (" " + t.map(c => s"$c ").mkString, f) }
    val replay = (1 to 6).map { r =>
      val counts = scala.collection.mutable.Map[(String, String), Long]()
      v.foreach { case (s, f) =>
        val ss = s.trim.split(" ")
        ss.sliding(2).foreach {
          case Array(a, b) =>
            counts((a, b)) = counts.getOrElse((a, b), 0L) + f
          case _ =>
        }
      }
      val ((a, b), cnt) = counts.toSeq.minBy { case ((a, b), c) => (-c, a, b) }
      v = v.map { case (s, f) =>
        var cur = s
        for (_ <- 1 to 12) cur = cur.replace(s" $a $b ", s" $a$b ")
        (cur, f)
      }
      val total = v.map { case (s, f) => f * s.trim.split(" ").length }.sum
      (r, a, b, cnt, total)
    }
    assert(rows.toSeq === replay)
  }

  test("q264 LR sweep: weights match a driver refit per rate; eval split is fixed") {
    val rows = run("q264_lr_sweep").collect()
      .map(r => (r.getAs[Double]("rate"),
        Seq(r.getAs[Double]("w0"), r.getAs[Double]("w1"),
          r.getAs[Double]("w2"), r.getAs[Double]("w3")),
        r.getAs[Long]("n_eval"), r.getAs[Long]("n_correct"),
        r.getAs[Long]("accuracy_ppm"))).sortBy(_._1)
    assert(rows.map(_._1).toSeq === Seq(0.5, 2.0, 8.0))
    // one fixed held-out slice: every rate scores the same frame
    assert(rows.map(_._3).distinct.length === 1)
    rows.foreach { case (_, _, n, ok, ppm) =>
      assert(ok <= n && ppm === ok * 1000000L / n)
    }
    // per-rate engine weights equal a driver-side refit on the same
    // train slice (the q250 replay, parameterized by rate)
    val keyed = operators.Classify
      .corpusWithCorruptions(Tables(spark, sf).documentsRebalanced)
      .withColumn("src", when(col("doc_id") < 0, -col("doc_id") - lit(1L))
        .otherwise(col("doc_id")))
    val tr = operators.Classify
      .logregFeatures(keyed.filter(pmod(col("src"), lit(5)) =!= 0))
    rows.foreach { case (rate, ws, _, _, _) =>
      assert(operators.Classify.logregFit(tr, rate).toSeq === ws,
        s"rate $rate")
    }
    // the sweep is not degenerate: different rates land on different fits
    assert(rows.map(_._2).distinct.length === 3)
  }

  test("q265 distillation: student learns a real boundary and tracks the teacher") {
    val r = run("q265_distill").collect()(0)
    val (b, w1) = (r.getAs[Double]("student_b"), r.getAs[Double]("student_w1"))
    val n = r.getAs[Long]("n_docs")
    val tKeep = r.getAs[Long]("n_teacher_keep")
    val sKeep = r.getAs[Long]("n_student_keep")
    val agree = r.getAs[Long]("n_agree")
    assert(r.getAs[Long]("agree_ppm") === agree * 1000000L / n)
    // the balanced fit must NOT degenerate to keep-all / drop-all
    assert(sKeep > 0 && sKeep < n, s"student kept $sKeep of $n")
    // x1 carries the teacher's dominant signal: strong agreement
    assert(agree * 1000000L / n > 800000L, s"agreement ${agree * 1e6 / n}")
    assert(w1 > 0.0, "stopword ratio must push toward keep")
    // driver replay of the student fit on the engine's teacher labels
    val feats = operators.Classify.logregFeatures(
      operators.Classify.corpusWithCorruptions(
        Tables(spark, sf).documentsRebalanced))
    val tw = operators.Classify.logregFit(feats)
    val labeled = feats.select(
      when(round(lit(1.0) / (lit(1.0) + exp(-(lit(tw(0)) +
        lit(tw(1)) * col("x1") + lit(tw(2)) * col("x2") +
        lit(tw(3)) * col("x3")))) * lit(1e6), 0) >= 500000L,
        lit(1.0)).otherwise(lit(0.0)).as("y"), col("x1"))
    val sw = operators.Classify.distillFit(labeled)
    assert(sw.toSeq === Seq(b, w1))
    assert(tKeep === labeled.filter(col("y") === 1.0).count())
  }

  test("q266 centroid drift: matches a driver-side recompute") {
    val rows = run("q266_centroid_drift").collect()
      .map(r => (r.getAs[Int]("label"), r.getAs[Long]("n_a"),
        r.getAs[Long]("n_b"), r.getAs[Double]("l2_sq"),
        r.getAs[Double]("cos_centroids"))).sortBy(_._1)
    rows.foreach { case (_, na, nb, l2, c) =>
      assert(na > 0 && nb > 0 && l2 >= 0.0 && math.abs(c) <= 1.0)
    }
    def r7(d: Double, s: Int): BigDecimal =
      BigDecimal(d).setScale(s, BigDecimal.RoundingMode.HALF_UP)
    val vecs = Tables(spark, sf).embeddings
      .select("vec_id", "label", "embedding").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Float](2).toArray))
    val replay = vecs.groupBy(_._2).toSeq.sortBy(_._1).map { case (lbl, vs) =>
      val byH = vs.groupBy(v => (v._1 % 2).toInt)
      val d = vs.head._3.length
      def mean(h: Int): (Long, Array[Double]) = {
        val g = byH(h)
        val sums = Array.fill(d)(0L)
        g.foreach(v => (0 until d).foreach(i =>
          sums(i) += r7(v._3(i).toDouble * 1e7, 0).toLong))
        (g.length.toLong,
          sums.map(s => r7(s.toDouble / 1e7 / g.length.toDouble, 7).toDouble))
      }
      val (na, ma) = mean(0)
      val (nb, mb) = mean(1)
      def dsum(f: Int => Double): BigDecimal =
        (0 until d).map(i => r7(f(i), 14)).sum
      val dd = dsum(i => (ma(i) - mb(i)) * (ma(i) - mb(i)))
      val dab = dsum(i => ma(i) * mb(i))
      val daa = dsum(i => ma(i) * ma(i))
      val dbb = dsum(i => mb(i) * mb(i))
      (lbl, na, nb, dd.setScale(8, BigDecimal.RoundingMode.HALF_UP).toDouble,
        r7(dab.toDouble / math.sqrt(daa.toDouble * dbb.toDouble), 6).toDouble)
    }
    assert(rows.toSeq === replay)
  }

  test("q267 DP bounded contribution: clamp matches a driver recompute, noise bounded") {
    val rows = run("q267_dp_bounded").collect()
      .map(r => (r.getAs[String]("d"), r.getAs[Long]("n_raw"),
        r.getAs[Long]("n_clamped"), r.getAs[Long]("n_users_clamped"),
        r.getAs[Double]("n_dp"))).sortBy(_._1)
    val perUserDay = Tables(spark, sf).events
      .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("d"), col("user_id"))
      .agg(count(lit(1)).as("c")).collect()
      .map(r => (r.getString(0), r.getAs[Long]("c")))
    val byDay = perUserDay.groupBy(_._1)
    rows.foreach { case (d, raw, clamped, nUsers, dp) =>
      val cs = byDay(d).map(_._2)
      assert(raw === cs.sum)
      assert(clamped === cs.map(math.min(_, 3L)).sum)
      assert(nUsers === cs.count(_ > 3L).toLong)
      // Laplace(3) noise on the 53-bit pinned uniform is bounded by
      // 3·|ln(2^-53)| ≈ 110.2
      assert(math.abs(dp - clamped) <= 111.0, s"$d noise ${dp - clamped}")
    }
    // the clamp must actually bite somewhere, or the operator is a
    // no-op on this fixture
    assert(rows.map(_._4).sum > 0L, "no user-day exceeded C=3")
  }

  test("q268 cluster medoids: match a driver recompute; medoid lives in its cluster") {
    val rows = run("q268_cluster_medoids").collect()
      .map(r => (r.getAs[Long]("group_id"), r.getAs[Long]("n_members"),
        r.getAs[Long]("medoid"), r.getAs[Double]("medoid_score")))
      .sortBy(_._1)
    val pairs = operators.Dedup.nearDupPairs(Tables(spark, sf).documents)
      .collect().map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"),
        r.getAs[Long]("inter"), r.getAs[Long]("uni")))
    // driver union-find (min-root)
    val parent = scala.collection.mutable.HashMap.empty[Long, Long]
    def find(x: Long): Long = {
      var r = x; while (parent.getOrElse(r, r) != r) r = parent(r); r
    }
    pairs.foreach { case (a, b, _, _) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    def j7(i: Long, u: Long): BigDecimal =
      BigDecimal(i.toDouble / u.toDouble)
        .setScale(7, BigDecimal.RoundingMode.HALF_UP)
    val score = scala.collection.mutable.Map[Long, BigDecimal]()
    pairs.foreach { case (a, b, i, u) =>
      score(a) = score.getOrElse(a, BigDecimal(0)) + j7(i, u)
      score(b) = score.getOrElse(b, BigDecimal(0)) + j7(i, u)
    }
    val members = pairs.flatMap(p => Seq(p._1, p._2)).distinct
    val replay = members.groupBy(find).toSeq.sortBy(_._1).map {
      case (g, ms) =>
        val medoid = ms.map(m => (score(m), m))
          .minBy { case (s, m) => (-s, m) }
        (g, ms.length.toLong, medoid._2, medoid._1.toDouble)
    }
    assert(rows.toSeq === replay)
    rows.foreach { case (g, n, m, s) =>
      assert(n >= 2, "a cluster has at least two members")
      assert(find(m) === g, "medoid must belong to its cluster")
      assert(s > 0.0)
    }
  }

  test("q269 BPE coverage: conserved against q262's final round") {
    val c = run("q269_bpe_coverage").collect()(0)
    val terms = c.getAs[Long]("n_terms")
    val occ = c.getAs[Long]("n_occurrences")
    val chars = c.getAs[Long]("total_chars")
    val symsTot = c.getAs[Long]("total_symbols")
    assert(occ >= terms && terms > 0)
    // merging only shrinks the symbol count, floored at 1 per occurrence
    assert(symsTot <= chars && symsTot >= occ)
    assert(c.getAs[Long]("syms_per_occ_ppm") === symsTot * 1000000L / occ)
    assert(c.getAs[Long]("fully_merged_ppm") <= 1000000L)
    // the coverage rollup sees EXACTLY the vocab state q262's last
    // round reported
    val lastRound = run("q262_bpe_merges").collect()
      .maxBy(_.getAs[Int]("rank")).getAs[Long]("total_symbols")
    assert(symsTot === lastRound)
  }

  test("q270 retraction: equals q185 minus tombstoned-history pairs") {
    def pairsOf(name: String) = run(name).collect()
      .map(r => (r.getAs[Long]("new_doc"), r.getAs[Long]("hist_doc"),
        r.getAs[Long]("inter"), r.getAs[Long]("uni"))).toSet
    val retained = pairsOf("q270_index_retraction")
    val full = pairsOf("q185_incremental_dedup")
    assert(retained === full.filter(_._2 % 7 != 0))
    assert(retained.forall(_._2 % 7 != 0), "no tombstoned doc may surface")
    assert(full.exists(_._2 % 7 == 0),
      "the tombstone set must remove at least one pair on this fixture")
  }

  test("q271 ANN retraction: equals q191 minus tombstoned-history pairs") {
    def pairsOf(name: String) = run(name).collect()
      .map(r => (r.getAs[Long]("new_vec"), r.getAs[Long]("hist_vec"),
        r.getAs[Double]("score"))).toSet
    val retained = pairsOf("q271_ann_retraction")
    val full = pairsOf("q191_incremental_ann")
    assert(retained === full.filter(_._2 % 7 != 0))
    assert(retained.forall(_._2 % 7 != 0), "no tombstoned vector may surface")
    assert(full.exists(_._2 % 7 == 0),
      "the tombstone set must remove at least one pair on this fixture")
  }

  test("q263 l-diversity: violations monotone in l, bounded; homogeneous classes exist") {
    val rows = run("q263_l_diversity").collect()
      .map(r => (r.getAs[Int]("l"), r.getAs[Long]("total_classes"),
        r.getAs[Long]("total_rows"), r.getAs[Long]("violating_classes"),
        r.getAs[Long]("violating_rows"))).sortBy(_._1)
    assert(rows.map(_._1).toSeq === Seq(2, 3, 5))
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(b._4 >= a._4 && b._5 >= a._5, "monotone in l")
    }
    rows.foreach { case (_, tc, tr, vc, vr) =>
      assert(vc <= tc && vr <= tr)
      assert(vr >= vc, "a violating class has at least one row")
    }
    // driver recompute of the l=2 row (homogeneity attack surface)
    val classes = Tables(spark, sf).events
      .groupBy(date_format(col("ts"), "yyyy-MM-dd"),
        pmod(col("user_id"), lit(100)))
      .agg(count(lit(1)).as("n"), countDistinct(col("event_type")).as("nd"))
      .collect().map(r => (r.getAs[Long]("n"), r.getAs[Long]("nd")))
    val homog = classes.filter(_._2 < 2)
    assert(rows(0)._4 === homog.length.toLong)
    assert(rows(0)._5 === homog.map(_._1).sum)
  }

  test("q256 k-anonymity: violations monotone in k, bounded by totals") {
    val rows = run("q256_k_anonymity").collect()
      .map(r => (r.getAs[Int]("k"), r.getAs[Long]("total_classes"),
        r.getAs[Long]("total_rows"), r.getAs[Long]("violating_classes"),
        r.getAs[Long]("violating_rows"))).sortBy(_._1)
    assert(rows.map(_._1).toSeq === Seq(2, 5, 10))
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(b._4 >= a._4 && b._5 >= a._5, "monotone in k")
    }
    rows.foreach { case (_, tc, tr, vc, vr) =>
      assert(vc <= tc && vr <= tr)
    }
  }
}
