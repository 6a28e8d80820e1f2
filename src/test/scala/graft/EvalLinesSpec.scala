package graft

import org.apache.spark.sql.functions._

import graft.operators.{Eval, Lines, TextAnalysis}

/** Structural + brute-force coverage for the round-9 evaluation family
  * (q230–q234) beyond the DuckDB differential gate: the metrics must
  * agree with naive driver-side recomputations and respect their
  * mathematical ranges, and the planted line-dedup corpus must behave
  * exactly as designed.
  */
class EvalLinesSpec extends SparkSpec {

  import spark.implicits._

  test("q230 planted pages: 4 lines per doc, ref line always survives") {
    val rows = run("q230_line_dedup").collect()
    assert(rows.length > 0)
    rows.foreach { r =>
      val kept = r.getAs[Long]("kept_lines")
      val removed = r.getAs[Long]("removed_lines")
      assert(kept + removed == 4L, s"doc ${r.get(0)}: $kept + $removed != 4")
      // 'ref <doc_id>' is unique by construction -> never boilerplate
      assert(kept >= 1L)
      // cookie (mod 3) and banner (mod 7) groups all exceed the df=10
      // threshold at 500 docs -> both planted boilerplate lines drop
      assert(removed >= 2L, s"doc ${r.get(0)}: removed $removed < 2")
      assert(r.getAs[String]("clean_md5") != null)
    }
  }

  test("q230 clean_md5 changes when boilerplate is removed") {
    val docs = Tables(spark, sf).documents
    val withBp = Lines.decoratedPages(docs)
      .select(md5(col("page")).as("m")).as[String].collect().toSet
    val cleaned = run("q230_line_dedup")
      .select(col("clean_md5")).as[String].collect().toSet
    // cleaned reconstructions are never byte-identical to the raw page
    assert(withBp.intersect(cleaned).isEmpty)
  }

  test("q231 heaps curves match 10 brute-force prefix count-distincts") {
    val docs = Tables(spark, sf).documents
    val n = docs.agg(max("doc_id")).head().getLong(0) + 1
    val toks = docs.select(col("doc_id"),
      explode(TextAnalysis.tokens(col("text"))).as("term"))
    val pts = (1L to 10L).map { k =>
      val pre = toks.filter(col("doc_id") * 10 < lit(n * k))
      (pre.count(), pre.select(countDistinct("term")).head().getLong(0))
    }
    val fit = run("q231_heaps_law").head()
    assert(fit.getAs[Long]("points") ==
      pts.count { case (nk, vk) => nk > 0 && vk > 0 })
    // slope recomputed from the brute-force points (same rounding)
    val b = pts.filter(p => p._1 > 0 && p._2 > 0).map { case (nk, vk) =>
      (BigDecimal(math.log(nk.toDouble)).setScale(6, BigDecimal.RoundingMode.HALF_UP),
        BigDecimal(math.log(vk.toDouble)).setScale(6, BigDecimal.RoundingMode.HALF_UP))
    }
    val nt = b.size
    val sx = b.map(_._1).sum; val sy = b.map(_._2).sum
    val sxy = b.map(p => p._1 * p._2).sum; val sxx = b.map(p => p._1 * p._1).sum
    val den = nt * sxx.toDouble - sx.toDouble * sx.toDouble
    val beta = (nt * sxy.toDouble - sx.toDouble * sy.toDouble) / den
    assert(math.abs(fit.getAs[Double]("beta") - beta) < 1e-5)
  }

  test("q232 AUC matches the quadratic pair count and sits in [0, 1]") {
    val r = run("q232_score_auc").head()
    val auc = r.getAs[Double]("auc")
    assert(auc >= 0.0 && auc <= 1.0)
    val docs = Tables(spark, sf).documents
    val scored = docs.select(
      round(TextAnalysis.qualityScore(
        TextAnalysis.tokens(col("text")), col("n_chars")) * 1000000L, 0)
        .cast("long").as("s"),
      (col("lang") === "en").as("pos")).as[(Long, Boolean)].collect()
    val ps = scored.filter(_._2).map(_._1)
    val ns = scored.filterNot(_._2).map(_._1)
    assert(r.getAs[Long]("n_pos") == ps.length.toLong)
    assert(r.getAs[Long]("n_neg") == ns.length.toLong)
    var num = 0.0
    for (p <- ps; q <- ns)
      num += (if (p > q) 1.0 else if (p == q) 0.5 else 0.0)
    val brute = num / (ps.length.toDouble * ns.length)
    assert(math.abs(auc - brute) < 1e-5, s"$auc vs $brute")
  }

  test("q233 calibration bins partition the corpus; gap = |acc - conf|") {
    val rows = run("q233_calibration_ece").collect()
    val total = Tables(spark, sf).documents.count()
    assert(rows.map(_.getAs[Long]("n")).sum == total)
    val ece = rows.head.getAs[Double]("ece")
    assert(ece >= 0.0 && ece <= 1.0)
    assert(rows.map(_.getAs[Double]("ece")).distinct.length == 1)
    rows.foreach { r =>
      val acc = r.getAs[Double]("acc"); val conf = r.getAs[Double]("conf")
      assert(acc >= 0.0 && acc <= 1.0 && conf >= 0.0 && conf <= 1.0)
      assert(math.abs(r.getAs[Double]("gap") - math.abs(acc - conf)) < 2e-6)
    }
    // ECE is the n-weighted mean gap (to rounding)
    val w = rows.map(r => r.getAs[Long]("n").toDouble * r.getAs[Double]("gap")).sum
    assert(math.abs(ece - w / total) < 1e-5)
  }

  test("q234 Fleiss' kappa matches a driver-side recompute and the raters disagree") {
    val r = run("q234_fleiss_kappa").head()
    val kappa = r.getAs[Double]("kappa")
    assert(kappa > -1.0 && kappa < 1.0) // strict: perfect agreement would be 1
    val docs = Tables(spark, sf).documents
    val sent = Eval.raterSentences
    val preds = docs.select(col("lang"), col("text")).as[(String, String)]
      .collect().map { case (lang, text) =>
        val deco = text + " " + sent.getOrElse(lang, "")
        Seq(predictFull(deco), predictStops(deco), predictMarkers(deco))
      }
    val n = preds.length
    val po = preds.map { cats =>
      val m = cats.groupBy(identity).map(_._2.size)
      (m.map(c => c * c).sum - 3).toDouble / 6.0
    }.sum / n
    val catTot = preds.flatten.groupBy(identity).map(_._2.size.toLong)
    val pe = catTot.map(c => c.toDouble * c).sum / (9.0 * n * n)
    val brute = (po - pe) / (1.0 - pe)
    assert(math.abs(kappa - brute) < 1e-5, s"$kappa vs $brute")
    // the three raters produce genuinely different marginals
    assert(preds.exists(cats => cats.distinct.length > 1))
  }

  test("q235 nDCG: dcg <= idcg, ndcg in (0, 1], full 5-query coverage") {
    val rows = run("q235_ndcg").collect()
    assert(rows.map(_.getAs[Int]("qid")).toSeq == Seq(1, 2, 3, 4, 5))
    rows.foreach { r =>
      val dcg = r.getAs[Double]("dcg"); val idcg = r.getAs[Double]("idcg")
      val ndcg = r.getAs[Double]("ndcg")
      assert(r.getAs[Long]("n_ranked") <= 10L)
      assert(dcg > 0.0 && idcg > 0.0 && dcg <= idcg + 1e-9)
      assert(ndcg > 0.0 && ndcg <= 1.0 + 1e-9)
      assert(math.abs(ndcg - dcg / idcg) < 1e-5)
    }
  }

  test("q236 PCA projection moments match a driver-side brute force") {
    val rows = run("q236_pca_project").collect()
    val emb = Tables(spark, sf).embeddings
    assert(rows.map(_.getAs[Long]("n")).sum == emb.count())
    rows.foreach(r => assert(r.getAs[Double]("var_proj") >= 0.0))
    // brute-force: project every vector on the collected loadings
    val v = graft.operators.Covariance
      .powerIteration(emb, 12).collect()
      .sortBy(_.getAs[Int]("i")).map(_.getAs[Double]("loading"))
    val byLabel: Map[Int, (Long, Double)] =
      emb.select(col("label"), col("embedding"))
        .as[(Int, Array[Float])].collect()
        .groupBy(_._1).map { case (l, vs) =>
          val ps = vs.map { case (_, e) =>
            e.zip(v).map { case (x, w) =>
              math.rint(x.toDouble * w * 1e7) // half-way products don't occur in the fixture
            }.sum / 1e7
          }
          l -> (ps.length.toLong, ps.sum / ps.length)
        }
    rows.foreach { r =>
      val (n, mean) = byLabel(r.getAs[Int]("label"))
      assert(r.getAs[Long]("n") == n)
      assert(math.abs(r.getAs[Double]("mean_proj") - mean) < 1e-4)
    }
  }

  test("q241 bootstrap CI brackets the point estimate; weights are Poisson(1)-shaped") {
    val r = run("q241_bootstrap_ci").head()
    val mean = r.getAs[Double]("mean_tokens")
    assert(r.getAs[Double]("ci_lo") <= mean && mean <= r.getAs[Double]("ci_hi"))
    assert(r.getAs[Int]("b_replicas") == 64)
    // weight distribution sanity: mean weight over all (doc, replica)
    // pairs ≈ 1 (Poisson(1)), within 5%
    val n = r.getAs[Long]("n")
    val docs = Tables(spark, sf).documents
    val u53 = shiftrightunsigned(graft.functions.GraftFunctions.splitmix64(
      col("doc_id") * 64 + col("b")), 11)
    val w = graft.operators.Eval.poissonThresholds
      .map(t => when(u53 >= t, 1L).otherwise(0L)).reduce(_ + _)
    val meanW = docs.select(col("doc_id"),
        explode(sequence(lit(0), lit(63))).as("b"))
      .select(w.as("w")).agg(avg("w")).head().getDouble(0)
    assert(math.abs(meanW - 1.0) < 0.05, s"mean weight $meanW over ${n * 64} draws")
  }

  test("q242 Wilson intervals contain the rate and behave at the extremes") {
    val rows = run("q242_wilson_ci").collect()
    rows.foreach { r =>
      val (lo, hi) = (r.getAs[Double]("ci_lo"), r.getAs[Double]("ci_hi"))
      val rate = r.getAs[Double]("rate")
      assert(lo >= 0.0 - 1e-9 && hi <= 1.0 + 1e-9, r.toString)
      assert(lo <= rate && rate <= hi, r.toString)
      // Wilson is never degenerate: hi > lo even at k = 0 or k = n
      assert(hi > lo, r.toString)
    }
  }

  test("q243 silhouette stays in [-1, 1] and matches a driver brute force") {
    val rows = run("q243_silhouette").collect()
    rows.foreach(r => {
      val s = r.getAs[Double]("mean_sil")
      assert(s >= -1.0 && s <= 1.0, r.toString)
    })
    // brute force on the collected fixture (500 × 64 at sf0.001)
    val emb = Tables(spark, sf).embeddings
      .select(col("label"), col("embedding")).as[(Int, Array[Float])].collect()
    val byLabel = emb.groupBy(_._1)
    val cents = byLabel.map { case (l, vs) =>
      val d = vs.head._2.length
      l -> Array.tabulate(d) { j =>
        vs.map(v => math.rint(v._2(j).toDouble * 1e7)).sum / 1e7 / vs.length
      }
    }
    def d2(v: Array[Float], c: Array[Double]): Long =
      v.zip(c).map { case (x, m) =>
        math.rint((x.toDouble - m) * (x.toDouble - m) * 1e7).toLong
      }.sum
    val want = emb.map { case (l, v) =>
      val a = d2(v, cents(l))
      val b = cents.filter(_._1 != l).map(c => d2(v, c._2)).min
      val s = BigDecimal((b - a).toDouble / math.max(a, b).toDouble)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP)
      (l, s)
    }.groupBy(_._1).map { case (l, ss) =>
      l -> (ss.map(_._2).sum / ss.length).toDouble
    }
    rows.foreach { r =>
      val w = want(r.getAs[Int]("label"))
      assert(math.abs(r.getAs[Double]("mean_sil") - w) < 1e-5, s"${r.toString} vs $w")
    }
  }

  /** Priority argmax: first lang in list order reaching the max wins —
    * the cascade semantics of the engine's CASE chains.
    */
  private def predict(scores: Seq[(String, Int)]): String = {
    val mx = scores.map(_._2).max
    scores.find(_._2 == mx).get._1
  }

  private val stopSets = Map(
    "en" -> Set("the", "a", "of", "and", "to", "is"),
    "es" -> Set("el", "la", "de", "y", "que", "en"),
    "de" -> Set("der", "die", "das", "und", "ist", "ein"),
    "fr" -> Set("le", "la", "de", "et", "les", "un"),
    "zh" -> Set("的", "是", "了", "在", "和", "有"))
  private val markerSets = Map(
    "es" -> "ñ¿¡áíóú".toSet, "de" -> "äöüß".toSet,
    "fr" -> "èêëàâîïôûùçœ".toSet)
  private def markers(text: String, lang: String): Int = {
    val lower = text.toLowerCase
    if (lang == "zh") lower.count(c => c >= '一' && c <= '鿿')
    else lower.count(markerSets(lang))
  }
  private def toks(text: String): Seq[String] =
    text.trim.toLowerCase.split("\\s+").toSeq
  private def stopHits(text: String, lang: String): Int =
    toks(text).count(stopSets(lang))

  private def predictFull(t: String): String = predict(Seq(
    "en" -> stopHits(t, "en"),
    "es" -> (markers(t, "es") * 3 + stopHits(t, "es")),
    "de" -> (markers(t, "de") * 3 + stopHits(t, "de")),
    "fr" -> (markers(t, "fr") * 3 + stopHits(t, "fr")),
    "zh" -> (markers(t, "zh") * 3 + stopHits(t, "zh"))))
  private def predictStops(t: String): String = predict(
    Seq("en", "es", "de", "fr", "zh").map(l => l -> stopHits(t, l)))
  private def predictMarkers(t: String): String = predict(
    ("en" -> 0) +: Seq("es", "de", "fr", "zh").map(l => l -> markers(t, l)))
}
