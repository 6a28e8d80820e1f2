package graft

import org.apache.spark.sql.functions._

/** Coverage for q245–q247 beyond the differential gate: the late-data
  * stream must match the watermark-filtered batch recompute (and the
  * late file must really exist in the feed), the stratified folds must
  * be exactly balanced, and the nprobe sweep must be monotone.
  */
class FoldsSweepSpec extends SparkSpec {

  import spark.implicits._

  test("q245 equals the batch windowed counts under the final watermark; late file staged") {
    val got = run("q245_stream_late_data").collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getAs[Long]("cnt")).toMap
    val ev = Tables(spark, sf).events
    val mxUs = ev.agg(max(unix_micros(col("ts")))).head().getLong(0)
    val wmUs = (mxUs / 1000 - 5400000L) * 1000
    val want = ev
      .filter(unix_micros(window(col("ts"), "1 hour").getField("end")) <= wmUs)
      .groupBy(
        date_format(window(col("ts"), "1 hour").getField("start"),
          "yyyy-MM-dd HH:mm").as("w"),
        col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getAs[Long]("cnt"))
      .toMap
    assert(got == want)
    // the last ~90 minutes of windows must be withheld by append mode
    val allWindows = ev.select(
      date_format(window(col("ts"), "1 hour").getField("start"),
        "yyyy-MM-dd HH:mm"), col("event_type")).distinct().count()
    assert(got.size < allWindows)
    // and the feed really contains the late replay file — the drop
    // semantics are only exercised if the 5th file exists and carries
    // rows (if they had been counted, every quartile-0 window's cnt
    // would be doubled and the equality above would have failed)
    val feed = graft.streaming.StreamingEvents.stagedLateFeed(spark, sf)
    val p = new org.apache.hadoop.fs.Path(feed, "late_replay.parquet")
    val fs = p.getFileSystem(graft.sources.Staging.hadoopConf())
    assert(fs.exists(p))
    assert(spark.read.parquet(p.toString).count() > 0)
  }

  test("q246 folds are exactly balanced within every stratum") {
    val rows = run("q246_stratified_kfold").collect()
    val byLang = rows.groupBy(_.getString(0))
    val langs = Tables(spark, sf).documents.select("lang").distinct().count()
    assert(byLang.size == langs)
    byLang.foreach { case (lang, fs) =>
      assert(fs.length == graft.operators.Folds.NumFolds, lang)
      val sizes = fs.map(_.getAs[Long]("n_docs"))
      assert(sizes.max - sizes.min <= 1L, s"$lang: ${sizes.toSeq}")
    }
    val total = rows.map(_.getAs[Long]("n_docs")).sum
    assert(total == Tables(spark, sf).documents.count())
  }

  test("q248 cluster-safe split leaks zero near-dup pairs; the naive split leaks") {
    val rows = run("q248_split_leakage").collect()
      .map(r => r.getString(0) ->
        (r.getAs[Long]("total_pairs"), r.getAs[Long]("cross_pairs"))).toMap
    assert(rows.keySet == Set("hash_by_doc", "group_exact", "group_cluster"))
    val total = rows.values.map(_._1).toSet
    assert(total.size == 1 && total.head > 0, rows.toString)
    assert(rows("group_cluster")._2 == 0L, "cluster-safe must never leak")
    assert(rows("hash_by_doc")._2 > 0L, "fixture must exhibit naive leakage")
    assert(rows("group_exact")._2 <= rows("hash_by_doc")._2)
  }

  test("q249 pair and doc counts decrease as tau rises; tau=0.8 matches q139") {
    val rows = run("q249_dedup_threshold_sweep").collect()
    assert(rows.map(_.getAs[Double]("tau")).toSeq == Seq(0.8, 0.96, 0.98))
    val ps = rows.map(_.getAs[Long]("n_pairs"))
    val ds = rows.map(_.getAs[Long]("n_docs_in_pairs"))
    assert(ps.zip(ps.tail).forall { case (a, b) => a >= b }, ps.toSeq)
    assert(ds.zip(ds.tail).forall { case (a, b) => a >= b }, ds.toSeq)
    assert(ps.head == run("q139_jaccard_join").count())
  }

  test("q247 recall and candidate fraction are monotone in nprobe") {
    val rows = run("q247_nprobe_sweep").collect()
    assert(rows.map(_.getAs[Int]("nprobe")).toSeq == Seq(1, 3, 8))
    val rec = rows.map(_.getAs[Double]("mean_recall"))
    val frac = rows.map(_.getAs[Double]("cand_frac"))
    assert(rec.zip(rec.tail).forall { case (a, b) => a <= b + 1e-9 }, rec.toSeq)
    assert(frac.zip(frac.tail).forall { case (a, b) => a < b }, frac.toSeq)
    assert(rec.forall(r => r >= 0.0 && r <= 1.0))
    assert(frac.forall(f => f > 0.0 && f < 1.0))
  }
}
