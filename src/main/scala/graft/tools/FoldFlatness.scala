package graft.tools

import org.apache.spark.sql.functions._

/** Per-increment-cost-vs-history measurement for the q187 fold-in
  * dedup (round-9 VERDICT item 1's "Done" evidence): probe ONE FIXED
  * batch against staged histories of growing size and report how the
  * increment's cost moves — the claim under test is that an increment
  * pays probe-side work plus index lookups, so its cost should be
  * near-FLAT in history size (the history term is a columnar scan of
  * (doc_id, band_sig) pairs, not a recompute), while a naive
  * re-cluster would be linear-to-quadratic.
  *
  * Method: fixed batch = doc_id % 23 == 0 (~4% of the corpus);
  * histories = doc_id % 23 != 0 AND doc_id % 4 < k for k = 1..4
  * (~25/50/75/100% of the rest). Each history is staged OUTSIDE the
  * timed region (the pay-once base build); the timed region is the
  * probe: batch signatures + band join + exact verify. Reported
  * exponent = ln(t4/t1)/ln(h4/h1) over the 4x history growth.
  *
  * One JSON line on stdout; merge into SCALE_STRESS.json by hand (the
  * entry's scale base is history x4, unlike the x10 blowup rows).
  */
object FoldFlatness {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = graft.EngineSession.local("fold-flatness", cpus)
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.Tables(spark, sfDir).documents
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    docs.count()
    val batch = docs.filter(col("doc_id") % 23 === 0)

    def time(fn: => Unit): Double = {
      val t0 = System.nanoTime(); fn; (System.nanoTime() - t0) / 1e9
    }
    def median(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)

    def sweep(record: Boolean): Seq[(Int, Long, Double)] = (1 to 4).map { k =>
      val hist = docs.filter(col("doc_id") % 23 =!= 0 && col("doc_id") % 4 < k)
      val histN = hist.count()
      val runDir = s"${graft.sources.Staging.stagingRoot()}/graft_fold_flat/" +
        s"${sfDir.replaceAll("[^A-Za-z0-9.]", "_")}/h$k"
      graft.sources.Staging.ensureStaged(runDir) {
        graft.operators.Dedup.buildIndexRun(hist, runDir)
        graft.sources.Staging.touch(runDir)
      }
      // warmup + 3 timed probes of the SAME fixed batch
      def probe(): Unit = {
        graft.operators.Dedup.probeDocsAgainstIndex(batch, runDir)
          .write.format("noop").mode("overwrite").save()
      }
      probe()
      val t = median(Seq.fill(3)(time(probe())))
      if (record)
        System.err.println(f"[fold-flatness] k=$k hist=$histN t=$t%.3f s")
      (k, histN, t)
    }
    // two passes: the first JIT-warms the probe pipeline end-to-end
    // (its k=1 reading is codegen-compilation cost, not probe cost);
    // only the second pass is reported
    sweep(record = false)
    val rows = sweep(record = true)
    val (_, h1, t1) = rows.head
    val (_, h4, t4) = rows.last
    val exp = math.log(t4 / t1) / math.log(h4.toDouble / h1.toDouble)
    val per = rows.map { case (k, h, t) =>
      s"""{"k":$k,"hist_rows":$h,"probe_sec":${math.round(t * 1000.0) / 1000.0}}"""
    }.mkString("[", ",", "]")
    println(
      s"""{"metric":"fold_flatness","sf":"$sfDir","points":$per,""" +
        s""""exponent":${math.round(exp * 1000.0) / 1000.0}}""")
    spark.stop()
  }
}
