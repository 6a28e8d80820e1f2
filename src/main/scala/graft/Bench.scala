package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (BASELINE.md §2 protocol): every declared query on
  * `SPARK_GRAFT_SF_DIR`, 1 warmup + 3 timed runs, median wall-clock,
  * forced through the `noop` sink so the full plan materializes
  * without sink I/O skewing the number (count() would let Catalyst
  * prune the very projections being measured).
  *
  * Emits exactly one JSON line:
  * {"metric":"total_median_sec","value":N,"unit":"sec","queries":{...},"sf":...}
  */
object Bench {

  def median(xs: Seq[Double]): Double = {
    val s = xs.sorted
    s(s.size / 2)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark: SparkSession = EngineSession.local("graft-bench", cpus)

    def time(fn: => Unit): Double = {
      val t0 = System.nanoTime()
      fn
      (System.nanoTime() - t0) / 1e9
    }

    val results = SparkEntry.allEntries.map { e =>
      val t =
        try {
          // attribute native-path scan time and eagerly-materialized
          // sub-queries to the query about to run
          metrics.NativeScanTime.drain()
          metrics.RuntimeBreakdown.drainPending()
          // warmup doubles as the reference-style runtime-breakdown
          // profile (parse_stackcollapse bins)
          val warm = e.run(spark, sfDir)
          System.err.println(
            s"[bench] ${e.name} breakdown: ${metrics.RuntimeBreakdown.profile(warm).render}")
          median(Seq.fill(3)(time(
            e.run(spark, sfDir).write.format("noop").mode("overwrite").save())))
        } catch {
          case ex: Throwable =>
            System.err.println(s"[bench] ${e.name} failed: ${ex.getMessage}")
            -1.0
        }
      e.name -> t
    }

    val qs = results
      .map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.collect { case (_, v) if v >= 0 => v }.sum
    println(
      s"""{"metric":"total_median_sec","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
