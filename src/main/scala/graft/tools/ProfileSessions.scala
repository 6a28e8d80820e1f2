package graft.tools

import org.apache.spark.sql.streaming.Trigger

/** Scratch profiler for q301's scale cost (r13 VERDICT item 4): runs
  * the q301 session stream under RocksDB at a given fixture dir and
  * output mode, and dumps per-batch progress — input rows, batch
  * duration, and the state-operator timing split (updates vs removals
  * vs commit) — so "session-merge state writes" vs "complete-mode
  * re-emission" can be attributed from measurements, not argument.
  *
  * Usage: runMain graft.tools.ProfileSessions <sfDir> [complete|update]
  */
object ProfileSessions {
  def main(args: Array[String]): Unit = {
    // positional-order-free: any non-path arg is the mode, every path
    // arg is a run (a mode passed after the dirs must not silently
    // default to complete)
    val mode = args.find(!_.startsWith("/")).getOrElse("complete")
    val dirs = args.filter(_.startsWith("/")).toSeq match {
      case Seq() => Seq("/root/testdata/sf0.1")
      case ds => ds
    }
    val spark = graft.EngineSession.local("profile-q301", graft.EngineSession.defaultCpus)
    // each listed dir runs once, in order, in THIS JVM — pass a dir
    // several times to watch the cost settle as the streaming+RocksDB
    // stack warms (the q301 exponent-artifact investigation)
    dirs.zipWithIndex.foreach { case (dir, rep) =>
      val t0 = System.nanoTime()
      val out = graft.streaming.StreamingEvents.withRocksDbProvider(spark, enable = true) {
        val name = s"graft_profile_${java.util.UUID.randomUUID().toString.take(8)}"
        val q = graft.streaming.StreamingEvents.sessionFeedCounts(spark, dir)
          .writeStream
          .format("memory").queryName(name)
          .outputMode(mode)
          .trigger(Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        for (p <- q.recentProgress) {
          val so = Option(p.stateOperators).toSeq.flatten
          val soTxt = so.map { s =>
            s"rowsTotal=${s.numRowsTotal} updated=${s.numRowsUpdated} " +
              s"removed=${s.numRowsRemoved} updMs=${s.allUpdatesTimeMs} " +
              s"rmMs=${s.allRemovalsTimeMs} commitMs=${s.commitTimeMs}"
          }.mkString(" | ")
          val sink = Option(p.sink).map(_.numOutputRows).getOrElse(-1L)
          println(s"[rep $rep batch ${p.batchId}] inputRows=${p.numInputRows} " +
            s"durationMs=${p.batchDuration} sinkRows=$sink  $soTxt")
        }
        spark.table(name)
      }
      val n = out.count()
      println(f"[rep $rep] dir=$dir mode=$mode rows=$n " +
        f"wall=${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
