package graft.tools

/** Scratch main for empirically pinning engine semantics before an
  * oracle is written (e.g. q311's state-eviction rule) — run with
  * `java -cp ... graft.tools.Probe <sfDir>`; not part of any gate.
  *
  * Current probe: steady-state depth of the transformWithState /
  * statestore-read stack — run a named query k times in one JVM and
  * print every wall, to pin how many executions the r14 state family
  * needs before a timed reading is a steady-state reading.
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = graft.EngineSession.local("probe", "32")
    val name = args(0)
    val dir = args(1)
    val k = if (args.length > 2) args(2).toInt else 6
    if (sys.env.contains("PROBE_CHANGELOG"))
      spark.conf.set(
        "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled",
        sys.env("PROBE_CHANGELOG"))
    val e = graft.SparkEntry.allEntries.find(_.name == name).get
    (1 to k).foreach { i =>
      org.apache.spark.sql.graft.StateStoreHygiene.unloadAll()
      val t0 = System.nanoTime()
      e.run(spark, dir).write.format("noop").mode("overwrite").save()
      val w = (System.nanoTime() - t0) / 1e9
      println(f"PROBE $name run$i%d: $w%.2f s  " +
        graft.streaming.StreamingDocs.lastProgress.getOrDefault(name, "?"))
      println("  " +
        graft.streaming.StreamingDocs.lastDetail.getOrDefault(name, "?"))
    }
    spark.stop()
  }
}
