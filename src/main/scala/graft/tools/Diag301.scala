package graft.tools

/** Scratch diagnostic: replicate ScaleStress.timed's exact hygiene on
  * one entry with per-rep prints, to locate where the q301 lone-run
  * 25 s readings come from when ProfileSessions' bare loop settles at
  * 4-5 s. Usage: runMain graft.tools.Diag301 <name> <dir> [reps]
  */
object Diag301 {
  def main(args: Array[String]): Unit = {
    val name = if (args.nonEmpty) args(0) else "q301_stream_sessions_rocksdb"
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 5
    val spark = graft.EngineSession.local("diag301", graft.EngineSession.defaultCpus)
    val e = graft.SparkEntry.allEntries.find(_.name == name).get
    System.gc()
    val pinnedBefore = spark.sparkContext.getPersistentRDDs.keySet
    var t0 = System.nanoTime()
    e.run(spark, dir)
    println(f"[diag] warmup1 ${(System.nanoTime() - t0) / 1e9}%.2f s")
    t0 = System.nanoTime()
    e.run(spark, dir)
    println(f"[diag] warmup2 ${(System.nanoTime() - t0) / 1e9}%.2f s")
    (1 to reps).foreach { i =>
      val t1 = System.nanoTime()
      e.run(spark, dir).write.format("noop").mode("overwrite").save()
      println(f"[diag] rep$i ${(System.nanoTime() - t1) / 1e9}%.2f s")
      if (sys.env.contains("DIAG_UNLOAD")) {
        org.apache.spark.sql.graft.StateStoreHygiene.unloadAll()
        println(s"[diag] unloaded state stores after rep$i")
      }
    }
    graft.operators.Ivf.invalidateIndex(blocking = true)
    graft.operators.Pq.invalidateIndex(blocking = true)
    graft.TransientCaches.release(blocking = true)
    spark.sparkContext.getPersistentRDDs.foreach { case (id, rdd) =>
      if (!pinnedBefore.contains(id)) rdd.unpersist(blocking = true)
    }
    spark.stop()
  }
}
