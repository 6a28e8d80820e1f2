package graft.tools

/** Scratch main for empirically pinning engine semantics before an
  * oracle is written (e.g. q311's state-eviction rule) — run with
  * `java -cp ... graft.tools.Probe <sfDir>`; not part of any gate.
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = graft.EngineSession.local("probe", "8")
    val df = graft.streaming.StreamingEvents.runDedupWithinWatermark(spark, args(0))
    df.collect().foreach(r => println(s"EMIT ${r.getLong(0)} ${r.getLong(1)} ${r.getLong(2)}"))
    spark.stop()
  }
}
