package graft

import java.lang.ref.WeakReference

import org.apache.spark.sql.Dataset

/** Registry of intermediate frames an operator persisted for plan-
  * sharing (e.g. both sides of a self-join reading one tokenize pass).
  * Such a frame cannot be unpersisted inside the operator — the
  * returned DataFrame is lazy and still reads it — so without a release
  * hook a long-lived session accumulates cached blocks until driver GC
  * plus the 30 s ContextCleaner cadence reclaims them.
  *
  * [[release]] is SAFE at any time: unpersisting a frame a live plan
  * still references only degrades that plan to recompute — results are
  * never wrong. Call it after materializing the results of
  * [[GraftEngine.fuzzyPairs]] / [[GraftEngine.bm25]] / phrase-search
  * style operators; the bench loop's per-query pinned-RDD sweep is the
  * same hygiene applied automatically.
  *
  * Entries are weak references: a frame the caller dropped is GC-
  * reclaimed the normal way and simply disappears from the registry.
  */
object TransientCaches {

  private val frames =
    new java.util.concurrent.ConcurrentLinkedQueue[WeakReference[Dataset[_]]]()

  /** Record `df` (already persisted by the caller) for later release. */
  def register[T <: Dataset[_]](df: T): T = {
    frames.add(new WeakReference[Dataset[_]](df))
    df
  }

  /** Unpersist every registered frame still reachable; empties the
    * registry. Non-blocking by default: block deletion proceeds
    * asynchronously. A measurement harness passes `blocking = true` so
    * deletion IO cannot bleed into the next timed region.
    */
  def release(blocking: Boolean = false): Unit = {
    var ref = frames.poll()
    while (ref != null) {
      val df = ref.get()
      if (df != null) {
        try df.unpersist(blocking = blocking)
        catch { case scala.util.control.NonFatal(_) => () }
      }
      ref = frames.poll()
    }
  }
}
