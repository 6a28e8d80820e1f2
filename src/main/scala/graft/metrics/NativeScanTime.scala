package graft.metrics

import java.util.concurrent.atomic.AtomicLong

/** Aggregated task-side scan nanos from the FastOrcSum native path.
  *
  * FastOrcSum runs as an RDD job before its scalar ever becomes a
  * DataFrame, so its work is invisible to the SQL-metric walk in
  * [[RuntimeBreakdown]] — which left the q40 breakdown reading 0%.
  * The native tasks report their measured scan time here;
  * [[RuntimeBreakdown.of]] folds the current value into the scan bin,
  * and the bench harness drains the register before each query's
  * profiled warmup run so time is attributed to the query that spent
  * it.
  */
object NativeScanTime {
  private val nanos = new AtomicLong(0L)

  def addNanos(n: Long): Unit = nanos.addAndGet(n)

  /** Current accumulated nanos (non-destructive — see [[drain]]). */
  def peekNanos: Long = nanos.get()

  /** Read and reset — called by the bench loop between queries. */
  def drain(): Long = nanos.getAndSet(0L)
}
