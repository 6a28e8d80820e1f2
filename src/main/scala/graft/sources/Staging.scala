package graft.sources

/** Shared scratch-staging policy for derived fixture copies (ORC
  * variants, bucketed tables, streaming source dirs).
  *
  * Two invariants, each load-bearing:
  *  - paths embed the SOURCE file's (mtime, size) fingerprint, so a
  *    regenerated fixture can never be shadowed by a stale staged
  *    copy;
  *  - the in-JVM "already staged" memo is set only AFTER the write
  *    succeeds (or the marker is observed), under a lock — a failed
  *    staging attempt is retried on the next call, and a concurrent
  *    caller can never read a half-written directory.
  */
object Staging {

  /** Scratch path under tmpdir: `<tmp>/<group>/<dirTag>/<label>_<mtime>_<size>`. */
  def fingerprintPath(group: String, dir: String, srcName: String,
      label: String): String = {
    val tag = dir.replaceAll("[^A-Za-z0-9.]", "_")
    val src = new java.io.File(s"$dir/$srcName")
    s"${sys.props("java.io.tmpdir")}/$group/$tag/${label}_${src.lastModified()}_${src.length()}"
  }

  private val staged = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  /** Run `write` once per `dest`: cross-JVM reuse via the `marker`
    * file, in-JVM via the post-success memo.
    */
  def ensureStaged(dest: String,
      marker: String => java.io.File = d => new java.io.File(d, "_SUCCESS"))(
      write: => Unit): Unit =
    if (!staged.contains(dest)) synchronized {
      if (!staged.contains(dest)) {
        if (!marker(dest).exists()) write
        staged.add(dest)
      }
    }

  /** Forget the in-JVM memo for `dest` — for callers that OBSERVED the
    * staged files missing (e.g. a tmp cleaner removed them mid-JVM);
    * the next ensureStaged re-checks the marker and rewrites.
    */
  def invalidate(dest: String): Unit = synchronized { staged.remove(dest) }
}
