package org.apache.spark.sql.graft

import org.apache.spark.sql.execution.streaming.state.StateStore

/** Benchmark hygiene access to the executor-side state-store registry
  * (`StateStore` is `private[sql]`, hence this package).
  *
  * Why this exists: every re-run of a bounded streaming entry uses a
  * FRESH checkpoint location (re-runs must re-pay the full ingest —
  * the memory-sink uniqueness rule), so each run loads a new set of
  * state-store providers (one per state partition — 32 here; a RocksDB
  * provider holds an open native instance with background threads).
  * Spark unloads dead providers only lazily, via the maintenance
  * thread's ~60 s cycle. A tight benchmark loop therefore accumulates
  * dead RocksDB instances, and runs that collide with a maintenance
  * pass over that growing registry degrade wildly: measured on the
  * q301 session stream, back-to-back walls of 7.0 / 7.1 / 14.1 /
  * 31.0 s as the registry grew — a pure re-run artifact that a real
  * deployment (one provider set, living for the stream's lifetime)
  * never pays. Unloading between runs — never inside a timed region —
  * removes the artifact while measuring the same per-run work.
  */
object StateStoreHygiene {
  /** Unload every loaded state-store provider on this (local-mode)
    * executor. Safe while no stream is running; the next stream run
    * reloads its own providers from its checkpoint as usual.
    */
  def unloadAll(): Unit = StateStore.unloadAll()
}
