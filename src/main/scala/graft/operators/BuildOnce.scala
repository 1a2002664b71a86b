package graft.operators

/** Build-once memo for persisted query artifacts (indexes, stores).
  *
  * The serving-split gates (persisted quad store, IVF index, dedup band
  * index, prefix/typo index) pay an expensive one-time BUILD and a cheap
  * PROBE. Re-running such a query inside one JVM — a bench pass, a spec
  * suite — must not pay the build again: the artifact paths are
  * applicationId-scoped and each build is deterministic in its inputs,
  * so the first successful build serves every later run. (VERDICT r12
  * "next round" #1: the bench warm-up alone blew the wall-clock budget
  * because every pass re-ran every store/index build.)
  *
  * The artifact PATH must include every input the artifact derives
  * from — use [[scoped]] to fold the source data dir into the path and
  * key the memo on that path alone. (Keying the memo on `path|dir`
  * while writing to a dir-independent path is not enough: alternating
  * dirs in one JVM would overwrite each other's files and a memo skip
  * could serve the wrong dir's artifact — ADVICE r13.) A build that
  * throws is not memoized, so a retry rebuilds.
  */
object BuildOnce {
  private val done =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Boolean]()

  /** Run `build` at most once per (JVM, key); concurrent callers with
    * the same key block until the first build finishes. */
  def apply(key: String)(build: => Unit): Unit =
    done.computeIfAbsent(key, _ => { build; java.lang.Boolean.TRUE })

  /** Artifact path scoped to its source data dir (ADVICE r13 medium):
    * a memo key alone cannot protect correctness when two data dirs
    * alternate inside one JVM — the second dir's build would OVERWRITE
    * the first dir's artifact at the same path, and a later
    * memo-skipped run for the first dir would silently serve the wrong
    * data. Embedding a hash of the dir in the path gives every
    * (artifact, dir) pair its own files, so a memo skip always serves
    * the files the skipped build would have produced. Callers use the
    * returned path as BOTH the memo key and the build/read location. */
  def scoped(base: String, dir: String): String =
    f"$base-${scala.util.hashing.MurmurHash3.stringHash(dir)}%08x"
}
