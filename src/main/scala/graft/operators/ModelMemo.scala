package graft.operators

import org.apache.spark.sql.DataFrame

/** Session-scoped memo for deterministic model fits (IVF/PQ quantizers,
  * BPE merge tables), keyed on WHAT WAS READ rather than just the plan:
  * md5 of the canonicalized plan string PLUS every input file's (path,
  * length, modificationTime), plus the fit parameters.
  *
  * That closes the two staleness/collision holes of the earlier
  * `semanticHash()`-keyed maps: a long-lived session re-reading a
  * REFRESHED path behind an identical plan gets a new key (no silently
  * stale model), and two different corpora cannot alias on a 32-bit
  * plan hash (the key carries 128 fingerprint bits plus the concrete
  * file inventory). Cost per lookup is one file-status call per leaf
  * input file — driver metadata, negligible next to the corpus scan any
  * fit performs.
  *
  * Plans with NO file inputs (in-memory test relations) BYPASS the memo
  * and compute directly: their data is invisible to any plan-level
  * fingerprint, so caching them is exactly the aliasing hazard the key
  * exists to prevent — and the memo's purpose (sharing one fit across
  * the driver's parquet-backed queries) doesn't apply to them.
  *
  * [[invalidate]] is the explicit reset hook; the size guard holds the
  * map's monitor so a concurrent clear cannot interleave with the
  * check (the previous check-then-clear raced).
  *
  * The map stores lazy CELLS, not values: `putIfAbsent` publishes the
  * cell without running the fit, then the winner forces it OUTSIDE the
  * map's bin lock. Running a multi-minute distributed fit inside
  * `computeIfAbsent` would block every unrelated lookup whose key
  * hashes to the same bin for the fit's duration, and a re-entrant fit
  * on the same memo could deadlock on the bin; with cells, concurrent
  * same-key callers block only on that one cell's monitor (sharing the
  * single fit — still once per key), different keys never contend, and
  * a fit that throws leaves the lazy val uninitialized so the next
  * caller retries rather than caching the failure. */
private[operators] final class ModelMemo[V <: AnyRef] {
  // the thunk drops to null once forced: a memoized cell would
  // otherwise pin the call-site closure (captured DataFrames, plans,
  // session references) for the entry's whole lifetime — only the
  // fitted model should survive the fit. A throwing fit leaves the
  // thunk in place so the next caller retries.
  private final class Cell(@volatile private var compute: () => V) {
    lazy val value: V = { val v = compute(); compute = null; v }
  }
  private val map = new java.util.concurrent.ConcurrentHashMap[String, Cell]()

  /** Drop every memoized model (e.g. after overwriting input paths
    * mid-session with an unchanged file inventory — rewritten files
    * normally re-key on (length, modificationTime) by themselves).
    * Shares the map monitor with the size guard so clears and the
    * size check are mutually exclusive. */
  def invalidate(): Unit = map.synchronized { map.clear() }

  def getOrCompute(df: DataFrame, params: String)(compute: => V): V = {
    val files = df.inputFiles
    if (files.isEmpty) return compute
    val md = java.security.MessageDigest.getInstance("MD5")
    def update(s: String): Unit =
      md.update(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val analyzed = df.queryExecution.analyzed
    // canonicalized.toString truncates wide nodes at
    // spark.sql.debug.maxToStringFields; semanticHash doesn't truncate
    // but is only 32 bits — digest BOTH, so a collision needs the
    // full-structure hash AND the rendered plan AND the file inventory
    // to all coincide
    update(analyzed.canonicalized.toString)
    update(s"|${analyzed.semanticHash()}")
    val conf = df.sparkSession.sessionState.newHadoopConf()
    files.sorted.foreach { f =>
      val p = new org.apache.hadoop.fs.Path(f)
      val st = p.getFileSystem(conf).getFileStatus(p)
      update(s"|$f:${st.getLen}:${st.getModificationTime}")
    }
    update(s"|$params")
    val key = md.digest().map("%02x".format(_)).mkString
    // size guard: clears exclude each other and invalidate(); the
    // publish+force below stays outside the monitor (worst case a
    // concurrent clear costs one recompute, never a wrong result)
    map.synchronized { if (map.size > 64) map.clear() }
    val cell = new Cell(() => compute)
    val prior = map.putIfAbsent(key, cell)
    (if (prior == null) cell else prior).value
  }
}
