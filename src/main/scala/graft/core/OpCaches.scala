package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Lifecycle registry for operator-held caches.
  *
  * Several operators persist an intermediate consumed more than once
  * in their own plan (minhash signatures, the exploded-shingle frame,
  * simhash signatures, the prepared IVF corpus). The cache must
  * outlive the call — the result is lazy — so the operator cannot
  * unpersist it itself; but a long-lived session that never releases
  * accumulates one MEMORY_AND_DISK projection per call.
  *
  * Operators route persists through [[persistTracked]]; callers
  * release them after materializing results:
  *
  *   - [[release]]: unpersist everything tracked (what Bench does
  *     between reps, and SparkSuite between tests);
  *   - [[materializeAndRelease]]: force the result through the noop
  *     sink while the caches are live, then release — the one-call
  *     form for fire-and-forget pipelines.
  *
  * [[persistTracked]] also skips plans that are ALREADY cached
  * (storageLevel is a plan-level lookup), so calling an operator
  * twice in one session reuses the first call's cache instead of
  * logging "already cached" warnings.
  */
object OpCaches {
  private val tracked = scala.collection.mutable.LinkedHashSet[DataFrame]()

  private[graft] def persistTracked(df: DataFrame): DataFrame = synchronized {
    // storageLevel is a plan-level cache lookup: if an equivalent plan
    // is already cached (an earlier operator call, or the caller's own
    // persist) reuse it and leave its ownership alone — persisting
    // again would just log "already cached" and double-track
    if (df.storageLevel == StorageLevel.NONE) {
      df.persist(StorageLevel.MEMORY_AND_DISK)
      tracked += df
    }
    df
  }

  /** [[persistTracked]] + an immediate materialization of the cache.
    *
    * A LAZY persist consumed by several downstream branches of one
    * query triple-pays under AQE: the exchange stages of the
    * consuming branches materialize CONCURRENTLY, all race the still-
    * cold cache, and each computes every partition of the cached plan
    * from source (cache population is per-partition first-writer;
    * concurrent full scans mostly miss each other). JobGapProbe on
    * ngram_jaccard_pairs (round 13): three overlapping ~1 s jobs for
    * a posting build whose single pass costs ~0.4 s. Paying one
    * cheap count() job up front pins every consumer to cache reads.
    * Use for frames with MULTIPLE concurrent consumers; keep the lazy
    * form when consumers run strictly in sequence.
    */
  private[graft] def persistTrackedEager(df: DataFrame): DataFrame = {
    val cached = persistTracked(df)
    cached.count(): Unit
    cached
  }

  /** Number of currently tracked cached frames (diagnostics/tests). */
  def trackedCount: Int = synchronized(tracked.size)

  /** Unpersist every operator-held cache registered since the last
    * release. Non-blocking; safe to call with queries in flight that
    * no longer need the cache (Spark recomputes if one does).
    */
  def release(): Unit = synchronized {
    tracked.foreach(_.unpersist(blocking = false))
    tracked.clear()
  }

  /** Materialize `df` (noop sink: full computation, no driver
    * collect) while the operator caches are live, then release them.
    * Returns `df` for further use — downstream re-executions recompute
    * from source.
    */
  def materializeAndRelease(df: DataFrame): DataFrame = {
    df.write.format("noop").mode("overwrite").save()
    release()
    df
  }
}
