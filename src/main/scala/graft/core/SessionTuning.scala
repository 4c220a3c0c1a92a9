package graft.core

import org.apache.spark.sql.SparkSession

/** Per-operator session tuning without conf leakage.
  *
  * `spark.sql.adaptive.enabled` (AQE) is read at ACTION time, so an
  * operator cannot scope it to its own lazy DataFrame by toggling the
  * caller's conf — the toggle would leak into whatever the session
  * runs next. A child `newSession()` shares the SparkContext, the
  * catalog state and the block manager, but carries an INDEPENDENT
  * SQL conf seeded from the context's conf (builder-time settings —
  * shuffle partitions, range-exchange sampling — carry over; runtime
  * `conf.set` calls on the parent do not), so a frame built against
  * the child executes under the child's planning flags no matter when
  * or where the action fires.
  *
  * [[boundedPlan]] returns the caller's cached AQE-off child for
  * operators whose physical plans AQE cannot improve: every join
  * explicitly broadcast, every exchange either a bounded top-k
  * partial aggregate (≤ k rows per group per task) or a
  * REPARTITION_BY_NUM static route — nothing to coalesce, no skew to
  * split, no join side to switch. For those plans AQE only adds its
  * per-stage logical re-optimization on the driver, a fixed tax per
  * exchange round that the ANN family pays 3-6 times per query
  * (interleaved A/B, round 13, sf0.1 warm: ann_ivfpq_rerank
  * 1.46 → 1.09 s, ann_ivfpq_build 0.84 → 0.72 s, ann_ivf_topk
  * 0.56 → 0.45 s). At 100 TB the same holds: these plan shapes are
  * scale-invariant, and the stages AQE would inspect stay bounded.
  * Operators with data-dependent exchanges (range sorts over
  * corpus-sized output, skewable hash joins) should stay on the
  * parent session.
  */
object SessionTuning {
  private val boundedCache =
    new java.util.concurrent.ConcurrentHashMap[SparkSession, SparkSession]()

  /** The AQE-off child of `s` (cached per parent session).
    *
    * `newSession()` snapshots the SQL conf once at creation, so
    * RUNTIME `conf.set` calls on the parent would never reach the
    * cached child — an A/B toggling e.g. `graft.smallScanRebalance`
    * at runtime would silently measure the stale value on every
    * query routed through here. Every lookup therefore re-syncs the
    * parent's `graft.*` runtime knobs (set AND unset) into the
    * child; Spark's own confs keep creation-time snapshot semantics
    * on purpose (the child exists precisely to hold AQE off).
    */
  def boundedPlan(s: SparkSession): SparkSession = {
    if (boundedCache.size > 64) boundedCache.clear()
    val child = boundedCache.computeIfAbsent(s, { base =>
      val c = base.newSession()
      c.conf.set("spark.sql.adaptive.enabled", "false")
      c
    })
    val parentKnobs = s.conf.getAll.filter(_._1.startsWith("graft."))
    child.conf.getAll.keysIterator
      .filter(k => k.startsWith("graft.") && !parentKnobs.contains(k))
      .foreach(child.conf.unset)
    parentKnobs.foreach { case (k, v) =>
      if (!child.conf.getOption(k).contains(v)) child.conf.set(k, v)
    }
    child
  }
}
