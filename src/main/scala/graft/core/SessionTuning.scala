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

  /** The AQE-off child of `s` (cached per parent session). */
  def boundedPlan(s: SparkSession): SparkSession = {
    if (boundedCache.size > 64) boundedCache.clear()
    boundedCache.computeIfAbsent(s, { base =>
      val child = base.newSession()
      child.conf.set("spark.sql.adaptive.enabled", "false")
      child
    })
  }
}
