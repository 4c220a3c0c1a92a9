package org.apache.spark.graft

import java.util.Properties

import org.apache.spark.SparkContext

/** Thread-local scheduling-property bridge. `SparkContext.
  * {get,set}LocalProperties` are `private[spark]`; pooled threads
  * that submit Spark jobs on a caller's behalf need the WHOLE map —
  * a per-key whitelist misses keys like `spark.sql.execution.id` or
  * caller-set custom properties, and cached-pool threads additionally
  * inherit whatever map their creating thread happened to carry.
  */
object ContextBridge {

  /** Copy of the calling thread's full local-property map. */
  def cloneLocalProperties(sc: SparkContext): Properties = {
    val out = new Properties()
    out.putAll(sc.getLocalProperties)
    out
  }

  /** Replace the calling thread's local-property map wholesale. A
    * fresh clone is installed so the caller's snapshot is never
    * mutated by later `setLocalProperty` calls on this thread.
    */
  def installLocalProperties(sc: SparkContext, snapshot: Properties): Unit = {
    val fresh = new Properties()
    fresh.putAll(snapshot)
    sc.setLocalProperties(fresh)
  }

  /** Reset the calling thread's local-property map to empty. */
  def clearLocalProperties(sc: SparkContext): Unit =
    sc.setLocalProperties(new Properties())
}
