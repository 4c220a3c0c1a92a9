package graft.core

import org.apache.spark.sql.DataFrame

/** Overlapped driver collects for index builds.
  *
  * Several ANN index builds issue two independent, driver-blocking
  * collects before their scan (a query set and a centroid/codebook
  * sample) — each a tiny result but a full round of Spark job
  * latency. [[BuildCollect]] submits one of them as a concurrent
  * Spark job (the driver supports concurrent actions) so the build
  * pays ONE round of latency; results are driver arrays, so overlap
  * cannot affect plan determinism.
  */
private[graft] object Builds {

  /** Dedicated daemon pool for overlapped index-build collects: the
    * bodies BLOCK on Spark jobs, which would starve
    * `ExecutionContext.global`'s shared fork-join workers under
    * concurrent builds; a cached pool of named daemon threads grows
    * with in-flight builds and idles away after.
    */
  private lazy val buildEc = scala.concurrent.ExecutionContext
    .fromExecutorService(java.util.concurrent.Executors.newCachedThreadPool(
      (r: Runnable) => {
        val t = new Thread(r, "graft-build-collect")
        t.setDaemon(true)
        t
      }))

  /** An index-build collect submitted as a concurrent Spark job. The
    * body runs with a clone of the SUBMITTING thread's ENTIRE
    * local-property map (job group, pool, tags, execution id, any
    * caller-set keys): cached-pool threads inherit the map of
    * whatever thread happened to create them and keep later
    * mutations across reuse, so anything short of a wholesale
    * replace can mis-attribute or mis-schedule the background job —
    * a caller's `cancelJobGroup`/`cancelJobsWithTag` would miss it
    * or kill an unrelated one. A unique job tag is added on top so
    * [[cancel]] can reach this job alone; the map is reset to empty
    * after, leaving the pooled thread clean for the next build. Wrap
    * the main-thread build in [[withBuild]] so a failure there
    * cancels rather than orphans the background job. [[await]]
    * memoizes, and rethrows the body's failure if it was the side
    * that broke.
    */
  private[graft] final class BuildCollect[A](sc: org.apache.spark.SparkContext,
      body: => A) {
    private val tag = "graft-build-collect-" + java.util.UUID.randomUUID()
    private val inherited = org.apache.spark.graft.ContextBridge
      .cloneLocalProperties(sc)
    private val fut = scala.concurrent.Future {
      scala.concurrent.blocking {
        org.apache.spark.graft.ContextBridge.installLocalProperties(sc, inherited)
        sc.addJobTag(tag)
        try body
        finally org.apache.spark.graft.ContextBridge.clearLocalProperties(sc)
      }
    }(buildEc)
    def await(): A =
      scala.concurrent.Await.result(fut,
        scala.concurrent.duration.Duration.Inf)
    /** Best-effort: kills the tagged job if it is running; a body
      * queued behind the cancel simply runs to an unobserved result.
      */
    def cancel(): Unit = sc.cancelJobsWithTag(tag)
  }

  private[graft] def buildCollect[A](df: DataFrame)(body: => A): BuildCollect[A] =
    new BuildCollect[A](df.sparkSession.sparkContext, body)

  /** Run the main-thread side of an overlapped build; if it throws
    * before the background collect is awaited, cancel that job instead
    * of leaving it running unobserved.
    */
  private[graft] def withBuild[A, B](b: BuildCollect[A])(main: => B): B =
    try main
    catch { case t: Throwable => b.cancel(); throw t }
}
