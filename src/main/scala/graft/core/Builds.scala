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
    * body runs with the SUBMITTING thread's scheduling properties
    * (job group, description, pool, tags — pooled threads would
    * otherwise carry whatever the thread-creation context had, so a
    * caller's `cancelJobGroup`/`cancelJobsWithTag` would miss this
    * job or kill an unrelated one) plus a unique job tag so
    * [[cancel]] can reach it; wrap the main-thread build in
    * [[withBuild]] so a failure there cancels rather than orphans the
    * background job. [[await]] memoizes, and rethrows the body's
    * failure if it was the side that broke.
    */
  private[graft] final class BuildCollect[A](sc: org.apache.spark.SparkContext,
      body: => A) {
    private val tag = "graft-build-collect-" + java.util.UUID.randomUUID()
    private val inherited = Seq("spark.jobGroup.id", "spark.job.description",
      "spark.job.interruptOnCancel", "spark.scheduler.pool",
      "spark.job.tags")
      .map(k => k -> sc.getLocalProperty(k))
    private val fut = scala.concurrent.Future {
      scala.concurrent.blocking {
        inherited.foreach { case (k, v) => sc.setLocalProperty(k, v) }
        sc.addJobTag(tag)
        try body
        finally {
          sc.removeJobTag(tag)
          inherited.foreach { case (k, _) => sc.setLocalProperty(k, null) }
        }
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
