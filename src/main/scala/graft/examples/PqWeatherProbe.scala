package graft.examples

import org.apache.spark.sql.SparkSession

/** Attribution probe for the ANN-PQ family's contention sensitivity
  * (VERDICT r18: `ann_ivfpq_rerank` / `ann_ivfpq_topk` inflate 30–50%
  * under ambient load while neighbor rows stay flat — two recorded
  * boards in a row; the suspected per-query ADC distance-table
  * collect at Pq.scala:523 does NOT run in the registered rows, which
  * take the literal regime at numCentroids = 64 ≤ 256).
  *
  * Method: each registered query call splits into two measured
  * phases —
  *   - PLAN: invoking `SparkEntry.queries(name)` — for the PQ family
  *     this includes the driver collect round (the overlapped corpus
  *     TakeOrdered + query-set collect of `ivfPqLiteral`) and the
  *     driver-side ADC/probe arithmetic;
  *   - EXEC: the noop-sink action — scan work plus whole-stage
  *     codegen compilation of the fused literal encode+argmin
  *     projection (64 centroids × dim 64 ≈ 4k literal dot terms, the
  *     largest generated method on the board).
  * Phases are measured idle, then under an in-process CPU load (N
  * spinner threads competing for the same cores ambient contention
  * would), then idle again to catch drift. Whichever phase carries
  * the inflation names the mechanism: driver job rounds (PLAN) vs
  * codegen/JIT + scan scheduling (EXEC).
  *
  * Usage: runMain graft.examples.PqWeatherProbe <sfDir> [reps] [loadThreads]
  */
object PqWeatherProbe {
  private val Rows = Seq("ann_ivfpq_topk", "ann_ivfpq_rerank",
    "ann_ivf_topk", "ann_pq_topk", "j4_cartesian")

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0)
      else sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = if (args.length > 1) args(1).toInt else 5
    val loadThreads = if (args.length > 2) args(2).toInt else 24
    val spark = ProbeUtil.benchSession("PqWeatherProbe")

    def measure(name: String): (Double, Double, Double) = {
      val t0 = System.nanoTime()
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      val t1 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      val t2 = System.nanoTime()
      // repeat action on the SAME plan: generated code is compiled,
      // so exec − exec2 ≈ the codegen/JIT compile share of the first
      // action (operator caches are still live for both actions)
      df.write.format("noop").mode("overwrite").save()
      val t3 = System.nanoTime()
      graft.core.OpCaches.release()
      spark.sharedState.cacheManager.clearCache()
      ((t1 - t0) / 1e9, (t2 - t1) / 1e9, (t3 - t2) / 1e9)
    }

    def pass(label: String): Map[String, (Double, Double, Double)] = {
      val out = Rows.map { name =>
        val samples = (1 to reps).map(_ => measure(name))
        val plan = ProbeUtil.median(samples.map(_._1))
        val exec = ProbeUtil.median(samples.map(_._2))
        val exec2 = ProbeUtil.median(samples.map(_._3))
        println(f"[$label] $name%-24s plan $plan%6.3f  exec $exec%6.3f  " +
          f"exec2 $exec2%6.3f  total ${plan + exec}%6.3f")
        name -> (plan, exec, exec2)
      }.toMap
      out
    }

    // warm pass: JVM/code caches, store entries, parquet footers
    Rows.foreach(measure)

    val idle1 = pass("idle-1")

    @volatile var stop = false
    val spinners = (1 to loadThreads).map { i =>
      val t = new Thread(() => {
        var x = i.toLong
        while (!stop) { x = x * 6364136223846793005L + 1442695040888963407L }
        if (x == 42L) println(x) // keep the loop un-eliminable
      }, s"spin-$i")
      t.setDaemon(true)
      t.start()
      t
    }
    val loaded = pass(s"loaded-$loadThreads")
    stop = true
    spinners.foreach(_.join(1000))

    val idle2 = pass("idle-2")

    println(f"%n${"row"}%-24s ${"planX"}%6s ${"execX"}%6s  (loaded / mean idle, per phase)")
    Rows.foreach { name =>
      val ip = (idle1(name)._1 + idle2(name)._1) / 2
      val ie = (idle1(name)._2 + idle2(name)._2) / 2
      val lp = loaded(name)._1
      val le = loaded(name)._2
      println(f"$name%-24s ${lp / math.max(ip, 1e-9)}%6.2f ${le / math.max(ie, 1e-9)}%6.2f" +
        f"   idle ($ip%5.3f, $ie%5.3f)  loaded ($lp%5.3f, $le%5.3f)")
    }
    println("PQWEATHER_OK")
    spark.stop()
  }
}
