package graft.examples

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** Dev probe: semantic_dedup / embedding_neardup_pairs sf0.1 floor
  * decomposition after the r18 collapse gates — how much of the new
  * floor is the duplicate-mass probe job, the probed-bounds sort, and
  * the componentsCollapsed direct route vs the pre-r18 composition.
  */
object SemDedupFloorProbe {
  def main(args: Array[String]): Unit = {
    val spark = ProbeUtil.benchSession("semdedup-floor-probe")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "5").toInt
    def time(tag: String)(f: => DataFrame): Unit = {
      val ts = (1 to reps).map { _ =>
        graft.core.OpCaches.release(); spark.catalog.clearCache()
        val t0 = System.nanoTime()
        f.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"SDPROBE $tag median ${graft.Bench.median(ts)}%.2f s  " +
        ts.map(t => f"$t%.2f").mkString("[", ", ", "]"))
    }
    def e = graft.Tables.embeddings(spark, dir)
    // warm
    graft.SparkEntry.queries("semantic_dedup")(spark, dir)
      .write.format("noop").mode("overwrite").save()
    graft.core.OpCaches.release()
    // pre-r18 composition: CC over direct pairs, join back
    time("old_composition") {
      val comp = graft.operators.Components.connectedComponents(
        Similarity.ivfNearDupPairs(e, threshold = 0.3,
          assignments = 24, minSharedCells = 2))
        .withColumnRenamed("id", "vec_id")
        .withColumnRenamed("label", "__cc")
      e.join(comp, Seq("vec_id"), "left")
        .select(col("vec_id"),
          coalesce(col("__cc"), col("vec_id")).as("component"),
          (coalesce(col("__cc"), col("vec_id")) === col("vec_id"))
            .cast("int").as("is_survivor"))
        .orderBy("vec_id")
    }
    // new registered form (gate probe + componentsCollapsed direct)
    time("registered")(graft.SparkEntry.queries("semantic_dedup")(spark, dir))
    // componentsCollapsed with the probe skipped (endpoint direct)
    time("direct_nogate") {
      Similarity.ivfNearDupComponentsCollapsed(e, threshold = 0.3,
        assignments = 24, minSharedCells = 2, dupGate = 2.0)
        .select(col("id").as("vec_id"), col("label").as("component"),
          (col("label") === col("id")).cast("int").as("is_survivor"))
        .orderBy("vec_id")
    }
    // pairs row: registered vs gate-skipped vs pre-r18 orderBy form
    time("pairs_registered")(
      graft.SparkEntry.queries("embedding_neardup_pairs")(spark, dir))
    time("pairs_old")(
      Similarity.ivfNearDupPairs(e, threshold = 0.3,
        assignments = 24, minSharedCells = 2).orderBy("id_a", "id_b"))
    spark.stop()
  }
}
