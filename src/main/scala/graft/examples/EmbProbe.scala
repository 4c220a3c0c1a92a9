package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Similarity

/** Dev probe: stage-by-stage wall time of embedding_neardup_pairs at
  * sf0.1 under bench-like session conf (assignment, candidate vote,
  * verify join timed separately via noop materialization of each
  * prefix).
  */
object EmbProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "2m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t(tag: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"EMB_PHASE $tag ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    val dir = "/root/testdata/sf0.1"
    for (rep <- 1 to 2) {
      println(s"=== rep $rep")
      graft.core.OpCaches.release()
      spark.catalog.clearCache()
      val e = Tables.embeddings(spark, dir)
      val cp = Similarity.prepared(e, "embedding", "vec_id")
        .transform(graft.core.OpCaches.persistTracked)
      t("prepare+count") { cp.count() }
      val cent = {
        val c = Similarity.autoCentroids(cp.count())
        println(s"EMB_C $c")
        cp.orderBy(col("vec_id")).limit(c)
          .select(col("vec_id").as("cent_id"), col("v").as("cv"), col("n2").as("cn2"))
      }
      // inline mirror of Similarity.nearestCentroids (private)
      val multi = cp.join(broadcast(cent))
        .select(col("vec_id"), col("v"), col("n2"), col("cent_id"),
          Similarity.cosineQ(Similarity.dotQ(col("v"), col("cv")),
            col("n2"), col("cn2")).as("ccos"))
        .groupBy(col("vec_id"), col("v"), col("n2"))
        .agg(graft.functions.TopKFunctions.top_k(col("ccos"), col("cent_id"), 24).as("top"))
        .select(col("vec_id"), col("v"), col("n2"),
          explode(col("top").getField("id")).as("cent_id"))
      t("assign24") { multi.write.format("noop").mode("overwrite").save() }
      val m2 = multi.select(col("cent_id"), col("vec_id"))
      val pairs = m2.select(col("cent_id"), col("vec_id").as("id_a"))
        .join(m2.select(col("cent_id"), col("vec_id").as("id_b")), Seq("cent_id"))
        .filter(col("id_a") < col("id_b"))
        .groupBy(col("id_a"), col("id_b"))
        .agg(count(lit(1)).as("__shared"))
        .filter(col("__shared") >= 2)
        .select(col("id_a"), col("id_b"))
      t("candidates") { pairs.write.format("noop").mode("overwrite").save() }
      t("full_query") {
        Similarity.ivfNearDupPairs(e, threshold = 0.3,
          assignments = 24, minSharedCells = 2)
          .orderBy("id_a", "id_b")
          .write.format("noop").mode("overwrite").save()
      }
      graft.core.OpCaches.release()
    }

    // recall/cost over the C (centroid count) knob at fixed A/M: the
    // candidate volume is ~n^2 A^2 / C, so doubling C halves the
    // dominant shuffle — measure what it costs in recall
    val e = Tables.embeddings(spark, dir)
    val prep = Similarity.prepared(e, "embedding", "vec_id").persist()
    val truth = prep.select(col("vec_id").as("id_a"), col("v").as("va"), col("n2").as("na2"))
      .join(prep.select(col("vec_id").as("id_b"), col("v").as("vb"), col("n2").as("nb2")))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        Similarity.cosineQ(Similarity.dotQ(col("va"), col("vb")),
          col("na2"), col("nb2")).as("cosine"))
      .filter(col("cosine") >= 0.3)
      .select("id_a", "id_b").cache()
    val nTruth = truth.count()
    println(s"exact_pairs=$nTruth")
    for ((c, a, m) <- Seq((179, 24, 2), (269, 24, 2), (358, 24, 2),
        (358, 20, 2), (506, 24, 2))) {
      graft.core.OpCaches.release(); spark.catalog.clearCache()
      truth.cache(); truth.count()
      val t0 = System.nanoTime()
      val got = Similarity.ivfNearDupPairs(e, threshold = 0.3,
        numCentroids = c, assignments = a, minSharedCells = m)
        .select("id_a", "id_b").cache()
      val nGot = got.count()
      val secs = (System.nanoTime() - t0) / 1e9
      val hits = truth.intersect(got).count()
      println(f"neardup C=$c A=$a M=$m recall=${hits.toDouble / nTruth}%.3f " +
        f"pairs=$nGot time=$secs%.2fs")
    }
    spark.stop()
  }
}
