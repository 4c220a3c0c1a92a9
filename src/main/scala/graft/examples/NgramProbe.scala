package graft.examples

import org.apache.spark.sql.SparkSession

import graft.Tables
import graft.operators.Dedup

/** Dev probe: interleaved A/B of the two ngramJaccardPairs forms
  * (self-join vs posting-list) in ONE session — cross-session totals
  * on this machine swing ±10-15% with ambient load, so only
  * same-session alternation is trustworthy. Also times the posting
  * form with `spark.sql.objectHashAggregate.sortBased.fallbackThreshold`
  * raised, to separate the collect_list fallback-sort cost from the
  * shape itself. Prints per-variant medians; SCALING.md records the
  * conclusion.
  */
object NgramProbe {
  import ProbeUtil.median

  def main(args: Array[String]): Unit = {
    val spark = ProbeUtil.benchSession("ngram-probe")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "5").toInt
    val docs = Tables.documents(spark, dir)
    val fallbackKey = "spark.sql.objectHashAggregate.sortBased.fallbackThreshold"
    // the A/B's low side is Spark's OWN default (128), pinned
    // explicitly — benchSession already raises the session value
    val defaultFallback = "128"

    def run(tag: String): Double = {
      graft.core.OpCaches.release()
      spark.catalog.clearCache()
      System.gc()
      val t0 = System.nanoTime()
      val df = tag match {
        case "selfjoin" =>
          Dedup.ngramJaccardPairs(docs, minJaccard = 0.5, maxDocFreq = Some(5))
        case "postings" | "postings_hiFallback" =>
          Dedup.ngramJaccardPairsPostings(docs, minJaccard = 0.5, maxDocFreq = Some(5))
      }
      df.orderBy("id_a", "id_b").write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }

    // warm-up outside timing
    run("selfjoin"); run("postings")
    val variants = Seq("selfjoin", "postings", "postings_hiFallback")
    val times = scala.collection.mutable.Map[String, Vector[Double]]()
      .withDefaultValue(Vector.empty)
    for (_ <- 1 to reps; v <- variants) {  // interleave: A,B,C,A,B,C,...
      if (v == "postings_hiFallback") spark.conf.set(fallbackKey, "10000000")
      else spark.conf.set(fallbackKey, defaultFallback)
      times(v) :+= run(v)
    }
    spark.conf.set(fallbackKey, defaultFallback)
    for (v <- variants)
      println(f"NGRAM_AB $v median=${median(times(v))}%.2f s " +
        s"all=[${times(v).map(t => f"$t%.2f").mkString(", ")}]")
    spark.stop()
  }
}
