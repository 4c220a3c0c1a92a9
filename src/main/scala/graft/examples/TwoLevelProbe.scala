package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** Dev probe: flat vs two-level corpus assignment cost in the regime
  * two-level targets — a centroid table past the 256 literal limit
  * (the sqrt-law count crosses it around 4k vectors), where flat
  * assignment must run the joined broadcast + bounded-heap shape but
  * the two-level coarse step still compiles to literals
  * (S ~ 2 sqrt(C) stays far under the limit).
  *
  * Run: SPARK_GRAFT_SF_DIR=... sbt "runMain graft.examples.TwoLevelProbe"
  * Prints per-variant median wall seconds over 5 reps; numbers back
  * the round-10 two-level section of SCALING.md.
  */
object TwoLevelProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption
      .orElse(sys.env.get("SPARK_GRAFT_SF_DIR"))
      .getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val n = e.count()
    val c = Similarity.autoCentroids(n)
    // S at the cost-minimizing ~sqrt(2C); P=2 per SCALING round 5
    val s = math.max(4, math.ceil(math.sqrt(2.0 * c)).toInt)
    println(s"n=$n C=$c (literal limit 256) S=$s P=2")

    val prep = Similarity.prepared(e, "embedding", "vec_id")
      .transform(graft.core.OpCaches.persistTracked)
    prep.count() // materialize the cache outside the timed region
    val cent = Similarity.centroidSample(prep, c, "vec_id")

    def time(label: String)(mk: => org.apache.spark.sql.DataFrame): Unit = {
      val times = (1 to 5).map { _ =>
        val t0 = System.nanoTime()
        mk.select(count(lit(1))).collect()
        (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"$label%-28s median ${times(2)}%.3f s (min ${times.head}%.3f max ${times.last}%.3f)")
    }

    for (cc <- Seq(32, 64, 96, 128, c); take <- Seq(1, 4)) {
      val ct = Similarity.centroidSample(prep, cc, "vec_id")
      // ungated collect: the probe MEASURES the over-budget literal
      // form (the gated paths would refuse to build it)
      val rows = Similarity.collectCentroidRows(ct, cc)
      time(s"C=$cc take=$take literal")(
        Similarity.nearestCentroidsFromRows(prep, rows.get, take, "vec_id"))
      time(s"C=$cc take=$take joined")(
        Similarity.nearestCentroidsJoined(prep, ct, take, "vec_id"))
    }
    time(s"C=$c take=1 two-level")(
      Similarity.nearestCentroidsTwoLevel(prep, cent, 1, "vec_id",
        numSuper = s, superProbes = 2))

    graft.core.OpCaches.release()
    spark.stop()
  }
}
