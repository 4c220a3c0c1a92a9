package graft.examples

import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** Dev probe (r21): candidate-volume decomposition of the IVF cell
  * self-join family at sf0.1 — corpus size, centroid count, multi-
  * assign rows, per-cell pair volume (the join's output), distinct
  * candidate pairs before/after the minSharedCells vote, and scored
  * pairs past the threshold. These sizes decide which stage of the
  * dominant job (join explode vs pair aggregate vs cosine verify) is
  * worth attacking.
  */
object R21VolProbe {
  def main(args: Array[String]): Unit = {
    val spark = ProbeUtil.benchSession("r21-vol-probe")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val e = graft.Tables.embeddings(spark, dir)
    val cp = Similarity.prepared(e, "embedding", "vec_id")
    val n = cp.count()
    val dim = cp.select(size(col("v"))).head().getInt(0)
    val c = Similarity.autoCentroids(n)
    println(s"R21VOL n=$n dim=$dim autoCentroids=$c")
    val cent = Similarity.centroidSample(cp, c, "vec_id")
    val multi = Similarity.nearestCentroids(cp, cent, 24, "vec_id")
    val multiRows = multi.count()
    println(s"R21VOL multiRows=$multiRows (n x 24 = ${n * 24})")
    // per-cell sizes -> join output volume sum m_c^2 (ordered pairs m_c*(m_c-1)/2)
    val cells = multi.groupBy("cent_id").agg(count(lit(1)).as("m"))
    val agg = cells.agg(
      count(lit(1)).as("cells"),
      max(col("m")).as("maxCell"),
      avg(col("m")).as("avgCell"),
      sum(col("m") * (col("m") - 1) / 2).as("joinPairs")).head()
    println(s"R21VOL cells=${agg.getLong(0)} maxCell=${agg.getLong(1)} " +
      f"avgCell=${agg.getDouble(2)}%.1f joinPairRows=${agg.getDouble(3)}%.0f")
    val pairs = multi.select(col("cent_id"), col("vec_id").as("id_a"))
      .join(multi.select(col("cent_id"), col("vec_id").as("id_b")), Seq("cent_id"))
      .filter(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("__shared"))
    val distinctPairs = pairs.count()
    val votedPairs = pairs.filter(col("__shared") >= 2).count()
    println(s"R21VOL distinctCandidatePairs=$distinctPairs voted(>=2)=$votedPairs")
    val scored = Similarity.ivfNearDupPairs(e, threshold = 0.3,
      assignments = 24, minSharedCells = 2)
    println(s"R21VOL scoredPairs(threshold 0.3)=${scored.count()}")
    spark.stop()
  }
}
