package graft.examples

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Dev probe: minHashCandidatesCollapsed cost decomposition on the
  * copy-heavy scale corpora (r18). Backs SCALING.md's round-18
  * minhash-collapse section: where does the collapsed form's wall go
  * — banding distinct content, pair expansion, output sort — and how
  * large is each form's output. Run with SPARK_GRAFT_SF_DIR at
  * target/scale10 / scale100 / skew10.
  */
object MinhashCollapseProbe {
  def main(args: Array[String]): Unit = {
    val spark = ProbeUtil.benchSession("minhash-collapse-probe")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/repo/target/scale100")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt

    def time(tag: String)(f: => DataFrame): Unit = {
      val ts = (1 to reps).map { _ =>
        graft.core.OpCaches.release(); spark.catalog.clearCache()
        val t0 = System.nanoTime()
        f.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"MHPROBE $tag median ${graft.Bench.median(ts)}%.2f s  " +
        ts.map(t => f"$t%.2f").mkString("[", ", ", "]"))
    }

    def docs = graft.Tables.documents(spark, dir)
    println(s"MHPROBE corpus $dir rows ${docs.count()}")
    println("MHPROBE output rows collapsed: " +
      Dedup.minHashCandidatesCollapsed(docs, dupGate = -1.0).count())
    graft.core.OpCaches.release()

    // warm codegen/JIT once
    Dedup.minHashCandidatesCollapsed(docs, dupGate = -1.0)
      .write.format("noop").mode("overwrite").save()
    graft.core.OpCaches.release()

    // probed-bounds sort at k x defaultParallelism partitions: pair
    // mass per id_a DECAYS linearly (id_a is the least member), so at
    // 1x the first partition is a ~2x straggler; finer partitions let
    // the scheduler pack the skew
    def dense(df: DataFrame, k: Int): DataFrame = {
      val maxId = docs.agg(max(col("doc_id"))).head().getLong(0)
      val parts = k * spark.sparkContext.defaultParallelism
      val width = (maxId + 1 + parts - 1) / parts
      graft.core.StaticRange.sortByKnownDomain(df,
        (col("id_a").cast("long") / lit(math.max(1L, width))).cast("int"),
        parts.toInt, Seq(col("id_a").asc, col("id_b").asc))
    }
    time("collapsed_nosort")(
      Dedup.minHashCandidatesCollapsed(docs, dupGate = -1.0))
    time("collapsed_sorted")(
      Dedup.minHashCandidatesCollapsed(docs, dupGate = -1.0)
        .orderBy("id_a", "id_b"))
    for (k <- Seq(1, 4, 8)) time(s"collapsed_dense${k}x")(
      dense(Dedup.minHashCandidatesCollapsed(docs, dupGate = -1.0), k))
    // incremental family: direct vs collapsed, unsorted (the r18
    // registered batch split: doc_id%5 plays the ingest)
    def nd = docs.filter(col("doc_id") % 5 === 0)
    def cp = docs.filter(col("doc_id") % 5 =!= 0)
    time("inc_direct_nosort")(
      Dedup.incrementalMinHashCandidates(nd, cp))
    time("inc_collapsed_nosort")(
      Dedup.incrementalMinHashCandidatesCollapsed(nd, cp, dupGate = -1.0))
    println("MHPROBE inc output rows: " +
      Dedup.incrementalMinHashCandidatesCollapsed(nd, cp, dupGate = -1.0)
        .count())
    graft.core.OpCaches.release()
    time("inc_collapsed_dense8x")(dense(
      Dedup.incrementalMinHashCandidatesCollapsed(nd, cp, dupGate = -1.0), 8))
    time("inc_collapsed_sorted")(
      Dedup.incrementalMinHashCandidatesCollapsed(nd, cp, dupGate = -1.0)
        .orderBy("id_a", "id_b"))
    // the simhash twin under the identical harness, for the cross-
    // family comparison SCALING quotes
    time("simhash_nosort")(
      Dedup.simHashPairsCollapsed(docs, dupGate = -1.0,
        signature = graft.functions.HashFunctions.simhash_md5))
    time("simhash_sorted")(
      Dedup.simHashPairsCollapsed(docs, dupGate = -1.0,
        signature = graft.functions.HashFunctions.simhash_md5)
        .orderBy("id_a", "id_b"))
    for (k <- Seq(1, 4, 8)) time(s"simhash_dense${k}x")(
      dense(Dedup.simHashPairsCollapsed(docs, dupGate = -1.0,
        signature = graft.functions.HashFunctions.simhash_md5), k))
    spark.stop()
  }
}
