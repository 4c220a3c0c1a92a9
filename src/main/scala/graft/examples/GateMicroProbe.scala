package graft.examples

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.Tables

/** Dev scratch probe (r15): where do the 15 s of the curation gate
  * phase at the 10x corpus actually go? Micro-variants of the gate
  * subtree, interleaved.
  */
object GateMicroProbe {
  def main(args: Array[String]): Unit = {
    val spark = ProbeUtil.benchSession("gate-micro-probe")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/repo/target/scale10")
    val rounds = sys.env.getOrElse("REPS", "3").toInt
    def docs = Tables.documents(spark, dir)

    val variants: Seq[(String, () => DataFrame)] = Seq(
      "scan_only" -> (() => docs),
      "profile_nofloor" -> (() =>
        docs.select(col("doc_id"),
          graft.functions.RepetitionFunctions.repetition_profile(col("text"))
            .as("p"))),
      "profile_floor" -> (() =>
        graft.core.Parallelism.kernelFloor(docs).select(col("doc_id"),
          graft.functions.RepetitionFunctions.repetition_profile(col("text"))
            .as("p"))),
      "gate_ids_floor" -> (() =>
        graft.operators.Curation.gopherGate(
          graft.core.Parallelism.kernelFloor(docs), minTokens = 25)
          .filter(col("keep") === 1).select("doc_id")),
      "gated_semi_floor" -> (() =>
        docs.join(graft.operators.Curation.gopherGate(
          graft.core.Parallelism.kernelFloor(docs), minTokens = 25)
          .filter(col("keep") === 1).select("doc_id"),
          Seq("doc_id"), "left_semi")),
      "gate_ids_keep" -> (() =>
        graft.core.Parallelism.kernelFloor(docs)
          .filter(graft.functions.RepetitionFunctions
            .gopher_keep(col("text"), minTokens = 25))
          .select("doc_id")),
      "gated_semi_keep" -> (() =>
        docs.join(graft.core.Parallelism.kernelFloor(docs)
          .filter(graft.functions.RepetitionFunctions
            .gopher_keep(col("text"), minTokens = 25))
          .select("doc_id"),
          Seq("doc_id"), "left_semi")))

    val onlyV = sys.env.get("VARIANTS").map(_.split(",").map(_.trim).toSet)
    val chosen = variants.filter { case (n, _) => onlyV.forall(_.contains(n)) }
    val times = collection.mutable.Map[String, Vector[Double]]()
    for (r <- 0 to rounds; (n, mk) <- chosen) {
      graft.core.OpCaches.release(); spark.catalog.clearCache()
      val t0 = System.nanoTime()
      mk().write.format("noop").mode("overwrite").save()
      val t = (System.nanoTime() - t0) / 1e9
      if (r > 0) times(n) = times.getOrElse(n, Vector.empty) :+ t
    }
    chosen.foreach { case (n, _) =>
      val ts = times(n)
      println(f"PROBE $n%-18s med=${ProbeUtil.median(ts)}%.3f  (${ts.map(t => f"$t%.2f").mkString(" ")})")
    }
    spark.stop()
  }
}
