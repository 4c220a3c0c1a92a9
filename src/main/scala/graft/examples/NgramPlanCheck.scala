package graft.examples

/** Dev scratch: count duplicated HOF chains in ngram_jaccard_pairs'
  * optimized plan (the InferFiltersFromGenerate signature).
  */
object NgramPlanCheck {
  def main(args: Array[String]): Unit = {
    val spark = ProbeUtil.benchSession("ngram-plan-check")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val p = graft.SparkEntry.queries("ngram_jaccard_pairs")(spark, dir)
      .queryExecution.optimizedPlan.toString
    def cnt(s: String) = s.sliding("slice(".length).count(_ == "slice(")
    println(s"NGRAM_PLAN slice-count=${cnt(p)} len=${p.length}")
    println(p.take(6000))
    spark.stop()
  }
}
