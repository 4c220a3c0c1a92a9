package graft.examples

import org.apache.spark.sql.functions._

/** Dev probe: vocab_encode stage decomposition + plan inspection (the
  * InferFiltersFromGenerate check the winnow trap taught us to run on
  * every new explode chain).
  */
object VocabProbe {
  def main(args: Array[String]): Unit = {
    val spark = ProbeUtil.benchSession("vocab-probe")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    def run(mk: => org.apache.spark.sql.DataFrame): Double = {
      graft.core.OpCaches.release(); spark.catalog.clearCache()
      val t0 = System.nanoTime()
      mk.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    import graft.functions.TextFunctions
    import graft.operators.Vocab
    val docs = graft.Tables.documents(spark, dir)
    def toksOnly = docs.select(col("doc_id"),
      posexplode(TextFunctions.tokensNonEmpty(col("text"))))
    def vocabOnly = Vocab.buildVocab(docs, 100)
    def unsorted = Vocab.encodeTokens(docs, Vocab.buildVocab(docs, 100))
    def registered = graft.SparkEntry.queries("vocab_encode")(spark, dir)
    for (rep <- 1 to 3) {
      println(f"explode_only   ${run(toksOnly)}%.2f")
      println(f"vocab_only     ${run(vocabOnly)}%.2f")
      println(f"enc_unsorted   ${run(unsorted)}%.2f")
      println(f"registered     ${run(registered)}%.2f")
    }
    spark.stop()
  }
}
