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
    // round-13 A/B: what to persist across the three toks consumers —
    // the exploded rows (registered), the token ARRAYS (5000 rows,
    // explode re-runs per consumer off the cache), or nothing
    def inlineVocab(toks: org.apache.spark.sql.DataFrame) = toks
      .groupBy(col("term")).agg(count(lit(1)).as("freq"))
      .agg(graft.functions.TopKFunctions
        .top_k_tag(col("freq").cast("double"), col("term"), 100).as("top"))
      .select(posexplode(col("top")))
      .select((col("pos") + 1).cast("int").as("token_id"), col("col.tag").as("term"))
    def finish(toks: org.apache.spark.sql.DataFrame) = toks
      .join(broadcast(inlineVocab(toks.select(col("term")))), Seq("term"), "left")
      .select(col("doc_id"), col("pos").cast("int").as("pos"),
        coalesce(col("token_id"), lit(0)).as("token_id"))
      .orderBy(col("doc_id").asc, col("pos").asc)
    def arrPersist = {
      val arr = docs.select(col("doc_id"),
        graft.functions.TextFunctions.tokensNonEmpty(col("text")).as("__ws"))
        .transform(graft.core.OpCaches.persistTrackedEager)
      finish(arr.select(col("doc_id"), posexplode(col("__ws")))
        .withColumnRenamed("col", "term"))
    }
    def noPersist =
      finish(docs.select(col("doc_id"),
        posexplode(graft.functions.TextFunctions.tokensNonEmpty(col("text"))))
        .withColumnRenamed("col", "term"))
    // (D) vocabulary as ONE broadcast map row - no join operator, no
    // persist; (E) = D + StaticRange sort (pid from a collected max,
    // no sampling job over the encode chain)
    def vmap = inlineVocab(docs.select(
      explode(graft.functions.TextFunctions.tokensNonEmpty(col("text"))).as("term")))
      .agg(map_from_entries(collect_list(struct(col("term"), col("token_id"))))
        .as("__vm"))
    def encRows = docs.select(col("doc_id"),
      posexplode(graft.functions.TextFunctions.tokensNonEmpty(col("text"))))
      .withColumnRenamed("col", "term")
      .crossJoin(broadcast(vmap))
      .select(col("doc_id"), col("pos").cast("int").as("pos"),
        coalesce(element_at(col("__vm"), col("term")), lit(0)).as("token_id"))
    def mapEnc = encRows.orderBy(col("doc_id").asc, col("pos").asc)
    def mapEncStatic = {
      val bound = docs.agg(max(col("doc_id"))).head().getLong(0) + 1
      val parts = 32
      graft.core.StaticRange.sortByKnownDomain(encRows,
        (col("doc_id") * parts / bound).cast("int"), parts,
        Seq(col("doc_id").asc, col("pos").asc))
    }
    for (rep <- 1 to 4) {
      println(f"explode_only   ${run(toksOnly)}%.2f")
      println(f"vocab_only     ${run(vocabOnly)}%.2f")
      println(f"enc_unsorted   ${run(unsorted)}%.2f")
      println(f"registered     ${run(registered)}%.2f")
      println(f"arr_persist    ${run(arrPersist)}%.2f")
      println(f"no_persist     ${run(noPersist)}%.2f")
      println(f"map_enc        ${run(mapEnc)}%.2f")
      println(f"map_enc_static ${run(mapEncStatic)}%.2f")
    }
    spark.stop()
  }
}
