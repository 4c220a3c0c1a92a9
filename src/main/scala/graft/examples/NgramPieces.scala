package graft.examples

import org.apache.spark.sql.functions._

/** Dev scratch: time the postings pipeline piece by piece from a warm
  * cache, to attribute the consumer-stage cost (round 13).
  */
object NgramPieces {
  def main(args: Array[String]): Unit = {
    val spark = ProbeUtil.benchSession("ngram-pieces")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val docs = graft.Tables.documents(spark, dir)
    def t(tag: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"PIECE $tag ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    val sh = docs.select(col("doc_id"),
      explode(graft.functions.TextFunctions.wordShingles(col("text"), 3)).as("s"))
    val posts = sh.groupBy(col("s"))
      .agg(sort_array(collect_list(col("doc_id"))).as("ids"))
      .filter(size(col("ids")) <= 5).select(col("ids"))
      .persist()
    t("posts_build+count")(println("posts rows " + posts.count()))
    t("counts_agg")(posts.select(explode(col("ids")).as("doc_id"))
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_sh"))
      .write.format("noop").mode("overwrite").save())
    val pairCombos = flatten(transform(col("ids"), (x, i) =>
      transform(slice(col("ids"), i + lit(2), size(col("ids"))),
        y => struct(x.as("id_a"), y.as("id_b")))))
    t("inter_agg")(posts.select(explode(pairCombos).as("p"))
      .groupBy(col("p.id_a").as("id_a"), col("p.id_b").as("id_b"))
      .agg(count(lit(1)).as("n_inter"))
      .write.format("noop").mode("overwrite").save())
    t("counts_agg2")(posts.select(explode(col("ids")).as("doc_id"))
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_sh"))
      .write.format("noop").mode("overwrite").save())
    t("inter_agg2")(posts.select(explode(pairCombos).as("p"))
      .groupBy(col("p.id_a").as("id_a"), col("p.id_b").as("id_b"))
      .agg(count(lit(1)).as("n_inter"))
      .write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
