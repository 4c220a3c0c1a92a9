package graft.examples

import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.{TextFunctions, TopKFunctions}

/** Dev probe: interleaved A/B of tfidfTopTerms designs — window rank
  * vs bounded top_k_tag, broadcast vs shuffle df join, with/without
  * the final range sort — to find where the time goes at sf0.1.
  */
object TfidfProbe {
  import ProbeUtil.median

  def main(args: Array[String]): Unit = {
    val spark = ProbeUtil.benchSession("tfidf-probe")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "5").toInt
    val docs = Tables.documents(spark, dir)

    def run(df: => org.apache.spark.sql.DataFrame): Double = {
      graft.core.OpCaches.release()
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }

    def base(persist: Boolean = true) = {
      val tf0 = docs
        .select(col("doc_id"),
          explode(TextFunctions.tokens(col("text"))).as("term"))
        .filter(length(col("term")) > 0)
        .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
      val tf = if (persist) graft.core.OpCaches.persistTracked(tf0) else tf0
      val nDocs = docs.agg(count(lit(1)).as("n_docs"))
      val dfCounts = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
      (tf, nDocs, dfCounts)
    }
    def scored(bcast: Boolean, persist: Boolean = true) = {
      val (tf, nDocs, dfCounts) = base(persist)
      tf.join(if (bcast) broadcast(dfCounts) else dfCounts, Seq("term"))
        .crossJoin(broadcast(nDocs))
        .select(col("doc_id"), col("term"), col("tf"),
          (col("tf").cast("double") * col("n_docs").cast("double") /
            col("df").cast("double")).as("score"))
    }
    def windowForm(bcast: Boolean) = {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("doc_id"))
        .orderBy(col("score").desc, col("term").asc)
      scored(bcast).withColumn("rank", row_number().over(w).cast("int"))
        .filter(col("rank") <= 3)
        .select(col("doc_id"), col("rank"), col("term"), col("tf"), col("score"))
    }
    def heapForm(bcast: Boolean, persist: Boolean = true) = {
      scored(bcast, persist).groupBy(col("doc_id"))
        .agg(TopKFunctions.top_k_tag(col("score"),
          concat_ws("\t", col("term"), col("tf")), 3).as("__top"))
        .select(col("doc_id"), posexplode(col("__top")))
        .select(col("doc_id"), (col("pos") + 1).cast("int").as("rank"),
          element_at(split(col("col.tag"), "\t"), 1).as("term"),
          element_at(split(col("col.tag"), "\t"), 2).cast("long").as("tf"),
          col("col.score").as("score"))
    }

    val variants: Seq[(String, () => org.apache.spark.sql.DataFrame)] = Seq(
      "tf only" -> (() => { val (tf, _, _) = base(); tf }),
      "scored bcast" -> (() => scored(true)),
      "scored shuffle" -> (() => scored(false)),
      "window bcast nosort" -> (() => windowForm(true)),
      "heap bcast nosort" -> (() => heapForm(true)),
      "window bcast sorted" -> (() => windowForm(true).orderBy("doc_id", "rank")),
      "heap bcast sorted" -> (() => heapForm(true).orderBy("doc_id", "rank")),
      "heap shuffle sorted" -> (() => heapForm(false).orderBy("doc_id", "rank")),
      "heap nopersist sorted" -> (() => heapForm(false, persist = false).orderBy("doc_id", "rank")))

    // interleaved: round-robin reps so ambient drift hits all variants
    val times = scala.collection.mutable.Map[String, Vector[Double]]()
      .withDefaultValue(Vector.empty)
    (1 to reps).foreach { _ =>
      variants.foreach { case (name, mk) => times(name) :+= run(mk()) }
    }
    variants.foreach { case (name, _) =>
      val ts = times(name)
      println(f"$name%-22s ${median(ts)}%.3f s  (${ts.map(t => f"$t%.2f").mkString(",")})")
    }
    spark.stop()
  }
}
