package graft.examples

import org.apache.spark.sql.functions._

import graft.Tables

/** Dev probe: stage-by-stage timing of the winnowing-fingerprint
  * HOF pipeline, to locate the blowup observed at registration time
  * (83 s at sf0.01 for ~25k md5 calls — 4 orders of magnitude over
  * the data work). Times, per stage: token split, positional shingle
  * md5 hashes, window minima, distinct+sort+explode; then the
  * explode+window-frame alternative for comparison.
  */
object WinnowProbe {
  import ProbeUtil.median

  def main(args: Array[String]): Unit = {
    val spark = ProbeUtil.benchSession("winnow-probe")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt
    val k = 3
    val w = 4

    def time(label: String)(thunk: => Unit): Unit = {
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        thunk
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$label%-28s ${median(ts)}%.3f s  (${ts.map(t => f"$t%.2f").mkString(",")})")
    }

    val docs = Tables.documents(spark, dir).select(col("doc_id"), col("text"))

    val toks = docs
      .select(col("doc_id"), split(btrim(col("text")), "\\s+").as("__toks"))
      .filter(length(element_at(col("__toks"), 1)) > 0)
      .filter(size(col("__toks")) >= k)

    val hashed = toks.select(col("doc_id"),
      transform(sequence(lit(1), size(col("__toks")) - (k - 1)),
        i => conv(substring(md5(concat_ws(" ", slice(col("__toks"), i, lit(k)))), 1, 12), 16, 10)
          .cast("long")).as("__h"))

    val mins = hashed
      .select(col("doc_id"), col("__h"), least(lit(w), size(col("__h"))).as("__ws"))
      .select(col("doc_id"),
        transform(sequence(lit(1), size(col("__h")) - col("__ws") + 1),
          j => array_min(slice(col("__h"), j, col("__ws")))).as("__m"))

    val full = mins
      .select(col("doc_id"),
        explode(array_sort(array_distinct(col("__m")))).as("fp"))

    // shingle WITHOUT md5: is the hash the hot spot, or the windows?
    val shingled = toks.select(col("doc_id"),
      transform(sequence(lit(1), size(col("__toks")) - (k - 1)),
        i => concat_ws(" ", slice(col("__toks"), i, lit(k)))).as("__s"))

    time("toks")(toks.write.format("noop").mode("overwrite").save())
    time("shingles (no md5)")(shingled.write.format("noop").mode("overwrite").save())
    time("hashes (md5+conv)")(hashed.write.format("noop").mode("overwrite").save())
    time("window mins")(mins.write.format("noop").mode("overwrite").save())
    time("full (distinct+explode)")(full.write.format("noop").mode("overwrite").save())

    // md5-only variant: drop conv, keep hex string
    val hexOnly = toks.select(col("doc_id"),
      transform(sequence(lit(1), size(col("__toks")) - (k - 1)),
        i => substring(md5(concat_ws(" ", slice(col("__toks"), i, lit(k)))), 1, 12)).as("__h"))
    time("hashes hex (no conv)")(hexOnly.write.format("noop").mode("overwrite").save())

    // explode + window-frame alternative (shuffle on doc_id)
    val wspec = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("pos"))
      .rowsBetween(0, w - 1)
    // registered form: sorted-first orderBy BELOW the HOF chain
    val reg = graft.operators.Fingerprint.winnowFingerprints(
      docs.orderBy("doc_id"), k = k, w = w)
    time("registered (sort below)")(reg.write.format("noop").mode("overwrite").save())
    val regNoSort = graft.operators.Fingerprint.winnowFingerprints(docs, k = k, w = w)
    time("registered (no sort)")(regNoSort.write.format("noop").mode("overwrite").save())

    val sh2 = toks
      .select(col("doc_id"), col("__toks"),
        explode(sequence(lit(1), size(col("__toks")) - (k - 1))).as("pos"))
      .select(col("doc_id"), col("pos"),
        conv(substring(md5(concat_ws(" ", slice(col("__toks"), col("pos").cast("int"), lit(k)))), 1, 12), 16, 10)
          .cast("long").as("h"))
    val nsh = sh2.groupBy("doc_id").agg(max(col("pos")).as("m"))
    val altFull = sh2
      .withColumn("wmin", min(col("h")).over(wspec))
      .join(nsh, Seq("doc_id"))
      .filter(col("pos") <= greatest(col("m") - (w - 1), lit(1)))
      .select(col("doc_id"), col("wmin").as("fp")).distinct()
    time("alt explode+frame")(altFull.write.format("noop").mode("overwrite").save())

    spark.stop()
  }
}
