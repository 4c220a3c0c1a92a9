package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Dedup

/** Scratch profiling main for operator stages (dev tool). */
object Probe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("PROBE_AQE", "false"))
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // each stage timed twice with a cleared cache: run 1 includes
    // per-plan codegen, run 2 is the steady-state cost
    def time(name: String)(f: => Unit): Unit =
      (1 to 2).foreach { i =>
        spark.catalog.clearCache(); System.gc()
        val t0 = System.nanoTime(); f
        println(f"PROBE $name#$i ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    val docs = Tables.documents(spark, dir)
    // session warm-up (parquet reader, shuffle machinery)
    docs.groupBy(col("lang")).count().collect()
    time("shingle_explode") {
      docs.select(col("doc_id"),
        explode(graft.functions.TextFunctions.wordShingles(col("text"), 3)).as("s"))
        .write.format("noop").mode("overwrite").save()
    }
    time("md5_pair_hash") {
      docs.select(col("doc_id"),
        explode(graft.functions.TextFunctions.wordShingles(col("text"), 3)).as("s"))
        .select(col("doc_id"), graft.functions.HashFunctions.md5_pair(col("s")).as("hp"))
        .write.format("noop").mode("overwrite").save()
    }
    time("signatures") {
      Dedup.minHashSignatures(docs, "text", "doc_id", 3, 16)
        .write.format("noop").mode("overwrite").save()
    }
    time("candidates_full") {
      Dedup.minHashCandidates(docs).write.format("noop").mode("overwrite").save()
    }
    time("candidates_sorted_as_in_entry") {
      graft.SparkEntry.queries("minhash_lsh_pairs")(spark, dir)
        .write.format("noop").mode("overwrite").save()
    }
    time("ngram_jaccard_as_in_entry") {
      graft.SparkEntry.queries("ngram_jaccard_pairs")(spark, dir)
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
