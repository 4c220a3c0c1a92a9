package graft.examples

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.selectivesearch.SelectiveSearch
import graft.selectivesearch.SelectiveSearch.precisionAt

/** End-to-end drive of the selective-search pipelines through the
  * public API, against real files on disk: writes per-shard results
  * Parquet + a shard-scores CSV, loads them back with the library
  * loaders, runs selection + evaluation, exports a TREC run file, and
  * prints everything. Usage: sbt "runMain graft.examples.SelectiveSearchDemo [workdir]"
  */
object SelectiveSearchDemo {
  def main(args: Array[String]): Unit = {
    val work = if (args.nonEmpty) args(0)
      else Files.createTempDirectory("graft-demo").toString
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-demo")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val nshards = 3
    val queries = Seq(0L, 1L)

    // --- produce external-contract inputs -----------------------------
    // per-shard results Parquet: {basename}#{shard}.results-1
    val results = spark.read.parquet(s"/root/testdata/sf0.001/lineitem.parquet")
      .select(
        (col("l_orderkey") % 2).cast("int").as("query"),
        (col("l_suppkey") % nshards).cast("int").as("shard"),
        (col("l_linenumber") % 2).cast("int").as("bucket"),
        col("l_extendedprice").as("score"),
        (col("l_orderkey") * 10 + col("l_linenumber")).as("gdocid"))
      .withColumn("ldocid", col("gdocid"))
      .withColumn("rank", lit(0))
    (0 until nshards).foreach { s =>
      results.filter(col("shard") === s)
        .select("query", "rank", "ldocid", "gdocid", "score", "shard", "bucket")
        .coalesce(1).write.mode(SaveMode.Overwrite)
        .parquet(s"$work/res#$s.results-1.tmp")
      val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
      val part = fs.globStatus(new org.apache.hadoop.fs.Path(s"$work/res#$s.results-1.tmp/part-*.parquet")).head.getPath
      fs.rename(part, new org.apache.hadoop.fs.Path(s"$work/res#$s.results-1"))
      fs.delete(new org.apache.hadoop.fs.Path(s"$work/res#$s.results-1.tmp"), true)
    }
    // headerless shard-scores CSV in cartesian order (query-major, shard)
    val scores = Seq(0.9, 0.5, 0.7, 0.2, 0.8, 0.4) // 2 queries x 3 shards
    Files.write(Paths.get(s"$work/scores.csv"),
      scores.mkString("\n").getBytes("UTF-8"))

    // --- drive the library --------------------------------------------
    val loaded = SelectiveSearch.loadShardResults(spark, s"$work/res", nshards)
    println(s"loadShardResults: ${loaded.count()} rows from $nshards shard files")
    loaded.show(3)

    val selection = SelectiveSearch.loadShardSelection(spark, queries, nshards, s"$work/scores.csv")
    println("loadShardSelection (positional CSV bind + per-query rank):")
    selection.orderBy("query", "shard").show()

    val selected = SelectiveSearch.select(selection, loaded.drop("rank"), 2)
    println(s"select(t=2): ${selected.count()} rows (of ${loaded.count()})")
    selected.show(5)

    val withRel = selected
      .withColumn("global_rank", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("query"))
          .orderBy(col("score").desc, col("gdocid").asc)))
      .withColumn("rel", (col("gdocid") % 3 === 0).cast("int"))
    val evaluated = SelectiveSearch.evaluate(
      selection, withRel, Seq(precisionAt(10), precisionAt(5)), nshards)
    println("evaluate (single-pass step sweep, P@10 / P@5):")
    evaluated.show()

    val trecIn = selected.withColumn("title", concat(lit("doc"), col("gdocid")))
    SelectiveSearch.toTrec(trecIn, s"$work/run.trec", cutoff = 10)
    println(s"toTrec wrote $work/run.trec; first lines:")
    scala.io.Source.fromFile(s"$work/run.trec").getLines().take(5)
      .foreach(println)

    println(s"DEMO_OK workdir=$work")
    spark.stop()
  }
}
