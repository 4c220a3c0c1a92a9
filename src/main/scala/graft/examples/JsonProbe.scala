package graft.examples

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Dev probe: interleaved A/B of json-field extraction forms over the
  * events.props column (tiny one-key JSON objects, one per row) —
  * `from_json` struct + two getFields (the registered r10 shape),
  * `from_json` projected once then field-projected, and
  * `get_json_object` per field. Same-session alternation only;
  * SCALING.md records the conclusion.
  */
object JsonProbe {
  import ProbeUtil.median

  def main(args: Array[String]): Unit = {
    val spark = ProbeUtil.benchSession("json-probe")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    def fromJsonTwice(): DataFrame = {
      val parsed = from_json(col("props"),
        org.apache.spark.sql.types.StructType.fromDDL("k STRING"))
      Tables.events(spark, dir)
        .select(col("event_id"),
          parsed.getField("k").as("k_str"),
          parsed.getField("k").cast("int").as("k_int"))
        .orderBy("event_id")
    }
    def fromJsonOnce(): DataFrame =
      Tables.events(spark, dir)
        .select(col("event_id"),
          from_json(col("props"),
            org.apache.spark.sql.types.StructType.fromDDL("k STRING")).as("p"))
        .select(col("event_id"),
          col("p.k").as("k_str"),
          col("p.k").cast("int").as("k_int"))
        .orderBy("event_id")
    def getJsonObject(): DataFrame =
      Tables.events(spark, dir)
        .select(col("event_id"),
          get_json_object(col("props"), "$.k").as("k_str"),
          get_json_object(col("props"), "$.k").cast("int").as("k_int"))
        .orderBy("event_id")

    def scanOnly(): DataFrame =
      Tables.events(spark, dir).select(col("event_id"), col("props"))
    def scanSort(): DataFrame =
      Tables.events(spark, dir).select(col("event_id"), col("props"))
        .orderBy("event_id")
    def parseNoSort(): DataFrame =
      Tables.events(spark, dir)
        .select(col("event_id"),
          get_json_object(col("props"), "$.k").as("k_str"),
          get_json_object(col("props"), "$.k").cast("int").as("k_int"))

    val variants = Seq(
      "from_json_twice" -> (() => fromJsonTwice()),
      "from_json_once" -> (() => fromJsonOnce()),
      "get_json_object" -> (() => getJsonObject()),
      "scan_only" -> (() => scanOnly()),
      "scan_sort" -> (() => scanSort()),
      "parse_nosort" -> (() => parseNoSort()),
      "gjo_once_cast" -> (() =>
        Tables.events(spark, dir)
          .select(col("event_id"),
            get_json_object(col("props"), "$.k").as("k_str"))
          .select(col("event_id"), col("k_str"),
            col("k_str").cast("int").as("k_int"))
          .orderBy("event_id")),
      "gjo_once_nosort" -> (() =>
        Tables.events(spark, dir)
          .select(col("event_id"),
            get_json_object(col("props"), "$.k").as("k_str"))
          .select(col("event_id"), col("k_str"),
            col("k_str").cast("int").as("k_int"))),
      "gjo_sort_first" -> (() =>
        Tables.events(spark, dir)
          .select(col("event_id"), col("props"))
          .orderBy("event_id")
          .select(col("event_id"),
            get_json_object(col("props"), "$.k").as("k_str"))
          .select(col("event_id"), col("k_str"),
            col("k_str").cast("int").as("k_int"))),
      "fj_sort_first" -> (() => {
        val parsed = from_json(col("props"),
          org.apache.spark.sql.types.StructType.fromDDL("k STRING"))
        Tables.events(spark, dir)
          .select(col("event_id"), col("props"))
          .orderBy("event_id")
          .select(col("event_id"),
            parsed.getField("k").as("k_str"),
            parsed.getField("k").cast("int").as("k_int"))
      }))
    val reps = 5
    val times = scala.collection.mutable.Map.empty[String, Vector[Double]]
      .withDefaultValue(Vector.empty)
    // warm
    variants.foreach { case (_, f) => f().write.format("noop").mode("overwrite").save() }
    (1 to reps).foreach { _ =>
      variants.foreach { case (name, f) =>
        spark.catalog.clearCache(); System.gc()
        val t0 = System.nanoTime()
        f().write.format("noop").mode("overwrite").save()
        times(name) = times(name) :+ (System.nanoTime() - t0) / 1e9
      }
    }
    variants.foreach { case (name, _) =>
      println(f"$name%-18s median ${median(times(name))}%.3f s  (${times(name).map(t => f"$t%.2f").mkString(", ")})")
    }
    spark.stop()
  }
}
