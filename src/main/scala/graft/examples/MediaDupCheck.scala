package graft.examples

/** Dev scratch: dump media_neardup_pairs rows at sf0.01 for a quick
  * cross-check against the DuckDB oracle.
  */
object MediaDupCheck {
  def main(args: Array[String]): Unit = {
    val spark = ProbeUtil.benchSession("media-dup-check")
    val rows = graft.SparkEntry.queries("media_neardup_pairs")(
      spark, "/root/testdata/sf0.01").collect()
    println("MEDIA_PAIRS " + rows.length + " :: " +
      rows.take(10).map(r => s"(${r.getLong(0)},${r.getLong(1)},${r.getInt(2)})").mkString(" "))
    spark.stop()
  }
}
