package graft.selectivesearch

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.DataUtils.ensureHasColumns

/** Engine-side analog of the reference's matplotlib helper
  * (reference: dataproc/plot.py:8-19): plotting itself stays in
  * notebooks (SURVEY.md §2.7 F5), but the engine provides the
  * plot-ready export — one tidy CSV with an x column, a y column and
  * a series label, sorted for direct line plotting. Post-aggregation
  * frames are tiny, so a single-file sink is correct here.
  */
object PlotExport {

  /** Writes `df` as a single tidy CSV `x,y,label` (header included),
    * sorted by (label, x) — e.g. evaluate() output with
    * x=step, y=p_10, label=query.
    */
  def exportSeries(df: DataFrame, x: String, y: String, label: String,
      path: String): Unit = {
    ensureHasColumns(df, Seq(x, y, label))
    val tidy = df
      .select(col(label).cast("string").as("label"),
        col(x).as("x"), col(y).as("y"))
      .orderBy(col("label"), col("x"))
    tidy.coalesce(1)
      .write.mode("overwrite")
      .option("header", "true")
      .csv(path + ".tmpdir")
    moveSingle(df, path)
  }

  private def moveSingle(df: DataFrame, path: String): Unit = {
    import org.apache.hadoop.fs.Path
    val fs = new Path(path + ".tmpdir")
      .getFileSystem(df.sparkSession.sparkContext.hadoopConfiguration)
    val part = fs.globStatus(new Path(path + ".tmpdir", "part-*")).head.getPath
    fs.delete(new Path(path), false)
    fs.rename(part, new Path(path))
    fs.delete(new Path(path + ".tmpdir"), true)
  }
}
