package graft

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.scalatest.BeforeAndAfterEach
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession + frame-comparison helpers for all suites. */
trait SparkSuite extends AnyFunSuite with BeforeAndAfterEach {

  /** Operator-held caches must not accumulate across tests (the
    * "already cached" warning noise and the per-call block leak).
    */
  override protected def afterEach(): Unit = {
    graft.core.OpCaches.release()
    super.afterEach()
  }
  lazy val spark: SparkSession = SparkSuite.session
  def sf(dir: String) = s"/root/testdata/$dir"

  /** Collects and compares rows in order (row order is part of the
    * reference's contract — compare after each pipeline's own final
    * sort). Values are compared loosely across numeric widths.
    */
  def assertRowsEqual(actual: DataFrame, expected: Seq[Seq[Any]]): Unit = {
    val got = actual.collect().map(_.toSeq.map(norm))
    val want = expected.map(_.map(norm))
    assert(got.length == want.length,
      s"row count ${got.length} != ${want.length}\n got: ${got.mkString("\n  ")}")
    got.zip(want).zipWithIndex.foreach { case ((g, w), i) =>
      assert(g == w, s"row $i: $g != $w\nall: ${got.mkString("\n  ")}")
    }
  }

  private def norm(v: Any): Any = v match {
    case n: java.lang.Number => BigDecimal(n.doubleValue())
    case other => other
  }
}

object SparkSuite {
  lazy val session: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-warehouse").toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
