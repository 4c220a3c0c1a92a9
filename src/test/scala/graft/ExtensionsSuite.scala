package graft

import org.apache.spark.sql.functions.lit

import graft.functions.HashKernels

class ExtensionsSuite extends SparkSuite {

  test("registered SQL functions evaluate via the native expressions") {
    GraftExtensions.register(spark)
    val row = spark.sql(
      "SELECT rolling_hash('a') AS rh, simhash64('a') AS sh").first()
    assert(row.getLong(0) == 'a'.toLong)
    assert(row.getLong(1) == HashKernels.fnv1a64("a".getBytes("UTF-8"), 0, 1))
  }

  test("round-4 natives register: simhash_md5, md5_pair, dot_long, word_shingles") {
    GraftExtensions.register(spark)
    val row = spark.sql(
      """SELECT simhash_md5('a b') AS sm,
        |       md5_pair('x')[0] AS h1,
        |       dot_long(array(1L, 2L, 3L), array(4L, 5L, 6L)) AS dp,
        |       word_shingles('a b c d', 3) AS sh""".stripMargin).first()
    assert(row.getLong(0) == HashKernels.simHashMd5(
      org.apache.spark.unsafe.types.UTF8String.fromString("a b")))
    assert(row.getLong(1) ==
      HashKernels.md5Prefix48("x".getBytes("UTF-8")))
    assert(row.getLong(2) == 4 + 10 + 18)
    assert(row.getSeq[String](3) == Seq("a b c", "b c d"))
    // n must be a literal
    val err = intercept[Exception](
      spark.sql("SELECT word_shingles('a', length('abc'))").first())
    assert(err.getMessage.contains("INT literal"), err.getMessage)
  }

  test("winnow_fps registers for SQL with literal k/w") {
    GraftExtensions.register(spark)
    val fps = spark.sql("SELECT winnow_fps('a b c d e', 3, 4) AS fps")
      .first().getSeq[Long](0)
    assert(fps.nonEmpty && fps == fps.sorted && fps.distinct == fps)
    assert(fps == graft.functions.WinnowKernels
      .winnowFps(org.apache.spark.unsafe.types.UTF8String
        .fromString("a b c d e"), 3, 4)
      .toLongArray().toSeq)
    val err = intercept[Exception](
      spark.sql("SELECT winnow_fps('a b c', 3, length('abcd'))").first())
    assert(err.getMessage.contains("INT literal"), err.getMessage)
  }

  test("text-profile natives register for SQL: lang_id, quality_score, text_profile") {
    GraftExtensions.register(spark)
    val row = spark.sql(
      """SELECT lang_id('the cat and the dog went to the house') AS lid,
        |       quality_score('A normal, well formed sentence is here.') AS q,
        |       text_profile('a b c') AS tp""".stripMargin).first()
    val direct = spark.range(1).select(
      graft.functions.TextFunctions.langId(
        lit("the cat and the dog went to the house")).as("lid"),
      graft.functions.TextFunctions.qualityScore(
        lit("A normal, well formed sentence is here.")).as("q"),
      graft.functions.TextFunctions.textProfile(lit("a b c")).as("tp")).first()
    assert(row.toSeq == direct.toSeq)
  }

  test("repetition_profile registers for SQL (the Gopher-gate kernel)") {
    GraftExtensions.register(spark)
    val got = spark.sql(
      "SELECT repetition_profile('a b\na b') AS p").first().getSeq[Long](0)
    val direct = spark
      .range(1).select(graft.functions.RepetitionFunctions
        .repetition_profile(org.apache.spark.sql.functions.lit("a b\na b"))
        .as("p")).first().getSeq[Long](0)
    assert(got == direct)
    // sanity on the counters: 2 lines, both duplicates of one text
    assert(got.head == 2L, got.mkString(","))
  }

  test("SQL functions work over a table column") {
    GraftExtensions.register(spark)
    Tables.documents(spark, sf("sf0.001")).createOrReplaceTempView("docs")
    val n = spark.sql(
      "SELECT count(DISTINCT simhash64(text)) FROM docs").first().getLong(0)
    assert(n > 400) // 500 distinct texts hash to (nearly) distinct signatures
  }

  test("bounded top-k aggregates register for SQL use") {
    GraftExtensions.register(spark)
    import spark.implicits._
    Seq((1, 5.0, 10L, "a"), (1, 9.0, 11L, "b"), (1, 7.0, 12L, "c"),
      (2, 1.0, 13L, "d"))
      .toDF("g", "score", "id", "tag").createOrReplaceTempView("t")
    val rows = spark.sql(
      """SELECT g, top_k(score, id, 2) AS tk, top_k_tag(score, tag, 2) AS tt
        |FROM t GROUP BY g ORDER BY g""".stripMargin).collect()
    assert(rows(0).getSeq[org.apache.spark.sql.Row](1).map(r =>
      (r.getDouble(0), r.getLong(1))) == Seq((9.0, 11L), (7.0, 12L)))
    assert(rows(0).getSeq[org.apache.spark.sql.Row](2).map(r =>
      (r.getDouble(0), r.getString(1))) == Seq((9.0, "b"), (7.0, "c")))
    assert(rows(1).getSeq[org.apache.spark.sql.Row](1).size == 1)
    val err = intercept[Exception](
      spark.sql("SELECT top_k(score, id, g) FROM t GROUP BY g").first())
    assert(err.getMessage.contains("INT literal"), err.getMessage)
  }
}
