package graft

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

  test("SQL functions work over a table column") {
    GraftExtensions.register(spark)
    Tables.documents(spark, sf("sf0.001")).createOrReplaceTempView("docs")
    val n = spark.sql(
      "SELECT count(DISTINCT simhash64(text)) FROM docs").first().getLong(0)
    assert(n > 400) // 500 distinct texts hash to (nearly) distinct signatures
  }
}
