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

  test("SQL functions work over a table column") {
    GraftExtensions.register(spark)
    Tables.documents(spark, sf("sf0.001")).createOrReplaceTempView("docs")
    val n = spark.sql(
      "SELECT count(DISTINCT simhash64(text)) FROM docs").first().getLong(0)
    assert(n > 400) // 500 distinct texts hash to (nearly) distinct signatures
  }
}
