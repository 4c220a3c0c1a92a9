package graft

/** Partition-independence: every registered query must produce
  * IDENTICAL rows at any parallelism. This is the property the whole
  * oracle methodology rests on (and what pandas' stable row order
  * gives the reference for free): hash-partitioned shuffles reorder
  * arbitrarily, so any operator leaning on encounter order — an
  * unpinned window, a first() without a sort, float accumulation
  * order — diverges the moment the partition count changes.
  *
  * Representative queries across the operator families, run at 3 and
  * at 17 shuffle partitions (both != the suite default of 4), rows
  * compared exactly.
  */
class DeterminismSuite extends SparkSuite {

  // EVERY registered query except the declared approximate sketches:
  // partition-independence is a blanket claim for the exact surface,
  // while sketch merges (G-K percentile summaries) guarantee error
  // BOUNDS, not byte-equality across merge orders (sf0.001 keeps the
  // sweep cheap). rows-only ≠ nondeterministic: the fitted-PQ query
  // has no SQL oracle but is byte-stable at any parallelism (driver
  // k-means + exact-integer ADC), so it STAYS in the sweep.
  private val QueriesUnderTest =
    (SparkEntry.queries.keySet - "approx_agg_sketches").toSeq.sorted

  test("registered queries are identical at 3 and 17 shuffle partitions") {
    val dir = sf("sf0.001")
    val key = "spark.sql.shuffle.partitions"
    val original = spark.conf.get(key)
    try {
      for (name <- QueriesUnderTest) {
        val runs = Seq("3", "17").map { parts =>
          spark.conf.set(key, parts)
          graft.core.OpCaches.release()
          spark.catalog.clearCache()
          SparkEntry.queries(name)(spark, dir).collect().map(_.toSeq).toSeq
        }
        assert(runs(0) == runs(1),
          s"$name diverges across partition counts: " +
            s"${runs(0).size} vs ${runs(1).size} rows; first diff: " +
            runs(0).zip(runs(1)).find { case (a, b) => a != b })
      }
    } finally spark.conf.set(key, original)
  }
}
