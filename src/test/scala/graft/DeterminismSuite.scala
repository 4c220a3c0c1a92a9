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

  private val QueriesUnderTest = Seq(
    "minhash_lsh_pairs",      // banded self-join + distinct + agg
    "simhash_pairs",          // native kernel + banding
    "embedding_neardup_pairs",// IVF multi-assign + shared-cell vote
    "c2_evaluate",            // arrival walk (mapPartitions iterator)
    "c8_select_buckets",      // flatMapGroups greedy resolver
    "sample_stratified",      // bounded top-k reservoir
    "quality_topp",           // per-stratum rank cut
    "sessionize_batch",       // lag/cumsum windows
    "bm25_topk",              // quantized order-free sum + bounded top-k
    "minhash_incremental_pairs", // asymmetric band probe
    "domain_token_budget",    // exact cumsum window walk
    "ann_pq_topk",            // ADC table-lookup sum + argmin encode
    "grouping_sets_agg",      // null-keyed grouping rows
    "j_range_prior_errors")   // range-residual join + count

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
