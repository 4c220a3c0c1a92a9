package graft.core

import org.apache.spark.sql.DataFrame

/** Parallelism floor for heavy per-row kernels.
  *
  * A parquet input below `spark.sql.files.maxPartitionBytes` with a
  * single row group yields ONE scan split no matter the conf
  * (byte-range splits cannot divide a row group), so any expensive
  * kernel fused into that scan stage runs on one core. For LIGHT
  * kernels the cure is worse than the disease — the round-13
  * RebalanceProbe measured the extra exchange a loss on every text
  * row it tried (lm, text_stats, c2: kernels of ~0.1-0.4 CPU-s) and
  * `graft.smallScanRebalance` stays off by default accordingly. The
  * round-14 DsirProbe measured the OTHER regime: the DSIR
  * unigram+bigram feature walk is ~1.7 CPU-s at sf0.1, and the same
  * round-robin exchange cuts the pass 1.75 → 0.32 s wall.
  *
  * This helper is the shape both call sites share: round-robin to the
  * session's parallelism ONLY when the input is materially
  * underpartitioned (fewer than half the cores). At cluster scale a
  * 100 TB scan arrives in thousands of splits and this is a no-op —
  * the repartition exists exactly and only for inputs too small to
  * split, where the shuffled bytes are by construction tiny.
  */
object Parallelism {

  /** `df` repartitioned to `defaultParallelism` iff it currently has
    * fewer than max(2, cores/2) partitions; otherwise `df` unchanged.
    */
  def kernelFloor(df: DataFrame): DataFrame = {
    val sc = df.sparkSession.sparkContext
    val cores = sc.defaultParallelism
    if (cores > 1 && df.rdd.getNumPartitions < math.max(2, cores / 2))
      df.repartition(cores)
    else df
  }
}
