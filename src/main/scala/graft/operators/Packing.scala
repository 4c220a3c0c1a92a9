package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for LLM pretraining: documents concatenate into a
  * per-stratum token stream which is chunked every `seqLen` tokens
  * (concat-then-chunk — the standard packing that splits a document
  * across sequence boundaries rather than padding). The operator
  * ATTRIBUTES each document to the training sequences it lands in:
  * one row per (document, bin) with the token count the document
  * contributes to that bin — the bookkeeping a sharded tokenizer
  * needs to materialize sequences without ever concatenating text.
  *
  * Exact integer arithmetic end-to-end: a document starting at stream
  * offset s with t tokens spans bins floor(s/L) .. floor((s+t-1)/L),
  * contributing min(s+t, (b+1)L) - max(s, bL) tokens to bin b. The
  * stream order is total ((strata), idCol), so the packing is
  * deterministic at any parallelism and engine-reproducible.
  *
  * Scale shape: one narrow window per stratum (id + token count —
  * payloads never enter the sort) plus a bounded explode (a document
  * spans at most t/L + 1 bins, so output rows ≈ input tokens /
  * seqLen + input rows). Strata (e.g. language) bound each window
  * partition; for a single global stream at extreme scale, swap the
  * window cumsum for the classic two-phase form (per-partition
  * subtotals -> broadcast prefix offsets) behind the same contract.
  */
object Packing {

  /** One row per (document, bin): (strata..., idCol, bin_id,
    * tok_in_bin). Zero-token documents occupy no bins and are
    * dropped.
    */
  def packSequences(df: DataFrame, tokensCol: Column,
      strataCols: Seq[String], idCol: String, seqLen: Long): DataFrame = {
    require(seqLen > 0, s"seqLen $seqLen must be positive")
    val strata = strataCols.map(col)
    val w = Window.partitionBy(strata: _*).orderBy(col(idCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ends = df
      .select(strata :+ col(idCol) :+ tokensCol.cast("long").as("__tok"): _*)
      .filter(col("__tok") > 0)
      .withColumn("__end", sum(col("__tok")).over(w))
    binsFromEnds(ends, strataCols, idCol, seqLen)
  }

  /** GLOBAL (stratum-free) packing at scale: the per-stratum window
    * above ships each stratum to one task, which a single global
    * stream cannot do. The classic two-phase cumulative sum instead:
    * range-partition by id and sort within partitions (the total
    * order), reduce ONE subtotal per partition to the driver, then
    * each row's running total is its partition's broadcast prefix
    * offset plus a partition-local window — every window group is one
    * bounded partition, never the whole stream. Values depend only on
    * the total id order, so the result is identical at any partition
    * count (the range boundaries cancel out of the prefix sums).
    */
  def packSequencesGlobal(df: DataFrame, tokensCol: Column,
      idCol: String, seqLen: Long, numPartitions: Int = 0): DataFrame = {
    require(seqLen > 0, s"seqLen $seqLen must be positive")
    val spark = df.sparkSession
    val p = if (numPartitions > 0) numPartitions
      else spark.conf.get("spark.sql.shuffle.partitions", "200").toInt
    // Materialized ONCE: phase 1 (subtotal collect) and phase 2 (the
    // window) must see the SAME partitioning. Re-executing the plan
    // could re-sample repartitionByRange's boundaries (and rerun any
    // nondeterministic upstream), silently shifting rows across
    // partitions and corrupting the broadcast prefix offsets.
    val sorted = org.apache.spark.sql.graft.DatasetBridge
      .localCheckpointNoStats(df
        .select(col(idCol), tokensCol.cast("long").as("__tok"))
        .filter(col("__tok") > 0)
        .repartitionByRange(p, col(idCol))
        .sortWithinPartitions(col(idCol))
        .withColumn("__pid", spark_partition_id()))
    // phase 1: one subtotal per partition -> exclusive prefix offsets
    val subtotals = sorted.groupBy(col("__pid"))
      .agg(sum(col("__tok")).as("__sub"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    val offsets = subtotals.scanLeft((0, 0L)) {
      case ((_, acc), (pid, sub)) => (pid, acc + sub)
    }.init.zip(subtotals).map { case ((_, off), (pid, _)) => (pid, off) }
    import spark.implicits._
    val offsetDf = offsets.toSeq.toDF("__pid", "__off")
    // phase 2: partition-local running sum + broadcast offset
    val w = Window.partitionBy(col("__pid")).orderBy(col(idCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ends = sorted
      .withColumn("__local", sum(col("__tok")).over(w))
      .join(broadcast(offsetDf), Seq("__pid"))
      .withColumn("__end", col("__off") + col("__local"))
    binsFromEnds(ends, Nil, idCol, seqLen)
  }

  /** Shared bin attribution from inclusive running totals `__end`
    * (and per-row `__tok`).
    */
  private def binsFromEnds(ends: DataFrame, strataCols: Seq[String],
      idCol: String, seqLen: Long): DataFrame = {
    val strata = strataCols.map(col)
    ends
      .withColumn("__start", col("__end") - col("__tok"))
      .withColumn("bin_id", explode(sequence(
        expr(s"__start div $seqLen"), expr(s"(__end - 1) div $seqLen"))))
      .withColumn("tok_in_bin",
        least(col("__end"), (col("bin_id") + 1) * seqLen) -
          greatest(col("__start"), col("bin_id") * seqLen))
      .select(strata ++ Seq(col(idCol), col("bin_id"), col("tok_in_bin")): _*)
  }
}
