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
    df.select(strata :+ col(idCol) :+ tokensCol.cast("long").as("__tok"): _*)
      .filter(col("__tok") > 0)
      .withColumn("__end", sum(col("__tok")).over(w))
      .withColumn("__start", col("__end") - col("__tok"))
      .withColumn("bin_id", explode(sequence(
        expr(s"__start div $seqLen"), expr(s"(__end - 1) div $seqLen"))))
      .withColumn("tok_in_bin",
        least(col("__end"), (col("bin_id") + 1) * seqLen) -
          greatest(col("__start"), col("bin_id") * seqLen))
      .select(strata ++ Seq(col(idCol), col("bin_id"), col("tok_in_bin")): _*)
  }
}
