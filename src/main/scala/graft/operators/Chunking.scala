package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Token-window document chunking — the context-window splitting step
  * of a RAG / pretraining pipeline: each document becomes overlapping
  * chunks of `window` whitespace tokens advanced by `stride` tokens
  * (stride < window ⇒ adjacent chunks share `window - stride` tokens
  * of context).
  *
  * Chunk starts are the multiples of `stride`: 0, S, 2S, …, up to the
  * first start whose window reaches the document end, so every token
  * appears in at least one chunk, the final chunk may be short, and a
  * document of ≤ `window` tokens yields exactly one chunk. All
  * arithmetic is exact-integer (`div`, no float ceil), so the chunk
  * grid is bit-identical in any engine.
  *
  * Scale shape: stateless per-row explode — no shuffle, no state; the
  * row multiplier is ~n_tokens/stride. At 100 TB this is a map-only
  * pass whose output partitioning inherits the scan's; a downstream
  * shuffle (e.g. chunk dedup) is the consumer's own key shuffle.
  * Blank documents are dropped (no tokens ⇒ no chunks), mirroring the
  * `tokenCount = 0` contract of [[graft.functions.TextFunctions]].
  */
object Chunking {

  /** (idCol, chunk_id, n_chunk_tokens, chunk_text) rows, chunk_id
    * 0-based in token order.
    */
  def chunkByTokens(docs: DataFrame, window: Int, stride: Int,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(window > 0, s"window must be positive, got $window")
    require(stride > 0 && stride <= window,
      s"stride must be in [1, window], got $stride (window $window)")
    docs
      .select(col(idCol),
        graft.functions.TextFunctions.tokensNonEmpty(col(textCol))
          .as("__toks"))
      // tokenless (blank/whitespace-only) docs drop; the guard also
      // protects sequence() below (start > stop would COUNT DOWN with
      // Spark's default -1 step, not yield empty)
      .filter(size(col("__toks")) > 0)
      .select(col(idCol), col("__toks"), size(col("__toks")).as("__n"))
      // last chunk start index (in strides): 0 when n <= window, else
      // exact-integer ceil((n - window) / stride)
      .withColumn("__last", expr(
        s"CASE WHEN __n <= $window THEN 0L " +
          s"ELSE (__n - $window + ${stride - 1}) div $stride END"))
      .withColumn("chunk_id", explode(sequence(lit(0L), col("__last"))))
      .select(col(idCol), col("chunk_id").cast("int").as("chunk_id"),
        slice(col("__toks"), (col("chunk_id") * stride + 1).cast("int"),
          lit(window)).as("__ck"))
      .select(col(idCol), col("chunk_id"),
        size(col("__ck")).as("n_chunk_tokens"),
        concat_ws(" ", col("__ck")).as("chunk_text"))
  }
}
