package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (`array<float>`).
  *
  * Numerics: embeddings are quantized to exact integers
  * (`round(x * 1000)` as long) so dot products and norms are exact
  * integer sums — identical in any engine and any evaluation order —
  * and the final cosine is a single double division. This makes ANN
  * results hash-comparable across engines, which raw float math is not.
  *
  * Scale notes: brute force is the correctness baseline (the corpus
  * side streams; the query side is broadcast; cost O(|Q| x |corpus|)).
  * The scale path blocks the corpus by sign-LSH cell (one shuffle on
  * the cell id); queries only score their own cell — classic random-
  * hyperplane LSH with axis-aligned planes, which keeps the whole
  * pipeline expressible as relational algebra.
  */
object Similarity {

  val QuantScale = 1000

  /** Exact-integer quantization of a float vector. The multiply MUST
    * happen in double: a float-precision `x * 1000` lands on the
    * other side of .5 for some values and flips the round — found as
    * a real cross-engine mismatch at sf0.1.
    */
  def quantize(c: Column): Column =
    transform(c, x => round(x.cast("double") * QuantScale).cast("long"))

  /** Exact integer dot product of two quantized vectors. */
  def dotQ(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), (acc, x) => acc + x)

  /** Exact integer squared norm. */
  def norm2Q(a: Column): Column =
    aggregate(transform(a, x => x * x), lit(0L), (acc, x) => acc + x)

  /** Cosine from exact integer parts (one double division at the end). */
  def cosineQ(dot: Column, na2: Column, nb2: Column): Column =
    dot.cast("double") / sqrt((na2 * nb2).cast("double"))

  /** Sign-LSH cell id from the first `bits` quantized components. */
  def signCell(v: Column, bits: Int): Column =
    aggregate(
      transform(sequence(lit(1), lit(bits)),
        i => when(element_at(v, i) >= 0, pow(lit(2), i - 1).cast("long"))
          .otherwise(lit(0L))),
      lit(0L), (acc, x) => acc + x)

  /** id + quantized vector + squared norm (+ cell when bits > 0). */
  def prepared(df: DataFrame, embCol: String, idCol: String,
      bits: Int = 0): DataFrame = {
    val q = df.select(col(idCol), quantize(col(embCol)).as("v"))
      .withColumn("n2", norm2Q(col("v")))
    if (bits > 0) q.withColumn("cell", signCell(col("v"), bits)) else q
  }

  /** Finisher A — bounded top-k AGGREGATE (`top_k`): each map task
    * ships at most k rows per query across the shuffle (partial
    * aggregation); the default and the 100 TB path.
    */
  private def finishTopKAgg(scored: DataFrame, k: Int, idCol: String): DataFrame =
    scored.groupBy(col("query_id"))
      .agg(graft.functions.TopKFunctions.top_k(col("cosine"), col(idCol), k).as("top"))
      .select(col("query_id"), posexplode(col("top")))
      .select(col("query_id"),
        col("col.id").as(idCol),
        col("col.score").as("cosine"),
        (col("pos") + 1).cast("int").as("rank"))

  /** Finisher B — window row_number: shuffles every scored row; kept
    * for equivalence testing against the aggregate form.
    */
  private def finishWindow(scored: DataFrame, k: Int, idCol: String): DataFrame = {
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col(idCol).asc)
    scored.withColumn("rank", row_number().over(w).cast("int"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col(idCol), col("cosine"), col("rank"))
  }

  private def scoredAgainst(corpus: DataFrame, queries: DataFrame,
      embCol: String, idCol: String, bits: Int): DataFrame = {
    val c = prepared(corpus, embCol, idCol, bits)
    val qCols = Seq(col(idCol).as("query_id"), col("v").as("qv"),
      col("n2").as("qn2")) ++ (if (bits > 0) Seq(col("cell")) else Nil)
    val q = prepared(queries, embCol, idCol, bits).select(qCols: _*)
    val cond =
      if (bits > 0) c("cell") === q("cell") && col("query_id") =!= c(idCol)
      else col("query_id") =!= c(idCol)
    c.join(broadcast(q), cond)
      .select(col("query_id"), c(idCol),
        cosineQ(dotQ(col("qv"), col("v")), col("qn2"), col("n2")).as("cosine"))
  }

  /** Brute-force cosine top-k: every query row scored against the full
    * corpus (minus itself), per-query top-k by (cosine desc, id).
    * `useWindow = true` switches to the window finisher (testing).
    */
  def cosineTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      embCol: String = "embedding", idCol: String = "vec_id",
      useWindow: Boolean = false): DataFrame = {
    val scored = scoredAgainst(corpus, queries, embCol, idCol, bits = 0)
    if (useWindow) finishWindow(scored, k, idCol)
    else finishTopKAgg(scored, k, idCol)
  }

  /** Sign-LSH approximate top-k: candidates limited to the query's
    * cell. Same output shape as [[cosineTopK]]; recall < 1 by design.
    */
  def lshCosineTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      bits: Int = 6, embCol: String = "embedding",
      idCol: String = "vec_id", useWindow: Boolean = false): DataFrame = {
    val scored = scoredAgainst(corpus, queries, embCol, idCol, bits)
    if (useWindow) finishWindow(scored, k, idCol)
    else finishTopKAgg(scored, k, idCol)
  }

  /** Embedding near-duplicate pairs: cosine >= threshold among pairs
    * sharing a sign-LSH cell (one shuffle on cell).
    */
  def nearDupPairs(corpus: DataFrame, threshold: Double, bits: Int = 6,
      embCol: String = "embedding", idCol: String = "vec_id"): DataFrame = {
    val p = prepared(corpus, embCol, idCol, bits)
    val a = p.select(col("cell"), col(idCol).as("id_a"),
      col("v").as("va"), col("n2").as("na2"))
    val b = p.select(col("cell"), col(idCol).as("id_b"),
      col("v").as("vb"), col("n2").as("nb2"))
    a.join(b, Seq("cell")).filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        cosineQ(dotQ(col("va"), col("vb")), col("na2"), col("nb2")).as("cosine"))
      .filter(col("cosine") >= threshold)
  }
}
