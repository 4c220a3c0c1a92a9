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

  /** Exact-integer quantization of a float vector. */
  def quantize(c: Column): Column =
    transform(c, x => round(x * QuantScale).cast("long"))

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

  /** Brute-force cosine top-k: every query row scored against the full
    * corpus (minus itself), per-query top-k by (cosine desc, id).
    */
  def cosineTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      embCol: String = "embedding", idCol: String = "vec_id"): DataFrame = {
    val c = prepared(corpus, embCol, idCol)
    val q = prepared(queries, embCol, idCol)
      .select(col(idCol).as("query_id"), col("v").as("qv"), col("n2").as("qn2"))
    val scored = c.join(broadcast(q), col("query_id") =!= col(idCol))
      .select(col("query_id"), col(idCol),
        cosineQ(dotQ(col("qv"), col("v")), col("qn2"), col("n2")).as("cosine"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col(idCol).asc)
    scored.withColumn("rank", row_number().over(w).cast("int"))
      .filter(col("rank") <= k)
  }

  /** Sign-LSH approximate top-k: candidates limited to the query's
    * cell. Same output shape as [[cosineTopK]]; recall < 1 by design.
    */
  def lshCosineTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      bits: Int = 6, embCol: String = "embedding",
      idCol: String = "vec_id"): DataFrame = {
    val c = prepared(corpus, embCol, idCol, bits)
    val q = prepared(queries, embCol, idCol, bits)
      .select(col(idCol).as("query_id"), col("v").as("qv"),
        col("n2").as("qn2"), col("cell"))
    val scored = c.join(broadcast(q),
        c("cell") === q("cell") && col("query_id") =!= col(idCol))
      .select(col("query_id"), col(idCol),
        cosineQ(dotQ(col("qv"), col("v")), col("qn2"), col("n2")).as("cosine"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col(idCol).asc)
    scored.withColumn("rank", row_number().over(w).cast("int"))
      .filter(col("rank") <= k)
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
