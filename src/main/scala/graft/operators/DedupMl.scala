package graft.operators

import org.apache.spark.ml.feature.{HashingTF, MinHashLSH}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** MLlib-backed near-duplicate detection: the library's MinHashLSH
  * over a hashed shingle-set representation. Alternative to the
  * hand-rolled [[Dedup.minHashCandidates]] — same candidate-pair
  * shape, but using `org.apache.spark.ml` primitives
  * (HashingTF -> MinHashLSH.approxSimilarityJoin). Results depend on
  * MLlib's internal hash seeds, so this variant is pinned by unit
  * tests rather than a SQL oracle.
  */
object DedupMl {

  /** Candidate pairs with Jaccard distance <= `maxDistance`
    * (similarity >= 1 - maxDistance). Deterministic: MinHashLSH seeds
    * are fixed via `setSeed`.
    */
  def minHashCandidatesMl(docs: DataFrame, textCol: String = "text",
      idCol: String = "doc_id", n: Int = 3, numHashTables: Int = 16,
      maxDistance: Double = 0.5, numFeatures: Int = 1 << 18): DataFrame = {
    val shingled = docs.select(col(idCol),
      TextFunctions.wordShingles(col(textCol), n).as("shingles"))
      .filter(size(col("shingles")) > 0)
    val tf = new HashingTF()
      .setInputCol("shingles").setOutputCol("features")
      .setNumFeatures(numFeatures).setBinary(true)
    val featured = tf.transform(shingled)
    val lsh = new MinHashLSH()
      .setInputCol("features").setOutputCol("hashes")
      .setNumHashTables(numHashTables).setSeed(42L)
    val model = lsh.fit(featured)
    model.approxSimilarityJoin(featured, featured, maxDistance, "jaccard_dist")
      .select(
        col(s"datasetA.$idCol").as("id_a"),
        col(s"datasetB.$idCol").as("id_b"),
        (lit(1.0) - col("jaccard_dist")).as("est_similarity"))
      .filter(col("id_a") < col("id_b"))
  }
}
