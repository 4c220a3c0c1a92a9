package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Deduplication operators for large-scale corpus pipelines.
  *
  * Scale notes (the 100 TB shapes):
  * - exact: one shuffle keyed by the 128-bit content hash (window over
  *   the hash partition), never by the raw text.
  * - minhash: signatures are computed per-row with higher-order array
  *   functions (zero shuffle), candidates come from one shuffle keyed
  *   by (band index, band hash); only candidate pairs — a tiny
  *   fraction of n^2 — are verified. All-pairs n-gram Jaccard exists
  *   for small inputs / verification, not as the scale path.
  */
object Dedup {

  /** Exact duplicate clustering by full-content hash: every doc mapped
    * to (fingerprint, cluster keeper = min id, cluster size, is_dup).
    * One shuffle (window over fp).
    */
  def exactClusters(docs: DataFrame, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    val w = Window.partitionBy(col("fp"))
    docs
      .select(col(idCol), md5(col(textCol)).as("fp"))
      .withColumn("keeper", min(col(idCol)).over(w))
      .withColumn("cluster_size", count(lit(1)).over(w))
      .withColumn("is_dup", (col(idCol) =!= col("keeper")).cast("int"))
  }

  /** Keeps exactly one document per identical-content cluster. */
  def dedupExact(docs: DataFrame, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    val keepers = exactClusters(docs, textCol, idCol)
      .filter(col("is_dup") === 0).select(col(idCol))
    docs.join(keepers, Seq(idCol), "left_semi")
  }

  /** MinHash signature over word n-gram shingles: `numHashes` string
    * minima of per-hash-salted md5 — computed entirely per row
    * (no shuffle, no UDF). md5 hex strings order like their values,
    * so `array_min` IS the min-hash.
    */
  def minHashSignature(textCol: Column, n: Int = 3, numHashes: Int = 16): Column = {
    val shingles = TextFunctions.wordShingles(textCol, n)
    transform(sequence(lit(0), lit(numHashes - 1)),
      i => array_min(transform(shingles,
        s => md5(concat(i.cast("string"), lit(":"), s)))))
  }

  /** LSH band keys from a minhash signature: md5 of each contiguous
    * `rowsPerBand`-slice. Docs sharing any band key are candidates.
    */
  def lshBandKeys(sig: Column, bands: Int, rowsPerBand: Int): Column =
    transform(sequence(lit(0), lit(bands - 1)),
      b => md5(concat_ws("|", slice(sig, b * rowsPerBand + 1, lit(rowsPerBand)))))

  /** Candidate near-duplicate pairs via MinHash + LSH banding, with
    * the estimated Jaccard (fraction of agreeing signature rows).
    * Pipeline: per-row signature -> explode band keys -> self-join on
    * (band, key) -> distinct pairs. The self-join shuffles on band
    * keys only; at 100 TB this is THE scalable near-dup path.
    */
  def minHashCandidates(docs: DataFrame, textCol: String = "text",
      idCol: String = "doc_id", n: Int = 3, numHashes: Int = 16,
      bands: Int = 4): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val r = numHashes / bands
    val signed = docs
      .select(col(idCol), col(textCol))
      .withColumn("sig", minHashSignature(col(textCol), n, numHashes))
      .filter(!col("sig").getItem(0).isNull) // docs with < n tokens have no shingles
    val banded = signed.select(
        col(idCol), col("sig"),
        posexplode(lshBandKeys(col("sig"), bands, r)))
      .withColumnRenamed("pos", "band_idx")
      .withColumnRenamed("col", "band_key")
    val left = banded.select(
      col("band_idx"), col("band_key"),
      col(idCol).as("id_a"), col("sig").as("sig_a"))
    val right = banded.select(
      col("band_idx"), col("band_key"),
      col(idCol).as("id_b"), col("sig").as("sig_b"))
    left.join(right, Seq("band_idx", "band_key"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        (aggregate(
          zip_with(col("sig_a"), col("sig_b"),
            (a, b) => when(a === b, 1).otherwise(0)),
          lit(0), (acc, x) => acc + x)
          .cast("double") / numHashes).as("est_jaccard"))
      .distinct()
  }

  /** Exact n-gram Jaccard for every pair sharing at least one shingle.
    * Small-input / verification path: explode distinct shingles, self-
    * join on the shingle, count intersections, derive |union| from the
    * per-doc distinct-shingle counts. O(pairs-sharing-a-shingle); use
    * [[minHashCandidates]] to pre-filter at scale.
    */
  def ngramJaccardPairs(docs: DataFrame, textCol: String = "text",
      idCol: String = "doc_id", n: Int = 3, minJaccard: Double = 0.5): DataFrame = {
    val sh = docs
      .select(col(idCol), explode(TextFunctions.wordShingles(col(textCol), n)).as("s"))
    val counts = sh.groupBy(col(idCol)).agg(count(lit(1)).as("n_sh"))
    val inter = sh.as("a").join(sh.as("b"),
        col("a.s") === col("b.s") && col(s"a.$idCol") < col(s"b.$idCol"))
      .groupBy(col(s"a.$idCol").as("id_a"), col(s"b.$idCol").as("id_b"))
      .agg(count(lit(1)).as("n_inter"))
    inter
      .join(counts.select(col(idCol).as("id_a"), col("n_sh").as("n_a")), Seq("id_a"))
      .join(counts.select(col(idCol).as("id_b"), col("n_sh").as("n_b")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        (col("n_inter").cast("double") / (col("n_a") + col("n_b") - col("n_inter")))
          .as("jaccard"))
      .filter(col("jaccard") >= minJaccard)
  }

  /** SimHash near-duplicate pairs: 64-bit signatures, candidates
    * blocked on 16-bit sub-bands (signatures within Hamming distance
    * k < 4 must agree on at least one of 4 bands), verified by exact
    * Hamming distance. One shuffle on band values.
    */
  def simHashPairs(docs: DataFrame, textCol: String = "text",
      idCol: String = "doc_id", maxHamming: Int = 3): DataFrame = {
    import graft.functions.HashFunctions.{hamming64, simhash64}
    val signed = docs.select(col(idCol),
      simhash64(col(textCol)).as("sig"))
    val banded = signed.select(col(idCol), col("sig"),
      posexplode(array((0 until 4).map(b =>
        (col("sig").bitwiseAND(lit(0xffffL << (16 * b)))).cast("long")): _*)))
      .withColumnRenamed("pos", "band_idx")
      .withColumnRenamed("col", "band_val")
    val left = banded.select(col("band_idx"), col("band_val"),
      col(idCol).as("id_a"), col("sig").as("sig_a"))
    val right = banded.select(col("band_idx"), col("band_val"),
      col(idCol).as("id_b"), col("sig").as("sig_b"))
    left.join(right, Seq("band_idx", "band_val"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        hamming64(col("sig_a"), col("sig_b")).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }
}
