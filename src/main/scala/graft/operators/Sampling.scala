package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.HashFunctions

/** Deterministic sampling for training-data pipelines.
  *
  * Both operators key every decision on a content-derived hash
  * (48-bit MD5 prefix of `id || ':' || salt`), not on an RNG: the
  * sample is reproducible across engines, partitionings, retries, and
  * re-runs — the property a 100 TB pipeline needs for auditable
  * dataset curation (and what makes an exact SQL oracle possible,
  * where `rand(seed)` never matches across engines). Changing `salt`
  * draws an independent sample.
  *
  * Scale shapes:
  * - [[bernoulliSample]] is a stateless per-row filter — NO shuffle,
  *   fully pushdown-friendly, trivially parallel at any scale;
  * - [[stratifiedSample]] ships at most k (id, hash) pairs per
  *   stratum per map task through the bounded
  *   [[graft.functions.TopKAggregate]] (partial aggregation), then
  *   semi-joins the winners back — wide document rows never shuffle,
  *   and a hot stratum costs k per task, not its full population
  *   (a window row_number over the stratum would shuffle every row).
  */
object Sampling {

  /** 48-bit MD5-prefix hash of `id || ':' || salt` — uniform on
    * [0, 2^48), exact integer, engine-portable (DuckDB:
    * `('0x' || substr(md5(id || ':salt'), 1, 12))::BIGINT`).
    */
  def hash48(id: Column, salt: String): Column =
    HashFunctions.md5_pair(concat(id.cast("string"), lit(":" + salt)))
      .getItem(0)

  /** Exact integer acceptance threshold for a fraction of 2^48. */
  def threshold48(fraction: Double): Long = {
    require(fraction >= 0 && fraction <= 1, s"fraction $fraction not in [0,1]")
    (fraction * (1L << 48)).toLong
  }

  /** Deterministic Bernoulli sample: keep a row iff its hash falls
    * under `fraction` of the 48-bit space. Stateless, shuffle-free;
    * the comparison is exact-integer on both sides.
    */
  def bernoulliSample(df: DataFrame, idCol: String, fraction: Double,
      salt: String = "graft"): DataFrame =
    df.filter(hash48(col(idCol), salt) < lit(threshold48(fraction)))

  /** Deterministic WEIGHTED Bernoulli sample: keep a row iff its hash
    * falls under `weight` of the 48-bit space, where the weight is a
    * per-row column (clamped to [0,1]) — quality-proportional
    * downsampling ("keep good documents with higher probability")
    * with the same reproducibility story as [[bernoulliSample]]:
    * stateless per-row filter, no shuffle, no RNG. The threshold is
    * floor(weight * 2^48) — exact for any weight the engines compute
    * identically.
    */
  def weightedSample(df: DataFrame, idCol: String, weight: Column,
      salt: String = "graft"): DataFrame = {
    val clamped = least(greatest(weight, lit(0.0)), lit(1.0))
    df.filter(hash48(col(idCol), salt) <
      floor(clamped * lit(281474976710656.0)))
  }

  /** Deterministic stratified sample: the `k` rows with the smallest
    * (hash, id) per stratum — a hash-ranked reservoir, reproducible
    * at any parallelism. Returns the stratum and id columns plus
    * `smp_rank` (1-based position within the stratum's sample).
    *
    * Negated-hash trick: `top_k` keeps the LARGEST (score desc,
    * id asc); scoring by -hash yields ascending hash order, exactly —
    * 48-bit magnitudes are exact in double.
    */
  def stratifiedSample(df: DataFrame, strataCols: Seq[String],
      idCol: String, k: Int, salt: String = "graft"): DataFrame = {
    val strata = strataCols.map(col)
    val picked = df
      .select(strata :+ hash48(col(idCol), salt).as("__h") :+ col(idCol): _*)
      .groupBy(strata: _*)
      .agg(graft.functions.TopKFunctions
        .top_k((-col("__h")).cast("double"), col(idCol), k).as("top"))
      .select(strata :+ posexplode(col("top")): _*)
      .select(strata :+ col("col.id").as(idCol) :+
        (col("pos") + 1).cast("int").as("smp_rank"): _*)
    picked
  }

  /** [[stratifiedSample]] joined back to the full rows (left-semi on
    * the id — wide columns never shuffle through the sampler).
    */
  def stratifiedSampleRows(df: DataFrame, strataCols: Seq[String],
      idCol: String, k: Int, salt: String = "graft"): DataFrame =
    df.join(stratifiedSample(df, strataCols, idCol, k, salt)
      .select(col(idCol)), Seq(idCol), "left_semi")

  /** Deterministic domain-MIXTURE resample: draw ~`totalFraction` of
    * the corpus re-weighted to the `targets` mixture (domain ->
    * desired share of the sample; domains absent from `targets` are
    * dropped). The per-domain keep fraction is
    * min(1, totalFraction x n x t_d / c_d) — the factor that turns
    * domain d's current share c_d/n into target share t_d — and each
    * row's keep decision is the same content-hash threshold as
    * [[bernoulliSample]], so the sample is reproducible across
    * engines, partitionings, and re-runs. This is the
    * domain-reweighting step of a training-data mixture recipe
    * (upsample-by-omission only: a domain whose target exceeds its
    * supply saturates at keeping everything — this operator never
    * duplicates rows).
    *
    * Scale shape: ONE small aggregate (|domains| rows, map-side
    * combined) plus a one-row total, broadcast back as the per-domain
    * threshold; the corpus itself passes once through a stateless
    * filter — no corpus-sized shuffle, no driver collect.
    */
  def mixtureSample(df: DataFrame, domainCol: String, idCol: String,
      targets: Map[String, Double], totalFraction: Double,
      salt: String = "graft"): DataFrame = {
    require(totalFraction > 0 && totalFraction <= 1,
      s"totalFraction $totalFraction not in (0,1]")
    require(targets.nonEmpty && targets.values.forall(_ >= 0),
      "targets must be non-empty with non-negative shares")
    val spark = df.sparkSession
    import spark.implicits._
    val tgt = targets.toSeq.sortBy(_._1).toDF(domainCol, "__t")
    val total = df.agg(count(lit(1)).as("__n"))
    val frac = df.groupBy(col(domainCol)).agg(count(lit(1)).as("__c"))
      .join(broadcast(tgt), Seq(domainCol))
      .crossJoin(broadcast(total))
      // left-associative float chain, mirrored token-for-token by the
      // SQL oracle: ((totalFraction * n) * t) / c
      .select(col(domainCol),
        least(lit(1.0),
          lit(totalFraction) * col("__n").cast("double") * col("__t") /
            col("__c").cast("double")).as("__f"))
    df.join(broadcast(frac), Seq(domainCol))
      .filter(hash48(col(idCol), salt) <
        floor(col("__f") * lit(281474976710656.0)))
      .drop("__f")
  }

  /** Deterministic train/val/test (or any named) split assignment:
    * each row's 48-bit content hash lands in one of the cumulative
    * weight ranges, so the split is a pure function of (id, salt) —
    * reproducible across engines, partitionings, retries, and
    * re-runs on a grown corpus (existing rows never change split
    * when new rows arrive, the property an RNG-based split lacks).
    * Stateless per-row CASE, no shuffle.
    *
    * @param splits (name, weight) pairs in ASSIGNMENT ORDER; weights
    *               must sum to ~1 (cumulative thresholds are exact
    *               integers, floor(cum * 2^48); the final range is
    *               closed at 2^48 so every row is assigned)
    * @return input plus a `split` string column
    */
  def hashSplit(df: DataFrame, idCol: String,
      splits: Seq[(String, Double)], salt: String = "graft"): DataFrame = {
    require(splits.nonEmpty, "hashSplit needs at least one split")
    require(splits.forall(_._2 > 0), s"weights must be positive: $splits")
    val total = splits.map(_._2).sum
    require(math.abs(total - 1.0) < 1e-9,
      s"split weights must sum to 1, got $total")
    // exact-integer cumulative thresholds, replayed by the oracle
    val cums = splits.scanLeft(0.0)(_ + _._2).tail
      .map(c => (math.min(c, 1.0) * (1L << 48)).toLong)
    val h = hash48(col(idCol), salt)
    val assign = splits.zip(cums).dropRight(1)
      .foldLeft(org.apache.spark.sql.functions.when(lit(false), lit(""))) {
        case (acc, ((name, _), cum)) => acc.when(h < lit(cum), lit(name))
      }
      .otherwise(lit(splits.last._1))
    df.withColumn("split", assign)
  }
}
