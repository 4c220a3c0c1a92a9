package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Connected components over an undirected edge list — the transitive
  * closure the near-duplicate pair operators need: a curation pipeline
  * keeps ONE survivor per component, and per-pair heuristics are not
  * transitive (dropping the higher id of each pair keeps both 1 and 2
  * for pairs (1,3),(2,3); the component {1,2,3} keeps only 1).
  *
  * Algorithm: iterative min-label propagation with pointer doubling.
  * Each round
  *  (a) propagates: label(v) <- min over {label(v)} ∪ {label(u) : u ∈
  *      N(v)} — one join of the edge list against the label table plus
  *      one map-side-partial min aggregation;
  *  (b) jumps: label(v) <- min(label(v), label(label(v))) — one
  *      self-join of the label table (labels are always node ids, so
  *      the lookup is total).
  * Labels are monotonically non-increasing and reach the component
  * minimum in O(log diameter) rounds with the jump (propagation alone
  * is O(diameter)). The propagate+jump pair is the relational cousin
  * of the star-contraction MapReduce CC family (large-star/small-star,
  * Kiveris et al., "Connected Components in MapReduce and Beyond",
  * SoCC 2014); pointer jumping per Shiloach & Vishkin (1982).
  *
  * Scale shape: nothing wider than (id, label) ever shuffles — the
  * propagate join is keyed by node id, the min aggregation is partial,
  * and the driver sees one changed-count scalar per round. Each
  * round's labels are `localCheckpoint`ed (eager): persist alone is
  * NOT enough for iterative plans — the cached data short-circuits
  * execution but the logical plan still nests one level per round, and
  * the per-round self-join DOUBLES it, so Catalyst re-analysis goes
  * exponential around round ~10 (observed: minutes of pure planning on
  * a 16-node chain). Checkpointing truncates the plan to a LogicalRDD
  * leaf, keeping every round's analysis O(1). On a real cluster prefer
  * reliable `checkpoint` (HDFS/object store) for fault tolerance;
  * executor-local checkpoints die with an executor. Superseded
  * checkpoint RDDs are freed by Spark's ContextCleaner as the frames
  * go out of scope.
  */
object Components {

  /** (id, label) for every id appearing in `pairs`, where label = the
    * minimum id of the node's connected component. Ids absent from
    * `pairs` are their own singleton components — callers left-join
    * and coalesce (see the neardup_clusters registered query).
    */
  def connectedComponents(pairs: DataFrame, idA: String = "id_a",
      idB: String = "id_b", maxRounds: Int = 40): DataFrame =
    runRounds(pairs, idA, idB, maxRounds)._1

  /** Implementation with the convergence round count exposed (tests
    * assert the oracle's unrolled-CTE depth covers it with margin).
    */
  private[graft] def runRounds(pairs: DataFrame, idA: String,
      idB: String, maxRounds: Int): (DataFrame, Int) = {
    val edges = pairs.select(col(idA).as("src"), col(idB).as("dst"))
      .union(pairs.select(col(idB).as("src"), col(idA).as("dst")))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // eager localCheckpoint: truncate the plan to a materialized leaf
    var labels = edges.select(col("src").as("id")).distinct()
      .withColumn("label", col("id"))
      .localCheckpoint()
    var rounds = 0
    var changed = 1L
    while (changed > 0 && rounds < maxRounds) {
      val prop = labels
        .union(edges.join(labels.withColumnRenamed("id", "dst"), Seq("dst"))
          .select(col("src").as("id"), col("label")))
        .groupBy(col("id")).agg(min(col("label")).as("label"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      val jump = prop.select(col("id").as("jid"), col("label").as("jlabel"))
      val next = prop.join(jump, prop("label") === col("jid"))
        .select(prop("id"), least(prop("label"), col("jlabel")).as("label"))
        .localCheckpoint()
      changed = next.join(labels.withColumnRenamed("label", "old"), Seq("id"))
        .filter(col("label") =!= col("old")).count()
      prop.unpersist()
      labels = next
      rounds += 1
    }
    edges.unpersist()
    (labels, rounds)
  }
}
