package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.apache.spark.storage.StorageLevel

/** Connected components over an undirected edge list — the transitive
  * closure the near-duplicate pair operators need: a curation pipeline
  * keeps ONE survivor per component, and per-pair heuristics are not
  * transitive (dropping the higher id of each pair keeps both 1 and 2
  * for pairs (1,3),(2,3); the component {1,2,3} keeps only 1).
  *
  * Algorithm: degree-capped 2-hop shortcutting followed by iterative
  * min-label propagation with pointer jumping.
  *
  * Shortcut phase (once, before the loop): E' = E ∪ {(a,c) : (a,b),
  * (b,c) ∈ E, deg(b) ≤ cap}. Each application halves the effective
  * diameter; two applications quarter it. The degree cap bounds the
  * blowup — near-dup components that are cliques of duplicates gain
  * nothing from shortcutting (already diameter 1) and hub nodes would
  * contribute deg² candidate edges, while the path-shaped components
  * that actually need diameter reduction are low-degree by nature.
  * Measured on the sf0.1 minhash graph (12.8k pairs, largest
  * component 634 nodes): two shortcut rounds grow edges 3.4x and cut
  * the label loop from 13 rounds to 5. The pointer jump alone cannot
  * do this: jumping contracts pointer CHAINS, and with adversarially
  * ordered node ids min-label propagation stalls on plateaus around
  * local id minima (simulated: a randomly-ordered 4000-chain does not
  * converge in 60 rounds with jumps alone).
  *
  * Label loop: label(v) <- min over the closed neighborhood, one join
  * of the (self-looped) edge list against the label table plus a
  * map-side-partial min aggregation; then label(v) <- min(label(v),
  * label(label(v))) — a self-join of the narrow (id, label) table
  * (labels are always node ids, so the lookup is total). Converges in
  * O(log diameter) rounds; relational cousin of the star-contraction
  * MapReduce CC family (large-star/small-star, Kiveris et al.,
  * "Connected Components in MapReduce and Beyond", SoCC 2014),
  * pointer jumping per Shiloach & Vishkin (1982).
  *
  * Scale shape: nothing wider than (id, label) or (src, dst) ever
  * shuffles; the min aggregation is partial; the driver sees one
  * sum-of-labels scalar per round (labels only ever decrease, so the
  * decimal(38,0) total — overflow-free at any node count — is
  * strictly smaller iff any label changed). Each round's labels are
  * checkpointed via [[org.apache.spark.sql.graft.DatasetBridge]]:
  * persist alone leaves the logical plan nesting one level per round
  * (Catalyst re-analysis goes exponential around round ~10), a plain
  * `localCheckpoint` carries origin stats whose join-product estimate
  * compounds into a BigInteger so large the driver hangs multiplying
  * it, and the bridge variant drops the stats while KEEPING the
  * physical hash partitioning, so the propagate join against the
  * dst-partitioned cached edge list needs no extra exchange. AQE is
  * disabled for the duration of the loop (restored after): adaptive
  * re-planning re-coalesces every tiny shuffle, which both adds a
  * scheduling round-trip per stage and breaks the stable
  * co-partitioning the loop is built around — the fixed-width plan is
  * exactly what a long-running 1000-executor job wants for an
  * iteration whose per-round topology never changes. On a real
  * cluster prefer reliable `checkpoint` (HDFS/object store) for fault
  * tolerance; executor-local checkpoints die with an executor.
  * Superseded checkpoint RDDs are freed by Spark's ContextCleaner as
  * the frames go out of scope.
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
    *
    * The loop runs on a clone of the caller's session (shared
    * SparkContext/cache manager/catalog, runtime confs copied at
    * clone time): it wants AQE off and a graph-sized shuffle width
    * for the duration, and setting those on the caller's session
    * would leak them into any concurrent query (and two concurrent
    * loops would clobber each other's saved/restored values). The
    * transplanted plan and the returned labels interoperate freely
    * with caller-side frames.
    */
  private[graft] def runRounds(pairs: DataFrame, idA: String,
      idB: String, maxRounds: Int, jumpsPerRound: Int = 1,
      shortcutRounds: Int = 2, shortcutDegreeCap: Int = 32): (DataFrame, Int) = {
    val caller = pairs.sparkSession
    val sessionPartitions =
      caller.conf.get("spark.sql.shuffle.partitions", "200").toInt
    val loopSession = org.apache.spark.sql.graft.DatasetBridge.loopSession(caller)
    loopSession.conf.set("spark.sql.adaptive.enabled", "false")
    val isolated = org.apache.spark.sql.graft.DatasetBridge
      .transplant(pairs, loopSession)
    val (labels, rounds) = runLoop(isolated, idA, idB, maxRounds,
      jumpsPerRound, shortcutRounds, shortcutDegreeCap, sessionPartitions)
    (org.apache.spark.sql.graft.DatasetBridge.transplant(labels, caller), rounds)
  }

  private def truncate(df: DataFrame): DataFrame =
    org.apache.spark.sql.graft.DatasetBridge.localCheckpointNoStats(df)

  // dev-only phase timing, enabled via GRAFT_CC_DEBUG=1
  private def debugT[A](tag: String)(f: => A): A =
    if (System.getenv("GRAFT_CC_DEBUG") == null) f
    else {
      val t0 = System.nanoTime()
      val r = f
      println(f"CC_DEBUG $tag ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

  private def runLoop(pairs: DataFrame, idA: String, idB: String,
      maxRounds: Int, jumpsPerRound: Int, shortcutRounds: Int,
      shortcutDegreeCap: Int, sessionPartitions: Int): (DataFrame, Int) = {
    val spark = pairs.sparkSession
    // doubled edge list + self-loops: the self-loop row makes the
    // propagate join yield each node's OWN label too, so no union is
    // needed, and it regenerates existing edges during shortcutting
    // materialize the incoming pair plan ONCE: the base union below
    // references it four times, and an unpersisted upstream (e.g. the
    // minhash band join) would re-execute per reference
    val p0 = debugT("init_pairs")(truncate(
      pairs.select(col(idA).as("a"), col(idB).as("b"))))
    val base = debugT("init_edges")(truncate(
      p0.select(col("a").as("src"), col("b").as("dst"))
        .union(p0.select(col("b").as("src"), col("a").as("dst")))
        .union(p0.select(col("a").as("s")).union(p0.select(col("b")))
          .distinct().select(col("s").as("src"), col("s").as("dst")))))

    // size the loop's shuffle width to the graph, not the session: the
    // per-round tables are (id, label) / (src, dst) pairs, and a
    // session width tuned for wide scans means every tiny fixpoint
    // round pays 32 near-empty tasks per exchange (measured ~0.9 s per
    // round on a 57k-edge graph; ~0.35 s at the scaled width). ~1M
    // narrow rows per partition; grows back to session width once the
    // edge list actually is large.
    val nEdges = base.count()
    val loopP = math.max(2, math.min(sessionPartitions,
      ((nEdges + (1 << 20) - 1) / (1 << 20)).toInt))
    spark.conf.set("spark.sql.shuffle.partitions", loopP)

    var edges = base.repartition(col("dst"))

    // shortcut: E <- distinct(E ∪ {(a,c) : (a,b),(b,c), deg(b) ≤ cap});
    // self-loops survive (a→a→a) and original edges survive via the
    // explicit union, so capping never loses connectivity
    for (_ <- 1 to shortcutRounds) {
      val deg = edges.filter(col("src") =!= col("dst"))
        .groupBy(col("dst").as("mid")).agg(count(lit(1)).as("deg"))
        .filter(col("deg") <= shortcutDegreeCap)
        .select(col("mid"))
      val hop = edges.join(deg, edges("dst") === col("mid"))
        .select(col("src"), col("dst").as("mid2"))
        .join(edges.select(col("src").as("mid3"), col("dst").as("dst2")),
          col("mid2") === col("mid3"))
        .select(col("src"), col("dst2").as("dst"))
      edges = debugT("shortcut")(truncate(edges.union(hop).distinct()
        .repartition(col("dst"))))
    }
    val cachedEdges = edges.persist(StorageLevel.MEMORY_AND_DISK)

    var labels = debugT("init_labels")(truncate(
      cachedEdges.filter(col("src") === col("dst"))
        .select(col("src").as("id"), col("src").as("label"))))
    def labelSum(df: DataFrame): Option[java.math.BigDecimal] =
      Option(df.agg(sum(col("label").cast(DecimalType(38, 0)))).head.getDecimal(0))
    var prevSum = labelSum(labels)
    var rounds = 0
    var changed = prevSum.isDefined // empty graph: already converged
    while (changed && rounds < maxRounds) {
      val prop = cachedEdges
        .join(labels.withColumnRenamed("id", "dst"), Seq("dst"))
        .groupBy(col("src").as("id")).agg(min(col("label")).as("label"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      var cur: DataFrame = prop
      val cached = Seq.newBuilder[DataFrame]
      cached += prop
      for (j <- 1 to jumpsPerRound) {
        val lookup = cur.select(col("id").as("jid"), col("label").as("jlabel"))
        val stepped = cur.join(lookup, cur("label") === col("jid"))
          .select(cur("id"), least(cur("label"), col("jlabel")).as("label"))
        cur =
          if (j < jumpsPerRound) {
            val p = stepped.persist(StorageLevel.MEMORY_AND_DISK)
            cached += p
            p
          } else stepped
      }
      val next = debugT("round_ckpt")(truncate(cur))
      val s = debugT("round_sum")(labelSum(next))
      changed = s != prevSum
      prevSum = s
      cached.result().foreach(_.unpersist())
      labels = next
      rounds += 1
    }
    cachedEdges.unpersist()
    (labels, rounds)
  }
}
