package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, DecimalType, IntegerType, LongType, ShortType, StringType, StructField, StructType}
import org.apache.spark.storage.StorageLevel

/** Connected components over an undirected edge list — the transitive
  * closure the near-duplicate pair operators need: a curation pipeline
  * keeps ONE survivor per component, and per-pair heuristics are not
  * transitive (dropping the higher id of each pair keeps both 1 and 2
  * for pairs (1,3),(2,3); the component {1,2,3} keeps only 1).
  *
  * Algorithm: a size-gated driver union-find for pair lists small
  * enough to collect (the same call Spark's planner makes when it
  * broadcasts a small join side — candidate pairs are the distillate
  * of a near-dup pipeline and usually tiny relative to the corpus);
  * above the gate, degree-capped 2-hop shortcutting followed by
  * iterative min-label propagation with pointer jumping.
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
    *
    * Null semantics: a pair with a null on either side is dropped
    * before anything runs (filtered ahead of the fast-path gate, so
    * the driver union-find and the distributed loop see the same
    * edges); a node paired ONLY with null thus gets no label row and
    * falls under the caller-side singleton coalesce above.
    */
  def connectedComponents(pairs: DataFrame, idA: String = "id_a",
      idB: String = "id_b", maxRounds: Int = 40): DataFrame =
    runRounds(pairs, idA, idB, maxRounds)._1

  /** Pair count at or below which the component resolution runs as a
    * single driver-side union-find instead of the iterative join loop
    * — the same decision Spark's own planner makes when it broadcasts
    * a small join side rather than shuffling both. Candidate-pair
    * lists are the DISTILLATE of a near-dup pipeline (sf0.1: 60k docs
    * -> 12.8k pairs), so even large corpora often land under this; a
    * 100 TB corpus whose pair list exceeds it takes the distributed
    * loop. 2M pairs ≈ tens of MB on the driver — conservative against
    * a normal driver heap, configurable per call.
    */
  val DefaultDriverMaxPairs: Long = 2L * 1000 * 1000

  /** Implementation with the convergence round count exposed (tests
    * assert the oracle's unrolled-CTE depth covers it with margin;
    * the driver fast path reports 0 rounds).
    *
    * The incoming pair plan is materialized ONCE (localCheckpoint) on
    * the caller's session — downstream both paths reference it
    * repeatedly, and an unpersisted upstream (e.g. the minhash band
    * join) would re-execute per reference at scale. The checkpoint
    * also yields the pair count for free, which gates the fast path.
    *
    * The distributed loop runs on a clone of the caller's session
    * (shared SparkContext/cache manager/catalog, runtime confs copied
    * at clone time): it wants AQE off and a graph-sized shuffle width
    * for the duration, and setting those on the caller's session
    * would leak them into any concurrent query (and two concurrent
    * loops would clobber each other's saved/restored values). The
    * transplanted plan and the returned labels interoperate freely
    * with caller-side frames.
    */
  private[graft] def runRounds(pairs: DataFrame, idA: String,
      idB: String, maxRounds: Int, jumpsPerRound: Int = 1,
      shortcutRounds: Int = 2, shortcutDegreeCap: Int = 32,
      driverMaxPairs: Long = DefaultDriverMaxPairs): (DataFrame, Int) = {
    val caller = pairs.sparkSession
    val p0 = debugT("init_pairs")(truncate(
      pairs.select(col(idA).as("a"), col(idB).as("b"))
        .filter(col("a").isNotNull && col("b").isNotNull)))
    val nPairs = p0.count()
    val dts = p0.schema.fields.map(_.dataType)
    if (nPairs <= driverMaxPairs && dts(0) == dts(1) &&
        driverOrdering(dts(0)).isDefined)
      return (debugT("driver_uf")(driverComponents(p0, dts(0))), 0)
    val sessionPartitions =
      caller.conf.get("spark.sql.shuffle.partitions", "200").toInt
    val loopSession = org.apache.spark.sql.graft.DatasetBridge.loopSession(caller)
    loopSession.conf.set("spark.sql.adaptive.enabled", "false")
    val isolated = org.apache.spark.sql.graft.DatasetBridge
      .transplant(p0, loopSession)
    val (labels, rounds) = runLoop(isolated, maxRounds,
      jumpsPerRound, shortcutRounds, shortcutDegreeCap, sessionPartitions)
    (org.apache.spark.sql.graft.DatasetBridge.transplant(labels, caller), rounds)
  }

  /** Orderings the driver fast path supports; any other id type (or
    * mismatched a/b types) falls through to the distributed loop,
    * which is type-agnostic.
    */
  private def driverOrdering(dt: DataType): Option[Ordering[Any]] = dt match {
    case LongType => Some(Ordering.by((x: Any) => x.asInstanceOf[Long]))
    case IntegerType => Some(Ordering.by((x: Any) => x.asInstanceOf[Int]))
    case ShortType => Some(Ordering.by((x: Any) => x.asInstanceOf[Short]))
    case StringType => Some(Ordering.by((x: Any) => x.asInstanceOf[String]))
    case _ => None
  }

  /** Small-graph fast path: union-find with path halving on the
    * collected pair list, then one pass assigning every node the
    * minimum id of its component — identical semantics to the loop's
    * fixpoint, at the cost of one collect instead of O(log d) joined
    * rounds. Runs entirely on the caller's session; no clone, no
    * conf changes, no checkpoints beyond the shared one.
    */
  private def driverComponents(p0: DataFrame, dt: DataType): DataFrame = {
    val spark = p0.sparkSession
    val ord = driverOrdering(dt).get
    val rows = p0.collect()
    val index = new java.util.HashMap[Any, Integer]()
    val ids = new scala.collection.mutable.ArrayBuffer[Any]()
    def idxOf(v: Any): Int = {
      val got = index.get(v)
      if (got != null) got.intValue()
      else { val i = ids.length; ids += v; index.put(v, i); i }
    }
    val parent = new scala.collection.mutable.ArrayBuffer[Int]()
    def find(x0: Int): Int = {
      var x = x0
      while (parent(x) != x) { parent(x) = parent(parent(x)); x = parent(x) }
      x
    }
    rows.foreach { r =>
      if (!r.isNullAt(0) && !r.isNullAt(1)) {
        val a = idxOf(r.get(0)); while (parent.length < ids.length) parent += parent.length
        val b = idxOf(r.get(1)); while (parent.length < ids.length) parent += parent.length
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
    }
    // component minimum per root, then one labeled row per node
    val minOfRoot = new java.util.HashMap[Int, Any]()
    var i = 0
    while (i < ids.length) {
      val r = find(i)
      val cur = minOfRoot.get(r)
      if (cur == null || ord.lt(ids(i), cur)) minOfRoot.put(r, ids(i))
      i += 1
    }
    val out = new java.util.ArrayList[Row](ids.length)
    i = 0
    while (i < ids.length) {
      out.add(Row(ids(i), minOfRoot.get(find(i))))
      i += 1
    }
    spark.createDataFrame(out, StructType(Seq(
      StructField("id", dt, nullable = false),
      StructField("label", dt, nullable = false))))
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

  private def runLoop(p0: DataFrame,
      maxRounds: Int, jumpsPerRound: Int, shortcutRounds: Int,
      shortcutDegreeCap: Int, sessionPartitions: Int): (DataFrame, Int) = {
    val spark = p0.sparkSession
    // doubled edge list + self-loops: the self-loop row makes the
    // propagate join yield each node's OWN label too, so no union is
    // needed, and it regenerates existing edges during shortcutting.
    // p0 arrives pre-materialized (checkpointed by the caller) — the
    // union below references it four times
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
      Option(df.agg(sum(col("label").cast(DecimalType(38, 0)))).head().getDecimal(0))
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
