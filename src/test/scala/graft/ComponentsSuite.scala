package graft

import org.apache.spark.sql.functions._

import graft.operators.{Components, Dedup}

/** Connected-components resolution of near-duplicate pairs:
  * correctness vs a driver-side union-find oracle, transitivity (the
  * per-pair drop's failure case), pointer-doubling round counts, and
  * the unrolled-CTE margin the neardup_clusters oracle depends on.
  */
class ComponentsSuite extends SparkSuite {
  import spark.implicits._

  private def labelsOf(pairs: Seq[(Long, Long)]): Map[Long, Long] =
    Components.connectedComponents(pairs.toDF("id_a", "id_b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("transitive closure keeps one survivor per component") {
    // the per-pair higher-id drop's counterexample: (1,3),(2,3) must
    // resolve to ONE component with minimum 1 — not keep both 1 and 2
    val got = labelsOf(Seq((1L, 3L), (2L, 3L), (7L, 8L)))
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 7L -> 7L, 8L -> 7L))
  }

  test("chain graph: min label reaches the far end in O(log n) rounds") {
    val chain = (0L until 16L).sliding(2).map(s => (s(0), s(1))).toSeq
    val (labels, rounds) = Components.runRounds(
      chain.toDF("id_a", "id_b"), "id_a", "id_b", 40, driverMaxPairs = 0)
    val got = labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == (0L until 16L).map(_ -> 0L).toMap)
    // diameter 15: plain propagation needs 15 rounds, the jump gets
    // there in ~log2; the last round is the no-change detector
    assert(rounds <= 7, s"pointer doubling should converge fast, took $rounds")
  }

  test("random graph matches a driver-side union-find") {
    val rnd = new scala.util.Random(11)
    val n = 200
    val pairs = (0 until 260).map(_ =>
      (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
      .filter { case (a, b) => a != b }
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .distinct
    // union-find oracle
    val parent = Array.tabulate(n)(identity)
    def find(x: Int): Int = { var r = x; while (parent(r) != r) r = parent(r); r }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a.toInt), find(b.toInt))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val want = pairs.flatMap(p => Seq(p._1, p._2)).distinct
      .map(id => id -> {
        // component minimum = min over members of the find-root class
        val root = find(id.toInt)
        (0 until n).filter(j => find(j) == root).min.toLong
      }).toMap
    assert(labelsOf(pairs) == want)
    // the distributed loop (fast path force-disabled) must agree with
    // the driver union-find on the identical graph
    val (dist, _) = Components.runRounds(pairs.toDF("id_a", "id_b"),
      "id_a", "id_b", 40, driverMaxPairs = 0)
    assert(dist.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap == want)
  }

  test("string ids take the driver fast path with lexicographic minima") {
    val pairs = Seq(("b", "c"), ("a", "c"), ("x", "y")).toDF("id_a", "id_b")
    val got = Components.connectedComponents(pairs)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got == Map("a" -> "a", "b" -> "a", "c" -> "a", "x" -> "x", "y" -> "x"))
  }

  test("empty pair list yields an empty labeling") {
    val empty = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    assert(Components.connectedComponents(empty).count() == 0)
  }

  test("RAW propagate+jump fixpoint stays within the oracle's 16 unrolled rounds") {
    // The neardup_clusters oracle unrolls CcOracleRounds=16 rounds of
    // the RAW scheme (no shortcutting, one jump per round). This runs
    // that exact scheme per SF and asserts the fixpoint lands at <= 15
    // — an executable pin on the oracle margin, so a data or SF change
    // that under-converges fails HERE and not as an opaque oracle hash
    // mismatch. (Measured: 2 at sf0.001/sf0.01, 13 at sf0.1.)
    for (d <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      try {
        val pairs = Dedup.minHashCandidates(Tables.documents(spark, sf(d)))
        val (_, rounds) = Components.runRounds(pairs, "id_a", "id_b", 40,
          jumpsPerRound = 1, shortcutRounds = 0, driverMaxPairs = 0)
        assert(rounds - 1 <= 15,
          s"$d: raw fixpoint after ${rounds - 1} rounds — raise CcOracleRounds")
      } finally graft.core.OpCaches.release()
    }
  }

  test("minhash pairs converge within the oracle's unrolled depth at every SF") {
    // The oracle unrolls 16 propagate+jump rounds in SQL over the RAW
    // edge list (no shortcutting), which covers its own fixpoint (13
    // rounds at sf0.1, simulated) with margin; the Spark side runs
    // shortcut+jump and must reach the same fixpoint in far fewer
    // rounds (measured: 2 at sf0.001/sf0.01, 6 at sf0.1 after two
    // shortcut rounds; the final round is the no-change detector).
    for (d <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      try {
        val pairs = Dedup.minHashCandidates(Tables.documents(spark, sf(d)))
        val (_, rounds) = Components.runRounds(pairs, "id_a", "id_b", 40,
          driverMaxPairs = 0)
        assert(rounds - 1 <= 8, s"$d: fixpoint after ${rounds - 1} rounds — shortcutting regressed?")
      } finally graft.core.OpCaches.release()
    }
  }
}
