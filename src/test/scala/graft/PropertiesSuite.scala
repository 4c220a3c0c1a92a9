package graft

import graft.selectivesearch.{BucketResolver, SelectiveSearch}

/** Grid-based invariants the reference only implies (SURVEY.md §5):
  * decay-sequence shape, select identity at full budget, greedy-
  * resolution budget and contiguity. Deterministic parameter sweeps
  * rather than random generators — same coverage, reproducible runs.
  */
class PropertiesSuite extends SparkSuite {
  import spark.implicits._

  test("decayedBuckets: length, head, monotone non-increasing, all >= 1") {
    for {
      nb <- Seq(1, 2, 7, 64)
      ns <- Seq(0, 1, 5, 20)
      decay <- Seq(0.01, 0.3, 0.5, 0.77, 0.9, 1.0)
    } {
      val seq = SelectiveSearch.decayedBuckets(nb.toDouble, ns, decay)
      assert(seq.length == ns)
      assert(seq.zip(seq.drop(1)).forall { case (a, b) => a >= b },
        s"not monotone: $seq (nb=$nb ns=$ns d=$decay)")
      assert(seq.forall(_ >= 1))
      if (ns > 0) assert(seq.head == nb)
    }
  }

  test("select with t > max rank is identity modulo sort") {
    for { nq <- Seq(1, 3); ns <- Seq(1, 4) } {
      val results = (for {
        q <- 0 until nq; s <- 0 until ns; d <- 0 until 3
      } yield (q, s, (q * 131 + s * 17 + d * 7) % 97 * 1.0, q * 100 + s * 10 + d))
        .toDF("query", "shard", "score", "gdocid")
      val selection = (for { q <- 0 until nq; s <- 0 until ns }
        yield (q, s, (s + q) % ns)).toDF("query", "shard", "rank")
      val selected = SelectiveSearch.select(selection, results, ns + 1)
      assert(selected.count() == results.count())
    }
  }

  test("resolveBucketSelection: cost <= threshold, contiguous prefixes") {
    for {
      threshold <- Seq(0, 1, 3, 7, 12)
      ns <- Seq(1, 2, 3)
      nb <- Seq(1, 2, 3)
    } {
      val sel = (for { q <- 0 until 2; s <- 0 until ns; b <- 0 until nb }
        yield (q, s, b, (q * 7 + s * 3 + b * 5) % (ns * nb))
        ).toDF("query", "shard", "bucket", "rank")
      val resolved = BucketResolver.resolveBucketSelection(sel, threshold)
        .collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(2)))
      resolved.groupBy(_._1).foreach { case (q, rows) =>
        assert(rows.length <= threshold,
          s"query $q selected ${rows.length} > $threshold buckets")
      }
      resolved.groupBy(r => (r._1, r._2)).foreach { case (_, rows) =>
        val buckets = rows.map(_._3).sorted
        assert(buckets.toSeq == (0 until buckets.length),
          s"non-contiguous bucket prefix: ${buckets.toSeq}")
      }
    }
  }
}
