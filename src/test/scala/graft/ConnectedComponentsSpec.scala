package graft

import org.apache.spark.sql.functions._
import graft.operators.Dedup

class ConnectedComponentsSpec extends SparkSpec {

  private def pairsDf(pairs: Seq[(Long, Long)]) = {
    val s = spark; import s.implicits._
    pairs.toDF("a", "b")
  }

  // exercise BOTH paths: the driver union-find fast path (default
  // threshold) and the distributed label-propagation loop (forced via
  // smallGraphEdges = 0)
  private def cc(pairs: Seq[(Long, Long)], maxIter: Int = 25) = {
    val fast = Dedup.connectedComponents(pairsDf(pairs), "a", "b",
        maxIter = maxIter)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val dist = Dedup.connectedComponents(pairsDf(pairs), "a", "b",
        maxIter = maxIter, smallGraphEdges = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fast == dist, "fast-path and distributed results must agree")
    dist
  }

  test("chain, clique, and separate component all take their min id") {
    // 1-2-3-4 chain; {10,11,12} clique; {20,21} pair
    val got = cc(Seq((1L, 2L), (2L, 3L), (3L, 4L),
      (10L, 11L), (11L, 12L), (10L, 12L), (20L, 21L)))
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L, 21L -> 20L))
  }

  test("label flows against edge direction (min on the 'dst' side)") {
    // min id sits at the far end of a directed pair chain: propagation
    // must walk both directions to reach it
    val got = cc(Seq((5L, 1L), (6L, 5L), (7L, 6L)))
    assert(got.values.toSet == Set(1L))
    assert(got.keySet == Set(1L, 5L, 6L, 7L))
  }

  test("long chain converges within maxIter via doubling-free propagation") {
    // diameter 12 chain: plain hash-min needs ~12 rounds < default 25
    val edges = (0L until 12L).map(i => (i, i + 1))
    val got = cc(edges)
    assert(got.values.toSet == Set(0L))
  }

  test("distributed loop frees superseded checkpoint blocks") {
    // clearCache() never reclaims localCheckpoint blocks, so the loop
    // must unpersist each superseded round itself; otherwise a multi-round
    // run leaves O(rounds) block sets resident as GC pressure for whatever
    // runs next. Survivors allowed: the final labels checkpoint (returned,
    // still being consumed) — nothing proportional to round count.
    spark.catalog.clearCache()
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = true))
    val edges = (0L until 12L).map(i => (i, i + 1))
    val out = Dedup.connectedComponents(pairsDf(edges), "a", "b",
      smallGraphEdges = 0L)
    out.collect() // materialize through the final checkpoint
    val live = spark.sparkContext.getPersistentRDDs.size
    assert(live <= 1, s"expected at most the final labels checkpoint, found $live persistent RDDs")
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = false))
  }

  test("star contraction matches plain CC on every topology") {
    val topologies = Seq(
      Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L), (11L, 12L), (10L, 12L),
        (20L, 21L)),
      Seq((5L, 1L), (6L, 5L), (7L, 6L)),
      (0L until 12L).map(i => (i, i + 1)),
      Seq((42L, 42L)), // self-loop only: node must survive as its own root
      Seq((9L, 3L), (3L, 9L), (9L, 9L), (2L, 9L))) // duplicates + reversal
    topologies.foreach { pairs =>
      val plain = cc(pairs)
      val stars = Dedup.connectedComponentsStars(pairsDf(pairs), "a", "b")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(stars == plain, s"star contraction diverged on $pairs")
    }
  }

  test("stars with exhausted maxIter still emits one row per id") {
    // maxIter=0: loop never runs, the raw (deduped) edges stand in for
    // the star forest — node 3 has two parents (1 and 2), which must
    // NOT fan out into duplicate output rows
    val out = Dedup.connectedComponentsStars(
        pairsDf(Seq((3L, 1L), (3L, 2L), (1L, 2L))), "a", "b", maxIter = 0)
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    assert(out.map(_._1).sorted.toSeq == Seq(1L, 2L, 3L),
      "exactly one row per node even when unconverged")
    assert(out.toMap.apply(3L) == 1L, "degenerate branch takes the min parent")
  }

  test("giant-component fallback: star handover equals plain CC labels") {
    // Adversarial shape for label compression: one component of ~1e5
    // nodes built as a long path (forces many propagation rounds) welded
    // to a broad star (one hub with huge degree — the skew hazard), plus
    // a second small component that must NOT be absorbed. Forced through
    // the distributed branch (smallGraphEdges = 0) with the trip-wire set
    // low enough that round 1 already exceeds it, so the run exercises
    // the seeded handover path, not just connectedComponentsStars alone.
    val n = 100000L
    val s = spark; import s.implicits._
    val path = s.range(0L, n / 2).select(
      col("id").as("a"), (col("id") + 1L).as("b"))
    val star = s.range(n / 2, n).select(
      lit(n / 4).as("a"), col("id").as("b")) // hub mid-path, degree n/2
    val other = Seq((n + 10L, n + 11L), (n + 11L, n + 12L)).toDF("a", "b")
    val pairs = path.union(star).union(other)
    val viaFallback = Dedup.connectedComponents(pairs, "a", "b",
        smallGraphEdges = 0L, starFallbackLabelFreq = 1000L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaFallback.size == n.toInt + 3)
    assert((0L until n).forall(viaFallback(_) == 0L),
      "giant component must label to its min id 0")
    assert(Seq(n + 10L, n + 11L, n + 12L).forall(viaFallback(_) == n + 10L),
      "separate component must keep its own min label")
  }

  test("deterministic under repartition of the pair input") {
    val pairs = Seq((3L, 9L), (9L, 4L), (100L, 7L), (7L, 3L))
    val a = Dedup.connectedComponents(pairsDf(pairs), "a", "b")
    val b = Dedup.connectedComponents(
      pairsDf(pairs).repartition(13), "a", "b")
    assert(sortedRows(a) == sortedRows(b))
    assert(a.collect().forall(_.getLong(1) == 3L))
  }
}
