package graft

import scala.util.Random
import graft.operators.{AsOfJoin, Dedup}

/** Randomized equivalence contracts for the graph/temporal operators:
  * the distributed implementations must match straightforward local
  * reference implementations on seeded random inputs — shapes a
  * hand-picked fixture can miss (self-pairs, diamond merges, dense
  * hubs, duplicate timestamps).
  */
class GraphPropertySpec extends SparkSpec {

  test("connectedComponents matches local union-find on random graphs") {
    val s = spark; import s.implicits._
    for (seed <- Seq(7, 42, 1337)) {
      val rnd = new Random(seed)
      val nodes = 200
      val pairs = Seq.fill(300)((rnd.nextInt(nodes).toLong, rnd.nextInt(nodes).toLong))
        .filter { case (a, b) => a != b }
      // local union-find reference
      val parent = Array.tabulate(nodes)(identity)
      def find(x: Int): Int = { var r = x; while (parent(r) != r) r = parent(r); r }
      pairs.foreach { case (a, b) =>
        val (ra, rb) = (find(a.toInt), find(b.toInt))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val inGraph = pairs.flatMap(p => Seq(p._1, p._2)).distinct
      // component id = min member id, matching the operator's contract
      val expected = inGraph.groupBy(v => find(v.toInt))
        .flatMap { case (_, vs) => val m = vs.min; vs.map(_ -> m) }
      for (bound <- Seq(100000L, 0L)) { // fast path AND distributed loop
        val got = Dedup.connectedComponents(pairs.toDF("a", "b"), "a", "b",
            smallGraphEdges = bound)
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        assert(got == expected, s"seed $seed bound $bound mismatch")
      }
      // forced star handover (trip-wire at 1 fires on round 1) with the
      // driver bail-out disabled: the full distributed contraction must
      // agree with union-find on the same random shapes
      val viaStars = Dedup.connectedComponents(pairs.toDF("a", "b"), "a", "b",
          smallGraphEdges = 0L, starFallbackLabelFreq = 1L)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(viaStars == expected, s"seed $seed star-fallback mismatch")
      // and the public star entry point directly
      val direct = Dedup.connectedComponentsStars(pairs.toDF("a", "b"), "a", "b",
          smallGraphEdges = 0L)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(direct == expected, s"seed $seed stars-direct mismatch")
    }
  }

  test("asOf matches the naive latest-at-or-before scan on random data") {
    val s = spark; import s.implicits._
    val rnd = new Random(99)
    val left = Seq.tabulate(120)(i =>
      (rnd.nextInt(8).toLong, rnd.nextInt(40).toLong, i.toLong))
    val right = Seq.tabulate(60)(i => (rnd.nextInt(8).toLong, rnd.nextInt(40).toLong))
      .distinct // unique (key, ts): the operator's stated precondition
      .map { case (k, ts) => (k, ts, s"p$k-$ts") }
    for (strict <- Seq(false, true)) {
      val expected = left.map { case (k, ts, id) =>
        val cand = right.filter(r =>
          r._1 == k && (if (strict) r._2 < ts else r._2 <= ts))
        id -> (if (cand.isEmpty) null else cand.maxBy(_._2)._3)
      }.toMap
      val got = AsOfJoin.asOf(
          left.toDF("k", "ts", "row_id"), right.toDF("k", "rts", "pay"),
          "k", "ts", "rts", strict = strict)
        .collect().map(r => r.getLong(2) -> r.getString(3)).toMap
      assert(got == expected, s"strict=$strict mismatch")
    }
  }
}
