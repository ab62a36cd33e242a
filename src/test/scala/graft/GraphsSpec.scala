package graft

import org.apache.spark.sql.functions._
import graft.operators.Graphs

/** kCorePeel pins: hand-checkable cores, fixed-round == converged
  * equivalence, and the registry graph's fixed point within 5 rounds.
  */
class GraphsSpec extends SparkSpec {

  private def edges(pairs: (Int, Int)*) =
    df("SELECT * FROM VALUES " +
      pairs.map { case (a, b) => s"($a, $b)" }.mkString(", ") + " t(x, y)")

  test("K4 with a pendant tail: 2-core drops the tail, keeps K4 at degree 3") {
    // K4 on 1..4 plus tail 4-5-6 (degree-1 chain end peels back fully)
    val e = edges((1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (4, 5), (5, 6))
    val out = Graphs.kCorePeel(e, k = 2L, rounds = 10).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(out == Map(1 -> 3L, 2 -> 3L, 3 -> 3L, 4 -> 3L),
      s"expected bare K4, got $out")
  }

  test("k above the max core empties the graph") {
    val e = edges((1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4))
    assert(Graphs.kCorePeel(e, k = 4L, rounds = 10).count() == 0L)
  }

  test("cascading peel needs multiple rounds: chain collapses under k=2") {
    // path 1-2-3-4-5: every round peels the two current endpoints
    val e = edges((1, 2), (2, 3), (3, 4), (4, 5))
    assert(Graphs.kCorePeel(e, k = 2L, rounds = 10).count() == 0L)
    // one round only removes edges touching the original endpoints
    val oneRound = Graphs.kCorePeel(e, k = 2L, rounds = 1)
    assert(oneRound.count() == 3L, "after round 1 the inner path 2-3-4 remains")
  }

  test("registry g19 graph reaches its fixed point within the pinned 5 rounds") {
    val d = "/root/testdata/sf0.001"
    val li = graft.core.Tables.lineitem(spark, d).select("l_orderkey", "l_suppkey")
    val pair = li.toDF("ok", "x")
      .join(li.toDF("ok2", "y"), col("ok") === col("ok2") && col("x") < col("y"))
      .select("x", "y").distinct()
    val e = pair.filter(substring(
      md5(concat(col("x").cast("string"), lit("_"),
        col("y").cast("string"), lit("g19"))), 1, 1) === "0")
      .localCheckpoint()
    val r5 = Graphs.kCorePeel(e, k = 4L, rounds = 5).collect()
      .map(r => r.get(0) -> r.getLong(1)).toMap
    val r8 = Graphs.kCorePeel(e, k = 4L, rounds = 8).collect()
      .map(r => r.get(0) -> r.getLong(1)).toMap
    assert(r5 == r8, "5 rounds must already be the fixed point (oracle unrolls 5)")
    assert(r5.values.forall(_ >= 4L), "a converged 4-core has min degree 4")
  }

  test("bfsDistances: hop layers on a path, nearest source wins") {
    // path 1-2-3-4-5-6 with sources {1, 6}: dist = 0,1,2,2,1,0
    val e = edges((1, 2), (2, 3), (3, 4), (4, 5), (5, 6))
    val src = df("SELECT * FROM VALUES (1), (6) t(node)")
    val got = Graphs.bfsDistances(e, src, rounds = 4).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(got == Map(1 -> 0L, 2 -> 1L, 3 -> 2L, 4 -> 2L, 5 -> 1L, 6 -> 0L))
  }

  test("bfsDistances: rounds cap truncates the frontier") {
    val e = edges((1, 2), (2, 3), (3, 4), (4, 5))
    val src = df("SELECT 1 AS node")
    val got = Graphs.bfsDistances(e, src, rounds = 2).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(got == Map(1 -> 0L, 2 -> 1L, 3 -> 2L),
      s"nodes beyond 2 hops must be absent, got $got")
  }

  test("bfsDistances: disconnected component stays unreached") {
    val e = edges((1, 2), (8, 9))
    val src = df("SELECT 1 AS node")
    val got = Graphs.bfsDistances(e, src, rounds = 4).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(got == Map(1 -> 0L, 2 -> 1L))
  }

  private def lpa(rounds: Int, pairs: (Int, Int)*) =
    Graphs.labelPropagation(edges(pairs: _*), rounds).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap

  test("labelPropagation: two bridged triangles separate into two communities") {
    // triangles {1,2,3} and {4,5,6} with bridge 3-4; hand-replayed
    // rounds give {1,2,3}->1 and {4,5,6}->3 after round 3
    val e = Seq((1, 2), (1, 3), (2, 3), (4, 5), (4, 6), (5, 6), (3, 4))
    assert(lpa(3, e: _*) ==
      Map(1 -> 1L, 2 -> 1L, 3 -> 1L, 4 -> 3L, 5 -> 3L, 6 -> 3L))
  }

  test("labelPropagation: round 1 is the neighbour-min under all-ties") {
    // star center 1 with leaves 2,3,4: center sees {2,3,4} all count 1
    // -> min 2; each leaf sees only {1} -> 1
    assert(lpa(1, (1, 2), (1, 3), (1, 4)) ==
      Map(1 -> 2L, 2 -> 1L, 3 -> 1L, 4 -> 1L))
  }

  test("labelPropagation: majority beats smaller label") {
    // node 5 has neighbours {1, 2, 3} relabelled after r1; use a direct
    // shape instead: 4 connects to 1 once and to {2,3} where 2,3 carry
    // label 2's majority. Simplest pin: K3 {2,3,4} + pendant 1-4;
    // r1: n4 sees {2,3,1} all-tie -> 1; n2 sees {3,4} -> 3; n3 sees
    // {2,4} -> 2; n1 sees {4} -> 4
    assert(lpa(1, (2, 3), (2, 4), (3, 4), (1, 4)) ==
      Map(1 -> 4L, 2 -> 3L, 3 -> 2L, 4 -> 1L))
  }

  test("labelPropagation: deterministic across partitionings") {
    val e = Seq((1, 2), (1, 3), (2, 3), (4, 5), (4, 6), (5, 6), (3, 4))
    val base = edges(e: _*)
    val a = Graphs.labelPropagation(base.repartition(1), 3).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val b = Graphs.labelPropagation(base.repartition(7), 3).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(a == b)
  }
}
