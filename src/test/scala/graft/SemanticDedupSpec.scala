package graft

import org.apache.spark.sql.functions._
import graft.functions.Similarity
import graft.operators.Dedup

/** Pins semanticDedup's semantics against a driver-side brute-force
  * replay: a vector is dropped iff a SMALLER-id vector in the SAME
  * cluster has cosine >= threshold — and near-dups split across
  * clusters are kept (the method's accepted miss, like LSH banding).
  */
class SemanticDedupSpec extends SparkSpec {

  private val dims = 8
  private val tau = 0.9

  /** 3 well-separated direction groups + jittered members, so cluster
    * assignment is stable and within-group cosines are high. */
  private def vecs: Seq[(Long, Seq[Float])] = {
    def unit(axis: Int, jitter: Double, sign: Double = 1.0): Seq[Float] = {
      val v = Array.fill(dims)(jitter)
      v(axis) = sign
      val n = math.sqrt(v.map(x => x * x).sum)
      v.map(x => (x / n).toFloat).toSeq
    }
    Seq(
      1L -> unit(0, 0.01), 2L -> unit(0, 0.02), 3L -> unit(0, 0.03),
      4L -> unit(3, 0.01), 5L -> unit(3, 0.015),
      6L -> unit(6, 0.01),
      7L -> unit(0, 0.01, sign = -1.0)) // anti-parallel: same cell family, low cos
  }

  private def centroids = {
    val s = spark; import s.implicits._
    Seq(
      (0L, Seq.tabulate(dims)(i => if (i == 0) 1.0 else 0.0)),
      (1L, Seq.tabulate(dims)(i => if (i == 3) 1.0 else 0.0)),
      (2L, Seq.tabulate(dims)(i => if (i == 6) 1.0 else 0.0)),
      (3L, Seq.tabulate(dims)(i => if (i == 0) -1.0 else 0.0)))
      .toDF("cell_id", "c_vec")
  }

  private def run() = {
    val s = spark; import s.implicits._
    Dedup.semanticDedup(vecs.toDF("vec_id", "embedding"), centroids,
        "vec_id", "embedding", minCos = tau)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
  }

  test("dropped iff a smaller-id same-cluster vector is within cosine") {
    val out = run()
    assert(out.map(_._1).sorted.toSeq == vecs.map(_._1).sorted,
      "every vector appears exactly once")
    // brute-force replay on the driver
    def cos(a: Seq[Float], b: Seq[Float]): Double = {
      val dot = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
      val na = math.sqrt(a.map(x => x.toDouble * x).sum)
      val nb = math.sqrt(b.map(x => x.toDouble * x).sum)
      dot / (na * nb)
    }
    val byId = vecs.toMap
    val cellOf = out.map(r => r._1 -> r._2).toMap
    for ((id, cell, kept) <- out) {
      val expectDropped = vecs.exists { case (o, v) =>
        o < id && cellOf(o) == cell && cos(v, byId(id)) >= tau }
      assert(kept == !expectDropped, s"vec $id kept=$kept cell=$cell")
    }
  }

  test("cross-cluster near-dups are kept (the documented miss)") {
    val out = run().map(r => r._1 -> r).toMap
    // 7 is anti-parallel to group 1 (cos = -1, own cluster): kept
    assert(out(7L)._3)
    // singleton cluster member kept
    assert(out(6L)._3)
  }

  test("deterministic across runs") {
    assert(run().sortBy(_._1).toSeq == run().sortBy(_._1).toSeq)
  }

  test("null embedding passes through unjudged: null cell, kept, harmless") {
    val s = spark; import s.implicits._
    val vs = Seq((1L, Seq(1.0f, 0.0f)), (2L, null.asInstanceOf[Seq[Float]]),
        (3L, Seq(1.0f, 0.001f)))
      .toDF("vec_id", "embedding")
    val cents = Seq((0L, Seq(1.0, 0.0)), (1L, Seq(0.0, 1.0)))
      .toDF("cell_id", "c_vec")
    val out = Dedup.semanticDedup(vs, cents, "vec_id", "embedding", 0.9)
      .collect().map(r => (r.getLong(0), Option(r.get(1)), r.getBoolean(2)))
    val m = out.map(r => r._1 -> r).toMap
    assert(m(2L)._2.isEmpty && m(2L)._3,
      "null vector: no cell, kept (undecodable rows are upstream filters' job)")
    assert(m(1L)._3 && !m(3L)._3, "real rows still judged around the null")
  }
}
