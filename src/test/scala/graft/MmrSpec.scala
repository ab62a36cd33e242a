package graft

import org.apache.spark.sql.functions._
import graft.operators.Mmr

/** MMR pins: greedy semantics by hand, diversification vs pure top-k,
  * the k=1 / mu=0 degenerate forms, and partitioning determinism.
  */
class MmrSpec extends SparkSpec {

  // one query (qid 0), unit vectors: c1 = e_x (rel 1.0), c2 ~ e_x
  // near-duplicate (rel 0.98), c3 = e_y orthogonal (rel 0.10)
  private def cand() = {
    val sess = spark; import sess.implicits._
    Seq(
      (0L, 1L, Array(1f, 0f), 1.0, 1.0),
      (0L, 2L, Array(1f, 0f), 1.0, 0.98),
      (0L, 3L, Array(0f, 1f), 1.0, 0.10))
      .toDF("qid", "cid", "c_emb", "c_norm", "rel")
  }

  private def ranks(df: org.apache.spark.sql.DataFrame) =
    df.orderBy("qid", "rank").collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Int]("rank"), r.getAs[Long]("cid")))

  test("mmr picks the diverse candidate over the redundant higher-rel one") {
    // round 2 with lam .3/mu .7: c2 scores .3*.98-.7*1 < 0, c3 scores .3*.1
    val got = ranks(Mmr.rerank(cand(), k = 3, lam = 0.3, mu = 0.7))
    assert(got.toSeq == Seq((0L, 1, 1L), (0L, 2, 3L), (0L, 3, 2L)),
      s"redundant near-dup must sink below the orthogonal doc, got ${got.toSeq}")
  }

  test("k = 1 is pure argmax relevance; mu = 0 is relevance order") {
    assert(ranks(Mmr.rerank(cand(), k = 1, lam = 0.3, mu = 0.7)).toSeq ==
      Seq((0L, 1, 1L)))
    assert(ranks(Mmr.rerank(cand(), k = 3, lam = 1.0, mu = 0.0)).toSeq ==
      Seq((0L, 1, 1L), (0L, 2, 2L), (0L, 3, 3L)),
      "mu = 0 must reduce to descending-relevance order")
  }

  test("round-1 score is the raw relevance; later scores subtract redundancy") {
    val out = Mmr.rerank(cand(), k = 2, lam = 0.3, mu = 0.7)
      .collect().map(r => r.getAs[Int]("rank") -> r.getAs[Double]("score")).toMap
    assert(out(1) == 1.0)
    assert(math.abs(out(2) - (0.3 * 0.10 - 0.7 * 0.0)) < 1e-12)
  }

  test("queries advance independently and results are partitioning-stable") {
    val sess = spark; import sess.implicits._
    val two = cand().unionByName(Seq(
      (7L, 9L, Array(0f, 1f), 1.0, 0.5),
      (7L, 8L, Array(1f, 0f), 1.0, 0.4)).toDF("qid", "cid", "c_emb", "c_norm", "rel"))
    val a = ranks(Mmr.rerank(two.repartition(1), k = 2, lam = 0.3, mu = 0.7))
    val b = ranks(Mmr.rerank(two.repartition(13), k = 2, lam = 0.3, mu = 0.7))
    assert(a.toSeq == b.toSeq)
    assert(a.count(_._1 == 7L) == 2 && a.filter(_._1 == 7L).head._3 == 9L)
  }

  test("single-pass greedy fold is bitwise-identical to the unrolled form") {
    // deterministic pseudo-random fixture: 3 queries x 40 candidates of
    // 8-dim embeddings — large enough that picks genuinely depend on the
    // redundancy term, including duplicate vectors (sim exactly 1.0 ties)
    val sess = spark; import sess.implicits._
    def emb(q: Long, c: Long): Array[Float] =
      Array.tabulate(8)(i => (((q * 131 + c * 37 + i * 17) % 23) - 11).toFloat)
    val rows = for (q <- 0L until 3L; c <- 0L until 40L) yield {
      val e = if (c % 7 == 0) emb(q, 1L) else emb(q, c) // planted duplicates
      val nrm = math.sqrt(e.map(x => x.toDouble * x).sum)
      val rel = ((q * 7 + c * 13) % 19).toDouble / 19.0
      (q, c, e, nrm, rel)
    }
    val cand = rows.toDF("qid", "cid", "c_emb", "c_norm", "rel")
    val fast = Mmr.rerank(cand, k = 5, lam = 0.7, mu = 0.3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
      .sortBy(t => (t._1, t._2))
    val slow = Mmr.rerankUnrolled(cand, k = 5, lam = 0.7, mu = 0.3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
      .sortBy(t => (t._1, t._2))
    assert(fast.length == 15)
    // bitwise: compare raw long bits of the scores, not an epsilon
    assert(fast.map(t => (t._1, t._2, t._3,
        java.lang.Double.doubleToLongBits(t._4))).toSeq ==
      slow.map(t => (t._1, t._2, t._3,
        java.lang.Double.doubleToLongBits(t._4))).toSeq)
  }
}
