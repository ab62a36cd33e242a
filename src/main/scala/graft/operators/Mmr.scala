package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Similarity

/** Maximal Marginal Relevance re-ranking (Carbonell & Goldstein 1998):
  * greedily pick k results that balance relevance against redundancy,
  *   score(c) = lam * rel(c) - mu * max_{s in selected} sim(c, s)
  * — the retrieval-diversification step after an ANN candidate fetch
  * (dedup of near-identical passages in a RAG context window).
  *
  * Deterministic by construction: ties break on ascending candidate id,
  * and because rel/sim are the engine's exact-fold cosines, a SQL oracle
  * replaying the same operation order reproduces every pick bitwise.
  * `lam`/`mu` are separate parameters (NOT mu = 1-lam: 1.0 - 0.7 is
  * 0.30000000000000004 in binary — an oracle writing the literal 0.3
  * would diverge).
  *
  * Scale shape: all query groups advance through the k greedy rounds
  * TOGETHER — each round is one anti-join (drop picked), one join onto
  * the selected set keyed by query id, one max-aggregate, one per-query
  * argmax; candidate sets are ANN-output-sized (bounded per query), and
  * the selected table is localCheckpoint-ed per round (k is small; the
  * loop is k-1 rounds of narrow per-query work, never pairwise over the
  * corpus).
  */
object Mmr {

  /** `cand` columns: qid, cid, c_emb (the candidate vector), c_norm
    * (its L2 norm), rel (relevance to the query, typically cosine).
    * Returns (qid, rank, cid, score) with rank 1..k per query; round 1
    * is pure relevance (no selected set yet, score = rel).
    */
  def rerank(cand: DataFrame, k: Int, lam: Double, mu: Double): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val pick1 = Window.partitionBy("qid").orderBy(col("rel").desc, col("cid"))
    var sel = cand
      .withColumn("rn", row_number().over(pick1)).filter(col("rn") === 1)
      .select(col("qid"), col("cid"), col("c_emb"), col("c_norm"),
        col("rel").as("score"), lit(1).as("rank"))
      .localCheckpoint()
    for (r <- 2 to k) {
      val remaining = cand.join(sel.select("qid", "cid"), Seq("qid", "cid"), "left_anti")
      val ms = remaining
        .join(sel.select(col("qid"), col("c_emb").as("s_emb"),
          col("c_norm").as("s_norm")), Seq("qid"))
        .withColumn("s",
          Similarity.dot(col("c_emb"), col("s_emb")) / (col("c_norm") * col("s_norm")))
        .groupBy("qid", "cid").agg(max("s").as("ms"))
      val scored = remaining.join(ms, Seq("qid", "cid"))
        .withColumn("score", lit(lam) * col("rel") - lit(mu) * col("ms"))
      val pick = Window.partitionBy("qid").orderBy(col("score").desc, col("cid"))
      sel = sel.unionByName(
          scored.withColumn("rn", row_number().over(pick)).filter(col("rn") === 1)
            .select(col("qid"), col("cid"), col("c_emb"), col("c_norm"),
              col("score"), lit(r).as("rank")))
        .localCheckpoint()
    }
    sel.select(col("qid"), col("rank"), col("cid"), col("score"))
  }
}
