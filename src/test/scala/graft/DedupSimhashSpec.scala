package graft

import org.apache.spark.sql.functions._
import graft.functions.{Similarity, TextFunctions}
import graft.operators.Dedup

/** SimHash band near-dup contracts on the production (xxhash64)
  * instance: pigeonhole-exact recall at Hamming radius ≤ 3, no result
  * over the radius, agreement with the brute-force pair scan, and
  * partitioning independence.
  */
class DedupSimhashSpec extends SparkSpec {

  // near-dup corpus: 40 base docs, each with a mutated twin (one token
  // appended) and an unrelated filler doc — twins should land within a
  // small Hamming radius, fillers far away
  private def sims = {
    val words = Seq("alpha", "beta", "gamma", "delta", "epsilon", "zeta",
      "eta", "theta", "iota", "kappa", "lambda", "mu")
    val docs = (0 until 40).flatMap { i =>
      val base = (0 until 30).map(j => words((i * 7 + j * 3) % 12)).mkString(" ")
      Seq((i * 3L, base), (i * 3L + 1, base + " " + words(i % 12)),
        (i * 3L + 2, (0 until 30).map(j => words((i * 5 + j * j) % 12)).mkString(" ")))
    }
    spark.createDataFrame(docs).toDF("doc_id", "text")
      .select(col("doc_id"), explode(TextFunctions.tokens(col("text"))).as("tok"))
      .groupBy("doc_id").agg(Similarity.simhashVoteAggs(col("tok")).head,
        Similarity.simhashVoteAggs(col("tok")).tail: _*)
      .select(col("doc_id"), Similarity.packSimhashVotes.as("sh"))
  }

  private def brute(maxHamming: Int) = {
    val a = sims.toDF("doc_a", "sha")
    val b = sims.toDF("doc_b", "shb")
    a.crossJoin(b).filter(col("doc_a") < col("doc_b"))
      .withColumn("hamming",
        bit_count(col("sha").bitwiseXOR(col("shb"))).cast("long"))
      .filter(col("hamming") <= maxHamming)
      .select("doc_a", "doc_b", "hamming")
  }

  test("pigeonhole: radius-3 results equal the brute-force pair scan") {
    // hamming <= 3 differs in at most 3 of 4 bands -> always a shared
    // band -> the banded operator's recall is exact at this radius
    val banded = Dedup.simhashNearDups(sims, "doc_id", "sh", maxHamming = 3)
    assert(rows(banded) == rows(brute(3)))
    assert(brute(3).count() > 0, "fixture produced no radius-3 twins")
  }

  test("no result exceeds the radius; every result shares a band") {
    val out = Dedup.simhashNearDups(sims, "doc_id", "sh", maxHamming = 8)
      .collect()
    assert(out.forall(_.getLong(2) <= 8))
    // banded results are a subset of the brute-force radius-8 scan
    assert(out.map(_.toSeq).toSet.subsetOf(rows(brute(8))))
  }

  test("partitioning independent") {
    val r1 = rows(Dedup.simhashNearDups(sims, "doc_id", "sh", 3))
    val r2 = rows(Dedup.simhashNearDups(sims.repartition(7), "doc_id", "sh", 3))
    assert(r1 == r2)
  }
}
