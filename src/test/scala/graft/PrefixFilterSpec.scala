package graft

import graft.core.Tables
import graft.operators.Dedup

/** Prefix filtering (AllPairs/PPJoin) must be a pure candidate-pruning
  * optimization: identical pairs AND identical jaccard values to the
  * all-shared-shingle exact join, across thresholds — including low
  * thresholds where the prefix is most of the document and high ones
  * where it is a handful of rare shingles.
  */
class PrefixFilterSpec extends SparkSpec {

  test("prefixJaccardPairs == exactJaccardPairs on real corpus, all thresholds") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    for (t <- Seq(0.9, 0.5, 0.3)) {
      val exact = rows(Dedup.exactJaccardPairs(docs, "doc_id", "text", 2, t))
      val pref = rows(Dedup.prefixJaccardPairs(docs, "doc_id", "text", 2, t))
      assert(pref == exact, s"threshold $t: prefix filter lost or invented pairs")
      assert(exact.nonEmpty || t > 0.5, s"threshold $t should find pairs at sf0.001")
    }
  }

  test("prefix length arithmetic survives IEEE boundaries") {
    // 10 shingles at t = 0.9: 0.9*10 = 9.000000000000002 in IEEE — a
    // naive ceil yields prefix 1 and silently drops qualifying pairs.
    // Two 11-word docs differing in the last word share 9 of 11 distinct
    // 2-shingles: J = 9/11 < 0.9; at t = 0.8 the pair must survive.
    val d = df(
      """SELECT * FROM VALUES
        |  (1, 'a b c d e f g h i j k'),
        |  (2, 'a b c d e f g h i j z')
        |  t(doc_id, text)""".stripMargin)
    val atNine = Dedup.prefixJaccardPairs(d, "doc_id", "text", 2, 9.0 / 11 - 1e-9)
    assert(atNine.count() == 1, "J = 9/11 pair must be found at its own threshold")
    assert(Dedup.prefixJaccardPairs(d, "doc_id", "text", 2, 0.9).count() == 0)
  }
}
