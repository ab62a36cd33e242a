package graft

import org.apache.spark.sql.functions._
import graft.operators.Bpe

/** BPE merge contracts: greedy semantics on crafted sequences (incl.
  * the cases where naive position-marking would double-consume),
  * learned-pair determinism, and the non-overlap argument's edge cases.
  */
class BpeSpec extends SparkSpec {

  private def toksDf(rows: (Long, String)*) =
    spark.createDataFrame(rows).toDF("doc_id", "text")
      .select(col("doc_id"), split(col("text"), " ").as("toks"))

  private def merged(df: org.apache.spark.sql.DataFrame, l: String, r: String) =
    df.select(col("doc_id"),
      array_join(Bpe.mergeExpr(col("toks"), l, r), " ").as("m"))
      .collect().map(rw => rw.getLong(0) -> rw.getString(1)).toMap

  test("greedy merge: plain, adjacent, chained, and boundary cases") {
    val df = toksDf(
      1L -> "a b c a b",      // two separate matches
      2L -> "a b a b a b",    // back-to-back matches, all merge
      3L -> "a a b b",        // single match in the middle
      4L -> "b a",            // no match (wrong order)
      5L -> "a",              // single token
      6L -> "x a b")          // match at the end
    val m = merged(df, "a", "b")
    assert(m(1L) == "a+b c a+b")
    assert(m(2L) == "a+b a+b a+b")
    assert(m(3L) == "a a+b b")
    assert(m(4L) == "b a")
    assert(m(5L) == "a")
    assert(m(6L) == "x a+b")
  }

  test("'l r r' consumes only the first r; 'l l r' merges at the second l") {
    val df = toksDf(1L -> "a b b", 2L -> "a a b")
    val m = merged(df, "a", "b")
    assert(m(1L) == "a+b b")
    assert(m(2L) == "a a+b")
  }

  test("self-pair merge: run-length greedy pairing per maximal run") {
    val df = toksDf(
      1L -> "a a a a",        // even run: all pair up
      2L -> "a a a",          // odd run: trailing single survives
      3L -> "a a a a a",      // odd run of 5
      4L -> "a b a a b a a a",// runs split by other tokens
      5L -> "b c d",          // no a at all
      6L -> "a")              // single a
    val m = df.select(col("doc_id"),
      array_join(Bpe.selfMergeExpr(col("toks"), "a"), " ").as("m"))
      .collect().map(rw => rw.getLong(0) -> rw.getString(1)).toMap
    assert(m(1L) == "a+a a+a")
    assert(m(2L) == "a+a a")
    assert(m(3L) == "a+a a+a a")
    assert(m(4L) == "a b a+a b a+a a")
    assert(m(5L) == "b c d")
    assert(m(6L) == "a")
  }

  test("learned merges are deterministic and take self-pairs by count") {
    val df = toksDf(
      1L -> "x x x x x x y z", // 'x x': 5 adjacents > 4 'y z' adjacents
      2L -> "y z y z",
      3L -> "y z w")
    val (ms, out) = Bpe.applyMerges(df, "toks", 2)
    assert(ms.head == ("x", "x"))                 // self-pair wins on count
    val (ms2, _) = Bpe.applyMerges(df.repartition(5), "toks", 2)
    assert(ms == ms2)
    val texts = out.select(col("doc_id"),
        array_join(col("toks"), " ").as("t"))
      .collect().map(rw => rw.getLong(0) -> rw.getString(1)).toMap
    // doc 1 after round 1: 'x+x x+x y z'; round 2 merges the next top pair
    assert(texts(1L).startsWith("x+x x+x"))
    // legacy behavior stays available behind the flag
    val (msLegacy, _) = Bpe.applyMerges(df, "toks", 2, allowSelfPairs = false)
    assert(msLegacy.head == ("y", "z"))
    assert(msLegacy.forall { case (l, r) => l != r })
  }
}
