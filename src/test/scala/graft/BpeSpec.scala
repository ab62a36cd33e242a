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

  test("learned merges are deterministic and skip self-pairs") {
    val df = toksDf(
      1L -> "x x x x y z",   // 'x x' is the most frequent pair but self
      2L -> "y z y z",
      3L -> "y z w")
    val (ms, out) = Bpe.applyMerges(df, "toks", 2)
    assert(ms.head == ("y", "z"))                 // self-pair x,x skipped
    assert(ms.forall { case (l, r) => l != r })
    val (ms2, _) = Bpe.applyMerges(df.repartition(5), "toks", 2)
    assert(ms == ms2)
    // round-2 pair may build on the round-1 token
    val texts = out.select(array_join(col("toks"), " ")).collect().map(_.getString(0)).toSet
    assert(texts.contains("y+z y+z") || texts.contains("y+z+y+z") ||
      texts.exists(_.contains("y+z")))
  }
}
