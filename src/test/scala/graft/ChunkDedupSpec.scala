package graft

import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Chunk-level keep-first dedup (operators/Dedup.dedupChunks): semantic
  * fixtures small enough to verify by hand, chunk size 3 tokens.
  */
class ChunkDedupSpec extends SparkSpec {

  private def docs(rows: (Long, String)*) = {
    val s = spark; import s.implicits._
    rows.toDF("doc_id", "text")
  }

  private def run(d: org.apache.spark.sql.DataFrame) =
    Dedup.dedupChunks(d, "doc_id", "text", chunkTokens = 3)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap

  test("repeated chunk survives only at its first occurrence") {
    // chunk "a b c" appears in docs 1 (pos 0), 2 (pos 0), 3 (pos 1)
    val out = run(docs(
      1L -> "a b c x y z",
      2L -> "a b c q r s",
      3L -> "u v w a b c"))
    assert(out(1L) == (("a b c x y z", 2L)))
    assert(out(2L) == (("q r s", 1L)), "later doc loses the repeated chunk")
    assert(out(3L) == (("u v w", 1L)), "repeat at a later position also dropped")
  }

  test("keep-first is by (doc, position) within one document too") {
    // same chunk twice inside doc 5: first kept, second dropped
    val out = run(docs(5L -> "a b c a b c"))
    assert(out(5L) == (("a b c", 1L)))
  }

  test("fully-duplicated doc stays in the output with empty text") {
    val out = run(docs(1L -> "a b c", 2L -> "a b c"))
    assert(out(1L) == (("a b c", 1L)))
    assert(out(2L) == (("", 0L)), "doc with zero surviving chunks must not vanish")
  }

  test("ragged tail chunk is its own unit and order is preserved") {
    // doc 1's tail "t u" (2 tokens) differs from doc 2's chunk "t u v"
    val out = run(docs(1L -> "a b c t u", 2L -> "t u v"))
    assert(out(1L) == (("a b c t u", 2L)))
    assert(out(2L) == (("t u v", 1L)))
  }

  test("deterministic under repartition") {
    val d = docs((1L to 200L).map(i =>
      i -> s"tok${i % 7} tok${i % 5} tok${i % 3} fill$i a b"): _*)
    val a = Dedup.dedupChunks(d, "doc_id", "text", chunkTokens = 3)
    val b = Dedup.dedupChunks(d.repartition(13), "doc_id", "text", chunkTokens = 3)
    assert(sortedRows(a) == sortedRows(b))
  }
}
